"""Shared pure constants (no Spark imports)."""

# L2 candidate-scoring category priority (lower = preferred). Mirrors
# the paper's discussion of preferring certain OSM classes; the total
# order (match_type desc, cat_priority asc, geo_id asc) is the
# deterministic linking policy shared by the Spark pipeline and the
# gold annotator.
CATEGORY_PRIORITY = {"place": 0, "aeroway": 1, "waterway": 2, "highway": 3, "amenity": 4}
DEFAULT_CATEGORY_PRIORITY = 9


def cat_priority(category: str | None) -> int:
    return CATEGORY_PRIORITY.get(category, DEFAULT_CATEGORY_PRIORITY)
