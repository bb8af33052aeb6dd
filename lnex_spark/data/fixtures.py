"""Deterministic synthetic fixtures + gold annotator (FIXTURES.md).

Reproduces the SHAPE of the reference's test data — gold-annotated
text sets for three flood events (Chennai 2015, Louisiana 2016,
Houston 2016; paper §5) — synthetically: a gazetteer per event, a
transcripts table whose turn texts embed planted location mentions
(exact names, skip-gram variants, hashtag forms, edge-punctuated
forms, decoys), and gold annotations computed by an independent
brute-force annotator.

Everything is a pure function of its arguments with per-row seeding
(``random.Random(f"{event}-{conv}-{turn}")``) — identical output
across runs, machines, generation order, and parallelism levels.

The gold annotator shares the *semantic* pure functions (normalize /
variant / tokenize) with the engine — one definition of "what is a
name variant" — but computes matching, linking, and canonicalization
with its own straightforward Python (dict lookups + Counter votes), so
the Spark pipeline's distribution, joins, window ranking, vote
aggregation, and offset plumbing are genuinely cross-checked.
"""

from __future__ import annotations

import random
import zlib
from collections import Counter
from datetime import datetime, timedelta, timezone

from lnex_spark.common import cat_priority
from lnex_spark.gazetteer.augment import is_noise_name, name_variants, normalize_name
from lnex_spark.operators.textproc import HashtagSegmenter, extract_mentions

EVENTS: dict[str, dict] = {
    "chennai": {
        "bbox": [12.74, 80.06, 13.28, 80.34],
        "id_base": 1_000_000,
        "stems": """adyar velachery mylapore tambaram guindy saidapet
            kodambakkam chromepet porur egmore besant marina chetpet
            royapettah teynampet vadapalani perungudi sholinganallur
            pallikaranai madipakkam nungambakkam mogappair ambattur
            avadi pallavaram thoraipakkam kotturpuram nandanam""".split(),
        "tails": ["Nagar", "River", "Bridge", "Road", "Lake", "Temple", "Market", "Station"],
    },
    "louisiana": {
        "bbox": [29.5, -93.5, 33.0, -89.5],
        "id_base": 2_000_000,
        "stems": """rouge lafayette amite comite denham walker ascension
            livingston tangipahoa ponchatoula hammond zachary gonzales
            prairieville watson slidell covington madisonville abita
            springfield albany killian maurepas sorrento gramercy""".split(),
        "tails": ["Parish", "River", "Creek", "Road", "Park", "Bridge", "Lake", "School"],
    },
    "houston": {
        "bbox": [29.4, -95.8, 30.2, -94.9],
        "id_base": 3_000_000,
        "stems": """brays sims greens cypress addicks barker meyerland
            katy humble kingwood bellaire pasadena tomball conroe
            westbury sharpstown aldine galena channelview baytown
            friendswood pearland stafford missouri fondren hillcroft""".split(),
        "tails": ["Bayou", "Road", "Park", "Bridge", "Street", "Mall", "School", "Creek"],
    },
}

# Filler vocabulary — deliberately includes a few words that are ALSO
# single-token gazetteer names ("water", "rescue", "shelter": planted in
# the stopwords fixture so G5 must drop them → precision test).
FILLER = (
    """water rising fast please help send boats we are stuck on the roof
    since morning rain continues heavy flooding everywhere stay safe
    people moving higher ground rescue teams arriving soon power cut in
    our area phone battery low need food supplies volunteers doing great
    work situation bad roads closed traffic heavy shelter open now call
    this number if anyone needs anything updates coming hourly stay
    strong everyone praying for all families affected tonight""".split()
)

GENERIC_NAME_WORDS = ["water", "rescue", "shelter"]  # gazetteer ∩ filler

_MODIFIERS = ["International", "Central", "Grand", "Old", "East", "West"]
_CATEGORIES = ["place", "waterway", "highway", "aeroway", "amenity"]
_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def gen_gazetteer(event: str, n_entries: int = 120) -> list[dict]:
    """Gazetteer rows for one event (geo_id, name, alt_names, category,
    lat, lon, region). Includes: modifier names (skip-gram fodder),
    inner-stopword names, ambiguous duplicate surface forms (>=5), and
    generic single-word names that G5 must filter (>=3)."""
    cfg = EVENTS[event]
    rng = random.Random(f"gaz-{event}-42")
    mn_lat, mn_lon, mx_lat, mx_lon = cfg["bbox"]
    rows: list[dict] = []
    gid = cfg["id_base"]

    def add(name: str, category: str, alt: list[str] | None = None) -> None:
        nonlocal gid
        rows.append(
            {
                "geo_id": gid,
                "name": name,
                "alt_names": alt or [],
                "category": category,
                "lat": round(mn_lat + rng.random() * (mx_lat - mn_lat), 6),
                "lon": round(mn_lon + rng.random() * (mx_lon - mn_lon), 6),
                "region": event,
            }
        )
        gid += 1

    stems = cfg["stems"]
    tails = cfg["tails"]
    for i in range(n_entries):
        stem = stems[i % len(stems)].capitalize()
        tail = tails[(i // len(stems)) % len(tails)]
        style = i % 6
        if style == 0:
            add(f"{stem} {tail}", _CATEGORIES[i % 5])
        elif style == 1:  # modifier name → exercises G4 skip-grams
            mod = _MODIFIERS[i % len(_MODIFIERS)]
            add(f"{stem} {mod} {tail}", _CATEGORIES[(i + 1) % 5])
        elif style == 2:  # bare place name
            add(stem, "place")
        elif style == 3:  # alt names
            add(f"{stem} {tail}", _CATEGORIES[(i + 2) % 5], alt=[f"{stem} {tail[:3]}."])
        elif style == 4:  # inner stopword
            add(f"{stem} of the {tail}", "amenity")
        else:
            add(f"{stem} {tails[(i + 3) % len(tails)]}", _CATEGORIES[(i + 3) % 5])

    # ambiguity on purpose: 6 duplicated surface forms, distinct entities
    for k in range(6):
        stem = stems[k].capitalize()
        tail = tails[k % len(tails)]
        add(f"{stem} {tail}", _CATEGORIES[(k + 1) % 5])
    # generic names shared with filler vocab (must be G5-filtered)
    for w in GENERIC_NAME_WORDS:
        add(w.capitalize(), "amenity")
    return rows


def gen_stopwords() -> list[str]:
    base = """a an the of in at on and or for to is was are were be been
    this that with from by as it its we you they he she them our your
    their""".split()
    return sorted(set(base) | set(GENERIC_NAME_WORDS))


def gen_wordlist() -> list[tuple[str, int]]:
    """Filler vocab as the 'extended words' list feeding the unigram LM."""
    return [(w, 50) for w in sorted(set(FILLER))]


def _mention_renders(entry: dict, rng: random.Random) -> str:
    """One planted textual rendering of a gazetteer entry."""
    name = entry["name"]
    norm = normalize_name(name)
    form = rng.random()
    if form < 0.55:
        text = name
    elif form < 0.70 and entry["alt_names"]:
        text = rng.choice(entry["alt_names"])
    elif form < 0.85:
        variants = sorted(name_variants(norm, "hp"))
        text = rng.choice(variants).title() if variants else name
    else:
        text = "#" + norm.replace(" ", "")
    wrap = rng.random()
    if wrap < 0.15 and not text.startswith("#"):
        text = f"({text})"
    elif wrap < 0.30:
        text = f"{text},"
    return text


def gen_transcripts(
    event: str,
    n_convs: int = 40,
    n_turns: int = 1000,
    gazetteer: list[dict] | None = None,
) -> list[dict]:
    """Transcript rows (conv_id, turn_idx, role, text, tool, ts) with
    long-tail skew: conv 0 holds ~20% of all turns (exercises X2)."""
    gaz = gazetteer if gazetteer is not None else gen_gazetteer(event)
    hot = max(1, int(n_turns * 0.2))
    per_conv = [hot] + [0] * (n_convs - 1)
    rest = n_turns - hot
    for i in range(rest):
        per_conv[1 + i % (n_convs - 1)] += 1

    roles = ["user", "assistant", "tool"]
    rows: list[dict] = []
    global_row = 0
    for conv in range(n_convs):
        conv_id = f"{event}-c{conv:06d}"
        for turn in range(per_conv[conv]):
            rng = random.Random(f"{event}-{conv}-{turn}")
            n_mentions = rng.choice([0, 0, 1, 1, 1, 2, 2, 3])
            pieces: list[str] = []
            n_filler_groups = n_mentions + 1
            for g in range(n_filler_groups):
                pieces.append(" ".join(rng.choice(FILLER) for _ in range(rng.randint(3, 9))))
                if g < n_mentions:
                    entry = rng.choice(gaz)
                    pieces.append(_mention_renders(entry, rng))
            # occasional decoy: stem + out-of-gazetteer tail word
            if rng.random() < 0.15:
                stem = rng.choice(EVENTS[event]["stems"]).capitalize()
                pieces.append(f"{stem} Cinema")
            text = " ".join(pieces)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn,
                    "role": roles[turn % 3],
                    "text": text,
                    "tool": "search" if turn % 7 == 0 else "",
                    "ts": _EPOCH + timedelta(seconds=17 * global_row),
                }
            )
            global_row += 1
    # stored shuffled on disk: T1's window must restore order
    # (zlib.crc32, not hash() — Python string hashing is process-salted)
    rows.sort(key=lambda r: zlib.crc32(f"{r['conv_id']}#{r['turn_idx']}".encode()))
    return rows


# ----------------------------------------------------------------------
# Gold annotator (independent brute-force implementation of the
# matching + linking + canonicalization semantics)
# ----------------------------------------------------------------------


def build_variant_map(
    gazetteer: list[dict], stopwords: set[str], mode: str = "hp"
) -> dict[str, list[tuple[int, int, int]]]:
    """norm variant -> [(geo_id, match_type, cat_priority)], G5-filtered."""
    agg: dict[tuple[str, int], tuple[int, int]] = {}
    meta = {e["geo_id"]: cat_priority(e.get("category")) for e in gazetteer}
    for e in gazetteer:
        for raw in [e["name"], *e.get("alt_names", [])]:
            norm = normalize_name(raw)
            if not norm:
                continue
            cands = [(norm, 1)] + [(v, 0) for v in name_variants(norm, mode)]
            for v, mt in cands:
                key = (v, e["geo_id"])
                prev = agg.get(key)
                if prev is None or mt > prev[0]:
                    agg[key] = (mt, meta[e["geo_id"]])
    out: dict[str, list[tuple[int, int, int]]] = {}
    for (v, gid), (mt, cp) in agg.items():
        if is_noise_name(v, stopwords) or v in stopwords:
            continue
        out.setdefault(v, []).append((gid, mt, cp))
    for v in out:
        out[v].sort()
    return out


def build_lm(variant_map: dict[str, list], wordlist: list[tuple[str, int]]) -> dict[str, int]:
    """Mirror of G6: token counts over (norm, geo_id) variant rows
    plus wordlist freqs."""
    freq: Counter[str] = Counter()
    for v, cands in variant_map.items():
        for tok in v.split(" "):
            freq[tok] += len(cands)
    for w, f in wordlist:
        freq[w] += f
    return dict(freq)


def gold_annotations(
    transcripts: list[dict],
    gazetteer: list[dict],
    stopwords: set[str] | None = None,
    wordlist: list[tuple[str, int]] | None = None,
    mode: str = "hp",
) -> list[dict]:
    """Brute-force reference extraction + linking + corpus-wide
    canonicalization → gold rows (conv_id, turn_idx, start, end,
    surface, geo_id)."""
    stop = set(stopwords if stopwords is not None else gen_stopwords())
    wl = wordlist if wordlist is not None else gen_wordlist()
    vmap = build_variant_map(gazetteer, stop, mode)
    lm = build_lm(vmap, wl)
    segmenter = HashtagSegmenter(lm)
    full = frozenset(vmap)
    prefixes = set()
    max_tokens = 1
    for v in vmap:
        toks = v.split(" ")
        max_tokens = max(max_tokens, len(toks))
        for i in range(1, len(toks) + 1):
            prefixes.add(" ".join(toks[:i]))

    raw: list[dict] = []
    for row in transcripts:
        for s, e, surface, norm in extract_mentions(
            row["text"], full, frozenset(prefixes), max_tokens, segmenter
        ):
            cands = vmap[norm]
            winner = min(cands, key=lambda c: (-c[1], c[2], c[0]))  # L2
            raw.append(
                {
                    "conv_id": row["conv_id"],
                    "turn_idx": row["turn_idx"],
                    "start": s,
                    "end": e,
                    "surface": surface,
                    "norm": norm,
                    "geo_id": winner[0],
                }
            )
    # L3: majority vote per surface form (ties → smaller geo_id)
    votes: Counter[tuple[str, int]] = Counter((m["norm"], m["geo_id"]) for m in raw)
    canon: dict[str, tuple[int, int]] = {}
    for (norm, gid), n in sorted(votes.items()):
        best = canon.get(norm)
        if best is None or (-n, gid) < (-best[0], best[1]):
            canon[norm] = (n, gid)
    for m in raw:
        m["geo_id"] = canon[m["norm"]][1]
        del m["norm"]
    return raw
