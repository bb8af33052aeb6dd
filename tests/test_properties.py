"""Property-based tests (hypothesis) for the pure semantic core —
SURVEY.md §5.2 item 3/4. No SparkSession."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lnex_spark.gazetteer.augment import name_variants, normalize_name
from lnex_spark.operators.textproc import (
    HashtagSegmenter,
    extract_mentions,
    tokenize_with_spans,
)

TEXTS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=200,
)


@given(TEXTS)
@settings(max_examples=300)
def test_normalize_idempotent(s):
    n = normalize_name(s)
    assert normalize_name(n) == n
    assert n == n.strip()
    assert "  " not in n


@given(TEXTS)
@settings(max_examples=300)
def test_tokenize_spans_exact(s):
    for raw, start, end, _kind in tokenize_with_spans(s):
        assert s[start:end] == raw


@given(st.text(alphabet="abcdefgh", min_size=1, max_size=24))
@settings(max_examples=200)
def test_segmenter_reconstructs_input(s):
    seg = HashtagSegmenter({"ab": 5, "cde": 5, "fgh": 5, "abc": 2})
    assert "".join(seg.segment(s)) == s.lower()


@given(st.lists(st.sampled_from("adyar river guindy lake park the of x7".split()), min_size=2, max_size=6))
@settings(max_examples=200)
def test_variants_never_contain_original_or_empty(tokens):
    norm = " ".join(tokens)
    vs = name_variants(norm, "hr")
    assert norm not in vs
    for v in vs:
        assert v and "  " not in v and v == v.strip()
        # every variant is a subsequence of the original tokens
        it = iter(tokens)
        assert all(any(t == u for u in it) for t in v.split(" "))


@given(TEXTS)
@settings(max_examples=300)
def test_extract_offsets_and_overlap_invariants(text):
    names = frozenset({"adyar river", "adyar", "guindy", "x7 lake"})
    prefixes = frozenset({"adyar", "adyar river", "guindy", "x7", "x7 lake"})
    got = extract_mentions(text, names, prefixes, 2, None)
    spans = []
    for s, e, surface, norm in got:
        assert text[s:e] == surface
        assert norm in names
        spans.append((s, e))
    # overlap resolution leaves pairwise-disjoint spans
    spans.sort()
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2
