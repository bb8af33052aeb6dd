"""Schema-explicit transcript readers: csv/jsonl/parquet parity and
malformed-row quarantine."""

from __future__ import annotations

import json

from lnex_spark.sources.readers import read_transcripts, read_transcripts_rejects


def _rows():
    return [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello anna salai", "tool": "", "ts": "2026-01-01T00:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "hi", "tool": "search", "ts": "2026-01-01T00:00:17"},
        {"conv_id": "c2", "turn_idx": 0, "role": "tool", "text": "x, y", "tool": "", "ts": "2026-01-01T00:01:00"},
    ]


def test_jsonl_and_csv_agree_with_parquet(spark, tmp_path):
    rows = _rows()
    jl = tmp_path / "t.jsonl"
    jl.write_text("\n".join(json.dumps(r) for r in rows))
    cv = tmp_path / "t.csv"
    # string fields quoted: Spark's CSV reader nulls UNQUOTED empty
    # fields unconditionally; quoted "" honors emptyValue (readers.py)
    cv.write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        + "\n".join(
            f'{r["conv_id"]},{r["turn_idx"]},{r["role"]},"{r["text"]}","{r["tool"]}",{r["ts"]}'
            for r in rows
        )
    )
    a = read_transcripts(spark, str(jl), "jsonl")
    b = read_transcripts(spark, str(cv), "csv")
    pq = tmp_path / "t.parquet"
    a.write.parquet(str(pq))
    c = read_transcripts(spark, str(pq), "parquet")
    ka = sorted(tuple(r) for r in a.collect())
    assert ka == sorted(tuple(r) for r in b.collect())
    assert ka == sorted(tuple(r) for r in c.collect())
    assert a.schema == c.schema
    assert len(ka) == 3


def test_malformed_rows_are_quarantined_not_dropped(spark, tmp_path):
    good = json.dumps(_rows()[0])
    bad = '{"conv_id": "c9", "turn_idx": "not-an-int'
    jl = tmp_path / "mixed.jsonl"
    jl.write_text(good + "\n" + bad)
    ok = read_transcripts(spark, str(jl), "jsonl")
    rejects = read_transcripts_rejects(spark, str(jl), "jsonl")
    assert ok.count() == 1
    lines = [r["line"] for r in rejects.collect()]
    assert lines == [bad]
