"""Regression pins for bench.py's driver-record recovery (the round-6
ADVICE items): marker-less truncated tails must mine NOTHING (r06's
ratio-only tail once threatened to collapse the floor to 0.7-1.3
"seconds"), marker-bearing tails mine only the min dict, and mined
records are never treated as median-grade for vs_prev."""

import json
from pathlib import Path

import bench

KNOWN = {"pricing_summary", "top_orders", "embedding_near_dups", "dedup_clusters"}

REPO = Path(__file__).resolve().parent.parent


def test_ratio_only_tail_mines_nothing():
    """The real r06 record: tail starts inside a ratio dict, the
    '"min": {' marker truncated off — mining it as seconds corrupted
    floors; it must be skipped entirely."""
    doc = json.loads((REPO / "BENCH_r06.json").read_text())
    assert doc.get("parsed") is None  # the regression scenario
    assert bench.mine_tail(doc, set(doc["tail"].split('"'))) == ({}, "none")


def test_marker_bounded_tail_mines_only_min_dict():
    doc = {
        "rc": 0,
        "tail": (
            '..., "queries": {"pricing_summary": 0.9}, '
            '"min": {"pricing_summary": 0.61, "top_orders": 1.4}, '
            '"secondary": {"embedding_near_dups": 9.9}, '
            '"vs_floor": {"dedup_clusters": 0.86}'
        ),
    }
    assert bench.mine_tail(doc, KNOWN) == (
        {"pricing_summary": 0.61, "top_orders": 1.4},
        "mined",
    )


def test_failed_run_mines_nothing():
    doc = {"rc": 1, "tail": '"min": {"pricing_summary": 0.5}'}
    assert bench.mine_tail(doc, KNOWN) == ({}, "none")


def test_round_queries_kinds(tmp_path):
    parsed = tmp_path / "BENCH_r90.json"
    parsed.write_text(json.dumps({"parsed": {"queries": {"pricing_summary": 0.7}}}))
    q, kind = bench.round_queries_record(parsed, KNOWN)
    assert kind == "parsed" and q == {"pricing_summary": 0.7}

    mined = tmp_path / "BENCH_r91.json"
    mined.write_text(
        json.dumps({"rc": 0, "parsed": None, "tail": '"min": {"top_orders": 1.2}'})
    )
    q, kind = bench.round_queries_record(mined, KNOWN)
    assert kind == "mined" and q == {"top_orders": 1.2}

    # compact contract line truncated into the driver tail: the whole
    # queries dict survives at end-of-line -> median-grade recovery
    compact = tmp_path / "BENCH_r94.json"
    compact.write_text(json.dumps({
        "rc": 0, "parsed": None,
        "tail": '"sf":0.1,"stat":"median_of_5","queries":{"pricing_summary":0.41,"top_orders":0.9},"geomean_vs_floor":1.02,"worst_vs_floor":{"dedup_clusters":1.27}',
    }))
    q, kind = bench.round_queries_record(compact, KNOWN)
    assert kind == "parsed" and q == {"pricing_summary": 0.41, "top_orders": 0.9}

    dead = tmp_path / "BENCH_r92.json"
    dead.write_text(json.dumps({"rc": 0, "parsed": None, "tail": '"vs_prev": ...'}))
    q, kind = bench.round_queries_record(dead, KNOWN)
    assert kind == "none" and q == {}

    garbage = tmp_path / "BENCH_r93.json"
    garbage.write_text("{not json")
    q, kind = bench.round_queries_record(garbage, KNOWN)
    assert kind == "none" and q == {}
