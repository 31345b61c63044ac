"""Engine benchmark: headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "catalog_headline_runtime", "value": <total sec>,
   "unit": "sec", "queries": {name: sec, ...}, "sf": <sf>}

Each query materializes via the noop sink (computes every column, no
driver collect) — measuring executor work, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from interlinked_spark import catalog  # noqa: E402
from interlinked_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "region_revenue",
    "top_orders",
    "customer_order_stats",
    "customer_running_spend",
    "nation_top3_customers",
    "click_attribution_asof",
    "price_band_join",
    "event_props_stats",
    "customer_zscore",
    "dedup_exact_docs",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "similarity_cosine_topk",
    "doc_token_stats",
    "stream_tumbling_hourly",
    "banded_price_match",
    "next_error_asof_fwd",
    "token_frequencies",
    # round 2 additions
    "event_sessionization",
    "hourly_event_grid",
    "user_type_intervals",
    "orders_merge_upsert",
    "doc_tfidf_top_terms",
    "doc_bm25_query",
    "dedup_clusters",
    # customer_events_cogroup is deliberately NOT here: cogrouped-map
    # pandas pays a per-GROUP Python invocation (~1ms x 15k customer
    # groups at sf0.1) — that is the §2b-I tier's inherent cost, demoed
    # and oracle-gated at sf0.01, not a plan regression to track.
    "stream_click_error_join",
    # round 3 additions
    "nation_ols_slope",
    "skewed_flag_totals",
    "skewed_flag_join",
    "events_dedup_latest",
    "conditional_order_aggs",
    "customer_balance_distribution",
    "doc_pii_scrub",
    "embedding_vector_math",
    "click_purchase_funnel",
    "stream_upsert_latest",
    "hourly_value_locf",
    "corpus_quality_filter",
    "dedup_kept_corpus",
    # round 5 additions — the newly fully-oracled ops with real weight:
    # SimHash banding, the ids-only LSH similarity join (both shapes),
    # PCA invariants, and the multimodal mapInPandas tier.
    "dedup_simhash_pairs",
    "similarity_lsh_pairs",
    "embedding_near_dups",
    "embedding_pca",
    "multimodal_features",
]


def _settle(max_wait_s: int = 60) -> None:
    """Wait (bounded) for trailing machine load to drain: back-to-back
    runs on local[32] skew individual query times 1.5-2.5x when a prior
    job's executors are still winding down."""
    deadline = time.monotonic() + max_wait_s
    cpus = os.cpu_count() or 1
    while time.monotonic() < deadline:
        try:
            load1 = os.getloadavg()[0]
        except OSError:
            return
        if load1 < cpus * 0.25:
            return
        time.sleep(5)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _settle()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm sweep: run EVERY headline query once outside the measured
    # window.  A single pricing_summary warmed the JVM but left each
    # query's own first-run costs (streaming state-store init, ML model
    # fits, codegen) inside pass 1 — the stream-stream join measured
    # 6.4s cold vs 3.0s steady-state, skewing its median high.
    for name in HEADLINE:
        catalog.run_query(name, spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # Median of REPS interleaved passes: one round-robin sweep over the
    # whole headline set per pass (so slow machine-load drift spreads
    # evenly across queries instead of biasing whichever query ran
    # during the spike), then the per-query median.  n=1 round-3 numbers
    # regressed 1.1-1.4x purely from load noise.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            start = time.perf_counter()
            df = catalog.run_query(name, spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - start)

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    timings = {name: round(_median(xs), 3) for name, xs in samples.items()}

    # Secondary (non-headline) heavy queries: tracked in BENCH_LOCAL.json
    # only, never in the contract line or "value" — they carry documented
    # inherent costs (per-group pandas invocation, ML model fit) that are
    # demonstrations of a tier, not plan regressions to gate on.
    secondary_names = [
        "dedup_incremental_matches",
        "similarity_ivf_topk",
        "heavy_hitter_terms",
        "customer_events_cogroup",
    ]
    secondary: dict[str, float] = {}
    for name in secondary_names:
        try:
            catalog.run_query(name, spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm
            start = time.perf_counter()
            catalog.run_query(name, spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            secondary[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # noqa: BLE001 — secondary must not kill the bench
            print(f"SECONDARY {name} failed: {exc}", file=sys.stderr)

    # Regression tracking vs the latest recorded round (BENCH_r<N>.json):
    # per-query ratio, with >1.5x slowdowns called out on stderr.
    payload = {
        "metric": "catalog_headline_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "stat": f"median_of_{reps}",
        "queries": timings,
        "min": {name: round(min(xs), 3) for name, xs in samples.items()},
        "secondary": secondary,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    root = Path(__file__).resolve().parent
    prev_files = sorted(root.glob("BENCH_r*.json"))
    known = set(catalog.ORACLES)

    def _mine_tail(doc: dict) -> dict:
        """Recover per-query times from a driver record whose 2000-char
        tail capture truncated the JSON line (parsed: null, rounds 3-5).
        The tail keeps the END of the line — the ``min`` dict (per-query
        minimums, ideal for floor tracking) plus the vs_* ratio dicts.
        Take only ``"name": <num>`` pairs BEFORE the first ratio-dict key
        and only known catalog names, so ratios never pollute the floor."""
        import re as _re

        tail = doc.get("tail") or ""
        if doc.get("rc") not in (0, None):
            return {}
        cut = len(tail)
        for marker in ('"vs_floor"', '"vs_prev"'):
            idx = tail.find(marker)
            if idx != -1:
                cut = min(cut, idx)
        out = {}
        for m in _re.finditer(r'"([a-z0-9_]+)": ([0-9]+\.[0-9]+)', tail[:cut]):
            if m.group(1) in known:
                out[m.group(1)] = float(m.group(2))
        return out

    def _round_queries(p: Path) -> dict:
        try:
            doc = json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            return {}
        # Driver records wrap our JSON line under "parsed".
        parsed = doc.get("parsed") if isinstance(doc, dict) else None
        if isinstance(parsed, dict):
            return parsed.get("queries", {}) or {}
        if isinstance(doc, dict) and "tail" in doc:
            return _mine_tail(doc)
        return doc.get("queries", {}) if isinstance(doc, dict) else {}

    if prev_files:
        prev = _round_queries(prev_files[-1])
        ratios = {
            n: round(t / prev[n], 2)
            for n, t in timings.items()
            if prev.get(n)
        }
        if ratios:
            payload["vs_prev"] = {"round": prev_files[-1].stem, "ratio": ratios}

    # Floor tracking: per-query best time across ALL recorded rounds
    # (persisted to BENCH_FLOOR.json) — a slow creep can't hide behind
    # round-over-round ratios.
    floor_file = root / "BENCH_FLOOR.json"
    try:
        floor: dict[str, float] = json.loads(floor_file.read_text())
    except (json.JSONDecodeError, OSError):
        floor = {}
    for p in prev_files:
        for n, t in _round_queries(p).items():
            if isinstance(t, (int, float)) and (n not in floor or t < floor[n]):
                floor[n] = t
    if floor:
        try:
            floor_file.write_text(json.dumps(floor, indent=1, sort_keys=True) + "\n")
        except OSError:
            pass
        vs_floor = {
            n: round(t / floor[n], 2) for n, t in timings.items() if floor.get(n)
        }
        if vs_floor:
            payload["vs_floor"] = vs_floor
            for n, r in sorted(vs_floor.items(), key=lambda kv: -kv[1]):
                if r > 1.5:
                    print(f"REGRESSION {n}: {r}x vs floor ({floor[n]}s)", file=sys.stderr)

    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
