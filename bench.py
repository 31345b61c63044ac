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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths outside the measured window.
    catalog.run_query("pricing_summary", spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        df = catalog.run_query(name, spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    # Regression tracking vs the latest recorded round (BENCH_r<N>.json):
    # per-query ratio, with >1.5x slowdowns called out on stderr.
    payload = {
        "metric": "catalog_headline_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    prev_files = sorted(Path(__file__).resolve().parent.glob("BENCH_r*.json"))
    if prev_files:
        try:
            doc = json.loads(prev_files[-1].read_text())
            # Driver records wrap our JSON line under "parsed".
            prev = doc.get("parsed", doc).get("queries", {})
        except (json.JSONDecodeError, OSError, AttributeError):
            prev = {}
        ratios = {
            n: round(t / prev[n], 2)
            for n, t in timings.items()
            if prev.get(n)
        }
        if ratios:
            payload["vs_prev"] = {"round": prev_files[-1].stem, "ratio": ratios}
            for n, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
                if r > 1.5:
                    print(f"REGRESSION {n}: {r}x vs {prev_files[-1].stem}", file=sys.stderr)

    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
