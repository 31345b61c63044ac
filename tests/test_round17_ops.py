"""Round-17 optimization guards: PPJoin prefix filter on the shingle
Jaccard self-join must be result-identical to the counting path (cap
on and off, grouped and not), the spread compute floor must stop
shredding tiny frames while honoring explicit widths, and index file
counts must derive from size, not a constant."""

import pyspark.sql.functions as F
import pytest

from .conftest import SF_SMOKE as SF


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _pairs_sorted(df):
    return sorted(tuple(r) for r in df.collect())


# ---------- PPJoin prefix filter (llm/dedup.ngram_jaccard_pairs) ----------


@pytest.mark.parametrize("threshold", [0.5, 0.35, 0.05])
def test_prefix_filter_matches_counting_path(spark, docs, threshold):
    from interlinked_spark.llm.dedup import ngram_jaccard_pairs

    base = ngram_jaccard_pairs(docs, threshold=threshold, prefix_filter=False)
    pref = ngram_jaccard_pairs(docs, threshold=threshold, prefix_filter=True)
    assert _pairs_sorted(base) == _pairs_sorted(pref)


def test_prefix_filter_matches_counting_path_grouped(spark, docs):
    from interlinked_spark.llm.dedup import ngram_jaccard_pairs

    d = docs.withColumn("grp_col", (F.col("doc_id") % 2).cast("int"))
    base = ngram_jaccard_pairs(
        d, group_col="grp_col", threshold=0.5, prefix_filter=False
    )
    pref = ngram_jaccard_pairs(
        d, group_col="grp_col", threshold=0.5, prefix_filter=True
    )
    assert _pairs_sorted(base) == _pairs_sorted(pref)


def test_prefix_filter_matches_under_tight_df_cap(spark, docs):
    # A cap LOW enough to actually drop postings on the smoke corpus:
    # the prefix bound uses the FULL set size while the posted set is
    # the capped one, so equality here pins the cap-interaction proof.
    from interlinked_spark.llm.dedup import ngram_jaccard_pairs

    base = ngram_jaccard_pairs(
        docs, threshold=0.4, max_shingle_df=2, prefix_filter=False
    )
    pref = ngram_jaccard_pairs(
        docs, threshold=0.4, max_shingle_df=2, prefix_filter=True
    )
    assert _pairs_sorted(base) == _pairs_sorted(pref)


def test_prefix_filter_auto_threshold_gate(spark, docs):
    # auto = on at clustering thresholds, off at screening thresholds —
    # pinned via the plan: the prefix path carries an array_intersect
    # verify, the counting path never does.
    from interlinked_spark.llm.dedup import ngram_jaccard_pairs

    on_plan = ngram_jaccard_pairs(docs, threshold=0.5)._jdf.queryExecution().optimizedPlan().toString()
    off_plan = ngram_jaccard_pairs(docs, threshold=0.05)._jdf.queryExecution().optimizedPlan().toString()
    assert "array_intersect" in on_plan
    assert "array_intersect" not in off_plan


# ---------- spread compute floor (operators/partitioning.spread) ----------


def test_spread_caps_tiny_frames_below_parallelism(spark):
    from interlinked_spark.operators.partitioning import spread

    tiny = spark.read.parquet(f"{SF}/documents.parquet")
    out = spread(tiny)
    # The smoke corpus is a few KB: the compute floor must keep the
    # width far below the session's default parallelism.
    assert out.rdd.getNumPartitions() <= 4


def test_spread_explicit_min_parts_still_honored(spark):
    from interlinked_spark.operators.partitioning import spread

    tiny = spark.read.parquet(f"{SF}/documents.parquet")
    out = spread(tiny, min_parts=6)
    assert out.rdd.getNumPartitions() == 6


def test_spread_bytes_per_task_widens_expensive_kernels(spark):
    from interlinked_spark.operators.partitioning import spread

    tiny = spark.read.parquet(f"{SF}/documents.parquet")
    wide = spread(tiny, bytes_per_task=64)
    narrow = spread(tiny, bytes_per_task=1 << 30)
    assert wide.rdd.getNumPartitions() > narrow.rdd.getNumPartitions()


def test_spread_results_unchanged(spark):
    from interlinked_spark.operators.partitioning import spread

    df = spark.read.parquet(f"{SF}/documents.parquet")
    assert sorted(r.doc_id for r in spread(df).collect()) == sorted(
        r.doc_id for r in df.collect()
    )


# ---------- sized index file count (llm/dedup._sized_file_count) ----------


def test_shingle_index_file_count_scales_with_source(spark, docs, tmp_path):
    from interlinked_spark.llm.dedup import _sized_file_count, build_shingle_index

    assert _sized_file_count(docs, 32) == 1  # KB-scale smoke corpus
    path = str(tmp_path / "idx")
    build_shingle_index(docs, path, n=3)
    import glob

    assert len(glob.glob(f"{path}/part-*")) == 1
