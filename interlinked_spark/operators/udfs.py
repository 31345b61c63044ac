"""Python UDF surface (SURVEY.md §2b-I).

The reference's whole premise is "producers are arbitrary Python"
(``workflow.py:39-42``); on Spark, arbitrary Python comes in tiers by
cost, and the engine exposes them cheapest-first:

1. whole-resource driver fn returning a DataFrame (no per-row Python) —
   the default; this is just a workflow producer.
2. ``pandas_udf`` — Arrow-vectorized scalar/agg fns (~10-100x faster
   than row UDFs).
3. ``applyInPandas`` — grouped-map (per-group model fit / normalize, à
   la the reference's MLflow example ``examples/ml-flow.py:61-79``).
4. ``mapInPandas`` — streaming Arrow batches for flat-map/table fns.
5. row-at-a-time ``F.udf`` — escape hatch, deliberately last.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vectorized(return_type: str) -> Callable:
    """Decorator: Arrow-vectorized scalar UDF (pandas Series in/out)."""
    return F.pandas_udf(returnType=return_type)


def grouped_apply(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Per-group pandas transform.  Each group must fit in one
    executor's memory — keep keys fine-grained at scale."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def zscore_per_group(df: DataFrame, keys: list[str], value_col: str, out_col: str = "zscore") -> DataFrame:
    """Grouped-map example operator: sample-stddev z-score of
    ``value_col`` within each key group (ddof=1, matching SQL
    ``stddev_samp``)."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} double"]
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        pdf[out_col] = (pdf[value_col] - mean) / std if std and std > 0 else 0.0
        return pdf

    return df.groupBy(*keys).applyInPandas(norm, schema=out_schema)


def map_batches(
    df: DataFrame,
    fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    schema: str,
) -> DataFrame:
    """Arrow-batched flat map (table function): 1 row -> N rows allowed,
    memory bounded by the batch iterator."""
    return df.mapInPandas(fn, schema=schema)


def cogrouped_apply(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Cogrouped-map (§2b-I tier 3b): align BOTH tables' rows per key in
    one pass and hand the two pandas frames to ``fn`` — the Arrow path
    for per-key merges that a join would force into N x M row blowup
    (as-of alignment, per-key reconciliation, feature stitching).  One
    shuffle per side on the keys; each cogroup must fit in executor
    memory."""
    return left.groupBy(*keys).cogroup(right.groupBy(*keys)).applyInPandas(fn, schema=schema)


def cogrouped_apply_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: str,
    buckets: int = 64,
) -> DataFrame:
    """Bucketed cogrouped-map: the scale-correct variant of
    ``cogrouped_apply`` for per-key logic that is *vectorizable* inside
    pandas (counts, sums, merges via ``pdf.groupby(keys)``).

    ``applyInPandas`` over a cogroup invokes the Python ``fn`` once per
    DISTINCT KEY — at 100 TB (or even 10^5 keys locally) the per-call
    interpreter overhead dominates the actual work.  Hashing the key
    into ``buckets`` coarse groups keeps every row of a given key in
    the same cogroup (hash is a pure function of the key) while cutting
    Python invocations from O(distinct keys) to O(buckets); ``fn`` then
    sees multi-key frames and reconciles per-key with vectorized pandas.
    Use the unbucketed form only when the per-group logic genuinely
    cannot be vectorized (e.g. an iterative model fit per key).
    """
    bkt = "__cg_bucket"
    lb = left.withColumn(bkt, F.pmod(F.xxhash64(*keys), F.lit(buckets)))
    rb = right.withColumn(bkt, F.pmod(F.xxhash64(*keys), F.lit(buckets)))

    def run(o: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
        return fn(o.drop(columns=[bkt]), e.drop(columns=[bkt]))

    return lb.groupBy(bkt).cogroup(rb.groupBy(bkt)).applyInPandas(run, schema=schema)


def position_tokens_udtf():
    """Python UDTF (§2b-I tier 4b, Spark 3.5+): one input row -> N
    output rows with full table-function semantics (vs mapInPandas,
    which is batch-oriented).  Yields (pos, token) per whitespace token,
    1-based.  Register then invoke via SQL LATERAL:

        spark.udtf.register("tokens_udtf", position_tokens_udtf())
        SELECT d.doc_id, t.pos, t.token
        FROM docs d, LATERAL tokens_udtf(d.text) t
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class PositionTokens:
        def eval(self, text: str):
            import re

            if text is None:
                return
            # ASCII/RE2 whitespace, matching JVM + SQL-oracle semantics
            # (Python's bare split() also matches unicode spaces).
            norm = re.sub(r"[ \t\n\f\r]+", " ", text.strip(" \t\n\f\r").lower())
            for i, tok in enumerate(norm.split(" ")):
                yield i + 1, tok

    return PositionTokens


def arrow_map_batches(
    df: DataFrame,
    fn: Callable,
    schema: str,
) -> DataFrame:
    """Tier 4b — ``mapInArrow``: like :func:`map_batches` but the
    callable receives/returns raw ``pyarrow.RecordBatch`` objects, with
    NO Arrow <-> pandas conversion on either side.  For numeric kernels
    that compute directly on Arrow buffers (``pyarrow.compute``, numpy
    views) this skips the pandas materialization both ways — the
    cheapest Python table-function rung above whole-stage-JVM, worth it
    exactly when the per-batch work is vectorizable and the pandas
    object overhead would dominate (wide arrays, binary payloads)."""
    return df.mapInArrow(fn, schema=schema)


def embedding_arrow_stats(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector L2 norm + max component + argmax index, computed
    Arrow-natively (§2b-I mapInArrow tier): each batch's list column is
    flattened to ONE contiguous values buffer, the kernel runs as
    numpy reductions over the reshaped (rows, dim) view — zero pandas,
    zero per-row Python — and the result ships back as a RecordBatch.
    Deterministic (argmax = FIRST maximal index) so the DuckDB twin
    (``list_aggregate`` + ``list_position``) value-hash-matches.

    Null contract: a NULL or empty (zero-length) vector yields NULL for
    all three stats — the kernel never raises on them (a null list slot
    shares offsets with its neighbor in Arrow, so unguarded it would
    read a zero-width slice and ``row.max()`` would raise in the
    executor).  Elements INSIDE a vector must be non-null: the cast to
    ``array<double>`` preserves inner nulls, which become NaN under the
    numpy view and poison that row's stats (NaN norm/max) rather than
    erroring — callers wanting stricter behavior should pre-filter."""
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            ids = batch.column(0)
            vecs = batch.column(1)
            if isinstance(vecs, pa.ChunkedArray):  # pragma: no cover
                vecs = vecs.combine_chunks()
            lists = vecs
            n = len(lists)
            if n == 0:
                continue
            offs = np.asarray(lists.offsets)
            flat = np.asarray(lists.values, dtype=np.float64)
            widths = np.diff(offs)
            if lists.null_count:
                ok = np.asarray(lists.is_valid()) & (widths > 0)
            else:
                ok = widths > 0
            if ok.all() and widths.min() == widths.max():  # fixed-dim fast path
                m = flat[offs[0]: offs[-1]].reshape(n, int(widths[0]))
                norm = np.sqrt((m * m).sum(axis=1))
                mx = m.max(axis=1)
                am = m.argmax(axis=1)
                mask = None
            else:  # ragged fallback, still batch-level numpy
                norm = np.empty(n); mx = np.empty(n); am = np.zeros(n, dtype=np.int64)
                for i in range(n):
                    if not ok[i]:  # null/empty vector -> NULL stats
                        continue
                    row = flat[offs[i]: offs[i + 1]]
                    norm[i] = np.sqrt((row * row).sum())
                    mx[i] = row.max()
                    am[i] = int(row.argmax())
                mask = None if ok.all() else ~ok
            # Unrounded: callers round JVM-side (F.round, HALF_UP)
            # so the rounding rule matches the SQL oracle's ROUND,
            # not numpy's half-even.
            am_out = am.astype(np.int64) + 1
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(norm, mask=mask), pa.array(mx, mask=mask),
                 pa.array(am_out, mask=mask)],
                names=["id", "l2_norm", "max_component", "argmax_pos"],
            )

    sel = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>"))
    return arrow_map_batches(
        sel, kernel,
        "id long, l2_norm double, max_component double, argmax_pos long",
    )
