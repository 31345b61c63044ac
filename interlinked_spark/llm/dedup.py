"""Deduplication operators for training-data pipelines (SURVEY.md §2b-K).

Four tiers, cheapest first:

1. exact — hash-groupBy on the normalized text; one shuffle.
2. MinHash + LSH banding — shingle -> minhash signature -> band buckets
   -> candidate pairs by bucket equi-join -> verify Jaccard.  The
   standard web-scale near-dup pipeline (one shuffle per stage, no
   all-pairs comparison).
3. SimHash — 64-bit signature whose Hamming distance tracks cosine
   similarity of token sets; bucket by signature bands for candidates.
4. n-gram Jaccard — exact set overlap on shingles for candidate pairs
   (used as the verify stage of 2/3, or standalone on small groups).

Everything is built from JVM-side primitives (split/explode/xxhash64/
groupBy) — no Python UDF in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.aggregates import dedup_exact


def _normalized(col: str) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def exact_text_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id document per normalized text.  The groupBy runs
    on a 64-bit hash of the text, not the text itself, so the shuffle
    moves 8 bytes + id per row instead of whole documents."""
    hashed = df.withColumn("__h", F.xxhash64(_normalized(text_col)))
    return dedup_exact(hashed, ["__h"], tie_breaker=id_col, keep="min").drop("__h")


def _shingles(text_col: str, n: int) -> F.Column:
    """Word n-gram shingles as a deduplicated array (JVM higher-order
    fns; no UDF)."""
    toks = F.split(_normalized(text_col), " ")
    return F.array_distinct(
        F.filter(
            F.transform(
                toks,
                lambda _, i: F.when(
                    i + n <= F.size(toks), F.array_join(F.slice(toks, i + 1, n), " ")
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """MinHash + LSH banding near-duplicate pairs.

    Pipeline (each arrow is one narrow or one shuffle stage):
    shingle (narrow) -> num_hashes minhashes via seeded xxhash64
    (narrow) -> band keys (narrow) -> explode bands + groupBy bucket
    (1 shuffle) -> candidate pairs (narrow) -> exact Jaccard verify
    (1 self-join shuffle on id).

    Returns ``(left_id, right_id, jaccard)`` with left < right and
    jaccard >= threshold.  At 100 TB the bucket groupBy dominates; skew
    (a viral shingle set) is bounded because buckets collect only ids,
    and pair expansion is capped per bucket by distinctness of docs.
    """
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"

    sh = df.select(F.col(id_col).alias("id"), _shingles(text_col, shingle_n).alias("sh"))
    sh = sh.filter(F.size("sh") > 0)

    # Min over seeded hashes of every shingle: minhash_i = min_s xxhash64(i, s)
    sig = sh.select(
        "id",
        "sh",
        F.array(
            *[
                F.array_min(F.transform("sh", lambda s: F.xxhash64(F.lit(i), s)))
                for i in range(num_hashes)
            ]
        ).alias("sig"),
    )
    # Band key = hash of the band's signature slice
    banded = sig.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.lit(b), F.array_join(F.slice("sig", b * rows_per_band + 1, rows_per_band), "_"))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    # Candidate pairs: docs sharing any (band, bucket)
    left = banded.select("band", "bucket", F.col("id").alias("left_id"), F.col("sh").alias("lsh"))
    right = banded.select("band", "bucket", F.col("id").alias("right_id"), F.col("sh").alias("rsh"))
    cand = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id", "lsh", "rsh")
        .dropDuplicates(["left_id", "right_id"])
    )
    inter = F.size(F.array_intersect("lsh", "rsh"))
    union = F.size(F.array_union("lsh", "rsh"))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("left_id", "right_id", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document: sign of the per-bit sum of token
    hashes.  Pure JVM expressions: token -> xxhash64 -> per-bit +/-1
    vote -> sign bit.  One narrow projection + no shuffle."""
    toks = F.array_distinct(F.split(_normalized(text_col), " "))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # vote_i = sum over tokens of (bit_i(h) ? 1 : -1); bit set iff vote > 0
    sig = None
    for i in range(bits):
        bit_vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        # 1L << i (i=63 wraps to the sign bit, as in Java)
        term = F.when(bit_vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return df.select(F.col(id_col).alias("id"), sig.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into
    ``bands`` chunks (pigeonhole: any pair within ``max_hamming < bands``
    bits shares at least one exact chunk), bucket-join candidates, then
    verify Hamming distance exactly via bit_count(xor)."""
    sig = simhash_signatures(df, text_col, id_col)
    chunk = 64 // bands
    banded = sig.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", b * chunk).bitwiseAND(F.lit((1 << chunk) - 1))
                    for b in range(bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    l = banded.select("band", "chunk", F.col("id").alias("left_id"), F.col("simhash").alias("lh"))
    r = banded.select("band", "chunk", F.col("id").alias("right_id"), F.col("simhash").alias("rh"))
    return (
        l.join(r, on=["band", "chunk"])
        .filter(F.col("left_id") < F.col("right_id"))
        .dropDuplicates(["left_id", "right_id"])
        .withColumn("hamming", F.bit_count(F.col("lh").bitwiseXOR(F.col("rh"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("left_id", "right_id", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle
    (inverted-index self-join — never all-pairs).  Optional ``group_col``
    restricts pairs to the same group (e.g. same language), shrinking
    the join.  Returns ``(left_id, right_id, jaccard)``, left < right."""
    base = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(group_col).alias("grp")] if group_col else [] ),
        _shingles(text_col, n).alias("sh"),
    ).filter(F.size("sh") > 0)
    sizes = base.select("id", *( ["grp"] if group_col else [] ), F.size("sh").alias("nsh"), F.explode("sh").alias("s"))
    on = ["s"] + (["grp"] if group_col else [])
    l = sizes.select(*on, F.col("id").alias("left_id"), F.col("nsh").alias("lns"))
    r = sizes.select(*on, F.col("id").alias("right_id"), F.col("nsh").alias("rns"))
    pair_common = (
        l.join(r, on=on)
        .filter(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id", "lns", "rns")
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("lns") + F.col("rns") - F.col("common"))
    return (
        pair_common.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )
