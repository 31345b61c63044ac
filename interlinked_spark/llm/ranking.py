"""Corpus ranking / term-weighting operators (SURVEY.md §2b-K
extensions): TF-IDF and BM25 — the classic lexical relevance kernels a
training-data pipeline uses for quality filtering, near-topic selection
and retrieval baselines.

All JVM-side: tokenize with ``split``, pivot to a (doc, term) posting
table with ``explode`` + hash aggregate, join document frequencies back
term-keyed.  Corpus scalars (N, avgdl) ride along as a broadcast
one-row cross join — never a driver collect, so the whole plan stays
lazy and distributed at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _postings(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf, dl): term frequency + document length via ONE
    explode + hash aggregate (dl = whitespace token count, carried with
    a first() since it is constant per doc)."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    return (
        df.select(F.col(id_col).alias("id"), F.size(toks).alias("dl"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_term_df: int | None = 1_000_000,
) -> DataFrame:
    """Smoothed TF-IDF per (document, term):
    ``tfidf = tf * (ln((N + 1) / (df + 1)) + 1)``.

    Returns ``(id, term, tf, tfidf)``.  Two shuffles (postings, term
    df) + one term-keyed join; the corpus size N broadcasts as a
    one-row literal frame.  The postings table feeds BOTH the df
    aggregate and the scoring join; A/B-tested leaving the recompute in
    place vs localCheckpoint — the checkpoint LOST (5.4s -> 8.8s at
    sf0.1): both branches partial-aggregate below the exchange, so the
    recompute is cheaper than materializing the full postings table.

    ``max_term_df`` drops terms appearing in more than that many
    documents BEFORE the term-keyed scoring join (inner join against the
    capped df table).  At corpus scale the term key is Zipf-skewed —
    stopwords like 'the' appear in ~every document and would funnel a
    huge fraction of the postings through a handful of reducers; the cap
    removes those hot keys deterministically (they carry near-zero idf
    anyway), the same trade as ``max_shingle_df`` in dedup.  The default
    is FINITE (1M docs) so the naive call is safe at corpus scale: a
    term must appear in >1M documents to be dropped, at which point its
    smoothed idf is within noise of the floor anyway.  Pass ``None``
    explicitly to score truly every term (small-corpus / exact-oracle
    use)."""
    postings = _postings(df, text_col, id_col)
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    doc_freq = postings.groupBy("term").agg(F.countDistinct("id").alias("df"))
    if max_term_df is not None:
        doc_freq = doc_freq.filter(F.col("df") <= max_term_df)
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    return (
        postings.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("id", "term", "tf", (F.col("tf") * idf).alias("tfidf"))
    )


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 document scores for a bag of query terms:
    ``score = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
    with ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)``.

    The postings table is filtered to the query terms FIRST, so the df
    aggregate and the scoring join touch only matching postings — at
    100 TB that filter prunes virtually the entire term space.  Returns
    ``(id, score)`` for documents matching >= 1 term."""
    terms = [t.lower() for t in query_terms]
    postings = _postings(df, text_col, id_col).filter(F.col("term").isin(terms))
    stats = df.select(
        F.countDistinct(id_col).alias("n_docs"),
        F.avg(F.size(F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "))).alias("avgdl"),
    )
    doc_freq = postings.groupBy("term").agg(F.countDistinct("id").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        postings.join(F.broadcast(doc_freq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(F.sum(idf * tf_part).alias("score"))
    )


def feature_hash_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    signed: bool = True,
) -> DataFrame:
    """Hashing-trick vectorizer (§2b-K feature family): token counts
    folded into a FIXED ``dim``-bucket space via the md5 of the token —
    the vocabulary-free featurizer (no fit pass, no vocab table, no
    OOV) that turns 100 TB of text into bounded-width model input in
    one explode + one hash aggregate.

    ``signed=True`` applies the standard sign trick (Weinberger et al.
    2009): a second hash bit flips each token's contribution to ±1, so
    colliding tokens cancel in expectation instead of biasing the
    bucket upward.  Both hashes come from ONE md5: bucket = first 8 hex
    chars mod ``dim``, sign = the 9th hex char's top bit — engine-
    portable (the DuckDB twin is the identical arithmetic), so the
    vectorizer is value-oracle-able.

    Returns the sparse representation ``(id, bucket, value)`` with
    exact zero-sum buckets dropped (they carry no information and
    sparsity IS the point).  ``value`` is the signed occurrence sum."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("term")
    )
    h = F.md5(F.col("term"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % int(dim)
    if signed:
        sign = F.when(F.substring(h, 9, 1) < "8", 1).otherwise(-1)
    else:
        sign = F.lit(1)
    return (
        exploded.select("id", bucket.alias("bucket"), sign.alias("__sg"))
        .groupBy("id", "bucket")
        .agg(F.sum("__sg").alias("value"))
        .filter(F.col("value") != 0)
    )


def rrf_fuse(
    rankers: Sequence[DataFrame],
    id_col: str = "id",
    score_col: str = "score",
    top_n: int = 100,
    k: int = 60,
    round_dp: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N rankers:
    ``rrf(d) = sum_i 1 / (k + rank_i(d))`` over each ranker's top-N
    list — the classic hybrid-retrieval combiner (BM25 + embedding
    cosine) that needs no score calibration because only RANKS enter.

    Scale shape: RRF is defined over the rankers' top-N LISTS, not the
    corpus — so each ranker first cuts to ``top_n`` via
    TakeOrderedAndProject (never a global sort), and the rank window
    runs on that bounded frame (<= top_n rows — the documented
    single-partition-window exception).  Scores round to ``round_dp``
    BEFORE ranking with an id tiebreak, so both engines cut and rank
    identical lists.

    Returns ``(id, rrf_score, n_lists)`` for every doc in >= 1 list."""
    from pyspark.sql import Window

    parts = []
    for r in rankers:
        cut = (
            r.select(
                F.col(id_col).alias("id"),
                F.round(F.col(score_col), round_dp).alias("__s"),
            )
            .orderBy(F.col("__s").desc(), F.col("id").asc())
            .limit(int(top_n))
        )
        rank_w = Window.orderBy(F.col("__s").desc(), F.col("id").asc())
        parts.append(
            cut.select(
                "id",
                (1.0 / (int(k) + F.row_number().over(rank_w))).alias("__c"),
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    return allc.groupBy("id").agg(
        F.round(F.sum("__c"), round_dp).alias("rrf_score"),
        F.count("*").cast("bigint").alias("n_lists"),
    )


def _hashed_ngram_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int,
) -> DataFrame:
    """Per-document hashed unigram+bigram occurrence counts ``(id,
    bucket, cnt)`` — the DSIR feature space (Xie et al. 2023 use hashed
    n-gram bags for both the target and raw language models).  Bucket
    arithmetic is the :func:`feature_hash_counts` md5 fold (first 8 hex
    chars mod ``dim``), applied to tokens AND adjacent token pairs
    built row-locally; no sign trick — these are count features for a
    probability model, not a cancelling vectorizer."""
    tk = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    bigrams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat_ws(" ", F.slice(tk, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(tk, bigrams)
    exploded = df.select(F.col(id_col).alias("id"), F.explode(feats).alias("f"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("f")), 1, 8), 16, 10).cast("long") % int(dim)
    )
    return (
        exploded.select("id", bucket.alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def dsir_select(
    pool: DataFrame,
    target: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    alpha: float = 0.5,
    salt: str = "dsir",
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023): pick ``k`` pool documents whose hashed-n-gram distribution
    looks most like the TARGET domain, via Gumbel-top-k resampling
    under importance log-weights ``log p_target(x) - log p_raw(x)``
    from two add-``alpha``-smoothed hashed unigram+bigram LMs — the
    standard pretraining-corpus domain-selection primitive (select web
    documents that look like Wikipedia/books/code).

    Scale shape: both LMs are ``dim``-bucket count aggregates (the
    model is KBs — broadcastable, no vocab table); scoring is one
    equi-join of per-doc sparse features against the broadcast model +
    one per-doc sum; selection is Gumbel-perturbed TakeOrdered (never a
    global sort).  Every stochastic piece is md5-deterministic (the
    A-ES/bootstrap convention), so an IMPORTANCE-RESAMPLING op is
    value-hash-gateable: per-bucket log-ratios round to 8dp BEFORE the
    per-doc sum (identical lattice inputs cross-engine), the doc sum
    and the Gumbel perturbation round to 6dp, ties break on id.

    Smoothing covers the whole ``dim``-bucket space (``+ alpha*dim``
    mass), so buckets unseen in the target corpus contribute the floor
    probability, never -inf.

    Why the model is INTEGER-scaled (lattice discipline, learned the
    hard way): per-bucket log-ratios quantized to 1e-8 units as BIGINT
    make the per-doc weighted sum EXACT integer arithmetic — a plain
    double sum of 8dp lattice values lands exactly on a 6dp ROUNDING
    MIDPOINT for ~1% of documents (the exact decimal sum ends in
    ...50e-8), turning the round into a cross-engine coin flip decided
    by summation-order ulps (observed: one flipped doc at sf0.01).
    The 6dp weight is then ``floor((s + 50) / 100) / 1e6`` — midpoints
    decided by exact integer arithmetic, identically everywhere.
    Returns ``(rank, doc_id, log_weight, sel_key)``, rank 1..k by
    perturbed weight."""
    feats = _hashed_ngram_counts(pool, text_col, id_col, dim)
    tfeat = _hashed_ngram_counts(target, text_col, id_col, dim)
    raw_m = feats.groupBy("bucket").agg(F.sum("cnt").alias("__rn"))
    tgt_m = tfeat.groupBy("bucket").agg(F.sum("cnt").alias("__tn"))
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    # model = raw buckets (every scored bucket has raw count >= 1: the
    # raw LM is fit on the pool itself) left-joined to target counts;
    # the frame is <= dim rows — the documented categorical-sized
    # global-window exception, then a broadcast join to doc features.
    model = (
        raw_m.join(tgt_m, "bucket", "left")
        .select(
            "bucket",
            "__rn",
            F.coalesce("__tn", F.lit(0)).alias("__tn"),
            F.sum("__rn").over(w_all).alias("__R"),
            F.sum(F.coalesce("__tn", F.lit(0))).over(w_all).alias("__T"),
        )
        .select(
            "bucket",
            F.floor(
                (
                    F.log(
                        (F.col("__tn") + F.lit(float(alpha)))
                        / (F.col("__T") + F.lit(float(alpha) * dim))
                    )
                    - F.log(
                        (F.col("__rn") + F.lit(float(alpha)))
                        / (F.col("__R") + F.lit(float(alpha) * dim))
                    )
                )
                * 1e8
                + F.lit(0.5)
            )
            .cast("long")
            .alias("__lr8"),
        )
    )
    logw = (
        feats.join(F.broadcast(model), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.col("__lr8")).alias("__s8"))
        .select(
            "id",
            (F.floor((F.col("__s8") + 50) / 100) / 1e6).alias("log_weight"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / 4294967296.0
    scored = logw.select(
        "id",
        "log_weight",
        (F.col("log_weight") + F.round(-F.log(-F.log(u)), 6)).alias("sel_key"),
    )
    top = scored.orderBy(F.col("sel_key").desc(), F.col("id").asc()).limit(int(k))
    from pyspark.sql import Window as W

    return top.select(
        F.row_number()
        .over(W.partitionBy().orderBy(F.col("sel_key").desc(), F.col("id").asc()))
        .alias("rank"),
        F.col("id").alias(id_col),
        "log_weight",
        F.round("sel_key", 6).alias("sel_key"),
    )
