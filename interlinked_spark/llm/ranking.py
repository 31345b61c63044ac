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
