"""Text-analysis operators (SURVEY.md §2b-K): token stats, quality
scoring, language ID, document fingerprinting, repetition signals,
benchmark decontamination.

JVM-side column expressions (split / regexp / higher-order array fns)
wherever possible — those run inside whole-stage codegen over 100 TB of
documents without a Python round-trip.  The two exceptions
(:func:`repetition_signals`, :func:`flag_contaminated`'s shingler) use
Arrow-batched pandas UDFs, the measured-faster path for HOF-heavy
string kernels (see ``dedup._with_shingles``).  Every computation here
is also expressible in ANSI SQL, which is what the DuckDB oracles
check.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: Tiny per-language stopword marker sets for the n-gram/stopword
#: language heuristic.  Deliberately small + deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "la"],
    "es": ["el", "y", "de"],
}

_TOKENS = lambda col: F.split(F.trim(F.col(col)), r"\s+")  # noqa: E731


def corpus_mix_summary(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
    min_tokens: int = 50,
) -> DataFrame:
    """Dataset-card composition stats per corpus slice (§2b-K): doc /
    token / char totals, the fraction of "long" documents, and each
    slice's TOKEN SHARE of the whole corpus — the numbers a training-mix
    spec is written in.

    One groupBy over the corpus (all JVM expressions), then the share
    ratio via a window over the AGGREGATED frame — the window input is
    |slices| rows, so the global-total pass is free even at 100 TB.
    """
    from pyspark.sql import Window

    toks = _TOKENS(text_col)
    grouped = (
        df.select(
            *group_cols,
            F.size(toks).alias("__nt"),
            F.length(F.col(text_col)).alias("__nc"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__nt").cast("long").alias("total_tokens"),
            F.sum("__nc").cast("long").alias("total_chars"),
            F.round(
                F.avg((F.col("__nt") >= min_tokens).cast("double")), 6
            ).alias("pct_long"),
        )
    )
    return grouped.withColumn(
        "token_share",
        F.round(
            F.col("total_tokens")
            / F.sum("total_tokens").over(Window.partitionBy()),
            6,
        ),
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counts: whitespace tokens plus a BPE-ish
    estimate (word-chunks of <=4 chars — a deterministic stand-in for a
    real tokenizer's ~4 chars/token rule of thumb)."""
    toks = _TOKENS(text_col)
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_chars_measured", F.length(F.col(text_col)))
        .withColumn(
            "n_bpe_est",
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
            ),
        )
        .withColumn(
            "avg_token_len",
            F.round(
                F.aggregate(
                    toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
                )
                / F.size(toks),
                6,
            ),
        )
    )


def sliding_token_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window token chunking with overlap — the RAG/long-
    context corpus-prep staple (fixed-size retrieval passages whose
    ``window - stride`` token overlap keeps boundary-straddling facts
    findable), the fixed-grid complement of the content-defined
    :func:`~..operators.reshape`-family CDC chunker (grid chunks shift
    wholesale on edits; CDC chunks don't — pick per use).

    Chunk lattice: starts at ``c * stride`` for ``c in [0, C)`` with
    ``C = 1 + ceil(max(0, n - window) / stride)`` — every token is
    covered, the LAST chunk is the only short one, and a document
    shorter than ``window`` yields exactly one chunk (empty/whitespace
    docs yield one empty chunk: callers filter, the operator doesn't
    editorialize).  Whitespace tokens (the engine's pinned
    tokenization).  Row-local: tokenize -> sequence -> explode, no
    shuffle, no state — at 100 TB this is a map job whose output is
    the retrieval corpus.  Returns ``(id, chunk_id, start_tok,
    n_tokens, chunk_text)``."""
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError(
            f"sliding_token_chunks needs 0 < stride <= window "
            f"(got window={window}, stride={stride}): a stride above "
            "the window drops the tokens between chunks."
        )
    toks = _TOKENS(text_col)
    n = F.size("__tk")
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - F.lit(window), F.lit(0)) / F.lit(float(stride)))
    ).cast("int")
    out = (
        df.select(F.col(id_col).alias("id"), toks.alias("__tk"))
        .select(
            "id",
            "__tk",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            "id",
            "chunk_id",
            (F.col("chunk_id") * stride).alias("start_tok"),
            F.slice(
                F.col("__tk"), F.col("chunk_id") * stride + 1, window
            ).alias("__chunk"),
        )
    )
    return out.select(
        "id",
        "chunk_id",
        "start_tok",
        F.size("__chunk").alias("n_tokens"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram negative log-probability under the
    corpus's OWN unigram distribution — the classic cheap
    perplexity-proxy: documents full of rare tokens (gibberish, OCR
    noise, foreign-script spills) score high, template text scores low.
    A real pipeline thresholds both tails.

    Tokens are lowercased whitespace tokens (the engine's pinned ASCII
    tokenization).  Plan shape: one explode -> token-count groupBy (the
    unigram LM), one token-keyed join back, one per-doc aggregate.
    Everything JVM-side; ``ln`` matches the oracle's natural log.

    The LM join deliberately carries NO broadcast hint: |vocab| is
    sublinear in corpus size but far from bounded (a 100-TB web crawl's
    whitespace-token vocabulary runs to billions of rows), so forcing a
    broadcast is a driver/executor OOM hazard.  AQE picks broadcast at
    runtime whenever the aggregated LM lands under the threshold — the
    small-corpus plan is unchanged, the huge-corpus plan degrades to a
    sort-merge join on ``tok`` instead of an OOM.  Callers who KNOW the
    vocab is tiny can min-count it and hint at their own call site.
    """
    toks = F.transform(_TOKENS(text_col), lambda t: F.lower(t))
    posted = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    lm = posted.groupBy("tok").agg(F.count("*").alias("__cnt"))
    # Corpus token total derived from the LM itself (|vocab| rows) and
    # broadcast as a 1-row frame — NOT a driver-side posted.count(),
    # which would be a whole extra corpus pass at 100 TB.
    tot = lm.agg(F.sum("__cnt").cast("double").alias("__total"))
    scored = (
        posted.join(lm, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("__cnt") / F.col("__total"))), 6
            ).alias("mean_neg_logprob"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col), "n_tokens", "mean_neg_logprob"
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean bigram negative log-probability under the
    corpus's OWN add-k-smoothed bigram LM — the next rung above
    :func:`unigram_logprob` on the perplexity-proxy ladder: it also
    flags documents whose WORD ORDER is improbable (shuffled text,
    keyword-stuffed spam, concatenated fragments) that a bag-of-words
    unigram score cannot see.

    ``p(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha*V)`` where
    ``c(w1)`` counts w1 as a bigram prefix and ``V`` is the distinct
    vocabulary participating in bigrams (derived from the bigram LM
    itself — no extra corpus pass).  Documents with fewer than 2 tokens
    have no bigrams and drop out.

    Plan shape: bigrams are built ROW-LOCALLY (one transform over the
    token array — no self-join, no per-doc window), then one explode ->
    two vocab-sized count aggregates -> joins back -> one per-doc
    aggregate.  The LM joins carry NO broadcast hint for the same
    reason as the unigram LM: |bigram vocab| is unbounded at 100 TB;
    AQE broadcasts when the counts are actually small."""
    # Token array staged in its OWN projection: ``element_at(toks, i)``
    # inside the pair lambda re-evaluates the whole tokenize subtree
    # per window position when ``toks`` is an expression (HOF lambdas
    # run interpreted and do not hoist free subexpressions), turning
    # the row-local build O(len^2).  Over a plain column attribute each
    # access is one array index.
    # (No ``spread`` here, deliberately: the vocab-sized aggregates
    # below emit one partial per key PER PARTITION, so widening the
    # tiny staged frame multiplies the shuffled partial-state rows —
    # measured 1.5s -> 2.4s at sf0.1.  The quadratic was the lambda
    # re-evaluation, fixed by the staging alone.)
    staged = df.select(
        F.col(id_col).alias("id"),
        F.transform(_TOKENS(text_col), lambda t: F.lower(t)).alias("__tk"),
    )
    toks = F.col("__tk")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    posted = staged.select("id", F.explode(pairs).alias("bg")).select(
        "id", "bg.w1", "bg.w2"
    )
    c2 = posted.groupBy("w1", "w2").agg(F.count("*").alias("__c2"))
    c1 = posted.groupBy("w1").agg(F.count("*").alias("__c1"))
    vocab = (
        c2.select("w1")
        .unionByName(c2.select(F.col("w2").alias("w1")))
        .agg(F.countDistinct("w1").cast("double").alias("__v"))
    )
    p = (F.col("__c2") + F.lit(float(alpha))) / (
        F.col("__c1") + F.lit(float(alpha)) * F.col("__v")
    )
    scored = (
        posted.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("mean_neg_logprob"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col), "n_bigrams", "mean_neg_logprob"
    )


def quality_scores(
    df: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Heuristic quality signals: length, punctuation ratio, stopword
    ratio, uppercase ratio — the standard cheap filters before expensive
    model-based scoring."""
    stopwords = stopwords or LANG_MARKERS["en"]
    toks = _TOKENS(text_col)
    text = F.col(text_col)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_upper = F.length(F.regexp_replace(text, "[^A-Z]", ""))
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("stopword_ratio", F.round(n_stop / F.size(toks), 6))
        .withColumn("punct_ratio", F.round(n_punct / F.length(text), 6))
        .withColumn("upper_ratio", F.round(n_upper / F.length(text), 6))
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Deterministic stopword-marker language heuristic: count marker
    hits per language, pick the argmax (ties broken by language code
    order, 'und' = undetermined when nothing matches)."""
    toks = F.transform(_TOKENS(text_col), lambda t: F.lower(t))
    scores = [
        (lang, F.size(F.filter(toks, lambda t: t.isin(*markers))))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:  # earlier (alphabetical) language wins ties
        is_better = score > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, score).otherwise(best_score)
    return df.withColumn(out_col, best)


def fingerprints(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Deterministic rolling document fingerprint: position-weighted
    token-length polynomial, ``sum((i+1) * len(tok_i) * 31^(i mod 5))``
    in long arithmetic (wraps like Java).  Cheap, order-sensitive, and
    SQL-expressible — for content-drift detection, not cryptography."""
    toks = _TOKENS(text_col)
    weighted = F.transform(
        toks,
        lambda t, i: ((i + 1) * F.length(t)).cast("long")
        * F.pow(F.lit(31.0), (i % F.lit(5)).cast("double")).cast("long"),
    )
    return df.withColumn(
        out_col, F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition quality signals, per document: the
    fraction of word ``n``-grams that are repeats and the fraction of
    (normalized) characters covered by the single most frequent
    ``n``-gram.  High values flag boilerplate / spam before pretraining.

    Computed in ONE Arrow pass per partition (struct-returning
    ``pandas_udf``) — per-document signals need no cross-document
    state, so the operator is shuffle-free and scales linearly to
    100 TB.  (The explode → groupBy → window-top-1 formulation computes
    the same thing with two shuffles; measured slower even at sf0.01.)
    Tie-break for the top gram: highest count, then lexicographically
    smallest — mirrored by the oracle's ``ORDER BY cnt DESC, gram``.

    Documents with fewer than ``n`` tokens produce no signals and are
    filtered out (no grams to measure).  The JVM prefilter tokenizes
    slightly differently from Python (Spark ``trim`` strips only
    spaces; ``split`` keeps trailing empties), so a doc like
    ``'word\\n'`` can pass the size gate yet yield zero Python
    n-grams — the UDF therefore guards the empty case with nulls,
    which are dropped after.
    """

    @F.pandas_udf(
        "struct<n_grams:long, dup_gram_frac:double, top_gram:string, "
        "top_gram_count:long, top_gram_char_frac:double>"
    )
    def rep_udf(texts: pd.Series) -> pd.DataFrame:
        ws = re.compile(r"[ \t\n\f\r]+")  # ASCII/RE2 \s: match JVM + SQL-oracle semantics

        def sig(t: str):
            norm = ws.sub(" ", t.strip(" \t\n\f\r").lower())
            toks = [tok for tok in norm.split(" ") if tok]
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if not grams:
                return (None, None, None, None, None)
            counts = Counter(grams)
            top_gram, top_count = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            # No rounding here: Python round() is half-to-even, which
            # diverges from SQL engines' half-up on exact halves (e.g.
            # 10/256 = 0.0390625) — the caller rounds with F.round.
            return (
                len(grams),
                1.0 - len(counts) / len(grams),
                top_gram,
                top_count,
                top_count * len(top_gram) / len(norm),
            )

        return pd.DataFrame(
            texts.map(sig).tolist(),
            columns=[
                "n_grams",
                "dup_gram_frac",
                "top_gram",
                "top_gram_count",
                "top_gram_char_frac",
            ],
            index=texts.index,
        )

    toks = _TOKENS(text_col)
    return (
        df.filter(F.size(toks) >= n)
        .withColumn("__sig", rep_udf(F.col(text_col)))
        .select(id_col, "__sig.*")
        .filter(F.col("n_grams").isNotNull())
        .withColumn("dup_gram_frac", F.round("dup_gram_frac", 6))
        .withColumn("top_gram_char_frac", F.round("top_gram_char_frac", 6))
    )


def flag_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination detection: return ``(doc_id,
    n_hit_grams)`` for every training document sharing at least one
    word-``n``-gram with the held-out ``benchmark`` corpus — the
    decontamination step every pretraining pipeline runs before an eval
    is trustworthy.

    100-TB shape: the benchmark n-gram set is tiny (eval suites are
    MB-scale) → ``broadcast`` inner join, so the 100-TB side is one
    scan + explode + per-doc count with NO big-table shuffle (the
    count aggregates on ``doc_id``, which pre-aggregates map-side).
    Long grams (default 5) keep natural-language collisions near zero;
    hits mean real overlap.
    """
    from .dedup import _with_shingles

    bench_grams = (
        _with_shingles(benchmark, text_col, id_col, n, out="sh")
        .select(F.explode("sh").alias("gram"))
        .distinct()
    )
    doc_grams = _with_shingles(docs, text_col, id_col, n, out="sh").select(
        F.col("id").alias(id_col), F.explode("sh").alias("gram")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )


#: PII patterns safe in BOTH Java regex (Spark) and RE2 (DuckDB):
#: plain character classes, no lookaround, no backreferences.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{7,}", "<NUM>"),  # long digit runs: phones, ids, cards
)


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str = "scrubbed") -> DataFrame:
    """Training-corpus PII redaction: emails then long digit runs
    replaced with typed placeholder tokens, plus a redaction count
    (tokens matched) for corpus audit.  Pure JVM ``regexp_replace`` —
    no Python in the row path; the patterns avoid every construct that
    differs between Java regex and RE2, so the oracle can mirror them
    verbatim."""
    scrubbed = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    n_redacted = (
        F.size(F.split(scrubbed, "<EMAIL>|<NUM>", -1)) - 1
    ).cast("int")
    return df.withColumn(out_col, scrubbed).withColumn("n_redacted", n_redacted)


def readability_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 6,
) -> DataFrame:
    """Flesch reading-ease per document (§2b-K quality family): the
    classic editorial-difficulty signal ``206.835 - 1.015 * words/
    sentences - 84.6 * syllables/words`` — a corpus-mix dial ("keep
    harder text for the curriculum tail") orthogonal to length/
    punctuation quality gates.

    Syllables use the standard vowel-GROUP proxy (runs of ``aeiouy``,
    min 1 per word — no dictionary, language-naive by design, exactly
    portable); sentences count ``[.!?]`` runs (min 1).  Everything is
    row-local Column arithmetic: one scan, no explode, no join, no
    UDF — 100 TB is a map job.

    Returns ``(id, n_words, n_sentences, n_syllables, flesch)``."""
    toks = F.transform(_TOKENS(text_col), lambda t: F.lower(t))
    words = F.size(toks)
    sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), 0)),
        F.lit(1),
    )
    syl = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, w: acc
        + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)), F.lit(1)
        ),
    )
    flesch = (
        F.lit(206.835)
        - 1.015 * (words.cast("double") / sentences)
        - 84.6 * (syl.cast("double") / words)
    )
    return df.select(
        F.col(id_col).alias("id"),
        words.cast("bigint").alias("n_words"),
        sentences.cast("bigint").alias("n_sentences"),
        syl.cast("bigint").alias("n_syllables"),
        F.round(F.when(words > 0, flesch), round_dp).alias("flesch"),
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Pointwise mutual information collocations (§2b-K): which word
    PAIRS co-occur far beyond chance — the classic phrase/collocation
    extractor ("new york", "machine learning") behind phrase-aware
    tokenization and template detection.  ``pmi = ln(p(w1,w2) /
    (p(w1) * p(w2)))`` with bigram probability over the bigram total
    and unigram probabilities over the unigram total.

    Same row-local bigram construction as :func:`bigram_logprob` (no
    self-join, no window); unigram/bigram totals ride as PROVEN
    one-row broadcasts; ``min_count`` prunes the noise floor BEFORE
    the unigram joins (rare pairs have wild PMI — the standard guard).
    With ``top_k``, orders by ROUNDED pmi with a (w1, w2) text
    tiebreak so both engines cut the same list.

    Returns ``(w1, w2, n, pmi)``."""
    # Same staged-token-array shape as :func:`bigram_logprob` — the
    # pair lambda's ``element_at`` must index a plain column, not
    # re-evaluate the tokenize subtree per position.
    # No ``spread`` — same partial-state reasoning as
    # :func:`bigram_logprob`.
    staged = df.select(
        F.transform(_TOKENS(text_col), lambda t: F.lower(t)).alias("__tk")
    )
    toks = F.col("__tk")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    posted = staged.select(F.explode(pairs).alias("bg")).select("bg.w1", "bg.w2")
    uni = staged.select(F.explode(toks).alias("w"))
    c2 = posted.groupBy("w1", "w2").agg(F.count("*").alias("n")).filter(
        F.col("n") >= int(min_count)
    )
    c1 = uni.groupBy("w").agg(F.count("*").alias("__cw"))
    nb = posted.agg(F.count("*").cast("double").alias("__nb"))
    nu = uni.agg(F.count("*").cast("double").alias("__nu"))
    joined = (
        c2.join(c1.withColumnRenamed("w", "w1").withColumnRenamed("__cw", "__c1"), "w1")
        .join(c1.withColumnRenamed("w", "w2").withColumnRenamed("__cw", "__c2"), "w2")
        .join(F.broadcast(nb))
        .join(F.broadcast(nu))
    )
    pmi = F.round(
        F.log(
            (F.col("n") / F.col("__nb"))
            / ((F.col("__c1") / F.col("__nu")) * (F.col("__c2") / F.col("__nu")))
        ),
        round_dp,
    )
    out = joined.select("w1", "w2", "n", pmi.alias("pmi"))
    if top_k is not None:
        out = out.orderBy(
            F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).limit(int(top_k))
    return out
