"""Distributed Naive Bayes text classification — train AND score as
pure aggregates (SURVEY.md §2b-K: the model-based filter tier).

Every production curation pipeline runs trained classifier filters
(CCNet's language model filter, GPT-3's quality classifier, fastText
language ID).  The iterative-fit route (MLlib LogisticRegression) is
neither SQL-twinnable nor oracle-able; multinomial Naive Bayes IS —
training is two keyed aggregates (label priors + per-(label, token)
counts over a capped vocabulary) and scoring is one explode + broadcast
join + keyed sum.  That closed form is what lets a TRAINED MODEL's
predictions be value-hash-gated against a SQL oracle, the same move the
engine makes for k-means (unrolled recurrence) and HLL (derived
assertions).

100-TB shape: the model is two tiny tables — ``priors`` (|labels|
rows) and ``loglik`` (|labels| x vocab_size rows, vocab capped by
document frequency with deterministic ties) — broadcast to a single
scoring scan of the corpus; per-(doc, token) counts pre-aggregate
map-side, and the per-doc argmax is a bounded per-group top-1.  No
iteration, no driver state beyond the broadcast model.

Determinism contract (the oracle's terms): log-likelihoods and priors
quantize to INTEGER micro-logs (round(ln * 1e6)) at TRAIN time, so the
per-(doc, label) score is an exact BIGINT sum — zero float-reduction
noise, bit-identical across engines and partition orders (a first cut
summed 6dp doubles and rounded at 4dp: sums of 6dp-rounded components
land ON rounding boundaries often enough that reduction order flipped
the last digit on ~0.4% of docs — review-caught).  Ties break on label
order.  Out-of-vocabulary tokens are DROPPED at score time (the
standard capped-vocab NB choice; the alternative — a shared
unseen-token likelihood — adds a per-label constant times OOV count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKENS = lambda col: F.split(F.trim(F.col(col)), r"\s+")  # noqa: E731


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 512,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB: returns ``(priors, loglik)`` —
    ``priors(label, logprior)`` and ``loglik(label, token, ll)`` over
    the top-``vocab_size`` tokens by document frequency (ties: lower
    token first).  Laplace-``alpha`` smoothing; zero-count (label,
    token) cells are materialized via the tiny labels x vocab grid so
    every vocab token has a likelihood under every label."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    tok = (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("label"),
            F.explode(_TOKENS(text_col)).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    vocab = (
        tok.select("id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token")
    )
    labels = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n")
    )
    # window total over the aggregated |labels|-row frame only
    from pyspark.sql import Window

    priors = labels.select(
        "label",
        F.round(
            F.log(F.col("n") / F.sum("n").over(Window.partitionBy())) * 1e6, 0
        )
        .cast("bigint")
        .alias("logprior"),
    )
    counts = (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("label", "token")
        .agg(F.count("*").alias("c"))
    )
    grid = labels.select("label").crossJoin(F.broadcast(vocab))
    cl = grid.join(counts, ["label", "token"], "left").select(
        "label", "token", F.coalesce("c", F.lit(0)).alias("c")
    )
    totals = cl.groupBy("label").agg(F.sum("c").alias("tot"))
    loglik = cl.join(totals, "label").select(
        "label",
        "token",
        F.round(
            F.log(
                (F.col("c") + F.lit(float(alpha)))
                / (F.col("tot") + F.lit(float(alpha) * vocab_size))
            )
            * 1e6,
            0,
        )
        .cast("bigint")
        .alias("ll"),
    )
    return priors, loglik


def nb_predict(
    docs: DataFrame,
    priors: DataFrame,
    loglik: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score + argmax: ``(id, pred_label, score)`` for every input doc
    (``score`` = the winning log-probability in nats, 6dp — derived by
    exact integer micro-log arithmetic, see module docstring).  One
    corpus scan: explode, per-(doc, token) counts (map-side combine),
    broadcast-join the model, keyed sum per (doc, label), bounded
    per-doc top-1 (ties: lower label).  Docs with zero vocab tokens
    fall back to the prior-only score (every doc gets a row)."""
    from ..operators.windows import top_k_per_group

    dt = (
        docs.select(F.col(id_col).alias("id"), F.explode(_TOKENS(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("id", "token")
        .agg(F.count("*").alias("n"))
    )
    persum = (
        dt.join(F.broadcast(loglik), "token")
        .groupBy("id", "label")
        .agg(F.sum(F.col("n") * F.col("ll")).alias("s"))
    )
    scored = (
        docs.select(F.col(id_col).alias("id"))
        .crossJoin(F.broadcast(priors))
        .join(persum, ["id", "label"], "left")
        .select(
            "id",
            "label",
            (F.col("logprior") + F.coalesce(F.col("s"), F.lit(0))).alias("__micro"),
        )
    )
    return top_k_per_group(
        scored, ["id"], [F.col("__micro").desc(), F.col("label").asc()], 1
    ).select(
        "id",
        F.col("label").alias("pred_label"),
        F.round(F.col("__micro") / 1e6, 6).alias("score"),
    )
