"""Distributed BPE merge training (SURVEY.md §2b-K, iterative family).

Byte-pair-encoding tokenizer training is the canonical "iterative
aggregate" of LLM data work: each round counts adjacent symbol pairs
over the corpus, picks the most frequent, and merges it everywhere.
The scale shape implemented here:

* the corpus collapses to the WORD-FREQUENCY table first (vocabulary-
  sized — pair statistics are identical because BPE merges never cross
  word boundaries), so every round aggregates |vocab| rows, not 100 TB
  of text;
* a round is ONE groupBy over exploded adjacent pairs plus a bounded
  one-row ``collect`` of the winning pair (same bounded-scalar pattern
  as k-means centroids / CC convergence checksums);
* the merge application is a single JVM ``replace`` over the padded
  symbol string — no Python in the loop.

Merge-application semantics (pinned, engine-portable): the pair
``(a, b)`` is applied as leftmost/non-overlapping replacement of
``' a b '`` in the space-padded symbol string.  For runs of 3+
repeated symbols this merges alternate occurrences in one pass
(``l l l l`` -> ``ll l l`` -> next rounds pick up the rest) — a
documented, deterministic variant of classic sequential BPE chosen
because Spark's ``replace``, DuckDB's ``replace`` and Python's
``str.replace`` all implement the identical scan — which is what makes
the whole training loop value-oracle-able (``bpe_merges_sql`` unrolls
the same recurrence into a CTE chain, like ``graph.pagerank_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Tie-break and ordering contract for the winning pair of each round:
#: highest summed word-frequency first, then lexicographically smallest
#: pair string — total, deterministic, engine-portable.


def _symbolized_words(df: DataFrame, text_col: str) -> DataFrame:
    """(sym, freq): whitespace-lowercased word frequencies with the
    word spelled as a space-separated character-symbol string."""
    words = (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .select(F.lower("w").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    return words.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"), "freq"
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """(pair, c): adjacent symbol pairs weighted by word frequency."""
    a = F.split("sym", " ")
    idx = F.when(F.size(a) >= 2, F.sequence(F.lit(0), F.size(a) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(a, i + 1), F.element_at(a, i + 2)
        ),
    )
    return (
        syms.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("c"))
    )


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 3,
) -> DataFrame:
    """Train ``merges`` BPE merge rules over the corpus; returns the
    merge table ``(round, pair, pair_count)`` with ``round`` starting
    at 1 — the exact artifact a tokenizer ships.

    Cost model at 100 TB: one corpus-wide word-count aggregate up
    front (map-side combined), then ``merges`` rounds over the
    vocabulary-sized symbol table only.  Each round moves one row to
    the driver (the argmax pair) — the loop's only synchronization.
    """
    if merges < 1:
        raise ValueError(f"merges must be >= 1, got {merges}")
    spark = df.sparkSession
    syms = _symbolized_words(df, text_col).localCheckpoint(eager=True)
    out: list[tuple[int, str, int]] = []
    for rnd in range(1, merges + 1):
        top = (
            _pair_counts(syms)
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:  # corpus of single-char words only — nothing to merge
            break
        pair, c = top[0]["pair"], int(top[0]["c"])
        out.append((rnd, pair, c))
        merged = pair.replace(" ", "")
        # F.lit literals, never f-string SQL: a learned pair containing
        # a quote/backslash (apostrophes in real text win rounds) must
        # be data, not parsed SQL.
        syms = syms.select(
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                    F.lit(f" {pair} "),
                    F.lit(f" {merged} "),
                )
            ).alias("sym"),
            "freq",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out, "round int, pair string, pair_count long"
    )


def bpe_merges_sql(table: str, text_col: str = "text", merges: int = 3) -> str:
    """The training recurrence unrolled into a SQL CTE chain (DuckDB
    dialect) — the oracle twin of :func:`bpe_train_merges`, one CTE
    pair (pair counts + argmax + merged symbols) per round, exactly the
    construction ``graph.pagerank_sql`` uses for PageRank."""
    parts = [
        f"""w AS (
      SELECT lower(t) AS w, COUNT(*) AS freq
      FROM (SELECT unnest(string_split_regex(trim({text_col}), '\\s+')) AS t
            FROM {table})
      WHERE t <> '' GROUP BY 1),
    s0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym, freq FROM w)"""
    ]
    for i in range(1, merges + 1):
        prev = f"s{i - 1}"
        parts.append(
            f"""p{i} AS (
      SELECT a[i] || ' ' || a[i + 1] AS pair, SUM(freq) AS c
      FROM (SELECT string_split(sym, ' ') AS a, freq FROM {prev}),
           UNNEST(range(1, len(a))) AS t(i)
      GROUP BY 1),
    b{i} AS (SELECT pair, c FROM p{i} ORDER BY c DESC, pair ASC LIMIT 1),
    s{i} AS (
      SELECT trim(replace(' ' || sym || ' ',
                          ' ' || COALESCE((SELECT pair FROM b{i}), '') || ' ',
                          ' ' || replace(COALESCE((SELECT pair FROM b{i}), ''), ' ', '') || ' ')) AS sym,
             freq
      FROM {prev})"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS round, pair, CAST(c AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, merges + 1)
    )
    chain = ",\n    ".join(parts)
    return f"WITH {chain}\n    {selects}"


def bpe_token_counts(
    df: DataFrame,
    pairs: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge list — the inference half of
    :func:`bpe_train_merges`: returns ``(id_col, n_bpe_tokens)`` per
    document under the ``pairs`` merge rules (applied in order, same
    padded-replace semantics as training).

    The scale shape: merges are applied to the DISTINCT-WORD table once
    (vocabulary-sized), and documents join their words to that table —
    the corpus text is scanned exactly once to explode words, never
    re-scanned per merge rule.  All JVM expressions; ``pairs`` is a
    bounded driver-side list (the merge table a tokenizer ships)."""
    words = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .select(F.col(id_col), F.lower("w").alias("w"))
    )
    vocab = words.select("w").distinct()
    # Fold the merge chain into one nested Column expression: k replaces
    # over the padded symbol string, all inside whole-stage codegen.
    # Pairs enter as F.lit values, never f-string SQL — a learned pair
    # containing a quote/backslash must be data, not parsed SQL.
    sym = F.trim(F.regexp_replace("w", "(.)", "$1 "))
    for pair in pairs:
        merged = pair.replace(" ", "")
        sym = F.trim(
            F.replace(
                F.concat(F.lit(" "), sym, F.lit(" ")),
                F.lit(f" {pair} "),
                F.lit(f" {merged} "),
            )
        )
    tokenized = vocab.select("w", sym.alias("sym"))
    per_word = tokenized.select(
        "w", F.size(F.split("sym", " ")).alias("n_sym")
    )
    return (
        words.join(per_word, "w")
        .groupBy(id_col)
        .agg(F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"))
    )


def bpe_token_counts_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: int = 3,
) -> str:
    """Oracle twin of train-then-tokenize: extends the
    :func:`bpe_merges_sql` CTE chain to carry the word through each
    merge round, then joins documents' words back to the tokenized
    vocabulary for per-document token counts."""
    parts = [
        f"""dw AS (
      SELECT {id_col}, lower(t) AS w
      FROM (SELECT {id_col},
                   unnest(string_split_regex(trim({text_col}), '\\s+')) AS t
            FROM {table})
      WHERE t <> ''),
    w AS (SELECT w, COUNT(*) AS freq FROM dw GROUP BY 1),
    s0 AS (SELECT w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym, freq FROM w)"""
    ]
    for i in range(1, merges + 1):
        prev = f"s{i - 1}"
        parts.append(
            f"""p{i} AS (
      SELECT a[i] || ' ' || a[i + 1] AS pair, SUM(freq) AS c
      FROM (SELECT string_split(sym, ' ') AS a, freq FROM {prev}),
           UNNEST(range(1, len(a))) AS t(i)
      GROUP BY 1),
    b{i} AS (SELECT pair, c FROM p{i} ORDER BY c DESC, pair ASC LIMIT 1),
    s{i} AS (
      SELECT w,
             trim(replace(' ' || sym || ' ',
                          ' ' || COALESCE((SELECT pair FROM b{i}), '') || ' ',
                          ' ' || replace(COALESCE((SELECT pair FROM b{i}), ''), ' ', '') || ' ')) AS sym,
             freq
      FROM {prev})"""
        )
    chain = ",\n    ".join(parts)
    return (
        f"WITH {chain}\n    "
        f"SELECT dw.{id_col}, CAST(SUM(len(string_split(s.sym, ' '))) AS BIGINT) AS n_bpe_tokens\n"
        f"    FROM dw JOIN s{merges} s USING (w) GROUP BY dw.{id_col}"
    )
