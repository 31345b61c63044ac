"""Property-based tests (hypothesis) for OPERATOR laws — each property
checks a Spark operator against a trivially-correct Python reference on
random tiny inputs.  Few examples per property (every example is a real
Spark job); the value is the random structure, not the volume.

Determinism: every settings profile here uses ``derandomize=True`` so a
"property-verified" claim means the same thing on every machine — the
example set is a fixed function of the strategy, not of a per-run seed.
(Round 11 shipped a red test as green because 8 un-seeded examples
missed a coin-flip-probability divergence.)  Tests whose Python
reference is a cheap sequential fold get the wider ``OP_SETTINGS_DEEP``
profile; the Spark-side cost per example is a collect on <=16 rows.
"""

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SUPPRESS = [HealthCheck.function_scoped_fixture, HealthCheck.too_slow]

OP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=_SUPPRESS,
)

# Wider, still deterministic profile for properties whose reference fold
# is pure Python and whose divergences need more random structure to hit
# (order-sensitive folds, admission thresholds).
OP_SETTINGS_DEEP = settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=_SUPPRESS,
)

keys = st.integers(0, 6)
vals = st.integers(-100, 100)


@pytest.fixture(scope="module")
def sp():
    from interlinked_spark.session import get_spark

    return get_spark("prop-ops", master="local[4]")


@given(
    left=st.lists(st.tuples(keys, vals), min_size=0, max_size=12),
    right=st.lists(st.tuples(keys, vals), min_size=0, max_size=12),
    buckets=st.integers(2, 5),
)
@OP_SETTINGS
def test_salted_join_equals_plain_join(sp, left, right, buckets):
    """Salting is a pure physical rewrite: row multiset out of the
    salted join == plain inner join, for any inputs and bucket count."""
    from interlinked_spark.operators.skew import salted_join

    l = sp.createDataFrame(left or [(None, None)], "k int, lv int").filter(
        F.col("k").isNotNull()
    )
    r = sp.createDataFrame(right or [(None, None)], "k int, rv int").filter(
        F.col("k").isNotNull()
    )
    got = sorted(
        map(tuple, salted_join(l, r, on=["k"], salt_buckets=buckets).collect())
    )
    rmap = defaultdict(list)
    for k, rv in right:
        rmap[k].append(rv)
    want = sorted((k, lv, rv) for k, lv in left for rv in rmap[k])
    got_norm = sorted((row[0], row[1], row[2]) for row in got)
    assert got_norm == want


@given(
    base=st.lists(st.tuples(keys, vals), min_size=0, max_size=10),
    delta=st.lists(st.tuples(keys, vals, st.integers(0, 5)), min_size=0, max_size=10),
)
@OP_SETTINGS
def test_merge_upsert_last_writer_wins_and_idempotent(sp, base, delta):
    """merge_upsert == dict-overwrite semantics (highest version wins;
    deterministic tie-break) and applying the same delta twice changes
    nothing."""
    from interlinked_spark.operators.merge import merge_upsert

    t = sp.createDataFrame(base or [(None, None)], "k int, v int").filter(
        F.col("k").isNotNull()
    ).withColumn("ver", F.lit(-1).cast("int"))
    d = sp.createDataFrame(delta or [(None, None, None)], "k int, v int, ver int").filter(
        F.col("k").isNotNull()
    )
    once = merge_upsert(t, d, keys=["k"], version_col="ver")
    twice = merge_upsert(once, d, keys=["k"], version_col="ver")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    # python reference: per key keep max (ver, v) — matching the
    # operator's documented deterministic tie-break on the payload hash
    # is only needed on (ver) ties, so compare keys and winning ver.
    ref = {}
    for k, v in base:
        ref[k] = -1
    for k, v, ver in delta:
        if k not in ref or ver >= ref[k]:
            ref[k] = max(ver, ref.get(k, -1))
    got = {row.k: row.ver for row in once.collect()}
    assert got.keys() == ref.keys()
    assert all(got[k] == ref[k] for k in ref)


@given(
    edges=st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=18),
)
@OP_SETTINGS
def test_connected_components_matches_union_find(sp, edges):
    """connected_components == classic union-find with min-label
    canonicalization, on random graphs (self-loops included)."""
    from interlinked_spark.operators.graph import connected_components

    df = sp.createDataFrame(edges or [(None, None)], "src int, dst int").filter(
        F.col("src").isNotNull()
    )
    got = {r.vertex: r.component for r in connected_components(df).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    comp = defaultdict(list)
    for v in parent:
        comp[find(v)].append(v)
    want = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            want[v] = m
    assert got == want


@given(
    a=st.lists(keys, min_size=0, max_size=12),
    b=st.lists(keys, min_size=0, max_size=12),
)
@OP_SETTINGS
def test_set_ops_match_python_sets(sp, a, b):
    """union_distinct/intersect/difference == Python set algebra."""
    from interlinked_spark.operators.setops import (
        difference,
        intersect,
        union_distinct,
    )

    da = sp.createDataFrame([(x,) for x in a] or [(None,)], "k int").filter(
        F.col("k").isNotNull()
    )
    db = sp.createDataFrame([(x,) for x in b] or [(None,)], "k int").filter(
        F.col("k").isNotNull()
    )
    sa, sb = set(a), set(b)
    assert {r.k for r in union_distinct(da, db).collect()} == sa | sb
    assert {r.k for r in intersect(da, db).collect()} == sa & sb
    assert {r.k for r in difference(da, db).collect()} == sa - sb


@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=10),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50), vals), min_size=0, max_size=10),
)
@OP_SETTINGS
def test_asof_backward_matches_bruteforce(sp, left, right):
    """As-of backward join == per-row 'latest right at-or-before left
    time within the key' brute force."""
    from interlinked_spark.operators.joins import asof_join

    l = sp.createDataFrame(left or [(None, None)], "k int, t int").filter(
        F.col("k").isNotNull()
    ).withColumn("t", F.col("t").cast("long"))
    r = sp.createDataFrame(
        [(k, t, v, i) for i, (k, t, v) in enumerate(right)] or [(None, None, None, None)],
        "k int, t int, rv int, rid int",
    ).filter(F.col("k").isNotNull()).withColumn("t", F.col("t").cast("long"))

    got = asof_join(
        l, r, on_ts="t", right_ts="t", by=["k"],
        value_cols=["rv"], direction="backward",
    )
    got_rows = sorted(
        (row.k, row.t, row.rv) for row in got.collect()
    )

    want = []
    for k, t in left:
        cands = [(rt, i, v) for (rk, rt, v), i in ((x, j) for j, x in enumerate(right)) if rk == k and rt <= t]
        if cands:
            # engine breaks exact-time ties deterministically; compare the
            # VALUE of the max (rt) group only when unambiguous, else any
            best_t = max(c[0] for c in cands)
            tied = [c for c in cands if c[0] == best_t]
            vs = {c[2] for c in tied}
            if len(vs) == 1:
                want.append((k, t, tied[0][2]))
            else:
                want.append((k, t, None))  # ambiguous — skip value check
        else:
            want.append((k, t, None))
    want_sorted = sorted(want)
    assert len(got_rows) == len(want_sorted)
    for (gk, gt, gv), (wk, wt, wv) in zip(got_rows, want_sorted):
        assert (gk, gt) == (wk, wt)
        if wv is not None:
            assert gv == wv


@given(
    w=st.lists(st.integers(1, 8), min_size=1, max_size=4),
    salt=st.sampled_from(["", "a", "v2"]),
)
@OP_SETTINGS
def test_dataset_splits_partition_properties(sp, w, salt):
    """dataset_splits is a PARTITION of the keyspace: every row gets
    exactly one label, the Spark expression and the SQL twin agree via
    DuckDB, and band proportions track the weights on a uniform key
    set."""
    import duckdb

    from interlinked_spark.operators.sampling import (
        dataset_splits,
        dataset_splits_sql,
    )

    total = sum(w)
    weights = {f"s{i}": x / total for i, x in enumerate(w)}
    # guard against float-sum drift breaking the validator
    weights[f"s{len(w)-1}"] += 1.0 - sum(weights.values())

    df = sp.range(500).withColumnRenamed("id", "k")
    got = {r.k: r.split for r in dataset_splits(df, "k", weights, salt=salt).collect()}
    assert len(got) == 500  # exactly one label per row

    con = duckdb.connect()
    sql = dataset_splits_sql("k", weights, salt=salt)
    ref = {
        k: s_
        for k, s_ in con.execute(
            f"SELECT k, {sql} FROM (SELECT unnest(range(500)) AS k)"
        ).fetchall()
    }
    assert got == ref


@given(
    ws=st.lists(st.lists(st.integers(1, 8), min_size=1, max_size=3),
                min_size=1, max_size=3),
    with_default=st.booleans(),
    salt=st.sampled_from(["", "v2"]),
)
@OP_SETTINGS
def test_dataset_splits_stratified_partition_properties(sp, ws, with_default, salt):
    """Stratified splits PARTITION the keyspace per stratum: every row
    whose stratum is laid out (or covered by the default) gets exactly
    one label, rows of unlisted strata get NULL when no default is set,
    the Spark expression agrees with the SQL twin via DuckDB, and the
    assignment depends only on (key, stratum-layout) — the same key in
    two strata with the SAME layout gets the same label."""
    import duckdb

    from interlinked_spark.operators.sampling import (
        dataset_splits_stratified,
        dataset_splits_stratified_sql,
    )

    def normalize(w):
        total = sum(w)
        out = {f"s{i}": x / total for i, x in enumerate(w)}
        out[f"s{len(w)-1}"] += 1.0 - sum(out.values())
        return out

    weights = {f"g{i}": normalize(w) for i, w in enumerate(ws)}
    default = normalize([3, 1, 1]) if with_default else None
    n_strata = len(ws) + 1  # one extra UNLISTED stratum
    rows = [(k, f"g{k % n_strata}") for k in range(300)]
    df = sp.createDataFrame(rows, ["k", "grp"])
    got = {
        r.k: r.split
        for r in dataset_splits_stratified(
            df, "k", "grp", weights, default=default, salt=salt
        ).collect()
    }
    assert len(got) == 300
    for k, split in got.items():
        grp = f"g{k % n_strata}"
        if grp in weights:
            assert split in weights[grp]
        elif default is not None:
            assert split in default
        else:
            assert split is None  # unlisted stratum surfaces, not guesses

    sql = dataset_splits_stratified_sql("k", "grp", weights, default=default, salt=salt)
    con = duckdb.connect()
    ref = {
        k: s_
        for k, s_ in con.execute(
            f"SELECT k, {sql} FROM (SELECT unnest(range(300)) AS k, "
            f"'g' || CAST(unnest(range(300)) % {n_strata} AS VARCHAR) AS grp)"
        ).fetchall()
    }
    assert got == ref

    # Same layout in two strata => same labels (hash keyed on k alone).
    two = {"a": weights["g0"], "b": weights["g0"]}
    both = sp.createDataFrame(
        [(k, g) for k in range(100) for g in ("a", "b")], ["k", "grp"]
    )
    per_key = defaultdict(set)
    for r in dataset_splits_stratified(both, "k", "grp", two, salt=salt).collect():
        per_key[r.k].add(r.split)
    assert all(len(v) == 1 for v in per_key.values())


def test_ngram_jaccard_group_col_never_crosses_groups(sp):
    """ngram_jaccard_pairs(group_col=) emits no cross-group pair even
    for texts that are exact duplicates across groups, and within-group
    jaccard equals the ungrouped computation restricted to the group."""
    from interlinked_spark.llm.dedup import ngram_jaccard_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog today", "en"),
        (3, "the quick brown fox jumps over the lazy dog", "de"),  # xlate dup
        (4, "completely different text with no shared shingles here", "en"),
    ]
    df = sp.createDataFrame(rows, ["doc_id", "text", "lang"])
    grouped = ngram_jaccard_pairs(df, group_col="lang", n=3, threshold=0.05)
    pairs = {(r.left_id, r.right_id) for r in grouped.collect()}
    assert (1, 3) not in pairs and (2, 3) not in pairs  # never cross lang
    assert (1, 2) in pairs  # within-group near-dup survives

    ungrouped = {
        (r.left_id, r.right_id): r.jaccard
        for r in ngram_jaccard_pairs(
            df.filter(F.col("lang") == "en"), n=3, threshold=0.05
        ).collect()
    }
    got = {(r.left_id, r.right_id): r.jaccard for r in grouped.collect()}
    assert got == ungrouped


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=0,
        max_size=18,
    ),
    n=st.integers(4, 12),
)
@OP_SETTINGS
def test_greedy_first_fit_matches_sequential_reference(sp, edges, n):
    """greedy_first_fit == the trivially-correct sequential greedy MIS:
    walk ids ascending, keep a vertex iff no kept neighbor so far.
    Also pins the two policy laws — kept set is independent (no edge
    inside) and maximal (every rejected vertex has a kept earlier
    neighbor)."""
    from interlinked_spark.operators.graph import greedy_first_fit

    es = sorted({(min(a, b), max(a, b)) for a, b in edges if max(a, b) < n})
    adj = defaultdict(set)
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    kept = set()
    for v in range(n):
        if not (adj[v] & kept & set(range(v))):
            kept.add(v)

    edf = sp.createDataFrame(es or [(0, 1)], ["left_id", "right_id"])
    if not es:
        edf = edf.limit(0)
    vdf = sp.range(n).withColumnRenamed("id", "vertex")
    got = {r.vertex: r.kept for r in greedy_first_fit(edf, vdf).collect()}
    assert got == {v: v in kept for v in range(n)}
    for a, b in es:  # independence
        assert not (got[a] and got[b])
    for v in range(n):  # maximality w.r.t. earlier neighbors
        if not got[v]:
            assert any(e < v and got[e] for e in adj[v])


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 40)),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    bucket_width=st.integers(1, 60),
    capacity=st.integers(1, 50),
)
@OP_SETTINGS
def test_packing_matches_python_reference(sp, rows, bucket_width, capacity):
    """packed_assignments == the trivial sequential packer: sort by id,
    running offset, span arithmetic — for ANY bucket_width (the
    two-phase decomposition must be invisible)."""
    from interlinked_spark.llm.packing import packed_assignments

    df = sp.createDataFrame(rows, "doc_id int, n_tok int") if rows else None
    if df is None:
        return
    placed = packed_assignments(df, "n_tok", "doc_id", capacity, bucket_width)
    got = {
        r["doc_id"]: (r["offset"], r["seq_first"], r["seq_last"])
        for r in placed.collect()
    }
    want = {}
    off = 0
    for doc_id, n_tok in sorted(rows):
        if n_tok <= 0:
            continue
        want[doc_id] = (off, off // capacity, (off + n_tok - 1) // capacity)
        off += n_tok
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 100), st.sampled_from("abc"), st.integers(1, 30)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
)
@OP_SETTINGS
def test_grouped_prefix_sum_matches_python_reference(sp, rows):
    from interlinked_spark.llm.packing import global_running_sum

    df = sp.createDataFrame(rows, "doc_id int, grp string, n_tok int")
    got = {
        r["doc_id"]: r["offset"]
        for r in global_running_sum(
            df, "n_tok", "doc_id", bucket_width=7, group_col="grp"
        ).collect()
    }
    want = {}
    per_group = defaultdict(int)
    for doc_id, grp, n_tok in sorted(rows):
        want[doc_id] = per_group[grp]
        per_group[grp] += n_tok
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.floats(0.0, 99.999)),
        min_size=1,
        max_size=25,
    ),
    bins=st.integers(2, 20),
    q=st.sampled_from([0.25, 0.5, 0.9]),
)
@OP_SETTINGS
def test_qhist_quantile_bound_law(sp, rows, bins, q, tmp_path_factory):
    """For ANY in-domain data, grid and q: the histogram estimate lands
    within one bin width ABOVE the exact rank-ceil(q*n) statistic, and
    any 2-way batch split sums to the one-shot histogram."""
    import math

    from interlinked_spark.operators.sketches import (
        qhist_bins,
        qhist_build,
        qhist_quantiles,
        qhist_update,
    )

    df = sp.createDataFrame(
        [(g, float(v), i) for i, (g, v) in enumerate(rows)], "g int, v double, i int"
    )
    path = str(tmp_path_factory.mktemp("qh") / "state")
    qhist_build(df.filter(F.col("i") % 2 == 0), ["g"], "v", path, 0.0, 100.0, bins)
    if df.filter(F.col("i") % 2 == 1).count():
        qhist_update(df.filter(F.col("i") % 2 == 1), ["g"], "v", path)
    width = 100.0 / bins

    est = {
        (r.g, r.q): r.est
        for r in qhist_quantiles(sp, path, ["g"], [q]).collect()
    }
    by_g = defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    for g, vs in by_g.items():
        vs.sort()
        exact = vs[max(1, math.ceil(q * len(vs))) - 1]
        diff = est[(g, q)] - exact
        # +5e-7: est is rounded to 6dp (engine convention) and may land
        # just above the unrounded upper bin edge.
        assert -1e-9 <= diff <= width + 5.1e-7, (g, vs, est[(g, q)], exact)

    summed = {
        (r.g, r.bin): r.c
        for r in sp.read.parquet(f"{path}/state")
        .groupBy("g", "bin")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    oneshot = {
        (r.g, r.bin): r.c for r in qhist_bins(df, ["g"], "v", 0.0, 100.0, bins).collect()
    }
    assert summed == oneshot


@given(
    n_rows=st.integers(1, 30),
    n=st.integers(1, 10),
    wmod=st.integers(2, 9),
)
@OP_SETTINGS
def test_weighted_sample_matches_sequential_aes(sp, n_rows, n, wmod):
    """The distributed A-ES top-n equals the sequential reference
    (compute every priority in Python with the same md5 arithmetic,
    take the n largest) for any table size, sample size and weights."""
    import hashlib
    import math

    from interlinked_spark.operators.sampling import weighted_sample_topn

    rows = [(i, float(i % wmod + 1)) for i in range(n_rows)]
    df = sp.createDataFrame(rows, "id long, w double")

    def prio(i, w):
        h = int(hashlib.md5(f"aes{i}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 16**8
        return round(math.log(u) / w, 6)

    ref = sorted(rows, key=lambda r: (-prio(r[0], r[1]), r[0]))[:n]
    got = sorted(
        (r.id, r.w) for r in weighted_sample_topn(df, "id", "w", n).collect()
    )
    assert got == sorted(ref)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=20
    )
)
@OP_SETTINGS
def test_triangle_counts_match_bruteforce(sp, edges):
    """Degree-oriented forward counting == brute-force triple loop on
    the canonical undirected simple graph, for any random edge list
    (self-loops and duplicate/reversed edges included)."""
    from itertools import combinations

    from interlinked_spark.operators.graph import triangle_counts

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    expect_tri = defaultdict(int)
    for x, y, z in combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                expect_tri[v] += 1

    df = sp.createDataFrame(edges or [(0, 0)], "a long, b long")
    got = {r["vertex"]: r for r in triangle_counts(df).collect()}
    assert set(got) == set(adj)
    for v in adj:
        assert got[v]["degree"] == len(adj[v])
        assert got[v]["triangles"] == expect_tri[v]
        d = len(adj[v])
        expect_cc = round(2.0 * expect_tri[v] / (d * (d - 1.0)), 6) if d >= 2 else 0.0
        assert got[v]["clustering"] == expect_cc


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-50, 50)),
            st.one_of(st.none(), st.text("abc", min_size=0, max_size=3)),
        ),
        min_size=1,
        max_size=15,
    )
)
@OP_SETTINGS
def test_profile_table_matches_python_reference(sp, rows):
    """One-pass profile == per-column Python recompute (nulls, exact
    distincts, min/max) for any random frame with nulls."""
    from interlinked_spark.operators.diagnostics import profile_table

    df = sp.createDataFrame(rows, "n long, s string")
    got = {r["column"]: r for r in profile_table(df).collect()}
    ns = [r[0] for r in rows]
    ss = [r[1] for r in rows]
    for col, vals, numeric in (("n", ns, True), ("s", ss, False)):
        nn = [v for v in vals if v is not None]
        assert got[col]["n_rows"] == len(rows)
        assert got[col]["n_nulls"] == vals.count(None)
        assert got[col]["n_distinct"] == len(set(nn))
        if numeric:
            assert got[col]["min_num"] == (float(min(nn)) if nn else None)
            assert got[col]["max_num"] == (float(max(nn)) if nn else None)
        else:
            assert got[col]["min_str"] == (min(nn) if nn else None)
            assert got[col]["max_str"] == (max(nn) if nn else None)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 200), st.integers(1, 40)),
        min_size=0, max_size=16, unique_by=lambda t: t[1],
    ),
    budget=st.integers(0, 300),
    bucket_chars=st.integers(1, 2),
)
@OP_SETTINGS_DEEP
def test_budget_select_matches_python_prefix(sp, rows, budget, bucket_chars):
    """budget_select == the sequential hash-order PREFIX fold, for any
    sizes/budget/bucketing; selected mass never exceeds the budget and
    a larger budget's selection is a superset.

    Prefix semantics (matches the operator, ``budget_select_sql``, and
    both driver oracles): the running total accrues over EVERY row in
    hash order, and a row is admitted iff its inclusive running total is
    within budget — so the first over-budget row blocks everything after
    it.  This is deliberately NOT first-fit (where a skipped row leaves
    the budget unchanged and a later smaller row can still be admitted):
    prefix keeps the selection a contiguous hash-order prefix, which is
    what makes the bucketed two-phase distributed plan (and incremental
    re-runs under a grown budget — the superset law below) possible.
    """
    import hashlib

    from interlinked_spark.operators.sampling import budget_select

    df = sp.createDataFrame(rows or [(None, None, None)], "g int, k int, sz int").filter(
        F.col("k").isNotNull()
    )
    got = {
        (r.g, r.k)
        for r in budget_select(df, "g", "k", "sz", budgets=budget,
                               bucket_chars=bucket_chars).collect()
    }

    def h(k):
        return hashlib.md5(str(k).encode()).hexdigest()

    want, cum = set(), defaultdict(int)
    for g, k, sz in sorted(rows, key=lambda t: (t[0], h(t[1]), t[1])):
        cum[g] += sz  # accrue unconditionally: prefix, not first-fit
        if cum[g] <= budget:
            want.add((g, k))
    assert got == want

    bigger = {
        (r.g, r.k)
        for r in budget_select(df, "g", "k", "sz", budgets=budget + 50,
                               bucket_chars=bucket_chars).collect()
    }
    assert got <= bigger


@given(
    left=st.lists(st.text(alphabet="ab c", min_size=1, max_size=8),
                  min_size=0, max_size=6),
    right=st.lists(st.text(alphabet="ab c", min_size=1, max_size=8),
                   min_size=0, max_size=6),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
@OP_SETTINGS
def test_fuzzy_join_matches_python_reference(sp, left, right, threshold):
    """fuzzy_string_join == brute-force q-gram Jaccard over the cross
    product (tiny inputs), and a higher threshold's pairs are a subset."""
    from interlinked_spark.operators.joins import fuzzy_string_join

    l = sp.createDataFrame(
        list(enumerate(left)) or [(None, None)], "lid int, ls string"
    ).filter(F.col("lid").isNotNull())
    r = sp.createDataFrame(
        list(enumerate(right)) or [(None, None)], "rid int, rs string"
    ).filter(F.col("rid").isNotNull())
    got = {
        (x.lid, x.rid)
        for x in fuzzy_string_join(l, r, "ls", "rs", "lid", "rid",
                                   threshold=threshold).collect()
    }

    def grams(s):
        s = " ".join(s.lower().strip().split())
        return {s[i:i + 3] for i in range(max(len(s) - 2, 1))}

    want = set()
    for i, a in enumerate(left):
        ga = grams(a)
        for j, b in enumerate(right):
            gb = grams(b)
            if len(ga & gb) / len(ga | gb) >= threshold:
                want.add((i, j))
    assert got == want

    stricter = {
        (x.lid, x.rid)
        for x in fuzzy_string_join(l, r, "ls", "rs", "lid", "rid",
                                   threshold=min(threshold + 0.2, 1.0)).collect()
    }
    assert stricter <= got

@given(
    left=st.lists(st.text(alphabet="ab c", min_size=1, max_size=8),
                  min_size=0, max_size=6),
    right=st.lists(st.text(alphabet="ab c", min_size=1, max_size=8),
                   min_size=0, max_size=6),
    d=st.sampled_from([0, 1, 2]),
)
@OP_SETTINGS
def test_edit_distance_join_matches_python_reference(sp, left, right, d):
    """edit_distance_join == brute-force Levenshtein over the cross
    product of normalized strings — the q-gram count filter and the
    short-string band must cost ZERO recall at any distance; a tighter
    distance's pairs are a subset."""
    from interlinked_spark.operators.joins import edit_distance_join

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def norm(s):
        return " ".join(s.lower().strip().split())

    l = sp.createDataFrame(
        list(enumerate(left)) or [(None, None)], "lid int, ls string"
    ).filter(F.col("lid").isNotNull())
    r = sp.createDataFrame(
        list(enumerate(right)) or [(None, None)], "rid int, rs string"
    ).filter(F.col("rid").isNotNull())
    got = {
        (x.lid, x.rid, x.distance)
        for x in edit_distance_join(l, r, "ls", "rs", "lid", "rid",
                                    max_distance=d, q=2).collect()
    }
    want = {
        (i, j, lev(norm(a), norm(b)))
        for i, a in enumerate(left)
        for j, b in enumerate(right)
        if lev(norm(a), norm(b)) <= d
    }
    assert got == want

    if d > 0:
        tighter = {
            (x.lid, x.rid)
            for x in edit_distance_join(l, r, "ls", "rs", "lid", "rid",
                                        max_distance=d - 1, q=2).collect()
        }
        assert tighter <= {(i, j) for i, j, _ in got}
