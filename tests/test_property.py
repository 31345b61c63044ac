"""Property-based tests (hypothesis) for the pure driver-side layer:
routing round-trips, template formatting, bind filtering."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from interlinked_spark.binding import bind
from interlinked_spark.routing import VALUE_PATTERNS, Router, compile_route
from interlinked_spark.templating import NameTemplate

import keyword

identifiers = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: not keyword.iskeyword(s)
)
ints = st.integers(-10**9, 10**9).map(str)


@given(name=identifiers)
@settings(max_examples=50)
def test_identifier_roundtrip(name):
    router = Router()
    router.add("res.{pp:identifier}", "cell")
    m = router.match(f"res.{name}")
    assert m is not None and m.kw == {"pp": name}


@given(value=ints)
@settings(max_examples=50)
def test_int_param_stays_string(value):
    router = Router()
    router.add("n.{vv:int}", 1)
    m = router.match(f"n.{value}")
    assert m is not None
    assert m.kw["vv"] == value and isinstance(m.kw["vv"], str)


@given(name=identifiers, value=identifiers)
@settings(max_examples=50)
def test_template_fmt_inverts_match(name, value):
    pattern = f"{name}.{{vv:identifier}}"
    tpl = NameTemplate(pattern)
    formatted = tpl.fmt({"vv": value})
    router = Router()
    router.add(pattern, None)
    m = router.match(formatted)
    assert m is not None and m.kw["vv"] == value


@given(
    kw=st.dictionaries(identifiers, st.integers(), max_size=6),
    accepted=st.lists(identifiers, max_size=3, unique=True),
)
@settings(max_examples=50)
def test_bind_only_passes_accepted(kw, accepted):
    received = {}

    namespace = {}
    args = ", ".join(f"{a}=None" for a in accepted)
    exec(f"def fn({args}):\n    return locals()", namespace)
    out = bind(namespace["fn"], kw=kw)()
    for k in out:
        assert k in accepted


@given(kw=st.dictionaries(identifiers, st.integers(), min_size=1, max_size=6))
@settings(max_examples=50)
def test_bind_var_kw_passes_everything(kw):
    def fn(**kwargs):
        return kwargs

    assert bind(fn, kw=kw)() == kw


@given(text=st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._- ", max_size=30))
@settings(max_examples=100)
def test_compiled_routes_never_crash_on_match(text):
    router = Router()
    for p in ("a.{xx}", "b.{yy:int}", "c/{zz:path}", "{ww:identifier}.end"):
        router.add(p, p)
    router.match(text)  # must never raise, whatever the input


# --- round 3: deterministic hash sampling (pure predicate logic) ---

import hashlib

fractions = st.floats(min_value=0.0, max_value=1.0, allow_nan=False)


def _py_keep(key: int, fraction: float, salt: str = "") -> bool:
    """Reference implementation of the hash_sample predicate."""
    if fraction >= 1.0:
        return True
    threshold = format(int(fraction * 16**8), "08x")
    prefix = hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8]
    return prefix < threshold


@given(
    keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=40, unique=True),
    f1=fractions,
    f2=fractions,
)
@settings(max_examples=50)
def test_hash_sample_fractions_nest_property(keys, f1, f2):
    """Smaller fraction always yields a subset: the property that makes
    hash samples reusable across pipeline stages."""
    lo, hi = sorted((f1, f2))
    small = {k for k in keys if _py_keep(k, lo)}
    big = {k for k in keys if _py_keep(k, hi)}
    assert small <= big
    assert {k for k in keys if _py_keep(k, 1.0)} == set(keys)


@given(
    keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=25, unique=True),
    fraction=fractions,
)
@settings(max_examples=25, deadline=None)
def test_hash_sample_sql_matches_python_reference(keys, fraction):
    """The SQL predicate emitted for the oracle keeps EXACTLY the same
    keys as the engine-side md5 logic (no off-by-one at the threshold)."""
    import duckdb

    from interlinked_spark.operators.sampling import hash_sample_sql

    con = duckdb.connect()
    values = ", ".join(f"({k})" for k in keys)
    pred = hash_sample_sql("k", fraction)
    got = {
        r[0]
        for r in con.execute(
            f"SELECT k FROM (VALUES {values}) t(k) WHERE {pred}"
        ).fetchall()
    }
    want = {k for k in keys if _py_keep(k, fraction)}
    assert got == want


@given(
    texts=st.lists(
        st.text(
            # ASCII + Latin-1 letters, digits, and whitespace incl.
            # unicode spaces.  Deliberately excludes the handful of
            # codepoints whose lowercase differs between Python and
            # DuckDB's utf8proc (e.g. U+0130 dotted İ -> 'i\u0307' in
            # Python, 'i' in utf8proc) — the oracle contract covers
            # tokenization/hashing, not exotic case folding.
            alphabet=st.characters(
                max_codepoint=0xFF,
                whitelist_categories=("Ll", "Lu", "Nd", "Zs"),
                whitelist_characters="\t\n\f\r\x0b\xa0",
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=25, deadline=None)
def test_simhash_sql_matches_python_reference(texts):
    """The DuckDB signature recompute used by the dedup_simhash_pairs
    oracle equals the engine's md5-fold SimHash bit-for-bit on
    arbitrary text (tokenization, per-bit vote, sign-bit wrap)."""
    import duckdb

    ws = re.compile(r"[ \t\n\f\r]+")

    def py_sig(t: str) -> int:
        toks = set(ws.sub(" ", t.strip(" \t\n\f\r").lower()).split(" "))
        votes = [0] * 64
        for tok in toks:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        word = 0
        for i in range(64):
            if votes[i] > 0:
                word |= 1 << i
        return word - 2**64 if word >= 2**63 else word

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") t(doc_id, text)",
        texts,
    )
    sql = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(string_split(regexp_replace(
               lower(trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13))), '\s+', ' ', 'g'), ' '))) AS tok
      FROM docs
    ),
    th AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 16))::UBIGINT AS h FROM toks),
    bits AS (
      SELECT doc_id, b.bit, SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b
      GROUP BY doc_id, b.bit
    ),
    sigs AS (
      SELECT doc_id,
             SUM(CASE WHEN vote > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS uw
      FROM bits GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN uw >= 9223372036854775808::HUGEINT
                     THEN uw - 18446744073709551616::HUGEINT ELSE uw END AS BIGINT)
    FROM sigs
    """
    got = dict(con.execute(sql).fetchall())
    for i, t in enumerate(texts):
        # Tokenization is pinned to ASCII/RE2 whitespace on BOTH sides,
        # so unicode spaces (\xa0) and \x0b are ordinary token chars.
        assert got.get(i, 0) == py_sig(t), (i, t)


@given(
    keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=25, unique=True),
    f1=fractions,
    f2=fractions,
)
@settings(max_examples=25, deadline=None)
def test_stratified_hash_sample_sql_matches_python(keys, f1, f2):
    """The stratified SQL predicate keeps exactly the engine's keys per
    stratum; strata absent from the fractions map drop entirely."""
    import duckdb

    from interlinked_spark.operators.sampling import stratified_hash_sample_sql

    fracs = {"A": f1, "B": f2}  # stratum C deliberately unlisted
    pred = stratified_hash_sample_sql("s", "k", fracs, salt="pp")
    con = duckdb.connect()
    values = ", ".join(
        f"({k}, '{'ABC'[k % 3]}')" for k in keys
    )
    got = {
        (r[0], r[1])
        for r in con.execute(
            f"SELECT k, s FROM (VALUES {values}) t(k, s) WHERE {pred}"
        ).fetchall()
    }
    want = set()
    for k in keys:
        s = "ABC"[k % 3]
        frac = fracs.get(s)
        if frac is not None and _py_keep(k, frac, salt="pp"):
            want.add((k, s))
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                max_codepoint=0x7F,
                whitelist_categories=("Ll", "Lu", "Nd"),
                whitelist_characters=" \t\n\f\r",
            ),
            max_size=50,
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=25, deadline=None)
def test_shingle_jaccard_sql_matches_python(texts):
    """The DuckDB trigram-shingle + exact-Jaccard recompute used by the
    dedup_minhash_pairs / dedup_ngram_jaccard oracles equals the
    engine's Python shingler pair-for-pair on arbitrary ASCII text."""
    import duckdb

    ws = re.compile(r"[ \t\n\f\r]+")

    def sh(t):
        toks = ws.sub(" ", t.strip(" \t\n\f\r").lower()).split(" ")
        return list(dict.fromkeys(" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)))

    py_pairs = {}
    shs = [sh(t) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = set(shs[i]), set(shs[j])
            common = len(a & b)
            if a and b and common:
                py_pairs[(i, j)] = round(common / (len(a) + len(b) - common), 6)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") t(doc_id, text)",
        texts,
    )
    sql = r"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_filter(
               list_transform(range(1, len(toks) + 1), i ->
                 CASE WHEN i + 2 <= len(toks)
                      THEN toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] END),
               x -> x IS NOT NULL)) AS sh
      FROM (SELECT doc_id,
                   string_split_regex(regexp_replace(lower(trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13))), '\s+', ' ', 'g'), ' ') AS toks
            FROM docs)
    )
    SELECT a.doc_id, b.doc_id,
           ROUND(len(list_intersect(a.sh, b.sh)) / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) > 0
    """
    got = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
    assert got == py_pairs, (got, py_pairs)
