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
