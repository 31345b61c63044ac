"""Graph-validation parity tier — diamond OK, direct & indirect loops,
unknown deps, no-root — pinned by ``/root/reference/tests/test_loop.py``
and ``tests/test_validation.py``."""

import pytest

from interlinked_spark import Workflow
from interlinked_spark.exceptions import (
    LoopException,
    NoRootException,
    UnknownDependency,
)


def build_diamond():
    wkf = Workflow("")  # unnamed: stays out of the global registry

    @wkf.provide("a")
    def fn_a():
        return "a"

    @wkf.depend(a="a", c="c")
    @wkf.provide("b")
    def fn_b(a, c):
        return a + "b" + c

    @wkf.depend(a="a")
    @wkf.provide("c")
    def fn_c(a):
        return a + "c"

    @wkf.depend(b="b", c="c")
    @wkf.provide("d")
    def fn_d(b, c):
        return b + c

    return wkf, fn_a, fn_c


def test_diamond_ok():
    wkf, *_ = build_diamond()
    wkf.validate()


def test_direct_loop():
    wkf, _, fn_c = build_diamond()
    wkf.depend(d="d")(fn_c)  # C -> D closes c->d->c
    with pytest.raises(LoopException):
        wkf.validate()


def test_indirect_loop():
    wkf, _, fn_c = build_diamond()

    @wkf.depend(d="d")
    @wkf.provide("e")
    def fn_e(d):
        return d

    wkf.depend(e="e")(fn_c)  # C -> E -> D -> C, still reachable from root A
    with pytest.raises(LoopException):
        wkf.validate()


def test_cycle_hiding_all_roots_is_no_root():
    # A cycle that swallows every root surfaces as NoRootException
    # (reference quirk: validate() finds roots first).
    wkf, fn_a, _ = build_diamond()

    @wkf.depend(d="d")
    @wkf.provide("e")
    def fn_e(d):
        return d

    wkf.depend(e="e")(fn_a)
    with pytest.raises(NoRootException):
        wkf.validate()


def test_unknown_dependency_then_loop():
    loopy = Workflow("loopy-val")

    @loopy.depend(value="third", other="zero")
    @loopy.provide("first")
    def first(value, other):
        return value + other

    @loopy.depend(value="first")
    @loopy.provide("second")
    def second(value):
        return value

    @loopy.depend(value="second")
    @loopy.provide("third")
    def third(value):
        return value

    with pytest.raises(UnknownDependency):
        loopy.validate()

    @loopy.provide("zero")
    def zero():
        return None

    with pytest.raises(LoopException):
        loopy.validate()


def test_no_root():
    wkf = Workflow("")

    @wkf.depend(b="b")
    @wkf.provide("a")
    def fn_a(b):
        return b

    @wkf.depend(a="a")
    @wkf.provide("b")
    def fn_b(a):
        return a

    with pytest.raises(NoRootException):
        wkf.validate()


def test_deps_resolves_concrete_names_to_patterns():
    wkf = Workflow("")

    @wkf.provide("tbl.{name}")
    def tbl(name):
        return name

    @wkf.depend(li="tbl.lineitem")
    @wkf.provide("q")
    def q(li):
        return li

    assert wkf.deps() == {"tbl.{name}": ["q"], "q": []}
