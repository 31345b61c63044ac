"""Workflow-semantics parity tier — run/deps/cache/multi-provide/override
behaviors pinned by ``/root/reference/tests/test_workflow.py``."""

from collections import defaultdict

import pytest

from interlinked_spark import Workflow

LOGS = defaultdict(int)
wkf = Workflow("test-wkf-core")


@wkf.provide("echo")
@wkf.provide("echo.{name}")
def echo(name="default"):
    return name


@wkf.depend(value="echo.test")
@wkf.provide("many_echo")
def many_echo(value, repeat=2):
    return " ".join([value] * repeat)


def test_run_no_depends():
    assert wkf.run("echo") == "default"
    assert wkf.run("echo.test") == "test"
    # the registered pattern itself is an exact key; params via kwargs
    assert wkf.run("echo.{name}", name="explicit") == "explicit"
    with pytest.raises(KeyError):
        wkf.by_name("spam")


def test_run_with_depends():
    assert wkf.run("many_echo") == "test test"
    bis = wkf.kw(repeat=3, name="test")
    assert bis.run("many_echo") == "test test test"


@wkf.provide("logged.{name}")
def logged(name):
    LOGS[name] += 1
    return name


@wkf.depend(first="logged.{name}", second="logged.{name}")
@wkf.provide("logged-repeater.{name}")
def logged_repeater(first, second):
    return first + second


def test_per_run_memoization():
    wkf.run("logged.ham")
    wkf.run("logged.ham")
    wkf.run("logged.spam")
    # across runs: recomputed
    assert LOGS == {"ham": 2, "spam": 1}
    # within one run: two deps on the same resource -> one call
    assert wkf.run("logged-repeater.foo") == "foofoo"
    assert LOGS == {"ham": 2, "spam": 1, "foo": 1}
    LOGS.clear()


@wkf.provide("upper.{name}", "lower.{name}")
def multi(name):
    LOGS["multi"] += 1
    return name.upper(), name.lower()


@wkf.depend(upper="upper.{name}", lower="lower.{name}")
@wkf.provide("upper-and-lower.{name}")
def up_and_low(upper, lower):
    return upper + lower


def test_multi_provide_single_evaluation():
    assert wkf.run("upper-and-lower.spam") == "SPAMspam"
    assert LOGS["multi"] == 1
    assert wkf.run("upper-and-lower.FOO") == "FOOfoo"
    assert LOGS["multi"] == 2
    LOGS.clear()


def test_multi_provide_typed_route():
    w = Workflow("test-wkf-core-uuid")

    @w.provide("lower.{name:uuid}", "upper.{name:uuid}")
    def my_uuid(name):
        return name.lower(), name.upper()

    assert (
        w.run("lower.40b4550b-f1dd-4846-bc70-d8f5f235e72b")
        == "40b4550b-f1dd-4846-bc70-d8f5f235e72b"
    )
    assert (
        w.run("upper.40b4550b-f1dd-4846-bc70-d8f5f235e72b")
        == "40B4550B-F1DD-4846-BC70-D8F5F235E72B"
    )


def test_provide_override():
    w = Workflow("test-wkf-core-override")

    @w.provide("echo")
    def echo1():
        return "default"

    with pytest.raises(ValueError):

        @w.provide("echo")
        def echo2():
            return "override"

    @w.provide("echo", _override=True)
    def echo3():
        return "override"

    assert w.run("echo") == "override"


def test_duplicate_workflow_name_rejected():
    Workflow("test-wkf-core-dupname")
    with pytest.raises(ValueError):
        Workflow("test-wkf-core-dupname")


def test_none_result_never_cached():
    w = Workflow("test-wkf-core-none")
    calls = {"n": 0}

    @w.provide("maybe")
    def maybe():
        calls["n"] += 1
        return None

    @w.depend(a="maybe", b="maybe")
    @w.provide("pair")
    def pair(a, b):
        return (a, b)

    assert w.run("pair") == (None, None)
    assert calls["n"] == 2  # quirk parity: None recomputes within a run


def test_multiple_targets_share_one_run():
    w = Workflow("test-wkf-core-multitarget")
    calls = {"n": 0}

    @w.provide("shared")
    def shared():
        calls["n"] += 1
        return "s"

    @w.depend(s="shared")
    @w.provide("t1")
    def t1(s):
        return s + "1"

    @w.depend(s="shared")
    @w.provide("t2")
    def t2(s):
        return s + "2"

    assert w.run("t1", "t2") == ("s1", "s2")
    assert calls["n"] == 1
