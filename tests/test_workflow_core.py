"""Workflow-semantics parity tier — run/deps/cache/multi-provide/
override behaviors pinned by the reference workflow suite
(``/root/reference/tests/test_workflow.py``), re-asserted against the
engine with locally-built fixtures."""

from collections import Counter

import pytest

from interlinked_spark import Workflow


def make_echo_workflow(call_log: Counter) -> Workflow:
    """Echo DAG + counter-instrumented resources (the reference's two
    main fixtures, merged)."""
    wkf = Workflow("")

    @wkf.provide("echo")
    @wkf.provide("echo.{name}")
    def echo(name="default"):
        return name

    @wkf.depend(value="echo.test")
    @wkf.provide("many_echo")
    def many_echo(value, repeat=2):
        return " ".join([value] * repeat)

    @wkf.provide("logged.{name}")
    def logged(name):
        call_log[name] += 1
        return name

    @wkf.depend(first="logged.{name}", second="logged.{name}")
    @wkf.provide("twice.{name}")
    def twice(first, second):
        return first + second

    return wkf


class TestRouting:
    def test_default_param(self):
        assert make_echo_workflow(Counter()).run("echo") == "default"

    def test_extracted_param(self):
        assert make_echo_workflow(Counter()).run("echo.test") == "test"

    def test_pattern_is_exact_key_with_explicit_kwargs(self):
        wkf = make_echo_workflow(Counter())
        assert wkf.run("echo.{name}", name="explicit") == "explicit"

    def test_unknown_name_raises(self):
        with pytest.raises(KeyError):
            make_echo_workflow(Counter()).by_name("spam")


class TestDependencies:
    def test_dependency_injection(self):
        assert make_echo_workflow(Counter()).run("many_echo") == "test test"

    def test_kw_clone_overrides_defaults(self):
        derived = make_echo_workflow(Counter()).kw(repeat=3, name="test")
        assert derived.run("many_echo") == "test test test"


class TestMemoization:
    def test_across_runs_recomputes(self):
        log = Counter()
        wkf = make_echo_workflow(log)
        wkf.run("logged.ham")
        wkf.run("logged.ham")
        wkf.run("logged.spam")
        assert log == {"ham": 2, "spam": 1}

    def test_within_run_computes_once(self):
        log = Counter()
        wkf = make_echo_workflow(log)
        assert wkf.run("twice.foo") == "foofoo"
        assert log["foo"] == 1  # two deps on the same resource, one call

    def test_none_results_never_cached(self):
        wkf = Workflow("")
        calls = Counter()

        @wkf.provide("maybe")
        def maybe():
            calls["maybe"] += 1
            return None

        @wkf.depend(a="maybe", b="maybe")
        @wkf.provide("pair")
        def pair(a, b):
            return (a, b)

        assert wkf.run("pair") == (None, None)
        assert calls["maybe"] == 2  # quirk parity

    def test_multiple_targets_share_one_run(self):
        wkf = Workflow("")
        calls = Counter()

        @wkf.provide("shared")
        def shared():
            calls["shared"] += 1
            return "s"

        @wkf.depend(s="shared")
        @wkf.provide("left")
        def left(s):
            return s + "L"

        @wkf.depend(s="shared")
        @wkf.provide("right")
        def right(s):
            return s + "R"

        assert wkf.run("left", "right") == ("sL", "sR")
        assert calls["shared"] == 1


class TestMultiProvide:
    def build(self, log: Counter) -> Workflow:
        wkf = Workflow("")

        @wkf.provide("upper.{name}", "lower.{name}")
        def both_cases(name):
            log["calls"] += 1
            return name.upper(), name.lower()

        @wkf.depend(up="upper.{name}", low="lower.{name}")
        @wkf.provide("both.{name}")
        def both(up, low):
            return up + low

        return wkf

    def test_single_evaluation_fans_out(self):
        log = Counter()
        wkf = self.build(log)
        assert wkf.run("both.spam") == "SPAMspam"
        assert log["calls"] == 1
        assert wkf.run("both.FOO") == "FOOfoo"
        assert log["calls"] == 2

    def test_matched_slice_returned_for_typed_routes(self):
        wkf = Workflow("")

        @wkf.provide("low.{uid:uuid}", "up.{uid:uuid}")
        def cases(uid):
            return uid.lower(), uid.upper()

        uid = "40b4550b-f1dd-4846-bc70-d8f5f235e72b"
        assert wkf.run(f"low.{uid}") == uid
        assert wkf.run(f"up.{uid}") == uid.upper()


class TestRegistration:
    def test_duplicate_pattern_rejected_unless_override(self):
        wkf = Workflow("")

        @wkf.provide("res")
        def first():
            return "first"

        with pytest.raises(ValueError):

            @wkf.provide("res")
            def second():
                return "second"

        @wkf.provide("res", _override=True)
        def third():
            return "third"

        assert wkf.run("res") == "third"

    def test_duplicate_workflow_name_rejected(self):
        Workflow("core-dupname-probe")
        with pytest.raises(ValueError):
            Workflow("core-dupname-probe")
