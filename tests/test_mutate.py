"""Mutator parity tier — ordering and kw access pinned by the
reference's mutate suite (``/root/reference/tests/test_mutate.py``):
mutators run after dependency resolution and before the producer, in
registration order, each seeing the kw pool as mutated so far."""

from interlinked_spark import Workflow


def build_mutating_workflow() -> Workflow:
    wkf = Workflow("")

    upper_prefix = lambda prefix: prefix.upper()  # noqa: E731
    glue = lambda prefix, suffix: prefix + suffix  # noqa: E731

    @wkf.mutate(prefix=upper_prefix)
    @wkf.provide("{prefix}.echo")
    @wkf.mutate(suffix=glue)
    @wkf.provide("{prefix}.echo.{suffix}")
    def echo(prefix, suffix=""):
        return prefix + suffix

    return wkf


def test_single_mutator():
    wkf = build_mutating_workflow()
    # prefix mutator upper-cases the route param before the producer runs
    assert wkf.run("ham.echo") == "HAM"


def test_mutator_chain_sees_prior_mutations():
    wkf = build_mutating_workflow()
    # outer (prefix) mutator runs first; the suffix mutator then reads
    # the ALREADY-uppercased prefix from the kw pool: suffix becomes
    # "HAM"+"spam", and the producer prepends prefix again.
    assert wkf.run("ham.echo.spam") == "HAMHAMspam"


def test_mutator_can_wrap_values():
    wkf = Workflow("")

    @wkf.depend(base="seed")
    @wkf.mutate(base=lambda base: base * 3)
    @wkf.provide("tripled")
    def tripled(base):
        return base

    @wkf.provide("seed")
    def seed():
        return "x"

    # mutators also rewrite resolved dependency values, not only params
    assert wkf.run("tripled") == "xxx"
