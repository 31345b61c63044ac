"""Mutator parity tier — ordering and kw access pinned by
``/root/reference/tests/test_mutate.py``."""

from interlinked_spark import Workflow

wkf = Workflow("mutate-wkf")


@wkf.mutate(prefix=lambda prefix: prefix.upper())
@wkf.provide("{prefix}.echo")
@wkf.mutate(suffix=lambda prefix, suffix: prefix + suffix)
@wkf.provide("{prefix}.echo.{suffix}")
def echo(prefix, suffix=""):
    return prefix + suffix


def test_run_mutate():
    assert wkf.run("ham.echo") == "HAM"
    # prefix mutator runs first (upper), then suffix sees the mutated kw
    assert wkf.run("ham.echo.spam") == "HAMHAMspam"
