"""Minimal workflow — the reference's quickstart shape
(``/root/reference/examples/basic.py``, ``README.md:15-25``): string
producers, pattern routing, dependency injection.

    python -m interlinked_spark examples.basic run many_echo -s
"""

from interlinked_spark import depend, provide


@provide("echo")
@provide("echo.{name}")
def echo(name="default"):
    return name


@depend(value="echo.test")
@provide("many_echo")
def many_echo(value, repeat=2):
    return " ".join([value] * int(repeat))
