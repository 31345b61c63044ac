"""Template/rformat parity tier — pinned by
``/root/reference/tests/test_format_dict.py`` and the Pattern specifier
checks of ``tests/test_config.py:73-89``."""

import pytest

from interlinked_spark import Workflow
from interlinked_spark.exceptions import InvalidValue
from interlinked_spark.templating import NameTemplate, render


def test_render_dict_key():
    assert render({"ham-{spam}": "one"}, spam="SPAM") == {"ham-SPAM": "one"}


def test_render_dict_value():
    assert render({"ham-spam": "foo-{bar}"}, bar="BAR") == {"ham-spam": "foo-BAR"}


def test_render_list():
    assert render(["ham-{spam}", "one"], spam="SPAM") == ["ham-SPAM", "one"]


def test_render_str():
    assert render("foo-{bar}", bar="BAR") == "foo-BAR"


def test_render_nested():
    d = {"ham-{spam}": ["foo-{bar}", {"ham": "{spam}"}]}
    assert render(d, spam="SPAM", bar="BAR") == {"ham-SPAM": ["foo-BAR", {"ham": "SPAM"}]}


def test_config_driven_url_templating():
    wkf = Workflow("tmpl-wkf")

    @wkf.provide("echo.{name}")
    def echo(url):
        return url

    wkf.set_config({"echo.{name}": {"url": "http://host/{name}.json"}})
    assert wkf.run("echo.spam") == "http://host/spam.json"


def test_template_specifier_validation():
    tpl = NameTemplate("x-{v:int}")
    assert tpl.fmt({"v": "42"}) == "x-42"
    with pytest.raises(InvalidValue):
        tpl.fmt({"v": "notanint"})


def test_template_missing_key():
    with pytest.raises(KeyError):
        NameTemplate("x-{v}").fmt({})
