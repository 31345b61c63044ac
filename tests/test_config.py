"""Config-routing parity tier — precedence and formatted values pinned by
``/root/reference/tests/test_config.py``."""

import pytest

from interlinked_spark import Workflow
from interlinked_spark.exceptions import InvalidValue

cfg = {
    "hello.{world:identifier}": {"param": " from conf"},
    "hello.ham": {"param": " FROM CONF"},
}
wkf = Workflow("cfg-wkf", config=cfg, base_kw={"world": "from wkf"})


@wkf.provide("hello")
@wkf.provide("hello.{world}")
def echo(world, param="", fmt_param=""):
    return world + param


def test_param_from_conf():
    # config entry beats everything else in the kw merge
    assert wkf.run("hello.spam") == "spam from conf"
    # exact config key wins over the pattern entry
    assert wkf.run("hello.ham") == "ham FROM CONF"
    # no config match -> workflow base_kw fills the hole
    assert wkf.run("hello") == "from wkf"


def test_config_beats_run_kwargs():
    assert wkf.run("hello.spam", param=" from kwargs") == "spam from conf"


wkf2 = Workflow("cfg-wkf-fmt", config={"hello.{world:identifier}": {"fmt_param": "from conf ({world})"}})


@wkf2.provide("hello.{world}")
def fmt_echo(fmt_param):
    return fmt_param


def test_formatted_config_value():
    assert wkf2.run("hello.spam") == "from conf (spam)"


wkf3 = Workflow(
    "cfg-wkf-spec",
    config={"hello.{world:identifier}": {"fmt_param": "from conf ({world:identifier})"}},
)


@wkf3.provide("hello.{world}")
def fmt_spec_echo(fmt_param):
    return fmt_param


def test_valid_specifier():
    assert wkf3.run("hello.spam") == "from conf (spam)"


wkf4 = Workflow(
    "cfg-wkf-badspec",
    config={"hello.{world:identifier}": {"fmt_param": "from conf ({world:uuid})"}},
)


@wkf4.provide("hello.{world}")
def fmt_bad_spec_echo(fmt_param):
    return fmt_param


def test_invalid_specifier_raises():
    with pytest.raises(InvalidValue):
        wkf4.run("hello.spam")


def test_config_clone_copy_on_write():
    base = Workflow("cfg-wkf-cow")

    @base.provide("val")
    def val(x="none"):
        return x

    derived = base.config({"val": {"x": "configured"}})
    assert derived.run("val") == "configured"
    # the original workflow's config is untouched
    assert base.run("val") == "none"
    # and a plain clone carries the config forward
    assert derived.clone(name="cfg-wkf-cow-2").run("val") == "configured"
