"""Several workflows coexisting with the SAME resource name (reference
analog: ``examples/multi.py``): each ``Workflow`` owns an isolated
registry, so ``run()`` resolves against the workflow it is called on,
and per-environment config clones never leak into each other.

Run: ``python examples/multi_workflow.py``.
"""

from interlinked_spark import Workflow

wkf_dev = Workflow("report-dev", base_kw={"suffix": "!"})
wkf_prod = Workflow("report-prod")


@wkf_dev.provide("greeting")
def greeting_dev(suffix: str) -> str:
    return "hello from dev" + suffix


@wkf_prod.provide("greeting")
def greeting_prod() -> str:
    return "hello from prod"


if __name__ == "__main__":
    assert wkf_dev.run("greeting") == "hello from dev!"
    assert wkf_prod.run("greeting") == "hello from prod"
    # Config clones stay per-environment too (copy-on-write).
    loud = wkf_dev.config({"greeting": {"suffix": "!!!"}})
    assert loud.run("greeting") == "hello from dev!!!"
    assert wkf_dev.run("greeting") == "hello from dev!"
    print("ok")
