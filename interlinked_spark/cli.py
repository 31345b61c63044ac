"""Command-line interface.

Parity with the reference CLI (``/root/reference/interlinked/cli.py``):
``run`` / ``deps`` / ``validate`` / ``version`` subcommands, toml/json
config loading, ``-v`` verbosity, module loading by path with decorator
side-effect registration.

Deviations (documented intent, SURVEY.md R25/R22):

* ``module:variable`` workflow selection is FIXED — the reference
  asserts the still-string variable is a Workflow (``cli.py:53``), so
  only the default-workflow path ever worked; here the module attribute
  is fetched after loading, as the reference's own help text documents.
* ``-s/--show`` calls ``DataFrame.show()`` for DataFrame results (the
  engine's results are lazy plans, not printable values).
"""

from __future__ import annotations

import argparse
import json
import logging
from importlib.machinery import SourceFileLoader

from .exceptions import InterlinkedException
from .workflow import Workflow, default_workflow

try:  # pragma: no cover - optional dependency
    import rich
    from rich.tree import Tree
except ImportError:  # pragma: no cover
    rich = None

logging.basicConfig(format="%(levelname)s:%(asctime).19s: %(message)s")
logger = logging.getLogger("interlinked_spark")


def load_conf(path: str | None):
    if path is None:
        return None
    if path.endswith(".toml"):
        try:
            import tomllib as toml_mod  # py311+ stdlib

            with open(path, "rb") as fh:
                return toml_mod.load(fh)
        except ImportError:  # pragma: no cover
            import toml as toml_mod

            return toml_mod.load(path)
    if path.endswith(".json"):
        with open(path) as fh:
            return json.load(fh)
    raise ValueError("File type not supported (should be json or toml)")


def find_workflow(source: str) -> Workflow:
    """Import the user module (decorators register workflows as a side
    effect) and return the selected workflow: ``module`` uses the
    default workflow, ``module:variable`` picks a named attribute."""
    wkf_variable = None
    if ":" in source:
        source, wkf_variable = source.split(":", 1)
    file_path = source.replace(".", "/") + ".py"
    module = SourceFileLoader(source, file_path).load_module()
    if not wkf_variable:
        return default_workflow
    wkf = getattr(module, wkf_variable)
    if not isinstance(wkf, Workflow):
        raise TypeError(f"{source}:{wkf_variable} is not a Workflow (got {type(wkf)})")
    return wkf


def run_cmd(args) -> None:
    wkf = find_workflow(args.source)
    config = load_conf(args.config)
    if config is not None:
        # Per-invocation config on a clone: concurrent runs never see
        # each other's config (copy-on-write, SURVEY.md §3.2).  Clone
        # ONCE before the loop — cloning per target would re-register
        # the same '<name>_clone' and raise on the second target (the
        # reference shares this latent bug; fixed here like its other
        # CLI bugs, see module docstring).
        wkf = wkf.config(config)
    for target in args.targets:
        res = wkf.run(target)
        if args.show:
            if hasattr(res, "show"):
                res.show(truncate=False)
            else:
                print(res)


def deps_cmd(args) -> None:
    wkf = find_workflow(args.source)
    graph = wkf.deps()
    roots = sorted(set(graph) - {child for children in graph.values() for child in children})
    if rich is None:
        # Plain-text fallback (deviation: the reference exits when rich
        # is missing, cli.py:66-68).
        def walk(node: str, depth: int) -> None:
            print("  " * depth + node)
            for child in sorted(graph[node]):
                walk(child, depth + 1)

        for root in roots:
            walk(root, 0)
        return
    top = Tree("/", hide_root=True)
    level = [(root, top) for root in roots]
    while level:
        nxt = []
        for node, tree in sorted(level, key=lambda x: x[0]):
            subtree = tree.add(node)
            nxt.extend((child, subtree) for child in graph[node])
        level = nxt
    rich.print(top)


def advise_cmd(args) -> None:
    """Resolve each target and print plan-advisor findings (engine
    extension beyond the reference's run/deps/validate — the CLI face
    of ``plans.advise``).  Non-DataFrame resources are skipped with a
    note; exit status 1 when any ``high``-severity finding exists so CI
    can gate on it."""
    from .plans import advise

    wkf = find_workflow(args.source)
    config = load_conf(args.config)
    if config is not None:
        wkf = wkf.config(config)
    worst_high = False
    for target in args.targets:
        res = wkf.run(target)
        if not hasattr(res, "_jdf"):
            print(f"{target}: not a DataFrame ({type(res).__name__}) — skipped")
            continue
        findings = advise(res)
        if not findings:
            print(f"{target}: no findings")
            continue
        for f in findings:
            print(f"{target}: [{f['severity']}] {f['code']} — {f['reason']}")
            worst_high = worst_high or f["severity"] == "high"
    if worst_high:
        raise SystemExit(1)


def validate_cmd(args) -> None:
    wkf = find_workflow(args.source)
    try:
        wkf.validate()
    except InterlinkedException as exc:
        raise SystemExit("Error: " + str(exc))
    print("ok")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        prog="interlinked-spark",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument(
        "source",
        help="workflow module: 'file_name' (no .py), 'folder.file', or "
        "'file_name:workflow_variable'",
    )
    parser.add_argument("-v", "--verbose", action="count", default=0)
    sub = parser.add_subparsers(dest="command")

    p_deps = sub.add_parser("deps", description="Show dependency tree")
    p_deps.set_defaults(func=deps_cmd)

    p_version = sub.add_parser("version", description="Print version")

    def _print_version(args):
        from . import __version__

        print(__version__)

    p_version.set_defaults(func=_print_version)

    p_validate = sub.add_parser("validate", description="Validate workflow graph")
    p_validate.set_defaults(func=validate_cmd)

    p_advise = sub.add_parser(
        "advise", description="Plan-advisor findings for DataFrame targets"
    )
    p_advise.add_argument("-c", "--config", help="Load parameters from toml/json config")
    p_advise.add_argument("targets", nargs="*", help="Resource names to advise on")
    p_advise.set_defaults(func=advise_cmd)

    p_run = sub.add_parser("run", description="Resolve and run targets")
    p_run.add_argument("-s", "--show", action="store_true", help="Show output")
    p_run.add_argument("-c", "--config", help="Load parameters from toml/json config")
    p_run.add_argument("targets", nargs="*", help="Resource names to run")
    p_run.set_defaults(func=run_cmd)

    args = parser.parse_args(argv)
    if args.verbose == 1:
        logger.setLevel("INFO")
    elif args.verbose > 1:
        logger.setLevel("DEBUG")
    if not args.command:
        parser.print_help()
        return
    args.func(args)
