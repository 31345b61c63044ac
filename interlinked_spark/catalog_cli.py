"""CLI-facing twin of the query catalog — every ``q.<name>`` resource
runnable from the command line (reference analog: the module:var CLI
source form, ``/root/reference/interlinked/cli.py``):

    python -m interlinked_spark interlinked_spark.catalog_cli:wkf \\
        run q.pricing_summary -s
    python -m interlinked_spark interlinked_spark.catalog_cli:wkf deps

Configuration comes from the environment (the CLI's config files route
per-pattern parameters, but the two the catalog needs are global):

* ``SPARK_GRAFT_SF_DIR`` — parquet table dir (default sf0.001)
* ``SPARK_GRAFT_CPUS``  — local[N] parallelism (session.py default)

``deps`` / ``validate`` never call producers, so they stay JVM-free:
the SparkSession enters as a LAZY proxy that builds the real session on
first attribute access (i.e. only when a query actually runs).
"""

from __future__ import annotations

import os

from .catalog import WKF as _CATALOG


class _LazySpark:
    """Duck-typed SparkSession that materializes on first use.

    Producers only ever touch attributes (``spark.read``,
    ``spark.createDataFrame``, ``spark.readStream``), so attribute
    forwarding is the whole contract; holding the session at class
    level keeps one JVM per process across resources in a run."""

    _session = None

    def __getattr__(self, item):
        if _LazySpark._session is None:
            from .session import get_spark

            _LazySpark._session = get_spark("catalog-cli")
        return getattr(_LazySpark._session, item)


wkf = _CATALOG.clone(
    name="catalog-cli",
    kw={
        "spark": _LazySpark(),
        "base_dir": os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
        ),
    },
)
