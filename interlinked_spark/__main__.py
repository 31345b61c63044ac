"""Module entry point: ``python -m interlinked_spark <module> <cmd>``."""

from interlinked_spark.cli import main

main()
