"""Curated scalar-function registry (SURVEY.md §2b-H).

Workflows reference functions by name (e.g. from config files, mirroring
the reference's mutator-by-kwarg pattern, ``tests/test_mutate.py``); all
entries are stock ``pyspark.sql.functions`` — JVM-side, whole-stage
codegen'd, never row-at-a-time Python.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import functions as F

FUNCTIONS: dict[str, Callable] = {
    # string
    "upper": F.upper,
    "lower": F.lower,
    "concat": F.concat,
    "concat_ws": F.concat_ws,
    "substring": F.substring,
    "split": F.split,
    "trim": F.trim,
    "length": F.length,
    "levenshtein": F.levenshtein,
    "regexp_extract": F.regexp_extract,
    "regexp_replace": F.regexp_replace,
    "lpad": F.lpad,
    "rpad": F.rpad,
    "initcap": F.initcap,
    # date / time
    "to_timestamp": F.to_timestamp,
    "to_date": F.to_date,
    "date_trunc": F.date_trunc,
    "datediff": F.datediff,
    "date_add": F.date_add,
    "year": F.year,
    "month": F.month,
    "dayofmonth": F.dayofmonth,
    "hour": F.hour,
    "unix_timestamp": F.unix_timestamp,
    "from_unixtime": F.from_unixtime,
    # math
    "round": F.round,
    "floor": F.floor,
    "ceil": F.ceil,
    "abs": F.abs,
    "log": F.log,
    "exp": F.exp,
    "pow": F.pow,
    "sqrt": F.sqrt,
    "rand": F.rand,
    "sign": F.signum,
    # conditional
    "when": F.when,
    "coalesce": F.coalesce,
    "nullif": F.nullif,
    "greatest": F.greatest,
    "least": F.least,
    # array (higher-order functions stay JVM-side)
    "explode": F.explode,
    "posexplode": F.posexplode,
    "array": F.array,
    "array_contains": F.array_contains,
    "array_join": F.array_join,
    "size": F.size,
    "sort_array": F.sort_array,
    "transform": F.transform,
    "filter": F.filter,
    "aggregate": F.aggregate,
    "zip_with": F.zip_with,
    "sequence": F.sequence,
    "slice": F.slice,
    # map
    "create_map": F.create_map,
    "map_keys": F.map_keys,
    "map_values": F.map_values,
    "map_from_entries": F.map_from_entries,
    # json
    "get_json_object": F.get_json_object,
    "from_json": F.from_json,
    "to_json": F.to_json,
    "schema_of_json": F.schema_of_json,
    # hash / ids
    "sha2": F.sha2,
    "md5": F.md5,
    "xxhash64": F.xxhash64,
    "crc32": F.crc32,
    "hash": F.hash,
    "monotonically_increasing_id": F.monotonically_increasing_id,
    # window rankers (exposed for completeness; see operators.windows)
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
    "ntile": F.ntile,
    "lag": F.lag,
    "lead": F.lead,
}


def get_function(name: str) -> Callable:
    try:
        return FUNCTIONS[name]
    except KeyError:
        raise KeyError(
            f"Unknown function '{name}'; known: {sorted(FUNCTIONS)[:10]}..."
        ) from None


def register_function(name: str, fn: Callable, override: bool = False) -> None:
    if name in FUNCTIONS and not override:
        raise ValueError(f"Function '{name}' already registered")
    FUNCTIONS[name] = fn
