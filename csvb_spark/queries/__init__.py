"""Declared-query corpus — the judge/driver-facing inventory.

Every entry maps to a row of SURVEY.md §2 (relational core, function
families) or to a beyond-reference LLM-pipeline operator. Each query
is a callable ``(spark, sf_dir) -> DataFrame``; oracle-checkable ones
also carry the equivalent DuckDB SQL (same column names, same
rounding), which the driver hash-compares at sf0.01.
"""

from __future__ import annotations

from csvb_spark.queries.common import Query
from csvb_spark.queries import relational, funcs, extensions


def corpus() -> dict[str, Query]:
    out: dict[str, Query] = {}
    for mod in (relational, funcs, extensions):
        out.update(mod.QUERIES)
    return out
