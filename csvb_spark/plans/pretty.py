"""ASCII table rendering — parity with the reference's result sink.

The reference drains the batch stream and pretty-prints once with
``arrow::util::pretty::print_batches`` (reference csvb/src/lib.rs:101-113).
Arrow's format:

    +----+-------+
    | id | name  |
    +----+-------+
    | 1  | alice |
    +----+-------+

Left-aligned cells, one space padding, empty string for NULL is NOT
arrow's choice — arrow renders nulls as empty cells. We match that.

This is a driver-side sink for human output (like the reference's
collect-then-print); it is never in the distributed data path.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterable

from pyspark.sql import DataFrame


def _fmt(v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # arrow prints shortest repr; python repr matches closely
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_fmt(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {_fmt(x)}" for k, x in v.items()) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def pretty_format(columns: list[str], rows: Iterable[tuple]) -> str:
    str_rows = [[_fmt(v) for v in row] for row in rows]
    widths = [len(c) for c in columns]
    for row in str_rows:
        for i, cell in enumerate(row):
            widths[i] = max(widths[i], len(cell))
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    header = "|" + "|".join(f" {c:<{w}} " for c, w in zip(columns, widths)) + "|"
    lines = [sep, header, sep]
    for row in str_rows:
        lines.append(
            "|" + "|".join(f" {cell:<{w}} " for cell, w in zip(row, widths)) + "|"
        )
    lines.append(sep)
    return "\n".join(lines)


def render_df(df: DataFrame, limit: int | None = None) -> str:
    """Collect + render (the reference's exec sink: full materialize,
    bounded only by session memory — reference csvb/src/lib.rs:101-113)."""
    rows = df.limit(limit).collect() if limit is not None else df.collect()
    return pretty_format(df.columns, [tuple(r) for r in rows])
