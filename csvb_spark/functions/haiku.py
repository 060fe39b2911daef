"""Haiku easter egg — capability parity with the reference's
``print_haiku`` (reference csvb/src/lib.rs:5-78: header line
``line 1: line 2: line 3`` then one random — or all — haikus with
lines joined by ``: ``), plus the ``haiku()`` scalar UDF the
reference left as a TODO (reference csvb/src/lib.rs:97).

The verses are original to this project (the reference's are its own
creative content); the output *format* matches.
"""

from __future__ import annotations

import random

from pyspark.sql import SparkSession
from pyspark.sql import types as T

HAIKUS: list[tuple[str, str, str]] = [
    ("commas split the line", "a header names every field", "rows become a table"),
    ("quoted text may hide", "the very comma you fear", "parsers must stay calm"),
    ("ten thousand csvs", "one glob gathers them as one", "schema from the first"),
    ("a filter pushed down", "touches only what it needs", "the scan stays narrow"),
    ("shuffle in the night", "partitions seek their new home", "keys sleep co-located"),
    ("broadcast the small side", "the giant table stands still", "join without moving"),
    ("nulls drift to the end", "or the start if you ask them", "pin the order down"),
    ("a limit of ten", "spares the cluster its labor", "top-k, then silence"),
    ("wire bytes whisper SQL", "a server answers in rows", "postgres dreams of spark"),
    ("union of far shards", "each one answers what it can", "the gather is brief"),
]

HEADER = "line 1: line 2: line 3"


def format_haiku(h: tuple[str, str, str]) -> str:
    return ": ".join(h)


def print_haiku(print_all: bool = False, rng: random.Random | None = None) -> str:
    """Return (and print) the haiku output, matching the reference
    format: header, then one random haiku — or all with ``--all``."""
    rng = rng or random.Random()
    lines = [HEADER]
    if print_all:
        lines += [format_haiku(h) for h in HAIKUS]
    else:
        lines.append(format_haiku(rng.choice(HAIKUS)))
    out = "\n".join(lines)
    print(out)
    return out


def register_haiku_udf(spark: SparkSession) -> None:
    """``SELECT haiku(i)`` — deterministic by index (mod len).

    The closure captures a plain list of strings (pickled by value),
    NOT module-level names — executors must not need csvb_spark on
    their own PYTHONPATH.
    """
    rendered = [": ".join(h) for h in HAIKUS]

    def _haiku(i: int | None) -> str:
        return rendered[0 if i is None else int(i) % len(rendered)]

    spark.udf.register("haiku", _haiku, T.StringType())
