"""DataFusion-44 function-name shims as Catalyst-inlined SQL UDFs.

Each shim covers a ⚠ row from SURVEY.md §2.B.8 — a function the
reference exposes (via datafusion-functions 44.0.0) under a name or
signature Spark SQL lacks. SQL UDFs (Spark 3.5+/4.x) are expanded by
the analyzer into plain expressions, so these run inside whole-stage
codegen with zero Python overhead — the right cost model for 100 TB.

Python UDFs are used only where the logic is genuinely iterative
(gcd/lcm) — and those are never in a scan/agg hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import types as T

# name -> (signature, return type, body). All Catalyst-inlined.
_SQL_SHIMS: dict[str, tuple[str, str, str]] = {
    # --- string (DataFusion names; datafusion-functions 44) ---
    "strpos": ("s STRING, sub STRING", "INT", "instr(s, sub)"),
    "to_hex": ("n BIGINT", "STRING", "lower(hex(n))"),
    "substr_index": (
        "s STRING, delim STRING, cnt INT",
        "STRING",
        "substring_index(s, delim, cnt)",
    ),
    "digest": (
        "s STRING, algo STRING",
        "STRING",
        """CASE lower(algo)
             WHEN 'md5' THEN md5(s)
             WHEN 'sha224' THEN sha2(s, 224)
             WHEN 'sha256' THEN sha2(s, 256)
             WHEN 'sha384' THEN sha2(s, 384)
             WHEN 'sha512' THEN sha2(s, 512)
           END""",
    ),
    # --- math ---
    "iszero": ("x DOUBLE", "BOOLEAN", "x = 0.0d"),
    "power_int": ("b BIGINT, e BIGINT", "DOUBLE", "power(b, e)"),
    # --- date/time ---
    "today": ("", "DATE", "current_date()"),
    "to_unixtime": ("ts TIMESTAMP", "BIGINT", "unix_timestamp(ts)"),
    "to_timestamp_seconds": ("n BIGINT", "TIMESTAMP", "timestamp_seconds(n)"),
    "to_timestamp_millis": ("n BIGINT", "TIMESTAMP", "timestamp_millis(n)"),
    "to_timestamp_micros": ("n BIGINT", "TIMESTAMP", "timestamp_micros(n)"),
    # n DIV 1000, not n / 1000: '/' is double division, and epoch
    # nanoseconds (~1.7e18) exceed 2^53 so the round-trip loses up to
    # ~1 us. FLOOR semantics for pre-epoch values via pmod.
    "to_timestamp_nanos": (
        "n BIGINT",
        "TIMESTAMP",
        "timestamp_micros((n - pmod(n, 1000)) DIV 1000)",
    ),
    # date_bin(stride, ts, origin) — DataFusion bins ts into
    # stride-sized buckets anchored at origin. Stride in seconds here
    # (interval-typed SQL-UDF params are not supported by Spark's
    # parser); translate.py rewrites the DataFusion interval-literal
    # form date_bin(INTERVAL '15 minutes', ts, origin) onto
    # date_bin_micros below.
    "date_bin": (
        "stride_sec BIGINT, ts TIMESTAMP, origin TIMESTAMP",
        "TIMESTAMP",
        """timestamp_micros(
             unix_micros(origin)
             + ((unix_micros(ts) - unix_micros(origin))
                - pmod(unix_micros(ts) - unix_micros(origin),
                       stride_sec * 1000000))
           )""",
    ),
    # micros-stride twin of date_bin — the translate.py target for
    # interval literals, so sub-second strides (ms/us) bin exactly.
    "date_bin_micros": (
        "stride_us BIGINT, ts TIMESTAMP, origin TIMESTAMP",
        "TIMESTAMP",
        """timestamp_micros(
             unix_micros(origin)
             + ((unix_micros(ts) - unix_micros(origin))
                - pmod(unix_micros(ts) - unix_micros(origin), stride_us))
           )""",
    ),
    # --- array (one-based like DataFusion) ---
    "array_element_bigint": ("a ARRAY<BIGINT>, i INT", "BIGINT", "element_at(a, i)"),
    "array_element_str": ("a ARRAY<STRING>, i INT", "STRING", "element_at(a, i)"),
    "array_pop_back_str": (
        "a ARRAY<STRING>",
        "ARRAY<STRING>",
        "slice(a, 1, greatest(size(a) - 1, 0))",
    ),
    "array_pop_front_str": (
        "a ARRAY<STRING>",
        "ARRAY<STRING>",
        "CASE WHEN size(a) <= 1 THEN array() ELSE slice(a, 2, size(a) - 1) END",
    ),
    "array_empty": ("a ARRAY<STRING>", "BOOLEAN", "size(a) = 0"),
    "string_to_array": (
        "s STRING, delim STRING",
        "ARRAY<STRING>",
        "split(s, CASE WHEN delim IS NULL THEN '' ELSE regexp_replace(delim, '([\\\\^$.|?*+()\\\\[\\\\]{}])', '\\\\\\\\$1') END)",
    ),
}


def _register_python_shims(spark: SparkSession) -> None:
    """Python UDFs — only for logic SQL can't express generically:
    gcd/lcm (iterative) and array_ndims (nesting depth needs type
    recursion; Python UDF inputs are untyped so one registration covers
    any array type). Cold-path compat surface, never scan/agg hot
    paths. The other DataFusion array editors (array_resize /
    array_replace / array_positions) are translate.py rewrites onto
    polymorphic higher-order SQL — type-preserving and Catalyst-inlined.
    """

    spark.udf.register("gcd", lambda a, b: math.gcd(int(a), int(b)) if a is not None and b is not None else None, T.LongType())
    spark.udf.register(
        "lcm",
        lambda a, b: abs(int(a) * int(b)) // math.gcd(int(a), int(b))
        if a is not None and b is not None and (a or b)
        else 0,
        T.LongType(),
    )

    def ndims(a):
        # DataFusion's array_ndims is TYPE-based, so [NULL, [1,2]] is
        # 2-dimensional. Python UDF inputs are untyped lists — mirror
        # the type answer by descending through the first NON-NULL
        # element at each level (a leading NULL says nothing about the
        # element type).
        if a is None:
            return None
        d = 0
        while isinstance(a, list):
            d += 1
            a = next((x for x in a if x is not None), None)
        return d

    spark.udf.register("array_ndims", ndims, T.IntegerType())


def register_shims(spark: SparkSession) -> None:
    for name, (sig, ret, body) in _SQL_SHIMS.items():
        try:
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
                f"RETURNS {ret} RETURN {body}"
            )
        except Exception:
            # name already taken by a Spark builtin with the same
            # semantics (Spark keeps absorbing these — good)
            pass
    _register_python_shims(spark)
