"""Function surface: DataFusion-name shims + the haiku UDF.

The reference exposes DataFusion 44's whole scalar/aggregate/window
function registry through one SQL entry point (reference
csvb_engine/src/lib.rs:88). Spark SQL covers almost all of it under
identical names (SURVEY.md §2.B.8); this package closes the renamed /
missing remainder two ways:

- ``shims.register_shims``  — SQL UDFs (``CREATE TEMPORARY FUNCTION
  ... RETURN expr``), which Catalyst inlines into the plan, so the
  shims cost nothing at runtime (no Python boundary).
- ``translate.translate_sql`` — a light textual rewrite for dialect
  syntax Spark's parser rejects (``::type`` casts, ``~`` regex
  operators, ``SIMILAR TO``) plus pure function renames.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from csvb_spark.functions.haiku import register_haiku_udf
from csvb_spark.functions.shims import register_shims
from csvb_spark.functions.translate import translate_sql  # noqa: F401


def register_all(spark: SparkSession) -> None:
    # Belt-and-braces: vanilla sessions (no csvb_spark.session builder)
    # must still be able to read TIMESTAMP(NANOS) parquet; see
    # sources/catalog.py::_ensure_nanos_conf for the main choke point.
    from csvb_spark.sources.catalog import _ensure_nanos_conf

    _ensure_nanos_conf(spark)
    register_shims(spark)
    register_haiku_udf(spark)
