"""Engine SQL entry point: dialect translation + catalog introspection.

The reference enables DataFusion's ``information_schema`` so
``SELECT * FROM information_schema.tables / .columns`` works over the
session catalog (reference csvb_engine/src/lib.rs:22). Spark exposes
``SHOW TABLES`` / ``DESCRIBE`` natively but has no information_schema
views, so we emulate the two the reference surface reaches:

- ``information_schema.tables``  (table_catalog, table_schema,
  table_name, table_type)
- ``information_schema.columns`` (table_catalog, table_schema,
  table_name, column_name, ordinal_position, data_type, is_nullable)
- ``information_schema.views``   (table_catalog, table_schema,
  table_name, definition — NULL, like DataFusion's non-SQL views)
- ``information_schema.schemata`` (catalog_name, schema_name)
- ``information_schema.df_settings`` (name, value — the session's
  explicitly-set config, mirroring DataFusion's settings table)

Dotted names can't be temp-view names, so the translator rewrites
``information_schema.tables`` → ``information_schema_tables`` and this
module refreshes those views from the live catalog just before a query
that mentions them runs — introspection data is tiny (one row per
table/column), so rebuilding per query is free and never stale.

Every front-end (CLI exec, pgwire server) funnels through
``execute_sql``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_INFO_SCHEMA_RE = re.compile(
    r"\binformation_schema\s*\.\s*(tables|columns|views|schemata|df_settings)\b",
    re.I,
)


def refresh_information_schema(spark: SparkSession) -> None:
    """(Re)build information_schema_{tables,columns} temp views from
    the live session catalog."""
    tables = []
    columns = []
    for t in spark.catalog.listTables():
        schema = t.namespace[0] if t.namespace else "default"
        kind = "VIEW" if t.tableType in ("TEMPORARY", "VIEW") else "BASE TABLE"
        # NOTE: the reference's federated table provider panics
        # (todo!()) when asked for its table type
        # (reference csvb_engine/src/union_table_provider.rs:79-82);
        # here every registered table answers.
        tables.append((t.catalog or "spark_catalog", schema, t.name, kind))
        for i, c in enumerate(spark.catalog.listColumns(t.name), start=1):
            columns.append(
                (
                    t.catalog or "spark_catalog",
                    schema,
                    t.name,
                    c.name,
                    i,
                    c.dataType,
                    "YES" if c.nullable else "NO",
                )
            )
    spark.createDataFrame(
        tables or [("spark_catalog", "default", "", "VIEW")],
        "table_catalog string, table_schema string, table_name string, table_type string",
    ).filter("table_name <> ''").createOrReplaceTempView("information_schema_tables")
    spark.createDataFrame(
        columns or [("spark_catalog", "default", "", "", 0, "", "YES")],
        "table_catalog string, table_schema string, table_name string, "
        "column_name string, ordinal_position int, data_type string, "
        "is_nullable string",
    ).filter("table_name <> ''").createOrReplaceTempView("information_schema_columns")
    views = [t for t in tables if t[3] == "VIEW"]
    spark.createDataFrame(
        [(c, s, n, None) for c, s, n, _ in views] or [("", "", "", None)],
        "table_catalog string, table_schema string, table_name string, "
        "definition string",
    ).filter("table_name <> ''").createOrReplaceTempView("information_schema_views")
    spark.createDataFrame(
        [(d.catalog or "spark_catalog", d.name) for d in spark.catalog.listDatabases()]
        or [("spark_catalog", "default")],
        "catalog_name string, schema_name string",
    ).createOrReplaceTempView("information_schema_schemata")
    # DataFusion's df_settings analogue: the session's explicit config
    # (Spark's `SET` command output, renamed to DataFusion's columns)
    spark.sql("SET").selectExpr("key AS name", "value").createOrReplaceTempView(
        "information_schema_df_settings"
    )




# SELECT * REPLACE (expr AS col, ...) — the wildcard-option sqlparser-rs
# (and DuckDB) accept alongside EXCLUDE. Spark has no native REPLACE and
# a pure-text rewrite cannot know the column list, so this lives at the
# execution layer where the catalog can resolve it: expand `*` to the
# FROM table's explicit columns with the replaced expressions spliced
# in. Scope (bail → Spark raises on the original text): plain `SELECT *
# REPLACE (...) FROM <single identifier>` — joins, subqueries, and
# `tbl.*` forms are left untouched.
_STAR_REPLACE_RE = re.compile(
    r"(?<![\w.])\*\s+REPLACE\s*\(", re.IGNORECASE
)
_SR_FROM_RE = re.compile(r"\bFROM\s+([A-Za-z_][\w.]*)", re.IGNORECASE)
_SR_CLAUSE_RE = re.compile(
    r"\b(WHERE|GROUP\s+BY|HAVING|QUALIFY|ORDER\s+BY|LIMIT|OFFSET)\b",
    re.IGNORECASE,
)


def _rewrite_star_replace(spark: SparkSession, sql: str) -> str:
    from csvb_spark.functions.translate import _scan_balanced, _split_args

    m = _STAR_REPLACE_RE.search(sql)
    if not m:
        return sql
    close = _scan_balanced(sql, m.end() - 1)
    if close < 0:
        return sql
    items = _split_args(sql[m.end() : close - 1])
    repl: dict[str, str] = {}
    for item in items:
        am = re.search(r"\s+AS\s+([A-Za-z_][\w]*)\s*$", item, re.IGNORECASE)
        if not am:
            return sql
        repl[am.group(1).lower()] = item[: am.start()].strip()
    fm = _SR_FROM_RE.search(sql, close)
    if not fm:
        return sql
    between = sql[close : fm.start()]
    if between.strip():  # something between the option and FROM — bail
        return sql
    table = fm.group(1)
    # the FROM clause must be EXACTLY one identifier: anything between
    # the table name and the next clause keyword (an alias, JOIN,
    # comma-join, sample, ...) → bail
    rest = sql[fm.end() :]
    cm = _SR_CLAUSE_RE.search(rest)
    if (rest[: cm.start()] if cm else rest).strip():
        return sql
    try:
        cols = spark.table(table).columns
    except Exception:
        return sql
    if not set(repl) <= {c.lower() for c in cols}:
        return sql  # replacing a nonexistent column: let Spark raise
    select_list = ", ".join(
        f"{repl[c.lower()]} AS {c}" if c.lower() in repl else c for c in cols
    )
    return sql[: m.start()] + select_list + " " + sql[fm.start() :]


# SELECT COLUMNS('regex') — DuckDB's columns-by-pattern selector.
# Same execution-layer treatment as REPLACE: resolve the FROM table's
# schema, keep columns whose name fully matches the pattern, expand to
# an explicit list. Scope: COLUMNS('...') select items in a
# single-identifier FROM; non-literal arguments or zero matches bail.
# pattern arrives either as a raw quoted literal or, when the caller
# pre-masked string literals (execute_sql does — see below), as a
# \x00LITn\x00 placeholder to resolve against the literal table
_SR_COLUMNS_RE = re.compile(
    r"(?<![\w.])COLUMNS\s*\(\s*(?:'([^']*)'|\x00LIT(\d+)\x00)\s*\)",
    re.IGNORECASE,
)


def _rewrite_columns_selector(
    spark: SparkSession, sql: str, literals: list[str] | None = None
) -> str:
    # expand EVERY occurrence (a select list may use several
    # selectors); each expansion shortens nothing the next match
    # depends on, and a bail leaves the remainder untouched
    pos = 0
    while True:
        m = _SR_COLUMNS_RE.search(sql, pos)
        if not m:
            return sql
        if m.group(1) is not None:
            pattern = m.group(1)
        else:
            if literals is None:
                return sql
            lit = literals[int(m.group(2))]
            if len(lit) < 2 or lit[0] != "'" or lit[-1] != "'":
                return sql
            pattern = lit[1:-1]
        fm = _SR_FROM_RE.search(sql, m.end())
        if not fm:
            return sql
        rest = sql[fm.end() :]
        cm = _SR_CLAUSE_RE.search(rest)
        if (rest[: cm.start()] if cm else rest).strip():
            return sql
        try:
            cols = spark.table(fm.group(1)).columns
            pat = re.compile(pattern)
        except Exception:
            return sql
        keep = [c for c in cols if pat.fullmatch(c)]
        if not keep:
            pos = m.end()
            continue
        expansion = ", ".join(keep)
        sql = sql[: m.start()] + expansion + sql[m.end() :]
        pos = m.start() + len(expansion)


def execute_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Translate reference-dialect SQL and run it, emulating
    information_schema on demand."""
    from csvb_spark.functions.translate import translate_sql

    if _INFO_SCHEMA_RE.search(sql):
        refresh_information_schema(spark)
        sql = _INFO_SCHEMA_RE.sub(lambda m: f"information_schema_{m.group(1).lower()}", sql)
    # mask string literals before the schema-aware rewrites so text
    # that LOOKS like "* REPLACE (...)" or "COLUMNS('...')" inside a
    # quoted literal is never rewritten (translate.py does the same
    # for its own rewrites)
    from csvb_spark.functions.translate import (
        _protect_literals,
        _restore_literals,
    )

    masked, lits = _protect_literals(sql)
    masked = _rewrite_star_replace(spark, masked)
    masked = _rewrite_columns_selector(spark, masked, lits)
    sql = _restore_literals(masked, lits)
    return spark.sql(translate_sql(sql))
