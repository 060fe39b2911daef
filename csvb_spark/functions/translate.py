"""DataFusion-dialect → Spark-SQL textual rewrites.

The reference accepts the sqlparser-rs 0.53 "generic/postgres-ish"
dialect (SURVEY.md §0); Spark's parser rejects a few surface forms.
This module rewrites them before ``spark.sql``:

- ``expr::type``          → ``CAST(expr AS type)``
- ``a ~ p`` / ``a !~ p``  → ``a RLIKE p`` / ``NOT (a RLIKE p)``
- ``a ~* p`` / ``a !~* p``→ case-insensitive via ``(?i)`` prefix
- ``a SIMILAR TO p``      → ``a RLIKE p`` (anchored)
- pure function renames (``approx_distinct`` →
  ``approx_count_distinct``, ``string_agg`` → ``listagg``, ...)

This is a pragmatic token-level rewriter, not a SQL parser — it is
careful to skip string literals so a ``'::'`` inside a literal is
untouched. Queries written natively for this engine don't need it;
it exists so a csvb/DataFusion user can paste their SQL unchanged.
"""

from __future__ import annotations

import re

# Pure renames: DataFusion 44 name -> Spark name (arg-compatible).
_FN_RENAMES: dict[str, str] = {
    "approx_distinct": "approx_count_distinct",
    "approx_percentile_cont": "percentile_approx",
    "approx_median": "median",
    "string_agg": "listagg",
    "array_agg": "array_agg",  # identity; present for inventory clarity
    "make_array": "array",
    "array_has": "array_contains",
    "array_has_any": "arrays_overlap",
    "array_to_string": "array_join",
    "array_length": "size",
    "cardinality": "size",
    "list_length": "size",
    "array_element": "element_at",
    "map_extract": "element_at",
    "arrow_typeof": "typeof",
    "regexp_match": "regexp_extract_all",
    "to_char": "date_format",
    "instr_ci": "instr",
    "generate_series": "sequence",
    "array_ndims": "csvb_array_ndims",  # not shimmed yet; reserved
}

_STRING_LITERAL = re.compile(r"'(?:[^']|'')*'")


def _protect_literals(sql: str) -> tuple[str, list[str]]:
    literals: list[str] = []

    def stash(m: re.Match[str]) -> str:
        literals.append(m.group(0))
        return f"\x00LIT{len(literals) - 1}\x00"

    return _STRING_LITERAL.sub(stash, sql), literals


def _restore_literals(sql: str, literals: list[str]) -> str:
    for i, lit in enumerate(literals):
        sql = sql.replace(f"\x00LIT{i}\x00", lit)
    return sql


# expr::type — applied right-to-left so chained casts nest correctly.
_CAST_RE = re.compile(
    r"""(?P<expr>\x00LIT\d+\x00            # protected literal
        |[A-Za-z_][\w.]*\s*\([^()]*\)      # simple call f(...)
        |[A-Za-z_][\w.]*                   # identifier
        |\d+(?:\.\d+)?                     # number
        |\([^()]*\))                       # parenthesised expr
        ::\s*(?P<type>[A-Za-z_][\w]*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)""",
    re.VERBOSE,
)

_REGEX_OP_RE = re.compile(
    r"(?P<lhs>\x00LIT\d+\x00|[A-Za-z_][\w.]*(?:\s*\([^()]*\))?)\s*"
    r"(?P<op>!~\*|!~|~\*|~)\s*"
    r"(?P<rhs>\x00LIT\d+\x00|[A-Za-z_][\w.]*(?:\s*\([^()]*\))?)"
)

_SIMILAR_TO_RE = re.compile(
    r"(?P<not>NOT\s+)?SIMILAR\s+TO\s+(?P<pat>\x00LIT\d+\x00)", re.IGNORECASE
)


def translate_sql(sql: str) -> str:
    """Rewrite DataFusion-dialect SQL into Spark SQL."""
    out, lits = _protect_literals(sql)

    # expr::type casts (repeat for chains like x::text::int)
    prev = None
    while prev != out:
        prev = out
        out = _CAST_RE.sub(lambda m: f"CAST({m.group('expr')} AS {m.group('type')})", out)

    # posix regex operators
    def regex_op(m: re.Match[str]) -> str:
        lhs, op, rhs = m.group("lhs"), m.group("op"), m.group("rhs")
        ci = "*" in op
        pat = f"concat('(?i)', {rhs})" if ci else rhs
        base = f"{lhs} RLIKE {pat}"
        return f"NOT ({base})" if op.startswith("!") else base

    out = _REGEX_OP_RE.sub(regex_op, out)

    # SIMILAR TO — SQL regex is implicitly anchored
    def similar(m: re.Match[str]) -> str:
        neg = "NOT " if m.group("not") else ""
        return f"{neg}RLIKE concat('^(?:', {m.group('pat')}, ')$')"

    out = _SIMILAR_TO_RE.sub(similar, out)

    # function renames
    for src, dst in _FN_RENAMES.items():
        if src != dst:
            out = re.sub(rf"\b{src}\s*\(", f"{dst}(", out, flags=re.IGNORECASE)

    return _restore_literals(out, lits)
