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
    # generate_series in scalar position → sequence; the FROM-position
    # (table factor) form is handled structurally in translate_sql.
    "generate_series": "sequence",
}

# Argument-aware rewrites: DataFusion call → polymorphic Spark SQL
# expression (type-preserving, Catalyst-inlined — no UDF). Args arrive
# split at top-level commas. DataFusion semantics: 1-based positions,
# array_replace replaces the FIRST occurrence
# (datafusion-functions-nested 44; SURVEY.md §2.B.8 array row).
def _rw_array_resize(args: list[str]) -> str:
    a, n = args[0], args[1]
    # 2-arg form pads with a typed NULL of the element type
    fill = args[2] if len(args) > 2 else f"IF(false, ({a})[0], NULL)"
    return (
        f"concat(slice({a}, 1, least({n}, size({a}))), "
        f"array_repeat({fill}, greatest(CAST({n} AS INT) - size({a}), 0)))"
    )


def _rw_array_replace(args: list[str]) -> str:
    a, f, t = args
    return (
        f"transform({a}, (x_, i_) -> "
        f"IF(i_ = array_position({a}, {f}) - 1, {t}, x_))"
    )


def _rw_array_replace_all(args: list[str]) -> str:
    a, f, t = args
    return f"transform({a}, x_ -> IF(x_ <=> {f}, {t}, x_))"


def _rw_array_positions(args: list[str]) -> str:
    a, v = args
    return (
        f"filter(transform({a}, (x_, i_) -> "
        f"IF(x_ <=> {v}, CAST(i_ + 1 AS BIGINT), CAST(NULL AS BIGINT))), "
        f"p_ -> p_ IS NOT NULL)"
    )


_FN_REWRITES: dict[str, "callable"] = {
    "array_resize": _rw_array_resize,
    "array_replace": _rw_array_replace,
    "array_replace_all": _rw_array_replace_all,
    "array_positions": _rw_array_positions,
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

# --- call-level rewriting helpers (balanced parens) ---

def _find_calls(sql: str, name: str):
    """Yield (start, open_paren, close_paren) for each ``name(...)``
    call at any nesting depth, left to right."""
    for m in re.finditer(rf'(?<![\w."]){name}\s*\(', sql, re.IGNORECASE):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth == 0:
            yield m.start(), m.end() - 1, i - 1


def _split_args(argstr: str) -> list[str]:
    """Split at top-level commas (literals are already protected).
    Tracks both parens and brackets so a DataFusion bracket-syntax
    array literal (``array_replace([1,2,1], 1, 9)``) keeps its commas."""
    args, depth, start = [], 0, 0
    for i, ch in enumerate(argstr):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(argstr[start:i].strip())
            start = i + 1
    tail = argstr[start:].strip()
    if tail:
        args.append(tail)
    return args


def _apply_fn_rewrites(sql: str) -> str:
    changed = True
    while changed:
        changed = False
        for name, fn in _FN_REWRITES.items():
            for start, op, cl in _find_calls(sql, name):
                repl = fn(_split_args(sql[op + 1 : cl]))
                sql = sql[:start] + repl + sql[cl + 1 :]
                changed = True
                break  # offsets shifted — rescan
            if changed:
                break
    return sql


_INTERVAL_UNITS_US = {
    "microsecond": 1,
    "millisecond": 1000,
    "second": 1000000,
    "minute": 60 * 1000000,
    "hour": 3600 * 1000000,
    "day": 86400 * 1000000,
    "week": 7 * 86400 * 1000000,
}

_DATE_BIN_INTERVAL_RE = re.compile(
    r"date_bin\s*\(\s*INTERVAL\s+\x00LIT(?P<idx>\d+)\x00\s*,", re.IGNORECASE
)


def _rewrite_date_bin_interval(sql: str, literals: list[str]) -> str:
    """date_bin(INTERVAL '15 minutes', ts, origin) →
    date_bin_micros(900000000, ts, origin). Fixed-width units only
    (month/year strides are calendar-dependent and left untouched —
    Spark then reports the unsupported call instead of mis-binning).
    Compound literals ('1 hour 30 minutes') sum."""

    def repl(m: re.Match[str]) -> str:
        lit = literals[int(m.group("idx"))].strip("'")
        if "." in lit:
            # fractional strides ('1.5 hours') would mis-parse as
            # '5 hours' — leave the call untouched so Spark reports the
            # unsupported form loudly instead of silently mis-binning
            return m.group(0)
        total_us = 0
        for qty, unit in re.findall(r"(\d+)\s*([a-zA-Z]+)", lit):
            u = unit.lower().rstrip("s")
            if u not in _INTERVAL_UNITS_US:
                return m.group(0)  # calendar unit — leave as-is
            total_us += int(qty) * _INTERVAL_UNITS_US[u]
        if total_us == 0:
            return m.group(0)
        return f"date_bin_micros({total_us},"

    return _DATE_BIN_INTERVAL_RE.sub(repl, sql)


# generate_series as a table factor (FROM/JOIN position). DataFusion
# exposes it as a TVF whose output column is `value`; Spark's TVF set
# has explode(), so rewrite to a derived table. The scalar-position
# form is a plain rename to sequence() (see _FN_RENAMES). Only FROM/
# JOIN anchors — a bare comma could equally be a SELECT-list separator
# and a textual rewriter can't tell the difference; comma-style cross
# joins should use CROSS JOIN.
_GS_TABLE_RE = re.compile(
    r"(?P<kw>\bFROM\b|\bJOIN\b)(?P<ws>\s*)generate_series\s*\(",
    re.IGNORECASE,
)


def _rewrite_generate_series_table(sql: str) -> str:
    while True:
        m = _GS_TABLE_RE.search(sql)
        if not m:
            return sql
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:
            return sql  # unbalanced — leave untouched
        args = sql[m.end() : i - 1]
        sql = (
            sql[: m.start()]
            + f"{m.group('kw')}{m.group('ws')}"
            + f"(SELECT col AS value FROM explode(sequence({args})))"
            + sql[i:]
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

    # interval-literal date_bin → micros-stride shim
    out = _rewrite_date_bin_interval(out, lits)

    # generate_series as a table factor
    out = _rewrite_generate_series_table(out)

    # argument-aware call rewrites (array editors)
    out = _apply_fn_rewrites(out)

    # function renames — the lookbehind keeps qualified/quoted
    # identifiers intact (a column literally named `cardinality`, or
    # `t."array_length"`, must not be renamed; only call sites
    # `name(` in plain position are)
    for src, dst in _FN_RENAMES.items():
        if src != dst:
            out = re.sub(
                rf'(?<![\w."]){src}\s*\(', f"{dst}(", out, flags=re.IGNORECASE
            )

    return _restore_literals(out, lits)
