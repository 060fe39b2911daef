"""DataFusion-dialect → Spark-SQL textual rewrites.

The reference accepts the sqlparser-rs 0.53 "generic/postgres-ish"
dialect (SURVEY.md §0); Spark's parser rejects a few surface forms.
This module rewrites them before ``spark.sql``:

- ``expr::type``          → ``CAST(expr AS type)``
- ``a ~ p`` / ``a !~ p``  → ``a RLIKE p`` / ``NOT (a RLIKE p)``
- ``a ~* p`` / ``a !~* p``→ case-insensitive via ``(?i)`` prefix
- ``a SIMILAR TO p``      → ``a RLIKE p`` (anchored)
- ``SELECT DISTINCT ON (k) …`` → row_number-over-partition subquery
- ``QUALIFY <pred>``        → projected-boolean subquery filter
- ``* EXCLUDE (cols)``     → ``* EXCEPT (cols)``
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


# --- chrono strftime → java.time DateTimeFormatter patterns ---
#
# The reference's to_char/to_date/to_timestamp accept Rust-chrono
# format strings (DataFusion 44 datafusion-functions, Cargo.lock:1287;
# chrono's strftime docs are public). Spark's datetime functions speak
# java.time patterns, so '%Y-%m-%d' passed through unchanged would
# produce WRONG OUTPUT, not an error. Map the specifiers; any
# specifier with no faithful java.time equivalent raises so the user
# gets a loud error instead of silently corrupted datetimes.
_CHRONO_MAP: dict[str, str] = {
    # chrono %e/%k/%l are SPACE-padded; java.time has no space-padded
    # field Spark accepts. The FORMAT direction renders them faithfully
    # via the sentinel shim (_CHRONO_SPACE_PAD below); the PARSE
    # direction maps to the unpadded single-letter fields here — java
    # parses 1-2 digits, so '5' and '05' both parse but a space-padded
    # ' 5' does not (documented divergence, parse side only)
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "I": "hh", "l": "h", "M": "mm", "S": "ss",
    "a": "EEE", "A": "EEEE", "b": "MMM", "h": "MMM", "B": "MMMM",
    "p": "a", "P": "a", "j": "DDD", "q": "Q",
    "f": "SSSSSSSSS", "3f": "SSS", "6f": "SSSSSS", "9f": "SSSSSSSSS",
    ".f": ".SSSSSS", ".3f": ".SSS", ".6f": ".SSSSSS",
    ".9f": ".SSSSSSSSS",
    "z": "xx", ":z": "xxx", "Z": "zzz",
    # composite shorthands (chrono defines these as fixed expansions)
    "D": "MM/dd/yy", "F": "yyyy-MM-dd", "T": "HH:mm:ss",
    "X": "HH:mm:ss", "R": "HH:mm", "r": "hh:mm:ss a",
    "v": "d-MMM-yyyy", "c": "EEE MMM d HH:mm:ss yyyy",
}
# %-X (no padding) variants for the numeric fields
_CHRONO_UNPADDED: dict[str, str] = {
    "Y": "yyyy", "y": "y", "m": "M", "d": "d", "e": "d", "H": "H",
    "k": "H", "I": "h", "l": "h", "M": "m", "S": "s", "j": "D",
}
# space-padded specifiers (chrono %e/%k/%l and the %_X pad flag):
# the FORMAT direction renders the zero-padded java field between
# \x01/\x02 sentinel literals, and _spacepad_wrap() post-processes the
# rendered string — width-1 regexp_replace passes turn each leading
# zero into a space, then translate() strips the sentinels. All
# JVM-side; the field's natural chrono width is len(the java pattern).
_CHRONO_SPACE_PAD: dict[str, str] = {"e": "dd", "k": "HH", "l": "hh"}
_SPACEPAD_FIELD_RE = re.compile("\x01([A-Za-z]+)\x02")


def _spacepad_frag(padded: str) -> str:
    # sentinels go in UNQUOTED — java patterns take non-letter chars as
    # literals directly, and a quoted sentinel adjacent to a quoted
    # literal run would merge ('\x02'' of ' reads as one section with
    # an escaped quote, leaking a ' into the output)
    return "\x01" + padded + "\x02"


def _spacepad_wrap(expr: str, java: str, mklit) -> str:
    """Wrap a rendered date_format() so sentinel-marked fields come out
    SPACE-padded: chrono pads %e/%k/%l/%_X with spaces to the field's
    natural width, java.time only zero-pads. Each regexp_replace pass
    converts one more leading zero — but ONLY when another digit
    follows it (the lookahead), so a field's final digit survives
    ('00' hours must render ' 0', not '  '). max(width)-1 passes cover
    the widest field; narrower fields stop early at the lookahead.
    translate() then deletes the sentinels. Sentinel bytes are control
    chars no datetime field can render, so data cannot collide."""
    widths = [len(m) for m in _SPACEPAD_FIELD_RE.findall(java)]
    if not widths:
        return expr
    pat = mklit("(\x01 *)0(?=[0-9])")
    rep = mklit("$1 ")
    for _ in range(max(widths) - 1):
        expr = f"regexp_replace({expr}, {pat}, {rep})"
    return f"translate({expr}, {mklit(chr(1) + chr(2))}, {mklit('')})"


def _chrono_to_java(fmt: str, for_format: bool = False) -> str:
    """Translate one chrono strftime format string to the equivalent
    java.time DateTimeFormatter pattern. Literal runs containing
    letters are single-quoted (every ASCII letter is reserved in
    java.time patterns); unsupported specifiers raise ValueError.
    With ``for_format=True`` (the to_char/date_format direction),
    space-padded specifiers (%e/%k/%l, %_X) emit sentinel-wrapped
    zero-padded fields for :func:`_spacepad_wrap` to post-process into
    true space padding; the parse direction maps them to unpadded
    fields instead (java accepts 1-2 digits).
    Two ADJACENT specifiers whose java fields share a letter
    (``%Y%Y`` → ``yyyyyyyy``) would merge into one wider field and
    render differently — java patterns have no zero-width separator,
    so that corner raises instead of silently diverging (found by the
    cross-engine hypothesis fuzz)."""
    out: list[str] = []
    lit: list[str] = []

    def emit(frag: str) -> None:
        if out and not lit and out[-1] and frag:
            last, first = out[-1][-1], frag[0]
            if last == first and last.isalpha():
                raise ValueError(
                    f"chrono format {fmt!r}: adjacent specifiers map to "
                    f"java fields that would merge ({out[-1]!r} + "
                    f"{frag!r}) — separate them with literal text"
                )
        out.append(frag)

    def flush() -> None:
        if lit:
            text = "".join(lit)
            if re.search(r"[A-Za-z']", text):
                text = "'" + text.replace("'", "''") + "'"
            out.append(text)
            lit.clear()

    i, n = 0, len(fmt)
    while i < n:
        c = fmt[i]
        if c != "%":
            lit.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError(f"trailing '%' in chrono format {fmt!r}")
        nxt = fmt[i + 1]
        if nxt == "%":
            lit.append("%")
            i += 2
            continue
        if nxt == "n":
            lit.append("\n")
            i += 2
            continue
        if nxt == "t":
            lit.append("\t")
            i += 2
            continue
        if nxt in "-0_" and fmt[i + 2 : i + 3] in _CHRONO_UNPADDED:
            flush()
            base = fmt[i + 2]
            if nxt == "_":
                # %_X is SPACE-padded to the field's natural chrono
                # width: render via the sentinel shim; parse maps to
                # the unpadded field (java takes 1-2 digits — space-
                # padded INPUT stays a documented parse divergence)
                padded = _CHRONO_SPACE_PAD.get(base, _CHRONO_MAP[base])
                emit(
                    _spacepad_frag(padded)
                    if for_format
                    else _CHRONO_UNPADDED[base]
                )
            else:
                # %0X zero-pads to natural width — for the space-padded
                # letters that width is 2, not their unpadded mapping
                emit(
                    _CHRONO_UNPADDED[base]
                    if nxt == "-"
                    else _CHRONO_SPACE_PAD.get(base, _CHRONO_MAP[base])
                )
            i += 3
            continue
        key = None
        for klen in (3, 2, 1):
            cand = fmt[i + 1 : i + 1 + klen]
            if cand in _CHRONO_MAP:
                key = cand
                break
        if key is None:
            raise ValueError(
                f"chrono specifier %{nxt} in format {fmt!r} has no "
                "Spark DateTimeFormatter equivalent"
            )
        flush()
        if for_format and key in _CHRONO_SPACE_PAD:
            emit(_spacepad_frag(_CHRONO_SPACE_PAD[key]))
        else:
            emit(_CHRONO_MAP[key])
        i += 1 + len(key)
    flush()
    return "".join(out)


_CHRONO_FNS = ("to_char", "to_date", "to_timestamp")
_LIT_TOKEN_RE = re.compile(r"\x00LIT(\d+)\x00")


def _rewrite_chrono_datetime(sql: str, literals: list[str]) -> str:
    """to_char/to_date/to_timestamp with chrono format literals →
    Spark calls with translated java.time patterns. DataFusion's
    to_date/to_timestamp try MULTIPLE formats in order, first parse
    wins — Spark's return NULL on a failed parse, so the multi-format
    form becomes coalesce(). Format literals without a '%' are left
    alone (already java-pattern / engine-native callers)."""

    produced: set[int] = set()

    def mklit(s: str) -> str:
        literals.append("'" + s.replace("'", "''") + "'")
        produced.add(len(literals) - 1)
        return f"\x00LIT{len(literals) - 1}\x00"

    changed = True
    while changed:
        changed = False
        for name in _CHRONO_FNS:
            for start, op, cl in _find_calls(sql, name):
                args = _split_args(sql[op + 1 : cl])
                if len(args) < 2:
                    continue
                idxs = []
                for a in args[1:]:
                    m = _LIT_TOKEN_RE.fullmatch(a)
                    if not m:
                        idxs = None
                        break
                    idxs.append(int(m.group(1)))
                if not idxs:
                    continue
                if any(k in produced for k in idxs):
                    # already translated on an earlier pass — a java
                    # pattern whose source had %% still contains '%',
                    # and re-translating it would corrupt it
                    continue
                raw = [literals[k][1:-1].replace("''", "'") for k in idxs]
                if not any("%" in r for r in raw):
                    continue
                lname = name.lower()
                if lname == "to_char":
                    java = _chrono_to_java(raw[0], for_format=True)
                    repl = _spacepad_wrap(
                        f"date_format({args[0]}, {mklit(java)})",
                        java,
                        mklit,
                    )
                    sql = sql[:start] + repl + sql[cl + 1 :]
                    changed = True
                    break  # offsets shifted — rescan
                toks = [mklit(_chrono_to_java(r)) for r in raw]
                if len(toks) == 1:
                    repl = f"{lname}({args[0]}, {toks[0]})"
                else:
                    # DataFusion tries formats in order: first parse
                    # wins, error only when NONE parses. Under ANSI
                    # (Spark 4 default) to_date throws on a failed
                    # parse, so earlier branches use try_* and the
                    # LAST stays strict — coalesce short-circuits, so
                    # the strict branch only runs when all else failed.
                    branches = ", ".join(
                        f"try_{lname}({args[0]}, {t})" for t in toks[:-1]
                    )
                    repl = (
                        f"coalesce({branches}, "
                        f"{lname}({args[0]}, {toks[-1]}))"
                    )
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


# CREATE EXTERNAL TABLE (DataFusion DDL; reference surface via
# `csvb exec` / pgwire — csvb_engine delegates to DataFusion's
# SessionContext::sql, which accepts
#   CREATE [UNBOUNDED] EXTERNAL TABLE [IF NOT EXISTS] t [(cols)]
#   STORED AS CSV [WITH HEADER ROW] [PARTITIONED BY (...)]
#   [OPTIONS (...)] LOCATION 'path'
# ). Spark rejects STORED AS CSV, so rewrite to the datasource form:
#   CREATE TABLE t [(cols)] USING csv OPTIONS (path 'p', ...)
# A path-ful USING table is external in Spark too (unmanaged; DROP
# leaves the files). DataFusion option keys arrive as string literals
# with a `format.` prefix; the common CSV ones map onto Spark reader
# options (has_header -> header, delimiter -> sep).
_CET_HEAD_RE = re.compile(
    r"^\s*CREATE\s+(?:UNBOUNDED\s+)?EXTERNAL\s+TABLE\s+"
    r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.\"`]+)\s*",
    re.IGNORECASE,
)

_CET_FORMATS = {
    "csv": "csv",
    "parquet": "parquet",
    "json": "json",
    "ndjson": "json",
    "avro": "avro",
}

_CET_KEY_MAP = {
    "has_header": "header",
    "delimiter": "sep",
    "compression": "compression",
    "escape": "escape",
    "quote": "quote",
    "null_value": "nullValue",
}


def _scan_balanced(s: str, open_idx: int) -> int:
    """Index one past the ')' matching the '(' at ``open_idx``."""
    depth, i = 1, open_idx + 1
    while i < len(s) and depth:
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
        i += 1
    return i if depth == 0 else -1


def _rewrite_create_external_table(sql: str, literals: list[str]) -> str:
    m = _CET_HEAD_RE.match(sql)
    if not m:
        return sql
    i = m.end()
    cols = ""
    if i < len(sql) and sql[i] == "(":
        end = _scan_balanced(sql, i)
        if end < 0:
            return sql
        cols = sql[i:end]
        i = end
    rest = sql[i:]

    fm = re.search(r"STORED\s+AS\s+(\w+)", rest, re.IGNORECASE)
    lm = re.search(r"LOCATION\s+(\x00LIT\d+\x00)", rest, re.IGNORECASE)
    if not fm or not lm:
        return sql
    using = _CET_FORMATS.get(fm.group(1).lower())
    if using is None:
        return sql  # unknown format — let Spark raise on the original

    opts: dict[str, str] = {"path": lm.group(1)}
    if using == "csv":
        # DataFusion 44 defaults CSV has_header=true; WITH HEADER ROW is
        # the pre-38 spelling. Explicit OPTIONS below can override.
        opts["header"] = "'true'"
    if not cols and using in ("csv", "json"):
        opts["inferSchema"] = "'true'"

    om = re.search(r"OPTIONS\s*\(", rest, re.IGNORECASE)
    if om:
        end = _scan_balanced(rest, om.end() - 1)
        if end < 0:
            return sql
        for pair in _split_args(rest[om.end() : end - 1]):
            pm = re.match(
                r"(?P<k>\x00LIT\d+\x00|[\w.]+)\s*=?\s*"
                r"(?P<v>\x00LIT\d+\x00|\S+)$",
                pair.strip(),
            )
            if not pm:
                return sql  # unparseable option — leave statement as-is
            key = pm.group("k")
            if key.startswith("\x00"):
                key = literals[int(key[4:-1])].strip("'")
            key = key.lower().removeprefix("format.")
            val = pm.group("v")
            if not val.startswith("\x00"):
                val = f"'{val}'"
            opts[_CET_KEY_MAP.get(key, key)] = val

    pb = re.search(r"PARTITIONED\s+BY\s*\(([^)]*)\)", rest, re.IGNORECASE)
    partitioned = f" PARTITIONED BY ({pb.group(1)})" if pb else ""

    opt_sql = ", ".join(
        f"{k} {v}" for k, v in opts.items() if k not in ("path",)
    )
    opt_sql = f"path {opts['path']}" + (f", {opt_sql}" if opt_sql else "")
    ine = "IF NOT EXISTS " if m.group("ine") else ""
    cols_sql = f" {cols}" if cols else ""
    return (
        f"CREATE TABLE {ine}{m.group('name')}{cols_sql} USING {using} "
        f"OPTIONS ({opt_sql}){partitioned}"
    )


# SELECT * EXCLUDE (...) — the wildcard-options form DataFusion 44
# accepts (sqlparser-rs 0.53 WildcardAdditionalOptions; DuckDB spells
# it identically). Spark's spelling is `* EXCEPT (cols)`, a pure
# keyword swap. Both the parenthesized list and the bare
# single-column form rewrite; `tbl.* EXCLUDE` works the same way.
_EXCLUDE_RE = re.compile(
    r"(?P<star>\*\s+)EXCLUDE"
    r"(?P<cols>\s*\([^)]*\)"
    r"|\s+(?!(?:FROM|WHERE|GROUP|HAVING|QUALIFY|ORDER|LIMIT|OFFSET|JOIN|ON|AS|AND|OR|UNION|INTERSECT|EXCEPT)\b)[A-Za-z_][\w]*)",
    re.IGNORECASE,
)


def _rewrite_exclude(sql: str) -> str:
    def repl(m: re.Match[str]) -> str:
        cols = m.group("cols").strip()
        if not cols.startswith("("):
            cols = f"({cols})"
        return f"{m.group('star')}EXCEPT {cols}"

    return _EXCLUDE_RE.sub(repl, sql)


# SELECT DISTINCT ON (keys) — the Postgres form DataFusion 44 accepts
# (sqlparser-rs 0.53 parses it; datafusion-sql plans it — reference
# route Cargo.lock:1546). Spark has no surface form, so rewrite onto
# the row_number() shape q24 proves out:
#
#   SELECT DISTINCT ON (k) cols FROM ... ORDER BY k, o DESC [LIMIT n]
#   →
#   SELECT * EXCEPT (__don_s0.., __don_rn) FROM (
#     SELECT cols, k AS __don_s0, o AS __don_s1,
#            ROW_NUMBER() OVER (PARTITION BY k ORDER BY k, o DESC) AS __don_rn
#     FROM ...
#   ) WHERE __don_rn = 1 ORDER BY __don_s0, __don_s1 DESC [LIMIT n]
#
# Postgres semantics: first row per key group under the ORDER BY,
# output ordered by the full ORDER BY. The sort expressions are
# aliased into the inner projection so the outer ORDER BY resolves
# even when they aren't in the select list, then EXCEPTed back out.
# Top-level statements only (optionally under a WITH block); a
# DISTINCT ON inside a set operation or subquery is left untouched so
# Spark reports the unsupported form instead of a silent mis-rewrite.
_DON_RE = re.compile(r"\bSELECT\s+DISTINCT\s+ON\s*\(", re.IGNORECASE)
_DON_ORDER_DIR_RE = re.compile(
    r"\s+(?P<dir>ASC|DESC)?\s*(?P<nulls>NULLS\s+(?:FIRST|LAST))?\s*$",
    re.IGNORECASE,
)


def _depth0_search(pattern: re.Pattern[str], s: str, start: int = 0):
    """First match of ``pattern`` at paren depth 0 (from ``start``)."""
    for m in pattern.finditer(s, start):
        if s.count("(", 0, m.start()) == s.count(")", 0, m.start()):
            return m
    return None


def _rewrite_distinct_on(sql: str) -> str:
    m = _depth0_search(_DON_RE, sql)
    if not m:
        return sql
    close = _scan_balanced(sql, m.end() - 1)
    if close < 0:
        return sql
    keys = _split_args(sql[m.end() : close - 1])
    if not keys:
        return sql
    fm = _depth0_search(re.compile(r"\bFROM\b", re.IGNORECASE), sql, close)
    if not fm:
        return sql
    select_list = sql[close:fm.start()].strip()
    tail = sql[fm.start() :]
    if _depth0_search(
        re.compile(r"\b(UNION|INTERSECT|EXCEPT)\b", re.IGNORECASE), tail
    ):
        return sql  # set operation — bail, let Spark raise on the original
    om = _depth0_search(re.compile(r"\bORDER\s+BY\b", re.IGNORECASE), tail)
    order_items: list[str] = []
    limit_tail = ""
    if om:
        lm = _depth0_search(
            re.compile(r"\b(LIMIT|OFFSET)\b", re.IGNORECASE), tail, om.end()
        )
        order_str = tail[om.end() : lm.start() if lm else len(tail)]
        limit_tail = " " + tail[lm.start() :].strip() if lm else ""
        order_items = _split_args(order_str)
        from_part = tail[: om.start()].rstrip()
    else:
        lm = _depth0_search(re.compile(r"\b(LIMIT|OFFSET)\b", re.IGNORECASE), tail)
        limit_tail = " " + tail[lm.start() :].strip() if lm else ""
        from_part = tail[: lm.start() if lm else len(tail)].rstrip()

    # split each ORDER BY item into (expr, direction suffix)
    parsed: list[tuple[str, str]] = []
    for item in order_items:
        dm = _DON_ORDER_DIR_RE.search(item)
        if dm and (dm.group("dir") or dm.group("nulls")):
            parsed.append((item[: dm.start()].strip(), " " + dm.group(0).strip()))
        else:
            parsed.append((item.strip(), ""))

    # ORDER BY may reference a select-list ALIAS (the standard
    # Postgres idiom); the ROW_NUMBER window lives in the projection
    # that DEFINES those aliases, where Spark forbids lateral alias
    # references — substitute the alias's defining expression instead
    # (exactly what the alias means)
    aliases: dict[str, str] = {}
    for sel_item in _split_args(select_list):
        am = re.search(r"\s+AS\s+([A-Za-z_][\w]*)\s*$", sel_item, re.IGNORECASE)
        if am:
            aliases[am.group(1).lower()] = sel_item[: am.start()].strip()
    parsed = [
        (f"({aliases[e.lower()]})", d)
        if re.fullmatch(r"[A-Za-z_][\w]*", e) and e.lower() in aliases
        else (e, d)
        for e, d in parsed
    ]

    win_order = (
        ", ".join(e + d for e, d in parsed) if parsed else ", ".join(keys)
    )
    extras = ", ".join(
        f"{e} AS __don_s{i}" for i, (e, _d) in enumerate(parsed)
    )
    except_cols = [f"__don_s{i}" for i in range(len(parsed))] + ["__don_rn"]
    inner = (
        f"SELECT {select_list}, "
        + (f"{extras}, " if extras else "")
        + f"ROW_NUMBER() OVER (PARTITION BY {', '.join(keys)} "
        + f"ORDER BY {win_order}) AS __don_rn {from_part}"
    )
    outer_order = (
        " ORDER BY " + ", ".join(f"__don_s{i}{d}" for i, (_e, d) in enumerate(parsed))
        if parsed
        else ""
    )
    return (
        sql[: m.start()]
        + f"SELECT * EXCEPT ({', '.join(except_cols)}) FROM ({inner}) "
        + f"WHERE __don_rn = 1{outer_order}{limit_tail}"
    )


# SELECT ... QUALIFY <pred> — the window-filter clause DuckDB/
# Snowflake (and sqlparser-rs) accept; Spark has no QUALIFY, so the
# predicate becomes a projected boolean in a subquery:
#   SELECT sl FROM rest QUALIFY pred [ORDER BY ...] [LIMIT n]
# →
#   SELECT * EXCEPT (__qualify) FROM
#     (SELECT sl, (pred) AS __qualify FROM rest)
#   WHERE __qualify [ORDER BY ...] [LIMIT n]
# The predicate evaluates in the same projection as the select list
# (post-GROUP BY/HAVING — QUALIFY's evaluation point), so window
# functions and select aliases resolve exactly as the source dialect
# defines. Bails (leaving Spark to raise on the original) for
# depth-0 set operations and SELECT DISTINCT, where the wrap would
# change semantics. Limitation of a textual rewriter: an outer
# ORDER BY referencing a raw column absent from the select list
# won't resolve after the wrap.
_QUALIFY_RE = re.compile(r"\bQUALIFY\b", re.IGNORECASE)


def _rewrite_qualify(sql: str) -> str:
    qm = _depth0_search(_QUALIFY_RE, sql)
    if not qm:
        return sql
    # `* EXCEPT (cols)` (Spark's wildcard option, the EXCLUDE rewrite
    # target) is NOT a set operation — blank it before scanning, so
    # only real UNION/INTERSECT/EXCEPT operands (followed by SELECT or
    # a parenthesized query) trigger the bail
    scan = re.sub(
        r"\*\s+EXCEPT\s*\([^)]*\)",
        lambda m: " " * len(m.group(0)),
        sql,
        flags=re.IGNORECASE,
    )
    if _depth0_search(
        re.compile(
            r"\b(UNION|INTERSECT|EXCEPT)\s+(ALL\s+|DISTINCT\s+)?(SELECT\b|\()",
            re.IGNORECASE,
        ),
        scan,
    ):
        return sql
    sm = _depth0_search(re.compile(r"\bSELECT\b", re.IGNORECASE), sql)
    if not sm or sm.start() > qm.start():
        return sql
    if _depth0_search(
        re.compile(r"\bSELECT\s+DISTINCT\b", re.IGNORECASE), sql
    ):
        return sql
    fm = _depth0_search(re.compile(r"\bFROM\b", re.IGNORECASE), sql, sm.end())
    if not fm or fm.start() > qm.start():
        return sql
    select_list = sql[sm.end() : fm.start()].strip()
    from_part = sql[fm.start() : qm.start()].rstrip()
    tail = sql[qm.end() :]
    tm = _depth0_search(
        re.compile(r"\b(ORDER\s+BY|LIMIT|OFFSET)\b", re.IGNORECASE), tail
    )
    pred = tail[: tm.start() if tm else len(tail)].strip()
    outer_tail = " " + tail[tm.start() :].strip() if tm else ""
    if not pred:
        return sql
    return (
        sql[: sm.start()]
        + f"SELECT * EXCEPT (__qualify) FROM (SELECT {select_list}, "
        + f"({pred}) AS __qualify {from_part}) WHERE __qualify"
        + outer_tail
    )


def _enclosing_paren_span(sql: str, pos: int) -> tuple[int, int] | None:
    """Innermost ``( ... )`` span strictly containing ``pos`` — the
    indices of the open and close parens — or None at depth 0."""
    stack: list[int] = []
    for i, c in enumerate(sql):
        if c == "(":
            stack.append(i)
        elif c == ")" and stack:
            a = stack.pop()
            if a < pos < i:
                return (a, i)
    return None


def _rewrite_qualify_anywhere(sql: str) -> str:
    """Apply the QUALIFY rewrite at any nesting depth, innermost
    first — the common DuckDB/Snowflake idiom puts QUALIFY inside a
    CTE body (``WITH x AS (... QUALIFY ...)``) or a derived table,
    which the depth-0 rewriter alone never sees. Each pass rewrites
    the innermost parenthesized query around one QUALIFY; a bail
    (set-op/DISTINCT scope guards) leaves the text for Spark to raise
    on. Literals are pre-masked by the caller, so the keyword scan
    cannot fire inside a string."""
    sql = _rewrite_qualify(sql)
    for _ in range(16):
        m = _QUALIFY_RE.search(sql)
        if not m:
            return sql
        span = _enclosing_paren_span(sql, m.start())
        if span is None:
            return sql  # depth-0 QUALIFY the scope guards bailed on
        a, b = span
        inner = sql[a + 1 : b]
        new_inner = _rewrite_qualify(inner)
        if new_inner == inner:
            return sql
        sql = sql[: a + 1] + new_inner + sql[b:]
    return sql


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

    # DataFusion DDL: CREATE EXTERNAL TABLE → CREATE TABLE ... USING.
    # Statement-level; if it matched, the result is already Spark SQL.
    rewritten = _rewrite_create_external_table(out, lits)
    if rewritten is not out:
        return _restore_literals(rewritten, lits)

    # SELECT * EXCLUDE (...) → * EXCEPT (...)
    out = _rewrite_exclude(out)

    # SELECT DISTINCT ON (keys) → row_number-over-partition shape
    out = _rewrite_distinct_on(out)

    # QUALIFY window filter → projected-boolean subquery (any depth:
    # CTE bodies and derived tables included)
    out = _rewrite_qualify_anywhere(out)

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

    # chrono-format to_char/to_date/to_timestamp → java.time patterns
    out = _rewrite_chrono_datetime(out, lits)

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
