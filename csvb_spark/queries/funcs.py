"""Scalar/aggregate function gauntlets — SURVEY.md §2.B.4/§2.B.8/§2.B.9.

Each query exercises a function family the reference inherits from
datafusion-functions 44. Where the Spark and DuckDB dialects agree,
one SQL text serves both; where they diverge (split/regexp/date
helpers), the two sides are written separately with IDENTICAL output
aliases and rounding so the driver's hash compare is stable.
"""

from __future__ import annotations

from csvb_spark.queries.common import Query, davg, dialect_query, dsum, sql_query

QUERIES: dict[str, Query] = {}


def _q(name: str, **kw) -> None:
    QUERIES[name] = Query(**kw)


# --- string functions (part 1 + part 2 merged into one graded entry) ---
# The first 21 columns are dialect-shared; the rest (instr/strpos,
# chr, find_in_set, substring_index, overlay, octet/bit_length,
# initcap) diverge between Spark and DuckDB, so the two sides are
# written separately with IDENTICAL aliases (merged former
# q47_string_functions_2).
_SHARED_STRINGS = """
       length(p_name) AS name_len,
       upper(p_brand) AS brand_up,
       lower(p_type) AS type_lo,
       substr(p_name, 1, 8) AS name_pre,
       replace(p_type, ' ', '_') AS type_us,
       reverse(p_brand) AS brand_rev,
       lpad(CAST(p_size AS STRING), 4, '0') AS size_pad,
       rpad(p_brand, 12, '.') AS brand_rpad,
       concat_ws('|', p_brand, p_type) AS brand_type,
       levenshtein(p_brand, 'Brand#11') AS lev,
       split_part(p_name, ' ', 1) AS first_word,
       ascii(p_brand) AS first_ascii,
       repeat(left(p_brand, 2), 2) AS rep2,
       right(p_name, 3) AS name_suf,
       trim('  x  ') AS trimmed,
       ltrim('  x') AS ltrimmed,
       rtrim('x  ') AS rtrimmed,
       position('#' IN p_brand) AS hash_pos,
       translate(p_brand, '#', '-') AS brand_dash,
       md5(p_name) AS name_md5,
"""
_SPARK_STRINGS = f"""
SELECT p_partkey,
{_SHARED_STRINGS}
       initcap(p_type) AS type_title,
       overlay(p_brand PLACING 'XX' FROM 2 FOR 2) AS brand_ov,
       instr(p_name, 'a') AS a_pos,
       substring_index(p_type, ' ', 2) AS type_first2,
       chr(65 + CAST(p_partkey % 26 AS INT)) AS letter,
       octet_length(p_name) AS name_octets,
       bit_length(p_brand) AS brand_bits,
       contains(p_name, 'an') AS has_an,
       startswith(p_type, 'STANDARD') AS is_std,
       endswith(p_brand, '5') AS ends_5,
       find_in_set(p_brand, 'Brand#11,Brand#23,Brand#35') AS brand_slot,
       char_length(p_name) AS name_chars,
       concat(p_brand, ':', CAST(p_size AS STRING)) AS brand_size
FROM part
WHERE p_partkey < 120
"""
_DUCK_STRINGS = f"""
SELECT p_partkey,
{_SHARED_STRINGS}
       -- no initcap in DuckDB: capitalize each lower-cased word
       array_to_string(list_transform(string_split(lower(p_type), ' '),
                       x -> concat(upper(x[1:1]), x[2:])), ' ') AS type_title,
       concat(substr(p_brand, 1, 1), 'XX', substr(p_brand, 4)) AS brand_ov,
       CAST(strpos(p_name, 'a') AS INT) AS a_pos,
       CASE WHEN len(string_split(p_type, ' ')) <= 2 THEN p_type
            ELSE array_to_string(string_split(p_type, ' ')[1:2], ' ') END AS type_first2,
       chr(65 + CAST(p_partkey % 26 AS INT)) AS letter,
       CAST(octet_length(ENCODE(p_name)) AS INT) AS name_octets,
       CAST(octet_length(ENCODE(p_brand)) * 8 AS INT) AS brand_bits,
       contains(p_name, 'an') AS has_an,
       starts_with(p_type, 'STANDARD') AS is_std,
       ends_with(p_brand, '5') AS ends_5,
       CAST(coalesce(list_position(string_split('Brand#11,Brand#23,Brand#35', ','), p_brand), 0) AS INT) AS brand_slot,
       CAST(length(p_name) AS INT) AS name_chars,
       concat(p_brand, ':', CAST(p_size AS STRING)) AS brand_size
FROM part
WHERE p_partkey < 120
"""
_q("q30_string_functions", spark=sql_query(_SPARK_STRINGS), oracle=_DUCK_STRINGS)

# --- math functions ----------------------------------------------------
_SQL_MATH = """
SELECT l_orderkey, l_linenumber,
       ROUND(ABS(0.0 - l_extendedprice), 2) AS abs_price,
       CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
       CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_pct,
       ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
       ROUND(CBRT(l_extendedprice), 6) AS cbrt_price,
       ROUND(POWER(l_quantity, 2), 1) AS qty_sq,
       ROUND(EXP(l_discount), 8) AS exp_disc,
       ROUND(LN(l_extendedprice + 1), 8) AS ln_price,
       ROUND(LOG10(l_extendedprice + 1), 8) AS log10_price,
       ROUND(LOG2(l_quantity + 1), 8) AS log2_qty,
       ROUND(SIN(l_quantity), 8) AS sin_qty,
       ROUND(COS(l_quantity), 8) AS cos_qty,
       ROUND(ATAN2(l_quantity, 3.0), 8) AS atan2_qty,
       ROUND(DEGREES(l_discount), 8) AS deg_disc,
       ROUND(RADIANS(l_quantity), 8) AS rad_qty,
       CAST(SIGN(l_extendedprice - 30000) AS INT) AS price_sign,
       MOD(CAST(l_quantity AS BIGINT), 7) AS qty_mod,
       ROUND(GREATEST(l_quantity, l_discount * 100), 6) AS g_val,
       ROUND(LEAST(l_quantity, l_discount * 100), 6) AS l_val,
       ROUND(PI(), 10) AS pi_val,
       ISNAN(l_discount) AS disc_nan
FROM lineitem
WHERE l_orderkey < 120
"""
_q("q31_math_functions", spark=sql_query(_SQL_MATH), oracle=_SQL_MATH)

# --- date/time functions (dialects diverge → two texts) -----------------
_SPARK_DATETIME = """
SELECT event_id,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       date_trunc('hour', ts) AS hour_ts,
       CAST(EXTRACT(YEAR FROM ts) AS BIGINT) AS y,
       CAST(EXTRACT(MONTH FROM ts) AS BIGINT) AS m,
       CAST(EXTRACT(DAY FROM ts) AS BIGINT) AS d,
       CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS h,
       CAST(EXTRACT(MINUTE FROM ts) AS BIGINT) AS mi,
       CAST(QUARTER(ts) AS BIGINT) AS q,
       CAST(weekday(ts) + 1 AS BIGINT) AS isodow,
       CAST(ts + INTERVAL '1 day' AS DATE) AS next_day,
       CAST(date_trunc('week', ts) AS DATE) AS week_start,
       make_date(2024, 1, 15) AS fixed_date,
       last_day(CAST(ts AS DATE)) AS month_end,
       datediff(CAST(ts AS DATE), DATE '2024-01-01') AS days_since,
       unix_millis(CAST(ts AS TIMESTAMP)) AS epoch_ms_val,
       date_format(ts, 'yyyy-MM-dd HH') AS fmt
FROM events
WHERE event_id < 300
"""
_DUCK_DATETIME = """
SELECT event_id,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       date_trunc('hour', ts) AS hour_ts,
       CAST(EXTRACT(YEAR FROM ts) AS BIGINT) AS y,
       CAST(EXTRACT(MONTH FROM ts) AS BIGINT) AS m,
       CAST(EXTRACT(DAY FROM ts) AS BIGINT) AS d,
       CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS h,
       CAST(EXTRACT(MINUTE FROM ts) AS BIGINT) AS mi,
       CAST(EXTRACT(QUARTER FROM ts) AS BIGINT) AS q,
       CAST(EXTRACT(ISODOW FROM ts) AS BIGINT) AS isodow,
       CAST(ts + INTERVAL '1 day' AS DATE) AS next_day,
       CAST(date_trunc('week', ts) AS DATE) AS week_start,
       make_date(2024, 1, 15) AS fixed_date,
       last_day(CAST(ts AS DATE)) AS month_end,
       date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
       epoch_ms(ts) AS epoch_ms_val,
       strftime(ts, '%Y-%m-%d %H') AS fmt
FROM events
WHERE event_id < 300
"""
_q("q32_datetime_functions", spark=sql_query(_SPARK_DATETIME), oracle=_DUCK_DATETIME)

# --- time-bucket aggregation over events (batch windowing) --------------
_SPARK_TIMEBUCKET = f"""
SELECT date_bin(900, ts, TIMESTAMP '2024-01-01 00:00:00') AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       {dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
"""
_DUCK_TIMEBUCKET = f"""
SELECT time_bucket(INTERVAL '15 minutes', ts, TIMESTAMP '2024-01-01 00:00:00')
         AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       {dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
"""
_q(
    "q33_time_bucket",
    spark=sql_query(_SPARK_TIMEBUCKET),
    oracle=_DUCK_TIMEBUCKET,
    headline=True,
)

# --- q51: combined scalar-function gauntlet (driver-gate row for the
# five function families — string / math / datetime / array /
# conditional — in ONE entry over one table, so the 50-entry graded
# window exercises each family every round; the per-family deep
# gauntlets q30/q31/q32/q34/q36 stay under the pytest oracle gate).
# documents carries no timestamp, so the datetime block derives a
# per-row date via make_date (both dialects) and exercises
# trunc/extract/last_day/interval arithmetic on it. ----------------------
_MD = "make_date(2024, CAST(doc_id % 12 AS INT) + 1, CAST(doc_id % 28 AS INT) + 1)"
_SPARK_SCALAR = f"""
SELECT doc_id,
       length(text) AS t_len,
       upper(lang) AS lang_up,
       substr(text, 1, 12) AS t_pre,
       replace(source, 'a', '_') AS src_us,
       concat_ws('|', lang, source) AS lang_src,
       lpad(CAST(doc_id % 100 AS STRING), 5, '0') AS id_pad,
       reverse(lang) AS lang_rev,
       ROUND(SQRT(n_chars), 6) AS sqrt_chars,
       CAST(CEIL(n_chars / 7.0) AS BIGINT) AS chars_ceil,
       CAST(FLOOR(n_chars / 7.0) AS BIGINT) AS chars_floor,
       ROUND(LN(n_chars + 1), 8) AS ln_chars,
       ROUND(POWER(doc_id % 9, 2), 1) AS id_sq,
       MOD(n_chars, 13) AS chars_mod,
       CAST(SIGN(n_chars - 500) AS INT) AS len_sign,
       GREATEST(n_chars, doc_id) AS g_val,
       {_MD} AS d,
       CAST(EXTRACT(MONTH FROM {_MD}) AS BIGINT) AS d_month,
       CAST(EXTRACT(YEAR FROM {_MD}) AS BIGINT) AS d_year,
       last_day({_MD}) AS d_month_end,
       CAST(date_trunc('month', {_MD}) AS DATE) AS d_trunc,
       CAST({_MD} + INTERVAL '7 day' AS DATE) AS d_plus7,
       size(split(trim(text), '\\\\s+')) AS n_tokens,
       element_at(split(trim(text), '\\\\s+'), 1) AS first_tok,
       array_join(slice(array_sort(array_distinct(split(trim(text), '\\\\s+'))), 1, 3), '-')
         AS first3_sorted,
       COALESCE(NULLIF(lang, 'en'), 'english') AS lang_norm,
       CASE WHEN n_chars > 800 THEN 'long'
            WHEN n_chars > 300 THEN 'mid' ELSE 'short' END AS len_class,
       IF(n_chars % 2 = 0, 'even', 'odd') AS parity,
       TRY_CAST(lang AS INT) AS lang_int
FROM documents
WHERE doc_id < 250
"""
_DUCK_SCALAR = f"""
SELECT doc_id,
       CAST(length(text) AS INT) AS t_len,
       upper(lang) AS lang_up,
       substr(text, 1, 12) AS t_pre,
       replace(source, 'a', '_') AS src_us,
       concat_ws('|', lang, source) AS lang_src,
       lpad(CAST(doc_id % 100 AS VARCHAR), 5, '0') AS id_pad,
       reverse(lang) AS lang_rev,
       ROUND(SQRT(n_chars), 6) AS sqrt_chars,
       CAST(CEIL(n_chars / 7.0) AS BIGINT) AS chars_ceil,
       CAST(FLOOR(n_chars / 7.0) AS BIGINT) AS chars_floor,
       ROUND(LN(n_chars + 1), 8) AS ln_chars,
       ROUND(POWER(doc_id % 9, 2), 1) AS id_sq,
       CAST(MOD(n_chars, 13) AS BIGINT) AS chars_mod,
       CAST(SIGN(n_chars - 500) AS INT) AS len_sign,
       GREATEST(n_chars, doc_id) AS g_val,
       {_MD} AS d,
       CAST(EXTRACT(MONTH FROM {_MD}) AS BIGINT) AS d_month,
       CAST(EXTRACT(YEAR FROM {_MD}) AS BIGINT) AS d_year,
       last_day({_MD}) AS d_month_end,
       CAST(date_trunc('month', {_MD}) AS DATE) AS d_trunc,
       CAST({_MD} + INTERVAL '7 day' AS DATE) AS d_plus7,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       string_split_regex(trim(text), '\\s+')[1] AS first_tok,
       array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\\s+')))[1:3], '-')
         AS first3_sorted,
       COALESCE(NULLIF(lang, 'en'), 'english') AS lang_norm,
       CASE WHEN n_chars > 800 THEN 'long'
            WHEN n_chars > 300 THEN 'mid' ELSE 'short' END AS len_class,
       IF(n_chars % 2 = 0, 'even', 'odd') AS parity,
       TRY_CAST(lang AS INT) AS lang_int
FROM documents
WHERE doc_id < 250
"""
_q("q51_scalar_gauntlet", spark=sql_query(_SPARK_SCALAR), oracle=_DUCK_SCALAR)

# --- chrono-format datetime round-trips (reference dialect) --------------
# The reference's to_char/to_date/to_timestamp take Rust-chrono format
# strings (DataFusion 44 datafusion-functions; reference route
# csvb_engine/src/lib.rs:88 → SessionContext::sql). The Spark side is
# written with the CHRONO patterns and routed through execute_sql so
# the translate-layer chrono→java.time mapping is what the oracle
# verifies; DuckDB's strftime/strptime speak chrono-compatible
# C-strftime natively.
_SPARK_CHRONO = """
SELECT event_id,
       to_char(ts, '%Y/%m/%d %H:%M:%S') AS fmt_full,
       to_char(ts, '%d-%b-%Y') AS fmt_abbrev,
       to_char(ts, '%A, %B %-d, %Y') AS fmt_names,
       to_char(ts, '%I:%M %p') AS fmt_ampm,
       to_char(ts, 'day %j of %Y') AS fmt_doy,
       to_date('15.01.2024', '%d.%m.%Y') AS parsed_fixed,
       to_date(CASE WHEN event_id % 2 = 0
                    THEN to_char(ts, '%Y-%m-%d')
                    ELSE to_char(ts, '%d/%m/%Y') END,
               '%Y-%m-%d', '%d/%m/%Y') AS parsed_multi,
       to_timestamp(to_char(ts, '%Y-%m-%dT%H:%M:%S'),
                    '%Y-%m-%dT%H:%M:%S') AS parsed_ts
FROM events
WHERE event_id < 300
"""
_DUCK_CHRONO = """
SELECT event_id,
       strftime(ts, '%Y/%m/%d %H:%M:%S') AS fmt_full,
       strftime(ts, '%d-%b-%Y') AS fmt_abbrev,
       strftime(ts, '%A, %B %-d, %Y') AS fmt_names,
       strftime(ts, '%I:%M %p') AS fmt_ampm,
       strftime(ts, 'day %j of %Y') AS fmt_doy,
       CAST(strptime('15.01.2024', '%d.%m.%Y') AS DATE) AS parsed_fixed,
       CAST(coalesce(
         try_strptime(CASE WHEN event_id % 2 = 0
                           THEN strftime(ts, '%Y-%m-%d')
                           ELSE strftime(ts, '%d/%m/%Y') END, '%Y-%m-%d'),
         strptime(CASE WHEN event_id % 2 = 0
                       THEN strftime(ts, '%Y-%m-%d')
                       ELSE strftime(ts, '%d/%m/%Y') END, '%d/%m/%Y')
       ) AS DATE) AS parsed_multi,
       strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'),
                '%Y-%m-%dT%H:%M:%S') AS parsed_ts
FROM events
WHERE event_id < 300
"""
_q(
    "x130_chrono_formats",
    spark=dialect_query(_SPARK_CHRONO),
    oracle=_DUCK_CHRONO,
)

# --- array functions (dialects diverge) ----------------------------------
_SPARK_ARRAYS = """
SELECT doc_id,
       size(split(trim(text), '\\\\s+')) AS n_tokens,
       size(array_distinct(split(trim(text), '\\\\s+'))) AS n_uniq,
       element_at(split(trim(text), '\\\\s+'), 1) AS first_tok,
       element_at(split(trim(text), '\\\\s+'), -1) AS last_tok,
       array_min(split(trim(text), '\\\\s+')) AS min_tok,
       array_max(split(trim(text), '\\\\s+')) AS max_tok,
       array_contains(split(trim(text), '\\\\s+'), 'data') AS has_data,
       array_join(slice(array_sort(array_distinct(split(trim(text), '\\\\s+'))), 1, 5), '-')
         AS first5_sorted,
       CAST(array_position(split(trim(text), '\\\\s+'), 'the') AS BIGINT) AS the_pos,
       size(array_intersect(array_distinct(split(trim(text), '\\\\s+')),
                            array('data', 'spark', 'query'))) AS kw_hits,
       aggregate(sequence(1, CAST(n_chars % 10 AS INT) + 1), 0L, (acc, x) -> acc + x)
         AS tri_sum,
       size(sequence(1, CAST(n_chars % 10 AS INT) + 1)) AS seq_len,
       array_join(array_repeat(lang, 2), ',') AS lang2,
       array_join(flatten(array(array(lang), array(source))), ',') AS lang_src
FROM documents
WHERE doc_id < 200
"""
_DUCK_ARRAYS = """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_uniq,
       string_split_regex(trim(text), '\\s+')[1] AS first_tok,
       string_split_regex(trim(text), '\\s+')[-1] AS last_tok,
       list_min(string_split_regex(trim(text), '\\s+')) AS min_tok,
       list_max(string_split_regex(trim(text), '\\s+')) AS max_tok,
       list_contains(string_split_regex(trim(text), '\\s+'), 'data') AS has_data,
       array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\\s+')))[1:5], '-')
         AS first5_sorted,
       CAST(COALESCE(list_position(string_split_regex(trim(text), '\\s+'), 'the'), 0) AS BIGINT)
         AS the_pos,
       len(list_intersect(list_distinct(string_split_regex(trim(text), '\\s+')),
                          ['data', 'spark', 'query'])) AS kw_hits,
       CAST(list_sum(generate_series(1, CAST(n_chars % 10 AS INT) + 1)) AS BIGINT) AS tri_sum,
       len(generate_series(1, CAST(n_chars % 10 AS INT) + 1)) AS seq_len,
       array_to_string([lang, lang], ',') AS lang2,
       array_to_string(flatten([[lang], [source]]), ',') AS lang_src
FROM documents
WHERE doc_id < 200
"""
_q("q34_array_functions", spark=sql_query(_SPARK_ARRAYS), oracle=_DUCK_ARRAYS)

# --- regex functions ------------------------------------------------------
_SPARK_REGEX = """
SELECT doc_id,
       regexp_count(text, 'a') AS n_a,
       regexp_replace(text, '[aeiou]', '_') AS devoweled_pre,
       regexp_extract(text, '([a-z]+)', 1) AS first_word_re,
       text RLIKE '.*data.*' AS mentions_data
FROM documents
WHERE doc_id < 100
"""
_DUCK_REGEX = """
SELECT doc_id,
       len(regexp_extract_all(text, 'a')) AS n_a,
       regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_pre,
       regexp_extract(text, '([a-z]+)', 1) AS first_word_re,
       regexp_matches(text, '.*data.*') AS mentions_data
FROM documents
WHERE doc_id < 100
"""
_q("q35_regex_functions", spark=sql_query(_SPARK_REGEX), oracle=_DUCK_REGEX)

# --- conditional / null handling + CAST/TRY_CAST gauntlet --------------------
# Merged former q48_casts into this entry (SURVEY §2.B.2): the cast
# family (DECIMAL / STRING / SMALLINT→INT / BOOLEAN / typed NULL /
# TRY_CAST failure→NULL) re-targeted at supplier columns. Only NVL2
# diverges (DuckDB lacks it → CASE emulation).
_SHARED_CONDITIONAL = """
       COALESCE(NULLIF(s_name, ''), 'unnamed') AS name_or_default,
       NULLIF(s_nationkey, 0) AS nk_nullable,
       IFNULL(NULLIF(s_nationkey, 0), -1) AS nk_filled,
       GREATEST(s_acctbal, 0.0) AS bal_floor,
       CASE WHEN s_acctbal > 5000 THEN 'rich'
            WHEN s_acctbal > 1000 THEN 'ok'
            ELSE 'thin' END AS bal_band,
       s_acctbal IS NOT NULL AS has_bal,
       TRY_CAST(s_name AS DOUBLE) AS name_as_num,
       CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal_dec,
       CAST(s_suppkey AS STRING) AS key_str,
       CAST(CAST(s_suppkey AS SMALLINT) AS INT) AS key_i16,
       CAST(s_suppkey % 2 = 0 AS BOOLEAN) AS is_even,
       TRY_CAST(right(s_name, 1) AS INT) AS last_digit,
       TRY_CAST(substr(s_name, 1, 3) AS INT) AS name_int_null,
       CAST(NULL AS BIGINT) AS always_null,
"""
_SPARK_CONDITIONAL = f"""
SELECT s_suppkey,
{_SHARED_CONDITIONAL}
       NVL2(NULLIF(s_nationkey, 0), 'has_nation', 'no_nation') AS nk_flag
FROM supplier
"""
_DUCK_CONDITIONAL = f"""
SELECT s_suppkey,
{_SHARED_CONDITIONAL}
       CASE WHEN NULLIF(s_nationkey, 0) IS NOT NULL
            THEN 'has_nation' ELSE 'no_nation' END AS nk_flag
FROM supplier
"""
_q("q36_conditional_null", spark=sql_query(_SPARK_CONDITIONAL), oracle=_DUCK_CONDITIONAL)

# --- aggregate variety + ordered string_agg/listagg + array_agg --------------
# Merged former q38_string_agg / q39_array_agg into this entry: the
# core variety aggs are dialect-shared; ordered listagg (Spark) vs
# string_agg (DuckDB) and sort_array(array_agg) vs list_sort diverge,
# so the sides are written separately with identical aliases. The
# array_agg column is truncated to 5 sorted ids and string-joined —
# the driver harness cannot canonicalize list-typed outputs.
_SHARED_AGG_VARIETY = """
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users,
       MIN(value) AS vmin,
       MAX(value) AS vmax,
       MEDIAN(value) AS vmed,
       MIN_BY(value, event_id) AS first_value_by_id,
       MAX_BY(value, event_id) AS last_value_by_id,
       BOOL_AND(value >= 0) AS all_nonneg,
       BOOL_OR(value > 400) AS any_big,
       BIT_AND(user_id) AS uid_bit_and,
       BIT_OR(user_id) AS uid_bit_or,
       BIT_XOR(user_id) AS uid_bit_xor,
"""
# listagg(DISTINCT) + another DISTINCT agg in one Aggregate trips a
# Spark 4.1 RewriteDistinctAggregates ClassCastException (SortOrder
# rewrite), so the ordered listagg runs in its own aggregation over
# pre-deduped rows and joins back on the (tiny) group key.
_SPARK_AGG_VARIETY = f"""
WITH la AS (
  SELECT event_type,
         listagg(ub, ',') WITHIN GROUP (ORDER BY ub) AS uid_buckets_csv
  FROM (SELECT DISTINCT event_type, CAST(user_id % 10 AS STRING) AS ub FROM events) d
  GROUP BY event_type
), core AS (
  SELECT event_type,
{_SHARED_AGG_VARIETY}
         array_join(slice(sort_array(array_agg(event_id)), 1, 5), ',') AS first5_ids
  FROM events
  GROUP BY event_type
)
SELECT core.*, la.uid_buckets_csv
FROM core JOIN la USING (event_type)
"""
_DUCK_AGG_VARIETY = f"""
SELECT event_type,
{_SHARED_AGG_VARIETY}
       string_agg(DISTINCT CAST(user_id % 10 AS VARCHAR), ','
                  ORDER BY CAST(user_id % 10 AS VARCHAR)) AS uid_buckets_csv,
       array_to_string(list_sort(array_agg(event_id))[1:5], ',') AS first5_ids
FROM events
GROUP BY event_type
"""
_q("q37_agg_variety", spark=sql_query(_SPARK_AGG_VARIETY), oracle=_DUCK_AGG_VARIETY)

# --- statistical aggregates ---------------------------------------------------------
# Exact decimal sums → identical IEEE arithmetic on both sides (see
# common.py). Native stddev/corr etc. are order-dependent in their
# internal double sums, so the oracle-checked columns are built from
# exact sums; native forms are covered by q41 (rows-only).
_SQL_STATS = f"""
SELECT c_nationkey,
       COUNT(*) AS n,
       {dsum('c_acctbal')} AS sum_bal,
       {davg('c_acctbal')} AS avg_bal,
       ROUND(
         SQRT(
           (CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
            - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1)
         ), 4) AS stddev_bal,
       ROUND(
         (CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_custkey AS DECIMAL(12,0))) AS DOUBLE)
          - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
            * CAST(SUM(CAST(c_custkey AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
         / (COUNT(*) - 1), 2) AS covar_bal_key
FROM customer
GROUP BY c_nationkey
HAVING COUNT(*) > 1
"""
_q("q40_stats_exact", spark=sql_query(_SQL_STATS), oracle=_SQL_STATS)

# --- native stats + approx sketches (rows-only: engine-specific internals) -----------
_SQL_STATS_NATIVE = """
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
       ROUND(VAR_POP(l_discount), 8) AS var_disc,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
       CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
       APPROX_COUNT_DISTINCT(l_partkey) AS approx_parts,
       ROUND(PERCENTILE_APPROX(l_extendedprice, 0.5), 0) AS approx_med_price
FROM lineitem
GROUP BY l_returnflag
"""
# Rows-only (engine-specific sketch/accumulation internals → no
# cross-engine hash), so it carries the x prefix and sorts after the
# driver's oracle-graded window.
_q("x41_stats_native", spark=sql_query(_SQL_STATS_NATIVE), oracle=None)

# --- corpus health report: one ROLLUP pass over the documents table ----------
# The monitoring capstone of the pipeline ops: per-source + TOTAL row
# counts, exact-dup rate (via md5 content digests), size stats. One
# shared SQL text — every expression is pinned engine-portable
# (SUM cast to BIGINT against DuckDB's HUGEINT promotion, MEDIAN over
# DOUBLE so both engines interpolate in double, GROUPING() so a NULL
# source group can never masquerade as the grand-total row, and the
# NULL-source sentinel is '<null>' — not 'NULL', which a real source
# literally named "NULL" would collide with).
_SQL_CORPUS_REPORT = """
SELECT CASE WHEN GROUPING(source) = 1 THEN 'TOTAL'
            ELSE COALESCE(source, '<null>') END AS src,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS distinct_contents,
       COUNT(*) - COUNT(DISTINCT md5(text)) AS dup_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       MEDIAN(CAST(n_chars AS DOUBLE)) AS median_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY ROLLUP(source)
"""
_q(
    "x44_corpus_report",
    spark=sql_query(_SQL_CORPUS_REPORT),
    oracle=_SQL_CORPUS_REPORT,
)

# --- JSON functions (bonus surface: absent from the reference's
# DataFusion 44 core — SURVEY.md §2.B "JSON ✗"; Spark ships them
# natively and the events.props fixture column IS JSON, so the
# gauntlet runs on real data). x-named: the driver's 50-entry oracle
# window is full; the DuckDB differential runs in tests/test_oracle.py.
_SPARK_JSON = """
SELECT event_id,
       CAST(get_json_object(props, '$.k') AS INT) AS k,
       from_json(props, 'k INT').k AS k2,
       to_json(named_struct('id', event_id, 'et', event_type)) AS j,
       CAST(get_json_object(to_json(named_struct('id', event_id, 'et', event_type)),
                            '$.id') AS BIGINT) AS id_rt,
       json_array_length(to_json(array(event_id, user_id))) AS jal
FROM events
"""
_DUCK_JSON = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k,
       CAST(json_extract_string(props, '$.k') AS INT) AS k2,
       to_json(struct_pack(id := event_id, et := event_type)) AS j,
       CAST(json_extract_string(to_json(struct_pack(id := event_id, et := event_type)),
                                '$.id') AS BIGINT) AS id_rt,
       json_array_length(to_json([event_id, user_id])) AS jal
FROM events
"""
_q("x25_json_functions", spark=sql_query(_SPARK_JSON), oracle=_DUCK_JSON)

# --- construction gauntlet: struct/map + generate_series + crypto/encode --------
# Merged former q42_struct_map / q43_generate_series / q44_crypto_encode
# into one driver-graded entry. Branch outputs harmonized to
# (src, id, d1, s1..s4); doubles stay numeric (double→string rendering
# differs between engines), arrays are string-joined (driver harness
# cannot canonicalize lists).
_SPARK_CONSTRUCT = """
SELECT 'struct' AS src,
       CAST(named_struct('key', s_suppkey, 'bal', s_acctbal).key AS BIGINT) AS id,
       named_struct('key', s_suppkey, 'bal', s_acctbal).bal AS d1,
       map('suppkey', CAST(s_suppkey AS STRING), 'name', s_name)['name'] AS s1,
       array_join(map_keys(map('a', 1, 'b', 2)), ',') AS s2,
       '' AS s3, '' AS s4
FROM supplier
WHERE s_suppkey < 8
UNION ALL
SELECT 'series' AS src, CAST(t.n AS BIGINT) AS id, CAST(t.n * t.n AS DOUBLE) AS d1,
       '' AS s1, '' AS s2, '' AS s3, '' AS s4
FROM (SELECT explode(sequence(1, 50)) AS n) t
WHERE t.n % 3 = 0
UNION ALL
SELECT 'crypto' AS src, CAST(doc_id AS BIGINT) AS id, CAST(0.0 AS DOUBLE) AS d1,
       md5(text) AS s1,
       sha2(text, 256) AS s2,
       base64(encode(substr(text, 1, 12), 'UTF-8')) AS s3,
       lower(hex(encode(substr(text, 1, 6), 'UTF-8'))) AS s4
FROM documents
WHERE doc_id < 50
"""
_DUCK_CONSTRUCT = """
SELECT 'struct' AS src,
       CAST(struct_pack(key := s_suppkey, bal := s_acctbal).key AS BIGINT) AS id,
       struct_pack(key := s_suppkey, bal := s_acctbal).bal AS d1,
       (MAP {'suppkey': CAST(s_suppkey AS STRING), 'name': s_name}['name'])[1] AS s1,
       array_to_string(map_keys(MAP {'a': 1, 'b': 2}), ',') AS s2,
       '' AS s3, '' AS s4
FROM supplier
WHERE s_suppkey < 8
UNION ALL
SELECT 'series' AS src, CAST(t.n AS BIGINT) AS id, CAST(t.n * t.n AS DOUBLE) AS d1,
       '' AS s1, '' AS s2, '' AS s3, '' AS s4
FROM (SELECT unnest(generate_series(1, 50)) AS n) t
WHERE t.n % 3 = 0
UNION ALL
SELECT 'crypto' AS src, CAST(doc_id AS BIGINT) AS id, CAST(0.0 AS DOUBLE) AS d1,
       md5(text) AS s1,
       sha256(text) AS s2,
       to_base64(ENCODE(substr(text, 1, 12))) AS s3,
       lower(hex(ENCODE(substr(text, 1, 6)))) AS s4
FROM documents
WHERE doc_id < 50
"""
_q("q42_construction_gauntlet", spark=sql_query(_SPARK_CONSTRUCT), oracle=_DUCK_CONSTRUCT)

# --- q46: UNNEST / lateral explode → vocabulary top-k ------------------------------
# DataFusion exposes UNNEST(array) (SURVEY §2.B.2 ⚠ → explode). The
# classic map-reduce shape: tokenize (map), explode (generator),
# count by token (partial agg → shuffle on token), top-k
# (TakeOrderedAndProject — no global sort).
_SPARK_VOCAB = r"""
SELECT tok, COUNT(*) AS n
FROM (SELECT explode(split(trim(text), '\\s+')) AS tok FROM documents)
WHERE tok <> ''
GROUP BY tok
ORDER BY n DESC, tok ASC
LIMIT 50
"""
_DUCK_VOCAB = r"""
SELECT tok, COUNT(*) AS n
FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
WHERE tok <> ''
GROUP BY tok
ORDER BY n DESC, tok ASC
LIMIT 50
"""
_q(
    "q46_unnest_vocab_topk",
    spark=sql_query(_SPARK_VOCAB),
    oracle=_DUCK_VOCAB,
    headline=True,
)

# --- q50: DataFusion-dialect gauntlet through the translate layer ------------------
# Written in the REFERENCE's dialect (generate_series as a table
# factor, interval-literal date_bin, DataFusion array editors) and run
# via execute_sql, so the rewrites in functions/translate.py are what
# the oracle actually verifies. DuckDB lacks some of the editors, so
# the oracle emulates them (list_transform / hard-coded literals on
# the fixed inputs).
_DF_GAUNTLET = """
SELECT g.value AS n,
       array_to_string(array_resize(make_array(1, 2, 3), CAST(g.value AS INT), 0), ',') AS resized,
       array_to_string(array_replace(make_array(1, 2, 1, 2), 2, 9), ',') AS rep_first,
       array_to_string(array_replace_all(make_array(1, 2, 1, 2), 2, 9), ',') AS rep_all,
       array_to_string(array_positions(make_array(1, 2, 1, 2), CAST(g.value % 3 AS INT)), ',') AS pos,
       array_ndims(make_array(make_array(1, 2), make_array(3, 4))) AS ndims,
       date_bin(INTERVAL '15 minutes',
                TIMESTAMP '2024-03-05 10:37:21',
                TIMESTAMP '1970-01-01 00:00:00') AS binned,
       cardinality(make_array(1, 2, 3)) AS card
FROM generate_series(1, 6) AS g
"""
_DUCK_GAUNTLET = """
SELECT CAST(g.value AS INT) AS n,
       array_to_string(list_transform(generate_series(1, CAST(g.value AS INT)),
                      i -> CASE WHEN i <= 3 THEN ([1, 2, 3])[i] ELSE 0 END), ',') AS resized,
       '1,9,1,2' AS rep_first,
       '1,9,1,9' AS rep_all,
       -- DuckDB array_to_string of an EMPTY list yields NULL (Spark
       -- array_join yields '') — coalesce aligns the engines
       COALESCE(array_to_string(list_transform(list_filter(generate_series(1, 4),
                                  i -> ([1, 2, 1, 2])[i] = g.value % 3),
                      i -> CAST(i AS BIGINT)), ','), '') AS pos,
       CAST(2 AS INT) AS ndims,
       TIMESTAMP '2024-03-05 10:30:00' AS binned,
       CAST(3 AS INT) AS card
FROM (SELECT unnest(generate_series(1, 6)) AS value) g
"""
_q(
    "q50_dialect_gauntlet",
    spark=dialect_query(_DF_GAUNTLET),
    oracle=_DUCK_GAUNTLET,
)
