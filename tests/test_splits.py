"""Dataset-assembly operators: DuckDB oracle for the contamination
check, determinism/stability properties for split assignment."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_contamination_matches_duckdb(spark, sf_dir):
    """Exact char-8-gram overlap counts between a train and an eval
    partition match DuckDB's all-pairs formulation on a fixed subset
    (the doc-frequency guard is inactive on a subset this small, so
    the banded plan must equal the exact answer)."""
    from csvb_spark.operators.splits import contamination_check
    from tests.oracle_compare import compare, duck_connection

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 60)
    spark_df = contamination_check(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
        k=8,
        min_shared=2,
    )
    oracle = """
WITH sh AS (
  SELECT doc_id,
         list_distinct([substr(lower(text), g, 8)
                        FOR g IN generate_series(1, greatest(length(text) - 7, 1))]) AS s
  FROM documents WHERE doc_id < 60
)
SELECT t.doc_id AS train_doc_id, e.doc_id AS eval_doc_id,
       CAST(len(list_intersect(t.s, e.s)) AS BIGINT) AS n_shared_grams
FROM sh t JOIN sh e
  ON t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
WHERE len(list_intersect(t.s, e.s)) >= 2
"""
    problems = compare(spark_df, duck_connection(sf_dir), oracle)
    assert not problems, "; ".join(problems)


def test_assign_splits_properties(spark, sf_dir):
    from csvb_spark.operators.splits import assign_splits

    d = _docs(spark, sf_dir).select("doc_id")
    full = {r.doc_id: r.split for r in assign_splits(d).collect()}
    again = {r.doc_id: r.split for r in assign_splits(d).collect()}
    assert full == again  # deterministic across runs
    assert set(full.values()) <= {"train", "valid", "test"}
    n = len(full)
    train_frac = sum(1 for v in full.values() if v == "train") / n
    assert 0.85 <= train_frac <= 0.95  # ~0.9 by construction
    # append-stable: a subset's assignments agree with the full run
    sub = {
        r.doc_id: r.split
        for r in assign_splits(d.filter(F.col("doc_id") % 3 == 0)).collect()
    }
    assert all(full[k] == v for k, v in sub.items())
    # every row gets exactly one split (no gaps at bucket edges)
    assert None not in full.values()


def test_assign_splits_custom_weights(spark, sf_dir):
    from csvb_spark.operators.splits import assign_splits

    d = _docs(spark, sf_dir).select("doc_id")
    out = assign_splits(d, weights={"a": 1.0, "b": 1.0}, seed=7)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"a", "b"}
    total = sum(counts.values())
    assert abs(counts["a"] / total - 0.5) < 0.05


def test_contamination_word13_planted_semantics(spark):
    """The word-unit rule (round 14, x141): one shared FULL 13-word
    window flags the pair; 12 shared words do NOT — a truncated tail
    shingle must never manufacture a '13-gram'. Also pins the
    short-document edge: an eval doc with fewer than 13 words yields
    no grams, so it can never match, even embedded verbatim."""
    from csvb_spark.operators.splits import (
        contamination_check,
        contamination_check_bloom,
    )

    window13 = " ".join(f"w{i}" for i in range(13))
    window12 = " ".join(f"v{i}" for i in range(12))
    short_eval = "tiny eval doc of ten words only right here now"  # 9-10 words
    train = spark.createDataFrame(
        [
            (1, f"prefix junk {window13} suffix junk"),  # full window → hit
            (2, f"prefix {window12} and then different"),  # 12 words → no hit
            (3, f"{short_eval} padded out with many extra filler words"),
            # edge-whitespace trap (round-14 self-review finding):
            # trim() strips only spaces and split(\s+) keeps edge
            # empties, so without the empty-token filter this 12-word
            # doc + trailing newline minted a phantom '13-gram'
            # ending in a space
            (4, f"{window12}\n"),
        ],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [
            (10, f"intro words {window13} outro words"),
            (11, f"other intro {window12} other outro"),
            (12, short_eval),
            (13, f"\t{window12}"),  # leading tab — same trap, eval side
        ],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r.train_doc_id, r.eval_doc_id)
        for r in contamination_check(
            train, ev, k=13, min_shared=1, unit="word"
        ).collect()
    )
    assert got == [(1, 10)], got
    # the bloom scale path must agree at the word unit too
    got_b = sorted(
        (r.train_doc_id, r.eval_doc_id)
        for r in contamination_check_bloom(
            train, ev, k=13, min_shared=1, unit="word"
        ).collect()
    )
    assert got_b == [(1, 10)], got_b


def test_word_grams_full_edges(spark):
    """word_grams_full: full windows only, lowercased, distinct; <k
    words → empty array; NULL → empty array (a NULL text cannot
    match anything)."""
    from csvb_spark.operators.text import word_grams_full

    df = spark.createDataFrame(
        [
            (1, "A b c d"),  # k=3 → 'a b c', 'b c d'
            (2, "a b"),  # <k → []
            (3, None),  # NULL → []
            (4, "x x x x"),  # distinct → one gram
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: sorted(r.g)
        for r in df.select(
            "doc_id", word_grams_full("text", 3).alias("g")
        ).collect()
    }
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == []
    assert rows[3] == []
    assert rows[4] == ["x x x"]
    # edge whitespace never mints extra tokens (\n/\t survive trim())
    edge = spark.createDataFrame(
        [(5, "a b\n"), (6, "\ta b"), (7, " a  b\r\n ")],
        "doc_id bigint, text string",
    )
    erows = {
        r.doc_id: sorted(r.g)
        for r in edge.select(
            "doc_id", word_grams_full("text", 2).alias("g")
        ).collect()
    }
    assert erows == {5: ["a b"], 6: ["a b"], 7: ["a b"]}
    # k < 1 fails loudly (k=0 would silently degenerate to unigrams)
    import pytest as _pytest

    for bad_k in (0, -1):
        with _pytest.raises(ValueError, match="k must be >= 1"):
            word_grams_full("text", bad_k)


def test_contamination_plan_has_no_cross_join(spark, sf_dir):
    from csvb_spark.operators.splits import contamination_check
    from tests.test_plans import _plan

    d = _docs(spark, sf_dir)
    plan = _plan(
        contamination_check(
            d.filter(F.col("doc_id") % 10 != 0), d.filter(F.col("doc_id") % 10 == 0)
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_global_index_is_contiguous_and_ordered(spark, sf_dir):
    """global_idx is exactly 1..N, and ascending idx follows ascending
    (md5_key, doc_id) — i.e. the two-pass bucket plan reproduces the
    single-window total order without a global sort."""
    from csvb_spark.operators.splits import global_index, md5_key

    out = global_index(_docs(spark, sf_dir))
    rows = (
        out.withColumn("k", md5_key("doc_id"))
        .select("global_idx", "k", "doc_id")
        .collect()
    )
    n = len(rows)
    assert sorted(r.global_idx for r in rows) == list(range(1, n + 1))
    by_idx = sorted(rows, key=lambda r: r.global_idx)
    assert by_idx == sorted(rows, key=lambda r: (r.k, r.doc_id))


def test_export_corpus_roundtrip(spark, sf_dir, tmp_path):
    """export_corpus writes hive-partitioned shards whose per-shard
    counts equal the manifest, rows sort by md5 key within each file,
    and no row is lost or duplicated."""
    from csvb_spark.operators.splits import export_corpus, md5_key

    d = _docs(spark, sf_dir)
    out = str(tmp_path / "corpus")
    manifest = export_corpus(d, out, n_shards=8, max_records_per_file=100)
    m = {r.shard: r.n_docs for r in manifest.collect()}

    back = spark.read.parquet(out)
    assert back.count() == d.count()
    got = {
        r.shard: r.n
        for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert got == m
    # in-file order: per input file, md5 keys must be non-decreasing
    files = back.withColumn("f", F.input_file_name()).withColumn(
        "k", md5_key("doc_id")
    )
    import itertools

    for _, grp in itertools.groupby(
        sorted(files.select("f", "k").collect(), key=lambda r: r.f),
        key=lambda r: r.f,
    ):
        ks = [r.k for r in grp]
        assert ks == sorted(ks)


def test_export_corpus_jsonl_duckdb_audit(spark, sf_dir, tmp_path):
    """fmt='jsonl' writes newline-delimited JSON with the same
    deterministic shard layout; DuckDB (a different engine entirely)
    reads it back and agrees on count, ids, and per-shard membership —
    the cross-engine audit the format exists for."""
    import duckdb

    from csvb_spark.operators.splits import export_corpus

    d = _docs(spark, sf_dir).select("doc_id", "text", "lang", "source")
    out = str(tmp_path / "corpus_jsonl")
    manifest = export_corpus(d, out, n_shards=4, fmt="jsonl")
    m = {r.shard: r.n_docs for r in manifest.collect()}

    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(regexp_extract(filename, 'shard=(\\d+)', 1) AS INT) AS shard,"
        "       COUNT(*) AS n, COUNT(DISTINCT doc_id) AS nd "
        f"FROM read_json_auto('{out}/shard=*/*.json', filename=true) "
        "GROUP BY 1"
    ).fetchall()
    got = {r[0]: r[1] for r in rows}
    assert got == m
    assert all(r[1] == r[2] for r in rows)  # no dup or lost ids
    total = con.execute(
        f"SELECT COUNT(*) FROM read_json_auto('{out}/shard=*/*.json')"
    ).fetchone()[0]
    assert total == d.count()
    con.close()


def test_export_corpus_rejects_unknown_format(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from csvb_spark.operators.splits import export_corpus

    with _pytest.raises(ValueError, match="unsupported export format"):
        export_corpus(_docs(spark, sf_dir), str(tmp_path / "x"), fmt="orc2")


def test_temperature_mixture_flattens_head(spark):
    """alpha<1 boosts tail sources: the keep rate of the smallest
    source must exceed the largest source's, and alpha=1 makes all
    rates equal (plain proportional sampling)."""
    from pyspark.sql import Row

    from csvb_spark.operators.splits import temperature_mixture

    rows = [Row(doc_id=i, source="big" if i < 400 else "small") for i in range(500)]
    docs = spark.createDataFrame(rows)
    out = temperature_mixture(docs, alpha=0.5, target_frac=0.5)
    rates = {
        r["source"]: r["keep_rate"]
        for r in out.select("source", "keep_rate").distinct().collect()
    }
    assert rates["small"] > rates["big"]

    flat = temperature_mixture(docs, alpha=1.0, target_frac=0.5)
    frates = {
        r["source"]: r["keep_rate"]
        for r in flat.select("source", "keep_rate").distinct().collect()
    }
    assert len(set(frates.values())) == 1


def test_temperature_mixture_rate_caps_at_one(spark):
    """A tiny tail source whose boosted rate exceeds 1 is kept whole."""
    from pyspark.sql import Row

    from csvb_spark.operators.splits import temperature_mixture

    rows = [Row(doc_id=i, source="big") for i in range(499)] + [
        Row(doc_id=999, source="rare")
    ]
    docs = spark.createDataFrame(rows)
    out = temperature_mixture(docs, alpha=0.1, target_frac=0.9)
    rare = out.filter("source = 'rare'").collect()
    assert len(rare) == 1 and rare[0]["keep_rate"] == 1.0


def test_budget_select_no_global_sort_and_exact(spark):
    import pytest

    from csvb_spark.operators.splits import budget_select

    rows = [(i, round(0.1 * (i % 10), 2), 10 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, quality_score double, n_tokens int")
    out = budget_select(df, budget=500)
    got = {r["doc_id"]: (r["cum_tokens"], r["keep"]) for r in out.collect()}

    # reference: naive global ordered cumsum in Python
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum = 0
    for doc_id, _s, tok in ordered:
        cum += tok
        assert got[doc_id] == (cum, cum <= 500)

    # plan: the window sort is per range-partition, never global — no
    # single-partition Exchange for ordering the data; the only
    # SinglePartition exchange allowed is the ≤partitions-row offsets
    # table. The range exchange itself ran inside the eager local
    # checkpoint (round-7: materialized so both consumer branches see
    # ONE partition assignment — exchange reuse is no longer
    # load-bearing), so downstream both branches scan the same
    # checkpointed RDD instead of re-executing rangepartitioning.
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(jmode)  # noqa: SLF001
    import re

    singles = len(re.findall(r"Exchange SinglePartition", plan))
    assert singles <= 1
    assert "rangepartitioning" not in plan  # pre-materialized, not re-run
    assert "Scan ExistingRDD" in plan  # both branches read the checkpoint

    with pytest.raises(ValueError, match="budget"):
        budget_select(df, budget=-1)


def test_budget_select_constant_scores_stay_parallel_and_exact(spark):
    from pyspark.sql import functions as F

    from csvb_spark.operators.splits import budget_select

    # the round-5 degenerate case: EVERY score identical — the
    # quantized-score design collapsed this into one window partition
    rows = [(i, 0.5, 10 + i % 7) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, quality_score double, n_tokens int")
    out = budget_select(df, budget=5000, partitions=8)
    got = {r["doc_id"]: (r["cum_tokens"], r["keep"]) for r in out.collect()}
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum = 0
    for doc_id, _s, tok in ordered:
        cum += tok
        assert got[doc_id] == (cum, cum <= 5000)

    # the range partitioner splits ties by id: the constant-score frame
    # actually spreads across the pinned partition count
    spread = (
        df.repartitionByRange(8, F.desc("quality_score"), F.asc("doc_id"))
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert len(spread) == 8
    assert max(r["count"] for r in spread) <= 2 * (2000 // 8)


def test_budget_select_null_score_raises(spark):
    import pytest

    from csvb_spark.operators.splits import budget_select

    df = spark.createDataFrame(
        [(1, 0.5, 10), (2, None, 10)],
        "doc_id bigint, quality_score double, n_tokens int",
    )
    with pytest.raises(Exception, match="NULL in score_col"):
        budget_select(df, budget=100).collect()
    df2 = spark.createDataFrame(
        [(1, 0.5, None)], "doc_id bigint, quality_score double, n_tokens int"
    )
    with pytest.raises(Exception, match="NULL in tokens_col"):
        budget_select(df2, budget=100).collect()


def test_budget_select_adversarial_differentials(spark):
    """Crafted shapes vs the naive Python global cumsum: heavy exact
    ties, negative and unbounded scores (the round-5 design required
    [0,1]), non-contiguous ids, zero budget, budget beyond the corpus."""
    from csvb_spark.operators.splits import budget_select

    cases = [
        # (rows, budget)
        ([(i * 7 + 1, 0.25, 5) for i in range(300)], 0),  # zero budget
        ([(i, -3.5 + (i % 3), 10 + i % 4) for i in range(200)], 700),  # negatives
        ([(i * 11, 1e9 if i % 2 else -1e9, 3) for i in range(100)], 90),  # unbounded
        (
            [(i, 0.9 if i < 150 else 0.1, 8) for i in range(300)],  # two tie blocks
            777,
        ),
        ([(5, 0.3, 4)], 4),  # single row, exact fit
        ([(i, 0.5, 10) for i in range(50)], 10**9),  # budget exceeds corpus
    ]
    for rows, budget in cases:
        df = spark.createDataFrame(
            rows, "doc_id bigint, quality_score double, n_tokens int"
        )
        got = {
            r["doc_id"]: (r["cum_tokens"], r["keep"])
            for r in budget_select(df, budget=budget, partitions=7).collect()
        }
        cum = 0
        for doc_id, _s, tok in sorted(rows, key=lambda r: (-r[1], r[0])):
            cum += tok
            assert got[doc_id] == (cum, cum <= budget), (rows[:3], budget, doc_id)


def test_budget_select_exact_with_exchange_reuse_disabled(spark):
    """The ADVICE round-6 scenario: with spark.sql.exchange.reuse off,
    un-materialized branches would each re-run the range exchange with
    freshly sampled boundaries and could disagree on partition ids.
    The eager checkpoint makes the result independent of reuse."""
    from csvb_spark.operators.splits import budget_select

    rows = [(i, round(0.1 * (i % 10), 2), 10 + i % 7) for i in range(500)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, quality_score double, n_tokens int"
    )
    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    try:
        spark.conf.set("spark.sql.exchange.reuse", "false")
        got = {
            r["doc_id"]: (r["cum_tokens"], r["keep"])
            for r in budget_select(df, budget=1500).collect()
        }
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)
    cum = 0
    for doc_id, _s, tok in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += tok
        assert got[doc_id] == (cum, cum <= 1500)


def test_weighted_sample_properties(spark):
    """Determinism, proportionality, and the in-plan weight guard:
    a 1000x-weight row is effectively always drawn; re-runs pick the
    identical set; NULL/zero weights raise."""
    import pytest as _pytest

    from csvb_spark.operators.splits import weighted_sample

    rows = [(i, 1000 if i == 0 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id bigint, w int")
    got = weighted_sample(df, k=10, weight_col="w").collect()
    assert len(got) == 10
    assert 0 in {r.doc_id for r in got}  # P(miss) ~ (1/1000)^something
    again = weighted_sample(df, k=10, weight_col="w").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    # output is skey-ascending with the id tie-break
    keys = [(r.skey, r.doc_id) for r in got]
    assert keys == sorted(keys)

    # different seeds draw different sets (with overwhelming prob.)
    other = {r.doc_id for r in weighted_sample(df, 10, "w", seed=99).collect()}
    assert other != {r.doc_id for r in got}

    with _pytest.raises(ValueError, match="k must be positive"):
        weighted_sample(df, 0, "w")
    bad = spark.createDataFrame([(1, None)], "doc_id bigint, w int")
    with _pytest.raises(Exception, match="must be.*positive|assert"):
        weighted_sample(bad, 1, "w").collect()


def test_weighted_sample_plan_is_take_ordered(spark, sf_dir):
    """One map-side key projection + TakeOrderedAndProject — the
    table is never globally sorted or shuffled."""
    from pyspark.sql import functions as F

    from csvb_spark.operators.splits import weighted_sample
    from tests.test_plans import _plan

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.length("text").alias("w"))
    )
    plan = _plan(weighted_sample(docs, 20, "w"))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_calibrate_keep_threshold_exact_quota(spark):
    """The chosen threshold keeps >= the requested fraction with
    minimal overshoot; NULL scores raise; cardinality guard fires."""
    import pytest as _pytest

    from csvb_spark.operators.text import calibrate_keep_threshold

    # scores 0.0 .. 0.9, ten docs each → keep 3/10 means t = 0.7
    rows = [(i, round((i % 10) * 0.1, 1)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, quality_score double")
    out = calibrate_keep_threshold(df, 3, 10).collect()
    assert all(r.threshold == 0.7 for r in out)
    kept = [r for r in out if r.keep]
    assert len(kept) == 30 and all(r.quality_score >= 0.7 for r in kept)

    # quota not divisible: 3/7 of 100 → 42.85… → first cum >= 42.86
    out2 = calibrate_keep_threshold(df, 3, 7).collect()
    n_kept = sum(r.keep for r in out2)
    assert n_kept >= 100 * 3 / 7
    # minimal overshoot: dropping the threshold bucket goes under quota
    t = out2[0].threshold
    below = sum(1 for r in out2 if r.quality_score > t)
    assert below < 100 * 3 / 7

    with _pytest.raises(ValueError, match="keep_num"):
        calibrate_keep_threshold(df, 0, 10)
    bad = spark.createDataFrame(
        [(1, None)], "doc_id bigint, quality_score double"
    )
    with _pytest.raises(Exception, match="NULL|assert"):
        calibrate_keep_threshold(bad, 1, 2).collect()
    with _pytest.raises(ValueError, match="distinct"):
        calibrate_keep_threshold(df, 1, 2, max_distinct=3)


def test_skew_report_math_and_plan(spark, sf_dir):
    """Entropy anchors: a uniform key distribution has norm_entropy
    1.0, a constant key has entropy 0 and NULL norm; plan is one
    groupBy + broadcast totals + TakeOrderedAndProject."""
    import pytest as _pytest

    from csvb_spark.operators.profile import skew_report
    from tests.test_plans import _plan

    uniform = spark.createDataFrame(
        [(i % 8,) for i in range(800)], "k bigint"
    )
    u = skew_report(uniform, "k", k=10).collect()
    assert len(u) == 8
    assert all(r.norm_entropy == 1.0 and r.n == 100 for r in u)
    assert all(r.share == 0.125 for r in u)

    const = spark.createDataFrame([(1,)] * 50, "k bigint")
    c = skew_report(const, "k", k=5).collect()
    assert len(c) == 1 and c[0].entropy == 0.0 and c[0].norm_entropy is None

    skewed = spark.createDataFrame(
        [(0,)] * 900 + [(i,) for i in range(1, 101)], "k bigint"
    )
    s = skew_report(skewed, "k", k=3).collect()
    assert s[0].key == 0 and s[0].share == 0.9
    assert s[0].norm_entropy < 0.25  # concentrated → near 0

    with _pytest.raises(ValueError, match="k must be positive"):
        skew_report(uniform, "k", 0)

    docs = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = _plan(skew_report(docs, "o_custkey"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_url_normalize_rules(spark):
    """x100: each canonicalization rule on a planted URL set, incl.
    the cases that must NOT change (non-default port, :80 on https,
    'ref=' inside a value, URL-less strings passed through)."""
    from csvb_spark.operators.web import registered_domain, url_normalize

    cases = [
        # (raw, expected_norm, expected_domain)
        ("HTTPS://WWW.Ex.COM:443/a/?utm_source=x&id=1#f",
         "https://ex.com/a?id=1", "ex.com"),
        ("http://ex.com:80/", "http://ex.com", "ex.com"),
        ("https://ex.com:80/p", "https://ex.com:80/p", "ex.com"),  # kept
        ("http://a.b.co.uk:8080/p/", "http://a.b.co.uk:8080/p", "b.co.uk"),
        ("http://ex.com/?utm_a=1&utm_b=2&id=3&gclid=z",
         "http://ex.com?id=3", "ex.com"),
        ("http://ex.com/?utm_a=1&utm_b=2", "http://ex.com", "ex.com"),
        ("http://ex.com/?id=xref=9&y=2",
         "http://ex.com?id=xref=9&y=2", "ex.com"),  # ref= inside a value
        ("http://ex.com/?id=3&ref=home&z=4&fbclid=q",
         "http://ex.com?id=3&z=4", "ex.com"),
        ("not a url", "not a url", ""),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)],
                               "i int, url string")
    rows = (
        df.select(
            "i",
            url_normalize("url").alias("n"),
            registered_domain(url_normalize("url")).alias("d"),
        )
        .orderBy("i")
        .collect()
    )
    for (raw, want_n, want_d), r in zip(cases, rows):
        assert r["n"] == want_n, (raw, r["n"], want_n)
        assert r["d"] == want_d, (raw, r["d"], want_d)


def test_domain_quota_two_phase_equivalence(spark):
    """x100: the sharded two-phase ranking emits exactly the
    single-window selection, for every shard count — incl. a hot
    domain far over quota."""
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from csvb_spark.operators.web import domain_quota_sample, quota_priority

    pdf = pd.DataFrame(
        {
            "doc_id": range(300),
            "url": [
                "http://hot.example.com/p%d" % i
                if i < 200
                else "http://cold%d.org/p" % (i % 7)
                for i in range(300)
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    want = None
    for n_shards in (1, 4, 32):
        got = sorted(
            map(
                tuple,
                domain_quota_sample(
                    docs, quota=6, n_shards=n_shards
                ).collect(),
            )
        )
        if want is None:
            want = got
        assert got == want, f"n_shards={n_shards} diverged"
    # cross-check the single-window reference ranking
    from csvb_spark.operators.web import registered_domain, url_normalize

    base = docs.select(
        "doc_id",
        url_normalize("url").alias("url_norm"),
        registered_domain(url_normalize("url")).alias("domain"),
        quota_priority("doc_id").alias("_p"),
    )
    w = Window.partitionBy("domain").orderBy("_p", "doc_id")
    ref = sorted(
        map(
            tuple,
            base.withColumn("pick_rank", F.row_number().over(w))
            .filter(F.col("pick_rank") <= 6)
            .drop("_p")
            .collect(),
        )
    )
    assert want == ref
    hot = [r for r in want if r[2] == "example.com"]
    assert len(hot) == 6  # quota enforced on the hot domain

    import pytest as _pytest

    with _pytest.raises(ValueError, match="quota"):
        domain_quota_sample(docs, quota=0)
    with _pytest.raises(ValueError, match="n_shards"):
        domain_quota_sample(docs, n_shards=0)


def test_length_bucket_batches_planted(spark):
    """x101: exact batch composition and padding arithmetic on a
    planted corpus — one bucket fully padded-free (equal lengths),
    one with known waste, shard locality respected."""
    from pyspark.sql import functions as F

    from csvb_spark.operators.splits import length_bucket_batches

    # 8 docs of 10 tokens (bucket 0) and 4 docs of 40/50 tokens
    # (bucket 1), all in shard 0 (ids multiples of 8)
    rows = [(i * 8, " ".join(["w"] * 10)) for i in range(8)]
    rows += [(64 + i * 8, " ".join(["w"] * (40 if i < 2 else 50)))
             for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["bucket"], r["shard"], r["batch_id"]): r
        for r in length_bucket_batches(
            docs, batch_size=4, boundaries=(32,), n_shards=8
        ).collect()
    }
    assert set(got) == {(0, 0, 0), (0, 0, 1), (1, 0, 0)}
    b0 = got[(0, 0, 0)]
    assert b0["n_docs"] == 4 and b0["max_len"] == 10
    assert b0["padded_tokens"] == 0 and b0["pad_frac"] == 0.0
    b1 = got[(1, 0, 0)]  # longest-first: two 50s then two 40s
    assert b1["n_docs"] == 4 and b1["max_len"] == 50
    assert b1["sum_tokens"] == 180 and b1["padded_tokens"] == 20
    assert b1["pad_frac"] == 0.1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="batch_size"):
        length_bucket_batches(docs, batch_size=0)
    with _pytest.raises(ValueError, match="boundaries"):
        length_bucket_batches(docs, boundaries=(64, 32))


def test_char_entropy_planted(spark):
    """x103: uniform text hits ln(K), constant text hits 0, empty and
    NULL text yield no distribution (NULL entropy, 0 chars)."""
    import math

    from csvb_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "abcd" * 25),        # uniform over 4 chars → ln 4
            (2, "aaaa"),             # degenerate → 0
            (3, ""),                 # empty → no distribution
            (4, None),               # NULL → same as empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert got[1]["n_chars"] == 100 and got[1]["n_uniq"] == 4
    assert abs(got[1]["entropy"] - math.log(4)) < 1e-5
    assert got[2]["entropy"] == 0.0 and got[2]["n_uniq"] == 1
    for i in (3, 4):
        assert got[i]["n_chars"] == 0 and got[i]["n_uniq"] == 0
        assert got[i]["entropy"] is None


def test_quota_priority_rejects_null_ids(spark):
    """A NULL id would rank NULLS-FIRST in the batch window but
    NaN-last in the streaming gate — both paths must fail fast."""
    import pytest as _pytest

    from csvb_spark.operators.web import domain_quota_sample

    docs = spark.createDataFrame(
        [(1, "http://a.com/x"), (None, "http://a.com/y")],
        "doc_id long, url string",
    )
    with _pytest.raises(Exception, match="NULL id"):
        domain_quota_sample(docs).collect()


def test_token_fertility_planted(spark):
    """x104: clean prose scores 1.0; punctuation/digit-laced text
    shreds into more subwords per word."""
    from csvb_spark.operators.text import token_fertility

    docs = spark.createDataFrame(
        [
            (1, "plain words only here", "clean"),
            (2, "more plain words here", "clean"),
            (3, "it's 2024, v2.0-beta (really!)", "noisy"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in token_fertility(docs).collect()}
    assert got["clean"]["n_docs"] == 2
    assert got["clean"]["fertility"] == 1.0  # no splits on clean prose
    assert got["noisy"]["n_words"] == 4
    assert got["noisy"]["n_subwords"] > 4  # "it's" -> it ' s, etc.
    assert got["noisy"]["fertility"] > 2.0


def test_leakage_safe_splits_colocate_neardups(spark):
    """Planted near-identical pair whose members hash to DIFFERENT
    splits under plain doc-id bucketing must land on the SAME side
    under leakage-safe assignment (cluster-canonical bucketing), and
    unpaired docs keep their plain-assign_splits membership."""
    from csvb_spark.operators.splits import assign_splits, leakage_safe_splits

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    # find two ids whose PLAIN portable buckets differ across the
    # train/test boundary, then make their texts near-identical
    from hashlib import md5 as _md5

    def bucket(i):
        return int(_md5(f"{i}:42".encode()).hexdigest()[:8], 16) % 10000

    pair = None
    ids = list(range(1, 400))
    for i in ids:
        for j in ids:
            if i < j and bucket(i) < 9000 <= bucket(j):
                pair = (i, j)
                break
        if pair:
            break
    assert pair, "fixture search failed"
    i, j = pair
    rows.append((i, base + " alpha", "en", "web"))
    rows.append((j, base + " bravo", "en", "web"))
    # plus unpaired docs with pairwise-dissimilar text (distinct char
    # 4-gram vocabularies, so no cross-doc Jaccard edge forms)
    for n in range(50, 60):
        word = chr(ord("a") + n - 50) * 6
        rows.append((n * 1000, f"{word}{n} " * 8, "en", "web"))
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    plain = {
        r["doc_id"]: r["split"]
        for r in assign_splits(d, portable=True).collect()
    }
    assert plain[i] != plain[j]  # the leak the operator exists to stop
    safe = leakage_safe_splits(d, portable=True)
    got = {r["doc_id"]: (r["split"], r["cluster_id"]) for r in safe.collect()}
    assert got[i] == got[j] == (plain[i], i)  # canonical = min id
    for n in range(50, 60):
        k = n * 1000
        assert got[k] == (plain[k], k)  # unpaired: unchanged membership


def test_tar_export_roundtrip_via_reader(spark, sf_dir, tmp_path):
    """export_tar_shards -> read_tar_corpus is a lossless round trip:
    typed metadata expansion reconstructs the exact source rows."""
    from csvb_spark.operators.splits import export_tar_shards
    from csvb_spark.sources.tar_corpus import read_tar_corpus

    src = _docs(spark, sf_dir)
    out = str(tmp_path / "wds")
    manifest = export_tar_shards(src, out, n_shards=3).collect()
    assert sum(r["n_docs"] for r in manifest) == src.count()

    back = read_tar_corpus(
        spark, out, meta_schema="lang string, source string, n_chars long"
    )
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    got = sorted(tuple(r) for r in back.select(*cols).collect())
    want = sorted(tuple(r) for r in src.select(*cols).collect())
    assert got == want

    # raw mode keeps the metadata JSON verbatim
    raw = read_tar_corpus(spark, out).limit(1).collect()[0]
    import json as _json

    meta = _json.loads(raw["meta"])
    assert meta["doc_id"] == raw["doc_id"]


def test_tar_reader_tolerates_foreign_keys(spark, tmp_path):
    """A foreign WebDataset tar with non-numeric member stems
    (sample-001.txt) reads with NULL doc_id instead of killing the
    read task; numeric-stem members in the same tar keep their id."""
    import io
    import json as _json
    import tarfile

    tar_dir = tmp_path / "foreign"
    tar_dir.mkdir()
    with tarfile.open(tar_dir / "shard-000000.tar", "w") as tf:
        for stem, txt, meta in [
            ("sample-001", "foreign text one", {"k": 1}),
            ("sample-002", "foreign text two", None),
            ("000000000007", "native text", {"doc_id": 7}),
        ]:
            data = txt.encode()
            ti = tarfile.TarInfo(f"{stem}.txt")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            if meta is not None:
                blob = _json.dumps(meta).encode()
                tj = tarfile.TarInfo(f"{stem}.json")
                tj.size = len(blob)
                tf.addfile(tj, io.BytesIO(blob))

    from csvb_spark.sources.tar_corpus import read_tar_corpus

    rows = {
        r["text"]: r["doc_id"]
        for r in read_tar_corpus(spark, str(tar_dir)).collect()
    }
    assert rows == {
        "foreign text one": None,
        "foreign text two": None,
        "native text": 7,
    }


def test_snake_sharding_balance_and_validation(spark, sf_dir):
    """Snake deal balance: every shard's weight sum lands within one
    heaviest document of every other (the greedy-balance guarantee
    hash sharding lacks); n_shards=1 puts everything in shard 0;
    bad n_shards is a loud error."""
    import pytest as _pytest

    from csvb_spark.operators.splits import snake_sharding

    d = _docs(spark, sf_dir)
    out = snake_sharding(d, n_shards=7)
    sums = {
        r["shard"]: r["w"]
        for r in out.groupBy("shard").agg(F.sum("weight").alias("w")).collect()
    }
    assert set(sums) == set(range(7))
    mx = out.agg(F.max("weight")).first()[0]
    assert max(sums.values()) - min(sums.values()) <= mx

    one = snake_sharding(d, n_shards=1)
    assert one.select("shard").distinct().collect()[0][0] == 0

    with _pytest.raises(ValueError, match="n_shards"):
        snake_sharding(d, n_shards=0)


def test_near_dedup_keep_longest(spark):
    """keep='longest' keeps the longest cluster member (ties to min
    id); min_id default unchanged; bad keep is a loud error."""
    import pytest as _pytest

    from csvb_spark.operators.dedup import near_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    d = spark.createDataFrame(
        [
            (1, base + " extra tail words making this one longest", "en", "web"),
            (2, base, "en", "web"),
            (3, base + " x", "en", "web"),
            (9, "totally unrelated content zzz " * 3, "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    longest = {r["doc_id"] for r in near_dedup(d, keep="longest").collect()}
    assert longest == {1, 9}
    minid = {r["doc_id"] for r in near_dedup(d).collect()}
    assert minid == {1, 9}  # here min id IS the longest; vary below

    d2 = spark.createDataFrame(
        [
            (5, base, "en", "web"),
            (6, base + " with a much longer informative tail here", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    assert {r["doc_id"] for r in near_dedup(d2, keep="longest").collect()} == {6}
    assert {r["doc_id"] for r in near_dedup(d2).collect()} == {5}

    with _pytest.raises(ValueError, match="keep"):
        near_dedup(d, keep="newest")


def test_review_fixes_null_handling_and_stale_tars(spark, sf_dir, tmp_path):
    """Round-8 self-review regressions: NULL weight/score rows are
    KEPT (not silently dropped by a NULL bucket join); a re-export
    with fewer shards clears the previous run's higher tars; the
    funnel works without a pre-existing n_chars column; dotted filter
    names resolve."""
    import glob as _glob

    from csvb_spark.operators.profile import filter_attribution, retention_funnel
    from csvb_spark.operators.splits import (
        curriculum_order,
        export_tar_shards,
        snake_sharding,
    )

    d = spark.createDataFrame(
        [(1, "three tokens here", "en", "a"), (2, None, "en", "a")],
        "doc_id long, text string, lang string, source string",
    )
    snake = {r["doc_id"]: r for r in snake_sharding(d, n_shards=2).collect()}
    # NULL text reads as one empty token (tokens() semantics), not a drop
    assert set(snake) == {1, 2} and snake[2]["weight"] == 1
    wsnake = {
        r["doc_id"]: r
        for r in snake_sharding(
            d.withColumn("w", F.expr("CASE WHEN doc_id = 1 THEN 10 END")),
            n_shards=2,
            weight_col="w",
        ).collect()
    }
    assert set(wsnake) == {1, 2} and wsnake[2]["weight"] == 0

    cur = {
        r["doc_id"]: r["stage"]
        for r in curriculum_order(
            d.withColumn("score", F.expr("CASE WHEN doc_id = 1 THEN 5.0 END")),
            "score",
            [1.0],
        ).collect()
    }
    assert cur == {1: 2, 2: 1}  # NULL score -> stage 1, row kept

    out = str(tmp_path / "reshard")
    export_tar_shards(_docs(spark, sf_dir), out, n_shards=4).collect()
    assert len(_glob.glob(f"{out}/shard-*.tar")) == 4
    export_tar_shards(_docs(spark, sf_dir), out, n_shards=2).collect()
    assert len(_glob.glob(f"{out}/shard-*.tar")) == 2  # stale tars gone

    funnel = retention_funnel(d.select("doc_id", "text", "source"))
    row = funnel.collect()[0]
    assert row["n_raw"] == 2  # no n_chars column required

    att = filter_attribution(d, {"min.len": F.length("text") >= 5})
    assert att.collect()[0]["filter"] == "min.len"


# --- Bloom-prefiltered contamination (round 12) --------------------------------


def test_contamination_bloom_identical_to_exact(spark, sf_dir):
    """The Bloom prefilter must be RESULT-INVISIBLE: no false
    negatives (Bloom property) + exact verify join (kills false
    positives) means bit-identical rows to contamination_check on the
    same inputs."""
    from csvb_spark.operators.splits import (
        contamination_check,
        contamination_check_bloom,
    )

    d = _docs(spark, sf_dir)
    tr, ev = d.filter(F.col("doc_id") % 10 != 0), d.filter(F.col("doc_id") % 10 == 0)
    exact = sorted(map(tuple, contamination_check(tr, ev, k=8, min_shared=2).collect()))
    bloom = sorted(
        map(tuple, contamination_check_bloom(tr, ev, k=8, min_shared=2).collect())
    )
    assert exact == bloom
    assert exact  # non-vacuous: the fixture does produce contaminated pairs


def test_contamination_bloom_plan_is_jvm_prefilter(spark, sf_dir):
    """The probe must be PURE JVM — no Python evaluation node of any
    kind in the plan (the Arrow-batched UDF variant measured
    super-linear at the sf10 bench; the broadcast word-table join +
    mask filter stays inside codegen) — and the word-table join that
    implements the prefilter must broadcast, never shuffle."""
    from csvb_spark.operators.splits import contamination_check_bloom
    from csvb_spark.plans.lint import lint_plan, physical_plan

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 80)
    df = contamination_check_bloom(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
    )
    plan = physical_plan(df)
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan  # word-table lookup broadcasts
    assert "shiftrightunsigned" in plan  # the mask probe is in-plan
    assert not lint_plan(df)


def test_sbbf_build_has_no_false_negatives(spark):
    """Every inserted key must probe positive (the property the
    operator's correctness rests on) — replayed with the SAME mask
    math the Spark expression uses — and the false-positive rate on
    disjoint keys stays well under 1% at 16 bits/key (theory ~5e-4;
    loose bound, not a statistics exam). Second hashes come from
    Spark's own xxhash64 so the build path is exercised end to end."""
    import numpy as np

    from csvb_spark.operators.splits import _sbbf_build, _sbbf_masks

    rng = np.random.default_rng(42)
    members = rng.integers(-(2**63), 2**63 - 1, size=20000, dtype=np.int64)
    others = rng.integers(-(2**63), 2**63 - 1, size=20000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    seed = 7

    def spark_h2(h1):
        df = spark.createDataFrame([(int(v),) for v in h1], "gh bigint")
        rows = df.selectExpr("gh", f"xxhash64(gh, {seed}) AS h2").collect()
        got = {r[0]: r[1] for r in rows}
        return np.array([got[int(v)] for v in h1], dtype=np.int64)

    m_h2, o_h2 = spark_h2(members), spark_h2(others)
    words, n_words = _sbbf_build(members, m_h2, bits_per_key=16)
    uwords = words.view(np.uint64)

    def probe(h1, h2):
        w = (np.asarray(h1, dtype=np.int64) % np.int64(n_words)).astype(np.int64)
        mask = _sbbf_masks(h2)
        return (uwords[w] & mask) == mask

    assert probe(members, m_h2).all()  # zero false negatives, ever
    assert probe(others, o_h2).mean() < 0.01  # fp rate sane at 16 b/key


def test_contamination_bloom_collect_guard(spark, sf_dir):
    """The driver-side bitmap build is bounded: an eval gram set past
    max_eval_grams must raise instead of collecting unbounded state."""
    import pytest

    from csvb_spark.operators.splits import contamination_check_bloom

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 40)
    with pytest.raises(ValueError, match="max_eval_grams"):
        contamination_check_bloom(
            d.filter(F.col("doc_id") % 10 != 0),
            d.filter(F.col("doc_id") % 10 == 0),
            max_eval_grams=10,
        )


def test_parse_spark_size_and_auto_method_units():
    """_parse_spark_size handles every Spark size suffix and the
    disabled sentinel; decontam_auto_method's threshold override is
    covered end-to-end by the CLI test (test_integration_surface)."""
    from csvb_spark.operators.splits import _parse_spark_size

    assert _parse_spark_size("10MB") == 10 * 1024 * 1024
    assert _parse_spark_size("10485760b") == 10485760
    assert _parse_spark_size("64m") == 64 * 1024 * 1024
    assert _parse_spark_size("2g") == 2 * 1024 ** 3
    assert _parse_spark_size("1KB") == 1024
    assert _parse_spark_size("-1") == -1
    assert _parse_spark_size(" 512 ") == 512


def test_contamination_bloom_empty_eval_set(spark):
    """Degenerate input pin for the round-13 refactor (the rare-gram
    hashes now feed both the word table and the verify join as a
    driver-built relation): an EMPTY eval suite yields an empty pair
    set, not a crash — the SBBF builds its 1-word minimum and the
    broadcast relation is a zero-row frame."""
    from csvb_spark.operators.splits import contamination_check_bloom

    train = spark.createDataFrame(
        [(1, "some training text here")], "doc_id bigint, text string"
    )
    evald = spark.createDataFrame([], "doc_id bigint, text string")
    assert contamination_check_bloom(train, evald, k=4).count() == 0
