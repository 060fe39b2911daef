"""End-to-end batch curation recipe (operators.pipeline.curate):
planted junk must fall out at the right stage, the report must be
consistent (each stage's n_in = previous n_out), and the whole recipe
must be deterministic across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

GOOD = (
    "This is a perfectly reasonable prose sentence ending properly.\n"
    "Here is another one that also ends with the right punctuation.\n"
    "And a third line keeps the page above the minimum line count."
)


def _corpus(spark):
    rows = [
        (1, GOOD, "en", "web"),
        (2, GOOD, "en", "web"),  # exact duplicate of 1
        (3, GOOD + " Slightly longer near duplicate tail here okay.",
         "en", "web"),  # near-dup of 1
        (4, "<p>" + GOOD.replace("\n", "</p><p>") + "</p>"
         + "<script>var x = 1 < 2;</script>", "en", "web"),  # HTML twin
        (5, "no terminal punctuation here at all", "en", "web"),  # C4 kill
        (6, "Completely different quality document with enough words "
            "and the sentence even terminates properly don't you think.\n"
            "A second independent line keeps it above the line minimum.",
         "en", "web"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_curate_stages_and_report(spark):
    from csvb_spark.operators.pipeline import curate

    out, report = curate(
        _corpus(spark),
        html=True,
        min_kept_lines=2,
        splits={"train": 0.8, "test": 0.2},
    )
    rep = {r["stage"]: r for r in report.collect()}
    assert list(rep) == [
        "html_strip", "c4_filter", "exact_dedup", "near_dedup",
        "quality_gate", "split_assign",
    ]
    # chain consistency: each stage starts where the previous ended
    rows = report.collect()
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["n_in"] == prev["n_out"]
    assert rep["html_strip"]["n_out"] == 6
    assert rep["c4_filter"]["n_out"] == 5  # doc 5 dies at C4
    # doc 4's HTML twin becomes an exact dup after stripping: docs
    # 1/2/4 collapse to one keeper at exact dedup
    assert rep["exact_dedup"]["n_out"] == 3
    assert rep["near_dedup"]["n_out"] == 2  # doc 3 merges into 1

    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 6}
    assert all(r["split"] in ("train", "test") for r in got.values())

    out2, _ = curate(
        _corpus(spark), html=True, min_kept_lines=2,
        splits={"train": 0.8, "test": 0.2},
    )
    assert sorted(map(tuple, out2.collect())) == sorted(
        map(tuple, out.collect())
    )  # deterministic


def test_curate_c4_kwargs_passthrough_and_override(spark):
    """c4_kwargs reaches the operator (require_terminal=False keeps
    punctuation-free lines) AND may override the explicitly-passed
    knobs without a duplicate-keyword TypeError (round-14 self-review
    finding: min_kept_lines/text_col used to collide)."""
    from pyspark.sql import functions as F

    from csvb_spark.operators.pipeline import curate

    docs = spark.createDataFrame(
        [
            (i, f"distinct doc {i} words with no terminal punctuation")
            for i in range(4)
        ],
        "doc_id bigint, text string",
    ).withColumn("lang", F.lit("en"))
    # default C4 (terminal rule on): everything dies at stage 1
    strict, _ = curate(docs, near_dup=False, min_quality=None)
    assert strict.count() == 0
    # passthrough: terminal rule off keeps them; override of the
    # explicit min_kept_lines through the SAME dict must not raise
    loose, _ = curate(
        docs,
        near_dup=False,
        min_quality=None,
        c4_kwargs={"require_terminal": False, "min_kept_lines": 1},
    )
    assert loose.count() == 4


def test_curate_keep_longest_and_leakage_safe(spark):
    from csvb_spark.operators.pipeline import curate

    out, _ = curate(
        _corpus(spark), html=True, min_kept_lines=2, keep="longest",
        min_quality=None, splits={"a": 0.5, "b": 0.5}, leakage_safe=True,
    )
    got = {r["doc_id"] for r in out.collect()}
    assert 3 in got  # longest member of the 1/2/3/4 cluster survives


def test_cli_curate_end_to_end(spark, sf_dir, tmp_path, capsys):
    """`csvb curate` runs the recipe over a real fixture, prints the
    stage report, writes the curated rows, and rejects contradictory
    flags loudly."""
    from csvb_spark.cli import main

    out_dir = str(tmp_path / "curated")
    rc = main(
        ["curate", "--parquet", f"{sf_dir}/documents.parquet",
         "--no-c4", "--splits", "train=0.9,test=0.1",
         "--leakage-safe", "--output", out_dir]
    )
    out = capsys.readouterr().out
    assert rc == 0
    for stage in ("exact_dedup", "near_dedup", "quality_gate", "split_assign"):
        assert stage in out
    back = spark.read.parquet(out_dir)
    assert back.count() > 0 and "split" in back.columns

    rc = main(
        ["curate", "--parquet", f"{sf_dir}/documents.parquet",
         "--no-near-dup", "--leakage-safe"]
    )
    err = capsys.readouterr().err
    assert rc == 2 and "near-dup" in err  # contradictory flags

    rc = main(
        ["curate", "--parquet", f"{sf_dir}/documents.parquet",
         "--splits", "oops"]
    )
    err = capsys.readouterr().err
    assert rc == 2 and "malformed --splits" in err


def test_curate_review_fixes(spark):
    """Second review-pass regressions: near-dup forwards text_col to
    the longest-keeper; a table with neither lang nor source gets a
    clean ValueError pointing at pairs_fn; NULL doc_id fails fast
    instead of vanishing at some stages and surviving others."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from csvb_spark.operators.pipeline import curate

    base = "the quick brown fox jumps over the lazy dog again and again."
    d = spark.createDataFrame(
        [
            (1, base, "en", "web"),
            (2, base + " with a much longer informative tail kept here.",
             "en", "web"),
        ],
        "doc_id long, body string, lang string, source string",
    )
    out, _ = curate(d, text_col="body", c4=False, keep="longest",
                    min_quality=None)
    assert {r["doc_id"] for r in out.collect()} == {2}  # longest kept

    bare = d.select("doc_id", F.col("body").alias("text"))
    with _pytest.raises(ValueError, match="pairs_fn"):
        curate(bare, c4=False, min_quality=None)

    with _pytest.raises(ValueError, match="leakage_safe"):
        curate(d, text_col="body", near_dup=False, leakage_safe=True,
               splits={"a": 1.0})

    nullid = spark.createDataFrame(
        [(None, base, "en", "web")],
        "doc_id long, text string, lang string, source string",
    )
    with _pytest.raises(Exception, match="NULL doc_id"):
        curate(nullid, c4=False, near_dup=False, min_quality=None)
