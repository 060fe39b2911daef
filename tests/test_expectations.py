"""Data-expectation contracts: single-pass plan shape, pass/fail
semantics, and the gate form. Oracle parity is x72 in test_oracle.py."""

from __future__ import annotations

import pytest

from csvb_spark.operators.expectations import (
    assert_expectations,
    check_expectations,
    expect_in_set,
    expect_max,
    expect_max_null_fraction,
    expect_min,
    expect_row_count_at_least,
    expect_unique,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "en", 10),
            (2, "fr", 20),
            (2, "xx", 30),  # dup id + out-of-set lang
            (None, "en", -5),  # null id + negative
        ],
        "doc_id bigint, lang string, n int",
    )


def test_check_expectations_semantics(spark):
    out = {
        r["check_name"]: (r["metric"], r["passed"])
        for r in check_expectations(
            _df(spark),
            [
                expect_row_count_at_least(4),
                expect_unique("doc_id"),
                expect_max_null_fraction("doc_id", 0.5),
                expect_in_set("lang", ["en", "fr"]),
                expect_min("n", 0),
                expect_max("n", 100),
            ],
        ).collect()
    }
    assert out["row_count>=4"] == (4.0, True)
    assert out["unique(doc_id)"] == (1.0, False)  # one dup among non-nulls
    assert out["null_fraction(doc_id)<=0.5"] == (0.25, True)
    assert out["in_set(lang)"] == (1.0, False)  # the 'xx' row
    assert out["min(n)>=0"] == (-5.0, False)
    assert out["max(n)<=100"] == (30.0, True)


def test_single_pass_plan(spark):
    df = _df(spark)
    plan_df = check_expectations(
        df,
        [
            expect_row_count_at_least(1),
            expect_unique("doc_id"),
            expect_max_null_fraction("lang", 0.1),
            expect_min("n", 0),
        ],
    )
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
        "formatted"
    )
    plan = plan_df._jdf.queryExecution().explainString(jmode)  # noqa: SLF001
    # all checks fuse into one aggregation over ONE scan of the input
    # (formatted plans print each node twice — count detail headers)
    import re

    assert len(re.findall(r"\(\d+\) Scan ", plan)) == 1


def test_assert_expectations_gate(spark):
    df = _df(spark)
    assert_expectations(df, [expect_row_count_at_least(2)])  # passes silently
    with pytest.raises(ValueError, match=r"unique\(doc_id\)"):
        assert_expectations(
            df, [expect_unique("doc_id"), expect_row_count_at_least(2)]
        )


def test_check_expectations_validates_input(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="no expectations"):
        check_expectations(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_expectations(df, [expect_unique("doc_id"), expect_unique("doc_id")])


# --- PageRank (operators/graph.py) -------------------------------------


def test_pagerank_known_small_graph(spark):
    from csvb_spark.operators.graph import pagerank

    # two-node symmetric graph: ranks stay at 0.5 for any damping
    e = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    assert got == {1: 0.5, 2: 0.5}

    # star: hub 1 <-> leaves 2,3,4 (undirected, fed both ways)
    pairs = [(1, 2), (1, 3), (1, 4)]
    e2 = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src bigint, dst bigint"
    )
    got2 = {r["node"]: r["rank"] for r in pagerank(e2, iters=10).collect()}
    # hub collects all leaf mass; leaves split the hub's equally
    assert got2[1] > got2[2]
    assert got2[2] == got2[3] == got2[4]
    assert abs(sum(got2.values()) - 1.0) < 1e-4


def test_pagerank_directed_sink_gets_base_rank(spark):
    from csvb_spark.operators.graph import pagerank

    # 1 -> 2 -> 3, 3 -> 1 (a cycle: every node has out-degree)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src bigint, dst bigint"
    )
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=5).collect()}
    # symmetric cycle → uniform
    assert len(set(got.values())) == 1


def test_pagerank_guards(spark):
    from csvb_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty)
    with pytest.raises(ValueError, match="iters"):
        pagerank(
            spark.createDataFrame([(1, 2)], "src bigint, dst bigint"), iters=0
        )


def test_pagerank_dangling_mass_redistributes(spark):
    from csvb_spark.operators.graph import pagerank

    # 1 -> 2: node 2 is a sink. Round 5 refused this; now its rank
    # mass redistributes uniformly (the standard treatment), so ranks
    # keep summing to ~1 and the sink out-ranks its source (it
    # receives source mass AND its share of its own redistribution).
    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=8).collect()}
    assert set(got) == {1, 2}
    assert abs(sum(got.values()) - 1.0) < 1e-3
    assert got[2] > got[1]

    # hand-checked one iteration: n=2, r0=0.5 each, dangling=node 2
    # it1(1) = 0.15/2 + 0.85*(0 + 0.5/2)        = 0.2875
    # it1(2) = 0.15/2 + 0.85*(0.5/1 + 0.5/2)    = 0.7125
    one = {r["node"]: r["rank"] for r in pagerank(e, iters=1).collect()}
    assert one == {1: 0.2875, 2: 0.7125}


def test_cli_expect(spark, tmp_path, capsys):
    import json

    import pandas as pd

    from csvb_spark.cli import main

    data = str(tmp_path / "t.parquet")
    pd.DataFrame({"doc_id": [1, 2, 2], "lang": ["en", "fr", "xx"]}).to_parquet(data)

    ok_spec = str(tmp_path / "ok.json")
    json.dump([{"check": "row_count_at_least", "n": 2}], open(ok_spec, "w"))
    assert main(["expect", "--parquet", data, ok_spec]) == 0
    out = capsys.readouterr().out
    assert "row_count>=2" in out and "true" in out.lower()

    bad_spec = str(tmp_path / "bad.json")
    json.dump(
        [
            {"check": "unique", "col": "doc_id"},
            {"check": "in_set", "col": "lang", "allowed": ["en", "fr"]},
        ],
        open(bad_spec, "w"),
    )
    assert main(["expect", "--parquet", data, bad_spec]) == 1

    unknown = str(tmp_path / "unk.json")
    json.dump([{"check": "nope"}], open(unknown, "w"))
    with pytest.raises(SystemExit, match="unknown check"):
        main(["expect", "--parquet", data, unknown])


# --- streaming expectation monitor (streaming/monitor.py) --------------


def test_streaming_expectation_monitor(spark, tmp_path):
    import pandas as pd

    from csvb_spark.streaming.monitor import run_expectation_monitor

    src = tmp_path / "mon_src"
    src.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "lang": ["en", "fr"]}).to_parquet(
        str(src / "b1.parquet")
    )
    pd.DataFrame({"doc_id": [3, 3], "lang": ["en", "xx"]}).to_parquet(
        str(src / "b2.parquet")
    )
    out = run_expectation_monitor(
        spark,
        str(src),
        str(tmp_path / "metrics"),
        str(tmp_path / "ckpt"),
        [expect_unique("doc_id"), expect_in_set("lang", ["en", "fr"])],
        query_name="t_exp_mon",
    )
    rows = {
        (r["batch_id"], r["check_name"]): r["passed"] for r in out.collect()
    }
    assert len(rows) == 4  # 2 batches × 2 checks
    # the clean batch passes both; the bad batch fails both — and the
    # failure is LOCALIZED to its batch
    by_batch: dict = {}
    for (bid, _c), passed in rows.items():
        by_batch.setdefault(bid, []).append(passed)
    assert sorted(all(v) for v in by_batch.values()) == [False, True]


# --- table profile (operators/profile.py) ------------------------------


def test_profile_table_single_pass_and_values(spark):
    import re

    from csvb_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (None, "b", 3.5)],
        "k bigint, s string, x double",
    )
    out = {r["col_name"]: r for r in profile_table(df, exact=True).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nulls"] == 1
    assert out["k"]["n_distinct"] == 2
    assert (out["k"]["min_val"], out["k"]["max_val"]) == (1.0, 2.0)
    assert out["s"]["n_distinct"] == 2 and out["s"]["min_val"] is None
    assert out["x"]["n_nulls"] == 1 and out["x"]["max_val"] == 3.5

    plan_df = profile_table(df)  # approx mode: no Expand, one scan
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
        "formatted"
    )
    plan = plan_df._jdf.queryExecution().explainString(jmode)  # noqa: SLF001
    assert len(re.findall(r"\(\d+\) Scan ", plan)) == 1
    assert "Expand" not in plan


def test_cli_profile(spark, tmp_path, capsys):
    import pandas as pd

    from csvb_spark.cli import main

    data = str(tmp_path / "p.parquet")
    pd.DataFrame({"doc_id": [1, 2], "lang": ["en", "fr"]}).to_parquet(data)
    rc = main(["profile", "--parquet", data, "--exact"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "doc_id" in out and "n_distinct" in out


def test_profile_table_text_ranges(spark):
    import datetime as dt

    from csvb_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [
            ("banana", dt.datetime(2024, 3, 1, 12, 0, 0, 250000), dt.date(2024, 1, 2), 5),
            ("apple", dt.datetime(2023, 1, 1, 0, 0, 0), dt.date(2024, 5, 6), 9),
        ],
        "s string, ts timestamp, d date, n int",
    )
    prof = {r["col_name"]: r for r in profile_table(df, exact=True).collect()}
    assert prof["s"]["min_text"] == "apple" and prof["s"]["max_text"] == "banana"
    assert prof["ts"]["min_text"] == "2023-01-01 00:00:00.000000"
    assert prof["ts"]["max_text"] == "2024-03-01 12:00:00.250000"
    assert prof["d"]["min_text"] == "2024-01-02" and prof["d"]["max_text"] == "2024-05-06"
    # numeric columns keep DOUBLE ranges and NULL text; text-typed keep NULL doubles
    assert prof["n"]["min_val"] == 5.0 and prof["n"]["min_text"] is None
    assert prof["s"]["min_val"] is None


def test_streaming_drift_monitor(spark, tmp_path):
    """Per-batch drift vs a reference corpus: a clean batch reports
    near-zero contributions, a vocabulary-shifted batch surfaces its
    planted tokens, and each batch's report equals the BATCH
    token_drift run (streaming = repeated batch semantics)."""
    import pandas as pd

    from csvb_spark.operators.lm import token_drift
    from csvb_spark.streaming.monitor import run_drift_monitor

    base = "the cat sat on the mat near the tall tree"
    ref_dir = str(tmp_path / "ref")
    pd.DataFrame({"doc_id": list(range(10)), "text": [base] * 10}).to_parquet(
        str(tmp_path / "ref.parquet")
    )
    import os

    os.rename(str(tmp_path / "ref.parquet"), ref_dir + ".parquet")
    ref_path = ref_dir + ".parquet"

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": [base, base]}).to_parquet(
        str(src / "b1.parquet")
    )
    import time

    time.sleep(0.05)
    pd.DataFrame(
        {"doc_id": [3, 4], "text": ["spam casino spam", "casino jackpot spam"]}
    ).to_parquet(str(src / "b2.parquet"))

    out = run_drift_monitor(
        spark,
        str(src),
        ref_path,
        str(tmp_path / "metrics"),
        str(tmp_path / "ckpt"),
        k=5,
        query_name="t_drift_mon",
    )
    rows = out.collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], []).append(r)
    assert len(by_batch) == 2
    # one batch is clean (all near-zero contribs), one is shifted
    tops = {
        b: max(r["contrib"] for r in rs) for b, rs in by_batch.items()
    }
    clean_b = min(tops, key=tops.get)
    spam_b = max(tops, key=tops.get)
    assert tops[clean_b] < 0.02 < tops[spam_b]  # smoothing noise vs real shift
    spam_tokens = {r["token"] for r in by_batch[spam_b][:3]}
    assert spam_tokens & {"spam", "casino", "jackpot"}

    # streaming report == batch token_drift on the same data
    ref = spark.read.parquet(ref_path)
    batch2 = spark.createDataFrame(
        [(3, "spam casino spam"), (4, "casino jackpot spam")],
        "doc_id bigint, text string",
    )
    want = {
        (r["token"], r["n_old"], r["n_new"], r["contrib"])
        for r in token_drift(ref, batch2, k=5).collect()
    }
    got = {
        (r["token"], r["n_old"], r["n_new"], r["contrib"])
        for r in by_batch[spam_b]
    }
    assert got == want


def test_cli_skew_subcommand(spark, tmp_path, capsys):
    """The skew subcommand surfaces skew_report end to end: hot-key
    table + a SKEWED/balanced verdict line; a missing key column is a
    loud error naming the available columns."""
    import pandas as pd
    import pytest as _pytest

    from csvb_spark.cli import main

    data = str(tmp_path / "skewed.parquet")
    pd.DataFrame(
        {"k": ["hot"] * 90 + [f"u{i}" for i in range(10)], "v": range(100)}
    ).to_parquet(data)
    assert main(["skew", "--parquet", data, "--key", "k", "--k", "3"]) == 0
    out = capsys.readouterr().out
    assert "| hot | 90" in out and "SKEWED" in out

    uniform = str(tmp_path / "uniform.parquet")
    pd.DataFrame({"k": [f"u{i}" for i in range(100)], "v": range(100)}).to_parquet(
        uniform
    )
    assert main(["skew", "--parquet", uniform, "--key", "k"]) == 0
    assert "balanced" in capsys.readouterr().out

    # single-key table: entropy normalizes to NULL but this is the
    # DEGENERATE-skew case — the verdict line must still print SKEWED
    single = str(tmp_path / "single.parquet")
    pd.DataFrame({"k": ["only"] * 50, "v": range(50)}).to_parquet(single)
    assert main(["skew", "--parquet", single, "--key", "k"]) == 0
    single_out = capsys.readouterr().out
    assert "SKEWED" in single_out and "single key" in single_out

    with _pytest.raises(SystemExit, match="not in table"):
        main(["skew", "--parquet", data, "--key", "nope"])


def test_cli_clean_subcommand(spark, tmp_path, capsys):
    """The clean subcommand surfaces the C4 filter end to end:
    keep-rate summary, optional written output, custom blocked terms."""
    import pandas as pd

    from csvb_spark.cli import main

    data = str(tmp_path / "docs.parquet")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "\n".join(f"one two three four {i}." for i in range(5)),
                "no terminal punct\nalso none here",
                "\n".join("lorem ipsum dolor sit amet." for _ in range(5)),
            ],
        }
    ).to_parquet(data)
    out_dir = str(tmp_path / "cleaned")
    rc = main(["clean", "--parquet", data, "--output", out_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "n_keep" in out and "n_kept_lines" in out
    rows = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert rows[1]["keep_doc"] is True and rows[1]["n_kept"] == 5
    assert rows[2]["keep_doc"] is False and rows[2]["n_kept"] == 0
    assert rows[3]["keep_doc"] is False  # lorem ipsum page rule

    # custom blocked phrase + disabled terminal rule: doc1 now dies to
    # the phrase, docs 2-3 survive (terminal rule off, defaults
    # replaced) — written output pins that each flag actually landed
    out2 = str(tmp_path / "cleaned2")
    rc = main(
        [
            "clean", "--parquet", data, "--no-terminal",
            "--blocked-doc-phrase", "three four", "--min-kept-lines", "2",
            "--output", out2,
        ]
    )
    assert rc == 0
    assert "n_docs" in capsys.readouterr().out
    rows2 = {r["doc_id"]: r for r in spark.read.parquet(out2).collect()}
    assert rows2[1]["keep_doc"] is False  # blocked phrase matched
    assert rows2[2]["keep_doc"] is True and rows2[2]["n_kept"] == 2
    assert rows2[3]["keep_doc"] is True  # default lorem-ipsum rule gone

    # an empty blocked term would silently drop everything — rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty term"):
        main(["clean", "--parquet", data, "--blocked-line-word", ""])


def test_cli_quota_subcommand(spark, tmp_path, capsys):
    """The quota subcommand canonicalizes URLs, caps per-domain keeps,
    and writes the kept rows; missing columns reject loudly."""
    import pandas as pd

    from csvb_spark.cli import main

    data = str(tmp_path / "pages.parquet")
    pd.DataFrame(
        {
            "doc_id": range(40),
            "url": [
                "http://WWW.Hot.example.com/p%d?utm_source=x" % i
                if i < 30
                else "https://cold%d.org/p/" % i
                for i in range(40)
            ],
        }
    ).to_parquet(data)
    out = str(tmp_path / "kept")
    rc = main(["quota", "--parquet", data, "--quota", "3", "--output", out])
    assert rc == 0
    assert "n_kept" in capsys.readouterr().out
    rows = spark.read.parquet(out).collect()
    by_domain = {}
    for r in rows:
        by_domain.setdefault(r["domain"], []).append(r)
    assert len(by_domain["example.com"]) == 3  # hot domain capped
    assert all(len(v) == 1 for d, v in by_domain.items() if d != "example.com")
    assert all(r["url_norm"].startswith(("http://hot.example.com/",
                                         "https://cold")) for r in rows)
    assert all("utm_source" not in r["url_norm"] for r in rows)
    assert not any(r["url_norm"].endswith("/") for r in rows)

    import pytest as _pytest

    with _pytest.raises(SystemExit, match="not in table"):
        main(["quota", "--parquet", data, "--url-col", "nope"])


def test_cli_overlap_subcommand(spark, tmp_path, capsys):
    """The overlap subcommand surfaces the cross-source duplication
    matrix end to end; missing columns reject loudly."""
    import pandas as pd

    from csvb_spark.cli import main

    base = "alpha beta gamma delta epsilon zeta eta theta"
    data = str(tmp_path / "ov.parquet")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [base, base + " iota kappa", "different words entirely now"],
            "source": ["wiki", "crawl", "clean"],
        }
    ).to_parquet(data)
    out = str(tmp_path / "ov_matrix")
    rc = main(["overlap", "--parquet", data, "--output", out])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "n_pairs" in printed and "avg_containment" in printed
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in spark.read.parquet(out).collect()
    }
    assert rows[("wiki", "crawl")]["n_pairs"] == 1
    assert rows[("wiki", "crawl")]["avg_containment"] == 1.0
    assert not any("clean" in k for k in rows)

    import pytest as _pytest

    with _pytest.raises(SystemExit, match="not in table"):
        main(["overlap", "--parquet", data, "--source-col", "nope"])
