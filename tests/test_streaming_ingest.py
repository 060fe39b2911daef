"""End-to-end streaming corpus ingest: quality gate + exact dedup +
cross-batch near-dup reject against the persisted band index."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _write_batch(path: str, rows: list[dict]) -> None:
    cols = {
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "n_chars": pa.array([len(r["text"]) for r in rows], pa.int64()),
    }
    pq.write_table(pa.table(cols), path)
    # file-source ordering is by modification time — space them out
    time.sleep(0.05)
    os.utime(path)


def test_streaming_ingest_end_to_end(spark, sf_dir, tmp_path):
    from csvb_spark.streaming.ingest import run_streaming_ingest

    docs = {
        r.doc_id: r.asDict()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 30")
        .collect()
    }
    src = tmp_path / "src"
    src.mkdir()
    b1 = [docs[i] for i in range(20) if i in docs]
    _write_batch(str(src / "b1.parquet"), b1)
    dup = dict(docs[1], doc_id=9001)  # exact text copy, new id
    junk = {
        "doc_id": 9002,
        "text": "zzz zzz",  # short, no stopwords → quality 0.4 < 0.5
        "lang": "en",
        "source": "src0",
    }
    b2 = [docs[i] for i in range(20, 30) if i in docs] + [dup, junk]
    _write_batch(str(src / "b2.parquet"), b2)

    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_ingest(spark, str(src), corpus_dir, index_dir, ckpt)

    got = {r.doc_id for r in spark.read.parquet(corpus_dir).select("doc_id").collect()}
    assert 9001 not in got, "cross-batch exact dup must be rejected via the index"
    assert 9002 not in got, "below-threshold quality doc must be gated out"
    assert set(b["doc_id"] for b in b1) <= got | {9001, 9002} and got <= set(
        docs
    ), "every accepted id comes from the fixture batches"

    # index carries one row per (accepted doc × band)
    from csvb_spark.operators.dedup import minhash_bands

    n_bands = (
        minhash_bands(spark.read.parquet(corpus_dir), "text", 16, 4)
        .count()
    )
    assert spark.read.parquet(index_dir).count() == n_bands == len(got) * 4

    # corpus rows carry the scrubbed text alongside the original
    assert "redacted" in spark.read.parquet(corpus_dir).columns

    # resume from checkpoint: nothing new to consume → no growth
    run_streaming_ingest(spark, str(src), corpus_dir, index_dir, ckpt)
    assert spark.read.parquet(corpus_dir).count() == len(got)


def test_cli_ingest_single_batch(spark, sf_dir, tmp_path):
    """`csvb ingest` wires the streaming pipeline: one source file in,
    corpus + bucket-partitioned index out."""
    from csvb_spark.cli import main

    docs = [
        r.asDict()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 10")
        .collect()
    ]
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), docs)
    rc = main(
        [
            "ingest",
            "--source",
            str(src),
            "--corpus",
            str(tmp_path / "corpus"),
            "--index",
            str(tmp_path / "index"),
            "--checkpoint",
            str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    index = spark.read.parquet(str(tmp_path / "index"))
    assert corpus.count() == len(docs)
    assert "bucket" in index.columns and index.count() == len(docs) * 4


def test_streaming_ingest_gopher_gate(spark, sf_dir, tmp_path):
    """gopher_gate composes the x59 rule bundle into the streaming
    quality gate: a doc passing the score threshold but failing a
    Gopher rule (too few words) is rejected."""
    from csvb_spark.streaming.ingest import run_streaming_ingest

    docs = [
        r.asDict()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 10")
        .collect()
    ]
    # 40+ chars and stopwords → quality_score passes, but only 8 words
    # → fails the min-words Gopher rule
    shorty = {
        "doc_id": 9100,
        "text": "the tiny document and a little more text",
        "lang": "en",
        "source": "src0",
    }
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), docs + [shorty])

    corpus_dir = str(tmp_path / "corpus")
    run_streaming_ingest(
        spark,
        str(src),
        corpus_dir,
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
        gopher_gate=True,
        gopher_min_words=30,  # fixture docs run 20-80 words
    )
    got = {r.doc_id for r in spark.read.parquet(corpus_dir).select("doc_id").collect()}
    assert 9100 not in got
    assert got, "long-enough fixture docs still land"


def test_streaming_ingest_classifier_gate(spark, sf_dir, tmp_path):
    """classifier_threshold composes the x64 hashed linear classifier
    into the streaming quality gate: with an impossible threshold
    (scores are bounded in [-0.5, 0.5]) every doc is rejected; with
    threshold None the same batch lands."""
    from csvb_spark.streaming.ingest import run_streaming_ingest

    docs = [
        r.asDict()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 10")
        .collect()
    ]
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), docs)

    closed = str(tmp_path / "corpus_closed")
    run_streaming_ingest(
        spark,
        str(src),
        closed,
        str(tmp_path / "index_closed"),
        str(tmp_path / "ckpt_closed"),
        classifier_threshold=0.6,  # > max possible score: rejects all
    )
    import os

    assert not os.path.isdir(closed) or not any(
        f.endswith(".parquet") for f in os.listdir(closed)
    )

    open_dir = str(tmp_path / "corpus_open")
    run_streaming_ingest(
        spark,
        str(src),
        open_dir,
        str(tmp_path / "index_open"),
        str(tmp_path / "ckpt_open"),
        classifier_threshold=-0.6,  # < min possible score: gate passes all
    )
    got = {r.doc_id for r in spark.read.parquet(open_dir).select("doc_id").collect()}
    assert got


def test_streaming_ingest_perplexity_gate(spark, sf_dir, tmp_path):
    """lm_model_dir + max_ppl compose the x84 bigram-LM perplexity
    filter into the streaming gate: gibberish (high-ppl) documents
    are rejected, in-domain documents land, and short documents
    (NULL ppl) pass through to the rule gates."""
    import pytest

    from csvb_spark.operators.lm import bigram_lm_train
    from csvb_spark.streaming.ingest import run_streaming_ingest

    fluent = (
        "the cat sat on the mat and the dog slept in the sun while "
        "the birds sang in the trees of the garden"
    )
    train = spark.createDataFrame(
        [(i, fluent) for i in range(6)], "doc_id bigint, text string"
    )
    model_dir = str(tmp_path / "lm")
    bigram_lm_train(train).write.parquet(model_dir)

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": fluent, "lang": "en", "source": "a"},
        {
            "doc_id": 2,
            "text": "qqz wvx klm trp fgh bnj uio wer dsa zxc vbn mlp "
            "the and of to in is it more padding words here now",
            "lang": "en",
            "source": "a",
        },
    ]
    _write_batch(str(src / "b1.parquet"), rows)

    corpus = str(tmp_path / "corpus")
    run_streaming_ingest(
        spark,
        str(src),
        corpus,
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
        lm_model_dir=model_dir,
        max_ppl=15.0,
    )
    got = {r.doc_id for r in spark.read.parquet(corpus).select("doc_id").collect()}
    assert 1 in got and 2 not in got

    # the two LM-gate args must travel together
    with pytest.raises(ValueError, match="go together"):
        run_streaming_ingest(
            spark,
            str(src),
            corpus,
            str(tmp_path / "index2"),
            str(tmp_path / "ckpt2"),
            lm_model_dir=model_dir,
        )

    # decontam_unit validates loudly (and resolves k per unit — the
    # CLI `decontam` convention; a word-unit caller must not silently
    # get loose word-8-grams)
    with pytest.raises(ValueError, match="decontam_unit"):
        run_streaming_ingest(
            spark,
            str(src),
            corpus,
            str(tmp_path / "index3"),
            str(tmp_path / "ckpt3"),
            decontam_unit="sentence",
        )


def test_streaming_ingest_kn_gate(spark, sf_dir, tmp_path):
    """lm_smoothing='kn' routes the streaming LM gate through the
    Kneser-Ney scorer: the same fluent/gibberish split holds, and an
    unknown smoothing name is a loud error."""
    import pytest

    from csvb_spark.operators.lm import bigram_lm_train
    from csvb_spark.streaming.ingest import run_streaming_ingest

    fluent = (
        "the cat sat on the mat and the dog slept in the sun while "
        "the birds sang in the trees of the garden"
    )
    train = spark.createDataFrame(
        [(i, fluent) for i in range(6)], "doc_id bigint, text string"
    )
    model_dir = str(tmp_path / "lm_kn")
    bigram_lm_train(train).write.parquet(model_dir)

    src = tmp_path / "src_kn"
    src.mkdir()
    _write_batch(
        str(src / "b1.parquet"),
        [
            {"doc_id": 1, "text": fluent, "lang": "en", "source": "a"},
            {
                "doc_id": 2,
                "text": "qqz wvx klm trp fgh bnj uio wer dsa zxc vbn mlp "
                "the and of to in is it more padding words here now",
                "lang": "en",
                "source": "a",
            },
        ],
    )
    corpus = str(tmp_path / "corpus_kn")
    run_streaming_ingest(
        spark,
        str(src),
        corpus,
        str(tmp_path / "index_kn"),
        str(tmp_path / "ckpt_kn"),
        lm_model_dir=model_dir,
        max_ppl=20.0,  # fluent ppl ~2.06, gibberish ~46.7 (measured)
        lm_smoothing="kn",
    )
    got = {r.doc_id for r in spark.read.parquet(corpus).select("doc_id").collect()}
    assert 1 in got and 2 not in got

    with pytest.raises(ValueError, match="lm_smoothing"):
        run_streaming_ingest(
            spark,
            str(src),
            corpus,
            str(tmp_path / "index_kn2"),
            str(tmp_path / "ckpt_kn2"),
            lm_model_dir=model_dir,
            max_ppl=20.0,
            lm_smoothing="laplace",
        )


def test_ingest_kn_without_model_rejected(spark, tmp_path):
    """lm_smoothing='kn' without an LM model would be a silent no-op;
    it raises instead."""
    import pytest

    from csvb_spark.streaming.ingest import run_streaming_ingest

    with pytest.raises(ValueError, match="no-op"):
        run_streaming_ingest(
            spark,
            str(tmp_path),
            str(tmp_path / "c"),
            str(tmp_path / "i"),
            str(tmp_path / "k"),
            lm_smoothing="kn",
        )


def test_streaming_ingest_sb_gate(spark, tmp_path):
    """lm_smoothing='sb' routes the streaming LM gate through the
    stupid-backoff trigram scorer (model materialized ONCE for the
    stream); mismatched model shapes are loud errors both ways."""
    import pytest

    from csvb_spark.operators.lm import bigram_lm_train, trigram_lm_train
    from csvb_spark.streaming.ingest import run_streaming_ingest

    fluent = (
        "the cat sat on the mat and the dog slept in the sun while "
        "the birds sang in the trees of the garden"
    )
    train = spark.createDataFrame(
        [(i, fluent) for i in range(6)], "doc_id bigint, text string"
    )
    tri_dir = str(tmp_path / "lm_sb")
    trigram_lm_train(train).write.parquet(tri_dir)
    bi_dir = str(tmp_path / "lm_bi")
    bigram_lm_train(train).write.parquet(bi_dir)

    src = tmp_path / "src_sb"
    src.mkdir()
    _write_batch(
        str(src / "b1.parquet"),
        [
            {"doc_id": 1, "text": fluent, "lang": "en", "source": "a"},
            {
                "doc_id": 2,
                "text": "qqz wvx klm trp fgh bnj uio wer dsa zxc vbn mlp "
                "the and of to in is it more padding words here now",
                "lang": "en",
                "source": "a",
            },
        ],
    )
    corpus = str(tmp_path / "corpus_sb")
    run_streaming_ingest(
        spark,
        str(src),
        corpus,
        str(tmp_path / "index_sb"),
        str(tmp_path / "ckpt_sb"),
        lm_model_dir=tri_dir,
        max_ppl=50.0,  # fluent sppl = 1.0 (training text), gibberish >> 50
        lm_smoothing="sb",
    )
    got = {r.doc_id for r in spark.read.parquet(corpus).select("doc_id").collect()}
    assert 1 in got and 2 not in got

    with pytest.raises(ValueError, match="TRIGRAM"):
        run_streaming_ingest(
            spark, str(src), corpus,
            str(tmp_path / "i2"), str(tmp_path / "k2"),
            lm_model_dir=bi_dir, max_ppl=50.0, lm_smoothing="sb",
        )
    with pytest.raises(ValueError, match="BIGRAM"):
        run_streaming_ingest(
            spark, str(src), corpus,
            str(tmp_path / "i3"), str(tmp_path / "k3"),
            lm_model_dir=tri_dir, max_ppl=50.0, lm_smoothing="kn",
        )


def test_streaming_quota_single_batch_equals_batch(spark, tmp_path):
    """One micro-batch → the admission gate IS the batch operator's
    selection, row for row (including pick_rank)."""
    import pandas as pd

    from csvb_spark.operators.web import domain_quota_sample
    from csvb_spark.streaming.quota import run_streaming_quota

    src = tmp_path / "q_src1"
    src.mkdir()
    pdf = pd.DataFrame(
        {
            "doc_id": range(30),
            "url": [
                "http://Hot.example.com/p%d?utm_id=9" % i
                if i < 22
                else "https://cold%d.org/p/" % i
                for i in range(30)
            ],
        }
    )
    pdf.to_parquet(str(src / "b1.parquet"))
    got = sorted(
        map(
            tuple,
            run_streaming_quota(
                spark, str(src), quota=5, query_name="t_q1"
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            domain_quota_sample(
                spark.read.parquet(str(src)), quota=5
            ).collect(),
        )
    )
    assert got == want
    assert len([r for r in got if r[2] == "example.com"]) == 5


def test_streaming_quota_admission_across_batches(spark, tmp_path):
    """Across micro-batches: first-arrived wins, admitted rows are
    never evicted, the cumulative cap holds, and pick_rank keeps
    counting across batches."""
    import pandas as pd

    from csvb_spark.streaming.quota import run_streaming_quota

    src = tmp_path / "q_src2"
    src.mkdir()
    # batch 1: 3 hot docs (ids 0-2); batch 2: 4 more hot (ids 10-13)
    # with LOWER priorities than some of batch 1 — they must not evict
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "url": ["http://hot.example.com/a%d" % i for i in range(3)],
        }
    ).to_parquet(str(src / "b1.parquet"))
    pd.DataFrame(
        {
            "doc_id": [10, 11, 12, 13],
            "url": ["http://hot.example.com/b%d" % i for i in range(4)],
        }
    ).to_parquet(str(src / "b2.parquet"))
    out = run_streaming_quota(
        spark, str(src), quota=5, query_name="t_q2"
    ).collect()
    assert len(out) == 5
    ids = {r["doc_id"] for r in out}
    assert {0, 1, 2} <= ids  # batch-1 admissions all survive
    assert len(ids & {10, 11, 12, 13}) == 2  # only the remaining room
    assert sorted(r["pick_rank"] for r in out) == [1, 2, 3, 4, 5]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="quota"):
        run_streaming_quota(spark, str(src), quota=0)
    with _pytest.raises(ValueError, match="not in source"):
        run_streaming_quota(spark, str(src), url_col="nope")


def test_streaming_ingest_domain_quota_stage(spark, tmp_path):
    """The ingest's final admission stage caps per-domain keeps across
    micro-batches via the persisted increment table, and quality
    rejects never consume quota."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from csvb_spark.streaming.ingest import run_streaming_ingest

    def _write(path, rows):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "url": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            path,
        )
        time.sleep(0.05)
        os.utime(path)

    def good_text(i):
        # >= 64 chars, stopwords present, low punct → quality 1.0;
        # tokens mostly unique per doc → no near-dup collisions
        return "the and of to " + " ".join(f"w{i}x{j}" for j in range(20))

    hot = "http://hot.example.com/p%d"
    cold = "http://cold%d.org/p"
    src = tmp_path / "dq_src"
    src.mkdir()
    _write(
        str(src / "b1.parquet"),
        [(i, good_text(i), hot % i) for i in range(4)]
        + [(100, good_text(100), cold % 1)],
    )
    b2_hot_ids = [11, 12, 13]
    _write(
        str(src / "b2.parquet"),
        [(i, good_text(i), hot % i) for i in b2_hot_ids]
        + [(9002, "zzz zzz", hot % 9002)]  # quality reject, hot domain
        + [(101, good_text(101), cold % 2)],
    )

    corpus_dir = str(tmp_path / "dq_corpus")
    quota_dir = str(tmp_path / "dq_counts")
    run_streaming_ingest(
        spark,
        str(src),
        corpus_dir,
        str(tmp_path / "dq_index"),
        str(tmp_path / "dq_ckpt"),
        url_col="url",
        domain_quota=5,
        quota_dir=quota_dir,
    )
    got = {r.doc_id for r in spark.read.parquet(corpus_dir).collect()}
    assert {0, 1, 2, 3, 100, 101} <= got  # b1 hot under quota + colds
    assert 9002 not in got  # quality gate, and it must not count
    # room was 1: the admitted b2 hot doc is the priority minimum
    prio = lambda i: (i * 2654435761) % 4294967296  # noqa: E731
    expect = min(b2_hot_ids, key=lambda i: (prio(i), i))
    assert got & set(b2_hot_ids) == {expect}
    # the increment table sums to the admitted per-domain counts
    from pyspark.sql import functions as F

    counts = {
        r["domain"]: r["n"]
        for r in spark.read.parquet(quota_dir)
        .groupBy("domain")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert counts["example.com"] == 5
    assert counts["cold1.org"] == 1 and counts["cold2.org"] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="go together"):
        run_streaming_ingest(
            spark, str(src), corpus_dir, "i", "c", domain_quota=5
        )
    with _pytest.raises(ValueError, match="domain_quota"):
        run_streaming_ingest(
            spark, str(src), corpus_dir, "i", "c",
            url_col="url", domain_quota=0, quota_dir=quota_dir,
        )


def test_cli_ingest_domain_quota(spark, tmp_path):
    """The ingest CLI wires the quota trio through; partial flags
    reject loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from csvb_spark.cli import main

    src = tmp_path / "ciq_src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(6)), pa.int64()),
                "text": pa.array(
                    [
                        "the and of to " + " ".join(f"c{i}v{j}" for j in range(20))
                        for i in range(6)
                    ],
                    pa.string(),
                ),
                "url": pa.array(
                    ["http://one.site.com/p%d" % i for i in range(6)],
                    pa.string(),
                ),
            }
        ),
        str(src / "b1.parquet"),
    )
    corpus = str(tmp_path / "ciq_corpus")
    rc = main(
        [
            "ingest", "--source", str(src), "--corpus", corpus,
            "--index", str(tmp_path / "ciq_index"),
            "--checkpoint", str(tmp_path / "ciq_ckpt"),
            "--url-col", "url", "--domain-quota", "2",
            "--quota-dir", str(tmp_path / "ciq_counts"),
        ]
    )
    assert rc == 0
    assert spark.read.parquet(corpus).count() == 2  # capped at the quota

    with _pytest.raises(ValueError, match="go together"):
        main(
            [
                "ingest", "--source", str(src), "--corpus", corpus,
                "--index", str(tmp_path / "i2"),
                "--checkpoint", str(tmp_path / "c2"),
                "--domain-quota", "2",
            ]
        )


def test_streaming_ingest_jm_gate(spark, tmp_path):
    """lm_smoothing='jm' routes the streaming LM gate through the
    Jelinek-Mercer scorer: the fluent/gibberish split holds, and a
    trigram model is rejected by the shared shape check."""
    import pytest

    from csvb_spark.operators.lm import bigram_lm_train, trigram_lm_train
    from csvb_spark.streaming.ingest import run_streaming_ingest

    fluent = (
        "the cat sat on the mat and the dog slept in the sun while "
        "the birds sang in the trees of the garden"
    )
    train = spark.createDataFrame(
        [(i, fluent) for i in range(6)], "doc_id bigint, text string"
    )
    model_dir = str(tmp_path / "lm_jm")
    bigram_lm_train(train).write.parquet(model_dir)

    src = tmp_path / "src_jm"
    src.mkdir()
    _write_batch(
        str(src / "b1.parquet"),
        [
            {"doc_id": 1, "text": fluent, "lang": "en", "source": "a"},
            {
                "doc_id": 2,
                "text": "qqz wvx klm trp fgh bnj uio wer dsa zxc vbn mlp "
                "the and of to in is it more padding words here now",
                "lang": "en",
                "source": "a",
            },
        ],
    )
    corpus = str(tmp_path / "corpus_jm")
    run_streaming_ingest(
        spark,
        str(src),
        corpus,
        str(tmp_path / "index_jm"),
        str(tmp_path / "ckpt_jm"),
        lm_model_dir=model_dir,
        max_ppl=20.0,
        lm_smoothing="jm",
    )
    got = {r.doc_id for r in spark.read.parquet(corpus).select("doc_id").collect()}
    assert 1 in got and 2 not in got

    tri_dir = str(tmp_path / "lm_jm_tri")
    trigram_lm_train(train).write.parquet(tri_dir)
    with pytest.raises(ValueError, match="BIGRAM"):
        run_streaming_ingest(
            spark,
            str(src),
            corpus,
            str(tmp_path / "index_jm2"),
            str(tmp_path / "ckpt_jm2"),
            lm_model_dir=tri_dir,
            max_ppl=20.0,
            lm_smoothing="jm",
        )


def test_streaming_ingest_dsir_gate(spark, tmp_path):
    """dsir_weights_dir + dsir_min_avg compose the x131 DSIR
    importance gate into streaming ingest: weights pre-built from a
    batch corpus (train-filter shape) admit on-domain docs and reject
    off-domain ones, including docs whose features the weight build
    NEVER saw (the default-bucket row); the weight-table schema is
    validated loudly."""
    import pytest as _pytest

    from csvb_spark.operators.classify import dsir_bucket_weights
    from csvb_spark.streaming.ingest import run_streaming_ingest

    on = "physics energy momentum quantum field theory experiment result"
    off = "pizza recipe cheese tomato basil oven crust slice"
    # raw history: a couple of on-domain docs inside a larger varied
    # off-domain pool (the realistic shape — target features must be
    # RELATIVELY likelier under the target, not merely present)
    raw_hist = spark.createDataFrame(
        [(100 + i, on) for i in range(2)]
        + [(200 + i, f"{off} filler{i} extra{i} words{i} here{i}")
           for i in range(20)],
        "doc_id bigint, text string",
    )
    target = spark.createDataFrame(
        [(300 + i, on) for i in range(4)], "doc_id bigint, text string"
    )
    wdir = str(tmp_path / "dsir_w")
    dsir_bucket_weights(raw_hist, target, n_buckets=4096).write.parquet(wdir)

    docs = [
        {"doc_id": 0, "text": on, "lang": "en", "source": "web"},
        {"doc_id": 1, "text": off, "lang": "en", "source": "web"},
        # out-of-vocabulary doc: none of these features existed when
        # the weights were built — scored via the default bucket row
        {"doc_id": 2, "text": "zzqx wvut unseen gibberish tokens",
         "lang": "en", "source": "web"},
    ]
    src = tmp_path / "src_dsir"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), docs)

    out = str(tmp_path / "corpus_dsir")
    run_streaming_ingest(
        spark,
        str(src),
        out,
        str(tmp_path / "idx_dsir"),
        str(tmp_path / "ckpt_dsir"),
        min_quality=0.0,
        dsir_weights_dir=wdir,
        dsir_min_avg=0.2,
        dsir_n_buckets=4096,
    )
    got = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert 0 in got          # on-domain admitted (avg >> 0.2)
    assert 1 not in got      # off-domain rejected (negative avg)
    assert 2 not in got      # OOV doc: neutral default row -> avg 0 < 0.2

    with _pytest.raises(ValueError, match="go together"):
        run_streaming_ingest(
            spark, str(src), out, str(tmp_path / "i2"),
            str(tmp_path / "c2"), dsir_weights_dir=wdir,
        )

    # the `ingest` CLI wires the same gate
    from csvb_spark.cli import main

    out_cli = str(tmp_path / "corpus_dsir_cli")
    rc = main(
        [
            "ingest", "--source", str(src), "--corpus", out_cli,
            "--index", str(tmp_path / "idx_cli"),
            "--checkpoint", str(tmp_path / "ckpt_cli"),
            "--min-quality", "0.0",
            "--dsir-weights", wdir, "--dsir-min-avg", "0.2",
        ]
    )
    assert rc == 0
    got_cli = {
        r.doc_id for r in spark.read.parquet(out_cli).select("doc_id").collect()
    }
    assert got_cli == got
    bad = str(tmp_path / "not_weights")
    spark.range(3).write.parquet(bad)
    with _pytest.raises(ValueError, match="not a DSIR weight table"):
        run_streaming_ingest(
            spark, str(src), out, str(tmp_path / "i3"),
            str(tmp_path / "c3"), dsir_weights_dir=bad, dsir_min_avg=0.0,
        )


def test_streaming_ingest_decontamination_gate(spark, tmp_path):
    """decontam_eval_dir + decontam_min_shared compose x138's SBBF
    word table into streaming ingest: a document sharing long
    verbatim spans with the eval suite is rejected across batches, a
    clean document passes, and the gate is conservative — its Bloom
    counting can only OVER-count (no false negatives), so the
    rejected set is a superset of the exact contamination_check
    answer, which this test also verifies directly."""
    from pyspark.sql import functions as F

    from csvb_spark.operators.splits import contamination_check
    from csvb_spark.streaming.ingest import run_streaming_ingest

    leak = (
        "the quick brown fox jumps over the lazy dog while the band "
        "played on and the crowd watched in silence until dawn"
    )
    clean = (
        "completely unrelated prose about gardening tools and the "
        "maintenance of greenhouse irrigation systems in winter"
    )
    evdir = str(tmp_path / "eval_suite")
    spark.createDataFrame(
        [(900, leak), (901, "another held out benchmark question entirely")],
        "doc_id bigint, text string",
    ).write.parquet(evdir)

    docs = [
        # contains a verbatim eval span → many shared 8-grams
        {"doc_id": 0, "text": "prefix words then " + leak + " then suffix",
         "lang": "en", "source": "web"},
        {"doc_id": 1, "text": clean, "lang": "en", "source": "web"},
    ]
    src = tmp_path / "src_decontam"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), docs)

    out = str(tmp_path / "corpus_decontam")
    run_streaming_ingest(
        spark,
        str(src),
        out,
        str(tmp_path / "idx_decontam"),
        str(tmp_path / "ckpt_decontam"),
        min_quality=0.0,
        decontam_eval_dir=evdir,
        decontam_min_shared=10,
    )
    got = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert got == {1}, got

    # conservativeness cross-check vs the exact operator: every doc
    # the exact check finds contaminated is also gate-rejected
    exact = contamination_check(
        spark.createDataFrame(
            [(d["doc_id"], d["text"]) for d in docs], "doc_id bigint, text string"
        ),
        spark.read.parquet(evdir),
        k=8,
        min_shared=10,
    )
    exact_bad = {
        r.train_doc_id
        for r in exact.select("train_doc_id").distinct().collect()
    }
    assert exact_bad == {0}
    assert exact_bad.isdisjoint(got)

    # config validation: the pair must arrive together
    import pytest as _pytest

    with _pytest.raises(ValueError, match="go together"):
        run_streaming_ingest(
            spark,
            str(src),
            out,
            str(tmp_path / "idx2"),
            str(tmp_path / "ckpt2"),
            decontam_eval_dir=evdir,
        )


def test_streaming_gate_timers_measure_without_changing_accepts(
    spark, sf_dir, tmp_path
):
    """gate_timers (round 15): per-gate wall-clock is recorded once
    per micro-batch per enabled gate, every reading is non-negative,
    and the instrumented stream admits the SAME corpus as the
    uninstrumented one — timing shifts where the gate's keep-set is
    materialized, never what it contains."""
    from pyspark.sql import functions as F

    from csvb_spark.operators.lm import bigram_lm_train
    from csvb_spark.streaming.ingest import run_streaming_ingest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        "doc_id < 60"
    )
    src = tmp_path / "src"
    docs.repartition(2).write.parquet(str(src))
    lm_dir = str(tmp_path / "lm")
    bigram_lm_train(docs).write.parquet(lm_dir)
    evdir = str(tmp_path / "eval")
    docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text").write.parquet(evdir)

    def run(tag, timers):
        d = tmp_path / tag
        run_streaming_ingest(
            spark,
            str(src),
            str(d / "corpus"),
            str(d / "index"),
            str(d / "ckpt"),
            query_name=f"timers_{tag}",
            lm_model_dir=lm_dir,
            max_ppl=1e9,
            decontam_eval_dir=evdir,
            decontam_min_shared=1_000_000,
            gate_timers=timers,
        )
        return {
            r.doc_id
            for r in spark.read.parquet(str(d / "corpus"))
            .select("doc_id")
            .collect()
        }

    timers: dict[str, list[float]] = {}
    instrumented = run("on", timers)
    plain = run("off", None)
    assert instrumented == plain, "instrumentation must not change accepts"
    # the three enabled gates each record one reading per micro-batch
    assert set(timers) == {"quality", "lm", "decontam"}, timers
    n_batches = {len(v) for v in timers.values()}
    assert n_batches == {2}, timers
    assert all(x >= 0 for v in timers.values() for x in v), timers
