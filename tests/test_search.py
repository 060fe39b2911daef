"""Unit + plan tests for the round-4 operators: line-level dedup,
DSIR importance weights, BM25 lexical search, reciprocal-rank fusion.

The differential oracles (x53-x56 in test_oracle.py) prove the math
against DuckDB on the fixture corpus; these tests pin the EDGE
semantics the fixture can't reach (empty docs, all-boilerplate docs,
absent targets, disjoint ranked lists) and the plan shapes that make
the operators scale (broadcast stats, no cartesian over the corpus).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from csvb_spark.operators import dedup, search, text


def _plan(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)  # noqa: SLF001


# --- line_dedup ---------------------------------------------------------


def _line_docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="keep me\nshared banner\nunique tail"),
            Row(doc_id=2, text="shared banner\nother content"),
            Row(doc_id=3, text="shared banner"),
            Row(doc_id=4, text="solo document"),
        ]
    )


def test_line_dedup_newline_default(spark):
    out = {
        r["doc_id"]: r
        for r in dedup.line_dedup(_line_docs(spark), min_docs=2).collect()
    }
    assert out[1]["clean_text"] == "keep me\nunique tail"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 2)
    assert out[2]["clean_text"] == "other content"
    # every line boilerplate -> empty doc survives with clean_text ''
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (1, 0)
    assert out[4]["clean_text"] == "solo document"


def test_line_dedup_min_docs_threshold(spark):
    # min_docs=3: 'shared banner' appears in exactly 3 docs -> still cut;
    # raising to 4 keeps everything.
    out3 = {
        r["doc_id"]: r["clean_text"]
        for r in dedup.line_dedup(_line_docs(spark), min_docs=3).collect()
    }
    assert out3[3] == ""
    out4 = {
        r["doc_id"]: r["clean_text"]
        for r in dedup.line_dedup(_line_docs(spark), min_docs=4).collect()
    }
    assert out4[3] == "shared banner"


def test_line_dedup_counts_distinct_docs_not_occurrences(spark):
    # The same line 3x inside ONE doc is repetition, not cross-doc
    # boilerplate: distinct-doc counting must keep it.
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="echo\necho\necho"), Row(doc_id=2, text="other")]
    )
    out = {
        r["doc_id"]: r for r in dedup.line_dedup(docs, min_docs=2).collect()
    }
    assert out[1]["clean_text"] == "echo\necho\necho"
    assert out[1]["n_kept"] == 3


def test_line_dedup_wide_keys_same_result(spark):
    narrow = dedup.line_dedup(_line_docs(spark), min_docs=2).collect()
    wide = dedup.line_dedup(
        _line_docs(spark), min_docs=2, wide_gram_keys=True
    ).collect()
    assert sorted(map(tuple, narrow)) == sorted(map(tuple, wide))


# --- dsir_weights -------------------------------------------------------


def test_dsir_no_target_docs_scores_zero(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c", lang="fr"), Row(doc_id=2, text="a b", lang="fr")]
    )
    rows = text.dsir_weights(docs, target=F.col("lang") == "en").collect()
    assert all(r["weight"] == 0.0 for r in rows)
    assert all(r["target_hits"] == 0 for r in rows)


def test_dsir_target_doc_overweighted(spark):
    # Doc 1's bigrams ARE the target distribution -> weight > 1;
    # doc 3 shares nothing with the target -> weight < 1 side of it.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="good clean prose here", lang="en"),
            Row(doc_id=2, text="good clean prose here", lang="fr"),
            Row(doc_id=3, text="zz yy xx ww", lang="fr"),
        ]
    )
    out = {
        r["doc_id"]: r["weight"]
        for r in text.dsir_weights(docs, target=F.col("lang") == "en").collect()
    }
    assert out[1] > 1.0
    assert out[2] == out[1]  # identical text -> identical weight
    assert out[3] < out[1]


def test_dsir_single_token_doc_zero_bigrams(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="solo", lang="en"), Row(doc_id=2, text="a b", lang="en")]
    )
    out = {r["doc_id"]: r for r in text.dsir_weights(docs, F.col("lang") == "en").collect()}
    assert out[1]["n_bigrams"] == 0
    assert out[1]["weight"] == 0.0


# --- bm25_topk ----------------------------------------------------------


def test_bm25_rewards_rarity_and_tf(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark common"),
            Row(doc_id=2, text="spark common"),
            Row(doc_id=3, text="common common filler filler"),
            Row(doc_id=4, text="filler filler filler filler"),
        ]
    )
    rows = search.bm25_topk(docs, ["spark", "common"], k=10).collect()
    assert [r["doc_id"] for r in rows][:2] == [1, 2]  # rare term dominates
    assert rows[0]["n_terms"] == 2
    by_id = {r["doc_id"]: r for r in rows}
    assert 3 in by_id and 4 not in by_id  # no query term -> absent


def test_bm25_k_truncates_with_id_tiebreak(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="same text here") for i in range(5)]
    )
    rows = search.bm25_topk(docs, ["same"], k=3).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]


def test_bm25_plan_broadcasts_stats_no_corpus_cartesian(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(search.bm25_topk(docs, ["spark", "query"], k=10))
    # corpus stats and df table ride broadcast exchanges; the top-k is
    # TakeOrderedAndProject, never a global sort
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# --- rrf_fuse -----------------------------------------------------------


def test_rrf_fuses_disjoint_and_overlapping_lists(spark):
    a = spark.createDataFrame(
        [Row(doc_id=1, score=9.0), Row(doc_id=2, score=5.0)]
    )
    b = spark.createDataFrame(
        [Row(doc_id=2, score=0.7), Row(doc_id=3, score=0.6)]
    )
    rows = search.rrf_fuse([a, b], k=10, id_col="doc_id", score_col="score").collect()
    by_id = {r["doc_id"]: r for r in rows}
    # doc 2: rank 2 in a, rank 1 in b -> 1/62 + 1/61
    assert by_id[2]["n_lists"] == 2
    assert abs(by_id[2]["rrf"] - (round(1 / 62, 6) + round(1 / 61, 6))) < 1e-9
    assert by_id[1]["n_lists"] == 1
    # overlap beats either single-list doc
    assert rows[0]["doc_id"] == 2


def test_rrf_rank_ties_break_by_id(spark):
    a = spark.createDataFrame([Row(doc_id=7, score=1.0), Row(doc_id=3, score=1.0)])
    rows = search.rrf_fuse([a], k=2, id_col="doc_id", score_col="score").collect()
    by_id = {r["doc_id"]: r["rrf"] for r in rows}
    assert by_id[3] > by_id[7]  # lower id gets the better rank on ties


def test_rrf_rejects_unbounded_input(spark):
    """The single-partition ranking window is safe only for pre-top-k'd
    lists; the bounded-input contract is enforced, not conventioned."""
    import pytest

    big = spark.range(0, 50).selectExpr("id AS doc_id", "CAST(id AS DOUBLE) AS score")
    ok = spark.range(0, 3).selectExpr("id AS doc_id", "CAST(id AS DOUBLE) AS score")
    # the bound rides the plan (no eager double-execution of the
    # inputs), so the violation surfaces when the fusion RUNS
    with pytest.raises(Exception, match="max_list_rows"):
        search.rrf_fuse([ok, big], k=5, max_list_rows=10).collect()
    # raising the bound explicitly re-admits the same input
    rows = search.rrf_fuse([ok, big], k=5, max_list_rows=100).collect()
    assert len(rows) == 5


def test_bm25_log_idf_matches_python_reference(spark):
    """idf='log' reproduces Lucene-standard BM25 (ln(1 + ratio) idf):
    per-doc scores match an independent Python implementation and the
    multi-term ranking differs from the ratio variant's amplification
    where expected."""
    import math

    corpus = {
        1: "rare common common tail",
        2: "common common common common tail",
        3: "rare rare tail",
        4: "tail tail tail common",
        5: "common tail",
    }
    terms = ["rare", "common"]
    k1, b = 1.2, 0.75
    n = len(corpus)
    dls = {i: len(t.split()) for i, t in corpus.items()}
    avgdl = sum(dls.values()) / n
    df = {
        t: sum(1 for txt in corpus.values() if t in txt.split()) for t in terms
    }

    def py_score(i):
        s = 0.0
        for t in terms:
            tf = corpus[i].split().count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += round(
                idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1 - b + (b * dls[i]) / avgdl))),
                6,
            )
        return round(s, 6)

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in corpus.items()]
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in search.bm25_topk(docs, terms, k=10, idf="log").collect()
    }
    for i in corpus:
        if py_score(i):
            assert abs(got[i] - py_score(i)) < 1e-9, (i, got[i], py_score(i))

    import pytest

    with pytest.raises(ValueError, match="idf"):
        search.bm25_topk(docs, terms, idf="nope")


# --- gopher_rules (lives here with the other round-4 text ops) ----------


def test_gopher_rules_fire_individually(spark):
    docs = spark.createDataFrame(
        [
            # 1: healthy doc — passes everything (mean word length 4.0)
            Row(
                doc_id=1,
                text="the cheerful animals and keepers sat in a warm it is sunny today",
            ),
            # 2: too short
            Row(doc_id=2, text="the a of"),
            # 3: symbol-heavy (### per word)
            Row(doc_id=3, text="# # # # # # the a of to in is it and word"),
            # 4: bullet-dominated lines
            Row(doc_id=4, text="- the a\n- of to\n- in is\n- it and"),
            # 5: ellipsis-ended lines
            Row(doc_id=5, text="the a of...\nto in is...\nit and..."),
            # 6: numeric-only words (alpha fraction fails)
            Row(doc_id=6, text="1 2 3 4 5 6 7 8 9 10 11 the a"),
            # 7: no stopwords
            Row(doc_id=7, text="lorem ipsum dolor sit amet consectetur xyzzy"),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in text.gopher_rules(docs, min_words=5).collect()
    }
    assert out[1]["keep"]
    assert not out[2]["r_word_count"]
    assert not out[3]["r_symbol_ratio"]
    assert not out[4]["r_bullet_lines"]
    assert not out[5]["r_ellipsis_lines"]
    assert not out[6]["r_alpha_words"]
    assert not out[7]["r_stopwords"] and not out[7]["keep"]


def test_gopher_mean_word_len_is_integer_exact(spark):
    # mean word length bounds use integer cross-multiplication: a doc of
    # 2-char words (mean 2 < 3) fails; 3-char words pass exactly at the
    # boundary.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="ab cd ef gh ij kl"),
            Row(doc_id=2, text="the and the and the and"),
        ]
    )
    out = {
        r["doc_id"]: r["r_mean_word_len"]
        for r in text.gopher_rules(docs, min_words=1).collect()
    }
    assert out[1] is False
    assert out[2] is True


# --- product quantization ------------------------------------------------


def test_pq_train_equals_kmeans_on_each_slice(spark, sf_dir):
    """pq_train IS kmeans_train per subspace slice — same rows."""
    from csvb_spark.operators import similarity as sim

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = sim.pq_train(embs, m=4, k=4, iters=1)
    got = {
        (r["s"], r["cid"], r["pos"]): r["val"] for r in cb.collect()
    }
    for s in range(4):
        sl = embs.select(
            "vec_id",
            F.slice(
                F.transform("embedding", lambda x: x.cast("double")),
                s * 16 + 1,
                16,
            ).alias("embedding"),
        )
        ref = sim.kmeans_train(sl, k=4, iters=1)
        for r in ref.collect():
            assert got[(s, r["cid"], r["pos"])] == r["val"]


def test_pq_encode_emits_dense_codes_and_validates(spark, sf_dir):
    import pytest as _pytest

    from csvb_spark.operators import similarity as sim

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = sim.pq_seeded_codebook(m=4, k=4, sub=16, seed=11)
    codes = sim.pq_encode(embs, cb)
    assert codes.columns == ["vec_id", "code_0", "code_1", "code_2", "code_3"]
    stats = codes.agg(
        *[F.min(f"code_{s}").alias(f"lo{s}") for s in range(4)],
        *[F.max(f"code_{s}").alias(f"hi{s}") for s in range(4)],
    ).collect()[0]
    for s in range(4):
        assert 0 <= stats[f"lo{s}"] and stats[f"hi{s}"] <= 3

    # non-dense cids rejected (ADC lookup indexes by code value)
    bad = {(0, 1): [0.0] * 16, (0, 3): [1.0] * 16}
    with _pytest.raises(ValueError, match="non-dense"):
        sim.pq_encode(embs, bad)


def test_pq_adc_plan_is_lookup_only(spark, sf_dir):
    """The ADC scan must contain no join and end in
    TakeOrderedAndProject — per-row work is m array lookups."""
    from csvb_spark.operators import similarity as sim

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = sim.pq_seeded_codebook(m=4, k=4, sub=16, seed=11)
    plan = _plan(
        sim.pq_adc_topk(embs, embs.filter(F.col("vec_id") == 0), cb, k=10)
    )
    assert "TakeOrderedAndProject" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in plan


def test_ivfpq_prunes_and_scores_by_residual_codes(spark, sf_dir):
    """IVF-PQ must only emit rows from the probe's nprobe cells, with
    a no-join lookup scan over the codes (plan-asserted), and raising
    nprobe to n_centroids must recover at least the pruned result's
    coverage."""
    from csvb_spark.operators import similarity as sim

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = embs.filter(F.col("vec_id") == 0)
    cb = sim.pq_seeded_codebook(m=4, k=4, sub=16, seed=11, scale=0.1)

    pruned = sim.ivfpq_topk(embs, probe, cb, k=500, n_centroids=8, nprobe=2)
    full = sim.ivfpq_topk(embs, probe, cb, k=500, n_centroids=8, nprobe=8)
    assert pruned.count() < full.count() == embs.count() - 1

    plan = _plan(sim.ivfpq_topk(embs, probe, cb, k=10, n_centroids=8, nprobe=2))
    assert "TakeOrderedAndProject" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in plan


def test_ivfpq_requires_seed_centroid_ids(spark, sf_dir):
    import pytest as _pytest

    from csvb_spark.operators import similarity as sim

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") >= 4
    )
    cb = sim.pq_seeded_codebook(m=4, k=4, sub=16, seed=11, scale=0.1)
    with _pytest.raises(ValueError, match="seed centroids"):
        sim.ivfpq_topk(
            embs, embs.filter(F.col("vec_id") == 4), cb, n_centroids=8
        )


def test_pq_empty_probe_raises_clearly(spark, sf_dir):
    """An empty probe DataFrame must raise ValueError('empty probe'),
    not TypeError on a None row."""
    import pytest as _pytest

    from csvb_spark.operators import similarity as sim

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nobody = embs.filter(F.col("vec_id") < 0)
    cb = sim.pq_seeded_codebook(m=4, k=4, sub=16, seed=11, scale=0.1)
    with _pytest.raises(ValueError, match="empty probe"):
        sim.pq_adc_topk(embs, nobody, cb, k=5)
    with _pytest.raises(ValueError, match="empty probe"):
        sim.ivfpq_topk(embs, nobody, cb, k=5, n_centroids=8, nprobe=2)


# --- randomized differentials vs plain-Python references ----------------


def test_line_dedup_matches_python_reference_on_random_corpora(spark):
    """Seeded random corpora (short line alphabet → heavy cross-doc
    collisions) must agree with a direct Python implementation:
    distinct-doc counting, greedy keep, order-preserving reassembly."""
    import random

    from pyspark.sql import Row

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        lines_pool = [f"line{i}" for i in range(8)]
        docs = [
            (i, "\n".join(rng.choice(lines_pool) for _ in range(rng.randint(1, 6))))
            for i in range(30)
        ]
        # python reference
        from collections import defaultdict

        docs_of = defaultdict(set)
        for i, t in docs:
            for ln in t.split("\n"):
                docs_of[ln].add(i)
        frequent = {ln for ln, ds in docs_of.items() if len(ds) >= 2}
        expect = {
            i: "\n".join(ln for ln in t.split("\n") if ln not in frequent)
            for i, t in docs
        }
        df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
        got = {
            r["doc_id"]: r["clean_text"]
            for r in dedup.line_dedup(df, min_docs=2).collect()
        }
        assert got == expect, f"seed {seed}"


def test_dsir_weights_match_python_reference(spark):
    """Random corpus: integer hit counts and the aggregate-ratio
    weight must equal a direct Python computation."""
    import random
    from collections import Counter

    from pyspark.sql import Row

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (
            i,
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8))),
            rng.choice(["en", "fr"]),
        )
        for i in range(40)
    ]
    raw, tgt = Counter(), Counter()
    grams_of = {}
    for i, t, lang in docs:
        w = t.split()
        gs = [f"{w[j]} {w[j+1]}" for j in range(len(w) - 1)]
        grams_of[i] = gs
        raw.update(gs)
        if lang == "en":
            tgt.update(gs)
    raw_total, tgt_total = sum(raw.values()), sum(tgt.values())
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang) for i, t, lang in docs]
    )
    got = {
        r["doc_id"]: r
        for r in text.dsir_weights(df, F.col("lang") == "en").collect()
    }
    for i, _, _ in docs:
        gs = grams_of[i]
        t_hits = sum(tgt[g] for g in gs)
        r_hits = sum(raw[g] for g in gs)
        assert got[i]["target_hits"] == t_hits
        assert got[i]["raw_hits"] == r_hits
        if r_hits and tgt_total:
            expect = round((t_hits * float(raw_total)) / (r_hits * float(tgt_total)), 6)
            assert abs(got[i]["weight"] - expect) < 1e-9
        else:
            assert got[i]["weight"] == 0.0
