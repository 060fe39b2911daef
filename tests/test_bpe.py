"""Unit tests for the distributed BPE trainer + segmenter.

The x57 differential oracle replays full training in DuckDB; these
tests pin the algorithmic edges the fixture can't isolate: the
classic textbook merge sequence, repeated-symbol runs (greedy
non-overlap), deterministic tie-breaks, early stop, and
trainer/segmenter agreement.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from csvb_spark.operators import bpe


def _train(spark, rows, n):
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(rows)])
    return bpe.bpe_train(docs, n_merges=n).orderBy("step").collect()


def test_bpe_textbook_sequence(spark):
    # the Sennrich et al. running example shape: es -> est dominate
    rows = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
    ]
    m = _train(spark, rows, 2)
    assert (m[0]["left"], m[0]["right"]) == ("e", "s")
    assert m[0]["pair_count"] == 9
    assert (m[1]["left"], m[1]["right"]) == ("es", "t")
    assert m[1]["pair_count"] == 9


def test_bpe_repeated_symbol_run_nonoverlapping(spark):
    # 'aaaa' has 3 adjacent (a,a) occurrences but greedy left-to-right
    # merges only 2 non-overlapping ones; after the merge the word is
    # [aa, aa] so step 2 must see exactly one (aa, aa) pair.
    m = _train(spark, ["aaaa"], 2)
    assert (m[0]["left"], m[0]["right"], m[0]["pair_count"]) == ("a", "a", 3)
    assert (m[1]["left"], m[1]["right"], m[1]["pair_count"]) == ("aa", "aa", 1)


def test_bpe_odd_run_leaves_tail(spark):
    # 'aaa aaa' -> each word merges to [aa, a]; step 2's best pair is
    # (aa, a) with count 2.
    m = _train(spark, ["aaa aaa"], 2)
    assert (m[1]["left"], m[1]["right"], m[1]["pair_count"]) == ("aa", "a", 2)


def test_bpe_tie_breaks_lexicographically(spark):
    # 'ab' and 'aa' each appear twice: pairs (a,b)=2 and (a,a)=2 tie;
    # (a,a) < (a,b) lexicographically.
    m = _train(spark, ["ab ab aa aa"], 1)
    assert (m[0]["left"], m[0]["right"]) == ("a", "a")


def test_bpe_early_stop_when_no_pairs(spark):
    # single-char words only: zero adjacent pairs, trainer returns empty
    m = _train(spark, ["a b c a b"], 3)
    assert m == []


def test_bpe_segment_matches_training_state(spark):
    # applying the learned merges reproduces a lossless segmentation
    # whose pieces are exactly chars + learned merge outputs
    rows = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
    ]
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(rows)])
    mt = bpe.bpe_train(docs, n_merges=4).orderBy("step").collect()
    merges = [(r["left"], r["right"]) for r in mt]
    vocab = {r["left"] + r["right"] for r in mt}
    out = bpe.bpe_segment(docs, merges).collect()
    for r in out:
        # lossless: concatenating pieces reproduces the text minus spaces
        src = next(t for i, t in enumerate(rows) if i == r["doc_id"])
        assert "".join(r["pieces"]) == src.replace(" ", "")
        assert r["n_pieces"] == len(r["pieces"])
        for p in r["pieces"]:
            assert len(p) == 1 or p in vocab


def test_bpe_segment_rank_greedy_order(spark):
    # merges applied by rank: with merges [(a,b), (ab,c)] the word
    # 'abc' becomes [abc]; with only [(b,c)] it becomes [a, bc].
    docs = spark.createDataFrame([Row(doc_id=1, text="abc")])
    out1 = bpe.bpe_segment(docs, [("a", "b"), ("ab", "c")]).collect()[0]
    assert out1["pieces"] == ["abc"]
    out2 = bpe.bpe_segment(docs, [("b", "c")]).collect()[0]
    assert out2["pieces"] == ["a", "bc"]


def test_bpe_segment_empty_and_whitespace(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="  x  ")]
    )
    out = {r["doc_id"]: r for r in bpe.bpe_segment(docs, [("x", "y")]).collect()}
    assert out[1]["pieces"] == []
    assert out[2]["pieces"] == ["x"]


def test_merge_pair_fold_matches_python_reference(spark):
    """The higher-order merge fold must agree with a straightforward
    Python implementation of greedy left-to-right non-overlapping
    merging on randomized symbol arrays (seeded — deterministic),
    including adversarial cases: runs of equal symbols, pairs whose
    concatenation collides with an existing symbol, and no-op pairs."""
    import random

    rng = random.Random(20260814)
    alphabet = ["a", "b", "ab", "aa", "ba"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randint(0, 10))]
        for _ in range(300)
    ]
    pairs = [("a", "a"), ("a", "b"), ("ab", "b"), ("b", "a"), ("aa", "ab")]

    def py_merge(s, l, r):
        out = []
        j = 0
        while j < len(s):
            if j + 1 < len(s) and s[j] == l and s[j + 1] == r:
                out.append(l + r)
                j += 2
            else:
                out.append(s[j])
                j += 1
        return out

    from pyspark.sql import Row

    rows = [
        Row(case_id=i * len(pairs) + k, syms=c, l=p[0], r=p[1])
        for i, c in enumerate(cases)
        for k, p in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows)
    # one job for all (case, pair) combos: apply the fold per distinct pair
    got = {}
    for l, r in pairs:
        sub = df.filter((F.col("l") == l) & (F.col("r") == r)).select(
            "case_id", bpe._merge_pair(F.col("syms"), l, r).alias("m")
        )
        got.update({row["case_id"]: row["m"] for row in sub.collect()})
    for row in rows:
        assert got[row.case_id] == py_merge(row.syms, row.l, row.r), (
            row.syms,
            row.l,
            row.r,
        )


def test_bpe_driver_and_distributed_paths_identical(spark):
    """The driver-local merge loop and the all-Spark loop must produce
    bit-identical merge tables (count ties, repeated-symbol runs,
    multi-word corpus)."""
    rows = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
        "aaaa aaa ab ab aa aa",
    ]
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(rows)])
    local = [
        tuple(r)
        for r in bpe.bpe_train(docs, n_merges=8, distributed=False)
        .orderBy("step")
        .collect()
    ]
    dist = [
        tuple(r)
        for r in bpe.bpe_train(docs, n_merges=8, distributed=True)
        .orderBy("step")
        .collect()
    ]
    assert local == dist
    assert len(local) == 8


def test_bpe_many_merges_is_fast(spark):
    """The driver-local path must train a real merge budget in seconds
    — the scale-honesty contract (no Spark job pair per merge)."""
    import time

    rows = [
        "the quick brown fox jumps over the lazy dog " * 3,
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "how vexingly quick daft zebras jump",
    ] * 5
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(rows)])
    t0 = time.monotonic()
    m = bpe.bpe_train(docs, n_merges=60).orderBy("step").collect()
    elapsed = time.monotonic() - t0
    assert len(m) == 60
    assert elapsed < 30, f"60 merges took {elapsed:.1f}s"
    # merges are well-formed: counts positive, steps contiguous
    assert [r["step"] for r in m] == list(range(1, 61))
    assert all(r["pair_count"] > 0 for r in m)


def test_bpe_driver_vocab_limit_enforced(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta epsilon")]
    )
    import pytest

    with pytest.raises(ValueError, match="driver_vocab_limit"):
        bpe.bpe_train(docs, n_merges=2, distributed=False, driver_vocab_limit=2)
    # auto mode falls back to the distributed loop instead of raising
    m = bpe.bpe_train(docs, n_merges=1, driver_vocab_limit=2).collect()
    assert len(m) == 1


def test_bpe_pieces_feed_sequence_packing(spark):
    """Tokenizer-aware packing: count tokens with the TRAINED BPE
    segmentation (not whitespace), then pack — the composition a real
    pretraining pipeline runs. BPE compresses each doc's token count,
    so the same budget packs more docs per sequence than whitespace
    counting would."""
    from csvb_spark.operators.splits import pack_sequences

    rows = [
        Row(doc_id=i, source="s", text="low low lower newest widest")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows)
    mt = bpe.bpe_train(docs, n_merges=4).orderBy("step").collect()
    merges = [(r["left"], r["right"]) for r in mt]
    pieces = bpe.bpe_segment(docs, merges).withColumn("source", F.lit("s"))
    n_pieces = pieces.first()["n_pieces"]
    assert n_pieces < len("low low lower newest widest".replace(" ", ""))

    packed = pack_sequences(pieces, F.col("n_pieces"), budget=2 * n_pieces)
    got = {r["doc_id"]: r for r in packed.collect()}
    # exactly two docs per sequence: doc i starts in sequence i // 2
    for i in range(6):
        assert got[i]["seq_id"] == i // 2, got[i]
