"""Plan-shape pins for the streaming-ingest gate composition
(round 14, VERDICT r13 items 7+8).

Two rules the round-13 streaming bench earned the hard way, now
regression-pinned so no refactor re-learns them at 128 s/stream:

1. **Shared-scan rule** (item 7): ``_accept_batch`` persists the
   micro-batch, so every gate's tokenize/shingle pass reads ONE
   in-memory relation — the gate chain's physical plan contains zero
   file scans and one InMemoryTableScan per gate consumer.
2. **Build-side rule** (item 8): every gate scores ``batch`` — the
   materialized relation — never the evolving ``gated`` chain. A gate
   probing a downstream DataFrame splices the whole upstream semi-join
   chain into its own build lineage and re-executes it once per
   consumer (the 128 s → 24 s decontam fix).
"""

from __future__ import annotations

import pytest

from csvb_spark.plans.lint import physical_plan as _plan


@pytest.fixture(scope="module")
def gate_models(spark, sf_dir):
    """LM model + SBBF eval word table + DSIR weights, materialized
    once the way run_streaming_ingest does (localCheckpoint before the
    stream starts)."""
    from pyspark.sql import functions as F

    from csvb_spark.operators.classify import dsir_bucket_weights
    from csvb_spark.operators.lm import bigram_lm_train
    from csvb_spark.operators.splits import sbbf_eval_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = bigram_lm_train(docs).localCheckpoint(eager=True)
    words, n_words = sbbf_eval_filter(
        docs.filter(F.col("doc_id") % 50 == 0), text_col="text", k=8
    )
    words = words.localCheckpoint(eager=True)
    dsir = (
        dsir_bucket_weights(
            docs.filter(F.col("doc_id") % 7 == 0), docs, n_buckets=1 << 12
        )
        .select("bucket", "log_weight")
        .localCheckpoint(eager=True)
    )
    return lm, words, n_words, dsir


def _full_chain(batch, gate_models):
    from csvb_spark.streaming.ingest import _gate_chain

    lm, words, n_words, dsir = gate_models
    return _gate_chain(
        batch,
        "text",
        0.0,
        lm_model=lm,
        max_ppl=1e18,
        dsir_weights=dsir,
        dsir_min_avg=-1e18,
        dsir_n_buckets=1 << 12,
        decontam_words=words,
        decontam_n_words=n_words,
        decontam_min_shared=1_000_000_000,
    )


def _live_file_scans(plan: str) -> list[str]:
    """File-scan lines that are NOT part of an InMemoryRelation's
    cache recipe (the recipe subtree prints under every cached scan —
    those nodes never execute once the cache is populated)."""
    bad: list[str] = []
    # (indent, is_imr) stack of ancestors in the simple-mode tree
    stack: list[tuple[int, bool]] = []
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-*")
        if not stripped:
            continue
        indent = len(line) - len(stripped)
        while stack and stack[-1][0] >= indent:
            stack.pop()
        if "FileScan" in line or "Scan parquet" in line:
            if not any(is_imr for _, is_imr in stack):
                bad.append(line.strip())
        stack.append((indent, "InMemoryRelation" in line))
    return bad


def test_live_file_scan_detector_self_check(spark, sf_dir):
    """The detector itself must see an UNCACHED scan as live — a
    helper that exempts everything would green-light the exact
    regression the shared-scan test exists to catch."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert _live_file_scans(_plan(docs, mode="simple"))
    cached = docs.limit(10).persist()
    try:
        cached.count()
        assert not _live_file_scans(_plan(cached, mode="simple"))
    finally:
        cached.unpersist()


def test_gate_chain_reads_only_the_cached_batch(spark, sf_dir, gate_models):
    """Shared-scan rule: with the micro-batch persisted (exactly what
    _accept_batch does first), the full gate chain's physical plan has
    NO live file scan — every gate consumer reads the one cached
    relation (the only FileScan text allowed is the InMemoryRelation's
    printed cache recipe, which never executes). The gate models are
    checkpointed RDD scans, so a live file scan here means some gate
    re-reads the source per consumer again."""
    batch = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100).persist()
    )
    try:
        batch.count()
        plan = _plan(_full_chain(batch, gate_models), mode="simple")
        assert "InMemoryTableScan" in plan, plan[:2000]
        live = _live_file_scans(plan)
        assert not live, f"live file scans inside the gate chain: {live}"
        # one cached-batch scan per gate consumer: quality + LM + DSIR
        # + decontam + the gated base itself
        assert plan.count("InMemoryTableScan") >= 4, plan.count(
            "InMemoryTableScan"
        )
    finally:
        batch.unpersist()


def test_every_gate_scores_the_batch_not_the_chain(
    spark, sf_dir, gate_models, monkeypatch
):
    """Build-side rule: spy on each gate's scoring entry point and
    assert the DataFrame it receives IS the micro-batch object — not
    ``gated`` or any other derived frame. Fails the moment a gate is
    rewired to probe a downstream DataFrame (the round-13 decontam
    regression, caught then by a 5x whole-stream slowdown, caught now
    here)."""
    from csvb_spark.operators import classify as C
    from csvb_spark.operators import lm as L
    from csvb_spark.operators import splits as S
    from csvb_spark.operators import text as T

    seen: dict[str, object] = {}

    def spy(mod, name):
        real = getattr(mod, name)

        def wrapper(df, *a, **kw):
            seen[name] = df
            return real(df, *a, **kw)

        monkeypatch.setattr(mod, name, wrapper)

    spy(T, "quality_score")
    spy(L, "perplexity_score")
    spy(C, "dsir_score_with_weights")
    spy(S, "sbbf_gram_hits")

    batch = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    _full_chain(batch, gate_models)
    for name in (
        "quality_score",
        "perplexity_score",
        "dsir_score_with_weights",
        "sbbf_gram_hits",
    ):
        assert seen.get(name) is batch, (
            f"{name} scored a derived DataFrame, not the micro-batch"
        )
