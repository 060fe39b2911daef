"""Probe: how much of a streaming micro-batch's cost is pure
plan CONSTRUCTION (py4j round trips building Column trees), vs
execution. Builds the gate chain + sink expressions over a static
batch-shaped DataFrame repeatedly and times construction alone
(no action), then times one full _accept_batch-equivalent pass.

Run: python plans/r16/probe_stream_construct.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from csvb_spark.session import get_session
from pyspark.sql import functions as F

spark = get_session(app_name="probe_stream_construct", master="local[8]", shuffle_partitions=8)
sf_dir = "/root/testdata/sf0.1"
docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(625).localCheckpoint()

from csvb_spark.operators import lm as L
from csvb_spark.operators import text as T
from csvb_spark.operators import dedup as D
from csvb_spark.streaming.ingest import _gate_chain

lm = L.bigram_lm_train(docs).localCheckpoint(eager=True)
stats = L.lm_model_stats(lm, "addk")

def construct_once():
    gated = _gate_chain(
        docs, "text", 0.5, lm_model=lm, max_ppl=1e9,
        lm_smoothing="addk", lm_model_stats=stats,
    )
    red = gated.withColumn("redacted", T.pii_redact_col(F.col("text"))).drop("quality_score")
    ded = D.exact_dedup(red, "text")
    bands = D.minhash_bands(ded, "text", 16, 4)
    return gated, ded, bands

# warm
construct_once()

n = 10
t0 = time.perf_counter()
for _ in range(n):
    construct_once()
t_construct = (time.perf_counter() - t0) / n
print(f"gate-chain+sink plan construction: {t_construct*1000:.1f} ms/batch")

# break construction down per stage
stages = {
    "quality_score": lambda: T.quality_score(docs, "text").select("doc_id", "quality_score"),
    "perplexity_score": lambda: L.perplexity_score(docs, lm, text_col="text", broadcast_model=True, model_materialized=True, model_stats=stats),
    "pii_redact_col": lambda: docs.withColumn("redacted", T.pii_redact_col(F.col("text"))),
    "exact_dedup": lambda: D.exact_dedup(docs, "text"),
    "minhash_bands": lambda: D.minhash_bands(docs, "text", 16, 4),
}
for name, fn in stages.items():
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    print(f"  {name}: {(time.perf_counter()-t0)/n*1000:.1f} ms")

spark.stop()
