"""csvb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of akesling/csvb.

The reference (csvb) is a thin Rust shell around Apache DataFusion 44:
it registers CSV files as SQL tables, executes arbitrary SQL, serves
the Postgres wire protocol, and federates Postgres shards behind a
UNION-ALL virtual table (see SURVEY.md). This package re-expresses
that capability Spark-first:

- ``csvb_spark.session``   — SparkSession factory (memory budget, AQE,
  Arrow, UTC session timezone). Mirrors ``CsvbCore::new``
  (reference: csvb_engine/src/lib.rs:19-31).
- ``csvb_spark.sources``   — CSV multi-path registration with
  first-file schema inference and an HTTP fetch shim
  (reference: csvb_engine/src/lib.rs:33-85), parquet, federation.
- ``csvb_spark.functions`` — DataFusion-name SQL shims and the
  ``haiku()`` UDF (closes the TODO at reference csvb/src/lib.rs:97).
- ``csvb_spark.operators`` — beyond-reference LLM-data-pipeline
  operators: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding cosine / substring spans / line-level), similarity search
  (brute-force, LSH, IVF, PQ, k-NN join, hard-negative mining,
  random projection), text analysis + quality filtering (heuristic,
  Gopher rules, hashed linear classifier), BPE training, dataset
  assembly (splits, mixtures, packing, export, snapshot diff),
  multimodal columns with real codec-free decode (WAV/PPM/BMP). All
  designed for 100 TB scale: no driver-side collects in the data
  path, broadcast for small sides, partial aggregation, bounded
  shuffles.
- ``csvb_spark.plans``     — ASCII result renderer (parity with
  arrow::util::pretty, reference csvb/src/lib.rs:112).
- ``csvb_spark.server``    — Postgres wire-protocol front-end over
  ``spark.sql`` (reference: csvb_engine/src/lib.rs:91-132).
- ``csvb_spark.cli``       — ``csvb`` CLI: haiku / exec / serve /
  federate (reference: csvb/src/bin/csvb.rs) + export / ingest /
  diff bonuses.
"""

__version__ = "0.1.0"

from csvb_spark.session import get_session  # noqa: F401
