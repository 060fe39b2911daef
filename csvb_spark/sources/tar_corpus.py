"""WebDataset-style tar shard corpus READER — the inverse of
``operators.splits.export_tar_shards``, so a corpus exported for a
training data loader can be re-ingested for another curation pass
without a format conversion hop.

Scale shape: ``binaryFile`` gives one row per tar (tars are not
splittable), so the unit of parallelism is the shard file — which the
EXPORT side already bounds by hash-balancing docs across ``n_shards``.
Re-shard the export (raise ``n_shards``) rather than raising executor
memory: each task holds one shard's bytes plus a bounded decode chunk
(the writer lays each document's ``.txt``/``.json`` pair adjacently,
so the reader streams rows out in 256-row Arrow batches — it never
buffers a shard's decoded text). The member decode is an Arrow-batched
``mapInPandas`` whose closure captures only stdlib (executors never
import this package).

Reference scope: beyond-reference (training-pipeline extension; the
reference's source surface is CSV/parquet/JSON — SURVEY.md §2.A/§2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Output columns before metadata expansion.
TAR_CORPUS_SCHEMA = "shard int, doc_id long, text string, meta string"


def read_tar_corpus(
    spark: SparkSession,
    path: str,
    meta_schema: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Read a ``shard-*.tar`` export back into a DataFrame.

    Without ``meta_schema``: ``(shard, doc_id, text, meta)`` with
    ``meta`` the raw metadata-JSON string. Foreign tars with
    non-numeric member keys (WebDataset ``sample-001.txt``) read with
    a NULL ``doc_id`` instead of failing the task. With ``meta_schema`` (a DDL
    string, e.g. ``"lang STRING, source STRING, n_chars LONG"``): the
    metadata fields are expanded into typed top-level columns —
    ``(shard, doc_id, text, <meta fields>)`` — via ``from_json``
    (JVM-side, no second Python pass).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )
    id_c, text_c = id_col, text_col

    def _expand(batches):
        import io
        import re
        import tarfile

        import pandas as pd

        CHUNK = 256  # rows per emitted Arrow batch

        def _stem_id(stem):
            # our export writes zero-padded numeric stems; foreign
            # WebDataset keys ('sample-001') keep their text and NULL
            # the id rather than killing the read task
            try:
                return int(stem)
            except ValueError:
                return None

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                m = re.search(r"shard-(\d+)\.tar$", rec["path"])
                shard = int(m.group(1)) if m else -1
                with tarfile.open(
                    fileobj=io.BytesIO(rec["content"])
                ) as tf:
                    # members arrive in writer order — each document's
                    # .txt/.json pair is adjacent — so rows stream out
                    # in bounded chunks instead of buffering the whole
                    # shard's decoded text (the one-decoded-doc-at-a-
                    # time memory contract); `pending` only ever holds
                    # an incomplete trailing pair (or strays from a
                    # foreign tar)
                    pending: dict[str, dict[str, str]] = {}
                    for member in tf:
                        if "." not in member.name:
                            continue
                        stem, ext = member.name.rsplit(".", 1)
                        if ext not in ("txt", "json"):
                            continue
                        blob = tf.extractfile(member).read()
                        parts = pending.setdefault(stem, {})
                        parts[ext] = blob.decode("utf-8")
                        if "txt" in parts and "json" in parts:
                            rows.append(
                                (
                                    shard,
                                    _stem_id(stem),
                                    parts["txt"],
                                    parts["json"],
                                )
                            )
                            del pending[stem]
                            if len(rows) >= CHUNK:
                                yield pd.DataFrame(
                                    rows,
                                    columns=["shard", id_c, text_c, "meta"],
                                )
                                rows = []
                    # tolerate .txt-only members (foreign tars)
                    for stem, parts in pending.items():
                        if "txt" in parts:
                            rows.append(
                                (shard, _stem_id(stem), parts["txt"], None)
                            )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["shard", id_c, text_c, "meta"]
                )

    df = raw.mapInPandas(
        _expand, schema=f"shard int, {id_col} long, {text_col} string, meta string"
    )
    if meta_schema is None:
        return df
    parsed = df.withColumn("_m", F.from_json("meta", meta_schema))
    meta_fields = [
        f.name
        for f in parsed.schema["_m"].dataType.fields
        if f.name not in (id_col, text_col)
    ]
    return parsed.select(
        "shard",
        id_col,
        text_col,
        *[F.col(f"_m.{name}").alias(name) for name in meta_fields],
    )
