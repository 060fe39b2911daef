"""Dataset-assembly operators: deterministic splits and eval-set
contamination checks.

Beyond-reference training-data-pipeline components (the reference has
no dataset semantics at all — SURVEY.md §2 notes the relational-only
surface); both operators are the shapes a 100 TB corpus build needs:

- ``assign_splits``: hash-based train/valid/test assignment. Map-only
  (zero shuffles), deterministic under retries and re-runs (keyed on a
  column hash, never ``rand()``), and stable as the corpus grows — a
  document keeps its split when new rows arrive, unlike
  ``randomSplit`` which reshuffles everything.
- ``contamination_check``: which training documents share ≥ N distinct
  character k-grams with any document of an evaluation set. The
  candidate join is an equi-join on the GRAM HASH (one bigint per
  exploded gram — never gram text, never document pairs), so the
  shuffle is bounded by corpus gram count, and the pair explosion is
  bounded by grams that actually collide between train and eval.
  Ubiquitous grams (boilerplate) are dropped by an eval-side document
  -frequency cap before the join — the classic guard against a hot
  gram creating |train| × |eval| pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csvb_spark.operators.text import char_shingles


def split_bucket(
    id_col: str | Column,
    seed: int = 42,
    buckets: int = 10000,
    portable: bool = False,
) -> Column:
    """Deterministic bucket in [0, buckets) from the id's hash.

    Default is xxhash64 (cheapest at scale). ``portable=True`` derives
    the bucket from :func:`md5_key`'s first 8 hex chars instead, so any
    other engine can recompute the assignment (DuckDB:
    ``('0x' || substr(md5(id || ':seed'), 1, 8))::BIGINT % buckets``) —
    use it when split membership must be auditable off-cluster.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if portable:
        h32 = F.conv(F.substring(md5_key(c, seed), 1, 8), 16, 10).cast("bigint")
        return F.pmod(h32, F.lit(buckets))
    return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(buckets))


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Add a ``split`` column ('train'/'valid'/... per ``weights``).

    Buckets the id hash into 10k cells and maps cumulative weight
    ranges onto them: exactly reproducible across runs, retries, and
    engines that share the hash, and each row's assignment is
    independent of every other row (append-stable). Map-only.
    """
    weights = weights or {"train": 0.9, "valid": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = split_bucket(id_col, seed, portable=portable)
    expr: Column | None = None
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        bound = int(round(acc * 10000))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float rounding could leave bucket 9999 unmatched; close the range
    assigned = expr.otherwise(list(weights)[-1])
    return df.withColumn("split", assigned)


def md5_key(id_col: str | Column, seed: int = 42) -> Column:
    """Engine-portable deterministic order/sampling key:
    md5(id || ':' || seed) as a hex string. md5 — not xxhash64 — so
    the SAME key is computable in any other engine (DuckDB:
    ``md5(CAST(id AS VARCHAR) || ':seed')``): decisions survive
    engine migrations and are auditable off-cluster."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.encode(F.concat(c.cast("string"), F.lit(f":{seed}")), "UTF-8"))


def hash_uniform(id_col: str | Column, seed: int = 42) -> Column:
    """Deterministic uniform in [0, 1) from ``md5_key``'s first 8 hex
    chars (32 uniform bits — plenty for per-mille rate control;
    DuckDB twin: ``('0x' || substr(md5(...), 1, 8))::BIGINT``)."""
    hex8 = F.substring(md5_key(id_col, seed), 1, 8)
    return F.conv(hex8, 16, 10).cast("bigint") / F.lit(4294967296.0)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Domain-mixture downsampling: keep each row with its source's
    rate, decided by the row id's hash (never ``rand()``). Map-only,
    append-stable, exactly reproducible — re-running over a grown
    corpus keeps every previously-kept row, which is what makes
    incremental corpus builds diffable. The filter is a plain
    predicate, so it pushes into the scan where the format allows."""
    rate: Column = F.lit(float(default_rate))
    for src, r in rates.items():
        rate = F.when(F.col(source_col) == src, float(r)).otherwise(rate)
    return df.filter(hash_uniform(id_col, seed) < rate)


def sample_per_group(
    df: DataFrame,
    group_cols: tuple[str, ...],
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per group, chosen by the
    id's md5 order (``sample_rank`` column added) — deterministic
    stratified sampling for balanced eval/calibration sets: no
    ``rand()``, identical picks on re-runs and in other engines, and
    adding MORE rows to a group only ever swaps members in/out by
    hash order, never reshuffles arbitrarily.

    One shuffle (the per-group window sort). Groups are the strata —
    at scale a hot stratum sorts in parallel via the range
    partitioner only if you pre-split it; for bounded k the simpler
    guard is blocking on a finer stratum key."""
    c = F.col(id_col)
    key = md5_key(c, seed)
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(key, c)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def corpus_shuffle(
    df: DataFrame, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic global shuffle for training export: a total order
    by md5(id || ':' || seed) that any engine reproduces bit-for-bit
    (same portability argument as ``hash_uniform``). Changing the seed
    reshuffles; re-running never does.

    At scale: ``repartitionByRange`` on the key + sort-within-
    partitions yields globally ordered OUTPUT FILES (file i's keys all
    precede file i+1's) without ever funnelling the corpus through a
    single reducer — the range boundaries come from a sampled sketch,
    the sort is partition-local."""
    c = F.col(id_col)
    key = md5_key(c, seed)
    return (
        df.withColumn("shuffle_key", key)
        .repartitionByRange(F.col("shuffle_key"), c)
        .sortWithinPartitions("shuffle_key", id_col)
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str | Column,
    budget: int,
    part_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid end-to-end in
    ``order_col`` order within each ``part_col`` stream and cut into
    fixed ``budget``-token training sequences; each document reports
    the sequence it STARTS in and its token offset there (documents
    may straddle sequence boundaries — the standard pretraining
    packing).

    One shuffle (the window sort per stream); arithmetic is all
    integer window-cumsum, so any engine agrees bit-for-bit. At scale
    the stream key bounds the sort: pick part_col so one stream's
    token count fits an executor's sort spill comfortably — packing
    quality is unaffected by more streams."""
    from pyspark.sql import Window

    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(t).over(w), F.lit(0))
    return df.withColumns(
        {
            "n_tokens": t,
            "seq_id": F.floor(cum_before / budget),
            "seq_offset": cum_before % budget,
        }
    )


def global_index(df: DataFrame, id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Add ``global_idx``: the row's 1-based position in the corpus-wide
    ``md5_key`` total order — stable sample indices for training
    export — WITHOUT the single-reducer global sort that
    ``row_number() OVER (ORDER BY …)`` plans.

    Two-pass shape: bucket each row by the key's first hex byte (256
    buckets; fixed-width hex order IS lexicographic order, so bucket
    ranges partition the total order), rank within buckets in parallel
    (shuffle 1), and add per-bucket offsets computed from the 256-row
    bucket-count table (a driver-bounded constant — its cumulative-sum
    window runs on one task over 256 rows by design, then broadcasts).
    Any engine reproduces the same order: md5 hex is lowercase ASCII
    in Spark and DuckDB alike, ties broken by the id.
    """
    from pyspark.sql import Window

    keyed = df.withColumn("_gi_key", md5_key(id_col, seed)).withColumn(
        "_gi_bucket", F.conv(F.substring("_gi_key", 1, 2), 16, 10).cast("int")
    )
    w = Window.partitionBy("_gi_bucket").orderBy("_gi_key", id_col)
    counts = keyed.groupBy("_gi_bucket").agg(F.count("*").alias("_gi_n"))
    off_w = Window.orderBy("_gi_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_gi_off", F.coalesce(F.sum("_gi_n").over(off_w), F.lit(0))
    ).select("_gi_bucket", "_gi_off")
    return (
        keyed.withColumn("_gi_rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "_gi_bucket")
        .withColumn("global_idx", F.col("_gi_off") + F.col("_gi_rn"))
        .drop("_gi_key", "_gi_bucket", "_gi_rn", "_gi_off")
    )


def export_shard(id_col: str | Column, n_shards: int, seed: int = 42) -> Column:
    """Deterministic shard id in [0, n_shards) from ``hash_uniform`` —
    engine-portable (the DuckDB twin is the same md5 arithmetic), so a
    manifest written today is auditable by any engine tomorrow."""
    return F.floor(hash_uniform(id_col, seed) * n_shards).cast("int")


def export_manifest(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    size_col: str | None = "n_chars",
    seed: int = 42,
) -> DataFrame:
    """Per-shard manifest for a deterministic corpus export: row
    count, payload size (when ``size_col`` is present), and the
    md5-key range each shard covers. One partial-aggregated shuffle
    over ``n_shards`` groups."""
    key = md5_key(id_col, seed)
    if size_col is not None and size_col not in df.columns:
        size_col = None
    cols = [
        export_shard(id_col, n_shards, seed).alias("shard"),
        key.alias("_key"),
    ]
    aggs = [F.count("*").alias("n_docs")]
    if size_col is not None:
        cols.append(F.col(size_col))
        aggs.append(F.sum(size_col).alias(f"sum_{size_col}"))
    aggs += [F.min("_key").alias("min_key"), F.max("_key").alias("max_key")]
    return df.select(*cols).groupBy("shard").agg(*aggs)


def export_corpus(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    seed: int = 42,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Write the corpus as a deterministic sharded layout (``shard=N/``
    hive partitions, rows sorted by md5 key within each shard) and
    return the manifest DataFrame.

    ``fmt`` is ``parquet`` (default) or ``jsonl`` — Spark's json sink
    writes newline-delimited JSON, the interchange format most
    training-data tooling consumes; the sharding/ordering contract is
    identical, so a JSONL export is line-for-line reproducible and
    any engine (including DuckDB's ``read_json``) can audit it.

    One shuffle (repartition on shard) + partition-local sorts; shard
    membership and in-file order depend only on (id, seed), so a
    re-run — or another engine — produces byte-identical row
    sequences. ``max_records_per_file`` bounds file size at scale
    without changing order (Spark splits a sorted partition into
    consecutive files)."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unsupported export format {fmt!r}")
    tagged = df.withColumn("shard", export_shard(id_col, n_shards, seed)).withColumn(
        "_key", md5_key(id_col, seed)
    )
    writer = (
        tagged.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_key")
        .drop("_key")
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer = writer.partitionBy("shard")
    if fmt == "jsonl":
        writer.json(out_dir)
    else:
        writer.parquet(out_dir)
    return export_manifest(df, n_shards, id_col=id_col, seed=seed)


def contamination_check(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_shared: int = 2,
    max_gram_eval_df: int = 50,
    wide_gram_keys: bool = False,
    unit: str = "char",
) -> DataFrame:
    """(train_doc_id, eval_doc_id, n_shared_grams) for pairs sharing
    ≥ ``min_shared`` distinct k-grams — character k-grams by default,
    or FULL-WINDOW word k-grams with ``unit='word'`` (pass k=13 and
    min_shared=1 for the GPT-3/PaLM/Llama decontamination rule: one
    shared 13-word window flags the pair; see ``_grams_col``).

    Plan: explode each side's DISTINCT gram set → project the gram to
    its xxhash64 (fixed-width shuffle rows) → drop eval grams appearing
    in > ``max_gram_eval_df`` eval documents (boilerplate guard) →
    equi-join train grams to eval grams on the hash → count distinct
    shared grams per (train, eval) pair. Two shuffles (gram join, pair
    aggregation); no cross join at any size. ``wide_gram_keys`` widens
    the join key to two seeded hashes past the ~2^32-distinct-gram
    birthday bound (see ``text.gram_key_struct``).
    """
    from csvb_spark.operators.text import gram_key_cols, gram_key_exprs

    keys = gram_key_cols(wide_gram_keys)
    t_grams = train.select(
        F.col("doc_id").alias("train_doc_id"),
        F.explode(_grams_col(text_col, k, unit)).alias("g"),
    ).select("train_doc_id", *gram_key_exprs(F.col("g"), wide_gram_keys))
    e_grams = eval_docs.select(
        F.col("doc_id").alias("eval_doc_id"),
        F.explode(_grams_col(text_col, k, unit)).alias("g"),
    ).select("eval_doc_id", *gram_key_exprs(F.col("g"), wide_gram_keys))
    rare = (
        e_grams.groupBy(*keys)
        .agg(F.count("*").alias("eval_df"))
        .filter(F.col("eval_df") <= max_gram_eval_df)
        .select(*keys)
    )
    e_kept = e_grams.join(rare, keys)
    return (
        t_grams.join(e_kept, keys)
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )


# one split-block Bloom word sets _SBBF_PROBES bits, each picked by 6
# bits of the second hash (48 of its 64 bits consumed)
_SBBF_PROBES = 8


def _sbbf_masks(h2):
    """The 64-bit block mask for each second-hash value: OR of
    ``_SBBF_PROBES`` single bits, bit j's index taken from bits
    [6j, 6j+6) of h2 — EXACTLY the expression the Spark probe builds
    with shiftrightunsigned/shiftleft, so build and probe agree on
    every bit pattern (uint64 logical shifts == SQL unsigned
    shifts)."""
    import numpy as np

    h2u = np.asarray(h2, dtype=np.int64).view(np.uint64)
    mask = np.zeros(len(h2u), dtype=np.uint64)
    for j in range(_SBBF_PROBES):
        mask |= np.uint64(1) << ((h2u >> np.uint64(6 * j)) & np.uint64(63))
    return mask


def _sbbf_mask_sql(h2_col: str) -> str:
    """The SQL twin of :func:`_sbbf_masks` over a second-hash column
    — unsigned shifts, so bit patterns agree with the numpy build
    exactly."""
    return " | ".join(
        f"shiftleft(1L, CAST((shiftrightunsigned({h2_col}, {6 * j}) & 63)"
        " AS INT))"
        for j in range(_SBBF_PROBES)
    )


def _sbbf_probe(grams: DataFrame, words_df: DataFrame, n_words: int, seed: int):
    """Rows of ``grams`` (any shape, must carry ``gh``) whose gram
    hash tests positive in the SBBF word table: ONE broadcast join on
    the word index + one AND, all inside whole-stage codegen — no
    Python in the path (the Arrow-UDF probe this replaced measured
    super-linear at the sf10 bench). The second hash is computed into
    its own column first so the 8 mask terms share one xxhash64
    evaluation instead of leaning on codegen subexpression
    elimination."""
    return (
        grams.withColumn("word_idx", F.expr(f"CAST(pmod(gh, {n_words}) AS INT)"))
        .withColumn("h2b", F.xxhash64("gh", F.lit(seed)))
        .withColumn("bmask", F.expr(_sbbf_mask_sql("h2b")))
        .join(F.broadcast(words_df), "word_idx")
        .filter(F.expr("(word & bmask) = bmask"))
        .drop("word_idx", "h2b", "bmask", "word")
    )


def _grams_col(text_col: str, k: int, unit: str):
    """The gram-array expression every contamination path shares:
    ``char`` = lowercased character k-grams (the fixture-friendly
    default, robust to tokenization differences), ``word`` =
    FULL-WINDOW word k-grams (``text.word_grams_full`` — the
    GPT-3/PaLM/Llama 13-gram decontamination convention; a document
    shorter than k words yields no grams and can never match)."""
    if unit == "char":
        return char_shingles(text_col, k)
    if unit == "word":
        from csvb_spark.operators.text import word_grams_full

        return word_grams_full(text_col, k)
    raise ValueError(f"unknown gram unit {unit!r} (expected char|word)")


def _exploded_grams(
    docs: DataFrame, id_out: str, text_col: str, k: int, unit: str = "char"
) -> DataFrame:
    """(id_out, gh): each document's DISTINCT k-grams exploded and
    projected to the single-hash shuffle key — the shared front of
    every SBBF path (single-hash mode only; contamination_check
    keeps its own explode to support wide_gram_keys)."""
    from csvb_spark.operators.text import gram_key_exprs

    return docs.select(
        F.col("doc_id").alias(id_out),
        F.explode(_grams_col(text_col, k, unit)).alias("g"),
    ).select(id_out, *gram_key_exprs(F.col("g"), False))


def _rare_grams(e_grams: DataFrame, keys: list, max_gram_eval_df: int) -> DataFrame:
    """Distinct eval gram keys surviving the document-frequency cap
    (the boilerplate guard every contamination path applies)."""
    return (
        e_grams.groupBy(*keys)
        .agg(F.count("*").alias("eval_df"))
        .filter(F.col("eval_df") <= max_gram_eval_df)
        .select(*keys)
    )


def _sbbf_build(h1, h2, bits_per_key: int):
    """(word array int64, n_words) of a split-block Bloom filter
    (the Parquet SBBF design, single-word blocks): key k lands in
    word ``pmod(h1, n_words)`` and sets the 8 mask bits derived from
    h2. Membership = all 8 bits present in that one word — one array
    lookup + one AND per probe, no per-key loop, which is what lets
    the Spark side test it in pure JVM expressions. ~5e-4 false
    positives at the default 16 bits/key (word fill ≈ 39%, 0.39^8);
    false negatives impossible (bits are only ever OR-ed in)."""
    import numpy as np

    n = max(1, len(h1))
    n_words = max(1, (n * bits_per_key + 63) // 64)
    h1a = np.asarray(h1, dtype=np.int64)
    # numpy's % takes the divisor's sign, same as SQL pmod
    w = (h1a % np.int64(n_words)).astype(np.int64)
    words = np.zeros(n_words, dtype=np.uint64)
    # bitwise_or.at, not |=: fancy-indexed |= silently drops
    # duplicate word indices within one scatter
    np.bitwise_or.at(words, w, _sbbf_masks(h2))
    return words.view(np.int64), n_words


def _sbbf_collect_pairs(
    hash_df: DataFrame, max_eval_grams: int, seed: int
) -> list:
    """Collect (hash, second-hash) rows from a DataFrame of distinct
    gram hashes (column ``gh``) under the hard guard — the word table
    is DRIVER-BUILT state like the LM/classifier weight tables, never
    unbounded (8 MB at the 2^22 default cap). The second hash comes
    from Spark's own xxhash64 so build and probe share one hash
    implementation."""
    pairs = (
        hash_df.select("gh", F.xxhash64("gh", F.lit(seed)).alias("h2"))
        .limit(max_eval_grams + 1)
        .collect()
    )
    if len(pairs) > max_eval_grams:
        raise ValueError(
            f"eval gram set exceeds max_eval_grams={max_eval_grams}; "
            "raise the cap or use contamination_check (exact join path)"
        )
    return pairs


def _sbbf_from_pairs(
    spark, pairs: list, bits_per_key: int
) -> tuple[DataFrame, int]:
    """(word-table DataFrame, n_words) from collected (hash,
    second-hash) pairs: scatter the bits in numpy, ship the words
    back as an Arrow-built DataFrame for the broadcast probe join."""
    words, n_words = _sbbf_build(
        [r[0] for r in pairs], [r[1] for r in pairs], bits_per_key
    )
    import pandas as pd

    words_df = spark.createDataFrame(
        pd.DataFrame({"word_idx": range(n_words), "word": words}),
        "word_idx int, word bigint",
    )
    return words_df, n_words


def _sbbf_from_hash_df(
    spark,
    hash_df: DataFrame,
    bits_per_key: int,
    max_eval_grams: int,
    seed: int,
) -> tuple[DataFrame, int]:
    """Collect + build in one step — see the two halves above."""
    return _sbbf_from_pairs(
        spark, _sbbf_collect_pairs(hash_df, max_eval_grams, seed), bits_per_key
    )


def sbbf_eval_filter(
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    max_gram_eval_df: int = 50,
    bits_per_key: int = 16,
    max_eval_grams: int = 1 << 22,
    seed: int = 7,
    unit: str = "char",
) -> tuple[DataFrame, int]:
    """Build the SBBF word table over an eval set's df-capped k-gram
    hashes (char by default, ``unit='word'`` for 13-gram-style word
    windows), for reuse across queries or stream micro-batches (the
    streaming ingest decontamination gate builds this ONCE at stream
    start). Pair with :func:`sbbf_gram_hits` AT THE SAME unit/k."""
    from csvb_spark.operators.text import gram_key_cols

    rare = _rare_grams(
        _exploded_grams(eval_docs, "doc_id", text_col, k, unit),
        gram_key_cols(False),
        max_gram_eval_df,
    )
    return _sbbf_from_hash_df(
        eval_docs.sparkSession, rare, bits_per_key, max_eval_grams, seed
    )


def sbbf_gram_hits(
    docs: DataFrame,
    words_df: DataFrame,
    n_words: int,
    text_col: str = "text",
    k: int = 8,
    seed: int = 7,
    unit: str = "char",
) -> DataFrame:
    """(doc_id, n_bloom_shared): how many of each document's DISTINCT
    k-grams test positive in the SBBF word table (``unit``/``k`` must
    match the table's build). Conservative by construction — a truly
    shared gram ALWAYS counts (no false negatives), a false positive
    (~5e-4/gram at 16 bits/key) can only inflate the count — so a
    gate thresholding this count never leaks a contaminated document.
    Map-only + broadcast lookup + one per-doc aggregate; no shuffle
    of the gram stream."""
    return (
        _sbbf_probe(
            _exploded_grams(docs, "doc_id", text_col, k, unit),
            words_df,
            n_words,
            seed,
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bloom_shared"))
    )


# JVM broadcast-hash-relation footprint per 64-bit gram key,
# conservative middle of the 32-60 B/key range SCALE.md §6e measured
# against (key + LongHashedRelation slot + object overhead)
_BCAST_BYTES_PER_KEY = 48


def _parse_spark_size(v: str) -> int:
    """Parse a Spark size conf value ('10MB', '10485760b', '-1')
    into bytes (negative = disabled)."""
    s = str(v).strip().lower()
    mult = 1
    for suffix, m in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20),
        ("kb", 1 << 10), ("b", 1),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10),
    ):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(float(s) * mult)


def decontam_auto_method(
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    max_gram_eval_df: int = 50,
    threshold_bytes: int | None = None,
    unit: str = "char",
) -> tuple[str, int, int]:
    """(method, n_eval_grams, threshold_bytes): pick the
    decontamination path by the decision rule SCALE.md §6e states in
    prose — ``exact`` while the df-capped eval gram-hash relation
    fits the session's auto-broadcast threshold (Catalyst then turns
    the exact equi-join into a broadcast semi-join, the cheap path
    with zero false-positive verify work), ``bloom`` past it (the
    word table is ~16-30x smaller than the broadcast hash relation,
    extending the map-side-filter regime an order of magnitude
    further before anything must shuffle the train gram stream). A
    disabled threshold (-1) means the exact join would shuffle at ANY
    size, so bloom wins outright. Costs one bounded aggregate over
    the eval grams — work both paths do anyway.

    ``threshold_bytes`` overrides the session conf (``get_session``
    re-pins ``autoBroadcastJoinThreshold`` on every call, so a
    caller sizing the decision for a DIFFERENT cluster passes the
    target's threshold explicitly — the CLI's
    ``--broadcast-threshold-bytes``)."""
    from csvb_spark.operators.text import gram_key_cols

    n = _rare_grams(
        _exploded_grams(eval_docs, "eval_doc_id", text_col, k, unit),
        gram_key_cols(False),
        max_gram_eval_df,
    ).count()
    thr = (
        threshold_bytes
        if threshold_bytes is not None
        else _parse_spark_size(
            eval_docs.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10MB"
            )
        )
    )
    exact_ok = thr > 0 and n * _BCAST_BYTES_PER_KEY <= thr
    return ("exact" if exact_ok else "bloom"), n, thr


def contamination_check_bloom(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_shared: int = 2,
    max_gram_eval_df: int = 50,
    bits_per_key: int = 16,
    max_eval_grams: int = 1 << 22,
    seed: int = 7,
    unit: str = "char",
) -> DataFrame:
    """:func:`contamination_check` with a split-block Bloom prefilter
    on the train side — identical output, different cost law.

    The exact operator shuffles EVERY train gram into the equi-join
    even though, on a real corpus vs a benchmark suite, well under 1%
    of them match anything. Catalyst fixes that for free while the
    eval gram-hash table fits the broadcast threshold (the join turns
    into a broadcast semi-join); past it, this variant is the scale
    path: the Bloom word table over the df-capped eval gram hashes is
    ~16-30x smaller than the broadcast hash relation (``bits_per_key``
    bits vs 64-bit keys + JVM relation overhead), so the
    map-side-filter regime extends more than an order of magnitude
    further up the eval-set scale before anything must shuffle the
    full train gram stream.

    The filter is a split-block Bloom (Parquet's SBBF shape,
    single-word blocks — ``_sbbf_build``): key → ONE word by
    ``pmod(gh, n_words)``, 8 mask bits from ``xxhash64(gh, seed)``.
    That one-lookup design is what keeps the probe ENTIRELY JVM-side:
    a broadcast hash join on the word index + a shift/AND mask
    expression, zero Python in the hot path (an Arrow-batched UDF
    probe measured ~1.6x super-linear at the sf10 bench — the Arrow
    boundary itself became the bottleneck at 5e9 train grams; the
    JVM probe stays inside whole-stage codegen).

    Plan: eval grams → df-cap (one aggregate, same as the exact op;
    its collected hashes feed BOTH the word table and the verify
    join's broadcast side, so the aggregate computes exactly once
    with no lingering executor cache) →
    (hash, second-hash) collect under ``max_eval_grams`` (hard guard:
    the word table is DRIVER-BUILT state like the LM/classifier
    weight tables, never unbounded — at the 2^22 cap it is 8 MB) →
    word-table DataFrame → broadcast join + mask filter on the train
    gram stream → survivors take the ordinary exact equi-join + pair
    aggregation. Bloom false positives (~5e-4 at 16 bits/key) are
    eliminated by that exact join; Bloom filters have no false
    negatives, so the result is BIT-IDENTICAL to
    :func:`contamination_check` — which is what makes the operator
    oracle-checkable (x138 shares x19's DuckDB twin).

    The probe hashes derive from the SAME 64-bit xxhash64 gram key
    the exact path joins on, so this inherits the default
    single-hash mode's ~2^32-distinct-gram birthday bound; past 2^32
    grams the eval side is no benchmark suite and the exact operator
    is the right tool.
    """
    from csvb_spark.operators.text import gram_key_cols

    keys = gram_key_cols(False)
    t_grams = _exploded_grams(train, "train_doc_id", text_col, k, unit)
    e_grams = _exploded_grams(eval_docs, "eval_doc_id", text_col, k, unit)
    # The rare-gram hashes are collected to the driver for the SBBF
    # build ANYWAY (bounded by max_eval_grams), so the verify join
    # reuses them as a driver-built broadcast relation instead of a
    # persisted aggregate — the df-cap computes exactly once and
    # nothing stays pinned in executor cache after the query (a
    # round-12 ADVICE finding: the old .persist() leaked until
    # context-cleaner GC in long-lived serve/notebook sessions).
    rare = _rare_grams(e_grams, keys, max_gram_eval_df)
    pairs = _sbbf_collect_pairs(rare, max_eval_grams, seed)
    words_df, n_words = _sbbf_from_pairs(
        train.sparkSession, pairs, bits_per_key
    )
    import pandas as pd

    rare_df = train.sparkSession.createDataFrame(
        pd.DataFrame({"gh": [r[0] for r in pairs]}), "gh bigint"
    )
    survivors = _sbbf_probe(t_grams, words_df, n_words, seed).select(
        "train_doc_id", *keys
    )
    e_kept = e_grams.join(F.broadcast(rare_df), keys)
    return (
        survivors.join(e_kept, keys)
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-based domain mixture sampling (the multilingual-LM
    rebalancing of Conneau et al. 2020 / mC4): per-source keep rates
    are DERIVED from the data — source weights ∝ count^alpha,
    flattening the head and boosting the tail as alpha → 0 — instead
    of :func:`mixture_sample`'s hand-specified rates.

    rate_s = min(1, target_frac · N · w_s / n_s) with
    w_s = n_s^alpha / Σ_t n_t^alpha; the keep decision is the same
    md5-hash threshold as every sampler here (append-stable, engine-
    portable, never ``rand()``). Output: kept rows' (id, source) plus
    the applied ``keep_rate``.

    Determinism: n_s^alpha is rounded to 6 decimals and summed in
    DECIMAL (the cross-source sum must not depend on source order);
    the remaining arithmetic is a fixed tree of IEEE doubles.

    Plan: one |sources|-row aggregate → broadcast join → map-only
    filter. The rate table is tiny at any corpus scale; the filter is
    a plain predicate over the scan.
    """
    w = (
        df.groupBy(source_col)
        .agg(F.count("*").alias("n_s"))
        .withColumn(
            "w_num",
            F.round(
                F.pow(F.col("n_s").cast("double"), F.lit(float(alpha))), 6
            ).cast("decimal(18,6)"),
        )
    )
    tot = w.agg(
        F.sum("w_num").alias("w_tot"), F.sum("n_s").alias("n_tot")
    )
    rates = (
        w.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                (
                    (F.lit(float(target_frac)) * F.col("n_tot").cast("double"))
                    * (
                        F.col("w_num").cast("double")
                        / F.col("w_tot").cast("double")
                    )
                )
                / F.col("n_s").cast("double"),
            ).alias("keep_rate"),
        )
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(hash_uniform(id_col, seed) < F.col("keep_rate"))
        .select(id_col, source_col, F.round("keep_rate", 6).alias("keep_rate"))
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: per document id,
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` plus both
    content digests — the audit primitive for incremental pipeline
    runs (what did this crawl refresh actually change?) and for
    verifying that a re-run was a no-op.

    Content identity is the md5 digest (engine-portable, same as
    ``dedup.exact_groups``). Row PRESENCE is tracked separately from
    the digest (a NULL text must not masquerade as a missing row), and
    digests compare null-safely: NULL vs NULL is ``unchanged``, NULL
    vs text is ``changed``.

    Plan: digest each side map-side (fixed-width rows into the join),
    ONE full-outer shuffle on the id. At 100 TB, snapshots exported
    through ``sources.bucketed.write_bucketed`` on the id make even
    that join shuffle-free.
    """
    o = old.select(
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col)).alias("old_fp"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col)).alias("new_fp"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "_id", "full_outer")
    return j.select(
        F.col("_id").alias(id_col),
        "old_fp",
        "new_fp",
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def budget_select(
    df: DataFrame,
    budget: int,
    score_col: str = "quality_score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """Select the highest-quality documents until a token budget:
    rank the corpus by ``(score DESC, id)`` and keep every document
    whose running token total fits inside ``budget`` — the standard
    "best N tokens" curation step when compute, not data, is the
    constraint.

    The naive plan is a GLOBAL ordered cumulative sum
    (``SUM(tokens) OVER (ORDER BY score DESC)``) — a single-reducer
    sort of the whole corpus. This is the distributed prefix-sum
    instead: ``repartitionByRange`` on the full sort key
    ``(score DESC, id)`` makes each partition an order-contiguous
    slice of the global ranking, the token cumsum runs per partition
    in parallel, and per-partition subtotal offsets (≤ ``partitions``
    rows — a broadcast constant) lift local sums to global ones.
    Because the range partitioner splits on the WHOLE key, a corpus
    whose scores are constant (or concentrated in a few values) still
    spreads across partitions by id — the tie-skew collapse the
    round-5 quantized-score design suffered cannot happen, and scores
    no longer need a bounded range. Exact int64 token sums
    throughout; per-row results depend only on the global order, not
    on where the sampled range boundaries land.

    Cost: one range shuffle (plus the partitioner's sampling pass)
    and one fixed-width hash shuffle for the per-partition window —
    both over narrow ``(id, score, tokens)`` rows, plus one eager
    materialization of the ranged slice (local checkpoint). The
    checkpoint is load-bearing, not an optimization: BOTH consumers
    of the ranged slice (the per-partition subtotal aggregate and
    the windowed cumsum) must observe the SAME physical partition
    assignment, and without materialization that only holds while
    the optimizer reuses one exchange — if exchange reuse is
    disabled or plan canonicalization diverges, each branch
    re-executes the range exchange, the RangePartitioner resamples
    its boundaries, and the two branches can disagree on
    ``spark_partition_id()``, silently corrupting ``cum_tokens``.
    Checkpointing pins the rows (pid included) once; every branch
    reads the stored data. ``partitions`` is pinned explicitly
    (default: the cluster's default parallelism) because AQE never
    coalesces a user-specified partition count.

    Operational caveat: ``localCheckpoint`` truncates lineage, so its
    blocks are NOT recoverable if an executor holding them is lost —
    on preemptible/spot clusters or with aggressive dynamic
    allocation, an executor loss between the checkpoint and the
    consuming branches fails the query (a clean retry-the-job
    failure, never silent corruption). On such clusters prefer a
    reliable checkpoint directory (``sparkContext.setCheckpointDir``
    + ``.checkpoint()`` on the same slice — identical semantics,
    HDFS/object-store durability) and re-run this operator on top.

    NULL handling: a NULL score or token count raises at execution
    (in-plan ``assert_true``) rather than silently dropping the row —
    score every document (or ``coalesce`` a sentinel) before
    budgeting.

    Output: ``(id, score, tokens, cum_tokens, keep)`` —
    ``keep = cum_tokens <= budget`` (a document only counts if it
    fits entirely).
    """
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError("budget_select: budget must be >= 0")
    spark = df.sparkSession
    n_part = int(partitions) if partitions else spark.sparkContext.defaultParallelism
    score_t = dict(df.dtypes)[score_col]
    keyed = df.select(
        F.col(id_col),
        F.when(F.col(score_col).isNotNull(), F.col(score_col))
        .otherwise(
            F.assert_true(
                F.col(score_col).isNotNull(),
                F.lit(
                    f"budget_select: NULL in score_col {score_col!r} — score"
                    " every document (or coalesce a sentinel) before budgeting"
                ),
            ).cast(score_t)
        )
        .alias("_bs_score"),
        F.when(
            F.col(tokens_col).isNotNull(), F.col(tokens_col).cast("bigint")
        )
        .otherwise(
            F.assert_true(
                F.col(tokens_col).isNotNull(),
                F.lit(
                    f"budget_select: NULL in tokens_col {tokens_col!r} — count"
                    " tokens for every document before budgeting"
                ),
            ).cast("bigint")
        )
        .alias("_bs_tok"),
    )
    # eager: materialize BEFORE building the two consumer branches so
    # the pid labels are data, not a recomputable expression (see
    # docstring — correctness, not caching)
    ranged = (
        keyed.repartitionByRange(n_part, F.desc("_bs_score"), F.asc(id_col))
        .withColumn("_bs_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    per = ranged.groupBy("_bs_pid").agg(F.sum("_bs_tok").alias("_bs_sub"))
    off_w = Window.orderBy(F.asc("_bs_pid")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per.withColumn(
        "_bs_off", F.coalesce(F.sum("_bs_sub").over(off_w), F.lit(0))
    ).select("_bs_pid", "_bs_off")
    in_w = (
        Window.partitionBy("_bs_pid")
        .orderBy(F.desc("_bs_score"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_bs_cum_in", F.sum("_bs_tok").over(in_w))
        .join(F.broadcast(offsets), "_bs_pid")
        .select(
            id_col,
            F.col("_bs_score").alias(score_col),
            F.col("_bs_tok").alias(tokens_col),
            (F.col("_bs_off") + F.col("_bs_cum_in")).alias("cum_tokens"),
            (
                (F.col("_bs_off") + F.col("_bs_cum_in")) <= F.lit(int(budget))
            ).alias("keep"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Seeded weighted sampling WITHOUT replacement — the
    Efraimidis-Spirakis exponential-sort trick, the standard way to
    draw a fixed-size weighted sample from a distributed table in one
    pass: every row gets the key ``-ln(u) / w`` from a per-row
    deterministic uniform ``u`` and its weight ``w``; the ``k``
    smallest keys ARE a weighted sample without replacement (each
    key is an Exponential(w) draw; the argmin of exponentials picks
    proportionally to rates, and the property telescopes).

    Scale shape: map-side key computation + ONE TakeOrderedAndProject
    (partial top-k on every partition, k rows to the driver-side
    merge) — no shuffle of the table, no global sort. This is the
    curation-time "draw 1M docs proportional to quality" primitive;
    ``budget_select`` is its deterministic-rank sibling when you want
    the BEST rows rather than a proportional draw.

    Determinism (engine-portable, like every sampling op here): ``u``
    derives from ``md5(id:seed)``'s first 8 hex chars — 32 bits,
    shifted into (0, 1) as ``(h + 1) / (2^32 + 1)`` so ``ln`` never
    sees 0 or 1; the key is rounded to 9 decimals with ``id`` as the
    tie-break, so the selected set replays exactly in SQL (x90).

    NULL or non-positive weights raise in-plan (``assert_true``)
    rather than silently biasing the draw.

    Output: the sampled rows ``(id, weight, skey)``, ``skey`` ASC.
    """
    if k <= 0:
        raise ValueError(f"weighted_sample: k must be positive, got {k}")
    w = (
        F.when(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0),
            F.col(weight_col),
        )
        .otherwise(
            F.assert_true(
                F.col(weight_col).isNotNull() & (F.col(weight_col) > 0),
                F.lit(
                    f"weighted_sample: weight_col {weight_col!r} must be"
                    " positive and non-NULL for every row"
                ),
            ).cast(dict(df.dtypes)[weight_col])
        )
        .cast("double")
    )
    h = F.conv(F.substring(md5_key(id_col, seed), 1, 8), 16, 10).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(4294967297.0)
    skey = F.round(-F.log(u) / w, 9)
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col),
            skey.alias("skey"),
        )
        .orderBy(F.asc("skey"), F.asc(id_col))
        .limit(k)
    )


def length_bucket_batches(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 16,
    boundaries: tuple[int, ...] = (32, 64, 128, 256, 512),
    n_shards: int = 8,
) -> DataFrame:
    """Length-bucketed inference/training batches with padding-waste
    accounting: assign each document a token-length bucket (the index
    of the first boundary its whitespace-token count does not exceed),
    order documents longest-first inside the bucket, cut them into
    fixed-size batches, and report — per batch — how many pad tokens a
    pad-to-batch-max collator would burn. The standard dynamic-batching
    prep step: batching by similar length is what keeps padding waste
    low when sequences feed a fixed-shape accelerator.

    Output: one row per batch —
    ``(bucket, shard, batch_id, n_docs, max_len, sum_tokens,
    padded_tokens, pad_frac)`` where ``padded_tokens =
    n_docs * max_len - sum_tokens`` and ``pad_frac`` is its share of
    the padded total, rounded to 6.

    Batches are SHARD-LOCAL: ranking runs within ``(bucket,
    doc_id % n_shards)``, not within the global bucket. A global
    longest-first sort of one bucket is a single-reducer window at
    100 TB; shard-local batching keeps ``n_buckets × n_shards``
    parallel windows, bounds every reducer to its shard, and is what
    production collators do anyway (each worker batches the rows it
    holds). Unlike the quota sample's shards, these ARE visible in the
    output (``shard`` column) — batch membership is defined per shard,
    and the oracle replays the same arithmetic. Everything else is
    built-ins over one scan: a map-side token count, one window rank,
    one groupBy.
    """
    if batch_size < 1:
        raise ValueError(
            f"length_bucket_batches: batch_size must be >= 1, got {batch_size}"
        )
    if list(boundaries) != sorted(set(boundaries)) or not boundaries:
        raise ValueError(
            "length_bucket_batches: boundaries must be non-empty and"
            f" strictly increasing, got {boundaries!r}"
        )
    from csvb_spark.operators.text import tokens

    tok_len = F.size(tokens(F.coalesce(F.col(text_col), F.lit("")))).cast(
        "bigint"
    )
    bucket = F.lit(0)
    for b in boundaries:
        bucket = bucket + F.when(tok_len > b, 1).otherwise(0)
    shard = F.pmod(F.col(id_col), F.lit(n_shards))
    base = docs.select(
        F.col(id_col).alias("_id"),
        tok_len.alias("_len"),
        bucket.alias("bucket"),
        shard.alias("shard"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("bucket", "shard").orderBy(
        F.desc("_len"), F.asc("_id")
    )
    ranked = base.withColumn(
        "batch_id", F.floor((F.row_number().over(w) - 1) / batch_size)
    )
    return (
        ranked.groupBy("bucket", "shard", "batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("_len").alias("max_len"),
            F.sum("_len").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "shard",
            "batch_id",
            "n_docs",
            "max_len",
            "sum_tokens",
            (F.col("n_docs") * F.col("max_len") - F.col("sum_tokens")).alias(
                "padded_tokens"
            ),
            F.round(
                (F.col("n_docs") * F.col("max_len") - F.col("sum_tokens"))
                / (F.col("n_docs") * F.col("max_len")),
                6,
            ).alias("pad_frac"),
        )
    )


def leakage_safe_splits(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Train/valid/test assignment that cannot leak near-duplicates
    across the split boundary: the bucket hash is taken over the
    near-dup CLUSTER's canonical id, not the document id, so every
    member of a cluster lands on the same side. Hashing doc ids (plain
    :func:`assign_splits`) silently puts paraphrases of a test
    document into train — the eval-contamination failure mode
    decontamination audits exist to catch; clustering first and
    splitting on the canonical id removes it by construction.

    ``pairs`` defaults to :func:`~csvb_spark.operators.dedup.
    ngram_jaccard_pairs` over ``docs``; pass the pairs a prior dedup
    stage already computed (MinHash-LSH at scale) to reuse them.
    Unpaired documents are their own cluster (canonical id = own id),
    so their assignment matches plain ``assign_splits`` on the same
    seed — adding pairs only ever MOVES clustered docs, never
    reshuffles the rest.

    Plan: cluster labels come from the bounded label-propagation of
    :func:`~csvb_spark.operators.dedup.dedup_clusters` (fixed-width
    (id, label) shuffles); the label table is duplicate-pairs-sized —
    tiny next to the corpus — so AQE broadcasts the join back onto the
    docs scan; the split itself is the same map-only bucket arithmetic
    as ``assign_splits``. Output: docs columns + ``cluster_id`` +
    ``split``. Reference scope: beyond-reference (training-pipeline
    extension; composes x40's clustering with x20's bucketing).
    """
    from csvb_spark.operators import dedup as _dedup

    if pairs is None:
        pairs = _dedup.ngram_jaccard_pairs(docs, text_col=text_col)
    labels = _dedup.dedup_clusters(pairs)
    with_cluster = docs.join(
        labels.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    return assign_splits(
        with_cluster, id_col="cluster_id", weights=weights, seed=seed,
        portable=portable,
    )


def export_tar_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """WebDataset-style corpus export: one POSIX tar per shard, each
    document as a ``<id>.txt`` payload + ``<id>.json`` metadata member
    pair — the sample-sequential layout multimodal/LLM data loaders
    stream (tar keeps samples contiguous on disk, so a reader does
    large sequential I/O instead of per-sample seeks).

    Deterministic end to end: shard membership and member order depend
    only on ``(id, seed)`` (md5 key — the export_corpus contract), all
    tar headers are pinned (mtime 0, uid/gid 0, USTAR), and metadata
    JSON is key-sorted — a re-run produces BYTE-identical archives,
    and the returned manifest carries each tar's md5 so an auditor can
    prove it. Returns a manifest DataFrame ``(shard, path, n_docs,
    n_bytes, tar_md5)``; the write happens when the manifest is acted
    on (one job, one pass).

    Plan: one shuffle (repartition on shard) + partition-local sort,
    then an Arrow-batched ``mapInPandas`` whose task streams members
    straight into the shard's tar (nothing buffers more than one
    document). Tasks write to ``out_dir`` from the EXECUTOR — on a
    real cluster point it at shared storage and cap shard size by
    raising ``n_shards`` (shards are hash-balanced by id). Speculative
    re-execution is safe: each attempt writes a private temp file and
    ``os.replace``s it into place atomically (the bytes are identical
    either way, so whichever attempt lands last is correct — never an
    interleaving). Calling this function also clears the target's
    ``shard-*.tar`` leftovers, so a re-export with fewer shards cannot
    leave stale higher-numbered tars for the reader to double-count.
    The manifest md5 hashes in bounded chunks. Reference scope:
    beyond-reference
    (training-pipeline extension; tar layout per the public WebDataset
    convention).
    """
    # a re-export with fewer shards must not leave the previous run's
    # higher-numbered tars behind — read_tar_corpus globs *.tar, so a
    # stale shard would silently duplicate documents on read-back
    import glob as _glob
    import os as _os

    for stale in _glob.glob(_os.path.join(out_dir, "shard-*.tar")):
        _os.remove(stale)
    tagged = (
        df.withColumn("shard", export_shard(id_col, n_shards, seed))
        .withColumn("_key", md5_key(id_col, seed))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_key")
    )
    schema = "shard int, path string, n_docs bigint, n_bytes bigint, tar_md5 string"
    # Captures only locals + stdlib: safe to pickle to executors that
    # cannot import csvb_spark.
    id_c, text_c, out_d = id_col, text_col, out_dir

    def _write(batches):
        import hashlib
        import io
        import json
        import os
        import tarfile

        import pandas as pd

        os.makedirs(out_d, exist_ok=True)
        state = {"shard": None, "tar": None, "fh": None, "n": 0, "tmp": None}

        def _close():
            if state["tar"] is None:
                return None
            state["tar"].close()
            state["fh"].close()
            path = os.path.join(out_d, f"shard-{state['shard']:05d}.tar")
            # md5 in bounded chunks (never the whole tar in memory),
            # then an ATOMIC rename into place: a speculative duplicate
            # of this task writes its own temp file and the final
            # os.replace is all-or-nothing — no interleaved truncation
            # of a half-written shard (the bytes are identical either
            # way, so whichever attempt lands last is correct)
            h = hashlib.md5()
            n_bytes = 0
            with open(state["tmp"], "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
                    n_bytes += len(chunk)
            os.replace(state["tmp"], path)
            row = (
                int(state["shard"]),
                path,
                int(state["n"]),
                n_bytes,
                h.hexdigest(),
            )
            state.update(shard=None, tar=None, fh=None, n=0, tmp=None)
            return row

        out_rows = []
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                shard = int(rec["shard"])
                if shard != state["shard"]:
                    done = _close()
                    if done:
                        out_rows.append(done)
                    tmp = os.path.join(
                        out_d, f".shard-{shard:05d}.tar.tmp-{os.getpid()}"
                    )
                    fh = open(tmp, "wb")
                    state.update(
                        shard=shard,
                        fh=fh,
                        tar=tarfile.open(
                            fileobj=fh, mode="w", format=tarfile.USTAR_FORMAT
                        ),
                        n=0,
                        tmp=tmp,
                    )
                doc_id = rec[id_c]
                text = rec.get(text_c)
                payload = ("" if text is None else str(text)).encode("utf-8")
                def _plain(v):
                    if v is None or (isinstance(v, float) and v != v):
                        return None
                    if hasattr(v, "item"):  # numpy scalar -> python
                        return v.item()
                    return v

                meta = {
                    k: _plain(v)
                    for k, v in rec.items()
                    if k not in (text_c, "shard", "_key")
                }
                meta_b = json.dumps(
                    meta, sort_keys=True, default=str, ensure_ascii=False
                ).encode("utf-8")
                for suffix, blob in ((".txt", payload), (".json", meta_b)):
                    info = tarfile.TarInfo(name=f"{int(doc_id):012d}{suffix}")
                    info.size = len(blob)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    state["tar"].addfile(info, io.BytesIO(blob))
                state["n"] += 1
        done = _close()
        if done:
            out_rows.append(done)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["shard", "path", "n_docs", "n_bytes", "tar_md5"],
            )

    return tagged.mapInPandas(_write, schema=schema)


def curriculum_order(
    df: DataFrame,
    score_col: str,
    boundaries: list[float],
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Curriculum data ORDERING: a global training order that walks
    difficulty stages easiest-first, deterministically shuffled inside
    each stage — curriculum-learning recipes feed samples in exactly
    this order, and reproducibility demands it be a pure function of
    (score, id, seed).

    ``boundaries`` (ascending) cut ``score_col`` into
    ``len(boundaries)+1`` stages: ``stage = 1 + #{b : b <= score}``
    (caller-supplied cuts — derive them from ``skew_report`` /
    ``calibrate_keep_threshold`` when they need to be data-driven; an
    explicit list keeps the op map-only and the order auditable).
    Output: input columns + ``stage`` + ``global_idx``, the row's
    1-based position in the corpus-wide ``(stage, md5_key, id)`` total
    order.

    Scale shape — NO single-reducer global sort: the
    :func:`global_index` two-pass trick generalized to a composite
    bucket ``stage * 256 + first-key-byte`` (fixed-width hex order is
    lexicographic, so composite-bucket ranges partition the total
    order); ranks are computed per bucket in parallel, per-bucket
    offsets come from a ``(stages * 256)``-row count table — a
    driver-bounded constant whose cumulative sum runs on one task by
    design, then broadcasts. Reference scope: beyond-reference
    (training-pipeline extension).
    """
    if sorted(boundaries) != list(boundaries):
        raise ValueError(
            f"curriculum_order: boundaries must be ascending, got {boundaries!r}"
        )
    from pyspark.sql import Window

    # NULL scores land in stage 1 (no difficulty evidence reads as
    # easiest — the "NULL ppl passes the gate" convention); an
    # un-coalesced comparison would NULL the stage and the bucket,
    # and the offsets join would silently drop the document
    stage = F.lit(1)
    for b in boundaries:
        stage = stage + F.coalesce(
            (F.col(score_col) >= F.lit(float(b))).cast("int"), F.lit(0)
        )
    keyed = (
        df.withColumn("stage", stage)
        .withColumn("_co_key", md5_key(id_col, seed))
        .withColumn(
            "_co_bucket",
            F.col("stage") * 256
            + F.conv(F.substring("_co_key", 1, 2), 16, 10).cast("int"),
        )
    )
    w = Window.partitionBy("_co_bucket").orderBy("_co_key", id_col)
    counts = keyed.groupBy("_co_bucket").agg(F.count("*").alias("_co_n"))
    off_w = Window.orderBy("_co_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_co_off", F.coalesce(F.sum("_co_n").over(off_w), F.lit(0))
    ).select("_co_bucket", "_co_off")
    return (
        keyed.withColumn("_co_rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "_co_bucket")
        .withColumn("global_idx", F.col("_co_off") + F.col("_co_rn"))
        .drop("_co_key", "_co_bucket", "_co_rn", "_co_off")
    )


def sampling_plan(
    docs: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source EPOCH plan — the data-recipe table a pretraining run
    publishes (how many passes over each source the token budget
    implies): sources with ``target > available`` repeat
    (``epochs > 1``), heavy sources subsample (``epochs < 1``).

    ``weights`` are INTEGER shares (e.g. ``{"web": 60, "books": 30,
    "code": 10}``) — integer arithmetic keeps every derived number an
    exact division of exact integers, so the whole plan is
    bit-identical in any engine with no rounding anywhere (a float
    weight vector cannot even sum to 1.0 reliably). Unlisted sources
    get weight 0. Output per source: ``(source, n_docs,
    available_tokens, weight, target_tokens, epochs)`` with
    ``target_tokens = floor(budget * weight / total_weight)`` and
    ``epochs = target / available`` (unrounded exact-operand IEEE).

    One partial-aggregated groupBy on the source; token counts are
    map-side whitespace-token sizes. Reference scope: beyond-reference
    (training-pipeline extension; the assignment itself is
    ``budget_select`` / ``temperature_mixture`` — this is the plan
    artifact)."""
    if not weights or any(
        (not isinstance(w, int)) or w < 0 for w in weights.values()
    ):
        raise ValueError(
            "sampling_plan: weights must be non-negative INTEGER shares"
        )
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("sampling_plan: weights must not all be zero")
    from csvb_spark.operators.text import tokens

    w_col = F.lit(0)
    for src, w in weights.items():
        w_col = F.when(F.col(source_col) == src, F.lit(int(w))).otherwise(w_col)
    per_src = (
        docs.select(
            F.col(source_col),
            F.size(tokens(text_col)).cast("bigint").alias("_tok"),
        )
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_tok").alias("available_tokens"),
        )
    )
    target = F.floor(
        (F.lit(int(token_budget)) * w_col.cast("bigint")).cast("double")
        / F.lit(int(total_w))
    ).cast("bigint")
    return per_src.select(
        source_col,
        "n_docs",
        "available_tokens",
        w_col.cast("int").alias("weight"),
        target.alias("target_tokens"),
        (
            target.cast("double") / F.col("available_tokens").cast("double")
        ).alias("epochs"),
    )


def snake_sharding(
    docs: DataFrame,
    n_shards: int = 16,
    weight_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """SIZE-BALANCED shard assignment: documents ranked heaviest-first
    and dealt boustrophedon (0..n-1 then n-1..0, repeating), the
    classic greedy-balance approximation — every shard's total weight
    lands within one heaviest-document of the others, which hash
    sharding (:func:`export_shard`) cannot promise when document sizes
    are long-tailed (one shard catching two 10 MB docs while another
    gets two tweets skews training-shard consumption).

    ``weight_col`` defaults to the whitespace token count of
    ``text_col``. Output: ``(id, weight, rank, shard)`` with ``rank``
    the 1-based position in the global ``(weight DESC, md5_key, id)``
    order and ``shard = pos if pos < n else 2n-1-pos`` for
    ``pos = (rank-1) mod 2n``.

    Scale shape — the global heaviest-first rank WITHOUT a
    single-reducer sort: the :func:`global_index` two-pass trick over
    VALUE buckets (``weight // step`` with ``step`` sized off one
    scalar max-aggregate to cap the bucket table at ≤4096 rows —
    bucket ranges partition the weight order, so per-bucket ranks +
    descending-bucket offsets compose to the exact global rank). The
    oracle's one-window ROW_NUMBER is the spec this sharded plan must
    equal. Reference scope: beyond-reference (training-pipeline
    extension).
    """
    if n_shards < 1:
        raise ValueError(f"snake_sharding: n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    # NULL weights coalesce to 0 (lightest) — a NULL would otherwise
    # produce a NULL bucket, and the inner join with the offsets table
    # would SILENTLY DROP the document from every shard
    w = F.coalesce(
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.size(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).cast("bigint"),
        F.lit(0),
    )
    keyed = docs.select(
        F.col(id_col), w.alias("weight"), md5_key(id_col, seed).alias("_sn_key")
    )
    max_w = keyed.agg(F.max("weight")).first()[0] or 0
    step = max(1, (int(max_w) + 4096) // 4096)
    keyed = keyed.withColumn(
        "_sn_bucket", (F.col("weight") / F.lit(step)).cast("bigint")
    )
    win = Window.partitionBy("_sn_bucket").orderBy(
        F.col("weight").desc(), "_sn_key", id_col
    )
    counts = keyed.groupBy("_sn_bucket").agg(F.count("*").alias("_sn_n"))
    # offsets accumulate over HEAVIER buckets: descending bucket order
    off_w = Window.orderBy(F.col("_sn_bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_sn_off", F.coalesce(F.sum("_sn_n").over(off_w), F.lit(0))
    ).select("_sn_bucket", "_sn_off")
    ranked = (
        keyed.withColumn("_sn_rn", F.row_number().over(win))
        .join(F.broadcast(offsets), "_sn_bucket")
        .withColumn("rank", F.col("_sn_off") + F.col("_sn_rn"))
    )
    pos = F.pmod(F.col("rank") - 1, F.lit(2 * n_shards))
    shard = F.when(pos < n_shards, pos).otherwise(
        F.lit(2 * n_shards - 1) - pos
    )
    return ranked.select(
        id_col,
        "weight",
        "rank",
        shard.cast("int").alias("shard"),
    )
