"""Text-analysis operators for training-data pipelines.

All JVM-side (built-in functions + higher-order array lambdas): no
Python boundary, so every operator here runs inside whole-stage
codegen and scales linearly with executors — the map-only shape you
want at 100 TB (zero shuffles except where noted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du"],
    "de": ["der", "die", "und", "das", "ein", "nicht", "mit", "ist"],
    "es": ["el", "la", "de", "que", "y", "los", "una", "por"],
}


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization (the BPE-ish regex variant is
    ``bpe_ish_tokens``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def bpe_ish_tokens(col: str | Column = "text") -> Column:
    """Sub-word-ish tokenizer: splits on whitespace AND at
    letter/digit/punct boundaries, the usual pre-tokenization regex
    shape used before BPE merges."""
    c = F.col(col) if isinstance(col, str) else col
    marked = F.regexp_replace(
        F.regexp_replace(c, r"([0-9]+|[^\sA-Za-z0-9]+)", r" $1 "), r"\s+", " "
    )
    return F.split(F.trim(marked), " ")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics. Map-only: no shuffle."""
    t = tokens(text_col)
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_uniq_tokens"),
        F.size(bpe_ish_tokens(text_col)).alias("n_bpe_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
            / F.size(t),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", *extra_cols: str
) -> DataFrame:
    """Heuristic quality signals: length, punctuation/digit/upper
    ratios, stopword ratio, and a coarse bucket. Map-only.
    ``extra_cols`` are passed through untouched (e.g. a grouping key
    for :func:`adaptive_quality_filter`).

    Built from parsed selectExpr strings instead of ~600 fine-grained
    py4j Column calls (round 16 — the p09 F.expr-batching pattern;
    plan construction is per-micro-batch cost in the streaming
    quality gate and per-pass cost in every bench row that composes
    this). Same expression tree through the parser: '\\\\s+'/'\\\\s'
    unescape to the \\s regexes the Column form passed, the literal
    suffix D pins the score addends to DOUBLE exactly like F.lit's
    Python floats (bare SQL 0.2 would parse DECIMAL), and int/int
    ``/`` is double division in both forms."""
    q = f"`{text_col}`"
    t = f"split(trim({q}), '\\\\s+')"
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + ")"
    n = f"length({q})"
    digits = f"length(regexp_replace({q}, '[^0-9]', ''))"
    punct = f"length(regexp_replace({q}, '[A-Za-z0-9\\\\s]', ''))"
    upper = f"length(regexp_replace({q}, '[^A-Z]', ''))"
    stop_hits = f"size(array_intersect({t}, {stop_arr}))"
    score = (
        f"(CASE WHEN {n} < 64 THEN 0.2D ELSE 0.5D END"
        f" + CASE WHEN {stop_hits} > 0 THEN 0.3D ELSE 0.0D END"
        f" + CASE WHEN {punct} / {n} < 0.1D THEN 0.2D ELSE 0.0D END)"
    )
    return docs.selectExpr(
        "doc_id",
        f"{n} AS n_chars",
        f"size({t}) AS n_tokens",
        f"round({digits} / {n}, 6) AS digit_ratio",
        f"round({punct} / {n}, 6) AS punct_ratio",
        f"round({upper} / {n}, 6) AS upper_ratio",
        f"{stop_hits} AS en_stopword_hits",
        f"round({score}, 2) AS quality_score",
        *[f"`{c}`" for c in extra_cols],
    )


def adaptive_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    keep_num: int = 9,
    keep_den: int = 10,
) -> DataFrame:
    """Per-group adaptive quality filtering: keep the best
    ``keep_num/keep_den`` fraction of each group ranked by the
    heuristic quality score.

    Fixed-threshold filters mis-calibrate across heterogeneous sources
    (a threshold strict for a curated source deletes most of a noisy
    one); ranking *within* the group adapts the cutoff per source. The
    keep fraction is an integer comparison (``rank*den <= num*count``)
    — no float threshold exists, so engines can't disagree on the
    boundary row. Ties break by token count then doc_id: the survivor
    set is deterministic at any parallelism.

    One shuffle on ``group_col``; both window functions and the filter
    run inside the same exchange. Skewed sources are real at corpus
    scale (one crawl dominates) — for those, pre-aggregate the group
    counts and broadcast-join the cutoffs instead of windowing.

    Output: ``(doc_id, <group_col>, quality_score, rk, n_group)``.
    """
    from pyspark.sql import Window

    q = quality_score(docs, text_col, group_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("quality_score").desc(), F.col("n_tokens").desc(), F.col("doc_id")
    )
    ranked = q.select(
        "doc_id",
        group_col,
        "quality_score",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy(group_col)).alias("n_group"),
    )
    # ceiling semantics: keep while the ALREADY-kept count is under the
    # quota — keeps ceil(num/den * n) per group, so a 1-doc source keeps
    # its document instead of being silently erased by a floor cutoff
    return ranked.filter(
        (F.col("rk") - 1) * keep_den < keep_num * F.col("n_group")
    )


def lang_guess(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword heuristic language ID: count distinct stopword
    hits per language, take the argmax (ties broken by language code).
    Map-only; the stopword arrays are literals, not a join."""
    t = F.array_distinct(tokens(text_col))
    scores = [
        F.size(
            F.array_intersect(t, F.array(*[F.lit(w) for w in words]))
        ).alias(f"hits_{lang}")
        for lang, words in STOPWORDS.items()
    ]
    scored = docs.select("doc_id", "lang", *scores)
    langs = list(STOPWORDS)
    # argmax via greatest + chained when (deterministic tie-break:
    # first language in sorted order wins)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.lit("unknown")
    for lang in sorted(langs, reverse=True):
        guess = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), lang
        ).otherwise(guess)
    return scored.select(
        "doc_id", "lang", *[f"hits_{lang}" for lang in langs], guess.alias("guess_lang")
    )


# PII patterns kept to the regex subset Java (Spark) and RE2 (DuckDB
# oracle) agree on: character classes, bounded repeats, \b, \d.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_redact_col(text: Column) -> Column:
    """The redaction rewrite alone, as a Column — for callers that
    only need the redacted text (the streaming sink projects this
    directly onto the batch instead of computing the count columns
    and joining them back on doc_id; round-15 optimization)."""
    redacted = text
    for kind, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    return redacted


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / phone numbers / IPv4s, keeping per-kind match
    counts (counted on the ORIGINAL text, before any rewriting, so
    kinds never see each other's placeholder tokens). Map-only pure
    regex work — whole-stage codegen, zero shuffles, the shape a
    100 TB scrub pass needs."""
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    ]
    return docs.select(
        "doc_id", *counts, pii_redact_col(text).alias("redacted")
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplicate n-gram fractions — the standard repetition quality
    signal for corpus filtering (high duplicate-bigram fraction marks
    boilerplate / degenerate text). Map-only higher-order array work;
    1-indexed ``element_at`` so the same arithmetic is expressible in
    the DuckDB oracle's list comprehensions."""
    words = F.filter(tokens(text_col), lambda x: x != F.lit(""))
    n = F.size(words)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
    )
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(words)) / n, 6).alias(
            "dup_word_ratio"
        ),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(bigrams)) / F.size(bigrams), 6
        ).alias("dup_bigram_ratio"),
    )


def tfidf_keywords(
    docs: DataFrame, text_col: str = "text", top_k: int = 3
) -> DataFrame:
    """Top-``top_k`` keywords per document by a TF-IDF-style score.

    The score is ``tf * n_docs / df`` (rounded to 6 places) — a
    log-free IDF so the arithmetic is integer-multiply + one IEEE
    double division, bit-identical in any engine (``ln`` is NOT
    reproducible across libm implementations; ratios are). Ranking
    ties break on the term text ascending.

    Plan shape (the one you want at 100 TB): explode tokens map-side →
    partial-aggregated ``groupBy(doc_id, term)`` count (shuffle 1,
    fixed-width rows) → document frequency from a second partial agg
    over the term dimension (shuffle 2, vocabulary-sized) → equi-join
    scores back on ``term`` (vocabulary join — AQE broadcasts it when
    the vocab is small; at web scale it stays a shuffle join, which is
    correct: a vocab can be billions of terms) → per-document top-k
    window (re-uses shuffle 1's doc_id clustering). No step touches
    Python; everything is whole-stage codegen.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != F.lit("")
    )
    term_counts = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    doc_freq = term_counts.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    from pyspark.sql import Window

    scored = (
        term_counts.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf") * F.col("n_docs") / F.col("df"), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


def gram_key_exprs(gram: Column, wide: bool) -> list[Column]:
    """Shuffle-key column(s) for a gram expression: ``gh`` (xxhash64)
    by default; with ``wide`` a second independently-seeded hash
    ``gh2`` (xxhash64 of (gram, 1) — the extra literal column re-seeds
    the avalanche) rides along. One 64-bit key birthday-collides at
    ~2^32 distinct grams — a real correctness cliff over a 100 TB
    corpus; the 128-bit composite pushes that to ~2^64. Keys stay
    fixed-width ints on the wire either way (8 vs 16 bytes)."""
    exprs = [F.xxhash64(gram).alias("gh")]
    if wide:
        exprs.append(F.xxhash64(gram, F.lit(1)).alias("gh2"))
    return exprs


def gram_key_struct(gram: Column, wide: bool) -> Column:
    """:func:`gram_key_exprs` packed as a named struct — for contexts
    that must carry the key(s) through an array (``transform`` →
    ``explode``). ``named_struct`` because plain ``struct`` drops
    inner aliases to ``colN`` field names."""
    pairs: list[Column] = [F.lit("gh"), F.xxhash64(gram)]
    if wide:
        pairs += [F.lit("gh2"), F.xxhash64(gram, F.lit(1))]
    return F.named_struct(*pairs)


def gram_key_cols(wide: bool) -> list[str]:
    """The join/groupBy key names matching :func:`gram_key_exprs`."""
    return ["gh", "gh2"] if wide else ["gh"]


def char_shingles(col: str | Column, k: int = 4) -> Column:
    """Distinct character k-grams (shingles) of lower(col).

    Built by zipping k shifted slices of the CHARACTER ARRAY
    (``split(low, '')``) rather than ``transform(sequence(...),
    i -> low.substr(i, k))``: an expression referenced inside a
    higher-order lambda re-evaluates per element, so the substr form
    re-lowered the whole document once per position — quadratic in
    text length (measured 4.1 s → linear on the sf0.1 shingle
    explode). Semantics preserved exactly: tail positions truncate
    (NULL-padded zip + ''-joined concat_ws), the empty string keeps
    its single '' shingle, NULL propagates."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    chars = F.split(low, "")
    m = F.greatest(F.size(chars) - (k - 1), F.lit(1))
    acc = F.slice(chars, 1, m)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(chars, 1 + j, m), lambda a, b: F.concat_ws("", a, b)
        )
    # split('') of '' is [] (not ['']) — restore the old substr
    # behavior: an empty text has exactly one empty shingle, and NULL
    # text keeps the old [NULL] single-element array (substr of NULL)
    return (
        F.when(low.isNull(), F.array(F.lit(None).cast("string")))
        .when(F.length(low) == 0, F.array(F.lit("")))
        .otherwise(F.array_distinct(acc))
    )


def word_grams_full(col: str | Column, k: int = 13) -> Column:
    """Distinct FULL-WINDOW word k-grams of lower(col): positions
    1..len-k+1 only, space-joined — a document with fewer than ``k``
    words yields NO grams, so it can never trip a k-gram overlap gate.
    This is the GPT-3/PaLM/Llama decontamination convention (13-gram
    overlap between train documents and eval sets); contrast
    ``dedup.word_shingles``, whose tail shingles truncate (right for
    MinHash similarity, wrong here: a truncated tail gram would let a
    12-word document 'share a 13-gram'). Same zip-with construction as
    char_shingles/word_shingles (linear, not quadratic — children of
    zip_with evaluate once per row, unlike expressions referenced
    inside a transform lambda)."""
    if k < 1:
        # loud validation, matching _grams_col's unit check: k=0 would
        # silently degenerate to unigrams via slice(t, 1, size+1)
        raise ValueError(f"word_grams_full: k must be >= 1, got {k}")
    c = F.col(col) if isinstance(col, str) else col
    # filter empty tokens: Spark's trim() strips only SPACES and
    # split(\s+) keeps edge empties, so 'w0 … w11\n' would tokenize to
    # 13 tokens and mint a phantom '13-gram' ending in a space —
    # breaking the fewer-than-k-words-never-match invariant (round-14
    # self-review finding, runtime-reproduced; the DuckDB oracles
    # apply the same list_filter so both engines agree)
    t = F.filter(
        F.split(F.trim(F.lower(F.coalesce(c, F.lit("")))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    n_full = F.size(t) - (k - 1)
    m = F.greatest(n_full, F.lit(0))
    acc = F.slice(t, 1, m)
    for j in range(1, k):
        # every slice has >= m elements when n_full > 0, so no
        # NULL-padding ever reaches concat_ws: all grams are full
        acc = F.zip_with(
            acc, F.slice(t, 1 + j, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(n_full <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(acc)
    )


def rolling_fingerprint(docs: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min/max xxhash64 over the
    rolling k-gram window set plus a combined 64-bit fingerprint.
    Map-only (the hash work happens inside one projection)."""
    sh = char_shingles(text_col, k)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    return docs.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.xxhash64(F.array_min(hashes), F.array_max(hashes), F.size(sh)).alias(
            "fingerprint"
        ),
        F.size(sh).alias("n_shingles"),
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Overlapping fixed-size token-window chunking — the step before
    sequence packing when documents exceed the training context.

    Chunk starts form the arithmetic sequence 1, 1+stride, … up to
    ``greatest(n - chunk_tokens + 1, 1)``; the final window may be
    shorter than ``chunk_tokens`` (it is NOT padded — padding is the
    packer's job), and with ``stride < chunk_tokens`` consecutive
    chunks overlap by ``chunk_tokens - stride`` tokens. Map-only: the
    explode multiplies rows ~n/stride× inside the scan stage, no
    shuffle anywhere.

    Output: ``(doc_id, chunk_id, chunk_start, chunk_text, n_tokens)``
    with 1-based token positions and ``chunk_id = (start-1)/stride``.
    """
    t = tokens(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(t) - (chunk_tokens - 1), F.lit(1)),
        F.lit(stride),
    )
    exploded = docs.select(
        "doc_id", t.alias("t"), F.explode(starts).alias("chunk_start")
    )
    piece = F.slice(F.col("t"), F.col("chunk_start"), F.lit(chunk_tokens))
    return exploded.select(
        "doc_id",
        ((F.col("chunk_start") - 1) / stride).cast("int").alias("chunk_id"),
        "chunk_start",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def bigram_familiarity(
    docs: DataFrame, text_col: str = "text", wide_gram_keys: bool = False
) -> DataFrame:
    """Corpus-LM familiarity scoring, integer-only: train a bigram
    count table over the corpus in the same pass that scores each
    document against it. High ``n_rare`` / low ``familiarity`` marks
    out-of-distribution or degenerate text — the count-based stand-in
    for perplexity filtering (log-prob floats would be engine-fragile;
    counts are exact).

    Output per document: ``n_bigrams`` (token count - 1, floored at
    0), ``familiarity`` (sum over the doc's bigram occurrences of that
    bigram's global count, multiplicity included), and ``n_rare``
    (occurrences whose bigram appears exactly once in the corpus —
    necessarily in this doc).

    Plan: the bigram explode feeds both the count table (partial-
    aggregated groupBy) and the scoring join — the explode subtree is
    recomputed per side (map-only work; persist the grams to trade
    memory for the recompute at very large scale). Bigrams travel as
    xxhash64 int64s, the count table broadcasts in the common case,
    and the per-doc rollup is one keyed shuffle. Same exchange shape
    as ``substring_spans`` — linear in corpus size, no all-pairs.
    ``wide_gram_keys`` widens the key to two seeded hashes past the
    ~2^32-distinct-gram birthday bound (see :func:`gram_key_struct`).
    """
    t = tokens(text_col)
    keys = gram_key_cols(wide_gram_keys)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(t) >= 2,
                # zip_with over shifted slices, not transform(sequence):
                # an outer expression inside a HOF lambda re-evaluates
                # per element — the sequence form re-ran the tokenizer
                # split once per bigram (see dedup.word_shingles)
                F.zip_with(
                    F.slice(t, 1, F.size(t) - 1),
                    F.slice(t, 2, F.size(t) - 1),
                    lambda a, b: gram_key_struct(
                        F.concat_ws(" ", a, b), wide_gram_keys
                    ),
                ),
            ).otherwise(
                F.array().cast(
                    "array<struct<" + ",".join(f"{k}:bigint" for k in keys) + ">>"
                )
            )
        ).alias("g"),
    ).select("doc_id", "g.*")
    counts = grams.groupBy(*keys).agg(F.count("*").alias("n"))
    scored = grams.join(counts, keys).groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("n").alias("familiarity"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("n_rare"),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("familiarity", F.lit(0)).alias("familiarity"),
            F.coalesce("n_rare", F.lit(0)).alias("n_rare"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    wide_gram_keys: bool = False,
) -> DataFrame:
    """Data-selection importance weights (the DSIR shape — Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by how much its hashed-bigram
    distribution resembles a ``target`` subset of the same corpus
    (e.g. a known-high-quality source or language), so the raw pool
    can be importance-resampled toward the target distribution.

    DSIR's weight is a product of per-gram probability ratios; floats
    multiplied in data-dependent order are engine-fragile, so —
    consistent with :func:`bigram_familiarity`'s integer-only design —
    the score is the count-based aggregate ratio

        weight = (target_hits / target_total) / (raw_hits / raw_total)

    where ``target_hits``/``raw_hits`` sum the target/raw corpus
    counts of the doc's bigram occurrences and the totals are global
    gram-occurrence counts. All four operands are exact int64 sums;
    the single double division is IEEE-deterministic. weight > 1 ⇒
    the doc's grams are over-represented in the target: keep-leaning.

    Plan: one bigram explode feeds ONE count table carrying both raw
    and target counts (a conditional sum — no second aggregation over
    the corpus), totals reduce to a broadcast single-row, scoring is
    the same join + keyed rollup shape as ``bigram_familiarity``.
    Linear in corpus size, no all-pairs anywhere; grams travel as
    fixed-width hashes (``wide_gram_keys`` for >2^32 distinct grams).

    Sibling: ``classify.dsir_bucket_weights`` /
    ``classify.dsir_score`` (x131) is the separate-target, per-gram
    log-sum form of the same paper with a PERSISTABLE bucket model
    (train-filter/score CLI pair, streaming gate); this variant stays
    integer-only for a one-shot same-corpus resampling pass.
    Reference scope: beyond-reference (training-pipeline extension).
    """
    t = tokens(text_col)
    keys = gram_key_cols(wide_gram_keys)
    grams = docs.select(
        "doc_id",
        target.cast("int").alias("is_target"),
        F.explode(
            F.when(
                F.size(t) >= 2,
                # zip_with over shifted slices, not transform(sequence):
                # an outer expression inside a HOF lambda re-evaluates
                # per element — the sequence form re-ran the tokenizer
                # split once per bigram (see dedup.word_shingles)
                F.zip_with(
                    F.slice(t, 1, F.size(t) - 1),
                    F.slice(t, 2, F.size(t) - 1),
                    lambda a, b: gram_key_struct(
                        F.concat_ws(" ", a, b), wide_gram_keys
                    ),
                ),
            ).otherwise(
                F.array().cast(
                    "array<struct<" + ",".join(f"{k}:bigint" for k in keys) + ">>"
                )
            )
        ).alias("g"),
    ).select("doc_id", "is_target", "g.*")
    counts = grams.groupBy(*keys).agg(
        F.count("*").alias("n_raw"),
        F.sum("is_target").alias("n_target"),
    )
    totals = F.broadcast(
        counts.agg(
            F.sum("n_raw").alias("raw_total"),
            F.sum("n_target").alias("target_total"),
        )
    )
    scored = (
        grams.join(counts, keys)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("n_target").alias("target_hits"),
            F.sum("n_raw").alias("raw_hits"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .crossJoin(totals)
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("target_hits", F.lit(0)).alias("target_hits"),
            F.coalesce("raw_hits", F.lit(0)).alias("raw_hits"),
            F.when(
                (F.coalesce("raw_hits", F.lit(0)) > 0)
                & (F.col("target_total") > 0),
                F.round(
                    (
                        F.col("target_hits").cast("double")
                        * F.col("raw_total").cast("double")
                    )
                    / (
                        F.col("raw_hits").cast("double")
                        * F.col("target_total").cast("double")
                    ),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("weight"),
        )
    )


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher quality-rule bundle (Rae et al. 2021, Appendix A —
    the de-facto baseline document filter for web-scale pretraining
    corpora): per-document booleans for each rule plus the combined
    ``keep``, so a pipeline can either filter on ``keep`` or audit
    which rule fired per document.

    Rules: word count in [min_words, max_words]; mean word length in
    [min, max] (integer cross-multiplication — no division at all);
    symbol-to-word ratio (# and ellipsis) ≤ max; bullet-started lines
    ≤ max fraction; ellipsis-ended lines ≤ max fraction; fraction of
    words containing an alphabetic char ≥ min; ≥ min_stop_hits
    distinct stopwords present.

    Entirely map-only JVM expressions (regex counts, array filters) —
    zero shuffles, linear in executors, same scaling story as
    ``quality_score``. Thresholds compare against ``ratio × count``
    products, never data-dependent float sums, so any engine agrees
    exactly.
    """
    text = F.col(text_col)
    t = tokens(text_col)
    n_words = F.size(t)
    # chars that sit inside words (mean word length numerator)
    word_chars = F.length(F.regexp_replace(text, r"\s+", ""))
    hash_cnt = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ell_cnt = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("- ") | x.startswith("* ") | x.startswith("• "),
        )
    )
    ell_lines = F.size(F.filter(lines, lambda x: x.endswith("...")))
    alpha_words = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.array_intersect(t, F.array(*[F.lit(w) for w in STOPWORDS["en"]]))
    )
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (word_chars >= F.lit(min_mean_word_len) * n_words)
        & (word_chars <= F.lit(max_mean_word_len) * n_words),
        "r_symbol_ratio": (hash_cnt + ell_cnt)
        <= F.lit(float(max_symbol_word_ratio)) * n_words,
        "r_bullet_lines": bullet_lines
        <= F.lit(float(max_bullet_ratio)) * n_lines,
        "r_ellipsis_lines": ell_lines
        <= F.lit(float(max_ellipsis_ratio)) * n_lines,
        "r_alpha_words": alpha_words
        >= F.lit(float(min_alpha_word_ratio)) * n_words,
        "r_stopwords": stop_hits >= min_stop_hits,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        *[c.alias(name) for name, c in rules.items()],
        keep.alias("keep"),
    )


def c4_line_filter(
    docs: DataFrame,
    segments: Column | None = None,
    text_col: str = "text",
    min_words: int = 3,
    require_terminal: bool = True,
    blocked_line_words: tuple[str, ...] = ("javascript",),
    blocked_doc_phrases: tuple[str, ...] = ("lorem ipsum", "{"),
    min_kept_lines: int = 5,
    joiner: str = "\n",
) -> DataFrame:
    """The C4 line/page filter bundle (Raffel et al. 2020, §2.2 — the
    cleanup pass behind the C4 corpus): keep a line iff it ends in a
    terminal punctuation mark (``.``, ``!``, ``?``, or a closing
    quote), has at least ``min_words`` words, and contains none of
    ``blocked_line_words`` (C4 drops lines with the word
    "javascript"); keep the page iff at least ``min_kept_lines`` lines
    survive and the full text contains none of
    ``blocked_doc_phrases`` (C4 drops pages with "lorem ipsum" or a
    curly brace). All containment checks are case-insensitive.

    ``segments`` is any ``array<string>`` expression over the row
    (default: newline split of ``text_col``) — pass a sentence or
    fixed-window segmentation when the corpus has no newlines.
    ``require_terminal=False`` disables the punctuation rule for
    corpora without it. Output per input doc: ``doc_id``,
    ``n_lines``, ``n_kept``, ``keep_doc``, ``clean_text`` (kept lines
    joined in original order; empty when nothing survives).

    Plan: ENTIRELY map-only — the keep predicate is an ``F.filter``
    lambda over the segment array, the page rules are scalar
    expressions on the same row, and no explode/groupBy round-trip is
    needed because line order is free inside the array. Zero
    shuffles, linear in executors, trivially 100 TB-safe (contrast
    ``line_dedup``, whose cross-document frequency count genuinely
    needs a shuffle). Reference scope: beyond-reference
    (training-pipeline extension).
    """
    # contains('') is vacuously true: an empty blocked term (a shell
    # variable that expanded empty, say) would silently drop every
    # line or every doc — make it an error instead of a data wipe
    for label, terms in (
        ("blocked_line_words", blocked_line_words),
        ("blocked_doc_phrases", blocked_doc_phrases),
    ):
        if any(not t for t in terms):
            raise ValueError(
                f"c4_line_filter: {label} contains an empty term, which"
                " would match every row; drop it or pass ()"
            )
    text = F.col(text_col)
    segs = segments if segments is not None else F.split(text, "\n")

    def _line_keep(s: Column) -> Column:
        # NOT F.trim: that strips SPACES only, so a line ending
        # '. \t' would flunk the terminal-punctuation rule — the
        # differential test caught it. Strip the full \s class.
        st = F.regexp_replace(s, r"^\s+|\s+$", "")
        keep = F.size(F.split(st, r"\s+")) >= F.lit(min_words)
        keep = keep & (F.length(st) > 0)
        if require_terminal:
            keep = keep & st.rlike('[.!?"]$')
        low = F.lower(st)
        for w in blocked_line_words:
            keep = keep & ~low.contains(F.lit(w.lower()))
        return keep

    kept = F.filter(segs, _line_keep)
    # NULL text: size(NULL array) is -1 and boolean algebra over it
    # goes three-valued — pin the whole row to the empty-document
    # outcome (0 lines, keep_doc FALSE) so ``keep_doc`` is always a
    # real boolean, never NULL (the repo-wide keep-column contract).
    n_lines = F.greatest(F.size(segs), F.lit(0))
    n_kept = F.greatest(F.size(kept), F.lit(0))
    doc_ok = n_kept >= F.lit(min_kept_lines)
    low_text = F.lower(F.coalesce(text, F.lit("")))
    for p in blocked_doc_phrases:
        doc_ok = doc_ok & ~low_text.contains(F.lit(p.lower()))
    return docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept"),
        doc_ok.alias("keep_doc"),
        F.concat_ws(joiner, kept).alias("clean_text"),
    )


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    collapse_ws: bool = True,
) -> DataFrame:
    """Canonical text normalization — the step BEFORE any hashing
    operator, because every digest/shingle/minhash in this package is
    byte-exact: 'é' composed and 'e'+U+0301 decomposed are the same
    text to a reader but different md5s, so unnormalized corpora
    under-deduplicate. Pipeline order: control-character strip (keep
    \\t \\n \\r) → Unicode ``form`` normalization (NFC default; NFKC
    folds ligatures/width variants too) → optional whitespace-run
    collapse + trim.

    The control strip and whitespace collapse are JVM regex
    (codegen); the Unicode normalization is an Arrow-batched
    ``pandas_udf`` (`Series.str.normalize`) — there is no Catalyst
    normalization function, and a batch of strings through Arrow is
    the cheapest Python boundary available. Map-only, zero shuffles.

    Output: ``(doc_id, norm_text, changed)``. DuckDB twin for NFC:
    ``nfc_normalize()`` over the same regex steps (oracle x69).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"normalize_text: unknown form {form!r}")

    _form = form

    def _norm_fn(s):
        return s.str.normalize(_form)

    # module-wide `from __future__ import annotations` stringifies
    # inline hints, which pyspark's typehint parser can't resolve —
    # attach real objects instead
    _norm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _unicode_norm = pandas_udf(_norm_fn, "string")

    stripped = F.regexp_replace(
        F.col(text_col), r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""
    )
    norm = _unicode_norm(stripped)
    if collapse_ws:
        norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        (~norm.eqNullSafe(F.col(text_col))).alias("changed"),
    )


def calibrate_keep_threshold(
    df: DataFrame,
    keep_num: int,
    keep_den: int,
    score_col: str = "quality_score",
    id_col: str = "doc_id",
    max_distinct: int = 100_000,
) -> DataFrame:
    """Quantile-calibrated quality gating: find the LARGEST observed
    score threshold ``t`` such that at least ``keep_num/keep_den`` of
    the corpus scores ``>= t``, and mark ``keep = score >= t`` — the
    standard way to turn "keep the best 30%" into a fixed, auditable
    threshold (fixed thresholds mis-calibrate as the corpus mix
    shifts; per-GROUP adaptation is :func:`adaptive_quality_filter`,
    this is the corpus-global twin that yields one reusable number).

    Exact and engine-portable, not approxQuantile: scores here are
    QUANTIZED (``quality_score`` rounds to 2 decimals), so the
    distinct-score histogram is bounded — one fixed-width groupBy, a
    cumulative sum over that bounded table, and integer quota
    comparisons (``cum·den >= num·n`` — no float ratio, so engines
    cannot disagree on the boundary). The guard raises if the score
    column has more than ``max_distinct`` distinct values (use a
    quantized score, or raise the bound knowingly: the histogram
    cumsum runs single-partition).

    NULL scores raise in-plan (``assert_true``) — score every
    document before calibrating (NULL ordering differs across
    engines, so silently grouping them would be non-portable).

    Output: ``(id, score, threshold, keep)``; at least the requested
    fraction is kept, with minimal overshoot (ties at the threshold
    all kept). Driver traffic is three bounded scalars.
    """
    from pyspark.sql import Window

    if keep_den <= 0 or not 0 < keep_num <= keep_den:
        raise ValueError(
            "calibrate_keep_threshold: need 0 < keep_num <= keep_den,"
            f" got {keep_num}/{keep_den}"
        )
    score_t = dict(df.dtypes)[score_col]
    s = (
        F.when(F.col(score_col).isNotNull(), F.col(score_col))
        .otherwise(
            F.assert_true(
                F.col(score_col).isNotNull(),
                F.lit(
                    f"calibrate_keep_threshold: NULL in {score_col!r} —"
                    " score every document before calibrating"
                ),
            ).cast(score_t)
        )
        .alias("_ck_s")
    )
    scored = df.select(F.col(id_col), s)
    # ONE corpus pass: the bounded distinct-score histogram carries
    # everything needed — n = Σ counts, d = rows — so no separate
    # count/countDistinct scan of the table (a second full pass that
    # cross-job exchange reuse could never eliminate). The histogram
    # materializes once (localCheckpoint — it is bounded by
    # max_distinct rows, pennies to store) and serves both the
    # stats probe and the threshold window.
    hist = (
        scored.groupBy("_ck_s")
        .agg(F.count("*").alias("_n"))
        .localCheckpoint(eager=True)
    )
    stats = hist.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n"),
        F.count("*").alias("d"),
    ).first()
    n, d = int(stats["n"]), int(stats["d"])
    if d > max_distinct:
        raise ValueError(
            f"calibrate_keep_threshold: {d} distinct scores exceeds"
            f" max_distinct={max_distinct}; quantize the score first"
        )
    if n == 0:
        return df.select(
            F.col(id_col),
            F.col(score_col),
            F.lit(None).cast(score_t).alias("threshold"),
            F.lit(False).alias("keep"),
        )
    w = Window.orderBy(F.desc("_ck_s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    thr = (
        hist.withColumn("_cum", F.sum("_n").over(w))
        .filter(F.col("_cum") * F.lit(int(keep_den)) >= F.lit(int(keep_num)) * F.lit(n))
        .agg(F.max("_ck_s"))
        .first()[0]
    )
    return df.select(
        F.col(id_col),
        F.col(score_col),
        F.lit(thr).cast(score_t).alias("threshold"),
        (F.col(score_col) >= F.lit(thr)).alias("keep"),
    )


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document CHARACTER entropy — the junk detector quality
    pipelines run before any tokenizer: natural prose sits in a narrow
    entropy band, while base64 blobs / minified code / key-mash spam
    score far above it and single-character padding far below. Output
    per input doc: ``(doc_id, n_chars, n_uniq, entropy)`` with
    ``entropy = ln(L) - (Σ c·ln c)/L`` in nats over the character
    histogram, rounded to 6; empty/NULL text yields ``n_chars 0`` and
    NULL entropy (no silent 0.0 — an empty doc has no distribution).

    Each ``c·ln c`` term is rounded to 6 decimals and summed as
    DECIMAL(18,6) — the x92 skew-report pattern — so the aggregate is
    order-independent and any engine replays it bit-identically
    despite ``ln`` having no cross-libm bit guarantee.

    Plan: one char explode → groupBy (doc_id, char) with map-side
    partial aggregation, so the exchange carries at most
    ``docs × alphabet`` histogram rows, NOT the corpus's characters —
    then one per-doc aggregation. Reference scope: beyond-reference
    (training-pipeline extension).
    """
    chars = docs.select(
        "doc_id",
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "")).alias(
            "_ch"
        ),
    ).filter(F.col("_ch") != "")
    hist = chars.groupBy("doc_id", "_ch").agg(F.count("*").alias("_c"))
    per_doc = hist.groupBy("doc_id").agg(
        F.sum("_c").alias("n_chars"),
        F.count("*").alias("n_uniq"),
        F.sum(
            F.round(F.col("_c") * F.log("_c"), 6).cast("decimal(18,6)")
        ).alias("_nlogn"),
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        F.coalesce("n_uniq", F.lit(0)).cast("bigint").alias("n_uniq"),
        F.round(
            F.log(F.col("n_chars").cast("double"))
            - F.col("_nlogn").cast("double") / F.col("n_chars"),
            6,
        ).alias("entropy"),
    )


def token_fertility(
    docs: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Tokenizer FERTILITY per group — subword tokens emitted per
    whitespace word (the metric tokenizer evaluations report per
    language/source): fertility near 1 means the subword vocabulary
    covers the text natively; high fertility flags content the
    tokenizer will shred into many pieces (costly at training time
    and a proxy for vocabulary mismatch). Uses the repo's BPE-ish
    pre-tokenizer (:func:`bpe_ish_tokens`) as the subword proxy.

    Output per group: ``(<group_col>, n_docs, n_words, n_subwords,
    fertility)`` with ``fertility = round(n_subwords / n_words, 6)``.

    Plan: both token counts are map-only sizes over the same row; ONE
    partial-aggregated groupBy on the group key — the exchange
    carries one row per group per map partition. Reference scope:
    beyond-reference (training-pipeline extension).
    """
    return (
        docs.select(
            F.col(group_col),
            F.size(tokens(text_col)).cast("bigint").alias("_w"),
            F.size(bpe_ish_tokens(text_col)).cast("bigint").alias("_s"),
        )
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_w").alias("n_words"),
            F.sum("_s").alias("n_subwords"),
        )
        .select(
            group_col,
            "n_docs",
            "n_words",
            "n_subwords",
            F.round(F.col("n_subwords") / F.col("n_words"), 6).alias(
                "fertility"
            ),
        )
    )


# Candidate card-like digit run: 13-19 digits, each pair optionally
# separated by ONE space or dash (the common formatting of PANs).
LUHN_CANDIDATE_RE = r"[0-9](?:[ -]?[0-9]){12,18}"


def luhn_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect payment-card-like numbers and VALIDATE them with the
    Luhn checksum — the PII pass regex alone cannot do: most 16-digit
    runs are order ids / hashes, and redacting them wholesale destroys
    data, so production scrubbers gate the redaction on the check
    digit. Output per input doc: ``(doc_id, n_candidates, n_valid,
    valid_cards)`` where ``n_candidates`` counts 13-19-digit runs
    (single space/dash separators allowed), ``n_valid`` counts those
    passing Luhn after separator stripping, and ``valid_cards`` is the
    sorted comma-joined distinct valid digit strings (NULL when none)
    ready for a redaction join or an audit log.

    Entirely higher-order array expressions over one row — map-only,
    zero shuffles, whole-stage codegen; the 100 TB shape of a scrub
    pass. The Luhn sum stays inside the lambda scope (the per-element
    lambdas only touch their own variables, so nothing re-evaluates
    per element — SCALE.md §6). Reference scope: beyond-reference
    (training-pipeline extension; complements :func:`pii_redact`).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    cands = F.regexp_extract_all(text, F.lit(LUHN_CANDIDATE_RE), F.lit(0))
    digits = F.transform(cands, lambda c: F.regexp_replace(c, "[ -]", ""))
    # Luhn: over the REVERSED digits, positions 0,2,4,... count as-is;
    # odd positions double (minus 9 when the double exceeds 9).
    luhn_ok = (
        lambda d: F.aggregate(
            F.transform(
                F.split(F.reverse(d), ""),
                lambda ch, i: F.when(
                    i % 2 == 0, F.ascii(ch) - 48
                ).otherwise(
                    F.when(
                        (F.ascii(ch) - 48) * 2 > 9, (F.ascii(ch) - 48) * 2 - 9
                    ).otherwise((F.ascii(ch) - 48) * 2)
                ),
            ),
            F.lit(0),
            lambda a, x: a + x,
        )
        % 10
        == 0
    )
    valids = F.array_sort(F.array_distinct(F.filter(digits, luhn_ok)))
    return docs.select(
        "doc_id",
        F.size(cands).alias("n_candidates"),
        F.size(valids).alias("n_valid"),
        F.when(F.size(valids) > 0, F.array_join(valids, ",")).alias(
            "valid_cards"
        ),
    )


# (spark_pattern, duckdb_pattern) per script class; Java regex names
# unicode scripts \p{IsX}, RE2 (DuckDB) names them \p{X} — same class
# of characters, different spelling. Order = dominance tiebreak order.
SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("latin", r"\p{IsLatin}"),
    ("han", r"\p{IsHan}"),
    ("cyrillic", r"\p{IsCyrillic}"),
    ("digit", r"[0-9]"),
    ("space", r"\s"),
]


def script_mix(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Unicode SCRIPT histogram — the cheap signal a
    multilingual curation pipeline uses before any language model:
    script mixing (Latin spam inside a Han page, Cyrillic homoglyph
    stuffing) flags machine-generated or adversarial text, and the
    dominant script routes documents to per-script tokenizers. Output
    per input doc: ``(doc_id, n_chars, n_latin, n_han, n_cyrillic,
    n_digit, n_space, n_other, dominant)`` where ``dominant`` is the
    largest class (ties broken in SCRIPT_CLASSES order, ``other``
    last; empty/NULL text is ``other`` — no dominant script).

    Each count is ``length(text) - length(regexp_replace(text, cls,
    ''))`` — pure map-side regex, zero shuffles, whole-stage codegen;
    one linear scan per class over BMP text in both engines.
    Reference scope: beyond-reference (training-pipeline extension).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(text)
    counts = {
        name: n_chars - F.length(F.regexp_replace(text, pat, ""))
        for name, pat in SCRIPT_CLASSES
    }
    counts["other"] = n_chars - sum(counts.values())
    dominant = F.lit("other")
    for name in [n for n, _ in reversed(SCRIPT_CLASSES)]:
        # Later-evaluated = higher priority: >= keeps the earlier
        # SCRIPT_CLASSES entry on ties (applied in reverse).
        dominant = F.when(
            counts[name] >= F.greatest(*[c for k, c in counts.items() if k != name]),
            F.lit(name),
        ).otherwise(dominant)
    # empty/NULL text has every class count 0 — the tie cascade would
    # crown the first SCRIPT_CLASSES entry ('latin'), mislabeling a
    # routing signal; an empty doc has no dominant script
    dominant = F.when(n_chars == 0, F.lit("other")).otherwise(dominant)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        *[counts[name].alias(f"n_{name}") for name, _ in SCRIPT_CLASSES],
        counts["other"].alias("n_other"),
        dominant.alias("dominant"),
    )


def quantile_normalize(
    docs: DataFrame,
    score_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source score NORMALIZATION: replace a raw quality score
    with its within-source percentile, so one global threshold means
    the same thing for every source — raw score distributions differ
    wildly across crawls (a '0.7' from a books source and from a web
    dump are not comparable), and per-source thresholds are the
    calibration chore this op removes. Output: ``(id, group, score,
    pctl)`` with ``pctl = percent_rank()`` over the score within the
    group — ties share a percentile (peer-based rank, no tiebreak
    column, so the result is deterministic AND tie-faithful; both
    engines define it as ``(rank-1)/(n-1)``, 0.0 for a single-row
    group).

    One partitioned window (the group key is the partition — scales
    with sources × their rows, no global sort). Reference scope:
    beyond-reference (training-pipeline extension; feeds
    ``calibrate_keep_threshold`` / ``budget_select`` with comparable
    scores).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(score_col)
    return docs.select(
        F.col(id_col),
        F.col(group_col),
        F.col(score_col).alias("score"),
        F.percent_rank().over(w).alias("pctl"),
    )


def self_line_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """WITHIN-document line dedup — the complement of the cross-doc
    :func:`~csvb_spark.operators.dedup.line_dedup`: templated pages
    repeat their own nav/header/footer lines inside one document, and
    dropping repeats keeps the first occurrence (order preserved, so
    prose stays intact). Output: ``(doc_id, n_lines, n_unique_lines,
    clean_text)``.

    Map-only array work: the line array is projected into a REAL
    column first so the first-occurrence filter's ``array_position``
    probe does not re-evaluate the split per element (the SCALE.md §6
    HOF rule); the filter itself is O(lines²) per document — lines per
    page are dozens, not thousands, and nothing shuffles. Reference
    scope: beyond-reference (training-pipeline extension).
    """
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n")
    staged = docs.select("doc_id", lines.alias("_lines"))
    arr = F.col("_lines")
    kept = F.filter(
        arr, lambda x, i: F.array_position(arr, x) == i + F.lit(1)
    )
    return staged.select(
        "doc_id",
        F.size(arr).alias("n_lines"),
        F.size(kept).alias("n_unique_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
