"""Embedding similarity search over an ``array<float>`` column.

- ``cosine(a, b)``: higher-order-function dot/norm in DOUBLE
  precision — sequential fold, so the result is bit-deterministic
  (matches a sequential oracle).
- ``brute_force_topk``: exact baseline — broadcast the probe(s),
  map-side cosine, TakeOrderedAndProject for the top-k. One pass over
  the corpus, no shuffle except the final k-row gather. This is the
  right *exact* plan at any scale; cost is O(corpus × dim).
- ``hyperplane_lsh_topk``: the scale path — random-hyperplane LSH:
  each vector maps to a small integer bucket (sign bits of dot
  products with fixed pseudo-random hyperplanes); the probe only
  scans its bucket (and optionally Hamming-adjacent buckets). At
  100 TB you persist the bucketed table partitioned by bucket id, so
  a query prunes to ~1/2^bits of the data before any compute.

Hyperplanes are generated from a seeded NumPy RNG on the driver and
inlined as literals — deterministic and tiny (n_planes × dim
doubles), no broadcast machinery needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm2(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = as_double(a), as_double(b)
    return dot(ad, bd) / (norm2(ad) * norm2(bd))


def cosine_pnorm(a: Column, b: Column, b_norm: Column) -> Column:
    """Cosine where ``b``'s norm is already materialized (broadcast
    probe column). HOF aggregates are interpreted, so evaluating
    norm2(probe) per candidate row is a wasted dim-length fold — the
    probe projection computes it once with the SAME norm2 expression,
    keeping the value (and thus the product) bit-identical to
    ``cosine``'s and to the DuckDB oracle's formulation."""
    ad, bd = as_double(a), as_double(b)
    return dot(ad, bd) / (norm2(ad) * b_norm)


def brute_force_topk(
    embeddings: DataFrame,
    probe: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of ``embeddings`` against a 1-row probe.

    probe must have columns (id_col, vec_col); output:
    (vec_id, cos_sim) ordered desc with id tiebreak.
    """
    p = F.broadcast(
        probe.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("probe_vec"),
            norm2(as_double(F.col(vec_col))).alias("probe_norm"),
        )
    )
    return (
        embeddings.crossJoin(p)
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            id_col,
            F.round(
                cosine_pnorm(
                    F.col(vec_col), F.col("probe_vec"), F.col("probe_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def matryoshka_topk(
    embeddings: DataFrame,
    probe: DataFrame,
    dims: int = 16,
    k: int = 10,
    rerank_k: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka funnel retrieval (Kusupati et al. 2022): shortlist
    ``rerank_k`` candidates by cosine over the FIRST ``dims``
    dimensions (MRL-trained embeddings pack most signal into the
    prefix), then rerank the shortlist with full-dimension cosine and
    return the top ``k``. Output: ``(vec_id, cos_low, cos_full)``
    ordered by ``cos_full`` desc with id tiebreak.

    Both stages are exact given their inputs (sequential-fold dot
    products rounded to 6, ties broken by id), so any engine replays
    the same shortlist and the same final k — the approximation is
    the funnel itself (a true neighbor outside the low-dim shortlist
    is unrecoverable, the standard MRL trade).

    Plan: ONE corpus pass — the probe prefix/norms broadcast, the
    low-dim cosine is map-side over ``slice(vec, 1, dims)`` (a
    dims/64 FLOP cut; at 100 TB store the prefix as its own parquet
    column and the scan reads dims/full_dim of the bytes), and the
    full vector rides the rerank_k-bounded TakeOrderedAndProject so
    the rerank needs no second scan or join. Reference scope:
    beyond-reference (training-pipeline extension).
    """
    if dims < 1:
        raise ValueError(f"matryoshka_topk: dims must be >= 1, got {dims}")
    if rerank_k < k:
        raise ValueError(
            f"matryoshka_topk: rerank_k ({rerank_k}) must be >= k ({k})"
        )
    # single-probe contract, ENFORCED (the shortlist/rerank LIMITs are
    # global — a multi-row probe would interleave different probes'
    # candidates into one meaningless top-k with no probe_id to tell
    # them apart). The count is one tiny job on a table that is about
    # to broadcast anyway; batch probing is knn_join's job.
    n_probe = probe.limit(2).count()
    if n_probe != 1:
        raise ValueError(
            f"matryoshka_topk: probe must be exactly 1 row, got "
            f"{'>=2' if n_probe > 1 else n_probe} — for a probe BATCH use "
            "knn_join (optionally with centroids= for the IVF path)"
        )

    def pref(c: Column) -> Column:
        return F.slice(c, 1, dims)

    p = F.broadcast(
        probe.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("probe_vec"),
            norm2(as_double(F.col(vec_col))).alias("probe_norm"),
            pref(F.col(vec_col)).alias("probe_pref"),
            norm2(as_double(pref(F.col(vec_col)))).alias("probe_pref_norm"),
        )
    )
    shortlist = (
        embeddings.crossJoin(p)
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            id_col,
            vec_col,
            "probe_vec",
            "probe_norm",
            F.round(
                cosine_pnorm(
                    pref(F.col(vec_col)),
                    F.col("probe_pref"),
                    F.col("probe_pref_norm"),
                ),
                6,
            ).alias("cos_low"),
        )
        .orderBy(F.desc("cos_low"), F.asc(id_col))
        .limit(rerank_k)
    )
    return (
        shortlist.select(
            id_col,
            "cos_low",
            F.round(
                cosine_pnorm(F.col(vec_col), F.col("probe_vec"), F.col("probe_norm")),
                6,
            ).alias("cos_full"),
        )
        .orderBy(F.desc("cos_full"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def bucket_id(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket: integer whose bit p is sign(vec · plane_p).

    NULL when the vector's length differs from the plane dim —
    ``zip_with`` pads the shorter side with NULLs, which would
    otherwise turn every dot product NULL and silently funnel the
    whole corpus into bucket 0."""
    vd = as_double(vec)
    acc = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        acc = acc + F.when(dot(vd, lit_plane) > 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return F.when(F.size(vec) == len(planes[0]), acc)


def bucketize(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector its LSH bucket (map-only). At scale, write
    this out partitioned/bucketed by `bucket` so probes prune I/O."""
    planes = _hyperplanes(n_planes, dim, seed)
    return embeddings.withColumn("bucket", bucket_id(F.col(vec_col), planes))


def hyperplane_lsh_topk(
    embeddings: DataFrame,
    probe: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hamming_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in the probe's bucket(s).

    ``hamming_probe`` is the multi-probe RADIUS: all buckets within
    that Hamming distance of the probe's bucket are scanned (a vector
    near a hyperplane lands on either side, so the nearest neighbors
    of a probe concentrate in buckets a few bits away). 0 = exact
    bucket only; 1 adds the n_planes adjacent buckets; r adds
    C(n_planes, r) more per extra bit — at scale each bucket is one
    partition of a bucket-partitioned table, so the scan cost is
    (buckets probed)/2^n_planes of the corpus.
    """
    import itertools

    planes = _hyperplanes(n_planes, dim, seed)
    bucketed = bucketize(embeddings, n_planes, dim, seed, vec_col)
    pb = bucket_id(F.col(vec_col), planes)
    masks = [
        sum(1 << b for b in bits)
        for r in range(1, min(hamming_probe, n_planes) + 1)
        for bits in itertools.combinations(range(n_planes), r)
    ]
    probe_buckets = F.array(pb, *[pb.bitwiseXOR(F.lit(m)) for m in masks])
    p = F.broadcast(
        probe.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("probe_vec"),
            probe_buckets.alias("probe_buckets"),
            norm2(as_double(F.col(vec_col))).alias("probe_norm"),
        )
    )
    return (
        bucketed.join(p, F.array_contains(F.col("probe_buckets"), F.col("bucket")))
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            id_col,
            F.round(
                cosine_pnorm(
                    F.col(vec_col), F.col("probe_vec"), F.col("probe_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    probe: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: dict[int, list[float]] | None = None,
    max_probes: int = 10_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize every
    vector to its nearest centroid, then scan only the probe's
    ``nprobe`` closest centroid lists.

    The BOUNDED-PROBE contract is enforced: the probe side collects to
    the driver (the IVF query shape — a handful of query vectors
    against a big corpus), so a probe table larger than ``max_probes``
    raises with a pointer to :func:`knn_join`, the probe-side-
    distributed operator, instead of silently materializing on the
    driver.

    The coarse quantizer is deterministic — centroid c is the vector
    with ``vec_id == c`` (c < n_centroids), or a trained codebook
    passed via ``centroids`` ({cid: components}, e.g. a pivoted
    :func:`kmeans_train` result) — either way the operator is
    SQL-expressible and oracle-checkable.
    Collecting the centroid table to the driver is the standard IVF
    shape: the quantizer is a bounded K×dim constant replicated to
    every executor (like hyperplanes in ``hyperplane_lsh_topk``), NOT
    a data-path collect. At 100 TB you'd persist the assignment,
    partitioned by ``cid``, so a probe prunes to nprobe/K of the
    corpus at the file level before any distance math.

    Ranking (both for assignment and probing) orders by cosine DESC
    with centroid-id ASC tie-break.
    """
    import math

    if centroids is not None:
        # a trained quantizer (e.g. kmeans_train output, pivoted to
        # {cid: [components]}) replaces the seed vectors; n_centroids
        # is IGNORED in this mode — the codebook defines K. Validate
        # here: a short or ragged codebook would otherwise surface as
        # silently reduced probe coverage or a downstream size error.
        if len(centroids) < nprobe:
            raise ValueError(
                f"codebook has {len(centroids)} centroids but nprobe={nprobe}"
            )
        dims = {len(v) for v in centroids.values()}
        if len(dims) != 1:
            raise ValueError(
                f"codebook dimensions are inconsistent: {sorted(dims)}"
            )
        cents = [(cid, centroids[cid]) for cid in sorted(centroids)]
    else:
        cents = [
            (int(r.cid), list(r.cvec))
            for r in sorted(
                embeddings.filter(F.col(id_col) < n_centroids)
                .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
                .collect(),
                key=lambda r: r.cid,
            )
        ]
    # (cid, components, ||c||) — the norm is a Python sequential fold,
    # same IEEE order as the SQL dot product, so every ranking that
    # divides by it stays bit-identical to the oracle's formulation.
    # Assignment/probing rank by dot(v,c)/||c||: the row's own norm is
    # a positive constant across centroids, so dropping it preserves
    # the cosine ORDER while cutting the per-row cost.
    cent_lits = []
    for cid_, cvec_ in cents:
        vals = [float(x) for x in cvec_]
        acc = 0.0  # sequential fold — same IEEE order as the SQL dot product
        for v in vals:
            acc += v * v
        cent_lits.append((cid_, vals, math.sqrt(acc)))

    from csvb_spark.operators.dedup import spread

    # bounded-probe contract in ONE driver job (round-15 optimization:
    # the separate limit+count pre-flight was a second job per call):
    # collect at most max_probes + 1 rows — the limit pushes into the
    # scan, so an over-bound probe still fails fast without ever
    # materializing more than one row past the bound
    p_rows = (
        probe.select(F.col(id_col).alias("pid"), F.col(vec_col).alias("pvec"))
        .limit(max_probes + 1)
        .collect()
    )
    if len(p_rows) > max_probes:
        raise ValueError(
            f"ivf_topk: probe side exceeds max_probes={max_probes} rows;"
            " it is collected to the driver (the bounded-probe IVF"
            " contract). Use knn_join for a large probe table (broadcast"
            "/cell-equi-join scoring, fully distributed), or raise"
            " max_probes."
        )

    if len(p_rows) == 1:
        # --- fully-vectorized single-probe path (the common shape) ---
        # Corpus-side assignment + scoring is the hot path; expression
        # HOFs are interpreted (never whole-stage-codegen'd), so one
        # Arrow-batched pandas UDF computes, per batch:
        #   cid   — argmax over a batch×K float64 matmul (ties → first
        #           index = lowest cid, matching ORDER BY sim DESC,
        #           cid ASC; matmul differs from the sequential fold
        #           only in the last ulp, which continuous embedding
        #           data never turns into a flipped argmax),
        #   vnorm — sqrt of np.add.accumulate(v*v)[-1]: accumulate is
        #           a strict LEFT-FOLD (unlike pairwise sum/matmul),
        #           so this is bit-identical to the SQL/DuckDB
        #           sequential fold (verified against
        #           list_dot_product on the fixture data),
        #   pdot  — add.accumulate(v*probe)[-1], same left-fold.
        # Downstream the plan is scalar codegen only: filter on
        # cid ∈ probe_cids, cos = pdot/(vnorm*pnorm), top-k via
        # TakeOrderedAndProject. No HOF evaluation anywhere.
        # The closure captures only numpy arrays (pickled by value —
        # no csvb_spark import needed on executors).
        from pyspark.sql.functions import pandas_udf

        pid = int(p_rows[0].pid)
        pv = [float(x) for x in p_rows[0].pvec]

        def _fold_dot(a: list[float], b: list[float]) -> float:
            acc = 0.0  # sequential fold — same IEEE order as SQL
            for x, y in zip(a, b):
                acc += x * y
            return acc

        cent_vecs = [[float(x) for x in cv] for _, cv in cents]
        # probe ranking: ORDER BY dot(p,c)/||c|| DESC, cid ASC — all
        # Python left-folds, bit-identical to the oracle's ranking
        scored = sorted(
            (-(_fold_dot(pv, cv) / nc), cid)
            for cv, (cid, _, nc) in zip(cent_vecs, cent_lits)
        )
        probe_cids = [cid for _, cid in scored[:nprobe]]
        pnorm = math.sqrt(_fold_dot(pv, pv))

        cid_arr = np.array([cid for cid, _, _ in cent_lits], dtype=np.int64)
        cmat = np.array(cent_vecs, dtype=np.float64)
        cnorms = np.array([nc for _, _, nc in cent_lits], dtype=np.float64)
        proj = (cmat / cnorms[:, None]).T  # dim × K
        pvec_np = np.array(pv, dtype=np.float64)

        @pandas_udf("struct<cid:bigint,vnorm:double,pdot:double>")
        def _feat(vs: pd.Series) -> pd.DataFrame:
            import numpy as _np

            if len(vs) == 0:
                return pd.DataFrame({"cid": [], "vnorm": [], "pdot": []})
            v = _np.stack([_np.asarray(x, dtype=_np.float64) for x in vs])
            return pd.DataFrame(
                {
                    "cid": cid_arr[_np.argmax(v @ proj, axis=1)],
                    "vnorm": _np.sqrt(_np.add.accumulate(v * v, axis=1)[:, -1]),
                    "pdot": _np.add.accumulate(v * pvec_np, axis=1)[:, -1],
                }
            )

        # nondeterministic marker (round-15, guide §4.4): the cell
        # filter below references f.cid, and the optimizer's pushdown
        # otherwise DUPLICATES the whole UDF — one ArrowEvalPython
        # under the pushed filter, a second above it re-computing
        # vnorm/pdot for the survivors (two Python round-trips of the
        # full embedding column, measured in the x14 plan). The values
        # are deterministic; the marker only forbids the reorder.
        _feat = _feat.asNondeterministic()

        return (
            spread(embeddings)
            .filter(F.col(id_col) != pid)
            .select(id_col, _feat(F.col(vec_col)).alias("f"))
            .filter(F.col("f.cid").isin(probe_cids))
            .select(
                id_col,
                F.round(
                    F.col("f.pdot") / (F.col("f.vnorm") * F.lit(pnorm)), 6
                ).alias("cos_sim"),
            )
            .orderBy(F.desc("cos_sim"), F.asc(id_col))
            .limit(k)
        )

    if not p_rows:
        return embeddings.select(
            id_col, F.lit(0.0).alias("cos_sim")
        ).limit(0)

    # --- multi-probe path: the SAME vectorized shape with a probe
    # MATRIX. One Arrow-batched pandas UDF computes, per batch, the
    # corpus-side cell (argmax matmul — ranking only, as above), the
    # row norm (left-fold accumulate, bit-identical to the SQL fold)
    # and a dim-folded dot against EVERY probe at once
    # (batch × P × dim accumulate → batch × P, each entry a strict
    # left-fold). Downstream is scalar codegen: posexplode the pdots,
    # keep (row, probe) pairs whose cell is in that probe's probed
    # set (literal array lookup — the probe count is bounded), cos =
    # pdot/(vnorm·pnorm), global top-k via TakeOrderedAndProject.
    # No join in the plan and no interpreted HOF evaluation — the r2
    # fallback evaluated K HOF dot products per corpus row.
    from pyspark.sql.functions import pandas_udf

    def _fold_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0  # sequential fold — same IEEE order as SQL
        for x, y in zip(a, b):
            acc += x * y
        return acc

    cent_vecs = [[float(x) for x in cv] for _, cv in cents]
    probes_py = [(int(r.pid), [float(x) for x in r.pvec]) for r in p_rows]
    probe_cids: list[list[int]] = []
    pnorms: list[float] = []
    for _pid, pv in probes_py:
        scored = sorted(
            (-(_fold_dot(pv, cv) / nc), cid)
            for cv, (cid, _, nc) in zip(cent_vecs, cent_lits)
        )
        probe_cids.append([cid for _, cid in scored[:nprobe]])
        pnorms.append(math.sqrt(_fold_dot(pv, pv)))

    cid_arr = np.array([cid for cid, _, _ in cent_lits], dtype=np.int64)
    cmat = np.array(cent_vecs, dtype=np.float64)
    cnorms = np.array([nc for _, _, nc in cent_lits], dtype=np.float64)
    proj = (cmat / cnorms[:, None]).T  # dim × K
    pmat = np.array([pv for _, pv in probes_py], dtype=np.float64)  # P × dim

    @pandas_udf("struct<cid:bigint,vnorm:double,pdots:array<double>>")
    def _feat_multi(vs: pd.Series) -> pd.DataFrame:
        import numpy as _np

        if len(vs) == 0:
            return pd.DataFrame({"cid": [], "vnorm": [], "pdots": []})
        v = _np.stack([_np.asarray(x, dtype=_np.float64) for x in vs])
        # dim-axis loop: the same strict left-fold (0.0 + x_0 + x_1 …,
        # matching the SQL aggregate's F.lit(0.0) seed) in O(batch × P)
        # memory — the broadcast batch×P×dim temporary this replaces
        # was ~4 GB per batch at 10k rows × 100 probes × 512 dims
        pdots = _np.zeros((v.shape[0], pmat.shape[0]), dtype=_np.float64)
        for d in range(v.shape[1]):
            pdots += v[:, d, None] * pmat[None, :, d]
        return pd.DataFrame(
            {
                "cid": cid_arr[_np.argmax(v @ proj, axis=1)],
                "vnorm": _np.sqrt(_np.add.accumulate(v * v, axis=1)[:, -1]),
                "pdots": list(pdots),
            }
        )

    # same §4.4 duplication guard as the single-probe path: the cell
    # membership filter would otherwise push below the posexplode and
    # clone the UDF evaluation
    _feat_multi = _feat_multi.asNondeterministic()

    cids_lit = F.array(
        *[F.array(*[F.lit(c) for c in cl]) for cl in probe_cids]
    )
    pid_lit = F.array(*[F.lit(pid) for pid, _ in probes_py])
    pnorm_lit = F.array(*[F.lit(x) for x in pnorms])
    j1 = F.col("j") + 1  # posexplode is 0-based, element_at 1-based
    return (
        spread(embeddings)
        .select(id_col, _feat_multi(F.col(vec_col)).alias("f"))
        .select(
            id_col,
            F.col("f.cid").alias("cid"),
            F.col("f.vnorm").alias("vnorm"),
            F.posexplode("f.pdots").alias("j", "pdot"),
        )
        .filter(F.array_contains(F.element_at(cids_lit, j1), F.col("cid")))
        .filter(F.col(id_col) != F.element_at(pid_lit, j1))
        .select(
            id_col,
            F.round(
                F.col("pdot") / (F.col("vnorm") * F.element_at(pnorm_lit, j1)), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 scalar quantization: per-vector ``scale`` =
    max(|v|)/127 and ``q_i = floor(v_i/scale + 0.5)`` ∈ [-127, 127] —
    4× smaller storage than float32 for a 100 TB embedding table,
    with the reconstruction ``q_i × scale`` good to ~scale/2 per
    coordinate. Map-only.

    Determinism notes: the round is spelled ``floor(x + 0.5)`` (not
    ROUND) so every engine agrees on .5 boundaries, and
    ``recon_err`` (the L2 reconstruction error) folds sequentially,
    matching DuckDB's ``list_dot_product`` bit-for-bit. A zero vector
    quantizes to zeros with scale 0.
    """
    v = as_double(F.col(vec_col))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.transform(
        v,
        lambda x: F.when(scale == 0, F.lit(0).cast("bigint")).otherwise(
            F.floor(x / scale + F.lit(0.5)).cast("bigint")
        ),
    )
    diff = F.zip_with(v, q, lambda x, qi: x - qi * scale)
    return embeddings.select(
        id_col,
        F.round(scale, 9).alias("scale"),
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias("q_str"),
        F.round(F.sqrt(dot(diff, diff)), 6).alias("recon_err"),
    )


def neardup_pairs_by_label(
    embeddings: DataFrame,
    min_cos: float = 0.8,
    max_id: int | None = 2000,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key (label).

    The label acts as the blocking bucket (like LSH buckets at
    scale); pairs explode only within a block.
    """
    e = embeddings if max_id is None else embeddings.filter(F.col("vec_id") < max_id)
    a = e.select("label", F.col("vec_id").alias("id_a"), F.col(vec_col).alias("va"))
    b = e.select("label", F.col("vec_id").alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= min_cos)
        .select("label", "id_a", "id_b", "cos_sim")
    )


def kmeans_train(
    embs: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic distributed k-means (Lloyd's), the trainer for
    :func:`ivf_topk`'s coarse quantizer.

    Determinism contract (everything an engine could disagree on is
    pinned):

    - init = the ``k`` lowest-id vectors (the same seeding
      :func:`ivf_topk` uses for its quantizer);
    - assignment distance is ``dot(c,c) - 2*dot(v,c)`` with the
      sequential-fold :func:`dot` on both engines (``||v||²`` is
      constant per row and cannot change the argmin); ties go to the
      lower centroid id via lexicographic ``array_min`` on
      ``(distance, cid)`` structs;
    - the centroid update is a per-(cid, dim) mean of DECIMAL(18,6)
      sums — order-independent, so parallel partial aggregation
      cannot perturb it;
    - a cluster that loses all members keeps its previous centroid.

    Per iteration: one map-only assignment pass against centroid
    literals + one shuffle (the (cid, dim) aggregate, ≤ k×dim groups).
    The driver holds only the k×dim quantizer (same bounded-constant
    pattern as ``ivf_topk``'s centroid collect); at 100 TB swap the
    k interpreted assignment folds for the pandas_udf matmul exactly
    as ``ivf_topk`` does, and train on a deterministic sample.

    Returns the trained quantizer as rows ``(cid, pos, val)`` with
    1-based ``pos``.
    """
    spark = embs.sparkSession
    vecs = embs.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    )
    init = vecs.orderBy("vid").limit(k).collect()
    cents: dict[int, list[float]] = {
        int(r["vid"]): [float(x) for x in r["v"]] for r in init
    }
    if len(cents) < k:
        raise ValueError(f"kmeans_train: need >= {k} vectors, got {len(cents)}")
    for _ in range(iters):
        choices = []
        for cid in sorted(cents):
            carr = F.array(*[F.lit(x) for x in cents[cid]])
            d = dot(carr, carr) - 2.0 * dot(F.col("v"), carr)
            choices.append(F.struct(d.alias("d"), F.lit(cid).alias("cid")))
        asn = vecs.withColumn("cid", F.array_min(F.array(*choices))["cid"])
        # DECIMAL(30,6) components (sum accumulates in DECIMAL(38,6)):
        # a (18,6) per-value cast would NULL-overflow any component
        # >= 10^12 and silently zero that centroid dimension via the
        # dict initialization below. Scale 6 is unchanged, so the
        # quantization — and the oracle's decimal mean — is identical.
        stats = (
            asn.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(30,6)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .collect()
        )
        new: dict[int, list[float]] = {}
        for r in stats:
            new.setdefault(int(r["cid"]), [0.0] * len(cents[int(r["cid"])]))[
                int(r["pos"])
            ] = float(r["m"])
        for cid, vals in new.items():
            cents[cid] = vals
    rows = [
        (cid, pos + 1, val)
        for cid in sorted(cents)
        for pos, val in enumerate(cents[cid])
    ]
    return spark.createDataFrame(rows, "cid long, pos int, val double")


def emb_near_dedup(
    embs: DataFrame, min_cos: float = 0.4, vec_col: str = "embedding"
) -> DataFrame:
    """Semantic (embedding-space) dedup, the SemDeDup shape: exact
    cosine pairs inside blocking labels → connected components → keep
    the cluster-canonical (min vec_id); unpaired vectors pass through.

    The label is the blocking bucket (a cluster id from
    :func:`kmeans_train` at scale — SemDeDup proper blocks on k-means
    cells exactly like this); pairs explode only within a block, the
    component labeling shuffles fixed-width (id, label) rows, and the
    tiny drop set broadcasts into the final anti-join, so the
    embedding table itself is never shuffled.

    Returns surviving ``(vec_id, label)`` rows (the vector column is
    projected away — downstream joins re-attach it by id when needed).
    """
    from csvb_spark.operators.dedup import dedup_clusters

    pairs = neardup_pairs_by_label(embs, min_cos=min_cos, max_id=None, vec_col=vec_col)
    labels = dedup_clusters(pairs, left_col="id_a", right_col="id_b")
    drop = labels.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("vec_id")
    )
    # no broadcast hint: the drop set is data-dependent (O(corpus) on a
    # heavily-duplicated crawl) — AQE broadcasts it when it actually fits
    return embs.join(drop, "vec_id", "left_anti").select("vec_id", "label")


def _collect_codebook(centroids: DataFrame, nprobe: int) -> list[tuple[int, list[float]]]:
    """Pivot a ``kmeans_train``-shaped (cid, pos, val) DataFrame into
    ``[(cid, components)]`` sorted by cid, validating what a silent
    failure downstream would otherwise hide: enough cells to probe,
    and a consistent dimension across cells."""
    by_cid: dict[int, dict[int, float]] = {}
    for r in centroids.collect():
        by_cid.setdefault(int(r["cid"]), {})[int(r["pos"])] = float(r["val"])
    if len(by_cid) < nprobe:
        raise ValueError(
            f"codebook has {len(by_cid)} centroids but nprobe={nprobe}"
        )
    dims = {len(v) for v in by_cid.values()}
    if len(dims) != 1:
        raise ValueError(f"codebook dimensions are inconsistent: {sorted(dims)}")
    return [
        (cid, [by_cid[cid][p] for p in sorted(by_cid[cid])])
        for cid in sorted(by_cid)
    ]


def knn_join(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    nprobe: int = 1,
    exclude_self: bool = True,
    neg_label_col: str | None = None,
) -> DataFrame:
    """Batch k-NN join: for EVERY probe vector, its top-k cosine
    neighbors from the corpus — the retrieval primitive behind
    dedup-against-index and embedding-based eval contamination.

    ``neg_label_col``: restrict candidates to corpus rows whose label
    DIFFERS from the probe's — the hard-negative-mining mode (see
    :func:`hard_negatives`). The filter runs before ranking, inside
    the same exchange; no extra pass. Labels compare NULL-safely: a
    NULL label is a distinct label value, so NULL-vs-non-NULL pairs
    are mined and NULL-vs-NULL pairs are not.

    Exact formulation (``centroids=None``): broadcast the (small)
    probe set, map-side cosine against every corpus row, then a
    per-probe window top-k. The ranking shuffle carries only
    fixed-width ``(probe_id, vec_id, cos)`` rows — |probes|×|corpus|
    of them, fine for a bounded probe batch.

    IVF-pruned formulation (``centroids=`` a :func:`kmeans_train`
    result): both sides are coarse-quantized against the codebook —
    every corpus row to its single nearest cell (Euclidean argmin
    ``c·c − 2·v·c`` with lower-cid tie-break, exactly the trainer's
    assignment), every probe to its ``nprobe`` nearest cells — and
    candidates meet through a cid equi-join instead of a cross join,
    so the ranking exchange carries ≈ |probes|×|corpus|·(nprobe/K)
    rows. The codebook is a bounded K×dim driver constant (the same
    pattern as :func:`ivf_topk`); scoring and ranking are identical
    to the exact path. Approximate: a true neighbor in an unprobed
    cell is missed — that is the IVF contract.

    ``exclude_self`` drops candidates whose ``id_col`` equals the
    probe's id — the right default when probes are drawn from the
    corpus itself. Pass ``False`` when probes and corpus come from
    different tables with independent id spaces, where equal ids are
    legitimate neighbors, not self-matches.

    Output: ``(probe_id, vec_id, cos_sim, rnk)``, ``rnk`` 1..k per
    probe, ordered by cosine desc with vec_id tiebreak.
    """
    from pyspark.sql import Window

    p_cols = [
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        norm2(as_double(F.col(vec_col))).alias("probe_norm"),
    ]
    if neg_label_col is not None:
        p_cols.append(F.col(neg_label_col).alias("probe_label"))

    if centroids is None:
        p = F.broadcast(probes.select(*p_cols))
        candidates = corpus.crossJoin(p)
    else:
        cents = _collect_codebook(centroids, nprobe)

        def _fold_dot(a: list[float], b: list[float]) -> float:
            acc = 0.0  # sequential fold — same IEEE order as SQL
            for x, y in zip(a, b):
                acc += x * y
            return acc

        def cell_choices(vec: Column) -> list[Column]:
            vd = as_double(vec)
            return [
                F.struct(
                    (F.lit(_fold_dot(cv, cv)) - 2.0 * dot(vd, F.array(*[F.lit(x) for x in cv]))).alias("d"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cv in cents
            ]

        p = F.broadcast(
            probes.select(
                *p_cols,
                F.explode(
                    F.transform(
                        F.slice(
                            F.array_sort(F.array(*cell_choices(F.col(vec_col)))),
                            1,
                            nprobe,
                        ),
                        lambda s: s["cid"],
                    )
                ).alias("cid"),
            )
        )
        assigned = corpus.withColumn(
            "cid", F.array_min(F.array(*cell_choices(F.col(vec_col))))["cid"]
        )
        # corpus rows carry ONE cell, so a (probe, corpus) pair meets in
        # at most one cell — the equi-join never duplicates candidates
        candidates = assigned.join(p, "cid")

    if neg_label_col is not None:
        # null-safe: a NULL label is a distinct label VALUE, so
        # NULL-vs-non-NULL pairs are mined and NULL-vs-NULL pairs are
        # not — a stated contract instead of SQL NULL semantics
        # silently dropping every candidate of a NULL-labeled probe
        candidates = candidates.filter(
            ~F.col(neg_label_col).eqNullSafe(F.col("probe_label"))
        )
    scored = candidates.filter(
        F.col(id_col) != F.col("probe_id") if exclude_self else F.lit(True)
    ).select(
        "probe_id",
        id_col,
        F.round(
            cosine_pnorm(F.col(vec_col), F.col("probe_vec"), F.col("probe_norm")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("probe_id", id_col, "cos_sim", "rnk")
    )


# --- product quantization (PQ) ----------------------------------------


def pq_train(
    embs: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train a product quantizer (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the vector into
    ``m`` contiguous subspaces and run the deterministic
    :func:`kmeans_train` independently on each slice. Returns the
    codebook as rows ``(s, cid, pos, val)`` with 0-based subspace
    ``s`` and 1-based in-subspace ``pos``.

    PQ is the memory story for 100 TB ANN: a 64-dim float vector
    (256 B) compresses to ``m`` uint8 codes (m bytes) — the index
    fits in RAM at billions of vectors, and ADC scoring (see
    :func:`pq_adc_topk`) never touches the original vectors. Training
    cost is m independent kmeans runs over the slice columns; each is
    the bounded-driver-constant pattern kmeans_train documents.
    """
    dim = len(embs.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    parts = []
    for s in range(m):
        sl = embs.select(
            id_col,
            F.slice(as_double(F.col(vec_col)), s * sub + 1, sub).alias(vec_col),
        )
        cb = kmeans_train(sl, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
        parts.append(cb.select(F.lit(s).alias("s"), "cid", "pos", "val"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _pq_codebook_dict(codebooks) -> dict[tuple[int, int], list[float]]:
    """Normalize a codebook to {(s, cid): [vals]} from either a
    ``pq_train`` DataFrame or an existing dict; validates shape."""
    if isinstance(codebooks, dict):
        cb = {k2: list(map(float, v)) for k2, v in codebooks.items()}
    else:
        rows = codebooks.collect()
        tmp: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            tmp.setdefault((int(r["s"]), int(r["cid"])), {})[int(r["pos"])] = float(
                r["val"]
            )
        cb = {
            key: [vals[p] for p in sorted(vals)] for key, vals in tmp.items()
        }
    if not cb:
        raise ValueError("pq: empty codebook")
    subs = {s for s, _ in cb}
    if subs != set(range(len(subs))):
        raise ValueError(f"pq: non-contiguous subspace ids {sorted(subs)}")
    lens = {len(v) for v in cb.values()}
    if len(lens) != 1:
        raise ValueError("pq: ragged codebook subvector lengths")
    for s in sorted({sp for sp, _ in cb}):
        cids = sorted(c for sp, c in cb if sp == s)
        if cids != list(range(len(cids))):
            # ADC's lookup tables index by code value, so codewords
            # must be dense 0-based (pq_train over dense ids yields
            # this; re-key the codebook otherwise)
            raise ValueError(f"pq: non-dense cids {cids} in subspace {s}")
    return cb


def _sq_l2(slice_col: Column, cvals: list[float]) -> Column:
    """Squared L2 distance between a vector slice and a literal
    centroid, as the sequential diff fold both engines share
    (matches DuckDB's ``list_dot_product(diff, diff)``)."""
    carr = F.array(*[F.lit(x) for x in cvals])
    diff = F.zip_with(slice_col, carr, lambda x, c: x - c)
    return dot(diff, diff)


def _py_sq(a: list[float], b: list[float]) -> float:
    """Driver-side twin of :func:`_sq_l2`: the SAME sequential
    (x−y)² left-fold, so driver-computed constants (ADC tables, cell
    rankings) are bit-identical to the SQL/DuckDB formulation. One
    definition for every caller — this fold is bit-exactness-critical
    and must not drift between copies."""
    if len(a) != len(b):
        raise ValueError(f"_py_sq: length mismatch {len(a)} != {len(b)}")
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc = acc + d * d
    return acc


def pq_encode(
    embs: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector its per-subspace nearest codeword (true
    squared-L2 argmin, ties to the lower cid). Output:
    ``(id, code_0 … code_{m-1})`` — one small int per subspace, the
    entire PQ index row. Map-only against codebook literals; at very
    large m×k swap the interpreted folds for the pandas_udf matmul
    exactly as ``ivf_topk`` does.
    """
    cb = _pq_codebook_dict(codebooks)
    m = len({s for s, _ in cb})
    sub = len(next(iter(cb.values())))
    v = as_double(F.col(vec_col))
    cols = [F.col(id_col)]
    for s in range(m):
        sl = F.slice(v, s * sub + 1, sub)
        choices = [
            F.struct(_sq_l2(sl, cb[(s, cid)]).alias("d"), F.lit(cid).alias("cid"))
            for cid in sorted(c for sp, c in cb if sp == s)
        ]
        cols.append(F.array_min(F.array(*choices))["cid"].alias(f"code_{s}"))
    return embs.select(*cols)


def pq_adc_topk(
    embs: DataFrame,
    probe: DataFrame,
    codebooks,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC):
    encode the corpus with :func:`pq_encode`, precompute the m×K
    probe-to-codeword distance table, and score every row as the sum
    of ``m`` table lookups — no per-row vector math at all. Output:
    ``(id, adc_dist)`` ascending with id tiebreak (squared L2).

    The probe and the m×K table are bounded driver constants (the
    kmeans_train contract); the table entries are computed with the
    same sequential diff fold the oracle's ``list_dot_product`` uses,
    so the lookups are bit-identical cross-engine. The scored scan is
    pure codegen (element_at on literal arrays + a fixed-order sum)
    and the top-k is TakeOrderedAndProject. At scale the codes table
    is the only thing read — m bytes per row instead of the vector.
    """
    cb = _pq_codebook_dict(codebooks)
    m = len({s for s, _ in cb})
    sub = len(next(iter(cb.values())))
    prow = probe.select(
        F.col(id_col).alias("pid"), as_double(F.col(vec_col)).alias("pv")
    ).first()
    if prow is None:
        raise ValueError("pq: empty probe DataFrame")
    pv = [float(x) for x in prow["pv"]]
    if len(pv) != m * sub:
        raise ValueError(f"pq: probe dim {len(pv)} != m*sub {m * sub}")

    tables: list[dict[int, float]] = []
    for s in range(m):
        ps = pv[s * sub : (s + 1) * sub]
        tables.append(
            {cid: _py_sq(ps, cb[(s, cid)]) for sp, cid in cb if sp == s}
        )
    codes = pq_encode(embs, cb, vec_col=vec_col, id_col=id_col)
    dist = None
    for s in range(m):
        tbl = tables[s]
        lut = F.array(*[F.lit(tbl[cid]) for cid in sorted(tbl)])
        term = F.element_at(lut, F.col(f"code_{s}").cast("int") + 1)
        dist = term if dist is None else (dist + term)
    return (
        codes.filter(F.col(id_col) != F.lit(prow["pid"]))
        .select(id_col, F.round(dist, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def pq_seeded_codebook(
    m: int = 4, k: int = 4, sub: int = 16, seed: int = 11, scale: float = 1.0
) -> dict[tuple[int, int], list[float]]:
    """Deterministic random codebook for tests/oracles (the
    ``_hyperplanes`` pattern): values formatted to exactly 3 decimals
    so a SQL literal of the same text parses to the identical double
    in any engine. ``scale`` shrinks codewords toward the magnitude
    of the vectors being coded (residuals are much smaller than raw
    vectors — a unit-scale codebook would assign every residual the
    same nearest codeword and the codes stop discriminating)."""
    rng = np.random.RandomState(seed)
    arr = rng.standard_normal((m, k, sub)) * scale
    return {
        (s, c): [float(f"{x:.3f}") for x in arr[s, c]]
        for s in range(m)
        for c in range(k)
    }


def _ivfpq_coded(
    embs: DataFrame,
    cb: dict,
    m: int,
    sub: int,
    cents: dict[int, list[float]],
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(id, cid, code_0..m-1): coarse cell assignment + residual PQ
    codes — the map-only encode stage ivfpq_topk and the persisted
    index share."""
    v = as_double(F.col(vec_col))
    choices = [
        F.struct(_sq_l2(v, cents[c]).alias("d"), F.lit(c).alias("cid"))
        for c in sorted(cents)
    ]
    cid_col = F.array_min(F.array(*choices))["cid"]
    cent_table = F.array(
        *[F.array(*[F.lit(x) for x in cents[c]]) for c in sorted(cents)]
    )
    resid = F.zip_with(
        F.col("_v"),
        F.element_at(cent_table, F.col("cid").cast("int") + 1),
        lambda a, b: a - b,
    )
    coded = embs.select(F.col(id_col), v.alias("_v"), cid_col.alias("cid")).select(
        id_col, "cid", resid.alias("_r")
    )
    code_cols = []
    for s in range(m):
        sl = F.slice(F.col("_r"), s * sub + 1, sub)
        ch = [
            F.struct(_sq_l2(sl, cb[(s, cid)]).alias("d"), F.lit(cid).alias("cid2"))
            for cid in sorted(c for sp, c in cb if sp == s)
        ]
        code_cols.append(F.array_min(F.array(*ch))["cid2"].alias(f"code_{s}"))
    return coded.select(id_col, "cid", *code_cols)


def _ivfpq_adc(
    coded: DataFrame,
    m: int,
    probed: list[int],
    tables: dict,
    pid,
    k: int,
    id_col: str,
) -> DataFrame:
    """ADC scoring over a coded table restricted to the probed cells —
    shared by the in-memory and persisted-index paths."""
    dist = None
    for c in probed:
        cd = None
        for s in range(m):
            tbl = tables[c][s]
            lut = F.array(*[F.lit(tbl[cid]) for cid in sorted(tbl)])
            term = F.element_at(lut, F.col(f"code_{s}").cast("int") + 1)
            cd = term if cd is None else (cd + term)
        dist = (
            F.when(F.col("cid") == c, cd)
            if dist is None
            else dist.when(F.col("cid") == c, cd)
        )
    return (
        coded.filter(F.col("cid").isin([int(c) for c in probed]))
        .filter(F.col(id_col) != F.lit(pid))
        .select(id_col, F.round(dist, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    embs: DataFrame,
    probe: DataFrame,
    codebooks,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_ids: list | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k — the composition production ANN
    indexes (FAISS ``IVFx,PQy``) actually ship: a coarse quantizer
    prunes the corpus to the probe's ``nprobe`` nearest cells, and
    within those cells rows are scored by ADC over PQ codes of the
    RESIDUAL (vector − cell centroid). Residual encoding is what
    makes small PQ codebooks accurate: each subquantizer only has to
    cover the spread within a cell, not the whole space.

    Deterministic contract: the coarse quantizer is the ``ivf_topk``
    seed convention (centroid c = the vector with id == c,
    c < n_centroids) — data rows, so the oracle reads them from the
    table; assignment is true squared-L2 argmin with lower-cid ties
    (the same diff fold as :func:`pq_encode`); the probe's cell
    ranking and the per-cell ADC tables are bounded driver constants
    computed with the sequential fold that matches the oracle's
    ``list_dot_product``.

    Plan: assignment + residual + codes are map-only against
    centroid/codebook literals; the scored scan filters to probed
    cells (at scale: the codes table is PERSISTED partitioned by cid,
    so this prunes at the file level), per-row cost is m lookups
    chosen by a CASE over nprobe cells, and the top-k is
    TakeOrderedAndProject. Output: (id, adc_dist) ascending, id
    tiebreak, probe row excluded.
    """
    cb = _pq_codebook_dict(codebooks)
    m = len({s for s, _ in cb})
    sub = len(next(iter(cb.values())))

    cents = seed_centroids(embs, n_centroids, vec_col, id_col, seed_ids)
    for cid_, cv_ in cents.items():
        if len(cv_) != m * sub:
            raise ValueError(
                f"ivfpq: centroid {cid_} dim {len(cv_)} != m*sub {m * sub}"
            )

    coded = _ivfpq_coded(embs, cb, m, sub, cents, vec_col, id_col)

    prow = probe.select(
        F.col(id_col).alias("pid"), as_double(F.col(vec_col)).alias("pv")
    ).first()
    if prow is None:
        raise ValueError("ivfpq: empty probe DataFrame")
    pv = [float(x) for x in prow["pv"]]
    if len(pv) != m * sub:
        raise ValueError(f"ivfpq: probe dim {len(pv)} != m*sub {m * sub}")

    cell_rank = sorted((_py_sq(pv, cents[c]), c) for c in sorted(cents))
    probed = [c for _, c in cell_rank[:nprobe]]
    tables: dict[int, list[dict[int, float]]] = {}
    for c in probed:
        pr = [a - b for a, b in zip(pv, cents[c])]
        tables[c] = [
            {
                cid: _py_sq(pr[s * sub : (s + 1) * sub], cb[(s, cid)])
                for sp, cid in cb
                if sp == s
            }
            for s in range(m)
        ]

    return _ivfpq_adc(coded, m, probed, tables, prow["pid"], k, id_col)


def rp_signs(out_dim: int, in_dim: int, seed: int = 11) -> list[list[int]]:
    """Deterministic ±1 random-projection matrix (Achlioptas 2003,
    sparse/sign random projections): ``sign[j][i]`` is derived from the
    parity of ``md5(j:i:seed)``'s first 8 hex chars, so ANY engine can
    re-derive the matrix from the three integers alone — no shipped
    artifact. ``out_dim × in_dim`` ints: a bounded constant (the same
    driver-constant pattern as the IVF codebooks), NOT data."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{j}:{i}:{seed}".encode()).hexdigest()[:8], 16) % 2
            == 0
            else -1
            for i in range(1, in_dim + 1)
        ]
        for j in range(1, out_dim + 1)
    ]


def rp_project(
    embs: DataFrame,
    out_dim: int = 8,
    seed: int = 11,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-projection dimensionality reduction — the standard
    pre-LSH / pre-clustering step when the raw embedding dim makes
    banding or cross-cell scoring too wide (project 768 → 8-32 dims,
    then band/bucket the short code).

    Output: ``(vec_id, pos, val)`` long-form, 1-based ``pos`` —
    ``val = round(Σ_i v[i] * sign[pos][i], 6)``.

    Determinism contract: the sign matrix is :func:`rp_signs`
    (md5-parity, engine-recomputable); each term is cast to
    DECIMAL(30,6) and summed EXACTLY (order-independent — parallel
    partial aggregation cannot perturb it), with one final
    decimal→double cast. Same integer-exactness design as
    ``kmeans_train``'s centroid update.

    Plan: map-only — per output dim one zip_with/aggregate fold over
    the vector against a literal sign array; zero shuffles, zero
    Python, linear in corpus size. The sign matrix costs
    ``out_dim × in_dim`` ints on the driver regardless of data scale.
    Reference scope: beyond-reference (training-pipeline extension).
    """
    first = embs.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("rp_project: empty embeddings input")
    in_dim = int(first["d"])
    signs = rp_signs(out_dim, in_dim, seed)
    v = as_double(F.col(vec_col))
    cols = []
    for j in range(1, out_dim + 1):
        sj = F.array(*[F.lit(s) for s in signs[j - 1]])
        acc = F.aggregate(
            F.zip_with(v, sj, lambda x, s: (x * s).cast("decimal(30,6)")),
            F.lit(0).cast("decimal(30,6)"),
            # decimal addition widens to (31,6); cast back so the fold's
            # accumulator type is stable (exact — terms are |x| ≲ 1e3)
            lambda a, t: (a + t).cast("decimal(30,6)"),
        )
        cols.append(
            F.named_struct(
                F.lit("pos"), F.lit(j), F.lit("val"), F.round(acc.cast("double"), 6)
            )
        )
    return embs.select(
        F.col(id_col), F.explode(F.array(*cols)).alias("o")
    ).select(id_col, F.col("o.pos").alias("pos"), F.col("o.val").alias("val"))


def hard_negatives(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for
    every probe, the ``k`` corpus vectors MOST similar to it that
    carry a DIFFERENT label — the near-miss negatives that make
    InfoNCE/triplet training converge (random negatives are too easy;
    same-label neighbors are positives, not negatives).

    Pure composition over :func:`knn_join`'s candidate machinery: the
    label-mismatch filter runs inside the ranking exchange, so cost
    and plan shape are identical to the plain k-NN join — broadcast
    probe batch + map-side cosine exactly, or cid equi-join when a
    ``centroids`` codebook prunes (the 100 TB path). Output:
    ``(probe_id, vec_id, cos_sim, rnk)``.
    """
    return knn_join(
        corpus,
        probes,
        k=k,
        vec_col=vec_col,
        id_col=id_col,
        centroids=centroids,
        nprobe=nprobe,
        exclude_self=True,
        neg_label_col=label_col,
    )


def ivf_cell_expr(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """Nearest-cell id for a vector against a collected codebook —
    the Euclidean argmin ``c·c − 2·v·c`` with lower-cid tie-break,
    identical to :func:`knn_join`'s assignment (||v||² is constant
    per row and cannot change the argmin)."""

    def _fold_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    vd = as_double(vec)
    choices = [
        F.struct(
            (
                F.lit(_fold_dot(cv, cv))
                - 2.0 * dot(vd, F.array(*[F.lit(x) for x in cv]))
            ).alias("d"),
            F.lit(cid).alias("cid"),
        )
        for cid, cv in cents
    ]
    return F.array_min(F.array(*choices))["cid"]


def write_ivf_index(
    embs: DataFrame,
    centroids: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist the corpus hive-partitioned by IVF cell — the ANN twin
    of ``dedup.write_band_index``: a probe knows its ``nprobe`` cells
    from the (bounded, driver-constant) codebook alone, so the read
    side partition-prunes to those directories and per-query I/O is
    ``nprobe/K`` of the corpus BEFORE any compute — the property that
    makes IVF pay at 100 TB, where the win is skipped I/O, not
    skipped math. One shuffle (repartition by cid keeps one file per
    cell per write, so pruned partitions are also few files)."""
    cents = _collect_codebook(centroids, nprobe=1)
    (
        embs.withColumn("cid", ivf_cell_expr(F.col(vec_col), cents))
        .repartition("cid")
        .write.mode(mode)
        .partitionBy("cid")
        .parquet(path)
    )


def ivf_index_topk(
    spark,
    path: str,
    centroids: DataFrame,
    probe: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine top-k for a 1-row probe against a :func:`write_ivf_index`
    layout, reading ONLY the probe's ``nprobe`` nearest cells (the
    filter is on the partition column, so it prunes directories at
    planning time — asserted via ``PartitionFilters`` in tests).

    Cell assignment and probe-cell choice use squared-L2 argmin
    (``c·c − 2·v·c``) — :func:`knn_join`'s IVF-pruned convention, and
    the twin this index agrees with exactly (the parity test compares
    against ``knn_join(centroids=...)``). :func:`ivf_topk` ranks its
    probe CELLS by cosine instead, so with centroids of unequal norm
    the two can probe different cells; within identical candidate
    sets the scoring and ranking are the same."""
    cents = _collect_codebook(centroids, nprobe)
    prow = probe.select(
        F.col(id_col).alias("pid"), as_double(F.col(vec_col)).alias("pv")
    ).first()
    if prow is None:
        raise ValueError("ivf_index_topk: empty probe")
    pv = [float(x) for x in prow["pv"]]

    def _d(cv: list[float]) -> float:
        acc = 0.0
        for x, y in zip(cv, pv):
            acc += x * y
        cc = 0.0
        for x in cv:
            cc += x * x
        return cc - 2.0 * acc

    probed = [cid for _, cid in sorted((( _d(cv), cid)) for cid, cv in cents)[:nprobe]]
    pvec = F.array(*[F.lit(x) for x in pv])
    pnorm = float(sum(x * x for x in pv)) ** 0.5
    return (
        spark.read.parquet(path)
        .filter(F.col("cid").isin(probed))
        .filter(F.col(id_col) != F.lit(prow["pid"]))
        .select(
            id_col,
            F.round(
                dot(as_double(F.col(vec_col)), pvec)
                / (norm2(as_double(F.col(vec_col))) * F.lit(pnorm)),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def write_ivfpq_index(
    embs: DataFrame,
    codebooks,
    path: str,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
    seed_ids: list | None = None,
) -> None:
    """Persist the IVF-PQ index: (id, cid, code_0..m-1) hive-partitioned
    by coarse cell. This is the layout FAISS's ``IVFx,PQy`` keeps in
    RAM, as a parquet table: m bytes-ish of code per row instead of
    the full vector (the raw embeddings can go cold), and a probe
    reads only its ``nprobe`` cell directories before any ADC math.
    One shuffle (repartition by cid → one file per cell per write)."""
    cb = _pq_codebook_dict(codebooks)
    m = len({s for s, _ in cb})
    sub = len(next(iter(cb.values())))
    cents = seed_centroids(embs, n_centroids, vec_col, id_col, seed_ids)
    coded = _ivfpq_coded(embs, cb, m, sub, cents, vec_col, id_col)
    (
        coded.repartition("cid")
        .write.mode(mode)
        .partitionBy("cid")
        .parquet(path)
    )


def seed_centroids(
    embs: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_ids: list | None = None,
) -> dict[int, list[float]]:
    """The ivf_topk/ivfpq seed convention as a reusable collect:
    cell ``c``'s centroid is the vector with id ``seed_ids[c]``
    (bounded K×dim driver constant). ``seed_ids`` defaults to
    ``0..n_centroids-1`` (the historical convention), so a corpus
    whose ids don't start at 0 passes any ``n_centroids`` ids it
    likes — cells are numbered by position in the list."""
    if seed_ids is None:
        seed_ids = list(range(n_centroids))
    if len(seed_ids) != len(set(seed_ids)) or len(seed_ids) != n_centroids:
        raise ValueError(
            f"seed_centroids: seed_ids must be {n_centroids} distinct ids,"
            f" got {seed_ids!r}"
        )
    by_id = {
        r["sid"]: [float(x) for x in r["cv"]]
        for r in embs.filter(F.col(id_col).isin(list(seed_ids)))
        .select(
            F.col(id_col).alias("sid"), as_double(F.col(vec_col)).alias("cv")
        )
        .collect()
    }
    missing = [s for s in seed_ids if s not in by_id]
    if missing:
        raise ValueError(
            f"seed_centroids: need ids {seed_ids} as seed "
            f"centroids, found {sorted(by_id)}"
        )
    return {c: by_id[s] for c, s in enumerate(seed_ids)}


def ivfpq_index_topk(
    spark,
    path: str,
    codebooks,
    centroids: dict[int, list[float]],
    probe: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k against a :func:`write_ivfpq_index` layout, reading
    ONLY the probe's ``nprobe`` nearest cells (planning-time partition
    pruning — the cid filter never scans the other cells' files).
    Candidates, ADC tables, and ranking are identical to
    :func:`ivfpq_topk` over the same codebook/centroids, so the two
    agree exactly; the index buys cold storage + pruned I/O."""
    cb = _pq_codebook_dict(codebooks)
    m = len({s for s, _ in cb})
    sub = len(next(iter(cb.values())))
    prow = probe.select(
        F.col(id_col).alias("pid"), as_double(F.col(vec_col)).alias("pv")
    ).first()
    if prow is None:
        raise ValueError("ivfpq_index_topk: empty probe DataFrame")
    pv = [float(x) for x in prow["pv"]]
    if len(pv) != m * sub:
        raise ValueError(
            f"ivfpq_index_topk: probe dim {len(pv)} != m*sub {m * sub}"
        )
    cell_rank = sorted((_py_sq(pv, centroids[c]), c) for c in sorted(centroids))
    probed = [c for _, c in cell_rank[:nprobe]]
    tables: dict[int, list[dict[int, float]]] = {}
    for c in probed:
        pr = [a - b for a, b in zip(pv, centroids[c])]
        tables[c] = [
            {
                cid: _py_sq(pr[s * sub : (s + 1) * sub], cb[(s, cid)])
                for sp, cid in cb
                if sp == s
            }
            for s in range(m)
        ]
    return _ivfpq_adc(
        spark.read.parquet(path), m, probed, tables, prow["pid"], k, id_col
    )


def centroid_drift(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-space DRIFT monitor — x86 token drift's geometric
    twin: per label, the cosine between the two snapshot halves'
    centroids (here the even/odd id halves; in production, yesterday's
    embeddings vs today's). A label whose centroid swings is a class
    whose content changed — re-embed, re-cluster, or investigate the
    upstream source. Output: ``(label, n_old, n_new, centroid_cos)``
    (NULL cosine when a half is empty or zero).

    Determinism: cosine is scale-invariant, so it is computed from the
    per-dimension element SUMS, not means — each element is rounded to
    6 and quantized to DECIMAL(18,6) ONCE (the x92/x103 pattern), and
    everything after that stays in exact decimal arithmetic
    (dot/norms are sums of DECIMAL(18,6) products — DECIMAL(36,12),
    exact in both engines) until one final deterministic double
    division. No rounding of already-agreed doubles anywhere.

    Plan: one explode to ``(label, dim)`` granularity — the exchange
    carries ``labels × dim`` aggregated rows, not the corpus — then a
    ``labels``-sized aggregate; counts ride a second tiny aggregate on
    the unexploded table. Reference scope: beyond-reference
    (training-pipeline extension).
    """
    half = F.pmod(F.col(id_col), F.lit(2))
    tagged = embeddings.select(
        F.col(label_col).alias("label"),
        half.alias("_half"),
        F.posexplode(F.col(vec_col)).alias("pos", "_v"),
    )
    q = F.round(F.col("_v").cast("double"), 6).cast("decimal(18,6)")
    per_dim = tagged.groupBy("label", "pos").agg(
        F.coalesce(F.sum(F.when(F.col("_half") == 0, q)), F.lit(0))
        .cast("decimal(18,6)")
        .alias("_so"),
        F.coalesce(F.sum(F.when(F.col("_half") == 1, q)), F.lit(0))
        .cast("decimal(18,6)")
        .alias("_sn"),
    )
    sums = per_dim.groupBy("label").agg(
        F.sum(F.col("_so") * F.col("_sn")).alias("_dot"),
        F.sum(F.col("_so") * F.col("_so")).alias("_no"),
        F.sum(F.col("_sn") * F.col("_sn")).alias("_nn"),
    )
    counts = embeddings.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.when(half == 0, 1)).alias("n_old"),
        F.count(F.when(half == 1, 1)).alias("n_new"),
    )
    cos = F.when(
        (F.col("_no").cast("double") > 0) & (F.col("_nn").cast("double") > 0),
        F.col("_dot").cast("double")
        / (
            F.sqrt(F.col("_no").cast("double"))
            * F.sqrt(F.col("_nn").cast("double"))
        ),
    )
    return counts.join(sums, "label").select(
        "label", "n_old", "n_new", cos.alias("centroid_cos")
    )
