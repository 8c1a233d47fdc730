"""Similarity search over embedding columns (array<float>).

Two paths, mirroring how a 100 TB vector corpus is actually served:

- brute-force top-k: exact cosine against a broadcast query set. The
  candidate side streams through executors once; per-row work is a
  JVM-side higher-order-function fold (no UDF). This is the correctness
  baseline and the right tool when the query set is small.
- LSH-bucketed ANN: deterministic random-hyperplane signs partition the
  corpus into 2^b buckets; a query only scans its own bucket —
  sub-linear candidate sets at the cost of recall, the standard
  scale-out trade.

Dot products fold left-to-right in index order (``F.aggregate``), which
matches a scalar engine's evaluation order exactly — the DuckDB oracle
reproduces results bit-for-bit, no tolerance needed.
"""

from __future__ import annotations

import math
import struct as _struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from informixcdc_spark.catalog import rebalance
from informixcdc_spark.functions.vector import dlit, dot, l2_norm, sql_dot_rows


def _f32(x: float) -> float:
    """The exact float32 value ARRAY<FLOAT> storage keeps. Codebooks
    used to round-trip through a createDataFrame FLOAT column before
    the assignment math, so the literal-codebook path truncates
    identically to stay bit-equal with the plans it replaced."""
    return _struct.unpack("<f", _struct.pack("<f", float(x)))[0]


def _py_l2(vals: list[float]) -> float:
    """Driver-side replica of :func:`l2_norm`'s left fold (same add
    order over IEEE doubles, correctly-rounded sqrt) — bit-equal to
    the Spark fold over the same values."""
    acc = 0.0
    for x in vals:
        acc += x * x
    return math.sqrt(acc)


def _cos_scored_sql(
    vec_col: str, norm_col: str, centroids: list[tuple[int, list[float]]]
) -> str:
    """SQL of ``array<struct<c int, s double>>``: per-centroid cosine
    of ``vec_col`` against a LITERAL codebook (float32-truncated like
    the ARRAY<FLOAT> codebook tables this replaces), NULL on zero or
    NULL norms — the zero-shuffle row-local replacement for the old
    crossJoin + row_number-window assignment (which shuffled corpus×K
    rows per pass: the 100 TB killer this module's docstrings promised
    to avoid). Callers pass centroids in ascending cell-id order so
    fold/sort tiebreaks resolve to the lowest cell id, matching the
    window's ``(_cos desc, _cid)`` ordering exactly."""
    rows = [[_f32(x) for x in v] for _cid, v in centroids]
    meta = ",".join(
        f"named_struct('c', {int(cid)}, 'n', {dlit(_py_l2(row))})"
        for (cid, _v), row in zip(centroids, rows)
    )
    return (
        f"zip_with({sql_dot_rows(vec_col, rows)}, array({meta}), "
        "(d, m) -> named_struct('c', m.c, 's', "
        f"CASE WHEN `{norm_col}` > 0D AND m.n > 0D "
        f"THEN d / (`{norm_col}` * m.n) ELSE CAST(NULL AS DOUBLE) END))"
    )


def _scored_broadcast(
    df: DataFrame,
    vec_col: str,
    norm_col: str,
    centroids: list[tuple[int, list[float]]],
    metric: str = "cosine",
) -> tuple[str, DataFrame]:
    """The literal scored-array renders' shape for codebooks PAST the
    plan-size ceiling (``functions.vector.MAX_LITERAL_MAT_ELEMS``): the
    codebook ships as ONE broadcast 1-row table (array of
    (c, norm-or-norm², codeword) structs) crossJoined in, and the
    per-centroid score is the same ``zip_with``/``aggregate`` left fold
    evaluated against the struct's ``array<double>`` codeword instead
    of a literal — still zero shuffle, still no corpus-keyed join and
    NO window, but plan text stays O(1) in K·d. Bit-equal to the
    literal render: identical f32 truncation, identical driver-side
    norms, identical IEEE fold order (unit-pinned both ways in
    tests/test_operators.py). ``metric='cosine'`` scores
    ``dot/(norm·‖c‖)`` with the literal path's NULL-on-zero-norm CASE;
    ``'l2'`` scores ``(norm² + ‖c‖²) − 2·dot`` exactly as
    :func:`kmeans_centroids`'s literal l2 branch associates it.
    Returns (scored_sql, df_with_codebook_column)."""
    rows = [[_f32(x) for x in v] for _cid, v in centroids]
    if metric == "l2":
        side = [
            (int(cid), _py_l2(row) * _py_l2(row), row)
            for (cid, _v), row in zip(centroids, rows)
        ]
    else:
        side = [
            (int(cid), _py_l2(row), row)
            for (cid, _v), row in zip(centroids, rows)
        ]
    cb = df.sparkSession.createDataFrame(
        [(side,)], "_cb array<struct<c:int,n:double,v:array<double>>>"
    )
    w = len(rows[0])
    dot_fold = (
        f"aggregate(zip_with(slice(`{vec_col}`, 1, {w}), m.v, "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, t) -> acc + t)"
    )
    if metric == "l2":
        s_expr = f"(`{norm_col}` * `{norm_col}` + m.n) - (2.0D * {dot_fold})"
    else:
        s_expr = (
            f"CASE WHEN `{norm_col}` > 0D AND m.n > 0D THEN "
            f"{dot_fold} / (`{norm_col}` * m.n) "
            "ELSE CAST(NULL AS DOUBLE) END"
        )
    scored = f"transform(`_cb`, m -> named_struct('c', m.c, 's', {s_expr}))"
    return scored, df.crossJoin(F.broadcast(cb))


def _cos_scored_broadcast(
    df: DataFrame,
    vec_col: str,
    norm_col: str,
    centroids: list[tuple[int, list[float]]],
) -> tuple[str, DataFrame]:
    """:func:`_scored_broadcast` fixed to the cosine metric (the
    :func:`assign_cells_topn` fallback)."""
    return _scored_broadcast(df, vec_col, norm_col, centroids, "cosine")


def _argbest_sql(scored_sql: str, cmp: str) -> str:
    """SQL of the winning (c, s) struct of a scored array under strict
    comparator ``cmp`` ('>' argmax / '<' argmin): NULL scores never
    win, ties keep the earlier (= lowest cell id) entry, an all-NULL
    array folds to the ``c = -1`` sentinel (callers coalesce it to the
    lowest cell id — the window ordering's nulls-last tiebreak)."""
    return (
        f"aggregate({scored_sql}, "
        "named_struct('c', -1, 's', CAST(NULL AS DOUBLE)), "
        "(acc, e) -> CASE WHEN e.s IS NULL THEN acc "
        "WHEN acc.s IS NULL THEN e "
        f"WHEN e.s {cmp} acc.s THEN e ELSE acc END)"
    )


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Output: (query_id, rank, neighbor_id, cosine). The query set is
    broadcast (small by construction); ranking is a per-query window
    with a deterministic tiebreak.
    """
    # norms are per-vector: compute each side's ONCE before the pair
    # blow-up instead of twice per (query, candidate) pair — identical
    # doubles (same fold order), k× less O(d) work at corpus scale
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    c = rebalance(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    cos = F.when(
        (F.col("_qn") > 0) & (F.col("_cn") > 0),
        dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn")),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cosine")
    )


def _plane_weight(i: Column, b: int) -> Column:
    """Deterministic ±1 hyperplane weights: +1 iff (i*(b+1)) mod 7 < 4
    (i is the 1-based dimension index). Pseudo-random enough to split
    buckets, trivially reproducible in ANSI SQL."""
    return F.when((i * (b + 1)) % 7 < 4, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(vec: Column, n_planes: int = 4) -> Column:
    """Bucket id in [0, 2^n_planes): sign bits of dot(vec, plane_b)."""
    idx = F.sequence(F.lit(1), F.size(vec))
    bucket = None
    for b in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec, idx, lambda v, i: v.cast("double") * _plane_weight(i, b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**b)
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def ann_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The join is an equi-join on bucket id — at corpus scale each query
    touches ~1/2^n_planes of the data instead of all of it.
    """
    c = rebalance(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    cos = F.when(
        (F.col("_qn") > 0) & (F.col("_cn") > 0),
        dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn")),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            "cosine",
            "bucket",
        )
    )


def embedding_near_dups(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: only pairs
    inside one bucket are compared (near-identical vectors land in the
    same bucket with high probability).

    The bucketed projection carries a precomputed L2 norm and is
    persisted: norms are per-VECTOR quantities, so computing them inside
    the pair comparison would redo O(d) work per PAIR — quadratic waste —
    and a self-join would additionally recompute every bucket id twice.
    cosine = dot/(norm_a·norm_b) is the same double either way (identical
    fold order), so the oracle still matches bit-for-bit."""
    v = rebalance(corpus).select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
        l2_norm(F.col(vec_col)).alias("_norm"),
    ).persist()
    a = v.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
        "bucket", F.col("_norm").alias("_na"),
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
        "bucket", F.col("_norm").alias("_nb"),
    )
    cos = F.when(
        (F.col("_na") > 0) & (F.col("_nb") > 0),
        dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_cells(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (deterministic
    tiebreak on centroid id). Centroids here are the ``n_centroids``
    lowest-id vectors — a deterministic stand-in for a k-means codebook
    (production would train one; the partitioning math is identical).
    Output: (id, vec, _norm, cell).

    The centroid rows are COLLECTED (K vectors — metadata-sized at any
    corpus scale, the codebook convention) and inlined as plan-time
    literals, so the assignment itself is one zero-shuffle projection:
    the corpus streams through once and never moves for its cell.
    NULL-vector "centroids" are dropped (they could never win the
    cosine argmax anyway)."""
    id_type = dict(corpus.dtypes)[id_col]
    cent_rows = (
        corpus.where(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"))
        .collect()
    )
    cents = sorted(
        (int(r["_cid"]), [float(x) for x in r["_cvec"]])
        for r in cent_rows
        if r["_cvec"] is not None
    )
    if not cents:
        # An empty/all-NULL codebook would make assign_cells return an
        # EMPTY frame — a silent whole-corpus drop. Fail loudly instead
        # (the pre-literal crossJoin+window path degraded to "assign
        # everything to the lowest centroid", which was no more useful).
        raise ValueError(
            "ivf_cells: no usable centroid vectors (candidate rows "
            f"id < {n_centroids} are missing or all NULL-vector)"
        )
    return assign_cells(corpus, cents, id_col, vec_col).withColumn(
        "cell", F.col("cell").cast(id_type)
    )


def ivf_knn(
    corpus: DataFrame,
    query_max_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int = 8,
) -> DataFrame:
    """IVF-style approximate top-k: each query probes ONLY its own
    centroid cell (nprobe=1) — the inverted-file alternative to the
    hyperplane LSH path in :func:`ann_knn`. At corpus scale a query
    scans ~1/n_centroids of the data; recall is traded for the same
    reason and tunable via n_centroids/nprobe."""
    cells = ivf_cells(corpus, id_col, vec_col, n_centroids).persist()
    q = cells.where(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("_norm").alias("_qn"),
        "cell",
    )
    c = cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.col("_norm").alias("_cn"),
        "cell",
    )
    cos = F.when(
        (F.col("_qn") > 0) & (F.col("_cn") > 0),
        dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        c.join(F.broadcast(q), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            "cosine",
            F.col("cell").cast("long").alias("cell"),
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_iter: int = 5,
    metric: str = "cosine",
) -> list[tuple[int, list[float]]]:
    """Distributed k-means codebook (Lloyd iterations): assign every
    vector to its nearest current centroid, then recompute each centroid
    as its cell's mean. ``metric='cosine'`` (default, spherical — the
    IVF cell shape) or ``'l2'`` (squared Euclidean via the norm identity
    ||v-c||^2 = ||v||^2 + ||c||^2 - 2 v.c — the PQ subspace shape, and
    total for zero vectors where cosine would be NULL).

    Each iteration is one ZERO-SHUFFLE assignment projection (the K·dim
    codebook renders as plan-time literals — the
    ``operators/quantization.py`` matrix-fold idiom) plus one
    partial-combined aggregate: the corpus streams through once per
    iteration and never shuffles for its cell; only K·dim doubles per
    map partition move. Seeding is the K lowest ids actually present
    (no assumption that ids start at 0), so the codebook is
    reproducible run to run; fewer than K vectors is an error. Empty
    cells keep their previous centroid.
    Returns [(cell_id, centroid_vector), ...].
    """
    v = rebalance(corpus).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        l2_norm(F.col(vec_col)).alias("_n"),
    ).persist()
    seed = v.orderBy("_id").limit(n_centroids).select("_id", "_vec").collect()
    if len(seed) < n_centroids:
        v.unpersist()
        raise ValueError(
            f"need >= {n_centroids} vectors to seed, got {len(seed)}"
        )
    # re-key 0..K-1 in id order for stable cell ids
    centroids = {
        i: [float(x) for x in r["_vec"]]
        for i, r in enumerate(sorted(seed, key=lambda r: r["_id"]))
    }
    from informixcdc_spark.functions.vector import MAX_LITERAL_MAT_ELEMS

    oversize = n_centroids * len(centroids[0]) > MAX_LITERAL_MAT_ELEMS
    for _ in range(n_iter):
        cents_sorted = sorted(centroids.items())
        vv = v
        if oversize:
            # production-scale codebooks (K ≈ √N) blow the literal
            # plan-size envelope (functions/vector.py, PERF.md §22):
            # ship the codebook as ONE broadcast 1-row table instead —
            # same fold, zero shuffle, no window, O(1) plan text
            scored, vv = _scored_broadcast(
                v, "_vec", "_n", cents_sorted, metric
            )
            best = _argbest_sql(scored, "<" if metric == "l2" else ">")
        elif metric == "l2":
            # score = _n·_n + ||c||² − 2·(v.c), exactly the Column
            # arithmetic the join plan computed (||c||² is (sqrt fold)²
            # of the f32-truncated centroid — the old ARRAY<FLOAT>
            # l2_norm squared); argmin, ties to the lowest cell id
            rows = [[_f32(x) for x in vec] for _cid, vec in cents_sorted]
            meta = ",".join(
                "named_struct('c', {c}, 'n2', {n2})".format(
                    c=int(cid), n2=dlit(_py_l2(row) * _py_l2(row))
                )
                for (cid, _vec), row in zip(cents_sorted, rows)
            )
            scored = (
                f"zip_with({sql_dot_rows('_vec', rows)}, array({meta}), "
                "(d, m) -> named_struct('c', m.c, 's', "
                "(`_n` * `_n` + m.n2) - (2.0D * d)))"
            )
            best = _argbest_sql(scored, "<")
        else:
            scored = _cos_scored_sql("_vec", "_n", cents_sorted)
            best = _argbest_sql(scored, ">")
        assigned = vv.select(
            F.expr(
                f"coalesce(nullif(({best}).c, -1), {int(cents_sorted[0][0])})"
            ).alias("_cid"),
            "_vec",
        )
        # per-cell mean without one sum-column per dimension (dim-many
        # aggregate columns fall over at 768+): posexplode to
        # (cell, dim_idx, value), partial-combined sum per (cell, dim) —
        # shuffle volume is K·dim doubles per map partition either way —
        # then reassemble each centroid as ONE sorted array fold so the
        # driver collects exactly K rows regardless of dimensionality.
        sums = (
            assigned.select("_cid", F.posexplode("_vec").alias("_p", "_x"))
            .groupBy("_cid", "_p")
            .agg(
                F.sum(F.col("_x").cast("double")).alias("_s"),
                F.count(F.lit(1)).alias("_cnt"),
            )
            .groupBy("_cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_p", "_s"))),
                    lambda s: s["_s"],
                ).alias("_sums"),
                F.max("_cnt").alias("_cnt"),
            )
        )
        new = {
            int(r["_cid"]): [float(x) / r["_cnt"] for x in r["_sums"]]
            for r in sums.collect()
        }
        centroids = {
            cid: new.get(cid, vec) for cid, vec in centroids.items()
        }
    v.unpersist()
    return sorted(centroids.items())


def assign_cells(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-cosine-cell assignment under a GIVEN codebook — the
    FAISS "assign with a trained quantizer" primitive (feeds
    :func:`informixcdc_spark.operators.quantization.ivfpq_search` its
    ``encoded_cells`` input, and is the batch twin of the streaming
    index's frozen-append assignment). Output shape
    (id, vec, _norm, cell); the codebook inlines as plan-time
    literals, so the assignment is one zero-shuffle projection — the
    corpus streams through once and never moves."""
    return assign_cells_topn(corpus, centroids, id_col, vec_col, n=1).drop(
        "_rank"
    )


def assign_cells_topn(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int = 1,
    score_col: str | None = None,
    max_literal_elems: int | None = None,
) -> DataFrame:
    """Top-``n`` nearest-cosine-cell assignment — :func:`assign_cells`
    generalized to multi-assignment (one output row per (vector,
    assigned cell), ``_rank`` 1..n by descending cosine, centroid id
    tiebreak). ``n > 1`` is the IVF "soft assignment" shape: a vector
    is a member of its n closest cells, so a downstream cell-bounded
    pass also sees pairs whose PRIMARY cells differ but share a
    secondary cell.

    The codebook renders as plan-time literals and the per-row top-n is
    one sorted-array slice, so the whole assignment is a single
    ZERO-SHUFFLE projection — the corpus streams through once and never
    moves (the old shape broadcast a codebook table and ranked the
    corpus×K cross join through a row_number window, which shuffled the
    whole corpus per assignment). Output size grows by exactly n×.
    ``score_col`` optionally emits each assigned cell's cosine (NULL on
    zero norms) — the streaming index's dispersion sample.

    Plan-size envelope: literal rendering is free at codebook scale but
    plan text grows O(K·d); past
    :data:`~informixcdc_spark.functions.vector.MAX_LITERAL_MAT_ELEMS`
    elements (override per call with ``max_literal_elems``) the
    assignment switches to :func:`_cos_scored_broadcast` — the same
    fold against a broadcast 1-row codebook table (still zero shuffle,
    no corpus-keyed join, no window), bit-equal, with O(1) plan text —
    instead of stalling the driver on a 100 MB SQL string."""
    cents = sorted((int(c), [float(x) for x in v]) for c, v in centroids)
    v = rebalance(corpus).select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("_norm"),
    )
    if not cents:
        out = v.where(F.lit(False)).select(
            id_col,
            vec_col,
            "_norm",
            F.lit(None).cast("int").alias("cell"),
            F.lit(None).cast("int").alias("_rank"),
        )
        if score_col is not None:
            out = out.withColumn(score_col, F.lit(None).cast("double"))
        return out
    # comparator = the window's (_cos desc nulls-last, _cid asc) order
    cmp = (
        "(l, r) -> CASE "
        "WHEN l.s IS NULL AND r.s IS NULL THEN "
        "CASE WHEN l.c < r.c THEN -1 WHEN l.c > r.c THEN 1 ELSE 0 END "
        "WHEN l.s IS NULL THEN 1 WHEN r.s IS NULL THEN -1 "
        "WHEN l.s > r.s THEN -1 WHEN l.s < r.s THEN 1 "
        "ELSE CASE WHEN l.c < r.c THEN -1 WHEN l.c > r.c THEN 1 ELSE 0 END "
        "END"
    )
    from informixcdc_spark.functions.vector import MAX_LITERAL_MAT_ELEMS

    cap = (
        MAX_LITERAL_MAT_ELEMS
        if max_literal_elems is None
        else max_literal_elems
    )
    if len(cents) * len(cents[0][1]) > cap:
        scored_sql, v = _cos_scored_broadcast(v, vec_col, "_norm", cents)
    else:
        scored_sql = _cos_scored_sql(vec_col, "_norm", cents)
    top = F.expr(f"slice(array_sort({scored_sql}, {cmp}), 1, {int(n)})")
    cols = [
        F.col(id_col),
        F.col(vec_col),
        F.col("_norm"),
        F.col("_e").getField("c").alias("cell"),
        (F.col("_p") + 1).cast("int").alias("_rank"),
    ]
    if score_col is not None:
        cols.append(F.col("_e").getField("s").alias(score_col))
    return v.select(
        id_col, vec_col, "_norm", F.posexplode(top).alias("_p", "_e")
    ).select(*cols)


def ivf_cells_kmeans(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_iter: int = 5,
) -> DataFrame:
    """:func:`ivf_cells` with a trained k-means codebook instead of the
    lowest-id-vector stand-in — same output shape (id, vec, _norm, cell)."""
    return assign_cells(
        corpus,
        kmeans_centroids(corpus, id_col, vec_col, n_centroids, n_iter),
        id_col,
        vec_col,
    )


def ann_knn_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 4,
    nprobe: int = 1,
) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its own bucket PLUS the
    ``nprobe - 1`` buckets reachable by flipping one hyperplane sign bit
    (the classic multi-probe sequence — a vector near a hyperplane most
    likely lands just across it). Recall rises toward exact as nprobe
    grows while each query still scans ~nprobe/2^n_planes of the corpus;
    the corpus side is computed ONCE (no re-hash per probe) and the
    probe expansion explodes only the tiny broadcast query side."""
    if not 1 <= nprobe <= n_planes + 1:
        raise ValueError("nprobe must be in [1, n_planes + 1]")
    c = rebalance(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    base = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket(F.col(vec_col), n_planes).alias("_home"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    # probe 0 = home bucket; probe b>0 = home XOR bit (b-1)
    probes = F.array(
        F.col("_home"),
        *[
            F.col("_home").bitwiseXOR(F.lit(2 ** (b - 1)))
            for b in range(1, nprobe)
        ],
    )
    q = base.select(
        "query_id",
        "_qvec",
        "_qn",
        "_home",
        F.explode(F.slice(probes, 1, nprobe)).alias("bucket"),
    )
    cos = F.when(
        (F.col("_qn") > 0) & (F.col("_cn") > 0),
        dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn")),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            "cosine",
            F.col("_home").alias("home_bucket"),
            "bucket",
        )
    )


def ivf_knn_multiprobe(
    corpus: DataFrame,
    query_max_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """Multi-probe IVF ANN: each query scans its ``nprobe``
    nearest-centroid cells instead of one — the inverted-file analog of
    :func:`ann_knn_multiprobe` (a vector near a cell boundary most
    likely has its true neighbors just across it). Recall rises toward
    exact as nprobe -> n_centroids while each query still scans
    ~nprobe/n_centroids of the corpus. The corpus side is assigned ONCE
    (the inverted file itself never changes with nprobe); only the tiny
    broadcast query side expands by the probe factor."""
    if not 1 <= nprobe <= n_centroids:
        raise ValueError("nprobe must be in [1, n_centroids]")
    cells = ivf_cells(corpus, id_col, vec_col, n_centroids).persist()
    cent = cells.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        F.col("_norm").alias("_cn"),
    )
    q0 = cells.where(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("_norm").alias("_qn"),
        F.col("cell").alias("home_cell"),
    )
    qcos = F.when(
        (F.col("_qn") > 0) & (F.col("_cn") > 0),
        dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn")),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_qcos").desc(), F.col("_cid"))
    probes = (
        q0.crossJoin(F.broadcast(cent))
        .withColumn("_qcos", qcos)
        .withColumn("_pr", F.row_number().over(wq))
        .where(F.col("_pr") <= nprobe)
        .select("query_id", "_qvec", "_qn", "home_cell", F.col("_cid").alias("cell"))
    )
    c = cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec2"),
        F.col("_norm").alias("_cn2"),
        "cell",
    )
    cos = F.when(
        (F.col("_qn") > 0) & (F.col("_cn2") > 0),
        dot(F.col("_qvec"), F.col("_cvec2")) / (F.col("_qn") * F.col("_cn2")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        c.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            "cosine",
            F.col("home_cell").cast("long").alias("home_cell"),
            F.col("cell").cast("long").alias("cell"),
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    release_cache: bool = False,
    n_assign: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-bounded
    semantic deduplication over an embedding column.

    The quadratic pairwise-cosine comparison is bounded to WITHIN each
    cluster: :func:`assign_cells` broadcasts the (tiny, trained)
    codebook so the corpus picks its cell in one pass, then the only
    shuffle is the cell equi-self-join — at 100 TB the cluster count
    scales with the corpus (SemDeDup uses ~100k clusters for LAION),
    keeping every join partition small while the cross-cluster pair
    space (the overwhelming majority of the quadratic) is never
    materialized.

    Drop rule: a vector is a duplicate iff some LOWER-id cluster-mate
    has cosine >= threshold; ``dup_of`` is the smallest such id. This
    keep-min-id rule is SemDeDup's keep-one-representative semantics
    made deterministic (the paper keeps the member farthest from the
    centroid; any fixed tiebreak preserves the dedup guarantee), and it
    needs no chaining/transitive closure — EXISTS is one aggregation.
    For connected-component semantics use
    :func:`informixcdc_spark.operators.dedup.dedup_clusters_star`.

    Returns one row per input vector:
    ``(id, cell, is_kept, dup_of)`` — ``dup_of`` null on kept rows.

    Cache lifetime: the cell-assigned corpus cache lives as long as the
    returned (lazy) plan by default — repeated calls in one session
    accumulate corpus-sized cache blocks. ``release_cache=True``
    materializes the (narrow, vector-free) verdict table
    (``localCheckpoint``) and drops the assignment cache before
    returning; at real scale you would write the verdicts out instead.

    ``n_assign > 1`` trades compute for cell-boundary recall: each
    vector joins the pair stage as a member of its ``n_assign``
    nearest cells (soft assignment), so near-dup pairs that k-means
    split across a boundary are found through a shared secondary cell
    — the loss the SCALEBENCH ``semdedup_recall`` axis measures.
    In-cell pair volume grows ~``n_assign²``; the reported ``cell``
    stays the PRIMARY (rank-1) cell, and verdict multiplicity from
    pairs sharing several cells collapses in the min-aggregate.
    """
    assigned = assign_cells_topn(
        corpus, centroids, id_col, vec_col, n=n_assign
    ).persist()
    primary = assigned.where(F.col("_rank") == 1)
    a = assigned.select(
        F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va"),
        F.col("_norm").alias("_na"), "cell",
    )
    b = assigned.select(
        F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb"),
        F.col("_norm").alias("_nb"), "cell",
    )
    cos = F.when(
        (F.col("_na") > 0) & (F.col("_nb") > 0),
        dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
    )
    dups = (
        a.join(b, "cell")
        .where(F.col("_idb") < F.col("_ida"))
        .where(cos >= threshold)
        .groupBy(F.col("_ida").alias(id_col))
        .agg(F.min("_idb").alias("dup_of"))
    )
    out = (
        primary.join(dups, id_col, "left")
        .select(
            id_col,
            F.col("cell").cast("long").alias("cell"),
            F.col("dup_of").isNull().alias("is_kept"),
            "dup_of",
        )
    )
    if release_cache:
        out = out.localCheckpoint(eager=True)
        assigned.unpersist()
    return out


def rp_weights(d_in: int, d_out: int) -> list[list[float]]:
    """Deterministic ±1 Johnson-Lindenstrauss weights — row j is output
    dimension j's sign pattern, drawn from md5 parity of ``"j|d"`` so
    the matrix is reproducible anywhere (including in a SQL oracle,
    where the signs inline as literals). The ±1 (Achlioptas 2003)
    construction preserves pairwise distances like Gaussian JL at a
    fraction of the arithmetic."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{j}|{d}".encode()).hexdigest()[:2], 16) % 2
            == 0
            else -1.0
            for d in range(d_in)
        ]
        for j in range(d_out)
    ]


def random_projection(
    df: DataFrame,
    d_in: int,
    d_out: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """JL dimensionality reduction: replace ``vec_col`` with its
    ``d_out``-dim projection ``proj_j = dot(vec, w_j)``.

    The weight rows are plan-time literal arrays, so — like
    ``pq_encode``/``sq_encode`` — this is a ZERO-shuffle scan-fused
    projection: reducing 100 TB of embeddings is one map pass, and the
    output feeds any downstream ANN operator at d_out/d_in of the
    dot-product cost. Each output element is the shared left-fold
    ``dot``, so a SQL oracle reproduces the projected values
    bit-for-bit."""
    from informixcdc_spark.functions.vector import sql_dot_rows

    w = rp_weights(d_in, d_out)
    # the d_out × d_in literal weight matrix renders as ONE F.expr
    # higher-order fold (identical 0.0-seeded left folds, bit-equal
    # values — unit-pinned): building it from nested Column calls cost
    # ~1k py4j round trips per call, and the fully unrolled SQL form
    # paid ~2.3 s of JIT/codegen per query (r8 bench: the 'rp' arm's
    # fixture-scale overhead was exactly this)
    proj = F.expr(sql_dot_rows(vec_col, w))
    return df.select(F.col(id_col), proj.alias(vec_col))


def rp_knn(
    corpus: DataFrame,
    queries: DataFrame,
    d_in: int,
    d_out: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Top-k by cosine in the PROJECTED space — the classic
    reduce-then-search recipe: project both sides once (map pass),
    then any search strategy runs at the reduced dimension. Here the
    searcher is the broadcast-query brute-force ranker; at real scale
    the projected corpus feeds the LSH/IVF probes instead."""
    pc = random_projection(corpus, d_in, d_out, id_col, vec_col)
    pq = random_projection(queries, d_in, d_out, id_col, vec_col)
    return brute_force_knn(pc, pq, id_col, vec_col, k)
