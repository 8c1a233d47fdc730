"""Product quantization (PQ) for embedding columns — the FAISS-shaped
memory-compression path for vector corpora at 100 TB scale.

A D-dim float vector (4·D bytes) is split into ``m`` disjoint
dimension ranges (subspaces); each subvector is replaced by the id of
its nearest codeword from a per-subspace k-means codebook. The stored
representation is ``m`` small integers (1 byte each at k<=256) — a
50×+ footprint cut — and search runs Asymmetric Distance Computation
(ADC): per query, one tiny (m × k) table of exact
query-subvector · codeword partial dots is precomputed, and every
candidate scores with ``m`` table lookups instead of ``D``
multiply-adds. Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011.

Spark shapes, chosen for the 100 TB plan:

- **training** (:func:`pq_train`): ALL subspaces share the same
  distributed L2 Lloyd passes — each iteration renders every
  subspace's argmin as a plan-time literal codeword fold (one
  ZERO-SHUFFLE projection; the corpus never moves for its codes) and
  feeds one partial-combined aggregate keyed by (subspace, code), so
  corpus passes are ``n_iter + 1`` regardless of m; only K·subdim
  centroid floats move (driver-collected, metadata-sized).
  Per-subspace semantics match :func:`kmeans_centroids(metric='l2')`,
  which stays the one-space public trainer.
- **encoding** (:func:`pq_encode`): a pure scan-fused projection —
  the trained codebooks are driver-side literals, so the per-subspace
  argmin is a JVM-side fold over an array of (code, dist²) structs.
  Zero shuffles, zero joins: encoding 100 TB is one pass.
- **search** (:func:`pq_search_adc`): the query side (small by
  construction) precomputes its ADC tables as columns, broadcasts,
  and candidates score via ``element_at`` chain lookups. Codeword
  norms are literals (known at plan time), so reconstructed-norm
  cosine needs no stored per-row norm.

Exactness note: ADC sums per-subspace partial dots, i.e. a different
float fold order than a full-vector dot. On real data PQ is an
approximation anyway (that is the point); the driver-graded arm uses a
fixture whose subvectors are exactly representable binary values, so
ADC is bit-equal to brute force and the DuckDB oracle can state exact
top-k (queries/extensions.py::e15_ann_ivf 'pq' arm).

The reference engine has no vector subsystem (it delegates everything
beyond CDC to the Informix server); this module is part of the
LLM-data-pipeline extension surface (SURVEY §2.9).
"""

from __future__ import annotations

import struct as _struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from informixcdc_spark.catalog import rebalance
from informixcdc_spark.functions.vector import (
    dlit,
    dot,
    l2_norm,
    sql_dot_rows,
    sql_l2_norm,
)

#: a PQ codebook set: one entry per subspace, in dimension order
#: {"lo": int, "hi": int, "centroids": [(code, [float, ...]), ...]}
Codebooks = list[dict]


def _f32(x: float) -> float:
    """The exact float32 an ARRAY<FLOAT> codebook column would keep —
    the training loop used to round centroids through one, so the
    literal-fold assignment truncates identically to stay bit-equal."""
    return _struct.unpack("<f", _struct.pack("<f", float(x)))[0]


def _py_sumsq(vals: list[float]) -> float:
    """Driver-side replica of the square-sum left fold the old
    ``_cn2`` column computed (same add order over IEEE doubles)."""
    acc = 0.0
    for x in vals:
        acc += x * x
    return acc


def default_splits(dim: int, m: int) -> list[tuple[int, int]]:
    """Even-as-possible half-open dimension ranges [lo, hi)."""
    return [(s * dim // m, (s + 1) * dim // m) for s in range(m)]


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 2,
    codes: int | list[int] = 8,
    n_iter: int = 2,
    splits: list[tuple[int, int]] | None = None,
) -> Codebooks:
    """Train per-subspace L2 k-means codebooks.

    ``splits`` overrides the even default when the vector has known
    structure (e.g. concatenated feature blocks); ``codes`` may be one
    k for all subspaces or a per-subspace list.

    ALL subspaces train in the same Lloyd passes: seeding is one
    TakeOrdered pass, and each iteration is ONE zero-shuffle assignment
    projection (every subspace's argmin renders as a plan-time literal
    codeword fold — the :func:`_argmin_code` idiom) feeding one
    partial-combined aggregate keyed by (subspace, code). Corpus passes
    are therefore ``n_iter + 1`` regardless of m, and the corpus never
    shuffles for its codes — at 100 TB the scan, not the K·subdim
    centroid math, is the cost, so fusing the m trainers is an m× I/O
    reduction over per-subspace runs. Semantics match
    :func:`kmeans_centroids(metric='l2')` per subspace: seeds are the
    K_s lowest ids re-keyed 0..K_s-1 in id order, empty cells keep
    their previous codeword.
    """
    if splits is None:
        first = corpus.select(F.size(vec_col).alias("_d")).limit(1).collect()
        if not first:
            raise ValueError("cannot train PQ codebooks on an empty corpus")
        splits = default_splits(int(first[0]["_d"]), m)
    ks = codes if isinstance(codes, list) else [codes] * len(splits)
    if len(ks) != len(splits):
        raise ValueError(f"codes list ({len(ks)}) != subspaces ({len(splits)})")
    # seeding: the max(K_s) lowest-id FULL vectors via orderBy+limit —
    # Catalyst plans TakeOrdered (per-partition top-k, no shuffle; a
    # windowed per-subspace rank here would full-sort the exploded
    # corpus) — then slice into subvectors driver-side
    kmax = max(ks)
    seed = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(kmax)
        .collect()
    )
    if len(seed) < kmax:
        raise ValueError(f"need >= {kmax} vectors to seed, got {len(seed)}")
    seed = sorted(seed, key=lambda r: r["_id"])
    cents: dict[tuple[int, int], list[float]] = {}
    for s, ((lo, hi), k) in enumerate(zip(splits, ks)):
        for cid in range(k):
            cents[(s, cid)] = [float(x) for x in seed[cid]["_v"][lo:hi]]
    for _ in range(n_iter):
        # per-subspace nearest codeword as a literal fold: score =
        # ||sv||² + ||c||² − 2·(sv.c) with the SAME Column arithmetic
        # the join plan computed (codewords f32-truncated like the old
        # ARRAY<FLOAT> table, ||c||² the raw square-sum fold); argmin
        # with ties to the lowest code, NULL subvectors to code 0 (the
        # window's nulls-first order) — their NULL slice then explodes
        # to zero mean rows exactly as before
        parts = []
        for s, ((lo, hi), k) in enumerate(zip(splits, ks)):
            w = hi - lo
            crows = [[_f32(x) for x in cents[(s, cid)]] for cid in range(k)]
            n2s = (
                f"aggregate(slice(`{vec_col}`, {lo + 1}, {w}), 0D, "
                "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
            )
            meta = ",".join(
                f"named_struct('c', {cid}, 'n2', {dlit(_py_sumsq(row))})"
                for cid, row in enumerate(crows)
            )
            scored = (
                f"zip_with({sql_dot_rows(vec_col, crows, lo=lo)}, "
                f"array({meta}), (d, m) -> named_struct('c', m.c, 's', "
                f"({n2s} + m.n2) - (2.0D * d)))"
            )
            argmin = (
                f"aggregate({scored}, "
                "named_struct('c', -1, 's', CAST(NULL AS DOUBLE)), "
                "(acc, e) -> CASE WHEN e.s IS NULL THEN acc "
                "WHEN acc.s IS NULL THEN e "
                "WHEN e.s < acc.s THEN e ELSE acc END)"
            )
            parts.append(
                f"named_struct('_s', {s}, "
                f"'_cid', coalesce(nullif(({argmin}).c, -1), 0), "
                f"'_sv', slice(`{vec_col}`, {lo + 1}, {w}))"
            )
        assigned = rebalance(corpus).select(
            F.expr("inline(array(" + ",".join(parts) + "))")
        )
        # per-(subspace, code) mean without subdim-many agg columns —
        # same array-fold reassembly as kmeans_centroids
        sums = (
            assigned.select("_s", "_cid", F.posexplode("_sv").alias("_p", "_x"))
            .groupBy("_s", "_cid", "_p")
            .agg(
                F.sum(F.col("_x").cast("double")).alias("_sum"),
                F.count(F.lit(1)).alias("_cnt"),
            )
            .groupBy("_s", "_cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_p", "_sum"))),
                    lambda st: st["_sum"],
                ).alias("_sums"),
                F.max("_cnt").alias("_cnt"),
            )
        )
        new = {
            (int(r["_s"]), int(r["_cid"])): [
                float(x) / r["_cnt"] for x in r["_sums"]
            ]
            for r in sums.collect()
        }
        cents = {key: new.get(key, vec) for key, vec in cents.items()}
    return [
        {
            "lo": lo,
            "hi": hi,
            "centroids": sorted(
                (cid, vec) for (ss, cid), vec in cents.items() if ss == s
            ),
        }
        for s, (lo, hi) in enumerate(splits)
    ]


def _lit_vec(vals: list[float]) -> Column:
    # one F.expr parse instead of len(vals)+1 py4j Column calls — the
    # parsed doubles are bit-equal to F.lit (see functions.vector.dlit)
    return F.expr("array(" + ",".join(dlit(x) for x in vals) + ")")


def _argmin_code(
    vec_col: str, lo: int, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Nearest-codeword id for the ``len(codeword)`` dims of
    ``vec_col`` starting at 0-based ``lo``: a JVM-side fold over an
    array of (code, dist²) structs — no join, no shuffle, no UDF.
    Strict ``<`` keeps the FIRST minimum, i.e. the lowest code id on
    ties (centroids arrive sorted by code).

    The whole (codes × subdims) literal table renders as ONE SQL string
    of higher-order folds over a literal codeword table (``F.expr``):
    building it as nested Column calls cost seconds of driver-side
    py4j chatter per encode plan at m=32×16 codes, and a fully
    unrolled SQL form pays seconds of JIT/codegen (see
    functions.vector.sql_dot_rows). A NULL vector folds to the ``-1``
    sentinel exactly as before (every dist² is NULL, the CASE keeps
    the init struct) — ``pq_encode``'s isNotNull guard masks it to
    NULL codes."""
    from informixcdc_spark.functions.vector import _guard_lit_elems

    w = len(centroids[0][1])
    # same plan-size envelope as the fold renderers (PERF.md §22):
    # refuse to inline an oversize codeword table — pq_encode switches
    # to the Arrow encoder above the ceiling before reaching here
    _guard_lit_elems(len(centroids) * w, None)
    codes_arr = ",".join(
        "named_struct('c', {cid}, 'v', array({vs}))".format(
            cid=int(cid), vs=",".join(dlit(x) for x in cvec)
        )
        for cid, cvec in centroids
    )
    dist2 = (
        f"aggregate(zip_with(slice(`{vec_col}`, {lo + 1}, {w}), e.v, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "0D, (a, t) -> a + t)"
    )
    return F.expr(
        f"(aggregate(transform(array({codes_arr}), "
        f"e -> named_struct('c', e.c, 'd', {dist2})), "
        "named_struct('c', -1, 'd', CAST('Infinity' AS DOUBLE)), "
        "(acc, s) -> CASE WHEN s.d < acc.d THEN s ELSE acc END)).c"
    )


def pq_encode(
    corpus: DataFrame,
    books: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes array<int>, *keep_cols) — the compressed corpus
    representation (``keep_cols`` carries e.g. an IVF ``cell`` through).

    Pure projection: codebooks are plan-time literals, so this is one
    scan with zero exchanges (pinned in tests/test_plans.py). At k<=256
    the codes array is castable to 1 byte/subspace downstream.

    Plan-size envelope: past
    :data:`~informixcdc_spark.functions.vector.MAX_LITERAL_MAT_ELEMS`
    total codeword elements (Σ_s k_s·subdim_s — production m=32×k=256
    over 768 dims sits just under it) the literal render would stall
    the driver (PERF.md §22), so the encode switches to
    :func:`pq_encode_arrow` — the property-pinned-equal numpy argmin
    over ``mapInPandas`` — which ships the codebooks as task binaries
    instead of plan text. Same (id, codes, *keep_cols) contract, same
    codes, same NULL-vector → NULL-codes semantics.
    """
    n_elems = sum(
        len(b["centroids"]) * len(b["centroids"][0][1]) for b in books
    )
    from informixcdc_spark.functions.vector import MAX_LITERAL_MAT_ELEMS

    if n_elems > MAX_LITERAL_MAT_ELEMS:
        return pq_encode_arrow(corpus, books, id_col, vec_col, keep_cols)
    code_cols = [
        _argmin_code(vec_col, b["lo"], b["centroids"]) for b in books
    ]
    # a NULL vector encodes as NULL codes — without the guard the
    # argmin fold's accumulator survives untouched and emits the -1
    # sentinel per subspace, which downstream ADC would then look up
    # (caught by the arrow/literal equality property)
    codes = F.when(
        F.col(vec_col).isNotNull(), F.array(*code_cols)
    )
    # deliberately NO rebalance/repartition: encoding preserves the
    # corpus partitioning so it fuses into whatever scan feeds it
    return corpus.select(
        F.col(id_col), codes.alias("codes"), *keep_cols
    )


def _adc_query_table(books: Codebooks, vec_col: str) -> Column:
    """Per-query ADC table: _qtab[s][code] = q_subvec . codeword (exact
    dots of the real query vector — the "asymmetric" in ADC).

    Rendered as ONE ``F.expr`` string of per-subspace matrix folds
    (:func:`sql_dot_rows`): the m×codes literal dot table (512 entries
    at m=32×16) built from nested Column calls cost ~13 s of
    driver-side py4j plan construction PER SEARCH CALL — the
    dominating term in SCALEBENCH's ivfpq probe points (r8 verdict) —
    and the fully unrolled SQL form still paid seconds of JIT/codegen.
    The folds are the identical 0.0-seeded left adds, so scores stay
    bit-equal (unit/property pinned)."""
    rows = ",".join(
        sql_dot_rows(
            vec_col, [cvec for _cid, cvec in b["centroids"]], lo=b["lo"]
        )
        for b in books
    )
    return F.expr(f"array({rows})")


def _adc_query_table_broadcast(
    queries: DataFrame, books: Codebooks, vec_col: str
) -> tuple[Column, DataFrame]:
    """:func:`_adc_query_table` past the plan-size envelope
    (``functions.vector.MAX_LITERAL_MAT_ELEMS``): the per-subspace
    codeword matrices ship as ONE broadcast 1-row table instead of
    plan text, and each (subspace, code) partial dot is the same
    0.0-seeded left fold evaluated against the struct's
    ``array<double>`` codeword — bit-equal to the literal render
    (same Python-float codewords, same slice offsets, same IEEE fold
    order; unit-pinned). Applied to the QUERY side only, which is
    small by construction, so the crossJoin is a free 1-row broadcast.
    Returns (qtab_column, queries_with_book_column)."""
    bk = queries.sparkSession.createDataFrame(
        [
            (
                [
                    (
                        int(b["lo"]),
                        [[float(x) for x in v] for _c, v in b["centroids"]],
                    )
                    for b in books
                ],
            )
        ],
        "_bk array<struct<lo:int, m:array<array<double>>>>",
    )
    qtab = F.expr(
        "transform(`_bk`, b -> transform(b.m, r -> "
        f"aggregate(zip_with(slice(`{vec_col}`, b.lo + 1, size(r)), r, "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, t) -> acc + t)))"
    )
    return qtab, queries.crossJoin(F.broadcast(bk))


def _books_elems(books: Codebooks) -> int:
    """Total literal elements an ADC query table would inline."""
    return sum(
        len(b["centroids"]) * len(b["centroids"][0][1]) for b in books
    )


def _adc_score(scored: DataFrame, books: Codebooks, k: int) -> DataFrame:
    """Score (neighbor_id, codes, query_id, _qtab, _qn) rows: m table
    lookups for the partial dot, a literal codeword-norm fold for the
    reconstructed norm, then the per-query top-k window."""
    # codeword squared norms are plan-time literals: ||v̂||² = Σ_s ||c_s||²
    # (exact — subspaces cover disjoint dims), so no per-row stored norm.
    # One F.expr parse for the whole m×codes table (see _adc_query_table)
    cn2 = F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                dlit(sum(float(x) * float(x) for x in cvec))
                for _cid, cvec in b["centroids"]
            )
            + ")"
            for b in books
        )
        + ")"
    )
    idx = F.sequence(F.lit(1), F.lit(len(books)))  # 1-based subspace pos
    codes = F.col("codes")
    partial = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("_qtab"), s), F.element_at(codes, s) + 1
        ),
    )
    rn2 = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(F.element_at(cn2, s), F.element_at(codes, s) + 1),
    )
    cos = F.when(
        (F.col("_qn") > 0) & (F.col("_rn2") > 0),
        F.col("_partial") / (F.col("_qn") * F.sqrt(F.col("_rn2"))),
    )
    scored = (
        scored.withColumn("_partial", partial)
        .withColumn("_rn2", rn2)
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
        )
    )


def pq_search_adc(
    queries: DataFrame,
    encoded: DataFrame,
    books: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """ADC top-k by reconstructed cosine over a PQ-encoded corpus.

    Output: (query_id, rank, neighbor_id, cosine). The query side
    precomputes its (m × k) partial-dot table as a column and is
    broadcast; per-candidate work is m ``element_at`` lookups + one
    literal-table reconstructed-norm fold — independent of D. This is
    the flat (exhaustive-codes) scan; :func:`ivfpq_search` is the
    cell-restricted composition. Past the plan-size envelope the query
    table switches to :func:`_adc_query_table_broadcast` (bit-equal).
    """
    from informixcdc_spark.functions.vector import MAX_LITERAL_MAT_ELEMS

    if _books_elems(books) > MAX_LITERAL_MAT_ELEMS:
        qtab, qsrc = _adc_query_table_broadcast(queries, books, vec_col)
    else:
        qtab, qsrc = _adc_query_table(books, vec_col), queries
    q = qsrc.select(
        F.col(id_col).alias("query_id"),
        qtab.alias("_qtab"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    scored = (
        encoded.select(F.col(id_col).alias("neighbor_id"), "codes")
        .crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    return _adc_score(scored, books, k)


def ivfpq_search(
    queries: DataFrame,
    encoded_cells: DataFrame,
    books: Codebooks,
    cell_centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 1,
) -> DataFrame:
    """IVF×PQ (the full FAISS ``IVFPQ`` shape): each query probes its
    top-``nprobe`` cosine cells and ADC-scores ONLY those cells' codes.

    ``encoded_cells`` is :func:`pq_encode(..., keep_cols=("cell",))`
    over an IVF cell assignment (``ivf_cells_kmeans``);
    ``cell_centroids`` is the driver-side full-D coarse codebook (e.g.
    from ``kmeans_centroids``). The query's probe list is a literal
    fold (no join): an array of (-cos, cell) structs sorted ascending —
    cos desc then cell asc, the ``ivf_cells`` tiebreak. The candidate
    join is an equi-join on cell, so a query touches ~nprobe/n_cells of
    the codes; per-candidate cost stays m lookups. At nprobe = n_cells
    this equals :func:`pq_search_adc` exactly (unit-tested).
    """
    from informixcdc_spark.functions.vector import MAX_LITERAL_MAT_ELEMS

    qn = l2_norm(F.col(vec_col))
    # the coarse probe table is literal-heavy too (n_cells × D dots) —
    # one F.expr parse of a matrix fold, identical folds/values (see
    # _adc_query_table); n_cells stays small so the struct wrap is
    # cheap. Past the plan-size envelope the coarse codebook ships as
    # a broadcast 1-row table instead (same struct shape, same folds —
    # the query side is small, so the crossJoin is free).
    qn_sql = sql_l2_norm(vec_col)
    D = len(cell_centroids[0][1])
    qsrc = queries
    if len(cell_centroids) * D > MAX_LITERAL_MAT_ELEMS:
        cc = queries.sparkSession.createDataFrame(
            [
                (
                    [
                        (
                            int(cid),
                            sum(float(x) * float(x) for x in cvec) ** 0.5,
                            [float(x) for x in cvec],
                        )
                        for cid, cvec in cell_centroids
                    ],
                )
            ],
            "_cc array<struct<c:int, cn:double, v:array<double>>>",
        )
        qsrc = qsrc.crossJoin(F.broadcast(cc))
        cells_src = "`_cc`"
    else:
        cells_src = "array(" + ",".join(
            "named_struct('c', {cid}, 'cn', {cn}, 'v', array({vs}))".format(
                cid=int(cid),
                cn=dlit(sum(float(x) * float(x) for x in cvec) ** 0.5),
                vs=",".join(dlit(x) for x in cvec),
            )
            for cid, cvec in cell_centroids
        ) + ")"
    cdot = (
        f"aggregate(zip_with(slice(`{vec_col}`, 1, {D}), e.v, "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, t) -> acc + t)"
    )
    probes = F.expr(
        f"transform(slice(sort_array(transform({cells_src}, "
        f"e -> named_struct('negcos', -(CASE WHEN {qn_sql} > 0D THEN "
        f"{cdot} / ({qn_sql} * e.cn) ELSE 2.0D END), 'cell', e.c))), "
        f"1, {int(nprobe)}), s -> s.cell)"
    )
    if _books_elems(books) > MAX_LITERAL_MAT_ELEMS:
        qtab, qsrc = _adc_query_table_broadcast(qsrc, books, vec_col)
    else:
        qtab = _adc_query_table(books, vec_col)
    q = qsrc.select(
        F.col(id_col).alias("query_id"),
        qtab.alias("_qtab"),
        qn.alias("_qn"),
        F.explode(probes).alias("cell"),
    )
    scored = (
        encoded_cells.select(
            F.col(id_col).alias("neighbor_id"), "codes", "cell"
        )
        .join(F.broadcast(q), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    return _adc_score(scored, books, k)


def pq_encode_arrow(
    corpus: DataFrame,
    books: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """:func:`pq_encode`'s Arrow twin: same (id, codes, *keep_cols)
    contract, computed as a numpy argmin inside ONE ``mapInPandas``
    stage instead of a plan-time literal fold.

    Which encoder wins is a batch-size question. The literal fold is
    the right shape for the one big corpus scan (whole-stage codegen,
    zero Python) — its large expression tree compiles once and
    amortizes over 100 TB. A STREAMING micro-batch re-pays that plan
    build and codegen every batch over a few hundred rows, where this
    encoder's fixed cost is one Arrow round-trip and a k×d matrix
    subtract — measured ~4× faster per micro-batch at m=8, k=16,
    D=64 (STREAMBENCH's ann_index axis: 83 → 321 vecs/s); the
    incremental PQ index uses it for exactly that reason. Tie-breaks match the literal fold
    (first minimum = lowest code id; centroids arrive code-sorted);
    null vectors yield null codes, as the literal path's null fold
    does.
    """
    mats = [
        (
            int(b["lo"]),
            int(b["hi"]),
            [[float(x) for x in v] for _c, v in b["centroids"]],
            [int(c) for c, _v in b["centroids"]],
        )
        for b in books
    ]
    dtypes = dict(corpus.select(id_col, vec_col, *keep_cols).dtypes)

    def _run(batches):
        import numpy as np
        import pandas as pd

        npm = [
            (lo, hi, np.asarray(m, dtype=np.float64), np.asarray(ids))
            for lo, hi, m, ids in mats
        ]
        for pdf in batches:
            n = len(pdf)
            codes: list = [None] * n
            live = [
                i for i, v in enumerate(pdf[vec_col]) if v is not None
            ]
            if live:
                vecs = np.asarray(
                    [np.asarray(pdf[vec_col].iloc[i], dtype=np.float64) for i in live]
                )
                per_sub = []
                for lo, hi, M, ids in npm:
                    sub = vecs[:, lo:hi]
                    d2 = ((sub[:, None, :] - M[None, :, :]) ** 2).sum(-1)
                    per_sub.append(ids[np.argmin(d2, axis=1)])
                stacked = np.stack(per_sub, axis=1)
                for j, i in enumerate(live):
                    codes[i] = [int(x) for x in stacked[j]]
            out = {id_col: pdf[id_col], "codes": codes}
            for kc in keep_cols:
                out[kc] = pdf[kc]
            yield pd.DataFrame(out)

    keep_schema = "".join(f", {c} {dtypes[c]}" for c in keep_cols)
    return corpus.select(id_col, vec_col, *keep_cols).mapInPandas(
        _run,
        schema=f"{id_col} {dtypes[id_col]}, codes array<int>{keep_schema}",
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the OTHER standard FAISS compression:
# per-DIMENSION affine byte codes instead of per-subspace codewords.
# Cheaper to train than PQ (two scalars per dimension, no Lloyd), less
# compression-aware; production stacks offer both (faiss SQ8 vs PQ).
# ---------------------------------------------------------------------------


def sq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) quantization bounds.

    One posexplode + a dimension-keyed min/max aggregate: the shuffle
    carries at most D rows per map partition (map-side combined) and
    the collect is D rows — metadata-sized, like the k-means codebook
    collects. Degenerate dimensions (min == max) are handled at encode
    time (range treated as 1, every code 0, reconstruction exact)."""
    from informixcdc_spark.catalog import rebalance

    rows = (
        rebalance(corpus)
        .select(F.posexplode(vec_col).alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    by_dim = sorted((int(r["d"]), float(r["mn"]), float(r["mx"])) for r in rows)
    return [(mn, mx) for _, mn, mx in by_dim]


def _sq_literal_arrays(
    bounds: list[tuple[float, float]],
) -> tuple[Column, Column]:
    mins = F.array(*[F.lit(mn).cast("double") for mn, _ in bounds])
    rngs = F.array(
        *[
            F.lit((mx - mn) if mx > mn else 1.0).cast("double")
            for mn, mx in bounds
        ]
    )
    return mins, rngs


def sq_encode(
    corpus: DataFrame,
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """``(id, codes array<int>)`` — one byte-range code per dimension:
    ``code_d = clamp(floor((x_d - min_d) · (levels-1) / range_d))``.

    The bounds are plan-time literal arrays, so encoding — like
    :func:`pq_encode` — is a zero-shuffle scan-fused projection:
    compressing 100 TB is one map pass (4·D bytes → D codes)."""
    mins, rngs = _sq_literal_arrays(bounds)
    code = lambda x, i: (  # noqa: E731
        F.least(
            F.greatest(
                F.floor(
                    (x.cast("double") - F.element_at(mins, i + F.lit(1)))
                    * F.lit(levels - 1)
                    / F.element_at(rngs, i + F.lit(1))
                ),
                F.lit(0).cast("long"),
            ),
            F.lit(levels - 1).cast("long"),
        ).cast("int")
    )
    return corpus.select(
        F.col(id_col), F.transform(F.col(vec_col), code).alias("codes")
    )


def sq_decode_expr(
    codes: Column,
    bounds: list[tuple[float, float]],
    levels: int = 256,
) -> Column:
    """Reconstruction as a column expression:
    ``min_d + (code_d · range_d) / (levels-1)`` — the multiply-BEFORE-
    divide order is pinned so integer-exact fixtures (code·range a
    multiple of levels-1) reconstruct bit-equal to the original."""
    mins, rngs = _sq_literal_arrays(bounds)
    return F.transform(
        codes,
        lambda c, i: (
            F.element_at(mins, i + F.lit(1))
            + (c.cast("double") * F.element_at(rngs, i + F.lit(1)))
            / F.lit(levels - 1)
        ).cast("float"),
    )


def sq_search(
    queries: DataFrame,
    encoded: DataFrame,
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    levels: int = 256,
) -> DataFrame:
    """Exact-over-reconstruction top-k: decode the (compressed) corpus
    on the fly — another scan-fused projection, no stored floats — and
    rank by cosine against the full-precision queries, sharing
    :func:`..similarity.brute_force_knn`'s broadcast-query/windowed
    top-k shape and fold order. Output (query_id, rank, neighbor_id,
    cosine)."""
    from informixcdc_spark.operators.similarity import brute_force_knn

    recon = encoded.select(
        F.col(id_col),
        sq_decode_expr(F.col("codes"), bounds, levels).alias(vec_col),
    )
    return brute_force_knn(recon, queries, id_col, vec_col, k)
