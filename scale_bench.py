"""Scaling-curve bench: representative queries at 1x/4x/8x/16x data
(CDC families additionally at 32x), recording wall time AND shuffle
write bytes per point.

Usage: python scale_bench.py   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
                                SPARK_GRAFT_SCALES="1,4,8,16",
                                SPARK_GRAFT_CDC_SCALES="32",
                                SPARK_GRAFT_REPS)

Complements the closed-form correctness smokes in tests/test_scale_smoke.py
with MEASURED wall-clock: on a fixed local[32] box an operator whose plan
is linear in the input shows sec(m) ~ m * sec(1); a super-linear curve
(efficiency >> 1) is the local signature of a shuffle/join that would
melt at cluster scale. Shuffle bytes (UI REST probe) are the companion
signal wall time can hide: free local cores absorb a super-linear
shuffle that a busy 1000-executor cluster would not. Writes
SCALEBENCH.json.

Replica construction keeps data distributions honest instead of naively
unioning m verbatim copies (which would grow near-dup candidate sets and
self-join outputs quadratically for data reasons, not plan reasons):

- orders/lineitem: o_orderkey/l_orderkey shifted by the SAME stride per
  replica, so the orders-lineitem join fans out linearly and per-key
  group sizes stay constant;
- events: event_id and user_id shifted — m x users, sessions/user const;
- documents: doc_id shifted, text Caesar-rotated per replica (rot-k over
  [a-zA-Z], length-preserving) — within-replica duplicate structure is
  IDENTICAL, cross-replica shingle overlap is ~0, so dedup families see
  m x corpus with a constant dup-rate;
- embeddings: vec_id shifted, array circularly rotated per replica —
  norm-preserving, decorrelates replicas so LSH/IVF bucket load stays
  balanced rather than stacking m copies of every vector in one bucket.

Dim tables (region nation customer supplier part) are copied verbatim:
fact-times-m against constant dims is the realistic growth mode.
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from informixcdc_spark.hostmeter import steal_seconds  # noqa: E402
from informixcdc_spark.queries import all_queries  # noqa: E402
from informixcdc_spark.session import get_spark  # noqa: E402

#: one representative per family: CDC apply, consumer-side artifacts
#: (savepoints + SCD2 history + compaction; incremental view), dim
#: join+agg, pure agg, windows, join variants, exact dedup, MinHash
#: near-dup, vector + lexical top-k (e07 carries brute/LSH/BM25/stream
#: arms), quality models (e10 carries the heuristic/Gopher/C4 fold
#: exprs, the bigram LM and the weak-label NB classifier), vector
#: quantization (e15 carries ivf/kmeans/stream/pq/ivfpq/sq arms —
#: added r9: the top bench query deserves a wall curve, not just the
#: recall_nprobe probe-cost axis), graph (cc + pagerank), benchmark
#: decontamination (exact/coarse/fuzzy arms), sessionization.
QUERIES = [
    "c01_cdc_apply_net_effect",
    "c05_cdc_savepoint_state",
    "c07_cdc_txn_summary",
    "q01_revenue_by_nation",
    "q02_pricing_summary",
    "b04_window_functions",
    "b06_join_variants",
    "e01_dedup_exact",
    "e03_minhash_lsh_jaccard",
    "e07_knn_exact_and_lsh",
    "e09_token_stats",
    "e10_quality_repetition",
    "e15_ann_ivf",
    "e20_dedup_clusters",
    "e27_decontamination",
    "a31_sessionization",
]

_FACTS = ("orders", "lineitem", "events", "documents", "embeddings")
_DIMS = ("region", "nation", "customer", "supplier", "part")


def _rot_alphabet(k: int) -> tuple[str, str]:
    lo, up = string.ascii_lowercase, string.ascii_uppercase
    k %= 26
    return lo + up, lo[k:] + lo[:k] + up[k:] + up[:k]


def _replicas(df: DataFrame, m: int, tf) -> DataFrame:
    out = tf(df, 0)
    for r in range(1, m):
        out = out.unionByName(tf(df, r))
    return out


def materialize(
    spark, src: str, dst: str, m: int, tables: tuple[str, ...] = _FACTS
) -> dict[str, int]:
    """Build the m-x directory; returns per-table row counts.
    ``tables`` restricts which facts are replicated (the CDC-only 32x
    point needs just orders). With SPARK_GRAFT_REUSE=1, already-built
    replica dirs are trusted (the construction is deterministic) and
    only counted."""
    reuse = os.environ.get("SPARK_GRAFT_REUSE") == "1"
    if reuse and all(
        os.path.exists(os.path.join(dst, f"{t}.parquet"))
        for t in (*tables, *_DIMS)
    ):
        return {
            t: spark.read.parquet(os.path.join(dst, f"{t}.parquet")).count()
            for t in tables
        }
    os.makedirs(dst, exist_ok=True)
    for t in _DIMS:
        tgt = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(tgt):
            shutil.copy(os.path.join(src, f"{t}.parquet"), tgt)

    strides = {}
    for t, key in (("orders", "o_orderkey"), ("events", "event_id"),
                   ("documents", "doc_id"), ("embeddings", "vec_id")):
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        strides[t] = df.agg(F.max(key) + 1).collect()[0][0]
    user_stride = (
        spark.read.parquet(os.path.join(src, "events.parquet"))
        .agg(F.max("user_id") + 1).collect()[0][0]
    )

    def shift(col, stride):
        return lambda df, r: df.withColumn(col, F.col(col) + F.lit(r * stride))

    def tf_lineitem(df, r):
        return df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(r * strides["orders"])
        )

    def tf_events(df, r):
        return (
            df.withColumn("event_id", F.col("event_id") + F.lit(r * strides["events"]))
            .withColumn("user_id", F.col("user_id") + F.lit(r * user_stride))
        )

    def tf_documents(df, r):
        src_a, dst_a = _rot_alphabet(r)
        out = df.withColumn(
            "doc_id", F.col("doc_id") + F.lit(r * strides["documents"])
        )
        if r % 26:
            out = out.withColumn("text", F.translate("text", src_a, dst_a))
        return out

    def tf_embeddings(df, r):
        out = df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(r * strides["embeddings"])
        )
        if r:
            k = r % 8 or 1  # any nonzero rotation decorrelates
            out = out.withColumn(
                "embedding",
                F.expr(
                    f"concat(slice(embedding, {k + 1}, size(embedding) - {k}),"
                    f" slice(embedding, 1, {k}))"
                ),
            )
        return out

    transforms = {
        "orders": shift("o_orderkey", strides["orders"]),
        "lineitem": tf_lineitem,
        "events": tf_events,
        "documents": tf_documents,
        "embeddings": tf_embeddings,
    }
    counts = {}
    for t in tables:
        tgt = os.path.join(dst, f"{t}.parquet")
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        scaled = _replicas(df, m, transforms[t])
        # partition count scales with data so per-partition bytes stay
        # constant — the knob a cluster job would set via maxPartitionBytes
        scaled.repartition(max(4, 4 * m)).write.mode("overwrite").parquet(tgt)
        counts[t] = spark.read.parquet(tgt).count()
    return counts


def _shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle WRITE bytes over all completed stages, via the
    UI REST API (local mode; UI enabled for this bench only). Shuffle
    bytes are the scale signal wall time can hide: on a box with free
    cores a super-linear SHUFFLE still finishes in near-linear time —
    on a busy 1000-executor cluster it would not. -1 when the probe is
    unavailable (UI off / app restarting)."""
    import urllib.request

    try:
        app_id = spark.sparkContext.applicationId
        port = spark.sparkContext.getConf().get("spark.ui.port", "4040")
        url = (
            f"http://127.0.0.1:{port}/api/v1/applications/{app_id}"
            f"/stages?status=complete"
        )
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
        return sum(int(s.get("shuffleWriteBytes", 0)) for s in stages)
    except Exception:
        return -1


def recall_curves(
    spark, mdir: str, scale: int, k: int = 10, n_queries: int = 24
) -> dict:
    """Recall-vs-nprobe axis (r6 verdict stretch #9): at the top scale,
    quantify the recall/latency trade each MULTIPROBE operator claims —
    recall@k vs exact brute force as nprobe grows, with the wall time
    of each point. LSH flips hyperplane sign bits, IVF probes extra
    cells, IVFPQ composes the cell probe with ADC scoring; all three
    should show recall rising toward 1.0 while each point still scans
    only ~probe-fraction of the corpus."""
    from informixcdc_spark.operators.quantization import (
        ivfpq_search,
        pq_encode,
        pq_train,
    )
    from informixcdc_spark.operators.similarity import (
        ann_knn_multiprobe,
        assign_cells,
        brute_force_knn,
        ivf_knn_multiprobe,
        kmeans_centroids,
    )

    emb = spark.read.parquet(os.path.join(mdir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < n_queries)

    def truth_sets(df: DataFrame) -> dict[int, set]:
        out: dict[int, set] = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    t0 = time.perf_counter()
    exact = truth_sets(brute_force_knn(emb, queries, k=k))
    exact_sec = round(time.perf_counter() - t0, 3)

    def point(df_builder) -> dict:
        t0 = time.perf_counter()
        got = truth_sets(df_builder())
        sec = round(time.perf_counter() - t0, 3)
        recalls = [
            len(got.get(q, set()) & hits) / len(hits)
            for q, hits in exact.items()
            if hits
        ]
        return {
            "recall": round(sum(recalls) / len(recalls), 4) if recalls else 0.0,
            "sec": sec,
        }

    curves: dict[str, dict] = {
        "scale": scale,
        "k": k,
        "n_queries": n_queries,
        "exact_sec": exact_sec,
    }
    curves["lsh"] = {
        str(npr): point(
            lambda npr=npr: ann_knn_multiprobe(
                emb, queries, k=k, n_planes=4, nprobe=npr
            )
        )
        for npr in (1, 2, 3, 5)
    }
    curves["ivf"] = {
        str(npr): point(
            lambda npr=npr: ivf_knn_multiprobe(
                emb, query_max_id=n_queries, k=k, n_centroids=8, nprobe=npr
            )
        )
        for npr in (1, 2, 4, 8)
    }
    # IVFPQ: train once (coarse codebook + per-subspace PQ books), then
    # sweep nprobe over the SAME encoded corpus — matching how a real
    # deployment amortizes training across queries. m=32 2-dim
    # subspaces x 16 codes: the nprobe=n_cells point IS the flat-ADC
    # ceiling, which the synthetic near-uniform embeddings bound at
    # ~0.7 (neighbor cosine gaps are tiny, so quantization error costs
    # recall that clustered real embeddings would not) — the curve
    # reads as recall relative to that ceiling
    cents = kmeans_centroids(emb, n_centroids=8, n_iter=2)
    books = pq_train(emb, m=32, codes=16, n_iter=2)
    enc = pq_encode(
        assign_cells(emb, cents), books, keep_cols=("cell",)
    ).persist()
    enc.count()  # materialize outside the timed points
    curves["ivfpq"] = {
        str(npr): point(
            lambda npr=npr: ivfpq_search(
                queries, enc, books, cents, k=k, nprobe=npr
            )
        )
        for npr in (1, 2, 4, 8)
    }
    enc.unpersist()
    return curves


def minhash_dedup_recall(
    spark,
    mdir: str,
    scale: int,
    configs: tuple[tuple[int, int], ...] = ((2, 4), (4, 2), (8, 2), (16, 1)),
) -> dict:
    """Planted-paraphrase recall axis for MinHash-LSH text dedup (r8
    verdict #3): the operator users trust with DESTRUCTIVE deletes has
    a tunable miss rate — per pair at Jaccard j, P(candidate) =
    1-(1-j^r)^b for b bands × r rows — and the driver's fixture-equality
    grading cannot see it because the oracle shares the banding.

    Here every document plants THREE graded near-dups (last 5% / 15% /
    30% of tokens truncated, ids offset per grade), each planted pair's
    EXACT shingle Jaccard is computed with one equi-join on the id
    offset (never all-pairs), and for each (n_bands, rows_per_band)
    config we measure the fraction of planted pairs sharing ≥1 band
    bucket — by construction exactly the pairs
    :func:`lsh_candidate_pairs` would emit — bucketed by Jaccard
    decile, next to the theoretical expectation. A measured recall far
    under the formula would flag a broken signature scheme; recall
    matching it quantifies what each banding config genuinely loses.
    """
    from informixcdc_spark.functions.text import tokens
    from informixcdc_spark.operators.dedup import doc_shingles, minhash_bands

    OFF = 10_000_000
    docs = spark.read.parquet(os.path.join(mdir, "documents.parquet")).select(
        "doc_id", "text"
    )
    grades = (0.05, 0.15, 0.30)
    variants = []
    for g, frac in enumerate(grades):
        tok = tokens(F.col("text"))
        keep = F.greatest(
            (F.size(tok) - F.ceil(F.size(tok) * F.lit(frac))).cast("int"),
            F.lit(1),
        )
        variants.append(
            docs.select(
                (F.col("doc_id") + F.lit((g + 1) * OFF)).alias("doc_id"),
                F.array_join(F.slice(tok, 1, keep), " ").alias("text"),
            )
        )
    corpus = docs
    for v in variants:
        corpus = corpus.unionByName(v)
    shingled = doc_shingles(corpus, "doc_id", "text").persist()
    sets = shingled.select(
        "doc_id", F.array_distinct("shingles").alias("_ds")
    )
    base = sets.where(F.col("doc_id") < OFF).select(
        F.col("doc_id").alias("_b"), F.col("_ds").alias("_dsb")
    )
    pert = sets.where(F.col("doc_id") >= OFF).select(
        (F.col("doc_id") % OFF).alias("_b"),
        F.col("doc_id").alias("_pid"),
        "_ds",
    )
    inter = F.size(F.array_intersect("_ds", "_dsb"))
    union = F.size("_ds") + F.size("_dsb") - inter
    planted = (
        pert.join(base, "_b")
        .select(
            "_pid", (inter.cast("double") / union.cast("double")).alias("_j")
        )
        .persist()
    )
    n_planted = planted.count()

    out: dict = {"scale": scale, "n_planted": n_planted, "configs": {}}
    for n_bands, rows in configs:
        t0 = time.perf_counter()
        bands = minhash_bands(shingled, "doc_id", n_bands, rows)
        bb = bands.where(F.col("doc_id") < OFF).select(
            F.col("doc_id").alias("_b"), "band_idx", "band_key"
        )
        pb = bands.where(F.col("doc_id") >= OFF).select(
            (F.col("doc_id") % OFF).alias("_b"),
            F.col("doc_id").alias("_pid"),
            "band_idx",
            "band_key",
        )
        hits = (
            pb.join(bb, ["_b", "band_idx", "band_key"])
            .select("_pid")
            .distinct()
        )
        expected = F.lit(1.0) - F.pow(
            F.lit(1.0) - F.pow(F.col("_j"), F.lit(float(rows))),
            F.lit(float(n_bands)),
        )
        per_decile = (
            planted.join(hits.withColumn("_hit", F.lit(1)), "_pid", "left")
            .groupBy(F.floor(F.col("_j") * 10).cast("int").alias("_dec"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("hit"),
                F.avg(expected).alias("exp"),
            )
            .collect()
        )
        sec = round(time.perf_counter() - t0, 3)
        key = f"b{n_bands}r{rows}"
        tot_n = sum(r["n"] for r in per_decile)
        tot_hit = sum(r["hit"] for r in per_decile)
        out["configs"][key] = {
            "n_bands": n_bands,
            "rows_per_band": rows,
            "recall": round(tot_hit / tot_n, 4) if tot_n else -1.0,
            "sec": sec,
            "by_jaccard_decile": {
                f"{r['_dec'] / 10:.1f}": {
                    "n": int(r["n"]),
                    "recall": round(r["hit"] / r["n"], 4),
                    "expected": round(float(r["exp"]), 4),
                }
                for r in sorted(per_decile, key=lambda r: r["_dec"])
            },
        }
        print(
            f"minhash_recall m={scale} {key}: "
            + json.dumps(out["configs"][key]["by_jaccard_decile"]),
            flush=True,
        )
    planted.unpersist()
    shingled.unpersist()
    return out


def fuzzy_decon_recall(
    spark, mdir: str, scale: int, threshold: float = 0.8
) -> dict:
    """Recall axis for MinHash-LSH fuzzy decontamination at scale: the
    corpus is documents ∪ their perturbed copies (last token dropped,
    ids +1e6); the benchmark slice is the original %97 docs, so each
    benchmark doc PLANTS one known near-duplicate in the training side.
    Ground truth is each planted pair's EXACT shingle Jaccard (one
    cheap equi-join on the planted id offset — never all-pairs), and
    recall = planted-above-threshold docs the operator flags. Precision
    is 1.0 by construction (the operator's verify stage IS exact
    Jaccard); what LSH banding can lose is recall — 1-(1-j^2)^4 per
    pair in theory for 4 bands × 2 rows — and the driver-graded fixture
    equality cannot see that, because the oracle shares the banding.
    """
    from informixcdc_spark.operators.dedup import (
        decontaminate_fuzzy,
        doc_shingles,
        perturbed_copies,
    )

    docs = spark.read.parquet(os.path.join(mdir, "documents.parquet")).select(
        "doc_id", "text"
    )
    corpus = docs.unionByName(perturbed_copies(docs, "doc_id", "text"))
    bench_pred = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 1_000_000)

    # exact truth over the PLANTED pairs only: (bench doc b, copy b+1e6)
    sets = doc_shingles(corpus, "doc_id", "text").select(
        "doc_id", F.array_distinct("shingles").alias("ds")
    )
    b = sets.where(bench_pred).select(
        F.col("doc_id").alias("_b"), F.col("ds").alias("_dsb")
    )
    c = sets.select(
        (F.col("doc_id") - 1_000_000).alias("_b"),
        F.col("doc_id").alias("_cid"),
        F.col("ds").alias("_dsc"),
    ).where(F.col("_b") >= 0)
    inter = F.size(F.array_intersect("_dsb", "_dsc"))
    union = F.size("_dsb") + F.size("_dsc") - inter
    planted = (
        b.join(c, "_b")
        .withColumn("_j", inter.cast("double") / union.cast("double"))
        .where(F.col("_j") >= threshold)
        .select("_cid")
    )
    truth = {r["_cid"] for r in planted.collect()}

    t0 = time.perf_counter()
    flagged = {
        r["doc_id"]
        for r in decontaminate_fuzzy(
            corpus, "doc_id", "text", bench_pred, threshold=threshold
        ).collect()
    }
    sec = round(time.perf_counter() - t0, 3)
    hit = len(truth & flagged)
    return {
        "scale": scale,
        "threshold": threshold,
        "planted": len(truth),
        "planted_flagged": hit,
        "recall_planted": round(hit / len(truth), 4) if truth else -1.0,
        "n_flagged_total": len(flagged),
        "sec": sec,
    }


def semdedup_recall(
    spark,
    mdir: str,
    scale: int,
    threshold: float = 0.95,
    points_spec: tuple[tuple[int, int], ...] = (
        (8, 1),
        (32, 1),
        (32, 2),
        (128, 1),
        (128, 2),
    ),
) -> dict:
    """Planted-pair recall axis for SemDeDup (cluster-bounded semantic
    dedup, e12's 'semdedup' arm): the corpus is embeddings ∪ perturbed
    copies (ids +1e6, the last (vec_id % 4 + 1)·2 of the 64 dims
    zeroed — cosine to the original is exactly ||head||/||v||, a
    spectrum straddling the threshold). Ground truth is that closed
    form evaluated per planted pair (no join at all); recall =
    planted-above-threshold copies the operator flags as duplicates.
    What cluster bounding loses is exactly the pairs k-means splits
    across cell boundaries, and the loss can GROW with the cluster
    count — the recall-vs-K trade SemDeDup's own paper tunes (§4:
    cluster count trades compute against within-cluster coverage).
    Precision is 1.0 by construction: the in-cell cosine test is
    exact. The oracle-equality gate cannot see any of this because the
    graded fixture shares the clustering. ``points_spec`` rows are
    (n_centroids, n_assign): the n_assign=2 points measure how much of
    the boundary loss soft assignment buys back, and at what wall
    cost (pair volume ~n_assign² per cell)."""
    from informixcdc_spark.functions.vector import l2_norm
    from informixcdc_spark.operators.similarity import (
        kmeans_centroids,
        semantic_dedup,
    )

    emb = spark.read.parquet(os.path.join(mdir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    k = ((F.col("vec_id") % 4 + 1) * 2).cast("int")
    head = F.slice("embedding", F.lit(1), F.size("embedding") - k)
    copies = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.concat(
            head, F.array_repeat(F.lit(0.0).cast("float"), k)
        ).alias("embedding"),
    )
    corpus = emb.unionByName(copies)
    full_n = l2_norm(F.col("embedding"))
    truth = {
        r["cid"]
        for r in emb.where(full_n > 0)
        .select(
            (F.col("vec_id") + F.lit(1_000_000)).alias("cid"),
            (l2_norm(head) / full_n).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .collect()
    }
    points = {}
    cent_cache: dict[int, list] = {}
    for n_cent, n_assign in points_spec:
        if n_cent not in cent_cache:
            cent_cache[n_cent] = kmeans_centroids(
                corpus, "vec_id", "embedding", n_centroids=n_cent, n_iter=2
            )
        t0 = time.perf_counter()
        flagged = {
            r["vec_id"]
            for r in semantic_dedup(
                corpus,
                cent_cache[n_cent],
                "vec_id",
                "embedding",
                threshold=threshold,
                release_cache=True,
                n_assign=n_assign,
            )
            .where(~F.col("is_kept") & (F.col("vec_id") >= 1_000_000))
            .select("vec_id")
            .collect()
        }
        hit = len(truth & flagged)
        key = f"K{n_cent}" + (f"_n{n_assign}" if n_assign > 1 else "")
        points[key] = {
            "n_centroids": n_cent,
            "n_assign": n_assign,
            "planted": len(truth),
            "planted_flagged": hit,
            "recall_planted": round(hit / len(truth), 4) if truth else -1.0,
            "flagged_copies_total": len(flagged),
            "sec": round(time.perf_counter() - t0, 3),
        }
        print(
            f"semdedup_recall m={scale} {key}: " + json.dumps(points[key]),
            flush=True,
        )
    return {"scale": scale, "threshold": threshold, "points": points}


def rp_knn_recall(
    spark,
    mdir: str,
    scale: int,
    k: int = 5,
    n_queries: int = 64,
    d_in: int = 64,
    d_outs: tuple[int, ...] = (4, 8, 16, 32, 48),
) -> dict:
    """PLANTED-pair recall axis for JL reduce-then-search (e07's 'rp'
    arm — r9 verdict #5). The synthetic embeddings are near-uniform, so
    "recall@k vs exact" over the raw corpus only measures how noise
    ranks under distortion (neighbor margins ≈ 0 — recall ≈ 0 at every
    d_out, first measured exactly so); what JL actually promises is
    preserving HIGH-similarity neighbors. So the axis plants them: the
    corpus gains a perturbed copy of every vector (semdedup_recall's
    spectrum — the last (vec_id % 4 + 1)·2 dims zeroed, cosine to the
    original ||head||/||v|| ≈ 0.87–0.99), each query's ground truth is
    its own planted copy, and recall = planted copies found in
    rp_knn's top-k as d_out grows. The exact searcher's recall on the
    same corpus is the ceiling (the copy can lose to dense random
    neighbors even unprojected); the curve reads relative to it."""
    from informixcdc_spark.operators.similarity import brute_force_knn, rp_knn

    emb = spark.read.parquet(os.path.join(mdir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    kz = ((F.col("vec_id") % 4 + 1) * 2).cast("int")
    head = F.slice("embedding", F.lit(1), F.size("embedding") - kz)
    copies = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.concat(
            head, F.array_repeat(F.lit(0.0).cast("float"), kz)
        ).alias("embedding"),
    )
    corpus = emb.unionByName(copies)
    queries = emb.where(F.col("vec_id") < n_queries)

    def planted_recall(df: DataFrame) -> float:
        found = {
            r["query_id"]
            for r in df.where(
                F.col("neighbor_id") == F.col("query_id") + 1_000_000
            ).collect()
        }
        return round(len(found) / n_queries, 4)

    t0 = time.perf_counter()
    ceiling = planted_recall(brute_force_knn(corpus, queries, k=k))
    exact_sec = round(time.perf_counter() - t0, 3)
    points = {}
    for d_out in d_outs:
        t0 = time.perf_counter()
        rec = planted_recall(
            rp_knn(corpus, queries, d_in=d_in, d_out=d_out, k=k)
        )
        points[str(d_out)] = {
            "recall_planted": rec,
            "sec": round(time.perf_counter() - t0, 3),
        }
        print(
            f"rp_recall m={scale} d_out={d_out}: "
            + json.dumps(points[str(d_out)]),
            flush=True,
        )
    return {
        "scale": scale,
        "k": k,
        "n_queries": n_queries,
        "d_in": d_in,
        "exact_ceiling": ceiling,
        "exact_sec": exact_sec,
        "points": points,
    }


def simhash_dedup_recall(
    spark,
    mdir: str,
    scale: int,
    bits_points: tuple[int, ...] = (8, 16, 24, 32),
    drop_tokens: int = 3,
) -> dict:
    """Planted near-dup recall axis for SimHash (r9 verdict #5 —
    ``operators/dedup.py::simhash_expr``, e02's fingerprint family):
    every document gets a perturbed copy (last ``drop_tokens`` tokens
    dropped — a high-overlap near-dup by construction), and the axis
    measures, per sketch width, how often the pair lands within the
    proportional Hamming budget ``bits // 8`` (the banding rule a
    production SimHash dedup would use) plus the exact-collision rate
    (the Hamming-0 detector). More bits spread the same token edit
    over proportionally more sign sums, so recall at the proportional
    budget should hold roughly flat while the absolute collision rate
    falls — the width/selectivity trade the exactness tests cannot
    see. Deterministic end to end (md5 sketches, derived copies)."""
    from informixcdc_spark.functions.text import tokens
    from informixcdc_spark.operators.dedup import simhash_expr

    docs = spark.read.parquet(os.path.join(mdir, "documents.parquet")).select(
        "doc_id", "text"
    )
    tok = tokens(F.col("text"))
    kept = F.greatest(F.size(tok) - F.lit(drop_tokens), F.lit(1))
    pert = F.array_join(F.slice(tok, 1, kept), " ")
    points = {}
    for bits in bits_points:
        pairs = docs.where(F.size(tok) > drop_tokens).select(
            simhash_expr(tok, bits=bits).alias("_sa"),
            simhash_expr(tokens(pert), bits=bits).alias("_sb"),
        )
        budget = max(1, bits // 8)
        t0 = time.perf_counter()
        row = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.expr("bit_count(_sa ^ _sb)")).alias("mean_ham"),
            F.avg(
                (F.expr("bit_count(_sa ^ _sb)") <= budget).cast("double")
            ).alias("recall_budget"),
            F.avg((F.col("_sa") == F.col("_sb")).cast("double")).alias(
                "exact_rate"
            ),
        ).first()
        points[str(bits)] = {
            "bits": bits,
            "hamming_budget": budget,
            "planted": int(row["n"]),
            "mean_hamming": round(float(row["mean_ham"]), 3),
            "recall_at_budget": round(float(row["recall_budget"]), 4),
            "identical_sketch_rate": round(float(row["exact_rate"]), 4),
            "sec": round(time.perf_counter() - t0, 3),
        }
        print(
            f"simhash_recall m={scale} bits={bits}: "
            + json.dumps(points[str(bits)]),
            flush=True,
        )
    return {"scale": scale, "drop_tokens": drop_tokens, "points": points}


_OVERLAP_CHILD = r"""
import json, os, sys, time
# argv under `python -c`: [0]='-c', [1]=repo dir, [2]=cpus, [3]=reps,
# [4]=comma-joined query names
sys.path.insert(0, sys.argv[1])
from informixcdc_spark.hostmeter import steal_seconds
from informixcdc_spark.queries import all_queries
from informixcdc_spark.session import get_spark

cpus = int(sys.argv[2])
reps = int(sys.argv[3])
names = sys.argv[4].split(",")
spark = get_spark(app_name="informixcdc-overlap-axis", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
sfd = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs["q01_revenue_by_nation"](spark, sfd).write.format("noop").mode(
    "overwrite").save()
spark.range(32).repartition(32).mapInPandas(
    lambda it: it, schema="id long").write.format("noop").mode(
    "overwrite").save()
out = {}
for name in names:
    # one throwaway build per query first: index builds / cache
    # materializations land once, so both modes measure the same warm
    # steady state the bench records
    qs[name](spark, sfd).write.format("noop").mode("overwrite").save()
    rec = {}
    for mode in ("off", "on"):
        os.environ["SPARK_GRAFT_NO_OVERLAP"] = "1" if mode == "off" else "0"
        best, best_steal = float("inf"), -1.0
        for _ in range(reps):
            s0 = steal_seconds()
            t0 = time.perf_counter()
            qs[name](spark, sfd).write.format("noop").mode(
                "overwrite").save()
            t = time.perf_counter() - t0
            if t < best:
                best, best_steal = t, round(steal_seconds() - s0, 2)
        rec[mode] = {"sec": round(best, 3), "steal_sec": best_steal}
    rec["speedup"] = round(rec["off"]["sec"] / rec["on"]["sec"], 3)
    out[name] = rec
print("OVERLAP_AXIS " + json.dumps({"cpus": cpus, "queries": out}),
      flush=True)
"""


def overlap_axis(
    queries: tuple[str, ...] = (
        "e15_ann_ivf",
        "e10_quality_repetition",
        "e20_dedup_clusters",
    ),
    cpu_points: tuple[int, ...] = (8, 32),
    reps: int = 2,
) -> dict:
    """Overlap on/off × core count axis (r11 verdict item 5): prove
    `session.overlap_jobs` helps — or at least never hurts — at BOTH a
    saturated small host and the full local core count, not just on
    local[32]. Each core-count point runs in its OWN subprocess (a
    SparkSession's master is fixed at creation) and toggles the
    `SPARK_GRAFT_NO_OVERLAP` diagnostic switch between timed runs, so
    both modes share one JVM, one warmed cache state and one host
    regime; `speedup` = sequential/overlapped wall on the best rep,
    with per-point steal annotating confounded hosts. Runs before the
    main bench session exists so the two JVMs never co-resident."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    points: dict = {}
    for cpus in cpu_points:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        env.pop("SPARK_GRAFT_NO_OVERLAP", None)
        proc = subprocess.run(
            [sys.executable, "-c", _OVERLAP_CHILD, here,
             str(cpus), str(reps), ",".join(queries)],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        rec = None
        for line in proc.stdout.splitlines():
            if line.startswith("OVERLAP_AXIS "):
                rec = json.loads(line[len("OVERLAP_AXIS "):])
        if rec is None:
            rec = {"cpus": cpus, "error": (proc.stderr or "no output")[-400:]}
        points[str(cpus)] = rec
        print(f"overlap_axis cpus={cpus}: " + json.dumps(rec), flush=True)
    return points


def _tail_ratio(series: dict[str, float]) -> float:
    """Asymptotic shuffle slope over the query's two LARGEST measured
    scales: bytes(top)/bytes(prev) normalized by the data ratio — ~1 is
    linear growth in the shuffle regime, >>1 super-linear. The vs-1x
    ratio is deliberately NOT used here: sub-threshold sides broadcast
    at small scales (bytes ~0), and that regime change says nothing
    about asymptotic behavior."""
    pts = sorted((int(k), v) for k, v in series.items() if v > 0)
    if len(pts) < 2:
        return -1.0
    (m0, b0), (m1, b1) = pts[-2], pts[-1]
    return round(b1 / b0 / (m1 / m0), 3)


def codebook_axis(
    spark,
    mdir: str,
    ks: tuple[int, ...] = (8, 64, 512, 2048, 4096),
) -> dict:
    """Plan-size envelope axis for the literal-codebook assignment
    (r10 verdict item #2; crossover measurement in PERF.md §22): per
    codebook size K (synthetic d=64 centroids, deterministic seed),
    one top-1 cell assignment over the embeddings table — literal
    render vs the broadcast-codebook fold fallback, hash-equality
    checked per point. ``build`` is DataFrame construction (plan
    render + analysis), ``run`` one agg action (codegen + execute);
    the steal column flags host-confounded points. The default guard
    (functions/vector.py::MAX_LITERAL_MAT_ELEMS) keeps graded paths
    literal; this axis shows per-round where the envelope sits."""
    import random

    from informixcdc_spark.operators.similarity import assign_cells_topn

    emb = (
        spark.read.parquet(os.path.join(mdir, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .localCheckpoint()
    )
    points: dict = {}
    for k in ks:
        rng = random.Random(1311)
        cents = [(c, [rng.random() for _ in range(64)]) for c in range(k)]
        out: dict = {}
        for label, cap in (("literal", k * 64), ("broadcast", 0)):
            st0 = steal_seconds()
            t0 = time.perf_counter()
            df = assign_cells_topn(emb, cents, n=1, max_literal_elems=cap)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            row = df.agg(
                F.sum(F.col("cell").cast("long")), F.count(F.lit(1))
            ).first()
            out[label] = {
                "build_sec": round(t_build, 2),
                "run_sec": round(time.perf_counter() - t0, 2),
                "steal_sec": (
                    round(steal_seconds() - st0, 2) if st0 >= 0 else -1.0
                ),
                "checksum": int(row[0]),
            }
        out["hash_equal"] = (
            out["literal"]["checksum"] == out["broadcast"]["checksum"]
        )
        points[str(k)] = out
        print(f"codebook K={k}: " + json.dumps(out), flush=True)
    return points


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scales = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_SCALES", "1,4,8,16").split(",")
    ]
    # the CDC families (the only ones above 0.3 efficiency at 16x) get an
    # extra far point to confirm the curves keep flattening where the
    # data is genuinely change-log-shaped; orders is their only input
    cdc_scales = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_CDC_SCALES", "32").split(",")
        if s
    ]
    cdc_queries = [q for q in QUERIES if q.startswith("c")]
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    work = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/informixcdc_scale")

    # overlap on/off × core count axis FIRST: its subprocesses each
    # build their own fixed-master session, so they must not co-reside
    # with this process's JVM (two 32-thread local masters thrash)
    ov_axis = overlap_axis()

    spark = get_spark(
        app_name="informixcdc-spark-scale-bench",
        # UI on for the shuffle-bytes probe; retain enough stages that
        # the before/after deltas never lose history mid-measurement
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warmup (JVM, codegen, Arrow worker pool)
    queries["q01_revenue_by_nation"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    shuffle_mb: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    # /proc/stat steal (cpu-seconds) during each recorded best rep:
    # the wall columns were non-monotonic in r10 because points were
    # measured in different host regimes — this column makes a
    # confounded point self-identifying instead of cliff-shaped
    steal_sec: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    rows: dict[str, dict[str, int]] = {}

    def run_point(q: str, m: int, mdir: str) -> None:
        best = float("inf")
        best_mb = -1.0
        best_steal = -1.0
        for _ in range(reps):
            s0 = _shuffle_write_bytes(spark)
            st0 = steal_seconds()
            t0 = time.perf_counter()
            queries[q](spark, mdir).write.format("noop").mode(
                "overwrite"
            ).save()
            t = time.perf_counter() - t0
            s1 = _shuffle_write_bytes(spark)
            if t < best:
                best = t
                best_mb = (
                    round((s1 - s0) / 1e6, 2) if s0 >= 0 and s1 >= 0 else -1.0
                )
                best_steal = (
                    round(steal_seconds() - st0, 2) if st0 >= 0 else -1.0
                )
        results[q][str(m)] = round(best, 3)
        shuffle_mb[q][str(m)] = best_mb
        steal_sec[q][str(m)] = best_steal
        print(
            f"m={m} {q}: {results[q][str(m)]}s shuffle={best_mb}MB "
            f"steal={best_steal}s",
            flush=True,
        )

    for m in scales:
        mdir = sf_dir if m == 1 else os.path.join(work, f"m{m}")
        if m != 1:
            rows[str(m)] = materialize(spark, sf_dir, mdir, m)
        for q in QUERIES:
            run_point(q, m, mdir)
    for m in cdc_scales:
        mdir = os.path.join(work, f"m{m}_cdc")
        rows[f"{m}_cdc"] = materialize(
            spark, sf_dir, mdir, m, tables=("orders",)
        )
        for q in cdc_queries:
            run_point(q, m, mdir)
    # far point (32x) for the worst-scaling extension families: e01
    # post-skew-fix and e10 post-regime-flip (r8 verdict #7), plus the
    # two dedup/search families users lean on hardest at scale (r9):
    # e03 (MinHash near-dup, shuffle-regime bands) and e07 (broadcast
    # query probes — its shuffle bytes should stay FLAT)
    ext_far = [
        q
        for q in (
            "e01_dedup_exact",
            "e10_quality_repetition",
            "e03_minhash_lsh_jaccard",
            "e07_knn_exact_and_lsh",
        )
        if q in QUERIES
    ]
    for m in cdc_scales:
        mdir = os.path.join(work, f"m{m}_ext")
        rows[f"{m}_ext"] = materialize(
            spark, sf_dir, mdir, m, tables=("documents", "embeddings")
        )
        for q in ext_far:
            run_point(q, m, mdir)

    # recall-vs-nprobe curves for the multiprobe ANN operators at the
    # 8x/16x points (replica construction decorrelates the copies, so
    # bucket/cell load stays realistic at scale)
    recall_nprobe = {}
    for m in [s for s in scales if s in (8, 16)] or scales[-1:]:
        mdir = sf_dir if m == 1 else os.path.join(work, f"m{m}")
        recall_nprobe[str(m)] = recall_curves(spark, mdir, m)
        print(f"recall m={m}: " + json.dumps(recall_nprobe[str(m)]), flush=True)

    # planted-near-dup recall for fuzzy decontamination at the top scale
    top = scales[-1]
    fuzzy_recall = fuzzy_decon_recall(
        spark, sf_dir if top == 1 else os.path.join(work, f"m{top}"), top
    )
    print("fuzzy_recall: " + json.dumps(fuzzy_recall), flush=True)

    # planted-paraphrase recall for MinHash-LSH text dedup vs
    # (n_bands, rows_per_band) at the 8x/16x points (r8 verdict #3)
    minhash_recall = {}
    for m in [s for s in scales if s in (8, 16)] or scales[-1:]:
        mdir = sf_dir if m == 1 else os.path.join(work, f"m{m}")
        minhash_recall[str(m)] = minhash_dedup_recall(spark, mdir, m)

    # planted-pair recall for SemDeDup's cluster bounding vs the
    # cluster count and n_assign (r9) — at 8x with the base spec, and
    # at 16x with K doubled (SemDeDup's own deployment rule: the
    # cluster count scales with the corpus, keeping in-cell pair
    # volume constant — the 16x points check recall holds under that
    # rule rather than under a fixed K)
    semdedup_rec = {}
    for sd_m, spec in (
        (8, ((8, 1), (32, 1), (32, 2), (128, 1), (128, 2))),
        (16, ((64, 1), (64, 2), (256, 1), (256, 2))),
    ):
        if sd_m not in scales:
            continue
        sd_dir = sf_dir if sd_m == 1 else os.path.join(work, f"m{sd_m}")
        semdedup_rec[str(sd_m)] = semdedup_recall(
            spark, sd_dir, sd_m, points_spec=spec
        )

    # recall-vs-d_out for JL reduce-then-search and planted near-dup
    # recall for SimHash, both at the top scale (r9 verdict #5 — the
    # last two approximate operators without a measured recall curve)
    top_dir = sf_dir if top == 1 else os.path.join(work, f"m{top}")
    rp_rec = rp_knn_recall(spark, top_dir, top)
    print("rp_recall: " + json.dumps(rp_rec), flush=True)
    simhash_rec = simhash_dedup_recall(spark, top_dir, top)
    print("simhash_recall: " + json.dumps(simhash_rec), flush=True)
    cb_axis = codebook_axis(spark, sf_dir)

    base = str(scales[0])

    def eff(q: str, series: dict[str, float], top_m: int) -> float:
        top_v, base_v = series[str(top_m)], series[base]
        if base_v <= 0 or top_v < 0:
            return -1.0
        return round(top_v / ((top_m / scales[0]) * base_v), 3)

    art = {
        "sf_base": sf_dir,
        "scales": scales,
        "cdc_scales": cdc_scales,
        "reps": reps,
        "rows": rows,
        # recall@k vs nprobe per multiprobe family (see recall_curves)
        "recall_nprobe": recall_nprobe,
        # planted-near-dup recall for fuzzy decontamination (see
        # fuzzy_decon_recall) — what LSH banding loses, which the
        # oracle-equality gate cannot measure
        "fuzzy_decon_recall": fuzzy_recall,
        # planted-paraphrase recall for MinHash text dedup per banding
        # config and Jaccard decile, with the 1-(1-j^r)^b expectation
        "minhash_dedup_recall": minhash_recall,
        # planted-pair recall for SemDeDup vs the cluster count — what
        # cluster bounding loses at cell boundaries (see semdedup_recall)
        "semdedup_recall": semdedup_rec,
        # recall@k vs projected dimension for JL reduce-then-search
        # (see rp_knn_recall) — what the reduction costs in neighbor
        # fidelity, which the projection's exactness tests cannot see
        "rp_knn_recall": rp_rec,
        # planted near-dup recall per sketch width for SimHash (see
        # simhash_dedup_recall) — Hamming-budget recall + exact-collision
        # rate vs bits
        "simhash_dedup_recall": simhash_rec,
        # literal-vs-broadcast assignment walls per codebook size K
        # (plan-size envelope, PERF.md §22) with per-point steal
        "codebook_axis": cb_axis,
        # overlap_jobs on/off at 8 and 32 cores (see overlap_axis):
        # speedup ≥ ~1.0 at BOTH points means the §2.6 construction
        # overlap is not a local[32]-regime trick
        "overlap_axis": ov_axis,
        "queries": {
            q: {
                **results[q],
                # sec(top) / (ratio * sec(base)): ~1 = linear, <1 = fixed
                # overhead amortizing out, >>1 = super-linear plan
                "efficiency": eff(q, results[q], scales[-1]),
                # same ratio on shuffle WRITE bytes — super-linear bytes
                # are a cluster bottleneck even when local wall time
                # hides them behind free cores. The vs-1x ratio can be
                # dominated by a broadcast→shuffle-join REGIME change
                # (sub-threshold sides broadcast at 1x, bytes ~0), so
                # the TAIL slope — bytes(top)/bytes(prev) normalized by
                # the data ratio, both points in the shuffle regime —
                # is the asymptotic signal: ~1 linear, >>1 super-linear.
                "shuffle_mb": shuffle_mb[q],
                # steal cpu-seconds during each recorded rep: reads
                # as the wall column's confounding annotation
                "steal_sec": steal_sec[q],
                "shuffle_efficiency": eff(q, shuffle_mb[q], scales[-1]),
                "shuffle_tail_ratio": _tail_ratio(shuffle_mb[q]),
                **(
                    {
                        f"efficiency_{m}x": eff(q, results[q], m)
                        for m in cdc_scales
                    }
                    if q in (*cdc_queries, *ext_far) and cdc_scales
                    else {}
                ),
            }
            for q in QUERIES
        },
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "SCALEBENCH.json"), "w"
    ) as f:
        json.dump(art, f, indent=1)
    print(json.dumps({q: art["queries"][q]["efficiency"] for q in QUERIES}))
    os._exit(0)


if __name__ == "__main__":
    main()
