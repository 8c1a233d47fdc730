"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the point of each algorithm at 100 TB):

- exact: one hash-aggregate on the content key — a single shuffle whose
  map-side partials collapse duplicates early.
- MinHash+LSH: signatures are per-row narrow work; candidate generation
  is an equi-join on (band_idx, band_key) — duplicates land in the same
  bucket and everything else never pairs up. All-pairs comparison is
  O(n²) and does not exist on this path.
- SimHash: per-row 16-bit sketch from token hashes — explode + two
  aggregations, linear.
- n-gram Jaccard: exact verification, run ONLY on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from informixcdc_spark.catalog import rebalance
from informixcdc_spark.functions.text import (
    MINHASH_PRIME,
    hash16,
    minhash_coeffs,
    shingle_hash_ints,
    tokens,
    word_shingles,
)

#: LSH layout: 4 bands × 2 rows = 8 minhash functions. With 2-row bands,
#: a pair with Jaccard s collides with prob 1-(1-s²)⁴ — steep around 0.5.
N_BANDS = 4
ROWS_PER_BAND = 2


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Group identical content, keep the minimum id as representative."""
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies")
    )


def banding_recall(jaccard: float, n_bands: int, rows: int) -> float:
    """Probability that a pair with the given Jaccard shares >= 1 LSH
    band bucket: ``1 - (1 - j^rows)^n_bands`` (MMDS ch.3 S-curve) —
    the expectation SCALEBENCH's ``minhash_dedup_recall`` axis measures
    the operator against."""
    return 1.0 - (1.0 - jaccard**rows) ** n_bands


def plan_banding(
    threshold: float,
    target_recall: float = 0.95,
    max_reject: float = 0.5,
    max_hashes: int = 256,
) -> tuple[int, int]:
    """Pick ``(n_bands, rows_per_band)`` for :func:`minhash_bands` from
    the dedup contract instead of folklore defaults: the cheapest
    (fewest total hashes = fewest signature columns AND fewest band
    rows shuffled per doc) configuration whose S-curve keeps recall at
    the destructive threshold while bounding the candidate flood below
    it —

    - recall at ``j = threshold`` is at least ``target_recall``
      (pairs ABOVE the threshold are what the operator deletes on:
      SCALEBENCH's axis showed b2r4 loses a third of them at j=0.8);
    - the candidate probability at ``j = threshold/2`` is at most
      ``max_reject`` (each sub-threshold candidate costs an exact
      verify; this caps the flood an over-flat curve lets through —
      at 100 TB the verify join, not the banding, is the bill).

    Search order: more rows per band first (steeper curve — better
    rejection) within each total-hash budget, so ties resolve to the
    configuration that shuffles the fewest band rows per document.
    Raises when no configuration within ``max_hashes`` satisfies both
    bounds (loosen one explicitly rather than silently under-recalling
    — same fail-loud contract as ``weighted_keep``'s rate guard).
    """
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    best = None
    for total in range(2, max_hashes + 1):
        for rows in range(min(total, 32), 0, -1):
            n_bands = total // rows
            if n_bands * rows != total:
                continue
            if banding_recall(threshold, n_bands, rows) < target_recall:
                continue
            if banding_recall(threshold / 2, n_bands, rows) > max_reject:
                continue
            best = (n_bands, rows)
            break
        if best:
            return best
    raise ValueError(
        f"no (bands, rows) within {max_hashes} hashes reaches recall "
        f">= {target_recall} at j={threshold} while rejecting "
        f"j={threshold / 2} pairs at <= {max_reject}; raise max_hashes "
        "or loosen a bound"
    )


def doc_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep, shingles array) for docs with at least k tokens.
    ``keep`` names extra columns to carry through unchanged (e.g. a
    precomputed benchmark flag), so callers never have to re-evaluate
    document-level predicates on the shingle table.

    Tokenization is materialized in its own projection before shingling —
    see word_shingles' contract: an inline tokenizer would be re-run per
    shingle position by the interpreted HOF.

    The non-empty guard filters on TOKEN COUNT, not on the shingle array:
    Catalyst pushes filters through Exchange by expression substitution,
    so a `size(shingles) > 0` predicate would drag the whole interpreted
    shingle computation below the rebalance shuffle — serializing it onto
    the input's (single) parquet split and then recomputing it post-
    shuffle. `size(tokens) >= k` is equivalent (word_shingles emits empty
    iff fewer than k tokens) and cheap enough to evaluate at the scan."""
    extras = [F.col(c) for c in keep]
    # no rebalance of the input: the r12 on/off A/B measured the
    # round-robin exchange of the text payload as a net loss for every
    # benched shingle consumer (e27 x0.66, e03 x0.91, e20 x0.89 with it
    # on) — the shingle explode's own downstream shuffle spreads the
    # work anyway, and at production scale the scan is already split
    toked = (
        df
        .select(F.col(id_col), *extras, tokens(F.col(text_col)).alias("_tok"))
        .where(F.size("_tok") >= k)
    )
    return toked.select(
        F.col(id_col), *extras, word_shingles(F.col("_tok"), k).alias("shingles")
    )


def minhash_bands(
    shingled: DataFrame,
    id_col: str,
    n_bands: int = N_BANDS,
    rows: int = ROWS_PER_BAND,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep, band_idx, band_key): each row is one LSH bucket
    membership; ``keep`` columns pass through unchanged.

    Signature scheme: ONE md5 per shingle → 32-bit base hash, then each
    of the n_bands·rows signatures is a cheap universal hash
    ``(a_j·x + b_j) mod P`` minimized over the shingle set. band_key =
    md5 of the band's '|'-joined signature values; two docs share a
    bucket iff a whole band of signatures matches.
    """
    coeffs = minhash_coeffs(n_bands * rows)
    extras = [F.col(c) for c in keep]
    # Higher-order functions are interpreted per element, so the number
    # of array PASSES dominates, not the arithmetic: materialize base
    # hashes once (1 md5 pass), then compute ALL signature minima in a
    # single aggregate pass with a struct accumulator — 2 passes total
    # instead of one transform + one array_min per signature.
    hashed = shingled.select(
        F.col(id_col), *extras, shingle_hash_ints(F.col("shingles")).alias("xs")
    )
    n = n_bands * rows
    zero = F.struct(
        *[F.lit((1 << 62)).cast("long").alias(f"m{j}") for j in range(n)]
    )
    merge = lambda acc, x: F.struct(  # noqa: E731
        *[
            F.least(
                acc[f"m{j}"],
                (x * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME),
            ).alias(f"m{j}")
            for j, (a, b) in enumerate(coeffs)
        ]
    )
    sigged = hashed.select(
        F.col(id_col), *extras, F.aggregate(F.col("xs"), zero, merge).alias("sig")
    )
    bands = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col("sig")[f"m{i * rows + r}"].cast("string")
                    for r in range(rows)
                ],
            )
        )
        for i in range(n_bands)
    ]
    exploded = sigged.select(
        F.col(id_col),
        *extras,
        F.posexplode(F.array(*bands)).alias("band_idx", "band_key"),
    )
    return exploded.withColumn("band_idx", F.col("band_idx").cast("int"))


def lsh_candidate_pairs(
    bands: DataFrame, id_col: str, star_cap: int | None = None,
    cache: bool = True,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band bucket —
    the only join in the near-dup path, an equi-join on the bucket key.

    With ``cache=True`` (default) the bands input and the star-cap
    census are persisted: a self-join otherwise recomputes the whole
    shingle→minhash pipeline for BOTH sides (2× the hashing; at cluster
    scale you'd materialize the signature table for the same reason).
    A caller that already persists ``bands`` and consumes the pairs
    exactly once (the streaming index's per-batch admission) passes
    ``cache=False`` so repeated micro-batches don't accumulate
    never-unpersisted cache entries.

    ``star_cap`` is the 100 TB degenerate-bucket guard: an m-member
    bucket otherwise emits m²/2 pairs, and boilerplate-heavy corpora
    (template pages, empty docs) produce buckets with 10⁵+ members —
    a multi-billion-row pair explosion from ONE bucket. With a cap,
    buckets larger than it are STAR-LINKED instead: every member pairs
    with the bucket's minimum id only (m−1 pairs). For any consumer
    that feeds pairs into connected components (e20), the components —
    and therefore the cluster labels — are IDENTICAL, because the star
    connects the bucket transitively; only pairwise-verification
    consumers (e03's Jaccard) need the exact all-pairs default."""
    if cache:
        bands = bands.persist()
    if star_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_key")
        marked = bands.withColumn("_n", F.count(F.lit(1)).over(w)).withColumn(
            "_rep", F.min(id_col).over(w)
        )
        if cache:
            marked = marked.persist()
        small = marked.where(F.col("_n") <= star_cap)
        a = small.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
        b = small.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
        pairs_small = (
            a.join(b, ["band_idx", "band_key"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        pairs_big = marked.where(
            (F.col("_n") > star_cap) & (F.col(id_col) != F.col("_rep"))
        ).select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
        return pairs_small.unionByName(pairs_big).distinct()
    a = bands.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_key"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_key"
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def bound_pairs_per_doc(pairs: DataFrame, cap: int) -> DataFrame:
    """Per-doc candidate budget for the verify stage: keep each doc's
    ``cap`` smallest-id partners; a pair survives iff it fits BOTH
    endpoints' budgets. Deterministic (id-ordered), and the surviving
    pair count is ≤ cap × n_docs — linear in corpus size no matter how
    pathological the candidate graph. Two bounded window shuffles over
    the (already star-capped) pair stream, never over the corpus.

    The cost of the bound: a true near-dup pair can be evicted when one
    endpoint has more than ``cap`` candidates — acceptable for dedup
    (such hub docs are boilerplate, and the star link already keeps
    their cluster connected), which is why the cap is opt-in where
    exact pairwise verification is the product (e03)."""
    from pyspark.sql import Window

    w_a = Window.partitionBy("id_a").orderBy("id_b")
    w_b = Window.partitionBy("id_b").orderBy("id_a")
    return (
        pairs.withColumn("_ra", F.row_number().over(w_a))
        .withColumn("_rb", F.row_number().over(w_b))
        .where((F.col("_ra") <= cap) & (F.col("_rb") <= cap))
        .drop("_ra", "_rb")
    )


def ngram_jaccard_pairs(
    pairs: DataFrame,
    shingled: DataFrame,
    id_col: str,
    threshold: float = 0.8,
    candidate_cap: int | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct shingle sets for candidate pairs;
    keeps pairs at/above threshold. |A∩B| and |A∪B| are integer set
    sizes, so the similarity value is engine-exact. The distinct-set
    projection is persisted — it feeds both sides of the pair join.
    ``candidate_cap`` applies :func:`bound_pairs_per_doc` before the
    set join — the guard that keeps a degenerate candidate graph from
    going quadratic in the verify stage (see
    :func:`near_dup_verified_pairs` for the composed bounded path)."""
    if candidate_cap is not None:
        pairs = bound_pairs_per_doc(pairs, candidate_cap)
    sets = shingled.select(
        F.col(id_col), F.array_distinct("shingles").alias("ds")
    ).persist()
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("ds").alias("sh_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("ds").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def near_dup_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    star_cap: int = 64,
    candidate_cap: int = 16,
) -> DataFrame:
    """The composed BOUNDED near-dup pipeline: shingle → minhash → band
    → candidate pairs → exact-Jaccard verify, with both 100 TB guards
    wired in — ``star_cap`` linearizes degenerate band buckets at the
    candidate stage (m−1 star pairs instead of m²/2) and
    ``candidate_cap`` budgets the verify stage per doc
    (:func:`bound_pairs_per_doc`), so total verify pairs are
    ≤ candidate_cap × n_docs even when the corpus is one giant
    boilerplate bucket. e03 keeps the uncapped exact-verification
    variant (its product IS every pair's Jaccard); this is the shape a
    production dedup run uses."""
    shingled = doc_shingles(df, id_col, text_col, k=k)
    pairs = lsh_candidate_pairs(
        minhash_bands(shingled, id_col), id_col, star_cap=star_cap
    )
    return ngram_jaccard_pairs(
        pairs, shingled, id_col, threshold=threshold, candidate_cap=candidate_cap
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """(id, simhash): sign-aggregated token-hash bits.

    Bit j of each token's 64-bit hex hash contributes +1/-1; the sketch
    sets bit j where the sum is positive. Hex digit h's high bit is 1
    iff h ∈ [8,f] — which keeps the per-bit test a plain string lookup
    that any SQL engine reproduces.

    Zero-token documents would vanish in the explode→groupBy; they are
    restored with the empty sketch 0 (exactly what :func:`simhash_expr`
    folds over an empty token array), so the two implementations stay
    row-for-row equivalent on any corpus. The restore is an anti-join
    on the (tiny) id set — acceptable for this twin; the scan-fused
    ``simhash_expr`` is the graded/production path.
    """
    tok = rebalance(df).select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
    h = hash16(F.col("t"))
    contribs = [
        F.when(
            F.substring(h, j + 1, 1).isin(*"89abcdef"), F.lit(1)
        ).otherwise(F.lit(-1)).alias(f"b{j}")
        for j in range(bits)
    ]
    per_tok = tok.select(id_col, *contribs)
    sums = per_tok.groupBy(id_col).agg(
        *[F.sum(f"b{j}").alias(f"s{j}") for j in range(bits)]
    )
    value = None
    for j in range(bits):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(
            2**j
        )
        value = bit if value is None else value + bit
    sketches = sums.select(F.col(id_col), value.cast("long").alias("simhash"))
    empty = (
        df.select(F.col(id_col))
        .join(sketches.select(id_col), [id_col], "left_anti")
        .withColumn("simhash", F.lit(0).cast("long"))
    )
    return sketches.unionByName(empty)


def simhash_expr(tok: Column, bits: int = 16) -> Column:
    """SimHash as ONE column expression over a tokens array — same value
    as :func:`simhash`, zero shuffles: per-token hex hashes fold into a
    ``bits``-element sign-sum array (`aggregate` + `zip_with`), then the
    sketch bits assemble arithmetically. Each token is md5-hashed exactly
    once (hex array materialized before the fold — higher-order
    functions get no common-subexpression elimination, so hashing inside
    the fold lambda would recompute per bit). The 100 TB shape: the whole
    fingerprint family becomes a narrow map pass fused into the scan,
    where the explode+agg formulation pays a per-doc hash-agg shuffle."""
    hexes = F.transform(tok, lambda t: F.substring(F.md5(t), 1, bits))
    contrib = lambda h: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.lit(bits)),
        lambda j: F.when(F.substring(h, j, 1).isin(*"89abcdef"), 1).otherwise(-1),
    )
    sums = F.aggregate(
        hexes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, contrib(h), lambda a, c: a + c),
    )
    weights = F.array(*[F.lit(2**j) for j in range(bits)])
    return F.aggregate(
        F.zip_with(
            sums,
            weights,
            lambda s, w: F.when(s > 0, w).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def perturbed_copies(
    df: DataFrame, id_col: str, text_col: str, id_offset: int = 1_000_000
) -> DataFrame:
    """Near-duplicate copies for self-test corpora: same text minus its
    last token, shifted ids. Used by the oracle-checked dedup queries so
    the LSH path has true positives to find."""
    tok = tokens(F.col(text_col))
    clipped = F.array_join(F.slice(tok, 1, F.size(tok) - 1), " ")
    return df.select(
        (F.col(id_col) + id_offset).alias(id_col), clipped.alias(text_col)
    )


def dedup_clusters(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components of the near-duplicate graph → cluster ids.

    Groups ALL transitively-linked near-dups (a~b, b~c ⇒ {a,b,c} share
    one cluster — pairwise output alone can't pick one representative per
    group). Iterative min-label propagation, the standard distributed CC
    algorithm: every node starts labeled with its own id; each round
    every node takes the min of its own and its neighbors' labels;
    fixpoint in O(component diameter) rounds.

    Scale notes: each round is one equi-join (labels ⋈ edges) + one
    hash-aggregate — all shuffles on the node id, no driver-side data.
    ``localCheckpoint`` truncates the plan each round (iterative lineage
    otherwise grows unboundedly and re-executes from round 0); the
    convergence probe reads a single count per round.
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    # convergence probe: labels only ever decrease, so the label SUM is
    # strictly monotone until fixpoint — an unchanged sum means converged.
    # One scalar aggregate per round instead of a labels⋈labels join.
    prev_sum = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        prop = labels.join(edges, labels["id"] == edges["src"]).select(
            F.col("dst").alias("id"), "label"
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star(u): connect every neighbor v > u to m(u) = min(Γ(u)∪{u}).

    One groupBy + one equi-join, both keyed on the node id — and both
    riding ONE exchange (guide §2.4 "two operations keyed the same way
    can share one exchange"): the symmetric neighbor list is hash-
    partitioned by ``src`` once, the min-aggregate runs in place on it,
    and the SHUFFLE_HASH hint keeps the join co-partitioned instead of
    letting the planner broadcast ``m`` — per-node minima are a
    node-count-sized table, which at 100 TB must never be collected to
    the driver and shipped to every executor (the pre-r12 shape did
    exactly that under the local threshold, and would have fallen back
    to a sort-merge join with TWO more exchanges at scale). Output may
    carry duplicate pairs — deliberately NOT distinct'd here: volume is
    bounded by the edge count either way, and the following small-star
    absorbs duplicates in its min-aggregate and final distinct, saving
    one full shuffle per round."""
    nb = _symmetric(edges).repartition("src")
    m = nb.groupBy("src").agg(F.min("dst").alias("_mn")).select(
        "src", F.least(F.col("_mn"), F.col("src")).alias("_m")
    )
    return (
        nb.where(F.col("dst") > F.col("src"))
        .join(m.hint("shuffle_hash"), "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star(u): over the larger→smaller orientation, connect every
    smaller neighbor (and u itself) to m(u) = min(Γ≤(u)∪{u}).

    Same one-exchange shape as :func:`_large_star`: partition the
    oriented edge list by ``src`` once; the min-aggregate and the
    (shuffle-hash) join both reuse it."""
    oriented = _symmetric(edges).where(F.col("dst") < F.col("src")).repartition("src")
    m = oriented.groupBy("src").agg(F.min("dst").alias("_m"))
    j = oriented.join(m.hint("shuffle_hash"), "src")
    re_pointed = j.select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    own = m.select("src", F.col("_m").alias("dst"))
    return (
        re_pointed.unionByName(own)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def dedup_clusters_star(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — same output contract as :func:`dedup_clusters`
    (every node labeled with its component's minimum id) but O(log² n)
    rounds instead of O(component diameter): on the chain-shaped near-dup
    graphs a crawl corpus actually produces (doc A ~ B ~ C ~ ...), label
    propagation needs one round per hop while star contraction halves
    path lengths every alternation. Each half-round is one hash-aggregate
    plus one equi-join on the node id — the same per-round shuffle shape
    as label propagation, just far fewer rounds at scale. The giant-
    component skew of min-label propagation (every node of the big
    component re-sends the same label each round) also shrinks: stars
    contract onto their centers instead of re-broadcasting.

    Convergence = the edge set reaches a fixpoint (a canonical star per
    component, every child pointing at the component min). The per-round
    probe is ONE scalar aggregate (count + decimal sums of src/dst/a
    64-bit edge hash — PERF.md §5's cheap-probe rule); only when the
    signature matches does a single exact ``exceptAll`` confirm run, so
    the expensive set-difference join executes once per call, not once
    per round, and a hash collision merely costs one extra round.
    ``stats['rounds']`` reports the rounds used when a dict is passed.
    """
    def _signature(e: DataFrame):
        dec = "decimal(38,0)"
        return tuple(
            e.agg(
                F.count(F.lit(1)),
                F.sum(F.col("src").cast(dec)),
                F.sum(F.col("dst").cast(dec)),
                F.sum(F.xxhash64("src", "dst").cast(dec)),
            ).collect()[0]
        )

    # lazy checkpoints: the signature collect right after is the ONE
    # action that computes the round, materializes the checkpoint and
    # signs it — an eager checkpoint would pay a second job per round
    # just to re-read what the signature scan is about to read anyway
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sig = _signature(edges)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        new = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        new_sig = _signature(new)
        same = (
            new_sig == sig
            and new.exceptAll(edges).limit(1).count() == 0
        )
        edges, sig = new, new_sig
        if same:
            break
    if stats is not None:
        stats["rounds"] = rounds
    roots = edges.groupBy("src").agg(F.min("dst").alias("_root"))
    labels = nodes.select(F.col(id_col).alias("id")).join(
        roots, F.col("id") == F.col("src"), "left"
    )
    return labels.select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("_root"), F.col("id")).alias("cluster_id"),
    )


def decontamination_hashes(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bench_pred: Column,
    k: int = 3,
) -> DataFrame:
    """``(id, _is_bench, _h)``: every document's DISTINCT k-shingle
    64-bit hashes, one row per (doc, hash) — the shared input stream of
    the decontamination variants.

    Split out (guide §2.4 "don't compute things you throw away") so a
    caller running several variants over the SAME corpus — e27 grades
    the exact and bounded-broadcast operators side by side — can build
    this stream once, ``persist()`` it, and pass it to each variant via
    their ``hashed=`` parameter: the tokenize+shingle+hash corpus pass
    (by far the dominant per-pass cost) then executes once instead of
    once per downstream consumer, and the hash stream it materializes
    is the narrow proxy (id, bool, 16-char hash) of guide §8, orders of
    magnitude lighter than the text it replaces.
    """
    from informixcdc_spark.functions.text import hash16

    flagged_docs = docs.select(
        F.col(id_col), F.col(text_col), bench_pred.alias("_is_bench")
    )
    sh = doc_shingles(
        flagged_docs, id_col, text_col, k=k, keep=("_is_bench",)
    ).select(
        F.col(id_col),
        "_is_bench",
        F.explode(F.array_distinct("shingles")).alias("_s"),
    )
    return sh.select(F.col(id_col), "_is_bench", hash16(F.col("_s")).alias("_h"))


def decontaminate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bench_pred: Column,
    k: int = 3,
    hashed: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    k-word shingle with a held-out benchmark set (``bench_pred`` selects
    the benchmark rows inside ``docs``).

    Standard LLM-corpus step (GPT-3 appendix C / PaLM-style n-gram
    overlap). Shape at 100 TB: both sides reduce to DISTINCT 64-bit
    shingle hashes; the benchmark side (thousands of docs) collapses to a
    small hash set that BROADCASTS, so the train side never shuffles —
    the contamination join and the per-doc aggregate both partial-combine
    map-side. Returns contaminated docs only:
    (id, n_shingles, n_hits, contamination fraction).

    ``bench_pred`` is evaluated ONCE on ``docs`` (any column of the
    input is fair game — a source/split flag, a regex on the text) and
    carried through the shingle pass as a boolean, so it never has to
    be re-expressible over the derived tables.

    ``hashed`` optionally supplies a precomputed (and typically
    persisted) :func:`decontamination_hashes` stream so several
    variants over one corpus share a single shingle pass; when given,
    ``docs``/``text_col``/``bench_pred``/``k`` are ignored for the
    stream and the results are bit-identical by construction (the
    stream is the same expression tree evaluated once).
    """
    if hashed is None:
        hashed = decontamination_hashes(docs, id_col, text_col, bench_pred, k)
    bench = (
        hashed.where(F.col("_is_bench")).select("_h").distinct()
    )
    train = hashed.where(~F.col("_is_bench"))
    per_doc = train.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train.join(F.broadcast(bench), "_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return per_doc.join(hits, id_col).select(
        F.col(id_col),
        "n_shingles",
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_shingles")).alias("contamination"),
    )


def decontaminate_prefiltered(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bench_pred: Column,
    k: int = 3,
    bucket_bits: int = 20,
    hashed: DataFrame | None = None,
) -> DataFrame:
    """:func:`decontaminate` with a BOUNDED-broadcast prefilter — for
    benchmark suites whose full shingle-hash set is too large to
    broadcast comfortably.

    Stage 1 semi-joins train shingles against the benchmark's coarse
    buckets (``xxhash64(shingle_hash) mod 2^bucket_bits``): at most
    2^bucket_bits distinct longs broadcast no matter how big the
    benchmark grows — a one-hash Bloom filter realized as a broadcast
    semi-join, so membership stays a JVM hash probe instead of a UDF
    over a bit array. Stage 2 exactly joins the (now small) survivors
    against the full benchmark hash set, so collision false positives
    die and the output EQUALS :func:`decontaminate` row for row (false
    negatives are impossible: identical hashes bucket identically).
    Driver-graded as e27's 'coarse' arm against the exact arm's oracle.

    As in :func:`decontaminate`, ``bench_pred`` is evaluated once on
    ``docs`` and propagated, so it may reference any input column; a
    precomputed ``hashed`` stream shares one shingle pass across
    variants (see :func:`decontamination_hashes`).
    """
    if hashed is None:
        hashed = decontamination_hashes(docs, id_col, text_col, bench_pred, k)
    bench = hashed.where(F.col("_is_bench")).select("_h").distinct()
    train = hashed.where(~F.col("_is_bench"))
    per_doc = train.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    bkt = F.pmod(F.xxhash64("_h"), F.lit(2**bucket_bits)).alias("_bkt")
    buckets = bench.select(bkt).distinct()
    survivors = train.withColumn("_bkt", bkt).join(
        F.broadcast(buckets), "_bkt", "left_semi"
    )
    hits = (
        survivors.join(bench, "_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return per_doc.join(hits, id_col).select(
        F.col(id_col),
        "n_shingles",
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_shingles")).alias("contamination"),
    )


def decontaminate_fuzzy(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bench_pred: Column,
    k: int = 3,
    threshold: float = 0.8,
    n_bands: int = N_BANDS,
    rows: int = ROWS_PER_BAND,
    candidate_cap: int | None = None,
) -> DataFrame:
    """FUZZY benchmark decontamination: flag training documents whose
    k-shingle Jaccard similarity to ANY benchmark document reaches
    ``threshold`` — the near-duplicate leakage (light paraphrase,
    truncation, whitespace drift) that exact n-gram overlap
    (:func:`decontaminate`) under-reports and the Llama/GPT-4 era
    contamination analyses check for.

    Shape at 100 TB: both sides shingle+minhash once (shared persisted
    pass); the BENCHMARK side's band table and distinct-shingle sets are
    suite-sized, so both BROADCAST — the corpus-sized training side
    never shuffles for the probe, candidate generation is a map-side
    band equi-join, and verification touches only candidates (never
    all-pairs). ``candidate_cap`` optionally budgets verification per
    training doc (:func:`bound_pairs_per_doc` semantics, smallest bench
    ids kept) when a boilerplate-heavy corpus makes candidate fan-out
    degenerate; leave ``None`` for exact flag semantics.

    Returns contaminated training docs only:
    ``(id, n_shingles, n_hits, contamination)`` — ``n_shingles`` the
    doc's DISTINCT shingle count, ``n_hits`` how many benchmark docs it
    matches at/above threshold, ``contamination`` the maximum Jaccard.

    Cache lifetime: the shingled corpus is persisted (bands and verify
    sets both derive from it — without the cache the corpus shingles
    twice) and lives as long as the returned plan; repeated calls on
    the same input reuse one plan-keyed entry (Spark's CacheManager
    dedups identical plans). Same contract as
    :func:`lsh_candidate_pairs(cache=True)`.

    ``bench_pred`` is evaluated ONCE on ``docs`` and carried through
    the shingle cache as a boolean, so it may reference any column of
    the input (a source/split flag, a regex on the text), not just
    ``id_col``.
    """
    flagged_docs = docs.select(
        F.col(id_col), F.col(text_col), bench_pred.alias("_is_bench")
    )
    shingled = doc_shingles(
        flagged_docs, id_col, text_col, k=k, keep=("_is_bench",)
    ).persist()
    bands = minhash_bands(
        shingled.select(F.col(id_col), "_is_bench", "shingles"),
        id_col,
        n_bands,
        rows,
        keep=("_is_bench",),
    )
    bench_bands = (
        bands.where(F.col("_is_bench"))
        .select(F.col(id_col).alias("_bid"), "band_idx", "band_key")
        .distinct()
    )
    cand = (
        bands.where(~F.col("_is_bench"))
        .join(F.broadcast(bench_bands), ["band_idx", "band_key"])
        .select(F.col(id_col), "_bid")
        .distinct()
    )
    if candidate_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy("_bid")
        cand = (
            cand.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= candidate_cap)
            .drop("_r")
        )
    sets = shingled.select(
        F.col(id_col), "_is_bench", F.array_distinct("shingles").alias("_ds")
    )
    bench_sets = sets.where(F.col("_is_bench")).select(
        F.col(id_col).alias("_bid"), F.col("_ds").alias("_dsb")
    )
    sets = sets.drop("_is_bench")
    inter = F.size(F.array_intersect("_ds", "_dsb"))
    union = F.size("_ds") + F.size("_dsb") - inter
    ver = (
        cand.join(sets, id_col)
        .join(F.broadcast(bench_sets), "_bid")
        .withColumn("_j", inter.cast("double") / union.cast("double"))
        .where(F.col("_j") >= threshold)
    )
    return ver.groupBy(id_col, F.size("_ds").alias("n_shingles")).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.max("_j").alias("contamination"),
    ).select(id_col, "n_shingles", "n_hits", "contamination")


def duplicate_span_census(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The shared window-hash census both span consumers build on —
    computed ONCE and persisted, so asking for both the coverage counts
    (:func:`duplicate_spans`) and the removable ranges
    (:func:`duplicate_span_ranges`) of the same corpus re-tokenizes and
    re-hashes nothing (e01 runs both arms off one census).

    Returns ``(wins, dup_hashes, totals)``:

    - ``wins`` — (id, _pos, _h): every ``window``-token rolling window
      as (1-based position, md5 of the space-joined slice — engine-
      exact, so a SQL oracle can recompute it). One narrow map;
      PERSISTED (it feeds the census aggregate and both joins back).
    - ``dup_hashes`` — (_h): hashes occurring in >1 document. ONE
      combineable groupBy on the hash — the only corpus-sized shuffle;
      O(total tokens), nothing quadratic, nothing collects.
    - ``totals`` — (id, total_windows): per-doc window count, 0 for
      documents shorter than ``window`` tokens.
    """
    n_win = F.size("_tok") - F.lit(window - 1)
    # no input rebalance (see doc_shingles: the text-payload exchange
    # measured as a net loss on the r12 A/B; e01's census consumers read
    # the persisted wins table, which spreads the joins regardless)
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tok")
    )
    wins = (
        toks.where(n_win > 0)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), n_win),
                    lambda i: F.md5(
                        F.concat_ws(" ", F.slice("_tok", i, window))
                    ),
                )
            ).alias("_p0", "_h"),
        )
        .select(F.col(id_col), (F.col("_p0") + 1).alias("_pos"), "_h")
        .persist()
    )
    dup_hashes = (
        wins.groupBy("_h")
        .agg(F.count_distinct(id_col).alias("_docs"))
        .where(F.col("_docs") > 1)
        .select("_h")
        .persist()  # both consumers join against it: census shuffle runs once
    )
    totals = toks.select(
        F.col(id_col),
        F.greatest(n_win, F.lit(0)).cast("long").alias("total_windows"),
    )
    return wins, dup_hashes, totals


def spans_from_census(
    wins: DataFrame, dup_hashes: DataFrame, totals: DataFrame, id_col: str
) -> DataFrame:
    """Per-doc duplicated-window coverage from a prebuilt census: one
    equi-join back on the hash, one per-doc count. Columns:
    (id, dup_windows, total_windows)."""
    per_doc = wins.join(dup_hashes, "_h").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_windows")
    )
    return totals.join(per_doc, [id_col], "left").select(
        F.col(id_col),
        F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
        F.col("total_windows").cast("long").alias("total_windows"),
    )


def ranges_from_census(
    wins: DataFrame, dup_hashes: DataFrame, id_col: str, window: int
) -> DataFrame:
    """Merged removable token ranges from a prebuilt census: island
    grouping over flagged positions only (a subset of the doc's
    windows), all JVM-side. Columns:
    (id, span_start, span_end, span_tokens)."""
    from pyspark.sql import Window as W

    flagged = wins.join(dup_hashes, "_h").select(F.col(id_col), "_pos")
    w_ord = W.partitionBy(id_col).orderBy("_pos")
    grouped = (
        flagged.withColumn("_prev", F.lag("_pos").over(w_ord))
        .withColumn(
            "_brk",
            F.when(
                F.col("_prev").isNull()
                | (F.col("_pos") - F.col("_prev") > window),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_grp",
            F.sum("_brk").over(
                w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
    )
    return grouped.groupBy(id_col, "_grp").agg(
        F.min("_pos").cast("long").alias("span_start"),
        (F.max("_pos") + window - 1).cast("long").alias("span_end"),
    ).select(
        F.col(id_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
    )


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """Exact duplicate-SPAN detection — the suffix-array exact-substring
    dedup of Lee et al. (ACL'22, "Deduplicating Training Data Makes
    Language Models Better") re-expressed Spark-first as rolling window
    hashes: any ``window``-token span occurring in more than one
    document is a duplicated span, and each document reports how many
    of its window positions are covered by such spans
    (``dup_windows`` / ``total_windows`` — the coverage fraction a
    curation pipeline thresholds on, the per-doc aggregate of the span
    REMOVAL the paper performs). Scale shape: see
    :func:`duplicate_span_census`.

    Columns: (id, dup_windows, total_windows).
    """
    wins, dup_hashes, totals = duplicate_span_census(
        df, id_col, text_col, window
    )
    return spans_from_census(wins, dup_hashes, totals, id_col)


def duplicate_span_ranges(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """The actionable form of :func:`duplicate_spans`: per document, the
    MERGED token ranges covered by cross-document duplicated windows —
    exactly what the Lee et al. exact-substring pipeline REMOVES. Two
    flagged windows at positions p ≤ q merge when ``q <= p + window``
    (their token coverage overlaps or adjoins), so each output row is
    one maximal removable span ``[span_start, span_end]`` (1-based
    token indices, inclusive).

    Columns: (id, span_start, span_end, span_tokens).
    """
    wins, dup_hashes, _ = duplicate_span_census(df, id_col, text_col, window)
    return ranges_from_census(wins, dup_hashes, id_col, window)


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level line deduplication (CCNet §4.1 "removing duplicated
    lines"; RefinedWeb/Falcon runs the same pass before MinHash): a
    line is kept only at its FIRST occurrence across the whole corpus
    (smallest ``(id, pos)``) — every later copy (boilerplate headers,
    footers, cookie banners, repeated paragraphs) is dropped, and each
    document is reassembled from its surviving lines in order.

    Scale shape — the first-occurrence pass is a COMBINEABLE aggregate,
    never a window.  ``Window.partitionBy(line)`` would ship every
    occurrence of a line to ONE task (boilerplate — the very thing this
    pass removes — appears in a huge fraction of documents, so its
    hottest key is corpus-sized by construction).  Instead:

    1. ``groupBy(line).agg(min(struct(id, pos)))`` — the partial (map
       side) min collapses each input partition's copies of a
       boilerplate line to ONE row before the exchange, so the shuffle
       carries at most distinct-lines-per-partition rows and the
       hottest reduce key receives ≤ one row per upstream partition;
    2. the winners (one row per distinct line) equi-join back onto the
       occurrences.  A skewed join key is the one skew Spark can
       actually split at runtime (AQE ``OptimizeSkewedJoin`` splits the
       oversized partition and replicates the single winner row), which
       a window partition never is;
    3. one final shuffle on the doc id for reassembly (map-side
       partial).

    The line text itself is the group/join key here so the DuckDB
    oracle is exact; at 100 TB you'd prepend ``xxhash64(line)`` as the
    leading key (same plan, 8-byte hashes do the partitioning and the
    raw line rides along only for the equality check).

    Returns one row per document:
    ``(id, clean_text, n_kept, n_dropped)`` — ``clean_text`` is ''
    when every line of the document was dropped.

    ``sep`` is a LITERAL separator (it is regex-escaped before the
    split, and used verbatim in the rejoin), so '.', '|' etc. behave.
    """
    import re

    # no input rebalance: the posexplode output shuffles into the
    # per-line winner aggregate anyway — the r12 on/off A/B measured the
    # extra text-payload exchange as a net loss for e01 (x0.62 with it
    # on), and at production scale the scan is already split
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), re.escape(sep))
        ).alias("pos", "line"),
    )
    winners = lines.groupBy("line").agg(
        F.min(
            F.struct(F.col(id_col).alias("_wid"), F.col("pos").alias("_wpos"))
        ).alias("_first")
    )
    flagged = lines.join(winners, "line").withColumn(
        "_keep",
        (F.col(id_col) == F.col("_first._wid"))
        & (F.col("pos") == F.col("_first._wpos")),
    )
    kept_struct = F.when(F.col("_keep"), F.struct("pos", "line"))
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0))
        .cast("int")
        .alias("n_kept"),
        F.sum(F.when(F.col("_keep"), 0).otherwise(1))
        .cast("int")
        .alias("n_dropped"),
    )


def doc_line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """WITHIN-document line deduplication — the row-local sibling of
    :func:`line_dedup` (CCNet §4.1 dedups across the corpus; pipelines
    such as RefinedWeb §3.2 ALSO strip lines repeated inside one page:
    nav menus, sidebars, footers rendered once per section).  A line is
    kept only at its FIRST occurrence within its own document, and the
    document is reassembled from the survivors in order.

    Scale shape: the whole pass is array expressions inside one
    projection — NO shuffle, NO exchange of any kind, at any corpus
    size (contrast :func:`line_dedup`, which must exchange to find
    cross-document winners).  First occurrence is
    ``array_position(lines, x) == i + 1`` evaluated per element, so
    the per-row cost is O(lines²) string comparisons — lines-per-doc
    is format-bounded (a page has hundreds of lines, never millions),
    which keeps the quadratic harmless while buying the zero-exchange
    plan; a 100 TB run is a pure map over the scan.

    Returns one row per document:
    ``(id, clean_text, n_kept, n_dropped)``.

    ``sep`` is a LITERAL separator (regex-escaped before the split,
    used verbatim in the rejoin).
    """
    import re

    lines = F.split(F.col(text_col), re.escape(sep))
    kept = F.filter(
        lines, lambda x, i: F.array_position(lines, x) == i + F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, sep).alias("clean_text"),
        F.size(kept).cast("int").alias("n_kept"),
        (F.size(lines) - F.size(kept)).cast("int").alias("n_dropped"),
    )
