"""Plan-shape pins: the properties that decide 100 TB viability must
hold in the physical plan, not just in intent."""

from __future__ import annotations

from pyspark.sql import functions as F

from informixcdc_spark.catalog import load_table
from informixcdc_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema_columns,
)
from informixcdc_spark.queries.relational import (
    b06_semi_anti_join,
    q01_revenue_by_nation,
    q02_pricing_summary,
)


def test_flagship_broadcasts_dimensions(spark, sf_dir):
    df = q01_revenue_by_nation(spark, sf_dir)
    assert has_broadcast_hash_join(df), formatted_plan(df)


def test_flagship_pushes_filters_to_scan(spark, sf_dir):
    df = q01_revenue_by_nation(spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "o_orderdate" in pf, pf  # date range reaches the orders scan
    assert "r_name" in pf, pf  # region filter reaches the region scan


def test_flagship_prunes_columns(spark, sf_dir):
    df = q01_revenue_by_nation(spark, sf_dir)
    schemas = read_schema_columns(df)
    li = next(s for s in schemas if "l_extendedprice" in s)
    # the lineitem scan must NOT read unused columns
    assert "l_comment" not in li
    assert set(li) <= {"l_orderkey", "l_extendedprice", "l_discount"}, li


def test_q02_scan_prunes_to_used_columns(spark, sf_dir):
    df = q02_pricing_summary(spark, sf_dir)
    (li,) = read_schema_columns(df)
    assert "l_partkey" not in li and "l_orderkey" not in li


def test_semi_join_pushes_price_filter(spark, sf_dir):
    df = b06_semi_anti_join(spark, sf_dir)
    assert any("o_totalprice" in f for f in pushed_filters(df))
    plan = formatted_plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan


def test_agg_is_partial_then_final(spark, sf_dir):
    # map-side combine: two HashAggregates around one Exchange — the
    # difference between shuffling 6 columns × 600M rows and shuffling
    # one partial row per group per task
    plan = formatted_plan(q02_pricing_summary(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan


def test_projection_prunes_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey").where(
        F.col("l_orderkey") > 100
    )
    (cols,) = read_schema_columns(df)
    assert cols == ["l_orderkey"]
    assert any("l_orderkey" in f for f in pushed_filters(df))


def test_cdc_apply_broadcasts_truncate_floor(spark, sf_dir):
    # the truncate-floor side aggregates to <= one row per table; the
    # apply path must broadcast it, never shuffle the event stream for it
    from informixcdc_spark.queries.cdcq import c01_cdc_apply_net_effect

    df = c01_cdc_apply_net_effect(spark, sf_dir)
    assert has_broadcast_hash_join(df), formatted_plan(df)


def test_cdc_apply_has_no_record_dedup_exchange(spark, sf_dir):
    # the net-effect window subsumes record dedup: the plan holds only
    # the window/commit-join exchanges (4 hash partitionings as of r10:
    # two txn-keyed, the truncate floor's table key, the upsert target
    # key) — a dedicated dropDuplicates(seq_number) pass would add a
    # fifth, single-key exchange. Structural ceiling, not a literal
    # partitioning-string match, so alias renames can't disarm it.
    import re

    from informixcdc_spark.queries.cdcq import c01_cdc_apply_net_effect

    plan = formatted_plan(c01_cdc_apply_net_effect(spark, sf_dir))
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert len(parts) <= 4, (parts, plan)


def test_rebalance_is_noop_when_already_parallel(spark, sf_dir):
    from informixcdc_spark.catalog import load_table, rebalance

    df = load_table(spark, sf_dir, "lineitem").repartition(64)
    assert rebalance(df) is df  # already >= defaultParallelism: untouched


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # the whole point of bucketing: with both sides bucketed+sorted on the
    # join key, the sort-merge join's distribution requirement is already
    # met by the scans — no Exchange anywhere in the plan
    from informixcdc_spark.queries.relational import bucketed_orders_lineitem

    orders, lineitem = bucketed_orders_lineitem(spark, sf_dir)
    # restore the SESSION's tuned threshold, not Spark's default —
    # conf.unset would leave 10MB where get_spark set 64MB, flipping
    # later tests' model-table joins from broadcast to shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_spreads_hot_keys(spark, sf_dir):
    # with broadcast off, the salted join must shuffle on BOTH key parts
    # (the user key AND the salt) — that compound hashpartitioning is
    # what splits one hot key across tasks. Structural pin: parse every
    # hash partitioning's ARGUMENT LIST and require the join's two
    # shuffles to carry a compound (>= 2 expressions + numPartitions)
    # key — no literal column-name matching, so Catalyst aliasing can
    # neither break nor silently disarm it.
    import re

    from informixcdc_spark.queries.relational import q25_salted_skew_join

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(q25_salted_skew_join(spark, sf_dir))
        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        compound = [p for p in parts if len(p.split(",")) >= 3]
        assert len(compound) >= 2, (parts, plan)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pii_redaction_is_shuffle_free(spark, sf_dir):
    # per-row regex map: must fuse into the scan stage with no Exchange
    from informixcdc_spark.queries.extensions import e22_pii_redaction

    plan = formatted_plan(e22_pii_redaction(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_doc_line_dedup_is_shuffle_free(spark, sf_dir):
    # within-document line dedup is array expressions in one projection:
    # no Exchange of any kind at any corpus size (the zero-exchange
    # contrast to corpus-level line_dedup's aggregate + join-back)
    from informixcdc_spark.operators.dedup import doc_line_dedup
    from informixcdc_spark.queries.extensions import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = formatted_plan(doc_line_dedup(docs, "doc_id", "text"))
    assert "Exchange" not in plan, plan


def test_c4_rules_are_scan_fused(spark, sf_dir):
    # the C4 rule set, like Gopher's, must fuse into the scan: pure
    # column expressions, no Exchange
    from informixcdc_spark.operators.textstats import c4_rules_exprs
    from informixcdc_spark.queries.extensions import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept, frac, nsent, keep = c4_rules_exprs(F.col("text"))
    plan = formatted_plan(
        docs.select(
            "doc_id",
            kept.alias("kept"),
            frac.alias("frac"),
            nsent.alias("nsent"),
            keep.alias("keep"),
        )
    )
    assert "Exchange" not in plan, plan


def test_sequence_packing_single_pershard_shuffle(spark, sf_dir):
    # pack arm (isolated via the mode filter — PruneFilters constant-
    # folds the chunk branch away): exactly ONE exchange (on the shard
    # key); tokenization happens BELOW it, so the shuffle carries
    # (source, doc_id, n_tok) ints — never the document text; the final
    # agg reuses the window's partitioning instead of adding a second
    # exchange
    from informixcdc_spark.queries.extensions import e24_sequence_packing

    df = e24_sequence_packing(spark, sf_dir).where(F.col("mode") == "pack")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    scan_side = plan.split("Exchange")[1]  # text below the exchange only
    assert "split(text" in scan_side, plan
    # chunk arm: slices/fingerprints are row-local — its only exchanges
    # are the rebalance repartition and the per-doc census agg, and the
    # posexploded chunk rows never shuffle (the agg's map side combines)
    chunk = e24_sequence_packing(spark, sf_dir).where(F.col("mode") == "chunk")
    cplan = chunk._jdf.queryExecution().executedPlan().toString()
    assert cplan.count("Exchange") <= 2, cplan
    assert "Join" not in cplan, cplan


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    # sink layout: hive-partitioned parquet by a low-cardinality key.
    # A filtered read-back must prune at the PARTITION level (directory
    # skip — zero bytes of non-matching partitions read), visible as a
    # PartitionFilters entry on the scan. This is the write-side layout
    # contract that makes 100 TB event tables queryable by type/day.
    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).where(F.col("event_type") == "purchase")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    got = {r["event_type"] for r in back.select("event_type").distinct().collect()}
    assert got == {"purchase"}


def test_fused_doc_queries_are_single_pass(spark, sf_dir):
    """The fold-based per-document queries (fingerprints, lang+
    sentiment) must stay ONE narrow map pass: no Exchange beyond the
    single rebalance repartition, no join, no aggregate in the plan.
    e10 left this set in round 7 when it gained the bigram-LM columns
    (operators/lm.py joins the model tables on) — its heuristic
    column family is still the same fold expressions, but the query
    plan now legitimately aggregates and joins; its own pin below."""
    import re

    from informixcdc_spark.queries.extensions import (
        e02_fingerprints,
        e11_lang_sentiment,
    )

    for fn in (e02_fingerprints, e11_lang_sentiment):
        plan = formatted_plan(fn(spark, sf_dir))
        # formatted mode lists each node in the tree AND a detail section
        # — count the numbered detail headers, one per physical node
        n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchange <= 1, f"{fn.__name__}: {n_exchange} exchanges"
        assert "Join" not in plan, fn.__name__
        assert "HashAggregate" not in plan, fn.__name__


def test_e10_lm_joins_stay_model_sized(spark, sf_dir):
    """e10's model extensions: the only allowed plan growth is the
    n-gram LMs plus the weak-label NB classifier — partial→final count
    aggregates, doc-keyed equi-joins, and scoring passes whose
    model-table sides broadcast; nothing quadratic, and the exchange
    count stays a FIXED budget, not corpus-pass blowup: every exchange
    is either a model-sized aggregate or ONE doc-keyed shuffle, so the
    budget is scale-invariant. Since r10 the bigram scoring pass is
    persisted (thresholds fit on a filter of it, run once at build),
    so the formatted plan shows the model/scoring subtrees through
    their InMemoryRelation sections — the count below spans those too
    (the r9 itemization was 9 heuristic+bigram + 6 NB + 9 trigram = 24
    live exchanges; the cached-subtree rendering adds the scoring
    pass's explode/join/agg chain once more)."""
    import re

    from informixcdc_spark.queries.extensions import e10_quality_repetition

    # pin the COLD plan: earlier tests in the shared session may have
    # left model-table caches whose InMemoryRelation stats flip a
    # broadcast join to shuffle (+2 exchanges) — that cache-dependent
    # regime is fine at runtime but makes the count nondeterministic
    spark.catalog.clearCache()
    plan = formatted_plan(e10_quality_repetition(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree, plan
    assert "BroadcastNestedLoopJoin" not in tree, plan
    # observed 29 standalone and 33 inside the full suite on identical
    # code: the formatted rendering of InMemoryRelation subplans varies
    # with cache-materialization state, so the ceiling carries slack —
    # it exists to catch corpus-pass blowup (which adds exchanges in
    # multiples), not single-digit display drift
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 40, f"{n_exchange} exchanges"
    # every aggregate is hash-based (map-side combinable counts/sums)
    assert "SortAggregate" not in tree, plan
    # the NB term table reaches the corpus token stream via broadcast
    assert tree.count("BroadcastHashJoin") >= 1, plan


def test_e13_media_arms_stay_fused(spark, sf_dir):
    """e13 crosses the Python boundary exactly ONCE (metadata, stub
    features, real audio decode, real image header walk — one
    mapInPandas) and has zero joins: an un-fusion (each arm its own walk
    joined on doc_id) adds a corpus-wide shuffle per extra arm. Pin
    both counts AND zero exchanges beyond the rebalance."""
    import re

    from informixcdc_spark.queries.extensions import (
        e13_multimodal_meta_features,
    )

    plan = formatted_plan(e13_multimodal_meta_features(spark, sf_dir))
    n_py = len(re.findall(r"\(\d+\) MapInPandas", plan))
    assert n_py == 1, f"{n_py} Python crossings: {plan}"
    assert "Join" not in plan, plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 1, f"{n_exchange} exchanges: {plan}"


def test_kmeans_assignment_is_zero_shuffle(spark, sf_dir):
    """The IVF k-means cell assignment must be a single zero-shuffle
    projection — the trained codebook inlines as plan-time literals, so
    the corpus streams through once with NO join, NO window and NO
    exchange of any kind (round 10 retired the broadcast crossJoin +
    row_number shape, which shuffled corpus×K rows per assignment —
    the 100 TB killer for the codebook path)."""
    from informixcdc_spark.operators.similarity import ivf_cells_kmeans

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cells = ivf_cells_kmeans(emb, n_centroids=4, n_iter=1)
    plan = formatted_plan(cells)
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree, plan
    assert "Window" not in tree, plan
    # the single allowed Exchange is rebalance()'s round-robin spread
    # of an under-partitioned fixture scan — nothing keyed, nothing
    # centroid-derived
    assert tree.count("Exchange") <= 1, plan
    assert "hashpartitioning" not in tree, plan
    assert "rangepartitioning" not in tree, plan


def test_bounded_verify_has_no_cartesian(spark, sf_dir):
    """The capped near-dup verify must stay equi-join + bounded windows:
    no CartesianProduct / BroadcastNestedLoopJoin anywhere (a quadratic
    fallback would defeat the candidate bound)."""
    from informixcdc_spark.operators.dedup import near_dup_verified_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = near_dup_verified_pairs(docs, "doc_id", "text")
    plan = formatted_plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_incremental_ann_search_broadcasts_probes(spark, sf_dir, tmp_path):
    """The incremental index's search must broadcast the (small) probe
    side into the cell equi-join and never shuffle the stored corpus on
    anything query-derived — the same 100 TB rule the batch IVF path
    pins, applied to the streaming index."""
    from pyspark.sql import functions as F

    from informixcdc_spark.operators.streaming_ann import IncrementalAnnIndex

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = IncrementalAnnIndex(
        spark, str(tmp_path / "ann"), n_centroids=4,
        track_dispersion=False,
        codebook=[
            [c, [1.0 if d == c else 0.0 for d in range(8)]] for c in range(4)
        ],
    )
    idx.process_batch(emb.where(F.col("vec_id") < 64), 0)
    plan = formatted_plan(idx.search(emb.where(F.col("vec_id") < 4), k=2))
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the probe-side join must be broadcast — a sort-merge join here
    # would shuffle the stored corpus on the cell key per query
    assert "SortMergeJoin" not in plan, plan
    # (the post-join per-query top-k window hashes on query_id — that
    # exchange is candidates-sized under nprobe pruning, not corpus-sized)


def test_incremental_dedup_admission_is_equijoin(spark, sf_dir, tmp_path):
    """The dedup gate's cross-index check must be a band-bucket
    equi-join: no cartesian/nested-loop anywhere in an admission batch's
    dups plan (the index side prunes to the batch's band keys)."""
    from pyspark.sql import functions as F

    from informixcdc_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_bands,
    )
    from informixcdc_spark.operators.streaming_dedup import IncrementalDedupIndex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = IncrementalDedupIndex(spark, str(tmp_path / "dd"))
    idx.process_batch(docs.where(F.col("doc_id") < 64), 0)
    # reproduce the batch-1 admission plan shape: batch bands vs index
    bands = minhash_bands(
        doc_shingles(
            docs.where((F.col("doc_id") >= 64) & (F.col("doc_id") < 128)),
            "doc_id",
            "text",
        ),
        "doc_id",
    )
    intra = lsh_candidate_pairs(bands, "doc_id", star_cap=64)
    hits = (
        bands.join(
            idx.read_index().select(
                F.col("doc_id").alias("_old"), "band_idx", "band_key"
            ),
            ["band_idx", "band_key"],
        )
        .groupBy("doc_id")
        .agg(F.min("_old").alias("dup_of"))
    )
    for df in (intra, hits):
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pq_encode_is_shuffle_free(spark, sf_dir):
    """PQ encoding must be a pure scan-fused projection — the codebooks
    are plan-time literals, so compressing a 100 TB corpus is one pass
    with zero exchanges."""
    from informixcdc_spark.operators.quantization import pq_encode

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    books = [
        {"lo": 0, "hi": 8, "centroids": [(c, [4.0 if d == c else 0.0 for d in range(8)]) for c in range(8)]},
        {"lo": 8, "hi": 13, "centroids": [(c, [1.0 if d == c else 0.0 for d in range(5)]) for c in range(5)]},
    ]
    plan = formatted_plan(pq_encode(emb, books))
    assert "Exchange" not in plan, plan


def test_pq_search_broadcasts_queries_never_shuffles_corpus(spark, sf_dir):
    """ADC search: the (small) query side with its lookup tables is the
    ONLY broadcast; the encoded corpus is never exchanged before
    scoring (the one shuffle is the per-query top-k window over scored
    pairs, same shape as brute_force_knn)."""
    from informixcdc_spark.operators.quantization import pq_encode, pq_search_adc

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    books = [
        {"lo": 0, "hi": 8, "centroids": [(c, [4.0 if d == c else 0.0 for d in range(8)]) for c in range(8)]},
        {"lo": 8, "hi": 13, "centroids": [(c, [1.0 if d == c else 0.0 for d in range(5)]) for c in range(5)]},
    ]
    enc = pq_encode(emb, books)
    df = pq_search_adc(emb.where(F.col("vec_id") < 5), enc, books, k=3)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or has_broadcast_hash_join(df), plan
    # corpus side reaches the join scan-direct: no shuffle before scoring
    pre_join = plan.split("Join")[0] if "BroadcastNestedLoopJoin" in plan else plan
    assert "Exchange hashpartitioning" not in pre_join, plan


def test_bpe_pair_count_is_partial_then_final(spark):
    """Each BPE merge iteration's pair count must map-side combine: two
    HashAggregates around one Exchange, so shuffle volume is
    distinct-pairs-per-task, not corpus pairs."""
    from informixcdc_spark.operators.bpe import _word_symbols, bpe_pair_counts

    words = (
        spark.createDataFrame(
            [("low", 5), ("lower", 2), ("newest", 6)], "_w string, _cnt long"
        )
        .select(_word_symbols(F.col("_w")).alias("_sym"), "_cnt")
    )
    plan = formatted_plan(bpe_pair_counts(words))
    assert plan.count("HashAggregate") >= 2, plan
    # Catalyst may alias struct-field group keys to _groupingexpression#NN
    # (and formatted mode puts Exchange args on their own line), so pin the
    # STRUCTURE: exactly one Exchange in the tree, between the final and
    # partial HashAggregate, and it is a hash partitioning.
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, plan
    # the one Exchange is a HASH repartition for the aggregation —
    # pinned by excluding the alternatives (range/single-partition),
    # not by matching a partitioning-expression string
    assert "rangepartitioning" not in tree, plan
    assert "SinglePartition" not in tree, plan
    aggs = [i for i in range(len(tree)) if tree.startswith("HashAggregate", i)]
    assert len(aggs) == 2, plan
    assert aggs[0] < tree.index("Exchange") < aggs[1], plan


def test_line_dedup_first_occurrence_is_combineable(spark):
    """Corpus line dedup's first-occurrence pass must be a PARTIAL →
    FINAL aggregate on the line key, never a window: boilerplate lines
    are corpus-sized groups by construction, and a window partition
    ships every occurrence to one task while a partial min collapses
    them map-side.  The winners come back via an equi-join (the one
    skew AQE can split at runtime).  No window exec, no cartesian."""
    from informixcdc_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(0, "a b\nc d"), (1, "a b\nx y")], "doc_id long, text string"
    )
    plan = formatted_plan(line_dedup(docs))
    tree = plan.split("\n\n")[0]
    # the skew-cliff shape is gone: no window over the line value
    assert "Window" not in tree, plan
    assert "CartesianProduct" not in tree, plan
    # first-occurrence: two HashAggregates (partial, final) around an
    # Exchange — i.e. map-side combine on the line key
    hashaggs = [i for i in range(len(tree)) if tree.startswith("HashAggregate", i)]
    assert len(hashaggs) >= 2, plan
    # winners rejoin occurrences via an equi-join, never a product
    assert (
        "SortMergeJoin" in tree
        or "ShuffledHashJoin" in tree
        or "BroadcastHashJoin" in tree
    ), plan
    # reassembly aggregate is partial-then-final around its Exchange
    aggs = [
        i for i in range(len(tree)) if tree.startswith("ObjectHashAggregate", i)
    ]
    assert len(aggs) == 2, plan


def test_semantic_dedup_broadcasts_codebook_bounds_pairs(spark):
    """SemDeDup's scale contract: centroid assignment is a ZERO-JOIN
    literal-codebook projection (the corpus never shuffles — or even
    joins — to meet the codebook; round 10 retired the broadcast
    crossJoin + window shape), and the pairwise stage is an equi-join
    on the cell — the plan holds no cartesian between the two corpus
    copies."""
    from informixcdc_spark.operators.similarity import semantic_dedup

    emb = spark.createDataFrame(
        [(i, [float(i % 4 == d) for d in range(4)]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    axes = [(c, [1.0 if d == c else 0.0 for d in range(4)]) for c in range(4)]
    plan = formatted_plan(semantic_dedup(emb, axes, threshold=0.9))
    # no join of ANY kind serves the assignment; no quadratic fallback
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # assignment adds no window (row-local sorted-array slice)
    assert "Window" not in plan, plan
    # the pair stage joins on the cell: an equi-join (hash-partitioned
    # or broadcast under AQE), never an unkeyed product
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or (
        "ShuffledHashJoin" in plan
    ), plan


def test_dsir_feature_counts_broadcast_back(spark):
    """DSIR's scale contract: the bucket-bounded feature-count table
    reaches the corpus token stream via BROADCAST (a corpus shuffle
    keyed on features would be the 100 TB killer); the only corpus-keyed
    exchange is the per-doc sum. Nothing cartesian, no SortAggregate."""
    from informixcdc_spark.operators.curation import dsir_log_weights

    docs = spark.createDataFrame(
        [(i, f"alpha w{i} beta gamma") for i in range(40)],
        "doc_id long, text string",
    )
    plan = formatted_plan(
        dsir_log_weights(docs, F.col("doc_id") % 3 == 0, n_buckets=64)
    )
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree, plan
    assert "BroadcastNestedLoopJoin" not in tree, plan
    assert "SortAggregate" not in tree, plan
    assert tree.count("BroadcastHashJoin") >= 1, plan


def test_chunk_tokens_zero_shuffle(spark):
    """chunk_tokens fuses into the scan: the only exchange allowed in
    its plan is the rebalance repartition — chunk starts, slices and
    fingerprints are row-local array arithmetic."""
    import re

    from informixcdc_spark.operators.curation import chunk_tokens

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(200))) for i in range(10)],
        "doc_id long, text string",
    )
    plan = formatted_plan(chunk_tokens(docs, size=64, stride=48))
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 1, f"{n_exchange} exchanges: {plan}"
    assert "Join" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_sq_encode_is_scan_fused(spark):
    """SQ encoding — like PQ's — is a zero-exchange projection against
    plan-time literal bounds: compressing the corpus is one map pass."""
    import re

    from informixcdc_spark.operators.quantization import sq_encode

    emb = spark.createDataFrame(
        [(i, [float(i % 4), float(i % 2)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    plan = formatted_plan(sq_encode(emb, [(0.0, 3.0), (0.0, 1.0)]))
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 0, f"{n_exchange} exchanges: {plan}"
    assert "Join" not in plan and "HashAggregate" not in plan, plan


def test_star_round_joins_copartitioned_never_broadcast(spark):
    """One star-contraction round's scale contract (guide §2.4/§3.1):
    the per-node min table `m` joins its neighbor list CO-PARTITIONED
    (shuffle-hash over the one `repartition("src")` exchange both the
    aggregate and the join ride) — never broadcast: `m` is node-count-
    sized, and collecting it to the driver per round is the 100 TB
    killer the pre-r12 shape hid under the local broadcast threshold."""
    from informixcdc_spark.operators.dedup import _large_star, _small_star

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (7, 8), (8, 9)],
        "src long, dst long",
    )
    plan = formatted_plan(_small_star(_large_star(edges)))
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" not in tree, plan
    assert "SortMergeJoin" not in tree, plan
    assert "ShuffledHashJoin" in tree, plan


def test_decontaminate_fuzzy_broadcasts_bench_side(spark):
    """Fuzzy decontamination's scale contract: the benchmark side
    (suite-sized) reaches the corpus via BROADCAST joins at both the
    band-candidate stage and the verify stage — a corpus shuffle keyed
    on the bench tables would be the 100 TB killer. Nothing cartesian."""
    from informixcdc_spark.operators.dedup import decontaminate_fuzzy

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i} epsilon zeta") for i in range(40)],
        "doc_id long, text string",
    )
    plan = formatted_plan(
        decontaminate_fuzzy(docs, "doc_id", "text", F.col("doc_id") % 7 == 0)
    )
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree, plan
    assert "BroadcastNestedLoopJoin" not in tree, plan
    # bench bands + bench sets both broadcast into corpus-sized joins
    assert tree.count("BroadcastHashJoin") >= 2, plan


def test_bm25_probe_broadcasts_corpus_never_sort_merges(spark, sf_dir):
    """BM25 search: the query-term probe table (small by construction)
    reaches the corpus postings via broadcast — a sort-merge or shuffle
    join there would exchange the corpus-sized posting list per query
    batch. Postings build and scoring both map-side combine."""
    from informixcdc_spark.operators.retrieval import bm25_search

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    df = bm25_search(docs, docs.where(F.col("doc_id") < 5), k=5)
    plan = formatted_plan(df)
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" not in tree, plan
    assert "CartesianProduct" not in tree, plan
    # df→probe join and probe→postings join are both broadcast
    assert tree.count("BroadcastHashJoin") == 2, plan
    # postings + docfreq + score aggregates all partial→final
    assert plan.count("HashAggregate") >= 4, plan


def test_pagerank_edges_cached_no_cartesian(spark):
    """PageRank: the edge table is partitioned+persisted ONCE (every
    iteration reuses the layout via InMemoryTableScan), each inflow
    aggregate map-side combines, and nothing is quadratic."""
    from informixcdc_spark.operators.graph import pagerank

    nodes = spark.range(100).select(F.col("id").alias("node"))
    edges = nodes.select(
        F.col("node").alias("src"), ((F.col("node") * 7 + 3) % 100).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    plan = formatted_plan(pagerank(edges, nodes, n_iter=3, n_nodes=100))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree, plan
    assert "BroadcastNestedLoopJoin" not in tree, plan
    # one InMemoryTableScan per iteration join + per-degree build: the
    # edge list is computed once, not re-derived per iteration
    assert tree.count("InMemoryTableScan") >= 3, plan
    # three per-iteration inflow aggregates, each partial->final
    assert tree.count("HashAggregate") >= 6, plan
