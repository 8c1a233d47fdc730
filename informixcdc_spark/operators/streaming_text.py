"""Incremental BM25 postings index for streaming ingestion.

The third streaming index, completing the pattern: every batch index
family has a micro-batch twin that does O(batch) work per increment —
near-dup bands (``streaming_dedup.IncrementalDedupIndex``), IVF cells
(``streaming_ann.IncrementalAnnIndex``), and now lexical postings.
Batch BM25 (``operators/retrieval.py``) re-tokenizes the corpus per
run; an ingestion pipeline appends each micro-batch's postings ONCE
and serves searches against the accumulated index.

Per batch:

- postings come from the SAME :func:`~informixcdc_spark.operators.
  retrieval.bm25_postings` the batch path uses (identical
  tokenization, identical ``(doc, term, dl, tf)`` rows, so streaming
  and batch agree on every score);
- the segment is written with the size-ADAPTIVE layout the dedup index
  pioneered: at or above ``min_bucket_rows`` postings it is
  partitioned by ``pmod(hash(term), n_buckets)`` so a search prunes to
  its query terms' buckets (a pruned point-lookup read, never a full
  index scan); below, it writes flat — scanning a tiny segment whole
  beats a repartition plus ``n_buckets`` tiny files;
- the corpus scalars BM25 needs (document count, total token count —
  avgdl's numerator/denominator) accumulate in the pointer document,
  so search never re-scans the corpus for statistics.

Search reads the bucket-pruned index once and computes document
frequencies FROM that pruned read: the pruned read contains every
posting in the query terms' buckets, a superset of the query terms'
postings, so per-term counts over it are the exact corpus-wide
``df`` for every query term — no separate df table to maintain
incrementally. Scoring then reuses :func:`~informixcdc_spark.
operators.retrieval.bm25_topk` verbatim: streaming search over n
ingested batches is bit-equal to batch ``bm25_search`` over their
union (pinned in ``tests/test_streaming.py``).

Exactly-once: the segment list and corpus scalars live in a
:class:`~informixcdc_spark.streaming.statestore.StateStore` pointer
with the same batchId-idempotent versioned-then-pointed contract as
the other two indexes — a replayed micro-batch after checkpoint
recovery is skipped, a crash before the pointer commit leaves the
previous index readable and the replay completes it.

The reference has no text surface; extension charter (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from informixcdc_spark.functions.text import tokens
from informixcdc_spark.operators.retrieval import (
    B,
    K1,
    bm25_postings,
    bm25_topk,
)
from informixcdc_spark.streaming.statestore import (
    PosixStateStore,
    StateStore,
    segment_schema,
)


class IncrementalPostingsIndex:
    """foreachBatch sink: append each micro-batch's postings, serve
    BM25 searches against everything ingested so far."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = 64,
        min_bucket_rows: int = 1 << 18,
        auto_compact_segments: int | None = 16,
        store: StateStore | None = None,
    ):
        self.spark = spark
        self.id_col = id_col
        self.text_col = text_col
        #: term-bucket fan-out of the on-disk layout (see module doc);
        #: 64 fits the local fixture, a 100 TB index wants 4-16k.
        #: Changing it on a live index is safe — each segment remembers
        #: its own layout and mismatched segments read unpruned until
        #: compaction rewrites them.
        self.n_buckets = n_buckets
        #: size-adaptive layout guard, same rationale as the dedup
        #: index's but a higher default: postings rows are narrow
        #: (4 scalars vs band hashes), so a sub-256k-row segment costs
        #: more to bucket (repartition + n_buckets small files) than an
        #: unpruned scan of its few MB; pruning pays on the big merged
        #: runs that dominate index bytes at real scale. 0 forces
        #: bucketed always (the plan-pin tests).
        self.min_bucket_rows = min_bucket_rows
        #: full-fold compaction once the segment list crosses this
        #: (None = manual compact() only); the pointer protocol makes a
        #: crash mid-compact harmless
        self.auto_compact_segments = auto_compact_segments
        self.store = store if store is not None else PosixStateStore(state_dir)

    # -- state ----------------------------------------------------------------
    def read_state(self) -> dict:
        defaults = {
            "batch_id": -1,
            "segments": [],
            "segment_rows": {},
            "segment_buckets": {},
            "compactions": 0,
            # corpus scalars: BM25's N and avgdl numerator — counted
            # over ALL ingested docs (zero-token docs too), exactly
            # like the batch path's corpus_stats
            "n_docs": 0,
            "total_tokens": 0,
            # data-column schema of every segment (captured from the
            # first written batch): lets reads skip parquet
            # footer-inference jobs. None on pre-round-11 state docs —
            # those fall back to inference.
            "schema_json": None,
        }
        st = self.store.read_state()
        return defaults if st is None else {**defaults, **st}

    def bucket_expr(self):
        """Term-bucket expression (Murmur3 with Spark's fixed seed —
        batch and index always agree). Public so a caller that already
        collects its query-term probe can ride the bucket column along
        in that ONE collect and hand :meth:`search` the distinct bucket
        list (``query_buckets``), instead of search launching a second
        tiny job for it."""
        return F.pmod(F.hash("term"), F.lit(self.n_buckets))

    # backward-compatible alias (pre-round-11 internal name)
    _bkt = bucket_expr

    def _read_segment(
        self, name, st: dict, buckets: list | None = None
    ) -> DataFrame:
        reader = self.spark.read
        schema = segment_schema(
            st.get("schema_json"),
            st["segment_buckets"].get(str(name)) is not None,
        )
        if schema is not None:
            # skips the footer-read schema-inference job per call — on
            # the search path that's one job per segment per search
            reader = reader.schema(schema)
        df = reader.parquet(self.store.path("postings", f"v{name}"))
        if (
            buckets is not None
            and st["segment_buckets"].get(str(name)) == self.n_buckets
            and "_bkt" in df.columns
        ):
            df = df.where(F.col("_bkt").isin(buckets))
        return df.select("doc", "term", "dl", "tf")

    def read_index(self, buckets: list | None = None) -> DataFrame | None:
        """The accumulated postings (union of segments), optionally
        pruned to a term-bucket list (the search path)."""
        from functools import reduce

        st = self.read_state()
        if not st["segments"]:
            return None
        parts = [self._read_segment(s, st, buckets) for s in st["segments"]]
        return reduce(lambda a, b: a.unionByName(b), parts)

    # -- per-batch ingestion ------------------------------------------------
    def _write_segment(
        self,
        postings: DataFrame,
        seg_name: str,
        n_rows: int | None,
        seg_buckets: dict,
        key: str,
    ) -> dict:
        path = self.store.path("postings", seg_name)
        bucketed = n_rows is None or n_rows >= self.min_bucket_rows
        out = {k: v for k, v in seg_buckets.items() if k != key}
        if bucketed:
            (
                postings.repartition("_bkt")
                .write.partitionBy("_bkt")
                .mode("overwrite")
                .parquet(path)
            )
            out[key] = self.n_buckets
        else:
            # flat segments are small by definition (< min_bucket_rows):
            # a handful of files reads back cheaper than one per
            # upstream shuffle partition
            postings.drop("_bkt").coalesce(8).write.mode(
                "overwrite"
            ).parquet(path)
        return out

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        st = self.read_state()
        if batch_id <= st["batch_id"]:
            return  # replayed micro-batch after checkpoint recovery

        batch = batch_df.select(self.id_col, self.text_col)
        # ONE batch-sized scan for the corpus scalars (docs and total
        # tokens — zero-token docs count toward N, like corpus_stats)
        row = batch.select(
            F.size(tokens(F.col(self.text_col))).alias("_dl")
        ).agg(F.count(F.lit(1)), F.sum("_dl")).first()
        n_batch, tok_batch = int(row[0]), int(row[1] or 0)
        if n_batch == 0:
            self.store.commit_state({**st, "batch_id": batch_id})
            return

        postings = (
            bm25_postings(batch, self.id_col, self.text_col)
            .withColumn("_bkt", self._bkt())
            .persist()
        )
        n_rows = postings.count()
        new_buckets = st["segment_buckets"]
        segments = st["segments"]
        seg_rows = st["segment_rows"]
        schema_json = st["schema_json"]
        if n_rows > 0:  # all-empty-text batches still advance scalars
            new_buckets = self._write_segment(
                postings, f"v{batch_id}", n_rows, st["segment_buckets"],
                str(batch_id),
            )
            segments = st["segments"] + [batch_id]
            seg_rows = {**st["segment_rows"], str(batch_id): n_rows}
            # data columns only — _bkt is the partition column and is
            # re-attached per segment layout at read time
            schema_json = postings.drop("_bkt").schema.json()
        self.store.commit_state(
            {
                **st,
                "schema_json": schema_json,
                "batch_id": batch_id,
                "segments": segments,
                "segment_rows": seg_rows,
                "segment_buckets": new_buckets,
                "n_docs": st["n_docs"] + n_batch,
                "total_tokens": st["total_tokens"] + tok_batch,
            }
        )
        postings.unpersist()
        if (
            self.auto_compact_segments
            and len(st["segments"]) + 1 > self.auto_compact_segments
        ):
            self.compact()

    def compact(self) -> None:
        """Fold every segment into one (read-amplification
        maintenance), versioned-then-pointed: the merged segment is
        written under a fresh name before the pointer moves, old
        segments are deleted only after the commit. Also the layout-
        migration path — flat-written small segments graduate to the
        bucketed layout once the merged run crosses the threshold.
        (Size-tiered merging as in the dedup index would amortize
        further; postings segments are corpus-proportional and merge
        rarely, so the full fold keeps this index simpler.)"""
        st = self.read_state()
        segs = st["segments"]
        if len(segs) <= 1:
            return
        from functools import reduce

        merged = reduce(
            lambda a, b: a.unionByName(b),
            [self._read_segment(s, st) for s in segs],
        )
        tmp = f"c{st['compactions']}"
        known = [st["segment_rows"][str(s)] for s in segs
                 if str(s) in st["segment_rows"]]
        merged_rows = sum(known) if len(known) == len(segs) else None
        new_buckets = self._write_segment(
            merged.withColumn("_bkt", self._bkt()), f"v{tmp}", merged_rows,
            {}, tmp,
        )
        self.store.commit_state(
            {
                **st,
                "segments": [tmp],
                "segment_rows": (
                    {tmp: merged_rows} if merged_rows is not None else {}
                ),
                "segment_buckets": new_buckets,
                "compactions": st["compactions"] + 1,
            }
        )
        for s in segs:
            if str(s) != tmp:
                self.store.delete_tree("postings", f"v{s}")

    # -- search ----------------------------------------------------------------
    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        k1: float = K1,
        b: float = B,
        exclude_self: bool = True,
        query_terms: DataFrame | None = None,
        query_buckets: list | None = None,
    ) -> DataFrame:
        """Top-k BM25 documents per query document, over everything
        ingested so far — bit-equal to batch ``bm25_search`` on the
        union of the ingested batches. The index read prunes to the
        query terms' buckets (bounded, metadata-sized collect); df
        comes from the pruned read (exact — see module doc).

        ``exclude_self`` as in :func:`..retrieval.bm25_topk`;
        ``query_terms`` optionally supplies the distinct
        ``(query_id, term)`` probe precomputed (shared with a batch
        search over the same queries) instead of tokenizing them.
        ``query_buckets`` optionally supplies the probe terms'
        :meth:`bucket_expr` values (must cover every query term — a
        caller that collected the probe computes them in that same
        collect); search then skips its own bucket job. Values outside
        the index layout are harmless (the prune is ``isin``)."""
        st = self.read_state()
        qterms = (
            queries.select(
                F.col(self.id_col).alias("query_id"),
                F.explode(tokens(F.col(self.text_col))).alias("term"),
            ).distinct()
            if query_terms is None
            else query_terms
        )
        buckets = (
            list(query_buckets)
            if query_buckets is not None
            else [
                r[0]
                for r in qterms.select(
                    self.bucket_expr().alias("_b")
                ).distinct().collect()
            ]
        )
        index = self.read_index(buckets=buckets)
        if index is None:
            # Schema must match the non-empty path exactly, including the
            # id dtype (string doc ids etc.) — derive it from the query
            # side rather than hardcoding long, so downstream unions hold.
            id_dt = queries.schema[self.id_col].dataType
            empty_schema = StructType(
                [
                    StructField("query_id", id_dt),
                    StructField("rank", IntegerType(), False),
                    StructField("neighbor_id", id_dt),
                    StructField("score", DoubleType()),
                ]
            )
            return self.spark.createDataFrame([], empty_schema)
        from informixcdc_spark.operators.retrieval import doc_frequency

        avgdl = st["total_tokens"] / st["n_docs"] if st["n_docs"] else 0.0
        return bm25_topk(
            index, doc_frequency(index), qterms, st["n_docs"], avgdl, k, k1, b,
            exclude_self=exclude_self,
        )

    # -- convenience ------------------------------------------------------------
    def ingest_stream(self, docs_stream: DataFrame, checkpoint_dir: str):
        """Wire the index as the stream's foreachBatch sink."""
        return (
            docs_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
