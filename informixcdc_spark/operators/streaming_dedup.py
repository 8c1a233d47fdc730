"""Incremental near-dup gate for streaming ingestion.

Batch dedup (``operators/dedup.py``) answers "which documents in THIS
corpus duplicate each other". An ingestion pipeline needs the
incremental question: as micro-batches arrive, which NEW documents
duplicate anything already accepted — without recomputing over the
accumulated corpus. At 100 TB the full-recompute alternative is a
corpus-sized shuffle per increment; this index does O(batch) work:

- each batch's documents shingle → minhash → band exactly like the
  batch path (same operators, same constants, so batch and streaming
  agree on what "near-dup" means);
- candidate hits come from ONE equi-join of the batch's bands against
  the persisted band index. The index is stored PARTITIONED by a band
  bucket (``pmod(hash(band_idx, band_key), n_buckets)`` directories per
  segment), and the probe first collects the batch's distinct buckets
  (bounded by ``n_buckets`` — metadata-sized) and filters the index
  read with them, so Spark's partition pruning skips every bucket
  directory the batch cannot hit: the per-batch index I/O is
  O(index / n_buckets × distinct batch buckets), a pruned point-lookup
  join, never a full index scan (plan-pinned in ``test_plans.py``).
  The layout is size-ADAPTIVE: segments below ``min_bucket_rows`` band
  rows write flat (a tiny segment scans whole for less than a
  repartition + n_buckets small files cost — measured 1.6× ingest
  throughput at 300-doc batches) and graduate to the bucketed layout
  when compaction merges them past the threshold, so pruning exists
  exactly where it pays: on the big merged runs that dominate index
  bytes;
- within-batch duplicates collapse first via the band self-join with
  the ``star_cap`` guard, so a batch of 10⁵ boilerplate copies admits
  one representative and emits star-linked pairs, never m²/2;
- only NOVEL documents' bands append to the index — the index is
  append-only (segments per batch, unioned on read), so per-batch
  write cost is O(novel bands), never O(index). ``compact()`` folds
  segments back into one when read amplification grows.

Exactly-once: the segment list lives in a
:class:`~informixcdc_spark.streaming.statestore.StateStore` pointer
with the same batchId-idempotent, versioned-then-pointed contract as
the CDC materializer — a replayed micro-batch after checkpoint
recovery is skipped, a crash before the pointer commit leaves the
previous index readable and the replay completes it.

The reference has no text operators at all; this is driver-mandated
curation surface (SURVEY §2.9) in its streaming form.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from informixcdc_spark.operators.dedup import (
    doc_shingles,
    lsh_candidate_pairs,
    minhash_bands,
)
from informixcdc_spark.streaming.statestore import (
    PosixStateStore,
    StateStore,
    segment_schema,
)


class IncrementalDedupIndex:
    """foreachBatch sink: admit novel documents, flag near-dups of the
    accumulated corpus.

    Per batch, :meth:`process_batch` writes two artifacts and then
    commits the pointer:

    - ``dups/v{batch}``: (doc_id, dup_of) — batch docs that collide
      with an already-indexed doc (``dup_of`` = the indexed doc), plus
      within-batch non-representative members (``dup_of`` = the batch
      representative);
    - ``bands/v{batch}``: the band rows of this batch's novel docs
      (the new index segment).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 3,
        star_cap: int = 64,
        min_band_matches: int = 1,
        auto_compact_segments: int | None = 16,
        n_buckets: int = 64,
        min_bucket_rows: int = 4096,
        store: StateStore | None = None,
    ):
        self.spark = spark
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.star_cap = star_cap
        #: band-bucket fan-out of the on-disk layout: each segment is
        #: written partitionBy(pmod(hash(band_idx, band_key), n_buckets))
        #: so the probe prunes to the batch's buckets. Sized like any
        #: partition fan-out: large enough that index/n_buckets fits a
        #: task, small enough that tiny batches still skip most of it
        #: (64 here for the local fixture; a 100 TB index wants 4-16k).
        #: Changing it on a live index is safe — each segment remembers
        #: its own layout and unbucketed/mismatched segments are probed
        #: unpruned until compaction rewrites them.
        self.n_buckets = n_buckets
        #: size-ADAPTIVE layout guard: a segment below this many band
        #: rows writes FLAT (no repartition, no n_buckets tiny files —
        #: measured 1.6x ingest throughput at 300-doc batches) because
        #: scanning a tiny segment whole is cheaper than the bucketed
        #: write; pruning matters exactly when segments are big, and
        #: compaction bucketizes merged runs once they cross the same
        #: threshold. 0 forces bucketed always (the plan-pin tests).
        self.min_bucket_rows = min_bucket_rows
        #: cross-index verification WITHOUT extra state: a single band
        #: collision is a Jaccard-j event with probability j^rows, so a
        #: borderline pair can collide once by luck; requiring >= t
        #: matching bands (expected matches = n_bands * j^rows) sharply
        #: cuts false rejections of novel docs while exact copies still
        #: match every band. Applies to the index check; within-batch
        #: collapse keeps the star-capped single-collision rule (its
        #: misfires only choose a different representative, they never
        #: reject a group outright).
        self.min_band_matches = min_band_matches
        #: auto-fold segments once the list crosses this length (None =
        #: manual compact() only); the pointer protocol makes a crash
        #: mid-compact harmless, so firing it inside process_batch is safe
        self.auto_compact_segments = auto_compact_segments
        self.store = store if store is not None else PosixStateStore(state_dir)

    # -- state ----------------------------------------------------------------
    def read_state(self) -> dict:
        defaults = {
            "batch_id": -1,
            "segments": [],
            # band rows per segment (str(name) -> rows): the size-tiered
            # compaction signal; absent for pre-r6 states (those
            # segments sort as largest, i.e. merged only by a manual
            # full compact)
            "segment_rows": {},
            "compactions": 0,  # monotonic counter naming merged segments
        }
        defaults["segment_buckets"] = {}  # str(name) -> n_buckets it was written with
        # band-segment / dups data-column schemas (captured at first
        # write): reads pass them explicitly and skip the parquet
        # footer-inference job per segment read. None on pre-round-11
        # state docs — those fall back to inference.
        defaults["schema_json"] = None
        defaults["dups_schema_json"] = None
        st = self.store.read_state()
        return defaults if st is None else {**defaults, **st}

    def _bkt(self):
        """The band-bucket expression (deterministic: Murmur3 with
        Spark's fixed seed, so batch and index always agree)."""
        return F.pmod(F.hash("band_idx", "band_key"), F.lit(self.n_buckets))

    def _read_segment(
        self, name, st: dict, buckets: list | None = None
    ) -> DataFrame:
        """One segment, bucket-pruned when possible: a segment written
        under the CURRENT n_buckets prunes its partition directories to
        ``buckets``; unbucketed (pre-upgrade) or differently-bucketed
        segments read unpruned — correct either way, because the bucket
        filter only ever skips rows the band equi-join could not match."""
        reader = self.spark.read
        schema = segment_schema(
            st.get("schema_json"),
            st["segment_buckets"].get(str(name)) is not None,
        )
        if schema is not None:
            # skips the footer-read schema-inference job per segment
            reader = reader.schema(schema)
        df = reader.parquet(self.store.path("bands", f"v{name}"))
        if (
            buckets is not None
            and st["segment_buckets"].get(str(name)) == self.n_buckets
            and "_bkt" in df.columns
        ):
            df = df.where(F.col("_bkt").isin(buckets))
        return df.select(self.id_col, "band_idx", "band_key")

    def read_index(self, buckets: list | None = None) -> DataFrame | None:
        """The accumulated band index (union of segments), optionally
        pruned to a bucket list (the probe path)."""
        from functools import reduce

        st = self.read_state()
        if not st["segments"]:
            return None
        parts = [self._read_segment(s, st, buckets) for s in st["segments"]]
        return reduce(lambda a, b: a.unionByName(b), parts)

    def read_dups(self, batch_id: int) -> DataFrame:
        reader = self.spark.read
        schema = segment_schema(self.read_state().get("dups_schema_json"), False)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self.store.path("dups", f"v{batch_id}"))

    # -- per-batch admission ----------------------------------------------------
    def _batch_bands(self, batch_df: DataFrame) -> DataFrame:
        """Shingle → minhash → band the batch exactly like the batch
        operators, tagged with the band bucket. PERSISTED — the caller
        unpersists when its admission is done."""
        shingled = doc_shingles(
            batch_df.select(self.id_col, self.text_col),
            self.id_col,
            self.text_col,
            k=self.k,
        )
        # persist, not eager localCheckpoint: the batch's bands are
        # computed inside the first consuming action and cached for the
        # rest of the admission (one fewer job per micro-batch)
        return (
            minhash_bands(shingled, self.id_col)
            .withColumn("_bkt", self._bkt())
            .persist()
        )

    def _dups_of(self, bands: DataFrame, st: dict) -> DataFrame:
        """(doc_id, dup_of) verdicts for one batch's bands against
        within-batch collapse + the accumulated index — the shared core
        of :meth:`process_batch` (mutating) and :meth:`probe`
        (read-only)."""
        ids = F.col(self.id_col)
        # within-batch collapse: star-capped candidate pairs; every doc
        # that appears as the GREATER id of a pair is a duplicate of a
        # smaller-id representative (min side of its pair). cache=False:
        # bands is already persisted and the pairs are consumed once,
        # so per-batch cache entries must not accumulate
        intra = lsh_candidate_pairs(
            bands, self.id_col, star_cap=self.star_cap, cache=False
        )
        intra_dups = intra.groupBy(F.col("id_b").alias(self.id_col)).agg(
            F.min("id_a").alias("dup_of")
        )

        index = None
        if st["segments"]:
            # the batch's distinct buckets: bounded by n_buckets, a
            # metadata-sized collect off the cached bands — then ONE
            # equi-join of the batch's bands against the bucket-PRUNED
            # index read (partition pruning skips every other bucket dir)
            buckets = [
                r[0] for r in bands.select("_bkt").distinct().collect()
            ]
            index = self.read_index(buckets=buckets)
        if index is not None:
            hits = (
                bands.join(
                    index.select(
                        F.col(self.id_col).alias("_old"), "band_idx", "band_key"
                    ),
                    ["band_idx", "band_key"],
                )
                .groupBy(ids, "_old")
                .agg(F.count_distinct("band_idx").alias("_nb"))
                .where(F.col("_nb") >= self.min_band_matches)
                .groupBy(ids)
                .agg(F.min("_old").alias("dup_of"))
            )
            dups = hits.unionByName(
                intra_dups.join(hits.select(self.id_col), [self.id_col], "left_anti")
            )
        else:
            dups = intra_dups
        return dups.groupBy(self.id_col).agg(F.min("dup_of").alias("dup_of"))

    def _write_bands(
        self,
        band_df: DataFrame,
        seg_name: str,
        n_rows: int | None,
        seg_buckets: dict,
        key: str,
    ) -> dict:
        """Write one band segment with the size-ADAPTIVE layout: below
        ``min_bucket_rows`` band rows the segment writes flat (scanning
        it whole beats paying a repartition + n_buckets tiny files);
        at or above, partitioned by band bucket so the probe prunes.
        Returns the updated ``segment_buckets`` map (an entry only for
        bucketed segments — the probe treats absent as unpruned)."""
        path = self.store.path("bands", seg_name)
        bucketed = n_rows is None or n_rows >= self.min_bucket_rows
        out = {k: v for k, v in seg_buckets.items() if k != key}
        if bucketed:
            (
                band_df.repartition("_bkt")
                .write.partitionBy("_bkt")
                .mode("overwrite")
                .parquet(path)
            )
            out[key] = self.n_buckets
        else:
            band_df.drop("_bkt").write.mode("overwrite").parquet(path)
        return out

    def probe(self, docs: DataFrame) -> DataFrame:
        """READ-ONLY admission check: the (doc_id, dup_of) verdicts
        :meth:`process_batch` WOULD emit for these documents — same
        within-batch collapse, same pruned index probe — with no
        segment written, no pointer moved, no state touched. The
        dry-run a pipeline uses to ask "which of these are novel?"
        before deciding to ingest (or to route rejects elsewhere).

        Eagerly computed (the admission needs the banded batch twice),
        returned as a small localCheckpointed DataFrame; the batch-side
        cache is released before returning."""
        bands = self._batch_bands(docs)
        try:
            return self._dups_of(bands, self.read_state()).localCheckpoint(
                eager=True
            )
        finally:
            bands.unpersist()

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        st = self.read_state()
        if batch_id <= st["batch_id"]:
            return  # replayed micro-batch after checkpoint recovery

        # bands cached for the rest of the admission; unpersisted before
        # return so state stays O(1) across batches
        bands = self._batch_bands(batch_df)
        dups = self._dups_of(bands, st)
        dups.write.mode("overwrite").parquet(
            self.store.path("dups", f"v{batch_id}")
        )

        # re-read WITH the writer's schema (no inference job); the
        # round-trip through parquet (not the live plan) is what makes
        # the verdicts stable across the two consumers below
        dup_ids = self.spark.read.schema(dups.schema).parquet(
            self.store.path("dups", f"v{batch_id}")
        ).select(self.id_col)
        novel_bands = bands.join(dup_ids, [self.id_col], "left_anti")
        n_novel = novel_bands.count()  # cached bands: one cheap agg
        if n_novel == 0:
            # every doc was a dup (or the batch was empty): advance the
            # pointer but never append an empty segment — segment-count
            # hygiene exactly where compaction pressure matters (the
            # dups document WAS written above, so its schema commits)
            self.store.commit_state(
                {
                    **st,
                    "batch_id": batch_id,
                    "dups_schema_json": dups.schema.json(),
                }
            )
            bands.unpersist()
            return
        new_buckets = self._write_bands(
            novel_bands, f"v{batch_id}", n_novel, st["segment_buckets"],
            str(batch_id),
        )
        self.store.commit_state(
            {
                **st,
                "batch_id": batch_id,
                "segments": st["segments"] + [batch_id],
                "segment_rows": {
                    **st["segment_rows"], str(batch_id): n_novel
                },
                "segment_buckets": new_buckets,
                # data columns only — _bkt is re-attached per segment
                # layout at read time (statestore.segment_schema)
                "schema_json": novel_bands.drop("_bkt").schema.json(),
                "dups_schema_json": dups.schema.json(),
            }
        )
        bands.unpersist()
        if (
            self.auto_compact_segments
            and len(st["segments"]) + 1 > self.auto_compact_segments
        ):
            self.compact(tiered=True)

    def compact(self, tiered: bool = False) -> None:
        """Fold segments (read-amplification maintenance), versioned-
        then-pointed like every other rewrite: the merged segment is
        written under a fresh name before the pointer moves, and old
        segments are deleted only after the commit.

        ``tiered=False`` (manual) folds EVERYTHING into one — an
        O(index) pass. ``tiered=True`` (what auto-compaction fires) is
        size-tiered: only the SMALLEST half of the segments merge, so
        merged runs grow geometrically and each band row is rewritten
        O(log n) times over the stream's life instead of O(n/threshold)
        — the LSM amortization argument. Pre-r6 segments with unknown
        row counts sort as largest (merged only by a manual full fold).
        """
        st = self.read_state()
        segs = st["segments"]
        if len(segs) <= 1:
            return
        rows = st["segment_rows"]
        if tiered:
            by_size = sorted(
                segs, key=lambda s: rows.get(str(s), float("inf"))
            )
            victims = by_size[: max(2, (len(segs) + 1) // 2)]
            survivors = [s for s in segs if s not in victims]
        else:
            victims, survivors = list(segs), []
        from functools import reduce

        merged_df = reduce(
            lambda a, b: a.unionByName(b),
            [self._read_segment(s, st) for s in victims],
        )
        tmp = f"c{st['compactions']}"  # monotonic: never collides with a live name
        known = [rows[str(s)] for s in victims if str(s) in rows]
        merged_rows = sum(known) if len(known) == len(victims) else None
        # compaction is also the layout-migration path: the merged
        # segment is (re)written under the CURRENT fan-out decision —
        # flat-written small segments graduate to the bucketed layout
        # here once their merged run crosses min_bucket_rows (unknown
        # sizes bucket, the safe default for big pre-r6 segments)
        survivors_buckets = {
            str(s): b
            for s, b in st["segment_buckets"].items()
            if s in map(str, survivors)
        }
        new_buckets = self._write_bands(
            merged_df.withColumn("_bkt", self._bkt()),
            f"v{tmp}",
            merged_rows,
            survivors_buckets,
            tmp,
        )
        new_rows = {str(s): r for s, r in rows.items() if s in map(str, survivors)}
        if merged_rows is not None:
            new_rows[tmp] = merged_rows  # unknown victims leave tmp unknown too
        self.store.commit_state(
            {
                **st,
                "segments": survivors + [tmp],
                "segment_rows": new_rows,
                "segment_buckets": new_buckets,
                "compactions": st["compactions"] + 1,
            }
        )
        for s in victims:
            if str(s) != tmp:
                self.store.delete_tree("bands", f"v{s}")

    # -- convenience ------------------------------------------------------------
    def admit_stream(self, docs_stream: DataFrame, checkpoint_dir: str):
        """Wire the index as the stream's foreachBatch sink."""
        return (
            docs_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
