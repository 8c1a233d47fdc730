"""Incremental IVF index for streaming embedding ingestion.

Batch ANN (``operators/similarity.py``) builds its inverted file from
the whole corpus. An ingestion pipeline grows the corpus in
micro-batches, and rebuilding cells per increment is an O(corpus)
recompute; this index does O(batch) work per increment and keeps the
codebook FROZEN between rebuilds — the standard production IVF shape
(FAISS-style: train once, add forever, retrain when drift warrants):

- the codebook comes from :func:`informixcdc_spark.operators.similarity.
  kmeans_centroids` over the first ``min_train_vectors`` ingested
  vectors (early batches too small to train on are STAGED — written to
  a cell-less holding segment and folded into the index the moment the
  training threshold is met, so codebook quality is never hostage to
  an unluckily tiny first micro-batch) and is stored in the state
  pointer (K·dim floats — metadata-sized);
- each arriving batch assigns its vectors to cells with one broadcast
  join (the same plan the batch path uses, pinned in test_plans) and
  appends one segment per batch, partitioned by cell on disk, so a
  query's cell probe prunes to its cells' files;
- queries probe ``nprobe`` nearest cells across all segments — one
  equi-join on cell id; recall/latency trades exactly like the batch
  IVF (nprobe = n_centroids degenerates to exact search);
- every batch records its assignment dispersion (mean best-cosine to
  the assigned centroid — one scalar the assignment already computes),
  so :meth:`drift` quantifies how much worse recent data fits the
  frozen codebook than the training data did, giving callers a
  threshold to trigger the (deliberately explicit, O(index))
  :meth:`retrain`;
- segment count is bounded: :meth:`compact` folds all segments into
  one WITHOUT touching the codebook (pure re-layout), and
  ``auto_compact_segments`` invokes it from inside
  :meth:`process_batch` once the segment list crosses the threshold —
  the pointer protocol makes a crash mid-compact harmless (old
  segments stay readable until the new pointer lands).

Exactly-once: segment list + codebook commit through the same
:class:`~informixcdc_spark.streaming.statestore.StateStore` pointer
contract as the CDC materializer (batchId-idempotent replay, crash at
the pointer commit leaves the previous index readable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from informixcdc_spark.functions.vector import dot, l2_norm
from informixcdc_spark.streaming.statestore import (
    PosixStateStore,
    StateStore,
    segment_schema,
)


class IncrementalAnnIndex:
    """foreachBatch sink maintaining a cell-partitioned IVF index."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_centroids: int = 8,
        n_iter: int = 3,
        min_train_vectors: int | None = None,
        auto_compact_segments: int | None = 16,
        retrain_on_drift: float | None = None,
        track_dispersion: bool = True,
        codebook: list | None = None,
        store: StateStore | None = None,
    ):
        self.spark = spark
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_centroids = n_centroids
        self.n_iter = n_iter
        #: vectors required before the codebook trains; k-means needs at
        #: least one vector per centroid, and more gives a better frozen
        #: codebook — batches below the threshold stage instead of train
        self.min_train_vectors = (
            min_train_vectors if min_train_vectors is not None else n_centroids
        )
        self.auto_compact_segments = auto_compact_segments
        #: drift threshold past which process_batch triggers retrain()
        #: on the accumulated index (None = caller decides when). The
        #: retrain is the deliberate O(index) maintenance op — a
        #: threshold crossing amortizes it against restored recall.
        self.retrain_on_drift = retrain_on_drift
        #: False skips the per-batch dispersion read-back (one small job
        #: per batch) for callers that neither read drift() nor set
        #: retrain_on_drift; forced True when retrain_on_drift is armed
        self.track_dispersion = track_dispersion or retrain_on_drift is not None
        #: pre-trained codebook ([[cell_id, vector], ...]) — the
        #: FAISS-style "train offline, load, add forever" shape: the
        #: first batch skips in-stream training and assigns directly.
        #: Ignored when the persisted state already carries a codebook.
        self.initial_codebook = (
            None
            if codebook is None
            else [[int(c), [float(x) for x in v]] for c, v in codebook]
        )
        self.store = store if store is not None else PosixStateStore(state_dir)

    # -- state ----------------------------------------------------------------
    def read_state(self) -> dict:
        defaults = {
            "batch_id": -1,
            "segments": [],
            "staging": [],  # pre-training holding segments (batch ids)
            "codebook": None,  # [[cell_id, [floats]], ...]
            "retrains": 0,  # monotonic counter naming retrain segments
            "train_disp": None,  # mean best-cosine at (re)train time
            "last_disp": None,  # mean best-cosine of the latest batch
            # vectors per segment (str(name) -> rows) where known (the
            # dispersion read-back supplies it); size-tiered compaction's
            # signal — unknown segments sort as largest
            "segment_rows": {},
            "compactions": 0,  # monotonic counter naming merged segments
            # segment data-column schema (captured at write): reads pass
            # it explicitly and skip the parquet footer-inference job
            # per segment; None on pre-round-11 state docs (inference)
            "schema_json": None,
        }
        st = self.store.read_state()
        # merge over defaults so a pointer written by an older engine
        # version (fewer keys) still reads
        return defaults if st is None else {**defaults, **st}

    def _codebook_df(self, codebook) -> DataFrame:
        return self.spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in codebook],
            "_cid INT, _cvec ARRAY<FLOAT>",
        ).withColumn("_cn", l2_norm(F.col("_cvec")))

    def _seg_reader(self, st: dict | None):
        """spark.read with the stored segment schema when available
        (skips the footer-inference job; a stored schema with columns
        an OLD segment lacks on disk reads them as NULL — parquet is
        schema-on-read — which is exactly the ``_fit`` backfill below).
        Pre-round-11 state docs (no stored schema) fall back to
        inference."""
        reader = self.spark.read
        schema = segment_schema(
            (st or {}).get("schema_json"), True, partition_field="cell"
        )
        return reader.schema(schema) if schema is not None else reader

    def _read_segment(self, name, st: dict | None = None) -> DataFrame:
        """One segment projected onto the CURRENT column set. Segments
        written by an older engine version lack ``_fit`` (added round
        6); backfill it as NULL so unions across mixed-vintage segments
        never throw — the compatibility promise read_state makes for
        the pointer doc extends to the on-disk segments."""
        df = self._seg_reader(st).parquet(self.store.path("cells", f"v{name}"))
        if "_fit" not in df.columns:
            df = df.withColumn("_fit", F.lit(None).cast("double"))
        return df.select(self.id_col, self.vec_col, "_norm", "cell", "_fit")

    def read_index(self) -> DataFrame | None:
        """(id, vec, _norm, cell, _fit) across all segments. Each segment
        is its own cell-partitioned dataset (segment names are not
        partition keys, so they union rather than sharing a basePath);
        a cell predicate still prunes partitions inside every segment."""
        from functools import reduce

        st = self.read_state()
        segs = st["segments"]
        if not segs:
            return None
        parts = [self._read_segment(s, st) for s in segs]
        return reduce(lambda a, b: a.unionByName(b), parts)

    # -- per-batch ingestion ----------------------------------------------------
    def _assign(self, batch_df: DataFrame, codebook) -> DataFrame:
        """Nearest-cell assignment: the batch path's zero-shuffle
        literal-codebook projection (one pass, the batch never moves
        for its cell). Keeps the winning cosine as ``_fit`` (the
        per-vector dispersion sample :meth:`drift` aggregates)."""
        from informixcdc_spark.operators.similarity import assign_cells_topn

        return assign_cells_topn(
            batch_df,
            [(int(c), v) for c, v in codebook],
            self.id_col,
            self.vec_col,
            n=1,
            score_col="_cos",
        ).select(
            self.id_col,
            self.vec_col,
            "_norm",
            "cell",
            F.coalesce(F.col("_cos"), F.lit(0.0)).alias("_fit"),
        )

    def _write_segment(self, assigned: DataFrame, name: str):
        """Write one cell-partitioned segment; return (n_rows, disp)
        from ONE scan of the just-written files (batch-sized, two
        scalars out), or (None, None) with dispersion tracking off."""
        path = self.store.path("cells", f"v{name}")
        (
            assigned.repartition("cell")
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(path)
        )
        # stash the data-column schema for the caller's pointer commit
        # ("schema_json"): future reads pass it explicitly instead of
        # paying a footer-inference job per segment
        self._seg_schema_json = assigned.drop("cell").schema.json()
        if not self.track_dispersion:
            return None, None
        # read back with the writer's schema: an EMPTY batch writes only
        # _SUCCESS (no partition files) and an inferring read would throw
        # — the explicit schema makes it a plain zero-row scan instead,
        # so genuine IO failures still raise rather than masquerading as
        # "empty batch" and silently dropping the segment
        row = (
            self.spark.read.schema(assigned.schema)
            .parquet(path)
            .agg(F.count(F.lit(1)), F.avg("_fit"))
            .first()
        )
        return int(row[0]), (None if row[1] is None else float(row[1]))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        st = self.read_state()
        if batch_id <= st["batch_id"]:
            return  # replayed micro-batch after checkpoint recovery

        batch = batch_df.select(self.id_col, self.vec_col)
        codebook = st["codebook"]
        if codebook is None and self.initial_codebook is not None:
            # pre-trained codebook: adopt it (committed with this
            # batch's pointer) and take the frozen-append path directly
            codebook = self.initial_codebook
            st = {**st, "codebook": codebook}
        if codebook is None:
            n_batch = batch.count()
            if n_batch == 0:
                # advance the pointer so replay stays idempotent, but
                # never append an empty segment (segment-count hygiene)
                self.store.commit_state({**st, "batch_id": batch_id})
                return
            # staged segments were written from earlier batches of the
            # SAME stream — the current batch's (id, vec) schema IS
            # their schema, so pass it and skip the inference jobs
            staged = [
                self.spark.read.schema(batch.schema).parquet(
                    self.store.path("staging", f"v{s}")
                )
                for s in st["staging"]
            ]
            n_staged = sum(s.count() for s in staged)
            if n_batch + n_staged < self.min_train_vectors:
                # too few vectors to train a K-cell codebook — stage
                # this batch (cell-less parquet) and wait for more
                batch.write.mode("overwrite").parquet(
                    self.store.path("staging", f"v{batch_id}")
                )
                self.store.commit_state(
                    {
                        **st,
                        "batch_id": batch_id,
                        "staging": st["staging"] + [batch_id],
                    }
                )
                return
            # threshold met: train on everything seen, fold the staged
            # vectors into the first real segment
            from functools import reduce

            from informixcdc_spark.operators.similarity import kmeans_centroids

            train_df = reduce(lambda a, b: a.unionByName(b), staged, batch)
            codebook = [
                [c, v]
                for c, v in kmeans_centroids(
                    train_df, self.id_col, self.vec_col,
                    self.n_centroids, self.n_iter,
                )
            ]
            n, disp = self._write_segment(
                self._assign(train_df, codebook), batch_id
            )
            rows = {**st["segment_rows"]}
            if n is not None:
                rows[str(batch_id)] = n
            self.store.commit_state(
                {
                    **st,
                    "batch_id": batch_id,
                    "segments": st["segments"] + [batch_id],
                    "segment_rows": rows,
                    "staging": [],
                    "codebook": codebook,
                    "train_disp": disp,
                    "last_disp": disp,
                    "schema_json": self._seg_schema_json,
                }
            )
            for s in st["staging"]:  # orphans if we crash first: harmless
                self.store.delete_tree("staging", f"v{s}")
            return

        # frozen-codebook append: TWO jobs per batch (assign+write, then
        # the fused count+dispersion read-back — or an isEmpty probe with
        # dispersion tracking off). Empty batches advance the pointer
        # without appending a segment either way.
        if self.track_dispersion:
            n, disp = self._write_segment(
                self._assign(batch, codebook), batch_id
            )
            if not n:
                self.store.delete_tree("cells", f"v{batch_id}")
                self.store.commit_state({**st, "batch_id": batch_id})
                return
            new_st = {
                **st,
                "batch_id": batch_id,
                "segments": st["segments"] + [batch_id],
                "segment_rows": {**st["segment_rows"], str(batch_id): n},
                "last_disp": disp,
                "schema_json": self._seg_schema_json,
            }
            if st["train_disp"] is None and disp is not None:
                # offline-trained codebook: no in-stream training pass
                # ever records a baseline, so adopt the FIRST batch's
                # dispersion — drift() then measures shift relative to
                # the earliest data the frozen codebook served, instead
                # of staying None forever on the production
                # (train-offline, add-forever) path
                new_st["train_disp"] = disp
        else:
            if batch.isEmpty():
                self.store.commit_state({**st, "batch_id": batch_id})
                return
            self._write_segment(self._assign(batch, codebook), batch_id)
            new_st = {
                **st,
                "batch_id": batch_id,
                "segments": st["segments"] + [batch_id],
                "schema_json": self._seg_schema_json,
            }
        self.store.commit_state(new_st)
        if (
            self.retrain_on_drift is not None
            and (self.drift() or 0.0) > self.retrain_on_drift
        ):
            # refresh the codebook from the whole accumulated corpus
            # (which now includes the drifted batch) and reassign —
            # folds segments too, so no separate compaction needed
            self.retrain(self.read_index().select(self.id_col, self.vec_col))
        elif (
            self.auto_compact_segments
            and len(st["segments"]) + 1 > self.auto_compact_segments
        ):
            self.compact(tiered=True)

    # -- maintenance --------------------------------------------------------------
    def drift(self) -> float | None:
        """How much worse the latest batch fits the frozen codebook than
        the training data did: ``train_disp - last_disp`` (positive =
        drifting; callers retrain past a threshold). None before
        training."""
        st = self.read_state()
        if st["train_disp"] is None or st["last_disp"] is None:
            return None
        return float(st["train_disp"]) - float(st["last_disp"])

    def compact(self, tiered: bool = False) -> None:
        """Fold segments with the codebook UNCHANGED (pure re-layout —
        no reassignment, no training). Versioned-then-pointed: the
        merged segment gets a fresh monotonic name, the pointer moves,
        old segments are deleted only after the commit.

        ``tiered=False`` (manual) folds everything — O(index).
        ``tiered=True`` (what auto-compaction fires) merges only the
        SMALLEST half by known row counts, so merged runs grow
        geometrically and each vector is rewritten O(log n) times over
        the stream's life (the LSM amortization); segments with unknown
        counts (dispersion tracking off) sort as largest."""
        from functools import reduce

        st = self.read_state()
        segs = st["segments"]
        if len(segs) <= 1:
            return
        rows = st["segment_rows"]
        if tiered:
            by_size = sorted(segs, key=lambda s: rows.get(str(s), float("inf")))
            victims = by_size[: max(2, (len(segs) + 1) // 2)]
            survivors = [s for s in segs if s not in victims]
        else:
            victims, survivors = list(segs), []
        merged_df = reduce(
            lambda a, b: a.unionByName(b),
            [self._read_segment(s, st) for s in victims],
        )
        merged = f"c{st['compactions']}"  # monotonic: never a live name
        (
            merged_df.repartition("cell")
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(self.store.path("cells", f"v{merged}"))
        )
        known = [rows[str(s)] for s in victims if str(s) in rows]
        new_rows = {
            str(s): r for s, r in rows.items() if s in map(str, survivors)
        }
        if len(known) == len(victims):
            new_rows[merged] = sum(known)
        self.store.commit_state(
            {
                **st,
                "segments": survivors + [merged],
                "segment_rows": new_rows,
                "compactions": st["compactions"] + 1,
                # compaction doubles as the schema-upgrade path: the
                # merged rewrite is always under the CURRENT column set
                "schema_json": merged_df.drop("cell").schema.json(),
            }
        )
        for s in victims:
            if str(s) != merged:
                self.store.delete_tree("cells", f"v{s}")

    def retrain(self, sample: DataFrame) -> None:
        """Refresh the codebook from ``sample`` and reassign EVERY
        stored vector (one pass over the index — the deliberate
        O(index) maintenance operation, versioned-then-pointed). The
        merged segment is named by a monotonic retrain counter, never
        by batch id, so back-to-back retrains without an intervening
        batch can never collide with (and then delete) a live segment."""
        from informixcdc_spark.operators.similarity import kmeans_centroids

        st = self.read_state()
        codebook = [
            [c, v]
            for c, v in kmeans_centroids(
                sample, self.id_col, self.vec_col, self.n_centroids, self.n_iter
            )
        ]
        index = self.read_index()
        merged = f"r{st['retrains']}"
        disp = None
        n = None
        if index is not None:
            reassigned = self._assign(
                index.select(self.id_col, self.vec_col), codebook
            )
            n, disp = self._write_segment(reassigned, merged)
            segments = [merged]
        else:
            segments = []
        old = st["segments"]
        self.store.commit_state(
            {
                **st,
                "segments": segments,
                "segment_rows": {} if n is None else {merged: n},
                "codebook": codebook,
                "retrains": st["retrains"] + 1,
                "train_disp": disp,
                "last_disp": disp,
                **(
                    {"schema_json": self._seg_schema_json}
                    if segments
                    else {}
                ),
            }
        )
        for s in old:
            if str(s) != merged:
                self.store.delete_tree("cells", f"v{s}")

    # -- convenience ------------------------------------------------------------
    def ingest_stream(self, vec_stream: DataFrame, checkpoint_dir: str):
        """Wire the index as the stream's foreachBatch sink (the
        :meth:`IncrementalDedupIndex.admit_stream` twin): Structured
        Streaming's checkpoint drives batch ids, the pointer protocol
        makes replays no-ops."""
        return (
            vec_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    # -- queries ------------------------------------------------------------------
    def search(
        self, queries: DataFrame, k: int = 3, nprobe: int = 1
    ) -> DataFrame:
        """Top-k by cosine over the union of each query's ``nprobe``
        nearest cells: broadcast the (small) query side into the cell
        equi-join; segments prune by cell partition."""
        from pyspark.sql import Window

        st = self.read_state()
        if not st["segments"]:
            if st["staging"]:
                raise ValueError(
                    "index not yet trained — vectors are staged below "
                    f"min_train_vectors={self.min_train_vectors}; ingest more"
                )
            raise ValueError("empty index — ingest a batch first")
        from informixcdc_spark.operators.similarity import assign_cells_topn

        probes = assign_cells_topn(
            queries,
            [(int(c), v) for c, v in st["codebook"]],
            self.id_col,
            self.vec_col,
            n=nprobe,
        ).select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).alias("_qvec"),
            F.col("_norm").alias("_qn"),
            "cell",
        )
        c = self.read_index().select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).alias("_cvec2"),
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
            )
        )


class IncrementalPqAnnIndex(IncrementalAnnIndex):
    """The streaming FAISS-``IVFPQ`` shape: cell-partitioned segments
    that store PQ CODES instead of vectors — the 100 TB memory story
    applied to the incremental index (a D-dim float vector is 4·D
    bytes on disk and in the probe join; its code row is m bytes at
    k<=256 — a 30-380× cut depending on D/m — so the per-batch append
    AND every query's candidate scan shrink by the same factor).

    Production FAISS discipline: BOTH quantizers train OFFLINE —
    ``codebook`` (coarse cells) and ``books``
    (:data:`~informixcdc_spark.operators.quantization.Codebooks`, the
    per-subspace PQ codebooks) are required up front; there is no
    in-stream training path (deferred-training staging is the
    full-vector index's job) and :meth:`retrain` raises — codes are
    not invertible, so refreshing the quantizers means re-encoding
    from the source vectors, which the index deliberately does not
    keep — :meth:`rebuild` is that loop (fresh quantizers from the
    source + full re-encode + atomic pointer/books-doc swap),
    triggered when :meth:`drift` crosses the caller's threshold.
    Both quantizers PERSIST with the index (the coarse codebook
    in the state pointer, the books under the ``pq-books`` store doc),
    so constructing with NEITHER resumes them from the store — stored
    codes can never be paired with the wrong codebooks across a
    restart.

    Per batch: ONE broadcast cell assignment (inherited — its winning
    cosine still feeds :meth:`drift`), then the zero-exchange
    plan-time-literal PQ encode fused into the same write. Segments
    hold (id, codes, cell, _fit), partitioned by cell. Search is ADC:
    each query probes its ``nprobe`` nearest coarse cells and scores
    only those cells' codes with m ``element_at`` lookups per
    candidate; with ``prune=True`` (default) the probed cells are
    resolved driver-side (queries are small by construction) and the
    segment read filters on them, so partition pruning skips every
    other cell directory — the on-disk layout actually pays off.

    Exactly-once, compaction, kill/resume ride the inherited pointer
    protocol unchanged.
    """

    #: doc-channel name under which the PQ books persist with the index
    BOOKS_DOC = "pq-books"

    def __init__(self, *args, books=None, **kwargs):
        if books is None and kwargs.get("codebook") is None:
            # resume path: both quantizers reload from the index's own
            # store (they were persisted when the index was created) —
            # a resumed reader/writer can NEVER pair the stored codes
            # with the wrong codebooks
            pass
        elif books is None or kwargs.get("codebook") is None:
            raise ValueError(
                "IncrementalPqAnnIndex takes BOTH quantizers (pretrained "
                "coarse codebook + PQ books — the offline-training IVFPQ "
                "shape), or NEITHER to resume them from the store"
            )
        if kwargs.get("retrain_on_drift") is not None:
            raise ValueError(
                "retrain_on_drift is not supported on the PQ index — codes "
                "are not invertible, so retraining needs the source "
                "vectors; monitor drift() and rebuild externally"
            )
        super().__init__(*args, **kwargs)
        if books is None:
            # the pointer names the live books doc (rebuilds version it
            # as pq-books-r{n}); older pointers predate the key and fall
            # back to the original unversioned name
            doc = self.store.read_doc(
                self.read_state().get("books_doc") or self.BOOKS_DOC
            )
            if doc is None:
                raise ValueError(
                    "no persisted PQ books at this store — pass books= "
                    "and codebook= to create the index"
                )
            books = doc["books"]
            st = self.read_state()
            if st["codebook"] is None:
                raise ValueError(
                    "persisted books found but no committed codebook — "
                    "the index was never written to; pass both quantizers"
                )
            self.initial_codebook = None  # state already carries it
        self.books = [
            {
                "lo": int(b["lo"]),
                "hi": int(b["hi"]),
                "centroids": [
                    (int(c), [float(x) for x in v]) for c, v in b["centroids"]
                ],
            }
            for b in books
        ]
        # persist for resume (idempotent: JSON round-trips lists)
        as_doc = {
            "books": [
                {"lo": b["lo"], "hi": b["hi"],
                 "centroids": [[c, v] for c, v in b["centroids"]]}
                for b in self.books
            ]
        }
        if (
            self.read_state().get("books_doc") is None
            and self.store.read_doc(self.BOOKS_DOC) != as_doc
        ):
            # only the unversioned pre-rebuild doc is rewritable here; a
            # rebuilt index's versioned doc is immutable (live segments'
            # codes were encoded with it) and only rebuild() swaps it
            self.store.write_doc(self.BOOKS_DOC, as_doc)

    # -- overrides: code-valued segments ----------------------------------------
    def _assign(self, batch_df: DataFrame, codebook) -> DataFrame:
        # Arrow encoder, not the plan-time literal fold: a micro-batch
        # re-pays the literal tree's plan build + codegen EVERY batch
        # over a few hundred rows, where the numpy argmin costs one
        # Arrow round-trip (~5x faster per batch, measured in
        # STREAMBENCH's ann_index axis; the one-big-scan batch path
        # keeps the literal fold for whole-stage codegen). Same codes:
        # the two encoders are property-pinned equal.
        from informixcdc_spark.operators.quantization import pq_encode_arrow

        assigned = super()._assign(batch_df, codebook)
        return pq_encode_arrow(
            assigned, self.books, id_col=self.id_col, vec_col=self.vec_col,
            keep_cols=("cell", "_fit"),
        )

    def _read_segment(self, name, st: dict | None = None) -> DataFrame:
        df = self._seg_reader(st).parquet(self.store.path("cells", f"v{name}"))
        return df.select(self.id_col, "codes", "cell", "_fit")

    def retrain(self, sample: DataFrame) -> None:
        raise NotImplementedError(
            "PQ segments store codes, not vectors — the index cannot "
            "refresh its quantizers from itself; call rebuild(source) "
            "with the source vectors (monitor drift() to decide when)"
        )

    def rebuild(
        self,
        source_vectors: DataFrame,
        codebook: list | None = None,
        books=None,
        pq_iter: int = 2,
    ) -> None:
        """The O(corpus) maintenance loop :meth:`retrain`'s message
        points at — the production answer to a :meth:`drift` threshold
        crossing. PQ codes are not invertible, so refreshing the
        quantizers needs the SOURCE vectors: train a fresh coarse
        codebook and fresh per-subspace books on them (the same
        deterministic trainers a from-scratch index would run — pass
        ``codebook``/``books`` to reuse offline-trained ones), re-encode
        every source vector into ONE fresh segment, and swap everything
        in atomically through the existing exactly-once pointer:

        - the new books persist under a VERSIONED doc
          (``pq-books-r{n}``) written BEFORE the pointer moves, and the
          pointer records which doc is live (``books_doc``) — a crash
          anywhere leaves the previous pointer naming the previous
          books + segments, so stored codes can never pair with the
          wrong codebooks;
        - old segments are deleted only AFTER the commit; superseded
          books docs are kept (metadata-sized) so a reader resumed
          against a pre-swap pointer snapshot still finds its doc.

        A rebuild trained from the same source is bit-identical to a
        fresh index built on it (pytest-pinned: ingest → drift →
        rebuild → search equals the from-scratch search)."""
        from informixcdc_spark.operators.quantization import (
            pq_encode_arrow,
            pq_train,
        )
        from informixcdc_spark.operators.similarity import kmeans_centroids

        st = self.read_state()
        src = source_vectors.select(self.id_col, self.vec_col)
        if codebook is None:
            codebook = [
                [c, v]
                for c, v in kmeans_centroids(
                    src, self.id_col, self.vec_col, self.n_centroids,
                    self.n_iter,
                )
            ]
        else:
            codebook = [[int(c), [float(x) for x in v]] for c, v in codebook]
        if books is None:
            # keep the CURRENT subspace layout and code widths — the
            # stored-code schema (m bytes/vector) is a contract with
            # downstream consumers; only the codeword values refresh
            books = pq_train(
                src,
                self.id_col,
                self.vec_col,
                codes=[len(b["centroids"]) for b in self.books],
                n_iter=pq_iter,
                splits=[(b["lo"], b["hi"]) for b in self.books],
            )
        new_books = [
            {
                "lo": int(b["lo"]),
                "hi": int(b["hi"]),
                "centroids": [
                    (int(c), [float(x) for x in v]) for c, v in b["centroids"]
                ],
            }
            for b in books
        ]
        # assign with the NEW coarse codebook, encode with the NEW
        # books — the base _assign (bypassing this class's override,
        # which encodes with the OLD self.books), then the same Arrow
        # encoder the per-batch path uses
        encoded = pq_encode_arrow(
            IncrementalAnnIndex._assign(self, src, codebook),
            new_books,
            id_col=self.id_col,
            vec_col=self.vec_col,
            keep_cols=("cell", "_fit"),
        )
        merged = f"r{st['retrains']}"
        books_doc = f"{self.BOOKS_DOC}-{merged}"
        self.store.write_doc(
            books_doc,
            {
                "books": [
                    {"lo": b["lo"], "hi": b["hi"],
                     "centroids": [[c, v] for c, v in b["centroids"]]}
                    for b in new_books
                ]
            },
        )
        n, disp = self._write_segment(encoded, merged)
        old = st["segments"]
        self.store.commit_state(
            {
                **st,
                "segments": [merged],
                "segment_rows": {} if n is None else {merged: n},
                "codebook": codebook,
                "books_doc": books_doc,
                "retrains": st["retrains"] + 1,
                "train_disp": disp,
                "last_disp": disp,
                "schema_json": self._seg_schema_json,
            }
        )
        self.books = new_books
        for s in old:
            if str(s) != merged:
                self.store.delete_tree("cells", f"v{s}")

    # -- ADC search --------------------------------------------------------------
    def search(
        self,
        queries: DataFrame,
        k: int = 3,
        nprobe: int = 1,
        prune: bool = True,
    ) -> DataFrame:
        from functools import reduce

        from informixcdc_spark.operators.quantization import ivfpq_search

        st = self.read_state()
        if not st["segments"]:
            raise ValueError("empty index — ingest a batch first")
        cents = [(int(c), v) for c, v in st["codebook"]]
        index = self.read_index()
        if prune:
            # the probed cells are a deterministic function of the tiny
            # query side: resolve them driver-side and filter the
            # segment read so cell-directory pruning actually fires
            cent = self._codebook_df(cents)
            from pyspark.sql import Window

            qn = F.col("_qn")
            qcos = F.when(
                (qn > 0) & (F.col("_cn") > 0),
                dot(F.col("_qvec"), F.col("_cvec")) / (qn * F.col("_cn")),
            )
            wq = Window.partitionBy("_qid").orderBy(
                F.col("_qcos").desc(), F.col("_cid")
            )
            cells = [
                r[0]
                for r in queries.select(
                    F.col(self.id_col).alias("_qid"),
                    F.col(self.vec_col).alias("_qvec"),
                    l2_norm(F.col(self.vec_col)).alias("_qn"),
                )
                .crossJoin(F.broadcast(cent))
                .withColumn("_qcos", qcos)
                .withColumn("_rn", F.row_number().over(wq))
                .where(F.col("_rn") <= nprobe)
                .select("_cid")
                .distinct()
                .collect()
            ]
            index = index.where(F.col("cell").isin(cells))
        return ivfpq_search(
            queries,
            index,
            self.books,
            cents,
            id_col=self.id_col,
            vec_col=self.vec_col,
            k=k,
            nprobe=nprobe,
        )
