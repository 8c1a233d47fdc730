"""Incremental IVF index for streaming embedding ingestion.

Batch ANN (``operators/similarity.py``) builds its inverted file from
the whole corpus. An ingestion pipeline grows the corpus in
micro-batches, and rebuilding cells per increment is an O(corpus)
recompute; this index does O(batch) work per increment and keeps the
codebook FROZEN between rebuilds — the standard production IVF shape
(FAISS-style: train once, add forever, retrain when drift warrants):

- the codebook comes from :func:`informixcdc_spark.operators.similarity.
  kmeans_centroids` over the FIRST batch (or any training sample) and
  is stored in the state pointer (K·dim floats — metadata-sized);
- each arriving batch assigns its vectors to cells with one broadcast
  join (the same plan the batch path uses, pinned in test_plans) and
  appends one segment per batch, partitioned by cell on disk, so a
  query's cell probe prunes to its cells' files;
- queries probe ``nprobe`` nearest cells across all segments — one
  equi-join on cell id; recall/latency trades exactly like the batch
  IVF (nprobe = n_centroids degenerates to exact search).

Exactly-once: segment list + codebook commit through the same
:class:`~informixcdc_spark.streaming.statestore.StateStore` pointer
contract as the CDC materializer (batchId-idempotent replay, crash at
the pointer commit leaves the previous index readable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from informixcdc_spark.functions.vector import dot, l2_norm
from informixcdc_spark.streaming.statestore import PosixStateStore, StateStore


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
        store: StateStore | None = None,
    ):
        self.spark = spark
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_centroids = n_centroids
        self.n_iter = n_iter
        self.store = store if store is not None else PosixStateStore(state_dir)

    # -- state ----------------------------------------------------------------
    def read_state(self) -> dict:
        st = self.store.read_state()
        return st if st is not None else {
            "batch_id": -1,
            "segments": [],
            "codebook": None,  # [[cell_id, [floats]], ...]
        }

    def _codebook_df(self, codebook) -> DataFrame:
        return self.spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in codebook],
            "_cid INT, _cvec ARRAY<FLOAT>",
        ).withColumn("_cn", l2_norm(F.col("_cvec")))

    def read_index(self) -> DataFrame | None:
        """(id, vec, _norm, cell) across all segments. Each segment is
        its own cell-partitioned dataset (segment names are not
        partition keys, so they union rather than sharing a basePath);
        a cell predicate still prunes partitions inside every segment."""
        from functools import reduce

        segs = self.read_state()["segments"]
        if not segs:
            return None
        parts = [
            self.spark.read.parquet(self.store.path("cells", f"v{s}"))
            for s in segs
        ]
        return reduce(lambda a, b: a.unionByName(b), parts)

    # -- per-batch ingestion ----------------------------------------------------
    def _assign(self, batch_df: DataFrame, codebook) -> DataFrame:
        """Nearest-cell assignment: ONE broadcast join + per-vector
        argmin window — the corpus never shuffles on the cell."""
        from pyspark.sql import Window

        cent = self._codebook_df(codebook)
        v = batch_df.select(
            self.id_col,
            self.vec_col,
            l2_norm(F.col(self.vec_col)).alias("_norm"),
        )
        cos = F.when(
            (F.col("_norm") > 0) & (F.col("_cn") > 0),
            dot(F.col(self.vec_col), F.col("_cvec"))
            / (F.col("_norm") * F.col("_cn")),
        )
        w = Window.partitionBy(self.id_col).orderBy(
            F.col("_cos").desc(), F.col("_cid")
        )
        return (
            v.crossJoin(F.broadcast(cent))
            .withColumn("_cos", cos)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(self.id_col, self.vec_col, "_norm", F.col("_cid").alias("cell"))
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        st = self.read_state()
        if batch_id <= st["batch_id"]:
            return  # replayed micro-batch after checkpoint recovery

        codebook = st["codebook"]
        if codebook is None:
            # train on the first increment; frozen until retrain()
            from informixcdc_spark.operators.similarity import kmeans_centroids

            codebook = [
                [c, v]
                for c, v in kmeans_centroids(
                    batch_df, self.id_col, self.vec_col,
                    self.n_centroids, self.n_iter,
                )
            ]
        assigned = self._assign(batch_df, codebook)
        (
            assigned.repartition("cell")
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(self.store.path("cells", f"v{batch_id}"))
        )
        self.store.commit_state(
            {
                "batch_id": batch_id,
                "segments": st["segments"] + [batch_id],
                "codebook": codebook,
            }
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
            raise ValueError("empty index — ingest a batch first")
        cent = self._codebook_df(st["codebook"])
        qcos = F.when(
            (F.col("_qn") > 0) & (F.col("_cn") > 0),
            dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn")),
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("_qcos").desc(), F.col("_cid")
        )
        probes = (
            queries.select(
                F.col(self.id_col).alias("query_id"),
                F.col(self.vec_col).alias("_qvec"),
                l2_norm(F.col(self.vec_col)).alias("_qn"),
            )
            .crossJoin(F.broadcast(cent))
            .withColumn("_qcos", qcos)
            .withColumn("_rn", F.row_number().over(wq))
            .where(F.col("_rn") <= nprobe)
            .select("query_id", "_qvec", "_qn", F.col("_cid").alias("cell"))
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

    def retrain(self, sample: DataFrame) -> None:
        """Refresh the codebook from ``sample`` and reassign EVERY
        stored vector (one pass over the index — the deliberate
        O(index) maintenance operation, versioned-then-pointed)."""
        from informixcdc_spark.operators.similarity import kmeans_centroids

        st = self.read_state()
        codebook = [
            [c, v]
            for c, v in kmeans_centroids(
                sample, self.id_col, self.vec_col, self.n_centroids, self.n_iter
            )
        ]
        index = self.read_index()
        merged = f"{st['batch_id']}-retrain"
        if index is not None:
            reassigned = self._assign(
                index.select(self.id_col, self.vec_col), codebook
            )
            (
                reassigned.repartition("cell")
                .write.partitionBy("cell")
                .mode("overwrite")
                .parquet(self.store.path("cells", f"v{merged}"))
            )
            segments = [merged]
        else:
            segments = []
        old = st["segments"]
        self.store.commit_state(
            {"batch_id": st["batch_id"], "segments": segments, "codebook": codebook}
        )
        for s in old:
            self.store.delete_tree("cells", f"v{s}")
