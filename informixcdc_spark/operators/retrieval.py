"""BM25 sparse lexical retrieval over a document corpus.

The sparse twin of ``operators/similarity.py``: where the dense path
ranks by embedding cosine, this ranks by Okapi BM25 over an inverted
index built with two aggregations — the other retrieval family a
training-data pipeline runs (lexical decontamination sweeps, hard
example mining, retrieval-based quality audits).

100 TB shape:

- the inverted index (postings) is ONE explode + ONE partially
  aggregated groupBy on (doc, term) — doc length comes from the token
  array's size before the explode, so no second pass and no join back
  to the corpus;
- document frequencies are a vocab-sized aggregate (map-side combined);
- a query set is small by construction, so its (query, term, df, idf)
  probe table is joined against df and then BROADCAST into the
  postings join — the corpus-sized posting list never shuffles for the
  probe;
- scoring shuffles once on (query, doc) with a map-side partial sum,
  then once per query for the top-k window. Nothing is quadratic in
  the corpus.

Determinism: per-(query, doc, term) contributions are pure double
expressions evaluated in one pinned association order, and the
per-document score is their DECIMAL(18,6) sum (the order-insensitive
exact-sum pattern from ``functions/numeric.py``). Ranking orders by the
decimal score itself, so a SQL oracle reproduces both scores and ranks
bit-for-bit.

Reference anchor: the reference engine (aford4074/informixcdc) exposes
no retrieval surface — this extends the engine for LLM-corpus curation,
same charter as ``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from informixcdc_spark.catalog import rebalance
from informixcdc_spark.functions.text import tokens

#: BM25 free parameters (Robertson et al.; the values virtually every
#: deployment uses). Exposed so the oracle can inline the identical
#: double literals.
K1 = 1.2
B = 0.75


def bm25_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index rows ``(doc, term, dl, tf)``.

    ``dl`` (document length in tokens) rides along as a grouping key —
    it is functionally dependent on ``doc``, so the extra key changes
    neither the shuffle width nor the group count, and it saves the
    join back to the corpus a separate doc-length table would need.
    """
    base = rebalance(docs).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_toks")
    )
    exploded = base.select(
        "doc", F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
    )
    return exploded.groupBy("doc", "term", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )


def doc_frequency(postings: DataFrame) -> DataFrame:
    """``(term, df)`` — in how many documents each term occurs. One
    map-side-combined aggregate over the postings; output is
    vocab-sized."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(
    docs: DataFrame, text_col: str = "text"
) -> tuple[int, float]:
    """``(n_docs, avgdl)`` — the two scalars BM25's length normalizer
    needs. One scan, two numbers out (metadata-sized collect)."""
    row = docs.select(F.size(tokens(F.col(text_col))).alias("_dl")).agg(
        F.count(F.lit(1)), F.sum("_dl")
    ).first()
    n_docs = int(row[0])
    avgdl = int(row[1] or 0) / n_docs if n_docs else 0.0
    return n_docs, avgdl


def _contribution(n_docs: int, avgdl: float, k1: float, b: float):
    """The per-(query, doc, term) BM25 term as a column expression over
    ``df``/``tf``/``dl``. Association order is pinned with explicit
    parentheses and mirrored verbatim by :func:`sql_contribution`, so
    both engines evaluate the identical IEEE operation sequence."""
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    num = F.col("tf") * F.lit(k1 + 1.0)
    den = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.lit(avgdl))
    )
    return idf * (num / den)


def sql_contribution(
    n_docs_expr: str, avgdl_expr: str, k1: float = K1, b: float = B
) -> str:
    """ANSI-SQL rendering of :func:`_contribution` for a DuckDB oracle.
    Constants are injected as ``repr()`` of the same Python doubles the
    Spark expression uses, so both engines parse identical literals."""
    return (
        f"ln(1.0 + ({n_docs_expr} - df + 0.5) / (df + 0.5))"
        f" * ((tf * {k1 + 1.0!r}) / (tf + {k1!r} *"
        f" ({1.0 - b!r} + {b!r} * (dl / {avgdl_expr}))))"
    )


def bm25_topk(
    postings: DataFrame,
    docfreq: DataFrame,
    query_terms: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 5,
    k1: float = K1,
    b: float = B,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k BM25 documents per query.

    ``query_terms`` is ``(query_id, term)`` distinct — small by
    construction. It picks up each term's ``df`` (vocab-sized join kept
    on the small side) and the resulting probe table broadcasts into
    the postings join, so the corpus-sized side never shuffles for the
    probe. Output: ``(query_id, rank, neighbor_id, score)`` with
    ``score`` the exact DECIMAL(18,6) sum cast to double and ``rank``
    ordered by that decimal (deterministic; ties break on neighbor id).

    ``exclude_self`` drops ``doc == query_id`` hits — correct when the
    queries ARE corpus documents (dedup/audit sweeps, the default use).
    Pass ``False`` for an external query set whose ids merely share the
    corpus id space, where such a collision is a legitimate neighbor.
    """
    probe = F.broadcast(query_terms).join(docfreq, "term")
    scored = postings.join(F.broadcast(probe), "term")
    if exclude_self:
        scored = scored.where(F.col("doc") != F.col("query_id"))
    contrib = _contribution(n_docs, avgdl, k1, b)
    per_doc = scored.select(
        "query_id",
        F.col("doc").alias("neighbor_id"),
        contrib.cast("decimal(18,6)").alias("_c"),
    ).groupBy("query_id", "neighbor_id").agg(F.sum("_c").alias("_s"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_s").desc(), F.col("neighbor_id")
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.col("_s").cast("double").alias("score"),
        )
    )


def bm25_search(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    k1: float = K1,
    b: float = B,
    exclude_self: bool = True,
    query_terms: DataFrame | None = None,
) -> DataFrame:
    """End-to-end: index ``corpus`` and rank its top-k documents for
    each query document's bag of distinct terms.

    The postings feed both the probe join and the document-frequency
    aggregate, so they are persisted — the in-query analog of
    materializing the inverted index once, which is how a real corpus
    serves many query batches without re-tokenizing 100 TB per batch.
    The corpus is tokenized exactly ONCE: the two scalars
    :func:`corpus_stats` would re-tokenize for are derived from the
    cached postings instead (``Σ_doc dl == Σ tf`` — each doc's token
    count is the sum of its term frequencies) plus a tokenizer-free
    ``count()`` for ``n_docs`` (zero-token docs have no posting rows
    but still count toward N, exactly as corpus_stats counted them).

    ``exclude_self``: see :func:`bm25_topk` — default assumes queries
    are corpus documents; pass ``False`` for an external query set.
    ``query_terms`` optionally supplies a precomputed distinct
    ``(query_id, term)`` probe (e.g. one shared with a streaming-index
    search over the same queries) instead of tokenizing ``queries``.
    """
    postings = bm25_postings(corpus, id_col, text_col).persist()
    n_docs = corpus.count()
    tot = postings.agg(F.sum(F.col("tf"))).first()[0]
    avgdl = int(tot or 0) / n_docs if n_docs else 0.0
    qterms = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .distinct()
        if query_terms is None
        else query_terms
    )
    return bm25_topk(
        postings, doc_frequency(postings), qterms, n_docs, avgdl, k, k1, b,
        exclude_self=exclude_self,
    )
