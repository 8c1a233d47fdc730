"""Extension operators for large-scale training-data pipelines.

These are first-class engine components beyond the reference's CDC
surface (BASELINE.json north_star): deduplication, similarity search,
text analysis, multimodal column handling — each designed for the
100 TB path (LSH banding instead of all-pairs, broadcast of tiny query
sets, explode-then-aggregate instead of driver loops).
"""

from informixcdc_spark.operators.classify import nb_score, nb_train
from informixcdc_spark.operators.curation import (
    chunk_tokens,
    dsir_log_weights,
    dsir_select,
    write_zordered,
)
from informixcdc_spark.operators.dedup import (
    banding_recall,
    decontaminate_fuzzy,
    doc_line_dedup,
    plan_banding,
    duplicate_span_ranges,
    duplicate_spans,
    exact_dedup,
    line_dedup,
    lsh_candidate_pairs,
    minhash_bands,
    near_dup_verified_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from informixcdc_spark.operators.normalize import unicode_normalize
from informixcdc_spark.operators.ulm import ulm_encode, ulm_train
from informixcdc_spark.operators.similarity import brute_force_knn, lsh_bucket
from informixcdc_spark.operators.bpe import bpe_encode, bpe_train
from informixcdc_spark.operators.quantization import (
    ivfpq_search,
    pq_encode,
    pq_search_adc,
    pq_train,
    sq_encode,
    sq_search,
    sq_train,
)
from informixcdc_spark.operators.streaming_dedup import IncrementalDedupIndex
from informixcdc_spark.operators.streaming_ann import IncrementalAnnIndex

__all__ = [
    "duplicate_span_ranges",
    "duplicate_spans",
    "exact_dedup",
    "minhash_bands",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "near_dup_verified_pairs",
    "simhash",
    "brute_force_knn",
    "bpe_train",
    "bpe_encode",
    "pq_train",
    "pq_encode",
    "pq_search_adc",
    "ivfpq_search",
    "lsh_bucket",
    "IncrementalDedupIndex",
    "IncrementalAnnIndex",
    "nb_train",
    "nb_score",
    "chunk_tokens",
    "dsir_log_weights",
    "dsir_select",
    "write_zordered",
    "banding_recall",
    "decontaminate_fuzzy",
    "doc_line_dedup",
    "line_dedup",
    "plan_banding",
    "sq_train",
    "sq_encode",
    "sq_search",
    "unicode_normalize",
    "ulm_train",
    "ulm_encode",
]
