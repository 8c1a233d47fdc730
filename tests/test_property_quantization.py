"""Property-based PQ/ADC: for RANDOM integer-valued corpora whose
subvectors are drawn from small per-subspace palettes, codebooks built
from the palettes reconstruct every vector exactly — so ADC search must
be BIT-equal to full-vector brute force (integer doubles make the
per-subspace partial-dot fold associative exactly), and a pure-Python
reference pins the Spark top-k end to end. Derandomized like the CDC
property suite: a red run is a red run at commit time, not a lucky
seed.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from tests.conftest import examples, iterations  # noqa: E402

_SPLITS = [(0, 3), (3, 7)]  # D = 7, two uneven subspaces
_PALETTE = st.lists(  # per-subspace palette of distinct integer subvecs
    st.lists(st.integers(min_value=-4, max_value=4), min_size=3, max_size=3),
    min_size=1,
    max_size=4,
    unique_by=tuple,
)


def _brute_force_ref(vecs, queries, k):
    """Pure-Python exact cosine top-k with the operators' tiebreak
    (cosine desc, neighbor id asc) and NULL-on-zero-norm semantics,
    evaluated in the same double arithmetic."""
    out = []
    for qid, qv in queries:
        qn = math.sqrt(sum(float(x) * float(x) for x in qv))
        scored = []
        for nid, cv in vecs:
            if nid == qid:
                continue
            cn = math.sqrt(sum(float(x) * float(x) for x in cv))
            if qn > 0 and cn > 0:
                d = 0.0
                for a, b in zip(qv, cv):
                    d += float(a) * float(b)
                cos = d / (qn * cn)
            else:
                cos = None
            scored.append((nid, cos))
        # cosine desc with None (NULL) last, then id asc — the window
        # ORDER BY cosine DESC, neighbor_id semantics
        scored.sort(key=lambda t: (t[1] is None, -(t[1] or 0.0), t[0]))
        for rank, (nid, cos) in enumerate(scored[:k], start=1):
            out.append((qid, rank, nid, cos))
    return out


@settings(
    max_examples=examples(20),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pal0=_PALETTE,
    pal1=st.lists(
        st.lists(
            st.integers(min_value=-4, max_value=4), min_size=4, max_size=4
        ),
        min_size=1,
        max_size=4,
        unique_by=tuple,
    ),
    picks=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=2,
        max_size=16,
    ),
)
def test_adc_bit_equals_brute_force_when_reconstruction_exact(
    spark, pal0, pal1, picks
):
    from informixcdc_spark.operators.quantization import (
        pq_encode,
        pq_search_adc,
    )

    # corpus: vector i = pal0[p0 % len] ++ pal1[p1 % len] — every
    # subvector IS a codeword, so reconstruction is exact by build
    vecs = [
        (i, pal0[p0 % len(pal0)] + pal1[p1 % len(pal1)])
        for i, (p0, p1) in enumerate(picks)
    ]
    books = [
        {
            "lo": lo,
            "hi": hi,
            "centroids": [
                (c, [float(x) for x in v]) for c, v in enumerate(pal)
            ],
        }
        for (lo, hi), pal in zip(_SPLITS, [pal0, pal1])
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    queries = vecs[: min(3, len(vecs))]
    qdf = df.where(df.vec_id < len(queries))
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in pq_search_adc(qdf, pq_encode(df, books), books, k=3)
        .orderBy("query_id", "rank")
        .collect()
    ]
    want = _brute_force_ref(vecs, queries, k=3)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (g, w)
        if w[3] is None:
            assert g[3] is None, (g, w)
        else:
            # integer doubles: subspace-partial fold == full fold exactly
            assert g[3] == w[3], (g, w)


@settings(
    max_examples=examples(12),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-9, max_value=9), min_size=7, max_size=7
        ),
        min_size=1,
        max_size=12,
    ),
    pal0=_PALETTE,
    pal1=st.lists(
        st.lists(
            st.integers(min_value=-4, max_value=4), min_size=4, max_size=4
        ),
        min_size=1,
        max_size=4,
        unique_by=tuple,
    ),
)
def test_arrow_encoder_matches_literal_fold(spark, vecs, pal0, pal1):
    """The Arrow (numpy argmin) encoder must emit exactly the literal
    fold's codes — including tiebreaks (first minimum = lowest code id)
    — on arbitrary integer corpora (integer doubles make both distance
    sums exact, so equality is deterministic, ties included)."""
    from informixcdc_spark.operators.quantization import (
        pq_encode,
        pq_encode_arrow,
    )

    books = [
        {
            "lo": lo,
            "hi": hi,
            "centroids": [
                (c, [float(x) for x in v]) for c, v in enumerate(pal)
            ],
        }
        for (lo, hi), pal in zip(_SPLITS, [pal0, pal1])
    ]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows + [(len(rows), None)],  # null vector -> null codes, both paths
        "vec_id long, embedding array<float>",
    )
    lit = {
        r["vec_id"]: r["codes"] for r in pq_encode(df, books).collect()
    }
    arr = {
        r["vec_id"]: r["codes"] for r in pq_encode_arrow(df, books).collect()
    }
    assert lit == arr, (lit, arr)
