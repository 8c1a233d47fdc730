"""Property-based BPE: for RANDOM corpora over a tiny alphabet, the
distributed trainer must learn exactly the merge sequence of a
pure-Python Sennrich reference (same greedy-leftmost rewrite, same
(-count, left, right) tiebreak), and the encoder must segment every
document identically. Derandomized like the other property suites."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from informixcdc_spark.operators.bpe import EOW
from tests.conftest import examples, iterations  # noqa: E402

_WORD = st.text(alphabet="abc", min_size=1, max_size=5)
_DOC = st.lists(_WORD, min_size=1, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _ref_train(texts, n_merges, min_freq=2):
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + [EOW])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_freq:
            break
        merges.append((a, b))
        nxt = Counter()
        for sym, c in vocab.items():
            nxt[tuple(_ref_merge(sym, a, b))] += c
        vocab = nxt
    return merges


def _ref_merge(sym, a, b):
    out = []
    for x in sym:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _ref_encode(text, merges):
    toks = []
    for w in text.split():
        sym = list(w) + [EOW]
        for a, b in merges:
            sym = _ref_merge(sym, a, b)
        toks += sym
    return toks


@settings(
    max_examples=examples(12),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS)
def test_bpe_train_and_encode_match_reference(spark, corpus):
    from informixcdc_spark.operators.bpe import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    merges = bpe_train(df, "text", n_merges=6)
    assert merges == _ref_train(corpus, 6), (merges, corpus)
    got = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_encode(df, "doc_id", "text", merges).collect()
    }
    for i, t in enumerate(corpus):
        want = _ref_encode(t, merges)
        assert got[i] == (want, len(want)), (i, t, got[i], want)


@settings(
    max_examples=examples(12),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS)
def test_bpe_arrow_encoder_matches_stacked_fold(spark, corpus):
    """The production rank-priority Arrow encoder must segment exactly
    like the stacked-fold path (and the pure-Python reference) under
    merges the trainer actually produces."""
    from informixcdc_spark.operators.bpe import bpe_encode_arrow

    merges = _ref_train(corpus, 6)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_encode_arrow(df, "doc_id", "text", merges).collect()
    }
    for i, t in enumerate(corpus):
        want = _ref_encode(t, merges)
        assert got[i] == (want, len(want)), (i, t, got[i], want)


def test_bpe_arrow_encoder_at_600_merges(spark):
    """The production boundary the stacked-fold path documents: a
    600-merge vocabulary (useless as a fold stack — 600 nested
    projections) encodes through ONE mapInPandas stage and matches the
    pure-Python sequential reference word for word."""
    from informixcdc_spark.operators.bpe import bpe_encode_arrow

    texts = []
    for i in range(26 * 26):
        w = chr(97 + i // 26) + chr(97 + i % 26)
        texts += [w] * (3 + (676 - i) % 7)
    corpus = [" ".join(texts[i::50]) for i in range(50)]
    merges = _ref_train(corpus, 600, min_freq=1)
    assert len(merges) == 600
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    enc = bpe_encode_arrow(df, "doc_id", "text", merges)
    # one Arrow stage over the scan: no exchange anywhere in the plan
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["doc_id"]: list(r["tokens"]) for r in enc.collect()}
    for i, t in enumerate(corpus):
        assert got[i] == _ref_encode(t, merges), i


def test_bpe_arrow_encoder_null_and_empty(spark):
    """Null text yields null tokens (the stacked-fold path's split-of-
    null semantics); empty and whitespace-only text yield zero tokens."""
    from informixcdc_spark.operators.bpe import bpe_encode_arrow

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "ab")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_encode_arrow(df, "doc_id", "text", [("a", "b")]).collect()
    }
    assert got[0] == (None, None)
    assert got[1] == ([], 0)
    assert got[2] == ([], 0)
    assert got[3] == (["ab", EOW], 2)
