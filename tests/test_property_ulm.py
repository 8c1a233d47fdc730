"""Property-based unigram-LM tokenizer: for RANDOM corpora over a tiny
alphabet, the distributed hard-EM trainer must produce exactly the
piece model of a pure-Python reference (same substring seed, same
(count desc, piece asc) ranking, same Viterbi tie rule, same coverage
floor), and the Arrow encoder must segment every document identically.
Derandomized like the other property suites."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from informixcdc_spark.operators.ulm import UlmModel, ulm_encode, ulm_train, ulm_viterbi
from tests.conftest import examples, iterations  # noqa: E402

_WORD = st.text(alphabet="abc", min_size=1, max_size=6)
_DOC = st.lists(_WORD, min_size=1, max_size=10).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _ref_viterbi(word, logp, max_len, floor):
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(max_len, i) + 1):
            piece = word[i - ln : i]
            lp = logp.get(piece)
            if lp is None:
                if ln > 1:
                    continue
                lp = floor
            s = best[i - ln] + lp
            if s > best[i]:
                best[i], back[i] = s, ln
    out, i = [], n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    return out[::-1]


def _ref_train(texts, vocab_size, n_iter, max_piece_len, seed_size, min_count):
    words = Counter(w for t in texts for w in t.split() if w)
    seed = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i : i + ln]] += c
    counts = {p: n for p, n in seed.items() if len(p) == 1}
    multi = sorted(
        (
            (p, n)
            for p, n in seed.items()
            if len(p) > 1 and n >= min_count
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    counts.update(dict(multi))

    def logp_of(c):
        total = float(sum(c.values()))
        return {p: math.log(n / total) for p, n in c.items()}

    logp = logp_of(counts)
    for _ in range(n_iter):
        floor = min(logp.values()) - math.log(2.0)
        used = Counter()
        for w, c in words.items():
            for piece in _ref_viterbi(w, logp, max_piece_len, floor):
                used[piece] += c
        counts = {
            p: used.get(p, 1 if len(p) == 1 else 0)
            for p in counts
            if len(p) == 1 or used.get(p, 0) > 0
        }
        logp = logp_of(counts)

    n_chars = sum(1 for p in counts if len(p) == 1)
    keep = sorted(
        ((p, n) for p, n in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, vocab_size - n_chars)]
    final = {p: n for p, n in counts.items() if len(p) == 1}
    final.update(dict(keep))
    return logp_of(final)


@settings(
    max_examples=examples(12),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS)
def test_ulm_train_matches_python_reference(spark, corpus):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    kw = dict(
        vocab_size=12, n_iter=2, max_piece_len=4, seed_size=16, min_count=2
    )
    got = ulm_train(df, "text", **kw)
    want = _ref_train(corpus, **kw)
    assert set(got.logp) == set(want)
    for p in want:
        assert got.logp[p] == pytest.approx(want[p], abs=0), p
    # encoder ≡ reference segmentation, and pieces re-join to the word
    enc = {
        r["doc_id"]: r["pieces"]
        for r in ulm_encode(df, "doc_id", "text", got).collect()
    }
    floor = got.floor_logp
    for i, t in enumerate(corpus):
        want_pieces = [
            p
            for w in t.split()
            if w
            for p in _ref_viterbi(w, want, kw["max_piece_len"], floor)
        ]
        assert enc[i] == want_pieces, (i, t)
        assert "".join(enc[i]) == "".join(w for w in t.split() if w)


def test_ulm_learns_frequent_words_as_single_pieces(spark):
    """The point of the model: a word frequent enough to earn its own
    piece segments as ONE piece, while a rare word falls back to
    smaller units."""
    rows = [(i, "internationalization is common here") for i in range(30)]
    rows += [(100, "zyxwv appears once")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = ulm_train(
        df, "text", vocab_size=80, n_iter=2, max_piece_len=20, seed_size=400
    )
    enc = {
        r["doc_id"]: r["pieces"]
        for r in ulm_encode(df, "doc_id", "text", model).collect()
    }
    assert "internationalization" in enc[0]
    assert len([p for p in enc[100] if p == "zyxwv"]) == 0


def test_ulm_viterbi_tie_prefers_shortest_final_piece():
    logp = {"a": math.log(0.25), "aa": math.log(0.0625)}
    # "aa" scores equal either way (p(aa) == p(a)²): tie keeps singles
    assert ulm_viterbi("aa", logp, 4, -99.0) == ["a", "a"]
    # strictly better multi-piece wins
    logp2 = {"a": math.log(0.25), "aa": math.log(0.5)}
    assert ulm_viterbi("aa", logp2, 4, -99.0) == ["aa"]


def test_ulm_encode_handles_oov_chars(spark):
    model = UlmModel(logp={"a": math.log(0.5), "b": math.log(0.5)}, max_piece_len=4)
    df = spark.createDataFrame([(0, "ab axb")], "doc_id long, text string")
    row = ulm_encode(df, "doc_id", "text", model).collect()[0]
    assert row["pieces"] == ["a", "b", "a", "x", "b"]
    assert row["n_pieces"] == 5


def test_ulm_encode_is_zero_shuffle(spark, sf_dir):
    from informixcdc_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = UlmModel(
        logp={c: math.log(1 / 26) for c in "abcdefghijklmnopqrstuvwxyz"},
        max_piece_len=4,
    )
    df = ulm_encode(docs, "doc_id", "text", model)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("MapInPandas") >= 1
    for node in ("Exchange", "Join", "HashAggregate", "Sort"):
        assert node not in plan, node


def test_ulm_train_rejects_empty_corpus(spark):
    df = spark.createDataFrame([(0, " "), (1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no words"):
        ulm_train(df, "text", vocab_size=8, n_iter=1)


def test_soft_expected_counts_matches_bruteforce():
    """Forward-backward posteriors ≡ brute-force enumeration over ALL
    segmentations (posterior-weighted piece usage), on every word up
    to length 5 over {a, b} under an asymmetric piece model."""
    from itertools import product

    from informixcdc_spark.operators.ulm import soft_expected_counts

    logp = {
        "a": math.log(0.3),
        "b": math.log(0.1),
        "ab": math.log(0.25),
        "ba": math.log(0.05),
        "aa": math.log(0.2),
        "aab": math.log(0.1),
    }
    floor = math.log(0.01)

    def brute(word):
        segs = []

        def rec(i, acc):
            if i == len(word):
                segs.append(list(acc))
                return
            for ln in range(1, min(3, len(word) - i) + 1):
                piece = word[i : i + ln]
                lp = logp.get(piece)
                if lp is None and len(piece) > 1:
                    continue
                rec(i + ln, acc + [piece])

        rec(0, [])
        weights = []
        for seg in segs:
            s = 0.0
            for p in seg:
                s += logp.get(p, floor)
            weights.append(math.exp(s))
        z = sum(weights)
        out = {}
        for seg, w in zip(segs, weights):
            for p in seg:
                out[p] = out.get(p, 0.0) + w / z
        return out

    for n in range(1, 6):
        for chars in product("ab", repeat=n):
            word = "".join(chars)
            got = soft_expected_counts(word, logp, 3, floor)
            want = brute(word)
            assert set(got) == set(want), word
            for p in want:
                assert got[p] == pytest.approx(want[p], rel=1e-9), (word, p)


def _ref_train_soft(
    texts, vocab_size, n_iter, max_piece_len, seed_size, min_count
):
    """Serial replica of ulm_train(em='soft'): same seed, same scaled-
    integer rounding per (word, piece), same sorted-order totals."""
    from informixcdc_spark.operators.ulm import (
        _SOFT_SCALE,
        soft_expected_counts,
    )

    words = Counter(w for t in texts for w in t.split() if w)
    seed = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i : i + ln]] += c
    counts = {p: n for p, n in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in seed.items() if len(p) > 1 and n >= min_count),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    counts.update(dict(multi))

    def logp_of(c):
        total = float(sum(n for _, n in sorted(c.items())))
        return {p: math.log(n / total) for p, n in c.items()}

    logp = logp_of(counts)
    for _ in range(n_iter):
        floor = min(logp.values()) - math.log(2.0)
        scaled = {}
        for w, c in words.items():
            for piece, post in soft_expected_counts(
                w, logp, max_piece_len, floor
            ).items():
                scaled[piece] = scaled.get(piece, 0) + int(
                    round(post * int(c) * _SOFT_SCALE)
                )
        used = {p: n / _SOFT_SCALE for p, n in scaled.items() if n > 0}
        counts = {
            p: used.get(p, 1 if len(p) == 1 else 0)
            for p in counts
            if len(p) == 1 or used.get(p, 0) > 0
        }
        logp = logp_of(counts)

    n_chars = sum(1 for p in counts if len(p) == 1)
    keep = sorted(
        ((p, n) for p, n in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, vocab_size - n_chars)]
    final = {p: n for p, n in counts.items() if len(p) == 1}
    final.update(dict(keep))
    return logp_of(final)


@settings(
    max_examples=examples(8),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS)
def test_ulm_train_soft_matches_python_reference(spark, corpus):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    kw = dict(
        vocab_size=12, n_iter=2, max_piece_len=4, seed_size=16, min_count=2
    )
    got = ulm_train(df, "text", em="soft", **kw)
    want = _ref_train_soft(corpus, **kw)
    assert set(got.logp) == set(want)
    for p in want:
        assert got.logp[p] == pytest.approx(want[p], abs=0), p


def test_ulm_train_rejects_bad_em_mode(spark):
    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="em must be"):
        ulm_train(df, "text", em="fuzzy")
