"""Distributed unigram-LM (SentencePiece-style) tokenizer training.

Kudo, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates" (ACL 2018) — the OTHER major
subword-tokenizer family next to BPE (`operators/bpe.py`): instead of
growing a vocabulary bottom-up by merges, start from a large seed
vocabulary of substrings and fit a unigram language model over pieces,
segmenting each word with the Viterbi-best decomposition and keeping
the pieces the model actually uses. The tokenizer-training step of an
LLM data pipeline — the reference engine has no text subsystem
(SURVEY §2.9 extension surface).

This implementation is the HARD-EM (Viterbi-EM) variant: the E-step
counts the pieces of each word's single best segmentation (weighted by
word frequency) rather than accumulating posterior fractions over all
segmentations. That keeps every count an INTEGER — the training loop
is bit-for-bit reproducible and property-testable against a pure-Python
reference with no float-accumulation caveats (the only floats are the
per-iteration log-probabilities, computed once per piece on the
driver's model-sized table and identical in any evaluation order).
Soft-EM changes WHICH pieces survive pruning only at the margin; the
operator's distributed shape is identical.

The 100 TB shape mirrors BPE's word-frequency-table trick — the corpus
is scanned ONCE into (word, count), the only corpus-sized shuffle, and
everything after runs on the word table:

- the seed pass and each E-step are ONE Arrow ``mapInPandas`` over the
  word table that emits per-batch PARTIAL piece counts (a dict per
  batch — Python-side map combine), followed by one vocab-bounded
  ``groupBy(piece).sum`` exchange;
- seed selection is a distributed top-k (``orderBy.limit`` plans
  TakeOrdered — no global sort), so the driver only ever collects
  ``seed_size`` rows; E-step collects are bounded by the current
  vocabulary (the quantizers' codebook convention);
- encoding is ONE zero-shuffle Arrow map with the final piece table
  shipped in the closure, per-word memoized per batch — the same
  production shape as :func:`bpe_encode_arrow`.

Determinism contract (mirrored exactly by the pure-Python reference in
``tests/test_property_ulm.py``): Viterbi scans piece lengths ascending
and replaces only on STRICTLY greater score, so ties prefer the
shortest final piece; seed and prune rank by (count desc, piece asc);
single characters are never pruned (coverage guarantee — any word is
always segmentable), with a floor count of 1 when an EM round leaves
them unused.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class UlmModel(NamedTuple):
    """A trained unigram tokenizer: piece → log-probability."""

    logp: dict[str, float]
    max_piece_len: int

    @property
    def floor_logp(self) -> float:
        """Score for out-of-vocabulary single characters at encode
        time (half the smallest trained count's mass)."""
        return min(self.logp.values()) - math.log(2.0)


def ulm_viterbi(
    word: str, logp: dict[str, float], max_piece_len: int, floor: float
) -> list[str]:
    """Best-scoring segmentation of ``word`` under the piece model.

    Dynamic program over end positions; lengths scan ascending and a
    candidate replaces the incumbent only when STRICTLY better, so tie
    scores keep the shortest final piece. Characters absent from the
    model segment as themselves at the ``floor`` score (coverage:
    every word has at least the all-singles decomposition).
    """
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(max_piece_len, i) + 1):
            piece = word[i - ln : i]
            lp = logp.get(piece)
            if lp is None:
                if ln > 1:
                    continue
                lp = floor
            s = best[i - ln] + lp
            if s > best[i]:
                best[i] = s
                back[i] = ln
    out: list[str] = []
    i = n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    out.reverse()
    return out


#: soft-EM expected counts are per-(word, piece) floats; each
#: contribution rounds to this many decimal places as a SCALED INTEGER
#: before the distributed sum, so partial aggregation order can never
#: move a bit (the module's decimal-sum convention, integer form)
_SOFT_SCALE = 1_000_000


def soft_expected_counts(
    word: str, logp: dict[str, float], max_piece_len: int, floor: float
) -> dict[str, float]:
    """Forward-backward posterior piece counts for one word — the
    SOFT E-step of Kudo's EM (expected usage over ALL segmentations,
    not just the Viterbi best). Pure Python, fixed iteration order, so
    the float arithmetic is reproducible anywhere.

    alpha[i] / beta[i] are log-sums over segmentations of the
    prefix/suffix; an edge (j → i) using ``piece`` contributes
    exp(alpha[j] + lp + beta[i] − alpha[n]) to that piece's expected
    count. OOV single characters participate at the ``floor`` score,
    like :func:`ulm_viterbi`.
    """
    n = len(word)
    NEG = -math.inf

    def lp_of(piece: str) -> float | None:
        got = logp.get(piece)
        if got is None and len(piece) == 1:
            return floor
        return got

    def ladd(a: float, b: float) -> float:
        if a == NEG:
            return b
        if b == NEG:
            return a
        hi, lo = (a, b) if a >= b else (b, a)
        return hi + math.log1p(math.exp(lo - hi))

    alpha = [0.0] + [NEG] * n
    for i in range(1, n + 1):
        for ln in range(1, min(max_piece_len, i) + 1):
            lp = lp_of(word[i - ln : i])
            if lp is not None:
                alpha[i] = ladd(alpha[i], alpha[i - ln] + lp)
    beta = [NEG] * n + [0.0]
    for j in range(n - 1, -1, -1):
        for ln in range(1, min(max_piece_len, n - j) + 1):
            lp = lp_of(word[j : j + ln])
            if lp is not None:
                beta[j] = ladd(beta[j], lp + beta[j + ln])
    z = alpha[n]
    out: dict[str, float] = {}
    if z == NEG:
        return out
    for j in range(n):
        for ln in range(1, min(max_piece_len, n - j) + 1):
            piece = word[j : j + ln]
            lp = lp_of(piece)
            if lp is None:
                continue
            post = math.exp(alpha[j] + lp + beta[j + ln] - z)
            if post > 0.0:
                out[piece] = out.get(piece, 0.0) + post
    return out


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, count) — the one corpus-sized pass; everything downstream
    is word-table-sized."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
            ).alias("_w")
        )
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def _piece_counts(words: DataFrame, counter) -> DataFrame:
    """(piece, n): Arrow map over the (word, count) table emitting
    per-batch PARTIAL counts (``counter(word) -> iterable[piece]``,
    each occurrence weighted by the word's count), then one
    vocab-bounded groupBy sum."""

    def _run(batches):
        import pandas as pd

        for pdf in batches:
            acc: dict[str, int] = {}
            for w, c in zip(pdf["_w"], pdf["_cnt"]):
                for piece in counter(w):
                    acc[piece] = acc.get(piece, 0) + int(c)
            yield pd.DataFrame(
                {"_piece": list(acc.keys()), "_n": list(acc.values())}
            )

    partial = words.select("_w", "_cnt").mapInPandas(
        _run, schema="_piece string, _n long"
    )
    return partial.groupBy("_piece").agg(F.sum("_n").alias("_n"))


def _piece_weights(words: DataFrame, weigher) -> DataFrame:
    """(piece, n): the soft-EM twin of :func:`_piece_counts` —
    ``weigher(word) -> dict[piece, float]`` posteriors, each
    word-count-weighted contribution rounded to a SCALED LONG
    (``_SOFT_SCALE``) before the per-batch partial sum, so the
    distributed aggregation is integer-exact regardless of partition
    or combine order."""

    def _run(batches):
        import pandas as pd

        for pdf in batches:
            acc: dict[str, int] = {}
            for w, c in zip(pdf["_w"], pdf["_cnt"]):
                for piece, post in weigher(w).items():
                    acc[piece] = acc.get(piece, 0) + int(
                        round(post * int(c) * _SOFT_SCALE)
                    )
            yield pd.DataFrame(
                {"_piece": list(acc.keys()), "_n": list(acc.values())}
            )

    partial = words.select("_w", "_cnt").mapInPandas(
        _run, schema="_piece string, _n long"
    )
    return partial.groupBy("_piece").agg(F.sum("_n").alias("_n"))


def ulm_train(
    docs: DataFrame,
    text_col: str,
    vocab_size: int = 200,
    n_iter: int = 2,
    max_piece_len: int = 6,
    seed_size: int = 2000,
    min_count: int = 2,
    em: str = "hard",
) -> UlmModel:
    """Fit a unigram piece model: substring seed vocabulary → ``n_iter``
    EM rounds → prune to ``vocab_size`` (single characters always
    survive). ``em='hard'`` (default) counts Viterbi-best pieces —
    integer counts, the module's bit-reproducibility story;
    ``em='soft'`` is the paper-exact forward-backward E-step
    (:func:`soft_expected_counts`), with every per-(word, piece)
    posterior contribution rounded to a scaled long
    (1e-6 granularity) before the distributed sum, so it is just as
    order-immune. Distributed shape is identical in both modes. See
    the module docstring for the rest of the contract."""
    if em not in ("hard", "soft"):
        raise ValueError(f"em must be 'hard' or 'soft', got {em!r}")
    words = _word_counts(docs, text_col).localCheckpoint(eager=False)

    def _substrings(w: str):
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                yield w[i : i + ln]

    # persisted: the char slice and the multi-piece top-k both read it,
    # and the substring explode should run once (released before EM)
    seed_counts = _piece_counts(words, _substrings).persist()
    chars = seed_counts.where(F.length("_piece") == 1)
    multi = (
        seed_counts.where(
            (F.length("_piece") > 1) & (F.col("_n") >= min_count)
        )
        .orderBy(F.col("_n").desc(), "_piece")
        .limit(seed_size)
    )
    rows = chars.unionByName(multi).collect()
    seed_counts.unpersist()
    counts = {r["_piece"]: r["_n"] for r in rows}
    if not counts:
        raise ValueError(
            "ulm_train: corpus has no words (empty or whitespace-only "
            f"{text_col!r}) — a unigram model cannot be fit; filter the "
            "input or check the text column"
        )

    def _logp_of(c: dict[str, float]) -> dict[str, float]:
        # totals accumulate in sorted-piece order: float sums (the soft
        # path) must not depend on dict insertion order, which follows
        # the nondeterministic collect order
        total = float(sum(n for _, n in sorted(c.items())))
        return {p: math.log(n / total) for p, n in c.items()}

    logp = _logp_of(counts)
    for _ in range(n_iter):
        floor = min(logp.values()) - math.log(2.0)
        lp, mx = dict(logp), max_piece_len

        if em == "hard":

            def _viterbi_pieces(w: str, _lp=lp, _mx=mx, _fl=floor):
                return ulm_viterbi(w, _lp, _mx, _fl)

            used = {
                r["_piece"]: r["_n"]
                for r in _piece_counts(words, _viterbi_pieces).collect()
            }
        else:

            def _fb_posteriors(w: str, _lp=lp, _mx=mx, _fl=floor):
                return soft_expected_counts(w, _lp, _mx, _fl)

            used = {
                r["_piece"]: r["_n"] / _SOFT_SCALE
                for r in _piece_weights(words, _fb_posteriors).collect()
                if r["_n"] > 0
            }
        # coverage floor: unused single chars stay at count 1; unused
        # multi-char pieces drop out of the model
        counts = {
            p: used.get(p, 1 if len(p) == 1 else 0)
            for p in counts
            if len(p) == 1 or used.get(p, 0) > 0
        }
        logp = _logp_of(counts)

    n_chars = sum(1 for p in counts if len(p) == 1)
    keep_multi = sorted(
        ((p, n) for p, n in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, vocab_size - n_chars)]
    final = {p: n for p, n in counts.items() if len(p) == 1}
    final.update(dict(keep_multi))
    return UlmModel(logp=_logp_of(final), max_piece_len=max_piece_len)


def ulm_encode(
    docs: DataFrame, id_col: str, text_col: str, model: UlmModel
) -> DataFrame:
    """(id, pieces array<string>, n_pieces) — Viterbi-segment the
    corpus under a trained model: ONE Arrow-batched zero-shuffle map
    (plan shape pinned in tests), the piece table rides the closure,
    repeated words memoize per batch."""
    import re

    logp, mx = dict(model.logp), model.max_piece_len
    floor = model.floor_logp
    # the explicit ASCII class matches Java regex \s (the trainer's
    # F.split semantics, non-UNICODE_CHARACTER_CLASS) — Python re \s is
    # Unicode-aware, so a bare r"\s+" would split U+00A0 etc. into
    # words the trainer never saw
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def _run(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def seg(word):
            got = memo.get(word)
            if got is None:
                got = memo[word] = ulm_viterbi(word, logp, mx, floor)
            return got

        for pdf in batches:
            pieces = [
                [p for w in ws.split(text) if w for p in seg(w)]
                if text is not None
                else None
                for text in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": pieces,
                    "n_pieces": [
                        None if p is None else len(p) for p in pieces
                    ],
                }
            )

    id_type = dict(docs.select(id_col, text_col).dtypes)[id_col]
    return docs.select(id_col, text_col).mapInPandas(
        _run,
        schema=f"{id_col} {id_type}, pieces array<string>, n_pieces int",
    )
