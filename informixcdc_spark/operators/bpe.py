"""Distributed byte-pair-encoding (BPE) vocabulary training.

Sennrich, Haddow, Birch, "Neural Machine Translation of Rare Words
with Subword Units" (ACL 2016): start from characters (plus an
end-of-word marker), repeatedly merge the most frequent adjacent
symbol pair. The tokenizer-training step of an LLM data pipeline — the
reference engine has no text subsystem (SURVEY §2.9 extension
surface).

The 100 TB shape is the classic word-frequency-table trick: the corpus
is scanned ONCE into (word, count) — the only corpus-sized shuffle —
and every merge iteration then runs on the vocab-sized table:

- pair counting is one exchange on (left, right) with map-side partial
  aggregation of count-weighted pairs;
- the winning pair arrives at the driver as ONE row
  (``orderBy.limit(1)`` plans TakeOrdered — no global sort);
- the merge rewrite is a pure JVM fold over each word's symbol array
  (greedy leftmost, non-overlapping) — no shuffle, no UDF.

Lineage is capped with a ``localCheckpoint`` every few merges —
without it, n_merges nested fold projections pile into one
ever-deeper plan and analysis time grows superlinearly.

``bpe_encode`` applies a trained merge list as stacked fold
projections: fine for the hundreds of merges a test vocabulary needs,
but per-merge column stacking is O(n_merges) plan depth and O(n_merges
× word_len) work per word. :func:`bpe_encode_arrow` is the production
path for 32k-merge vocabularies: ONE Arrow-batched ``mapInPandas``
stage with RANK-PRIORITY merging (repeatedly merge the lowest-rank
pair present — the apply-time algorithm of Sennrich's ``apply_bpe``
and GPT-2's encoder), whose per-word cost is O(word_len²) independent
of vocabulary size, plus an in-executor per-word memo so repeated
words (Zipf: most of any corpus) encode once per batch. On trained
merge lists the two encoders agree — a trained merge's components are
built by strictly earlier merges, so applying a later merge does not
re-create an earlier pair (only a hand-built merge list whose merged
STRINGS are reachable by two different merge paths can make the
orders diverge, and training's frequency ordering does not emit
those) — property-tested against each other on random trained
corpora and against the pure-Python reference at 600 merges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker, the classic '</w>' (distinguishes "est</w>" in
#: "widest" from "est" in "estimate")
EOW = "</w>"

#: cap lineage: re-materialize the word table every this many merges
_CHECKPOINT_EVERY = 8


def _word_symbols(word: Column) -> Column:
    """Initial symbol array: characters followed by the EOW marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def _merge_pair(sym: Column, a: str, b: str) -> Column:
    """Greedy leftmost non-overlapping merge of adjacent (a, b) into
    a+b — one JVM-side fold, no UDF. Overlaps resolve left-first:
    ('a','a','a') under ('a','a') gives ('aa','a'), because once the
    left pair merges, its right symbol is consumed."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """(_a, _b, _n) — count-weighted adjacent symbol pairs over a
    (_sym array<string>, _cnt) word table: THE distributed step of each
    merge iteration. One exchange on (_a, _b) with map-side partial
    aggregation (two HashAggregates around one Exchange — plan-pinned),
    so shuffle volume is distinct-pairs-per-task, not corpus pairs."""
    n = F.size("_sym")
    pairs = words.where(n >= 2).select(
        F.explode(
            F.zip_with(
                F.slice("_sym", 1, n - 1),
                F.slice("_sym", 2, n - 1),
                lambda l, r: F.struct(l.alias("_a"), r.alias("_b")),
            )
        ).alias("_p"),
        "_cnt",
    )
    return pairs.groupBy("_p._a", "_p._b").agg(F.sum("_cnt").alias("_n"))


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Returns the ordered merge list [(left, right), ...] — apply with
    :func:`bpe_encode`. Stops early when the best remaining pair's
    count-weighted frequency falls below ``min_freq`` (ties break
    lexicographically on (left, right) for run-to-run determinism,
    where the reference implementation is dict-order dependent).
    """
    words = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
            ).alias("_w")
        )
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(_word_symbols(F.col("_w")).alias("_sym"), "_cnt")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            bpe_pair_counts(words)
            .orderBy(F.col("_n").desc(), "_a", "_b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["_n"] < min_freq:
            break
        a, b = top[0]["_a"], top[0]["_b"]
        merges.append((a, b))
        words = words.select(
            _merge_pair(F.col("_sym"), a, b).alias("_sym"), "_cnt"
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            words = words.localCheckpoint(eager=False)
    return merges


def bpe_encode(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — the corpus segmented by a
    trained merge list (applied in training order, greedy leftmost per
    word, EOW markers kept on word-final tokens).

    One scan-fused projection: len(merges) stacked JVM folds per word.
    Suited to test/small vocabularies; see the module docstring for
    the production 32k-merge boundary.
    """
    sym = F.transform(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""),
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW))),
    )
    def _apply(a: str, b: str):
        # bind via factory: a default-arg lambda would change the
        # visible arity and PySpark picks the HOF form from it
        return lambda ws: _merge_pair(ws, a, b)

    for a, b in merges:
        sym = F.transform(sym, _apply(a, b))
    tokens = F.flatten(sym)
    return docs.select(
        F.col(id_col),
        tokens.alias("tokens"),
        F.size(tokens).alias("n_tokens"),
    )


def _encode_word(word: str, ranks: dict, merge_list: list) -> tuple:
    """Rank-priority BPE for one word (plain Python, runs inside the
    Arrow batch): repeatedly merge ALL greedy-leftmost occurrences of
    the lowest-rank adjacent pair present. For train-order-consistent
    merge lists this equals sequential application (see module
    docstring); cost is O(len²) independent of vocabulary size."""
    sym = list(word) + [EOW]
    while len(sym) >= 2:
        best = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = merge_list[best]
        out = []
        i = 0
        n = len(sym)
        while i < n:
            if i < n - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return tuple(sym)


def bpe_encode_arrow(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — the production encoder:
    same contract as :func:`bpe_encode`, but ONE Arrow-batched
    ``mapInPandas`` stage whose per-word cost does not grow with the
    merge count, so a 32k-merge vocabulary is as cheap per word as a
    32-merge one. Zero shuffles (a narrow map over the scan), per-word
    memoization inside each batch task (repeated words encode once),
    and the merge table ships once per executor via the closure."""
    import re

    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    merge_list = [tuple(m) for m in merges]
    # explicit ASCII class = Java regex \s (the trainer's F.split
    # semantics); Python re \s would also split Unicode whitespace,
    # producing words the trained merge table never saw
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def _run(batches):
        import pandas as pd

        memo: dict[str, tuple] = {}

        def enc(word):
            got = memo.get(word)
            if got is None:
                got = memo[word] = _encode_word(word, ranks, merge_list)
            return got

        for pdf in batches:
            toks = [
                [t for w in ws.split(text) if w for t in enc(w)]
                if text is not None
                else None
                for text in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [
                        None if t is None else len(t) for t in toks
                    ],
                }
            )

    id_type = dict(docs.select(id_col, text_col).dtypes)[id_col]
    return docs.select(id_col, text_col).mapInPandas(
        _run,
        schema=f"{id_col} {id_type}, tokens array<string>, n_tokens int",
    )
