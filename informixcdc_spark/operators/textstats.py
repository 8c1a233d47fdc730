"""Text analysis operators: language ID, quality scoring, token stats,
document fingerprinting — the per-document filters of a training-data
pipeline. All pure column expressions (linear, no shuffle until the
final aggregate)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from informixcdc_spark.catalog import rebalance
from informixcdc_spark.functions.text import fingerprint, tokens

#: marker-token sets for the n-gram/stopword language-ID heuristic.
#: Deliberately tiny and deterministic (the fixture corpus is synthetic);
#: order doubles as the tie-break priority.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "fast", "slow"),
    "de": ("table", "row", "data"),
    "fr": ("join", "merge", "sort"),
    "es": ("query", "scan", "filter"),
    "zh": ("spark", "stream", "batch"),
}

STOPWORDS = ("the", "a", "of", "and", "to")


def _hits(tok: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in `words` (with multiplicity)."""
    return F.size(F.filter(tok, lambda t: t.isin(*words)))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_chars_norm, mean_token_len)."""
    tok = tokens(F.col(text_col))
    tok_lens = F.transform(tok, lambda t: F.length(t))
    total_len = F.aggregate(tok_lens, F.lit(0), lambda a, x: a + x)
    return rebalance(df).select(
        F.col(id_col),
        F.size(tok).cast("int").alias("n_tokens"),
        total_len.cast("int").alias("total_token_chars"),
        (total_len.cast("double") / F.size(tok)).alias("mean_token_len"),
    )


def quality_score_exprs(tok: Column) -> tuple[Column, Column, Column, Column]:
    """(n_tokens, stop_ratio, mean_token_len, score) column expressions
    over a tokens array — shared by :func:`quality_score` and composed
    pipelines that inline the gate (e21). The formula only divides
    integers derived from the text, so any engine reproduces it exactly."""
    n = F.size(tok)
    stop_ratio = _hits(tok, STOPWORDS).cast("double") / n
    tok_lens = F.transform(tok, lambda t: F.length(t))
    mean_len = (
        F.aggregate(tok_lens, F.lit(0), lambda a, x: a + x).cast("double") / n
    )
    len_band = (
        F.when(n < 20, 0.2).when(n <= 200, 1.0).otherwise(0.6)
    )
    score = (
        F.lit(0.4) * len_band
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * F.least(mean_len / 8, F.lit(1.0))
    )
    return n, stop_ratio, mean_len, score


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document quality: length band + stopword ratio + mean
    token length, combined into [0,1]."""
    n, stop_ratio, mean_len, score = quality_score_exprs(tokens(F.col(text_col)))
    return rebalance(df).select(
        F.col(id_col),
        n.cast("int").alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        mean_len.alias("mean_token_len"),
        score.alias("quality_score"),
        F.when(score >= 0.7, "keep").otherwise("drop").alias("verdict"),
    )


def lang_pred_expr(tok: Column) -> Column:
    """Predicted language as one column expression over a tokens array:
    marker-token hit counts per language, deterministic priority-order
    tie-break (first language with a maximal score wins)."""
    scores = {lang: _hits(tok, words) for lang, words in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lg] for lg in langs])
    pred = None
    for lg in reversed(langs):
        cond = scores[lg] == best
        pred = F.when(cond, lg) if pred is None else F.when(cond, lg).otherwise(pred)
    return pred


def lang_id(df: DataFrame, id_col: str, text_col: str, true_lang_col: str) -> DataFrame:
    """Predict language by marker-token hits; deterministic priority-order
    tie-break. Output keeps the labeled language for confusion analysis."""
    return rebalance(df).select(
        F.col(id_col),
        F.col(true_lang_col).alias("lang"),
        lang_pred_expr(tokens(F.col(text_col))).alias("pred_lang"),
    )


def doc_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint) — md5 of normalized content (exact-dup key)."""
    return rebalance(df).select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style within-document repetition signals.

    Per document: token count, distinct-token ratio, most-frequent-token
    fraction, and duplicate-2-gram fraction, plus a composite
    ``low_quality`` flag. The 2-gram ratios are linear array expressions
    (size / size-of-distinct); the per-token counts go through an
    explode + two-level hash aggregate whose shuffle carries one row per
    (doc, distinct token) — vocabulary-bounded per doc, never quadratic.
    Docs with zero tokens drop out (no signal to score).

    Extension operator (SURVEY §2.9) — the reference has no text surface;
    repetition filters are standard LLM-corpus quality gates (Gopher,
    Rae et al. 2021, §A1.1).
    """
    from informixcdc_spark.functions.text import word_shingles

    base = rebalance(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tok")
    )
    grams = base.select(
        F.col(id_col),
        F.size("_tok").alias("_n"),
        word_shingles(F.col("_tok"), 2).alias("_g2"),
    ).select(
        F.col(id_col),
        "_n",
        F.size("_g2").alias("_n2"),
        F.size(F.array_distinct("_g2")).alias("_n2d"),
    )
    tokc = (
        base.select(F.col(id_col), F.explode("_tok").alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_tokens"),
            F.count(F.lit(1)).alias("_ndist"),
            F.max("_c").alias("_top"),
        )
    )
    j = tokc.join(grams, id_col)
    distinct_ratio = F.col("_ndist").cast("double") / F.col("n_tokens")
    top_frac = F.col("_top").cast("double") / F.col("n_tokens")
    dup2 = F.when(
        F.col("_n2") > 0,
        F.lit(1.0) - F.col("_n2d").cast("double") / F.col("_n2"),
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col(id_col),
        F.col("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        top_frac.alias("top_token_frac"),
        dup2.alias("dup_2gram_frac"),
        (
            (distinct_ratio < 0.2) | (top_frac > 0.3) | (dup2 > 0.9)
        ).alias("low_quality"),
    )


#: Gopher "required words" (Rae et al. 2021 §A1.1): a doc must contain
#: at least two of these to pass rule 7.
GOPHER_REQUIRED = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules_exprs(
    tok: Column, text: Column
) -> tuple[Column, Column, Column, Column]:
    """Gopher quality-filter rule set (Rae et al. 2021 §A1.1) as PURE
    column expressions — ``(symbol_ratio, alpha_word_frac,
    gopher_failed, gopher_keep)``. Every signal is integer arithmetic
    over the text/token array divided once at the end, so any engine
    reproduces the doubles bit-for-bit, and the whole rule set fuses
    into the scan (zero shuffles at 100 TB).

    Rules: (1) 50 ≤ word count ≤ 100 000; (2) mean word length in
    [3, 10]; (3) symbol-to-word ratio ('#' chars + '…'-as-'...'
    occurrences) ≤ 0.1; (4) ≤ 90% of lines start with a bullet
    ('-', '*', '•'); (5) ≤ 30% of lines end with '...'; (6) ≥ 80% of
    words contain an alphabetic character; (7) ≥ 2 distinct required
    words present. ``gopher_failed`` counts failed rules;
    ``gopher_keep`` is true iff none failed.
    """
    n = F.size(tok)
    tok_lens = F.transform(tok, lambda t: F.length(t))
    mean_len = (
        F.aggregate(tok_lens, F.lit(0), lambda a, x: a + x).cast("double") / n
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda ln: ln.startswith("-")
                | ln.startswith("*")
                | ln.startswith("•"),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda ln: ln.endswith("..."))).cast("double")
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(tok, lambda t: t.rlike("[a-zA-Z]"))).cast("double") / n
    )
    req_hits = F.size(
        F.array_intersect(
            F.array_distinct(tok),
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED]),
        )
    )
    fails = [
        (n < 50) | (n > 100000),
        (mean_len < 3.0) | (mean_len > 10.0),
        symbol_ratio > 0.1,
        bullet_frac > 0.9,
        ellipsis_frac > 0.3,
        alpha_frac < 0.8,
        req_hits < 2,
    ]
    failed = sum((f.cast("int") for f in fails), start=F.lit(0))
    return (
        symbol_ratio,
        alpha_frac,
        failed,
        (failed == 0),
    )


def c4_rules_exprs(text: Column) -> tuple[Column, Column, Column, Column]:
    """C4 cleaning rule set (Raffel et al. 2020 §2.2, the T5 corpus
    filter) as PURE column expressions —
    ``(c4_kept_lines, c4_kept_line_frac, c4_n_sentences, c4_keep)``.
    Like :func:`gopher_rules_exprs`, every signal is integer
    arithmetic over the text divided once at the end, so any engine
    reproduces the doubles bit-for-bit and the whole rule set fuses
    into the scan (zero shuffles at 100 TB).

    Line rules — a line SURVIVES when it (1) ends in a terminal
    punctuation mark ('.', '!', '?', '"' — after rtrim), (2) holds at
    least 5 words, and (3) does not contain the word "javascript"
    (case-insensitive).  Page rules — the page is KEPT when it has at
    least 3 sentences (terminal-punctuation count as the sentence
    proxy), at least 3 surviving lines, and contains neither the
    phrase "lorem ipsum" (case-insensitive) nor a curly bracket
    ('{', C4's code marker).  The paper's fourth page rule — the
    "dirty word" blocklist — is a deployment-specific word list; the
    "lorem ipsum" phrase check is its structural stand-in here (same
    contains-scan shape; swap the literal for the real list in
    production).
    """
    lines = F.split(text, "\n")
    n_lines = F.size(lines)

    def _survives(ln: Column) -> Column:
        tail = F.rtrim(ln)
        words = F.filter(F.split(ln, " "), lambda w: w != "")
        return (
            (
                tail.endswith(".")
                | tail.endswith("!")
                | tail.endswith("?")
                | tail.endswith('"')
            )
            & (F.size(words) >= 5)
            & ~F.lower(ln).contains("javascript")
        )

    kept = F.size(F.filter(lines, _survives))
    n_sent = F.length(text) - F.length(F.translate(text, ".!?", ""))
    keep = (
        (n_sent >= 3)
        & (kept >= 3)
        & ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
    )
    return (
        kept.cast("int"),
        kept.cast("double") / n_lines,
        n_sent.cast("int"),
        keep,
    )


def repetition_exprs(tok: Column) -> tuple[Column, Column, Column, Column]:
    """(n_tokens, distinct_ratio, top_token_frac, dup_2gram_frac) as PURE
    column expressions over a tokens array — same values as
    :func:`repetition_stats`, zero shuffles.

    The most-frequent-token count folds over the SORTED array with a
    (prev, run, best) run-length accumulator: equal neighbors extend the
    run, the maximum run of a sorted array IS the top frequency. At
    100 TB this turns the repetition gate into a scan-fused map pass;
    the explode+agg formulation (kept for vocabulary-style consumers)
    pays a per-(doc, distinct-token) hash aggregate instead.
    Requires ``size(tok) >= 1`` (both formulations drop empty docs).
    """
    from informixcdc_spark.functions.text import word_shingles

    n = F.size(tok)
    srt = F.array_sort(tok)
    run0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_cnt = F.aggregate(srt, run0, _step, lambda acc: acc["best"])
    g2 = word_shingles(tok, 2)
    n2, n2d = F.size(g2), F.size(F.array_distinct(g2))
    dup2 = F.when(
        n2 > 0, F.lit(1.0) - n2d.cast("double") / n2
    ).otherwise(F.lit(0.0))
    distinct_ratio = F.size(F.array_distinct(tok)).cast("double") / n
    return n, distinct_ratio, top_cnt.cast("double") / n, dup2
