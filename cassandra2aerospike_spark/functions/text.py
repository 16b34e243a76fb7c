"""Text-analysis column expressions (north-star X4) — language ID,
quality scoring, token statistics, fingerprinting.

All built from JVM-side `pyspark.sql.functions` (no Python UDFs in the
hot path): at 100 TB these run inside whole-stage codegen on the scan.
Every expression has an exact SQL equivalent so the DuckDB oracles can
replicate it (queries/text_q.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword lexicons (public, standard closed-class
# words).  Deterministic language ID = argmax of stopword hit-rate.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "de", "un", "une", "est", "que"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text, empty-safe."""
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != F.lit(""))


def word_tokens_bpe_ish(text: Column) -> Column:
    """BPE-ish subword proxy: split on word boundaries keeping punctuation
    as its own token (the regex most tokenizers pre-split with)."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"[^a-z0-9]+"), lambda x: x != F.lit("")
    )


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_hits(toks: Column, lang: str) -> Column:
    """Count of tokens (with multiplicity) in the language's lexicon."""
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))


def cjk_chars(text: Column) -> Column:
    """Count of CJK-unified-ideograph characters (zh signal)."""
    return F.length(F.regexp_replace(text, "[^一-鿿]", ""))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    scores = {
        lang: stopword_hits(toks, lang).cast("double") / n for lang in STOPWORDS
    }
    scores["zh"] = cjk_chars(text).cast("double") / F.greatest(
        F.length(text), F.lit(1)
    ).cast("double")
    return scores


def lang_id(text: Column) -> Column:
    """Deterministic argmax over language scores; ties break by language
    code ascending; all-zero scores -> 'und'."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(scores)
        ]
    )
    # pick the FIRST language (ascending code order) achieving the max score
    max_score = F.array_max(F.transform(pairs, lambda p: p["score"]))
    first_best = F.filter(pairs, lambda p: p["score"] == max_score)[0]["lang"]
    return F.when(max_score <= 0, F.lit("und")).otherwise(first_best)


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality features; the composite score is a fixed
    IEEE expression tree so it is bit-identical across engines."""
    toks = tokens(text)
    n_tok = F.size(toks).cast("double")
    n_char = F.length(text).cast("double")
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    mean_word_len = (
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double"))
        / safe_tok
    )
    stop_ratio = stopword_hits(toks, "en").cast("double") / safe_tok
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / safe_tok
    return {
        "n_chars_f": n_char,
        "n_tokens_f": n_tok,
        "mean_word_len": mean_word_len,
        "stop_ratio": stop_ratio,
        "distinct_ratio": distinct_ratio,
    }


def quality_score(text: Column) -> Column:
    f = quality_features(text)
    return (
        F.least(f["n_tokens_f"] / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + f["stop_ratio"] * F.lit(0.3)
        + f["distinct_ratio"] * F.lit(0.3)
    )


def gopher_rules(text: Column) -> dict[str, Column]:
    """Gopher-style document-quality rules (the public repetition/quality
    heuristics from the Gopher paper, Rae et al. 2021 §A1.1): word-count
    bounds, mean-word-length bounds, symbol-to-word ratio, alphabetic-word
    fraction, minimum stop-word hits, bullet-line and ellipsis-line
    fractions.  Every rule is evaluated with INTEGER cross-multiplication
    (e.g. `10*n_symbols <= n_tokens` instead of `ratio <= 0.1`), so the
    booleans are integer-exact in any engine — no float thresholds to
    drift."""
    toks = tokens(text)
    n_tok = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t).cast("long")
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    n_hash = (F.length(text) - F.length(F.replace(text, F.lit("#")))).cast("long")
    n_ell = (
        (F.length(text) - F.length(F.replace(text, F.lit("...")))) / F.lit(3)
    ).cast("long")
    stops = stopword_hits(toks, "en").cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]"))
    ).cast("long")
    n_ell_lines = F.size(F.filter(lines, lambda l: F.rtrim(l).endswith("..."))).cast(
        "long"
    )
    return {
        "n_tokens": n_tok,
        "r_word_count": ((n_tok >= 50) & (n_tok <= 100_000)).cast("int"),
        "r_mean_word_len": ((3 * n_tok <= sum_len) & (sum_len <= 10 * n_tok)).cast("int"),
        "r_symbol_ratio": (10 * (n_hash + n_ell) <= n_tok).cast("int"),
        "r_alpha_words": (5 * n_alpha >= 4 * n_tok).cast("int"),
        "r_stopwords": (stops >= 2).cast("int"),
        "r_bullet_lines": (10 * n_bullet <= 9 * n_lines).cast("int"),
        "r_ellipsis_lines": (10 * n_ell_lines <= 3 * n_lines).cast("int"),
    }


CLF_FP = 256  # fixed-point unit (POWER OF TWO: /FP is exact in doubles)
CLF_CLIP = 1 << 20  # error clip bounding every gradient term
CLF_ROUNDS = 24  # full-batch GD rounds
CLF_LR_SHIFT = 1  # learning rate 1 / 2^shift
CLF_THRESHOLD = 136  # keep iff score_fp >= threshold (FP-scaled, 136/256)


def classifier_features(text: Column) -> dict[str, Column]:
    """INTEGER feature vector + weak label for the trained quality
    classifier (model-assisted filtering, the FineWeb/CCNet move:
    distill a heuristic gate into a smooth scorer).  Everything is
    fixed-point int64 so the whole training loop is exact in any
    engine: x0 bias, x1 capped token count, x2 stopword ratio, x3
    alphabetic-word ratio, x4 mean word length (/16), x5 bullet-line
    ratio, x6 symbol ratio — each ratio as floor(FP*num/den) on
    non-negative ints — and the label y = FP * gopher_keep (the same
    seven integer-exact Gopher rules as `gopher_rules`)."""
    toks = tokens(text)
    n_tok = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t).cast("long")
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    n_hash = (F.length(text) - F.length(F.replace(text, F.lit("#")))).cast("long")
    n_ell = (
        (F.length(text) - F.length(F.replace(text, F.lit("...")))) / F.lit(3)
    ).cast("long")
    stops = stopword_hits(toks, "en").cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]"))
    ).cast("long")
    n_ell_lines = F.size(
        F.filter(lines, lambda l: F.rtrim(l).endswith("..."))
    ).cast("long")
    safe_tok = F.greatest(n_tok, F.lit(1).cast("long"))
    safe_lines = F.greatest(n_lines, F.lit(1).cast("long"))
    fp = F.lit(CLF_FP).cast("long")

    def ratio(num, den):
        # floor(FP*num/den), non-negative ints: double division of
        # exact int64s then floor is the mathematical floor here
        return F.floor(fp * num / den).cast("long")

    keep = (
        (n_tok >= 50) & (n_tok <= 100_000)
        & (3 * n_tok <= sum_len) & (sum_len <= 10 * n_tok)
        & (10 * (n_hash + n_ell) <= n_tok)
        & (5 * n_alpha >= 4 * n_tok)
        & (stops >= 2)
        & (10 * n_bullet <= 9 * n_lines)
        & (10 * n_ell_lines <= 3 * n_lines)
    )
    return {
        "x0": fp,
        "x1": F.least(n_tok, F.lit(256).cast("long")),
        "x2": ratio(stops, safe_tok),
        "x3": ratio(n_alpha, safe_tok),
        "x4": F.least(ratio(sum_len, safe_tok * 16), fp),
        "x5": ratio(n_bullet, safe_lines),
        "x6": F.least(ratio(n_hash + n_ell, safe_tok), fp),
        "y": keep.cast("long") * fp,
    }


CLF_FEATS = ["x0", "x1", "x2", "x3", "x4", "x5", "x6"]


def train_quality_classifier(
    feats: "DataFrame",
    rounds: int = CLF_ROUNDS,
    lr_shift: int = CLF_LR_SHIFT,
) -> list[int]:
    """Distributed full-batch gradient descent on the integer feature
    frame — linear model, squared loss, EVERY quantity integer-exact:

        pred_i = floor(sum_j w_j*x_ij / FP)          (FP = 2^8, exact)
        err_i  = clip(pred_i - y_i, ±CLF_CLIP)
        grad_j = sum_i err_i * x_ij                  (DECIMAL(38,0) sum)
        w_j   -= floor(grad_j / (n * FP * 2^lr_shift))

    Integer sums are ASSOCIATIVE, so the per-round aggregation is
    order-free — any partitioning, any map-side combine, bit-identical
    results on one core or a thousand executors (the property float
    GD fundamentally lacks).  The only driver-side state is the weight
    vector (7 ints) — the model, not data — exactly the k-means
    codebook contract.  Each round is one narrow projection + one
    hash-agg over a persisted frame: at 100 TB that's `rounds` cheap
    scans of an 8-column int frame, the textbook distributed-GD shape.
    """
    n = feats.count()
    b = (n * CLF_FP) << lr_shift
    w = [0] * len(CLF_FEATS)
    for _ in range(rounds):
        dot = sum(F.lit(int(wj)) * F.col(x) for wj, x in zip(w, CLF_FEATS))
        pred = F.floor(dot / F.lit(CLF_FP)).cast("long")
        err = F.greatest(
            F.least(pred - F.col("y"), F.lit(CLF_CLIP)), F.lit(-CLF_CLIP)
        )
        sums = feats.select(
            *[
                F.sum((err * F.col(x)).cast("decimal(38,0)")).alias(x)
                for x in CLF_FEATS
            ]
        ).first()
        w = [wj - int(sums[j]) // b for j, wj in enumerate(w)]
    return w


def _mode_run(sorted_arr: Column) -> Column:
    """(count, value) of the most frequent element of a SORTED array,
    ties broken to the smallest value — computed as the longest run, via
    one in-row fold (no explode, no shuffle).  Strictly-greater update
    keeps the FIRST (= smallest, array is ascending) run on count ties."""
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best_cnt"), F.lit("").alias("best_val"),
    )

    def step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        better = run > acc["best_cnt"]
        return F.struct(
            g.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(acc["best_cnt"]).alias("best_cnt"),
            F.when(better, g).otherwise(acc["best_val"]).alias("best_val"),
        )

    acc = F.aggregate(sorted_arr, init, step)
    return F.struct(acc["best_cnt"].alias("cnt"), acc["best_val"].alias("val"))


def _dup_run_chars(sorted_arr: Column) -> Column:
    """Σ count·length(value) over elements of a SORTED array occurring
    more than once — the 'characters inside duplicated n-grams' measure,
    as one in-row fold."""
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("acc"),
    )

    def step(acc, g):
        closing = (g != acc["prev"]) & (acc["run"] >= 2)
        flushed = F.when(
            closing, acc["acc"] + acc["run"] * F.length(acc["prev"]).cast("long")
        ).otherwise(acc["acc"])
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(g.alias("prev"), run.alias("run"), flushed.alias("acc"))

    def finish(acc):
        return F.when(
            acc["run"] >= 2, acc["acc"] + acc["run"] * F.length(acc["prev"]).cast("long")
        ).otherwise(acc["acc"])

    return F.aggregate(sorted_arr, init, step, finish)


def ngrams_of(toks: Column, n: int) -> Column:
    """Word n-grams of a token array (space-joined, position-ordered).
    Guarded for short arrays: F.sequence(n, size) REVERSES when
    size < n (Spark auto-negative step), producing invalid slice
    starts — caught by the hypothesis property test."""
    grams = F.transform(
        F.sequence(F.lit(n), F.size(toks)),
        lambda i: F.array_join(F.slice(toks, i - (n - 1), n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_rules(text: Column) -> dict[str, Column]:
    """Gopher-style REPETITION rules (Rae et al. 2021 §A1.1, the other
    half of gopher_rules): duplicate-line fraction, top word-2-gram
    character fraction, duplicated word-5-gram character fraction.  All
    computed IN-ROW (sorted-array run folds — no explode, no shuffle:
    the whole filter runs inside the scan stage at any scale) and
    compared with integer cross-multiplication."""
    toks = tokens(text)
    n_chars = F.length(text).cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    n_dup_lines = (n_lines - F.size(F.array_distinct(lines))).cast("long")
    g2 = _mode_run(F.array_sort(ngrams_of(toks, 2)))
    top2_chars = g2["cnt"] * F.length(g2["val"]).cast("long")
    dup5_chars = _dup_run_chars(F.array_sort(ngrams_of(toks, 5)))
    return {
        "n_chars": n_chars,
        "top2_cnt": g2["cnt"],
        "dup5_chars": dup5_chars,
        # <= 30% duplicate lines; top 2-gram <= 20% of chars;
        # duplicated 5-grams <= 15% of chars (Gopher thresholds)
        "r_dup_lines": (10 * n_dup_lines <= 3 * n_lines).cast("int"),
        "r_top_2gram": (5 * top2_chars <= n_chars).cast("int"),
        "r_dup_5gram": (20 * dup5_chars <= 3 * n_chars).cast("int"),
    }


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (md5 is bit-identical across engines; the hex string is the id)."""
    return F.md5(F.array_join(tokens(text), " "))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles (distinct), the unit for Jaccard/MinHash.

    PERF: only use this directly when `text` is consumed once.  The
    transform lambda references `toks` per element, and higher-order
    lambdas are interpreted — if Catalyst inlines the tokenize expression
    here (CollapseProject), the regex split re-runs for EVERY shingle
    position (~20× slower).  For pipelines, tokenize behind an exchange
    first and call `shingles_of` on the materialized array column
    (dedup.shingle_sets does this).
    """
    return shingles_of(tokens(text), k)


def shingles_of(toks: Column, k: int = 3) -> Column:
    """Word k-gram shingles from an already-materialized token array."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
        )
    )
