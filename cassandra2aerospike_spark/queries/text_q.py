"""Text-analysis queries (north-star X4) over the documents fixture, each
with a DuckDB oracle replicating the exact expression tree
(functions/text.py documents the conventions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..sources import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def q_text_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish subword proxy."""
    d = _docs(spark, sf_dir)
    toks = X.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(X.word_tokens_bpe_ish(F.col("text"))).cast("long").alias("n_bpe"),
        (
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double"))
            / F.greatest(F.size(toks), F.lit(1)).cast("double")
        ).alias("mean_word_len"),
    )


def q_text_quality(spark, sf_dir):
    """Quality scoring: stopword/distinct ratios + composite score."""
    d = _docs(spark, sf_dir)
    f = X.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        f["stop_ratio"].alias("stop_ratio"),
        f["distinct_ratio"].alias("distinct_ratio"),
        X.quality_score(F.col("text")).alias("quality_score"),
    )


def q_text_gopher_rules(spark, sf_dir):
    """Gopher-style quality FILTER (the decision a pretraining corpus
    pipeline actually materializes): per-document rule booleans +
    keep/drop verdict, all integer-exact (functions/text.gopher_rules)."""
    d = _docs(spark, sf_dir)
    r = X.gopher_rules(F.col("text"))
    rules = [k for k in r if k.startswith("r_")]
    keep = None
    for k in rules:
        keep = r[k] if keep is None else keep * r[k]
    return d.select(
        "doc_id",
        r["n_tokens"].alias("n_tokens"),
        *[r[k].alias(k) for k in rules],
        keep.alias("gopher_keep"),
    )


def q_text_quality_classifier(spark, sf_dir):
    """MODEL-ASSISTED quality filtering (round 10) — the modern corpus
    move (CCNet's fastText gate, FineWeb-Edu's trained scorer): distill
    the integer-exact Gopher gate into a TRAINED linear scorer, entirely
    distributed, entirely integer arithmetic.  Features + weak labels
    (functions/text.classifier_features) feed CLF_ROUNDS rounds of
    full-batch gradient descent whose per-round aggregation is an
    associative integer sum — order-free, so bit-identical under any
    partitioning (functions/text.train_quality_classifier) — and the
    learned weights score every document.  The oracle RE-RUNS THE WHOLE
    TRAINING as unrolled chained CTEs (the BPE-train pattern): same
    features, same 24 rounds, same floor-div updates, HUGEINT sums —
    cross-engine equality proves the distributed training loop exact,
    not just the final scoring pass.  Output: per-doc weak label,
    FP-scaled model score, and the keep/drop decision at
    CLF_THRESHOLD."""
    d = _docs(spark, sf_dir)
    fs = X.classifier_features(F.col("text"))
    feats = d.select(
        "doc_id", *[fs[x].alias(x) for x in X.CLF_FEATS], fs["y"].alias("y")
    ).persist()
    w = X.train_quality_classifier(feats)
    dot = None
    for wj, x in zip(w, X.CLF_FEATS):
        term = F.lit(int(wj)) * F.col(x)
        dot = term if dot is None else dot + term
    score = F.floor(dot / F.lit(X.CLF_FP)).cast("long")
    return feats.select(
        "doc_id",
        (F.col("y") / F.lit(X.CLF_FP)).cast("int").alias("label_keep"),
        score.alias("score_fp"),
        (score >= F.lit(X.CLF_THRESHOLD)).cast("int").alias("keep_pred"),
    )


def q_text_repetition_rules(spark, sf_dir):
    """Gopher repetition filters (dup-line / top-2-gram / dup-5-gram
    character fractions) — computed entirely in-row via sorted-array run
    folds (functions/text.repetition_rules): zero shuffles, so the
    filter rides the scan stage at 100 TB."""
    d = _docs(spark, sf_dir)
    r = X.repetition_rules(F.col("text"))
    return d.select(
        "doc_id",
        r["n_chars"].alias("n_chars"),
        r["top2_cnt"].alias("top2_cnt"),
        r["dup5_chars"].alias("dup5_chars"),
        r["r_dup_lines"].alias("r_dup_lines"),
        r["r_top_2gram"].alias("r_top_2gram"),
        r["r_dup_5gram"].alias("r_dup_5gram"),
        (r["r_dup_lines"] * r["r_top_2gram"] * r["r_dup_5gram"]).alias("rep_keep"),
    )


def q_text_lang_id(spark, sf_dir):
    """Language ID: stopword-ratio argmax + CJK char ratio (deterministic
    tie-break by language code)."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", X.lang_id(F.col("text")).alias("pred_lang"))


def q_text_fingerprint(spark, sf_dir):
    """Document fingerprint (md5 of normalized text) + shingle count."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        X.fingerprint(F.col("text")).alias("fp"),
        F.size(X.shingles(F.col("text"), 3)).cast("long").alias("n_shingles"),
    )


def q_text_term_freq(spark, sf_dir):
    """Corpus term frequency: explode + count + deterministic top-50."""
    d = _docs(spark, sf_dir)
    tf = (
        d.select(F.explode(X.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    return tf.orderBy(F.col("freq").desc(), F.col("token")).limit(50)


def q_text_pack_sequences(spark, sf_dir):
    """Sequence PACKING for training (the op that turns a document corpus
    into fixed-token-budget training sequences): documents are sharded by
    hash (so packing parallelizes — one window per shard, never a global
    sort), ordered deterministically within the shard, and assigned
    seq_id = floor(cumulative_tokens_before / budget) — streaming
    packing where a document overflowing the budget opens the next
    sequence.  Integer-exact; budget 2048 whitespace tokens."""
    budget = 2048
    d = _docs(spark, sf_dir)
    n_tok = F.size(X.tokens(F.col("text"))).cast("long")
    shard = (F.col("doc_id") % 8).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = d.select("doc_id", shard.alias("shard"), n_tok.alias("n_tokens"))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        cum_before.alias("cum_before"),
        F.floor(cum_before / budget).cast("long").alias("seq_id"),
        (cum_before % budget).cast("long").alias("seq_offset"),
    )


def q_sample_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment by content-independent key
    hash (md5 bucket): reproducible across engines, runs and partitionings
    — the sampling/split primitive a training pipeline needs (Spark's
    df.sample is partition-order-dependent, so it cannot be the split of
    record).  80/10/10 by the first 4 hex digits of md5(doc_id)."""
    d = _docs(spark, sf_dir)
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int")
    split = (
        F.when(bucket < 52429, "train")   # 0.8 * 65536
        .when(bucket < 58982, "val")      # 0.9 * 65536
        .otherwise("test")
    )
    return d.select("doc_id", bucket.alias("bucket"), split.alias("split"))


def q_sample_global_shuffle(spark, sf_dir):
    """GLOBAL DETERMINISTIC SHUFFLE (round 13, X-family): writing
    pretraining shards needs a REPRODUCIBLE global permutation of the
    corpus — `orderBy(rand())` / `df.sample` are partition-order-
    dependent, so the pipeline standard is a seeded hash order.  Each
    document's shuffle key is the first 60 bits of md5(seed || doc_id);
    shard = key mod n_shards (8), position = rank within the shard by
    (key, doc_id).  Any epoch, any cluster size, any partitioning
    reproduces the identical (shard, pos) layout.

    Scale shape: ONE exchange — the per-shard rank window repartitions
    by shard and sorts by key, exactly the shuffle a 100 TB shard
    writer has to pay anyway (it IS the shuffle); everything upstream
    is in-row hashing.  At 1000 executors use n_shards >= executors
    and the window never sees skew beyond corpus/n_shards."""
    d = _docs(spark, sf_dir)
    n_shards = 8
    h = F.md5(F.concat(F.lit("shuf42|"), F.col("doc_id").cast("string")))
    hkey = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    keyed = d.select(
        "doc_id",
        hkey.alias("hkey"),
        (hkey % n_shards).cast("int").alias("shard"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("hkey", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("int"))
        .select("doc_id", "shard", "pos")
    )


def q_agg_countmin_heavy_hitters(spark, sf_dir):
    """COUNT-MIN SKETCH heavy hitters (round 13, late — the classic
    100 TB frequency sketch, Cormode & Muthukrishnan 2005): token
    frequencies folded into a d=4 x w=256 integer counter matrix (four
    md5-derived hash rows), heavy hitters estimated as the MIN over
    the four bucket counters.  At corpus scale the sketch is the ONLY
    thing that fits — 1024 integers summarize any number of tokens —
    and the overestimate property (est >= true, never under) is what
    makes it safe for hot-key/skew detection.  The row reports the
    top-20 true-frequency tokens with their true and estimated counts
    plus the never-underestimates flag; everything is integer md5
    arithmetic, so the whole sketch build + query replays exactly in
    DuckDB (est is deterministic — not approximate-vs-approximate but
    the SAME sketch on both engines).

    Scale shape: one token explode -> (a) the d x w sketch via a
    1024-group partial agg (map-side combined, broadcastable), (b) the
    top-20 true counts; the estimate join touches 20 x 4 rows."""
    d = _docs(spark, sf_dir)
    toks = d.select(F.explode(X.tokens(F.col("text"))).alias("tok"))

    def bucket(row: int):
        h = F.md5(F.concat(F.lit(f"cms{row}|"), F.col("tok")))
        return (
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % 256
        ).cast("int")

    rows = [
        toks.select(F.lit(r).alias("d"), bucket(r).alias("bucket"))
        for r in range(4)
    ]
    from functools import reduce as _reduce

    cms = (
        _reduce(lambda a, b: a.unionAll(b), rows)
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "tok")
        .limit(20)
    )
    probes = top
    for r in range(4):
        probes = probes.withColumn(f"b{r}", bucket(r))
    est = probes
    for r in range(4):
        cr = cms.where(F.col("d") == r).select(
            F.col("bucket").alias(f"b{r}"), F.col("cnt").alias(f"c{r}")
        )
        est = est.join(F.broadcast(cr), f"b{r}")
    return est.select(
        "tok",
        "true_cnt",
        F.least("c0", "c1", "c2", "c3").alias("est_cnt"),
        (
            F.least("c0", "c1", "c2", "c3") >= F.col("true_cnt")
        ).cast("int").alias("never_under"),
    )


def q_text_collocations(spark, sf_dir):
    """COLLOCATION EXTRACTION (round 13, late — X4): window-4 token
    co-occurrence counts scored by an integer PMI proxy — the
    word2vec-style corpus statistic embedding/data-analysis pipelines
    compute (which word pairs co-occur far above chance).  Pairs come
    from IN-ROW zips of the token array with its offset-1..4 tails
    (unordered: least/greatest canonicalization; self-pairs dropped),
    so no position ever crosses an exchange; counts are two map-side-
    combining groupBys; pmi_bp = cnt_ab * N * 1e6 div (cnt_a * cnt_b)
    stays pure integer (log-free, like the BM25 odds-idf move), so the
    top-20 ranking hash-matches exactly.  Min support 5 keeps the
    output the heavy tail a 100 TB corpus run would actually emit."""
    d = _docs(spark, sf_dir)
    t = d.select(X.tokens(F.col("text")).alias("t"))
    pair_arrays = [
        F.expr(
            f"zip_with(slice(t, 1, greatest(0, size(t)-{k})),"
            f" slice(t, {k + 1}, greatest(0, size(t)-{k})),"
            " (a, b) -> struct(least(a, b) AS w1, greatest(a, b) AS w2))"
        )
        for k in (1, 2, 3, 4)
    ]
    pairs = (
        t.select(F.explode(F.flatten(F.array(*pair_arrays))).alias("p"))
        .where(F.col("p.w1") != F.col("p.w2"))
        .select("p.w1", "p.w2")
    )
    toks = d.select(F.explode(X.tokens(F.col("text"))).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    n_tot = toks.agg(F.count("*").alias("n"))
    co = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt_ab"))
        .where(F.col("cnt_ab") >= 5)
    )
    scored = (
        co.join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "w1",
            "w2",
            "cnt_ab",
            F.expr("cnt_ab * n * 1000000 div (c_a * c_b)").alias("pmi_bp"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pmi_bp").desc(), "w1", "w2")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 20)
        .select("w1", "w2", "cnt_ab", F.col("pmi_bp").cast("long").alias("pmi_bp"), "rank")
    )


def q_text_decontaminate(spark, sf_dir):
    """Benchmark DECONTAMINATION — the word-n-gram-overlap filter every
    pretraining pipeline runs before training: flag corpus documents
    sharing too many 5-grams with a held-out eval set (here the
    deterministic pseudo-benchmark ``doc_id % 50 == 0``).

    Scale shape: the benchmark side is SMALL BY CONTRACT (eval suites are
    thousands of documents vs a 100 TB corpus), so its distinct-gram set
    broadcasts; the corpus side explodes its in-row distinct grams into a
    broadcast hash join that keeps only hits — the full corpus gram
    stream never crosses an exchange — and one doc_id aggregation counts
    them.  Contamination is integer-exact: ``10 * hits > grams`` (>10%
    distinct-gram overlap)."""
    d = _docs(spark, sf_dir)
    grams5 = X.shingles_of(X.tokens(F.col("text")), 5)
    corpus = d.select("doc_id", F.size(grams5).alias("n_grams"), grams5.alias("grams"))
    bench = (
        corpus.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    hits = (
        corpus.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("hits"))
    )
    n_hit = F.coalesce(F.col("hits"), F.lit(0)).cast("long")
    return (
        corpus.drop("grams")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            n_hit.alias("n_hit"),
            (F.col("doc_id") % 50 == 0).alias("is_benchmark"),
            ((n_hit * 10 > F.col("n_grams")) & (F.col("n_grams") > 0)).alias(
                "contaminated"
            ),
        )
    )


def q_sample_stratified(spark, sf_dir):
    """Stratified RATE sampling: per-language keep rates applied through
    the same deterministic md5 bucket as `sample_hash_split` (en is
    majority in the fixture, so it downsamples to 25% while the
    low-resource strata keep 60% — the rebalancing move of corpus
    mixing).

    Deliberately rate-based, NOT exact-k-per-stratum: an exact cap needs
    a rank window partitioned by stratum, and with a handful of strata
    that is a handful of reducers no matter how many executors — the
    classic 100 TB anti-pattern.  The rate threshold is pure map-side
    (zero shuffles, rides the scan) and reproducible across engines,
    runs, and partitionings."""
    d = _docs(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    thr = F.when(F.col("lang") == "en", F.lit(16384)).otherwise(F.lit(39321))
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"), thr.alias("thr"))
        .filter(F.col("bucket") < F.col("thr"))
        .drop("thr")
    )


def q_sample_domain_mix(spark, sf_dir):
    """Domain MIXING by epoch repetition — reweighting source domains to
    a target mixture by repeating documents (the static-mixture move of
    DoReMi-style pipelines, expressed as data): sources src0-src4 train
    3 epochs, src5-src9 2, the tail 1.  The repeat factor is a literal
    policy on the domain id and `explode(sequence(...))` is map-side —
    zero shuffles, the mixture rides the scan at any scale."""
    d = _docs(spark, sf_dir)
    dom = F.substring(F.col("source"), 4, 8).cast("int")
    epochs = F.when(dom < 5, F.lit(3)).when(dom < 10, F.lit(2)).otherwise(F.lit(1))
    return d.select(
        "doc_id",
        "source",
        epochs.alias("epochs"),
        F.explode(F.sequence(F.lit(0), epochs - 1)).alias("epoch"),
    )


def q_text_rare_token_filter(spark, sf_dir):
    """CCNet-style perplexity-PROXY quality filter, integer-exact: a
    document is suspect when too many of its tokens are rare in the
    corpus (the signal LM-perplexity filters approximate, without the
    cross-engine float logs that cannot hash-match).  Two passes: corpus
    term frequencies, then per-doc rare counts.

    Scale shape: the membership side broadcast is the COMMON vocabulary
    (freq >= 3) — small by Zipf's law at any corpus size (the rare tail
    is huge, its complement is not) — so the exploded token stream takes
    a broadcast join and one doc_id aggregation; keep = rare tokens are
    at most half, by integer compare."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("token"))
    common = (
        toks.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= 3)
        .select("token")
    )
    per_doc = (
        toks.join(F.broadcast(common.withColumn("is_common", F.lit(1))), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("is_common").isNull(), 1).otherwise(0)).alias("n_rare"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_rare"), F.lit(0)).cast("long").alias("n_rare"),
            (
                F.coalesce(F.col("n_rare"), F.lit(0)) * 2
                <= F.coalesce(F.col("n_tokens"), F.lit(0))
            )
            .cast("int")
            .alias("rt_keep"),
        )
    )


def q_text_salient_terms(spark, sf_dir):
    """Per-document salient-term extraction — the tf-idf move with an
    integer-exact ordering: each document's top-3 tokens ranked by
    highest in-doc term frequency, then LOWEST document frequency
    (rarer is more distinctive), then token.  No float idf logs (which
    cannot hash-match cross-engine); log is monotone in df, so the
    (tf desc, df asc) rank IS the tf-idf rank within a fixed tf.
    Shapes: (doc, token) tf agg, token df agg, equi-join, one rank
    window PARTITIONED BY doc_id — parallel across documents."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("token")
    )
    return (
        tf.join(df_, "token")
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 3)
        .select(
            "doc_id",
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("term_rank").cast("int").alias("term_rank"),
        )
    )


# BM25 query set: fixed (q_id, term) pairs over the corpus vocabulary —
# identical literal list on the Spark and DuckDB sides.
BM25_QUERIES: list[tuple[int, str]] = [
    (0, "spark"), (0, "merge"), (0, "join"),
    (1, "fast"), (1, "table"), (1, "scan"),
    (2, "slow"), (2, "query"), (2, "filter"),
    (3, "window"), (3, "agg"), (3, "stream"),
    (4, "customer"), (4, "data"), (4, "line"),
]
BM25_K = 5


def q_text_dsir_select(spark, sf_dir):
    """DATA SELECTION VIA IMPORTANCE RESAMPLING (X4, round 12 — the
    public DSIR method, Xie et al. 2023: keep raw-corpus documents
    whose hashed-n-gram features look like a TARGET domain sample,
    ranked by importance weight under bag-of-hashed-ngrams models of
    target vs raw).  Target here = the deterministic seed slice
    doc_id % 10 < 2 (in production: the curated domain corpus).
    Features are hashed BIGRAMS: 12 bits of md5(tok<US>nxt) -> 4096
    buckets, the DSIR feature space.  Per-bucket importance score is
    the smoothed integer count ratio

        s(b) = ((ct[b] + 1) * 1e6) div (cr[b] + 1)

    — the repo's log-free monotone surrogate (logs are libm-dependent
    and can never hash-match cross-engine; the salient-terms rule).  A
    document's weight is its MEAN per-feature score (integer div), and
    it is SELECTED iff that clears 1.2x the corpus mean — a broadcast-
    scalar compare (w_avg * n_docs * 10 >= 12 * sum_w_avg), never a
    global sort.  Docs with < 2 tokens carry no features and are
    absent by construction on both engines.

    Scale shape: bigrams from an in-row zip (no position shuffle);
    ct/cr are map-side-combining groupBys onto <= 4096 keys; scoring
    joins the corpus feature stream to the BROADCAST 4096-row score
    table; the selection threshold is one broadcast scalar.  At 100 TB
    this is one corpus scan, one tiny dimension build, one broadcast
    join — the cheapest possible shape for corpus-wide curation."""
    d = _docs(spark, sf_dir)
    toks0 = d.select("doc_id", X.tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    bg = toks0.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1),"
                " (a, b) -> concat(a, chr(31), b))"
            )
        ).alias("g"),
    )
    feat = bg.select(
        "doc_id",
        F.conv(F.substring(F.md5("g"), 13, 3), 16, 10).cast("long").alias("b"),
    )
    raw_counts = feat.groupBy("b").agg(F.count("*").alias("cr"))
    tgt_counts = (
        feat.filter(F.col("doc_id") % 10 < 2).groupBy("b").agg(
            F.count("*").alias("ct")
        )
    )
    scores = raw_counts.join(tgt_counts, "b", "left").select(
        "b", F.expr("((coalesce(ct, 0) + 1) * 1000000) div (cr + 1)").alias("s")
    )
    doc_w = (
        feat.join(F.broadcast(scores), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("s").alias("w_sum"))
        .withColumn("w_avg", F.expr("w_sum div n_feats"))
    )
    stats = doc_w.agg(F.count("*").alias("nd"), F.sum("w_avg").alias("sw"))
    return doc_w.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.col("n_feats").cast("long").alias("n_feats"),
        F.col("w_sum").cast("long").alias("w_sum"),
        F.col("w_avg").cast("long").alias("w_avg"),
        (F.col("w_avg") * F.col("nd") * 10 >= F.lit(12) * F.col("sw"))
        .cast("int")
        .alias("selected"),
    )


def q_text_ngram_lm(spark, sf_dir):
    """N-GRAM LANGUAGE-MODEL quality scoring (round 10, X4 — the CCNet /
    Gopher move: score each document under a corpus language model and
    flag the low-probability tail for removal).  A bigram LM with
    stupid-backoff (public method, Brants et al. 2007) is trained on the
    corpus itself and every document is scored by its mean per-bigram
    transition probability:

      seen bigram (count >= 2):  s = c2(w1,w2) * 1e6 div c1(w1)
      rare/novel (count < 2):    s = 0.4 * c1(w2) * 1e6 div total   (backoff)

    All arithmetic is INTEGER on a 1e6 probability scale, so the whole
    train->score loop carries an exact DuckDB oracle (the BPE/classifier
    discipline).  A doc is low_quality iff its mean transition score is
    below a quarter of the corpus mean — a broadcast scalar compare
    (avg * n_docs * 4 < sum_of_avgs), never a global rank.

    Scale shape: bigrams come from an IN-ROW zip of the token array with
    its own tail (no per-doc window, no position shuffle); counts are
    two map-side-combining groupBys; scoring joins the bigram stream to
    the count tables on (w1,w2)/w1/w2 (AQE-skew-splittable probe side,
    one-row-per-key build sides); docs with < 2 tokens carry no bigrams
    and are absent by construction on both engines."""
    return ngram_lm(spark, _docs(spark, sf_dir))


def ngram_lm(spark, d):
    """Core of q_text_ngram_lm over an arbitrary (doc_id, text) frame —
    split out so the bench scale-slope probe can drive it over an
    amplified corpus (round 11, VERDICT r10 task 7)."""
    toks0 = d.select("doc_id", X.tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    tk = d.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("tok"))
    bg = toks0.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1),"
                " (a, b) -> struct(a AS tok, b AS nxt))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.tok").alias("tok"), F.col("p.nxt").alias("nxt"))
    uni = tk.groupBy("tok").agg(F.count("*").alias("c1"))
    tot = tk.agg(F.count("*").alias("tn"))
    big = bg.groupBy("tok", "nxt").agg(F.count("*").alias("c2"))
    scored = (
        bg.join(big, ["tok", "nxt"])
        .join(uni, "tok")
        .join(uni.select(F.col("tok").alias("nxt"), F.col("c1").alias("c1n")), "nxt")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.when(F.col("c2") >= 2, F.expr("(c2 * 1000000) div c1"))
            .otherwise(F.expr("(4 * c1n * 1000000) div (10 * tn)"))
            .alias("s"),
        )
    )
    per_doc = (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("s").alias("lm_score"))
        .withColumn("avg_score", F.expr("lm_score div n_bigrams"))
    )
    g = per_doc.agg(F.count("*").alias("nd"), F.sum("avg_score").alias("sa"))
    return per_doc.crossJoin(F.broadcast(g)).select(
        "doc_id",
        "n_bigrams",
        "lm_score",
        "avg_score",
        (F.col("avg_score") * F.col("nd") * 4 < F.col("sa"))
        .cast("int")
        .alias("low_quality"),
    )


def q_text_bm25_topk(spark, sf_dir):
    """BM25 top-k document retrieval (X3/X4 — the inverted-index move a
    training pipeline needs for targeted corpus slicing and
    decontamination-by-retrieval): whitespace tokens -> (doc, term) tf
    + per-term df + doc lengths, a FIXED 5-query term set broadcast
    against the tf index, per-(query, doc) BM25 scoring, distributed
    top-5 per query.

    Scoring uses the LOG-FREE odds idf — idf(t) = (N - df + 0.5) /
    (df + 0.5), the raw odds whose log is the classic BM25 idf —
    because ln() is libm-dependent and can never hash-match
    cross-engine, while +,-,*,/ are IEEE-deterministic: both engines
    evaluate the LITERALLY IDENTICAL formula text (the _MOMENT_EXPRS
    discipline) and fold per-term contributions in token-sorted order
    (explicit left fold on both sides), so raw double scores
    hash-match bit-for-bit.  tf normalization is standard BM25:
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), k1=1.2, b=0.75.

    Scale shape: tf/df/dl are one tokenize pass + two groupBys; the
    query set and the query-term df slice are broadcast; scoring
    touches only docs containing a query term; top-k is one window
    over (q_id) — 5 tiny partitions, rank ties broken by doc_id."""
    return bm25_topk(spark, _docs(spark, sf_dir))


def bm25_topk(spark, d):
    """The BM25 pipeline over an arbitrary (doc_id, text) frame — the
    core q_text_bm25_topk and the bench scale probe share."""
    toks = d.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count("*").cast("double").alias("tf")
    )
    # doc length and corpus stats DERIVE from tf (dl = Σ tf per doc) —
    # one tokenize pass feeds the whole index, not one per statistic
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("dl").alias("total"),
    )
    df_ = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
    q = spark.createDataFrame(BM25_QUERIES, "q_id int, tok string")
    c = (
        tf.join(F.broadcast(q), "tok")
        .join(F.broadcast(df_.join(F.broadcast(q.select("tok").distinct()), "tok")), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "c",
            ((F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
            * (
                (F.col("tf") * F.lit(2.2))
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (
                        F.lit(1.0)
                        - F.lit(0.75)
                        + F.lit(0.75) * F.col("dl") / (F.col("total") / F.col("n"))
                    )
                )
            ),
        )
    )
    scored = c.groupBy("q_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("tok", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("score")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_K)
        .select("q_id", "doc_id", F.col("rank").cast("int").alias("rank"), "score")
    )


def q_sim_hybrid_rrf_topk(spark, sf_dir):
    """HYBRID RETRIEVAL via RECIPROCAL RANK FUSION (round 12 — the
    production retrieval shape: a lexical ranker and a vector ranker
    fused per query by RRF, Cormack et al.'s public method every
    BM25+embeddings stack deploys).  Lexical side: the existing BM25
    top-5 per query (`bm25_topk`, identical-formula doubles).  Vector
    side: each query's deterministic query vector (embedding vec_id =
    1000 + 37*q_id) ranked by exact INTEGER squared-L2 against the 500
    document vectors (embedding vec_id == doc_id, quantized), top-5.
    Fusion: rrf = sum over the two lists of 1e6 div (60 + rank)
    (k=60, the published constant; integer-scaled reciprocal — the
    repo's float-free discipline), missing-from-a-list contributes 0;
    fused top-5 per query by (rrf desc, doc_id).

    Scale shape: BM25 is the existing one-index-build plan; the vector
    leg is one broadcast of 5 query vectors against a corpus scan; the
    fusion is a tiny (q_id, doc_id) full-outer join of two top-k lists
    — at 100 TB both legs stay exactly as scalable as their standalone
    rows, and the fusion never touches the corpus."""
    from ..functions import similarity as S

    d = _docs(spark, sf_dir)
    text_ranks = bm25_topk(spark, d).select(
        "q_id", "doc_id", F.col("rank").alias("rt")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", S.quantize_vec(F.col("embedding")).alias("xq")
    )
    doc_vecs = emb.join(
        d.select(F.col("doc_id").alias("vec_id")), "vec_id"
    ).select(F.col("vec_id").alias("doc_id"), "xq")
    q_ids = sorted({q for q, _ in BM25_QUERIES})
    qframe = spark.createDataFrame(
        [(q, 1000 + 37 * q) for q in q_ids], "q_id int, qvec_id int"
    )
    qvecs = qframe.join(emb, qframe.qvec_id == emb.vec_id).select(
        "q_id", F.col("xq").alias("q_xq")
    )
    scored = doc_vecs.crossJoin(F.broadcast(qvecs)).select(
        "q_id",
        "doc_id",
        S._dist2_q(F.col("q_xq"), F.col("xq")).cast("long").alias("d2"),
    )
    wv = Window.partitionBy("q_id").orderBy("d2", "doc_id")
    vec_ranks = (
        scored.withColumn("rv", F.row_number().over(wv))
        .filter(F.col("rv") <= 5)
        .select("q_id", "doc_id", "rv")
    )
    fused = (
        text_ranks.join(vec_ranks, ["q_id", "doc_id"], "full")
        .withColumn(
            "rrf",
            F.expr(
                "coalesce(1000000 div (60 + rt), 0)"
                " + coalesce(1000000 div (60 + rv), 0)"
            ).cast("long"),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= 5)
        .select(
            "q_id",
            "doc_id",
            F.col("fused_rank").cast("int").alias("fused_rank"),
            "rrf",
        )
    )


def q_sim_hybrid_index_rrf_topk(spark, sf_dir):
    """HYBRID RETRIEVAL OVER THE PERSISTED INDEX (round 13, VERDICT r12
    task 6): the r12 hybrid row's vector leg brute-forced a broadcast
    GEMM over every doc vector; the 100 TB story composes the two r12
    pieces instead — vector ranks come from the PERSISTED IVF serving
    path (stored centroids + postings parquet: per query, probe the
    nprobe=2 nearest stored cells in-row, equi-join the cell-bounded
    postings, exact integer squared-L2), restricted to document
    vectors, fused with the BM25 leg by the same integer RRF join.
    The index is the SHARED artifact of sim_index_persist_topk (train
    once, arrivals appended — candidates here join against doc_ids, so
    the appended non-doc ids drop out by construction).  Recall follows
    the index (nprobe cells, not the whole corpus) — exactly what
    deploying an ANN index means — and the oracle replays the stored
    k-means, the probes and the cell restriction, so the row is still
    exact cross-engine.  Scale: the vector leg reads index parquet
    (cell-pruned), never the embedding column of the corpus; fusion
    stays a tiny top-k full-outer join."""
    from ..functions import similarity as S
    from .sim_q import persisted_ivf_paths

    d = _docs(spark, sf_dir)
    text_ranks = bm25_topk(spark, d).select(
        "q_id", "doc_id", F.col("rank").alias("rt")
    )
    cent_dir, post_dir = persisted_ivf_paths(spark, sf_dir)
    cb = spark.read.parquet(cent_dir)
    postings = spark.read.parquet(post_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", S.quantize_vec(F.col("embedding")).alias("xq")
    )
    q_ids = sorted({q for q, _ in BM25_QUERIES})
    qframe = spark.createDataFrame(
        [(q, 1000 + 37 * q) for q in q_ids], "q_id int, qvec_id int"
    )
    qvecs = qframe.join(emb, qframe.qvec_id == emb.vec_id).select(
        "q_id", F.col("xq").alias("q_xq")
    )
    cb_row = cb.agg(
        F.sort_array(F.collect_list(F.struct("cid", "c_vec"))).alias("codebook")
    )
    probes = (
        qvecs.crossJoin(F.broadcast(cb_row))
        .select(
            "q_id",
            "q_xq",
            F.explode(
                F.slice(
                    F.sort_array(
                        F.transform(
                            "codebook",
                            lambda c: F.struct(
                                S._dist2_q(F.col("q_xq"), c["c_vec"]).alias("d2"),
                                c["cid"].alias("cid"),
                            ),
                        )
                    ),
                    1,
                    2,  # nprobe=2
                )
            ).alias("pr"),
        )
        .select("q_id", "q_xq", F.col("pr.cid").alias("cell"))
    )
    scored = (
        probes.join(postings, "cell")
        .join(
            d.select(F.col("doc_id").alias("vec_id")), "vec_id"
        )  # doc vectors only: appended non-doc ids drop out here
        .select(
            "q_id",
            F.col("vec_id").alias("doc_id"),
            S._dist2_q(F.col("q_xq"), F.col("xq")).cast("long").alias("d2"),
        )
    )
    wv = Window.partitionBy("q_id").orderBy("d2", "doc_id")
    vec_ranks = (
        scored.withColumn("rv", F.row_number().over(wv))
        .filter(F.col("rv") <= 5)
        .select("q_id", "doc_id", "rv")
    )
    fused = text_ranks.join(vec_ranks, ["q_id", "doc_id"], "full").withColumn(
        "rrf",
        F.expr(
            "coalesce(1000000 div (60 + rt), 0)"
            " + coalesce(1000000 div (60 + rv), 0)"
        ).cast("long"),
    )
    wf = Window.partitionBy("q_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= 5)
        .select(
            "q_id",
            "doc_id",
            F.col("fused_rank").cast("int").alias("fused_rank"),
            "rrf",
        )
    )


BPE_MERGES = 6  # learned merge rounds (oracle unrolls the same count)
_BPE_SEP = "\x1f"  # symbol delimiter (absent from the corpus by filter)


def q_text_bpe_train(spark, sf_dir):
    """DISTRIBUTED BPE TOKENIZER TRAINING (X4 — the iterative algorithm
    a training pipeline runs before anything else): learn the top-K
    byte-pair merges over the corpus, Sennrich-style, on the
    WORD-FREQUENCY table — the representation that scales (pair
    counting and merging touch the vocabulary, not the corpus; the one
    corpus-sized pass is the word count).  Variant: no end-of-word
    marker (documented).

    Each round: count adjacent symbol pairs weighted by word frequency
    (groupBy + sum — map-side combinable), take the argmax with the
    deterministic (count DESC, left, right) tie-break (ONE driver row
    per round — the scalar the algorithm's control flow needs), then
    merge that pair everywhere via a single delimiter-string replace()
    (greedy left-to-right, the BPE application order) — symbols live
    in a \\x1f-delimited string so the merge is one JVM string op, no
    UDFs.  localCheckpoint per round keeps the plan from growing with
    the iteration count.

    The oracle unrolls the SAME K rounds as chained CTEs with the
    identical replace()/tie-break semantics — a genuinely iterative
    algorithm with an exact cross-engine oracle.  Output: one row per
    learned merge (rank, left, right, pair_count)."""
    return bpe_train(spark, _docs(spark, sf_dir))


def bpe_train(spark, d, k: int = BPE_MERGES):
    """The BPE trainer over an arbitrary (doc_id, text) frame — the
    core q_text_bpe_train and the bench scale probe share."""
    sep = _BPE_SEP
    words = (
        d.select(F.explode(X.tokens(F.col("text"))).alias("w"))
        .filter(~F.col("w").contains(sep))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            F.concat(
                F.regexp_replace("w", "(.)", sep + "$1"), F.lit(sep)
            ).alias("sym"),
            "freq",
        )
        # lazy checkpoint (r18, guide §1.2): eager=True ran a separate
        # materialization job per call — with one checkpoint per merge
        # round the train loop paid 2 jobs/round (profiled: the bpe
        # manifest ran 57 jobs averaging 0.08 s, pure job-launch
        # overhead).  eager=False truncates lineage identically but
        # materializes inside the round's argmax job — 1 job/round.
        .localCheckpoint(eager=False)
    )
    merges = []
    for rank in range(1, k + 1):
        syms = F.filter(F.split("sym", sep), lambda x: x != F.lit(""))
        pairs = F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        best = (
            words.select("freq", F.explode(pairs).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .first()
        )
        if best is None:
            break
        merges.append((rank, best.l, best.r, int(best.n)))
        words = words.select(
            F.replace(
                F.col("sym"),
                F.lit(sep + best.l + sep + best.r + sep),
                F.lit(sep + best.l + best.r + sep),
            ).alias("sym"),
            "freq",
        ).localCheckpoint(eager=False)  # same 1-job/round discipline
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def q_text_bpe_encode(spark, sf_dir):
    '''BPE ENCODING — the learned merges applied back to the corpus
    (train -> encode, the full tokenizer loop): q_text_bpe_train's K
    merges, applied in rank order to every word via the same
    delimiter-string replace() (greedy left-to-right, each merge one
    JVM string op over the exploded corpus — a map-side pass, no
    shuffle beyond the per-doc count), then per-document token
    accounting: symbols before (= characters) vs after.  The oracle
    re-learns the identical merges (the unrolled b{i} CTEs) and
    applies them with nested replace()s.  Output: per doc the
    symbol counts and how many merges fired (before - after).'''
    d = _docs(spark, sf_dir)
    sep = _BPE_SEP
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(spark, d).orderBy("rank").collect()
    ]
    words = d.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("w")
    ).filter(~F.col("w").contains(sep))
    sym = F.concat(F.regexp_replace("w", "(.)", sep + "$1"), F.lit(sep))
    for left, right in merges:  # rank order — application order matters
        sym = F.replace(
            sym,
            F.lit(sep + left + sep + right + sep),
            F.lit(sep + left + right + sep),
        )
    n_after = F.size(F.filter(F.split(sym, sep), lambda x: x != F.lit("")))
    return (
        words.select("doc_id", F.length("w").alias("nb"), n_after.alias("na"))
        .groupBy("doc_id")
        .agg(
            F.sum("nb").cast("long").alias("n_sym_before"),
            F.sum("na").cast("long").alias("n_sym_after"),
            (F.sum("nb") - F.sum("na")).cast("long").alias("n_merges_applied"),
        )
    )


def _bpe_encode_oracle(k: int) -> str:
    '''Training CTEs (b1..bK, shared shape with _bpe_oracle) + nested
    rank-order replace()s over the exploded corpus words.'''
    expr = "regexp_replace(w, '(.)', chr(31) || '\\1', 'g') || chr(31)"
    for i in range(1, k + 1):
        expr = (
            f"replace({expr}, "
            f"(SELECT chr(31) || l || chr(31) || r || chr(31) FROM b{i}), "
            f"(SELECT chr(31) || l || r || chr(31) FROM b{i}))"
        )
    return f"""
    , enc AS (
      SELECT doc_id, length(w) AS nb,
             len(list_filter(string_split({expr}, chr(31)), x -> x != '')) AS na
      FROM (
        SELECT doc_id, tok AS w FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
        WHERE NOT contains(tok, chr(31))
      )
    )
    SELECT doc_id, CAST(sum(nb) AS BIGINT) AS n_sym_before,
           CAST(sum(na) AS BIGINT) AS n_sym_after,
           CAST(sum(nb) - sum(na) AS BIGINT) AS n_merges_applied
    FROM enc GROUP BY doc_id
"""


def _bpe_oracle(k: int) -> str:
    """The same K rounds unrolled as chained CTEs: w{i} holds the
    delimited vocab after i merges, p{i} the weighted pair counts over
    w{i-1}, b{i} the argmax (same tie-break).  replace() has identical
    greedy left-to-right semantics in both engines (verified on the
    overlapping-pair case)."""
    parts = [
        """
    , w0 AS (
      SELECT regexp_replace(w, '(.)', chr(31) || '\\1', 'g') || chr(31) AS sym,
             freq
      FROM (
        SELECT tok AS w, count(*) AS freq
        FROM (SELECT unnest(t) AS tok FROM toks)
        WHERE NOT contains(tok, chr(31))
        GROUP BY 1
      )
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(f"""
    , p{i} AS (
      SELECT s[i] AS l, s[i+1] AS r, sum(freq) AS n
      FROM (
        SELECT list_filter(string_split(sym, chr(31)), x -> x != '') AS s,
               freq
        FROM w{i - 1}
      ), LATERAL (SELECT unnest(range(1, len(s))) AS i)
      GROUP BY 1, 2
    ), b{i} AS (
      SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1
    ), w{i} AS (
      SELECT replace(sym, chr(31) || b.l || chr(31) || b.r || chr(31),
                     chr(31) || b.l || b.r || chr(31)) AS sym, freq
      FROM w{i - 1} CROSS JOIN b{i} b
    )""")
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS rank, l AS left, r AS right, "
        f"CAST(n AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, k + 1)
    )
    return "".join(parts) + "\n    " + selects


# ---------------------------------------------------------------- oracles

_SW = {k: ", ".join(f"'{w}'" for w in v) for k, v in X.STOPWORDS.items()}

_TOKS = """
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '') AS t
  FROM documents
)
"""

def _classifier_oracle() -> str:
    """DuckDB replica of the ENTIRE classifier training loop — the
    feature CTE (same integer counts as the gopher oracle), then
    CLF_ROUNDS unrolled rounds of {err, HUGEINT gradient sums, floor-div
    weight update} as chained CTEs, then the scoring pass.  Floor
    division with possibly-negative numerators is spelled
    (a - pmod(a, b)) // b in both engines; FP is a power of two so
    floor(dot / 256.0) over exact int64s is the mathematical floor."""
    from ..functions.text import (
        CLF_CLIP,
        CLF_FEATS,
        CLF_FP,
        CLF_LR_SHIFT,
        CLF_ROUNDS,
        CLF_THRESHOLD,
    )

    nf = len(CLF_FEATS)
    feats = _TOKS + f"""
, g AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tok,
         CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS sum_len,
         CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
         CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_ell,
         CAST(len(list_filter(t, x -> list_contains([{_SW['en']}], x))) AS BIGINT) AS stops,
         CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         CAST(len(list_filter(string_split(text, chr(10)),
                  l -> regexp_matches(ltrim(l), '^[-*•]'))) AS BIGINT) AS n_bullet,
         CAST(len(list_filter(string_split(text, chr(10)),
                  l -> suffix(rtrim(l), '...'))) AS BIGINT) AS n_ell_lines
  FROM toks
), feats AS MATERIALIZED (
  SELECT doc_id,
         CAST({CLF_FP} AS BIGINT) AS x0,
         least(n_tok, 256) AS x1,
         ({CLF_FP}*stops) // greatest(n_tok, 1) AS x2,
         ({CLF_FP}*n_alpha) // greatest(n_tok, 1) AS x3,
         least(({CLF_FP}*sum_len) // (greatest(n_tok, 1)*16), {CLF_FP}) AS x4,
         ({CLF_FP}*n_bullet) // greatest(n_lines, 1) AS x5,
         least(({CLF_FP}*(n_hash + n_ell)) // greatest(n_tok, 1), {CLF_FP}) AS x6,
         {CLF_FP} * CAST((n_tok >= 50 AND n_tok <= 100000)
          AND (3*n_tok <= sum_len AND sum_len <= 10*n_tok)
          AND (10*(n_hash + n_ell) <= n_tok)
          AND (5*n_alpha >= 4*n_tok)
          AND (stops >= 2)
          AND (10*n_bullet <= 9*n_lines)
          AND (10*n_ell_lines <= 3*n_lines) AS BIGINT) AS y
  FROM g
), w0 AS MATERIALIZED (SELECT {", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(nf))})
"""
    dot = " + ".join(f"w.w{j}*f.x{j}" for j in range(nf))
    b = f"(s.n * {CLF_FP << CLF_LR_SHIFT})"
    rounds = []
    for k in range(CLF_ROUNDS):
        sums = ", ".join(
            f"sum(CAST(err * x{j} AS HUGEINT)) AS s{j}" for j in range(nf)
        )
        upd = ", ".join(
            f"CAST(w.w{j} - (s.s{j} - (((s.s{j} % {b}) + {b}) % {b})) // {b} "
            f"AS BIGINT) AS w{j}"
            for j in range(nf)
        )
        rounds.append(f"""
, e{k} AS (
  SELECT f.*, greatest(CAST(-{CLF_CLIP} AS BIGINT), least(CAST({CLF_CLIP} AS BIGINT),
           CAST(floor(({dot}) / {CLF_FP}.0) AS BIGINT) - f.y)) AS err
  FROM feats f, w{k} w
), g{k} AS (SELECT count(*) AS n, {sums} FROM e{k})
, w{k + 1} AS MATERIALIZED (SELECT {upd} FROM w{k} w, g{k} s)""")
    final = f"""
SELECT f.doc_id,
       CAST(f.y // {CLF_FP} AS INT) AS label_keep,
       CAST(floor(({dot}) / {CLF_FP}.0) AS BIGINT) AS score_fp,
       CAST(CAST(floor(({dot}) / {CLF_FP}.0) AS BIGINT) >= {CLF_THRESHOLD}
            AS INT) AS keep_pred
FROM feats f, w{CLF_ROUNDS} w
"""
    return feats + "".join(rounds) + final


ORACLES = {
    # length buckets: the same value-histogram -> ceil-quartile
    # threshold -> CASE arithmetic, per-bucket padding accounting
    "pipeline_length_buckets": _TOKS
    + """
        , nt AS (SELECT doc_id, len(t) AS n_tokens FROM toks),
        hist AS (SELECT n_tokens AS v, count(*) AS cnt FROM nt GROUP BY 1),
        cum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS c,
                       (SELECT count(*) FROM nt) AS n FROM hist),
        th AS (SELECT
            min(CASE WHEN c >= (n * 1 + 3) // 4 THEN v END) AS t0,
            min(CASE WHEN c >= (n * 2 + 3) // 4 THEN v END) AS t1,
            min(CASE WHEN c >= (n * 3 + 3) // 4 THEN v END) AS t2
          FROM cum),
        bucketed AS (
          SELECT n_tokens,
                 CASE WHEN n_tokens <= t0 THEN 0
                      WHEN n_tokens <= t1 THEN 1
                      WHEN n_tokens <= t2 THEN 2
                      ELSE 3 END AS bucket
          FROM nt, th
        ),
        per AS (
          SELECT bucket, count(*) AS n_docs, max(n_tokens) AS cap,
                 sum(n_tokens) AS sum_tokens
          FROM bucketed GROUP BY bucket
          UNION ALL
          SELECT -1, count(*), max(n_tokens), sum(n_tokens) FROM nt
        )
        SELECT CAST(bucket AS INT) AS bucket,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(cap AS BIGINT) AS cap,
               CAST(sum_tokens AS BIGINT) AS sum_tokens,
               CAST(n_docs * cap AS BIGINT) AS padded,
               CAST((10000 * (n_docs * cap - sum_tokens))
                    // (n_docs * cap) AS BIGINT) AS waste_bp
        FROM per
    """,
    "text_quality_classifier": _classifier_oracle(),
    # duplicated-substring spans: same 12-gram hash, global frequency,
    # same gaps-and-islands merge (adjacency merges: start <= prev_end+1)
    "text_dup_span_removal": _TOKS + """
        , g AS (
          SELECT doc_id, i AS start_tok, i + 11 AS end_tok,
                 CAST('0x' || substring(
                     md5(array_to_string(list_slice(t, i, i + 11), ' ')),
                     1, 15) AS BIGINT) AS gh
          FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 10, 1))) AS i)
        ), f AS (
          SELECT * FROM (
            SELECT g.*, count(*) OVER (PARTITION BY gh) AS cnt FROM g
          ) WHERE cnt > 1
        ), isl AS (
          SELECT doc_id, start_tok, end_tok,
                 CASE WHEN start_tok > coalesce(max(end_tok) OVER (
                        PARTITION BY doc_id ORDER BY start_tok
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                      THEN 1 ELSE 0 END AS new_isl
          FROM f
        ), isl2 AS (
          SELECT doc_id, start_tok, end_tok,
                 sum(new_isl) OVER (PARTITION BY doc_id ORDER BY start_tok
                                    ROWS UNBOUNDED PRECEDING) AS island
          FROM isl
        )
        SELECT doc_id, CAST(island AS BIGINT) AS span_id,
               CAST(min(start_tok) AS BIGINT) AS start_tok,
               CAST(max(end_tok) AS BIGINT) AS end_tok,
               CAST(max(end_tok) - min(start_tok) + 1 AS BIGINT) AS span_tokens
        FROM isl2 GROUP BY doc_id, island
    """,

    # chunking: same offsets (range step 48), same 1-based inclusive
    # slice window, same md5-of-joined-tokens chunk identity
    "text_chunk_windows": _TOKS + """
        , c AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        o AS (SELECT doc_id, t, n, unnest(range(0, greatest(n - 16, 1), 48)) AS start_tok FROM c)
        SELECT doc_id,
               CAST(start_tok // 48 AS BIGINT) AS chunk_id,
               CAST(start_tok AS BIGINT) AS start_tok,
               CAST(least(64, n - start_tok) AS BIGINT) AS n_chunk_tokens,
               md5(array_to_string(list_slice(t, start_tok + 1, start_tok + 64),
                                   ' ')) AS chunk_md5
        FROM o
    """,

    # PII scrub: the same synthesis arithmetic, the same regexes (common
    # Java/RE2 subset), DuckDB regexp_replace with the 'g' flag
    "text_pii_scrub": r"""
        WITH pii AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'
                      || CASE WHEN doc_id % 3 = 0
                              THEN ' call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                              ELSE '' END
                      || CASE WHEN doc_id % 4 = 0
                              THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                                   || '.' || CAST((3 * doc_id) % 256 AS VARCHAR)
                                   || '.' || CAST((7 * doc_id) % 256 AS VARCHAR)
                              ELSE '' END
                      || CASE WHEN doc_id % 6 = 0
                              THEN ' via 2001:db8:' || hex(doc_id % 4096)
                                   || ':' || hex((5 * doc_id) % 4096)
                                   || '::' || hex((9 * doc_id) % 4096)
                              ELSE '' END
                      || CASE WHEN doc_id % 5 = 0
                              THEN ' card ' || CAST(4000 + doc_id % 1000 AS VARCHAR)
                                   || '-' || CAST(1000 + (3 * doc_id) % 9000 AS VARCHAR)
                                   || '-' || CAST(1000 + (7 * doc_id) % 9000 AS VARCHAR)
                                   || '-' || CAST(1000 + (11 * doc_id) % 9000 AS VARCHAR)
                              ELSE '' END
                      || CASE WHEN doc_id % 9 = 0
                              THEN ' ssn ' || CAST(100 + doc_id % 900 AS VARCHAR)
                                   || '-' || CAST(10 + doc_id % 90 AS VARCHAR)
                                   || '-' || CAST(1000 + (13 * doc_id) % 9000 AS VARCHAR)
                              ELSE '' END AS pii_text
          FROM documents
        ), cards AS (
          -- Luhn post-filter: a 16-digit candidate is PII only when its
          -- checksum validates (same right-indexed fold as the Spark side)
          SELECT doc_id,
                 list_filter(
                   regexp_extract_all(pii_text, '\b\d{4}-\d{4}-\d{4}-\d{4}\b'),
                   c -> list_sum(list_transform(range(1, 17), i ->
                          CASE WHEN i % 2 = 0
                               THEN CASE WHEN (ascii(substring(replace(c, '-', ''), 17 - i, 1)) - 48) * 2 > 9
                                         THEN (ascii(substring(replace(c, '-', ''), 17 - i, 1)) - 48) * 2 - 9
                                         ELSE (ascii(substring(replace(c, '-', ''), 17 - i, 1)) - 48) * 2 END
                               ELSE ascii(substring(replace(c, '-', ''), 17 - i, 1)) - 48
                          END)) % 10 = 0
                 ) AS valid
          FROM pii
        ), scrub AS (
          SELECT p.doc_id, p.pii_text, k.valid,
                 regexp_replace(
                   regexp_replace(
                     list_reduce(
                       list_prepend(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(p.pii_text,
                               '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                             '\b[0-9a-fA-F]{1,4}(:[0-9a-fA-F]{0,4}){2,7}\b', '<IPV6>', 'g'),
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                         k.valid),
                       (acc, c) -> replace(acc, c, '<CARD>')),
                     '\b\d{3}-\d{2}-\d{4}\b', '<NID>', 'g'),
                   '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS s
          FROM pii p JOIN cards k USING (doc_id)
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(pii_text,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(pii_text,
                   '\b[0-9a-fA-F]{1,4}(:[0-9a-fA-F]{0,4}){2,7}\b')) AS INT) AS n_ipv6,
               CAST(len(regexp_extract_all(pii_text,
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
               CAST(len(valid) AS INT) AS n_cards,
               CAST(len(regexp_extract_all(pii_text,
                   '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_nids,
               CAST(len(regexp_extract_all(pii_text,
                   '\b\d{3}-\d{4}\b')) AS INT) AS n_phones,
               md5(s) AS scrubbed_md5,
               CAST(length(s) AS INT) AS scrubbed_len
        FROM scrub
    """,

    "text_token_stats": _TOKS
    + """
        SELECT doc_id,
               length(text) AS n_chars,
               len(t) AS n_tokens,
               len(list_distinct(t)) AS n_distinct,
               len(list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
                               x -> x != '')) AS n_bpe,
               CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                   / CAST(greatest(len(t), 1) AS DOUBLE) AS mean_word_len
        FROM toks
    """,
    "text_quality": _TOKS
    + f"""
        SELECT doc_id,
               CAST(len(list_filter(t, x -> list_contains([{_SW['en']}], x))) AS DOUBLE)
                   / CAST(greatest(len(t), 1) AS DOUBLE) AS stop_ratio,
               CAST(len(list_distinct(t)) AS DOUBLE)
                   / CAST(greatest(len(t), 1) AS DOUBLE) AS distinct_ratio,
               least(CAST(len(t) AS DOUBLE) / 100.0, 1.0) * 0.4
                 + CAST(len(list_filter(t, x -> list_contains([{_SW['en']}], x))) AS DOUBLE)
                   / CAST(greatest(len(t), 1) AS DOUBLE) * 0.3
                 + CAST(len(list_distinct(t)) AS DOUBLE)
                   / CAST(greatest(len(t), 1) AS DOUBLE) * 0.3 AS quality_score
        FROM toks
    """,
    "text_gopher_rules": _TOKS
    + f"""
        , g AS (
          SELECT doc_id,
                 CAST(len(t) AS BIGINT) AS n_tokens,
                 CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS sum_len,
                 CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
                 CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
                 CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_ell,
                 CAST(len(list_filter(t, x -> list_contains([{{sw}}], x))) AS BIGINT) AS stops,
                 CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
                 CAST(len(list_filter(string_split(text, chr(10)),
                          l -> regexp_matches(ltrim(l), '^[-*•]'))) AS BIGINT) AS n_bullet,
                 CAST(len(list_filter(string_split(text, chr(10)),
                          l -> suffix(rtrim(l), '...'))) AS BIGINT) AS n_ell_lines
          FROM toks
        )
        SELECT doc_id, n_tokens,
               CAST(n_tokens >= 50 AND n_tokens <= 100000 AS INT) AS r_word_count,
               CAST(3 * n_tokens <= sum_len AND sum_len <= 10 * n_tokens AS INT) AS r_mean_word_len,
               CAST(10 * (n_hash + n_ell) <= n_tokens AS INT) AS r_symbol_ratio,
               CAST(5 * n_alpha >= 4 * n_tokens AS INT) AS r_alpha_words,
               CAST(stops >= 2 AS INT) AS r_stopwords,
               CAST(10 * n_bullet <= 9 * n_lines AS INT) AS r_bullet_lines,
               CAST(10 * n_ell_lines <= 3 * n_lines AS INT) AS r_ellipsis_lines,
               CAST((n_tokens >= 50 AND n_tokens <= 100000)
                AND (3 * n_tokens <= sum_len AND sum_len <= 10 * n_tokens)
                AND (10 * (n_hash + n_ell) <= n_tokens)
                AND (5 * n_alpha >= 4 * n_tokens)
                AND (stops >= 2)
                AND (10 * n_bullet <= 9 * n_lines)
                AND (10 * n_ell_lines <= 3 * n_lines) AS INT) AS gopher_keep
        FROM g
    """.replace("{sw}", _SW["en"]),
    "text_repetition_rules": _TOKS
    + """
        , g2 AS (
          SELECT doc_id, unnest(list_transform(range(1, len(t)),
                     i -> array_to_string(t[i : i + 1], ' '))) AS g
          FROM toks WHERE len(t) >= 2
        ),
        g2c AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2),
        top2 AS (
          SELECT doc_id, cnt, g FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY cnt DESC, g) AS rn
            FROM g2c) WHERE rn = 1
        ),
        g5 AS (
          SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
                     i -> array_to_string(t[i : i + 4], ' '))) AS g
          FROM toks WHERE len(t) >= 5
        ),
        g5c AS (SELECT doc_id, g, count(*) AS cnt FROM g5 GROUP BY 1, 2),
        dup5 AS (
          SELECT doc_id,
                 CAST(coalesce(sum(cnt * length(g)) FILTER (cnt >= 2), 0) AS BIGINT)
                     AS dup5_chars
          FROM g5c GROUP BY doc_id
        ),
        base AS (
          SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
                 CAST(len(string_split(text, chr(10)))
                      - len(list_distinct(string_split(text, chr(10)))) AS BIGINT)
                     AS n_dup_lines
          FROM toks
        )
        SELECT b.doc_id, b.n_chars,
               CAST(coalesce(t2.cnt, 0) AS BIGINT) AS top2_cnt,
               CAST(coalesce(d5.dup5_chars, 0) AS BIGINT) AS dup5_chars,
               CAST(10 * b.n_dup_lines <= 3 * b.n_lines AS INT) AS r_dup_lines,
               CAST(5 * coalesce(t2.cnt * length(t2.g), 0) <= b.n_chars AS INT)
                   AS r_top_2gram,
               CAST(20 * coalesce(d5.dup5_chars, 0) <= 3 * b.n_chars AS INT)
                   AS r_dup_5gram,
               CAST((10 * b.n_dup_lines <= 3 * b.n_lines)
                AND (5 * coalesce(t2.cnt * length(t2.g), 0) <= b.n_chars)
                AND (20 * coalesce(d5.dup5_chars, 0) <= 3 * b.n_chars) AS INT)
                   AS rep_keep
        FROM base b
        LEFT JOIN top2 t2 ON t2.doc_id = b.doc_id
        LEFT JOIN dup5 d5 ON d5.doc_id = b.doc_id
    """,
    "text_pack_sequences": _TOKS
    + """
        , base AS (
          SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
                 CAST(len(t) AS BIGINT) AS n_tokens
          FROM toks
        ),
        cum AS (
          SELECT *,
                 CAST(coalesce(sum(n_tokens) OVER (
                     PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                     AS cum_before
          FROM base
        )
        SELECT doc_id, shard, n_tokens, cum_before,
               CAST(cum_before // 2048 AS BIGINT) AS seq_id,
               CAST(cum_before % 2048 AS BIGINT) AS seq_offset
        FROM cum
    """,
    "text_lang_id": _TOKS
    + f"""
        , scores AS (
          SELECT doc_id,
                 CAST(len(list_filter(t, x -> list_contains([{_SW['de']}], x))) AS DOUBLE)
                     / CAST(greatest(len(t), 1) AS DOUBLE) AS s_de,
                 CAST(len(list_filter(t, x -> list_contains([{_SW['en']}], x))) AS DOUBLE)
                     / CAST(greatest(len(t), 1) AS DOUBLE) AS s_en,
                 CAST(len(list_filter(t, x -> list_contains([{_SW['es']}], x))) AS DOUBLE)
                     / CAST(greatest(len(t), 1) AS DOUBLE) AS s_es,
                 CAST(len(list_filter(t, x -> list_contains([{_SW['fr']}], x))) AS DOUBLE)
                     / CAST(greatest(len(t), 1) AS DOUBLE) AS s_fr,
                 CAST(length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS DOUBLE)
                     / CAST(greatest(length(text), 1) AS DOUBLE) AS s_zh
          FROM toks
        )
        SELECT doc_id,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) <= 0 THEN 'und'
                    WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                    WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                    WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                    ELSE 'zh' END AS pred_lang
        FROM scores
    """,
    "text_fingerprint": _TOKS
    + """
        SELECT doc_id,
               md5(array_to_string(t, ' ')) AS fp,
               CASE WHEN len(t) < 3 THEN 0
                    ELSE len(list_distinct(list_transform(range(1, len(t) - 1),
                             i -> array_to_string(t[i : i + 2], ' ')))) END AS n_shingles
        FROM toks
    """,
    # collocations: the same window-4 pair stream, unordered
    # canonicalization, integer PMI proxy — top-20 exact
    "text_collocations": _TOKS + """
        , tk AS (SELECT unnest(t) AS tok FROM toks),
        uni AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
        tot AS (SELECT count(*) AS n FROM tk),
        pr AS (
          SELECT least(p[1], p[2]) AS w1, greatest(p[1], p[2]) AS w2
          FROM (
            SELECT unnest(list_zip(t[1 : greatest(len(t) - k.k, 0)],
                                   t[k.k + 1 : len(t)])) AS p
            FROM toks, (SELECT unnest(range(1, 5)) AS k) k
          )
          WHERE p[1] != p[2]
        ),
        co AS (
          SELECT w1, w2, count(*) AS cnt_ab FROM pr GROUP BY w1, w2
          HAVING count(*) >= 5
        ),
        scored AS (
          SELECT co.w1, co.w2, co.cnt_ab,
                 (co.cnt_ab * tot.n * 1000000) // (ua.c * ub.c) AS pmi_bp
          FROM co JOIN uni ua ON ua.tok = co.w1
                  JOIN uni ub ON ub.tok = co.w2
                  CROSS JOIN tot
        )
        SELECT w1, w2, cnt_ab, CAST(pmi_bp AS BIGINT) AS pmi_bp,
               CAST(rank AS INT) AS rank
        FROM (SELECT *, row_number() OVER (ORDER BY pmi_bp DESC, w1, w2)
                            AS rank
              FROM scored)
        WHERE rank <= 20
    """,
    # the CMS is the SAME integer sketch on both engines (md5-bucket
    # hashing + min over 4 counters) — est is deterministic, not
    # approximate-vs-approximate
    "agg_countmin_heavy_hitters": _TOKS + """
        , tok AS (SELECT unnest(t) AS tok FROM toks),
        buck AS (
          SELECT d.d, tok,
                 list_reduce(list_transform(range(1, 16),
                     j -> strpos('0123456789abcdef',
                                 substr(md5('cms' || CAST(d.d AS VARCHAR) || '|' || tok), j, 1)) - 1),
                     (a, b) -> a * 16 + b) % 256 AS bucket
          FROM tok, (SELECT unnest(range(0, 4)) AS d) d
        ),
        cms AS (
          SELECT d, bucket, count(*) AS cnt FROM buck GROUP BY d, bucket
        ),
        top AS (
          SELECT tok, count(*) AS true_cnt FROM tok GROUP BY tok
          ORDER BY true_cnt DESC, tok LIMIT 20
        ),
        est AS (
          SELECT t.tok, t.true_cnt, min(c.cnt) AS est_cnt
          FROM top t
          JOIN (SELECT DISTINCT d, tok, bucket FROM buck) b ON b.tok = t.tok
          JOIN cms c ON c.d = b.d AND c.bucket = b.bucket
          GROUP BY t.tok, t.true_cnt
        )
        SELECT tok, true_cnt, est_cnt,
               CAST(est_cnt >= true_cnt AS INT) AS never_under
        FROM est
    """,
    "sample_global_shuffle": """
        WITH b AS (
          SELECT doc_id,
                 list_reduce(list_transform(range(1, 16),
                     j -> strpos('0123456789abcdef',
                                 substr(md5('shuf42|' || CAST(doc_id AS VARCHAR)), j, 1)) - 1),
                     (a, b) -> a * 16 + b) AS hkey
          FROM documents
        )
        SELECT doc_id, CAST(hkey % 8 AS INT) AS shard,
               CAST(row_number() OVER (PARTITION BY hkey % 8
                                       ORDER BY hkey, doc_id) AS INT) AS pos
        FROM b
    """,
    "sample_hash_split": """
        WITH b AS (
          SELECT doc_id,
                 list_reduce(list_transform(range(1, 5),
                     j -> strpos('0123456789abcdef',
                                 substr(md5(CAST(doc_id AS VARCHAR)), j, 1)) - 1),
                     (a, b) -> a * 16 + b) AS bucket
          FROM documents
        )
        SELECT doc_id, CAST(bucket AS INT) AS bucket,
               CASE WHEN bucket < 52429 THEN 'train'
                    WHEN bucket < 58982 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """,
    "text_decontaminate": _TOKS
    + """
        , g AS (
          SELECT doc_id,
                 CASE WHEN len(t) >= 5 THEN
                   list_distinct(list_transform(range(1, len(t) - 3),
                       i -> array_to_string(list_slice(t, i, i + 4), ' ')))
                 ELSE CAST([] AS VARCHAR[]) END AS grams
          FROM toks
        ),
        bench AS (
          SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0
        ),
        hits AS (
          SELECT doc_id, count(*) AS n_hit
          FROM (SELECT doc_id, unnest(grams) AS gram FROM g) cg
          JOIN bench USING (gram)
          GROUP BY doc_id
        )
        SELECT g.doc_id,
               CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
               g.doc_id % 50 = 0 AS is_benchmark,
               coalesce(n_hit, 0) * 10 > len(grams) AND len(grams) > 0
                   AS contaminated
        FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
    """,
    "sample_stratified": """
        WITH b AS (
          SELECT doc_id, lang,
                 list_reduce(list_transform(range(1, 5),
                     j -> strpos('0123456789abcdef',
                                 substr(md5(CAST(doc_id AS VARCHAR)), j, 1)) - 1),
                     (a, b) -> a * 16 + b) AS bucket
          FROM documents
        )
        SELECT doc_id, lang, CAST(bucket AS INT) AS bucket
        FROM b
        WHERE bucket < CASE WHEN lang = 'en' THEN 16384 ELSE 39321 END
    """,
    "text_rare_token_filter": _TOKS
    + """
        , tk AS (SELECT doc_id, unnest(t) AS token FROM toks),
        common AS (
          SELECT token FROM tk GROUP BY token HAVING count(*) >= 3
        ),
        per_doc AS (
          SELECT tk.doc_id, count(*) AS n_tokens,
                 sum(CASE WHEN c.token IS NULL THEN 1 ELSE 0 END) AS n_rare
          FROM tk LEFT JOIN common c ON tk.token = c.token
          GROUP BY tk.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(n_rare, 0) AS BIGINT) AS n_rare,
               CAST(coalesce(n_rare, 0) * 2 <= coalesce(n_tokens, 0) AS INT)
                   AS rt_keep
        FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
    """,
    "text_dsir_select": _TOKS
    + """
        , tw AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(t)),
                        i -> t[i] || chr(31) || t[i+1])) AS g
          FROM tw
        ),
        feat AS (
          SELECT doc_id,
                 list_reduce(list_transform(range(13, 16),
                     j -> strpos('0123456789abcdef', substr(md5(g), j, 1)) - 1),
                     (a, b) -> a * 16 + b) AS b
          FROM bg
        ),
        cr AS (SELECT b, count(*) AS cr FROM feat GROUP BY b),
        ct AS (SELECT b, count(*) AS ct FROM feat
               WHERE doc_id % 10 < 2 GROUP BY b),
        sc AS (
          SELECT cr.b, ((coalesce(ct.ct, 0) + 1) * 1000000) // (cr.cr + 1) AS s
          FROM cr LEFT JOIN ct ON ct.b = cr.b
        ),
        dw AS (
          SELECT doc_id, count(*) AS n_feats, sum(s) AS w_sum,
                 sum(s) // count(*) AS w_avg
          FROM feat JOIN sc ON sc.b = feat.b
          GROUP BY doc_id
        ),
        st AS (SELECT count(*) AS nd, sum(w_avg) AS sw FROM dw)
        SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
               CAST(w_sum AS BIGINT) AS w_sum,
               CAST(w_avg AS BIGINT) AS w_avg,
               CAST(w_avg * nd * 10 >= 12 * sw AS INT) AS selected
        FROM dw, st
    """,
    "text_salient_terms": _TOKS
    + """
        , tk AS (SELECT doc_id, unnest(t) AS token FROM toks),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY doc_id, token),
        df AS (SELECT token, count(*) AS df FROM tf GROUP BY token)
        SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
               CAST(df AS BIGINT) AS df, CAST(term_rank AS INT) AS term_rank
        FROM (
          SELECT tf.doc_id, tf.token, tf.tf, df.df,
                 row_number() OVER (PARTITION BY tf.doc_id
                                    ORDER BY tf.tf DESC, df.df ASC, tf.token)
                     AS term_rank
          FROM tf JOIN df ON tf.token = df.token
        )
        WHERE term_rank <= 3
    """,
    "sample_domain_mix": """
        WITH e AS (
          SELECT doc_id, source,
                 CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 3
                      WHEN CAST(substr(source, 4) AS INT) < 10 THEN 2
                      ELSE 1 END AS epochs
          FROM documents
        )
        SELECT doc_id, source, epochs,
               CAST(unnest(range(0, epochs)) AS INT) AS epoch
        FROM e
    """,
    "text_term_freq": _TOKS
    + """
        SELECT token, count(*) AS freq
        FROM (SELECT unnest(t) AS token FROM toks)
        GROUP BY token ORDER BY freq DESC, token LIMIT 50
    """,
    "text_line_dedup": """
        WITH lraw AS (
          SELECT doc_id,
                 unnest(list_transform(string_split(text, chr(10)),
                        (l, i) -> struct_pack(line_no := i - 1, line := l))) AS s
          FROM documents
        ),
        l2 AS (SELECT doc_id, s.line_no AS line_no, s.line AS line FROM lraw),
        firsts AS (
          SELECT doc_id, line_no, line,
                 row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
          FROM l2 WHERE length(line) >= 10
        ),
        kept AS (
          SELECT doc_id, line_no, line FROM firsts WHERE rn = 1
          UNION ALL
          SELECT doc_id, line_no, line FROM l2 WHERE length(line) < 10
        ),
        agg AS (
          SELECT doc_id, count(*) AS n_kept,
                 md5(string_agg(line, chr(10) ORDER BY line_no)) AS fp
          FROM kept GROUP BY doc_id
        ),
        tot AS (SELECT doc_id, count(*) AS n_lines FROM l2 GROUP BY doc_id)
        SELECT a.doc_id, t.n_lines, a.n_kept, a.fp
        FROM agg a JOIN tot t ON t.doc_id = a.doc_id
    """,
}

def q_text_line_dedup(spark, sf_dir):
    """X4: C4-style CORPUS-LEVEL line dedup — every line of length >= 10
    is kept only at its first occurrence across the whole corpus (first =
    lowest (doc_id, line_no)); shorter lines always pass through.  Each
    document is reassembled from its surviving lines in order.

    Scale shape: posexplode -> one hash(line) exchange for the
    first-occurrence window -> join back on (doc_id, line_no) -> per-doc
    regroup.  The >= 10 length floor keeps degenerate hot keys (empty
    lines, bullets) out of the exchange — they bypass dedup entirely, so
    the hottest keys never shuffle.  Output carries md5 of the
    reassembled text, not the text, so the result stays narrow."""
    d = _docs(spark, sf_dir)
    lines = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), "\n")).alias("line_no", "line")
    )
    # ONE window over all lines: dedup-eligible lines (len >= 10) key by
    # content; short lines get a per-row unique key (disjoint 'S' prefix)
    # so they are always rank 1 — no filter+union branch, no second scan
    # of the exploded frame, and the degenerate hot keys (empty lines,
    # bullets) never share a window partition
    pkey = F.when(
        F.length("line") >= 10, F.concat(F.lit("L"), F.col("line"))
    ).otherwise(
        F.concat_ws("\x00", F.lit("S"), F.col("doc_id"), F.col("line_no"))
    )
    w = Window.partitionBy(pkey).orderBy("doc_id", "line_no")
    kept = (
        lines.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    totals = d.select(
        "doc_id", F.size(F.split(F.col("text"), "\n")).cast("long").alias("n_lines")
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                        lambda s: s["line"],
                    ),
                    "\n",
                )
            ).alias("fp"),
        )
        .join(totals, "doc_id")
        .select("doc_id", "n_lines", "n_kept", "fp")
    )



def q_text_pii_scrub(spark, sf_dir):
    """PII redaction — the compliance pass every training-data pipeline
    runs before release: regex-scrub emails, phone numbers, IPv4 AND
    IPv6 addresses, credit-card numbers (with a LUHN post-filter — a
    16-digit candidate is only redacted when its checksum validates,
    the shape/validity split every real scrubber implements) and
    SSN-shaped national IDs; emit per-type counts + the scrubbed
    text's hash.  The fixture corpus carries no natural PII, so it is
    synthesized deterministically from doc_id first (every doc gains an
    email; % 3 a 555- phone; % 4 an RFC-1918 IP; % 6 an IPv6; % 5 a
    4xxx-....-.... card candidate whose check digit comes from doc_id —
    so ~10% validate and the Luhn filter decides, not the synth; % 9 an
    SSN shape) — the synthesize->operate->verify pattern.  The patterns
    stay inside the Java-regex/RE2 COMMON SUBSET (character classes,
    bounded repeats, greedy group repeats, \\b, no alternation/
    backrefs), where leftmost-first (Java) and leftmost-longest (RE2)
    agree; the Luhn arithmetic is the same integer fold on both sides —
    so Spark and DuckDB produce byte-identical scrubbed text and the
    oracle is exact on the full md5, not just the counts.  Scale shape:
    map-only, one scan, zero shuffles — the Luhn filter is an in-row
    fold over at most a handful of candidates per document."""
    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    pii = F.concat(
        F.col("text"),
        F.lit(" contact user"), did.cast("string"),
        F.lit("@mail"), (did % 5).cast("string"), F.lit(".example.com"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" call 555-"), (1000 + did % 9000).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" from 10."), (did % 256).cast("string"),
                F.lit("."), ((3 * did) % 256).cast("string"),
                F.lit("."), ((7 * did) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 6 == 0,
            F.concat(
                F.lit(" via 2001:db8:"), F.hex(did % 4096),
                F.lit(":"), F.hex((5 * did) % 4096),
                F.lit("::"), F.hex((9 * did) % 4096),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" card "), (4000 + did % 1000).cast("string"),
                F.lit("-"), (1000 + (3 * did) % 9000).cast("string"),
                F.lit("-"), (1000 + (7 * did) % 9000).cast("string"),
                F.lit("-"), (1000 + (11 * did) % 9000).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 9 == 0,
            F.concat(
                F.lit(" ssn "), (100 + did % 900).cast("string"),
                F.lit("-"), (10 + did % 90).cast("string"),
                F.lit("-"), (1000 + (13 * did) % 9000).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    email = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    ipv6 = r"\b[0-9a-fA-F]{1,4}(:[0-9a-fA-F]{0,4}){2,7}\b"
    ip = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    card = r"\b\d{4}-\d{4}-\d{4}-\d{4}\b"
    nid = r"\b\d{3}-\d{2}-\d{4}\b"
    phone = r"\b\d{3}-\d{4}\b"

    def luhn_ok(c):
        # i counts from the RIGHT (1-based); even positions double,
        # digits of the doubled value sum via the >9 ? x-9 : x fold
        s = F.replace(c, F.lit("-"), F.lit(""))

        def term(i):
            dgt = F.ascii(F.substring(s, 17 - i, 1)) - 48
            return F.when(
                i % 2 == 0,
                F.when(dgt * 2 > 9, dgt * 2 - 9).otherwise(dgt * 2),
            ).otherwise(dgt)

        total = F.aggregate(
            F.sequence(F.lit(1), F.lit(16)), F.lit(0),
            lambda acc, i: acc + term(i),
        )
        return total % 10 == 0

    valid_cards = F.filter(
        F.regexp_extract_all(F.col("pii_text"), F.lit(card), F.lit(0)), luhn_ok
    )
    base = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("pii_text"), email, "<EMAIL>"),
            ipv6, "<IPV6>",
        ),
        ip, "<IP>",
    )
    carded = F.aggregate(
        valid_cards, base, lambda acc, c: F.replace(acc, c, F.lit("<CARD>"))
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(carded, nid, "<NID>"), phone, "<PHONE>"
    )
    return d.select("doc_id", pii.alias("pii_text")).select(
        "doc_id",
        F.regexp_count(F.col("pii_text"), F.lit(email)).alias("n_emails"),
        F.regexp_count(F.col("pii_text"), F.lit(ipv6)).alias("n_ipv6"),
        F.regexp_count(F.col("pii_text"), F.lit(ip)).alias("n_ips"),
        F.size(valid_cards).alias("n_cards"),
        F.regexp_count(F.col("pii_text"), F.lit(nid)).alias("n_nids"),
        F.regexp_count(F.col("pii_text"), F.lit(phone)).alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).alias("scrubbed_len"),
    )



def q_text_chunk_windows(spark, sf_dir):
    """Overlapping token-window CHUNKING — the RAG/pretraining prep op
    that splits each document into fixed-size windows with stride
    overlap (window 64 tokens, stride 48 -> 16-token overlap).  Chunk
    offsets are generated IN-ROW (F.sequence + explode: no join, no
    shuffle — at 100 TB chunking rides the scan), the window itself is
    an array slice of the materialized token array, identified by the
    md5 of its joined tokens.  Zero-token docs produce zero chunks
    (empty sequence), trailing chunks are short by construction."""
    W, S = 64, 48
    d = _docs(spark, sf_dir)
    base = d.select(
        "doc_id", X.tokens(F.col("text")).alias("t")
    ).withColumn("n", F.size("t").cast("long"))
    # a chunk is emitted only when it covers NEW tokens: the last start
    # is the smallest multiple of S whose window reaches the doc end, so
    # a doc of exactly W tokens yields ONE chunk, not a redundant tail
    offs = F.explode(
        F.sequence(
            F.lit(0).cast("long"),
            F.greatest(F.col("n") - (W - S) - 1, F.lit(0).cast("long")),
            F.lit(S).cast("long"),
        )
    )
    chunk = F.slice("t", F.col("start_tok").cast("int") + 1, W)
    return (
        base.filter(F.col("n") > 0)
        .select("doc_id", "t", "n", offs.alias("start_tok"))
        .select(
            "doc_id",
            F.floor(F.col("start_tok") / S).cast("long").alias("chunk_id"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.least(F.lit(W).cast("long"), F.col("n") - F.col("start_tok")).alias(
                "n_chunk_tokens"
            ),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )



def q_text_dup_span_removal(spark, sf_dir):
    """Exact duplicated-SUBSTRING span removal — the published
    training-data dedup that document-level methods miss (Lee et al.
    2022, 'Deduplicating Training Data Makes Language Models Better':
    cut exact substrings that appear more than once in the corpus, even
    when the containing documents differ).  Distributed approximation
    of the suffix-array pass: every 12-token gram is hashed in-row
    (rides the scan), a gram occurring > 1 time anywhere in the corpus
    flags its span, and per document the flagged [start, start+11]
    spans merge into maximal intervals (gaps-and-islands windows) — the
    spans a pipeline would cut before training.  Gram frequency is a
    groupBy (map-side partial agg: a corpus-hottest gram — license
    boilerplate at 10^7 occurrences — collapses to one partial count
    per map task, never a single-task window buffer) joined back onto
    the gram stream; the join's probe side is skew-splittable by AQE
    because the build side is one row per gh.  The gram stream has TWO
    consumers (the frequency agg and the probe side), so like the LSH
    shingle frame it goes through the content-keyed parquet storage
    checkpoint (functions/dedup.stage_parquet) — the tokenize+md5
    lineage runs once per corpus, not once per consumer (measured
    2.7 s -> sub-second warm at sf0.1; the 100 TB posture: derived
    corpus-scale frames go to storage, not recomputed per consumer).
    Shuffles after the checkpoint scan: the gram-count exchange, the
    join, and the per-doc island window (bounded by document length);
    all integer arithmetic + md5-derived int64 hashes, exact SQL
    oracle."""
    W = 12
    d = _docs(spark, sf_dir)
    toks = X.tokens(F.col("text"))
    base = d.select("doc_id", toks.alias("t")).withColumn(
        "n", F.size("t").cast("long")
    )
    starts = F.when(
        F.col("n") >= W,
        F.sequence(F.lit(1).cast("long"), F.col("n") - (W - 1)),
    ).otherwise(F.array().cast("array<long>"))
    g = (
        base.select("doc_id", "t", F.explode(starts).alias("start_tok"))
        .select(
            "doc_id",
            "start_tok",
            (F.col("start_tok") + (W - 1)).alias("end_tok"),
            # 60-bit int64 gram hash (the dedup-module shingle
            # discipline): both shuffles and the join move 8-byte longs
            # instead of 32-char md5 strings — measured 2.75 s -> ~1.8 s
            # warm at sf0.1 for the same plan shape
            F.conv(
                F.substring(
                    F.md5(
                        F.array_join(
                            F.slice("t", F.col("start_tok").cast("int"), W), " "
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("gh"),
        )
    )
    # storage checkpoint (v1 tag: bump when the gram derivation above
    # changes — the code fingerprint in _ckpt_dir covers text.py, not
    # this module)
    from ..functions.dedup import stage_parquet
    from .dedup_q import _ckpt_dir

    g = stage_parquet(g, _ckpt_dir(sf_dir, "dupspan_g12_v1"))
    # dup-gram set: one row per distinct 12-gram hash that occurs more
    # than once corpus-wide.  NOT a window over gh — WindowExec buffers
    # each key's rows in one task, so a boilerplate gram shared by 30%
    # of documents would pin a single task at 100 TB.  The aggregate's
    # map-side combine bounds per-key traffic at one row per map task,
    # and the join back is AQE-skew-splittable.
    dup_gh = g.groupBy("gh").agg(F.count("*").alias("cnt")).filter(
        F.col("cnt") > 1
    )
    flagged = g.join(dup_gh, "gh")
    w_doc = Window.partitionBy("doc_id").orderBy("start_tok")
    prev_end = F.max("end_tok").over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_isl = (
        F.col("start_tok") > F.coalesce(prev_end, F.lit(-1)) + 1
    ).cast("long")
    isl = flagged.withColumn("new_isl", new_isl).withColumn(
        "island",
        F.sum("new_isl").over(
            w_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return isl.groupBy("doc_id", F.col("island").alias("span_id")).agg(
        F.min("start_tok").alias("start_tok"),
        F.max("end_tok").alias("end_tok"),
        (F.max("end_tok") - F.min("start_tok") + 1).alias("span_tokens"),
    )


def q_pipeline_length_buckets(spark, sf_dir):
    """LENGTH-BUCKETED BATCH PACKING (round 16, X4 — the padding-
    efficiency op every fixed-context training pipeline runs before
    batching): documents batched together pad to the batch's longest
    member, so batching short and long docs together wastes compute —
    the standard fix is length bucketing by EXACT token-count
    quartiles, then batching within buckets.

    Distributed shape for the quantile step: the corpus never sorts
    globally — token counts have a BOUNDED VALUE DOMAIN (hundreds of
    distinct lengths at any corpus size), so exact quartile thresholds
    come from a VALUE HISTOGRAM (one groupBy(n_tokens).count(), tiny
    by contract like the sim_q codebook folds) cumulated on the
    driver; thresholds broadcast back as literals.  t_b = the smallest
    length whose cumulative count reaches ceil(n*(b+1)/4) (integer
    arithmetic, deterministic under ties).

    Output: one row per bucket (0..3) plus the UNBUCKETED baseline
    (bucket = -1, cap = global max): n_docs, cap (the bucket's pad
    target), sum_tokens, padded = n_docs * cap, and waste_bp — the
    basis points of padded compute that is padding.  The buckets'
    total padded cost is strictly below the baseline's (test-pinned):
    the row MEASURES the efficiency win instead of asserting it.
    Exact oracle: the same histogram -> threshold -> CASE arithmetic
    in SQL."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(X.tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    hist = sorted(
        (r["n_tokens"], r["cnt"])
        for r in d.groupBy("n_tokens").agg(F.count("*").alias("cnt")).collect()
    )
    n = sum(c for _, c in hist)
    thresholds, cum, b = [], 0, 0
    for v, c in hist:
        cum += c
        while b < 3 and cum >= (n * (b + 1) + 3) // 4:
            thresholds.append(v)
            b += 1
    t0, t1, t2 = thresholds
    bucket = (
        F.when(F.col("n_tokens") <= t0, 0)
        .when(F.col("n_tokens") <= t1, 1)
        .when(F.col("n_tokens") <= t2, 2)
        .otherwise(3)
    )
    per = d.select("n_tokens", bucket.alias("bucket"))
    summary = (
        per.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n_tokens").alias("cap"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .unionByName(
            per.agg(
                F.lit(-1).alias("bucket"),
                F.count("*").alias("n_docs"),
                F.max("n_tokens").alias("cap"),
                F.sum("n_tokens").alias("sum_tokens"),
            )
        )
    )
    return summary.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("cap").cast("long").alias("cap"),
        F.col("sum_tokens").cast("long").alias("sum_tokens"),
        (F.col("n_docs") * F.col("cap")).cast("long").alias("padded"),
    ).withColumn(
        # exact integer division on both engines (no double rounding)
        "waste_bp",
        F.expr("(10000 * (padded - sum_tokens)) div padded").cast("long"),
    )


QUERIES = {
    "text_token_stats": q_text_token_stats,
    "text_line_dedup": q_text_line_dedup,
    "pipeline_length_buckets": q_pipeline_length_buckets,
    "text_quality": q_text_quality,
    "text_gopher_rules": q_text_gopher_rules,
    "text_quality_classifier": q_text_quality_classifier,
    "text_repetition_rules": q_text_repetition_rules,
    "text_pack_sequences": q_text_pack_sequences,
    "text_lang_id": q_text_lang_id,
    "text_fingerprint": q_text_fingerprint,
    "text_term_freq": q_text_term_freq,
    "sample_hash_split": q_sample_hash_split,
    "sample_global_shuffle": q_sample_global_shuffle,
    "agg_countmin_heavy_hitters": q_agg_countmin_heavy_hitters,
    "text_collocations": q_text_collocations,
    "text_decontaminate": q_text_decontaminate,
    "sample_stratified": q_sample_stratified,
    "sample_domain_mix": q_sample_domain_mix,
    "text_rare_token_filter": q_text_rare_token_filter,
    "text_salient_terms": q_text_salient_terms,
    "text_dsir_select": q_text_dsir_select,
    "text_pii_scrub": q_text_pii_scrub,
    "text_chunk_windows": q_text_chunk_windows,
    "text_dup_span_removal": q_text_dup_span_removal,
    "text_bm25_topk": q_text_bm25_topk,
    "sim_hybrid_rrf_topk": q_sim_hybrid_rrf_topk,
    "sim_hybrid_index_rrf_topk": q_sim_hybrid_index_rrf_topk,
    "text_ngram_lm": q_text_ngram_lm,
    "text_bpe_train": q_text_bpe_train,
    "text_bpe_encode": q_text_bpe_encode,
}

# bigram stupid-backoff LM — integer 1e6-scale transition scores, the
# same in-row tail-zip bigram derivation, inner joins drop <2-token docs
# on both engines identically
ORACLES["text_ngram_lm"] = """
    WITH toks0 AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), tk AS (
      SELECT doc_id, unnest(t) AS tok FROM toks0
    ), bg AS (
      SELECT doc_id, p[1] AS tok, p[2] AS nxt
      FROM (SELECT doc_id,
                   unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p
            FROM toks0)
    ), uni AS (
      SELECT tok, count(*) AS c1 FROM tk GROUP BY tok
    ), tot AS (
      SELECT count(*) AS tn FROM tk
    ), big AS (
      SELECT tok, nxt, count(*) AS c2 FROM bg GROUP BY tok, nxt
    ), scored AS (
      SELECT bg.doc_id,
             CASE WHEN big.c2 >= 2 THEN (big.c2 * 1000000) // u1.c1
                  ELSE (4 * u2.c1 * 1000000) // (10 * tot.tn) END AS s
      FROM bg
      JOIN big ON bg.tok = big.tok AND bg.nxt = big.nxt
      JOIN uni u1 ON u1.tok = bg.tok
      JOIN uni u2 ON u2.tok = bg.nxt
      CROSS JOIN tot
    ), per_doc AS (
      SELECT doc_id,
             count(*) AS n_bigrams,
             CAST(sum(s) AS BIGINT) AS lm_score,
             CAST(sum(s) // count(*) AS BIGINT) AS avg_score
      FROM scored GROUP BY doc_id
    ), g AS (
      SELECT count(*) AS nd, CAST(sum(avg_score) AS BIGINT) AS sa FROM per_doc
    )
    SELECT doc_id, n_bigrams, lm_score, avg_score,
           CAST(avg_score * nd * 4 < sa AS INT) AS low_quality
    FROM per_doc, g
"""

ORACLES["text_bpe_train"] = _TOKS + _bpe_oracle(BPE_MERGES)
# encode oracle: the SAME training CTE chain minus the final merge
# selects, plus the nested-replace application over the corpus
ORACLES["text_bpe_encode"] = (
    _TOKS
    + _bpe_oracle(BPE_MERGES).rsplit("SELECT CAST(1", 1)[0].rstrip().rstrip(",")
    + _bpe_encode_oracle(BPE_MERGES)
)

# BM25 oracle: same formula TEXT, same token-sorted left fold (DuckDB
# list(c ORDER BY tok) + list_reduce), same (score DESC, doc_id)
# tie-break — raw double scores hash-match (see q_text_bm25_topk).
_BM25_VALUES = ", ".join(f"({qid}, '{tok}')" for qid, tok in BM25_QUERIES)
# hybrid RRF fusion: the full BM25 chain (top-5) + the integer-L2
# vector chain (top-5 over doc vectors = embeddings with vec_id ==
# doc_id; query vectors at vec_id = 1000 + 37*q_id) fused by
# 1e6 div (60 + rank) — all ranks and the fusion integer-exact
ORACLES["sim_hybrid_rrf_topk"] = (
    _TOKS
    + f"""
    , tf AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(len(t)) AS DOUBLE) AS total
      FROM toks
    ), dfreq AS (
      SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
    ), q(q_id, tok) AS (VALUES {_BM25_VALUES}
    ), contrib AS (
      SELECT q.q_id, tf.doc_id, tf.tok,
             ((s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * ((tf.tf * 2.2)
                / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (s.total / s.n)))) AS c
      FROM q
      JOIN tf ON tf.tok = q.tok
      JOIN dfreq ON dfreq.tok = q.tok
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    ), scored_t AS (
      SELECT q_id, doc_id,
             list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY tok)),
                 (acc, x) -> acc + x
             ) AS score
      FROM contrib GROUP BY 1, 2
    ), ranked_t AS (
      SELECT q_id, doc_id, rt FROM (
        SELECT q_id, doc_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY score DESC, doc_id) AS rt
        FROM scored_t) WHERE rt <= 5
    ), dv AS (
      SELECT e.vec_id AS doc_id,
             list_transform(e.embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS xq
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    ), qv AS (
      SELECT qq.q_id,
             list_transform(e.embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q_xq
      FROM (SELECT DISTINCT q_id FROM q) qq
      JOIN embeddings e ON e.vec_id = 1000 + 37 * qq.q_id
    ), ranked_v AS (
      SELECT q_id, doc_id, rv FROM (
        SELECT qv.q_id, dv.doc_id,
               row_number() OVER (PARTITION BY qv.q_id ORDER BY
                 list_sum(list_transform(list_zip(qv.q_xq, dv.xq),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))), dv.doc_id) AS rv
        FROM qv CROSS JOIN dv) WHERE rv <= 5
    ), fused AS (
      SELECT coalesce(t.q_id, v.q_id) AS q_id,
             coalesce(t.doc_id, v.doc_id) AS doc_id,
             CAST(coalesce(1000000 // (60 + t.rt), 0)
                  + coalesce(1000000 // (60 + v.rv), 0) AS BIGINT) AS rrf
      FROM ranked_t t FULL JOIN ranked_v v
        ON t.q_id = v.q_id AND t.doc_id = v.doc_id
    )
    SELECT q_id, doc_id, CAST(fused_rank AS INT) AS fused_rank, rrf
    FROM (SELECT q_id, doc_id, rrf,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY rrf DESC, doc_id) AS fused_rank
          FROM fused)
    WHERE fused_rank <= 5
"""
)

ORACLES["text_bm25_topk"] = (
    _TOKS
    + f"""
    , tf AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(len(t)) AS DOUBLE) AS total
      FROM toks
    ), dfreq AS (
      SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
    ), q(q_id, tok) AS (VALUES {_BM25_VALUES}
    ), contrib AS (
      SELECT q.q_id, tf.doc_id, tf.tok,
             ((s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * ((tf.tf * 2.2)
                / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (s.total / s.n)))) AS c
      FROM q
      JOIN tf ON tf.tok = q.tok
      JOIN dfreq ON dfreq.tok = q.tok
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    ), scored AS (
      SELECT q_id, doc_id,
             list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY tok)),
                 (acc, x) -> acc + x
             ) AS score
      FROM contrib GROUP BY 1, 2
    ), ranked AS (
      SELECT q_id, doc_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rnk
      FROM scored
    )
    SELECT q_id, doc_id, CAST(rnk AS INT) AS rank, score
    FROM ranked WHERE rnk <= {BM25_K}
"""
)


# hybrid over the PERSISTED index: same BM25 leg; the vector leg
# replays the stored integer k-means (c0->c2), the base+arrival
# postings, the nprobe=2 probes and the doc-id restriction — the exact
# cells the Spark side serves from parquet
ORACLES["sim_hybrid_index_rrf_topk"] = (
    _TOKS
    + f"""
    , tf AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(len(t)) AS DOUBLE) AS total
      FROM toks
    ), dfreq AS (
      SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
    ), q(q_id, tok) AS (VALUES {_BM25_VALUES}
    ), contrib AS (
      SELECT q.q_id, tf.doc_id, tf.tok,
             ((s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * ((tf.tf * 2.2)
                / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (s.total / s.n)))) AS c
      FROM q
      JOIN tf ON tf.tok = q.tok
      JOIN dfreq ON dfreq.tok = q.tok
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    ), scored_t AS (
      SELECT q_id, doc_id,
             list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY tok)),
                 (acc, x) -> acc + x
             ) AS score
      FROM contrib GROUP BY 1, 2
    ), ranked_t AS (
      SELECT q_id, doc_id, rt FROM (
        SELECT q_id, doc_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY score DESC, doc_id) AS rt
        FROM scored_t) WHERE rt <= 5
    ), emq AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS xq
      FROM embeddings
    ), c0 AS (SELECT CAST(vec_id AS INT) AS cid, xq AS c_vec FROM emq WHERE vec_id < 8),
    a1 AS (
      SELECT vec_id, xq, cell FROM (
        SELECT emq.vec_id, emq.xq, c.cid AS cell,
               row_number() OVER (PARTITION BY emq.vec_id ORDER BY
                 list_sum(list_transform(list_zip(emq.xq, c.c_vec),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rn
        FROM emq CROSS JOIN c0 c
      ) WHERE rn = 1
    ),
    s1 AS (
      SELECT cell, pos, sum(v) AS s, count(*) AS n
      FROM (SELECT cell, unnest(xq) AS v,
                   generate_subscripts(xq, 1) AS pos FROM a1)
      GROUP BY cell, pos
    ),
    c1 AS (
      SELECT cell AS cid,
             list(CAST((s - (((s % n) + n) % n)) // n AS BIGINT)
                  ORDER BY pos) AS c_vec
      FROM s1 GROUP BY cell
    ),
    a2 AS (
      SELECT vec_id, xq, cell FROM (
        SELECT emq.vec_id, emq.xq, c.cid AS cell,
               row_number() OVER (PARTITION BY emq.vec_id ORDER BY
                 list_sum(list_transform(list_zip(emq.xq, c.c_vec),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rn
        FROM emq CROSS JOIN c1 c
      ) WHERE rn = 1
    ),
    s2 AS (
      SELECT cell, pos, sum(v) AS s, count(*) AS n
      FROM (SELECT cell, unnest(xq) AS v,
                   generate_subscripts(xq, 1) AS pos FROM a2)
      GROUP BY cell, pos
    ),
    c2 AS (
      SELECT cell AS cid,
             list(CAST((s - (((s % n) + n) % n)) // n AS BIGINT)
                  ORDER BY pos) AS c_vec
      FROM s2 GROUP BY cell
    ),
    corpus AS (
      SELECT vec_id, xq FROM emq
      UNION ALL
      SELECT vec_id + 2000000, list_transform(xq, x -> x + 3)
      FROM emq WHERE vec_id % 9 = 0
    ),
    postings AS (
      SELECT vec_id, xq, cell FROM (
        SELECT co.vec_id, co.xq, c.cid AS cell,
               row_number() OVER (PARTITION BY co.vec_id ORDER BY
                 list_sum(list_transform(list_zip(co.xq, c.c_vec),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rn
        FROM corpus co CROSS JOIN c2 c
      ) WHERE rn = 1
    ),
    qv AS (
      SELECT qq.q_id,
             list_transform(e.embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q_xq
      FROM (SELECT DISTINCT q_id FROM q) qq
      JOIN embeddings e ON e.vec_id = 1000 + 37 * qq.q_id
    ),
    probes AS (
      SELECT q_id, q_xq, cell FROM (
        SELECT qv.q_id, qv.q_xq, c.cid AS cell,
               row_number() OVER (PARTITION BY qv.q_id ORDER BY
                 list_sum(list_transform(list_zip(qv.q_xq, c.c_vec),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rn
        FROM qv CROSS JOIN c2 c
      ) WHERE rn <= 2
    ),
    ranked_v AS (
      SELECT q_id, doc_id, rv FROM (
        SELECT pr.q_id, po.vec_id AS doc_id,
               row_number() OVER (PARTITION BY pr.q_id ORDER BY
                 list_sum(list_transform(list_zip(pr.q_xq, po.xq),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))), po.vec_id) AS rv
        FROM probes pr
        JOIN postings po ON po.cell = pr.cell
        JOIN documents dd ON dd.doc_id = po.vec_id
      ) WHERE rv <= 5
    ), fused AS (
      SELECT coalesce(t.q_id, v.q_id) AS q_id,
             coalesce(t.doc_id, v.doc_id) AS doc_id,
             CAST(coalesce(1000000 // (60 + t.rt), 0)
                  + coalesce(1000000 // (60 + v.rv), 0) AS BIGINT) AS rrf
      FROM ranked_t t FULL JOIN ranked_v v
        ON t.q_id = v.q_id AND t.doc_id = v.doc_id
    )
    SELECT q_id, doc_id, CAST(fused_rank AS INT) AS fused_rank, rrf
    FROM (SELECT q_id, doc_id, rrf,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY rrf DESC, doc_id) AS fused_rank
          FROM fused)
    WHERE fused_rank <= 5
"""
)
