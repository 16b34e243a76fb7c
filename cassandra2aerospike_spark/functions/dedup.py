"""Deduplication operators (north-star X1/X2): exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design: every method reduces to hash-groupBy / equi-join on derived
keys — no pairwise O(n²) pass ever touches the full corpus.  Candidate
generation (shared shingle, LSH band bucket, SimHash band) prunes first;
exact verification runs only on candidates.  All hashes derive from md5
(bit-identical across engines), so even MinHash signatures are
oracle-checkable in SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources import spread
from .text import fingerprint, shingles_of, tokens


def stage_parquet(df: DataFrame, path: str) -> DataFrame:
    """Storage checkpoint: write `df` to parquet once (marker-guarded) and
    return a clean scan of it.

    This is the 100 TB materialization mechanism for a corpus-sized
    derived frame with multiple consumers.  A MEMORY_AND_DISK persist of
    such a frame competes with every downstream shuffle for executor
    memory and decays sublinearly under pressure (measured: the round-5
    3x dedup scale slope was 0.66 with the hot persist); a parquet
    checkpoint is bounded, spill-free, shareable across queries and
    sessions, and each consumer gets a columnar scan with pruning.  The
    caller owns the cache key in `path` (content/mtime/code-derived — see
    queries/dedup_q.py) so a stale checkpoint can never outlive its
    source.

    Concurrency: two sessions sharing a cache key must not interleave
    writes or overwrite a directory mid-scan.  Local/POSIX paths get
    write-to-unique-tmp + atomic os.rename into the keyed path (first
    rename wins; losers wait for the winner's marker).  Paths with a
    non-file URI scheme (hdfs://, s3a://, ...) go through the session's
    Hadoop FileSystem for the marker probe/create — driver-local
    os.path.exists would be always-false there, forcing a full rewrite
    per call and then raising on open() — with create-if-absent marker
    semantics (atomic on HDFS; last-writer-wins on object stores, where
    both writers produced identical content under the same key)."""
    spark = df.sparkSession
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme not in ("", "file"):
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        marker = jvm.org.apache.hadoop.fs.Path(path + "/_GRAFT_DONE")
        if not fs.exists(marker):
            df.write.mode("overwrite").parquet(path)
            fs.createNewFile(marker)
        return spark.read.parquet(path)
    path = os.path.abspath(path[7:] if path.startswith("file://") else path)
    marker = os.path.join(path, "_GRAFT_DONE")
    if not os.path.exists(marker):
        import shutil
        import tempfile
        import time
        import uuid

        parent = os.path.dirname(path)
        os.makedirs(parent, exist_ok=True)
        tmp = os.path.join(parent, f".{os.path.basename(path)}.tmp-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        open(os.path.join(tmp, "_GRAFT_DONE"), "w").write("ok")
        try:
            os.rename(tmp, path)  # atomic publish; fails if a winner exists
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            deadline = time.time() + 300
            while not os.path.exists(marker):  # winner mid-write: await marker
                if time.time() > deadline:
                    raise TimeoutError(
                        f"stage_parquet: {path} exists without _GRAFT_DONE "
                        "after 300s (crashed writer?); remove it to retry"
                    )
                time.sleep(0.1)
    return spark.read.parquet(path)


def _materialize_sets(sets: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Materialize the per-doc shingle-set frame for its 3 consumers
    (signatures + both sides of Jaccard verification): parquet checkpoint
    when a directory is provided (the scale path), MEMORY_AND_DISK
    persist otherwise (ad-hoc frames with no natural cache key)."""
    if checkpoint_dir is not None:
        return stage_parquet(sets, checkpoint_dir)
    from pyspark import StorageLevel

    return sets.persist(StorageLevel.MEMORY_AND_DISK)


def _tokenized(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, toks) spread across cores.  Two-level shape:

    - spread_scan first: the regex tokenizer itself must run AFTER an
      exchange, else it executes in the scan stage with the scan's
      parallelism (one task for a single small parquet file — measured
      ~4 s single-core at sf0.1).  A no-op at real input-split counts.
    - spread(doc_id) above the tokenizer: the keyed exchange doubles as a
      projection-collapse barrier — downstream shingle lambdas reference
      the materialized token array, so the tokenizer runs once per doc,
      not once per shingle position (interpreted higher-order lambdas
      would otherwise re-run the inlined split ~n_shingles times) — and
      doc_id-keyed consumers (groupBy/join) reuse the partitioning."""
    from ..sources import spread_scan

    raw = spread_scan(docs.select("doc_id", F.col(text_col).alias("_text")))
    return spread(
        raw.select("doc_id", tokens(F.col("_text")).alias("toks")), "doc_id"
    )


def exact_clusters(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """X1: exact dedup via content-hash groupBy.  One shuffle on the hash;
    at 100 TB this is the canonical map-side-combine aggregation."""
    return (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("cluster_size"))
    )


def shingle_frame(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Exploded (doc_id, shingle) pairs with per-doc shingle counts.

    Repartitioned by doc_id pre-explode: the signature/size groupBys on
    doc_id then reuse this exchange instead of shuffling the k×-exploded
    shingle rows (see sources.spread)."""
    return _tokenized(docs, text_col).select(
        "doc_id", F.explode(shingles_of(F.col("toks"), k)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.6,
    text_col: str = "text",
    df_cap: int = 64,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """X2 exact n-gram Jaccard over candidate pairs that share >= 1 shingle.

    intersection counts come from a self-equi-join on the shingle key;
    union sizes from per-doc counts; Jaccard = |∩| / (|A| + |B| - |∩|) is
    exact integer arithmetic until the final division.

    Skew guard (the scale-killer fix): shingles whose document frequency
    exceeds `df_cap` generate NO candidates — a stop-shingle in d
    documents would otherwise fan out d² join rows (quadratic on exactly
    the hottest keys).  Candidate fanout per shingle is now bounded by
    df_cap².  The surviving candidates are then verified EXACTLY against
    the full per-doc shingle sets (array_intersect in-row, same shape as
    the LSH verification path), so reported Jaccard is exact — the cap
    affects candidate RECALL only: a qualifying pair is missed iff every
    shared shingle is a stop shingle, which at threshold >= 0.6 means two
    documents built almost entirely of corpus-hottest n-grams.
    """
    sets = _materialize_sets(shingle_sets(docs, k, text_col), checkpoint_dir)
    sh = sets.select("doc_id", F.explode("sh_set").alias("shingle"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("shingle")
    )
    sh = sh.join(rare, "shingle")
    a = sh.alias("a")
    b = sh.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return jaccard_on_candidates(cand, sets, threshold).select(
        "doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard"
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    t_num: int = 3,
    t_den: int = 5,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """X2 exact n-gram Jaccard with PREFIX-FILTER candidate generation —
    the AllPairs/PPJoin shape (Bayardo et al., WWW'07): ZERO recall loss
    at the threshold, unlike `jaccard_pairs`' df_cap stop-shingle guard
    (which documents a recall caveat).

    Under a global shingle order by ASCENDING document frequency (ties
    by shingle value), a pair with J(A,B) >= t must share its SMALLEST
    common shingle inside both docs' prefixes of length
    |X| - ceil(t*|X|) + 1: the overlap is >= ceil(t*|X|) and every
    shared element sits at or after the smallest one, which therefore
    cannot be pushed past position |X| - overlap + 1.  So joining only
    PREFIX tokens finds every qualifying pair, while the join touches
    the corpus-RAREST shingles — the exact opposite of the hot-key
    blowup the df_cap guard exists to dodge.  A length filter
    (t_den*min >= t_num*max, integer-exact) prunes size-incompatible
    pairs in the join condition.

    The threshold rides as a RATIONAL t_num/t_den: prefix lengths use
    ceil(t_num*n / t_den) in integer arithmetic — a float ceil(0.6*5)
    is 4, not 3, and a too-short prefix silently loses recall, which is
    the one property this operator exists to guarantee.

    Scale shape: one groupBy(shingle) for df, one per-doc window rank
    (bounded by doc length), a self-join on PREFIX shingles only, then
    the in-row array_intersect verification on the (tiny) candidates.
    """
    from pyspark.sql import Window

    threshold = t_num / t_den
    sets = _materialize_sets(shingle_sets(docs, k, text_col), checkpoint_dir)
    sh = sets.select(
        "doc_id", F.size("sh_set").alias("n"), F.explode("sh_set").alias("shingle")
    )
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = sh.join(dfreq, "shingle").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "shingle")
        ),
    )
    # p = n - ceil(t_num*n/t_den) + 1, all-integer (see docstring)
    req = F.floor((F.lit(t_num) * F.col("n") + F.lit(t_den - 1)) / F.lit(t_den))
    pfx = ranked.filter(F.col("rnk") <= F.col("n") - req + 1).select(
        "doc_id", "n", "shingle"
    )
    a, b = pfx.alias("a"), pfx.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: J >= t  =>  t_den*min(n) >= t_num*max(n)
            & (
                F.lit(t_den) * F.least("a.n", "b.n")
                >= F.lit(t_num) * F.greatest("a.n", "b.n")
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return jaccard_on_candidates(cand, sets, threshold).select(
        "doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard"
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 16, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-doc MinHash signature (array<long>; same hash family as
    minhash_from_sets)."""
    return minhash_from_shingles(shingle_frame(docs, k, text_col), n_hashes)


def minhash_from_shingles(sh: DataFrame, n_hashes: int = 16) -> DataFrame:
    """MinHash signatures from a prebuilt exploded (doc_id, shingle) frame
    — the aggregation (one-shuffle) twin of the narrow minhash_from_sets,
    same universal-hash family, identical signatures."""
    x = shingle_hash64(F.col("shingle")) % MINHASH_P
    aggs = [
        F.min((F.lit(minhash_a(i)) * x + F.lit(minhash_b(i))) % MINHASH_P).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )


# Universal-hash family over the 31-bit prime field: h_i(x) = (a_i x + b_i)
# mod P.  All operands stay < 2^62, so the arithmetic is overflow-free
# int64 on every engine (Spark wraps, DuckDB raises — neither happens).
MINHASH_P = 2_147_483_647


def minhash_a(i: int) -> int:
    return (i * 2_654_435_761 + 1) % MINHASH_P


def minhash_b(i: int) -> int:
    return (i * 40_503 + 7) % MINHASH_P


def shingle_hash64(s: Column) -> Column:
    """Shingle -> 60-bit int64 via md5 prefix (engine-portable: DuckDB
    reproduces it by folding the first 15 hex chars)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def shingle_sets(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, sh_set) with the doc's distinct shingles HASHED to int64 —
    the compact per-doc form.  Hashing once at the boundary is the scale
    move: every downstream pass (persist, minhash, array_intersect
    verification) touches 8-byte ints instead of ~25-byte strings, and
    set cardinalities are preserved (60-bit space: collisions are
    negligible at corpus scale and would only perturb a Jaccard count by
    1).  Purely narrow: no explode, no aggregation shuffle.  Docs with
    < k tokens keep an EMPTY sh_set row here — do not filter them: a row
    filter on a derived array gets predicate-pushed below the exchange
    and re-inlines the whole pipeline into the scan (measured 20×).
    Consumers neutralize empties structurally (null band keys in
    lsh_candidate_pairs never match)."""
    hashed = F.transform(shingles_of(F.col("toks"), k), shingle_hash64)
    return _tokenized(docs, text_col).select("doc_id", hashed.alias("sh_set"))


def minhash_from_sets(sets: DataFrame, n_hashes: int = 16) -> DataFrame:
    """MinHash as a narrow projection over the per-doc hashed-shingle
    array: h_i = min over shingles of (a_i * (x mod P) + b_i) mod P —
    integer universal hashing, ~100× cheaper than per-shingle string md5
    and still bit-identical across engines.  No shuffle at all — at
    100 TB this runs entirely inside the scan stage.

    Shape: ONE nested transform over a literal (a_i, b_i) coefficient
    array instead of n_hashes separate array_min expressions — measured
    bit-identical and ~2× faster per row (one expression tree walked
    once, not 16), and the projection's plan is n×, smaller."""
    coeffs = F.array(
        *[
            F.struct(
                F.lit(minhash_a(i)).alias("a"), F.lit(minhash_b(i)).alias("b")
            )
            for i in range(n_hashes)
        ]
    )
    # inner lambda is single-arg: a two-arg lambda would receive the ARRAY
    # INDEX as its second argument from F.transform
    sig = F.transform(
        coeffs,
        lambda p: F.array_min(
            F.transform(
                F.col("sh_set"), lambda x: (p["a"] * (x % MINHASH_P) + p["b"]) % MINHASH_P
            )
        ),
    )
    return sets.select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, n_bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: band key = md5 of the band's signature slice; candidate
    pairs = docs sharing any (band, key) bucket.  Equi-join on the bucket —
    the classic shuffle-friendly near-dup candidate generator.

    Null-signature docs (empty shingle set -> array_min = null) get a NULL
    band key, which an equi-join never matches — they drop out of
    candidate generation without any row filter (see shingle_sets)."""

    def band_key(b: int):
        sl = F.slice("sig", b * rows_per_band + 1, rows_per_band)
        joined = F.array_join(F.transform(sl, lambda x: x.cast("string")), "|")
        return F.when(sl[0].isNotNull(), F.md5(joined))  # else NULL

    bands = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_key(b).alias("bkey"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    # bucket-grouped pair expansion instead of a self-join: ONE pass over
    # the signature lineage (a self-join would recompute the md5 signature
    # pipeline once per side — no ReusedExchange across join inputs), one
    # shuffle to the bucket, pairs expanded in-row from the sorted member
    # list.  Same output as the equi-join: all (a < b) pairs per bucket.
    members = (
        bands.filter(F.col("bkey").isNotNull())
        .groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    ds = F.col("ds")
    pairs = F.flatten(
        F.transform(
            ds,
            lambda a, i: F.transform(
                F.slice(ds, i + 2, F.size(ds) - i - 1),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    return (
        members.select(F.explode(pairs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


def jaccard_on_candidates(
    cand: DataFrame, sets: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard restricted to an already-pruned candidate-pair set.

    This is the scale path for LSH verification: instead of the full
    shingle self-join (every pair sharing any shingle — quadratic in
    bucket skew), join the (tiny) candidate pairs back to the per-doc
    shingle SETS and intersect arrays in-row: |∩| = size(array_intersect).
    Two equi-joins on doc ids, no aggregation; AQE broadcasts the pair
    side when it fits.
    """
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("set_a", "set_b")).alias("n_inter"),
            F.size("set_a").alias("n_a"),
            F.size("set_b").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 4,
    rows_per_band: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """X2 end-to-end MinHash+LSH near-dup pairs: signatures -> band-bucket
    candidates -> exact-Jaccard verification.

    The per-doc shingle-set frame is MATERIALIZED once: it feeds three
    consumers (signatures, and both sides of the verification join), and
    without a materialization barrier each re-executes the full
    scan+tokenize+shingle lineage — the dominant cost at any scale.  One
    compact (doc_id, sh_set) row per document is the cheapest thing to
    keep.  With `checkpoint_dir` the frame goes to parquet and is read
    back (the 100 TB shape — bounded storage, no executor-memory
    pressure, shareable across queries; see stage_parquet); without it,
    a MEMORY_AND_DISK persist (ad-hoc frames, tests)."""
    sets = _materialize_sets(shingle_sets(docs, k, text_col), checkpoint_dir)
    sigs = minhash_from_sets(sets, n_hashes)
    cand = lsh_candidate_pairs(sigs, n_bands, rows_per_band)
    return jaccard_on_candidates(cand, sets, threshold)


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over an undirected pair set -> (node, component)
    with component = min node id in the component.

    This turns near-dup PAIRS into dedup CLUSTERS (pick min doc_id as the
    canonical representative — the standard corpus-dedup final step).

    Algorithm: large-star-ish min-label propagation — each node adopts
    the minimum label in its neighborhood, iterated to fixpoint.  Each
    round is one join + one aggregation (two shuffles) over the EDGE set;
    rounds needed = O(log(diameter)) in practice since labels jump to the
    component minimum along shortcuts.  Distributed throughout: no
    driver-side graph, only a fixpoint check per round (a 1-row count);
    frames are persisted per round and unpersisted after the next round
    materializes (lineage would otherwise grow exponentially).
    """
    from pyspark import StorageLevel

    edges = (
        pairs.selectExpr("doc_a AS a", "doc_b AS b")
        .unionByName(pairs.selectExpr("doc_b AS a", "doc_a AS b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev_ckpt = None
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        ckpt = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                # change flag computed IN the fold join (r17, guide
                # §1.2): the fixpoint probe used to be a separate
                # new-vs-old join per round; the old label is already on
                # the row here, so the flag rides the same pass and the
                # probe below is a bare scan of the checkpointed frame.
                (
                    F.coalesce("nbr_label", F.col("label")) < F.col("label")
                ).alias("chg"),
            )
            # localCheckpoint (not just persist): TRUNCATES lineage each
            # round, so the logical plan stays O(1) per round instead of
            # compounding — a 20-round run otherwise carries an
            # exponentially-nested plan through every optimizer pass
            # (static audit showed ~1000 scans).  Eager: materialized
            # here, so the old round's storage can be freed immediately.
            .localCheckpoint(eager=True)
        )
        changed = ckpt.filter("chg").limit(1).count()
        labels.unpersist()
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt = ckpt
        labels = ckpt.select("node", "label")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("component"))


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """X2 SimHash: 64-bit fingerprint = sign-aggregate of per-token md5 bits.

    Each token votes +1/-1 per bit position (bit taken from the token's
    md5); the fingerprint sets bits with positive vote sums.  Pure
    explode + groupBy + bit arithmetic — engine-portable and shuffle-lean
    (one aggregation keyed by doc).
    """
    toks = spread(docs, "doc_id").select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("tok")
    )
    # token hash: first 16 hex chars of md5 -> 64-bit value via conv
    th = toks.withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    )
    votes = th.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(60)
        ]
    )
    bit_terms = [
        F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(60)
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return votes.select("doc_id", total.alias("simhash"))
