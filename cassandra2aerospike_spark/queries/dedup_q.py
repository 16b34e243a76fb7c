"""Deduplication queries (north-star X1/X2): exact, prefix-cluster,
n-gram Jaccard, MinHash+LSH, SimHash — over the documents fixture.

Everything down to the MinHash signatures and SimHash bits is derived
from md5, so even the LSH pipelines have exact DuckDB oracles.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from ..functions import dedup as D
from ..functions import text as _text_mod
from ..sources import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# Derived-frame staging (see functions/dedup.stage_parquet): any change
# to the tokenizer/shingle/quality code invalidates every checkpoint.
# Computed lazily and fault-tolerantly: under a zipped deployment
# (spark-submit --py-files, __file__ inside an archive) open() raises,
# and an import-time read would take the whole queries package down
# rather than just degrading the cache key.
_CODE_FPR_CACHE: str | None = None


def _code_fpr() -> str:
    global _CODE_FPR_CACHE
    if _CODE_FPR_CACHE is None:
        try:
            _CODE_FPR_CACHE = hashlib.md5(
                open(_text_mod.__file__, "rb").read() + open(D.__file__, "rb").read()
            ).hexdigest()[:12]
        except OSError:
            # zipped deploy: the archive path itself still changes per
            # release artifact, so key on it instead of file contents
            _CODE_FPR_CACHE = hashlib.md5(
                f"{_text_mod.__file__}:{D.__file__}".encode()
            ).hexdigest()[:12]
    return _CODE_FPR_CACHE


def _ckpt_dir(sf_dir: str, variant: str) -> str:
    """Cache directory for a derived dedup frame: keyed on the source
    documents parquet's (abspath, mtime, size), the deriving code's
    fingerprint, and a per-frame variant tag — a regenerated fixture or
    edited pipeline can never serve a stale checkpoint."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}:{_code_fpr()}:{variant}".encode()
    ).hexdigest()[:16]
    # On a cluster the checkpoint must live on shared storage (every
    # executor scans it); SPARK_GRAFT_CHECKPOINT_DIR points it at a
    # shared POSIX path or an hdfs://'/s3a:// prefix — stage_parquet
    # routes non-file schemes through the session's Hadoop FileSystem
    # for the marker probe, so a remote prefix actually caches instead
    # of silently rewriting every call.  Local default: the system temp
    # dir.
    base = os.environ.get(
        "SPARK_GRAFT_CHECKPOINT_DIR",
        os.path.join(tempfile.gettempdir(), "spark_graft_dedup"),
    )
    return os.path.join(base, key)


def q_dedup_exact_prefix(spark, sf_dir):
    """X1 hash-dedup family, tagged by method: 'content' = exact clusters
    by normalized-content hash; 'prefix100' = near-exact clusters on a
    100-char prefix hash (fixture plants prefix-duplicate groups; only
    clusters of size > 1 reported for that branch).  Both are the same
    one-shuffle hash-groupBy shape — merged so the family checks in one
    driver row."""
    d = _docs(spark, sf_dir)
    full = D.exact_clusters(d).select(
        F.lit("content").alias("method"), "fp", "rep_doc_id", "cluster_size"
    )
    pref = (
        d.withColumn("pfp", F.md5(F.substring("text", 1, 100)))
        .groupBy("pfp")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("cluster_size"))
        .filter(F.col("cluster_size") > 1)
        .select(
            F.lit("prefix100").alias("method"),
            F.col("pfp").alias("fp"),
            "rep_doc_id",
            "cluster_size",
        )
    )
    return full.unionByName(pref)


def q_dedup_jaccard_pairs(spark, sf_dir):
    """X2 exact n-gram Jaccard near-dup pairs (threshold 0.6)."""
    return D.jaccard_pairs(
        _docs(spark, sf_dir), k=3, threshold=0.6,
        checkpoint_dir=_ckpt_dir(sf_dir, "sets_k3"),
    )


def q_dedup_jaccard_prefix_filter(spark, sf_dir):
    """X2 exact n-gram Jaccard via PREFIX-FILTER candidates (AllPairs/
    PPJoin): provably zero recall loss at threshold 0.6, so the oracle
    is the NAIVE ground truth — every pair sharing any shingle, exact
    Jaccard >= 0.6, no candidate cap.  Passing this row cross-engine is
    the proof that the prefix filter misses nothing (contrast
    dedup_jaccard_pairs, whose df_cap guard documents a recall caveat
    and whose oracle mirrors the cap)."""
    return D.prefix_filter_jaccard_pairs(
        _docs(spark, sf_dir), k=3, t_num=3, t_den=5,
        checkpoint_dir=_ckpt_dir(sf_dir, "sets_k3"),
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    """X2 MinHash+LSH: 16 md5-derived min-hashes, 4 bands × 4 rows,
    bucket-join candidates, verified with exact Jaccard >= 0.5."""
    return D.minhash_lsh_pairs(
        _docs(spark, sf_dir), n_hashes=16, n_bands=4, rows_per_band=4, k=3,
        threshold=0.5, checkpoint_dir=_ckpt_dir(sf_dir, "sets_k3"),
    ).select("doc_a", "doc_b", "jaccard")


def q_dedup_lsh_recall_report(spark, sf_dir):
    """X2 OPERATIONAL METRIC (round 13, late): measured RECALL of the
    MinHash-LSH dedup pipeline against exact ground truth — the number
    every production dedup run should report before trusting its
    banding parameters.  Ground truth = the PREFIX-FILTER exact Jaccard
    pairs at the same 0.5 threshold and the same 3-gram shingles
    (provably lossless, so it IS the naive all-pairs truth); the LSH
    side verifies candidates with the same exact Jaccard, so LSH pairs
    are a SUBSET of truth by construction (asserted in-query with a
    left-anti join) and recall_bp = n_lsh * 10000 div n_exact measures
    exactly what the 4x4 banding misses.  One row, all integers."""
    d = _docs(spark, sf_dir)
    ckpt = _ckpt_dir(sf_dir, "sets_k3")
    lsh = D.minhash_lsh_pairs(
        d, n_hashes=16, n_bands=4, rows_per_band=4, k=3,
        threshold=0.5, checkpoint_dir=ckpt,
    ).select("doc_a", "doc_b")
    exact = D.prefix_filter_jaccard_pairs(
        d, k=3, t_num=1, t_den=2, checkpoint_dir=ckpt,
    ).select("doc_a", "doc_b")
    # ONE action for all three counts (r17, guide §1.2/§2.4): the
    # left-anti stray probe plus the two count() actions used to execute
    # the LSH pipeline twice and the exact-truth pipeline twice per run
    # (4 full pipeline executions); tagging the two pair sets and
    # folding one groupBy computes n_lsh, n_exact AND the subset proof
    # in a single pass of each pipeline.  Both sides emit distinct
    # pairs (candidates are .distinct() upstream), so per-pair flags
    # are exact.
    row = (
        lsh.withColumn("src", F.lit(1))
        .unionByName(exact.withColumn("src", F.lit(2)))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max(F.when(F.col("src") == 1, 1).otherwise(0)).alias("in_lsh"),
            F.max(F.when(F.col("src") == 2, 1).otherwise(0)).alias("in_exact"),
        )
        .agg(
            F.sum("in_lsh").alias("n_lsh"),
            F.sum("in_exact").alias("n_exact"),
            F.sum(
                F.when((F.col("in_lsh") == 1) & (F.col("in_exact") == 0), 1)
                .otherwise(0)
            ).alias("stray"),
        )
        .collect()[0]
    )
    n_lsh = int(row["n_lsh"] or 0)
    n_exact = int(row["n_exact"] or 0)
    stray = int(row["stray"] or 0)
    if stray:
        raise RuntimeError(
            f"lsh recall: {stray} verified LSH pairs missing from the "
            "exact ground truth — the truth side is broken"
        )
    return spark.createDataFrame(
        [(n_lsh, n_exact, n_lsh * 10000 // n_exact if n_exact else None)],
        "n_lsh long, n_exact long, recall_bp long",
    )


def q_dedup_lsh_band_select(spark, sf_dir):
    """X2 MEASURE -> RETUNE (round 14, VERDICT r13 task 4): close the
    loop dedup_lsh_recall_report opened — instead of running a FIXED
    4x4 banding, evaluate the three (bands x rows) layouts of the
    16-hash signature against the SAME lossless exact truth, pick the
    CHEAPEST config meeting the recall target, and build the keep-list
    from the chosen config.  Cost = candidate-pair count (the exact-
    verify work LSH exists to bound — the number that explodes at 100
    TB when banding is too aggressive); recall_bp = verified pairs vs
    truth in basis points.  Selection rule (replayed exactly by the
    oracle): qualifying configs (recall_bp >= 9000) by ascending cost
    then bands; if none qualifies, best recall then cost then bands.
    The scalar counts collected are 3+1 integers — the selection is
    driver-side arithmetic, the pipelines are all distributed.  Output:
    the production keep-list built from the CHOSEN config, stamped with
    (chosen_bands, chosen_rows, chosen_recall_bp)."""
    docs = _docs(spark, sf_dir)
    ckpt = _ckpt_dir(sf_dir, "sets_k3")
    sets = D._materialize_sets(D.shingle_sets(docs, k=3), ckpt)
    sigs = D.stage_parquet(
        D.minhash_from_sets(sets, 16), _ckpt_dir(sf_dir, "sigs16")
    )
    truth = D.prefix_filter_jaccard_pairs(
        docs, k=3, t_num=1, t_den=2, checkpoint_dir=ckpt
    ).select("doc_a", "doc_b")
    n_exact = truth.count()
    if n_exact == 0:
        raise RuntimeError("band select: empty exact truth")
    target_bp = 9000
    # ONE action for all six counts (r17, guide §1.2/§2.4): the three
    # (bands x rows) layouts used to run as six separate count()
    # actions (candidate count + verified count per config), each
    # re-executing its candidate pipeline.  Tagging each config's
    # candidate pairs and running the verification join ONCE over the
    # union yields per-config (n_cand, n_pairs) in a single job; the
    # verification join preserves every candidate (both doc ids come
    # from `sigs`, which derive from `sets`), so counting candidates
    # after the join equals counting them before it.
    cfgs = ((2, 8), (4, 4), (8, 2))
    cand_u = None
    for i, (n_bands, rows_pb) in enumerate(cfgs):
        c = D.lsh_candidate_pairs(sigs, n_bands, rows_pb).withColumn(
            "cfg", F.lit(i)
        )
        cand_u = c if cand_u is None else cand_u.unionByName(c)
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b"))
    n_inter = F.size(F.array_intersect("set_a", "set_b"))
    jacc = n_inter.cast("double") / (
        F.size("set_a") + F.size("set_b") - n_inter
    ).cast("double")
    by_cfg = {
        int(r["cfg"]): r
        for r in (
            cand_u.join(sa, "doc_a")
            .join(sb, "doc_b")
            .groupBy("cfg")
            .agg(
                F.count("*").alias("n_cand"),
                F.sum((jacc >= F.lit(0.5)).cast("long")).alias("n_pairs"),
            )
            .collect()
        )
    }
    stats = []
    for i, (n_bands, rows_pb) in enumerate(cfgs):
        r = by_cfg.get(i)
        n_cand = int(r["n_cand"]) if r is not None else 0
        n_pairs = int(r["n_pairs"]) if r is not None else 0
        stats.append(
            (n_bands, rows_pb, n_cand, n_pairs * 10000 // n_exact)
        )
    chosen = min(
        stats,
        key=lambda s: (
            s[3] < target_bp,
            s[2] if s[3] >= target_bp else -s[3],
            s[2],
            s[0],
        ),
    )
    b, r, _cost, recall_bp = chosen

    # the keep-list pipeline CONSUMES the chosen config
    pairs = D.jaccard_on_candidates(D.lsh_candidate_pairs(sigs, b, r), sets, 0.5)
    exact_rep = (
        D.exact_clusters(docs)
        .select(F.col("rep_doc_id").alias("doc_id"))
        .withColumn("is_exact_rep", F.lit(1))
    )
    comp = D.connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    return (
        docs.select("doc_id")
        .join(exact_rep, "doc_id", "left")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("is_exact_rep").isNotNull()
                & (
                    F.col("cluster_id").isNull()
                    | (F.col("cluster_id") == F.col("doc_id"))
                )
            )
            .cast("int")
            .alias("keep"),
            F.lit(b).cast("int").alias("chosen_bands"),
            F.lit(r).cast("int").alias("chosen_rows"),
            F.lit(recall_bp).cast("int").alias("chosen_recall_bp"),
        )
    )


def q_dedup_clusters(spark, sf_dir):
    """X2 endgame: near-dup PAIRS -> dedup CLUSTERS via distributed
    connected components (min-label propagation to fixpoint); cluster id
    = min doc_id = the canonical representative to keep.  Oracle: the
    same pair set closed transitively with a recursive CTE."""
    pairs = D.minhash_lsh_pairs(
        _docs(spark, sf_dir), n_hashes=16, n_bands=4, rows_per_band=4, k=3,
        threshold=0.5, checkpoint_dir=_ckpt_dir(sf_dir, "sets_k3"),
    )
    return D.connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def q_dedup_keep_list(spark, sf_dir):
    """The corpus-dedup DECISION, end to end: a document is kept iff it is
    (a) the representative (min doc_id) of its exact-duplicate group AND
    (b) the canonical (min doc_id) of its near-dup cluster — or in no
    cluster at all.  One boolean per document: the actual drop list a
    100 TB training-data pipeline materializes."""
    docs = _docs(spark, sf_dir)
    exact_rep = (
        D.exact_clusters(docs)
        .select(F.col("rep_doc_id").alias("doc_id"))
        .withColumn("is_exact_rep", F.lit(1))
    )
    pairs = D.minhash_lsh_pairs(
        docs, n_hashes=16, n_bands=4, rows_per_band=4, k=3,
        threshold=0.5, checkpoint_dir=_ckpt_dir(sf_dir, "sets_k3"),
    )
    comp = D.connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    return (
        docs.select("doc_id")
        .join(exact_rep, "doc_id", "left")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("is_exact_rep").isNotNull()
                & (F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id")))
            )
            .cast("int")
            .alias("keep"),
        )
    )


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup candidates: 4 bands × 15 bits, verify Hamming <= 3.

    Bucket-grouped in-row pair expansion, the same shape as the
    MinHash-LSH path (functions/dedup.lsh_candidate_pairs): ONE pass over
    the simhash lineage (a band self-join would recompute the
    explode+groupBy fingerprint pipeline per side — Spark does not reuse
    exchanges across self-join inputs), one shuffle to the bucket, pairs
    expanded from the sorted member list so doc_a < doc_b by
    construction."""
    sim = D.simhash64(_docs(spark, sf_dir))
    bands = sim.select(
        F.struct("doc_id", "simhash").alias("ds_el"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * 15).bitwiseAND(F.lit(0x7FFF)).alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("ds_el", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    members = (
        bands.groupBy("band", "bval")
        .agg(F.sort_array(F.collect_set("ds_el")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    ds = F.col("ds")
    pairs = F.flatten(
        F.transform(
            ds,
            lambda a, i: F.transform(
                F.slice(ds, i + 2, F.size(ds) - i - 1),
                lambda b: F.struct(
                    a["doc_id"].alias("doc_a"),
                    b["doc_id"].alias("doc_b"),
                    F.bit_count(a["simhash"].bitwiseXOR(b["simhash"])).alias("hamming"),
                ),
            ),
        )
    )
    return (
        members.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


def q_dedup_edit_distance(spark, sf_dir):
    """X2: edit-distance near-dup verification — SimHash band candidates
    verified with Levenshtein over the raw text (integer-exact in any
    engine).  The classic high-precision final filter when near-dups must
    survive small in-place edits."""
    docs = _docs(spark, sf_dir)
    pairs = q_dedup_simhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("text_a", "text_b").alias("edit_dist"),
            F.greatest(F.length("text_a"), F.length("text_b")).alias("max_len"),
        )
        .filter(F.col("edit_dist") * 5 <= F.col("max_len"))  # <= 20% edits
    )


# ---------------------------------------------------------------- oracles

# the config-independent MinHash half: per-shingle hash + the 16
# universal-hash signature rows (shared by every banding config)
_MH_BODY = """
        , shh AS (
          SELECT doc_id,
                 list_reduce(list_transform(range(1, 16),
                     j -> strpos('0123456789abcdef', substr(md5(shingle), j, 1)) - 1),
                     (a, b) -> a * 16 + b) % 2147483647 AS hp
          FROM sh
        ),
        mh AS (
          SELECT doc_id, i,
                 min((((i * 2654435761 + 1) % 2147483647) * hp
                      + ((i * 40503 + 7) % 2147483647)) % 2147483647) AS h
          FROM shh, (SELECT unnest(range(0, 16)) AS i)
          GROUP BY doc_id, i
        )"""


def _lsh_cfg_sql(rows_per_band: int, tag: str = "") -> str:
    """One banding config's CTEs over the shared mh signature rows:
    bands{tag} (band key = md5 of the band's signature slice) and
    cand{tag} (distinct same-bucket pairs)."""
    return f""",
        bands{tag} AS (
          SELECT doc_id, i // {rows_per_band} AS band,
                 md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY i)) AS bkey
          FROM mh GROUP BY doc_id, i // {rows_per_band}
        ),
        cand{tag} AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands{tag} a JOIN bands{tag} b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        )"""


_LSH_BODY = _MH_BODY + _lsh_cfg_sql(4) + "\n"


_TOKS = """
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '') AS t
  FROM documents
)
"""

# distinct word-3-gram shingles, exploded
_SHINGLES = _TOKS + """
, sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> array_to_string(t[i : i + 2], ' ')))) AS shingle
  FROM toks WHERE len(t) >= 3
)
"""

_JACCARD = _SHINGLES + """
, sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
         CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
"""

_SIMHASH = _TOKS + """
, tokh AS (
  SELECT doc_id,
         list_reduce(list_transform(range(1, 16),
             i -> strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1),
             (a, b) -> a * 16 + b) AS h
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
),
bits AS (
  SELECT doc_id, j, sum(2 * ((h >> j) & 1) - 1) AS vote
  FROM tokh, (SELECT unnest(range(0, 60)) AS j)
  GROUP BY doc_id, j
),
simh AS (
  SELECT doc_id,
         sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS simhash
  FROM bits GROUP BY doc_id
)
"""

def q_dedup_incremental(spark, sf_dir):
    """X1 INCREMENTAL ingestion dedup — the shape a continuously-fed
    corpus actually runs: a new batch (odd doc_ids) checked against the
    already-ingested corpus (even doc_ids) WITHOUT re-deduplicating the
    old side.  New docs matching an old fingerprint drop as
    'dup_of_corpus' (dup_of = the old representative); remaining
    in-batch duplicates collapse to the min doc_id ('dup_in_batch');
    survivors 'keep'.  Shapes: the old side IS a precomputed fingerprint
    table — staged to parquet once (stage_parquet, keyed on the source's
    mtime + code fingerprint) and scanned per batch, never re-derived or
    re-shuffled; then one fp equi-join and one window per fp over the
    new batch only."""
    from pyspark.sql import Window

    from ..functions.text import fingerprint

    d = _docs(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    old = D.stage_parquet(
        d.filter(F.col("doc_id") % 2 == 0)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("old_rep")),
        _ckpt_dir(sf_dir, "corpus_fp"),
    )
    new = d.filter(F.col("doc_id") % 2 == 1)
    first_new = F.min("doc_id").over(Window.partitionBy("fp"))
    return (
        new.join(old, "fp", "left")
        .withColumn("first_new", first_new)
        .select(
            "doc_id",
            "fp",
            F.when(F.col("old_rep").isNotNull(), "dup_of_corpus")
            .when(F.col("doc_id") != F.col("first_new"), "dup_in_batch")
            .otherwise("keep")
            .alias("decision"),
            F.when(F.col("old_rep").isNotNull(), F.col("old_rep"))
            .when(F.col("doc_id") != F.col("first_new"), F.col("first_new"))
            .alias("dup_of"),
        )
    )


ORACLES = {
    "dedup_incremental": _TOKS
    + """
        , fps AS (SELECT doc_id, md5(array_to_string(t, ' ')) AS fp FROM toks),
        old AS (SELECT fp, min(doc_id) AS old_rep FROM fps
                WHERE doc_id % 2 = 0 GROUP BY fp),
        new AS (SELECT doc_id, fp,
                       min(doc_id) OVER (PARTITION BY fp) AS first_new
                FROM fps WHERE doc_id % 2 = 1)
        SELECT new.doc_id, new.fp,
               CASE WHEN old.old_rep IS NOT NULL THEN 'dup_of_corpus'
                    WHEN new.doc_id != new.first_new THEN 'dup_in_batch'
                    ELSE 'keep' END AS decision,
               CASE WHEN old.old_rep IS NOT NULL THEN old.old_rep
                    WHEN new.doc_id != new.first_new THEN new.first_new
                    END AS dup_of
        FROM new LEFT JOIN old ON new.fp = old.fp
    """,
    "dedup_exact_prefix": _TOKS
    + """
        SELECT 'content' AS method, md5(array_to_string(t, ' ')) AS fp,
               min(doc_id) AS rep_doc_id, count(*) AS cluster_size
        FROM toks GROUP BY 2
        UNION ALL
        SELECT 'prefix100' AS method, md5(text[1:100]) AS fp,
               min(doc_id) AS rep_doc_id, count(*) AS cluster_size
        FROM documents GROUP BY 2 HAVING count(*) > 1
    """,
    # mirrors jaccard_pairs' df_cap=64 skew guard: stop-shingles (df > 64)
    # generate no candidates; surviving pairs verified on FULL shingle sets
    "dedup_jaccard_pairs": _JACCARD
    + """
        , rare AS (
          SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64
        ),
        capped_cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM rare)
        )
        SELECT j.doc_a, j.doc_b, j.n_inter, j.n_a, j.n_b, j.jaccard
        FROM jac j JOIN capped_cand c ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
        WHERE j.jaccard >= 0.6
    """,
    # the prefix-filter join is exact at the threshold, so the oracle is
    # the UNCAPPED ground truth — any miss fails the row
    "dedup_jaccard_prefix_filter": _JACCARD
    + """
        SELECT doc_a, doc_b, n_inter, n_a, n_b, jaccard
        FROM jac WHERE jaccard >= 0.6
    """,
    # measured LSH recall vs the exact all-pairs truth at the same
    # threshold/shingles — the subset property makes hits == n_lsh
    "dedup_lsh_recall_report": _JACCARD
    + _LSH_BODY
    + """
        , lsh AS (
          SELECT c.doc_a, c.doc_b
          FROM cand c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
          WHERE j.jaccard >= 0.5
        ),
        exact AS (
          SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5
        )
        SELECT (SELECT count(*) FROM lsh) AS n_lsh,
               (SELECT count(*) FROM exact) AS n_exact,
               (SELECT count(*) FROM lsh) * 10000
                   // (SELECT count(*) FROM exact) AS recall_bp
    """,
    "dedup_minhash_lsh": _JACCARD
    + _LSH_BODY
    + """
        SELECT c.doc_a, c.doc_b, j.jaccard
        FROM cand c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
        WHERE j.jaccard >= 0.5
    """,
    "dedup_clusters": (_JACCARD + _LSH_BODY + """
        , pairs AS (
          SELECT c.doc_a, c.doc_b
          FROM cand c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
          WHERE j.jaccard >= 0.5
        ),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )
        SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a
    """).replace("WITH toks", "WITH RECURSIVE toks", 1),
    "dedup_keep_list": (_JACCARD + _LSH_BODY + """
        , pairs AS (
          SELECT c.doc_a, c.doc_b
          FROM cand c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
          WHERE j.jaccard >= 0.5
        ),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        comp AS (
          SELECT a AS doc_id, least(a, min(b)) AS cluster_id
          FROM reach GROUP BY a
        ),
        exact_rep AS (
          SELECT min(doc_id) AS doc_id FROM toks
          GROUP BY md5(array_to_string(t, ' '))
        )
        SELECT d.doc_id,
               CAST(e.doc_id IS NOT NULL
                    AND (c.cluster_id IS NULL OR c.cluster_id = d.doc_id)
                    AS INT) AS keep
        FROM documents d
        LEFT JOIN exact_rep e ON e.doc_id = d.doc_id
        LEFT JOIN comp c ON c.doc_id = d.doc_id
    """).replace("WITH toks", "WITH RECURSIVE toks", 1),
    "dedup_edit_distance": _SIMHASH + """
        , bands AS (
          SELECT doc_id, simhash, b AS band, (simhash >> (b * 15)) & 32767 AS bval
          FROM simh, (SELECT unnest(range(0, 4)) AS b)
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        )
        SELECT p.doc_a, p.doc_b,
               CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist,
               CAST(greatest(length(da.text), length(db.text)) AS INT) AS max_len
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
        WHERE levenshtein(da.text, db.text) * 5 <= greatest(length(da.text), length(db.text))
    """,
    "dedup_simhash_pairs": _SIMHASH
    + """
        , bands AS (
          SELECT doc_id, simhash, b AS band, (simhash >> (b * 15)) & 32767 AS bval
          FROM simh, (SELECT unnest(range(0, 4)) AS b)
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
}


def quality_cte(src: str = "toks") -> str:
    """The Gopher-subset quality gate + qtoks CTE over a (doc_id, t)
    source — ONE definition shared by every capstone oracle (this
    module's corpus_prep and pipeline_q's sstable_corpus), so a
    threshold change in functions/text.gopher_rules has exactly one SQL
    mirror to update."""
    from .text_q import _SW

    return f"""
        , g AS (
          SELECT doc_id,
                 CAST(len(t) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
                 CAST(len(list_filter(t, x -> list_contains([{_SW['en']}], x))) AS BIGINT) AS stops
          FROM {src}
        ),
        q AS (
          SELECT doc_id, n_tokens,
                 CAST(n_tokens >= 50 AND n_tokens <= 100000
                  AND stops >= 2 AND 5 * n_alpha >= 4 * n_tokens AS INT) AS q_pass
          FROM g
        ),
        qtoks AS (SELECT {src}.* FROM {src} JOIN q USING (doc_id) WHERE q.q_pass = 1)"""


EXACT_REP_CTE = """
        , exact_rep AS (
          SELECT min(doc_id) AS doc_id FROM qtoks
          GROUP BY md5(array_to_string(t, ' '))
        )"""


def _corpus_prep_oracle() -> str:
    """Capstone oracle assembled from the SAME CTE fragments the
    standalone dedup oracles use, with the shingle base restricted to
    quality-passing documents (qtoks)."""
    sh_frag = _SHINGLES[len(_TOKS):].replace("FROM toks", "FROM qtoks")
    jac_frag = _JACCARD[len(_SHINGLES):]
    quality = quality_cte("toks")
    tail = """
        , pairs AS (
          SELECT c.doc_a, c.doc_b
          FROM cand c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
          WHERE j.jaccard >= 0.5
        ),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        comp AS (
          SELECT a AS doc_id, least(a, min(b)) AS cluster_id
          FROM reach GROUP BY a
        )"""
    tail += EXACT_REP_CTE + """
        SELECT d.doc_id, q.n_tokens, q.q_pass,
               CAST(e.doc_id IS NOT NULL AS INT) AS is_exact_rep,
               CAST(c.cluster_id IS NOT NULL AS INT) AS in_cluster,
               CAST(q.q_pass = 1 AND e.doc_id IS NOT NULL
                    AND (c.cluster_id IS NULL OR c.cluster_id = d.doc_id)
                    AS INT) AS keep
        FROM documents d
        JOIN q ON q.doc_id = d.doc_id
        LEFT JOIN exact_rep e ON e.doc_id = d.doc_id
        LEFT JOIN comp c ON c.doc_id = d.doc_id
    """
    return (_TOKS + quality + sh_frag + jac_frag + _LSH_BODY + tail).replace(
        "WITH toks", "WITH RECURSIVE toks", 1
    )


ORACLES["pipeline_corpus_prep"] = _corpus_prep_oracle()


# the capstone manifest: the FULL corpus-prep oracle nested as a CTE,
# then the seeded shuffle + in-shard sequence packing replayed in SQL
# dedup_lsh_band_select: the selection arithmetic replayed exactly —
# all three banding configs evaluated against the naive exact truth
# (the prefix filter is provably lossless, so jac IS the truth), the
# same (qualify, cost, bands) ordering, and the keep-list built from
# the chosen config's verified pairs
ORACLES["dedup_lsh_band_select"] = (
    _JACCARD
    + _MH_BODY
    + _lsh_cfg_sql(8, "_b2")
    + _lsh_cfg_sql(4, "_b4")
    + _lsh_cfg_sql(2, "_b8")
    + """
    , truth AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
    v_b2 AS (
      SELECT c.doc_a, c.doc_b FROM cand_b2 c
      JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
      WHERE j.jaccard >= 0.5
    ),
    v_b4 AS (
      SELECT c.doc_a, c.doc_b FROM cand_b4 c
      JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
      WHERE j.jaccard >= 0.5
    ),
    v_b8 AS (
      SELECT c.doc_a, c.doc_b FROM cand_b8 c
      JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
      WHERE j.jaccard >= 0.5
    ),
    stats AS (
      SELECT 2 AS bands, 8 AS rows_pb,
             (SELECT count(*) FROM cand_b2) AS n_cand,
             (SELECT count(*) FROM v_b2) * 10000
                 // (SELECT count(*) FROM truth) AS recall_bp
      UNION ALL
      SELECT 4, 4, (SELECT count(*) FROM cand_b4),
             (SELECT count(*) FROM v_b4) * 10000
                 // (SELECT count(*) FROM truth)
      UNION ALL
      SELECT 8, 2, (SELECT count(*) FROM cand_b8),
             (SELECT count(*) FROM v_b8) * 10000
                 // (SELECT count(*) FROM truth)
    ),
    chosen AS (
      SELECT bands, rows_pb, recall_bp FROM stats
      ORDER BY (recall_bp >= 9000) DESC,
               CASE WHEN recall_bp >= 9000 THEN n_cand
                    ELSE -recall_bp END ASC,
               n_cand ASC, bands ASC
      LIMIT 1
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM v_b2 WHERE (SELECT bands FROM chosen) = 2
      UNION ALL
      SELECT doc_a, doc_b FROM v_b4 WHERE (SELECT bands FROM chosen) = 4
      UNION ALL
      SELECT doc_a, doc_b FROM v_b8 WHERE (SELECT bands FROM chosen) = 8
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    exact_rep AS (
      SELECT min(doc_id) AS doc_id FROM toks
      GROUP BY md5(array_to_string(t, ' '))
    )
    SELECT d.doc_id,
           CAST(e.doc_id IS NOT NULL
                AND (c.cluster_id IS NULL OR c.cluster_id = d.doc_id)
                AS INT) AS keep,
           CAST(ch.bands AS INT) AS chosen_bands,
           CAST(ch.rows_pb AS INT) AS chosen_rows,
           CAST(ch.recall_bp AS INT) AS chosen_recall_bp
    FROM documents d
    LEFT JOIN exact_rep e ON e.doc_id = d.doc_id
    LEFT JOIN comp c ON c.doc_id = d.doc_id
    CROSS JOIN chosen ch
"""
).replace("WITH toks", "WITH RECURSIVE toks", 1)


ORACLES["pipeline_training_manifest"] = (
    "WITH prep AS ("
    + _corpus_prep_oracle()
    + """), kept AS (
      SELECT doc_id, n_tokens FROM prep WHERE keep = 1
    ), keyed AS (
      SELECT doc_id, n_tokens,
             list_reduce(list_transform(range(1, 16),
                 j -> strpos('0123456789abcdef',
                             substr(md5('shuf42|' || CAST(doc_id AS VARCHAR)), j, 1)) - 1),
                 (a, b) -> a * 16 + b) AS hkey
      FROM kept
    ), ordered AS (
      SELECT doc_id, n_tokens, hkey % 8 AS shard,
             row_number() OVER (PARTITION BY hkey % 8
                                ORDER BY hkey, doc_id) AS pos,
             coalesce(sum(n_tokens) OVER (
                 PARTITION BY hkey % 8 ORDER BY hkey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
      FROM keyed
    )
    SELECT doc_id, CAST(shard AS INT) AS shard, CAST(pos AS INT) AS pos,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_before // 2048 AS BIGINT) AS seq_id,
           CAST(cum_before % 2048 AS BIGINT) AS seq_offset
    FROM ordered
"""
)


def q_pipeline_corpus_prep(spark, sf_dir):
    """Capstone X1+X2+X4 composition — the decision pipeline a pretraining
    corpus actually materializes, as ONE query:

      1. quality gate (X4): Gopher word-count + stopword + alpha-word
         rules (functions/text.gopher_rules subset);
      2. exact dedup (X1) among quality survivors: keep = min doc_id per
         content fingerprint;
      3. near-dup (X2) among quality survivors: MinHash-LSH candidate
         pairs -> exact-Jaccard verify (>= 0.5) -> connected components,
         keep = cluster canonical (min doc_id);
      4. one verdict row per document with per-stage reasons.

    Every stage shape is the one its standalone query uses, so the 100 TB
    posture is inherited: in-row quality folds on the scan, one-shuffle
    fingerprint groupBy, banded LSH equi-join, label propagation."""
    from ..functions import text as X

    docs = _docs(spark, sf_dir)
    r = X.gopher_rules(F.col("text"))
    q = docs.select(
        "doc_id",
        "text",
        r["n_tokens"].alias("n_tokens"),
        (r["r_word_count"] * r["r_stopwords"] * r["r_alpha_words"]).alias("q_pass"),
    )
    qdocs = q.filter(F.col("q_pass") == 1).select("doc_id", "text")
    exact_rep = (
        D.exact_clusters(qdocs)
        .select(F.col("rep_doc_id").alias("doc_id"))
        .withColumn("is_rep", F.lit(1))
    )
    pairs = D.minhash_lsh_pairs(
        qdocs, 16, 4, 4, 3, 0.5, checkpoint_dir=_ckpt_dir(sf_dir, "sets_k3_qpass")
    )
    comp = D.connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    return (
        q.select("doc_id", "n_tokens", "q_pass")
        .join(exact_rep, "doc_id", "left")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "q_pass",
            F.col("is_rep").isNotNull().cast("int").alias("is_exact_rep"),
            F.col("cluster_id").isNotNull().cast("int").alias("in_cluster"),
            (
                (F.col("q_pass") == 1)
                & F.col("is_rep").isNotNull()
                & (F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id")))
            )
            .cast("int")
            .alias("keep"),
        )
    )


def q_pipeline_training_manifest(spark, sf_dir):
    """THE NORTH-STAR CAPSTONE (round 13, late — registry row #200):
    raw documents -> TRAINING-READY SHARD MANIFEST in one query,
    composing the three pipeline stages every pretraining run chains:

      1. corpus prep (the pipeline_corpus_prep decision: Gopher quality
         gate + exact dedup + LSH near-dup clusters -> keep = 1);
      2. the SEEDED GLOBAL SHUFFLE over the kept docs (md5(seed||id)
         keys, shard = 60-bit key mod 8, pos = in-shard rank) — the
         reproducible permutation the shard writer needs;
      3. sequence PACKING in shuffle order (cumulative token budget
         2048 per sequence WITHIN the shard) — so the manifest says
         exactly which training sequence and offset each surviving
         document lands at, on any cluster size, every epoch.

    Output: (doc_id, shard, pos, n_tokens, seq_id, seq_offset) for
    every kept document.  Every stage inherits its standalone query's
    100 TB posture; the only NEW shuffle is the shard-rank window —
    the one the shard writer must pay anyway.  The oracle nests the
    full corpus-prep oracle as a CTE and replays the shuffle + packing
    arithmetic (all integers)."""
    from pyspark.sql import Window

    prep = q_pipeline_corpus_prep(spark, sf_dir)
    kept = prep.filter(F.col("keep") == 1).select("doc_id", "n_tokens")
    h = F.md5(F.concat(F.lit("shuf42|"), F.col("doc_id").cast("string")))
    hkey = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    keyed = kept.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        hkey.alias("hkey"),
        (hkey % 8).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("hkey", "doc_id")
    wc = w.rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum("n_tokens").over(wc), F.lit(0)).cast("long")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("int").alias("pos"),
        "n_tokens",
        cum_before.alias("cum_before"),
    ).select(
        "doc_id",
        "shard",
        "pos",
        "n_tokens",
        F.expr("cum_before div 2048").cast("long").alias("seq_id"),
        (F.col("cum_before") % 2048).cast("long").alias("seq_offset"),
    )


def q_pipeline_bpe_manifest(spark, sf_dir):
    """TOKEN-TRUE TRAINING MANIFEST (round 15): the
    pipeline_training_manifest capstone re-based on the TRAINED
    TOKENIZER's actual token counts — the composition a real
    pretraining run performs, closing the r14 gap where packing
    counted raw whitespace tokens while a driver-green BPE sat unused:

      1. corpus prep (pipeline_corpus_prep: Gopher gate + exact dedup
         + LSH near-dup clusters -> keep = 1);
      2. BPE train -> encode (text_bpe_train/text_bpe_encode: the K
         learned merges applied corpus-wide) giving each document its
         POST-MERGE symbol count — the number of tokens the tokenizer
         would actually emit;
      3. the seeded md5 global shuffle (ONE exchange) + in-shard
         packing into 2048-TOKEN sequences, where the cumulative budget
         now advances by the BPE token count, so the manifest's
         (seq_id, seq_offset) boundaries are the ones the shard writer
         and the training loader will really see.

    Every stage inherits its standalone row's audited shape; the only
    join added is kept-ids x per-doc counts (both one row per doc).
    The oracle nests the FULL corpus-prep oracle and the FULL unrolled
    BPE train+encode CTE chain into the packing arithmetic — all
    integers, exact in both engines."""
    from pyspark.sql import Window

    from .text_q import q_text_bpe_encode

    prep = q_pipeline_corpus_prep(spark, sf_dir)
    kept_ids = prep.filter(F.col("keep") == 1).select("doc_id")
    counts = q_text_bpe_encode(spark, sf_dir).select(
        "doc_id", F.col("n_sym_after").cast("long").alias("n_tokens")
    )
    kept = kept_ids.join(counts, "doc_id")
    h = F.md5(F.concat(F.lit("shuf42|"), F.col("doc_id").cast("string")))
    hkey = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    keyed = kept.select(
        "doc_id",
        "n_tokens",
        hkey.alias("hkey"),
        (hkey % 8).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("hkey", "doc_id")
    wc = w.rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum("n_tokens").over(wc), F.lit(0)).cast("long")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("int").alias("pos"),
        "n_tokens",
        cum_before.alias("cum_before"),
    ).select(
        "doc_id",
        "shard",
        "pos",
        "n_tokens",
        F.expr("cum_before div 2048").cast("long").alias("seq_id"),
        (F.col("cum_before") % 2048).cast("long").alias("seq_offset"),
    )


def q_mm_phash_dedup(spark, sf_dir):
    """IMAGE NEAR-DUP DEDUP (round 15, X2 x X5 bridge): the perceptual-
    hash pipeline a multimodal training corpus runs, end to end on REAL
    bytes — synthesize one gradient image per document, containers
    ALTERNATING by parity (24-bit BMP / real truecolor PNG through
    encode_png), plus a planted pixel-shifted near-duplicate for every
    doc_id % 7 == 0 stored in the OPPOSITE container from its source
    (functions/multimodal.synthesize_gradient_images) — so every pair
    the pipeline must catch is BMP <-> PNG: the format-invariance a
    real image dedup needs.  DECODE the bytes for real (decode_bmp /
    decode_png by magic: stride padding + bottom-up flip, or chunk walk
    + inflate + unfilter; both lossless), compute the
    64-bit dHash declaratively from the decoded pixels (bit(r, c) =
    px[r][c] > px[r][c+1] — the standard difference hash, JVM-side
    comparisons, stored as 4 x 16-bit band values so banding needs no
    64-bit shifts), prescreen with BANDED HAMMING LSH (any shared
    band -> candidate; the same bucket-grouped in-row pair expansion
    q_dedup_simhash_pairs uses — ONE pass, one shuffle to the bucket,
    no self-join), verify candidates EXACTLY (full 64-bit Hamming <= 2
    via per-band bit_count(xor) AND integer pixel distance
    sum|a-b| <= 144 via zip_with over the decoded arrays), and emit the
    keep-list: drop the larger img_id of every verified pair.  The
    planted copies shift every pixel by a constant (no 8-bit wrap), so
    their dHash is IDENTICAL (Hamming 0) and their pixel distance is
    exactly 72 or 144 — caught by construction; the mixed gradient
    keeps accidental collisions at zero measured and bucket sizes O(1)
    (bit mean 0.497), so the candidate count stays linear at 100 TB.
    Exact oracle: the generating arithmetic replayed relationally
    (pixels -> lead() comparisons -> band sums -> band self-join ->
    Hamming + pixel-distance verify)."""
    from ..functions import multimodal as M

    px_df = M.decode_gray_pixels(
        M.synthesize_gradient_images(_docs(spark, sf_dir))
    )
    dups = _phash_dup_ids(px_df)
    return (
        px_df.select("img_id")
        .join(dups, "img_id", "left")
        .select("img_id", F.col("dup").isNull().cast("int").alias("keep"))
    )


def _dhash_sigs(px_df):
    """(img_id, px, bands): the 64-bit dHash of a decoded-pixel frame
    as 4x16-bit band values — bit(r, c) = px[r][c] > px[r][c+1],
    computed declaratively (JVM-side comparisons, no UDF).  The bands
    ARE the persistable fingerprint: 4 ints per image, what the
    incremental row checkpoints so the corpus is never re-decoded."""
    px = F.col("px")

    def band_val(b: int):
        terms = []
        for rr in (2 * b, 2 * b + 1):
            for c in range(8):
                w = 1 << ((rr % 2) * 8 + c)
                terms.append(
                    F.when(px[rr * 9 + c] > px[rr * 9 + c + 1], w).otherwise(0)
                )
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out.cast("int")

    return px_df.select(
        "img_id", "px",
        F.array(*[band_val(b) for b in range(4)]).alias("bands"),
    )


def _phash_verified_pairs(sigs):
    """Verified near-dup PAIRS over a dHash signature frame (img_id,
    px, bands): banded-Hamming bucket-grouped in-row pair expansion
    (one shuffle to the bucket, no self-join) -> exact verify (full
    Hamming <= 2 via bit_count(xor) AND integer pixel distance
    sum|a-b| <= 144 via zip_with) -> (img_a < img_b) pair frame."""
    bands = sigs.select(
        F.struct("img_id", "bands", "px").alias("el"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col("bands")[b].alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("el", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    members = (
        bands.groupBy("band", "bval")
        .agg(F.sort_array(F.collect_set("el")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    ds = F.col("ds")
    pairs = F.flatten(
        F.transform(
            ds,
            lambda a, i: F.transform(
                F.slice(ds, i + 2, F.size(ds) - i - 1),
                lambda b: F.struct(
                    a["img_id"].alias("img_a"),
                    b["img_id"].alias("img_b"),
                    F.aggregate(
                        F.zip_with(
                            a["bands"], b["bands"],
                            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
                        ),
                        F.lit(0),
                        lambda acc, x: acc + x,
                    ).alias("hamming"),
                    F.aggregate(
                        F.zip_with(a["px"], b["px"], lambda x, y: F.abs(x - y)),
                        F.lit(0),
                        lambda acc, x: acc + x,
                    ).alias("pixdist"),
                ),
            ),
        )
    )
    return (
        members.select(F.explode(pairs).alias("p"))
        .select("p.img_a", "p.img_b", "p.hamming", "p.pixdist")
        .distinct()
        .filter((F.col("hamming") <= 2) & (F.col("pixdist") <= 144))
    )


def _phash_dup_ids(px_df):
    """The dHash near-dup DROP LIST over a decoded-pixel frame
    (img_id, px array<int> of 72): declarative 64-bit dHash as 4x16-bit
    bands -> banded-Hamming bucket-grouped in-row pair expansion ->
    exact verify (Hamming <= 2 AND sum|a-b| <= 144) -> the larger
    img_id of every verified pair, as (img_id, dup=1).  Shared by the
    standalone phash row and the multimodal corpus-prep capstones."""
    return (
        _phash_verified_pairs(_dhash_sigs(px_df))
        .select(F.col("img_b").alias("img_id"))
        .distinct()
        .withColumn("dup", F.lit(1))
    )


def q_mm_phash_incremental(spark, sf_dir):
    """INCREMENTAL image near-dup dedup (round 16 — the continuous-
    ingest production shape for the image modality, the X5 analogue of
    dedup_incremental): a NEW batch of images checked against an
    already-fingerprinted corpus WITHOUT re-decoding — or re-shuffling
    — the corpus.

    The corpus side IS a persisted fingerprint store: the dHash band
    signatures (4 ints per image — not pixels, not payloads) of every
    corpus image, staged to parquet ONCE (stage_parquet, keyed on the
    fixture's mtime + code fingerprint) and scanned per batch.  The
    new batch (synthesize_image_batch: every doc_id % 5 == 0 is a
    re-encoded pixel-shifted copy of its corpus image, % 5 == 1 a copy
    of its own batch-mate, the rest fresh) is decoded for real
    (cross-format BMP/PNG by magic), hashed declaratively, and:

      1. CORPUS hits — band-bucket equi-join of the batch signatures
         against the fingerprint store (any shared 16-bit band ->
         candidate; linear candidates, O(1) buckets), verified at
         full Hamming <= 2 FROM THE STORED BANDS ALONE — the pixel-
         distance second factor needs pixels the store deliberately
         does not hold; an 8-byte fingerprint per corpus image is the
         whole storage bill, which is what makes the store viable at
         100 TB — decision 'dup_of_corpus', rep = min matching
         corpus img_id;
      2. IN-BATCH pairs — the full two-factor verify
         (_phash_verified_pairs: Hamming AND pixel distance; the
         batch's own pixels are in hand) — decision 'dup_in_batch'
         for the larger img_id, rep = min verified partner;
      3. survivors 'keep'.

    Corpus-hit precedence over in-batch (matching dedup_incremental).
    Exact oracle: the generating arithmetic of BOTH sides replayed
    relationally with the same two verify rules."""
    from pyspark.sql import Window

    from ..functions import multimodal as M

    docs = _docs(spark, sf_dir)
    corpus_fp = D.stage_parquet(
        _dhash_sigs(
            M.decode_gray_pixels(M.synthesize_gradient_images(docs))
        )
        .filter(F.col("img_id") < 1_000_000)
        .select("img_id", "bands"),
        _ckpt_dir(sf_dir, "phash_fp"),
    )
    batch_sigs = _dhash_sigs(
        M.decode_gray_pixels(M.synthesize_image_batch(docs))
    ).cache()

    def explode_bands(df, id_alias):
        return df.select(
            F.col("img_id").alias(id_alias),
            F.col("bands").alias(f"{id_alias}_bands"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.col("bands")[b].alias("bval"),
                        )
                        for b in range(4)
                    ]
                )
            ).alias("bb"),
        ).select(
            id_alias, f"{id_alias}_bands",
            F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"),
        )

    hamming = F.aggregate(
        F.zip_with(
            F.col("new_id_bands"), F.col("old_id_bands"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    corpus_hits = (
        explode_bands(batch_sigs, "new_id")
        .join(explode_bands(corpus_fp, "old_id"), ["band", "bval"])
        .select("new_id", "old_id", "new_id_bands", "old_id_bands")
        .distinct()
        .filter(hamming <= 2)
        .groupBy("new_id")
        .agg(F.min("old_id").alias("corpus_rep"))
    )
    in_batch = (
        _phash_verified_pairs(batch_sigs)
        .groupBy(F.col("img_b").alias("new_id"))
        .agg(F.min("img_a").alias("batch_rep"))
    )
    out = (
        batch_sigs.select(F.col("img_id").alias("new_id"))
        .join(corpus_hits, "new_id", "left")
        .join(in_batch, "new_id", "left")
        .select(
            F.col("new_id").alias("img_id"),
            F.when(F.col("corpus_rep").isNotNull(), "dup_of_corpus")
            .when(F.col("batch_rep").isNotNull(), "dup_in_batch")
            .otherwise("keep")
            .alias("decision"),
            F.coalesce("corpus_rep", "batch_rep").alias("dup_of"),
        )
    )
    return out


def q_mm_audio_fp_incremental(spark, sf_dir):
    """INCREMENTAL audio near-dup dedup (round 16 — the continuous-
    ingest shape for the audio modality, completing the incremental
    matrix: text (dedup_incremental), image (mm_phash_incremental),
    embeddings (the persisted-index appends), now audio): a NEW batch
    of clips checked against an already-fingerprinted corpus WITHOUT
    re-decoding — or re-shuffling — the corpus.

    Unlike the image store (whose pixel-distance second factor is
    deliberately unavailable), the audio fingerprint store carries the
    FULL standalone verify: the delta-sign bands AND the zero-crossing
    count are 5 ints per clip (_audio_sigs), so corpus hits get the
    exact two-factor check — Hamming <= 2 AND equal zero crossings —
    from the store alone.  The batch (synthesize_audio_batch: doc_id %
    5 == 0 a loudness-scaled copy of its corpus clip, % 5 == 1 a
    scaled copy of its batch-mate, the rest fresh) decodes for real
    (RIFF chunk walk), fingerprints declaratively, band-bucket
    equi-joins the store for corpus hits and runs the shared
    _audio_verified_pairs for in-batch pairs.  Decision precedence
    mirrors dedup_incremental: dup_of_corpus (rep = min matching
    corpus clip) > dup_in_batch (drop the larger, rep = min partner)
    > keep.  Exact oracle replaying both corpora's arithmetic."""
    from ..functions import multimodal as M

    docs = _docs(spark, sf_dir)
    corpus_fp = D.stage_parquet(
        _audio_sigs(
            M.decode_pcm_samples(
                M.synthesize_audio_clips(docs, alias_every=1_000_000_000)
            )
        ).select("clip_id", "bands", "zc"),
        _ckpt_dir(sf_dir, "audio_fp"),
    )
    batch_sigs = _audio_sigs(
        M.decode_pcm_samples(M.synthesize_audio_batch(docs))
    ).cache()

    def explode_bands(df, id_alias):
        return df.select(
            F.col("clip_id").alias(id_alias),
            F.col("bands").alias(f"{id_alias}_bands"),
            F.col("zc").alias(f"{id_alias}_zc"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.col("bands")[b].alias("bval"),
                        )
                        for b in range(4)
                    ]
                )
            ).alias("bb"),
        ).select(
            id_alias, f"{id_alias}_bands", f"{id_alias}_zc",
            F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"),
        )

    hamming = F.aggregate(
        F.zip_with(
            F.col("new_id_bands"), F.col("old_id_bands"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    corpus_hits = (
        explode_bands(batch_sigs, "new_id")
        .join(explode_bands(corpus_fp, "old_id"), ["band", "bval"])
        .select(
            "new_id", "old_id", "new_id_bands", "old_id_bands",
            "new_id_zc", "old_id_zc",
        )
        .distinct()
        .filter((hamming <= 2) & (F.col("new_id_zc") == F.col("old_id_zc")))
        .groupBy("new_id")
        .agg(F.min("old_id").alias("corpus_rep"))
    )
    in_batch = (
        _audio_verified_pairs(batch_sigs)
        .groupBy(F.col("clip_b").alias("new_id"))
        .agg(F.min("clip_a").alias("batch_rep"))
    )
    return (
        batch_sigs.select(F.col("clip_id").alias("new_id"))
        .join(corpus_hits, "new_id", "left")
        .join(in_batch, "new_id", "left")
        .select(
            F.col("new_id").alias("clip_id"),
            F.when(F.col("corpus_rep").isNotNull(), "dup_of_corpus")
            .when(F.col("batch_rep").isNotNull(), "dup_in_batch")
            .otherwise("keep")
            .alias("decision"),
            F.coalesce("corpus_rep", "batch_rep").alias("dup_of"),
        )
    )


def q_mm_audio_fp_dedup(spark, sf_dir):
    """AUDIO NEAR-DUP DEDUP (round 15, X2 x X5): the delta-sign
    fingerprint pipeline — the loudness-invariant audio analogue of
    the image dHash — end to end on REAL bytes: synthesize one mono
    PCM16 WAV per document (every doc_id % 9 == 0 stores the PREVIOUS
    document's samples SCALED x2 — a re-encode that changes every byte
    but no delta sign, functions/multimodal.synthesize_audio_clips),
    DECODE the bytes for real (wav_pcm_samples: the RIFF chunk walk),
    compute the 64-bit delta-sign fingerprint declaratively over the
    first 65 decoded samples (bit j = s[j+1] > s[j], stored as 4 x
    16-bit bands), prescreen with the same banded-Hamming bucket-
    grouped in-row pair expansion the image row uses, verify candidates
    exactly (full Hamming <= 2 AND equal zero-crossing count — both
    invariant under positive scaling, both integers), and emit the
    keep-list (drop the larger clip_id of every verified pair).
    Measured: bit mean 0.5005, max band bucket 17 at 5k clips — the
    candidate count stays linear.  Exact oracle: the sample arithmetic
    replayed relationally (lead() deltas -> band sums -> band self-join
    -> Hamming + zero-cross verify)."""
    from ..functions import multimodal as M

    clips = M.decode_pcm_samples(
        M.synthesize_audio_clips(_docs(spark, sf_dir))
    )
    dups = _audio_fp_dup_ids(clips)
    return (
        clips.select("clip_id")
        .join(dups, "clip_id", "left")
        .select("clip_id", F.col("dup").isNull().cast("int").alias("keep"))
    )


def _audio_sigs(clips):
    """(clip_id, bands, zc): the 64-bit delta-sign fingerprint of a
    decoded-sample frame as 4x16-bit band values plus the zero-crossing
    count — computed declaratively.  bands + zc ARE the persistable
    fingerprint (5 ints per clip): unlike the image store, the audio
    verify's second factor (equal zero crossings) is a scalar, so the
    incremental row's checkpoint carries the FULL two-factor verify."""
    s = F.col("s")

    def band_val(b: int):
        terms = []
        for j in range(16 * b, 16 * b + 16):
            terms.append(
                F.when(s[j + 1] > s[j], 1 << (j % 16)).otherwise(0)
            )
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out.cast("int")

    zc_terms = [
        F.when((s[i] >= 0) != (s[i + 1] >= 0), 1).otherwise(0)
        for i in range(64)
    ]
    zc = zc_terms[0]
    for t in zc_terms[1:]:
        zc = zc + t
    return clips.select(
        "clip_id",
        F.array(*[band_val(b) for b in range(4)]).alias("bands"),
        zc.cast("int").alias("zc"),
    )


def _audio_verified_pairs(sigs):
    """Verified near-dup PAIRS over an audio signature frame (clip_id,
    bands, zc): banded-Hamming bucket-grouped in-row pair expansion ->
    exact verify (Hamming <= 2 AND equal zero-crossing count) ->
    (clip_a < clip_b) pair frame."""
    bands = sigs.select(
        F.struct("clip_id", "bands", "zc").alias("el"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col("bands")[b].alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("el", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    members = (
        bands.groupBy("band", "bval")
        .agg(F.sort_array(F.collect_set("el")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    ds = F.col("ds")
    pairs = F.flatten(
        F.transform(
            ds,
            lambda a, i: F.transform(
                F.slice(ds, i + 2, F.size(ds) - i - 1),
                lambda b: F.struct(
                    a["clip_id"].alias("clip_a"),
                    b["clip_id"].alias("clip_b"),
                    F.aggregate(
                        F.zip_with(
                            a["bands"], b["bands"],
                            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
                        ),
                        F.lit(0),
                        lambda acc, x: acc + x,
                    ).alias("hamming"),
                    (a["zc"] == b["zc"]).alias("zc_eq"),
                ),
            ),
        )
    )
    return (
        members.select(F.explode(pairs).alias("p"))
        .select("p.clip_a", "p.clip_b", "p.hamming", "p.zc_eq")
        .distinct()
        .filter((F.col("hamming") <= 2) & F.col("zc_eq"))
    )


def _audio_fp_dup_ids(clips):
    """The delta-sign fingerprint DROP LIST over a decoded-sample frame
    (clip_id, s array<int> of 65): fingerprint -> banded-Hamming pair
    expansion -> exact verify -> the larger clip_id of every verified
    pair, as (clip_id, dup=1).  Shared by the standalone audio row and
    the AV multimodal corpus-prep capstone."""
    return (
        _audio_verified_pairs(_audio_sigs(clips))
        .select(F.col("clip_b").alias("clip_id"))
        .distinct()
        .withColumn("dup", F.lit(1))
    )


# the delta-sign fingerprint pipeline replayed relationally (samples ->
# lead() deltas -> band sums -> band self-join -> Hamming + zero-cross
# verify), parametrized only by the preceding `acorpus (clip_id, d,
# scale)` CTE — a-prefixed names so it composes with _PHASH_PIPE in one
# WITH (the AV capstone); shared by the standalone audio row
_AUDIO_FP_PIPE = """
    asmp AS (
      SELECT clip_id, i,
             (((d * 2654435761) % 1000003
               + ((d * 40503 + 17) % 997) * (i + 1)
               + ((d * 69621 + 31) % 983) * (i + 1) * (i + 1)) % 2001
              - 1000) * scale AS v
      FROM acorpus,
           (SELECT CAST(unnest(range(0, 65)) AS BIGINT) AS i)
    ),
    abits AS (
      SELECT clip_id, i,
             CAST(lead(v) OVER (PARTITION BY clip_id ORDER BY i) > v
                  AS INT) AS bit,
             CAST((v >= 0) !=
                  (lead(v) OVER (PARTITION BY clip_id ORDER BY i) >= 0)
                  AS INT) AS flip
      FROM asmp QUALIFY i < 64
    ),
    abands AS (
      SELECT clip_id, i // 16 AS band,
             CAST(sum(bit * (1 << (i % 16))) AS BIGINT) AS bval
      FROM abits GROUP BY clip_id, i // 16
    ),
    azc AS (
      SELECT clip_id, sum(flip) AS n_flip FROM abits GROUP BY clip_id
    ),
    acand AS (
      SELECT DISTINCT a.clip_id AS clip_a, b.clip_id AS clip_b
      FROM abands a
      JOIN abands b ON b.band = a.band AND b.bval = a.bval
                    AND a.clip_id < b.clip_id
    ),
    averified AS (
      SELECT cd.clip_a, cd.clip_b
      FROM acand cd
      WHERE (SELECT sum(bit_count(xor(ba.bval, bb.bval)))
             FROM abands ba JOIN abands bb ON bb.band = ba.band
             WHERE ba.clip_id = cd.clip_a AND bb.clip_id = cd.clip_b) <= 2
        AND (SELECT n_flip FROM azc WHERE clip_id = cd.clip_a)
            = (SELECT n_flip FROM azc WHERE clip_id = cd.clip_b)
    )
"""

# the audio corpus CTE (synthesize_audio_clips replayed): doc_id % 9
# == 0 stores the PREVIOUS document's samples scaled x2
_AUDIO_CORPUS = """
    acorpus AS (
      SELECT doc_id AS clip_id,
             CASE WHEN doc_id % 9 = 0 AND doc_id >= 1
                  THEN doc_id - 1 ELSE doc_id END AS d,
             CASE WHEN doc_id % 9 = 0 AND doc_id >= 1
                  THEN 2 ELSE 1 END AS scale
      FROM documents
    ),
"""

ORACLES["mm_audio_fp_dedup"] = (
    "WITH" + _AUDIO_CORPUS + _AUDIO_FP_PIPE + """
    SELECT clip_id,
           CAST(clip_id NOT IN (SELECT clip_b FROM averified) AS INT) AS keep
    FROM acorpus
"""
)


def q_pipeline_multimodal_prep(spark, sf_dir):
    """MULTIMODAL CORPUS PREP (round 15 capstone — X1+X2+X4+X5 in one
    keep-list): the decision pipeline a multimodal pretraining corpus
    runs, where a document survives only if BOTH its text and its
    image do:

      1. TEXT: the full pipeline_corpus_prep decision (Gopher quality
         gate + exact dedup + MinHash-LSH near-dup clusters);
      2. IMAGE: each document's image (one per doc, keyed by doc_id;
         every doc_id % 7 == 0 displays the PREVIOUS doc's gradient
         pixel-shifted and in the OPPOSITE container — BMP <-> PNG —
         functions/multimodal.synthesize_doc_images) through the REAL
         decode -> dHash -> banded-Hamming -> exact-verify drop list
         (_phash_dup_ids: drop the larger id of every verified pair);
      3. the verdict row: (doc_id, text_keep, image_keep, keep =
         text_keep AND image_keep).

    This is the composition the standalone rows exist for — the image
    near-dup decision gates the SAME manifest as the text decisions,
    which is what 'images are first-class corpus members' means.
    Every stage inherits its standalone row's audited plan shape; the
    only new operator is a doc_id-keyed left join of two keep frames.
    Exact oracle: the corpus-prep CTE joined against the relational
    dHash pipeline replay."""
    from ..functions import multimodal as M

    docs = _docs(spark, sf_dir)
    prep = q_pipeline_corpus_prep(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("text_keep")
    )
    px_df = M.decode_gray_pixels(M.synthesize_doc_images(docs))
    dups = _phash_dup_ids(px_df).select(
        F.col("img_id").alias("doc_id"), "dup"
    )
    return (
        prep.join(dups, "doc_id", "left")
        .select(
            "doc_id",
            F.col("text_keep").cast("int").alias("text_keep"),
            F.col("dup").isNull().cast("int").alias("image_keep"),
            ((F.col("text_keep") == 1) & F.col("dup").isNull())
            .cast("int")
            .alias("keep"),
        )
    )


# the dHash pipeline replayed relationally (pixels -> lead()
# comparisons -> band sums -> band self-join -> Hamming + pixel
# verify), parametrized only by the preceding `corpus (img_id, d,
# delta)` CTE — shared by the standalone phash row and the multimodal
# corpus-prep capstone
_PHASH_PIPE = """
    px AS (
      SELECT img_id, r, c,
             ((d * 2654435761) % 1000003
              + ((d * 40503 + 17) % 997) * (r + 1) * (r + 1)
              + ((d * 69621 + 31) % 983) * (c + 1) * (c + 1)
              + ((d * 48271 + 7) % 991) * (r + 1) * (c + 1)) % 250
             + delta AS v
      FROM corpus,
           (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS r),
           (SELECT CAST(unnest(range(0, 9)) AS BIGINT) AS c)
    ),
    bits AS (
      SELECT img_id, r, c,
             CAST(v > lead(v) OVER (PARTITION BY img_id, r ORDER BY c)
                  AS INT) AS bit
      FROM px QUALIFY c < 8
    ),
    bands AS (
      SELECT img_id, r // 2 AS band,
             CAST(sum(bit * (1 << ((r % 2) * 8 + c))) AS BIGINT) AS bval
      FROM bits GROUP BY img_id, r // 2
    ),
    cand AS (
      SELECT DISTINCT a.img_id AS img_a, b.img_id AS img_b
      FROM bands a
      JOIN bands b ON b.band = a.band AND b.bval = a.bval
                   AND a.img_id < b.img_id
    ),
    verified AS (
      SELECT cd.img_a, cd.img_b
      FROM cand cd
      WHERE (SELECT sum(bit_count(xor(ba.bval, bb.bval)))
             FROM bands ba JOIN bands bb ON bb.band = ba.band
             WHERE ba.img_id = cd.img_a AND bb.img_id = cd.img_b) <= 2
        AND (SELECT sum(abs(pa.v - pb.v))
             FROM px pa JOIN px pb ON pb.r = pa.r AND pb.c = pa.c
                  AND pa.img_id = cd.img_a AND pb.img_id = cd.img_b) <= 144
    )
"""

ORACLES["mm_phash_dedup"] = """
    WITH corpus AS (
      SELECT doc_id AS img_id, doc_id AS d, 0 AS delta FROM documents
      UNION ALL
      SELECT doc_id + 1000000, doc_id, 1 + doc_id % 2
      FROM documents WHERE doc_id % 7 = 0
    ),
""" + _PHASH_PIPE + """
    SELECT img_id,
           CAST(img_id NOT IN (SELECT img_b FROM verified) AS INT) AS keep
    FROM corpus
"""


from .text_q import ORACLES as _text_oracles  # noqa: E402 — no cycle:
# text_q only imports dedup_q lazily inside function bodies

# the token-true manifest: corpus-prep decision CTE + the FULL unrolled
# BPE train+encode chain + the same shuffle/packing arithmetic, with the
# cumulative budget advancing by the BPE post-merge symbol count
ORACLES["pipeline_bpe_manifest"] = (
    "WITH prep AS ("
    + _corpus_prep_oracle()
    + "), bpe AS ("
    + _text_oracles["text_bpe_encode"]
    + """), kept AS (
      SELECT p.doc_id, CAST(b.n_sym_after AS BIGINT) AS n_tokens
      FROM prep p JOIN bpe b ON b.doc_id = p.doc_id
      WHERE p.keep = 1
    ), keyed AS (
      SELECT doc_id, n_tokens,
             list_reduce(list_transform(range(1, 16),
                 j -> strpos('0123456789abcdef',
                             substr(md5('shuf42|' || CAST(doc_id AS VARCHAR)), j, 1)) - 1),
                 (a, b) -> a * 16 + b) AS hkey
      FROM kept
    ), ordered AS (
      SELECT doc_id, n_tokens, hkey % 8 AS shard,
             row_number() OVER (PARTITION BY hkey % 8
                                ORDER BY hkey, doc_id) AS pos,
             coalesce(sum(n_tokens) OVER (
                 PARTITION BY hkey % 8 ORDER BY hkey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
      FROM keyed
    )
    SELECT doc_id, CAST(shard AS INT) AS shard, CAST(pos AS INT) AS pos,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_before // 2048 AS BIGINT) AS seq_id,
           CAST(cum_before % 2048 AS BIGINT) AS seq_offset
    FROM ordered
"""
)


# the multimodal keep-list: text decision (full corpus-prep CTE) AND
# image decision (the dHash pipeline over the aliased doc-image corpus:
# doc_id % 7 == 0 displays doc_id - 1's gradient, shifted)
ORACLES["pipeline_multimodal_prep"] = (
    "WITH prep AS ("
    + _corpus_prep_oracle()
    + """),
    corpus AS (
      SELECT doc_id AS img_id,
             CASE WHEN doc_id % 7 = 0 AND doc_id >= 1
                  THEN doc_id - 1 ELSE doc_id END AS d,
             CASE WHEN doc_id % 7 = 0 AND doc_id >= 1
                  THEN 1 + doc_id % 2 ELSE 0 END AS delta
      FROM documents
    ),
"""
    + _PHASH_PIPE
    + """
    SELECT p.doc_id,
           CAST(p.keep AS INT) AS text_keep,
           CAST(v.img_b IS NULL AS INT) AS image_keep,
           CAST(p.keep = 1 AND v.img_b IS NULL AS INT) AS keep
    FROM prep p
    LEFT JOIN (SELECT DISTINCT img_b FROM verified) v
           ON v.img_b = p.doc_id
"""
)


def q_mm_video_fp_dedup(spark, sf_dir):
    """VIDEO NEAR-DUP DEDUP (round 16 — the last X2 modality): the
    frame-fingerprint pipeline a video training corpus runs, end to
    end on REAL bytes — synthesize one 4-frame animated GIF per
    document plus, for every doc_id % 11 == 0, a planted near-dup clip
    that is both RE-ENCODED (every pixel +1 + d%2) and TEMPORALLY
    OFFSET (head-trimmed by one frame: its frames show the source's
    content frames 1..4, frame 4 being content the source never
    displays — functions/multimodal.synthesize_video_clips), DECODE
    every frame for real (gif_py.decode_gif_frames: the full
    multi-image LZW walk), dHash EACH FRAME declaratively with the
    shared image machinery (4 x 16-bit bands, JVM-side comparisons),
    prescreen FRAME pairs across clips with the banded-Hamming
    bucket-grouped in-row pair expansion (one shuffle to the bucket,
    no self-join), verify frame pairs exactly (full Hamming <= 2 via
    bit_count(xor) AND pixel distance sum|a-b| <= 144 via zip_with),
    and call two clips near-dups when >= 3 DISTINCT frame pairs
    verify — the planted copies match on exactly 3 of 4 frames at
    Hamming 0 by construction, so recall is exact, while a single
    accidental frame collision can never fabricate a clip pair.  Emit
    the keep-list (drop the larger clip_id).  Per-frame mixers keep
    the dHash bit mean ~0.5, so band buckets stay O(1) and the
    candidate count is linear in frames — the 100 TB posture of the
    image row, one explode deeper.  Exact oracle: the generating
    arithmetic replayed relationally (frame grid -> lead() comparisons
    -> band sums -> band self-join -> frame verify -> >= 3 frame-pair
    count per clip pair)."""
    from ..functions import multimodal as M

    frames = M.decode_gray_frame_pixels(
        M.synthesize_video_clips(_docs(spark, sf_dir))
    )
    dups = _video_fp_dup_ids(frames)
    return (
        frames.select("clip_id")
        .distinct()
        .join(dups, "clip_id", "left")
        .select("clip_id", F.col("dup").isNull().cast("int").alias("keep"))
    )


def _video_fp_dup_ids(frames, min_frames: int = 3):
    """The video near-dup DROP LIST over a decoded-frame frame
    (clip_id, fidx, px array<int> of 72): per-frame 64-bit dHash as
    4x16-bit bands -> banded-Hamming bucket-grouped in-row pair
    expansion ACROSS clips -> exact frame verify (Hamming <= 2 AND
    sum|a-b| <= 144) -> clip pairs with >= min_frames distinct
    verified frame pairs -> the larger clip_id, as (clip_id, dup=1)."""
    px = F.col("px")

    def band_val(b: int):
        terms = []
        for rr in (2 * b, 2 * b + 1):
            for c in range(8):
                w = 1 << ((rr % 2) * 8 + c)
                terms.append(
                    F.when(px[rr * 9 + c] > px[rr * 9 + c + 1], w).otherwise(0)
                )
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out.cast("int")

    sigs = frames.select(
        "clip_id", "fidx", "px",
        F.array(*[band_val(b) for b in range(4)]).alias("bands"),
    )
    bands = sigs.select(
        F.struct("clip_id", "fidx", "bands", "px").alias("el"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col("bands")[b].alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("el", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    members = (
        bands.groupBy("band", "bval")
        .agg(F.sort_array(F.collect_set("el")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    ds = F.col("ds")
    pairs = F.flatten(
        F.transform(
            ds,
            lambda a, i: F.transform(
                F.slice(ds, i + 2, F.size(ds) - i - 1),
                lambda b: F.struct(
                    a["clip_id"].alias("clip_a"),
                    a["fidx"].alias("fa"),
                    b["clip_id"].alias("clip_b"),
                    b["fidx"].alias("fb"),
                    F.aggregate(
                        F.zip_with(
                            a["bands"], b["bands"],
                            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
                        ),
                        F.lit(0),
                        lambda acc, x: acc + x,
                    ).alias("hamming"),
                    F.aggregate(
                        F.zip_with(a["px"], b["px"], lambda x, y: F.abs(x - y)),
                        F.lit(0),
                        lambda acc, x: acc + x,
                    ).alias("pixdist"),
                ),
            ),
        )
    )
    fver = (
        members.select(F.explode(pairs).alias("p"))
        .select("p.clip_a", "p.fa", "p.clip_b", "p.fb", "p.hamming", "p.pixdist")
        .filter(F.col("clip_a") != F.col("clip_b"))
        .distinct()
        .filter((F.col("hamming") <= 2) & (F.col("pixdist") <= 144))
    )
    cver = (
        fver.groupBy("clip_a", "clip_b")
        .agg(F.countDistinct("fa", "fb").alias("nfp"))
        .filter(F.col("nfp") >= min_frames)
    )
    return (
        cver.select(F.col("clip_b").alias("clip_id"))
        .distinct()
        .withColumn("dup", F.lit(1))
    )


# the per-frame dHash video pipeline replayed relationally (frame grid
# -> lead() comparisons -> band sums -> band self-join -> frame verify
# -> >= 3 distinct frame pairs per clip pair), parametrized only by the
# preceding `vcorpus (clip_id, d, f_off, delta)` CTE — v-prefixed names
# so it composes with the image and audio pipes in one WITH; shared by
# the standalone video row and the all-modality corpus-prep capstone
_VIDEO_FP_PIPE = """
    vfr AS (
      SELECT clip_id, d, g, g + f_off AS cf, delta
      FROM vcorpus, (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS g)
    ),
    vpx AS (
      SELECT clip_id, g, r, c,
             ((d * 2654435761 + cf * 1315423911) % 1000003
              + ((d * 40503 + cf * 2246822519 + 17) % 997)
                * (r + 1) * (r + 1)
              + ((d * 69621 + cf * 3266489917 + 31) % 983)
                * (c + 1) * (c + 1)
              + ((d * 48271 + cf * 668265263 + 7) % 991)
                * (r + 1) * (c + 1)) % 250
             + delta AS v
      FROM vfr,
           (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS r),
           (SELECT CAST(unnest(range(0, 9)) AS BIGINT) AS c)
    ),
    vbits AS (
      SELECT clip_id, g, r, c,
             CAST(v > lead(v) OVER (PARTITION BY clip_id, g, r ORDER BY c)
                  AS INT) AS bit
      FROM vpx QUALIFY c < 8
    ),
    vbands AS (
      SELECT clip_id, g, r // 2 AS band,
             CAST(sum(bit * (1 << ((r % 2) * 8 + c))) AS BIGINT) AS bval
      FROM vbits GROUP BY clip_id, g, r // 2
    ),
    vcand AS (
      SELECT DISTINCT a.clip_id AS clip_a, a.g AS fa,
                      b.clip_id AS clip_b, b.g AS fb
      FROM vbands a
      JOIN vbands b ON b.band = a.band AND b.bval = a.bval
                    AND a.clip_id < b.clip_id
    ),
    vfver AS (
      SELECT cd.clip_a, cd.fa, cd.clip_b, cd.fb
      FROM vcand cd
      WHERE (SELECT sum(bit_count(xor(ba.bval, bb.bval)))
             FROM vbands ba JOIN vbands bb ON bb.band = ba.band
             WHERE ba.clip_id = cd.clip_a AND ba.g = cd.fa
               AND bb.clip_id = cd.clip_b AND bb.g = cd.fb) <= 2
        AND (SELECT sum(abs(pa.v - pb.v))
             FROM vpx pa JOIN vpx pb
               ON pb.r = pa.r AND pb.c = pa.c
             WHERE pa.clip_id = cd.clip_a AND pa.g = cd.fa
               AND pb.clip_id = cd.clip_b AND pb.g = cd.fb) <= 144
    ),
    vcver AS (
      SELECT clip_a, clip_b
      FROM vfver GROUP BY clip_a, clip_b
      HAVING count(DISTINCT (fa, fb)) >= 3
    )
"""

ORACLES["mm_video_fp_dedup"] = (
    """
    WITH vcorpus AS (
      SELECT doc_id AS clip_id, doc_id AS d,
             0 AS f_off, 0 AS delta
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000, doc_id, 1, 1 + doc_id % 2
      FROM documents WHERE doc_id % 11 = 0
    ),
"""
    + _VIDEO_FP_PIPE
    + """
    SELECT clip_id,
           CAST(clip_id NOT IN (SELECT clip_b FROM vcver) AS INT) AS keep
    FROM vcorpus
"""
)


def q_pipeline_multimodal_prep_av(spark, sf_dir):
    """MULTIMODAL CORPUS PREP, ALL MODALITIES (round 16 capstone —
    X1+X2+X4+X5 over text AND image AND audio AND video): the full
    corpus-prep decision where a document survives only if EVERY
    implemented modality's gate passes:

      1. TEXT: the full pipeline_corpus_prep decision (Gopher quality
         gate + exact dedup + MinHash-LSH near-dup clusters);
      2. IMAGE: the document's image (synthesize_doc_images: doc_id %
         7 == 0 displays the previous doc's gradient, shifted, in the
         opposite container) through the real-decode dHash drop list
         (_phash_dup_ids);
      3. AUDIO: the document's clip (synthesize_audio_clips: doc_id %
         9 == 0 stores the previous doc's samples scaled x2) through
         the real-decode delta-sign fingerprint drop list
         (_audio_fp_dup_ids);
      4. VIDEO: the document's 4-frame clip (synthesize_doc_videos:
         doc_id % 13 == 0 shows the previous doc's clip re-encoded
         AND head-trimmed one frame) through the real multi-frame
         decode -> per-frame dHash -> >= 3-frame-pair drop list
         (_video_fp_dup_ids);
      5. the verdict row: (doc_id, text_keep, image_keep, audio_keep,
         video_keep, keep = all four).

    This closes the r15 gap and its r16 extension: every modality the
    engine decodes — text, image, audio, video — gates the SAME
    manifest; each stage inherits its standalone row's audited plan
    shape, and the composition is three doc_id-keyed left joins of
    keep frames.  Exact oracle: the corpus-prep CTE joined against all
    three fingerprint pipeline replays composed in one WITH."""
    from ..functions import multimodal as M

    docs = _docs(spark, sf_dir)
    prep = q_pipeline_corpus_prep(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("text_keep")
    )
    img_dups = _phash_dup_ids(
        M.decode_gray_pixels(M.synthesize_doc_images(docs))
    ).select(F.col("img_id").alias("doc_id"), F.col("dup").alias("img_dup"))
    aud_dups = _audio_fp_dup_ids(
        M.decode_pcm_samples(M.synthesize_audio_clips(docs))
    ).select(F.col("clip_id").alias("doc_id"), F.col("dup").alias("aud_dup"))
    vid_dups = _video_fp_dup_ids(
        M.decode_gray_frame_pixels(M.synthesize_doc_videos(docs))
    ).select(F.col("clip_id").alias("doc_id"), F.col("dup").alias("vid_dup"))
    return (
        prep.join(img_dups, "doc_id", "left")
        .join(aud_dups, "doc_id", "left")
        .join(vid_dups, "doc_id", "left")
        .select(
            "doc_id",
            F.col("text_keep").cast("int").alias("text_keep"),
            F.col("img_dup").isNull().cast("int").alias("image_keep"),
            F.col("aud_dup").isNull().cast("int").alias("audio_keep"),
            F.col("vid_dup").isNull().cast("int").alias("video_keep"),
            (
                (F.col("text_keep") == 1)
                & F.col("img_dup").isNull()
                & F.col("aud_dup").isNull()
                & F.col("vid_dup").isNull()
            )
            .cast("int")
            .alias("keep"),
        )
    )


# the all-modality keep-list: text decision (full corpus-prep CTE) AND
# image decision (_PHASH_PIPE over the aliased doc-image corpus) AND
# audio decision (_AUDIO_FP_PIPE over the aliased clip corpus) AND
# video decision (_VIDEO_FP_PIPE over the aliased doc-video corpus) in
# one WITH — the a-/v-prefixed CTE names exist so the three fingerprint
# pipelines compose
ORACLES["pipeline_multimodal_prep_av"] = (
    "WITH prep AS ("
    + _corpus_prep_oracle()
    + """),
    corpus AS (
      SELECT doc_id AS img_id,
             CASE WHEN doc_id % 7 = 0 AND doc_id >= 1
                  THEN doc_id - 1 ELSE doc_id END AS d,
             CASE WHEN doc_id % 7 = 0 AND doc_id >= 1
                  THEN 1 + doc_id % 2 ELSE 0 END AS delta
      FROM documents
    ),
"""
    + _PHASH_PIPE
    + ","
    + _AUDIO_CORPUS
    + _AUDIO_FP_PIPE
    + """,
    vcorpus AS (
      SELECT doc_id AS clip_id,
             CASE WHEN doc_id % 13 = 0 AND doc_id >= 1
                  THEN doc_id - 1 ELSE doc_id END AS d,
             CASE WHEN doc_id % 13 = 0 AND doc_id >= 1
                  THEN 1 ELSE 0 END AS f_off,
             CASE WHEN doc_id % 13 = 0 AND doc_id >= 1
                  THEN 1 + doc_id % 2 ELSE 0 END AS delta
      FROM documents
    ),
"""
    + _VIDEO_FP_PIPE
    + """
    SELECT p.doc_id,
           CAST(p.keep AS INT) AS text_keep,
           CAST(v.img_b IS NULL AS INT) AS image_keep,
           CAST(av.clip_b IS NULL AS INT) AS audio_keep,
           CAST(vv.clip_b IS NULL AS INT) AS video_keep,
           CAST(p.keep = 1 AND v.img_b IS NULL AND av.clip_b IS NULL
                AND vv.clip_b IS NULL AS INT) AS keep
    FROM prep p
    LEFT JOIN (SELECT DISTINCT img_b FROM verified) v
           ON v.img_b = p.doc_id
    LEFT JOIN (SELECT DISTINCT clip_b FROM averified) av
           ON av.clip_b = p.doc_id
    LEFT JOIN (SELECT DISTINCT clip_b FROM vcver) vv
           ON vv.clip_b = p.doc_id
"""
)


# the incremental image pipeline replayed relationally: BOTH corpora's
# generating arithmetic (corpus originals + the % 5 batch rules) -> the
# shared dHash grid -> side-separated band joins -> the two verify
# rules (bands-only vs the corpus fingerprint store, bands + pixel
# distance in-batch) -> dedup_incremental's decision precedence
ORACLES["mm_phash_incremental"] = """
    WITH allimgs AS (
      SELECT doc_id AS img_id, doc_id AS k, 0 AS delta, 0 AS is_new
      FROM documents
      UNION ALL
      SELECT doc_id + 2000000,
             CASE WHEN doc_id % 5 = 0 THEN doc_id
                  WHEN doc_id % 5 = 1 THEN 600000 + doc_id + 1
                  ELSE 600000 + doc_id END,
             CASE WHEN doc_id % 5 IN (0, 1) THEN 1 + doc_id % 2
                  ELSE 0 END,
             1
      FROM documents
    ),
    px AS (
      SELECT img_id, is_new, r, c,
             ((k * 2654435761) % 1000003
              + ((k * 40503 + 17) % 997) * (r + 1) * (r + 1)
              + ((k * 69621 + 31) % 983) * (c + 1) * (c + 1)
              + ((k * 48271 + 7) % 991) * (r + 1) * (c + 1)) % 250
             + delta AS v
      FROM allimgs,
           (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS r),
           (SELECT CAST(unnest(range(0, 9)) AS BIGINT) AS c)
    ),
    bits AS (
      SELECT img_id, is_new, r, c,
             CAST(v > lead(v) OVER (PARTITION BY img_id, r ORDER BY c)
                  AS INT) AS bit
      FROM px QUALIFY c < 8
    ),
    bands AS (
      SELECT img_id, is_new, r // 2 AS band,
             CAST(sum(bit * (1 << ((r % 2) * 8 + c))) AS BIGINT) AS bval
      FROM bits GROUP BY img_id, is_new, r // 2
    ),
    cross_cand AS (
      SELECT DISTINCT n.img_id AS new_id, o.img_id AS old_id
      FROM bands n JOIN bands o ON o.band = n.band AND o.bval = n.bval
      WHERE n.is_new = 1 AND o.is_new = 0
    ),
    corpus_hits AS (
      SELECT new_id, min(old_id) AS corpus_rep
      FROM cross_cand cc
      WHERE (SELECT sum(bit_count(xor(bn.bval, bo.bval)))
             FROM bands bn JOIN bands bo ON bo.band = bn.band
             WHERE bn.img_id = cc.new_id AND bo.img_id = cc.old_id) <= 2
      GROUP BY new_id
    ),
    batch_cand AS (
      SELECT DISTINCT a.img_id AS img_a, b.img_id AS img_b
      FROM bands a JOIN bands b ON b.band = a.band AND b.bval = a.bval
                AND a.img_id < b.img_id
      WHERE a.is_new = 1 AND b.is_new = 1
    ),
    batch_hits AS (
      SELECT img_b AS new_id, min(img_a) AS batch_rep
      FROM batch_cand cd
      WHERE (SELECT sum(bit_count(xor(ba.bval, bb.bval)))
             FROM bands ba JOIN bands bb ON bb.band = ba.band
             WHERE ba.img_id = cd.img_a AND bb.img_id = cd.img_b) <= 2
        AND (SELECT sum(abs(pa.v - pb.v))
             FROM px pa JOIN px pb ON pb.r = pa.r AND pb.c = pa.c
                  AND pa.img_id = cd.img_a AND pb.img_id = cd.img_b) <= 144
      GROUP BY img_b
    )
    SELECT n.img_id,
           CASE WHEN ch.corpus_rep IS NOT NULL THEN 'dup_of_corpus'
                WHEN bh.batch_rep IS NOT NULL THEN 'dup_in_batch'
                ELSE 'keep' END AS decision,
           coalesce(ch.corpus_rep, bh.batch_rep) AS dup_of
    FROM allimgs n
    LEFT JOIN corpus_hits ch ON ch.new_id = n.img_id
    LEFT JOIN batch_hits bh ON bh.new_id = n.img_id
    WHERE n.is_new = 1
"""


# the incremental audio pipeline replayed relationally: both corpora's
# sample arithmetic -> the shared delta-sign grid -> side-separated
# band joins -> the SAME two-factor verify on both sides (the store
# carries bands AND zero crossings) -> the decision precedence
ORACLES["mm_audio_fp_incremental"] = """
    WITH allclips AS (
      SELECT doc_id AS clip_id, doc_id AS k, 1 AS scale, 0 AS is_new
      FROM documents
      UNION ALL
      SELECT doc_id + 2000000,
             CASE WHEN doc_id % 5 = 0 THEN doc_id
                  WHEN doc_id % 5 = 1 THEN 600000 + doc_id + 1
                  ELSE 600000 + doc_id END,
             CASE WHEN doc_id % 5 IN (0, 1) THEN 2 ELSE 1 END,
             1
      FROM documents
    ),
    smp AS (
      SELECT clip_id, is_new, i,
             (((k * 2654435761) % 1000003
               + ((k * 40503 + 17) % 997) * (i + 1)
               + ((k * 69621 + 31) % 983) * (i + 1) * (i + 1)) % 2001
              - 1000) * scale AS v
      FROM allclips,
           (SELECT CAST(unnest(range(0, 65)) AS BIGINT) AS i)
    ),
    bits AS (
      SELECT clip_id, is_new, i,
             CAST(lead(v) OVER (PARTITION BY clip_id ORDER BY i) > v
                  AS INT) AS bit,
             CAST((v >= 0) !=
                  (lead(v) OVER (PARTITION BY clip_id ORDER BY i) >= 0)
                  AS INT) AS flip
      FROM smp QUALIFY i < 64
    ),
    bands AS (
      SELECT clip_id, is_new, i // 16 AS band,
             CAST(sum(bit * (1 << (i % 16))) AS BIGINT) AS bval
      FROM bits GROUP BY clip_id, is_new, i // 16
    ),
    zc AS (
      SELECT clip_id, sum(flip) AS n_flip FROM bits GROUP BY clip_id
    ),
    cross_cand AS (
      SELECT DISTINCT n.clip_id AS new_id, o.clip_id AS old_id
      FROM bands n JOIN bands o ON o.band = n.band AND o.bval = n.bval
      WHERE n.is_new = 1 AND o.is_new = 0
    ),
    corpus_hits AS (
      SELECT new_id, min(old_id) AS corpus_rep
      FROM cross_cand cc
      WHERE (SELECT sum(bit_count(xor(bn.bval, bo.bval)))
             FROM bands bn JOIN bands bo ON bo.band = bn.band
             WHERE bn.clip_id = cc.new_id AND bo.clip_id = cc.old_id) <= 2
        AND (SELECT n_flip FROM zc WHERE clip_id = cc.new_id)
            = (SELECT n_flip FROM zc WHERE clip_id = cc.old_id)
      GROUP BY new_id
    ),
    batch_cand AS (
      SELECT DISTINCT a.clip_id AS clip_a, b.clip_id AS clip_b
      FROM bands a JOIN bands b ON b.band = a.band AND b.bval = a.bval
                AND a.clip_id < b.clip_id
      WHERE a.is_new = 1 AND b.is_new = 1
    ),
    batch_hits AS (
      SELECT clip_b AS new_id, min(clip_a) AS batch_rep
      FROM batch_cand cd
      WHERE (SELECT sum(bit_count(xor(ba.bval, bb.bval)))
             FROM bands ba JOIN bands bb ON bb.band = ba.band
             WHERE ba.clip_id = cd.clip_a AND bb.clip_id = cd.clip_b) <= 2
        AND (SELECT n_flip FROM zc WHERE clip_id = cd.clip_a)
            = (SELECT n_flip FROM zc WHERE clip_id = cd.clip_b)
      GROUP BY clip_b
    )
    SELECT n.clip_id,
           CASE WHEN ch.corpus_rep IS NOT NULL THEN 'dup_of_corpus'
                WHEN bh.batch_rep IS NOT NULL THEN 'dup_in_batch'
                ELSE 'keep' END AS decision,
           coalesce(ch.corpus_rep, bh.batch_rep) AS dup_of
    FROM allclips n
    LEFT JOIN corpus_hits ch ON ch.new_id = n.clip_id
    LEFT JOIN batch_hits bh ON bh.new_id = n.clip_id
    WHERE n.is_new = 1
"""


QUERIES = {
    "mm_video_fp_dedup": q_mm_video_fp_dedup,
    "mm_phash_incremental": q_mm_phash_incremental,
    "mm_audio_fp_incremental": q_mm_audio_fp_incremental,
    "pipeline_multimodal_prep_av": q_pipeline_multimodal_prep_av,
    "pipeline_bpe_manifest": q_pipeline_bpe_manifest,
    "pipeline_multimodal_prep": q_pipeline_multimodal_prep,
    "mm_phash_dedup": q_mm_phash_dedup,
    "mm_audio_fp_dedup": q_mm_audio_fp_dedup,
    "dedup_exact_prefix": q_dedup_exact_prefix,
    "pipeline_corpus_prep": q_pipeline_corpus_prep,
    "pipeline_training_manifest": q_pipeline_training_manifest,
    "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
    "dedup_jaccard_prefix_filter": q_dedup_jaccard_prefix_filter,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_lsh_recall_report": q_dedup_lsh_recall_report,
    "dedup_lsh_band_select": q_dedup_lsh_band_select,
    "dedup_clusters": q_dedup_clusters,
    "dedup_keep_list": q_dedup_keep_list,
    "dedup_edit_distance": q_dedup_edit_distance,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_incremental": q_dedup_incremental,
}
