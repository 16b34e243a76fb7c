"""Similarity search over embedding columns (north-star X3).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant is the scale path (candidates shrink by the bucket selectivity, and
the join is an equi-join on the bucket key, so a 100 TB corpus never
cross-joins).  Dot products are computed as left-fold double accumulation
(`F.aggregate` over `zip_with`), which matches DuckDB's list_inner_product
bit-for-bit — verified empirically — so even cosine values oracle-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources import spread

# Driver-side guard on the "small by contract" (sampled) query side of
# the GEMM scorers (r18, guide §5): 200k 64-dim int64/float64 rows is
# ~100 MB collected+broadcast — far above any sampled probe set (the
# declared queries sample ~2% of the corpus: ~100 rows at sf0.1, ~100k
# at a 1000x corpus) yet low enough that the collect can never OOM the
# driver silently.  Beyond it the contract is being violated and the
# caller must re-sample, so fail loudly instead of paging.
_MAX_QUERY_SIDE_ROWS = 200_000

# Ship the collected query matrix to tasks by CLOSURE below this many
# bytes and by sparkContext.broadcast above it (r18, measured both
# ways): a task closure is pickled+shipped per TASK, so a big matrix
# multiplies by the task count (the VERDICT r17 scale concern), but a
# PySpark broadcast costs each task a per-task value load that profiled
# at ~0.25 s/task on the GEMM stage (32 tasks: run-sum 8.05 s vs 0.63 s
# closure — a confirmed bench regression on sim_drift_recall_retune).
# The sampled query sides of every declared query are a few KB, far
# under the line; only a contract-edge caller pays the broadcast path.
_BROADCAST_QUERY_BYTES = 4 << 20


def _ship_query_payload(sc, payload: tuple, nbytes: int):
    """(payload, bc) pair for the closure-vs-broadcast decision: exactly
    one of the two is non-None, so the task closure never carries the
    matrix when the broadcast does."""
    if nbytes > _BROADCAST_QUERY_BYTES:
        return None, sc.broadcast(payload)
    return payload, None


def as_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _local_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-input-partition pre-top-k over a (q_id, vec_id, sim) frame.

    Keeps at most k candidates per q_id per input partition before the
    final global rank, so the per-q_id exchange carries ≤ k × n_partitions
    rows per query instead of every scored candidate — the 100 TB fix for
    the single-reducer rank hotspot.  Implemented entirely JVM-side: a
    row_number window keyed on (captured input partition id, q_id) using
    the EXACT order expression `_global_rank` uses, so the composition is
    exact by construction — including NULL (last under desc) and NaN
    (greatest) placement, which a Python/Arrow pre-pass could not
    guarantee (Arrow turns pandas NaN into NULL).  The (pid, q_id) keying
    spreads the first exchange across n_partitions × n_queries reducers;
    no single key ever receives more than one input partition's
    candidates.
    """
    pre = scored.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid", "q_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    return (
        pre.withColumn("_lr", F.row_number().over(w))
        .filter(F.col("_lr") <= k)
        .drop("_pid", "_lr")
    )


def _global_rank(scored: DataFrame, k: int) -> DataFrame:
    """Final exact per-query rank over the (small) pre-top-k'd candidates."""
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "sim")
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold double dot product (engine-portable order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide, not `/`: under ANSI mode (Spark 4 default) a zero-norm
    # vector anywhere in a 100 TB corpus would fail the whole job; NULL
    # sim instead sorts nulls-last out of every top-k.  DuckDB's double
    # division returns NULL on ÷0 too, so the oracle matches bit-for-bit.
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors: broadcast the query set against the
    corpus (at scale the query side is the small one), rank per query.

    Expects `queries` (q_id, q_vec) and `corpus` (vec_id, embedding).
    The corpus side is spread across cores first: the broadcast join is
    narrow, so scoring parallelism equals corpus partition count.
    """
    scored = spread(corpus).join(
        F.broadcast(queries), F.col("q_id") != F.col("vec_id")
    ).select(
        "q_id",
        "vec_id",
        cosine(as_double_vec(F.col("q_vec")), as_double_vec(F.col("embedding"))).alias(
            "sim"
        ),
    )
    return _global_rank(_local_topk(scored, k), k)


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign bits of the first n_bits dimensions.
    (A stand-in for random hyperplanes that stays engine-portable; the
    plane family is the coordinate axes.)"""
    bits = [
        F.when(vec[i] >= 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(n_bits)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def brute_force_topk_fast(
    queries: DataFrame, corpus: DataFrame, k: int = 5
) -> DataFrame:
    """Vectorized twin of brute_force_topk: one numpy GEMM per Arrow batch
    (mapInPandas) scores the batch against the whole (small, collected)
    query matrix at once — the actual 100 TB hot path, ~10-100× the
    throughput of the expression-tree fold.  Numerically it differs from
    the fold by summation order (BLAS pairwise), so this is rows-only:
    brute_force_topk is the oracle-exact baseline, and tests pin the two
    rankings against each other.

    Scale shape: each Arrow batch emits only its LOCAL top-k per query
    (tie-exact lexsort on (-sim, vec_id), the same order the global rank
    uses), so the per-q_id rank exchange carries ≤ k × n_batches rows —
    never the full scored corpus."""
    import numpy as np
    import pandas as pd

    # query side: driver-guarded collect, shipped by size (r18, guide
    # §5/§3.1; VERDICT r17 task 6): the hard row guard turns a
    # contract-violating ("sampled, small") query side into a loud
    # error instead of a driver-memory cliff, and _ship_query_payload
    # moves the matrix by closure when small (the declared-query case)
    # or by ONE broadcast per executor when large — never a big pickle
    # per task.
    q_rows = queries.select("q_id", "q_vec").collect()
    if len(q_rows) > _MAX_QUERY_SIDE_ROWS:
        raise ValueError(
            f"brute_force_topk_fast: query side exceeds the "
            f"{_MAX_QUERY_SIDE_ROWS}-row broadcast contract"
        )
    q_ids = np.array([r.q_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.q_vec for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    payload, bc = _ship_query_payload(
        queries.sparkSession.sparkContext,
        (q_ids, q_mat, q_norm),
        q_ids.nbytes + q_mat.nbytes + q_norm.nbytes,
    )

    def score_batches(batches):
        q_ids, q_mat, q_norm = payload if bc is None else bc.value
        for pdf in batches:
            c_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            c_ids = pdf["vec_id"].to_numpy()
            sims = (c_mat @ q_mat.T) / (
                np.linalg.norm(c_mat, axis=1)[:, None] * q_norm[None, :]
            )
            n_c, n_q = sims.shape
            # keep k+1 locally: the q_id == vec_id self-row is filtered
            # AFTER this, so the boundary candidate must survive
            kk = min(k + 1, n_c)
            skey = np.where(np.isnan(sims), np.inf, sims)  # NaN sorts greatest
            out_q, out_v, out_s = [], [], []
            for j in range(n_q):
                top = np.lexsort((c_ids, -skey[:, j]))[:kk]
                out_q.append(np.full(kk, q_ids[j]))
                out_v.append(c_ids[top])
                out_s.append(sims[top, j])
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "sim": np.concatenate(out_s),
                }
            )

    scored = (
        spread(corpus)
        .select("vec_id", "embedding")
        .mapInPandas(score_batches, "q_id long, vec_id long, sim double")
        .filter(F.col("q_id") != F.col("vec_id"))
    )
    return _global_rank(scored, k)


def exact_l2q_topk_fast(
    queries: DataFrame, corpus: DataFrame, k: int = 5
) -> DataFrame:
    """Exact integer-L2 top-k via one int64 GEMM per Arrow batch — the
    vectorized twin of the crossJoin + `_dist2_q` fold (r17, guide §4.2
    'hand whole batches to native code').  Unlike the float cosine twin
    (`brute_force_topk_fast`, rows-only) this one is EXACT, not just
    rank-equivalent: every distance is int64 arithmetic
    (d2 = |q|² + |c|² − 2·q·c), associative and overflow-free for
    scale-1000 quantized vectors (|x| ≤ ~10³ ⇒ every term ≤ ~10⁸·dim),
    so the (d2, vec_id) ranking is bit-identical to the expression-tree
    fold under any batch split.  Each batch emits only its local
    top-(k+1) per query — the q_id == vec_id self-pair is filtered
    after, so the boundary candidate must survive — and the final rank
    exchange carries ≤ (k+1) × n_batches rows per query, never the
    scored cross product.

    Expects `queries` (q_id, q_xq: array<long>) — small by contract
    (sampled) — and `corpus` (vec_id, xq: array<long>).  Returns the
    exact (q_id, vec_id) top-k under (d2 asc, vec_id asc), identical to

        queries.crossJoin(corpus).filter(q_id != vec_id)
               .withColumn(rn, row_number over (q_id order d2, vec_id))
               .filter(rn <= k)
    """
    import numpy as np
    import pandas as pd

    # same guarded ship-by-size discipline as brute_force_topk_fast
    # (r18, guide §5/§3.1; VERDICT r17 task 6)
    q_rows = queries.select("q_id", "q_xq").collect()
    if len(q_rows) > _MAX_QUERY_SIDE_ROWS:
        raise ValueError(
            f"exact_l2q_topk_fast: query side exceeds the "
            f"{_MAX_QUERY_SIDE_ROWS}-row broadcast contract"
        )
    q_ids = np.array([r.q_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.q_xq for r in q_rows], dtype=np.int64)
    q_sq = (q_mat * q_mat).sum(axis=1)
    payload, bc = _ship_query_payload(
        queries.sparkSession.sparkContext,
        (q_ids, q_mat, q_sq),
        q_ids.nbytes + q_mat.nbytes + q_sq.nbytes,
    )

    def score_batches(batches):
        q_ids, q_mat, q_sq = payload if bc is None else bc.value
        for pdf in batches:
            c_mat = np.array(list(pdf["xq"]), dtype=np.int64)
            c_ids = pdf["vec_id"].to_numpy()
            if len(c_ids) == 0:
                continue
            c_sq = (c_mat * c_mat).sum(axis=1)
            d2 = q_sq[None, :] + c_sq[:, None] - 2 * (c_mat @ q_mat.T)
            n_c, n_q = d2.shape
            kk = min(k + 1, n_c)
            out_q, out_v, out_d = [], [], []
            for j in range(n_q):
                top = np.lexsort((c_ids, d2[:, j]))[:kk]
                out_q.append(np.full(kk, q_ids[j]))
                out_v.append(c_ids[top])
                out_d.append(d2[top, j])
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "d2": np.concatenate(out_d),
                }
            )

    scored = (
        spread(corpus)
        .select("vec_id", "xq")
        .mapInPandas(score_batches, "q_id long, vec_id long, d2 long")
        .filter(F.col("q_id") != F.col("vec_id"))
    )
    w = Window.partitionBy("q_id").orderBy("d2", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id")
    )


def centroid_frame(corpus: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Deterministic coarse-quantizer codebook: the n lowest vec_ids stand
    in for trained k-means centroids (engine-portable; a real deployment
    would plug trained centroids in the same shape)."""
    return corpus.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_vec")
    )


def quantize_vec(col: Column, scale: int = 1000) -> Column:
    """Engine-exact integer quantization: floor(x * scale + 0.5) as long,
    computed in float64 (float32 -> double promotion is exact, and both
    Spark and DuckDB then run the identical IEEE multiply/add/floor).
    Quantized vectors make every k-means distance and centroid update
    pure integer arithmetic — bit-equal across engines by construction,
    which is what lets an ITERATIVE training loop carry an exact SQL
    oracle (float means would diverge in the last ulp per sum order)."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    )


def _dist2_q(a: Column, b: Column) -> Column:
    """Exact squared-L2 distance between two long-array vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two long-array vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def semantic_dedup_quantized(
    assigned: DataFrame, t_num: int = 9025, t_den: int = 10000
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    within each k-means cell, a vector is a DUPLICATE of the
    lowest-id earlier member whose cosine similarity clears the
    threshold; cluster structure bounds the quadratic — pairs are only
    ever formed INSIDE a cell, never across the corpus.

    Input: (vec_id, xq array<long>, cell) — integer-quantized vectors
    with their cell assignment (assign_cells_quantized).  The cosine
    test is pure integer arithmetic, cos(a,b) >= sqrt(t_num/t_den)
    rewritten square-free as

        dot(a,b) > 0  AND  dot(a,b)^2 * t_den >= t_num * |a|^2 * |b|^2

    — exact in int64 for unit-norm embeddings at scale 1000 (|dot| <=
    1e6, so dot^2 * t_den <= 1e16; both engines reproduce it bit-equal,
    which gives this pipeline an exact SQL oracle).  Defaults encode
    cos >= 0.95 (0.95^2 = 9025/10000).

    Shape: one shuffle to the cell, members collected in-row (bounded
    by cell size — the SemDeDup contract: k scales with corpus size so
    cells stay small), pair scan via slice/filter over the sorted member
    list — the lsh_candidate_pairs discipline, no self-join."""
    with_norm = assigned.select(
        "cell",
        F.struct(
            "vec_id", "xq", dot_q(F.col("xq"), F.col("xq")).alias("n2")
        ).alias("m"),
    )
    cells = with_norm.groupBy("cell").agg(
        F.array_sort(F.collect_list("m")).alias("ds")
    )
    ds = F.col("ds")

    def dup_of(m, i):
        scored = F.transform(
            F.slice(ds, 1, i),
            lambda a: F.struct(
                a["vec_id"].alias("vec_id"),
                dot_q(a["xq"], m["xq"]).alias("dab"),
                a["n2"].alias("n2"),
            ),
        )
        ok = F.filter(
            scored,
            lambda s: (s["dab"] > 0)
            & (s["dab"] * s["dab"] * F.lit(t_den) >= F.lit(t_num) * s["n2"] * m["n2"]),
        )
        return F.array_min(F.transform(ok, lambda s: s["vec_id"]))

    decided = F.transform(
        ds,
        lambda m, i: F.struct(m["vec_id"].alias("vec_id"), dup_of(m, i).alias("dup_of")),
    )
    return (
        cells.select("cell", F.explode(decided).alias("d"))
        .select(
            F.col("d.vec_id").alias("vec_id"),
            "cell",
            F.when(F.col("d.dup_of").isNull(), F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("decision"),
            F.col("d.dup_of").alias("dup_of"),
        )
    )


def assign_cells_quantized_np(q: DataFrame, cids, mat) -> DataFrame:
    """GEMM twin of assign_cells_quantized against a DRIVER-RESIDENT
    codebook (numpy int64 (k,) cids + (k, dim) mat — small by contract,
    like the ANN query matrix): one mapInPandas computes squared-L2 to
    every centroid per Arrow batch via |x|^2 - 2 x.C^T + |c|^2 — exact
    int64, bit-identical to the expression-tree argmin (ties to the
    lowest cid because `cids` is sorted and argmin takes the first
    minimum).  Assignment rides the scan: zero exchange."""
    import numpy as np
    import pandas as pd

    order = np.argsort(cids)
    cids_s = np.asarray(cids)[order]
    mat_s = np.asarray(mat)[order]
    c_n2 = (mat_s * mat_s).sum(axis=1)

    def per_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["xq"].to_numpy()).astype(np.int64)
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2 * (X @ mat_s.T)
                + c_n2[None, :]
            )
            best = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "xq": pdf["xq"],
                    "cell": cids_s[best].astype("int32"),
                    "d2": d2[np.arange(len(X)), best],
                }
            )

    return q.mapInPandas(
        per_batch, "vec_id long, xq array<long>, cell int, d2 long"
    )


def auto_k(n: int, target_cell: int = 128, k_min: int = 8) -> int:
    """SemDeDup cell-count contract, enforced by code instead of by the
    deployment knob alone: k grows with the corpus (k = ceil(n /
    target_cell), floor k_min) so mean cell size stays bounded and the
    per-cell quadratic pair scan never grows with corpus scale.  The
    round-6 slope probe measured exactly the failure this prevents —
    k pinned at 8 gave 7.5k-member cells and slope 0.20 at 30x; k
    scaling gave 1.79 (DESIGN.md)."""
    return max(k_min, -(-n // target_cell))


def kmeans_fit_quantized_np(
    corpus_q: DataFrame, k: int = 8, iters: int = 2
):
    """Driver-resident-codebook Lloyd over a pre-quantized (vec_id, xq)
    frame — the SAME exact-integer math as kmeans_fit_quantized (same
    init, same floor-mean, same tie rule, so the same SQL oracle holds)
    but each iteration materializes the k x dim codebook to the driver
    (k*dim longs — trivially small), which (a) replaces the interpreted
    per-row HOF argmin with one int64 GEMM per Arrow batch and (b) stops
    downstream actions from re-executing the whole training lineage.
    Per iteration: GEMM assignment (rides the scan) -> per-(cell, pos)
    partial-sum shuffle of k x dim rows -> exact floor-mean on the
    driver (Python // floors).  Returns (cids, mat) numpy arrays."""
    import numpy as np

    init = corpus_q.orderBy("vec_id").limit(k).collect()
    cids = np.array([int(r.vec_id) for r in init], dtype=np.int64)
    mat = np.stack([np.array(r.xq, dtype=np.int64) for r in init])
    for _ in range(iters):
        assigned = assign_cells_quantized_np(corpus_q, cids, mat)
        sums = (
            assigned.select("cell", F.posexplode("xq").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cell.setdefault(int(r.cell), {})[int(r.pos)] = (int(r.s), int(r.n))
        cids = np.array(sorted(by_cell), dtype=np.int64)
        mat = np.stack(
            [
                np.array(
                    [by_cell[c][p][0] // by_cell[c][p][1] for p in sorted(by_cell[c])],
                    dtype=np.int64,
                )
                for c in cids
            ]
        )
    return cids, mat


def semantic_dedup_quantized_fast(
    assigned: DataFrame, t_num: int = 9025, t_den: int = 10000
) -> DataFrame:
    """GEMM twin of `semantic_dedup_quantized` — bit-identical output
    (numpy int64 matmul is EXACT integer arithmetic, so the same SQL
    oracle holds), ~5x faster: one applyInPandas per cell computes the
    cell's Gram matrix with a single int64 matmul instead of per-pair
    interpreted array folds.  Same overflow envelope as the declarative
    form (|dot| <= 1e6 for unit embeddings at scale 1000: dot^2 * t_den
    <= 1e16 < 2^63); the declarative twin stays as the cross-check
    (tests assert equality on random frames)."""
    import numpy as np
    import pandas as pd

    def per_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = len(pdf)
        if m == 0:
            return pdf.assign(decision=[], dup_of=[])[
                ["vec_id", "cell", "decision", "dup_of"]
            ]
        X = np.stack(pdf["xq"].to_numpy()).astype(np.int64)
        n2 = (X * X).sum(axis=1)
        idx = np.arange(m)
        has = np.zeros(m, dtype=bool)
        first = np.zeros(m, dtype=np.int64)
        # BLOCKED Gram: a skewed cell must not allocate an m x m int64
        # matrix (m=7.5k would be 450 MB); bound the live block to ~8M
        # entries (64 MB) and sweep column blocks
        blk = max(1, min(4096, 8_000_000 // m))
        for j0 in range(0, m, blk):
            j1 = min(j0 + blk, m)
            G = X @ X[j0:j1].T  # (m, b)
            ok = (G > 0) & (
                G * G * np.int64(t_den)
                >= np.int64(t_num) * n2[:, None] * n2[j0:j1][None, :]
            )
            mask = ok & (idx[:, None] < idx[j0:j1][None, :])  # strict i < j
            hb = mask.any(axis=0)
            has[j0:j1] = hb
            first[j0:j1] = mask.argmax(axis=0)
        vec_ids = pdf["vec_id"].to_numpy()
        # nullable Int64, not float64+NaN: a float round-trip silently
        # corrupts vec_id > 2^53, diverging from the declarative twin
        dup_of = pd.array(vec_ids[first], dtype="Int64")
        dup_of[~has] = pd.NA
        return pd.DataFrame(
            {
                "vec_id": vec_ids,
                "cell": pdf["cell"],
                "decision": np.where(has, "drop", "keep"),
                "dup_of": dup_of,
            }
        )

    return assigned.select("vec_id", "xq", "cell").groupBy("cell").applyInPandas(
        per_cell, "vec_id long, cell int, decision string, dup_of long"
    )


def assign_cells_quantized(q: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest-centroid assignment over quantized vectors: broadcast the
    whole codebook as one array row, argmin squared-L2 IN-ROW via
    array_min over (d2, cid) structs — ties to the lowest cid.  Zero
    exchange beyond the codebook broadcast; at 100 TB assignment rides
    the scan stage, exactly like `assign_cells`."""
    cb = codebook.agg(
        F.sort_array(F.collect_list(F.struct("cid", "c_vec"))).alias("codebook")
    )
    best = F.array_min(
        F.transform(
            F.col("codebook"),
            lambda c: F.struct(
                _dist2_q(F.col("xq"), c["c_vec"]).alias("d2"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return (
        q.crossJoin(F.broadcast(cb))
        .withColumn("_best", best)
        .select(
            "vec_id", "xq", F.col("_best.cid").alias("cell"), F.col("_best.d2").alias("d2")
        )
    )


def kmeans_fit_quantized(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    scale: int = 1000,
    quantized: bool = False,
) -> DataFrame:
    """REAL distributed k-means (Lloyd) over quantized vectors — the
    trained replacement for `centroid_frame`'s take-first-k stand-in.

    Init: the k lowest vec_ids (deterministic).  Each iteration is the
    canonical scalable shape: broadcast codebook -> in-row assignment ->
    posexplode by component -> partial-aggregating (cell, pos) sum (the
    ONE shuffle per iteration, output k x dim rows) -> floor-mean
    centroids reassembled in order.  The floor-mean uses
    `(s - ((s % n) + n) % n) DIV n` — floored integer division written
    so Spark's truncating `%`/`DIV` and DuckDB's produce identical
    results for negative sums; the numerator is exactly divisible, so
    the division itself is exact in both engines.

    Returns a (cid int, c_vec array<long>) codebook frame.

    `quantized=True` skips quantization — `corpus` already carries an
    integer `xq` column (e.g. a synthesized/augmented vector set)."""
    if quantized:
        q = corpus.select("vec_id", "xq")
    else:
        q = corpus.select("vec_id", quantize_vec(F.col(vec_col), scale).alias("xq"))
    # init = the k LOWEST vec_ids by rank (TakeOrderedAndProject — a
    # bounded top-k, not a global sort), so sparse or offset id spaces
    # still seed a full codebook; on the dense fixture this is exactly
    # `vec_id < k`, which is what the SQL oracle encodes
    codebook = (
        q.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").cast("int").alias("cid"), F.col("xq").alias("c_vec"))
    )
    for _ in range(iters):
        assigned = assign_cells_quantized(q, codebook)
        sums = (
            assigned.select("cell", F.posexplode("xq").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        )
        comp = sums.select(
            "cell", "pos", F.expr("(s - (((s % n) + n) % n)) DIV n").alias("c")
        )
        codebook = (
            comp.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select(
                F.col("cell").alias("cid"),
                F.transform("pc", lambda e: e["c"]).alias("c_vec"),
            )
        )
    return codebook


def _centroid_array(centroids: DataFrame) -> DataFrame:
    """One row holding the whole codebook as array<struct(cid, c_vec)> —
    broadcast-crossed into the corpus so cell assignment is a NARROW
    in-row argmax (no explode, no per-vector shuffle)."""
    return centroids.agg(
        F.sort_array(F.collect_list(F.struct("cid", "c_vec"))).alias("codebook")
    )


def assign_cells(vecs: DataFrame, centroids: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine, ties to the lowest
    cid.  argmax via array_max over (sim, -cid) structs — entirely in-row,
    so at 100 TB assignment runs inside the scan stage; the only exchange
    is the tiny codebook broadcast."""
    scored = vecs.crossJoin(F.broadcast(_centroid_array(centroids)))
    sims = F.transform(
        F.col("codebook"),
        lambda c: F.struct(
            cosine(as_double_vec(F.col(vec_col)), as_double_vec(c["c_vec"])).alias("sim"),
            (-c["cid"]).alias("neg_cid"),
        ),
    )
    return scored.withColumn("cell", -F.array_max(sims)["neg_cid"]).drop("codebook")


def assign_probe_cells(
    vecs: DataFrame, centroids: DataFrame, vec_col: str, nprobe: int
) -> DataFrame:
    """Multi-probe cell assignment for the QUERY side: each query expands
    to its `nprobe` nearest centroids (sim desc, cid asc tie-break — the
    same order as assign_cells' argmax).  The explode multiplies only the
    tiny query set; the corpus keeps its single home cell."""
    scored = vecs.crossJoin(F.broadcast(_centroid_array(centroids)))
    sims = F.transform(
        F.col("codebook"),
        lambda c: F.struct(
            cosine(as_double_vec(F.col(vec_col)), as_double_vec(c["c_vec"])).alias("sim"),
            (-c["cid"]).alias("neg_cid"),
        ),
    )
    top = F.slice(F.reverse(F.array_sort(sims)), 1, nprobe)
    return (
        scored.withColumn("probe", F.explode(top))
        .withColumn("cell", -F.col("probe.neg_cid"))
        .drop("codebook", "probe")
    )


def dequantize_codebook(codebook: DataFrame, scale: int = 1000) -> DataFrame:
    """(cid, c_vec long array) from `kmeans_fit_quantized` -> the
    (cid, c_vec float array) shape `assign_cells` consumes, so a TRAINED
    codebook can drive the IVF search path in place of the take-first-k
    stand-in."""
    return codebook.select(
        "cid",
        F.transform("c_vec", lambda v: (v.cast("double") / float(scale)).cast("float")).alias(
            "c_vec"
        ),
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_centroids: int = 16,
    nprobe: int = 1, centroids: DataFrame | None = None,
) -> DataFrame:
    """X3 scale path #2: IVF (inverted-file) ANN — corpus partitioned into
    coarse cells, each query searched against its `nprobe` nearest cells.
    The cell equi-join replaces the cross join exactly like lsh_topk, but
    with a data-adaptive partition (codebook) instead of fixed sign bits;
    raising nprobe buys recall for a proportional slice of the corpus
    scanned per query (the standard IVF knob).  Recall < 1 by
    construction; brute_force_topk is the baseline.  Pass `centroids`
    (e.g. dequantize_codebook(kmeans_fit_quantized(...))) to search with
    a trained codebook instead of the take-first-k default."""
    cents = centroids if centroids is not None else centroid_frame(corpus, n_centroids)
    cb = assign_cells(spread(corpus), cents, "embedding")
    qb = assign_probe_cells(queries, cents, "q_vec", nprobe)
    scored = cb.join(F.broadcast(qb), "cell").filter(
        F.col("q_id") != F.col("vec_id")
    ).select(
        "q_id",
        "vec_id",
        cosine(as_double_vec(F.col("q_vec")), as_double_vec(F.col("embedding"))).alias(
            "sim"
        ),
    )
    return _global_rank(_local_topk(scored, k), k)


def l2sq(a: Column, b: Column) -> Column:
    """Sequential left-fold squared-L2 distance (engine-portable order,
    like `dot`: (0.0 + e1) + e2 + ... is bit-identical to DuckDB's
    list_reduce since 0.0 + e1 == e1)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    corpus: DataFrame, m: int = 4, k_sub: int = 16, dim: int = 64
) -> DataFrame:
    """X3 scale path #3 support: product-quantization codebook — one row
    holding array<struct(sub, cid, c_sub)>: for each of `m` subspaces of
    width dim/m, `k_sub` sub-centroids taken from the lowest vec_ids
    (deterministic stand-in for trained k-means, same shape a real
    deployment would plug in; cf. centroid_frame)."""
    w = dim // m
    cents = corpus.filter(F.col("vec_id") < k_sub)
    entries = cents.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.col("vec_id").alias("cid"),
                        F.slice(as_double_vec(F.col("embedding")), s * w + 1, w).alias(
                            "c_sub"
                        ),
                    )
                    for s in range(m)
                ]
            )
        ).alias("e")
    )
    return entries.agg(F.sort_array(F.collect_list("e")).alias("cb"))


def pq_encode(
    vecs: DataFrame, codebook: DataFrame, vec_col: str = "embedding",
    m: int = 4, dim: int = 64,
) -> DataFrame:
    """PQ encoding, entirely IN-ROW after the tiny codebook broadcast: per
    subspace, argmin squared-L2 sub-centroid (ties to the lowest cid via
    lexicographic struct array_min) — yielding the m-byte code AND the
    reconstruction (concatenated chosen sub-centroids).  At 100 TB this
    is the compression pass that shrinks an f32[dim] corpus to m bytes
    per vector; it runs inside the scan stage, no exchange."""
    w = dim // m
    v = vecs.crossJoin(F.broadcast(codebook))

    def best_sub(s: int) -> Column:
        sub = F.slice(as_double_vec(F.col(vec_col)), s * w + 1, w)
        cands = F.filter(F.col("cb"), lambda e: e["sub"] == F.lit(s))
        scored = F.transform(
            cands,
            lambda e: F.struct(
                l2sq(sub, e["c_sub"]).alias("d"),
                e["cid"].alias("cid"),
                e["c_sub"].alias("c_sub"),
            ),
        )
        return F.array_min(scored)

    best = F.array(*[best_sub(s) for s in range(m)])
    return v.select(
        *vecs.columns,
        F.transform(best, lambda b: b["cid"]).alias("codes"),
        F.flatten(F.transform(best, lambda b: b["c_sub"])).alias("recon"),
    )


def pq_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    m: int = 4, k_sub: int = 16, dim: int = 64,
) -> DataFrame:
    """X3 scale path #3: PQ/ADC approximate top-k — corpus vectors
    compressed to m sub-centroid codes, queries scored against the
    RECONSTRUCTIONS by squared L2 (asymmetric distance computation).
    Recall < 1 by construction (quantization error); brute_force_topk is
    the exactness baseline.  Plan shape: broadcast codebook -> in-row
    encode -> broadcast queries -> per-partition pre-top-k -> global
    rank; the only exchanges are the two tiny broadcasts and the
    bounded rank exchange."""
    enc = pq_encode(spread(corpus), pq_codebook(corpus, m, k_sub, dim), "embedding", m, dim)
    scored = (
        enc.join(F.broadcast(queries), F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            # negate: ADC ranks ASCENDING, the shared rank helpers order
            # sim DESCENDING; the sign flip is exact
            (-l2sq(as_double_vec(F.col("q_vec")), F.col("recon"))).alias("sim"),
        )
    )
    ranked = _global_rank(_local_topk(scored, k), k)
    return ranked.select("q_id", "vec_id", "rank", (-F.col("sim")).alias("adc"))


def ivfpq_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    n_centroids: int = 16, nprobe: int = 2,
    m: int = 4, k_sub: int = 16, dim: int = 64,
) -> DataFrame:
    """X3 flagship composition: IVF + PQ — the standard billion-vector
    ANN architecture (coarse cells restrict the candidate set, PQ codes
    compress it, ADC scores it).  The cell equi-join bounds work per
    query to nprobe cells; every vector in them is scored against its
    RECONSTRUCTION, never its raw floats — at 100 TB the scan reads m
    code bytes + the broadcast codebook instead of the f32[dim] column.
    Recall < 1 twice over (cell misses + quantization error);
    brute_force_topk is the baseline."""
    cents = centroid_frame(corpus, n_centroids)
    cells = assign_cells(spread(corpus), cents, "embedding")
    enc = pq_encode(cells, pq_codebook(corpus, m, k_sub, dim), "embedding", m, dim)
    qb = assign_probe_cells(queries, cents, "q_vec", nprobe)
    scored = (
        enc.join(F.broadcast(qb), "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            (-l2sq(as_double_vec(F.col("q_vec")), F.col("recon"))).alias("sim"),
        )
    )
    ranked = _global_rank(_local_topk(scored, k), k)
    return ranked.select("q_id", "vec_id", "rank", (-F.col("sim")).alias("adc"))


def sq8_stats(corpus: DataFrame) -> DataFrame:
    """SQ8 training: per-dimension [min, max] over the scale-1000
    integer-quantized corpus, folded into ONE row of two pos-ordered
    arrays (mn_arr, mx_arr).  Plan shape: posexplode -> 64-row partial
    agg -> 1-row array fold; the result is broadcast, so SQ8 'training'
    costs one corpus scan and moves 64 rows."""
    q = corpus.select(quantize_vec(F.col("embedding")).alias("xq"))
    dims = (
        q.select(F.posexplode("xq").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    )
    return dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s["mn"]
        ).alias("mn_arr"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))), lambda s: s["mx"]
        ).alias("mx_arr"),
    )


_SQ8_RECON = """
    zip_with(xq, arrays_zip(mn_arr, mx_arr), (v, s) ->
      CASE WHEN s.mx_arr > s.mn_arr
           THEN s.mn_arr
                + (((v - s.mn_arr) * 255 div (s.mx_arr - s.mn_arr))
                   * (s.mx_arr - s.mn_arr)) div 255
           ELSE s.mn_arr END)
"""


def sq8_topk(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """X3 scale path: SCALAR (int8) quantization ANN — the 4x-memory
    compression every billion-vector deployment reaches for before PQ
    (FAISS SQ8 / Milvus IVF_SQ8; public method).  Each dimension is
    affine-coded to an 8-bit level against the corpus per-dim [min,max],
    queries score by asymmetric squared-L2 against the RECONSTRUCTIONS
    (exact query vs quantized corpus).  All arithmetic is INTEGER on the
    scale-1000 quantized domain — code = (v-mn)*255 div (mx-mn), recon =
    mn + (code*(mx-mn)) div 255, d2 = Σ (q-recon)² — so Spark and DuckDB
    agree bit-for-bit and the ANN path carries an exact oracle (the same
    discipline as kmeans_fit_quantized).  Recall < 1 by construction;
    brute_force_topk is the exactness baseline.

    Plan shape: one corpus scan trains the 1-row stats frame; encode is
    an IN-ROW zip_with under a broadcast of that row (no corpus explode,
    no shuffle); scoring broadcasts the query set; the only exchange is
    the bounded per-q_id rank (≤ k x n_partitions rows via _local_topk)."""
    stats = sq8_stats(corpus)
    enc = (
        spread(corpus)
        .select("vec_id", quantize_vec(F.col("embedding")).alias("xq"))
        .crossJoin(F.broadcast(stats))
        .select("vec_id", F.expr(_SQ8_RECON).alias("recon"))
    )
    qe = queries.select("q_id", quantize_vec(F.col("q_vec")).alias("q_xq"))
    scored = enc.join(F.broadcast(qe), F.col("q_id") != F.col("vec_id")).select(
        "q_id",
        "vec_id",
        # negate: d2 ranks ASCENDING, the shared helpers order sim
        # DESCENDING; exact on integers
        (
            -F.aggregate(
                F.zip_with(
                    F.col("q_xq"), F.col("recon"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        ).alias("sim"),
    )
    ranked = _global_rank(_local_topk(scored, k), k)
    return ranked.select("q_id", "vec_id", "rank", (-F.col("sim")).alias("d2"))


def _int_l2(a: Column, b: Column) -> Column:
    """Integer squared-L2 fold over two long arrays (engine-exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


_BQ_LO = """
    aggregate(sequence(0, 31), 0L, (acc, i) ->
      acc + IF(xq[i] > mean_arr[i], shiftleft(1L, i), 0L))
"""
_BQ_HI = """
    aggregate(sequence(32, 63), 0L, (acc, i) ->
      acc + IF(xq[i] > mean_arr[i], shiftleft(1L, i - 32), 0L))
"""


def bq_mean_stats(corpus: DataFrame) -> DataFrame:
    """BQ training: per-dimension FLOOR-MEAN of the scale-1000 quantized
    corpus, folded into one pos-ordered array row.  The floor division
    uses the exact-divisibility trick ((s - pmod(s, n)) div n) so Spark's
    truncating `div` and DuckDB's flooring `//` agree on negatives — the
    kmeans_fit_quantized centroid discipline."""
    q = corpus.select(quantize_vec(F.col("embedding")).alias("xq"))
    dims = (
        q.select(F.posexplode("xq").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .select(
            "pos",
            F.expr("(s - (((s % n) + n) % n)) div n").alias("mean"),
        )
    )
    return dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean"))),
            lambda r: r["mean"],
        ).alias("mean_arr")
    )


def bq_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, rerank: int = 64
) -> DataFrame:
    """X3 scale path: BINARY (1-bit) quantization ANN — the most
    aggressive tier of the quantization ladder (BQ below SQ8 below PQ;
    public method: sign-of-centered-component codes + Hamming-distance
    prescreen + exact rescore, the shape Milvus BINARY / pgvector bit()
    / every 32x-compression deployment runs).  Each of the 64 dims
    contributes sign(x_d > mean_d) to a 64-bit signature packed into
    TWO longs (bits 0-31 / 32-63 — bit 63 of one long would collide
    with the sign bit under summed packing); stage 1 ranks by
    bit_count(xor) Hamming distance and keeps `rerank` candidates per
    query, stage 2 rescores them with the exact full-precision integer
    squared-L2.  At 100 TB the stage-1 scan reads 16 signature bytes
    per vector instead of 256 float bytes — a 16x scan-byte cut before
    any exact work.  All arithmetic integer -> exact DuckDB oracle.

    Plan shape: one corpus scan trains the 1-row mean frame (64-row
    partial agg -> array fold, broadcast); signatures are IN-ROW folds;
    stage 1 is the broadcast-queries scan with the bounded _local_topk
    rank exchange; stage 2 broadcasts the candidate list back — no new
    shuffle shape."""
    stats = bq_mean_stats(corpus)
    enc = (
        spread(corpus)
        .select("vec_id", quantize_vec(F.col("embedding")).alias("xq"))
        .crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            "xq",
            F.expr(_BQ_LO).alias("lo"),
            F.expr(_BQ_HI).alias("hi"),
        )
    )
    qe = (
        queries.select("q_id", quantize_vec(F.col("q_vec")).alias("xq"))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("q_id"),
            F.col("xq").alias("q_xq"),
            F.expr(_BQ_LO).alias("qlo"),
            F.expr(_BQ_HI).alias("qhi"),
        )
    )
    scored1 = enc.join(
        F.broadcast(qe.select("q_id", "qlo", "qhi")),
        F.col("q_id") != F.col("vec_id"),
    ).select(
        "q_id",
        "vec_id",
        (
            -(
                F.bit_count(F.expr("lo ^ qlo"))
                + F.bit_count(F.expr("hi ^ qhi"))
            ).cast("long")
        ).alias("sim"),
    )
    cand = _global_rank(_local_topk(scored1, rerank), rerank).select(
        "q_id", "vec_id"
    )
    rescored = (
        enc.select("vec_id", "xq")
        .join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qe.select("q_id", "q_xq")), "q_id")
        .select(
            "q_id",
            "vec_id",
            (-_int_l2(F.col("q_xq"), F.col("xq"))).alias("sim"),
        )
    )
    ranked = _global_rank(rescored, k)
    return ranked.select("q_id", "vec_id", "rank", (-F.col("sim")).alias("d2"))


def mrl_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    prefix_dim: int = 16, rerank: int = 32,
) -> DataFrame:
    """X3 scale path: MATRYOSHKA two-stage retrieval (public method,
    Kusupati et al. 2022 — MRL embeddings order information by prefix,
    so a dim-prefix distance is a cheap first-pass filter).  Stage 1
    ranks every corpus vector by integer squared-L2 on the first
    `prefix_dim` quantized dims and keeps `rerank` candidates per query
    (1/4 of the scan arithmetic and, at 100 TB with stored prefix
    columns, 1/4 of the bytes); stage 2 rescores ONLY those candidates
    with the exact full-dim integer distance and emits top-k.  All
    integer on the scale-1000 domain -> exact DuckDB oracle for the
    whole funnel.  Recall < 1 only when a true neighbor falls outside
    the stage-1 cut; brute_force_topk is the baseline.

    Plan shape: stage 1 is the broadcast-queries scan with the bounded
    _local_topk rank exchange; stage 2 broadcasts the (n_queries x
    rerank) candidate list back against the corpus — two tiny
    broadcasts, no new shuffle shape."""
    qe = queries.select("q_id", quantize_vec(F.col("q_vec")).alias("q_xq"))
    ce = spread(corpus).select(
        "vec_id", quantize_vec(F.col("embedding")).alias("xq")
    )
    scored1 = ce.join(F.broadcast(qe), F.col("q_id") != F.col("vec_id")).select(
        "q_id",
        "vec_id",
        (
            -_int_l2(
                F.slice(F.col("q_xq"), 1, prefix_dim),
                F.slice(F.col("xq"), 1, prefix_dim),
            )
        ).alias("sim"),
    )
    cand = _global_rank(_local_topk(scored1, rerank), rerank).select(
        "q_id", "vec_id"
    )
    rescored = (
        ce.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qe), "q_id")
        .select(
            "q_id",
            "vec_id",
            (-_int_l2(F.col("q_xq"), F.col("xq"))).alias("sim"),
        )
    )
    ranked = _global_rank(rescored, k)
    return ranked.select("q_id", "vec_id", "rank", (-F.col("sim")).alias("d2"))


def chunk_pool_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    chunks_per_doc: int = 8, doc_k: int = 4,
) -> DataFrame:
    """X3 scale path: LONG-DOCUMENT retrieval via POOLED chunk
    embeddings (public method — passage pooling: long docs are embedded
    as many chunks; a per-doc mean-pooled vector gives a cheap coarse
    index, and only the top docs' chunks are scored exactly).  Docs are
    vec_id div chunks_per_doc; the doc vector is the per-dimension
    FLOOR-MEAN of its chunks' scale-1000 integer embeddings (the
    kmeans_fit_quantized centroid idiom, exact in both engines); stage 1
    ranks docs per query by integer squared-L2 against the pooled
    vectors (1/chunks_per_doc of the vectors scanned), stage 2 rescores
    ONLY the top-doc_k docs' chunks exactly and emits the top-k chunks.
    All integer -> exact DuckDB oracle.

    Plan shape: pooling is one (doc) groupBy with an in-row zip_with
    fold over the collected chunk list (bounded by chunks_per_doc);
    stage 1 is the broadcast-queries scan over the doc table; stage 2
    equi-joins the corpus on doc_id against the broadcast (query,
    doc) winner list — candidate work is (queries x doc_k x
    chunks_per_doc), never the corpus."""
    qe = queries.select("q_id", quantize_vec(F.col("q_vec")).alias("q_xq"))
    ce = spread(corpus).select(
        "vec_id",
        (F.col("vec_id") - F.pmod("vec_id", F.lit(chunks_per_doc)))
        .cast("long")
        .alias("doc_id"),
        quantize_vec(F.col("embedding")).alias("xq"),
    )
    docs = (
        ce.groupBy("doc_id")
        .agg(F.collect_list("xq").alias("chunks"), F.count("*").alias("n"))
        .select(
            "doc_id",
            # element-wise sum of the doc's chunk vectors, then the
            # exact floor-mean per dimension (sum - pmod is divisible,
            # so Spark's truncating div == DuckDB's flooring //)
            F.expr(
                """
                transform(
                  aggregate(chunks, transform(sequence(1, 64), i -> 0L),
                            (acc, v) -> zip_with(acc, v, (a, b) -> a + b)),
                  s -> (s - (((s % n) + n) % n)) div n)
                """
            ).alias("doc_vec"),
        )
    )
    scored_docs = docs.crossJoin(F.broadcast(qe)).select(
        "q_id",
        F.col("doc_id").alias("vec_id"),  # rank helpers key on vec_id
        (-_int_l2(F.col("q_xq"), F.col("doc_vec"))).alias("sim"),
    )
    top_docs = _global_rank(_local_topk(scored_docs, doc_k), doc_k).select(
        "q_id", F.col("vec_id").alias("doc_id")
    )
    rescored = (
        ce.join(F.broadcast(top_docs), "doc_id")
        .join(F.broadcast(qe), "q_id")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            (-_int_l2(F.col("q_xq"), F.col("xq"))).alias("sim"),
        )
    )
    ranked = _global_rank(rescored, k)
    return ranked.select("q_id", "vec_id", "rank", (-F.col("sim")).alias("d2"))


def lsh_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_bits: int = 8
) -> DataFrame:
    """ANN top-k restricted to the query's sign bucket: equi-join on the
    bucket key replaces the cross join — the scale path.  Recall < 1 by
    construction; pair with brute_force_topk as the correctness baseline."""
    cb = spread(corpus).withColumn("bucket", sign_bucket(F.col("embedding"), n_bits))
    qb = queries.withColumn("bucket", sign_bucket(F.col("q_vec"), n_bits))
    scored = cb.join(F.broadcast(qb), "bucket").filter(
        F.col("q_id") != F.col("vec_id")
    ).select(
        "q_id",
        "vec_id",
        cosine(as_double_vec(F.col("q_vec")), as_double_vec(F.col("embedding"))).alias(
            "sim"
        ),
    )
    return _global_rank(_local_topk(scored, k), k)


def pq_codebook_quantized(
    corpus_q: DataFrame, m: int = 4, k_sub: int = 16, dim: int = 64
) -> DataFrame:
    """INTEGER PQ codebook (round 13): (sub int, cid int, c_sub
    array<long>) rows — per subspace of width dim/m, the k_sub lowest
    vec_ids' integer slices (the deterministic stand-in pq_codebook
    uses, here over quantized xq so encode/serve/oracle are exact
    integer arithmetic end to end).  m*k_sub rows: parquet-persistable
    as an index artifact and broadcastable whole."""
    w = dim // m
    cents = corpus_q.orderBy("vec_id").limit(k_sub)
    return cents.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.col("vec_id").cast("int").alias("cid"),
                        F.slice(F.col("xq"), s * w + 1, w).alias("c_sub"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("e")
    ).select("e.sub", "e.cid", "e.c_sub")


def _pq_cb_row(codebook_rows: DataFrame) -> DataFrame:
    """The whole integer PQ codebook as one broadcastable array row."""
    return codebook_rows.agg(
        F.sort_array(F.collect_list(F.struct("sub", "cid", "c_sub"))).alias("cb")
    )


def pq_encode_quantized(
    vecs_q: DataFrame, codebook_rows: DataFrame, m: int = 4, dim: int = 64
) -> DataFrame:
    """Integer PQ encode: per subspace, argmin squared-L2 sub-centroid
    (ties to the lowest cid) — adds `codes` (array<int>, one chosen cid
    per subspace).  Entirely in-row after the tiny codebook broadcast:
    at 100 TB the encode rides the scan stage, no exchange, and the
    coded posting is m ints instead of dim."""
    w = dim // m
    v = vecs_q.crossJoin(F.broadcast(_pq_cb_row(codebook_rows)))

    def best(s: int) -> Column:
        sub_slice = F.slice(F.col("xq"), s * w + 1, w)
        cands = F.filter(F.col("cb"), lambda e: e["sub"] == F.lit(s))
        scored = F.transform(
            cands,
            lambda e: F.struct(
                _dist2_q(sub_slice, e["c_sub"]).alias("d"),
                e["cid"].alias("cid"),
            ),
        )
        return F.array_min(scored)["cid"]

    return v.select(
        *vecs_q.columns, F.array(*[best(s) for s in range(m)]).alias("codes")
    )


def pq_reconstruct_quantized(
    coded: DataFrame, codebook_rows: DataFrame
) -> DataFrame:
    """Integer PQ reconstruction from stored codes: adds `recon`
    (array<long>, the concatenated chosen sub-centroids) via an in-row
    codebook lookup — the serve-side half of the persisted PQ index
    (the artifact stores m ints per vector; the broadcast codebook
    re-materializes the dim-long reconstruction inside the scan)."""
    c = coded.crossJoin(F.broadcast(_pq_cb_row(codebook_rows)))
    recon = F.flatten(
        F.transform(
            F.col("codes"),
            lambda cid, s: F.element_at(
                F.filter(
                    F.col("cb"),
                    lambda e: (e["sub"] == s) & (e["cid"] == cid),
                ),
                1,
            )["c_sub"],
        )
    )
    return c.select(*coded.columns, recon.alias("recon"))
