"""Unit tests for the north-star extension operators: dedup planting,
multimodal decode determinism, similarity ranking sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra2aerospike_spark.functions import dedup as D
from cassandra2aerospike_spark.functions import multimodal as M
from cassandra2aerospike_spark.functions import similarity as S


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_clusters(spark):
    d = _docs(
        spark,
        [
            (1, "the same text here"),
            (2, "THE  same   text HERE"),  # normalizes identically
            (3, "different entirely words"),
        ],
    )
    out = {r.rep_doc_id: r.cluster_size for r in D.exact_clusters(d).collect()}
    assert out == {1: 2, 3: 1}


def test_jaccard_pairs_identical_docs(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    d = _docs(spark, [(1, text), (2, text), (3, "totally unrelated words only here")])
    pairs = D.jaccard_pairs(d, k=3, threshold=0.6).collect()
    assert len(pairs) == 1
    assert (pairs[0].doc_a, pairs[0].doc_b, pairs[0].jaccard) == (1, 2, 1.0)


def test_minhash_lsh_finds_identical(spark):
    text = "one two three four five six seven eight nine ten"
    d = _docs(spark, [(1, text), (2, text), (3, "zzz yyy xxx www vvv uuu ttt sss")])
    sigs = D.minhash_signatures(d, n_hashes=16, k=3)
    cand = {(r.doc_a, r.doc_b) for r in D.lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in cand
    assert (1, 3) not in cand and (2, 3) not in cand


def test_simhash_close_for_similar_docs(spark):
    base = "spark merge window batch table column join stream order group"
    d = _docs(spark, [(1, base), (2, base + " extra"), (3, "qq ww ee rr tt yy uu ii oo pp")])
    rows = {r.doc_id: r.simhash for r in D.simhash64(d).collect()}
    ham12 = bin(rows[1] ^ rows[2]).count("1")
    ham13 = bin(rows[1] ^ rows[3]).count("1")
    assert ham12 < ham13


def test_multimodal_decode_deterministic(spark):
    d = _docs(spark, [(1, "hello world payload"), (2, "")])
    binary = M.with_binary_payload(d)
    a = {r.doc_id: (r.width, r.height, r.n_frames, tuple(r.features))
         for r in M.decode_image_stub(binary).collect()}
    b = {r.doc_id: (r.width, r.height, r.n_frames, tuple(r.features))
         for r in M.decode_image_stub(binary).collect()}
    assert a == b
    assert a[2] == (0, 0, 0, ())  # empty payload handled


def test_brute_force_topk_self_similarity(spark):
    import math

    rows = [(i, [float((i + 1) * (d + 1) % 7 - 3) for d in range(8)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = S.brute_force_topk(q, emb, k=3).collect()
    assert len(out) == 3
    assert [r.rank for r in out] == [1, 2, 3]
    assert all(not math.isnan(r.sim) for r in out)
    # vec 7 and 14 have identical direction to vec 0 (multiples mod 7)
    sims = {r.vec_id: r.sim for r in out}
    top = max(sims.values())
    assert abs(top - 1.0) < 1e-9


def test_local_topk_null_sim_composition(spark):
    """_local_topk ∘ _global_rank must equal ONE global window even when
    sims are NULL — zero vectors (÷0 → NULL), NULL embeddings, and ragged
    vectors (zip_with pads with NULL → NULL fold) all hit the nulls-last
    branch of `sim.desc(), vec_id`; both windows share that exact order
    expression, and this pins the composition (VERDICT r4 wart 2)."""
    rows = []
    for i in range(12):  # well-formed vectors
        rows.append((i, [float((i + 1) * (d + 2) % 5 - 2) for d in range(4)]))
    for i in range(12, 20):  # zero vectors: norm 0 -> sim NULL
        rows.append((i, [0.0, 0.0, 0.0, 0.0]))
    for i in range(20, 26):  # NULL embeddings
        rows.append((i, None))
    for i in range(26, 32):  # ragged (short) vectors -> NULL fold
        rows.append((i, [1.0, 2.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(100, [1.0, -1.0, 2.0, 0.5]), (200, [0.0, 0.0, 0.0, 0.0])],
        "q_id long, q_vec array<double>",
    )
    scored = (
        emb.repartition(8)  # multiple input partitions: local pass is real
        .join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            S.cosine(
                S.as_double_vec(F.col("q_vec")), S.as_double_vec(F.col("embedding"))
            ).alias("sim"),
        )
    )
    # k > count of non-NULL sims per query forces NULL-sim rows INTO the
    # top-k, where a nulls-first/last divergence between the two windows
    # would change the picked vec_ids, not just the order
    k = 15
    composed = S._global_rank(S._local_topk(scored, k), k).collect()
    direct = S._global_rank(scored, k).collect()
    as_tuples = lambda rs: [(r.q_id, r.vec_id, r.rank, r.sim) for r in rs]
    assert as_tuples(composed) == as_tuples(direct)
    # and the NULL rows really are present + last, deterministic by vec_id
    per_q = {}
    for r in direct:
        per_q.setdefault(r.q_id, []).append(r)
    for q_id, rs in per_q.items():
        sims = [r.sim for r in rs]
        first_null = next((i for i, s in enumerate(sims) if s is None), len(sims))
        assert all(s is None for s in sims[first_null:])
        assert first_null < len(sims)  # NULLs did enter the k window
        null_ids = [r.vec_id for r in rs[first_null:]]
        assert null_ids == sorted(null_ids)


def test_resize_stub_deterministic_and_sized(spark):
    d = M.with_binary_payload(_docs(spark, [(1, "hello world " * 40), (2, "x")]))
    out = {r.doc_id: r for r in M.resize_stub(d, dst_w=8, dst_h=4).collect()}
    assert len(out[1].thumb) == 32 and len(out[2].thumb) == 32
    again = {r.doc_id: r for r in M.resize_stub(d, dst_w=8, dst_h=4).collect()}
    assert out[1].thumb == again[1].thumb
    assert out[1].scale_x == 8 / out[1].src_w


def test_frame_sample_stub_cardinality(spark):
    import hashlib

    d = M.with_binary_payload(_docs(spark, [(7, "a" * 5000), (8, "b")]))
    rows = M.frame_sample_stub(d, every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 5000 bytes -> 4 frames -> sampled 0, 2 ; 1 byte -> 1 frame -> 0
    assert sorted(r.frame_idx for r in by_doc[7]) == [0, 2]
    assert [r.frame_idx for r in by_doc[8]] == [0]
    assert by_doc[8][0].frame_md5 == hashlib.md5(b"8:0").hexdigest()


def test_fast_topk_matches_exact_ranking(spark, sf_dir):
    """The GEMM fast path must produce the same neighbor SETS as the
    oracle-exact fold baseline (sims differ only by float summation
    order, far below the fixture's ranking gaps)."""
    from cassandra2aerospike_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = S.brute_force_topk(q, emb, k=5).collect()
    fast = S.brute_force_topk_fast(q, emb, k=5).collect()
    ex = {(r.q_id, r.vec_id) for r in exact}
    fs = {(r.q_id, r.vec_id) for r in fast}
    assert ex == fs
    sims_ex = {(r.q_id, r.vec_id): r.sim for r in exact}
    for r in fast:
        assert abs(sims_ex[(r.q_id, r.vec_id)] - r.sim) < 1e-9


def test_ivf_nprobe_improves_recall(spark, sf_dir):
    """nprobe=2 must recall at least as many true (brute-force) neighbors
    as nprobe=1, and strictly dominate whenever a query's true neighbor
    lives in its second-nearest cell (the knob's whole point)."""
    from cassandra2aerospike_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = {(r.q_id, r.vec_id) for r in S.brute_force_topk(q, emb, k=5).collect()}
    p1 = {(r.q_id, r.vec_id)
          for r in S.ivf_topk(q, emb, k=5, n_centroids=16, nprobe=1).collect()}
    p2 = {(r.q_id, r.vec_id)
          for r in S.ivf_topk(q, emb, k=5, n_centroids=16, nprobe=2).collect()}
    r1, r2 = len(p1 & truth), len(p2 & truth)
    assert r2 >= r1, (r1, r2)


def test_connected_components_small_graph(spark):
    # two components {1,2,3,9} (chain + shortcut) and {5,6}; singleton 7-8 pair absent
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (1, 9), (5, 6)], "doc_a long, doc_b long"
    )
    got = {r.node: r.component for r in D.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_jaccard_df_cap_costs_no_recall_at_fixture_scale(spark, sf_dir):
    """Contract check for the df_cap skew guard (the oracle mirrors the
    cap, so recall loss would be invisible to the correctness gate): at
    sf0.001/sf0.01 the capped (df_cap=64) candidate generation must find
    EXACTLY the pairs the uncapped generation finds at threshold 0.6 —
    i.e. no qualifying pair consists solely of stop-shingles here.  If a
    future corpus breaks this, the failure is loud instead of silent."""
    from cassandra2aerospike_spark.functions import dedup as D
    from cassandra2aerospike_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    capped = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in D.jaccard_pairs(docs, k=3, threshold=0.6, df_cap=64).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in D.jaccard_pairs(docs, k=3, threshold=0.6, df_cap=1 << 30).collect()
    }
    assert capped == uncapped
    assert len(uncapped) > 0, "fixture must contain near-dup pairs"


def test_pq_encode_centroids_reconstruct_exactly(spark, sf_dir):
    """A vector that IS a sub-centroid source must encode to its own id
    in every subspace and reconstruct bit-exactly (zero quantization
    error) — the PQ invariant that makes ADC a distance estimate."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.functions import similarity as S
    from cassandra2aerospike_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cb = S.pq_codebook(emb, m=4, k_sub=16, dim=64)
    enc = S.pq_encode(emb.filter(F.col("vec_id") < 16), cb, "embedding", m=4, dim=64)
    rows = enc.select(
        "vec_id", "codes",
        (S.l2sq(S.as_double_vec(F.col("embedding")), F.col("recon")) == 0.0).alias("exact"),
    ).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.codes == [r.vec_id] * 4
        assert r.exact


def test_pq_and_ivfpq_recall_better_than_random(spark, sf_dir):
    """ANN sanity against the matching EXACT metric (squared L2 — PQ/ADC
    is an L2 estimator, so brute COSINE is the wrong baseline on
    unnormalized vectors): with the deterministic untrained codebook
    (16 codewords per 16-dim subspace of ~random vectors) recall is
    structurally low, but it must beat random top-5 (~1% here) by a
    clear margin — measured 8-10%."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.functions import similarity as S
    from cassandra2aerospike_spark.sources import load_table, spread

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    scored = (
        spread(emb)
        .join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            (-S.l2sq(S.as_double_vec(F.col("q_vec")),
                     S.as_double_vec(F.col("embedding")))).alias("sim"),
        )
    )

    def pairs(df):
        return {(r.q_id, r.vec_id) for r in df.select("q_id", "vec_id").collect()}

    exact_l2 = pairs(S._global_rank(scored, 5))
    pq = pairs(S.pq_topk(q, emb, k=5))
    ivfpq = pairs(S.ivfpq_topk(q, emb, k=5, nprobe=2))
    assert len(exact_l2) > 0
    assert len(pq & exact_l2) / len(exact_l2) >= 0.05
    assert len(ivfpq & exact_l2) / len(exact_l2) >= 0.05


def test_sq8_recall_tracks_exact_l2(spark, sf_dir):
    """SQ8 vs the matching exact metric (squared L2): an 8-bit affine
    code per dimension loses far less than PQ's 4-codes-per-vector, so
    recall@5 must be NEAR-exact (≥0.9 measured ~1.0 on the fixture),
    and every reconstruction must stay inside its dimension's [min,max]
    with quantization error ≤ ceil(span/255) per component."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.functions import similarity as S
    from cassandra2aerospike_spark.sources import load_table, spread

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    scored = (
        spread(emb)
        .join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            (-S.l2sq(S.as_double_vec(F.col("q_vec")),
                     S.as_double_vec(F.col("embedding")))).alias("sim"),
        )
    )

    def pairs(df):
        return {(r.q_id, r.vec_id) for r in df.select("q_id", "vec_id").collect()}

    exact_l2 = pairs(S._global_rank(scored, 5))
    sq8 = pairs(S.sq8_topk(q, emb, k=5))
    assert len(exact_l2) > 0
    assert len(sq8 & exact_l2) / len(exact_l2) >= 0.9
    # MRL two-stage funnel against the same exact-L2 baseline.  The
    # synthetic embeddings are isotropic (no Matryoshka front-loading),
    # so a 16/64-dim prefix is a structurally weak filter — recall is
    # bounded by how often a true neighbor's prefix distance lands in
    # the 32-candidate cut.  It must still beat random top-5 (~1%) by
    # a wide margin: measured 0.30 on the fixture, asserted >= 0.15.
    # On real MRL embeddings the prefix preserves ranking by training.
    mrl = pairs(S.mrl_topk(q, emb, k=5, prefix_dim=16, rerank=32))
    assert len(mrl & exact_l2) / len(exact_l2) >= 0.15
    # BQ 64-bit-signature funnel: 1 bit/dim keeps more rank information
    # than the 16-dim prefix on isotropic vectors (every dim votes), so
    # its 64-candidate Hamming cut + exact rescore must land between
    # MRL and SQ8.  Asserted >= 0.3; measured ~0.5+ on the fixture.
    bq = pairs(S.bq_topk(q, emb, k=5, rerank=64))
    assert len(bq & exact_l2) / len(exact_l2) >= 0.3
    # pooled-chunk funnel: with RANDOM chunk grouping (vec_id div 8) a
    # doc's mean pool carries little signal about its best chunk, so
    # this is the structural recall floor — it must still clear random
    # (4 docs x 8 chunks / 10k corpus ~ 0.3% random; measured ~5-10%)
    cp = pairs(S.chunk_pool_topk(q, emb, k=5, chunks_per_doc=8, doc_k=4))
    assert len(cp & exact_l2) / len(exact_l2) >= 0.02

    # reconstruction bound: recon within [mn, mx] and |recon - xq| less
    # than one quantization step (span div 255 + 1) in the scale-1000 domain
    stats = S.sq8_stats(emb)
    enc = (
        emb.select("vec_id", S.quantize_vec(F.col("embedding")).alias("xq"))
        .crossJoin(F.broadcast(stats))
        .select("xq", "mn_arr", "mx_arr", F.expr(S._SQ8_RECON).alias("recon"))
    )
    bad = enc.filter(
        F.exists(
            F.arrays_zip("xq", "recon", "mn_arr", "mx_arr"),
            lambda s: (s["recon"] < s["mn_arr"])
            | (s["recon"] > s["mx_arr"])
            | (
                F.abs(s["recon"] - s["xq"])
                > (s["mx_arr"] - s["mn_arr"]) / F.lit(255.0) + F.lit(1.0)
            ),
        )
    ).count()
    assert bad == 0


def test_probe_media_header_real_parsing():
    """The X5 header probe does REAL container parsing: hand-built PNG /
    GIF / JPEG(SOFn walk) / WAV headers parse to their true metadata;
    truncated or alien bytes degrade to 'unknown' or NULL fields, never
    raise."""
    import struct
    import zlib

    probe = M.probe_media_header
    ihdr = b"IHDR" + struct.pack(">IIBBBBB", 640, 480, 8, 6, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + ihdr
           + struct.pack(">I", zlib.crc32(ihdr)))
    assert probe(png) == ("png", 640, 480, None, None)

    gif = b"GIF89a" + struct.pack("<HHBBB", 320, 200, 0, 0, 0)
    assert probe(gif) == ("gif", 320, 200, None, None)

    # JPEG: APP0 then a DHT (to skip) then SOF0 with h=600 w=800
    jpeg = b"\xff\xd8"
    jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    jpeg += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    jpeg += b"\xff\xc4" + struct.pack(">H", 5) + b"abc"  # DHT, skipped
    jpeg += b"\xff\xc0" + struct.pack(">H", 8) + bytes([8]) + struct.pack(">HH", 600, 800) + b"\x03"
    assert probe(jpeg) == ("jpeg", 800, 600, None, None)

    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    assert probe(wav) == ("wav", None, None, 44100, 2)

    assert probe(b"")[0] == "unknown"
    assert probe(b"plain text payload")[0] == "unknown"
    assert probe(png[:10])[0] == "unknown"  # truncated before IHDR
    assert probe(b"\xff\xd8\xff") == ("jpeg", None, None, None, None)
    # WAV with no fmt chunk -> kind known, fields NULL
    assert probe(b"RIFF" + struct.pack("<I", 4) + b"WAVE" + b"\x00" * 24)[0] == "wav"


def test_synthesize_probe_roundtrip(spark):
    d = _docs(spark, [(0, "png doc"), (1, "gif doc"), (2, "wav doc"), (301, "gif2")])
    out = {r.doc_id: r for r in M.probe_media(M.synthesize_media(d)).collect()}
    assert out[0].kind == "png" and out[0].width == 16 and out[0].height == 16
    assert out[1].kind == "gif" and out[1].width == 17 and out[1].height == 23
    assert out[2].kind == "wav" and out[2].sample_rate == 24000 and out[2].channels == 1
    assert out[301].kind == "gif" and out[301].width == 16 + 301 % 624


def test_real_wav_pcm_decode_features():
    """REAL audio decode: handcrafted PCM16 blobs through decode_wav_pcm
    — stereo downmix, even/odd chunk padding, and error uniformity."""
    import struct

    import numpy as np

    from cassandra2aerospike_spark.functions.multimodal import decode_wav_pcm

    def wav(samples: np.ndarray, channels: int = 1, extra_chunk: bytes = b"") -> bytes:
        body = samples.astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, channels, 8000, 8000 * 2 * channels,
                          2 * channels, 16)
        return (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
                + extra_chunk
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(body)) + body)

    # mono ramp: peak/zcr computed from the actual samples
    n_s, rms, peak, zcr = decode_wav_pcm(wav(np.array([100, -200, 300, -400])))
    assert (n_s, peak, zcr) == (4, 400, 3)
    assert abs(rms - float(np.sqrt((100**2 + 200**2 + 300**2 + 400**2) / 4))) < 1e-9
    # stereo: interleaved downmix to mono means
    n_s, _rms, peak, _z = decode_wav_pcm(
        wav(np.array([100, 300, -200, -400]), channels=2)
    )
    assert (n_s, peak) == (2, 300)  # means (200, -300)
    # an odd-length unknown chunk before fmt must be skipped with padding
    n_s, *_ = decode_wav_pcm(
        wav(np.array([1, -1]), extra_chunk=b"LIST" + struct.pack("<I", 3) + b"abc\x00")
    )
    assert n_s == 2
    # errors are uniform ValueError
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm(b"nope")
    blob = wav(np.array([1, -1]))
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav_pcm(blob[:-1])
    float_fmt = blob.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1)
    with _pytest.raises(ValueError, match="PCM16"):
        decode_wav_pcm(float_fmt)


def test_real_bmp_decode_pixels():
    """REAL pixel decode: bottom-up row order, BGR->RGB, stride padding,
    top-down negative height, and error uniformity."""
    import struct

    import numpy as np
    import pytest as _pytest

    from cassandra2aerospike_spark.functions.multimodal import decode_bmp

    def bmp(w: int, h: int, rows_bgr: list[bytes], height_field: int) -> bytes:
        stride = (w * 3 + 3) & ~3
        pixels = b"".join(r.ljust(stride, b"\x00") for r in rows_bgr)
        return (b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, height_field, 1, 24, 0,
                              len(pixels), 0, 0, 0, 0)
                + pixels)

    # 2x2, bottom-up: file row 0 is the image's BOTTOM row
    bottom = bytes((255, 0, 0)) + bytes((0, 255, 0))    # blue px, green px
    top = bytes((0, 0, 255)) + bytes((255, 255, 255))   # red px, white px
    img = decode_bmp(bmp(2, 2, [bottom, top], 2))
    assert img.shape == (2, 2, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)   # top-left is RED (RGB order)
    assert tuple(img[1, 0]) == (0, 0, 255)   # bottom-left is BLUE
    # negative height = top-down storage: same bytes, flipped meaning
    img_td = decode_bmp(bmp(2, 2, [bottom, top], -2))
    assert tuple(img_td[0, 0]) == (0, 0, 255)
    with _pytest.raises(ValueError, match="BM"):
        decode_bmp(b"PNG...")
    with _pytest.raises(ValueError, match="truncated"):
        decode_bmp(bmp(2, 2, [bottom, top], 2)[:-3])
    blob32 = bmp(2, 1, [bottom], 1).replace(
        struct.pack("<H", 24), struct.pack("<H", 32), 1
    )
    with _pytest.raises(ValueError, match="24-bit"):
        decode_bmp(blob32)


def test_real_wav_short_fmt_chunk_is_wav_error():
    import struct

    import pytest as _pytest

    from cassandra2aerospike_spark.functions.multimodal import decode_wav_pcm

    blob = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"fmt " + struct.pack("<I", 8) + bytes(8)
            + b"data" + struct.pack("<I", 2) + b"\x01\x00")
    with _pytest.raises(ValueError, match="fmt"):
        decode_wav_pcm(blob)


def test_real_nn_resize_matches_per_pixel_reference():
    """resize_nn pinned against an independent per-pixel loop on a
    NON-uniform image (the oracle query's solid colors cannot catch
    index-mapping bugs; this does)."""
    import numpy as np

    from cassandra2aerospike_spark.functions.multimodal import resize_nn

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    out = resize_nn(img, 5, 4)
    ref = np.zeros((4, 5, 3), dtype=np.uint8)
    for y in range(4):
        for x in range(5):
            ref[y, x] = img[(y * 7) // 4, (x * 11) // 5]
    assert np.array_equal(out, ref)
    # upsampling: each source pixel repeats, no out-of-range index
    up = resize_nn(img, 22, 14)
    assert up.shape == (14, 22, 3)
    assert np.array_equal(up[0, 0], img[0, 0]) and np.array_equal(up[-1, -1], img[-1, -1])


def test_decontaminate_benchmark_docs_self_flag(spark, sf_dir):
    """Every pseudo-benchmark doc (doc_id % 50 == 0) with at least one
    5-gram must flag contaminated — its grams ARE the benchmark set —
    and hit counts can never exceed the doc's distinct-gram count."""
    from cassandra2aerospike_spark.queries.text_q import q_text_decontaminate

    rows = q_text_decontaminate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_hit <= r.n_grams
        if r.is_benchmark and r.n_grams > 0:
            assert r.n_hit == r.n_grams and r.contaminated


def test_stratified_rates_and_determinism(spark, sf_dir):
    """Kept buckets respect the per-stratum threshold; two runs return
    the identical keep set (the property df.sample cannot give)."""
    from cassandra2aerospike_spark.queries.text_q import q_sample_stratified

    a = {(r.doc_id, r.lang, r.bucket) for r in q_sample_stratified(spark, sf_dir).collect()}
    b = {(r.doc_id, r.lang, r.bucket) for r in q_sample_stratified(spark, sf_dir).collect()}
    assert a == b and a
    for _, lang, bucket in a:
        assert bucket < (16384 if lang == "en" else 39321)


def test_domain_mix_epoch_counts(spark, sf_dir):
    """Each doc appears exactly `epochs` times with epoch ids 0..epochs-1,
    and the epoch policy follows the domain id."""
    from collections import defaultdict

    from cassandra2aerospike_spark.queries.text_q import q_sample_domain_mix

    per_doc = defaultdict(list)
    for r in q_sample_domain_mix(spark, sf_dir).collect():
        dom = int(r.source[3:])
        want = 3 if dom < 5 else 2 if dom < 10 else 1
        assert r.epochs == want
        per_doc[r.doc_id].append(r.epoch)
    assert per_doc
    for doc_id, eps in per_doc.items():
        assert sorted(eps) == list(range(len(eps)))


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def test_png_roundtrip_random_image():
    """encode_png -> decode_png is identity on a non-uniform image."""
    import numpy as np

    from cassandra2aerospike_spark.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_unfilters_all_five_filter_types():
    """Hand-FILTER a known image with each per-scanline filter (spec §9
    forward direction, computed independently here) and assert
    decode_png recovers the exact pixels — pins Sub/Up/Average/Paeth."""
    import struct
    import zlib

    import numpy as np

    from cassandra2aerospike_spark.functions.multimodal import decode_png

    rng = np.random.default_rng(7)
    h, w, nch = 5, 6, 3
    img = rng.integers(0, 256, size=(h, w, nch), dtype=np.uint8)
    flat = img.reshape(h, w * nch).astype(int)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = b""
    for y, ftype in zip(range(h), (0, 1, 2, 3, 4)):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * nch, int)
        line = []
        for i in range(w * nch):
            a = cur[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[ftype]
            line.append((cur[i] - pred) & 0xFF)
        raw += bytes([ftype]) + bytes(line)

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), img)


def test_png_rgba_drops_alpha_and_corruption_rejected():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from cassandra2aerospike_spark.functions.multimodal import decode_png

    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), rgba[:, :, :3])

    # flip one IDAT payload byte: chunk CRC must catch it
    bad = bytearray(blob)
    idat_at = blob.index(b"IDAT") + 6
    bad[idat_at] ^= 0xFF
    with _pytest.raises(ValueError, match="crc"):
        decode_png(bytes(bad))
    # truncation at any point is a png error, never an IndexError
    for cut in range(8, len(blob), 7):
        with _pytest.raises(ValueError, match="png"):
            decode_png(blob[:cut])
    # unsupported: 16-bit depth
    blob16 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 16, 2, 0, 0, 0))
    )
    with _pytest.raises(ValueError, match="unsupported"):
        decode_png(blob16)


def test_kmeans_training_reduces_distortion(spark, sf_dir):
    """Lloyd's guarantee, quantized: total squared-L2 distortion after
    two training iterations must not exceed the take-first-k init's
    (floor-mean centroids can deviate from the exact mean by < 1 ulp of
    the quantized grid, far below the fixture's distortion gap)."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.functions import similarity as S
    from cassandra2aerospike_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", S.quantize_vec(F.col("embedding")).alias("xq"))

    def distortion(codebook):
        return (
            S.assign_cells_quantized(q, codebook)
            .agg(F.sum("d2").alias("t"))
            .collect()[0]["t"]
        )

    d_init = distortion(S.kmeans_fit_quantized(emb, k=8, iters=0))
    d_one = distortion(S.kmeans_fit_quantized(emb, k=8, iters=1))
    d_two = distortion(S.kmeans_fit_quantized(emb, k=8, iters=2))
    assert d_one <= d_init
    assert d_two <= d_one
    assert d_two < d_init  # training actually moved the codebook


def test_jpeg_roundtrip_solid_exact_and_random_bounded():
    """With unit quant tables a solid image decodes EXACTLY to the
    YCbCr-roundtripped color (DC-only blocks); a random image — which
    exercises the full huffman AC path, ZRL runs and EOB — stays within
    the DCT-coefficient-rounding bound of the YCbCr round trip."""
    import numpy as np

    from cassandra2aerospike_spark.functions.jpeg_py import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    for color in [(10, 200, 77), (255, 0, 128), (0, 0, 0), (255, 255, 255)]:
        img = np.full((12, 19, 3), color, dtype=np.uint8)  # non-MCU-aligned
        out = decode_jpeg_baseline(encode_jpeg_baseline(img))
        assert out.shape == img.shape
        assert np.array_equal(out, ycbcr_to_rgb(rgb_to_ycbcr(img)))

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img))
    ref = ycbcr_to_rgb(rgb_to_ycbcr(img)).astype(int)
    assert np.abs(out.astype(int) - ref).max() <= 4


def test_jpeg_rejects_unsupported_and_truncation():
    import numpy as np
    import pytest as _pytest

    from cassandra2aerospike_spark.functions.jpeg_py import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    blob = encode_jpeg_baseline(img)
    # progressive: flip SOF0 marker (0xFFC0) to SOF2 (0xFFC2)
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError, match="baseline"):
        decode_jpeg_baseline(prog)
    # subsampling: find the SOF0 segment and set Y sampling to 2x2
    sof_at = blob.index(b"\xff\xc0")
    sub = bytearray(blob)
    sub[sof_at + 11] = 0x22  # first component's sampling byte
    with _pytest.raises(ValueError, match="subsampling"):
        decode_jpeg_baseline(bytes(sub))
    # truncation anywhere is a jpeg ValueError, never Index/struct error
    for cut in range(2, len(blob), 11):
        with _pytest.raises(ValueError):
            decode_jpeg_baseline(blob[:cut])


def test_png_zero_height_rejected():
    import struct
    import zlib

    import pytest as _pytest

    from cassandra2aerospike_spark.functions.multimodal import decode_png

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 0, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b""))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="png"):
        decode_png(blob)


def test_jpeg_sof_component_order_matched_by_id():
    """A spec-legal stream whose SOF lists components as (3,2,1) while
    the scan stays (1,2,3) must decode identically to the canonical
    file — components are matched by JFIF id, not list position."""
    import numpy as np

    from cassandra2aerospike_spark.functions.jpeg_py import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    img = np.full((8, 16, 3), (40, 90, 200), dtype=np.uint8)
    blob = encode_jpeg_baseline(img)
    ref = decode_jpeg_baseline(blob)
    sof_at = blob.index(b"\xff\xc0")
    comp0 = sof_at + 10  # marker(2) + len(2) + prec(1) + h(2) + w(2) + nc(1)
    b = bytearray(blob)
    b[comp0 : comp0 + 3], b[comp0 + 6 : comp0 + 9] = (
        blob[comp0 + 6 : comp0 + 9],
        blob[comp0 : comp0 + 3],
    )
    assert np.array_equal(decode_jpeg_baseline(bytes(b)), ref)


def test_jpeg_fill_bytes_and_standalone_markers_in_header():
    """Spec B.1.1.2: 0xFF fill bytes may precede any marker, and
    standalone markers (TEM 0x01, RST0-7) carry no length field.  A
    conforming stream carrying both before SOS must decode identically
    to the canonical file instead of misreading the next two bytes as a
    segment length."""
    import numpy as np

    from cassandra2aerospike_spark.functions.jpeg_py import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    img = np.full((8, 16, 3), (40, 90, 200), dtype=np.uint8)
    blob = encode_jpeg_baseline(img)
    ref = decode_jpeg_baseline(blob)
    sof_at = blob.index(b"\xff\xc0")
    # fill bytes + TEM + RST4 between SOI-era segments and SOF
    patched = (
        blob[:sof_at] + b"\xff\xff\xff\x01\xff\xd4\xff\xff" + blob[sof_at:]
    )
    assert np.array_equal(decode_jpeg_baseline(patched), ref)


def test_image_decoders_fail_uniformly_on_arbitrary_bytes():
    """Fuzz: random bytes — including ones wearing valid magics — must
    raise ValueError from every image decoder, never IndexError/
    struct.error/zlib.error; and a deflate bomb in IDAT is capped at the
    IHDR-declared size instead of allocating the expanded stream."""
    import struct
    import zlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra2aerospike_spark.functions.gif_py import decode_gif
    from cassandra2aerospike_spark.functions.jpeg_py import decode_jpeg_baseline
    from cassandra2aerospike_spark.functions.multimodal import decode_bmp, decode_png

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=120), st.integers(0, 4))
    def fuzz(data, prefix_kind):
        prefix = [b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"BM", b"GIF89a"][prefix_kind]
        blob = prefix + data
        for fn in (decode_png, decode_jpeg_baseline, decode_bmp, decode_gif):
            try:
                fn(blob)
            except ValueError:
                pass

    fuzz()

    # bomb: IHDR declares 4x3 but IDAT inflates to 1 MB
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20)))
        + _png_chunk(b"IEND", b"")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="png"):
        decode_png(bomb)


def test_ivf_with_trained_codebook_searches(spark, sf_dir):
    """The trained k-means codebook drives ivf_topk end to end
    (dequantize -> assign -> probe -> rank) and returns a full top-k per
    query with recall comparable to the take-first-k codebook."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.functions import similarity as S
    from cassandra2aerospike_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    trained = S.dequantize_codebook(S.kmeans_fit_quantized(emb, k=8, iters=2))
    exact = {
        (r.q_id, r.vec_id)
        for r in S.brute_force_topk(qs, emb, k=5).collect()
    }
    got = S.ivf_topk(qs, emb, k=5, nprobe=2, centroids=trained).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.q_id, []).append(r)
    assert per_q and all(len(v) == 5 for v in per_q.values())
    hits = sum((r.q_id, r.vec_id) in exact for r in got)
    assert hits / len(exact) >= 0.4  # ANN recall floor on the fixture


def test_gif_lzw_roundtrip_and_rejections():
    """encode_gif -> decode_gif is identity (palette-exact LZW) across
    solid, multi-color, and table-growth-forcing sizes; interlace and
    truncation reject uniformly."""
    import numpy as np
    import pytest as _pytest

    from cassandra2aerospike_spark.functions.gif_py import decode_gif, encode_gif

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, size=(20, 3), dtype=np.uint8)
    for shape in [(1, 1), (7, 13), (100, 90)]:
        img = pal[rng.integers(0, 20, size=shape)]
        assert np.array_equal(decode_gif(encode_gif(img)), img)

    blob = encode_gif(pal[rng.integers(0, 20, size=(9, 9))])
    # interlace flag set in the image descriptor — located structurally
    # (header 6 + screen descriptor 7 + global palette 768), since a
    # 0x2c byte can legally appear inside the random palette
    desc_at = 6 + 7 + 3 * 256
    assert blob[desc_at] == 0x2C
    b = bytearray(blob)
    b[desc_at + 9] |= 0x40
    with _pytest.raises(ValueError, match="interlace"):
        decode_gif(bytes(b))
    for cut in range(6, len(blob), 13):
        with _pytest.raises(ValueError, match="gif"):
            decode_gif(blob[:cut])


def test_zorder_buckets_are_quadtree_cells(spark, sf_dir):
    """The z-order pruning guarantee, pinned exactly: a zbucket is the
    top-8-bit z prefix = one quadtree cell, so within any bucket the x
    and y spans are each bounded by the 4096-wide cell — the property
    that lets a range predicate on EITHER column skip buckets."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.queries.tokens_q import q_layout_zorder

    spans = (
        q_layout_zorder(spark, sf_dir)
        .select(
            "zbucket",
            (F.col("l_orderkey") % 65536).alias("x"),
            (F.col("l_partkey") % 65536).alias("y"),
        )
        .groupBy("zbucket")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert spans
    for r in spans:
        assert r.xs < 4096 and r.ys < 4096


def test_dedup_incremental_decisions_consistent(spark, sf_dir):
    """Every new doc gets exactly one decision; dup_of points at an old
    doc for corpus dups, at the batch representative for batch dups,
    and is NULL for keeps; batch representatives are themselves kept."""
    from cassandra2aerospike_spark.queries.dedup_q import q_dedup_incremental

    rows = q_dedup_incremental(spark, sf_dir).collect()
    assert rows
    by_id = {r.doc_id: r for r in rows}
    for r in rows:
        assert r.doc_id % 2 == 1
        if r.decision == "dup_of_corpus":
            assert r.dup_of is not None and r.dup_of % 2 == 0
        elif r.decision == "dup_in_batch":
            assert r.dup_of in by_id and by_id[r.dup_of].decision == "keep"
        else:
            assert r.decision == "keep" and r.dup_of is None


def test_gif_animation_roundtrip_and_frame_sampling():
    """Multi-frame GIF89a: every frame decodes exactly; decode_gif stays
    first-frame back-compatible; truncation rejects uniformly."""
    import numpy as np
    import pytest as _pytest

    from cassandra2aerospike_spark.functions.gif_py import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(20, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 20, size=(9, 11))] for _ in range(5)]
    blob = encode_gif_animation(frames)
    out = decode_gif_frames(blob)
    assert len(out) == 5
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))
    assert np.array_equal(decode_gif(blob), frames[0])
    for cut in range(6, len(blob), 37):
        with _pytest.raises(ValueError, match="gif"):
            decode_gif_frames(blob[:cut])


def test_mp4_probe_box_walk_and_rejections():
    """probe_mp4 walks real box structure: 64-bit largesize boxes,
    version 0 and 1 mvhd, size-0 (to-end) boxes; truncation and missing
    required boxes raise uniformly."""
    import struct

    import pytest as _pytest

    from cassandra2aerospike_spark.functions.multimodal import probe_mp4

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd0 = b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 1000, 5000) + bytes(80)
    blob = (
        box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"isom")
        + box(b"moov", box(b"mvhd", mvhd0))
        + box(b"mdat", b"payload")
    )
    assert probe_mp4(blob) == ("mp42", 1000, 5000, 3)

    # largesize (size==1 + 64-bit) mdat, and mvhd v1 64-bit duration
    mvhd1 = b"\x01\x00\x00\x00" + struct.pack(">QQIQ", 0, 0, 90000, 1 << 33) + bytes(80)
    big = b"\x00\x00\x00\x01" + b"mdat" + struct.pack(">Q", 16 + 5) + b"12345"
    blob2 = (
        box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
        + box(b"moov", box(b"mvhd", mvhd1))
        + big
    )
    assert probe_mp4(blob2) == ("isom", 90000, 1 << 33, 3)

    with _pytest.raises(ValueError, match="mp4"):
        probe_mp4(box(b"mdat", b"x"))  # no ftyp/moov
    # truncation inside the REQUIRED boxes raises; a cut that only drops
    # the optional trailing mdat still parses, so stop before moov's end
    moov_end = len(blob) - (8 + 7)
    for cut in range(1, moov_end, 7):
        with _pytest.raises(ValueError, match="mp4"):
            probe_mp4(blob[:cut])


def test_sstable_corpus_merge_semantics(spark, sf_dir):
    """The real-format corpus capstone's merge guarantees, asserted
    directly: no stale generation-1 text survives LWW (no ' OLDSTALE'
    token can influence n_tokens), and row-tombstoned docs
    (doc_id % 97 == 0) never appear."""
    from cassandra2aerospike_spark.queries.pipeline_q import (
        q_pipeline_sstable_corpus,
    )
    from cassandra2aerospike_spark.sources import load_table

    rows = q_pipeline_sstable_corpus(spark, sf_dir).collect()
    assert rows
    ids = {r.doc_id for r in rows}
    assert all(d % 97 != 0 for d in ids)
    # n_tokens must equal the CURRENT text's count (stale adds +1 token)
    import re

    src = {
        r.doc_id: len([t for t in re.split(r"\s+", r.text.lower().strip()) if t])
        for r in load_table(spark, sf_dir, "documents").collect()
        if r.doc_id % 97 != 0
    }
    for r in rows:
        assert r.n_tokens == src[r.doc_id]


def test_semantic_dedup_quantized_basics(spark):
    """SemDeDup unit semantics: identical vectors dedup to the lowest id,
    opposite-sign vectors never match (dot <= 0 guard), sub-threshold
    pairs survive, cells isolate pairs, singleton cells keep."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.functions.similarity import (
        semantic_dedup_quantized,
    )

    rows = [
        # cell 0: v1 == v2 (cos 1 -> dup), v3 orthogonal (keep)
        (1, [1000, 0, 0], 0),
        (2, [1000, 0, 0], 0),
        (3, [0, 1000, 0], 0),
        # cell 1: v4 vs v5 anti-parallel (dot < 0 -> keep both)
        (4, [0, 0, 1000], 1),
        (5, [0, 0, -1000], 1),
        # cell 2: singleton
        (6, [7, 7, 7], 2),
        # cell 3: v7 vs v8 cos ~0.707 < 0.95 -> keep both
        (7, [1000, 0, 0], 3),
        (8, [1000, 1000, 0], 3),
        # cell 4: v9 == v1's vector but DIFFERENT cell: no cross-cell pair
        (9, [1000, 0, 0], 4),
    ]
    df = spark.createDataFrame(rows, "vec_id long, xq array<long>, cell int")
    got = {
        r.vec_id: (r.decision, r.dup_of)
        for r in semantic_dedup_quantized(df).collect()
    }
    assert got == {
        1: ("keep", None),
        2: ("drop", 1),
        3: ("keep", None),
        4: ("keep", None),
        5: ("keep", None),
        6: ("keep", None),
        7: ("keep", None),
        8: ("keep", None),
        9: ("keep", None),
    }


def test_semantic_dedup_threshold_boundary(spark):
    """The integer test is EXACT at the boundary: cos^2 == t_num/t_den
    counts as a duplicate (>=), one ulp under does not."""
    from cassandra2aerospike_spark.functions.similarity import (
        semantic_dedup_quantized,
    )

    # a=(3,4), b=(3,4): cos=1. c=(4,3): cos(a,c)=24/25=0.96 -> with
    # t = 0.96^2 = 9216/10000 exactly: dup; with t_num 9217: keep
    rows = [(1, [3, 4], 0), (2, [4, 3], 0)]
    df = spark.createDataFrame(rows, "vec_id long, xq array<long>, cell int")
    at = {r.vec_id: r.decision for r in
          semantic_dedup_quantized(df, t_num=9216, t_den=10000).collect()}
    over = {r.vec_id: r.decision for r in
            semantic_dedup_quantized(df, t_num=9217, t_den=10000).collect()}
    assert at == {1: "keep", 2: "drop"}
    assert over == {1: "keep", 2: "keep"}


def test_pii_scrub_patterns(spark):
    """The three PII regexes hit the shapes they claim and nothing else
    (word-boundary guards: digits embedded in hostnames or long digit
    runs must not match)."""
    from pyspark.sql import functions as F

    email = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    ip = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    phone = r"\b\d{3}-\d{4}\b"
    cases = [
        ("mail me at bob.smith+x@sub.example.org now", 1, 0, 0),
        ("server 10.0.255.7 and 192.168.1.1", 0, 2, 0),
        ("call 555-0199 or 555-12345x", 0, 0, 1),  # 555-12345 fails \b
        ("version v1.2.3.4x is not an ip", 0, 0, 0),  # trailing word char
        ("mail3.example.com is a host not an email", 0, 0, 0),
    ]
    df = spark.createDataFrame([(t,) for t, *_ in cases], "t string")
    got = df.select(
        "t",
        F.regexp_count("t", F.lit(email)).alias("e"),
        F.regexp_count("t", F.lit(ip)).alias("i"),
        F.regexp_count("t", F.lit(phone)).alias("p"),
    ).collect()
    want = {t: (e, i, p) for t, e, i, p in cases}
    for r in got:
        assert (r.e, r.i, r.p) == want[r.t], r.t


def test_semantic_dedup_fast_matches_declarative(spark):
    """The GEMM path must be BIT-identical to the declarative expression
    path on random integer frames (both are exact int64 arithmetic)."""
    import random

    from cassandra2aerospike_spark.functions.similarity import (
        semantic_dedup_quantized,
        semantic_dedup_quantized_fast,
    )

    rng = random.Random(6)
    rows = []
    vid = 0
    # cells 3-4 get vec_ids above 2^53: a float64 round-trip of dup_of
    # would silently corrupt them (the r06 latent defect), so equality
    # with the declarative twin also proves the integer dup_of path
    big = (1 << 53) + 12345
    for cell in range(5):
        off = big if cell >= 3 else 0
        for _ in range(rng.randrange(1, 15)):
            base = [rng.randrange(-800, 800) for _ in range(16)]
            rows.append((vid + off, base, cell))
            vid += 1
            if rng.random() < 0.4:  # plant a near-copy in the same cell
                rows.append(
                    (vid + off, [x + rng.randrange(-2, 3) for x in base], cell)
                )
                vid += 1
    df = spark.createDataFrame(rows, "vec_id long, xq array<long>, cell int")
    slow = {(r.vec_id, r.cell, r.decision, r.dup_of)
            for r in semantic_dedup_quantized(df).collect()}
    fast = {(r.vec_id, r.cell, r.decision, r.dup_of)
            for r in semantic_dedup_quantized_fast(df).collect()}
    assert slow == fast and len(slow) == len(rows)


def test_kmeans_np_matches_declarative(spark, sf_dir):
    """The driver-resident-codebook Lloyd (GEMM assignment + Python
    floor-mean) must produce the EXACT codebook of the declarative
    kmeans_fit_quantized on the fixture — same init, ties, floor-mean."""
    import numpy as np

    from cassandra2aerospike_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", S.quantize_vec(F.col("embedding")).alias("xq"))
    cb = {
        int(r.cid): list(r.c_vec)
        for r in S.kmeans_fit_quantized(emb, k=8, iters=2).collect()
    }
    cids, mat = S.kmeans_fit_quantized_np(q, k=8, iters=2)
    got = {int(c): [int(x) for x in row] for c, row in zip(cids, mat)}
    assert got == cb
    # and the GEMM assignment equals the expression-tree assignment
    decl = {
        (r.vec_id, r.cell, r.d2)
        for r in S.assign_cells_quantized(
            q, S.kmeans_fit_quantized(emb, k=8, iters=2)
        ).collect()
    }
    fast = {
        (r.vec_id, r.cell, r.d2)
        for r in S.assign_cells_quantized_np(q, cids, mat).collect()
    }
    assert decl == fast


def test_quality_classifier_trains_and_separates(spark, sf_dir):
    """The trained quality scorer is (a) deterministic — two training
    runs over different partitionings give identical weights (the
    integer-GD associativity claim, machine-checked) — and (b) actually
    predictive: agreement with the weak gopher label well above the
    base rate, with a non-trivial keep/drop split."""
    from cassandra2aerospike_spark.functions import text as X
    from cassandra2aerospike_spark.queries.text_q import (
        q_text_quality_classifier,
    )
    from cassandra2aerospike_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    fs = X.classifier_features(F.col("text"))
    feats = d.select(
        "doc_id", *[fs[x].alias(x) for x in X.CLF_FEATS], fs["y"].alias("y")
    )
    w1 = X.train_quality_classifier(feats.repartition(1))
    w17 = X.train_quality_classifier(feats.repartition(17, "doc_id"))
    assert w1 == w17  # order-free integer gradient sums

    rows = q_text_quality_classifier(spark, str(sf_dir)).collect()
    n = len(rows)
    assert n > 0
    agree = sum(int(r.keep_pred == r.label_keep) for r in rows) / n
    base = max(
        sum(r.label_keep for r in rows), n - sum(r.label_keep for r in rows)
    ) / n
    assert agree >= base  # at least as good as always-majority
    assert agree > 0.75  # and genuinely predictive


def test_sim_index_persist_serves_from_storage(spark):
    """The persisted-ANN-index contract (round 12): the SERVING plan's
    leaves are the stored index parquet files (plus the query vectors),
    with zero training lineage (the trainer's posexplode never appears);
    appended arrivals (vec_id >= 2e6, added WITHOUT retraining) are
    served."""
    from cassandra2aerospike_spark.queries.sim_q import (
        q_sim_index_persist_topk,
    )

    df = q_sim_index_persist_topk(spark, "/root/testdata/sf0.001")
    files = df.inputFiles()
    assert any("spark_graft_simidx_" in f for f in files), files[:3]
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "posexplode" not in analyzed  # no k-means training lineage
    out = df.collect()
    assert any(r.vec_id >= 2_000_000 for r in out)  # append is live
    # every query returns exactly 5 ranked neighbors
    from collections import Counter

    per_q = Counter(r.q_id for r in out)
    assert all(v == 5 for v in per_q.values())


def test_ivf_index_drift_split_rewrites_only_affected_cell(spark, tmp_path):
    """The persisted-index drift policy (round 13, VERDICT r12 task 5):
    appends accumulate per-cell counters; a cell whose appends reach
    1/4 of its train size is RETRAINED (deterministic integer 2-means
    split) with ONLY that cell's postings re-assigned — the untouched
    cell's parquet partition is byte-identical before/after — and
    serving from the refreshed index returns exact neighbors."""
    import os

    from cassandra2aerospike_spark.queries.sim_q import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_serve_topk,
    )

    dim = 4

    def vec(base, j):
        return [base + j, base - j, base + 2 * j, base]

    # two well-separated clusters, 20 members each
    base_rows = [(i, vec(0, i % 5)) for i in range(20)] + [
        (100 + i, vec(1000, i % 5)) for i in range(20)
    ]
    base_q = spark.createDataFrame(base_rows, "vec_id long, xq array<long>")
    index_dir = str(tmp_path / "ivf_idx")
    ivf_index_build(spark, base_q, index_dir, k=2, iters=2)

    post_dir = os.path.join(index_dir, "postings")
    cells0 = sorted(
        r["cell"]
        for r in spark.read.parquet(post_dir).select("cell").distinct().collect()
    )
    assert len(cells0) == 2
    # which cell holds the 1000-cluster?
    hot = (
        spark.read.parquet(post_dir)
        .filter(F.col("vec_id") >= 100)
        .select("cell")
        .first()["cell"]
    )
    cold = [c for c in cells0 if c != hot][0]

    def cell_files(cell):
        d = os.path.join(post_dir, f"cell={cell}")
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)), os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
        )

    cold_before = cell_files(cold)

    # small append below threshold: 3 < 20/4 -> no split
    arr1 = spark.createDataFrame(
        [(200 + i, vec(990, i)) for i in range(3)], "vec_id long, xq array<long>"
    )
    assert ivf_index_append(spark, index_dir, arr1) == []

    # second append pushes the hot cell's lifetime appends to 10 >= 23/4
    # -> split; arrivals are bimodal (900 vs 1100) so the split is real
    arr2 = spark.createDataFrame(
        [(300 + i, vec(900, i)) for i in range(4)]
        + [(400 + i, vec(1100, i)) for i in range(3)],
        "vec_id long, xq array<long>",
    )
    split = ivf_index_append(spark, index_dir, arr2)
    assert split == [hot]

    cents = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    assert len(cents) == 3  # hot cell split in two, cold untouched
    posts = spark.read.parquet(post_dir)
    assert posts.count() == posts.select("vec_id").distinct().count() == 50
    # the untouched cell's partition directory is byte-identical
    assert cell_files(cold) == cold_before
    # meta counters: split cells reset, cold cell never appended
    meta = {
        r["cell"]: (r["train_n"], r["appended_n"])
        for r in spark.read.parquet(os.path.join(index_dir, "meta")).collect()
    }
    assert meta[cold] == (20, 0)
    assert all(an == 0 for c, (tn, an) in meta.items() if c != cold)
    assert sum(tn for c, (tn, an) in meta.items() if c != cold) == 30

    # serving from the refreshed index is exact vs brute force
    queries = spark.createDataFrame(
        [(9000, vec(1000, 2)), (9001, vec(0, 1))], "q_id long, q_xq array<long>"
    )
    got = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["d2"])
        for r in ivf_index_serve_topk(
            spark, index_dir, queries, k=3, nprobe=2
        ).collect()
    }
    all_vecs = {vid: x for vid, x in base_rows} | {
        200 + i: vec(990, i) for i in range(3)
    } | {300 + i: vec(900, i) for i in range(4)} | {
        400 + i: vec(1100, i) for i in range(3)
    }

    def brute(qv, restrict_ids):
        scored = sorted(
            (sum((a - b) ** 2 for a, b in zip(qv, x)), vid)
            for vid, x in all_vecs.items()
            if vid in restrict_ids
        )
        return [(vid, d) for d, vid in scored[:3]]

    # nprobe=2 over 3 cells: the probed candidate set is cell-bounded;
    # for the 1000-query both probes land in the split pair (the whole
    # 1000-cluster), so exactness against the cluster-restricted brute
    # force is the right contract
    cluster_b = {vid for vid in all_vecs if vid >= 100 or all_vecs[vid][0] >= 900}
    want_b = brute(vec(1000, 2), cluster_b)
    assert [got[(9000, r + 1)] for r in range(3)] == want_b


def test_sim_index_persist_pq_serves_from_storage(spark):
    """The persisted-PQ contract (round 13): serving reads the stored
    codebook + coded postings parquet (plan leaves under the index
    dir); appended arrivals (vec_id >= 3e6, encoded against the stored
    codebook WITHOUT retraining) are served; every query returns
    exactly 5 ranked neighbors."""
    from collections import Counter

    from cassandra2aerospike_spark.queries.sim_q import q_sim_index_persist_pq

    df = q_sim_index_persist_pq(spark, "/root/testdata/sf0.001")
    files = df.inputFiles()
    assert any("spark_graft_simidx_" in f for f in files), files[:3]
    out = df.collect()
    assert any(r.vec_id >= 3_000_000 for r in out)  # append is live
    per_q = Counter(r.q_id for r in out)
    assert all(v == 5 for v in per_q.values())


def test_sim_hybrid_index_vector_leg_reads_index_parquet(spark):
    """The hybrid-over-index contract (round 13, VERDICT r12 task 6):
    the fused query's plan leaves include the persisted IVF index
    parquet — the vector leg serves from storage, not a GEMM over the
    embedding column."""
    from cassandra2aerospike_spark.queries.text_q import (
        q_sim_hybrid_index_rrf_topk,
    )

    df = q_sim_hybrid_index_rrf_topk(spark, "/root/testdata/sf0.001")
    files = df.inputFiles()
    assert any("spark_graft_simidx_" in f for f in files), files[:3]
    out = df.collect()
    assert out and all(1 <= r.fused_rank <= 5 for r in out)


def test_sim_index_persist_bq_serves_from_storage(spark):
    """The persisted-BQ contract (round 13): serving reads the stored
    signature + vector parquet (plan leaves under the index dir);
    appended arrivals (vec_id >= 5e6, signed against the stored means
    WITHOUT retraining) are candidates; every query returns exactly 5
    ranked neighbors and stage 2's exact d2 is non-decreasing in rank."""
    from collections import Counter

    from cassandra2aerospike_spark.queries.sim_q import q_sim_index_persist_bq

    df = q_sim_index_persist_bq(spark, "/root/testdata/sf0.001")
    files = df.inputFiles()
    assert any("spark_graft_simidx_" in f for f in files), files[:3]
    out = df.collect()
    assert any(r.vec_id >= 5_000_000 for r in out)  # append is live
    per_q = Counter(r.q_id for r in out)
    assert all(v == 5 for v in per_q.values())
    by_q: dict = {}
    for r in sorted(out, key=lambda r: (r.q_id, r.rank)):
        by_q.setdefault(r.q_id, []).append(r.d2)
    assert all(ds == sorted(ds) for ds in by_q.values())


def test_video_clip_fixture_roundtrip_and_dedup(spark):
    """Round 16 video near-dup: the synthesized animated GIFs decode
    back to the closed-form gradient exactly (lossless container), the
    planted offset copies match the source on exactly 3 of 4 frames,
    and the keep-list drops exactly the planted clip ids."""
    import numpy as np

    from cassandra2aerospike_spark.functions import multimodal as M
    from cassandra2aerospike_spark.functions.gif_py import decode_gif_frames
    from cassandra2aerospike_spark.queries.dedup_q import _video_fp_dup_ids

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    )
    media = M.synthesize_video_clips(docs).collect()
    by_id = {r.clip_id: bytes(r.payload) for r in media}
    # 40 docs + copies for 0, 11, 22, 33
    assert set(by_id) == set(range(40)) | {1_000_000, 1_000_011,
                                           1_000_022, 1_000_033}

    def gray(d, cf, delta):
        rr = np.arange(8, dtype=np.int64)[:, None] + 1
        cc = np.arange(9, dtype=np.int64)[None, :] + 1
        m1 = (d * 2654435761 + cf * 1315423911) % 1000003
        m2 = (d * 40503 + cf * 2246822519 + 17) % 997
        m3 = (d * 69621 + cf * 3266489917 + 31) % 983
        m4 = (d * 48271 + cf * 668265263 + 7) % 991
        return (m1 + m2 * rr * rr + m3 * cc * cc + m4 * rr * cc) % 250 + delta

    # the real GIF decode returns the closed form exactly, per frame
    frames7 = decode_gif_frames(by_id[7])
    assert len(frames7) == 4
    for g, img in enumerate(frames7):
        assert np.array_equal(img[:, :, 0].astype(np.int64), gray(7, g, 0))
    # the planted copy of 11: content frames 1..4, every pixel +2
    frames_cp = decode_gif_frames(by_id[1_000_011])
    for g, img in enumerate(frames_cp):
        assert np.array_equal(
            img[:, :, 0].astype(np.int64), gray(11, g + 1, 2)
        )
    # exactly 3 of the copy's frames equal a source frame up to the
    # shift; frame 3 (content 4) matches nothing in the source
    src = [f[:, :, 0].astype(int) for f in decode_gif_frames(by_id[11])]
    matches = sum(
        1
        for cp in (f[:, :, 0].astype(int) for f in frames_cp)
        for s in src
        if np.abs(cp - s).sum() <= 144
    )
    assert matches == 3

    # the full pipeline drops exactly the planted ids
    dups = _video_fp_dup_ids(
        M.decode_gray_frame_pixels(M.synthesize_video_clips(docs))
    )
    got = {r.clip_id for r in dups.collect()}
    assert got == {1_000_000, 1_000_011, 1_000_022, 1_000_033}


def test_multimodal_prep_av_gates_compose(spark):
    """The all-modality capstone keep-list is the AND of the four
    modality gates, and each gate visibly removes documents at this
    scale."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.queries.dedup_q import (
        q_pipeline_multimodal_prep_av,
    )

    out = q_pipeline_multimodal_prep_av(
        spark, "/root/testdata/sf0.001"
    ).cache()
    agg = out.agg(
        F.sum("text_keep").alias("t"),
        F.sum("image_keep").alias("i"),
        F.sum("audio_keep").alias("a"),
        F.sum("video_keep").alias("v"),
        F.sum("keep").alias("k"),
        F.count("*").alias("n"),
    ).first()
    assert agg.n == 500
    # every gate drops someone, and the final keep is strictly under
    # the loosest single gate (the gates compose)
    assert agg.t < agg.n and agg.i < agg.n and agg.a < agg.n
    assert agg.v < agg.n
    # the video gate drops exactly the doc_id % 13 == 0 cohort (>= 1)
    assert agg.n - agg.v == sum(
        1 for d in range(500) if d % 13 == 0 and d >= 1
    )
    assert agg.k < min(agg.t, agg.i, agg.a, agg.v) or agg.k == 0
    bad = out.filter(
        F.col("keep")
        != ((F.col("text_keep") == 1) & (F.col("image_keep") == 1)
            & (F.col("audio_keep") == 1) & (F.col("video_keep") == 1)
            ).cast("int")
    ).count()
    assert bad == 0


def test_mm_phash_incremental_decisions(spark):
    """The incremental image dedup's decision histogram matches the
    fixture's construction: every doc_id % 5 == 0 batch image is a
    dup_of_corpus with rep = its corpus image; every % 5 == 2 image
    whose predecessor exists is the larger side of an in-batch pair;
    the rest keep.  The corpus fingerprint checkpoint holds bands
    only — no pixels, no payloads."""
    import os

    import pyarrow.parquet as papq

    from cassandra2aerospike_spark.queries.dedup_q import (
        QUERIES, _ckpt_dir,
    )

    sf = "/root/testdata/sf0.001"
    out = QUERIES["mm_phash_incremental"](spark, sf).cache()
    rows = {r["img_id"]: r for r in out.collect()}
    n_docs = len(rows)
    for d in range(n_docs):
        r = rows[2_000_000 + d]
        if d % 5 == 0:
            assert r["decision"] == "dup_of_corpus" and r["dup_of"] == d
        elif d % 5 == 2 and d >= 1:
            # the larger side of the (d-1, d) in-batch pair
            assert r["decision"] == "dup_in_batch"
            assert r["dup_of"] == 2_000_000 + d - 1
        else:
            assert r["decision"] == "keep" and r["dup_of"] is None
    out.unpersist()
    # the fingerprint store is bands-only (4 ints + id per image)
    ckpt = _ckpt_dir(sf, "phash_fp")
    schema = papq.read_schema(
        next(
            os.path.join(ckpt, f)
            for f in os.listdir(ckpt)
            if f.endswith(".parquet")
        )
    )
    assert set(schema.names) == {"img_id", "bands"}


def test_pipeline_length_buckets_efficiency(spark):
    """Length bucketing: bucket sizes are exact ceil-quartiles of the
    corpus, every bucket's pad target is its own max, and the buckets'
    total padded compute is strictly below the unbucketed baseline —
    the efficiency claim the row exists to measure."""
    from cassandra2aerospike_spark.queries.text_q import QUERIES

    rows = {
        r["bucket"]: r
        for r in QUERIES["pipeline_length_buckets"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {-1, 0, 1, 2, 3}
    base = rows[-1]
    n = base["n_docs"]
    # quartile allocation: cumulative doc counts hit the ceil targets
    cum = 0
    for b in range(3):
        cum += rows[b]["n_docs"]
        assert cum >= (n * (b + 1) + 3) // 4
        # and not overshooting past the next value class: removing the
        # bucket's longest length class would drop below the target
        assert cum - rows[b]["n_docs"] < (n * (b + 1) + 3) // 4
    assert sum(rows[b]["n_docs"] for b in range(4)) == n
    # caps ascend and the global cap is bucket 3's
    assert rows[0]["cap"] <= rows[1]["cap"] <= rows[2]["cap"] <= rows[3]["cap"]
    assert rows[3]["cap"] == base["cap"]
    # the measured win: bucketed padding strictly cheaper
    bucketed_padded = sum(rows[b]["padded"] for b in range(4))
    assert bucketed_padded < base["padded"]
    assert all(rows[b]["waste_bp"] <= base["waste_bp"] for b in range(4))


def test_mm_audio_fp_incremental_decisions(spark):
    """The incremental audio dedup's decision histogram matches the
    fixture: % 5 == 0 clips are loudness-scaled corpus copies
    (dup_of_corpus, rep = the corpus clip), % 5 == 2 clips are the
    larger side of an in-batch pair, the rest keep.  The fingerprint
    checkpoint holds bands + zero-crossing count only."""
    import os

    import pyarrow.parquet as papq

    from cassandra2aerospike_spark.queries.dedup_q import (
        QUERIES, _ckpt_dir,
    )

    sf = "/root/testdata/sf0.001"
    out = QUERIES["mm_audio_fp_incremental"](spark, sf).cache()
    rows = {r["clip_id"]: r for r in out.collect()}
    n_docs = len(rows)
    for d in range(n_docs):
        r = rows[2_000_000 + d]
        if d % 5 == 0:
            assert r["decision"] == "dup_of_corpus" and r["dup_of"] == d
        elif d % 5 == 2 and d >= 1:
            assert r["decision"] == "dup_in_batch"
            assert r["dup_of"] == 2_000_000 + d - 1
        else:
            assert r["decision"] == "keep" and r["dup_of"] is None
    out.unpersist()
    ckpt = _ckpt_dir(sf, "audio_fp")
    schema = papq.read_schema(
        next(
            os.path.join(ckpt, f)
            for f in os.listdir(ckpt)
            if f.endswith(".parquet")
        )
    )
    assert set(schema.names) == {"clip_id", "bands", "zc"}
