"""Pure-Python Zstandard codec (zstd_py, round 11): RFC 8878 frame
round-trips, XXH64 vectors, corrupt-input uniformity, and — the strong
check — BIDIRECTIONAL interop with the reference C implementation
(zstd-jni, bundled in Spark's JVM): frames this encoder writes must
decode with real zstd, and frames real zstd writes at levels that
exercise Huffman literals / FSE-compressed tables / repcodes / 4-stream
literals must decode here."""

from __future__ import annotations

import os
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra2aerospike_spark.sources.sstable import zstd_py as z

# ------------------------------------------------------------- xxh64


def test_xxh64_known_vectors():
    # the two published vectors (Cyan4973/xxHash README + test suite)
    assert z.xxh64(b"") == 0xEF46DB3751D8E999
    assert z.xxh64(b"abc") == 0x44BC2CF5AD770999


# --------------------------------------------------------- roundtrip


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"a",
        b"abc",
        bytes(1000),  # RLE block
        b"ab" * 50000,  # short-period overlap matches
        b"The quick brown fox jumps over the lazy dog. " * 4000,
        os.urandom(100),  # incompressible, short
        os.urandom(100_000),  # incompressible -> raw blocks
        bytes(random.Random(0).choices(b"abcd", k=300_000)),  # multi-block
    ],
)
def test_roundtrip_cases(payload):
    frame = z.compress(payload)
    assert z.decompress(frame) == payload


@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=4096))
def test_roundtrip_property_random(data):
    assert z.decompress(z.compress(data)) == data


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.binary(min_size=1, max_size=24), st.integers(1, 400)),
        min_size=1,
        max_size=20,
    )
)
def test_roundtrip_property_repetitive(runs):
    """Repetition-heavy inputs: long matches, long literal runs, every
    LL/ML/OF code band, block boundaries when the tiling grows large."""
    data = b"".join(chunk * reps for chunk, reps in runs)
    assert z.decompress(z.compress(data)) == data


def test_frame_concatenation_decodes_as_one():
    a, b = b"alpha" * 100, os.urandom(64)
    assert z.decompress(z.compress(a) + z.compress(b)) == a + b


def test_skippable_frame_is_skipped():
    payload = b"payload" * 50
    skippable = (0x184D2A50).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"meta"
    assert z.decompress(skippable + z.compress(payload)) == payload


# ------------------------------------------------- corrupt inputs


def test_corrupt_inputs_fail_uniformly():
    frame = bytearray(z.compress(b"The quick brown fox. " * 500))
    with pytest.raises(ValueError, match="magic"):
        z.decompress(b"\x00\x01\x02\x03" + bytes(frame[4:]))
    with pytest.raises(ValueError):
        z.decompress(bytes(frame[:-6]))  # truncated mid-checksum/block
    # flip one content byte: either the block grammar breaks (ValueError
    # from a bounds check) or the XXH64 content checksum catches it
    for pos in (len(frame) // 2, len(frame) - 5, 10):
        bad = bytearray(frame)
        bad[pos] ^= 0x55
        with pytest.raises(ValueError):
            z.decompress(bytes(bad))


def test_checksum_flip_detected():
    frame = bytearray(z.compress(b"x" * 100))
    frame[-1] ^= 1  # the stored XXH64 low-32 tail
    with pytest.raises(ValueError, match="checksum"):
        z.decompress(bytes(frame))


# ------------------------------------------------- zstd-jni interop


class _JZstd:
    """Plain-Python wrapper over the zstd-jni class: the py4j JavaClass
    proxy raises Py4JError (not AttributeError) on unknown attributes,
    which breaks hypothesis's fixture introspection."""

    def __init__(self, cls):
        self._cls = cls

    def compress(self, data: bytes, level: int) -> bytes:
        return bytes(self._cls.compress(bytearray(data), level))

    def decompress(self, frame: bytes, n: int) -> bytes:
        return bytes(self._cls.decompress(bytearray(frame), n))


@pytest.fixture(scope="module")
def jzstd(spark):
    """The reference C zstd via Spark's bundled zstd-jni."""
    try:
        cls = spark.sparkContext._jvm.com.github.luben.zstd.Zstd
        cls.compress(bytearray(b"probe"), 1)  # force native-lib load
    except Exception:  # pragma: no cover - environment-dependent
        pytest.skip("zstd-jni not loadable in this JVM")
    return _JZstd(cls)


def test_interop_real_zstd_decodes_our_frames(jzstd):
    random.seed(2)
    cases = [
        b"hello world " * 3,
        bytes(5000),
        os.urandom(4096),
        b"The quick brown fox. " * 5000,
        bytes(random.choices(b"abcdefgh \n", k=200_000)),
    ]
    for payload in cases:
        assert jzstd.decompress(z.compress(payload), len(payload)) == payload


def test_interop_we_decode_real_zstd_frames(jzstd):
    """Levels 1..19 route real zstd through Huffman-compressed literals
    (1- and 4-stream), FSE_Compressed/RLE/Repeat sequence tables and
    repcodes — the decoder paths our own encoder never emits."""
    random.seed(3)
    cases = [
        b"hello world " * 3,
        bytes(5000),
        os.urandom(4096),
        b"The quick brown fox. " * 5000,
        bytes(random.choices(b"abcdefgh \n", k=200_000)),
        b"".join(
            b"row %d: value=%d\n" % (i, i * i % 97) for i in range(20_000)
        ),
    ]
    for payload in cases:
        for level in (1, 3, 9, 19):
            assert z.decompress(jzstd.compress(payload, level)) == payload


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(data=st.binary(max_size=2048), level=st.sampled_from([1, 3, 9, 19]))
def test_interop_property_real_frames_decode_here(jzstd, data, level):
    assert z.decompress(jzstd.compress(data, level)) == data


# ------------------------------------- sstable chunk-layer integration


def test_ma_table_zstd_chunks_roundtrip(tmp_path):
    """A real ma sstable written with ZstdCompressor chunks reads back
    partition-exactly (the Cassandra 4.0+ codec the reference cannot
    dispatch, Buffer.cpp:243-272)."""
    from cassandra2aerospike_spark.sources.sstable import ma_format as MA
    from cassandra2aerospike_spark.sources.sstable.format import Cell, Partition

    d = str(tmp_path / "ks" / "t_zstd")
    w = MA.MaWriter(
        d, 1, [("alpha", "UTF8Type"), ("beta", "UTF8Type")],
        codec_class="ZstdCompressor", chunk_size=512,
    )
    parts = [
        Partition(
            key=f"key{i:03d}".encode(),
            cells=[
                Cell("alpha", f"v{i}".encode(), ts=1000 + i),
                Cell("beta", f"w{i * 7}".encode(), ts=2000 + i),
            ],
        )
        for i in range(50)
    ]
    for p in parts:
        w.add(p)
    w.finish()
    got = {p.key: p for _t, p in MA.MaReader(d, 1).partitions()}
    assert len(got) == 50
    for want in parts:
        have = got[want.key]
        assert [(c.col_name, c.value, c.ts) for c in have.cells] == [
            (c.col_name, c.value, c.ts) for c in want.cells
        ]


def test_ma_zstd_chunk_corruption_detected(tmp_path):
    """Corruption matrix, zstd edition: a flipped Data.db byte fails the
    era's CRC32-of-compressed BEFORE decompression; with verification
    off the codec's own frame integrity (grammar bounds or the XXH64
    content checksum) still refuses the chunk."""
    from cassandra2aerospike_spark.sources.sstable import ma_format as MA
    from cassandra2aerospike_spark.sources.sstable.format import Cell, Partition

    d = str(tmp_path / "ks" / "t_zc")
    w = MA.MaWriter(
        d, 1, [("alpha", "UTF8Type")], codec_class="ZstdCompressor",
        chunk_size=512,
    )
    for i in range(80):
        w.add(Partition(key=f"key{i:03d}".encode(),
                        cells=[Cell("alpha", os.urandom(24).hex().encode(), ts=i)]))
    w.finish()
    path = os.path.join(d, "ma-1-big-Data.db")
    blob = bytearray(open(path, "rb").read())
    blob[len(blob) // 2] ^= 0x55
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum mismatch"):
        list(MA.MaReader(d, 1).partitions())
    with pytest.raises(ValueError, match="zstd"):
        list(MA.MaReader(d, 1, verify_checksums=False).partitions())


# --------------------------------------- round-11 Huffman-literal paths


@pytest.mark.parametrize(
    "payload",
    [
        bytes(random.Random(11).choices(b"abcdefgh \n", k=120_000)),
        bytes(random.Random(12).choices(bytes(range(200)), k=90_000)),  # FSE weights
        bytes(random.Random(13).choices(b"aab", k=6_000)),  # majority symbol
        bytes(random.Random(14).choices(b"xy", k=40)),  # tiny 1-stream
        b"".join(b"log line %d severity=%d\n" % (i, i % 7) for i in range(9_000)),
    ],
)
def test_huffman_literal_roundtrip_and_ratio(payload):
    """The encoder's Huffman-literal paths (direct and FSE-compressed
    weights, 1- and 4-stream) round-trip and actually compress skewed
    byte distributions."""
    frame = z.compress(payload)
    assert z.decompress(frame) == payload
    if len(payload) >= 6_000:
        assert len(frame) < len(payload)  # Huffman engaged


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(min_value=2, max_value=250),
    st.integers(min_value=64, max_value=20_000),
    st.integers(min_value=0, max_value=2**32),
)
def test_huffman_roundtrip_property_skewed(n_syms, n, seed):
    """Property over skewed alphabets of every width (narrow alphabets
    ride direct weights, wide ones the FSE-compressed weight stream;
    zipf-ish skew makes Huffman engage)."""
    rng = random.Random(seed)
    alphabet = bytes(range(n_syms))
    weights = [1.0 / (i + 1) for i in range(n_syms)]
    data = bytes(rng.choices(alphabet, weights=weights, k=n))
    assert z.decompress(z.compress(data)) == data
