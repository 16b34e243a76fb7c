"""Filter.db bloom filters for >= ma sstables (operator O2 extension).

Every real Cassandra sstable ships a `-Filter.db` sidecar — a bloom
filter over the file's partition keys consulted before any Index.db
work on a point read.  The reference never opens it (its sidecar set is
Statistics/Index/Summary/CompressionInfo only — CassandraParser.cpp:35,
140-143; SSTable.cpp:40-42 — so every `find()` pays the Summary+Index
probe on every sstable, CassandraParser.cpp:196-216).  This engine
writes and reads the filter and uses it at PLANNING time: a key-lookup
scan (`lookup_keys` reader option, the Spark analog of the reference's
`find()` / `-S` resume key) prunes whole sstables whose filter proves
none of the requested keys can be present — zero false negatives by
construction, false positives only cost a wasted Index probe.

On-disk shape (the >= ma `BloomFilterSerializer` layout, public
Cassandra serializer: hashCount, then the bitset as a word count plus
big-endian longs):

    int32 BE  hashCount
    int32 BE  wordCount
    int64 BE  words[wordCount]

Bit addressing within a word is this engine's own convention (bit b ->
word b >> 6, bit b & 63) — writer and reader share it, and the sidecar
is engine-internal the way SGR runs are.  Hashing is the Cassandra
scheme: (h1, h2) = MurmurHash.hash3_x64_128(key, seed=0) — the SAME
sign-bugged Java Murmur3 the partitioner uses (Partitioners.cpp:77-79)
but WITHOUT the MIN_LONG token clamp — and probe i addresses bit
abs((h1 + i*h2) mod numBits) under Java truncated-division semantics
(BloomFilter.indexes / setIndexes upstream).
"""

from __future__ import annotations

import math
import struct

_U64 = 0xFFFFFFFFFFFFFFFF


def _signed64(v: int) -> int:
    v &= _U64
    return v - (1 << 64) if v >= (1 << 63) else v


def bloom_indexes(key: bytes, hash_count: int, num_bits: int) -> list[int]:
    """Probe bit indexes for `key`: abs_java((h1 + i*h2) mod_trunc bits).
    For bits > 0, |a mod_trunc b| == |a| mod b, which is what Python's
    `%` gives on the absolute value."""
    from ...functions.tokens import murmur3_128_pair

    h1, h2 = murmur3_128_pair(key)
    out = []
    base = h1
    for _ in range(hash_count):
        out.append(abs(base) % num_bits)
        base = _signed64(base + h2)
    return out


class BloomFilter:
    """Fixed-size bloom filter over partition keys.

    Sized from (expected keys, fp_chance) with the standard formulas
    m = -n*ln(p)/ln(2)^2 and k = round(m/n * ln 2) — the same math
    Cassandra's BloomCalculations tabulates.  fp_chance defaults to the
    0.01 the writer already records in the VALIDATION section."""

    def __init__(self, hash_count: int, num_bits: int):
        if hash_count < 1 or num_bits < 64:
            raise ValueError("bloom: hash_count >= 1 and num_bits >= 64 required")
        self.hash_count = hash_count
        # round up to whole 64-bit words
        self.num_bits = (num_bits + 63) & ~63
        self._words = bytearray(self.num_bits // 8)

    @classmethod
    def sized_for(cls, n_keys: int, fp_chance: float = 0.01) -> "BloomFilter":
        n = max(1, n_keys)
        m = max(64, int(math.ceil(-n * math.log(fp_chance) / (math.log(2) ** 2))))
        k = max(1, round(m / n * math.log(2)))
        return cls(k, m)

    def add(self, key: bytes) -> None:
        for b in bloom_indexes(key, self.hash_count, self.num_bits):
            self._words[b >> 3] |= 1 << (b & 7)

    def might_contain(self, key: bytes) -> bool:
        return all(
            self._words[b >> 3] & (1 << (b & 7))
            for b in bloom_indexes(key, self.hash_count, self.num_bits)
        )

    def serialize(self) -> bytes:
        n_words = len(self._words) // 8
        out = bytearray(struct.pack(">ii", self.hash_count, n_words))
        for i in range(n_words):
            # bit b&63 little within the word: assemble LE, emit BE long
            out += struct.pack(
                ">q", _signed64(int.from_bytes(self._words[i * 8 : i * 8 + 8], "little"))
            )
        return bytes(out)

    @classmethod
    def deserialize(cls, buf: bytes) -> "BloomFilter":
        if len(buf) < 8:
            raise ValueError("bloom: Filter.db truncated (missing header)")
        hash_count, n_words = struct.unpack_from(">ii", buf, 0)
        if hash_count < 1 or n_words < 1:
            raise ValueError(
                f"bloom: implausible Filter.db header "
                f"(hashCount={hash_count}, words={n_words})"
            )
        if len(buf) != 8 + 8 * n_words:
            raise ValueError(
                f"bloom: Filter.db length {len(buf)} != header-declared "
                f"{8 + 8 * n_words}"
            )
        bf = cls(hash_count, n_words * 64)
        for i in range(n_words):
            (w,) = struct.unpack_from(">q", buf, 8 + 8 * i)
            bf._words[i * 8 : i * 8 + 8] = (w & _U64).to_bytes(8, "little")
        return bf

    @classmethod
    def load(cls, path: str) -> "BloomFilter":
        with open(path, "rb") as f:
            return cls.deserialize(f.read())
