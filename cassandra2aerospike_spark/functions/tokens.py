"""Token / partitioner functions (SURVEY.md §2.8 P1-P4).

The reference orders its entire merge by token(key) with pluggable
partitioners (/root/reference/Partitioners.hpp:23-32).  Here:

  * murmur3_token — Cassandra-compatible Murmur3 (P1): 128-bit x64
    Murmur3's h1 as a signed int64, reproducing the Java quirks the
    reference documents (sign-extended tail bytes; MIN_LONG -> MAX_LONG
    clamp, Partitioners.cpp:77-79, 184-185).  The one computation Spark
    has no built-in for (F.hash is 32-bit Murmur3, xxhash64 differs) —
    implemented as an Arrow-batched pandas UDF.
  * md5_token — RandomPartitioner (P2): md5 hex digest (ordering on the
    hex string == ordering on the unsigned 128-bit value).
  * identity token — ByteOrdered (P3): the key itself.

Fixture queries use md5/byte-ordered for oracle checks; murmur3 is
validated against published Cassandra test vectors in tests/.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def _signed_byte(b: int) -> int:
    """Cassandra's Java reads tail bytes as SIGNED — the documented
    incompatibility with reference C implementations."""
    return b - 256 if b >= 128 else b


def murmur3_128_pair(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Cassandra-flavored Murmur3 x64-128: BOTH output words as signed
    int64s, exactly as Java's `MurmurHash.hash3_x64_128` returns them.
    The partitioner token is h1 with the MIN_LONG clamp
    (`murmur3_128_h1`); the Filter.db bloom filter consumes the raw
    (h1, h2) pair WITHOUT the clamp (BloomFilter hashes through the
    same sign-bugged routine the reference documents at
    Partitioners.cpp:77-79 but never applies the partitioner clamp)."""
    h1 = h2 = seed & _MASK
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o : o + 8], "little")
        k2 = int.from_bytes(data[o + 8 : o + 16], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    tl = len(tail)
    # sign-extended tail bytes (Java semantics)
    for i in range(tl - 1, 7, -1):
        k2 ^= (_signed_byte(tail[i]) << ((i - 8) * 8)) & _MASK
        k2 &= _MASK
    if tl > 8:
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    for i in range(min(tl, 8) - 1, -1, -1):
        k1 ^= (_signed_byte(tail[i]) << (i * 8)) & _MASK
        k1 &= _MASK
    if tl > 0:
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    # to signed int64 (Java long semantics)
    h1 = h1 - (1 << 64) if h1 >= (1 << 63) else h1
    h2 = h2 - (1 << 64) if h2 >= (1 << 63) else h2
    return h1, h2


def murmur3_128_h1(data: bytes, seed: int = 0) -> int:
    """Cassandra-flavored Murmur3 x64-128, returning h1 (the token)."""
    h1, _h2 = murmur3_128_pair(data, seed)
    # Cassandra clamp: MIN_LONG is reserved for the minimum token
    if h1 == -(1 << 63):
        h1 = (1 << 63) - 1
    return h1


@F.pandas_udf(T.LongType())
def murmur3_token(keys: pd.Series) -> pd.Series:
    """P1: Cassandra Murmur3Partitioner token of a binary/string key."""
    def tok(v) -> int:
        if v is None:
            return None
        b = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
        return murmur3_128_h1(bytes(b))

    return keys.map(tok)


def md5_token(key: Column) -> Column:
    """P2 RandomPartitioner analog: md5 hex digest (hex-string order ==
    unsigned 128-bit numeric order, so ORDER BY works directly)."""
    return F.md5(key.cast("string"))


def byte_ordered_token(key: Column) -> Column:
    """P3 ByteOrderedPartitioner: the key bytes themselves."""
    return key.cast("string")


# ------------------------------------------------------------ P4: registry

# Partitioner registry (P4): fully-qualified Cassandra class name ->
# token column function, mirroring the reference's name dispatch
# (Partitioners.cpp:247-288).  Unknown names raise, matching its abort.
PARTITIONERS = {
    "org.apache.cassandra.dht.Murmur3Partitioner": murmur3_token,
    "org.apache.cassandra.dht.RandomPartitioner": md5_token,
    "org.apache.cassandra.dht.ByteOrderedPartitioner": byte_ordered_token,
    "org.apache.cassandra.dht.OrderPreservingPartitioner": byte_ordered_token,
}

# pre-"hc" format versions carry no partitioner name; the reference
# defaults to RandomPartitioner (SSTable.cpp:332-334)
DEFAULT_PARTITIONER = "org.apache.cassandra.dht.RandomPartitioner"


def partitioner_for(name: str | None):
    """Resolve a partitioner by class name (None -> the pre-'hc' default).
    Short names ('murmur3', 'random', 'byteordered') also accepted."""
    if name is None:
        name = DEFAULT_PARTITIONER
    if name in PARTITIONERS:
        return PARTITIONERS[name]
    short = {
        "murmur3": murmur3_token,
        "random": md5_token,
        "byteordered": byte_ordered_token,
    }
    if name.lower() in short:
        return short[name.lower()]
    raise ValueError(f"unknown partitioner: {name!r}")
