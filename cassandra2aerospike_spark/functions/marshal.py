"""Typed marshal-value DECODE as Catalyst column expressions (round 11).

Cassandra's serialization header names each column's marshal class; the
reference's dispatch stops at text/long/int32/bool/float/timestamp/uuid
and treats everything else as an opaque blob (SSTableSchema.cpp:23-77,
COLUMN_UNKNOWN) — so `DecimalType`, `IntegerType` (varint),
`InetAddressType`, `SimpleDateType`, `TimeType`, `ShortType` and
`ByteType` columns ship as undecoded bytes.  These helpers turn the raw
cell value bytes of those seven types into comparable Spark values —
pure built-in expressions (hex/conv/substring/concat), JVM-side inside
whole-stage codegen, no UDFs — so the decode scales like any other
projection.

Wire formats (Cassandra `org.apache.cassandra.db.marshal.*`):
  ShortType      2-byte big-endian signed      (fixed width)
  ByteType       1-byte signed                 (fixed width)
  SimpleDateType 4-byte big-endian UNSIGNED days, epoch at 2^31
  TimeType       8-byte big-endian nanoseconds since midnight
  IntegerType    minimal big-endian two's-complement (varint)
  DecimalType    4-byte big-endian scale + varint unscaled value
  InetAddressType raw 4 (IPv4) or 16 (IPv6) address bytes
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _be_unsigned(col: Column) -> Column:
    """Big-endian bytes -> unsigned integer (as decimal(20,0): 8-byte
    values exceed signed long range before sign correction)."""
    return F.conv(F.hex(col), 16, 10).cast("decimal(20,0)")


def _first_byte(col: Column) -> Column:
    return F.conv(F.hex(F.substring(col, 1, 1)), 16, 10).cast("int")


def decode_short(col: Column) -> Column:
    u = _be_unsigned(col).cast("long")
    return F.when(u >= 1 << 15, u - (1 << 16)).otherwise(u)


def decode_byte(col: Column) -> Column:
    u = _be_unsigned(col).cast("long")
    return F.when(u >= 1 << 7, u - (1 << 8)).otherwise(u)


def decode_simple_date(col: Column) -> Column:
    """Days relative to 1970-01-01 (the stored value is unsigned with
    the epoch centered at 2^31 so pre-epoch dates sort below it)."""
    return (_be_unsigned(col) - F.lit(1 << 31)).cast("long")


def decode_time(col: Column) -> Column:
    """Nanoseconds since midnight (always < 2^47, so the long is safe)."""
    return _be_unsigned(col).cast("long")


def decode_varint(col: Column) -> Column:
    """Minimal big-endian two's-complement -> signed long.  Supports up
    to 8 stored bytes (beyond-int64 varints exist in CQL but have no
    lossless Spark integral type; callers needing them should keep the
    bytes and compare hex)."""
    u = _be_unsigned(col)
    bias = F.when(
        _first_byte(col) < 128, F.lit(0).cast("decimal(20,0)")
    )
    for n in range(1, 9):
        # string literal: 2^64 exceeds the py4j long, decimal carries it
        bias = bias.when(
            F.length(col) == n, F.lit(str(1 << (8 * n))).cast("decimal(20,0)")
        )
    return (u - bias).cast("long")


def decode_decimal_str(col: Column) -> Column:
    """DecimalType bytes -> canonical plain string (sign, integer part
    with no leading zeros, '.', exactly `scale` fraction digits).
    String assembly is integer-only — no float formatting — so the
    value is exact at any magnitude the varint fits."""
    scale = _be_unsigned(F.substring(col, 1, 4)).cast("int")
    unscaled = decode_varint(col.substr(F.lit(5), F.length(col) - 4))
    a = F.abs(unscaled)
    digits = a.cast("string")
    width = F.greatest(F.length(digits), scale + 1)
    padded = F.lpad(digits, width, "0")
    int_part = padded.substr(F.lit(1), F.length(padded) - scale)
    frac_part = padded.substr(F.length(padded) - scale + 1, scale)
    return F.concat(
        F.when(unscaled < 0, F.lit("-")).otherwise(F.lit("")),
        int_part,
        F.when(scale > 0, F.concat(F.lit("."), frac_part)).otherwise(F.lit("")),
    )


def decode_inet_str(col: Column) -> Column:
    """InetAddressType bytes -> canonical string: IPv4 dotted quad, or
    IPv6 as eight full lowercase 4-hex-digit groups (the uncompressed
    form — '::' zero-run compression is a display choice; full groups
    are unambiguous and cheap to compute on both engines)."""
    h = F.lower(F.hex(col))
    octet = lambda i: F.conv(F.substring(h, 1 + 2 * i, 2), 16, 10)  # noqa: E731
    ipv4 = F.concat_ws(".", octet(0), octet(1), octet(2), octet(3))
    ipv6 = F.concat_ws(
        ":", *[F.substring(h, 1 + 4 * g, 4) for g in range(8)]
    )
    return F.when(F.length(col) == 4, ipv4).otherwise(ipv6)
