"""Typed marshal decode layer (functions/marshal.py, round 11): the
seven classes beyond the reference's enum (SSTableSchema.cpp:23-77) —
Short/Byte/SimpleDate/Time/Integer(varint)/Decimal/InetAddress — decode
from wire bytes through pure Catalyst expressions.  Edge values pinned
per type + hypothesis round-trips for the variable-width encodings."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra2aerospike_spark.functions import marshal as M


def enc_varint(v: int) -> bytes:
    """Minimal big-endian two's-complement (Cassandra IntegerType /
    BigInteger.toByteArray) — the fixture builders' twin."""
    n = 1
    while not (-(1 << (8 * n - 1)) <= v < (1 << (8 * n - 1))):
        n += 1
    return v.to_bytes(n, "big", signed=True)


def _decode(spark, rows):
    """rows: (type_tag, wire_bytes, expected_string); run every tagged
    decoder and compare as strings."""
    df = spark.createDataFrame(rows, "t string, v binary, want string")
    v = F.col("v")
    got = (
        F.when(F.col("t") == "short", M.decode_short(v).cast("string"))
        .when(F.col("t") == "byte", M.decode_byte(v).cast("string"))
        .when(F.col("t") == "varint", M.decode_varint(v).cast("string"))
        .when(F.col("t") == "date", M.decode_simple_date(v).cast("string"))
        .when(F.col("t") == "time", M.decode_time(v).cast("string"))
        .when(F.col("t") == "dec", M.decode_decimal_str(v))
        .when(F.col("t") == "inet", M.decode_inet_str(v))
    )
    return df.select("t", "want", got.alias("got")).filter(
        F.col("got") != F.col("want")
    ).collect()


def test_marshal_edge_values(spark):
    rows = []
    for v in (-32768, -1, 0, 1, 32767, 255, -256):
        rows.append(("short", ((v & 0xFFFF)).to_bytes(2, "big"), str(v)))
    for v in (-128, -1, 0, 127):
        rows.append(("byte", ((v & 0xFF)).to_bytes(1, "big"), str(v)))
    for v in (0, 1, -1, 127, 128, -128, -129, 2**31, -(2**31),
              2**62, -(2**62), 2**63 - 1, -(2**63)):
        rows.append(("varint", enc_varint(v), str(v)))
    for v in (-20000, 0, 19999, -1, -(2**31), 2**31 - 1):
        rows.append(("date", (v + 2**31).to_bytes(4, "big"), str(v)))
    for v in (0, 1, 86_399_999_999_999):
        rows.append(("time", v.to_bytes(8, "big"), str(v)))
    for s, u in ((3, -12345), (3, 5), (3, 0), (0, 42), (2, -100),
                 (5, 123), (9, -(2**62))):
        a = abs(u)
        want = (
            ("-" if u < 0 else "")
            + str(a // 10**s)
            + (("." + str(a % 10**s).zfill(s)) if s > 0 else "")
        )
        rows.append(("dec", s.to_bytes(4, "big") + enc_varint(u), want))
    for b in (bytes([192, 168, 1, 255]), bytes(4), bytes(range(16)),
              b"\xff" * 16):
        if len(b) == 4:
            want = ".".join(str(x) for x in b)
        else:
            want = ":".join(b.hex()[i : i + 4] for i in range(0, 32, 4))
        rows.append(("inet", b, want))
    bad = _decode(spark, rows)
    assert bad == [], bad


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=30,
    )
)
def test_varint_roundtrip_property(spark_session_hyp, vals):
    rows = [("varint", enc_varint(v), str(v)) for v in vals]
    assert _decode(spark_session_hyp, rows) == []


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=-(2**62), max_value=2**62),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_decimal_string_roundtrip_property(spark_session_hyp, pairs):
    rows = []
    for s, u in pairs:
        a = abs(u)
        want = (
            ("-" if u < 0 else "")
            + str(a // 10**s)
            + (("." + str(a % 10**s).zfill(s)) if s > 0 else "")
        )
        rows.append(("dec", s.to_bytes(4, "big") + enc_varint(u), want))
    assert _decode(spark_session_hyp, rows) == []


@pytest.fixture(scope="module")
def spark_session_hyp(spark):
    # hypothesis forbids function-scoped fixtures; alias the session
    return spark
