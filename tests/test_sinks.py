"""Sink tests (S11-S13): create-only semantics, bounded-async writer,
dry-run format, streaming foreachBatch checkpoint resume (O3)."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from cassandra2aerospike_spark.operators import merge
from cassandra2aerospike_spark.sinks import (
    bounded_async_foreach_writer,
    create_only_append,
    dry_run,
)
from cassandra2aerospike_spark.sources import load_table


def _records(spark, rows):
    return spark.createDataFrame(rows, "key long, value double")


def test_create_only_append_never_overwrites(spark):
    sink = tempfile.mkdtemp(prefix="kv_sink_")
    r1 = create_only_append(_records(spark, [(1, 1.0), (2, 2.0)]), sink)
    assert r1 == {"read": 2, "written": 2, "already_existing": 0}
    # second batch: key 2 exists (new value must NOT replace), key 3 is new
    r2 = create_only_append(_records(spark, [(2, 99.0), (3, 3.0)]), sink)
    assert r2 == {"read": 2, "written": 1, "already_existing": 1}
    final = {r.key: r.value for r in spark.read.parquet(sink).collect()}
    assert final == {1: 1.0, 2: 2.0, 3: 3.0}  # key 2 kept its ORIGINAL value


def test_bounded_async_writer_applies_backpressure(spark):
    # foreachPartition runs in a separate Python worker process, so the
    # fake client reports observations through the shared filesystem
    log_path = os.path.join(tempfile.mkdtemp(prefix="sink_log_"), "writes.csv")
    state = {"depth": 0, "max": 0}

    def put(row):
        state["depth"] += 1
        state["max"] = max(state["max"], state["depth"])
        return row

    def wait(handle):
        state["depth"] -= 1
        with open(log_path, "a") as f:
            f.write(f"{handle['key']},{state['max']}\n")
        return True

    df = _records(spark, [(i, float(i)) for i in range(50)]).coalesce(1)
    bounded_async_foreach_writer(df, put, wait, max_in_flight=5)
    lines = [l.split(",") for l in open(log_path).read().splitlines()]
    assert sorted(int(k) for k, _ in lines) == list(range(50))
    assert max(int(d) for _, d in lines) <= 5  # backpressure held


def test_dry_run_format(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    lines = dry_run(merge.merge_records(ev), limit=3)
    assert lines and lines[0].startswith("key=")
    assert any("=" in l and l.startswith("  ") for l in lines)  # column lines


def test_foreachbatch_checkpoint_resume(spark):
    """O3 analog: a checkpointed stream writing via foreachBatch processes
    each input exactly once across restarts."""
    from cassandra2aerospike_spark.streaming.stream_queries import stream_events

    out_dir = tempfile.mkdtemp(prefix="fb_out_")
    ckpt = tempfile.mkdtemp(prefix="fb_ckpt_")

    def write_batch(batch_df, epoch_id):
        batch_df.select("event_id").write.mode("append").parquet(out_dir)

    def run_once():
        ev = stream_events(spark, "/root/testdata/sf0.001")
        q = (
            ev.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    n1 = spark.read.parquet(out_dir).count()
    run_once()  # restart with same checkpoint: no new data -> no duplicates
    n2 = spark.read.parquet(out_dir).count()
    assert n1 == 1000 and n2 == 1000


def test_aerospike_wire_protocol_roundtrip():
    """AS_MSG framing: build_put's bytes parse back (independent walk)
    to the same namespace/set/digest/bins/ttl/create-only; the digest
    is RIPEMD160(set + particle-type + key) — the C client's as_key
    recipe — and the pure-Python RIPEMD-160 fallback matches OpenSSL
    when OpenSSL has it."""
    import hashlib

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    frame = aw.build_put(
        "tmx", "records", b"user-42",
        {"city": b"ams", "score": b"9.50"}, ttl=300,
    )
    body = frame[8:]
    ns, st, digest, bins, ttl, create_only = aw.parse_put(body)
    assert (ns, st, ttl, create_only) == ("tmx", "records", 300, True)
    assert bins == {"city": b"ams", "score": b"9.50"}
    assert digest == aw.key_digest("records", b"user-42")
    assert len(digest) == 20
    try:
        ref = hashlib.new("ripemd160", b"abc").digest()
    except ValueError:
        ref = None
    if ref is not None:
        assert aw._ripemd160_py(b"abc") == ref
        assert aw._ripemd160_py(b"x" * 200) == hashlib.new(
            "ripemd160", b"x" * 200
        ).digest()
    # the RIPEMD-160 published test vector for 'abc'
    assert aw._ripemd160_py(b"abc").hex() == (
        "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc"
    )


def test_aerospike_wire_server_create_only_and_transients():
    """Over a real TCP socket: first create stores, second draws
    KEY_EXISTS (mapped to 'exists', the reference's not-an-error path),
    never-expire ttl survives, and a fail_every server answers
    deterministic TIMEOUTs mapped to 'retry' without applying the
    write."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    c = aw.WireClient(srv.host, srv.port, "ns1", "users")
    try:
        assert c.wait(c.put(b"k1", {"v": b"a"}, 120)) == "ok"
        assert c.wait(c.put(b"k1", {"v": b"b"}, 120)) == "exists"
        assert c.wait(c.put(b"k2", {"v": b"c"}, 0xFFFFFFFF)) == "ok"
        store = srv.records()
        d1 = aw.key_digest("users", b"k1")
        d2 = aw.key_digest("users", b"k2")
        assert store[("ns1", "users", d1)] == ({"v": b"a"}, 120)
        assert store[("ns1", "users", d2)] == ({"v": b"c"}, 0xFFFFFFFF)
    finally:
        c.close()
        srv.close()

    srv = aw.WireServer(fail_every=2)
    c = aw.WireClient(srv.host, srv.port, "ns1", "s")
    try:
        out = [c.wait(c.put(b"k%d" % i, {"v": b"x"}, 0)) for i in range(4)]
        assert out == ["ok", "retry", "ok", "retry"]
        assert len(srv.records()) == 2  # failed puts were NOT applied
    finally:
        c.close()
        srv.close()


def test_aerospike_wire_pipelining_order():
    """The bounded-async contract over one socket: N puts issued before
    any wait, responses consumed oldest-first — the send ordinal IS the
    handle, like the C client's pipeline (AerospikeWriter.cpp's
    pipeline_listener)."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    c = aw.WireClient(srv.host, srv.port, "n", "s")
    try:
        handles = [c.put(b"p%03d" % i, {"v": b"%d" % i}, 0) for i in range(64)]
        assert handles == list(range(64))
        assert all(c.wait(h) == "ok" for h in handles)
        # duplicate creates, waited out of order, all map to exists
        h2 = [c.put(b"p%03d" % i, {"v": b"y"}, 0) for i in range(8)]
        assert [c.wait(h) for h in reversed(h2)] == ["exists"] * 8
        assert len(srv.records()) == 64
    finally:
        c.close()
        srv.close()


from hypothesis import given, settings
from hypothesis import strategies as st

_bin_name = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    min_size=1, max_size=15,
)


@settings(max_examples=60, deadline=None)
@given(
    ns=st.text(alphabet="abcdefgh", min_size=1, max_size=12),
    set_name=st.text(alphabet="abcdefgh", min_size=1, max_size=12),
    key=st.binary(min_size=1, max_size=64),
    bins=st.dictionaries(_bin_name, st.binary(max_size=128), min_size=1, max_size=8),
    ttl=st.integers(min_value=0, max_value=0xFFFFFFFF),
    create_only=st.booleans(),
)
def test_aerospike_wire_codec_property(ns, set_name, key, bins, ttl, create_only):
    """Property: build_put -> parse_put is the identity on (namespace,
    set, digest, bins, ttl, create_only) for arbitrary keys/bins —
    the builder and the independent parser agree on the whole message
    grammar, not just on the fixture shapes."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    frame = aw.build_put(ns, set_name, key, bins, ttl, create_only)
    got_ns, got_set, digest, got_bins, got_ttl, got_co = aw.parse_put(frame[8:])
    assert (got_ns, got_set, got_ttl, got_co) == (ns, set_name, ttl, create_only)
    assert got_bins == bins
    assert digest == aw.key_digest(set_name, key)


def test_asb_record_block_grammar_and_parse_roundtrip():
    """record_block -> _parse_asb_file is the identity on (key, gen,
    expiration, bins), the digest line carries the b64 RIPEMD-160 of
    (set + particle + key), and any tampering — digest, bin length,
    foreign namespace/set — raises instead of mis-parsing."""
    import base64

    from cassandra2aerospike_spark.sinks import asb_backup as ab
    from cassandra2aerospike_spark.sinks.aerospike_wire import key_digest

    blk = ab.record_block("tmx", "records", "42", [("click", "1.25"), ("view", "7.00")], 1, 0)
    content = "\n".join(["Version 3.1", "# namespace tmx", "# first-file", blk])
    first, rows = ab._parse_asb_file(content, "tmx", "records")
    assert first is True
    d64 = base64.b64encode(key_digest("records", b"42")).decode()
    assert rows == [("42", d64, 1, 0, [("click", "1.25"), ("view", "7.00")])]
    assert f"+ d {d64}" in blk

    import pytest

    # tampered digest
    bad = content.replace("+ d ", "+ d X", 1)
    with pytest.raises(ValueError, match="digest"):
        ab._parse_asb_file(bad, "tmx", "records")
    # tampered bin length
    bad = content.replace("- S click 4 1.25", "- S click 9 1.25", 1)
    with pytest.raises(ValueError, match="length"):
        ab._parse_asb_file(bad, "tmx", "records")
    # foreign namespace at the meta line
    with pytest.raises(ValueError, match="namespace"):
        ab._parse_asb_file(content, "other", "records")
    # foreign set
    with pytest.raises(ValueError, match="digest|set"):
        ab._parse_asb_file(content, "tmx", "other")
    # missing version line
    with pytest.raises(ValueError, match="version"):
        ab._parse_asb_file(content.split("\n", 1)[1], "tmx", "records")


def test_asb_write_read_roundtrip_distributed(spark, tmp_path):
    """write_asb -> read_asb over a real multi-partition frame: every
    record survives byte-exactly, expirations shift through the
    citrusleaf epoch both ways (0 <-> ETERNAL), and the first-file
    marker lands exactly once across the file series."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.sinks import asb_backup as ab

    rows = [
        (1, {"a": 1.5, "b": 2.25}, merge.ETERNAL),
        (2, {"c": -3.0}, merge.NOW_EPOCH_S + 500),
        (3, {"d": 0.125, "e": 9.0, "f": 1.0}, merge.ETERNAL),
    ]
    df = spark.createDataFrame(
        rows, "key long, columns map<string,double>, expiry long"
    )
    out = str(tmp_path / "asb")
    ab.write_asb(df, out, "tmx", "records", merge.ETERNAL, n_files=3)
    firsts = spark.read.text(out).filter(F.col("value") == "# first-file").count()
    assert firsts == 1
    got = {
        r.key: (r.cols_str, r.expiry, r.gen)
        for r in ab.read_asb(spark, out, "tmx", "records", merge.ETERNAL).collect()
    }
    assert got == {
        1: ("a=1.50,b=2.25", merge.ETERNAL, 1),
        2: ("c=-3.00", merge.NOW_EPOCH_S + 500, 1),
        3: ("d=0.12,e=9.00,f=1.00", merge.ETERNAL, 1),
    }


@given(
    key=st.integers(min_value=0, max_value=10**12),
    bins=st.lists(
        st.tuples(
            st.text(alphabet="abcdefghijklmnop_", min_size=1, max_size=12),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), blacklist_characters="\n\r"
                ),
                max_size=40,
            ),
        ),
        min_size=0,
        max_size=6,
        unique_by=lambda p: p[0],
    ),
    gen=st.integers(min_value=1, max_value=100),
    exp=st.integers(min_value=0, max_value=2**31),
)
def test_asb_record_block_property(key, bins, gen, exp):
    """Property: record_block -> _parse_asb_file is the identity on
    (key, gen, expiration, bins) for arbitrary bin names/values (any
    printable value incl. spaces — the length-prefixed framing carries
    them), so the writer and the independent parser agree on the whole
    record grammar, not just the fixture shapes."""
    from cassandra2aerospike_spark.sinks import asb_backup as ab

    import base64

    from cassandra2aerospike_spark.sinks.aerospike_wire import key_digest

    blk = ab.record_block("tmx", "records", str(key), bins, gen, exp)
    content = "\n".join(["Version 3.1", "# namespace tmx", blk])
    first, rows = ab._parse_asb_file(content, "tmx", "records")
    assert first is False
    d64 = base64.b64encode(key_digest("records", str(key).encode())).decode()
    assert rows == [(str(key), d64, gen, exp, bins)]


def test_asb_write_rejects_pre_epoch_expiry(spark, tmp_path):
    """Round-11 advice fix: a NON-eternal expiry at/before the
    citrusleaf epoch would encode as '+ t 0' (the eternal sentinel) or a
    negative t — silent corruption on round-trip.  write_asb must fail
    loudly instead."""
    import pytest

    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.sinks import asb_backup as ab

    for bad in (ab.CITRUS_EPOCH_S, ab.CITRUS_EPOCH_S - 3600):
        df = spark.createDataFrame(
            [(1, {"a": 1.0}, bad)],
            "key long, columns map<string,double>, expiry long",
        )
        with pytest.raises(Exception) as ei:
            ab.write_asb(
                df, str(tmp_path / f"asb{bad}"), "tmx", "records", merge.ETERNAL
            )
        assert "citrusleaf epoch" in str(ei.value)


# ------------------------------------------- round 11: security + cluster


SALT6 = "$2a$06$7EqJtq98hPqEX7fNZaFWoO"  # cost-6 twin of the client constant


def test_bcrypt_jbcrypt_vectors():
    """The published jBCrypt test vectors (TestBCrypt.java) — external
    ground truth for the pure-Python bcrypt (pi-seeded Blowfish boxes,
    eksblowfish schedule, $2a$ NUL-terminated key, bcrypt base64)."""
    from cassandra2aerospike_spark.sinks.bcrypt_py import checkpw, hashpw

    assert (
        hashpw("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.")
        == "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s."
    )
    assert (
        hashpw("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO")
        == "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"
    )
    assert checkpw("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe")
    assert not checkpw("b", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe")


def test_admin_codec_roundtrip():
    """build_admin/build_admin_response parse back through parse_admin
    (command, result code, every field verbatim)."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    req = aw.build_admin(
        aw.ADMIN_LOGIN,
        [(aw.ADMIN_FIELD_USER, b"alice"), (aw.ADMIN_FIELD_CREDENTIAL, b"$2a$x")],
    )
    assert req[:8][6:8] != b""  # framed
    cmd, _rc, fields = aw.parse_admin(req[8:])
    assert cmd == aw.ADMIN_LOGIN
    assert fields == {
        aw.ADMIN_FIELD_USER: b"alice",
        aw.ADMIN_FIELD_CREDENTIAL: b"$2a$x",
    }
    resp = aw.build_admin_response(
        aw.RC_OK, [(aw.ADMIN_FIELD_SESSION_TOKEN, b"tok16tok16tok16!")]
    )
    _cmd, rc, rfields = aw.parse_admin(resp[8:])
    assert rc == aw.RC_OK
    assert rfields[aw.ADMIN_FIELD_SESSION_TOKEN] == b"tok16tok16tok16!"


def test_wire_security_handshake_and_rejections():
    """Security-enabled server: LOGIN with the right credential gets a
    session token; the token AUTHENTICATEs a fresh connection; a wrong
    password draws INVALID_CREDENTIAL; an unknown user INVALID_USER; a
    stale token EXPIRED_SESSION; and an unauthenticated put
    NOT_AUTHENTICATED."""
    import socket

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer(credentials=("alice", "pw1"), credential_salt=SALT6)
    try:
        c = aw.WireClient(
            srv.host, srv.port, "tmx", "records", user="alice",
            credential=__import__(
                "cassandra2aerospike_spark.sinks.bcrypt_py", fromlist=["hashpw"]
            ).hashpw("pw1", SALT6),
        )
        assert c.session_token and len(c.session_token) == 16
        h = c.put(b"k1", {"a": b"1"}, 0)
        assert c.wait(h) == "ok"
        # session token authenticates a brand-new connection
        c2 = aw.WireClient(
            srv.host, srv.port, "tmx", "records", user="alice",
            session_token=c.session_token,
        )
        h2 = c2.put(b"k1", {"a": b"1"}, 0)
        assert c2.wait(h2) == "exists"
        c.close()
        c2.close()
        with pytest.raises(PermissionError, match="65"):
            aw.WireClient(
                srv.host, srv.port, "tmx", "records", user="alice",
                credential=__import__(
                    "cassandra2aerospike_spark.sinks.bcrypt_py",
                    fromlist=["hashpw"],
                ).hashpw("WRONG", SALT6),
            )
        with pytest.raises(PermissionError, match="60"):
            aw.WireClient(
                srv.host, srv.port, "tmx", "records", user="mallory",
                credential="$2a$nope",
            )
        with pytest.raises(PermissionError, match="66"):
            aw.WireClient(
                srv.host, srv.port, "tmx", "records", user="alice",
                session_token=b"\x00" * 16,
            )
        # raw unauthenticated put on a bare socket -> NOT_AUTHENTICATED
        sock = socket.create_connection((srv.host, srv.port))
        sock.sendall(aw.build_put("tmx", "records", b"k9", {"a": b"1"}, 0))
        typ, body = aw.read_frame(sock)
        assert typ == aw.MSG_TYPE
        assert aw.parse_result_code(body) == aw.RC_NOT_AUTHENTICATED
        sock.close()
    finally:
        srv.close()


def test_wire_partition_ownership_rejects_misroute():
    """A node owning only its third of the 4096-partition map refuses a
    put whose digest lands elsewhere with RC_PARTITION_UNAVAILABLE —
    the cluster-change signal a re-tending router refreshes on; callers
    expecting stable routing treat the 'unavailable' disposition as
    fatal."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer(
        owned_partitions={
            p for p in range(aw.N_PARTITIONS) if p % 3 == 0
        }
    )
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "records")
        owned = rejected = 0
        for i in range(30):
            key = f"key{i}".encode()
            pid = aw.partition_id(aw.key_digest("records", key))
            h = c.put(key, {"a": b"1"}, 0)
            if pid % 3 == 0:
                assert c.wait(h) == "ok"
                owned += 1
            else:
                assert c.wait(h) == "unavailable"
                rejected += 1
        assert owned and rejected
        assert len(srv.records()) == owned
        c.close()
    finally:
        srv.close()


def test_partition_id_recipe():
    """as_partition_getid: little-endian u32 of digest[0:4] & 4095."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    d = bytes([0x34, 0x12, 0xFF, 0xFF]) + bytes(16)
    assert aw.partition_id(d) == 0x1234 & 0xFFF
    assert aw.partition_id(bytes(20)) == 0


def test_wire_read_back_and_mixed_pipeline():
    """Round 11 read op: GET returns the stored bins + ttl verbatim,
    absent digests answer KEY_NOT_FOUND (None), and puts and gets
    pipeline on ONE connection redeeming through the shared in-order
    response stream."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    c = aw.WireClient(srv.host, srv.port, "ns1", "users")
    try:
        assert c.wait(c.put(b"k1", {"a": b"1.00", "b": b"2.50"}, 300)) == "ok"
        ttl, bins = c.wait_record(c.get(b"k1"))
        assert ttl == 300 and bins == {"a": b"1.00", "b": b"2.50"}
        assert c.wait_record(c.get(b"nope")) is None
        # mixed pipeline: put, get, put, get issued before any redeem
        h1 = c.put(b"k2", {"v": b"x"}, 0xFFFFFFFF)
        h2 = c.get(b"k2")
        h3 = c.put(b"k2", {"v": b"y"}, 5)  # create-only: draws exists
        h4 = c.get(b"k1")
        assert c.wait(h1) == "ok"
        assert c.wait_record(h2) == (0xFFFFFFFF, {"v": b"x"})
        assert c.wait(h3) == "exists"
        assert c.wait_record(h4)[1]["a"] == b"1.00"
        # grammar roundtrip of the codec pair used by the server
        frame = aw.build_record_response(0, 42, {"z": b"q"})
        rc, ttl2, bins2 = aw.parse_record_response(frame[8:])
        assert (rc, ttl2, bins2) == (0, 42, {"z": b"q"})
    finally:
        c.close()
        srv.close()


def test_info_channel_partition_discovery():
    """The public text info channel (proto type 1): node id,
    partition-generation and the replicas-master base64 bitmap answer;
    fetch_partition_map recovers EXACTLY the node's owned slice; bitmap
    encode/decode are inverses on arbitrary sets."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    owned = {p for p in range(aw.N_PARTITIONS) if p % 3 == 1}
    srv = aw.WireServer(owned_partitions=owned, info_namespace="tmx")
    try:
        gen, got = aw.fetch_partition_map(srv.host, srv.port, "tmx")
        assert gen == 1 and got == owned
        # unknown namespace -> empty slice
        _g, none = aw.fetch_partition_map(srv.host, srv.port, "nope")
        assert none == set()
    finally:
        srv.close()
    # bitmap codec property
    import random

    rnd = random.Random(5)
    for _ in range(5):
        ps = {rnd.randrange(aw.N_PARTITIONS) for _ in range(rnd.randrange(200))}
        assert aw.b64_to_partitions(aw.partitions_to_b64(ps)) == ps
    # an unrestricted node advertises the whole ring
    srv2 = aw.WireServer()
    try:
        _g, all_ps = aw.fetch_partition_map(srv2.host, srv2.port, "tmx")
        assert all_ps == set(range(aw.N_PARTITIONS))
    finally:
        srv2.close()


def test_wire_cluster_handoff_retend():
    """Round-12 handoff: node A moves its whole slice to node B mid-use
    (generation bump); a client routing by the stale map draws
    'unavailable', ClusterRouter.retend() rediscovers the map, and the
    re-routed put lands — zero lost records."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    servers = [
        aw.WireServer(
            owned_partitions={
                p for p in range(aw.N_PARTITIONS) if p % 3 == i
            }
        )
        for i in range(3)
    ]
    nodes = [(s.host, s.port) for s in servers]
    try:
        router = aw.ClusterRouter(nodes, "tmx", "records")
        assert router.n_retends == 0
        gen0 = router.generation

        def put_all(keys):
            lost = 0
            for key in keys:
                c = router.client_for(key)
                d = c.wait(c.put(key, {"a": b"1"}, 0))
                if d == "unavailable":
                    router.retend()
                    c = router.client_for(key)
                    d = c.wait(c.put(key, {"a": b"1"}, 0))
                if d != "ok":
                    lost += 1
            return lost

        keys1 = [f"k{i}".encode() for i in range(10)]
        assert put_all(keys1) == 0

        # HANDOFF: node 0's whole slice moves to node 1
        servers[0].set_owned(set())
        servers[1].set_owned(
            {p for p in range(aw.N_PARTITIONS) if p % 3 in (0, 1)}
        )
        keys2 = [f"h{i}".encode() for i in range(20)]
        assert put_all(keys2) == 0
        assert router.n_retends >= 1
        assert router.generation != gen0

        stored = set()
        for s in servers:
            stored |= {d for (_, _, d) in s.records()}
        want = {aw.key_digest("records", k) for k in keys1 + keys2}
        assert stored == want
        # relocated: node 1's store now holds ex-node-0 partitions
        n1_pids = {
            aw.partition_id(d) for (_, _, d) in servers[1].records()
        }
        assert any(p % 3 == 0 for p in n1_pids)
        router.close()
    finally:
        for s in servers:
            s.close()


def test_wire_rf2_replication_and_read_fallback():
    """RF=2: puts route to the master, the server replicates to the
    replica node in-process; after the master node DIES the reads fall
    back to the replica and find every record bin-for-bin."""
    import pytest

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    servers = [
        aw.WireServer(
            owned_partitions={
                p for p in range(aw.N_PARTITIONS) if p % 3 == i
            },
            replica_partitions={
                p for p in range(aw.N_PARTITIONS) if p % 3 == (i - 1) % 3
            },
        )
        for i in range(3)
    ]
    for i in range(3):
        servers[i].replicate_to = [
            (
                servers[(i + 1) % 3],
                {p for p in range(aw.N_PARTITIONS) if p % 3 == i},
            )
        ]
    nodes = [(s.host, s.port) for s in servers]
    try:
        router = aw.ClusterRouter(nodes, "tmx", "records", rf2=True)
        keys = [f"r{i}".encode() for i in range(15)]
        for key in keys:
            c = router.client_for(key)
            assert c.wait(c.put(key, {"v": key}, 0)) == "ok"
        # replica map: replica node = (master + 1) % 3, discovered
        for key in keys:
            m = router.master_idx_for(key)
            assert router.replica_idx_for(key) == (m + 1) % 3
        # every record exists on master AND replica stores
        for key in keys:
            dg = aw.key_digest("records", key)
            m = router.master_idx_for(key)
            r = router.replica_idx_for(key)
            assert ("tmx", "records", dg) in servers[m].records()
            assert ("tmx", "records", dg) in servers[r].records()

        # node 0 dies; reads for its partitions fall back to the replica
        servers[0].close()
        router.drop_client(0)
        fell_back = 0
        for key in keys:
            m = router.master_idx_for(key)
            if m == 0:
                with pytest.raises(OSError):
                    router.client(0)
                c = router.client(router.replica_idx_for(key))
                fell_back += 1
            else:
                c = router.client(m)
            rec = c.wait_record(c.get(key))
            assert rec is not None and rec[1] == {"v": key}
        assert fell_back > 0
        router.close()
    finally:
        for s in servers[1:]:
            s.close()


def test_wire_on_put_hook_and_replica_read_rules():
    """on_put fires with the running put ordinal after each applied
    write; a pure replica partition is READABLE at the replica but not
    writable there."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    seen = []
    srv = aw.WireServer(
        owned_partitions={p for p in range(aw.N_PARTITIONS) if p % 2 == 0},
        replica_partitions={p for p in range(aw.N_PARTITIONS) if p % 2 == 1},
        on_put=seen.append,
    )
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "records")
        wrote = refused = 0
        for i in range(12):
            key = f"p{i}".encode()
            pid = aw.partition_id(aw.key_digest("records", key))
            d = c.wait(c.put(key, {"a": b"1"}, 0))
            if pid % 2 == 0:
                assert d == "ok"
                wrote += 1
            else:
                # replica-held partition: not writable at this node
                assert d == "unavailable"
                refused += 1
                # ... but READS are served from the replica store
                srv._store_replica("tmx", "records",
                                   aw.key_digest("records", key),
                                   {"a": b"1"}, 0, next(aw._REPL_SEQ))
                rec = c.wait_record(c.get(key))
                assert rec is not None
        assert wrote and refused
        assert seen == list(range(1, wrote + 1))
        c.close()
    finally:
        srv.close()


def test_wire_scan_streams_mastered_records():
    """SCAN (round 12): a set-addressed read streams every record the
    node MASTERS (never its replica copies) as digest-tagged records
    terminated by INFO3_LAST; a cluster-wide scan therefore sees each
    record exactly once."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    servers = [
        aw.WireServer(
            owned_partitions={
                p for p in range(aw.N_PARTITIONS) if p % 2 == i
            },
            replica_partitions={
                p for p in range(aw.N_PARTITIONS) if p % 2 != i
            },
        )
        for i in range(2)
    ]
    for i in range(2):
        servers[i].replicate_to = [
            (
                servers[1 - i],
                {p for p in range(aw.N_PARTITIONS) if p % 2 == i},
            )
        ]
    try:
        router = aw.ClusterRouter(
            [(s.host, s.port) for s in servers], "tmx", "recs", rf2=True
        )
        keys = [f"s{i}".encode() for i in range(20)]
        for k in keys:
            c = router.client_for(k)
            assert c.wait(c.put(k, {"v": k}, 7)) == "ok"
        # every record is stored TWICE (master + replica) ...
        assert sum(len(s.records()) for s in servers) == 2 * len(keys)
        # ... but a cluster scan sees each digest EXACTLY once
        seen: dict = {}
        for s in servers:
            c = aw.WireClient(s.host, s.port, "tmx", "recs")
            for digest, ttl, bins in c.scan():
                assert digest not in seen
                seen[digest] = (ttl, bins)
            c.close()
        want = {aw.key_digest("recs", k): (7, {"v": k}) for k in keys}
        assert seen == want
        # scan refuses to interleave with pipelined requests
        c = aw.WireClient(servers[0].host, servers[0].port, "tmx", "recs")
        c.put(b"s0", {"v": b"x"}, 0)  # in flight, not redeemed
        import pytest

        with pytest.raises(RuntimeError, match="in-flight"):
            next(c.scan())
        router.close()
    finally:
        for s in servers:
            s.close()


def test_wire_scan_partition_filter():
    """A pid-filtered scan returns exactly the node's mastered records
    inside [begin, begin+count), and disjoint ranges tile the store."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "recs")
        keys = [f"pf{i}".encode() for i in range(40)]
        for k in keys:
            assert c.wait(c.put(k, {"v": k}, 0)) == "ok"
        got: dict = {}
        span = aw.N_PARTITIONS // 4
        for r in range(4):
            for digest, _ttl, bins in c.scan(r * span, span):
                pid = aw.partition_id(digest)
                assert r * span <= pid < (r + 1) * span
                assert digest not in got
                got[digest] = bins
        assert got == {
            aw.key_digest("recs", k): {"v": k} for k in keys
        }
        # an empty range answers just the terminator
        assert list(c.scan(0, 0)) == []
        c.close()
    finally:
        srv.close()


@settings(max_examples=60, deadline=None)
@given(
    ns=st.text(alphabet="abcdefgh", min_size=1, max_size=12),
    set_name=st.text(alphabet="abcdefgh", min_size=1, max_size=12),
    key=st.binary(min_size=1, max_size=64),
    bins=st.dictionaries(_bin_name, st.binary(max_size=128), max_size=8),
    ttl=st.integers(min_value=0, max_value=0xFFFFFFFF),
    pid_begin=st.integers(min_value=0, max_value=4095),
    pid_count=st.integers(min_value=0, max_value=4096),
)
def test_wire_scan_codec_roundtrip_property(
    ns, set_name, key, bins, ttl, pid_begin, pid_count
):
    """Scan-codec property: build_scan_record -> parse_scan_record is
    the identity on (digest, ttl, bins); build_scan's pid range parses
    back exactly; truncating a scan record at ANY byte raises the
    uniform ValueError, never struct.error or a silent short value."""
    import pytest

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    digest = aw.key_digest(set_name, key)
    frame = aw.build_scan_record(digest, ttl, bins)
    body = frame[8:]
    d2, t2, b2 = aw.parse_scan_record(body)
    assert (d2, t2, b2) == (digest, ttl & 0xFFFFFFFF, bins)

    req = aw.build_scan(ns, set_name, pid_begin, pid_count)
    assert aw.parse_pid_range(req[8:]) == (pid_begin, pid_count)
    assert aw.parse_pid_range(aw.build_scan(ns, set_name)[8:]) is None

    for cut in range(22, len(body)):
        try:
            aw.parse_scan_record(body[:cut])
        except (ValueError, RuntimeError):
            continue
        # a prefix that still parses must yield the full record only
        # when nothing was actually cut off
        assert cut == len(body)


def test_cluster_router_retend_cap_is_loud():
    """A routing bug no map refresh can fix must fail loudly, not
    livelock: retend() raises past max_retends."""
    import pytest

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        router = aw.ClusterRouter(
            [(srv.host, srv.port)], "tmx", "recs", max_retends=3
        )
        for _ in range(3):
            router.retend()
        with pytest.raises(RuntimeError, match="not converging"):
            router.retend()
        router.close()
    finally:
        srv.close()


def test_replica_seq_converges_out_of_order_replays():
    """ADVICE r12: two same-key ops that committed on the master in one
    order but reach the replica in the OPPOSITE order must converge to
    the master's order — the newest-seq-wins rule, without holding the
    master's lock across the forward (which would deadlock the ring
    replication topology the RF=2 rows use)."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    replica = aw.WireServer()
    try:
        k = ("tmx", "records", aw.key_digest("records", b"k"))
        s1, s2 = next(aw._REPL_SEQ), next(aw._REPL_SEQ)
        # newest (a delete, seq s2) lands FIRST; the stale write (s1)
        # replays late and must be ignored
        replica._store_replica(*k, None, 0, s2)
        replica._store_replica(*k, {"v": b"old"}, 60, s1)
        assert k not in replica.records()
        # and the write-then-write flavor: late old value is dropped
        k2 = ("tmx", "records", aw.key_digest("records", b"k2"))
        s3, s4 = next(aw._REPL_SEQ), next(aw._REPL_SEQ)
        replica._store_replica(*k2, {"v": b"new"}, 30, s4)
        replica._store_replica(*k2, {"v": b"old"}, 60, s3)
        assert replica.records()[k2] == ({"v": b"new"}, 30)
    finally:
        replica.close()


def test_retend_if_stale_sweeps_once_per_map_change():
    """ADVICE r12: a window of pipelined puts that all drained
    'unavailable' after one handoff triggers ONE re-tend — the
    followers see the refreshed map no longer routing their key at the
    refusing node and skip (unconditional re-tends could trip the
    max_retends livelock cap on a single legitimate cluster change)."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    a = aw.WireServer(owned_partitions=set(range(aw.N_PARTITIONS)))
    b = aw.WireServer(owned_partitions=set())
    try:
        nodes = [(a.host, a.port), (b.host, b.port)]
        router = aw.ClusterRouter(nodes, "tmx", "records", max_retends=4)
        keys = [f"k{i}".encode() for i in range(64)]
        assert all(router.master_idx_for(k) == 0 for k in keys)
        a.handoff(b, set(range(aw.N_PARTITIONS)))  # everything moves
        n0 = router.n_retends
        # 64 stale puts' worth of refusals, all against node 0: far
        # more than max_retends, yet only the first sweeps
        for k in keys:
            router.retend_if_stale(k, 0)
        assert router.n_retends == n0 + 1
        assert all(router.master_idx_for(k) == 1 for k in keys)
        router.close()
    finally:
        a.close()
        b.close()


def test_asb_keyless_digest_blocks_roundtrip():
    """The .asb format's optional `+ k` line (round 13): a scan-shaped
    keyless record block parses back digest-addressed; a keyed block in
    the same file still digest-verifies; a corrupt digest raises."""
    import base64

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw
    from cassandra2aerospike_spark.sinks.asb_backup import (
        ASB_VERSION_LINE,
        _parse_asb_file,
        digest_record_block,
        record_block,
    )

    dig = aw.key_digest("s1", b"k1")
    d64 = base64.b64encode(dig).decode()
    content = "\n".join(
        [
            ASB_VERSION_LINE,
            "# namespace n1",
            "# first-file",
            digest_record_block("n1", "s1", d64, [("v", "1.00")], 1, 0),
            record_block("n1", "s1", "77", [("w", "2.00")], 1, 0),
        ]
    )
    first, rows = _parse_asb_file(content, "n1", "s1")
    assert first
    assert rows[0] == (None, d64, 1, 0, [("v", "1.00")])
    assert rows[1][0] == "77" and rows[1][4] == [("w", "2.00")]
    bad = content.replace(d64, base64.b64encode(b"\x00" * 19).decode())
    import pytest

    with pytest.raises(ValueError, match="digest"):
        _parse_asb_file(bad, "n1", "s1")


def test_put_digest_routes_and_stores_like_keyed_put():
    """A digest-addressed put (the asrestore shape) stores under the
    exact same identity a keyed put of the original key would — and
    create-only still refuses the second write."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "records")
        dig = aw.key_digest("records", b"user-9")
        assert c.wait(c.put_digest(dig, {"v": b"9.00"}, 120)) == "ok"
        assert c.wait(c.put(b"user-9", {"v": b"X"}, 120)) == "exists"
        assert srv.records()[("tmx", "records", dig)] == ({"v": b"9.00"}, 120)
        c.close()
    finally:
        srv.close()


def test_wire_batch_get_mixed_results():
    """One batch-index request resolves OK / KEY_NOT_FOUND /
    PARTITION_UNAVAILABLE per record: found entries carry (ttl, bins),
    absent digests land in `missing`, digests of partitions the node
    does not serve land in `unavailable` — and indexes map back to the
    request order."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    keys = [f"bk{i}".encode() for i in range(12)]
    digs = [aw.key_digest("recs", k) for k in keys]
    owned = {aw.partition_id(d) for d in digs[:8]}
    srv = aw.WireServer(owned_partitions=owned)
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "recs")
        # store the first 5 (their pids are owned); 5..7 owned-but-absent;
        # 8..11 unowned -> per-record unavailable
        for k in keys[:5]:
            assert c.wait(c.put(k, {"v": k}, 77)) == "ok"
        found, missing, unavailable, filtered = c.batch_get(digs)
        assert filtered == set()
        assert sorted(found) == [0, 1, 2, 3, 4]
        for i in range(5):
            assert found[i] == (77, {"v": keys[i]})
        assert missing == {5, 6, 7}
        assert unavailable == {8, 9, 10, 11}
        # the connection still pipelines normal requests afterwards
        assert c.wait(c.put(b"after", {"v": b"1"}, 0)) in ("ok", "unavailable")
        c.close()
    finally:
        srv.close()


@settings(max_examples=60, deadline=None)
@given(
    ns=st.text(alphabet="abcdefgh", min_size=1, max_size=12),
    set_name=st.text(alphabet="abcdefgh", min_size=1, max_size=12),
    keys=st.lists(st.binary(min_size=1, max_size=32), min_size=0, max_size=6),
    bins=st.dictionaries(_bin_name, st.binary(max_size=128), max_size=8),
    ttl=st.integers(min_value=0, max_value=0xFFFFFFFF),
    index=st.integers(min_value=0, max_value=0xFFFFFFFF),
    rc=st.sampled_from([0, 2, 11]),
)
def test_wire_batch_codec_roundtrip_property(
    ns, set_name, keys, bins, ttl, index, rc
):
    """Batch-codec property: build_batch -> parse_batch_entries is the
    identity on the (index, digest) list; build_batch_record ->
    parse_batch_record is the identity on (index, rc, digest, ttl,
    bins); truncating a batch record at ANY byte raises the uniform
    ValueError, never struct.error."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    digests = [aw.key_digest(set_name, k) for k in keys]
    req = aw.build_batch(ns, set_name, digests)
    assert aw.parse_batch_entries(req[8:]) == list(enumerate(digests))
    # a non-batch read request parses to None, not an empty list
    assert aw.parse_batch_entries(aw.build_get(ns, set_name, b"k")[8:]) is None

    digest = aw.key_digest(set_name, keys[0] if keys else b"k")
    frame = aw.build_batch_record(index, digest, rc, ttl, bins)
    body = frame[8:]
    assert aw.parse_batch_record(body) == (
        index, rc, digest, ttl & 0xFFFFFFFF, bins,
    )
    for cut in range(22, len(body)):
        try:
            aw.parse_batch_record(body[:cut])
        except ValueError:
            continue
        assert cut == len(body)


def test_cluster_batch_read_retends_across_handoff_and_death():
    """ClusterRouter.batch_read survives both cluster-change shapes:
    a handoff (per-record UNAVAILABLE -> one re-tend per round -> the
    moved digests re-issue against the new owner) and a dead node
    (connection refused -> re-tend -> the survivors' promoted map
    serves everything)."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srvs = [
        aw.WireServer(
            owned_partitions={
                p for p in range(aw.N_PARTITIONS) if p % 2 == i
            }
        )
        for i in range(2)
    ]
    try:
        nodes = [(s.host, s.port) for s in srvs]
        router = aw.ClusterRouter(nodes, "tmx", "t")
        keys = [f"hk{i}".encode() for i in range(30)]
        for k in keys[:20]:
            c = router.client_for(k)
            assert c.wait(c.put(k, {"b": b"v" + k}, 9)) == "ok"
        digs = [aw.key_digest("t", k) for k in keys]
        out = router.batch_read(digs)
        assert sum(1 for v in out.values() if v is not None) == 20
        assert out[digs[0]] == (9, {"b": b"v" + keys[0]})
        # handoff: node 0's slice (ownership AND data) moves to node 1;
        # the router's map is now stale and must re-tend exactly once
        srvs[0].handoff(
            srvs[1], {p for p in range(aw.N_PARTITIONS) if p % 2 == 0}
        )
        before = router.n_retends
        out2 = router.batch_read(digs)
        assert {d: v for d, v in out2.items()} == out
        assert router.n_retends == before + 1
        # node death: a fresh router discovered post-handoff routes
        # everything at node 1 even after node 0 dies
        router2 = aw.ClusterRouter(nodes, "tmx", "t")
        srvs[0].close()
        out3 = router2.batch_read(digs)
        assert out3 == out
        router.close()
        router2.close()
    finally:
        for s in srvs:
            s.close()


def test_wire_on_batch_hook_cutover_is_atomic_with_the_batch():
    """The on_batch hook fires INSIDE the store lock BEFORE the
    snapshot: a hook that hands off at batch K makes batch K itself
    answer per-record UNAVAILABLE for every moved digest — the batch is
    never split across the cutover."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srvs = []

    def on_batch(n):
        if n == 1:
            srvs[0].handoff(
                srvs[1], {p for p in range(aw.N_PARTITIONS) if p % 2 == 0}
            )

    srvs.append(
        aw.WireServer(
            owned_partitions={
                p for p in range(aw.N_PARTITIONS) if p % 2 == 0
            },
            on_batch=on_batch,
        )
    )
    srvs.append(
        aw.WireServer(
            owned_partitions={
                p for p in range(aw.N_PARTITIONS) if p % 2 == 1
            }
        )
    )
    try:
        nodes = [(s.host, s.port) for s in srvs]
        router = aw.ClusterRouter(nodes, "tmx", "t")
        keys = [f"ab{i}".encode() for i in range(16)]
        node0_keys = [k for k in keys if router.master_idx_for(k) == 0]
        assert node0_keys, "fixture: no key routed at node 0"
        for k in keys:
            c = router.client_for(k)
            assert c.wait(c.put(k, {"v": k}, 0)) == "ok"
        pmap0 = list(router.pmap)
        stale = aw.ClusterRouter(nodes, "tmx", "t", initial_pmap=pmap0)
        digs = [aw.key_digest("t", k) for k in keys]
        out = stale.batch_read(digs)
        # every record resolved despite the mid-read cutover, via retend
        assert all(out[d] is not None for d in digs)
        assert stale.n_retends == 1
        assert len(srvs[0].records()) == 0
        router.close()
        stale.close()
    finally:
        for s in srvs:
            s.close()


def test_wire_generation_cas_semantics():
    """Generation tracking + check-and-set (round 13): creates start at
    generation 1, every replace bumps it, deletes reset it; a
    gen-checked put (INFO2_GENERATION + expected gen in the header)
    lands only when the stored generation matches — RC_GENERATION ->
    'gen_mismatch' otherwise, store untouched.  expect_gen=0 means
    'must not exist yet' (the create-shaped CAS)."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        k = b"cas-key"
        assert c.wait(c.put(k, {"v": b"1"}, 0)) == "ok"
        gen, _ttl, bins = c.wait_record_gen(c.get(k))
        assert (gen, bins) == (1, {"v": b"1"})
        # matching CAS lands and bumps
        assert (
            c.wait(c.put(k, {"v": b"2"}, 0, create_only=False, expect_gen=1))
            == "ok"
        )
        gen, _ttl, bins = c.wait_record_gen(c.get(k))
        assert (gen, bins) == (2, {"v": b"2"})
        # stale CAS refused, store untouched
        assert (
            c.wait(c.put(k, {"v": b"3"}, 0, create_only=False, expect_gen=1))
            == "gen_mismatch"
        )
        gen, _ttl, bins = c.wait_record_gen(c.get(k))
        assert (gen, bins) == (2, {"v": b"2"})
        # AS_POLICY_GEN_EQ applies only to EXISTING records (ADVICE
        # r13): a gen-checked write against an absent key CREATES it
        # like the real server, whatever the expected generation says
        assert (
            c.wait(c.put(b"new", {"v": b"x"}, 0, create_only=False, expect_gen=5))
            == "ok"
        )
        gen, _ttl, bins = c.wait_record_gen(c.get(b"new"))
        assert (gen, bins) == (1, {"v": b"x"})
        # ...but on an existing record the check is exact: a stale
        # expectation (incl. expect_gen=0) is refused, store untouched
        assert (
            c.wait(c.put(b"new", {"v": b"y"}, 0, create_only=False, expect_gen=0))
            == "gen_mismatch"
        )
        assert (
            c.wait(c.put(b"new", {"v": b"y"}, 0, create_only=False, expect_gen=1))
            == "ok"
        )
        # plain replace still bumps; delete resets to a fresh create
        assert c.wait(c.put(k, {"v": b"4"}, 0, create_only=False)) == "ok"
        assert c.wait_record_gen(c.get(k))[0] == 3
        assert c.wait(c.delete(k)) == "ok"
        assert c.wait(c.put(k, {"v": b"5"}, 0)) == "ok"
        assert c.wait_record_gen(c.get(k))[0] == 1
        c.close()
    finally:
        srv.close()


def test_wire_generation_survives_replication_and_handoff():
    """The generation is part of the record's identity across cluster
    dynamics: RF=2 replication mirrors the MASTER's generation (a
    promoted replica continues the same CAS sequence), and a partition
    handoff migrates generations with the records."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    all_p = set(range(aw.N_PARTITIONS))
    master = aw.WireServer(owned_partitions=all_p)
    replica = aw.WireServer(
        owned_partitions=set(), replica_partitions=all_p
    )
    master.replicate_to = [(replica, all_p)]
    try:
        c = aw.WireClient(master.host, master.port, "tmx", "t")
        k = b"rep-key"
        assert c.wait(c.put(k, {"v": b"1"}, 0)) == "ok"
        assert c.wait(c.put(k, {"v": b"2"}, 0, create_only=False)) == "ok"
        dig = aw.key_digest("t", k)
        assert replica._gens[("tmx", "t", dig)] == 2
        # replica read reports the master's generation
        rc = aw.WireClient(replica.host, replica.port, "tmx", "t")
        assert rc.wait_record_gen(rc.get(k))[0] == 2
        # handoff carries generations: CAS continues on the new owner
        target = aw.WireServer(owned_partitions=set())
        master.handoff(target, all_p)
        tc = aw.WireClient(target.host, target.port, "tmx", "t")
        assert tc.wait_record_gen(tc.get(k))[0] == 2
        assert (
            tc.wait(c_put := tc.put(k, {"v": b"3"}, 0, create_only=False,
                                    expect_gen=2))
            == "ok"
        )
        assert tc.wait_record_gen(tc.get(k))[0] == 3
        c.close(); rc.close(); tc.close()
        target.close()
    finally:
        master.close()
        replica.close()


def test_wire_touch_resets_ttl_keeps_bins():
    """TOUCH (round 13): resets the stored TTL to the request header's
    record_ttl and bumps the generation WITHOUT carrying or rewriting
    bins; absent keys answer not_found; composes with the CAS policy."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        k = b"keepalive"
        assert c.wait(c.put(k, {"v": b"7", "w": b"8"}, 100)) == "ok"
        assert c.wait(c.touch(k, 5000)) == "ok"
        gen, ttl, bins = c.wait_record_gen(c.get(k))
        assert (gen, ttl, bins) == (2, 5000, {"v": b"7", "w": b"8"})
        assert c.wait(c.touch(b"absent", 5000)) == "not_found"
        # CAS-composed: stale expected generation refuses, exact lands
        assert c.wait(c.touch(k, 9000, expect_gen=1)) == "gen_mismatch"
        assert c.wait(c.touch(k, 9000, expect_gen=2)) == "ok"
        gen, ttl, _bins = c.wait_record_gen(c.get(k))
        assert (gen, ttl) == (3, 9000)
        # a touch request is ~60B regardless of record width
        assert len(aw.build_touch("tmx", "t", k, 9000)) < 80
        c.close()
    finally:
        srv.close()


def test_wire_compressed_envelope_roundtrip_and_errors():
    """The COMPRESSED proto envelope (round 13): compress_frame wraps a
    complete inner frame (type 4, u64 uncompressed size + zlib); the
    read path unwraps transparently for EVERY message type; corrupt
    envelopes (bad deflate, size mismatch, bad inner header) raise the
    uniform ValueError."""
    import socket as socket_mod
    import struct
    import zlib

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    inner = aw.build_put("tmx", "t", b"zk", {"v": b"y" * 300}, 9)
    env = aw.compress_frame(inner)
    assert len(env) < len(inner)
    # loop the envelope through a real socketpair -> read_frame_ex
    a, b = socket_mod.socketpair()
    try:
        a.sendall(env)
        typ, body, compressed = aw.read_frame_ex(b)
        assert (typ, compressed) == (aw.MSG_TYPE, True)
        assert body == inner[8:]
        # plain frames keep flowing on the same connection
        a.sendall(inner)
        typ, body2, compressed = aw.read_frame_ex(b)
        assert (typ, compressed) == (aw.MSG_TYPE, False)
        assert body2 == inner[8:]
        # corrupt deflate
        bad = bytearray(env)
        bad[-1] ^= 0xFF
        a.sendall(bytes(bad))
        try:
            aw.read_frame_ex(b)
            raise AssertionError("corrupt deflate accepted")
        except ValueError:
            pass
        # size-mismatching envelope
        lying = aw._proto_frame(
            struct.pack(">Q", len(inner) + 1) + zlib.compress(inner),
            aw.COMPRESSED_MSG_TYPE,
        )
        a.sendall(lying)
        try:
            aw.read_frame_ex(b)
            raise AssertionError("size mismatch accepted")
        except ValueError:
            pass
    finally:
        a.close()
        b.close()


def test_wire_client_compression_spans_every_op():
    """compress_min=0 ships every data op inside the envelope — puts,
    gets, touch, delete, batch, scan — the server counts the arrivals
    (_envelopes) and the stored state is identical to the plain wire."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    plain_srv = aw.WireServer()
    comp_srv = aw.WireServer()
    try:
        pc = aw.WireClient(plain_srv.host, plain_srv.port, "tmx", "t")
        cc = aw.WireClient(
            comp_srv.host, comp_srv.port, "tmx", "t", compress_min=0
        )
        keys = [f"zz{i}".encode() for i in range(8)]
        for c in (pc, cc):
            for k in keys:
                assert c.wait(c.put(k, {"v": k * 20}, 5)) == "ok"
        assert cc.n_compressed == len(keys)
        assert comp_srv._envelopes == len(keys)
        assert plain_srv._envelopes == 0
        assert comp_srv.records() == plain_srv.records()
        # reads / touch / batch / scan ride the envelope too
        assert cc.wait_record_gen(cc.get(keys[0]))[2] == {"v": keys[0] * 20}
        assert cc.wait(cc.touch(keys[0], 99)) == "ok"
        found, _m, _u, _f = cc.batch_get([aw.key_digest("t", k) for k in keys])
        assert len(found) == len(keys)
        assert len(list(cc.scan())) == len(keys)
        assert comp_srv._envelopes == len(keys) + 4
        pc.close()
        cc.close()
    finally:
        plain_srv.close()
        comp_srv.close()


def test_wire_scan_projection_prunes_width_not_rows():
    """Projected scans (round 13): the server returns only the
    requested bins — records holding none still arrive with zero bins
    (row identity survives); composes with pid ranges; GET_ALL scans
    are unchanged."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        for i in range(10):
            bins = {"a": b"1", "b": b"2"} if i % 2 else {"b": b"2"}
            assert c.wait(c.put(f"w{i}".encode(), bins, 0)) == "ok"
        proj = list(c.scan(bins=["a"]))
        assert len(proj) == 10
        assert sum(1 for _, _, b in proj if b == {"a": b"1"}) == 5
        assert sum(1 for _, _, b in proj if b == {}) == 5
        assert all(set(b) <= {"a"} for _, _, b in proj)
        # request grammar roundtrip
        req = aw.build_scan("tmx", "t", bins=["a", "bc"])
        assert aw.parse_scan_bins(req[8:]) == ["a", "bc"]
        assert aw.parse_scan_bins(aw.build_scan("tmx", "t")[8:]) is None
        c.close()
    finally:
        srv.close()


def test_wire_exists_probe_is_metadata_only():
    """INFO1_NOBINDATA (round 13): the exists probe answers generation
    + ttl with zero ops — the response size is independent of record
    width; absent keys answer None; batch records carry the REAL
    generation in their header."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        k = b"wide"
        wide = {f"b{i}": b"x" * 200 for i in range(10)}
        assert c.wait(c.put(k, wide, 123)) == "ok"
        assert c.wait(c.put(k, wide, 123, create_only=False)) == "ok"
        got = c.wait_record_gen(c.exists(k))
        assert got == (2, 123, {})
        assert c.wait_record_gen(c.exists(b"nope")) is None
        # the metadata response is bins-independent small
        assert len(aw.build_exists("tmx", "t", k)) < 80
        # batch record header carries the real generation
        frame = aw.build_batch_record(7, aw.key_digest("t", k), 0, 5, {}, gen=9)
        import struct
        assert struct.unpack_from(">I", frame[8:], 6)[0] == 9
        c.close()
    finally:
        srv.close()


def test_wire_batch_requires_auth_on_secured_cluster():
    """Batch-index reads honor the security gate like every data
    message: unauthenticated connections draw RC_NOT_AUTHENTICATED,
    a LOGINed client batches normally."""
    import pytest

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw
    from cassandra2aerospike_spark.sinks.bcrypt_py import hashpw

    salt6 = "$2a$06$7EqJtq98hPqEX7fNZaFWoO"
    srv = aw.WireServer(credentials=("bu", "pw"), credential_salt=salt6)
    try:
        cred = hashpw("pw", salt6)
        c = aw.WireClient(srv.host, srv.port, "tmx", "t", user="bu", credential=cred)
        k = b"sec-batch"
        assert c.wait(c.put(k, {"v": b"1"}, 0)) == "ok"
        found, missing, _, _f = c.batch_get([aw.key_digest("t", k)])
        assert found[0] == (0, {"v": b"1"}) and not missing
        c.close()
        # no handshake: the batch answers NOT_AUTHENTICATED (a plain
        # result-code response, surfaced as the batch-failed error)
        import socket as s_mod

        sock = s_mod.create_connection((srv.host, srv.port))
        sock.sendall(aw.build_batch("tmx", "t", [aw.key_digest("t", k)]))
        _typ, body = aw.read_frame(sock)
        assert body[5] == aw.RC_NOT_AUTHENTICATED
        sock.close()
    finally:
        srv.close()


def test_wire_compressed_envelope_bomb_guard():
    """ADVICE r13: the read path must bound its allocation by the
    DECLARED uncompressed size, not trust the deflate stream.  A bomb
    (tiny frame, huge expansion) whose declaration exceeds the 48-bit
    proto limit is refused before inflating; one whose declaration LIES
    small is refused after at most declared+1 bytes of output; trailing
    garbage after a complete stream is refused too."""
    import socket as socket_mod
    import struct
    import zlib

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    inner = aw.build_put("tmx", "t", b"bk", {"v": b"z" * 64}, 9)

    def send_and_expect_error(env):
        a, b = socket_mod.socketpair()
        try:
            a.sendall(env)
            try:
                aw.read_frame_ex(b)
                raise AssertionError("hostile envelope accepted")
            except ValueError:
                pass
        finally:
            a.close()
            b.close()

    # declared size over the 2^48 proto body limit: refused pre-inflate
    send_and_expect_error(
        aw._proto_frame(
            struct.pack(">Q", 1 << 52) + zlib.compress(inner),
            aw.COMPRESSED_MSG_TYPE,
        )
    )
    # 64 MiB of zeros declared as 16 bytes: inflation stops at 17 bytes
    bomb = zlib.compress(b"\x00" * (64 << 20))
    send_and_expect_error(
        aw._proto_frame(struct.pack(">Q", 16) + bomb, aw.COMPRESSED_MSG_TYPE)
    )
    # complete stream + trailing garbage: refused
    send_and_expect_error(
        aw._proto_frame(
            struct.pack(">Q", len(inner)) + zlib.compress(inner) + b"junk",
            aw.COMPRESSED_MSG_TYPE,
        )
    )


def test_wire_batch_reply_omitting_index_is_protocol_error():
    """ADVICE r13: a digest a node's batch reply accounts for in NONE of
    found/missing/unavailable must raise a protocol error in
    ClusterRouter.batch_read, not surface later as a bare KeyError."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        router = aw.ClusterRouter(
            [(srv.host, srv.port)], "tmx", "t"
        )
        digests = [aw.key_digest("t", b"omit-1"), aw.key_digest("t", b"omit-2")]

        class _DroppingClient:
            def batch_get(self, items, filter_exp=None):
                # answers for all but the LAST index it was sent
                return {}, {i: None for i in range(len(items) - 1)}, set(), set()

        router._clients = {i: _DroppingClient() for i in range(4096)}
        router.client = lambda idx: _DroppingClient()
        try:
            router.batch_read(digests)
            raise AssertionError("dropped index accepted")
        except ValueError as e:
            assert "omitted index" in str(e)
    finally:
        srv.close()


def test_wire_operate_multi_op_transaction():
    """OPERATE (round 14): one AS_MSG carries an ordered op list the
    server applies atomically — reads AFTER mutations see the mutated
    values, the whole transaction bumps the generation exactly once,
    INCR treats absent bins as 0 and refuses non-integer particles,
    and the CAS policy guards the whole transaction."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        k = b"op-key"
        assert c.wait(c.put(k, {"v": b"base"}, 100)) == "ok"
        # read-modify-write in ONE transaction: incr-from-absent,
        # append, write, then read-your-write on all three
        st, gen, ttl, bins = c.wait_operate(
            c.operate(
                k,
                [
                    ("incr", "n", 5),
                    ("append", "v", b"+x"),
                    ("write", "m", b"OP"),
                    ("read", "n"),
                    ("read", "v"),
                    ("read", "m"),
                ],
                ttl=200,
            )
        )
        assert st == "ok" and gen == 2 and ttl == 200
        assert bins == {"n": (5).to_bytes(8, "big", signed=True),
                        "v": b"base+x", "m": b"OP"}
        # second incr accumulates; prepend; touch rides along
        st, gen, _ttl, bins = c.wait_operate(
            c.operate(
                k,
                [("incr", "n", -2), ("prepend", "v", b"y/"), ("read", "n"),
                 ("read", "v"), ("touch",)],
                ttl=300,
            )
        )
        assert st == "ok" and gen == 3
        assert bins == {"n": (3).to_bytes(8, "big", signed=True),
                        "v": b"y/base+x"}
        # pure-read operate: no gen bump, stored ttl answered
        st, gen, ttl, bins = c.wait_operate(c.operate(k, [("read", "m")]))
        assert (st, gen, ttl, bins) == ("ok", 3, 300, {"m": b"OP"})
        # INCR against a non-integer particle refuses, store untouched
        st, _g, _t, _b = c.wait_operate(c.operate(k, [("incr", "m", 1), ("read", "m")]))
        assert st == "bin_type"
        _st, gen, _t, bins = c.wait_operate(c.operate(k, [("read", "m")]))
        assert gen == 3 and bins == {"m": b"OP"}
        # CAS guard over the whole transaction
        st, _g, _t, _b = c.wait_operate(
            c.operate(k, [("incr", "n", 100), ("read", "n")], ttl=1, expect_gen=1)
        )
        assert st == "gen_mismatch"
        _st, _g, _t, bins = c.wait_operate(c.operate(k, [("read", "n")]))
        assert bins == {"n": (3).to_bytes(8, "big", signed=True)}
        # pure-read operate on an absent key answers not_found
        st, _g, _t, _b = c.wait_operate(c.operate(b"nope", [("read", "v")]))
        assert st == "not_found"
        # operate with writes on an absent key CREATES (gen 1)
        st, gen, _t, bins = c.wait_operate(
            c.operate(b"fresh", [("incr", "n", 7), ("read", "n")], ttl=50)
        )
        assert st == "ok" and gen == 1
        assert bins == {"n": (7).to_bytes(8, "big", signed=True)}
        assert srv._operates == 9
        c.close()
    finally:
        srv.close()


def test_wire_operate_replicates_and_respects_ownership():
    """An OPERATE's post-transaction record replicates like any write
    (same seq ordering), and a node that doesn't master the partition
    answers PARTITION_UNAVAILABLE for the whole transaction."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    all_p = set(range(aw.N_PARTITIONS))
    master = aw.WireServer(owned_partitions=all_p)
    replica = aw.WireServer(owned_partitions=set(), replica_partitions=all_p)
    master.replicate_to = [(replica, all_p)]
    nobody = aw.WireServer(owned_partitions=set())
    try:
        c = aw.WireClient(master.host, master.port, "tmx", "t")
        k = b"rep-key"
        st, gen, _t, bins = c.wait_operate(
            c.operate(k, [("incr", "n", 9), ("read", "n")], ttl=60)
        )
        assert st == "ok" and gen == 1
        # the replica holds the post-transaction record at the same gen
        rk = ("tmx", "t", aw.key_digest("t", k))
        assert replica._store[rk][0] == {"n": (9).to_bytes(8, "big", signed=True)}
        assert replica._gens[rk] == 1
        c.close()
        c2 = aw.WireClient(nobody.host, nobody.port, "tmx", "t")
        try:
            c2.wait_operate(c2.operate(k, [("incr", "n", 1), ("read", "n")]))
            raise AssertionError("unowned operate accepted")
        except aw.WireUnavailable:
            pass
        c2.close()
    finally:
        master.close()
        replica.close()
        nobody.close()


def test_exp_encode_decode_eval_roundtrip():
    """Expression filters (round 14): the AST round-trips through the
    wire TLV, and evaluation follows the public tri-state semantics —
    absent/incompatible bins are UNKNOWN, comparisons against UNKNOWN
    stay UNKNOWN, NOT preserves UNKNOWN, and only exact-True ships."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    i64 = lambda v: v.to_bytes(8, "big", signed=True)
    bins = {"n": i64(5), "v": b"hello", "w": b"abc"}
    exp = ("and", [
        aw.exp_bin_exists("v"),
        ("cmp", "ge", ("bin_int", "n"), ("int", 3)),
        ("not", ("cmp", "eq", ("bin_blob", "w"), ("blob", b"zzz"))),
    ])
    assert aw.exp_decode(aw.exp_encode(exp)) == exp
    assert aw.exp_eval(exp, bins) is True
    assert aw.exp_eval(exp, {**bins, "n": i64(2)}) is False
    # absent bin -> UNKNOWN -> whole AND unknown -> does not ship
    assert aw.exp_eval(exp, {"v": b"x", "w": b"abc"}) is None
    # incompatible particle width for an int bin -> UNKNOWN
    assert aw.exp_eval(("cmp", "gt", ("bin_int", "v"), ("int", 0)), bins) is None
    # NOT(unknown) stays unknown (never un-filters a broken record)
    assert aw.exp_eval(("not", ("cmp", "eq", ("bin_int", "q"), ("int", 1))), bins) is None
    # OR short-circuits True past an unknown leg
    assert aw.exp_eval(
        ("or", [("cmp", "eq", ("bin_int", "q"), ("int", 1)),
                aw.exp_bin_exists("n")]), bins
    ) is True
    # malformed payloads refuse
    for bad in (b"", b"\xff", aw.exp_encode(exp) + b"x"):
        try:
            aw.exp_decode(bad)
            raise AssertionError("malformed expression accepted")
        except ValueError:
            pass


def test_wire_scan_expression_filter_prunes_rows_server_side():
    """A filtered scan ships ONLY matching records (counter-asserted),
    composes with projection and the pid-range filter, and an
    unfiltered scan on the same node still returns everything."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    i64 = lambda v: v.to_bytes(8, "big", signed=True)
    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        for k in range(20):
            bins = {"score": i64(k), "pad": b"x" * 50}
            if k % 3 == 0:
                bins["flag"] = b"y"
            assert c.wait(c.put(f"k{k}".encode(), bins, 0)) == "ok"
        c.close()
        exp = ("and", [
            aw.exp_bin_exists("flag"),
            ("cmp", "ge", ("bin_int", "score"), ("int", 6)),
        ])
        want = {k for k in range(20) if k % 3 == 0 and k >= 6}  # 6,9..18 -> {6,9,12,15,18}
        sc = aw.WireClient(srv.host, srv.port, "tmx", "t")
        got = list(sc.scan(filter_exp=exp, bins=["score"]))
        sc.close()
        scores = sorted(
            int.from_bytes(b["score"], "big", signed=True) for _, _, b in got
        )
        assert scores == sorted(want)
        # projection held: no pad/flag bins crossed the wire
        assert all(set(b) == {"score"} for _, _, b in got)
        assert srv._scan_shipped == len(want)
        # unfiltered scan still ships everything
        sc2 = aw.WireClient(srv.host, srv.port, "tmx", "t")
        assert len(list(sc2.scan())) == 20
        sc2.close()
        assert srv._scan_shipped == len(want) + 20
    finally:
        srv.close()


def test_wire_batch_expression_filter():
    """The expression filter rides BATCH requests like scans (round
    14): matching records answer OK with bins, existing-but-excluded
    records answer FILTERED_OUT (distinct from NOT_FOUND), and the
    router surfaces them as BATCH_FILTERED."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    i64 = lambda v: v.to_bytes(8, "big", signed=True)
    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        for k in range(6):
            assert c.wait(c.put(f"b{k}".encode(), {"n": i64(k)}, 0)) == "ok"
        c.close()
        exp = ("cmp", "ge", ("bin_int", "n"), ("int", 3))
        digs = [aw.key_digest("t", f"b{k}".encode()) for k in range(6)]
        digs.append(aw.key_digest("t", b"absent"))
        bc = aw.WireClient(srv.host, srv.port, "tmx", "t")
        found, missing, unavailable, filtered = bc.batch_get(
            digs, filter_exp=exp
        )
        bc.close()
        assert sorted(found) == [3, 4, 5]
        assert filtered == {0, 1, 2}
        assert missing == {6}
        assert unavailable == set()
        # the router maps filtered digests to the BATCH_FILTERED sentinel
        router = aw.ClusterRouter([(srv.host, srv.port)], "tmx", "t")
        got = router.batch_read(digs, filter_exp=exp)
        assert got[digs[5]] == (0, {"n": i64(5)})
        assert got[digs[1]] is aw.BATCH_FILTERED
        assert got[digs[6]] is None
        router.close()
    finally:
        srv.close()


def test_wire_sindex_query_family():
    """Secondary-index queries (round 14): sindex-create DDL over the
    info channel, int-range and blob-equality predicates, composition
    with projection + expression filter + pid slicing, INDEX_NOT_FOUND
    for unindexed bins, and index visibility for post-create writes."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    i64 = lambda v: v.to_bytes(8, "big", signed=True)
    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        for k in range(10):
            bins = {"score": i64(k), "grp": b"even" if k % 2 == 0 else b"odd",
                    "pad": b"x" * 40}
            assert c.wait(c.put(f"q{k}".encode(), bins, 0)) == "ok"
        # querying before the index exists refuses with a clear error
        try:
            list(c.query(aw.encode_index_range("score", 2, 5)))
            raise AssertionError("unindexed query accepted")
        except RuntimeError as e:
            assert "secondary index" in str(e)
        c.sindex_create("score", numeric=True)
        c.sindex_create("grp", numeric=False)
        # int range [2, 5]
        got = sorted(
            int.from_bytes(b["score"], "big", signed=True)
            for _, _, b in c.query(
                aw.encode_index_range("score", 2, 5), bins=["score"]
            )
        )
        assert got == [2, 3, 4, 5]
        # blob equality
        evens = list(c.query(aw.encode_index_range("grp", eq=b"even")))
        assert len(evens) == 5
        # composition: range AND expression filter AND projection
        rows = list(
            c.query(
                aw.encode_index_range("score", 0, 9),
                bins=["score"],
                filter_exp=("cmp", "eq", ("bin_blob", "grp"), ("blob", b"odd")),
            )
        )
        assert sorted(
            int.from_bytes(b["score"], "big", signed=True) for _, _, b in rows
        ) == [1, 3, 5, 7, 9]
        assert all(set(b) == {"score"} for _, _, b in rows)
        # a write AFTER create is immediately queryable
        assert c.wait(c.put(b"q10", {"score": i64(3), "grp": b"odd"}, 0)) == "ok"
        got = sorted(
            int.from_bytes(b["score"], "big", signed=True)
            for _, _, b in c.query(aw.encode_index_range("score", 3, 3))
        )
        assert got == [3, 3]
        assert srv._queries == 5
        # pid slicing composes: a full-ring sweep over 4 slices finds
        # every match exactly once
        n = 0
        for begin in range(0, aw.N_PARTITIONS, aw.N_PARTITIONS // 4):
            n += len(list(c.query(
                aw.encode_index_range("score", 2, 5),
                pid_begin=begin, pid_count=aw.N_PARTITIONS // 4,
            )))
        assert n == 5  # scores 2,3,4,5 plus q10's second 3
        c.close()
    finally:
        srv.close()


def test_wire_batch_write_codec_roundtrip():
    """build_batch_write -> parse_batch_write_entries is the identity on
    (index, digest, ops, ttl, expect_gen) lists across every op kind
    and both gen-flag shapes; truncating anywhere raises the uniform
    ValueError, never struct.error."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    entries = [
        (0, aw.key_digest("t", b"a"),
         [("write", "v", b"x"), ("read", "v")], 100, None, False, False, False),
        (7, aw.key_digest("t", b"b"),
         [("incr", "n", -12), ("append", "v", b"+"), ("prepend", "v", b"-"),
          ("touch",)], 0xFFFFFFFF, 3, False, False, True),  # replace
        (2, aw.key_digest("t", b"c"), [], 0, 0, True, False, False),
        (3, aw.key_digest("t", b"d"), [], 0, None, False, True, False),  # delete
    ]
    req = aw.build_batch_write("ns", "t", entries)
    assert aw.parse_batch_write_entries(req[8:]) == entries
    # the 5-tuple (no trailing flags) build form parses to False, False
    req5 = aw.build_batch_write("ns", "t", [e[:5] for e in entries[:2]])
    assert aw.parse_batch_write_entries(req5[8:]) == [
        e[:5] + (False, False, False) for e in entries[:2]
    ]
    # a delete sub-transaction refuses to carry ops
    try:
        aw.build_batch_write(
            "ns", "t",
            [(0, aw.key_digest("t", b"x"), [("touch",)], 0, None, False, True)],
        )
        raise AssertionError("delete with ops must be refused")
    except ValueError:
        pass
    # a read-batch frame parses via its own walk, not this one; a
    # frame with no batch field answers None
    assert aw.parse_batch_write_entries(aw.build_get("ns", "t", b"k")[8:]) is None
    body = req[8:]
    # find the batch field payload and truncate inside it
    for cut in range(60, len(body)):
        try:
            aw.parse_batch_write_entries(body[:cut])
        except ValueError:
            continue


def test_wire_batch_write_mixed_results():
    """One batch-write request: per-record sub-transactions apply with
    single-OPERATE semantics (create at gen 1, read-your-write, CAS on
    existing only, INCR type refusal) and answer PER-RECORD result
    codes — ok / gen_mismatch / not_found / bin_type / unavailable —
    without one record's failure touching its neighbors."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    keys = [f"bw{i}".encode() for i in range(6)]
    digs = [aw.key_digest("t", k) for k in keys]
    owned = {aw.partition_id(d) for d in digs[:5]}
    srv = aw.WireServer(owned_partitions=owned)
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        # seed key 1 (gen 1) and key 3 with a blob bin for the type error
        assert c.wait(c.put(keys[1], {"n": b"\0" * 8}, 10)) == "ok"
        assert c.wait(c.put(keys[3], {"m": b"blob"}, 10)) == "ok"
        res = c.batch_write([
            # create with read-your-write
            (digs[0], [("incr", "n", 5), ("read", "n")], 100, None),
            # CAS mismatch: key 1 is at gen 1, expect 9
            (digs[1], [("write", "v", b"x")], 100, 9),
            # pure-read sub-transaction on an absent key
            (digs[2], [("read", "n")], 0, None),
            # INCR against the blob particle: refused, nothing applied
            (digs[3], [("incr", "m", 1)], 100, None),
            # CAS on ABSENT creates (AS_POLICY_GEN_EQ semantics)
            (digs[4], [("write", "v", b"new"), ("read", "v")], 50, 7),
            # partition not mastered here: per-record refusal
            (digs[5], [("write", "v", b"z")], 100, None),
        ])
        assert res[0][0] == "ok" and res[0][1] == 1 and res[0][2] == 100
        assert res[0][3] == {"n": (5).to_bytes(8, "big", signed=True)}
        assert res[1][0] == "gen_mismatch"
        assert res[2][0] == "not_found"
        assert res[3][0] == "bin_type"
        assert res[4][0] == "ok" and res[4][1] == 1
        assert res[4][3] == {"v": b"new"}
        assert res[5][0] == "unavailable"
        # the failures applied NOTHING
        got = srv.records()
        assert got[("tmx", "t", digs[1])] == ({"n": b"\0" * 8}, 10)
        assert got[("tmx", "t", digs[3])] == ({"m": b"blob"}, 10)
        assert ("tmx", "t", digs[2]) not in got
        assert ("tmx", "t", digs[5]) not in got
        assert srv._batch_writes == 1 and srv._puts == 2
        # the connection still pipelines normal requests afterwards
        assert c.wait(c.put(b"bw-after", {"v": b"1"}, 0)) in ("ok", "unavailable")
        c.close()
    finally:
        srv.close()


def test_cluster_batch_operate_retends_without_double_apply():
    """ClusterRouter.batch_operate under a live handoff: node 0 hands
    its whole mastered slice to node 1 INSIDE the lock at its first
    batch-write, BEFORE any entry applies — so the stale-routed
    entries are refused, the router re-tends, re-issues ONLY those, and
    the non-idempotent INCRs land exactly once (every record gen 1,
    value == its single delta)."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    n_nodes = 2
    slices = [
        {p for p in range(aw.N_PARTITIONS) if p % n_nodes == i}
        for i in range(n_nodes)
    ]
    servers: list = []

    def on_bw(n):
        if n == 1:
            servers[0].handoff(servers[1], slices[0])

    servers.append(aw.WireServer(owned_partitions=slices[0], on_batch_write=on_bw))
    servers.append(aw.WireServer(owned_partitions=slices[1]))
    try:
        nodes = [(s.host, s.port) for s in servers]
        router = aw.ClusterRouter(nodes, "tmx", "t")
        keys = [f"bo{i}".encode() for i in range(40)]
        items = [
            (aw.key_digest("t", k), [("incr", "n", i + 1), ("read", "n")], 60, None)
            for i, k in enumerate(keys)
        ]
        out = router.batch_operate(items)
        assert len(out) == len(items)
        for i, (d, _ops, _ttl, _eg) in enumerate(items):
            st, gen, ttl, bins = out[d]
            assert (st, gen, ttl) == ("ok", 1, 60)
            assert bins == {"n": (i + 1).to_bytes(8, "big", signed=True)}
        # the handoff really happened: node 0 ended empty, node 1 has all
        assert len(servers[0].records()) == 0
        assert len(servers[1].records()) == len(keys)
        # duplicate digests in one call are refused up front
        d0 = items[0][0]
        try:
            router.batch_operate([(d0, [("incr", "n", 1)], 0, None)] * 2)
            raise AssertionError("duplicate digests must be refused")
        except ValueError:
            pass
        router.close()
    finally:
        for s in servers:
            s.close()


def test_wire_batch_write_create_only():
    """Per-record CREATE-ONLY in a batch write: existing records refuse
    with 'exists' applying nothing; absent records create at gen 1 —
    the CLI --batch-write sink's idempotence policy (EXISTS is not an
    error, AerospikeWriter.cpp:137-161 semantics batched)."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        d1 = aw.key_digest("t", b"co1")
        d2 = aw.key_digest("t", b"co2")
        assert c.wait(c.put(b"co1", {"v": b"orig"}, 9)) == "ok"
        res = c.batch_write([
            (d1, [("write", "v", b"clobber")], 100, None, True),
            (d2, [("write", "v", b"new")], 100, None, True),
        ])
        assert res[0][0] == "exists"
        assert res[1][0] == "ok" and res[1][1] == 1
        got = srv.records()
        assert got[("tmx", "t", d1)] == ({"v": b"orig"}, 9)
        assert got[("tmx", "t", d2)] == ({"v": b"new"}, 100)
        # a re-run is a no-op: everything answers exists
        res2 = c.batch_write([
            (d1, [("write", "v", b"x")], 1, None, True),
            (d2, [("write", "v", b"y")], 1, None, True),
        ])
        assert res2[0][0] == res2[1][0] == "exists"
        c.close()
    finally:
        srv.close()


def test_wire_batch_write_delete_subtransactions():
    """Batch DELETE record type: removes under the store lock with the
    same CAS policy, answers OK / KEY_NOT_FOUND (idempotent), and
    replicates the removal like the single-delete path."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    all_p = set(range(aw.N_PARTITIONS))
    master = aw.WireServer(owned_partitions=all_p)
    replica = aw.WireServer(owned_partitions=set(), replica_partitions=all_p)
    master.replicate_to = [(replica, all_p)]
    try:
        c = aw.WireClient(master.host, master.port, "tmx", "t")
        d1, d2, d3 = (aw.key_digest("t", f"bd{i}".encode()) for i in range(3))
        assert c.wait(c.put(b"bd0", {"v": b"0"}, 9)) == "ok"
        assert c.wait(c.put(b"bd1", {"v": b"1"}, 9)) == "ok"
        res = c.batch_write([
            (d1, [], 0, None, False, True),       # delete existing
            (d2, [], 0, 7, False, True),          # CAS delete, gen is 1 -> mismatch
            (d3, [], 0, None, False, True),       # delete absent -> not_found
        ])
        assert res[0][0] == "ok"
        assert res[1][0] == "gen_mismatch"
        assert res[2][0] == "not_found"
        store = master.records()
        assert ("tmx", "t", d1) not in store and ("tmx", "t", d2) in store
        # the removal replicated (replica applied newest-seq delete)
        assert ("tmx", "t", d1) not in replica.records()
        c.close()
    finally:
        master.close()
        replica.close()


_op_strategy = st.one_of(
    st.tuples(st.just("read"), _bin_name),
    st.tuples(st.just("write"), _bin_name, st.binary(max_size=64)),
    st.tuples(
        st.just("incr"), _bin_name,
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
    ),
    st.tuples(st.just("append"), _bin_name, st.binary(max_size=64)),
    st.tuples(st.just("prepend"), _bin_name, st.binary(max_size=64)),
    st.just(("touch",)),
    # the CDT list/map family (round 16) rides the same op framing
    st.tuples(st.just("list_append"), _bin_name, st.binary(max_size=32)),
    st.tuples(st.just("list_size"), _bin_name),
    st.tuples(
        st.just("list_get_rank"), _bin_name,
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
    ),
    st.tuples(st.just("map_put"), _bin_name, st.binary(max_size=16),
              st.binary(max_size=32)),
    st.tuples(
        st.just("map_incr"), _bin_name, st.binary(max_size=16),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
    ),
    st.tuples(st.just("map_get"), _bin_name, st.binary(max_size=16)),
    st.tuples(st.just("map_size"), _bin_name),
)


@settings(max_examples=60, deadline=None)
@given(
    ns=st.text(alphabet="abcdefgh", min_size=1, max_size=12),
    set_name=st.text(alphabet="abcdefgh", min_size=1, max_size=12),
    entries=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=0xFFFFFFFF),   # index
            st.binary(min_size=4, max_size=24),               # key seed
            st.lists(_op_strategy, max_size=5),               # ops
            st.integers(min_value=0, max_value=0xFFFFFFFF),   # ttl
            st.one_of(st.none(),
                      st.integers(min_value=0, max_value=0xFFFFFFFF)),
            st.sampled_from(["plain", "create_only", "replace", "delete"]),
        ),
        max_size=6,
    ),
)
def test_wire_batch_write_codec_roundtrip_property(ns, set_name, entries):
    """Batch-write codec property: build -> parse is the identity across
    every op kind, every policy-flag shape, and every gen-flag shape;
    truncating the frame at ANY byte raises the uniform ValueError,
    never struct.error."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    built = []
    for idx, seed, ops, ttl, eg, policy in entries:
        d = aw.key_digest(set_name, seed)
        if policy == "delete":
            built.append((idx, d, [], ttl, eg, False, True, False))
        elif policy == "create_only":
            built.append((idx, d, ops, ttl, eg, True, False, False))
        elif policy == "replace":
            built.append((idx, d, ops, ttl, eg, False, False, True))
        else:
            built.append((idx, d, ops, ttl, eg, False, False, False))
    req = aw.build_batch_write(ns, set_name, built)
    assert aw.parse_batch_write_entries(req[8:]) == built
    body = req[8:]
    for cut in range(22, len(body)):
        try:
            got = aw.parse_batch_write_entries(body[:cut])
        except ValueError:
            continue
        # a shorter prefix may still parse if the batch field closed
        # before the cut — but then it must equal the full result
        assert got is None or got == built


def test_wire_batch_write_op_count_guard():
    """ADVICE r15: an entry with more than 65535 ops raises the
    module's uniform ValueError (the wire op count is a u16), never a
    struct.error out of pack."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    d = aw.key_digest("t", b"guard")
    ops = [("write", "v", b"x")] * 65536
    try:
        aw.build_batch_write("tmx", "t", [(0, d, ops, 0, None)])
        raise AssertionError("65536 ops must be refused")
    except ValueError as e:
        assert "65535" in str(e)
    # exactly 65535 still encodes
    req = aw.build_batch_write("tmx", "t", [(0, d, ops[:65535], 0, None)])
    parsed = aw.parse_batch_write_entries(req[8:])
    assert parsed is not None and len(parsed[0][2]) == 65535


def test_wire_batch_write_replace_touch_checks_stored_record():
    """ADVICE r15: a REPLACE entry whose op list carries a touch must
    check record EXISTENCE against the store, not against the empty
    replace baseline — touch+replace on an existing record applies;
    on an absent record it answers not_found."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")
        d1 = aw.key_digest("t", b"rt1")
        d2 = aw.key_digest("t", b"rt2")
        assert c.wait(c.put(b"rt1", {"old": b"gone", "keep": b"no"}, 9)) == "ok"
        res = c.batch_write([
            # replace an EXISTING record, touch rides along: applies,
            # old bins wiped, only the new bin survives
            (d1, [("touch",), ("write", "v", b"new")], 77, None,
             False, False, True),
            # replace an ABSENT record with a touch: not_found, nothing
            # created
            (d2, [("touch",), ("write", "v", b"x")], 77, None,
             False, False, True),
        ])
        assert res[0][0] == "ok"
        assert res[1][0] == "not_found"
        store = srv.records()
        assert store[("tmx", "t", d1)] == ({"v": b"new"}, 77)
        assert ("tmx", "t", d2) not in store
        c.close()
    finally:
        srv.close()


def test_batch_entry_replay_safe_classification():
    """The in-doubt classifier: delete/replace/create-only and plain
    read/write/touch updates are replay-safe; INCR/APPEND/PREPEND on a
    plain update are not."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        batch_entry_replay_safe as safe,
    )

    d = b"\0" * 20
    assert safe((d, [], 0, None, False, True))                 # delete
    assert safe((d, [("incr", "n", 1)], 0, None, False, False, True))  # replace
    assert safe((d, [("incr", "n", 1)], 0, None, True))        # create-only
    assert safe((d, [("write", "v", b"x"), ("read", "v")], 0, None))
    assert safe((d, [("touch",)], 0, None))
    assert not safe((d, [("incr", "n", 1)], 0, None))
    assert not safe((d, [("append", "v", b"x")], 0, None))
    assert not safe((d, [("write", "v", b"x"), ("prepend", "v", b"y")], 0, None))


def test_cluster_batch_operate_in_doubt_on_dead_reply(monkeypatch):
    """ADVICE r15 (medium): a node that APPLIES a batch but dies before
    the reply drains must not get its non-idempotent entries blindly
    re-issued.  Replay-safe entries (plain writes) retry and land;
    INCR entries answer 'in_doubt' and are applied EXACTLY ONCE on the
    server."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer(owned_partitions=set(range(aw.N_PARTITIONS)))
    try:
        orig = aw.WireClient.batch_write
        state = {"n": 0}

        def dies_after_apply(self, entries):
            res = orig(self, entries)
            state["n"] += 1
            if state["n"] == 1:
                # the server applied and replied, but the router never
                # sees the reply: indistinguishable from a dead node
                raise OSError("connection reset before reply drained")
            return res

        monkeypatch.setattr(aw.WireClient, "batch_write", dies_after_apply)
        router = aw.ClusterRouter([(srv.host, srv.port)], "tmx", "t")
        d_w = aw.key_digest("t", b"idw")
        d_i = aw.key_digest("t", b"idi")
        out = router.batch_operate([
            (d_w, [("write", "v", b"val")], 60, None),
            (d_i, [("incr", "n", 5)], 60, None),
        ])
        # the write replayed (state unchanged by the second apply)
        assert out[d_w][0] == "ok"
        # the INCR surfaced as in_doubt instead of double-applying
        assert out[d_i][0] == "in_doubt"
        store = srv.records()
        assert store[("tmx", "t", d_w)][0] == {"v": b"val"}
        # applied exactly once: 5, not 10
        assert store[("tmx", "t", d_i)][0] == {
            "n": (5).to_bytes(8, "big", signed=True)
        }
        router.close()
    finally:
        srv.close()


def test_cluster_batch_operate_connect_failure_retries_everything():
    """A CONNECT failure proves nothing was sent, so even INCR entries
    re-route after a re-tend — only send/reply failures go in-doubt.
    One cluster node is a dead address; the live node owns everything
    after the re-tend."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw
    import socket

    # reserve a port that refuses connections
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    dead = probe.getsockname()
    probe.close()

    srv = aw.WireServer(owned_partitions=set(range(aw.N_PARTITIONS)))
    try:
        router = aw.ClusterRouter([(srv.host, srv.port)], "tmx", "t")
        # poison half the map toward the dead address
        router.nodes = [(srv.host, srv.port), dead]
        for p in range(0, aw.N_PARTITIONS, 2):
            router.pmap[p] = 1
        d_i = aw.key_digest("t", b"cfi")
        out = router.batch_operate([(d_i, [("incr", "n", 3)], 60, None)])
        assert out[d_i][0] == "ok"
        store = srv.records()
        assert store[("tmx", "t", d_i)][0] == {
            "n": (3).to_bytes(8, "big", signed=True)
        }
        router.close()
    finally:
        srv.close()


def test_wire_cdt_op_codec_roundtrip():
    """CDT op encode -> decode is the identity for every list/map
    sub-op; malformed CDT payloads raise the uniform ValueError."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    ops = [
        ("list_append", "names", b"zeta"),
        ("list_append", "names", b""),
        ("list_size", "names"),
        ("list_get_rank", "names", 0),
        ("list_get_rank", "names", -1),
        ("map_put", "cols", b"a", b"1.00"),
        ("map_put", "cols", b"", b""),
        ("map_incr", "stats", b"n", -(2**63)),
        ("map_get", "cols", b"a"),
        ("map_size", "cols"),
    ]
    for o in ops:
        enc = aw.encode_op(o)
        dec, off = aw.decode_op(enc, 0)
        assert dec == o and off == len(enc)
        # truncation at any byte is the uniform ValueError
        for cut in range(len(enc)):
            try:
                got, end = aw.decode_op(enc[:cut], 0)
                assert end <= cut
            except ValueError:
                pass


def test_wire_cdt_particle_codec():
    """pack/unpack list+map: canonical (sorted) storage, and a
    non-collection blob answers None (-> RC_BIN_TYPE), never raises."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    assert aw.unpack_list(aw.pack_list([b"b", b"a", b"a"])) == [b"a", b"a", b"b"]
    assert aw.unpack_map(aw.pack_map({b"k2": b"v", b"k1": b""})) == {
        b"k1": b"", b"k2": b"v",
    }
    assert aw.pack_list([b"b", b"a"]) == aw.pack_list([b"a", b"b"])
    for blob in (b"", b"blob", b"\x00" * 8, b"LST1\x00\x00\x00\x09x",
                 b"MAP1\x00\x00\x00\x01\x00\x00\x00\x09k"):
        assert aw.unpack_list(blob) is None or blob[:4] == b"LST1"
        assert aw.unpack_map(blob) is None or blob[:4] == b"MAP1"
    # truncated entries under a valid magic are None, not an exception
    assert aw.unpack_list(b"LST1\x00\x00\x00\x09x") is None
    assert aw.unpack_map(b"MAP1\x00\x00\x00\x01\x00\x00\x00\x09k") is None


def test_wire_cdt_semantics_end_to_end():
    """The CDT family over a live server: K-ordered list ranks, map
    put/incr/get/size, per-op results keyed by bin, the type refusal
    applying NOTHING (gen unmoved), and CDT reads classified as reads
    (a pure-CDT-read on an absent key answers not_found, never
    creates)."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "t")

        def op(key, ops, ttl=0, eg=None):
            return c.wait_operate(c.operate(key, ops, ttl, expect_gen=eg))

        st, gen, _t, bins = op(b"k1", [
            ("list_append", "names", b"zeta"),
            ("list_append", "names", b"alpha"),
            ("list_append", "names", b"midge"),
            ("map_put", "cols", b"alpha", b"1.50"),
            ("map_incr", "stats", b"n", 2),
        ], ttl=60)
        assert (st, gen) == ("ok", 1)
        assert bins["names"] == (3).to_bytes(8, "big")   # list size result
        assert bins["stats"] == (2).to_bytes(8, "big", signed=True)
        assert op(b"k1", [("list_get_rank", "names", 0)])[3] == {"names": b"alpha"}
        assert op(b"k1", [("list_get_rank", "names", -1)])[3] == {"names": b"zeta"}
        assert op(b"k1", [("list_get_rank", "names", 5)])[3] == {}  # out of range
        assert op(b"k1", [("map_get", "cols", b"alpha")])[3] == {"cols": b"1.50"}
        assert op(b"k1", [("map_get", "cols", b"nope")])[3] == {}
        assert op(b"k1", [("map_size", "cols")])[3] == {"cols": (1).to_bytes(8, "big")}
        # map_incr accumulates inside the map
        st, gen, _t, bins = op(b"k1", [("map_incr", "stats", b"n", 5)], ttl=60)
        assert bins["stats"] == (7).to_bytes(8, "big", signed=True)
        # the CDT type refusal: a list op against the map bin applies
        # NOTHING — gen unmoved, map intact
        st, *_ = op(b"k1", [("list_append", "cols", b"x"),
                            ("map_incr", "stats", b"n", 100)], ttl=60)
        assert st == "bin_type"
        st, gen2, _t, bins = op(b"k1", [("map_get", "stats", b"n")])
        assert bins["stats"] == (7).to_bytes(8, "big", signed=True)
        assert gen2 == gen
        # a pure-CDT-read on an absent key is a READ: not_found
        st, *_ = op(b"k-absent", [("list_size", "names")])
        assert st == "not_found"
        assert ("tmx", "t", aw.key_digest("t", b"k-absent")) not in srv.records()
        c.close()
    finally:
        srv.close()


def test_batch_entry_replay_safe_cdt_kinds():
    """CDT replay classification: map_put and the CDT reads are
    replay-safe; list_append and map_incr are not."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        batch_entry_replay_safe as safe,
    )

    d = b"\0" * 20
    assert safe((d, [("map_put", "b", b"k", b"v"), ("map_get", "b", b"k")], 0, None))
    assert safe((d, [("list_size", "b"), ("list_get_rank", "b", 0),
                     ("map_size", "b")], 0, None))
    assert not safe((d, [("list_append", "b", b"x")], 0, None))
    assert not safe((d, [("map_incr", "b", b"k", 1)], 0, None))
    # under replace/create-only even RMW CDT entries are replay-safe
    assert safe((d, [("list_append", "b", b"x")], 0, None, True))
    assert safe((d, [("map_incr", "b", b"k", 1)], 0, None, False, False, True))


def test_wire_paged_scan_resume_contract():
    """Round 16 resumable scans: the stream is totally ordered by
    (pid, digest); max_records caps a page; a resume cursor continues
    strictly after it ON A FRESH CONNECTION (the 20-byte bookmark is
    the whole client-side state); re-issuing a page returns the
    identical page; an out-of-range cursor answers PARAMETER error."""
    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "pg")
        for i in range(40):
            assert c.wait(c.put(f"k{i}".encode(), {"v": b"%d" % i}, 0)) == "ok"
        full = list(c.scan())
        order = [(aw.partition_id(d), d) for d, _, _ in full]
        assert order == sorted(order)  # total (pid, digest) order
        c.close()

        # page through on a FRESH connection per page
        pages, cursor = [], None
        while True:
            pc = aw.WireClient(srv.host, srv.port, "tmx", "pg")
            page = list(pc.scan(resume_digest=cursor, max_records=7))
            pc.close()
            pages.append(page)
            if len(page) < 7:
                break
            cursor = page[-1][0]
        assert [r for p in pages for r in p] == full
        assert all(len(p) == 7 for p in pages[:-1])

        # a re-issued page (speculative task retry) is identical
        pc = aw.WireClient(srv.host, srv.port, "tmx", "pg")
        again = list(pc.scan(resume_digest=pages[0][-1][0], max_records=7))
        pc.close()
        assert again == pages[1]

        # pagination composes with a pid range; cursor outside the
        # request's own range answers PARAMETER
        mid_d = full[len(full) // 2][0]
        mid_pid = aw.partition_id(mid_d)
        rc = aw.WireClient(srv.host, srv.port, "tmx", "pg")
        in_r = list(rc.scan(mid_pid, 1, resume_digest=mid_d))
        assert all(aw.partition_id(d) == mid_pid for d, _, _ in in_r)
        assert mid_d not in [d for d, _, _ in in_r]  # strictly after
        rc.close()
        rc = aw.WireClient(srv.host, srv.port, "tmx", "pg")
        try:
            list(rc.scan((mid_pid + 1) % 4096, 1, resume_digest=mid_d))
            raise AssertionError("out-of-range cursor must fail")
        except RuntimeError as e:
            assert f"rc {aw.RC_PARAMETER}" in str(e)
        finally:
            rc.close()

        # grammar roundtrip + guards
        req = aw.build_scan("tmx", "pg", resume_digest=mid_d, max_records=7)
        assert aw.parse_scan_resume(req[8:]) == mid_d
        assert aw.parse_scan_max_records(req[8:]) == 7
        plain = aw.build_scan("tmx", "pg")
        assert aw.parse_scan_resume(plain[8:]) is None
        assert aw.parse_scan_max_records(plain[8:]) is None
        unlim = aw.build_scan("tmx", "pg", max_records=0)
        assert aw.parse_scan_max_records(unlim[8:]) is None  # 0 = unlimited
        for bad in (b"short", b"x" * 21):
            try:
                aw.build_scan("tmx", "pg", resume_digest=bad)
                raise AssertionError("bad digest must raise")
            except ValueError:
                pass
        try:
            aw.build_scan("tmx", "pg", max_records=1 << 64)
            raise AssertionError("oversize max_records must raise")
        except ValueError:
            pass
    finally:
        srv.close()


def test_wire_sindex_cdt_context():
    """Round 16 sindex-on-CDT: an index created with a map-key context
    serves range queries over the VALUE AT THAT KEY inside the bin's
    K-ordered map particle; queries with a different (or no) context
    answer INDEX_NOT_FOUND; non-map particles and maps missing the key
    are simply not in the index."""
    import struct

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "cdt")
        for i in range(10):
            m = {b"price": struct.pack(">q", i * 10), b"qty": struct.pack(">q", i)}
            assert c.wait(c.put(f"m{i}".encode(), {"attrs": aw.pack_map(m)}, 0)) == "ok"
        # a record whose attrs bin is NOT a map, and one missing the key
        assert c.wait(c.put(b"blob", {"attrs": b"not-a-map"}, 0)) == "ok"
        assert c.wait(
            c.put(b"nokey", {"attrs": aw.pack_map({b"qty": struct.pack(">q", 3)})}, 0)
        ) == "ok"

        rng = aw.encode_index_range("attrs", 20, 50, ctx_map_key=b"price")
        # context index not created yet -> INDEX_NOT_FOUND, even though
        # a plain attrs index exists
        c.sindex_create("attrs", numeric=True)
        try:
            list(c.query(rng))
            raise AssertionError("context query must need the context index")
        except RuntimeError as e:
            assert "needs a secondary index" in str(e)
        c.sindex_create("attrs", numeric=True, ctx_map_key=b"price")
        got = sorted(
            int.from_bytes(aw.unpack_map(b["attrs"])[b"price"], "big")
            for _, _, b in c.query(rng)
        )
        assert got == [20, 30, 40, 50]  # i in 2..5; blob/nokey excluded
        # the plain (no-context) index still serves nothing useful here
        # but remains a distinct registry entry: a no-context query on
        # attrs is served (registry hit) and matches no record (the
        # map particle is never 8 bytes)
        assert list(c.query(aw.encode_index_range("attrs", 0, 1 << 40))) == []
        # codec roundtrip incl. context, and the blob-eq form
        parsed = aw.parse_index_range(
            aw.build_query("tmx", "cdt", rng)[8:]
        )
        assert parsed == ("attrs", aw.EXP_TYPE_INT, 20, 50, None, b"price")
        rng_eq = aw.encode_index_range("attrs", eq=b"x", ctx_map_key=b"tag")
        parsed = aw.parse_index_range(aw.build_query("tmx", "cdt", rng_eq)[8:])
        assert parsed == ("attrs", aw.EXP_TYPE_BLOB, None, None, b"x", b"tag")
        # malformed context suffix raises
        try:
            aw.parse_index_range(
                aw.build_query("tmx", "cdt", rng + b"\x07")[8:]
            )
            raise AssertionError("trailing garbage must raise")
        except ValueError:
            pass
        for bad in (b"", b"x" * 256):
            try:
                aw.encode_index_range("attrs", 0, 1, ctx_map_key=bad)
                raise AssertionError("bad ctx key must raise")
            except ValueError:
                pass
        c.close()
    finally:
        srv.close()


def test_wire_query_pagination_rides_the_scan_path():
    """Round 16: secondary-index queries page and resume exactly like
    scans — the server path is shared, so max_records caps a query
    page and the digest cursor resumes it on a fresh connection."""
    import struct

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "qpg")
        for i in range(30):
            assert c.wait(
                c.put(f"q{i}".encode(), {"s": struct.pack(">q", i % 3)}, 0)
            ) == "ok"
        c.sindex_create("s", numeric=True)
        rng = aw.encode_index_range("s", 0, 1)  # 20 of 30 records
        full = list(c.query(rng))
        assert len(full) == 20
        c.close()
        pages, cursor = [], None
        while True:
            pc = aw.WireClient(srv.host, srv.port, "tmx", "qpg")
            page = list(pc.query(rng, resume_digest=cursor, max_records=6))
            pc.close()
            pages.append(page)
            if len(page) < 6:
                break
            cursor = page[-1][0]
        assert [r for p in pages for r in p] == full
        assert all(len(p) == 6 for p in pages[:-1])
    finally:
        srv.close()


@settings(max_examples=25, deadline=None)
@given(
    n_records=st.integers(min_value=0, max_value=60),
    page_size=st.integers(min_value=1, max_value=17),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_wire_paged_scan_reassembly_property(n_records, page_size, seed):
    """Property: for ANY record population and page size, paging a
    scan with the digest cursor reassembles exactly the unbounded
    stream — same records, same order, no dups, no gaps — and every
    non-final page is exactly full."""
    import random

    from cassandra2aerospike_spark.sinks import aerospike_wire as aw

    rng = random.Random(seed)
    srv = aw.WireServer()
    try:
        c = aw.WireClient(srv.host, srv.port, "tmx", "prop")
        for i in range(n_records):
            bins = {
                f"b{j}": rng.randbytes(rng.randrange(1, 9))
                for j in range(rng.randrange(1, 4))
            }
            assert c.wait(c.put(b"k%d" % i, bins, rng.randrange(0, 1000))) == "ok"
        full = list(c.scan())
        pages, cursor = [], None
        while True:
            page = list(c.scan(resume_digest=cursor, max_records=page_size))
            pages.append(page)
            if len(page) < page_size:
                break
            cursor = page[-1][0]
        assert [r for p in pages for r in p] == full
        assert all(len(p) == page_size for p in pages[:-1])
        assert len(pages[-1]) < page_size
        c.close()
    finally:
        srv.close()
