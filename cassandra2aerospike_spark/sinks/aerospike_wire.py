"""REAL Aerospike wire protocol (v2 AS_MSG), pure Python — client + an
in-process protocol server, so the S11/S12 sink semantics run over an
actual TCP socket instead of a simulated `put` callable.

The reference writes through the C client (`aerospike_key_put_async`,
AerospikeWriter.cpp:216-253) with `policies.write.exists =
AS_POLICY_EXISTS_CREATE` (Cassandra2Aerospike.cpp:245); this module
speaks the same PUBLIC on-wire message format the client library emits:

  proto header   8B:  version=2, type=3 (AS_MSG), 48-bit BE body size
  msg header    22B:  header_sz, info1..3, unused, result_code,
                      generation u32, record_ttl u32, transaction_ttl
                      u32, n_fields u16, n_ops u16  (all BE)
  field:  u32 size (covers type byte + data), u8 type, data
          types used: 0 namespace, 1 set, 4 digest (20B RIPEMD-160)
  op:     u32 size (covers bytes after it), u8 op (2=WRITE),
          u8 particle type (4=BLOB), u8 version, u8 name_len,
          name, value

Key digest = RIPEMD160(set_bytes + particle_type_byte + key_bytes)
with particle type 4 (blob) for raw keys — the C client's
`as_key_init_rawp` digest recipe.  CREATE-only rides info2 bit 0x20;
the server answers result code 5 (KEY_EXISTS) for a second create of
the same digest, which the client maps to `exists` exactly as the
reference maps AEROSPIKE_ERR_RECORD_EXISTS / _RECORD_BUSY
(AerospikeWriter.cpp:142-148); codes 9/11/14-style transient errors
map to `retry` (AerospikeWriter.cpp:150-161's transient set).

The in-process server (`WireServer`) parses the request grammar
INDEPENDENTLY of the client builder (shared constants only) and
enforces create-only against its store — tests drive the full
Spark `foreachPartition` -> socket -> server -> store loop, including
deterministic transient-failure injection.  Pipelining: requests are
answered in arrival order on one connection, so the bounded-async
writer's handle is simply the send ordinal (S12's in-flight window
becomes genuine socket pipelining, like the C client's
`pipeline_listener`).
"""

from __future__ import annotations

import hashlib
import socket
import socketserver
import struct
import threading

PROTO_VERSION = 2
MSG_TYPE = 3
ADMIN_MSG_TYPE = 2  # the security/admin channel (AS_ADMIN_MESSAGE_TYPE)
INFO_MSG_TYPE = 1  # the text info channel (AS_INFO_MESSAGE_TYPE)
# the compressed envelope (AS_COMPRESSED_MESSAGE_TYPE): body = u64
# uncompressed size + zlib deflate of a complete inner proto frame —
# what the C client emits with enable_compression for messages above
# its size floor
COMPRESSED_MSG_TYPE = 4

# admin commands (public security protocol, AdminCommand.java /
# as_admin.c)
ADMIN_AUTHENTICATE = 0
ADMIN_LOGIN = 20
# admin field ids
ADMIN_FIELD_USER = 0
ADMIN_FIELD_CREDENTIAL = 3
ADMIN_FIELD_CLEAR_PASSWORD = 4
ADMIN_FIELD_SESSION_TOKEN = 5
ADMIN_FIELD_SESSION_TTL = 6
# security result codes (shared server enum)
RC_INVALID_USER = 60
RC_INVALID_CREDENTIAL = 65
RC_EXPIRED_SESSION = 66
RC_NOT_AUTHENTICATED = 80

N_PARTITIONS = 4096  # the cluster's fixed partition count


def partition_id(digest: bytes, n_partitions: int = N_PARTITIONS) -> int:
    """Aerospike partition of a key digest: the little-endian u32 of
    the first four digest bytes masked to the 4096-partition ring
    (as_partition_getid) — what the reference's C client consults its
    partition map with under aerospike_key_put_async
    (AerospikeWriter.cpp:216-256)."""
    return int.from_bytes(digest[:4], "little") & (n_partitions - 1)

FIELD_NAMESPACE = 0
FIELD_SET = 1
FIELD_DIGEST = 4
# the partition-filter field of modern scans (the public
# as_partition_filter concept: scans address partition ranges so task
# parallelism scales with the 4096-partition ring, not the node count);
# payload = two BE u16s (begin_pid, count)
# the secondary-index query range (the public AS_FIELD_INDEX_RANGE
# slot): a query (as_query) is a set-addressed read whose INDEX_RANGE
# field names an indexed bin and its predicate — int range or blob
# equality; the server answers AEROSPIKE_ERR_INDEX_NOT_FOUND when no
# secondary index exists on that bin
FIELD_INDEX_RANGE = 22
FIELD_PID_RANGE = 24
# the scan-resume cursor + page cap (the public AS_FIELD_DIGEST_ARRAY /
# AS_FIELD_MAX_RECORDS slots): a resumable scan streams its partition
# range in a TOTAL (pid, digest) order; a page returns at most
# max-records records; the next page re-addresses the SAME range
# carrying the last digest received, and the server resumes strictly
# after it.  The 20-byte cursor is the only client-side state, so an
# interrupted — or speculatively re-executed — scan task resumes (or
# idempotently re-reads its page) instead of re-reading the range.
# House subset of the public grammar: ONE digest in the array (the
# range's total order makes one cursor sufficient; the real client
# tracks one per partition); max-records is a BE u64 like the public
# field, 0 = unlimited.
FIELD_DIGEST_ARRAY = 12
FIELD_MAX_RECORDS = 13
# the batch-index field (the public AS_FIELD_BATCH_INDEX concept): one
# field packs every digest of a batch read; payload = BE u32 count then
# count x (BE u32 index + 20B digest) — the namespace/set ride the
# shared fields once, the protocol's "repeat" compression for the
# common all-same-set batch
FIELD_BATCH_INDEX = 40
# the expression-filter field (the public AS_FIELD_FILTER slot): a
# serialized predicate the SERVER evaluates per record before shipping
# it — scans prune row count server-side the way projection (OP_READ
# ops) prunes width.  The op-code values below are the public as_exp
# codes; values are carried in a compact TLV (the real client inlines
# them as msgpack — the op semantics, not the value wrapping, are the
# contract under test)
FIELD_FILTER_EXP = 43

EXP_CMP_EQ = 1
EXP_CMP_NE = 2
EXP_CMP_GT = 3
EXP_CMP_GE = 4
EXP_CMP_LT = 5
EXP_CMP_LE = 6
EXP_AND = 16
EXP_OR = 17
EXP_NOT = 18
EXP_BIN = 81
EXP_BIN_TYPE = 82
# local TLV tags for inline literal values (msgpack stand-ins)
EXP_VAL_INT = 126
EXP_VAL_BLOB = 127
EXP_TYPE_INT = 1  # as_exp result types for EXP_BIN
EXP_TYPE_BLOB = 4

OP_READ = 1
OP_WRITE = 2
# the arithmetic read-modify-write op (AS_MSG's add operation): the
# server adds the request's signed integer to the stored integer bin
# atomically — the counter primitive aerospike_key_operate rides
OP_INCR = 5
# byte-level read-modify-write: concatenate onto the stored bin
OP_APPEND = 9
OP_PREPEND = 10
# the TTL-refresh op (AS_MSG's touch operation): resets the record's
# ttl to the request header's record_ttl and bumps the generation
# WITHOUT carrying or rewriting bins — the cheap "keep this record
# alive" sweep ttl-based retention runs
OP_TOUCH = 11
# the CDT (collection data type) op codes — AS_MSG's cdt-read /
# cdt-modify operations, the list/map op family the public client
# rides for ordered-list and map sub-transactions (round 16).  The
# real client packs each sub-op's code + parameters as msgpack inside
# the op value; this module carries the same (sub-op byte, parameters)
# information in its uniform length-prefixed framing instead — same
# shape, same per-op result discipline, no msgpack dependency.
OP_CDT_READ = 3
OP_CDT_MODIFY = 4
PARTICLE_INTEGER = 1
PARTICLE_BLOB = 4
# the CDT particle types (as_particle: map 19, list 20)
PARTICLE_MAP = 19
PARTICLE_LIST = 20

# CDT sub-op codes (module-local; the public grammar's list/map op
# families, one byte leading the op value)
CDT_LIST_APPEND = 1
CDT_LIST_SIZE = 2
CDT_LIST_GET_RANK = 3
CDT_MAP_PUT = 4
CDT_MAP_INCR = 5
CDT_MAP_GET = 6
CDT_MAP_SIZE = 7

# op kinds whose application reads but never mutates — the has_write /
# info-flag classification shared by build_operate, the server's
# operate and batch-write paths, and the replay-safety classifier
READ_OP_KINDS = frozenset(
    {"read", "list_size", "list_get_rank", "map_get", "map_size"}
)

INFO1_READ = 0x01
INFO1_GET_ALL = 0x02
# the batch-index read flag (AS_MSG_INFO1_BATCH, 1 << 3): one request
# carries MANY digests and the node answers a multi-record stream —
# the protocol the real client's batch-node split rides
INFO1_BATCH = 0x08
# metadata-only read (AS_MSG_INFO1_GET_NOBINDATA): the response carries
# result code + generation + ttl but NO bins — the aerospike_key_exists
# probe, and the cheapest read a CAS loop can start from
INFO1_NOBINDATA = 0x20
INFO2_WRITE = 0x01
INFO2_DELETE = 0x02
# write only if the record's current generation equals the request
# header's generation (AS_MSG_INFO2_GENERATION — the public
# check-and-set write policy AS_POLICY_GEN_EQ rides on); a mismatch
# answers AEROSPIKE_ERR_RECORD_GENERATION
INFO2_GENERATION = 0x04
INFO2_CREATE_ONLY = 0x20
INFO3_LAST = 0x01  # final message of a multi-record (scan) response

RC_OK = 0
RC_KEY_NOT_FOUND = 2
# the CAS refusal (AEROSPIKE_ERR_RECORD_GENERATION): a gen-checked
# write lost its optimistic race — re-read, reconcile, retry or keep
RC_GENERATION = 3
# AEROSPIKE_ERR_REQUEST_INVALID: a semantically malformed request the
# grammar alone can't reject — e.g. a scan-resume cursor whose digest
# lies outside the request's own partition range
RC_PARAMETER = 4
RC_KEY_EXISTS = 5
RC_TIMEOUT = 9
RC_KEY_BUSY = 14
RC_SERVER_ERROR = 1
# AEROSPIKE_ERR_BIN_INCOMPATIBLE_TYPE: an arithmetic op (OP_INCR)
# against a bin whose stored particle is not an integer
RC_BIN_TYPE = 12
# AEROSPIKE_ERR_INDEX_NOT_FOUND: a query against a bin with no
# secondary index — queries REQUIRE an index (scans don't)
RC_INDEX_NOT_FOUND = 201
# AEROSPIKE_FILTERED_OUT: the record exists but the request's filter
# expression evaluated non-True — distinct from NOT_FOUND so callers
# can tell "no record" from "record excluded by the predicate"
RC_FILTERED_OUT = 27


class _BatchFiltered:
    """Sentinel for ClusterRouter.batch_read: the record exists but the
    request's expression filter excluded it (vs None = no record)."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return "BATCH_FILTERED"

    def __reduce__(self):
        # pickling resolves back to the module global, so `is`
        # comparisons hold across Spark's closure serialization
        # (a pickled copy in an executor closure must be THE sentinel)
        return "BATCH_FILTERED"


BATCH_FILTERED = _BatchFiltered()
# AS_ERR_UNAVAILABLE: the partition is not readable/writable at THIS
# node right now (ownership moved / migration in flight).  The C client
# classifies it retryable and lets its background cluster tend refresh
# the partition map before the retry lands (AerospikeWriter.cpp:150-161
# retries it; the tend loop is the map-refresh half) — so the r12
# client surfaces it as its own 'unavailable' disposition: requeue,
# but re-tend FIRST.
RC_PARTITION_UNAVAILABLE = 11
# the reference's "already exists" pair (AerospikeWriter.cpp:142-148)
EXISTS_CODES = {RC_KEY_EXISTS, RC_KEY_BUSY}
# the reference's transient set (AerospikeWriter.cpp:150-161), minus
# UNAVAILABLE which now classifies separately (see above)
TRANSIENT_CODES = {RC_TIMEOUT}

DIGEST_SIZE = 20

# Replication-op ordering (ADVICE r12): a PROCESS-global monotonic
# sequence — every in-process node draws from the same counter, so the
# order is total even across a partition handoff (the new master's ops
# always outrank the old master's).  itertools.count.__next__ is atomic
# in CPython; masters draw it inside their store critical section, so
# same-key seq order == same-key commit order.
import itertools as _itertools

_REPL_SEQ = _itertools.count(1)


class WireUnavailable(RuntimeError):
    """The node answered AS_ERR_UNAVAILABLE: the partition is not
    served there right now (ownership moved / node degraded).  Read
    paths catch this to fall back — re-tend, or an RF>=2 replica."""


# ------------------------------------------------------------- RIPEMD-160
# hashlib's OpenSSL backend usually provides ripemd160, but OpenSSL 3
# builds may ship without legacy digests — a pure-Python implementation
# of the public RIPEMD-160 algorithm (Dobbertin/Bosselaers/Preneel 1996)
# keeps the digest available everywhere.

_R1 = [11,14,15,12,5,8,7,9,11,13,14,15,6,7,9,8,7,6,8,13,11,9,7,15,7,12,15,9,11,7,13,12,
       11,13,6,7,14,9,13,15,14,8,13,6,5,12,7,5,11,12,14,15,14,15,9,8,9,14,5,6,8,6,5,12,
       9,15,5,11,6,8,13,12,5,12,13,14,11,8,5,6]
_R2 = [8,9,9,11,13,15,15,5,7,7,8,11,14,14,12,6,9,13,15,7,12,8,9,11,7,7,12,7,6,15,13,11,
       9,7,15,11,8,6,6,14,12,13,5,14,13,13,7,5,15,5,8,11,14,14,6,14,6,9,12,9,12,5,15,8,
       8,5,12,9,12,5,14,6,8,13,6,5,15,13,11,11]
_Z1 = [0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,7,4,13,1,10,6,15,3,12,0,9,5,2,14,11,8,
       3,10,14,4,9,15,8,1,2,7,0,6,13,11,5,12,1,9,11,10,0,8,12,4,13,3,7,15,14,5,6,2,
       4,0,5,9,7,12,2,10,14,1,3,8,11,6,15,13]
_Z2 = [5,14,7,0,9,2,11,4,13,6,15,8,1,10,3,12,6,11,3,7,0,13,5,10,14,15,8,12,4,9,1,2,
       15,5,1,3,7,14,6,9,11,8,12,2,10,0,4,13,8,6,4,1,3,11,15,0,5,12,2,13,9,7,10,14,
       12,15,10,4,1,5,8,7,6,2,13,14,0,3,9,11]


def _rol(x: int, n: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF


def _ripemd160_py(data: bytes) -> bytes:
    h = [0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0]
    msg = data + b"\x80" + b"\x00" * ((55 - len(data)) % 64)
    msg += struct.pack("<Q", 8 * len(data))
    K1 = [0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E]
    K2 = [0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000]

    def f(j: int, x: int, y: int, z: int) -> int:
        if j < 16:
            return x ^ y ^ z
        if j < 32:
            return (x & y) | (~x & z)
        if j < 48:
            return (x | ~y) ^ z
        if j < 64:
            return (x & z) | (y & ~z)
        return x ^ (y | ~z)

    for off in range(0, len(msg), 64):
        x = struct.unpack("<16I", msg[off : off + 64])
        a1, b1, c1, d1, e1 = h
        a2, b2, c2, d2, e2 = h
        for j in range(80):
            t = (a1 + f(j, b1, c1, d1) + x[_Z1[j]] + K1[j // 16]) & 0xFFFFFFFF
            t = (_rol(t, _R1[j]) + e1) & 0xFFFFFFFF
            a1, e1, d1, c1, b1 = e1, d1, _rol(c1, 10), b1, t
            t = (a2 + f(79 - j, b2, c2, d2) + x[_Z2[j]] + K2[j // 16]) & 0xFFFFFFFF
            t = (_rol(t, _R2[j]) + e2) & 0xFFFFFFFF
            a2, e2, d2, c2, b2 = e2, d2, _rol(c2, 10), b2, t
        t = (h[1] + c1 + d2) & 0xFFFFFFFF
        h = [
            t,
            (h[2] + d1 + e2) & 0xFFFFFFFF,
            (h[3] + e1 + a2) & 0xFFFFFFFF,
            (h[4] + a1 + b2) & 0xFFFFFFFF,
            (h[0] + b1 + c2) & 0xFFFFFFFF,
        ]
    return struct.pack("<5I", *h)


def ripemd160(data: bytes) -> bytes:
    try:
        return hashlib.new("ripemd160", data).digest()
    except ValueError:  # OpenSSL without legacy digests
        return _ripemd160_py(data)


def key_digest(set_name: str, key: bytes) -> bytes:
    """The C client's as_key digest: RIPEMD160(set + particle + key)."""
    return ripemd160(set_name.encode() + bytes([PARTICLE_BLOB]) + key)


# ---------------------------------------------------------------- codec


def _proto_frame(body: bytes, msg_type: int = MSG_TYPE) -> bytes:
    return struct.pack(">Q", (PROTO_VERSION << 56) | (msg_type << 48) | len(body)) + body


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("aerospike wire: peer closed mid-message")
        buf += chunk
    return bytes(buf)


def compress_frame(frame: bytes) -> bytes:
    """Wrap a complete proto frame in the COMPRESSED proto envelope
    (round 13 — the public AS_COMPRESSED_MSG the C client sends when
    `enable_compression` is on and the message clears its size floor):
    proto type 4, body = BE u64 UNCOMPRESSED length + zlib deflate of
    the whole inner frame.  The peer's read path unwraps transparently,
    so compression composes with every message type."""
    import zlib

    body = struct.pack(">Q", len(frame)) + zlib.compress(frame)
    return _proto_frame(body, COMPRESSED_MSG_TYPE)


def read_frame(sock: socket.socket) -> tuple[int, bytes]:
    """(message type, body) — 3 = AS_MSG data, 2 = admin/security,
    1 = text info.  A COMPRESSED envelope (type 4) is unwrapped
    transparently (see read_frame_ex)."""
    typ, body, _compressed = read_frame_ex(sock)
    return typ, body


def read_frame_ex(sock: socket.socket) -> tuple[int, bytes, bool]:
    """(message type, body, arrived_compressed) — the COMPRESSED
    envelope (type 4) is unwrapped here: its body is the u64
    uncompressed size + zlib deflate of a complete inner frame, which
    is then parsed as usual (size cross-checked — a mismatch is a
    corrupt envelope, not a short read)."""
    (hdr,) = struct.unpack(">Q", _read_exact(sock, 8))
    version, typ = hdr >> 56, (hdr >> 48) & 0xFF
    if version != PROTO_VERSION or typ not in (
        MSG_TYPE, ADMIN_MSG_TYPE, INFO_MSG_TYPE, COMPRESSED_MSG_TYPE,
    ):
        raise ValueError(f"aerospike wire: bad proto header {version}/{typ}")
    body = _read_exact(sock, hdr & 0xFFFFFFFFFFFF)
    if typ != COMPRESSED_MSG_TYPE:
        return typ, body, False
    import zlib

    if len(body) < 8:
        raise ValueError("aerospike wire: short compressed envelope")
    (usize,) = struct.unpack_from(">Q", body, 0)
    # Bound BEFORE inflating: the declared uncompressed size must fit the
    # 48-bit proto body limit, and decompression is capped at usize + 1
    # bytes so a hostile envelope cannot expand into an unbounded
    # allocation (a 1 KiB deflate stream can inflate ~1000x; unbounded
    # zlib.decompress would trust the stream, not the declaration).
    if usize < 8 or usize > 0xFFFFFFFFFFFF:
        raise ValueError("aerospike wire: compressed size out of range")
    try:
        z = zlib.decompressobj()
        inner = z.decompress(body[8:], usize + 1)
    except zlib.error as e:
        raise ValueError(f"aerospike wire: bad compressed body: {e}") from None
    if len(inner) != usize or not z.eof or z.unconsumed_tail or z.unused_data:
        raise ValueError("aerospike wire: compressed size mismatch")
    (ihdr,) = struct.unpack(">Q", inner[:8])
    iversion, ityp = ihdr >> 56, (ihdr >> 48) & 0xFF
    if (
        iversion != PROTO_VERSION
        or ityp not in (MSG_TYPE, ADMIN_MSG_TYPE, INFO_MSG_TYPE)
        or (ihdr & 0xFFFFFFFFFFFF) != len(inner) - 8
    ):
        raise ValueError("aerospike wire: bad inner frame in envelope")
    return ityp, inner[8:], True


def build_put(
    namespace: str,
    set_name: str,
    key: bytes,
    bins: dict[str, bytes],
    ttl: int,
    create_only: bool = True,
    expect_gen: int | None = None,
) -> bytes:
    """One AS_MSG write request.  `ttl` uses the server convention:
    0 = namespace default, 0xFFFFFFFF = never expire, else seconds —
    exactly the reference's rec.ttl mapping (AerospikeWriter.cpp:233-242).
    `expect_gen` (round 13): a CHECK-AND-SET write — INFO2_GENERATION
    plus the expected generation in the header's generation slot (the
    public AS_POLICY_GEN_EQ policy); the server refuses with
    RC_GENERATION when the stored record's generation differs."""
    info2 = INFO2_WRITE | (INFO2_CREATE_ONLY if create_only else 0)
    gen = 0
    if expect_gen is not None:
        info2 |= INFO2_GENERATION
        gen = expect_gen & 0xFFFFFFFF
    fields = []
    for ftype, data in (
        (FIELD_NAMESPACE, namespace.encode()),
        (FIELD_SET, set_name.encode()),
        (FIELD_DIGEST, key_digest(set_name, key)),
    ):
        fields.append(struct.pack(">IB", len(data) + 1, ftype) + data)
    ops = []
    for name, value in bins.items():
        nb = name.encode()
        if len(nb) > 15:
            raise ValueError(f"bin name over 15 bytes: {name!r}")  # server limit
        body = struct.pack("BBBB", OP_WRITE, PARTICLE_BLOB, 0, len(nb)) + nb + value
        ops.append(struct.pack(">I", len(body)) + body)
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, 0, info2, 0, 0, 0, gen, ttl & 0xFFFFFFFF, 1000,
        len(fields), len(ops),
    )
    return _proto_frame(msg + b"".join(fields) + b"".join(ops))


def build_touch(
    namespace: str, set_name: str, key: bytes, ttl: int,
    expect_gen: int | None = None,
) -> bytes:
    """One TOUCH request (round 13): an AS_MSG write carrying a single
    OP_TOUCH op (no name, no value) — the server resets the stored
    record's TTL to the header's record_ttl slot and bumps its
    generation, leaving the bins untouched; KEY_NOT_FOUND for absent
    records.  Composes with the CAS policy (expect_gen) like any
    write."""
    info2 = INFO2_WRITE
    gen = 0
    if expect_gen is not None:
        info2 |= INFO2_GENERATION
        gen = expect_gen & 0xFFFFFFFF
    fields = []
    for ftype, data in (
        (FIELD_NAMESPACE, namespace.encode()),
        (FIELD_SET, set_name.encode()),
        (FIELD_DIGEST, key_digest(set_name, key)),
    ):
        fields.append(struct.pack(">IB", len(data) + 1, ftype) + data)
    op_body = struct.pack("BBBB", OP_TOUCH, 0, 0, 0)
    ops = [struct.pack(">I", len(op_body)) + op_body]
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, 0, info2, 0, 0, 0, gen, ttl & 0xFFFFFFFF, 1000,
        len(fields), len(ops),
    )
    return _proto_frame(msg + b"".join(fields) + b"".join(ops))


def parse_has_touch(frame: bytes) -> bool:
    """Server-side: does this write request carry an OP_TOUCH op?
    (Bounds-checked walk of the op list; malformed frames answer False
    and fall through to the normal put parse, which raises.)"""
    if len(frame) < 22:
        return False
    n_fields, n_ops = struct.unpack_from(">HH", frame, 18)
    off = 22
    for _ in range(n_fields):
        if off + 5 > len(frame):
            return False
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            return False
        off += 4 + sz
    for _ in range(n_ops):
        if off + 8 > len(frame):
            return False
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 4 or off + 4 + sz > len(frame):
            return False
        if frame[off + 4] == OP_TOUCH:
            return True
        off += 4 + sz
    return False


def parse_put_gen(frame: bytes) -> int | None:
    """The server-side half of the CAS grammar: the EXPECTED generation
    of a gen-checked write (INFO2_GENERATION set), else None."""
    if len(frame) < 22 or not frame[2] & INFO2_GENERATION:
        return None
    return struct.unpack_from(">I", frame, 6)[0]


# ------------------------------------------------ CDT particle codec
# Canonical stored representation of the two collection particles
# (round 16): a 4-byte magic + length-prefixed entries, elements (and
# map keys) kept SORTED — the K-ordered list/map the public server
# stores, which makes get-by-rank an index lookup and the packed bytes
# deterministic (replication equality, scan/backup round trips, and
# the relational oracle all compare bytes).  unpack_* answer None on a
# non-collection particle so callers map it to RC_BIN_TYPE, matching
# how OP_INCR treats a non-8-byte bin.

_LIST_MAGIC = b"LST1"
_MAP_MAGIC = b"MAP1"


def pack_list(elems: list[bytes]) -> bytes:
    out = bytearray(_LIST_MAGIC)
    for e in sorted(elems):
        out += struct.pack(">I", len(e)) + e
    return bytes(out)


def unpack_list(blob: bytes) -> list[bytes] | None:
    if blob[:4] != _LIST_MAGIC:
        return None
    out: list[bytes] = []
    off = 4
    while off < len(blob):
        if off + 4 > len(blob):
            return None
        (sz,) = struct.unpack_from(">I", blob, off)
        if off + 4 + sz > len(blob):
            return None
        out.append(blob[off + 4 : off + 4 + sz])
        off += 4 + sz
    return out


def pack_map(m: dict[bytes, bytes]) -> bytes:
    out = bytearray(_MAP_MAGIC)
    for k in sorted(m):
        v = m[k]
        out += struct.pack(">II", len(k), len(v)) + k + v
    return bytes(out)


def unpack_map(blob: bytes) -> dict[bytes, bytes] | None:
    if blob[:4] != _MAP_MAGIC:
        return None
    out: dict[bytes, bytes] = {}
    off = 4
    while off < len(blob):
        if off + 8 > len(blob):
            return None
        kl, vl = struct.unpack_from(">II", blob, off)
        if off + 8 + kl + vl > len(blob):
            return None
        out[blob[off + 8 : off + 8 + kl]] = blob[off + 8 + kl : off + 8 + kl + vl]
        off += 8 + kl + vl
    return out


def encode_op(o: tuple) -> bytes:
    """One op of the operate grammar, length-prefixed — the SAME
    encoding whether the op rides a single OPERATE transaction or a
    batch-write entry's sub-transaction (the public protocol reuses
    the as_msg op framing in both places).  CDT kinds (round 16):
    ('list_append', bin, elem) | ('list_size', bin) |
    ('list_get_rank', bin, rank) | ('map_put', bin, key, value) |
    ('map_incr', bin, key, delta) | ('map_get', bin, key) |
    ('map_size', bin)."""
    kind = o[0]
    if kind == "touch":
        body = struct.pack("BBBB", OP_TOUCH, 0, 0, 0)
    else:
        nb = o[1].encode()
        if len(nb) > 15:
            raise ValueError(f"bin name over 15 bytes: {o[1]!r}")
        if kind == "read":
            body = struct.pack("BBBB", OP_READ, 0, 0, len(nb)) + nb
        elif kind == "write":
            body = (
                struct.pack("BBBB", OP_WRITE, PARTICLE_BLOB, 0, len(nb))
                + nb + o[2]
            )
        elif kind == "incr":
            body = (
                struct.pack("BBBB", OP_INCR, PARTICLE_INTEGER, 0, len(nb))
                + nb + struct.pack(">q", o[2])
            )
        elif kind == "append":
            body = (
                struct.pack("BBBB", OP_APPEND, PARTICLE_BLOB, 0, len(nb))
                + nb + o[2]
            )
        elif kind == "prepend":
            body = (
                struct.pack("BBBB", OP_PREPEND, PARTICLE_BLOB, 0, len(nb))
                + nb + o[2]
            )
        elif kind == "list_append":
            body = (
                struct.pack("BBBB", OP_CDT_MODIFY, PARTICLE_LIST, 0, len(nb))
                + nb + bytes([CDT_LIST_APPEND])
                + struct.pack(">I", len(o[2])) + o[2]
            )
        elif kind == "list_size":
            body = (
                struct.pack("BBBB", OP_CDT_READ, PARTICLE_LIST, 0, len(nb))
                + nb + bytes([CDT_LIST_SIZE])
            )
        elif kind == "list_get_rank":
            body = (
                struct.pack("BBBB", OP_CDT_READ, PARTICLE_LIST, 0, len(nb))
                + nb + bytes([CDT_LIST_GET_RANK]) + struct.pack(">q", o[2])
            )
        elif kind == "map_put":
            body = (
                struct.pack("BBBB", OP_CDT_MODIFY, PARTICLE_MAP, 0, len(nb))
                + nb + bytes([CDT_MAP_PUT])
                + struct.pack(">II", len(o[2]), len(o[3])) + o[2] + o[3]
            )
        elif kind == "map_incr":
            body = (
                struct.pack("BBBB", OP_CDT_MODIFY, PARTICLE_MAP, 0, len(nb))
                + nb + bytes([CDT_MAP_INCR])
                + struct.pack(">I", len(o[2])) + o[2] + struct.pack(">q", o[3])
            )
        elif kind == "map_get":
            body = (
                struct.pack("BBBB", OP_CDT_READ, PARTICLE_MAP, 0, len(nb))
                + nb + bytes([CDT_MAP_GET])
                + struct.pack(">I", len(o[2])) + o[2]
            )
        elif kind == "map_size":
            body = (
                struct.pack("BBBB", OP_CDT_READ, PARTICLE_MAP, 0, len(nb))
                + nb + bytes([CDT_MAP_SIZE])
            )
        else:
            raise ValueError(f"unknown operate op kind: {kind!r}")
    return struct.pack(">I", len(body)) + body


def decode_op(buf: bytes, off: int) -> tuple[tuple, int]:
    """The inverse of encode_op: (op tuple, next offset).  Bounds-
    checked with the uniform ValueError so truncated frames surface as
    RC_SERVER_ERROR, never a struct.error killing the handler."""
    if off + 8 > len(buf):
        raise ValueError("aerospike wire: truncated operate op")
    (sz,) = struct.unpack_from(">I", buf, off)
    if sz < 4 or off + 4 + sz > len(buf):
        raise ValueError("aerospike wire: truncated operate op")
    op, _ptype, _ver, nlen = struct.unpack_from("BBBB", buf, off + 4)
    if 4 + nlen > sz:
        raise ValueError("aerospike wire: operate op name overruns op")
    name = buf[off + 8 : off + 8 + nlen].decode()
    value = buf[off + 8 + nlen : off + 4 + sz]
    off += 4 + sz
    if op == OP_READ:
        return ("read", name), off
    if op == OP_WRITE:
        return ("write", name, value), off
    if op == OP_INCR:
        if len(value) != 8:
            raise ValueError("aerospike wire: OP_INCR delta must be 8 bytes")
        return ("incr", name, struct.unpack(">q", value)[0]), off
    if op == OP_APPEND:
        return ("append", name, value), off
    if op == OP_PREPEND:
        return ("prepend", name, value), off
    if op == OP_TOUCH:
        return ("touch",), off
    if op in (OP_CDT_READ, OP_CDT_MODIFY):
        if not value:
            raise ValueError("aerospike wire: CDT op carries no sub-op")
        sub, params = value[0], value[1:]

        def framed(buf_: bytes, pos: int) -> tuple[bytes, int]:
            if pos + 4 > len(buf_):
                raise ValueError("aerospike wire: truncated CDT param")
            (n,) = struct.unpack_from(">I", buf_, pos)
            if pos + 4 + n > len(buf_):
                raise ValueError("aerospike wire: truncated CDT param")
            return buf_[pos + 4 : pos + 4 + n], pos + 4 + n

        if sub == CDT_LIST_APPEND and op == OP_CDT_MODIFY:
            elem, end = framed(params, 0)
            if end != len(params):
                raise ValueError("aerospike wire: CDT list-append overrun")
            return ("list_append", name, elem), off
        if sub == CDT_LIST_SIZE and op == OP_CDT_READ:
            if params:
                raise ValueError("aerospike wire: CDT list-size overrun")
            return ("list_size", name), off
        if sub == CDT_LIST_GET_RANK and op == OP_CDT_READ:
            if len(params) != 8:
                raise ValueError("aerospike wire: CDT rank must be 8 bytes")
            return ("list_get_rank", name, struct.unpack(">q", params)[0]), off
        if sub == CDT_MAP_PUT and op == OP_CDT_MODIFY:
            if len(params) < 8:
                raise ValueError("aerospike wire: truncated CDT map-put")
            kl, vl = struct.unpack_from(">II", params, 0)
            if 8 + kl + vl != len(params):
                raise ValueError("aerospike wire: CDT map-put overrun")
            return ("map_put", name, params[8 : 8 + kl],
                    params[8 + kl : 8 + kl + vl]), off
        if sub == CDT_MAP_INCR and op == OP_CDT_MODIFY:
            k, end = framed(params, 0)
            if end + 8 != len(params):
                raise ValueError("aerospike wire: CDT map-incr overrun")
            return ("map_incr", name, k,
                    struct.unpack_from(">q", params, end)[0]), off
        if sub == CDT_MAP_GET and op == OP_CDT_READ:
            k, end = framed(params, 0)
            if end != len(params):
                raise ValueError("aerospike wire: CDT map-get overrun")
            return ("map_get", name, k), off
        if sub == CDT_MAP_SIZE and op == OP_CDT_READ:
            if params:
                raise ValueError("aerospike wire: CDT map-size overrun")
            return ("map_size", name), off
        raise ValueError(f"aerospike wire: unknown CDT sub-op {sub}")
    raise ValueError(f"aerospike wire: unknown operate op {op}")


def build_operate(
    namespace: str,
    set_name: str,
    key: bytes,
    ops: list[tuple],
    ttl: int = 0,
    expect_gen: int | None = None,
) -> bytes:
    """One OPERATE request (round 14) — the aerospike_key_operate
    multi-op transaction: a SINGLE AS_MSG carrying an ordered op list
    the server applies atomically, answering the read ops' values in
    one record response.  The read-modify-write primitive: no separate
    get + put race window, one network round trip.  `ops` entries:
    ('read', name) | ('write', name, value) | ('incr', name, delta) |
    ('append', name, value) | ('prepend', name, value) | ('touch',).
    info1 carries READ when any read op rides along, info2 carries
    WRITE when any mutating op does — the real client sets exactly
    these flags for mixed transactions.  Composes with the CAS policy
    (expect_gen) like any write."""
    has_read = any(o[0] in READ_OP_KINDS for o in ops)
    has_write = any(o[0] not in READ_OP_KINDS for o in ops)
    info1 = INFO1_READ if has_read else 0
    info2 = INFO2_WRITE if has_write else 0
    gen = 0
    if expect_gen is not None:
        info2 |= INFO2_GENERATION
        gen = expect_gen & 0xFFFFFFFF
    fields = []
    for ftype, data in (
        (FIELD_NAMESPACE, namespace.encode()),
        (FIELD_SET, set_name.encode()),
        (FIELD_DIGEST, key_digest(set_name, key)),
    ):
        fields.append(struct.pack(">IB", len(data) + 1, ftype) + data)
    encoded = [encode_op(o) for o in ops]
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, info1, info2, 0, 0, 0, gen, ttl & 0xFFFFFFFF, 1000,
        len(fields), len(encoded),
    )
    return _proto_frame(msg + b"".join(fields) + b"".join(encoded))


def parse_operate(frame: bytes):
    """Server-side OPERATE parse (bounds-checked like parse_put):
    (namespace, set, digest, ttl, expect_gen | None, ops) where ops
    preserves REQUEST ORDER — read-your-write inside the transaction
    depends on it.  Raises ValueError on malformed frames."""
    if len(frame) < 22:
        raise ValueError("aerospike wire: short operate request")
    (hsz, _i1, _i2, _i3, _u, _rc, _gen, ttl, _txn, n_fields, n_ops) = struct.unpack(
        ">BBBBBBIIIHH", frame[:22]
    )
    if hsz != 22:
        raise ValueError(f"aerospike wire: header size {hsz}")
    off = 22
    ns = st = ""
    digest = b""
    for _ in range(n_fields):
        if off + 5 > len(frame):
            raise ValueError("aerospike wire: truncated operate field")
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            raise ValueError("aerospike wire: truncated operate field")
        ftype = frame[off + 4]
        data = frame[off + 5 : off + 4 + sz]
        off += 4 + sz
        if ftype == FIELD_NAMESPACE:
            ns = data.decode()
        elif ftype == FIELD_SET:
            st = data.decode()
        elif ftype == FIELD_DIGEST:
            digest = data
    if len(digest) != DIGEST_SIZE:
        raise ValueError("aerospike wire: operate needs a digest")
    ops: list[tuple] = []
    for _ in range(n_ops):
        o, off = decode_op(frame, off)
        ops.append(o)
    return ns, st, digest, ttl, parse_put_gen(frame), ops


def apply_op_list(
    cur: tuple[dict[str, bytes], int] | None,
    ops: list[tuple],
    exists: bool | None = None,
) -> tuple[int, dict[str, bytes], dict[str, bytes]]:
    """The atomic op-list semantics shared by the single-OPERATE path
    and each batch-write sub-transaction: apply the ordered ops against
    the record's current bins, answering (result_code, new_bins,
    read_bins).  Read ops placed after mutations see the mutated values
    (read-your-write inside the transaction); OP_INCR against a
    non-integer particle answers RC_BIN_TYPE; OP_TOUCH against an
    absent record answers RC_KEY_NOT_FOUND; a non-OK code applies
    NOTHING (the caller never stores the partial result).

    `exists` decouples record existence from the bins baseline: a
    REPLACE sub-transaction applies onto EMPTY bins (cur=None) but the
    record may well exist — its touch ops must check the stored
    record, not the baseline (ADVICE r15).  Defaults to
    ``cur is not None`` for the plain-update callers."""
    if exists is None:
        exists = cur is not None
    bins = dict(cur[0]) if cur is not None else {}
    read_bins: dict[str, bytes] = {}
    for o in ops:
        kind = o[0]
        if kind == "read":
            if o[1] in bins:
                read_bins[o[1]] = bins[o[1]]
        elif kind == "write":
            bins[o[1]] = o[2]
        elif kind == "incr":
            stored = bins.get(o[1])
            if stored is not None and len(stored) != 8:
                # arithmetic against a non-integer particle
                return RC_BIN_TYPE, {}, {}
            base = (
                int.from_bytes(stored, "big", signed=True)
                if stored is not None
                else 0
            )
            total = (base + o[2] + (1 << 63)) % (1 << 64) - (1 << 63)
            bins[o[1]] = total.to_bytes(8, "big", signed=True)
        elif kind == "append":
            bins[o[1]] = bins.get(o[1], b"") + o[2]
        elif kind == "prepend":
            bins[o[1]] = o[2] + bins.get(o[1], b"")
        elif kind == "touch":
            if not exists:
                return RC_KEY_NOT_FOUND, {}, {}
        # ---- CDT list/map sub-transactions (round 16): each op
        # unpacks the canonical K-ordered particle, mutates or reads,
        # and answers its result through read_bins (new size for
        # mutations, the element/value for reads — the public client's
        # per-op result, keyed by bin like every other read).  A CDT op
        # against a non-collection particle answers RC_BIN_TYPE
        # applying NOTHING, exactly like OP_INCR on a non-integer.
        elif kind == "list_append":
            stored = bins.get(o[1])
            lst = [] if stored is None else unpack_list(stored)
            if lst is None:
                return RC_BIN_TYPE, {}, {}
            lst.append(o[2])
            bins[o[1]] = pack_list(lst)
            read_bins[o[1]] = len(lst).to_bytes(8, "big")
        elif kind == "list_size":
            stored = bins.get(o[1])
            if stored is not None:
                lst = unpack_list(stored)
                if lst is None:
                    return RC_BIN_TYPE, {}, {}
                read_bins[o[1]] = len(lst).to_bytes(8, "big")
        elif kind == "list_get_rank":
            stored = bins.get(o[1])
            if stored is not None:
                lst = unpack_list(stored)
                if lst is None:
                    return RC_BIN_TYPE, {}, {}
                # canonical storage is sorted: rank IS the index
                # (negative ranks count from the largest element)
                if -len(lst) <= o[2] < len(lst):
                    read_bins[o[1]] = lst[o[2]]
        elif kind == "map_put":
            stored = bins.get(o[1])
            m = {} if stored is None else unpack_map(stored)
            if m is None:
                return RC_BIN_TYPE, {}, {}
            m[o[2]] = o[3]
            bins[o[1]] = pack_map(m)
            read_bins[o[1]] = len(m).to_bytes(8, "big")
        elif kind == "map_incr":
            stored = bins.get(o[1])
            m = {} if stored is None else unpack_map(stored)
            if m is None:
                return RC_BIN_TYPE, {}, {}
            cur_v = m.get(o[2])
            if cur_v is not None and len(cur_v) != 8:
                return RC_BIN_TYPE, {}, {}
            base = (
                int.from_bytes(cur_v, "big", signed=True)
                if cur_v is not None
                else 0
            )
            total = (base + o[3] + (1 << 63)) % (1 << 64) - (1 << 63)
            m[o[2]] = total.to_bytes(8, "big", signed=True)
            bins[o[1]] = pack_map(m)
            read_bins[o[1]] = m[o[2]]
        elif kind == "map_get":
            stored = bins.get(o[1])
            if stored is not None:
                m = unpack_map(stored)
                if m is None:
                    return RC_BIN_TYPE, {}, {}
                if o[2] in m:
                    read_bins[o[1]] = m[o[2]]
        elif kind == "map_size":
            stored = bins.get(o[1])
            if stored is not None:
                m = unpack_map(stored)
                if m is None:
                    return RC_BIN_TYPE, {}, {}
                read_bins[o[1]] = len(m).to_bytes(8, "big")
    return RC_OK, bins, read_bins


def batch_entry_replay_safe(item: tuple) -> bool:
    """True when re-issuing this batch-write entry after an IN-DOUBT
    send (the node died before the reply drained, so it may already
    have applied) cannot change the final stored state: DELETE and
    REPLACE entries (absolute outcomes), CREATE-ONLY entries (a replay
    answers 'exists' at worst), and plain updates whose ops are all
    read/write/touch/map_put (write and map_put SET a value; a second
    set is the same value).  INCR/APPEND/PREPEND — and the CDT
    read-modify-writes list_append and map_incr — on a plain update
    double-apply on replay, so the router answers 'in_doubt' instead
    of retrying (ADVICE r15).  Note a replayed entry's REPORTED status
    can still differ from the first application's (a replayed CAS sees
    the bumped gen and answers gen_mismatch; a replayed create-only
    answers exists): state is exactly-once, reporting is
    at-least-once."""
    _digest, ops, _ttl, _expect_gen, *rest = item
    create_only = bool(rest[0]) if rest else False
    delete = bool(rest[1]) if len(rest) > 1 else False
    replace = bool(rest[2]) if len(rest) > 2 else False
    if delete or replace or create_only:
        return True
    safe = READ_OP_KINDS | {"write", "touch", "map_put"}
    return all(o[0] in safe for o in ops)


def frame_is_operate(frame: bytes) -> bool:
    """Dispatch probe: a data frame is an OPERATE transaction when it
    mixes the READ and WRITE info flags, or when its op list carries a
    read-modify-write op (INCR/APPEND/PREPEND) or a read op alongside
    writes — shapes the plain put/get/touch paths never produce.
    Bounds-check failures answer False and fall through to the normal
    parse, which raises properly."""
    if len(frame) < 22:
        return False
    if (frame[1] & INFO1_READ) and (frame[2] & INFO2_WRITE):
        return True
    pure_read = (
        frame[1] & INFO1_READ
        and not frame[1] & (INFO1_GET_ALL | INFO1_BATCH | INFO1_NOBINDATA)
        and not frame[2]
    )
    if not (frame[2] & INFO2_WRITE or pure_read):
        return False
    n_fields, n_ops = struct.unpack_from(">HH", frame, 18)
    off = 22
    saw_digest = False
    for _ in range(n_fields):
        if off + 5 > len(frame):
            return False
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            return False
        saw_digest = saw_digest or frame[off + 4] == FIELD_DIGEST
        off += 4 + sz
    if pure_read:
        # a digest-addressed projected read (OP_READ ops, no GET_ALL)
        # is a read-only operate; the SAME flag shape WITHOUT a digest
        # is a scan and stays on the scan path
        return saw_digest and n_ops > 0
    saw_touch = saw_write = False
    for _ in range(n_ops):
        if off + 8 > len(frame):
            return False
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 4 or off + 4 + sz > len(frame):
            return False
        op = frame[off + 4]
        if op in (OP_INCR, OP_APPEND, OP_PREPEND, OP_CDT_READ, OP_CDT_MODIFY):
            return True
        saw_touch = saw_touch or op == OP_TOUCH
        saw_write = saw_write or op == OP_WRITE
        off += 4 + sz
    # a touch RIDING ALONG with writes is an operate shape too — the
    # plain paths carry either all-writes or a lone touch, never both
    return saw_touch and saw_write


def build_put_digest(
    namespace: str,
    set_name: str,
    digest: bytes,
    bins: dict[str, bytes],
    ttl: int,
    create_only: bool = True,
) -> bytes:
    """One AS_MSG write request addressed by DIGEST instead of user key
    (round 13): the wire grammar's digest field is the record's real
    identity — the key is never required — and this is how asrestore
    puts back a backup whose records were scanned digest-only (scans
    return digests, not keys)."""
    if len(digest) != DIGEST_SIZE:
        raise ValueError(f"digest must be {DIGEST_SIZE} bytes")
    info2 = INFO2_WRITE | (INFO2_CREATE_ONLY if create_only else 0)
    fields = []
    for ftype, data in (
        (FIELD_NAMESPACE, namespace.encode()),
        (FIELD_SET, set_name.encode()),
        (FIELD_DIGEST, digest),
    ):
        fields.append(struct.pack(">IB", len(data) + 1, ftype) + data)
    ops = []
    for name, value in bins.items():
        nb = name.encode()
        if len(nb) > 15:
            raise ValueError(f"bin name over 15 bytes: {name!r}")  # server limit
        body = struct.pack("BBBB", OP_WRITE, PARTICLE_BLOB, 0, len(nb)) + nb + value
        ops.append(struct.pack(">I", len(body)) + body)
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, 0, info2, 0, 0, 0, 0, ttl & 0xFFFFFFFF, 1000, len(fields), len(ops),
    )
    return _proto_frame(msg + b"".join(fields) + b"".join(ops))


def parse_result_code(frame: bytes) -> int:
    if len(frame) < 22:
        raise ValueError("aerospike wire: short response")
    return frame[5]


def parse_put(frame: bytes, require_digest: bool = True):
    """Server-side request parse (independent walk of the same grammar):
    returns (namespace, set, digest, bins, ttl, create_only).  A SCAN
    request carries no digest field (it addresses the whole set), so
    its dispatch parses with require_digest=False and branches on the
    empty digest."""
    if len(frame) < 22:
        raise ValueError("aerospike wire: short request")
    (hsz, _i1, info2, _i3, _u, _rc, _gen, ttl, _txn, n_fields, n_ops) = struct.unpack(
        ">BBBBBBIIIHH", frame[:22]
    )
    if hsz != 22:
        raise ValueError(f"aerospike wire: header size {hsz}")
    off = 22
    ns = st = ""
    digest = b""
    # bounds-checked walk (ADVICE r12, mirroring parse_record_response):
    # a field/op whose declared size overruns the frame raises ValueError
    # — which _apply maps to RC_SERVER_ERROR — instead of struct.error
    # killing the handler thread
    for _ in range(n_fields):
        if off + 5 > len(frame):
            raise ValueError("aerospike wire: truncated request field")
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            raise ValueError("aerospike wire: truncated request field")
        ftype = frame[off + 4]
        data = frame[off + 5 : off + 4 + sz]
        off += 4 + sz
        if ftype == FIELD_NAMESPACE:
            ns = data.decode()
        elif ftype == FIELD_SET:
            st = data.decode()
        elif ftype == FIELD_DIGEST:
            digest = data
    if digest and len(digest) != DIGEST_SIZE:
        raise ValueError("aerospike wire: short digest field")
    if require_digest and not digest:
        raise ValueError("aerospike wire: missing digest field")
    bins: dict[str, bytes] = {}
    for _ in range(n_ops):
        if off + 8 > len(frame):
            raise ValueError("aerospike wire: truncated request op")
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 4 or off + 4 + sz > len(frame):
            raise ValueError("aerospike wire: truncated request op")
        op, _ptype, _ver, nlen = struct.unpack_from("BBBB", frame, off + 4)
        if 4 + nlen > sz:
            raise ValueError("aerospike wire: request op name overruns op")
        name = frame[off + 8 : off + 8 + nlen].decode()
        value = frame[off + 8 + nlen : off + 4 + sz]
        off += 4 + sz
        if op == OP_WRITE:
            bins[name] = value
    return ns, st, digest, bins, ttl, bool(info2 & INFO2_CREATE_ONLY)


def build_response(result_code: int) -> bytes:
    msg = struct.pack(">BBBBBBIIIHH", 22, 0, 0, 0, 0, result_code, 0, 0, 0, 0, 0)
    return _proto_frame(msg)


def build_delete(namespace: str, set_name: str, key: bytes) -> bytes:
    """One AS_MSG delete (info2 WRITE|DELETE, zero ops) — the op a
    CONTINUOUS sync needs that the reference's create-only one-shot
    never sends (round 11)."""
    fields = []
    for ftype, data in (
        (FIELD_NAMESPACE, namespace.encode()),
        (FIELD_SET, set_name.encode()),
        (FIELD_DIGEST, key_digest(set_name, key)),
    ):
        fields.append(struct.pack(">IB", len(data) + 1, ftype) + data)
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, 0, INFO2_WRITE | INFO2_DELETE, 0, 0, 0, 0, 0, 1000,
        len(fields), 0,
    )
    return _proto_frame(msg + b"".join(fields))


def build_get(namespace: str, set_name: str, key: bytes) -> bytes:
    """One AS_MSG read request (round 11 — the verify phase the
    reference lacks): info1 = READ | GET_ALL, namespace/set/digest
    fields, zero ops (as_command.c's read-all-bins shape)."""
    fields = []
    for ftype, data in (
        (FIELD_NAMESPACE, namespace.encode()),
        (FIELD_SET, set_name.encode()),
        (FIELD_DIGEST, key_digest(set_name, key)),
    ):
        fields.append(struct.pack(">IB", len(data) + 1, ftype) + data)
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, INFO1_READ | INFO1_GET_ALL, 0, 0, 0, 0, 0, 0, 1000,
        len(fields), 0,
    )
    return _proto_frame(msg + b"".join(fields))


def build_exists(namespace: str, set_name: str, key: bytes) -> bytes:
    """One metadata-only read (round 13 — aerospike_key_exists): info1
    = READ | NOBINDATA; the node answers generation + ttl with zero
    ops.  The cheapest read there is — a CAS loop or an existence sweep
    never pays for the bins."""
    fields = []
    for ftype, data in (
        (FIELD_NAMESPACE, namespace.encode()),
        (FIELD_SET, set_name.encode()),
        (FIELD_DIGEST, key_digest(set_name, key)),
    ):
        fields.append(struct.pack(">IB", len(data) + 1, ftype) + data)
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, INFO1_READ | INFO1_NOBINDATA, 0, 0, 0, 0, 0, 0, 1000,
        len(fields), 0,
    )
    return _proto_frame(msg + b"".join(fields))


def build_record_response(
    result_code: int, ttl: int, bins: dict[str, bytes], gen: int = 1
) -> bytes:
    """Server -> client record response: result code + stored TTL in the
    header's record_ttl slot, the record's GENERATION in the header's
    generation slot (round 13: real write counts, the read half of the
    CAS loop), one READ op per bin."""
    ops = []
    for name, value in bins.items():
        nb = name.encode()
        body = struct.pack("BBBB", 1, PARTICLE_BLOB, 0, len(nb)) + nb + value
        ops.append(struct.pack(">I", len(body)) + body)
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, 0, 0, 0, 0, result_code, gen & 0xFFFFFFFF, ttl & 0xFFFFFFFF,
        0, 0, len(ops),
    )
    return _proto_frame(msg + b"".join(ops))


def parse_record_gen(body: bytes) -> int:
    """The record generation from a record response header."""
    if len(body) < 22:
        raise ValueError("aerospike wire: short record response")
    return struct.unpack_from(">I", body, 6)[0]


def build_scan(
    namespace: str,
    set_name: str,
    pid_begin: int | None = None,
    pid_count: int | None = None,
    bins: list[str] | None = None,
    filter_exp: tuple | None = None,
    resume_digest: bytes | None = None,
    max_records: int | None = None,
) -> bytes:
    """One SCAN request (round 12 — the live-cluster read the ecosystem's
    asbackup performs): info1 = READ | GET_ALL with namespace + set
    fields and NO digest — it addresses the whole set at this node.  The
    node answers a stream of digest-tagged record responses terminated
    by an INFO3_LAST message (the public multi-record response shape).
    With a PID range (the public partition-filter concept) the node
    returns only records in partitions [pid_begin, pid_begin+pid_count)
    — the knob that lets scan-task parallelism scale with the
    4096-partition ring instead of the node count.

    `bins` (round 13 — the public as_scan_select concept): PROJECTED
    scan — info1 = READ without GET_ALL plus one OP_READ op naming each
    requested bin; the node returns only those bins per record, so a
    narrow read of wide records ships a fraction of the bytes (column
    pruning pushed INTO the cluster, the wire twin of parquet
    ReadSchema pruning).

    `filter_exp` (round 14 — the public expression-filter concept): a
    predicate AST (see exp_encode) the SERVER evaluates per record
    before shipping it — only matching records cross the wire, so the
    scan prunes ROW COUNT server-side the way `bins` prunes width.

    `resume_digest` / `max_records` (round 16 — the public
    AS_FIELD_DIGEST_ARRAY / AS_FIELD_MAX_RECORDS pagination): the
    server streams the range in total (pid, digest) order, returns at
    most `max_records` records (0/None = unlimited), and a request
    carrying `resume_digest` resumes strictly AFTER that cursor — the
    20-byte bookmark is the scan's whole client-side state."""
    fields = []
    for ftype, data in (
        (FIELD_NAMESPACE, namespace.encode()),
        (FIELD_SET, set_name.encode()),
    ):
        fields.append(struct.pack(">IB", len(data) + 1, ftype) + data)
    if pid_begin is not None:
        data = struct.pack(
            ">HH", pid_begin, pid_count if pid_count is not None else 1
        )
        fields.append(
            struct.pack(">IB", len(data) + 1, FIELD_PID_RANGE) + data
        )
    if resume_digest is not None:
        if len(resume_digest) != DIGEST_SIZE:
            raise ValueError(
                f"scan resume digest must be {DIGEST_SIZE} bytes"
            )
        fields.append(
            struct.pack(">IB", DIGEST_SIZE + 1, FIELD_DIGEST_ARRAY)
            + resume_digest
        )
    if max_records is not None:
        if not 0 <= max_records <= 0xFFFFFFFFFFFFFFFF:
            raise ValueError("scan max_records out of u64 range")
        fields.append(
            struct.pack(">IBQ", 9, FIELD_MAX_RECORDS, max_records)
        )
    if filter_exp is not None:
        data = exp_encode(filter_exp)
        fields.append(
            struct.pack(">IB", len(data) + 1, FIELD_FILTER_EXP) + data
        )
    ops = []
    if bins is not None:
        for name in bins:
            nb = name.encode()
            body = struct.pack("BBBB", 1, 0, 0, len(nb)) + nb
            ops.append(struct.pack(">I", len(body)) + body)
    info1 = INFO1_READ | (0 if bins is not None else INFO1_GET_ALL)
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, info1, 0, 0, 0, 0, 0, 0, 1000,
        len(fields), len(ops),
    )
    return _proto_frame(msg + b"".join(fields) + b"".join(ops))


def parse_scan_bins(frame: bytes) -> list[str] | None:
    """Server-side: the projected bin names of a scan request (OP_READ
    ops), or None for a read-all (GET_ALL) scan.  Bounds-checked."""
    if len(frame) < 22 or frame[1] & INFO1_GET_ALL:
        return None
    n_fields, n_ops = struct.unpack_from(">HH", frame, 18)
    off = 22
    for _ in range(n_fields):
        if off + 5 > len(frame):
            return None
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            return None
        off += 4 + sz
    names: list[str] = []
    for _ in range(n_ops):
        if off + 8 > len(frame):
            raise ValueError("aerospike wire: truncated scan op list")
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 4 or off + 4 + sz > len(frame):
            raise ValueError("aerospike wire: truncated scan op list")
        _op, _pt, _ver, nlen = struct.unpack_from("BBBB", frame, off + 4)
        if 4 + nlen > sz:
            raise ValueError("aerospike wire: scan op name overruns op")
        names.append(frame[off + 8 : off + 8 + nlen].decode())
        off += 4 + sz
    return names


def encode_index_range(
    bin_name: str,
    lo: int | None = None,
    hi: int | None = None,
    eq: bytes | None = None,
    ctx_map_key: bytes | None = None,
) -> bytes:
    """The INDEX_RANGE field payload: u8 range count (1), u8 name len +
    name, u8 particle type, then the predicate — INT (type 1): two >q
    bounds [lo, hi] inclusive; BLOB (type 4): u32 len + bytes
    (equality).  One range per query, like the real client's as_query
    where clause.

    `ctx_map_key` (round 16 — the public sindex-on-CDT-with-context
    concept, server 6.1+): the predicate addresses the VALUE AT THIS
    MAP KEY inside the bin's K-ordered map particle instead of the bin
    itself — appended as u8 ctx kind (1 = map-key) + u8 key len + key
    (the house length-prefixed stand-in for the client's msgpack'd
    as_cdt_ctx)."""
    nb = bin_name.encode()
    if len(nb) > 15:
        raise ValueError(f"bin name over 15 bytes: {bin_name!r}")
    head = struct.pack("BB", 1, len(nb)) + nb
    if eq is not None:
        out = head + struct.pack(">BI", EXP_TYPE_BLOB, len(eq)) + eq
    else:
        if lo is None or hi is None:
            raise ValueError("int index range needs both bounds")
        out = head + struct.pack(">Bqq", EXP_TYPE_INT, lo, hi)
    if ctx_map_key is not None:
        if not 1 <= len(ctx_map_key) <= 255:
            raise ValueError("index context map key must be 1..255 bytes")
        out += struct.pack("BB", 1, len(ctx_map_key)) + ctx_map_key
    return out


def parse_index_range(frame: bytes):
    """Server-side: the query's index predicate, or None when the
    request carries no INDEX_RANGE field (then it is a scan).
    Returns (bin_name, ptype, lo, hi, eq) — bounds for INT, eq bytes
    for BLOB.  Malformed payloads raise ValueError."""
    if len(frame) < 22:
        return None
    n_fields = struct.unpack_from(">H", frame, 18)[0]
    off = 22
    data = None
    for _ in range(n_fields):
        if off + 5 > len(frame):
            return None
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            return None
        if frame[off + 4] == FIELD_INDEX_RANGE:
            data = frame[off + 5 : off + 4 + sz]
            break
        off += 4 + sz
    if data is None:
        return None
    if len(data) < 2 or data[0] != 1:
        raise ValueError("aerospike wire: bad index-range count")
    nlen = data[1]
    if 2 + nlen + 1 > len(data):
        raise ValueError("aerospike wire: truncated index-range name")
    name = data[2 : 2 + nlen].decode()
    ptype = data[2 + nlen]
    rest = data[3 + nlen :]

    def ctx_of(tail: bytes) -> bytes | None:
        """The optional CDT context suffix: kind 1 (map key) + len +
        key; empty tail = no context, anything else malformed."""
        if not tail:
            return None
        if len(tail) < 2 or tail[0] != 1 or 2 + tail[1] != len(tail):
            raise ValueError("aerospike wire: bad index-range context")
        return tail[2 : 2 + tail[1]]

    if ptype == EXP_TYPE_INT:
        if len(rest) < 16:
            raise ValueError("aerospike wire: bad int index range")
        lo, hi = struct.unpack_from(">qq", rest, 0)
        return name, ptype, lo, hi, None, ctx_of(rest[16:])
    if ptype == EXP_TYPE_BLOB:
        if len(rest) < 4:
            raise ValueError("aerospike wire: bad blob index range")
        (blen,) = struct.unpack_from(">I", rest, 0)
        if 4 + blen > len(rest):
            raise ValueError("aerospike wire: bad blob index range")
        return (
            name, ptype, None, None, rest[4 : 4 + blen],
            ctx_of(rest[4 + blen :]),
        )
    raise ValueError(f"aerospike wire: unknown index particle {ptype}")


def build_query(
    namespace: str,
    set_name: str,
    index_range: bytes,
    pid_begin: int | None = None,
    pid_count: int | None = None,
    bins: list[str] | None = None,
    filter_exp: tuple | None = None,
    resume_digest: bytes | None = None,
    max_records: int | None = None,
) -> bytes:
    """One secondary-index QUERY request (round 14 — the as_query
    family): exactly the scan grammar plus the INDEX_RANGE field, so
    partition slicing, bin projection and the expression filter all
    compose; the node streams only records whose indexed bin satisfies
    the predicate, and REFUSES with AEROSPIKE_ERR_INDEX_NOT_FOUND when
    no secondary index exists on the bin (unlike scans, queries
    require one)."""
    frame = build_scan(
        namespace, set_name, pid_begin, pid_count,
        bins=bins, filter_exp=filter_exp,
        resume_digest=resume_digest, max_records=max_records,
    )
    # splice the INDEX_RANGE field in: rebuild via the scan builder's
    # grammar — header n_fields + the appended field payload
    body = bytearray(frame[8:])
    n_fields = struct.unpack_from(">H", bytes(body), 18)[0]
    struct.pack_into(">H", body, 18, n_fields + 1)
    field = struct.pack(">IB", len(index_range) + 1, FIELD_INDEX_RANGE) + index_range
    # ops (if any) sit after the fields; walk past the fields to insert
    off = 22
    for _ in range(n_fields):
        (sz,) = struct.unpack_from(">I", bytes(body), off)
        off += 4 + sz
    body[off:off] = field
    return _proto_frame(bytes(body))


def parse_pid_range(frame: bytes) -> tuple[int, int] | None:
    """The scan request's partition filter, if present: (begin, count).
    Bounds-checked (ADVICE r12): a field whose size claims more bytes
    than the frame holds is a truncated request, not a struct.error
    escaping the handler's ValueError net."""
    if len(frame) < 22:
        return None
    (_hsz, _i1, _i2, _i3, _u, _rc, _gen, _ttl, _txn, n_fields, _n_ops) = (
        struct.unpack(">BBBBBBIIIHH", frame[:22])
    )
    off = 22
    for _ in range(n_fields):
        if off + 5 > len(frame):
            return None
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            return None
        if frame[off + 4] == FIELD_PID_RANGE and sz == 5:
            return struct.unpack_from(">HH", frame, off + 5)
        off += 4 + sz
    return None


def _scan_field(frame: bytes, ftype: int) -> bytes | None:
    """The payload of the first `ftype` field in a scan request, or
    None — the same bounds-checked field walk as parse_pid_range."""
    if len(frame) < 22:
        return None
    (n_fields,) = struct.unpack_from(">H", frame, 18)
    off = 22
    for _ in range(n_fields):
        if off + 5 > len(frame):
            return None
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            return None
        if frame[off + 4] == ftype:
            return frame[off + 5 : off + 4 + sz]
        off += 4 + sz
    return None


def parse_scan_resume(frame: bytes) -> bytes | None:
    """Server-side: the scan request's resume cursor (one 20-byte
    digest in the DIGEST_ARRAY field), or None."""
    data = _scan_field(frame, FIELD_DIGEST_ARRAY)
    return data if data is not None and len(data) == DIGEST_SIZE else None


def parse_scan_max_records(frame: bytes) -> int | None:
    """Server-side: the scan request's page cap (BE u64 MAX_RECORDS
    field; 0 means unlimited, returned as None), or None."""
    data = _scan_field(frame, FIELD_MAX_RECORDS)
    if data is None or len(data) != 8:
        return None
    n = struct.unpack(">Q", data)[0]
    return n if n else None


_EXP_CMP_OPS = {
    "eq": EXP_CMP_EQ, "ne": EXP_CMP_NE, "gt": EXP_CMP_GT,
    "ge": EXP_CMP_GE, "lt": EXP_CMP_LT, "le": EXP_CMP_LE,
}
_EXP_CMP_NAMES = {v: k for k, v in _EXP_CMP_OPS.items()}


def exp_encode(node: tuple) -> bytes:
    """Serialize an expression AST for the FIELD_FILTER_EXP slot.  AST
    node forms (plain tuples, the client-side builder surface):
    ('and'|'or', [children]) | ('not', child) |
    ('cmp', 'eq|ne|gt|ge|lt|le', lhs, rhs) |
    ('bin_int'|'bin_blob', name) | ('bin_type', name) |
    ('int', v) | ('blob', b).  `bin_exists(name)` is the public
    shorthand for cmp(ne, bin_type(name), int(0))."""
    kind = node[0]
    if kind in ("and", "or"):
        children = node[1]
        if not 1 <= len(children) <= 255:
            raise ValueError("exp: and/or arity out of range")
        return (
            struct.pack("BB", EXP_AND if kind == "and" else EXP_OR, len(children))
            + b"".join(exp_encode(c) for c in children)
        )
    if kind == "not":
        return struct.pack("B", EXP_NOT) + exp_encode(node[1])
    if kind == "cmp":
        return (
            struct.pack("B", _EXP_CMP_OPS[node[1]])
            + exp_encode(node[2])
            + exp_encode(node[3])
        )
    if kind in ("bin_int", "bin_blob"):
        nb = node[1].encode()
        if len(nb) > 15:
            raise ValueError(f"bin name over 15 bytes: {node[1]!r}")
        rtype = EXP_TYPE_INT if kind == "bin_int" else EXP_TYPE_BLOB
        return struct.pack("BBB", EXP_BIN, rtype, len(nb)) + nb
    if kind == "bin_type":
        nb = node[1].encode()
        if len(nb) > 15:
            raise ValueError(f"bin name over 15 bytes: {node[1]!r}")
        return struct.pack("BB", EXP_BIN_TYPE, len(nb)) + nb
    if kind == "int":
        return struct.pack(">Bq", EXP_VAL_INT, node[1])
    if kind == "blob":
        return struct.pack(">BI", EXP_VAL_BLOB, len(node[1])) + node[1]
    raise ValueError(f"exp: unknown node kind {kind!r}")


def exp_bin_exists(name: str) -> tuple:
    """The as_exp_bin_exists shorthand: bin_type(name) != NIL(0)."""
    return ("cmp", "ne", ("bin_type", name), ("int", 0))


def exp_decode(data: bytes) -> tuple:
    """Server-side parse of a FIELD_FILTER_EXP payload back into the
    AST (bounds-checked; trailing bytes are a malformed filter)."""
    node, off = _exp_decode_at(data, 0)
    if off != len(data):
        raise ValueError("exp: trailing bytes after expression")
    return node


def _exp_decode_at(data: bytes, off: int) -> tuple[tuple, int]:
    if off >= len(data):
        raise ValueError("exp: truncated expression")
    code = data[off]
    off += 1
    if code in (EXP_AND, EXP_OR):
        if off >= len(data):
            raise ValueError("exp: truncated and/or")
        n = data[off]
        off += 1
        children = []
        for _ in range(n):
            child, off = _exp_decode_at(data, off)
            children.append(child)
        return ("and" if code == EXP_AND else "or", children), off
    if code == EXP_NOT:
        child, off = _exp_decode_at(data, off)
        return ("not", child), off
    if code in _EXP_CMP_NAMES:
        lhs, off = _exp_decode_at(data, off)
        rhs, off = _exp_decode_at(data, off)
        return ("cmp", _EXP_CMP_NAMES[code], lhs, rhs), off
    if code == EXP_BIN:
        if off + 2 > len(data):
            raise ValueError("exp: truncated bin node")
        rtype, nlen = data[off], data[off + 1]
        off += 2
        if off + nlen > len(data):
            raise ValueError("exp: truncated bin name")
        name = data[off : off + nlen].decode()
        off += nlen
        kind = "bin_int" if rtype == EXP_TYPE_INT else "bin_blob"
        return (kind, name), off
    if code == EXP_BIN_TYPE:
        if off + 1 > len(data):
            raise ValueError("exp: truncated bin_type node")
        nlen = data[off]
        off += 1
        if off + nlen > len(data):
            raise ValueError("exp: truncated bin_type name")
        return ("bin_type", data[off : off + nlen].decode()), off + nlen
    if code == EXP_VAL_INT:
        if off + 8 > len(data):
            raise ValueError("exp: truncated int literal")
        return ("int", struct.unpack_from(">q", data, off)[0]), off + 8
    if code == EXP_VAL_BLOB:
        if off + 4 > len(data):
            raise ValueError("exp: truncated blob literal")
        (blen,) = struct.unpack_from(">I", data, off)
        off += 4
        if off + blen > len(data):
            raise ValueError("exp: truncated blob literal")
        return ("blob", data[off : off + blen]), off + blen
    raise ValueError(f"exp: unknown op code {code}")


def exp_eval(node: tuple, bins: dict[str, bytes]):
    """Tri-state evaluation against one record's bins, the public
    expression semantics: an absent or type-incompatible bin yields
    UNKNOWN (None), comparisons against UNKNOWN stay UNKNOWN, NOT
    preserves UNKNOWN, AND short-circuits on False / OR on True, and a
    record ships only when the whole filter answers exactly True."""
    kind = node[0]
    if kind == "and":
        saw_unknown = False
        for c in node[1]:
            v = exp_eval(c, bins)
            if v is False:
                return False
            saw_unknown = saw_unknown or v is None
        return None if saw_unknown else True
    if kind == "or":
        saw_unknown = False
        for c in node[1]:
            v = exp_eval(c, bins)
            if v is True:
                return True
            saw_unknown = saw_unknown or v is None
        return None if saw_unknown else False
    if kind == "not":
        v = exp_eval(node[1], bins)
        return None if v is None else not v
    if kind == "cmp":
        lhs = exp_eval(node[2], bins)
        rhs = exp_eval(node[3], bins)
        if lhs is None or rhs is None or type(lhs) is not type(rhs):
            return None
        op = node[1]
        if op == "eq":
            return lhs == rhs
        if op == "ne":
            return lhs != rhs
        if op == "gt":
            return lhs > rhs
        if op == "ge":
            return lhs >= rhs
        if op == "lt":
            return lhs < rhs
        return lhs <= rhs
    if kind == "bin_int":
        v = bins.get(node[1])
        if v is None or len(v) != 8:
            return None
        return int.from_bytes(v, "big", signed=True)
    if kind == "bin_blob":
        return bins.get(node[1])
    if kind == "bin_type":
        return EXP_TYPE_BLOB if node[1] in bins else 0
    if kind == "int":
        return node[1]
    if kind == "blob":
        return node[1]
    raise ValueError(f"exp: unknown node kind {kind!r}")


def parse_scan_filter(frame: bytes):
    """Server-side: the scan request's expression filter (decoded AST),
    or None when the request carries no FIELD_FILTER_EXP field."""
    if len(frame) < 22:
        return None
    n_fields = struct.unpack_from(">H", frame, 18)[0]
    off = 22
    for _ in range(n_fields):
        if off + 5 > len(frame):
            return None
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            return None
        if frame[off + 4] == FIELD_FILTER_EXP:
            return exp_decode(frame[off + 5 : off + 4 + sz])
        off += 4 + sz
    return None


def build_scan_record(digest: bytes, ttl: int, bins: dict[str, bytes]) -> bytes:
    """One record of a scan response: a record response carrying the
    record's DIGEST as a field (scans are set-addressed, so the digest
    is the only identity the client gets back)."""
    fields = [struct.pack(">IB", DIGEST_SIZE + 1, FIELD_DIGEST) + digest]
    ops = []
    for name, value in bins.items():
        nb = name.encode()
        body = struct.pack("BBBB", 1, PARTICLE_BLOB, 0, len(nb)) + nb + value
        ops.append(struct.pack(">I", len(body)) + body)
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, 0, 0, 0, 0, RC_OK, 1, ttl & 0xFFFFFFFF, 0, len(fields), len(ops),
    )
    return _proto_frame(msg + b"".join(fields) + b"".join(ops))


def build_scan_last(result_code: int = RC_OK) -> bytes:
    """The scan terminator: an empty message with INFO3_LAST set."""
    msg = struct.pack(
        ">BBBBBBIIIHH", 22, 0, 0, INFO3_LAST, 0, result_code, 0, 0, 0, 0, 0
    )
    return _proto_frame(msg)


def parse_scan_record(body: bytes) -> tuple[bytes, int, dict[str, bytes]]:
    """(digest, record_ttl, bins) from one scan-stream record (bounds-
    checked like parse_record_response)."""
    if len(body) < 22:
        raise ValueError("aerospike wire: short scan record")
    (_hsz, _i1, _i2, _i3, _u, rc, _gen, ttl, _txn, n_fields, n_ops) = struct.unpack(
        ">BBBBBBIIIHH", body[:22]
    )
    if rc != RC_OK:
        raise RuntimeError(f"aerospike wire: scan record rc {rc}")
    off = 22
    digest = b""
    for _ in range(n_fields):
        if off + 5 > len(body):
            raise ValueError("aerospike wire: truncated scan field")
        (sz,) = struct.unpack_from(">I", body, off)
        if off + 4 + sz > len(body):
            raise ValueError("aerospike wire: truncated scan field")
        if body[off + 4] == FIELD_DIGEST:
            digest = body[off + 5 : off + 4 + sz]
        off += 4 + sz
    if len(digest) != DIGEST_SIZE:
        raise ValueError("aerospike wire: scan record missing digest")
    bins: dict[str, bytes] = {}
    for _ in range(n_ops):
        if off + 8 > len(body):
            raise ValueError("aerospike wire: truncated scan op")
        (sz,) = struct.unpack_from(">I", body, off)
        if sz < 4 or off + 4 + sz > len(body):
            raise ValueError("aerospike wire: truncated scan op")
        _op, _ptype, _ver, nlen = struct.unpack_from("BBBB", body, off + 4)
        if 4 + nlen > sz:
            raise ValueError("aerospike wire: scan op name overruns op")
        name = body[off + 8 : off + 8 + nlen].decode()
        bins[name] = body[off + 8 + nlen : off + 4 + sz]
        off += 4 + sz
    return digest, ttl, bins


def build_batch(
    namespace: str,
    set_name: str,
    digests: list[bytes],
    filter_exp: tuple | None = None,
) -> bytes:
    """One BATCH-INDEX read request (round 13): info1 = READ | GET_ALL
    | BATCH with namespace + set fields and ONE batch-index field
    packing every digest (u32 count, then u32 index + 20B digest per
    record).  `filter_exp` (round 14): the public expression filter
    rides batch requests exactly as it rides scans — the server
    answers AEROSPIKE_FILTERED_OUT per record whose bins evaluate
    non-True, so selective multi-key reads ship only the matches.  The node answers one record response PER ENTRY — the
    entry's index rides the header's transaction-ttl slot, exactly
    where the real protocol's batch responses carry it — terminated by
    an INFO3_LAST message.  This is the multi-key read the ecosystem's
    clients batch lookups through (the batch-node split lives in
    ClusterRouter.batch_read); the reference has no read path at all."""
    for d in digests:
        if len(d) != DIGEST_SIZE:
            raise ValueError(f"digest must be {DIGEST_SIZE} bytes")
    fields = []
    for ftype, data in (
        (FIELD_NAMESPACE, namespace.encode()),
        (FIELD_SET, set_name.encode()),
    ):
        fields.append(struct.pack(">IB", len(data) + 1, ftype) + data)
    payload = struct.pack(">I", len(digests)) + b"".join(
        struct.pack(">I", i) + d for i, d in enumerate(digests)
    )
    fields.append(
        struct.pack(">IB", len(payload) + 1, FIELD_BATCH_INDEX) + payload
    )
    if filter_exp is not None:
        data = exp_encode(filter_exp)
        fields.append(
            struct.pack(">IB", len(data) + 1, FIELD_FILTER_EXP) + data
        )
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, INFO1_READ | INFO1_GET_ALL | INFO1_BATCH, 0, 0, 0, 0, 0, 0,
        1000, len(fields), 0,
    )
    return _proto_frame(msg + b"".join(fields))


def parse_batch_entries(frame: bytes) -> list[tuple[int, bytes]] | None:
    """Server-side batch-field walk: the request's [(index, digest)]
    list, or None when the frame carries no batch-index field.  Bounds-
    checked like every other server-side parse — a count that overruns
    the field is a truncated request (ValueError -> RC_SERVER_ERROR),
    not a struct.error killing the handler thread."""
    if len(frame) < 22:
        return None
    n_fields = struct.unpack_from(">H", frame, 18)[0]
    off = 22
    for _ in range(n_fields):
        if off + 5 > len(frame):
            return None
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            return None
        if frame[off + 4] == FIELD_BATCH_INDEX:
            data = frame[off + 5 : off + 4 + sz]
            if len(data) < 4:
                raise ValueError("aerospike wire: truncated batch field")
            (count,) = struct.unpack_from(">I", data, 0)
            need = 4 + count * (4 + DIGEST_SIZE)
            if len(data) < need:
                raise ValueError("aerospike wire: truncated batch entries")
            entries = []
            p = 4
            for _ in range(count):
                (idx,) = struct.unpack_from(">I", data, p)
                entries.append((idx, data[p + 4 : p + 4 + DIGEST_SIZE]))
                p += 4 + DIGEST_SIZE
            return entries
        off += 4 + sz
    return None


def build_batch_write(
    namespace: str,
    set_name: str,
    entries: list[tuple[int, bytes, list[tuple], int, int | None]],
) -> bytes:
    """One BATCH-WRITE request (round 15) — the public batch-write /
    batch-operate form (Aerospike server 6.0+): the batch-index field
    carries one SUB-TRANSACTION per record — the entry's ordered op
    list in the same op grammar OPERATE uses (encode_op), its ttl, and
    an optional per-record generation check — and the node answers one
    index-tagged record response PER ENTRY with a PER-RECORD result
    code (OK / GEN_MISMATCH / NOT_FOUND / BIN_TYPE / per-record
    PARTITION_UNAVAILABLE).  This is how a migration sink amortizes N
    puts into per-node round trips: requests per task are bounded by
    the NODE count, not the record count.  Frontier beyond the
    reference (write-only, one record per put,
    AerospikeWriter.cpp:216-256).  info1 = BATCH, info2 = WRITE — the
    flag pair no other request shape produces.

    Entry wire layout inside the batch field (after the u32 count):
    u32 index + 20B digest + u8 flags (bit0: expect_gen present;
    bit1: CREATE-ONLY — the entry refuses with per-record KEY_EXISTS
    instead of replacing, the migration sink's idempotence policy;
    bit2: DELETE — a record-level removal sub-transaction, the public
    batch grammar's delete record type: ops list empty, answers OK or
    KEY_NOT_FOUND, idempotent for CDC appliers; bit3: REPLACE — the
    write policy AS_POLICY_EXISTS_CREATE_OR_REPLACE: ops apply onto an
    EMPTY record, discarding stored bins, the whole-record semantics a
    CDC applier needs) + [u32 expect_gen] + u32 ttl + u16 n_ops +
    n_ops length-prefixed ops.  Entries may be 5/6/7/8-tuples
    (trailing create_only, delete, replace bools)."""
    fields = []
    for ftype, data in (
        (FIELD_NAMESPACE, namespace.encode()),
        (FIELD_SET, set_name.encode()),
    ):
        fields.append(struct.pack(">IB", len(data) + 1, ftype) + data)
    parts = [struct.pack(">I", len(entries))]
    for index, digest, ops, ttl, expect_gen, *rest in entries:
        create_only = bool(rest[0]) if rest else False
        delete = bool(rest[1]) if len(rest) > 1 else False
        replace = bool(rest[2]) if len(rest) > 2 else False
        if len(digest) != DIGEST_SIZE:
            raise ValueError(f"digest must be {DIGEST_SIZE} bytes")
        if delete and (ops or create_only or replace):
            raise ValueError(
                "aerospike wire: a delete sub-transaction carries no ops"
            )
        if create_only and replace:
            raise ValueError(
                "aerospike wire: create-only and replace are exclusive"
            )
        flags = (
            (0 if expect_gen is None else 1)
            | (2 if create_only else 0)
            | (4 if delete else 0)
            | (8 if replace else 0)
        )
        head = struct.pack(">I", index) + digest + bytes([flags])
        if expect_gen is not None:
            head += struct.pack(">I", expect_gen & 0xFFFFFFFF)
        encoded = [encode_op(o) for o in ops]
        if len(encoded) > 0xFFFF:
            # the wire grammar's op count is a u16 — surface the
            # violation as the module's uniform ValueError, never a
            # struct.error out of pack (ADVICE r15)
            raise ValueError(
                "aerospike wire: batch-write entry carries "
                f"{len(encoded)} ops (max 65535)"
            )
        head += struct.pack(">IH", ttl & 0xFFFFFFFF, len(encoded))
        parts.append(head + b"".join(encoded))
    payload = b"".join(parts)
    fields.append(
        struct.pack(">IB", len(payload) + 1, FIELD_BATCH_INDEX) + payload
    )
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, INFO1_BATCH, INFO2_WRITE, 0, 0, 0, 0, 0, 1000, len(fields), 0,
    )
    return _proto_frame(msg + b"".join(fields))


def parse_batch_write_entries(
    frame: bytes,
) -> list[tuple[int, bytes, list[tuple], int, int | None]] | None:
    """Server-side batch-WRITE field walk: the request's
    [(index, digest, ops, ttl, expect_gen)] list, or None when the
    frame carries no batch-index field.  Bounds-checked like
    parse_batch_entries — truncated entries raise the uniform
    ValueError (-> RC_SERVER_ERROR), never struct.error."""
    if len(frame) < 22:
        return None
    n_fields = struct.unpack_from(">H", frame, 18)[0]
    off = 22
    for _ in range(n_fields):
        if off + 5 > len(frame):
            return None
        (sz,) = struct.unpack_from(">I", frame, off)
        if sz < 1 or off + 4 + sz > len(frame):
            return None
        if frame[off + 4] == FIELD_BATCH_INDEX:
            data = frame[off + 5 : off + 4 + sz]
            if len(data) < 4:
                raise ValueError("aerospike wire: truncated batch field")
            (count,) = struct.unpack_from(">I", data, 0)
            entries: list[
                tuple[int, bytes, list[tuple], int, int | None, bool]
            ] = []
            p = 4
            for _ in range(count):
                if p + 4 + DIGEST_SIZE + 1 > len(data):
                    raise ValueError(
                        "aerospike wire: truncated batch-write entry"
                    )
                (idx,) = struct.unpack_from(">I", data, p)
                p += 4
                digest = data[p : p + DIGEST_SIZE]
                p += DIGEST_SIZE
                flags = data[p]
                p += 1
                expect_gen: int | None = None
                if flags & 1:
                    if p + 4 > len(data):
                        raise ValueError(
                            "aerospike wire: truncated batch-write gen"
                        )
                    (expect_gen,) = struct.unpack_from(">I", data, p)
                    p += 4
                if p + 6 > len(data):
                    raise ValueError(
                        "aerospike wire: truncated batch-write entry head"
                    )
                ttl, n_ops = struct.unpack_from(">IH", data, p)
                p += 6
                ops: list[tuple] = []
                for _ in range(n_ops):
                    o, p = decode_op(data, p)
                    ops.append(o)
                entries.append(
                    (idx, digest, ops, ttl, expect_gen,
                     bool(flags & 2), bool(flags & 4), bool(flags & 8))
                )
            return entries
        off += 4 + sz
    return None


def build_batch_record(
    index: int, digest: bytes, result_code: int, ttl: int,
    bins: dict[str, bytes], gen: int = 1,
) -> bytes:
    """One record of a batch response: a record response whose header
    carries the BATCH INDEX in the transaction-ttl slot (the real
    protocol's batch-row index position) plus the record's digest as a
    field.  Per-record result codes: OK with bins, KEY_NOT_FOUND for an
    absent key, PARTITION_UNAVAILABLE when this node no longer serves
    the digest's partition (the per-record cluster-change signal the
    re-tending client re-issues on)."""
    fields = [struct.pack(">IB", DIGEST_SIZE + 1, FIELD_DIGEST) + digest]
    ops = []
    for name, value in bins.items():
        nb = name.encode()
        body = struct.pack("BBBB", 1, PARTICLE_BLOB, 0, len(nb)) + nb + value
        ops.append(struct.pack(">I", len(body)) + body)
    msg = struct.pack(
        ">BBBBBBIIIHH",
        22, 0, 0, 0, 0, result_code, gen & 0xFFFFFFFF, ttl & 0xFFFFFFFF,
        index & 0xFFFFFFFF, len(fields), len(ops),
    )
    return _proto_frame(msg + b"".join(fields) + b"".join(ops))


def parse_batch_record(body: bytes) -> tuple[int, int, bytes, int, dict[str, bytes]]:
    """(index, result_code, digest, record_ttl, bins) from one batch-
    stream record (bounds-checked like parse_scan_record)."""
    if len(body) < 22:
        raise ValueError("aerospike wire: short batch record")
    (_hsz, _i1, _i2, _i3, _u, rc, _gen, ttl, index, n_fields, n_ops) = struct.unpack(
        ">BBBBBBIIIHH", body[:22]
    )
    off = 22
    digest = b""
    for _ in range(n_fields):
        if off + 5 > len(body):
            raise ValueError("aerospike wire: truncated batch field")
        (sz,) = struct.unpack_from(">I", body, off)
        if sz < 1 or off + 4 + sz > len(body):
            raise ValueError("aerospike wire: truncated batch field")
        if body[off + 4] == FIELD_DIGEST:
            digest = body[off + 5 : off + 4 + sz]
        off += 4 + sz
    bins: dict[str, bytes] = {}
    for _ in range(n_ops):
        if off + 8 > len(body):
            raise ValueError("aerospike wire: truncated batch op")
        (sz,) = struct.unpack_from(">I", body, off)
        if sz < 4 or off + 4 + sz > len(body):
            raise ValueError("aerospike wire: truncated batch op")
        _op, _ptype, _ver, nlen = struct.unpack_from("BBBB", body, off + 4)
        if 4 + nlen > sz:
            raise ValueError("aerospike wire: batch op name overruns op")
        name = body[off + 8 : off + 8 + nlen].decode()
        bins[name] = body[off + 8 + nlen : off + 4 + sz]
        off += 4 + sz
    return index, rc, digest, ttl, bins


def cols_str_to_bins(cols_str: str) -> dict[str, bytes]:
    """Reconstruct a bins dict from a 'name=value,name=value' record
    string (the wire rows' serialized cell list).  Guarded (ADVICE r11):
    an empty string is an empty record, a token without '=' is a
    malformed row and raises ValueError instead of IndexError; values
    may contain '=' (split once on the first)."""
    if not cols_str:
        return {}
    bins: dict[str, bytes] = {}
    for kv in cols_str.split(","):
        name, eq, value = kv.partition("=")
        if not eq:
            raise ValueError(f"malformed cols_str token (no '='): {kv!r}")
        bins[name] = value.encode()
    return bins


def parse_record_response(body: bytes) -> tuple[int, int, dict[str, bytes]]:
    """(result_code, record_ttl, bins) from a record response body."""
    if len(body) < 22:
        raise ValueError("aerospike wire: short record response")
    (_hsz, _i1, _i2, _i3, _u, rc, _gen, ttl, _txn, n_fields, n_ops) = struct.unpack(
        ">BBBBBBIIIHH", body[:22]
    )
    off = 22
    for _ in range(n_fields):
        if off + 4 > len(body):
            raise ValueError("aerospike wire: truncated record field")
        (sz,) = struct.unpack_from(">I", body, off)
        if off + 4 + sz > len(body):
            raise ValueError("aerospike wire: truncated record field")
        off += 4 + sz
    bins: dict[str, bytes] = {}
    for _ in range(n_ops):
        if off + 8 > len(body):
            raise ValueError("aerospike wire: truncated record op")
        (sz,) = struct.unpack_from(">I", body, off)
        if sz < 4 or off + 4 + sz > len(body):
            raise ValueError("aerospike wire: truncated record op")
        _op, _ptype, _ver, nlen = struct.unpack_from("BBBB", body, off + 4)
        if 4 + nlen > sz:
            raise ValueError("aerospike wire: record op name overruns op")
        name = body[off + 8 : off + 8 + nlen].decode()
        bins[name] = body[off + 8 + nlen : off + 4 + sz]
        off += 4 + sz
    return rc, ttl, bins


# --------------------------------------------------------- info channel
# The PUBLIC text info protocol (proto type 1; Info.java / as_info.c):
# request body = command names separated by newlines; response body =
# "name\tvalue\n" per name.  The C client bootstraps its partition map
# through exactly this channel — "partition-generation" +
# "replicas-master" (per namespace, a base64 4096-bit bitmap; bit i of
# the decoded bytes, 0x80 >> (i & 7) of byte i >> 3, marks the node as
# master for partition i) — before any aerospike_key_put_async routes.


def build_info_request(names: list[str]) -> bytes:
    return _proto_frame(("\n".join(names) + "\n").encode(), INFO_MSG_TYPE)


def parse_info_request(body: bytes) -> list[str]:
    return [n for n in body.decode().split("\n") if n]


def build_info_response(values: dict[str, str]) -> bytes:
    text = "".join(f"{k}\t{v}\n" for k, v in values.items())
    return _proto_frame(text.encode(), INFO_MSG_TYPE)


def parse_info_response(body: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in body.decode().split("\n"):
        if "\t" in line:
            k, v = line.split("\t", 1)
            out[k] = v
    return out


def partitions_to_b64(partitions: set[int], n: int = N_PARTITIONS) -> str:
    """The replicas-master bitmap: bit i (0x80 >> (i & 7) of byte
    i >> 3) set iff this node masters partition i."""
    import base64

    buf = bytearray(n // 8)
    for p in partitions:
        buf[p >> 3] |= 0x80 >> (p & 7)
    return base64.b64encode(bytes(buf)).decode()


def b64_to_partitions(b64: str) -> set[int]:
    import base64

    raw = base64.b64decode(b64)
    return {
        (i << 3) | j
        for i, byte in enumerate(raw)
        for j in range(8)
        if byte & (0x80 >> j)
    }


def fetch_partition_map(
    host: str, port: int, namespace: str
) -> tuple[int, set[int]]:
    """One info round-trip: (partition-generation, the node's mastered
    partition set for `namespace`) — the client-side half of the C
    client's cluster tend."""
    sock = socket.create_connection((host, port))
    try:
        sock.sendall(
            build_info_request(["partition-generation", "replicas-master"])
        )
        typ, body = read_frame(sock)
        if typ != INFO_MSG_TYPE:
            raise ValueError("aerospike wire: non-info reply on info channel")
        vals = parse_info_response(body)
        gen = int(vals.get("partition-generation", "0"))
        for entry in vals.get("replicas-master", "").split(";"):
            if entry.startswith(namespace + ":"):
                return gen, b64_to_partitions(entry.split(":", 1)[1])
        return gen, set()
    finally:
        sock.close()


def fetch_replicas(
    host: str, port: int, namespace: str
) -> tuple[int, set[int], set[int]]:
    """One info round-trip on the RF-aware `replicas` command (the C
    client's modern tend path): (generation, mastered set, replica set)
    for `namespace`.  Wire shape per namespace:
    `ns:<generation>,<repl-factor>,<b64 master>[,<b64 replica>]`."""
    sock = socket.create_connection((host, port))
    try:
        sock.sendall(build_info_request(["replicas"]))
        typ, body = read_frame(sock)
        if typ != INFO_MSG_TYPE:
            raise ValueError("aerospike wire: non-info reply on info channel")
        vals = parse_info_response(body)
        for entry in vals.get("replicas", "").split(";"):
            if entry.startswith(namespace + ":"):
                parts = entry.split(":", 1)[1].split(",")
                gen, rf = int(parts[0]), int(parts[1])
                master = b64_to_partitions(parts[2])
                replica = (
                    b64_to_partitions(parts[3])
                    if rf >= 2 and len(parts) > 3
                    else set()
                )
                return gen, master, replica
        return 0, set(), set()
    finally:
        sock.close()


class ClusterRouter:
    """Client-side cluster state (round 12): the DISCOVERED partition
    map plus one pipelined WireClient per node, with RE-TEND on cluster
    change and RF=2 replica lookup for read fallback.

    The reference's C client hides all of this under
    aerospike_key_put_async: a background tend thread refreshes the
    partition map and re-routes the retries its error classification
    requeues (AerospikeWriter.cpp:138-180 is the classification half;
    the tend loop is the refresh half), and reads fall back to a
    replica when the master is unreachable.  Here the same machinery is
    explicit and synchronous: wait() == 'unavailable' -> retend() ->
    requeue the row through the refreshed map; a dead master at read
    time -> replica_idx_for's node.

    Not picklable (holds sockets): construct per task, inside the
    foreachPartition/mapInPandas closure."""

    def __init__(
        self,
        nodes: list[tuple[str, int]],
        namespace: str,
        set_name: str,
        user: str | None = None,
        credential: str | None = None,
        rf2: bool = False,
        max_retends: int = 64,
        initial_pmap: list[int] | None = None,
        compress_min: int | None = None,
    ):
        self.nodes = list(nodes)
        self.namespace = namespace
        self.set_name = set_name
        self._user = user
        self._credential = credential
        self._rf2 = rf2
        self._compress_min = compress_min
        self._max_retends = max_retends
        self._clients: dict[int, WireClient] = {}
        self.pmap: list[int] = []
        self.rmap: list[int] = []
        self.generation: tuple[int, ...] = ()
        self.dead: set[int] = set()
        self.n_retends = -1  # first retend() is the initial discovery
        if initial_pmap is not None:
            # the C-client shape: the PROCESS discovers once and workers
            # inherit the (plain-list, picklable) map; each worker then
            # re-tends itself when a node answers UNAVAILABLE
            self.pmap = list(initial_pmap)
            self.n_retends = 0
        else:
            self.retend()

    def retend(self) -> None:
        """(Re)discover the full partition map over the info channel —
        the C client's cluster tend.  Raises on a partition advertised
        by two masters, on unowned holes, and past `max_retends` (a
        routing bug no map refresh can fix must fail, not livelock)."""
        self.n_retends += 1
        if self.n_retends > self._max_retends:
            raise RuntimeError(
                f"cluster router: {self.n_retends} re-tends — the map is "
                "not converging"
            )
        pmap = [-1] * N_PARTITIONS
        rmap = [-1] * N_PARTITIONS
        gens = []
        self.dead: set[int] = set()
        for idx, (h, p) in enumerate(self.nodes):
            try:
                if self._rf2:
                    gen, owned, repl = fetch_replicas(h, p, self.namespace)
                    if not owned and not repl:
                        # node doesn't speak the multi-bitmap command
                        # (or genuinely owns nothing): the RF=1 map is
                        # the correct degradation either way
                        gen, owned = fetch_partition_map(h, p, self.namespace)
                else:
                    gen, owned = fetch_partition_map(h, p, self.namespace)
                    repl = set()
            except OSError:
                # dead node: skip it — the SURVIVORS advertise the
                # promoted ownership; holes still fail below, so a
                # death nobody absorbed is loud, not silent
                gens.append(-1)
                self.dead.add(idx)
                self.drop_client(idx)
                continue
            gens.append(gen)
            for pt in owned:
                if pmap[pt] != -1:
                    raise ValueError(
                        f"partition {pt} advertised by two masters"
                    )
                pmap[pt] = idx
            for pt in repl:
                rmap[pt] = idx
        if any(x == -1 for x in pmap):
            raise ValueError("partition map has unowned partitions")
        self.pmap, self.rmap, self.generation = pmap, rmap, tuple(gens)

    def pid_for(self, key: bytes) -> int:
        return partition_id(key_digest(self.set_name, key))

    def retend_if_stale(self, key: bytes, refused_idx: int) -> None:
        """Re-tend only when the CURRENT map still routes `key`'s
        partition at the node that just refused it (ADVICE r12).  A
        bounded-async window can hold ~100 puts pipelined through the
        stale map when a handoff lands; each drains 'unavailable', but
        only the FIRST needs an info sweep — after it refreshes the
        map, the rest see pmap already pointing elsewhere and skip.
        Unconditional re-tends burned up to window×nodes info round
        trips and could spuriously trip the max_retends livelock cap
        on one legitimate cluster change."""
        if self.pmap[self.pid_for(key)] == refused_idx:
            self.retend()

    def client(self, idx: int) -> WireClient:
        c = self._clients.get(idx)
        if c is None:
            h, p = self.nodes[idx]
            c = self._clients[idx] = WireClient(
                h, p, self.namespace, self.set_name,
                user=self._user, credential=self._credential,
                compress_min=self._compress_min,
            )
        return c

    def client_for(self, key: bytes) -> WireClient:
        """The master-routed client for `key` under the current map."""
        return self.client(self.pmap[self.pid_for(key)])

    def master_idx_for(self, key: bytes) -> int:
        return self.pmap[self.pid_for(key)]

    def replica_idx_for(self, key: bytes) -> int:
        """Replica node index for `key` (RF=2 maps), -1 when none."""
        return self.rmap[self.pid_for(key)]

    def batch_read(
        self, digests: list[bytes], filter_exp: tuple | None = None
    ) -> dict[bytes, tuple[int, dict[str, bytes]] | None]:
        """Cluster batch read (round 13): the real client's BATCH-NODE
        SPLIT — group the digests by their master under the current
        map, ONE batch request per node, collect the index-tagged
        results.  A per-record PARTITION_UNAVAILABLE (ownership moved)
        or a dead node (connection refused) re-tends the map and
        re-issues ONLY the unresolved digests; rounds are bounded by
        max_retends, so a non-converging map fails loudly instead of
        livelocking.  Returns digest -> (ttl, bins), or None for keys
        that do not exist, or BATCH_FILTERED for records the request's
        expression filter excluded (filter_exp, round 14)."""
        out: dict[bytes, tuple[int, dict[str, bytes]] | None] = {}
        pending = list(dict.fromkeys(digests))
        while pending:
            by_node: dict[int, list[bytes]] = {}
            for d in pending:
                by_node.setdefault(
                    self.pmap[partition_id(d)], []
                ).append(d)
            next_pending: list[bytes] = []
            for idx, items in by_node.items():
                try:
                    found, missing, unavailable, filtered = self.client(
                        idx
                    ).batch_get(items, filter_exp=filter_exp)
                except OSError:
                    # dead node: forget the connection, re-route the
                    # whole group through the refreshed (promoted) map
                    self.drop_client(idx)
                    next_pending.extend(items)
                    continue
                for i, d in enumerate(items):
                    if i in found:
                        out[d] = found[i]
                    elif i in missing:
                        out[d] = None
                    elif i in filtered:
                        out[d] = BATCH_FILTERED
                    elif i in unavailable:
                        next_pending.append(d)
                    else:
                        # a node answering the batch MUST account for
                        # every index it was sent; a silently-dropped
                        # digest is a protocol violation, surfaced here
                        # rather than as a bare KeyError in the caller
                        raise ValueError(
                            "aerospike wire: batch reply omitted index "
                            f"{i} (node {idx}, {len(items)} sent)"
                        )
            if next_pending:
                # one info sweep per ROUND, not per refused record —
                # max_retends bounds the rounds
                self.retend()
            pending = next_pending
        return out

    def batch_operate(
        self, items: list[tuple[bytes, list[tuple], int, int | None]]
    ) -> dict[bytes, tuple[str, int, int, dict[str, bytes]]]:
        """Cluster batch WRITE (round 15): the batch-node split applied
        to per-record write/operate sub-transactions — group the
        (digest, ops, ttl, expect_gen) items by their master under the
        current map, ONE batch-write request per node, collect the
        index-tagged per-record results.  A per-record
        PARTITION_UNAVAILABLE (a REFUSAL answered before that entry
        applied anything — the server contract that makes this safe)
        re-tends the map and re-issues ONLY the unresolved entries, so
        a refused INCR never double-applies.  Dead-node retries are
        DIFFERENT (ADVICE r15): a connect failure proves nothing was
        sent, so everything retries; a send/reply failure leaves the
        batch IN DOUBT — the node may have applied it before dying —
        so only entries whose replay cannot change stored state
        (delete, replace, create-only, and plain updates with
        read/write/touch ops only) re-issue, and read-modify-write
        entries (INCR/APPEND/PREPEND on a plain update) answer status
        'in_doubt' for the caller to decide.  Duplicate digests in one
        call are refused up front: two sub-transactions against one
        record in one batch would make the retry non-idempotent.
        Items are (digest, ops, ttl, expect_gen) or (..., create_only
        [, delete, replace]) tuples.  Returns digest -> (status, gen,
        ttl, read_bins); status 'ok' | 'exists' | 'gen_mismatch' |
        'not_found' | 'bin_type' | 'in_doubt'."""
        if len({it[0] for it in items}) != len(items):
            raise ValueError(
                "aerospike wire: duplicate digests in one batch_operate"
            )
        out: dict[bytes, tuple[str, int, int, dict[str, bytes]]] = {}
        pending = list(items)
        while pending:
            by_node: dict[int, list[tuple]] = {}
            for it in pending:
                by_node.setdefault(
                    self.pmap[partition_id(it[0])], []
                ).append(it)
            next_pending: list[tuple] = []
            for idx, group in by_node.items():
                try:
                    cli = self.client(idx)
                except OSError:
                    # connect failed: nothing was SENT — every entry
                    # re-routes safely after a re-tend
                    self.drop_client(idx)
                    next_pending.extend(group)
                    continue
                try:
                    res = cli.batch_write(list(group))
                except OSError:
                    # send/reply failure: the node may have applied the
                    # batch before dying.  Replay-safe entries retry;
                    # read-modify-write entries surface as in_doubt
                    # rather than risk a double-apply (ADVICE r15).
                    self.drop_client(idx)
                    for it in group:
                        if batch_entry_replay_safe(it):
                            next_pending.append(it)
                        else:
                            out[it[0]] = ("in_doubt", 0, 0, {})
                    continue
                for i, it in enumerate(group):
                    if i not in res:
                        # strict per-record accounting, like batch_read:
                        # a silently-dropped entry is a protocol error
                        raise ValueError(
                            "aerospike wire: batch-write reply omitted "
                            f"index {i} (node {idx}, {len(group)} sent)"
                        )
                    st, gen, ttl_, rb = res[i]
                    if st == "unavailable":
                        next_pending.append(it)
                    else:
                        out[it[0]] = (st, gen, ttl_, rb)
            if next_pending:
                # one info sweep per ROUND, not per refused record
                self.retend()
            pending = next_pending
        return out

    def drop_client(self, idx: int) -> None:
        """Forget a (dead) node's connection so the next use re-dials."""
        c = self._clients.pop(idx, None)
        if c is not None:
            try:
                c.close()
            except OSError:
                pass

    def close(self) -> None:
        for c in self._clients.values():
            try:
                c.close()
            except OSError:
                pass
        self._clients.clear()


# ------------------------------------------------- admin (security) codec
# The PUBLIC security handshake (AdminCommand.java / as_admin.c): admin
# messages ride proto type 2 with a 16-byte header — byte 2 the command,
# byte 3 the field count (responses carry the result code in byte 1) —
# followed by fields in the same (u32 size, u8 type, data) framing as
# AS_MSG.  LOGIN sends USER + CREDENTIAL (the bcrypt password hash: the
# cleartext never crosses the wire) and receives SESSION_TOKEN +
# SESSION_TTL; subsequent connections AUTHENTICATE with USER +
# SESSION_TOKEN.


def _admin_fields(fields: list[tuple[int, bytes]]) -> bytes:
    return b"".join(
        struct.pack(">IB", len(data) + 1, ftype) + data for ftype, data in fields
    )


def build_admin(command: int, fields: list[tuple[int, bytes]]) -> bytes:
    hdr = bytes([0, 0, command, len(fields)]) + bytes(12)
    return _proto_frame(hdr + _admin_fields(fields), ADMIN_MSG_TYPE)


def build_admin_response(
    result_code: int, fields: list[tuple[int, bytes]] | None = None
) -> bytes:
    fields = fields or []
    hdr = bytes([0, result_code, 0, len(fields)]) + bytes(12)
    return _proto_frame(hdr + _admin_fields(fields), ADMIN_MSG_TYPE)


def parse_admin(body: bytes) -> tuple[int, int, dict[int, bytes]]:
    """(command, result_code, {field_type: data}) — one walk parses both
    requests (command set) and responses (result code set)."""
    if len(body) < 16:
        raise ValueError("aerospike wire: short admin message")
    command, n_fields = body[2], body[3]
    result_code = body[1]
    off = 16
    fields: dict[int, bytes] = {}
    for _ in range(n_fields):
        if off + 5 > len(body):
            raise ValueError("aerospike wire: truncated admin field")
        (sz,) = struct.unpack_from(">I", body, off)
        fields[body[off + 4]] = body[off + 5 : off + 4 + sz]
        off += 4 + sz
    return command, result_code, fields


# ---------------------------------------------------------------- client


class WireClient:
    """Pipelined put client over one socket: `put()` sends and returns
    the send ordinal; `wait(handle)` reads responses (in order — the
    protocol answers a connection's requests in arrival order) until
    that ordinal's response arrived, and returns its disposition:
    'ok' | 'exists' | 'retry' (transient) — the classification of
    AerospikeWriter.cpp:137-161.  Plugs straight into
    kv_sink.bounded_async_foreach_writer as (put, wait)."""

    def __init__(
        self,
        host: str,
        port: int,
        namespace: str,
        set_name: str,
        user: str | None = None,
        password: str | None = None,
        credential: str | None = None,
        session_token: bytes | None = None,
        compress_min: int | None = None,
    ):
        self.sock = socket.create_connection((host, port))
        # pipelined small frames: Nagle + delayed-ACK turns each put
        # into a ~40 ms stall (measured: 141 records -> 20 s/pass)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.namespace = namespace
        self.set_name = set_name
        self._sent = 0
        self._received = 0
        self._results: dict[int, int] = {}
        # enable_compression (round 13): data frames at or above this
        # size ship inside the COMPRESSED proto envelope (type 4); the
        # server's read path unwraps transparently.  None = off, the
        # C-client default
        self.compress_min = compress_min
        self.n_compressed = 0
        self.session_token: bytes | None = None
        # security handshake before any data message (the real client
        # order): a session token AUTHENTICATEs outright; credentials
        # LOGIN (user + bcrypt hash — precompute `credential` once per
        # process to skip the per-connection hash, like the C client's
        # one-time hash_password)
        if session_token is not None and user is not None:
            self._admin(
                ADMIN_AUTHENTICATE,
                [
                    (ADMIN_FIELD_USER, user.encode()),
                    (ADMIN_FIELD_SESSION_TOKEN, session_token),
                ],
            )
            self.session_token = session_token
        elif user is not None:
            if credential is None:
                from .bcrypt_py import hashpw

                credential = hashpw(password or "")
            _, fields = self._admin(
                ADMIN_LOGIN,
                [
                    (ADMIN_FIELD_USER, user.encode()),
                    (ADMIN_FIELD_CREDENTIAL, credential.encode()),
                ],
            )
            self.session_token = fields.get(ADMIN_FIELD_SESSION_TOKEN)

    def _admin(self, command: int, fields: list[tuple[int, bytes]]):
        """One admin round-trip (handshakes are not pipelined)."""
        self.sock.sendall(build_admin(command, fields))
        typ, body = read_frame(self.sock)
        if typ != ADMIN_MSG_TYPE:
            raise ValueError("aerospike wire: non-admin reply to handshake")
        _, rc, rfields = parse_admin(body)
        if rc != RC_OK:
            raise PermissionError(
                f"aerospike wire: security handshake refused, code {rc}"
            )
        return rc, rfields

    def _send(self, frame: bytes) -> None:
        """Ship one data frame, inside the compressed envelope when
        enable_compression is on and the frame clears the size floor."""
        if self.compress_min is not None and len(frame) >= self.compress_min:
            frame = compress_frame(frame)
            self.n_compressed += 1
        self.sock.sendall(frame)

    def put(
        self, key: bytes, bins: dict[str, bytes], ttl: int,
        create_only: bool = True,
        expect_gen: int | None = None,
    ) -> int:
        self._send(
            build_put(
                self.namespace, self.set_name, key, bins, ttl,
                create_only=create_only, expect_gen=expect_gen,
            )
        )
        h = self._sent
        self._sent += 1
        return h

    def _drain_to(self, handle: int) -> bytes:
        """In-order response stream: buffer raw bodies until `handle`'s
        arrives (puts and gets share one ordinal space, so mixed
        pipelines redeem uniformly)."""
        while handle not in self._results:
            typ, body = read_frame(self.sock)
            if typ != MSG_TYPE:
                raise ValueError("aerospike wire: admin frame amid data")
            self._results[self._received] = body
            self._received += 1
        return self._results.pop(handle)

    def wait(self, handle: int) -> str:
        rc = parse_result_code(self._drain_to(handle))
        if rc == RC_OK:
            return "ok"
        if rc == RC_KEY_NOT_FOUND:
            return "not_found"  # idempotent delete of an absent key
        if rc in EXISTS_CODES:
            return "exists"
        if rc in TRANSIENT_CODES:
            return "retry"
        if rc == RC_PARTITION_UNAVAILABLE:
            return "unavailable"  # cluster changed: re-tend, then retry
        if rc == RC_GENERATION:
            return "gen_mismatch"  # CAS lost: re-read and reconcile
        raise RuntimeError(f"aerospike wire: put failed, result code {rc}")

    def put_digest(
        self, digest: bytes, bins: dict[str, bytes], ttl: int,
        create_only: bool = True,
    ) -> int:
        """Pipelined digest-addressed put (the asrestore write shape);
        redeem with wait()."""
        self._send(
            build_put_digest(
                self.namespace, self.set_name, digest, bins, ttl,
                create_only=create_only,
            )
        )
        h = self._sent
        self._sent += 1
        return h

    def delete(self, key: bytes) -> int:
        """Pipelined delete; redeem with wait() ('ok' | 'not_found' —
        deleting an absent key is idempotent, not an error)."""
        self._send(build_delete(self.namespace, self.set_name, key))
        h = self._sent
        self._sent += 1
        return h

    def touch(
        self, key: bytes, ttl: int, expect_gen: int | None = None
    ) -> int:
        """Pipelined TTL refresh (OP_TOUCH); redeem with wait() —
        'ok' | 'not_found' | 'gen_mismatch' (CAS-composed)."""
        self._send(
            build_touch(
                self.namespace, self.set_name, key, ttl,
                expect_gen=expect_gen,
            )
        )
        h = self._sent
        self._sent += 1
        return h

    def operate(
        self,
        key: bytes,
        ops: list[tuple],
        ttl: int = 0,
        expect_gen: int | None = None,
    ) -> int:
        """Pipelined multi-op transaction (aerospike_key_operate): the
        ordered op list applies atomically server-side, read ops answer
        in one record response — redeem with wait_operate().  See
        build_operate for the op grammar."""
        self._send(
            build_operate(
                self.namespace, self.set_name, key, ops, ttl,
                expect_gen=expect_gen,
            )
        )
        h = self._sent
        self._sent += 1
        return h

    def wait_operate(self, handle: int):
        """(status, gen, ttl, read_bins) for a pipelined operate —
        status 'ok' | 'not_found' | 'gen_mismatch' | 'bin_type';
        raises WireUnavailable on the cluster-change code so callers
        re-tend + retry like any other op."""
        body = self._drain_to(handle)
        rc, ttl, bins = parse_record_response(body)
        if rc == RC_OK:
            return "ok", parse_record_gen(body), ttl, bins
        if rc == RC_KEY_NOT_FOUND:
            return "not_found", 0, 0, {}
        if rc == RC_GENERATION:
            return "gen_mismatch", 0, 0, {}
        if rc == RC_BIN_TYPE:
            return "bin_type", 0, 0, {}
        if rc == RC_PARTITION_UNAVAILABLE:
            raise WireUnavailable(
                "aerospike wire: partition unavailable at this node"
            )
        raise RuntimeError(f"aerospike wire: operate failed, result code {rc}")

    def get(self, key: bytes) -> int:
        """Pipelined read: send the request, return the send ordinal;
        redeem with wait_record()."""
        self._send(build_get(self.namespace, self.set_name, key))
        h = self._sent
        self._sent += 1
        return h

    def wait_record(self, handle: int):
        """(ttl, bins) for a pipelined get, or None when the key does
        not exist.  Shares the in-order raw response stream with
        wait().  Raises WireUnavailable on the cluster-change code so
        read paths can fall back (re-tend or replica) distinctly from
        hard failures."""
        rc, ttl, bins = parse_record_response(self._drain_to(handle))
        if rc == RC_KEY_NOT_FOUND:
            return None
        if rc == RC_PARTITION_UNAVAILABLE:
            raise WireUnavailable(
                "aerospike wire: partition unavailable at this node"
            )
        if rc != RC_OK:
            raise RuntimeError(f"aerospike wire: get failed, result code {rc}")
        return ttl, bins

    def exists(self, key: bytes) -> int:
        """Pipelined metadata-only read (INFO1_NOBINDATA — the
        aerospike_key_exists probe); redeem with wait_record_gen:
        (generation, ttl, {}) or None."""
        self._send(build_exists(self.namespace, self.set_name, key))
        h = self._sent
        self._sent += 1
        return h

    def wait_record_gen(self, handle: int):
        """(gen, ttl, bins) for a pipelined get, or None when absent —
        the CAS loop's read half: the returned generation feeds the
        next gen-checked put.  Raises WireUnavailable like
        wait_record."""
        body = self._drain_to(handle)
        rc, ttl, bins = parse_record_response(body)
        if rc == RC_KEY_NOT_FOUND:
            return None
        if rc == RC_PARTITION_UNAVAILABLE:
            raise WireUnavailable(
                "aerospike wire: partition unavailable at this node"
            )
        if rc != RC_OK:
            raise RuntimeError(f"aerospike wire: get failed, result code {rc}")
        return parse_record_gen(body), ttl, bins

    def scan(
        self,
        pid_begin: int | None = None,
        pid_count: int | None = None,
        bins: list[str] | None = None,
        filter_exp: tuple | None = None,
        resume_digest: bytes | None = None,
        max_records: int | None = None,
    ):
        """Stream every record this node serves for (namespace, set) —
        optionally restricted to the partition range [pid_begin,
        pid_begin+pid_count) and/or PROJECTED to named bins (the
        as_scan_select shape: narrow reads of wide records ship only
        the requested bins): one scan request, yield (digest, ttl,
        bins) until the INFO3_LAST terminator.  A scan owns the
        connection's response stream, so it refuses to start with
        requests in flight (send scans on their own connection, like
        the real client does).

        PAGED/RESUMABLE form (round 16): with `max_records` the server
        returns one page of the range's total (pid, digest) order;
        pass the last digest received as the next call's
        `resume_digest` — on any connection, to any node serving the
        range — and the stream continues strictly after it.  A page
        shorter than `max_records` means the range is exhausted."""
        if self._sent != self._received or self._results:
            raise RuntimeError(
                "aerospike wire: scan on a connection with in-flight requests"
            )
        self._send(
            build_scan(
                self.namespace, self.set_name, pid_begin, pid_count,
                bins=bins, filter_exp=filter_exp,
                resume_digest=resume_digest, max_records=max_records,
            )
        )
        while True:
            typ, body = read_frame(self.sock)
            if typ != MSG_TYPE:
                raise ValueError("aerospike wire: non-data frame in scan")
            if len(body) >= 22 and body[3] & INFO3_LAST:
                rc = body[5]
                if rc != RC_OK:
                    raise RuntimeError(f"aerospike wire: scan failed, rc {rc}")
                return
            yield parse_scan_record(body)

    def info(self, names: list[str]) -> dict[str, str]:
        """One text-info round trip on this connection (not pipelined —
        refuses with requests in flight, like scan/batch)."""
        if self._sent != self._received or self._results:
            raise RuntimeError(
                "aerospike wire: info on a connection with in-flight requests"
            )
        self.sock.sendall(build_info_request(names))
        typ, body = read_frame(self.sock)
        if typ != INFO_MSG_TYPE:
            raise ValueError("aerospike wire: non-info reply to info")
        return parse_info_response(body)

    def sindex_create(
        self,
        bin_name: str,
        numeric: bool = True,
        ctx_map_key: bytes | None = None,
    ) -> None:
        """Create a secondary index on `bin_name` for this client's
        (namespace, set) — the public sindex-create info command the
        real asadm/clients issue.  Idempotent on the in-process server.

        `ctx_map_key` (round 16): index the value AT THIS MAP KEY
        inside the bin's K-ordered map particle (the public
        sindex-on-CDT `context=` parameter) — queries must carry the
        same context to be served by this index."""
        kind = "numeric" if numeric else "string"
        cmd = (
            f"sindex-create:ns={self.namespace};set={self.set_name};"
            f"indexname=idx_{bin_name};indexdata={bin_name},{kind}"
        )
        if ctx_map_key is not None:
            cmd += f";context=mapkey-{ctx_map_key.hex()}"
        resp = self.info([cmd])
        if resp.get(cmd) != "OK":
            raise RuntimeError(f"aerospike wire: sindex-create failed: {resp}")

    def query(
        self,
        index_range: bytes,
        pid_begin: int | None = None,
        pid_count: int | None = None,
        bins: list[str] | None = None,
        filter_exp: tuple | None = None,
        resume_digest: bytes | None = None,
        max_records: int | None = None,
    ):
        """Secondary-index QUERY (round 14): stream every record whose
        indexed bin satisfies `index_range` (encode_index_range) —
        same multi-record response as scan, same composability
        (partition slice / projection / expression filter — and, round
        16, digest-cursor pagination: queries page and resume exactly
        like scans, the server path is shared), but the node answers
        INDEX_NOT_FOUND unless a secondary index exists on the bin.
        Owns the response stream like scan."""
        if self._sent != self._received or self._results:
            raise RuntimeError(
                "aerospike wire: query on a connection with in-flight requests"
            )
        self._send(
            build_query(
                self.namespace, self.set_name, index_range,
                pid_begin, pid_count, bins=bins, filter_exp=filter_exp,
                resume_digest=resume_digest, max_records=max_records,
            )
        )
        while True:
            typ, body = read_frame(self.sock)
            if typ != MSG_TYPE:
                raise ValueError("aerospike wire: non-data frame in query")
            if len(body) >= 22 and body[3] & INFO3_LAST:
                rc = body[5]
                if rc == RC_INDEX_NOT_FOUND:
                    raise RuntimeError(
                        "aerospike wire: query needs a secondary index "
                        "on the bin (sindex-create first)"
                    )
                if rc != RC_OK:
                    raise RuntimeError(f"aerospike wire: query failed, rc {rc}")
                return
            yield parse_scan_record(body)

    def batch_get(
        self, digests: list[bytes], filter_exp: tuple | None = None
    ) -> tuple[
        dict[int, tuple[int, dict[str, bytes]]], set[int], set[int], set[int]
    ]:
        """One batch-index read: send every digest in ONE request, read
        the index-tagged record stream until INFO3_LAST.  Returns
        (found: index -> (ttl, bins), missing: not-found indexes,
        unavailable: indexes whose partition this node no longer serves
        — the caller re-tends and re-issues those, filtered: indexes
        whose record exists but failed the request's expression filter).
        Like scan, a batch owns the connection's response stream."""
        if self._sent != self._received or self._results:
            raise RuntimeError(
                "aerospike wire: batch on a connection with in-flight requests"
            )
        self._send(
            build_batch(
                self.namespace, self.set_name, digests, filter_exp=filter_exp
            )
        )
        found: dict[int, tuple[int, dict[str, bytes]]] = {}
        missing: set[int] = set()
        unavailable: set[int] = set()
        filtered: set[int] = set()
        while True:
            typ, body = read_frame(self.sock)
            if typ != MSG_TYPE:
                raise ValueError("aerospike wire: non-data frame in batch")
            if len(body) >= 22 and body[3] & INFO3_LAST:
                rc = body[5]
                if rc != RC_OK:
                    raise RuntimeError(
                        f"aerospike wire: batch failed, rc {rc}"
                    )
                return found, missing, unavailable, filtered
            index, rc, _digest, ttl, bins = parse_batch_record(body)
            if rc == RC_OK:
                found[index] = (ttl, bins)
            elif rc == RC_KEY_NOT_FOUND:
                missing.add(index)
            elif rc == RC_PARTITION_UNAVAILABLE:
                unavailable.add(index)
            elif rc == RC_FILTERED_OUT:
                filtered.add(index)
            else:
                raise RuntimeError(
                    f"aerospike wire: batch record rc {rc}"
                )

    def batch_write(
        self, entries: list[tuple]
    ) -> dict[int, tuple[str, int, int, dict[str, bytes]]]:
        """One batch-write request (round 15): every (digest, ops, ttl,
        expect_gen[, create_only]) sub-transaction in ONE request, the
        index-tagged record stream read until INFO3_LAST.  Returns
        index -> (status, gen, ttl, read_bins) with status 'ok' |
        'exists' (create-only refused) | 'gen_mismatch' | 'not_found' |
        'bin_type' | 'unavailable' — every per-record result code the
        server can answer, surfaced per entry so the router re-tends
        exactly the refused records.  Like scan and batch-read, a batch
        owns the connection's response stream."""
        if self._sent != self._received or self._results:
            raise RuntimeError(
                "aerospike wire: batch on a connection with in-flight requests"
            )
        self._send(
            build_batch_write(
                self.namespace,
                self.set_name,
                [(i, *e) for i, e in enumerate(entries)],
            )
        )
        out: dict[int, tuple[str, int, int, dict[str, bytes]]] = {}
        while True:
            typ, body = read_frame(self.sock)
            if typ != MSG_TYPE:
                raise ValueError("aerospike wire: non-data frame in batch")
            if len(body) >= 22 and body[3] & INFO3_LAST:
                rc = body[5]
                if rc != RC_OK:
                    raise RuntimeError(
                        f"aerospike wire: batch write failed, rc {rc}"
                    )
                return out
            index, rc, _digest, ttl, bins = parse_batch_record(body)
            gen = struct.unpack_from(">I", body, 6)[0]
            if rc == RC_OK:
                out[index] = ("ok", gen, ttl, bins)
            elif rc == RC_KEY_EXISTS:
                out[index] = ("exists", 0, 0, {})
            elif rc == RC_GENERATION:
                out[index] = ("gen_mismatch", 0, 0, {})
            elif rc == RC_KEY_NOT_FOUND:
                out[index] = ("not_found", 0, 0, {})
            elif rc == RC_BIN_TYPE:
                out[index] = ("bin_type", 0, 0, {})
            elif rc == RC_PARTITION_UNAVAILABLE:
                out[index] = ("unavailable", 0, 0, {})
            else:
                raise RuntimeError(
                    f"aerospike wire: batch write record rc {rc}"
                )

    def close(self) -> None:
        self.sock.close()


# ---------------------------------------------------------------- server


class WireServer:
    """In-process Aerospike-protocol server: parses requests with
    parse_put (an independent walk of the wire grammar), enforces
    CREATE-only against its store, answers in arrival order.

    `fail_every`: deterministic transient-failure injection — every
    N-th put (1-based, across the server's lifetime) is answered with
    RC_TIMEOUT and NOT applied, exercising the client/writer retry
    path end-to-end.  Store: {(namespace, set, digest): (bins, ttl)};
    `records()` snapshots it.

    `credentials=(user, password)` (round 11): security is enabled —
    the server stores bcrypt(password) exactly like a real cluster
    holds the client-hashed credential, answers LOGIN by string-compare
    (RC_INVALID_USER / RC_INVALID_CREDENTIAL on mismatch) with a fresh
    SESSION_TOKEN + TTL, accepts AUTHENTICATE with a live token
    (RC_EXPIRED_SESSION otherwise), and refuses data messages on
    unauthenticated connections with RC_NOT_AUTHENTICATED.

    `owned_partitions` (round 11): the node's slice of the 4096-entry
    partition map — a put whose digest partition is NOT owned answers
    RC_PARTITION_UNAVAILABLE (the real cluster-change signal: callers
    that expect stable routing treat the disposition as fatal; a
    re-tending router refreshes its map and re-routes, round 12).

    Round 12 cluster dynamics:
      * `set_owned(partitions)` swaps the owned slice and bumps
        `partition-generation` — the server half of a partition
        HANDOFF; in-flight puts routed by the stale map then draw
        RC_PARTITION_UNAVAILABLE until the client re-tends.
      * `on_put(n)` fires after every applied (successful, non-replica)
        write, INSIDE the store critical section (RLock) — a hook that
        hands off at put ordinal K is then atomic with put K: every
        put serialized later sees the new ownership deterministically.
      * `replica_partitions` is the slice this node holds as a
        non-master REPLICA (RF=2): advertised in the public `replicas`
        info command (master bitmap + replica bitmap per namespace),
        readable locally, NOT writable by clients.
      * `replicate_to` = [(server, partition_set)] — after applying a
        master write/delete the server forwards it in-process to each
        target holding that partition as replica (the cluster's
        server-side replication, invisible to clients)."""

    def __init__(
        self,
        fail_every: int = 0,
        credentials: tuple[str, str] | None = None,
        owned_partitions: set[int] | None = None,
        credential_salt: str | None = None,
        info_namespace: str = "tmx",
        replica_partitions: set[int] | None = None,
        on_put=None,
        on_get=None,
        on_scan=None,
        on_batch=None,
        on_operate=None,
        on_batch_write=None,
    ):
        self._store: dict[tuple[str, str, bytes], tuple[dict[str, bytes], int]] = {}
        # per-record write count (round 13): generation 1 on create,
        # +1 per replace — the version a gen-checked (CAS) write races
        # against and reads report back
        self._gens: dict[tuple[str, str, bytes], int] = {}
        # RLock: the on_put hook fires INSIDE the store critical section
        # (so a hook-triggered handoff is atomic with its trigger put —
        # no later put can slip in under the old ownership) and may call
        # methods that re-take this lock (set_owned / handoff)
        self._lock = threading.RLock()
        self._puts = 0
        self._fail_every = fail_every
        self._owned = owned_partitions
        self._replicas = replica_partitions or set()
        self.replicate_to: list[tuple["WireServer", set[int]]] = []
        # per-key last-applied replication sequence (replica side)
        self._repl_last: dict[tuple[str, str, bytes], int] = {}
        self._on_put = on_put
        self._on_get = on_get  # same contract as on_put, for reads
        self._gets = 0
        # on_scan(n): fires with the running scan-request ordinal INSIDE
        # the store critical section, BEFORE the snapshot — a hook that
        # hands off at scan K makes scan K (and everything later) see
        # the post-cutover ownership deterministically (round 13: the
        # mid-sweep-migration trigger for the scan re-tend row)
        self._on_scan = on_scan
        self._scans = 0
        # on_batch(n): fires with the running batch-request ordinal
        # INSIDE the store critical section, BEFORE the snapshot — a
        # hook that hands off at batch K makes batch K (and everything
        # later) see the post-cutover ownership deterministically
        # (round 13: the mid-lookup-migration trigger for the batch
        # re-tend row)
        self._on_batch = on_batch
        self._batches = 0
        # on_batch_write(n): fires with the running batch-WRITE ordinal
        # INSIDE the store critical section, BEFORE any entry applies —
        # a hook that hands off at batch-write K makes every entry of
        # batch K (and everything later) see the post-cutover ownership,
        # so refused entries provably applied nothing (round 15: the
        # mid-migration trigger for the batch-write re-tend row)
        self._on_batch_write = on_batch_write
        self._batch_writes = 0
        # OPERATE transactions served (round 14) — the multi-op
        # read-modify-write counter queries assert against; the hook
        # fires INSIDE the critical section after a mutating
        # transaction applies, like on_put (handoff triggers)
        self._operates = 0
        self._on_operate = on_operate
        # records actually shipped across all scans (round 14) — the
        # wire-volume counter the expression-filter row asserts against
        self._scan_shipped = 0
        # secondary indexes (round 14): (ns, set, bin) registered via
        # the sindex-create info command; queries against unindexed
        # bins answer AEROSPIKE_ERR_INDEX_NOT_FOUND, like the server
        self._sindexes: set[tuple[str, str, str, str]] = set()
        self._queries = 0
        # requests that arrived inside the COMPRESSED envelope (type 4)
        self._envelopes = 0
        self._info_namespace = info_namespace
        self._partition_generation = 1
        self._cred: tuple[str, str] | None = None
        if credentials is not None:
            from .bcrypt_py import DEFAULT_CLIENT_SALT, hashpw

            # credential_salt: the client constant is cost 10; callers
            # on the pure-Python budget may pin a lower-cost twin (the
            # algorithm and handshake are identical)
            self._cred = (
                credentials[0],
                hashpw(credentials[1], credential_salt or DEFAULT_CLIENT_SALT),
            )
        self._tokens: set[bytes] = set()
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                self.request.setsockopt(
                    socket.IPPROTO_TCP, socket.TCP_NODELAY, 1
                )
                authed = outer._cred is None
                try:
                    while True:
                        typ, body, compressed = read_frame_ex(self.request)
                        if compressed:
                            with outer._lock:
                                outer._envelopes += 1
                        if typ == INFO_MSG_TYPE:
                            self.request.sendall(outer._info(body))
                        elif typ == ADMIN_MSG_TYPE:
                            rc, fields, ok = outer._admin(body)
                            authed = authed or ok
                            self.request.sendall(
                                build_admin_response(rc, fields)
                            )
                        elif not authed:
                            self.request.sendall(
                                build_response(RC_NOT_AUTHENTICATED)
                            )
                        else:
                            self.request.sendall(outer._apply(body))
                except (ConnectionError, OSError):
                    return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True
            # 32 executor tasks x several nodes connect in one burst;
            # socketserver's default backlog of 5 can overflow the
            # accept queue and RST the excess (observed as a flaky
            # ConnectionResetError in the x15 slope probes)
            request_queue_size = 128

        self._server = Server(("127.0.0.1", 0), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def set_owned(self, partitions: set[int]) -> None:
        """Swap this node's mastered slice and bump the partition
        generation — the server side of a partition handoff.  Clients
        routing by the old map draw RC_PARTITION_UNAVAILABLE until they
        re-tend."""
        with self._lock:
            self._owned = set(partitions)
            self._partition_generation += 1

    def handoff(self, target: "WireServer", partitions: set[int]) -> int:
        """MIGRATE `partitions` — ownership AND data — to `target`
        (the cluster's partition migration): this node stops owning
        them (in-flight stale-routed puts then draw UNAVAILABLE), the
        stored records move to the target's store, both nodes bump
        their partition generation.  Returns the number of records
        migrated.  Locks are taken strictly self-then-target (one
        direction only), so concurrent _apply calls on either node
        serialize cleanly before/after the cutover."""
        with self._lock:
            moving = {
                k: v
                for k, v in self._store.items()
                if partition_id(k[2]) in partitions
            }
            moving_gens = {k: self._gens.get(k, 1) for k in moving}
            for k in moving:
                del self._store[k]
                self._gens.pop(k, None)
            owned = (
                self._owned if self._owned is not None
                else set(range(N_PARTITIONS))
            )
            self._owned = owned - partitions
            self._partition_generation += 1
        with target._lock:
            target._store.update(moving)
            target._gens.update(moving_gens)
            t_owned = (
                target._owned if target._owned is not None
                else set(range(N_PARTITIONS))
            )
            target._owned = t_owned | partitions
            target._partition_generation += 1
        return len(moving)

    def _store_replica(
        self, ns: str, st: str, digest: bytes,
        bins: dict[str, bytes] | None, ttl: int, seq: int, gen: int = 1,
    ) -> None:
        """Server-side replication target: apply a master's write (or
        delete, bins=None) to this node's store without ownership
        checks or create-only policy — replication replays the master's
        already-accepted outcome.  `seq` (ADVICE r12): the master tags
        each replicated op with a monotonic sequence drawn INSIDE its
        store critical section; the replica applies only ops NEWER than
        the last it saw for that key, so two same-key ops that race to
        the replica in the opposite order they committed on the master
        converge to the master's order instead of diverging.  (The
        alternative — forwarding while still holding the master's lock
        — deadlocks on the ring replication topology the RF=2 rows use:
        three concurrent writers give the circular wait L0→L1→L2→L0.)"""
        k = (ns, st, digest)
        with self._lock:
            if seq <= self._repl_last.get(k, 0):
                return  # an older op arriving late: the newer one won
            self._repl_last[k] = seq
            if bins is None:
                self._store.pop(k, None)
                self._gens.pop(k, None)
            else:
                self._store[k] = (bins, ttl)
                # the replica mirrors the MASTER's generation (it never
                # counts its own applies): a post-promotion CAS loop
                # continues against the same version numbers
                self._gens[k] = gen

    def _replicate(
        self, pid: int, ns: str, st: str, digest: bytes,
        bins: dict[str, bytes] | None, ttl: int, seq: int, gen: int = 1,
    ) -> None:
        for target, parts in self.replicate_to:
            if pid in parts:
                target._store_replica(ns, st, digest, bins, ttl, seq, gen)

    def _info(self, body: bytes) -> bytes:
        """Text info channel: the names the C client's cluster tend
        consults.  The partition map advertises this node's OWNED slice
        (all 4096 when unrestricted) for the configured namespace;
        `replicas` (round 12, RF>=2) answers the public per-namespace
        shape `ns:regime,repl-factor,<b64 master>,<b64 replica>`."""
        with self._lock:
            owned = (
                set(self._owned)
                if self._owned is not None
                else set(range(N_PARTITIONS))
            )
            gen = self._partition_generation
            replicas = set(self._replicas)
        rf = 2 if replicas else 1
        values = {
            "node": f"BB9{self.port:05X}0000000",
            "partition-generation": str(gen),
            "replicas-master": f"{self._info_namespace}:"
            + partitions_to_b64(owned),
            "replicas": f"{self._info_namespace}:{gen},{rf},"
            + partitions_to_b64(owned)
            + ("," + partitions_to_b64(replicas) if replicas else ""),
        }
        names = parse_info_request(body)
        out: dict[str, str] = {}
        for n in names:
            if n.startswith(("sindex-create:", "sindex-delete:")):
                # the public sindex DDL rides the info channel
                params = dict(
                    kv.split("=", 1)
                    for kv in n.split(":", 1)[1].split(";")
                    if "=" in kv
                )
                ixd = params.get("indexdata", "")
                key = (
                    params.get("ns", ""),
                    params.get("set", ""),
                    ixd.split(",", 1)[0],
                    params.get("context", ""),
                )
                with self._lock:
                    if n.startswith("sindex-create:"):
                        self._sindexes.add(key)
                    else:
                        self._sindexes.discard(key)
                out[n] = "OK"
            elif n in values:
                out[n] = values[n]
        return build_info_response(out)

    def _admin(self, body: bytes):
        """-> (result_code, response fields, connection_now_authed)."""
        import os as _os

        try:
            command, _rc, fields = parse_admin(body)
        except ValueError:
            return RC_SERVER_ERROR, [], False
        if self._cred is None:
            # security not enabled: the real server answers code 52
            return 52, [], False
        user = fields.get(ADMIN_FIELD_USER, b"").decode()
        if user != self._cred[0]:
            return RC_INVALID_USER, [], False
        if command == ADMIN_LOGIN:
            cred = fields.get(ADMIN_FIELD_CREDENTIAL, b"").decode()
            if cred != self._cred[1]:
                return RC_INVALID_CREDENTIAL, [], False
            token = _os.urandom(16)
            with self._lock:
                self._tokens.add(token)
            return (
                RC_OK,
                [
                    (ADMIN_FIELD_SESSION_TOKEN, token),
                    (ADMIN_FIELD_SESSION_TTL, struct.pack(">I", 86400)),
                ],
                True,
            )
        if command == ADMIN_AUTHENTICATE:
            token = fields.get(ADMIN_FIELD_SESSION_TOKEN, b"")
            with self._lock:
                live = token in self._tokens
            return (RC_OK, [], True) if live else (RC_EXPIRED_SESSION, [], False)
        return 54, [], False  # INVALID_COMMAND

    def _apply(self, frame: bytes) -> bytes:
        """One data message -> the full response frame.  info1 READ
        (round 11): look the digest up and answer a record response
        with the stored bins + ttl (NOT_FOUND for absent keys) — the
        read-back verify phase; else the create-only write path."""
        try:
            if frame_is_operate(frame):
                return self._operate(frame)
            if (
                len(frame) >= 22
                and frame[1] & INFO1_BATCH
                and frame[2] & INFO2_WRITE
            ):
                # BATCH-WRITE (round 15): the flag pair no other
                # request shape carries — per-record sub-transactions
                ns, st, _d, _b, _t, _co = parse_put(
                    frame, require_digest=False
                )
                entries = parse_batch_write_entries(frame)
                if entries is None:
                    return build_response(RC_SERVER_ERROR)
                return self._batch_write(ns, st, entries)
            if len(frame) >= 22 and frame[1] & INFO1_READ:
                ns, st, digest, _b, _t, _co = parse_put(
                    frame, require_digest=False
                )
                if frame[1] & INFO1_BATCH:
                    entries = parse_batch_entries(frame)
                    if entries is None:
                        return build_response(RC_SERVER_ERROR)
                    return self._batch(
                        ns, st, entries, parse_scan_filter(frame)
                    )
                if not digest:
                    return self._scan(
                        ns, st, parse_pid_range(frame),
                        parse_scan_bins(frame),
                        parse_scan_filter(frame),
                        parse_index_range(frame),
                        parse_scan_resume(frame),
                        parse_scan_max_records(frame),
                    )
                pid = partition_id(digest)
                with self._lock:
                    readable = (
                        self._owned is None
                        or pid in self._owned
                        or pid in self._replicas
                    )
                    rec = self._store.get((ns, st, digest)) if readable else None
                    gen = self._gens.get((ns, st, digest), 1)
                    if readable:
                        self._gets += 1
                        if self._on_get is not None:
                            self._on_get(self._gets)
                if not readable:
                    return build_response(RC_PARTITION_UNAVAILABLE)
                if rec is None:
                    return build_record_response(RC_KEY_NOT_FOUND, 0, {})
                if frame[1] & INFO1_NOBINDATA:
                    # metadata-only read: generation + ttl, zero ops
                    return build_record_response(RC_OK, rec[1], {}, gen=gen)
                return build_record_response(RC_OK, rec[1], rec[0], gen=gen)
            ns, st, digest, bins, ttl, create_only = parse_put(frame)
        except ValueError:
            return build_response(RC_SERVER_ERROR)
        pid = partition_id(digest)
        if frame[2] & INFO2_DELETE:
            with self._lock:
                if self._owned is not None and pid not in self._owned:
                    return build_response(RC_PARTITION_UNAVAILABLE)
                gone = self._store.pop((ns, st, digest), None)
                self._gens.pop((ns, st, digest), None)
                seq = next(_REPL_SEQ) if gone is not None else 0
            if gone is not None:
                self._replicate(pid, ns, st, digest, None, 0, seq, 0)
            return build_response(RC_OK if gone is not None else RC_KEY_NOT_FOUND)
        with self._lock:
            if self._owned is not None and pid not in self._owned:
                # ownership moved (or the client's map is wrong): the
                # cluster-change signal; a re-tending client refreshes
                # its map and re-routes, anything else fails loudly
                return build_response(RC_PARTITION_UNAVAILABLE)
            self._puts += 1
            n_puts = self._puts
            if self._fail_every and self._puts % self._fail_every == 0:
                return build_response(RC_TIMEOUT)
            k = (ns, st, digest)
            if create_only and k in self._store:
                return build_response(RC_KEY_EXISTS)
            expect = parse_put_gen(frame)
            if expect is not None and k in self._store and self._gens.get(k, 0) != expect:
                # the CAS refusal: the record's write count moved on —
                # the writer must re-read and reconcile.  Matching
                # AS_POLICY_GEN_EQ, the generation policy applies only
                # to EXISTING records: a gen-checked write against an
                # absent key creates it (the real server's behavior),
                # it does not answer RC_GENERATION (ADVICE r13)
                return build_response(RC_GENERATION)
            if parse_has_touch(frame):
                # TOUCH: reset the stored ttl, bump the generation,
                # keep the bins — absent records answer NOT_FOUND
                cur = self._store.get(k)
                if cur is None:
                    return build_response(RC_KEY_NOT_FOUND)
                bins = cur[0]
            self._store[k] = (bins, ttl)
            gen = self._gens[k] = self._gens.get(k, 0) + 1
            # the replication sequence is drawn INSIDE the critical
            # section: same-key ops get seq numbers in their commit
            # order, so the replica's newest-seq-wins rule reproduces
            # the master's order even when forwards race (ADVICE r12)
            seq = next(_REPL_SEQ)
            # INSIDE the critical section (RLock): a hook-triggered
            # handoff/set_owned is then atomic with this put — every
            # put serialized after the trigger sees the new ownership.
            # Hooks that hand off must only ever move locks one
            # direction (self -> target) to stay cycle-free.
            if self._on_put is not None:
                self._on_put(n_puts)
        # forward outside this node's lock (targets take their own):
        # holding it would deadlock the ring topology, see _store_replica
        self._replicate(pid, ns, st, digest, bins, ttl, seq, gen)
        return build_response(RC_OK)

    def _batch_write(
        self, ns: str, st: str,
        entries: list[tuple[int, bytes, list[tuple], int, int | None]],
    ) -> bytes:
        """BATCH-WRITE response (round 15): one index-tagged record
        response per entry, each sub-transaction applied ATOMICALLY
        under the node's store lock with exactly the single-OPERATE
        semantics (apply_op_list; gen bumps once per mutating entry,
        AS_POLICY_GEN_EQ checks existing records only, read ops answer
        post-mutation values).  The whole batch applies under ONE lock
        acquisition, so a concurrent handoff lands entirely before or
        entirely after it — and PARTITION_UNAVAILABLE is a per-record
        REFUSAL answered BEFORE that entry applies anything, so a
        re-tending client's re-issue can never double-apply an INCR
        (the same refuse-before-apply contract the single-operate
        handoff row proves).  Writes require MASTERED partitions
        (replicas refuse), matching the put path.  Replication forwards
        are collected inside the lock and sent outside it, like _apply."""
        results: list[tuple[int, bytes, int, int, dict[str, bytes], int]] = []
        repl: list[tuple] = []
        with self._lock:
            self._batch_writes += 1
            if self._on_batch_write is not None:
                self._on_batch_write(self._batch_writes)
            for index, digest, ops, ttl, expect_gen, *rest in entries:
                create_only = bool(rest[0]) if rest else False
                delete = bool(rest[1]) if len(rest) > 1 else False
                replace = bool(rest[2]) if len(rest) > 2 else False
                pid = partition_id(digest)
                if self._owned is not None and pid not in self._owned:
                    results.append(
                        (index, digest, RC_PARTITION_UNAVAILABLE, 0, {}, 0)
                    )
                    continue
                k = (ns, st, digest)
                cur = self._store.get(k)
                if delete:
                    # the batch grammar's DELETE record type: remove
                    # under the same CAS policy, idempotent on absence
                    if (
                        expect_gen is not None
                        and cur is not None
                        and self._gens.get(k, 0) != expect_gen
                    ):
                        results.append(
                            (index, digest, RC_GENERATION, 0, {}, 0)
                        )
                        continue
                    gone = self._store.pop(k, None)
                    self._gens.pop(k, None)
                    if gone is not None:
                        seq = next(_REPL_SEQ)
                        repl.append((pid, ns, st, digest, None, 0, seq, 0))
                        results.append((index, digest, RC_OK, 0, {}, 0))
                    else:
                        results.append(
                            (index, digest, RC_KEY_NOT_FOUND, 0, {}, 0)
                        )
                    continue
                has_write = any(o[0] not in READ_OP_KINDS for o in ops)
                if cur is None and not has_write:
                    results.append((index, digest, RC_KEY_NOT_FOUND, 0, {}, 0))
                    continue
                if create_only and cur is not None:
                    # the migration sink's idempotence policy: an
                    # existing record refuses per-record, applying
                    # nothing (EXISTS is the caller's not-an-error)
                    results.append((index, digest, RC_KEY_EXISTS, 0, {}, 0))
                    continue
                if (
                    expect_gen is not None
                    and cur is not None
                    and self._gens.get(k, 0) != expect_gen
                ):
                    results.append((index, digest, RC_GENERATION, 0, {}, 0))
                    continue
                # REPLACE policy: ops apply onto an empty record (the
                # gen check above still ran against the stored record);
                # `exists` keeps touch checking the STORED record, not
                # the empty replace baseline (ADVICE r15)
                rc, bins, read_bins = apply_op_list(
                    None if replace else cur, ops, exists=cur is not None
                )
                if rc != RC_OK:
                    results.append((index, digest, rc, 0, {}, 0))
                    continue
                if has_write:
                    self._store[k] = (bins, ttl)
                    gen = self._gens[k] = self._gens.get(k, 0) + 1
                    seq = next(_REPL_SEQ)
                    repl.append((pid, ns, st, digest, bins, ttl, seq, gen))
                    out_ttl = ttl
                else:
                    gen = self._gens.get(k, 1)
                    out_ttl = cur[1]
                results.append((index, digest, RC_OK, out_ttl, read_bins, gen))
        for r in repl:
            self._replicate(*r)
        out = [
            build_batch_record(i, d, rc, ttl, bins, gen=g)
            for i, d, rc, ttl, bins, g in results
        ]
        out.append(build_scan_last())
        return b"".join(out)

    def _operate(self, frame: bytes) -> bytes:
        """OPERATE: apply the ordered op list atomically under ONE lock
        acquisition and answer the read ops' values in one record
        response — reads placed AFTER mutations see the mutated values
        (read-your-write inside the transaction), the whole transaction
        bumps the generation by exactly one however many mutating ops
        ride in it, and the CAS policy (INFO2_GENERATION) guards the
        whole transaction.  The blind-retry failure injection
        (fail_every) deliberately does NOT apply here: a multi-op
        transaction is not idempotent (INCR doubles on replay), so the
        real client never blind-retries operates on timeouts."""
        try:
            ns, st, digest, ttl, expect_gen, ops = parse_operate(frame)
        except ValueError:
            return build_response(RC_SERVER_ERROR)
        pid = partition_id(digest)
        has_write = any(o[0] not in READ_OP_KINDS for o in ops)
        with self._lock:
            if self._owned is not None and pid not in self._owned:
                return build_response(RC_PARTITION_UNAVAILABLE)
            self._operates += 1
            k = (ns, st, digest)
            cur = self._store.get(k)
            if cur is None and not has_write:
                return build_record_response(RC_KEY_NOT_FOUND, 0, {})
            # AS_POLICY_GEN_EQ semantics: the check applies only to
            # existing records (an absent key is created)
            if (
                expect_gen is not None
                and cur is not None
                and self._gens.get(k, 0) != expect_gen
            ):
                return build_response(RC_GENERATION)
            rc, bins, read_bins = apply_op_list(cur, ops)
            if rc != RC_OK:
                return build_response(rc)
            if has_write:
                self._store[k] = (bins, ttl)
                gen = self._gens[k] = self._gens.get(k, 0) + 1
                seq = next(_REPL_SEQ)
                if self._on_operate is not None:
                    self._on_operate(self._operates)
            else:
                gen = self._gens.get(k, 1)
                ttl = cur[1]
                seq = None
        if seq is not None:
            # forward outside this node's lock, like the put path
            self._replicate(pid, ns, st, digest, bins, ttl, seq, gen)
        return build_record_response(RC_OK, ttl, read_bins, gen=gen)

    def _batch(
        self, ns: str, st: str, entries: list[tuple[int, bytes]],
        filter_exp: tuple | None = None,
    ) -> bytes:
        """BATCH response: one index-tagged record response per entry
        (OK + bins / KEY_NOT_FOUND / per-record PARTITION_UNAVAILABLE
        when the digest's partition is not served here — readable =
        mastered OR held as replica, same as the single-get rule) plus
        the INFO3_LAST terminator.  The whole batch snapshots under ONE
        lock acquisition, so a concurrent handoff lands entirely before
        or entirely after a batch — never splitting it."""
        with self._lock:
            self._batches += 1
            if self._on_batch is not None:
                self._on_batch(self._batches)
            rows = []
            for index, digest in entries:
                pid = partition_id(digest)
                readable = (
                    self._owned is None
                    or pid in self._owned
                    or pid in self._replicas
                )
                if not readable:
                    rows.append(
                        (index, digest, RC_PARTITION_UNAVAILABLE, 0, {}, 0)
                    )
                    continue
                rec = self._store.get((ns, st, digest))
                if rec is None:
                    rows.append((index, digest, RC_KEY_NOT_FOUND, 0, {}, 0))
                elif (
                    filter_exp is not None
                    and exp_eval(filter_exp, rec[0]) is not True
                ):
                    # the record exists but the predicate excluded it:
                    # FILTERED_OUT, no bins cross the wire (tri-state —
                    # UNKNOWN filters out, like the scan path)
                    rows.append((index, digest, RC_FILTERED_OUT, 0, {}, 0))
                else:
                    rows.append(
                        (
                            index, digest, RC_OK, rec[1], rec[0],
                            self._gens.get((ns, st, digest), 1),
                        )
                    )
        out = [
            build_batch_record(i, d, rc, ttl, bins, gen=g)
            for i, d, rc, ttl, bins, g in rows
        ]
        out.append(build_scan_last())
        return b"".join(out)

    def _scan(
        self, ns: str, st: str, pid_range: tuple[int, int] | None = None,
        bins: list[str] | None = None,
        filter_exp: tuple | None = None,
        index_range: tuple | None = None,
        resume: bytes | None = None,
        max_records: int | None = None,
    ) -> bytes:
        """SCAN response: every (ns, set) record this node MASTERS as a
        digest-tagged record stream + the INFO3_LAST terminator.
        Masters only (not replicas): each record then appears exactly
        once across a whole-cluster scan — the dedup-free contract
        cluster backup scans rely on.  A partition filter restricts the
        sweep to [begin, begin+count).  The snapshot is taken under the
        lock; frames are built outside it.  At fixture scale the whole
        stream returns as one sendall; a production server chunks —
        the client's framing loop is already incremental either way.

        The stream is TOTALLY ORDERED by (pid, digest) — the resumable
        contract (round 16): `resume` drops everything at or before the
        cursor (PARAMETER error when the cursor's partition is outside
        the request's own range), `max_records` caps the page.  A
        re-issued page is byte-identical as long as the stored state
        hasn't changed — what makes a speculatively re-executed scan
        task safe."""

        def in_range(pid: int) -> bool:
            return pid_range is None or (
                pid_range[0] <= pid < pid_range[0] + pid_range[1]
            )

        def index_hit(rec_bins: dict[str, bytes]) -> bool:
            """The query predicate against the indexed bin — evaluated
            on the store snapshot (the in-process server's 'index' is
            the semantic contract: registry-gated predicate reads; the
            real server's btree maintenance is out of scope)."""
            if index_range is None:
                return True
            name, ptype, lo, hi, eq, ctx = index_range
            v = rec_bins.get(name)
            if v is None:
                return False  # unset bins are never indexed
            if ctx is not None:
                # CDT context: the indexed value is the map entry at
                # the context key; non-map particles and absent keys
                # are simply not in the index
                m = unpack_map(v)
                if m is None:
                    return False
                v = m.get(ctx)
                if v is None:
                    return False
            if ptype == EXP_TYPE_INT:
                if len(v) != 8:
                    return False
                return lo <= int.from_bytes(v, "big", signed=True) <= hi
            return v == eq

        with self._lock:
            if index_range is not None:
                self._queries += 1
                ctx_tag = (
                    ""
                    if index_range[5] is None
                    else "mapkey-" + index_range[5].hex()
                )
                if (ns, st, index_range[0], ctx_tag) not in self._sindexes:
                    # queries REQUIRE a secondary index (scans don't) —
                    # and an index WITH a context only serves queries
                    # with that same context (the real server's rule)
                    return build_scan_last(RC_INDEX_NOT_FOUND)
            self._scans += 1
            if self._on_scan is not None:
                self._on_scan(self._scans)
            if resume is not None and not in_range(partition_id(resume)):
                # the cursor names a partition the request's own range
                # excludes — a malformed resume, not an empty page
                return build_scan_last(RC_PARAMETER)
            snap = [
                (
                    k[2],
                    v[1],
                    v[0]
                    if bins is None
                    else {n: b for n, b in v[0].items() if n in bins},
                )
                for k, v in self._store.items()
                if k[0] == ns
                and k[1] == st
                and (self._owned is None or partition_id(k[2]) in self._owned)
                and in_range(partition_id(k[2]))
                and index_hit(v[0])
                # the expression filter evaluates against the FULL
                # record (pre-projection), shipping only exact-True —
                # row-count pruning composing with width pruning
                and (filter_exp is None or exp_eval(filter_exp, v[0]) is True)
            ]
            # total (pid, digest) order — the resumable-stream contract
            snap.sort(key=lambda r: (partition_id(r[0]), r[0]))
            if resume is not None:
                cursor = (partition_id(resume), resume)
                snap = [
                    r for r in snap if (partition_id(r[0]), r[0]) > cursor
                ]
            if max_records is not None:
                snap = snap[:max_records]
            self._scan_shipped += len(snap)
        out = [build_scan_record(d, ttl, rb) for d, ttl, rb in snap]
        out.append(build_scan_last())
        return b"".join(out)

    def records(self) -> dict[tuple[str, str, bytes], tuple[dict[str, bytes], int]]:
        with self._lock:
            return dict(self._store)

    def close(self) -> None:
        self._server.shutdown()
        # release the listening socket too: a "dead" node must REFUSE
        # new connections (ECONNREFUSED), not park them in the accept
        # backlog — the read-fallback path keys off that refusal
        self._server.server_close()
