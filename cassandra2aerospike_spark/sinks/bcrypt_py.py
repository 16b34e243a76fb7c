"""Pure-Python bcrypt (round 11) — the Aerospike security handshake's
credential hash.

Aerospike clients authenticate by sending ``bcrypt(password, salt)`` as
the CREDENTIAL field of the LOGIN/AUTHENTICATE admin message; the
server stores the same hash and string-compares (the cleartext never
crosses the wire).  The C/Java clients hash with a FIXED public salt
(``$2a$10$7EqJtq98hPqEX7fNZaFWoO`` — AdminCommand.hashPassword), so the
credential is deterministic per password.  No bcrypt package exists in
this environment; the public algorithm (Provos & Mazieres, USENIX '99 /
the OpenBSD implementation's semantics) is implemented directly:

  * Blowfish P-array / S-boxes seeded from the hexadecimal expansion of
    pi — GENERATED here via the Chudnovsky series with integer
    arithmetic instead of embedding 8 KiB of tables, then asserted
    against the published first words (0x243F6A88...);
  * eksblowfish: expandstate(salt, key) once, then 2^cost alternating
    expand0state(key)/expand0state(salt) rounds;
  * the ``$2a$`` variant: the key is the password UTF-8 bytes plus a
    trailing NUL; 64 ECB encryptions of "OrpheanBeholderScryDoubt";
    23 of 24 output bytes, bcrypt-base64 alphabet.

Verified against the published jBCrypt test vectors (tests/test_sinks).
Throughput note: pure-Python cost-10 is ~seconds; the engine memoizes
per (password, salt) so a process pays once, and the cluster-sink query
uses a cost-6 salt (same algorithm, 1/16 the schedule) with the
client's cost-10 constant exposed as DEFAULT_CLIENT_SALT.
"""

from __future__ import annotations

from functools import lru_cache

_B64 = "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
_B64_INV = {c: i for i, c in enumerate(_B64)}

# the Aerospike client's fixed hashing salt (public constant,
# AdminCommand.java hashPassword / as_password_gen_hash)
DEFAULT_CLIENT_SALT = "$2a$10$7EqJtq98hPqEX7fNZaFWoO"

_MAGIC = b"OrpheanBeholderScryDoubt"
_M32 = 0xFFFFFFFF


def _pi_words(n_words: int) -> list[int]:
    """First `n_words` 32-bit words of pi's fractional part (the
    Blowfish initial state), via the Chudnovsky series in scaled
    integer arithmetic (isqrt; ~47 bits per term)."""
    from math import isqrt

    prec = 32 * n_words + 64
    one = 1 << prec
    terms = prec // 46 + 2
    m = 1  # (6k)! / ((3k)! (k!)^3), exact integer by recurrence
    x = 1  # (-640320^3)^k
    s = 0
    for k in range(terms):
        s += m * (13591409 + 545140134 * k) * one // x
        m = (
            m
            * ((6 * k + 1) * (6 * k + 2) * (6 * k + 3))
            * ((6 * k + 4) * (6 * k + 5) * (6 * k + 6))
            // ((3 * k + 1) * (3 * k + 2) * (3 * k + 3) * (k + 1) ** 3)
        )
        x *= -262537412640768000
    sqrt10005 = isqrt(10005 << (2 * prec))
    pi = 426880 * sqrt10005 * one // s
    frac = pi - 3 * one
    words = [
        (frac >> (prec - 32 * (i + 1))) & _M32 for i in range(n_words)
    ]
    # the published Blowfish P-array head — generation sanity pin
    assert words[:4] == [0x243F6A88, 0x85A308D3, 0x13198A2E, 0x03707344]
    return words


_PI = _pi_words(18 + 4 * 256)
_P_INIT = _PI[:18]
_S_INIT = [_PI[18 + 256 * b : 18 + 256 * (b + 1)] for b in range(4)]


def _encrypt(P, S0, S1, S2, S3, left: int, right: int) -> tuple[int, int]:
    for i in range(0, 16, 2):
        left ^= P[i]
        right ^= (
            ((S0[left >> 24] + S1[(left >> 16) & 255]) & _M32)
            ^ S2[(left >> 8) & 255]
        ) + S3[left & 255] & _M32
        right &= _M32
        right ^= P[i + 1]
        left ^= (
            ((S0[right >> 24] + S1[(right >> 16) & 255]) & _M32)
            ^ S2[(right >> 8) & 255]
        ) + S3[right & 255] & _M32
        left &= _M32
    return right ^ P[17], left ^ P[16]


def _words(data: bytes):
    """Cyclic big-endian 32-bit word stream over `data`."""
    n = len(data)
    pos = 0
    while True:
        w = 0
        for _ in range(4):
            w = ((w << 8) | data[pos]) & _M32
            pos = (pos + 1) % n
        yield w


def _expand(P, S, key: bytes, salt: bytes | None) -> None:
    kw = _words(key)
    for i in range(18):
        P[i] ^= next(kw)
    S0, S1, S2, S3 = S
    left = right = 0
    if salt is None:
        boxes = [P, S0, S1, S2, S3]
        for box in boxes:
            for i in range(0, len(box), 2):
                left, right = _encrypt(P, S0, S1, S2, S3, left, right)
                box[i], box[i + 1] = left, right
    else:
        sw = [int.from_bytes(salt[i : i + 4], "big") for i in range(0, 16, 4)]
        j = 0
        for box in [P, S0, S1, S2, S3]:
            for i in range(0, len(box), 2):
                left ^= sw[j]
                right ^= sw[(j + 1) & 3]
                j = (j + 2) & 3
                left, right = _encrypt(P, S0, S1, S2, S3, left, right)
                box[i], box[i + 1] = left, right


def _b64_encode(data: bytes, n_chars: int) -> str:
    out = []
    bits = 0
    acc = 0
    for b in data:
        acc = (acc << 8) | b
        bits += 8
        while bits >= 6:
            bits -= 6
            out.append(_B64[(acc >> bits) & 63])
    if bits:
        out.append(_B64[(acc << (6 - bits)) & 63])
    return "".join(out[:n_chars])


def _b64_decode(s: str, n_bytes: int) -> bytes:
    acc = 0
    bits = 0
    out = bytearray()
    for c in s:
        acc = (acc << 6) | _B64_INV[c]
        bits += 6
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 255)
    return bytes(out[:n_bytes])


@lru_cache(maxsize=64)
def hashpw(password: str, salt: str = DEFAULT_CLIENT_SALT) -> str:
    """bcrypt(password, salt) -> the full ``$2a$NN$<22 salt><31 hash>``
    string (what Aerospike clients send as CREDENTIAL and servers
    store).  Memoized: the pure-Python schedule at the client's cost 10
    is ~seconds, paid once per process like the C client's one-time
    hash_password."""
    parts = salt.split("$")
    if len(parts) < 4 or parts[1] not in ("2a", "2b", "2y") or len(parts[3]) < 22:
        raise ValueError(f"bad bcrypt salt {salt!r}")
    cost = int(parts[2])
    if not 4 <= cost <= 31:
        raise ValueError(f"bcrypt cost {cost} out of range")
    salt_bytes = _b64_decode(parts[3][:22], 16)
    key = password.encode("utf-8") + b"\x00"  # $2a$: NUL-terminated
    P = list(_P_INIT)
    S = [list(box) for box in _S_INIT]
    _expand(P, S, key, salt_bytes)
    for _ in range(1 << cost):
        _expand(P, S, key, None)
        _expand(P, S, salt_bytes, None)
    S0, S1, S2, S3 = S
    words = [int.from_bytes(_MAGIC[i : i + 4], "big") for i in range(0, 24, 4)]
    for i in range(0, 6, 2):
        left, right = words[i], words[i + 1]
        for _ in range(64):
            left, right = _encrypt(P, S0, S1, S2, S3, left, right)
        words[i], words[i + 1] = left, right
    ct = b"".join(w.to_bytes(4, "big") for w in words)[:23]
    return f"$2a${cost:02d}${parts[3][:22]}" + _b64_encode(ct, 31)


def checkpw(password: str, stored: str) -> bool:
    """Constant-shape verify: re-hash with the stored hash's own salt
    prefix and compare (how the server side validates a credential when
    it holds the hash)."""
    return hashpw(password, stored[:29]) == stored
