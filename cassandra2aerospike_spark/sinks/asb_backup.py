"""Aerospike backup-file (.asb) text-format SINK + SOURCE.

Implements the PUBLIC backup file format written/read by the asbackup /
asrestore tools (aerospike/aerospike-tools-backup on GitHub,
docs/BACKUP_FILE_FORMAT.md): a version header, ``#`` meta lines, then
one block per record —

    Version 3.1
    # namespace <ns>
    # first-file                     (exactly one file in the backup)
    + k S <len> <key>                (string user key)
    + n <namespace>
    + d <base64 RIPEMD-160 digest>
    + s <set>
    + g <generation>
    + t <expiration>                 (seconds since the citrusleaf epoch
                                      2010-01-01T00:00:00Z; 0 = never)
    + b <bin count>
    - S <name> <len> <value>         (one line per string bin)

The reference ships records to Aerospike over the wire only
(AerospikeWriter.cpp:216-256); .asb files are the ecosystem's at-rest
interchange for the exact same records, so the engine treats the format
as a first-class sink (distributed text write — each partition becomes
one .asb file, record blocks are single multi-line text rows so
contiguity is free) and source (one task per file through Spark's
binaryFile reader — the natural layout, since asbackup itself emits a
bounded-size file series).

Scale shape: the writer is ``mapInPandas -> df.write.text`` — no
driver-side iteration, no collect; the reader parses each file inside
an Arrow batch and re-verifies every record's RIPEMD-160 digest against
the (set, key) it carries, so a framing or encoding bug anywhere in the
write path fails loudly at read time instead of producing silently
wrong records.
"""

from __future__ import annotations

import base64

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .aerospike_wire import key_digest

# 2010-01-01T00:00:00Z — Aerospike's on-disk expiration epoch
CITRUS_EPOCH_S = 1_262_304_000
ASB_VERSION_LINE = "Version 3.1"


def record_block(
    namespace: str,
    set_name: str,
    key_str: str,
    bins: list[tuple[str, str]],
    gen: int,
    exp_citrus: int,
) -> str:
    """One .asb record block (multi-line string, no trailing newline)."""
    digest = base64.b64encode(key_digest(set_name, key_str.encode())).decode()
    lines = [
        f"+ k S {len(key_str)} {key_str}",
        f"+ n {namespace}",
        f"+ d {digest}",
        f"+ s {set_name}",
        f"+ g {gen}",
        f"+ t {exp_citrus}",
        f"+ b {len(bins)}",
    ]
    for name, value in bins:
        lines.append(f"- S {name} {len(value)} {value}")
    return "\n".join(lines)


def write_asb(
    records: DataFrame,
    out_dir: str,
    namespace: str,
    set_name: str,
    eternal: int,
    n_files: int = 4,
) -> None:
    """Distributed .asb write: ``n_files`` partitions, each emitting one
    text file whose first rows are the header block (partition 0 also
    carries ``# first-file``, emitted even when its partition is empty
    so the exactly-once marker never depends on row routing).  Expects
    the merge-record shape (key long, columns map<string,double>,
    expiry long); bins are rendered with the engine-wide '%.2f'
    convention."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def emit(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        header = [ASB_VERSION_LINE, f"# namespace {namespace}"]
        if pid == 0:
            header.append("# first-file")
        pending_header = "\n".join(header)
        for pdf in batches:
            blocks = []
            if pending_header is not None:
                blocks.append(pending_header)
                pending_header = None
            for key, cols, expiry in zip(
                pdf["key"], pdf["columns"], pdf["expiry"]
            ):
                # Arrow hands MapType to pandas as a list of (k, v)
                # pairs; plain dicts appear on the non-Arrow path
                items = cols.items() if isinstance(cols, dict) else cols
                bins = sorted(
                    ((n, "%.2f" % v) for n, v in items),
                    key=lambda p: f"{p[0]}={p[1]}",
                )
                if int(expiry) == eternal:
                    exp_citrus = 0
                else:
                    exp_citrus = int(expiry) - CITRUS_EPOCH_S
                    # '+ t 0' is the format's ETERNAL sentinel and
                    # negative values are unrepresentable pre-epoch
                    # times: a real expiry at/before 2010-01-01 would
                    # round-trip back as never-expire (or corrupt), so
                    # fail loudly instead of silently colliding
                    if exp_citrus <= 0:
                        raise ValueError(
                            f"non-eternal expiry {int(expiry)} is <= the "
                            f"citrusleaf epoch {CITRUS_EPOCH_S}; '+ t "
                            f"{exp_citrus}' would collide with the "
                            "eternal sentinel / encode a pre-2010 time"
                        )
                blocks.append(
                    record_block(namespace, set_name, str(key), bins, 1, exp_citrus)
                )
            if blocks:
                yield pd.DataFrame({"value": blocks})
        if pending_header is not None:
            yield pd.DataFrame({"value": [pending_header]})

    (
        records.repartition(n_files)
        .mapInPandas(emit, "value string")
        .write.mode("overwrite")
        .text(out_dir)
    )


def digest_record_block(
    namespace: str,
    set_name: str,
    digest_b64: str,
    bins: list[tuple[str, str]],
    gen: int,
    exp_citrus: int,
) -> str:
    """One KEYLESS .asb record block: the format's ``+ k`` line is
    optional (a record whose user key was never stored backs up as
    digest-only, and asrestore routes it purely by digest) — the shape
    a cluster SCAN produces, since scans return digests, not keys."""
    lines = [
        f"+ n {namespace}",
        f"+ d {digest_b64}",
        f"+ s {set_name}",
        f"+ g {gen}",
        f"+ t {exp_citrus}",
        f"+ b {len(bins)}",
    ]
    for name, value in bins:
        lines.append(f"- S {name} {len(value)} {value}")
    return "\n".join(lines)


def _parse_asb_file(content: str, namespace: str, set_name: str):
    """Parse one .asb file -> (first_file: bool, rows) with rows =
    (key_str | None, digest_b64, gen, exp_citrus, bins).  Raises on any
    grammar violation, foreign namespace/set, digest mismatch (keyed
    records only — keyless records ARE their digest), or bin miscount —
    the reader is the format's verifier."""
    # split strictly on \n — str.splitlines() also breaks on the
    # \x1c-\x1e and U+2028/U+2029 Unicode separators, which are legal
    # INSIDE a length-prefixed bin value
    lines = content.split("\n")
    while lines and lines[-1] == "":
        lines.pop()
    if not lines or lines[0] != ASB_VERSION_LINE:
        raise ValueError(f"asb: bad version line {lines[:1]!r}")
    if len(lines) < 2 or lines[1] != f"# namespace {namespace}":
        raise ValueError(f"asb: bad namespace line {lines[1:2]!r}")
    i = 2
    first_file = i < len(lines) and lines[i] == "# first-file"
    if first_file:
        i += 1
    rows = []
    while i < len(lines):
        key_str = None
        if lines[i].startswith("+ k "):  # the optional user-key line
            parts = lines[i].split(" ", 4)
            if parts[:3] != ["+", "k", "S"]:
                raise ValueError(f"asb: expected key line, got {lines[i]!r}")
            key_str = parts[4] if len(parts) > 4 else ""
            if int(parts[3]) != len(key_str):
                raise ValueError(f"asb: key length mismatch in {lines[i]!r}")
            i += 1
        if lines[i] != f"+ n {namespace}":
            raise ValueError(f"asb: foreign namespace {lines[i]!r}")
        digest_b64 = lines[i + 1].removeprefix("+ d ")
        if key_str is not None:
            want = base64.b64encode(
                key_digest(set_name, key_str.encode())
            ).decode()
            if digest_b64 != want:
                raise ValueError(f"asb: digest mismatch for key {key_str!r}")
        elif len(base64.b64decode(digest_b64)) != 20:
            raise ValueError(f"asb: malformed digest {digest_b64!r}")
        if lines[i + 2] != f"+ s {set_name}":
            raise ValueError(f"asb: foreign set {lines[i + 2]!r}")
        gen = int(lines[i + 3].removeprefix("+ g "))
        exp_citrus = int(lines[i + 4].removeprefix("+ t "))
        n_bins = int(lines[i + 5].removeprefix("+ b "))
        i += 6
        bins = []
        for _ in range(n_bins):
            bparts = lines[i].split(" ", 4)
            if bparts[:2] != ["-", "S"]:
                raise ValueError(f"asb: expected bin line, got {lines[i]!r}")
            name, blen, value = bparts[2], int(bparts[3]), (
                bparts[4] if len(bparts) > 4 else ""
            )
            if blen != len(value):
                raise ValueError(f"asb: bin length mismatch in {lines[i]!r}")
            bins.append((name, value))
            i += 1
        rows.append((key_str, digest_b64, gen, exp_citrus, bins))
    return first_file, rows


def read_asb(
    spark: SparkSession,
    asb_dir: str,
    namespace: str,
    set_name: str,
    eternal: int,
) -> DataFrame:
    """Distributed .asb source: one task per file via binaryFile, full
    grammar + digest verification per record.  Returns (key long,
    cols_str string, expiry long, gen int, first_file boolean) — expiry
    reconstructed to the engine's unix-seconds domain (0 -> ETERNAL)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .load(asb_dir)
        .select("path", "content")
    )

    def parse(batches):
        for pdf in batches:
            out = {"key": [], "cols_str": [], "expiry": [], "gen": [], "first_file": []}
            for content in pdf["content"]:
                first, rows = _parse_asb_file(
                    bytes(content).decode(), namespace, set_name
                )
                for key_str, _digest, gen, exp_citrus, bins in rows:
                    if key_str is None:
                        raise ValueError(
                            "asb: keyless record in a keyed backup read"
                        )
                    out["key"].append(int(key_str))
                    out["cols_str"].append(
                        ",".join(
                            sorted(f"{n}={v}" for n, v in bins)
                        )
                    )
                    out["expiry"].append(
                        eternal if exp_citrus == 0 else exp_citrus + CITRUS_EPOCH_S
                    )
                    out["gen"].append(gen)
                    out["first_file"].append(first)
            yield pd.DataFrame(out)

    return files.mapInPandas(
        parse, "key long, cols_str string, expiry long, gen int, first_file boolean"
    )


def write_asb_scan(
    scanned: DataFrame,
    out_dir: str,
    namespace: str,
    set_name: str,
    now_epoch_s: int,
    n_files: int = 4,
) -> None:
    """Distributed .asb write of a cluster-SCAN stream — the real
    asbackup job shape: the input is (digest_hex, cols_str, ttl)
    straight off the wire (scans return digests, never user keys), so
    the records are emitted as KEYLESS digest-addressed blocks.  The
    stored ttl (0xFFFFFFFF = never, else seconds remaining relative to
    the engine's fixed now) converts to the format's absolute
    citrusleaf-epoch expiration (0 = never)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def emit(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        header = [ASB_VERSION_LINE, f"# namespace {namespace}"]
        if pid == 0:
            header.append("# first-file")
        pending_header = "\n".join(header)
        for pdf in batches:
            blocks = []
            if pending_header is not None:
                blocks.append(pending_header)
                pending_header = None
            for digest_hex, cols_str, ttl in zip(
                pdf["digest_hex"], pdf["cols_str"], pdf["ttl"]
            ):
                digest_b64 = base64.b64encode(bytes.fromhex(digest_hex)).decode()
                bins = []
                if cols_str:
                    for kv in cols_str.split(","):
                        name, _, value = kv.partition("=")
                        bins.append((name, value))
                if int(ttl) == 0xFFFFFFFF:
                    exp_citrus = 0
                else:
                    exp_citrus = now_epoch_s + int(ttl) - CITRUS_EPOCH_S
                    if exp_citrus <= 0:
                        raise ValueError(
                            f"asb scan write: expiration {exp_citrus} at/"
                            "before the citrusleaf epoch collides with the "
                            "eternal sentinel"
                        )
                blocks.append(
                    digest_record_block(
                        namespace, set_name, digest_b64, bins, 1, exp_citrus
                    )
                )
            if blocks:
                yield pd.DataFrame({"value": blocks})
        if pending_header is not None:
            yield pd.DataFrame({"value": [pending_header]})

    (
        scanned.repartition(n_files)
        .mapInPandas(emit, "value string")
        .write.mode("overwrite")
        .text(out_dir)
    )


def read_asb_scan(
    spark: SparkSession,
    asb_dir: str,
    namespace: str,
    set_name: str,
    now_epoch_s: int,
) -> DataFrame:
    """Distributed source for a digest-addressed .asb backup: one task
    per file, grammar-verified, yielding (digest_hex, cols_str, ttl,
    first_file) — the shape asrestore needs to put records back by
    digest (ttl reconstructed relative to the engine's fixed now, the
    way asrestore computes TTLs relative to restore time)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .load(asb_dir)
        .select("path", "content")
    )

    def parse(batches):
        for pdf in batches:
            out = {"digest_hex": [], "cols_str": [], "ttl": [], "first_file": []}
            for content in pdf["content"]:
                first, rows = _parse_asb_file(
                    bytes(content).decode(), namespace, set_name
                )
                for key_str, digest_b64, _gen, exp_citrus, bins in rows:
                    if key_str is not None:
                        raise ValueError(
                            "asb: keyed record in a digest-addressed read"
                        )
                    out["digest_hex"].append(
                        base64.b64decode(digest_b64).hex()
                    )
                    out["cols_str"].append(
                        ",".join(sorted(f"{n}={v}" for n, v in bins))
                    )
                    out["ttl"].append(
                        0xFFFFFFFF
                        if exp_citrus == 0
                        else exp_citrus + CITRUS_EPOCH_S - now_epoch_s
                    )
                    out["first_file"].append(first)
            yield pd.DataFrame(out)

    return files.mapInPandas(
        parse, "digest_hex string, cols_str string, ttl long, first_file boolean"
    )
