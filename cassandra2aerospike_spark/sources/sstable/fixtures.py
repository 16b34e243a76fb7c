"""Bridge between the parquet fixtures and the SSTable-run format: write
the events cell stream as N sorted runs, read it back as the classified
EAV frame the merge operators consume.

This closes the loop on SURVEY.md §7 Phase 6: the reference's actual
input (multi-run SSTables with versions of the same key spread across
runs) is materialized in our run format, and `merge over sstable source`
must equal `merge over parquet` — the strongest parity statement the
fixtures allow.

Run assignment: ts % n_runs, so most keys have cells in several
runs (the k-way merge shape of CassandraParser.cpp:219-281).  Values are
stored as repr(float) bytes: byte-opaque in the format (README.md:39 "all
columns are written ... as binary blobs") yet exactly recoverable with
cast(string as double) in any engine.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ...operators.merge import classify_cells
from ..tables import load_table
from .datasource import register
from .format import Cell, Partition, RunWriter


def staged_dir(final_dir: str, build) -> str:
    """Atomic-publish discipline for every keyed on-disk fixture cache
    (the r07-verdict race fix, generalizing functions/dedup.stage_parquet's
    local-path branch to arbitrary directory builders): `build(tmp_dir)`
    writes the fixture into a UNIQUE sibling temp directory, a `_DONE`
    marker is stamped inside it, and one os.rename publishes the whole
    tree under `final_dir`.  Two concurrent sessions sharing a cache key
    (pytest-xdist, driver + local bench) can no longer interleave writes
    or scan a half-written directory: the first rename wins; losers
    discard their temp tree and await the winner's marker.  The caller
    owns cache-key freshness via the directory name (fixture fingerprint
    + FIXTURE_ENCODER_REV, see default_runs_dir)."""
    import shutil
    import time
    import uuid

    marker = os.path.join(final_dir, "_DONE")
    if os.path.exists(marker):
        return final_dir
    parent = os.path.dirname(os.path.abspath(final_dir))
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(
        parent, f".{os.path.basename(final_dir)}.tmp-{uuid.uuid4().hex[:12]}"
    )
    os.makedirs(tmp)
    try:
        build(tmp)
        open(os.path.join(tmp, "_DONE"), "w").write("ok")
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, final_dir)  # atomic publish; fails if a winner exists
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        deadline = time.time() + 300
        while not os.path.exists(marker):  # winner mid-write: await marker
            if time.time() > deadline:
                raise TimeoutError(
                    f"staged_dir: {final_dir} exists without _DONE after "
                    "300s (crashed writer?); remove it to retry"
                )
            time.sleep(0.1)
    return final_dir


def build_runs_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str, n_runs: int = 3,
    old_format_runs: int = 0, codecs: tuple[str, ...] = ("deflate",),
    composite_old_names: bool = False, amplify: int = 1,
) -> str:
    """Materialize events as n_runs sorted runs under out_dir (idempotent:
    a _DONE marker skips rebuild).  Driver-side build — this is fixture
    authoring, not a query path; the scale path for writing runs would be
    a DataSourceWriter.

    `old_format_runs`: the first N generations are written in old formats
    (embedded names, absolute timestamps) — generation 1 as SGRA (ancient:
    decompressed-side CRC32 verified after decompression), later old
    generations as SGR0 (Adler32 before decompression) — a
    mixed-generation directory, the exact situation the reference's
    version dispatch handles (one table, files from different Cassandra
    eras, SSTable.cpp:45-55, checksum discipline SSTable.cpp:102-105).

    `codecs`: per-generation chunk codec, cycled (deflate / snappy / lz4 / none).

    `composite_old_names`: old-format runs wrap each cell name in a
    composite path (2-byte-BE-length components); the reader must unwrap
    to the final component (SSTable.cpp:399-412) for the merge to agree
    with the flat-name oracle.

    `amplify`: replicate the event stream N× with distinct keys — for
    throughput probes that need runs big enough to amortize fixed task
    cost (no oracle reads an amplified directory)."""
    # every parameterization owns its own LEAF directory: two callers with
    # different codec/format params previously shared one directory, where
    # accumulated _DONE markers let a later build silently clobber an
    # earlier caller's fixture while its marker still matched
    from .format import MAGIC as _MAGIC

    # the leaf name embeds the run-format magic too: a format bump must
    # invalidate /tmp fixtures written by an older encoder, not feed the
    # reader stale bytes under a still-matching marker
    fingerprint = "-".join(codecs) + ("_comp" if composite_old_names else "")
    if amplify > 1:
        fingerprint += f"_x{amplify}"
    out_dir = os.path.join(
        out_dir,
        f"v{_MAGIC.decode()}_{n_runs}_{old_format_runs}_{fingerprint}",
    )
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    if amplify > 1:
        events = (
            events.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1)))
            )
            .withColumn("user_id", F.col("user_id") + F.col("rep") * 100_000)
            .withColumn("ts_us", F.col("ts_us") + F.col("rep"))
            .drop("rep")
        )
    rows = (
        classify_cells(events)
        .withColumn("run", (F.col("ts") % n_runs).cast("int"))
        .select("run", "key", "col_name", "value", "ts", "ttl", "expiration", "kind")
        .collect()
    )
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(n_runs)}
    for r in rows:
        key = str(r.key).encode("utf-8")
        parts = by_run[r.run]
        p = parts.get(key)
        if p is None:
            p = parts[key] = Partition(key=key)
        if r.kind == "row":
            p.row_tomb_ts = max(p.row_tomb_ts or r.ts, r.ts)
        elif r.kind == "range":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, range_tomb=True))
        elif r.kind == "point":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, deleted=True))
        else:
            p.cells.append(
                Cell(
                    col_name=r.col_name,
                    value=repr(float(r.value)).encode("utf-8"),
                    ts=r.ts,
                    ttl=r.ttl,
                    expiration=r.expiration,
                )
            )
    from .format import MAGIC, MAGIC_V0, MAGIC_VA

    for gen, parts in by_run.items():
        if gen < old_format_runs:
            fmt = MAGIC_VA if gen == 0 else MAGIC_V0
        else:
            fmt = MAGIC
        old = fmt != MAGIC
        w = RunWriter(
            out_dir,
            gen + 1,
            fmt=fmt,
            codec=codecs[gen % len(codecs)],
            composite_path=("tmx", "cols") if (old and composite_old_names) else (),
        )
        for p in sorted(parts.values(), key=lambda p: (p.token, p.key)):
            p.cells.sort(key=lambda c: (c.col_name, c.ts))
            w.add(p)
        w.finish()
    open(marker, "w").write("ok")
    return out_dir


def build_ma_table_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str, n_sstables: int = 3,
    codec_classes: tuple[str, ...] = (
        "LZ4Compressor", "SnappyCompressor", "DeflateCompressor",
    ),
    amplify: int = 1,
) -> str:
    """Materialize events as a REAL-format Cassandra 3.x table directory
    (<out>/<fingerprint>/tmx/events/ma-<gen>-big-*.db) — the ma analog of
    build_runs_from_events, feeding the MaReader end-to-end driver check.

    Kind mapping vs the SGR fixtures: 'row' events stay row tombstones
    (style cycling per key across partition-header / HAS_DELETION /
    marker encodings); 'range' events become ma MARKERS — an open
    marker with no clustering covers the whole partition, so in the ma
    pipeline they act as row tombstones (the oracle maps them to 'row').
    """
    from .ma_format import FIXTURE_ENCODER_REV, MaWriter

    # leaf name embeds the encoder revision: an encoding change must
    # invalidate /tmp fixtures, not feed stale bytes under a matching
    # marker (same discipline as the SGR MAGIC-in-leaf-name rule above)
    fingerprint = "ma" + FIXTURE_ENCODER_REV + "_" + str(n_sstables) + "_" + "-".join(
        c.removesuffix("Compressor").lower() for c in codec_classes
    )
    if amplify > 1:
        fingerprint += f"_x{amplify}"
    table_dir = os.path.join(out_dir, fingerprint, "tmx", "events")
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    os.makedirs(table_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    if amplify > 1:
        # replicate with distinct keys for throughput probes (mirrors
        # build_runs_from_events; no oracle reads an amplified table)
        events = (
            events.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1)))
            )
            .withColumn("user_id", F.col("user_id") + F.col("rep") * 100_000)
            .withColumn("ts_us", F.col("ts_us") + F.col("rep"))
            .drop("rep")
        )
    rows = (
        classify_cells(events)
        .withColumn("run", (F.col("ts") % n_sstables).cast("int"))
        .select("run", "key", "col_name", "value", "ts", "ttl", "expiration", "kind")
        .collect()
    )
    col_names = sorted({r.col_name for r in rows if r.kind == "cell"})
    schema_cols = [(n, "UTF8Type") for n in col_names]
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(n_sstables)}
    tomb_style: dict[bytes, str] = {}
    styles = ("partition", "row", "marker")
    for r in rows:
        key = str(r.key).encode("utf-8")
        parts = by_run[r.run]
        p = parts.get(key)
        if p is None:
            p = parts[key] = Partition(key=key)
            tomb_style.setdefault(key, styles[len(tomb_style) % len(styles)])
        if r.kind in ("row", "range"):
            p.row_tomb_ts = max(p.row_tomb_ts or r.ts, r.ts)
        elif r.kind == "point":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, deleted=True))
        else:
            p.cells.append(
                Cell(
                    col_name=r.col_name,
                    value=repr(float(r.value)).encode("utf-8"),
                    ts=r.ts,
                    ttl=r.ttl,
                    expiration=r.expiration,
                )
            )
    for gen, parts in by_run.items():
        w = MaWriter(
            table_dir, gen + 1, schema_cols,
            codec_class=codec_classes[gen % len(codec_classes)],
        )
        for key in sorted(parts):
            p = parts[key]
            p.cells.sort(key=lambda c: (c.col_name, c.ts))
            w.add(p, row_tomb_style=tomb_style[key])
        w.finish()
    open(marker, "w").write("ok")
    return table_dir


def build_ma_schema_evolution_table_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> str:
    """Events as a SCHEMA-EVOLVED ma table: generation 1's serialization
    header lists the OLD column set (the lexicographically-last column
    did not exist yet — the pre-ALTER flush), generation 2's the full
    set.  Cell routing: every cell of the new column -> gen 2; other
    cells -> gen 1 unless ts % 3 == 0 (those land in gen 2 too, so
    partitions overlap and the merge LWWs across files with DIFFERENT
    headers).  Tombstones split by ts % 2.  The split is a pure
    partition of build_ma_table_from_events' derived cell multiset with
    the same kind mapping (row/range -> partition tombstone, point ->
    deleted cell), so the merged result equals s15's oracle (_CTE_MA)."""
    from .ma_format import FIXTURE_ENCODER_REV, MaWriter

    fingerprint = "maevo" + FIXTURE_ENCODER_REV
    table_dir = os.path.join(out_dir, fingerprint, "tmx", "events")
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    os.makedirs(table_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    rows = (
        classify_cells(events)
        .select("key", "col_name", "value", "ts", "ttl", "expiration", "kind")
        .collect()
    )
    col_names = sorted({r.col_name for r in rows if r.kind == "cell"})
    new_col = col_names[-1]
    old_schema = [(n, "UTF8Type") for n in col_names if n != new_col]
    full_schema = [(n, "UTF8Type") for n in col_names]
    by_run: dict[int, dict[bytes, Partition]] = {0: {}, 1: {}}
    for r in rows:
        if r.kind == "cell":
            run = 1 if (r.col_name == new_col or r.ts % 3 == 0) else 0
        elif r.kind == "point":
            # a point tombstone NAMES its column: anything touching the
            # new column can only exist in the post-ALTER generation
            run = 1 if r.col_name == new_col else int(r.ts % 2)
        else:
            run = int(r.ts % 2)
        key = str(r.key).encode("utf-8")
        p = by_run[run].setdefault(key, Partition(key=key))
        if r.kind in ("row", "range"):
            p.row_tomb_ts = max(p.row_tomb_ts or r.ts, r.ts)
        elif r.kind == "point":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, deleted=True))
        else:
            p.cells.append(
                Cell(
                    col_name=r.col_name,
                    value=repr(float(r.value)).encode("utf-8"),
                    ts=r.ts,
                    ttl=r.ttl,
                    expiration=r.expiration,
                )
            )
    for gen, schema in ((0, old_schema), (1, full_schema)):
        w = MaWriter(table_dir, gen + 1, schema)
        for key in sorted(by_run[gen]):
            p = by_run[gen][key]
            p.cells.sort(key=lambda c: (c.col_name, c.ts))
            w.add(p)
        w.finish()
    open(marker, "w").write("ok")
    return table_dir


def build_ma_docs_table(spark: SparkSession, sf_dir: str, out_dir: str | None = None) -> str:
    """The documents corpus as a REAL ma table requiring cross-run LWW:
    generation 1 holds a STALE version of every text (text + ' OLDSTALE',
    ts=1), generation 2 the current text (ts=2), and every doc_id % 97
    == 0 partition additionally carries a row tombstone at ts=3 in gen 2
    — so reading the table correctly requires run merging, last-write-
    wins AND tombstone cover on actual Cassandra bytes.  A merge bug is
    visible as ' OLDSTALE' tokens (or resurrected deleted docs) in every
    downstream corpus-prep stage."""
    from .ma_format import FIXTURE_ENCODER_REV, MaWriter

    if out_dir is None:  # ONE derivation, shared by the query and bench
        out_dir = default_runs_dir(sf_dir) + "_madocs"
    # cache key folds in the source parquet's (abspath, mtime, size): a
    # regenerated fixture at the same path, or two sf dirs sharing a
    # basename, cannot serve a stale staged ma table against a fresh
    # oracle (mirrors the q_src_formats_roundtrip cache key).
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    src_key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    fingerprint = "madocs" + FIXTURE_ENCODER_REV + "_" + src_key
    table_dir = os.path.join(out_dir, fingerprint, "tmx", "documents")
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    os.makedirs(table_dir, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    schema_cols = [("text", "UTF8Type")]
    for gen, (ts, suffix) in ((1, (1, " OLDSTALE")), (2, (2, ""))):
        w = MaWriter(table_dir, gen, schema_cols)
        for r in docs:
            p = Partition(
                key=str(int(r.doc_id)).encode("utf-8"),
                cells=[Cell(col_name="text", value=(r.text + suffix).encode("utf-8"), ts=ts)],
            )
            if gen == 2 and int(r.doc_id) % 97 == 0:
                p.row_tomb_ts = 3
            w.add(p)
        w.finish()
    open(marker, "w").write("ok")
    return table_dir


def build_mixed_era_table_from_events(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    new_era_versions: tuple[str, ...] = ("ma",),
) -> str:
    """Materialize events as a REAL mixed-era Cassandra table directory —
    the post-upgrade state the reference's version dispatch exists for
    (SSTable.cpp:45-55): one directory holding a ka sstable (old flat
    naming tmx-events-ka-1-*, composite cell names exercising the real
    S8 unwrap), an la sstable (la-2-big-*), and an ma sstable
    (ma-3-big-*), each under a different chunk codec.

    Kind mapping: events route to eras by ts % 3 (0 -> ka, 1 -> la,
    2 -> ma).  'range' events landing in the OLD eras are written as
    real old-format range-tombstone cells (name-bounded, kind stays
    'range'); the one landing in the ma era becomes a marker, i.e. a row
    tombstone — the oracle mirrors exactly this split (_CTE_MIXED).

    `new_era_versions` names the >= ma era's on-disk version token(s):
    ("ma",) is the 3.0 default; ("mc", "md") stages the SAME cells as a
    Cassandra 3.11 post-upgrade directory — run-2 partitions split by
    key hash across an mc- and an md-prefixed sstable (disjoint key
    halves, identical merged result), the uniform >= MA dispatch of
    SSTable.cpp:45-55."""
    from .ma_format import FIXTURE_ENCODER_REV, MaWriter
    from .old_format import OldWriter

    tag = "-".join(("ka", "la") + new_era_versions)
    table_dir = os.path.join(
        out_dir, "mixed" + FIXTURE_ENCODER_REV + "_" + tag, "tmx", "events"
    )
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    os.makedirs(table_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    rows = (
        classify_cells(events)
        .withColumn("run", (F.col("ts") % 3).cast("int"))
        .select("run", "key", "col_name", "value", "ts", "ttl", "expiration", "kind")
        .collect()
    )
    col_names = sorted({r.col_name for r in rows if r.kind == "cell"})
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(3)}
    for r in rows:
        key = str(r.key).encode("utf-8")
        parts = by_run[r.run]
        p = parts.get(key)
        if p is None:
            p = parts[key] = Partition(key=key)
        if r.kind == "row" or (r.kind == "range" and r.run == 2):
            # ma markers cover the whole partition -> row tombstone
            p.row_tomb_ts = max(p.row_tomb_ts or r.ts, r.ts)
        elif r.kind == "range":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, range_tomb=True))
        elif r.kind == "point":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, deleted=True))
        else:
            p.cells.append(
                Cell(
                    col_name=r.col_name,
                    value=repr(float(r.value)).encode("utf-8"),
                    ts=r.ts,
                    ttl=r.ttl,
                    expiration=r.expiration,
                )
            )
    old_writers = [
        OldWriter(
            table_dir, 1, version="ka", codec_class="SnappyCompressor",
            composite_path=("tmx", "cols"),
        ),
        OldWriter(table_dir, 2, version="la", codec_class="DeflateCompressor"),
    ]
    for run, w in enumerate(old_writers):
        for key in sorted(by_run[run]):
            p = by_run[run][key]
            p.cells.sort(key=lambda c: (c.col_name, c.ts))
            w.add(p)
        w.finish()
    # run 2 (>= ma era): one sstable per version token, partitions routed
    # by key hash — disjoint halves, so the k-way merge result is
    # invariant to how many files the era is split across.  The 4.x/5.0
    # generations (nb, oa) compress with ZstdCompressor — available in
    # real Cassandra from 4.0, and the codec the reference cannot read
    # at all (Buffer.cpp:243-272 stops at LZ4/Snappy/Deflate); s19 now
    # proves the auto-detect handles a zstd-chunked file in the mix
    new_writers = [
        MaWriter(
            table_dir, 3 + i, [(n, "UTF8Type") for n in col_names],
            codec_class=(
                "ZstdCompressor" if v >= "nb" else "LZ4Compressor"
            ),
            version=v,
        )
        for i, v in enumerate(new_era_versions)
    ]
    nv = len(new_writers)
    for key in sorted(by_run[2]):
        p = by_run[2][key]
        p.cells.sort(key=lambda c: (c.col_name, c.ts))
        slot = int(hashlib.md5(key).hexdigest(), 16) % nv
        new_writers[slot].add(p)
    for w in new_writers:
        w.finish()
    open(marker, "w").write("ok")
    return table_dir


def build_old_wide_table_from_events(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_sstables: int = 2,
    n_keys: int = 7,
    promoted_threshold: int = 512,
) -> str:
    """REAL 2.x (la) table with FEW, GIANT partitions — the shape the
    old-era promoted index exists for: events funnel onto `n_keys`
    partition keys (key = user_id % n_keys, mirrored by the oracle), so
    each partition's cell area far exceeds `promoted_threshold` and
    every Index.db entry carries the real promoted-index bytes (entry
    DeletionTime + IndexInfo firstName/lastName/offset/width per block
    — the grammar the reference reads the be32 size of and skips,
    SSTable.cpp:76-84).  Read with a small `wide_slice_bytes`, the
    planner fans each giant partition out as block-group
    InputPartitions, and the merged result must be IDENTICAL to the
    flat read — LWW versions, point tombstones, row tombstones (carried
    by the promoted entry's DeletionTime, never re-read from the
    partition header) and name-bounded range-tombstone cells all
    reconcile across block boundaries AND across the two generations
    (events route by ts % n_sstables, so (key, col) versions span
    files).  Derivation = classify_cells with the key fold (the s8/s9
    oracle kinds: row %97, range %13, point %10, expiring cell %7)."""
    from .ma_format import FIXTURE_ENCODER_REV
    from .old_format import OldWriter

    table_dir = os.path.join(
        out_dir,
        "oldwide" + FIXTURE_ENCODER_REV
        + f"_{n_sstables}_{n_keys}_{promoted_threshold}",
        "tmx",
        "events",
    )
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    events = load_table(spark, sf_dir, "events")
    rows = (
        classify_cells(events)
        .withColumn("run", (F.col("ts") % n_sstables).cast("int"))
        .withColumn("key", F.col("key") % n_keys)
        .select("run", "key", "col_name", "value", "ts", "ttl", "expiration", "kind")
        .collect()
    )
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(n_sstables)}
    for r in rows:
        key = str(r.key).encode("utf-8")
        p = by_run[r.run].setdefault(key, Partition(key=key))
        if r.kind == "row":
            p.row_tomb_ts = max(p.row_tomb_ts or r.ts, r.ts)
        elif r.kind == "range":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, range_tomb=True))
        elif r.kind == "point":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, deleted=True))
        else:
            p.cells.append(
                Cell(
                    col_name=r.col_name,
                    value=repr(float(r.value)).encode("utf-8"),
                    ts=r.ts,
                    ttl=r.ttl,
                    expiration=r.expiration,
                )
            )

    def _build(tmp: str) -> None:
        for gen, parts in by_run.items():
            w = OldWriter(
                tmp,
                gen + 1,
                version="la",
                codec_class="LZ4Compressor" if gen % 2 == 0 else "DeflateCompressor",
                promoted_threshold=promoted_threshold,
            )  # giant partitions: every entry promotes at this threshold
            for key in sorted(parts):
                p = parts[key]
                p.cells.sort(key=lambda c: (c.col_name, c.ts))
                w.add(p)
            w.finish()

    return staged_dir(table_dir, _build)


def build_counter_table_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> str:
    """Materialize events as a REAL THREE-ERA COUNTER table: ka + la
    sstables whose cells carry COUNTER_MASK + counterTs
    (SSTable.cpp:433-437) plus a Cassandra 3.x ma sstable whose
    serialization header declares the columns CounterColumnType — in
    the 3.0 grammar a counter cell IS a regular cell whose value is the
    serialized context (no TTL fields, vint-length value; the flag-byte
    era markers disappeared with the uniform cell grammar), so the ma
    read path must type-dispatch on the header, not on a mask.  All
    VALUES are real serialized counter contexts (functions.counters
    layout); reconciliation spans all three files like the reference's
    k-way merge.  Derivation (mirrored by the a7 oracle): every
    'cell'-kind event is one shard update of counter column event_type
    — shard id = event_id % 5 (embedded in a 16-byte counter id),
    clock = ts, count = floor(value * 100); run = ts % 3."""
    from ...functions.counters import encode_counter_context
    from .ma_format import FIXTURE_ENCODER_REV, MaWriter
    from .old_format import OldWriter

    table_dir = os.path.join(out_dir, "ctr" + FIXTURE_ENCODER_REV, "tmx", "counters")
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    os.makedirs(table_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    rows = (
        events.filter((eid % 97 != 0) & (eid % 13 != 0) & (eid % 10 != 0))
        .select(
            (F.col("ts_us") % 3).cast("int").alias("run"),
            F.col("user_id").alias("key"),
            F.col("event_type").alias("col_name"),
            F.floor(F.col("value") * 100).cast("long").alias("cnt"),
            F.col("ts_us").alias("ts"),
            (eid % 5).alias("shard"),
        )
        .collect()
    )
    by_run: dict[int, dict[bytes, Partition]] = {0: {}, 1: {}, 2: {}}
    for r in rows:
        key = str(r.key).encode("utf-8")
        p = by_run[r.run].setdefault(key, Partition(key=key))
        if r.cnt is None:
            continue  # NULL event value: no shard update
        cid = struct_pack_counter_id(int(r.shard))
        p.cells.append(
            Cell(
                col_name=r.col_name,
                value=encode_counter_context([(cid, int(r.ts), int(r.cnt))]),
                ts=int(r.ts),
            )
        )
    counter_cols = sorted({r.col_name for r in rows})
    writers = [
        OldWriter(
            table_dir, 1, version="ka", codec_class="SnappyCompressor",
            table="counters", counter_cols=frozenset(counter_cols),
        ),
        OldWriter(
            table_dir, 2, version="la", codec_class="DeflateCompressor",
            table="counters", counter_cols=frozenset(counter_cols),
        ),
        MaWriter(
            table_dir, 3, [(c, "CounterColumnType") for c in counter_cols],
            codec_class="LZ4Compressor",
        ),
    ]
    for gen, w in enumerate(writers):
        for key in sorted(by_run[gen]):
            p = by_run[gen][key]
            p.cells.sort(key=lambda c: (c.col_name, c.ts))
            w.add(p)
        w.finish()
    open(marker, "w").write("ok")
    return table_dir


def struct_pack_counter_id(shard: int) -> bytes:
    """Deterministic 16-byte counter id for a small shard index (real
    ids are replica UUIDs; the fixture embeds the index in the low
    bytes)."""
    import struct as _s

    return _s.pack(">IIII", 0, 0, 0, shard)


def build_ma_clustered_table_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str, n_sstables: int = 2
) -> str:
    """Materialize events as a REAL CLUSTERED Cassandra 3.x table: one
    clustering column (UTF8Type, the event's day bucket) — rows inside a
    partition are (day, columns) in clustering order, the layout the
    reference can only skip over and knowingly merges wrongly (reference
    README.md:30-36).  Kind mapping: 'cell' events are regular cells in
    their day's row, 'point' events deleted cells there; row/range
    events are omitted (ck-scoped deletions are out of the writer's
    scope, and partition-level tombstones would erase the clustering
    structure this fixture exists to exercise)."""
    from .ma_format import FIXTURE_ENCODER_REV, MaWriter

    table_dir = os.path.join(
        out_dir, "ckst" + FIXTURE_ENCODER_REV + f"_{n_sstables}", "tmx", "events_ck"
    )
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    os.makedirs(table_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    rows = (
        classify_cells(events)
        .withColumn("run", (F.col("ts") % n_sstables).cast("int"))
        .withColumn("ck", F.expr("ts div 86400000000").cast("string"))
        .select("run", "key", "ck", "col_name", "value", "ts", "ttl", "expiration", "kind")
        .collect()
    )
    # 'signup' is the table's STATIC column (per Cassandra semantics
    # partition-resident; the s10 modeling choice, now on real bytes);
    # every other event type is a regular column in its day's row
    col_names = sorted(
        {r.col_name for r in rows if r.kind == "cell" and r.col_name != "signup"}
    )
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(n_sstables)}
    for r in rows:
        if r.kind not in ("cell", "point"):
            continue
        key = str(r.key).encode("utf-8")
        parts = by_run[r.run]
        p = parts.get(key)
        if p is None:
            p = parts[key] = Partition(key=key)
        ck = None if r.col_name == "signup" else r.ck.encode()
        if r.kind == "point":
            p.cells.append(
                Cell(col_name=r.col_name, ts=r.ts, deleted=True, ck=ck)
            )
        else:
            p.cells.append(
                Cell(
                    col_name=r.col_name,
                    value=repr(float(r.value)).encode("utf-8"),
                    ts=r.ts,
                    ttl=r.ttl,
                    expiration=r.expiration,
                    ck=ck,
                )
            )
    for gen, parts in by_run.items():
        w = MaWriter(
            table_dir, gen + 1, [(n, "UTF8Type") for n in col_names],
            clustering=["UTF8Type"],
            static_columns=[("signup", "UTF8Type")],
            codec_class="LZ4Compressor" if gen % 2 == 0 else "DeflateCompressor",
        )
        for key in sorted(parts):
            p = parts[key]
            p.cells.sort(key=lambda c: (c.ck or b"", c.col_name, c.ts))
            w.add(p)
        w.finish()
    open(marker, "w").write("ok")
    return table_dir


def build_ma_rt_table_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str, n_sstables: int = 2
) -> str:
    """Clustered REAL ma table with REAL clustered tombstones — the
    markers/deletions the round-5 reader refused.  Derivation (mirrored
    exactly by the s18 oracle CTE):

      key = user_id; clustering ck = the event's day bucket (VARCHAR of
      epoch_us // 86400000000 — constant-width digits, so byte order ==
      numeric order); every event_type is a regular column.

      'cell'  -> regular cell in its day's row
      'point' -> deleted cell there (point tombstone)
      'row'   -> CLUSTERED-ROW deletion of its own day (HAS_DELETION on
                 the day's row when it exists in that sstable, else a
                 degenerate [day, day] marker pair)
      'range' -> ck RANGE tombstone over days [day - span, day] with
                 span = 1 + event_id % 3, start-inclusive iff
                 event_id % 2 = 0, end-inclusive iff event_id % 4 < 2 —
                 written as real markers (overlaps normalized to the
                 disjoint on-disk form; adjacencies become boundary
                 kinds), exercising every marker type the reader knows.
    """
    from .format import RangeTomb
    from .ma_format import FIXTURE_ENCODER_REV, MaWriter

    table_dir = os.path.join(
        out_dir, "rt" + FIXTURE_ENCODER_REV + f"_{n_sstables}", "tmx", "events_rt"
    )
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    os.makedirs(table_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    kind = (
        F.when(eid % 97 == 0, F.lit("row"))
        .when(eid % 13 == 0, F.lit("range"))
        .when(eid % 10 == 0, F.lit("point"))
        .otherwise(F.lit("cell"))
    )
    rows = events.select(
        (F.col("ts_us") % n_sstables).cast("int").alias("run"),
        F.col("user_id").alias("key"),
        F.expr("ts_us div 86400000000").alias("day"),
        F.col("event_type").alias("col_name"),
        "value",
        F.col("ts_us").alias("ts"),
        kind.alias("kind"),
        "event_id",
    ).collect()
    col_names = sorted({r.col_name for r in rows if r.kind == "cell"})
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(n_sstables)}
    for r in rows:
        key = str(r.key).encode("utf-8")
        parts = by_run[r.run]
        p = parts.get(key)
        if p is None:
            p = parts[key] = Partition(key=key)
        day = int(r.day)
        ck = str(day).encode()
        if r.kind == "row":
            p.ck_tombs.append((ck, r.ts))
        elif r.kind == "range":
            span = 1 + r.event_id % 3
            p.range_tombs.append(
                RangeTomb(
                    str(day - span).encode(),
                    r.event_id % 2 == 0,
                    ck,
                    r.event_id % 4 < 2,
                    r.ts,
                )
            )
        elif r.kind == "point":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, deleted=True, ck=ck))
        else:
            p.cells.append(
                Cell(
                    col_name=r.col_name,
                    value=repr(float(r.value)).encode("utf-8"),
                    ts=r.ts,
                    ck=ck,
                )
            )
    for gen, parts in by_run.items():
        w = MaWriter(
            table_dir,
            gen + 1,
            [(n, "UTF8Type") for n in col_names],
            clustering=["UTF8Type"],
            codec_class="LZ4Compressor" if gen % 2 == 0 else "SnappyCompressor",
        )
        for key in sorted(parts):
            p = parts[key]
            p.cells.sort(key=lambda c: (c.ck or b"", c.col_name, c.ts))
            w.add(p)
        w.finish()
    open(marker, "w").write("ok")
    return table_dir


def build_ma_multick_table_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str, n_sstables: int = 2
) -> str:
    """Clustered REAL ma table with TWO typed clustering columns —
    (Int32Type day_off, UTF8Type cat), day_off SIGNED with negative
    values planted — plus a STATIC column and static-row deletions.
    This is the round-7 capability fixture: encoded-prefix byte
    comparison misorders the negative days (0xFF.. sorts above 0x00..)
    and cannot express prefix bounds, so every cover decision here
    exercises the typed memcomparable comparator
    (ma_format.make_ck_key_fn).  Derivation (mirrored by the s22 oracle
    CTE):

      key = user_id; day_off = day - (min(day) + 2) over all events
      (negatives guaranteed); cat = chr(97 + event_id % 3); every
      non-'signup' event_type is a regular column; 'signup' is STATIC.

      kind cadence (disjoint by CASE order):
      'row'   (event_id % 97 = 0)  -> clustered-row deletion at the full
                                      (day_off, cat)
      'sdel'  (event_id % 89 = 0)  -> STATIC-row deletion at ts
      'range' (event_id % 13 = 0)  -> ck range tombstone over
               [day_off - span, day_off], span = 1 + event_id % 3:
               even event_id -> PREFIX bounds (day only, all cats;
               start-inclusive, end-inclusive iff event_id % 4 < 2);
               odd  -> FULL bounds ((d-span, cat) .. (d, cat)),
               start-incl iff event_id % 6 < 3, end-incl iff
               event_id % 4 < 2
      'point' (event_id % 10 = 0)  -> deleted cell (static when the
                                      column is 'signup')
      else                         -> regular/static cell
    """
    import struct

    from .format import RangeTomb
    from .ma_format import FIXTURE_ENCODER_REV, MaWriter

    table_dir = os.path.join(
        out_dir, "mck" + FIXTURE_ENCODER_REV + f"_{n_sstables}", "tmx", "events_mck"
    )
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    os.makedirs(table_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    kind = (
        F.when(eid % 97 == 0, F.lit("row"))
        .when(eid % 89 == 0, F.lit("sdel"))
        .when(eid % 13 == 0, F.lit("range"))
        .when(eid % 10 == 0, F.lit("point"))
        .otherwise(F.lit("cell"))
    )
    rows = events.select(
        (F.col("ts_us") % n_sstables).cast("int").alias("run"),
        F.col("user_id").alias("key"),
        F.expr("ts_us div 86400000000").alias("day"),
        F.col("event_type").alias("col_name"),
        "value",
        F.col("ts_us").alias("ts"),
        kind.alias("kind"),
        "event_id",
    ).collect()
    base = min(r.day for r in rows) + 2  # day_off in [-2, ...]
    i32 = lambda v: struct.pack(">i", int(v))  # noqa: E731
    col_names = sorted(
        {r.col_name for r in rows if r.kind == "cell" and r.col_name != "signup"}
    )
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(n_sstables)}
    for r in rows:
        key = str(r.key).encode("utf-8")
        parts = by_run[r.run]
        p = parts.get(key)
        if p is None:
            p = parts[key] = Partition(key=key)
        d = int(r.day - base)
        cat = chr(97 + r.event_id % 3).encode()
        ck = (i32(d), cat)
        if r.kind == "row":
            p.ck_tombs.append((ck, r.ts))
        elif r.kind == "sdel":
            p.static_tomb_ts = max(p.static_tomb_ts or r.ts, r.ts)
        elif r.kind == "range":
            span = 1 + r.event_id % 3
            if r.event_id % 2 == 0:  # prefix bounds: day only
                p.range_tombs.append(
                    RangeTomb(
                        (i32(d - span),), True, (i32(d),),
                        r.event_id % 4 < 2, r.ts,
                    )
                )
            else:  # full two-component bounds
                p.range_tombs.append(
                    RangeTomb(
                        (i32(d - span), cat), r.event_id % 6 < 3,
                        (i32(d), cat), r.event_id % 4 < 2, r.ts,
                    )
                )
        elif r.kind == "point":
            p.cells.append(
                Cell(
                    col_name=r.col_name, ts=r.ts, deleted=True,
                    ck=None if r.col_name == "signup" else ck,
                )
            )
        else:
            p.cells.append(
                Cell(
                    col_name=r.col_name,
                    value=repr(float(r.value)).encode("utf-8"),
                    ts=r.ts,
                    ck=None if r.col_name == "signup" else ck,
                )
            )
    for gen, parts in by_run.items():
        w = MaWriter(
            table_dir,
            gen + 1,
            [(n, "UTF8Type") for n in col_names],
            clustering=["Int32Type", "UTF8Type"],
            static_columns=[("signup", "UTF8Type")],
            codec_class="LZ4Compressor" if gen % 2 == 0 else "DeflateCompressor",
        )
        for key in sorted(parts):
            p = parts[key]
            p.cells.sort(
                key=lambda c: (b"".join(c.ck) if c.ck else b"", c.col_name, c.ts)
            )
            w.add(p)
        w.finish()
    open(marker, "w").write("ok")
    return table_dir


def build_ma_collection_table_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str, n_sstables: int = 2
) -> str:
    """REAL Cassandra 3.x table with COMPLEX (multi-cell collection)
    columns — map, set, AND list, beside a simple column — plus real
    complex-column deletions (the HAS_COMPLEX_DELETION grammar the
    reference declares at SSTable.hpp:120 but never reads; a table
    like this MISPARSES there).  Derivation (mirrored by the s24
    oracle):

      key = user_id.  Columns: metrics MapType(UTF8Type,UTF8Type)
      (path = event_type, value = repr(float)); tags SetType(UTF8Type)
      (path = event_type, empty value, on event_id % 3 = 0); log
      ListType(UTF8Type) (path = 16-byte BE event_id 'timeuuid',
      value = repr(float), on event_id % 7 = 0); last_score UTF8Type
      (simple, on event_id % 11 = 0).

      kind cadence: event_id % 97 = 0 -> complex deletion of metrics
      at ts; % 89 = 0 -> complex deletion of tags; % 10 = 0 -> DELETED
      metrics cell at its path (single map-entry removal); else the
      cell fan-out above.  Two sstables (ts % 2) so reconciliation
      spans files."""
    import struct

    from .ma_format import FIXTURE_ENCODER_REV, MaWriter

    table_dir = os.path.join(
        out_dir, "coll" + FIXTURE_ENCODER_REV + f"_{n_sstables}", "tmx", "events_coll"
    )
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    os.makedirs(table_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    kind = (
        F.when(eid % 97 == 0, F.lit("cxm"))
        .when(eid % 89 == 0, F.lit("cxt"))
        .when(eid % 10 == 0, F.lit("point"))
        .otherwise(F.lit("cell"))
    )
    rows = events.select(
        (F.col("ts_us") % n_sstables).cast("int").alias("run"),
        F.col("user_id").alias("key"),
        F.col("event_type").alias("et"),
        "value",
        F.col("ts_us").alias("ts"),
        kind.alias("kind"),
        "event_id",
    ).collect()
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(n_sstables)}
    for r in rows:
        key = str(r.key).encode("utf-8")
        p = by_run[r.run].setdefault(key, Partition(key=key))
        ts = int(r.ts)
        et = r.et.encode()
        if r.kind == "cxm":
            p.complex_tombs.append((None, "metrics", ts))
        elif r.kind == "cxt":
            p.complex_tombs.append((None, "tags", ts))
        elif r.kind == "point":
            p.cells.append(
                Cell(col_name="metrics", ts=ts, deleted=True, path=et)
            )
        else:
            val = repr(float(r.value)).encode()
            p.cells.append(Cell(col_name="metrics", value=val, ts=ts, path=et))
            if r.event_id % 3 == 0:
                p.cells.append(Cell(col_name="tags", ts=ts, path=et))
            if r.event_id % 7 == 0:
                p.cells.append(
                    Cell(
                        col_name="log", value=val, ts=ts,
                        path=struct.pack(">QQ", 0, int(r.event_id)),
                    )
                )
            if r.event_id % 11 == 0:
                p.cells.append(Cell(col_name="last_score", value=val, ts=ts))
    for gen, parts in by_run.items():
        w = MaWriter(
            table_dir,
            gen + 1,
            [
                ("last_score", "UTF8Type"),
                ("log", "ListType(UTF8Type)"),
                ("metrics", "MapType(UTF8Type,UTF8Type)"),
                ("tags", "SetType(UTF8Type)"),
            ],
            codec_class="LZ4Compressor" if gen % 2 == 0 else "SnappyCompressor",
        )
        for key in sorted(parts):
            p = parts[key]
            p.cells.sort(key=lambda c: (c.col_name, c.path or b"", c.ts))
            w.add(p)
        w.finish()
    open(marker, "w").write("ok")
    return table_dir


UDT_ADDR = (
    "UserType(tmx,61646472,"
    "63697479:UTF8Type,7a6970:Int32Type,6e6f7465:UTF8Type)"
)  # fields: city (0, text), zip (1, int32), note (2, text)
UDT_ADDR_V1 = (
    "UserType(tmx,61646472,63697479:UTF8Type,7a6970:Int32Type)"
)  # the PRE-`ALTER TYPE addr ADD note` shape: city (0), zip (1) only


def build_ma_udt_table_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str, n_sstables: int = 2
) -> str:
    """REAL Cassandra 3.x table with a NON-FROZEN USER-DEFINED TYPE
    column — multi-cell since Cassandra 3.6, the most common real 3.x
    schema shape the engine still misread before round 8 — beside a
    FROZEN UDT blob column and an (always-frozen) tuple column.  The
    non-frozen UDT encodes as the complex-cell block with FIELD-INDEX
    cell paths (2-byte BE shorts) and per-field typed values (text AND
    fixed-width int32, so the value-format dispatch is exercised); the
    frozen twins serialize as single blobs on the simple path.  The
    reference misparses the non-frozen column exactly as it misparses
    collections (SSTable.hpp:120 declares HAS_COMPLEX_DELETION, no read
    path).  Derivation (mirrored by the s25 oracle):

      key = user_id.  Columns: addr UDT_ADDR (non-frozen);
      faddr FrozenType(UDT_ADDR) (blob = event_type, on
      event_id % 11 = 0); pair TupleType(Int32Type,UTF8Type)
      (blob = repr(float(value)), on event_id % 13 = 0).

      kind cadence: event_id % 97 = 0 -> complex deletion of addr at
      ts (the whole-UDT overwrite's delete half); % 10 = 0 -> DELETED
      addr cell at field index (event_id // 10) % n_fields — the
      modulus rides the QUOTIENT so every field index actually occurs
      (event_id itself is = 0 mod 10 here, ADVICE r08); else the cell
      fan-out: addr.city = event_type, addr.zip = int32(event_id %
      89999 + 10000) (every cell event), addr.note =
      repr(float(value)) on event_id % 3 = 0 — note only in the
      POST-ALTER generation.

      UDT SCHEMA EVOLUTION across generations (VERDICT r08 task 7,
      the s21 playbook applied to UDTs): generation 1 (run 0) is
      PRE-`ALTER TYPE addr ADD note` — its Statistics.db header
      declares the 2-field UDT_ADDR_V1, it carries no note cells, and
      its point tombstones index fields mod 2; generation 2+ carry
      the 3-field UDT_ADDR with note cells and mod-3 point indexes.
      Each file must decode against its OWN header (udt_field_types
      is per-file) — decoding gen 1 against the 3-field type, or gen
      2 against the 2-field one, misparses or raises.  Two sstables
      (ts % 2) so reconciliation spans the ALTER boundary."""
    import struct

    from .ma_format import FIXTURE_ENCODER_REV, MaWriter

    table_dir = os.path.join(
        # "udtevo": cache identity bumped with the r09 derivation change
        # (schema evolution + quotient field indexes) — a cached pre-r09
        # "udt…" tree must not serve the new oracle
        out_dir, "udtevo" + FIXTURE_ENCODER_REV + f"_{n_sstables}", "tmx", "events_udt"
    )
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    kind = (
        F.when(eid % 97 == 0, F.lit("cxu"))
        .when(eid % 10 == 0, F.lit("point"))
        .otherwise(F.lit("cell"))
    )
    rows = events.select(
        (F.col("ts_us") % n_sstables).cast("int").alias("run"),
        F.col("user_id").alias("key"),
        F.col("event_type").alias("et"),
        "value",
        F.col("ts_us").alias("ts"),
        kind.alias("kind"),
        "event_id",
    ).collect()
    f16 = lambda i: struct.pack(">H", i)  # noqa: E731 — UDT field path
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(n_sstables)}
    for r in rows:
        key = str(r.key).encode("utf-8")
        p = by_run[r.run].setdefault(key, Partition(key=key))
        ts = int(r.ts)
        n_fields = 2 if r.run == 0 else 3  # pre- vs post-ALTER generation
        if r.kind == "cxu":
            p.complex_tombs.append((None, "addr", ts))
        elif r.kind == "point":
            p.cells.append(
                Cell(
                    col_name="addr",
                    ts=ts,
                    deleted=True,
                    path=f16((int(r.event_id) // 10) % n_fields),
                )
            )
        else:
            p.cells.append(
                Cell(col_name="addr", value=r.et.encode(), ts=ts, path=f16(0))
            )
            p.cells.append(
                Cell(
                    col_name="addr",
                    value=struct.pack(">i", int(r.event_id) % 89999 + 10000),
                    ts=ts,
                    path=f16(1),
                )
            )
            if r.run != 0 and r.event_id % 3 == 0:
                # note exists only post-ALTER: pre-ALTER files carry no
                # field-2 cells (matching real Cassandra after ALTER ADD)
                p.cells.append(
                    Cell(
                        col_name="addr",
                        value=repr(float(r.value)).encode(),
                        ts=ts,
                        path=f16(2),
                    )
                )
            if r.event_id % 11 == 0:
                p.cells.append(Cell(col_name="faddr", value=r.et.encode(), ts=ts))
            if r.event_id % 13 == 0:
                p.cells.append(
                    Cell(col_name="pair", value=repr(float(r.value)).encode(), ts=ts)
                )

    def _build(tmp: str) -> None:
        for gen, parts in by_run.items():
            addr_fmt = UDT_ADDR_V1 if gen == 0 else UDT_ADDR
            w = MaWriter(
                tmp,
                gen + 1,
                [
                    # per-generation header: gen 1 pre-ALTER (2 fields)
                    ("addr", addr_fmt),
                    ("faddr", f"FrozenType({UDT_ADDR})"),
                    ("pair", "TupleType(Int32Type,UTF8Type)"),
                ],
                codec_class="LZ4Compressor" if gen % 2 == 0 else "DeflateCompressor",
            )
            for key in sorted(parts):
                p = parts[key]
                p.cells.sort(key=lambda c: (c.col_name, c.path or b"", c.ts))
                w.add(p)
            w.finish()

    return staged_dir(table_dir, _build)


def build_ma_reversed_ck_table_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str, n_sstables: int = 2
) -> str:
    """The s22 multi-ck fixture with the day column DESCENDING —
    clustering (ReversedType(Int32Type) day_off, UTF8Type cat), the
    `CLUSTERING ORDER BY (day DESC)` shape real time-series schemas use
    constantly and the one typed-order case make_ck_key_fn did not model
    before round 8.  Same event derivation as
    build_ma_multick_table_from_events (same oracle-covered sets: a
    range tombstone over days [d-span, d] deletes the SAME typed set
    regardless of sort direction), but every range bound is expressed in
    POSITION order — under a DESC day the positionally-first bound is
    the LARGEST day, with inclusivities following their bounds — and the
    writer lays rows out in descending day order.  A reader or writer
    that ignores ReversedType misorders every marker/row interleave here
    and diverges from the s22 oracle."""
    import struct

    from .format import RangeTomb
    from .ma_format import FIXTURE_ENCODER_REV, MaWriter

    table_dir = os.path.join(
        out_dir, "rck" + FIXTURE_ENCODER_REV + f"_{n_sstables}", "tmx", "events_rck"
    )
    marker = os.path.join(table_dir, "_DONE")
    if os.path.exists(marker):
        return table_dir
    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    kind = (
        F.when(eid % 97 == 0, F.lit("row"))
        .when(eid % 89 == 0, F.lit("sdel"))
        .when(eid % 13 == 0, F.lit("range"))
        .when(eid % 10 == 0, F.lit("point"))
        .otherwise(F.lit("cell"))
    )
    rows = events.select(
        (F.col("ts_us") % n_sstables).cast("int").alias("run"),
        F.col("user_id").alias("key"),
        F.expr("ts_us div 86400000000").alias("day"),
        F.col("event_type").alias("col_name"),
        "value",
        F.col("ts_us").alias("ts"),
        kind.alias("kind"),
        "event_id",
    ).collect()
    base = min(r.day for r in rows) + 2  # day_off in [-2, ...]
    i32 = lambda v: struct.pack(">i", int(v))  # noqa: E731
    col_names = sorted(
        {r.col_name for r in rows if r.kind == "cell" and r.col_name != "signup"}
    )
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(n_sstables)}
    for r in rows:
        key = str(r.key).encode("utf-8")
        parts = by_run[r.run]
        p = parts.get(key)
        if p is None:
            p = parts[key] = Partition(key=key)
        d = int(r.day - base)
        cat = chr(97 + r.event_id % 3).encode()
        ck = (i32(d), cat)
        if r.kind == "row":
            p.ck_tombs.append((ck, r.ts))
        elif r.kind == "sdel":
            p.static_tomb_ts = max(p.static_tomb_ts or r.ts, r.ts)
        elif r.kind == "range":
            span = 1 + r.event_id % 3
            # POSITION order under DESC day: start = the LARGER day
            # (positionally smallest), end = the smaller; each bound
            # keeps the inclusivity its day carried in the ASC twin
            if r.event_id % 2 == 0:  # prefix bounds: day only
                p.range_tombs.append(
                    RangeTomb(
                        (i32(d),), r.event_id % 4 < 2,
                        (i32(d - span),), True, r.ts,
                    )
                )
            else:  # full two-component bounds
                p.range_tombs.append(
                    RangeTomb(
                        (i32(d), cat), r.event_id % 4 < 2,
                        (i32(d - span), cat), r.event_id % 6 < 3, r.ts,
                    )
                )
        elif r.kind == "point":
            p.cells.append(
                Cell(
                    col_name=r.col_name, ts=r.ts, deleted=True,
                    ck=None if r.col_name == "signup" else ck,
                )
            )
        else:
            p.cells.append(
                Cell(
                    col_name=r.col_name,
                    value=repr(float(r.value)).encode("utf-8"),
                    ts=r.ts,
                    ck=None if r.col_name == "signup" else ck,
                )
            )

    def _build(tmp: str) -> None:
        for gen, parts in by_run.items():
            w = MaWriter(
                tmp,
                gen + 1,
                [(n, "UTF8Type") for n in col_names],
                clustering=["ReversedType(Int32Type)", "UTF8Type"],
                static_columns=[("signup", "UTF8Type")],
                codec_class="LZ4Compressor" if gen % 2 == 0 else "DeflateCompressor",
            )
            for key in sorted(parts):
                p = parts[key]
                p.cells.sort(
                    key=lambda c: (b"".join(c.ck) if c.ck else b"", c.col_name, c.ts)
                )
                w.add(p)
            w.finish()

    return staged_dir(table_dir, _build)


def build_ma_marshal_table_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> str:
    """REAL Cassandra table exercising the seven marshal types beyond
    the round-10 map (round 11, VERDICT r10 task 5): DecimalType,
    IntegerType (varint), InetAddressType, SimpleDateType, TimeType,
    ShortType, ByteType — the classes real clusters ship constantly and
    the reference's enum reduces to COLUMN_UNKNOWN blobs
    (SSTableSchema.cpp:23-77).  Written as TWO nb-era (Cassandra 4.x)
    sstables with ZstdCompressor chunks — fixed-width types ride the
    fixed path (Short 2 / Byte 1 / SimpleDate 4 / Time 8), the three
    variable-width types the vint-length path, per Cassandra's
    valueLengthIfFixed split.

    Derivation (mirrored by the s37 oracle; every value is a pure
    integer function of the event timestamp so LWW ties are harmless —
    equal ts encodes identical bytes):

      sample: event_id % 23 = 0 (pure-Python writer budget at sf0.1);
      key = user_id; run = ts_us % 2 (two generations, so the winner
      routinely sits in either file); each sampled event writes ALL
      seven cells at ts = ts_us:
        d_short  = T % 65536 - 32768          (2-byte BE signed)
        d_byte   = T % 256 - 128              (1-byte signed)
        d_date   = T % 40000 - 20000 days     (4-byte BE, epoch 2^31)
        d_time   = T % 86400000000000 ns      (8-byte BE)
        d_varint = (T % 2000001 - 1000000) * 48271   (minimal 2c BE)
        d_dec    = scale 3, unscaled T % 2000001 - 1000000
        d_inet   = key even: IPv4 of T % 2^32; odd: IPv6 of
                   bytes(T, 8 BE) twice (uncompressed-groups form)
    """
    from .ma_format import FIXTURE_ENCODER_REV, MaWriter

    table_dir = os.path.join(out_dir, "marshal" + FIXTURE_ENCODER_REV, "tmx", "typed")
    cols = [
        ("d_byte", "ByteType"),
        ("d_date", "SimpleDateType"),
        ("d_dec", "DecimalType"),
        ("d_inet", "InetAddressType"),
        ("d_short", "ShortType"),
        ("d_time", "TimeType"),
        ("d_varint", "IntegerType"),
    ]

    def enc_varint(v: int) -> bytes:
        n = 1
        while not (-(1 << (8 * n - 1)) <= v < (1 << (8 * n - 1))):
            n += 1
        return v.to_bytes(n, "big", signed=True)

    def _build(tmp: str) -> None:
        events = load_table(spark, sf_dir, "events")
        rows = (
            events.filter(F.col("event_id") % 23 == 0)
            .select(
                (F.col("ts_us") % 2).cast("int").alias("run"),
                F.col("user_id").alias("key"),
                F.col("ts_us").alias("ts"),
            )
            .collect()
        )
        by_run: dict[int, dict[bytes, Partition]] = {0: {}, 1: {}}
        for r in rows:
            key = str(r.key).encode("utf-8")
            p = by_run[r.run].setdefault(key, Partition(key=key))
            t, ts = int(r.ts), int(r.ts)
            u = t % 2000001 - 1000000
            if int(r.key) % 2 == 0:
                inet = (t % (1 << 32)).to_bytes(4, "big")
            else:
                inet = t.to_bytes(8, "big") * 2
            vals = {
                "d_short": ((t % 65536 - 32768) & 0xFFFF).to_bytes(2, "big"),
                "d_byte": ((t % 256 - 128) & 0xFF).to_bytes(1, "big"),
                "d_date": ((t % 40000 - 20000) + (1 << 31)).to_bytes(4, "big"),
                "d_time": (t % 86400000000000).to_bytes(8, "big"),
                "d_varint": enc_varint(u * 48271),
                "d_dec": (3).to_bytes(4, "big") + enc_varint(u),
                "d_inet": inet,
            }
            for name, _fmt in cols:
                p.cells.append(Cell(col_name=name, value=vals[name], ts=ts))
        for run, parts in by_run.items():
            w = MaWriter(
                tmp, run + 1, cols, codec_class="ZstdCompressor",
                version="nb",
            )
            for key in sorted(parts):
                p = parts[key]
                p.cells.sort(key=lambda c: (c.col_name, c.ts))
                w.add(p)
            w.finish()

    return staged_dir(table_dir, _build)


def classified_from_ma(
    spark: SparkSession, table_dir: str, value_as: str = "double",
    wide_slice_bytes: int | None = None,
    lookup_keys: str | None = None,
) -> DataFrame:
    """classified_from_runs for a real-format Cassandra table directory,
    any era.  ma sstables emit no range-tombstone cells (markers fold
    into row_tomb_ts); pre-ma sstables DO carry real range-tombstone
    cells (RANGE_TOMBSTONE_MASK, SSTable.cpp:416-423), so the mapping
    must classify both.  `value_as` picks the cell-value decode: the
    event fixtures store stringified doubles ('double'); text corpora
    keep the raw string ('string').  `wide_slice_bytes` overrides the
    reader's wide-partition slice target (fixture-scale tests force the
    block path with a small value)."""
    register(spark)
    rd = spark.read.format("sstable_run").option("layout", "ma")
    if wide_slice_bytes is not None:
        rd = rd.option("wide_slice_bytes", str(wide_slice_bytes))
    if lookup_keys is not None:
        # point-lookup plan (O2 find(): comma-separated hex keys) —
        # Filter.db bloom pruning + per-key Index windows at planning
        rd = rd.option("lookup_keys", lookup_keys)
    return classify_raw_real(rd.load(table_dir), value_as)


def classify_raw_real(raw: DataFrame, value_as: str = "double") -> DataFrame:
    '''The pure classification transform behind classified_from_ma,
    shared with the STREAMING real-format path (each microbatch slice
    of the raw EAV stream classifies identically, round 9).'''
    raw = (
        raw
        # ck-BOUNDED range tombstones (range_tomb + NULL col_name) are
        # clustering-scoped: the flat (key, col) classification cannot
        # express them — they are handled by the ck-aware merge path
        # (operators.merge.clustered_live_cells / q_s18), not here
        .filter(~(F.col("range_tomb") & F.col("col_name").isNull()))
    )
    kind = (
        F.when(F.col("range_tomb"), F.lit("range"))
        .when(F.col("col_name").isNull(), F.lit("row"))
        .when(F.col("deleted"), F.lit("point"))
        .otherwise(F.lit("cell"))
    )
    # clustered tables: qualify the column with its clustering prefix so
    # ck-unaware per-(key, col) merging stays CORRECT — distinct rows
    # become distinct columns, point tombstones stay scoped to their own
    # clustering row, statics (ck NULL) stay partition-scoped.  Without
    # this, a generic merge over a clustered table would collapse rows
    # across ck — the reference's documented wrong-merge, silently.
    qual_col = F.when(
        F.col("ck").isNotNull(),
        F.concat(F.col("ck").cast("string"), F.lit(":"), F.col("col_name")),
    ).otherwise(F.col("col_name"))
    val = F.col("value").cast("string")
    if value_as == "double":
        val = val.try_cast("double")
    elif value_as != "string":
        raise ValueError(f"classified_from_ma: unknown value_as {value_as!r}")
    return raw.select(
        F.col("key").cast("string").cast("long").alias("key"),
        qual_col.alias("col_name"),
        val.alias("value"),
        "ts",
        "ttl",
        "expiration",
        kind.alias("kind"),
    )


def classified_from_runs(spark: SparkSession, runs_dir: str) -> DataFrame:
    """Read the runs back into the classified EAV frame (key, col_name,
    value, ts, ttl, expiration, kind) that operators/merge.py consumes —
    the inverse of build_runs_from_events' encoding."""
    register(spark)
    raw = spark.read.format("sstable_run").load(runs_dir)
    kind = (
        F.when(F.col("range_tomb"), F.lit("range"))
        .when(F.col("col_name").isNull(), F.lit("row"))
        .when(F.col("deleted"), F.lit("point"))
        .otherwise(F.lit("cell"))
    )
    # clustered tables: qualify the column with its clustering prefix so
    # ck-unaware per-(key, col) merging stays CORRECT — distinct rows
    # become distinct columns, point tombstones stay scoped to their own
    # clustering row, statics (ck NULL) stay partition-scoped.  Without
    # this, a generic merge over a clustered table would collapse rows
    # across ck — the reference's documented wrong-merge, silently.
    qual_col = F.when(
        F.col("ck").isNotNull(),
        F.concat(F.col("ck").cast("string"), F.lit(":"), F.col("col_name")),
    ).otherwise(F.col("col_name"))
    return raw.select(
        F.col("key").cast("string").cast("long").alias("key"),
        qual_col.alias("col_name"),
        # tombstone rows carry empty values — try_cast yields NULL for them
        F.col("value").cast("string").try_cast("double").alias("value"),
        "ts",
        "ttl",
        "expiration",
        kind.alias("kind"),
    )


def spark_token_of(key_str: Column) -> Column:
    """format.token_of reproduced as a Catalyst expression: first 8 bytes
    of md5(key) big-endian as SIGNED int64 (exact decimal arithmetic for
    the two's-complement wrap)."""
    d = F.conv(F.substring(F.md5(key_str), 1, 16), 16, 10).cast("decimal(20,0)")
    # 2^63 / 2^64 exceed int64 literals — build them as decimal-string casts
    half = F.expr("CAST('9223372036854775808' AS DECIMAL(20,0))")
    full = F.expr("CAST('18446744073709551616' AS DECIMAL(21,0))")
    return F.when(d >= half, d - full).otherwise(d).cast("long")


def compact_runs(
    spark: SparkSession, runs_dir: str, out_dir: str, n_runs_out: int = 1
) -> str:
    """Major compaction — the reference's whole job as one round trip:
    merge every run (LWW + tombstone reconciliation), write the surviving
    cells back as n_runs_out sorted tombstone-free runs.

    Distributed shape: records are range-partitioned by token (each task
    owns a contiguous ring slice, like one output SSTable per compaction
    shard) and each task writes its own run with RunWriter inside
    foreachPartition — no driver-side collect.  Run generation = task
    partition id + 1."""
    import shutil

    from ...operators.merge import live_cells_from_classified, lww_latest

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    latest = lww_latest(live_cells_from_classified(classified_from_runs(spark, runs_dir)))
    recs = (
        latest.groupBy("key")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("col_name", "value", "ts", "ttl", "expiration"))
            ).alias("cells")
        )
        .withColumn("key_str", F.col("key").cast("string"))
        .withColumn("token", spark_token_of(F.col("key_str")))
        .repartitionByRange(n_runs_out, "token", "key_str")
        .sortWithinPartitions("token", "key_str")
    )

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        gen = TaskContext.get().partitionId() + 1
        writer = None
        for r in rows:
            if writer is None:
                writer = RunWriter(out_dir, gen)
            cells = [
                Cell(
                    col_name=c.col_name,
                    value=repr(float(c.value)).encode("utf-8"),
                    ts=c.ts,
                    ttl=c.ttl,
                    expiration=c.expiration,
                )
                for c in r.cells
            ]
            writer.add(Partition(key=r.key_str.encode("utf-8"), cells=cells))
        if writer is not None:
            writer.finish()

    recs.foreachPartition(write_partition)
    return out_dir


def default_runs_dir(sf_dir: str) -> str:
    """Deterministic per-SF cache location for the generated runs.

    The directory name folds in the source parquets' (mtime, size): a
    regenerated fixture at the same sf path — or two sf dirs sharing a
    basename — moves EVERY cached derived table (runs, ma/mixed-era/
    counter/clustered fixtures, roundtrip outputs, stream stages) to a
    fresh location instead of serving stale bytes under still-matching
    _DONE markers.  This generalizes the madocs-specific cache-key fix
    (r05 advice) to the whole fixture family in one place."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    parts = [os.path.abspath(sf_dir)]
    for t in ("events", "documents"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{st.st_mtime_ns}:{st.st_size}")
        except OSError:
            parts.append("absent")
    key = hashlib.md5(":".join(parts).encode()).hexdigest()[:10]
    return os.path.join("/tmp", "spark_graft_runs", f"{tag}_{key}")
