"""Spark Python DataSource over SSTable-style runs (SURVEY.md §2.1, §7
Phase 6): `spark.read.format("sstable_run").load(dir)` yields the EAV cell
stream across every run in the directory.

Scale design:
  - one InputPartition per (run, token sub-range): each run is split at
    Summary.db sample boundaries into `splits_per_run` ranges, so a single
    huge run parallelizes across executors (the Spark analog of the
    reference's one-cursor-per-SSTable fan-out, CassandraParser.cpp:177-194,
    but horizontally partitioned);
  - token-range predicate pushdown (`pushFilters`): GreaterThan[OrEqual]
    filters on `token` prune whole runs via the Statistics.db token range
    and seek within surviving runs via Summary+Index (operator O2,
    CassandraParser.cpp:196-216).  Filters are also left for Spark to
    re-apply, so pruning is safe even when partial;
  - merging is NOT done here: the source emits the raw multi-run cell
    stream; LWW/tombstone reconciliation is the job of operators/merge.py
    (J1's union-of-runs becomes "one DataFrame over all runs").

Row schema (EAV long form, §1.3): run, token, key, col_name, value, ts,
ttl, expiration, deleted, range_tomb, row_tomb_ts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import codec as C
from .format import RunReader, discover_runs

SCHEMA = StructType(
    [
        StructField("run", IntegerType()),
        StructField("token", LongType()),
        StructField("key", BinaryType()),
        StructField("col_name", StringType()),
        # clustering-key prefix (real clustered ma tables; NULL elsewhere)
        StructField("ck", BinaryType()),
        StructField("value", BinaryType()),
        StructField("ts", LongType()),
        StructField("ttl", IntegerType()),
        StructField("expiration", LongType()),
        StructField("deleted", BooleanType()),
        StructField("range_tomb", BooleanType()),
        StructField("row_tomb_ts", LongType()),
        # ck-bounded range tombstones (real clustered ma tables): a row
        # with range_tomb=true, col_name NULL, ck=start bound, ck_end=end
        # bound (NULL = unbounded side) and incl_mask bit0/bit1 = start/
        # end inclusive.  NULL on every other row kind.  incl_mask=4 (a
        # range_tomb row with both bounds NULL) is a STATIC-row deletion:
        # it covers exactly the partition's static (ck NULL) cells.
        StructField("ck_end", BinaryType()),
        StructField("incl_mask", IntegerType()),
        # TYPED clustering sort keys (round 7): memcomparable transforms
        # of ck / ck_end whose unsigned-byte order equals the table's
        # typed clustering-tuple order, incl. shorter-prefix bounds
        # (ma_format.make_ck_key_fn).  Tombstone-cover comparison happens
        # on THESE — raw ck bytes misorder signed numeric clustering
        # columns, the class of bug the reference punts on entirely
        # (SSTable.cpp:553-563).
        StructField("ck_key", BinaryType()),
        StructField("ck_end_key", BinaryType()),
        # COMPLEX (multi-cell collection) columns (round 7): `path` is
        # the cell's CellPath (map key / set element / list position);
        # NULL on simple cells.  A COMPLEX-COLUMN DELETION (the
        # HAS_COMPLEX_DELETION grammar the reference declares but never
        # reads, SSTable.hpp:120) emits as range_tomb=true +
        # col_name=<the collection column> + incl_mask=5: it covers
        # every path of that column in its row with cell ts <= its ts.
        StructField("path", BinaryType()),
    ]
)


@dataclass
class RunSlice(InputPartition):
    directory: str
    gen: int
    start_token: int | None  # inclusive seek point (None = run start)
    end_token: int | None  # exclusive upper bound (None = run end)
    verify: bool
    layout: str = "sgr"  # "sgr" (engine-native runs) | "ma" (real Cassandra, any era)
    # real-format branch: the sstable's Data.db filename — carries the
    # per-file version so read() can dispatch old-era vs ma-era decoders
    # (SSTable.cpp:45-55 create_table)
    data_name: str | None = None
    # offset-granular planning for sstables with WIDE partitions
    # (promoted index entries): [data_lo, data_hi) = explicit logical
    # range of whole partitions; block = (key, row_tomb_ts, lo, hi) =
    # ONE promoted block of one wide partition.  Both None = the
    # ordinary token-range slicing.
    data_lo: int | None = None
    data_hi: int | None = None
    block: tuple | None = None
    # point-lookup batching (round 11): a tuple of (lo, hi) Data.db
    # windows decoded by ONE task.  Without it every looked-up partition
    # became its own InputPartition — ~140 keys x 3 generations = ~400
    # tasks of pure Python-worker + file-open overhead for a 12-row
    # answer (s29 warm 3.9 s); batching caps tasks per sstable while
    # keeping the decode exact (no gap bytes read)
    windows: tuple | None = None


def _summary_tokens(directory: str, gen: int) -> list[int]:
    import os

    path = os.path.join(directory, f"{gen}-Summary.db")
    buf = open(path, "rb").read()
    toks = []
    for off in range(0, len(buf), 16):
        t, _ = C.dec_i64(buf, off)
        toks.append(t)
    return toks


class SSTableRunReader(DataSourceReader):
    def __init__(self, options):
        self.directory = options.get("path")
        if not self.directory:
            raise ValueError("sstable_run requires a path")
        # default 8 token-range slices per run: a 3-run directory then
        # yields 24 concurrent decode tasks (measured 815k vs 526k
        # cells/s at 4 on local[32]; 16 over-splits against the Summary
        # sample granularity).  Real deployments tune it to
        # cores / n_runs via the reader option.
        self.splits = int(options.get("splits_per_run", "8"))
        self.verify = options.get("verify_checksums", "true").lower() == "true"
        # Wide-partition slice TARGET (bytes of logical Data.db per
        # task).  Promoted-index blocks are ~64 KB (Cassandra's
        # column_index_size serves point reads, not scan parallelism):
        # one task per BLOCK would turn a 10 GB all-wide sstable into
        # ~160k forty-millisecond Python tasks (measured r09: a fixture
        # with 550 small promoted partitions planned 1112 slices,
        # 47 s of pure task overhead).  Instead (a) a wide partition no
        # larger than the target rides the surrounding RANGE slice
        # untouched, and (b) a bigger one splits into groups of
        # CONSECUTIVE blocks totalling ~target bytes.  64 MB default:
        # half of spark.sql.files.maxPartitionBytes' 128 MB because the
        # pure-Python decode is the bottleneck, not IO.
        self.wide_slice_bytes = int(
            options.get("wide_slice_bytes", str(64 * 1024 * 1024))
        )
        # layout "ma": the directory is a real Cassandra 3.x table dir
        # (<keyspace>/<table>/ma-<gen>-big-*.db) read via ma_format.MaReader
        self.layout = options.get("layout", "sgr")
        # point-lookup scan (O2, the reference's find()/-S hex-key path,
        # CassandraParser.cpp:196-216 + Cassandra2Aerospike.cpp:126-150):
        # comma-separated hex partition keys.  Planning consults each
        # sstable's Filter.db bloom sidecar (the one the reference never
        # opens) to prune files that provably lack every requested key,
        # then seeks survivors via Index.db to per-key [lo, hi) windows.
        # layout=ma only — SGR runs keep the token-range path.
        self.lookup_slices = int(options.get("lookup_slices", "4"))
        lk = options.get("lookup_keys")
        self.lookup_keys: list[bytes] | None = (
            [bytes.fromhex(h) for h in lk.split(",") if h] if lk else None
        )
        self.min_token: int | None = None
        self.min_inclusive = True

    def schema(self):
        return SCHEMA

    def pushFilters(self, filters: list[Filter]):
        """Consume token lower-bound filters for pruning/seek; report every
        filter back as unhandled so Spark re-applies them exactly."""
        for f in filters:
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)) and f.attribute == (
                "token",
            ):
                v = int(f.value)
                inclusive = isinstance(f, GreaterThanOrEqual)
                cand = v if inclusive else v + 1
                if self.min_token is None or cand > self.min_token:
                    self.min_token = cand
            yield f  # never claim full handling — pruning only

    def partitions(self):
        if self.layout == "ma":
            return self._ma_partitions()
        parts: list[RunSlice] = []
        seen_partitioner: tuple[int, str] | None = None
        for gen in discover_runs(self.directory):
            rr = RunReader(self.directory, gen, verify_checksums=False)
            # P5: every run in a table must share one partitioner — the
            # k-way merge's global (token, key) order is meaningless
            # across token functions (CassandraParser.cpp:144-153 aborts
            # on the same condition)
            if seen_partitioner is None:
                seen_partitioner = (gen, rr.stats.partitioner)
            elif rr.stats.partitioner != seen_partitioner[1]:
                raise ValueError(
                    f"inconsistent partitioners in {self.directory}: run "
                    f"{seen_partitioner[0]} uses {seen_partitioner[1]!r} but "
                    f"run {gen} uses {rr.stats.partitioner!r}"
                )
            if self.min_token is not None and rr.stats.token_hi < self.min_token:
                continue  # whole-run prune via Statistics token range
            samples = _summary_tokens(self.directory, gen)
            lo = self.min_token  # None = start of run
            # split at summary sample boundaries into ~self.splits ranges
            bounds: list[int] = []
            if len(samples) > 1 and self.splits > 1:
                step = max(1, len(samples) // self.splits)
                bounds = [
                    samples[i]
                    for i in range(step, len(samples), step)
                    if lo is None or samples[i] > lo
                ][: self.splits - 1]
            edges: list[tuple[int | None, int | None]] = []
            prev: int | None = lo
            for b in bounds:
                edges.append((prev, b))
                prev = b
            edges.append((prev, None))
            for s, e in edges:
                parts.append(RunSlice(self.directory, gen, s, e, self.verify))
        return parts

    def _ma_partitions(self) -> list[RunSlice]:
        """Real-format branch: one InputPartition per sstable — the
        reference's own one-cursor-per-SSTable fan-out
        (CassandraParser.cpp:177-194).  A mixed-era directory (old
        ka/la files alongside ma files, the post-upgrade state the
        reference's version dispatch exists for, SSTable.cpp:45-55) is
        handled per file.  Partitioner consistency is enforced across
        sstables AND eras exactly as for SGR runs (P5,
        CassandraParser.cpp:144-153); token-range sub-splitting via the
        Summary mirrors the SGR O2 path and lands when a single sstable
        outgrows one task."""
        from .ma_format import MURMUR3_CLASS, MaReader, murmur3_token, read_summary
        from .old_format import V_KA, V_MA, OldReader, discover_cassandra_sstables

        parts: list[RunSlice] = []
        seen: tuple[str, str] | None = None
        for vcode, gen, name in discover_cassandra_sstables(self.directory):
            if vcode >= V_MA:
                rd = MaReader(
                    self.directory, gen, verify_checksums=False,
                    prefix=name[: -len("-Data.db")],
                )
                pner = rd.stats.partitioner
            else:
                rd = OldReader(self.directory, name, verify_checksums=False)
                pner = rd.partitioner
            if seen is None:
                seen = (name, pner)
            elif pner != seen[1]:
                raise ValueError(
                    f"inconsistent partitioners in {self.directory}: sstable "
                    f"{seen[0]} uses {seen[1]!r} but {name} uses {pner!r}"
                )
            if self.lookup_keys is not None:
                parts += self._lookup_slices(rd, gen, name)
                continue
            # both eras expose index_entries_full()/logical_length():
            # ma promoted entries since round 7, the old (ka/la) 2.x
            # IndexInfo promoted entries since round 9 — one planner
            # fans out wide partitions regardless of era
            wide = self._wide_partition_slices(rd, gen, name)
            if wide is not None:
                parts += wide
                continue
            # O2 for real files: sub-split one sstable into token ranges
            # at Summary sample boundaries (seek via Summary + Index,
            # SSTable.cpp:58-180), so a single huge sstable parallelizes
            # instead of pinning one task.  Only under Murmur3 — token
            # math must match the file's own partition order.
            samples: list[int] = []
            if pner == MURMUR3_CLASS and self.splits > 1:
                try:
                    samples = [
                        murmur3_token(k)
                        for k, _ in read_summary(
                            rd.path("Summary"), extra_header=vcode >= V_KA
                        )
                    ]
                except (FileNotFoundError, ValueError, OSError):
                    samples = []
            lo = self.min_token  # pushdown lower bound (None = file start)
            bounds: list[int] = []
            if len(samples) > 1:
                step = max(1, len(samples) // self.splits)
                bounds = [
                    samples[i]
                    for i in range(step, len(samples), step)
                    if lo is None or samples[i] > lo
                ][: self.splits - 1]
            edges: list[tuple[int | None, int | None]] = []
            prev: int | None = lo
            for b in bounds:
                edges.append((prev, b))
                prev = b
            edges.append((prev, None))
            for s, e in edges:
                parts.append(
                    RunSlice(self.directory, gen, s, e, self.verify, "ma", name)
                )
        return parts

    def _lookup_slices(self, rd, gen: int, name: str) -> list[RunSlice]:
        """Point-lookup plan for one sstable: bloom-prune, then Index
        seek.  Mirrors the reference's find() (CassandraParser.cpp:
        196-216 keeps only tables whose cursor lands on a row >= key;
        SSTable.cpp:58-87 seeks each via Summary+Index) with two
        upgrades: (a) the Filter.db bloom sidecar — which the reference
        never opens — answers "key certainly absent" BEFORE any Index
        work, pruning whole sstables at planning; (b) the plan emits
        exact per-partition [lo, hi) Data.db windows (merged when
        adjacent), so a task decodes only the looked-up partitions, not
        the tail of the file.  Both eras consult the filter; the old
        era admits on absent-or-foreign sidecars (several real pre-3.0
        bloom layouts exist — OldReader.might_contain_key) while the ma
        era fails loudly on malformed ones.  False positives cost one
        empty window at most; false negatives cannot happen by bloom
        construction, so the merged result is byte-identical with
        pruning on or off."""
        keys = [k for k in self.lookup_keys if rd.might_contain_key(k)]
        if not keys:
            return []  # bloom proves every requested key absent
        wanted = set(keys)
        entries = list(rd.index_entries_full())
        total = rd.logical_length()
        windows: list[list[int]] = []
        for i, (k, pos, _promoted) in enumerate(entries):
            if bytes(k) in wanted:
                end = entries[i + 1][1] if i + 1 < len(entries) else total
                windows.append([pos, end])
        windows.sort()
        merged: list[list[int]] = []
        for lo, hi in windows:
            if merged and merged[-1][1] == lo:
                merged[-1][1] = hi
            else:
                merged.append([lo, hi])
        # batch the windows into at most LOOKUP_SLICES tasks per sstable:
        # a point lookup's cost should be the windows DECODED, not one
        # Spark task per looked-up partition
        n_slices = max(1, min(len(merged), self.lookup_slices))
        per = (len(merged) + n_slices - 1) // n_slices
        return [
            RunSlice(self.directory, gen, None, None, self.verify, "ma",
                     name,
                     windows=tuple(tuple(w) for w in merged[i : i + per]))
            for i in range(0, len(merged), per)
        ]

    def _wide_partition_slices(self, rd, gen: int, name: str):
        """Offset-granular plan for a real-format sstable (EITHER era:
        ma promoted entries, or the 2.x ka/la IndexInfo entries the
        reference skips at SSTable.cpp:76-84) containing WIDE
        partitions: each promoted BLOCK of a
        wide partition becomes its own InputPartition — one 10 GB
        partition fans out across tasks instead of pinning one — and the
        ordinary partitions between them become contiguous [lo, hi)
        range slices.  Returns None when the sstable has no promoted
        entries (the Summary token-split path handles it).  Token
        lower-bound pushdown is NOT applied to these slices (Spark
        re-applies every filter; only the pruning shortcut is lost,
        and only for sstables that contain wide partitions)."""
        # one driver-side Index pass per sstable at planning — the same
        # order of work as the Summary read above it
        entries = list(rd.index_entries_full())
        if not any(promoted for _k, _p, promoted in entries):
            return None
        total = rd.logical_length()
        target = max(1, self.wide_slice_bytes)
        sizes = [
            (entries[i + 1][1] if i + 1 < len(entries) else total) - pos
            for i, (_k, pos, pr) in enumerate(entries)
            if pr is not None
        ]
        if max(sizes) <= target:
            # promoted entries exist but no partition exceeds one
            # task's worth: the Summary token-split path parallelizes
            # this file BETTER than offset slicing would (it keeps the
            # ~splits_per_run fan-out and the token pushdown shortcut)
            return None
        slices: list[RunSlice] = []
        rng_lo: int | None = None
        for i, (key, pos, promoted) in enumerate(entries):
            end = entries[i + 1][1] if i + 1 < len(entries) else total
            # a wide partition NO BIGGER than the slice target rides the
            # surrounding range slice — block granularity (~64 KB, sized
            # for point reads) must never dictate task granularity
            if promoted is None or end - pos <= target:
                if rng_lo is None:
                    rng_lo = pos
                continue
            if rng_lo is not None:
                slices.append(
                    RunSlice(self.directory, gen, None, None, self.verify,
                             "ma", name, data_lo=rng_lo, data_hi=pos)
                )
                rng_lo = None
            # bigger than one task's worth: split into groups of
            # CONSECUTIVE blocks totalling ~target bytes (blocks are
            # contiguous, so a group is one [lo, hi) window and
            # partition_window() reads it unchanged)
            row_tomb, blocks = promoted
            grp_lo = pos + blocks[0]
            for j in range(1, len(blocks) + 1):
                b_hi = pos + blocks[j] if j < len(blocks) else end
                if b_hi - grp_lo >= target or j == len(blocks):
                    slices.append(
                        RunSlice(self.directory, gen, None, None, self.verify,
                                 "ma", name, block=(key, row_tomb, grp_lo, b_hi))
                    )
                    grp_lo = b_hi
        if rng_lo is not None:
            slices.append(
                RunSlice(self.directory, gen, None, None, self.verify,
                         "ma", name, data_lo=rng_lo, data_hi=total)
            )
        return slices

    def read(self, part: RunSlice):
        """Yield pyarrow.RecordBatch, not per-row tuples: row tuples pay
        pickle + per-row conversion on the JVM side (~60k cells/s
        measured end-to-end); columnar batches move the same cells at
        several hundred k/s.  The decode loop itself stays Python (the
        format is vint-delta binary), but everything downstream of it is
        Arrow."""
        import pyarrow as pa

        arrow_schema = pa.schema(
            [
                pa.field("run", pa.int32()),
                pa.field("token", pa.int64()),
                pa.field("key", pa.binary()),
                pa.field("col_name", pa.string()),
                pa.field("ck", pa.binary()),
                pa.field("value", pa.binary()),
                pa.field("ts", pa.int64()),
                pa.field("ttl", pa.int32()),
                pa.field("expiration", pa.int64()),
                pa.field("deleted", pa.bool_()),
                pa.field("range_tomb", pa.bool_()),
                pa.field("row_tomb_ts", pa.int64()),
                pa.field("ck_end", pa.binary()),
                pa.field("incl_mask", pa.int32()),
                pa.field("ck_key", pa.binary()),
                pa.field("ck_end_key", pa.binary()),
                pa.field("path", pa.binary()),
            ]
        )
        batch_rows = 8192
        cols: list[list] = [[] for _ in range(17)]

        def flush():
            arrays = [
                pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)
            ]
            for c in cols:
                c.clear()
            return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

        key_of = None  # typed ck sort key fn (ma layout only)

        if part.layout == "ma":
            from .old_format import V_MA, OldReader, parse_data_filename

            parsed = parse_data_filename(part.data_name or "")
            if parsed is not None and parsed[0] < V_MA:
                ord_ = OldReader(
                    part.directory, part.data_name, verify_checksums=part.verify
                )
                if part.block is not None:
                    # one promoted block of an old-era wide partition
                    bkey, brow_tomb, b_lo, b_hi = part.block
                    source = iter(
                        [ord_.partition_window(bytes(bkey), brow_tomb, b_lo, b_hi)]
                    )
                elif part.windows is not None:
                    import itertools

                    source = itertools.chain.from_iterable(
                        ord_.partitions_between(lo, hi)
                        for lo, hi in part.windows
                    )
                elif part.data_lo is not None:
                    source = ord_.partitions_between(part.data_lo, part.data_hi)
                else:
                    source = ord_.partitions(part.start_token, part.end_token)
            else:
                from .ma_format import MaReader, make_ck_key_fn

                rd = MaReader(
                    part.directory,
                    part.gen,
                    verify_checksums=part.verify,
                    prefix=parsed[2] if parsed is not None else None,
                )
                key_of = make_ck_key_fn(rd.stats.schema.clustering)
                if part.block is not None:
                    # one promoted block of a wide partition
                    bkey, brow_tomb, b_lo, b_hi = part.block
                    source = iter(
                        [rd.partition_window(bytes(bkey), brow_tomb, b_lo, b_hi)]
                    )
                elif part.windows is not None:
                    import itertools

                    source = itertools.chain.from_iterable(
                        rd.partitions_between(lo, hi)
                        for lo, hi in part.windows
                    )
                elif part.data_lo is not None:
                    source = rd.partitions_between(part.data_lo, part.data_hi)
                else:
                    source = rd.partitions(part.start_token, part.end_token)
        else:
            rr = RunReader(part.directory, part.gen, verify_checksums=part.verify)
            source = (
                (p.token, p)
                for p in rr.partitions(
                    start_token=part.start_token, end_token=part.end_token
                )
            )

        # emit is the per-cell hot path (profiled at 27% of slice decode
        # as a zip-over-columns loop): pre-bound list.append locals cut
        # it to straight-line calls, and the sort-key fn is skipped
        # entirely for layouts without typed clustering
        (
            a_run, a_tok, a_key, a_name, a_ck, a_val, a_ts, a_ttl, a_exp,
            a_del, a_rtm, a_rts, a_cke, a_msk, a_ckk, a_cek, a_pth,
        ) = [c.append for c in cols]

        def emit(
            run, t, key, name, ck, value, ts, ttl, exp, dele, rt, rts,
            ck_end=None, incl_mask=None, path=None,
        ):
            a_run(run); a_tok(t); a_key(key); a_name(name); a_ck(ck)
            a_val(value); a_ts(ts); a_ttl(ttl); a_exp(exp); a_del(dele)
            a_rtm(rt); a_rts(rts); a_cke(ck_end); a_msk(incl_mask)
            if key_of is None:
                a_ckk(None); a_cek(None)
            else:
                a_ckk(key_of(ck)); a_cek(key_of(ck_end))
            a_pth(path)

        for t, p in source:
            if p.row_tomb_ts is not None:
                # marker row (col_name NULL): a row tombstone survives even
                # when the partition carries no cells in this run
                emit(
                    part.gen, t, p.key, None, None, None, p.row_tomb_ts,
                    None, None, False, False, p.row_tomb_ts,
                )
            # ck-bounded range tombstones + clustered-row deletions (real
            # clustered ma tables; a ck-row deletion IS the degenerate
            # inclusive [ck, ck] range) — range_tomb rows with ck bounds
            for rt_ in getattr(p, "range_tombs", ()):
                emit(
                    part.gen, t, p.key, None, rt_.start, None, rt_.ts,
                    None, None, False, True, p.row_tomb_ts, rt_.end,
                    (1 if rt_.start_incl else 0) | (2 if rt_.end_incl else 0),
                )
            for dck, dts in getattr(p, "ck_tombs", ()):
                emit(
                    part.gen, t, p.key, None, dck, None, dts,
                    None, None, False, True, p.row_tomb_ts, dck, 3,
                )
            if getattr(p, "static_tomb_ts", None) is not None:
                # static-row deletion: range_tomb row, NULL bounds,
                # incl_mask=4 — covers only the key's static cells
                emit(
                    part.gen, t, p.key, None, None, None, p.static_tomb_ts,
                    None, None, False, True, p.row_tomb_ts, None, 4,
                )
            for dck, cname, dts in getattr(p, "complex_tombs", ()):
                # complex-column deletion: covers every path of cname in
                # the dck row (incl_mask=5 tags the scope)
                emit(
                    part.gen, t, p.key, cname, dck, None, dts,
                    None, None, False, True, p.row_tomb_ts, None, 5,
                )
            for c in p.cells:
                emit(
                    part.gen, t, p.key, c.col_name, c.ck,
                    c.value, c.ts, c.ttl, c.expiration, c.deleted,
                    c.range_tomb, p.row_tomb_ts,
                    None, None, c.path,
                )
            if len(cols[0]) >= batch_rows:
                yield flush()
        if cols[0]:
            yield flush()


class SSTableRunStreamReader(DataSourceStreamReader):
    """Streaming flavor of the run source: each newly-arrived run
    generation is a microbatch (the reference's *continuous* operation —
    it re-walks the table directory and resumes as new SSTables land;
    CassandraParser.cpp:83-175 + the `-s` resume contract).

    Offset = highest run generation ingested; partition-planned (one
    InputPartition per new run, split like the batch reader), so executors
    do the reading — not the driver.  Checkpointed offsets give exactly-
    once per run: the streaming analog of the resume-key hint (O3).

    Admission control: `max_gens_per_batch` caps how many new generations
    one microbatch admits (the maxFilesPerTrigger analog, and the
    reference's bounded-in-flight backpressure idea, S12 /
    AerospikeWriter.cpp:25).  A backlog of runs then drains as a
    SEQUENCE of microbatches in gen order — which also makes watermark
    progression across the backlog deterministic (stream_late_data
    depends on exactly that).

    The cap's floor is the END of the last PLANNED batch (recorded in
    `partitions(start, end)`), not the engine's commits and not the last
    value latestOffset returned: `commit(end)` only arrives when Spark
    plans a subsequent batch, so a commit-gated cap deadlocks a draining
    stream, and a per-call self-advancing floor over-admits because the
    trigger loop polls latestOffset many times per planned batch (both
    measured).  Planning is the one per-batch signal the Python API
    exposes, and it makes latestOffset idempotent between plannings —
    each batch admits exactly the next `max_gens` generations.
    LIMITATION: the floor is in-memory — after a JVM/driver restart the
    first capped trigger may plan one stale empty batch (hi < lo yields
    no partitions, nothing re-read) and the offset sequence restarts
    from the checkpoint, so batch BOUNDARIES are not stable across
    restarts; the uncapped default is unaffected."""

    def __init__(self, options):
        self.directory = options.get("path")
        self.max_gens = int(options.get("max_gens_per_batch", "0"))  # 0 = all
        self._committed = 0  # highest gen seen in commit()/partitions()
        self._floor = 0  # highest offset this reader has returned
        if not self.directory:
            raise ValueError("sstable_run stream requires a path")
        self.verify = options.get("verify_checksums", "true").lower() == "true"
        # token-range sub-split per admitted sstable (r18, guide §2.5
        # "one huge unsplittable file" / §1.2): the stream planned ONE
        # InputPartition per generation, so every microbatch's decode —
        # pure-Python vint/chunk work, the CPython-bound regime — ran as
        # a single serial task (measured 0.8 s/batch at sf0.1 while 31
        # cores idled; at scale one flushed multi-GB sstable would pin a
        # task for minutes).  Same Summary-sample split, same default,
        # as the batch reader; read() already handles bounded slices.
        self.splits = int(options.get("splits_per_run", "8"))
        # layout "ma": stream a REAL Cassandra table directory — each
        # newly-flushed/compacted sstable (any era) is a microbatch,
        # the continuous-ingest story over actual Cassandra data files
        self.layout = options.get("layout", "sgr")

    def _gen_names(self) -> dict[int, list[tuple[int | None, str | None]]]:
        """generation -> (version code, Data.db filename) pairs
        ((None, None) for SGR runs).  A list per generation: two eras can
        collide on one generation number (tmx-events-ka-2-* alongside
        ma-2-big-*) and BOTH must stream — collapsing to one name would
        silently drop an sstable the batch reader reads."""
        if self.layout == "ma":
            from .old_format import discover_cassandra_sstables

            out: dict[int, list[tuple[int | None, str | None]]] = {}
            for v, g, name in discover_cassandra_sstables(self.directory):
                out.setdefault(g, []).append((v, name))
            return out
        return {g: [(None, None)] for g in discover_runs(self.directory)}

    def _slices_for(self, gen: int, vcode: int | None, name: str | None):
        """Token-range sub-split of one admitted sstable at Summary
        sample boundaries — the batch reader's O2 discipline applied to
        the stream plan.  Only under Murmur3 (token math must match the
        file's own partition order); any missing/unreadable Summary
        falls back to the whole-file slice."""
        whole = [
            RunSlice(
                self.directory, gen, None, None, self.verify, self.layout, name
            )
        ]
        if self.splits <= 1:
            return whole
        try:
            if self.layout == "ma":
                from .ma_format import (
                    MURMUR3_CLASS,
                    MaReader,
                    murmur3_token,
                    read_summary,
                )
                from .old_format import V_KA, V_MA, OldReader

                if vcode is None or name is None:
                    return whole
                if vcode >= V_MA:
                    rd = MaReader(
                        self.directory, gen, verify_checksums=False,
                        prefix=name[: -len("-Data.db")],
                    )
                    pner = rd.stats.partitioner
                else:
                    rd = OldReader(self.directory, name, verify_checksums=False)
                    pner = rd.partitioner
                if pner != MURMUR3_CLASS:
                    return whole
                samples = [
                    murmur3_token(k)
                    for k, _ in read_summary(
                        rd.path("Summary"), extra_header=vcode >= V_KA
                    )
                ]
            else:
                samples = _summary_tokens(self.directory, gen)
        except (FileNotFoundError, ValueError, OSError):
            return whole
        if len(samples) <= 1:
            return whole
        step = max(1, len(samples) // self.splits)
        bounds = [samples[i] for i in range(step, len(samples), step)][
            : self.splits - 1
        ]
        edges: list[tuple[int | None, int | None]] = []
        prev: int | None = None
        for b in bounds:
            edges.append((prev, b))
            prev = b
        edges.append((prev, None))
        return [
            RunSlice(self.directory, gen, s, e, self.verify, self.layout, name)
            for s, e in edges
        ]

    def initialOffset(self):
        return {"max_gen": 0}

    def latestOffset(self):
        gens = sorted(self._gen_names())
        latest = max(gens) if gens else 0
        if self.max_gens > 0:
            floor = max(self._floor, self._committed)
            capped = [g for g in gens if g > floor][: self.max_gens]
            latest = max(capped) if capped else floor
        return {"max_gen": latest}

    def partitions(self, start, end):
        lo, hi = start["max_gen"], end["max_gen"]
        # planned-through watermark: the admission floor advances here
        # (once per planned batch), keeping latestOffset idempotent
        # between plannings
        self._committed = max(self._committed, lo)
        self._floor = max(self._floor, lo, hi)
        names = self._gen_names()
        return [
            part
            for gen in sorted(names)
            if lo < gen <= hi  # hi < lo (stale floor after restart) -> empty
            for vcode, name in names[gen]
            for part in self._slices_for(gen, vcode, name)
        ]

    def read(self, part: RunSlice):
        return SSTableRunReader.read(self, part)  # same per-slice scan

    def commit(self, end):
        self._committed = max(self._committed, end["max_gen"])


def _install_run(tmp_dir: str, directory: str, final_gen: int) -> None:
    """Move a task-written temp run into place as <final_gen>-*.db.
    Data.db is renamed LAST: discover_runs keys on it, so a concurrent
    reader (the streaming source polls the directory) never sees a run
    whose sidecars are still missing.  Existing files are replaced
    (replayed-epoch idempotence for the stream writer)."""
    import os
    import shutil

    files = sorted(os.listdir(tmp_dir), key=lambda f: f.endswith("-Data.db"))
    for f in files:
        comp = f.split("-", 1)[1]
        dst = os.path.join(directory, f"{final_gen}-{comp}")
        if os.path.exists(dst):
            os.remove(dst)
        os.rename(os.path.join(tmp_dir, f), dst)
    shutil.rmtree(tmp_dir, ignore_errors=True)


def _install_ma_sstable(tmp_dir: str, directory: str, final_gen: int) -> None:
    """Move a task-written temp ma sstable (ma-1-big-*.db) into place as
    ma-<final_gen>-big-*.db.  Data.db last, same visibility discipline
    as _install_run (discovery keys on Data.db)."""
    import os
    import shutil

    files = sorted(os.listdir(tmp_dir), key=lambda f: f.endswith("-Data.db"))
    for f in files:
        comp = f.split("-big-", 1)[1]
        dst = os.path.join(directory, f"ma-{final_gen}-big-{comp}")
        if os.path.exists(dst):
            os.remove(dst)
        os.rename(os.path.join(tmp_dir, f), dst)
    shutil.rmtree(tmp_dir, ignore_errors=True)


class RunCommit(WriterCommitMessage):
    def __init__(self, tmp_dir: str, n_parts: int):
        self.tmp_dir = tmp_dir
        self.n_parts = n_parts


class SSTableRunWriter(DataSourceWriter):
    """Write side of the run source: `df.write.format("sstable_run")`.

    Each task sorts its partition's cells into (token, key) order and
    writes ONE run into a task-private temp directory; the driver-side
    commit renames temp runs to sequential final generations, and abort
    removes them — task retries can never leave half-written runs visible
    (the DataSource-API analog of the reference's resumable, idempotent
    sink contract).  Local-FS rename commit; a cloud deployment would
    swap in a manifest committer.

    Expected input schema (the EAV cell stream, reader-symmetric):
      key string, col_name string?, value binary?, ts long,
      ttl int?, expiration long?, deleted bool, range_tomb bool,
      row_tomb_ts long?  [+ optional ck binary?, ck_end binary?,
      incl_mask int? — clustered real-ma streams]

    layout=ma is CLUSTERING-AWARE: when the stream carries non-NULL ck
    values (or ck-bounded range-tombstone rows, range_tomb + NULL
    col_name), the task writes a clustered real sstable — ck cells land
    in their clustering row, NULL-ck columns become the table's STATIC
    columns, and ck range tombstones become real markers — so a
    clustered table read through layout=ma compacts back OUT through
    layout=ma without losing its structure."""

    def __init__(self, options, overwrite: bool):
        self.directory = options.get("path")
        if not self.directory:
            raise ValueError("sstable_run write requires a path")
        self.overwrite = overwrite
        # layout "ma": each task writes a REAL Cassandra 3.x ma sstable
        # (ma_format.MaWriter) instead of an engine-native SGR run — the
        # engine can then hand its compaction output back to any tool
        # that reads actual SSTables
        self.layout = options.get("layout", "sgr")
        # typed clustering spec for layout=ma (comma-separated marshal
        # type names, e.g. "Int32Type,UTF8Type"): multi-/typed-ck streams
        # carry composite ck bytes that must be decomposed and re-encoded
        # per component — without the spec the writer infers a single
        # UTF8Type clustering column (the pre-round-7 behavior)
        self.clustering_spec = [
            s for s in (options.get("clustering") or "").split(",") if s
        ]
        # typed column spec for layout=ma ("name:MapType(UTF8Type,
        # UTF8Type);other:SetType(UTF8Type)"): collection columns must
        # re-declare their marshal type so the writer re-emits the
        # complex-cell block; unlisted columns default to UTF8Type
        # (simple).  ';'-separated because collection types contain ','.
        self.column_spec = dict(
            s.split(":", 1)
            for s in (options.get("columns") or "").split(";")
            if ":" in s
        )

    def write(self, rows):
        import os
        import uuid

        from .format import Cell, Partition, RangeTomb, RunWriter

        tmp = os.path.join(self.directory, f".tmp-{uuid.uuid4().hex[:12]}")
        os.makedirs(tmp, exist_ok=True)
        parts: dict[bytes, Partition] = {}
        for r in rows:
            key = r.key.encode("utf-8") if isinstance(r.key, str) else bytes(r.key)
            p = parts.get(key)
            if p is None:
                p = parts[key] = Partition(key=key)
            r_ck = getattr(r, "ck", None)
            if (
                r.col_name is not None
                and getattr(r, "range_tomb", False)
                and getattr(r, "incl_mask", None) == 5
            ):
                # complex-column deletion (collection clear)
                if self.layout != "ma":
                    raise ValueError(
                        "sgr runs cannot store complex-column deletions; "
                        "write with layout=ma"
                    )
                p.complex_tombs.append(
                    (bytes(r_ck) if r_ck is not None else None, r.col_name, r.ts)
                )
                continue
            if r.col_name is None:
                if getattr(r, "range_tomb", False):
                    # ck-bounded range tombstone (real clustered ma)
                    if self.layout != "ma":
                        raise ValueError(
                            "sgr runs cannot store ck-bounded range "
                            "tombstones; write with layout=ma"
                        )
                    mask = getattr(r, "incl_mask", None) or 0
                    if mask == 4:
                        # static-row deletion (NULL bounds, mask 4)
                        p.static_tomb_ts = max(p.static_tomb_ts or r.ts, r.ts)
                        continue
                    r_ck_end = getattr(r, "ck_end", None)
                    p.range_tombs.append(
                        RangeTomb(
                            bytes(r_ck) if r_ck is not None else None,
                            bool(mask & 1),
                            bytes(r_ck_end) if r_ck_end is not None else None,
                            bool(mask & 2),
                            r.ts,
                        )
                    )
                else:
                    p.row_tomb_ts = max(p.row_tomb_ts or r.ts, r.ts)
            else:
                if self.layout == "ma" and r.range_tomb:
                    raise ValueError(
                        "layout=ma cannot express name-bounded range "
                        "tombstones (an ma marker covers the whole "
                        "partition); rewrite them as point or row "
                        "tombstones before writing"
                    )
                r_path = getattr(r, "path", None)
                p.cells.append(
                    Cell(
                        col_name=r.col_name,
                        value=bytes(r.value) if r.value is not None else b"",
                        ts=r.ts,
                        ttl=r.ttl,
                        expiration=r.expiration,
                        deleted=bool(r.deleted),
                        range_tomb=bool(r.range_tomb),
                        ck=bytes(r_ck) if r_ck is not None else None,
                        path=bytes(r_path) if r_path is not None else None,
                    )
                )
        if not parts:
            os.rmdir(tmp)
            return RunCommit("", 0)
        if self.layout == "ma":
            from .ma_format import MaWriter

            clustered = (
                any(c.ck is not None for p in parts.values() for c in p.cells)
                or any(p.range_tombs for p in parts.values())
                or bool(self.clustering_spec)
            )
            reg = sorted(
                {
                    c.col_name
                    for p in parts.values()
                    for c in p.cells
                    if not clustered or c.ck is not None
                }
                | {
                    cname
                    for p in parts.values()
                    for _ck, cname, _ts in p.complex_tombs
                }
            )
            static = sorted(
                {
                    c.col_name
                    for p in parts.values()
                    for c in p.cells
                    if clustered and c.ck is None
                }
            )
            both = set(reg) & set(static)
            if both:
                raise ValueError(
                    f"layout=ma: columns appear with AND without a ck "
                    f"(cannot be both clustered and static): {sorted(both)}"
                )
            clustering = (
                (self.clustering_spec or ["UTF8Type"]) if clustered else None
            )
            with_path = {
                c.col_name
                for p in parts.values()
                for c in p.cells
                if c.path is not None
            } | {
                cname
                for p in parts.values()
                for _ck, cname, _ts in p.complex_tombs
            }

            def ctype(name: str) -> str:
                spec = self.column_spec.get(name)
                if spec is not None:
                    return spec
                # path-bearing columns are complex; without a spec the
                # map-of-text default keeps path+value bytes verbatim
                return "MapType(UTF8Type,UTF8Type)" if name in with_path else "UTF8Type"

            w = MaWriter(
                tmp,
                1,
                [(c, ctype(c)) for c in reg],
                clustering=clustering,
                static_columns=[(c, ctype(c)) for c in static],
            )
        else:
            w = RunWriter(tmp, 1)
        multi_ck = self.layout == "ma" and len(self.clustering_spec) > 1
        if multi_ck:
            # multi-ck streams carry COMPOSITE ck bytes (the reader's
            # normalized form): decompose back into component tuples so
            # the writer re-encodes each per its marshal type
            from .format import decode_composite

            for p in parts.values():
                for c in p.cells:
                    if c.ck is not None:
                        c.ck = tuple(decode_composite(c.ck))
                p.range_tombs = [
                    RangeTomb(
                        tuple(decode_composite(r.start)) if r.start is not None else None,
                        r.start_incl,
                        tuple(decode_composite(r.end)) if r.end is not None else None,
                        r.end_incl,
                        r.ts,
                    )
                    for r in p.range_tombs
                ]
        for p in sorted(parts.values(), key=lambda p: (p.token, p.key)):
            p.cells.sort(
                key=lambda c: (
                    (b"".join(c.ck) if isinstance(c.ck, tuple) else c.ck) or b"",
                    c.col_name,
                    c.ts,
                )
            )
            w.add(p)
        w.finish()
        return RunCommit(tmp, len(parts))

    def commit(self, messages):
        import glob
        import os

        if self.layout == "ma":
            from .old_format import discover_cassandra_sstables

            if self.overwrite:
                for _v, _g, name in discover_cassandra_sstables(self.directory):
                    prefix = name[: -len("Data.db")]
                    for f in glob.glob(os.path.join(self.directory, prefix + "*.db")):
                        os.remove(f)
                gen = 0
            else:
                gens = [g for _v, g, _n in discover_cassandra_sstables(self.directory)]
                gen = max(gens) if gens else 0
            for m in messages:
                if m is None or not m.tmp_dir:
                    continue
                gen += 1
                _install_ma_sstable(m.tmp_dir, self.directory, gen)
            return
        if self.overwrite:
            for f in glob.glob(os.path.join(self.directory, "*-*.db")):
                os.remove(f)
            gen = 0
        else:
            existing = discover_runs(self.directory)
            gen = max(existing) if existing else 0  # append AFTER current runs
        for m in messages:
            if m is None or not m.tmp_dir:
                continue
            gen += 1
            _install_run(m.tmp_dir, self.directory, gen)

    def abort(self, messages):
        import shutil

        for m in messages:
            if m is not None and m.tmp_dir:
                shutil.rmtree(m.tmp_dir, ignore_errors=True)


class SSTableRunStreamWriter(DataSourceStreamWriter):
    """Streaming write side: each microbatch's tasks write temp runs and
    the per-epoch commit renames them into place (exactly-once per batch
    under checkpointed re-execution: a replayed epoch re-writes temp dirs
    and the rename commit is idempotent per batch id).  Together with the
    stream reader this closes the loop: continuous ingest -> transform ->
    continuous sorted-run output (the reference's steady-state operation)."""

    def __init__(self, options):
        self._w = SSTableRunWriter(options, overwrite=False)
        self.directory = self._w.directory

    def write(self, rows):
        return self._w.write(rows)

    def commit(self, messages, batchId: int) -> None:
        # replay idempotence: a partially-committed earlier attempt of this
        # epoch may have installed MORE runs than this attempt produces
        # (AQE/repartition nondeterminism changes the non-empty task set),
        # so first clear the epoch's whole gen range — otherwise leftover
        # higher-gen runs from the failed attempt double-count downstream
        import glob as _glob
        import os

        lo, hi = batchId * 1_000_000 + 1, (batchId + 1) * 1_000_000
        for f in _glob.glob(os.path.join(self.directory, "*-*.db")):
            try:
                g = int(os.path.basename(f).split("-")[0])
            except ValueError:
                continue
            if lo <= g < hi:
                os.remove(f)
        gen = 0
        for m in messages:
            if m is None or not m.tmp_dir:
                continue
            gen += 1
            # 1e6 per epoch: no cross-epoch collision below a million
            # non-empty tasks per microbatch (cap is 4096 partitions/stage)
            _install_run(m.tmp_dir, self.directory, batchId * 1_000_000 + gen)

    def abort(self, messages, batchId: int) -> None:
        self._w.abort(messages)


class SSTableRunDataSource(DataSource):
    @classmethod
    def name(cls):
        return "sstable_run"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SSTableRunReader(self.options)

    def streamReader(self, schema):
        return SSTableRunStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return SSTableRunWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return SSTableRunStreamWriter(self.options)


def register(spark) -> None:
    """Register the source (idempotent) and enable Python-source filter
    pushdown — runtime-settable, so this works on any caller session."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SSTableRunDataSource)
