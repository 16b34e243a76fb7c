"""CLI — the reference binary's surface, Spark-first.

Mirrors the getopt surface of Cassandra2Aerospike.cpp:41-62 (usage) and
73-231 (parse_arguments), so a user of the reference can run the same
job shapes against SSTable-style run directories:

    python -m cassandra2aerospike_spark \\
        -i RUNS_DIR [-i DIR2 ...]      # input tables (S1 discovery)
        [-D]                           # dry run: print records (S13)
        [-o OUT_DIR]                   # create-only KV sink dir (S11; the
                                       #   parquet stand-in for a live
                                       #   aerospike cluster)
        [-S HEXKEY | -s KEY]           # resume from hex / raw key string
                                       #   (reference firstKey semantics);
                                       #   --token N resumes from a raw
                                       #   token value (O2/O3/O4)
        [-L MIN_TTL]                   # minimum-TTL cutoff, default 1 (F3)
        [-f]                           # first-expiring expiry fold (A4)
        [-x]                           # eternal records get the namespace
                                       #   default TTL, not never-expire (F4)
        [-C]                           # disable chunk checksums (S5 -C)
        [-e N]                         # parallelism (event loops -> shuffle
                                       #   partitions)
        [-n NS] [-t SET]               # namespace/set: with -h, the wire
                                       #   client's namespace/set; with -o,
                                       #   the sink subdirectory
        [-h HOST[:PORT] ...]           # ROUND 9: without -o, records write
                                       #   through the REAL Aerospike wire
                                       #   protocol (sinks/aerospike_wire:
                                       #   AS_MSG v2, RIPEMD-160 digests,
                                       #   CREATE-only, pipelined TCP).
                                       #   ROUND 11: several -h hosts =
                                       #   a CLUSTER — the partition map
                                       #   is discovered over the info
                                       #   channel and puts route by
                                       #   digest partition; with -o,
                                       #   the parquet sink wins (warned)
        [-a N]                         # async in-flight window per task
                                       #   (applied: the bounded-async
                                       #   writer's pipeline depth, S12)
        [-u USER] [-p PASSWORD]        # ROUND 11: cluster security — the
                                       #   wire client LOGINs with user +
                                       #   bcrypt credential before any
                                       #   put (a port rides on -h
                                       #   host:port); ignored with a
                                       #   note on the parquet sink
        [-V]                           # print version and exit (reference
                                       #   optstring uses capital V)
        [--now EPOCH_S]                # pin 'now' for expiry (tests)
        [--limit N]                    # dry-run record cap, default 20
        [--since EPOCH_US]             # ROUND 10: incremental sync — ship
                                       #   only records whose newest
                                       #   event (cell OR tombstone) is
                                       #   > T (the s31 created/updated
                                       #   set: tombstone-only updates
                                       #   re-ship the surviving record)
        [--verify]                     # ROUND 11: after the wire sink
                                       #   pass, read every record back
                                       #   (info1 READ) and compare bins
                                       #   + ttl — exit 1 on mismatch
        [--batch-verify]               # ROUND 13: --verify over the wire
                                       #   BATCH-INDEX op — per-node digest
                                       #   batches (the real client's
                                       #   batch-node split) instead of
                                       #   pipelined single gets; round
                                       #   trips per task ~ nodes, not
                                       #   records (implies --verify)
        [--compress]                   # ROUND 13: client compression —
                                       #   data frames >= 128 B ship in
                                       #   the COMPRESSED proto envelope
                                       #   (type 4, zlib) on every wire
                                       #   path: sink, verify, backup,
                                       #   restore (enable_compression)
        [--asof EPOCH_US]              # ROUND 10: point-in-time run —
                                       #   merge only writes at ts <= T,
                                       #   expiry evaluated AT T (the
                                       #   s30_asof_merge semantics; the
                                       #   reference always merges to
                                       #   latest)
        [--backup DIR]                 # ROUND 13: asbackup job — scan the
                                       #   -h cluster (generation-checked
                                       #   partition-range sweeps; survives
                                       #   concurrent migrations) into a
                                       #   keyless digest-addressed .asb
                                       #   file series (no -i inputs)
        [--page-records N]             # ROUND 16: paged backup scans —
                                       #   each (range, node) stream reads
                                       #   in N-record pages on fresh
                                       #   connections with the digest-
                                       #   cursor resume; task memory is
                                       #   one page (absent = unbounded)
        [--restore DIR]                # ROUND 13: asrestore job — .asb
                                       #   series -> digest-addressed puts
                                       #   routed by the cluster's own
                                       #   discovered map; --verify then
                                       #   re-scans and compares digest +
                                       #   bins + ttl (exit 1 on mismatch)

Every reference flag is accepted, so a migrating invocation runs
unmodified; help moved to --help because the reference uses -h for
hosts.

Exit report mirrors the reference's end-of-run accounting + resume hint
(Cassandra2Aerospike.cpp:376-401).
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import DataFrame, functions as F


def _dir_layouts(dirs: list[str]) -> list[str]:
    """S1/S3 per directory: "ma" when it holds real Cassandra sstables
    (any era's *-Data.db naming — the CLI then points at an actual table
    dir exactly like the reference binary, CassandraParser.cpp:108-135),
    "sgr" for engine-native runs."""
    from .sources.sstable.old_format import discover_cassandra_sstables

    return ["ma" if discover_cassandra_sstables(d) else "sgr" for d in dirs]


def _classified_binary(
    spark,
    dirs: list[str],
    verify: bool,
    min_token: int | None,
    layouts: list[str] | None = None,
):
    """Multi-dir run scan -> classified EAV frame with BINARY values and
    hex keys (the reference treats every value as an opaque blob,
    README.md:39)."""
    from .sources.sstable.datasource import register

    register(spark)
    if layouts is None:
        layouts = _dir_layouts(dirs)
    frames = []
    for d, layout in zip(dirs, layouts):
        rd = (
            spark.read.format("sstable_run")
            .option("verify_checksums", "true" if verify else "false")
            .option("layout", layout)
            .load(d)
        )
        frames.append(rd)
    raw = frames[0]
    for f in frames[1:]:
        raw = raw.unionByName(f)
    if min_token is not None:
        # O2: pushFilters prunes runs via Statistics + seeks via
        # Summary/Index before Spark re-applies the predicate
        raw = raw.filter(F.col("token") >= F.lit(min_token))
    kind = (
        F.when(F.col("col_name").isNull(), F.lit("row"))
        .when(F.col("range_tomb"), F.lit("range"))
        .when(F.col("deleted"), F.lit("point"))
        .otherwise(F.lit("cell"))
    )
    # clustered real tables: qualify the column with its clustering
    # prefix (see fixtures.classified_from_ma) so the per-(key, col)
    # merge stays row-scoped instead of collapsing across ck
    qual_col = F.when(
        F.col("ck").isNotNull(),
        F.concat(F.col("ck").cast("string"), F.lit(":"), F.col("col_name")),
    ).otherwise(F.col("col_name"))
    return raw.select(
        F.lower(F.hex(F.col("key"))).alias("key"),
        F.col("token"),
        qual_col.alias("col_name"),
        F.col("value"),
        "ts",
        "ttl",
        "expiration",
        kind.alias("kind"),
    )


def _merge(classified: DataFrame, first_expiring: bool) -> DataFrame:
    """The reference's one query over binary cells: F1 liveness -> A1
    LWW -> A5 record assembly (+A4 expiry fold).  Records come out as
    (key, token, cells array<struct<col_name, value>>, expiry, n_cols) —
    an ARRAY, not a map, so downstream set ops stay orderable."""
    from .operators.merge import _record_expiry, live_cells_from_classified, lww_latest

    live = live_cells_from_classified(classified.drop("token"))
    latest = lww_latest(live)
    # per-key token + newest CLASSIFIED event (cells AND tombstones) —
    # the --since incremental cursor (dropped again in main() before any
    # sink/print, so the record shape every sink sees is unchanged).
    # Tombstone timestamps count: a record whose only post-T event is a
    # column deletion (surviving cells all older than T) has CHANGED
    # since T and must re-ship, or the incremental run diverges from
    # full-minus-unchanged (round-11 advice fix; max over surviving
    # cells only silently skipped those)
    toks = classified.groupBy("key").agg(
        F.max("token").alias("token"),
        F.max("ts").alias("last_write_us"),
    )
    recs = latest.groupBy("key").agg(
        F.sort_array(F.collect_list(F.struct("col_name", "value"))).alias("cells"),
        _record_expiry(first_expiring).cast("long").alias("expiry"),
        F.count("*").alias("n_cols"),
    )
    return recs.join(toks, "key")


def _display_value(v: bytes) -> str:
    """Printable passthrough / hex fallback (Utilities.cpp:20-39, used by
    the reference dry run for non-printable blobs)."""
    if v is None:
        return ""
    try:
        s = v.decode("ascii")
        if all(32 <= ord(c) < 127 for c in s):
            return s
    except UnicodeDecodeError:
        pass
    return "0x" + v.hex()


def _backup_restore(args, p) -> int:
    """The asbackup/asrestore job shapes over the wire cluster (round
    13 — the operational loop the reference binary cannot run, having
    no read path):

      --backup DIR:  generation-checked partition-sliced scan of the
        -h cluster -> KEYLESS digest-addressed .asb files in DIR (the
        s44 sweep protocol: a range whose node generations moved
        mid-sweep restarts idempotently, so a concurrent migration
        cannot duplicate or drop records).
      --restore DIR: read the .asb series -> digest-addressed puts
        routed by the cluster's OWN discovered partition map, riding
        the -a bounded-async window; with --verify, re-scan the
        cluster afterwards and compare digest+bins+ttl against the
        backup (exit 1 on any mismatch)."""
    import time as _time

    from pyspark.sql import functions as F

    from .session import get_spark
    from .sinks.aerospike_wire import (
        N_PARTITIONS,
        WireClient,
        cols_str_to_bins,
        fetch_partition_map,
        partition_id,
    )
    from .sinks.asb_backup import read_asb_scan, write_asb_scan
    from .sinks.kv_sink import bounded_async_foreach_writer

    nodes = []
    for hp in args.hosts:
        h_, _, port_s = hp.partition(":")
        nodes.append((h_, int(port_s) if port_s else 3000))
    ns = args.namespace or "test"
    set_name = args.set_name or "records"
    user = args.username
    credential = None
    if user:
        from .sinks.bcrypt_py import hashpw

        credential = hashpw(args.password or "")
    now_s = args.now_s if args.now_s is not None else int(_time.time())
    compress_min = 128 if args.compress else None
    page_records = args.page_records
    spark = get_spark("cassandra2aerospike")
    if args.parallelism:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.parallelism))
    n_ranges = max(1, args.parallelism or 8)
    span = N_PARTITIONS // n_ranges
    sc = spark.sparkContext
    backup_fexp = parse_filter_predicate(args.backup_filter)

    def sweep():
        """Generation-checked pid-range sweep of the cluster (the s44
        protocol) -> (DataFrame, restart accumulator)."""
        import pandas as pd

        acc_restart = sc.accumulator(0)
        ranges_df = spark.createDataFrame(
            [
                (r, r * span, span if r < n_ranges - 1 else N_PARTITIONS - r * span)
                for r in range(n_ranges)
            ],
            "rng int, begin int, count int",
        ).repartition(n_ranges, "rng")

        def scan_range(batches):
            def tend_gens():
                return [fetch_partition_map(h, p_, ns)[0] for h, p_ in nodes]

            for pdf in batches:
                for begin, count in zip(pdf["begin"], pdf["count"]):
                    for _attempt in range(8):
                        gens = tend_gens()
                        rows = []
                        for h, p_ in nodes:
                            # --page-records: read the stream in pages
                            # with the digest-cursor resume (round 16)
                            # — task memory bounded by the page, each
                            # page its own connection; the generation
                            # check still wraps the WHOLE range attempt
                            cursor = None
                            while True:
                                c = WireClient(
                                    h, p_, ns, set_name,
                                    user=user, credential=credential,
                                    compress_min=compress_min,
                                )
                                page = list(
                                    c.scan(
                                        int(begin), int(count),
                                        filter_exp=backup_fexp,
                                        resume_digest=cursor,
                                        max_records=page_records,
                                    )
                                )
                                c.close()
                                for digest, ttl, bins in page:
                                    rows.append(
                                        (
                                            digest.hex(),
                                            ",".join(
                                                sorted(
                                                    f"{n}={v.decode()}"
                                                    for n, v in bins.items()
                                                )
                                            ),
                                            int(ttl),
                                        )
                                    )
                                if not page_records or len(page) < page_records:
                                    break
                                cursor = page[-1][0]
                        if tend_gens() == gens:
                            break
                        acc_restart.add(1)
                    else:
                        raise RuntimeError(
                            "backup scan range never stabilized"
                        )
                    yield pd.DataFrame(
                        {
                            "digest_hex": [r[0] for r in rows],
                            "cols_str": [r[1] for r in rows],
                            "ttl": [r[2] for r in rows],
                        }
                    )

        return (
            ranges_df.mapInPandas(
                scan_range, "digest_hex string, cols_str string, ttl long"
            ),
            acc_restart,
        )

    t0 = _time.time()
    if args.backup_dir:
        scanned, acc_restart = sweep()
        scanned = scanned.cache()
        n = scanned.count()
        write_asb_scan(
            scanned, args.backup_dir, ns, set_name, now_s,
            n_files=max(4, n_ranges // 2),
        )
        scanned.unpersist()
        print(
            f"# backup: {n} records -> {args.backup_dir}  "
            f"({n_ranges} partition ranges, {acc_restart.value} "
            f"mid-migration restarts, {_time.time() - t0:.1f}s)"
        )
        return 0

    # ---- restore ----
    restore_stream = read_asb_scan(
        spark, args.restore_dir, ns, set_name, now_s
    )
    pmap = [-1] * N_PARTITIONS
    for idx, (h_, p_) in enumerate(nodes):
        _gen, owned = fetch_partition_map(h_, p_, ns)
        for pt in owned:
            pmap[pt] = idx
    if any(x == -1 for x in pmap):
        p.error("restore cluster: partition map has unowned partitions")
    acc_ok, acc_exists = sc.accumulator(0), sc.accumulator(0)
    state: dict = {}

    def put(rd):
        cl = state.get("clients")
        if cl is None:
            cl = state["clients"] = [
                WireClient(
                    h_, p_, ns, set_name, user=user,
                    credential=credential, compress_min=compress_min,
                )
                for h_, p_ in nodes
            ]
        digest = bytes.fromhex(rd["digest_hex"])
        c = cl[pmap[partition_id(digest)]]
        return (
            c.put_digest(digest, cols_str_to_bins(rd["cols_str"]), int(rd["ttl"])),
            c,
        )

    def wait(h):
        handle, c = h
        d = c.wait(handle)
        if d == "ok":
            acc_ok.add(1)
            return True
        if d == "exists":
            acc_exists.add(1)  # create-only: a re-run restore is idempotent
            return True
        if d == "retry":
            return False
        raise RuntimeError(f"restore: unexpected disposition {d}")

    bounded_async_foreach_writer(
        restore_stream.repartition(max(4, n_ranges // 2)), put, wait,
        max_in_flight=args.max_async,
    )
    print(
        f"# restore: {acc_ok.value} records written, {acc_exists.value} "
        f"already existing <- {args.restore_dir}  ({_time.time() - t0:.1f}s)"
    )
    if args.verify_sink:
        scanned, _acc = sweep()
        backup = read_asb_scan(spark, args.restore_dir, ns, set_name, now_s)
        vstats = (
            backup.alias("a")
            .join(scanned.alias("b"), "digest_hex", "full_outer")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    (
                        F.col("a.cols_str").eqNullSafe(F.col("b.cols_str"))
                        & F.col("a.ttl").eqNullSafe(F.col("b.ttl"))
                    ).cast("long")
                ).alias("n_equal"),
            )
            .first()
        )
        mism = vstats["n"] - vstats["n_equal"]
        print(f"# verify: {vstats['n_equal']} records match the backup, {mism} mismatches")
        if mism:
            print("# VERIFY FAILED", file=sys.stderr)
            return 1
    return 0


def parse_filter_predicate(text: str | None):
    """`--filter` grammar -> an expression AST for the scan's
    FIELD_FILTER_EXP slot (asbackup's filter-exp concept): a partial
    backup ships only the records the SERVER matched.  Forms:
    'bin>=N' / 'bin<=N' (integer bin), 'bin==STR' (blob equality),
    'bin exists'.  None passes everything (a full backup)."""
    import re as _re

    if text is None:
        return None
    m = _re.fullmatch(r"\s*(\w+)\s+exists\s*", text)
    if m:
        from .sinks.aerospike_wire import exp_bin_exists

        return exp_bin_exists(m.group(1))
    m = _re.fullmatch(r"\s*(\w+)\s*(>=|<=|==)\s*(.+?)\s*", text)
    if not m:
        raise SystemExit(f"bad --filter {text!r}: want bin>=N, bin<=N, "
                         "bin==STR or 'bin exists'")
    name, op, val = m.groups()
    if op == "==":
        return ("cmp", "eq", ("bin_blob", name), ("blob", val.encode()))
    try:
        n = int(val)
    except ValueError:
        raise SystemExit(f"bad --filter {text!r}: {op} needs an integer")
    return ("cmp", "ge" if op == ">=" else "le", ("bin_int", name), ("int", n))


def main(argv: list[str] | None = None) -> int:
    from .operators.merge import ETERNAL, filter_expired
    from .session import get_spark

    # add_help=False: the reference uses -h for aerospike hosts, so help
    # moves to --help (added back explicitly below)
    p = argparse.ArgumentParser(prog="cassandra2aerospike_spark", add_help=False)
    p.add_argument("-i", dest="inputs", action="append")
    p.add_argument("-D", dest="dry_run", action="store_true")
    p.add_argument("-o", dest="out_dir")
    # reference-surface flags a migrating invocation WILL pass
    # (Cassandra2Aerospike.cpp:41-62): -n/-t namespace the sink directory
    # (the parquet analog of aerospike namespace/set); -h/-u/-p have no
    # parquet analog and are accepted with a warning; -a is the bounded
    # writer's in-flight window (sinks.bounded_async_foreach_writer) —
    # the parquet sink path is synchronous per task, so it is recorded,
    # not applied; -v prints the version and exits
    p.add_argument("-n", dest="namespace")
    p.add_argument("-t", dest="set_name")
    p.add_argument("-h", dest="hosts", action="append")
    p.add_argument("-u", dest="username")
    p.add_argument("-p", dest="password")
    p.add_argument("-a", dest="max_async", type=int, default=100)
    p.add_argument("-V", "-v", dest="version", action="store_true")
    p.add_argument("--help", action="help")
    p.add_argument("-S", dest="resume_hex")
    # reference -s is a RAW KEY STRING (firstKey = optarg,
    # Cassandra2Aerospike.cpp:122-124), hashed to its token; --token
    # resumes from an explicit token value (the resume-hint round trip)
    p.add_argument("-s", dest="resume_key")
    p.add_argument("--token", dest="resume_token", type=int)
    p.add_argument("-L", dest="min_ttl", type=int, default=1)
    p.add_argument("-f", dest="first_expiring", action="store_true")
    p.add_argument("-x", dest="prohibit_eternal", action="store_true")
    p.add_argument("-C", dest="no_checksums", action="store_true")
    p.add_argument("-e", dest="parallelism", type=int)
    p.add_argument("--now", dest="now_s", type=int, default=None)
    p.add_argument("--limit", dest="limit", type=int, default=20)
    p.add_argument("--asof", dest="asof_us", type=int, default=None)
    p.add_argument("--verify", dest="verify_sink", action="store_true")
    p.add_argument(
        "--batch-verify", dest="batch_verify", action="store_true"
    )
    p.add_argument("--compress", dest="compress", action="store_true")
    p.add_argument("--since", dest="since_us", type=int, default=None)
    # round 13: the asbackup/asrestore job shapes over -h clusters
    p.add_argument("--batch-write", dest="batch_write", action="store_true")
    p.add_argument("--backup", dest="backup_dir", default=None)
    p.add_argument("--filter", dest="backup_filter", default=None)
    # round 16: paged backup scans — digest-cursor resume, one page per
    # connection, task memory bounded by the page (0/absent = unbounded)
    p.add_argument("--page-records", dest="page_records", type=int, default=None)
    p.add_argument("--restore", dest="restore_dir", default=None)
    args = p.parse_args(argv)
    if args.batch_verify:
        args.verify_sink = True

    if args.version:
        print("cassandra2aerospike_spark 0.4 (spark-graft)")
        return 0
    if args.backup_dir or args.restore_dir:
        if args.backup_dir and args.restore_dir:
            p.error("--backup and --restore are mutually exclusive")
        if not args.hosts:
            p.error("--backup/--restore operate on a -h cluster")
        if args.inputs:
            p.error("--backup/--restore take no -i inputs (cluster <-> files)")
        return _backup_restore(args, p)
    if not args.inputs:
        p.error("at least one -i <run directory> is required")
    if (args.username or args.password) and (not args.hosts or args.out_dir):
        # the wire path is not taken (no -h, or -o wins): the parquet /
        # dry-run sinks have no auth, so -u/-p are ignored with a note;
        # WITH a live wire sink the credentials drive the real LOGIN
        # handshake below
        print(
            "# note: -u/-p (cluster auth) ignored — no wire sink in this "
            "invocation",
            file=sys.stderr,
        )
    if args.hosts and args.out_dir:
        print(
            "# note: both -h and -o given; -o wins — records go to the "
            "parquet KV sink, not the aerospike wire client",
            file=sys.stderr,
        )
    if (args.namespace or args.set_name) and args.out_dir:
        # aerospike namespace/set -> sink subdirectory (the parquet analog)
        import os as _os

        args.out_dir = _os.path.join(
            args.out_dir, args.namespace or "default", args.set_name or "default"
        )

    # -s/-S hash the key into the INPUT's token space: real Cassandra
    # directories order by Murmur3, engine-native SGR runs by the md5
    # analog — hashing with the wrong partitioner would resume at an
    # unrelated ring position and silently skip records (the same hazard
    # the all-digit -s note guards).  Mixed real+SGR inputs have no
    # common token space, so a keyed resume is refused — BEFORE the
    # Spark session spins up (the check needs only argv + a listdir).
    layouts = _dir_layouts(args.inputs)
    real_flags = [lay == "ma" for lay in layouts]
    if (args.resume_hex is not None or args.resume_key is not None) and (
        any(real_flags) and not all(real_flags)
    ):
        p.error(
            "-s/-S cannot resume across mixed input token spaces (real "
            "Cassandra dirs use Murmur3, SGR runs use md5); pass --token N"
        )

    spark = get_spark("cassandra2aerospike")
    if args.parallelism:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.parallelism))

    def token_of(key: bytes) -> int:
        if all(real_flags):
            from .functions.tokens import murmur3_128_h1

            return murmur3_128_h1(key)
        from .sources.sstable.format import token_of as _md5_token

        return _md5_token(key)

    min_token = None
    if args.resume_hex is not None:
        min_token = token_of(bytes.fromhex(args.resume_hex))
    elif args.resume_key is not None:
        if args.resume_key.isdigit():
            # pre-0.4 resume hints printed '-s <token+1>' with a raw token;
            # -s now takes a KEY STRING (reference firstKey semantics,
            # Cassandra2Aerospike.cpp:122-124) and an old hint would be
            # re-hashed to an unrelated ring position, silently skipping
            # unwritten records
            print(
                "# note: -s now takes a key string and this value is "
                "all digits; pass --token N to resume from a raw token"
            )
        min_token = token_of(args.resume_key.encode("utf-8"))
    elif args.resume_token is not None:
        min_token = args.resume_token

    classified = _classified_binary(
        spark, args.inputs, verify=not args.no_checksums, min_token=min_token,
        layouts=layouts,
    )
    now_s = args.now_s if args.now_s is not None else int(time.time())
    if args.asof_us is not None:
        # --asof T (epoch µs): point-in-time run — merge only cells and
        # tombstones written at or before T, evaluate expiry AT T (the
        # s30_asof_merge semantics; q_s30's docstring documents why the
        # prefix filter lands before any shuffle).  --asof implies
        # now = T; an explicit --now later than T would resurrect
        # records that were alive at T but expired since — refuse the
        # ambiguity instead of guessing.
        if args.now_s is not None and args.now_s != args.asof_us // 1_000_000:
            p.error("--asof already pins 'now' to T; drop --now")
        classified = classified.filter(F.col("ts") <= F.lit(args.asof_us))
        now_s = args.asof_us // 1_000_000
    from pyspark.sql import Observation

    # S14: the expired counter rides the same execution as the sink write
    # (reference end-of-run report, Cassandra2Aerospike.cpp:376-401)
    obs_merged = Observation()
    merged = _merge(classified, args.first_expiring)
    if args.since_us is not None:
        # --since T (epoch µs): INCREMENTAL sync — ship only records
        # whose newest event (cell or tombstone write) is later than T
        # (the s31 created/updated set; full deletes need no shipping to
        # a CREATE-only sink, but a partial delete that leaves the record
        # alive with a SMALLER column set is an update and ships).
        # Records merge over ALL generations first (an old cell can
        # still win LWW), only the ship set is cut — so the output is
        # identical to a full run minus the unchanged records.
        merged = merged.filter(F.col("last_write_us") > F.lit(args.since_us))
    merged = merged.drop("last_write_us").observe(
        obs_merged, F.count(F.lit(1)).alias("n_merged")
    )
    records = filter_expired(merged, now_s=now_s, min_ttl_s=args.min_ttl)
    # F4 TTL policy: -x maps eternal records to the namespace-default TTL
    # instead of never-expire (reference Cassandra2Aerospike.cpp:165-167)
    from .operators.merge import apply_ttl_policy

    records = apply_ttl_policy(
        records, now_s=now_s, prohibit_eternal=args.prohibit_eternal
    )

    if args.dry_run or (not args.out_dir and not args.hosts):
        # S13: deterministic textual dump, reference DryRun.cpp format
        rows = records.orderBy("token", "key").limit(args.limit).collect()
        for r in rows:
            if r.expiry == ETERNAL:
                suffix = " (ttl=default)" if args.prohibit_eternal else ""
            else:
                suffix = f" (timeout={r.expiry})"
            print(f"key={r.key}{suffix}")
            for c in r.cells:
                print(f"  {c.col_name}={_display_value(c.value)}")
        print(f"# dry run: showed {len(rows)} records (limit {args.limit})")
        return 0

    if args.hosts and not args.out_dir:
        # -h host[:port]: write through the REAL wire protocol (round 9)
        # with the reference's own flag semantics — -n namespace,
        # -t set, -a in-flight window (Cassandra2Aerospike.cpp:83-117).
        # CREATE-only + EXISTS-is-not-an-error + transient retry mirror
        # AerospikeWriter.cpp:137-161; write_ttl is already the
        # reference's rec.ttl (apply_ttl_policy).
        from .sinks.aerospike_wire import ClusterRouter, WireClient
        from .sinks.kv_sink import bounded_async_foreach_writer

        nodes = []
        for hp in args.hosts:
            h_, _, port_s = hp.partition(":")
            nodes.append((h_, int(port_s) if port_s else 3000))
        host, port = nodes[0]
        ns = args.namespace or "test"
        set_name = args.set_name or "records"
        # round 11/12: several -h hosts form a CLUSTER — each task
        # DISCOVERS the partition map over the info channel (the C
        # client's cluster tend, ClusterRouter) and routes puts by
        # digest partition, RE-TENDING + re-routing when a node answers
        # PARTITION_UNAVAILABLE (ownership moved mid-run); one host
        # keeps the single-connection path (everything -> node 0).
        # Validate the map driver-side first so a misconfigured cluster
        # (overlap / holes) fails before any executor work.
        clustered = len(nodes) > 1
        if clustered:
            try:
                ClusterRouter(nodes, ns, set_name).close()
            except (ValueError, RuntimeError, OSError) as e:
                p.error(f"cluster partition map: {e}")
        # -u/-p (round 11): precompute the bcrypt credential ONCE on the
        # driver (the C client's one-time as_password_gen_hash) and ship
        # the hash — every task connection then LOGINs over the admin
        # channel before its first put
        credential = None
        if args.username:
            from .sinks.bcrypt_py import hashpw

            credential = hashpw(args.password or "")
        user = args.username
        sc = spark.sparkContext
        compress_min = 128 if args.compress else None
        acc_ok, acc_exists, acc_retry = (sc.accumulator(0) for _ in range(3))
        # accounting via ONE explicit agg pass, NOT observe():
        # foreachPartition executes through the RDD path, which never
        # fires the observation listener — obs.get would block forever
        live_cond = (F.col("expiry") == ETERNAL) | (
            F.col("expiry") >= F.lit(now_s + args.min_ttl)
        )
        stats = merged.agg(
            F.count(F.lit(1)).alias("n_merged"),
            F.count(F.when(live_cond, 1)).alias("n_read"),
            F.max(F.when(live_cond, F.col("token"))).alias("t"),
        ).first()
        sink_input = records.select("key", "token", "cells", "write_ttl")
        state: dict = {}

        def task_router():
            r = state.get("router")
            if r is None:
                r = state["router"] = ClusterRouter(
                    nodes, ns, set_name, user=user, credential=credential,
                    compress_min=compress_min,
                )
            return r

        def put(rd):
            bins = {c_["col_name"]: c_["value"] or b"" for c_ in rd["cells"]}
            k = rd["key"]  # SGR runs decode keys as strings, ma as bytes
            if not isinstance(k, (bytes, bytearray)):
                k = str(k).encode("utf-8")
            k = bytes(k)
            idx = -1
            if clustered:
                r = task_router()
                idx = r.master_idx_for(k)
                c = r.client(idx)
            else:
                c = state.get("client")
                if c is None:
                    c = state["client"] = WireClient(
                        host, port, ns, set_name,
                        user=user, credential=credential,
                        compress_min=compress_min,
                    )
            return c.put(k, bins, int(rd["write_ttl"])), c, k, idx

        def wait(h):
            handle, c, k, idx = h
            d = c.wait(handle)
            if d == "ok":
                acc_ok.add(1)
                return True
            if d == "exists":
                acc_exists.add(1)
                return True
            if d == "unavailable":
                if not clustered:
                    raise RuntimeError(
                        "node answered PARTITION_UNAVAILABLE on a "
                        "single-host run — nothing to re-route to"
                    )
                # cluster changed under us: refresh the map (the C
                # client's tend) so the requeued put re-routes — but
                # only if the map still routes this key at the refusing
                # node (ADVICE r12): a window of in-flight stale puts
                # re-tends once, not once per put
                task_router().retend_if_stale(k, idx)
            acc_retry.add(1)
            return False  # transient: requeued by the bounded window

        if args.batch_write:
            # --batch-write (round 15): the batch-write sink — the same
            # CREATE-only + EXISTS-is-not-an-error migration semantics,
            # but per-record sub-transactions BATCHED BY MASTER NODE
            # (ClusterRouter.batch_operate's batch-node split), so wire
            # round trips per task are bounded by nodes x chunks, not
            # by the record count.  Per-record result codes keep the
            # accounting exact; PARTITION_UNAVAILABLE re-tends inside
            # batch_operate (refusal precedes application, so the
            # re-issue can never double-create).
            from .sinks.aerospike_wire import key_digest

            chunk_rows = max(256, args.max_async * 16)

            def sink_partition(rows):
                router = None
                single = None
                buf: list = []

                def flush():
                    nonlocal router, single
                    if not buf:
                        return
                    items = []
                    seen: set = set()
                    dup_exists = 0
                    for rd in buf:
                        bins = {
                            c_["col_name"]: c_["value"] or b""
                            for c_ in rd["cells"]
                        }
                        k = rd["key"]
                        if not isinstance(k, (bytes, bytearray)):
                            k = str(k).encode("utf-8")
                        dig = key_digest(set_name, bytes(k))
                        if dig in seen:
                            # two rows with one key in a chunk: the
                            # per-record put path answered the later
                            # one EXISTS; batch_operate refuses
                            # duplicate digests outright, so the first
                            # wins and the rest count as exists here
                            # (ADVICE r15)
                            dup_exists += 1
                            continue
                        seen.add(dig)
                        items.append(
                            (
                                dig,
                                [("write", n_, v_) for n_, v_ in bins.items()],
                                int(rd["write_ttl"]),
                                None,
                                True,  # create-only
                            )
                        )
                    buf.clear()
                    if dup_exists:
                        acc_exists.add(dup_exists)
                    if not items:
                        return
                    if clustered:
                        if router is None:
                            router = ClusterRouter(
                                nodes, ns, set_name,
                                user=user, credential=credential,
                                compress_min=compress_min,
                            )
                        got = router.batch_operate(items)
                        results = (got[d] for d, *_ in items)
                    else:
                        if single is None:
                            single = WireClient(
                                host, port, ns, set_name,
                                user=user, credential=credential,
                                compress_min=compress_min,
                            )
                        res = single.batch_write(items)
                        results = (res[i] for i in range(len(items)))
                    for st, _gen, _ttl, _bins in results:
                        if st == "ok":
                            acc_ok.add(1)
                        elif st == "exists":
                            acc_exists.add(1)
                        elif st == "unavailable":
                            raise RuntimeError(
                                "node answered PARTITION_UNAVAILABLE on a "
                                "single-host run — nothing to re-route to"
                            )
                        else:
                            raise RuntimeError(
                                f"batch-write sink: unexpected status {st}"
                            )

                try:
                    for row in rows:
                        buf.append(row)
                        if len(buf) >= chunk_rows:
                            flush()
                    flush()
                finally:
                    # close like the verify paths do at partition end —
                    # long-lived Python workers otherwise leak sockets
                    # (ADVICE r15)
                    if router is not None:
                        router.close()
                    if single is not None:
                        single.close()

            sink_input.foreachPartition(sink_partition)
        else:
            bounded_async_foreach_writer(
                sink_input, put, wait, max_in_flight=args.max_async
            )
        if args.verify_sink:
            # --verify (round 11): read every shipped record back over
            # the wire (info1 READ|GET_ALL) from executor tasks and
            # compare the stored bins against what the merge produced —
            # the migration-proof phase the reference's zero-error
            # count is not.  Mismatches fail the run (exit 1) after the
            # count is reported.
            acc_verified, acc_mismatch = (sc.accumulator(0) for _ in range(2))

            # ADVICE r11: the gets ride the put path's bounded-async
            # discipline — redeem the oldest pending response once
            # max_async gets are in flight, or a partition larger than
            # the socket buffers deadlocks (client blocked in sendall,
            # server blocked writing responses nobody is reading)
            window = max(1, args.max_async)

            from .sinks.aerospike_wire import WireUnavailable

            def verify_part(rows):
                from collections import deque

                router = None
                single = None
                pend = deque()

                def fetch_one(k):
                    """Synchronous single-get failover: re-tend, try
                    the (possibly new) master, then the RF=2 replica —
                    the read-fallback the C client's replica policy
                    performs."""
                    try:
                        router.retend()
                    except (OSError, ValueError, RuntimeError):
                        pass  # stale map is still a usable fallback
                    pid = router.pid_for(k)
                    candidates = [router.pmap[pid]]
                    if router.rmap and router.rmap[pid] not in (-1, candidates[0]):
                        candidates.append(router.rmap[pid])
                    for idx in candidates:
                        try:
                            c2 = router.client(idx)
                            return c2.wait_record(c2.get(k))
                        except (WireUnavailable, OSError):
                            router.drop_client(idx)
                    return None

                def redeem():
                    c, h, k, want, want_ttl = pend.popleft()
                    try:
                        rec = c.wait_record(h)
                    except (WireUnavailable, OSError):
                        # master refused (handoff) or died mid-stream:
                        # fall back — only possible on the cluster path
                        rec = fetch_one(k) if router is not None else None
                    ok = (
                        rec is not None
                        and rec[1] == want
                        and int(rec[0]) == want_ttl & 0xFFFFFFFF
                    )
                    (acc_verified if ok else acc_mismatch).add(1)

                for rd in rows:
                    k = rd["key"]
                    if not isinstance(k, (bytes, bytearray)):
                        k = str(k).encode("utf-8")
                    k = bytes(k)
                    want = {
                        c_["col_name"]: c_["value"] or b""
                        for c_ in rd["cells"]
                    }
                    want_ttl = int(rd["write_ttl"])
                    if clustered:
                        if router is None:
                            router = ClusterRouter(
                                nodes, ns, set_name,
                                user=user, credential=credential,
                                rf2=True, compress_min=compress_min,
                            )
                        if len(pend) >= window:
                            redeem()
                        try:
                            c = router.client_for(k)
                            pend.append((c, c.get(k), k, want, want_ttl))
                        except OSError:
                            # master unreachable at send time: resolve
                            # synchronously via the fallback chain
                            rec = fetch_one(k)
                            ok = (
                                rec is not None
                                and rec[1] == want
                                and int(rec[0]) == want_ttl & 0xFFFFFFFF
                            )
                            (acc_verified if ok else acc_mismatch).add(1)
                    else:
                        if single is None:
                            single = WireClient(
                                host, port, ns, set_name,
                                user=user, credential=credential,
                                compress_min=compress_min,
                            )
                        if len(pend) >= window:
                            redeem()
                        pend.append(
                            (single, single.get(k), k, want, want_ttl)
                        )
                while pend:
                    redeem()
                if router is not None:
                    router.close()
                if single is not None:
                    single.close()

            def verify_part_batch(rows):
                """--batch-verify (round 13): resolve the read-back
                through the wire BATCH-INDEX op — digests chunked and
                split per master node (ClusterRouter.batch_read's
                batch-node split, with its built-in re-tend on
                per-record UNAVAILABLE and dead-node re-route), so a
                task's round trips scale with the NODE count instead of
                its record count.  Single-host runs send one batch per
                chunk on the lone connection."""
                from .sinks.aerospike_wire import key_digest

                router = None
                single = None
                chunk = max(64, args.max_async * 8)
                buf: list = []

                def flush():
                    nonlocal router, single
                    if not buf:
                        return
                    digests = [key_digest(set_name, k) for k, _, _ in buf]
                    if clustered:
                        if router is None:
                            router = ClusterRouter(
                                nodes, ns, set_name,
                                user=user, credential=credential, rf2=True,
                                compress_min=compress_min,
                            )
                        got = router.batch_read(digests)
                        recs = [got[d] for d in digests]
                    else:
                        if single is None:
                            single = WireClient(
                                host, port, ns, set_name,
                                user=user, credential=credential,
                                compress_min=compress_min,
                            )
                        found, _missing, unavailable, _filtered = (
                            single.batch_get(digests)
                        )
                        if unavailable:
                            raise RuntimeError(
                                "node answered PARTITION_UNAVAILABLE on "
                                "a single-host run — nothing to "
                                "re-route to"
                            )
                        recs = [found.get(i) for i in range(len(digests))]
                    for rec, (_k, want, want_ttl) in zip(recs, buf):
                        ok = (
                            rec is not None
                            and rec[1] == want
                            and int(rec[0]) == want_ttl & 0xFFFFFFFF
                        )
                        (acc_verified if ok else acc_mismatch).add(1)
                    buf.clear()

                for rd in rows:
                    k = rd["key"]
                    if not isinstance(k, (bytes, bytearray)):
                        k = str(k).encode("utf-8")
                    k = bytes(k)
                    want = {
                        c_["col_name"]: c_["value"] or b""
                        for c_ in rd["cells"]
                    }
                    buf.append((k, want, int(rd["write_ttl"])))
                    if len(buf) >= chunk:
                        flush()
                flush()
                if router is not None:
                    router.close()
                if single is not None:
                    single.close()

            sink_input.foreachPartition(
                verify_part_batch if args.batch_verify else verify_part
            )
            print(
                f"# verify: {acc_verified.value} records match the sink, "
                f"{acc_mismatch.value} mismatches"
            )
            if acc_mismatch.value:
                print("# VERIFY FAILED", file=sys.stderr)
                return 1
        n_read = stats["n_read"]
        last = stats["t"]
        n_expired = stats["n_merged"] - n_read
        print(
            f"# records read: {n_read}  written: {acc_ok.value}"
            f"  already existing: {acc_exists.value}"
            f"  expired: {n_expired}  transient retries: {acc_retry.value}"
            f"  async window: {args.max_async}"
        )
        if last is not None:
            print(f"# resume hint: --token {last + 1}")
        return 0

    # S11/S14: create-only sink + accounting + resume hint — every
    # counter (merged, expired, read, written, last token) rides the ONE
    # write execution via observations; nothing recomputes the merge
    from .sinks.kv_sink import create_only_append

    obs_last = Observation()
    sink_input = records.select(
        "key", "token", "cells", "expiry", "write_ttl", "n_cols"
    ).observe(obs_last, F.max("token").alias("t"))
    counters = create_only_append(sink_input, args.out_dir, key_col="key")
    last = obs_last.get["t"]
    n_expired = obs_merged.get["n_merged"] - counters["read"]
    print(
        f"# records read: {counters['read']}  written: {counters['written']}"
        f"  already existing: {counters['already_existing']}"
        f"  expired: {n_expired}  async window (recorded): {args.max_async}"
    )
    if last is not None:
        print(f"# resume hint: --token {last + 1}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
