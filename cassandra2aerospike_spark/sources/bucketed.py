"""Bucketed (pre-shuffled) tables: the co-located-join layout.

At 100 TB the single most expensive repeated cost is shuffling a fact
table for every key join/aggregation.  Bucketing pays that shuffle ONCE
at write time: both sides are hash-clustered (and sorted) into the same
number of buckets on the join key, so Catalyst plans a SortMergeJoin
with NO Exchange and NO Sort on either side, and any downstream
aggregation keyed on the bucket column reuses the layout too — the
whole join+agg pipeline runs exchange-free (asserted by
tests/test_plans.py).  This is the Spark-native analog of the
reference's "merge without sort" exploitation of pre-sorted runs
(Sorter, CassandraParser.cpp:38-46): organize the storage so the
expensive ordering already exists.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Return `table` as a bucketed catalog table, staging it on first use.

    The table is written once per (sf_dir, table, n_buckets) into the
    session warehouse via bucketBy+sortBy (one shuffle, paid at write
    time).  Re-entrant: if the catalog already knows the table, reuse it;
    if only the warehouse path survives from a previous session (the
    default catalog is in-memory), overwrite rebuilds deterministically.
    """
    import shutil
    from urllib.parse import urlparse

    tag = re.sub(r"[^a-z0-9]", "_", os.path.basename(os.path.normpath(sf_dir)).lower())
    name = f"bkt_{table}_{tag}_{n_buckets}"
    if not spark.catalog.tableExists(name):
        # the default catalog is in-memory: a previous session's managed
        # location can survive without a catalog entry, and saveAsTable
        # refuses to reuse it — clear the orphan and rebuild (a real
        # deployment keeps a persistent metastore and never hits this)
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
        orphan = os.path.join(wh, name.lower())
        if os.path.isdir(orphan):
            shutil.rmtree(orphan, ignore_errors=True)
        (
            load_table(spark, sf_dir, table)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    return spark.table(name)
