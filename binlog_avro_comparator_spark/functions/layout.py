"""Table-layout maintenance: the janitorial operations a 100 TB
parquet estate needs between queries.

``compact_parquet_dir`` -- the small-files problem: a streaming sink or
an over-partitioned write leaves thousands of KB-scale files, and every
subsequent scan pays one task + one open per file.  Compaction rewrites
the directory into ceil(bytes/target) files via ``coalesce`` (a
NARROW dependency: tasks concatenate input splits, no shuffle, no
re-sort -- existing intra-file ordering like a Z-order layout is
preserved per output file).  At cluster scale the same routine runs
per partition-directory so one compaction never rewrites the whole
table; here it takes one directory, which IS that unit.

``write_zordered`` -- the executable form of the Z-order recipe that
zorder_key's docstring describes: range-partition by the Morton key
(global file-level clustering: each output file owns a key range) and
sort within partitions (row-level clustering inside each file) so
min/max column statistics prune on BOTH interleaved dimensions.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .zorder import zorder_key


def compact_parquet_dir(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files.

    The swap is write-new-then-rename (tmp dir beside the target, old
    dir moved away before the new one moves in, removed only after).
    A reader that already opened the old files keeps a consistent
    view; a reader that RESOLVES the path inside the two-rename window
    sees a missing directory (two renames cannot be made atomic on a
    plain filesystem), and a crash in that window leaves the data
    intact but under the .__old_* / .__compact_* recovery names --
    single-writer maintenance windows are the operating assumption, a
    catalog/table-format pointer swap is the upgrade when readers are
    concurrent.  Driver-side
    work is directory metadata only (os.walk for sizes); the data
    movement is the executors' coalesce write.

    Refuses a hive-partitioned table ROOT: spark.read.parquet would
    infer partition columns from key=value paths and the flat rewrite
    would silently materialize them as physical columns while
    destroying the directory layout.  Compaction operates on ONE leaf
    partition directory at a time -- call it per-partition.  Returns
    {files_before, files_after, bytes}."""
    part_dirs = sorted(
        d
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d)) and "=" in d
    )
    if part_dirs:
        raise ValueError(
            f"compact_parquet_dir: {path!r} looks like a hive-partitioned "
            f"table root (subdirectories {part_dirs[:3]}...); compact each "
            "leaf partition directory instead -- a flat rewrite would "
            "flatten the partition layout into physical columns"
        )
    sizes = [
        os.path.getsize(os.path.join(r, f))
        for r, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]
    total = sum(sizes)
    n_out = max(1, math.ceil(total / target_bytes))
    tmp = f"{path.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    bak = f"{path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    files_after = sum(
        1
        for r, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    return {"files_before": len(sizes), "files_after": files_after, "bytes": total}


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    centroid_stride: int = 37,
    cents: DataFrame | None = None,
) -> DataFrame:
    """Persist the IVF index as a CENTROID-PARTITIONED parquet table:
    one directory per inverted list (``centroid_id=N/``), each holding
    its members' full rows.  This is the executable form of the recipe
    the IVF operators document -- the assignment column doubles as the
    partition key, so a probe that filters on it reads only its
    ``n_probe`` lists via planning-time partition pruning and the other
    ``n_centroids - n_probe`` directories are never opened (at 100 TB:
    never listed, never footer-read).  Build is query-independent and
    amortizes across every probe batch (similarity.cosine_topk_ivf's
    index= contract, now durable).  Pass ``cents`` to build against a
    FROZEN quantizer (the incremental-maintenance contract -- the base
    build and every append_ivf_index batch must share it); otherwise
    the stride quantizer derives centroids from ``embeddings``.
    Returns the centroid frame (n_centroids rows) the probe planner
    needs."""
    from ..operators.similarity import assign_centroids, assign_to_centroids

    if cents is None:
        cents, assignment = assign_centroids(
            embeddings, n_centroids, centroid_stride
        )
    else:
        assignment = assign_to_centroids(embeddings, cents)
    (
        assignment.join(embeddings, "vec_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    return cents


def append_ivf_index(
    new_vectors: DataFrame, path: str, cents: DataFrame
) -> None:
    """INCREMENTAL IVF maintenance: assign a new vector batch against
    the FROZEN centroid frame and append it into the centroid-
    partitioned layout -- dynamic partition append, so only the list
    directories the batch actually touches gain files; nothing is
    rewritten, no rebuild.  Because assignment is query-independent
    and the centroids are frozen, probe results over the appended
    index equal a full rebuild BY CONSTRUCTION (pinned by the
    ann_ivf_probe_incremental oracle); re-clustering (new centroids)
    is a deliberate, separate rebuild -- exactly how production IVF
    indexes handle ingest vs re-train."""
    from ..operators.similarity import assign_to_centroids

    (
        assign_to_centroids(new_vectors, cents)
        .join(new_vectors, "vec_id")
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(path)
    )


def ivf_probe_pruned(
    spark: SparkSession,
    path: str,
    cents: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Probe a persisted IVF index (write_ivf_index) with planning-time
    partition pruning: each query's ``n_probe`` nearest centroids are
    chosen exactly as cosine_topk_ivf does (rounded cosine desc,
    centroid asc), the union of probed list ids -- bounded by
    n_centroids, never data-sized -- becomes a LITERAL ``isin`` filter
    on the partition column so the scan's PartitionFilters skip every
    unprobed directory at planning time, and the exact re-rank runs
    only over the read lists with the probe frame broadcast.

    Result-identical to cosine_topk_ivf at the same parameters (the
    oracle contract); the difference is WHERE the list restriction
    happens -- in the layout, not in a join over a full scan."""
    from pyspark.sql import Window

    from ..operators.similarity import COS_ROUND, _dot, with_norm

    q = with_norm(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("norm").alias("q_norm"),
    )
    p_cos = F.round(
        _dot(F.col("q_embedding"), F.col("c_embedding"))
        / (F.col("q_norm") * F.col("c_norm")),
        COS_ROUND,
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("p_cos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "q_embedding",
            "q_norm",
            p_cos.alias("p_cos"),
            "centroid_id",
        )
        .withColumn("p_rank", F.row_number().over(probe_w))
        .filter(F.col("p_rank") <= n_probe)
        .select("query_id", "q_embedding", "q_norm", "centroid_id")
    )
    # the probed-list union is <= n_centroids values (index metadata,
    # not data): collect it so the partition filter is a LITERAL the
    # planner prunes with -- a join would only prune dynamically
    probe_ids = sorted(
        r.centroid_id
        for r in probes.select("centroid_id").distinct().collect()
    )
    lists = spark.read.parquet(path).filter(
        F.col("centroid_id").isin(probe_ids)
    )
    cand = (
        lists.join(F.broadcast(probes), on="centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("norm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))
    )
    cos = F.round(
        _dot(F.col("embedding"), F.col("q_embedding"))
        / (F.col("norm") * F.col("q_norm")),
        COS_ROUND,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def write_zordered(
    df: DataFrame,
    a: Column | str,
    b: Column | str,
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files Z-ordered on integer
    columns (a, b): repartitionByRange on the Morton key gives each
    file a disjoint key range (file-level pruning via min/max stats on
    BOTH dimensions), sortWithinPartitions clusters rows inside each
    file (row-group-level pruning).  The transient __z column is
    dropped before the write so the stored schema is the caller's."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    (
        df.withColumn("__z", zorder_key(a, b, bits=bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a BUCKETED managed table: rows are
    hash-partitioned into ``n_buckets`` files by ``key`` at write time
    and the bucket spec lands in the catalog, so every later
    equi-join or aggregation on that key reads pre-shuffled data --
    Spark plans NO Exchange on the bucketed side.  This is the
    co-located-join recipe for the repeated fact-to-fact joins here
    (payload diff joins binlog x avro on the same composite key every
    run; at 100 TB the shuffle IS the job -- bucket both sides once,
    join for free forever after).

    ``sort_by`` additionally sorts within each bucket file (catalog
    sort spec), which upgrades sort-merge joins to skip their sort.

    The bucket count is a LAYOUT decision: buckets = files per write
    batch, so size them like compaction targets (total bytes /
    bucket ~ hundreds of MB), and keep the SAME count on both join
    sides -- mismatched counts fall back to a shuffle on one side.
    """
    spark = df.sparkSession
    # qualified names would make the leftover-path guess below point at
    # a DIFFERENT table's live directory (managed location for db.tbl
    # is warehouse/db.db/tbl, not warehouse/tbl) -- refuse rather than
    # rmtree a guessed path
    if "." in table:
        raise ValueError(
            "write_bucketed takes an unqualified table name (current-"
            f"database managed table); got {table!r}"
        )
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    # a dropped managed table can leave its warehouse directory behind
    # (e.g. a crashed writer); saveAsTable refuses to reuse the
    # location, so clear it -- the drop above established ownership,
    # and the path is the catalog's own default location for an
    # unqualified managed table, not a guess
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    leftover = os.path.join(os.path.abspath(warehouse), table)
    if os.path.isdir(leftover):
        shutil.rmtree(leftover)
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, key
    )
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)
