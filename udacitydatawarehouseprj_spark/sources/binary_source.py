"""Binary-blob ingestion: one file per object via Spark's ``binaryFile``
source — the path multimodal corpora (images, audio, video) enter a
lakehouse before consolidation into parquet ``binary`` columns.

Beyond-reference source format (the reference's only sources are two S3
JSON drops, sql_queries.py:137-152); at 100 TB the recommended layout is
"land as objects → consolidate into parquet binary columns ASAP":
``binaryFile`` files are indivisible (no intra-file split), so millions
of small objects mean millions of tasks unless consolidated. These
helpers implement both halves — an executor-side distributed writer (no
driver loop, no collect) and the typed reader with filename-key
extraction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_blobs(df: DataFrame, landing: str, id_col: str = "doc_id",
                payload_col: str = "payload", ext: str = "bin") -> None:
    """Write one ``<id>.<ext>`` file per row, executor-side.

    ``foreachPartition`` keeps the write distributed (each task writes
    its partition's blobs directly — the driver never sees a payload),
    mirroring how an object-store landing zone is produced.

    CONTRACT — ``landing`` must be a filesystem every executor can
    reach at the same path (local mode, NFS, or a FUSE-mounted object
    store). ``open()`` writes node-local paths: on a multi-node
    cluster with plain local disks the blobs would land scattered
    across executor-local filesystems and ``read_blobs`` (which lists
    from the driver's view) would see nothing. A production landing
    zone on HDFS/S3 should route through a Hadoop-FS-compatible
    client instead; this writer models the SHAPE of the distributed
    write (no driver loop, no collect) for the test environment.
    The directory is created inside each task (not only on the
    driver) so a shared-filesystem cluster works even when the
    driver-side mkdir raced or the path is mounted read-late.
    """
    os.makedirs(landing, exist_ok=True)

    def write_partition(rows):
        os.makedirs(landing, exist_ok=True)  # executor-side, idempotent
        for row in rows:
            path = os.path.join(landing, f"{row[id_col]}.{ext}")
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(bytes(row[payload_col]))
            os.replace(tmp, path)  # atomic publish, crash-safe

    df.select(id_col, payload_col).foreachPartition(write_partition)


def read_blobs(spark: SparkSession, landing: str,
               ext: str = "bin") -> DataFrame:
    """Read a blob landing zone with the ``binaryFile`` source.

    Returns (doc_id, n_bytes, content): the id is recovered from the
    filename (the object key is the natural join key back to metadata),
    length comes from file status (no decode needed to size-filter),
    content is the raw bytes column.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*.{ext}")
        .load(landing)
    )
    return raw.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.%s$" % ext, 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").cast("long").alias("n_bytes"),
        F.col("content"),
    )
