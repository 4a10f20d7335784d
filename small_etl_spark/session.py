"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (single JVM); the same settings are
what we'd ship to a 1000-executor cluster job conf: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), UTC session
timezone (oracle parity and sanity at scale), Arrow enabled for the
Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# K6 cloud storage (reference: src/config/lambda.rs:173-246 reads and
# writes S3 directly). Spark-first, everything is a Hadoop-FS URI —
# the same df.read/df.write works on file://, s3a://, gs://, abfss://.
# This conf block is what we'd merge into the session for S3: the
# hadoop-aws + aws-sdk jars ship with a cluster distro (they are not in
# this container, so tests exercise a second *file://* root instead).
S3A_CONF = {
    # executor-wide S3A committer: task commits are O(1) metadata ops,
    # not directory renames (required for object stores).
    "spark.sql.sources.commitProtocolClass": (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ),
    "spark.sql.parquet.output.committer.class": (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    ),
    "spark.hadoop.fs.s3a.committer.name": "magic",
    "spark.hadoop.fs.s3a.aws.credentials.provider": (
        "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider,"
        "com.amazonaws.auth.EnvironmentVariableCredentialsProvider"
    ),
    # connection pool sized for 32-core executors doing parquet range reads
    "spark.hadoop.fs.s3a.connection.maximum": "96",
    "spark.hadoop.fs.s3a.threads.max": "64",
    "spark.hadoop.fs.s3a.fast.upload": "true",
    # vectored IO (Hadoop 3.3.5+): parquet column chunks in parallel
    "spark.hadoop.fs.s3a.vectored.read.min.seek.size": "4K",
    "spark.hadoop.fs.s3a.vectored.read.max.merged.size": "1M",
}


def get_spark(
    app_name: str = "small_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``. For S3-backed IO pass
    ``extra_conf=S3A_CONF`` (needs the hadoop-aws jars of a cluster
    distro; see K6 note above).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # transformWithStateInPandas needs google.protobuf in the driver
    # and in every worker the JVM spawns; enable the container shim
    # BEFORE the JVM launches (it snapshots the environment). No-op
    # wherever protobuf is properly installed.
    from small_etl_spark.streaming.pbcompat import enable_container_protobuf

    enable_container_protobuf()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: coalesce tiny shuffle partitions, split skewed ones,
        # convert sort-merge→broadcast when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom filters: a selective dimension filter is turned
        # into a bloom filter pushed into the fact-side scan, pruning
        # row groups before the join — inert at test SF (creation
        # thresholds), a major scan saver on selective star joins at
        # the 100 TB point.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # ICU case mappings make lower()/upper() collation-aware, but the
        # one-time CollationAwareUTF8String static init costs minutes of
        # CPU; JVM simple case mapping is identical for our data (and
        # matches DuckDB). Also set at runtime in sources.tables.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 128 MB input splits: at 100 TB this is ~800k tasks — fine for
        # a large cluster; locally parquet files are single-split anyway.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
