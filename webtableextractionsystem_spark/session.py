"""SparkSession factory with scale-oriented defaults.

Single place to pin the configs that matter at 100 TB: AQE (runtime
re-planning + skew-join splitting), Arrow batch sizing for the extraction
kernel, and sane shuffle-partition defaults for local runs (on a real
cluster AQE coalescing makes the initial number far less sensitive).
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def package_zip(path: str = "/tmp/wtes_spark_pkg.zip") -> str:
    """Zip this package for shipping to executors — the programmatic
    equivalent of ``spark-submit --py-files`` (north rule). Rebuilt only
    when sources are newer than the existing zip."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    sources = []
    for dirpath, _, files in os.walk(pkg_dir):
        if "__pycache__" in dirpath:
            continue
        sources.extend(os.path.join(dirpath, f) for f in files
                       if f.endswith(".py"))
    if os.path.exists(path):
        newest = max(os.path.getmtime(s) for s in sources)
        if os.path.getmtime(path) >= newest:
            return path
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w") as zf:
        for src in sources:
            zf.write(src, os.path.relpath(src, root))
    os.replace(tmp, path)
    return path


def get_spark(app_name: str = "wtes-spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # extraction kernel: bound Arrow batch size so mega-docs (H11) can't
        # blow worker memory; many small batches also smooth skew
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # scan split size, env-parameterised (guide §6). Default left at
        # Spark's 128m: a 32m local override was MEASURED SLOWER on the
        # TPC-H files (pricing 1.45/1.65/1.93 s at 128m vs
        # 1.58/1.82/3.99 s at 32m; revenue likewise) — per-task reader
        # init outweighs the decode parallelism at these sizes. A real
        # cluster doing large sequential scans sets it to 512m-1g to
        # cut task count feeding shuffles (guide §2.2/§6).
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ship the package to python workers (works for local AND cluster
    # masters; equivalent to spark-submit --py-files)
    spark.sparkContext.addPyFile(package_zip())
    return spark
