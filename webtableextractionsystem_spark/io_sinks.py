"""File sources/sinks (S10-S12, S16-S17 as table appends).

The reference persists per-page pickles, JSON lexicons/outputs, and a
flat triple CSV (/root/reference/src/IO/fileInteraction/FileIO.py). The
rebuild's canonical storage is partitioned parquet (Iceberg at cluster
scale — same layout, transactional commit); these helpers add the
interchange formats users of the reference expect:

* ``write_triples_csv`` — the file/Triad/relationship.csv shape:
  ``[name,url],rel,[name,url]`` per row (FileIO.writeTriad2csv,
  FileIO.py:144-155).
* ``write_entities_json`` / ``write_json`` — entity.json-shaped output.
* parquet sink/scan with bucket partitioning (the pickle replacement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_triples_csv(triples: DataFrame, path: str) -> None:
    """Flat triple CSV in the reference's bracket format."""
    flat = triples.select(
        F.concat(F.lit("['"), "subj_name", F.lit("', '"), "subj_url",
                 F.lit("']")).alias("subject"),
        F.col("rel").alias("relationship"),
        F.concat(F.lit("['"), "obj_name", F.lit("', '"), "obj_url",
                 F.lit("']")).alias("object"),
    )
    flat.write.mode("overwrite").option("header", True).csv(path)


def write_entities_json(entities: DataFrame, path: str) -> None:
    """entity.json-shaped lines: [[name, url], {prop: value, ...}]."""
    shaped = entities.select(
        F.to_json(
            F.struct(
                F.array("name", "url").alias("who"),
                F.col("props").alias("props"),
            )
        ).alias("value")
    )
    shaped.write.mode("overwrite").text(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_bucketed_parquet(df: DataFrame, path: str,
                           partition_col: str = "bucket") -> None:
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_parquet(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
