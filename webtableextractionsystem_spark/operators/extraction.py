"""The Spark extraction stage: salted repartition -> Arrow-batched kernel
-> one combined row per document -> pure-Catalyst derived views.

Scale design (the 100 TB story):

* **One kernel pass per document.** The kernel computes spans, tables,
  entities and triples together; the four output tables are projections
  (``inline``/``posexplode``) of the combined row — no second Python
  stage, no recompute, and writing the combined table once lets all four
  views be derived with column pruning at read time.
* **Skew.** doc_id is unique, so hash-bucketing spreads doc COUNT evenly;
  the real skew is per-doc COST (mega-docs, H11). Defenses: (a) explicit
  ``repartition(buckets, pmod(xxhash64(doc_id), buckets))`` — the salted
  bucket key is also the checkpoint/lineage unit; (b) buckets >> cores so
  the scheduler rebalances stragglers; (c) Arrow batches capped at 256
  rows (session.py) so one batch can't hold many mega-docs at once.
* **Zero per-row Python visible to Spark**: a single ``mapInPandas``
  stage; everything else is DataFrame ops compiled by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel.pipeline import extract_batch
from ..schemas import EXTRACTED, ddl

DEFAULT_BUCKETS = 256


def with_bucket(docs: DataFrame, num_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Salted doc_id bucket: pmod(xxhash64(doc_id), n). Computed JVM-side."""
    return docs.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int")
    )


def extract_all(docs: DataFrame, num_buckets: int = DEFAULT_BUCKETS,
                repartition: bool = True) -> DataFrame:
    """documents(doc_id, spans[, bucket]) -> EXTRACTED combined rows."""
    if "bucket" not in docs.columns:
        docs = with_bucket(docs, num_buckets)
    if repartition:
        docs = docs.repartition(num_buckets, "bucket")

    def run(batches):
        for pdf in batches:
            spans_lists = [
                [
                    {"kind": s["kind"], "text": s["text"],
                     "media_ref": s["media_ref"], "offset": s["offset"]}
                    for s in (spans if spans is not None else [])
                    if s is not None  # null struct elements must not kill the task
                ]
                for spans in pdf["spans"]
            ]
            results = extract_batch(pdf["doc_id"].tolist(), spans_lists)
            import pandas as pd

            out = pd.DataFrame(results)
            out["bucket"] = pdf["bucket"].to_numpy()
            yield out[["doc_id", "bucket", "out_spans", "tables", "entities",
                       "triples", "n_spans", "n_errors", "error"]]

    return docs.mapInPandas(run, schema=ddl(EXTRACTED))


# ---------------------------------------------------------------------------
# Derived views: pure Catalyst projections of the combined extraction row
# ---------------------------------------------------------------------------

def spans_view(extracted: DataFrame) -> DataFrame:
    """spans_out (FIXTURES.md §2.1): ordered per-doc span sequence."""
    return extracted.select("doc_id", F.inline("out_spans"))


def tables_view(extracted: DataFrame) -> DataFrame:
    return extracted.select("doc_id", F.inline("tables"))


def entities_view(extracted: DataFrame) -> DataFrame:
    """entities with per-doc seq (posexplode preserves extraction order)."""
    return extracted.select(
        "doc_id", F.posexplode("entities").alias("seq", "e")
    ).select("doc_id", "seq", "e.name", "e.url", "e.props")


def triples_view(extracted: DataFrame) -> DataFrame:
    return extracted.select(
        "doc_id", F.posexplode("triples").alias("seq", "t")
    ).select("doc_id", "seq", "t.subj_name", "t.subj_url", "t.rel",
             "t.obj_name", "t.obj_url")


def bucket_metrics(extracted: DataFrame) -> DataFrame:
    """Per-bucket lineage metrics (feeds the checkpoint table)."""
    return extracted.groupBy("bucket").agg(
        F.count("*").alias("doc_count"),
        F.sum("n_spans").cast("long").alias("span_count"),
        F.sum("n_errors").cast("long").alias("error_count"),
    )
