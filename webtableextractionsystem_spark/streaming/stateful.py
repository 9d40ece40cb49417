"""Custom stateful streaming operator: online exact-dedup with
``applyInPandasWithState``.

The reference's Bloom-filter crawl dedup (F3,
/root/reference/src/spider/WebSpider.py:34,251-262) is a mutable
in-process set — lost on crash, single-machine. The streaming-native
version keeps seen-fingerprint state in Spark's state store (persisted
with the streaming checkpoint, partitioned by key, survives restarts):
first occurrence of a fingerprint passes through, later occurrences —
within a batch, across batches, or across availableNow restarts — are
suppressed.

State value: n_seen per fingerprint. Keys are the fingerprints
themselves, so state is hash-partitioned and scales horizontally.

State growth at 100 TB: both stateful operators here keep one entry per
distinct key FOREVER (GroupStateTimeout.NoTimeout) — that is the
correct semantics for corpus dedup, where "seen five years ago" still
means duplicate, and the state store (RocksDB-backed on a real cluster)
is a disk structure, not heap. If the product semantics allow a
dedup horizon, the eviction knob is ProcessingTimeTimeout +
state.setTimeoutDuration per key — a deliberate semantic change
(re-admits old duplicates), not an optimization, so it is not defaulted
here.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import DOCUMENTS

OUTPUT_SCHEMA = "fp string, doc_id string"
STATE_SCHEMA = "n_seen int"


def _dedup_fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    (fp,) = key
    n_seen = state.get[0] if state.exists else 0
    emit = []
    for pdf in pdfs:
        for doc_id in sorted(pdf["doc_id"]):
            if n_seen == 0:
                emit.append((fp, doc_id))
            n_seen += 1
    state.update((n_seen,))
    if emit:
        yield pd.DataFrame(emit, columns=["fp", "doc_id"])


def streaming_dedup(spark: SparkSession, input_dir: str, output_dir: str,
                    stream_ckpt_dir: str) -> None:
    """Stream documents from ``input_dir``; append ONLY first-seen
    fingerprints to ``output_dir``. Fingerprint = md5 over every span's
    (kind, text, media_ref) — media-only documents must NOT collide on
    their empty text vectors — computed JVM-side before the stateful
    operator."""
    stream = (
        spark.readStream.schema(DOCUMENTS).parquet(input_dir)
        .withColumn(
            "fp",
            F.md5(F.concat_ws(
                "\x01",
                F.transform(
                    "spans",
                    lambda s: F.concat_ws(
                        "\x02", s["kind"], s["text"], s["media_ref"]),
                ))),
        )
        .select("fp", "doc_id")
    )
    dedup = stream.groupBy("fp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        dedup.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", stream_ckpt_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# Online NEAR-dup: stateful LSH banding at ingest
# ---------------------------------------------------------------------------
#
# The batch near-dup pass (operators/dedup.py) compares a corpus against
# itself; at ingest time the question is "is this NEW document a near-dup
# of anything already accepted?". Streaming-native answer: compute the
# per-row minhash signature (row_minhash — no aggregation, so it is legal
# before a stateful operator in append mode), explode the LSH bands, and
# keep ONE state entry per (band, band_key) bucket: the first document
# that claimed the bucket. Every later document hitting the bucket is
# emitted against that owner. State is keyed by band bucket, so it is
# hash-partitioned and horizontally scalable, and it survives restarts
# with the streaming checkpoint (same guarantees as streaming_dedup).
# Docs too short to shingle have NULL signatures and emit no bands.

NEARDUP_OUTPUT = "band int, band_key string, doc_id long, owner_id long"
NEARDUP_STATE = "owner long"


def _neardup_fn(key: Tuple[int, str], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    band, band_key = key
    owner = state.get[0] if state.exists else None
    # drain ALL Arrow chunks before picking the owner: a group can span
    # chunk boundaries, and taking the first chunk's minimum would make
    # owner assignment depend on arrow batch sizing / scan order. Within
    # one microbatch the deterministic "first arrival" is min(doc_id).
    doc_ids = sorted(
        int(d) for pdf in pdfs for d in pdf["doc_id"])
    if owner is None and doc_ids:
        owner = doc_ids[0]
    state.update((owner,))
    if doc_ids:
        yield pd.DataFrame(
            [(band, band_key, d, owner) for d in doc_ids],
            columns=["band", "band_key", "doc_id", "owner_id"])


def streaming_neardup(spark: SparkSession, input_dir: str, output_dir: str,
                      stream_ckpt_dir: str) -> None:
    """Stream (doc_id, text) parquet from ``input_dir``; append one row
    per (document, LSH band) to ``output_dir`` carrying the band
    bucket's owner. A document is an online near-dup candidate iff any
    of its rows has owner_id != doc_id. This is the CANDIDATE stage only
    (cheap, state = one owner id per band bucket);
    ``streaming_neardup_verified`` below composes the n-gram Jaccard
    verify stage into the stream and is equivalence-tested against the
    batch pipeline."""
    from ..operators.dedup import band_structs, row_minhash

    stream = spark.readStream.schema(
        "doc_id long, text string").parquet(input_dir)
    banded = (
        row_minhash(stream)
        .where(F.col("mh0").isNotNull())
        .select("doc_id", F.explode(band_structs()).alias("bk"))
        .select("doc_id", "bk.band", "bk.band_key")
    )
    flagged = banded.groupBy("band", "band_key").applyInPandasWithState(
        _neardup_fn,
        outputStructType=NEARDUP_OUTPUT,
        stateStructType=NEARDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        flagged.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", stream_ckpt_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# Online near-dup WITH the Jaccard verify stage composed in
# ---------------------------------------------------------------------------

def streaming_neardup_verified(spark: SparkSession, input_dir: str,
                               output_dir: str, stream_ckpt_dir: str,
                               state_dir: str) -> None:
    """The COMPLETE online near-dup pipeline: candidate generation AND
    the n-gram Jaccard verify stage inside the stream, mirroring the
    batch ``_verified_pairs`` (operators/dedup.py) exactly.

    Per microbatch (foreachBatch):

    1. new documents get per-row minhash signatures + LSH bands +
       shingle sets (all JVM-side, no aggregation needed);
    2. the batch's (doc_id, bands, shingles) rows are staged to
       ``state_dir/batch=<id>`` — the accumulated corpus state, a plain
       partitioned parquet table (at warehouse scale: the signatures
       table every near-dup pass stages anyway);
    3. new docs' bands equi-join against the ACCUMULATED corpus bands
       (old + new — so cross-batch and within-batch candidates both
       surface, never a cross join);
    4. survivors are verified with the same integer-thresholded n-gram
       Jaccard as the batch pipeline and appended to
       ``output_dir/batch=<id>``.

    A pair (lo, hi) is emitted exactly once: in the microbatch where the
    LATER of the two documents arrives. Hence after any prefix of the
    stream, the online verified-pair set over the documents seen so far
    EQUALS the batch ``_verified_pairs`` over the same corpus — the
    equivalence the restart-survival test pins.

    Exactly-once: both writes for batch B go to a ``batch=B`` partition
    with overwrite, so a microbatch replay after a crash rewrites the
    identical rows instead of double-appending. State growth is one row
    per document (bands + shingles); shingles are stored once per doc,
    not per band."""
    from ..operators.dedup import (
        _shingles,
        band_structs,
        jaccard_verified,
        row_minhash,
    )

    def process_batch(batch, batch_id: int) -> None:
        sig = row_minhash(batch)
        staged = sig.select(
            "doc_id",
            F.when(F.col("mh0").isNotNull(), band_structs())
            .otherwise(F.array().cast(
                "array<struct<band:int,band_key:string>>"))
            .alias("bands"),
            _shingles().alias("sh"),
        )
        staged.write.mode("overwrite").parquet(
            f"{state_dir}/batch={batch_id}")

        acc = spark.read.parquet(state_dir)
        bands = acc.select(
            "doc_id", "batch", F.explode("bands").alias("bk")
        ).select("doc_id", "batch", "bk.band", "bk.band_key")
        new_b = bands.where(F.col("batch") == batch_id).alias("n")
        all_b = bands.alias("o")
        cand = (
            new_b.join(all_b, ["band", "band_key"])
            .where(F.col("n.doc_id") != F.col("o.doc_id"))
            .select(
                F.least("n.doc_id", "o.doc_id").alias("doc_a"),
                F.greatest("n.doc_id", "o.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        # the SAME verify expression as the batch pipeline (shared
        # helper — equivalence by construction)
        verified = jaccard_verified(cand, acc.select("doc_id", "sh"))
        verified.write.mode("overwrite").parquet(
            f"{output_dir}/batch={batch_id}")

    (
        spark.readStream.schema("doc_id long, text string")
        .parquet(input_dir)
        .writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", stream_ckpt_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
