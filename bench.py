"""Benchmark harness (driver contract).

Runs the headline extraction pipeline plus representative operator
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

The headline number is end-to-end extraction throughput (HTML -> ordered
spans + triples) over the deterministic synthetic interleaved-documents
corpus sized by sf (BASELINE.json metric). Scaling evidence (N vs 4N
parallelism) is produced by tools/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=None,
                    help="override extraction corpus size")
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from webtableextractionsystem_spark.datagen import (
        gen_documents_df,
        n_docs_for_sf,
        sf_of_dir,
    )
    from webtableextractionsystem_spark.operators import dedup as DD
    from webtableextractionsystem_spark.operators import relational as REL
    from webtableextractionsystem_spark.operators import similarity as SIM
    from webtableextractionsystem_spark.operators import textstats as TS
    from webtableextractionsystem_spark.operators.extraction import extract_all
    from webtableextractionsystem_spark.session import get_spark

    sf = sf_of_dir(sf_dir)
    n_docs = args.docs or n_docs_for_sf(sf)
    spark = get_spark(app_name="bench", cores=cpus)

    # JVM + python-worker warmup (not measured)
    extract_all(gen_documents_df(spark, 64), 32) \
        .agg(F.sum("n_spans")).collect()

    queries: dict[str, float] = {}

    def extract_run():
        ext = extract_all(gen_documents_df(spark, n_docs),
                          num_buckets=max(256, cpus * 8))
        r = ext.agg(F.sum("n_spans").alias("s"),
                    F.sum("n_errors").alias("e"),
                    F.count("*").alias("d")).first()
        assert r["d"] == n_docs and (r["e"] or 0) == 0, r

    queries["x_extract_e2e"] = timed(extract_run)
    docs_per_sec = round(n_docs / queries["x_extract_e2e"], 1)

    if not args.extract_only:
        bench_set = {
            "q_doc_minhash": lambda: DD.minhash_signatures(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_lsh_pairs": lambda: DD.lsh_candidate_pairs(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_simhash": lambda: DD.simhash_signatures(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_neardup_canonical": lambda: DD.neardup_canonical(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_emb_topk_cosine": lambda: SIM.topk_bruteforce(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_emb_lsh_buckets": lambda: SIM.lsh_buckets(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_rel_pricing_summary": lambda: REL.pricing_summary(spark, sf_dir)
            .collect(),
            "q_rel_revenue_by_nation": lambda: REL.revenue_by_nation(spark, sf_dir)
            .collect(),
            "q_events_hourly": lambda: REL.events_hourly(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_decontaminate": lambda: DD.decontaminate(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_repetition": lambda: TS.repetition_stats(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_curation_funnel": lambda: DD.curation_funnel(spark, sf_dir)
            .groupBy("reason").count().collect(),
            "q_events_asof_join": lambda: REL.event_asof_join(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_chunks": lambda: TS.doc_chunks(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_pack_sequences": lambda: TS.pack_sequences(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_emb_centroid_outliers": lambda: SIM.centroid_outliers(
                spark, sf_dir).agg(F.count("*")).collect(),
            "q_events_interval_join": lambda: REL.event_interval_join(
                spark, sf_dir).agg(F.count("*")).collect(),
            "q_doc_bloom_filter": lambda: DD.bloom_filter_stats(
                spark, sf_dir).collect(),
            "q_doc_length_quantiles": lambda: TS.length_quantiles(
                spark, sf_dir).agg(F.count("*")).collect(),
            "q_doc_quantile_sketch": lambda: TS.quantile_sketch(
                spark, sf_dir).collect(),
            "q_doc_ngram_clean": lambda: DD.ngram_clean(spark, sf_dir)
            .agg(F.count("*")).collect(),
            # the production sketch-only HLL: timed next to the exact
            # quantile/distinct forms so the ledger shows the scale win
            "q_doc_hll_sketch_only": lambda: TS.hll_distinct(
                spark, sf_dir, with_exact=False).collect(),
            "q_doc_bm25_topk": lambda: TS.bm25_topk(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_dsir_weights": lambda: TS.dsir_weights(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_emb_semdedup": lambda: SIM.semdedup(spark, sf_dir)
            .collect(),
            "q_doc_pii": lambda: TS.pii_stats(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_pmi_topk": lambda: TS.pmi_topk(spark, sf_dir)
            .collect(),
            "q_doc_gopher_rules": lambda: TS.gopher_rules(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_c4_clean": lambda: TS.c4_clean(spark, sf_dir)
            .agg(F.count("*")).collect(),
            "q_doc_mixture_weights": lambda: TS.mixture_weights(
                spark, sf_dir).collect(),
            "q_doc_winnowing": lambda: DD.winnowing_fingerprints(
                spark, sf_dir).agg(F.count("*")).collect(),
        }
        for name, fn in bench_set.items():
            queries[name] = timed(fn)

    spark.stop()
    print(json.dumps({
        "metric": "documents/sec end-to-end extraction (HTML->spans+triples)",
        # headline value = extraction wall seconds (stable meaning
        # regardless of which side queries run); per-query times below
        "value": queries["x_extract_e2e"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
