"""Supplementary benchmark: noop-sink isolation per operator (guide
§1.4 of the Spark optimization playbook). NOT part of the driver
contract — bench.py is the frozen measurement; this file exists so the
round-8 optimization evidence (OPTIMIZATION_r08.md) cites timings of
the FULL computation of each touched operator (the noop sink
materializes every column of every row), independent of how much of a
query the bench's count(*)/collect() action lets Catalyst prune.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
Prints one JSON line: {"queries": {name: [run1, run2, run3]}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from webtableextractionsystem_spark.datagen import sf_of_dir
    from webtableextractionsystem_spark.operators import dedup as DD
    from webtableextractionsystem_spark.operators import similarity as SIM
    from webtableextractionsystem_spark.operators import textstats as TS
    from webtableextractionsystem_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cores=cpus)
    TS.load_documents(spark, sf_dir).count()   # warm the JVM

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # full-materialization forms: the noop sink defeats count-pruning,
    # so these time what a real consumer of the operator's OUTPUT pays
    targets = {
        "dsir_weights": lambda: noop(TS.dsir_weights(spark, sf_dir)),
        "pmi_topk": lambda: noop(TS.pmi_topk(spark, sf_dir)),
        "ngram_clean": lambda: noop(DD.ngram_clean(spark, sf_dir)),
        "repeated_ngrams": lambda: noop(DD.repeated_ngrams(spark, sf_dir)),
        "curation_funnel": lambda: noop(DD.curation_funnel(spark, sf_dir)),
        "minhash_signatures": lambda: noop(
            DD.minhash_signatures(spark, sf_dir)),
        "lsh_candidate_pairs": lambda: noop(
            DD.lsh_candidate_pairs(spark, sf_dir)),
        "neardup_canonical": lambda: noop(DD.neardup_canonical(spark, sf_dir)),
        "winnowing": lambda: noop(DD.winnowing_fingerprints(spark, sf_dir)),
        "decontaminate": lambda: noop(DD.decontaminate(spark, sf_dir)),
        "bm25_topk": lambda: noop(TS.bm25_topk(spark, sf_dir)),
        "bigram_lm": lambda: noop(TS.bigram_lm_score(spark, sf_dir)),
        "repetition_stats": lambda: noop(TS.repetition_stats(spark, sf_dir)),
        "gopher_rules": lambda: noop(TS.gopher_rules(spark, sf_dir)),
        "mixture_weights": lambda: noop(TS.mixture_weights(spark, sf_dir)),
        "hll_sketch_only": lambda: noop(
            TS.hll_distinct(spark, sf_dir, with_exact=False)),
        "topk_bruteforce": lambda: noop(SIM.topk_bruteforce(spark, sf_dir)),
        "semdedup": lambda: noop(SIM.semdedup(spark, sf_dir)),
        "centroid_outliers": lambda: noop(
            SIM.centroid_outliers(spark, sf_dir)),
    }
    out: dict[str, list[float]] = {}
    for name, fn in targets.items():
        runs = []
        for _ in range(N_RUNS):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            fn()
            runs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr, flush=True)

    spark.stop()
    print(json.dumps({"queries": out, "sf": sf_of_dir(sf_dir),
                      "cpus": cpus, "runs": N_RUNS}))


if __name__ == "__main__":
    main()
