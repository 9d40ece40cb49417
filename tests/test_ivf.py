"""IVF ANN (k-means coarse quantizer + per-cell exact search)."""

import pytest
from pyspark.sql import functions as F

from webtableextractionsystem_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def topk_pair(spark):
    exact = SIM.topk_bruteforce(spark, SF).collect()
    approx = SIM.ivf_topk(spark, SF).collect()
    return exact, approx


def test_ivf_assignment_covers_all(spark):
    assigned, centroids = SIM.ivf_assignments(spark, SF)
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert centroids.count() == SIM.IVF_K
    cells = assigned.groupBy("cell").count()
    assert cells.count() <= SIM.IVF_K


def test_ivf_topk_shape_and_recall(topk_pair):
    exact, approx = topk_pair
    assert len(approx) == SIM.N_QUERIES * SIM.TOP_K
    by_q_exact = {}
    for r in exact:
        by_q_exact.setdefault(r["q_id"], set()).add(r["nbr_id"])
    by_q_approx = {}
    for r in approx:
        by_q_approx.setdefault(r["q_id"], set()).add(r["nbr_id"])
    hits = sum(len(by_q_exact[q] & by_q_approx.get(q, set()))
               for q in by_q_exact)
    total = sum(len(v) for v in by_q_exact.values())
    recall = hits / total
    # coarse quantizer with n_probe=2 of 16 cells: recall must beat the
    # ~12.5% random-candidate floor by a wide margin
    assert recall >= 0.4, f"recall@{SIM.TOP_K} = {recall:.2f}"


def test_ivf_sims_match_bruteforce_for_hits(topk_pair):
    exact, approx = topk_pair
    exact_sim = {(r["q_id"], r["nbr_id"]): r["sim_r"] for r in exact}
    for r in approx:
        key = (r["q_id"], r["nbr_id"])
        if key in exact_sim:  # same pair -> identical rounded cosine
            assert abs(exact_sim[key] - r["sim_r"]) < 1e-9
