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


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def _cell_map(spark):
    assigned, _ = SIM.ivf_assignments(spark, SF)
    return {r["vec_id"]: r["cell"] for r in assigned.collect()}


def test_semdedup_partitions_the_corpus(spark):
    rows = SIM.semdedup(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_vecs"] for r in rows) == n
    for r in rows:
        dropped = [x for x in r["dropped"].split(",") if x]
        assert r["n_kept"] + len(dropped) == r["n_vecs"]
        assert len(set(dropped)) == len(dropped)


def test_semdedup_min_partner_rule_matches_bruteforce(spark):
    """dropped(v) <=> exists same-cell u < v with rounded cosine >= tau,
    re-derived independently from the raw vectors in python."""
    import math

    emb = {r["vec_id"]: r["embedding"]
           for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
    cell_of = _cell_map(spark)
    by_cell = {}
    for vid, c in cell_of.items():
        by_cell.setdefault(c, []).append(vid)

    def cos(u, v):
        a, b = emb[u], emb[v]
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 4)

    expected_dropped = {}
    for c, ids in by_cell.items():
        ids.sort()
        d = set()
        for i, v in enumerate(ids):
            if any(cos(u, v) >= SIM.SEMDEDUP_TAU for u in ids[:i]):
                d.add(v)
        expected_dropped[c] = d

    got = {r["cell"]: {int(x) for x in r["dropped"].split(",") if x}
           for r in SIM.semdedup(spark, SF).collect()}
    assert got == expected_dropped


def test_lsh_plane_signs_match_engine_md5(spark):
    """The literal sign arrays baked into _bucket_expr must equal the
    in-engine md5-parity derivation (which the DuckDB twin mirrors)."""
    engine = {(r["plane"], r["dim"]): r["sign"]
              for r in SIM.plane_signs(spark).collect()}
    lits = SIM._plane_sign_rows()
    assert {(p, d): lits[p][d]
            for p in range(SIM.N_PLANES)
            for d in range(SIM.N_DIMS)} == engine


def test_lsh_buckets_plan_is_narrow(spark):
    """The bucket computation must stay a per-row map over the scan —
    no exchange anywhere in the plan."""
    plan = SIM.lsh_buckets(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_semdedup_threshold_above_max_sim_keeps_everything(spark):
    rows = SIM.semdedup(spark, SF, tau=1.1).collect()
    assert all(r["n_kept"] == r["n_vecs"] and r["dropped"] == ""
               for r in rows)


def test_semdedup_default_k_matches_pinned_gate_form(spark):
    """The gate corpus (sf0.01, 500 vectors) must derive exactly the
    IVF_K floor, so the PINNED q_emb_semdedup oracle keeps describing
    the default-parameter run."""
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert SIM.semdedup_k_cells(n) == SIM.IVF_K


def test_semdedup_k_cells_bounds_per_cell_pairwise_cost():
    """The tractability invariant: with k = semdedup_k_cells(n), the
    expected per-cell pairwise work (n/k)^2 stays bounded by
    SEMDEDUP_TARGET_CELL^2 for every corpus size, so total expected
    pairwise cost (n/k)^2 * k <= SEMDEDUP_TARGET_CELL * n is LINEAR in
    the corpus — the round-6 verdict's fixed-k quadratic is gone."""
    c = SIM.SEMDEDUP_TARGET_CELL
    for n in (0, 1, c - 1, c, c + 1, 10 * c, 10**6, 10**9, 10**12):
        k = SIM.semdedup_k_cells(n)
        assert k >= SIM.IVF_K
        assert n / k <= c, (n, k)
        assert (n / k) ** 2 * k <= c * n or n == 0
    # and k actually grows: a 1000x corpus gets ~1000x the cells
    assert SIM.semdedup_k_cells(10**9) >= 1000 * SIM.semdedup_k_cells(10**6) / 2
    # the quantizer fit sample must scale with k too: KMeans cannot
    # make more clusters than training points, so a fixed sample would
    # silently cap the cell count and restore the fixed-k quadratic
    # (review finding)
    for n in (10**6, 10**9, 10**12):
        k = SIM.semdedup_k_cells(n)
        assert SIM._ivf_fit_sample(k) >= k
        assert SIM._ivf_fit_sample(k) <= max(SIM.IVF_FIT_SAMPLE,
                                             SIM.IVF_FIT_PER_CELL * k)
    # ...while the default-k value is unchanged (pin safety)
    assert SIM._ivf_fit_sample(SIM.IVF_K) == SIM.IVF_FIT_SAMPLE


def test_semdedup_explicit_k_cells_is_honored(spark):
    rows = SIM.semdedup(spark, SF, k_cells=4).collect()
    assert 0 < len(rows) <= 4
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_vecs"] for r in rows) == n
