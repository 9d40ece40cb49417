"""The registry rotation contract, pinned as tests: the driver's
correctness gate hashes exactly the FIRST 50 entries of
entry_queries.queries(), so the ORDER is load-bearing. These tests
force any future registry edit to re-verify the 50-boundary and keep
the queries() docstring's tail list honest — both were manual
re-check steps before (and the docstring itself demands them).

When rotating for a new round, update _EXPECTED_TAIL here in the same
commit: this test failing IS the reminder.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_EXPECTED_TAIL = {
    # round-6 tail (30 entries) — see the queries() docstring for the
    # per-entry twin reasoning; all were driver-rowed green in r05
    # (bigram_lm rotated out late-round to admit the new q_emb_semdedup)
    "q_doc_repeated_ngrams", "q_doc_bigram_lm", "q_rel_rollup",
    "q_rel_exists",
    "q_events_closed_sessions", "q_doc_length_quantiles",
    "q_rel_revenue_by_nation", "q_rel_anti_join",
    "q_emb_topk_cosine", "q_emb_neardup_pairs", "q_emb_ivf_topk",
    "q_emb_ivf_recall", "q_emb_centroid_outliers",
    "q_doc_lsh_pairs", "q_doc_neardup_canonical",
    "q_doc_neardup_components", "q_doc_decontaminate",
    "q_doc_curation_funnel",
    "x_spans_by_kind", "x_tables_by_type", "x_triples_by_rel",
    "x_entities_fused", "x_doc_totals", "x_table_records",
    "x_url_filter", "x_media_features", "x_audio_features",
    "x_video_features", "x_tables_docx", "x_er_graph",
}


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_order_and_tail_match_documentation():
    mod = _entry_mod()
    qs = list(mod.queries())
    assert len(qs) == 80
    tail = set(qs[50:])
    assert tail == _EXPECTED_TAIL, (
        "registry tail drifted from the documented rotation — update "
        "the queries() docstring AND _EXPECTED_TAIL together: "
        f"extra={sorted(tail - _EXPECTED_TAIL)}, "
        f"missing={sorted(_EXPECTED_TAIL - tail)}")


def test_every_query_is_oracled_and_rows_only_stays_empty():
    mod = _entry_mod()
    qs = list(mod.queries())
    orc = mod.oracle_sql()
    missing = [q for q in qs if q not in orc]
    assert not missing, f"queries without oracles: {missing}"
    from webtableextractionsystem_spark.entry_queries import (
        PINNED,
        ROWS_ONLY,
    )
    assert not ROWS_ONLY, "pin, don't exempt (CLAUDE.md invariant)"
    assert set(PINNED) <= set(qs)
