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
    # round-7 tail (36 entries) — see the queries() docstring for the
    # per-entry twin reasoning; all were driver-rowed green in r06.
    # queue_batch/name_union/stratified_sample/anomalies/retention/
    # json_props were pushed out mid-round to make prefix room for the
    # six NEW round-7 entries (pii, pmi_topk, gopher_rules, c4_clean,
    # mixture_weights, winnowing)
    "q_rel_queue_batch", "q_rel_name_union",
    "q_doc_stratified_sample", "q_events_anomalies",
    "q_events_retention", "q_events_json_props",
    "q_doc_neardup_components_lsss", "q_doc_simhash_pairs",
    "q_rel_top_orders", "q_rel_pricing_summary", "q_emb_lsh_buckets",
    "q_doc_minhash", "q_doc_ngram_jaccard", "q_doc_exact_dedup",
    "q_doc_lsh_bands", "q_doc_simhash", "q_doc_chunks",
    "q_doc_pack_sequences", "q_doc_cms_heavy_hitters",
    "q_doc_token_stats", "q_doc_quality", "q_doc_lang_id",
    "q_doc_fingerprint", "q_doc_bpe_tokens", "q_doc_rolling_hash",
    "q_doc_repetition", "q_doc_sample", "q_doc_length_buckets",
    "q_doc_top_terms", "q_doc_inverted_index", "q_doc_source_stats",
    "q_doc_quantile_sketch", "q_doc_ngram_clean", "q_doc_bm25_topk",
    "q_doc_dsir_weights", "q_doc_hll_distinct",
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
    assert len(qs) == 86
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
