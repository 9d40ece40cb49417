"""Gopher-rule + C4-cleaning tests.

The synthetic documents corpus is single-line, symbol-free prose, so
the driver's oracle rows for q_doc_gopher_rules / q_doc_c4_clean pin
mostly the word-count/stopword paths. The crafted differential here is
where the line/symbol/terminal-punctuation semantics are actually
exercised: the SAME adversarial rows go through the Spark expression
and the DuckDB oracle SQL and must agree byte-for-byte (the test_pii.py
pattern for corpus-blind semantics).
"""

import duckdb
import pandas as pd

from webtableextractionsystem_spark.operators import textstats as TS

# 60 plain words incl. >=2 Gopher stopwords — passes every Gopher rule
_GOOD = ("the quick brown fox jumps over that lazy dog again and again "
         * 5).strip()

CRAFTED = [
    (0, _GOOD),
    (1, "too few words to pass the word count rule"),
    (2, " ".join(["supercalifragilistic"] * 60)),          # mean len > 10
    (3, _GOOD + " " + "#" * 40),                           # symbol ratio
    (4, "\n".join(["- bullet item here"] * 10)),           # all bullet lines
    (5, _GOOD + "\n" + "\n".join(["trailing off..."] * 9)),  # ellipsis lines
    (6, " ".join(["12345"] * 60)),                         # no alpha words
    (7, " ".join(["word"] * 60)),                          # no stopwords
    # C4 shapes: terminal punct, short lines, javascript, braces, lorem
    (8, "This is a sentence that clearly ends with punctuation.\n"
        "short line.\n"
        "no terminal punctuation on this line at all\n"
        "Enable javascript to view this page properly.\n"
        'He said "this quoted line has enough words to keep."\n'
        "Another full sentence with plenty of words in it!\n"
        "And a third full sentence with plenty of words in it?"),
    (9, "A doc with code braces { should be dropped entirely. "
        "Even when it has sentences. Three of them, in fact."),
    (10, "Lorem Ipsum is simply dummy text of the printing industry.\n"
         "It has survived five centuries of typesetting practice.\n"
         "It was popularised in the sixties with Letraset sheets."),
    (11, ""),                                              # empty doc
    (12, "word\x0bword has a vertical tab that is NOT a separator."),
    (13, "Line ends with spaces after the period .   \n"
         "A second proper sentence sits right here today.\n"
         "A third proper sentence sits right here today.\n"
         "A fourth proper sentence sits right here today."),
]


def _register(tmp_path, spark):
    pdf = pd.DataFrame(CRAFTED, columns=["doc_id", "text"])
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite") \
        .parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.register("documents", pdf)
    return sf_dir, con


def _canon(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    return sorted(map(tuple, pdf.astype(str).to_numpy().tolist()))


def test_gopher_crafted_cross_engine_differential(spark, tmp_path):
    sf_dir, con = _register(tmp_path, spark)
    s = _canon(TS.gopher_rules(spark, sf_dir).toPandas())
    d = _canon(con.sql(TS.GOPHER_RULES_SQL).df())
    assert s == d


def test_c4_crafted_cross_engine_differential(spark, tmp_path):
    sf_dir, con = _register(tmp_path, spark)
    s = _canon(TS.c4_clean(spark, sf_dir).toPandas())
    d = _canon(con.sql(TS.C4_CLEAN_SQL).df())
    assert s == d


def test_gopher_rule_semantics(spark, tmp_path):
    sf_dir, _ = _register(tmp_path, spark)
    out = (TS.gopher_rules(spark, sf_dir).toPandas()
           .set_index("doc_id").sort_index())
    assert bool(out.loc[0, "keep"])           # the clean doc passes
    assert not out.loc[[1, 2, 3, 4, 6, 7], "keep"].any()
    # doc 5: 9 ellipsis lines of 10 -> 10*9 > 3*10 fails the line rule
    assert not bool(out.loc[5, "keep"])
    assert out.loc[5, "n_ellipsis_lines"] == 9
    assert out.loc[4, "n_bullet_lines"] == 10
    assert out.loc[6, "n_alpha_words"] == 0
    assert out.loc[0, "n_stopwords"] >= 2 and out.loc[7, "n_stopwords"] == 0
    # empty doc: zero words fails the word-count floor
    assert out.loc[11, "n_words"] <= 1 and not bool(out.loc[11, "keep"])
    # \x0b is NOT a token separator (explicit-class tokenizer contract):
    # "word\x0bword" stays ONE token, so the line has 10 tokens not 11
    assert out.loc[12, "n_words"] == 10


def test_c4_clean_semantics(spark, tmp_path):
    sf_dir, _ = _register(tmp_path, spark)
    out = (TS.c4_clean(spark, sf_dir).toPandas()
           .set_index("doc_id").sort_index())
    # doc 8: 7 lines; kept = 4 (drops the short line, the no-terminal
    # line, and the javascript line); >=3 sentences -> keep
    assert out.loc[8, "n_lines"] == 7
    assert out.loc[8, "n_kept"] == 4
    assert bool(out.loc[8, "keep"])
    # braces and lorem-ipsum docs are dropped at the document level
    assert not bool(out.loc[9, "keep"])
    assert not bool(out.loc[10, "keep"])
    assert out.loc[10, "n_kept"] == 3       # lines survive; the DOC fails
    # trailing spaces after the period: trimming makes the line keepable
    assert out.loc[13, "n_kept"] == 4
    assert bool(out.loc[13, "keep"])
    # empty doc: one empty line, nothing kept, md5('') pins the empty path
    assert out.loc[11, "n_kept"] == 0
    assert out.loc[11, "cleaned_md5"] == "d41d8cd98f00b204e9800998ecf8427e"


def test_gopher_integer_discipline():
    """No float anywhere in the Gopher oracle (the documented
    cross-engine discipline: ratio thresholds as cross-multiplication)."""
    import re

    assert not re.search(r"(?<![\w.])\d+\.\d", TS.GOPHER_RULES_SQL)


def test_mixture_weights_semantics(spark):
    """T=2 temperature mixture over sf0.001: shares sum to ~1, an
    above-average-token source downsamples (rate < 1) while a
    below-average one upsamples (rate > 1), and the natural-share
    identity rate = target_share / natural_share holds to the 4dp
    rounding."""
    out = (TS.mixture_weights(spark, "/root/testdata/sf0.001")
           .toPandas().set_index("source"))
    assert abs(out["target_share"].sum() - 1.0) < 5e-4 * len(out)
    tot = out["total_tokens"].sum()
    sum_sqrt = out["tok_sqrt"].sum()
    for src, r in out.iterrows():
        nat = r["total_tokens"] / tot
        assert r["sample_rate"] == round(
            (float(r["tok_sqrt"]) * tot)
            / (float(sum_sqrt) * r["total_tokens"]), 4)
        # direction: sqrt flattening up-samples small, down-samples big
        if nat > out["target_share"].loc[src]:
            assert r["sample_rate"] <= 1.0 + 1e-9
        elif nat < out["target_share"].loc[src]:
            assert r["sample_rate"] >= 1.0 - 1e-9
    # perfect-square edge: floor(sqrt) is exact (no off-by-one from the
    # double path) for every observed count
    import math

    for _, r in out.iterrows():
        assert r["tok_sqrt"] == math.isqrt(int(r["total_tokens"]))


# ---------------------------------------------------------------------------
# Seeded fuzz differential: 200 random documents over the DOCUMENTED
# input alphabet (printable ASCII incl. quotes/braces/#, CJK, the
# whitespace set, and \x0B — the Java-vs-RE2 divergence char) through
# the three per-row batteries in BOTH engines. Deterministic (seed 7),
# one Spark round-trip per operator — systematic coverage of the
# combinations the hand-crafted rows cannot enumerate.
# ---------------------------------------------------------------------------

_FUZZ_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n\f\r\x0b"
    ".!?\"'(){}[]#@+-_%/\\:;,…•*<>"
    "的一是不了人我在有他这中大来上国兄弟姓名关系"
    "éßİ"   # é ß İ — case/width edge chars
)


def _fuzz_rows(n=200, seed=7):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        length = rng.randint(0, 400)
        rows.append((i, "".join(rng.choice(_FUZZ_ALPHABET)
                                for _ in range(length))))
    return rows


def _fuzz_register(tmp_path, spark, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(2).write.mode("overwrite") \
        .parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.register("documents", pdf)
    return sf_dir, con


def test_fuzz_cross_engine_gopher(spark, tmp_path):
    sf_dir, con = _fuzz_register(tmp_path, spark, _fuzz_rows())
    s = _canon(TS.gopher_rules(spark, sf_dir).toPandas())
    d = _canon(con.sql(TS.GOPHER_RULES_SQL).df())
    assert s == d


def test_fuzz_cross_engine_c4(spark, tmp_path):
    sf_dir, con = _fuzz_register(tmp_path, spark, _fuzz_rows())
    s = _canon(TS.c4_clean(spark, sf_dir).toPandas())
    d = _canon(con.sql(TS.C4_CLEAN_SQL).df())
    assert s == d


def test_fuzz_cross_engine_pii(spark, tmp_path):
    sf_dir, con = _fuzz_register(tmp_path, spark, _fuzz_rows())
    s = _canon(TS.pii_stats(spark, sf_dir).toPandas())
    d = _canon(con.sql(TS.PII_STATS_SQL).df())
    assert s == d


def test_fuzz_cross_engine_per_row_battery(spark, tmp_path):
    """The same seeded fuzz corpus through EVERY other per-row oracled
    text operator (token stats, quality band, lang-id, fingerprints,
    BPE-ish tokens, rolling hashes, repetition, length buckets) — one
    Spark round-trip each, byte-equal against its DuckDB oracle. This
    is the standing regression net for the Java-vs-RE2 class of silent
    divergence (the \\x0B tokenizer and md5-normalizer findings came
    from exactly these expressions)."""
    import random

    rng = random.Random(11)
    rows = [(i, t, rng.choice(["zh", "en", "unk"]))
            for i, t in _fuzz_rows(n=150, seed=11)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(2).write.mode("overwrite") \
        .parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.register("documents", pdf)

    battery = [
        ("token_stats", TS.token_stats, TS.TOKEN_STATS_SQL),
        ("quality", TS.quality_stats, TS.QUALITY_SQL),
        ("lang_id", TS.lang_id, TS.LANG_ID_SQL),
        ("fingerprint", TS.fingerprints, TS.FINGERPRINT_SQL),
        ("bpe_tokens", TS.bpe_token_stats, TS.BPE_TOKENS_SQL),
        ("rolling_hash", TS.rolling_fingerprints, TS.ROLLING_SQL),
        ("repetition", TS.repetition_stats, TS.REPETITION_SQL),
        ("length_buckets", TS.length_buckets, TS.LENGTH_BUCKETS_SQL),
    ]
    diverged = {}
    for name, fn, sql in battery:
        s = _canon(fn(spark, sf_dir).toPandas())
        d = _canon(con.sql(sql).df())
        if s != d:
            first = next((a, b) for a, b in zip(s, d) if a != b)
            diverged[name] = first
    assert not diverged, f"cross-engine fuzz divergence: {diverged}"


def test_fuzz_cross_engine_aggregation_battery(spark, tmp_path):
    """The seeded fuzz corpus through the AGGREGATION-family text
    operators (signatures, shingle pipelines, sketches, rollups) —
    anything whose normalizers/tokenizers could diverge between
    engines on inputs the synthetic corpus never produces."""
    import random

    from webtableextractionsystem_spark.operators import dedup as DD

    rng = random.Random(13)
    rows = [(i, t, rng.choice(["zh", "en", "unk"]),
             f"src{rng.randint(0, 4)}")
            for i, t in _fuzz_rows(n=150, seed=13)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(2).write.mode("overwrite") \
        .parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.register("documents", pdf)

    battery = [
        ("exact_dedup", DD.exact_dedup, DD.EXACT_DEDUP_SQL),
        ("minhash", DD.minhash_signatures, DD.minhash_sql()),
        ("simhash", DD.simhash_signatures, DD.simhash_sql()),
        ("lsh_bands", DD.lsh_band_keys, DD.lsh_band_keys_sql()),
        ("ngram_jaccard", DD.ngram_jaccard_pairs, DD.ngram_jaccard_sql()),
        ("repeated_ngrams", DD.repeated_ngrams, DD.repeated_ngrams_sql()),
        ("winnowing", DD.winnowing_fingerprints, DD.winnowing_sql()),
        ("fingerprint", TS.fingerprints, TS.FINGERPRINT_SQL),
        ("bigram_lm", TS.bigram_lm_score, TS.BIGRAM_LM_SQL),
        ("top_terms", TS.top_terms_per_source, TS.TOP_TERMS_SQL),
        ("inverted_index", TS.inverted_index_stats, TS.INVERTED_INDEX_SQL),
        ("source_stats", TS.source_stats, TS.SOURCE_STATS_SQL),
        ("hll_distinct", TS.hll_distinct, TS.HLL_DISTINCT_SQL),
        ("cms_heavy_hitters", TS.cms_heavy_hitters,
         TS.CMS_HEAVY_HITTERS_SQL),
    ]
    diverged = {}
    for name, fn, sql in battery:
        s = _canon(fn(spark, sf_dir).toPandas())
        d = _canon(con.sql(sql).df())
        if s != d:
            firsts = [(a, b) for a, b in zip(s, d) if a != b][:2]
            diverged[name] = (len(s), len(d), firsts)
    assert not diverged, f"cross-engine fuzz divergence: {diverged}"


def test_winnowing_guarantee_and_edges(spark, tmp_path):
    """The Schleimer guarantee: two documents sharing a token run of
    t = WINNOW_W + WINNOW_K - 1 tokens select at least one COMMON
    fingerprint. Plus the edge branches: gram-less docs select nothing
    (md5('') digest), and docs with grams but fewer than WINNOW_W
    windows select exactly the global min (n_selected == 1)."""
    from webtableextractionsystem_spark.operators import dedup as DD

    t = DD.WINNOW_W + DD.WINNOW_K - 1
    shared = " ".join(f"s{i}" for i in range(t))
    rows = [
        (0, "alpha beta gamma " + shared + " delta epsilon"),
        (1, "zeta eta " + shared + " theta iota kappa"),
        (2, "too short"),                       # < WINNOW_K tokens
        (3, " ".join(f"w{i}" for i in range(DD.WINNOW_K + 1))),  # 2 grams
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite") \
        .parquet(f"{sf_dir}/documents.parquet")

    out = (DD.winnowing_fingerprints(spark, sf_dir).toPandas()
           .set_index("doc_id").sort_index())
    assert out.loc[2, "n_grams"] == 0
    assert out.loc[2, "fp_digest"] == "d41d8cd98f00b204e9800998ecf8427e"
    assert out.loc[3, "n_grams"] == 2 and out.loc[3, "n_selected"] == 1

    # the guarantee needs the SETS, not just digests: recompute the
    # selected values in python from the same definition
    import hashlib

    def select(text):
        toks = text.split()
        grams = [" ".join(toks[i:i + DD.WINNOW_K])
                 for i in range(len(toks) - DD.WINNOW_K + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
              for g in grams]
        if not hs:
            return set()
        if len(hs) < DD.WINNOW_W:
            return {min(hs)}
        return {min(hs[j:j + DD.WINNOW_W])
                for j in range(len(hs) - DD.WINNOW_W + 1)}

    s0, s1 = select(rows[0][1]), select(rows[1][1])
    assert s0 & s1, "shared t-token run must share a fingerprint"
    # and the python twin reproduces the Spark digests exactly
    for i, text in rows:
        sel = sorted(select(text))
        dig = hashlib.md5(",".join(str(v) for v in sel).encode()).hexdigest()
        assert out.loc[i, "fp_digest"] == dig
