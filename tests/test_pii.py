"""PII redaction + PMI collocation tests.

The synthetic documents corpus is digit-free, so the driver's oracle
row for q_doc_pii pins only the no-op path (counts 0, md5 of unchanged
text). The crafted differential here is where the match semantics are
actually exercised: the SAME adversarial rows go through the Spark
expression and the DuckDB oracle SQL, and every stage (counts AND the
redacted text itself, not just its md5) must agree byte-for-byte —
Java regex vs RE2 is exactly the class of silent cross-engine
divergence the tokenizer \\x0B finding came from.
"""

import duckdb
import pandas as pd
import pytest

from webtableextractionsystem_spark.operators import textstats as TS

SF001 = "/root/testdata/sf0.001"

CRAFTED = [
    (0, "contact john.doe+spam@example.co.uk or admin@sub.host.org now"),
    (1, "server at 192.168.0.1 and 10.0.0.255. ping both"),
    (2, "call +1 (555) 123-4567 today or 020 7946 0958 later"),
    (3, "local part 1.2.3.4@example.com is an EMAIL not an ip"),
    (4, "out of range 999.999.999.999 still redacts (no octet check)"),
    (5, "12345678 is phone-shaped, 1234567 is one digit too short"),
    (6, "a@b.c has a one-letter tld and must NOT match"),
    (7, "联系 zhang.san@example.cn 或拨打 +86 10 1234 5678 咨询"),
    (8, "no pii here at all"),
    (9, "v1.2 section 3.4 versions are not IPs (only 4 dotted octets)"),
    (10, "edge 1.2.3.4 starts and ends 5.6.7.8"),
    (11, "  (555) 123-4567 parens lead; trailing +44 20 7946 0958"),
]


def _spark_pii(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "doc_id long, text string")
    t0 = F.col("text")
    t1, t2, t3 = TS._pii_stages(t0)
    return (
        df.select(
            "doc_id",
            F.regexp_count(t0, F.lit(TS.PII_EMAIL)).cast("int")
            .alias("n_email"),
            F.regexp_count(t1, F.lit(TS.PII_IP)).cast("int").alias("n_ip"),
            F.regexp_count(t2, F.lit(TS.PII_PHONE)).cast("int")
            .alias("n_phone"),
            t3.alias("redacted"),
        )
        .orderBy("doc_id")
        .toPandas()
    )


def _duck_pii(rows):
    con = duckdb.connect()
    documents = pd.DataFrame(rows, columns=["doc_id", "text"])
    con.register("documents", documents)
    return con.sql(rf"""
        WITH s1 AS (
          SELECT doc_id, text AS t0,
                 regexp_replace(text, '{TS.PII_EMAIL}', '<EMAIL>', 'g') AS t1
          FROM documents),
        s2 AS (SELECT *, regexp_replace(t1, '{TS.PII_IP}', '<IP>', 'g') AS t2
               FROM s1),
        s3 AS (SELECT *,
                 regexp_replace(t2, '{TS.PII_PHONE}', '<PHONE>', 'g') AS t3
               FROM s2)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t0, '{TS.PII_EMAIL}'))
                    AS INTEGER) AS n_email,
               CAST(len(regexp_extract_all(t1, '{TS.PII_IP}'))
                    AS INTEGER) AS n_ip,
               CAST(len(regexp_extract_all(t2, '{TS.PII_PHONE}'))
                    AS INTEGER) AS n_phone,
               t3 AS redacted
        FROM s3 ORDER BY doc_id
    """).df()


def test_pii_crafted_cross_engine_differential(spark):
    s = _spark_pii(spark, CRAFTED)
    d = _duck_pii(CRAFTED)
    for col in ("n_email", "n_ip", "n_phone", "redacted"):
        assert list(s[col]) == list(d[col]), (
            f"cross-engine divergence in {col}:\n"
            f"spark={list(s[col])}\nduck ={list(d[col])}")


def test_pii_redaction_semantics(spark):
    s = _spark_pii(spark, CRAFTED).set_index("doc_id")
    # emails (incl. dotted-digit local part claimed BEFORE the IP stage)
    assert s.loc[0, "n_email"] == 2 and "<EMAIL>" in s.loc[0, "redacted"]
    assert s.loc[3, "n_email"] == 1 and s.loc[3, "n_ip"] == 0
    assert "@" not in s.loc[3, "redacted"]
    # one-letter TLD is not an email
    assert s.loc[6, "n_email"] == 0 and s.loc[6, "redacted"] == CRAFTED[6][1]
    # IPs, including boundary positions and no-octet-range documented form
    assert s.loc[1, "n_ip"] == 2
    assert s.loc[4, "n_ip"] == 1
    assert s.loc[10, "n_ip"] == 2
    assert s.loc[9, "n_ip"] == 0  # version-ish dotted pairs don't match
    # phone-shaped digit runs: length gate, parens/spaces/hyphens/plus
    assert s.loc[5, "n_phone"] == 1
    assert "1234567 is one digit too short" in s.loc[5, "redacted"]
    assert s.loc[2, "n_phone"] >= 2
    assert s.loc[8].tolist() == [0, 0, 0, CRAFTED[8][1]]
    # CJK context: the email and the +86 run both redact
    assert s.loc[7, "n_email"] == 1 and s.loc[7, "n_phone"] == 1
    # redacted text never retains a digit once all three stages ran,
    # except digit runs too short for any pattern
    assert "192.168" not in s.loc[1, "redacted"]


def test_pii_redacted_is_the_final_stage(spark):
    """pii_redacted (the corpus-map transform) must equal the third
    _pii_stages output pii_stats audits — exercised over the crafted
    rows so a stage-index regression in the helper cannot ship silently."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(CRAFTED, "doc_id long, text string")
    out = df.select(
        "doc_id",
        TS.pii_redacted(F.col("text")).alias("via_helper"),
        TS._pii_stages(F.col("text"))[2].alias("via_stages"),
    ).collect()
    assert all(r.via_helper == r.via_stages for r in out)
    byid = {r.doc_id: r.via_helper for r in out}
    assert byid[8] == CRAFTED[8][1]          # no-PII row passes through
    assert "<EMAIL>" in byid[0] and "<IP>" in byid[1]
    assert "<PHONE>" in byid[2]


def test_pii_stats_is_noop_on_digit_free_corpus(spark):
    out = TS.pii_stats(spark, SF001).toPandas()
    assert (out[["n_email", "n_ip", "n_phone"]].to_numpy() == 0).all()
    # md5 equals the md5 of the UNTOUCHED text (the no-op pin the
    # driver row freezes)
    import hashlib

    raw = (spark.read.parquet(f"{SF001}/documents.parquet")
           .select("doc_id", "text").toPandas())
    exp = {r.doc_id: hashlib.md5(r.text.encode()).hexdigest()
           for r in raw.itertuples()}
    got = dict(zip(out.doc_id, out.redacted_md5))
    assert got == exp


def test_pmi_topk_matches_bruteforce(spark):
    """Exact integer counts + the lift ranking reproduced in pure
    Python over sf0.001: pins the SEMANTICS (the cross-engine
    bit-equality is the oracle-parity test's job)."""
    import re
    from collections import Counter

    texts = [r.text for r in
             spark.read.parquet(f"{SF001}/documents.parquet")
             .select("text").collect()]
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = re.split(r"[ \t\n\f\r]+", t.strip())
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n_uni = sum(uni.values())
    n_bi = sum(bi.values())
    exp = []
    for (x, y), c in bi.items():
        if c < TS.PMI_MIN_COOC:
            continue
        lift = (float(c) * n_uni * n_uni) / (float(n_bi) * uni[x] * uni[y])
        exp.append((x, y, c, lift))
    exp.sort(key=lambda r: (-round(r[3], 4), r[0], r[1]))
    exp = exp[:TS.PMI_TOP_K]

    got = TS.pmi_topk(spark, SF001).collect()
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert (g.x, g.y, g.c_xy) == e[:3]
        assert g.lift == pytest.approx(round(e[3], 4), abs=1e-9)


def test_pmi_lift_expression_has_no_transcendentals():
    """The documented float discipline: no ln/log/exp anywhere in the
    PMI oracle (ranking uses the exact lift; see pmi_topk docstring)."""
    import re

    assert not re.search(r"\b(ln|log|exp)\s*\(", TS.PMI_TOPK_SQL)
