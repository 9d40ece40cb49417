"""Local mirror of the driver's correctness gate: run every
__spark_entry__.queries() entry AND its oracle_sql() in DuckDB on the
same sf0.01 parquet, compare row count + sorted-column names +
order-insensitive value hash."""

import hashlib

import duckdb
import pytest

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(
            lambda v: f"{v:.6f}" if isinstance(v, float) else repr(v)
        )
    rows = sorted(map(tuple, pdf.to_numpy().tolist()))
    return len(rows), hashlib.md5(repr(rows).encode()).hexdigest()


def all_query_names():
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    return sorted(n for n in e.queries() if n in oracles)


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, entry_mod, duck, name):
    sdf = entry_mod.queries()[name](spark, SF)
    spdf = sdf.toPandas()
    dpdf = duck.sql(entry_mod.oracle_sql()[name]).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns), "schema mismatch"
    cs, hs = canon(spdf)
    cd, hd = canon(dpdf)
    assert cs == cd, f"row count: spark={cs} duck={cd}"
    assert hs == hd, "value hash mismatch"


def test_every_query_has_oracle_or_is_rows_only(entry_mod):
    from webtableextractionsystem_spark.entry_queries import ROWS_ONLY

    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs
    # every query is oracle-checked except the documented rows-only set
    assert qs - oracles == set(ROWS_ONLY)


def test_rows_only_queries_run(spark, entry_mod):
    from webtableextractionsystem_spark.entry_queries import ROWS_ONLY

    for name in ROWS_ONLY:
        df = entry_mod.queries()[name](spark, SF)
        assert df.count() > 0


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) == {"doc_id", "seq", "kind", "text", "media_ref",
                               "offset", "n_triples"}


def test_no_unvetted_bare_decimal_literals_in_oracles(entry_mod):
    """DuckDB parses bare decimal literals (1.0, 0.5) as DECIMAL, not
    DOUBLE — float arithmetic built on them silently diverges from
    Spark's double path (measured round 6: ~1% of swept llr inputs
    flipped; CLAUDE.md invariant). New oracle float expressions must
    use e-notation (1e0, 5e-1). This guard allows exactly the vetted
    exceptions: pinned-literal VALUES oracles (plain data, no
    arithmetic), the HLL alpha expression (the SAME string is parsed
    by BOTH engines, so both run decimal arithmetic — and the
    exhaustive domain sweep proves agreement), and bare comparison
    thresholds (one literal conversion, no arithmetic chain)."""
    import re

    from webtableextractionsystem_spark.x_oracles import X_ORACLES

    # allowlist scoped PER ORACLE (a flat set would let a new oracle
    # reintroduce `(x + 1.0)` — the exact measured bug — unnoticed)
    _hll = {"0.7213", "1.079", "256.0", "640.0", "1.0", "2.0"}
    ALLOWED = {
        "q_doc_hll_distinct": _hll,
        "q_doc_hll_by_source": _hll,
        "q_emb_neardup_pairs": {"0.3"},            # threshold compare
        "q_emb_centroid_outliers": {"0.0", "1000000.0"},
        # regex char class `0-9.-` in PII_EMAIL interpolated into the
        # oracle string — pattern text, not a numeric literal
        "q_doc_pii": {"9."},
    }
    pat = re.compile(r"(?<![\w.])(?:\d+\.\d*|\.\d+)(?![\w.eE])")
    bad = {}
    for name, sql in entry_mod.oracle_sql().items():
        if name in X_ORACLES:        # pinned literal VALUES rows
            continue
        stripped = re.sub(r"--[^\n]*", "", sql)   # drop SQL comments
        hits = set(pat.findall(stripped)) - ALLOWED.get(name, set())
        if hits:
            bad[name] = sorted(hits)
    assert not bad, f"bare decimal literals in oracle arithmetic: {bad}"


def test_no_session_timezone_dependent_exprs_in_oracles(entry_mod):
    """DuckDB's to_timestamp() returns TIMESTAMP WITH TIME ZONE, so any
    strftime/string rendering of it follows the gate host's session
    TimeZone — while the Spark side is pinned UTC
    (spark.sql.session.timeZone). On a non-UTC host every rendered hour
    shifts and the value hash mismatches (caught round 6 in
    EVENT_ANOMALIES_SQL; verified: '1969-12-31 20:00:00' vs
    '1970-01-01 01:00:00' under America/New_York). Epoch->string must
    route through make_timestamp(us), which returns plain TIMESTAMP;
    NTZ parquet columns formatted directly are already safe."""
    bad = {name for name, sql in entry_mod.oracle_sql().items()
           if "to_timestamp(" in sql.lower()}
    assert not bad, (
        f"session-timezone-dependent to_timestamp() in oracles: {bad} — "
        "use make_timestamp(epoch_s * 3600 * 1000000)-style plain "
        "TIMESTAMP construction instead")
