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
