"""Full local rehearsal of the driver's verification gate: run entry()
plus every queries() entry against its oracle_sql() in DuckDB, exactly
as CORRECTNESS_r{N} is produced.

    python tools/rehearse_gate.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(
            lambda v: f"{v:.6f}" if isinstance(v, float) else repr(v))
    rows = sorted(map(tuple, pdf.to_numpy().tolist()))
    return len(rows), hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false").getOrCreate())
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    t0 = time.monotonic()
    n = mod.entry(spark).count()
    print(f"entry: {n} rows in {time.monotonic() - t0:.1f}s")

    qs, orc = mod.queries(), mod.oracle_sql()
    failures = []
    t_all = time.monotonic()
    for name in sorted(qs):
        t0 = time.monotonic()
        spdf = qs[name](spark, sf_dir).toPandas()
        if name in orc:
            match = canon(spdf) == canon(con.sql(orc[name]).df())
            kind = "oracle"
        else:
            match = len(spdf) > 0
            kind = "rows-only"
        status = "OK " if match else "FAIL"
        print(f"{status} {name:26s} {len(spdf):6d} rows "
              f"{time.monotonic() - t0:5.1f}s ({kind})")
        if not match:
            failures.append(name)
    print(f"TOTAL: {len(qs) - len(failures)} ok, {len(failures)} fail "
          f"in {time.monotonic() - t_all:.0f}s")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
