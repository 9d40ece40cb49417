"""Seeded fuzz differential for the events/relational family.

150 random events with adversarial shapes the fixed testdata never
produces — duplicate timestamps (as-of and sessionize tie bait),
identical-second bursts, single-event users, empty/odd JSON props,
boundary hours — through every events-family operator in BOTH engines.
The same net that caught the lower()/\\x0B divergences in the text
family (tests/test_quality_filters.py).
"""

import datetime as dt
import json
import random

import duckdb
import pandas as pd

from webtableextractionsystem_spark.operators import relational as REL


def _fuzz_events(n=150, seed=17):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    ts = base
    for i in range(n):
        # bursts: 30% chance the timestamp REPEATS exactly (tie bait),
        # else jump 0-2000 s (gap/session boundary bait)
        if i and rng.random() < 0.3:
            pass  # identical ts
        else:
            ts = ts + dt.timedelta(seconds=rng.randint(0, 2000),
                                   microseconds=rng.randint(0, 999999))
        rows.append((
            i, ts,
            rng.randint(1, 8),                       # few users -> collisions
            rng.choice(["view", "click", "signup", "purchase", "error"]),
            round(rng.uniform(0, 200), 2),
            json.dumps({"k": rng.randint(0, 99)}),
        ))
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"])


def _canon(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(
            lambda v: f"{v:.6f}" if isinstance(v, float) else repr(v))
    return sorted(map(tuple, pdf.to_numpy().tolist()))


def test_fuzz_cross_engine_events_battery(spark, tmp_path):
    pdf = _fuzz_events()
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(2).write.mode("overwrite") \
        .parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.register("events", pdf)

    battery = [
        ("hourly", REL.events_hourly, REL.EVENTS_HOURLY_SQL),
        ("json_props", REL.events_json_props, REL.EVENTS_JSON_SQL),
        ("user_profiles", REL.user_profiles, REL.USER_PROFILES_SQL),
        ("sessions", REL.event_sessions, REL.EVENT_SESSIONS_SQL),
        ("closed_sessions", REL.closed_sessions, REL.CLOSED_SESSIONS_SQL),
        ("interval_join", REL.event_interval_join,
         REL.EVENT_INTERVAL_JOIN_SQL),
        ("retention", REL.event_retention, REL.EVENT_RETENTION_SQL),
        ("anomalies", REL.event_anomalies, REL.EVENT_ANOMALIES_SQL),
        ("attribution", REL.event_attribution, REL.EVENT_ATTRIBUTION_SQL),
        ("funnel", REL.event_funnel, REL.EVENT_FUNNEL_SQL),
        ("asof", REL.event_asof_join, REL.EVENT_ASOF_SQL),
    ]
    diverged = {}
    for name, fn, sql in battery:
        s = _canon(fn(spark, sf_dir).toPandas())
        d = _canon(con.sql(sql).df())
        if s != d:
            firsts = [(a, b) for a, b in zip(s, d) if a != b][:2]
            diverged[name] = (len(s), len(d), firsts)
    assert not diverged, f"cross-engine fuzz divergence: {diverged}"


def test_fuzz_cross_engine_embeddings_battery(spark, tmp_path):
    """Seeded fuzz for the SQL-oracled similarity operators with
    deliberate cosine-TIE bait: exact duplicate vectors, sign-flipped
    and scaled copies (same direction -> same cosine), plus random
    vectors. Zero vectors are excluded — a degenerate embedding is out
    of the operator domain (cosine is undefined), and the model-output
    contract never produces one."""
    import random

    from webtableextractionsystem_spark.operators import similarity as SIM

    rng = random.Random(19)
    dim = 64          # the operators' embedding-dimension contract
    vecs = []
    for i in range(60):
        if i >= 3 and rng.random() < 0.25:
            src = vecs[rng.randrange(len(vecs))]
            mode = rng.random()
            if mode < 0.4:
                v = list(src)                       # exact duplicate
            elif mode < 0.7:
                v = [x * 2.0 for x in src]          # same direction
            else:
                v = [-x for x in src]               # antipode
        else:
            v = [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
            if all(abs(x) < 1e-6 for x in v):
                v[0] = 1.0
        vecs.append(v)
    pdf = pd.DataFrame({
        "vec_id": range(len(vecs)),
        "embedding": vecs,
        "label": [rng.randint(0, 3) for _ in vecs],
    })
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(2).write.mode("overwrite") \
        .parquet(f"{sf_dir}/embeddings.parquet")
    # register from the SAME parquet bytes Spark reads (pandas object
    # columns of python lists register with NULL-laden inference)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')")

    battery = [
        ("topk", SIM.topk_bruteforce, SIM.TOPK_SQL),
        ("lsh_buckets", SIM.lsh_buckets, SIM.LSH_BUCKETS_SQL),
        ("neardup_pairs", SIM.neardup_pairs, SIM.neardup_pairs_sql()),
        ("centroid_outliers", SIM.centroid_outliers,
         SIM.CENTROID_OUTLIERS_SQL),
    ]
    diverged = {}
    for name, fn, sql in battery:
        s = _canon(fn(spark, sf_dir).toPandas())
        d = _canon(con.sql(sql).df())
        if s != d:
            firsts = [(a, b) for a, b in zip(s, d) if a != b][:2]
            diverged[name] = (len(s), len(d), firsts)
    assert not diverged, f"cross-engine fuzz divergence: {diverged}"
