"""The packed-accumulator / struct-accumulator in-row folds must match
a straightforward Python simulation on adversarial inputs — bursts
tighter than the refill rate, duplicate timestamps, short series. The
oracle gate proves Spark==DuckDB on the driver data; this proves both
equal the REFERENCE SEMANTICS (a token bucket / Holt's equations as
you'd write them imperatively), so an encoding bug shared by both
plan and oracle cannot hide.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from kinesis_s3_data_shipper_spark.plans import REGISTRY, all_queries
from kinesis_s3_data_shipper_spark.plans.events import (_TB_CAP_UNITS,
                                                        _TB_REFILL_NS)

all_queries()


@pytest.fixture(scope="module")
def fold_sf_dir(spark, tmp_path_factory):
    """Stage an events table of crafted per-user series: tight bursts
    (seconds apart — guaranteed rejections), sparse tails, duplicate
    timestamps, and a minimum-length-4 series."""
    rng = np.random.default_rng(20260815)
    rows = []
    eid = 0
    base = 1_700_000_000_000_000  # epoch micros
    for uid in range(40):
        n = int(rng.integers(4, 50))
        t = base + int(rng.integers(0, 10**9))
        for _ in range(n):
            burst = rng.random() < 0.4
            step_us = (int(rng.integers(0, 5_000_000)) if burst
                       else int(rng.integers(1, 40_000_000_000)))
            t += step_us
            rows.append((eid, t, uid, "view",
                         float(np.round(rng.normal(50, 20), 3)), "{}"))
            eid += 1
    d = tmp_path_factory.mktemp("fold_events")
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long,"
              " event_type string, value double, props string")
    (df.selectExpr("event_id", "timestamp_micros(ts_us) AS ts",
                   "user_id", "event_type", "value", "props")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(str(d), "events.parquet")))
    return str(d)


def _series(spark, sf_dir):
    from kinesis_s3_data_shipper_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")  # ts -> epoch nanos long
    rows = ev.select("user_id", "ts", "event_id", "value").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    return {u: sorted(v) for u, v in by_user.items()}


def test_rate_limit_fold_matches_python_reference(spark, fold_sf_dir):
    got = {r.user_id: r for r in
           REGISTRY["events_rate_limit"].spark(spark, fold_sf_dir).collect()}
    series = _series(spark, fold_sf_dir)
    assert set(got) == set(series)
    any_rejected = False
    for uid, evs in series.items():
        level, admitted, last = 0, 0, None
        for ts, _eid, _v in evs:
            dt = _TB_CAP_UNITS if last is None else ts - last
            level = min(_TB_CAP_UNITS, level + dt)
            if level >= _TB_REFILL_NS:
                admitted += 1
                level -= _TB_REFILL_NS
            last = ts
        r = got[uid]
        assert r.n_events == len(evs)
        assert r.n_admitted == admitted, uid
        assert r.n_rejected == len(evs) - admitted
        assert r.level_final_units == level, uid
        assert 0 <= r.level_final_units <= _TB_CAP_UNITS
        any_rejected = any_rejected or r.n_rejected > 0
    # the fixture's bursts must actually exercise the reject branch
    assert any_rejected


def test_holt_fold_matches_python_reference(spark, fold_sf_dir):
    got = {r.user_id: r for r in
           REGISTRY["events_holt_step"].spark(spark, fold_sf_dir).collect()}
    series = _series(spark, fold_sf_dir)
    for uid, evs in series.items():
        vals = [v for _t, _e, v in evs]
        if len(vals) < 4:
            assert uid not in got
            continue
        l, b = vals[0], vals[1] - vals[0]
        for x in vals[2:]:
            l2 = 0.5 * x + 0.5 * (l + b)
            b = 0.25 * (l2 - l) + 0.75 * b
            l = l2
        r = got[uid]
        assert r.n_events == len(vals)
        assert r.level_final == round(l, 6), uid
        assert r.trend_final == round(b, 6), uid
        assert r.forecast_next == round(l + b, 6), uid


def test_bestfit_packing_matches_python_reference(spark):
    """The list-accumulator BFD fold must equal an imperative
    best-fit-decreasing simulation over the same per-shard length
    lists (and beat or match nothing-better-than: bins >= lower
    bound, every load <= cap)."""
    from kinesis_s3_data_shipper_spark.plans.text import (_PACK_CAP,
                                                          _PACK_SHARDS)
    from kinesis_s3_data_shipper_spark.sources.tables import load_table
    sf = "/root/testdata/sf0.001"
    got = {r.shard: r for r in
           REGISTRY["pack_sequences_bestfit"].spark(spark, sf).collect()}
    docs = load_table(spark, sf, "documents") \
        .selectExpr("doc_id",
                    f"doc_id % {_PACK_SHARDS} AS shard",
                    "size(split(text, ' ')) AS n_tok").collect()
    by_shard: dict[int, list] = {}
    for r in docs:
        by_shard.setdefault(r.shard, []).append(
            (min(r.n_tok, _PACK_CAP), r.doc_id))
    for shard, items in by_shard.items():
        lens = [l for l, _d in sorted(items, key=lambda t: (-t[0], t[1]))]
        bins: list[int] = []
        for l in lens:
            fits = [b for b in bins if b + l <= _PACK_CAP]
            if not fits:
                bins.append(l)
            else:
                bins[bins.index(max(fits))] += l
        r = got[shard]
        assert r.n_bins == len(bins), shard
        assert r.max_load == max(bins) and r.min_load == min(bins)
        assert r.total_tok == sum(lens)
        assert r.n_bins >= r.lower_bound
        assert r.max_load <= _PACK_CAP


@pytest.fixture(scope="module")
def fsm_sf_dir(spark, tmp_path_factory):
    """Events with adversarial pattern sequences: clicks re-anchoring
    inside view runs, purchases with no open prefix, back-to-back
    full matches, duplicate timestamps, and noise symbols."""
    rng = np.random.default_rng(20260816)
    types = ["click", "view", "purchase", "error", "signup"]
    rows = []
    eid = 0
    base = 1_700_000_000_000_000
    for uid in range(60):
        n = int(rng.integers(1, 80))
        t = base + int(rng.integers(0, 10**9))
        for _ in range(n):
            t += int(rng.integers(0, 2))  # frequent duplicate ts
            rows.append((eid, t, uid,
                         types[int(rng.integers(0, 5))],
                         1.0, "{}"))
            eid += 1
    d = tmp_path_factory.mktemp("fsm_events")
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long,"
              " event_type string, value double, props string")
    (df.selectExpr("event_id", "timestamp_micros(ts_us) AS ts",
                   "user_id", "event_type", "value", "props")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(str(d), "events.parquet")))
    return str(d)


def test_match_recognize_fold_matches_python_reference(spark, fsm_sf_dir):
    """The MATCH_RECOGNIZE packed-int FSM must equal the automaton as
    you'd write it imperatively, on adversarial sequences — so an
    encoding bug shared by the Spark CASE and the oracle CASE cannot
    hide behind the hash gate."""
    from kinesis_s3_data_shipper_spark.sources.tables import load_table

    ev = load_table(spark, fsm_sf_dir, "events")
    rows = ev.select("user_id", "ts", "event_id", "event_type").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type))
    code = {"click": 1, "view": 2, "purchase": 3}
    want = {}
    for uid, evs in by_user.items():
        m, s = 0, 0
        for _, _, et in sorted(evs):
            x = code.get(et, 0)
            if x == 1:
                s = 1
            elif x == 2 and s in (1, 2):
                s = 2
            elif x == 3 and s == 2:
                m, s = m + 1, 0
            else:
                s = 0
        want[uid] = (len(evs), m, s)

    got = {r.user_id: (r.n_events, r.n_matches, r.final_state)
           for r in REGISTRY["events_match_recognize"]
           .spark(spark, fsm_sf_dir).collect()}
    assert got == want
    # The fixture must actually exercise matches and open states.
    assert any(m > 0 for _, m, _ in want.values())
    assert any(s != 0 for _, _, s in want.values())


def test_poisson_bootstrap_weights_follow_pmf(spark):
    """The universal-hash replicate draws must actually be Poisson(1):
    across all (row, replicate) draws on real data, the empirical
    weight frequencies must sit within 3% absolute of the pmf
    literals, and the mean weight within 2% of 1 — guarding the
    (a_j*h + b_j) family against a coefficient/modulus bug that the
    oracle (which replays the same family) could never catch."""
    from pyspark.sql import functions as F

    from kinesis_s3_data_shipper_spark.plans.sampling import (
        _BOOT_A_SPARK, _BOOT_B_SPARK, _BOOT_B, _POIS_W)
    from kinesis_s3_data_shipper_spark.sources.tables import load_table

    o = load_table(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"), "orders")
    u = (f"pmod(pmod(element_at({_BOOT_A_SPARK}, CAST(b AS INT) + 1)"
         f" * h32 + element_at({_BOOT_B_SPARK}, CAST(b AS INT) + 1),"
         f" 4294967311L), 1000L)")
    freq = (o.select(
        F.expr("pmod(CAST(conv(substring(md5(CAST(o_orderkey AS "
               "STRING)), 1, 15), 16, 10) AS BIGINT), 4294967296L)")
        .alias("h32"),
        F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("b"))
        .select(F.expr(_POIS_W.format(u=u)).alias("w"))
        .groupBy("w").count().collect())
    counts = {r.w: r["count"] for r in freq}
    total = sum(counts.values())
    pmf = {0: .368, 1: .368, 2: .184, 3: .061, 4: .015, 5: .003}
    for k, p in pmf.items():
        assert abs(counts.get(k, 0) / total - p) < 0.03, (k, counts)
    mean_w = sum(k * c for k, c in counts.items()) / total
    assert abs(mean_w - 1.0) < 0.02
