"""The _drain state-partition pin (r11 verdict ask #4): the conf must
be pinned for the WHOLE drain (micro-batch planning happens inside
awaitTermination) and restored afterwards — including when the drain
fails — and the checkpoint must record STATE_PARTITIONS state stores,
not the session's CPU-count shuffle default."""

from __future__ import annotations

import glob
import os
import uuid

import pytest

from kinesis_s3_data_shipper_spark.session import staging_dir
from kinesis_s3_data_shipper_spark.streaming.jobs import (
    STATE_PARTITIONS, _drain, streaming_hourly_counts)

SF = "/root/testdata/sf0.001"


def _landing(sf_dir: str) -> tuple[str, str]:
    from kinesis_s3_data_shipper_spark.plans.streaming import _stage_landing
    return _stage_landing(sf_dir)


def test_drain_restores_shuffle_conf_and_pins_state_stores(spark):
    key = "spark.sql.shuffle.partitions"
    outer = spark.conf.get(key)
    # Session conf deliberately set DIFFERENT from the pin so both
    # halves of the contract are observable: the drain must run its
    # state stores at STATE_PARTITIONS, then put 13 back.
    sentinel = str(STATE_PARTITIONS + 5)
    spark.conf.set(key, sentinel)
    try:
        landing, ckpt = _landing(SF)
        out = streaming_hourly_counts(
            spark, landing, checkpoint=ckpt,
            query_name=f"drain_{uuid.uuid4().hex[:8]}")
        assert out.count() > 0
        assert spark.conf.get(key) == sentinel, (
            "conf not restored after drain")
        # The state store directory fans out one subdir per state
        # partition under <ckpt>/state/0/ — that count IS the pinned
        # value, proving the pin covered first-batch planning.
        parts = [d for d in glob.glob(os.path.join(ckpt, "state", "0", "*"))
                 if os.path.basename(d).isdigit()]
        assert len(parts) == STATE_PARTITIONS, (len(parts),
                                                STATE_PARTITIONS)
    finally:
        spark.conf.set(key, outer)


def test_drain_restores_conf_on_failure(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)

    class Boom:
        def start(self):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        _drain(spark, Boom())
    assert spark.conf.get(key) == before


def test_state_partitions_env_pin_fresh_interpreter():
    """STATE_PARTITIONS reads SPARK_GRAFT_STREAM_STATE_PARTITIONS at
    import time — a deployment that sets the env var must see it take
    effect in a fresh interpreter (r12 verdict ask #6).  Plain import,
    no Spark session needed."""
    import subprocess
    import sys
    env = dict(os.environ,
               SPARK_GRAFT_STREAM_STATE_PARTITIONS="5",
               SPARK_GRAFT_STREAM_BATCH_SHUFFLE_PARTITIONS="96")
    out = subprocess.run(
        [sys.executable, "-c",
         "from kinesis_s3_data_shipper_spark.streaming import jobs;"
         "print(jobs.STATE_PARTITIONS, jobs._BATCH_SINK_PARTITIONS)"],
        capture_output=True, text=True, env=env, check=True)
    assert out.stdout.split() == ["5", "96"], out.stdout


def test_batch_shuffle_scope_lifts_and_restores(spark, monkeypatch):
    """Inside a foreachBatch body the scope lifts the drain pin to the
    deployment's batch-compute value and restores it; unset -> no-op
    (r12 advice: the pin must not silently cap batch parallelism when
    the deployment says otherwise)."""
    from kinesis_s3_data_shipper_spark.streaming import jobs
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    try:
        spark.conf.set(key, str(STATE_PARTITIONS))
        monkeypatch.setattr(jobs, "_BATCH_SINK_PARTITIONS", "96")
        with jobs._batch_shuffle_scope(spark):
            assert spark.conf.get(key) == "96"
        assert spark.conf.get(key) == str(STATE_PARTITIONS)
        monkeypatch.setattr(jobs, "_BATCH_SINK_PARTITIONS", None)
        with jobs._batch_shuffle_scope(spark):
            assert spark.conf.get(key) == str(STATE_PARTITIONS)
    finally:
        spark.conf.set(key, before)
