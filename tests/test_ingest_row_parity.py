"""Bit-parity gate for the one rows-only registered query (r11
verdict ask #5): the driver contract exempts ``ingest_pipeline`` from
the hash compare (DuckDB cannot run the recursive gunzip/marker
splitter), and the hash-checked ``ingest_pipeline_agg`` twin covers
split/parse/quarantine semantics only in aggregate.  This test closes
the residual: the FULL exploded row multiset out of the real pipeline
(gunzip → marker scan → from_json → explode → enrichment) must equal
the generator's pre-encoding NDJSON twin row for row — every column,
every duplicate — with the logStreamPrefix enrichment recomputed here
in plain Python (the reference's expression,
kinesis-to-humio.py:137), independent of the JVM derivation under
test."""

from __future__ import annotations

import json
from collections import Counter

from kinesis_s3_data_shipper_spark.plans.base import REGISTRY, _load_all
from kinesis_s3_data_shipper_spark.plans.ingest import TWIN_PATH

SF = "/root/testdata/sf0.001"  # unused by the fixture-driven pipeline


def test_ingest_pipeline_rows_bit_match_generator_twin(spark):
    _load_all()
    got_rows = REGISTRY["ingest_pipeline"].spark(spark, SF).collect()
    got = Counter(
        (r.file, r.logGroup, r.logStream, r.logStreamPrefix,
         r.event_id, r.timestamp_ms, r.message)
        for r in got_rows)
    want: Counter = Counter()
    with open(TWIN_PATH) as fh:
        for line in fh:
            e = json.loads(line)
            prefix = "/".join(e["logStream"].split("/")[0:2])
            want[(e["file"], e["logGroup"], e["logStream"], prefix,
                  e["event_id"], e["timestamp_ms"], e["message"])] += 1
    assert got == want
    # the multiset equality above implies it, but state the headline
    # numbers plainly for the failure message
    assert sum(got.values()) == sum(want.values()) > 0


def test_ingest_pipeline_block_index_is_contiguous_per_file(spark):
    """block_index — the one pipeline column the twin does not carry
    (the generator's NDJSON is flattened straight from block dicts) —
    must number each file's blocks 0..n-1 with no gaps: the marker
    scan neither lost nor duplicated a block boundary."""
    _load_all()
    df = REGISTRY["ingest_pipeline"].spark(spark, SF)
    per_file = {}
    for r in df.select("file", "block_index").distinct().collect():
        per_file.setdefault(r.file, set()).add(r.block_index)
    assert per_file
    for file, idxs in per_file.items():
        assert idxs == set(range(len(idxs))), (file, sorted(idxs))
