"""Multi-file table layout: every real warehouse table is a directory
of part-files, not one parquet file. `sources.tables.table_path`
accepts both; this re-partitions a copy of sf0.001 into 4-part
directories (preserving each table's physical schema bit-for-bit via
pyarrow row slicing) and proves the engine + oracle harness read it
identically to the single-file layout.
"""

from __future__ import annotations

import os

import pytest

from tests.oracle_harness import duckdb_connection, compare

#: One query per table family: scan+agg (lineitem), event-time agg
#: (events — exercises the ts-normalization path on the new layout),
#: hash dedup (documents), LSH occupancy (embeddings), and a
#: multi-table join (region/nation/customer/orders/lineitem/supplier).
QUERIES = ["q1_pricing_summary", "events_hourly", "dedup_exact_hash",
           "ann_lsh_buckets", "q5_region_revenue"]


@pytest.fixture(scope="module")
def multifile_sf(tmp_path_factory, sf_small):
    import pyarrow.parquet as pq

    from kinesis_s3_data_shipper_spark.sources.tables import TABLE_NAMES

    root = str(tmp_path_factory.mktemp("sf_multifile"))
    for name in TABLE_NAMES:
        t = pq.read_table(os.path.join(sf_small, f"{name}.parquet"))
        out = os.path.join(root, name)
        os.makedirs(out)
        n_parts = min(4, max(1, t.num_rows))
        step = (t.num_rows + n_parts - 1) // n_parts
        for i in range(n_parts):
            part = t.slice(i * step, step)
            pq.write_table(part, os.path.join(out, f"part-{i:05d}.parquet"))
    return root


def test_table_path_prefers_file_then_dir(multifile_sf, sf_small):
    from kinesis_s3_data_shipper_spark.sources.tables import table_path
    assert table_path(sf_small, "orders").endswith("orders.parquet")
    assert table_path(multifile_sf, "orders").endswith("orders")
    with pytest.raises(FileNotFoundError):
        table_path(multifile_sf, "region_missing_table")


def test_queries_match_oracle_on_multifile_layout(spark, multifile_sf):
    from kinesis_s3_data_shipper_spark.plans import all_oracles, all_queries
    queries, oracles = all_queries(), all_oracles()
    con = duckdb_connection(multifile_sf)
    for name in QUERIES:
        got = queries[name](spark, multifile_sf)
        want = con.sql(oracles[name]).df()
        compare(got, want, name=name)


def test_multifile_matches_singlefile_results(spark, multifile_sf, sf_small):
    from kinesis_s3_data_shipper_spark.plans import all_queries
    queries = all_queries()
    for name in ["q1_pricing_summary", "events_hourly"]:
        multi = queries[name](spark, multifile_sf).toPandas()
        single = queries[name](spark, sf_small).toPandas()
        cols = sorted(multi.columns)
        multi = multi[cols].sort_values(cols).reset_index(drop=True)
        single = single[cols].sort_values(cols).reset_index(drop=True)
        assert multi.equals(single), name
