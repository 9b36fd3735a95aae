"""Table-maintenance operators: small-file compaction with optional
range clustering.

Streaming sinks and highly-parallel writers leave lakes littered with
small files; at 100 TB the scan cost is dominated by per-file open/
footer overhead and the listing itself. Compaction is the standard
OPTIMIZE dataflow: read, ONE round-robin (or range) repartition sized
so output files land near a target size, rewrite. Range clustering
(`cluster_by`) additionally sorts the data so each output file owns a
disjoint key range — min/max footer stats then prune whole files for
range predicates, the poor-man's Z-order for a single key.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, names in os.walk(path):
        for n in names:
            if not n.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(dirpath, n))
    return total


def _dir_row_count(path: str) -> int:
    """Exact row count from the parquet FOOTERS of every part-file
    under ``path`` — pyarrow reads metadata driver-side, no Spark job
    (same footer-based sizing as sources.tables.table_row_count, but
    for an arbitrary directory rather than an sf_dir table). A cluster
    deployment swaps the os.walk for an object-store LIST, exactly as
    the compaction listing itself does."""
    import pyarrow.parquet as pq
    total = 0
    for dirpath, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") and not n.startswith(("_", ".")):
                total += pq.ParquetFile(
                    os.path.join(dirpath, n)).metadata.num_rows
    return total


def _boundary_sample_mod(df: DataFrame, num_parts: int,
                         explicit: int | None,
                         row_count: int | None = None) -> int:
    """Hash-gate modulus for a boundary sample: the caller's explicit
    value if given, else scaled from the row count via
    ranks.auto_sample_mod so the driver-side collect stays near
    ``num_parts * 1024`` rows at ANY table size (a fixed default like
    16 would make the collect ~n/16 rows — unbounded as the table
    grows). Callers that know the parquet source pass ``row_count``
    from the footers (no job at all); the ``df.count()`` fallback for
    opaque DataFrames is one full-scan count job — cheap (column-
    pruned to zero columns, map-side combined) but NOT free, so prefer
    the footer path where a path is known."""
    if explicit is not None:
        return explicit
    from .ranks import auto_sample_mod
    n = row_count if row_count is not None else df.count()
    return auto_sample_mod(n, num_parts)


def compact_parquet_dir(spark: SparkSession, src_dir: str, dest_dir: str, *,
                        target_file_bytes: int = 128 * 1024 * 1024,
                        cluster_by: list[str] | None = None,
                        deterministic_splits: bool = False,
                        split_sample_mod: int | None = None) -> int:
    """Rewrite `src_dir` into ~target-sized parquet files at `dest_dir`.

    Output file count = ceil(current on-disk bytes / target) — sized
    from the COMPRESSED footprint, so the rewrite inherits the same
    codec's ratio. Returns the file count. With `cluster_by`, uses a
    range repartition + within-partition sort so every output file
    covers a disjoint key range (file-level min/max pruning becomes
    effective for that key); without it, a plain round-robin shuffle.

    ``deterministic_splits`` swaps Spark's RangePartitioner (whose
    sampled boundaries can differ between executions, so two runs of
    the same OPTIMIZE can produce different layouts) for the engine's
    own sampled-splits machinery (`operators/ranks.py`): a hash-gated
    sample picks the boundaries, rows route by a pure expression —
    the same compacted layout on every run/retry, which is what an
    auditable table-maintenance job wants. Same single shuffle.

    Driver-side work is just the listing (+ the bounded boundary
    sample when deterministic); the data moves through one shuffle,
    the same cost any OPTIMIZE pays. A cluster deployment swaps the
    os.walk for an object-store LIST.
    """
    n_files = max(1, math.ceil(_dir_bytes(src_dir) / target_file_bytes))
    df: DataFrame = spark.read.parquet(src_dir)
    if cluster_by and deterministic_splits:
        from pyspark.sql import functions as F

        from .ranks import (identity_partition_tokens, range_pid,
                            sample_order_keys, splits_from_sample)
        specs = [(c, "asc") for c in cluster_by]
        mod = _boundary_sample_mod(df, n_files, split_sample_mod,
                                   row_count=_dir_row_count(src_dir))
        sample = sample_order_keys(df, specs, sample_mod=mod)
        bounds = splits_from_sample(sample, n_files)
        # Route each range id through a probed token whose hash lands
        # on exactly that partition index: every output file then owns
        # ONE key range (disjoint min/max), on every run identically.
        toks = identity_partition_tokens(spark, n_files)
        tok_map = F.create_map(*[F.lit(x) for p, t in sorted(toks.items())
                                 for x in (p, t)])
        out = (df.withColumn("_tok", F.element_at(
                   tok_map, range_pid(specs, bounds, unroll=True)))
               .repartition(n_files, F.col("_tok"))
               .sortWithinPartitions(*cluster_by)
               .drop("_tok"))
    elif cluster_by:
        out = (df.repartitionByRange(n_files, *cluster_by)
               .sortWithinPartitions(*cluster_by))
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dest_dir)
    return n_files


def zorder_key(spark: SparkSession, df: DataFrame, cols: list[str], *,
               bits_per_col: int = 4, sample_mod: int | None = None):
    """Z-order (Morton) key expression over ``cols``: each column is
    quantized to ``2^bits_per_col`` equal-frequency buckets via the
    engine's sampled range splits, and the bucket bits are interleaved
    — the multi-column clustering key behind Delta/Iceberg's OPTIMIZE
    ZORDER. Rows close in z-key are close in EVERY dimension, so
    range-compacting by it leaves each file covering a small sub-cube:
    min/max footer stats then prune files for predicates on ANY of the
    clustered columns, where single-key clustering helps only its own
    column. Equal-frequency (not equal-width) quantization keeps the
    curve balanced under skew. One bounded sample job per column;
    the key itself is a pure row expression.
    """
    from pyspark.sql import functions as F

    from .ranks import range_pid, sample_order_keys, splits_from_sample
    n_buckets = 2 ** bits_per_col
    mod = _boundary_sample_mod(df, n_buckets, sample_mod)
    bucket_cols = []
    for c in cols:
        specs = [(c, "asc")]
        sample = sample_order_keys(df, specs, sample_mod=mod)
        bounds = splits_from_sample(sample, n_buckets)
        bucket_cols.append(range_pid(specs, bounds, unroll=True))
    k = len(cols)
    z = F.lit(0)
    for j in range(bits_per_col):
        for i, b in enumerate(bucket_cols):
            bit = F.shiftright(b.cast("int"), j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * k + (k - 1 - i))
    return z.cast("int")


def compact_parquet_dir_zorder(spark: SparkSession, src_dir: str,
                               dest_dir: str, *, zorder_by: list[str],
                               target_file_bytes: int = 128 * 1024 * 1024,
                               bits_per_col: int = 4,
                               sample_mod: int | None = None) -> int:
    """OPTIMIZE ZORDER: rewrite ``src_dir`` into ~target-sized files
    range-clustered by the interleaved :func:`zorder_key` over
    ``zorder_by`` — every output file covers a small sub-cube of the
    clustered dimensions, enabling footer min/max pruning on ANY of
    them. Same single-shuffle cost as plain compaction plus one
    bounded sample job per clustered column."""
    from pyspark.sql import functions as F

    n_files = max(1, math.ceil(_dir_bytes(src_dir) / target_file_bytes))
    df: DataFrame = spark.read.parquet(src_dir)
    z = zorder_key(spark, df, zorder_by, bits_per_col=bits_per_col,
                   sample_mod=sample_mod)
    out = (df.withColumn("_z", z)
           .repartitionByRange(n_files, F.col("_z"))
           .sortWithinPartitions("_z")
           .drop("_z"))
    out.write.mode("overwrite").parquet(dest_dir)
    return n_files


def vacuum_versions(table_dir: str, *, keep: int = 2) -> dict[int, list[int]]:
    """Delete superseded version dirs of a bucketed versioned table
    (the ``b=<k>/v=<n>`` layout ``streaming/jobs.py``'s incremental
    MERGE maintains), keeping the newest ``keep`` versions per bucket.

    This is the VACUUM half of the versioned-table contract: MERGE
    epochs only ever ADD ``v=<batch_id>`` dirs (immutable, so readers
    of superseded versions are undisturbed), and storage is reclaimed
    here, out of band. ``keep`` must be >= 2 by default because a
    retried epoch rebuilds from the newest version STRICTLY BELOW its
    own batch id — vacuuming down to 1 version is only safe once the
    stream's checkpoint has committed past the newest epoch (the same
    retention-vs-recovery coupling Delta's VACUUM has with time
    travel). Returns {bucket: [versions removed]}.
    """
    import shutil

    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    removed: dict[int, list[int]] = {}
    if not os.path.isdir(table_dir):
        return removed
    for bdir in sorted(os.listdir(table_dir)):
        if not bdir.startswith("b="):
            continue
        bpath = os.path.join(table_dir, bdir)
        # Tolerate stray non-numeric dirs (editor/temp artifacts like
        # 'v=tmp'): skip them rather than abort the sweep mid-deletion.
        versions = sorted(
            (int(d[2:]) for d in os.listdir(bpath)
             if d.startswith("v=") and d[2:].isdigit()), reverse=True)
        stale = versions[keep:]
        for v in stale:
            shutil.rmtree(os.path.join(bpath, f"v={v}"))
        if stale:
            removed[int(bdir.split("=", 1)[1])] = stale
    return removed
