"""Sink-layout policies: A4 size-based file rotation (the
logging/rotation.go:34-46 analogue — rotate when a file would exceed
MaxSize) and the Iceberg table-format code path (north_star names
per-sink Iceberg tables; the sandbox has no catalog, so the write must
fall back to parquet cleanly)."""

import glob
import os

from pyspark.sql import functions as F

from sqlite_otel_spark.config import PipelineConfig
from sqlite_otel_spark.plans.pipeline import (
    PipelineResult,
    derive_max_records_per_file,
    write_sinks,
)


def _result_with(df):
    return PipelineResult(
        sinks={"t": df}, routed=None, accounting=None,
        by_signal_tool=None, by_time_bucket=None,
    )


def _payload_df(spark, n=20_000):
    # md5 payloads are incompressible -> stable bytes/row for the test
    return spark.range(n).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )


def test_size_based_rotation_splits_files(spark, tmp_path):
    target = 64 * 1024
    cfg = PipelineConfig(target_file_bytes=target, compression="snappy")
    # coalesce(1): file count must come from the rotation policy alone,
    # not from input partitioning
    write_sinks(_result_with(_payload_df(spark).coalesce(1)), str(tmp_path), cfg)
    files = glob.glob(str(tmp_path / "t" / "*.parquet"))
    assert len(files) > 1, "rotation produced a single file"
    for p in files:
        # files land at-or-under target modulo footer/page overhead
        assert os.path.getsize(p) <= target * 1.5, p


def test_derive_cap_scales_with_target(spark):
    df = _payload_df(spark, 5_000)
    small = derive_max_records_per_file(df, 64 * 1024, "snappy")
    large = derive_max_records_per_file(df, 1024 * 1024, "snappy")
    assert 0 < small < large
    assert derive_max_records_per_file(df.limit(0), 64 * 1024, "snappy") == 1


def test_derive_cap_codec_mapping(spark, tmp_path):
    """Spark-legal codec names that pyarrow spells differently (or not at
    all) must not break the rotation probe: 'uncompressed' maps to
    pyarrow 'none'; an unknown codec returns None so write_sinks falls
    back to the static max_records_per_file cap (ADVICE r2 #3)."""
    df = _payload_df(spark, 2_000)
    assert derive_max_records_per_file(df, 64 * 1024, "uncompressed") > 0
    assert derive_max_records_per_file(df, 64 * 1024, "lzo") is None
    # end-to-end: unknown codec + target_file_bytes -> static cap applies
    cfg = PipelineConfig(target_file_bytes=64 * 1024, compression="snappy",
                         max_records_per_file=500)
    cfg2 = PipelineConfig(target_file_bytes=64 * 1024,
                          compression="uncompressed")
    write_sinks(_result_with(df.coalesce(1)), str(tmp_path / "u"), cfg2)
    assert spark.read.parquet(str(tmp_path / "u" / "t")).count() == 2_000


def test_gzip_compression_codec(spark, tmp_path):
    """C11: the reference gzips rotated files (logging/rotation.go:
    198-222); the sink analogue is the parquet codec option — files
    carry the codec marker and read back identically."""
    cfg = PipelineConfig(compression="gzip")
    df = _payload_df(spark, 500)
    write_sinks(_result_with(df), str(tmp_path), cfg)
    files = glob.glob(str(tmp_path / "t" / "*.parquet"))
    assert files and all(".gz.parquet" in f for f in files)
    assert spark.read.parquet(str(tmp_path / "t")).count() == 500


def test_iceberg_format_falls_back_to_parquet(spark, tmp_path):
    """No Iceberg catalog in-sandbox: the writeTo branch must fail
    gracefully into a parquet sink with identical rows."""
    df = _payload_df(spark, 100)
    cfg = PipelineConfig(table_format="iceberg")
    write_sinks(_result_with(df), str(tmp_path), cfg)
    got = spark.read.parquet(str(tmp_path / "t"))
    assert got.count() == 100
    assert sorted(got.columns) == ["id", "payload"]


def test_partitioned_fact_sinks_prune(spark, tmp_path):
    """M4 partition layout (SURVEY §7): with partition_facts_by_day the
    fact sinks land as ts_day=... directories, and a date-filtered read
    prunes partitions (PartitionFilters in the scan, fewer files read) —
    the parquet analogue of Iceberg's days(ts) transform."""
    from pyspark.sql import functions as F2

    from sqlite_otel_spark.fixtures import make_transcripts
    from sqlite_otel_spark.plans.pipeline import run_pipeline

    rows = make_transcripts(300, seed=11)
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    ).withColumn(  # fixture ts spans hours; spread across days for the test
        "ts", F2.col("ts") + F2.make_interval(days=F2.col("turn_idx") % 3)
    )
    res = run_pipeline(spark, df, PipelineConfig())
    cfg = PipelineConfig(partition_facts_by_day=True)
    write_sinks(res, str(tmp_path), cfg)
    res.unpersist()

    day_dirs = glob.glob(str(tmp_path / "spans" / "ts_day=*"))
    assert len(day_dirs) >= 2, "fixture spans several days; want >=2 partitions"

    back = spark.read.parquet(str(tmp_path / "spans"))
    one_day = sorted(os.path.basename(d).split("=")[1] for d in day_dirs)[0]
    pruned = back.filter(F2.col("ts_day") == one_day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(ts_day" in plan
    # row equality vs the unpartitioned sink contents
    n_all = back.count()
    assert n_all == res.sinks["spans"].count()
    assert pruned.count() < n_all
