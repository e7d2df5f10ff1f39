"""The end-to-end batch plan: parse -> enrich -> route -> sinks -> aggregates.

Spark rebuild of the reference's request lifecycle (SURVEY §3): one
declarative DAG per run instead of one goroutine+transaction per HTTP
request. Stage map:

    read transcripts                 (S1 — source)
    [salted repartition on conv_id]  (north-rule §4.2.1 — only when the
                                      input layout is conversation-
                                      clustered; parquet scan splits are
                                      byte-balanced already)
    Arrow mapInArrow parse           (P1-P11, F1-F7 — one Python pass
                                      emitting the flat record stream,
                                      operators/records.py)
    persist()                        (shared upstream of the 3-way fan-out,
                                      R1; flat schema -> pruned rescans)
    cross-turn span-PK resolution    (D4 cascade, single aggregation)
    dims: resources/scopes/metrics   (D1-D3, dedup + surrogate keys)
    facts: spans/log_records/points  (filter+project + D5 FK enrichment)
    role/tool broadcast enrichment   (D5 graft dims)
    sinks + accounting               (S3, A1-A3)

Shuffle inventory (what actually moves at 100 TB):
 - parse + fact filter/project + hash-mode FK attach: narrow, ZERO
   shuffles end-to-end from scan to fact sink;
 - dim dedup: one shuffle each over the (tiny) distinct dim keys, with
   map-side partial aggregation;
 - span-conflict detection: one groupBy over (trace_id, span_id) —
   unavoidable; it IS the global PK;
 - aggregates: partial+final hash agg, AQE-coalesced.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from sqlite_otel_spark.config import PipelineConfig
from sqlite_otel_spark.operators import aggregates as agg
from sqlite_otel_spark.operators import facts as facts_ops
from sqlite_otel_spark.operators.conflicts import drop_conflicted, resolve_span_conflicts
from sqlite_otel_spark.operators.dims import (
    build_metric_defs,
    build_resources,
    build_scopes,
    enrich_record_ids,
)
from sqlite_otel_spark.operators.enrich import enrich, role_dim, tool_dim
from sqlite_otel_spark.operators.records import to_records

SINK_TABLES = (
    "resources",
    "instrumentation_scopes",
    "metrics",
    "spans",
    "log_records",
    "metric_data_points",
    "rejects",
)


@dataclass
class PipelineResult:
    sinks: dict[str, DataFrame]
    routed: DataFrame
    accounting: DataFrame
    by_signal_tool: DataFrame
    by_time_bucket: DataFrame
    n_conflict_invalid: int = 0
    persisted: list = field(default_factory=list)

    def unpersist(self) -> None:
        for df in self.persisted:
            df.unpersist()


def salted_repartition(df: DataFrame, cfg: PipelineConfig,
                       n_partitions: int | None = None) -> DataFrame:
    """North-rule §4.2.1: hot conversations (10%+ of turns in one conv_id
    in the fixture) would pin a partition if the input arrived clustered
    by conversation. Repartitioning on (conv_id, salt(turn_idx)) spreads
    each hot conversation over ``salt_buckets`` partitions while keeping
    unrelated conversations hashed apart. Parse is embarrassingly
    parallel, so no de-salting is ever needed — downstream wide ops
    shuffle on their own keys."""
    salt = F.pmod(F.xxhash64("turn_idx"), F.lit(cfg.salt_buckets))
    if n_partitions:
        return df.repartition(n_partitions, F.col("conv_id"), salt)
    return df.repartition(F.col("conv_id"), salt)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig | None = None,
    repartition_to: int | None = None,
    do_salt: bool = False,
) -> PipelineResult:
    """``do_salt`` defaults OFF (round-4 measurement): parse->facts is
    narrow, so on byte-balanced scan splits the salt is a pure extra
    full-corpus shuffle — the matched-window skew experiment clocked
    salt-on at ~2x the salt-off wall even with 30% of turns in one
    conv_id (BENCH_r4: skew_salt_speedup 0.486). Turn it ON only for
    conversation-CLUSTERED ingest layouts (sorted-by-conv files /
    coarse row groups), where a handful of scan splits would otherwise
    pin the whole parse stage — bench.py measures that layout
    explicitly (skew_clustered_* rows). AQE skew-join handling stays on
    in both modes."""
    cfg = cfg or PipelineConfig()
    mode = cfg.surrogate_id_mode

    src = salted_repartition(transcripts, cfg, repartition_to) if do_salt else transcripts

    records_all = enrich_record_ids(
        to_records(src, cfg.max_text_bytes, emit_text=cfg.emit_text), mode
    )
    # One materialization shared by the reject sink, the conflict pass and
    # the 3-way fan-out (R1): without it every sink would re-run the UDF.
    # The flat schema means each downstream scan prunes to its own columns;
    # enrich_record_ids already swapped the fat dim-key strings on fact
    # rows for 8-byte surrogate ids before anything lands in the cache.
    persisted = []
    if cfg.staging_dir:
        # 100 TB form: stage the stream as parquet partitioned by
        # rec_kind — per-sink reads partition-prune to their kind, and
        # executor memory never holds the corpus.
        records_all.write.mode("overwrite").partitionBy("rec_kind").option(
            "compression", cfg.compression
        ).parquet(cfg.staging_dir)
        records_all = spark.read.parquet(cfg.staging_dir)
    else:
        records_all = records_all.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(records_all)

    rejects_local = facts_ops.build_rejects(records_all)

    invalid_turns, n_invalid = resolve_span_conflicts(
        spark, records_all, cfg.max_conflict_turns
    )
    valid = drop_conflicted(records_all, invalid_turns)
    if invalid_turns is not None:
        rejects = rejects_local.unionByName(
            facts_ops.conflict_rejects(records_all, invalid_turns)
        )
    else:
        rejects = rejects_local

    resources = build_resources(valid, mode)
    scopes = build_scopes(valid, mode)
    metric_defs = build_metric_defs(valid, resources, scopes, mode)

    spans = facts_ops.build_spans(valid, resources, scopes, mode)
    log_records = facts_ops.build_log_records(valid, resources, scopes, mode)
    points = facts_ops.build_points(valid, resources, scopes, metric_defs, mode)

    routed = facts_ops.build_routed(valid)
    roles, tools = role_dim(spark), tool_dim(spark)
    routed_enriched = enrich(routed, roles, tools)

    return PipelineResult(
        sinks={
            "resources": resources,
            "instrumentation_scopes": scopes,
            "metrics": metric_defs,
            "spans": spans,
            "log_records": log_records,
            "metric_data_points": points,
            "rejects": rejects,
        },
        routed=routed_enriched,
        accounting=agg.request_accounting(routed, rejects),
        by_signal_tool=agg.counts_by_signal_tool(routed_enriched),
        by_time_bucket=agg.counts_by_time_bucket(routed_enriched),
        n_conflict_invalid=n_invalid,
        persisted=persisted,
    )


# Spark codec names -> pyarrow codec names for the row-width probe.
# Spark-legal names pyarrow doesn't know ('uncompressed', 'lz4_raw',
# 'lz4raw') would raise inside pyarrow.parquet.write_table (ADVICE r2 #3).
_PYARROW_CODEC = {
    "uncompressed": "none", "none": "none", "snappy": "snappy",
    "gzip": "gzip", "zstd": "zstd", "lz4": "lz4", "lz4_raw": "lz4",
    "lz4raw": "lz4", "brotli": "brotli",
}


def derive_max_records_per_file(
    df: DataFrame, target_bytes: int, compression: str, sample_rows: int = 4096
) -> int | None:
    """A4 size-based rotation analogue (logging/rotation.go:34-46 rotates
    the log when file size >= MaxSize): derive a records-per-file cap
    from the MEASURED parquet-encoded width of a bounded row sample —
    the sample is written through pyarrow with the sink's own codec, so
    the bytes/row estimate reflects real encoding+compression, not an
    in-memory guess. Dictionary/RLE compress better at full file size
    than on a 4k sample, so files land at-or-under target (the reference
    guarantees the same direction: rotate at >= MaxSize)."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    pa_codec = _PYARROW_CODEC.get(compression.lower())
    if pa_codec is None:
        return None  # unknown codec: caller falls back to the static cap
    sample = df.limit(sample_rows).toPandas()
    if len(sample) == 0:
        return 1
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(sample, preserve_index=False), buf,
                   compression=pa_codec)
    bytes_per_row = max(1.0, buf.tell() / len(sample))
    return max(1, int(target_bytes / bytes_per_row))


def _is_catalog_missing(e: Exception) -> bool:
    """True when an Iceberg ``writeTo`` failed because no Iceberg
    catalog / data source is configured or resolvable (analysis-time
    environment gap), as opposed to a genuine failure. An
    AnalysisException alone is NOT sufficient (ADVICE r3): schema
    mismatches, incompatible column types and table conflicts against a
    CONFIGURED catalog are AnalysisExceptions too and must propagate —
    so every path requires one of the catalog/data-source-missing
    markers (error class or message text) before permitting the parquet
    fallback."""
    msg = str(e)
    try:
        from pyspark.errors import AnalysisException

        if isinstance(e, AnalysisException):
            # include the structured error class (Spark 3.4+) in the
            # marker scan; non-Analysis exceptions scan the message only
            get_cls = getattr(e, "getErrorClass", None)
            cls = get_cls() if callable(get_cls) else None
            if cls:
                msg = f"{cls} {msg}"
    except ImportError:  # pragma: no cover
        pass
    markers = (
        "CATALOG_NOT_FOUND", "TABLE_OR_VIEW_NOT_FOUND", "UnresolvedRelation",
        "is not a valid Spark catalog", "Cannot find catalog plugin",
        "DATA_SOURCE_NOT_FOUND", "Failed to find the data source: iceberg",
        "Multiple sources found for iceberg",
        # the unconfigured-catalog symptom on a vanilla session: the
        # catalog part of `<cat>.<ns>.<table>` doesn't resolve, so the
        # identifier falls through to spark_catalog as a multi-part
        # namespace it cannot represent
        "REQUIRES_SINGLE_PART_NAMESPACE",
    )
    return any(m in msg for m in markers)


def write_sinks(result: PipelineResult, out_dir: str, cfg: PipelineConfig | None = None) -> None:
    """S3/S4: atomic per-table commits (≙ the reference's per-request
    SQLite transaction + schema auto-init, database/db.go:53-165).

    Table format (cfg.table_format):
     - 'iceberg': ``writeTo(...).createOrReplace()`` — one Iceberg
       snapshot commit per sink (readers see old-or-new, never partial,
       matching WAL readers-vs-writer semantics, database/db.go:26-28).
       On a cluster the dimension get-or-create would become
       ``MERGE INTO dim USING touches ON natural_key WHEN NOT MATCHED
       THEN INSERT`` per batch; falls back to parquet when no catalog
       is configured (this sandbox has no Iceberg jars).
     - 'parquet' (default): plain parquet directory per sink.

    File rotation (A4): ``target_file_bytes`` derives maxRecordsPerFile
    from measured parquet row width (see derive_max_records_per_file),
    else the static ``max_records_per_file`` cap applies.

    The seven sink branches are independent sub-DAGs over the shared
    persisted record stream, so they are submitted CONCURRENTLY from
    driver threads (Spark's FIFO scheduler interleaves their stages):
    sequential submission would leave most of the cluster idle on the
    small dimension writes while paying full scheduling latency 7x."""
    cfg = cfg or PipelineConfig()

    def write_one(item):
        name, df = item
        per_file = None
        if cfg.target_file_bytes is not None:
            per_file = derive_max_records_per_file(
                df, cfg.target_file_bytes, cfg.compression
            )
        if per_file is None:
            per_file = cfg.max_records_per_file
        if cfg.table_format == "iceberg":
            try:
                (
                    df.writeTo(f"{cfg.iceberg_table_prefix}.{name}")
                    .using("iceberg")
                    .tableProperty("write.parquet.compression-codec", cfg.compression)
                    .tableProperty("write.target-file-size-bytes",
                                   str(cfg.target_file_bytes or 512 * 1024 * 1024))
                    .createOrReplace()
                )
                return
            except Exception as e:
                # Fall back to parquet ONLY for catalog-resolution
                # failures (no Iceberg jars/catalog configured — the
                # sandbox case). A genuine snapshot-commit failure on a
                # configured catalog must surface, or the atomic-commit
                # contract silently degrades (ADVICE r2 #2).
                if not _is_catalog_missing(e):
                    raise
                import warnings

                warnings.warn(
                    f"iceberg write for sink '{name}' unavailable "
                    f"({type(e).__name__}); falling back to parquet"
                )
        writer = df
        partition_cols: list[str] = []
        if (cfg.partition_facts_by_day and "ts" in df.columns
                and name in ("spans", "log_records", "metric_data_points",
                             "rejects")):
            # M4 partition layout: days(ts) as a directory-level
            # partition column — time-ranged scans prune partitions
            # before reading a byte (the parquet analogue of the
            # Iceberg days() transform the north_star names).
            writer = df.withColumn("ts_day", F.to_date("ts"))
            partition_cols = ["ts_day"]
        w = (
            writer.write.mode("overwrite")
            .option("compression", cfg.compression)
            .option("maxRecordsPerFile", per_file)
        )
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(f"{out_dir}/{name}")

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(result.sinks)) as pool:
        list(pool.map(write_one, result.sinks.items()))


def collect_aggregates(result: PipelineResult) -> dict[str, list]:
    """A1-A3 materialization in ONE job: aggregate the routed stream
    ONCE at the finest granularity (bucket, signal, tool), union the
    tiny rejects aggregate, and derive the two coarser granularities by
    folding the collected fine rows on the driver. Round 6 (guide §2.3):
    the previous GROUPING SETS form expanded every turn row 3x before
    the partial aggregation — 9M rows through the hash agg at 3M turns
    for the same three result sets; counts and int64 byte sums fold
    associatively, so the coarser rows are bit-identical. The fine
    result is thousands of rows — driver-side folding is free. The
    individual accounting/by_signal_tool/by_time_bucket DataFrames
    remain on PipelineResult as the correctness surface (their oracles
    check values)."""
    fine = (
        result.routed
        .groupBy(
            F.window("ts", "1 hour")["start"].alias("bucket_start"),
            "signal_type", "tool",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("n_bytes"),
            F.lit(0).alias("gid"),
        )
    )
    rej = (
        result.sinks["rejects"]
        .groupBy("signal_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("n_bytes"),
            F.lit(999).alias("gid"),
        )
    )
    rows = fine.unionByName(rej, allowMissingColumns=True).collect()
    acc: dict = {}
    by_tool: dict = {}
    for r in rows:
        if r.gid == 999:
            acc.setdefault(r.signal_type, [r.signal_type, 0, 0, 0, 0])[3:5] = [r.n, r.n_bytes or 0]
            continue
        a = acc.setdefault(r.signal_type, [r.signal_type, 0, 0, 0, 0])
        a[1] += r.n
        a[2] += r.n_bytes or 0
        key = (r.signal_type, r.tool)
        by_tool[key] = by_tool.get(key, 0) + r.n
    return {
        "accounting": [tuple(v) for v in acc.values()],
        "by_signal_tool": [(s, t, n) for (s, t), n in by_tool.items()],
        "by_time_bucket": [
            (r.bucket_start, r.signal_type, r.tool, r.n)
            for r in rows
            if r.gid == 0
        ],
    }
