"""P2-P7 + S2/R1: fact extraction and routing (SURVEY §2.3, §2.5).

The parse UDF already produced typed record arrays per turn; here the
triple/quadruple flattens (database/traces.go:22-83 etc.) become native
``explode`` and the projections are pure column selects — all JVM-side,
whole-stage-codegen eligible.

Each fact row carries graft provenance columns (conv_id, turn_idx, role,
tool, ts) in addition to the reference's column set (database/db.go:
79-143): they power the per-turn text-equality invariant, the tool/time
aggregates, and the per-partition lineage — the reference's analogue is
its per-request accounting (handlers/handler_common.go:55-64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlite_otel_spark.operators.dims import attach_dim_ids

LINEAGE = ["conv_id", "turn_idx", "role", "tool", "ts"]

SPAN_COLS = [
    "trace_id", "span_id", "trace_state", "parent_span_id", "name", "kind",
    "start_time_unix_nano", "end_time_unix_nano", "attributes", "events",
    "links", "status_code", "status_message", "resource_id", "scope_id",
]
LOG_COLS = [
    "time_unix_nano", "observed_time_unix_nano", "severity_number",
    "severity_text", "body", "attributes", "trace_id", "span_id", "flags",
    "resource_id", "scope_id",
]
POINT_COLS = [
    "metric_id", "attributes", "start_time_unix_nano", "time_unix_nano",
    "value_double", "value_int", "exemplars", "flags",
]


def _explode(parsed: DataFrame, array_field: str) -> DataFrame:
    return parsed.select(
        *LINEAGE, F.explode(f"parsed.{array_field}").alias("rec")
    ).select(*LINEAGE, "rec.*")


def build_spans(parsed: DataFrame, resources, scopes, mode: str = "hash") -> DataFrame:
    """spans sink (db.go:79-98). Cross-turn PK conflicts must already be
    resolved (operators/conflicts.py); within-turn duplicates were
    rejected at parse."""
    return attach_dim_ids(_explode(parsed, "spans"), resources, scopes, mode).select(
        *LINEAGE, *SPAN_COLS
    )


def build_log_records(parsed: DataFrame, resources, scopes, mode: str = "hash") -> DataFrame:
    """log_records sink (db.go:128-143); resource_id=0 rows have a null
    resource natural key (logs.go:29-35)."""
    return attach_dim_ids(_explode(parsed, "logs"), resources, scopes, mode).select(
        *LINEAGE, *LOG_COLS
    )


def build_points(
    parsed: DataFrame, resources, scopes, metric_defs, mode: str = "hash"
) -> DataFrame:
    """metric_data_points sink (db.go:114-125): FK to the metrics dim via
    its 4-part natural key (name, metric_type, resource_id, scope_id)."""
    pts = attach_dim_ids(_explode(parsed, "points"), resources, scopes, mode)
    if mode == "hash":
        pts = pts.withColumn(
            "metric_id",
            F.xxhash64(F.lit("metric"), "metric_name", "metric_type", "resource_id", "scope_id"),
        )
    else:
        md = F.broadcast(
            metric_defs.select(
                F.col("id").alias("metric_id"),
                F.col("name").alias("metric_name"),
                "metric_type", "resource_id", "scope_id",
            )
        )
        pts = pts.join(md, ["metric_name", "metric_type", "resource_id", "scope_id"], "left")
    return pts.select(*LINEAGE, *POINT_COLS, "metric_name", "metric_type",
                      "resource_id", "scope_id")


def build_rejects(parsed: DataFrame) -> DataFrame:
    """Quarantine sink: the reference answers 4xx/5xx and logs the failure
    (handler_common.go:38-53); we persist the accounting row."""
    return parsed.filter(F.col("parsed.error").isNotNull()).select(
        *LINEAGE,
        F.col("parsed.signal_type").alias("signal_type"),
        F.col("parsed.error").alias("reason"),
        F.octet_length("text").alias("n_bytes"),
    )


def build_routed(parsed: DataFrame) -> DataFrame:
    """Accepted turns with their routed signal — the per-turn text
    equality surface (north_rule: 'routed rows must satisfy per-turn text
    equality under stable (conv_id, turn_idx) ordering')."""
    return parsed.filter(F.col("parsed.error").isNull()).select(
        *LINEAGE,
        F.col("parsed.signal_type").alias("signal_type"),
        "text",
        F.octet_length("text").alias("n_bytes"),
    )
