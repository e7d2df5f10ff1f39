"""P1 (physical form): transcripts -> flat union-record stream.

One Arrow-vectorized ``mapInArrow`` pass applies the reference's whole
per-request write path (validate F1-F6 -> decode P1 -> flatten P2-P4 ->
project P5-P7 -> per-turn tx rollback, handlers/handler_common.go:15-45 +
database/*.go) and emits ONE ROW PER RECORD with a ``rec_kind``
discriminator instead of one nested struct per turn.

Why this shape (scale rationale, measured at 200k-1M turns / local[32]):

 - all output columns are scalars -> the Arrow->JVM row conversion is
   vectorizable, ~6x cheaper than ArrayType(StructType) columns;
 - downstream sinks select ``rec_kind == X`` + their own columns, so
   the in-memory columnar cache (or parquet staging at 100 TB, where
   the staging table is partitioned by rec_kind) prunes to exactly the
   bytes each sink needs instead of re-deserializing a fat blob 7x;
 - the record stream is the natural checkpoint artifact: committed
   staging partitions ARE the resume lineage.

Why ``mapInArrow`` rather than ``mapInPandas`` (measured ~25-30% of the
stage wall): the kernel is a per-turn Python loop either way, but
pandas adds a round trip on both edges — input Arrow -> object-dtype
Series -> tolist(), output lists -> object Series -> DataFrame ->
Arrow. Building ``pyarrow.RecordBatch`` columns straight from the
Python lists skips all four conversions, and null handling becomes
native (a null ts stays None instead of poisoning an int64 column into
float64+NaN).

Emission is columnar per kind: each input batch accumulates per-kind
column lists and yields one RecordBatch per kind, so a record touches
only its own columns (a span fills 24, not 43) and absent columns
materialize as O(1) ``pa.nulls``. Long columns never pass through
float64 (NaN coercion would silently round int64 nanosecond timestamps
beyond 2^53 — SURVEY §2.3 P8 stores raw int64 nanos).

The per-turn semantics live in ``functions.parse`` (pure, unit-
testable); this module only owns the Spark plumbing.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame

from sqlite_otel_spark.functions.parse import (
    LOG_FIELDS,
    METRIC_DEF_FIELDS,
    POINT_FIELDS,
    RECORD_COLS,
    RECORDS_SCHEMA,
    RESOURCE_KEY_FIELDS,
    SCOPE_KEY_FIELDS,
    SPAN_FIELDS,
    parse_turn,
)

_INPUT_COLS = ("conv_id", "turn_idx", "role", "tool", "ts_us", "text", "nb")
_LINEAGE = ["conv_id", "turn_idx", "role", "tool", "ts_us"]

# kind -> (parse_turn output key, record-specific columns)
_KIND_FIELDS = {
    "resource": ("resources", [n for n, _ in RESOURCE_KEY_FIELDS]),
    "scope": ("scopes", [n for n, _ in SCOPE_KEY_FIELDS]),
    "metric_def": ("metric_defs", [n for n, _ in METRIC_DEF_FIELDS]),
    "span": ("spans", [n for n, _ in SPAN_FIELDS]),
    "log": ("logs", [n for n, _ in LOG_FIELDS]),
    "point": ("points", [n for n, _ in POINT_FIELDS]),
}
_TURN_COLS = ["signal_type", "error", "text"]

# Spark SQL type -> arrow type for the record stream (all scalars).
_PA_BY_SPARK = {
    "string": pa.string(),
    "int": pa.int32(),
    "bigint": pa.int64(),
    "double": pa.float64(),
}


def _pa_schema(extra_n_bytes: bool) -> pa.Schema:
    fields = [
        pa.field(f.name, _PA_BY_SPARK[f.dataType.simpleString()])
        for f in RECORDS_SCHEMA.fields
    ]
    if extra_n_bytes:
        fields.append(pa.field("n_bytes", pa.int64()))
    return pa.schema(fields)


def _batch(kind: str, cols: dict[str, list], schema: pa.Schema) -> pa.RecordBatch:
    """Assemble a full-width RecordBatch for one kind; columns the kind
    doesn't produce are null-filled (O(1) null bitmaps, no per-row
    Python)."""
    n = len(cols["conv_id"])
    arrays = []
    for f in schema:
        if f.name == "rec_kind":
            arrays.append(pa.array([kind] * n, type=f.type))
        elif f.name in cols:
            arrays.append(pa.array(cols[f.name], type=f.type))
        else:
            arrays.append(pa.nulls(n, type=f.type))
    return pa.RecordBatch.from_arrays(arrays, schema=schema)


def to_records(df: DataFrame, max_text_bytes: int = 10 * 1024 * 1024,
               emit_text: bool = True) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> records
    DataFrame in RECORDS_SCHEMA. Narrow (no shuffle): each input split
    parses independently, exactly like the reference's
    goroutine-per-request independence (main.go:154-160).

    ``emit_text=False`` drops the raw text after parsing (the reference
    never persists request bodies); the ``text`` column is then null and
    n_bytes is computed in Python before the drop."""

    out_schema = _pa_schema(extra_n_bytes=not emit_text)

    def gen(batches):
        for rb in batches:
            turn_cols = _TURN_COLS if emit_text else (*_TURN_COLS, "n_bytes")
            acc: dict[str, dict[str, list]] = {
                "turn": {c: [] for c in (*_LINEAGE, *turn_cols)},
                **{
                    k: {c: [] for c in (*_LINEAGE, *fields)}
                    for k, (_, fields) in _KIND_FIELDS.items()
                },
            }
            turn = acc["turn"]
            names = rb.schema.names
            inputs = [rb.column(names.index(c)).to_pylist() for c in _INPUT_COLS]
            for conv, ti, role, tool, ts, text, nb in zip(*inputs):
                p = parse_turn(text, max_text_bytes, n_bytes=nb)
                turn["conv_id"].append(conv)
                turn["turn_idx"].append(ti)
                turn["role"].append(role)
                turn["tool"].append(tool)
                turn["ts_us"].append(ts)
                turn["signal_type"].append(p["signal_type"])
                turn["error"].append(p["error"])
                turn["text"].append(text if emit_text else None)
                if not emit_text:
                    turn["n_bytes"].append(nb)
                for kind, (plural, fields) in _KIND_FIELDS.items():
                    recs = p[plural]
                    if not recs:
                        continue
                    a = acc[kind]
                    for r in recs:
                        a["conv_id"].append(conv)
                        a["turn_idx"].append(ti)
                        a["role"].append(role)
                        a["tool"].append(tool)
                        a["ts_us"].append(ts)
                        for c in fields:
                            a[c].append(r[c])
            for kind, cols in acc.items():
                if cols["conv_id"]:
                    yield _batch(kind, cols, out_schema)

    from pyspark.sql import functions as F

    src = df.select(
        "conv_id", "turn_idx", "role", "tool",
        # cast tolerates TIMESTAMP_NTZ parquet inputs (session tz is UTC,
        # so the wall-clock value is unchanged)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"), "text",
        # JVM-side prefilter input: exact UTF-8 byte length so the
        # Python kernel's 10 MB size guard never encodes the text
        # (round-3; the whitespace-exact empty/'{' checks stay in
        # Python — Spark's trim strips a different whitespace set).
        F.octet_length("text").alias("nb"),
    )
    schema = RECORDS_SCHEMA
    if not emit_text:
        from pyspark.sql.types import LongType, StructField, StructType
        schema = StructType(schema.fields + [StructField("n_bytes", LongType(), True)])
    out = src.mapInArrow(gen, schema)
    # JVM-side restoration/derivation (cheap codegen projections, kept out
    # of the Python hot loop): ts from microseconds, n_bytes from text.
    out = out.withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    if emit_text:
        out = out.withColumn(
            "n_bytes",
            F.when(F.col("rec_kind") == "turn", F.octet_length("text")),
        )
    return out


def of_kind(records: DataFrame, kind: str) -> DataFrame:
    return records.filter(records["rec_kind"] == kind)
