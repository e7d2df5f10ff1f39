"""P1 (physical form): transcripts -> flat union-record stream.

One Arrow-vectorized ``mapInPandas`` pass applies the reference's whole
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

Emission is columnar per kind: each input batch accumulates per-kind
column lists and yields one pandas frame per kind, so a record touches
only its own columns (a span fills 24, not 43) and the absent columns
materialize as O(1)-ish numpy None fills. Long columns never pass
through float64 (NaN coercion would silently round int64 nanosecond
timestamps beyond 2^53 — SURVEY §2.3 P8 stores raw int64 nanos), hence
object dtype end-to-end.

The per-turn semantics live in ``functions.parse`` (pure, unit-
testable); this module only owns the Spark plumbing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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

_INPUT_COLS = ("conv_id", "turn_idx", "role", "tool", "ts_us", "text")
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


def _frame(kind: str, cols: dict[str, list], out_cols: list[str]) -> pd.DataFrame:
    """Assemble a full-width output pandas frame for one kind; columns
    the kind doesn't produce are null-filled."""
    n = len(cols["conv_id"])
    none_fill = None
    out = {}
    for c in out_cols:
        if c == "rec_kind":
            out[c] = pd.Series(np.full(n, kind, dtype=object))
        elif c in cols:
            out[c] = pd.Series(cols[c], dtype=object)
        else:
            if none_fill is None:
                none_fill = pd.Series(np.full(n, None, dtype=object))
            out[c] = none_fill
    return pd.DataFrame(out)


def to_records(df: DataFrame, max_text_bytes: int = 10 * 1024 * 1024,
               emit_text: bool = True) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> records
    DataFrame in RECORDS_SCHEMA. Narrow (no shuffle): each input split
    parses independently, exactly like the reference's
    goroutine-per-request independence (main.go:154-160).

    ``emit_text=False`` drops the raw text after parsing (the reference
    never persists request bodies); the ``text`` column is then null and
    n_bytes is computed in Python before the drop."""

    out_cols = RECORD_COLS if emit_text else [*RECORD_COLS, "n_bytes"]

    def gen(batches):
        for pdf in batches:
            turn_cols = _TURN_COLS if emit_text else (*_TURN_COLS, "n_bytes")
            acc: dict[str, dict[str, list]] = {
                "turn": {c: [] for c in (*_LINEAGE, *turn_cols)},
                **{
                    k: {c: [] for c in (*_LINEAGE, *fields)}
                    for k, (_, fields) in _KIND_FIELDS.items()
                },
            }
            turn = acc["turn"]
            inputs = [pdf[c].tolist() for c in _INPUT_COLS]
            # A null (or uncastable) ts makes Arrow->pandas deliver ts_us
            # as float64 with NaN; feeding floats/NaN back into the
            # LongType column would fail the whole batch. Restore
            # int-or-None per value (only paid when nulls are present).
            if pdf["ts_us"].dtype.kind == "f":
                i = _INPUT_COLS.index("ts_us")
                inputs[i] = [None if v != v else int(v) for v in inputs[i]]
            for conv, ti, role, tool, ts, text in zip(*inputs):
                p = parse_turn(text, max_text_bytes)
                turn["conv_id"].append(conv)
                turn["turn_idx"].append(ti)
                turn["role"].append(role)
                turn["tool"].append(tool)
                turn["ts_us"].append(ts)
                turn["signal_type"].append(p["signal_type"])
                turn["error"].append(p["error"])
                turn["text"].append(text if emit_text else None)
                if not emit_text:
                    turn["n_bytes"].append(
                        None if text is None
                        else len(text.encode("utf-8", errors="surrogatepass"))
                    )
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
                    yield _frame(kind, cols, out_cols)

    from pyspark.sql import functions as F

    src = df.select(
        "conv_id", "turn_idx", "role", "tool",
        # cast tolerates TIMESTAMP_NTZ parquet inputs (session tz is UTC,
        # so the wall-clock value is unchanged)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"), "text",
    )
    schema = RECORDS_SCHEMA
    if not emit_text:
        from pyspark.sql.types import LongType, StructField, StructType
        schema = StructType(schema.fields + [StructField("n_bytes", LongType(), True)])
    out = src.mapInPandas(gen, schema)
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
