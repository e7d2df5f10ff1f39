"""P1 (physical form): transcripts -> flat union-record stream.

One Arrow-vectorized ``mapInPandas`` pass applies the reference's whole
per-request write path (validate F1-F6 -> decode P1 -> flatten P2-P4 ->
project P5-P7 -> per-turn tx rollback, handlers/handler_common.go:15-45 +
database/*.go) and emits ONE ROW PER RECORD with a ``rec_kind``
discriminator instead of one nested struct per turn.

Why this shape (scale rationale, measured at 200k turns / local[32]):

 - all output columns are scalars -> the Arrow->JVM row conversion is
   vectorizable, ~6x cheaper than ArrayType(StructType) columns;
 - downstream sinks select ``rec_kind == X`` + their own columns, so
   the in-memory columnar cache (or parquet staging at 100 TB, where
   the staging table is partitioned by rec_kind) prunes to exactly the
   bytes each sink needs instead of re-deserializing a fat blob 7x;
 - the record stream is the natural checkpoint artifact: committed
   staging partitions ARE the resume lineage.

The per-turn semantics live in ``functions.parse.turn_records`` (pure,
unit-testable); this module only owns the Spark plumbing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, TimestampType

from sqlite_otel_spark.functions.parse import RECORD_COLS, RECORDS_SCHEMA, turn_records

# Column -> pandas dtype for exact Arrow conversion. Everything is
# ``object`` except genuine floats: long columns MUST NOT pass through
# float64 (NaN coercion would silently round nanosecond timestamps
# beyond 2^53 — SURVEY §2.3 P8 stores raw int64 nanos).
_PD_DTYPE = {
    f.name: ("float64" if isinstance(f.dataType, DoubleType) else "object")
    for f in RECORDS_SCHEMA.fields
}
_TS_COLS = [f.name for f in RECORDS_SCHEMA.fields if isinstance(f.dataType, TimestampType)]

_INPUT_COLS = ("conv_id", "turn_idx", "role", "tool", "ts", "text")


def _records_frame(rows: list[dict]) -> pd.DataFrame:
    data = {c: [] for c in RECORD_COLS}
    for rec in rows:
        get = rec.get
        for c in RECORD_COLS:
            data[c].append(get(c))
    out = {}
    for c in RECORD_COLS:
        if c in _TS_COLS:
            out[c] = pd.Series(pd.to_datetime(data[c]), dtype="datetime64[us]")
        else:
            out[c] = pd.Series(data[c], dtype=_PD_DTYPE[c])
    return pd.DataFrame(out)


def to_records(df: DataFrame, max_text_bytes: int = 10 * 1024 * 1024) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> records
    DataFrame in RECORDS_SCHEMA. Narrow (no shuffle): each input split
    parses independently, exactly like the reference's
    goroutine-per-request independence (main.go:154-160)."""

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for conv, ti, role, tool, ts, text in zip(
                *(pdf[c] for c in _INPUT_COLS)
            ):
                rows.extend(
                    turn_records(conv, ti, role, tool, ts, text, max_text_bytes)
                )
            yield _records_frame(rows)

    return df.select(*_INPUT_COLS).mapInPandas(gen, RECORDS_SCHEMA)


def of_kind(records: DataFrame, kind: str) -> DataFrame:
    return records.filter(records["rec_kind"] == kind)
