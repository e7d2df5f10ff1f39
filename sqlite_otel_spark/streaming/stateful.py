"""Custom stateful streaming operator (brief §streaming:
``applyInPandasWithState`` for custom stateful operators).

The reference keeps its cross-request dedup state in SQLite unique
indexes (database/shared.go:25-163, db.go:153-155): a span PK seen in an
earlier request silently wins over later arrivals. The foreachBatch
variant (streaming/stream.py) reproduces that by anti-joining the sink —
O(committed) re-read per micro-batch. This module is the in-stream
alternative: dedup state lives IN the streaming state store, partitioned
by a hash bucket of the PK, so each micro-batch touches only its own
buckets' state and a restart recovers state from the checkpoint instead
of rescanning the sink.

Scale shape: state is sharded by ``pmod(xxhash64(pk), n_buckets)`` —
the same key distribution argument as the sink tables; a hot trace id
cannot pin one state partition because the full PK feeds the hash.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "conv_id string, turn_idx int, trace_id string, span_id string"
)
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(key, pdfs, state: GroupState):
    """Emit only first-seen (trace_id, span_id) pairs for this bucket,
    in arrival order; remember every seen PK across micro-batches."""
    seen = set(state.get[0]) if state.exists else set()
    out_cols: dict[str, list] = {
        "conv_id": [], "turn_idx": [], "trace_id": [], "span_id": []
    }
    for pdf in pdfs:
        for conv, ti, tid, sid in zip(
            pdf["conv_id"], pdf["turn_idx"], pdf["trace_id"], pdf["span_id"]
        ):
            pk = f"{tid}\x00{sid}"
            if pk in seen:
                continue
            seen.add(pk)
            out_cols["conv_id"].append(conv)
            out_cols["turn_idx"].append(int(ti))
            out_cols["trace_id"].append(tid)
            out_cols["span_id"].append(sid)
    state.update((sorted(seen),))
    if out_cols["conv_id"]:
        yield pd.DataFrame(out_cols)


def dedup_span_keys_stateful(
    span_keys: DataFrame, n_buckets: int = 64
) -> DataFrame:
    """First-seen span-PK stream: input (conv_id, turn_idx, trace_id,
    span_id) streaming DataFrame -> only rows whose PK was never seen in
    any earlier micro-batch (or earlier in the same batch). Works on a
    streaming DataFrame; on a batch DataFrame Spark applies the same
    semantics with a single 'batch'."""
    bucketed = span_keys.withColumn(
        "bucket",
        F.pmod(F.xxhash64("trace_id", "span_id"), F.lit(n_buckets)).cast("int"),
    )
    return (
        bucketed.groupBy("bucket")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
