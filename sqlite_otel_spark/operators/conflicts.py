"""D4: global spans PRIMARY KEY semantics across turns (SURVEY §2.4, §7c).

The reference enforces PRIMARY KEY(trace_id, span_id) in SQLite
(database/db.go:95): a turn whose span collides with an EARLIER COMMITTED
span fails entirely (transaction rollback), which can in turn free keys
for later turns — a sequential cascade:

    turn A commits span X
    turn B carries X and Y -> rejected (X taken); Y never commits
    turn C carries Y        -> accepted (B never committed)

Distributed resolution: only turns that contain a *globally duplicated*
key can be affected (keys unique to one turn can never collide). Those
turns are a vanishing fraction of real telemetry (duplicate span ids are
pathological), so a counts-only aggregation over the pruned span-key
projection finds the duplicated keys first and enforces the hard cap,
then a semi-join collects the (turn, key) pairs — provably bounded by
the cap — and the driver replays the sequential commit order over just
those pairs. The verdict set is broadcast back as an anti-join.
Exceeding the cap means the input is adversarial and the job fails
loudly (before any oversized group materializes on an executor or any
wide row reaches the driver) rather than OOMing.

Canonical arrival order is (conv_id, turn_idx) — the graft's stable
ordering invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConflictOverflowError(RuntimeError):
    pass


def resolve_span_conflicts(
    spark: SparkSession, records: DataFrame, max_conflict_turns: int = 100_000
) -> tuple[DataFrame | None, int]:
    """Return (invalid_turns_df | None, n_invalid) — turns rejected by the
    cross-turn spans PK cascade. ``records`` is the flat record stream
    (operators/records.py); locally-failed turns emitted no span rows and
    are transparently excluded. Two jobs over the pruned
    (conv_id, turn_idx, trace_id, span_id) projection: a counts-only agg
    that enforces the cap, then a bounded semi-join collect (the dup set
    is near-empty in sane inputs)."""
    span_keys = records.filter(F.col("rec_kind") == "span").select(
        "conv_id", "turn_idx", "trace_id", "span_id"
    )
    # Pass 1 — counts only: the adversarial-input guard fires BEFORE any
    # per-key list materializes on an executor or any wide row reaches
    # the driver (a hot key under collect_list would otherwise buffer its
    # whole group first). This is a pure partial+final count agg.
    dup_keys = (
        span_keys.groupBy("trace_id", "span_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    stats = dup_keys.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("n").alias("n_pairs")
    ).collect()[0]
    if not stats.n_keys:
        return None, 0
    if stats.n_keys > max_conflict_turns or stats.n_pairs > max_conflict_turns:
        raise ConflictOverflowError(
            f"more than {max_conflict_turns} span-PK-conflicting turn/key pairs; "
            "input looks adversarial (duplicate trace/span ids at scale)"
        )
    # Pass 2 — now provably bounded (n_pairs <= max_conflict_turns rows):
    # semi-join the pruned projection against the duplicated keys and
    # collect the flat (turn, key) pairs.
    pair_rows = span_keys.join(
        F.broadcast(dup_keys.select("trace_id", "span_id")),
        ["trace_id", "span_id"],
        "leftsemi",
    ).collect()

    # Sequential replay in canonical arrival order.
    by_turn: dict[tuple, list[tuple]] = {}
    for r in pair_rows:
        by_turn.setdefault((r.conv_id, r.turn_idx), []).append(
            (r.trace_id, r.span_id)
        )
    committed: set[tuple] = set()
    invalid: list[tuple] = []
    for turn in sorted(by_turn):
        keys = by_turn[turn]
        if any(k in committed for k in keys):
            invalid.append(turn)
        else:
            committed.update(keys)
    if not invalid:
        return None, 0
    invalid_df = spark.createDataFrame(invalid, schema="conv_id string, turn_idx int")
    return invalid_df, len(invalid)


def drop_conflicted(parsed: DataFrame, invalid_turns: DataFrame | None) -> DataFrame:
    """Anti-join the (tiny, broadcast) invalid-turn set out of the parsed
    stream — the distributed analogue of the rolled-back transactions."""
    if invalid_turns is None:
        return parsed
    return parsed.join(
        F.broadcast(invalid_turns), ["conv_id", "turn_idx"], "left_anti"
    )
