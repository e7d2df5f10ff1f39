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
pathological), so ONE aggregation over the pruned span-key projection
finds the duplicated keys and collects their touching turns in the same
pass (collect_list rides the partial+final hash agg); the driver replays
the sequential commit order over just those pairs. The verdict set is
broadcast back as an anti-join. A hard cap guards the collect; exceeding
it means the input is adversarial and the job should fail loudly rather
than OOM the driver.

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
    are transparently excluded. ONE aggregation job over the pruned
    (conv_id, turn_idx, trace_id, span_id) projection: duplicated keys
    collect their touching turns in the same pass (map-side partial agg;
    the dup set is near-empty in sane inputs)."""
    span_keys = records.filter(F.col("rec_kind") == "span").select(
        "conv_id", "turn_idx", "trace_id", "span_id"
    )
    dup_rows = (
        span_keys.groupBy("trace_id", "span_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.slice(
                F.collect_list(F.struct("conv_id", "turn_idx")),
                1, max_conflict_turns + 1,
            ).alias("turns"),
        )
        .filter(F.col("n") > 1)
        .limit(max_conflict_turns + 1)
        .collect()
    )
    if not dup_rows:
        return None, 0
    n_pairs = sum(r.n for r in dup_rows)
    if len(dup_rows) > max_conflict_turns or n_pairs > max_conflict_turns:
        raise ConflictOverflowError(
            f"more than {max_conflict_turns} span-PK-conflicting turn/key pairs; "
            "input looks adversarial (duplicate trace/span ids at scale)"
        )

    # Sequential replay in canonical arrival order.
    by_turn: dict[tuple, list[tuple]] = {}
    for r in dup_rows:
        for t in r.turns:
            by_turn.setdefault((t.conv_id, t.turn_idx), []).append(
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
