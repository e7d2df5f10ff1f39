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
pathological), so we compute the duplicate-key set with one aggregation,
semi-join down to the conflicting turns, collect just their (turn, key)
pairs to the driver, and replay the sequential commit order there. The
verdict set is broadcast back as an anti-join. A hard cap guards the
collect; exceeding it means the input is adversarial and the job should
fail loudly rather than OOM the driver.

Canonical arrival order is (conv_id, turn_idx) — the graft's stable
ordering invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConflictOverflowError(RuntimeError):
    pass


def resolve_span_conflicts(
    spark: SparkSession, parsed: DataFrame, max_conflict_turns: int = 100_000
) -> tuple[DataFrame | None, int]:
    """Return (invalid_turns_df | None, n_invalid) — turns rejected by the
    cross-turn spans PK cascade. ``parsed`` must carry conv_id, turn_idx
    and the ``parsed`` struct; locally-failed turns have empty span
    arrays and are transparently excluded."""
    span_keys = (
        parsed.select("conv_id", "turn_idx", F.explode("parsed.spans").alias("s"))
        .select("conv_id", "turn_idx", "s.trace_id", "s.span_id")
    )
    dup_keys = (
        span_keys.groupBy("trace_id", "span_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .drop("n")
    )
    # Turns touching any duplicated key; AQE picks the join strategy
    # (dup_keys is near-empty in sane inputs -> broadcast at runtime).
    conflicted = span_keys.join(dup_keys, ["trace_id", "span_id"], "leftsemi")
    rows = conflicted.limit(max_conflict_turns + 1).collect()
    if len(rows) > max_conflict_turns:
        raise ConflictOverflowError(
            f"more than {max_conflict_turns} span-PK-conflicting turn/key pairs; "
            "input looks adversarial (duplicate trace/span ids at scale)"
        )
    if not rows:
        return None, 0

    # Sequential replay in canonical arrival order.
    by_turn: dict[tuple, list[tuple]] = {}
    for r in rows:
        by_turn.setdefault((r.conv_id, r.turn_idx), []).append((r.trace_id, r.span_id))
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
