"""Per-round benchmark (driver contract).

Prints ONE JSON line to stdout:
  {"metric": "e2e_pipeline_turns_per_sec", "value": <turns/sec at full
   parallelism>, "unit": "sec", "queries": {<name>: seconds, ...},
   "sf": <sf>, ...evidence keys...}

North-rule scaling evidence (sandbox stand-in for N vs 4N executors):
the identical pipeline job runs at THREE parallelism levels on the same
cached input — local[2], local[8] (the N -> 4N pair: 2 -> 8 cores) and
local[CPUS] (the full-machine headline). Efficiency(a->b) =
(thr_b / thr_a) / (b / a).

Reliability + self-containment (round-3 hardening; VERDICT r2 items 1-2):
 - EVERY level runs in a FRESH SUBPROCESS JVM: the levels share nothing
   (no cross-level session state, no cross-run "best pairing" — one
   invocation produces the whole scaling row), and the -Xss16m stack
   sizing in session.py actually reaches JVM launch for each level.
 - Each level is wrapped in try/except with a timeout; the final JSON
   record ALWAYS prints with whatever levels completed (a partial record
   beats `parsed: null`), and is written to BENCH/BENCH_last.json BEFORE
   stdout so a late crash cannot eat it.

Methodology notes (also appended to BENCH/BASELINE.md):
 - The timed section is the BASELINE.json metric — end-to-end
   parse -> enrich -> route -> aggregate: pipeline DAG + materializing
   all seven per-sink counts (the count-equality surface) + the three
   accounting/rollup aggregates. The parquet sink-write wall is
   measured once at full parallelism and reported separately
   (sink_write_sec).
 - One untimed warm-up run per level (fresh JVMs re-pay JIT + codegen +
   Python worker forks — one-time process costs a long-lived collector
   never re-pays) over a 1/5-size input: plan shape and code paths are
   identical, so JIT/codegen warm fully at a fifth of the wall.
 - Timed runs take min-of-k because the sandbox microVM shows one-sided
   multi-second noise (BENCH/SCALING.md).
 - Memory scales WITH the level (heap = 4*cores GiB, cap 48): the
   north rule's criterion is N -> 4N EXECUTORS, and executors bring
   their memory with them — equal-total-memory levels would measure
   the single-box spill cliff (local[32]@16g OOMs reading back spilled
   cache; local[2]@16g enjoys 8x the per-task memory a 1-executor
   cluster would have), not executor scaling. See level_heap().
 - The 2 -> 8 pair is the compute-bound demonstration; 8 -> 32 is also
   reported but at sf0.1 it is bounded by the ~10 s fixed driver/
   scheduling cost per run, which amortizes at the 10^12-turn design
   scale (ratio fixed/compute falls ~10^6x).

Input: transcripts synthesized deterministically (fixtures.py, seed=42)
at a row count proportional to the sf of $SPARK_GRAFT_SF_DIR
(sf0.1 -> 3M turns), cached as parquet under .bench_cache/.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Memory model (round 3): the north rule scales EXECUTORS (N -> 4N),
# and on a real cluster aggregate memory grows with executor count. A
# level emulating E executors of (2 cores + 8 GiB) therefore gets a
# heap of 4*cores GiB (capped at 48 — the 3M-turn cache fully fits by
# ~28g, beyond which memory is unused). Measured on this host:
# local[2]@8g spills part of the record cache (~203s best) exactly as
# a real 1-executor run would, local[32]@16g spills catastrophically
# (OOM/2x walls) while @28g+ matches the all-time best (49.3s) — so
# equal-total-memory levels would measure the spill cliff, not
# executor scaling. The heap is set per level by the parent
# (spawn_level env); SPARK_GRAFT_DRIVER_MEM pre-set in the
# environment overrides the model (equal-memory runs for comparison).


def level_heap(cores: int) -> str:
    return f"{min(48, max(8, 4 * cores))}g"
TURNS_PER_SF = 30_000_000  # sf0.1 -> 3M turns
_MARKER = "LEVEL_RESULT "


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.1


def ensure_transcripts(n: int) -> str:
    from sqlite_otel_spark.fixtures import write_transcripts_parquet

    cache = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"transcripts_n{n}.parquet")
    if not os.path.exists(path):
        log(f"generating {n} fixture turns -> {path}")
        write_transcripts_parquet(path, n, seed=42)
    return path


def new_session(master: str, shuffle_partitions: int):
    from pyspark.sql import SparkSession

    from sqlite_otel_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(app_name=f"bench-{master}", master=master,
                      shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def timed_pipeline(spark, transcripts_path: str, rep: int,
                   emit_text: bool = True) -> float:
    """The metric's timed section: parse -> enrich -> route -> aggregate,
    materializing per-sink counts + the three aggregates (concurrent
    driver submission — independent sub-DAGs over the shared cache).

    ``emit_text=False`` is the REFERENCE-FAITHFUL retention mode (the
    collector never persists raw request bodies,
    handlers/handler_common.go:33-45); it drops the raw text right
    after parse, removing the cache's dominant column. Reported as a
    secondary scaling row: on one box, memory bandwidth is shared by
    all cores — the one resource a real N->4N EXECUTOR scale-up
    multiplies but a core scale-up cannot."""
    from sqlite_otel_spark.config import PipelineConfig
    from sqlite_otel_spark.plans.pipeline import collect_aggregates, run_pipeline

    from sqlite_otel_spark.operators.aggregates import sink_counts

    df = spark.read.parquet(transcripts_path)
    t0 = time.monotonic()
    result = run_pipeline(spark, df, PipelineConfig(emit_text=emit_text),
                          repartition_to=rep, do_salt=True)
    # two concurrently-submitted jobs total: the 7-sink fused count and
    # the GROUPING-SETS fused rollup (driver-latency floor, not 11 jobs)
    with ThreadPoolExecutor(max_workers=2) as pool:
        counts = pool.submit(sink_counts, result.sinks)
        aggs = pool.submit(collect_aggregates, result)
        counts.result()
        aggs.result()
    wall = time.monotonic() - t0
    result.unpersist()
    return wall


def timed_writes(spark, transcripts_path: str, rep: int) -> float:
    """Sink parquet writes, measured separately at full parallelism."""
    from sqlite_otel_spark.config import PipelineConfig
    from sqlite_otel_spark.plans.pipeline import run_pipeline, write_sinks

    df = spark.read.parquet(transcripts_path)
    out = tempfile.mkdtemp(prefix="bench_sinks_")
    result = run_pipeline(spark, df, PipelineConfig(), repartition_to=rep,
                          do_salt=True)
    result.sinks["spans"].count()  # materialize cache outside the timer
    t0 = time.monotonic()
    write_sinks(result, out)
    wall = time.monotonic() - t0
    result.unpersist()
    shutil.rmtree(out, ignore_errors=True)
    return wall


def time_queries(spark) -> dict[str, float]:
    import sqlite_otel_spark.queries as Q

    names = [
        "q1_lineitem_rollup", "q3_top_revenue_orders", "q5_region_nation_rollup",
        "a3_time_bucket_counts", "a5_retention_topk", "d5_broadcast_enrichment",
        "w1_window_rank_orders", "dp_ngram_jaccard", "dp_minhash_lsh",
        "dp_simhash_neardup", "dp_ann_brute_topk", "dp_ann_lsh_topk", "dp_ann_ivf_topk",
        "dp_fingerprint", "dp_token_count", "dp_multimodal_features",
    ]
    out = {}
    for name in names:
        fn = Q.QUERIES[name]
        t0 = time.monotonic()
        try:
            n = fn(spark, SF_DIR).count()
        except Exception as e:  # one broken query must not kill the record
            log(f"  {name}: FAILED ({type(e).__name__}: {e})")
            continue
        out[name] = round(time.monotonic() - t0, 3)
        log(f"  {name}: {out[name]}s ({n} rows)")
    return out


# ---------------------------------------------------------------------------
# Child: one level in this (fresh) process/JVM.
# ---------------------------------------------------------------------------


def child_main(a: argparse.Namespace) -> None:
    spark = new_session(a.master, a.rep)
    if a.warmup_path:
        log(f"== warm-up (untimed, {a.master}, 1/5-size input) ==")
        timed_pipeline(spark, a.warmup_path, a.rep)
    walls = []
    for i in range(a.k):
        w = timed_pipeline(spark, a.transcripts, a.rep)
        walls.append(w)
        log(f"{a.master} run{i}: {w:.2f}s ({a.n_turns / w:,.0f} turns/s)")
    out = {
        "master": a.master,
        "wall": round(min(walls), 3),
        "walls": [round(w, 3) for w in walls],
    }
    if a.master in ("local[2]", "local[8]"):
        # secondary N->4N evidence: reference-faithful no-body-retention
        # mode (see timed_pipeline docstring) on the criterion pair
        nt = []
        for i in range(2):
            w = timed_pipeline(spark, a.transcripts, a.rep, emit_text=False)
            nt.append(round(w, 3))
            log(f"{a.master} notext run{i}: {w:.2f}s "
                f"({a.n_turns / w:,.0f} turns/s)")
        out["walls_notext"] = nt
        out["wall_notext"] = min(nt)
    if a.extras:
        log("== sink write wall (full parallelism) ==")
        out["write_wall"] = round(timed_writes(spark, a.transcripts, a.rep), 3)
        log(f"sink writes: {out['write_wall']}s")
        log("== query timings ==")
        out["queries"] = time_queries(spark)
    # marker-prefixed so the parent finds it even if something else
    # (ivy, JVM banners) lands on stdout
    print(_MARKER + json.dumps(out), flush=True)


def spawn_level(master: str, cores: int, rep: int, k: int, transcripts: str,
                n_turns: int, warmup_path: str, extras: bool,
                timeout: int) -> dict | None:
    cmd = [
        sys.executable, os.path.abspath(__file__), "--child",
        "--master", master, "--rep", str(rep), "--k", str(k),
        "--transcripts", transcripts, "--n-turns", str(n_turns),
        "--warmup-path", warmup_path,
    ]
    if extras:
        cmd.append("--extras")
    env = dict(os.environ)
    if not env.get("SPARK_GRAFT_DRIVER_MEM"):
        env["SPARK_GRAFT_DRIVER_MEM"] = level_heap(cores)
    try:
        p = subprocess.run(cmd, stdout=subprocess.PIPE, stderr=None,
                           timeout=timeout, cwd=REPO, env=env)
        for line in reversed(p.stdout.decode(errors="replace").splitlines()):
            if line.startswith(_MARKER):
                return json.loads(line[len(_MARKER):])
        log(f"{master}: level subprocess produced no result (rc={p.returncode})")
    except subprocess.TimeoutExpired:
        log(f"{master}: level subprocess timed out after {timeout}s")
    except Exception as e:
        log(f"{master}: level subprocess failed: {type(e).__name__}: {e}")
    return None


# ---------------------------------------------------------------------------
# Parent: orchestrate levels, always print the record.
# ---------------------------------------------------------------------------


def main() -> None:
    sf = sf_of(SF_DIR)
    n_turns = max(20_000, int(TURNS_PER_SF * sf))
    transcripts_path = ensure_transcripts(n_turns)
    warmup_path = ensure_transcripts(max(20_000, n_turns // 5))

    # (master, cores, rep, k, extras, timeout_s). min-of-3 at local[8]:
    # the host's one-sided noise can tank a single run by 2x
    # (BENCH/SCALING.md — steal bursts), and a tanked level corrupts the
    # N->4N efficiency ratio in either direction; other levels stay at
    # k=2 to bound total bench wall time.
    # min-of-3 at the headline local[N] and the efficiency-critical
    # local[8]: the host's steal storms can tank single runs 2-9x
    # (BENCH/SCALING.md), and both the record's `value` and the N->4N
    # ratio deserve the extra ~1-2 min of insurance; local[2]'s ~200 s
    # runs stay at k=2 to bound total bench wall time.
    levels = [
        (f"local[{CPUS}]", CPUS, 2 * CPUS, 3, True, 2400),
        ("local[8]", 8, 16, 3, False, 1800),
        ("local[2]", 2, 4, 2, False, 2400),
    ]
    # when CPUS is 8 (or 2) the headline level doubles as a scaling level;
    # keep the first (extras-carrying) entry only
    seen_cores: set[int] = set()
    levels = [lv for lv in levels
              if lv[1] not in seen_cores and not seen_cores.add(lv[1])]
    results: dict[int, dict] = {}
    failed: list[str] = []
    for master, cores, rep, k, extras, timeout in levels:
        r = spawn_level(master, cores, rep, k, transcripts_path, n_turns,
                        warmup_path, extras, timeout)
        if r is None:
            failed.append(master)
        else:
            results[cores] = r

    def wall(cores: int) -> float | None:
        return results[cores]["wall"] if cores in results else None

    def thr(cores: int) -> float | None:
        w = wall(cores)
        return round(n_turns / w, 1) if w else None

    full = results.get(CPUS, {})
    record = {
        "metric": "e2e_pipeline_turns_per_sec",
        "value": thr(CPUS) or thr(8) or thr(2) or 0.0,
        "unit": "sec",
        "queries": {
            **({"pipeline_e2e": wall(CPUS)} if CPUS in results else {}),
            **full.get("queries", {}),
        },
        "sf": sf,
        "n_turns": n_turns,
        "pipeline_wall_sec_local2": wall(2),
        "pipeline_wall_sec_local8": wall(8),
        f"pipeline_wall_sec_local{CPUS}": wall(CPUS),
        "turns_per_sec_local2": thr(2),
        "turns_per_sec_local8": thr(8),
        f"turns_per_sec_local{CPUS}": thr(CPUS),
        "walls_local2": results.get(2, {}).get("walls"),
        "walls_local8": results.get(8, {}).get("walls"),
        f"walls_local{CPUS}": results.get(CPUS, {}).get("walls"),
        "scaling_efficiency_2_to_8": (
            round((thr(8) / thr(2)) / 4, 3) if thr(2) and thr(8) else None
        ),
        "walls_notext_local2": results.get(2, {}).get("walls_notext"),
        "walls_notext_local8": results.get(8, {}).get("walls_notext"),
        "scaling_efficiency_2_to_8_notext": (
            round(
                (results[2]["wall_notext"] / results[8]["wall_notext"]) / 4, 3
            )
            if results.get(2, {}).get("wall_notext")
            and results.get(8, {}).get("wall_notext") else None
        ),
        f"scaling_efficiency_8_to_{CPUS}": (
            round((thr(CPUS) / thr(8)) / (CPUS / 8), 3)
            if thr(8) and thr(CPUS) else None
        ),
        "sink_write_sec": full.get("write_wall"),
        "cpus": CPUS,
        "self_contained": True,  # all levels from THIS invocation, fresh JVM each
        "levels_failed": failed,
        "memory_model": "executor-scaled: heap = 4*cores GiB (cap 48) — "
                        "one (2-core, 8 GiB) executor per 2 cores, so "
                        "aggregate memory grows with executor count as "
                        "on a real N->4N cluster",
        "heaps": {f"local[{c}]": level_heap(c) for c in (2, 8, CPUS)},
        "config": "fresh subprocess JVM per level, -Xss16m, Kryo, "
                  "salted repartition on conv_id ON, AQE+skewJoin ON, "
                  "broadcast role/tool dims, zstd sinks",
    }
    # persist before stdout so a late crash cannot eat the record
    try:
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "BENCH_last.json"), "w") as f:
            json.dump(record, f, indent=1)
        _append_baseline_md(record)
    except Exception as e:
        log(f"record persistence failed (continuing): {e}")
    print(json.dumps(record), flush=True)


def _append_baseline_md(rec: dict) -> None:
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    header_needed = not os.path.exists(path)
    cpus = rec["cpus"]

    def g(key):
        v = rec.get(key)
        return "-" if v is None else v

    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE — measured numbers\n\n"
                "North-rule two-cluster-size scaling evidence: the identical\n"
                "pipeline job (parse -> enrich -> route -> aggregate, salted\n"
                "repartition + AQE on, per-sink counts + aggregates\n"
                "materialized) at local[2] vs local[8] (the N vs 4N pair) and\n"
                "local[N] (full machine, headline) on the same cached input.\n"
                "Every level runs in a fresh subprocess JVM within ONE bench\n"
                "invocation (self-contained row). Min-of-k timed runs after\n"
                "one untimed 1/5-size warm-up per level; the sandbox microVM\n"
                "shows one-sided multi-second noise, and a long-lived\n"
                "collector never re-pays JIT. 8 -> N efficiency is bounded at\n"
                "sandbox scale by ~10 s of fixed driver/scheduling cost per\n"
                "run that amortizes at the 10^12-turn design scale.\n\n"
                "| n_turns | sf | wall@2 | wall@8 | wall@N | t/s@2 | t/s@8 | t/s@N | N | eff 2->8 | eff 8->N | sink write s |\n"
                "|---|---|---|---|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {rec['n_turns']} | {rec['sf']} | {g('pipeline_wall_sec_local2')} | "
            f"{g('pipeline_wall_sec_local8')} | {g(f'pipeline_wall_sec_local{cpus}')} | "
            f"{g('turns_per_sec_local2')} | {g('turns_per_sec_local8')} | "
            f"{g(f'turns_per_sec_local{cpus}')} | {cpus} | "
            f"{g('scaling_efficiency_2_to_8')} | {g(f'scaling_efficiency_8_to_{cpus}')} | "
            f"{g('sink_write_sec')} |\n"
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--master")
    ap.add_argument("--rep", type=int)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--transcripts")
    ap.add_argument("--n-turns", type=int, default=0)
    ap.add_argument("--warmup-path", default="")
    ap.add_argument("--extras", action="store_true")
    args = ap.parse_args()
    if args.child:
        child_main(args)
    else:
        main()
