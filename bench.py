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

Methodology notes (also appended to BENCH/BASELINE.md):
 - The timed section is the BASELINE.json metric — end-to-end
   parse -> enrich -> route -> aggregate: pipeline DAG + materializing
   all seven per-sink counts (the count-equality surface) + the three
   accounting/rollup aggregates. The parquet sink-write wall is
   measured once at full parallelism and reported separately
   (sink_write_sec).
 - One untimed warm-up run precedes measurement (JVM JIT + codegen +
   Python worker forks are one-time process costs a long-lived
   collector never re-pays); timed runs take min-of-k because the
   sandbox microVM shows one-sided multi-second noise.
 - The 2 -> 8 pair is the compute-bound demonstration; 8 -> 32 is also
   reported but at sf0.1 it is bounded by the ~10 s fixed driver/
   scheduling cost per run, which amortizes at the 10^12-turn design
   scale (ratio fixed/compute falls ~10^6x).

Input: transcripts synthesized deterministically (fixtures.py, seed=42)
at a row count proportional to the sf of $SPARK_GRAFT_SF_DIR
(sf0.1 -> 3M turns), cached as parquet under .bench_cache/.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Bench JVMs get a large pre-touched heap (see session.py rationale);
# must be set before the first SparkSession launches.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
TURNS_PER_SF = 30_000_000  # sf0.1 -> 3M turns


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.1


def ensure_transcripts(sf: float) -> tuple[str, int]:
    from sqlite_otel_spark.fixtures import write_transcripts_parquet

    n = max(20_000, int(TURNS_PER_SF * sf))
    cache = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"transcripts_n{n}.parquet")
    if not os.path.exists(path):
        log(f"generating {n} fixture turns -> {path}")
        write_transcripts_parquet(path, n, seed=42)
    return path, n


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


def timed_pipeline(spark, transcripts_path: str, rep: int) -> float:
    """The metric's timed section: parse -> enrich -> route -> aggregate,
    materializing per-sink counts + the three aggregates (concurrent
    driver submission — independent sub-DAGs over the shared cache)."""
    from sqlite_otel_spark.config import PipelineConfig
    from sqlite_otel_spark.plans.pipeline import collect_aggregates, run_pipeline

    from sqlite_otel_spark.operators.aggregates import sink_counts

    df = spark.read.parquet(transcripts_path)
    t0 = time.monotonic()
    result = run_pipeline(spark, df, PipelineConfig(), repartition_to=rep,
                          do_salt=True)
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
        n = fn(spark, SF_DIR).count()
        out[name] = round(time.monotonic() - t0, 3)
        log(f"  {name}: {out[name]}s ({n} rows)")
    return out


def main() -> None:
    sf = sf_of(SF_DIR)
    transcripts_path, n_turns = ensure_transcripts(sf)

    def level(master, cores, rep, k, warmup=False):
        spark = new_session(master, rep)
        if warmup:
            log(f"== warm-up (untimed) at {master} ==")
            timed_pipeline(spark, transcripts_path, rep)
        walls = []
        for i in range(k):
            w = timed_pipeline(spark, transcripts_path, rep)
            walls.append(w)
            log(f"{master} run{i}: {w:.2f}s ({n_turns/w:,.0f} turns/s)")
        return spark, min(walls)

    sparkN, wallN = level(f"local[{CPUS}]", CPUS, 2 * CPUS, k=2, warmup=True)
    log("== sink write wall (full parallelism) ==")
    write_wall = timed_writes(sparkN, transcripts_path, 2 * CPUS)
    log(f"sink writes: {write_wall:.2f}s")
    log("== query timings ==")
    queries = {"pipeline_e2e": round(wallN, 3), **time_queries(sparkN)}

    # min-of-3 at local[8]: the host's one-sided noise can tank a single
    # run by 2x (BENCH/SCALING.md — steal bursts), and a tanked level
    # corrupts the N->4N efficiency ratio in either direction; the other
    # levels stay at k=2 to bound total bench wall time
    _, wall8 = level("local[8]", 8, 16, k=3)
    _, wall2 = level("local[2]", 2, 4, k=2)

    thr2, thr8, thrN = (n_turns / w for w in (wall2, wall8, wallN))
    eff_2_8 = (thr8 / thr2) / 4
    eff_8_N = (thrN / thr8) / (CPUS / 8)

    record = {
        "metric": "e2e_pipeline_turns_per_sec",
        "value": round(thrN, 1),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_turns": n_turns,
        "pipeline_wall_sec_local2": round(wall2, 3),
        "pipeline_wall_sec_local8": round(wall8, 3),
        f"pipeline_wall_sec_local{CPUS}": round(wallN, 3),
        "turns_per_sec_local2": round(thr2, 1),
        "turns_per_sec_local8": round(thr8, 1),
        f"turns_per_sec_local{CPUS}": round(thrN, 1),
        "scaling_efficiency_2_to_8": round(eff_2_8, 3),
        f"scaling_efficiency_8_to_{CPUS}": round(eff_8_N, 3),
        "sink_write_sec": round(write_wall, 3),
        "cpus": CPUS,
        "config": "salted repartition on conv_id ON, AQE+skewJoin ON, "
                  "broadcast role/tool dims, zstd sinks",
    }
    _append_baseline_md(record)
    print(json.dumps(record))


def _append_baseline_md(rec: dict) -> None:
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE — measured numbers\n\n"
                "North-rule two-cluster-size scaling evidence: the identical\n"
                "pipeline job (parse -> enrich -> route -> aggregate, salted\n"
                "repartition + AQE on, per-sink counts + aggregates\n"
                "materialized) at local[2] vs local[8] (the N vs 4N pair) and\n"
                "local[N] (full machine, headline) on the same cached input.\n"
                "Min-of-k timed runs after one untimed JVM warm-up; the\n"
                "sandbox microVM shows one-sided multi-second noise, and a\n"
                "long-lived collector never re-pays JIT. 8 -> N efficiency is\n"
                "bounded at sandbox scale by ~10 s of fixed driver/scheduling\n"
                "cost per run that amortizes at the 10^12-turn design scale.\n\n"
                "| n_turns | sf | wall@2 | wall@8 | wall@N | t/s@2 | t/s@8 | t/s@N | N | eff 2->8 | eff 8->N | sink write s |\n"
                "|---|---|---|---|---|---|---|---|---|---|---|---|\n"
            )
        cpus = rec["cpus"]
        f.write(
            f"| {rec['n_turns']} | {rec['sf']} | {rec['pipeline_wall_sec_local2']} | "
            f"{rec['pipeline_wall_sec_local8']} | {rec[f'pipeline_wall_sec_local{cpus}']} | "
            f"{rec['turns_per_sec_local2']} | {rec['turns_per_sec_local8']} | "
            f"{rec[f'turns_per_sec_local{cpus}']} | {cpus} | "
            f"{rec['scaling_efficiency_2_to_8']} | {rec[f'scaling_efficiency_8_to_{cpus}']} | "
            f"{rec['sink_write_sec']} |\n"
        )


if __name__ == "__main__":
    main()
