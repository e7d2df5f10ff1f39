"""Per-round benchmark (driver contract).

Prints ONE JSON line to stdout:
  {"metric": "e2e_pipeline_turns_per_sec", "value": <turns/sec at full
   parallelism>, "unit": "sec", "queries": {<name>: seconds, ...},
   "sf": <sf>, ...extra evidence keys...}

Also measures the north rule's two-cluster-size scaling criterion in the
sandbox stand-in form: the identical pipeline job at local[8] and
local[N] (N = SPARK_GRAFT_CPUS, default 32) on the same input;
efficiency = (thr_N / thr_8) / (N / 8). Results are appended to
BENCH/BASELINE.md.

Input: transcripts synthesized deterministically (fixtures.py, seed=42)
at a row count proportional to the sf of $SPARK_GRAFT_SF_DIR
(sf0.1 -> 200k turns), cached as parquet under .bench_cache/.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TURNS_PER_SF = 2_000_000  # sf0.1 -> 200k turns


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.1


def ensure_transcripts(sf: float) -> tuple[str, int]:
    from sqlite_otel_spark.fixtures import write_transcripts_parquet

    n = max(2_000, int(TURNS_PER_SF * sf))
    cache = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"transcripts_n{n}.parquet")
    if not os.path.exists(path):
        log(f"generating {n} fixture turns -> {path}")
        write_transcripts_parquet(path, n, seed=42)
    return path, n


def new_session(master: str):
    from pyspark.sql import SparkSession

    from sqlite_otel_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(app_name=f"bench-{master}", master=master,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def time_pipeline(spark, transcripts_path: str, n_turns: int) -> float:
    """End-to-end parse -> enrich -> route -> aggregate + sink writes."""
    from sqlite_otel_spark.config import PipelineConfig
    from sqlite_otel_spark.plans.pipeline import run_pipeline, write_sinks

    df = spark.read.parquet(transcripts_path)
    df.limit(10).count()  # warm the session/JVM paths outside the timer
    out = tempfile.mkdtemp(prefix="bench_sinks_")
    t0 = time.monotonic()
    result = run_pipeline(spark, df, PipelineConfig())
    write_sinks(result, out)
    result.accounting.collect()
    result.by_signal_tool.collect()
    result.by_time_bucket.collect()
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
        "dp_simhash_neardup", "dp_ann_brute_topk", "dp_ann_lsh_topk",
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

    log(f"== scaling run: local[8] vs local[{CPUS}] on {n_turns} turns ==")
    spark8 = new_session("local[8]")
    wall8 = time_pipeline(spark8, transcripts_path, n_turns)
    spark8.stop()
    thr8 = n_turns / wall8
    log(f"local[8]: {wall8:.2f}s  ({thr8:,.0f} turns/s)")

    sparkN = new_session(f"local[{CPUS}]")
    wallN = time_pipeline(sparkN, transcripts_path, n_turns)
    thrN = n_turns / wallN
    log(f"local[{CPUS}]: {wallN:.2f}s  ({thrN:,.0f} turns/s)")
    efficiency = (thrN / thr8) / (CPUS / 8)

    log("== query timings ==")
    queries = {"pipeline_e2e": round(wallN, 3), **time_queries(sparkN)}
    sparkN.stop()

    record = {
        "metric": "e2e_pipeline_turns_per_sec",
        "value": round(thrN, 1),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_turns": n_turns,
        "pipeline_wall_sec_local8": round(wall8, 3),
        f"pipeline_wall_sec_local{CPUS}": round(wallN, 3),
        "turns_per_sec_local8": round(thr8, 1),
        f"turns_per_sec_local{CPUS}": round(thrN, 1),
        "scaling_efficiency_8_to_N": round(efficiency, 3),
        "cpus": CPUS,
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
                "Two-cluster-size scaling evidence (north rule): the identical\n"
                "pipeline job at local[8] and local[N] on the same cached input\n"
                "(sandbox stand-in for N vs 4N executors).\n\n"
                "| n_turns | sf | wall@8 (s) | wall@N (s) | turns/s@8 | turns/s@N | N | efficiency |\n"
                "|---|---|---|---|---|---|---|---|\n"
            )
        cpus = rec["cpus"]
        wall_n = rec[f"pipeline_wall_sec_local{cpus}"]
        thr_n = rec[f"turns_per_sec_local{cpus}"]
        f.write(
            f"| {rec['n_turns']} | {rec['sf']} | {rec['pipeline_wall_sec_local8']} | "
            f"{wall_n} | {rec['turns_per_sec_local8']} | {thr_n} | {cpus} | "
            f"{rec['scaling_efficiency_8_to_N']} |\n"
        )


if __name__ == "__main__":
    main()
