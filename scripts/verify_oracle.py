"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, compare row count + schema (column names) + order-insensitive
value hash. Usage:

    python scripts/verify_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, columns) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = sorted(
        "|".join(_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(canon).encode()).hexdigest()


def _cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entry_mod
    from sqlite_otel_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # Surface the exact registry order vs the external driver's
    # 50-entry window (ADVICE r4): entries 51+ are verified ONLY by
    # this script + pytest, so the excluded list must be deterministic
    # and visible in the round record.
    names = list(qs)
    if not name_filter and len(names) > 50:
        print(f"registry: {len(names)} entries; driver window = first 50;"
              " excluded (verified here):")
        for i, n in enumerate(names[50:], start=51):
            print(f"  {i}. {n}")
    failures = []
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            problems.append(f"schema {scols} != {dcols}")
        if not problems and value_hash(srows, scols) != value_hash(drows, dcols):
            problems.append("value hash mismatch")
            for a, b in list(zip(sorted(map(repr, srows)), sorted(map(repr, drows))))[:50]:
                if a != b:
                    problems.append(f"  spark={a[:160]}")
                    problems.append(f"  duck ={b[:160]}")
                    break
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: " + "\n".join(problems))
        else:
            print(f"ok    {name}: {len(srows)} rows match")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
