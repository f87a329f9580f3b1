"""Local replica of the driver's correctness gate: run every queries()
entry on Spark at sf0.01, run the matching oracle_sql() in DuckDB over the
same parquet, compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""
from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

# data-dependent mirrored oracles (ivf_ann_topk's trained quantizer)
# derive their literals from the gate's sf dir
import os  # noqa: E402

os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.9g}"
    return str(value)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(canon(r[i]) for i in order) for r in rows
    )


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    import time

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"[FAIL-spark] {name}: {str(exc)[:300]}", flush=True)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(
                f"[rows-only] {name}: {len(srows)} rows ({t_spark:.1f}s)",
                flush=True,
            )
            if len(srows) == 0:
                failures.append((name, "0 rows"))
            continue
        t1 = time.time()
        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"[FAIL-duckdb] {name}: {str(exc)[:300]}", flush=True)
            continue
        t_duck = time.time() - t1
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        elif len(srows) != len(drows):
            problems.append(f"rows {len(srows)} != {len(drows)}")
        else:
            a = rowset(scols, srows)
            b = rowset(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)[:400]}", flush=True)
        else:
            print(
                f"[ok]   {name}: {len(srows)} rows match "
                f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)",
                flush=True,
            )

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
