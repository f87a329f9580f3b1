"""Local replica of the driver's correctness gate: run every queries()
entry on Spark at sf0.01, run the matching oracle_sql() in DuckDB over the
same parquet, compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` writes a driver-artifact-shaped per-query result file (the
CORRECTNESS_r*.json schema plus per-query Spark/DuckDB seconds) — the
committed full-registry evidence the 50-query driver window can't carry
(VERDICT r4 next-round #1).
"""
from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

_argv = sys.argv[1:]
JSON_OUT = None
if _argv and _argv[0] == "--json":
    JSON_OUT = _argv[1]
    _argv = _argv[2:]
SF = _argv[0] if _argv else "/root/testdata/sf0.01"
ONLY = set(_argv[1:])

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
    records = {}
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
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None, "oracle_rows": None,
                "err": f"spark: {str(exc)[:200]}",
            }
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(
                f"[rows-only] {name}: {len(srows)} rows ({t_spark:.1f}s)",
                flush=True,
            )
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": "no_oracle", "spark_sec": round(t_spark, 2),
            }
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
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None, "err": f"duckdb: {str(exc)[:200]}",
            }
            continue
        t_duck = time.time() - t1
        problems = []
        schema_ok = sorted(scols) == sorted(dcols)
        rows_ok = len(srows) == len(drows)
        hash_ok = False
        if not schema_ok:
            problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        elif not rows_ok:
            problems.append(f"rows {len(srows)} != {len(drows)}")
        else:
            a = rowset(scols, srows)
            b = rowset(dcols, drows)
            hash_ok = a == b
            if not hash_ok:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        records[name] = {
            "rows_match": rows_ok, "schema_match": schema_ok,
            "hash_match": hash_ok, "spark_rows": len(srows),
            "oracle_rows": len(drows), "err": None,
            "spark_sec": round(t_spark, 2), "duckdb_sec": round(t_duck, 2),
        }
        if problems:
            failures.append((name, "; ".join(problems)))
            records[name]["err"] = "; ".join(problems)[:200]
            print(f"[FAIL] {name}: {'; '.join(problems)[:400]}", flush=True)
        else:
            print(
                f"[ok]   {name}: {len(srows)} rows match "
                f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)",
                flush=True,
            )

    if JSON_OUT:
        import json

        with open(JSON_OUT, "w", encoding="utf-8") as fh:
            json.dump(records, fh, indent=2)
        print(f"\nwrote {JSON_OUT} ({len(records)} queries)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
