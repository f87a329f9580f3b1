"""Environment probes backing BENCH/BASELINE.md's choice of scaling window.

Three independent measurements that characterize this sandbox VM:

1. cache-resident CPU compute scales with process count (the cores are
   real);
2. an Arrow-batched pandas-UDF pass over a wide value range is FLAT from
   8 to 32 cores (the JVM<->Python data path saturates shared resources);
3. a pure-JVM Spark scan-agg scales well 2->8 and poorly 8->32.

Run: python scripts/env_probe.py            (~4 min)
"""
from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def cache_work(n_iter: int) -> float:
    a = np.random.RandomState(1).rand(64, 64)  # 32 KB — L1/L2 resident
    s = 0.0
    for _ in range(n_iter):
        a = np.sqrt(a + 0.5)
        s += a[0, 0]
    return s


def mp_scale(fn, iters: int, label: str) -> None:
    rates = {}
    for procs in (8, 32):
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(fn, [iters] * procs)
        rates[procs] = procs * iters / (time.time() - t0)
    print({
        "probe": label,
        "rate_8": round(rates[8]),
        "rate_32": round(rates[32]),
        "scale_8_to_32": round(rates[32] / rates[8], 2),
    })


def spark_pandas_udf() -> None:
    import pandas as pd
    from bench import build_session
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def work(s: pd.Series) -> pd.Series:
        out = np.sqrt(np.abs(np.sin(s.to_numpy(dtype=np.float64))))
        for _ in range(30):
            out = np.sqrt(out + 1.0)
        return pd.Series(out)

    for cpus in (8, 32):
        spark = build_session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(0, 10**5, numPartitions=cpus).select(
            work(F.col("id").cast("double"))
        ).agg(F.count("*")).collect()
        t0 = time.time()
        spark.range(0, 2 * 10**7, numPartitions=4 * cpus).select(
            F.col("id").cast("double").alias("x")
        ).select(work("x").alias("y")).agg(F.sum("y")).collect()
        print({"probe": "spark_pandas_udf", "cpus": cpus,
               "sec": round(time.time() - t0, 2)})
        spark.stop()


def spark_scan() -> None:
    from bench import build_session
    from pyspark.sql import functions as F

    for cpus in (2, 8, 32):
        spark = build_session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        base = spark.range(0, 10**5, numPartitions=cpus)
        base.select(F.concat(F.col("id").cast("string"), F.lit("|x")).alias("s")) \
            .agg(F.count("s")).collect()
        t0 = time.time()
        spark.range(0, 4 * 10**7, numPartitions=4 * cpus).select(
            F.concat(F.col("id").cast("string"), F.lit("|somepadding")).alias("s")
        ).select(F.length("s").alias("l")).agg(F.sum("l")).collect()
        print({"probe": "spark_scan_agg", "cpus": cpus,
               "sec": round(time.time() - t0, 2)})
        spark.stop()


if __name__ == "__main__":
    mp_scale(cache_work, 1_200_000, "numpy_cache_resident")
    spark_pandas_udf()
    spark_scan()
