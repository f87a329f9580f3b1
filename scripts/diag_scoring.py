"""One-off diagnostic: where does pair-scoring wall time go?"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd

from bench import build_session
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_SALT = int(sys.argv[2]) if len(sys.argv) > 2 else 8

spark = build_session(CPUS)
spark.sparkContext.setLogLevel("ERROR")
from postal_address_spark.operators.blocking import with_block_key
from postal_address_spark.operators.extract import extract_mentions
from postal_address_spark.operators.normalize_op import normalize_mentions
from postal_address_spark.operators.pairs import candidate_pairs
from postal_address_spark.operators.scoring import make_pair_score_udf
from postal_address_spark.synth import synth_transcripts_spark

t = synth_transcripts_spark(spark, 42, 30000, 7500).persist()
t.count()
b = with_block_key(normalize_mentions(extract_mentions(t))).persist()
b.count()
t0 = time.time()
p = candidate_pairs(b, hot_threshold=5000, n_salt=N_SALT).persist()
print(f"pairs {p.count()} generated+persisted in {time.time()-t0:.1f}s", flush=True)

udf = make_pair_score_udf(0.82)
t0 = time.time()
n = (
    p.withColumn(
        "score",
        udf("line1_a", "line1_b", "city_name_a", "city_name_b",
            "postal_code_a", "postal_code_b"),
    )
    .where(F.col("score") >= 0.82)
    .count()
)
print(f"scored persisted pairs in {time.time()-t0:.1f}s -> {n} edges", flush=True)


@pandas_udf(LongType())
def need_count(l1a: pd.Series, l1b: pd.Series, pa: pd.Series, pb: pd.Series) -> pd.Series:
    na = l1a.str.extract(r"^(\d+)", expand=False)
    nb = l1b.str.extract(r"^(\d+)", expand=False)
    hn = ((na == nb) & na.notna()) | (na.isna() & nb.isna())
    post = (pa == pb) & pa.notna()
    need = (0.25 * post.astype(float) + 0.25 * hn.astype(float) + 0.5) >= 0.82
    neq = need & (l1a != l1b)
    return pd.Series(np.where(neq, 1, 0))


t0 = time.time()
cnt = p.withColumn(
    "c", need_count("line1_a", "line1_b", "postal_code_a", "postal_code_b")
).agg(F.sum("c")).collect()[0][0]
print(f"full-kernel pairs: {cnt} (cheap pass in {time.time()-t0:.1f}s)", flush=True)
spark.stop()
