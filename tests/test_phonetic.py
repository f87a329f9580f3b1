"""Phonetic blocking: the from-scratch SQL soundex must agree with
Spark's builtin on every probe and fuzz token, and the phonetic key must
abstain (NULL) rather than invent junk buckets."""
import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from __spark_entry__ import _sql_soundex
from postal_address_spark.operators.blocking import with_phonetic_block_key

# Hand-picked probes covering every rule branch: H/W transparency
# (Ashcraft), H/W first letter (WHB/HWB), first-letter code collapse
# (Pfister), vowel breaks (Tymczak/BAB), all-silent tails (Lee/HW/AEIOU),
# single letters, repeated codes (QQQ), classic census examples.
PROBES = [
    "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
    "Honeyman", "paris", "WHB", "HWB", "BHB", "BWB", "BAB", "AHA", "AWA",
    "QQQ", "BCDL", "SCHMIDT", "Lloyd", "Gutierrez", "Jackson", "VanDeusen",
    "Washington", "Lee", "Euler", "Gauss", "Hilbert", "Knuth", "Ellery",
    "Ghosh", "Czarkowska", "Tchebysheff", "a", "H", "W", "HW", "AEIOU",
    "BFPV", "Taitung", "Zhongshan", "Berlin", "Tamuning",
]


def _fuzz_tokens(n=400, seed=2026):
    rng = random.Random(seed)
    return [
        "".join(rng.choice(string.ascii_letters) for _ in range(rng.randint(1, 12)))
        for _ in range(n)
    ]


def test_sql_soundex_matches_spark_builtin(spark):
    tokens = PROBES + _fuzz_tokens()
    sdf = spark.createDataFrame([(t,) for t in tokens], "t string")
    spark_out = {
        r.t: r.sx for r in sdf.select("t", F.soundex("t").alias("sx")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE toks(t VARCHAR)")
    con.executemany("INSERT INTO toks VALUES (?)", [(t,) for t in tokens])
    duck_out = dict(
        con.execute(f"SELECT t, {_sql_soundex('t')} FROM toks").fetchall()
    )
    diffs = {
        t: (spark_out[t], duck_out[t])
        for t in tokens
        if spark_out[t] != duck_out[t]
    }
    assert not diffs, f"soundex mismatches: {dict(list(diffs.items())[:10])}"


def test_phonetic_key_abstains_on_missing_parts(spark):
    rows = [
        ("US", "Paris", "US|P620"),
        ("US", "  Paris  City", "US|P620"),  # first alpha run only
        ("FR", "Élysées", "FR|L200"),  # first ASCII run is 'lys'
        ("DE", None, None),  # no city
        (None, "Berlin", None),  # no country
        ("TW", "Taitung City", "TW|T352"),
        ("US", "12345", None),  # numeric city: no token
    ]
    df = spark.createDataFrame(
        [(c, n) for c, n, _ in rows], "top_country string, city_name string"
    )
    got = [r.phonetic_key for r in with_phonetic_block_key(df).collect()]
    assert got == [w for _, _, w in rows]


@pytest.mark.parametrize("city,expect", [("Paris", "P620"), ("Tamuning", "T555")])
def test_known_soundex_values(spark, city, expect):
    df = spark.createDataFrame([(city,)], "c string")
    assert df.select(F.soundex("c").alias("s")).collect()[0].s == expect
