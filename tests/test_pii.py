"""PII redaction edge shapes: the phone pattern must redact long digit
runs IN FULL (a bounded repeat leaked the tail of a 16-digit PAN) and
survive spaced separators, while version strings stay untouched."""
from pyspark.sql import functions as F

from postal_address_spark.operators.text_analysis import redact_pii


def _redact(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    rows = df.select("i", redact_pii(F.col("t")).alias("r")).collect()
    return [r["r"] for r in sorted(rows, key=lambda r: r["i"])]


def test_long_digit_runs_redact_in_full(spark):
    out = _redact(spark, [
        "card 4111 1111 1111 1111 on file",   # 16-digit PAN
        "ref 12345678901234567890 thanks",    # 20 digits, no separators
    ])
    assert out[0] == "card <PHONE> on file"      # no trailing digit leaks
    assert out[1] == "ref <PHONE> thanks"


def test_spaced_separators_redact_whole_number(spark):
    out = _redact(spark, ["call 020 - 7946 0958 now", "+1 (555) 010-4477"])
    assert out[0] == "call <PHONE> now"           # ' - ' = 3 separator chars
    assert out[1] == "<PHONE>"


def test_version_strings_and_short_runs_survive(spark):
    out = _redact(spark, [
        "release 1.2.3 build 47 is out",   # 5 digits: under the 7-digit floor
        "see sections 1, 2 and 3",
    ])
    assert out == [
        "release 1.2.3 build 47 is out", "see sections 1, 2 and 3",
    ]


def test_ipv4_octets_bounded(spark):
    out = _redact(spark, ["host 10.0.3.7 up", "bogus 999.999.999.999 down"])
    assert out[0] == "host <IP> up"
    # 999.999.999.999 is not an address; its 12 digits with '.' separators
    # do fall through to the phone pattern — over-redaction by design
    # (redaction errs toward covering digit runs, never toward leaking).
    assert "999" not in out[1]
