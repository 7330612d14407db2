"""xxhash64 parity: pure-Python implementation vs Spark's F.xxhash64.

This parity is load-bearing: the reference simulator computes frontier keys
without a JVM, and crawl-order/seen-set parity checks compare those keys
against Spark-computed ones.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from biz_crawlers_spark.hashing import spark_xxhash64

SAMPLES = [
    "",
    "a",
    "abc",
    "12345678",
    "https://fixture.test/report?subPath=11403&fileName=11403A1.pdf",
    "統一編號 12345678 經濟部商業司",  # CJK / multi-byte UTF-8
    "x" * 31,
    "y" * 32,  # stripe-loop boundary
    "z" * 33,
    "w" * 100,
    "q" * 1000,
]


def test_matches_spark_xxhash64(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in SAMPLES:
        assert got[s] == spark_xxhash64(s), f"mismatch for {s!r}"


def test_matches_spark_xxhash64_binary(spark):
    payloads = [b"", b"\x00\x01\x02", bytes(range(256)), b"\xff" * 40]
    df = spark.createDataFrame([(p,) for p in payloads], "b: binary")
    got = [r["h"] for r in df.select(F.xxhash64("b").alias("h")).collect()]
    assert got == [spark_xxhash64(p) for p in payloads]


@given(st.text(alphabet=string.printable, max_size=200))
@settings(max_examples=200, deadline=None)
def test_signed_range(s):
    h = spark_xxhash64(s)
    assert -(2**63) <= h < 2**63


def test_random_lengths_vs_spark(spark):
    # cover every tail-length class 0..40 around the 32-byte stripe boundary
    samples = ["v" * n for n in range(0, 41)]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = [r["h"] for r in df.select(F.xxhash64("s").alias("h")).orderBy(F.length("s")).collect()]
    assert got == [spark_xxhash64(s) for s in samples]
