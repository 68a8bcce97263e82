"""PII scrubbing and multimodal decode plumbing unit tests."""

import hashlib

import pytest
from pyspark.sql import functions as F

from panelsplit_spark.operators.text import pii_scrub


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (0, "mail me at jane.doe+x@sub.example.co.uk today"),
        (1, "server 192.168.0.1 and 10.0.0.255 are up"),
        (2, "call +44 020-7946 or +1 555-0100 now"),
        (3, "ssn 123-45-6789 on file"),
        (4, "no pii here at all"),
        (5, "a@b.io 1.2.3.4 999-88-7777 +1 222-3333"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_pii_scrub_categories(pii_df):
    got = {r.id: r for r in pii_scrub(pii_df).collect()}
    assert got[0].n_email == 1 and "<EMAIL>" in got[0].clean_text
    assert "jane" not in got[0].clean_text
    assert got[1].n_ipv4 == 2
    assert got[1].clean_text == "server <IP> and <IP> are up"
    assert got[2].n_phone == 2
    assert got[3].n_ssn == 1 and got[3].clean_text == "ssn <ID> on file"
    assert got[4].clean_text == "no pii here at all"
    assert (
        got[4].n_email == got[4].n_ssn == got[4].n_phone == got[4].n_ipv4 == 0
    )
    r5 = got[5]
    assert (r5.n_email, r5.n_ssn, r5.n_phone, r5.n_ipv4) == (1, 1, 1, 1)
    assert r5.clean_text == "<EMAIL> <IP> <ID> <PHONE>"


def test_pii_scrub_no_double_count(spark):
    # The SSN-shaped id inside an email local part is scrubbed as part
    # of the email (email runs first) and must NOT also count as an SSN.
    df = spark.createDataFrame(
        [(0, "x 123-45-6789@example.org y")], "id long, text string"
    )
    r = pii_scrub(df).collect()[0]
    assert r.n_email == 1 and r.n_ssn == 0
    assert r.clean_text == "x <EMAIL> y"


def test_decode_media_roundtrip(spark):
    from panelsplit_spark.operators import multimodal

    df = spark.createDataFrame(
        [(i, f"payload-{i}".encode()) for i in range(10)],
        "id long, content binary",
    )
    out = multimodal.decode_media(
        df, decoder=lambda b: hashlib.md5(b).digest()
    )
    rows = out.orderBy("id").collect()
    for r in rows:
        assert bytes(r.decoded) == hashlib.md5(bytes(r.content)).digest()
    # plan stays Arrow-batched (MapInPandas), not row-at-a-time Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_quality_buckets_partition_invariant(spark):
    # bucket assignment must not depend on physical partitioning
    from panelsplit_spark.queries_llm import q_pipe_quality_buckets

    a = q_pipe_quality_buckets(spark, "/root/testdata/sf0.001").collect()
    assert [r.bucket for r in a] == [1, 2, 3, 4]
    assert sum(r.n_kept for r in a) <= sum(r.n_docs for r in a)
