"""URL canonicalization column functions (functions/urls.py)."""

from pyspark.sql import functions as F

from dog_data_pipeline_spark.functions.urls import (
    clean_query,
    normalize_url,
    registered_domain,
    url_host,
    url_path,
    url_port,
    url_scheme,
)


def _one(spark, url, expr):
    df = spark.createDataFrame([(url,)], "u STRING")
    return df.select(expr(F.col("u")).alias("x")).collect()[0]["x"]


def test_normalize_url_full_canonicalization(spark):
    got = _one(
        spark,
        "HTTPS://Example.COM:443/Path/Page?utm_source=x&id=5&fbclid=z#frag",
        normalize_url,
    )
    assert got == "https://example.com/Path/Page?id=5"


def test_normalize_url_keeps_nondefault_port_and_param_order(spark):
    got = _one(spark, "http://A.b:8080?b=2&utm_medium=m&a=1", normalize_url)
    assert got == "http://a.b:8080/?b=2&a=1"


def test_normalize_url_http_443_is_not_default(spark):
    got = _one(spark, "http://x.example.com:443/", normalize_url)
    assert got == "http://x.example.com:443/"


def test_normalize_url_tracking_only_query_drops_question_mark(spark):
    got = _one(spark, "https://a.com/p?utm_source=1&gclid=2", normalize_url)
    assert got == "https://a.com/p"


def test_normalize_url_unparseable_is_null(spark):
    assert _one(spark, "not a url", normalize_url) is None
    assert _one(spark, "", normalize_url) is None


def test_url_parts(spark):
    u = "HTTP://Host.Example.org:8080/a/b?x=1#f"
    assert _one(spark, u, url_scheme) == "http"
    assert _one(spark, u, url_host) == "host.example.org"
    assert _one(spark, u, url_port) == 8080
    assert _one(spark, u, url_path) == "/a/b"
    assert _one(spark, u, clean_query) == "x=1"


def test_registered_domain_psl_rules(spark):
    cases = {
        "www.example.co.uk": "example.co.uk",
        "deep.sub.example.com": "example.com",
        "example.com": "example.com",
        "a.github.io": "a.github.io",
        "sub.a.github.io": "a.github.io",
        "x.blogspot.com": "x.blogspot.com",
        "bucket.s3.amazonaws.com": "bucket.s3.amazonaws.com",
        "deep.bucket.s3.amazonaws.com": "bucket.s3.amazonaws.com",
        "192.168.0.1": "192.168.0.1",
        "localhost": "localhost",
    }
    df = spark.createDataFrame([(h,) for h in cases], "h STRING")
    got = {
        r["h"]: r["d"]
        for r in df.select(
            "h", registered_domain(F.col("h")).alias("d")
        ).collect()
    }
    assert got == cases
