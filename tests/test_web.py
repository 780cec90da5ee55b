"""URL canonicalization & features (functions/web.py): tracker
stripping, param sorting, case/slash normalization, ill-formed
fallback, registered-domain approximation, and the URL-dedup recipe."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmap_spark.functions.web import canonical_url, url_features


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c"))
        .collect()
    ]


def test_canonical_url_normalizes(spark):
    got = _canon(spark, [
        "HTTP://Example.COM/a/b/?utm_source=x&b=2&a=1#frag",
        "http://example.com/a/b?a=1&b=2",
        "https://example.com/",
        "https://example.com",
        "http://example.com/x?fbclid=abc&gclid=def",
        "http://example.com/x",
    ])
    assert got[0] == got[1] == "http://example.com/a/b?a=1&b=2"
    assert got[2] == got[3] == "https://example.com"
    assert got[4] == got[5] == "http://example.com/x"


def test_canonical_url_keeps_scheme_distinction_and_meaningful_params(spark):
    a, b, c = _canon(spark, [
        "http://example.com/p?id=7",
        "https://example.com/p?id=7",
        "https://example.com/p?id=8",
    ])
    assert a != b and b != c


def test_canonical_url_illformed_falls_back_to_raw(spark):
    got = _canon(spark, ["not a url at all  ", "also-not-a-url"])
    assert got == ["not a url at all", "also-not-a-url"]
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(canonical_url(F.col("url")).alias("c")).collect()[0][
        "c"
    ] is None


def test_url_features(spark):
    df = spark.createDataFrame(
        [
            ("https://news.bbc.co.uk/world/europe?id=1&x=2",),
            ("http://example.com/",),
            ("https://sub.deep.example.org/a/b/c",),
        ],
        "url string",
    )
    rows = df.select(url_features(F.col("url")).alias("f")).collect()
    f0, f1, f2 = (r["f"] for r in rows)
    assert f0["host"] == "news.bbc.co.uk"
    assert f0["registered_domain"] == "bbc.co.uk"
    assert f0["path_depth"] == 2 and f0["n_params"] == 2 and f0["is_secure"]
    assert f1["registered_domain"] == "example.com"
    assert f1["path_depth"] == 0 and not f1["is_secure"]
    assert f2["registered_domain"] == "example.org"
    assert f2["path_depth"] == 3


def test_url_dedup_recipe(spark):
    """The URL-level dedup pass: exact_dedup keyed on canonical_url
    keeps one row per canonical URL deterministically."""
    from cosmap_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [
            (1, "http://A.com/x?utm_source=t"),
            (2, "http://a.com/x"),
            (3, "http://a.com/y"),
        ],
        "doc_id long, url string",
    )
    keyed = df.withColumn("curl", canonical_url(F.col("url")))
    kept = exact_dedup(keyed, text_col="curl", id_col="doc_id")
    got = sorted(
        (r["canonical_id"], r["n_copies"]) for r in kept.collect()
    )
    assert got == [(1, 2), (3, 1)]


def test_canonical_url_ports(spark):
    """parse_url drops ports; the canonical form must keep NON-default
    ports (different origins) while stripping scheme defaults."""
    got = _canon(spark, [
        "http://example.com:8080/a",
        "http://example.com/a",
        "http://example.com:80/a",
        "https://example.com:443/b",
        "https://example.com:8443/b",
    ])
    assert got[0] == "http://example.com:8080/a"
    assert got[1] == got[2] == "http://example.com/a"
    assert got[3] == "https://example.com/b"
    assert got[4] == "https://example.com:8443/b"


def test_canonical_url_leading_zero_ports(spark):
    got = _canon(spark, [
        "http://example.com:080/a",
        "http://example.com:80/a",
        "http://example.com:08080/a",
        "http://example.com:8080/a",
    ])
    assert got[0] == got[1] == "http://example.com/a"
    assert got[2] == got[3] == "http://example.com:8080/a"
