"""Python UDTF (lateral table function) surface: correctness against a
JVM-expression twin, lateral-join usage, and SQL registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmap_spark.queries.udfs import sentence_udtf

DOCS = [
    (1, "First sentence. Second one! Third? Trailing words"),
    (2, "One liner."),
    (3, ""),
    (4, None),
    (5, "A.  B.   C."),  # multi-space separators
]


def _expected():
    import re

    out = []
    for doc_id, text in DOCS:
        if not text:
            continue
        parts = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text) if s.strip()]
        for i, s in enumerate(parts):
            out.append((doc_id, i, s, len(s)))
    return sorted(out)


def test_udtf_lateral_join(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    SplitSentences = sentence_udtf()
    got = sorted(
        (r["doc_id"], r["sentence_id"], r["sentence"], r["n_chars"])
        for r in df.lateralJoin(
            SplitSentences(F.col("text").outer())
        ).select("doc_id", "sentence_id", "sentence", "n_chars").collect()
    )
    assert got == _expected()


def test_udtf_sql_registration(spark):
    spark.udtf.register("split_sentences", sentence_udtf())
    rows = spark.sql(
        "SELECT * FROM split_sentences('Hello there. Bye!')"
    ).collect()
    assert [(r["sentence_id"], r["sentence"]) for r in rows] == [
        (0, "Hello there."),
        (1, "Bye!"),
    ]
