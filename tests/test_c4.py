"""C4 line-level cleaning: exact line-keep semantics, phrase filters,
and the map-side/no-Python plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmap_spark.functions.text import c4_clean
from cosmap_spark.tables import load_table


def _clean(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select("id", c4_clean(F.col("text")).alias("c")).collect()
    return {r["id"]: r["c"] for r in rows}


def test_line_rules_exact(spark):
    text = "\n".join(
        [
            "This is a proper sentence with enough words.",  # keep
            "Too short.",                                     # < 4 words
            "No terminal punctuation here at all",            # bad ending
            "Would be fine but mentions the cookie policy.",  # phrase
            'A quoted line can end with a quote."',           # keep
            "",                                               # empty
            "Enable JavaScript to view this content please.", # phrase (ci)
        ]
    )
    c = _clean(spark, [text])[0]
    assert c["clean_text"].split("\n") == [
        "This is a proper sentence with enough words.",
        'A quoted line can end with a quote."',
    ]
    assert c["n_lines"] == 6  # empty line not counted
    assert c["n_kept"] == 2
    assert c["has_brace"] is False


def test_brace_flag_and_empty_doc(spark):
    c = _clean(spark, ["function f() { return 1; } and more words here.", ""])
    assert c[0]["has_brace"] is True
    assert c[1]["clean_text"] == "" and c[1]["n_lines"] == 0 and c[1]["n_kept"] == 0


def test_phrase_filter_spans_whitespace(spark):
    # "lorem   ipsum" with irregular spacing still filtered
    text = "This line talks about lorem   ipsum filler text today."
    c = _clean(spark, [text])[0]
    assert c["n_kept"] == 0


def test_corpus_run_is_mapside(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = docs.select("doc_id", c4_clean(F.col("text")).alias("c"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    rows = out.collect()
    assert len(rows) == docs.count()
    # kept lines never exceed non-empty lines
    assert all(r["c"]["n_kept"] <= r["c"]["n_lines"] for r in rows)
