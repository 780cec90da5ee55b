"""Gopher quality-rule battery: exact component values on constructed
documents, each rule's reject direction, and a corpus-level smoke run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmap_spark.functions.text import gopher_rules
from cosmap_spark.tables import load_table

GOOD = (
    "the quick brown fox jumps over that lazy dog and runs away with "
    "great speed to have some fun in fields of golden wheat today " * 5
)  # ~115 words, all alpha, has stopwords


def _eval(spark, texts: list[str]):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = df.select("id", gopher_rules(F.col("text")).alias("g")).collect()
    return {r["id"]: r["g"] for r in rows}


def test_good_document_passes(spark):
    g = _eval(spark, [GOOD])[0]
    assert g["passes"] is True
    assert 50 <= g["n_words"] <= 100_000
    assert 3.0 <= g["mean_word_len"] <= 10.0
    assert g["n_gopher_stopwords"] >= 2


def test_component_values_exact(spark):
    text = "aa bb cc\n- bullet one\n- bullet two\nends here..."
    g = _eval(spark, [text])[0]
    # 11 words: aa bb cc - bullet one - bullet two ends here...
    assert g["n_words"] == 11
    # 4 non-empty lines, 2 bullet-led, 1 ellipsis-ended
    assert g["bullet_line_frac"] == pytest.approx(0.5)
    assert g["ellipsis_line_frac"] == pytest.approx(0.25)
    # one "..." symbol over 11 words
    assert g["symbol_word_ratio"] == pytest.approx(1 / 11, abs=1e-6)
    # the two bare "-" bullets have no letter: 9/11 alpha
    assert g["alpha_word_frac"] == pytest.approx(9 / 11, abs=1e-6)
    assert g["passes"] is False  # too short


def test_each_rule_rejects(spark):
    too_short = "the cat sat with that hat to be of and have"
    symbol_spam = GOOD + " " + "# # # # # # # # # # # # # # # " * 10
    bullet_spam = "\n".join("- " + w for w in GOOD.split()[:120])
    no_alpha = ("123 456 789 " * 40) + "the of and to be that have with"
    no_stop = "alpha beta gamma delta epsilon zeta " * 20
    g = _eval(spark, [too_short, symbol_spam, bullet_spam, no_alpha, no_stop])
    assert g[0]["passes"] is False and g[0]["n_words"] < 50
    assert g[1]["passes"] is False and g[1]["symbol_word_ratio"] >= 0.1
    assert g[2]["passes"] is False and g[2]["bullet_line_frac"] >= 0.9
    assert g[3]["passes"] is False and g[3]["alpha_word_frac"] < 0.8
    assert g[4]["passes"] is False and g[4]["n_gopher_stopwords"] < 2
    # and the rejections are INDEPENDENT: each failing doc trips only
    # its own rule plus any genuinely shared ones
    assert g[1]["bullet_line_frac"] < 0.9
    assert g[2]["symbol_word_ratio"] < 0.1


def test_empty_and_whitespace_docs_dont_crash(spark):
    g = _eval(spark, ["", "   ", "\n\n\n"])
    for i in range(3):
        assert g[i]["passes"] is False
        assert g[i]["n_words"] == 0


def test_corpus_run_is_mapside(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = docs.select("doc_id", gopher_rules(F.col("text")).alias("g"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, "gopher_rules must not shuffle"
    assert "EvalPython" not in plan, "gopher_rules must stay JVM-side"
    rows = out.collect()
    assert len(rows) == docs.count()
    frac = sum(1 for r in rows if r["g"]["passes"]) / len(rows)
    assert 0.0 <= frac <= 1.0
