"""Unicode script profiling: routing correctness per script, mixed-text
fractions, edge cases, map-side plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmap_spark.functions.text import script_profile
from cosmap_spark.tables import load_table


def _profile(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select("id", script_profile(F.col("text")).alias("s")).collect()
    return {r["id"]: r["s"] for r in rows}


def test_dominant_script_routing(spark):
    s = _profile(
        spark,
        [
            "The quick brown fox jumps over the lazy dog",
            "Быстрая коричневая лиса прыгает через ленивую собаку",
            "敏捷的棕色狐狸跳过懒狗",
            "الثعلب البني السريع يقفز فوق الكلب الكسول",
            "Ο γρήγορος καφές αλεπού πηδά",
            "빠른 갈색 여우가 게으른 개를 뛰어넘다",
        ],
    )
    assert s[0]["dominant_script"] == "latin"
    assert s[1]["dominant_script"] == "cyrillic"
    assert s[2]["dominant_script"] == "han"
    assert s[3]["dominant_script"] == "arabic"
    assert s[4]["dominant_script"] == "greek"
    assert s[5]["dominant_script"] == "hangul"
    assert s[0]["latin_frac"] == pytest.approx(1.0)
    assert s[1]["cyrillic_frac"] == pytest.approx(1.0)


def test_mixed_text_fractions(spark):
    # 4 latin letters, 4 han characters → 0.5 / 0.5; alphabetical tie
    # break picks "han"
    s = _profile(spark, ["abcd 敏捷的棕"])[0]
    assert s["n_letters"] == 8
    assert s["latin_frac"] == pytest.approx(0.5)
    assert s["han_frac"] == pytest.approx(0.5)
    assert s["dominant_script"] == "han"


def test_letterless_and_empty(spark):
    s = _profile(spark, ["12345 !!! ...", ""])
    for i in (0, 1):
        assert s[i]["dominant_script"] == "none"
        assert s[i]["n_letters"] == 0


def test_corpus_run_is_mapside(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = docs.select("doc_id", script_profile(F.col("text")).alias("s"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    rows = out.collect()
    assert all(r["s"]["dominant_script"] == "latin" for r in rows)


def test_unprofiled_scripts_route_to_other(spark):
    # Hebrew and Thai letters are outside the nine profiled scripts:
    # the all-zero argmax must NOT hand them to the alphabetically
    # first script ("arabic")
    s = _profile(spark, ["שלום עולם זה מבחן", "สวัสดีชาวโลก"])
    for i in (0, 1):
        assert s[i]["n_letters"] > 0
        assert s[i]["dominant_script"] == "other", s[i]
