"""Randomized differential tests: the JVM text-function expressions vs
independent pure-Python references, over one batch of seeded random
documents (one Spark job per test, not one per example).

These catch semantic drift between the higher-order-expression
implementations and their intended definitions — tokenization edge
cases (tabs, repeated spaces, empty lines), alternation order in
regexes, short-document guards — on inputs the hand-written fixtures
don't cover."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cosmap_spark.functions.text import (
    C4_BAD_PHRASES,
    GOPHER_STOPWORDS,
    c4_clean,
    gopher_rules,
    repetition_ratio,
    script_profile,
)

CYR = "абвгдежзий"
HAN = "一二三四五六七八九十"
WORDS = ["alpha", "beta", "Gamma", "delta42", "#tag", "ab", "the", "of",
         "and", "to", "be", "...", "—", "x", "12345", "it's"]


def _random_doc(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(0, 8)):
        n = rng.randint(0, 12)
        ws = [rng.choice(WORDS) for _ in range(n)]
        if rng.random() < 0.2:
            ws = [rng.choice(CYR) * rng.randint(1, 4)] + ws
        if rng.random() < 0.2:
            ws.append(rng.choice(HAN) * rng.randint(1, 3))
        line = (" " * rng.randint(1, 3)).join(ws)
        if rng.random() < 0.2:
            line = rng.choice(["- ", "* ", "3) ", "12. "]) + line
        if rng.random() < 0.2:
            line += rng.choice(["...", "…", ".", "?", '"'])
        if rng.random() < 0.15:
            line += " lorem ipsum"
        if rng.random() < 0.1:
            line = ""
        lines.append(line)
    doc = "\n".join(lines)
    if rng.random() < 0.1:
        doc += "{"
    return doc


@pytest.fixture(scope="module")
def docs():
    rng = random.Random(20260813)
    out = [_random_doc(rng) for _ in range(250)]
    out += ["", " ", "\n", "a", "a b", "...", "the the the"]
    return out


@pytest.fixture(scope="module")
def docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "id long, text string"
    ).cache()


def _ws_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text) if t != ""]


def test_repetition_ratio_differential(docs, docs_df):
    got = {
        r["id"]: r["v"]
        for r in docs_df.select(
            "id", repetition_ratio(F.col("text"), 3).alias("v")
        ).collect()
    }
    for i, text in enumerate(docs):
        toks = text.split(" ")  # single-space corpus convention
        if len(toks) >= 3:
            sh = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
            want = max(Counter(sh).values()) / len(sh)
        else:
            want = 0.0
        assert got[i] == pytest.approx(want, abs=1e-9), (i, text[:60])


def test_gopher_rules_differential(docs, docs_df):
    got = {
        r["id"]: r["g"]
        for r in docs_df.select(
            "id", gopher_rules(F.col("text")).alias("g")
        ).collect()
    }
    for i, text in enumerate(docs):
        toks = _ws_tokens(text)
        lines = [ln for ln in text.split("\n") if ln.strip() != ""]
        nw, nl = len(toks), len(lines)
        safe_nw, safe_nl = max(nw, 1), max(nl, 1)
        g = got[i]
        assert g["n_words"] == nw, (i, text[:60])
        assert g["mean_word_len"] == pytest.approx(
            sum(map(len, toks)) / safe_nw, abs=1e-6
        )
        n_sym = len(re.findall(r"#|\.\.\.|…", text))
        assert g["symbol_word_ratio"] == pytest.approx(n_sym / safe_nw, abs=1e-6)
        bullets = sum(
            1 for ln in lines if re.match(r"^([-*•‣▪]|[0-9]+[.)])", ln.strip())
        )
        assert g["bullet_line_frac"] == pytest.approx(bullets / safe_nl, abs=1e-6)
        ell = sum(1 for ln in lines if re.search(r"(\.\.\.|…)$", ln.strip()))
        assert g["ellipsis_line_frac"] == pytest.approx(ell / safe_nl, abs=1e-6)
        alpha = sum(1 for t in toks if re.search("[A-Za-z]", t))
        assert g["alpha_word_frac"] == pytest.approx(alpha / safe_nw, abs=1e-6)
        n_stop = len({t.lower() for t in toks} & set(GOPHER_STOPWORDS))
        assert g["n_gopher_stopwords"] == n_stop
        want_pass = (
            50 <= nw <= 100_000
            and 3.0 <= round(sum(map(len, toks)) / safe_nw, 6) <= 10.0
            and round(n_sym / safe_nw, 6) < 0.1
            and round(bullets / safe_nl, 6) < 0.9
            and round(ell / safe_nl, 6) < 0.3
            and round(alpha / safe_nw, 6) >= 0.8
            and n_stop >= 2
        )
        assert g["passes"] == want_pass, (i, text[:60])


def test_c4_clean_differential(docs, docs_df):
    phrase_re = re.compile(
        "|".join(p.replace(" ", r"\s+") for p in C4_BAD_PHRASES)
    )
    got = {
        r["id"]: r["c"]
        for r in docs_df.select("id", c4_clean(F.col("text")).alias("c")).collect()
    }
    for i, text in enumerate(docs):
        raw_lines = text.split("\n")
        kept = [
            ln for ln in raw_lines
            if re.search(r"""[.!?"']$""", ln.strip())
            and len(_ws_tokens(ln.strip())) >= 4
            and not phrase_re.search(ln.lower())
        ]
        c = got[i]
        assert c["clean_text"] == "\n".join(kept), (i, text[:60])
        assert c["n_kept"] == len(kept)
        assert c["n_lines"] == sum(1 for ln in raw_lines if ln.strip() != "")
        assert c["has_brace"] == ("{" in text)


def test_script_profile_differential(docs, docs_df):
    # python reference over the EXACT ranges the generator emits: ascii
    # letters (latin), the CYR alphabet slice (cyrillic), HAN numerals
    # (han); everything else in the fixtures is digits/punct/space
    def classify(ch: str) -> str | None:
        if "a" <= ch.lower() <= "z":
            return "latin"
        if ch in CYR:
            return "cyrillic"
        if ch in HAN:
            return "han"
        return None

    got = {
        r["id"]: r["s"]
        for r in docs_df.select(
            "id", script_profile(F.col("text")).alias("s")
        ).collect()
    }
    for i, text in enumerate(docs):
        counts = Counter(c for c in (classify(ch) for ch in text) if c)
        n_letters = sum(counts.values())
        s = got[i]
        assert s["n_letters"] == n_letters, (i, text[:60])
        if n_letters == 0:
            assert s["dominant_script"] == "none"
            continue
        for script in ("latin", "cyrillic", "han"):
            assert s[f"{script}_frac"] == pytest.approx(
                counts.get(script, 0) / n_letters, abs=1e-6
            ), (i, script)
        best = max(counts.values())
        want_dom = min(k for k, v in counts.items() if v == best)
        assert s["dominant_script"] == want_dom, (i, text[:60])


# --- Luhn-verified card detection (functions/text.py) ---------------------


def test_luhn_valid_against_reference(spark):
    """Differential vs a pure-Python Luhn over random digit strings
    (valid strings planted by checksum construction)."""
    import numpy as np

    from cosmap_spark.functions.text import luhn_valid

    def py_luhn(d):
        if not (d.isdigit() and 12 <= len(d) <= 19):
            return False
        tot = 0
        for i, ch in enumerate(reversed(d)):
            v = int(ch)
            if i % 2 == 1:
                v *= 2
                if v > 9:
                    v -= 9
            tot += v
        return tot % 10 == 0

    rng = np.random.default_rng(5)
    rows = []
    for _ in range(60):
        body = "".join(str(x) for x in rng.integers(0, 10, 15))
        # plant the valid variant: pick the check digit that closes it
        for cd in range(10):
            if py_luhn(body + str(cd)):
                rows.append(body + str(cd))
                break
        rows.append(body + str(rng.integers(0, 10)))
    rows += ["", "abc", "123", "4532015112830366"]
    df = spark.createDataFrame([(r,) for r in rows], "d string")
    got = {r["d"]: r["ok"] for r in df.select(
        "d", luhn_valid(F.col("d")).alias("ok")).collect()}
    for d in rows:
        assert got[d] == py_luhn(d), d


def test_scrub_pii_strict_redacts_only_valid_cards(spark):
    from cosmap_spark.functions.text import scrub_pii_strict

    df = spark.createDataFrame(
        [
            ("card 4532 0151 1283 0366 mail a@b.co run 1234567890123",),
            ("invalid 4532-0151-1283-0367 only",),
        ],
        "text string",
    )
    got = [r["s"] for r in df.select(
        scrub_pii_strict(F.col("text")).alias("s")).collect()]
    assert got[0] == "card <CARD> mail <EMAIL> run <NUM>"
    assert "<CARD>" not in got[1]  # checksum-invalid span untouched
