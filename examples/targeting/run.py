"""Runnable target-domain corpus construction — the round-3 selection
stack composed end-to-end:

    python examples/targeting/run.py [sf_dir]

Given a raw corpus and a small TARGET slice (here: the non-'en'
documents stand in for "the domain we want more of"), build a curated
training slice:

1. **DSIR importance resampling** (operators/dsir.py): hashed-ngram
   likelihood-ratio weights against the target, Gumbel-top-k draw —
   the statistical "looks like the target" cut;
2. **perplexity filter** (operators/lm.py): score the selection under
   a bigram LM trained on the target slice and keep the
   reference-like tail — the CCNet-style fluency cut;
3. **BPE tokenize** (operators/vocab.py): train a merge list on the
   target slice, apply it to the survivors in one Arrow pass;
4. **data card** (operators/report.py): per-language corpus report +
   skew check of the language key.

Everything is one lazy plan per stage; only O(model) state (merge
list) touches the driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F

from cosmap_spark.operators.dsir import dsir_sample
from cosmap_spark.operators.lm import bigram_model, doc_nll
from cosmap_spark.operators.report import corpus_report, skew_report
from cosmap_spark.operators.vocab import bpe_encode, train_bpe
from cosmap_spark.session import get_spark
from cosmap_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="targeting-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") != "en")
    print(f"raw: {docs.count()} docs, target slice: {target.count()}")

    # 1. DSIR: draw 200 docs ∝ how target-like their n-grams are
    picked = dsir_sample(
        docs.select("doc_id", "text"), target.select("doc_id", "text"),
        k=200, buckets=4096,
    )
    selected = docs.join(
        picked.withColumnRenamed("id", "doc_id").select("doc_id", "log_w"),
        "doc_id",
    )
    print(f"dsir-selected: {selected.count()}")

    # 2. perplexity cut: drop the worst-scoring half under the target LM
    model = bigram_model(target)
    scored = selected.join(
        doc_nll(selected, model).withColumnRenamed("id", "doc_id"), "doc_id"
    )
    cut = scored.agg(
        F.percentile_approx("avg_nll", F.lit(0.5), 10_000)
    ).collect()[0][0]
    kept = scored.where(F.col("avg_nll").isNull() | (F.col("avg_nll") <= cut))
    print(f"after perplexity cut (avg_nll <= {cut:.3f}): {kept.count()}")

    # 3. tokenizer: train on the target, encode survivors in one pass
    merges = train_bpe(target, n_merges=20)
    tokenized = bpe_encode(kept, merges)
    sample = tokenized.select("doc_id", "bpe_tokens").limit(2).collect()
    print(f"trained {len(merges)} merges; e.g. {merges[:3]}")
    for r in sample:
        print(f"  doc {r['doc_id']}: {r['bpe_tokens'][:8]} ...")

    # 4. data card + key-health check
    card = corpus_report(tokenized.drop("bpe_tokens")).collect()
    for row in card:
        print(f"  lang={row['lang']}: {row['n_docs']} docs, "
              f"{row['total_tokens']} tokens, dup_rate={row['dup_rate']}")
    skew = skew_report(tokenized, ["lang"])
    print(f"lang-key skew ratio {skew['skew_ratio']} "
          f"(suggested salt {skew['suggested_salt']})")


if __name__ == "__main__":
    main()
