"""BPE tokenizer training (pipeline/text.py): hand-checked merge sequence
on a tiny corpus, and structural invariants on the real corpus — the
encoding always reassembles to the word, and merges only shrink it."""

import pyspark.sql.functions as F

from hyrise_spark.pipeline.text import bpe_apply, bpe_train
from tests.conftest import SF_DIR


def _toy(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_bpe_train_hand_checked_merges(spark):
    """Corpus {aaab x3, ab x2}: (a,a)=6 beats (a,b)=5, then (a,b)=5,
    then (aa,ab)=3; leftmost-first overlap handling makes aaab -> [aa,a,b]
    after merge 1 (NOT [a,aa,b])."""
    docs = _toy(spark, "aaab aaab aaab ab ab")
    merges = bpe_train(docs, n_merges=10)
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]

    enc = {r.word: r.syms for r in bpe_apply(docs, merges).collect()}
    assert enc["aaab"] == ["aaab"]
    assert enc["ab"] == ["ab"]


def test_bpe_train_early_stop_singletons(spark):
    """Every pair unique -> no pair reaches count 2 -> zero merges."""
    docs = _toy(spark, "abcd efgh")
    assert bpe_train(docs, n_merges=5) == []


def test_bpe_apply_invariants_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(25)
    merges = bpe_train(docs, n_merges=3)
    assert 1 <= len(merges) <= 3
    enc = bpe_apply(docs, merges)
    # lossless: symbols concatenate back to the word, for every word
    bad = enc.filter(F.expr("array_join(syms, '') <> word")).count()
    assert bad == 0
    # compression: total symbol count strictly below character count
    tot = enc.agg(
        F.sum(F.size("syms") * F.col("cnt")).alias("toks"),
        F.sum(F.length("word") * F.col("cnt")).alias("chars"),
    ).first()
    assert tot.toks < tot.chars
