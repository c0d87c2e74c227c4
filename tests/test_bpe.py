"""BPE merge learning: greedy-fold semantics, tie-breaks, determinism."""

from trignis_spark.operators import bpe


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_greedy_merge_is_left_to_right_non_overlapping(spark):
    # "aaaa" with rule (a,a): [aa, aa], and "aaa": [aa, a] — the
    # canonical non-overlapping application
    syms = bpe.to_symbols(
        bpe.word_table(_docs(spark, ["aaaa aaa"]))
    )
    merged = {
        r["sym"] for r in bpe.apply_merge(syms, "a", "a").collect()
    }
    assert merged == {"aa|aa", "aa|a"}


def test_merged_symbol_does_not_cascade_within_one_round(spark):
    # after merging (a,b), a following "ab" symbol is "ab" — a second
    # (a,b) pair inside the same round must not chain onto it
    syms = bpe.to_symbols(bpe.word_table(_docs(spark, ["abab"])))
    out = [r["sym"] for r in bpe.apply_merge(syms, "a", "b").collect()]
    assert out == ["ab|ab"]


def test_learn_merges_counts_and_tiebreak(spark):
    # "ab" x3, "cd" x3: equal counts -> lexicographically smaller pair
    # (a,b) first; after merging, (c,d) wins round 2
    docs = _docs(spark, ["ab cd ab cd", "ab cd"])
    rules = bpe.learn_merges(docs, 2)
    assert rules[0][:2] == ("a", "b") and rules[0][2] == 3
    assert rules[1][:2] == ("c", "d") and rules[1][2] == 3


def test_learning_is_deterministic_and_freq_weighted(spark):
    docs = _docs(spark, ["the the the quick", "the quick"])
    a = bpe.learn_merges(docs, 3)
    b = bpe.learn_merges(docs, 3)
    assert a == b
    # 't','h' appears in every "the" (freq 2 distinct words? no: words
    # 'the' freq=4, 'quick' freq=2) -> (t,h) or (h,e) count 4 wins
    assert a[0][2] == 4
