"""BPE trainer: known-corpus merge sequence + determinism + the gate's
Spark plumbing (vocabulary aggregation feeding the recurrence)."""

from edgelake_spark.functions.text import bpe_train_merges


def test_known_corpus_merges():
    # classic BPE illustration: 'lo' dominates, then 'low'
    wf = [("low", 5), ("lower", 2), ("lowest", 6), ("newer", 3)]
    merges = bpe_train_merges(wf, n_merges=3)
    assert merges[0][1:3] == ("l", "o") and merges[0][4] == 13
    assert merges[1][1:3] == ("lo", "w") and merges[1][4] == 13
    # after low fused: 'low'+'e' appears in lower(2) + lowest(6) = 8,
    # beating 'e'+'s' (6) and 'e'+'r' (5)
    assert merges[2][1:3] == ("low", "e") and merges[2][4] == 8


def test_tie_break_deterministic():
    # aa and bb tie at freq 2 → lexicographic min pair ('a','a') wins
    wf = [("aa", 2), ("bb", 2)]
    m1 = bpe_train_merges(wf, n_merges=1)
    m2 = bpe_train_merges(list(reversed(wf)), n_merges=1)
    assert m1 == m2
    assert m1[0][1:3] == ("a", "a")


def test_merge_rewrites_vocab():
    # after merging ('a','b'), the pair ('ab','c') must surface —
    # proving the vocab is rewritten between rounds, not recounted raw
    wf = [("abc", 4)]
    merges = bpe_train_merges(wf, n_merges=2)
    assert merges[0][1:4] == ("a", "b", "ab")
    assert merges[1][1:4] == ("ab", "c", "abc")


def test_gate_runs_on_testdata(spark):
    from edgelake_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["doc_bpe_train"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0]["rank"] == 0
    # weighted pair freqs never increase as merges consume pairs' mass
    assert rows[0]["pair_freq"] >= rows[-1]["pair_freq"]
