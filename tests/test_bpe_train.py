"""BPE trainer: known-corpus merge sequence + determinism + the gate's
Spark plumbing (vocabulary aggregation feeding the recurrence), plus
the pure-SQL encoder (bpe_apply_expr) against its Python reference —
randomized words on both engines, and the train/apply consistency
property (encoding with the trained rules reproduces the trainer's
final vocabulary)."""

import random

import duckdb

from edgelake_spark.functions.text import (
    bpe_apply_expr,
    bpe_apply_py,
    bpe_train_merges,
)


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


def _random_words(n, seed):
    rnd = random.Random(seed)
    # tight alphabet so merge rules actually fire, plus repeated-letter
    # runs (the overlapping-pair case where naive separators fail)
    return [
        "".join(rnd.choice("aberst") for _ in range(rnd.randrange(1, 14)))
        for _ in range(n)
    ]


def test_apply_expr_matches_python_both_engines(spark):
    words = _random_words(300, seed=11)
    merges = bpe_train_merges([(w, 1) for w in words], n_merges=8)
    expected = {w: bpe_apply_py(w, merges) for w in set(words)}

    spark.createDataFrame(
        [(w,) for w in expected], "word string"
    ).createOrReplaceTempView("__bpe_w")
    got_s = {
        r["word"]: list(r["t"])
        for r in spark.sql(
            f"SELECT word, {bpe_apply_expr('spark', 'word', merges)} AS t "
            "FROM __bpe_w"
        ).collect()
    }
    assert got_s == expected

    con = duckdb.connect()
    con.execute("CREATE TABLE __bpe_w(word VARCHAR)")
    con.executemany("INSERT INTO __bpe_w VALUES (?)", [(w,) for w in expected])
    got_d = dict(
        con.execute(
            f"SELECT word, {bpe_apply_expr('duck', 'word', merges)} FROM __bpe_w"
        ).fetchall()
    )
    assert got_d == expected


def test_apply_is_consistent_with_trainer_rewrite():
    # encoding every word with the trained rules must reproduce the
    # symbol sequences the trainer's own vocabulary rewrite ended with
    # (same greedy left-to-right fusion; this is the property that makes
    # the pinned-merges oracle a faithful split of the training gate)
    wf = [("low", 5), ("lower", 2), ("lowest", 6), ("newer", 3), ("sss", 4)]
    merges = bpe_train_merges(wf, n_merges=4)
    vocab = {}
    for word, freq in wf:
        syms = tuple(word)
        vocab[syms] = vocab.get(syms, 0) + freq
    for _rank, left, right, merged, _f in merges:
        nv = {}
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + freq
        vocab = nv
    for word, _freq in wf:
        assert tuple(bpe_apply_py(word, merges)) in vocab


def test_pinned_merges_match_sf001_training(spark):
    # BPE_MERGES is the doc_bpe_train golden at the driver's sf0.01
    # correctness scale; re-train here so a testdata or tokenizer change
    # fails loudly in pytest instead of silently desyncing the oracle
    from edgelake_spark.queries import BPE_MERGES, SPARK_QUERIES

    df = SPARK_QUERIES["doc_bpe_train"](spark, "/root/testdata/sf0.01")
    assert [tuple(r) for r in df.collect()] == BPE_MERGES
