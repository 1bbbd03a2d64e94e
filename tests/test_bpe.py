"""Learned BPE tokenizer: hand-verified merge learning, the canonical
apply loop, reconstruction invariants, and compression monotonicity."""

from __future__ import annotations

from datamine_v2_0_spark.operators import bpe


def test_train_bpe_hand_example(spark):
    # words: aa x2, ab x1
    df = spark.createDataFrame([(1, "aa aa ab")], ["doc_id", "text"])
    merges = bpe.train_bpe(df, "text", num_merges=3)
    # pair counts round 1: (a,a)=2, (a,</w>)=2, (a,b)=1, (b,</w>)=1;
    # tie at 2 breaks lexicographically -> ('a','</w>') first
    assert merges == [("a", "</w>"), ("a", "a</w>"), ("a", "b")]


def test_encode_word_follows_ranks():
    ranks = {("a", "</w>"): 0, ("a", "a</w>"): 1, ("a", "b"): 2}
    assert bpe.encode_word("aa", ranks) == ["aa</w>"]
    assert bpe.encode_word("ab", ranks) == ["ab", "</w>"]
    # unseen word still terminates and stays reconstructible
    assert bpe.encode_word("ba", ranks) == ["b", "a</w>"]


def test_apply_bpe_reconstruction_and_compression(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the bat and the rat"),
        (3, "concatenation of the cat"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    merges = bpe.train_bpe(df, "text", num_merges=40)
    out = {
        r["doc_id"]: r
        for r in bpe.apply_bpe(df, "text", "doc_id", merges).collect()
    }
    for doc_id, text in docs:
        tokens = out[doc_id]["tokens"]
        # concatenating tokens reproduces the words with </w> separators
        assert "".join(tokens) == bpe.END.join(text.split()) + bpe.END
    # more merges -> fewer tokens (monotone compression)
    few = bpe.apply_bpe(df, "text", "doc_id", merges[:5]).collect()
    many_n = sum(r["n_tokens"] for r in out.values())
    few_n = sum(r["n_tokens"] for r in few)
    assert many_n < few_n


def test_train_bpe_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta") for i in range(20)],
        ["doc_id", "text"],
    )
    m1 = bpe.train_bpe(df, "text", num_merges=10)
    m2 = bpe.train_bpe(df, "text", num_merges=10)
    assert m1 == m2 and len(m1) == 10


def test_word_frequencies_cap(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c")], ["doc_id", "text"]
    )
    rows = bpe.word_frequencies(df, "text", max_vocab_words=2).collect()
    assert [(r["word"], r["freq"]) for r in rows] == [("a", 3), ("b", 2)]
