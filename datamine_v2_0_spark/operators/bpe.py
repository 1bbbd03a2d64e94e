"""Learned BPE tokenizer: distributed frequency extraction + driver-side
merge learning + Arrow-batched apply.

The scale-correct formulation (Sennrich et al. 2016): BPE training needs
only the WORD-FREQUENCY table, not the corpus — at 100 TB the corpus is
petabyte-shaped but its distinct-word table is ~10⁷ rows. So training is

1. one `groupBy(word)` shuffle (map-side combinable) to build the
   frequency table, capped to the top ``max_vocab_words`` by frequency
   (the customary approximation — tail hapaxes cannot win a merge vote
   against the head at realistic merge counts),
2. a driver loop over that compressed table (corpus-size-independent:
   O(num_merges × distinct_words) per full recount pass),
3. the learned merge ranks BROADCAST to executors; apply is a
   vectorized pandas UDF doing greedy lowest-rank merging per word with
   a per-batch word cache (Zipf makes the cache hit rate ~word-frequency
   mass, so the per-doc cost collapses to cache lookups).

Training output and apply are deterministic: ties on pair frequency
break lexicographically, so the same corpus always yields the same
merge list on any cluster size.
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

import sys

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from datamine_v2_0_spark.shipping import ship_by_value

# the apply-side UDF closes over encode_word from this module: ship the
# module by value so tokenization runs on clusters that never installed
# this package (see shipping.py)
ship_by_value(sys.modules[__name__])

END = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str, max_vocab_words: int = 100_000
) -> DataFrame:
    """(word, freq) for the corpus, highest-frequency first, capped.
    One shuffle; the cap is a TakeOrderedAndProject, not a full sort."""
    t = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    words = (
        df.select(F.explode(F.split(t, " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.orderBy(F.desc("freq"), "word").limit(max_vocab_words)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += freq
    return pairs


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """Greedy left-to-right merge of one pair in one symbol sequence."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 1000,
    max_vocab_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus word-frequency
    table. Returns the ordered merge list (rank = position). The only
    distributed stage is the frequency groupBy; the driver loop never
    touches corpus-sized data."""
    freqs = word_frequencies(df, text_col, max_vocab_words).collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in freqs:
        syms = tuple(r["word"]) + (END,)
        vocab[syms] = vocab.get(syms, 0) + int(r["freq"])

    merges: list[tuple[str, str]] = []
    pairs = _pair_counts(vocab)
    for _ in range(num_merges):
        if not pairs:
            break
        # deterministic argmax: max frequency, lexicographically smallest
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 1:
            break
        merges.append(best)
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            merged = (
                _merge_word(syms, best)
                if best[0] in syms and best[1] in syms
                else syms
            )
            new_vocab[merged] = new_vocab.get(merged, 0) + freq
        vocab = new_vocab
        pairs = _pair_counts(vocab)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word: repeatedly merge the lowest-rank
    adjacent pair (the canonical BPE apply loop)."""
    syms: list[str] = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: Sequence[tuple[str, str]],
) -> DataFrame:
    """Tokenize each document with a learned merge list. Returns
    (id, n_tokens, tokens). Arrow-batched pandas UDF with a per-batch
    word→encoding cache; the merge table ships inside the closure
    (broadcast by value — it is ≤ num_merges tuples)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_doc(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in text.split():
                hit = cache.get(w)
                if hit is None:
                    hit = encode_word(w, ranks)
                    cache[w] = hit
                out.extend(hit)
            return out

        return texts.map(enc_doc)

    toks = df.select(F.col(id_col), _encode(F.col(text_col)).alias("tokens"))
    return toks.select(
        id_col,
        F.size("tokens").cast("long").alias("n_tokens"),
        "tokens",
    )
