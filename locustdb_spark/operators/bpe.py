"""Byte-pair-encoding tokenization for training-data pipelines.

Token counts drive packing budgets, cost estimates, and length
filters; the whitespace/regex counters in text.py approximate them,
this module computes REAL BPE counts with a trained merge table
(the sennrich-style word-level BPE that GPT-2-family tokenizers
build on).

Scale shape:

- `word_histogram`: the corpus reduces to its word vocabulary in one
  map-side-combined count shuffle — training never re-reads text.
- `train_bpe`: classic merge-pair training runs DRIVER-SIDE on the
  collected histogram, capped at `max_words` most frequent words (the
  bounded-driver-sample pattern, like IVF centroid training): merge
  quality depends on frequent words, and the cap makes driver memory
  independent of corpus size.
- `bpe_encode_count`: Arrow-batched mapInPandas with the merge ranks
  broadcast in the closure and a per-word segmentation cache — each
  distinct word is segmented once per batch regardless of frequency.
- `bpe_token_count_expr`: the same merge application as a chain of
  JVM `replace` expressions over space-separated symbols. Merge
  application IS left-to-right non-overlapping global replace, which
  every engine implements identically — so a FROZEN merge list makes
  real BPE token counts SQL-oracle-checkable (the train step, like
  k-means, is not SQL-expressible).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_histogram(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    return (docs.select(F.explode(words).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def train_bpe_py(word_counts: dict[str, int],
                 num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training on a word histogram (pure Python).
    Deterministic: ties in pair frequency break lexicographically."""
    vocab = {tuple(w) + (END,): c for w, c in word_counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == best[0] and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def train_bpe(
    histogram: DataFrame,
    num_merges: int = 200,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Collect the `max_words` most frequent words (deterministic
    order: count desc, word asc) and train driver-side."""
    top = (histogram.orderBy(F.col("cnt").desc(), F.col("word"))
           .limit(max_words).collect())
    return train_bpe_py({r.word: r.cnt for r in top}, num_merges)


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        # merge ALL occurrences of that pair, left to right
        pair = (syms[best_i], syms[best_i + 1])
        out = []
        i = 0
        while i < len(syms):
            if (i + 1 < len(syms)
                    and syms[i] == pair[0] and syms[i + 1] == pair[1]):
                out.append(pair[0] + pair[1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """(id, n_words, n_tokens) per document with the trained merges.
    Arrow-batched; per-word segmentation cache amortizes hot words."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    import re

    # ASCII \s+ to match the Spark/DuckDB split (Java regex \s is
    # ASCII-only; Python str.split() and unicode \s would also break
    # on NBSP/thin-space, diverging from the expr path and oracle)
    ws = re.compile(r"\s+", re.ASCII)

    def count(batches):
        import pandas as pd

        cache: dict[str, int] = {}
        for pdf in batches:
            nw, nt = [], []
            for text in pdf[text_col]:
                t = (text or "")
                if lowercase:
                    t = t.lower()
                words = [w.replace(_OPEN, "").replace(_CLOSE, "")
                         for w in ws.split(t) if w != ""]
                total = 0
                for w in words:
                    n = cache.get(w)
                    if n is None:
                        n = len(segment_word(w, ranks))
                        cache[w] = n
                    total += n
                nw.append(len(words))
                nt.append(total)
            yield pd.DataFrame({
                id_col: pdf[id_col], "n_words": nw, "n_tokens": nt})

    return docs.select(id_col, text_col).mapInPandas(
        count, f"{id_col} long, n_words long, n_tokens long")


# Symbol framing for the expression path. A space-separated encoding
# ("a b" -> "ab") CONSUMES the shared separator, so a second adjacent
# occurrence of the pair in the same word is missed by a single
# replace pass ("banana": ' b a n a n a ' merges only one 'an') —
# each symbol must carry its own delimiters. SOH/STX control chars
# frame every symbol (\x01sym\x02), making the pair pattern
# "\x01a\x02\x01b\x02" self-contained: adjacent occurrences share no
# characters, so one left-to-right replace pass IS BPE's simultaneous
# merge. Input words are stripped of the two framing chars first
# (control characters, not text).
_OPEN = "\x01"
_CLOSE = "\x02"


def _framed_chars(word: Column) -> Column:
    clean = F.replace(F.replace(word, F.lit(_OPEN), F.lit("")),
                      F.lit(_CLOSE), F.lit(""))
    # split('', '') yields [''] — filter it or an all-control word
    # would gain a phantom empty symbol vs the fast path
    chars = F.filter(F.split(clean, ""), lambda c: c != "")
    return F.concat(
        F.array_join(
            F.transform(chars,
                        lambda c: F.concat(F.lit(_OPEN), c,
                                           F.lit(_CLOSE))), ""),
        F.lit(_OPEN + END + _CLOSE))


def bpe_token_count_expr(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Expression-only variant: each symbol is individually framed
    (\\x01sym\\x02) and each merge becomes one replace pass in merge
    order — exactly BPE's left-to-right simultaneous merge, including
    adjacent occurrences ("banana"). Engine-portable (same replace
    semantics everywhere), which is what puts REAL BPE counts under a
    SQL oracle. Practical for merge lists up to a few hundred (one
    expression per merge)."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    exploded = docs.select(F.col(id_col),
                           F.explode_outer(words).alias("_w"))
    sym = _framed_chars(F.col("_w"))
    for a, b in merges:
        sym = F.replace(
            sym,
            F.lit(f"{_OPEN}{a}{_CLOSE}{_OPEN}{b}{_CLOSE}"),
            F.lit(f"{_OPEN}{a}{b}{_CLOSE}"))
    n_tokens_word = (F.length(sym)
                     - F.length(F.replace(sym, F.lit(_OPEN),
                                          F.lit(""))))
    per_word = exploded.select(
        F.col(id_col),
        F.when(F.col("_w").isNull(), F.lit(0))
        .otherwise(n_tokens_word).alias("_nt"),
        F.when(F.col("_w").isNull(), F.lit(0)).otherwise(F.lit(1))
        .alias("_nw"),
    )
    return per_word.groupBy(id_col).agg(
        F.sum("_nw").cast("long").alias("n_words"),
        F.sum("_nt").cast("long").alias("n_tokens"))