"""N-gram language-model training and document scoring.

The CCNet / Gopher-style pipeline stage this covers: train a cheap
n-gram LM on a trusted reference corpus, score every crawled document
by how "in-distribution" its n-grams are, and filter/bucket on the
score. (The reference engine has no LM surface — this belongs to the
beyond-parity training-data toolkit, next to text.py's quality
heuristics and gopher rules.)

Scale shape:

- `ngram_counts` (training): tokenize + n-gram expansion are pure
  projections; the only shuffle carries (ngram, partial count) pairs
  with map-side combine — a billion-doc corpus reduces to its n-gram
  vocabulary, never re-shuffling text.
- `score_documents`: exploded (doc_id, ngram) joins the model ON THE
  NGRAM KEY — the model is usually far too big to broadcast at corpus
  scale, so this is a shuffle join whose hot keys (stop-word bigrams)
  are exactly what AQE skew-join splitting handles; the re-aggregation
  back to doc_id is the second and last shuffle. Set
  `broadcast_model=True` when the model is known-small (e.g. a
  domain-specific reference corpus) to drop to one shuffle.
- Scores decompose into exact integer parts (n-gram totals, unseen
  counts, summed model counts) plus a float log-probability; the
  integer parts are engine-portable bit-exactly (DuckDB oracle), the
  log-prob is pytest-pinned against a pure-Python reimplementation
  (libm log10 may differ across engines in the last ulp).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spread import spread_small_scan


def _tokens(text_col: str) -> Column:
    """The text.py tokenization (single source of truth for the
    space-split the shared DuckDB oracles depend on)."""
    from .text import _tokens as _text_tokens

    return _text_tokens(F.col(text_col))


def _ngrams(toks: Column, n: int) -> Column:
    if n == 1:
        # NULL text -> empty array, matching the n >= 2 branch (the
        # every-doc-restored contract relies on size() == 0, and
        # size(NULL) is -1)
        return F.coalesce(toks, F.array().cast("array<string>"))
    # sequence(1, 0) is DESCENDING in Spark, so the short-document
    # case must be handled explicitly, not with greatest()
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _ngram_arrays_arrow(text_col: str, n: int) -> Column:
    """Arrow-batched twin of `_ngrams(_tokens(...))`: identical gram
    strings including the short-document (empty array) and NULL-text
    edge cases. The expression form is an interpreted HOF transform —
    ~40% of score_documents' sf1 wall time; this kernel is one Python
    pass per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in (t or "").lower().split(" ") if w]
            if n == 1:
                out.append(toks)
            elif len(toks) >= n:
                out.append([" ".join(toks[i:i + n])
                            for i in range(len(toks) - n + 1)])
            else:
                out.append([])
        return pd.Series(out)

    return _grams(F.col(text_col))


def _exploded_grams(docs: DataFrame, keep: list[str], text_col: str,
                    n: int, impl: str) -> DataFrame:
    """`keep` columns + one exploded `ngram` row per document n-gram.

    r12: the expr path hoists the token array into a materialized
    column before the gram transform. HOF lambdas are CodegenFallback
    and interpreted eval re-computes non-lambda subexpressions per
    element — with `toks` inline, every gram's `F.slice(toks, i, n)`
    re-ran the whole split/filter/lower tokenization, O(tokens^2)
    string work per document. As a named column referenced three
    times (when-guard, sequence bound, slice) it survives
    CollapseProject and is evaluated once per row. Gram strings are
    unchanged — same expressions, same inputs."""
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy gram expansion (no-op at scale
    # and on streaming inputs — see spread_small_scan).
    docs = spread_small_scan(docs)
    if impl == "arrow":
        return docs.select(
            *[F.col(c) for c in keep],
            F.explode(_ngram_arrays_arrow(text_col, n)).alias("ngram"))
    if impl != "expr":
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")
    pre = docs.select(*[F.col(c) for c in keep],
                      _tokens(text_col).alias("_toks"))
    return pre.select(
        *[F.col(c) for c in keep],
        F.explode(_ngrams(F.col("_toks"), n)).alias("ngram"))


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    min_count: int = 1,
    impl: str = "arrow",
) -> DataFrame:
    """Train: (ngram, cnt) over the corpus. `min_count` prunes the
    long tail (the vocabulary-size knob; pruning happens after the
    single count shuffle). ``impl="arrow"`` (the DEFAULT since r6)
    uses the Arrow n-gram kernel; ``impl="expr"`` is the
    interpreted-HOF expansion the SQL oracle replays — identical
    grams either way (pytest-pinned + both under the driver gate via
    the text_lm_*[_arrow] entries)."""
    grams = _exploded_grams(docs, [], text_col, n, impl)
    counts = grams.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("cnt"))
    if min_count > 1:
        counts = counts.filter(F.col("cnt") >= min_count)
    return counts


def score_documents(
    docs: DataFrame,
    model: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = False,
    impl: str = "arrow",
) -> DataFrame:
    """Score every document against a trained `ngram_counts` model.

    Output per document:
      - n_ngrams: total n-grams in the document
      - n_unseen: n-grams absent from the model (OOV mass)
      - seen_cnt_sum: exact integer sum of the model counts of seen
        n-grams (the portable "familiarity" mass)
      - avg_logprob: mean log10 unigram-normalized model probability
        with add-one smoothing over the model total — the CCNet-style
        fluency score (float; more negative = less in-distribution)
    """
    model_total = model.agg(
        F.sum("cnt").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_vocab"))
    grams = _exploded_grams(docs, [id_col], text_col, n, impl)
    m = F.broadcast(model) if broadcast_model else model
    joined = grams.join(m, "ngram", "left")
    scored = (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.when(F.col("cnt").isNull(), 1).otherwise(0))
            .cast("long").alias("n_unseen"),
            F.sum(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long").alias("seen_cnt_sum"),
            F.sum(F.log10(F.coalesce(F.col("cnt"), F.lit(0)) + 1))
            .alias("_log_num_sum"),
        )
        .crossJoin(F.broadcast(model_total))
        .select(
            F.col(id_col),
            "n_ngrams",
            "n_unseen",
            "seen_cnt_sum",
            # sum(log10((cnt+1)/(total+vocab))) / n_ngrams
            ((F.col("_log_num_sum")
              - F.col("n_ngrams")
              * F.log10(F.col("_total") + F.col("_vocab")))
             / F.col("n_ngrams")).alias("avg_logprob"),
        )
    )
    # documents with zero n-grams (shorter than n tokens) drop out of
    # the explode; restore them with NULL score and zero counts.
    # Zero n-grams <=> fewer than n tokens (size() is NULL for NULL
    # text under ANSI, coalesced to -1), so the filter only counts
    # tokens — the old form rebuilt every document's full gram-string
    # array through the interpreted HOF transform just to size() it,
    # which the r6 sf10 skew runs measured as a 36 s/task second scan
    # fused into the final stage.
    empties = (
        docs.select(F.col(id_col),
                    F.coalesce(F.size(_tokens(text_col)),
                               F.lit(-1)).alias("_k"))
        .filter(F.col("_k") < n)
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_ngrams"),
            F.lit(0).cast("long").alias("n_unseen"),
            F.lit(0).cast("long").alias("seen_cnt_sum"),
            F.lit(None).cast("double").alias("avg_logprob"),
        )
    )
    return scored.unionByName(empties)


def perplexity_filter(
    docs: DataFrame,
    model: DataFrame,
    n: int = 2,
    max_unseen_frac: float = 0.5,
    min_avg_logprob: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """Keep documents that look in-distribution: unseen-n-gram
    fraction at most `max_unseen_frac`, and (optionally) avg_logprob
    at least `min_avg_logprob`. Join-back is a semi-join on id — the
    corpus text shuffles zero times."""
    scores = score_documents(docs, model, n=n, text_col=text_col,
                             id_col=id_col, impl=impl)
    # integer-exact threshold (micro-units): float `n * 0.3` differs
    # across engines at the boundary (0.3 is not a binary fraction)
    thresh = round(max_unseen_frac * 1_000_000)
    keep = scores.filter(
        (F.col("n_ngrams") > 0)
        & (F.col("n_unseen") * F.lit(1_000_000)
           <= F.col("n_ngrams") * F.lit(thresh)))
    if min_avg_logprob is not None:
        keep = keep.filter(F.col("avg_logprob") >= min_avg_logprob)
    return docs.join(keep.select(id_col), id_col, "left_semi")
