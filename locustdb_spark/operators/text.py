"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All operators are deterministic with an exact SQL oracle, and all are
map-only passes over the corpus — the ideal 100 TB shape; any
aggregation the caller adds on top (e.g. lang histograms) shuffles
only tiny derived columns. Most are pure column expressions
(JVM-side, codegen, zero-shuffle per row); the two whose expression
forms need per-shingle higher-order-function lambdas (fingerprint,
repetition_stats) additionally offer Arrow-batched numpy kernels as
the production default/option, because Catalyst evaluates HOF lambdas
interpreted per element — ~10-50x slower than one vectorized numpy
pass per batch (measured at sf1; see each docstring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spread import spread_small_scan

# marker stopwords per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "es": ["el", "los", "que", "de", "es"],
    "fr": ["le", "les", "des", "et", "est"],
    "zh": ["的", "是", "了", "在", "和"],
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish token regex: letter runs, digit runs, or single non-space symbol
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), " "), lambda t: t != "")


def _marker_count(text: Column, markers: list[str]) -> Column:
    return _marker_hits(_tokens(text), markers)


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    """Marker-hit count over a (pre-materialized) token-array column.
    The lambda must close over `arr` as a ONE-parameter function —
    a defaulted second parameter would make PySpark pass the element
    index as the second lambda argument."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def _max_occurrence(toks_col_name: str) -> Column:
    """Count of the most-frequent token in a (pre-materialized,
    named) token-array column, as int.

    PRECONDITION (r12 ADVICE): the array must contain no NULL
    elements. A null token starts a run of 1 here, while the old
    transform+filter formulation counted 0 for it (`t == d` with null
    is never true). Every current caller feeds `_tokens(...)`, whose
    filter drops nulls; a future caller with nullable elements must
    `filter(x -> x IS NOT NULL)` first or results shift by the null
    run length.

    r12 (guide §1.2 step 2): the original formulation —
    `array_max(transform(array_distinct(toks), d ->
    size(filter(toks, t == d))))` — is O(distinct × n) interpreted
    evals per document (quadratic in doc length for diverse text);
    sorting once and folding the max equal-adjacent run length is
    O(n log n) with the IDENTICAL integer result for any token
    multiset (empty array → 0 from the fold's zero accumulator; a
    NULL array makes the fold NULL, coalesced to 0 below exactly like
    the old coalesce(array_max(NULL), 0)). Measured at sf1:
    382 → 212 ms isolated, 0 mismatches; pinned bit-identical in
    tests/test_operators.py incl. the NULL/empty edge rows."""
    n = "`" + toks_col_name.replace("`", "``") + "`"
    run_max = F.expr(f"""
      aggregate(array_sort({n}),
                struct(CAST(NULL AS STRING) AS prev, 0L AS run,
                       0L AS best),
                (acc, x) -> CASE WHEN acc.prev IS NOT NULL
                                      AND x = acc.prev
                                 THEN struct(x, acc.run + 1L,
                                             greatest(acc.best,
                                                      acc.run + 1L))
                                 ELSE struct(x, 1L,
                                             greatest(acc.best, 1L))
                            END,
                acc -> acc.best)
    """)
    return F.coalesce(run_max, F.lit(0).cast("long"))


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: argmax of marker-stopword hits per
    language; ties break by language-code order; no hits -> 'und'."""
    # r12: tokenize once into a materialized column, then materialize
    # each language's marker count, before the argmax when-chain —
    # previously every reference to a score (greatest + the when
    # chain) re-ran the count INCLUDING its tokenization. Outputs
    # bit-identical (same expressions, same inputs).
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    pre = df.select(F.col(id_col),
                    _tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    langs = sorted(LANG_MARKERS.items())
    counted = pre.select(F.col(id_col), *[
        _marker_hits(toks, ms).alias(f"_s_{lang}")
        for lang, ms in langs])
    scores = [(lang, F.col(f"_s_{lang}")) for lang, _ in langs]
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # build reverse so earlier languages win ties
    for lang, score in reversed(scores):
        pred = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(pred)
    return counted.select(F.col(id_col), pred.alias("pred_lang"))


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cheap quality features + a composite score:
    token count, mean token length, stopword ratio, alpha ratio.
    score = stopword_ratio * 0.5 + min(n_tokens/256, 1) * 0.5
    (rounded for engine-portable comparison)."""
    # r12: tokenize once into a materialized column and materialize
    # the integer features before the ratio projection — previously
    # each of the ~5 references to n_tokens (and the stopword count)
    # re-ran the tokenization per row. Outputs bit-identical (same
    # expressions, same inputs; the float math is unchanged and still
    # left-to-right).
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    text = F.col(text_col)
    pre = df.select(F.col(id_col), text, _tokens(text).alias("_toks"))
    toks = F.col("_toks")
    stoparr = F.array(*[F.lit(m) for m in STOPWORDS])
    feats = pre.select(
        F.col(id_col),
        F.size(toks).alias("_n"),
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda a, t: a + F.length(t)).alias("_len_sum"),
        F.size(F.filter(toks, lambda t: F.array_contains(stoparr, t)))
        .alias("_stop"),
        F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).alias("_alpha"),
        F.length(text).alias("_chars"),
    )
    n_tokens = F.col("_n")

    def trunc6(c: Column) -> Column:
        # floor-truncate to 6 decimals: unlike round(), floor agrees
        # across engines at exact half-way values (no HALF_UP vs
        # HALF_EVEN divergence), and the inputs here are bit-identical
        # left-to-right fp computations in any engine.
        return F.floor(c * 1000000) / 1000000

    mean_tok_len = trunc6(
        F.col("_len_sum")
        / F.greatest(n_tokens, F.lit(1)).cast("double")
    )
    raw_stop_ratio = F.col("_stop") / F.greatest(
        n_tokens, F.lit(1)
    ).cast("double")
    stop_ratio = trunc6(raw_stop_ratio)
    alpha_ratio = trunc6(
        F.col("_alpha") /
        F.greatest(F.col("_chars"), F.lit(1)).cast("double")
    )
    score = trunc6(
        raw_stop_ratio * 0.5 + F.least(n_tokens / F.lit(256.0), F.lit(1.0)) * 0.5
    )
    return feats.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        score.alias("quality_score"),
    )


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(_tokens(text)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)).alias("re_tokens"),
        F.length(text).alias("n_chars"),
    )


def lexical_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """Repetition signals (Gopher-style quality rules): distinct-token
    ratio and the frequency share of the most common token. Pure
    projection with no shuffle.

    The expression form's per-row cost was O(tokens * distinct) —
    quadratic for a document of mostly-unique tokens, which made ONE
    adversarially long document an executor-stalling hot row at
    corpus scale; r12 replaced the occurrence counting with the
    O(n log n) sorted-runs fold (`_max_occurrence`, bit-identical
    integers), so both impls are now O(n log n) per row.
    ``impl="arrow"`` remains the production path: numpy
    unique-with-counts per document in one vectorized batch,
    identical outputs (integer counts + floor-truncated ratios — no
    float divergence possible; pytest-pinned on the real corpus)."""
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    def trunc6(c: Column) -> Column:
        return F.floor(c * 1000000) / 1000000

    if impl == "arrow":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<long>")
        def _counts(texts: pd.Series) -> pd.Series:
            out = []
            for t in texts:
                words = [w for w in (t or "").lower().split(" ") if w]
                if not words:
                    out.append([0, 0, 0])
                    continue
                _, cnt = np.unique(words, return_counts=True)
                out.append([len(words), len(cnt), int(cnt.max())])
            return pd.Series(out)

        c = _counts(F.col(text_col))
        out = df.select(F.col(id_col), c.alias("_c"))
        n = F.element_at("_c", 1)
        distinct_n = F.element_at("_c", 2)
        top = F.element_at("_c", 3)
        return out.select(
            F.col(id_col),
            n.alias("n_tokens"),
            trunc6(distinct_n / F.greatest(n, F.lit(1)).cast("double"))
            .alias("distinct_ratio"),
            trunc6(top / F.greatest(n, F.lit(1)).cast("double"))
            .alias("top_token_ratio"),
        )
    if impl != "expr":
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")
    # r12: token array and distinct array materialized before the
    # (algorithmically quadratic) occurrence counting — previously
    # `toks` inline in the per-distinct lambda re-ran the whole
    # tokenization per distinct element, and each of the three output
    # expressions re-derived toks/distinct from scratch. Outputs
    # bit-identical (same expressions, same inputs).
    pre = df.select(F.col(id_col),
                    _tokens(F.col(text_col)).alias("_toks"))
    pre = pre.select(F.col(id_col), F.col("_toks"),
                     F.array_distinct(F.col("_toks")).alias("_dist"))
    toks, distinct = F.col("_toks"), F.col("_dist")
    feats = pre.select(
        F.col(id_col),
        F.size(toks).alias("_n"),
        F.size(distinct).alias("_nd"),
        # r12: O(n log n) sorted-runs max-occurrence, bit-identical
        # to the old O(distinct x n) transform+filter (see
        # _max_occurrence; int cast preserves the old size() type)
        _max_occurrence("_toks").cast("int").alias("_top"),
    )
    n = F.col("_n")
    return feats.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        trunc6(F.col("_nd") / F.greatest(n, F.lit(1)).cast("double"))
        .alias("distinct_ratio"),
        trunc6(F.col("_top") / F.greatest(n, F.lit(1)).cast("double"))
        .alias("top_token_ratio"),
    )


# deliberately simple patterns every regex engine parses identically
EMAIL_REGEX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
URL_REGEX = "https?://[^ ]+"
DIGIT_RUN_REGEX = "[0-9]+"


def pattern_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document counts of email-like strings, URLs, and digit runs
    — the cheap signals PII scrubbing and boilerplate filters key on.
    Pure projection, no shuffle."""
    text = F.col(text_col)

    def cnt(pat: str) -> Column:
        return F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long")

    return df.select(
        F.col(id_col),
        cnt(EMAIL_REGEX).alias("n_emails"),
        cnt(URL_REGEX).alias("n_urls"),
        cnt(DIGIT_RUN_REGEX).alias("n_digit_runs"),
    )


def tf_idf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf with a
    *rational* idf: score = tf * N / df_term. Rankings match the
    classic tf*log(N/df) whenever only tf or only df varies, and the
    rational form avoids transcendental functions, so scores (and thus
    rankings) are bit-identical across engines — IEEE division is
    correctly rounded, libm log is not. Ties break on the term string.

    Shape at scale: explode -> two partial-aggregated shuffles (term
    frequencies, then document frequencies keyed on the term) -> one
    window shuffle on doc_id for the top-k. The corpus size N joins in
    as a broadcast scalar.
    """
    from pyspark.sql.window import Window

    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    toks = df.select(F.col(id_col),
                     F.explode(_tokens(F.col(text_col))).alias("term"))
    # tf is referenced twice (scored join + dfreq); persisting it keeps
    # the corpus to a single tokenize-and-explode pass. count(*) for N
    # stays a direct corpus count — parquet answers it from footers.
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .withColumn("score", F.col("tf") * F.col("_n") / F.col("_df"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(F.col(id_col), "term", F.col("tf").cast("long").alias("tf"),
                "score")
    )


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 256,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-width character chunks with optional
    overlap — the sequence-prep step before tokenization/packing.
    Output: (id, chunk_id, chunk_text, chunk_chars). posexplode over a
    computed offset array: pure projection + generator, no shuffle; at
    100 TB this is a map-only pass whose output row count is
    len/stride per doc."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    stride = chunk_chars - overlap
    text = F.col(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(text.isNotNull().cast("int"),
                   F.length(text) - F.lit(overlap)),
        F.lit(stride),
    )
    exploded = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_id", "_start"),
        text.alias("_t"),
    )
    chunk = F.col("_t").substr(F.col("_start"), F.lit(chunk_chars))
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        chunk.alias("chunk_text"),
        F.length(chunk).alias("chunk_chars"),
    )


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 8,
    max_tokens: int = 100_000,
    min_mean_len: int = 2,
    max_mean_len: int = 12,
    impl: str = "arrow",
) -> DataFrame:
    """Gopher-style quality-rule filter (Rae et al. 2021 heuristics
    adapted to word-level rules): token-count bounds, mean-token-length
    bounds, at-least-one-stopword, and a repetition cap (most common
    token <= half of all tokens).

    All rules are *integer* comparisons — mean length is tested as
    ``min*n <= total_len <= max*n`` instead of dividing — so the result
    is trivially bit-identical across engines. Pure projection, no
    shuffle; at 100 TB this is the map-only pre-filter pass that runs
    before any dedup shuffle touches the data.

    ``impl="arrow"`` is the production path: the expression form's
    top-token count is O(tokens * distinct) per row (an adversarially
    long unique-token document stalls its executor); the numpy kernel
    is one O(n log n) unique pass, and every output is an integer, so
    the two are bit-identical by construction (pytest-pinned).
    """
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    if impl == "arrow":
        from pyspark.sql.functions import pandas_udf

        stopset = set(STOPWORDS)

        @pandas_udf("array<long>")
        def _feats(texts: pd.Series) -> pd.Series:
            out = []
            for t in texts:
                words = [w for w in (t or "").lower().split(" ") if w]
                if not words:
                    out.append([0, 0, 0, 0])
                    continue
                _, cnt = np.unique(words, return_counts=True)
                out.append([
                    len(words),
                    sum(len(w) for w in words),
                    int(cnt.max()),
                    sum(1 for w in words if w in stopset),
                ])
            return pd.Series(out)

        f = _feats(F.col(text_col))
        pre = df.select(F.col(id_col), f.alias("_f"))
        n = F.element_at("_f", 1)
        total_len = F.element_at("_f", 2)
        top = F.element_at("_f", 3)
        stop_hits = F.element_at("_f", 4)
        ok_count = (n >= min_tokens) & (n <= max_tokens)
        ok_mean_len = (total_len >= min_mean_len * n) & \
            (total_len <= max_mean_len * n)
        ok_stopword = stop_hits >= 1
        ok_repetition = (2 * top) <= n
        return pre.select(
            F.col(id_col),
            n.alias("n_tokens"),
            ok_count.alias("ok_count"),
            ok_mean_len.alias("ok_mean_len"),
            ok_stopword.alias("ok_stopword"),
            ok_repetition.alias("ok_repetition"),
            (ok_count & ok_mean_len & ok_stopword & ok_repetition)
            .alias("passes_gopher"),
        )
    if impl != "expr":
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")
    # r12: materialize the token array, then every integer feature,
    # before fanning into the rule columns. Previously each of the ~6
    # references to n / total_len / top re-evaluated its whole
    # expression per row (no CSE across projection outputs for
    # CodegenFallback HOFs), and `toks` inline in the per-distinct
    # lambda re-ran the tokenization per element. Same expressions,
    # same inputs — outputs bit-identical.
    pre = df.select(F.col(id_col),
                    _tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks).cast("long")
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    # r12: O(n log n) sorted-runs max-occurrence, bit-identical to
    # the old O(distinct x n) transform+filter (see _max_occurrence)
    top = _max_occurrence("_toks")
    # same tokenization as _marker_count(text_col, STOPWORDS), read
    # off the materialized token array instead of re-tokenizing
    stoparr = F.array(*[F.lit(m) for m in STOPWORDS])
    stop_hits = F.size(F.filter(
        toks, lambda t: F.array_contains(stoparr, t)))
    feats = pre.select(
        F.col(id_col),
        n.alias("_n"),
        total_len.alias("_tl"),
        top.alias("_top"),
        stop_hits.alias("_sh"),
    )
    fn, ftl, ftop, fsh = (F.col("_n"), F.col("_tl"), F.col("_top"),
                          F.col("_sh"))
    ok_count = (fn >= min_tokens) & (fn <= max_tokens)
    ok_mean_len = (ftl >= min_mean_len * fn) & (ftl <= max_mean_len * fn)
    ok_stopword = fsh >= 1
    ok_repetition = (2 * ftop) <= fn
    return feats.select(
        F.col(id_col),
        fn.alias("n_tokens"),
        ok_count.alias("ok_count"),
        ok_mean_len.alias("ok_mean_len"),
        ok_stopword.alias("ok_stopword"),
        ok_repetition.alias("ok_repetition"),
        (ok_count & ok_mean_len & ok_stopword & ok_repetition)
        .alias("passes_gopher"),
    )


def _distinct_gram_arrays_arrow(text_col: str, n: int) -> Column:
    """Arrow-batched twin of the distinct word-n-gram expression used
    by contamination_check (and dedup.ngram_jaccard_pairs): identical
    gram strings, including the sequence(0, greatest(size-n, 0)) edge
    where short/empty docs yield one (possibly partial or empty)
    gram. One Python pass per Arrow batch instead of an interpreted
    HOF lambda per position."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            words = [w for w in (t or "").lower().split(" ") if w]
            k = max(len(words) - n, 0)
            g = [" ".join(words[i:i + n]) for i in range(k + 1)]
            out.append(list(dict.fromkeys(g)))
        return pd.Series(out)

    return _grams(F.col(text_col))


def _distinct_gram_arrays_expr(toks: Column, n: int) -> Column:
    """Expression form of the distinct word-n-gram array (the
    interpreted twin of `_distinct_gram_arrays_arrow`; identical gram
    strings, pytest-pinned through contamination_check parity).

    Takes the TOKEN ARRAY column, not the text column (r12): callers
    must pre-project `_tokens(...)` into a materialized column —
    HOF lambdas are CodegenFallback and interpreted eval re-computes
    non-lambda subexpressions per element, so an inline token
    expression would re-run the whole split/filter/lower tokenization
    once per gram (O(tokens^2) string work per document)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0),
                       F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def _bloom_positions(gram: str, m_bits: int, k: int) -> list[int]:
    """Python twin of the bloom-position expression below (and the
    oracle SQL): one md5 per gram, Kirsch-Mitzenmacher double hashing
    — pos_j = (h1 + j*h2) % m_bits with h1/h2 the two 56-bit halves
    of the digest (the same split minhash_signatures uses). Keep the
    three in sync."""
    import hashlib

    h = hashlib.md5(gram.encode()).hexdigest()
    h1, h2 = int(h[:14], 16), int(h[14:28], 16)
    return [(h1 + j * h2) % m_bits for j in range(k)]


def build_bloom_bitset(grams: list[str], m_bits: int = 1 << 18,
                       k: int = 4) -> list[int]:
    """Driver-side Bloom filter build over a (small) string set:
    returns the bitset as m_bits/64 signed 64-bit words, ready to
    broadcast as a literal array. Eval benchmarks are KBs-MBs by
    definition — the set that must NOT be large here is the one that
    is small by construction."""
    words = [0] * ((m_bits + 63) // 64)
    for g in grams:
        for pos in _bloom_positions(g, m_bits, k):
            words[pos >> 6] |= 1 << (pos & 63)
    # two's-complement into signed int64 range for F.lit / Spark long
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def _bloom_contains_digest(digest: Column, words: list[int],
                           m_bits: int, k: int) -> Column:
    """All k positions of an md5 hex `digest` set in the literal
    bitset (k modular position checks, k AND-masks). Takes the DIGEST,
    not the gram: the caller hashes each gram exactly once (a
    `transform` materializing the md5 array) — inside an interpreted
    HOF lambda there is no common-subexpression elimination, so
    embedding F.md5 here would recompute it per position reference."""
    # NB: these literal arrays are safe inside the per-gram lambdas —
    # ConstantFolding collapses a CreateArray of literals into one
    # array Literal even within a lambda body (verified r12), so they
    # are NOT re-built per element.
    pow2 = F.array(*[
        F.lit(v - (1 << 64) if v >= (1 << 63) else v)
        for v in (1 << b for b in range(64))
    ])
    warr = F.array(*[F.lit(int(w)) for w in words])
    h1 = F.conv(F.substring(digest, 1, 14), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 15, 14), 16, 10).cast("long")
    cond = None
    for j in range(k):
        pos = (h1 + F.lit(j) * h2) % m_bits
        word = F.element_at(warr, (pos / 64).cast("int") + 1)
        mask = F.element_at(pow2, (pos % 64).cast("int") + 1)
        bit = word.bitwiseAND(mask) != 0
        cond = bit if cond is None else (cond & bit)
    return cond


def contamination_check_bloom(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    m_bits: int | None = None,
    k: int = 4,
    impl: str = "arrow",
    bits_per_gram: int = 16,
    warn_fp: float = 0.01,
) -> DataFrame:
    """Bloom-filter decontamination — the zero-join sibling of
    :func:`contamination_check` for when even a broadcast of the raw
    eval n-gram strings is too heavy (a 10M-gram eval suite broadcasts
    ~hundreds of MB of strings to every executor; this ships
    m_bits/8 bytes, independent of eval STRING size).

    Build: the eval side's distinct n-grams are collected driver-side
    (bounded by the same "eval suites are small" contract the
    broadcast path relies on) and folded into an m_bits Bloom bitset,
    k md5-derived positions per gram. Probe: a pure per-row projection
    over the train side — each document's distinct grams are tested
    against the literal bitset; NO join, NO shuffle anywhere in the
    probe (the plan is scan -> project, same family as the quality
    filters).

    Sizing (r9 ADVICE: a fixed default saturates on large eval
    suites — at 10M grams in 2^18 bits kG/m ~ 152 and EVERY document
    flags, so the two-tier routing silently degrades to re-checking
    the whole corpus): ``m_bits=None`` (default) sizes the filter
    from the COLLECTED eval gram count G as the next power of two
    >= bits_per_gram * G. At exactly 16 bits/gram, k=4 gives
    per-gram FP (1-e^{-1/4})^4 ~ 2.4e-3; the power-of-two round-up
    lands the actual ratio in [16, 32) bits/gram, i.e. p between
    ~2.4e-3 and ~2.4e-4 (a 10M-gram suite costs <= 64 MB of bitset,
    still a constant broadcast). An explicit m_bits is honored but
    audited: if the
    per-gram FP rate p = (1 - e^{-kG/m})^k exceeds ``warn_fp``, a
    warning reports p and the auto size to use instead.

    Error is one-sided: flagged=False is exact (Bloom filters have no
    false negatives), flagged=True is contaminated-or-false-positive.
    NB the per-DOCUMENT flag probability COMPOUNDS over a document's
    g distinct grams: P(clean doc flags) = 1 - (1-p)^g — a 1000-gram
    document needs p ~ 1e-5 for a ~1% doc-level FP rate, which is why
    the audit threshold is conservative and sizing follows G, not a
    constant. Callers route flagged docs through the exact
    `contamination_check` on the (tiny) flagged subset, the classic
    two-tier layout. Every hash is the engine-portable md5
    double-hash, so the whole filter — including its false
    positives — is reproducible in the SQL oracle.

    Output: (id_col, n_flagged_ngrams, flagged) — n_flagged_ngrams
    counts the document's DISTINCT grams that hit the filter.

    ``impl="arrow"`` (default, the production probe) runs the whole
    per-document test in one Arrow batch pass with a gram->verdict
    memo (boilerplate grams repeat corpus-wide, so each distinct gram
    per batch hashes once); ``impl="expr"`` is the all-expression
    oracle recipe (one interpreted md5 + k modular lookups per gram).
    Identical gram strings and identical integer hash math, so the
    two are bit-equal (pytest-pinned).
    """
    gram_rows = (
        eval_df.select(_tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.explode(_distinct_gram_arrays_expr(F.col("_toks"), n))
            .alias("gram"))
        .distinct().collect()
    )
    n_grams = len(gram_rows)
    # next power of two >= bits_per_gram * G (floor 2^12 keeps tiny
    # eval sets from degenerate single-word bitsets)
    auto = 1 << max(12, (max(1, bits_per_gram * n_grams) - 1)
                    .bit_length())
    if m_bits is None:
        m_bits = auto
    else:
        import math

        p = (1.0 - math.exp(-k * n_grams / m_bits)) ** k
        if p > warn_fp:
            import warnings

            warnings.warn(
                f"contamination_check_bloom: m_bits={m_bits} holds "
                f"{n_grams} eval grams at a per-gram FP rate of "
                f"{p:.3g} (> {warn_fp}); per-document flag odds "
                f"compound as 1-(1-p)^grams, so the flagged subset "
                f"will not be tiny. Use m_bits=None (auto -> {auto}) "
                f"or >= {auto}.",
                stacklevel=2,
            )
    words = build_bloom_bitset([r.gram for r in gram_rows], m_bits, k)
    # r12 (guide §2.5): spread the train-side probe (the heavy pass)
    # across cores; no-op at scale.
    train_df = spread_small_scan(train_df)
    if impl == "expr":
        # one md5 per DISTINCT gram (distinct grams <-> distinct
        # digests), probed as digests — see _bloom_contains_digest.
        # The token array is pre-projected (r12, see
        # _distinct_gram_arrays_expr) and the hit count is
        # materialized once before fanning into the two output
        # columns, so the probe pass runs once per row, not once per
        # output reference.
        pre = train_df.select(
            F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
        digests = F.transform(
            _distinct_gram_arrays_expr(F.col("_toks"), n),
            lambda g: F.md5(g))
        hits_once = F.size(F.filter(
            digests,
            lambda d: _bloom_contains_digest(d, words, m_bits, k)))
        return (
            pre.select(F.col(id_col), hits_once.alias("_hits"))
            .select(
                F.col(id_col),
                F.col("_hits").cast("long").alias("n_flagged_ngrams"),
                (F.col("_hits") > 0).alias("flagged"),
            )
        )
    elif impl == "arrow":
        from pyspark.sql.functions import pandas_udf

        uwords = [w + (1 << 64) if w < 0 else w for w in words]

        @pandas_udf("long")
        def _hits(texts: pd.Series) -> pd.Series:
            memo: dict[str, bool] = {}
            out = []
            for t in texts:
                ws = [w for w in (t or "").lower().split(" ") if w]
                kk = max(len(ws) - n, 0)
                gs = dict.fromkeys(
                    " ".join(ws[i:i + n]) for i in range(kk + 1))
                c = 0
                for g in gs:
                    v = memo.get(g)
                    if v is None:
                        v = all(
                            uwords[p >> 6] >> (p & 63) & 1
                            for p in _bloom_positions(g, m_bits, k))
                        memo[g] = v
                    c += v
                out.append(c)
            return pd.Series(out)

        hits = _hits(F.col(text_col))
    else:
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")
    return train_df.select(
        F.col(id_col),
        hits.cast("long").alias("n_flagged_ngrams"),
        (hits > 0).alias("flagged"),
    )


def contamination_check(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with an evaluation set.

    Scale shape: the eval side (benchmark suites — KBs to MBs) is
    exploded to a distinct n-gram set and **broadcast**; the 100 TB
    train side streams through a map-side hash join, so the only
    shuffle is the per-doc match count over the (tiny) joined subset.
    N-grams are matched as raw strings here for oracle exactness; at
    scale hash them (xxhash64) to shrink the broadcast table.
    ``impl="arrow"`` swaps the interpreted-HOF gram expansion for an
    Arrow kernel producing identical gram strings (pytest-pinned).
    """
    if impl not in ("expr", "arrow"):
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")

    def grams(d: DataFrame, *extra: str) -> DataFrame:
        if impl == "arrow":
            return d.select(
                *extra,
                F.explode(_distinct_gram_arrays_arrow(text_col, n))
                .alias("gram"))
        # expr: token array pre-projected once per row (r12, see
        # _distinct_gram_arrays_expr)
        pre = d.select(*extra, _tokens(F.col(text_col)).alias("_toks"))
        return pre.select(
            *extra,
            F.explode(_distinct_gram_arrays_expr(F.col("_toks"), n))
            .alias("gram"))

    ev = grams(eval_df).distinct()
    # r12 (guide §2.5): spread the train-side gram expansion (the
    # heavy pass) across cores; no-op at scale.
    tr = grams(spread_small_scan(train_df), id_col)
    matched = (
        tr.join(F.broadcast(ev), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    return (
        train_df.select(id_col)
        .join(matched, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_m"), F.lit(0)).cast("long")
            .alias("n_matched_ngrams"),
            (F.coalesce(F.col("_m"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    hash_fn: str = "rolling",
) -> DataFrame:
    """Winnowing-style fingerprint: the minimum hash over all
    `window`-char shingles of the lowercased text, plus the full-text
    md5. Near-identical docs share the min-shingle fingerprint with
    high probability; identical docs share content_md5.

    **VALUE-COMPATIBILITY BREAK (r5)**: the default ``hash_fn``
    changed ``"md5"`` -> ``"rolling"``. The hash families produce
    DIFFERENT fingerprint values — only cluster equivalence (which
    docs share a fingerprint) is preserved across them. If you join
    new output against fingerprints persisted before the change (or
    by any caller still passing ``hash_fn="md5"``), pass the SAME
    ``hash_fn`` explicitly on both sides; default-vs-default across
    the version boundary will silently match nothing.

    ``hash_fn``:
    - ``"rolling"`` (default, the production path): an Arrow-batched
      numpy polynomial hash — 8 vectorized ops per document instead
      of one interpreted expression per shingle. The expression
      variants below run ~10x slower at scale because Catalyst
      evaluates higher-order-function lambdas interpreted, per
      element, outside whole-stage codegen (measured at sf1: 49-57 s
      vs 5 s for 50k documents).
    - ``"xxhash64"``: Spark's native 64-bit hash per shingle — pure
      JVM expression, no Python, when an Arrow round-trip is
      undesirable.
    - ``"md5"``: 60-bit prefix of the md5 digest via conv(16,10) —
      bit-reproducible in any engine with md5, which is what the
      DuckDB value-hash oracle entry uses.
    All variants give the same clustering behavior for exact
    duplicates (docs sharing all shingles share the fingerprint);
    only the hash values differ."""
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    if hash_fn == "rolling":
        from pyspark.sql.functions import pandas_udf

        prime = np.uint64(1099511628211)  # FNV-1a prime

        @pandas_udf("long")
        def _roll_min(texts: pd.Series) -> pd.Series:
            # r7: fully vectorized — ONE flat byte buffer + offsets
            # per Arrow batch (the gram-kernel pattern) instead of a
            # per-document Python loop: `window` polynomial passes
            # over the whole batch, cross-document shingles masked to
            # u64-max, per-document mins via minimum.reduceat. The
            # only remaining per-row Python is the unavoidable
            # str.lower().encode().
            w = window
            if len(texts) == 0:
                return pd.Series(np.empty(0, dtype=np.int64))
            # zero-pad short docs to w bytes — matches the expression
            # paths' short-text floor (and the pre-r7 loop kernel)
            blobs = [
                (t or "").lower().encode("utf-8", "surrogatepass")
                .ljust(w, b"\0")
                for t in texts
            ]
            lens = np.fromiter((len(b) for b in blobs),
                               dtype=np.int64, count=len(blobs))
            starts = np.zeros(len(blobs), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            n = len(buf)
            acc = np.zeros(n - w + 1, dtype=np.uint64)
            for j in range(w):
                acc = acc * prime + buf[j:n - w + 1 + j]
            # shingles whose window crosses a document boundary are
            # garbage: doc i's valid starts are
            # [starts[i], starts[i] + lens[i] - w]; mask the rest via
            # a +1/-1 diff array so the cost stays O(batch), not
            # O(docs * window)
            inv_from = np.minimum(starts + lens - w + 1, len(acc))
            inv_to = np.minimum(starts + lens, len(acc))
            diff = np.zeros(len(acc) + 1, dtype=np.int64)
            np.add.at(diff, inv_from, 1)
            np.add.at(diff, inv_to, -1)
            acc[np.cumsum(diff[:-1]) > 0] = np.uint64(
                0xFFFFFFFFFFFFFFFF)
            mins = np.minimum.reduceat(acc, starts)
            return pd.Series(mins.astype(np.int64))

        return df.select(
            F.col(id_col),
            _roll_min(F.col(text_col)).alias("fingerprint"),
            F.md5(F.col(text_col)).alias("content_md5"),
        )
    # Hoist lower(text) into a materialized column before the shingle
    # transform (r12, same fix as minhash_signatures): HOF lambdas are
    # CodegenFallback and interpreted eval re-computes non-lambda
    # subexpressions per element, so the inline form re-lowercased the
    # whole document once PER SHINGLE — O(len^2) chars/doc. Values
    # bit-identical (same expressions, same inputs); content_md5 still
    # hashes the RAW text, carried through the same projection.
    df = df.select(F.col(id_col), F.col(text_col),
                   F.lower(F.col(text_col)).alias("_fp_text"))
    text = F.col("_fp_text")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - (window - 1), F.lit(1))),
        lambda i: text.substr(i, F.lit(window)),
    )
    if hash_fn == "xxhash64":
        hashed = F.transform(sh, lambda s: F.xxhash64(s))
    elif hash_fn == "md5":
        hashed = F.transform(
            sh,
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    else:
        raise ValueError(
            f"hash_fn must be 'rolling', 'md5' or 'xxhash64', got {hash_fn!r}")
    return df.select(
        F.col(id_col),
        F.array_min(hashed).alias("fingerprint"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )


def linear_classifier_score(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """fastText-style linear quality-classifier scoring (the
    hashed-bag-of-words averaged linear model behind CCNet/GPT-3-era
    quality filtering, Joulin et al. 2016): each token hashes into a
    `len(weights)`-bucket feature table (the engine-portable 60-bit
    md5 hash), the document feature is the MEAN of its tokens' bucket
    weights, and logit = bias + mean. Returns one row per document:
    (id_col, n_tokens, logit, label) with label = logit >= threshold;
    empty documents score the bias alone. The logit is
    floor-truncated to 6 decimals (same rationale as quality_score's
    trunc6), and every accumulation is a LEFT-TO-RIGHT double fold,
    so the score is bit-reproducible across engines — production
    models drop in as the `weights` list (a real fastText model is
    exactly this after quantization: hashed unigram bucket weights +
    a linear layer).

    Scale shape: pure projection against a broadcast literal weight
    table — zero shuffles, embarrassingly parallel at any corpus
    size. ``impl="arrow"`` (default) folds each batch in Python
    (identical IEEE double order); ``impl="expr"`` is the
    all-expression oracle recipe (interpreted per token).
    """
    from .dedup import portable_hash64

    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    dims = len(weights)
    text = F.col(text_col)
    # raw (case-preserving) tokens — NOT _tokens(), which lowercases:
    # the Arrow fold and the SQL oracle hash the raw token, and a
    # review pass caught the expr path silently lowercasing first
    # (invisible on the all-lowercase synthetic corpus, a flipped
    # bucket on any real one)
    toks = F.filter(F.split(text, " "), lambda t: t != "")
    n_tokens = F.size(toks)

    def trunc6(c: Column) -> Column:
        return F.floor(c * 1000000) / 1000000

    if impl == "expr":
        w_arr = F.array(*[F.lit(float(w)) for w in weights])
        feat_sum = F.aggregate(
            toks,
            F.lit(0.0),
            lambda a, t: a + F.element_at(
                w_arr, (portable_hash64(t) % dims + 1).cast("int"),
            ),
        )
        logit = trunc6(
            (F.lit(float(bias))
             + feat_sum / F.greatest(n_tokens, F.lit(1)).cast("double"))
        )
        scored = df.select(
            F.col(id_col),
            n_tokens.cast("long").alias("n_tokens"),
            logit.alias("logit"),
        )
    elif impl == "arrow":
        import hashlib
        import math

        from pyspark.sql.functions import pandas_udf

        wts = [float(w) for w in weights]
        b = float(bias)

        @pandas_udf("double")
        def _logit(texts: pd.Series) -> pd.Series:
            # per-batch token->weight memo: web text repeats tokens
            # heavily, so hashing each DISTINCT token once per Arrow
            # batch (instead of every occurrence) cuts the md5 work
            # 5-20x; the value added to the fold is identical, and the
            # left-to-right order is unchanged, so output bits are too
            memo: dict[str, float] = {}
            out = []
            for t in texts:
                ws = [w for w in (t or "").split(" ") if w]
                acc = 0.0  # left-to-right, same order as the fold
                for w in ws:
                    wv = memo.get(w)
                    if wv is None:
                        # Python twin of dedup.portable_hash64 (60-bit
                        # md5 prefix) — keep the two in sync
                        h = int(
                            hashlib.md5(w.encode()).hexdigest()[:15],
                            16)
                        wv = wts[h % dims]
                        memo[w] = wv
                    acc = acc + wv
                v = b + acc / max(len(ws), 1)
                out.append(math.floor(v * 1000000) / 1000000)
            return pd.Series(out)

        scored = df.select(
            F.col(id_col),
            n_tokens.cast("long").alias("n_tokens"),
            _logit(text).alias("logit"),
        )
    else:
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")
    return scored.withColumn(
        "label", F.col("logit") >= F.lit(float(threshold)))


LONG_DIGIT_RUN_REGEX = "[0-9]{6,}"  # phone/account/ssn-shaped runs


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing: replace email addresses, URLs, and long digit
    runs with typed placeholder tokens, and report per-pattern match
    counts (from the original text). Pure projection — regexp work is
    JVM-side and runs next to the scan, so a 100 TB corpus is scrubbed
    with zero shuffles. Replacement order (emails, then URLs, then
    digit runs) is fixed so results are engine-portable."""
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    text = F.col(text_col)

    def cnt(pat: str) -> Column:
        return F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long")

    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_REGEX, "<EMAIL>"),
            URL_REGEX, "<URL>"),
        LONG_DIGIT_RUN_REGEX, "<NUM>")
    return df.select(
        F.col(id_col),
        cnt(EMAIL_REGEX).alias("n_emails"),
        cnt(URL_REGEX).alias("n_urls"),
        cnt(LONG_DIGIT_RUN_REGEX).alias("n_long_digit_runs"),
        redacted.alias("redacted_text"),
    )


def boilerplate_fraction(
    df: DataFrame,
    chunk_chars: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus boilerplate signal: chunk every document into
    fixed windows, hash each chunk, and report per document what
    fraction of its chunks also occur in OTHER documents (headers,
    footers, nav bars, license blocks).

    Shape at scale: chunking is a map-only generator; only 16-byte
    chunk hashes shuffle (two partial-agg passes: hash -> distinct doc
    count, then per-doc rollup). The corpus text crosses no shuffle.
    Output: (id, n_chunks, n_shared_chunks, shared_fraction).
    """
    chunks = chunk_documents(
        df, chunk_chars=chunk_chars, overlap=0,
        text_col=text_col, id_col=id_col)
    hashed = chunks.select(
        F.col(id_col), F.md5("chunk_text").alias("_h")).distinct()
    docs_per_hash = hashed.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_docs"))
    return (
        hashed.join(docs_per_hash, "_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("_docs") > 1).cast("long"))
            .alias("n_shared_chunks"),
        )
        .select(
            id_col,
            "n_chunks",
            "n_shared_chunks",
            (F.floor(F.col("n_shared_chunks") / F.col("n_chunks")
                     * 1000000) / 1000000).alias("shared_fraction"),
        )
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    max_dup_fraction_pct: int = 20,
    hash_ngrams: bool = False,
    impl: str = "arrow",
) -> DataFrame:
    """Duplicate word-n-gram repetition statistics per document (the
    Gopher / FineWeb "repetition removal" heuristic family, Rae et al.
    2021 §A1.1: documents whose content loops are low-quality even when
    every individual token looks fine).

    Output: (id, n_ngrams, n_distinct, n_dup, keep) where
    n_dup = n_ngrams - n_distinct and keep applies the threshold as an
    integer cross-multiplication (``n_dup * 100 <= pct * n_ngrams``) —
    no float division, so results are bit-identical in any engine.

    ``hash_ngrams=True`` is the production fast path: instead of
    materializing each n-gram as a concat_ws string and distinct-ing
    strings, it distincts the multi-argument xxhash64 of the n tokens
    (no string allocation at all). Counts match the exact path unless
    two distinct in-document n-grams collide in 64 bits (~1e-13 for a
    10k-n-gram document) — use the default exact path where an
    independent engine must reproduce the numbers bit-for-bit.

    ``impl="arrow"`` (the DEFAULT since r6) is the production path at
    scale: an Arrow-batched
    numpy kernel that maps tokens to vocabulary ids and distincts
    packed id-triples — EXACT (no hash collisions at all) and ~50x
    faster than the expression paths, whose higher-order-function
    lambdas Catalyst evaluates interpreted per element (measured at
    sf1: 132 s expr vs ~3 s arrow for 50k documents).
    ``impl="expr"`` is the variant an independent SQL engine can
    replay for the value-hash oracle; both agree bit-for-bit and both
    sit under the driver's oracle gate (`text_repetition[_arrow]`),
    so the choice is purely a speed knob.

    Pure projection over the scan (array expressions / one Arrow
    round-trip): at 100 TB this runs in the same map-only pre-filter
    pass as the other quality rules, before anything shuffles.
    """
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores before the compute-heavy projection (no-op at scale and on
    # streaming inputs — see spread_small_scan).
    df = spread_small_scan(df)
    if impl == "arrow":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<long>")
        def _counts(texts: pd.Series) -> pd.Series:
            n_all = np.zeros(len(texts), dtype=np.int64)
            n_dis = np.zeros(len(texts), dtype=np.int64)
            for i, t in enumerate(texts):
                words = [w for w in (t or "").lower().split(" ") if w]
                if len(words) < ngram:
                    continue
                vocab: dict = {}
                ids = np.fromiter(
                    (vocab.setdefault(w, len(vocab)) for w in words),
                    dtype=np.int64, count=len(words))
                v = len(vocab) + 1
                n = len(ids) - (ngram - 1)
                if v ** ngram < 2 ** 63:  # packed ids fit in int64
                    packed = ids[:n].copy()
                    for j in range(1, ngram):
                        packed *= v
                        packed += ids[j:n + j]
                    n_all[i] = n
                    n_dis[i] = len(np.unique(packed))
                else:  # gigantic vocab: exact tuple fallback
                    grams = {tuple(words[k:k + ngram])
                             for k in range(n)}
                    n_all[i] = n
                    n_dis[i] = len(grams)
            return pd.Series(np.stack([n_all, n_dis], axis=1).tolist())

        out = df.select(F.col(id_col),
                        _counts(F.col(text_col)).alias("_c"))
        n_ngrams = F.element_at("_c", 1)
        n_distinct = F.element_at("_c", 2)
        return out.select(
            F.col(id_col),
            n_ngrams.alias("n_ngrams"),
            n_distinct.alias("n_distinct"),
            (n_ngrams - n_distinct).alias("n_dup"),
            ((n_ngrams - n_distinct) * 100
             <= F.lit(max_dup_fraction_pct) * n_ngrams).alias("keep"),
        )
    if impl != "expr":
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")
    # r12: materialize the token array, then the gram array, then the
    # two counts, before fanning into the output columns. Previously
    # `toks` inline in the per-position lambda re-ran the whole
    # tokenization for each of the ngram element_at calls PER GRAM,
    # and each of the five output expressions re-expanded the whole
    # gram array (n_ngrams alone was re-derived four times). Outputs
    # bit-identical (same expressions, same inputs).
    pre = df.select(F.col(id_col),
                    _tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    n_toks = F.size(toks)
    if hash_ngrams:
        grams = F.when(n_toks >= ngram, F.transform(
            F.sequence(F.lit(0), n_toks - ngram),
            lambda i: F.xxhash64(
                *[F.element_at(toks, i + j + 1) for j in range(ngram)]),
        )).otherwise(F.array().cast("array<bigint>"))
    else:
        grams = F.when(n_toks >= ngram, F.transform(
            F.sequence(F.lit(0), n_toks - ngram),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(ngram)]),
        )).otherwise(F.array().cast("array<string>"))
    counted = pre.select(F.col(id_col), grams.alias("_grams")).select(
        F.col(id_col),
        F.size("_grams").cast("long").alias("_n"),
        F.size(F.array_distinct("_grams")).cast("long").alias("_nd"),
    )
    n_ngrams, n_distinct = F.col("_n"), F.col("_nd")
    return counted.select(
        F.col(id_col),
        n_ngrams.alias("n_ngrams"),
        n_distinct.alias("n_distinct"),
        (n_ngrams - n_distinct).alias("n_dup"),
        ((n_ngrams - n_distinct) * 100
         <= F.lit(max_dup_fraction_pct) * n_ngrams).alias("keep"),
    )
