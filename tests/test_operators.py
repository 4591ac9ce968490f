"""Unit tests for the LLM-pipeline operators (dedup / similarity /
text / multimodal) against the sf0.001 testdata, with known-value
checks computed independently in Python."""

import hashlib

import pytest
from pyspark.sql import functions as F

from conftest import TESTDATA_SF


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA_SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet")


def _py_hash64(s: str, seed: int | None = None) -> int:
    if seed is not None:
        s = f"{s}#{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_exact_duplicates(docs):
    from locustdb_spark.operators.dedup import exact_duplicates

    out = exact_duplicates(docs).collect()
    assert len(out) == docs.count()  # no dups in synthetic corpus
    row = next(r for r in out if r.keep_id == 0)
    text0 = docs.filter(F.col("doc_id") == 0).head().text
    assert row.content_hash == hashlib.md5(text0.encode()).hexdigest()
    assert row.dup_count == 1


def test_minhash_matches_python(docs, spark):
    from locustdb_spark.operators.dedup import minhash_signatures

    row = (
        minhash_signatures(docs, num_hashes=2)
        .filter(F.col("doc_id") == 0).head()
    )
    text = docs.filter(F.col("doc_id") == 0).head().text.lower()
    shingles = [text[i:i + 5] for i in range(max(len(text) - 4, 1))]

    # double hashing over one md5 per shingle (see minhash_signatures)
    def lane(s: str, j: int) -> int:
        h = hashlib.md5(s.encode()).hexdigest()
        h1, h2 = int(h[:14], 16), int(h[14:28], 16)
        return (h1 + j * h2) & ((1 << 56) - 1)

    for j in (0, 1):
        expected = min(lane(s, j) for s in shingles)
        assert row[f"mh{j}"] == expected


def test_minhash_grouped_batch_form_bit_equal_to_projection(spark):
    """r13 path split: the exploded+groupBy BATCH form must be
    bit-identical to the zero-shuffle projection form (the streaming
    path) on every lane, for both hash_fns, including the edge rows
    the two forms could plausibly diverge on — NULL text (md5 lanes
    NULL; xxhash64 lanes the hash exprs' null-skipping values), empty
    text, text shorter than the shingle, exact duplicates, long text,
    and non-ASCII."""
    from locustdb_spark.operators.dedup import (
        _minhash_signatures_projection, minhash_signatures)

    rows = [(0, "hello world, a small document"),
            (1, ""), (2, None), (3, "ab"),
            (4, "hello world, a small document"),
            (5, "x" * 300), (6, "unicode éÉ 中文")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for hf in ("md5", "xxhash64"):
        g = sorted(map(tuple, minhash_signatures(
            d, num_hashes=6, hash_fn=hf).collect()))
        p = sorted(map(tuple, _minhash_signatures_projection(
            d, "text", "doc_id", 6, 5, True, hf, None).collect()))
        assert g == p, hf
    g = sorted(map(tuple, minhash_signatures(
        d, num_hashes=3, lowercase=False, hash_fn="xxhash64",
        keep_cols=["text"]).collect()))
    p = sorted(map(tuple, _minhash_signatures_projection(
        d, "text", "doc_id", 3, 5, False, "xxhash64",
        ["text"]).collect()))
    assert g == p


def test_minhash_keep_cols_carries_attributes(docs):
    """keep_cols threads blocking attributes through the signature
    projection (one map pass, no corpus join-back); lanes unchanged."""
    from locustdb_spark.operators.dedup import minhash_signatures

    base = {r.doc_id: (r.mh0, r.mh1)
            for r in minhash_signatures(docs, num_hashes=2).collect()}
    kept = minhash_signatures(docs, num_hashes=2,
                              keep_cols=["n_chars", "lang"])
    assert set(kept.columns) == {"doc_id", "n_chars", "lang",
                                 "mh0", "mh1"}
    src = {r.doc_id: (r.n_chars, r.lang)
           for r in docs.select("doc_id", "n_chars", "lang").collect()}
    for r in kept.collect():
        assert (r.mh0, r.mh1) == base[r.doc_id]
        assert (r.n_chars, r.lang) == src[r.doc_id]


def test_lsh_pairs_symmetric_and_ordered(docs):
    from locustdb_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures)

    sigs = minhash_signatures(docs, num_hashes=4)
    pairs = lsh_candidate_pairs(sigs, num_hashes=4, bands=2).collect()
    assert all(p.id_a < p.id_b for p in pairs)
    assert len({(p.id_a, p.id_b) for p in pairs}) == len(pairs)


def test_dedup_clusters_components(docs, spark):
    """Chain 1-2-3, clique 10-11-12, singleton 20: every node gets the
    component-min cluster_id and exactly one is_keep per cluster."""
    from locustdb_spark.operators.dedup import dedup_clusters

    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 12, 20)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (11, 12)],
        "id_a long, id_b long")
    out = {r.doc_id: r for r in dedup_clusters(nodes, pairs).collect()}
    assert {i: out[i].cluster_id for i in out} == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20}
    assert {i for i in out if out[i].is_keep} == {1, 10, 20}


def test_dedup_clusters_long_chain(spark):
    """A 64-node path graph converges within the iteration budget
    (pointer jumping makes rounds O(log n), not O(diameter))."""
    from locustdb_spark.operators.dedup import dedup_clusters

    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    out = dedup_clusters(nodes, pairs, max_iterations=10).collect()
    assert all(r.cluster_id == 0 for r in out)
    assert sum(r.is_keep for r in out) == 1


def test_hash_sample_deterministic_and_partition_invariant(docs):
    from locustdb_spark.operators.sampling import hash_sample

    a = {r.doc_id for r in hash_sample(docs, 0.2).select("doc_id").collect()}
    b = {r.doc_id for r in
         hash_sample(docs.repartition(7), 0.2).select("doc_id").collect()}
    assert a == b and 0 < len(a) < docs.count()
    # independent draw under a different salt
    c = {r.doc_id for r in
         hash_sample(docs, 0.2, salt="other").select("doc_id").collect()}
    assert c != a


def test_stratified_sample_exact_per_stratum(docs):
    from locustdb_spark.operators.sampling import stratified_sample

    out = stratified_sample(docs, "lang", 5).groupBy("lang").count().collect()
    full = dict(docs.groupBy("lang").count().collect())
    for r in out:
        assert r["count"] == min(5, full[r.lang])


def test_train_val_test_split_stable_under_append(docs, spark):
    """Rows keep their split when the corpus grows — the property that
    keeps eval sets stable."""
    from locustdb_spark.operators.sampling import train_val_test_split

    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_split = {r.doc_id: r.split
                  for r in train_val_test_split(docs).collect()}
    half_split = {r.doc_id: r.split
                  for r in train_val_test_split(half).collect()}
    assert all(full_split[i] == s for i, s in half_split.items())
    assert set(full_split.values()) <= {"train", "val", "test"}
    n = len(full_split)
    train_frac = sum(s == "train" for s in full_split.values()) / n
    assert 0.8 < train_frac < 0.98


def test_simhash_bits_deterministic(docs):
    from locustdb_spark.operators.dedup import simhash

    out = simhash(docs, bits=8).limit(5).collect()
    for r in out:
        assert 0 <= r.simhash < 256


def test_ngram_jaccard_self_pair(docs, spark):
    """A document paired with itself must have jaccard 1.0."""
    from locustdb_spark.operators.dedup import ngram_jaccard_pairs

    pairs = spark.createDataFrame([(0, 0)], "id_a long, id_b long")
    out = ngram_jaccard_pairs(docs, pairs).collect()
    assert len(out) == 1 and out[0].jaccard == 1.0


def test_cosine_topk_self_first(emb):
    from locustdb_spark.operators.similarity import cosine_topk

    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    top = cosine_topk(emb, q, k=3).collect()
    assert top[0].vec_id == 0 and top[0].cosine_sim == 1.0
    sims = [r.cosine_sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_ann_lsh_contains_self(emb):
    from locustdb_spark.operators.similarity import ann_lsh_topk

    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    top = ann_lsh_topk(emb, q, k=5, num_planes=4).collect()
    assert top[0].vec_id == 0


def test_hyperplane_buckets_range(emb):
    from locustdb_spark.operators.similarity import hyperplane_buckets

    out = hyperplane_buckets(emb, num_planes=4)
    assert out.filter((F.col("bucket") < 0) | (F.col("bucket") > 15)).count() == 0


def test_embedding_near_dup_matches_python(emb):
    import math

    from locustdb_spark.operators.dedup import embedding_near_dup

    out = embedding_near_dup(emb, threshold=0.1, num_planes=4).collect()
    assert len(out) > 0
    assert all(r.id_a < r.id_b and r.cosine_sim >= 0.1 for r in out)

    # exact cosine for one emitted pair, recomputed in Python
    pair = out[0]
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.filter(
            F.col("vec_id").isin([pair.id_a, pair.id_b])).collect()
    }
    a, b = vecs[pair.id_a], vecs[pair.id_b]
    dot = sum(x * y for x, y in zip(a, b))
    cos = dot / (math.sqrt(sum(x * x for x in a))
                 * math.sqrt(sum(y * y for y in b)))
    assert abs(pair.cosine_sim - cos) < 1e-5

    # every emitted pair shares an LSH bucket
    from locustdb_spark.operators.similarity import hyperplane_buckets

    buckets = {r.vec_id: r.bucket
               for r in hyperplane_buckets(emb, num_planes=4).collect()}
    assert all(buckets[r.id_a] == buckets[r.id_b] for r in out)


def test_language_id_schema_and_domain(docs):
    from locustdb_spark.operators.text import LANG_MARKERS, language_id

    out = language_id(docs)
    langs = {r.pred_lang for r in out.select("pred_lang").distinct().collect()}
    assert langs <= set(LANG_MARKERS) | {"und"}


def test_quality_score_bounds(docs):
    from locustdb_spark.operators.text import quality_score

    out = quality_score(docs)
    bad = out.filter(
        (F.col("quality_score") < 0) | (F.col("quality_score") > 1)
        | (F.col("stopword_ratio") < 0) | (F.col("stopword_ratio") > 1)
    ).count()
    assert bad == 0


def test_token_counts_consistency(docs):
    from locustdb_spark.operators.text import token_counts

    row = token_counts(docs).filter(F.col("doc_id") == 1).head()
    text = docs.filter(F.col("doc_id") == 1).head().text
    assert row.ws_tokens == len([t for t in text.lower().split(" ") if t])
    assert row.n_chars == len(text)


def test_approx_distinct_close_to_exact(spark):
    """HLL estimate within the configured rsd of the exact count."""
    import __spark_entry__ as entry
    from conftest import TESTDATA_SF
    import os

    sf_dir = os.path.dirname(f"{TESTDATA_SF}/x") or TESTDATA_SF
    approx = {r.event_type: r.approx_users
              for r in entry.x_approx_distinct(spark, TESTDATA_SF).collect()}
    ev = spark.read.parquet(f"{TESTDATA_SF}/events.parquet")
    exact = {r.event_type: r.exact for r in
             ev.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("exact")).collect()}
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.1 * exact[k])


def test_asof_join_known_values(spark):
    from locustdb_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 20), (2, 150, 30), (3, 100, 40)],
        "user_id long, ts long, event_id long")
    right = spark.createDataFrame(
        [(1, 100, 7), (1, 150, 8), (2, 200, 9)],
        "user_id long, ts long, event_id long")
    out = {r.event_id: r for r in
           asof_join(left, right, on="ts", by="user_id",
                     right_cols=("event_id",)).collect()}
    assert out[10].event_id_r == 7      # tie at ts=100 matches
    assert out[10].ts_r == 100
    assert out[20].event_id_r == 8      # most recent prior (150), not 100
    assert out[30].event_id_r is None   # right row is later (200 > 150)
    assert out[40].event_id_r is None   # no right rows for user 3


def test_range_join_known_values(spark):
    from locustdb_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, 50), (1, 150), (1, 250), (2, 150)], "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 100, 200, 77), (2, 0, 1000, 88)],
        "user_id long, start long, end long, iid long")
    out = range_join(left, right, by="user_id",
                     bucket_width=64).collect()
    got = sorted((r.ts, r.iid) for r in out)
    assert got == [(150, 77), (150, 88)]  # boundaries inclusive-checked below
    # inclusive boundaries
    edge = range_join(
        spark.createDataFrame([(1, 100), (1, 200)], "user_id long, ts long"),
        right, by="user_id", bucket_width=64).collect()
    assert sorted(r.ts for r in edge) == [100, 200]


def test_range_join_no_duplicate_matches(spark):
    """An interval spanning many buckets still matches a row once."""
    from locustdb_spark.operators.temporal import range_join

    left = spark.createDataFrame([(5,)], "ts long")
    right = spark.createDataFrame([(0, 10_000, 1)], "start long, end long, iid long")
    out = range_join(left, right, bucket_width=10).collect()
    assert len(out) == 1


def test_asof_join_tolerance(spark):
    from locustdb_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 500, 1)],
                                 "user_id long, ts long, event_id long")
    right = spark.createDataFrame([(1, 100, 7)],
                                  "user_id long, ts long, event_id long")
    with_tol = asof_join(left, right, right_cols=("event_id",),
                         tolerance=100).head()
    without = asof_join(left, right, right_cols=("event_id",)).head()
    assert without.event_id_r == 7
    assert with_tol.event_id_r is None  # 500-100 > tolerance


def test_pack_sequences_fills_bins(spark):
    from locustdb_spark.operators.sampling import pack_sequences

    d = spark.createDataFrame(
        [(i, "en", 100) for i in range(10)],
        "doc_id long, lang string, n_chars long")
    out = pack_sequences(d, budget=300, group_col="lang").collect()
    sizes = {}
    for r in out:
        sizes.setdefault(r.bin_id, 0)
        sizes[r.bin_id] += r.n_chars
    # 10 docs x 100 chars / 300 budget -> bins 0..3, first three full
    assert sorted(sizes) == [0, 1, 2, 3]
    assert [sizes[b] for b in sorted(sizes)] == [300, 300, 300, 100]
    # bins must equal floor(running_size_before/budget) under the
    # operator's own deterministic hash order
    sizes_by_id = {1: 5000, 2: 10, 3: 200}
    big = spark.createDataFrame(
        [(i, "en", s) for i, s in sizes_by_id.items()],
        "doc_id long, lang string, n_chars long")
    outs = {r.doc_id: r.bin_id for r in
            pack_sequences(big, budget=300, group_col="lang").collect()}
    order = sorted(sizes_by_id, key=lambda i: (_py_hash64(f"{i}|pack"), i))
    run = 0
    for i in order:
        assert outs[i] == run // 300, (i, order, outs)
        run += sizes_by_id[i]


def test_tf_idf_top_terms_known_values(spark):
    """'unique' appears only in doc 1 -> highest score there; 'the'
    appears everywhere -> lowest idf."""
    from locustdb_spark.operators.text import tf_idf_top_terms

    d = spark.createDataFrame(
        [(1, "the unique term the"), (2, "the common the"), (3, "the x")],
        "doc_id long, text string")
    out = tf_idf_top_terms(d, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    top1 = sorted(by_doc[1], key=lambda r: (-r.score, r.term))
    # doc1: 'the' tf=2 df=3 -> 2*3/3=2.0; 'term'/'unique' tf=1 df=1 -> 3.0
    assert top1[0].term in ("term", "unique") and top1[0].score == 3.0
    assert all(len(v) == 2 for v in by_doc.values())


def test_chunk_documents_known_values(spark):
    from locustdb_spark.operators.text import chunk_documents

    d = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    out = sorted(chunk_documents(d, chunk_chars=4, overlap=1).collect(),
                 key=lambda r: r.chunk_id)
    assert [(r.chunk_id, r.chunk_text) for r in out] == [
        (0, "abcd"), (1, "defg"), (2, "ghij")]
    # short doc -> one whole-doc chunk
    short = chunk_documents(
        spark.createDataFrame([(2, "xy")], "doc_id long, text string"),
        chunk_chars=4, overlap=1).collect()
    assert len(short) == 1 and short[0].chunk_text == "xy"
    # overlap reconstructs the doc: stride chars of each chunk + tail
    joined = "".join(r.chunk_text[:3] for r in out[:-1]) + out[-1].chunk_text
    assert joined == "abcdefghij"


def test_incremental_dedup(spark):
    from locustdb_spark.operators.dedup import incremental_dedup

    existing = spark.createDataFrame(
        [(1, "seen")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "seen"), (11, "fresh"), (12, "fresh"), (13, "other")],
        "doc_id long, text string")
    out = sorted(r.doc_id for r in incremental_dedup(new, existing).collect())
    # 10 dropped (in corpus); 12 dropped (11 is the first 'fresh')
    assert out == [11, 13]


def test_lexical_diversity_known_values(docs, spark):
    from locustdb_spark.operators.text import lexical_diversity

    d = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z"), (3, "")], "doc_id long, text string")
    out = {r.doc_id: r for r in lexical_diversity(d).collect()}
    assert out[1].n_tokens == 5
    assert out[1].distinct_ratio == 0.4       # 2 distinct / 5
    assert out[1].top_token_ratio == 0.6      # 'a' appears 3/5
    assert out[2].distinct_ratio == 1.0 and out[2].top_token_ratio > 0
    assert out[3].n_tokens == 0 and out[3].top_token_ratio == 0.0


def test_pattern_counts_known_values(docs, spark):
    from locustdb_spark.operators.text import pattern_counts

    d = spark.createDataFrame(
        [(1, "mail me at bob@example.com or visit https://x.io/a 42 7")],
        "doc_id long, text string")
    r = pattern_counts(d).head()
    assert (r.n_emails, r.n_urls, r.n_digit_runs) == (1, 1, 2)


def test_gopher_filter_known_values(spark):
    from locustdb_spark.operators.text import gopher_quality_filter

    d = spark.createDataFrame(
        [
            # passes every rule: 8 tokens, mean len in [2,12], has 'the',
            # top token 1/8
            (1, "the quick brown fox jumps over lazy dogs"),
            # too short (3 tokens)
            (2, "the quick fox"),
            # repetition: 'spam' is 7 of 8 tokens (and no stopword)
            (3, "spam spam spam spam spam spam spam the"),
            # mean token length 1 (< 2)
            (4, "a b c d e f g h the"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_filter(d).collect()}
    assert out[1].passes_gopher
    assert not out[2].ok_count and not out[2].passes_gopher
    assert not out[3].ok_repetition and not out[3].passes_gopher
    assert not out[4].ok_mean_len and not out[4].passes_gopher
    assert out[4].ok_stopword


def test_contamination_check_known_values(spark):
    from locustdb_spark.operators.text import contamination_check

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # shares 'alpha beta gamma'
            (2, "zeta eta theta iota"),              # clean
            (3, "x y alpha beta gamma"),             # shares the same 3-gram
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma zulu")], "doc_id long, text string")
    out = {r.doc_id: r for r in contamination_check(train, ev, n=3).collect()}
    assert out[1].contaminated and out[1].n_matched_ngrams == 1
    assert not out[2].contaminated and out[2].n_matched_ngrams == 0
    assert out[3].contaminated


def test_contamination_bloom_one_sided_and_superset(spark, docs):
    """Bloom decontamination: no false negatives (every exactly
    contaminated doc is flagged, with per-doc flagged-gram counts >=
    exact match counts), no false positives at a roomy m_bits on a
    tiny gram set, and a saturated 64-bit filter flags everything —
    the documented one-sided error, visible end to end."""
    from locustdb_spark.operators.text import (
        contamination_check, contamination_check_bloom)

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "zeta eta theta iota"),
         (3, "x y alpha beta gamma")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma zulu")], "doc_id long, text string")
    out = {r.doc_id: r for r in contamination_check_bloom(
        train, ev, n=3, m_bits=1 << 18, k=4).collect()}
    assert out[1].flagged and out[1].n_flagged_ngrams == 1
    assert not out[2].flagged and out[2].n_flagged_ngrams == 0
    assert out[3].flagged
    # saturated filter (4 bits, all set by the eval grams): every doc
    # flags, including the clean one — the documented one-sided error
    sat = {r.doc_id: r.flagged for r in contamination_check_bloom(
        train, ev, n=3, m_bits=4, k=4).collect()}
    assert sat == {1: True, 2: True, 3: True}
    # superset invariant on the real corpus: bloom(flagged) >= exact
    tr = docs.filter(F.col("doc_id") % 20 != 0)
    ev2 = docs.filter(F.col("doc_id") % 100 == 0)
    exact = {r.doc_id: r.n_matched_ngrams
             for r in contamination_check(tr, ev2, n=3).collect()}
    bloom = {r.doc_id: r.n_flagged_ngrams
             for r in contamination_check_bloom(
                 tr, ev2, n=3, m_bits=1 << 18, k=4).collect()}
    assert set(exact) == set(bloom)
    assert all(bloom[i] >= exact[i] for i in exact)
    assert any(exact[i] > 0 for i in exact)  # non-trivial corpus
    # Arrow probe (memoized kernel) is bit-equal to the expression
    # recipe on the real corpus
    expr = sorted(map(tuple, contamination_check_bloom(
        tr, ev2, n=3, m_bits=1 << 18, k=4, impl="expr").collect()))
    arrow = sorted(map(tuple, contamination_check_bloom(
        tr, ev2, n=3, m_bits=1 << 18, k=4, impl="arrow").collect()))
    assert arrow == expr


def test_fingerprint_deterministic(docs):
    from locustdb_spark.operators.text import fingerprint

    a = fingerprint(docs).filter(F.col("doc_id") == 2).head()
    b = fingerprint(docs).filter(F.col("doc_id") == 2).head()
    assert a.fingerprint == b.fingerprint and a.content_md5 == b.content_md5


def test_fingerprint_hash_variants_cluster_equivalent(spark):
    """The xxhash64 production path and the md5 oracle path must give
    the SAME partition of documents into fingerprint-equality classes
    on a collision-free corpus — only the hash values differ."""
    from locustdb_spark.operators.text import fingerprint

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),  # dup of 1
         (3, "an entirely different document body here"),
         (4, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),  # case dup
         (5, "short")],
        ["doc_id", "text"])

    def classes(hash_fn):
        rows = fingerprint(docs, hash_fn=hash_fn).collect()
        by_fp: dict = {}
        for r in rows:
            by_fp.setdefault(r.fingerprint, set()).add(r.doc_id)
        return sorted(frozenset(v) for v in by_fp.values())

    fast, exact = classes("xxhash64"), classes("md5")
    rolling = classes("rolling")
    assert fast == exact == rolling
    # lowercased shingles: 1, 2, 4 share a fingerprint class
    assert frozenset({1, 2, 4}) in fast
    import pytest as _pytest
    with _pytest.raises(ValueError, match="hash_fn"):
        fingerprint(docs, hash_fn="sha9000").collect()


def test_fingerprint_rolling_matches_per_doc_reference(spark):
    """r7: the flat-buffer batch kernel must be VALUE-equal to the
    pre-r7 per-document loop (re-implemented here as the reference),
    including the short-text zero-pad floor, empty/None texts,
    multi-byte UTF-8, and texts whose tails would collide across the
    batch boundary if the cross-document mask were wrong."""
    import numpy as np

    from locustdb_spark.operators.text import fingerprint

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, ""),            # floor: padded to 8 zero bytes
        (3, None),          # treated as ""
        (4, "short"),       # < window, padded
        (5, "exactly8"),    # == window: exactly one shingle
        (6, "αβγδε ζηθικ"), # multi-byte utf-8
        (7, "zzzzzzzzzzzzzzzz"),  # tail equal to next doc's head
        (8, "zzzzzzzzaaaaaaaa"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r.doc_id: r.fingerprint
           for r in fingerprint(docs).collect()}

    prime = np.uint64(1099511628211)
    w = 8
    for doc_id, t in texts:
        b = np.frombuffer(
            (t or "").lower().encode("utf-8", "surrogatepass"),
            dtype=np.uint8)
        if len(b) < w:
            b = np.pad(b, (0, w - len(b)))
        n = len(b)
        acc = np.zeros(n - w + 1, dtype=np.uint64)
        for j in range(w):
            acc = acc * prime + b[j:n - w + 1 + j]
        assert got[doc_id] == int(acc.min().astype(np.int64)), doc_id


def test_repetition_stats_hash_ngrams_equivalent(spark):
    """hash_ngrams=True (no string materialization) must reproduce the
    exact path's counts on a collision-free corpus."""
    from locustdb_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c a b c"),
         (2, "one two three four five six"),
         (3, "x"),
         (4, "spark spark spark spark spark spark spark")],
        ["doc_id", "text"])
    exact = {r.doc_id: r
             for r in repetition_stats(docs, impl="expr").collect()}
    fast = {r.doc_id: r
            for r in repetition_stats(docs, hash_ngrams=True).collect()}
    arrow = {r.doc_id: r
             for r in repetition_stats(docs, impl="arrow").collect()}
    for d in exact:
        for other in (fast, arrow):
            assert (exact[d].n_ngrams, exact[d].n_distinct,
                    exact[d].n_dup, exact[d].keep) == \
                   (other[d].n_ngrams, other[d].n_distinct,
                    other[d].n_dup, other[d].keep)


def test_repetition_arrow_equals_expr_on_corpus(docs):
    """The Arrow kernel is EXACT (vocabulary-id packing, no hash), so
    it must reproduce the expression path's counts on the full real
    test corpus, not just a synthetic one."""
    from locustdb_spark.operators.text import repetition_stats

    a = {r.doc_id: (r.n_ngrams, r.n_distinct, r.n_dup, r.keep)
         for r in repetition_stats(docs, impl="expr").collect()}
    b = {r.doc_id: (r.n_ngrams, r.n_distinct, r.n_dup, r.keep)
         for r in repetition_stats(docs, impl="arrow").collect()}
    assert a == b and len(a) == 500


def test_multimodal_decode_stub(docs):
    from locustdb_spark.operators.multimodal import (
        decode_image_stub, with_binary_payload)

    payload = with_binary_payload(docs)
    assert dict(payload.dtypes)["payload"] == "binary"
    out = decode_image_stub(payload).filter(F.col("doc_id") == 3).head()
    text = docs.filter(F.col("doc_id") == 3).head().text
    h = hashlib.md5(text.encode()).hexdigest()
    assert out.n_bytes == len(text.encode())
    assert out.width == int(h[:4], 16) % 1024 + 1
    assert out.height == int(h[4:8], 16) % 1024 + 1
    assert out.format == "fake/rgb"


def test_multimodal_features_deterministic(docs):
    from locustdb_spark.operators.multimodal import (
        extract_features_stub,
        with_binary_payload,
    )

    out = extract_features_stub(
        with_binary_payload(docs.limit(5)), dim=4).collect()
    assert len(out) == 5
    for r in out:
        assert len(r.features) == 4
        assert all(0.0 <= v < 1.0 for v in r.features)
    # recompute one vector independently
    row = docs.limit(5).collect()[0]
    want = [
        int(hashlib.md5(
            row.text.encode() + b":%d" % j).hexdigest()[:8], 16)
        / 4294967296.0
        for j in range(4)
    ]
    got = {r.doc_id: list(r.features) for r in out}[row.doc_id]
    assert got == want


def test_multimodal_resize_stub(docs):
    from locustdb_spark.operators.multimodal import (
        resize_image_stub,
        with_binary_payload,
    )

    out = resize_image_stub(
        with_binary_payload(docs.limit(3)), 32, 16).collect()
    assert len(out) == 3
    assert all(
        (r.width, r.height, r.n_bytes) == (32, 16, 32 * 16 * 3)
        for r in out
    )
    row = docs.limit(3).collect()[0]
    want = hashlib.md5(row.text.encode() + b"@32x16").hexdigest()
    assert {r.doc_id: r.resized_md5 for r in out}[row.doc_id] == want


def test_multimodal_frames_fan_out(docs):
    from locustdb_spark.operators.multimodal import (
        sample_frames_stub,
        with_binary_payload,
    )

    sample = docs.limit(4)
    out = sample_frames_stub(
        with_binary_payload(sample), frame_bytes=100, max_frames=3
    ).collect()
    rows = {r.doc_id: r for r in sample.collect()}
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frames in by_doc.items():
        b = rows[doc_id].text.encode()
        n_expected = min(3, max(1, -(-len(b) // 100)))
        assert len(frames) == n_expected
        f0 = sorted(frames, key=lambda r: r.frame_id)[0]
        assert f0.frame_md5 == hashlib.md5(b[:100]).hexdigest()
        assert f0.frame_len == min(100, len(b))


def test_quantize_embeddings_bounds_and_reconstruction(emb, spark):
    from locustdb_spark.operators.similarity import quantize_embeddings

    q = quantize_embeddings(emb).toPandas()
    assert q.q.between(-128, 127).all()
    # min and max of every dimension hit the code range extremes
    per_dim = q.groupby("dim_idx").q.agg(["min", "max"])
    assert (per_dim["min"] == -128).all() and (per_dim["max"] == 127).all()
    # dequantized values stay within one bucket of the originals
    import numpy as np
    first = emb.filter("vec_id = 0").head().embedding
    stats = {}
    for r in emb.select("embedding").collect():
        for i, v in enumerate(r.embedding):
            mn, mx = stats.get(i, (np.inf, -np.inf))
            stats[i] = (min(mn, v), max(mx, v))
    codes = q[q.vec_id == 0].set_index("dim_idx").q
    for i, v in enumerate(first):
        mn, mx = stats[i]
        deq = mn + (codes[i] + 128 + 0.5) / 256 * (mx - mn)
        assert abs(deq - v) <= (mx - mn) / 256


def test_label_centroids_known_values(spark):
    from locustdb_spark.operators.similarity import label_centroids

    d = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])],
        "label int, embedding array<double>")
    out = {(r.label, r.dim_idx): r.centroid_val
           for r in label_centroids(d).collect()}
    assert out == {(0, 0): 2.0, (0, 1): 3.0, (1, 0): 10.0, (1, 1): 20.0}


def test_linear_classifier_score_known_values_and_parity(spark, docs):
    """Hashed-BoW linear scoring: hand-computed logits on a tiny
    corpus (mean-pooled bucket weights + bias, floor-truncated), the
    empty-doc bias-only case, and Arrow/expression bit-equality on
    the real corpus."""
    import hashlib
    import math

    from locustdb_spark.operators.text import linear_classifier_score

    W = [((i * 37) % 21 - 10) / 10.0 for i in range(64)]
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, ""),
         # mixed case: hashing is case-SENSITIVE (review finding —
         # the expr path once lowercased first and diverged here)
         (4, "Alpha ALPHA alpha")],
        "doc_id long, text string")

    def expect(text):
        ws = [w for w in text.split(" ") if w]
        acc = 0.0
        for w in ws:
            acc += W[int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
                     % 64]
        v = 0.05 + acc / max(len(ws), 1)
        return math.floor(v * 1000000) / 1000000

    for impl in ("arrow", "expr"):
        out = {r.doc_id: (r.n_tokens, r.logit, r.label)
               for r in linear_classifier_score(
                   corpus, W, bias=0.05, impl=impl).collect()}
        for i, t in ((1, "alpha beta gamma"), (2, "alpha alpha"),
                     (3, ""), (4, "Alpha ALPHA alpha")):
            e = expect(t)
            assert out[i] == (len([w for w in t.split() if w]), e,
                              e >= 0.0), (impl, i)
        assert out[3][1] == 0.05  # empty doc scores the bias alone
    # the mixed-case doc must NOT score like its lowercased form
    assert expect("Alpha ALPHA alpha") != expect("alpha alpha alpha")

    def canon(df):
        return sorted(map(tuple, df.collect()))

    assert canon(linear_classifier_score(docs, W, bias=0.05,
                                         impl="arrow")) == \
        canon(linear_classifier_score(docs, W, bias=0.05, impl="expr"))


def test_semantic_dedup_known_values(spark):
    """SemDeDup keep rule: within a cluster, near-dups (cos >=
    threshold) keep the member with the LOWEST centroid cosine (ties
    break to the smaller id); cross-cluster similarity never
    interacts; lone vectors always survive."""
    import math

    from locustdb_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0], [0.0, 1.0]]
    deg = {1: 5.0, 2: 10.0, 3: 44.0, 4: 85.0, 5: 80.0}
    rows = [(i, [math.cos(math.radians(a)), math.sin(math.radians(a))])
            for i, a in deg.items()]
    # ids 1,2 -> cluster 0, near-dup pair (cos 5deg apart ~0.996):
    #   id 2 has the lower centroid cos -> keeps; id 1 dropped.
    # id 3 -> cluster 0 (44deg), far from 1/2 (39deg, cos ~0.78 < .9)
    # ids 4,5 -> cluster 1, near-dups; centroid cos at 85deg vs 80deg
    #   from x-axis = 5deg vs 10deg from y-axis -> id 5 (10deg away,
    #   LOWER centroid cos) keeps; id 4 dropped.
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: (r.cluster, r.keep)
           for r in semantic_dedup(d, cents, threshold=0.9).collect()}
    assert out == {1: (0, False), 2: (0, True), 3: (0, True),
                   4: (1, False), 5: (1, True)}
    # exact tie on centroid cosine -> smaller id survives
    tie = spark.createDataFrame(
        [(7, [1.0, 0.2]), (9, [1.0, 0.2])],
        "vec_id long, embedding array<double>")
    out2 = {r.vec_id: r.keep
            for r in semantic_dedup(tie, cents, threshold=0.99).collect()}
    assert out2 == {7: True, 9: False}


def test_semantic_dedup_components_vs_pairwise_on_chain(spark):
    """grouping="components" (r8 ADVICE): at low thresholds near-dup
    groups are CHAINS, not cliques. On a—b—c with b the worst keeper
    of both edges, the pairwise rule keeps BOTH chain ends (each end's
    only neighbor is worse), while components keeps exactly one member
    per component — the lowest-centroid-cosine one. Lone vectors in
    other clusters survive under both rules."""
    from locustdb_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    d = spark.createDataFrame(
        [
            # cluster 0 chain: cos(a,b)~.905, cos(b,c)~.879 >= 0.85;
            # cos(a,c)=0.6 < 0.85. centroid cos: a=.800, b~.899,
            # c=.750 -> b is the worst keeper of every edge.
            (1, [0.8, 0.6, 0.0]),            # a
            (2, [0.9, 0.31, 0.31]),          # b
            (3, [0.75, 0.0, 0.661438]),      # c (lowest ccos)
            (4, [0.0, 1.0, 0.0]),            # lone, cluster 1
        ],
        "vec_id long, embedding array<double>")
    pw = {r.vec_id: r.keep
          for r in semantic_dedup(d, cents, threshold=0.85).collect()}
    # pairwise: b dropped (both neighbors better), both ENDS kept —
    # two survivors in one connected component
    assert pw == {1: True, 2: False, 3: True, 4: True}
    cc = {r.vec_id: r.keep
          for r in semantic_dedup(d, cents, threshold=0.85,
                                  grouping="components").collect()}
    # components: one survivor per component, the most extremal (c)
    assert cc == {1: False, 2: False, 3: True, 4: True}
    # cluster assignment and centroid_cos are identical across rules
    pw_rows = {r.vec_id: (r.cluster, r.centroid_cos)
               for r in semantic_dedup(d, cents, threshold=0.85).collect()}
    cc_rows = {r.vec_id: (r.cluster, r.centroid_cos)
               for r in semantic_dedup(d, cents, threshold=0.85,
                                       grouping="components").collect()}
    assert pw_rows == cc_rows
    # at a clique-regime threshold the two rules agree exactly
    import pytest

    hi_pw = {r.vec_id: r.keep
             for r in semantic_dedup(d, cents, threshold=0.99).collect()}
    hi_cc = {r.vec_id: r.keep
             for r in semantic_dedup(d, cents, threshold=0.99,
                                     grouping="components").collect()}
    assert hi_pw == hi_cc == {1: True, 2: True, 3: True, 4: True}
    with pytest.raises(ValueError, match="grouping"):
        semantic_dedup(d, cents, grouping="nope")


def test_semantic_dedup_halved_pairs_match_original_rule(emb, spark):
    """r13: the pairwise path now enumerates each unordered pair ONCE
    (id_a < id_b, worse member emitted) over a block-salted join.
    Brute-force the ORIGINAL rule in Python — drop v iff some u != v
    in v's cluster has cos(u, v) >= threshold and (ccos_u < ccos_v or
    (ccos_u == ccos_v and u < v)) — with Spark's comparison semantics
    (NaN greater than everything, NaN == NaN) and the exact fold
    arithmetic, on a corpus slice salted with exact duplicates (ties).
    (Zero vectors raise DIVIDE_BY_ZERO under ANSI in BOTH the old and
    new formulations — same expressions — so they are out of scope.)"""
    import math

    from pyspark.sql import functions as F

    from locustdb_spark.operators.similarity import semantic_dedup

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 8").orderBy("vec_id")
             .collect()]
    base = emb.filter("vec_id % 7 = 0").select("vec_id", "embedding")
    dup = base.filter("vec_id % 21 = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    corpus = base.unionByName(dup)
    thr = 0.3
    got = {r.vec_id: (r.cluster, r.keep)
           for r in semantic_dedup(corpus, cents, threshold=thr)
           .collect()}

    # --- original rule, brute force, Spark NaN semantics ---
    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    def seq_norm(a):
        acc = 0.0
        for x in a:
            acc = acc + float(x) * float(x)
        return math.sqrt(acc)

    def ge(x, y):  # Spark: NaN is greater than everything
        if math.isnan(x):
            return True
        if math.isnan(y):
            return False
        return x >= y

    def lt(x, y):
        if math.isnan(x):
            return False
        if math.isnan(y):
            return True
        return x < y

    def eq(x, y):  # Spark: NaN == NaN
        if math.isnan(x) and math.isnan(y):
            return True
        return x == y

    rows = [(int(r.vec_id), [float(x) for x in r.embedding])
            for r in corpus.collect()]
    cnorms = [seq_norm(c) for c in cents]
    info = {}
    for vid, v in rows:
        sims = [seq_dot(v, c) / (seq_norm(v) * cnorms[j])
                for j, c in enumerate(cents)]
        best = max(sims, key=lambda s: (math.isnan(s), s))
        cl = next(j for j, s in enumerate(sims) if eq(s, best))
        info[vid] = (cl, sims[cl], v)
    dropped = set()
    for vid, (cl, cc, v) in info.items():
        for uid, (cl2, cc2, u) in info.items():
            if uid == vid or cl2 != cl:
                continue
            cos = seq_dot(u, v) / (seq_norm(u) * seq_norm(v))
            if ge(cos, thr) and (lt(cc2, cc)
                                 or (eq(cc2, cc) and uid < vid)):
                dropped.add(vid)
                break
    want = {vid: (cl, vid not in dropped)
            for vid, (cl, _, _) in info.items()}
    assert got == want


def test_semantic_dedup_numpy_assign_matches_expr(emb):
    """assign="numpy" (r11: the production assignment at k ~ n/100,
    one Arrow-batched matmul per batch instead of O(k) interpreted
    folds per row) must produce the same (cluster, keep) verdicts as
    the oracle-checkable expr assigner on the sf corpus — argmax over
    cosines is tie-free here, so the two float paths agree exactly."""
    from locustdb_spark.operators.similarity import semantic_dedup

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 8").orderBy("vec_id")
             .collect()]
    expr = {r.vec_id: (r.cluster, r.keep)
            for r in semantic_dedup(emb, cents, threshold=0.3,
                                    grouping="components").collect()}
    np_ = {r.vec_id: (r.cluster, r.keep)
           for r in semantic_dedup(emb, cents, threshold=0.3,
                                   grouping="components",
                                   assign="numpy").collect()}
    assert expr == np_


def test_pq_encode_and_adc_known_values(spark):
    """PQ encode: per-subspace squared-L2 argmin with ties to the
    smaller codeword index; ADC: sum of query-to-codeword table
    lookups, ascending, ties to the smaller id."""
    from locustdb_spark.operators.similarity import (
        pq_adc_topk, pq_encode)

    books = [[[0.0, 0.0], [1.0, 1.0]],   # subspace 0
             [[0.0, 1.0], [2.0, 2.0]]]   # subspace 1
    d = spark.createDataFrame(
        [(1, [0.1, 0.0, 0.0, 1.0]),   # codes [0, 0]
         (2, [0.9, 1.2, 1.9, 2.1]),   # codes [1, 1]
         (3, [0.5, 0.5, 0.0, 1.0])],  # sub0 equidistant -> tie -> 0
        "vec_id long, embedding array<double>")
    codes = {r.vec_id: r.codes for r in pq_encode(d, books).collect()}
    assert codes == {1: [0, 0], 2: [1, 1], 3: [0, 0]}
    # query [0,0,0,1]: table sub0 = [0.0, 2.0], sub1 = [0.0, 5.0]
    out = pq_adc_topk(pq_encode(d, books), books,
                      [0.0, 0.0, 0.0, 1.0], k=3).collect()
    assert [(r.vec_id, r.adc_dist) for r in out] == [
        (1, 0.0), (3, 0.0), (2, 7.0)]  # 1 and 3 tie -> id order


def test_pq_corpus_codebooks_shapes_and_self_hit(emb):
    """Frozen corpus codebooks have shape m x k x (dims/m); a corpus
    vector whose subvectors ARE codewords (vec_id < k) encodes to
    itself and ADC-scores 0 at rank 1 for its own query."""
    import pytest

    from locustdb_spark.operators.similarity import (
        pq_adc_topk, pq_codebooks_from_corpus, pq_encode)

    books = pq_codebooks_from_corpus(emb, m=8, k=16)
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(cw) == 8 for b in books for cw in b)
    codes = pq_encode(emb, books)
    row0 = {r.vec_id: r.codes for r in
            codes.filter("vec_id < 16").collect()}
    for j in range(16):  # vec j's subvectors are codeword j everywhere
        assert row0[j] == [j] * 8, (j, row0[j])
    q = [float(x)
         for x in emb.filter("vec_id = 0").head().embedding]
    top = pq_adc_topk(codes, books, q, k=1).collect()
    assert top[0].vec_id == 0 and top[0].adc_dist == 0.0
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks_from_corpus(emb, m=7, k=16)
    with pytest.raises(ValueError, match="query dims"):
        pq_adc_topk(codes, books, q[:8], k=1)


def test_pq_ivf_composed_degrades_to_full_adc(emb):
    """IVF-PQ composition: probing ALL clusters must equal plain ADC
    over the full corpus (the pruning changes the candidate set, not
    the scoring); probing a subset returns only vectors assigned to
    the probed clusters."""
    from locustdb_spark.operators.similarity import (
        ivf_assign_expr, pq_adc_topk, pq_codebooks_from_corpus,
        pq_encode, rank_probes_seq)

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 4").orderBy("vec_id")
             .collect()]
    books = pq_codebooks_from_corpus(emb, m=8, k=16)
    q = [float(x) for x in emb.filter("vec_id = 0").head().embedding]
    full = pq_adc_topk(pq_encode(emb, books), books, q, k=10).collect()
    assigned = ivf_assign_expr(emb, cents)
    all_probed = assigned.filter(
        F.col("cluster").isin(rank_probes_seq(cents, q, 4)))
    composed = pq_adc_topk(pq_encode(all_probed, books), books, q,
                           k=10).collect()
    assert [(r.vec_id, r.adc_dist) for r in composed] == \
        [(r.vec_id, r.adc_dist) for r in full]
    # subset probing: results come only from the probed clusters
    probe = rank_probes_seq(cents, q, 1)
    sub = assigned.filter(F.col("cluster").isin(probe))
    ids = {r.vec_id for r in sub.select("vec_id").collect()}
    top = pq_adc_topk(pq_encode(sub, books), books, q, k=10).collect()
    assert all(r.vec_id in ids for r in top)
    assert top[0].vec_id == 0  # query's own cluster is always probed


def test_ann_ivf_exact_when_probing_all(emb):
    """nprobe == n_clusters must degrade IVF to exact brute force."""
    from locustdb_spark.operators.similarity import (
        ann_ivf_topk,
        cosine_topk,
    )

    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    exact = cosine_topk(emb, qv, k=10).collect()
    ivf = ann_ivf_topk(emb, qv, k=10, n_clusters=4, nprobe=4).collect()
    assert [(r.vec_id, r.cosine_sim) for r in ivf] == [
        (r.vec_id, r.cosine_sim) for r in exact
    ]


def test_ann_ivf_probe_subset_and_deterministic(emb):
    from locustdb_spark.operators.similarity import (
        ann_ivf_topk,
        kmeans_centroids,
    )

    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    cents = kmeans_centroids(emb, n_clusters=4)
    a = ann_ivf_topk(emb, qv, k=5, nprobe=1, centroids=cents).collect()
    b = ann_ivf_topk(emb, qv, k=5, nprobe=1, centroids=cents).collect()
    assert a == b and 0 < len(a) <= 5
    # results are properly ordered by similarity desc
    sims = [r.cosine_sim for r in a]
    assert sims == sorted(sims, reverse=True)


def test_ann_lsh_multiprobe_recall(spark, emb):
    """Multi-probe LSH: widening the Hamming radius can only add
    candidates (nested sets), so recall@k is monotone in the radius,
    and radius == num_planes degrades to exact search."""
    from locustdb_spark.operators.similarity import (
        ann_lsh_topk, cosine_topk)

    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    exact = {r.vec_id for r in cosine_topk(emb, qv, k=10).collect()}

    def recall(h):
        got = {r.vec_id
               for r in ann_lsh_topk(emb, qv, k=10, num_planes=8,
                                     multiprobe=h).collect()}
        return len(exact & got) / len(exact)

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert r0 <= r1 <= r2
    assert recall(8) == 1.0  # full radius == brute force


def test_ann_ivf_nprobe_recall_monotone(spark, emb):
    """IVF: probing more clusters only adds candidates, so recall@k is
    monotone in nprobe, and nprobe == n_clusters is exact."""
    from locustdb_spark.operators.similarity import (
        ann_ivf_topk, cosine_topk, kmeans_centroids)

    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    exact = {r.vec_id for r in cosine_topk(emb, qv, k=10).collect()}
    cents = kmeans_centroids(emb, n_clusters=8)

    def recall(np_):
        got = {r.vec_id for r in ann_ivf_topk(
            emb, qv, k=10, n_clusters=8, nprobe=np_,
            centroids=cents).collect()}
        return len(exact & got) / len(exact)

    rs = [recall(n) for n in (1, 2, 4, 8)]
    assert rs == sorted(rs)
    assert rs[-1] == 1.0


def test_kmeans_hash_sample_unbiased_on_sorted_corpus(spark):
    """Training on the smallest-xxhash64(id) sample must beat an
    id-prefix sample on a corpus whose ids correlate with content
    (e.g. time-ordered drift): 4 orthogonal direction-clusters laid
    out contiguously by id. A 64-vector prefix only ever sees cluster
    0, so its centroids split cluster 0 by noise and scatter the other
    clusters' members across cells — nprobe=1 recall collapses. The
    hash sample sees every cluster and recovers the true directions."""
    import numpy as np

    from locustdb_spark.operators.similarity import (
        ann_ivf_topk, cosine_topk, kmeans_centroids)

    rng = np.random.default_rng(7)
    rows = []
    for j in range(4):
        base = np.zeros(8)
        base[2 * j] = 1.0
        for i in range(100):
            v = base + rng.normal(0, 0.05, 8)
            rows.append((j * 100 + i, [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")

    def mean_recall(cents):
        total = 0.0
        for j in range(4):  # one query per true cluster
            qv = rows[j * 100 + 50][1]
            exact = {r.vec_id for r in cosine_topk(df, qv, k=10).collect()}
            got = {r.vec_id for r in ann_ivf_topk(
                df, qv, k=10, nprobe=1, centroids=cents).collect()}
            total += len(exact & got) / len(exact)
        return total / 4

    # current sampler: hash-ordered (unbiased)
    hash_cents = kmeans_centroids(df, n_clusters=4, sample=64)
    # the old prefix sampler, reproduced by restricting the corpus to
    # the first 64 ids before training
    prefix_cents = kmeans_centroids(
        df.filter("vec_id < 64"), n_clusters=4, sample=64)

    # structural bias: every prefix centroid points at cluster 0's
    # axis; the hash centroids recover all four true directions
    axes = np.array([0, 2, 4, 6])
    assert all(np.argmax(np.abs(c)) == 0 for c in np.array(prefix_cents))
    hash_axis_hits = {int(np.argmax(np.abs(c))) for c in np.array(hash_cents)}
    assert hash_axis_hits == set(axes.tolist())

    r_hash, r_prefix = mean_recall(hash_cents), mean_recall(prefix_cents)
    assert r_hash >= 0.95
    assert r_hash > r_prefix


def test_funnel_known_values(spark):
    from locustdb_spark.operators.events import funnel

    # user 1: full ordered funnel; user 2: click before view (click
    # must not count — its only click precedes the first view);
    # user 3: view only; user 4: never enters.
    rows = [
        (1, "view", 100), (1, "click", 200), (1, "buy", 300),
        (2, "click", 50), (2, "view", 60), (2, "buy", 70),
        (3, "view", 10),
        (4, "other", 5),
    ]
    ev = spark.createDataFrame(
        rows, "user_id int, event_type string, ts long")
    out = {r.step: (r.event_type, r.users)
           for r in funnel(ev, ["view", "click", "buy"]).collect()}
    assert out == {1: ("view", 3), 2: ("click", 1), 3: ("buy", 1)}


def test_funnel_conversion_window(spark):
    """within_ns bounds each step: user 1 converts inside the window;
    user 2's click comes too late; user 3's late click is skipped but
    a second in-window click converts (first-qualifying semantics)."""
    from locustdb_spark.operators.events import funnel

    rows = [
        (1, "view", 100), (1, "click", 150),
        (2, "view", 100), (2, "click", 500),
        (3, "view", 100), (3, "click", 90), (3, "click", 180),
    ]
    ev = spark.createDataFrame(
        rows, "user_id int, event_type string, ts long")
    out = {r.step: r.users
           for r in funnel(ev, ["view", "click"], within_ns=100).collect()}
    assert out == {1: 3, 2: 2}
    # unwindowed: user 2 also converts
    out2 = {r.step: r.users
            for r in funnel(ev, ["view", "click"]).collect()}
    assert out2 == {1: 3, 2: 3}


def test_funnel_same_timestamp_counts(spark):
    from locustdb_spark.operators.events import funnel

    ev = spark.createDataFrame(
        [(1, "a", 100), (1, "b", 100)],
        "user_id int, event_type string, ts long")
    out = {r.step: r.users for r in funnel(ev, ["a", "b"]).collect()}
    assert out == {1: 1, 2: 1}  # at-or-after: equal ts qualifies


def test_retention_known_values(spark):
    from locustdb_spark.operators.events import retention

    day = 86_400 * 10**9
    rows = [
        (1, 0 * day), (1, 1 * day), (1, 1 * day + 5),  # days 0,1
        (2, 1 * day), (2, 3 * day),                    # cohort 1; 0,+2
        (3, 0 * day),                                  # cohort 0 only
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts long")
    out = {(r.cohort_day, r.day_offset): r.users
           for r in retention(ev).collect()}
    assert out == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 2): 1}


def test_weighted_median_known_values(spark):
    """GROUPED_AGG pandas UDAF (operators/custom_agg.py): lower
    weighted median, integer-exact, duplicate values pre-collapsed
    JVM-side."""
    from locustdb_spark.operators.custom_agg import weighted_median

    rows = [
        # group a: values 1(w1), 2(w1), 3(w98) -> median 3
        ("a", 1, 1), ("a", 2, 1), ("a", 3, 98),
        # group b: 10(w1), 20(w1) -> cum*2>=total first at 10
        ("b", 10, 1), ("b", 20, 1),
        # group c: duplicate values collapse: 5 appears twice w=1 each,
        # 1 has w=1 -> weights {1:1, 5:2}, total 3 -> median 5
        ("c", 5, 1), ("c", 5, 1), ("c", 1, 1),
    ]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    out = {r.g: r.weighted_median
           for r in weighted_median(df, "v", "w", ["g"]).collect()}
    assert out == {"a": 3, "b": 10, "c": 5}


def test_weighted_median_plan_is_arrow_batched(spark):
    """The UDAF must plan as AggregateInPandas (Arrow), never
    BatchEvalPython (row-at-a-time)."""
    from locustdb_spark.operators.custom_agg import weighted_median

    df = spark.createDataFrame([("a", 1, 1)], "g string, v long, w long")
    plan = weighted_median(df, "v", "w", ["g"])._jdf.queryExecution() \
        .explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("simple"))
    # Spark 4 names the Arrow UDAF node ArrowAggregatePython
    # (AggregateInPandas in 3.x)
    assert "ArrowAggregatePython" in plan or "AggregateInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_dedup_segments_known_values(spark):
    """C4-rule segment dedup: the globally-first occurrence (by
    doc_id, seg_idx) survives; later copies are cut and docs
    reassembled in order — including trailing partial segments."""
    from locustdb_spark.operators.dedup import dedup_segments

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # segs: "a b", "c d"
            (2, "c d a b x"),        # "c d" and "a b" are dups; "x" new
            (3, "x"),                # "x" already taken by doc 2
        ],
        "doc_id long, text string",
    )
    out = {r.id: (r.n_segments, r.n_kept, r.text_clean)
           for r in dedup_segments(docs, n_words=2).collect()}
    assert out == {
        1: (2, 2, "a b c d"),
        2: (3, 1, "x"),
        3: (1, 0, ""),
    }


def test_drop_frequent_segments_known_values(spark):
    """Boilerplate rule: ALL copies of a segment with corpus count >=
    min_count are dropped (unlike dedup_segments' keep-first)."""
    from locustdb_spark.operators.dedup import drop_frequent_segments

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # "a b" x3 corpus-wide -> dropped
            (2, "a b e f"),
            (3, "a b"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: (r.n_segments, r.n_kept, r.text_clean)
           for r in drop_frequent_segments(
               docs, min_count=3, n_words=2).collect()}
    assert out == {
        1: (2, 1, "c d"),
        2: (2, 1, "e f"),
        3: (1, 0, ""),
    }


def test_duplicate_spans_known_values(spark):
    """ExactSubstr span detection: cross-doc shared runs, within-doc
    self-repeats, short docs, empty docs — spans merged over
    overlap/adjacency with exact token indexes."""
    from locustdb_spark.operators.dedup import duplicate_spans

    corpus = spark.createDataFrame(
        [
            # docs 1/2 share the 6-token run "a b c d e f" (w=4 ->
            # window starts 0..2 in doc 1, 1..3 in doc 2)
            (1, "a b c d e f u1 u2 u3"),
            (2, "z a b c d e f"),
            # period-4 self-repeat: every window of doc 3 repeats
            (3, "p q r s p q r s p q r s"),
            (4, "too short"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.span_start): (r.span_end, r.n_windows)
           for r in duplicate_spans(corpus, window=4).collect()}
    assert out == {
        (1, 0): (5, 3),   # windows 0,1,2 -> tokens 0..5
        (2, 1): (6, 3),   # windows 1,2,3 -> tokens 1..6
        (3, 0): (11, 9),  # all 9 windows duplicated, one span
    }


def test_duplicate_spans_merge_boundary(spark):
    """Two duplicated windows merge iff their start gap is <= window
    (overlap or token-adjacency); a gap of window+1 splits spans."""
    from locustdb_spark.operators.dedup import duplicate_spans

    # doc 1 repeats "m1..m4" at positions 0 and 4 (gap 4 == window:
    # spans touch -> merged) and "k1..k4" at position 9 (gap 5 > 4
    # from the previous duplicated start -> separate span). Doc 2
    # provides the second copies.
    corpus = spark.createDataFrame(
        [
            (1, "m1 m2 m3 m4 m1 m2 m3 m4 x k1 k2 k3 k4"),
            (2, "m1 m2 m3 m4 y k1 k2 k3 k4"),
        ],
        "doc_id long, text string",
    )
    out = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicate_spans(corpus, window=4).collect()
    )
    assert out == [
        (1, 0, 7, 2),    # starts 0 and 4 merged (gap == window)
        (1, 9, 12, 1),   # gap 5 > window -> new span
        (2, 0, 3, 1),
        (2, 5, 8, 1),
    ]


def test_duplicate_spans_arrow_matches_expr_and_hash_key(docs):
    """The Arrow window kernel is pinned equal to the interpreted
    expression form on the real corpus, and the production xxhash64
    key groups identically to raw-string keys."""
    from locustdb_spark.operators.dedup import duplicate_spans

    def canon(df):
        return sorted(map(tuple, df.collect()))

    base = canon(duplicate_spans(docs, key="string", impl="expr"))
    assert len(base) > 0  # the corpus has duplicated runs
    assert canon(duplicate_spans(docs, key="string", impl="arrow")) == base
    assert canon(duplicate_spans(docs, key="hash", impl="arrow")) == base
    assert canon(duplicate_spans(docs, key="md5", impl="expr")) == base


def test_remove_duplicate_spans_known_values(spark):
    """ExactSubstr ACTION: the key's global first occurrence
    survives, later occurrences' merged spans are cut, self-repeats
    collapse to one period, short/empty docs pass through."""
    from locustdb_spark.operators.dedup import remove_duplicate_spans

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f u1 u2 u3"),    # holds the firsts -> kept
            (2, "z a b c d e f tail"),      # later copy -> cut
            (3, "p q r s p q r s p q r s"),  # self-repeat
            (4, "short doc"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
           for r in remove_duplicate_spans(corpus, window=4).collect()}
    assert out == {
        1: (9, 0, "a b c d e f u1 u2 u3"),
        2: (8, 6, "z tail"),
        3: (12, 8, "p q r s"),
        4: (2, 0, "short doc"),
        5: (0, 0, ""),
    }


def test_remove_duplicate_spans_impl_and_key_parity(docs):
    from locustdb_spark.operators.dedup import remove_duplicate_spans

    def canon(df):
        return sorted(map(tuple, df.collect()))

    base = canon(remove_duplicate_spans(docs, key="string",
                                        impl="expr"))
    assert any(r[2] > 0 for r in base)  # some tokens actually removed
    assert canon(remove_duplicate_spans(docs, key="string",
                                        impl="arrow")) == base
    assert canon(remove_duplicate_spans(docs, key="hash",
                                        impl="arrow")) == base
    # the 128-bit removal key (collision-safe destructive path) must
    # group exactly like raw strings on a collision-free corpus
    assert canon(remove_duplicate_spans(docs, key="md5full",
                                        impl="arrow")) == base


def test_duplicate_span_stats_known_values(spark):
    """Per-doc rollup covers EVERY document (zeros for clean/short/
    empty docs) and dup_frac is exact."""
    from locustdb_spark.operators.dedup import duplicate_span_stats

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f u1 u2 u3"),
            (2, "z a b c d e f"),
            (3, "clean doc nothing repeats here at all ok"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_tokens, r.n_spans, r.dup_tokens, r.dup_frac)
           for r in duplicate_span_stats(corpus, window=4).collect()}
    assert out == {
        1: (9, 1, 6, 6 / 9),
        2: (7, 1, 6, 6 / 7),
        3: (8, 0, 0, 0.0),
        4: (0, 0, 0, 0.0),
    }


def test_sessionize_known_values(spark):
    from locustdb_spark.operators.events import sessionize

    m = 60 * 10**9
    rows = [
        (1, 0), (1, 10 * m), (1, 50 * m),  # 40-min gap splits here
        (2, 5 * m),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts long")
    out = {(r.user_id, r.session_seq):
           (r.session_start, r.session_end, r.n_events)
           for r in sessionize(ev).collect()}
    assert out == {
        (1, 1): (0, 10 * m, 2),
        (1, 2): (50 * m, 50 * m, 1),
        (2, 1): (5 * m, 5 * m, 1),
    }


def test_sessionize_gap_boundary_and_ties(spark):
    from locustdb_spark.operators.events import sessionize

    # a gap exactly equal to the threshold stays in-session (> not >=),
    # and duplicate timestamps can never open a session (gap 0)
    ev = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 100), (1, 201)], "user_id int, ts long")
    out = sessionize(ev, gap_ns=100).collect()
    assert len(out) == 2
    by_seq = {r.session_seq: r.n_events for r in out}
    assert by_seq == {1: 3, 2: 1}


def test_shuffle_shards_deterministic_and_balanced(docs):
    """Training-export shuffle: (shard, position) is a permutation —
    every doc exactly once, positions dense 0..len(shard)-1 — and
    byte-identical across runs; the order is decorrelated from doc_id
    order."""
    from locustdb_spark.operators.sampling import shuffle_shards

    a = shuffle_shards(docs, n_shards=4).collect()
    b = shuffle_shards(docs, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == docs.count()
    assert len({r.doc_id for r in a}) == len(a)       # permutation
    by_shard: dict[int, list] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.position)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(len(positions)))  # dense
    # roughly balanced shards (hash mod): no shard 2x another
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * min(sizes)
    # different salt -> different permutation
    c = shuffle_shards(docs, n_shards=4, salt="other").collect()
    assert sorted(map(tuple, c)) != sorted(map(tuple, a))


def test_mixture_sample_rates_and_determinism(docs):
    from locustdb_spark.operators.sampling import mixture_sample

    out = mixture_sample(
        docs, {"src0": 1.0, "src1": 0.0}, default_rate=0.5)
    srcs = {r.source for r in out.collect()}
    n_src0 = out.filter(F.col("source") == "src0").count()
    assert n_src0 == docs.filter(F.col("source") == "src0").count()
    assert "src1" not in srcs
    # deterministic: same filter twice -> same rows
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in mixture_sample(
        docs, {"src0": 1.0, "src1": 0.0}, default_rate=0.5).collect())
    assert a == b


def test_knn_join_matches_cosine_topk(emb):
    """knn_join for a single probe row must agree with cosine_topk
    (modulo cosine_topk including the query row itself)."""
    from locustdb_spark.operators.similarity import cosine_topk, knn_join

    probe = emb.filter(F.col("vec_id") == 0)
    qv = [float(x) for x in probe.head().embedding]
    knn = knn_join(emb, probe, k=5).orderBy(
        F.col("cosine_sim").desc(), "vec_id").collect()
    exact = [r for r in cosine_topk(emb, qv, k=6).collect()
             if r.vec_id != 0][:5]
    assert [(r.vec_id, r.cosine_sim) for r in knn] == [
        (r.vec_id, r.cosine_sim) for r in exact]
    assert all(r.q_id == 0 for r in knn)


def test_resample_zero_fill_gaps(spark):
    from locustdb_spark.operators.temporal import resample_zero_fill

    # key 'a' active in buckets 0 and 3 -> 1,2 are zero-filled;
    # key 'b' only in bucket 1.
    rows = [("a", 5, 1.0), ("a", 35, 2.0), ("b", 15, 4.0)]
    ev = spark.createDataFrame(rows, "event_type string, ts long, value double")
    out = {(r.event_type, r.bucket): (r.cnt, r.sum_value)
           for r in resample_zero_fill(ev, bucket_ns=10).collect()}
    assert len(out) == 8  # buckets 0..3 x 2 keys
    assert out[("a", 0)] == (1, 1.0)
    assert out[("a", 1)] == (0, 0.0)
    assert out[("a", 2)] == (0, 0.0)
    assert out[("a", 3)] == (1, 2.0)
    assert out[("b", 1)] == (1, 4.0)
    assert out[("b", 3)] == (0, 0.0)


def test_forward_fill_locf(spark):
    from locustdb_spark.operators.temporal import forward_fill

    rows = [("k", 1, 10.0), ("k", 2, None), ("k", 3, None),
            ("k", 4, 40.0), ("j", 1, None), ("j", 2, 7.0)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {(r.k, r.t): r.filled_value
           for r in forward_fill(df, "k", "t", "v").collect()}
    assert out == {("k", 1): 10.0, ("k", 2): 10.0, ("k", 3): 10.0,
                   ("k", 4): 40.0, ("j", 1): None, ("j", 2): 7.0}


def test_redact_pii_known_values(spark):
    from locustdb_spark.operators.text import redact_pii

    rows = [
        (1, "mail me at bob.smith@example.com or call 5551234567 now"),
        (2, "see https://example.com/page?x=1 and http://a.b/c"),
        (3, "short 123 digits stay, 999999 goes"),
        (4, "clean text"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].n_emails == 1 and out[1].n_long_digit_runs == 1
    assert out[1].redacted_text == "mail me at <EMAIL> or call <NUM> now"
    assert out[2].n_urls == 2
    assert out[2].redacted_text == "see <URL> and <URL>"
    assert out[3].redacted_text == "short 123 digits stay, <NUM> goes"
    assert out[4].redacted_text == "clean text"
    assert (out[4].n_emails, out[4].n_urls, out[4].n_long_digit_runs) \
        == (0, 0, 0)


def test_random_projection_matches_python(emb):
    import math

    from locustdb_spark.operators.similarity import (
        _plane_sign, random_projection)

    row = emb.filter(F.col("vec_id") == 0).head()
    vec = [float(x) for x in row.embedding]
    out_dims = 4
    scale = 1.0 / math.sqrt(out_dims)
    expected = [
        round(sum(x * _plane_sign(j, i) for i, x in enumerate(vec)) * scale, 6)
        for j in range(out_dims)
    ]
    got = random_projection(emb.filter(F.col("vec_id") == 0),
                            out_dims).head().projected
    assert [round(g, 6) for g in got] == expected


def test_random_projection_roughly_preserves_norms(emb):
    """JL sanity: mean squared norm is preserved in expectation by the
    +-1/sqrt(d') projection (loose 2x tolerance on 50 vectors)."""
    from locustdb_spark.operators.similarity import random_projection

    sub = emb.filter(F.col("vec_id") < 50)
    orig = sub.select(
        F.aggregate(F.col("embedding").cast("array<double>"), F.lit(0.0),
                    lambda a, v: a + v * v).alias("n2")).collect()
    proj = random_projection(sub, 16).select(
        F.aggregate("projected", F.lit(0.0),
                    lambda a, v: a + v * v).alias("n2")).collect()
    mo = sum(r.n2 for r in orig) / len(orig)
    mp = sum(r.n2 for r in proj) / len(proj)
    assert 0.5 < mp / mo < 2.0


def test_boilerplate_fraction_known_values(spark):
    from locustdb_spark.operators.text import boilerplate_fraction

    shared = "X" * 64  # one full chunk, identical across docs 1 and 2
    rows = [
        (1, shared + "unique-tail-one"),
        (2, shared + "a-different-unique-tail"),
        (3, "entirely unique document text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           boilerplate_fraction(df, chunk_chars=64).collect()}
    assert out[1].n_shared_chunks == 1 and out[1].n_chunks == 2
    assert out[2].n_shared_chunks == 1
    assert out[3].n_shared_chunks == 0 and out[3].shared_fraction == 0.0
    assert abs(out[1].shared_fraction - 0.5) < 1e-9


def test_minhash_xxhash64_fast_path(spark):
    """hash_fn='xxhash64' (the production fast path): same schema and
    MinHash property — identical texts get identical signatures, and
    the near-dup pair found by the md5 basis is found here too."""
    from locustdb_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different content with no shared shingles xyz")],
        ["doc_id", "text"])
    for hf in ("md5", "xxhash64"):
        sig = minhash_signatures(docs, num_hashes=4, hash_fn=hf)
        assert sig.columns == ["doc_id", "mh0", "mh1", "mh2", "mh3"]
        rows = {r.doc_id: (r.mh0, r.mh1, r.mh2, r.mh3)
                for r in sig.collect()}
        assert rows[1] == rows[2]
        assert rows[1] != rows[3]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="hash_fn"):
        minhash_signatures(docs, hash_fn="sha9000")


def test_repetition_stats(spark):
    """Duplicate-3-gram repetition: a looping doc is flagged, a
    non-repeating doc keeps, and counts are exact."""
    from locustdb_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c a b c"),      # loops: heavy dup 3-grams
         (2, "one two three four five six"),  # all distinct
         (3, "x")],                           # too short for any 3-gram
        ["doc_id", "text"])
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert out[2].n_ngrams == 4 and out[2].n_dup == 0 and out[2].keep
    assert out[3].n_ngrams == 0 and out[3].keep
    # doc 1: 10 3-grams, only 3 distinct ('a b c','b c a','c a b')
    assert out[1].n_ngrams == 10 and out[1].n_distinct == 3
    assert out[1].n_dup == 7 and not out[1].keep


def test_minhash_xxhash64_matches_exploded_formulation(spark):
    """Equivalence check for the benched xxhash64 production path
    (ADVICE r1: the bench times a path the DuckDB oracle can't see).
    Recompute every signature lane through a structurally different
    plan — explode shingles, hash each once with the same seeds,
    groupBy-min per lane — and require bit-identical results. This
    pins the zip_with/array_min double-hashing algebra against Spark's
    own xxhash64, independent of the vectorized formulation."""
    from pyspark.sql import functions as F

    from locustdb_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared tokens and "
             f"unique tail {i * 7919}") for i in range(20)],
        ["doc_id", "text"])
    num_hashes, k, mask = 6, 5, (1 << 56) - 1

    fast = {r.doc_id: tuple(r[f"mh{j}"] for j in range(num_hashes))
            for r in minhash_signatures(
                docs, num_hashes=num_hashes, shingle_k=k,
                hash_fn="xxhash64").collect()}

    text = F.lower(F.col("text"))
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1))),
        lambda i: text.substr(i, F.lit(k)),
    )
    exploded = docs.select("doc_id", F.explode(sh).alias("s")).select(
        "doc_id",
        F.xxhash64("s").bitwiseAND(F.lit(mask)).alias("h1"),
        F.xxhash64("s", F.lit(1)).bitwiseAND(F.lit(mask)).alias("h2"),
    )
    slow_df = exploded.groupBy("doc_id").agg(*[
        F.min((F.col("h1") + F.lit(j) * F.col("h2"))
              .bitwiseAND(F.lit(mask))).alias(f"mh{j}")
        for j in range(num_hashes)
    ])
    slow = {r.doc_id: tuple(r[f"mh{j}"] for j in range(num_hashes))
            for r in slow_df.collect()}
    assert fast == slow


def test_segment_dedup_two_phase_matches_window_under_heavy_skew(spark):
    """Adversarial skew: one boilerplate segment appears in >=30% of
    documents. The shipped two-phase (partial-agg + join-back)
    formulations must be row-identical to the window formulation they
    replaced (r1 scale finding: Window.partitionBy(segment) serialized
    every copy of a hot segment through one reducer)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from locustdb_spark.operators.dedup import (
        _explode_segments, dedup_segments, drop_frequent_segments)

    nav = "home about contact privacy terms careers blog help"
    rows = []
    for i in range(200):
        body = f"unique body {i} alpha beta gamma {i * 31} delta"
        if i % 3 == 0:  # 34% of docs carry the boilerplate segment
            rows.append((i, nav + " " + body))
        else:
            rows.append((i, body))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def window_dedup_segments(df):
        exploded = _explode_segments(df, "doc_id", "text", 8)
        w = Window.partitionBy("segment").orderBy("id", "seg_idx")
        kept = exploded.withColumn("_rn", F.row_number().over(w))
        keep = F.col("_rn") == 1
        return kept.groupBy("id").agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long")
            .alias("n_kept"),
            F.array_join(F.transform(F.array_sort(F.collect_list(
                F.when(keep, F.struct("seg_idx", "segment")))),
                lambda s: s.segment), " ").alias("text_clean"))

    def window_drop_frequent(df):
        exploded = _explode_segments(df, "doc_id", "text", 8)
        w = Window.partitionBy("segment")
        counted = exploded.withColumn("_n", F.count(F.lit(1)).over(w))
        keep = F.col("_n") < 3
        return counted.groupBy("id").agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long")
            .alias("n_kept"),
            F.array_join(F.transform(F.array_sort(F.collect_list(
                F.when(keep, F.struct("seg_idx", "segment")))),
                lambda s: s.segment), " ").alias("text_clean"))

    def as_map(df):
        return {r.id: (r.n_segments, r.n_kept, r.text_clean)
                for r in df.collect()}

    assert as_map(dedup_segments(docs)) == as_map(window_dedup_segments(docs))
    assert as_map(drop_frequent_segments(docs, min_count=3)) == \
        as_map(window_drop_frequent(docs))
    # the hot segment really is hot: it survives exactly once
    hot = dedup_segments(docs)
    survivors = sum(1 for r in hot.collect() if nav in r.text_clean)
    assert survivors == 1


def test_lsh_exact_collapse_is_linear_in_duplicate_group(spark):
    """10k identical docs (degenerate LSH bucket, r1 finding): pair
    output must be O(n) — one star pair per member — not the O(n^2)
    clique a naive band self-join emits; clustering still groups all
    of them, and a corpus with no identical signatures is unaffected."""
    from pyspark.sql import functions as F

    from locustdb_spark.operators.dedup import (
        dedup_clusters, lsh_candidate_pairs, minhash_signatures)

    n = 10_000
    dup = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate document body repeated").alias("text"))
    distinct_tail = spark.createDataFrame(
        [(n + i, f"totally unique document {i} {i * 7919}")
         for i in range(5)], ["doc_id", "text"])
    docs = dup.unionByName(distinct_tail)
    sigs = minhash_signatures(docs, num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    n_pairs = pairs.count()
    assert n_pairs < 2 * n  # linear, not ~50M
    # all 10k identical docs end in one cluster with one keeper
    clusters = dedup_clusters(docs, pairs)
    dup_rows = clusters.filter(F.col("doc_id") < n).collect()
    assert {r.cluster_id for r in dup_rows} == {0}
    assert sum(r.is_keep for r in dup_rows) == 1


def test_lsh_max_bucket_drops_oversized_buckets(spark):
    """max_bucket: buckets above the cap are dropped before the
    self-join (stop-word analog); small buckets still pair."""
    from pyspark.sql import functions as F

    from locustdb_spark.operators.dedup import lsh_candidate_pairs

    # hand-built signatures: ids 0-49 share every band (one huge
    # bucket after collapse? no — make them near-identical, distinct
    # sigs sharing band 0 only), ids 100/101 share all bands.
    rows = []
    for i in range(50):
        # band 0 = (mh0, mh1) identical; bands 1-3 unique per doc
        rows.append((i, 1, 2, 1000 + i, 2000 + i, 3000 + i,
                     4000 + i, 5000 + i, 6000 + i))
    rows.append((100, 7, 8, 9, 10, 11, 12, 13, 14))
    rows.append((101, 7, 8, 9, 10, 11, 12, 13, 14))
    sigs = spark.createDataFrame(
        rows, ["doc_id"] + [f"mh{j}" for j in range(8)])
    capped = lsh_candidate_pairs(sigs, num_hashes=8, bands=4,
                                 max_bucket=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 101)}  # the 50-doc band-0 bucket was dropped
    uncapped = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    assert uncapped.count() == 50 * 49 // 2 + 1


def test_lsh_naive_mega_bucket_audit_warns(spark):
    """audit_bucket guardrail (r8 sf10 finding: one 73k-doc band
    bucket ~ 2.7B pairs, discovered only mid-job): the naive path
    measures the largest band bucket BEFORE committing to the
    quadratic self-join and warns above the bound, naming the bucket
    and projected pair count; the collapsed path (O(n) star pairs by
    construction) and an under-bound naive corpus stay silent."""
    import warnings

    from pyspark.sql import functions as F

    from locustdb_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures)

    n = 300
    dup = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate document body repeated")
        .alias("text"))
    sigs = minhash_signatures(dup, num_hashes=8).persist()

    def band_warnings(caught):
        return [str(w.message) for w in caught
                if "band bucket" in str(w.message)]

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        lsh_candidate_pairs(sigs, num_hashes=8, bands=4,
                            collapse_exact=False, audit_bucket=100)
        msgs = band_warnings(caught)
    assert len(msgs) == 1
    assert f"{n} documents" in msgs[0]
    assert str(n * (n - 1) // 2) in msgs[0]  # projected pair count

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        lsh_candidate_pairs(sigs, num_hashes=8, bands=4,
                            collapse_exact=True, audit_bucket=100).count()
        assert not band_warnings(caught)  # collapsed: silent

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        lsh_candidate_pairs(sigs, num_hashes=8, bands=4,
                            collapse_exact=False, audit_bucket=n)
        assert not band_warnings(caught)  # under the bound: silent

    # audit_action="raise" VETOES the join instead of warning (r9
    # ADVICE: a warning doesn't stop a multi-billion-pair job)
    with pytest.raises(ValueError, match="band bucket"):
        lsh_candidate_pairs(sigs, num_hashes=8, bands=4,
                            collapse_exact=False, audit_bucket=100,
                            audit_action="raise")
    with pytest.raises(ValueError, match="audit_action"):
        lsh_candidate_pairs(sigs, num_hashes=8, bands=4,
                            audit_action="veto")

    # default is LAZY (r9 ADVICE: no eager job at plan-construction
    # time): building the naive plan runs no audit warning and no
    # Spark job at all
    def n_jobs():
        return (spark.sparkContext._jsc.sc()
                .statusStore().jobsList(None).size())

    before = n_jobs()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        lsh_candidate_pairs(sigs, num_hashes=8, bands=4,
                            collapse_exact=False)
        assert not band_warnings(caught)
    assert n_jobs() == before
    sigs.unpersist()


def test_simhash_near_dup_pairs_recall_guarantee(spark):
    """Pigeonhole recall: with bands=4 over 32 bits, every pair within
    Hamming distance 3 MUST be found; far pairs must not appear."""
    from pyspark.sql import functions as F

    from locustdb_spark.operators.dedup import (
        simhash, simhash_near_dup_pairs)

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet forest all day long")
    docs = spark.createDataFrame(
        [(0, base),
         (1, base.replace("quick", "quikc")),      # tiny perturbation
         (2, base.replace("dog", "cat")),
         (3, "completely different text about spark shuffles and "
             "parquet footers and catalyst optimizers xyz")],
        ["doc_id", "text"])
    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}

    def ham(a, b):
        return bin(sigs[a] ^ sigs[b]).count("1")

    got = {(r.id_a, r.id_b): r.hamming
           for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()}
    for a in range(4):
        for b in range(a + 1, 4):
            if ham(a, b) <= 3:
                assert got[(a, b)] == ham(a, b)
            else:
                assert (a, b) not in got or got[(a, b)] <= 3


def test_minhash_jaccard_estimate_bounds_and_exact_dup(spark):
    from pyspark.sql import functions as F

    from locustdb_spark.operators.dedup import (
        minhash_jaccard_estimate, minhash_signatures)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),   # exact dup
         (3, "totally unrelated words qqq www eee rrr")],
        ["doc_id", "text"])
    sigs = minhash_signatures(docs, num_hashes=8)
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    est = {(r.id_a, r.id_b): r.jaccard_est
           for r in minhash_jaccard_estimate(sigs, pairs, num_hashes=8)
           .collect()}
    assert est[(1, 2)] == 1.0           # identical text -> all lanes agree
    assert 0.0 <= est[(1, 3)] < 0.5     # unrelated -> low estimate


def test_cap_per_group_matches_window_under_skew(spark):
    """One source holds 90% of the corpus; the salted two-phase cap
    must select exactly the rows a row_number window would."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from locustdb_spark.operators.sampling import cap_per_group

    rows = [(i, "hot" if i % 10 != 0 else f"cold{i % 70}")
            for i in range(2000)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    k = 13
    got = {(r.source, r.doc_id)
           for r in cap_per_group(docs, "source", "doc_id", k=k,
                                  salt_buckets=8).collect()}
    w = Window.partitionBy("source").orderBy("doc_id")
    want = {(r.source, r.doc_id)
            for r in docs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).collect()}
    assert got == want
    # the hot group is capped at exactly the k smallest ids
    hot = sorted(d for s, d in got if s == "hot")
    assert hot == sorted(d for d, s in rows if s == "hot")[:k]


def test_cap_per_group_plan_has_no_window(spark):
    from locustdb_spark.operators.sampling import cap_per_group

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    plan = cap_per_group(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan


def _make_png(w, h, ch=3, seed=7):
    """A real PNG built with stdlib only (known pixel values)."""
    import numpy as np

    from locustdb_spark.operators.codecs import png_encode

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return png_encode(px), px


def _make_wav(channels=2, rate=16000, n_frames=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(
            f"<{n_frames * channels}h",
            *([100, -100] * (n_frames * channels // 2))))
    return buf.getvalue()


def test_png_codec_roundtrip_and_all_filters():
    """png_decode inverts png_encode bit-exactly, and unfilters
    scanlines written with every filter type (0-4) — hand-built IDAT
    per the public PNG spec."""
    import struct
    import zlib

    import numpy as np

    from locustdb_spark.operators.codecs import (
        PNG_MAGIC, png_decode, png_encode)

    data, px = _make_png(13, 9, 3)
    w, h, ch, out = png_decode(data)
    assert (w, h, ch) == (13, 9, 3)
    assert np.array_equal(out, px)
    # gray + alpha channels too
    for channels in (1, 2, 4):
        data, px = _make_png(5, 4, channels)
        *_, out = png_decode(data)
        assert np.array_equal(out, px)

    # every filter type: encode one 4x5 gray image per filter by hand
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(5, 4, 1), dtype=np.uint8)
    for ftype in range(5):
        raw = bytearray()
        prev = np.zeros(4, dtype=np.int32)
        for y in range(5):
            line = px[y, :, 0].astype(np.int32)
            raw.append(ftype)
            for x in range(4):
                a = int(line[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1}.get(ftype)
                if pred is None:  # paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                raw.append((int(line[x]) - pred) & 0xFF)
            prev = line

        def chunk(t, body):
            return (struct.pack(">I", len(body)) + t + body
                    + struct.pack(">I", zlib.crc32(t + body)))

        blob = (PNG_MAGIC
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 0,
                                             0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        *_, out = png_decode(blob)
        assert np.array_equal(out, px), f"filter {ftype}"


def test_decode_media_real_png_and_wav(spark):
    """REAL multimodal decode: actual PNG and WAV bytes through the
    Arrow-batched pipeline; corrupt blobs degrade, never fail."""
    from locustdb_spark.operators.multimodal import (
        decode_media, real_decoders_available)

    assert real_decoders_available("png")
    assert real_decoders_available("wav")
    png, _ = _make_png(32, 20, 3)
    wav = _make_wav(channels=2, rate=16000, n_frames=8000)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav)),
         (3, bytearray(b"\x89PNGgarbage-not-really")),
         (4, bytearray(b"plain bytes"))],
        "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_media(df).collect()}
    assert (out[1].format, out[1].width, out[1].height,
            out[1].channels) == ("png", 32, 20, 3)
    assert (out[2].format, out[2].channels, out[2].sample_rate,
            out[2].duration_s) == ("wav", 2, 16000, 0.5)
    assert out[3].format == "unknown" and out[3].width is None
    assert out[4].format == "unknown"
    assert out[1].n_bytes == len(png)


def test_resize_image_real_png(spark):
    """REAL resize: PNG in, smaller PNG out, pixels = nearest-neighbor
    of the source (checked by decoding the output)."""
    import numpy as np

    from locustdb_spark.operators.codecs import (
        png_decode, png_resize_nearest)
    from locustdb_spark.operators.multimodal import resize_image

    png, px = _make_png(16, 12, 3)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not png"))],
        "doc_id long, payload binary")
    out = {r.doc_id: r for r in resize_image(df, 8, 6).collect()}
    w, h, ch, got = png_decode(bytes(out[1].resized))
    assert (w, h, ch) == (8, 6, 3)
    assert np.array_equal(got, png_resize_nearest(px, 8, 6))
    assert out[2].resized is None and out[2].n_bytes is None


def test_stratified_sample_matches_window_under_hot_stratum(spark):
    """90%-hot stratum: the salted two-phase stratified sampler selects
    exactly the rows the row_number window formulation would, and the
    plan has no Window."""
    from locustdb_spark.operators.sampling import stratified_sample

    rows = [(i, "en" if i % 10 != 0 else f"l{i % 30}") for i in range(1500)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_sample(docs, "lang", 7)
    got = {(r.lang, r.doc_id) for r in out.collect()}
    # reproduce the selection independently in python
    import hashlib

    def hsh(i):
        s = f"{i}|strata"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = set()
    by_lang = {}
    for i, lang in rows:
        by_lang.setdefault(lang, []).append((hsh(i), i))
    for lang, lst in by_lang.items():
        for _, i in sorted(lst)[:7]:
            want.add((lang, i))
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_pack_sequences_substreams_disjoint_and_budgeted(spark):
    """streams_per_group > 1: bins are globally unique, every bin obeys
    the budget rule (first doc may exceed; others fit the running
    window), and the default path is unchanged."""
    from pyspark.sql import functions as F

    from locustdb_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, "en", 50 + (i * 37) % 100) for i in range(300)],
        ["doc_id", "lang", "n_chars"])
    out = pack_sequences(docs, budget=256, streams_per_group=4).collect()
    # bin -> stream is consistent (bin_id encodes the stream)
    assert {r.bin_id % 4 for r in out} <= {0, 1, 2, 3}
    # per-bin sizes respect the running-window rule within each stream
    from collections import defaultdict
    per_bin = defaultdict(int)
    for r in out:
        per_bin[r.bin_id] += r.n_chars
    # all but the last bin of each stream are at least budget-full
    # modulo one document's spillover; sanity: no bin is wildly over
    assert all(v < 256 + 150 for v in per_bin.values())
    # default path (1 stream) unchanged: same bins as before
    base = pack_sequences(docs, budget=256).collect()
    assert {r.bin_id for r in base} == set(range(max(
        r.bin_id for r in base) + 1))


def test_lm_score_matches_pure_python(spark):
    """avg_logprob (the float part the oracle can't hash) against an
    independent pure-Python reimplementation: add-one smoothing over
    the model total, mean log10 per document."""
    import math

    from locustdb_spark.operators.lm import ngram_counts, score_documents

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "completely novel words here"),
        (4, "the cat"),
        (5, "x"),            # 1 token -> zero bigrams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = ngram_counts(docs.filter("doc_id <= 2"), n=2)
    out = {r.doc_id: r for r in
           score_documents(docs, model, n=2).collect()}

    # python reference
    def bigrams(t):
        toks = [w for w in t.lower().split(" ") if w]
        return [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]

    counts = {}
    for did, t in rows:
        if did <= 2:
            for g in bigrams(t):
                counts[g] = counts.get(g, 0) + 1
    total, vocab = sum(counts.values()), len(counts)
    for did, t in rows:
        gs = bigrams(t)
        r = out[did]
        assert r.n_ngrams == len(gs)
        if not gs:
            assert r.avg_logprob is None
            assert (r.n_unseen, r.seen_cnt_sum) == (0, 0)
            continue
        assert r.n_unseen == sum(1 for g in gs if g not in counts)
        assert r.seen_cnt_sum == sum(counts.get(g, 0) for g in gs)
        exp = sum(math.log10((counts.get(g, 0) + 1) / (total + vocab))
                  for g in gs) / len(gs)
        assert abs(r.avg_logprob - exp) < 1e-9, (did, r.avg_logprob, exp)


def test_lm_broadcast_model_equivalent(spark):
    from locustdb_spark.operators.lm import ngram_counts, score_documents

    docs = spark.read.parquet(f"{TESTDATA_SF}/documents.parquet") \
        .limit(40)
    model = ngram_counts(docs, n=2, min_count=2)
    a = score_documents(docs, model, n=2).orderBy("doc_id").collect()
    b = score_documents(docs, model, n=2,
                        broadcast_model=True).orderBy("doc_id").collect()
    assert a == b


def test_lm_perplexity_filter_keeps_in_distribution(spark):
    from locustdb_spark.operators.lm import ngram_counts, \
        perplexity_filter

    rows = [(1, "alpha beta gamma alpha beta"),
            (2, "alpha beta gamma delta"),
            (3, "totally unrelated gibberish tokens qq zz")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = ngram_counts(docs.filter("doc_id = 1"), n=2)
    kept = sorted(r.doc_id for r in perplexity_filter(
        docs, model, n=2, max_unseen_frac=0.5).collect())
    assert 1 in kept and 3 not in kept


def test_kmv_distinct_exact_below_k_and_estimates_above(spark):
    from locustdb_spark.operators.sampling import kmv_distinct

    rows = [("small", i % 10) for i in range(200)] + \
           [("big", i) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, uid long")
    out = {r.g: r.distinct_est
           for r in kmv_distinct(df, "g", "uid", k=64).collect()}
    assert out["small"] == 10  # below k -> exact
    # KMV rse ~ 1/sqrt(k-1) ~ 12.6%; allow 3 sigma
    assert abs(out["big"] - 5000) < 5000 * 0.4, out["big"]


def test_ivf_assign_expr_matches_numpy(spark):
    """The oracle-checkable expression assignment and the fast numpy
    path agree on every vector (same centroids, same argmax)."""
    from locustdb_spark.operators.similarity import (
        ivf_assign, ivf_assign_expr)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(300)
    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 8").orderBy("vec_id")
             .collect()]
    a = {r.vec_id: r.cluster
         for r in ivf_assign(emb, cents).collect()}
    b = {r.vec_id: r.cluster
         for r in ivf_assign_expr(emb, cents).collect()}
    assert a == b


def test_ivf_frozen_full_probe_is_exact(spark):
    """assign='expr' with nprobe == n_clusters equals brute-force
    cosine top-k."""
    from locustdb_spark.operators.similarity import (
        ann_ivf_topk, cosine_topk)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(500)
    q = [float(x)
         for x in emb.filter("vec_id = 0").head().embedding]
    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 8").orderBy("vec_id")
             .collect()]
    exact = cosine_topk(emb, q, k=10).collect()
    ivf = ann_ivf_topk(emb, q, k=10, nprobe=8, centroids=cents,
                       assign="expr").collect()
    assert exact == ivf


def test_bpe_train_classic_example():
    """Sennrich-style toy vocab: the first merges must fuse the most
    frequent adjacent pair, ties broken lexicographically."""
    from locustdb_spark.operators.bpe import (END, segment_word,
        train_bpe_py)

    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_py(counts, 10)
    # (t,</w>), (s,t..), (e,s..) all hit 9 (newest 6 + widest 3);
    # the deterministic tie-break is lexicographically LARGEST pair,
    # so (t,</w>) wins round 1, and the chain merges est</w> next
    assert merges[0] == ("t", END)
    assert merges[1] == ("s", "t" + END)
    assert merges[2] == ("e", "st" + END)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    segs = segment_word("newest", ranks)
    assert "".join(segs) == "newest</w>"
    assert len(segs) < len("newest") + 1  # actually merged something


def test_bpe_expr_matches_fast_path(spark):
    from locustdb_spark.operators.bpe import (
        bpe_encode_count, bpe_token_count_expr, train_bpe,
        word_histogram)

    docs = spark.read.parquet(f"{TESTDATA_SF}/documents.parquet") \
        .limit(60)
    merges = train_bpe(word_histogram(docs), num_merges=30)
    fast = {r.doc_id: (r.n_words, r.n_tokens)
            for r in bpe_encode_count(docs, merges).collect()}
    expr = {r.doc_id: (r.n_words, r.n_tokens)
            for r in bpe_token_count_expr(docs, merges).collect()}
    assert fast == expr
    # tokens per word strictly between 1 and chars+1
    for did, (nw, nt) in fast.items():
        assert nt >= nw  # at least one token per word


def test_bpe_edge_cases(spark):
    from locustdb_spark.operators.bpe import bpe_encode_count

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a"), (4, None)],
        "doc_id long, text string")
    out = {r.doc_id: (r.n_words, r.n_tokens)
           for r in bpe_encode_count(docs, []).collect()}
    assert out[1] == (0, 0) and out[2] == (0, 0)
    assert out[3] == (1, 2)  # 'a' + '</w>' with no merges
    assert out[4] == (0, 0)


def test_bpe_expr_handles_adjacent_merges(spark):
    """Regression (r3 review): 'banana'-style words have ADJACENT
    occurrences of a merge pair; a space-separated replace encoding
    consumed the shared separator and missed the second one. The
    framed-symbol encoding must match the greedy fast path exactly."""
    from locustdb_spark.operators.bpe import (
        bpe_encode_count, bpe_token_count_expr, train_bpe_py)

    docs = spark.createDataFrame(
        [(1, "banana haha low"), (2, "nananananana hahahaha"),
         (3, "2020 20202020")],
        "doc_id long, text string")
    merges = train_bpe_py(
        {"banana": 3, "haha": 2, "low": 1, "nana": 2, "2020": 2}, 12)
    fast = {r.doc_id: (r.n_words, r.n_tokens)
            for r in bpe_encode_count(docs, merges).collect()}
    expr = {r.doc_id: (r.n_words, r.n_tokens)
            for r in bpe_token_count_expr(docs, merges).collect()}
    assert fast == expr, (fast, expr)


def test_ivf_index_layout_prunes_partitions(spark, tmp_path):
    """build_ivf_index writes cluster-partitioned parquet and
    probe_ivf_index reads ONLY the probed clusters: the probe plan's
    PartitionFilters carry the cluster IN-list (directory pruning —
    nprobe/n_clusters of the bytes), and results equal running the
    same probe over the full table."""
    from locustdb_spark.operators.similarity import (
        ann_ivf_topk, build_ivf_index, probe_ivf_index)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(600)
    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 8").orderBy("vec_id")
             .collect()]
    path = str(tmp_path / "ivf_index")
    out_cents = build_ivf_index(emb, path, centroids=cents)
    assert out_cents == cents
    q = [float(x) for x in emb.filter("vec_id = 3").head().embedding]

    probed = probe_ivf_index(spark, path, q, k=5, nprobe=2)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    # the scan must NOT read all partitions: isin list has 2 entries
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), plan[:800]

    direct = ann_ivf_topk(emb, q, k=5, nprobe=2, centroids=cents)
    assert probed.collect() == direct.collect()


def test_lsh_index_layout_prunes_and_matches(spark, tmp_path):
    """build_lsh_index/probe_lsh_index: bucket-partitioned parquet,
    Hamming-radius probe list in the PartitionFilters, results equal
    the in-memory ann_lsh_topk on the same corpus."""
    from locustdb_spark.operators.similarity import (
        ann_lsh_topk, build_lsh_index, probe_lsh_index)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(600)
    path = str(tmp_path / "lsh_index")
    build_lsh_index(emb, path, num_planes=4)
    q = [float(x) for x in emb.filter("vec_id = 0").head().embedding]

    probed = probe_lsh_index(spark, path, q, k=8, num_planes=4,
                             multiprobe=1)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:800]
    direct = ann_lsh_topk(emb, q, k=8, num_planes=4, multiprobe=1)
    assert probed.collect() == direct.collect()


def test_ann_knn_join_matches_per_query_probes(spark, tmp_path):
    """Indexed k-NN join == one probe_ivf-style query per probe
    vector: same centroids, same nprobe, same tie-breaks. The batch
    path must also prune partitions (PartitionFilters carries the
    union of probed clusters, not all of them)."""
    import re

    from locustdb_spark.operators.similarity import (
        ann_ivf_topk, ann_knn_join, build_ivf_index)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(600)
    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 8").orderBy("vec_id")
             .collect()]
    path = str(tmp_path / "ivf_knn")
    build_ivf_index(emb, path, centroids=cents, assign="expr")

    queries = emb.filter("vec_id IN (3, 11)")
    out = ann_knn_join(spark, path, queries, k=5, nprobe=2,
                       exclude_self=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), plan[:800]

    got = {}
    for r in out.collect():
        got.setdefault(r.q_id, []).append((r.vec_id, r.cosine_sim))
    assert set(got) == {3, 11}
    for qid in (3, 11):
        qv = [float(x)
              for x in emb.filter(f"vec_id = {qid}").head().embedding]
        exp = [(r.vec_id, r.cosine_sim)
               for r in ann_ivf_topk(emb, qv, k=5, nprobe=2,
                                     centroids=cents,
                                     assign="expr").collect()]
        assert got[qid] == exp, (qid, got[qid], exp)


def test_ann_knn_join_excludes_self_and_caps_k(spark, tmp_path):
    from locustdb_spark.operators.similarity import (
        ann_knn_join, build_ivf_index)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(200)
    path = str(tmp_path / "ivf_knn2")
    build_ivf_index(emb, path, n_clusters=4)
    queries = emb.filter("vec_id < 3")
    rows = ann_knn_join(spark, path, queries, k=4, nprobe=4).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) <= 4
        assert all(r.vec_id != qid for r in rs)
        sims = [r.cosine_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        # nprobe == n_clusters and the query is its own nearest
        # neighbor, so with self excluded every remaining sim < 1
        assert all(s <= 1.0 for s in sims)


# ---------------------------------------------------------------------
# IVF index maintenance: incremental append / upsert / drift
# ---------------------------------------------------------------------

def _frozen_cents(emb, n=8):
    return [[float(x) for x in r.embedding]
            for r in emb.filter(f"vec_id < {n}").orderBy("vec_id")
            .collect()]


def test_append_ivf_index_equals_full_rebuild(spark, tmp_path):
    """Build on half the corpus, append the other half with the frozen
    centroids: the maintained index must hold exactly the rows a full
    rebuild (same centroids) holds, and probes must answer
    identically. This is the 'append path loses and duplicates
    nothing' invariant."""
    from locustdb_spark.operators.similarity import (
        append_ivf_index, build_ivf_index, probe_ivf_index)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(600)
    cents = _frozen_cents(emb)
    inc = str(tmp_path / "ivf_inc")
    full = str(tmp_path / "ivf_full")
    build_ivf_index(emb.filter("vec_id % 2 = 0"), inc, centroids=cents,
                    assign="expr")
    append_ivf_index(emb.filter("vec_id % 2 = 1"), inc, assign="expr")
    build_ivf_index(emb, full, centroids=cents, assign="expr")

    a = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(inc).select("vec_id", "cluster")
               .collect())
    b = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(full).select("vec_id", "cluster")
               .collect())
    assert a == b and len(a) == 500

    q = [float(x) for x in emb.filter("vec_id = 3").head().embedding]
    got = probe_ivf_index(spark, inc, q, k=5, nprobe=2).collect()
    exp = probe_ivf_index(spark, full, q, k=5, nprobe=2).collect()
    assert got == exp


def test_upsert_ivf_index_replaces_and_relocates(spark, tmp_path):
    """Upsert replaces existing ids (no duplicates) and relocates rows
    whose new vector assigns to a different cluster; the result equals
    a full rebuild over the post-upsert corpus with the same frozen
    centroids."""
    from locustdb_spark.operators.similarity import (
        append_ivf_index, build_ivf_index)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(400)
    cents = _frozen_cents(emb)
    path = str(tmp_path / "ivf_up")
    build_ivf_index(emb, path, centroids=cents, assign="expr")

    # replace ids 0..49 with the embedding of (id+200) — many will
    # land in a different cluster than before
    moved = (emb.filter("vec_id >= 200 AND vec_id < 250")
             .withColumn("vec_id", F.col("vec_id") - 200))
    append_ivf_index(moved, path, assign="expr", upsert=True)

    post = emb.filter("vec_id >= 50").unionByName(moved)
    rebuilt = str(tmp_path / "ivf_up_rebuild")
    build_ivf_index(post, rebuilt, centroids=cents, assign="expr")

    a = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(path).select("vec_id", "cluster")
               .collect())
    b = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(rebuilt).select("vec_id", "cluster")
               .collect())
    assert a == b and len(a) == 400
    ids = [x[0] for x in a]
    assert len(ids) == len(set(ids))  # no duplicate ids survive


def test_upsert_ivf_index_empties_a_cluster(spark, tmp_path):
    """When an upsert moves EVERY row out of a cluster, the stale
    partition directory must disappear (a dynamic-overwrite-style
    write would silently leave the old files)."""
    from locustdb_spark.operators.similarity import (
        append_ivf_index, build_ivf_index)

    # two orthogonal centroids; all corpus rows start in cluster 0
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(i, [1.0, 0.01 * i]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_empty")
    build_ivf_index(df, path, centroids=cents, assign="expr")
    assert (tmp_path / "ivf_empty" / "cluster=0").exists()

    flipped = spark.createDataFrame(
        [(i, [0.01 * i, 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>")
    append_ivf_index(flipped, path, assign="expr", upsert=True)

    got = spark.read.parquet(path).select("vec_id", "cluster").collect()
    assert sorted(r.vec_id for r in got) == list(range(6))
    assert {r.cluster for r in got} == {1}
    assert not (tmp_path / "ivf_empty" / "cluster=0").exists()
    # unique-token staging dirs, aside dirs, and the writer lock must
    # all be gone after a clean upsert
    assert not list(tmp_path.glob("ivf_empty__upsert_stage*"))
    assert not list((tmp_path / "ivf_empty").glob(".upsert_aside_*"))
    assert not (tmp_path / "ivf_empty" / "_upsert.lock").exists()


def test_ivf_drift_baseline_and_retrain_signal(spark, tmp_path):
    """stats=True captures a per-cluster baseline at build; appending
    vectors the frozen quantizer fits poorly raises mean_dist above
    baseline and trips ivf_retrain_needed — the recall-drift signal an
    incrementally-maintained index must expose."""
    from locustdb_spark.operators.similarity import (
        append_ivf_index, build_ivf_index, ivf_drift,
        ivf_retrain_needed)

    # two orthogonal centroids, corpus hugging them (near-zero
    # baseline distance) — a drifted batch lands between the axes
    cents = [[1.0, 0.0], [0.0, 1.0]]
    near = [(i, [1.0, 0.001 * (i % 5)]) for i in range(50)] + \
           [(100 + i, [0.001 * (i % 5), 1.0]) for i in range(50)]
    df = spark.createDataFrame(
        near, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_drift")
    build_ivf_index(df, path, centroids=cents, assign="expr",
                    stats=True)

    rep0 = {r.cluster: r for r in ivf_drift(spark, path).collect()}
    for r in rep0.values():
        assert r.baseline_n == r.n
        assert r.baseline_mean_dist == pytest.approx(r.mean_dist)
    assert not ivf_retrain_needed(spark, path, threshold=1.05)

    # drifted batch: diagonal vectors are cos 0.707 from BOTH known
    # centroids — the frozen quantizer fits them badly
    bad = spark.createDataFrame(
        [(10000 + i, [1.0, 1.0]) for i in range(50)],
        "vec_id long, embedding array<double>")
    append_ivf_index(bad, path, assign="expr")
    rep1 = ivf_drift(spark, path).collect()
    cur = sum(r.n * r.mean_dist for r in rep1) / sum(r.n for r in rep1)
    base = (sum(r.baseline_n * r.baseline_mean_dist for r in rep1)
            / sum(r.baseline_n for r in rep1))
    assert cur > base
    assert ivf_retrain_needed(spark, path, threshold=1.05)


def test_ivf_retrain_needed_requires_baseline(spark, tmp_path):
    from locustdb_spark.operators.similarity import (
        build_ivf_index, ivf_retrain_needed)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(100)
    path = str(tmp_path / "ivf_nobase")
    build_ivf_index(emb, path, centroids=_frozen_cents(emb),
                    assign="expr")
    with pytest.raises(ValueError, match="_stats.json"):
        ivf_retrain_needed(spark, path)


def test_embedding_near_dup_arrow_equals_expr(emb):
    """The per-bucket numpy kernel accumulates dots/norms dimension-
    sequentially, so its pair similarities must be BIT-equal to the
    interpreted expression fold on the real corpus — same pairs, same
    rounded values."""
    from locustdb_spark.operators.dedup import embedding_near_dup

    a = sorted(map(tuple, embedding_near_dup(
        emb, threshold=0.1, num_planes=4, impl="expr").collect()))
    b = sorted(map(tuple, embedding_near_dup(
        emb, threshold=0.1, num_planes=4, impl="arrow").collect()))
    assert a == b and len(a) > 0


def test_ngram_jaccard_arrow_equals_expr(docs):
    """The Arrow gram-builder produces string-identical distinct-gram
    arrays (including short/empty-doc edge cases), so pair Jaccards
    must be bit-equal to the expression path on the real corpus."""
    from locustdb_spark.operators.dedup import ngram_jaccard_pairs

    a = docs.select(F.col("doc_id").alias("id_a"),
                    F.col("n_chars").alias("nc_a"))
    b = docs.select(F.col("doc_id").alias("id_b"),
                    F.col("n_chars").alias("nc_b"))
    pairs = (a.join(b, (F.col("nc_a") == F.col("nc_b"))
                    & (F.col("id_a") < F.col("id_b")))
             .select("id_a", "id_b"))
    x = sorted(map(tuple, ngram_jaccard_pairs(docs, pairs,
                                              impl="expr").collect()))
    y = sorted(map(tuple,
                   ngram_jaccard_pairs(docs, pairs,
                                       impl="arrow").collect()))
    assert x == y


def test_ngram_jaccard_arrow_edge_docs(spark):
    """Short and empty documents hit the expression form's quirky
    sequence(0, greatest(size-n, 0)) edge (always one gram, possibly
    '') — the Arrow path must reproduce it exactly."""
    from locustdb_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "one two"), (4, "one two"),
         (5, "a b c d"), (6, "a b c d")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (1, 3)], "id_a long, id_b long")
    x = sorted(map(tuple, ngram_jaccard_pairs(docs, pairs,
                                              impl="expr").collect()))
    y = sorted(map(tuple,
                   ngram_jaccard_pairs(docs, pairs,
                                       impl="arrow").collect()))
    assert x == y
    j = {(r[0], r[1]): r[2] for r in y}
    assert j[(1, 2)] == 1.0 and j[(5, 6)] == 1.0 and j[(1, 3)] == 0.0


def test_lm_arrow_grams_equal_expr(docs):
    """Arrow n-gram expansion == expression expansion for LM training
    counts AND per-document scores on the real corpus (exact integer
    parts; log-prob to 1e-9)."""
    from locustdb_spark.operators.lm import ngram_counts, score_documents

    ref = docs.filter("doc_id % 3 = 0")
    m_e = ngram_counts(ref, impl="expr")
    m_a = ngram_counts(ref, impl="arrow")
    assert sorted(map(tuple, m_e.collect())) == \
        sorted(map(tuple, m_a.collect()))
    se = {r.doc_id: r
          for r in score_documents(docs, m_e, impl="expr").collect()}
    sa = {r.doc_id: r
          for r in score_documents(docs, m_e, impl="arrow").collect()}
    assert set(se) == set(sa) and len(se) == 500
    for d in se:
        assert (se[d].n_ngrams, se[d].n_unseen, se[d].seen_cnt_sum) == \
               (sa[d].n_ngrams, sa[d].n_unseen, sa[d].seen_cnt_sum)
        assert abs((se[d].avg_logprob or 0.0)
                   - (sa[d].avg_logprob or 0.0)) < 1e-9


def test_lm_arrow_grams_edge_cases(spark):
    """NULL text, empty text, and docs shorter than n produce the
    same (empty) gram sets in both implementations — the
    every-doc-restored contract."""
    from locustdb_spark.operators.lm import score_documents, ngram_counts

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one"), (4, "one two three")],
        "doc_id long, text string")
    model = ngram_counts(docs.filter("doc_id = 4"))
    for impl in ("expr", "arrow"):
        got = {r.doc_id: r.n_ngrams
               for r in score_documents(docs, model, impl=impl).collect()}
        assert got == {1: 0, 2: 0, 3: 0, 4: 2}, (impl, got)


def test_contamination_arrow_equals_expr(docs):
    from locustdb_spark.operators.text import contamination_check

    train = docs.filter("doc_id % 20 != 0")
    ev = docs.filter("doc_id % 20 = 0")
    a = sorted(map(tuple, contamination_check(train, ev,
                                              impl="expr").collect()))
    b = sorted(map(tuple,
                   contamination_check(train, ev,
                                       impl="arrow").collect()))
    assert a == b and len(a) == 475


def test_lexical_diversity_arrow_equals_expr(docs):
    """numpy unique-with-counts (O(n log n)) == the quadratic
    expression form, bit-for-bit: counts are integers and the ratios
    floor-truncate, so no float path can diverge."""
    from locustdb_spark.operators.text import lexical_diversity

    a = sorted(map(tuple, lexical_diversity(docs,
                                            impl="expr").collect()))
    b = sorted(map(tuple, lexical_diversity(docs, impl="arrow").collect()))
    assert a == b and len(a) == 500


def test_gopher_arrow_equals_expr(docs):
    """The O(n log n) numpy kernel == the quadratic expression form
    for every gopher rule on the real corpus (all-integer outputs)."""
    from locustdb_spark.operators.text import gopher_quality_filter

    a = sorted(map(tuple, gopher_quality_filter(docs,
                                                impl="expr").collect()))
    b = sorted(map(tuple,
                   gopher_quality_filter(docs, impl="arrow").collect()))
    assert a == b and len(a) == 500


def test_ivf_maintenance_missing_index_errors(spark, tmp_path):
    """Maintenance APIs on a path that is not a build_ivf_index layout
    fail with a named error, not a confusing downstream crash."""
    from locustdb_spark.operators.similarity import (
        append_ivf_index, ivf_drift)

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    missing = str(tmp_path / "not_an_index")
    with pytest.raises(FileNotFoundError, match="_centroids.json"):
        append_ivf_index(df, missing)
    with pytest.raises(FileNotFoundError, match="_centroids.json"):
        ivf_drift(spark, missing)


def test_embedding_near_dup_zero_norm_raises_both_impls(spark):
    """The session runs ANSI mode, where Spark 4 raises DIVIDE_BY_ZERO
    even for DOUBLE division — so a zero-norm vector makes the
    expression path FAIL, not emit NaN. The Arrow kernel must match
    that outcome instead of silently dropping (numpy NaN-compares
    false) or keeping NaN pairs — r6 ADVICE fix, pinned here."""
    from locustdb_spark.operators.dedup import embedding_near_dup

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>")
    # num_planes=0 -> single bucket: the zero vector pairs with others
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        embedding_near_dup(
            emb, threshold=0.9, num_planes=0, impl="expr").collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        embedding_near_dup(
            emb, threshold=0.9, num_planes=0, impl="arrow").collect()


def test_embedding_near_dup_arrow_round_boundary(spark):
    """The Arrow kernel's rounding is Spark round() BY CONSTRUCTION
    (BigDecimal HALF_UP on the double's shortest decimal repr,
    reproduced via python repr+decimal): pairs whose RAW similarity is
    just below threshold but round UP across it must be included, and
    the emitted value must equal Spark's rounded value exactly."""
    from locustdb_spark.operators.dedup import embedding_near_dup

    # cos((1,0),(cos t, sin t)) = cos t; pick cos t ~ 0.8999996 so the
    # raw sim rounds to 0.9 at round_to=6 and crosses threshold=0.9
    c = 0.89999960
    import math as m
    s = m.sqrt(1 - c * c)
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [c, s])],
        "vec_id long, embedding array<double>")
    a = {(r.id_a, r.id_b): r.cosine_sim for r in embedding_near_dup(
        emb, threshold=0.9, num_planes=0, impl="expr").collect()}
    b = {(r.id_a, r.id_b): r.cosine_sim for r in embedding_near_dup(
        emb, threshold=0.9, num_planes=0, impl="arrow").collect()}
    assert a == b == {(1, 2): 0.9}


def test_upsert_ivf_index_lock_excludes_second_writer(spark, tmp_path):
    """r6 (VERDICT task 3): a held `_upsert.lock` makes a second
    upsert fail fast with IvfUpsertLockError instead of interleaving
    renames with the first writer — and after the lock is released the
    retried upsert produces exactly the serial result."""
    from locustdb_spark.operators.similarity import (
        IvfUpsertLockError, append_ivf_index, build_ivf_index)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(200)
    cents = _frozen_cents(emb)
    path = str(tmp_path / "ivf_lock")
    build_ivf_index(emb, path, centroids=cents, assign="expr")

    # writer A "holds" the lock (simulate its critical section)
    lock = tmp_path / "ivf_lock" / "_upsert.lock"
    lock.write_bytes(b'{"token": "held-by-A"}')
    moved = (emb.filter("vec_id >= 100 AND vec_id < 120")
             .withColumn("vec_id", F.col("vec_id") - 100))
    with pytest.raises(IvfUpsertLockError, match="_upsert.lock"):
        append_ivf_index(moved, path, assign="expr", upsert=True)
    # index untouched by the refused writer
    assert spark.read.parquet(path).count() == 200

    lock.unlink()  # A finishes; B retries
    append_ivf_index(moved, path, assign="expr", upsert=True)
    post = emb.filter("vec_id >= 20 OR vec_id >= 120") \
        .filter("NOT (vec_id < 20)").unionByName(moved)
    rebuilt = str(tmp_path / "ivf_lock_rebuild")
    build_ivf_index(post, rebuilt, centroids=cents, assign="expr")
    a = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(path).select("vec_id", "cluster")
               .collect())
    b = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(rebuilt).select("vec_id", "cluster")
               .collect())
    assert a == b and len(a) == 200
    assert not lock.exists()


def test_upsert_ivf_index_racing_threads_serialize(spark, tmp_path):
    """Two upserts racing from separate driver threads: the lock
    admits exactly one at a time; with a retry loop both eventually
    land and the final index equals applying both batches serially —
    no lost updates, no torn partitions, no leftover stage/aside/lock
    artifacts."""
    import threading
    import time as _t

    from locustdb_spark.operators.similarity import (
        IvfUpsertLockError, append_ivf_index, build_ivf_index)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(300)
    cents = _frozen_cents(emb)
    path = str(tmp_path / "ivf_race")
    build_ivf_index(emb, path, centroids=cents, assign="expr")

    # disjoint id ranges so the serial-equivalent result is
    # order-independent
    batch_a = (emb.filter("vec_id >= 200 AND vec_id < 230")
               .withColumn("vec_id", F.col("vec_id") - 200))
    batch_b = (emb.filter("vec_id >= 230 AND vec_id < 260")
               .withColumn("vec_id", F.col("vec_id") - 180))
    errs, lock_hits = [], [0]

    def worker(batch):
        for _ in range(60):
            try:
                append_ivf_index(batch, path, assign="expr",
                                 upsert=True)
                return
            except IvfUpsertLockError:
                lock_hits[0] += 1
                _t.sleep(0.2)
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return
        errs.append(TimeoutError("never acquired upsert lock"))

    ts = [threading.Thread(target=worker, args=(b,))
          for b in (batch_a, batch_b)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(300)
    assert not errs, errs

    serial = str(tmp_path / "ivf_race_serial")
    post = (emb.join(batch_a.select("vec_id"), "vec_id", "left_anti")
            .join(batch_b.select("vec_id"), "vec_id", "left_anti")
            .unionByName(batch_a).unionByName(batch_b))
    build_ivf_index(post, serial, centroids=cents, assign="expr")
    a = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(path).select("vec_id", "cluster")
               .collect())
    b = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(serial).select("vec_id", "cluster")
               .collect())
    assert a == b and len(a) == 300
    assert not (tmp_path / "ivf_race" / "_upsert.lock").exists()
    assert not list(tmp_path.glob("ivf_race__upsert_stage*"))
    assert not list((tmp_path / "ivf_race").glob(".upsert_aside_*"))


def test_upsert_ivf_index_midswap_failure_loses_nothing(
        spark, tmp_path, monkeypatch):
    """r6 ADVICE fix: a failure BETWEEN renames must not destroy data.
    The old code deleted the live partition before renaming its
    replacement in and removed the stage dir unconditionally in a
    finally — a mid-swap crash lost the cluster. Now every pre-swap
    partition is renamed aside first; on injected failure the op
    raises IvfUpsertTornError, the aside+stage dirs hold every byte,
    the lock stays held, and a documented rollback (restore asides,
    delete lock) returns the index to its exact pre-upsert state so
    the retried upsert equals a serial run."""
    import locustdb_spark.storage as storage_mod
    from locustdb_spark.operators.similarity import (
        IvfUpsertTornError, append_ivf_index, build_ivf_index)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(200)
    cents = _frozen_cents(emb)
    path = str(tmp_path / "ivf_torn")
    build_ivf_index(emb, path, centroids=cents, assign="expr")
    before = sorted((r.vec_id, r.cluster) for r in
                    spark.read.parquet(path)
                    .select("vec_id", "cluster").collect())

    moved = (emb.filter("vec_id >= 100 AND vec_id < 140")
             .withColumn("vec_id", F.col("vec_id") - 100))

    real_rename = storage_mod.HadoopStorage.rename
    calls = [0]

    def failing_rename(self, src, dst):
        calls[0] += 1
        if calls[0] == 3:  # fail partway through the swap loop
            raise OSError("injected transient FS failure")
        return real_rename(self, src, dst)

    monkeypatch.setattr(storage_mod.HadoopStorage, "rename",
                        failing_rename)
    with pytest.raises(IvfUpsertTornError, match="NO DATA WAS LOST"):
        append_ivf_index(moved, path, assign="expr", upsert=True)
    monkeypatch.setattr(storage_mod.HadoopStorage, "rename",
                        real_rename)

    root = tmp_path / "ivf_torn"
    asides = list(root.glob(".upsert_aside_*"))
    stages = list(tmp_path.glob("ivf_torn__upsert_stage_*"))
    assert len(asides) == 1 and len(stages) == 1
    assert (root / "_upsert.lock").exists()  # lock held while torn

    # documented rollback: restore every aside partition, then clear
    # the lock and the recovery dirs
    for d in asides[0].glob("cluster=*"):
        dst = root / d.name
        if dst.exists():
            import shutil
            shutil.rmtree(dst)
        d.rename(dst)
    import shutil
    shutil.rmtree(asides[0])
    shutil.rmtree(stages[0])
    (root / "_upsert.lock").unlink()

    restored = sorted((r.vec_id, r.cluster) for r in
                      spark.read.parquet(path)
                      .select("vec_id", "cluster").collect())
    assert restored == before  # byte-level recovery was possible

    # and the retried upsert now equals the serial result
    append_ivf_index(moved, path, assign="expr", upsert=True)
    post = (emb.join(moved.select("vec_id"), "vec_id", "left_anti")
            .unionByName(moved))
    rebuilt = str(tmp_path / "ivf_torn_rebuild")
    build_ivf_index(post, rebuilt, centroids=cents, assign="expr")
    a = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(path).select("vec_id", "cluster")
               .collect())
    b = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(rebuilt).select("vec_id", "cluster")
               .collect())
    assert a == b and len(a) == 200


def test_audio_features_known_signals(spark):
    """audio_features on hand-built WAVs with known answers: silence
    (zero energy, zero crossings), a full-scale square wave (every
    sample clipped, a crossing at every sign flip), stereo (channel 0
    analyzed), and a corrupt blob (valid=false, never a failed
    batch)."""
    import io
    import wave

    import numpy as np

    from locustdb_spark.operators.multimodal import audio_features

    def wav(samples, ch=1, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(ch)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(np.asarray(samples, "<i2").tobytes())
        return buf.getvalue()

    silence = wav([0] * 100)
    square = wav(([32767] * 5 + [-32768] * 5) * 4)
    # stereo: channel 0 is the square, channel 1 all zeros
    inter = np.zeros(80, dtype="<i2")
    inter[0::2] = np.asarray(([32767] * 5 + [-32768] * 5) * 4, "<i2")
    stereo = wav(inter, ch=2)
    df = spark.createDataFrame(
        [(1, silence), (2, square), (3, stereo), (4, b"not a wav")],
        "doc_id long, payload binary")
    got = {r.doc_id: r for r in audio_features(df).collect()}

    s = got[1]
    assert s.valid and s.n_samples == 100 and s.sum_sq == 0
    assert s.peak == 0 and s.n_clipped == 0 and s.zero_crossings == 0
    q = got[2]
    assert q.valid and q.n_samples == 40
    assert q.n_clipped == 40  # |32767| and |-32768| both >= 32767
    assert q.zero_crossings == 7  # sign flips at each 5-sample edge
    assert q.sum_sq == 20 * 32767**2 + 20 * 32768**2
    st = got[3]
    assert st.valid and st.channels == 2 and st.n_samples == 40
    assert (st.sum_sq, st.n_clipped, st.zero_crossings) == \
        (q.sum_sq, q.n_clipped, q.zero_crossings)
    assert not got[4].valid and got[4].n_samples == 0


def test_image_stats_known_images(spark):
    """image_stats on hand-built PNGs with known answers: an all-zero
    image (sum 0, n_zero = all), a gradient with a known weighted
    checksum, an RGB image (channel 0 analyzed), and corrupt bytes
    (valid=false) — plus encode-filter coverage: the same pixels
    through filters None/Sub/Up must produce identical stats."""
    import numpy as np

    from locustdb_spark.operators import codecs
    from locustdb_spark.operators.multimodal import image_stats

    zeros = codecs.png_encode(np.zeros((5, 4, 1), dtype=np.uint8))
    grad_px = (np.arange(12, dtype=np.uint8).reshape(3, 4, 1) * 10)
    grads = [codecs.png_encode(grad_px, filter_type=ft)
             for ft in (0, 1, 2)]
    rgb_px = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb_px[:, :, 0] = [[1, 2], [3, 4]]
    rgb_px[:, :, 1] = 200  # other channels must not leak into stats
    rgb = codecs.png_encode(rgb_px)
    df = spark.createDataFrame(
        [(1, zeros), (2, grads[0]), (3, grads[1]), (4, grads[2]),
         (5, rgb), (6, b"nope")],
        "doc_id long, payload binary")
    got = {r.doc_id: r for r in image_stats(df).collect()}

    z = got[1]
    assert z.valid and (z.width, z.height) == (4, 5)
    assert z.px_sum == 0 and z.n_zero == 20 and z.px_max == 0
    exp_w = sum(v * 10 * (1 + i % 97) for i, v in enumerate(range(12)))
    for d in (2, 3, 4):  # same pixels through three encode filters
        g = got[d]
        assert g.valid and g.px_sum == 10 * sum(range(12))
        assert (g.px_min, g.px_max, g.n_zero) == (0, 110, 1)
        assert g.weighted_sum == exp_w
    r = got[5]
    assert r.valid and r.channels == 3 and r.px_sum == 10
    assert not got[6].valid


def test_check_constraints_single_pass_and_semantics(spark):
    """validate.py: all rules evaluate in ONE aggregation job over one
    scan (plan has exactly the agg exchanges, no join/union of
    per-rule scans), and each rule family counts exactly the intended
    violations — including NULL handling (range/regex/accepted skip
    NULLs; not_null counts them; unique ignores NULL values)."""
    from locustdb_spark.operators.validate import (
        accepted_values, check_constraints, in_range, matches,
        non_negative, not_null, unique)
    from locustdb_spark.plans import explain_formatted

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "B"), (2, None, "bad"),
         (None, 900.0, None), (5, 50.0, "A")],
        "id long, v double, s string")
    rules = [not_null("id"), unique("id"), in_range("v", 0, 100),
             matches("s", "^[A-Z]$"), accepted_values("s", ["A", "B"]),
             non_negative("v")]
    out = check_constraints(df, rules)
    plan = explain_formatted(out)
    assert "Join" not in plan and "Union" not in plan
    got = {r.rule: (r.violations, r.passed) for r in out.collect()}
    assert got["not_null(id)"] == (1, False)
    assert got["unique(id)"] == (1, False)       # id=2 twice
    assert got["in_range(v,0,100)"] == (2, False)   # -5, 900; NULL skipped
    assert got["matches(s)"] == (1, False)       # 'bad'; NULL skipped
    assert got["accepted_values(s)"] == (1, False)
    assert got["non_negative(v)"] == (1, False)  # -5
    assert all(r.total_rows == 5 for r in out.collect())

    clean = check_constraints(
        df.filter("id = 1"), [not_null("id"), unique("id")])
    assert all(r.passed for r in clean.collect())


def test_profile_columns_values(spark):
    from locustdb_spark.operators.validate import profile_columns

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "k long, s string")
    got = {r.column: r for r in
           profile_columns(df, ["k", "s"]).collect()}
    assert got["k"].n_null == 0 and got["k"].n_distinct == 2
    assert (got["k"].min_value, got["k"].max_value) == ("1", "2")
    assert got["s"].n_null == 1 and got["s"].n_distinct == 2
    assert got["s"].total_rows == 3


def test_profile_drift_report(spark):
    """r7: profile_drift diffs two profile_columns outputs — no
    rescan of either table — and flags null-fraction jumps,
    distinct-density shifts, and moved min/max endpoints per the
    thresholds, emitting both passing and failing rows."""
    from locustdb_spark.operators.validate import (
        profile_columns, profile_drift)

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, s string")
    new = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (9, "a")], "k long, s string")
    po, pn = (profile_columns(d, ["k", "s"]) for d in (old, new))
    got = {r.rule: r for r in profile_drift(
        po, pn, max_null_frac_delta=0.1,
        max_distinct_frac_delta=0.3,
        fail_on_range_change=True).collect()}
    assert len(got) == 6
    # s: null frac 0 -> 0.25 exceeds 0.1; k stays 0
    assert not got["null_frac(s)"].passed
    assert got["null_frac(s)"].new_value == 0.25
    assert got["null_frac(k)"].passed
    # s: distinct density 1.0 -> 0.25 exceeds 0.3; k 1.0 stays
    assert not got["distinct_frac(s)"].passed
    assert got["distinct_frac(k)"].passed
    # k's max moved 4 -> 9 (one endpoint); s's max moved d -> a
    assert got["range(k)"].delta == 1.0 and not got["range(k)"].passed
    assert got["range(k)"].old_value is None
    # with fail_on_range_change off the same delta passes
    relaxed = {r.rule: r for r in profile_drift(
        po, pn, fail_on_range_change=False).collect()}
    assert relaxed["range(k)"].passed and relaxed["range(k)"].delta == 1.0


def test_profile_columns_approx_distinct(spark):
    """r8 (VERDICT task 6): `distinct="approx"` swaps count_distinct
    for approx_count_distinct (HLL++, one streaming pass instead of
    an Expand) and the resulting profile feeds profile_drift
    UNCHANGED — same schema, same report rows, with the drift
    thresholds absorbing sketch error (exact at these tiny
    cardinalities, where HLL++ is itself exact)."""
    import pytest

    from locustdb_spark.operators.validate import (
        profile_columns, profile_drift)

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, s string")
    new = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (9, "a")], "k long, s string")
    exact = {(r.column): r for r in
             profile_columns(new, ["k", "s"]).collect()}
    approx_df = profile_columns(new, ["k", "s"], distinct="approx")
    approx = {(r.column): r for r in approx_df.collect()}
    # identical schema and (at HLL-exact cardinalities) identical rows
    assert approx_df.columns == ["column", "n_null", "n_distinct",
                                 "min_value", "max_value", "total_rows"]
    for c in ("k", "s"):
        assert approx[c] == exact[c]
    # the approx plan has no Expand (the exact plan's two-pass cost)
    from locustdb_spark.plans import explain_formatted
    assert "Expand" in explain_formatted(profile_columns(
        new, ["k", "s"]))
    assert "Expand" not in explain_formatted(approx_df)
    # an approx profile on either/both sides feeds profile_drift as-is
    po = profile_columns(old, ["k", "s"], distinct="approx")
    got = {r.rule: r for r in profile_drift(
        po, approx_df, max_null_frac_delta=0.1,
        max_distinct_frac_delta=0.3).collect()}
    assert len(got) == 6
    assert not got["null_frac(s)"].passed
    assert not got["distinct_frac(s)"].passed and got["distinct_frac(k)"].passed
    with pytest.raises(ValueError, match="exact.*approx|approx.*exact"):
        profile_columns(new, ["k"], distinct="sketchy")


def test_compact_ivf_index_collapses_small_files(spark, tmp_path):
    """r6: repeated appends accrete one file per batch per cluster;
    compaction rewrites over-threshold clusters to ONE file each with
    zero data change (same (id, cluster) set, identical probe
    results), skips under-threshold clusters, and leaves no
    lock/stage/aside artifacts. A held lock excludes compaction just
    like it excludes upserts."""
    from locustdb_spark.operators.similarity import (
        IvfUpsertLockError, append_ivf_index, build_ivf_index,
        compact_ivf_index, probe_ivf_index)

    cents = [[1.0, 0.0], [0.0, 1.0]]
    seed = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1000, [0.0, 1.0])],
        "vec_id long, embedding array<double>").coalesce(1)
    path = str(tmp_path / "ivf_compact")
    build_ivf_index(seed, path, centroids=cents, assign="expr")
    # 6 append batches -> >=6 files in cluster 0, >=6 in cluster 1
    for b in range(1, 7):
        batch = spark.createDataFrame(
            [(b * 10, [1.0, 0.01 * b]), (1000 + b, [0.01 * b, 1.0])],
            "vec_id long, embedding array<double>").coalesce(1)
        append_ivf_index(batch, path, assign="expr")
    root = tmp_path / "ivf_compact"

    def files(k):
        return [f for f in (root / f"cluster={k}").iterdir()
                if not f.name.startswith(("_", "."))]

    assert len(files(0)) >= 6 and len(files(1)) >= 6
    before = sorted((r.vec_id, r.cluster) for r in
                    spark.read.parquet(path)
                    .select("vec_id", "cluster").collect())
    probe_before = probe_ivf_index(spark, path, [1.0, 0.02], k=3,
                                   nprobe=1).collect()

    # a held lock excludes compaction too
    lock = root / "_upsert.lock"
    lock.write_bytes(b"{}")
    with pytest.raises(IvfUpsertLockError):
        compact_ivf_index(spark, path, max_files_per_cluster=2)
    lock.unlink()

    rep = compact_ivf_index(spark, path, max_files_per_cluster=2)
    assert sorted(rep["compacted"]) == [0, 1]
    assert all(n >= 6 for n in rep["files_before"].values())
    assert len(files(0)) == 1 and len(files(1)) == 1
    after = sorted((r.vec_id, r.cluster) for r in
                   spark.read.parquet(path)
                   .select("vec_id", "cluster").collect())
    assert after == before and len(after) == 14
    assert probe_ivf_index(spark, path, [1.0, 0.02], k=3,
                           nprobe=1).collect() == probe_before
    assert not lock.exists()
    assert not list(root.glob(".upsert_aside_*"))
    assert not list(tmp_path.glob("ivf_compact__upsert_stage*"))
    # idempotent: nothing left over threshold
    rep2 = compact_ivf_index(spark, path, max_files_per_cluster=2)
    assert rep2["compacted"] == [] and sorted(rep2["skipped"]) == [0, 1]


def test_append_ivf_index_respects_writer_lock(spark, tmp_path):
    """r7 (ADVICE): a PLAIN append must not interleave with an
    in-flight upsert/compaction swap — it now takes the same
    _upsert.lock: a held lock raises instead of silently landing a
    file the compactor's rename-aside would drop, and a successful
    append releases the lock so the next writer proceeds."""
    from locustdb_spark.operators.similarity import (
        IvfUpsertLockError, append_ivf_index, build_ivf_index)

    seed = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1000, [0.0, 1.0])],
        "vec_id long, embedding array<double>").coalesce(1)
    path = str(tmp_path / "ivf_lockap")
    build_ivf_index(seed, path, centroids=[[1.0, 0.0], [0.0, 1.0]],
                    assign="expr")
    batch = spark.createDataFrame(
        [(5, [1.0, 0.1])], "vec_id long, embedding array<double>")
    lock = tmp_path / "ivf_lockap" / "_upsert.lock"
    lock.write_bytes(b"{}")
    with pytest.raises(IvfUpsertLockError):
        append_ivf_index(batch, path, assign="expr")
    # the batch must NOT have landed while the lock was held
    assert spark.read.parquet(path).filter("vec_id = 5").count() == 0
    lock.unlink()
    append_ivf_index(batch, path, assign="expr")
    assert spark.read.parquet(path).filter("vec_id = 5").count() == 1
    assert not lock.exists()  # released after a successful append


# ---------------------------------------------------------------------
# IVF-PQ persisted layout + residual / trained codebooks (round 10)
# ---------------------------------------------------------------------

def _np_corpus(df):
    """Collect a small embeddings frame to (ids, matrix) sorted by id
    — the independent numpy oracle for the recall pins below."""
    import numpy as np

    rows = df.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    x = np.array([[float(v) for v in r.embedding] for r in rows])
    return ids, x


def _exact_l2_topk_ids(ids, x, q, k=10):
    import numpy as np

    d2 = ((x - q) ** 2).sum(axis=1)
    return set(ids[np.lexsort((ids, d2))[:k]].tolist())


def test_ivf_pq_index_probe_matches_in_memory_composition(
        spark, emb, tmp_path):
    """The persisted IVF-PQ layout (codes column + _pq.json sidecar)
    probed via probe_ivf_pq_index must return exactly what the
    in-memory composition (assign -> prune -> encode -> ADC) returns:
    same frozen centroids/codebooks, same sequential probe ranking,
    same ADC fold — only the bytes' provenance differs. Probing ALL
    clusters must equal plain full-corpus ADC."""
    from locustdb_spark.operators.similarity import (
        build_ivf_index, ivf_assign_expr, pq_adc_topk,
        pq_codebooks_from_corpus, pq_encode, probe_ivf_pq_index,
        rank_probes_seq)

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 16").orderBy("vec_id")
             .collect()]
    books = pq_codebooks_from_corpus(emb, m=8, k=16)
    q = [float(x) for x in emb.filter("vec_id = 0").head().embedding]
    path = str(tmp_path / "ivf_pq")
    build_ivf_index(emb, path, centroids=cents, assign="expr",
                    pq_codebooks=books)

    probe = rank_probes_seq(cents, q, 4)
    cands = ivf_assign_expr(emb, cents).filter(
        F.col("cluster").isin([int(p) for p in probe]))
    composed = pq_adc_topk(pq_encode(cands, books), books, q,
                           k=10).collect()
    indexed = probe_ivf_pq_index(spark, path, q, k=10, nprobe=4,
                                 rank="seq").collect()
    assert [(r.vec_id, r.adc_dist) for r in indexed] == \
        [(r.vec_id, r.adc_dist) for r in composed]

    full = pq_adc_topk(pq_encode(emb, books), books, q, k=10).collect()
    all_probed = probe_ivf_pq_index(spark, path, q, k=10, nprobe=16,
                                    rank="seq").collect()
    assert [(r.vec_id, r.adc_dist) for r in all_probed] == \
        [(r.vec_id, r.adc_dist) for r in full]


def test_ivf_pq_append_encodes_batch_with_frozen_codebooks(
        spark, emb, tmp_path):
    """append_ivf_index on an IVF-PQ layout must encode the batch with
    the sidecar's FROZEN codebooks (the PQ analog of the frozen-
    centroid contract) so the appended index is indistinguishable
    from a full rebuild — codes and probe results bit-equal."""
    from locustdb_spark.operators.similarity import (
        append_ivf_index, build_ivf_index, pq_codebooks_from_corpus,
        probe_ivf_pq_index)

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 16").orderBy("vec_id")
             .collect()]
    books = pq_codebooks_from_corpus(emb, m=8, k=16)
    q = [float(x) for x in emb.filter("vec_id = 1").head().embedding]

    full_path = str(tmp_path / "pq_full")
    build_ivf_index(emb, full_path, centroids=cents, assign="expr",
                    pq_codebooks=books)
    inc_path = str(tmp_path / "pq_inc")
    build_ivf_index(emb.filter("vec_id % 2 = 0"), inc_path,
                    centroids=cents, assign="expr", pq_codebooks=books)
    append_ivf_index(emb.filter("vec_id % 2 = 1"), inc_path,
                     assign="expr")

    fc = {r.vec_id: r.codes
          for r in spark.read.parquet(full_path).collect()}
    ic = {r.vec_id: r.codes
          for r in spark.read.parquet(inc_path).collect()}
    assert fc == ic
    a = probe_ivf_pq_index(spark, full_path, q, k=10, rank="seq")
    b = probe_ivf_pq_index(spark, inc_path, q, k=10, rank="seq")
    assert a.collect() == b.collect()


def test_probe_ivf_pq_requires_sidecar(spark, emb, tmp_path):
    """A raw-vector IVF layout has no _pq.json; the PQ probe must fail
    loudly instead of silently scoring nothing."""
    from locustdb_spark.operators.similarity import (
        build_ivf_index, probe_ivf_pq_index)

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 4").orderBy("vec_id")
             .collect()]
    path = str(tmp_path / "ivf_plain")
    build_ivf_index(emb.limit(100), path, centroids=cents,
                    assign="expr")
    with pytest.raises(FileNotFoundError, match="_pq.json"):
        probe_ivf_pq_index(spark, path, cents[0], k=5)
    with pytest.raises(ValueError, match="keep_vectors"):
        build_ivf_index(emb.limit(100), path, centroids=cents,
                        keep_vectors=False)


def test_residualize_zero_anchor_fallback(spark):
    """A cluster with no member among the anchor prefix anchors at the
    zero vector: its residuals equal the raw vectors (and clusters
    WITH prefix members subtract their sequential raw-space mean)."""
    from locustdb_spark.operators.similarity import (
        residualize, sequential_cluster_anchors)

    cents = [[1.0, 0.0], [0.0, 1.0]]
    d = spark.createDataFrame(
        [(0, [2.0, 0.0]), (1, [4.0, 0.0]), (2, [0.0, 8.0])],
        "vec_id long, embedding array<double>")
    # prefix = first 2 ids -> both cluster 0; cluster 1 unanchored
    anchors = sequential_cluster_anchors(d, cents, first_n=2)
    assert anchors[0] == [3.0, 0.0]  # (2+4)/2, (0+0)/2
    assert anchors[1] == [0.0, 0.0]
    out = {r.vec_id: (r.cluster, r.residual)
           for r in residualize(d, cents, anchors).collect()}
    assert out[0] == (0, [-1.0, 0.0])
    assert out[1] == (0, [1.0, 0.0])
    assert out[2] == (1, [0.0, 8.0])  # zero anchor -> residual = raw


def test_pq_trained_codebooks_recall_ge_frozen(emb):
    """k-means-trained PQ codebooks (pq_codebooks_kmeans) must not
    lose recall@10 to the frozen rank-of-smallest-ids convention on
    the sf corpus, summed over the standard bounded query batch
    (every 97th id) against an exact-L2 numpy oracle. Deterministic:
    fixed corpus, deterministic sample order, deterministic Lloyd."""
    from locustdb_spark.operators.similarity import (
        pq_adc_topk, pq_codebooks_from_corpus, pq_codebooks_kmeans,
        pq_encode)

    ids, x = _np_corpus(emb)
    queries = [(int(i), x[j]) for j, i in enumerate(ids)
               if i % 97 == 0 and i < 2000]
    frozen = pq_codebooks_from_corpus(emb, m=8, k=16)
    trained = pq_codebooks_kmeans(emb, m=8, k=16)
    hits = {}
    for name, books in (("frozen", frozen), ("trained", trained)):
        codes = pq_encode(emb, books).persist()
        total = 0
        for qid, q in queries:
            approx = {r.vec_id for r in
                      pq_adc_topk(codes, books, list(q), k=10)
                      .collect()}
            total += len(approx & _exact_l2_topk_ids(ids, x, q))
        hits[name] = total
        codes.unpersist()
    assert hits["trained"] >= hits["frozen"], hits


def test_pq_residual_recall_beats_raw_on_clustered_corpus(
        spark, tmp_path):
    """The residual-encoding mechanism pin (Jegou et al. 2011 §III):
    on a corpus with real cluster structure, quantizing
    x - anchor[cluster(x)] against raw-space cluster-mean anchors
    must beat raw-vector PQ decisively (the anchors absorb the
    between-cluster energy, leaving the codebooks the within-cluster
    offsets). The sf corpus is unstructured (max pairwise cosine
    ~0.5) so the effect is within noise there — this pins it where
    the preconditions hold, via the persisted residual IVF-PQ layout
    probed over ALL clusters (= full-corpus residual ADC)."""
    import numpy as np

    from locustdb_spark.operators.similarity import (
        build_ivf_index, kmeans_centroids, pq_adc_topk,
        pq_codebooks_kmeans, pq_encode, probe_ivf_pq_index,
        residualize, sequential_cluster_anchors)

    rng = np.random.RandomState(7)
    n_cl, per, dims = 16, 60, 64
    centers = rng.randn(n_cl, dims) * 3.0
    data = np.vstack([centers[c] + rng.randn(per, dims) * 0.4
                      for c in range(n_cl)])
    ids = np.arange(len(data))
    d = spark.createDataFrame(
        [(int(i), [float(v) for v in row])
         for i, row in zip(ids, data)],
        "vec_id long, embedding array<double>").coalesce(4)

    cents = kmeans_centroids(d, n_clusters=n_cl)
    # the corpus is WRITTEN in cluster order, so a 256-id prefix would
    # anchor only the first few clusters (zero-anchor fallback for the
    # rest = no residual benefit); anchor over everything here — the
    # bounded-prefix behavior is pinned separately above
    anchors = sequential_cluster_anchors(d, cents, first_n=len(data))
    res_df = residualize(d, cents, anchors)
    books_raw = pq_codebooks_kmeans(d, m=8, k=16)
    books_res = pq_codebooks_kmeans(res_df, m=8, k=16,
                                    vec_col="residual")
    codes_raw = pq_encode(d, books_raw).persist()
    path = str(tmp_path / "respq")
    build_ivf_index(d, path, centroids=cents, pq_codebooks=books_res,
                    pq_anchors=anchors, keep_vectors=False)

    queries = [(int(i), data[j]) for j, i in enumerate(ids)
               if i % 97 == 0]
    raw_hits = res_hits = 0
    for qid, q in queries:
        exact = _exact_l2_topk_ids(ids, data, q)
        raw_top = {r.vec_id for r in
                   pq_adc_topk(codes_raw, books_raw, list(q), k=10)
                   .collect()}
        res_top = {r.vec_id for r in
                   probe_ivf_pq_index(spark, path, list(q), k=10,
                                      nprobe=n_cl).collect()}
        raw_hits += len(raw_top & exact)
        res_hits += len(res_top & exact)
    codes_raw.unpersist()
    # decisive margin, not a tie-break: ~3x on this geometry
    assert res_hits >= raw_hits + len(queries), (raw_hits, res_hits)


def test_pq_refine_recall_ge_adc_on_clustered_corpus(spark, tmp_path):
    """Exact re-rank over ADC candidates (probe_ivf_pq_index
    refine=k', Jegou et al. 2011 §V — verdict r10 task 2): on the
    clustered corpus, refined recall@10 must be >= raw ADC recall@10
    summed over the query batch — the second stage can only replace a
    quantization-noise candidate with a true neighbor the k'=50
    window already surfaced, never lose one (exact distances are a
    re-rank of a SUPERSET of the ADC top-10). Also checks the refined
    distances equal the numpy exact squared L2."""
    import numpy as np

    from locustdb_spark.operators.similarity import (
        build_ivf_index, kmeans_centroids, pq_codebooks_kmeans,
        probe_ivf_pq_index)

    rng = np.random.RandomState(11)
    n_cl, per, dims = 8, 50, 64
    centers = rng.randn(n_cl, dims) * 3.0
    data = np.vstack([centers[c] + rng.randn(per, dims) * 0.5
                      for c in range(n_cl)])
    ids = np.arange(len(data))
    d = spark.createDataFrame(
        [(int(i), [float(v) for v in row])
         for i, row in zip(ids, data)],
        "vec_id long, embedding array<double>").coalesce(4)
    cents = kmeans_centroids(d, n_clusters=n_cl)
    books = pq_codebooks_kmeans(d, m=8, k=16)
    path = str(tmp_path / "refinepq")
    build_ivf_index(d, path, centroids=cents, pq_codebooks=books)

    queries = [(int(i), data[j]) for j, i in enumerate(ids)
               if i % 37 == 0]
    adc_hits = ref_hits = ceiling_hits = 0
    for qid, q in queries:
        exact = _exact_l2_topk_ids(ids, data, q)
        adc_top = {r.vec_id for r in
                   probe_ivf_pq_index(spark, path, list(q), k=10,
                                      nprobe=n_cl).collect()}
        cand50 = {r.vec_id for r in
                  probe_ivf_pq_index(spark, path, list(q), k=50,
                                     nprobe=n_cl).collect()}
        ref_rows = probe_ivf_pq_index(spark, path, list(q), k=10,
                                      nprobe=n_cl,
                                      refine=50).collect()
        ref_hits += len({r.vec_id for r in ref_rows} & exact)
        adc_hits += len(adc_top & exact)
        ceiling_hits += len(cand50 & exact)
        # refined distances ARE the exact squared L2 (rounded)
        for r in ref_rows:
            want = round(float(((data[r.vec_id] - q) ** 2).sum()), 6)
            assert abs(r.exact_dist - want) < 1e-9, (r, want)
    assert ref_hits >= adc_hits, (adc_hits, ref_hits)
    # the refine CONTRACT, platform-independent (review r11 — a
    # strict ref>adc assert could fail on a BLAS that hands ADC a
    # luckier codebook): the exact re-rank recovers EVERY true
    # neighbor present in its k'=50 candidate window, no more and no
    # less — so refined hits equal the window's ceiling exactly,
    # and any window-covered neighbor ADC's top-10 missed is won back
    assert ref_hits == ceiling_hits, (ref_hits, ceiling_hits)


def test_pq_refine_and_probe_argument_guards(spark, emb, tmp_path):
    """The r10 ADVICE guards fail fast with named errors instead of
    opaque AttributeError/IndexError/FileNotFoundError downstream:
    nprobe < 1, refine < k, refine against a pure-codes layout,
    pq_anchors without pq_codebooks, and empty-input anchors."""
    from locustdb_spark.operators.similarity import (
        build_ivf_index, pq_codebooks_from_corpus, probe_ivf_pq_index,
        sequential_cluster_anchors)

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 4").orderBy("vec_id")
             .collect()]
    books = pq_codebooks_from_corpus(emb, m=8, k=16)
    q = [float(x) for x in emb.filter("vec_id = 0").head().embedding]

    with pytest.raises(ValueError, match="pq_anchors requires"):
        build_ivf_index(emb, str(tmp_path / "never"), centroids=cents,
                        pq_anchors=cents)

    path = str(tmp_path / "codesonly")
    build_ivf_index(emb, path, centroids=cents, pq_codebooks=books,
                    keep_vectors=False)
    with pytest.raises(ValueError, match="nprobe must be >= 1"):
        probe_ivf_pq_index(spark, path, q, k=5, nprobe=0)
    with pytest.raises(ValueError, match="must be >= k"):
        probe_ivf_pq_index(spark, path, q, k=10, refine=5)
    with pytest.raises(ValueError, match="keep_vectors=False"):
        probe_ivf_pq_index(spark, path, q, k=5, nprobe=2,
                           refine=20).collect()

    with pytest.raises(ValueError, match="empty"):
        sequential_cluster_anchors(emb.filter("vec_id < 0"), cents)


def test_pq_knn_join_matches_single_query_probe(spark, emb, tmp_path):
    """The batch IVF-PQ join must return, for every query in the
    batch, exactly what the single-query probe returns — ADC stage
    AND refined stage — on both raw and RESIDUAL layouts (the
    per-(query, cluster) broadcast tables replace the single-query
    CASE). Self-matches included (exclude_self=False) so the two
    surfaces are directly comparable."""
    from locustdb_spark.operators.similarity import (
        build_ivf_index, pq_codebooks_from_corpus, pq_knn_join,
        probe_ivf_pq_index, sequential_cluster_anchors)

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 8").orderBy("vec_id")
             .collect()]
    books = pq_codebooks_from_corpus(emb, m=8, k=16)
    anchors = sequential_cluster_anchors(emb, cents, first_n=64)
    queries = emb.filter("vec_id % 83 = 0")
    for variant, extra in (("raw", {}), ("residual",
                                        {"pq_anchors": anchors})):
        path = str(tmp_path / f"pqkj_{variant}")
        build_ivf_index(emb, path, centroids=cents,
                        pq_codebooks=books, **extra)
        batch = pq_knn_join(spark, path, queries, k=5, nprobe=3,
                            rank="seq", exclude_self=False)
        got = {}
        for r in batch.collect():
            got.setdefault(r.q_id, []).append((r.vec_id, r.adc_dist))
        ref = pq_knn_join(spark, path, queries, k=5, nprobe=3,
                          rank="seq", exclude_self=False, refine=20)
        got_ref = {}
        for r in ref.collect():
            got_ref.setdefault(r.q_id, []).append(
                (r.vec_id, r.exact_dist))
        for qr in queries.orderBy("vec_id").collect():
            q = [float(x) for x in qr.embedding]
            single = [(r.vec_id, r.adc_dist) for r in
                      probe_ivf_pq_index(spark, path, q, k=5,
                                         nprobe=3, rank="seq")
                      .collect()]
            assert sorted(got[qr.vec_id]) == sorted(single), \
                (variant, qr.vec_id)
            single_ref = [(r.vec_id, r.exact_dist) for r in
                          probe_ivf_pq_index(spark, path, q, k=5,
                                             nprobe=3, rank="seq",
                                             refine=20).collect()]
            assert sorted(got_ref[qr.vec_id]) == sorted(single_ref), \
                (variant, qr.vec_id)


def test_pq_knn_join_chunked_equals_one_shot(spark, emb, tmp_path):
    """pq_knn_join_chunked must reproduce the one-shot join exactly —
    per-query results are independent, so id-ordered chunking cannot
    change them. Also covers the empty-batch path (schema-preserving
    empty result)."""
    from locustdb_spark.operators.similarity import (
        build_ivf_index, pq_codebooks_from_corpus, pq_knn_join,
        pq_knn_join_chunked)

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 8").orderBy("vec_id")
             .collect()]
    books = pq_codebooks_from_corpus(emb, m=8, k=16)
    path = str(tmp_path / "pqkj_chunk")
    build_ivf_index(emb, path, centroids=cents, pq_codebooks=books)
    q = emb.filter("vec_id % 83 = 0")  # several queries
    one = sorted(map(tuple, pq_knn_join(
        spark, path, q, k=4, nprobe=3, refine=16).collect()))
    chunked = sorted(map(tuple, pq_knn_join_chunked(
        spark, path, q, chunk_size=2, k=4, nprobe=3,
        refine=16).collect()))
    assert one == chunked and len(one) > 4
    empty = pq_knn_join_chunked(spark, path, q.filter("vec_id < 0"),
                                k=4, nprobe=3, refine=16)
    assert empty.columns == ["q_id", "vec_id", "exact_dist"]
    assert empty.count() == 0
    with pytest.raises(ValueError, match="chunk_size"):
        pq_knn_join_chunked(spark, path, q, chunk_size=0)


def test_pq_refine_and_batch_join_see_appended_rows(
        spark, emb, tmp_path):
    """Index-maintenance parity for the r11 retrieval stages: after
    `append_ivf_index` grows an IVF-PQ layout (frozen centroids +
    frozen-codebook re-encode), BOTH the refined single-query probe
    and the batch pq_knn_join must return exactly what a full rebuild
    over the same rows returns — appended rows are first-class
    candidates for ADC AND for the exact re-rank's vector scan."""
    from locustdb_spark.operators.similarity import (
        append_ivf_index, build_ivf_index, pq_codebooks_from_corpus,
        pq_knn_join, probe_ivf_pq_index)

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 8").orderBy("vec_id")
             .collect()]
    books = pq_codebooks_from_corpus(emb, m=8, k=16)
    base = emb.filter("vec_id % 3 != 0")
    extra = emb.filter("vec_id % 3 = 0")

    inc_path = str(tmp_path / "pq_inc")
    build_ivf_index(base, inc_path, centroids=cents,
                    pq_codebooks=books)
    append_ivf_index(extra, inc_path)
    full_path = str(tmp_path / "pq_full")
    build_ivf_index(emb, full_path, centroids=cents,
                    pq_codebooks=books)

    q = [float(x) for x in emb.filter("vec_id = 3").head().embedding]
    inc_ref = [tuple(r) for r in probe_ivf_pq_index(
        spark, inc_path, q, k=5, nprobe=4, refine=20).collect()]
    full_ref = [tuple(r) for r in probe_ivf_pq_index(
        spark, full_path, q, k=5, nprobe=4, refine=20).collect()]
    assert inc_ref == full_ref
    # the top hit must be an APPENDED id (vec_id 3 is in `extra`)
    assert inc_ref[0][0] == 3 and inc_ref[0][1] == 0.0

    queries = emb.filter("vec_id % 83 = 0")
    inc_b = sorted(map(tuple, pq_knn_join(
        spark, inc_path, queries, k=4, nprobe=3,
        refine=16).collect()))
    full_b = sorted(map(tuple, pq_knn_join(
        spark, full_path, queries, k=4, nprobe=3,
        refine=16).collect()))
    assert inc_b == full_b and len(inc_b) > 4


def test_pq_knn_join_guards(spark, emb, tmp_path):
    """Bounded-batch and layout guards fail fast with named errors."""
    from locustdb_spark.operators.similarity import (
        build_ivf_index, pq_codebooks_from_corpus, pq_knn_join)

    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 4").orderBy("vec_id")
             .collect()]
    books = pq_codebooks_from_corpus(emb, m=8, k=16)
    path = str(tmp_path / "pqkj_g")
    build_ivf_index(emb, path, centroids=cents, pq_codebooks=books)
    q = emb.filter("vec_id < 3")
    with pytest.raises(ValueError, match="max_queries"):
        pq_knn_join(spark, path, q, max_queries=2)
    with pytest.raises(ValueError, match="nprobe"):
        pq_knn_join(spark, path, q, nprobe=0)
    with pytest.raises(ValueError, match="must be >= k"):
        pq_knn_join(spark, path, q, k=10, refine=3)
    with pytest.raises(ValueError, match="duplicate"):
        pq_knn_join(spark, path, q.unionByName(q.limit(1)))
    from locustdb_spark.operators.similarity import pq_knn_join_chunked
    with pytest.raises(ValueError, match="chunk_size instead"):
        pq_knn_join_chunked(spark, path, q, max_queries=8)
    raw_path = str(tmp_path / "pqkj_raw_only")
    build_ivf_index(emb, raw_path, centroids=cents)
    with pytest.raises(FileNotFoundError, match="_pq.json"):
        pq_knn_join(spark, raw_path, q)


def test_duplicate_spans_persist_registry_and_opt_out(docs):
    """The span family's internal persist is releasable (r9 ADVICE):
    persist_registry receives the cached handle so batch pipelines
    can unpersist deterministically, and persist=False produces the
    same rows with nothing registered."""
    from locustdb_spark.operators.dedup import duplicate_spans

    reg = []
    cached = duplicate_spans(docs, window=4, min_count=2,
                             persist_registry=reg)
    rows = sorted(map(tuple, cached.collect()))
    assert len(reg) == 1
    assert reg[0].storageLevel.useMemory  # actually persisted
    reg[0].unpersist()
    assert not reg[0].storageLevel.useMemory

    reg2 = []
    plain = duplicate_spans(docs, window=4, min_count=2,
                            persist=False, persist_registry=reg2)
    assert sorted(map(tuple, plain.collect())) == rows
    assert reg2 == []


def test_bloom_auto_sizing_and_saturation_warning(spark):
    """m_bits sizing follows the eval gram count (r9 ADVICE): the
    default auto-sizes to the next power of two >= 16 bits/gram (so
    growing eval suites can't silently saturate the filter), an
    explicit undersized m_bits warns with the per-gram FP rate and
    the auto size, and a roomy explicit m_bits stays silent."""
    import warnings

    from locustdb_spark.operators.text import contamination_check_bloom

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(9, "alpha beta gamma zulu")], "doc_id long, text string")

    def bloom_warnings(caught):
        return [str(w.message) for w in caught
                if "per-gram FP" in str(w.message)]

    # auto default: no warning, correct flags (2 grams -> 2^12 floor)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = {r.doc_id: r.flagged for r in contamination_check_bloom(
            train, ev, n=3).collect()}
        assert not bloom_warnings(caught)
    assert out == {1: True}

    # explicit saturated filter: warns, names the auto size
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        contamination_check_bloom(train, ev, n=3, m_bits=4, k=4)
        msgs = bloom_warnings(caught)
    assert len(msgs) == 1 and "m_bits=None" in msgs[0]

    # roomy explicit filter: silent
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        contamination_check_bloom(train, ev, n=3, m_bits=1 << 18)
        assert not bloom_warnings(caught)


def test_minhash_arrow_kernel_bit_equal_to_expression(docs, spark):
    """The Arrow md5-minhash kernel must be BIT-IDENTICAL to the
    expression recipe on the real corpus (value for value, every
    lane) — that is what lets the fast path share the expression
    path's SQL oracle. Also pins the edge cases the expression path
    defines: short text (truncated tail shingle), empty text
    (md5(\"\")), and null text (null lanes)."""
    from locustdb_spark.operators.dedup import minhash_signatures

    expr = sorted(map(tuple, minhash_signatures(
        docs, num_hashes=4).collect()))
    arrow = sorted(map(tuple, minhash_signatures(
        docs, num_hashes=4, impl="arrow").collect()))
    assert arrow == expr

    edge = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None), (4, "ABCdef GHI")],
        "doc_id long, text string")
    e = sorted(map(tuple, minhash_signatures(
        edge, num_hashes=3).collect()))
    a = sorted(map(tuple, minhash_signatures(
        edge, num_hashes=3, impl="arrow").collect()))
    assert a == e

    with pytest.raises(ValueError, match="hash_fn"):
        minhash_signatures(docs, impl="arrow", hash_fn="rolling")
    with pytest.raises(ValueError, match="impl"):
        minhash_signatures(docs, impl="fast")


def test_minhash_xxhash64_arrow_kernel_parity(docs, spark):
    """The r12 vectorized XXH64 kernel must be BIT-IDENTICAL to the
    xxhash64 expression recipe — on the real corpus and on the edge
    cases the expression path defines: null text (Spark's hash exprs
    never return null — a null child leaves the hash at its seed, so
    NULL docs get real lane values), empty text (hash of zero bytes),
    text shorter than the shingle, non-ASCII text (character
    positions != byte positions — the scalar fallback), and a
    shingle_k >= 32 (the stripe loop of the scalar port)."""
    from locustdb_spark.operators.dedup import minhash_signatures

    expr = sorted(map(tuple, minhash_signatures(
        docs, num_hashes=8, hash_fn="xxhash64").collect()))
    arrow = sorted(map(tuple, minhash_signatures(
        docs, num_hashes=8, hash_fn="xxhash64",
        impl="arrow").collect()))
    assert arrow == expr

    edge = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None), (4, "ABCdef GHI"),
         (5, "cafés naïve über"),
         (6, "日本語テキストabc"),
         (7, "x" * 500)],
        "doc_id long, text string")
    for kwargs in ({"num_hashes": 3}, {"num_hashes": 2, "shingle_k": 33},
                   {"num_hashes": 4, "lowercase": False}):
        e = sorted(map(tuple, minhash_signatures(
            edge, hash_fn="xxhash64", **kwargs).collect()))
        a = sorted(map(tuple, minhash_signatures(
            edge, hash_fn="xxhash64", impl="arrow", **kwargs).collect()))
        assert a == e, f"kernel diverges for {kwargs}"


# --- r12 optimization-round pins ------------------------------------------


def test_assigners_agree_on_non_unit_centroids(spark):
    """VERDICT r11 item 4: the numpy and expression assigners must
    agree on centroids that are NOT unit-norm (each row scaled by a
    different magnitude). Pre-r11 ivf_assign ranked by raw dot
    product, so a large-magnitude centroid would win every argmax on
    this input while the expression path's true cosine ignored the
    scale — this test fails on that code."""
    from locustdb_spark.operators.similarity import (
        ivf_assign, ivf_assign_expr)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(200)
    base = [[float(x) for x in r.embedding]
            for r in emb.filter("vec_id < 6").orderBy("vec_id")
            .collect()]
    # distinct magnitudes per row: 0.25x .. 32x
    cents = [[x * (0.25 * (2 ** j)) for x in c]
             for j, c in enumerate(base)]
    a = {r.vec_id: r.cluster
         for r in ivf_assign(emb, cents).collect()}
    b = {r.vec_id: r.cluster
         for r in ivf_assign_expr(emb, cents).collect()}
    assert a == b


def test_rank_probes_agree_on_non_unit_centroids(spark):
    """ADVICE r11: `_rank_probes` (numpy, the default rank path) must
    select the same probe clusters as `rank_probes_seq` (the oracle
    twin) for NON-unit centroids — pre-r12 it ranked by raw dot
    product (no centroid-norm divide) and probed magnitude-biased
    clusters on exactly this input."""
    from locustdb_spark.operators.similarity import (
        _rank_probes, rank_probes_seq)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet")
    base = [[float(x) for x in r.embedding]
            for r in emb.filter("vec_id < 6").orderBy("vec_id")
            .collect()]
    cents = [[x * (0.25 * (2 ** j)) for x in c]
             for j, c in enumerate(base)]
    q = [float(x)
         for x in emb.filter("vec_id = 7").head().embedding]
    for nprobe in (1, 2, 4, 6):
        assert _rank_probes(cents, q, nprobe) == \
            rank_probes_seq(cents, q, nprobe)


def test_cosine_topk_literal_norm_is_bit_identical(spark):
    """r12 norm hoist: cosine_topk now inlines the query norm as a
    driver-computed literal (identical left-to-right fold + sqrt).
    Pin the hoisted expression against the original
    dot/(norm*norm) formulation — exact equality, no tolerance."""
    from locustdb_spark.operators.similarity import (
        cosine, cosine_topk)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet")
    q = [float(x)
         for x in emb.filter("vec_id = 3").head().embedding]
    got = cosine_topk(emb, q, k=20).collect()
    qarr = F.array(*[F.lit(float(x)) for x in q])
    sim = F.round(
        cosine(F.col("embedding").cast("array<double>"), qarr), 6)
    want = (emb.select(F.col("vec_id"), sim.alias("cosine_sim"))
            .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
            .limit(20).collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_knn_join_norm_hoist_is_bit_identical(spark):
    """r12 norm hoist: knn_join materializes per-row norms on each
    side of the broadcast join; pin it against the original inline
    cosine() formulation — exact row equality."""
    from pyspark.sql.window import Window

    from locustdb_spark.operators.similarity import cosine, knn_join

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") % 29 == 0)
    got = sorted(map(tuple, knn_join(emb, probes, k=4).collect()))
    q = probes.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("_q_vec"))
    sim = F.round(cosine(
        F.col("embedding").cast("array<double>"), F.col("_q_vec")), 6)
    pairs = (emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
             .select("q_id", F.col("vec_id"), sim.alias("cosine_sim")))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id"))
    want = sorted(map(tuple, (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 4).drop("_rn").collect())))
    assert got == want


def test_ivf_assign_expr_hoist_is_bit_identical(spark):
    """r12 hoists in ivf_assign_expr (per-row vector norm + literal
    centroid norms): pin the hoisted per-centroid cosine argmax
    against the original inline cosine() formulation — exact cluster
    equality on raw (non-unit) corpus-vector centroids."""
    from locustdb_spark.operators.similarity import (
        cosine, ivf_assign_expr)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(250)
    cents = [[float(x) for x in r.embedding]
             for r in emb.filter("vec_id < 5").orderBy("vec_id")
             .collect()]
    got = {r.vec_id: r.cluster
           for r in ivf_assign_expr(emb, cents).collect()}
    vec = F.col("embedding").cast("array<double>")
    sims = F.array(*[
        cosine(vec, F.array(*[F.lit(float(x)) for x in c]))
        for c in cents])
    cluster = (F.array_position(sims, F.array_max(sims)) - 1) \
        .cast("int")
    want = {r.vec_id: r.cluster
            for r in emb.withColumn("cluster", cluster).collect()}
    assert got == want


def test_unrolled_fold_parity_on_vectors(spark):
    """r12 unroll: dot_fast / dot_lit / norm_fast / sq_l2_* must be
    BIT-identical to the interpreted fold formulations on well-formed
    vectors (same IEEE ops, same left-to-right order) — exact
    equality via the double's raw bits (casting to string keeps
    -0.0/NaN distinctions out; compare with == on doubles plus an
    explicit both-null check)."""
    from locustdb_spark.operators.similarity import (
        _sq_l2_fold, dot, dot_fast, dot_lit, norm, norm_fast,
        sq_l2_fast, sq_l2_lit)

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet") \
        .limit(300)
    q = [float(x)
         for x in emb.filter("vec_id = 11").head().embedding]
    dims = len(q)
    # stage named columns — the helpers' fast path takes column NAMES
    staged = emb.select(
        F.col("embedding").cast("array<double>").alias("va"),
        F.reverse(F.col("embedding").cast("array<double>"))
        .alias("vb"))
    a, b = F.col("va"), F.col("vb")
    qarr = F.array(*[F.lit(float(x)) for x in q])

    def _eq(x, y):
        return x.eqNullSafe(y)

    bad = staged.filter(~(
        _eq(dot_fast("va", "vb", dims), dot(a, b))
        & _eq(dot_lit("va", q), dot(a, qarr))
        & _eq(norm_fast("va", dims), norm(a))
        & _eq(sq_l2_lit("va", q), _sq_l2_fold(a, qarr))
        & _eq(sq_l2_fast("va", "vb", dims), _sq_l2_fold(a, b))
    )).count()
    assert bad == 0


def test_unrolled_fold_parity_on_ragged_and_null(spark):
    """r12 unroll: on rows whose array length does NOT match the
    static dims (ragged, empty, null) every helper must fall back to
    the fold and produce its exact result (null-padding semantics)."""
    from locustdb_spark.operators.similarity import (
        _sq_l2_fold, dot, dot_fast, dot_lit, norm, norm_fast,
        sq_l2_fast, sq_l2_lit)

    rows = [
        ([1.0, 2.0, 3.0],),          # matching dims=3
        ([1.0, 2.0],),               # short
        ([1.0, 2.0, 3.0, 4.0],),     # long
        ([],),                       # empty
        (None,),                     # null array
        ([1.0, float("nan"), -0.0],),  # NaN / negative zero
    ]
    df = spark.createDataFrame(rows, "v array<double>")
    q = [0.5, -1.5, 2.5]
    a = F.col("v")
    qarr = F.array(*[F.lit(float(x)) for x in q])

    def _eq(x, y):
        # eqNullSafe covers both-null; Spark's NaN semantics make
        # NaN = NaN true, so the NaN row needs no special casing
        return x.eqNullSafe(y)

    bad = df.filter(~(
        _eq(dot_fast("v", "v", 3), dot(a, a))
        & _eq(dot_lit("v", q), dot(a, qarr))
        & _eq(norm_fast("v", 3), norm(a))
        & _eq(sq_l2_lit("v", q), _sq_l2_fold(a, qarr))
        & _eq(sq_l2_fast("v", "v", 3), _sq_l2_fold(a, a))
        # Column-typed args must keep the plain fold path
        & _eq(dot_fast(a, a, 3), dot(a, a))
        & _eq(norm_fast(a, 3), norm(a))
    )).count()
    assert bad == 0


def test_adc_dist_expr_unrolled_matches_fold(spark):
    """r12 unroll: adc_dist_expr's unrolled table-lookup chain must
    equal the original zip_with fold on real codes (and fall back on
    ragged codes rows)."""
    from locustdb_spark.operators.similarity import adc_dist_expr

    table = [[float(s * 16 + c) / 7.0 for c in range(16)]
             for s in range(4)]
    rows = [([0, 5, 15, 3],), ([1, 1, 1, 1],), ([0, 5],), (None,)]
    df = spark.createDataFrame(rows, "codes array<int>")
    tbl = F.array(*[F.array(*[F.lit(v) for v in row]) for row in table])
    fold = F.aggregate(
        F.zip_with(F.col("codes"), tbl,
                   lambda c, trow: F.element_at(trow, c + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    bad = df.filter(
        ~adc_dist_expr(table, "codes").eqNullSafe(fold)).count()
    assert bad == 0


def test_ngram_jaccard_algebraic_union_is_bit_identical(spark):
    """r12: ngram_jaccard_pairs now counts |A∪B| as |A|+|B|−|A∩B|
    (valid because gram arrays are distinct by construction) instead
    of materializing the union array. Pin the operator against the
    original array_union formulation — exact value equality."""
    from locustdb_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures, ngram_jaccard_pairs)

    docs = spark.read.parquet(f"{TESTDATA_SF}/documents.parquet")
    sigs = minhash_signatures(docs, num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=2)
    got = ngram_jaccard_pairs(docs, pairs, n=3)
    # reference: same pruned gram arrays, original union formulation
    ids = (pairs.select(F.col("id_a").alias("gid"))
           .unionByName(pairs.select(F.col("id_b").alias("gid")))
           .distinct())
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _g(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            ws = [w for w in (t or "").lower().split(" ") if w]
            k = max(len(ws) - 3, 0)
            g = [" ".join(ws[i:i + 3]) for i in range(k + 1)]
            out.append(list(dict.fromkeys(g)))
        return pd.Series(out)

    dg = (docs.select(F.col("doc_id").alias("gid"), "text")
          .join(ids, "gid")
          .select("gid", _g(F.col("text")).alias("grams")))
    ref = (pairs
           .join(dg.select(F.col("gid").alias("id_a"),
                           F.col("grams").alias("grams_a")), "id_a")
           .join(dg.select(F.col("gid").alias("id_b"),
                           F.col("grams").alias("grams_b")), "id_b")
           .select("id_a", "id_b",
                   (F.size(F.array_intersect("grams_a", "grams_b"))
                    / F.greatest(
                        F.size(F.array_union("grams_a", "grams_b")),
                        F.lit(1))).alias("jaccard")))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, ref.collect()))


def test_max_occurrence_sorted_runs_is_bit_identical(spark):
    """r12: quality_score/gopher's most-frequent-token count is now
    an O(n log n) sorted-runs fold instead of the O(distinct x n)
    transform+filter. Pin exact integer equality against the original
    formulation on the real corpus plus hand-built edge cases."""
    from locustdb_spark.operators.text import _max_occurrence, _tokens

    docs = spark.read.parquet(f"{TESTDATA_SF}/documents.parquet") \
        .select("text")
    edge = spark.createDataFrame(
        [("",), ("  ",), ("one",), ("a a a a",), ("a b a b c a",),
         (None,)], "text string")
    df = docs.unionByName(edge)
    pre = df.select(_tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    old = F.coalesce(
        F.array_max(F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda t: t == d)))),
        F.lit(0)).cast("long")
    bad = pre.filter(
        ~_max_occurrence("_toks").eqNullSafe(old)).count()
    assert bad == 0


def test_embedding_near_dup_expr_norm_hoist_matches_arrow(spark):
    """r12 norm hoist in the expr pair path: both impls must stay
    exactly equal (the arrow kernel is the unchanged reference)."""
    from locustdb_spark.operators.dedup import embedding_near_dup

    emb = spark.read.parquet(f"{TESTDATA_SF}/embeddings.parquet")
    ex = sorted(map(tuple, embedding_near_dup(
        emb, threshold=0.1, num_planes=4, impl="expr").collect()))
    ar = sorted(map(tuple, embedding_near_dup(
        emb, threshold=0.1, num_planes=4, impl="arrow").collect()))
    assert ex == ar
    assert len(ex) > 0
