"""Similarity search over embedding columns (array<float>).

Scale design:
- Brute-force top-k is a single projection (zip_with dot product over
  the scan) followed by TakeOrderedAndProject — no shuffle of vectors,
  only the per-partition top-k rows reach the driver. At 100 TB this
  is scan-bound, which is the right bound for a one-off query.
- For repeated queries, `hyperplane_buckets` assigns every vector an
  LSH bucket from deterministic md5-derived random hyperplanes; an ANN
  query then probes only its own bucket (a partition-prunable filter
  when the table is written bucketed/partitioned by `bucket`). The
  hyperplanes are pseudo-random ±1 per (plane, dim) derived from md5,
  so bucketing is reproducible in any engine (oracle-checkable).
- Exact paths and LSH are built-in expression work (JVM, codegen).
  IVF (`kmeans_centroids`/`ivf_assign`/`ann_ivf_topk`) is the scale
  path for repeated queries: a driver-trained coarse quantizer, one
  Arrow-batched numpy matmul per batch for assignment, and probes
  that prune to nprobe/n_clusters of the corpus.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spread import spread_small_scan


class IvfUpsertLockError(RuntimeError):
    """Another `append_ivf_index(upsert=True)` holds the index's
    `_upsert.lock` (or a crashed one left it behind)."""


class IvfUpsertTornError(RuntimeError):
    """An upsert swap failed partway: the index partitions are torn,
    but every byte survives in the aside/stage dirs named in the
    message. The lock is intentionally left held."""


def _acquire_upsert_lock(store, lock: str, payload: bytes,
                         lock_retries: int, lock_backoff: float,
                         hint: str) -> None:
    """Take the index's put-if-absent writer lock, retrying with
    linear backoff (r8, VERDICT task 4): two LEGITIMATE concurrent
    maintainers — an append cron racing a compaction cron — should
    serialize inside the library rather than every caller hand-rolling
    the retry loop the race tests used to carry. `lock_retries=0`
    restores the r7 fail-fast behavior. The backoff is linear
    (`lock_backoff * attempt`), bounded at `lock_retries` sleeps; a
    lock left by a CRASHED writer burns the retries and then raises
    with the recovery instructions, which is the right failure for an
    unattended job (a human must inspect the aside/stage dirs)."""
    for attempt in range(1, lock_retries + 1):
        if store.put_if_absent(lock, payload):
            return
        time.sleep(lock_backoff * attempt)
    if not store.put_if_absent(lock, payload):
        raise IvfUpsertLockError(
            f"{lock} is held by another index rewrite (or left by a "
            f"crashed one) after {lock_retries} retries. {hint}")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- r12: codegen-unrolled twins of the fold expressions ------------------
#
# Array higher-order functions (`aggregate`, `zip_with`) are
# CodegenFallback in Spark 4: every vector fold (dot/norm/squared-L2/
# ADC lookup sum) is evaluated INTERPRETED, one boxed lambda call per
# element, plus an intermediate array allocation per `zip_with`. When
# the array length is statically known (embedding dims from the
# query/centroids, PQ sub-dims, table row count), the same arithmetic
# can be emitted as an unrolled chain of GetArrayItem/multiply/add
# expressions that codegen JIT-compiles — measured 3.1x on the
# pq_encode shape (m*K folds per row, OPTIMIZATION_r12.md §6).
#
# Bit-identity: the fold computes ((0.0 + t0) + t1) + … left to
# right; the chain starts from 0.0D and adds the same terms in the
# same order — identical IEEE-754 ops in identical order. Every
# helper guards on the runtime array size and falls back to the
# ORIGINAL fold on mismatch, so ragged/short/null-array null-padding
# semantics are preserved exactly (pinned in tests/test_operators.py
# ::test_unrolled_fold_parity*).
#
# Two hard-won constraints (the first cut of this change regressed
# 5-10x at sf1 before they were understood — OPTIMIZATION_r12.md §6):
#
# 1. The indexed array MUST be a bare attribute (a named column), so
#    helpers take COLUMN NAMES, not Column expressions. Indexing a
#    non-trivial expression (e.g. `cast(embedding as array<double>)`)
#    inlines that expression into EVERY term — each term then re-cast
#    the whole array, O(dims^2) work per row, the same defect class
#    as the round's `lower(text)`-in-lambda finding. Call sites stage
#    the cast as a named column first.
#
# 2. Each expression is built as ONE SQL string parsed by a single
#    `F.expr` call. Building thousands of Column objects through
#    py4j costs ~1ms per operator call — the Column-based first cut
#    added 9-18s of driver time per PQ-family query (measured).
#    Literals are rendered with repr(): Python float repr is the
#    shortest round-trip form, and Java's Double.parseDouble of that
#    string is correctly rounded, so the parsed double is bit-equal.
#
# Chains are deliberately NOT used where a downstream filter/join
# references the computed column (ivf_assign_expr's `cluster`,
# bucket_expr's `bucket`, semantic_dedup's `_ccos`): Catalyst's
# predicate pushdown substitutes aliases recursively down to the
# scan, so an inferred `isnotnull`/join filter re-derives the whole
# expression — a fold re-derivation costs one fold, but a chain
# re-derivation multiplies every upstream subexpression by its
# per-term reference count (measured: sim_ann_ivf_frozen 2.3 -> 32 s
# at sf1 before the revert). Those sites keep the fold formulation.
#
# _UNROLL_MAX_TERMS bounds the emitted expression size: a call site
# that would exceed it keeps the fold — plan/codegen size must not
# grow with a caller's geometry. 1024 is the measured-safe bound
# (r12 ADVICE: near 4096 a single Add chain can hit Janino's 64 KB
# method limit / deep-recursion stack pressure and fall back to
# whole-stage-interpreted — correct but slower than the fold it
# replaced; every shipped geometry is <= 256 terms).

_UNROLL_MAX_TERMS = 1024


def _dlit(v: float) -> str | None:
    """SQL double literal bit-equal to the Python float (shortest
    round-trip repr + correctly-rounded parse); None if not finite
    (callers fall back to the Column path)."""
    f = float(v)
    if not math.isfinite(f):
        return None
    return repr(f) + "D"


def _dlits(vals: list[float]) -> list[str] | None:
    out = []
    for v in vals:
        s = _dlit(v)
        if s is None:
            return None
        out.append(s)
    return out


def _qname(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _chain_sql(terms: list[str]) -> str:
    """Left-to-right sum starting at 0.0D — the exact accumulation
    order of `aggregate(_, 0.0D, (acc, t) -> acc + t)` (SQL `+` is
    left-associative; `*` binds tighter)."""
    return "0.0D + " + " + ".join(terms)


def dot_fast(a: Column | str, b: Column | str,
             dims: int | None) -> Column:
    """`dot(a, b)` with an unrolled codegen chain when both arrays
    have the statically-expected length; interpreted fold otherwise.
    Pass column NAMES (the fast single-parse SQL path — also
    guarantees attribute indexing); Column args keep the fold."""
    if (dims is None or not (0 < dims <= _UNROLL_MAX_TERMS)
            or not (isinstance(a, str) and isinstance(b, str))):
        a = F.col(a) if isinstance(a, str) else a
        b = F.col(b) if isinstance(b, str) else b
        return dot(a, b)
    an, bn = _qname(a), _qname(b)
    chain = _chain_sql([f"{an}[{i}] * {bn}[{i}]" for i in range(dims)])
    fold = (f"aggregate(zip_with({an}, {bn}, (x, y) -> x * y), 0.0D, "
            f"(acc, v) -> acc + v)")
    return F.expr(
        f"CASE WHEN size({an}) = {dims} AND size({bn}) = {dims} "
        f"THEN {chain} ELSE {fold} END")


def dot_lit(a: Column | str, vals: list[float]) -> Column:
    """`dot(a, literal-array(vals))`, unrolled: each term multiplies
    one array element by an inlined double literal."""
    lits = _dlits(vals) if isinstance(a, str) else None
    if lits is None or not (0 < len(vals) <= _UNROLL_MAX_TERMS):
        a = F.col(a) if isinstance(a, str) else a
        return dot(a, F.array(*[F.lit(float(x)) for x in vals]))
    an = _qname(a)
    arr = "array(" + ", ".join(lits) + ")"
    chain = _chain_sql(
        [f"{an}[{i}] * {v}" for i, v in enumerate(lits)])
    fold = (f"aggregate(zip_with({an}, {arr}, (x, y) -> x * y), 0.0D, "
            f"(acc, v) -> acc + v)")
    return F.expr(f"CASE WHEN size({an}) = {len(vals)} "
                  f"THEN {chain} ELSE {fold} END")


def norm_fast(a: Column | str, dims: int | None) -> Column:
    """`norm(a)` (sqrt of the left-to-right sum of squares) with the
    sum unrolled when the length is statically expected."""
    if (dims is None or not (0 < dims <= _UNROLL_MAX_TERMS)
            or not isinstance(a, str)):
        a = F.col(a) if isinstance(a, str) else a
        return norm(a)
    an = _qname(a)
    chain = _chain_sql([f"{an}[{i}] * {an}[{i}]" for i in range(dims)])
    fold = f"aggregate({an}, 0.0D, (acc, v) -> acc + v * v)"
    return F.expr(f"SQRT(CASE WHEN size({an}) = {dims} "
                  f"THEN {chain} ELSE {fold} END)")


def _sq_l2_fold(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def sq_l2_lit(a: Column | str, vals: list[float]) -> Column:
    """Squared L2 distance of an array column to a literal vector,
    unrolled: sum of (a[i] - lit)^2 in fold order."""
    lits = _dlits(vals) if isinstance(a, str) else None
    if lits is None or not (0 < len(vals) <= _UNROLL_MAX_TERMS):
        a = F.col(a) if isinstance(a, str) else a
        return _sq_l2_fold(a, F.array(*[F.lit(float(x)) for x in vals]))
    an = _qname(a)
    arr = "array(" + ", ".join(lits) + ")"
    chain = _chain_sql(
        [f"({an}[{i}] - {v}) * ({an}[{i}] - {v})"
         for i, v in enumerate(lits)])
    fold = (f"aggregate(zip_with({an}, {arr}, "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)")
    return F.expr(f"CASE WHEN size({an}) = {len(vals)} "
                  f"THEN {chain} ELSE {fold} END")


def sq_l2_fast(a: Column | str, b: Column | str,
               dims: int | None) -> Column:
    """Squared L2 of two array columns, unrolled when the length is
    statically expected."""
    if (dims is None or not (0 < dims <= _UNROLL_MAX_TERMS)
            or not (isinstance(a, str) and isinstance(b, str))):
        a = F.col(a) if isinstance(a, str) else a
        b = F.col(b) if isinstance(b, str) else b
        return _sq_l2_fold(a, b)
    an, bn = _qname(a), _qname(b)
    chain = _chain_sql(
        [f"({an}[{i}] - {bn}[{i}]) * ({an}[{i}] - {bn}[{i}])"
         for i in range(dims)])
    fold = (f"aggregate(zip_with({an}, {bn}, "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)")
    return F.expr(
        f"CASE WHEN size({an}) = {dims} AND size({bn}) = {dims} "
        f"THEN {chain} ELSE {fold} END")


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    r12 (guide §1.2 step 2): the query's norm is a constant, but
    Catalyst does not constant-fold `aggregate` over a literal array
    (higher-order functions are not foldable), so `cosine(v, q)` paid
    an interpreted

    fold over the `dims`-element literal PER ROW just
    to recompute the same number. It is now computed once driver-side
    with the identical left-to-right `acc + x*x` fold and `sqrt`
    (IEEE-754 double ops in the same order — bit-identical to what
    the JVM fold produced), inlined as a literal; per row only the
    dot and the vector's own norm remain. Division/multiply order is
    unchanged, so `cosine_sim` is bit-identical."""
    import math

    acc = 0.0
    for x in query_vec:
        acc = acc + float(x) * float(x)
    q_norm = math.sqrt(acc)
    # NB deliberately NOT unrolled (r12): chains here cost a FIXED
    # ~13 ms/run at gate scale (bigger serialized plan per task) for
    # a per-row win that only shows at corpus scale — and this is a
    # headline bench query at sf0.1. The single-query exact scan is
    # not a production path at scale (ann/pq probes are); those keep
    # their chains. Same-host A/B: 0.0193 -> 0.0325 s with chains.
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = F.col(vec_col).cast("array<double>")
    sim = dot(vec, q) / (norm(vec) * F.lit(q_norm))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """k-NN join: for every query vector, the top-k most-similar corpus
    vectors by cosine (excluding the query row itself). Returns
    (q_id, vec_id, cosine_sim).

    The query side is broadcast (it is the small side by construction
    — a batch of probe vectors), so the corpus never shuffles to
    compute similarities; only the (q_id, vec_id, sim) pair stream
    reaches the row_number window, which shuffles |corpus| x |queries|
    triples on q_id. That bound makes this the exact-answer path for
    query batches up to ~thousands; larger batches should go through
    `ann_knn_join` (the indexed batch probe over a persisted IVF
    index, which prunes the pair space to ~nprobe/n_clusters before
    any join) or the single-query LSH/IVF probes.
    """
    from pyspark.sql.window import Window

    # r12 norm hoist (guide §1.2 step 2): cosine(v, qv) evaluated
    # THREE interpreted folds per (corpus x query) PAIR — the dot plus
    # both norms, though each norm is a per-ROW invariant (the corpus
    # norm was recomputed once per query and the query norm once per
    # corpus row). Both norms are materialized once per row on their
    # own side of the broadcast join; only the dot fold remains per
    # pair. Identical expressions over identical arrays and the same
    # multiply/divide order, so cosine_sim is bit-identical.
    # The corpus side is also spread across cores first (guide §2.5):
    # the pair compute runs in the corpus scan stage, which at
    # gate/sweep scale is otherwise a one/two-split scan.
    corpus = spread_small_scan(corpus)
    # NB deliberately NOT unrolled (r12): like cosine_topk, chains
    # cost a FIXED ~20 ms/run at gate scale (bigger serialized plan
    # per task) and this is a headline bench query; the exact join is
    # the recall-1.0 baseline, not the at-scale path — ann_knn_join /
    # pq_knn_join keep their chains. Same-host A/B at sf0.1:
    # 0.0285 -> 0.0506 s with chains (sf1 steady won 1.84 -> 1.47 s,
    # which the indexed batch paths retain).
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_c_vec"),
    ).withColumn("_c_norm", norm(F.col("_c_vec")))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("_q_vec"),
    ).withColumn("_q_norm", norm(F.col("_q_vec")))
    sim = (dot(F.col("_c_vec"), F.col("_q_vec"))
           / (F.col("_c_norm") * F.col("_q_norm")))
    if round_to is not None:
        sim = F.round(sim, round_to)
    pairs = (
        c.join(F.broadcast(q), F.col(id_col) != F.col("q_id"))
        .select("q_id", F.col(id_col), sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _plane_sign(plane: int, dim: int) -> float:
    """Deterministic ±1 for (plane, dim): parity of a byte of
    md5('p<plane>_d<dim>') — portable to any engine with md5."""
    import hashlib

    h = int(hashlib.md5(f"p{plane}_d{dim}".encode()).hexdigest()[:2], 16)
    return 1.0 if h % 2 == 0 else -1.0


def _infer_dims(df: DataFrame, vec_col: str) -> int:
    return df.select(F.size(F.col(vec_col)).alias("d")).head().d


def bucket_expr(vec: Column, num_planes: int, dims: int) -> Column:
    """Sign-LSH bucket id expression: bit p = (v . hyperplane_p) >= 0.

    The hyperplane signs depend only on (plane, dim), so they are
    computed once on the driver and inlined as literal arrays; each
    projection is then a constant-folded zip_with dot product per row
    (no per-row hashing). Assumes fixed-dimension vectors.
    """
    # NB deliberately NOT unrolled (r12): `bucket` is consumed as a
    # join/filter key by every LSH path, and predicate pushdown
    # substitutes the whole expression into inferred filters — a
    # chain re-derivation there multiplies every upstream
    # subexpression by its per-term reference count (see the
    # dot_fast helper header). The fold re-derives once.
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        signs = F.array(
            *[F.lit(_plane_sign(p, i)) for i in range(dims)]
        )
        proj = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(0)
    return bucket


def random_projection(
    df: DataFrame,
    out_dims: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Dimensionality reduction by signed random projection
    (Achlioptas-style +-1 matrix): y_j = (1/sqrt(out_dims)) *
    sum_i x_i * sign(j, i). Preserves pairwise distances in
    expectation (Johnson-Lindenstrauss), which is what downstream
    dedup/ANN need from a cheap reduce step.

    The +-1 matrix reuses the md5-derived `_plane_sign` grid, so the
    projection is deterministic and engine-portable (oracle-checkable)
    — and it is inlined as literal arrays, making each output
    dimension a constant-folded zip_with dot product over the scan:
    zero shuffles, no UDF, no driver-side matrix broadcast needed.
    Output: (id, projected array<double>).
    """
    if dims is None:
        dims = _infer_dims(df, vec_col)
    scale = 1.0 / (out_dims ** 0.5)
    # r12 unroll: out_dims dot folds/row -> codegen chains (same fold
    # order, bit-identical — see dot_lit). The cast array is staged
    # as a named column first so chain terms index a bare attribute.
    pre = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"))
    comps = []
    for j in range(out_dims):
        proj = dot_lit(
            "_v", [_plane_sign(j, i) for i in range(dims)]) * F.lit(scale)
        comps.append(F.round(proj, round_to) if round_to else proj)
    return pre.select(F.col(id_col), F.array(*comps).alias("projected"))


def hyperplane_buckets(
    df: DataFrame,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
) -> DataFrame:
    """Sign-LSH bucket id per vector (see `bucket_expr`).

    Output: (id, bucket) — at scale, write the table partitioned by
    bucket so an ANN probe prunes to 1/2^planes of the data.
    """
    if dims is None:
        dims = _infer_dims(df, vec_col)
    vec = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col), bucket_expr(vec, num_planes, dims).alias("bucket")
    )



def _rank_probes(centroids: list[list[float]], query_vec: list[float],
                 nprobe: int) -> list[int]:
    """Top-nprobe cluster ids by centroid-COSINE-query (the shared
    probe-selection for in-memory and persisted IVF paths).

    r12 (ADVICE): centroid rows are L2-normalized the same way
    `ivf_assign` normalizes them (zero-norm rows guarded, dot stays
    0), so dot-with-unit-query equals cosine for ANY centroid source —
    previously raw non-unit user-supplied centroids were ranked by
    magnitude-biased dot product here while the `rank_probes_seq`
    oracle twin divided by the centroid norm, probing different
    clusters and losing recall. For every shipped centroid source
    (unit rows from spherical kmeans) the division perturbs scores by
    ~1 ulp, far below any inter-centroid score gap."""
    c = np.array(centroids, dtype=float)
    cn = np.linalg.norm(c, axis=1, keepdims=True)
    c = c / np.where(cn == 0, 1.0, cn)
    q = np.array([float(x) for x in query_vec], dtype=float)
    qn = q / np.linalg.norm(q)
    return [int(i) for i in
            np.argsort(-(c @ qn), kind="stable")[:nprobe]]


def _query_bucket(query_vec: list[float], num_planes: int) -> int:
    """Sign-LSH bucket of a query vector in float64 — MUST match
    bucket_expr's double-precision arithmetic (np.float32 inputs
    would flip signs on near-zero projections)."""
    qbucket = 0
    for p in range(num_planes):
        proj = sum(float(x) * _plane_sign(p, i)
                   for i, x in enumerate(query_vec))
        if proj >= 0:
            qbucket |= 1 << p
    return qbucket


def kmeans_centroids(
    df: DataFrame,
    n_clusters: int = 16,
    sample: int = 4096,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Spherical k-means coarse quantizer for IVF, trained on a
    bounded, deterministic, *unbiased* sample: the `sample` vectors
    with the smallest xxhash64(id) (TakeOrderedAndProject — no full
    scan materialized on the driver). Ordering by a hash of the id
    instead of the id itself means time-ordered or cluster-sorted
    corpora don't train centroids on their oldest/first slice; the
    hash order is a uniform pseudo-random permutation, so the sample
    is i.i.d.-like while staying bit-deterministic across runs.

    Deterministic by construction: init is the first `n_clusters`
    sampled vectors (in hash order), then `iters` Lloyd steps in
    numpy. At 100 TB the sample stays 4096 rows regardless of corpus
    size; training cost is a driver-side matmul, and the centroids
    ship to executors as a closure constant.
    """
    rows = (
        df.orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=float)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    c = xn[:n_clusters].copy()
    for _ in range(iters):
        assign = np.argmax(xn @ c.T, axis=1)
        for j in range(n_clusters):
            members = xn[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return c.tolist()


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) centroid with an
    Arrow-batched pandas UDF — one numpy matmul per batch, not per row.

    Output: input columns + `cluster` (int). At scale, write the table
    partitioned by `cluster` so probes prune partitions; re-assignment
    after retraining is a single scan+write.

    Centroids are L2-normalized here (review r11): argmax(x̂ @ cᵀ) is
    max-COSINE only when the centroid rows are unit-norm too —
    `kmeans_centroids` (spherical) already returns unit rows, but
    frozen-raw-vector centroids on a non-normalized corpus would
    otherwise make this path diverge from `ivf_assign_expr`'s true
    cosine. Zero-norm centroids stay zero (dot 0, never win) rather
    than dividing by zero.
    """
    from pyspark.sql.functions import pandas_udf

    # r12 (guide §2.5): spread a starved gate-scale scan across cores
    # before the batch-matmul assignment (no-op at scale)
    df = spread_small_scan(df)
    c = np.array(centroids, dtype=float)
    cn = np.linalg.norm(c, axis=1, keepdims=True)
    c = c / np.where(cn == 0, 1.0, cn)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        x = np.array(v.tolist(), dtype=float)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        return pd.Series(np.argmax(xn @ c.T, axis=1).astype("int32"))

    return df.withColumn(
        "cluster", assign(F.col(vec_col).cast("array<double>"))
    )


def ivf_assign_expr(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """JVM-expression variant of :func:`ivf_assign`: per-centroid
    cosine as ordered-sum `aggregate` expressions over literal arrays,
    argmax with first-index (min cluster id) tie-break via
    array_position. Slower per row than the numpy matmul path but
    bit-reproducible in any engine with sequential list arithmetic —
    which is what lets an IVF pipeline sit under a SQL value-hash
    oracle (the numpy path's SIMD summation order differs).

    r12 hoists (guide §1.2 step 2), both bit-identical by
    construction: (1) the vector's own norm — previously re-folded
    inside cosine() once per CENTROID — is materialized once per row;
    (2) each centroid's norm is a constant, but Catalyst does not
    constant-fold `aggregate` over literal arrays, so it was an
    interpreted per-row fold too — it is now computed driver-side
    with the identical left-to-right `acc + x*x` fold and `sqrt`
    (same IEEE-754 double ops in the same order) and inlined as a
    literal. Per row: k dots + 1 norm instead of 3k folds. The
    divide/multiply order of cosine() is preserved. The input is
    spread across cores first (guide §2.5; no-op at scale)."""
    import math

    df = spread_small_scan(df)
    vec = F.col(vec_col).cast("array<double>")

    def _seq_norm(c: list[float]) -> float:
        acc = 0.0
        for x in c:
            acc = acc + float(x) * float(x)
        return math.sqrt(acc)

    # NB deliberately NOT unrolled (r12): `cluster` is consumed by
    # isin filters (IVF probes) and join keys (semantic_dedup), and
    # predicate pushdown substitutes the whole argmax expression into
    # those filters — a chain re-derivation there multiplies every
    # upstream subexpression by its per-term reference count
    # (measured: sim_ann_ivf_frozen 2.3 -> 32 s at sf1 with chains;
    # see the dot_fast helper header). The fold re-derives once.
    #
    # r13 (VERDICT r12 item 7): the SAME per-centroid fold expressions
    # are rendered as ONE SQL string instead of ~70 py4j Column calls
    # per centroid (k x dims literal Columns cost seconds of driver
    # time per query at k >= 16; constraint 2 in the dot_fast helper
    # header; repr literals parse bit-equal). Identical parsed tree —
    # plan and results unchanged; Column path kept as the
    # non-finite-literal fallback.
    pre = df.select("*", norm(vec).alias("_vnorm"))
    lit_rows = [_dlits([float(x) for x in c]) for c in centroids]
    norm_lits = _dlits([_seq_norm(c) for c in centroids])
    if all(r is not None for r in lit_rows) and norm_lits is not None:
        vn = _qname(vec_col)
        vsql = f"CAST({vn} AS ARRAY<DOUBLE>)"
        folds = ", ".join(
            f"aggregate(zip_with({vsql}, array({', '.join(r)}), "
            f"(x, y) -> x * y), 0.0D, (acc, v) -> acc + v) / "
            f"(`_vnorm` * {nl})"
            for r, nl in zip(lit_rows, norm_lits))
        cluster = F.expr(
            f"CAST(array_position(array({folds}), "
            f"array_max(array({folds}))) - 1 AS INT)")
        return pre.withColumn("cluster", cluster).drop("_vnorm")
    coss = []
    for c in centroids:
        arr = F.array(*[F.lit(float(x)) for x in c])
        coss.append(dot(vec, arr)
                    / (F.col("_vnorm") * F.lit(_seq_norm(c))))
    sims = F.array(*coss)
    cluster = (F.array_position(sims, F.array_max(sims)) - 1) \
        .cast("int")
    return pre.withColumn("cluster", cluster).drop("_vnorm")


def rank_probes_seq(centroids: list[list[float]],
                    query_vec: list[float], nprobe: int) -> list[int]:
    """Probe selection with plain left-to-right Python float
    arithmetic (the oracle-reproducible twin of `_rank_probes`:
    matches sequential SQL list_sum, unlike numpy's pairwise/SIMD
    summation order). Ties break to the smaller cluster id. Shared by
    `ann_ivf_topk(assign="expr")` and the IVF-PQ gate entry."""
    import math

    qnorm = math.sqrt(sum(x * x for x in query_vec))
    scored = []
    for j, cvec in enumerate(centroids):
        d = 0.0
        for a, b in zip(cvec, query_vec):
            d += a * b
        cn = math.sqrt(sum(x * x for x in cvec))
        scored.append((-(d / (cn * qnorm)), j))
    return [j for _, j in sorted(scored)[:nprobe]]


def ann_ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
    centroids: list[list[float]] | None = None,
    assign: str = "numpy",
) -> DataFrame:
    """IVF approximate top-k: probe the `nprobe` clusters whose
    centroids are most cosine-similar to the query, brute-force only
    within them. nprobe == n_clusters degrades to exact search
    (useful for testing recall).

    Pass precomputed `centroids` to skip training (the production
    pattern: train once, store, reuse per query). `assign="expr"`
    routes assignment AND probe selection through sequential-order
    arithmetic (ivf_assign_expr + plain Python sums) so the whole
    pipeline is reproducible in SQL engines — the oracle-checkable
    mode; the default numpy path is the fast one.
    """
    if centroids is None:
        centroids = kmeans_centroids(
            df, n_clusters, vec_col=vec_col, id_col=id_col
        )
    if assign == "expr":
        probe = rank_probes_seq(centroids, query_vec, nprobe)
        assigned = ivf_assign_expr(df, centroids, vec_col, id_col)
    else:
        probe = _rank_probes(centroids, query_vec, nprobe)
        assigned = ivf_assign(df, centroids, vec_col, id_col)
    cands = assigned.filter(
        F.col("cluster").isin([int(p) for p in probe])
    )
    return cosine_topk(cands, query_vec, k, vec_col, id_col, round_to)


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
    grouping: str = "pairwise",
    assign: str = "expr",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pruning over an embedding column. Each vector is
    assigned to its nearest centroid; within a cluster, vectors whose
    pairwise cosine meets `threshold` form near-dup groups, and the
    member with the LOWEST cosine to the cluster centroid survives
    (the paper's keep-the-most-extremal rule; ties break to the
    smaller id). At the paper's operating point (threshold near 1)
    near-dup groups are effectively cliques, so the pairwise rule
    "drop v iff some in-cluster near-dup u is a better keeper" equals
    the group rule without a transitive-closure pass.

    ``grouping`` picks the rule:

    - ``"pairwise"`` (default, the paper's regime): the local drop
      rule above — one within-cluster join, no iteration. At LOW
      thresholds, where near-dup groups are chains rather than
      cliques, this OVER-prunes: v can be dropped because of a
      "better keeper" u that is itself dropped, so a chain
      a—b—c can lose both b and c even though c is not a near-dup
      of the survivor a (r8 ADVICE finding).
    - ``"components"``: take connected components of the
      within-cluster near-dup graph (`dedup.
      connected_component_labels` — O(log n) min-label rounds over
      (id, label) longs) and keep exactly ONE member per component,
      the lowest-centroid-cosine one (ties to the smaller id). Never
      over-prunes a chain; each component keeps its most extremal
      member. Use this when running far below the paper's threshold.

    Output: one row per input vector — (id_col, cluster,
    centroid_cos, keep) — so keep-rates and cluster histograms fall
    out of one aggregation.

    Scale shape: assignment and centroid cosine are pure projections
    against broadcast literal centroids. ``assign="expr"`` (default)
    routes assignment through `ivf_assign_expr` — the
    bit-reproducible sequential-fold arithmetic that keeps this
    operator oracle-checkable, but INTERPRETED and O(k) fold
    evaluations per row, so its cost grows with the cluster count;
    ``assign="numpy"`` routes through the Arrow-batched matmul
    (`ivf_assign`), the production path at the paper's k ~ n/100
    geometry where k is in the thousands (r11: at k=2048 the expr
    assignment alone dominated the pipeline; the matmul is one
    BLAS call per batch regardless of k). `kmeans_centroids` is the
    production centroid source. The only shuffle is the
    within-cluster self-join, and SemDeDup's design is precisely
    what bounds it: k is chosen proportional to corpus size (the
    paper uses ~n/100 clusters), so cluster populations — and each
    join block — stay O(avg cluster), never O(corpus).
    """
    if assign not in ("expr", "numpy"):
        raise ValueError(
            f"assign must be 'expr' or 'numpy', got {assign!r}")
    assigner = ivf_assign_expr if assign == "expr" else ivf_assign
    assigned = assigner(df, centroids, vec_col, id_col)
    # r13 (VERDICT r12 item 7): render the literal centroid matrix as
    # ONE parsed SQL string when every value is finite (k x dims
    # F.lit Columns cost seconds of py4j driver time; repr literals
    # parse bit-equal) — identical tree, Column path as fallback.
    _cent_lits = [_dlits([float(x) for x in c]) for c in centroids]
    if all(r is not None for r in _cent_lits):
        cent_arr = F.expr("array(" + ", ".join(
            "array(" + ", ".join(r) + ")" for r in _cent_lits) + ")")
    else:
        cent_arr = F.array(*[
            F.array(*[F.lit(float(x)) for x in c]) for c in centroids
        ])
    vec = F.col(vec_col).cast("array<double>")
    # the per-row norm is hoisted out of the O(pairs) join below —
    # the pairwise check then folds ONE dot per pair instead of a
    # dot plus two redundant norms (same fold, same bits, third of
    # the interpreted work on the quadratic stage). r12: the same
    # hoist now covers the centroid-cosine projection — `_n` feeds
    # `_ccos` instead of cosine() re-folding norm(vec), and each
    # centroid's norm is a driver-side constant computed with the
    # identical left-to-right `acc + x*x` fold + sqrt (Catalyst
    # cannot constant-fold aggregate over literal arrays), inlined
    # as a literal array indexed by cluster. Same ops, same order —
    # `_ccos` is bit-identical.
    import math as _math

    def _seq_norm(c: list[float]) -> float:
        acc = 0.0
        for x in c:
            acc = acc + float(x) * float(x)
        return _math.sqrt(acc)

    cnorm_arr = F.array(*[F.lit(_seq_norm(c)) for c in centroids])
    # r12 unroll: ONLY the per-PAIR dot of the quadratic
    # within-cluster join below is a codegen chain (it runs O(pairs)
    # times over bare attributes — the dominant interpreted cost of
    # the operator). `_n` and `_ccos` stay folds: both leak into
    # pushdown-inferred isnotnull filters, where a chain
    # re-derivation multiplies upstream subexpressions (`_ccos`'s
    # would re-derive the argmax per term — see the dot_fast helper
    # header).
    dims = len(centroids[0]) if centroids else None
    pre = assigned.select(
        F.col(id_col).alias("id"),
        F.col("cluster"),
        vec.alias("_v"),
        norm(vec).alias("_n"),
    )
    base = pre.select(
        "id",
        "cluster",
        "_v",
        "_n",
        (dot(F.col("_v"), F.element_at(cent_arr, F.col("cluster") + 1))
         / (F.col("_n")
            * F.element_at(cnorm_arr, F.col("cluster") + 1)))
        .alias("_ccos"),
    ).persist()
    # ^ base is referenced three (pairwise) or four (components) times
    # below — each join side plus the final outer join — and without
    # the persist each reference re-scans the corpus and re-runs the
    # O(k) interpreted assignment folds (guide §5 "reused AND expensive
    # to recompute"; same within-query pattern as dedup.py's doc_grams).
    a = base.select(F.col("id").alias("id_a"), "cluster",
                    F.col("_v").alias("_va"), F.col("_n").alias("_na"),
                    F.col("_ccos").alias("_ca"))
    b = base.select(F.col("id").alias("id_b"), "cluster",
                    F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
                    F.col("_ccos").alias("_cb"))

    # r13 (guide §2.5 skew): the within-cluster pair join is quadratic
    # per cluster, but its shuffle is BYTE-tiny at gate scale, so (a)
    # at most n_clusters reducers ever get work and (b) AQE coalesces
    # those few partitions further (observed: the sf1 join ran as 8
    # tasks on 32 cores). Block-salt the pair enumeration: replicate
    # side a over B deterministic blocks, key side b by
    # pmod(xxhash64(id), B), and join on (cluster, block) — every pair
    # (u, v) still appears exactly once (u's B copies meet v's single
    # block), the per-key work drops from n_c^2 to n_c^2/B, and the
    # explicit REPARTITION_BY_NUM on the join keys pins the stage at
    # `parallelism` tasks (user-numbered shuffles are exempt from AQE
    # coalescing). Scale-adaptive: B == 1 — and the plan byte-identical
    # to the unsalted form — as soon as the cluster count covers the
    # core count (SemDeDup's k ~ n/100 geometry at any real scale);
    # the salt only exists for the frozen-16-centroid oracle gate.
    par = df.sparkSession.sparkContext.defaultParallelism
    n_clusters = max(1, len(centroids))
    blocks = min(64, max(1, -(-8 * par // n_clusters)))
    if blocks > 1:
        a = a.withColumn(
            "_bb", F.explode(F.array(
                *[F.lit(int(j)) for j in range(blocks)])))
        b = b.withColumn(
            "_bb",
            F.pmod(F.xxhash64(F.col("id_b")), F.lit(blocks)).cast("int"))
        a = a.repartition(par, "cluster", "_bb")
        b = b.repartition(par, "cluster", "_bb")
        pair_keys = ["cluster", "_bb"]
    else:
        pair_keys = ["cluster"]
    ccos = F.col("_ccos")
    if round_to is not None:
        ccos = F.round(ccos, round_to)
    if grouping == "components":
        from pyspark.sql.types import IntegralType

        from .dedup import connected_component_labels

        # the label-propagation state is (id, label) longs; a
        # non-integral id would cast to NULL, miss every edge join,
        # and silently keep EVERYTHING — fail loudly instead
        if not isinstance(df.schema[id_col].dataType, IntegralType):
            raise ValueError(
                f"grouping='components' requires an integral {id_col!r}"
                f" column (got {df.schema[id_col].dataType}); map ids "
                "to longs first or use grouping='pairwise'")
        # near-dup edges (each pair once); components can't cross
        # clusters, so the graph is a union of per-cluster graphs and
        # the edge count is bounded by the same within-cluster join
        edges = (
            a.join(b, pair_keys)
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(dot_fast("_va", "_vb", dims)
                    / (F.col("_na") * F.col("_nb")) >= threshold)
            .select("id_a", "id_b")
        )
        labels = connected_component_labels(base.select("id"), edges)
        keepers = (
            base.join(labels, "id")
            .groupBy("label")
            .agg(F.min(F.struct(F.col("_ccos").alias("c"),
                                F.col("id").alias("i"))).alias("_k"))
            .select(F.col("_k.i").alias("id"),
                    F.lit(True).alias("_keep"))
        )
        return (
            base.join(keepers, "id", "left")
            .select(
                F.col("id").alias(id_col),
                "cluster",
                ccos.alias("centroid_cos"),
                F.coalesce(F.col("_keep"), F.lit(False)).alias("keep"),
            )
        )
    if grouping != "pairwise":
        raise ValueError(
            f"grouping must be 'pairwise' or 'components', got {grouping!r}")
    # r13 (guide §1.2 step 1): enumerate each unordered pair ONCE.
    # "Better keeper" is a TOTAL order on (_ccos, id) — lower centroid
    # cosine wins, ties to the smaller id — so for a near-dup pair
    # exactly one member is the worse one and it is the only drop the
    # pair can contribute. The old `id_a != id_b` form evaluated every
    # pair twice (both orderings) to reach the same set; `id_a < id_b`
    # halves the quadratic stage. The pair dot is symmetric
    # (x_i * y_i term by term in index order), so the threshold test
    # admits exactly the same pairs.
    dropped = (
        a.join(b, pair_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dot_fast("_va", "_vb", dims)
                / (F.col("_na") * F.col("_nb")) >= threshold)
        .select(
            F.when(F.col("_ca") < F.col("_cb"), F.col("id_b"))
            .when(F.col("_ca") > F.col("_cb"), F.col("id_a"))
            .otherwise(F.col("id_b"))  # tie: smaller id keeps -> id_b
            .alias("id"))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        base.join(dropped, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            ccos.alias("centroid_cos"),
            F.coalesce(F.col("_drop"), F.lit(False)).alias("dropped"),
        )
        .withColumn("keep", ~F.col("dropped"))
        .drop("dropped")
    )


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN: restrict brute-force cosine to LSH buckets within Hamming
    distance `multiprobe` of the query's bucket (multi-probe LSH — a
    sign-flip on one near-zero projection moves a true neighbor to an
    adjacent bucket, so probing only the exact bucket collapses
    recall; radius 1 probes num_planes+1 of the 2^num_planes buckets
    and roughly triples measured recall@10 on random embeddings).
    multiprobe=0 is classic single-bucket LSH; multiprobe=num_planes
    degrades to exact search. The Hamming test is a JVM-side
    bit_count(xor) — bucket assignment stays a pure projection."""
    qbucket = _query_bucket(query_vec, num_planes)
    with_buckets = hyperplane_buckets(
        df, num_planes, vec_col, id_col, dims=len(query_vec)
    )
    near = with_buckets.filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qbucket)))
        <= multiprobe
    )
    candidates = df.join(near.select(id_col), id_col)
    return cosine_topk(candidates, query_vec, k, vec_col, id_col, round_to)


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int | None = 6,
) -> DataFrame:
    """Per-label embedding centroids in long form: (label, dim_idx,
    centroid_val) — the class-prototype computation behind nearest-
    centroid classification, IVF coarse training, and drift checks.

    posexplode turns the corpus into (label, dim, component) rows and a
    plain groupBy averages them — no UDAF, fully codegen'd, one shuffle
    on (label, dim). At 1000 executors the shuffle carries only
    (label, dim, partial-sum) triples thanks to partial aggregation,
    not the vectors.
    """
    exploded = df.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("dim_idx", "component"),
    )
    # exact integer-moment mean: float accumulation is partition-order
    # dependent and rounding it lands on knife edges across engines /
    # cluster layouts; int64 sums of 1e-8-unit components are
    # associative and bit-identical everywhere (float32 components are
    # fully captured at 1e-8 for the 6-decimal output)
    micro = F.round(F.col("component") * 1e8).cast("long")
    cent = F.sum(micro).cast("double") / F.count(F.lit(1)) / F.lit(1e8)
    if round_to is not None:
        cent = F.round(cent, round_to)
    return (
        exploded.groupBy(label_col, "dim_idx")
        .agg(cent.alias("centroid_val"))
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Per-dimension scalar quantization: map each component to an
    integer in [-2^(bits-1), 2^(bits-1)-1] using the corpus min/max of
    its dimension — the storage op that shrinks an embedding store 4x
    (float32 -> int8) with bounded recall loss.

    All arithmetic is IEEE +,-,*,/ and floor (no rounding-mode or
    transcendental dependence), so quantized codes are bit-identical
    across engines. The per-dim stats table is tiny (dims rows) and
    broadcast; everything else is projection + one (dim)-keyed partial
    agg. Output: (id, dim_idx, q) long form plus the reconstructed
    qvec array per row is left to the caller's collect_list.
    """
    levels = 1 << bits
    half = levels >> 1
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("dim_idx", "_x"),
    )
    stats = exploded.groupBy("dim_idx").agg(
        F.min("_x").alias("_mn"), F.max("_x").alias("_mx"))
    scaled = F.when(
        F.col("_mx") == F.col("_mn"), F.lit(0)
    ).otherwise(
        F.least(
            F.lit(levels - 1),
            F.floor((F.col("_x") - F.col("_mn"))
                    / (F.col("_mx") - F.col("_mn")) * F.lit(levels)),
        ) - F.lit(half)
    )
    return (
        exploded.join(F.broadcast(stats), "dim_idx")
        .select(F.col(id_col), "dim_idx",
                scaled.cast("long").alias("q"))
    )


def pq_codebooks_from_corpus(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Frozen product-quantization codebooks taken directly from the
    corpus: codeword `j` of subspace `s` is the `s`-th contiguous
    subvector of the vector with the `j`-th SMALLEST id (rank order,
    not `id < k` — works on any id distribution; the gate oracle
    mirrors the rank rule). Train-once-and-freeze is the production
    pattern; k-means-trained codebooks drop in as the same
    list-of-lists. Returns codebooks[s][j] = list[d/m floats]."""
    rows = (df.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("_v"))
            .orderBy(id_col).limit(k).collect())
    if len(rows) < k:
        raise ValueError(f"corpus has {len(rows)} vectors, need >= {k}")
    dims = len(rows[0]._v)
    if dims % m != 0:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    dsub = dims // m
    return [
        [[float(x) for x in r._v[s * dsub:(s + 1) * dsub]]
         for r in rows]
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Product-quantization encode (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each vector into
    `m` contiguous subvectors; each subvector becomes the index of its
    nearest codeword (minimum squared L2; ties to the smaller index)
    in that subspace's codebook. Output: (id_col, codes array<int>) —
    m small ints per vector, a 32x+ compression of a float64 embedding
    store, and the representation `pq_adc_topk` scores WITHOUT ever
    touching the original vectors.

    Scale shape: pure projection against broadcast literal codebooks —
    zero shuffles, embarrassingly parallel; at 100 TB the codes table
    (m bytes/vector) is what ships to the ANN tier, not embeddings.
    Every distance is an ordered sequential fold (zip_with squared
    diffs, left-to-right aggregate), so codes are bit-reproducible in
    any engine with sequential list arithmetic — what puts the whole
    PQ pipeline under the SQL value-hash oracle (`sim_pq_codes`).

    ``keep_cols`` carries extra input columns through the projection
    (e.g. the `cluster` assignment an IVF-PQ layout partitions by) —
    same rationale as `minhash_signatures`' keep_cols: strictly
    cheaper than joining codes back to the corpus on id.

    r12 (guide §1.2 step 2 + §2.5): each subspace's slice of the
    vector was an argument of every codeword's zip_with, so it was
    re-materialized once per (row, codeword) — K redundant
    dsub-element array builds per subspace per row. The m subvectors
    are now named columns built once per row; the distance folds are
    the identical expressions over the identical arrays, so codes are
    bit-identical. (No spread here: the upsert/compaction staging
    paths deliberately repartition by cluster immediately before
    encoding and rely on this staying a pure projection — the direct
    scan entries spread upstream instead.)"""
    vec = F.col(vec_col).cast("array<double>")
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    kept = [F.col(c) for c in (keep_cols or [])]
    pre = df.select(
        F.col(id_col), *kept,
        *[F.slice(vec, s * dsub + 1, dsub).alias(f"_sub{s}")
          for s in range(m)])
    code_cols = []
    for s, book in enumerate(codebooks):
        # NB deliberately NOT unrolled (r12): chains measured FASTER
        # in a synthetic micro (3.1x) but SLOWER in the real encode
        # projection at sf1 (bare noop 0.83 -> 2.34 s; the m*K CASE
        # exprs with fold fallbacks drop the projection out of
        # whole-stage codegen and the chain evaluates worse there
        # than the fold's primitive-array loop). Measured both ways —
        # see OPTIMIZATION_r12.md §6.
        #
        # r13 (VERDICT r12 item 7): the SAME fold expressions are now
        # rendered as ONE SQL string per subspace instead of ~12 py4j
        # Column calls per codeword — K x m of those cost 1-10 s of
        # driver time per query (constraint 2 in the dot_fast helper
        # header; literals render bit-equal via repr). The parsed
        # tree is the identical fold — plan and results unchanged;
        # the Column path remains as the non-finite-literal fallback.
        lit_rows = [_dlits([float(x) for x in cw]) for cw in book]
        if all(r is not None for r in lit_rows):
            sn = _qname(f"_sub{s}")
            folds = ", ".join(
                f"aggregate(zip_with({sn}, array({', '.join(r)}), "
                f"(a, b) -> (a - b) * (a - b)), 0.0D, "
                f"(acc, x) -> acc + x)" for r in lit_rows)
            code_cols.append(F.expr(
                f"CAST(array_position(array({folds}), "
                f"array_min(array({folds}))) - 1 AS INT)"))
            continue
        sub = F.col(f"_sub{s}")
        d2s = []
        for cw in book:
            arr = F.array(*[F.lit(float(x)) for x in cw])
            d2s.append(F.aggregate(
                F.zip_with(sub, arr, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x))
        dists = F.array(*d2s)
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int"))
    return pre.select(F.col(id_col), *[F.col(c) for c in (keep_cols or [])],
                      F.array(*code_cols).alias("codes"))


def adc_table(codebooks: list[list[list[float]]],
              query_vec: list[float]) -> list[list[float]]:
    """The m x K asymmetric-distance table for one query: squared L2
    between each query subvector and each codeword, computed with
    plain left-to-right Python float arithmetic so it is bit-identical
    to an oracle recomputing the same lookups in SQL. Driver-side and
    tiny (m*K doubles); shared by `pq_adc_topk`, the residual IVF-PQ
    probe (one table per probed cluster), and the recall harness."""
    mm = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(query_vec) != mm * dsub:
        raise ValueError(
            f"query dims {len(query_vec)} != m*dsub {mm * dsub}")
    table = []
    for s, book in enumerate(codebooks):
        qs = [float(x) for x in query_vec[s * dsub:(s + 1) * dsub]]
        row = []
        for cw in book:
            d = 0.0
            for a, b in zip(qs, cw):  # left-to-right, matches the fold
                d = d + (a - b) * (a - b)
            row.append(d)
        table.append(row)
    return table


def adc_dist_expr(table: list[list[float]],
                  codes_col: Column | str = "codes") -> Column:
    """ADC distance of a codes row against one literal m x K table:
    the sequential sum of m table lookups (zip_with + ordered
    aggregate — the same fold every PQ oracle replays)."""
    # r12 unroll: the m per-subspace table lookups as a codegen chain
    # (element_at on each literal row — the same op the fold's lambda
    # ran per element, same order, same ANSI out-of-bounds behavior);
    # fold fallback for codes rows of unexpected length. Built as one
    # SQL string (constraint 2 in the dot_fast helper header); the
    # Column path keeps the plain fold.
    m = len(table)
    rows_sql = ([_dlits([float(v) for v in row]) for row in table]
                if isinstance(codes_col, str) else None)
    if (isinstance(codes_col, str) and 0 < m <= _UNROLL_MAX_TERMS
            and all(r is not None for r in rows_sql)):
        cn = _qname(codes_col)
        tbl_sql = ("array(" + ", ".join(
            "array(" + ", ".join(r) + ")" for r in rows_sql) + ")")
        chain = _chain_sql([
            f"element_at(array({', '.join(rows_sql[s])}), {cn}[{s}] + 1)"
            for s in range(m)])
        fold = (f"aggregate(zip_with({cn}, {tbl_sql}, "
                f"(c, trow) -> element_at(trow, c + 1)), 0.0D, "
                f"(acc, x) -> acc + x)")
        return F.expr(f"CASE WHEN size({cn}) = {m} "
                      f"THEN {chain} ELSE {fold} END")
    tbl = F.array(*[
        F.array(*[F.lit(v) for v in row]) for row in table
    ])
    codes = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    return F.aggregate(
        F.zip_with(codes, tbl,
                   lambda c, trow: F.element_at(trow, c + 1)),
        F.lit(0.0), lambda acc, x: acc + x)


def pq_adc_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    round_to: int | None = 6,
) -> DataFrame:
    """Asymmetric distance computation (ADC) top-k over PQ codes: the
    query stays un-quantized; a driver-side m x K table of squared L2
    distances between each query subvector and each codeword is
    broadcast as a literal, and every corpus vector's approximate
    distance is the sequential sum of its m table lookups — no
    original vectors are read at query time. Returns (id_col,
    adc_dist) ascending, ties to the smaller id.

    Scale shape: the scan reads m small ints per row and does m array
    lookups — this is the memory-bound ANN regime (RAM ~ codes, not
    vectors); compose with the IVF partition pruning
    (`build_ivf_index`) for IVF-PQ, the canonical billion-vector
    layout. The distance table is built with plain left-to-right
    Python float arithmetic so it is bit-identical to an oracle
    recomputing the same lookups in SQL (see `adc_table`)."""
    dist = adc_dist_expr(adc_table(codebooks, query_vec), codes_col)
    if round_to is not None:
        dist = F.round(dist, round_to)
    return (
        codes.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(k)
    )


def pq_codebooks_kmeans(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    sample: int = 4096,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """k-means-trained PQ codebooks (Jegou et al. 2011 §II.C): an
    independent Lloyd run per subspace over the same bounded,
    deterministic, hash-ordered sample `kmeans_centroids` trains the
    coarse quantizer on — the trained/frozen split IVF already uses.
    Init is the first `k` sampled subvectors (hash order), then
    `iters` plain-L2 Lloyd steps in numpy; empty codewords keep their
    previous value. Drops into `pq_encode`/`pq_adc_topk` unchanged
    (same list-of-lists shape as `pq_codebooks_from_corpus`, which
    stays the oracle sibling — numpy's SIMD summation order makes the
    trained codebooks fast but not SQL-replayable bit-for-bit).

    At 100 TB the sample stays `sample` rows regardless of corpus
    size; training is m small driver-side Lloyd runs and the books
    ship to executors as literals, exactly like the coarse centroids.
    """
    rows = (
        df.orderBy(F.xxhash64(F.col(id_col).cast("string")),
                   F.col(id_col))
        .limit(sample)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=float)
    if len(x) < k:
        raise ValueError(f"sample has {len(x)} vectors, need >= {k}")
    dims = x.shape[1]
    if dims % m != 0:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    dsub = dims // m
    books = []
    for s in range(m):
        sub = x[:, s * dsub:(s + 1) * dsub]
        c = sub[:k].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(k):
                members = sub[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
        books.append(c.tolist())
    return books


def assign_cluster_seq(vec: list[float],
                       centroids: list[list[float]]) -> int:
    """Driver-side cluster assignment for ONE vector with plain
    left-to-right float arithmetic — the scalar twin of
    `ivf_assign_expr` (max cosine, ties to the smaller cluster id),
    bit-consistent with the SQL oracle's `array_agg(... ORDER BY cos
    DESC, cid)[1]`. Used where a bounded collected slice needs the
    same assignment the executors compute (e.g. residual anchors).
    Delegates to `rank_probes_seq` so the sequential-cosine
    convention lives in exactly one place (review r10)."""
    return rank_probes_seq(centroids, vec, 1)[0]


def sequential_cluster_anchors(
    df: DataFrame,
    centroids: list[list[float]],
    first_n: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Per-cluster residual anchors for residual PQ (Jegou et al. 2011
    §III quantize x - q1(x)): the RAW-SPACE mean of each cluster's
    members among the `first_n` smallest-id vectors, computed
    driver-side with sequential (ascending-id, left-to-right) float
    arithmetic so the anchors replay bit-for-bit in a SQL oracle
    (`list_sum(array_agg(x ORDER BY id)) / count`). Clusters with no
    member in the prefix anchor at the zero vector (residual = raw).

    Why raw means and not the (spherical, unit-norm) IVF centroids:
    assignment is by cosine but residual energy is L2 — subtracting a
    unit-norm direction from un-normalized vectors barely shrinks
    them, while the cluster's raw mean is the L2-optimal single-point
    anchor (measured on a clustered corpus with trained codebooks:
    E||r||^2 falls ~6x and ADC recall@10 goes 23 -> 35 hits over 10
    queries vs raw-vector PQ; pinned in tests/test_operators.py
    test_pq_residual_recall_beats_raw_on_clustered_corpus). Bounded
    by construction: one `first_n`-row TakeOrderedAndProject collect
    regardless of corpus size. NB the prefix must SAMPLE every
    cluster — on a cluster-ordered corpus a short prefix anchors only
    the leading clusters and the rest fall back to zero anchors
    (residual = raw, no benefit); size first_n accordingly or feed a
    hash-shuffled id order.
    """
    rows = (
        df.orderBy(id_col).limit(first_n)
        .select(F.col(id_col),
                F.col(vec_col).cast("array<double>").alias("_v"))
        .collect()
    )
    if not rows:
        # r10 ADVICE: rows[0] on an empty frame was an opaque
        # IndexError; name the actual problem
        raise ValueError(
            "sequential_cluster_anchors: input DataFrame is empty — "
            "anchors need at least one vector in the id prefix")
    dims = len(rows[0]._v)
    sums = [[0.0] * dims for _ in centroids]
    counts = [0] * len(centroids)
    for r in rows:  # ascending id: .orderBy above
        v = [float(x) for x in r._v]
        c = assign_cluster_seq(v, centroids)
        s = sums[c]
        for i, x in enumerate(v):
            s[i] = s[i] + x
        counts[c] += 1
    return [
        [s_i / counts[c] for s_i in sums[c]] if counts[c] else
        [0.0] * dims
        for c in range(len(centroids))
    ]


def residualize(
    df: DataFrame,
    centroids: list[list[float]],
    anchors: list[list[float]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "expr",
    out_col: str = "residual",
) -> DataFrame:
    """Assign each vector to its coarse cluster and subtract that
    cluster's anchor: the residual-encoding front half of residual
    IVF-PQ (Jegou et al. 2011 §III). Output: input columns + `cluster`
    + `out_col` (array<double>). `anchors` defaults to
    `sequential_cluster_anchors(df, centroids)`.

    The subtraction is a zero-shuffle projection: anchors ride as a
    literal array-of-arrays indexed by the row's cluster
    (element_at + zip_with), so the plan stays scan -> project. The
    literal is n_clusters x dims doubles — fine for the coarse-
    quantizer sizes a driver trains (<= thousands); a million-cluster
    quantizer would broadcast-join a centroid table instead.
    `assign="expr"` (default) keeps the whole path sequential-fold
    reproducible for the SQL oracle; `assign="numpy"` routes the
    cluster assignment through the Arrow-batched matmul."""
    if anchors is None:
        anchors = sequential_cluster_anchors(
            df, centroids, vec_col=vec_col, id_col=id_col)
    assigner = ivf_assign_expr if assign == "expr" else ivf_assign
    assigned = assigner(df, centroids, vec_col, id_col)
    return assigned.withColumn(
        out_col, _anchor_residual_expr(vec_col, anchors))


def _anchor_residual_expr(vec_col: str,
                          anchors: list[list[float]]) -> Column:
    """x - anchor[cluster] as a zero-shuffle projection: anchors ride
    as a literal array-of-arrays indexed by the row's `cluster`
    column. The ONE definition of the residual convention, shared by
    `residualize` and the persisted-index encode path so they cannot
    drift apart (review r10)."""
    anchor_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in a]) for a in anchors
    ])
    return F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.element_at(anchor_lit, F.col("cluster") + 1),
        lambda a, b: a - b,
    )


# ---------------------------------------------------------------------
# persisted IVF index layout: cluster-partitioned parquet
# ---------------------------------------------------------------------

def build_ivf_index(
    df: DataFrame,
    path: str,
    centroids: list[list[float]] | None = None,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "numpy",
    stats: bool = False,
    pq_codebooks: list[list[list[float]]] | None = None,
    pq_anchors: list[list[float]] | None = None,
    keep_vectors: bool = True,
) -> list[list[float]]:
    """Materialize the IVF index as hive-partitioned parquet
    (`path/cluster=K/...`) plus the centroid table
    (`path/_centroids.json`). This is the production layout for ANN
    over a large corpus: a probe reads ONLY the probed clusters'
    directories — Spark's partition pruning turns nprobe/n_clusters
    into a literal fraction of bytes scanned, which is what makes IVF
    an index rather than a filter. Re-assignment after retraining is
    one scan + write. Returns the centroids used.

    stats=True additionally records per-cluster (n, mean cosine
    distance to centroid) in `path/_stats.json` — the baseline
    `ivf_drift`/`ivf_retrain_needed` compare against as appended
    batches age the frozen quantizer. Costs one extra read of the
    just-written index at build time.

    `pq_codebooks` upgrades the layout to IVF-PQ (Jegou et al. 2011,
    the canonical billion-vector layout): every row additionally
    stores its m-byte PQ `codes` column, encoded at build time, and
    the codebooks ride in a `path/_pq.json` sidecar so
    `probe_ivf_pq_index` can ADC-score a probe reading ONLY the
    pruned directories' codes — m small ints per row, never the
    vectors. `pq_anchors` (one raw-space vector per cluster) switches
    to RESIDUAL encoding: codes quantize x - anchor[cluster(x)]
    (§III; see `sequential_cluster_anchors` for why anchors are raw
    cluster means, not the unit-norm centroids), and the sidecar
    records the anchors so probes rebuild the per-cluster query
    tables. `keep_vectors=False` drops the raw vector column — the
    pure codes tier (m bytes/vector instead of 8*dims), for corpora
    where exact re-ranking happens against a separate store.
    Incremental `append_ivf_index` batches are encoded with the
    sidecar's frozen codebooks automatically, same contract as the
    frozen centroids."""
    if centroids is None:
        centroids = kmeans_centroids(
            df, n_clusters, vec_col=vec_col, id_col=id_col)
    assigner = ivf_assign_expr if assign == "expr" else ivf_assign
    assigned = assigner(df, centroids, vec_col, id_col)
    stats_src = assigned  # still carries the vector column
    pq_meta = None
    if pq_anchors is not None and pq_codebooks is None:
        # r10 ADVICE: anchors alone would be silently dropped and the
        # caller would only find out at probe time (FileNotFoundError
        # on _pq.json) — fail at build time instead
        raise ValueError("pq_anchors requires pq_codebooks (residual "
                         "encoding is a PQ layout feature)")
    if pq_codebooks is not None:
        pq_meta = {"m": len(pq_codebooks),
                   "k": len(pq_codebooks[0]),
                   "codebooks": pq_codebooks,
                   "anchors": pq_anchors}
        assigned = _pq_encode_assigned(
            assigned, pq_meta, vec_col, id_col, keep_vectors)
    elif not keep_vectors:
        raise ValueError("keep_vectors=False without pq_codebooks "
                         "would store nothing but ids")
    (assigned.write.mode("overwrite")
     .partitionBy("cluster").parquet(path))
    # centroids ride next to the data (tiny; one driver-side file)
    spark = df.sparkSession
    _write_index_json(spark, path + "/_centroids.json", centroids)
    if pq_meta is not None:
        _write_index_json(spark, path + "/_pq.json", pq_meta)
    if stats:
        # a pure-codes layout (keep_vectors=False) has no vector
        # column to read back — compute the baseline from the
        # pre-encode assignment plan instead (review r10)
        base = _drift_stats(
            spark.read.parquet(path) if keep_vectors else stats_src,
            centroids, vec_col)
        _write_index_json(
            spark, path + "/_stats.json",
            [r.asDict() for r in base.collect()])
    return centroids


def _pq_encode_assigned(
    assigned: DataFrame,
    pq_meta: dict,
    vec_col: str,
    id_col: str,
    keep_vectors: bool = True,
) -> DataFrame:
    """Add the `codes` column to a cluster-assigned batch per an
    IVF-PQ sidecar dict ({codebooks, anchors}): residual-encode
    against the per-cluster anchor when anchors are present, raw
    PQ otherwise. Shared by `build_ivf_index` and the incremental
    append/upsert paths so every file in the layout carries the same
    columns. Pure projection — no shuffle."""
    src_col = vec_col
    if pq_meta.get("anchors") is not None:
        assigned = assigned.withColumn(
            "_pq_res",
            _anchor_residual_expr(vec_col, pq_meta["anchors"]))
        src_col = "_pq_res"
    keep = [c for c in assigned.columns
            if c not in (id_col, "_pq_res")
            and (c != vec_col or keep_vectors)]
    return pq_encode(assigned, pq_meta["codebooks"],
                     vec_col=src_col, id_col=id_col, keep_cols=keep)


def _write_index_json(spark, file_path: str, obj) -> None:
    """Write a small JSON sidecar through the Hadoop FS so the path
    scheme matches the index data (local, hdfs://, s3a://...)."""
    import json

    sc = spark.sparkContext
    jvm = sc._jvm
    p = jvm.org.apache.hadoop.fs.Path(file_path)
    fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()


def _read_index_json(spark, file_path: str):
    import json

    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(file_path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(
            stream))
    finally:
        stream.close()
    return json.loads(raw.decode("utf-8"))


def _read_ivf_centroids(spark, path: str) -> list[list[float]]:
    """Load `_centroids.json` through the Hadoop FS, so any scheme the
    index was written to works."""
    cents = _read_index_json(spark, path + "/_centroids.json")
    if cents is None:
        raise FileNotFoundError(
            f"{path}/_centroids.json not found — not a build_ivf_index "
            "layout")
    return cents


def append_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "numpy",
    upsert: bool = False,
    lock_retries: int = 5,
    lock_backoff: float = 0.5,
) -> None:
    """Incrementally maintain a `build_ivf_index` layout: assign the
    batch with the index's FROZEN centroids (read from
    `_centroids.json`) and add it to the cluster partitions. A 100 TB
    corpus appends continuously; rebuilding the whole index per batch
    is a full-corpus shuffle+write, while this path touches only the
    batch (append) or the batch's clusters (upsert).

    append (default): new ids only — one assignment scan of the batch
    and a partitioned append; existing partitions gain files, nothing
    is read back. Callers must guarantee id uniqueness (append never
    checks — checking would scan the corpus). The append holds the
    same `_upsert.lock` as upsert/compaction for the duration of the
    write (r7): an unlocked append racing a compaction could commit
    files into a cluster dir the compactor is about to swap aside.

    upsert=True: ids may replace existing rows. Affected partitions
    (clusters holding old versions of the batch ids, plus clusters the
    batch assigns into) are rewritten through a staging directory and
    swapped in per-partition: old rows minus batch ids, union the
    assigned batch. Only affected clusters are read or written — cost
    is proportional to the touched partitions, not the corpus. The
    swap is atomic per partition (HDFS rename), not across partitions;
    a transactional multi-partition swap is what `versioned.py` is
    for. The batch id set is broadcast, so upsert batches should be
    bounded (the incremental regime); bulk rewrites should rebuild.

    Writer safety (r6): concurrent upserts are excluded by a
    put-if-absent lock file (`_upsert.lock`, via the same per-scheme
    atomic-create primitive versioned.py commits ride — POSIX link /
    HDFS no-clobber rename / object-store conditional PUT); a second
    maintenance job raises `IvfUpsertLockError` instead of silently
    interleaving renames with the first. The staging directory is
    unique per invocation, and the swap never deletes live data:
    each old partition is renamed ASIDE (into a dot-prefixed dir
    Spark readers ignore) before its replacement is renamed in, so a
    failure at any point leaves every byte recoverable — the error
    message names the aside/stage dirs and the lock is intentionally
    left held until a human (or retry logic) restores or completes
    the swap. Readers can still observe a brief per-partition gap
    between the two renames; a reader-transactional index is what
    `versioned.py` provides.

    Drift: appended vectors are quantized by STALE centroids — monitor
    `ivf_drift` and retrain (full `build_ivf_index`) when the mean
    distance to assigned centroids rises materially over the
    `_stats.json` baseline.

    Lock contention (r8): `lock_retries`/`lock_backoff` bound how
    long this writer waits for `_upsert.lock` before raising
    `IvfUpsertLockError` — linear backoff, `lock_retries` sleeps of
    `lock_backoff * attempt` seconds. The default (5 retries, 0.5 s
    base) rides out a racing append/compaction; `lock_retries=0`
    fails fast for callers that schedule their own retries.
    """
    spark = df.sparkSession
    centroids = _read_ivf_centroids(spark, path)
    assigner = ivf_assign_expr if assign == "expr" else ivf_assign
    assigned = assigner(df, centroids, vec_col, id_col)
    # IVF-PQ layouts (sidecar present) encode every batch with the
    # index's FROZEN codebooks, so appended files carry the same
    # columns as the build — the PQ analog of the frozen-centroid
    # contract (drift applies to codebooks exactly as to centroids:
    # monitor and rebuild).
    pq_meta = _read_index_json(spark, path + "/_pq.json")
    if pq_meta is not None:
        idx_cols = spark.read.parquet(path).columns
        assigned = _pq_encode_assigned(
            assigned, pq_meta, vec_col, id_col,
            keep_vectors=vec_col in idx_cols)
    if not upsert:
        # r7 (ADVICE): the plain append must ALSO hold the writer
        # lock — an unlocked append racing compact_ivf_index can land
        # a file in a live cluster dir after the compactor stages its
        # snapshot; the swap then renames that dir aside and deletes
        # the aside on success, silently losing the appended rows.
        # Appends never move live data, so unlike the torn-swap path
        # the lock is released even on failure (Spark's output
        # committer leaves no committed files behind a failed write).
        from ..storage import HadoopStorage

        store = HadoopStorage(spark)
        lock = f"{path.rstrip('/')}/_upsert.lock"
        payload = json.dumps({"op": "append", "pid": os.getpid(),
                              "acquired_unix": time.time()}).encode()
        _acquire_upsert_lock(
            store, lock, payload, lock_retries, lock_backoff,
            "A plain append may not interleave with an in-flight "
            "upsert/compaction swap. Wait for it to finish (see "
            "append_ivf_index docstring for crash recovery), then "
            "retry.")
        try:
            (assigned.write.mode("append")
             .partitionBy("cluster").parquet(path))
        finally:
            store.delete(lock)
        return
    def plan() -> tuple[list[int], DataFrame]:
        idx = spark.read.parquet(path)
        new_ids = df.select(id_col).distinct()
        old_clusters = {
            int(r[0]) for r in
            idx.join(F.broadcast(new_ids), id_col, "left_semi")
            .select("cluster").distinct().collect()
        }
        new_clusters = {
            int(r[0]) for r in
            assigned.select("cluster").distinct().collect()
        }
        affected = sorted(old_clusters | new_clusters)
        keep = (idx.filter(F.col("cluster").isin(affected))
                .join(F.broadcast(new_ids), id_col, "left_anti"))
        replacement = keep.unionByName(
            assigned.select(*keep.columns))
        return affected, replacement

    _locked_partition_swap(spark, path, plan,
                           lock_retries=lock_retries,
                           lock_backoff=lock_backoff)


def _locked_partition_swap(spark, path: str, plan,
                           lock_retries: int = 5,
                           lock_backoff: float = 0.5) -> None:
    """The writer-safe partition-rewrite protocol shared by
    `append_ivf_index(upsert=True)` and `compact_ivf_index`:
    put-if-absent `_upsert.lock` -> compute the rewrite plan -> stage
    the replacement partitions in a per-invocation uuid directory ->
    per-cluster rename the OLD data ASIDE, rename the replacement in
    -> drop aside/stage/lock only after every rename lands. A
    mid-swap failure raises IvfUpsertTornError naming the recovery
    dirs and HOLDS the lock (the index is torn until a human restores
    or rolls forward).

    `plan` is a zero-arg callable returning (affected clusters,
    replacement DataFrame), or None to abort with nothing to do. It
    runs AFTER the lock is held (r7): the plan reads a snapshot of
    the index, and taking that snapshot before acquiring the lock was
    a cross-process TOCTOU — a second writer could swap partitions
    between the snapshot listing and the staged write, leaving the
    stage job reading renamed-away files (and the loser's rewrite
    built on a stale view even when the files survived). Lock, THEN
    look."""
    from ..storage import HadoopStorage

    store = HadoopStorage(spark)
    base = path.rstrip("/")
    token = uuid.uuid4().hex
    # Exclude concurrent rewriters BEFORE any byte moves: two jobs
    # interleaving per-cluster renames would tear the index.
    lock = f"{base}/_upsert.lock"
    payload = json.dumps({"token": token, "pid": os.getpid(),
                          "acquired_unix": time.time()}).encode()
    _acquire_upsert_lock(
        store, lock, payload, lock_retries, lock_backoff,
        "Wait for it to finish; if the holder crashed before any "
        "swap (no .upsert_aside_* dir under the index), delete the "
        "lock file and retry; if it crashed mid-swap, restore the "
        "aside partitions first.")
    # Unique per-invocation staging dir: even if the lock is ever
    # force-removed wrongly, two writers can't overwrite each other's
    # staged output.
    stage = f"{base}__upsert_stage_{token}"
    aside = f"{base}/.upsert_aside_{token}"  # dot-dir: readers skip it
    try:
        planned = plan()
        if planned is None:  # nothing to rewrite under the lock
            store.delete(lock)
            return
        affected, replacement = planned
        (replacement.write.mode("overwrite")
         .partitionBy("cluster").parquet(stage))
    except BaseException:
        # nothing has touched the live index yet — clean exit
        store.delete_dir(stage)
        store.delete(lock)
        raise
    swapped: list[int] = []
    try:
        store.mkdirs(aside)
        for k in affected:
            dst = f"{base}/cluster={k}"
            src = f"{stage}/cluster={k}"
            # move the OLD partition aside (never delete live data
            # before its replacement is in place — a failure between
            # delete and rename would lose the cluster)
            if store.exists(dst):
                store.rename(dst, f"{aside}/cluster={k}")
            if store.exists(src):  # absent = the rewrite emptied k
                store.rename(src, dst)
            swapped.append(k)
    except BaseException as exc:
        # Leave stage + aside for recovery and HOLD the lock: the
        # index is torn until the asides are restored or the swap is
        # completed, and another upsert must not run over it.
        raise IvfUpsertTornError(
            f"IVF partition rewrite failed mid-swap after clusters "
            f"{swapped} of "
            f"{affected}. NO DATA WAS LOST: pre-swap partitions are "
            f"under {aside}, staged replacements under {stage}. "
            f"Recover by either (a) renaming the aside partitions "
            f"back into {base} (rollback) or (b) renaming the "
            f"remaining staged partitions in (roll forward), then "
            f"delete {lock}.") from exc
    # every rename landed — only now is it safe to drop the old bytes
    store.delete_dir(aside)
    store.delete_dir(stage)
    store.delete(lock)


def compact_ivf_index(
    spark,
    path: str,
    max_files_per_cluster: int = 4,
    lock_retries: int = 5,
    lock_backoff: float = 0.5,
) -> dict:
    """Small-file compaction for an incrementally-maintained IVF
    index: every `append_ivf_index` batch adds at least one parquet
    file to each touched cluster directory, so a continuously-fed
    index accretes files until scans are metadata-bound — the classic
    small-file problem. This rewrites each over-threshold cluster to
    ONE file per cluster through the same writer-safe protocol as
    upsert (`_locked_partition_swap`: put-if-absent lock, uuid stage,
    rename-aside — a concurrent append/upsert/compact is excluded and
    a mid-swap crash loses nothing).

    Cost is proportional to the clusters rewritten, never the corpus:
    the replacement reads ONLY the over-threshold clusters and
    repartitions on `cluster`, so each output cluster dir gets
    exactly one file (all its rows hash to one task). Rounds out the
    index lifecycle: build -> append -> drift/retrain -> compact.

    Returns {"compacted": [cluster ids], "files_before": {k: n},
    "skipped": [cluster ids under threshold]}."""
    from ..storage import HadoopStorage

    store = HadoopStorage(spark)
    base = path.rstrip("/")
    report: dict = {}

    # the file-count census runs UNDER the lock (r7): counting before
    # acquiring it raced a concurrent upsert's rename-aside window
    def plan():
        counts: dict[int, int] = {}
        for d in store.list(base):
            if not d.startswith("cluster="):
                continue
            k = int(d.split("=", 1)[1])
            counts[k] = sum(
                1 for f in store.list(f"{base}/{d}")
                if not f.startswith(("_", ".")))
        todo = sorted(k for k, n in counts.items()
                      if n > max_files_per_cluster)
        report["files_before"] = counts
        report["todo"] = todo
        if not todo:
            return None
        replacement = (spark.read.parquet(base)
                       .filter(F.col("cluster").isin(todo))
                       .repartition(len(todo), "cluster"))
        return todo, replacement

    _locked_partition_swap(spark, path, plan,
                           lock_retries=lock_retries,
                           lock_backoff=lock_backoff)
    counts, todo = report["files_before"], report["todo"]
    if not todo:
        return {"compacted": [], "files_before": counts,
                "skipped": sorted(counts)}
    return {"compacted": todo,
            "files_before": {k: counts[k] for k in todo},
            "skipped": sorted(set(counts) - set(todo))}


def _drift_stats(
    idx: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster (cluster, n, mean_dist): mean cosine DISTANCE
    (1 - cos) of each indexed vector to its assigned centroid. The
    mean uses the exact integer-moment pattern (sum of 1e-8-unit
    rounded distances as int64, divided once), so it is bit-identical
    at any partitioning — and therefore oracle-checkable. Pure
    expression work over a scan: one partial-agg shuffle of
    (cluster, sum, count) triples, no UDF, vectors never move."""
    vec = F.col(vec_col).cast("array<double>")
    cent_arr = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])
    # r12 norm hoist (guide §1.2 step 2, same argument as
    # ivf_assign_expr): the vector norm folds once per row instead of
    # inside cosine(), and the assigned centroid's norm is a
    # driver-side constant (identical left-to-right fold + sqrt)
    # indexed by cluster — bit-identical dist_micro.
    import math as _math

    def _seq_norm(c: list[float]) -> float:
        acc = 0.0
        for x in c:
            acc = acc + float(x) * float(x)
        return _math.sqrt(acc)

    cnorm_arr = F.array(*[F.lit(_seq_norm(c)) for c in centroids])
    # r12 unroll: dot and norm as codegen chains over staged
    # attributes (`_v`, and the assigned centroid row staged as
    # `_cent` so the chain terms index bare attributes — constraint 1
    # in the dot_fast helper header); fold fallback on ragged rows —
    # bit-identical. Safe to unroll here: the only consumer is the
    # per-cluster aggregate, no downstream filter re-derives it.
    dims = len(centroids[0]) if centroids else None
    cos_hoisted = (
        dot_fast("_v", "_cent", dims)
        / (F.col("_n") * F.element_at(cnorm_arr, F.col("cluster") + 1)))
    dist_micro = F.round((1.0 - cos_hoisted) * 1e8).cast("long")
    return (
        idx.select(F.col("cluster").cast("int").alias("cluster"),
                   vec.alias("_v"))
        .select("cluster", "_v",
                F.element_at(cent_arr, F.col("cluster") + 1)
                .alias("_cent"),
                norm_fast("_v", dims).alias("_n"))
        .select("cluster", dist_micro.alias("_dm"))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("_dm").cast("double")
                     / F.count(F.lit(1)) / 1e8, 6).alias("mean_dist"))
    )


def ivf_drift(
    spark,
    path: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Drift report for a persisted IVF index: per-cluster count and
    mean cosine distance to the assigned (frozen) centroid, joined
    against the `_stats.json` baseline captured at build time (columns
    `baseline_n`/`baseline_mean_dist` are NULL when the index was
    built without stats=True or the cluster is new). Appended batches
    are quantized by stale centroids, so a mean-distance rise over
    baseline is THE retrain signal for an incrementally-maintained
    index. One scan of the index, one small-agg shuffle."""
    centroids = _read_ivf_centroids(spark, path)
    cur = _drift_stats(spark.read.parquet(path), centroids, vec_col)
    base = _read_index_json(spark, path + "/_stats.json")
    if base is None:
        return (cur.withColumn("baseline_n",
                               F.lit(None).cast("long"))
                .withColumn("baseline_mean_dist",
                            F.lit(None).cast("double")))
    bdf = spark.createDataFrame(
        [(int(r["cluster"]), int(r["n"]), float(r["mean_dist"]))
         for r in base],
        "cluster int, baseline_n long, baseline_mean_dist double")
    return cur.join(F.broadcast(bdf), "cluster", "left")


def ivf_retrain_needed(
    spark,
    path: str,
    threshold: float = 1.2,
    vec_col: str = "embedding",
) -> bool:
    """True when the corpus-wide mean distance to assigned centroids
    exceeds `threshold` x the build-time baseline — the cheap check a
    maintenance job runs after each append batch. Requires an index
    built with stats=True (raises otherwise: a retrain signal with no
    baseline is a coin flip)."""
    rep = ivf_drift(spark, path, vec_col).collect()
    if any(r.baseline_mean_dist is None for r in rep):
        raise ValueError(
            f"{path} has no complete _stats.json baseline — rebuild "
            "with build_ivf_index(..., stats=True)")
    cur = sum(r.n * r.mean_dist for r in rep) / sum(r.n for r in rep)
    base = (sum(r.baseline_n * r.baseline_mean_dist for r in rep)
            / sum(r.baseline_n for r in rep))
    if base <= 0:
        return cur > 0
    return cur / base > threshold


def probe_ivf_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Query a `build_ivf_index` layout: rank centroids against the
    query driver-side (tiny), then scan ONLY the nprobe winning
    cluster partitions (`cluster IN (...)` prunes directories — the
    plan's PartitionFilters show it) and brute-force within them."""
    centroids = _read_ivf_centroids(spark, path)
    probe = _rank_probes(centroids, query_vec, nprobe)
    cands = (spark.read.parquet(path)
             .filter(F.col("cluster").isin(probe)))
    return cosine_topk(cands, query_vec, k, vec_col, id_col, round_to)


def probe_ivf_pq_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    round_to: int | None = 6,
    rank: str = "numpy",
    refine: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Query an IVF-PQ layout (`build_ivf_index(pq_codebooks=...)`):
    rank centroids against the query driver-side, then ADC-score ONLY
    the nprobe winning clusters' CODES — the probe's scan prunes both
    ways: `cluster IN (...)` prunes directories (PartitionFilters) and
    the projection reads just (id, codes), never the vector column
    (ReadSchema) — m small ints per candidate row, the memory-bound
    billion-vector regime. Returns (id_col, adc_dist) ascending, ties
    to the smaller id.

    Residual layouts (sidecar anchors) get one distance table per
    probed cluster — built from (query - anchor[c]) driver-side — and
    the scan picks its table by the row's partition value through an
    nprobe-way CASE, still a pure projection. `rank="seq"` routes
    probe selection through `rank_probes_seq` (sequential arithmetic,
    the SQL-oracle-reproducible twin); default numpy.

    ``refine=k'`` adds the canonical second stage (Jegou et al. 2011
    §V, "IVFADC+R"): take the ADC top-k' CANDIDATES, semi-join their
    ids back against the SAME probed directories — this second scan
    keeps the `cluster IN (...)` PartitionFilters prune but reads
    (id, `vec_col`) instead of codes — and re-rank by exact squared
    L2 against the unquantized query, returning the top-k as
    (id_col, exact_dist). The candidate set rides as a broadcast
    k'-row semi-join key list, so the refine costs one pruned scan of
    the vector column over nprobe/n_clusters of the corpus plus k'
    exact distances; recall(refined) >= recall(raw ADC) whenever k'
    covers the ADC rank of the true neighbors (pytest-pinned on the
    clustered corpus). Requires a layout built with
    ``keep_vectors=True`` (the default); a pure-codes tier
    (keep_vectors=False) has no vector column to re-rank against."""
    if nprobe < 1:
        # r10 ADVICE: nprobe<1 left the residual CASE unseeded and
        # surfaced as an opaque AttributeError on F.round(None)
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if refine is not None and refine < k:
        raise ValueError(
            f"refine (k'={refine}) must be >= k ({k}) — the re-rank "
            "can only return candidates the ADC stage surfaced")
    centroids = _read_ivf_centroids(spark, path)
    if not centroids:
        raise ValueError(
            f"{path}/_centroids.json is empty — no clusters to probe")
    pq_meta = _read_index_json(spark, path + "/_pq.json")
    if pq_meta is None:
        raise FileNotFoundError(
            f"{path}/_pq.json not found — not an IVF-PQ layout; use "
            "probe_ivf_index for a raw-vector index")
    ranker = rank_probes_seq if rank == "seq" else _rank_probes
    probe = [int(p) for p in ranker(centroids, query_vec, nprobe)]
    books = pq_meta["codebooks"]
    anchors = pq_meta.get("anchors")
    scan = (spark.read.parquet(path)
            .filter(F.col("cluster").isin(probe)))
    if anchors is None:
        dist = adc_dist_expr(adc_table(books, query_vec))
    else:
        # one table per probed cluster, chosen by the row's partition
        # value: CASE WHEN cluster=c0 THEN <fold over table_c0> ...
        dist = None
        for c in probe:
            qres = [float(a) - float(b)
                    for a, b in zip(query_vec, anchors[c])]
            branch = adc_dist_expr(adc_table(books, qres))
            dist = (F.when(F.col("cluster") == c, branch)
                    if dist is None
                    else dist.when(F.col("cluster") == c, branch))
    if round_to is not None:
        dist = F.round(dist, round_to)
    adc = (
        scan.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(refine if refine is not None else k)
    )
    if refine is None:
        return adc
    # second stage: exact re-rank of the ADC candidates. A fresh scan
    # of the same probed directories, reading (id, vec_col) this time
    # — PartitionFilters still prune to the nprobe clusters, and the
    # k'-row candidate list broadcasts into a semi-join so the corpus
    # never shuffles.
    vec_scan = (spark.read.parquet(path)
                .filter(F.col("cluster").isin(probe)))
    if vec_col not in vec_scan.columns:
        raise ValueError(
            f"refine needs the {vec_col!r} column in the layout — "
            "this index was built with keep_vectors=False (pure codes "
            "tier); re-rank against a separate vector store instead")
    cands = vec_scan.join(F.broadcast(adc.select(id_col)), id_col,
                          "left_semi")
    # r12 unroll: same left-to-right (a-b)*(a-b) sum as a codegen
    # chain instead of an interpreted fold — bit-identical; the cast
    # array is staged as a named column so chain terms index a bare
    # attribute
    staged = cands.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_cv"))
    exact = sq_l2_lit("_cv", [float(x) for x in query_vec])
    if round_to is not None:
        exact = F.round(exact, round_to)
    return (
        staged.select(F.col(id_col), exact.alias("exact_dist"))
        .orderBy(F.col("exact_dist").asc(), F.col(id_col))
        .limit(k)
    )


def ann_knn_join(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """Indexed k-NN JOIN over a `build_ivf_index` layout: the batch
    sibling of `probe_ivf_index` that closes the gap `knn_join`'s
    docstring leaves between exact small-batch joins and indexed
    single-query probes. Returns (q_id, vec_id, cosine_sim).

    Per query, the nprobe nearest centroids are picked with
    sequential-order expression arithmetic (array_sort over
    (-cos, cid) structs — reproducible in SQL engines, same recipe as
    `ivf_assign_expr`), each query explodes to nprobe
    (q_id, probe_cluster) rows, and the exploded batch broadcast-joins
    the index on its PARTITION column. The union of probed clusters
    (at most n_clusters values, collected driver-side) is also applied
    as a static `cluster IN (...)` filter so the scan's
    PartitionFilters prune directories up front.

    Scale shape vs `knn_join`: the similarity pair stream shrinks from
    |corpus| x |queries| to ~|queries| x nprobe/n_clusters x |corpus|,
    the corpus still never shuffles (query side broadcast; candidates
    shuffle only (q_id, vec_id, sim) triples into the per-query top-k
    window), and bytes read shrink with the partition pruning."""
    from pyspark.sql.window import Window

    centroids = _read_ivf_centroids(spark, path)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("_q_vec"),
    )
    # r12 unroll: per-centroid cosine with the centroid's dot and
    # norm as codegen chains; the query norm stays one fold per row —
    # replaced below by norm_fast. cosine(q, c) = dot/(norm(q)*norm(c))
    # with norm(c) an interpreted fold over a literal array Catalyst
    # cannot constant-fold; _seq_norm computes the identical
    # left-to-right sum driver-side (same IEEE ops/order).
    import math as _math

    def _seq_norm(c: list[float]) -> float:
        acc = 0.0
        for x in c:
            acc = acc + float(x) * float(x)
        return _math.sqrt(acc)

    dims = len(centroids[0]) if centroids else None
    ranked = F.array_sort(F.array(*[
        F.struct(
            (-(dot_lit("_q_vec", [float(x) for x in c])
               / (norm_fast("_q_vec", dims)
                  * F.lit(_seq_norm(c))))).alias("neg"),
            F.lit(j).cast("int").alias("cid"),
        )
        for j, c in enumerate(centroids)
    ]))
    probes = F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cid"])
    qp = q.withColumn("probe_cluster", F.explode(probes))
    # bounded driver-side collect: the union of probed clusters has at
    # most n_clusters elements regardless of batch size
    probe_set = sorted(
        int(r[0]) for r in qp.select("probe_cluster").distinct().collect())
    # r12 norm hoist (guide §1.2 step 2, same argument as knn_join):
    # cosine(v, qv) folded the corpus-vector norm once per QUERY and
    # the query norm once per CANDIDATE; both are per-row invariants,
    # materialized on their own side of the broadcast join so only
    # the dot fold remains per candidate pair. Same expressions, same
    # multiply/divide order — cosine_sim is bit-identical. The corpus
    # still never shuffles (the norm is a projection in the pruned
    # scan's own stage).
    qp = qp.withColumn("_q_norm", norm_fast("_q_vec", dims))
    idx = (spark.read.parquet(path)
           .filter(F.col("cluster").isin(probe_set))
           .withColumn("_c_vec", F.col(vec_col).cast("array<double>"))
           .withColumn("_c_norm", norm_fast("_c_vec", dims)))
    pairs = idx.join(F.broadcast(qp),
                     idx["cluster"] == qp["probe_cluster"])
    if exclude_self:
        pairs = pairs.filter(F.col(id_col) != F.col("q_id"))
    sim = (dot_fast("_c_vec", "_q_vec", dims)
           / (F.col("_c_norm") * F.col("_q_norm")))
    if round_to is not None:
        sim = F.round(sim, round_to)
    pairs = pairs.select("q_id", F.col(id_col), sim.alias("cosine_sim"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def pq_knn_join(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
    rank: str = "numpy",
    refine: int | None = None,
    exclude_self: bool = True,
    max_queries: int = 4096,
) -> DataFrame:
    """Batch k-NN JOIN over a persisted IVF-PQ layout — the
    memory-bound sibling of `ann_knn_join` (which reads raw vectors)
    and the batch form of `probe_ivf_pq_index` (single query): per
    query, rank the nprobe nearest centroids driver-side, ADC-score
    ONLY the probed directories' CODES (m small ints per candidate,
    the billion-vector regime), and return the per-query top-k.
    Output: (q_id, vec_id, adc_dist) — or (q_id, vec_id, exact_dist)
    when ``refine`` is set. Each query's rows are its top-k by
    ascending distance with ties to the smaller id, but ROW ORDER in
    the returned frame is unspecified (the per-query top-k is a
    window filter, not a global sort — add
    `.orderBy("q_id", "adc_dist")` if presentation order matters;
    `probe_ivf_pq_index`, being single-query, does sort). Query ids
    must be unique (duplicates raise — see below).

    ``refine=k'`` adds the per-query exact re-rank (Jegou et al. 2011
    §V, the batch IVFADC+R): each query's ADC top-k' candidate ids —
    a bounded nq x k' set — broadcast-join the probed directories'
    VECTOR column and re-rank by exact squared L2 against the raw
    query. Requires keep_vectors=True in the layout.

    Scale shape: queries are a BOUNDED batch by contract (collected
    driver-side to precompute probes and per-(query, probed-cluster)
    ADC tables with the sequential `adc_table` arithmetic, exactly
    the x_pq_recall broadcast pattern; ``max_queries`` enforces the
    bound — larger batches should be chunked by the caller). The
    corpus NEVER shuffles: the scan is pruned to the union of probed
    clusters (PartitionFilters), the query side broadcasts (nq x
    nprobe rows, each carrying one m x K double table), and only
    derived (q_id, id, dist) triples shuffle into the per-query
    top-k windows. Residual layouts (sidecar anchors) are handled
    naturally: the per-(query, cluster) table is built from
    (query - anchor[cluster]), so no CASE is needed — each broadcast
    row already carries the right table for its partition.

    `rank="seq"` ranks probes with sequential arithmetic
    (`rank_probes_seq`, the SQL-oracle-reproducible twin); default
    numpy."""
    from pyspark.sql.window import Window

    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if refine is not None and refine < k:
        raise ValueError(
            f"refine (k'={refine}) must be >= k ({k}) — the re-rank "
            "can only return candidates the ADC stage surfaced")
    centroids = _read_ivf_centroids(spark, path)
    if not centroids:
        raise ValueError(
            f"{path}/_centroids.json is empty — no clusters to probe")
    pq_meta = _read_index_json(spark, path + "/_pq.json")
    if pq_meta is None:
        raise FileNotFoundError(
            f"{path}/_pq.json not found — not an IVF-PQ layout; use "
            "ann_knn_join for a raw-vector index")
    books = pq_meta["codebooks"]
    anchors = pq_meta.get("anchors")
    ranker = rank_probes_seq if rank == "seq" else _rank_probes
    qrows = (queries
             .select(F.col(id_col).alias("q_id"),
                     F.col(vec_col).cast("array<double>").alias("_q"))
             .limit(max_queries + 1).collect())
    if len(qrows) > max_queries:
        raise ValueError(
            f"query batch exceeds max_queries={max_queries}; chunk "
            "the batch (the per-query probe/table precompute is "
            "driver-side by design)")
    seen_ids = [int(r.q_id) for r in qrows]
    if len(set(seen_ids)) != len(seen_ids):
        # review r11: a duplicated q_id (e.g. from an upstream join)
        # would score every candidate twice and row_number would
        # count the duplicates — silently returning ~k/2 distinct
        # neighbors for that query
        raise ValueError(
            f"duplicate {id_col!r} values in the query batch "
            f"({len(seen_ids) - len(set(seen_ids))} extra rows) — "
            "k-NN query ids must be unique; .dropDuplicates first")
    qdata, probe_set = [], set()
    for r in qrows:
        qid, qv = int(r.q_id), [float(x) for x in r._q]
        # raw layouts use ONE table per query (cluster-independent);
        # only residual layouts need a per-(query, cluster) build
        raw_tbl = adc_table(books, qv) if anchors is None else None
        for c in (int(p) for p in ranker(centroids, qv, nprobe)):
            probe_set.add(c)
            tbl = (raw_tbl if anchors is None else
                   adc_table(books,
                             [a - b for a, b in zip(qv, anchors[c])]))
            qdata.append((qid, c, tbl))
    qdf = spark.createDataFrame(
        qdata, "q_id long, probe_cluster int, "
               "adc_table array<array<double>>")
    codes = (spark.read.parquet(path)
             .filter(F.col("cluster").isin(sorted(probe_set)))
             .select(F.col(id_col), F.col("cluster"), F.col("codes")))
    scored = codes.join(F.broadcast(qdf),
                        codes["cluster"] == qdf["probe_cluster"])
    # r12 unroll: the m table lookups as a codegen chain (the table
    # here is a broadcast DATA column, indexed per subspace) instead
    # of an interpreted zip_with fold; fold fallback guards rows of
    # unexpected length. Same lookups, same order — bit-identical.
    m_sub = len(books)
    if 0 < m_sub <= _UNROLL_MAX_TERMS:
        chain = _chain_sql([
            f"element_at(`adc_table`[{s}], `codes`[{s}] + 1)"
            for s in range(m_sub)])
        fold = ("aggregate(zip_with(`codes`, `adc_table`, "
                "(c, trow) -> element_at(trow, c + 1)), 0.0D, "
                "(acc, x) -> acc + x)")
        dist = F.expr(
            f"CASE WHEN size(`codes`) = {m_sub} "
            f"AND size(`adc_table`) = {m_sub} "
            f"THEN {chain} ELSE {fold} END")
    else:
        dist = F.aggregate(
            F.zip_with("codes", "adc_table",
                       lambda c, trow: F.element_at(trow, c + 1)),
            F.lit(0.0), lambda acc, x: acc + x)
    if round_to is not None:
        dist = F.round(dist, round_to)
    scored = scored.select("q_id", F.col(id_col),
                           dist.alias("adc_dist"))
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col))
    topn = (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= (refine if refine is not None
                                     else k))
            .drop("_rn"))
    if refine is None:
        return topn
    vec_scan = (spark.read.parquet(path)
                .filter(F.col("cluster").isin(sorted(probe_set))))
    if vec_col not in vec_scan.columns:
        raise ValueError(
            f"refine needs the {vec_col!r} column in the layout — "
            "this index was built with keep_vectors=False (pure codes "
            "tier); re-rank against a separate vector store instead")
    qmeta = spark.createDataFrame(
        [(int(r.q_id), [float(x) for x in r._q]) for r in qrows],
        "q_id long, _qvec array<double>")
    # broadcast the BARE (q_id, id) candidate pairs into the corpus
    # join and attach the query vector afterwards from the nq-row
    # qmeta broadcast — carrying _qvec inside the candidate broadcast
    # would duplicate each dims-length array k' times (review r11:
    # ~105 MB vs ~2 MB at the documented bounds)
    cand = topn.select("q_id", id_col)
    pairs = (vec_scan.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).join(F.broadcast(cand), id_col)
     .join(F.broadcast(qmeta), "q_id"))
    # r12 unroll: exact squared-L2 as a codegen chain (dims known
    # from the collected query batch; fold fallback on ragged rows)
    q_dims = len(qrows[0]._q) if qrows else None
    exact = sq_l2_fast("_cv", "_qvec", q_dims)
    if round_to is not None:
        exact = F.round(exact, round_to)
    we = Window.partitionBy("q_id").orderBy(
        F.col("exact_dist").asc(), F.col(id_col))
    return (
        pairs.select("q_id", F.col(id_col), exact.alias("exact_dist"))
        .withColumn("_rn", F.row_number().over(we))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def pq_knn_join_chunked(
    spark,
    path: str,
    queries: DataFrame,
    chunk_size: int = 1024,
    id_col: str = "vec_id",
    **kwargs,
) -> DataFrame:
    """`pq_knn_join` for batches beyond its bounded-batch contract:
    split the query set into deterministic id-ordered chunks of
    ``chunk_size`` and union the per-chunk joins. Per-query results
    are INDEPENDENT (each query's probes, candidates, and re-rank
    depend only on that query and the index), so chunking is exactly
    result-preserving — pinned against the one-shot join in tests.

    Only the query IDS are collected up front (8 bytes each — fine
    for millions); each chunk then runs the full pq_knn_join plan
    with its own bounded broadcast. The returned DataFrame unions
    one subplan per chunk, so for VERY large batches (thousands of
    chunks) materialize per chunk instead of collecting the union —
    the loop body is the template."""
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if "max_queries" in kwargs:
        # review r11: forwarding it would collide with the per-chunk
        # bound below (TypeError); the chunked driver's bound IS
        # chunk_size
        raise ValueError(
            "pq_knn_join_chunked sets max_queries per chunk; pass "
            "chunk_size instead")
    ids = sorted(
        r[0] for r in queries.select(id_col).distinct().collect())
    if not ids:
        return pq_knn_join(spark, path, queries.limit(0),
                           id_col=id_col, max_queries=chunk_size,
                           **kwargs)
    out = None
    for i in range(0, len(ids), chunk_size):
        chunk = queries.filter(
            F.col(id_col).isin(ids[i:i + chunk_size]))
        res = pq_knn_join(spark, path, chunk, id_col=id_col,
                          max_queries=chunk_size, **kwargs)
        out = res if out is None else out.unionByName(res)
    return out


def build_lsh_index(
    df: DataFrame,
    path: str,
    num_planes: int = 8,
    vec_col: str = "embedding",
    dims: int | None = None,
) -> None:
    """Materialize the sign-LSH index as bucket-partitioned parquet
    (`path/bucket=K/...`). The hyperplanes are md5-derived from
    (plane, dim) alone, so NO side table is needed — any session can
    recompute the same bucket for a query vector. A probe reads only
    the buckets within its Hamming radius: directory pruning turns
    multiprobe/2^planes into the fraction of bytes scanned."""
    if dims is None:
        dims = _infer_dims(df, vec_col)
    vec = F.col(vec_col).cast("array<double>")
    assigned = df.withColumn(
        "bucket", bucket_expr(vec, num_planes, dims))
    (assigned.write.mode("overwrite")
     .partitionBy("bucket").parquet(path))


def probe_lsh_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Query a `build_lsh_index` layout: compute the query's bucket
    driver-side from the deterministic hyperplanes, enumerate the
    buckets within Hamming distance `multiprobe`, scan only those
    partitions (PartitionFilters pruning) and brute-force within."""
    from itertools import combinations

    qbucket = _query_bucket(query_vec, num_planes)
    probe = []
    for r in range(multiprobe + 1):
        for flips in combinations(range(num_planes), r):
            b = qbucket
            for f in flips:
                b ^= 1 << f
            probe.append(b)
    cands = (spark.read.parquet(path)
             .filter(F.col("bucket").isin(probe)))
    return cosine_topk(cands, query_vec, k, vec_col, id_col, round_to)
