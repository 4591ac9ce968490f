"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is sampled, balanced, and split long before training;
the operators here make those steps reproducible (hash-derived, never
RNG-dependent) and cheap at scale:

- `hash_sample` is a pure filter: each row's fate depends only on the
  md5 of its id, so results are stable across partitioning, retries,
  and engines (DuckDB oracles match exactly), and the filter pushes
  down next to the scan — no shuffle at any scale.
- `stratified_sample` takes exactly n docs per stratum with one
  window (one shuffle on the stratum key). The per-stratum order is
  the portable hash, i.e. a deterministic uniform draw.
- `train_val_test_split` assigns each row a split label from its
  hash bucket — a projection, no shuffle, and adding data later never
  reassigns existing rows (the property that keeps eval sets stable
  as a corpus grows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64

# portable_hash64 yields 60-bit values (15 hex chars of md5)
_HASH_SPACE = 1 << 60


def _id_hash(id_col: str, salt: str) -> Column:
    return portable_hash64(F.concat(F.col(id_col).cast("string"),
                                    F.lit(f"|{salt}")))


def hash_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose 60-bit id hash
    falls below rate * 2^60. Same rows survive on every engine and
    every run; changing `salt` draws an independent sample."""
    thresh = int(rate * _HASH_SPACE)
    return df.filter(_id_hash(id_col, salt) < F.lit(thresh))


def _salted_topk(
    df: DataFrame,
    group_col: str,
    order_struct: Column,
    id_col: str,
    k: int,
    salt_buckets: int,
) -> DataFrame:
    """The k lexicographically-smallest `order_struct` rows per group,
    WITHOUT a window on the group key, and with every aggregation
    cell's in-memory state BOUNDED (top-k is associative, so it can be
    taken over any partitioning of a group and re-taken over the
    partials):

    1. groupBy(group, scan partition id): every cell's rows live in
       exactly one scan partition, so no collect_list buffer ever
       exceeds one partition's rows (~maxPartitionBytes) no matter how
       hot the group is — the r2 shape salted by hash(id) %
       salt_buckets still funneled rows_in_group/salt_buckets structs
       into one reduce-side cell, which for a billion-row group was
       gigabytes. Sliced to k per cell before the next hop.
    2. groupBy(group, pid % salt_buckets): merges <= ceil(P /
       salt_buckets) k-lists per cell (P = scan partitions), so a
       50k-partition scan with k=100 peaks at ~160k structs, not 5M.
    3. groupBy(group): merges the <= salt_buckets k-lists.

    Phases 2-3 carry only k-element arrays; the one full-data shuffle
    (phase 1) matches what the r2 two-phase shape already paid. The
    result is independent of the partition layout (associativity), so
    AQE / retries / different file splits all select the same rows.
    `order_struct` must contain `id_col` as a field named `_id`.
    Returns the selected (group_col, id_col) pairs."""
    def topk(arr: Column) -> Column:
        return F.slice(F.array_sort(arr), 1, k)

    pairs = df.select(F.col(group_col).alias("_g"),
                      order_struct.alias("_p"),
                      F.spark_partition_id().alias("_pid"))
    phase1 = (
        pairs.groupBy("_g", "_pid")
        .agg(topk(F.collect_list("_p")).alias("_ps"))
    )
    phase2 = (
        phase1.groupBy("_g", F.pmod(F.col("_pid"),
                                    F.lit(salt_buckets)).alias("_s"))
        .agg(topk(F.flatten(F.collect_list("_ps"))).alias("_ps"))
    )
    phase3 = (
        phase2.groupBy("_g")
        .agg(topk(F.flatten(F.collect_list("_ps"))).alias("_ps"))
    )
    return phase3.select(
        F.col("_g").alias(group_col),
        F.explode("_ps").alias("_p"),
    ).select(group_col, F.col("_p._id").alias(id_col))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "strata",
    salt_buckets: int = 32,
) -> DataFrame:
    """Exactly n rows per stratum (fewer if the stratum is smaller),
    drawn uniformly by ranking on the id hash; ties broken by id for
    full determinism.

    Skew-safe two-phase shape (r2): the obvious
    row_number-over-Window.partitionBy(stratum) serializes every row
    of a hot stratum — and strata are hot by nature (one language can
    be half a corpus) — through a single reducer that AQE cannot
    split. The salted top-k aggregate (`_salted_topk`) selects the
    identical rows with partial aggregation doing the heavy lifting
    map-side."""
    order = F.struct(_id_hash(id_col, salt).alias("_h"),
                     F.col(id_col).alias("_id"))
    keep = _salted_topk(df, strata_col, order, id_col,
                        n_per_stratum, salt_buckets)
    return df.join(keep, [strata_col, id_col], "left_semi")


def pack_sequences(
    df: DataFrame,
    budget: int,
    size_col: str = "n_chars",
    group_col: str | None = "lang",
    id_col: str = "doc_id",
    salt: str = "pack",
    streams_per_group: int = 1,
) -> DataFrame:
    """Contiguous-stream sequence packing: order documents
    deterministically (by id hash), then assign each to a bin so that
    consecutive documents fill a `budget`-sized window —
    bin_id = floor(running_size_before_doc / budget). This is the
    standard streaming-concat packing used to fill training context
    windows; docs larger than the budget get bins to themselves.

    One shuffle on `group_col` (each group is an independent stream);
    with group_col=None a single global stream means a single-partition
    window — use a grouping column at scale. Contiguity within a
    stream is inherently sequential, so a hot group IS one reducer by
    definition; `streams_per_group > 1` splits each group into that
    many independent hash sub-streams (bin ids stay globally unique
    via bin * streams + stream), trading one long concat stream for
    parallel ones — the packing analog of sharded training files.
    """
    from pyspark.sql.window import Window

    order = [_id_hash(id_col, salt), F.col(id_col)]
    if streams_per_group > 1:
        stream = F.pmod(_id_hash(id_col, salt + ":stream"),
                        F.lit(streams_per_group))
        parts = ([F.col(group_col)] if group_col else []) + [stream]
        w = Window.partitionBy(*parts).orderBy(*order)
        running_before = F.coalesce(
            F.sum(size_col).over(
                w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        return df.select(
            F.col(id_col),
            *([F.col(group_col)] if group_col else []),
            F.col(size_col),
            (F.floor(running_before / F.lit(budget))
             * F.lit(streams_per_group) + stream)
            .cast("long").alias("bin_id"),
        )
    w = (Window.partitionBy(group_col) if group_col
         else Window.partitionBy()).orderBy(*order)
    running_before = F.coalesce(
        F.sum(size_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.select(
        F.col(id_col),
        *([F.col(group_col)] if group_col else []),
        F.col(size_col),
        F.floor(running_before / F.lit(budget)).cast("long").alias("bin_id"),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mixture",
) -> DataFrame:
    """Domain-mixture sampling: keep each row with a per-group rate
    (the upsample/downsample step that hits a target corpus mixture,
    e.g. wiki at 1.0, web at 0.1). Like `hash_sample` this is a pure
    deterministic filter — per-group thresholds fold into one CASE
    expression evaluated next to the scan, so a 100 TB corpus is
    re-weighted with zero shuffles and stable membership across runs.
    Rates are capped at 1.0 (no row duplication)."""
    h = _id_hash(id_col, salt)
    thresh = F.lit(int(min(default_rate, 1.0) * _HASH_SPACE))
    for grp, rate in rates.items():
        thresh = F.when(
            F.col(group_col) == grp,
            F.lit(int(min(rate, 1.0) * _HASH_SPACE)),
        ).otherwise(thresh)
    return df.filter(h < thresh)


def train_val_test_split(
    df: DataFrame,
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column ('train' | 'val' | 'test') derived from the
    id hash. Assignment is per-row and append-stable: rows added later
    never move earlier rows between splits."""
    h = _id_hash(id_col, salt)
    val_t = int(val_frac * _HASH_SPACE)
    test_t = int((val_frac + test_frac) * _HASH_SPACE)
    return df.withColumn(
        "split",
        F.when(h < val_t, F.lit("val"))
        .when(h < test_t, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 4,
    id_col: str = "doc_id",
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic corpus shuffle + sharding — the export step of a
    training pipeline: every example gets a pseudo-random but fully
    reproducible (shard, position) so any engine, any cluster layout,
    and any retry produces byte-identical training shards. Shard is
    the id hash mod n_shards; position is the rank of the hash within
    the shard (ties impossible: distinct ids give distinct 60-bit
    hashes with ~2^-40 collision odds at billions of rows — and a
    collision only swaps two neighbors).

    Scale shape: one shuffle — the rank window partitions by shard, so
    n_shards reducers each sort their own slice; no global sort, no
    driver involvement. For multi-TB shards, split further with
    repartitionByRange on the hash inside each shard before writing.
    """
    from pyspark.sql.window import Window

    h = _id_hash(id_col, salt)
    with_shard = df.select(
        F.col(id_col),
        (h % F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("_h"),
    )
    w = Window.partitionBy("shard").orderBy("_h")
    return (
        with_shard.select(
            F.col(id_col), "shard",
            (F.row_number().over(w) - 1).alias("position"),
        )
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """K-minimum-values distinct-count estimate per group — the
    deterministic, engine-portable sketch (complementing HLL, whose
    register layout differs across engines): estimate = (k-1) * 2^60 /
    h_(k), where h_(k) is the k-th smallest 60-bit md5-derived id
    hash; exact when a group has <= k distinct ids. Same inputs give
    the same answer in any engine with md5, so it sits under the
    DuckDB value-hash oracle — the property HLL cannot offer.

    Scale shape: a distinct on (group, hash) collapses duplicates
    with bounded hash-agg cells (shuffle 1), then the k smallest
    hashes merge through scan-partition-bounded cells exactly like
    `_salted_topk` (no cell holds more than one partition's hashes or
    k * partitions-per-bucket elements). The estimate arithmetic is
    pure double IEEE ops on exactly-converted longs, so it is
    bit-portable."""
    h = _id_hash(id_col, salt)
    d = (df.select(F.col(group_col).alias("_g"), h.alias("_h"))
         .distinct()
         .select("_g", "_h", F.spark_partition_id().alias("_pid")))

    def topk(arr: Column) -> Column:
        return F.slice(F.array_sort(arr), 1, k)

    p1 = d.groupBy("_g", "_pid").agg(
        topk(F.collect_list("_h")).alias("_hs"),
        F.count(F.lit(1)).alias("_n"))
    p2 = p1.groupBy("_g").agg(
        topk(F.flatten(F.collect_list("_hs"))).alias("_hs"),
        F.sum("_n").alias("_n"))
    # F.get is NULL-safe out of bounds (element_at raises under ANSI
    # when a group has fewer than k distinct hashes)
    kth = F.get("_hs", k - 1)
    est = F.when(F.col("_n") <= k, F.col("_n").cast("double")).otherwise(
        F.lit(float((k - 1) * (1 << 60))) / kth.cast("double"))
    return p2.select(
        F.col("_g").alias(group_col),
        F.round(est).cast("long").alias("distinct_est"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    k: int = 100,
    salt_buckets: int = 32,
) -> DataFrame:
    """Keep at most `k` documents per group — the per-domain/per-source
    cap every web-corpus pipeline applies so one crawler-friendly site
    cannot dominate the training mix. Kept rows are the k smallest
    `id_col` values per group (deterministic, replayable).

    Scale shape: top-k per group is usually written as a
    row_number window over `group_col` — which serializes every row of
    a hot domain through one reducer, exactly the skew the operator
    exists to fight. Here it is a salted two-phase aggregate instead:

    1. groupBy(group, hash(id) % salt_buckets) keeps the k smallest
       ids per salt bucket (map-side partial agg collapses hot groups
       before the shuffle);
    2. groupBy(group) merges the <= salt_buckets * k survivors.

    Both phases carry only (group, [<=k ids]) rows; a group with a
    billion documents ships salt_buckets rows to phase 2, not a
    billion. The kept-id table then semi-joins back to the corpus.
    """
    order = F.struct(F.col(id_col).alias("_id"))
    keep = _salted_topk(df, group_col, order, id_col, k, salt_buckets)
    return df.join(keep, [group_col, id_col], "left_semi")
