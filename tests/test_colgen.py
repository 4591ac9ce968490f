"""Synthetic-generator tests (reference colgen.rs:16-103 semantics:
deterministic per-partition seeding, distributional shapes)."""

import pytest

from pyspark.sql import functions as F

from locustdb_spark.sources import colgen


TRIPS_COLS = [
    ("total_amount", colgen.int_uniform(-1000, 50_000)),
    ("pickup_datetime", colgen.splayed(1_200_000_000, 3)),
    ("trip_id", colgen.incrementing_int()),
    ("passenger_count", colgen.int_weighted(
        [0, 1, 2, 4, 5, 6, 7, 8, 9, 208],
        [4.0, 1000.0, 200.0, 60.0, 30.0, 95.0, 34.0, 1.0, 1.0, 0.001])),
    ("vendor_id", colgen.string_weighted(
        ["1", "2", "3", "CMT", "DDS", "VTS"],
        [195.0, 260.0, 0.006, 493.0, 142.0, 503.0])),
    ("cab_type", colgen.string_markov_chain(
        ["green", "yellow"], [[1.0, 0.0], [0.0, 1.0]])),
    ("uuid", colgen.random_hex_string(8)),
    ("sparse_int", colgen.partition_sparse(0.5, colgen.int_uniform(0, 10))),
]


@pytest.fixture(scope="module")
def trips(spark):
    df = colgen.gen_table_df(spark, TRIPS_COLS, partitions=8,
                             partition_size=1000)
    df.cache().count()
    yield df
    df.unpersist()


def test_row_count_and_schema(trips):
    assert trips.count() == 8000
    assert dict(trips.dtypes) == {
        "total_amount": "bigint", "pickup_datetime": "bigint",
        "trip_id": "bigint", "passenger_count": "bigint",
        "vendor_id": "string", "cab_type": "string", "uuid": "string",
        "sparse_int": "bigint",
    }


def test_deterministic(spark, trips):
    again = colgen.gen_table_df(spark, TRIPS_COLS, partitions=8,
                                partition_size=1000)
    assert trips.exceptAll(again).count() == 0
    assert again.exceptAll(trips).count() == 0


def test_incrementing_is_global_id(trips):
    ids = [r.trip_id for r in trips.select("trip_id").collect()]
    assert sorted(ids) == list(range(8000))


def test_uniform_bounds(trips):
    row = trips.agg(F.min("total_amount").alias("lo"),
                    F.max("total_amount").alias("hi")).head()
    assert row.lo >= -1000 and row.hi < 50_000


def test_splayed_grows_with_partition(trips):
    # splayed(offset, c): partition p in [offset+c*n*p, offset+c*n*(p+1))
    rows = trips.groupBy((F.col("trip_id") / 1000).cast("long").alias("p")) \
        .agg(F.min("pickup_datetime").alias("lo"),
             F.max("pickup_datetime").alias("hi")).collect()
    for r in rows:
        assert r.lo >= 1_200_000_000 + 3 * 1000 * r.p
        assert r.hi < 1_200_000_000 + 3 * 1000 * (r.p + 1)


def test_weighted_distribution(trips):
    counts = dict(trips.groupBy("passenger_count").count().collect())
    # dominant weight 1000/~1425 => passenger_count=1 is the mode
    assert max(counts, key=counts.get) == 1


def test_markov_identity_transition_constant_per_partition(trips):
    # identity transition matrix => each partition sticks to its initial
    # state: exactly one distinct cab_type per partition
    per_part = trips.groupBy((F.col("trip_id") / 1000).cast("long")) \
        .agg(F.countDistinct("cab_type").alias("d")).collect()
    assert all(r.d == 1 for r in per_part)


def test_hex_string_shape(trips):
    import re
    vals = [r.uuid for r in trips.select("uuid").limit(50).collect()]
    assert all(re.fullmatch(r"[0-9a-f]{16}", v) for v in vals)


def test_partition_sparse_all_or_nothing(trips):
    rows = trips.groupBy((F.col("trip_id") / 1000).cast("long").alias("p")) \
        .agg(F.count("sparse_int").alias("present"),
             F.count(F.lit(1)).alias("total")).collect()
    assert all(r.present in (0, r.total) for r in rows)
    assert any(r.present == 0 for r in rows)
    assert any(r.present > 0 for r in rows)


def test_nullable_ints(spark):
    df = colgen.gen_table_df(
        spark, [("v", colgen.nullable_ints([None, 1, 2], [1.0, 1.0, 1.0]))],
        partitions=2, partition_size=500)
    n_null = df.filter(F.col("v").isNull()).count()
    assert 150 < n_null < 550


def test_random_string_lengths(spark):
    df = colgen.gen_table_df(
        spark, [("s", colgen.random_string(3, 9))],
        partitions=2, partition_size=200)
    lens = [r.l for r in df.select(F.length("s").alias("l")).collect()]
    assert min(lens) >= 3 and max(lens) <= 9


@pytest.fixture(scope="module")
def gen_db(spark, tmp_path_factory):
    from locustdb_spark import LocustDB

    return LocustDB(spark=spark, db_path=str(tmp_path_factory.mktemp("gen")))


def test_long_nullable_grouped_count(gen_db):
    """gen_table + grouped count over a mostly-null column (reference
    query_tests.rs test_long_nullable; values differ — our colgen RNG
    is not the reference's — but the structure is the contract)."""
    gen_db.gen_table(
        "t_nullable", partitions=8, partition_size=1 << 12,
        columns=[("nullable_int", colgen.nullable_ints(
            [None, 1, -10], [0.9, 0.05, 0.05]))])
    out = gen_db.run_query(
        "SELECT nullable_int, count(1) FROM t_nullable;")["rows"]
    keys = {r[0] for r in out}
    assert keys <= {None, 1, -10} and None in keys
    assert sum(r[1] for r in out) == 8 * (1 << 12)
    # the null group must dominate at p=0.9
    counts = dict(out)
    assert counts[None] > 0.8 * 8 * (1 << 12)
    assert gen_db.run_query(
        "SELECT nullable_int FROM t_nullable LIMIT 0;")["rows"] == []


def test_column_with_null_partitions_query(gen_db):
    """Half the partitions lack the column entirely (partition_sparse);
    querying it must surface NULL rows, not errors (reference
    query_tests.rs test_column_with_null_partitions)."""
    gen_db.gen_table(
        "t_sparse", partitions=20, partition_size=1,
        columns=[("partition_sparse", colgen.partition_sparse(
            0.5, colgen.string_markov_chain(
                ["A", "B"], [[0.3, 0.7], [0.3, 0.7]])))])
    out = gen_db.run_query(
        "SELECT partition_sparse, count(0) FROM t_sparse;")["rows"]
    keys = {r[0] for r in out}
    assert keys <= {None, "A", "B"}
    assert sum(r[1] for r in out) == 20


def test_sequential_int_sort(gen_db):
    """incrementing_int + IS NOT NULL + ORDER BY returns the sequence
    (reference query_tests.rs test_sequential_int_sort)."""
    gen_db.gen_table(
        "t_seq", partitions=1, partition_size=64,
        columns=[("_step", colgen.incrementing_int())])
    out = gen_db.run_query(
        "SELECT _step FROM t_seq WHERE _step IS NOT NULL ORDER BY _step;"
    )["rows"]
    assert out[:9] == [(i,) for i in range(9)]


def test_group_by_generated_string(gen_db):
    """Grouped count over a generated hex-string column, ordered by
    count (reference query_tests.rs test_group_by_string family via the
    hex_scrambled harness)."""
    gen_db.gen_table(
        "t_hex", partitions=4, partition_size=250,
        columns=[("scrambled", colgen.random_hex_string(2)),
                 ("ints", colgen.int_uniform(-10, 10))])
    top = gen_db.run_query(
        "SELECT scrambled, count(1) FROM t_hex "
        "ORDER BY count(1) DESC LIMIT 5;")["rows"]
    assert len(top) == 5
    cnts = [r[1] for r in top]
    assert cnts == sorted(cnts, reverse=True)
    aliased = gen_db.run_query(
        "SELECT scrambled, count(1) AS c FROM t_hex ORDER BY c DESC LIMIT 5;"
    )["rows"]
    assert aliased == top
    two_key = gen_db.run_query(
        "SELECT ints, scrambled, count(1) FROM t_hex "
        "ORDER BY ints, scrambled LIMIT 5;")["rows"]
    assert all(r[0] == two_key[0][0] for r in two_key[:1])
    dup_key = gen_db.run_query(
        "SELECT scrambled, scrambled, count(1) FROM t_hex;")["rows"]
    assert all(r[0] == r[1] for r in dup_key)
    assert sum(r[2] for r in dup_key) == 1000


def test_group_by_hexstring_string(gen_db):
    """Two-key (hex, scrambled) grouped count ordered by count DESC
    (reference query_tests.rs test_group_by_hexstring_string :1644-1655;
    golden values differ — our colgen RNG is not the reference's)."""
    from locustdb_spark.sources import colgen

    gen_db.gen_table(
        "t_hex2", partitions=3, partition_size=1400,
        columns=[("hex", colgen.random_hex_string(8)),
                 ("scrambled", colgen.random_string(1, 2)),
                 ("ints", colgen.int_uniform(-10, 256))])
    top = gen_db.run_query(
        "SELECT hex, scrambled, count(1) AS c FROM t_hex2 "
        "ORDER BY count(1) DESC LIMIT 5;")["rows"]
    assert len(top) == 5
    cnts = [r[2] for r in top]
    assert cnts == sorted(cnts, reverse=True)
    total = gen_db.run_query(
        "SELECT count(0) FROM t_hex2;")["rows"][0][0]
    assert total == 3 * 1400
