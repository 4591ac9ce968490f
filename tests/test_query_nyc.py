"""Ports of the reference's NYC-taxi golden tests (tests/query_tests.rs,
test_query_nyc harness :106-133). 10k-row gzip'd CSV loaded through the
schema DSL (src/ingest/nyc_taxi_data.rs reduced_nyc_schema). The reference
harness compares only the first len(expected) rows; we do the same."""

import os

import pytest

from conftest import DATA

SCHEMA = (
    "trip_id:i,vendor_id:s,pickup_datetime:i.date,dropoff_datetime:,"
    "store_and_fwd_flag:s,rate_code_id:s,pickup_longitude:,pickup_latitude:,"
    "dropoff_longitude:,dropoff_latitude:,passenger_count:i,"
    "trip_distance:i.1000,fare_amount:,extra:,mta_tax:i.100,tip_amount:,"
    "tolls_amount:,ehail_fee:i.100,improvement_surcharge:i.100,"
    "total_amount:i.100,payment_type:s,trip_type:s,pickup:,dropoff:,"
    "cab_type:s,precipitation:,snow_depth:,snowfall:i.1000,max_temperature:,"
    "min_temperature:,average_wind_speed:,pickup_nyct2010_gid:,"
    "pickup_ctlabel:,pickup_borocode:,pickup_boroname:,pickup_ct2010:,"
    "pickup_boroct2010:,pickup_cdeligibil:s,pickup_ntacode:,"
    "pickup_ntaname:s,pickup_puma:i,dropoff_nyct2010_gid:,dropoff_ctlabel:,"
    "dropoff_borocode:,dropoff_boroname:,dropoff_ct2010:,"
    "dropoff_boroct2010:,dropoff_cdeligibil:,dropoff_ntacode:,"
    "dropoff_ntaname:,dropoff_puma:i"
)


@pytest.fixture(scope="module")
def db_nyc(spark, tmp_path_factory):
    from locustdb_spark import LocustDB

    db = LocustDB(db_path=str(tmp_path_factory.mktemp("nyc")), spark=spark)
    db.load_csv(os.path.join(DATA, "nyc-taxi.csv.gz"), "default", schema=SCHEMA)
    return db


def prefix_rows(db, query, expected):
    actual = db.run_query(query)["rows"]
    assert actual[: len(expected)] == expected


def test_load_count(db_nyc):
    assert db_nyc.run_query("SELECT count(0) FROM default")["rows"] == [(10_000,)]


def test_groupless_aggregate(db_nyc):
    prefix_rows(db_nyc, "SELECT sum(total_amount), count(0) FROM default",
                [(16_197_630, 10_000)])
    prefix_rows(db_nyc,
                "SELECT count(0) FROM default WHERE NOT passenger_count <> 1;",
                [(6016,)])


def test_order_by_aggregate(db_nyc):
    prefix_rows(
        db_nyc,
        "SELECT passenger_count, count(0) FROM default ORDER BY count(0) DESC LIMIT 10;",
        [(1, 6016), (5, 2197), (2, 1103), (3, 383), (6, 222), (4, 76), (0, 3)],
    )


def test_order_by_grouping(db_nyc):
    prefix_rows(
        db_nyc,
        "SELECT passenger_count, count(0) FROM default "
        "ORDER BY passenger_count DESC LIMIT 10;",
        [(6, 222), (5, 2197), (4, 76), (3, 383), (2, 1103), (1, 6016), (0, 3)],
    )


def test_composite_aggregate(db_nyc):
    prefix_rows(
        db_nyc,
        "select passenger_count, count(0)/10, sum(total_amount)/count(0) "
        "from default limit 10;",
        [(0, 0, 1833), (1, 601, 1580), (2, 110, 2073), (3, 38, 1677), (4, 7, 2194)],
    )


def test_count_by_passenger_count_pickup_year_trip_distance(db_nyc):
    prefix_rows(
        db_nyc,
        "select passenger_count, to_year(pickup_datetime), trip_distance / 1000, "
        "count(0) from default limit 10000;",
        [(0, 2013, 0, 2), (0, 2013, 2, 1), (1, 2013, 0, 1965), (1, 2013, 1, 1167),
         (1, 2013, 2, 824)],
    )


def test_min_max(db_nyc):
    prefix_rows(
        db_nyc,
        "SELECT passenger_count, max(total_amount), min(total_amount) FROM default;",
        [(0, 5200, 150), (1, 326_000, 0), (2, 357_050, 0), (3, 52_750, 150),
         (4, 44_550, 200)],
    )


def test_top_n(db_nyc):
    prefix_rows(
        db_nyc,
        "SELECT passenger_count, trip_distance, total_amount FROM default "
        "ORDER BY total_amount DESC LIMIT 100;",
        [(2, 0, 357_050), (1, 0, 326_000), (1, 0, 68_010), (1, 0, 66_858),
         (1, 0, 61_950)],
    )


def test_sparse_filter(db_nyc):
    prefix_rows(
        db_nyc,
        "select trip_id from default where (passenger_count = 5) AND "
        "(vendor_id = 'CMT') AND (total_amount < 500) AND "
        "(store_and_fwd_flag = '1') limit 100;",
        [],
    )


def test_group_by_trip_id(db_nyc):
    prefix_rows(
        db_nyc,
        "SELECT trip_id / 5, sum(total_amount) FROM default;",
        [(0, 10_160), (1, 3694), (2, 1758), (3, 2740), (4, 377_955)],
    )


def test_string_length(db_nyc):
    # length() is byte length (operators/functions.rs:45-50).
    prefix_rows(
        db_nyc,
        "SELECT length(pickup_ntaname), COUNT(0), pickup_ntaname FROM default "
        "ORDER BY length(pickup_ntaname) DESC LIMIT 3;",
        [
            (56, 1, "Todt Hill-Emerson Hill-Heartland Village-Lighthouse Hill"),
            (50, 3, "Mariner's Harbor-Arlington-Port Ivory-Graniteville"),
            (48, 245, "DUMBO-Vinegar Hill-Downtown Brooklyn-Boerum Hill"),
        ],
    )
