"""Incremental rollup maintenance (operators/rollup.py): the persisted
aggregate must equal a full recompute after every append, while each
maintenance round reads only the newly-appended files (the property
that makes it O(append) instead of O(corpus) at 100 TB)."""

import os

import pytest
from pyspark.sql import functions as F

from locustdb_spark.engine import LocustDB
from locustdb_spark.operators.rollup import IncrementalRollup


@pytest.fixture()
def db(spark, tmp_path):
    return LocustDB(spark=spark, db_path=str(tmp_path / "db"))


def _make(spark, db, tmp_path):
    return IncrementalRollup(
        spark,
        fact_dir=os.path.join(db.tables_dir, "fact"),
        rollup_dir=str(tmp_path / "rollup"),
        keys=["k"],
        aggs={
            "total": ("sum", "v"),
            "cnt": ("count", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
        },
    )


def _full(db):
    return sorted(
        map(tuple, db.snapshot("fact").groupBy("k").agg(
            F.sum("v").alias("total"), F.count("v").alias("cnt"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        ).collect()))


def _rolled(r):
    return sorted(map(tuple, r.read().select("k", "total", "cnt", "lo", "hi")
                      .collect()))


def test_matches_full_recompute_across_appends(spark, db, tmp_path):
    r = _make(spark, db, tmp_path)
    for batch in range(3):
        rows = [{"k": f"g{i % 4}", "v": batch * 10 + i} for i in range(16)]
        db.ingest("fact", rows)
        db.force_flush()
        stats = r.maintain()
        assert stats["refreshed"]
        assert _rolled(r) == _full(db)
    # no new data -> no-op, result unchanged
    before = _rolled(r)
    stats = r.maintain()
    assert stats["new_files"] == 0 and not stats["refreshed"]
    assert _rolled(r) == before


def test_each_round_reads_only_new_files(spark, db, tmp_path):
    r = _make(spark, db, tmp_path)
    db.ingest("fact", [{"k": "a", "v": 1}])
    db.force_flush()
    assert r.maintain()["new_files"] >= 1
    first_round_files = set(r._processed())

    db.ingest("fact", [{"k": "a", "v": 2}, {"k": "b", "v": 3}])
    db.force_flush()
    stats = r.maintain()
    # the second round's new-file count excludes everything already folded
    assert stats["new_files"] == len(set(r._processed()) - first_round_files)
    assert _rolled(r) == _full(db)


def test_crash_safe_swap_keeps_previous_generation(spark, db, tmp_path):
    r = _make(spark, db, tmp_path)
    db.ingest("fact", [{"k": "a", "v": 5}])
    db.force_flush()
    r.maintain()
    good = _rolled(r)

    # simulate a crashed round: a half-written generation dir with no
    # CURRENT flip — read() must still serve the previous generation,
    # and the next maintain() must still converge
    stray = os.path.join(str(tmp_path / "rollup"), "gen-deadbeef")
    os.makedirs(stray, exist_ok=True)
    assert _rolled(r) == good

    db.ingest("fact", [{"k": "b", "v": 7}])
    db.force_flush()
    r.maintain()
    assert _rolled(r) == _full(db)


def test_unmergeable_aggregate_rejected(spark, db, tmp_path):
    with pytest.raises(ValueError, match="not mergeable"):
        IncrementalRollup(spark, "f", "r", ["k"], {"a": ("avg", "v")})


def test_avg_derivable_from_partials(spark, db, tmp_path):
    r = _make(spark, db, tmp_path)
    db.ingest("fact", [{"k": "a", "v": 1}, {"k": "a", "v": 2},
                       {"k": "b", "v": 10}])
    db.force_flush()
    r.maintain()
    avgs = {row.k: row.avg for row in r.read().select(
        "k", (F.col("total") / F.col("cnt")).alias("avg")).collect()}
    assert avgs == {"a": 1.5, "b": 10.0}
