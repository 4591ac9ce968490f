"""Memory-bound stress tests for the skew-prone accumulators.

Round-2 verdict finding: `_salted_topk`'s phase-1 cell held
rows_in_group / salt_buckets structs fully materialized (collect_list
slices only AFTER the aggregate), so one billion-row stratum meant a
multi-GB aggregation buffer; `funnel` had the same shape per hot user.
Both now merge through scan-partition-bounded cells. These tests pin
the bound the only way that can't lie: a subprocess JVM with a small
heap processing one group/user far too large for the OLD single-cell
shape (~5M structs in one collect_list buffer) but fine for the new
partition-bounded one.

Runs in a subprocess so the capped `spark.driver.memory` cannot leak
into (or inherit from) the shared session-scoped fixture.
"""

import subprocess
import sys
import textwrap

import pytest

_DRIVER_MEM = "1200m"


def _run_capped(body: str) -> subprocess.CompletedProcess:
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {sys.path[0]!r})
        sys.path.insert(0, ".")
        from pyspark.sql import SparkSession, functions as F
        spark = (SparkSession.builder.master("local[4]")
                 .config("spark.driver.memory", "{_DRIVER_MEM}")
                 .config("spark.sql.shuffle.partitions", "8")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.adaptive.enabled", "true")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
    """) + textwrap.dedent(body)
    return subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600)


@pytest.mark.slow
def test_salted_topk_hot_stratum_capped_memory():
    """One 16M-row stratum, salt_buckets=4, k=100 on a small heap:
    the r2 shape put 4M structs in one reduce-side collect_list cell
    (hundreds of MB + sort copies -> OOM); the partition-bounded shape
    caps every cell at one scan partition and must both finish and
    return exactly the k smallest ids."""
    proc = _run_capped("""
        from locustdb_spark.operators.sampling import cap_per_group
        n, k = 16_000_000, 100
        df = (spark.range(0, n, 1, 32)
              .select(F.lit("hot").alias("source"),
                      F.col("id").alias("doc_id")))
        out = cap_per_group(df, "source", "doc_id", k=k, salt_buckets=4)
        got = sorted(r.doc_id for r in out.collect())
        assert got == list(range(k)), got[:5]
        print("TOPK_OK", len(got))
    """)
    assert "TOPK_OK 100" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-3000:]}")


@pytest.mark.slow
def test_funnel_hot_user_capped_memory():
    """One user with 8M events of each of two steps on a small heap:
    the unbounded shape collected all 20M timestamps into two lists in
    one cell; the capped shape keeps <= max_events_per_step earliest
    per step per cell and still resolves the funnel exactly (the
    conversion here uses the earliest timestamps, inside the cap)."""
    proc = _run_capped("""
        from locustdb_spark.operators.events import funnel
        n = 8_000_000
        a = (spark.range(0, n, 1, 16)
             .select(F.lit(1).alias("user_id"),
                     F.lit("view").alias("event_type"),
                     (F.col("id") * 2).alias("ts")))
        b = (spark.range(0, n, 1, 16)
             .select(F.lit(1).alias("user_id"),
                     F.lit("buy").alias("event_type"),
                     (F.col("id") * 2 + 1).alias("ts")))
        out = funnel(a.unionAll(b), ["view", "buy"],
                     max_events_per_step=1024)
        rows = {r.event_type: r.users for r in out.collect()}
        assert rows == {"view": 1, "buy": 1}, rows
        print("FUNNEL_OK")
    """)
    assert "FUNNEL_OK" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-3000:]}")
