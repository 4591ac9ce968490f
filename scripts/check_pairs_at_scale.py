"""Aggregate-checksum oracle check for entries whose results are too
large to materialize on the driver (the r8 sf10 sweep finding:
scripts/check_oracle.py funnels every result through `toPandas()`,
and a 353M-row pair set — dedup_lsh_pairs at sf10 — turns the
value-hash harness itself into an hour-plus single-task collect.
That is a harness-scale limit, not an engine one: the right
verification at that size never moves the rows).

Method: both engines compute the SAME order-independent arithmetic
checksums over the full result set inside their own executors —
row count plus two independent weighted sums

    s1 = sum((a * P1 + b * P2 + c * P3) % M1)
    s2 = sum((a * Q1 + b * Q2 + c * Q3) % M2)

with distinct prime multipliers/moduli, all in exact int64/int128
paths (DuckDB HUGEINT sum, Spark decimal(38,0)). Only three numbers
per engine cross the wire. A mismatch in any of count/s1/s2 flags a
divergence; two independent checksums make a silent collision
astronomically unlikely.

Usage:
    python scripts/check_pairs_at_scale.py [sf_dir] [entry ...]
    (defaults: /tmp/testdata_sf10 dedup_lsh_pairs
     dedup_jaccard_estimate)

Prints one JSON line per entry with both engines' triples and the
verdict; exit 1 on any mismatch.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

# (multiplier per column position, modulus) for the two checksums;
# column order is the entry's result schema sorted by name, matching
# check_oracle's convention
_P = ([1_000_003, 999_983, 1_000_033, 1_000_037, 1_000_039],
      2_147_483_647)
_Q = ([2_000_003, 1_999_993, 2_000_029, 2_000_039, 2_000_081],
      2_147_483_629)


def _spark_triple(df) -> tuple[int, int, int]:
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    kinds = dict(df.dtypes)
    num = []
    for c in cols:
        e = F.col(c)
        if kinds[c] in ("double", "float"):
            # exact for power-of-two-denominator ratios; identical
            # floor on bit-identical doubles otherwise (the sf1
            # value-hash pass established cross-engine doubles match)
            e = F.floor(e * 1048576)
        num.append(F.coalesce(e.cast("long"), F.lit(0)))

    def chk(ms, mod):
        e = None
        for c, m in zip(num, ms):
            t = (c * m) if e is None else (e + c * m)
            e = t
        return F.sum((e % mod).cast("decimal(38,0)"))

    row = df.agg(F.count(F.lit(1)).alias("n"),
                 chk(*_P).alias("s1"), chk(*_Q).alias("s2")).collect()[0]
    return int(row.n), int(row.s1 or 0), int(row.s2 or 0)


def _duck_triple(con, sql: str) -> tuple[int, int, int]:
    sub = sql.strip().rstrip(";")
    probe = con.execute(f"SELECT * FROM ({sub}) q LIMIT 0").df()
    cols = sorted(probe.columns)
    floaty = {c for c in cols
              if str(probe.dtypes[c]).startswith("float")}

    def term(c):
        if c in floaty:
            return f"CAST(FLOOR({c} * 1048576) AS BIGINT)"
        return f"COALESCE(CAST({c} AS BIGINT), 0)"

    def chk(ms, mod):
        terms = " + ".join(f"{term(c)} * {m}"
                           for c, m in zip(cols, ms))
        return f"SUM(CAST(({terms}) % {mod} AS HUGEINT))"

    q = (f"SELECT count(*) AS n, {chk(*_P)} AS s1, {chk(*_Q)} AS s2 "
         f"FROM ({sub}) q")
    n, s1, s2 = con.execute(q).fetchone()
    return int(n), int(s1 or 0), int(s2 or 0)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from locustdb_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf10"
    names = sys.argv[2:] or ["dedup_lsh_pairs",
                             "dedup_jaccard_estimate"]
    spark = get_spark(app_name="check-pairs-at-scale")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    bad = 0
    import time
    for name in names:
        t0 = time.perf_counter()
        sp = _spark_triple(qs[name](spark, sf_dir))
        spark_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        du = _duck_triple(con, oracles[name])
        duck_s = time.perf_counter() - t0
        ok = sp == du
        bad += 0 if ok else 1
        print(json.dumps({
            "entry": name, "ok": ok,
            "rows": sp[0], "spark_sec": round(spark_s, 1),
            "duck_sec": round(duck_s, 1),
            "spark": list(sp), "duckdb": list(du),
            "method": "order-independent dual arithmetic checksum, "
                      "computed in-engine (no driver materialization)",
        }))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
