"""Linear-scaling probe: wall-vs-corpus-size ratios for the flagship
map-only / one-shuffle entries at sf10 vs sf100 (verdict r10 task 4 —
the cheapest direct evidence that the 100 TB design claim holds off
the quadratic paths: a linear operator's wall should grow ~10x when
the corpus grows 10x, not 100x).

Method: each entry's DataFrame is materialized EXECUTOR-SIDE through
the order-independent two-prime checksum triple (count, s1, s2 —
scripts/check_pairs_at_scale.py arithmetic), so the measurement never
funnels rows through the driver and the triple doubles as a value
record a re-run can diff. The sf100 corpus is scripts/make_sf1.py at
replicas=1000 (documents + embeddings only — these entries read only
the documents table; DuckDB cannot oracle 5M-document minhash in
reasonable time, which is why the value spot-check below exists).

Value spot-check (one entry, full value compare at sf100):
dedup_exact's checksum triple is computed INDEPENDENTLY by DuckDB
from the entry's committed oracle SQL over the same parquet — the
dedup_lsh_pairs_collapsed pattern. A match is a full value-level
equality check at 10x the largest swept scale.

Interpretation notes recorded in the artifact: walls include a fixed
per-entry dispatch + plan floor (~2-10 s on local[32]) that deflates
ratios for short sf10 walls; rows_ratio pins that the WORK grew 10x.

Usage: python scripts/scaling_probe.py [sf10_dir] [sf100_dir] [out]
       (defaults: /tmp/testdata_sf10 /tmp/testdata_sf100
        bench_results/SCALING_sf100_r11.json)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

ENTRIES = [
    "dedup_exact",
    "dedup_minhash_arrow",
    "text_decontaminate_bloom_arrow",
    "text_quality_classifier",
]
SPOT_CHECK = "dedup_exact"


def _numify_spark(df):
    """Map string columns to the md5-prefix int64 (the repo's
    hash-portability convention) so the checksum triple sees only
    numerics, and reduce EVERY integer column (56-bit minhash lanes,
    the md5 hash itself) mod a sub-2^31 prime so the triple's
    weighted int64 sums cannot overflow under ANSI mode; floats pass
    through (the triple floors them at 2^20 scale and the entries'
    floats are O(1) logits/fractions)."""
    from pyspark.sql import functions as F

    kinds = dict(df.dtypes)

    def col(c):
        if kinds[c] == "string":
            e = F.conv(F.substring(F.md5(F.col(c)), 1, 15), 16, 10)
        elif kinds[c] in ("bigint", "int", "smallint"):
            e = F.col(c)
        else:
            return F.col(c)
        return (e.cast("long") % 1_000_000_007).alias(c)

    return df.select(*[col(c) for c in df.columns])


def _numify_sql(con, sql: str) -> str:
    """The DuckDB mirror of _numify_spark over an oracle query."""
    sub = sql.strip().rstrip(";")
    probe = con.execute(f"SELECT * FROM ({sub}) q LIMIT 0").df()
    exprs = []
    for c in probe.columns:
        dt = str(probe.dtypes[c])
        if dt == "object":
            exprs.append(f"(('0x' || substr(md5({c}), 1, 15))::BIGINT"
                         f" % 1000000007) AS {c}")
        elif dt.startswith("int"):
            exprs.append(f"(CAST({c} AS BIGINT) % 1000000007) AS {c}")
        else:
            exprs.append(c)
    return f"SELECT {', '.join(exprs)} FROM ({sub}) q"


def main() -> None:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf10"
    sf100 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf100"
    out_path = (sys.argv[3] if len(sys.argv) > 3
                else "bench_results/SCALING_sf100_r11.json")

    import duckdb

    import __spark_entry__ as entrymod
    from check_pairs_at_scale import _duck_triple, _spark_triple
    from locustdb_spark import get_spark

    spark = get_spark(app_name="scaling-probe")
    qs = entrymod.queries()
    report = {
        "sf10_dir": sf10, "sf100_dir": sf100,
        "sf100_source": "scripts/make_sf1.py replicas=1000 "
                        "(documents + embeddings)",
        "generated_by": "scripts/scaling_probe.py",
        "entries": {},
    }
    for name in ENTRIES:
        row = {}
        # sf10 -> sf100 -> sf10 again: the bracketing re-measurement
        # separates JIT/codegen warm-up drift from the scale effect
        # (BENCH_NOTES "warm-up depth" finding — first-pass walls on a
        # fresh JVM can be 2x+ their warmed value); the ratio uses the
        # warmed (min) sf10 wall, and both sf10 walls are recorded.
        for label, d in (("sf10", sf10), ("sf100", sf100),
                         ("sf10_warm", sf10)):
            t0 = time.time()
            triple = _spark_triple(_numify_spark(qs[name](spark, d)))
            wall = round(time.time() - t0, 1)
            row[label] = {"wall_s": wall, "rows": triple[0],
                          "s1": str(triple[1]), "s2": str(triple[2])}
            print(f"{name} @{label}: {wall}s, {triple[0]} rows",
                  flush=True)
        assert row["sf10"]["s1"] == row["sf10_warm"]["s1"], name
        sf10_wall = min(row["sf10"]["wall_s"],
                        row["sf10_warm"]["wall_s"])
        row["wall_ratio"] = round(
            row["sf100"]["wall_s"] / max(sf10_wall, 0.1), 2)
        row["rows_ratio"] = round(
            row["sf100"]["rows"] / max(row["sf10"]["rows"], 1), 2)
        report["entries"][name] = row

    # ---- sf100 value spot-check: DuckDB recomputes the triple from
    # the committed oracle SQL over the same bytes ------------------
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf100}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf100}/embeddings.parquet'")
    t0 = time.time()
    duck = _duck_triple(con, _numify_sql(con, entrymod.oracle_sql()[SPOT_CHECK]))
    duck_wall = round(time.time() - t0, 1)
    got = report["entries"][SPOT_CHECK]["sf100"]
    match = (duck[0] == got["rows"] and str(duck[1]) == got["s1"]
             and str(duck[2]) == got["s2"])
    report["sf100_value_spot_check"] = {
        "entry": SPOT_CHECK,
        "duck": {"rows": duck[0], "s1": str(duck[1]),
                 "s2": str(duck[2]), "wall_s": duck_wall},
        "match": match,
    }
    print(f"spot check {SPOT_CHECK}: match={match}", flush=True)

    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out_path}")
    if not match:
        sys.exit(1)


if __name__ == "__main__":
    main()
