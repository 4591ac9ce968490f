"""Deterministically scale the driver's sf0.1 testdata to sf1 for the
10x-the-gate validation sweep (VERDICT r3 task 2): ten id-shifted
replicas of every fact table, referential integrity preserved, the
dimension tables (region/nation) kept as-is. No randomness — replica r
adds r * OFFSET[table] to each key column, with offsets above every
source key, so the result is reproducible bit-for-bit and both engines
in the oracle harness see identical bytes.

The point of sweeping at sf1 is the bug class only visible at scale:
accumulation-order float divergence, integer overflow in moment
aggregates, collect_list caps. Content distributions are inherited
from the driver's generator, with ONE transformation: document text
is word-salted per replica (every word suffixed with the replica
number for replicas >= 1), so replicas are NOT near-dups of each
other and the near-dup pair graph grows 10x linearly instead of
~100x quadratically. Without the salt the sweep itself verified the
100x-deep-clique behavior — the 32M-row dedup_lsh_pairs /
dedup_jaccard_estimate / dedup_simhash_pairs entries all matched
their oracles — but the connected-components oracle (a DuckDB
recursive CTE) needs tens of minutes on a 32M-edge graph, which makes
the unsalted corpus unusable as a routine gate. The salted corpus
keeps every within-replica near-dup clique identical to sf0.1's.

Usage: python scripts/make_sf1.py [src_dir] [dst_dir] [replicas]
       (defaults: /root/testdata/sf0.1 -> /tmp/testdata_sf1 x10;
        replicas=100 scales the same recipe to sf10)

The output is ~170 MB and intentionally NOT committed; this script is
the reproducible recipe, and the committed artifacts are the sweep
results (CORRECTNESS_sf1 + the sf1 bench json).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPLICAS = 10

# per-table key-column shift offsets (chosen above every sf0.1 max key)
SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def scale_table(src: str, dst: str, name: str,
                replicas: int = REPLICAS,
                hot_prefix: str | None = None) -> int:
    """`replicas` scales beyond sf1 (100 -> sf10); `hot_prefix`
    (documents only) prepends the SAME unsalted word sequence to
    every document of every replica — the adversarially hot key for
    the r6 skew stress: with an 8-word prefix, every document's first
    dedup_segments segment is identical (one segment key carrying
    `5000 * replicas` occurrences) and the prefix's word bigrams are
    corpus-frequency LM-join keys."""
    table = pq.read_table(os.path.join(src, f"{name}.parquet"))
    shifts = SHIFTS[name]
    if not shifts:  # dimension table: copy once
        pq.write_table(table, os.path.join(dst, f"{name}.parquet"))
        return table.num_rows
    # Stream replicas straight into the writer (r8): at 100 replicas
    # (sf10) concatenating everything in memory first would hold the
    # whole multi-GB table; per-replica writes keep peak memory at
    # one replica. 64k-row row groups: pyarrow's default writes ONE
    # row group for the whole table, and Spark's scan parallelism is
    # row-group granular — a single-group 500k-row file makes one
    # scan task do all the work (observed as a 14-of-15-idle
    # straggler in the r6 skew runs, masquerading as reducer skew).
    total = 0
    with pq.ParquetWriter(os.path.join(dst, f"{name}.parquet"),
                          table.schema) as writer:
        total = _write_replicas(writer, table, name, shifts, replicas,
                                hot_prefix)
    return total


def _write_replicas(writer, table, name, shifts, replicas,
                    hot_prefix) -> int:
    import pyarrow.compute as pc

    total = 0
    for r in range(replicas):
        t = table
        for col, off in shifts.items():
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(
                r * off, type=t.schema.field(col).type))
            t = t.set_column(idx, t.schema.field(col), shifted)
        if name == "documents" and (r > 0 or hot_prefix):
            idx = t.schema.get_field_index("text")
            salted = pa.array(
                [(f"{hot_prefix} " if hot_prefix else "")
                 + " ".join((f"{w}{r}" if r > 0 else w)
                            for w in (s or "").split())
                 for s in t.column("text").to_pylist()],
                type=t.schema.field("text").type)
            t = t.set_column(idx, t.schema.field("text"), salted)
            nidx = t.schema.get_field_index("n_chars")
            t = t.set_column(
                nidx, t.schema.field("n_chars"),
                pc.cast(pc.utf8_length(t.column("text")),
                        t.schema.field("n_chars").type))
        writer.write_table(t, row_group_size=65536)
        total += t.num_rows
    return total


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else REPLICAS
    os.makedirs(dst, exist_ok=True)
    for name in SHIFTS:
        n = scale_table(src, dst, name, replicas=replicas)
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
