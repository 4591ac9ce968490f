"""Regenerate docs/SHUFFLE_AUDIT.md's table: Exchange nodes in every
queries() entry's physical plan at sf0.001. Run from the repo root:

    python scripts/shuffle_audit.py > /tmp/audit.md

Shuffle count is the scale-limiting property of a distributed plan
(each Exchange moves a stage's full output across the network at
100 TB); the doc's prose explains the expected count per family.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    import __spark_entry__ as entrymod
    from locustdb_spark import get_spark
    from locustdb_spark.plans import explain_formatted, n_exchanges

    spark = get_spark(app_name="shuffle-audit")
    counts: dict[str, int] = {}
    for name, fn in entrymod.queries().items():
        try:
            counts[name] = n_exchanges(explain_formatted(fn(spark, SF_DIR)))
        except Exception as e:  # pragma: no cover
            print(f"| {name} | ERROR {type(e).__name__} |", file=sys.stderr)
    print("| query | exchanges |")
    print("|---|---|")
    for name, n in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])):
        print(f"| {name} | {n} |")


if __name__ == "__main__":
    main()
