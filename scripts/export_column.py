"""Export one column of a served table to a text file.

Analog of the reference repo's `export.py`: query a column through
the HTTP client and `np.savetxt` it (NULLs as NaN).

    python scripts/export_column.py cpu --table metrics \
        --url http://localhost:8080 [--out cpu.txt]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from locustdb_spark.client import Client  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(description="Query locustdb_spark")
    parser.add_argument("column_name", type=str,
                        help="column name to export")
    parser.add_argument("--table", type=str, required=True)
    parser.add_argument("--url", type=str,
                        default="http://localhost:8080")
    parser.add_argument("--out", type=str, default=None,
                        help="output path (default: <column>.txt)")
    args = parser.parse_args()

    client = Client(args.url)
    results = client.query(
        f'SELECT "{args.column_name}" FROM "{args.table}"')
    idx = results["colnames"].index(args.column_name)
    values = [row[idx] for row in results["rows"]]

    # same filename sanitization as the reference script
    scolname = args.column_name.replace("[", "_").replace("]", "_")
    out = args.out or (scolname + ".txt")
    with open(out, "w") as fh:
        np.savetxt(fh, [(r if r is not None else np.nan)
                        for r in values])
    print(f"wrote {len(values)} values to {out}")


if __name__ == "__main__":
    main()
