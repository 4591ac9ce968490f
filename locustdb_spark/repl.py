"""Interactive SQL REPL (reference src/bin/repl/main.rs).

Usage:
    python -m locustdb_spark.repl [--db-path DIR] [--load CSV ...]
        [--table-name NAME] [--schema SCHEMA_DSL]

Commands (reference main.rs:255-281 help text):
    :help                       show help
    :tables                     list tables with stats
    :memtree                    memory/storage tree per table
    :load <TABLE> <SCHEMA> <FILES>...   load CSVs (SCHEMA '' infers)
    :explain <QUERY>            show the physical plan
    :x <QUERY>                  full Spark SQL (joins/windows/CTEs)
    :table_stats                per-table stats
    :exit / :quit / ctrl-d      leave
Anything else is executed as a query.
"""

from __future__ import annotations

import argparse
import shlex
import sys
import time

from .engine import LocustDB, QueryError
from .dialect.parser import NotImplementedQueryError


def format_table(colnames: list[str], rows: list[tuple]) -> str:
    """Aligned text table like the reference's print_results
    (src/unit_fmt.rs / repl table output)."""
    def fmt(v) -> str:
        if v is None:
            return ""
        if isinstance(v, float):
            return f"{v:.4g}"
        return str(v)

    cells = [[fmt(v) for v in row] for row in rows]
    widths = [
        max(len(c), *(len(r[i]) for r in cells)) if cells else len(c)
        for i, c in enumerate(colnames)
    ]
    sep = "-+-".join("-" * w for w in widths)
    out = [" | ".join(c.ljust(w) for c, w in zip(colnames, widths)), sep]
    out += [" | ".join(c.ljust(w) for c, w in zip(row, widths))
            for row in cells]
    return "\n".join(out)


def run_command(db: LocustDB, line: str, out=sys.stdout) -> bool:
    """Execute one REPL line; returns False when the session should end."""
    s = line.strip()
    if not s:
        return True
    if s in (":exit", ":quit", "exit", "quit"):
        return False
    try:
        if s == ":help":
            print(__doc__, file=out)
        elif s.startswith(":memtree"):
            print(db.mem_tree(), file=out)
        elif s == ":tables" or s.startswith(":table_stats"):
            for t in db.table_stats():
                print(
                    f"{t['name']}: {t['rows']} rows, "
                    f"{t['batches']} batches, "
                    f"{t['buffer_length']} buffered",
                    file=out,
                )
        elif s.startswith(":load"):
            parts = shlex.split(s)[1:]
            if len(parts) < 3:
                print("Expected :load <TABLE> <SCHEMA> <FILES>...", file=out)
                return True
            table, schema, *files = parts
            for f in files:
                db.load_csv(f, table, schema=schema or None)
            print(f"Loaded {len(files)} file(s) into {table}", file=out)
        elif s.startswith(":explain"):
            print(db.explain(s[len(":explain"):].strip()), file=out)
        elif s.startswith(":x "):
            t0 = time.time()
            df = db.sql_extended(s[3:].strip())
            rows = [tuple(r) for r in df.collect()]
            elapsed = time.time() - t0
            print(format_table(list(df.columns), rows), file=out)
            print(f"\n{len(rows)} rows returned in "
                  f"{elapsed * 1000:.0f}ms", file=out)
        else:
            t0 = time.time()
            result = db.run_query(s)
            elapsed = time.time() - t0
            print(format_table(result["colnames"], result["rows"]), file=out)
            print(
                f"\n{len(result['rows'])} rows returned in "
                f"{elapsed * 1000:.0f}ms",
                file=out,
            )
    except NotImplementedQueryError as e:
        print(f"Not implemented: {e}", file=out)
    except QueryError as e:
        print(f"Query error: {e}", file=out)
    except Exception as e:  # noqa: BLE001
        print(f"Error: {e}", file=out)
    return True


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="LocustDB-on-Spark REPL")
    ap.add_argument("--db-path", default=None)
    ap.add_argument("--load", nargs="*", default=[],
                    help="CSV files to load on startup")
    ap.add_argument("--table-name", default=None,
                    help="table for --load (default: file stem)")
    ap.add_argument("--schema", default=None,
                    help="schema DSL for --load (see sources/csv_loader)")
    args = ap.parse_args(argv)

    db = LocustDB(db_path=args.db_path)
    for path in args.load:
        stem = path.rsplit("/", 1)[-1].split(".")[0]
        table = args.table_name or stem
        db.load_csv(path, table, schema=args.schema)
        print(f"Loaded {path} into table '{table}'")

    print("LocustDB-on-Spark REPL — :help for commands")
    while True:
        try:
            line = input("locustdb> ")
        except (EOFError, KeyboardInterrupt):
            print()
            break
        if not run_command(db, line):
            break


if __name__ == "__main__":
    main()
