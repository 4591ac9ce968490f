"""Stream experiment-tracker run metrics into a served engine.

Analog of the reference repo's `wandb_data_import.py`: iterate runs
from a metrics source, keep the numeric fields of each history row,
and push them through the logging client (Block backpressure, binary
encoding) into per-run tables.

Two sources:

- `--jsonl DIR`: every `<run-name>.jsonl` file is a run; each line a
  {metric: value} dict. Works in any environment.
- `--wandb ENTITY/PROJECT [--regex PAT]`: the reference script's
  actual source, gated behind an import-try (the wandb package is not
  part of this build).

    python scripts/metrics_import.py --jsonl ./runs \
        --url http://localhost:8080 --prefix my_sweep-
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

from locustdb_spark.client import LoggingClient  # noqa: E402


def _clean(row: dict) -> dict:
    # reference wandb_data_import.py:35 — numeric fields only (lists/
    # tuples/bools are not scalar metric values), None -> 0.0
    return {k: (0.0 if v is None else v) for k, v in row.items()
            if v is None or (isinstance(v, (int, float))
                             and not isinstance(v, bool))}


def iter_jsonl_runs(dirpath: str):
    for fname in sorted(os.listdir(dirpath)):
        if not fname.endswith(".jsonl"):
            continue
        name = fname[:-len(".jsonl")]
        with open(os.path.join(dirpath, fname)) as fh:
            yield name, (json.loads(line) for line in fh if line.strip())


def iter_wandb_runs(path: str, regex: str | None):
    try:
        import wandb
    except ImportError as e:  # pragma: no cover — not in build env
        raise SystemExit(
            "the wandb package is not installed in this environment; "
            "use --jsonl, or pip install wandb where allowed") from e
    entity, project = path.split("/", 1)
    api = wandb.Api(timeout=300)
    filters = {"config.name": {"$regex": regex}} if regex else None
    for run in api.runs(f"{entity}/{project}", filters):
        yield run.name, run.history(pandas=False)


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Import run metrics into locustdb_spark")
    parser.add_argument("--jsonl", type=str, default=None,
                        help="directory of <run>.jsonl metric files")
    parser.add_argument("--wandb", type=str, default=None,
                        help="ENTITY/PROJECT to pull from wandb")
    parser.add_argument("--regex", type=str, default=None,
                        help="wandb run-name filter regex")
    parser.add_argument("--url", type=str,
                        default="http://localhost:8080")
    parser.add_argument("--prefix", type=str, default="run-",
                        help="table-name prefix per run")
    args = parser.parse_args()
    if bool(args.jsonl) == bool(args.wandb):
        parser.error("exactly one of --jsonl / --wandb is required")

    runs = (iter_jsonl_runs(args.jsonl) if args.jsonl
            else iter_wandb_runs(args.wandb, args.regex))
    logger = LoggingClient(url=args.url)
    total = 0
    for i, (name, history) in enumerate(runs):
        rows = 0
        for row in history:
            logger.log(table=args.prefix + name, row=_clean(row))
            rows += 1
        total += rows
        print(f"{i} {name}: logged {rows} rows", flush=True)
    logger.close()
    print(f"done — {total} rows")


if __name__ == "__main__":
    main()
