"""The LocustDB-shaped engine API on top of Spark.

Mirrors the public surface of the reference's ``LocustDB`` struct
(src/locustdb.rs:24-213): ``run_query``, ``load_csv``, ``ingest``,
``force_flush``, ``table_stats``, ``search_column_names`` — re-expressed
over SparkSession + Parquet table directories.

Storage model:
- each table is a directory of Parquet files (``<db>/tables/<name>/``);
  every flush appends one file == one "partition" in reference terms
  (src/mem_store/partition.rs).
- an in-memory row buffer per table plays the role of the reference's
  write buffer + WAL (src/mem_store/table.rs:27-30); queries see
  buffered-but-unflushed rows by unioning the buffer onto the Parquet
  scan (snapshot semantics, table.rs:62-102).
- ``_meta_tables`` / ``_meta_columns_<t>`` are queryable, like the
  reference's meta tables (src/scheduler/inner_locustdb.rs:249-299).

Schema evolution: the reference infers per-partition column types and
promotes String > Float > Int at batch time (src/mem_store/raw_col.rs:58-106).
Spark wants one schema per table, so we promote to a table-level superset
type on append and read missing columns as NULL — observably identical.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Iterable

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dialect import ast
from .dialect.compiler import CompiledQuery, compile_query
from .dialect.parser import QueryError, parse
from .session import get_spark
from .sources.csv_loader import load_csv_df

# type-promotion lattice: String > Float > Int (raw_col.rs:58-106)
_RANK = {"null": 0, "int": 1, "float": 2, "str": 3}


def _classify(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.NullType):
        return "null"
    return "str"


_SPARK_TYPE = {"int": T.LongType(), "float": T.DoubleType(), "str": T.StringType(),
               "null": T.LongType()}


class LocustDB:
    """Python analog of the reference's top-level handle (locustdb.rs:24)."""

    def __init__(
        self,
        db_path: str | None = None,
        spark: SparkSession | None = None,
        partition_size: int = 65536,
        partition_combine_factor: int = 4,
    ):
        self.spark = spark or get_spark()
        self.db_path = db_path or os.path.join("/tmp", f"locustdb-{uuid.uuid4().hex}")
        self.tables_dir = os.path.join(self.db_path, "tables")
        os.makedirs(self.tables_dir, exist_ok=True)
        self.partition_size = partition_size
        self.partition_combine_factor = partition_combine_factor
        # name -> list[dict] unflushed rows (write buffer / WAL analog)
        self._buffers: dict[str, list[dict[str, Any]]] = {}
        # name -> path for externally registered parquet tables
        self._external: dict[str, str] = {}
        # name -> DataFrame for registered (possibly cached) views
        self._views: dict[str, DataFrame] = {}
        # name -> VersionedTable, resolved to its LATEST committed
        # version at each snapshot() (live binding, unlike _views)
        self._versioned: dict[str, Any] = {}
        # cumulative operation counters (reference PerfCounter analog)
        self._perf: dict[str, int] = {
            "queries": 0, "rows_returned": 0, "rows_ingested": 0,
            "flushes": 0, "csv_loads": 0,
        }
        # name -> unix-seconds creation time (reference _meta_tables
        # timestamp column, inner_locustdb.rs:270-289)
        self._created: dict[str, int] = {}

    def _record_created(self, name: str) -> None:
        if name not in self._created:
            self._created[name] = int(time.time())

    # ------------------------------------------------------------------
    # table access
    # ------------------------------------------------------------------

    def _table_path(self, name: str) -> str:
        return self._external.get(name, os.path.join(self.tables_dir, name))

    def _has_parquet(self, name: str) -> bool:
        p = self._table_path(name)
        return os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p))

    def table_names(self) -> list[str]:
        names = set(self._external) | set(self._views) | set(self._versioned)
        if os.path.isdir(self.tables_dir):
            names.update(
                d for d in os.listdir(self.tables_dir)
                if os.path.isdir(os.path.join(self.tables_dir, d))
            )
        names.update(self._buffers)
        return sorted(names)

    def register_parquet(self, name: str, path: str) -> None:
        """Expose an existing parquet file/dir as a queryable table."""
        self._external[name] = path
        self._record_created(name)

    def register_df(self, name: str, df: DataFrame) -> None:
        """Expose a DataFrame (e.g. a cached in-memory table) as a
        queryable table — the analog of the reference's fully-resident
        in-memory tables (BASELINE.md benchmark config)."""
        self._views[name] = df
        self._record_created(name)

    def save_bucketed(
        self,
        name: str,
        key: str,
        num_buckets: int = 32,
        df: DataFrame | None = None,
    ) -> DataFrame:
        """Persist a table hash-bucketed (and sorted) on a join/group
        key. Tables bucketed the same way join and aggregate on that
        key WITHOUT a shuffle — at 100 TB this turns the nightly
        fact-to-fact join from a full-network exchange into a local
        merge per bucket. Registers `<name>_by_<key>` as a queryable
        table and returns it.

        The bucket metadata lives in the Spark session catalog; on a
        real cluster you'd back it with a shared metastore so every
        session sees the bucketing (local single-session here).
        """
        df = df if df is not None else self.snapshot(name)
        cat_name = f"{name}_by_{key}"
        path = os.path.join(self.db_path, "bucketed", cat_name)
        self.spark.sql(f"DROP TABLE IF EXISTS {cat_name}")
        (
            df.write.mode("overwrite").format("parquet")
            .bucketBy(num_buckets, key).sortBy(key)
            .option("path", path)
            .saveAsTable(cat_name)
        )
        out = self.spark.table(cat_name)
        self.register_df(cat_name, out)
        return out

    def save_partitioned(
        self,
        name: str,
        partition_cols: list[str],
        df: DataFrame | None = None,
    ) -> DataFrame:
        """Persist a table hive-partitioned on low-cardinality columns
        (date, lang, source, ...). Queries filtering on those columns
        then scan only the matching directories — partition pruning,
        the coarse-grained complement to parquet row-group stats. At
        100 TB `WHERE lang = 'en'` on a lang-partitioned corpus reads
        only the en/ directory instead of the full corpus.

        Registers `<name>_part` as a queryable table and returns it.
        """
        df = df if df is not None else self.snapshot(name)
        cat_name = f"{name}_part"
        path = os.path.join(self.db_path, "partitioned", cat_name)
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
        out = self.spark.read.parquet(path)
        self.register_df(cat_name, out)
        return out

    def save_zordered(
        self,
        name: str,
        cols: list[str],
        df: DataFrame | None = None,
        num_files: int = 16,
        bits: int = 16,
        equi_depth: bool = False,
    ) -> DataFrame:
        """Persist a table clustered on a Z-order (Morton) curve over
        two or more numeric columns. Sorting on one key gives perfect
        file-level min/max skipping on that key and none on any other;
        interleaving the keys' bits makes every file a small hyper-cube
        in (col1, col2, ...) space, so range filters on ANY of the
        curve columns skip most files. At 100 TB with parquet
        row-group/file stats this is the difference between scanning
        the corpus and scanning a thin slab for the 2nd, 3rd filter
        column. Each column is linearly scaled to `bits`-bit space
        using its (min, max) from a single aggregate pass — adequate
        for roughly uniform keys; pass equi_depth=True to rank through
        quantile boundaries instead (skewed keys — see
        functions.build_zorder_key).

        Registers `<name>_zorder` as a queryable table and returns it.
        """
        from .functions import build_zorder_key

        df = df if df is not None else self.snapshot(name)
        morton = build_zorder_key(df, cols, bits=bits,
                                  equi_depth=equi_depth)
        cat_name = f"{name}_zorder"
        path = os.path.join(self.db_path, "zorder", cat_name)
        (
            df.withColumn("_z", morton)
            .repartitionByRange(num_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite").parquet(path)
        )
        out = self.spark.read.parquet(path)
        self.register_df(cat_name, out)
        return out

    def versioned(self, name: str):
        """Manifest-based atomic table (versioned.py): appends commit
        atomically, compaction never breaks concurrent readers, and
        `read(version=k)` time-travels. Use for tables that need the
        reference's consistent-snapshot contract (table.rs:62-102)
        under concurrent maintenance — plain parquet-dir tables race
        with compact()'s directory swap.

        The table is also registered as a LIVE dialect table: every
        `db.sql(...)` over `name` resolves the latest committed
        version at query time (no re-registration after appends)."""
        from .versioned import VersionedTable

        self._record_created(name)
        vt = self._versioned.get(name)
        if vt is None:
            vt = VersionedTable(
                self.spark, os.path.join(self.db_path, "versioned", name))
            self._versioned[name] = vt
        return vt

    def gen_table(
        self,
        name: str,
        partitions: int,
        partition_size: int,
        columns: list,
        cache: bool = True,
    ) -> DataFrame:
        """Create a synthetic table from colgen generators (reference
        locustdb.rs `gen_table` / colgen.rs GenTable). Cached in memory
        by default, like the reference's benchmark tables."""
        from .sources.colgen import gen_table_df

        df = gen_table_df(self.spark, columns, partitions, partition_size)
        if cache:
            df = df.cache()
        self.register_df(name, df)
        return df

    def snapshot(self, name: str) -> DataFrame:
        """Consistent view: flushed partitions + unflushed buffer rows
        (reference table.rs:62-102)."""
        if name == "_meta_tables":
            return self._meta_tables_df()
        if name.startswith("_meta_columns_"):
            return self._meta_columns_df(name[len("_meta_columns_"):])
        parts: list[DataFrame] = []
        if name in self._versioned:
            vt = self._versioned[name]
            if vt.latest_version() is not None:
                # live binding: each query sees the latest commit
                parts.append(vt.read())
        elif name in self._views:
            parts.append(self._views[name])
        elif self._has_parquet(name) or name in self._external:
            # mergeSchema: later partitions may have added columns
            # (schemaless ingest, reference raw_col.rs:58-106).
            parts.append(
                self.spark.read.option("mergeSchema", "true").parquet(
                    self._table_path(name)
                )
            )
        buf = self._buffers.get(name)
        if buf:
            parts.append(self._buffer_df(name, buf))
        if not parts:
            raise QueryError(f"Table `{name}` does not exist.")
        if len(parts) == 1:
            return parts[0]
        return _union_promote(parts)

    # ------------------------------------------------------------------
    # operational surface (reference locustdb.rs:25-211)
    # ------------------------------------------------------------------

    @classmethod
    def memory_only(cls, spark: SparkSession | None = None) -> "LocustDB":
        """Ephemeral instance (reference `memory_only`): tables live in
        a throwaway tmp dir, nothing is meant to survive the process."""
        return cls(spark=spark)

    def recover(self) -> list[str]:
        """Re-attach tables already on disk under db_path (reference
        `recover` replays WAL + meta; parquet dirs ARE our durable
        state, so recovery is just enumeration). Returns table names."""
        return [n for n in self.table_names() if self._has_parquet(n)]

    def perf_counter(self) -> dict[str, Any]:
        """Cumulative counters (reference PerfCounter surface)."""
        return dict(self._perf)

    def evict_cache(self) -> int:
        """Unpersist every cached registered DataFrame; returns how
        many were evicted (reference `evict_cache` -> bytes freed; we
        report evicted tables — Spark tracks bytes internally)."""
        n = 0
        for df in self._views.values():
            if df.is_cached:
                df.unpersist()
                n += 1
        return n

    # ------------------------------------------------------------------
    # querying
    # ------------------------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """Parse LocustDB-dialect SQL and return the (lazy) DataFrame."""
        q = parse(query)
        source = self.snapshot(q.table)
        return compile_query(q, source).df

    def sql_extended(self, query: str) -> DataFrame:
        """Full Spark SQL over this engine's tables (snapshot views,
        buffered rows included). The default `sql()` keeps the
        reference dialect's restrictions and error parity (no JOIN /
        HAVING / DISTINCT, parser.rs:92-105); this is the growth path
        past them — joins, windows, CTEs, set ops, everything Catalyst
        accepts — without leaving the engine's table registry."""
        for name in self.table_names():
            # skip names Spark can't use as bare view identifiers
            if name.replace("_", "").isalnum() and not name[0].isdigit():
                try:
                    snap = self.snapshot(name)
                except QueryError:
                    # e.g. a versioned table registered via versioned()
                    # that has no committed version yet — it has no
                    # snapshot, and must not break queries over OTHER
                    # tables
                    continue
                snap.createOrReplaceTempView(name)
        return self.spark.sql(query)

    def run_query(self, query: str, explain: bool = False) -> dict[str, Any]:
        """Run a query, returning a QueryOutput-shaped dict
        (reference query_task.rs:59-85)."""
        t0 = time.time()
        q = parse(query)
        source = self.snapshot(q.table)
        compiled: CompiledQuery = compile_query(q, source)
        rows = [tuple(r) for r in compiled.df.collect()]
        self._perf["queries"] += 1
        self._perf["rows_returned"] += len(rows)
        out: dict[str, Any] = {
            "colnames": compiled.colnames,
            "rows": rows,
            "stats": {"runtime_s": time.time() - t0, "rows_returned": len(rows)},
        }
        if explain:
            out["query_plans"] = compiled.df._jdf.queryExecution().explainString(
                compiled.df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        return out

    def ast(self, query: str) -> str:
        """Formatted parse tree of a dialect query, or the error text —
        the debug surface of the reference's `ast` (locustdb.rs:149-154)."""
        import pprint

        try:
            return pprint.pformat(parse(query))
        except Exception as err:  # error text, like the reference
            return repr(err)

    def explain(self, query: str) -> str:
        q = parse(query)
        df = compile_query(q, self.snapshot(q.table)).df
        return df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    def search_column_names(self, table: str, pattern: str) -> list[str]:
        """Regex search over a table's column names (locustdb.rs:156-173)."""
        import re

        cols = self.snapshot(table).columns
        rx = re.compile(pattern)
        return sorted(c for c in cols if rx.search(c))

    # ------------------------------------------------------------------
    # ingestion
    # ------------------------------------------------------------------

    def ingest(self, table: str, rows: Iterable[dict[str, Any]]) -> None:
        """Row ingestion API (reference table.rs:162-178). Buffered in
        memory; flushed when the buffer exceeds partition_size rows."""
        buf = self._buffers.setdefault(table, [])
        self._record_created(table)
        n0 = len(buf)
        buf.extend(rows)
        self._perf["rows_ingested"] += len(buf) - n0
        if len(buf) >= self.partition_size:
            self.force_flush(table)

    def restore_reference_dir(self, path: str, include_wal: bool = True,
                              on_pco: str = "error") -> dict[str, int]:
        """Migrate a reference-LocustDB persisted data directory
        (src/disk_store/storage.rs layout: meta + tables/*.part +
        wal/*.wal) into this engine: flushed partition segments are
        decoded through the public codec formats
        (sources/refdir.py) and the unflushed WAL tail is replayed
        (WAL ids >= the meta checkpoint). Returns rows restored per
        table; ``on_pco='null'`` degrades Pco-compressed columns to
        NULL instead of failing the migration."""
        from .sources.refdir import ReferenceDirReader

        reader = ReferenceDirReader(path, on_pco=on_pco)
        counts = reader.restore_into(self, include_wal=include_wal)
        self.force_flush()
        return counts

    def export_reference_dir(self, path: str,
                             tables: list[str] | None = None,
                             rows_per_partition: int = 1 << 20,
                             pco: bool = False) -> None:
        """Write this engine's tables as a reference-format data
        directory (the inverse migration: meta + partition segments
        a reference instance can open). ``pco=False`` (default) keeps
        the output to conformance-proven codecs (lz4/raw) so a real
        reference binary is guaranteed to open it; pass ``pco=True``
        to enable the pco trial once sources/pco.py has been validated
        against crate-produced golden bytes."""
        from .sources.refdir import write_reference_dir

        names = tables if tables is not None else self.table_names()
        # lazy suppliers: one table materializes at a time (peak
        # driver memory = largest table, not the whole database)
        frames = {name: (lambda n=name: self.snapshot(n).toPandas())
                  for name in names}
        write_reference_dir(path, frames,
                            rows_per_partition=rows_per_partition,
                            pco=pco)

    def ingest_wal_segment(self, path: str) -> int:
        """Ingest a reference-LocustDB WAL file (packed-capnp
        WalSegment, src/disk_store/wal_segment.rs:12-35) — point this
        at the files in a real instance's ``wal/`` directory to replay
        its un-flushed writes into Spark tables. Returns the number of
        rows ingested across all tables in the segment."""
        from .sources.event_buffer import WalSegment

        with open(path, "rb") as fh:
            seg = WalSegment.deserialize(fh.read())
        n = 0
        for table, rows in seg.data.to_rows().items():
            if rows:
                self.ingest(table, rows)
                n += len(rows)
        return n

    def load_csv(
        self,
        path: str,
        table: str,
        schema: str | None = None,
        partition_size: int | None = None,
        allow_nulls: bool = False,
    ) -> None:
        """CSV load with the reference's schema DSL
        (src/ingest/csv_loader.rs, schema.rs:14-60)."""
        df = load_csv_df(self.spark, path, schema, allow_nulls)
        self._perf["csv_loads"] += 1
        self._append_df(table, df, partition_size or self.partition_size)

    def load_json(
        self,
        path: str,
        table: str,
        schema: str | None = None,
        partition_size: int | None = None,
    ) -> None:
        """Batch JSON-lines load (the file-based analog of the
        reference's event-buffer ingestion, inner_locustdb.rs:236-329:
        one JSON object per line, schema inferred unless given).
        Completes the source matrix: CSV, parquet registration, rows,
        JSON files, and streaming JSON all land in the same
        append/flush path."""
        reader = self.spark.read
        if schema:
            reader = reader.schema(schema)
        df = reader.json(path)
        self._perf["json_loads"] = self._perf.get("json_loads", 0) + 1
        self._append_df(table, df, partition_size or self.partition_size)

    def ingest_df(self, table: str, df: DataFrame) -> None:
        self._append_df(table, df, self.partition_size)

    def force_flush(self, table: str | None = None) -> None:
        """Flush write buffers to Parquet partitions (WAL flush analog,
        inner_locustdb.rs:334-430)."""
        names = [table] if table else list(self._buffers)
        for name in names:
            buf = self._buffers.pop(name, None)
            if not buf:
                continue
            self._append_df(name, self._buffer_df(name, buf), self.partition_size)
            self._perf["flushes"] += 1

    def _buffer_df(self, name: str, buf: list[dict[str, Any]]) -> DataFrame:
        # Infer a buffer-level schema with String > Float > Int promotion
        # (MixedCol finalize, raw_col.rs:58-106).
        kinds: dict[str, str] = {}
        for row in buf:
            for k, v in row.items():
                kind = (
                    "null" if v is None
                    else "int" if isinstance(v, bool) or isinstance(v, int)
                    else "float" if isinstance(v, float)
                    else "str"
                )
                if _RANK[kind] > _RANK.get(kinds.get(k, "null"), 0):
                    kinds[k] = kind
        fields = [T.StructField(k, _SPARK_TYPE[kinds.get(k, "null")], True)
                  for k in sorted(kinds)]
        schema = T.StructType(fields)

        def coerce(row: dict[str, Any]) -> Row:
            vals = []
            for f in fields:
                v = row.get(f.name)
                if v is not None:
                    kind = kinds[f.name]
                    v = str(v) if kind == "str" else (
                        float(v) if kind == "float" else int(v)
                    )
                vals.append(v)
            return tuple(vals)

        return self.spark.createDataFrame([coerce(r) for r in buf], schema)

    def _append_df(self, table: str, df: DataFrame, partition_size: int) -> None:
        self._record_created(table)
        path = os.path.join(self.tables_dir, table)
        if self._has_parquet(table):
            existing_head = self.spark.read.option("mergeSchema", "true").parquet(
                path
            ).limit(0)
            etypes = {f.name: f.dataType for f in existing_head.schema.fields}
            # If an incoming column's kind conflicts with the stored kind,
            # promote (String > Float > Int) and rewrite the stored
            # partitions once — Parquet mergeSchema cannot merge long/double.
            conflicts = {
                f.name: _promote(etypes[f.name], f.dataType)
                for f in df.schema.fields
                if f.name in etypes and not _same_kind(etypes[f.name], f.dataType)
            }
            if conflicts:
                old = self.spark.read.option("mergeSchema", "true").parquet(path)
                old = old.select(
                    *[
                        F.col(c).cast(conflicts[c]).alias(c) if c in conflicts
                        else F.col(c)
                        for c in old.columns
                    ]
                )
                tmp = path + ".promote"
                old.write.mode("overwrite").parquet(tmp)
                import shutil

                shutil.rmtree(path)
                os.rename(tmp, path)
                etypes = {c: conflicts.get(c, etypes[c]) for c in etypes}
            df = df.select(
                *[
                    F.col(f.name).cast(etypes[f.name]).alias(f.name)
                    if f.name in etypes and not _same_kind(etypes[f.name], f.dataType)
                    else F.col(f.name)
                    for f in df.schema.fields
                ]
            )
        df.write.mode("append").parquet(path)

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------

    def compact(self, table: str, target_file_mb: int = 128) -> None:
        """Small-partition compaction (reference table.rs:248-298 policy:
        combine partitions when each < combined/4). Rewrites the table
        directory with right-sized files."""
        path = os.path.join(self.tables_dir, table)
        if not self._has_parquet(table):
            return
        df = self.spark.read.parquet(path)
        total_bytes = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path) if f.endswith(".parquet")
        )
        n = max(1, total_bytes // (target_file_mb * 1024 * 1024))
        tmp = path + ".compact"
        df.repartition(int(n)).write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(path)
        os.rename(tmp, path)

    def table_stats(self) -> list[dict[str, Any]]:
        """Reference TableStats shape (table.rs / server /tables):
        rows, batches (= parquet files), batches_bytes, buffer_length,
        buffer_bytes. Row counts come from parquet footers (no scan)."""
        import pyarrow.parquet as pq

        out = []
        for name in self.table_names():
            path = self._table_path(name)
            size = 0
            files = 0
            rows = 0
            candidates = []
            if os.path.isfile(path):
                candidates = [path]
            elif os.path.isdir(path):
                candidates = [os.path.join(path, f)
                              for f in os.listdir(path)
                              if f.endswith(".parquet")]
            for f in candidates:
                files += 1
                size += os.path.getsize(f)
                try:
                    rows += pq.ParquetFile(f).metadata.num_rows
                except Exception:  # noqa: BLE001 — non-parquet stray file
                    pass
            buf = self._buffers.get(name, [])
            buffer_bytes = sum(
                len(str(k)) + len(str(v)) + 16
                for r in buf for k, v in r.items()
            )
            out.append({
                "name": name,
                "rows": rows + len(buf),
                "batches": files,
                "batches_bytes": size,
                "buffer_length": len(buf),
                "buffer_bytes": buffer_bytes,
                # back-compat aliases
                "parquet_files": files,
                "size_on_disk_bytes": size,
                "buffered_rows": len(buf),
            })
        return out

    def mem_tree(self, depth: int = 2) -> str:
        """Human-readable memory/storage tree (reference
        locustdb.rs `mem_tree` / mem_store/tree.rs): per-table disk
        bytes, cached-view storage, buffer sizes; depth 2 adds
        per-column types."""
        lines = ["locustdb"]
        for t in self.table_stats():
            name = t["name"]
            lines.append(
                f"  {name} rows={t['rows']} disk={t['batches_bytes']}B "
                f"buffer={t['buffer_bytes']}B"
                + (" [cached-view]" if name in self._views else "")
            )
            if depth >= 2:
                try:
                    for f in self.snapshot(name).schema.fields:
                        lines.append(
                            f"    {f.name}: {f.dataType.simpleString()}"
                        )
                except QueryError:
                    pass
        return "\n".join(lines)

    # ------------------------------------------------------------------
    # meta tables (inner_locustdb.rs:249-299)
    # ------------------------------------------------------------------

    def _meta_tables_df(self) -> DataFrame:
        """Reference schema: (name: str, timestamp: i64 unix seconds of
        creation) — inner_locustdb.rs:270-289. Each user table also gets a
        `_meta_columns_<t>` registry row, as in the reference (:252-255)."""
        rows = []
        for n in self.table_names():
            if n.startswith("_meta"):
                continue
            ts = self._created.get(n)
            if ts is None:
                # table discovered on disk (recover path): use dir mtime
                p = self._table_path(n)
                ts = int(os.path.getmtime(p)) if os.path.exists(p) else None
            rows.append((n, ts))
            rows.append((f"_meta_columns_{n}", ts))
        return self.spark.createDataFrame(
            rows,
            T.StructType([
                T.StructField("name", T.StringType()),
                T.StructField("timestamp", T.LongType()),
            ]),
        )

    def _meta_columns_df(self, table: str) -> DataFrame:
        """Reference schema: single `column_name` string column
        (inner_locustdb.rs:290-298); drives SELECT * expansion."""
        cols = self.snapshot(table).columns
        return self.spark.createDataFrame(
            [(c,) for c in sorted(cols)],
            T.StructType([T.StructField("column_name", T.StringType())]),
        )


# ---------------------------------------------------------------------------
# schema promotion helpers
# ---------------------------------------------------------------------------


def _promote(a: T.DataType, b: T.DataType) -> T.DataType:
    ka, kb = _classify(a), _classify(b)
    k = ka if _RANK[ka] >= _RANK[kb] else kb
    return _SPARK_TYPE[k]


def _same_kind(a: T.DataType, b: T.DataType) -> bool:
    return _classify(a) == _classify(b)


def _union_promote(parts: list[DataFrame]) -> DataFrame:
    """unionByName with missing columns allowed + String>Float>Int
    promotion across differing schemas."""
    # Compute the promoted superset schema.
    target: dict[str, T.DataType] = {}
    order: list[str] = []
    for df in parts:
        for f in df.schema.fields:
            if f.name not in target:
                target[f.name] = f.dataType
                order.append(f.name)
            elif not _same_kind(target[f.name], f.dataType):
                target[f.name] = _promote(target[f.name], f.dataType)
    aligned = []
    for df in parts:
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for name in order:
            if name in have:
                c = F.col(name)
                if not _same_kind(have[name], target[name]) or isinstance(
                    have[name], T.NullType
                ):
                    c = c.cast(target[name])
                cols.append(c.alias(name))
            else:
                cols.append(F.lit(None).cast(target[name]).alias(name))
        aligned.append(df.select(*cols))
    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out
