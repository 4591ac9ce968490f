"""CSV ingestion with the reference's schema DSL.

Reference: src/ingest/csv_loader.rs:26-200 and src/ingest/schema.rs:14-60.
Schema string format: ``col1:i,col2:s,col3:ns,col4:i.date,col5:i.100`` —
  i  = integer            s  = string
  ni = nullable integer   ns = nullable string
  modifiers: .date (parse date -> unix seconds), .100 / .1000
  (decimal string scaled to integer cents/mills, extractor.rs:5-50).
An empty type drops the column. With no schema, types are inferred
(header assumed), like the reference's type inference.

gzip (.gz) input is supported natively by Spark's CSV reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_schema_dsl(schema: str) -> list[tuple[str, str, str | None]]:
    """-> list of (column, base_type, modifier)."""
    out = []
    for part in schema.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, spec = part.partition(":")
        spec = spec.strip()
        base, _, modifier = spec.partition(".")
        out.append((name.strip(), base, modifier or None))
    return out


def load_csv_df(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    allow_nulls: bool = False,
) -> DataFrame:
    """``allow_nulls`` mirrors LoadOptions::allow_nulls_all_columns: when
    false (the reference default), empty CSV fields ingest as 0 / "" rather
    than NULL (src/ingest/csv_loader.rs extractors)."""
    if schema is None:
        df = spark.read.csv(path, header=True, inferSchema=True)
        if not allow_nulls:
            num_cols = [
                f.name for f in df.schema.fields
                if f.dataType.typeName() in
                ("integer", "long", "double", "float", "short", "byte")
            ]
            str_cols = [f.name for f in df.schema.fields
                        if f.dataType.typeName() == "string"]
            df = df.fillna(0, subset=num_cols).fillna("", subset=str_cols)
        return df

    # With an explicit schema the reference reads headerless CSVs
    # (column names come from the schema string).
    specs = parse_schema_dsl(schema)
    raw = spark.read.csv(path, header=False, inferSchema=False)
    raw_cols = raw.columns
    cols = []
    for i, (name, base, modifier) in enumerate(specs):
        if base == "":
            continue  # dropped column (schema.rs: empty type)
        src = F.col(raw_cols[i]) if i < len(raw_cols) else F.lit(None)
        src = F.when(F.trim(src) == "", None).otherwise(src)
        nullable = base.startswith("n") or allow_nulls
        if modifier == "date":
            # date -> unix seconds (extractor.rs multiplicative date extractor)
            c = F.unix_timestamp(F.to_timestamp(src)).cast("long")
        elif modifier in ("100", "1000"):
            # decimal string scaled to integer; the reference truncates
            # `(float * 100.0) as i64` (extractor.rs:5-27), so cast, not round
            c = (src.cast("double") * int(modifier)).cast("long")
        elif base in ("i", "ni"):
            c = src.cast("long")
        else:
            c = src.cast("string")
        if not nullable:
            c = F.coalesce(c, F.lit("") if base == "s" else F.lit(0))
        cols.append(c.alias(name))
    return raw.select(*cols)
