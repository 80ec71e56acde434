"""Sources & sinks beyond the parquet scan.

The reference's connector surface is "anything SQLAlchemy can reach"
(reference db.py:12-19, SURVEY.md §2.1); ours is "anything Spark can
read" — strictly wider.  This module adds the file formats, the write
side, and bucketed tables.

Bucketing is the flagship 100 TB feature here: two tables bucketed by
the same key into the same bucket count join WITHOUT a shuffle on
either side (SortMergeJoin over pre-bucketed scans — no Exchange in
the physical plan, verified in tests/test_sources.py).  At 100 TB the
shuffle is usually THE cost of a large join; bucketing pays it once at
write time and amortizes it over every subsequent join/aggregation on
that key.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)

from ..session import get_session


def read_csv(path, header: bool = True, sep: str = ",",
             schema: str | None = None, columns=None, index=None):
    """CSV scan as an engine DataFrame.  Pass an explicit ``schema``
    ("a long, b string, ...") at scale — schema inference reads the
    data twice."""
    from ..core import DataFrame
    spark = get_session()
    reader = spark.read.option("header", header).option("sep", sep)
    sdf = (reader.schema(schema).csv(path) if schema is not None
           else reader.option("inferSchema", "true").csv(path))
    return DataFrame._from_spark_scan(sdf, columns=columns, index=index)


def read_json(path, schema: str | None = None, columns=None, index=None):
    """JSON-lines scan.  Explicit ``schema`` skips the inference pass."""
    from ..core import DataFrame
    spark = get_session()
    reader = spark.read
    sdf = (reader.schema(schema).json(path) if schema is not None
           else reader.json(path))
    return DataFrame._from_spark_scan(sdf, columns=columns, index=index)


def read_text(path, wholetext: bool = False, line_col: str = "text",
              columns=None, index=None):
    """Raw text scan — one row per LINE (or per FILE with
    ``wholetext=True``), the standard first step for an un-structured
    training corpus (plain .txt shards; for .jsonl use
    :func:`read_json`).  The single string column is named
    ``line_col`` so the text operators' default ``text_col="text"``
    works unmodified.  ``wholetext=True`` materializes each file as
    one value — fine for many small documents, NOT for multi-GB
    files (one row must fit in executor memory; shard large corpora
    at write time)."""
    from ..core import DataFrame
    spark = get_session()
    # NB: the reader KWARG, not .option("wholetext", ...) — the text
    # source ignores the option form (verified on pyspark 4.x)
    sdf = (spark.read.text(path, wholetext=wholetext)
           .withColumnRenamed("value", line_col))
    return DataFrame._from_spark_scan(sdf, columns=columns, index=index)


def read_orc(path, columns=None, index=None):
    from ..core import DataFrame
    spark = get_session()
    return DataFrame._from_spark_scan(spark.read.orc(path),
                                      columns=columns, index=index)


def to_parquet(df, path, mode: str = "overwrite",
               partition_by=None, sort_by=None,
               max_records_per_file: int | None = None) -> None:
    """Write the frame as parquet.  ``partition_by`` produces
    hive-style directory partitioning — the scan-side partition-pruning
    handle for time/tenant-sliced 100 TB layouts.

    ``sort_by`` clusters rows WITHIN each output task
    (``sortWithinPartitions`` — no extra shuffle), which narrows the
    parquet row-group min/max statistics on those columns so later
    filtered scans skip whole row groups (data skipping — verified
    against the written footer stats in tests/test_sources.py).

    ``max_records_per_file`` caps output file size — the operational
    knob that keeps a skewed write task from emitting one multi-GB
    file (downstream scan parallelism is bounded by file splits)."""
    sdf = df.to_spark(index=df._n_idx() > 0 and not df._mid_index)
    if sort_by:
        cols = sort_by if isinstance(sort_by, list) else [sort_by]
        sdf = sdf.sortWithinPartitions(*cols)
    writer = sdf.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile",
                               int(max_records_per_file))
    if partition_by:
        cols = (partition_by if isinstance(partition_by, list)
                else [partition_by])
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def to_csv(df, path, mode: str = "overwrite", header: bool = True) -> None:
    (df.to_spark(index=df._n_idx() > 0 and not df._mid_index)
     .write.mode(mode).option("header", header).csv(path))


def write_bucketed(df, table: str, bucket_by, buckets: int = 16,
                   sort_by=None, mode: str = "overwrite") -> None:
    """Persist as a bucketed managed table: rows are hash-partitioned
    into ``buckets`` files per partition by ``bucket_by`` at WRITE
    time.  Joins and aggregations on the bucket key then skip the
    shuffle entirely (Spark trusts the bucketing metadata in the
    catalog)."""
    bucket_cols = bucket_by if isinstance(bucket_by, list) else [bucket_by]
    writer = (df.to_spark(index=df._n_idx() > 0 and not df._mid_index)
              .write.mode(mode)
              .bucketBy(buckets, *bucket_cols))
    if sort_by is not None:
        sort_cols = sort_by if isinstance(sort_by, list) else [sort_by]
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(table: str, columns=None, index=None):
    """Catalog table scan (bucketed tables keep their bucket metadata
    — the co-located-join fast path)."""
    from ..core import DataFrame
    return DataFrame.from_table(table, columns=columns, index=index)


def to_json(df, path, mode: str = "overwrite") -> None:
    """Write as JSON-lines (one object per row; index levels included
    under their labels)."""
    (df.to_spark(index=df._n_idx() > 0 and not df._mid_index)
     .write.mode(mode).json(path))


def to_orc(df, path, mode: str = "overwrite",
           partition_by=None) -> None:
    """Write as ORC (same partitioning contract as to_parquet)."""
    writer = df.to_spark(index=df._n_idx() > 0 and not df._mid_index) \
        .write.mode(mode)
    if partition_by:
        cols = (partition_by if isinstance(partition_by, list)
                else [partition_by])
        writer = writer.partitionBy(*cols)
    writer.orc(path)


def read_jdbc(url: str, table: str, columns=None, index=None,
              partition_column: str | None = None,
              num_partitions: int | None = None,
              lower_bound=None, upper_bound=None, **options):
    """JDBC table scan — the engine analogue of the reference's
    SQLAlchemy-URL connector surface (reference db.py:12-19 holds a
    SQLAlchemy engine; here Spark's JDBC source reads the table with
    filter/column pushdown).  Requires the vendor's JDBC driver jar
    on the Spark classpath.  Live-tested against embedded Derby (the
    jar Spark ships for its Hive metastore): plain, partitioned and
    projected reads — tests/test_sources.py::test_read_jdbc_live_derby.

    At scale ALWAYS pass ``partition_column``/``num_partitions`` and
    the bounds: without them the whole table reads through ONE
    connection; with them Spark issues ``num_partitions`` bounded
    range queries in parallel."""
    from ..core import DataFrame
    from ..session import get_session
    reader = (get_session().read.format("jdbc")
              .option("url", url).option("dbtable", table))
    if partition_column is not None:
        if num_partitions is None or lower_bound is None \
                or upper_bound is None:
            raise ValueError(
                "partition_column needs num_partitions, lower_bound "
                "and upper_bound")
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return DataFrame.from_spark(reader.load(), columns=columns,
                                index=index)
