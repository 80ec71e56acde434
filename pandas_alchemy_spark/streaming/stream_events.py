"""Structured Streaming twin of ext.events: windowed aggregation with
watermarks over a streaming events source.

The reference has no streaming surface at all (SURVEY.md §2.10); this
is the Spark-native extension.  The batch query (ext.events.
tumbling_window_agg) and this streaming query share semantics: the
streaming one adds a watermark for late data and emits per-window
updates.  Tested by streaming parquet files through a file source into
a memory sink (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = 1) -> DataFrame:
    """File-source stream over a directory of parquet event files.
    ``max_files_per_trigger=None`` processes all available files in one
    micro-batch (file order is not time order, so watermarked queries
    that must not drop intra-run 'late' files want a single batch)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark.
    State is bounded by the watermark: Spark drops window state older
    than (max event time - watermark) — the 100 TB streaming contract."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def run_to_memory_sink(windowed: DataFrame, name: str = "windowed_events",
                       timeout_s: int = 60):
    """Drive the stream into an in-memory table until idle; returns the
    query handle (caller reads spark.table(name))."""
    q = (windowed.writeStream
         .outputMode("complete")
         .format("memory")
         .queryName(name)
         .start())
    q.processAllAvailable()
    return q


def dedup_stream(stream: DataFrame, keys: list[str] | None = None,
                 ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact deduplication — the streaming twin of
    ext.dedup.exact_dedup.  ``dropDuplicatesWithinWatermark`` keeps
    per-key state only until the watermark passes it, so state is
    bounded by (event-rate x watermark), not by stream history — the
    contract that makes exact dedup runnable forever at 100 TB/day.
    Keys default to ``event_id``."""
    keys = list(keys or ["event_id"])
    return (stream.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def windowed_json_agg(stream: DataFrame, props_schema: str = "k int",
                      window: str = "6 hours",
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming JSON ingestion: parse the ``props`` JSON column with
    ``from_json`` (a STATELESS projection — it composes with the
    watermarked window agg without adding state), then tumbling-window
    per-type aggregates of the extracted field.

    This is the canonical firehose shape at scale: raw JSON payloads
    land as strings, get typed executor-side (JVM Jackson parse inside
    codegen, no Python), and only the small windowed aggregate ever
    leaves the stage.  Batch twin asserted in tests/test_streaming.py.
    """
    parsed = stream.withColumn("__p", F.from_json("props", props_schema))
    return (parsed
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"),
                     F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("__p.k")).alias("k_sum"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "k_sum"))


def read_text_stream(spark: SparkSession, path: str,
                     line_col: str = "text",
                     max_files_per_trigger: int | None = 1) -> DataFrame:
    """File-source stream over a directory of raw text shards — the
    streaming twin of :func:`..sources.io.read_text` (one row per
    line; new files picked up per micro-batch).  The column is named
    ``line_col`` so the batch text operators' expressions apply
    unchanged to the streaming frame."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(path).withColumnRenamed("value", line_col)


def streaming_token_totals(stream: DataFrame,
                           line_col: str = "text") -> DataFrame:
    """Running corpus token/char totals over a text stream: the
    ingest-side budget counter for a training-data pipeline.  Pure
    built-in aggregates (complete-mode single row) — state is O(1)."""
    from ..ext.dedup import _TOKENS
    toks = F.expr(_TOKENS.format(col=line_col))
    return (stream
            .select(F.size(toks).alias("__n_tok"),
                    F.length(F.col(line_col)).alias("__n_chars"))
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum("__n_tok").alias("n_tokens"),
                 F.sum("__n_chars").alias("n_chars")))


def streaming_decontaminate(stream: DataFrame, eval_df: DataFrame,
                            n: int = 8, text_col: str = "text",
                            id_col: str = "doc_id",
                            fast_hash: bool = False) -> DataFrame:
    """Ingest-time benchmark decontamination: mark each arriving
    document with its count of word n-grams colliding with a STATIC
    evaluation set — the streaming twin of
    :func:`..ext.dedup.decontaminate`, for pipelines that screen
    documents as they land rather than in a batch sweep.

    STATELESS by construction: a streaming groupBy would keep one
    state row per doc_id forever (no watermark can bound it — doc
    ids never expire), so instead the static side collapses to ONE
    row holding the sorted distinct eval-gram hash array, joined in
    with a stream-static cross join (1-row static side), and the
    collision count is a pure per-row expression:
    ``size(array_intersect(distinct doc gram hashes, eval array))``.
    Append-mode safe, zero state, every doc emits exactly one row
    (0 for clean docs).  Trade vs the batch operator: the per-row
    lambda hashes grams interpreted rather than codegen'd — the
    right shape for ingest screening against benchmark-sized eval
    sets (the batch op's broadcast-join form is the sweep path).
    """
    from ..ext.dedup import _h60, with_shingles
    ev = with_shingles(eval_df, text_col, "__sh", n, distinct=False)
    ev_arr = (ev.select(F.explode("__sh").alias("s"))
              .select(F.expr(_h60("s", fast_hash)).alias("g"))
              .agg(F.array_sort(F.collect_set("g")).alias("__ev")))
    tr = with_shingles(stream, text_col, "__sh", n, distinct=False)
    doc_grams = F.expr(
        "array_distinct(transform(__sh, s -> "
        + _h60("s", fast_hash) + "))")
    return (tr.crossJoin(ev_arr)
            .select(F.col(id_col),
                    F.size(F.array_intersect(doc_grams, F.col("__ev")))
                    .cast("long").alias("n_contam_ngrams")))
