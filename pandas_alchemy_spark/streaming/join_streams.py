"""Stream-stream join with bounded state.

Two watermarked streams joined on a key + a time-range condition:
Spark retains each side's rows in state only until the watermark
passes the range bound, so state is O(rate × window), not O(history)
— the contract that keeps a correlation join runnable forever.
Append-mode output: a pair is emitted once both sides have arrived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_event_streams(left: DataFrame, right: DataFrame,
                       key: str = "user_id",
                       watermark: str = "2 hours",
                       range_bound: str = "10 minutes") -> DataFrame:
    """Inner-join two event streams per key where the right event
    happens within ``range_bound`` AFTER the left event."""
    l = (left.withWatermark("ts", watermark)
         .select(F.col(key).alias("k"),
                 F.col("ts").alias("l_ts"),
                 F.col("event_id").alias("l_id")))
    r = (right.withWatermark("ts", watermark)
         .select(F.col(key).alias("rk"),
                 F.col("ts").alias("r_ts"),
                 F.col("event_id").alias("r_id")))
    cond = ((F.col("k") == F.col("rk"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(
                f"INTERVAL {range_bound}")))
    return (l.join(r, cond, "inner")
            .select("k", "l_id", "r_id", "l_ts", "r_ts"))
