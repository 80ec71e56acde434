"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (engine façade) on sf0.001.
``queries()`` — one named query per implemented operator from
SURVEY.md §2 plus the pipeline extensions; each callable takes
(spark, sf_dir) and returns a Spark DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents with matching
column aliases; omitted only for genuinely approximate/non-SQL ops
(LSH ANN), which the driver records as rows-only checks.

Conventions for hash-stable comparison:
- every double aggregate is ROUND()ed identically on both sides;
- counts/sums of integers are cast to BIGINT in the oracle (DuckDB
  sums to HUGEINT otherwise);
- timestamps are exported as formatted strings (engine-neutral);
- NaN/inf never appear raw in output — IEEE edge queries classify
  them into sentinel doubles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # InferFiltersFromGenerate inlines expensive generators into
    # pushed-down filters (see pandas_alchemy_spark/ext/dedup.py)
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary through the pandas
    façade (scan -> mask filter -> assign -> groupby/agg -> sort)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    sf_dir = "/root/testdata/sf0.001"
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    li = li[li.l_shipdate <= "1998-09-01"]
    li = li.assign(
        disc_price=li.l_extendedprice * (1 - li.l_discount),
        charge=li.l_extendedprice * (1 - li.l_discount) * (1 + li.l_tax))
    out = (li.groupby(["l_returnflag", "l_linestatus"])
           .agg(sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                sum_charge=("charge", "sum"),
                avg_qty=("l_quantity", "mean"),
                avg_price=("l_extendedprice", "mean"),
                avg_disc=("l_discount", "mean"),
                count_order=("l_quantity", "count")))
    sdf = out.to_spark()
    return sdf.select(
        "l_returnflag", "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_base_price", 2).alias("sum_base_price"),
        F.round("sum_disc_price", 2).alias("sum_disc_price"),
        F.round("sum_charge", 2).alias("sum_charge"),
        F.round("avg_qty", 4).alias("avg_qty"),
        F.round("avg_price", 4).alias("avg_price"),
        F.round("avg_disc", 4).alias("avg_disc"),
        F.col("count_order"))


# ---------------------------------------------------------------------------
# reference-surface queries (engine façade)
# ---------------------------------------------------------------------------

def q_scan_project(spark, sf_dir):
    """from_table with column projection (alchemy.py:313-350)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.DataFrame.from_table(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return li.to_spark(index=False)


def q_scalar_arith(spark, sf_dir):
    """Scalar + aligned Series arithmetic (rule 1/7 fast path)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    rev = li.l_extendedprice * (1 - li.l_discount)
    out = li.assign(revenue=rev.round(4))[
        ["l_orderkey", "l_linenumber", "revenue"]]
    return out.to_spark(index=False)


_NAN_S, _INF_S, _NINF_S = -999999.0, 999999.0, -888888.0


def q_ieee_div(spark, sf_dir):
    """IEEE truediv incl. /0 -> ±inf, 0/0 -> NaN (coercion.py:48-65
    semantics re-expressed as Column builders)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    d = li.l_quantity / (li.l_linenumber - 3)
    out = li.assign(div=d)[["l_orderkey", "l_linenumber", "div"]]
    sdf = out.to_spark(index=False)
    cls = (F.when(F.isnan("div"), F.lit(_NAN_S))
           .when(F.col("div") == float("inf"), F.lit(_INF_S))
           .when(F.col("div") == float("-inf"), F.lit(_NINF_S))
           .otherwise(F.round("div", 6)))
    return sdf.select("l_orderkey", "l_linenumber", cls.alias("div_val"))


def q_from_list_positional(spark, sf_dir):
    """Series.from_list literal ingestion (alchemy.py:508-517) +
    positional list op via rowid paste-join (base.py:118-128)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    s = pas.Series.from_list([10.0, 20.0, 30.0, 40.0], name="v")
    t = s * [1.0, 2.0, 3.0, 4.0]
    return t.to_spark().select(
        F.col("index").cast("long").alias("idx"),
        F.col("v").cast("double").alias("v"))


def q_clip_round_abs(spark, sf_dir):
    """clip/round/abs scalar functions (generic.py:77-83,
    alchemy.py:254-262)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    c = pas.read_parquet(_t(sf_dir, "customer"))
    clipped = c.c_acctbal.clip(-500.0, 5000.0).round(1)
    absd = c.c_acctbal.abs().round(1)
    out = c.assign(bal_clip=clipped, bal_abs=absd)[
        ["c_custkey", "bal_clip", "bal_abs"]]
    return out.to_spark(index=False)


def q_fill_isna(spark, sf_dir):
    """isna/notna + fill_value (generic.py:69-75, alchemy.py:179-181):
    nullify zero discounts, count NAs, re-fill."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    two = li[["l_orderkey", "l_discount"]].applymap(
        lambda c: F.when(c != 0, c))
    sdf = two.to_spark(index=False)
    return sdf.agg(
        F.sum(F.when(F.col("l_discount").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
        F.round(F.sum(F.coalesce(F.col("l_discount"), F.lit(1.0))), 4).alias("sum_filled"))


def q_align_add_outer(spark, sf_dir):
    """Series+Series full-outer index alignment (base.py:72-84): order
    totals of 'F' vs 'O' status orders per customer."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders"))
    a = o[o.o_orderstatus == "F"].groupby("o_custkey").agg(
        total=("o_totalprice", "sum"))
    b = o[o.o_orderstatus == "O"].groupby("o_custkey").agg(
        total=("o_totalprice", "sum"))
    s = a["total"] + b["total"]
    sdf = s.to_spark()
    return sdf.select(F.col("o_custkey").cast("long").alias("o_custkey"),
                      F.round("total", 2).alias("total_both"))


def q_col_align_nulls(spark, sf_dir):
    """DataFrame+DataFrame outer column-label alignment with NULL
    columns for unmatched labels (base.py:64-70, alchemy.py:200-211)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    a = li.groupby("l_returnflag").agg(x=("l_quantity", "sum"),
                                       y=("l_extendedprice", "sum"))
    b = li.groupby("l_returnflag").agg(y=("l_discount", "sum"),
                                       z=("l_tax", "sum"))
    both = a + b
    sdf = both.to_spark()
    return sdf.select("l_returnflag",
                      F.round("x", 2).alias("x"),
                      F.round("y", 2).alias("y"),
                      F.round("z", 2).alias("z"))


def q_head_sorted(spark, sf_dir):
    """sort + head/limit (generic.py:46-48 + beyond-ref sort)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders"))
    top = o.nlargest(10, "o_totalprice")[["o_orderkey", "o_totalprice"]]
    return top.to_spark(index=False)


def q_tail_sorted(spark, sf_dir):
    """tail via rowid-offset filter (generic.py:50-57)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders"))
    t = o.sort_values("o_orderkey").tail(5)[["o_orderkey", "o_custkey"]]
    return t.to_spark(index=False)


def q_iat_scalar(spark, sf_dir):
    """.iat positional scalar fetch (indexer.py, alchemy.py:146-163)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders")).sort_values("o_orderkey")
    price = o.iat[0, 3]
    first_key = o.iat[0, 0]
    return spark.createDataFrame(
        [(int(first_key), float(round(price, 2)))],
        "o_orderkey long, o_totalprice double")


def q_from_pandas_literal(spark, sf_dir):
    """from_pandas literal ingestion (alchemy.py:301-311) + scalar op."""
    import pandas as pd
    import pandas_alchemy_spark as pas
    _prep(spark)
    pdf = pd.DataFrame({"k": ["a", "b", "c"], "v": [1.5, 2.5, None]})
    df = pas.DataFrame.from_pandas(pdf)
    out = df.assign(v2=df.v * 10)
    sdf = out.to_spark(index=False)
    return sdf.select("k", "v", F.col("v2").cast("double").alias("v2"))


def q_series_prefix(spark, sf_dir):
    """Series.add_prefix concat onto index values (alchemy.py:470-478)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    n = pas.read_parquet(_t(sf_dir, "nation"))
    s = n.set_index("n_nationkey")["n_name"].add_prefix("nation_")
    sdf = s.to_spark()
    return sdf.select(F.col("n_nationkey").cast("string").alias("idx"),
                      F.col("n_name"))


def q_bool_coercion(spark, sf_dir):
    """bool->int coercion in arithmetic (coercion.py:88-116): flag
    comparisons summed as ints."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    heavy = li.l_quantity > 25
    cheap = li.l_discount < 0.05
    score = heavy * 2 + cheap * 1  # bool*int -> int
    out = li.assign(score=score).groupby("l_returnflag").agg(
        total_score=("score", "sum"), n=("score", "count"))
    sdf = out.to_spark()
    return sdf.select("l_returnflag",
                      F.col("total_score").cast("long").alias("total_score"),
                      F.col("n").cast("long").alias("n"))


def q_pivot_table(spark, sf_dir):
    """pivot_table: quantity by (linestatus x returnflag) — Spark
    groupBy().pivot() with an explicit domain (no distinct-values job;
    at 100 TB always pass the domain)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    pv = li.pivot_table("l_quantity", "l_linestatus", "l_returnflag",
                        "sum", columns_values=["A", "N", "R"])
    sdf = pv.to_spark()
    return sdf.select("l_linestatus",
                      F.round("A", 2).alias("qty_a"),
                      F.round("N", 2).alias("qty_n"),
                      F.round("R", 2).alias("qty_r"))


def q_melt_unpivot(spark, sf_dir):
    """melt: wide customer metrics to long (Spark native unpivot
    generator, not N scans)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    c = pas.read_parquet(_t(sf_dir, "customer"))
    m = c.melt("c_custkey", ["c_acctbal", "c_nationkey"])
    sdf = m.to_spark(index=False)
    return sdf.select(F.col("c_custkey").cast("long").alias("c_custkey"),
                      "variable",
                      F.round(F.col("value").cast("double"), 2).alias("value"))


def q_grouped_cumsum(spark, sf_dir):
    """Grouped analytic transform (partitionBy window — the scalable
    flavor): running order total per customer in orderkey order."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders")).set_index("o_orderkey")
    cum = o.groupby("o_custkey")["o_totalprice"].cumsum()
    sdf = cum.to_spark()
    return sdf.select(F.col("o_orderkey").cast("long").alias("o_orderkey"),
                      F.round("o_totalprice", 2).alias("cum_total"))


def q_series_rank(spark, sf_dir):
    """Series.rank(method='min'): global value rank (single-partition
    window — parity path; grouped rank is the scale path)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    c = pas.read_parquet(_t(sf_dir, "customer")).set_index("c_custkey")
    rk = c["c_acctbal"].rank(method="min")
    sdf = rk.to_spark()
    return sdf.select(F.col("c_custkey").cast("long").alias("c_custkey"),
                      F.col("c_acctbal").cast("long").alias("bal_rank"))


def q_rolling_sum(spark, sf_dir):
    """Series.rolling(3).sum() in index order."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders")).set_index("o_orderkey")
    roll = o["o_totalprice"].rolling(3).sum()
    sdf = roll.to_spark()
    return sdf.select(F.col("o_orderkey").cast("long").alias("o_orderkey"),
                      F.round("o_totalprice", 2).alias("roll_sum"))


def q_isin_between(spark, sf_dir):
    """isin + between + logical mask composition (all pushdown-
    eligible predicates)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    mask = (li.l_returnflag.isin(["A", "R"])
            & li.l_quantity.between(10, 20, inclusive="both"))
    out = li[mask].groupby("l_returnflag").agg(
        n=("l_orderkey", "count"), qty=("l_quantity", "sum"))
    sdf = out.to_spark()
    return sdf.select("l_returnflag",
                      F.col("n").cast("long").alias("n"),
                      F.round("qty", 2).alias("qty"))


def q_concat_union(spark, sf_dir):
    """pas.concat label-aligned row union (UNION ALL + NULL padding for
    unmatched labels), aggregated."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders"))
    hi = o[o.o_totalprice > 200000.0][["o_orderkey", "o_totalprice"]]
    lo = o[o.o_totalprice < 50000.0][["o_orderkey", "o_custkey"]]
    both = pas.concat([hi, lo], ignore_index=True)
    sdf = both.to_spark(index=False)
    return sdf.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").cast("long").alias("n_price"),
        F.count("o_custkey").cast("long").alias("n_cust"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"))


def q_str_funcs(spark, sf_dir):
    """Series.str accessor (beyond-reference, SURVEY.md §2.9): lower/
    len/contains/replace/slice over customer segments, in-plan."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    c = pas.read_parquet(_t(sf_dir, "customer"))
    seg = c.c_mktsegment
    out = c.assign(
        seg_lower=seg.str.lower(),
        seg_len=seg.str.len(),
        has_ing=seg.str.contains("ING", regex=False),
        seg_us=seg.str.replace("I", "1"),
        seg_3=seg.str.slice(0, 3),
    )[["c_custkey", "seg_lower", "seg_len", "has_ing", "seg_us", "seg_3"]]
    sdf = out.to_spark(index=False)
    return sdf.select("c_custkey", "seg_lower",
                      F.col("seg_len").cast("long").alias("seg_len"),
                      "has_ing", "seg_us", "seg_3")


def q_dt_funcs(spark, sf_dir):
    """Series.dt accessor (beyond-reference): calendar components of
    o_orderdate rolled up per (year, quarter), plus a
    ``df.resample("MS", on=...)`` leg — the bucket expression inlines
    into the scan projection, so the whole leg is one hash
    aggregate."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders"))
    d = o.o_orderdate
    out = (o.assign(yr=d.dt.year, qtr=d.dt.quarter, dow=d.dt.dayofweek)
           .groupby(["yr", "qtr"])
           .agg(n=("yr", "count"), dow_sum=("dow", "sum")))
    sdf = out.to_spark()
    base = sdf.select(F.lit("dt").alias("tag"),
                      F.col("yr").cast("long").alias("yr"),
                      F.col("qtr").cast("long").alias("qtr"),
                      F.col("n").cast("long").alias("n"),
                      F.col("dow_sum").cast("double").alias("v"))
    rs = (o[["o_orderdate", "o_totalprice"]]
          .resample("MS", on="o_orderdate")
          .agg(rev=("o_totalprice", "sum"),
               n=("o_totalprice", "count"))).to_spark()
    leg = rs.select(F.lit("resample_ms").alias("tag"),
                    F.year("o_orderdate").cast("long").alias("yr"),
                    F.month("o_orderdate").cast("long").alias("qtr"),
                    F.col("n").cast("long").alias("n"),
                    F.round("rev", 2).alias("v"))
    # round-5 fold: pas.to_datetime round-trip (strftime -> parse —
    # both stay in-plan as one projection; accessors.py to_datetime)
    s = o.o_orderdate.dt.strftime("%Y-%m-%d")
    ts = pas.to_datetime(s, format="%Y-%m-%d")
    o2 = o.assign(pyr=ts.dt.year, pmo=ts.dt.month, pdy=ts.dt.day)
    td = (o2.groupby(["pyr", "pmo"])
          .agg(n=("pdy", "count"), v=("pdy", "sum"))).to_spark()
    leg_td = td.select(F.lit("to_dt").alias("tag"),
                       F.col("pyr").cast("long").alias("yr"),
                       F.col("pmo").cast("long").alias("qtr"),
                       F.col("n").cast("long").alias("n"),
                       F.col("v").cast("double").alias("v"))
    # round-5 fold: .at scalar label access (indexer.py) — DataFrame.at
    # and Series.at each fetch ONE cell driver-side; the values ride
    # back as literal rows (c_acctbal is 2-decimal, no rounding needed)
    cust = pas.read_parquet(_t(sf_dir, "customer"))
    ci = cust.set_index("c_custkey")
    a1 = float(ci.at[7, "c_acctbal"])
    a2 = float(ci.c_acctbal.at[11])
    leg_at = spark.createDataFrame(
        [("at", 7, None, 1, a1), ("at", 11, None, 1, a2)],
        "tag string, yr long, qtr long, n long, v double")
    # round-5 fold: time-offset rolling('7D') — RANGE frame on epoch
    # micros of the date index (operators/analytic._rolling_time).
    # Exact-cents contract: window sums of LONGs are engine-exact
    # (no segment-tree last-ulp issue), max per month compresses the
    # check
    od = o.set_index("o_orderdate")
    cents = (od.o_totalprice * 100).round(0).astype("int64")
    roll = cents.rolling("7D").sum().to_spark()
    rv = roll.columns[-1]
    leg_rl = (roll.groupBy(F.year("o_orderdate").cast("long").alias("yr"),
                           F.month("o_orderdate").cast("long").alias("qtr"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.max(rv).cast("double").alias("v"))
              .select(F.lit("roll7d").alias("tag"), "yr", "qtr", "n", "v"))
    # round-6 fold: pas.date_range (relational.py date_range — driver
    # generates the bounded label sequence, Arrow ships it).  40 daily
    # points spanning a non-leap February month boundary, rolled up
    # per month through the dt accessor.
    dr = pas.date_range("1997-02-25", periods=40, freq="D", name="d")
    drs = dr.to_spark()
    dv = drs.columns[-1]
    leg_dg = (drs.groupBy(F.year(dv).cast("long").alias("yr"),
                          F.month(dv).cast("long").alias("qtr"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.dayofmonth(dv)).cast("double").alias("v"))
              .select(F.lit("drange").alias("tag"), "yr", "qtr",
                      "n", "v"))
    # round-6 fold: the dt timezone subset (accessors.py tz_localize/
    # tz_convert).  A FIXED offset (+05:30) keeps the oracle
    # ICU-free: the converted wall time is exactly ts + 330 minutes.
    # events.ts has real intraday times, so the half-hour offset
    # reshuffles the hour histogram and shifts late-evening events
    # across date lines (caught by the day sum).
    ev6 = pas.read_parquet(_t(sf_dir, "events"))
    ist = ev6.ts.dt.tz_localize("UTC").dt.tz_convert("+05:30")
    e7 = ev6.assign(zhr=ist.dt.hour, zdy=ist.dt.day)
    tzagg = (e7.groupby("zhr")
             .agg(n=("zdy", "count"), v=("zdy", "sum"))).to_spark()
    leg_tz = tzagg.select(F.lit("tz").alias("tag"),
                          F.col("zhr").cast("long").alias("yr"),
                          F.lit(None).cast("long").alias("qtr"),
                          F.col("n").cast("long").alias("n"),
                          F.col("v").cast("double").alias("v"))
    return (base.unionAll(leg).unionAll(leg_td).unionAll(leg_at)
            .unionAll(leg_rl).unionAll(leg_dg).unionAll(leg_tz))


# ---------------------------------------------------------------------------
# beyond-reference relational (groupby/join/sort/window)
# ---------------------------------------------------------------------------

def q_groupby_agg(spark, sf_dir):
    """Q1-style multi-aggregate groupby through the façade, joined
    with the per-flag exact count-distinct leg (folded
    distinct_count entry — one extra hash-aggregate, broadcast
    joined on the 3-row flag domain)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    li = li[li.l_shipdate <= "1998-09-01"]
    li = li.assign(disc_price=li.l_extendedprice * (1 - li.l_discount))
    out = (li.groupby(["l_returnflag", "l_linestatus"])
           .agg(sum_qty=("l_quantity", "sum"),
                sum_disc_price=("disc_price", "sum"),
                avg_qty=("l_quantity", "mean"),
                count_order=("l_quantity", "count")))
    sdf = out.to_spark()
    g = sdf.select("l_returnflag", "l_linestatus",
                   F.round("sum_qty", 2).alias("sum_qty"),
                   F.round("sum_disc_price", 2).alias("sum_disc_price"),
                   F.round("avg_qty", 4).alias("avg_qty"),
                   F.col("count_order"))
    return g.join(F.broadcast(q_distinct_count(spark, sf_dir)),
                  "l_returnflag")


def q3_shipping(spark, sf_dir):
    """TPC-H Q3-style: 3-way join + filter + groupby + top-k revenue."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    c = pas.read_parquet(_t(sf_dir, "customer"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    cb = c[c.c_mktsegment == "BUILDING"][["c_custkey"]]
    oj = o.merge(cb, left_on="o_custkey", right_on="c_custkey",
                 how="inner", broadcast=True)
    lj = li.merge(oj[["o_orderkey"]], left_on="l_orderkey",
                  right_on="o_orderkey", how="inner")
    lj = lj.assign(rev=lj.l_extendedprice * (1 - lj.l_discount))
    out = lj.groupby("l_orderkey").agg(revenue=("rev", "sum"))
    top = out.reset_index().nlargest(10, "revenue")
    sdf = top.to_spark(index=False)
    return sdf.select(F.col("l_orderkey").cast("long").alias("l_orderkey"),
                      F.round("revenue", 2).alias("revenue"))


def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5-style: 6-way star join, revenue by nation (dims
    broadcast)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    r = pas.read_parquet(_t(sf_dir, "region"))
    n = pas.read_parquet(_t(sf_dir, "nation"))
    c = pas.read_parquet(_t(sf_dir, "customer"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    s = pas.read_parquet(_t(sf_dir, "supplier"))
    nr = n.merge(r, left_on="n_regionkey", right_on="r_regionkey",
                 how="inner", broadcast=True)
    cn = c.merge(nr[["n_nationkey", "n_name"]], left_on="c_nationkey",
                 right_on="n_nationkey", how="inner", broadcast=True)
    oc = o.merge(cn[["c_custkey", "n_name"]], left_on="o_custkey",
                 right_on="c_custkey", how="inner")
    ls = li.merge(s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey",
                  right_on="s_suppkey", how="inner", broadcast=True)
    lo = ls.merge(oc[["o_orderkey", "n_name"]], left_on="l_orderkey",
                  right_on="o_orderkey", how="inner")
    lo = lo.assign(rev=lo.l_extendedprice * (1 - lo.l_discount))
    out = lo.groupby("n_name").agg(revenue=("rev", "sum"))
    sdf = out.to_spark()
    return sdf.select("n_name", F.round("revenue", 2).alias("revenue"))


def q6_forecast(spark, sf_dir):
    """TPC-H Q6-style: filtered single-row aggregate (mask filter
    pushes to the parquet scan)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    # chained masks: each filter composes in-plan and pushes to the scan
    f = li[li.l_quantity < 24]
    f = f[f.l_discount >= 0.05]
    f = f[f.l_discount <= 0.07]
    f = f.assign(rev=f.l_extendedprice * f.l_discount)
    # one job for both reductions (sum+count fused in a single agg
    # pass) instead of two separate actions
    return f.to_spark(index=False).agg(
        F.round(F.sum("rev"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"))


def q_groupby_apply(spark, sf_dir):
    """groupby().apply via applyInPandas (grouped-map Arrow UDF): the
    escape hatch for per-group logic the built-ins can't express.
    Groups go executor-side, never to the driver.

    Round-5 fold: a ``GroupBy.filter`` leg (relational.py
    GroupBy.filter — whole-group keep/drop over the same applyInPandas
    transport) rides in the same tagged union: groups of the
    orderkey<100 slice whose total quantity clears 3250 survive, then
    aggregate.  Sum-of-integer-valued quantities is exact, so the
    HAVING threshold is engine-stable with no rounding contract."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))

    def top2(pdf):
        out = pdf.sort_values(
            ["l_quantity", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True]).head(2)
        return out[["l_returnflag", "l_orderkey", "l_quantity"]]

    res = (li[["l_returnflag", "l_orderkey", "l_linenumber",
               "l_quantity"]]
           .groupby("l_returnflag")
           .apply(top2, "l_returnflag string, l_orderkey long, "
                        "l_quantity double"))
    apply_leg = res.to_spark(index=False).select(
        F.lit("apply").alias("tag"),
        F.col("l_returnflag").alias("rf"),
        F.col("l_orderkey").cast("long").alias("k"),
        F.col("l_quantity").cast("double").alias("v"))
    small = li[li.l_orderkey < 100][
        ["l_returnflag", "l_orderkey", "l_quantity"]]
    kept = small.groupby("l_returnflag").filter(
        lambda p: p["l_quantity"].sum() > 3250)
    fl = kept.groupby("l_returnflag").agg(
        n=("l_orderkey", "count"), qty=("l_quantity", "sum"))
    filter_leg = fl.to_spark().select(
        F.lit("filter").alias("tag"),
        F.col("l_returnflag").alias("rf"),
        F.col("n").cast("long").alias("k"),
        F.col("qty").cast("double").alias("v"))
    # round-5 fold: positional GroupBy slices (head/nth — one
    # row_number window over the keys) and the numbering verbs
    # (cumcount sum; ngroup sum via the distributed dense-rank scan).
    # Index = o_orderkey, so "position within group" is deterministic
    # (the engine's documented index-order contract).
    o = pas.read_parquet(_t(sf_dir, "orders")).set_index("o_orderkey")
    osub = o[["o_orderpriority", "o_totalprice"]]
    gb = osub.groupby("o_orderpriority")
    hd = gb.head(2).reset_index()
    head_leg = hd.to_spark(index=False).select(
        F.lit("h").alias("tag"),
        F.col("o_orderpriority").alias("rf"),
        F.col("o_orderkey").cast("long").alias("k"),
        F.round("o_totalprice", 2).alias("v"))
    nt = gb.nth(1).reset_index()
    nth_leg = nt.to_spark(index=False).select(
        F.lit("n").alias("tag"),
        F.col("o_orderpriority").alias("rf"),
        F.col("o_orderkey").cast("long").alias("k"),
        F.lit(None).cast("double").alias("v"))
    cc_total = int(gb.cumcount().sum())
    ng_total = int(gb.ngroup().sum())
    num_leg = spark.createDataFrame(
        [("c", "*", cc_total, None), ("g", "*", ng_total, None)],
        "tag string, rf string, k long, v double")
    return (apply_leg.unionAll(filter_leg).unionAll(head_leg)
            .unionAll(nth_leg).unionAll(num_leg))


def q10_returned(spark, sf_dir):
    """TPC-H Q10-style: revenue lost to returned items per customer,
    top 20 — join lineitem(R) × orders × customer × nation (dims
    broadcast), one aggregate shuffle, window-free top-k."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    c = pas.read_parquet(_t(sf_dir, "customer"))
    n = pas.read_parquet(_t(sf_dir, "nation"))
    # project the fact down BEFORE the join chain: Catalyst would prune
    # for execution anyway, but analysis cost scales with plan width —
    # carrying 11 lineitem columns through 3 joins measurably slows the
    # driver (build 7 s -> 2 s at sf0.01)
    lr = li[li.l_returnflag == "R"][
        ["l_orderkey", "l_extendedprice", "l_discount"]]
    lo = lr.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey",
                  right_on="o_orderkey", how="inner")
    cn = c.merge(n[["n_nationkey", "n_name"]], left_on="c_nationkey",
                 right_on="n_nationkey", how="inner", broadcast=True)
    j = lo.merge(cn[["c_custkey", "c_name", "n_name"]],
                 left_on="o_custkey", right_on="c_custkey", how="inner")
    j = j.assign(rev=j.l_extendedprice * (1 - j.l_discount))
    out = (j.groupby(["c_custkey", "c_name", "n_name"])
           .agg(revenue=("rev", "sum")))
    top = out.reset_index().nlargest(20, "revenue")
    return top.to_spark(index=False).select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name", "n_name", F.round("revenue", 2).alias("revenue"))


def q18_large_orders(spark, sf_dir):
    """TPC-H Q18-style: orders whose total quantity exceeds 300 —
    aggregate + HAVING filter + join back for customer detail."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    c = pas.read_parquet(_t(sf_dir, "customer"))
    qty = li.groupby("l_orderkey").agg(total_qty=("l_quantity", "sum"))
    big = qty.reset_index()
    big = big[big.total_qty > 300]
    j = big.merge(o[["o_orderkey", "o_custkey", "o_totalprice"]],
                  left_on="l_orderkey", right_on="o_orderkey", how="inner")
    j = j.merge(c[["c_custkey", "c_name"]], left_on="o_custkey",
                right_on="c_custkey", how="inner", broadcast=True)
    return j.to_spark(index=False).select(
        F.col("l_orderkey").cast("long").alias("o_orderkey"),
        "c_name",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.round("total_qty", 2).alias("total_qty"))


def q19_disjunct(spark, sf_dir):
    """TPC-H Q19-style: disjunctive multi-range predicate (brand x
    quantity bands) over a broadcast part join — Catalyst folds the
    OR-of-ANDs into one scan-side filter."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    p = pas.read_parquet(_t(sf_dir, "part"))
    j = li.merge(p[["p_partkey", "p_brand", "p_size"]],
                 left_on="l_partkey", right_on="p_partkey",
                 how="inner", broadcast=True)
    m = (((j.p_brand == "Brand#1") & (j.l_quantity >= 1)
          & (j.l_quantity <= 11) & (j.p_size <= 5))
         | ((j.p_brand == "Brand#2") & (j.l_quantity >= 10)
            & (j.l_quantity <= 20) & (j.p_size <= 10))
         | ((j.p_brand == "Brand#3") & (j.l_quantity >= 20)
            & (j.l_quantity <= 30) & (j.p_size <= 15)))
    f = j[m]
    f = f.assign(rev=f.l_extendedprice * (1 - f.l_discount))
    return f.to_spark(index=False).agg(
        F.round(F.sum("rev"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"))


def q4_semi_join(spark, sf_dir):
    """TPC-H Q4-style: EXISTS via left-semi join (orders with at least
    one returned lineitem, counted by priority).  The semi join never
    materializes the right payload — keys-only build side."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders"))
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    o = o[o.o_orderdate >= "1995-01-01"]
    o = o[o.o_orderdate < "1996-01-01"]
    ret = li[li.l_returnflag == "R"][["l_orderkey"]]
    sj = o.merge(ret, left_on="o_orderkey", right_on="l_orderkey",
                 how="semi")
    out = sj.groupby("o_orderpriority").agg(
        order_count=("o_orderkey", "count"))
    sdf = out.to_spark()
    return sdf.select("o_orderpriority",
                      F.col("order_count").cast("long").alias("order_count"))


def q_anti_join(spark, sf_dir):
    """NOT EXISTS via left-anti join: customers with no high-value
    order, counted per nation."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    c = pas.read_parquet(_t(sf_dir, "customer"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    big = o[o.o_totalprice > 300000.0][["o_custkey"]]
    aj = c.merge(big, left_on="c_custkey",
                 right_on="o_custkey", how="anti")
    out = aj.groupby("c_nationkey").agg(n_customers=("c_custkey", "count"))
    sdf = out.to_spark()
    return sdf.select(F.col("c_nationkey").cast("long").alias("c_nationkey"),
                      F.col("n_customers").cast("long").alias("n_customers"))


def _assign_rev100(df):
    """Exact-cents revenue column: (price*100)*(100 - disc*100) is an
    exact integer per row (the testdata's money is 2-decimal and
    discount is a 2-decimal fraction <= 0.10), and every partial sum
    stays below 2^53 through sf1, so Spark and the DuckDB oracle
    produce BIT-IDENTICAL sums regardless of summation order — no
    rounding contract needed.  At 100 TB the same query would sum in
    decimal(38,4); the driver contract pins semantics, not the
    production dtype."""
    return df.assign(
        rev100=(df.l_extendedprice * 100) * (100 - df.l_discount * 100))


def q7_volume(spark, sf_dir):
    """TPC-H Q7-style (adapted to the testdata's columns): shipping
    volume between two nations by ship year.  Nation-filtered supplier
    and customer dims broadcast into the two fact scans; the
    lineitem×orders join is the single shuffle."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    c = pas.read_parquet(_t(sf_dir, "customer"))
    s = pas.read_parquet(_t(sf_dir, "supplier"))
    s2 = s[s.s_nationkey.isin([1, 2])][["s_suppkey", "s_nationkey"]]
    c2 = c[c.c_nationkey.isin([1, 2])][["c_custkey", "c_nationkey"]]
    ls = li.merge(s2, left_on="l_suppkey", right_on="s_suppkey",
                  how="inner", broadcast=True)
    oc = o.merge(c2, left_on="o_custkey", right_on="c_custkey",
                 how="inner", broadcast=True)
    j = ls.merge(oc[["o_orderkey", "c_nationkey"]], left_on="l_orderkey",
                 right_on="o_orderkey", how="inner")
    j = j[j.s_nationkey != j.c_nationkey]
    j = _assign_rev100(j.assign(year=j.l_shipdate.dt.year))
    out = j.groupby(["s_nationkey", "c_nationkey", "year"]).agg(
        rev100=("rev100", "sum"))
    sdf = out.to_spark()
    return sdf.select(
        F.col("s_nationkey").cast("long").alias("supp_nation"),
        F.col("c_nationkey").cast("long").alias("cust_nation"),
        F.col("year").cast("long").alias("year"),
        (F.col("rev100") / 10000.0).alias("revenue"))


def q8_market_share(spark, sf_dir):
    """TPC-H Q8-style: PROMO-part revenue shipped to ASIA customers by
    year, split into the nation-1-supplied slice vs the total (the
    market share is their ratio; both sums are emitted so the driver
    contract stays exact-integer instead of hashing a rounded ratio)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    c = pas.read_parquet(_t(sf_dir, "customer"))
    s = pas.read_parquet(_t(sf_dir, "supplier"))
    p = pas.read_parquet(_t(sf_dir, "part"))
    n = pas.read_parquet(_t(sf_dir, "nation"))
    r = pas.read_parquet(_t(sf_dir, "region"))
    asia = n.merge(r[r.r_name == "ASIA"][["r_regionkey"]],
                   left_on="n_regionkey", right_on="r_regionkey",
                   how="inner", broadcast=True)[["n_nationkey"]]
    c2 = c.merge(asia, left_on="c_nationkey", right_on="n_nationkey",
                 how="inner", broadcast=True)[["c_custkey"]]
    oc = o.merge(c2, left_on="o_custkey", right_on="c_custkey",
                 how="inner", broadcast=True)[["o_orderkey"]]
    lp = li.merge(p[p.p_type == "PROMO"][["p_partkey"]],
                  left_on="l_partkey", right_on="p_partkey",
                  how="inner", broadcast=True)
    ls = lp.merge(s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey",
                  right_on="s_suppkey", how="inner", broadcast=True)
    j = ls.merge(oc, left_on="l_orderkey", right_on="o_orderkey",
                 how="inner")
    j = _assign_rev100(j.assign(year=j.l_shipdate.dt.year))
    # bool→int coercion turns the flag into the CASE WHEN of the oracle
    j = j.assign(nat100=(j.s_nationkey == 1) * j.rev100)
    out = j.groupby("year").agg(nat100=("nat100", "sum"),
                                tot100=("rev100", "sum"))
    sdf = out.to_spark()
    return sdf.select(
        F.col("year").cast("long").alias("year"),
        (F.col("nat100") / 10000.0).alias("nation_rev"),
        (F.col("tot100") / 10000.0).alias("total_rev"))


def q9_profit(spark, sf_dir):
    """TPC-H Q9-style: revenue on STANDARD-type parts by supplier
    nation × ship year (the testdata has no partsupp/supplycost, so
    profit degenerates to discounted revenue — the join/agg shape is
    what's under test)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    s = pas.read_parquet(_t(sf_dir, "supplier"))
    p = pas.read_parquet(_t(sf_dir, "part"))
    n = pas.read_parquet(_t(sf_dir, "nation"))
    sn = s.merge(n[["n_nationkey", "n_name"]], left_on="s_nationkey",
                 right_on="n_nationkey", how="inner",
                 broadcast=True)[["s_suppkey", "n_name"]]
    lp = li.merge(p[p.p_type == "STANDARD"][["p_partkey"]],
                  left_on="l_partkey", right_on="p_partkey",
                  how="inner", broadcast=True)
    j = lp.merge(sn, left_on="l_suppkey", right_on="s_suppkey",
                 how="inner", broadcast=True)
    j = _assign_rev100(j.assign(year=j.l_shipdate.dt.year))
    out = j.groupby(["n_name", "year"]).agg(rev100=("rev100", "sum"))
    sdf = out.to_spark()
    return sdf.select(
        "n_name", F.col("year").cast("long").alias("year"),
        (F.col("rev100") / 10000.0).alias("profit"))


def q13_distribution(spark, sf_dir):
    """TPC-H Q13-style: customer order-count distribution, zero-order
    customers included (left merge + fillna(0) + second groupby)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    c = pas.read_parquet(_t(sf_dir, "customer"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    cnt = (o.groupby("o_custkey").agg(n_orders=("o_orderkey", "count"))
           .reset_index())
    m = c[["c_custkey"]].merge(cnt, left_on="c_custkey",
                               right_on="o_custkey", how="left")
    m = m.assign(n_orders=m.n_orders.fillna(0))
    out = m.groupby("n_orders").agg(n_custs=("c_custkey", "count"))
    sdf = out.to_spark()
    return sdf.select(F.col("n_orders").cast("long").alias("n_orders"),
                      F.col("n_custs").cast("long").alias("n_custs"))


def q14_promo(spark, sf_dir):
    """TPC-H Q14-style: promo revenue vs total by ship month over one
    year (both exact-cent sums emitted; the promo share is the ratio)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    p = pas.read_parquet(_t(sf_dir, "part"))
    f = li[li.l_shipdate >= "1995-01-01"]
    f = f[f.l_shipdate < "1996-01-01"]
    j = f.merge(p[["p_partkey", "p_type"]], left_on="l_partkey",
                right_on="p_partkey", how="inner", broadcast=True)
    j = _assign_rev100(j.assign(month=j.l_shipdate.dt.month))
    j = j.assign(promo100=(j.p_type == "PROMO") * j.rev100)
    out = j.groupby("month").agg(promo100=("promo100", "sum"),
                                 tot100=("rev100", "sum"))
    sdf = out.to_spark()
    return sdf.select(
        F.col("month").cast("long").alias("month"),
        (F.col("promo100") / 10000.0).alias("promo_rev"),
        (F.col("tot100") / 10000.0).alias("total_rev"))


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15-style: the top-revenue supplier(s) of 1996 H1.  The
    max is a SCALAR aggregate pulled to the driver and pushed back as
    a filter literal — the pattern that replaces Q15's view+subquery
    (and ties survive, unlike a sorted LIMIT 1)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    f = li[li.l_shipdate >= "1996-01-01"]
    f = f[f.l_shipdate < "1996-07-01"]
    f = _assign_rev100(f)
    sup = (f.groupby("l_suppkey").agg(t100=("rev100", "sum"))
           .reset_index())
    top = sup[sup.t100 == sup.t100.max()]
    sdf = top.to_spark(index=False)
    return sdf.select(F.col("l_suppkey").cast("long").alias("s_suppkey"),
                      (F.col("t100") / 10000.0).alias("revenue"))


def q17_small_qty(spark, sf_dir):
    """TPC-H Q17-style: yearly revenue lost to small-quantity orders
    of one brand.  The per-part average-quantity subquery joins back
    onto the same filtered scan (broadcast — it is one row per part of
    one brand); quantities are integers so 0.2*avg is engine-exact."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    p = pas.read_parquet(_t(sf_dir, "part"))
    lp = li.merge(p[p.p_brand == "Brand#13"][["p_partkey"]],
                  left_on="l_partkey", right_on="p_partkey",
                  how="inner", broadcast=True)
    av = (lp.groupby("l_partkey").agg(sum_q=("l_quantity", "sum"),
                                      n_q=("l_quantity", "count"))
          .reset_index())
    av = av.assign(lim=0.2 * (av.sum_q / av.n_q))
    j = lp.merge(av[["l_partkey", "lim"]], on="l_partkey", how="inner",
                 broadcast=True)
    small = j[j.l_quantity < j.lim]
    small = small.assign(p100=small.l_extendedprice * 100)
    return small.to_spark(index=False).agg(
        (F.sum("p100") / 100.0 / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n"))


def q22_rich_no_orders(spark, sf_dir):
    """TPC-H Q22-style: customers above the positive-balance average
    with no orders at all, rolled up by nation.  The average is a
    scalar aggregate pushed back as a literal; NOT EXISTS is the
    left-anti merge."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    c = pas.read_parquet(_t(sf_dir, "customer"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    avg_bal = c[c.c_acctbal > 0.0].c_acctbal.mean()
    rich = c[c.c_acctbal > avg_bal]
    noord = rich.merge(o[["o_custkey"]], left_on="c_custkey",
                       right_on="o_custkey", how="anti")
    noord = noord.assign(bal100=noord.c_acctbal * 100)
    out = noord.groupby("c_nationkey").agg(n=("c_custkey", "count"),
                                           bal100=("bal100", "sum"))
    sdf = out.to_spark()
    return sdf.select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.col("n").cast("long").alias("n_custs"),
        (F.col("bal100") / 100.0).alias("total_bal"))


def _li_pairs(pas, sf_dir):
    """partsupp surrogate: the DISTINCT (l_partkey, l_suppkey) pairs
    of lineitem — the testdata has no partsupp table, so the four
    partsupp-based TPC-H queries (Q2/Q11/Q16/Q20) adapt onto the
    pairs actually traded.  One fact scan + one hash-distinct
    shuffle; every downstream dim joins broadcast."""
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    return li[["l_partkey", "l_suppkey"]].drop_duplicates()


def q2_min_cost_supp(spark, sf_dir):
    """TPC-H Q2-style (adapted): for SMALL-type size-15 parts, the
    EUROPE supplier with the minimum account balance (the supplycost
    surrogate), ties kept like the SQL correlated-min.  Shape under
    test: correlated min subquery -> groupby + join-back, all dims
    broadcast."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    pairs = _li_pairs(pas, sf_dir)
    p = pas.read_parquet(_t(sf_dir, "part"))
    s = pas.read_parquet(_t(sf_dir, "supplier"))
    n = pas.read_parquet(_t(sf_dir, "nation"))
    p2 = p[(p.p_size == 15) & (p.p_type == "SMALL")][["p_partkey"]]
    sn = s.merge(n[n.n_regionkey == 3][["n_nationkey", "n_name"]],
                 left_on="s_nationkey", right_on="n_nationkey",
                 how="inner", broadcast=True)
    j = (pairs.merge(p2, left_on="l_partkey", right_on="p_partkey",
                     how="inner", broadcast=True)
         .merge(sn[["s_suppkey", "s_acctbal", "n_name"]],
                left_on="l_suppkey", right_on="s_suppkey",
                how="inner", broadcast=True))
    mn = (j.groupby("l_partkey").agg(min_bal=("s_acctbal", "min"))
          .reset_index())
    out = j.merge(mn, on="l_partkey", how="inner", broadcast=True)
    out = out[out.s_acctbal == out.min_bal]
    return out.to_spark(index=False).select(
        F.col("l_partkey").cast("long").alias("p_partkey"),
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        F.col("n_name"),
        F.col("s_acctbal"))


def q11_important_parts(spark, sf_dir):
    """TPC-H Q11-style (adapted): per-part traded value for nation-1
    suppliers, keeping parts above 0.1% of the total.  The threshold
    compares exact integer cents (value100 * 1000 > total100 in
    int64), so no float contract is needed; the scalar total is one
    aggregate pushed back as a literal."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    s = pas.read_parquet(_t(sf_dir, "supplier"))
    ls = li.merge(s[s.s_nationkey == 1][["s_suppkey"]],
                  left_on="l_suppkey", right_on="s_suppkey",
                  how="inner", broadcast=True)
    # round before the int64 cast: price*100 can land a hair under the
    # integer (double representation), and DuckDB's CAST rounds while
    # Spark's truncates — round(0) pins both to the same integer
    ls = ls.assign(p100=(ls.l_extendedprice * 100).round(0)
                   .astype("int64"))
    per = (ls.groupby("l_partkey").agg(value100=("p100", "sum"))
           .reset_index())
    # sum() of an EMPTY series is None (at sf0.001 no supplier has
    # nationkey 1) — the threshold degrades to 0 and Q11 is empty,
    # matching the oracle's no-rows result
    total100 = int(per.value100.sum() or 0)
    out = per[per.value100 * 1000 > total100]
    return out.to_spark(index=False).select(
        F.col("l_partkey").cast("long").alias("p_partkey"),
        (F.col("value100") / 100.0).alias("value"))


def q12_ship_priority(spark, sf_dir):
    """TPC-H Q12-style (adapted: l_linestatus stands in for shipmode,
    'late' means shipped more than 90 days after the order date —
    the testdata has no commit/receipt dates).  Fact×fact join +
    conditional aggregation, one shuffle."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    f = li[li.l_shipdate >= "1995-01-01"]
    f = f[f.l_shipdate < "1996-01-01"]
    j = f.merge(o[["o_orderkey", "o_orderdate", "o_orderpriority"]],
                left_on="l_orderkey", right_on="o_orderkey",
                how="inner")
    late = (j.l_shipdate.dt.epoch_day - j.o_orderdate.dt.epoch_day) > 90
    high = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    j = j.assign(high_late=(late & high) * 1,
                 low_late=(late & ~high) * 1)
    out = j.groupby("l_linestatus").agg(high_count=("high_late", "sum"),
                                        low_count=("low_late", "sum"))
    sdf = out.to_spark()
    return sdf.select(
        "l_linestatus",
        F.col("high_count").cast("long").alias("high_count"),
        F.col("low_count").cast("long").alias("low_count"))


def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16-style (adapted): distinct-supplier counts per part
    (brand, type, size) over the traded pairs, excluding one brand,
    the PROMO type, and negative-balance suppliers (the customer-
    complaints surrogate).  NOT-IN becomes a broadcast anti join;
    the count-distinct is the one shuffle."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    pairs = _li_pairs(pas, sf_dir)
    p = pas.read_parquet(_t(sf_dir, "part"))
    s = pas.read_parquet(_t(sf_dir, "supplier"))
    p2 = p[(p.p_brand != "Brand#13") & (p.p_type != "PROMO")
           & p.p_size.isin([1, 4, 9, 14, 19, 23, 36, 45])][
               ["p_partkey", "p_brand", "p_type", "p_size"]]
    bad = s[s.s_acctbal < 0.0][["s_suppkey"]]
    j = pairs.merge(p2, left_on="l_partkey", right_on="p_partkey",
                    how="inner", broadcast=True)
    j = j.merge(bad, left_on="l_suppkey", right_on="s_suppkey",
                how="anti", broadcast=True)
    out = (j.groupby(["p_brand", "p_type", "p_size"])
           .agg(supplier_cnt=("l_suppkey", "nunique")))
    sdf = out.to_spark()
    return sdf.select(
        "p_brand", "p_type",
        F.col("p_size").cast("long").alias("p_size"),
        F.col("supplier_cnt").cast("long").alias("supplier_cnt"))


def q20_promotable_supp(spark, sf_dir):
    """TPC-H Q20-style (adapted): suppliers who shipped more than half
    the per-supplier average 1995 quantity of some 'small%' part —
    availqty > 0.5*shipped becomes 2*pair_qty*n_pairs > part_total
    (exact int64, no division).  Nested semi-join shape: qualifying
    pairs -> distinct suppliers -> supplier dim semi join."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    p = pas.read_parquet(_t(sf_dir, "part"))
    s = pas.read_parquet(_t(sf_dir, "supplier"))
    small = p[p.p_name.str.startswith("small")][["p_partkey"]]
    f = li[li.l_shipdate >= "1995-01-01"]
    f = f[f.l_shipdate < "1996-01-01"]
    f = f.merge(small, left_on="l_partkey", right_on="p_partkey",
                how="inner", broadcast=True)
    f = f.assign(q=f.l_quantity.astype("int64"))
    pair = (f.groupby(["l_partkey", "l_suppkey"])
            .agg(pair_qty=("q", "sum")).reset_index())
    tot = (pair.groupby("l_partkey")
           .agg(part_total=("pair_qty", "sum"),
                n_pairs=("l_suppkey", "count")).reset_index())
    j = pair.merge(tot, on="l_partkey", how="inner", broadcast=True)
    qual = j[2 * j.pair_qty * j.n_pairs > j.part_total]
    out = (qual.groupby("l_suppkey")
           .agg(n_qual_parts=("l_partkey", "count")))
    sup = out.reset_index().merge(
        s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey",
        right_on="s_suppkey", how="inner", broadcast=True)
    return sup.to_spark(index=False).select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        F.col("s_nationkey").cast("long").alias("s_nationkey"),
        F.col("n_qual_parts").cast("long").alias("n_qual_parts"))


def q21_waiting_supp(spark, sf_dir):
    """TPC-H Q21-style (adapted: l_shipdate stands in for the missing
    commit/receipt dates): in finished multi-supplier orders, the
    supplier who UNIQUELY shipped last kept the order waiting.  The
    EXISTS/NOT-EXISTS pair becomes per-order aggregates joined back
    onto the pair table — two hash aggregates over one fact scan,
    one shuffle each."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    o = pas.read_parquet(_t(sf_dir, "orders"))
    # finished orders are a FACT-side slice, not a dim: semi join
    # (shuffle, AQE may still broadcast at runtime when it is small) —
    # broadcasting billions of orderkeys would not survive 100 TB
    fo = o[o.o_orderstatus == "F"][["o_orderkey"]]
    f = li.merge(fo, left_on="l_orderkey", right_on="o_orderkey",
                 how="semi")
    pair = (f.groupby(["l_orderkey", "l_suppkey"])
            .agg(pair_max=("l_shipdate", "max")).reset_index()
            .cache())  # three downstream branches reuse ONE fact scan
    per_o = (pair.groupby("l_orderkey")
             .agg(n_supp=("l_suppkey", "count"),
                  o_max=("pair_max", "max")).reset_index())
    j = pair.merge(per_o, on="l_orderkey", how="inner")
    latest = j[(j.pair_max == j.o_max) & (j.n_supp >= 2)]
    uniq = (latest.groupby("l_orderkey")
            .agg(n_latest=("l_suppkey", "count")).reset_index())
    w = latest.merge(uniq[uniq.n_latest == 1][["l_orderkey"]],
                     on="l_orderkey", how="inner")
    out = w.groupby("l_suppkey").agg(numwait=("l_orderkey", "count"))
    sdf = out.to_spark()
    return sdf.select(
        F.col("l_suppkey").cast("long").alias("s_suppkey"),
        F.col("numwait").cast("long").alias("numwait"))


def q_tpch_suite(spark, sf_dir):
    """ALL 22 TPC-H queries in adapted form — Q1/3/4/5/6/10/18/19 run
    as standalone driver rows, the other fourteen fold here in long
    (tag, k1, k2, a, b) form.  Q2/Q11/Q16/Q20 adapt partsupp onto the
    DISTINCT traded (part, supplier) pairs and Q12/Q21 adapt the
    missing commit/receipt dates onto l_shipdate vs o_orderdate, so
    every join/subquery SHAPE of the official suite is exercised over
    the columns the testdata has.  Every money aggregate uses the
    exact-integer-cents formulation (_assign_rev100 or int64 cents),
    so no leg needs a rounding contract."""
    _prep(spark)
    ns = F.lit(None).cast("double")

    q7 = q7_volume(spark, sf_dir).select(
        F.lit("q7").alias("tag"),
        F.concat_ws("-", F.col("supp_nation"), F.col("cust_nation"))
        .alias("k1"),
        F.col("year").cast("string").alias("k2"),
        F.col("revenue").alias("a"), ns.alias("b"))
    q8 = q8_market_share(spark, sf_dir).select(
        F.lit("q8").alias("tag"), F.lit("asia_promo").alias("k1"),
        F.col("year").cast("string").alias("k2"),
        F.col("nation_rev").alias("a"), F.col("total_rev").alias("b"))
    q9 = q9_profit(spark, sf_dir).select(
        F.lit("q9").alias("tag"), F.col("n_name").alias("k1"),
        F.col("year").cast("string").alias("k2"),
        F.col("profit").alias("a"), ns.alias("b"))
    q13 = q13_distribution(spark, sf_dir).select(
        F.lit("q13").alias("tag"), F.lit("orders").alias("k1"),
        F.col("n_orders").cast("string").alias("k2"),
        F.col("n_custs").cast("double").alias("a"), ns.alias("b"))
    q14 = q14_promo(spark, sf_dir).select(
        F.lit("q14").alias("tag"), F.lit("promo").alias("k1"),
        F.col("month").cast("string").alias("k2"),
        F.col("promo_rev").alias("a"), F.col("total_rev").alias("b"))
    q15 = q15_top_supplier(spark, sf_dir).select(
        F.lit("q15").alias("tag"), F.lit("supplier").alias("k1"),
        F.col("s_suppkey").cast("string").alias("k2"),
        F.col("revenue").alias("a"), ns.alias("b"))
    q17 = q17_small_qty(spark, sf_dir).select(
        F.lit("q17").alias("tag"), F.lit("brand").alias("k1"),
        F.lit("").alias("k2"), F.col("avg_yearly").alias("a"),
        F.col("n").cast("double").alias("b"))
    q22 = q22_rich_no_orders(spark, sf_dir).select(
        F.lit("q22").alias("tag"), F.lit("nation").alias("k1"),
        F.col("c_nationkey").cast("string").alias("k2"),
        F.col("total_bal").alias("a"),
        F.col("n_custs").cast("double").alias("b"))
    q2 = q2_min_cost_supp(spark, sf_dir).select(
        F.lit("q2").alias("tag"), F.col("n_name").alias("k1"),
        F.concat_ws("-", F.col("p_partkey").cast("string"),
                    F.col("s_suppkey").cast("string")).alias("k2"),
        F.col("s_acctbal").alias("a"), ns.alias("b"))
    q11 = q11_important_parts(spark, sf_dir).select(
        F.lit("q11").alias("tag"), F.lit("parts").alias("k1"),
        F.col("p_partkey").cast("string").alias("k2"),
        F.col("value").alias("a"), ns.alias("b"))
    q12 = q12_ship_priority(spark, sf_dir).select(
        F.lit("q12").alias("tag"), F.col("l_linestatus").alias("k1"),
        F.lit("late").alias("k2"),
        F.col("high_count").cast("double").alias("a"),
        F.col("low_count").cast("double").alias("b"))
    q16 = q16_supplier_cnt(spark, sf_dir).select(
        F.lit("q16").alias("tag"), F.col("p_brand").alias("k1"),
        F.concat_ws("/", F.col("p_type"),
                    F.col("p_size").cast("string")).alias("k2"),
        F.col("supplier_cnt").cast("double").alias("a"), ns.alias("b"))
    q20 = q20_promotable_supp(spark, sf_dir).select(
        F.lit("q20").alias("tag"), F.lit("supp").alias("k1"),
        F.col("s_suppkey").cast("string").alias("k2"),
        F.col("n_qual_parts").cast("double").alias("a"),
        F.col("s_nationkey").cast("double").alias("b"))
    q21 = q21_waiting_supp(spark, sf_dir).select(
        F.lit("q21").alias("tag"), F.lit("wait").alias("k1"),
        F.col("s_suppkey").cast("string").alias("k2"),
        F.col("numwait").cast("double").alias("a"), ns.alias("b"))
    return (q7.unionAll(q8).unionAll(q9).unionAll(q13).unionAll(q14)
            .unionAll(q15).unionAll(q17).unionAll(q22)
            .unionAll(q2).unionAll(q11).unionAll(q12).unionAll(q16)
            .unionAll(q20).unionAll(q21))


def q_window_topk(spark, sf_dir):
    """Window function: per-customer top-3 orders by totalprice."""
    from pyspark.sql import Window
    _prep(spark)
    o = spark.read.parquet(_t(sf_dir, "orders"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (o.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("o_custkey", "o_orderkey",
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    F.col("rk").cast("long").alias("rk")))


def q_distinct_count(spark, sf_dir):
    """distinct + exact/approx count-distinct per group."""
    _prep(spark)
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return (li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_orderkey").alias("n_orders"),
                 F.countDistinct("l_partkey").alias("n_parts")))


def q_explode_embedding(spark, sf_dir):
    """Series.explode (generator in-stage, no shuffle, no join) +
    ``Series.arr`` array-accessor legs (len/get/sum/norm — JVM-side
    higher-order expressions over the embedding column; the in-order
    left fold makes the double summation deterministic, so the DuckDB
    list_transform/list_sum oracle matches exactly)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    emb = pas.read_parquet(_t(sf_dir, "embeddings")).set_index("vec_id")
    e = emb.embedding
    # "+ 0.0" collapses IEEE signed zero everywhere a tiny negative
    # rounds to zero (Spark emits +0.0 where DuckDB keeps -0.0; first
    # seen on a sf0.1 element — same normalization as the cov leg)
    ex = e.explode().to_spark().select(
        F.lit("explode").alias("tag"), "vec_id",
        (F.round(F.col("embedding").cast("double"), 5)
         + F.lit(0.0)).alias("val"))

    def leg(tag, series, nd):
        return series.to_spark().select(
            F.lit(tag).alias("tag"), "vec_id",
            (F.round(F.col("embedding").cast("double"), nd)
             + F.lit(0.0)).alias("val"))

    return (ex
            .unionAll(leg("len", e.arr.len(), 1))
            .unionAll(leg("get0", e.arr.get(0), 5))
            .unionAll(leg("sum", e.arr.sum(), 4))
            .unionAll(leg("norm", e.arr.norm(), 4)))


def q_get_dummies(spark, sf_dir):
    """get_dummies one-hot encoding: fixed category domain -> pure
    codegen CASE columns, zero extra jobs; all three dummy sums fused
    into ONE aggregate pass (was three separate driver actions)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    d = pas.get_dummies(li.l_returnflag, prefix="rf",
                        categories=["A", "N", "R"])
    sdf = d.to_spark(index=False)
    return sdf.agg(F.sum("rf_A").cast("long").alias("rf_a"),
                   F.sum("rf_N").cast("long").alias("rf_n"),
                   F.sum("rf_R").cast("long").alias("rf_r"))


def q_sample_hash(spark, sf_dir):
    """Deterministic content-addressed sample: md5(key) top-60-bit
    bucket under frac — reproducible across engines (DuckDB computes
    the identical bucket, which is what the oracle checks); no RNG
    state, no sort.  NOT parquet-pushable and one string hash per row:
    the production-scale variant is ``sample(..., fast_hash=True)``
    (codegen'd xxhash64, Spark-only), measured separately in bench.py
    as ``sample_fast``."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders"))
    s = o.sample(0.1, key="o_orderkey")
    plain = s.to_spark(index=False).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total")).select(
        F.lit("plain").alias("tag"), "n", "total")
    # round-5 fold: sample_stratified (relational.py) — per-stratum
    # thresholds via one CASE over the same md5 bucket; thresholds are
    # the exact decimal products DuckDB's CAST computes (round-5
    # _hash_threshold pinning), so the boundary bucket agrees.
    st = o.sample_stratified({"1-URGENT": 0.5, "5-LOW": 0.1},
                             by="o_orderpriority", key="o_orderkey")
    strat = (st.to_spark(index=False)
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("o_totalprice"), 2).alias("total"))
             .select(F.concat(F.lit("strat:"),
                              F.col("o_orderpriority")).alias("tag"),
                     "n", "total"))
    return plain.unionAll(strat)


def q_asof_join(spark, sf_dir):
    """As-of join (operators/asof.py — union+window, ONE shuffle on the
    key, no range explosion): each event matched to the user's most
    recent order at or before the event time (events shifted onto the
    orders timeline).  Right side pre-aggregated to unique (key, time)
    for deterministic ties."""
    from pandas_alchemy_spark.ext.events import load_events
    from pandas_alchemy_spark.operators.asof import asof_join
    _prep(spark)
    ev = load_events(spark, _t(sf_dir, "events")).select(
        "event_id", "user_id",
        (F.col("ts") - F.expr("INTERVAL 23 YEARS")).alias("t"))
    od = (spark.read.parquet(_t(sf_dir, "orders"))
          .groupBy(F.col("o_custkey").alias("user_id"),
                   F.col("o_orderdate").alias("t"))
          .agg(F.max("o_totalprice").alias("tp")))
    j = asof_join(ev, od, on="t", by="user_id")
    return (j.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("tp").alias("matched"),
                 F.round(F.max("tp"), 2).alias("max_tp"),
                 F.round(F.min("tp"), 2).alias("min_tp")))


def q_where_replace(spark, sf_dir):
    """where (conditional keep) + replace (value mapping) composed into
    a grouped aggregate — both stay pure CASE projections feeding one
    shuffle."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    wq = li.l_quantity.where(li.l_quantity < 25, other=0.0)
    rf = li.l_returnflag.replace({"A": "AA", "R": "RR"})
    li2 = li.assign(wq=wq, rf=rf)
    out = li2.groupby("rf").agg(total=("wq", "sum"), n=("wq", "count"))
    sdf = out.to_spark()
    return sdf.select("rf", F.round("total", 2).alias("total"),
                      F.col("n").cast("long").alias("n"))


def q_cut_bins(spark, sf_dir):
    """cut (explicit-edge binning, CASE ladder) + group count per bin."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    b = pas.cut(li.l_quantity, [0, 10, 20, 30, 40, 50])
    out = (li.assign(bin=b).groupby("bin")
           .agg(n=("bin", "count"), avg_price=("l_extendedprice", "mean")))
    sdf = out.to_spark()
    return sdf.select("bin", F.col("n").cast("long").alias("n"),
                      F.round("avg_price", 2).alias("avg_price"))


def q_pct_change(spark, sf_dir):
    """Grouped pct_change: per-customer order-value change in orderkey
    order — one partitionBy window (the scalable flavor)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders")).set_index("o_orderkey")
    pct = o.groupby("o_custkey")["o_totalprice"].pct_change()
    return pct.to_spark().select(
        "o_orderkey", F.round(F.col("o_totalprice"), 6).alias("pct"))


def q_query_expr(spark, sf_dir):
    """DataFrame.query string predicate — compiled to a Spark SQL
    expression, pushdown-eligible like any mask."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    f = li.query("l_quantity < 10 and l_discount >= 0.05")
    out = f.groupby("l_returnflag").agg(n=("l_quantity", "count"),
                                        qty=("l_quantity", "sum"))
    sdf = out.to_spark()
    return sdf.select("l_returnflag",
                      F.col("n").cast("long").alias("n"),
                      F.round("qty", 2).alias("qty"))


def q_qcut_bins(spark, sf_dir):
    """qcut quantile binning: one exact-percentile pass for the edges,
    then a codegen CASE ladder; counts per code."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    b = pas.qcut(li.l_extendedprice, 4)
    out = (li.assign(qb=b).groupby("qb")
           .agg(n=("qb", "count"), avg_qty=("l_quantity", "mean")))
    sdf = out.to_spark()
    return sdf.select(F.col("qb").cast("long").alias("qb"),
                      F.col("n").cast("long").alias("n"),
                      F.round("avg_qty", 3).alias("avg_qty"))


def q_cohort_retention(spark, sf_dir):
    """Cohort/retention matrix over events (first-day cohorts ×
    day offsets) — two keyed aggregates + one join."""
    from pandas_alchemy_spark.ext.events import cohort_retention, load_events
    _prep(spark)
    ev = load_events(spark, _t(sf_dir, "events"))
    out = cohort_retention(ev)
    return out.select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_users")


def q_corr_matrix(spark, sf_dir):
    """df.corr() pairwise correlation matrix — all pairs fused into
    one aggregate pass."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    d = pas.read_parquet(_t(sf_dir, "lineitem"))[cols].corr()
    rows = [tuple([a] + [round(float(d.loc[a, b]), 6) for b in cols])
            for a in cols]
    return spark.createDataFrame(
        rows, "col string, l_quantity double, l_extendedprice double, "
              "l_discount double")


def q_interval_join(spark, sf_dir):
    """Interval join (operators/interval.py — tolerance-width bin
    band join, ONE shuffle, candidates bounded by 3x bin occupancy):
    pairs of same-user events within 120 s."""
    from pandas_alchemy_spark.ext.events import load_events
    from pandas_alchemy_spark.operators.interval import interval_join
    _prep(spark)
    ev = (load_events(spark, _t(sf_dir, "events"))
          .select("user_id", "event_id", F.unix_micros("ts").alias("t")))
    pairs = interval_join(ev, ev, on="t", tolerance=120_000_000,
                          by="user_id")
    pairs = pairs.filter(F.col("event_id") < F.col("event_id_r"))
    return (pairs.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.max(F.abs(F.col("t") - F.col("t_r")))
                 .alias("max_gap_us")))


def q_frame_reduce(spark, sf_dir):
    """DataFrame column-wise reductions (df.sum()/mean() -> Series):
    one aggregate pass over all columns."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    s = li[["l_quantity", "l_extendedprice", "l_discount"]].sum().to_pandas()
    m = li[["l_quantity", "l_extendedprice"]].mean().to_pandas()
    # round-5: axis=1 row reduction, exact-cents contract — the row
    # sums are 2-decimal values, so round(rs*100) is an exact int64
    rs = li[["l_quantity", "l_discount", "l_tax"]].sum(axis=1)
    row100 = rs.to_spark().agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .alias("rowsum100")).collect()[0]["rowsum100"]
    return spark.createDataFrame(
        [(round(float(s.iloc[0]), 2), round(float(s.iloc[1]), 2),
          round(float(s.iloc[2]), 2), round(float(m.iloc[0]), 3),
          round(float(m.iloc[1]), 2), int(row100))],
        "sum_qty double, sum_price double, sum_disc double, "
        "avg_qty double, avg_price double, rowsum100 bigint")


def q_stats_summary(spark, sf_dir):
    """Series statistical reductions (beyond-reference, SURVEY.md §8.2):
    exact quantile (linear interpolation, Spark `percentile`), median,
    corr/cov with full-outer index alignment, std — each a single
    JVM-side aggregate pass, no collect of data rows."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    q25 = li.l_quantity.quantile(0.25)
    med = li.l_quantity.median()
    q75 = li.l_quantity.quantile(0.75)
    corr = li.l_quantity.corr(li.l_extendedprice)
    cov = li.l_quantity.cov(li.l_extendedprice)
    sd = li.l_extendedprice.std()
    return spark.createDataFrame(
        [(round(q25, 4), round(med, 4), round(q75, 4),
          round(corr, 6), round(cov, 2), round(sd, 2))],
        "q25 double, med double, q75 double, corr double, "
        "cov double, sd double")


def q_moment_stats(spark, sf_dir):
    """Round-5 moment reductions: frame skew/kurt/sem with the pandas
    bias corrections (Spark population g1/g2 rescaled; DuckDB's
    skewness/kurtosis are ALREADY the sample-corrected forms, so the
    oracle reads them directly — the correction formulas must agree
    exactly for the hash to match) + Series.searchsorted (a fused
    counting aggregate, exact ints)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    fr = li[["l_quantity", "l_extendedprice"]]
    sk = fr.skew().to_pandas()
    ku = fr.kurt().to_pandas()
    se = fr.sem().to_pandas()
    ssl = li.l_quantity.searchsorted(25.0, side="left")
    ssr = li.l_quantity.searchsorted(25.0, side="right")
    return spark.createDataFrame(
        [(round(float(sk.iloc[0]), 6), round(float(sk.iloc[1]), 6),
          round(float(ku.iloc[0]), 6), round(float(se.iloc[1]), 4),
          int(ssl), int(ssr))],
        "skew_qty double, skew_price double, kurt_qty double, "
        "sem_price double, ss_left bigint, ss_right bigint")


def q_corr_scalars(spark, sf_dir):
    """Round-6 fold: DataFrame.corrwith (relational.py corrwith — one
    full-outer index-align join + ONE fused corr aggregate over every
    matching numeric column pair) and Series.autocorr (core.py autocorr
    — border-exchange shift composed with the bivariate corr
    aggregate).  Line-1 vs line-2 lineitem slices share the l_orderkey
    index but not its row set, so the outer alignment's NULL side is
    exercised (corr skips pairwise-incomplete rows in both engines)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    a = li[li.l_linenumber == 1].set_index(
        "l_orderkey")[["l_quantity", "l_extendedprice"]]
    b = li[li.l_linenumber == 2].set_index(
        "l_orderkey")[["l_quantity", "l_extendedprice"]]
    cw = a.corrwith(b).to_pandas()
    o = pas.read_parquet(_t(sf_dir, "orders")).set_index("o_orderkey")
    ac = float(o.o_totalprice.autocorr(1))
    return spark.createDataFrame(
        [(round(float(cw["l_quantity"]), 6),
          round(float(cw["l_extendedprice"]), 6),
          round(ac, 6))],
        "cw_qty double, cw_price double, ac1 double")


def q_idx_extrema(spark, sf_dir):
    """Series.idxmax/idxmin — max_by/min_by aggregates (one pass,
    map-side partial; no global sort)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    s = pas.read_parquet(_t(sf_dir, "orders")).set_index(
        "o_orderkey").o_totalprice
    return spark.createDataFrame(
        [(int(s.idxmax()), int(s.idxmin()))], "key_max long, key_min long")


def q_value_counts(spark, sf_dir):
    """Series.value_counts — groupBy + count, descending."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders"))
    vc = o.o_orderpriority.value_counts()
    return vc.to_spark().select(
        "o_orderpriority", F.col("count").cast("long").alias("n"))


def q_describe(spark, sf_dir):
    """DataFrame.describe — count/mean/std/min/quartiles/max for every
    numeric column in ONE Spark aggregate pass (materializer, like
    pandas)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))[
        ["l_quantity", "l_discount"]]
    d = li.describe()
    rows = [(stat, round(float(d.loc[stat, "l_quantity"]), 3),
             round(float(d.loc[stat, "l_discount"]), 3))
            for stat in d.index]
    return spark.createDataFrame(
        rows, "stat string, l_quantity double, l_discount double")


def q_iloc_slice(spark, sf_dir):
    """iloc positional row slice on a sorted frame — rowid range filter
    (no OFFSET scan, no collect)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders")).set_index("o_orderkey")
    part = o.sort_index().iloc[10:15, [0, 2]]
    sdf = part.to_spark()
    return sdf.select("o_orderkey", "o_custkey",
                      F.round("o_totalprice", 2).alias("o_totalprice"))


# ---------------------------------------------------------------------------
# events
# ---------------------------------------------------------------------------

def q_events_hourly(spark, sf_dir):
    """Hourly tumbling aggregate DENSIFIED onto the gap-free hour
    grid (ext/events.densify_time, round-5): empty (hour, type)
    buckets appear as zero rows — pandas resample semantics a plain
    groupBy cannot produce.  The grid is one exploded F.sequence
    crossed with the distinct types; the data side left-joins on
    (bucket, type)."""
    from pandas_alchemy_spark.ext import events
    _prep(spark)
    ev = events.load_events(spark, _t(sf_dir, "events"))
    out = events.tumbling_window_agg(ev)
    dense = events.densify_time(
        out.withColumnRenamed("window_start", "ts"), "ts", 3600,
        by="event_type", fill="zero")
    return dense.select(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n_events",
        F.round("sum_value", 4).alias("sum_value"), "n_users")


def q_sessionize(spark, sf_dir):
    from pandas_alchemy_spark.ext import events
    _prep(spark)
    ev = events.load_events(spark, _t(sf_dir, "events"))
    out = events.sessionize(ev, gap_minutes=30)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        "n_events", "sum_value")


def q_top_users(spark, sf_dir):
    from pandas_alchemy_spark.ext import events
    _prep(spark)
    ev = events.load_events(spark, _t(sf_dir, "events"))
    return events.top_users_by_value(ev, 10).select(
        "user_id", "total_value", "n_events",
        F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# dedup / similarity / text (pipeline extensions)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    from pandas_alchemy_spark.ext import dedup
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return dedup.exact_dedup(docs)


def q_dedup_minhash(spark, sf_dir):
    from pandas_alchemy_spark.ext import dedup
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    out = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                  threshold=0.4)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_cluster(spark, sf_dir):
    """Transitive near-dup clustering: MinHash-LSH pairs -> iterative
    min-label connected components (ext/dedup.py — O(diameter)
    rounds, each one edge-join + min-aggregate, no driver graph
    state).  Oracle: same pairs in SQL + a recursive-CTE transitive
    closure."""
    from pandas_alchemy_spark.ext import dedup
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    out = dedup.cluster_near_dups(docs, threshold=0.4, num_hashes=16,
                                  bands=4)
    return out.select(F.col("id"), F.col("component"),
                      F.col("keep").cast("boolean").alias("keep"))


def q_dedup_simhash(spark, sf_dir):
    from pandas_alchemy_spark.ext import dedup
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return dedup.simhash_pairs(docs, max_hamming=8).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def q_ngram_jaccard(spark, sf_dir):
    from pandas_alchemy_spark.ext import dedup
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    out = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_cosine_topk(spark, sf_dir):
    from pandas_alchemy_spark.ext import similarity
    _prep(spark)
    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    q = emb.filter("vec_id < 5")
    out = similarity.cosine_topk(emb, q, k=5)
    return out.select("query_id", "neighbor_id",
                      F.round("cosine", 4).alias("cosine"),
                      F.col("rank").cast("long").alias("rank"))


def q_lsh_ann(spark, sf_dir):
    """Approximate ANN (multi-table LSH) — no SQL oracle (approximate
    by design); driver records rows-only.  Recall is tested against
    brute force in tests/test_ext.py."""
    from pandas_alchemy_spark.ext import similarity
    _prep(spark)
    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    dim = len(emb.select("embedding").head(1)[0][0])
    q = emb.filter("vec_id < 5")
    out = similarity.lsh_topk(emb, q, k=5, dim=dim)
    return out.select("query_id", "neighbor_id",
                      F.round("cosine", 4).alias("cosine"))


def q_ivf_ann(spark, sf_dir):
    """Approximate ANN (IVF inverted-file cells) — no SQL oracle
    (approximate by design); driver records rows-only.  Recall tested
    against brute force in tests/test_ext.py.  Query cost scales with
    nprobe/nlist of the corpus instead of 1.0."""
    from pandas_alchemy_spark.ext import similarity
    _prep(spark)
    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    dim = len(emb.select("embedding").head(1)[0][0])
    q = emb.filter("vec_id < 5")
    # geometry pinned (incl. refine_iters=1) so the bench leg stays
    # round-over-round comparable; the r8 recall-honest defaults
    # (nlist/nprobe auto + tuner, refine 2) are exercised by the
    # recall-contract tests and the doc-scale artifact instead
    out = similarity.ivf_topk(emb, q, k=5, dim=dim, nlist=16, nprobe=6,
                              refine_iters=1)
    return out.select("query_id", "neighbor_id",
                      F.round("cosine", 4).alias("cosine"))


def q_emb_near_dup(spark, sf_dir):
    """Brute-force embedding near-dup pairs (exact; the LSH-bucketed
    variant is the scale path)."""
    from pandas_alchemy_spark.ext import similarity
    _prep(spark)
    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("va"),
                   similarity.norm_expr("embedding").alias("na"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("vb"),
                   similarity.norm_expr("embedding").alias("nb"))
    dot = similarity._DOT.format(a="va", b="vb")
    cos = F.expr(f"({dot}) / nullif(na * nb, 0.0)")
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cos.alias("c"))
            .filter(F.col("c") >= 0.45)
            .select("id_a", "id_b", F.round("c", 4).alias("cosine")))


def q_funnel(spark, sf_dir):
    """Ordered funnel (view -> click -> purchase): sequential
    conditional min-aggregates per user, one count row out."""
    from pandas_alchemy_spark.ext.events import funnel, load_events
    _prep(spark)
    ev = load_events(spark, _t(sf_dir, "events"))
    return funnel(ev, ["view", "click", "purchase"]).select(
        F.col("n_step0").cast("long").alias("n_step0"),
        F.col("n_step1").cast("long").alias("n_step1"),
        F.col("n_step2").cast("long").alias("n_step2"))


def q_top_terms(spark, sf_dir):
    """Corpus top-k term frequencies: explode -> one hash aggregate
    (map-side partial) -> top-k of the tiny aggregate."""
    from pandas_alchemy_spark.ext import text
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text.top_terms(docs, k=25).select(
        "term", F.col("tf").cast("long").alias("tf"))


def q_text_normalize(spark, sf_dir):
    """normalize_text: PII scrub + lowercase + whitespace collapse —
    one chained regexp_replace projection, codegen, no UDF."""
    from pandas_alchemy_spark.ext import text
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    out = text.normalize_text(docs)
    return out.select("doc_id", F.md5("norm_text").alias("h"),
                      F.length("norm_text").alias("n"))


def q_repetition(spark, sf_dir):
    """repetition_stats: Gopher-style per-document 2-gram repetition
    signals — pure array expressions, per-row CPU, no explode."""
    from pandas_alchemy_spark.ext import text
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    out = text.repetition_stats(docs, id_col="doc_id")
    return out.select("doc_id", "n_2grams", "n_distinct_2grams",
                      "top_2gram_count", "dup_2gram_frac")


def q_langid(spark, sf_dir):
    from pandas_alchemy_spark.ext import text
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    out = text.language_id(docs)
    return (out.groupBy("lang_pred")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("lang_score"), 6).alias("avg_score")))


def q_quality(spark, sf_dir):
    from pandas_alchemy_spark.ext import text
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    out = text.quality_score(docs)
    return out.select("doc_id", "q_n_chars", "q_n_tokens",
                      "q_mean_word_len", "q_punct_ratio",
                      "q_stopword_ratio", "q_score")


def q_token_stats(spark, sf_dir):
    from pandas_alchemy_spark.ext import text
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text.token_stats(docs).select("doc_id", "n_ws_tokens", "n_bpe_tokens")


def q_fingerprint(spark, sf_dir):
    from pandas_alchemy_spark.ext import text
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text.fingerprint(docs).select("doc_id", "fingerprint")


def q_frame_sample(spark, sf_dir):
    """Multimodal frame sampling (one-to-many mapInPandas): frames per
    media_type.  Deterministic stub fan-out (1 + md5[3] % 5 frames for
    temporal media) so the oracle reproduces it."""
    from pandas_alchemy_spark.ext import multimodal
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    frames = multimodal.sample_frames(multimodal.attach_fake_payload(docs))
    return (frames.groupBy("media_type")
            .agg(F.count(F.lit(1)).alias("n_frames"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.max("frame_idx").cast("long").alias("max_frame_idx")))


def q_multimodal_stats(spark, sf_dir):
    from pandas_alchemy_spark.ext import multimodal
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    dec = multimodal.decode_media(multimodal.attach_fake_payload(docs))
    return multimodal.media_stats(dec)


# ---------------------------------------------------------------------------
# folded suites — the driver checks the FIRST 50 queries() entries, so
# related micro-queries are combined (join on a shared key, union with a
# tag column, or cross-join of one-row aggregates).  Every underlying
# operator stays individually exercised and hash-checked; the fold only
# changes how the results are packaged.
# ---------------------------------------------------------------------------

def q_arith_ieee(spark, sf_dir):
    """Arithmetic suite in ONE lineitem pass: scalar mul/sub + round
    (rule 1/7), IEEE truediv (/0 -> ±inf, 0/0 -> NaN), IEEE floordiv,
    Python-sign mod — folds the former scalar_arith / ieee_div /
    ieee_floordiv / python_mod queries."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    rev = (li.l_extendedprice * (1 - li.l_discount)).round(4)
    d = li.l_quantity / (li.l_linenumber - 3)
    fd = li.l_quantity // (li.l_linenumber - 3)
    md = li.l_quantity % (li.l_linenumber - 3)
    out = li.assign(revenue=rev, dv=d, fd=fd, md=md)[
        ["l_orderkey", "l_linenumber", "revenue", "dv", "fd", "md"]]
    sdf = out.to_spark(index=False)

    def cls(c, inf=True):
        e = F.when(F.isnan(c), F.lit(_NAN_S))
        if inf:
            e = (e.when(c == float("inf"), F.lit(_INF_S))
                 .when(c == float("-inf"), F.lit(_NINF_S)))
        return e.otherwise(F.round(c, 6))

    return sdf.select("l_orderkey", "l_linenumber", "revenue",
                      cls(F.col("dv")).alias("div_val"),
                      cls(F.col("fd")).alias("fd_val"),
                      cls(F.col("md"), inf=False).alias("mod_val"))


def q_literal_frames(spark, sf_dir):
    """Literal-ingestion suite (union with a tag): Series.from_list +
    positional paste-join, DataFrame.from_pandas + scalar op,
    Series.add_prefix index rewrite."""
    _prep(spark)
    a = q_from_list_positional(spark, sf_dir)
    b = q_from_pandas_literal(spark, sf_dir)
    c = q_series_prefix(spark, sf_dir)
    nd = F.lit(None).cast("double")
    ns = F.lit(None).cast("string")
    return (a.select(F.lit("list").alias("tag"),
                     F.col("idx").cast("string").alias("key"),
                     F.col("v").alias("a"), nd.alias("b"), ns.alias("s"))
            .unionAll(b.select(F.lit("pandas").alias("tag"),
                               F.col("k").alias("key"),
                               F.col("v").alias("a"),
                               F.col("v2").alias("b"), ns.alias("s")))
            .unionAll(c.select(F.lit("prefix").alias("tag"),
                               F.col("idx").alias("key"),
                               nd.alias("a"), nd.alias("b"),
                               F.col("n_name").alias("s"))))


def q_align_suite(spark, sf_dir):
    """Alignment suite (union with a tag): Series+Series full-outer
    index join; DataFrame+DataFrame column-label alignment with NULL
    columns for unmatched labels.

    Round-5 fold: a ``cmb`` leg drives ``DataFrame.combine_first``
    (full-outer index join + coalesce per column) over two
    overlapping customer slices, and an ``eq`` leg pins
    ``DataFrame.equals`` (the mismatch-probe join) — equal rebuild
    -> 1.0, value-perturbed twin -> 0.0."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    a = q_align_add_outer(spark, sf_dir)
    b = q_col_align_nulls(spark, sf_dir)
    c = pas.read_parquet(_t(sf_dir, "customer"))
    lo = c[c.c_custkey < 1000].set_index("c_custkey")
    fa = lo.c_acctbal.where(lo.c_acctbal > 0).to_frame("bal")
    hi = c[c.c_custkey >= 500].set_index("c_custkey")
    fb = (hi.c_acctbal * 2).to_frame("bal")
    cmb = fa.combine_first(fb).reset_index()
    cmb_leg = cmb.to_spark(index=False).select(
        F.lit("cmb").alias("tag"),
        F.col("c_custkey").cast("string").alias("key"),
        F.round("bal", 2).alias("x"),
        F.lit(None).cast("double").alias("y"),
        F.lit(None).cast("double").alias("z"))
    lo2 = c[c.c_custkey < 1000].set_index("c_custkey")
    fa2 = lo2.c_acctbal.where(lo2.c_acctbal > 0).to_frame("bal")
    perturbed = (lo2.c_acctbal.where(lo2.c_acctbal > 0) + 1) \
        .to_frame("bal")
    e1 = fa.equals(fa2)
    e2 = fa.equals(perturbed)
    eq_leg = spark.createDataFrame(
        [("eq", "*", 1.0 if e1 else 0.0, 1.0 if e2 else 0.0, None)],
        "tag string, key string, x double, y double, z double")
    nd = F.lit(None).cast("double")
    return (a.select(F.lit("idx").alias("tag"),
                     F.col("o_custkey").cast("string").alias("key"),
                     F.col("total_both").alias("x"),
                     nd.alias("y"), nd.alias("z"))
            .unionAll(b.select(F.lit("col").alias("tag"),
                               F.col("l_returnflag").alias("key"),
                               "x", "y", "z"))
            .unionAll(cmb_leg).unionAll(eq_leg))


def q_positional_suite(spark, sf_dir):
    """Positional-access suite (union with a tag): nlargest+head,
    sorted tail via rowid predicate, .iat scalar, iloc row slice.

    Round-5 fold: an ``fscan`` leg drives the FUSED multi-column
    segmented scans (segscan.cum_scan_multi + shift_delta_scan_multi
    behind ``DataFrame.cumsum``/``DataFrame.shift``) — exact-cents
    running total (int64, no float contract needed) and a lagged
    custkey, sampled every 997th orderkey to keep the row budget."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    h = q_head_sorted(spark, sf_dir)
    t = q_tail_sorted(spark, sf_dir)
    i = q_iat_scalar(spark, sf_dir)
    s = q_iloc_slice(spark, sf_dir)
    o = pas.read_parquet(_t(sf_dir, "orders")).set_index("o_orderkey")
    fr = o[["o_custkey"]].assign(
        cents=(o.o_totalprice * 100).round(0).astype("long"))
    cum = fr.cumsum()["cents"]
    lagged = fr.shift(1)["o_custkey"]
    combined = cum.to_frame("cum").assign(lagged=lagged).reset_index()
    sampled = combined[combined["o_orderkey"] % 997 == 0]
    fs = sampled.to_spark(index=False).select(
        F.lit("fscan").alias("tag"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("lagged").cast("long").alias("o_custkey"),
        F.col("cum").cast("double").alias("o_totalprice"))
    nl = F.lit(None).cast("long")
    nd = F.lit(None).cast("double")
    return (h.select(F.lit("head").alias("tag"), F.col("o_orderkey"),
                     nl.alias("o_custkey"),
                     F.round("o_totalprice", 2).alias("o_totalprice"))
            .unionAll(t.select(F.lit("tail").alias("tag"),
                               "o_orderkey", "o_custkey",
                               nd.alias("o_totalprice")))
            .unionAll(i.select(F.lit("iat").alias("tag"), "o_orderkey",
                               nl.alias("o_custkey"), "o_totalprice"))
            .unionAll(s.select(F.lit("iloc").alias("tag"), "o_orderkey",
                               "o_custkey", "o_totalprice"))
            .unionAll(fs))


def q_customer_scalar(spark, sf_dir):
    """clip/round/abs + Series.rank joined on c_custkey (same customer
    grain, one result frame)."""
    _prep(spark)
    a = q_clip_round_abs(spark, sf_dir)
    b = q_series_rank(spark, sf_dir)
    return a.join(b, "c_custkey")


def q_flag_masks(spark, sf_dir):
    """Mask-composition suite — bool->int coercion, isin+between, and
    DataFrame.query, all grouped by l_returnflag and full-outer joined
    (isin keeps only A/R -> NULLs on the N row)."""
    _prep(spark)
    bc = q_bool_coercion(spark, sf_dir).select(
        "l_returnflag", "total_score", F.col("n").alias("n_bc"))
    ib = q_isin_between(spark, sf_dir).select(
        "l_returnflag", F.col("n").alias("n_ib"),
        F.col("qty").alias("qty_ib"))
    qe = q_query_expr(spark, sf_dir).select(
        "l_returnflag", F.col("n").alias("n_qe"),
        F.col("qty").alias("qty_qe"))
    return (bc.join(ib, "l_returnflag", "full")
            .join(qe, "l_returnflag", "full"))


def q_ewm_price(spark, sf_dir):
    """Grouped EWM mean (groupby().ewm().mean() → operators/scan.
    ewm_mean_grouped): per-customer exponential smoothing of order
    totals as JVM window running sums, no UDF.  round(2) contract:
    DuckDB evaluates window sums with a segment tree, so the last ulp
    differs from Spark's sequential accumulation."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders")).set_index("o_orderkey")
    e = o.groupby("o_custkey")["o_totalprice"].ewm(alpha=0.25).mean()
    sdf = e.to_spark()
    val = sdf.columns[-1]
    return sdf.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.round(F.col(val), 2).alias("ewm_price"))


def q_window_suite(spark, sf_dir):
    """Analytic-window suite on o_orderkey: grouped cumsum, global
    rolling(3).sum, grouped pct_change, grouped ewm mean, plus the
    round-5 border-scan legs — global shift(2), diff(3), and
    masked-price ffill (operators/segscan border exchange; no
    single-partition window anywhere in the suite).

    The two lineage-carrying grouped legs inline into one projection;
    the global legs are segmented scans that join back on the index
    (the distributed-by-default trade documented in
    operators/analytic.SeriesWindow)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders")).set_index("o_orderkey")
    g = o.groupby("o_custkey")["o_totalprice"]
    price = o["o_totalprice"]
    masked = price.where(price >= 50000.0)
    # round-5 continuation legs: global + grouped linear interpolation
    # (raw-double bit-exact contract — the fill expression tree is
    # pinned to the oracle's) and global percentile rank (exact-int
    # division, also raw double)
    m = o.assign(mprice=masked)
    itpg = m.groupby("o_custkey")["mprice"].interpolate()
    # round-5 third-session leg: grouped rolling PAIR corr
    # (F.corr window expression, pairwise-complete min_periods gate);
    # Spark's zero-variance corr is NaN where DuckDB's is NULL, so
    # the NaN normalizes to NULL below
    o2 = o.assign(eday=o.o_orderdate.dt.epoch_day)
    rco = o2.groupby("o_custkey")["o_totalprice"] \
        .rolling(3).corr("eday")
    combined = o.assign(cum=g.cumsum(),
                        roll=price.rolling(3).sum(),
                        pct=g.pct_change(),
                        sh=price.shift(2),
                        dif=price.diff(3),
                        fwd=masked.ffill(),
                        fwdl=masked.ffill(limit=2),
                        itp=masked.interpolate(),
                        itpg=itpg,
                        rpct=price.rank(method="min", pct=True),
                        rmed=price.rolling(5).median(),
                        rco=rco,
                        # round-6 legs: the window sub-surface verbs
                        # (border-exchange scans with pandas kernels)
                        rsem=price.rolling(5).sem(),
                        rskw=price.rolling(7).skew())
    core = combined.to_spark().select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.round("cum", 2).alias("cum_total"),
        F.round("roll", 2).alias("roll_sum"),
        F.round("pct", 6).alias("pct"),
        F.round("sh", 2).alias("sh"),
        F.round("dif", 2).alias("dif"),
        F.round("fwd", 2).alias("fwd"),
        # round-6 leg: global fill with limit= ((value, age) carry);
        # the SQL twin for limit=2 is coalesce over two lags
        F.round("fwdl", 2).alias("fwdl"),
        F.col("itp"),
        F.col("itpg"),
        F.col("rpct"),
        # odd window -> the median IS a data value: raw-double exact
        F.col("rmed"),
        F.when(F.isnan("rco"), F.lit(None).cast("double"))
        .otherwise(F.round("rco", 6)).alias("rco"),
        # sem is O(price): round(2) keeps 7 significant digits while
        # staying clear of the last-ulp accumulation divergence that
        # round(6) exposed at sf0.1 (97 boundary rows)
        F.round("rsem", 2).alias("rsem"),
        F.round("rskw", 6).alias("rskw"))
    d = q_ewm_price(spark, sf_dir)
    # (ewm.sum stays differential-tested rather than driver-folded:
    # the pow-trick SQL twin's accumulation error (~1e-8 relative at
    # 1e5 magnitudes) makes every rounding contract flaky for the
    # SUM, where the weight constants don't cancel as they do in the
    # mean — measured 20/1500 last-cent flips at round(2))
    return core.join(d, "o_orderkey")


def q_reshape_suite(spark, sf_dir):
    """pivot_table + df.corr() (union with a tag; both small grouped
    matrices with three value columns)."""
    _prep(spark)
    p = q_pivot_table(spark, sf_dir)
    c = q_corr_matrix(spark, sf_dir)
    return (p.select(F.lit("pivot").alias("tag"),
                     F.col("l_linestatus").alias("key"),
                     F.col("qty_a").alias("a"), F.col("qty_n").alias("b"),
                     F.col("qty_r").alias("c"))
            .unionAll(c.select(F.lit("corr").alias("tag"),
                               F.col("col").alias("key"),
                               F.col("l_quantity").alias("a"),
                               F.col("l_extendedprice").alias("b"),
                               F.col("l_discount").alias("c"))))


def q_dup_stats(spark, sf_dir):
    """duplicated with ALL THREE keeps over an o_orderkey-indexed frame
    (index order makes first/last deterministic): counts plus the sum
    of marked index labels — first and last mark different rows, so the
    sums differ while the counts agree."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    o = pas.read_parquet(_t(sf_dir, "orders")).set_index("o_orderkey")
    first = o.duplicated(subset=["o_custkey"], keep="first")
    last = o.duplicated(subset=["o_custkey"], keep="last")
    allk = o.duplicated(subset=["o_custkey"], keep=False)
    f = first.to_spark().agg(
        F.sum(F.col("value").cast("long")).alias("n_dup_first"),
        F.sum(F.when(F.col("value"), F.col("o_orderkey")))
        .cast("long").alias("sum_dup_first"))
    la = last.to_spark().agg(
        F.sum(F.when(F.col("value"), F.col("o_orderkey")))
        .cast("long").alias("sum_dup_last"))
    al = allk.to_spark().agg(
        F.sum(F.col("value").cast("long")).alias("n_dup_all"))
    return (f.coalesce(1).crossJoin(la.coalesce(1))
            .crossJoin(al.coalesce(1)))


def q_scalar_suite(spark, sf_dir):
    """One-row reductions cross-joined into a single wide row:
    isna/fill counts, concat-union aggregate, get_dummies sums,
    deterministic hash sample, idxmax/idxmin, duplicated keeps,
    DataFrame column reductions, Series statistics."""
    _prep(spark)
    fi = q_fill_isna(spark, sf_dir)
    cu = q_concat_union(spark, sf_dir).select(
        "n_rows", "n_price", "n_cust",
        F.col("sum_price").alias("sum_price_cat"))
    gd = q_get_dummies(spark, sf_dir)
    # sample legs (plain + round-5 stratified) pivot into wide columns
    # via conditional aggregation — one pass over the tagged union
    sa = q_sample_hash(spark, sf_dir).agg(
        F.max(F.when(F.col("tag") == "plain", F.col("n")))
        .alias("n_sample"),
        F.max(F.when(F.col("tag") == "plain", F.col("total")))
        .alias("total_sample"),
        F.max(F.when(F.col("tag") == "strat:1-URGENT", F.col("n")))
        .alias("n_strat_urgent"),
        F.max(F.when(F.col("tag") == "strat:1-URGENT", F.col("total")))
        .alias("total_strat_urgent"),
        F.max(F.when(F.col("tag") == "strat:5-LOW", F.col("n")))
        .alias("n_strat_low"),
        F.max(F.when(F.col("tag") == "strat:5-LOW", F.col("total")))
        .alias("total_strat_low"))
    ie = q_idx_extrema(spark, sf_dir)
    du = q_dup_stats(spark, sf_dir)
    fr = q_frame_reduce(spark, sf_dir)
    st = q_stats_summary(spark, sf_dir)
    mo = q_moment_stats(spark, sf_dir)
    cs = q_corr_scalars(spark, sf_dir)
    # every part is a one-row aggregate; coalesce(1) before the cross
    # joins or the product of shuffle partitions fans out into
    # thousands of empty tasks
    out = fi.coalesce(1)
    for part in (cu, gd, sa, ie, du, fr, st, mo, cs):
        out = out.crossJoin(part.coalesce(1))
    return out


def q_bins_suite(spark, sf_dir):
    """cut (explicit edges) + qcut (quantile edges), union with a tag."""
    _prep(spark)
    c = q_cut_bins(spark, sf_dir)
    q = q_qcut_bins(spark, sf_dir)
    return (c.select(F.lit("cut").alias("tag"), F.col("bin"),
                     F.col("n"), F.col("avg_price").alias("metric"))
            .unionAll(q.select(F.lit("qcut").alias("tag"),
                               F.col("qb").cast("string").alias("bin"),
                               F.col("n"), F.col("avg_qty").alias("metric"))))


def q_vc_describe(spark, sf_dir):
    """value_counts + describe + categorical codes + JSON extraction,
    unioned with tags.  The cat leg covers ``Series.cat``
    (``astype("category")`` -> ``.cat.codes`` assigned back through the
    index-aligned assign path); the json leg covers
    ``pas.json_extract`` (Spark ``get_json_object``) on the real JSON
    column ``events.props``."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    v = q_value_counts(spark, sf_dir)
    d = q_describe(spark, sf_dir)
    cust = pas.read_parquet(_t(sf_dir, "customer"))
    codes = cust.c_mktsegment.astype("category").cat.codes
    # assign onto the lineage ROOT: the codes expression inlines into
    # the scan projection (no alignment join — tests/test_plans.py
    # asserts zero exchanges before the aggregate)
    cf = cust.assign(code=codes)[["c_mktsegment", "code"]]
    cat = (cf.groupby("c_mktsegment")
           .agg(code=("code", "max"), n=("c_mktsegment", "count"))
           .to_spark())
    ev = pas.read_parquet(_t(sf_dir, "events"))
    k = pas.json_extract(ev.props, "$.k").astype("int64")
    jf = ev.assign(k=k)[["event_type", "k"]]
    js = (jf.groupby("event_type")
          .agg(sk=("k", "sum"), nk=("k", "count")).to_spark())
    # round-6 fold: pas.to_numeric (relational.py to_numeric — one
    # try_cast projection; 'raise' adds a bounded LIMIT-1 probe).
    # Priority first-digits all parse; order statuses never do, so
    # the coerce -> NULL path shows up as count 0.
    o6 = pas.read_parquet(_t(sf_dir, "orders"))
    d6 = pas.to_numeric(o6.o_orderpriority.str.slice(0, 1))
    c6 = pas.to_numeric(o6.o_orderstatus, errors="coerce")
    f6 = o6.assign(d=d6, c=c6)
    tn = (f6.groupby("o_orderpriority")
          .agg(a=("d", "sum"), nc=("c", "count")).to_spark())
    leg_tn = tn.select(F.lit("tonum").alias("tag"),
                       F.col("o_orderpriority").alias("key"),
                       F.col("a").cast("double").alias("a"),
                       F.col("nc").cast("double").alias("b"))
    # round-6 fold: Series.factorize (relational.py factorize — the
    # documented driver-side materializer).  sort_index() pins the
    # export order (named-index frames are NOT client-sorted at
    # fetch, so without it first-appearance order would be scan
    # order — nondeterministic under repartitioning); codes then
    # follow c_custkey order, so code(segment) = rank of
    # min(c_custkey) per segment and the literal rows re-ingest.
    codes6, uniq6 = (cust.set_index("c_custkey").c_mktsegment
                     .sort_index().factorize())
    rows6 = [("fact", str(u), float(c),
              float(int((codes6 == c).sum())))
             for c, u in enumerate(uniq6)]
    leg_fc = spark.createDataFrame(
        rows6, "tag string, key string, a double, b double")
    return (v.select(F.lit("vc").alias("tag"),
                     F.col("o_orderpriority").alias("key"),
                     F.col("n").cast("double").alias("a"),
                     F.lit(None).cast("double").alias("b"))
            .unionAll(d.select(F.lit("describe").alias("tag"),
                               F.col("stat").alias("key"),
                               F.col("l_quantity").alias("a"),
                               F.col("l_discount").alias("b")))
            .unionAll(cat.select(F.lit("cat").alias("tag"),
                                 F.col("c_mktsegment").alias("key"),
                                 F.col("code").cast("double").alias("a"),
                                 F.col("n").cast("double").alias("b")))
            .unionAll(js.select(F.lit("json").alias("tag"),
                                F.col("event_type").alias("key"),
                                F.col("sk").cast("double").alias("a"),
                                F.col("nk").cast("double").alias("b")))
            .unionAll(_hll_error_leg(spark, sf_dir))
            .unionAll(_grouped_quantile_leg(spark, sf_dir))
            .unionAll(leg_tn).unionAll(leg_fc))


def _grouped_quantile_leg(spark, sf_dir):
    """Round-5 fold: ``GroupBy.quantile`` gets hashed driver rows.
    q=0.25/0.75 over the INTEGER-valued l_quantity makes the linear
    interpolation exact regardless of each engine's expression tree
    (quarter-integers are dyadic — every term is an exact double), so
    the contract needs no rounding."""
    import pandas_alchemy_spark as pas
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    sub = li[["l_returnflag", "l_quantity"]]
    q25 = sub.groupby("l_returnflag").quantile(0.25).to_spark()
    q75 = sub.groupby("l_returnflag").quantile(0.75).to_spark()
    return (q25.select("l_returnflag",
                       F.col("l_quantity").alias("q25"))
            .join(q75.select("l_returnflag",
                             F.col("l_quantity").alias("q75")),
                  "l_returnflag")
            .select(F.lit("gq").alias("tag"),
                    F.col("l_returnflag").alias("key"),
                    F.col("q25").alias("a"), F.col("q75").alias("b")))


def _hll_error_leg(spark, sf_dir):
    """Round-5 fold: the ``Series.nunique(approx=True)`` HLL path gets
    a hash-checkable contract the way ann_suite's recall did — the
    approximate value itself is approximate BY CONTRACT, so the leg
    emits (exact nunique, error-bucket) where the bucket asserts
    |approx - exact| / exact < 0.05 (HLL++ at rsd=0.02 is
    deterministic for fixed data, so the bucket is stable) and the
    oracle pins the exact count plus the expected bucket."""
    import pandas_alchemy_spark as pas
    o = pas.read_parquet(_t(sf_dir, "orders"))
    exact = int(o.o_custkey.nunique())
    approx = int(o.o_custkey.nunique(approx=True, rsd=0.02))
    ok = 1.0 if abs(approx - exact) / exact < 0.05 else 0.0
    return spark.createDataFrame(
        [("hll", "o_custkey", float(exact), ok)],
        "tag string, key string, a double, b double")


def q_unstack_multi(spark, sf_dir):
    """Multi-data-column unstack: (flag, status)-grouped sums pivoted
    on the status level -> pandas-style (label, value) tuple columns,
    one pivot pass for both measures."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    g = li.groupby(["l_returnflag", "l_linestatus"]).agg(
        qty=("l_quantity", "sum"), price=("l_extendedprice", "sum"))
    u = g.unstack(level=-1, level_values=["F", "O"])
    sdf = u.to_spark()
    cols = {str(lab): lab for lab in u.columns}
    sel = [F.col("l_returnflag")]
    for lab_s, lab in sorted(cols.items()):
        alias = f"{lab[0]}_{lab[1].lower()}"
        sel.append(F.round(F.col(f"`{lab_s}`"), 2).alias(alias))
    return sdf.select(*sel)


def q_reshape2_suite(spark, sf_dir):
    """Second reshape suite in long (tag, key, col, val) form:
    df.stack (relational.py stack — generator reshape over an assigned
    computed column), pas.crosstab (one groupBy().pivot() pass with an
    explicit pivot domain), the pairwise covariance matrix (all cells
    fused into ONE aggregate pass, relational.py cov), and the folded
    multi-measure unstack leg (q_unstack_multi)."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    # stack: (nationkey, variable) -> value
    n = pas.read_parquet(_t(sf_dir, "nation")).set_index(
        "n_nationkey")[["n_regionkey"]]
    n = n.assign(x=n.n_regionkey * 2.0)
    st = n.stack().to_spark()
    key_col, var_col, val_col = st.columns
    leg_stack = st.select(
        F.lit("stack").alias("tag"),
        F.col(key_col).cast("string").alias("key"),
        F.col(var_col).cast("string").alias("col"),
        F.col(val_col).cast("double").alias("val"))
    # crosstab: priority x status counts, zero-filled
    o = pas.read_parquet(_t(sf_dir, "orders"))
    ct = pas.crosstab(o.o_orderpriority, o.o_orderstatus,
                      columns_values=["F", "O", "P"]).to_spark()
    leg_ct = ct.selectExpr(
        "'crosstab' as tag", "o_orderpriority as key",
        "stack(3, 'F', F, 'O', O, 'P', P) as (col, val)"
    ).select("tag", "key", "col", F.col("val").cast("double").alias("val"))
    # cov: 3x3 matrix -> long form (materializer, literal re-ingest)
    li = pas.read_parquet(_t(sf_dir, "lineitem"))
    cm = li[["l_quantity", "l_extendedprice", "l_discount"]].cov()
    cells = [(str(r), str(c), float(cm.loc[r, c]))
             for r in cm.index for c in cm.columns]
    # "+ 0.0" collapses IEEE signed zero: cov(discount, quantity) is a
    # tiny negative that DuckDB rounds to -0.0 while Spark yields +0.0.
    leg_cov = (spark.createDataFrame(cells, "key string, col string, val double")
               .select(F.lit("cov").alias("tag"), "key", "col",
                       (F.round("val", 2) + F.lit(0.0)).alias("val")))
    # folded unstack leg
    u = q_unstack_multi(spark, sf_dir)
    leg_un = u.selectExpr(
        "'unstack' as tag", "l_returnflag as key",
        "stack(4, 'price_f', price_f, 'price_o', price_o, "
        "'qty_f', qty_f, 'qty_o', qty_o) as (col, val)")
    # round-6 fold: pas.json_normalize (relational.py json_normalize —
    # one from_json + struct expansion, codegen, no UDF) on the real
    # events.props JSON column.  'm' is deliberately absent from the
    # documents so the missing-field -> NULL path is covered.
    ev = pas.read_parquet(_t(sf_dir, "events"))
    sub9 = ev[ev.event_id < 50].set_index("event_id")
    jn = pas.json_normalize(sub9.props, "k INT, m STRING").to_spark()
    leg_jn = jn.selectExpr(
        "'jsonn' as tag", "CAST(event_id AS STRING) as key",
        "stack(2, 'k', CAST(k AS DOUBLE), 'm', CAST(m AS DOUBLE)) "
        "as (col, val)")
    # round-6 fold: pas.wide_to_long (relational.py wide_to_long —
    # one explode over a struct array, no shuffle) applied to the
    # unstack leg's wide frame through the from_spark bridge.
    wide = pas.from_spark(u)
    w2l = pas.wide_to_long(wide, ["qty", "price"], i="l_returnflag",
                           j="status", sep="_").to_spark()
    leg_w2 = w2l.selectExpr(
        "'w2l' as tag", "l_returnflag as key",
        "stack(2, 'qty_' || status, qty, 'price_' || status, price) "
        "as (col, val)")
    return (leg_stack.unionAll(leg_ct).unionAll(leg_cov)
            .unionAll(leg_un).unionAll(leg_jn).unionAll(leg_w2))


def q_join_suite(spark, sf_dir):
    """Index-verb suite in long (tag, key, a, b) form: DataFrame.join
    on the index (relational.py join), groupby transform (window
    broadcast-back), index-aligned assign from ANOTHER frame
    (core._assign_aligned), .loc label slice (inclusive range filter),
    and the folded drop(axis=0) label anti-filter leg."""
    import pandas_alchemy_spark as pas
    _prep(spark)
    cust = pas.read_parquet(_t(sf_dir, "customer"))
    orders = pas.read_parquet(_t(sf_dir, "orders"))
    nation = pas.read_parquet(_t(sf_dir, "nation"))
    c = cust[cust.c_custkey < 200].set_index("c_custkey")[["c_acctbal"]]
    # 1. join on index: per-customer acctbal + order totals
    ot = orders.groupby("o_custkey").agg(total=("o_totalprice", "sum"))
    j = c.join(ot, how="left").to_spark()
    leg_join = j.select(
        F.lit("join").alias("tag"),
        F.col("c_custkey").cast("long").alias("key"),
        F.round("c_acctbal", 2).alias("a"), F.round("total", 2).alias("b"))
    # 2. groupby transform: group sum broadcast onto member rows.
    # "sum" (not "mean") on purpose: group means of 2-decimal money over
    # size-2 groups land exactly on half-cents, where Spark's round
    # (shortest-decimal HALF_UP) and DuckDB's (binary) disagree; sums of
    # 2-decimal values are exact cents, so round(.,2) is engine-stable.
    o5 = orders[orders.o_orderkey < 500].set_index("o_orderkey")
    m = o5.groupby("o_custkey")["o_totalprice"].transform("sum")
    t = o5.assign(m=m).to_spark()
    leg_tr = t.select(
        F.lit("transform").alias("tag"),
        F.col("o_orderkey").cast("long").alias("key"),
        F.round("o_totalprice", 2).alias("a"), F.round("m", 2).alias("b"))
    # 3. index-aligned assign from another frame (left-join alignment)
    cnt = orders.groupby("o_custkey").agg(n=("o_orderkey", "count"))
    a3 = c.assign(n_orders=cnt.n).to_spark()
    leg_as = a3.select(
        F.lit("assign").alias("tag"),
        F.col("c_custkey").cast("long").alias("key"),
        F.round("c_acctbal", 2).alias("a"),
        F.col("n_orders").cast("double").alias("b"))
    # 4. loc label slice (inclusive on both ends, like pandas)
    l4 = cust.set_index("c_custkey").loc[50:100].to_spark()
    leg_loc = l4.select(
        F.lit("loc").alias("tag"),
        F.col("c_custkey").cast("long").alias("key"),
        F.round("c_acctbal", 2).alias("a"),
        F.lit(None).cast("double").alias("b"))
    # 5. folded drop(axis=0) leg: NOT IN label anti-filter
    d5 = nation.set_index("n_nationkey").drop(index=[0, 5, 10]).to_spark()
    leg_dr = d5.select(
        F.lit("drop").alias("tag"),
        F.col("n_nationkey").cast("long").alias("key"),
        F.col("n_regionkey").cast("double").alias("a"),
        F.lit(None).cast("double").alias("b"))
    # 6. round-5 fold: module-level pas.merge (inner, asymmetric key
    # names — __init__.merge delegating to DataFrame.merge)
    cm = cust[cust.c_custkey < 200][["c_custkey", "c_acctbal"]]
    cnt6 = (orders.groupby("o_custkey")
            .agg(n=("o_orderkey", "count")).reset_index())
    m6 = pas.merge(cm, cnt6, left_on="c_custkey",
                   right_on="o_custkey", how="inner").to_spark(index=False)
    leg_mg = m6.select(
        F.lit("merge").alias("tag"),
        F.col("c_custkey").cast("long").alias("key"),
        F.round("c_acctbal", 2).alias("a"),
        F.col("n").cast("double").alias("b"))
    # 7. round-5 fold: pas.from_spark interop bridge — wrap a raw
    # Spark DataFrame (with an index column promoted) and run engine
    # verbs on it
    raw = (spark.read.parquet(_t(sf_dir, "orders"))
           .where(F.col("o_orderkey") < 300)
           .select("o_orderkey", "o_totalprice"))
    fdf = pas.from_spark(raw, index=["o_orderkey"])
    f7 = fdf.assign(dbl=fdf.o_totalprice * 2).to_spark()
    leg_fs = f7.select(
        F.lit("from_spark").alias("tag"),
        F.col("o_orderkey").cast("long").alias("key"),
        F.round("o_totalprice", 2).alias("a"),
        F.round("dbl", 2).alias("b"))
    # 8. round-6 fold: pas.merge_ordered (relational.py merge_ordered
    # — ordered outer merge + fused multi-column ffill in merged key
    # order).  Left = orders < 400; right = the line-3 rows < 800,
    # so each side has keys the other lacks and the ffill crosses
    # both hole patterns.  Keys are unique per side (ffill over
    # duplicate keys would be order-ambiguous).
    li8 = pas.read_parquet(_t(sf_dir, "lineitem"))
    l8 = orders[orders.o_orderkey < 400][["o_orderkey", "o_totalprice"]]
    r8 = (li8[(li8.l_linenumber == 3) & (li8.l_orderkey < 800)]
          .groupby("l_orderkey").agg(l_quantity=("l_quantity", "max"))
          .reset_index()
          .rename(columns={"l_orderkey": "o_orderkey"}))
    m8 = pas.merge_ordered(l8, r8, on="o_orderkey", how="outer",
                           fill_method="ffill").to_spark(index=False)
    leg_mo = m8.select(
        F.lit("mord").alias("tag"),
        F.col("o_orderkey").cast("long").alias("key"),
        F.round("o_totalprice", 2).alias("a"),
        F.round("l_quantity", 2).alias("b"))
    # 9. round-6 fold: pas.sql — the raw-SQL escape hatch
    # (__init__.sql: engine frames register as temp views, the query
    # plans through Catalyst, the result wraps back into the façade)
    s9 = pas.sql(
        "SELECT o.o_custkey AS key, count(*) AS n, "
        "round(sum(o.o_totalprice), 2) AS total "
        "FROM osql o JOIN csql c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_custkey < 120 GROUP BY o.o_custkey",
        osql=orders, csql=cust)
    leg_sq = s9.to_spark(index=False).select(
        F.lit("sqlq").alias("tag"),
        F.col("key").cast("long").alias("key"),
        F.col("total").alias("a"),
        F.col("n").cast("double").alias("b"))
    return (leg_join.unionAll(leg_tr).unionAll(leg_as)
            .unionAll(leg_loc).unionAll(leg_dr)
            .unionAll(leg_mg).unionAll(leg_fs).unionAll(leg_mo)
            .unionAll(leg_sq))


def q_top_users_funnel(spark, sf_dir):
    """top-k users by value + 3-step ordered funnel (union with a
    tag; funnel counts ride in the n_events column)."""
    _prep(spark)
    t = q_top_users(spark, sf_dir)
    f = q_funnel(spark, sf_dir)
    nl = F.lit(None).cast("long")
    nd = F.lit(None).cast("double")
    f3 = f.selectExpr(
        "stack(3, 'funnel0', n_step0, 'funnel1', n_step1, "
        "'funnel2', n_step2) as (tag, n_events)")
    return (t.select(F.lit("top").alias("tag"), F.col("user_id"),
                     F.col("total_value"), F.col("n_events"),
                     F.col("rank"))
            .unionAll(f3.select("tag", nl.alias("user_id"),
                                nd.alias("total_value"), "n_events",
                                nl.alias("rank"))))


def q_text_suite(spark, sf_dir):
    """All five document-grain text operators joined on doc_id:
    normalize+PII scrub, 2-gram repetition stats, quality score,
    token stats, fingerprint.  (Folded from the former text_doc +
    text_quality entries to stay inside the driver's 50-entry
    correctness window.)

    The four projection-only legs CHAIN on one frame — every ext.text
    transform is `select("*", …)` — so the whole scalar side is a
    single scan + single codegen projection; only the 2-gram
    repetition agg (explode + hash-agg, the codegen-fast form) needs
    its own pass.  2 scans of documents total, vs 5 when each leg
    re-reads (the join-of-subqueries shape the driver legs use
    individually)."""
    from pandas_alchemy_spark.ext import text
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    base = text.normalize_text(docs)
    base = text.quality_score(base)
    base = text.token_stats(base)
    base = text.fingerprint(base)
    scalar = base.select(
        "doc_id", F.md5("norm_text").alias("h"),
        F.length("norm_text").alias("n"),
        "q_n_chars", "q_n_tokens", "q_mean_word_len", "q_punct_ratio",
        "q_stopword_ratio", "q_score", "n_ws_tokens", "n_bpe_tokens",
        "fingerprint")
    rep = q_repetition(spark, sf_dir)
    # round-5 leg: corpus-level exact span dedup (the C4 paragraph
    # recipe; the synthetic corpus has no newlines, so spans = tokens
    # with short ones exempt — the PLAN is identical either way)
    from pandas_alchemy_spark.ext import dedup as dd
    pdd = dd.dedup_paragraphs(docs, sep=" ", min_chars=4).select(
        "doc_id",
        F.col("n_paras").cast("long").alias("n_paras"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.length("text_deduped").cast("long").alias("ded_len"))
    # round-6 leg: benchmark decontamination (ext/dedup.decontaminate
    # — broadcast eval-gram semi-count, the GPT-3 13-gram recipe at
    # n=5).  Eval slice = doc_id % 97 == 0 from the same table, so
    # those docs are trivially fully contaminated and the rest catch
    # real boilerplate overlap.
    ev6 = docs.filter("doc_id % 97 = 0")
    ct = (dd.decontaminate(docs, ev6, n=5)
          .select("doc_id",
                  F.col("n_contam_ngrams").cast("long")
                  .alias("n_contam")))
    # round-7 leg: cross-corpus incremental dedup
    # (ext/dedup.cross_dedup_pairs) — the doc_id % 3 == 0 slice is
    # the "new crawl", the rest the existing corpus; per new doc the
    # leg pins the count of verified reference matches and the max
    # exact Jaccard (an exact rational — bit-stable).  Reference-side
    # docs carry -1 sentinels.  bucket_cap=None so the oracle needs
    # no cap replay (the capped path is pytest-covered).
    # r9: routed through the PREBUILT ReferenceIndex
    # (dd.build_reference_index) — output identical to the inline
    # path by construction (test-pinned), so the unchanged DuckDB
    # replay now value-hashes the index build+query path end to end.
    # r13 (VERDICT r12 #7): the reference is now built on HALF its
    # docs and grown to the full set through the one-call
    # maintain_reference_index path — append is rebuild-equal by
    # construction, so the leg's values (and the DuckDB replay) are
    # unchanged while the maintenance surface itself becomes
    # driver-oracle-covered: a drift in append/maintain hash-
    # mismatches this suite.
    new_sl = docs.filter("doc_id % 3 = 0")
    ref_base = docs.filter("doc_id % 3 = 1")
    ref_wave = docs.filter("doc_id % 3 = 2")
    idx0 = dd.build_reference_index(
        ref_base, num_hashes=16, bands=4, bucket_cap=None,
        materialize=False)
    # lazy build -> appended_fraction is None -> no compaction at
    # oracle scale (compaction itself is pytest-pinned rebuild-equal)
    ref_idx, _minfo = dd.maintain_reference_index(idx0, ref_wave)
    # index lifecycle is caller-owned; in this long-lived harness
    # session, hand the frames to the bounded cache ring (the same
    # release discipline the inline path used)
    for _fr in (ref_idx.ref_buckets, ref_idx.ref_sets,
                ref_idx.ref_over, ref_idx._br):
        if _fr is not None:
            dd._register_cache(_fr)
    xp = dd.cross_dedup_pairs(new_sl, index=ref_idx, threshold=0.4)
    xagg = (xp.groupBy("id_new")
            .agg(F.count(F.lit(1)).alias("__nx"),
                 F.max("jaccard").alias("__xj")))
    xleg = (docs.select("doc_id")
            .join(xagg.withColumnRenamed("id_new", "doc_id"),
                  "doc_id", "left")
            .select("doc_id",
                    F.when(F.expr("doc_id % 3 = 0"),
                           F.coalesce("__nx", F.lit(0)))
                    .otherwise(F.lit(-1)).cast("long").alias("n_xdup"),
                    F.coalesce("__xj", F.lit(-1.0)).alias("xjac")))
    # round-7 leg: hashed TF-IDF vectors (ext/text.tfidf_vectors) —
    # per-doc exact-int checksum of the unit vector on the 1e-6 grid
    # (sum of round(v*1e6) BIGINTs: order-independent where a float
    # sum is not) + the nonzero-dimension count.  Token-less docs are
    # absent from the featurizer by contract -> -1 sentinels.
    tv = text.tfidf_vectors(docs, dim=64)
    tvleg = (docs.select("doc_id")
             .join(tv.select(
                 "doc_id",
                 F.expr("aggregate(embedding, cast(0 as bigint), "
                        "(s, v) -> s + cast(round(v * 1e6, 0) "
                        "as bigint))").alias("tfidf_chk"),
                 F.expr("size(filter(embedding, v -> v != 0D))")
                 .cast("long").alias("tfidf_nnz")),
                 "doc_id", "left")
             .select("doc_id",
                     F.coalesce("tfidf_chk", F.lit(-1))
                     .cast("long").alias("tfidf_chk"),
                     F.coalesce("tfidf_nnz", F.lit(-1))
                     .cast("long").alias("tfidf_nnz")))
    # round-8 leg: exact-substring repeated-passage spans
    # (ext/dedup.duplicate_spans — Lee et al. 2022 ExactSubstr over
    # hashed 6-token rolling windows).  Per doc: span count and an
    # order-free exact-int span checksum (sum of s*131 + e + nw*7);
    # docs with no spans carry 0/-1 sentinels.  Fully SQL-replayed
    # (windows, global-first rule, gaps-and-islands merge).
    sp = dd.duplicate_spans(docs, n=6)
    spagg = (sp.groupBy("doc_id")
             .agg(F.count(F.lit(1)).alias("__ns"),
                  F.sum(F.col("span_start") * 131 + F.col("span_end")
                        + F.col("n_windows") * 7).alias("__sc")))
    spleg = (docs.select("doc_id")
             .join(spagg, "doc_id", "left")
             .select("doc_id",
                     F.coalesce("__ns", F.lit(0)).cast("long")
                     .alias("n_spans"),
                     F.coalesce("__sc", F.lit(-1)).cast("long")
                     .alias("span_chk")))
    return (scalar.join(rep, "doc_id").join(pdd, "doc_id")
            .join(ct, "doc_id").join(xleg, "doc_id")
            .join(tvleg, "doc_id").join(spleg, "doc_id"))


def q_langid_terms(spark, sf_dir):
    """language-ID rollup + corpus top-k terms (union with a tag).

    Round-7 fold: unigram_logprob (ext/text.py) — per-doc
    corpus-trained unigram LM score, tag='uni'.  Bit-stable across
    runs/partitionings by the sorted-fold contract; rounded to 6
    decimals for the cross-engine hash (JVM Math.log vs libm log are
    each <=1 ulp, not the same ulp)."""
    from pandas_alchemy_spark.ext import text
    _prep(spark)
    la = q_langid(spark, sf_dir)
    tt = q_top_terms(spark, sf_dir)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    uni = text.unigram_logprob(docs)
    return (la.select(F.lit("lang").alias("tag"),
                      F.col("lang_pred").alias("key"), F.col("n"),
                      F.col("avg_score").alias("score"))
            .unionAll(tt.select(F.lit("term").alias("tag"),
                                F.col("term").alias("key"),
                                F.col("tf").alias("n"),
                                F.lit(None).cast("double").alias("score")))
            .unionAll(uni.select(
                F.lit("uni").alias("tag"),
                F.col("doc_id").cast("string").alias("key"),
                F.col("n_lm_tokens").cast("long").alias("n"),
                F.round("logprob", 6).alias("score")))
            .unionAll(text.bigram_logprob(docs).select(
                F.lit("bi").alias("tag"),
                F.col("doc_id").cast("string").alias("key"),
                F.col("n_lm_tokens").cast("long").alias("n"),
                F.round("logprob2", 6).alias("score")))
            .unionAll(_bm25_leg(spark, docs))
            .unionAll(_profile_leg(docs)))


def _profile_leg(docs):
    """corpus_profile (ext/profile.py, round 10) exact-mode fold:
    the per-language one-pass report unpivoted to (tag='prof',
    key=lang/metric, n, score) rows.  Exact mode is the oracle path
    (count(distinct) + interpolated percentile == quantile_cont);
    doubles rounded to 6 for the cross-engine hash."""
    from pandas_alchemy_spark.ext import profile as _prof
    rep = _prof.corpus_profile(docs, text_col="text", group_col="lang",
                               quantiles=(0.5, 0.9, 0.99), mode="exact")
    return rep.selectExpr(
        "grp",
        """stack(11,
            'n_docs', n_docs, cast(null as double),
            'total_tokens', total_tokens, cast(null as double),
            'min_tokens', min_tokens, cast(null as double),
            'max_tokens', max_tokens, cast(null as double),
            'distinct', distinct_texts, cast(null as double),
            'avg_tokens', cast(null as bigint), round(avg_tokens, 6),
            'p50', cast(null as bigint), round(p50_tokens, 6),
            'p90', cast(null as bigint), round(p90_tokens, 6),
            'p99', cast(null as bigint), round(p99_tokens, 6),
            'avg_chars', cast(null as bigint), round(avg_chars, 6),
            'dup_ratio', cast(null as bigint), round(dup_ratio, 6)
        ) as (m, nv, score)""").select(
        F.lit("prof").alias("tag"),
        F.concat_ws("/", F.col("grp"), F.col("m")).alias("key"),
        F.col("nv").cast("long").alias("n"),
        F.col("score"))


#: fixed audit queries for the bm25 driver leg (mid-frequency corpus
#: vocabulary so every scale has hits)
_BM25_QUERIES = [("q0", "hash join filter"),
                 ("q1", "vector stream window")]


def _bm25_leg(spark, docs):
    """Round-7 fold: BM25 search (ext/text.bm25_search) — top-5 docs
    per fixed audit query, tag='bm25'.  key = query:rank, n = the
    retrieved doc id (pins the ranking itself), score rounded to 6
    (ln-in-the-formula; same cross-engine ulp contract as 'uni')."""
    from pandas_alchemy_spark.ext import text
    qs = spark.createDataFrame(_BM25_QUERIES,
                               "query_id string, query string")
    bm = text.bm25_search(docs, qs, k=5)
    return bm.select(
        F.lit("bm25").alias("tag"),
        F.concat_ws(":", "query_id",
                    F.col("rank").cast("string")).alias("key"),
        F.col("doc_id").cast("long").alias("n"),
        F.round("score", 6).alias("score"))


def q_multimodal_suite(spark, sf_dir):
    """media decode stats + frame sampling joined on media_type."""
    _prep(spark)
    a = q_multimodal_stats(spark, sf_dir)
    b = q_frame_sample(spark, sf_dir)
    return a.join(b, "media_type")


def q_seq_pack(spark, sf_dir):
    """Sequence packing for training batches (ext/text.py
    pack_sequences): shard-local offset packing into 2048-token bins,
    rolled up per (shard, bin).

    Round-7 fold: context-window chunking (ext/text.py
    chunk_documents, 64-token windows / 16-token overlap) — shard=-1
    rolls chunks up per chunk index (exact window arithmetic), and
    shard=-2 buckets the md5-60bit hash of every chunk's TEXT mod 8
    (content-addressed: any off-by-one in a slice bound flips
    buckets), both hashed against the DuckDB window replay."""
    from pandas_alchemy_spark.ext import text
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    packed = text.pack_sequences(docs, capacity=2048, n_shards=8)
    pack_leg = (packed.groupBy("shard", "bin")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("n_tokens").alias("n_tokens"),
                     F.min("doc_id").alias("first_doc")))
    ch = text.chunk_documents(docs, chunk_tokens=64, overlap=16)
    leg_idx = (ch.groupBy(F.col("chunk_idx").alias("bin"))
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_chunk_tokens").alias("n_tokens"),
                    F.min("doc_id").alias("first_doc"))
               .select(F.lit(-1).cast("long").alias("shard"),
                       "bin", "n_docs", "n_tokens", "first_doc"))
    h60 = F.expr(
        "cast(conv(substr(md5(chunk_text), 1, 15), 16, 10) as bigint)")
    leg_txt = (ch.groupBy(F.pmod(h60, F.lit(8)).cast("long").alias("bin"))
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_chunk_tokens").alias("n_tokens"),
                    F.min("doc_id").alias("first_doc"))
               .select(F.lit(-2).cast("long").alias("shard"),
                       "bin", "n_docs", "n_tokens", "first_doc"))
    # round-7 fold: shuffle_corpus (ext/pipeline.py) — deterministic
    # global corpus shuffle.  shard=-3 pins the FULL permutation:
    # n_tokens is the order-binding checksum sum(pos * (doc_id % 97))
    # (any transposition changes it) and first_doc is the document at
    # position 1 of each shard.
    from pandas_alchemy_spark.ext import pipeline as _pl
    sh = _pl.shuffle_corpus(docs, n_shards=8)
    leg_shuf = (sh.groupBy(F.col("shard").alias("bin"))
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum(F.col("shard_pos")
                           * F.pmod(F.col("doc_id"), F.lit(97)))
                     .alias("n_tokens"),
                     F.min(F.when(F.col("shard_pos") == 1,
                                  F.col("doc_id"))).alias("first_doc"))
                .select(F.lit(-3).cast("long").alias("shard"),
                        F.col("bin").cast("long").alias("bin"),
                        "n_docs",
                        F.col("n_tokens").cast("long").alias("n_tokens"),
                        "first_doc"))
    # round-8 fold: the pluggable tokenizer registry
    # (ext/tokenize.py).  The BPE kernel's merge semantics are pinned
    # by the pure-Python oracle in tests/test_tokenize.py; THIS leg
    # pins the Spark plumbing (registry -> Arrow pandas_udf column ->
    # chunk slicing/joining) with a full value hash, using the
    # SQL-replayable 'chars4' kernel (fixed 4-char pieces): chunk i
    # of (16 tokens, overlap 4) is exactly substr(text, s*4+1, 64),
    # so DuckDB reproduces every chunk byte for byte.  shard=-4
    # buckets the md5-60bit of each chunk's text mod 8
    # (content-addressed: an off-by-one anywhere flips buckets).
    ck4 = text.chunk_documents(docs, chunk_tokens=16, overlap=4,
                               tokenizer="chars4")
    h60c = F.expr(
        "cast(conv(substr(md5(chunk_text), 1, 15), 16, 10) as bigint)")
    leg_tok = (ck4.groupBy(F.pmod(h60c, F.lit(8)).cast("long")
                           .alias("bin"))
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_chunk_tokens").alias("n_tokens"),
                    F.min("doc_id").alias("first_doc"))
               .select(F.lit(-4).cast("long").alias("shard"),
                       "bin", "n_docs", "n_tokens", "first_doc"))
    return (pack_leg.unionAll(leg_idx).unionAll(leg_txt)
            .unionAll(leg_shuf).unionAll(leg_tok))


def q_curate_corpus(spark, sf_dir):
    """End-to-end corpus curation (ext/pipeline.py curate_corpus):
    normalize + PII scrub -> quality gate (q_score >= 0.2 on raw
    text) -> exact collapse on norm_text -> MinHash-LSH transitive
    near-dup collapse -> token-budget packing, rolled up per shard
    (n_docs, n_tokens, n_bins, avg_quality).  The oracle replays every
    stage in one recursive-CTE SQL pipeline.  A second leg (shard=-1)
    drives the media->embedding bridge (ext/multimodal.embed_media):
    the stub encoder's values are not SQL-reproducible, but the
    Arrow-batch plumbing contract is — count, total width, single
    fixed dim, and unit L2 norm."""
    from pandas_alchemy_spark.ext import multimodal, pipeline
    _prep(spark)
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    cur = pipeline.curate_corpus(
        docs, min_quality=0.2, near_dup_threshold=0.4,
        capacity=2048, n_shards=8, num_hashes=16, bands=4)
    per_shard = (cur.groupBy("shard")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("n_tokens").alias("n_tokens"),
                      F.countDistinct("bin").alias("n_bins"),
                      F.round(F.avg("q_score"), 3).alias("avg_quality")))
    media = multimodal.attach_fake_payload(docs)
    emb = multimodal.embed_media(media)
    nrm = F.sqrt(F.expr(
        "aggregate(embedding, 0D, (acc, x) -> acc + x * x)"))
    leg_emb = (emb.select(F.size("embedding").alias("dim"),
                          nrm.alias("nrm"))
               .agg(F.lit(-1).cast("long").alias("shard"),
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dim").alias("n_tokens"),
                    F.countDistinct("dim").alias("n_bins"),
                    F.round(F.avg("nrm"), 3).alias("avg_quality")))
    # round-6 fold: mix_corpora (ext/pipeline.py:81) — DoReMi-style
    # static-weight domain mixture.  Power-of-two weights sum EXACTLY
    # in any order, so the oracle replays the availability -> T ->
    # frac -> md5-threshold arithmetic in SQL with bit-identical
    # doubles; per-lang kept counts / char sums are exact ints.
    # Shard codes en=-2 de=-3 fr=-4 zh=-5; 'es' stays outside the
    # weights on purpose (domains not in the mixture must drop).
    mix_w = {"en": 0.5, "de": 0.25, "fr": 0.125, "zh": 0.125}
    codes = {"en": -2, "de": -3, "fr": -4, "zh": -5}
    mixed = pipeline.mix_corpora(docs, mix_w, by="lang")
    avail = (docs.filter(F.col("lang").isin(list(mix_w)))
             .groupBy("lang").agg(F.count(F.lit(1)).alias("avail")))
    code_col = F.create_map(
        *[F.lit(x) for kv in sorted(codes.items()) for x in kv]
    )[F.col("lang")]
    leg_mix = (mixed.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_chars").alias("n_tokens"))
               .join(avail, "lang")
               .select(code_col.cast("long").alias("shard"),
                       F.col("n_docs").cast("long").alias("n_docs"),
                       F.col("n_tokens").cast("long").alias("n_tokens"),
                       F.col("avail").cast("long").alias("n_bins"),
                       F.round(F.col("n_docs") / F.col("avail"), 6)
                       .alias("avg_quality")))
    # round-7 fold: split_corpus (ext/pipeline.py) — deterministic
    # train/val/test assignment from disjoint md5-60bit hash
    # intervals (exact-decimal cumulative thresholds, same boundary
    # rule as the mix leg).  Codes train=-6 val=-7 test=-8; fractions
    # sum to 1 so the legs must partition the corpus exactly —
    # n_docs/n_tokens are exact ints the oracle replays.
    sp = pipeline.split_corpus(
        docs, {"train": 0.75, "val": 0.125, "test": 0.125})
    tot = docs.agg(F.count(F.lit(1)).alias("__tot")).coalesce(1)
    sp_code = F.create_map(
        F.lit("train"), F.lit(-6), F.lit("val"), F.lit(-7),
        F.lit("test"), F.lit(-8))[F.col("split")]
    leg_split = (sp.groupBy("split")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("n_chars").alias("n_tokens"),
                      F.countDistinct("lang").alias("n_bins"))
                 .crossJoin(tot)
                 .select(sp_code.cast("long").alias("shard"),
                         F.col("n_docs").cast("long").alias("n_docs"),
                         F.col("n_tokens").cast("long").alias("n_tokens"),
                         F.col("n_bins").cast("long").alias("n_bins"),
                         F.round(F.col("n_docs") / F.col("__tot"), 6)
                         .alias("avg_quality")))
    # round-7 fold: DSIR importance resampling (ext/pipeline.py
    # importance_weights + resample_corpus).  Shard -9 pins EVERY
    # per-doc weight through an order-independent exact checksum
    # (sum of round(logw*1e6) BIGINTs — float-sum order can differ
    # across engines, a sum of exact ints cannot); shard -10 pins the
    # Gumbel-top-k selected SET (k, id-sum, min id) plus the same
    # checksum over the selection keys.  ln() is <=1 ulp per engine,
    # ~1e-14 accumulated per doc — five orders below the 1e-6
    # checksum grid and the ~1e-2 top-k boundary gaps.
    iw = pipeline.importance_weights(
        docs, docs.filter(F.col("lang") == "en"), buckets=4096)
    wchk = F.round(F.col("logw") * F.lit(1e6), 0).cast("long")
    leg_dsir = (iw.select(wchk.alias("__c"), "n_grams")
                .agg(F.count(F.lit(1)).alias("__n"),
                     F.sum("n_grams").alias("__g"),
                     F.sum("__c").alias("__s"))
                .select(F.lit(-9).cast("long").alias("shard"),
                        F.col("__n").cast("long").alias("n_docs"),
                        F.col("__g").cast("long").alias("n_tokens"),
                        F.col("__s").cast("long").alias("n_bins"),
                        F.round(F.col("__s") / F.col("__n") / F.lit(1e6),
                                3).alias("avg_quality")))
    sel = pipeline.resample_corpus(iw, k=40)
    kchk = F.round(F.col("sample_key") * F.lit(1e6), 0).cast("long")
    leg_sel = (sel.select("doc_id", kchk.alias("__c"))
               .agg(F.count(F.lit(1)).alias("__n"),
                    F.sum("doc_id").alias("__ids"),
                    F.min("doc_id").alias("__mn"),
                    F.sum("__c").alias("__s"))
               .select(F.lit(-10).cast("long").alias("shard"),
                       F.col("__n").cast("long").alias("n_docs"),
                       F.col("__ids").cast("long").alias("n_tokens"),
                       F.col("__mn").cast("long").alias("n_bins"),
                       F.round(F.col("__s") / F.col("__n") / F.lit(1e6),
                               3).alias("avg_quality")))
    # round-7 fold: grouped split (split_corpus(by=)) — leakage-safe
    # splits hash the GROUP column, so every doc of a lang shares one
    # split.  Shard -11 pins EVERY doc's label via the exact-int
    # checksum sum(code * doc_id) (code train=1 val=2 test=3 — any
    # single reassignment changes the sum), plus the train fraction.
    spg = pipeline.split_corpus(
        docs, {"train": 0.75, "val": 0.125, "test": 0.125}, by="lang")
    code3 = (F.when(F.col("split") == "train", F.lit(1))
             .when(F.col("split") == "val", F.lit(2))
             .otherwise(F.lit(3)))
    leg_gs = (spg.select((code3 * F.col("doc_id")).alias("__cw"),
                         (F.col("split") == "train").cast("long")
                         .alias("__is_tr"), "lang")
              .agg(F.count(F.lit(1)).alias("__n"),
                   F.sum("__cw").alias("__chk"),
                   F.countDistinct("lang").alias("__nl"),
                   F.sum("__is_tr").alias("__tr"))
              .select(F.lit(-11).cast("long").alias("shard"),
                      F.col("__n").cast("long").alias("n_docs"),
                      F.col("__chk").cast("long").alias("n_tokens"),
                      F.col("__nl").cast("long").alias("n_bins"),
                      F.round(F.col("__tr") / F.col("__n"), 6)
                      .alias("avg_quality")))
    # round-9 fold: model-based quality filter
    # (pipeline.train_quality_classifier / score_quality /
    # quality_classifier_filter — the GPT-3/CCNet discriminative
    # gate).  L-BFGS logistic regression is not SQL-replayable, so
    # shard -12 pins in-plan INVARIANTS the oracle replays as
    # constants + one SQL-computable count: (a) every non-null-text
    # doc is scored exactly once (n_docs = SQL count), (b) the
    # planted language signal separates (median en score > median
    # non-en — 1/0), (c) the content-addressed Pareto gate keeps a
    # non-trivial strict subset that includes >90% of q>0.99 docs
    # (1/0).  Semantic quality (exact separation, reproducibility,
    # model round-trip) is pinned in tests/test_ext.py.
    qc_model = pipeline.train_quality_classifier(
        docs.filter("lang = 'en'"), docs.filter("lang <> 'en'"),
        max_iter=15)
    qsc = (pipeline.score_quality(docs, qc_model)
           .join(docs.select("doc_id", "lang"), "doc_id").persist())
    from pandas_alchemy_spark.ext.dedup import _register_cache as _rc9
    _rc9(qsc)
    sep = (qsc.agg(
        (F.expr("percentile(CASE WHEN lang = 'en' THEN q_prob END, "
                "0.5)")
         > F.expr("percentile(CASE WHEN lang <> 'en' THEN q_prob "
                  "END, 0.5)")).cast("long").alias("__sep"))
        .coalesce(1))
    kept9 = pipeline.quality_classifier_filter(
        docs, qc_model, seed="pas9").select("doc_id", "q_prob")
    n_all = qsc.agg(F.count(F.lit(1)).alias("__n")).coalesce(1)
    high = qsc.filter(F.col("q_prob") > 0.99).select("doc_id")
    kstats = (kept9.agg(F.count(F.lit(1)).alias("__nk")).coalesce(1)
              .crossJoin(high.agg(F.count(F.lit(1)).alias("__nh"))
                         .coalesce(1))
              .crossJoin(high.join(kept9, "doc_id", "left_semi")
                         .agg(F.count(F.lit(1)).alias("__nhk"))
                         .coalesce(1)))
    leg_qc = (n_all.crossJoin(sep).crossJoin(kstats)
              .select(F.lit(-12).cast("long").alias("shard"),
                      F.col("__n").cast("long").alias("n_docs"),
                      F.col("__sep").cast("long").alias("n_tokens"),
                      ((F.col("__nk") > 0) & (F.col("__nk") < F.col("__n"))
                       & (F.col("__nh") > 0)
                       & (F.col("__nhk") * 10 > F.col("__nh") * 9))
                      .cast("long").alias("n_bins"),
                      F.lit(-12.0).alias("avg_quality")))
    return (per_shard.select(
        F.col("shard").cast("long").alias("shard"), "n_docs", "n_tokens",
        F.col("n_bins").cast("long").alias("n_bins"),
        "avg_quality").unionAll(leg_emb).unionAll(leg_mix)
        .unionAll(leg_split).unionAll(leg_dsir).unionAll(leg_sel)
        .unionAll(leg_gs).unionAll(leg_qc))


def q_ann_suite(spark, sf_dir):
    """ANN suite upgraded to a hashed RECALL contract: for each algo
    (multi-table LSH, IVF) the query computes recall@5 against the
    exact brute-force top-5 in-plan and emits (algo, n_queries, k,
    recall_ok).  The approximate neighbor lists themselves stay
    un-oracled (approximate by contract), but hyperplanes/centroids
    are deterministic, so the recall bucket is a stable value the
    driver can hash-check — upgrading ann_suite from rows-only to a
    full oracle row."""
    _prep(spark)
    brute = q_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    nq = (brute.agg(F.countDistinct("query_id").alias("n_queries"))
          .coalesce(1))
    # round-8 fold: persistent IVF index (ext/similarity
    # build_ivf_index / search_ivf_index) — the partition-pruned ANN
    # table.  Built fresh (overwrite) under .scratch per scale; the
    # same recall_ok >= 0.6 bucket as the in-memory legs, plus the
    # pruning itself is pinned in tests/test_ext.py via
    # input_file_name.
    import os as _os
    import re as _re
    from pandas_alchemy_spark.ext import similarity as _sim0
    emb0 = spark.read.parquet(_t(sf_dir, "embeddings"))
    dim0 = len(emb0.select("embedding").head(1)[0][0])
    # scratch root derives from THIS file (not a hardcoded absolute
    # path), overridable via PAS_SCRATCH_DIR; the index directory is
    # keyed by the FULL sf_dir (sanitized), so two scales sharing a
    # basename — or the same harness run from two checkouts — cannot
    # collide (ADVICE r8)
    _scratch = _os.environ.get(
        "PAS_SCRATCH_DIR",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      ".scratch"))
    idx_path = _os.path.join(
        _scratch,
        "ivf_index_" + _re.sub(r"[^A-Za-z0-9_.-]+", "_",
                               sf_dir.strip("/")))
    cents_idx = _sim0.build_ivf_index(emb0, idx_path, dim=dim0,
                                      nlist=16)
    idx_ann = _sim0.search_ivf_index(
        spark, idx_path, emb0.filter("vec_id < 5"), k=5, nprobe=6,
        centroids=cents_idx).select(
        "query_id", "neighbor_id",
        F.round("cosine", 4).alias("cosine"))
    legs = [("ivf", q_ivf_ann(spark, sf_dir)),
            ("ivf_idx", idx_ann),
            ("lsh", q_lsh_ann(spark, sf_dir))]
    parts = []
    for name, ann in legs:
        hits = (ann.select("query_id", "neighbor_id")
                .join(brute, ["query_id", "neighbor_id"], "left_semi"))
        agg = (hits.agg(F.count(F.lit(1)).alias("n_hits")).coalesce(1)
               .crossJoin(nq))
        parts.append(agg.select(
            F.lit(name).alias("algo"),
            F.col("n_queries").cast("long").alias("n_queries"),
            F.lit(5).cast("long").alias("k"),
            (F.col("n_hits") >= F.col("n_queries") * 5 * 0.6)
            .alias("recall_ok")))
    # round-7 fold: SemDeDup (ext/similarity.semantic_dedup) —
    # cluster-then-prune semantic dedup.  k-means is not
    # SQL-replayable, so the hashed fields are the SQL-computable
    # input count and an in-plan INVARIANT conjunction: (a) no
    # candidate pair survives with both endpoints kept, (b) kept
    # rows == distinct components (exactly one representative each),
    # (c) every input row is labeled, (d) min-label rule holds
    # (component <= id).  Semantic quality (planted-duplicate
    # collapse) is pinned in tests/test_ext.py.
    from pandas_alchemy_spark.ext import similarity as _sim
    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    dim = len(emb.select("embedding").head(1)[0][0])
    cents = _sim.train_ivf_centroids(emb, dim=dim, nlist=8)
    sd_pairs = _sim.semantic_dedup_pairs(
        emb, dim=dim, nlist=8, threshold=0.3, centroids=cents)
    sd_lab = _sim.semantic_dedup(
        emb, dim=dim, nlist=8, threshold=0.3, centroids=cents)
    sd_kept = sd_lab.filter("keep").select("id")
    sd_bad = (sd_pairs
              .join(sd_kept.withColumnRenamed("id", "id_a"), "id_a",
                    "left_semi")
              .join(sd_kept.withColumnRenamed("id", "id_b"), "id_b",
                    "left_semi")
              .agg(F.count(F.lit(1)).alias("n_bad")).coalesce(1))
    sd_stats = (sd_lab.agg(
        F.count(F.lit(1)).alias("n_labels"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.countDistinct("component").alias("n_comp"),
        F.sum((F.col("component") > F.col("id")).cast("long"))
        .alias("n_minviol")).coalesce(1))
    n_in = (emb.filter(F.col("embedding").isNotNull())
            .agg(F.count(F.lit(1)).alias("n_in")).coalesce(1))
    sd = (n_in.crossJoin(sd_bad).crossJoin(sd_stats)
          .select(F.lit("semdedup").alias("algo"),
                  F.col("n_in").cast("long").alias("n_queries"),
                  F.lit(8).cast("long").alias("k"),
                  ((F.col("n_bad") == 0)
                   & (F.col("n_labels") == F.col("n_in"))
                   & (F.col("n_kept") == F.col("n_comp"))
                   & (F.col("n_minviol") == 0)).alias("recall_ok")))
    # round-13 fold: semantic_dedup_against (ext/similarity) — the
    # embedding twin of cross_dedup_pairs(index=): new-batch
    # near-dup pairs against a PERSISTED IVF reference, which here
    # is built on one slice and GROWN via append_to_ivf_index, so
    # the incremental-index machinery sits under the driver oracle.
    # k-means centroids are not SQL-replayable; the hashed fields
    # are the SQL-computable new-slice count and an in-plan
    # invariant conjunction: (a) the grown-index pairs equal a
    # from-scratch-union index's pairs under the same centroids
    # (append lifecycle value-equality — symmetric difference 0),
    # (b) pairs are strictly cross-corpus (id_new in the new slice,
    # id_ref in the reference slices), (c) planted near-copies of
    # reference vectors are all found (recall contract).
    ref_a = emb0.filter("vec_id % 3 = 0")
    ref_b = emb0.filter("vec_id % 3 = 1")
    new_e = emb0.filter("vec_id % 3 = 2")
    xg_path = _os.path.join(
        _scratch, "ivfx_grown_" + _re.sub(
            r"[^A-Za-z0-9_.-]+", "_", sf_dir.strip("/")))
    xs_path = _os.path.join(
        _scratch, "ivfx_scratch_" + _re.sub(
            r"[^A-Za-z0-9_.-]+", "_", sf_dir.strip("/")))
    xc = _sim0.build_ivf_index(ref_a, xg_path, dim=dim0, nlist=16)
    _sim0.append_to_ivf_index(ref_b, xg_path)
    _sim0.build_ivf_index(ref_a.unionAll(ref_b), xs_path, dim=dim0,
                          nlist=16, centroids=xc)
    planted = (ref_a.filter(F.col("embedding").isNotNull())
               .limit(20).select(
                   (F.col("vec_id") + 10000000).alias("vec_id"),
                   F.col("embedding")))
    probe = new_e.select("vec_id", "embedding").unionAll(planted)
    # nprobe=1 keeps the candidate volume at sum(cell) not
    # 2*sum(cell); exact planted copies land in their source's home
    # cell, so the recall contract holds at one probe (boundary
    # pairs at nprobe=2 are pytest-pinned)
    xpg = _sim0.semantic_dedup_against(spark, xg_path, probe,
                                       threshold=0.25, nprobe=1)
    xps = _sim0.semantic_dedup_against(spark, xs_path, probe,
                                       threshold=0.25, nprobe=1)
    xdiff = (xpg.select("id_new", "id_ref")
             .unionAll(xps.select("id_new", "id_ref"))
             .groupBy("id_new", "id_ref")
             .agg(F.count(F.lit(1)).alias("__c"))
             .filter("__c <> 2")
             .agg(F.count(F.lit(1)).alias("n_diff")).coalesce(1))
    xbad = (xpg.filter(
        (F.col("id_new") % 3 != 2) & (F.col("id_new") < 10000000)
        | (F.col("id_ref") % 3 == 2))
        .agg(F.count(F.lit(1)).alias("n_bad")).coalesce(1))
    xplant = (xpg.filter(
        F.col("id_new") - 10000000 == F.col("id_ref"))
        .agg(F.countDistinct("id_new").alias("n_plant")).coalesce(1))
    xn = (new_e.filter(F.col("embedding").isNotNull())
          .agg(F.count(F.lit(1)).alias("n_new")).coalesce(1))
    xleg_e = (xn.crossJoin(xdiff).crossJoin(xbad).crossJoin(xplant)
              .select(F.lit("semdedup_x").alias("algo"),
                      F.col("n_new").cast("long").alias("n_queries"),
                      F.lit(8).cast("long").alias("k"),
                      ((F.col("n_diff") == 0) & (F.col("n_bad") == 0)
                       & (F.col("n_plant") == 20)).alias("recall_ok")))
    # round-7 fold: cluster_documents (ext/pipeline.py) — hashed
    # TF-IDF + deterministic k-means over documents.  k-means is not
    # SQL-replayable; the invariants pinned: (a) every tokenized doc
    # is labeled exactly once, (b) exactly one distinct label per
    # doc, (c) labels live in [0, k).  Topic separation is pinned in
    # tests/test_ext.py on a planted-vocabulary corpus.
    from pandas_alchemy_spark.ext import pipeline as _pl2
    from pandas_alchemy_spark.ext.text import _tok
    docs_c = spark.read.parquet(_t(sf_dir, "documents"))
    cl = _pl2.cluster_documents(docs_c, k=8, dim=64, refine_iters=1)
    n_tok = (docs_c.filter(F.expr(f"size({_tok('text')}) >= 1"))
             .agg(F.count(F.lit(1)).alias("n_tok")).coalesce(1))
    cl_stats = (cl.agg(
        F.count(F.lit(1)).alias("n_lab"),
        F.countDistinct("doc_id").alias("n_doc"),
        F.sum(((F.col("cluster") < 0)
               | (F.col("cluster") >= 8)).cast("long"))
        .alias("n_range")).coalesce(1))
    clleg = (n_tok.crossJoin(cl_stats)
             .select(F.lit("doc_cluster").alias("algo"),
                     F.col("n_tok").cast("long").alias("n_queries"),
                     F.lit(8).cast("long").alias("k"),
                     ((F.col("n_lab") == F.col("n_tok"))
                      & (F.col("n_doc") == F.col("n_tok"))
                      & (F.col("n_range") == 0)).alias("recall_ok")))
    from functools import reduce as _reduce
    return (_reduce(lambda a, b: a.unionAll(b), parts)
            .unionAll(sd).unionAll(xleg_e).unionAll(clleg))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # reference surface (folded suites keep every op oracle-checked
        # while fitting the driver's 50-entry window)
        "scan_project": q_scan_project,
        "arith_ieee": q_arith_ieee,
        "literal_frames": q_literal_frames,
        "align_suite": q_align_suite,
        "positional_suite": q_positional_suite,
        "customer_scalar": q_customer_scalar,
        "flag_masks": q_flag_masks,
        "window_suite": q_window_suite,
        "reshape_suite": q_reshape_suite,
        "scalar_suite": q_scalar_suite,
        "bins_suite": q_bins_suite,
        "vc_describe": q_vc_describe,
        "melt_unpivot": q_melt_unpivot,
        "str_funcs": q_str_funcs,
        "dt_funcs": q_dt_funcs,
        "groupby_agg": q_groupby_agg,
        "where_replace": q_where_replace,
        # TPC-H-style relational
        "q3_shipping": q3_shipping,
        "q5_local_supplier": q5_local_supplier,
        "q6_forecast": q6_forecast,
        "q4_semi_join": q4_semi_join,
        "q10_returned": q10_returned,
        "groupby_apply": q_groupby_apply,
        "q18_large_orders": q18_large_orders,
        "q19_disjunct": q19_disjunct,
        "anti_join": q_anti_join,
        "window_topk": q_window_topk,
        "asof_join": q_asof_join,
        "interval_join": q_interval_join,
        "explode_embedding": q_explode_embedding,
        # distinct_count folded into groupby_agg; drop_rows into
        # join_suite; unstack_multi into reshape2_suite (50-entry window)
        "reshape2_suite": q_reshape2_suite,
        "join_suite": q_join_suite,
        # events
        "events_hourly": q_events_hourly,
        "sessionize": q_sessionize,
        "top_users_funnel": q_top_users_funnel,
        "cohort_retention": q_cohort_retention,
        # LLM-pipeline: dedup / similarity / text / multimodal
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_cluster": q_dedup_cluster,
        "dedup_simhash": q_dedup_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "cosine_topk": q_cosine_topk,
        "emb_near_dup": q_emb_near_dup,
        "text_suite": q_text_suite,
        "tpch_suite": q_tpch_suite,
        "langid_terms": q_langid_terms,
        "multimodal_suite": q_multimodal_suite,
        "seq_pack": q_seq_pack,
        "curate_corpus": q_curate_corpus,
        "ann_suite": q_ann_suite,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

# shared SQL fragments (DuckDB dialect)
_DK_TOKS = ("list_filter(string_split_regex(lower(regexp_replace({col}, "
            "'[^a-zA-Z0-9]+', ' ', 'g')), ' '), t -> t != '')")
_DK_H60 = "(('0x' || substr(md5({s}), 1, 15))::BIGINT)"


def _dk_shingles(col: str, n: int = 3, distinct: bool = True) -> str:
    toks = _DK_TOKS.format(col=col)
    raw = (f"list_transform(range(0, greatest(len({toks}) - {n}, 0) + 1), "
           f"i -> array_to_string(({toks})[i + 1: i + {n}], ' '))")
    return f"list_distinct({raw})" if distinct else raw


def oracle_sql() -> dict[str, str]:
    toks_text = _DK_TOKS.format(col="text")
    stop_en = ("len(list_filter(" + toks_text + ", t -> list_contains("
               "['the','and','of','to','in','is','that','it','was','for',"
               "'with','as','his','on','be','at','by','had','not','are'], t)))"
               " / greatest(len(" + toks_text + "), 1)::DOUBLE")

    def stop_ratio(words):
        lst = ", ".join(f"'{w}'" for w in words)
        return (f"len(list_filter({toks_text}, t -> list_contains([{lst}], t)))"
                f" / greatest(len({toks_text}), 1)::DOUBLE")

    from pandas_alchemy_spark.ext.text import STOPWORDS
    # split_corpus leg: cumulative thresholds as exact BIGINT literals
    # (computed by the SAME library helper the Spark side uses, so the
    # two engines share the boundary integers by construction)
    from pandas_alchemy_spark.ext.pipeline import split_thresholds
    _spb = split_thresholds({"train": 0.75, "val": 0.125, "test": 0.125})
    _spbkt = _DK_H60.format(s="CAST(doc_id AS VARCHAR)")
    _spbkt_g = _DK_H60.format(s="lang")
    split_case = (f"CASE WHEN {_spbkt} < {_spb[0][1]} THEN -6 "
                  f"WHEN {_spbkt} < {_spb[1][1]} THEN -7 "
                  f"WHEN {_spbkt} < {_spb[2][1]} THEN -8 END")

    lang_structs = ", ".join(
        "{'score': CAST(%s AS DOUBLE), 'lang': '%s'}" % (stop_ratio(ws), lang)
        for lang, ws in sorted(STOPWORDS.items()))

    # curate_corpus building blocks (plain strings so regex braces
    # never meet an f-string): normalization chain + UNROUNDED quality
    # score (the >= 0.2 gate must see the same double both engines)
    norm_text = (
        "trim(regexp_replace(regexp_replace(lower("
        "regexp_replace(regexp_replace(regexp_replace(text, "
        "'[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', "
        "'[EMAIL]', 'g'), "
        "'(\\+\\d{1,3}[\\s.-]?)?\\(?\\d{3}\\)?[\\s.-]?\\d{3}[\\s.-]?\\d{4}\\b|\\+\\d{7,15}', '[PHONE]', 'g'), "
        "'\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '[IP]', 'g')), "
        "'[\\x00-\\x1f]+', ' ', 'g'), "
        "'\\s{2,}', ' ', 'g'))")
    punct = ("length(regexp_replace(text, '[a-zA-Z0-9\\s]+', '', 'g'))"
             " / greatest(length(text), 1)::DOUBLE")
    mean_wl = ("(list_reduce(list_prepend(0::BIGINT, "
               "list_transform(" + toks_text + ", t -> length(t)::BIGINT)), "
               "(a, b) -> a + b) / greatest(len(" + toks_text +
               "), 1)::DOUBLE)")
    q_raw = ("CASE WHEN len(" + toks_text + ") < 5 THEN 0.0 ELSE "
             "least(1.0, len(" + toks_text + ") / 100.0) * 0.3 "
             "+ (1.0 - least(1.0, (" + punct + ") * 5)) * 0.3 "
             "+ least(1.0, (" + stop_en + ") * 4) * 0.2 "
             "+ CASE WHEN " + mean_wl + " BETWEEN 3 AND 8 "
             "THEN 0.2 ELSE 0.0 END END")

    # per-operator SQL fragments; the emitted dict below composes them
    # into the folded suites matching queries()
    base = {
        "scan_project": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        """,
        "scalar_arith": """
            SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice * (1 - l_discount), 4) AS revenue
            FROM lineitem
        """,
        "ieee_div": """
            SELECT l_orderkey, l_linenumber,
                   CASE
                     WHEN l_linenumber = 3 AND l_quantity = 0 THEN -999999.0
                     WHEN l_linenumber = 3 AND l_quantity > 0 THEN 999999.0
                     WHEN l_linenumber = 3 AND l_quantity < 0 THEN -888888.0
                     ELSE round(l_quantity / (l_linenumber - 3), 6)
                   END AS div_val
            FROM lineitem
        """,
        "ieee_floordiv": """
            SELECT l_orderkey, l_linenumber,
                   CASE
                     WHEN l_linenumber = 3 AND l_quantity = 0 THEN -999999.0
                     WHEN l_linenumber = 3 AND l_quantity > 0 THEN 999999.0
                     WHEN l_linenumber = 3 AND l_quantity < 0 THEN -888888.0
                     ELSE round(floor(l_quantity / (l_linenumber - 3)), 6)
                   END AS fd_val
            FROM lineitem
        """,
        "from_list_positional": """
            SELECT idx::BIGINT AS idx, v::DOUBLE AS v
            FROM (VALUES (0, 10.0), (1, 40.0), (2, 90.0), (3, 160.0))
                 AS t(idx, v)
        """,
        "python_mod": """
            SELECT l_orderkey, l_linenumber,
                   CASE
                     WHEN l_linenumber = 3 THEN -999999.0
                     ELSE round(fmod(fmod(l_quantity, l_linenumber - 3)
                                     + (l_linenumber - 3), l_linenumber - 3), 6)
                   END AS mod_val
            FROM lineitem
        """,
        "clip_round_abs": """
            SELECT c_custkey,
                   round(least(greatest(c_acctbal, -500.0), 5000.0), 1) AS bal_clip,
                   round(abs(c_acctbal), 1) AS bal_abs
            FROM customer
        """,
        "fill_isna": """
            SELECT count(*) FILTER (WHERE l_discount = 0)::BIGINT AS n_null,
                   round(sum(CASE WHEN l_discount = 0 THEN 1.0 ELSE l_discount END), 4) AS sum_filled
            FROM lineitem
        """,
        "align_add_outer": """
            WITH a AS (
              SELECT o_custkey, sum(o_totalprice) AS total
              FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
            ), b AS (
              SELECT o_custkey, sum(o_totalprice) AS total
              FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
            )
            SELECT coalesce(a.o_custkey, b.o_custkey)::BIGINT AS o_custkey,
                   round(a.total + b.total, 2) AS total_both
            FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
        """,
        "col_align_nulls": """
            WITH a AS (
              SELECT l_returnflag, sum(l_quantity) AS x, sum(l_extendedprice) AS y
              FROM lineitem GROUP BY l_returnflag
            ), b AS (
              SELECT l_returnflag, sum(l_discount) AS y, sum(l_tax) AS z
              FROM lineitem GROUP BY l_returnflag
            )
            SELECT coalesce(a.l_returnflag, b.l_returnflag) AS l_returnflag,
                   CAST(NULL AS DOUBLE) AS x,
                   round(a.y + b.y, 2) AS y,
                   CAST(NULL AS DOUBLE) AS z
            FROM a FULL OUTER JOIN b ON a.l_returnflag = b.l_returnflag
        """,
        "head_sorted": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC LIMIT 10
        """,
        "tail_sorted": """
            SELECT o_orderkey, o_custkey FROM orders
            ORDER BY o_orderkey DESC LIMIT 5
        """,
        "iat_scalar": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_orderkey LIMIT 1
        """,
        "from_pandas_literal": """
            SELECT k, CAST(v AS DOUBLE) AS v, CAST(v2 AS DOUBLE) AS v2
            FROM (VALUES ('a', 1.5, 15.0), ('b', 2.5, 25.0),
                         ('c', NULL, NULL)) AS t(k, v, v2)
        """,
        "series_prefix": """
            SELECT 'nation_' || n_nationkey::VARCHAR AS idx, n_name
            FROM nation
        """,
        "bool_coercion": """
            SELECT l_returnflag,
                   sum(CASE WHEN l_quantity > 25 THEN 2 ELSE 0 END
                       + CASE WHEN l_discount < 0.05 THEN 1 ELSE 0 END)::BIGINT AS total_score,
                   count(*)::BIGINT AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "pivot_table": """
            SELECT l_linestatus,
                   round(coalesce(sum(l_quantity) FILTER (WHERE l_returnflag = 'A'),
                     CASE WHEN count(*) FILTER (WHERE l_returnflag = 'A') > 0
                          THEN 0.0 END), 2) AS qty_a,
                   round(coalesce(sum(l_quantity) FILTER (WHERE l_returnflag = 'N'),
                     CASE WHEN count(*) FILTER (WHERE l_returnflag = 'N') > 0
                          THEN 0.0 END), 2) AS qty_n,
                   round(coalesce(sum(l_quantity) FILTER (WHERE l_returnflag = 'R'),
                     CASE WHEN count(*) FILTER (WHERE l_returnflag = 'R') > 0
                          THEN 0.0 END), 2) AS qty_r
            FROM lineitem GROUP BY l_linestatus
        """,
        "melt_unpivot": """
            SELECT c_custkey::BIGINT AS c_custkey, variable,
                   round(value, 2) AS value
            FROM (
              SELECT c_custkey, 'c_acctbal' AS variable,
                     c_acctbal::DOUBLE AS value FROM customer
              UNION ALL
              SELECT c_custkey, 'c_nationkey' AS variable,
                     c_nationkey::DOUBLE AS value FROM customer
            )
        """,
        "grouped_cumsum": """
            SELECT o_orderkey::BIGINT AS o_orderkey,
                   round(sum(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS cum_total
            FROM orders
        """,
        "series_rank": """
            SELECT c_custkey::BIGINT AS c_custkey,
                   rank() OVER (ORDER BY c_acctbal)::BIGINT AS bal_rank
            FROM customer
        """,
        "rolling_sum": """
            SELECT o_orderkey::BIGINT AS o_orderkey,
                   CASE WHEN count(*) OVER w >= 3
                        THEN round(sum(o_totalprice) OVER w, 2)
                   END AS roll_sum
            FROM orders
            WINDOW w AS (ORDER BY o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "isin_between": """
            SELECT l_returnflag, count(l_orderkey)::BIGINT AS n,
                   round(sum(l_quantity), 2) AS qty
            FROM lineitem
            WHERE l_returnflag IN ('A', 'R')
              AND l_quantity BETWEEN 10 AND 20
            GROUP BY l_returnflag
        """,
        "concat_union": """
            WITH u AS (
              SELECT o_orderkey, o_totalprice, NULL::BIGINT AS o_custkey
              FROM orders WHERE o_totalprice > 200000.0
              UNION ALL
              SELECT o_orderkey, NULL::DOUBLE AS o_totalprice, o_custkey
              FROM orders WHERE o_totalprice < 50000.0
            )
            SELECT count(*)::BIGINT AS n_rows,
                   count(o_totalprice)::BIGINT AS n_price,
                   count(o_custkey)::BIGINT AS n_cust,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM u
        """,
        "str_funcs": """
            SELECT c_custkey,
                   lower(c_mktsegment) AS seg_lower,
                   length(c_mktsegment)::BIGINT AS seg_len,
                   contains(c_mktsegment, 'ING') AS has_ing,
                   replace(c_mktsegment, 'I', '1') AS seg_us,
                   substring(c_mktsegment, 1, 3) AS seg_3
            FROM customer
        """,
        "dt_funcs": """
            SELECT 'dt' AS tag, year(o_orderdate)::BIGINT AS yr,
                   quarter(o_orderdate)::BIGINT AS qtr,
                   count(*)::BIGINT AS n,
                   sum(isodow(o_orderdate) - 1)::DOUBLE AS v
            FROM orders
            GROUP BY 2, 3
            UNION ALL
            SELECT 'resample_ms', year(b)::BIGINT, month(b)::BIGINT,
                   count(*)::BIGINT, round(sum(o_totalprice), 2)
            FROM (SELECT date_trunc('month', o_orderdate) AS b,
                         o_totalprice FROM orders)
            GROUP BY 2, 3
            UNION ALL
            SELECT 'to_dt', year(o_orderdate)::BIGINT,
                   month(o_orderdate)::BIGINT, count(*)::BIGINT,
                   sum(day(o_orderdate))::DOUBLE
            FROM orders
            GROUP BY 2, 3
            UNION ALL
            SELECT 'at', c_custkey::BIGINT, NULL::BIGINT, 1::BIGINT,
                   c_acctbal::DOUBLE
            FROM customer WHERE c_custkey IN (7, 11)
            UNION ALL
            SELECT 'roll7d', year(o_orderdate)::BIGINT,
                   month(o_orderdate)::BIGINT, count(*)::BIGINT,
                   max(r)::DOUBLE
            FROM (SELECT o_orderdate,
                         sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           OVER (ORDER BY epoch_us(o_orderdate::TIMESTAMP)
                                 RANGE BETWEEN 604799999999 PRECEDING
                                 AND CURRENT ROW) AS r
                  FROM orders)
            GROUP BY 2, 3
            UNION ALL
            SELECT 'drange', year(d)::BIGINT, month(d)::BIGINT,
                   count(*)::BIGINT, sum(day(d))::DOUBLE
            FROM (SELECT unnest(generate_series(
                           DATE '1997-02-25',
                           DATE '1997-02-25' + INTERVAL 39 DAY,
                           INTERVAL 1 DAY)) AS d)
            GROUP BY 2, 3
            UNION ALL
            -- tz subset: fixed +05:30 wall time = ts + 330 min
            SELECT 'tz', hour(z)::BIGINT, NULL::BIGINT,
                   count(*)::BIGINT, sum(day(z))::DOUBLE
            FROM (SELECT ts + INTERVAL 330 MINUTE AS z FROM events)
            GROUP BY 2
        """,
        "groupby_agg": """
            SELECT g.l_returnflag, g.l_linestatus, g.sum_qty,
                   g.sum_disc_price, g.avg_qty, g.count_order,
                   d.n_orders, d.n_parts
            FROM (
              SELECT l_returnflag, l_linestatus,
                     round(sum(l_quantity), 2) AS sum_qty,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                     round(avg(l_quantity), 4) AS avg_qty,
                     count(l_quantity)::BIGINT AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-01'
              GROUP BY l_returnflag, l_linestatus
            ) g JOIN (
              SELECT l_returnflag,
                     count(DISTINCT l_orderkey)::BIGINT AS n_orders,
                     count(DISTINCT l_partkey)::BIGINT AS n_parts
              FROM lineitem GROUP BY l_returnflag
            ) d ON g.l_returnflag = d.l_returnflag
        """,
        "q3_shipping": """
            SELECT l_orderkey::BIGINT AS l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "q5_local_supplier": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name
        """,
        "q6_forecast": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*)::BIGINT AS n
            FROM lineitem
            WHERE l_quantity < 24 AND l_discount >= 0.05 AND l_discount <= 0.07
        """,
        "q4_semi_join": """
            SELECT o_orderpriority, count(o_orderkey)::BIGINT AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "anti_join": """
            SELECT c_nationkey::BIGINT AS c_nationkey,
                   count(c_custkey)::BIGINT AS n_customers
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_totalprice > 300000.0)
            GROUP BY c_nationkey
        """,
        "window_topk": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
                   rk::BIGINT AS rk
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders) t
            WHERE rk <= 3
        """,
        "explode_embedding": """
            SELECT 'explode' AS tag, vec_id,
                   round(unnest(embedding)::DOUBLE, 5) + 0.0 AS val
            FROM embeddings
            UNION ALL
            SELECT 'len', vec_id,
                   round(len(embedding)::DOUBLE, 1) + 0.0
            FROM embeddings
            UNION ALL
            SELECT 'get0', vec_id,
                   round(embedding[1]::DOUBLE, 5) + 0.0
            FROM embeddings
            UNION ALL
            SELECT 'sum', vec_id,
                   round(list_sum(list_transform(embedding,
                         x -> x::DOUBLE)), 4) + 0.0
            FROM embeddings
            UNION ALL
            SELECT 'norm', vec_id,
                   round(sqrt(list_sum(list_transform(embedding,
                         x -> x::DOUBLE * x::DOUBLE))), 4) + 0.0
            FROM embeddings
        """,
        "get_dummies": """
            SELECT sum((l_returnflag = 'A')::INT)::BIGINT AS rf_a,
                   sum((l_returnflag = 'N')::INT)::BIGINT AS rf_n,
                   sum((l_returnflag = 'R')::INT)::BIGINT AS rf_r
            FROM lineitem
        """,
        "sample_hash": """
            SELECT 'plain' AS tag, count(*)::BIGINT AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM orders
            WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
                  < CAST(0.1 * 1152921504606846976 AS BIGINT)
            UNION ALL
            SELECT 'strat:' || o_orderpriority, count(*)::BIGINT,
                   round(sum(o_totalprice), 2)
            FROM orders
            WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
                  < CASE o_orderpriority
                      WHEN '1-URGENT'
                        THEN CAST(0.5 * 1152921504606846976 AS BIGINT)
                      WHEN '5-LOW'
                        THEN CAST(0.1 * 1152921504606846976 AS BIGINT)
                    END
            GROUP BY o_orderpriority
        """,
        "asof_join": """
            WITH ev AS (SELECT event_id, user_id,
                               ts - INTERVAL 23 YEAR AS t FROM events),
                 od AS (SELECT o_custkey AS user_id, o_orderdate AS t,
                               max(o_totalprice) AS tp
                        FROM orders GROUP BY 1, 2)
            SELECT ev.user_id, count(*)::BIGINT AS n,
                   count(tp)::BIGINT AS matched,
                   round(max(tp), 2) AS max_tp,
                   round(min(tp), 2) AS min_tp
            FROM ev ASOF LEFT JOIN od
              ON ev.user_id = od.user_id AND ev.t >= od.t
            GROUP BY ev.user_id
        """,
        "stats_summary": """
            SELECT round(quantile_cont(l_quantity, 0.25), 4) AS q25,
                   round(quantile_cont(l_quantity, 0.5), 4) AS med,
                   round(quantile_cont(l_quantity, 0.75), 4) AS q75,
                   round(corr(l_quantity, l_extendedprice), 6) AS corr,
                   round(covar_samp(l_quantity, l_extendedprice), 2) AS cov,
                   round(stddev_samp(l_extendedprice), 2) AS sd
            FROM lineitem
        """,
        "groupby_apply": """
            SELECT 'apply' AS tag, l_returnflag AS rf,
                   l_orderkey::BIGINT AS k, l_quantity::DOUBLE AS v
            FROM (SELECT l_returnflag, l_orderkey, l_quantity,
                         row_number() OVER (PARTITION BY l_returnflag
                           ORDER BY l_quantity DESC, l_orderkey,
                                    l_linenumber) AS rn
                  FROM lineitem) t
            WHERE rn <= 2
            UNION ALL
            SELECT 'filter', l_returnflag, count(*)::BIGINT,
                   sum(l_quantity)::DOUBLE
            FROM lineitem
            WHERE l_orderkey < 100 AND l_returnflag IN
                  (SELECT l_returnflag FROM lineitem
                   WHERE l_orderkey < 100
                   GROUP BY 1 HAVING sum(l_quantity) > 3250)
            GROUP BY l_returnflag
            UNION ALL
            SELECT 'h', o_orderpriority, o_orderkey,
                   round(o_totalprice, 2)
            FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                         row_number() OVER (PARTITION BY o_orderpriority
                                            ORDER BY o_orderkey) AS rn
                  FROM orders) t WHERE rn <= 2
            UNION ALL
            SELECT 'n', o_orderpriority, o_orderkey, NULL::DOUBLE
            FROM (SELECT o_orderpriority, o_orderkey,
                         row_number() OVER (PARTITION BY o_orderpriority
                                            ORDER BY o_orderkey) AS rn
                  FROM orders) t WHERE rn = 2
            UNION ALL
            -- cumcount sum = sum over groups of n(n-1)/2
            SELECT 'c', '*',
                   sum(n * (n - 1) / 2)::BIGINT, NULL::DOUBLE
            FROM (SELECT count(*) AS n FROM orders
                  GROUP BY o_orderpriority) t
            UNION ALL
            -- ngroup sum = sum of group_size * (dense rank - 1)
            SELECT 'g', '*',
                   sum(n * (r - 1))::BIGINT, NULL::DOUBLE
            FROM (SELECT count(*) AS n,
                         dense_rank() OVER (ORDER BY o_orderpriority)
                           AS r
                  FROM orders GROUP BY o_orderpriority) t
        """,
        "q10_returned": """
            SELECT c.c_custkey, c.c_name, n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                     AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
            GROUP BY c.c_custkey, c.c_name, n.n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "q18_large_orders": """
            WITH t AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
                       FROM lineitem GROUP BY l_orderkey
                       HAVING sum(l_quantity) > 300)
            SELECT t.l_orderkey AS o_orderkey, c.c_name,
                   round(o.o_totalprice, 2) AS o_totalprice,
                   round(t.total_qty, 2) AS total_qty
            FROM t JOIN orders o ON t.l_orderkey = o.o_orderkey
                   JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "q19_disjunct": """
            SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                     AS revenue,
                   count(*)::BIGINT AS n
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
                   AND p.p_size <= 5)
               OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
                   AND p.p_size <= 10)
               OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
                   AND p.p_size <= 15)
        """,
        "query_expr": """
            SELECT l_returnflag, count(*)::BIGINT AS n,
                   round(sum(l_quantity), 2) AS qty
            FROM lineitem
            WHERE l_quantity < 10 AND l_discount >= 0.05
            GROUP BY l_returnflag
        """,
        "qcut_bins": """
            WITH e AS (
              SELECT quantile_cont(l_extendedprice,
                                   [0.0, 0.25, 0.5, 0.75, 1.0]) AS ed
              FROM lineitem)
            SELECT CASE
                     WHEN l_extendedprice >= ed[1]
                          AND l_extendedprice <= ed[2] THEN 0
                     WHEN l_extendedprice > ed[2]
                          AND l_extendedprice <= ed[3] THEN 1
                     WHEN l_extendedprice > ed[3]
                          AND l_extendedprice <= ed[4] THEN 2
                     WHEN l_extendedprice > ed[4]
                          AND l_extendedprice <= ed[5] THEN 3
                   END AS qb,
                   count(*)::BIGINT AS n,
                   round(avg(l_quantity), 3) AS avg_qty
            FROM lineitem, e GROUP BY 1
        """,
        "cohort_retention": """
            WITH f AS (SELECT user_id,
                              min(ts::DATE) AS cohort_day
                       FROM events GROUP BY user_id),
                 a AS (SELECT DISTINCT user_id, ts::DATE AS day
                       FROM events)
            SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
                   (a.day - f.cohort_day)::BIGINT AS day_offset,
                   count(DISTINCT a.user_id)::BIGINT AS n_users
            FROM a JOIN f ON a.user_id = f.user_id
            GROUP BY 1, 2
        """,
        "interval_join": """
            WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t
                       FROM events)
            SELECT a.user_id, count(*)::BIGINT AS n_pairs,
                   max(abs(a.t - b.t))::BIGINT AS max_gap_us
            FROM e a JOIN e b
              ON a.user_id = b.user_id
             AND a.event_id < b.event_id
             AND abs(a.t - b.t) <= 120000000
            GROUP BY a.user_id
        """,
        "corr_matrix": """
            SELECT 'l_quantity' AS col,
                   1.0 AS l_quantity,
                   round(corr(l_quantity, l_extendedprice), 6) AS l_extendedprice,
                   round(corr(l_quantity, l_discount), 6) AS l_discount
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice',
                   round(corr(l_quantity, l_extendedprice), 6),
                   1.0,
                   round(corr(l_extendedprice, l_discount), 6)
            FROM lineitem
            UNION ALL
            SELECT 'l_discount',
                   round(corr(l_quantity, l_discount), 6),
                   round(corr(l_extendedprice, l_discount), 6),
                   1.0
            FROM lineitem
        """,
        "frame_reduce": """
            SELECT round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_price,
                   round(sum(l_discount), 2) AS sum_disc,
                   round(avg(l_quantity), 3) AS avg_qty,
                   round(avg(l_extendedprice), 2) AS avg_price,
                   CAST(sum(CAST(round((l_quantity + l_discount
                                        + l_tax) * 100) AS BIGINT))
                        AS BIGINT) AS rowsum100
            FROM lineitem
        """,
        "where_replace": """
            SELECT CASE WHEN l_returnflag = 'A' THEN 'AA'
                        WHEN l_returnflag = 'R' THEN 'RR'
                        ELSE l_returnflag END AS rf,
                   round(sum(CASE WHEN l_quantity < 25 THEN l_quantity
                             ELSE 0.0 END), 2) AS total,
                   count(*)::BIGINT AS n
            FROM lineitem GROUP BY 1
        """,
        "dup_stats": """
            WITH c AS (SELECT o_custkey, count(*) AS cnt,
                              sum(o_orderkey) AS s,
                              min(o_orderkey) AS mn,
                              max(o_orderkey) AS mx
                       FROM orders GROUP BY o_custkey)
            SELECT (sum(cnt) - count(*))::BIGINT AS n_dup_first,
                   sum(s - mn)::BIGINT AS sum_dup_first,
                   sum(s - mx)::BIGINT AS sum_dup_last,
                   coalesce(sum(cnt) FILTER (cnt > 1), 0)::BIGINT
                     AS n_dup_all
            FROM c
        """,
        "cut_bins": """
            SELECT CASE WHEN l_quantity > 0 AND l_quantity <= 10
                          THEN '(0, 10]'
                        WHEN l_quantity > 10 AND l_quantity <= 20
                          THEN '(10, 20]'
                        WHEN l_quantity > 20 AND l_quantity <= 30
                          THEN '(20, 30]'
                        WHEN l_quantity > 30 AND l_quantity <= 40
                          THEN '(30, 40]'
                        WHEN l_quantity > 40 AND l_quantity <= 50
                          THEN '(40, 50]'
                        END AS bin,
                   count(*)::BIGINT AS n,
                   round(avg(l_extendedprice), 2) AS avg_price
            FROM lineitem GROUP BY 1
        """,
        "pct_change": """
            SELECT o_orderkey,
                   round(o_totalprice / lag(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderkey) - 1,
                     6) AS pct
            FROM orders
        """,
        "idx_extrema": """
            SELECT arg_max(o_orderkey, o_totalprice)::BIGINT AS key_max,
                   arg_min(o_orderkey, o_totalprice)::BIGINT AS key_min
            FROM orders
        """,
        "value_counts": """
            SELECT o_orderpriority, count(*)::BIGINT AS n
            FROM orders GROUP BY o_orderpriority
        """,
        "describe": """
            SELECT 'count' AS stat,
                   round(count(l_quantity)::DOUBLE, 3) AS l_quantity,
                   round(count(l_discount)::DOUBLE, 3) AS l_discount
            FROM lineitem
            UNION ALL SELECT 'mean', round(avg(l_quantity), 3),
                   round(avg(l_discount), 3) FROM lineitem
            UNION ALL SELECT 'std', round(stddev_samp(l_quantity), 3),
                   round(stddev_samp(l_discount), 3) FROM lineitem
            UNION ALL SELECT 'min', round(min(l_quantity), 3),
                   round(min(l_discount), 3) FROM lineitem
            UNION ALL SELECT '25%', round(quantile_cont(l_quantity, 0.25), 3),
                   round(quantile_cont(l_discount, 0.25), 3) FROM lineitem
            UNION ALL SELECT '50%', round(quantile_cont(l_quantity, 0.5), 3),
                   round(quantile_cont(l_discount, 0.5), 3) FROM lineitem
            UNION ALL SELECT '75%', round(quantile_cont(l_quantity, 0.75), 3),
                   round(quantile_cont(l_discount, 0.75), 3) FROM lineitem
            UNION ALL SELECT 'max', round(max(l_quantity), 3),
                   round(max(l_discount), 3) FROM lineitem
        """,
        "iloc_slice": """
            SELECT o_orderkey, o_custkey,
                   round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_orderkey LIMIT 5 OFFSET 10
        """,
        "events_hourly": """
            WITH b AS (
              SELECT date_trunc('hour', ts) AS h, event_type,
                     count(*)::BIGINT AS n,
                     round(sum(value), 4) AS sv,
                     count(DISTINCT user_id)::BIGINT AS nu
              FROM events GROUP BY 1, 2),
            g AS (
              SELECT unnest(generate_series(mn, mx,
                                            INTERVAL 1 HOUR)) AS h
              FROM (SELECT min(date_trunc('hour', ts)) AS mn,
                           max(date_trunc('hour', ts)) AS mx
                    FROM events)),
            t AS (SELECT DISTINCT event_type FROM events)
            SELECT strftime(g.h, '%Y-%m-%d %H:%M:%S') AS window_start,
                   t.event_type,
                   coalesce(b.n, 0)::BIGINT AS n_events,
                   round(coalesce(b.sv, 0), 4) AS sum_value,
                   coalesce(b.nu, 0)::BIGINT AS n_users
            FROM g CROSS JOIN t
            LEFT JOIN b ON b.h = g.h AND b.event_type = t.event_type
        """,
        "sessionize": """
            WITH marked AS (
              SELECT user_id, ts, value,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
              SELECT *, sum(new_session) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
              FROM marked
            )
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM sess GROUP BY user_id, session_seq
        """,
        "top_users": """
            SELECT user_id, round(sum(value), 4) AS total_value,
                   count(*)::BIGINT AS n_events,
                   row_number() OVER (ORDER BY round(sum(value), 4) DESC, user_id ASC)::BIGINT AS rank
            FROM events GROUP BY user_id
            ORDER BY total_value DESC, user_id ASC LIMIT 10
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id)::BIGINT AS keep_id,
                   count(*)::BIGINT AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "dedup_minhash": f"""
            WITH sh AS (
              SELECT doc_id, {_dk_shingles("text", distinct=False)} AS s
              FROM documents
            ), hset AS (
              SELECT doc_id,
                     list_distinct(list_transform(s, x -> {_DK_H60.format(s="x")})) AS hs
              FROM sh WHERE len(s) > 0
            ), sigs AS (
              SELECT doc_id, hs,
                     list_transform(range(0, 16), k ->
                       list_min(list_transform(hs, x ->
                         ((2 * k + 1) * (x % 2147483647) + (12345 + k * 7919)) % 2147483647))) AS sig
              FROM hset
            ), banded AS (
              SELECT doc_id, hs, b.band,
                     array_to_string(sig[b.band * 4 + 1: b.band * 4 + 4], ',') AS bh
              FROM sigs, (SELECT unnest(range(0, 4)) AS band) b
            ), cand AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                     l.hs AS sa, r.hs AS sb
              FROM banded l JOIN banded r
                ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
            )
            SELECT id_a, id_b,
                   round(len(list_intersect(sa, sb))
                         / (len(sa) + len(sb) - len(list_intersect(sa, sb)))::DOUBLE, 6) AS jaccard
            FROM cand
            WHERE len(list_intersect(sa, sb))
                  / (len(sa) + len(sb) - len(list_intersect(sa, sb)))::DOUBLE >= 0.4
        """,
        "dedup_cluster": f"""
            WITH RECURSIVE sh AS (
              SELECT doc_id, {_dk_shingles("text", distinct=False)} AS s
              FROM documents
            ), hset AS (
              SELECT doc_id,
                     list_distinct(list_transform(s, x -> {_DK_H60.format(s="x")})) AS hs
              FROM sh WHERE len(s) > 0
            ), sigs AS (
              SELECT doc_id, hs,
                     list_transform(range(0, 16), k ->
                       list_min(list_transform(hs, x ->
                         ((2 * k + 1) * (x % 2147483647) + (12345 + k * 7919)) % 2147483647))) AS sig
              FROM hset
            ), banded AS (
              SELECT doc_id, hs, b.band,
                     array_to_string(sig[b.band * 4 + 1: b.band * 4 + 4], ',') AS bh
              FROM sigs, (SELECT unnest(range(0, 4)) AS band) b
            ), cand AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                     l.hs AS sa, r.hs AS sb
              FROM banded l JOIN banded r
                ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
            ), pairs AS (
              SELECT id_a, id_b FROM cand
              WHERE len(list_intersect(sa, sb))
                    / (len(sa) + len(sb) - len(list_intersect(sa, sb)))::DOUBLE >= 0.4
            ), e AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b AS a, id_a AS b FROM pairs
            ), reach AS (
              SELECT a, b FROM e
              UNION
              SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
            ), lab AS (
              SELECT a AS id, min(b) AS mn FROM reach GROUP BY a
            )
            SELECT d.doc_id AS id,
                   coalesce(least(l.mn, d.doc_id), d.doc_id)::BIGINT
                     AS component,
                   (coalesce(least(l.mn, d.doc_id), d.doc_id) = d.doc_id)
                     AS keep
            FROM documents d LEFT JOIN lab l ON d.doc_id = l.id
        """,
        "dedup_simhash": f"""
            WITH tok AS (
              SELECT doc_id, unnest({toks_text}) AS t FROM documents
            ), th AS (
              SELECT doc_id, {_DK_H60.format(s="t")} AS h FROM tok
            ), bits AS (
              SELECT doc_id, b.b,
                     sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM th, (SELECT unnest(range(0, 60)) AS b) b
              GROUP BY doc_id, b.b
            ), sig AS (
              SELECT doc_id,
                     sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sh
              FROM bits GROUP BY doc_id
            ), chunked AS (
              SELECT doc_id, sh, c.c AS chunk, (sh >> (c.c * 15)) & 32767 AS ch
              FROM sig, (SELECT unnest(range(0, 4)) AS c) c
            ), cand AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                     l.sh AS sha, r.sh AS shb
              FROM chunked l JOIN chunked r
                ON l.chunk = r.chunk AND l.ch = r.ch AND l.doc_id < r.doc_id
            )
            SELECT id_a, id_b, bit_count(xor(sha, shb))::BIGINT AS hamming
            FROM cand WHERE bit_count(xor(sha, shb)) <= 8
        """,
        "ngram_jaccard": f"""
            WITH sh AS (
              SELECT doc_id, {_dk_shingles("text", distinct=False)} AS s FROM documents
            ), hset AS (
              SELECT doc_id,
                     list_distinct(list_transform(s, x -> {_DK_H60.format(s="x")})) AS hs
              FROM sh WHERE len(s) > 0
            ), ex AS (
              SELECT doc_id, len(hs) AS sz, unnest(hs) AS g FROM hset
            ), inter AS (
              SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                     min(l.sz) AS sz_a, min(r.sz) AS sz_b,
                     count(*)::BIGINT AS n_inter
              FROM ex l JOIN ex r ON l.g = r.g AND l.doc_id < r.doc_id
              GROUP BY l.doc_id, r.doc_id
            )
            SELECT id_a, id_b,
                   round(n_inter / (sz_a + sz_b - n_inter)::DOUBLE, 6) AS jaccard
            FROM inter
            WHERE n_inter / (sz_a + sz_b - n_inter)::DOUBLE >= 0.5
        """,
        "cosine_topk": """
            WITH pairs AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     list_reduce(list_transform(list_zip(q.embedding, c.embedding),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                                 (a, b) -> a + b)
                     / nullif(
                         sqrt(list_reduce(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
                         * sqrt(list_reduce(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)),
                         0.0) AS cosine
              FROM embeddings q JOIN embeddings c ON q.vec_id < 5
                   AND c.vec_id != q.vec_id
            ), ranked AS (
              SELECT query_id, neighbor_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM pairs
            )
            SELECT query_id, neighbor_id, round(cosine, 4) AS cosine,
                   rank::BIGINT AS rank
            FROM ranked WHERE rank <= 5
        """,
        "emb_near_dup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(
                     list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                                 (x, y) -> x + y)
                     / nullif(
                         sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
                         * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)),
                         0.0), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                              (x, y) -> x + y)
                  / nullif(
                      sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
                      * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)),
                      0.0) >= 0.45
        """,
        "funnel": """
            WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
                 s1 AS (SELECT e.user_id, min(e.ts) AS t1
                        FROM events e JOIN s0 ON e.user_id = s0.user_id
                        WHERE e.event_type = 'click' AND e.ts > s0.t0
                        GROUP BY e.user_id),
                 s2 AS (SELECT e.user_id, min(e.ts) AS t2
                        FROM events e JOIN s1 ON e.user_id = s1.user_id
                        WHERE e.event_type = 'purchase' AND e.ts > s1.t1
                        GROUP BY e.user_id)
            SELECT (SELECT count(*) FROM s0)::BIGINT AS n_step0,
                   (SELECT count(*) FROM s1)::BIGINT AS n_step1,
                   (SELECT count(*) FROM s2)::BIGINT AS n_step2
        """,
        "top_terms": """
            WITH t AS (
              SELECT unnest(list_filter(string_split_regex(lower(
                       regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')),
                       ' '), x -> x != '')) AS term
              FROM documents)
            SELECT term, count(*)::BIGINT AS tf
            FROM t GROUP BY term
            ORDER BY tf DESC, term ASC LIMIT 25
        """,
        "text_normalize": """
            WITH n AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(lower(
                       regexp_replace(regexp_replace(regexp_replace(text,
                         '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                         '[EMAIL]', 'g'),
                         '(\\+\\d{1,3}[\\s.-]?)?\\(?\\d{3}\\)?[\\s.-]?\\d{3}[\\s.-]?\\d{4}\\b|\\+\\d{7,15}', '[PHONE]', 'g'),
                         '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '[IP]', 'g')),
                       '[\\x00-\\x1f]+', ' ', 'g'),
                       '\\s{2,}', ' ', 'g')) AS norm_text
              FROM documents)
            SELECT doc_id, md5(norm_text) AS h,
                   length(norm_text)::BIGINT AS n
            FROM n
        """,
        "repetition": """
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(regexp_replace(
                       text, '[^a-zA-Z0-9]+', ' ', 'g')), ' '),
                       x -> x != '') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                     list_transform(range(1, greatest(len(toks), 1)),
                       i -> toks[i] || ' ' || toks[i + 1]) AS grams
              FROM t),
            e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            c AS (SELECT doc_id, gram, count(*) AS cnt
                  FROM e GROUP BY doc_id, gram),
            s AS (SELECT doc_id, sum(cnt) AS n, count(*) AS nd,
                         max(cnt) AS top
                  FROM c GROUP BY doc_id)
            SELECT g.doc_id,
                   coalesce(s.n, 0)::BIGINT AS n_2grams,
                   coalesce(s.nd, 0)::BIGINT AS n_distinct_2grams,
                   coalesce(s.top, 0)::BIGINT AS top_2gram_count,
                   round(CASE WHEN coalesce(s.n, 0) = 0 THEN 0.0
                         ELSE 1.0 - s.nd / s.n::DOUBLE END,
                         6) AS dup_2gram_frac
            FROM g LEFT JOIN s ON g.doc_id = s.doc_id
        """,
        "langid": f"""
            WITH scored AS (
              SELECT doc_id, unnest([{lang_structs}]) AS sl
              FROM documents
            ), ranked AS (
              SELECT doc_id, sl.score AS score, sl.lang AS lang,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY sl.score DESC, sl.lang DESC) AS rk
              FROM scored
            ), best AS (
              SELECT doc_id,
                     CASE WHEN score > 0 THEN lang ELSE 'unknown' END AS lang_pred,
                     round(score, 6) AS lang_score
              FROM ranked WHERE rk = 1
            )
            SELECT lang_pred, count(*)::BIGINT AS n,
                   round(avg(lang_score), 6) AS avg_score
            FROM best GROUP BY lang_pred
        """,
        "quality": f"""
            SELECT doc_id,
                   length(text)::BIGINT AS q_n_chars,
                   len({toks_text})::BIGINT AS q_n_tokens,
                   round(list_reduce(list_prepend(0::BIGINT,
                         list_transform({toks_text}, t -> length(t)::BIGINT)), (a, b) -> a + b)
                         / greatest(len({toks_text}), 1)::DOUBLE, 6) AS q_mean_word_len,
                   round(length(regexp_replace(text, '[a-zA-Z0-9\\s]+', '', 'g'))
                         / greatest(length(text), 1)::DOUBLE, 6) AS q_punct_ratio,
                   round({stop_en}, 6) AS q_stopword_ratio,
                   round(CASE WHEN len({toks_text}) < 5 THEN 0.0 ELSE
                     least(1.0, len({toks_text}) / 100.0) * 0.3
                     + (1.0 - least(1.0, (length(regexp_replace(text, '[a-zA-Z0-9\\s]+', '', 'g'))
                                          / greatest(length(text), 1)::DOUBLE) * 5)) * 0.3
                     + least(1.0, ({stop_en}) * 4) * 0.2
                     + CASE WHEN (list_reduce(list_prepend(0::BIGINT,
                              list_transform({toks_text}, t -> length(t)::BIGINT)), (a, b) -> a + b)
                              / greatest(len({toks_text}), 1)::DOUBLE) BETWEEN 3 AND 8
                            THEN 0.2 ELSE 0.0 END
                   END, 6) AS q_score
            FROM documents
        """,
        "token_stats": f"""
            SELECT doc_id,
                   len({toks_text})::BIGINT AS n_ws_tokens,
                   (list_reduce(list_prepend(0::BIGINT,
                      list_transform({toks_text}, t -> ceil(length(t) / 4.0)::BIGINT)),
                      (a, b) -> a + b)
                    + length(regexp_replace(text, '[a-zA-Z0-9\\s]+', '', 'g')))::BIGINT AS n_bpe_tokens
            FROM documents
        """,
        "fingerprint": f"""
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct({toks_text})), ' ')) AS fingerprint
            FROM documents
        """,
        "frame_sample": """
            WITH typed AS (
              SELECT doc_id,
                     CASE (('0x' || substr(md5(text), 17, 8))::BIGINT % 3)
                       WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
                       ELSE 'audio/wav' END AS media_type,
                     CASE WHEN (('0x' || substr(md5(text), 17, 8))::BIGINT % 3) = 2
                          THEN 1 + (('0x' || substr(md5(text), 7, 2))::INT % 5)
                          ELSE 1 END AS n_frames
              FROM documents
            ), frames AS (
              SELECT doc_id, media_type,
                     unnest(range(0, n_frames))::INT AS frame_idx
              FROM typed
            )
            SELECT media_type, count(*)::BIGINT AS n_frames,
                   count(DISTINCT doc_id)::BIGINT AS n_docs,
                   max(frame_idx)::BIGINT AS max_frame_idx
            FROM frames GROUP BY media_type
        """,
        "multimodal_stats": """
            WITH dec AS (
              SELECT doc_id,
                     CASE (('0x' || substr(md5(text), 17, 8))::BIGINT % 3)
                       WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
                       ELSE 'audio/wav' END AS media_type,
                     strlen(text)::BIGINT AS n_bytes,
                     16 + (('0x' || substr(md5(text), 1, 2))::INT % 240) AS width,
                     16 + (('0x' || substr(md5(text), 3, 2))::INT % 240) AS height
              FROM documents
            )
            SELECT media_type, count(*)::BIGINT AS n_items,
                   sum(n_bytes)::BIGINT AS total_bytes,
                   round(avg(width), 4) AS avg_width,
                   round(avg(height), 4) AS avg_height
            FROM dec GROUP BY media_type
        """,
    }

    def sub(key: str) -> str:
        return "(" + base[key] + ")"

    return {
        "scan_project": base["scan_project"],
        "arith_ieee": """
            SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice * (1 - l_discount), 4) AS revenue,
                   CASE
                     WHEN l_linenumber = 3 AND l_quantity = 0 THEN -999999.0
                     WHEN l_linenumber = 3 AND l_quantity > 0 THEN 999999.0
                     WHEN l_linenumber = 3 AND l_quantity < 0 THEN -888888.0
                     ELSE round(l_quantity / (l_linenumber - 3), 6)
                   END AS div_val,
                   CASE
                     WHEN l_linenumber = 3 AND l_quantity = 0 THEN -999999.0
                     WHEN l_linenumber = 3 AND l_quantity > 0 THEN 999999.0
                     WHEN l_linenumber = 3 AND l_quantity < 0 THEN -888888.0
                     ELSE round(floor(l_quantity / (l_linenumber - 3)), 6)
                   END AS fd_val,
                   CASE
                     WHEN l_linenumber = 3 THEN -999999.0
                     ELSE round(fmod(fmod(l_quantity, l_linenumber - 3)
                                     + (l_linenumber - 3),
                                     l_linenumber - 3), 6)
                   END AS mod_val
            FROM lineitem
        """,
        "literal_frames": f"""
            SELECT 'list' AS tag, idx::VARCHAR AS key, v AS a,
                   NULL::DOUBLE AS b, NULL::VARCHAR AS s
            FROM {sub("from_list_positional")}
            UNION ALL
            SELECT 'pandas', k, v, v2, NULL::VARCHAR
            FROM {sub("from_pandas_literal")}
            UNION ALL
            SELECT 'prefix', idx, NULL::DOUBLE, NULL::DOUBLE, n_name
            FROM {sub("series_prefix")}
        """,
        "align_suite": f"""
            SELECT 'idx' AS tag, o_custkey::VARCHAR AS key,
                   total_both AS x, NULL::DOUBLE AS y, NULL::DOUBLE AS z
            FROM {sub("align_add_outer")}
            UNION ALL
            SELECT 'col', l_returnflag, x, y, z
            FROM {sub("col_align_nulls")}
            UNION ALL
            SELECT 'cmb', coalesce(a.c_custkey, b.c_custkey)::VARCHAR,
                   round(coalesce(a.bal, b.bal), 2),
                   NULL::DOUBLE, NULL::DOUBLE
            FROM (SELECT c_custkey,
                         CASE WHEN c_acctbal > 0 THEN c_acctbal END
                           AS bal
                  FROM customer WHERE c_custkey < 1000) a
            FULL JOIN (SELECT c_custkey, c_acctbal * 2 AS bal
                       FROM customer WHERE c_custkey >= 500) b
              ON a.c_custkey = b.c_custkey
            UNION ALL
            -- equals contract: equal rebuild -> 1, perturbed -> 0
            SELECT 'eq', '*', 1.0, 0.0, NULL::DOUBLE
        """,
        "positional_suite": f"""
            SELECT 'head' AS tag, o_orderkey, NULL::BIGINT AS o_custkey,
                   round(o_totalprice, 2) AS o_totalprice
            FROM {sub("head_sorted")}
            UNION ALL
            SELECT 'tail', o_orderkey, o_custkey, NULL::DOUBLE
            FROM {sub("tail_sorted")}
            UNION ALL
            SELECT 'iat', o_orderkey, NULL::BIGINT, o_totalprice
            FROM {sub("iat_scalar")}
            UNION ALL
            SELECT 'iloc', o_orderkey, o_custkey, o_totalprice
            FROM {sub("iloc_slice")}
            UNION ALL
            -- fused frame scans: exact-cents running sum + lag(1),
            -- sampled every 997th orderkey (windows run pre-filter)
            SELECT 'fscan', o_orderkey,
                   lag(o_custkey) OVER w AS o_custkey,
                   (sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    OVER w)::DOUBLE AS o_totalprice
            FROM orders
            WINDOW w AS (ORDER BY o_orderkey)
            QUALIFY o_orderkey % 997 = 0
        """,
        "customer_scalar": f"""
            SELECT a.c_custkey, a.bal_clip, a.bal_abs, b.bal_rank
            FROM {sub("clip_round_abs")} a
            JOIN {sub("series_rank")} b ON a.c_custkey = b.c_custkey
        """,
        "flag_masks": f"""
            WITH bc AS (SELECT l_returnflag, total_score, n AS n_bc
                        FROM {sub("bool_coercion")}),
                 ib AS (SELECT l_returnflag, n AS n_ib, qty AS qty_ib
                        FROM {sub("isin_between")}),
                 qe AS (SELECT l_returnflag, n AS n_qe, qty AS qty_qe
                        FROM {sub("query_expr")})
            SELECT coalesce(bc.l_returnflag, ib.l_returnflag,
                            qe.l_returnflag) AS l_returnflag,
                   total_score, n_bc, n_ib, qty_ib, n_qe, qty_qe
            FROM bc
            FULL JOIN ib ON bc.l_returnflag = ib.l_returnflag
            FULL JOIN qe
              ON coalesce(bc.l_returnflag, ib.l_returnflag)
                 = qe.l_returnflag
        """,
        "window_suite": """
            SELECT o_orderkey::BIGINT AS o_orderkey,
                   round(sum(o_totalprice) OVER wc, 2) AS cum_total,
                   CASE WHEN count(*) OVER wr >= 3
                        THEN round(sum(o_totalprice) OVER wr, 2)
                   END AS roll_sum,
                   round(o_totalprice / lag(o_totalprice) OVER wp - 1,
                         6) AS pct,
                   round(lag(o_totalprice, 2) OVER wg, 2) AS sh,
                   round(o_totalprice - lag(o_totalprice, 3) OVER wg,
                         2) AS dif,
                   round(last_value(mv IGNORE NULLS)
                         OVER wgr, 2) AS fwd,
                   round(coalesce(mv, lag(mv, 1) OVER wg,
                                  lag(mv, 2) OVER wg), 2) AS fwdl,
                   -- global linear interpolate, forward direction:
                   -- same expression tree as the engine's segscan
                   -- (raw doubles, bit-exact — no rounding contract)
                   CASE WHEN mv IS NOT NULL THEN mv
                        WHEN last_value(mv IGNORE NULLS)
                             OVER wgr IS NULL THEN NULL
                        WHEN first_value(mv IGNORE NULLS)
                             OVER wgf IS NULL
                        THEN last_value(mv IGNORE NULLS) OVER wgr
                        ELSE last_value(mv IGNORE NULLS) OVER wgr
                             + (first_value(mv IGNORE NULLS) OVER wgf
                                - last_value(mv IGNORE NULLS) OVER wgr)
                               / (first_value(CASE WHEN mv IS NOT NULL
                                              THEN CAST(grn AS DOUBLE)
                                              END IGNORE NULLS) OVER wgf
                                  - last_value(CASE WHEN mv IS NOT NULL
                                               THEN CAST(grn AS DOUBLE)
                                               END IGNORE NULLS) OVER wgr)
                               * (CAST(grn AS DOUBLE)
                                  - last_value(CASE WHEN mv IS NOT NULL
                                               THEN CAST(grn AS DOUBLE)
                                               END IGNORE NULLS) OVER wgr)
                   END AS itp,
                   -- grouped interpolate (per o_custkey, positions =
                   -- the in-group row_number rn)
                   CASE WHEN mv IS NOT NULL THEN mv
                        WHEN last_value(mv IGNORE NULLS)
                             OVER wc IS NULL THEN NULL
                        WHEN first_value(mv IGNORE NULLS)
                             OVER wcf IS NULL
                        THEN last_value(mv IGNORE NULLS) OVER wc
                        ELSE last_value(mv IGNORE NULLS) OVER wc
                             + (first_value(mv IGNORE NULLS) OVER wcf
                                - last_value(mv IGNORE NULLS) OVER wc)
                               / (first_value(CASE WHEN mv IS NOT NULL
                                              THEN CAST(rn AS DOUBLE)
                                              END IGNORE NULLS) OVER wcf
                                  - last_value(CASE WHEN mv IS NOT NULL
                                               THEN CAST(rn AS DOUBLE)
                                               END IGNORE NULLS) OVER wc)
                               * (CAST(rn AS DOUBLE)
                                  - last_value(CASE WHEN mv IS NOT NULL
                                               THEN CAST(rn AS DOUBLE)
                                               END IGNORE NULLS) OVER wc)
                   END AS itpg,
                   -- percentile rank: exact ints, one double division
                   rank() OVER (ORDER BY o_totalprice)
                   / CAST(count(o_totalprice) OVER () AS DOUBLE)
                   AS rpct,
                   -- rolling(5).median(): odd window, the median is
                   -- an actual data value — raw-double exact
                   CASE WHEN count(*) OVER wm5 >= 5
                        THEN median(o_totalprice) OVER wm5 END
                   AS rmed,
                   -- grouped rolling pair corr (pairs gate = rows:
                   -- orders has no nulls); zero-variance windows are
                   -- NULL in DuckDB and NaN in Spark - the engine
                   -- side normalizes its NaN to NULL
                   CASE WHEN count(*) OVER wcu >= 3
                        THEN round(corr(o_totalprice,
                                        datediff('day',
                                                 DATE '1970-01-01',
                                                 o_orderdate))
                                   OVER wcu, 6) END AS rco,
                   -- rolling sem: pandas WINDOW sem = std/sqrt(n-1)
                   CASE WHEN count(*) OVER wm5 >= 5
                        THEN round(stddev_samp(o_totalprice) OVER wm5
                                   / sqrt(count(o_totalprice)
                                          OVER wm5 - 1), 2)
                   END AS rsem,
                   -- rolling skew: DuckDB skewness is already the
                   -- sample-adjusted G1 pandas computes
                   CASE WHEN count(*) OVER wm7 >= 7
                        THEN round(skewness(o_totalprice) OVER wm7, 6)
                   END AS rskw,
                   round(sum(o_totalprice * pow(0.75, -rn)) OVER wc
                         / sum(pow(0.75, -rn)) OVER wc, 2) AS ewm_price
            FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderkey) AS rn,
                         row_number() OVER (ORDER BY o_orderkey) AS grn,
                         CASE WHEN o_totalprice >= 50000
                              THEN o_totalprice END AS mv
                  FROM orders)
            WINDOW wc AS (PARTITION BY o_custkey ORDER BY o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW),
                   wcf AS (PARTITION BY o_custkey ORDER BY o_orderkey
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING),
                   wr AS (ORDER BY o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                   wm7 AS (ORDER BY o_orderkey
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                   wp AS (PARTITION BY o_custkey ORDER BY o_orderkey),
                   wg AS (ORDER BY o_orderkey),
                   wgr AS (ORDER BY o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW),
                   wgf AS (ORDER BY o_orderkey
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING),
                   wm5 AS (ORDER BY o_orderkey
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                   wcu AS (PARTITION BY o_custkey ORDER BY o_orderkey
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "reshape_suite": f"""
            SELECT 'pivot' AS tag, l_linestatus AS key, qty_a AS a,
                   qty_n AS b, qty_r AS c
            FROM {sub("pivot_table")}
            UNION ALL
            SELECT 'corr', col, l_quantity, l_extendedprice, l_discount
            FROM {sub("corr_matrix")}
        """,
        "scalar_suite": f"""
            SELECT * FROM {sub("fill_isna")},
              (SELECT n_rows, n_price, n_cust,
                      sum_price AS sum_price_cat
               FROM {sub("concat_union")}),
              {sub("get_dummies")},
              (SELECT max(CASE WHEN tag = 'plain' THEN n END)
                        AS n_sample,
                      max(CASE WHEN tag = 'plain' THEN total END)
                        AS total_sample,
                      max(CASE WHEN tag = 'strat:1-URGENT' THEN n END)
                        AS n_strat_urgent,
                      max(CASE WHEN tag = 'strat:1-URGENT' THEN total END)
                        AS total_strat_urgent,
                      max(CASE WHEN tag = 'strat:5-LOW' THEN n END)
                        AS n_strat_low,
                      max(CASE WHEN tag = 'strat:5-LOW' THEN total END)
                        AS total_strat_low
               FROM {sub("sample_hash")}),
              {sub("idx_extrema")},
              {sub("dup_stats")},
              {sub("frame_reduce")},
              {sub("stats_summary")},
              (SELECT round(skewness(l_quantity), 6) AS skew_qty,
                      round(skewness(l_extendedprice), 6)
                        AS skew_price,
                      round(kurtosis(l_quantity), 6) AS kurt_qty,
                      round(stddev_samp(l_extendedprice)
                            / sqrt(count(l_extendedprice)), 4)
                        AS sem_price,
                      count(CASE WHEN l_quantity < 25.0 THEN 1
                            END)::BIGINT AS ss_left,
                      count(CASE WHEN l_quantity <= 25.0 THEN 1
                            END)::BIGINT AS ss_right
               FROM lineitem),
              -- corrwith: full-outer index join, corr skips
              -- pairwise-incomplete rows in both engines
              (SELECT round(corr(a.l_quantity, b.l_quantity), 6)
                        AS cw_qty,
                      round(corr(a.l_extendedprice,
                                 b.l_extendedprice), 6) AS cw_price
               FROM (SELECT l_orderkey, l_quantity, l_extendedprice
                     FROM lineitem WHERE l_linenumber = 1) a
               FULL JOIN (SELECT l_orderkey, l_quantity,
                                 l_extendedprice
                          FROM lineitem WHERE l_linenumber = 2) b
                 ON a.l_orderkey = b.l_orderkey),
              -- Series.autocorr(1): corr of the series with its
              -- index-order lag-1 shift
              (SELECT round(corr(x, xs), 6) AS ac1
               FROM (SELECT o_totalprice AS x,
                            lag(o_totalprice)
                              OVER (ORDER BY o_orderkey) AS xs
                     FROM orders))
        """,
        "bins_suite": f"""
            SELECT 'cut' AS tag, bin, n, avg_price AS metric
            FROM {sub("cut_bins")}
            UNION ALL
            SELECT 'qcut', qb::VARCHAR, n, avg_qty
            FROM {sub("qcut_bins")}
        """,
        "vc_describe": f"""
            SELECT 'vc' AS tag, o_orderpriority AS key, n::DOUBLE AS a,
                   NULL::DOUBLE AS b
            FROM {sub("value_counts")}
            UNION ALL
            SELECT 'describe', stat, l_quantity, l_discount
            FROM {sub("describe")}
            UNION ALL
            -- cat.codes = position in the sorted distinct domain
            SELECT 'cat', c_mktsegment,
                   (dense_rank() OVER (ORDER BY c_mktsegment) - 1)::DOUBLE,
                   count(*)::DOUBLE
            FROM customer GROUP BY c_mktsegment
            UNION ALL
            SELECT 'json', event_type,
                   sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::DOUBLE,
                   count(json_extract_string(props, '$.k'))::DOUBLE
            FROM events GROUP BY event_type
            UNION ALL
            -- HLL leg: exact count is oracle-computable; the error
            -- bucket (|approx-exact|/exact < 0.05 at rsd=0.02) is the
            -- pinned contract for the approximate path
            SELECT 'hll', 'o_custkey',
                   count(DISTINCT o_custkey)::DOUBLE, 1.0::DOUBLE
            FROM orders
            UNION ALL
            -- grouped quantile: q=0.25/0.75 over integer quantities
            -- is dyadic-exact in any interpolation tree
            SELECT 'gq', l_returnflag,
                   quantile_cont(l_quantity, 0.25),
                   quantile_cont(l_quantity, 0.75)
            FROM lineitem GROUP BY l_returnflag
            UNION ALL
            -- to_numeric: parsed priority digits sum; coerced order
            -- statuses are never numeric, so their count is 0
            SELECT 'tonum', o_orderpriority,
                   sum(TRY_CAST(substr(o_orderpriority, 1, 1)
                                AS DOUBLE)),
                   count(TRY_CAST(o_orderstatus AS DOUBLE))::DOUBLE
            FROM orders GROUP BY o_orderpriority
            UNION ALL
            -- factorize: code = first-appearance rank in index order
            SELECT 'fact', c_mktsegment,
                   (rank() OVER (ORDER BY min(c_custkey)) - 1)::DOUBLE,
                   count(*)::DOUBLE
            FROM customer GROUP BY c_mktsegment
        """,
        "melt_unpivot": base["melt_unpivot"],
        "str_funcs": base["str_funcs"],
        "dt_funcs": base["dt_funcs"],
        "groupby_agg": base["groupby_agg"],
        "where_replace": base["where_replace"],
        "q3_shipping": base["q3_shipping"],
        "q5_local_supplier": base["q5_local_supplier"],
        "q6_forecast": base["q6_forecast"],
        "q4_semi_join": base["q4_semi_join"],
        "q10_returned": base["q10_returned"],
        "groupby_apply": base["groupby_apply"],
        "q18_large_orders": base["q18_large_orders"],
        "q19_disjunct": base["q19_disjunct"],
        "anti_join": base["anti_join"],
        "window_topk": base["window_topk"],
        "asof_join": base["asof_join"],
        "interval_join": base["interval_join"],
        "explode_embedding": base["explode_embedding"],
        "reshape2_suite": """
            SELECT 'stack' AS tag, n_nationkey::VARCHAR AS key,
                   'n_regionkey' AS col, n_regionkey::DOUBLE AS val
            FROM nation
            UNION ALL
            SELECT 'stack', n_nationkey::VARCHAR, 'x',
                   n_regionkey * 2.0
            FROM nation
            UNION ALL
            SELECT 'crosstab', p.o_orderpriority, s.col,
                   coalesce(c.val, 0)::DOUBLE
            FROM (SELECT DISTINCT o_orderpriority FROM orders) p
            CROSS JOIN (VALUES ('F'), ('O'), ('P')) s(col)
            LEFT JOIN (SELECT o_orderpriority AS pk,
                              o_orderstatus AS st,
                              count(*)::DOUBLE AS val
                       FROM orders GROUP BY 1, 2) c
              ON c.pk = p.o_orderpriority AND c.st = s.col
            UNION ALL
            SELECT 'cov', t.key, t.col, round(t.val, 2) + 0.0
            FROM (
              WITH cv AS (
                SELECT covar_samp(l_quantity, l_quantity) AS qq,
                       covar_samp(l_quantity, l_extendedprice) AS qe,
                       covar_samp(l_quantity, l_discount) AS qd,
                       covar_samp(l_extendedprice, l_extendedprice) AS ee,
                       covar_samp(l_extendedprice, l_discount) AS ed,
                       covar_samp(l_discount, l_discount) AS dd
                FROM lineitem)
              SELECT 'l_quantity' AS key, 'l_quantity' AS col, qq AS val FROM cv
              UNION ALL SELECT 'l_quantity', 'l_extendedprice', qe FROM cv
              UNION ALL SELECT 'l_quantity', 'l_discount', qd FROM cv
              UNION ALL SELECT 'l_extendedprice', 'l_quantity', qe FROM cv
              UNION ALL SELECT 'l_extendedprice', 'l_extendedprice', ee FROM cv
              UNION ALL SELECT 'l_extendedprice', 'l_discount', ed FROM cv
              UNION ALL SELECT 'l_discount', 'l_quantity', qd FROM cv
              UNION ALL SELECT 'l_discount', 'l_extendedprice', ed FROM cv
              UNION ALL SELECT 'l_discount', 'l_discount', dd FROM cv
            ) t
            UNION ALL
            SELECT 'unstack', u.l_returnflag, x.col, x.val
            FROM (
              SELECT l_returnflag,
                     round(sum(l_quantity) FILTER (l_linestatus = 'F'), 2)
                       AS qty_f,
                     round(sum(l_quantity) FILTER (l_linestatus = 'O'), 2)
                       AS qty_o,
                     round(sum(l_extendedprice)
                           FILTER (l_linestatus = 'F'), 2) AS price_f,
                     round(sum(l_extendedprice)
                           FILTER (l_linestatus = 'O'), 2) AS price_o
              FROM lineitem GROUP BY l_returnflag
            ) u, LATERAL (
              SELECT 'price_f' AS col, u.price_f AS val
              UNION ALL SELECT 'price_o', u.price_o
              UNION ALL SELECT 'qty_f', u.qty_f
              UNION ALL SELECT 'qty_o', u.qty_o
            ) x
            UNION ALL
            -- json_normalize: props has only 'k'; 'm' -> NULL
            SELECT 'jsonn', event_id::VARCHAR, j.col, j.val
            FROM events, LATERAL (
              SELECT 'k' AS col,
                     CAST(json_extract_string(props, '$.k')
                          AS DOUBLE) AS val
              UNION ALL SELECT 'm', NULL::DOUBLE
            ) j
            WHERE event_id < 50
            UNION ALL
            -- wide_to_long over the same wide matrix as the unstack
            -- leg (tag differs; the stacked values are identical)
            SELECT 'w2l', u2.l_returnflag, x2.col, x2.val
            FROM (
              SELECT l_returnflag,
                     round(sum(l_quantity) FILTER (l_linestatus = 'F'), 2)
                       AS qty_f,
                     round(sum(l_quantity) FILTER (l_linestatus = 'O'), 2)
                       AS qty_o,
                     round(sum(l_extendedprice)
                           FILTER (l_linestatus = 'F'), 2) AS price_f,
                     round(sum(l_extendedprice)
                           FILTER (l_linestatus = 'O'), 2) AS price_o
              FROM lineitem GROUP BY l_returnflag
            ) u2, LATERAL (
              SELECT 'price_f' AS col, u2.price_f AS val
              UNION ALL SELECT 'price_o', u2.price_o
              UNION ALL SELECT 'qty_f', u2.qty_f
              UNION ALL SELECT 'qty_o', u2.qty_o
            ) x2
        """,
        "join_suite": """
            SELECT 'join' AS tag, c_custkey::BIGINT AS key,
                   round(c_acctbal, 2) AS a, round(t.total, 2) AS b
            FROM customer
            LEFT JOIN (SELECT o_custkey, sum(o_totalprice) AS total
                       FROM orders GROUP BY 1) t ON c_custkey = o_custkey
            WHERE c_custkey < 200
            UNION ALL
            SELECT 'transform', o_orderkey::BIGINT,
                   round(o_totalprice, 2),
                   round(sum(o_totalprice)
                         OVER (PARTITION BY o_custkey), 2)
            FROM orders WHERE o_orderkey < 500
            UNION ALL
            SELECT 'assign', c_custkey::BIGINT, round(c_acctbal, 2),
                   n.n::DOUBLE
            FROM customer
            LEFT JOIN (SELECT o_custkey, count(*) AS n
                       FROM orders GROUP BY 1) n ON c_custkey = o_custkey
            WHERE c_custkey < 200
            UNION ALL
            SELECT 'loc', c_custkey::BIGINT, round(c_acctbal, 2),
                   NULL::DOUBLE
            FROM customer WHERE c_custkey BETWEEN 50 AND 100
            UNION ALL
            SELECT 'drop', n_nationkey::BIGINT, n_regionkey::DOUBLE,
                   NULL::DOUBLE
            FROM nation WHERE n_nationkey NOT IN (0, 5, 10)
            UNION ALL
            SELECT 'merge', c_custkey::BIGINT, round(c_acctbal, 2),
                   n.n::DOUBLE
            FROM customer
            JOIN (SELECT o_custkey, count(*) AS n
                  FROM orders GROUP BY 1) n ON c_custkey = o_custkey
            WHERE c_custkey < 200
            UNION ALL
            SELECT 'from_spark', o_orderkey::BIGINT,
                   round(o_totalprice, 2), round(o_totalprice * 2, 2)
            FROM orders WHERE o_orderkey < 300
            UNION ALL
            -- merge_ordered: outer merge + ffill in merged key order
            SELECT 'mord', k::BIGINT,
                   round(last_value(tp IGNORE NULLS)
                         OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW), 2),
                   round(last_value(q IGNORE NULLS)
                         OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW), 2)
            FROM (
              SELECT coalesce(l.o_orderkey, r.o_orderkey) AS k,
                     l.o_totalprice AS tp, r.l_quantity AS q
              FROM (SELECT o_orderkey, o_totalprice FROM orders
                    WHERE o_orderkey < 400) l
              FULL JOIN (SELECT l_orderkey AS o_orderkey,
                                max(l_quantity) AS l_quantity
                         FROM lineitem
                         WHERE l_linenumber = 3 AND l_orderkey < 800
                         GROUP BY 1) r
                ON l.o_orderkey = r.o_orderkey)
            UNION ALL
            -- pas.sql escape hatch: same query, DuckDB dialect
            SELECT 'sqlq', o_custkey::BIGINT,
                   round(sum(o_totalprice), 2), count(*)::DOUBLE
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_custkey < 120
            GROUP BY o_custkey
        """,
        "events_hourly": base["events_hourly"],
        "sessionize": base["sessionize"],
        "top_users_funnel": f"""
            WITH tu AS {sub("top_users")}, fu AS {sub("funnel")}
            SELECT 'top' AS tag, user_id, total_value, n_events, rank
            FROM tu
            UNION ALL SELECT 'funnel0', NULL::BIGINT, NULL::DOUBLE,
                             n_step0, NULL::BIGINT FROM fu
            UNION ALL SELECT 'funnel1', NULL::BIGINT, NULL::DOUBLE,
                             n_step1, NULL::BIGINT FROM fu
            UNION ALL SELECT 'funnel2', NULL::BIGINT, NULL::DOUBLE,
                             n_step2, NULL::BIGINT FROM fu
        """,
        "cohort_retention": base["cohort_retention"],
        "dedup_exact": base["dedup_exact"],
        "dedup_minhash": base["dedup_minhash"],
        "dedup_cluster": base["dedup_cluster"],
        "dedup_simhash": base["dedup_simhash"],
        "ngram_jaccard": base["ngram_jaccard"],
        "cosine_topk": base["cosine_topk"],
        "emb_near_dup": base["emb_near_dup"],
        "text_suite": f"""
            WITH __parts AS (
              -- two aligned unnests zip (DuckDB has no ORDINALITY)
              SELECT doc_id,
                     unnest(string_split(text, ' ')) AS para,
                     unnest(range(1, len(string_split(text, ' ')) + 1))
                       AS pos
              FROM documents),
            __marked AS (
              SELECT doc_id, para, pos,
                     (length(para) < 4 OR row_number() OVER (
                         PARTITION BY para ORDER BY doc_id, pos) = 1)
                       AS keep
              FROM __parts),
            __pdd AS (
              SELECT doc_id, count(*)::BIGINT AS n_paras,
                     coalesce(count(*) FILTER (keep), 0)::BIGINT
                       AS n_kept,
                     coalesce(length(string_agg(para, ' '
                                  ORDER BY pos) FILTER (keep)),
                              0)::BIGINT AS ded_len
              FROM __marked GROUP BY doc_id),
            -- decontamination: distinct 5-grams colliding with the
            -- doc_id % 97 == 0 eval slice.  g <> '' guards the
            -- token-less docs (the engine's shingle expr emits no
            -- gram there; the raw DuckDB slice would emit '')
            __evg AS (
              SELECT DISTINCT unnest({_dk_shingles("text", 5, False)})
                       AS g
              FROM documents WHERE doc_id % 97 = 0),
            __contam AS (
              SELECT t.doc_id, count(DISTINCT t.g)::BIGINT AS n_contam
              FROM (SELECT doc_id,
                           unnest({_dk_shingles("text", 5, False)})
                             AS g
                    FROM documents) t
              JOIN __evg e ON t.g = e.g AND t.g <> ''
              GROUP BY 1)
            -- cross-corpus incremental dedup replay
            -- (ext/dedup.cross_dedup_pairs): shared MinHash family
            -- (16 hashes / 4 bands), new slice = doc_id % 3 == 0
            , __xsh AS (
              SELECT doc_id, {_dk_shingles("text", distinct=False)} AS s
              FROM documents),
            __xhs AS (
              SELECT doc_id,
                     list_distinct(list_transform(s,
                       x -> {_DK_H60.format(s="x")})) AS hs
              FROM __xsh WHERE len(s) > 0),
            __xsig AS (
              SELECT doc_id, hs,
                     list_transform(range(0, 16), k ->
                       list_min(list_transform(hs, x ->
                         ((2 * k + 1) * (x % 2147483647)
                          + (12345 + k * 7919)) % 2147483647))) AS sig
              FROM __xhs),
            __xband AS (
              SELECT doc_id, hs, b.band,
                     array_to_string(
                       sig[b.band * 4 + 1: b.band * 4 + 4], ',') AS bh
              FROM __xsig, (SELECT unnest(range(0, 4)) AS band) b),
            __xcand AS (
              SELECT DISTINCT n.doc_id AS id_new, r.doc_id AS id_ref,
                     n.hs AS ha, r.hs AS hb
              FROM __xband n JOIN __xband r
                ON n.band = r.band AND n.bh = r.bh
              WHERE n.doc_id % 3 = 0 AND r.doc_id % 3 <> 0),
            __xpair AS (
              SELECT id_new, id_ref,
                     len(list_intersect(ha, hb))
                     / (len(ha) + len(hb)
                        - len(list_intersect(ha, hb)))::DOUBLE AS jac
              FROM __xcand),
            __xagg AS (
              SELECT id_new AS doc_id, count(*)::BIGINT AS nx,
                     max(jac) AS xj
              FROM __xpair WHERE jac >= 0.4 GROUP BY 1),
            -- hashed TF-IDF replay (dim 64): exact tf/df/N, smoothed
            -- idf, L2 norm folded in BUCKET-INDEX order (the engine
            -- folds the dense array by index; adding the zero dims
            -- is exact), unit-vector checksum on the 1e-6 grid
            __tfb AS (
              SELECT doc_id, {_DK_H60.format(s="t")} % 64 AS b
              FROM (SELECT doc_id, unnest({toks_text}) AS t
                    FROM documents)),
            __tft AS (
              SELECT doc_id, b, count(*)::BIGINT AS tf
              FROM __tfb GROUP BY 1, 2),
            __tfd AS (
              SELECT b, count(*)::BIGINT AS df FROM __tft GROUP BY 1),
            __tfw AS (
              SELECT doc_id, b,
                     tf * (ln(((SELECT count(*) FROM documents)
                               + 1.0) / (df + 1.0)) + 1.0) AS w
              FROM __tft JOIN __tfd USING (b)),
            __tfn AS (
              SELECT doc_id,
                     sqrt(list_reduce(
                       list_prepend(0.0::DOUBLE,
                                    list(w * w ORDER BY b)),
                       (a, x) -> a + x)) AS nrm,
                     list(w ORDER BY b) AS ws
              FROM __tfw GROUP BY doc_id),
            __tfchk AS (
              SELECT doc_id,
                     list_reduce(list_prepend(0::BIGINT,
                       list_transform(ws,
                         x -> round(x / nrm * 1e6)::BIGINT)),
                       (a, x) -> a + x) AS chk,
                     len(ws)::BIGINT AS nnz
              FROM __tfn),
            -- exact-substring span replay (6-token rolling windows;
            -- global first (id, pos) keeps, rest merge into maximal
            -- spans via gaps-and-islands)
            __w6 AS (
              SELECT doc_id, s AS pos,
                     {_DK_H60.format(
                         s="array_to_string(toks[s + 1: s + 6], ' ')")}
                       AS h
              FROM (SELECT doc_id, toks,
                           unnest(range(0, len(toks) - 5)) AS s
                    FROM (SELECT doc_id, {toks_text} AS toks
                          FROM documents)
                    WHERE len(toks) >= 6)),
            __d6 AS (
              SELECT doc_id, pos,
                     count(*) OVER (PARTITION BY h) AS cnt,
                     row_number() OVER (PARTITION BY h
                                        ORDER BY doc_id, pos) AS rn
              FROM __w6),
            __isl6 AS (
              SELECT doc_id, pos,
                     CASE WHEN lag(pos) OVER w1 IS NULL
                            OR pos > lag(pos) OVER w1 + 6
                          THEN 1 ELSE 0 END AS brk
              FROM __d6 WHERE cnt >= 2 AND rn >= 2
              WINDOW w1 AS (PARTITION BY doc_id ORDER BY pos)),
            __g6 AS (
              SELECT doc_id, pos,
                     sum(brk) OVER (PARTITION BY doc_id
                                    ORDER BY pos) AS grp
              FROM __isl6),
            __sp6 AS (
              SELECT doc_id, min(pos) AS s, max(pos) + 6 AS e,
                     count(*) AS nw
              FROM __g6 GROUP BY doc_id, grp),
            __spagg AS (
              SELECT doc_id, count(*)::BIGINT AS n_spans,
                     sum(s * 131 + e + nw * 7)::BIGINT AS span_chk
              FROM __sp6 GROUP BY doc_id)
            SELECT a.doc_id, a.h, a.n, b.n_2grams, b.n_distinct_2grams,
                   b.top_2gram_count, b.dup_2gram_frac,
                   c.* EXCLUDE (doc_id),
                   d.n_ws_tokens, d.n_bpe_tokens, e.fingerprint,
                   p.n_paras, p.n_kept, p.ded_len,
                   coalesce(ct.n_contam, 0)::BIGINT AS n_contam,
                   (CASE WHEN a.doc_id % 3 = 0
                         THEN coalesce(x.nx, 0)
                         ELSE -1 END)::BIGINT AS n_xdup,
                   coalesce(x.xj, -1.0) AS xjac,
                   coalesce(tc.chk, -1)::BIGINT AS tfidf_chk,
                   coalesce(tc.nnz, -1)::BIGINT AS tfidf_nnz,
                   coalesce(sp.n_spans, 0)::BIGINT AS n_spans,
                   coalesce(sp.span_chk, -1)::BIGINT AS span_chk
            FROM {sub("text_normalize")} a
            JOIN {sub("repetition")} b ON a.doc_id = b.doc_id
            JOIN {sub("quality")} c ON a.doc_id = c.doc_id
            JOIN {sub("token_stats")} d ON a.doc_id = d.doc_id
            JOIN {sub("fingerprint")} e ON a.doc_id = e.doc_id
            JOIN __pdd p ON a.doc_id = p.doc_id
            LEFT JOIN __contam ct ON a.doc_id = ct.doc_id
            LEFT JOIN __xagg x ON a.doc_id = x.doc_id
            LEFT JOIN __tfchk tc ON a.doc_id = tc.doc_id
            LEFT JOIN __spagg sp ON a.doc_id = sp.doc_id
        """,
        "tpch_suite": """
            WITH rev AS (
              SELECT l.*, (l.l_extendedprice*100) * (100 - l.l_discount*100)
                     AS rev100
              FROM lineitem l)
            SELECT 'q7' AS tag,
                   s.s_nationkey::VARCHAR || '-' || c.c_nationkey::VARCHAR
                     AS k1,
                   year(l.l_shipdate)::VARCHAR AS k2,
                   sum(l.rev100) / 10000.0 AS a, NULL::DOUBLE AS b
            FROM rev l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                 AND s.s_nationkey IN (1, 2)
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
                 AND c.c_nationkey IN (1, 2)
            WHERE s.s_nationkey <> c.c_nationkey
            GROUP BY 1, 2, 3
            UNION ALL
            SELECT 'q8', 'asia_promo', year(l.l_shipdate)::VARCHAR,
                   sum(CASE WHEN s.s_nationkey = 1 THEN l.rev100
                            ELSE 0 END) / 10000.0,
                   sum(l.rev100) / 10000.0
            FROM rev l
            JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
                 AND r.r_name = 'ASIA'
            GROUP BY 1, 2, 3
            UNION ALL
            SELECT 'q9', n.n_name, year(l.l_shipdate)::VARCHAR,
                   sum(l.rev100) / 10000.0, NULL::DOUBLE
            FROM rev l
            JOIN part p ON l.l_partkey = p.p_partkey
                 AND p.p_type = 'STANDARD'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY 1, 2, 3
            UNION ALL
            SELECT 'q13', 'orders', n_orders::VARCHAR,
                   count(*)::DOUBLE, NULL::DOUBLE
            FROM (SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
                  FROM customer c
                  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                  GROUP BY 1)
            GROUP BY 1, 2, 3
            UNION ALL
            SELECT 'q14', 'promo', month(l.l_shipdate)::VARCHAR,
                   sum(CASE WHEN p.p_type = 'PROMO' THEN l.rev100
                            ELSE 0 END) / 10000.0,
                   sum(l.rev100) / 10000.0
            FROM rev l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= '1995-01-01'
              AND l.l_shipdate < '1996-01-01'
            GROUP BY 1, 2, 3
            UNION ALL
            SELECT 'q15', 'supplier', l_suppkey::VARCHAR,
                   t100 / 10000.0, NULL::DOUBLE
            FROM (SELECT l_suppkey, sum(rev100) AS t100
                  FROM rev
                  WHERE l_shipdate >= '1996-01-01'
                    AND l_shipdate < '1996-07-01'
                  GROUP BY 1) sup
            WHERE t100 = (SELECT max(t2.t100)
                          FROM (SELECT sum(rev100) AS t100
                                FROM rev
                                WHERE l_shipdate >= '1996-01-01'
                                  AND l_shipdate < '1996-07-01'
                                GROUP BY l_suppkey) t2)
            UNION ALL
            SELECT 'q17', 'brand', '',
                   sum(l.l_extendedprice*100) / 100.0 / 7.0,
                   count(*)::DOUBLE
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
                 AND p.p_brand = 'Brand#13'
            JOIN (SELECT l2.l_partkey,
                         0.2 * (sum(l2.l_quantity) / count(l2.l_quantity))
                           AS lim
                  FROM lineitem l2
                  JOIN part p2 ON l2.l_partkey = p2.p_partkey
                       AND p2.p_brand = 'Brand#13'
                  GROUP BY 1) av ON l.l_partkey = av.l_partkey
            WHERE l.l_quantity < av.lim
            UNION ALL
            SELECT 'q22', 'nation', c_nationkey::VARCHAR,
                   sum(c_acctbal*100) / 100.0, count(*)::DOUBLE
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0.0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
            GROUP BY 1, 2, 3
            UNION ALL
            -- Q2 adapted: partsupp = distinct traded pairs; min
            -- s_acctbal = the supplycost surrogate; ties kept
            SELECT 'q2', j.n_name,
                   j.l_partkey::VARCHAR || '-' || j.s_suppkey::VARCHAR,
                   j.s_acctbal, NULL::DOUBLE
            FROM (SELECT DISTINCT pr.l_partkey, s.s_suppkey,
                         s.s_acctbal, n.n_name
                  FROM (SELECT DISTINCT l_partkey, l_suppkey
                        FROM lineitem) pr
                  JOIN part p ON pr.l_partkey = p.p_partkey
                       AND p.p_size = 15 AND p.p_type = 'SMALL'
                  JOIN supplier s ON pr.l_suppkey = s.s_suppkey
                  JOIN nation n ON s.s_nationkey = n.n_nationkey
                       AND n.n_regionkey = 3) j
            WHERE j.s_acctbal = (
                  SELECT min(s2.s_acctbal)
                  FROM (SELECT DISTINCT l_partkey, l_suppkey
                        FROM lineitem) pr2
                  JOIN supplier s2 ON pr2.l_suppkey = s2.s_suppkey
                  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                       AND n2.n_regionkey = 3
                  WHERE pr2.l_partkey = j.l_partkey)
            UNION ALL
            -- Q11 adapted: per-part value of nation-1 suppliers,
            -- exact-int threshold (value100 * 1000 > total100)
            SELECT 'q11', 'parts', l_partkey::VARCHAR,
                   value100 / 100.0, NULL::DOUBLE
            FROM (SELECT l.l_partkey,
                         sum(CAST(l.l_extendedprice*100 AS BIGINT))
                           AS value100
                  FROM lineitem l
                  JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND s.s_nationkey = 1
                  GROUP BY 1)
            WHERE value100 * 1000 > (
                  SELECT sum(CAST(l2.l_extendedprice*100 AS BIGINT))
                  FROM lineitem l2
                  JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
                       AND s2.s_nationkey = 1)
            UNION ALL
            -- Q12 adapted: linestatus for shipmode, late = shipped
            -- > 90 days after the order date
            SELECT 'q12', l.l_linestatus, 'late',
                   sum(CASE WHEN date_diff('day',
                                CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)) > 90
                            AND o.o_orderpriority IN ('1-URGENT',
                                                      '2-HIGH')
                            THEN 1 ELSE 0 END)::DOUBLE,
                   sum(CASE WHEN date_diff('day',
                                CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)) > 90
                            AND o.o_orderpriority NOT IN ('1-URGENT',
                                                          '2-HIGH')
                            THEN 1 ELSE 0 END)::DOUBLE
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= '1995-01-01'
              AND l.l_shipdate < '1996-01-01'
            GROUP BY 1, 2, 3
            UNION ALL
            -- Q16 adapted: negative balance = the complaints list
            SELECT 'q16', p.p_brand,
                   p.p_type || '/' || p.p_size::VARCHAR,
                   count(DISTINCT pr.l_suppkey)::DOUBLE, NULL::DOUBLE
            FROM (SELECT DISTINCT l_partkey, l_suppkey
                  FROM lineitem) pr
            JOIN part p ON pr.l_partkey = p.p_partkey
            WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
              AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND pr.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                       WHERE s_acctbal < 0.0)
            GROUP BY 1, 2, 3
            UNION ALL
            -- Q20 adapted: exact-int 2*pair_qty*n_pairs > part_total
            SELECT 'q20', 'supp', w.l_suppkey::VARCHAR,
                   count(*)::DOUBLE, max(s.s_nationkey)::DOUBLE
            FROM (SELECT pair.l_partkey, pair.l_suppkey
                  FROM (SELECT l.l_partkey, l.l_suppkey,
                               sum(CAST(l.l_quantity AS BIGINT))
                                 AS pair_qty
                        FROM lineitem l
                        JOIN part p ON l.l_partkey = p.p_partkey
                             AND p.p_name LIKE 'small%'
                        WHERE l.l_shipdate >= '1995-01-01'
                          AND l.l_shipdate < '1996-01-01'
                        GROUP BY 1, 2) pair
                  JOIN (SELECT l_partkey, sum(pq) AS part_total,
                               count(*) AS n_pairs
                        FROM (SELECT l.l_partkey, l.l_suppkey,
                                     sum(CAST(l.l_quantity AS BIGINT))
                                       AS pq
                              FROM lineitem l
                              JOIN part p ON l.l_partkey = p.p_partkey
                                   AND p.p_name LIKE 'small%'
                              WHERE l.l_shipdate >= '1995-01-01'
                                AND l.l_shipdate < '1996-01-01'
                              GROUP BY 1, 2)
                        GROUP BY 1) tot
                       ON pair.l_partkey = tot.l_partkey
                  WHERE 2 * pair.pair_qty * tot.n_pairs
                        > tot.part_total) w
            JOIN supplier s ON w.l_suppkey = s.s_suppkey
            GROUP BY 1, 2, 3
            UNION ALL
            -- Q21 adapted: the unique latest shipper of a finished
            -- multi-supplier order kept it waiting
            SELECT 'q21', 'wait', l_suppkey::VARCHAR,
                   count(*)::DOUBLE, NULL::DOUBLE
            FROM (SELECT j.l_orderkey, j.l_suppkey
                  FROM (SELECT pair.*, po.n_supp, po.o_max
                        FROM (SELECT l.l_orderkey, l.l_suppkey,
                                     max(l.l_shipdate) AS pair_max
                              FROM lineitem l
                              JOIN orders o
                                   ON l.l_orderkey = o.o_orderkey
                                   AND o.o_orderstatus = 'F'
                              GROUP BY 1, 2) pair
                        JOIN (SELECT l_orderkey,
                                     count(*) AS n_supp,
                                     max(pair_max) AS o_max
                              FROM (SELECT l.l_orderkey, l.l_suppkey,
                                           max(l.l_shipdate)
                                             AS pair_max
                                    FROM lineitem l
                                    JOIN orders o
                                         ON l.l_orderkey = o.o_orderkey
                                         AND o.o_orderstatus = 'F'
                                    GROUP BY 1, 2)
                              GROUP BY 1) po
                             ON pair.l_orderkey = po.l_orderkey) j
                  WHERE j.pair_max = j.o_max AND j.n_supp >= 2
                    AND 1 = (SELECT count(*)
                             FROM (SELECT l.l_orderkey, l.l_suppkey,
                                          max(l.l_shipdate) AS pm
                                   FROM lineitem l
                                   JOIN orders o2
                                        ON l.l_orderkey = o2.o_orderkey
                                        AND o2.o_orderstatus = 'F'
                                   GROUP BY 1, 2) q
                             WHERE q.l_orderkey = j.l_orderkey
                               AND q.pm = j.o_max))
            GROUP BY 1, 2, 3
        """,
        "langid_terms": f"""
            SELECT 'lang' AS tag, lang_pred AS key, n,
                   avg_score AS score
            FROM {sub("langid")}
            UNION ALL
            SELECT 'term', term, tf, NULL::DOUBLE
            FROM {sub("top_terms")}
            UNION ALL
            -- unigram_logprob replay: per-doc fold of ln(count) over
            -- the SORTED count list (exact ints), minus n*ln(total),
            -- over n.  Rounded to 6 decimals: JVM Math.log and libm
            -- log are each <=1 ulp but not the same ulp (see
            -- ext/text.unigram_logprob contract).
            SELECT 'uni', CAST(u.doc_id AS VARCHAR), u.n,
                   round((list_reduce(
                            list_prepend(0.0::DOUBLE,
                              list_transform(u.cs,
                                c -> ln(c::DOUBLE))),
                            (a, b) -> a + b)
                          - u.n * ln((SELECT sum(c)::DOUBLE FROM (
                              SELECT count(*) AS c
                              FROM (SELECT unnest({toks_text}) AS term
                                    FROM documents) GROUP BY term)))
                         ) / u.n, 6)
            FROM (
              SELECT tkx.doc_id, list_sort(list(ct.c)) AS cs,
                     count(*)::BIGINT AS n
              FROM (SELECT doc_id, unnest({toks_text}) AS term
                    FROM documents) tkx
              JOIN (SELECT term, count(*)::BIGINT AS c
                    FROM (SELECT unnest({toks_text}) AS term
                          FROM documents) GROUP BY term) ct
                USING (term)
              GROUP BY tkx.doc_id
            ) u
            UNION ALL
            -- bigram_logprob replay: interpolated bigram LM with
            -- exact BIGINT c2/cp/ct/T, folded IN POSITION ORDER
            -- (the engine sorts the struct list by pos); lam = 0.75
            SELECT 'bi', CAST(sc.doc_id AS VARCHAR), sc.n,
                   round(sc.s / sc.n, 6)
            FROM (
              SELECT p.doc_id, count(*)::BIGINT AS n,
                     list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(
                         list([coalesce(b.c2, 0), coalesce(pt.cp, 0),
                               u2.ct] ORDER BY p.pos),
                         x -> ln(CASE WHEN x[2] > 0 THEN
                                   0.75 * x[1] / x[2]
                                   + 0.25 * x[3] / st.tt
                                 ELSE x[3] / st.tt END))),
                       (a, s) -> a + s) AS s
              FROM (
                SELECT doc_id,
                       unnest(generate_series(1, len(t))) AS pos,
                       unnest(t) AS tok,
                       unnest(list_prepend(NULL::VARCHAR,
                                           t[1:len(t) - 1])) AS prev
                FROM (SELECT doc_id, {toks_text} AS t
                      FROM documents) bt
                WHERE len(t) >= 1
              ) p
              JOIN (SELECT tok, count(*)::BIGINT AS ct
                    FROM (SELECT unnest({toks_text}) AS tok
                          FROM documents) GROUP BY 1) u2
                ON p.tok = u2.tok
              LEFT JOIN (
                SELECT prev, tok, count(*)::BIGINT AS c2
                FROM (
                  SELECT unnest(t[1:len(t) - 1]) AS prev,
                         unnest(t[2:len(t)]) AS tok
                  FROM (SELECT {toks_text} AS t FROM documents)
                  WHERE len(t) >= 2
                ) GROUP BY 1, 2
              ) b ON p.prev = b.prev AND p.tok = b.tok
              LEFT JOIN (
                SELECT prev, count(*)::BIGINT AS cp
                FROM (
                  SELECT unnest(t[1:len(t) - 1]) AS prev
                  FROM (SELECT {toks_text} AS t FROM documents)
                  WHERE len(t) >= 2
                ) GROUP BY 1
              ) pt ON p.prev = pt.prev
              CROSS JOIN (
                SELECT sum(cnt)::BIGINT AS tt
                FROM (SELECT count(*) AS cnt
                      FROM (SELECT unnest({toks_text}) AS tok
                            FROM documents) GROUP BY tok)
              ) st
              GROUP BY p.doc_id, st.tt
            ) sc
            UNION ALL
            -- bm25_search replay: exact BIGINT tf/df/dl/N stats,
            -- Lucene idf, per-pair fold ORDER BY term (matches the
            -- engine's sort_array(struct(term, ...)) — term is
            -- unique within a pair), row_number top-5 per query
            SELECT 'bm25', sc.query_id || ':' || sc.rnk::VARCHAR,
                   sc.doc_id, round(sc.score, 6)
            FROM (
              SELECT query_id, doc_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id)
                       AS rnk
              FROM (
                SELECT p.query_id, p.doc_id,
                       list_reduce(list_prepend(0.0::DOUBLE,
                         list_transform(p.xs, x ->
                           ln((st.nn - x[2] + 0.5) / (x[2] + 0.5)
                              + 1.0)
                           * x[1] / (x[1] + 1.2 * (1.0 - 0.75
                               + 0.75 * x[3]
                               / (st.dls / st.nn::DOUBLE))))),
                         (a, s) -> a + s) AS score
                FROM (SELECT count(*)::BIGINT AS nn,
                             sum(len({toks_text}))::BIGINT AS dls
                      FROM documents) st
                CROSS JOIN (
                  SELECT qt.query_id, tf.doc_id,
                         list([tf.tf, df.df, tf.dl]
                              ORDER BY tf.term) AS xs
                  FROM (
                    SELECT e.doc_id, e.term,
                           count(*)::BIGINT AS tf,
                           any_value(e.dl)::BIGINT AS dl
                    FROM (SELECT doc_id, len({toks_text}) AS dl,
                                 unnest({toks_text}) AS term
                          FROM documents) e
                    JOIN (SELECT DISTINCT unnest({_DK_TOKS.format(col="query")}) AS term
                          FROM (VALUES ('q0', 'hash join filter'),
                                       ('q1', 'vector stream window'))
                               q(query_id, query)) qx
                      USING (term)
                    GROUP BY 1, 2
                  ) tf
                  JOIN (SELECT term, count(*)::BIGINT AS df
                        FROM (SELECT doc_id, term, count(*) AS tf
                              FROM (SELECT doc_id,
                                           unnest({toks_text}) AS term
                                    FROM documents)
                              GROUP BY 1, 2) tfq
                        JOIN (SELECT DISTINCT unnest({_DK_TOKS.format(col="query")}) AS term
                              FROM (VALUES ('q0', 'hash join filter'),
                                           ('q1', 'vector stream window'))
                                   q(query_id, query)) qy USING (term)
                        GROUP BY 1) df ON tf.term = df.term
                  JOIN (SELECT DISTINCT query_id,
                               unnest({_DK_TOKS.format(col="query")}) AS term
                        FROM (VALUES ('q0', 'hash join filter'),
                                     ('q1', 'vector stream window'))
                             q(query_id, query)) qt
                    ON tf.term = qt.term
                  GROUP BY 1, 2
                ) p
              ) s0
            ) sc
            WHERE sc.rnk <= 5
            UNION ALL
            -- corpus_profile replay (round 10): per-language one-pass
            -- report, unpivoted to lang/metric rows.  quantile_cont
            -- == Spark's exact interpolated percentile; integer
            -- division is float division in DuckDB (dup_ratio).
            SELECT 'prof', pr.grp || '/' || pm.m,
                   CASE pm.m WHEN 'n_docs' THEN pr.n_docs
                             WHEN 'total_tokens' THEN pr.total_tokens
                             WHEN 'min_tokens' THEN pr.min_tokens
                             WHEN 'max_tokens' THEN pr.max_tokens
                             WHEN 'distinct' THEN pr.distinct_texts
                   END,
                   CASE pm.m WHEN 'avg_tokens' THEN round(pr.avg_tokens, 6)
                             WHEN 'p50' THEN round(pr.p50, 6)
                             WHEN 'p90' THEN round(pr.p90, 6)
                             WHEN 'p99' THEN round(pr.p99, 6)
                             WHEN 'avg_chars' THEN round(pr.avg_chars, 6)
                             WHEN 'dup_ratio' THEN round(pr.dup_ratio, 6)
                   END
            FROM (
              SELECT coalesce(lang, '<null>') AS grp,
                     count(*)::BIGINT AS n_docs,
                     sum(CASE WHEN text IS NULL THEN 0
                              ELSE len({toks_text}) END)::BIGINT
                       AS total_tokens,
                     avg(CASE WHEN text IS NULL THEN 0
                              ELSE len({toks_text}) END) AS avg_tokens,
                     min(CASE WHEN text IS NULL THEN 0
                              ELSE len({toks_text}) END)::BIGINT
                       AS min_tokens,
                     max(CASE WHEN text IS NULL THEN 0
                              ELSE len({toks_text}) END)::BIGINT
                       AS max_tokens,
                     quantile_cont(CASE WHEN text IS NULL THEN 0
                                        ELSE len({toks_text}) END, 0.5)
                       AS p50,
                     quantile_cont(CASE WHEN text IS NULL THEN 0
                                        ELSE len({toks_text}) END, 0.9)
                       AS p90,
                     quantile_cont(CASE WHEN text IS NULL THEN 0
                                        ELSE len({toks_text}) END, 0.99)
                       AS p99,
                     avg(coalesce(length(text), 0)) AS avg_chars,
                     count(DISTINCT coalesce(text, ''))::BIGINT
                       AS distinct_texts,
                     1.0 - count(DISTINCT coalesce(text, ''))
                           / count(*) AS dup_ratio
              FROM documents GROUP BY 1
            ) pr
            CROSS JOIN (VALUES ('n_docs'), ('total_tokens'),
                               ('min_tokens'), ('max_tokens'),
                               ('distinct'), ('avg_tokens'), ('p50'),
                               ('p90'), ('p99'), ('avg_chars'),
                               ('dup_ratio')) pm(m)
        """,
        "multimodal_suite": f"""
            SELECT a.media_type, a.n_items, a.total_bytes, a.avg_width,
                   a.avg_height, b.n_frames, b.n_docs, b.max_frame_idx
            FROM {sub("multimodal_stats")} a
            JOIN {sub("frame_sample")} b
              ON a.media_type = b.media_type
        """,
        "seq_pack": f"""
            WITH t AS (
              SELECT doc_id, doc_id % 8 AS shard,
                     len({toks_text}) AS n_tokens
              FROM documents
            ), p AS (
              SELECT shard, doc_id, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY shard
                                         ORDER BY doc_id) - n_tokens
                       AS start_offset
              FROM t
            )
            , tk AS (
              SELECT doc_id, {toks_text} AS toks FROM documents
            ), ck AS (
              SELECT doc_id,
                     unnest(range(0, greatest(len(toks) - 17, 0) + 1, 48))
                       AS s,
                     toks
              FROM tk WHERE len(toks) >= 1
            ), ckp AS (
              SELECT doc_id, s // 48 AS chunk_idx,
                     toks[s + 1: s + 64] AS piece
              FROM ck
            )
            SELECT shard::BIGINT AS shard,
                   (start_offset // 2048)::BIGINT AS bin,
                   count(*)::BIGINT AS n_docs,
                   sum(n_tokens)::BIGINT AS n_tokens,
                   min(doc_id)::BIGINT AS first_doc
            FROM p GROUP BY 1, 2
            UNION ALL
            SELECT (-1)::BIGINT, chunk_idx::BIGINT,
                   count(*)::BIGINT, sum(len(piece))::BIGINT,
                   min(doc_id)::BIGINT
            FROM ckp GROUP BY 2
            UNION ALL
            SELECT (-2)::BIGINT,
                   ({_DK_H60.format(s="array_to_string(piece, ' ')")}
                    % 8)::BIGINT,
                   count(*)::BIGINT, sum(len(piece))::BIGINT,
                   min(doc_id)::BIGINT
            FROM ckp GROUP BY 2
            UNION ALL
            -- shuffle_corpus replay: md5-60bit hash -> shard, rank
            -- within shard by (hash, id); the weighted position sum
            -- pins the whole permutation
            SELECT (-3)::BIGINT, shard::BIGINT, count(*)::BIGINT,
                   sum(pos * (doc_id % 97))::BIGINT,
                   min(CASE WHEN pos = 1 THEN doc_id END)::BIGINT
            FROM (
              SELECT doc_id, h % 8 AS shard,
                     row_number() OVER (PARTITION BY h % 8
                                        ORDER BY h, doc_id) AS pos
              FROM (SELECT doc_id,
                           {_DK_H60.format(s="CAST(doc_id AS VARCHAR)")}
                             AS h
                    FROM documents)
            ) GROUP BY 2
            UNION ALL
            -- tokenizer-kernel plumbing replay (chars4: fixed 4-char
            -- pieces; 16-token chunks, overlap 4, stride 12 ->
            -- chunk = substr(text, s*4+1, 64))
            SELECT (-4)::BIGINT,
                   ({_DK_H60.format(s="chunk_text")} % 8)::BIGINT,
                   count(*)::BIGINT, sum(n_ck)::BIGINT,
                   min(doc_id)::BIGINT
            FROM (
              SELECT doc_id, substr(text, s * 4 + 1, 64) AS chunk_text,
                     least(16, nt - s) AS n_ck
              FROM (
                SELECT doc_id, text, nt,
                       unnest(range(0, greatest(nt - 5, 0) + 1, 12))
                         AS s
                FROM (SELECT doc_id, text,
                             (len(text) + 3) // 4 AS nt
                      FROM documents WHERE len(text) >= 1)
              )
            ) GROUP BY 2
        """,
        "curate_corpus": f"""
            WITH RECURSIVE nq AS (
              SELECT doc_id, text, {norm_text} AS norm_text,
                     {q_raw} AS q_score
              FROM documents
            ), kept0 AS (
              SELECT doc_id, norm_text, q_score FROM nq
              WHERE q_score >= 0.2
            ), reps AS (
              SELECT min(doc_id) AS doc_id FROM kept0
              GROUP BY md5(norm_text)
            ), kept1 AS (
              SELECT k.* FROM kept0 k JOIN reps USING (doc_id)
            ), sh AS (
              SELECT doc_id, {_dk_shingles("norm_text", distinct=False)} AS s
              FROM kept1
            ), hset AS (
              SELECT doc_id,
                     list_distinct(list_transform(s, x -> {_DK_H60.format(s="x")})) AS hs
              FROM sh WHERE len(s) > 0
            ), sigs AS (
              SELECT doc_id, hs,
                     list_transform(range(0, 16), k ->
                       list_min(list_transform(hs, x ->
                         ((2 * k + 1) * (x % 2147483647) + (12345 + k * 7919)) % 2147483647))) AS sig
              FROM hset
            ), banded AS (
              SELECT doc_id, hs, b.band,
                     array_to_string(sig[b.band * 4 + 1: b.band * 4 + 4], ',') AS bh
              FROM sigs, (SELECT unnest(range(0, 4)) AS band) b
            ), cand AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                     l.hs AS sa, r.hs AS sb
              FROM banded l JOIN banded r
                ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
            ), pairs AS (
              SELECT id_a, id_b FROM cand
              WHERE len(list_intersect(sa, sb))
                    / (len(sa) + len(sb) - len(list_intersect(sa, sb)))::DOUBLE >= 0.4
            ), e AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b AS a, id_a AS b FROM pairs
            ), reach AS (
              SELECT a, b FROM e
              UNION
              SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
            ), lab AS (
              SELECT a AS id, min(b) AS mn FROM reach GROUP BY a
            ), kept2 AS (
              SELECT k.doc_id, k.norm_text, k.q_score
              FROM kept1 k LEFT JOIN lab l ON k.doc_id = l.id
              WHERE coalesce(least(l.mn, k.doc_id), k.doc_id) = k.doc_id
            ), toks AS (
              SELECT doc_id, q_score, doc_id % 8 AS shard,
                     len({_DK_TOKS.format(col="norm_text")}) AS n_tokens
              FROM kept2
            ), packed AS (
              SELECT shard, doc_id, q_score, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY shard
                                         ORDER BY doc_id) - n_tokens
                       AS start_offset
              FROM toks
            ), mixw AS (
              SELECT * FROM (VALUES ('en', CAST(0.5 AS DOUBLE), -2),
                                    ('de', CAST(0.25 AS DOUBLE), -3),
                                    ('fr', CAST(0.125 AS DOUBLE), -4),
                                    ('zh', CAST(0.125 AS DOUBLE), -5))
                   w(lang, wt, code)
            ), mixavail AS (
              SELECT lang, count(*)::DOUBLE AS a FROM documents
              WHERE lang IN (SELECT lang FROM mixw) GROUP BY 1
            ), mixt AS (
              SELECT min(a / wt) AS T
              FROM mixavail JOIN mixw USING (lang)
            ), mixthr AS (
              SELECT lang, code, a,
                     CAST(CAST(least(1.0, round(wt * T / a, 9))
                               AS DECIMAL(18,9))
                          * 1152921504606846976 AS BIGINT) AS thr
              FROM mixavail JOIN mixw USING (lang) CROSS JOIN mixt
            ), dtk AS (
              SELECT doc_id, {toks_text} AS t FROM documents
            ), dgr AS (
              -- DSIR featurization: unigrams + bigrams
              SELECT doc_id,
                     unnest(list_concat(t,
                       CASE WHEN len(t) >= 2 THEN
                         list_transform(generate_series(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i + 1])
                       ELSE [] END)) AS g
              FROM dtk
            ), dbk AS (
              SELECT doc_id, {_DK_H60.format(s="g")} % 4096 AS b
              FROM dgr
            ), drc AS (
              SELECT b, count(*)::BIGINT AS rc FROM dbk GROUP BY b
            ), dtc AS (
              SELECT dbk.b, count(*)::BIGINT AS tc
              FROM dbk JOIN documents USING (doc_id)
              WHERE lang = 'en' GROUP BY 1
            ), dmodel AS (
              SELECT coalesce(r.b, t.b) AS b,
                     coalesce(tc, 0) AS tc, coalesce(rc, 0) AS rc
              FROM drc r FULL OUTER JOIN dtc t ON r.b = t.b
            ), dpd AS (
              SELECT doc_id, b, count(*)::BIGINT AS c
              FROM dbk GROUP BY 1, 2
            ), dw AS (
              -- add-one-smoothed log-likelihood ratio, folded over
              -- the bucket list SORTED by bucket id (the engine's
              -- bit-stability contract)
              SELECT doc_id, sum(c)::BIGINT AS n_grams,
                     list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(list_sort(list([b, c, tc, rc])),
                         x -> x[2] * (ln(x[3] + 1) - ln(x[4] + 1)))),
                       (acc, v) -> acc + v)
                     + sum(c) * (ln((SELECT sum(rc) FROM drc) + 4096)
                                 - ln((SELECT sum(tc) FROM dtc) + 4096))
                       AS logw
              FROM dpd JOIN dmodel USING (b) GROUP BY doc_id
            ), dsel AS (
              -- Gumbel-top-k with content-addressed noise:
              -- u = (h60(id || ':pas') + 1) / (2^60 + 2)
              SELECT doc_id,
                     logw - ln(-ln(
                       ({_DK_H60.format(s="doc_id::VARCHAR || ':pas'")} + 1)::DOUBLE
                       / 1152921504606846978.0)) AS skey
              FROM dw
              ORDER BY skey DESC, doc_id ASC LIMIT 40
            )
            SELECT shard::BIGINT AS shard, count(*)::BIGINT AS n_docs,
                   sum(n_tokens)::BIGINT AS n_tokens,
                   count(DISTINCT start_offset // 2048)::BIGINT AS n_bins,
                   round(avg(q_score), 3) AS avg_quality
            FROM packed GROUP BY 1
            UNION ALL
            SELECT -1, count(*)::BIGINT, (count(*) * 32)::BIGINT,
                   1::BIGINT, 1.0
            FROM documents
            UNION ALL
            -- mix_corpora replay: availability -> T = min(avail/w) ->
            -- frac = least(1, round(w*T/avail, 9)) -> threshold =
            -- round(DECIMAL(frac) * 2^60) over the md5-60bit bucket
            -- (the mix* CTEs above).  Weights are powers of two so
            -- every double matches the engine's bit-for-bit.
            SELECT mt.code::BIGINT, mk.n, mk.nch, mt.a::BIGINT,
                   round(mk.n / mt.a, 6)
            FROM mixthr mt JOIN (
              SELECT t2.lang, count(*)::BIGINT AS n,
                     sum(d.n_chars)::BIGINT AS nch
              FROM documents d JOIN mixthr t2 ON d.lang = t2.lang
              WHERE {_DK_H60.format(s="CAST(d.doc_id AS VARCHAR)")}
                    < t2.thr
              GROUP BY 1
            ) mk ON mt.lang = mk.lang
            UNION ALL
            -- split_corpus replay: disjoint cumulative md5-60bit
            -- intervals (thresholds are exact-decimal literals from
            -- ext.pipeline.split_thresholds; fractions sum to 1 so
            -- the three legs partition the corpus exactly)
            SELECT code::BIGINT, count(*)::BIGINT,
                   sum(n_chars)::BIGINT,
                   count(DISTINCT lang)::BIGINT,
                   round(count(*) / (SELECT count(*)::DOUBLE
                                     FROM documents), 6)
            FROM (SELECT doc_id, n_chars, lang, {split_case} AS code
                  FROM documents) spc
            GROUP BY 1
            UNION ALL
            -- DSIR weights replay (shard -9): exact-int checksum of
            -- every per-doc weight (sum of round(logw*1e6) BIGINTs
            -- is order-independent where a float sum is not)
            SELECT (-9)::BIGINT, count(*)::BIGINT,
                   sum(n_grams)::BIGINT,
                   sum(round(logw * 1e6)::BIGINT)::BIGINT,
                   round(sum(round(logw * 1e6)::BIGINT)
                         / count(*) / 1e6, 3)
            FROM dw
            UNION ALL
            -- Gumbel-top-k selection replay (shard -10): the chosen
            -- SET (k, id-sum, min id) + selection-key checksum
            SELECT (-10)::BIGINT, count(*)::BIGINT,
                   sum(doc_id)::BIGINT, min(doc_id)::BIGINT,
                   round(sum(round(skey * 1e6)::BIGINT)
                         / count(*) / 1e6, 3)
            FROM dsel
            UNION ALL
            -- grouped split replay (shard -11): split_corpus(by=
            -- 'lang') hashes the GROUP key; sum(code*doc_id) pins
            -- every doc's label (codes train=1 val=2 test=3)
            SELECT (-11)::BIGINT, count(*)::BIGINT,
                   sum(gcode * doc_id)::BIGINT,
                   count(DISTINCT lang)::BIGINT,
                   round(sum(CASE WHEN gcode = 1 THEN 1 ELSE 0 END)
                         / count(*), 6)
            FROM (SELECT doc_id, lang,
                         CASE WHEN {_spbkt_g} < {_spb[0][1]} THEN 1
                              WHEN {_spbkt_g} < {_spb[1][1]} THEN 2
                              ELSE 3 END AS gcode
                  FROM documents) gsp
            UNION ALL
            -- model-based quality filter (shard -12): L-BFGS logistic
            -- regression is not SQL-replayable; the oracle replays
            -- the SQL-computable scored-doc count and the in-plan
            -- invariant booleans as constants (planted-language
            -- separation; Pareto gate keeps a non-trivial subset
            -- containing >90% of q>0.99 docs) — a Spark-side flip
            -- hash-mismatches here
            SELECT (-12)::BIGINT,
                   (SELECT count(*) FROM documents
                    WHERE text IS NOT NULL)::BIGINT,
                   1::BIGINT, 1::BIGINT, -12.0
        """,
        # ann_suite: the NEIGHBOR LISTS are approximate by contract and
        # have no SQL twin; the recall-bucket summary they roll into is
        # deterministic (seeded hyperplanes/centroids), so THAT is the
        # oracle: both indexes must keep recall@5 >= 0.6 vs brute force
        "ann_suite": f"""
            SELECT 'ivf' AS algo,
                   (SELECT count(*) FROM embeddings
                    WHERE vec_id < 5)::BIGINT AS n_queries,
                   5::BIGINT AS k, true AS recall_ok
            UNION ALL
            SELECT 'ivf_idx',
                   (SELECT count(*) FROM embeddings
                    WHERE vec_id < 5)::BIGINT,
                   5::BIGINT, true
            UNION ALL
            SELECT 'lsh',
                   (SELECT count(*) FROM embeddings
                    WHERE vec_id < 5)::BIGINT,
                   5::BIGINT, true
            UNION ALL
            SELECT 'semdedup',
                   (SELECT count(*) FROM embeddings
                    WHERE embedding IS NOT NULL)::BIGINT,
                   8::BIGINT, true
            UNION ALL
            -- semantic_dedup_against (r13): cross-corpus embedding
            -- dedup vs a persisted, APPEND-grown IVF index.
            -- Centroids are not SQL-replayable; the invariants
            -- (grown == from-scratch-union pairs, cross-only
            -- endpoints, 20/20 planted recall) are asserted in-plan
            -- Spark-side and must land true here
            SELECT 'semdedup_x',
                   (SELECT count(*) FROM embeddings
                    WHERE vec_id % 3 = 2
                      AND embedding IS NOT NULL)::BIGINT,
                   8::BIGINT, true
            UNION ALL
            -- cluster_documents: n_queries = tokenized docs (the
            -- tfidf featurizer's token-less contract), invariants
            -- asserted in-plan on the Spark side
            SELECT 'doc_cluster',
                   (SELECT count(*) FROM documents
                    WHERE len({toks_text}) >= 1)::BIGINT,
                   8::BIGINT, true
        """,
    }
