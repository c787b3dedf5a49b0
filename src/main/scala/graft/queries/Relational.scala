package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables => T}

/**
 * General relational surface (SURVEY.md §2 rows S1-S11 plus the
 * reference-derived join/agg shapes R18-R31 re-expressed over the
 * driver-supplied TPC-H-ish tables). Each query carries a DuckDB oracle.
 *
 * Determinism rules: float aggregates rounded; every top-k / limit has a
 * total order (unique-key tie-break); no wall-clock or RNG anywhere.
 */
object Relational {

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))

  val all: Seq[Q] = Seq(

    // ---- Aggregation over a filtered scan (TPC-H Q1 shape; SURVEY S7/R27).
    Q("q01_agg_pricing",
      (s, d) => T.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("2000-12-01 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 6) AS avg_qty,
             round(avg(l_discount), 6) AS avg_disc,
             count(*) AS count_order
             FROM lineitem
             WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
             GROUP BY l_returnflag, l_linestatus""")),

    // ---- Filter + projection pushdown (S3; scan reads 5 of 11 columns).
    Q("q02_filter_project",
      (s, d) => T.lineitem(s, d)
        .filter(col("l_quantity").between(5, 10) && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
             FROM lineitem WHERE l_quantity BETWEEN 5 AND 10 AND l_discount > 0.05""")),

    // ---- 3-way join + agg + top-k (TPC-H Q3 shape; S4).
    Q("q03_join_topk",
      (s, d) => {
        val c = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = T.orders(s, d)
        val l = T.lineitem(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             FROM customer JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON o_orderkey = l_orderkey
             WHERE c_mktsegment = 'BUILDING'
             GROUP BY o_orderkey
             ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // ---- Snowflake dims via broadcast joins (R24 gazetteer-lookup shape).
    Q("q04_region_rollup",
      (s, d) => T.customer(s, d)
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_bal")),
      Some("""SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY r_name""")),

    // ---- Left outer join preserving order-less customers (R21 nullability).
    Q("q05_left_join_hist",
      (s, d) => {
        val c = T.customer(s, d)
        val o = T.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(c("c_custkey"))
          .agg(count(o("o_orderkey")).as("n_orders"))
          .groupBy(col("n_orders"))
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT n_orders, count(*) AS n_customers FROM (
               SELECT c_custkey, count(o_orderkey) AS n_orders
               FROM customer LEFT JOIN orders ON c_custkey = o_custkey
               GROUP BY c_custkey) GROUP BY n_orders""")),

    // ---- Semi join / EXISTS (R22).
    Q("q06_semi_join",
      (s, d) => T.customer(s, d)
        .join(T.orders(s, d).filter(col("o_totalprice") > 300000)
          .select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer
             WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
             GROUP BY c_mktsegment""")),

    // ---- Anti join / NOT EXISTS (R40 remove-list subtraction shape).
    Q("q07_anti_join",
      (s, d) => T.customer(s, d)
        .join(T.orders(s, d).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""")),

    // ---- Unordered-pair self join (R19: per-doc person co-occurrence shape).
    Q("q08_selfjoin_pairs",
      (s, d) => {
        val a = T.supplier(s, d).select(col("s_nationkey").as("nk"), col("s_suppkey").as("k1"))
        val b = T.supplier(s, d).select(col("s_nationkey").as("nk"), col("s_suppkey").as("k2"))
        a.join(b, Seq("nk")).filter(col("k1") < col("k2"))
          .groupBy(col("nk")).agg(count(lit(1)).as("n_pairs"))
      },
      Some("""SELECT a.s_nationkey AS nk, count(*) AS n_pairs
             FROM supplier a JOIN supplier b
             ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
             GROUP BY a.s_nationkey""")),

    // ---- Broadcast nested-loop theta join on suffix match (R23).
    Q("q09_theta_suffix",
      (s, d) => {
        val suffixes = s.createDataFrame(Seq(
          Tuple1("gear"), Tuple1("bolt"), Tuple1("widget"))).toDF("sfx")
        T.part(s, d).join(broadcast(suffixes),
            expr("endswith(p_name, sfx)"))
          .groupBy(col("sfx")).agg(count(lit(1)).as("n_parts"),
            round(sum(col("p_retailprice")), 2).as("total_price"))
      },
      Some("""SELECT sfx, count(*) AS n_parts, round(sum(p_retailprice), 2) AS total_price
             FROM part JOIN (VALUES ('gear'), ('bolt'), ('widget')) AS t(sfx)
             ON p_name LIKE '%' || sfx
             GROUP BY sfx""")),

    // ---- ROLLUP grouping sets (S6).
    Q("q10_rollup",
      (s, d) => T.customer(s, d)
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("bal")),
      Some("""SELECT r_name, n_name, count(*) AS n, round(sum(c_acctbal), 2) AS bal
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY ROLLUP (r_name, n_name)""")),

    // ---- CUBE grouping sets (S6).
    Q("q11_cube",
      (s, d) => T.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
             FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // ---- distinct / count-distinct (S5).
    Q("q12_distinct",
      (s, d) => T.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers")),
      Some("""SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
             count(*) AS n_customers FROM customer GROUP BY c_mktsegment""")),

    // ---- Ranking window, per-group top-k (S8; R37 top-1 lookup shape).
    Q("q13_window_topk",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
               SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders) WHERE rn <= 3""")),

    // ---- Running aggregate + lag over an ordered window (S8, R33 substrate).
    Q("q14_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        T.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"),
          round(col("o_totalprice") - coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2)
            .as("delta_prev"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS running_total,
             round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS delta_prev
             FROM orders""")),

    // ---- rank / dense_rank / percent_rank (S8).
    Q("q15_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc)
        T.supplier(s, d).select(
          col("s_nationkey"), col("s_suppkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"))
      },
      Some("""SELECT s_nationkey, s_suppkey,
             rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
             round(percent_rank() OVER w, 6) AS prnk
             FROM supplier WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)""")),

    // ---- Global sort + limit → TakeOrderedAndProject (S9, R36).
    Q("q16_sort_limit",
      (s, d) => T.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(20),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // ---- UNION / INTERSECT / EXCEPT set algebra (S10, R39).
    Q("q17_setops",
      (s, d) => {
        val rich = T.customer(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        val big = T.orders(s, d).filter(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("c_custkey"))
        val lowNation = T.customer(s, d).filter(col("c_nationkey") < 5).select(col("c_custkey"))
        rich.union(big).distinct().except(lowNation)
      },
      Some("""SELECT c_custkey FROM (
               SELECT c_custkey FROM customer WHERE c_acctbal > 5000
               UNION
               SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000)
             EXCEPT
             SELECT c_custkey FROM customer WHERE c_nationkey < 5""")),

    // ---- INTERSECT (S10).
    Q("q18_intersect",
      (s, d) => T.customer(s, d).filter(col("c_acctbal") > 8000).select(col("c_custkey"))
        .intersect(T.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey"))),
      Some("""SELECT c_custkey FROM customer WHERE c_acctbal > 8000
             INTERSECT
             SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'""")),

    // ---- String scalar battery (S11, R52 concat shape).
    Q("q19_string_funcs",
      (s, d) => T.customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        length(col("c_name")).as("len"),
        substring(col("c_name"), 1, 8).as("prefix"),
        concat(col("c_mktsegment"), lit("/"), col("c_name")).as("cat"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("padded")),
      Some("""SELECT c_custkey, upper(c_name) AS up, length(c_name) AS len,
             substring(c_name, 1, 8) AS prefix,
             c_mktsegment || '/' || c_name AS cat,
             regexp_extract(c_name, '([0-9]+)', 1) AS digits,
             regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
             lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded
             FROM customer""")),

    // ---- Date/time scalar battery (S11; reference dates are strings, ours native).
    Q("q20_date_funcs",
      (s, d) => T.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .filter(col("y") < 1998),
      Some("""SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
             month(o_orderdate) AS m, count(*) AS n, round(sum(o_totalprice), 2) AS total
             FROM orders GROUP BY 1, 2, 3 HAVING year(o_orderdate) < 1998""")),

    // ---- Math scalar battery (S11).
    Q("q21_math_funcs",
      (s, d) => T.lineitem(s, d)
        .filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_extendedprice")), 4).as("sq"),
          ceil(col("l_discount") * 100).as("ce"),
          floor(col("l_tax") * 100).as("fl"),
          round(log(col("l_extendedprice") + 1), 6).as("ln_p"),
          round(pow(col("l_quantity"), 2), 4).as("pw"),
          abs(col("l_quantity") - lit(25)).as("ab"),
          signum(col("l_discount") - 0.05).as("sg")),
      Some("""SELECT l_orderkey, l_linenumber,
             round(sqrt(l_extendedprice), 4) AS sq,
             CAST(ceil(l_discount * 100) AS BIGINT) AS ce,
             CAST(floor(l_tax * 100) AS BIGINT) AS fl,
             round(ln(l_extendedprice + 1), 6) AS ln_p,
             round(pow(l_quantity, 2), 4) AS pw,
             abs(l_quantity - 25) AS ab,
             CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg
             FROM lineitem WHERE l_orderkey % 100 = 0""")),

    // ---- CASE WHEN bucketing (S3).
    Q("q22_case_bucket",
      (s, d) => T.customer(s, d)
        .withColumn("bucket",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 3000, "low")
            .when(col("c_acctbal") < 7000, "mid")
            .otherwise("high"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), round(avg(col("c_acctbal")), 4).as("avg_bal")),
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                          WHEN c_acctbal < 3000 THEN 'low'
                          WHEN c_acctbal < 7000 THEN 'mid'
                          ELSE 'high' END AS bucket,
             count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
             FROM customer GROUP BY 1""")),

    // ---- JSON extraction from events.props (S2/S11).
    Q("q23_json_extract",
      (s, d) => T.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k")),
      Some("""SELECT event_type, count(*) AS n,
             CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
             max(CAST(props->>'$.k' AS INT)) AS max_k
             FROM events GROUP BY event_type""")),

    // ---- Array/higher-order functions over embeddings (S11).
    Q("q24_array_funcs",
      (s, d) => T.embeddings(s, d)
        .filter(col("vec_id") < 100)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
          round(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double")), 4).as("sum_val"),
          round(sqrt(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("l2_norm")),
      Some("""SELECT vec_id, len(embedding) AS dim,
             round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
             round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS sum_val,
             round(sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm
             FROM embeddings WHERE vec_id < 100""")),

    // ---- Tumbling time buckets over events (batch face of §2.10 streaming).
    // Exact integer-ns bucket arithmetic on both engines (no double epoch).
    Q("q25_event_buckets",
      (s, d) => T.events(s, d)
        .withColumn("bucket", expr("ts_ns div 600000000000"))
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value")),
      Some("""SELECT epoch_ns(ts) // 600000000000 AS bucket,
             event_type, count(*) AS n, round(sum(value), 2) AS total_value
             FROM events GROUP BY 1, 2""")),

    // ---- Sessionization: gaps-and-islands via lag + cumulative sum (S8).
    Q("q26_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
        T.events(s, d)
          .withColumn("gap_ns", col("ts_ns") - lag(col("ts_ns"), 1).over(byUser))
          .withColumn("new_session",
            when(col("gap_ns").isNull || col("gap_ns") > 1800000000000L, 1).otherwise(0))
          .withColumn("session_id",
            sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            max(col("n_events")).as("max_session_events"),
            sum(col("n_events")).as("n_events"))
      },
      Some("""WITH e AS (
               SELECT user_id, event_id, epoch_ns(ts) AS ts_ns FROM events),
             flagged AS (
               SELECT user_id, event_id, ts_ns,
                 CASE WHEN ts_ns - lag(ts_ns, 1) OVER w IS NULL
                       OR ts_ns - lag(ts_ns, 1) OVER w > 1800000000000
                      THEN 1 ELSE 0 END AS new_session
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
             sessions AS (
               SELECT user_id,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
               FROM flagged),
             per_session AS (
               SELECT user_id, session_id, count(*) AS n_events
               FROM sessions GROUP BY user_id, session_id)
             SELECT user_id, count(*) AS n_sessions,
               max(n_events) AS max_session_events,
               CAST(sum(n_events) AS BIGINT) AS n_events
             FROM per_session GROUP BY user_id""")),

    // ---- Explicit GROUPING SETS through the spark.sql surface (S6): the
    // whole engine is reachable as SQL over registered temp views.
    Q("q52_grouping_sets_sql",
      (s, d) => {
        graft.SqlSurface.register(s, d)
        s.sql("""SELECT n_name, c_mktsegment, count(*) AS n,
                 round(sum(c_acctbal), 2) AS bal
                 FROM customer JOIN nation ON c_nationkey = n_nationkey
                 GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())""")
      },
      Some("""SELECT n_name, c_mktsegment, count(*) AS n,
             round(sum(c_acctbal), 2) AS bal
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())""")),

    // ---- Banded range join (S4): fact rows against interval dims via a
    // broadcast nested-loop join on lo <= x < hi.
    Q("q58_range_band",
      (s, d) => {
        val bands = s.createDataFrame(Seq(
          (0, 15, "small"), (15, 35, "mid"), (35, 100, "large")))
          .toDF("lo", "hi", "band")
        T.part(s, d).join(broadcast(bands),
            col("p_size") >= col("lo") && col("p_size") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_parts"),
            round(sum(col("p_retailprice")), 2).as("total_price"))
      },
      Some("""SELECT band, count(*) AS n_parts,
             round(sum(p_retailprice), 2) AS total_price
             FROM part JOIN (VALUES (0, 15, 'small'), (15, 35, 'mid'),
                             (35, 100, 'large')) AS b(lo, hi, band)
             ON p_size >= lo AND p_size < hi
             GROUP BY band""")),

    // ---- As-of join (S4 note: composable, no custom strategy needed):
    // each purchase matched to the user's most recent STRICTLY PRIOR click
    // — a union-tag + last(ignoreNulls) window over exact ns timestamps.
    // At scale this is one shuffle by user_id, no range-join explosion.
    Q("q57_asof_join",
      (s, d) => {
        // µs precision: DuckDB truncates parquet ns-timestamps to µs, so
        // the oracle-comparable resolution is microseconds (exact ints).
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        T.events(s, d)
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("asof_click_ts",
            last(when(col("event_type") === "click", col("ts_us")), ignoreNulls = true)
              .over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("asof_click_ts"),
            when(col("asof_click_ts").isNotNull,
              col("ts_us") - col("asof_click_ts")).as("us_since_click"))
      },
      Some("""SELECT event_id, user_id, ts_us, asof_click_ts,
             CASE WHEN asof_click_ts IS NOT NULL
                  THEN ts_us - asof_click_ts END AS us_since_click
             FROM (
               SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
                 last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                   IGNORE NULLS) OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS asof_click_ts
               FROM events)
             WHERE event_type = 'purchase'""")),

    // ---- Pivot / conditional aggregation (S6-adjacent): event-type
    // counts as columns per user (portable CASE form on the oracle side).
    Q("q59_pivot",
      (s, d) => T.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("click" -> "n_click", "view" -> "n_view",
          "purchase" -> "n_purchase", "signup" -> "n_signup", "error" -> "n_error")),
      Some("""SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
             FROM events GROUP BY user_id""")),

    // ---- approx_count_distinct / HLL (S5): the sketch estimate is
    // engine-specific, but the query still carries a HARD oracle on the
    // exact count + a within-5% accuracy flag (see below).
    Q("q53_approx_distinct",
      (s, d) => T.orders(s, d)
        // Two-level aggregation instead of countDistinct-next-to-other-aggs:
        // mixing a distinct agg with plain aggs triggers Catalyst's Expand
        // rewrite (row count ×2 through the first shuffle). Pre-grouping by
        // (status, custkey) makes exact_customers a plain count, and the HLL
        // sketch is duplicate-insensitive, so approx_count_distinct over the
        // deduped level-1 rows is the SAME estimate — two cheap partial-agg
        // shuffles, no Expand.
        .groupBy(col("o_orderstatus"), col("o_custkey"))
        .agg(count(lit(1)).as("nk"))
        .groupBy(col("o_orderstatus"))
        // count(o_custkey), not count(1): a NULL custkey forms a level-1
        // group too, and countDistinct (the semantics this rewrite
        // replaces) never counted NULLs.
        .agg(approx_count_distinct(col("o_custkey"), 0.01).as("approx_customers"),
          count(col("o_custkey")).as("exact_customers"),
          sum(col("nk")).as("n"))
        // The HLL estimate itself is engine-specific, so it is NOT an
        // oracle column; what IS oracle-checked is the exact count, n, and
        // a Spark-computed within-5% accuracy boolean that DuckDB asserts
        // as literal TRUE — the sketch must be accurate for the hash to
        // match. rsd = 0.01 makes the 5% bound a ~5σ guarantee (the
        // default 0.05 rsd misses 5% on ~1/3 of groups — observed at
        // sf0.01); accuracy is additionally pinned in RelationalSpec.
        .select(col("o_orderstatus"), col("exact_customers"), col("n"),
          (abs(col("approx_customers") - col("exact_customers"))
            <= col("exact_customers") * 0.05).as("within_5pct")),
      Some("""SELECT o_orderstatus,
             count(DISTINCT o_custkey) AS exact_customers,
             count(*) AS n, TRUE AS within_5pct
             FROM orders GROUP BY o_orderstatus""")),

    // ---- Subquery surface (S3/S4 adjunct): the SQL planner paths a
    // relational user expects — correlated EXISTS (→ left semi),
    // uncorrelated scalar (→ broadcast 1-row), IN (→ left semi), and
    // correlated scalar aggregate (→ left outer + default-on-empty, the
    // classic COUNT-bug shape). Identical SQL runs on both engines.
    Q("q66_exists_subquery",
      (s, d) => {
        graft.SqlSurface.register(s, d)
        s.sql("""SELECT c_custkey, c_name FROM customer c
                 WHERE EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_totalprice > 300000)""")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             WHERE EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_totalprice > 300000)""")),

    Q("q67_scalar_subquery",
      (s, d) => {
        graft.SqlSurface.register(s, d)
        s.sql("""SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
                 FROM part
                 WHERE p_retailprice > 1.5 * (SELECT avg(p_retailprice) FROM part)""")
      },
      Some("""SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
             FROM part
             WHERE p_retailprice > 1.5 * (SELECT avg(p_retailprice) FROM part)""")),

    Q("q68_in_subquery",
      (s, d) => {
        graft.SqlSurface.register(s, d)
        s.sql("""SELECT s_suppkey, s_name FROM supplier
                 WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                                       WHERE n_name LIKE 'A%')""")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
             WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                                   WHERE n_name LIKE 'A%')""")),

    Q("q69_correlated_count",
      (s, d) => {
        graft.SqlSurface.register(s, d)
        s.sql("""SELECT o_orderkey,
                   (SELECT count(*) FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey) AS n_items
                 FROM orders o WHERE o_orderkey <= 2000""")
      },
      Some("""SELECT o_orderkey,
               (SELECT count(*) FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS n_items
             FROM orders o WHERE o_orderkey <= 2000""")),

    // ---- Statistical profile (S7 widening): exact interpolated
    // percentiles, stddev, and Pearson correlation per group. stddev/corr
    // are DERIVED FROM EXACT INTEGER SUMS (n, Σx, Σx², Σy, Σy², Σxy) with
    // the identical double formula on both engines — never the engines'
    // own stddev/corr aggregates, whose summation order differs. Exact
    // percentile is the oracle-checkable form; approx_percentile (t-digest)
    // is the same-shaped 100 TB path when a group's values no longer fit
    // one aggregation buffer.
    Q("q88_stat_profile",
      (s, d) => T.documents(s, d)
        .select(col("lang"), col("n_chars"),
          expr("size(filter(split(text, '\\\\s+'), t -> t <> ''))")
            .cast("long").as("n_toks"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"),
          sum(col("n_toks")).as("sy"),
          sum(col("n_toks") * col("n_toks")).as("syy"),
          sum(col("n_chars") * col("n_toks")).as("sxy"),
          expr("round(percentile(n_chars, 0.5), 6)").as("p50_chars"),
          expr("round(percentile(n_chars, 0.9), 6)").as("p90_chars"))
        .filter(col("n_docs") >= 2)
        .select(col("lang"), col("n_docs"), col("p50_chars"), col("p90_chars"),
          // greatest(0.0, …): with a constant-valued group, double rounding
          // can make the variance term slightly negative — Spark's sqrt
          // returns NaN but DuckDB raises Out-of-Range, so an unguarded form
          // diverges in FAILURE MODE (oracle exec error), not just value.
          expr("""round(sqrt(greatest(0.0, CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_docs) / (n_docs - 1)), 6)""")
            .as("sd_chars"),
          expr("""CASE WHEN n_docs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                        AND n_docs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                       THEN round((n_docs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                         (sqrt(n_docs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                          sqrt(n_docs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                  END""").as("corr_chars_toks"))
        .orderBy(col("lang")),
      Some("""WITH sig AS (
               SELECT lang, n_chars,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                   t -> t <> '')) AS BIGINT) AS n_toks
               FROM documents),
             g AS (
               SELECT lang,
                 count(*) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS sx,
                 CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx,
                 CAST(sum(n_toks) AS BIGINT) AS sy,
                 CAST(sum(n_toks * n_toks) AS BIGINT) AS syy,
                 CAST(sum(n_chars * n_toks) AS BIGINT) AS sxy,
                 round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
                 round(quantile_cont(n_chars, 0.9), 6) AS p90_chars
               FROM sig GROUP BY lang HAVING count(*) >= 2)
             SELECT lang, n_docs, p50_chars, p90_chars,
               round(sqrt(greatest(0.0, CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_docs) / (n_docs - 1)), 6)
                 AS sd_chars,
               CASE WHEN n_docs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                     AND n_docs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                    THEN round((n_docs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                      (sqrt(n_docs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                       sqrt(n_docs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               END AS corr_chars_toks
             FROM g ORDER BY lang""")),

    // ---- Unpivot / melt (S10-adjacent surface): per-doc signals to long
    // form via Dataset.unpivot, then a per-(lang, signal) rollup. The
    // oracle uses the portable UNION ALL expansion — same rows, and the
    // long form shuffles once on (lang, signal).
    Q("q90_unpivot_signals",
      (s, d) => T.documents(s, d)
        .select(col("doc_id").as("id"), col("lang"),
          col("n_chars").cast("long").as("chars"),
          expr("size(filter(split(text, '\\\\s+'), t -> t <> ''))")
            .cast("long").as("toks"),
          expr("size(filter(split(text, '\\n'), l -> length(trim(l)) > 0))")
            .cast("long").as("lines"))
        .unpivot(Array(col("id"), col("lang")),
          Array(col("chars"), col("toks"), col("lines")), "signal", "value")
        .groupBy(col("lang"), col("signal"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"),
          round(avg(col("value")), 6).as("mean"))
        .orderBy(col("lang"), col("signal")),
      Some("""WITH sig AS (
               SELECT doc_id AS id, lang,
                 CAST(n_chars AS BIGINT) AS chars,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                   t -> t <> '')) AS BIGINT) AS toks,
                 CAST(len(list_filter(string_split(text, chr(10)),
                   l -> length(trim(l)) > 0)) AS BIGINT) AS lines
               FROM documents),
             longf AS (
               SELECT id, lang, 'chars' AS signal, chars AS value FROM sig
               UNION ALL SELECT id, lang, 'toks', toks FROM sig
               UNION ALL SELECT id, lang, 'lines', lines FROM sig)
             SELECT lang, signal, count(*) AS n,
               CAST(sum(value) AS BIGINT) AS total,
               round(avg(value), 6) AS mean
             FROM longf GROUP BY lang, signal ORDER BY lang, signal""")),

    // ---- Multi-measure pivot (q90's inverse, widening q59's
    // single-count form): two aggregates per pivot value exercises Spark's
    // `{value}_{aggAlias}` output naming and the null-preserving absent
    // combination semantics (q59 na.fills instead). Explicit pivot values
    // keep the plan a single pass (no distinct-values pre-query) — the
    // form that scales: one groupBy shuffle on the row key, conditional
    // aggregation map-side. The oracle is the portable CASE-WHEN expansion
    // Spark itself rewrites pivot into. Quantities are integer-valued
    // doubles (1..50) cast to BIGINT so the sums are exact on both engines
    // regardless of accumulation order.
    Q("q93_pivot_status",
      (s, d) => T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
               CAST(sum(CASE WHEN l_linestatus = 'F'
                 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS F_qty,
               count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F_n,
               CAST(sum(CASE WHEN l_linestatus = 'O'
                 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS O_qty,
               count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O_n
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Ordered conversion funnel over the event stream: signup → view
    // → click → purchase, each stage's timestamp the MIN matching event
    // STRICTLY AFTER the previous stage and within a 24 h conversion
    // window of it (the standard product-analytics funnel — ordered AND
    // time-bounded, not mere set-membership; unbounded, this corpus
    // converts everyone). The four dependent minima chain as four window
    // aggregations over the SAME user partitioning — Catalyst reuses one
    // exchange for all four Window operators, so the whole funnel costs a
    // single user_id shuffle regardless of stage count (the alternative,
    // one groupBy+join-back per stage, is 4 shuffles + 3 joins; the
    // oracle mirrors with that chain since SQL window frames can't nest).
    // All arithmetic on exact ts_ns longs; conversion total is an integer
    // sum.
    Q("q100_funnel_stages",
      (s, d) => {
        val W = 86400000000000L // 24 h in ns
        val w = Window.partitionBy(col("user_id"))
        def nextStage(evt: String, prev: String) =
          min(when(col("event_type") === evt &&
            col("ts_ns") > col(prev) &&
            col("ts_ns") <= col(prev) + lit(W), col("ts_ns"))).over(w)
        val t = T.events(s, d)
          .withColumn("t1", min(when(col("event_type") === "signup",
            col("ts_ns"))).over(w))
          .withColumn("t2", nextStage("view", "t1"))
          .withColumn("t3", nextStage("click", "t2"))
          .withColumn("t4", nextStage("purchase", "t3"))
          .select(col("user_id"), col("t1"), col("t2"), col("t3"), col("t4"))
          .distinct()
        t.withColumn("stage",
            when(col("t1").isNull, 0).when(col("t2").isNull, 1)
              .when(col("t3").isNull, 2).when(col("t4").isNull, 3)
              .otherwise(4))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("t4") - col("t1")).as("total_conv_ns"))
          .orderBy(col("stage"))
      },
      Some("""WITH e AS (
               SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
             u1 AS (
               SELECT user_id,
                 min(CASE WHEN event_type = 'signup' THEN ts_ns END) AS t1
               FROM e GROUP BY user_id),
             u2 AS (
               SELECT e.user_id, t1,
                 min(CASE WHEN event_type = 'view' AND ts_ns > t1
                   AND ts_ns <= t1 + 86400000000000 THEN ts_ns END) AS t2
               FROM e JOIN u1 USING (user_id) GROUP BY e.user_id, t1),
             u3 AS (
               SELECT e.user_id, t1, t2,
                 min(CASE WHEN event_type = 'click' AND ts_ns > t2
                   AND ts_ns <= t2 + 86400000000000 THEN ts_ns END) AS t3
               FROM e JOIN u2 USING (user_id) GROUP BY e.user_id, t1, t2),
             u4 AS (
               SELECT e.user_id, t1, t2, t3,
                 min(CASE WHEN event_type = 'purchase' AND ts_ns > t3
                   AND ts_ns <= t3 + 86400000000000 THEN ts_ns END) AS t4
               FROM e JOIN u3 USING (user_id) GROUP BY e.user_id, t1, t2, t3)
             SELECT CASE WHEN t1 IS NULL THEN 0 WHEN t2 IS NULL THEN 1
                         WHEN t3 IS NULL THEN 2 WHEN t4 IS NULL THEN 3
                         ELSE 4 END AS stage,
               count(*) AS n_users,
               CAST(sum(t4 - t1) AS BIGINT) AS total_conv_ns
             FROM u4 GROUP BY 1 ORDER BY 1""")),

    // ---- Weekly cohort retention: users bucketed by first-seen week,
    // counted distinct per (cohort, week-offset). day/week are exact
    // integer floor-divisions of ts_ns, so there is no timezone or
    // rounding surface. Two shuffles total: one user_id agg for the
    // cohort anchor, one (cohort, offset) distinct-count — the join-back
    // is user-keyed and co-partitioned with the anchor agg at scale (the
    // anchor side is |users|, far smaller than events; AQE broadcasts it
    // when it fits, which is exactly the right call on both sides of the
    // 100 TB boundary).
    Q("q101_cohort_retention",
      (s, d) => {
        val e = T.events(s, d)
          .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
        val anchors = e.groupBy(col("user_id"))
          .agg(min(col("day")).as("day0"))
        e.join(anchors, Seq("user_id"))
          .select(col("user_id"), expr("day0 div 7").as("cohort_week"),
            expr("(day - day0) div 7").as("week_offset"))
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH e AS (
               SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
               FROM events),
             a AS (SELECT user_id, min(day) AS day0 FROM e GROUP BY user_id)
             SELECT day0 // 7 AS cohort_week, (day - day0) // 7 AS week_offset,
               count(DISTINCT e.user_id) AS n_users
             FROM e JOIN a USING (user_id)
             GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- Z-score anomaly detection: events whose value is > 3σ from
    // their event_type's mean — the q88 exact-integer-moment discipline
    // (values quantized to cents, sums/products exact BIGINTs) pointed at
    // outlier flagging. The degenerate-variance guard is an exact INTEGER
    // predicate (sxx·n − sx² > 0) rather than a float epsilon, because
    // NaN comparison semantics differ between engines (Spark's NaN > 3 is
    // false, DuckDB sorts NaN above everything) — the one cross-engine
    // trap a float guard would step on. Per-event z is then a single
    // double expression over integers, micro-quantized. One shuffle (the
    // 5-row per-type stats agg, broadcast back); the event scan stays
    // narrow.
    Q("q106_zscore_outliers",
      (s, d) => {
        val e = T.events(s, d).select(col("event_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        val stats = e.groupBy(col("event_type")).agg(
          sum(col("cents")).as("sx"),
          sum(col("cents") * col("cents")).as("sxx"),
          count(lit(1)).as("n"))
        e.join(broadcast(stats), Seq("event_type"))
          .filter(col("n") > 1 &&
            col("sxx") * col("n") - col("sx") * col("sx") > 0)
          .withColumn("z_micro", expr(
            """CAST(round((CAST(cents AS DOUBLE) - CAST(sx AS DOUBLE) / n)
              |  / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
              |          * CAST(sx AS DOUBLE) / n) / (n - 1))
              |  * 1000000) AS BIGINT)""".stripMargin))
          .filter(abs(col("z_micro")) > lit(3000000L))
          .select(col("event_id"), col("event_type"), col("cents"),
            col("z_micro"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (
               SELECT event_id, event_type,
                 CAST(round(value * 100) AS BIGINT) AS cents
               FROM events),
             st AS (
               SELECT event_type, CAST(sum(cents) AS BIGINT) AS sx,
                 CAST(sum(cents * cents) AS BIGINT) AS sxx,
                 count(*) AS n
               FROM e GROUP BY event_type),
             z AS (
               SELECT e.event_id, e.event_type, e.cents,
                 CAST(round((CAST(cents AS DOUBLE) - CAST(sx AS DOUBLE) / n)
                   / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                           * CAST(sx AS DOUBLE) / n) / (n - 1))
                   * 1000000) AS BIGINT) AS z_micro
               FROM e JOIN st USING (event_type)
               WHERE n > 1 AND sxx * n - sx * sx > 0)
             SELECT event_id, event_type, cents, z_micro FROM z
             WHERE abs(z_micro) > 3000000 ORDER BY event_id""")),

    // ---- Z-order layout tiles: Morton-interleave (l_partkey, l_suppkey)
    // and aggregate min/max of BOTH keys per 2^18-aligned curve tile —
    // exactly the parquet footer stats a z-clustered write would carry,
    // demonstrating why a scan filtered on EITHER key prunes files (each
    // tile is a ≤ 512×512 rectangle; ZOrderSpec pins the bound exactly).
    // The interleave is one codegen'd integer expression (ZOrder.zValue),
    // mirrored textually into DuckDB by ZOrder.zValueSql — no shuffle
    // beyond the tile agg.
    Q("q107_zorder_tiles",
      (s, d) => T.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"))
        .withColumn("z", graft.operators.ZOrder.zValue(
          col("l_partkey"), col("l_suppkey"), 16))
        .withColumn("tile", expr("z div 262144"))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
          min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
        .orderBy(col("tile")),
      Some(s"""WITH z AS (
               SELECT l_partkey, l_suppkey,
                 ${graft.operators.ZOrder.zValueSql("l_partkey", "l_suppkey", 16)} AS zv
               FROM lineitem)
             SELECT zv // 262144 AS tile, count(*) AS n,
               min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
               min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
             FROM z GROUP BY 1 ORDER BY 1""")),

    // ---- ntile curriculum bins: equal-population length quartiles per
    // language (the rank-based counterpart of q104's k-means bins, and
    // the missing ntile() from the S8 window family — q13/q14/q15 cover
    // rank/row_number/running aggs). Tie-break pinned by doc_id so the
    // bucket assignment is total-ordered on both engines; one lang
    // shuffle, no joins.
    Q("q108_ntile_bins",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("chars"), col("doc_id"))
        T.documents(s, d)
          .select(col("doc_id"), col("lang"),
            col("n_chars").cast("long").as("chars"))
          .withColumn("bin", ntile(4).over(w))
          .groupBy(col("lang"), col("bin"))
          .agg(count(lit(1)).as("n"),
            min(col("chars")).as("lo"), max(col("chars")).as("hi"),
            sum(col("chars")).as("total"))
          .orderBy(col("lang"), col("bin"))
      },
      Some("""WITH b AS (
               SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS chars,
                 ntile(4) OVER (PARTITION BY lang
                   ORDER BY n_chars, doc_id) AS bin
               FROM documents)
             SELECT lang, bin, count(*) AS n,
               min(chars) AS lo, max(chars) AS hi,
               CAST(sum(chars) AS BIGINT) AS total
             FROM b GROUP BY lang, bin ORDER BY lang, bin""")),

    // ---- Time-RANGE window frames: per event, the count and value-sum
    // of the SAME USER's events in the trailing hour — rangeBetween over
    // exact ts_ns (a value frame, not a row frame: simultaneous events
    // all see the same trailing window, and gaps shrink it — semantics a
    // rows-frame can't express; the last S8 frame type the battery
    // lacked). Value sums in exact cents. One user_id shuffle. The
    // summary rollup keeps the output driver-comparable while every
    // event's frame result feeds the hash (max per user pins the frame
    // computation, not just its existence).
    Q("q109_trailing_window",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
          .rangeBetween(-3600000000000L, 0L)
        T.events(s, d)
          .select(col("user_id"), col("ts_ns"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("cents_1h", sum(col("cents")).over(w))
          .groupBy(col("user_id"))
          .agg(max(col("n_1h")).as("peak_events_1h"),
            max(col("cents_1h")).as("peak_cents_1h"),
            sum(col("n_1h")).as("total_frame_rows"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
               SELECT user_id, epoch_ns(ts) AS ts_ns,
                 CAST(round(value * 100) AS BIGINT) AS cents
               FROM events),
             f AS (
               SELECT user_id,
                 count(*) OVER w AS n_1h,
                 CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
               FROM e
               WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns
                 RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW))
             SELECT user_id, max(n_1h) AS peak_events_1h,
               max(cents_1h) AS peak_cents_1h,
               CAST(sum(n_1h) AS BIGINT) AS total_frame_rows
             FROM f GROUP BY user_id ORDER BY user_id""")),

    // ---- CUSUM mean-shift detection per event_type — drift monitoring
    // for a live ingest. The one-sided CUSUM recurrence
    // S_i = max(0, S_{i-1} + d_i) looks window-inexpressible, but the
    // classic prefix identity S_i = P_i − min(0, min_{j≤i} P_j) (P =
    // running sum of deviations) turns it into TWO stacked running
    // windows over one partitioning — no recurrence, no mapPartitions,
    // one shuffle. Deviations are scaled by n (d′ = cents·n − sx) so the
    // mean subtraction stays exact-integer; the alarm threshold scales
    // identically (h·n). Output: per type, alarm count, peak statistic,
    // and its first-reaching event (min ts tie-break) — all integers.
    Q("q111_cusum_shift",
      (s, d) => {
        val e = T.events(s, d).select(col("event_type"), col("event_id"),
          col("ts_ns"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        val stats = e.groupBy(col("event_type"))
          .agg(sum(col("cents")).as("sx"), count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts_ns"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val scored = e.join(broadcast(stats), Seq("event_type"))
          .withColumn("dev", col("cents") * col("n") - col("sx"))
          .withColumn("p", sum(col("dev")).over(w))
          .withColumn("cusum", col("p") - least(min(col("p")).over(w), lit(0L)))
        scored
          .withColumn("alarm",
            (col("cusum") > lit(100000L) * col("n")).cast("long"))
          .withColumn("mx",
            max(col("cusum")).over(Window.partitionBy(col("event_type"))))
          .groupBy(col("event_type"))
          .agg(sum(col("alarm")).as("n_alarms"),
            max(col("cusum")).as("peak_cusum_scaled"),
            min(when(col("cusum") === col("mx"), col("event_id")))
              .as("peak_event_id"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (
               SELECT event_type, event_id, epoch_ns(ts) AS ts_ns,
                 CAST(round(value * 100) AS BIGINT) AS cents
               FROM events),
             st AS (
               SELECT event_type, CAST(sum(cents) AS BIGINT) AS sx,
                 count(*) AS n
               FROM e GROUP BY event_type),
             p AS (
               SELECT e.event_type, event_id, ts_ns, n,
                 CAST(sum(cents * n - sx) OVER w AS BIGINT) AS p
               FROM e JOIN st USING (event_type)
               WINDOW w AS (PARTITION BY e.event_type
                 ORDER BY ts_ns, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             c AS (
               SELECT event_type, event_id, n,
                 p - least(min(p) OVER (PARTITION BY event_type
                   ORDER BY ts_ns, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                   AS cusum
               FROM p),
             cm AS (
               SELECT *, max(cusum) OVER (PARTITION BY event_type) AS mx
               FROM c)
             SELECT event_type,
               CAST(sum(CASE WHEN cusum > 100000 * n THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_alarms,
               max(cusum) AS peak_cusum_scaled,
               min(CASE WHEN cusum = mx THEN event_id END) AS peak_event_id
             FROM cm GROUP BY event_type ORDER BY event_type""")),

    // ---- Grid-bucketed spatial join (points-in-boxes): supplier points
    // vs customer boxes on a synthetic integer centi-degree plane (hash-
    // free modular synthesis so both engines derive identical coords
    // from the keys). Spark runs SpatialJoin.pointsInBoxes — the
    // LSH-style equi-join on grid cells with exact containment verify,
    // each true pair met exactly once; the oracle is the naive theta
    // join (same pairs, O(n·m) — fine at oracle scale, the thing the
    // grid exists to avoid at 100 TB).
    Q("q112_spatial_join",
      (s, d) => {
        val pts = T.supplier(s, d).select(
          col("s_suppkey").cast("long").as("id"),
          expr("(s_suppkey * 7919) % 36000 - 18000").cast("long").as("x"),
          expr("(s_suppkey * 104729) % 18000 - 9000").cast("long").as("y"))
        val bxs = T.customer(s, d).select(
          col("c_custkey").cast("long").as("box_id"),
          expr("(c_custkey * 7919) % 36000 - 18000 - (100 + c_custkey % 400)")
            .cast("long").as("x_min"),
          expr("(c_custkey * 7919) % 36000 - 18000 + (100 + c_custkey % 400)")
            .cast("long").as("x_max"),
          expr("(c_custkey * 104729) % 18000 - 9000 - (100 + c_custkey % 300)")
            .cast("long").as("y_min"),
          expr("(c_custkey * 104729) % 18000 - 9000 + (100 + c_custkey % 300)")
            .cast("long").as("y_max"))
        graft.operators.SpatialJoin.pointsInBoxes(pts, bxs, cellSize = 500L)
          .groupBy(col("box_id")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("box_id")).limit(20)
      },
      Some("""WITH p AS (
               SELECT s_suppkey AS id,
                 (s_suppkey * 7919) % 36000 - 18000 AS x,
                 (s_suppkey * 104729) % 18000 - 9000 AS y
               FROM supplier),
             b AS (
               SELECT c_custkey AS box_id,
                 (c_custkey * 7919) % 36000 - 18000 AS cx,
                 (c_custkey * 104729) % 18000 - 9000 AS cy,
                 100 + c_custkey % 400 AS wx,
                 100 + c_custkey % 300 AS wy
               FROM customer)
             SELECT box_id, count(*) AS n
             FROM p JOIN b
               ON x BETWEEN cx - wx AND cx + wx
              AND y BETWEEN cy - wy AND cy + wy
             GROUP BY box_id ORDER BY n DESC, box_id LIMIT 20""")),

    // ---- CDC changelog collapse + snapshot⊕delta merge: events as a
    // mutation log on user_id ('error' = tombstone), compacted at a
    // mid-month cutoff into an O(keys) snapshot, then merged with the
    // newer delta. Spark runs the two-step incremental path (compact →
    // merge — the Changelog scaladoc algebra); the oracle collapses the
    // WHOLE log in one window, so the hash compare IS the proof that
    // snapshot⊕delta == full-log collapse across engines. Latest-wins is
    // a map-side-combining max(struct) agg, not a window (skew note in
    // operators/Changelog.scala).
    Q("q114_changelog_merge",
      (s, d) => {
        val log = T.events(s, d).select(
          col("user_id"), col("ts_ns"), col("event_id"),
          col("event_type"), col("value"))
        val cut = lit(1705363200000000000L) // 2024-01-16T00:00Z as ns
        val snap = graft.operators.Changelog.latestState(
          log.filter(col("ts_ns") < cut),
          Seq("user_id"), Seq("ts_ns", "event_id"), "event_type", "error",
          dropTombstones = false)
        val state = graft.operators.Changelog.mergeSnapshot(
          snap, log.filter(col("ts_ns") >= cut),
          Seq("user_id"), Seq("ts_ns", "event_id"), "event_type", "error")
        state.select(col("user_id"),
          col("event_id").as("last_event_id"),
          col("ts_ns").as("last_ts_ns"),
          col("event_type").as("last_type"),
          round(col("value"), 6).as("last_value"),
          col("n_log_rows"))
          .orderBy(col("user_id"))
      },
      Some("""WITH log AS (
               SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type,
                 value
               FROM events),
             w AS (
               SELECT *,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts_ns DESC, event_id DESC) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS n_log_rows
               FROM log)
             SELECT user_id, event_id AS last_event_id, ts_ns AS last_ts_ns,
               event_type AS last_type, round(value, 6) AS last_value,
               n_log_rows
             FROM w WHERE rn = 1 AND event_type <> 'error'
             ORDER BY user_id""")),

    // ---- Mergeable log-histogram quantiles (Sketches.histBuild/
    // histQuantiles): the bounded-error artifact path behind q88's exact
    // percentiles — HdrHistogram-style base-2 buckets (3 sub-bucket
    // bits → ≤1/16 relative error) from pure integer bit arithmetic, so
    // DuckDB rebuilds the histogram bucket-for-bucket with `>>`/`//`
    // mirrors of the same expressions and the estimates hash-compare.
    // One map-side-combined groupBy builds the O(8·log₂ max)-row
    // artifact; the quantile walk is O(buckets), data-size-independent.
    Q("q119_hist_quantiles",
      (s, d) => {
        val cents = T.lineitem(s, d).select(
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        val hist = graft.operators.Sketches.histBuild(cents, "cents")
        graft.operators.Sketches
          .histQuantiles(hist, Seq(25, 50, 75, 90, 99))
          .orderBy(col("pct"))
      },
      Some("""WITH v AS (
               SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
               FROM lineitem),
             b AS (
               SELECT CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx
               FROM v),
             h AS (SELECT idx, count(*) AS cnt FROM b GROUP BY idx),
             c AS (
               SELECT idx, cnt,
                 CAST(sum(cnt) OVER (ORDER BY idx) AS BIGINT) AS cum,
                 CAST(sum(cnt) OVER () AS BIGINT) AS n
               FROM h),
             p AS (SELECT CAST(unnest([25, 50, 75, 90, 99]) AS INT) AS pct),
             sel AS (
               SELECT p.pct, min(c.idx) AS idx
               FROM p JOIN c
                 ON c.cum >= (CAST(p.pct AS BIGINT) * c.n + 99) // 100
               GROUP BY p.pct)
             SELECT pct,
               CAST(CASE WHEN idx <= 15 THEN idx
                 ELSE (((CAST(8 + (idx - 16) % 8 AS BIGINT)
                          << (1 + (idx - 16) // 8)) +
                        (CAST(9 + (idx - 16) % 8 AS BIGINT)
                          << (1 + (idx - 16) // 8)) - 1) >> 1)
                 END AS BIGINT) AS est
             FROM sel ORDER BY pct""")),

    // ---- Declarative data-quality gate (operators/DataChecks): the
    // whole expectation suite — range/domain/null rules in ONE
    // map-side-combined pass, key uniqueness (the one inherently
    // shuffling rule), FK orphans (anti-join, parent side
    // AQE-broadcastable) — unioned into a single violations report.
    // NULL predicates count as violations (a null can't prove it
    // passed). The upper-bound rule genuinely trips on this corpus.
    Q("q121_data_checks",
      (s, d) => {
        import graft.operators.DataChecks
        import graft.operators.DataChecks.Rule
        val o = T.orders(s, d)
        DataChecks.validate(o, Seq(
          Rule("totalprice_positive", col("o_totalprice") > 0),
          Rule("totalprice_upper_bound", col("o_totalprice") <= 400000),
          Rule("status_domain", col("o_orderstatus").isin("O", "F", "P")),
          Rule("priority_not_null", col("o_orderpriority").isNotNull)))
          .unionByName(DataChecks.uniqueKey(o, Seq("o_orderkey"),
            "orderkey_unique"))
          .unionByName(DataChecks.fkOrphans(o, "o_custkey",
            T.customer(s, d), "c_custkey", "custkey_fk"))
          .orderBy(col("check_name"))
      },
      Some("""WITH t AS (
               SELECT count(*) AS n,
                 sum(CASE WHEN coalesce(o_totalprice > 0, false)
                   THEN 0 ELSE 1 END) AS v0,
                 sum(CASE WHEN coalesce(o_totalprice <= 400000, false)
                   THEN 0 ELSE 1 END) AS v1,
                 sum(CASE WHEN coalesce(o_orderstatus IN ('O', 'F', 'P'),
                   false) THEN 0 ELSE 1 END) AS v2,
                 sum(CASE WHEN o_orderpriority IS NOT NULL
                   THEN 0 ELSE 1 END) AS v3
               FROM orders),
             uq AS (
               SELECT count(*) AS n,
                 count(*) - count(DISTINCT o_orderkey) AS v
               FROM orders),
             fk AS (
               SELECT (SELECT count(*) FROM orders) AS n,
                 (SELECT count(*)
                  FROM orders o
                  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                    ON o.o_custkey = c.c_custkey
                  WHERE c.c_custkey IS NULL) AS v)
             SELECT 'totalprice_positive' AS check_name, n AS n_rows,
               CAST(v0 AS BIGINT) AS n_violations FROM t
             UNION ALL SELECT 'totalprice_upper_bound', n,
               CAST(v1 AS BIGINT) FROM t
             UNION ALL SELECT 'status_domain', n,
               CAST(v2 AS BIGINT) FROM t
             UNION ALL SELECT 'priority_not_null', n,
               CAST(v3 AS BIGINT) FROM t
             UNION ALL SELECT 'orderkey_unique', n,
               CAST(v AS BIGINT) FROM uq
             UNION ALL SELECT 'custkey_fk', n, CAST(v AS BIGINT) FROM fk
             ORDER BY check_name""")),

    // ---- Automatic one-pass table profiler (operators/Profiler): the
    // schema-driven generalization of q88 — null/distinct/range/length
    // per column of ANY table in one aggregation (exact distincts via a
    // single Expand pass; approx_count_distinct is the documented
    // 100 TB switch). The oracle mirrors each of orders' six columns
    // explicitly; dtype strings are Spark's simpleString names.
    Q("q122_auto_profile",
      (s, d) => graft.operators.Profiler.profile(T.orders(s, d))
        .orderBy(col("column")),
      Some("""SELECT 'o_orderkey' AS "column", 'bigint' AS dtype,
               count(*) AS n_rows,
               count(*) - count(o_orderkey) AS n_nulls,
               count(DISTINCT o_orderkey) AS n_distinct,
               round(CAST(min(o_orderkey) AS DOUBLE), 6) AS min_num,
               round(CAST(max(o_orderkey) AS DOUBLE), 6) AS max_num,
               CAST(NULL AS DOUBLE) AS avg_len
             FROM orders
             UNION ALL SELECT 'o_custkey', 'bigint', count(*),
               count(*) - count(o_custkey), count(DISTINCT o_custkey),
               round(CAST(min(o_custkey) AS DOUBLE), 6),
               round(CAST(max(o_custkey) AS DOUBLE), 6),
               CAST(NULL AS DOUBLE)
             FROM orders
             UNION ALL SELECT 'o_orderstatus', 'string', count(*),
               count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               round(avg(length(o_orderstatus)), 6)
             FROM orders
             UNION ALL SELECT 'o_totalprice', 'double', count(*),
               count(*) - count(o_totalprice),
               count(DISTINCT o_totalprice),
               round(CAST(min(o_totalprice) AS DOUBLE), 6),
               round(CAST(max(o_totalprice) AS DOUBLE), 6),
               CAST(NULL AS DOUBLE)
             FROM orders
             UNION ALL SELECT 'o_orderdate', 'timestamp_ntz', count(*),
               count(*) - count(o_orderdate),
               count(DISTINCT o_orderdate),
               CAST(epoch_us(min(o_orderdate)) AS DOUBLE),
               CAST(epoch_us(max(o_orderdate)) AS DOUBLE),
               CAST(NULL AS DOUBLE)
             FROM orders
             UNION ALL SELECT 'o_orderpriority', 'string', count(*),
               count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               round(avg(length(o_orderpriority)), 6)
             FROM orders
             ORDER BY "column"""")),

    // ---- Per-group quantiles off the grouped histogram artifact
    // (q119's walk with a PARTITIONED cumulative window — each slice is
    // O(buckets) regardless of data size): per-lang doc-length median
    // and p99, the length-distribution monitor a mixture pipeline runs
    // per stratum.
    Q("q125_grouped_quantiles",
      (s, d) => {
        val v = T.documents(s, d).select(col("lang"),
          col("n_chars").cast("long").as("v"))
        val h = graft.operators.Sketches.histBuildGrouped(v, "v",
          Seq("lang"))
        graft.operators.Sketches.histQuantilesGrouped(h, Seq("lang"),
          Seq(50, 99)).orderBy(col("lang"), col("pct"))
      },
      Some("""WITH v AS (
               SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents),
             b AS (
               SELECT lang, CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx
               FROM v),
             h AS (SELECT lang, idx, count(*) AS cnt
                   FROM b GROUP BY lang, idx),
             c AS (
               SELECT lang, idx, cnt,
                 CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY idx)
                   AS BIGINT) AS cum,
                 CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
               FROM h),
             p AS (SELECT CAST(unnest([50, 99]) AS INT) AS pct),
             sel AS (
               SELECT c.lang, p.pct, min(c.idx) AS idx
               FROM p JOIN c
                 ON c.cum >= (CAST(p.pct AS BIGINT) * c.n + 99) // 100
               GROUP BY c.lang, p.pct)
             SELECT lang, pct,
               CAST(CASE WHEN idx <= 15 THEN idx
                 ELSE (((CAST(8 + (idx - 16) % 8 AS BIGINT)
                          << (1 + (idx - 16) // 8)) +
                        (CAST(9 + (idx - 16) % 8 AS BIGINT)
                          << (1 + (idx - 16) // 8)) - 1) >> 1)
                 END AS BIGINT) AS est
             FROM sel ORDER BY lang, pct""")),

    // ---- Incremental materialized-view maintenance
    // (operators/IncrementalAgg over the q114 changelog family): the
    // per-type (count, sum) aggregate of CURRENT user state, maintained
    // through the mid-month delta by the ±contribution rule — O(delta +
    // affected keys), corpus never rescanned. The oracle aggregates the
    // full-log latest live state in one shot, so the hash IS the
    // maintain ≡ rebuild proof (exact because sums are micro-int).
    Q("q127_incremental_view",
      (s, d) => {
        import graft.operators.{Changelog, IncrementalAgg}
        val log = T.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("event_type"),
          round(col("value") * 1e6).cast("long").as("v_micro"))
        val cut = lit(1705363200000000000L)
        val K = Seq("user_id"); val O = Seq("ts_ns", "event_id")
        val snap0 = Changelog.latestState(log.filter(col("ts_ns") < cut),
          K, O, "event_type", "error", dropTombstones = false)
        val agg0 = IncrementalAgg.contrib(
          snap0.filter(col("event_type") =!= "error"),
          "event_type", "v_micro")
        val (agg1, _) = IncrementalAgg.maintain(agg0, snap0,
          log.filter(col("ts_ns") >= cut), K, O, "event_type", "error",
          "event_type", "v_micro")
        agg1.select(col("event_type"), col("c").as("n_users"),
          round(col("s") / lit(1e6), 6).as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""WITH log AS (
               SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
                 event_type, CAST(round(value * 1e6) AS BIGINT) AS v_micro
               FROM events),
             w AS (
               SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts_ns DESC, event_id DESC) AS rn
               FROM log),
             live AS (
               SELECT * FROM w WHERE rn = 1 AND event_type <> 'error')
             SELECT event_type, count(*) AS n_users,
               round(CAST(sum(v_micro) AS BIGINT) / 1e6, 6) AS sum_value
             FROM live GROUP BY event_type ORDER BY event_type""")),

    // ---- Winsorized robust statistics: clamp prices into the [p1, p99]
    // band READ OFF THE q119 HISTOGRAM ARTIFACT (integer thresholds —
    // no second exact-percentile pass over the corpus), then per-flag
    // winsorized means + clip counts. The robust-stats consumer the
    // quantile artifact exists to serve: outlier-trimmed aggregates
    // whose thresholds cost O(buckets), not a corpus sort.
    Q("q131_winsorized_stats",
      (s, d) => {
        import graft.operators.Sketches
        val cents = T.lineitem(s, d).select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("v"))
        val th = Sketches
          .histQuantiles(Sketches.histBuild(cents, "v"), Seq(1, 99))
          .agg(min(when(col("pct") === 1, col("est"))).as("lo"),
            min(when(col("pct") === 99, col("est"))).as("hi"))
        cents.crossJoin(broadcast(th))
          .select(col("l_returnflag"),
            greatest(col("lo"), least(col("hi"), col("v"))).as("w"),
            (col("v") < col("lo")).cast("long").as("cl"),
            (col("v") > col("hi")).cast("long").as("ch"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"),
            sum(col("cl")).as("clipped_low"),
            sum(col("ch")).as("clipped_high"))
          .select(col("l_returnflag"), col("n"),
            round(col("sw") / col("n") / 100.0, 6).as("winsorized_mean"),
            col("clipped_low"), col("clipped_high"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH v0 AS (
               SELECT l_returnflag,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS v
               FROM lineitem),
             b AS (
               SELECT CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx
               FROM v0),
             h AS (SELECT idx, count(*) AS cnt FROM b GROUP BY idx),
             c AS (
               SELECT idx,
                 CAST(sum(cnt) OVER (ORDER BY idx) AS BIGINT) AS cum,
                 CAST(sum(cnt) OVER () AS BIGINT) AS n
               FROM h),
             p AS (SELECT CAST(unnest([1, 99]) AS INT) AS pct),
             sel AS (
               SELECT p.pct, min(c.idx) AS idx
               FROM p JOIN c
                 ON c.cum >= (CAST(p.pct AS BIGINT) * c.n + 99) // 100
               GROUP BY p.pct),
             est AS (
               SELECT pct,
                 CAST(CASE WHEN idx <= 15 THEN idx
                   ELSE (((CAST(8 + (idx - 16) % 8 AS BIGINT)
                            << (1 + (idx - 16) // 8)) +
                          (CAST(9 + (idx - 16) % 8 AS BIGINT)
                            << (1 + (idx - 16) // 8)) - 1) >> 1)
                   END AS BIGINT) AS est
               FROM sel),
             th AS (
               SELECT min(CASE WHEN pct = 1 THEN est END) AS lo,
                 min(CASE WHEN pct = 99 THEN est END) AS hi
               FROM est)
             SELECT l_returnflag, count(*) AS n,
               round(CAST(sum(greatest(lo, least(hi, v))) AS BIGINT)
                 / count(*) / 100.0, 6) AS winsorized_mean,
               CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT)
                 AS clipped_low,
               CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT)
                 AS clipped_high
             FROM v0 CROSS JOIN th
             GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Event-type transition matrix (first-order Markov over each
    // user's time-ordered stream): the behavioral-model summary next to
    // q100's fixed funnel — which steps actually follow which. One
    // user-keyed window + one (from, to) count; probabilities divide
    // exact integers per from-row.
    Q("q133_markov_transitions",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
        val trans = T.events(s, d)
          .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val fromTotals = trans.groupBy(col("from_type"))
          .agg(sum(col("n")).as("n_from"))
        trans.join(fromTotals, Seq("from_type"))
          .select(col("from_type"), col("to_type"), col("n"),
            round(col("n") / col("n_from"), 6).as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH e AS (
               SELECT user_id, event_id, event_type,
                 epoch_ns(ts) AS ts_ns
               FROM events),
             t AS (
               SELECT event_type AS from_type,
                 lead(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts_ns, event_id) AS to_type
               FROM e),
             trans AS (
               SELECT from_type, to_type, count(*) AS n
               FROM t WHERE to_type IS NOT NULL
               GROUP BY from_type, to_type),
             tot AS (
               SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
               FROM trans GROUP BY from_type)
             SELECT t.from_type, t.to_type, t.n,
               round(t.n / tot.n_from, 6) AS p
             FROM trans t JOIN tot USING (from_type)
             ORDER BY t.from_type, t.to_type""")),

    // ---- Top session paths (path mining over q26's sessionization):
    // the first 5 event types of every 30-min-gap session, concatenated
    // in time order, counted corpus-wide — "how do sessions actually
    // start". Deterministic ordering via sort_array over (ts, event_id)
    // structs; top-20 is a TakeOrdered.
    Q("q134_session_paths",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
        T.events(s, d)
          .withColumn("gap_ns",
            col("ts_ns") - lag(col("ts_ns"), 1).over(byUser))
          .withColumn("new_session",
            when(col("gap_ns").isNull ||
              col("gap_ns") > 1800000000000L, 1).otherwise(0))
          .withColumn("session_id", sum(col("new_session"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(expr("""concat_ws('>', slice(transform(
              sort_array(collect_list(struct(ts_ns, event_id, event_type))),
              x -> x.event_type), 1, 5))""").as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(20)
      },
      Some("""WITH e AS (
               SELECT user_id, event_id, event_type,
                 epoch_ns(ts) AS ts_ns
               FROM events),
             flagged AS (
               SELECT *, CASE WHEN ts_ns - lag(ts_ns, 1) OVER w IS NULL
                     OR ts_ns - lag(ts_ns, 1) OVER w > 1800000000000
                   THEN 1 ELSE 0 END AS new_session
               FROM e WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts_ns, event_id)),
             sess AS (
               SELECT *, sum(new_session) OVER (PARTITION BY user_id
                 ORDER BY ts_ns, event_id ROWS UNBOUNDED PRECEDING)
                 AS session_id
               FROM flagged),
             paths AS (
               SELECT user_id, session_id,
                 array_to_string(
                   (list(event_type ORDER BY ts_ns, event_id))[1:5],
                   '>') AS path
               FROM sess GROUP BY user_id, session_id)
             SELECT path, count(*) AS n_sessions
             FROM paths GROUP BY path
             ORDER BY n_sessions DESC, path LIMIT 20""")),

    // ---- Functional-dependency discovery/validation (the schema-rule
    // face of q121's value rules): does l_orderkey determine shipdate?
    // does a part pin its supplier? — violations counted per KEY (the
    // unit a fixer deduplicates). The cross-order FD runs over the
    // join; two of the three genuinely fail on this corpus.
    Q("q135_fd_checks",
      (s, d) => {
        import graft.operators.DataChecks
        val li = T.lineitem(s, d)
        DataChecks.functionalDependency(li, Seq("l_orderkey"),
            Seq("l_shipdate"), "order_determines_shipdate")
          .unionByName(DataChecks.functionalDependency(li,
            Seq("l_partkey"), Seq("l_suppkey"),
            "part_determines_supplier"))
          .unionByName(DataChecks.functionalDependency(
            li.join(T.orders(s, d),
              col("l_orderkey") === col("o_orderkey")),
            Seq("l_orderkey"), Seq("o_custkey"),
            "order_determines_customer"))
          .orderBy(col("check_name"))
      },
      Some("""WITH n_li AS (SELECT count(*) AS n FROM lineitem),
             n_j AS (
               SELECT count(*) AS n FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey),
             f1 AS (
               SELECT CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS v
               FROM (SELECT l_orderkey, count(*) AS n FROM (
                 SELECT DISTINCT l_orderkey, l_shipdate FROM lineitem)
                 GROUP BY l_orderkey)),
             f2 AS (
               SELECT CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS v
               FROM (SELECT l_partkey, count(*) AS n FROM (
                 SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
                 GROUP BY l_partkey)),
             f3 AS (
               SELECT CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS v
               FROM (SELECT l_orderkey, count(*) AS n FROM (
                 SELECT DISTINCT l_orderkey, o_custkey FROM lineitem
                 JOIN orders ON l_orderkey = o_orderkey)
                 GROUP BY l_orderkey))
             SELECT 'order_determines_shipdate' AS check_name,
               n_li.n AS n_rows, f1.v AS n_violations FROM n_li, f1
             UNION ALL SELECT 'part_determines_supplier', n_li.n, f2.v
               FROM n_li, f2
             UNION ALL SELECT 'order_determines_customer', n_j.n, f3.v
               FROM n_j, f3
             ORDER BY check_name""")),

    // ---- CDF / percentile-rank lookup off the q119 histogram artifact
    // (Sketches.histPercentileRank — the INVERSE of q119's quantile
    // walk): score-normalize a probe set against the corpus price
    // distribution with an O(buckets) broadcast join, no corpus sort.
    // Exact integer cum/total ratios mirror bucket-for-bucket.
    Q("q136_percentile_rank",
      (s, d) => {
        import graft.operators.Sketches
        val cents = T.lineitem(s, d).select(
          round(col("l_extendedprice") * 100).cast("long").as("v"))
        val probes = T.lineitem(s, d)
          .filter(col("l_orderkey") < 10)
          .select(round(col("l_extendedprice") * 100).cast("long")
            .as("pv"))
        Sketches.histPercentileRank(Sketches.histBuild(cents, "v"),
          probes, "pv").orderBy(col("v"))
      },
      Some("""WITH v0 AS (
               SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
               FROM lineitem),
             b AS (
               SELECT CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx
               FROM v0),
             h AS (SELECT idx, count(*) AS cnt FROM b GROUP BY idx),
             c AS (
               SELECT idx,
                 CAST(sum(cnt) OVER (ORDER BY idx) AS BIGINT) AS cum
               FROM h),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v0),
             probes AS (
               SELECT DISTINCT
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS v
               FROM lineitem WHERE l_orderkey < 10),
             pi AS (
               SELECT v, CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS pidx
               FROM probes)
             SELECT pi.v,
               round(coalesce((SELECT max(cum) FROM c
                 WHERE c.idx <= pi.pidx), 0) / tot.n, 6) AS pct_rank
             FROM pi CROSS JOIN tot ORDER BY pi.v""")),

    // ---- SCD Type 2 version history (Changelog.scd2History/scd2Merge):
    // q114 keeps only the LATEST state; a warehouse dimension keeps every
    // version with its validity interval. 'error' events are the
    // tombstones — they emit no version but close the previous one. The
    // QUERY runs the incremental path (history at a mid-month cutoff,
    // then scd2Merge folds the rest) while the ORACLE builds the whole
    // history in one lead-window pass — the cross-engine hash is itself
    // the proof that merge ≡ rebuild (the q114 discipline, pointed at
    // versioned history instead of latest-wins).
    Q("q137_scd2_history",
      (s, d) => {
        val log = T.events(s, d)
          .filter(pmod(col("user_id"), lit(50)) === 0)
          .select(col("user_id"), col("ts_ns"), col("event_id"),
            col("event_type"), col("value"))
        val cut = lit(1705363200000000000L) // 2024-01-16T00:00Z as ns
        val hist = graft.operators.Changelog.scd2History(
          log.filter(col("ts_ns") < cut),
          Seq("user_id"), Seq("ts_ns", "event_id"), "event_type", "error")
        graft.operators.Changelog.scd2Merge(
          hist, log.filter(col("ts_ns") >= cut),
          Seq("user_id"), Seq("ts_ns", "event_id"), "event_type", "error")
          .select(col("user_id"), col("version"), col("event_type"),
            round(col("value"), 6).as("value"),
            col("ts_ns").as("valid_from_ns"),
            col("valid_to_ts_ns").as("valid_to_ns"),
            col("is_current"))
          .orderBy(col("user_id"), col("version"))
      },
      Some("""WITH log AS (
               SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
                 event_type, value
               FROM events WHERE user_id % 50 = 0),
             w AS (
               SELECT *, lead(ts_ns) OVER (PARTITION BY user_id
                 ORDER BY ts_ns, event_id) AS valid_to_ns
               FROM log),
             f AS (
               SELECT *, CAST(row_number() OVER (PARTITION BY user_id
                 ORDER BY ts_ns, event_id) AS INT) AS version
               FROM w WHERE event_type <> 'error')
             SELECT user_id, version, event_type,
               round(value, 6) AS value, ts_ns AS valid_from_ns,
               valid_to_ns,
               CASE WHEN valid_to_ns IS NULL THEN 1 ELSE 0 END
                 AS is_current
             FROM f ORDER BY user_id, version""")),

    // ---- Exponentially-decayed trending totals (Decay.decayedTotals):
    // per event_type, activity weighted 2^-(age in days) at a fixed
    // reference instant — the recency-ranked "hot right now" signal next
    // to q25's raw per-day buckets. Whole-period bucketing + integer
    // micro round-half-up makes every 2^-p term a pure BIGINT expression
    // both engines compute bit-identically (no float pow anywhere), and
    // makes the (key, period) partial table a mergeable, vacuumable,
    // re-ageable artifact (Decay scaladoc).
    Q("q139_decayed_trends",
      (s, d) => graft.operators.Decay.decayedTotals(
          T.events(s, d), Seq("event_type"), "ts_ns", "value",
          refTsNs = 1706745600000000000L, // 2024-02-01T00:00Z
          periodNs = 86400000000000L)     // 1-day half-life
        .orderBy(col("event_type")),
      Some("""WITH e AS (
               SELECT event_type,
                 greatest(CAST(0 AS BIGINT), least(CAST(62 AS BIGINT),
                   (1706745600000000000 - epoch_ns(ts))
                     // 86400000000000)) AS p,
                 CAST(round(value * 1000000) AS BIGINT) AS v
               FROM events),
             b AS (
               SELECT event_type, p, count(*) AS cnt,
                 CAST(sum(v) AS BIGINT) AS sv
               FROM e GROUP BY event_type, p)
             SELECT event_type,
               CAST(sum(cnt * ((1000000 + (1 << p) // 2) // (1 << p)))
                 AS BIGINT) AS decayed_count_u,
               CAST(sum((sv + (1 << p) // 2) // (1 << p)) AS BIGINT)
                 AS decayed_value_u,
               CAST(sum(cnt) AS BIGINT) AS n_rows
             FROM b GROUP BY event_type ORDER BY event_type""")),

    // ---- Two-sample KS drift per language off the q125 grouped
    // histogram artifact (Sketches.histKsGrouped): sup |F_lang − F_all|
    // over doc-length CDFs — the distribution-shape drift monitor next
    // to q116's token-mass JS divergence. Exact for the bucketed
    // distributions (the sup of two step CDFs is attained on the pooled
    // idx grid), O(langs · buckets) off the artifact, integer
    // cross-multiplied comparisons with one rounded division per lang.
    Q("q140_ks_drift",
      (s, d) => {
        val v = T.documents(s, d).select(col("lang"),
          col("n_chars").cast("long").as("v"))
        graft.operators.Sketches.histKsGrouped(
          graft.operators.Sketches.histBuildGrouped(v, "v", Seq("lang")),
          Seq("lang")).orderBy(col("lang"))
      },
      Some("""WITH v AS (
               SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents),
             gh AS (
               SELECT lang, CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx,
                 count(*) AS cnt
               FROM v GROUP BY 1, 2),
             ac AS (
               SELECT idx,
                 CAST(sum(sum(cnt)) OVER (ORDER BY idx) AS BIGINT)
                   AS cum_all
               FROM gh GROUP BY idx),
             na AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM gh),
             gs AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_g
                    FROM gh GROUP BY lang),
             gc AS (
               SELECT gs.lang, gs.n_g, ac.idx, ac.cum_all,
                 CAST(sum(coalesce(gh.cnt, 0)) OVER (
                   PARTITION BY gs.lang ORDER BY ac.idx) AS BIGINT)
                   AS cum_g
               FROM gs CROSS JOIN ac
               LEFT JOIN gh ON gh.lang = gs.lang AND gh.idx = ac.idx)
             SELECT lang, n_g,
               round(max(abs(cum_g * n_all - cum_all * n_g))
                 / (n_g * n_all), 6) AS ks
             FROM gc CROSS JOIN na
             GROUP BY lang, n_g, n_all ORDER BY lang""")),

    // ---- Grouped OLS trend lines (Regression.olsGrouped): price-per-
    // quantity slope and intercept per (returnflag, linestatus) from
    // exact integer moments — the regression face of q88's moment
    // discipline. The exact BIGINT numerator/denominator pair is part
    // of the output, so the hash covers the algebra, not just rounded
    // floats; y is whole dollars to keep n·Σxy inside 2⁶³ (headroom
    // arithmetic in the scaladoc).
    Q("q141_grouped_ols",
      (s, d) => graft.operators.Regression.olsGrouped(
          T.lineitem(s, d).select(col("l_returnflag"),
            col("l_linestatus"), col("l_quantity").cast("long").as("x"),
            round(col("l_extendedprice")).cast("long").as("y")),
          Seq("l_returnflag", "l_linestatus"), "x", "y")
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""WITH v AS (
               SELECT l_returnflag, l_linestatus,
                 CAST(l_quantity AS BIGINT) AS x,
                 CAST(round(l_extendedprice) AS BIGINT) AS y
               FROM lineitem),
             m AS (
               SELECT l_returnflag, l_linestatus,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy
               FROM v GROUP BY l_returnflag, l_linestatus)
             SELECT l_returnflag, l_linestatus, n,
               n * sxy - sx * sy AS slope_num,
               n * sxx - sx * sx AS slope_den,
               CASE WHEN n * sxx - sx * sx > 0
                 THEN round((n * sxy - sx * sy)
                   / (n * sxx - sx * sx), 6) END AS slope,
               CASE WHEN n * sxx - sx * sx > 0
                 THEN round(sy / n - ((n * sxy - sx * sy)
                     / (n * sxx - sx * sx)) * (sx / n), 6)
                 END AS intercept
             FROM m ORDER BY l_returnflag, l_linestatus""")),

    // ---- Rolling 24 h distinct active users per hourly window start
    // (Intervals.rollingDistinctActives): the sliding-distinct metric a
    // per-bucket groupBy (q25) cannot express — partial distinct counts
    // don't merge. Spark answers it exactly WITHOUT a per-position
    // distinct via per-user gaps-and-islands coverage intervals; the
    // oracle is the definitional count(DISTINCT) over a start×activity
    // range join — the hash proves the interval algebra.
    Q("q142_rolling_actives",
      (s, d) => graft.operators.Intervals.rollingDistinctActives(
          T.events(s, d).select(col("user_id"),
            expr("ts_ns div 3600000000000").as("h")),
          "user_id", "h", window = 24)
        .orderBy(col("window_start")),
      Some("""WITH uh AS (
               SELECT DISTINCT user_id,
                 epoch_ns(ts) // 3600000000000 AS h
               FROM events),
             starts AS (
               SELECT DISTINCT h - off AS s
               FROM uh CROSS JOIN (
                 SELECT unnest(generate_series(0, 23)) AS off))
             SELECT s AS window_start,
               count(DISTINCT user_id) AS n_active
             FROM starts JOIN uh ON uh.h BETWEEN s AND s + 23
             GROUP BY s ORDER BY s""")),

    // ---- Keyed snapshot diff (TableDiff.rowDiff): the per-user current
    // STATE (q114 latest-wins, tombstones dropped, payload = current
    // event_type) at Jan 16 vs the full month — which users appeared,
    // disappeared (tombstone-latest), or changed state. Spark ships only
    // 16-byte md5 fingerprints through the full-outer join; the oracle
    // computes the same statuses definitionally (IS DISTINCT FROM on the
    // payload), so the hash proves the fingerprint semantics.
    Q("q143_snapshot_diff",
      (s, d) => {
        val log = T.events(s, d).select(
          col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
        val cut = lit(1705363200000000000L) // 2024-01-16T00:00Z as ns
        def snap(l: org.apache.spark.sql.DataFrame) =
          graft.operators.Changelog.latestState(l,
              Seq("user_id"), Seq("ts_ns", "event_id"), "event_type",
              "error")
            .select(col("user_id"), col("event_type"))
        graft.operators.TableDiff.rowDiff(
            snap(log.filter(col("ts_ns") < cut)), snap(log),
            Seq("user_id"))
          .orderBy(col("user_id"))
      },
      Some("""WITH log AS (
               SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type
               FROM events),
             sa AS (
               SELECT user_id, event_type FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts_ns DESC, event_id DESC) AS rn
                 FROM log WHERE ts_ns < 1705363200000000000)
               WHERE rn = 1 AND event_type <> 'error'),
             sb AS (
               SELECT user_id, event_type FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts_ns DESC, event_id DESC) AS rn
                 FROM log)
               WHERE rn = 1 AND event_type <> 'error')
             SELECT coalesce(sa.user_id, sb.user_id) AS user_id,
               CASE WHEN sa.user_id IS NULL THEN 'added'
                 WHEN sb.user_id IS NULL THEN 'removed'
                 WHEN sa.event_type IS DISTINCT FROM sb.event_type
                   THEN 'changed'
                 ELSE 'unchanged' END AS status
             FROM sa FULL OUTER JOIN sb ON sa.user_id = sb.user_id
             ORDER BY user_id""")),

    // ---- Scale-correct global sequence assignment
    // (ScaleOps.globalRowNumbers): corpus-wide positions in
    // (l_orderkey, l_linenumber) order via range partitions + O(P)
    // prefix offsets — the distributed zipWithIndex, where the ORACLE's
    // row_number() OVER (ORDER BY …) is precisely the single-partition
    // plan this operator exists to avoid. The per-flag rollup
    // (n/min/max/sum of assigned numbers) makes any numbering slip
    // shift a hashed aggregate.
    Q("q144_global_rownum",
      (s, d) => graft.operators.ScaleOps.globalRowNumbers(
          T.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag")),
          Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          min(col("row_num")).as("first_pos"),
          max(col("row_num")).as("last_pos"),
          sum(col("row_num")).as("pos_sum"))
        .orderBy(col("l_returnflag")),
      Some("""WITH numbered AS (
               SELECT l_returnflag,
                 row_number() OVER (ORDER BY l_orderkey, l_linenumber)
                   AS row_num
               FROM lineitem)
             SELECT l_returnflag, count(*) AS n,
               CAST(min(row_num) AS BIGINT) AS first_pos,
               CAST(max(row_num) AS BIGINT) AS last_pos,
               CAST(sum(row_num) AS BIGINT) AS pos_sum
             FROM numbered GROUP BY l_returnflag
             ORDER BY l_returnflag""")),

    // ---- Field-level survivorship golden record
    // (Survivorship.goldenRecord): three synthetic source views of the
    // customer entity with complementary blind spots — billing (pri 3)
    // has balances but no names, crm (pri 2) has names but drops every
    // third segment, legacy (pri 1) has everything but stale-cased —
    // merged so each FIELD independently falls back down the priority
    // chain. One max(struct) agg per field in a single groupBy; the
    // oracle mirrors with one per-field window, so the hash proves the
    // per-field fallback semantics (not just row-level latest-wins).
    Q("q146_golden_record",
      (s, d) => {
        val c = T.customer(s, d)
        val crm = c.select(col("c_custkey").as("k"), lit(2).as("pri"),
          col("c_name").as("name"),
          when(pmod(col("c_custkey"), lit(3)) === 0, lit(null))
            .otherwise(col("c_mktsegment")).as("segment"),
          lit(null).cast("long").as("balance_cents"))
        val billing = c.filter(pmod(col("c_custkey"), lit(2)) === 0)
          .select(col("c_custkey").as("k"), lit(3).as("pri"),
            lit(null).cast("string").as("name"),
            lit(null).cast("string").as("segment"),
            round(col("c_acctbal") * 100).cast("long").as("balance_cents"))
        val legacy = c.select(col("c_custkey").as("k"), lit(1).as("pri"),
          upper(col("c_name")).as("name"),
          concat(lit("L-"), col("c_mktsegment")).as("segment"),
          lit(0L).as("balance_cents"))
        graft.operators.Survivorship.goldenRecord(
            crm.unionByName(billing).unionByName(legacy),
            Seq("k"), Seq("pri"), Seq("name", "segment", "balance_cents"),
            withProvenance = true)
          .orderBy(col("k"))
      },
      Some("""WITH crm AS (
               SELECT c_custkey AS k, 2 AS pri, c_name AS name,
                 CASE WHEN c_custkey % 3 = 0 THEN NULL
                   ELSE c_mktsegment END AS segment,
                 CAST(NULL AS BIGINT) AS balance_cents
               FROM customer),
             billing AS (
               SELECT c_custkey AS k, 3 AS pri,
                 CAST(NULL AS VARCHAR) AS name,
                 CAST(NULL AS VARCHAR) AS segment,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS balance_cents
               FROM customer WHERE c_custkey % 2 = 0),
             legacy AS (
               SELECT c_custkey AS k, 1 AS pri, upper(c_name) AS name,
                 'L-' || c_mktsegment AS segment,
                 CAST(0 AS BIGINT) AS balance_cents
               FROM customer),
             src AS (SELECT * FROM crm UNION ALL
                     SELECT * FROM billing UNION ALL
                     SELECT * FROM legacy),
             keys AS (SELECT k, CAST(count(*) AS BIGINT) AS n_source_rows
                      FROM src GROUP BY k),
             fname AS (
               SELECT k, name, pri FROM (
                 SELECT k, name, pri, row_number() OVER (
                   PARTITION BY k ORDER BY pri DESC) AS rn
                 FROM src WHERE name IS NOT NULL) WHERE rn = 1),
             fseg AS (
               SELECT k, segment, pri FROM (
                 SELECT k, segment, pri, row_number() OVER (
                   PARTITION BY k ORDER BY pri DESC) AS rn
                 FROM src WHERE segment IS NOT NULL) WHERE rn = 1),
             fbal AS (
               SELECT k, balance_cents, pri FROM (
                 SELECT k, balance_cents, pri, row_number() OVER (
                   PARTITION BY k ORDER BY pri DESC) AS rn
                 FROM src WHERE balance_cents IS NOT NULL) WHERE rn = 1)
             SELECT keys.k, fname.name, fseg.segment, fbal.balance_cents,
               fname.pri AS name_rank1, fseg.pri AS segment_rank1,
               fbal.pri AS balance_cents_rank1, keys.n_source_rows
             FROM keys
             LEFT JOIN fname ON keys.k = fname.k
             LEFT JOIN fseg ON keys.k = fseg.k
             LEFT JOIN fbal ON keys.k = fbal.k
             ORDER BY keys.k""")),

    // ---- Time-weighted average (the state-metric integral): each
    // event's value holds until the user's next event, so the mean is
    // Σ vᵢ·Δtᵢ / ΣΔtᵢ — NOT the row mean, which over-weights bursts.
    // One lead window + one agg; milli-value × milli-second integer
    // products keep every term exact and under 2⁶³ (per-user sums; the
    // q147 choice of units is the headroom arithmetic), and the final
    // division is integer floor both engines share. Single-event users
    // have zero span → NULL (integer guard, q141 discipline).
    Q("q147_time_weighted_avg",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
        T.events(s, d)
          .withColumn("next_ts", lead(col("ts_ns"), 1).over(w))
          .withColumn("dur_ms",
            expr("(next_ts - ts_ns) div 1000000"))
          .withColumn("v_milli",
            expr("CAST(round(value * 1000) AS BIGINT)"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("dur_ms")).as("span_ms"),
            sum(col("v_milli") * col("dur_ms")).as("twa_num"))
          .select(col("user_id"), col("n_events"), col("span_ms"),
            col("twa_num"),
            when(col("span_ms") > 0,
              expr("twa_num div span_ms")).as("twa_milli"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
               SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
                 CAST(round(value * 1000) AS BIGINT) AS v_milli
               FROM events),
             d AS (
               SELECT user_id, v_milli,
                 (lead(ts_ns) OVER (PARTITION BY user_id
                    ORDER BY ts_ns, event_id) - ts_ns) // 1000000
                   AS dur_ms
               FROM e),
             a AS (
               SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(dur_ms) AS BIGINT) AS span_ms,
                 CAST(sum(v_milli * dur_ms) AS BIGINT) AS twa_num
               FROM d GROUP BY user_id)
             SELECT user_id, n_events, span_ms, twa_num,
               CASE WHEN span_ms > 0 THEN twa_num // span_ms END
                 AS twa_milli
             FROM a ORDER BY user_id""")),

    // ---- Temporal point-in-time enrichment (Changelog.temporalLookup):
    // each purchase tagged with the user's governing browse state
    // (latest click/view/signup at the purchase instant), where an
    // intervening 'error' tombstone correctly yields NULLs — deleted
    // state must not enrich. Union-tag + one per-key window: no range
    // join, no per-fact probe, ONE shuffle (the q57 as-of trick grown
    // tombstone semantics and whole-row versions).
    Q("q148_temporal_lookup",
      (s, d) => {
        val e = T.events(s, d)
        val log = e.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts_ns"), col("event_id"),
            col("event_id").as("src_event_id"), col("event_type"),
            expr("CAST(round(value * 1000) AS BIGINT)").as("v_milli"))
        val facts = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ns"), col("event_id"))
        graft.operators.Changelog.temporalLookup(log, facts,
            Seq("user_id"), Seq("ts_ns", "event_id"), "event_type",
            "error")
          .orderBy(col("user_id"), col("ts_ns"), col("event_id"))
      },
      Some("""WITH e AS (
               SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
                 event_type,
                 CAST(round(value * 1000) AS BIGINT) AS v_milli
               FROM events),
             u AS (
               SELECT user_id, ts_ns, event_id,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS tag,
                 event_type, v_milli
               FROM e),
             w AS (
               SELECT *,
                 last_value(CASE WHEN tag = 0 THEN event_type END
                   IGNORE NULLS) OVER pk AS cur_type,
                 last_value(CASE WHEN tag = 0 THEN event_id END
                   IGNORE NULLS) OVER pk AS cur_event_id,
                 last_value(CASE WHEN tag = 0 THEN v_milli END
                   IGNORE NULLS) OVER pk AS cur_v_milli
               FROM u
               WINDOW pk AS (PARTITION BY user_id
                 ORDER BY ts_ns, event_id, tag
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             SELECT user_id, ts_ns, event_id,
               CASE WHEN cur_type <> 'error' THEN cur_event_id END
                 AS dim_src_event_id,
               CASE WHEN cur_type <> 'error' THEN cur_v_milli END
                 AS dim_v_milli
             FROM w WHERE tag = 1
             ORDER BY user_id, ts_ns, event_id""")),

    // ---- Mass-weighted quantiles off the histogram artifact
    // (Sketches.histBuildWeighted + the unchanged q119 walk): doc-length
    // percentiles BY TOKEN MASS — "half the corpus's TOKENS live in docs
    // shorter than est", the budget/packing question a row-count
    // histogram answers wrong (long docs carry most of the mass). Same
    // integer bucket arithmetic, cnt is just Σ weight.
    Q("q149_weighted_quantiles",
      (s, d) => {
        val v = T.documents(s, d).select(
          col("n_chars").cast("long").as("v"),
          expr("size(filter(split(text, ' '), t -> t != ''))")
            .cast("long").as("w"))
        graft.operators.Sketches.histQuantiles(
          graft.operators.Sketches.histBuildWeighted(v, "v", "w"),
          Seq(25, 50, 90, 99)).orderBy(col("pct"))
      },
      Some("""WITH v AS (
               SELECT CAST(n_chars AS BIGINT) AS v,
                 CAST(len(list_filter(string_split(text, ' '),
                   t -> t <> '')) AS BIGINT) AS w
               FROM documents),
             b AS (
               SELECT CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx, w
               FROM v),
             h AS (SELECT idx, CAST(sum(w) AS BIGINT) AS cnt
                   FROM b GROUP BY idx),
             c AS (
               SELECT idx,
                 CAST(sum(cnt) OVER (ORDER BY idx) AS BIGINT) AS cum
               FROM h),
             tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
             p AS (SELECT CAST(unnest([25, 50, 90, 99]) AS INT) AS pct),
             sel AS (
               SELECT p.pct, min(c.idx) AS idx
               FROM p JOIN c ON c.cum >=
                 (CAST(p.pct AS BIGINT) * (SELECT n FROM tot) + 99) // 100
               GROUP BY p.pct)
             SELECT pct,
               CAST(CASE WHEN idx <= 15 THEN idx
                 ELSE (((CAST(8 + (idx - 16) % 8 AS BIGINT)
                          << (1 + (idx - 16) // 8)) +
                        (CAST(9 + (idx - 16) % 8 AS BIGINT)
                          << (1 + (idx - 16) // 8)) - 1) >> 1)
                 END AS BIGINT) AS est
             FROM sel ORDER BY pct""")),

    // ---- Last-touch revenue attribution: each purchase credits its
    // value to the campaign (`props.k`) of the user's most recent click
    // within a 24 h lookback — q57's as-of window grown an attribution
    // WINDOW (stale clicks attribute to campaign NULL = organic) and a
    // campaign rollup. One user shuffle + one tiny rollup; revenue in
    // exact milli units.
    Q("q150_attribution",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        T.events(s, d)
          .withColumn("click_at",
            last(when(col("event_type") === "click",
              struct(col("ts_ns"),
                get_json_object(col("props"), "$.k").cast("long")
                  .as("campaign"))), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .withColumn("campaign",
            when(col("click_at").isNotNull &&
              col("ts_ns") - col("click_at.ts_ns") <= 86400000000000L,
              col("click_at.campaign")))
          .groupBy(col("campaign"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(expr("CAST(round(value * 1000) AS BIGINT)"))
              .as("revenue_milli"))
          .orderBy(col("campaign").asc_nulls_first)
      },
      Some("""WITH e AS (
               SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
                 event_type,
                 CAST(round(value * 1000) AS BIGINT) AS v_milli,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events),
             w AS (
               SELECT *,
                 last_value(CASE WHEN event_type = 'click' THEN ts_ns END
                   IGNORE NULLS) OVER pk AS click_ts,
                 last_value(CASE WHEN event_type = 'click' THEN k END
                   IGNORE NULLS) OVER pk AS click_k
               FROM e
               WINDOW pk AS (PARTITION BY user_id
                 ORDER BY ts_ns, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             p AS (
               SELECT CASE WHEN click_ts IS NOT NULL
                   AND ts_ns - click_ts <= 86400000000000
                   THEN click_k END AS campaign,
                 v_milli
               FROM w WHERE event_type = 'purchase')
             SELECT campaign, CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(v_milli) AS BIGINT) AS revenue_milli
             FROM p GROUP BY campaign
             ORDER BY campaign NULLS FIRST""")),

    // ---- RFM customer scoring: recency / frequency / monetary per
    // purchasing user, each dimension cut into quintiles (ntile) and
    // composed into the classic 3-digit segment code. One purchase
    // rollup + three windows over the O(users) AGGREGATE — they sort
    // the user dimension, never events; when even the user table is
    // cluster-scale, the exact ntile cut gives way to score-normalizing
    // each dimension off its histogram artifact (q136's
    // histPercentileRank — same 1..5 bucketing, O(buckets) per user,
    // no global sort). Monetary exact milli; recency exact ns against
    // a pinned reference instant.
    Q("q151_rfm_scores",
      (s, d) => {
        val ref = lit(1706745600000000000L) // 2024-02-01T00:00Z
        val base = T.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(max(col("ts_ns")).as("last_ts"),
            count(lit(1)).as("frequency"),
            sum(expr("CAST(round(value * 1000) AS BIGINT)"))
              .as("monetary_milli"))
          .withColumn("recency_ns", ref - col("last_ts"))
        def quintile(c: String, asc: Boolean) = ntile(5).over(
          Window.orderBy(
            (if (asc) col(c).asc else col(c).desc), col("user_id")))
        base
          .withColumn("r_score", quintile("recency_ns", asc = true))
          .withColumn("f_score", quintile("frequency", asc = false))
          .withColumn("m_score", quintile("monetary_milli", asc = false))
          .select(col("user_id"), col("recency_ns"), col("frequency"),
            col("monetary_milli"), col("r_score"), col("f_score"),
            col("m_score"),
            (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
              .as("rfm"))
          .orderBy(col("user_id"))
      },
      Some("""WITH p AS (
               SELECT user_id,
                 max(epoch_ns(ts)) AS last_ts,
                 CAST(count(*) AS BIGINT) AS frequency,
                 CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                   AS monetary_milli
               FROM events WHERE event_type = 'purchase'
               GROUP BY user_id),
             sc AS (
               SELECT user_id,
                 1706745600000000000 - last_ts AS recency_ns,
                 frequency, monetary_milli,
                 CAST(ntile(5) OVER (ORDER BY
                   1706745600000000000 - last_ts ASC, user_id) AS INT)
                   AS r_score,
                 CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
                   AS INT) AS f_score,
                 CAST(ntile(5) OVER (ORDER BY monetary_milli DESC,
                   user_id) AS INT) AS m_score
               FROM p)
             SELECT user_id, recency_ns, frequency, monetary_milli,
               r_score, f_score, m_score,
               r_score * 100 + f_score * 10 + m_score AS rfm
             FROM sc ORDER BY user_id""")),

    // ---- Association rules over order baskets (market-basket lift):
    // directed rules a→b with support/confidence/lift, minSup pruned
    // BEFORE the per-item join-backs (the q105 PMI discipline aimed at
    // rule mining). Confidence/lift derive from exact integer supports;
    // the ratios are rounded once for output and the top-20 ordering
    // ties break on the exact pair keys.
    Q("q152_association_rules",
      (s, d) => {
        val li = T.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val nOrders = li.select(col("ok")).distinct()
          .agg(count(lit(1)).as("n_orders"))
        val itemSup = li.groupBy(col("pk")).agg(count(lit(1)).as("sup"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") =!= col("y.pk"))
          .select(col("x.pk").as("a"), col("y.pk").as("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("sup_ab"))
          .filter(col("sup_ab") >= 2)
        pairs
          .join(broadcast(itemSup.select(col("pk").as("a"),
            col("sup").as("sup_a"))), "a")
          .join(broadcast(itemSup.select(col("pk").as("b"),
            col("sup").as("sup_b"))), "b")
          .crossJoin(broadcast(nOrders))
          .select(col("a"), col("b"), col("sup_ab"), col("sup_a"),
            col("sup_b"),
            round(col("sup_ab") / col("sup_a"), 6).as("confidence"),
            round((col("sup_ab") * col("n_orders")) /
              (col("sup_a") * col("sup_b")), 6).as("lift"))
          .orderBy(col("lift").desc, col("a"), col("b"))
          .limit(20)
      },
      Some("""WITH li AS (
               SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
               FROM lineitem),
             n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders
                   FROM li),
             isup AS (SELECT pk, CAST(count(*) AS BIGINT) AS sup
                      FROM li GROUP BY pk),
             pairs AS (
               SELECT x.pk AS a, y.pk AS b,
                 CAST(count(*) AS BIGINT) AS sup_ab
               FROM li x JOIN li y ON x.ok = y.ok AND x.pk <> y.pk
               GROUP BY x.pk, y.pk HAVING count(*) >= 2)
             SELECT a, b, sup_ab, sa.sup AS sup_a, sb.sup AS sup_b,
               round(sup_ab / sa.sup, 6) AS confidence,
               round((sup_ab * n.n_orders) / (sa.sup * sb.sup), 6)
                 AS lift
             FROM pairs
             JOIN isup sa ON pairs.a = sa.pk
             JOIN isup sb ON pairs.b = sb.pk
             CROSS JOIN n
             ORDER BY lift DESC, a, b LIMIT 20""")),

    // ---- Dense gap-filled time series with linear interpolation: the
    // hourly per-type series as a DOWNSTREAM CONSUMER expects it —
    // every hour present (sequence-explode grid off a 1-row min/max
    // agg, zero-filled counts) and the sparse hourly mean linearly
    // interpolated across observation gaps (carry prev/next via
    // last/first ignoreNulls frames — two windows per type over the
    // O(types·hours) GRID, never the events). Interpolation runs in
    // double from exact integer inputs, rounded once; boundary hours
    // (before first / after last observation) stay NULL.
    Q("q153_gap_fill",
      (s, d) => {
        val e = T.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000").as("h"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("v"))
        val span = e.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        val grid = e.select(col("event_type")).distinct()
          .crossJoin(broadcast(span))
          .select(col("event_type"),
            explode(sequence(col("h0"), col("h1"))).as("h"))
        val obs = e.groupBy(col("event_type"), col("h"))
          .agg(count(lit(1)).as("n_events"),
            expr("sum(v) div count(1)").as("v_avg"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
        val wNext = w.rowsBetween(0, Window.unboundedFollowing)
        grid.join(obs, Seq("event_type", "h"), "left")
          .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
          .withColumn("pv", last(col("v_avg"), ignoreNulls = true).over(wPrev))
          .withColumn("ph", last(when(col("v_avg").isNotNull, col("h")),
            ignoreNulls = true).over(wPrev))
          .withColumn("nv", first(col("v_avg"), ignoreNulls = true).over(wNext))
          .withColumn("nh", first(when(col("v_avg").isNotNull, col("h")),
            ignoreNulls = true).over(wNext))
          .withColumn("v_interp",
            when(col("v_avg").isNotNull, col("v_avg").cast("double"))
              .otherwise(when(col("pv").isNotNull && col("nv").isNotNull,
                round(col("pv") + (col("nv") - col("pv")) *
                  (col("h") - col("ph")) / (col("nh") - col("ph")), 6))))
          .select(col("event_type"), col("h"), col("n_events"),
            col("v_avg"), col("v_interp"))
          .orderBy(col("event_type"), col("h"))
      },
      Some("""WITH e AS (
               SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
                 CAST(round(value * 1000) AS BIGINT) AS v
               FROM events),
             span AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
             grid AS (
               SELECT t.event_type, g.h
               FROM (SELECT DISTINCT event_type FROM e) t
               CROSS JOIN (SELECT unnest(generate_series(
                 (SELECT h0 FROM span), (SELECT h1 FROM span))) AS h) g),
             obs AS (
               SELECT event_type, h, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(v) // count(*) AS BIGINT) AS v_avg
               FROM e GROUP BY event_type, h),
             j AS (
               SELECT grid.event_type, grid.h,
                 coalesce(obs.n_events, 0) AS n_events, obs.v_avg
               FROM grid LEFT JOIN obs
                 ON grid.event_type = obs.event_type AND grid.h = obs.h),
             x AS (
               SELECT *,
                 last_value(v_avg IGNORE NULLS) OVER wp AS pv,
                 last_value(CASE WHEN v_avg IS NOT NULL THEN h END
                   IGNORE NULLS) OVER wp AS ph,
                 first_value(v_avg IGNORE NULLS) OVER wn AS nv,
                 first_value(CASE WHEN v_avg IS NOT NULL THEN h END
                   IGNORE NULLS) OVER wn AS nh
               FROM j
               WINDOW wp AS (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             SELECT event_type, h, n_events, v_avg,
               CASE WHEN v_avg IS NOT NULL THEN CAST(v_avg AS DOUBLE)
                 WHEN pv IS NOT NULL AND nv IS NOT NULL
                 THEN round(pv + (nv - pv) * (h - ph)
                   / CAST(nh - ph AS DOUBLE), 6) END AS v_interp
             FROM x ORDER BY event_type, h""")),

    // ---- PSI drift per language off the q125 grouped histogram
    // artifact (Sketches.histPsiGrouped): the model-monitoring
    // companion of q140's KS — KS reads the worst single CDF point, PSI
    // integrates mass displacement across every bucket (the 0.1/0.25
    // alarm thresholds assume this form). ε-floored proportions,
    // nano-quantized double terms from exact integer counts (q86/q116
    // recipe) so per-group sums are order-independent in both engines.
    Q("q154_psi_drift",
      (s, d) => {
        val v = T.documents(s, d).select(col("lang"),
          col("n_chars").cast("long").as("v"))
        graft.operators.Sketches.histPsiGrouped(
          graft.operators.Sketches.histBuildGrouped(v, "v", Seq("lang")),
          Seq("lang")).orderBy(col("lang"))
      },
      Some("""WITH v AS (
               SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents),
             gh AS (
               SELECT lang, CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx,
                 CAST(count(*) AS BIGINT) AS cnt
               FROM v GROUP BY 1, 2),
             allh AS (
               SELECT idx, CAST(sum(cnt) AS BIGINT) AS cnt_all
               FROM gh GROUP BY idx),
             na AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM gh),
             gs AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_g
                    FROM gh GROUP BY lang),
             terms AS (
               SELECT gs.lang, gs.n_g,
                 CAST(round((greatest(coalesce(gh.cnt, 0) / gs.n_g,
                     1e-6) - greatest(allh.cnt_all / na.n_all, 1e-6))
                   * ln(greatest(coalesce(gh.cnt, 0) / gs.n_g, 1e-6)
                     / greatest(allh.cnt_all / na.n_all, 1e-6))
                   * 1e9) AS BIGINT) AS term_nano
               FROM gs CROSS JOIN allh CROSS JOIN na
               LEFT JOIN gh ON gh.lang = gs.lang AND gh.idx = allh.idx)
             SELECT lang, n_g,
               round(CAST(sum(term_nano) AS BIGINT) / 1e9, 6) AS psi
             FROM terms GROUP BY lang, n_g ORDER BY lang""")),

    // ---- Benford first-digit audit (fraud/data-quality screen):
    // observed first-significant-digit counts of order totals vs the
    // Benford expectation n·log10(1+1/d), with per-digit chi-square
    // contributions. The digit extracts through the STRING cast of an
    // exact BIGINT (portable integer-only arithmetic — no float log10
    // in the bucketing); expectations/contributions are doubles from
    // exact integers, rounded once. The synthetic near-uniform totals
    // genuinely FAIL the screen (large chi², as a fraud auditor would
    // flag them) — which is the detection the query demonstrates.
    Q("q155_benford",
      (s, d) => {
        val digits = T.orders(s, d)
          .select(expr("CAST(round(o_totalprice) AS BIGINT)").as("x"))
          .filter(col("x") >= 1)
          .select(expr("CAST(substring(CAST(x AS STRING), 1, 1) AS INT)")
            .as("digit"))
        val n = digits.agg(count(lit(1)).as("n"))
        digits.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
          .crossJoin(broadcast(n))
          .withColumn("expected",
            round(col("n") * log10(lit(1.0) + lit(1.0) / col("digit")), 6))
          .withColumn("chi2_contrib",
            round(pow(col("n_obs") -
              col("n") * log10(lit(1.0) + lit(1.0) / col("digit")), 2) /
              (col("n") * log10(lit(1.0) + lit(1.0) / col("digit"))), 6))
          .select(col("digit"), col("n_obs"), col("expected"),
            col("chi2_contrib"))
          .orderBy(col("digit"))
      },
      Some("""WITH x AS (
               SELECT CAST(round(o_totalprice) AS BIGINT) AS x
               FROM orders
               WHERE CAST(round(o_totalprice) AS BIGINT) >= 1),
             dd AS (
               SELECT CAST(substring(CAST(x AS VARCHAR), 1, 1) AS INT)
                 AS digit
               FROM x),
             n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dd),
             o AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
                   FROM dd GROUP BY digit)
             SELECT digit, n_obs,
               round(n.n * log10(1.0 + 1.0 / digit), 6) AS expected,
               round(pow(n_obs - n.n * log10(1.0 + 1.0 / digit), 2)
                 / (n.n * log10(1.0 + 1.0 / digit)), 6) AS chi2_contrib
             FROM o CROSS JOIN n ORDER BY digit""")),

    // ---- Revenue concentration (Gini + Lorenz top-shares) over
    // per-customer purchase totals — "how unequal is the spend", the
    // budget-concentration twin of q149's token-mass question. The rank
    // comes from ScaleOps.globalRowNumbers (q144's distributed
    // zipWithIndex — NO single-partition window in the Spark plan,
    // while the ORACLE's row_number over a global sort is exactly that),
    // and Gini = (2·Σ rank·xᵢ)/(n·Σx) − (n+1)/n evaluates in double
    // from exact integer sums. Top-1%/10% shares are exact integer
    // ratios over the same ranks.
    Q("q159_gini_concentration",
      (s, d) => {
        val rev = T.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(expr("CAST(round(value * 1000) AS BIGINT)"))
            .as("rev_milli"))
        val ranked = graft.operators.ScaleOps.globalRowNumbers(
          rev, Seq("rev_milli", "user_id"))
        ranked
          .crossJoin(broadcast(ranked.agg(
            count(lit(1)).as("n"), sum(col("rev_milli")).as("total"))))
          .agg(
            first(col("n")).as("n_users"),
            first(col("total")).as("total_milli"),
            round(
              (lit(2.0) * sum(col("row_num") * col("rev_milli"))) /
                (first(col("n")) * first(col("total")))
                - (first(col("n")) + lit(1.0)) / first(col("n")), 6)
              .as("gini"),
            round(sum(when(col("row_num") > col("n") - greatest(lit(1L),
              expr("n div 100")), col("rev_milli")).otherwise(lit(0L))) /
              first(col("total")).cast("double"), 6).as("top1pct_share"),
            round(sum(when(col("row_num") > col("n") - greatest(lit(1L),
              expr("n div 10")), col("rev_milli")).otherwise(lit(0L))) /
              first(col("total")).cast("double"), 6).as("top10pct_share"))
      },
      Some("""WITH rev AS (
               SELECT user_id,
                 CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                   AS rev_milli
               FROM events WHERE event_type = 'purchase'
               GROUP BY user_id),
             rk AS (
               SELECT rev_milli,
                 CAST(row_number() OVER (ORDER BY rev_milli, user_id)
                   AS BIGINT) AS row_num
               FROM rev),
             agg AS (
               SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(rev_milli) AS BIGINT) AS total,
                 CAST(sum(row_num * rev_milli) AS BIGINT) AS wsum,
                 CAST(sum(CASE WHEN row_num > (SELECT count(*) FROM rk)
                     - greatest(1, (SELECT count(*) FROM rk) // 100)
                   THEN rev_milli ELSE 0 END) AS BIGINT) AS top1,
                 CAST(sum(CASE WHEN row_num > (SELECT count(*) FROM rk)
                     - greatest(1, (SELECT count(*) FROM rk) // 10)
                   THEN rev_milli ELSE 0 END) AS BIGINT) AS top10
               FROM rk)
             SELECT n AS n_users, total AS total_milli,
               round((2.0 * wsum) / (n * CAST(total AS DOUBLE))
                 - (n + 1.0) / n, 6) AS gini,
               round(top1 / CAST(total AS DOUBLE), 6) AS top1pct_share,
               round(top10 / CAST(total AS DOUBLE), 6) AS top10pct_share
             FROM agg""")),

    // ---- Join-skew pre-flight report: which keys would DOMINATE the
    // lineitem part-key self-join — per-key frequency f, its output
    // contribution f², and f²'s share of the total (the per-key detail
    // behind q124's aggregate CM bound, and the evidence that picks
    // between AQE skew-split and explicit salting). One map-side
    // combined count + a top-20; exact integers, one rounded ratio.
    Q("q160_join_skew",
      (s, d) => {
        val f = T.lineitem(s, d).groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("f"))
        f.crossJoin(broadcast(
            f.agg(sum(col("f") * col("f")).as("total_f2"))))
          .select(col("l_partkey"), col("f"),
            (col("f") * col("f")).as("f2"),
            round((col("f") * col("f")) / col("total_f2"), 6)
              .as("share"))
          .orderBy(col("f2").desc, col("l_partkey"))
          .limit(20)
      },
      Some("""WITH f AS (
               SELECT l_partkey, CAST(count(*) AS BIGINT) AS f
               FROM lineitem GROUP BY l_partkey),
             t AS (SELECT CAST(sum(f * f) AS BIGINT) AS total_f2 FROM f)
             SELECT l_partkey, f, f * f AS f2,
               round((f * f) / t.total_f2, 6) AS share
             FROM f CROSS JOIN t
             ORDER BY f2 DESC, l_partkey LIMIT 20""")),

    // ---- Robust scale per language: median + MAD (median absolute
    // deviation) of doc length, BOTH read off histogram artifacts — two
    // O(buckets) walks with one corpus re-pass for the deviations (join
    // against the broadcast per-lang medians). The robust-stats sibling
    // of q131's winsorized means: MAD survives the heavy tail that
    // wrecks a stddev, and the artifact path never sorts the corpus.
    Q("q162_mad_robust",
      (s, d) => {
        import graft.operators.Sketches
        val v = T.documents(s, d).select(col("lang"),
          col("n_chars").cast("long").as("v"))
        val med = Sketches.histQuantilesGrouped(
            Sketches.histBuildGrouped(v, "v", Seq("lang")),
            Seq("lang"), Seq(50))
          .select(col("lang"), col("est").as("med_est"))
        val dev = v.join(broadcast(med), "lang")
          .select(col("lang"), abs(col("v") - col("med_est")).as("v"))
        val mad = Sketches.histQuantilesGrouped(
            Sketches.histBuildGrouped(dev, "v", Seq("lang")),
            Seq("lang"), Seq(50))
          .select(col("lang"), col("est").as("mad_est"))
        med.join(mad, "lang").orderBy(col("lang"))
      },
      Some("""WITH v AS (
               SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents),
             b1 AS (
               SELECT lang, CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx
               FROM v),
             h1 AS (SELECT lang, idx, count(*) AS cnt
                    FROM b1 GROUP BY lang, idx),
             c1 AS (
               SELECT lang, idx,
                 CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY idx)
                   AS BIGINT) AS cum,
                 CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
               FROM h1),
             m1 AS (
               SELECT lang, min(idx) AS idx FROM c1
               WHERE cum >= (CAST(50 AS BIGINT) * n + 99) // 100
               GROUP BY lang),
             med AS (
               SELECT lang,
                 CAST(CASE WHEN idx <= 15 THEN idx
                   ELSE (((CAST(8 + (idx - 16) % 8 AS BIGINT)
                            << (1 + (idx - 16) // 8)) +
                          (CAST(9 + (idx - 16) % 8 AS BIGINT)
                            << (1 + (idx - 16) // 8)) - 1) >> 1)
                   END AS BIGINT) AS med_est
               FROM m1),
             dv AS (
               SELECT v.lang, abs(v.v - med.med_est) AS v
               FROM v JOIN med ON v.lang = med.lang),
             b2 AS (
               SELECT lang, CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx
               FROM dv),
             h2 AS (SELECT lang, idx, count(*) AS cnt
                    FROM b2 GROUP BY lang, idx),
             c2 AS (
               SELECT lang, idx,
                 CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY idx)
                   AS BIGINT) AS cum,
                 CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
               FROM h2),
             m2 AS (
               SELECT lang, min(idx) AS idx FROM c2
               WHERE cum >= (CAST(50 AS BIGINT) * n + 99) // 100
               GROUP BY lang),
             mad AS (
               SELECT lang,
                 CAST(CASE WHEN idx <= 15 THEN idx
                   ELSE (((CAST(8 + (idx - 16) % 8 AS BIGINT)
                            << (1 + (idx - 16) // 8)) +
                          (CAST(9 + (idx - 16) % 8 AS BIGINT)
                            << (1 + (idx - 16) // 8)) - 1) >> 1)
                   END AS BIGINT) AS mad_est
               FROM m2)
             SELECT med.lang, med.med_est, mad.mad_est
             FROM med JOIN mad ON med.lang = mad.lang
             ORDER BY med.lang""")),

    // ---- Day-of-week seasonality profile: per (event_type, weekday)
    // activity and mean value — the periodic-baseline table a drift
    // alarm (q111/q116) normalizes against. The weekday index is PURE
    // INTEGER arithmetic from the epoch day ((days+3) mod 7, 0=Monday):
    // engines disagree on dayofweek() conventions, integers don't.
    Q("q163_dow_profile",
      (s, d) => T.events(s, d)
        .select(col("event_type"),
          expr("pmod((ts_ns div 86400000000000) + 3, 7)").as("dow0"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("v"))
        .groupBy(col("event_type"), col("dow0"))
        .agg(count(lit(1)).as("n"),
          expr("sum(v) div count(1)").as("mean_milli"))
        .orderBy(col("event_type"), col("dow0")),
      Some("""SELECT event_type,
               ((epoch_ns(ts) // 86400000000000) + 3) % 7 AS dow0,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 1000) AS BIGINT)) // count(*)
                 AS BIGINT) AS mean_milli
             FROM events
             GROUP BY event_type, dow0
             ORDER BY event_type, dow0""")),

    // ---- Histogram snapshot diff (Sketches.histDiff): which buckets
    // of the order-value distribution gained/lost mass between the
    // first and second half of the month — the per-bucket DIRECTION
    // behind the q140/q154 drift scalars, computed purely on the two
    // artifacts (full outer over idx, exact signed integers, no corpus
    // re-read). Completes the artifact algebra: build/merge/weighted/
    // age/diff.
    Q("q165_hist_diff",
      (s, d) => {
        import graft.operators.Sketches
        val cut = lit(1705363200000000000L) // 2024-01-16T00:00Z
        def half(p: org.apache.spark.sql.Column) =
          Sketches.histBuild(T.events(s, d).filter(p)
            .select(expr("CAST(round(value * 1000) AS BIGINT)").as("v")),
            "v")
        Sketches.histDiff(half(col("ts_ns") < cut),
            half(col("ts_ns") >= cut))
          .orderBy(col("idx"))
      },
      Some("""WITH e AS (
               SELECT epoch_ns(ts) AS ts_ns,
                 CAST(round(value * 1000) AS BIGINT) AS v
               FROM events),
             ba AS (
               SELECT CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx,
                 CAST(count(*) AS BIGINT) AS cnt
               FROM e WHERE ts_ns < 1705363200000000000 GROUP BY idx),
             bb AS (
               SELECT CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx,
                 CAST(count(*) AS BIGINT) AS cnt
               FROM e WHERE ts_ns >= 1705363200000000000 GROUP BY idx)
             SELECT coalesce(ba.idx, bb.idx) AS idx,
               coalesce(ba.cnt, 0) AS cnt_a,
               coalesce(bb.cnt, 0) AS cnt_b,
               coalesce(bb.cnt, 0) - coalesce(ba.cnt, 0) AS delta
             FROM ba FULL OUTER JOIN bb ON ba.idx = bb.idx
             ORDER BY idx""")),

    // ---- Delivery-completeness audit (sequence-gap detection): per
    // user, holes in the event_id sequence they received — lag window,
    // exact integer gap arithmetic. Global event_ids interleave across
    // users, so per-user gaps are the norm; the audit shape is what
    // matters: n_gaps, missing-id mass, largest hole — the "did this
    // partition lose data" question asked per key.
    Q("q167_sequence_gaps",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        T.events(s, d)
          .select(col("user_id"), col("event_id"))
          .withColumn("prev", lag(col("event_id"), 1).over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("event_id") - col("prev") > 1, 1L)
              .otherwise(0L)).as("n_gaps"),
            sum(when(col("event_id") - col("prev") > 1,
              col("event_id") - col("prev") - 1).otherwise(0L))
              .as("n_missing"),
            max(coalesce(col("event_id") - col("prev") - 1, lit(0L)))
              .as("largest_gap"))
          .orderBy(col("user_id"))
      },
      Some("""WITH g AS (
               SELECT user_id, event_id,
                 lag(event_id) OVER (PARTITION BY user_id
                   ORDER BY event_id) AS prev
               FROM events)
             SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN event_id - prev > 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_gaps,
               CAST(sum(CASE WHEN event_id - prev > 1
                 THEN event_id - prev - 1 ELSE 0 END) AS BIGINT)
                 AS n_missing,
               CAST(max(coalesce(event_id - prev - 1, 0)) AS BIGINT)
                 AS largest_gap
             FROM g GROUP BY user_id ORDER BY user_id""")),

    // ---- Week-over-week deltas per event type (the BI
    // period-over-period table): weekly counts/value, previous-period
    // lag, absolute delta and rounded pct change — windows over the
    // O(types·weeks) AGGREGATE. Week index is pure integer epoch-day
    // arithmetic (the q163 discipline).
    Q("q168_wow_deltas",
      (s, d) => {
        val weekly = T.events(s, d)
          .select(col("event_type"),
            expr("(ts_ns div 86400000000000) div 7").as("wk"),
            expr("CAST(round(value * 1000) AS BIGINT)").as("v"))
          .groupBy(col("event_type"), col("wk"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("v_milli"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
        weekly
          .withColumn("prev_n", lag(col("n"), 1).over(w))
          .withColumn("delta_n", col("n") - col("prev_n"))
          .withColumn("pct_change",
            when(col("prev_n") > 0,
              round((col("n") - col("prev_n")) /
                col("prev_n").cast("double"), 6)))
          .orderBy(col("event_type"), col("wk"))
      },
      Some("""WITH weekly AS (
               SELECT event_type,
                 (epoch_ns(ts) // 86400000000000) // 7 AS wk,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(round(value * 1000) AS BIGINT))
                   AS BIGINT) AS v_milli
               FROM events GROUP BY event_type, wk)
             SELECT event_type, wk, n, v_milli,
               lag(n) OVER w AS prev_n,
               n - lag(n) OVER w AS delta_n,
               CASE WHEN lag(n) OVER w > 0
                 THEN round((n - lag(n) OVER w)
                   / CAST(lag(n) OVER w AS DOUBLE), 6) END AS pct_change
             FROM weekly
             WINDOW w AS (PARTITION BY event_type ORDER BY wk)
             ORDER BY event_type, wk""")),

    // ---- Conversion-latency distribution: signup→purchase delay per
    // user (first signup to first LATER purchase) bucketed through the
    // histogram artifact — the time-to-convert curve behind q100's
    // funnel counts, reading minutes-scale latency quantiles off
    // O(buckets). Latency in whole minutes keeps the artifact small
    // and the integers exact.
    Q("q169_latency_histogram",
      (s, d) => {
        import graft.operators.Sketches
        val e = T.events(s, d)
        val su = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("su_ts"))
        val pu = e.filter(col("event_type") === "purchase")
          .join(broadcast(su), "user_id")
          .filter(col("ts_ns") >= col("su_ts"))
          .groupBy(col("user_id"), col("su_ts"))
          .agg(min(col("ts_ns")).as("pu_ts"))
        val lat = pu.select(
          expr("(pu_ts - su_ts) div 60000000000").as("lat_min"))
        Sketches.histQuantiles(Sketches.histBuild(lat, "lat_min"),
          Seq(25, 50, 90, 99)).orderBy(col("pct"))
      },
      Some("""WITH su AS (
               SELECT user_id, min(epoch_ns(ts)) AS su_ts
               FROM events WHERE event_type = 'signup'
               GROUP BY user_id),
             pu AS (
               SELECT e.user_id, su.su_ts,
                 min(epoch_ns(e.ts)) AS pu_ts
               FROM events e JOIN su ON e.user_id = su.user_id
               WHERE e.event_type = 'purchase'
                 AND epoch_ns(e.ts) >= su.su_ts
               GROUP BY e.user_id, su.su_ts),
             lat AS (
               SELECT (pu_ts - su_ts) // 60000000000 AS v FROM pu),
             b AS (
               SELECT CASE WHEN v <= 15 THEN v
                 ELSE 16 + (length(bin(v)) - 5) * 8 +
                   ((v >> (length(bin(v)) - 4)) - 8) END AS idx
               FROM lat),
             h AS (SELECT idx, count(*) AS cnt FROM b GROUP BY idx),
             c AS (
               SELECT idx,
                 CAST(sum(cnt) OVER (ORDER BY idx) AS BIGINT) AS cum
               FROM h),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lat),
             p AS (SELECT CAST(unnest([25, 50, 90, 99]) AS INT) AS pct),
             sel AS (
               SELECT p.pct, min(c.idx) AS idx
               FROM p JOIN c ON c.cum >=
                 (CAST(p.pct AS BIGINT) * (SELECT n FROM tot) + 99) // 100
               GROUP BY p.pct)
             SELECT pct,
               CAST(CASE WHEN idx <= 15 THEN idx
                 ELSE (((CAST(8 + (idx - 16) % 8 AS BIGINT)
                          << (1 + (idx - 16) // 8)) +
                        (CAST(9 + (idx - 16) % 8 AS BIGINT)
                          << (1 + (idx - 16) // 8)) - 1) >> 1)
                 END AS BIGINT) AS est
             FROM sel ORDER BY pct""")),

    // ---- Largest-remainder proration (the finance/BI allocation
    // primitive): spread each order's total price, in EXACT integer
    // cents, across its lineitems proportional to quantity — floor
    // shares first, then hand the leftover cents to the largest
    // fractional remainders (ties to the lower line number), so every
    // order's allocations sum to its total TO THE CENT by construction.
    // All windows are per-order (narrow, co-partitioned after the one
    // join shuffle); nothing global. Sampled orders (key % 97) keep the
    // artifact small — the arithmetic is identical at any scale.
    Q("q171_proration",
      (s, d) => {
        val li = T.lineitem(s, d)
          .filter(col("l_orderkey") % 97 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("qty"))
        val o = T.orders(s, d).filter(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey").as("l_orderkey"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)")
              .as("total_cents"))
        val w = Window.partitionBy(col("l_orderkey"))
        li.join(o, "l_orderkey")
          .withColumn("sumq", sum(col("qty")).over(w))
          .withColumn("base", expr("(total_cents * qty) div sumq"))
          .withColumn("rem", expr("(total_cents * qty) % sumq"))
          .withColumn("deficit",
            col("total_cents") - sum(col("base")).over(w))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("l_orderkey"))
              .orderBy(col("rem").desc, col("l_linenumber"))))
          .select(col("l_orderkey"), col("l_linenumber"), col("qty"),
            (col("base") +
              when(col("rk") <= col("deficit"), 1L).otherwise(0L))
              .as("alloc_cents"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""WITH li AS (
               SELECT l_orderkey, l_linenumber,
                 CAST(l_quantity AS BIGINT) AS qty
               FROM lineitem WHERE l_orderkey % 97 = 0),
             o AS (
               SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
               FROM orders WHERE o_orderkey % 97 = 0),
             j AS (
               SELECT li.l_orderkey, li.l_linenumber, li.qty,
                 o.total_cents,
                 sum(li.qty) OVER (PARTITION BY li.l_orderkey) AS sumq
               FROM li JOIN o ON li.l_orderkey = o.o_orderkey),
             b AS (
               SELECT *, (total_cents * qty) // sumq AS base,
                 (total_cents * qty) % sumq AS rem
               FROM j),
             r AS (
               SELECT *,
                 total_cents - sum(base) OVER (PARTITION BY l_orderkey)
                   AS deficit,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY rem DESC, l_linenumber) AS rk
               FROM b)
             SELECT l_orderkey, l_linenumber, qty,
               CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
                 AS BIGINT) AS alloc_cents
             FROM r ORDER BY l_orderkey, l_linenumber""")),

    // ---- Lag-1 autocorrelation of the daily count series per event
    // type — the "is today predicted by yesterday" scalar behind the
    // q163 seasonality profile and the q111 changepoint alarm. Pairs are
    // CONSECUTIVE calendar days only (prev_day = day−1; rank-lag over a
    // gappy series would silently correlate across holes). Pearson r
    // from six exact integer sums over the O(types·days) aggregate; the
    // two variance terms are multiplied as doubles (their bigint product
    // can overflow), guarded > 0 before the sqrt.
    Q("q172_autocorr",
      (s, d) => {
        val daily = T.events(s, d)
          .select(col("event_type"),
            expr("ts_ns div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val pairs = daily
          .withColumn("prev_day", lag(col("day"), 1).over(w))
          .withColumn("prev_n", lag(col("n"), 1).over(w))
          .filter(col("prev_day") === col("day") - 1)
        pairs.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("n")).as("sx"), sum(col("prev_n")).as("sy"),
            sum(col("n") * col("prev_n")).as("sxy"),
            sum(col("n") * col("n")).as("sxx"),
            sum(col("prev_n") * col("prev_n")).as("syy"))
          .select(col("event_type"), col("n_pairs"),
            when(
              (col("n_pairs") * col("sxx") - col("sx") * col("sx")) > 0 &&
              (col("n_pairs") * col("syy") - col("sy") * col("sy")) > 0,
              round(
                (col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
                  sqrt(
                    (col("n_pairs") * col("sxx") - col("sx") * col("sx"))
                      .cast("double") *
                    (col("n_pairs") * col("syy") - col("sy") * col("sy"))
                      .cast("double")), 6)).as("r_lag1"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
               SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
                 CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY event_type, day),
             p AS (
               SELECT event_type, n,
                 lag(day, 1) OVER w AS prev_day,
                 lag(n, 1) OVER w AS prev_n,
                 day
               FROM daily
               WINDOW w AS (PARTITION BY event_type ORDER BY day)),
             pairs AS (
               SELECT event_type, n, prev_n FROM p
               WHERE prev_day = day - 1),
             a AS (
               SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(n) AS BIGINT) AS sx,
                 CAST(sum(prev_n) AS BIGINT) AS sy,
                 CAST(sum(n * prev_n) AS BIGINT) AS sxy,
                 CAST(sum(n * n) AS BIGINT) AS sxx,
                 CAST(sum(prev_n * prev_n) AS BIGINT) AS syy
               FROM pairs GROUP BY event_type)
             SELECT event_type, n_pairs,
               CASE WHEN n_pairs * sxx - sx * sx > 0
                     AND n_pairs * syy - sy * sy > 0
                 THEN round((n_pairs * sxy - sx * sy) /
                   sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) *
                        CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
               END AS r_lag1
             FROM a ORDER BY event_type""")),

    // ---- ABC / Pareto classification of parts by revenue (the
    // inventory-management 80/15/5 cut): class boundaries tested by
    // exact cross-multiplication (cum·5 ≤ total·4 ⇔ cum ≤ 80%) carried
    // out in DECIMAL(38,0) (HUGEINT on the DuckDB side) so the products
    // stay exact even when total revenue cents reaches the ~2.3e18 a
    // 100 TB corpus implies — a BIGINT cross-multiply would wrap past
    // ~4.6e17 (ADVICE r7). The cumulative sum runs through
    // ScaleOps.globalCumSum — one range shuffle + O(P) driver offsets —
    // never an un-partitioned window, so the same plan stands when the
    // part dimension itself is billions of rows (q82's histogram-prefix
    // discipline, generalized to value sums). `rev` is pinned so the
    // grand-total aggregate reuses the same scan that feeds the
    // prefix-sum instead of re-running the lineitem groupBy.
    Q("q173_pareto_abc",
      (s, d) => {
        val rev = graft.operators.CacheScope.pin(T.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .as("rev_cents")))
        val c = graft.operators.ScaleOps.globalCumSum(rev,
          Seq(col("rev_cents").desc, col("l_partkey")), "rev_cents")
        val cumD = col("cum").cast("decimal(38,0)")
        val totD = col("total").cast("decimal(38,0)")
        c.crossJoin(broadcast(
            rev.agg(sum(col("rev_cents")).as("total"))))
          .withColumn("abc_class",
            when(cumD * 5 <= totD * 4, "A")
              .when(cumD * 20 <= totD * 19, "B")
              .otherwise("C"))
          .groupBy(col("abc_class"))
          .agg(count(lit(1)).as("n_parts"),
            sum(col("rev_cents")).as("rev_cents"),
            round(sum(col("rev_cents")) /
              first(col("total")).cast("double"), 6).as("rev_share"))
          .orderBy(col("abc_class"))
      },
      Some("""WITH rev AS (
               SELECT l_partkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS rev_cents
               FROM lineitem GROUP BY l_partkey),
             c AS (
               SELECT rev_cents,
                 CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC,
                   l_partkey) AS BIGINT) AS cum,
                 CAST(sum(rev_cents) OVER () AS BIGINT) AS total
               FROM rev),
             k AS (
               SELECT CASE WHEN CAST(cum AS HUGEINT) * 5
                              <= CAST(total AS HUGEINT) * 4 THEN 'A'
                           WHEN CAST(cum AS HUGEINT) * 20
                              <= CAST(total AS HUGEINT) * 19 THEN 'B'
                           ELSE 'C' END AS abc_class,
                 rev_cents, total
               FROM c)
             SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(rev_cents) AS BIGINT) AS rev_cents,
               round(sum(rev_cents) / CAST(any_value(total) AS DOUBLE), 6)
                 AS rev_share
             FROM k GROUP BY abc_class ORDER BY abc_class""")),

    // ---- Skyline / Pareto frontier (min price, max size over parts):
    // the multi-objective "no part is both cheaper and bigger"
    // shortlist. Price ties collapse to their best size in one groupBy;
    // the dominance test is then a single EXCLUSIVE running max over the
    // price order — ScaleOps.globalRunningMax (range shuffle + O(P)
    // prefix maxima), never an un-partitioned window and never the
    // O(n²) dominance self-join. Exact integer cents/sizes throughout.
    Q("q176_skyline",
      (s, d) => {
        val pts = T.part(s, d)
          .groupBy(expr("CAST(round(p_retailprice * 100) AS BIGINT)")
            .as("price_cents"))
          .agg(max(col("p_size").cast("long")).as("best_size"))
        graft.operators.ScaleOps.globalRunningMax(pts,
            Seq(col("price_cents")), "best_size")
          .filter(col("run_max").isNull ||
            col("best_size") > col("run_max"))
          .select(col("price_cents"), col("best_size"))
          .orderBy(col("price_cents"))
      },
      Some("""WITH pts AS (
               SELECT CAST(round(p_retailprice * 100) AS BIGINT)
                   AS price_cents,
                 CAST(max(p_size) AS BIGINT) AS best_size
               FROM part GROUP BY 1),
             rm AS (
               SELECT price_cents, best_size,
                 max(best_size) OVER (ORDER BY price_cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS run_max
               FROM pts)
             SELECT price_cents, best_size FROM rm
             WHERE run_max IS NULL OR best_size > run_max
             ORDER BY price_cents""")),

    // ---- Chi-square independence test on the lang × source
    // contingency table (are document languages distributed the same
    // way across sources?) — the categorical member of the drift/audit
    // family (q116 JS, q140 KS, q154 PSI are numeric). Observed and
    // marginal counts are exact integers off ONE groupBy pass; each
    // cell's (n·obs − r·c)²/(n·r·c) term is evaluated ENTIRELY in
    // doubles — n, o, r, c are cast before the inner products, since a
    // bigint n·o itself wraps once document count passes ~3e9 with a
    // dominant cell (ADVICE r7); chi-square is a float statistic, and
    // the products are exact in doubles below 2^53 anyway. Summed over
    // the O(langs·sources) AGGREGATE — the corpus is touched once.
    Q("q177_chi_square",
      (s, d) => {
        val docs = T.documents(s, d)
        val obs = docs.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("o"))
        val rowT = obs.groupBy(col("lang")).agg(sum(col("o")).as("r"))
        val colT = obs.groupBy(col("source")).agg(sum(col("o")).as("c"))
        obs.join(broadcast(rowT), "lang")
          .join(broadcast(colT), "source")
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
          .agg(
            first(col("n")).as("n_docs"),
            countDistinct(col("lang")).as("n_langs"),
            countDistinct(col("source")).as("n_sources"),
            round(sum {
              val dev = col("n").cast("double") * col("o").cast("double") -
                col("r").cast("double") * col("c").cast("double")
              dev * dev /
                (col("n").cast("double") * col("r").cast("double")) /
                col("c").cast("double")
            }, 6).as("chi2"))
          .withColumn("dof",
            (col("n_langs") - 1) * (col("n_sources") - 1))
          .drop("n_langs", "n_sources")
      },
      Some("""WITH obs AS (
               SELECT lang, source, CAST(count(*) AS BIGINT) AS o
               FROM documents GROUP BY lang, source),
             r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r
                   FROM obs GROUP BY lang),
             c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c
                   FROM obs GROUP BY source),
             n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             cells AS (
               SELECT obs.o, r.r, c.c, n.n
               FROM obs JOIN r USING (lang) JOIN c USING (source)
               CROSS JOIN n)
             SELECT any_value(n) AS n_docs,
               round(sum(
                 (CAST(n AS DOUBLE) * CAST(o AS DOUBLE) -
                  CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) *
                 (CAST(n AS DOUBLE) * CAST(o AS DOUBLE) -
                  CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) /
                 (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)) /
                 CAST(c AS DOUBLE)), 6) AS chi2,
               CAST(((SELECT count(*) FROM r) - 1) *
                 ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof
             FROM cells""")),

    // ---- Mutual information between language and document length (the
    // information-theoretic sibling of q177's chi-square on the same
    // contingency discipline): MI = Σ (n_ij/n)·ln(n_ij·n/(n_i·n_j))
    // over the lang × length-bucket table. Counts are exact integers
    // off ONE groupBy; each cell's float term is NANO-QUANTIZED
    // (round·1e9 → BIGINT) before summation so aggregation order can't
    // perturb the hash (the q154 PSI discipline); products evaluate in
    // doubles (exact below 2^53, no bigint wrap at 10⁹⁺ docs).
    Q("q190_mutual_information",
      (s, d) => {
        val docs = T.documents(s, d)
          .select(col("lang"), expr("length(text) div 200").as("lb"))
        val obs = docs.groupBy(col("lang"), col("lb"))
          .agg(count(lit(1)).as("o"))
        val rowT = obs.groupBy(col("lang")).agg(sum(col("o")).as("r"))
        val colT = obs.groupBy(col("lb")).agg(sum(col("o")).as("c"))
        obs.join(broadcast(rowT), "lang")
          .join(broadcast(colT), "lb")
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
          .withColumn("term_n", expr(
            """CAST(round((CAST(o AS DOUBLE) / n) *
               ln(CAST(o AS DOUBLE) * n / (CAST(r AS DOUBLE) * c))
               * 1000000000) AS BIGINT)"""))
          .agg(first(col("n")).as("n_docs"),
            count(lit(1)).as("n_cells"),
            round(sum(col("term_n")).cast("double") / 1e9, 6).as("mi_nats"))
      },
      Some("""WITH obs AS (
               SELECT lang, length(text) // 200 AS lb,
                 CAST(count(*) AS BIGINT) AS o
               FROM documents GROUP BY 1, 2),
             r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r
                   FROM obs GROUP BY lang),
             c AS (SELECT lb, CAST(sum(o) AS BIGINT) AS c
                   FROM obs GROUP BY lb),
             n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             cells AS (
               SELECT CAST(round((CAST(o AS DOUBLE) / n.n) *
                   ln(CAST(o AS DOUBLE) * n.n /
                      (CAST(r.r AS DOUBLE) * c.c))
                   * 1000000000) AS BIGINT) AS term_n, n.n
               FROM obs JOIN r USING (lang) JOIN c USING (lb)
               CROSS JOIN n)
             SELECT any_value(n) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_cells,
               round(CAST(sum(term_n) AS DOUBLE) / 1e9, 6) AS mi_nats
             FROM cells""")),

    // ---- Theil index of customer-revenue concentration, decomposed
    // between/within nations (the decomposable complement of q159's
    // Gini): T = T_between + T_within, with per-customer entropy terms
    // Σ (x/X)·ln(x/μ) nano-quantized to exact integers before any
    // aggregation — a float sum over millions of customers would be
    // aggregation-order-dependent; the quantized terms are not (q154
    // discipline). One rollup pass over the O(customers) revenue
    // aggregate, output one row per nation plus exact grand terms.
    Q("q191_theil_decomposition",
      (s, d) => {
        val rev = T.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .as("x"))
          .filter(col("x") > 0)
        val cust = T.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
        val tot = rev.agg(sum(col("x")).as("xt"), count(lit(1)).as("nt"))
        val terms = rev.join(broadcast(cust), "o_custkey")
          .crossJoin(broadcast(tot))
          .withColumn("t_n", expr(
            """CAST(round((CAST(x AS DOUBLE) / xt) *
               ln(CAST(x AS DOUBLE) * nt / xt) * 1000000000) AS BIGINT)"""))
        terms.groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"),
            sum(col("x")).as("rev_cents"),
            round(sum(col("t_n")).cast("double") / 1e9, 6).as("theil_part"))
          .orderBy(col("c_nationkey"))
      },
      Some("""WITH rev AS (
               SELECT o_custkey,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS x
               FROM orders GROUP BY o_custkey
               HAVING sum(CAST(round(o_totalprice * 100) AS BIGINT)) > 0),
             tot AS (SELECT CAST(sum(x) AS BIGINT) AS xt,
                       CAST(count(*) AS BIGINT) AS nt FROM rev),
             terms AS (
               SELECT c.c_nationkey, rev.x,
                 CAST(round((CAST(x AS DOUBLE) / xt) *
                   ln(CAST(x AS DOUBLE) * nt / xt) * 1000000000) AS BIGINT)
                   AS t_n
               FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey
               CROSS JOIN tot)
             SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
               CAST(sum(x) AS BIGINT) AS rev_cents,
               round(CAST(sum(t_n) AS DOUBLE) / 1e9, 6) AS theil_part
             FROM terms GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ---- Abuse/bot screen over the event stream: per-user exact
    // integer behavior stats — event count, active-minute count, PEAK
    // events in any single minute (per-minute buckets — the exact
    // max-burst at minute granularity), dominant-event-type permille —
    // ranked by (burst, dominance), top 25 emitted. The ranked form
    // (rather than a fixed threshold residue) keeps the screen
    // data-independent: production sets the cut, the engine's job is
    // the exact ordering. One user shuffle + one minute-bucket
    // aggregate; integer cross-multiplied permille, no floats.
    Q("q192_bot_screen",
      (s, d) => {
        val ev = T.events(s, d)
          .select(col("user_id"), col("event_type"),
            expr("ts_ns div 60000000000").as("minute"))
        val perMin = ev.groupBy(col("user_id"), col("minute"))
          .agg(count(lit(1)).as("mcnt"))
          .groupBy(col("user_id"))
          .agg(max(col("mcnt")).as("peak_per_min"),
            count(lit(1)).as("active_minutes"))
        val perType = ev.groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("tcnt"))
          .groupBy(col("user_id"))
          .agg(sum(col("tcnt")).as("n_events"),
            max(col("tcnt")).as("top_type_cnt"))
        perMin.join(perType, "user_id")
          .withColumn("dominance_pm",
            expr("top_type_cnt * 1000 div n_events"))
          .select(col("user_id"), col("n_events"), col("active_minutes"),
            col("peak_per_min"), col("dominance_pm"))
          .orderBy(col("peak_per_min").desc, col("dominance_pm").desc,
            col("user_id"))
          .limit(25)
      },
      Some("""WITH ev AS (
               SELECT user_id, event_type,
                 epoch_ns(ts) // 60000000000 AS minute
               FROM events),
             pm AS (
               SELECT user_id, CAST(max(mcnt) AS BIGINT) AS peak_per_min,
                 CAST(count(*) AS BIGINT) AS active_minutes
               FROM (SELECT user_id, minute, count(*) AS mcnt
                     FROM ev GROUP BY 1, 2)
               GROUP BY user_id),
             pt AS (
               SELECT user_id, CAST(sum(tcnt) AS BIGINT) AS n_events,
                 CAST(max(tcnt) AS BIGINT) AS top_type_cnt
               FROM (SELECT user_id, event_type, count(*) AS tcnt
                     FROM ev GROUP BY 1, 2)
               GROUP BY user_id)
             SELECT user_id, n_events, active_minutes, peak_per_min,
               CAST(top_type_cnt * 1000 // n_events AS BIGINT)
                 AS dominance_pm
             FROM pm JOIN pt USING (user_id)
             ORDER BY peak_per_min DESC, dominance_pm DESC, user_id
             LIMIT 25""")),

    // ---- Referential-integrity audit across the warehouse's FK edges
    // (the cross-TABLE member of the q121/q135 data-quality family):
    // orphan counts for every declared foreign key, each one LEFT ANTI
    // join + count — at 100 TB each check is one co-partitioned join
    // against a dimension (broadcast where the dimension is small), and
    // the output is O(edges). The synthetic warehouse is clean, so the
    // value of the hash is the ZERO row set — the audit proves absence.
    Q("q203_fk_integrity",
      (s, d) => {
        def orphans(name: String, fact: DataFrame, key: String,
            dim: DataFrame, dimKey: String) =
          fact.select(col(key).as("k")).filter(col("k").isNotNull)
            .join(dim.select(col(dimKey).as("k")), Seq("k"), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
            .select(lit(name).as("fk"), col("n_orphans"))
        orphans("customer->nation", T.customer(s, d), "c_nationkey",
            T.nation(s, d), "n_nationkey")
          .unionByName(orphans("lineitem->orders", T.lineitem(s, d),
            "l_orderkey", T.orders(s, d), "o_orderkey"))
          .unionByName(orphans("lineitem->part", T.lineitem(s, d),
            "l_partkey", T.part(s, d), "p_partkey"))
          .unionByName(orphans("lineitem->supplier", T.lineitem(s, d),
            "l_suppkey", T.supplier(s, d), "s_suppkey"))
          .unionByName(orphans("orders->customer", T.orders(s, d),
            "o_custkey", T.customer(s, d), "c_custkey"))
          .unionByName(orphans("supplier->nation", T.supplier(s, d),
            "s_nationkey", T.nation(s, d), "n_nationkey"))
          .orderBy(col("fk"))
      },
      Some("""SELECT * FROM (
               SELECT 'customer->nation' AS fk, CAST(count(*) AS BIGINT)
                 AS n_orphans
               FROM customer WHERE c_nationkey IS NOT NULL
                 AND c_nationkey NOT IN (SELECT n_nationkey FROM nation)
               UNION ALL
               SELECT 'lineitem->orders', CAST(count(*) AS BIGINT)
               FROM lineitem WHERE l_orderkey IS NOT NULL
                 AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
               UNION ALL
               SELECT 'lineitem->part', CAST(count(*) AS BIGINT)
               FROM lineitem WHERE l_partkey IS NOT NULL
                 AND l_partkey NOT IN (SELECT p_partkey FROM part)
               UNION ALL
               SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT)
               FROM lineitem WHERE l_suppkey IS NOT NULL
                 AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
               UNION ALL
               SELECT 'orders->customer', CAST(count(*) AS BIGINT)
               FROM orders WHERE o_custkey IS NOT NULL
                 AND o_custkey NOT IN (SELECT c_custkey FROM customer)
               UNION ALL
               SELECT 'supplier->nation', CAST(count(*) AS BIGINT)
               FROM supplier WHERE s_nationkey IS NOT NULL
                 AND s_nationkey NOT IN (SELECT n_nationkey FROM nation))
             ORDER BY fk""")),

    // ---- Profile drift between two snapshots (Profiler.profileDrift —
    // the monitor its scaladoc promises): snapshot B of the documents
    // table drops `source`, adds `lang_upper`, retypes `n_chars` to
    // double, and nulls `text` for every fifth doc — the drift table
    // must catch all four (status per column, fill-rate deltas, distinct
    // counts both sides). Two one-pass profiles + an O(columns) join;
    // the oracle recomputes every cell definitionally from one aggregate
    // over the table.
    Q("q202_profile_drift",
      (s, d) => {
        val docs = T.documents(s, d)
        val b = docs.select(col("doc_id"),
          when(col("doc_id") % 5 === 0, lit(null).cast("string"))
            .otherwise(col("text")).as("text"),
          col("lang"),
          col("n_chars").cast("double").as("n_chars"),
          upper(col("lang")).as("lang_upper"))
        graft.operators.Profiler.profileDrift(docs, b)
          .orderBy(col("column"))
      },
      Some("""WITH s AS (
               SELECT CAST(count(*) AS BIGINT) AS nr,
                 count(doc_id) AS c_doc, count(DISTINCT doc_id) AS d_doc,
                 count(text) AS c_text, count(DISTINCT text) AS d_text,
                 count(CASE WHEN doc_id % 5 = 0 THEN NULL ELSE text END)
                   AS c_tb,
                 count(DISTINCT CASE WHEN doc_id % 5 = 0 THEN NULL
                   ELSE text END) AS d_tb,
                 count(lang) AS c_lang, count(DISTINCT lang) AS d_lang,
                 count(source) AS c_src, count(DISTINCT source) AS d_src,
                 count(n_chars) AS c_nch, count(DISTINCT n_chars) AS d_nch,
                 count(upper(lang)) AS c_lu,
                 count(DISTINCT upper(lang)) AS d_lu
               FROM documents)
             SELECT * FROM (
               SELECT 'doc_id' AS "column", 'kept' AS status,
                 'bigint' AS dtype_a, 'bigint' AS dtype_b,
                 round(1.0 - CAST(nr - c_doc AS DOUBLE) / nr, 6) AS fill_a,
                 round(1.0 - CAST(nr - c_doc AS DOUBLE) / nr, 6) AS fill_b,
                 round(round(1.0 - CAST(nr - c_doc AS DOUBLE) / nr, 6)
                   - round(1.0 - CAST(nr - c_doc AS DOUBLE) / nr, 6), 6)
                   AS fill_delta,
                 CAST(d_doc AS BIGINT) AS dist_a,
                 CAST(d_doc AS BIGINT) AS dist_b
               FROM s
               UNION ALL
               SELECT 'lang', 'kept', 'string', 'string',
                 round(1.0 - CAST(nr - c_lang AS DOUBLE) / nr, 6),
                 round(1.0 - CAST(nr - c_lang AS DOUBLE) / nr, 6),
                 round(round(1.0 - CAST(nr - c_lang AS DOUBLE) / nr, 6)
                   - round(1.0 - CAST(nr - c_lang AS DOUBLE) / nr, 6), 6),
                 CAST(d_lang AS BIGINT), CAST(d_lang AS BIGINT)
               FROM s
               UNION ALL
               SELECT 'lang_upper', 'added', NULL, 'string',
                 NULL,
                 round(1.0 - CAST(nr - c_lu AS DOUBLE) / nr, 6),
                 NULL, NULL, CAST(d_lu AS BIGINT)
               FROM s
               UNION ALL
               SELECT 'n_chars', 'type_changed', 'bigint', 'double',
                 round(1.0 - CAST(nr - c_nch AS DOUBLE) / nr, 6),
                 round(1.0 - CAST(nr - c_nch AS DOUBLE) / nr, 6),
                 round(round(1.0 - CAST(nr - c_nch AS DOUBLE) / nr, 6)
                   - round(1.0 - CAST(nr - c_nch AS DOUBLE) / nr, 6), 6),
                 CAST(d_nch AS BIGINT), CAST(d_nch AS BIGINT)
               FROM s
               UNION ALL
               SELECT 'source', 'dropped', 'string', NULL,
                 round(1.0 - CAST(nr - c_src AS DOUBLE) / nr, 6),
                 NULL, NULL, CAST(d_src AS BIGINT), NULL
               FROM s
               UNION ALL
               SELECT 'text', 'kept', 'string', 'string',
                 round(1.0 - CAST(nr - c_text AS DOUBLE) / nr, 6),
                 round(1.0 - CAST(nr - c_tb AS DOUBLE) / nr, 6),
                 round(round(1.0 - CAST(nr - c_tb AS DOUBLE) / nr, 6)
                   - round(1.0 - CAST(nr - c_text AS DOUBLE) / nr, 6), 6),
                 CAST(d_text AS BIGINT), CAST(d_tb AS BIGINT)
               FROM s)
             ORDER BY "column"""")),

    // ---- Theil–Sen robust trend per event type (the breakdown-robust
    // sibling of q141's OLS — one outlier day skews a least-squares
    // slope; the MEDIAN of pairwise slopes shrugs off up to ~29%
    // contamination): every day pair (d1 < d2) of the per-type daily
    // series contributes slope (n2−n1)/(d2−d1); the LOWER MEDIAN by
    // (slope, d1, d2) order is the estimate — a total order, so both
    // engines pick the identical pair. The series is O(days) per type,
    // the pair fan-out O(days²) per type — bounded by the calendar, not
    // the corpus (at decade scale, grid-sample the days first; the
    // estimator tolerates it). Slopes are the only floats; identical
    // single divisions on both engines.
    Q("q201_theil_sen",
      (s, d) => {
        val daily = T.events(s, d)
          .select(col("event_type"),
            expr("ts_ns div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n"))
        val a = daily.select(col("event_type"), col("day").as("d1"),
          col("n").as("n1"))
        val b = daily.select(col("event_type"), col("day").as("d2"),
          col("n").as("n2"))
        val slopes = a.join(b, Seq("event_type"))
          .filter(col("d1") < col("d2"))
          .withColumn("slope",
            (col("n2") - col("n1")).cast("double") / (col("d2") - col("d1")))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("slope"), col("d1"), col("d2"))
        slopes
          .withColumn("rk", row_number().over(w))
          .withColumn("n_pairs",
            count(lit(1)).over(Window.partitionBy(col("event_type"))))
          .filter(col("rk") === expr("(n_pairs + 1) div 2"))
          .select(col("event_type"), col("n_pairs"),
            round(col("slope"), 6).as("ts_slope"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
               SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
                 CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
             slopes AS (
               SELECT a.event_type,
                 CAST(b.n - a.n AS DOUBLE) / (b.day - a.day) AS slope,
                 a.day AS d1, b.day AS d2
               FROM daily a JOIN daily b
                 ON a.event_type = b.event_type AND a.day < b.day),
             ranked AS (
               SELECT event_type, slope,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY slope, d1, d2) AS rk,
                 count(*) OVER (PARTITION BY event_type) AS n_pairs
               FROM slopes)
             SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
               round(slope, 6) AS ts_slope
             FROM ranked WHERE rk = (n_pairs + 1) // 2
             ORDER BY event_type""")),

    // ---- CUPED experiment readout (Deng et al. 2013): variant means of
    // post-period revenue, variance-reduced by the pre-period activity
    // covariate — θ = cov(x,y)/var(x) POOLED across variants, adjusted
    // mean = ȳ_v − θ·(x̄_v − x̄). Assignment is an md5 bit of the user id
    // (portable hash — deterministic, uniform, reproducible on both
    // engines); the pre/post cut is the corpus midpoint timestamp from a
    // 1-row aggregate. Every moment (Σx, Σy, Σxy, Σx²) is an EXACT
    // integer over per-user integer counts/cents; θ and the adjusted
    // means are the only float steps, computed once from those sums
    // (products in doubles — the q177 overflow lesson). One user-grain
    // shuffle; everything after is O(variants).
    Q("q200_cuped",
      (s, d) => {
        val ev = T.events(s, d).select(col("user_id"), col("ts_ns"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        val cut = ev.agg(min(col("ts_ns")).as("mn"), max(col("ts_ns")).as("mx"))
          .select(expr("(mn + mx) div 2").as("t0"))
        val user = ev.crossJoin(broadcast(cut))
          .groupBy(col("user_id"))
          .agg(sum(when(col("ts_ns") < col("t0"), 1L).otherwise(0L)).as("x"),
            sum(when(col("ts_ns") >= col("t0"), col("cents"))
              .otherwise(0L)).as("y"))
          .withColumn("variant",
            expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 1), " +
              "16, 10) AS BIGINT) % 2"))
        val g = user.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        user.groupBy(col("variant"))
          .agg(count(lit(1)).as("n_users"), sum(col("x")).as("vx"),
            sum(col("y")).as("vy"))
          .crossJoin(broadcast(g))
          .withColumn("theta", expr(
            """(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
               (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"""))
          .select(col("variant"), col("n_users"),
            round(col("vy").cast("double") / col("n_users") / 100.0, 6)
              .as("mean_rev"),
            round(col("vx").cast("double") / col("n_users"), 6)
              .as("mean_pre"),
            round((col("vy").cast("double") / col("n_users") -
              col("theta") * (col("vx").cast("double") / col("n_users") -
                col("sx").cast("double") / col("n"))) / 100.0, 6)
              .as("adj_mean_rev"),
            round(col("theta"), 6).as("theta"))
          .orderBy(col("variant"))
      },
      Some("""WITH ev AS (
               SELECT user_id, epoch_ns(ts) AS ts_ns,
                 CAST(round(value * 100) AS BIGINT) AS cents
               FROM events),
             cut AS (
               SELECT CAST((min(ts_ns) + max(ts_ns)) // 2 AS BIGINT) AS t0
               FROM ev),
             u AS (
               SELECT user_id,
                 CAST(sum(CASE WHEN ts_ns < t0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS x,
                 CAST(sum(CASE WHEN ts_ns >= t0 THEN cents ELSE 0 END)
                   AS BIGINT) AS y,
                 CAST(concat('0x',
                   substr(md5(CAST(user_id AS VARCHAR)), 1, 1))
                   AS BIGINT) % 2 AS variant
               FROM ev CROSS JOIN cut GROUP BY user_id),
             g AS (
               SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy
               FROM u),
             v AS (
               SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(x) AS BIGINT) AS vx, CAST(sum(y) AS BIGINT) AS vy
               FROM u GROUP BY variant),
             th AS (
               SELECT (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                 (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 AS theta, n, sx
               FROM g)
             SELECT variant, n_users,
               round(CAST(vy AS DOUBLE) / n_users / 100.0, 6) AS mean_rev,
               round(CAST(vx AS DOUBLE) / n_users, 6) AS mean_pre,
               round((CAST(vy AS DOUBLE) / n_users -
                 theta * (CAST(vx AS DOUBLE) / n_users -
                   CAST(sx AS DOUBLE) / n)) / 100.0, 6) AS adj_mean_rev,
               round(theta, 6) AS theta
             FROM v CROSS JOIN th ORDER BY variant""")),

    // ---- Interval-overlap join between two LARGE derived interval
    // sets (operators/IntervalJoin.overlapJoin — the S4 join-family
    // member where neither side broadcasts and the predicate is a
    // range overlap): 5-minute-gap user sessions (q26's sessionization
    // reduced to [min, max] ns intervals) overlapped against incident
    // windows (high-value error events ± 10 minutes). The fixed grid
    // (1 h buckets) turns the range predicate into ONE shuffle
    // equi-join — no BroadcastNestedLoopJoin, no cartesian — and pairs
    // sharing several buckets dedup by the first-shared-bucket
    // arithmetic rule (no distinct shuffle). Per incident: overlapping
    // sessions + distinct users, top-20 by pressure, ties pinned.
    // Oracle: DuckDB's native range join (IEJoin) over the same
    // session/incident CTEs — a DIFFERENT physical strategy arriving
    // at the same pairs, which is the point of the check.
    Q("q228_interval_overlap",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
        val sess = T.events(s, d)
          .withColumn("gap_ns",
            col("ts_ns") - lag(col("ts_ns"), 1).over(byUser))
          .withColumn("new_session",
            when(col("gap_ns").isNull || col("gap_ns") > 300000000000L, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("new_session"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("ts_ns")).as("s_start"),
            max(col("ts_ns")).as("s_end"))
          .select(col("user_id"), col("s_start"), col("s_end"))
        val inc = T.events(s, d)
          .filter(col("event_type") === "error" && col("value") >= 100)
          .select(col("event_id").as("incident_id"),
            (col("ts_ns") - lit(600000000000L)).as("i_start"),
            (col("ts_ns") + lit(600000000000L)).as("i_end"))
        // maxSpan: a 5-min-gap session has no a-priori length bound —
        // dense-activity users chain sessions up to the corpus time
        // range (years at high SF), and the default 1024-bucket guard
        // would ABORT the query on the first such user. Size the guard
        // to the data's actual bound (~10 years of 1 h buckets); the
        // per-row fan-out stays linear in that one session's duration.
        graft.operators.IntervalJoin.overlapJoin(
            sess, inc, "s_start", "s_end", "i_start", "i_end",
            bucket = 3600000000000L, maxSpan = 131072)
          .groupBy(col("incident_id"))
          .agg(count(lit(1)).as("n_sessions"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("n_sessions").desc, col("incident_id"))
          .limit(20)
      },
      Some("""WITH e AS (
               SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
                 event_type, value
               FROM events),
             flagged AS (
               SELECT user_id, event_id, ts_ns,
                 CASE WHEN ts_ns - lag(ts_ns, 1) OVER w IS NULL
                       OR ts_ns - lag(ts_ns, 1) OVER w > 300000000000
                      THEN 1 ELSE 0 END AS new_session
               FROM e WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts_ns, event_id)),
             sess0 AS (
               SELECT user_id, ts_ns,
                 sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts_ns, event_id ROWS UNBOUNDED PRECEDING)
                   AS session_id
               FROM flagged),
             sess AS (
               SELECT user_id, min(ts_ns) AS s_start, max(ts_ns) AS s_end
               FROM sess0 GROUP BY user_id, session_id),
             inc AS (
               SELECT event_id AS incident_id,
                 ts_ns - 600000000000 AS i_start,
                 ts_ns + 600000000000 AS i_end
               FROM e WHERE event_type = 'error' AND value >= 100),
             ov AS (
               SELECT i.incident_id, s.user_id
               FROM sess s JOIN inc i
                 ON s.s_start <= i.i_end AND i.i_start <= s.s_end)
             SELECT incident_id, count(*) AS n_sessions,
               count(DISTINCT user_id) AS n_users
             FROM ov GROUP BY incident_id
             ORDER BY n_sessions DESC, incident_id LIMIT 20"""))
  )
}
