package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryDef, Tables}

/** Core relational surface: SURVEY.md §2.3 Q1–Q15 re-expressed Spark-first.
  *
  * Generalizes the reference's single SQL operator (equi-join + CTAS,
  * /root/reference/src/sparkSQL/SparkSQLOperator.java:18-23) and its
  * projection operator (AddField.java:9-23) into a full declarative batch
  * query surface. Catalyst owns all planning: filters/projections reach the
  * parquet scans (PushedFilters), dim-table joins are broadcast explicitly,
  * aggregations are two-phase hash-aggregates.
  *
  * Determinism contract vs the DuckDB oracle: money sums go through
  * DECIMAL(12,2) (exact, order-free) and are cast to DOUBLE only at the end;
  * averages divide that exact sum by a COUNT in double (single correctly-
  * rounded IEEE op each — portable); every query ends in a total-order sort.
  */
object CoreQueries {

  private val D = DecimalType(12, 2)
  private def dec(c: Column): Column = c.cast(D)
  /** Exact decimal sum of a ≤2-decimal double column, surfaced as double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")
  private def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))
  /** revenue term: extendedprice * (1 - discount), exact in decimal. */
  private def revTerm(price: Column, disc: Column): Column =
    dec(price) * (lit(1).cast(D) - dec(disc))
  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- Q1
  /** Pricing summary: scan → filter → derive → two-phase hash agg → sort.
    * (TPC-H Q1 shape; exercises ref R2 AddField + R4 SQL agg surface.)
    * Oracle portability note (found by the round-10 sf1 parity run, where
    * sum_charge went one ulp off at 6M rows): two stacked engine traps.
    * (1) The (12,2)-cast triple product reaches DuckDB's 38-digit decimal
    * width ceiling ((25,4)×(13,2)) and silently demotes to an
    * order-dependent double sum — the oracle now casts at the columns'
    * TRUE widths ((10,2) price, (3,2) rates → (18,6) product), exact
    * until sum_charge·1e6 overflows the 2^63 micro-units long render
    * (~sf 4000 — far past any gated scale, but not literally any SF).
    * (2) Even with both decimal sums exact and equal, DuckDB's
    * decimal→double cast converts the underlying hugeint FIRST (rounding
    * at 2^53 micro-units, i.e. sums past ~9e9) and divides after, while
    * Spark rounds the rational correctly — so the final render goes
    * through an exact integer-MICROS long on BOTH sides, then one
    * long→double conversion + one IEEE divide (the q21 centroid
    * pattern), which every IEEE engine rounds identically. */
  val q01 = QueryDef("q01_pricing_summary",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      l.filter(col("l_shipdate") <= expr("TIMESTAMP '1998-09-01 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(revTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
          ((sum(revTerm(col("l_extendedprice"), col("l_discount")) *
            (lit(1).cast(D) + dec(col("l_tax")))) * lit(1000000L))
            .cast("long").cast("double") / 1000000.0).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM($revSql) AS DOUBLE) AS sum_disc_price,
        CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(10,2))
          * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
          * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))
          * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- Q2
  /** Revenue by nation: 6-table join chain; dims (supplier/nation/region)
    * broadcast so the big fact joins shuffle only on their own keys.
    * (TPC-H Q5 shape; generalizes ref R4 SparkSQLOperator.java:18.) */
  val q02 = QueryDef("q02_revenue_by_nation",
    (s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA" &&
          o("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          o("o_orderdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
        .groupBy(n("n_name"))
        .agg(sum(revTerm(l("l_extendedprice"), l("l_discount"))).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },
    Some(s"""
      SELECT n_name,
        CAST(SUM($revSql) AS DOUBLE) AS revenue
      FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""))

  // ---------------------------------------------------------------- Q3
  /** Top-10 orders by open revenue (TakeOrderedAndProject plan). */
  val q03 = QueryDef("q03_topk_orders",
    (s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.filter(col("c_mktsegment") === "BUILDING")
        .join(o, c("c_custkey") === o("o_custkey"))
        .filter(o("o_orderdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .filter(l("l_shipdate") > expr("TIMESTAMP '1998-01-01 00:00:00'"))
        .groupBy(l("l_orderkey"), o("o_orderdate"))
        .agg(sum(revTerm(l("l_extendedprice"), l("l_discount"))).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, o_orderdate,
        CAST(SUM($revSql) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""))

  // ---------------------------------------------------------------- Q4
  /** Left-semi join (EXISTS): orders with a lineitem shipped >60d after
    * order date, counted per priority. */
  val q04 = QueryDef("q04_late_orders_semi",
    (s, dir) => {
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAY"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM orders
      WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- Q5
  /** Left-anti join (NOT EXISTS): customers with no orders, per segment. */
  val q05 = QueryDef("q05_idle_customers_anti",
    (s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(dec(col("c_acctbal"))).cast("double").as("sum_acctbal"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_customers,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  // ---------------------------------------------------------------- Q6
  /** Window-function battery: ranking (row_number/rank/dense_rank/ntile),
    * analytic (lag/lead/first), and a running frame agg (exact decimal
    * then double). All windows carry an o_orderkey tiebreak so every
    * ranking is total-ordered and engine-portable. */
  val q06 = QueryDef("q06_window_rank",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.withColumn("rn", row_number().over(byPrice))
        .withColumn("rnk", rank().over(byPrice))
        .withColumn("drnk", dense_rank().over(byPrice))
        .withColumn("quartile", ntile(4).over(byPrice))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(byPrice))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(byPrice))
        .withColumn("top_price", first(col("o_totalprice")).over(byPrice))
        .withColumn("running_spend", sum(dec(col("o_totalprice"))).over(byDate).cast("double"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"), col("rnk"), col("drnk"), col("quartile"),
          col("prev_price"), col("next_price"), col("top_price"),
          col("running_spend"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk, quartile,
             prev_price, next_price, top_price, running_spend FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(row_number() OVER w AS INTEGER) AS rn,
          CAST(rank() OVER w AS INTEGER) AS rnk,
          CAST(dense_rank() OVER w AS INTEGER) AS drnk,
          CAST(ntile(4) OVER w AS INTEGER) AS quartile,
          lag(o_totalprice, 1) OVER w AS prev_price,
          lead(o_totalprice, 1) OVER w AS next_price,
          first_value(o_totalprice) OVER w AS top_price,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rn <= 3
      ORDER BY o_custkey, rn"""))

  // ---------------------------------------------------------------- Q7
  /** Rollup with grouping discriminator (NULL group markers folded to
    * 'ALL' so the oracle compare never hashes SQL NULL sort order). */
  val q07 = QueryDef("q07_rollup",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"),
          grouping_id().cast("long").as("grp"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"), col("total"), col("grp"))
        .orderBy("grp", "priority", "status")
    },
    Some("""
      SELECT
        COALESCE(o_orderpriority, 'ALL') AS priority,
        COALESCE(o_orderstatus, 'ALL') AS status,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS grp
      FROM orders
      GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      ORDER BY grp, priority, status"""))

  /** Cube over (priority, status): all 2^2 grouping sets. */
  val q07b = QueryDef("q07b_cube",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("grp"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"), col("grp"))
        .orderBy("grp", "priority", "status")
    },
    Some("""
      SELECT
        COALESCE(o_orderpriority, 'ALL') AS priority,
        COALESCE(o_orderstatus, 'ALL') AS status,
        COUNT(*) AS n,
        CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS grp
      FROM orders
      GROUP BY CUBE(o_orderpriority, o_orderstatus)
      ORDER BY grp, priority, status"""))

  // ---------------------------------------------------------------- Q8
  /** Set ops: BUILDING-segment customers vs customers with >10 orders —
    * union ∪, intersect ∩, except ∖, tagged into one relation. */
  val q08 = QueryDef("q08_setops",
    (s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val b = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 10).select(col("o_custkey").as("c_custkey"))
      val u = a.union(b).distinct().withColumn("op", lit("union"))
      val i = a.intersect(b).withColumn("op", lit("intersect"))
      val e = a.except(b).withColumn("op", lit("except"))
      u.union(i).union(e)
        .select(col("op"), col("c_custkey"))
        .orderBy("op", "c_custkey")
    },
    Some("""
      WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
           b AS (SELECT o_custkey AS c_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 10)
      SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
      UNION ALL
      SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
      UNION ALL
      SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
      ORDER BY op, c_custkey"""))

  /** Multiset set ops (`intersectAll` / `exceptAll`): bag semantics over
    * duplicate-bearing part-key multisets (low-quantity vs high-quantity
    * lineitems), rolled up to (op, key, multiplicity) so the output stays
    * compact and totally ordered. Integer-valued double thresholds keep
    * the predicates bit-identical across engines. */
  val q08b = QueryDef("q08b_setops_all",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val a = l.filter(col("l_quantity") < 10).select(col("l_partkey"))
      val b = l.filter(col("l_quantity") >= 40).select(col("l_partkey"))
      val i = a.intersectAll(b).withColumn("op", lit("intersect_all"))
      val e = a.exceptAll(b).withColumn("op", lit("except_all"))
      i.unionByName(e)
        .groupBy(col("op"), col("l_partkey")).agg(count(lit(1)).as("n"))
        .orderBy("op", "l_partkey")
    },
    Some("""
      WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity < 10),
           b AS (SELECT l_partkey FROM lineitem WHERE l_quantity >= 40)
      SELECT op, l_partkey, COUNT(*) AS n FROM (
        SELECT 'intersect_all' AS op, l_partkey FROM (SELECT l_partkey FROM a INTERSECT ALL SELECT l_partkey FROM b)
        UNION ALL
        SELECT 'except_all' AS op, l_partkey FROM (SELECT l_partkey FROM a EXCEPT ALL SELECT l_partkey FROM b)
      ) GROUP BY op, l_partkey
      ORDER BY op, l_partkey"""))

  // ---------------------------------------------------------------- Q9
  /** Scalar-function battery over lineitem ⋈ broadcast(part): strings,
    * dates, math (only IEEE-exact fns: sqrt/abs/floor/ceil — libm fns like
    * log/pow are not bit-portable across engines), conditionals. */
  val q09 = QueryDef("q09_scalar_battery",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      // Part-derived scalars (regex/string fns are the per-row cost pigs)
      // are computed on the 20k-row dim side BEFORE the join fans them out
      // across 600k+ fact rows — 30× less string work, same semantics.
      val p = t(s, dir, "part").select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        col("p_name").like("%re%").cast("int").as("has_re"),
        abs(col("p_size") - lit(25)).as("size_dist"),
        sqrt(col("p_size").cast("double")).as("size_sqrt"),
        when(col("p_size") > 25, "big").when(col("p_size") > 10, "mid")
          .otherwise("small").as("size_class"),
        coalesce(nullif(col("p_brand"), lit("Brand#1")), lit("DEFAULT")).as("brand_nn"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .select(
          l("l_orderkey"), l("l_linenumber"),
          col("name_prefix"), col("name_len"), col("first_word"), col("has_re"),
          year(l("l_shipdate")).as("ship_year"),
          month(l("l_shipdate")).as("ship_month"),
          dayofmonth(l("l_shipdate")).as("ship_day"),
          date_trunc("month", l("l_shipdate")).as("ship_month_start"),
          datediff(l("l_shipdate"), expr("TIMESTAMP '1995-01-01 00:00:00'")).as("days_since_95"),
          col("size_dist"), col("size_sqrt"),
          floor(l("l_quantity") / lit(7.0)).cast("long").as("qty_div7"),
          ceil(l("l_quantity") / lit(7.0)).cast("long").as("qty_div7_up"),
          col("size_class"), col("brand_nn"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        upper(substring(p_name, 1, 8)) AS name_prefix,
        CAST(length(p_name) AS INTEGER) AS name_len,
        regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        CAST(p_name LIKE '%re%' AS INTEGER) AS has_re,
        CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        CAST(day(l_shipdate) AS INTEGER) AS ship_day,
        date_trunc('month', l_shipdate) AS ship_month_start,
        CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', l_shipdate) AS INTEGER) AS days_since_95,
        CAST(abs(p_size - 25) AS INTEGER) AS size_dist,
        sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
        CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_div7,
        CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_div7_up,
        CASE WHEN p_size > 25 THEN 'big' WHEN p_size > 10 THEN 'mid' ELSE 'small' END AS size_class,
        COALESCE(NULLIF(p_brand, 'Brand#1'), 'DEFAULT') AS brand_nn
      FROM lineitem JOIN part ON l_partkey = p_partkey
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- Q9b
  /** Transcendental math battery (log/ln/log10/pow/exp/cbrt) — the libm
    * surface q09 deliberately excludes: these are NOT correctly-rounded
    * IEEE ops, so DuckDB's libm and the JVM's StrictMath-free Math can
    * disagree in the last ulp and the value-hash gate would flap. Checked
    * rows-only (like q15b's sketches); the functions themselves are plain
    * Spark built-ins inside whole-stage codegen. */
  val q09b = QueryDef("q09b_math_libm",
    (s, dir) =>
      t(s, dir, "part").select(
          col("p_partkey"),
          log(col("p_size").cast("double")).as("ln_size"),
          log10(col("p_size").cast("double")).as("log10_size"),
          log2(col("p_size").cast("double")).as("log2_size"),
          pow(col("p_size").cast("double"), lit(1.5)).as("pow_15"),
          exp(col("p_size").cast("double") / lit(50.0)).as("exp_norm"),
          cbrt(col("p_size").cast("double")).as("cbrt_size"),
          (sin(col("p_size").cast("double")) + cos(col("p_size").cast("double")))
            .as("trig_mix"),
          atan2(col("p_size").cast("double"), col("p_retailprice")).as("angle"))
        .orderBy("p_partkey"),
    None) // rows-only: libm results are not bit-portable across engines

  // ---------------------------------------------------------------- Q10
  /** Events: JSON prop extraction + tumbling 1h window agg (batch form of
    * the streaming pipeline; ts arrives as TIMESTAMP(NANOS) → µs, see
    * Tables.load). `value` is an arbitrary double, so its sum is made
    * portable by exact integer cents: floor(value*100) summed as BIGINT. */
  val q10 = QueryDef("q10_events_window",
    (s, dir) => {
      val e = t(s, dir, "events")
      // JSON → map<string,string> → element_at: exercises the map-column
      // surface (get_json_object is the other JSON path, used in tests)
      e.withColumn("props_map",
          from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
        .withColumn("k", element_at(col("props_map"), "k").cast("int"))
        .groupBy(col("event_type"), window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * lit(100)).cast("long")).as("value_cents"),
          sum(col("k").cast("long")).as("sum_k"))
        .select(col("event_type"), col("window.start").as("window_start"),
          col("n"), (col("value_cents").cast("double") / lit(100.0)).as("sum_value"),
          col("sum_k"))
        .orderBy("event_type", "window_start")
    },
    Some("""
      SELECT event_type,
        date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        COUNT(*) AS n,
        CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
        CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
      FROM events
      GROUP BY 1, 2
      ORDER BY event_type, window_start"""))

  // ---------------------------------------------------------------- Q14
  /** Theta/range join, banded + aggregate-pushdown: the query is an
    * aggregate over pairs satisfying `l_quantity BETWEEN p_size±5`, whose
    * key columns are tiny-domain (50 quantities × 50 sizes). A naive range
    * join materializes O(n·m/|sizes|) pairs — billions at sf0.1 (the join
    * key has 50 distinct values: worst-case skew AND fanout). Instead both
    * sides pre-aggregate to their key domains (two cheap shuffles), the
    * 11-wide band explode happens on the ~50-row aggregate, and pair
    * counts multiply out — identical result, O(|qty|·|size·brand|) join
    * work, scale-independent. */
  val q14 = QueryDef("q14_theta_band_join",
    (s, dir) => {
      val l = t(s, dir, "lineitem"); val p = t(s, dir, "part")
      val lagg = l.withColumn("qty_i", floor(col("l_quantity")).cast("int"))
        .groupBy(col("qty_i"))
        .agg(count(lit(1)).as("nl"), sum(dec(col("l_quantity"))).as("sq"))
      val pagg = p.groupBy(col("p_size"), col("p_brand")).agg(count(lit(1)).as("np"))
      val expanded = lagg.withColumn("cand_size",
        explode(sequence(col("qty_i") - lit(5), col("qty_i") + lit(5))))
      expanded.join(broadcast(pagg), expanded("cand_size") === pagg("p_size"))
        .groupBy(col("p_brand"))
        .agg(sum(col("nl") * col("np")).as("n_pairs"),
          sum(col("sq") * col("np")).cast("double").as("sum_qty"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n_pairs,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN part
        ON p_size BETWEEN CAST(floor(l_quantity) AS INTEGER) - 5 AND CAST(floor(l_quantity) AS INTEGER) + 5
      GROUP BY p_brand
      ORDER BY p_brand"""))

  // ---------------------------------------------------------------- Q15
  /** Exact distinct aggregation (Catalyst expands to two-phase). The approx
    * (HLL++) scale variant lives in ApproxQueries (rows-only checked:
    * sketches aren't portable across engines). */
  val q15 = QueryDef("q15_distinct_counts",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      l.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT l_partkey) AS n_part,
        COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Approx-distinct (HLL++) — 100 TB posture; no DuckDB hash parity
    * (different sketch), driver records rows-only. */
  val q15b = QueryDef("q15b_approx_distinct",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      l.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_suppkey")).as("approx_supp"),
          approx_count_distinct(col("l_partkey")).as("approx_part"))
        .orderBy("l_returnflag")
    },
    None)

  // ---------------------------------------------------------------- Q29
  /** Exact interpolated percentiles per group (Spark `percentile` =
    * DuckDB `quantile_cont`: index p·(n−1), linear interpolation over the
    * same decimal-exact doubles). The HLL/approx twin lives in q15b. */
  val q29 = QueryDef("q29_percentiles",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.withColumn("price", dec(col("o_totalprice")).cast("double"))
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(price, 0.5)").as("p50"),
          expr("percentile(price, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 0.5) AS p50,
        quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 0.9) AS p90,
        COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Approx percentiles (GK sketch, `percentile_approx`) — the 100 TB
    * posture twin of q29: a mergeable fixed-size sketch instead of the
    * exact sort-based aggregate. Like q15b, sketches are not portable
    * across engines, so the driver records rows-only; the error bound vs
    * exact `percentile` is spec-asserted (CoreQueriesSpec). */
  val q29b = QueryDef("q29b_percentiles_approx",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.withColumn("price", dec(col("o_totalprice")).cast("double"))
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile_approx(price, 0.5, 10000)").as("p50_approx"),
          expr("percentile_approx(price, 0.9, 10000)").as("p90_approx"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    None)

  // ---------------------------------------------------------------- Q30
  /** collect_list / collect_set surface — wrapped in sort_array so the
    * nondeterministic accumulation order never reaches the output, then
    * joined to a CSV string: the driver's comparator canonicalizes rows via
    * pandas sort_values, which cannot hash ndarray cells, so list columns
    * must leave the query as scalars to stay gate-checkable. */
  val q30 = QueryDef("q30_collect",
    (s, dir) => {
      val c = t(s, dir, "customer")
      c.groupBy(col("c_mktsegment"))
        .agg(
          array_join(sort_array(collect_set(col("c_nationkey"))).cast("array<string>"), ",")
            .as("nations"),
          size(collect_list(col("c_nationkey"))).as("n_rows"),
          array_join(sort_array(collect_list(col("c_nationkey"))).cast("array<string>"), ",")
            .as("all_nations_sorted"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment,
        array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
        CAST(len(list(c_nationkey)) AS INTEGER) AS n_rows,
        array_to_string(list_sort(list(c_nationkey)), ',') AS all_nations_sorted
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  // ---------------------------------------------------------------- Q31
  /** Outer-join family: full outer of (customers ≤ 1000) vs (order counts
    * of custkeys ≥ 500) — exercises matched, left-only and right-only
    * rows; the coalesced key keeps the sort total and null-free. */
  val q31 = QueryDef("q31_full_outer_join",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_custkey") <= 1000)
        .select(col("c_custkey"), col("c_mktsegment"))
      val o = t(s, dir, "orders").filter(col("o_custkey") >= 500)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(
          coalesce(c("c_custkey"), o("o_custkey")).as("custkey"),
          c("c_mktsegment").as("segment"),
          o("n_orders"))
        .orderBy("custkey")
    },
    Some("""
      SELECT COALESCE(c_custkey, o_custkey) AS custkey,
             c_mktsegment AS segment, n_orders
      FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 1000) c
      FULL OUTER JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        WHERE o_custkey >= 500 GROUP BY o_custkey) o
      ON c_custkey = o_custkey
      ORDER BY custkey"""))

  // ---------------------------------------------------------------- Q32
  /** Explicit cross join (ref R4's syntactic form before the WHERE
    * rewrite): region × region pair matrix. */
  val q32 = QueryDef("q32_cross_join",
    (s, dir) => {
      val r = t(s, dir, "region")
      val a = r.select(col("r_name").as("r_a"))
      val b = r.select(col("r_name").as("r_b"))
      a.crossJoin(b).orderBy("r_a", "r_b")
    },
    Some("""
      SELECT a.r_name AS r_a, b.r_name AS r_b
      FROM region a CROSS JOIN region b
      ORDER BY r_a, r_b"""))

  // ---------------------------------------------------------------- Q33
  /** RANGE window frame: trailing-30-day spend per customer, ordered by
    * epoch micros (range frames need a numeric order key in Spark; ties
    * on order date are frame *peers* in both engines, so the result is
    * deterministic without a unique tiebreak). */
  val q33 = QueryDef("q33_range_frame",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val us30d = 30L * 86400 * 1000000
      val w = Window.partitionBy(col("o_custkey"))
        // parquet TIMESTAMP(isAdjustedToUTC=false) arrives as NTZ; cast to
        // LTZ (session tz = UTC) for unix_micros — same instant either way
        .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
        .rangeBetween(-us30d, 0)
      o.withColumn("trailing_30d", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("trailing_30d"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
          PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
          RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
      FROM orders
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  // ---------------------------------------------------------------- Q67
  /** Pivot: order counts + exact money totals per priority, statuses
    * spread into columns. The value list is EXPLICIT (`Seq("O","F","P")`)
    * — at 100 TB an unlisted pivot costs a full distinct-scan of the
    * pivot column before planning even starts, and makes the output
    * schema data-dependent; listing values keeps the plan a single
    * two-phase hash agg (Catalyst rewrites pivot to one `groupBy` with
    * `count/sum ... FILTER`-style branches — no join, no second pass).
    * Count cells for absent (priority, status) combos surface as 0 via
    * coalesce (Spark's pivot yields NULL there, the oracle's FILTER
    * count yields 0); sum cells stay NULL in both engines. */
  val q67 = QueryDef("q67_pivot",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(col("priority"),
          coalesce(col("O_n"), lit(0L)).as("n_o"), col("O_total").as("total_o"),
          coalesce(col("F_n"), lit(0L)).as("n_f"), col("F_total").as("total_f"),
          coalesce(col("P_n"), lit(0L)).as("n_p"), col("P_total").as("total_p"))
        .orderBy("priority")
    },
    Some("""
      SELECT o_orderpriority AS priority,
        COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
          FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS total_o,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
          FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_f,
        COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
          FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS total_p
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY priority"""))

  // ---------------------------------------------------------------- Q68
  /** Unpivot (melt): the wide per-returnflag measure table back to long
    * (flag, measure, value) form — the inverse reshape of q67. The wide
    * side is a 3-row aggregate, so the unpivot itself is a zero-shuffle
    * Expand over already-reduced data: reshape AFTER reducing, never
    * melt a raw 100 TB fact table (3× row inflation pre-aggregation). */
  val q68 = QueryDef("q68_unpivot",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val wide = l.groupBy(col("l_returnflag").as("flag"))
        .agg(dsum(col("l_quantity")).as("qty"),
          dsum(col("l_extendedprice")).as("price"),
          dsum(col("l_discount")).as("disc"))
      wide.unpivot(Array(col("flag")),
          Array(col("qty"), col("price"), col("disc")), "measure", "value")
        .orderBy("flag", "measure")
    },
    Some("""
      WITH wide AS (
        SELECT l_returnflag AS flag,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price,
          CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT flag, measure, value FROM (
        SELECT flag, 'qty' AS measure, qty AS value FROM wide
        UNION ALL SELECT flag, 'price', price FROM wide
        UNION ALL SELECT flag, 'disc', disc FROM wide)
      ORDER BY flag, measure"""))

  // --------------------------------------------------------------- q129
  /** Quantity-weighted price quantiles per return flag — each lineitem
    * row holds l_quantity units of mass, so the weighted p50 answers
    * "half the UNITS shipped cost at most this much per line", which
    * the row-counting q29 cannot say. Exact integer cents + integer
    * mass thresholds — fully hash-portable, unlike q29's quantile_cont
    * doubles. Exercises [[graft.api.GraftOps.weightedQuantiles]]. */
  val q129 = QueryDef("q129_weighted_quantiles",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      graft.api.GraftOps.weightedQuantiles(l, col("l_returnflag"),
          floor(col("l_extendedprice") * lit(100)).cast("long"),
          col("l_quantity").cast("long"),
          Seq(250000L, 500000L, 750000L, 990000L))
        .withColumnRenamed("group", "l_returnflag")
        .orderBy("l_returnflag", "q_ppm")
    },
    Some("""
      WITH b AS (
        SELECT l_returnflag AS g,
          CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
          CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_quantity > 0),
      m AS (
        SELECT g, v,
          CAST(sum(w) OVER (PARTITION BY g ORDER BY v) AS HUGEINT) AS cw,
          CAST(sum(w) OVER (PARTITION BY g) AS HUGEINT) AS tw
        FROM b),
      r AS (
        SELECT g, CAST(max(tw) AS BIGINT) AS w_total,
          min(CASE WHEN cw * 1000000 >= tw * 250000 THEN v END) AS p0,
          min(CASE WHEN cw * 1000000 >= tw * 500000 THEN v END) AS p1,
          min(CASE WHEN cw * 1000000 >= tw * 750000 THEN v END) AS p2,
          min(CASE WHEN cw * 1000000 >= tw * 990000 THEN v END) AS p3
        FROM m GROUP BY g)
      SELECT g AS l_returnflag, CAST(q_ppm AS BIGINT) AS q_ppm, wq, w_total
      FROM (
        SELECT g, w_total,
          unnest([250000, 500000, 750000, 990000]) AS q_ppm,
          unnest([p0, p1, p2, p3]) AS wq
        FROM r)
      ORDER BY l_returnflag, q_ppm"""))

  // --------------------------------------------------------------- q137
  /** Same statistic as q129 through the SKETCH TIER — histogram
    * bracketing + exact refinement instead of a full per-group sort —
    * and the same oracle gates it: the tier is bit-equal by
    * construction ([[graft.api.GraftOps.weightedQuantilesHist]]). A
    * small bucket count (64) at sf0.01 forces real multi-row
    * refinement windows, so the gate exercises the bracketing math,
    * not a degenerate one-row-per-bucket histogram. */
  val q137 = QueryDef("q137_weighted_quantiles_hist",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      graft.api.GraftOps.weightedQuantilesHist(l, col("l_returnflag"),
          floor(col("l_extendedprice") * lit(100)).cast("long"),
          col("l_quantity").cast("long"),
          Seq(250000L, 500000L, 750000L, 990000L), buckets = 64)
        .withColumnRenamed("group", "l_returnflag")
        .orderBy("l_returnflag", "q_ppm")
    },
    Some("""
      WITH b AS (
        SELECT l_returnflag AS g,
          CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
          CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_quantity > 0),
      m AS (
        SELECT g, v,
          CAST(sum(w) OVER (PARTITION BY g ORDER BY v) AS HUGEINT) AS cw,
          CAST(sum(w) OVER (PARTITION BY g) AS HUGEINT) AS tw
        FROM b),
      r AS (
        SELECT g, CAST(max(tw) AS BIGINT) AS w_total,
          min(CASE WHEN cw * 1000000 >= tw * 250000 THEN v END) AS p0,
          min(CASE WHEN cw * 1000000 >= tw * 500000 THEN v END) AS p1,
          min(CASE WHEN cw * 1000000 >= tw * 750000 THEN v END) AS p2,
          min(CASE WHEN cw * 1000000 >= tw * 990000 THEN v END) AS p3
        FROM m GROUP BY g)
      SELECT g AS l_returnflag, CAST(q_ppm AS BIGINT) AS q_ppm, wq, w_total
      FROM (
        SELECT g, w_total,
          unnest([250000, 500000, 750000, 990000]) AS q_ppm,
          unnest([p0, p1, p2, p3]) AS wq
        FROM r)
      ORDER BY l_returnflag, q_ppm"""))

  // --------------------------------------------------------------- q145
  /** Hottest supplier keys in lineitem with integer-ppm shares — the
    * pre-shuffle skew audit that sizes saltedJoin/AQE decisions.
    * Exercises [[graft.api.GraftOps.keySkewReport]]. Keys surface as
    * strings, so the (count desc, key asc) tie order is the STRING
    * order on both engines. */
  val q145 = QueryDef("q145_key_skew",
    (s, dir) =>
      graft.api.GraftOps.keySkewReport(t(s, dir, "lineitem"),
          col("l_suppkey"), topN = 20)
        .orderBy(desc("n"), col("key")),
    Some("""
      WITH c AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS key, COUNT(*) AS n
        FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        CAST(COUNT(*) AS BIGINT) AS n_keys FROM c)
      SELECT key, n, (n * 1000000) // n_rows AS ppm, n_rows, n_keys
      FROM c, t ORDER BY n DESC, key LIMIT 20"""))

  // --------------------------------------------------------------- q146
  /** Exact customer⋈orders cardinality WITHOUT executing the join —
    * key-count tables only, top contributing keys plus the global
    * exact join_rows. Exercises
    * [[graft.api.GraftOps.joinCardinalityReport]]. */
  val q146 = QueryDef("q146_join_cardinality",
    (s, dir) =>
      graft.api.GraftOps.joinCardinalityReport(
          t(s, dir, "customer"), col("c_custkey"),
          t(s, dir, "orders"), col("o_custkey"), topN = 20)
        .orderBy(desc("pairs"), col("key")),
    Some("""
      WITH la AS (
        SELECT CAST(c_custkey AS VARCHAR) AS key, COUNT(*) AS n_left
        FROM customer WHERE c_custkey IS NOT NULL GROUP BY 1),
      ra AS (
        SELECT CAST(o_custkey AS VARCHAR) AS key, COUNT(*) AS n_right
        FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
      m AS (SELECT key, n_left, n_right, n_left * n_right AS pairs
            FROM la JOIN ra USING (key)),
      t AS (SELECT CAST(SUM(pairs) AS BIGINT) AS join_rows,
        CAST(COUNT(*) AS BIGINT) AS n_keys_matched FROM m)
      SELECT key, n_left, n_right, pairs, join_rows, n_keys_matched
      FROM m, t ORDER BY pairs DESC, key LIMIT 20"""))

  // --------------------------------------------------------------- q147
  /** Dataset-card profile of orders: exact per-column null/distinct
    * counts in one aggregate pass. Exercises
    * [[graft.api.GraftOps.profileTable]]. */
  val q147 = QueryDef("q147_profile_table",
    (s, dir) =>
      graft.api.GraftOps.profileTable(t(s, dir, "orders"))
        .orderBy("ordinal"),
    Some("""
      WITH t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(o_orderkey) AS BIGINT) AS nn1,
          CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd1,
          CAST(COUNT(o_custkey) AS BIGINT) AS nn2,
          CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd2,
          CAST(COUNT(o_orderstatus) AS BIGINT) AS nn3,
          CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd3,
          CAST(COUNT(o_totalprice) AS BIGINT) AS nn4,
          CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd4,
          CAST(COUNT(o_orderdate) AS BIGINT) AS nn5,
          CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS nd5,
          CAST(COUNT(o_orderpriority) AS BIGINT) AS nn6,
          CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd6
        FROM orders)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS ordinal, 'o_orderkey' AS "column",
          n_rows, nn1 AS n_nonnull, n_rows - nn1 AS n_null, nd1 AS n_distinct FROM t
        UNION ALL SELECT 2, 'o_custkey', n_rows, nn2, n_rows - nn2, nd2 FROM t
        UNION ALL SELECT 3, 'o_orderstatus', n_rows, nn3, n_rows - nn3, nd3 FROM t
        UNION ALL SELECT 4, 'o_totalprice', n_rows, nn4, n_rows - nn4, nd4 FROM t
        UNION ALL SELECT 5, 'o_orderdate', n_rows, nn5, n_rows - nn5, nd5 FROM t
        UNION ALL SELECT 6, 'o_orderpriority', n_rows, nn6, n_rows - nn6, nd6 FROM t)
      ORDER BY ordinal"""))

  /** Approx (HLL++) profile tier — the 100 TB default for the dataset
    * card: no multi-distinct Expand, one map-side-combined pass. No
    * DuckDB hash parity (different sketch), driver records rows-only;
    * the relative-error bound vs q147's exact tier is spec-pinned. */
  val q147b = QueryDef("q147b_profile_table_approx",
    (s, dir) =>
      graft.api.GraftOps.profileTable(t(s, dir, "orders"), approx = true)
        .orderBy("ordinal"),
    None)

  // --------------------------------------------------------------- q157
  /** Dataset-card drift between two snapshots of orders: the current
    * side drops urgent orders, loses o_orderpriority, and gains a
    * derived o_year — so the report exercises all three statuses
    * (common columns with exact null-ppm/distinct deltas, one removed,
    * one added, missing sides NULL). Exercises
    * [[graft.api.GraftOps.profileDrift]] (two q147 single-aggregate
    * profile passes + a column-count-sized full-outer join). */
  val q157 = QueryDef("q157_profile_drift",
    (s, dir) => {
      val base = t(s, dir, "orders")
      val cur = base.filter(col("o_orderpriority") =!= "1-URGENT")
        .withColumn("o_year", year(col("o_orderdate")))
        .drop("o_orderpriority")
      graft.api.GraftOps.profileDrift(base, cur)
    },
    Some("""
      WITH bt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(o_orderkey) AS BIGINT) AS nn1,
          CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd1,
          CAST(COUNT(o_custkey) AS BIGINT) AS nn2,
          CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd2,
          CAST(COUNT(o_orderstatus) AS BIGINT) AS nn3,
          CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd3,
          CAST(COUNT(o_totalprice) AS BIGINT) AS nn4,
          CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd4,
          CAST(COUNT(o_orderdate) AS BIGINT) AS nn5,
          CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS nd5,
          CAST(COUNT(o_orderpriority) AS BIGINT) AS nn6,
          CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd6
        FROM orders),
      cr AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          o_orderdate, EXTRACT(YEAR FROM o_orderdate) AS o_year
        FROM orders WHERE o_orderpriority <> '1-URGENT'),
      ct AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(o_orderkey) AS BIGINT) AS nn1,
          CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd1,
          CAST(COUNT(o_custkey) AS BIGINT) AS nn2,
          CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd2,
          CAST(COUNT(o_orderstatus) AS BIGINT) AS nn3,
          CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd3,
          CAST(COUNT(o_totalprice) AS BIGINT) AS nn4,
          CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd4,
          CAST(COUNT(o_orderdate) AS BIGINT) AS nn5,
          CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS nd5,
          CAST(COUNT(o_year) AS BIGINT) AS nn6,
          CAST(COUNT(DISTINCT o_year) AS BIGINT) AS nd6
        FROM cr),
      pb AS (
        SELECT CAST(1 AS BIGINT) AS ordinal, 'o_orderkey' AS "column",
          n_rows, n_rows - nn1 AS n_null, nd1 AS n_distinct FROM bt
        UNION ALL SELECT 2, 'o_custkey', n_rows, n_rows - nn2, nd2 FROM bt
        UNION ALL SELECT 3, 'o_orderstatus', n_rows, n_rows - nn3, nd3 FROM bt
        UNION ALL SELECT 4, 'o_totalprice', n_rows, n_rows - nn4, nd4 FROM bt
        UNION ALL SELECT 5, 'o_orderdate', n_rows, n_rows - nn5, nd5 FROM bt
        UNION ALL SELECT 6, 'o_orderpriority', n_rows, n_rows - nn6, nd6 FROM bt),
      pc AS (
        SELECT CAST(1 AS BIGINT) AS ordinal, 'o_orderkey' AS "column",
          n_rows, n_rows - nn1 AS n_null, nd1 AS n_distinct FROM ct
        UNION ALL SELECT 2, 'o_custkey', n_rows, n_rows - nn2, nd2 FROM ct
        UNION ALL SELECT 3, 'o_orderstatus', n_rows, n_rows - nn3, nd3 FROM ct
        UNION ALL SELECT 4, 'o_totalprice', n_rows, n_rows - nn4, nd4 FROM ct
        UNION ALL SELECT 5, 'o_orderdate', n_rows, n_rows - nn5, nd5 FROM ct
        UNION ALL SELECT 6, 'o_year', n_rows, n_rows - nn6, nd6 FROM ct)
      SELECT COALESCE(pb."column", pc."column") AS "column",
        CASE WHEN pb."column" IS NULL THEN 'added'
             WHEN pc."column" IS NULL THEN 'removed'
             ELSE 'common' END AS status,
        pb.n_rows AS rows_base, pc.n_rows AS rows_cur,
        (pb.n_null * 1000000) // greatest(pb.n_rows, 1) AS null_ppm_base,
        (pc.n_null * 1000000) // greatest(pc.n_rows, 1) AS null_ppm_cur,
        (pc.n_null * 1000000) // greatest(pc.n_rows, 1)
          - (pb.n_null * 1000000) // greatest(pb.n_rows, 1) AS null_ppm_delta,
        pb.n_distinct AS distinct_base, pc.n_distinct AS distinct_cur,
        pc.n_distinct - pb.n_distinct AS distinct_delta
      FROM pb FULL OUTER JOIN pc ON pb."column" = pc."column"
      ORDER BY COALESCE(pc.ordinal, pb.ordinal),
        COALESCE(pb."column", pc."column")"""))

  // --------------------------------------------------------------- q132
  /** Price deciles within each order priority — exact integer
    * equal-frequency bins over (price, orderkey) total order, the
    * deterministic ntile. Exercises
    * [[graft.api.GraftOps.quantileBin]]. */
  val q132 = QueryDef("q132_quantile_bin",
    (s, dir) => {
      val o = t(s, dir, "orders")
      graft.api.GraftOps.quantileBin(
          o.select(col("o_orderkey"), col("o_orderpriority"),
            floor(col("o_totalprice") * lit(100)).cast("long").as("cents")),
          col("o_orderpriority"), col("cents"), col("o_orderkey"),
          nBins = 10)
        .select(col("o_orderkey"), col("o_orderpriority"), col("cents"),
          col("bin"))
        .orderBy("o_orderkey")
    },
    Some("""
      WITH b AS (
        SELECT o_orderkey, o_orderpriority,
          CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      r AS (
        SELECT o_orderkey, o_orderpriority, cents,
          CAST(row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
          CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
        FROM b)
      SELECT o_orderkey, o_orderpriority, cents,
        CAST(((rn - 1) * 10) // n + 1 AS INTEGER) AS bin
      FROM r ORDER BY o_orderkey"""))

  val all: Seq[QueryDef] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q07b, q08, q08b, q09, q09b, q10, q14, q15,
      q15b, q29, q29b, q30, q31, q32, q33, q67, q68, q129, q132, q137,
      q145, q146, q147, q147b, q157)
}
