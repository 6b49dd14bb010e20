package graft.relational

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import java.sql.Timestamp

/** The relational core: the SQL surface the reference exposes through
  * Calcite over its HBase scan (reference: HBaseTable.kt:24-52 —
  * scan/filter/project pushed down, Calcite supplies joins/agg/sort).
  *
  * Spark-first: everything is declarative DataFrame API so Catalyst
  * performs pushdown, pruning, join selection, and AQE re-planning.
  * Oracle-parity conventions (driver compares vs DuckDB):
  *  - double aggregates go through exact DECIMAL sums, then cast to
  *    double (bit-for-bit reproducible across engines);
  *  - every query has a total deterministic ORDER BY;
  *  - every computed column is aliased identically in Spark + SQL.
  */
object Relational {

  /** Exact decimal sum surfaced as double: SUM(CAST(c AS DEC(18,s))) → double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private val ts = (s: String) => lit(Timestamp.valueOf(s + " 00:00:00"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, d) =>
      import s.implicits._
      // The discounted/taxed sums multiply in EXACT decimal space:
      // each factor is semantically a 2-dp value, so casting the
      // FACTORS to scale 2 is rounding-free and the product (≤6 dp)
      // is exact — every engine computes the identical decimal sum.
      // (The old double-multiply-then-cast form diverged at sf1.)
      // sum_charge is then rounded to 4 dp BEFORE the double cast:
      // at sf1 the 6-dp sum's scaled integer exceeds 2^53, and a
      // decimal→double conversion done as int/10^s double-rounds
      // (engine-dependent, one ulp) — at 4 dp the scaled integer is
      // exact in a double again, and the 4-dp rounding itself is
      // HALF_UP on the same exact decimal in both engines.
      val ep = $"l_extendedprice".cast(DecimalType(14, 2))
      val disc = (lit(1) - $"l_discount").cast(DecimalType(8, 2))
      val tax = (lit(1) + $"l_tax").cast(DecimalType(8, 2))
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= ts("1998-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          sum(ep * disc).cast("double").as("sum_disc_price"),
          round(sum(ep * disc * tax), 4).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    "q2_filter_project" -> { (s, d) =>
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_size" >= 20 && $"p_type" === "ECONOMY")
        .select($"p_partkey", $"p_name", $"p_retailprice")
        .orderBy($"p_partkey")
    },

    "q3_join_agg" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val o = Tables.orders(s, d).filter($"o_orderdate" < ts("1998-01-01"))
      val l = Tables.lineitem(s, d)
      // no broadcast hint on customer: it scales with SF (a filtered
      // slice is still billions of rows at 100 TB) — AQE broadcasts at
      // runtime when the slice is actually small
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },

    "q4_broadcast_join" -> { (s, d) =>
      import s.implicits._
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(dsum($"o_totalprice").as("total_sales"), count(lit(1)).as("n_orders"))
        .orderBy($"r_name", $"n_name")
    },

    "q5_semijoin" -> { (s, d) =>
      import s.implicits._
      val urgent = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
      Tables.customer(s, d)
        .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    },

    "q6_antijoin" -> { (s, d) =>
      import s.implicits._
      val f = Tables.orders(s, d).filter($"o_orderstatus" === "F")
      Tables.customer(s, d)
        .join(f, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },

    "q7_window" -> { (s, d) =>
      import s.implicits._
      val byPrice = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      val byDate = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(byPrice))
        .withColumn("running_spend",
          sum($"o_totalprice".cast(DecimalType(18, 2))).over(byDate).cast("double"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"rn", $"running_spend")
        .orderBy($"o_custkey", $"rn", $"o_orderkey")
    },

    "q8_distinct" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          countDistinct($"l_orderkey").as("n_orders"))
        .orderBy($"l_returnflag")
    },

    "q9_setops" -> { (s, d) =>
      import s.implicits._
      val building = Tables.customer(s, d)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k"))
      val open = Tables.orders(s, d)
        .filter($"o_orderstatus" === "O").select($"o_custkey".as("k"))
      val i = building.intersect(open).withColumn("op", lit("intersect"))
      val e = building.except(open).withColumn("op", lit("except"))
      i.unionAll(e).select($"op", $"k").orderBy($"op", $"k")
    },

    "q10_topk" -> { (s, d) =>
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_type".isin("PROMO", "LARGE"))
        .select($"p_partkey", $"p_name", $"p_brand", $"p_retailprice")
        .orderBy($"p_retailprice".desc, $"p_partkey")
        .limit(15)
    },

    "q11_having" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .groupBy($"c_mktsegment")
        .agg((dsum($"c_acctbal") / count(lit(1))).as("avg_bal"), count(lit(1)).as("n"))
        .filter($"n" > 25)
        .orderBy($"c_mktsegment")
    },

    "q12_case_expr" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("prio_class",
          when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), "hi").otherwise("lo"))
        .withColumn("yr", year($"o_orderdate"))
        .groupBy($"yr", $"prio_class")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
        .orderBy($"yr", $"prio_class")
    },

    "q13_in_subquery" -> { (s, d) =>
      import s.implicits._
      val keys = Tables.part(s, d).filter($"p_brand" === "Brand#13").select($"p_partkey")
      Tables.lineitem(s, d)
        .join(keys, $"l_partkey" === $"p_partkey", "left_semi")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("total"))
    },

    "q14_scalar_subquery" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val avgPrice = li.agg((dsum($"l_extendedprice") / count(lit(1))).as("a"))
      li.crossJoin(broadcast(avgPrice))
        .filter($"l_extendedprice" > lit(1.5) * $"a")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_expensive"))
        .orderBy($"l_returnflag")
    },

    "q15_rollup" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    "q16_cube_groupingsets" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(
          grouping($"o_orderstatus").cast("int").as("g_status"),
          grouping($"o_orderpriority").cast("int").as("g_prio"),
          count(lit(1)).as("n"))
        .orderBy($"g_status", $"g_prio",
          $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    },

    "q17_self_join" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
      val hi = o.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey".as("k"), $"o_orderkey".as("hi_key"))
      val lo = o.filter($"o_orderpriority" === "5-LOW")
        .select($"o_custkey".as("k"), $"o_orderkey".as("lo_key"))
      hi.join(lo, "k")
        .groupBy($"k").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"k")
    },

    "q18_cross_small" -> { (s, d) =>
      import s.implicits._
      val r = Tables.region(s, d).select($"r_name")
      val n = Tables.nation(s, d).select($"n_name")
      r.crossJoin(n).orderBy($"r_name", $"n_name")
    },

    "q19_left_outer" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d).filter($"c_custkey" <= 100)
      val o = Tables.orders(s, d).filter($"o_orderstatus" === "F")
      c.join(o, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey", $"c_name")
        .agg(count($"o_orderkey").as("n_f_orders"),
          coalesce(dsum($"o_totalprice"), lit(0.0)).as("f_total"))
        .orderBy($"c_custkey")
    },

    "q20_full_outer" -> { (s, d) =>
      import s.implicits._
      val a = Tables.orders(s, d).filter($"o_custkey" < 50)
        .groupBy($"o_custkey".as("k")).agg(count(lit(1)).as("n_orders"))
      val b = Tables.customer(s, d)
        .filter($"c_custkey" >= 25 && $"c_custkey" < 75)
        .select($"c_custkey".as("k"), $"c_name")
      a.join(b, Seq("k"), "full_outer")
        .select($"k", coalesce($"n_orders", lit(0L)).as("n_orders"),
          coalesce($"c_name", lit("<none>")).as("c_name"))
        .orderBy($"k")
    },

    "q21_percentile" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"))
        .orderBy($"o_orderstatus")
    },

    "q22_offset_page" -> { (s, d) =>
      import s.implicits._
      Tables.part(s, d)
        .select($"p_partkey", $"p_name", $"p_retailprice")
        .orderBy($"p_retailprice".desc, $"p_partkey")
        .offset(10).limit(5)
    },

    "q23_complex_pred" -> { (s, d) =>
      import s.implicits._
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(p, $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
            $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) &&
            $"l_quantity".between(10, 20)) ||
          ($"p_type" === "PROMO" && $"l_discount" >= 0.05))
        .agg(count(lit(1)).as("n"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
    },

    "q25_groupwise_max" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
      val maxPerCust = o.groupBy($"o_custkey".as("k"))
        .agg(max($"o_totalprice").as("max_price"))
      o.join(maxPerCust,
          $"o_custkey" === $"k" && $"o_totalprice" === $"max_price")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"o_orderkey")
    },

    "q29_skew_agg" -> { (s, d) =>
      import s.implicits._
      // two-phase salted aggregation (operators.Skew): the hot-key
      // GROUP BY shape — scatter over salt sub-keys, partial agg,
      // finish per key. Decimal sums, so the salted partial order
      // can't perturb the result vs the plain GROUP BY oracle.
      val li = Tables.lineitem(s, d)
        .withColumn("qty", $"l_quantity".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
      graft.operators.Skew.saltedSumCount(li, Seq("l_returnflag"), "qty", salt = 8)
        .select($"l_returnflag", $"sum_qty".cast("double").as("sum_qty"), $"n")
        .orderBy($"l_returnflag")
    },

    "q28_pivot" -> { (s, d) =>
      import s.implicits._
      // PIVOT: order counts + total price per priority, one column per
      // status. Explicit pivot values keep it one pass (no distinct
      // pre-scan) — the rule for pivoting at scale.
      val pivoted = Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      // empty pivot cells are NULL in Spark but 0 under the oracle's
      // COUNT FILTER — normalize counts (sums stay NULL both sides)
      Seq("F_n", "O_n", "P_n")
        .foldLeft(pivoted)((df, c) => df.withColumn(c, coalesce(col(c), lit(0L))))
        .orderBy($"o_orderpriority")
    },

    "q26_exists_corr" -> { (s, d) =>
      import s.implicits._
      val heavy = Tables.lineitem(s, d).filter($"l_quantity" > 45)
        .select($"l_orderkey")
      Tables.orders(s, d)
        .join(heavy, $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey")
    },

    "q27_window_nav" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .withColumn("days_since_prev",
          datediff($"o_orderdate", lag($"o_orderdate", 1).over(w)))
        .withColumn("next_key", lead($"o_orderkey", 1).over(w))
        .withColumn("quartile", ntile(4).over(
          Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")))
        .filter($"o_custkey" < 30)
        .select($"o_custkey", $"o_orderkey", $"days_since_prev", $"next_key", $"quartile")
        .orderBy($"o_custkey", $"o_orderkey")
    },

    "q24_string_funcs" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .filter($"c_custkey" <= 50)
        .select($"c_custkey",
          upper(substring($"c_name", 10, 9)).as("id_part"),
          concat_ws("-", $"c_mktsegment", $"c_nationkey".cast("string")).as("seg_nat"),
          length($"c_name").as("name_len"),
          $"c_name".like("%001%").as("has_001"),
          regexp_extract($"c_name", "([0-9]+)$", 1).as("trailing_num"))
        .orderBy($"c_custkey")
    },

    "q30_interval_join" -> { (s, d) =>
      import s.implicits._
      // Non-equi interval join via bucket decomposition
      // (operators.RangeJoin): each order opens a 1-8 day follow-up
      // window; count/total the other same-priority orders placed
      // inside it. A naive Spark plan for the pure range predicate is
      // a nested-loop join; the bucketed form is an equi-join on
      // (priority, time-bucket) + in-bucket range filter — shuffled,
      // partitionable, 100 TB-safe. Because the query only needs
      // per-interval count/sum, the point side is pre-aggregated to
      // (priority, day) partials BEFORE the join — the join touches
      // ~|days| rows instead of ~|orders| (×10 less here) and the
      // self-match is subtracted exactly afterwards (the order's own
      // day always falls inside its own window). Day numbers are
      // exact ints and all sums are DECIMAL, so the oracle matches
      // bit-for-bit.
      val day = datediff($"o_orderdate".cast("date"),
        lit("1990-01-01").cast("date")).cast("long")
      val o = Tables.orders(s, d)
      val ivs = o.select($"o_orderkey".as("iv_key"),
          $"o_orderpriority".as("prio"), day.as("start_d"),
          $"o_totalprice".cast(DecimalType(18, 2)).as("own_price"))
        .withColumn("end_d", $"start_d" + ($"iv_key" % 7) + lit(1L))
      val daily = o.groupBy($"o_orderpriority".as("prio"), day.as("pt_d"))
        .agg(count(lit(1)).as("day_n"),
          sum($"o_totalprice".cast(DecimalType(18, 2))).as("day_total"))
      graft.operators.RangeJoin.intervalJoin(ivs, daily,
          "start_d", "end_d", "pt_d", Seq("prio"), bucketWidth = 8L)
        .groupBy($"iv_key")
        .agg((sum($"day_n") - 1L).as("n_in_window"),
          (sum($"day_total") - max($"own_price")).cast("double").as("window_total"))
        .filter($"n_in_window" > 0)
        .orderBy($"iv_key")
    },

    "q31_unnest" -> { (s, d) =>
      import s.implicits._
      // Array generation + UNNEST (the Calcite surface's generated-
      // column/lateral family): each order fans out into an
      // installment schedule of k = orderkey%4 + 1 equal monthly
      // payments — sequence() + explode() is Spark's lateral unnest,
      // a pure map-side row multiplier (no shuffle until the final
      // small agg). Installments divide in integer CENTS (floor) —
      // round(price/k, 2) would tie at exact half-cents for k=2 and
      // Spark (shortest-repr HALF_UP) and DuckDB (binary) break
      // those ties differently; integer division is exact everywhere.
      val o = Tables.orders(s, d)
        .select($"o_orderkey",
          ($"o_totalprice".cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"),
          (($"o_orderkey" % 4) + 1).cast("int").as("k"))
      o.select(explode(sequence(lit(1), $"k")).as("m"),
          expr("cents div k").as("ic"))
        .groupBy($"m")
        .agg(count(lit(1)).as("n_orders"),
          ((sum($"ic")).cast("double") / 100.0).as("total_installment"))
        .orderBy($"m")
    },

    "q32_range_frame" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // RANGE-frame window (value-based sliding frame — the frame
      // family q7/q27's ROWS frames don't cover): per order, the
      // customer's trailing-30-day order count and spend, the frame
      // bounded by DAY VALUE so gaps in order history shrink it and
      // same-day peers stay excluded (frame ends at -1). One shuffle
      // on the partition key; day numbers are exact ints and sums
      // are DECIMAL, so the oracle matches bit-for-bit.
      val day = datediff($"o_orderdate".cast("date"),
        lit("1990-01-01").cast("date")).cast("long")
      val o = Tables.orders(s, d).select($"o_custkey", $"o_orderkey",
        day.as("dd"), $"o_totalprice".cast(DecimalType(18, 2)).as("price"))
      val w = Window.partitionBy($"o_custkey").orderBy($"dd")
        .rangeBetween(-30, -1)
      o.select($"o_custkey", $"o_orderkey", $"dd",
          count($"price").over(w).as("n_prior_30d"),
          coalesce(sum($"price").over(w),
            lit(0).cast(DecimalType(18, 2))).cast("double")
            .as("total_prior_30d"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      // factors cast to their true 2-dp scale, product exact in
      // decimal — mirrors the Spark side (see q1_agg above)
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        |           * CAST(1-l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        |           * CAST(1-l_discount AS DECIMAL(8,2))
        |           * CAST(1+l_tax AS DECIMAL(8,2))), 4) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_size >= 20 AND p_type = 'ECONOMY' ORDER BY p_partkey""".stripMargin,

    "q3_join_agg" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q4_broadcast_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q5_semijoin" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q6_antijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q7_window" ->
      """SELECT o_custkey, o_orderkey, rn, running_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn, o_orderkey""".stripMargin,

    "q8_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q9_setops" ->
      """SELECT op, k FROM (
        |  SELECT 'intersect' AS op, k FROM (
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |    INTERSECT
        |    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
        |  UNION ALL
        |  SELECT 'except' AS op, k FROM (
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |    EXCEPT
        |    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'))
        |ORDER BY op, k""".stripMargin,

    "q10_topk" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
        |WHERE p_type IN ('PROMO','LARGE')
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 15""".stripMargin,

    "q11_having" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_mktsegment HAVING COUNT(*) > 25
        |ORDER BY c_mktsegment""".stripMargin,

    "q12_case_expr" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hi' ELSE 'lo' END AS prio_class,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY yr, prio_class ORDER BY yr, prio_class""".stripMargin,

    "q13_in_subquery" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13')""".stripMargin,

    "q14_scalar_subquery" ->
      """SELECT l_returnflag, COUNT(*) AS n_expensive FROM lineitem
        |WHERE l_extendedprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q15_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q16_cube_groupingsets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |  COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q17_self_join" ->
      """SELECT hi.o_custkey AS k, COUNT(*) AS n_pairs
        |FROM (SELECT o_custkey, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') hi
        |JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_orderpriority = '5-LOW') lo
        |  ON hi.o_custkey = lo.o_custkey
        |GROUP BY hi.o_custkey ORDER BY k""".stripMargin,

    "q18_cross_small" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q19_left_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_f_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS f_total
        |FROM customer LEFT OUTER JOIN orders
        |  ON c_custkey = o_custkey AND o_orderstatus = 'F'
        |WHERE c_custkey <= 100
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q20_full_outer" ->
      """SELECT COALESCE(a.k, b.k) AS k,
        |  COALESCE(a.n_orders, 0) AS n_orders,
        |  COALESCE(b.c_name, '<none>') AS c_name
        |FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders
        |      WHERE o_custkey < 50 GROUP BY o_custkey) a
        |FULL OUTER JOIN (SELECT c_custkey AS k, c_name FROM customer
        |      WHERE c_custkey >= 25 AND c_custkey < 75) b
        |  ON a.k = b.k
        |ORDER BY k""".stripMargin,

    "q21_percentile" ->
      """SELECT o_orderstatus,
        |  ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q22_offset_page" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 5 OFFSET 10""".stripMargin,

    "q23_complex_pred" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_type = 'PROMO' AND l_discount >= 0.05)""".stripMargin,

    "q25_groupwise_max" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
        |WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q29_skew_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q28_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS F_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS F_total,
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS O_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS O_total,
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS P_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS P_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q26_exists_corr" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "q27_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(datediff('day', lag(o_orderdate) OVER wd, o_orderdate) AS INT)
        |    AS days_since_prev,
        |  lead(o_orderkey) OVER wd AS next_key,
        |  CAST(ntile(4) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
        |FROM orders
        |WHERE o_custkey < 30
        |WINDOW wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q24_string_funcs" ->
      """SELECT c_custkey,
        |  upper(substring(c_name, 10, 9)) AS id_part,
        |  concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  c_name LIKE '%001%' AS has_001,
        |  regexp_extract(c_name, '([0-9]+)$', 1) AS trailing_num
        |FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey""".stripMargin,

    "q30_interval_join" ->
      """WITH d AS (SELECT o_orderkey, o_orderpriority,
        |    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS dd,
        |    o_totalprice
        |  FROM orders),
        |iv AS (SELECT o_orderkey AS iv_key, o_orderpriority AS prio,
        |    dd AS start_d, dd + (o_orderkey % 7) + 1 AS end_d
        |  FROM d)
        |SELECT iv_key, COUNT(*) AS n_in_window,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS window_total
        |FROM iv JOIN d ON d.o_orderpriority = iv.prio
        |  AND d.dd BETWEEN iv.start_d AND iv.end_d
        |  AND d.o_orderkey <> iv.iv_key
        |GROUP BY iv_key ORDER BY iv_key""".stripMargin,

    "q31_unnest" ->
      """WITH inst AS (
        |  SELECT CAST(unnest(generate_series(1, (o_orderkey % 4) + 1))
        |      AS INT) AS m,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      // ((o_orderkey % 4) + 1) AS ic
        |  FROM orders)
        |SELECT m, COUNT(*) AS n_orders,
        |  CAST(SUM(ic) AS DOUBLE) / 100 AS total_installment
        |FROM inst GROUP BY m ORDER BY m""".stripMargin,

    "q32_range_frame" ->
      """WITH d AS (SELECT o_custkey, o_orderkey,
        |    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS dd,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, dd,
        |  COUNT(price) OVER w AS n_prior_30d,
        |  CAST(COALESCE(SUM(price) OVER w, 0) AS DOUBLE) AS total_prior_30d
        |FROM d
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY dd
        |  RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
  )
}
