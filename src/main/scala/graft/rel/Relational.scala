package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational headline queries over the TPC-H-ish tables — the 100 TB
  * scale-exercise surface (SURVEY.md §7.2 M7 "bench filler"; FIXTURES.md §B).
  *
  * Scale design notes (local[32] today, 1000 executors tomorrow):
  *  - Dimensions (`region` 5 rows, `nation` 25, `supplier` SF×100,
  *    `customer` SF×150k) are explicitly `broadcast()` below where they
  *    stay broadcastable at SF100k (region/nation always; supplier up to
  *    ~10 M rows is borderline so it is left to AQE).
  *  - Fact-fact joins (orders⋈lineitem) shuffle on the join key; both
  *    sides are pre-filtered/pruned so the exchange carries only needed
  *    columns, and AQE coalesces post-shuffle partitions.
  *  - All DOUBLE sums go through DECIMAL so partial-aggregate order can
  *    never perturb results (exact + associative), keeping the DuckDB
  *    oracle hash-stable.
  *  - Every money sum with scale > 2 is `round(_, 2)` on the EXACT
  *    decimal BEFORE the double cast (TPC-H answer format). Rationale:
  *    at sf10 a scale-6 sum carries 18 significant digits and the final
  *    decimal→double conversion of such a value rounds DIFFERENTLY
  *    across engines (measured: 1 ulp on q1's sum_charge). A scale-2
  *    decimal below 2^53 cents (~9e13 money units, sf1000 headroom)
  *    converts correctly-rounded and bit-identically on both engines.
  *    Scale-2 sums (sum_qty, totacctbal, q17's base-price sum) stay
  *    unrounded — their magnitude is proven under 2^53 cents at sf100
  *    (see DecimalCastLintSpec, which enforces both halves of this rule).
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** `price * (1 - discount)` in EXACT decimal arithmetic. The source
    * doubles carry 2-decimal values, so the decimal(18,2) cast is
    * unambiguous; from there every multiply is exact and associative —
    * the only way a distributed sum stays hash-identical to a single-node
    * oracle regardless of partial-aggregation order. */
  private def discPrice =
    dec(col("l_extendedprice")) * (lit(1.0).cast("decimal(3,2)") - dec(col("l_discount")))

  private def charge = discPrice * (lit(1.0).cast("decimal(3,2)") + dec(col("l_tax")))

  /** TPC-H Q1 pricing summary: single scan, map-side partial agg, one
    * shuffle on a 6-ish-row key space. */
  def q1(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // Q1's groups aggregate the WHOLE table (~15M rows/group at
        // sf10): sum_charge carries 18 significant digits at scale 6,
        // and the final decimal→double cast of such a value is rounded
        // DIFFERENTLY across engines (measured at sf10: 1 ulp,
        // 282529058707.1796 vs …17957). Decimal output columns are
        // barred by the driver harness (pandas coercion), so: round the
        // EXACT decimal to scale 2 first (HALF_UP on positive sums in
        // both engines — identical decimals), THEN cast. A scale-2
        // decimal below 2^53 cents converts to double correctly-rounded
        // on both engines (exact int→double, one IEEE division by 100),
        // so the doubles are bit-identical up to ~9e13 money units —
        // sf1000 headroom. avg_qty's operands (12-digit sum, count) are
        // already double-exact; the division is IEEE-identical.
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        round(sum(discPrice), 2).cast("double").as("sum_disc_price"),
        round(sum(charge), 2).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 shipping priority (no LIMIT — top-k with ties is not
    * hash-checkable): BUILDING customers' order revenue. `customer` is
    * small relative to the facts → broadcast hint; orders⋈lineitem is the
    * real shuffle and carries only 2–3 columns each side. */
  def q3(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("2000-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
  }

  /** TPC-H Q6 forecasting revenue change: the pure scan-speed query —
    * every predicate pushes to the parquet reader, one partial-agg row
    * per task, no shuffle worth the name. The plan to beat at 100 TB is
    * "read only the 4 referenced columns, skip row groups via stats". */
  def q6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
      .agg(round(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))), 2)
        .cast("double").as("revenue"))

  /** TPC-H Q10 returned-item reporting (trimmed to the synthetic schema:
    * no address/phone/comment columns; no LIMIT — top-k with ties is not
    * hash-checkable): revenue lost per customer on returned lineitems in
    * one quarter. Shape: two fact filters push to the scans, the
    * orders⋈lineitem shuffle carries 2-3 columns, customer join is left
    * to AQE (scales with SF), nation is always-broadcast. */
  def q10(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val nat = broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
  }

  /** TPC-H Q12-shaped shipping-priority audit. The synthetic lineitem has
    * no shipmode/commitdate/receiptdate, so this preserves Q12's ESSENCE —
    * fact-fact join + conditional counting of order priorities per
    * lineitem class — grouping by l_returnflag over one ship-year.
    * Both counts come from one pass (a single partial-agg shuffle). */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(high, 0).otherwise(1)).as("low_line_count"))
  }

  /** TPC-H Q18 large-volume customers (no LIMIT): the having-subquery
    * shape — orders whose total quantity exceeds a threshold, rejoined to
    * customer detail. The subquery is one partial-agg shuffle on
    * l_orderkey; its survivors are a small frame AQE broadcasts at low SF
    * and shuffle-joins at scale. */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    // One lineitem pass (r20): the HAVING subquery's per-order sum IS the
    // outer sum — o_orderkey is the order PK, so the old second lineitem
    // scan + join + re-aggregation recomputed sq for exactly the selected
    // orders. Reusing it is decimal-exact-identical (same rows, same
    // sum(dec(l_quantity)) in both formulations) and drops a full
    // lineitem scan and a lineitem-sized join from the plan.
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sq"))
      .filter(col("sq") > 250)
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("sq").cast("double").as("sum_qty"))
  }

  /** TPC-H Q4-shaped order-priority check — the EXISTS / left-semi
    * shape: orders in one year with at least one lineitem shipped more
    * than 60 days after the order date (the synthetic schema's stand-in
    * for commit<receipt lateness), counted per priority. The semi join
    * carries the non-equi lateness predicate alongside the key. */
  def q4(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q13 customer order-count distribution — the LEFT OUTER join +
    * double aggregation shape: customers keep a row even with zero
    * orders, then the counts themselves are histogrammed. */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q7-shaped volume shipping: revenue between two nations per
    * ship-year, in both directions — the dual-dimension join (supplier
    * nation × customer nation) + date-part grouping shape.
    *
    * Join ORDER is the scale lever here: the nation predicate keeps
    * 2/25 of suppliers and customers, so it is applied to the dims
    * FIRST and the filtered dims broadcast into the fact scans —
    * lineitem and orders are each cut to ~8% BEFORE the one real
    * shuffle (l_orderkey = o_orderkey). The original left-deep order
    * (li⋈ord first, nations last) shuffled the full fact tables and
    * measured 18.8× at the sf10→sf100 step; this order measures ~6×.
    * Catalyst cannot make this move itself without column stats — the
    * nation filter sits above three joins in the logical plan. */
  def q7(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_0", "NATION_1")
    val n1 = broadcast(Tables.nation(spark, dir)
      .filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, dir)
      .filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation")))
    val supp = broadcast(Tables.supplier(spark, dir)
      .select("s_suppkey", "s_nationkey")
      .join(n1, col("s_nationkey") === col("s_nkey"))
      .select(col("s_suppkey"), col("supp_nation")))
    val cust = broadcast(Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey")
      .join(n2, col("c_nationkey") === col("c_nkey"))
      .select(col("c_custkey"), col("cust_nation")))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
  }

  /** TPC-H Q14 promotion-effect ratio: one month's revenue share from
    * PROMO parts. Both the numerator (conditional sum) and denominator
    * are EXACT decimal sums, rounded to cents and cast to double before
    * the single division, so the ratio is bit-identical across engines
    * (see the round-then-cast note on [[q1]]); part is broadcast. */
  def q14(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg((round(sum(when(col("p_type") === "PROMO", discPrice)), 2)
        .cast("double") * lit(100.0) /
        round(sum(discPrice), 2).cast("double")).as("promo_revenue"))
  }

  /** TPC-H Q19-shaped discounted revenue: an OR of three
    * (brand ∧ size-range ∧ quantity-range) conjuncts spanning BOTH join
    * sides — the disjunctive-predicate shape. Catalyst cannot push the
    * whole OR to either scan, but it derives the per-side unions
    * (p_brand ∈ {…} to part, the l_quantity envelope to lineitem) so
    * both readers still skip; part is a true dimension → broadcast. */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    def branch(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    li.join(broadcast(part), col("p_partkey") === col("l_partkey"))
      .filter(branch("Brand#1", 1, 10, 1, 20) ||
        branch("Brand#13", 11, 25, 10, 30) ||
        branch("Brand#25", 26, 50, 20, 40))
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
  }

  /** TPC-H Q5-ish local-supplier revenue per nation: only the genuinely
    * tiny dimension chain region→nation (5 / 25 rows at every SF) is
    * explicitly broadcast; customer/supplier join selection is left to
    * AQE because they grow with SF. */
  def q5(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val dimNation = broadcast(
      nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name"))
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    // customer (SF×150k) and supplier (SF×10k) are NOT broadcast: at large
    // SF either would OOM driver+executors. AQE picks broadcast at small SF
    // on its own; at 100 TB these become shuffle joins on their keys.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(dimNation, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
  }

  /** nation⋈region pruned to one region and broadcast — the 25/5-row
    * dimension chain every regional query shares. */
  private def regionNations(spark: SparkSession, dir: String, rName: String) =
    broadcast(Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === rName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name"))

  /** TPC-H Q2-shaped minimum-cost supplier (no partsupp table in the
    * synthetic schema, so "cost" is the minimum observed lineitem price
    * per (part, supplier)): for small LARGE parts, the EUROPE suppliers
    * whose best offer ties the part's global minimum — the correlated-
    * scalar-min shape. The min frame is a second agg on the offers
    * themselves (no re-scan) and joins back on (part, exact decimal). */
  def q2(spark: SparkSession, dir: String): DataFrame = {
    val eur = regionNations(spark, dir, "EUROPE")
    val supp = Tables.supplier(spark, dir)
      .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
      .join(eur, col("s_nationkey") === col("n_nationkey"))
    val parts = Tables.part(spark, dir)
      .filter(col("p_size") <= 10 && col("p_type") === "LARGE")
      .select("p_partkey", "p_name")
    val offers = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"), col("n_name"))
      .agg(min(dec(col("l_extendedprice"))).as("offer"))
    val minOffer = offers.groupBy(col("p_partkey").as("mo_partkey"))
      .agg(min(col("offer")).as("min_offer"))
    offers.join(minOffer,
        col("p_partkey") === col("mo_partkey") && col("offer") === col("min_offer"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("offer").cast("double").as("offer"))
  }

  /** TPC-H Q8 national market share: NATION_3 suppliers' slice of ASIA
    * customers' STANDARD-part revenue per order year. Numerator and
    * denominator are one pass of EXACT decimal conditional sums; the
    * single double division happens after aggregation. */
  def q8(spark: SparkSession, dir: String): DataFrame = {
    val asia = regionNations(spark, dir, "ASIA").select(col("n_nationkey").as("c_nkey"))
    val suppN = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation")))
    val parts = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD").select("p_partkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val zero = lit(0).cast("decimal(18,2)")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(asia, col("c_nationkey") === col("c_nkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(suppN, col("s_nationkey") === col("s_nkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((round(sum(when(col("supp_nation") === "NATION_3", discPrice)
        .otherwise(zero)), 2).cast("double") /
        round(sum(discPrice), 2).cast("double")).as("mkt_share"))
  }

  /** TPC-H Q9-shaped product-type profit (no partsupp → supply cost is
    * the stand-in `p_retailprice * l_quantity`): profit by supplier
    * nation and order year for ECONOMY parts. The profit term stays in
    * exact decimal until the final cast. */
  def q9(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_type") === "ECONOMY").select("p_partkey", "p_retailprice")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name"))
    val amount = discPrice - dec(col("p_retailprice")) * dec(col("l_quantity"))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(amount), 2).cast("double").as("sum_profit"))
  }

  /** TPC-H Q11-shaped important parts: parts whose revenue share exceeds
    * 1.5× the average part's — the HAVING-against-global-scalar shape.
    * The threshold is value·nparts·10 > total·15 in EXACT decimal/integer
    * arithmetic (SF-independent, unlike Q11's literal fraction), and the
    * one-row global total broadcasts to the per-part frame. */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val pv = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_extendedprice", "l_discount")
      .groupBy(col("l_partkey"))
      .agg(sum(discPrice).as("value"))
    val total = pv.agg(sum(col("value")).as("total"), count(lit(1)).as("nparts"))
    pv.crossJoin(broadcast(total))
      .filter(col("value") * col("nparts") * 10 > col("total") * 15)
      .select(col("l_partkey"), round(col("value"), 2).cast("double").as("value"))
  }

  /** TPC-H Q15 top supplier: the max-over-an-aggregated-view shape — one
    * quarter's revenue per supplier, then the supplier(s) attaining the
    * maximum. The decimal equality join against the one-row max is
    * exact, so ties (all of them) surface identically on any engine. */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice).as("total_revenue"))
    val maxr = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(maxr))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_revenue"), 2).cast("double").as("total_revenue"))
  }

  /** TPC-H Q16-shaped parts/supplier relationship: distinct suppliers
    * per (brand, type, size) bucket, excluding "problem" suppliers
    * (negative balance — the synthetic stand-in for the comment filter).
    * The NOT-IN becomes a left-anti against a tiny broadcast frame; the
    * distinct-agg is the real shuffle and carries 4 narrow columns. */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val excl = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey").as("excl_suppkey"))
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("l_suppkey") === col("excl_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q17 small-quantity-order revenue: lineitems of one brand
    * whose quantity is below 20% of that part's average — the
    * correlated-average shape. The comparison is kept EXACT by clearing
    * the division: q < 0.2·(sumq/cnt) ⟺ q·5·cnt < sumq, all in
    * decimal×integer space, so no engine's rounding can flip a row. */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val brand = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#23").select("p_partkey")
    // The per-part average is only ever consumed for the brand's parts
    // (inner join below), so the aggregate is pre-filtered to them with
    // the same broadcast (r20, guide §3.2): the agg shuffle carries one
    // brand's lineitems instead of every part's, and the map-side filter
    // is a broadcast-hash probe at scan speed. Identical output — rows
    // for other parts never reached the join.
    val pa = Tables.lineitem(spark, dir).select("l_partkey", "l_quantity")
      .join(broadcast(brand), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("pa_partkey"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("l_quantity"))).as("sumq"))
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
      .join(pa, col("l_partkey") === col("pa_partkey"))
      .filter(dec(col("l_quantity")) * lit(5) * col("cnt") < col("sumq"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
        .as("avg_yearly"))
  }

  /** TPC-H Q20-shaped part promotion: EUROPE suppliers who shipped over
    * 100 units of PROMO parts in one year — the nested-IN shape as a
    * left-semi against a HAVING-filtered aggregate. */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val shipped = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("shipped_qty"))
      .filter(col("shipped_qty") > 100)
    val eur = regionNations(spark, dir, "EUROPE")
    Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_nationkey")
      .join(eur, col("s_nationkey") === col("n_nationkey"))
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "n_name")
  }

  /** TPC-H Q21-shaped suppliers who kept orders waiting: in finished
    * multi-supplier orders, the supplier who was the ONLY late one
    * (shipped > 60 days after the order date — the synthetic stand-in
    * for receipt > commit). The classic EXISTS + NOT-EXISTS double
    * correlation collapses to ONE per-order aggregate: distinct
    * suppliers, distinct late suppliers, and (when unique) the late
    * supplier itself — one shuffle instead of three self-joins of the
    * fact table, which is the difference between n and 3n exchange
    * volume at 100 TB. */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val ordF = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val lo = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ordF, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    // Two-level aggregation instead of two countDistincts (r20): the
    // distinct-agg rewrite EXPANDS every joined row 3× (one copy per
    // distinct expression + gid) and shuffles the tripled stream on a
    // 4-part key (measured: the Expand + both exchanges in the before
    // plan). Level 1 collapses to one row per (order, supplier) —
    // map-side combined, 1× the rows, 2-column key; level 2 reads the
    // three answers off it: distinct suppliers = group count, distinct
    // late suppliers = groups with any late row, min late supplier =
    // min over those groups. Exactly countDistinct semantics (suppkey
    // is non-null; when() yields NULL for never-late groups and
    // count/min skip NULLs).
    val perSupp = lo.groupBy(col("o_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("supp_late"))
    val per = perSupp.groupBy(col("o_orderkey"))
      .agg(count(col("l_suppkey")).as("n_supp"),
        count(when(col("supp_late"), col("l_suppkey"))).as("n_late"),
        min(when(col("supp_late"), col("l_suppkey"))).as("late_supp"))
    per.filter(col("n_supp") >= 2 && col("n_late") === 1)
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** TPC-H Q22-shaped global sales opportunity: in a 5-nation slice,
    * customers with above-(positive-)average balance and no order since
    * 2000 ("no orders at all" selects nobody in data where every
    * customer averages ten) — the scalar-average + NOT-EXISTS anti-join
    * shape, grouped by nation as the country code. The average
    * comparison clears the division (bal·cnt > tot, exact decimal). */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val sel = Tables.customer(spark, dir)
      .filter(col("c_nationkey").isin(0, 5, 10, 15, 20))
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val st = sel.filter(col("c_acctbal") > 0.0)
      .agg(sum(dec(col("c_acctbal"))).as("tot"), count(lit(1)).as("cnt"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    sel.crossJoin(broadcast(st))
      .filter(dec(col("c_acctbal")) * col("cnt") > col("tot"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
  }
}
