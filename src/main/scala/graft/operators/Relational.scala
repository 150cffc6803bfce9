package graft.operators

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, FloatType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The relational operator surface (SURVEY.md §2.2-§2.8) expressed as
  * named query builders over the fixture tables. Reference lineage:
  * IN-list filter + projection mirror the Logstash `terms` + `_source`
  * queries (`logstash/pipeline/csv-tech.conf:13-17`); the dim joins
  * mirror the departement⋈region lookup
  * (`ingestion-francetravail/ingestion-elasticsearch.py:148`) and the
  * departement×métier matrix (`:180-181`); the grouped counts mirror
  * the per-key fetch-plan probes (`:142-146,176-178,206-209`); the
  * date-histogram/cardinality aggs are the Kibana dashboard surface
  * (`README.md:8-9`).
  *
  * Design rules applied throughout:
  *  - money arithmetic is done in `decimal(18,2)` (exact — the fixture
  *    values are 2-decimal) and only the *final* aggregate is cast to
  *    double, so results are bit-identical to any exact-arithmetic oracle
  *    regardless of partial-aggregation order at any scale;
  *  - every query ends in a deterministic `orderBy` over a unique key so
  *    row order is reproducible;
  *  - dimension joins are explicitly `broadcast()` (region/nation/
  *    supplier-sized sides), fact-fact joins are left to Catalyst/AQE —
  *    at 100 TB those become sort-merge on the join key, which is the
  *    right plan;
  *  - filters/projections are applied directly on the scan so Catalyst
  *    pushes them into parquet (`PushedFilters`/`ReadSchema`).
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** A2/A4: grouped pricing summary over lineitem (partial+final hash agg;
    * map-side combine makes this shuffle-light at any scale).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** P1+P2: projection + IN-list predicate, pushed to the parquet scan
    * (the reference's `_source` + `terms` query, `csv-tech.conf:13-17`).
    */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** J1+A2: revenue per nation — fact⋈fact shuffle join (orders⋈lineitem)
    * then broadcast dim joins (customer is mid-size: Catalyst/AQE decides;
    * nation is broadcast explicitly).
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** J1: dim⋈dim broadcast chain (the reference's departement⋈region
    * nested-loop, `ingestion-elasticsearch.py:148`).
    */
  def customersPerRegion(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
           sum(dec(col("c_acctbal"))).cast("double").as("sum_acctbal"))
      .orderBy(col("r_name"))
  }

  /** J2: cross join (the reference's departement×métier fetch matrix,
    * `ingestion-elasticsearch.py:180-181`). Dim×dim only — never a fact.
    */
  def regionSupplierMatrix(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).select(col("r_name"))
    val s = Tables.supplier(spark, dir).select(col("s_name"))
    r.crossJoin(broadcast(s)).orderBy(col("r_name"), col("s_name"))
  }

  /** Left-semi join: customers having at least one urgent order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-anti join: customers who never placed an urgent order. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** §2.6 top-k: orderBy+limit plans as TakeOrderedAndProject (per-
    * partition heap + driver merge — no global sort, no full shuffle).
    */
  def topKOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  /** §2.8 ranking window: most recent order per customer (the "top-N per
    * group" shape; one shuffle on the partition key).
    */
  def latestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** §2.8 analytic window: running revenue per supplier over ship date
    * (frame = unbounded preceding..current row), plus lag delta.
    */
  def runningSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 10)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), dec(col("l_extendedprice")).as("price_d"))
      .withColumn("running_rev", sum(col("price_d")).over(wRun).cast("double"))
      .withColumn("prev_price", lag(col("price_d"), 1).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("running_rev"), col("prev_price"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** §2.7 set ops: union of two disjoint priority slices (the reference's
    * union-of-page-batches S4), then distinct count by status.
    */
  def unionSlices(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val hi = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    val lo = o.filter(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    hi.unionByName(lo)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** §2.7: intersect — customer keys present in both BUILDING and urgent-
    * order populations.
    */
  def intersectKeys(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    building.intersect(urgent).orderBy(col("c_custkey"))
  }

  /** §2.7: except — BUILDING customers that never placed an urgent order. */
  def exceptKeys(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    building.except(urgent).orderBy(col("c_custkey"))
  }

  /** §2.4: ROLLUP over (region, mktsegment) — hierarchical subtotals. */
  def rollupCounts(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("r_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
  }

  /** §2.4: CUBE over (returnflag, linestatus). */
  def cubeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** §2.4: exact distinct aggregation (countDistinct plans expand+two-
    * phase agg; exact — the approx variant is a separate rows-only query).
    */
  def distinctCustomersPerPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** A4: Kibana-style date histogram — monthly order counts + exact
    * revenue (date_trunc month; group-by-time-bucket, not a SQL window).
    */
  def monthlyOrderStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
           sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy(col("month"))

  /** F11: JSON extraction from the events props payload. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") >= 50)
      .orderBy(col("event_id"))

  /** CASE/conditional expression + multi-way agg (F-series scalar surface). */
  def orderSizeBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("bucket",
        when(col("o_totalprice") < 50000.0, "small")
          .when(col("o_totalprice") < 200000.0, "medium")
          .otherwise("large"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           min(col("o_totalprice")).as("min_price"),
           max(col("o_totalprice")).as("max_price"))
      .orderBy(col("bucket"))

  /** S6 analog: keyed upsert — latest event per (user_id, event_type) key
    * (dedup-by-key keeping the newest, the `_id` bulk-upsert semantics).
    */
  def keyedUpsertLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** §2.10: custom typed `Aggregator` — top-3 orders per priority with a
    * bounded map-side buffer (shuffles ≤k rows per group per partition,
    * not every row like the window formulation; the scale-out shape for
    * top-N-per-group over 100 TB).
    */
  def topOrdersPerPriorityAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.functions.Aggregators.topK(3).toColumn.name("ids"))
      .toDF("o_orderpriority", "ids")
      .select(col("o_orderpriority"), posexplode(col("ids")).as(Seq("pos", "o_orderkey")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rank"), col("o_orderkey"))
      .orderBy(col("o_orderpriority"), col("rank"))
  }

  /** A4: HLL-sketch cardinality (`approx_count_distinct`) — the ES
    * `cardinality` aggregation analog. Approximate → rows-only check.
    */
  def approxDistinctParts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
           approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"))
      .orderBy(col("l_returnflag"))

  /** The engine's SQL surface: one SQL text, valid verbatim in BOTH
    * Spark SQL and the DuckDB oracle (TPC-H Q3 shape — shipping
    * priority). Views are registered per-call; Catalyst plans it like
    * any DataFrame query.
    */
  val shippingPrioritySql: String =
    """SELECT o_orderkey,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      | o_orderdate
      |FROM customer
      | JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(shippingPrioritySql)
  }

  /** F11: schema-directed JSON parse (`from_json`) of the events props
    * payload, grouped on the extracted field.
    */
  def fromJsonEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
        .getField("k").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k"))

  /** q65: the VARIANT path for the same semi-structured payload —
    * `parse_json` shreds the string ONCE into Spark 4's binary variant
    * encoding, then `variant_get` does typed path extraction on the
    * binary form. At 100 TB this is the semi-structured answer that
    * scales: parse cost is paid once at ingest (variant columns
    * persist to parquet shredded), every downstream query extracts
    * fields without re-tokenizing JSON text, and unlike `from_json`
    * no up-front struct schema is needed. Oracle = q25's (both must
    * agree with DuckDB's json_extract).
    */
  def variantEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(parse_json(col("props")).as("v"))
      .select(variant_get(col("v"), "$.k", "int").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k"))

  /** q67: EXACT distinct via mergeable bitmaps — the re-aggregatable
    * alternative to `count(DISTINCT x)`. Keys hash to (bucket,
    * position); `bitmap_construct_agg` builds one bitmap per
    * (group, bucket) map-side, and because buckets partition the key
    * space the per-bucket counts SUM to the exact distinct count. At
    * 100 TB this shape is what `count(DISTINCT)` isn't: partials are
    * small fixed-size bitmaps that merge associatively (`bitmap_or_agg`),
    * so per-day bucket bitmaps can be PERSISTED and unioned across
    * arbitrary slices (the q60 incremental-maintenance pattern applied
    * to distinct counts) instead of re-scanning raw keys — exactness
    * without HLL's error bar. Oracle = plain COUNT(DISTINCT).
    */
  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        expr("bitmap_bucket_number(o_custkey)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
        .as("bm"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(expr("bitmap_count(bm)")).as("n_custs"))
      .orderBy(col("o_orderpriority"))

  /** q84: KMV (k-minimum-values) distinct sketch — the ENGINE-PORTABLE
    * approximate-distinct that q23's HLL cannot be: the sketch state is
    * the k smallest DISTINCT md5-60-bit key hashes per group, and the
    * estimator (k−1)·2^60 / h_k (h_k = k-th smallest hash) touches a
    * double exactly once, so DuckDB reproduces the whole computation —
    * including the estimate — bit for bit (the constant 63·2^60 is 6
    * significant bits × a power of two, hence exact; h_k rounds
    * long→double identically on both engines). Groups with fewer than
    * k distinct keys hold the entire key set and report the exact
    * count (the standard KMV degenerate rule). Exact per-group
    * distinct rides along as the error evidence — the spec pins
    * relative error ≤ 3/√k.
    *
    * Scale shape: the gate form uses one per-group window for the
    * k-smallest (fine for bounded group counts); the 100 TB form is a
    * mergeable bounded top-k aggregate (the `Aggregators.TopKAgg`
    * shape — per-partition k smallest, associative merge), identical
    * estimator. KMV sketches union by keeping the k smallest of the
    * merged sets — the same persist-partials pattern as q67's bitmaps,
    * with fixed k·8-byte state instead of key-space-sized bitmaps.
    */
  def kmvDistinct(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val hashed = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("prio"),
        expr("cast(conv(substr(md5(cast(cast(o_custkey as string) as binary)), 1, 15), 16, 10) as bigint)").as("h"))
      .distinct()
    val w = Window.partitionBy(col("prio")).orderBy(col("h"))
    val sketch = hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("prio"))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("n_kept"))
    val exact = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    sketch.join(exact, "prio")
      .select(col("prio"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * 1152921504606846976.0d) / col("h_k").cast("double"))
          .as("est_distinct"),
        col("n_exact"))
      .orderBy(col("prio"))
  }

  /** q89: pairwise overlap matrix in SKETCH space — audience overlap
    * between the order-priority customer sets estimated by KMV set
    * algebra: per-slice sketch = q84's k smallest distinct md5-60-bit
    * key hashes; a pair's union sketch = k smallest of the two merged
    * hash sets; |A∩B| ≈ est(A) + est(B) − est(A∪B) (inclusion-
    * exclusion on the estimators, clamped at 0). Every input to every
    * estimate is a deterministic md5-derived integer, so — unlike any
    * engine-internal sketch — the whole overlap matrix hash-checks in
    * DuckDB (the q84 portability argument, extended to set algebra).
    *
    * Scale shape: the corpus is scanned ONCE to build per-slice
    * sketches (bounded window per group; the mergeable-top-k aggregate
    * at 100 TB, see q84); all |G|²/2 pairwise estimates then touch
    * ONLY sketch rows (≤ k per slice) — estimating a 100×100 slice
    * overlap matrix costs 100 sketches + a driver-sized merge, where
    * exact pairwise `count(DISTINCT)` would be 4950 corpus-wide joins.
    * The exact intersection rides along as error evidence (feasible at
    * 5 slices; at scale it is exactly what you would NOT compute).
    */
  def kmvOverlap(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val hashed = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("prio"),
        expr("cast(conv(substr(md5(cast(cast(o_custkey as string) as binary)), 1, 15), 16, 10) as bigint)").as("h"))
      .distinct()
    val w = Window.partitionBy(col("prio")).orderBy(col("h"))
    val skRows = hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select(col("prio"), col("h"))
      .localCheckpoint() // |slices|·k rows, consumed three times below
    val perGroup = skRows.groupBy(col("prio"))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("n_kept"))
    def est(hk: Column, nk: Column): Column =
      when(nk < k, nk.cast("double"))
        .otherwise(lit((k - 1).toDouble * 1152921504606846976.0d) / hk.cast("double"))

    val pairs = perGroup
      .select(col("prio").as("prio_a"), col("h_k").as("h_a"), col("n_kept").as("n_a"))
      .crossJoin(broadcast(perGroup
        .select(col("prio").as("prio_b"), col("h_k").as("h_b"), col("n_kept").as("n_b"))))
      .filter(col("prio_a") < col("prio_b"))
    val ra = pairs.select(col("prio_a"), col("prio_b"))
      .join(skRows.withColumnRenamed("prio", "prio_a"), Seq("prio_a"))
    val rb = pairs.select(col("prio_a"), col("prio_b"))
      .join(skRows.withColumnRenamed("prio", "prio_b"), Seq("prio_b"))
    val wu = Window.partitionBy(col("prio_a"), col("prio_b")).orderBy(col("h"))
    val unionSk = ra.select(col("prio_a"), col("prio_b"), col("h"))
      .union(rb.select(col("prio_a"), col("prio_b"), col("h")))
      .dropDuplicates("prio_a", "prio_b", "h")
      .withColumn("rn", row_number().over(wu)).filter(col("rn") <= k)
      .groupBy(col("prio_a"), col("prio_b"))
      .agg(max(col("h")).as("h_u"), count(lit(1)).as("n_u"))

    val cust = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("prio"), col("o_custkey").as("c")).distinct()
    val exact = cust.select(col("prio").as("prio_a"), col("c"))
      .join(cust.select(col("prio").as("prio_b"), col("c")), Seq("c"))
      .filter(col("prio_a") < col("prio_b"))
      .groupBy(col("prio_a"), col("prio_b"))
      .agg(count(lit(1)).as("n_inter_exact"))

    pairs.join(unionSk, Seq("prio_a", "prio_b"))
      .join(exact, Seq("prio_a", "prio_b"), "left")
      .na.fill(0L, Seq("n_inter_exact"))
      .select(col("prio_a"), col("prio_b"),
        est(col("h_u"), col("n_u")).as("est_union"),
        greatest(est(col("h_a"), col("n_a")) + est(col("h_b"), col("n_b"))
          - est(col("h_u"), col("n_u")), lit(0.0)).as("est_inter"),
        col("n_inter_exact"))
      .orderBy(col("prio_a"), col("prio_b"))
  }


  /** q85: ordered funnel analysis over the event stream — the
    * dashboard staple the reference's Kibana layer implies: how many
    * users progressed view → click → purchase IN ORDER. Step n's
    * timestamp is the MIN event time strictly after step n−1's — a
    * deterministic rule both engines compute exactly on integer epoch
    * micros (no interval arithmetic, no timezone surface). Each step
    * is one filtered aggregate + one equi-join against the previous
    * step's (user, t) table — user-keyed shuffles only, no windows
    * over the full stream, so the funnel runs map-side-combined at any
    * event volume.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("us") > col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("us") > col("t2"))
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    v.select(lit(1L).as("step"), lit("view").as("event_type"), col("user_id"))
      .union(c.select(lit(2L), lit("click"), col("user_id")))
      .union(p.select(lit(3L), lit("purchase"), col("user_id")))
      .groupBy(col("step"), col("event_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("step"))
  }

  /** q86: retention cohorts — users grouped by first-seen day, counted
    * once per (cohort, day-offset) they were active. Pure integer date
    * algebra (UTC day truncation + day diff), one first-seen aggregate
    * + one user-keyed join + one distinct — the cohort heat-map query
    * every product dashboard runs, shaped so the only shuffles are
    * keyed by user_id and by the (cohort, offset) output grid.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val firstDay = ev.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    ev.join(firstDay, "user_id")
      .select(
        // ISO string, not DateType: date columns round-trip as
        // different host types (Timestamp vs date) through the two
        // engines' parquet/pandas paths; the string is unambiguous
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("offset_days"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  /** Date-part extraction histogram: orders per (year, quarter). */
  def ordersByYearQuarter(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"))
      .agg(count(lit(1)).as("n_orders"),
           sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy(col("yr"), col("qtr"))

  /** §2.8 RANGE frame: trailing-30-day revenue per supplier, ordered by
    * ship time in epoch seconds (value-based frame — deterministic under
    * ties by construction).
    */
  def trailing30dRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("ship_s"))
      .rangeBetween(-30L * 86400, 0)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        unix_timestamp(col("l_shipdate")).as("ship_s"),
        dec(col("l_extendedprice")).as("price_d"))
      .withColumn("trailing_rev", sum(col("price_d")).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("trailing_rev"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** §2.4 GROUPING SETS — one SQL text shared verbatim with the oracle. */
  val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(groupingSetsSql)
  }

  /** Pivot: order counts per priority pivoted across status columns
    * (plans as a single conditional aggregation — no extra shuffle vs
    * the CASE formulation the oracle uses).
    */
  def pivotStatusCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
      .orderBy(col("o_orderpriority"))

  /** Exact interpolated percentiles (continuous definition — matches
    * DuckDB quantile_cont).
    */
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("med_price"),
           expr("percentile(l_extendedprice, 0.9)").as("p90_price"))
      .orderBy(col("l_returnflag"))

  /** TPC-H Q4 shape: per-priority counts of orders having at least one
    * qualifying lineitem (correlated EXISTS → left-semi join).
    */
  def priorityWithBigLines(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir).filter(col("l_quantity") > 45.0)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q13 shape: distribution of customers by order count —
    * left outer join so zero-order customers land in bucket 0, then a
    * second-level aggregation over the per-customer counts.
    */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("c_count").desc)
  }

  /** Correlated-scalar-subquery shape: orders above their customer's
    * average order value (decorrelated by Catalyst into a join on the
    * grouped aggregate — no per-row subquery execution).
    */
  def aboveCustomerAverage(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val avgByCust = o.groupBy(col("o_custkey").as("k"))
      .agg((sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_price"))
    o.join(avgByCust, o("o_custkey") === avgByCust("k"))
      .filter(col("o_totalprice") > col("avg_price") * 1.5)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** q40: TPC-H Q14 shape — revenue by part type through the
    * lineitem ⋈ part equi-join (broadcast dim), decimal-exact money.
    * Exercises the one fixture table no other query touches.
    */
  def revenueByPartType(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        // decimal-exact mean: float partial sums are order-dependent
        (sum(dec(col("p_retailprice"))).cast("double") / count(lit(1)))
          .as("avg_retail"))
      .orderBy(col("p_type"))

  /** q39: the distribution-window primitives — ntile quartiles,
    * percent_rank and cume_dist over order values per priority. All
    * three are rational functions of integer ranks/counts, so the
    * doubles are oracle-exact.
    */
  def orderValueDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 100) // bounded slice: output stays reviewable
      .select(col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** q47: SQL-MERGE-style maintenance of a keyed table — one pass
    * applies a change batch as UPDATE (matched), DELETE (matched +
    * predicate), and INSERT (not matched). Composed as
    * left-join + filter + unionByName: the join shuffles on the merge
    * key exactly once (broadcast when the change batch is small, as
    * dims are here), which is the plan a Delta/Iceberg MERGE compiles
    * to minus the file-rewrite bookkeeping. Change batch is derived
    * deterministically from the fixtures: urgent-order counts bump
    * account balances, MACHINERY customers without urgent orders are
    * retired, suppliers arrive as new customer rows.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
    val upd = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n_urgent"))
    val inserts = Tables.supplier(spark, dir)
      .select((col("s_suppkey") + 1000000L).as("c_custkey"),
        col("s_name").as("c_name"),
        dec(col("s_acctbal")).cast("double").as("acctbal"))
    base.join(broadcast(upd), base("c_custkey") === upd("k"), "left")
      .filter(!(col("c_mktsegment") === "MACHINERY" && col("n_urgent").isNull))
      .select(col("c_custkey"), col("c_name"),
        (dec(col("c_acctbal")) + coalesce(col("n_urgent"), lit(0L)) * 10)
          .cast("double").as("acctbal"))
      .unionByName(inserts)
      .orderBy(col("c_custkey"))
  }

  /** q97: cascading referential DELETE — the GDPR "right to be
    * forgotten" pipeline shape: erasing a customer set must cascade
    * through every table that references it (customer → orders →
    * lineitem), and the erasure LEDGER (how many rows each table
    * lost) is itself a compliance artifact. Forget set = the
    * deterministic ~1% slice c_custkey % 97 == 0.
    *
    * Scale shape: each cascade level is ONE anti-join on the parent
    * key — the forget set and the deleted-orders key set broadcast
    * when small (the common case; a shuffled anti-join is the same
    * plan shape at any size). No table is scanned more than once for
    * its delete; counts are side outputs of the same pass. All-integer
    * ledger — hash-checked.
    */
  def cascadeDelete(spark: SparkSession, dir: String): DataFrame = {
    val forget = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("fk"))
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val deletedOrders = orders
      .join(broadcast(forget), col("o_custkey") === col("fk"))
      .select(col("o_orderkey").as("dk"))
    def ledger(table: String, df: DataFrame, kept: DataFrame): DataFrame = {
      val before = df.agg(count(lit(1)).as("n_before"))
      val after = kept.agg(count(lit(1)).as("n_after"))
      before.crossJoin(after).select(lit(table).as("table"),
        col("n_before"), (col("n_before") - col("n_after")).as("n_deleted"),
        col("n_after"))
    }
    val keptCustomer = customer
      .join(broadcast(forget), col("c_custkey") === col("fk"), "left_anti")
    val keptOrders = orders
      .join(broadcast(forget), col("o_custkey") === col("fk"), "left_anti")
    val keptLineitem = lineitem
      .join(broadcast(deletedOrders), col("l_orderkey") === col("dk"),
        "left_anti")
    ledger("customer", customer, keptCustomer)
      .unionByName(ledger("orders", orders, keptOrders))
      .unionByName(ledger("lineitem", lineitem, keptLineitem))
      .orderBy(col("table"))
  }

  /** q60: incremental aggregate maintenance — the materialized-view
    * refresh shape: a per-customer partial aggregate of orders
    * (n_orders, total cents) is MATERIALIZED once; when a delta batch
    * arrives, the refresh merges (delta partials ∪ stored partials) and
    * never rescans the base — count/sum are algebraic, so merging
    * partials is exact and refresh cost is ∝ |delta| however large the
    * base has grown. The oracle is the full recompute over all orders:
    * a refresh indistinguishable from recomputation is the correctness
    * bar for incremental view maintenance.
    *
    * Base/delta split is deterministic (`o_orderkey % 10`): the 90%
    * slice lands as parquet partials (one write, standing in for the
    * stored MV), the 10% slice plays the incoming batch. Integer cents
    * (the s07 trick) keep the merged sum bit-exact in any merge order.
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        (sum((dec(col("o_totalprice")) * 100).cast("long"))).as("cents"))
    val baseDir = graft.util.Scratch.dir(spark, "q60_base", dir)
    val orders = Tables.orders(spark, dir)
    partials(orders.filter(col("o_orderkey") % 10 =!= 0))
      .write.mode("overwrite").parquet(baseDir.toString)
    val stored = spark.read.parquet(baseDir.toString)
    val delta = partials(orders.filter(col("o_orderkey") % 10 === 0))
    stored.unionByName(delta)
      .groupBy(col("o_custkey"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("cents")).as("total_cents"))
      .orderBy(col("o_custkey"))
  }

  /** q55: Bloom-prefiltered join — an explicit runtime join filter
    * (what `spark.sql.optimizer.runtime.bloomFilter.enabled` injects
    * automatically): build an 8 KiB Bloom filter over the FILTERED
    * dim keys with one distributed aggregate, then drop non-matching
    * fact rows MAP-SIDE (a codegen'd expression of two murmur3 hashes)
    * before any join machinery runs. At 100 TB the fact rows that
    * would be dropped by the join never reach the shuffle/broadcast
    * probe at all. No false negatives + exact join after ⇒ result ≡
    * plain join, which is exactly what the oracle checks.
    */
  def bloomFilteredRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Bloom
    val dim = Tables.supplier(spark, dir).filter(col("s_nationkey") < 5)
    val bits: Array[Long] = dim.select(col("s_suppkey")).as[Long]
      .select(Bloom.bloomAgg.toColumn.name("bits"))
      .head()
    Bloom.prefilter(Tables.lineitem(spark, dir), "l_suppkey", bits)
      .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
      .orderBy(col("s_name"))
  }

  /** q48: SCD-type-2 history build — turn a change log (events per
    * user) into validity intervals: each row is valid from its own
    * timestamp until the next change for the same key (NULL = current).
    * One shuffle on the key, one ordered sweep per partition (`lead`);
    * emitted as integer epoch-micros so the interval bounds are
    * integer-exact across engines.
    */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .withColumn("valid_from_us", unix_micros(col("ts")))
      .withColumn("valid_to_us", unix_micros(lead(col("ts"), 1).over(w)))
      .drop("ts")
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
  }

  // — file-format round trips (S11/F11 through the gate): the sink and
  //   the matching source must be LOSSLESS on messy text — quotes,
  //   embedded commas/newlines, unicode. The oracle is a plain SELECT
  //   from the original table, so any escaping asymmetry hash-fails. —

  /** q37: documents → CSV (quoted/escaped) → read back with explicit
    * schema, multiLine for embedded newlines.
    */
  def csvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = graft.util.Scratch.dir(spark, "q37_csv", dir).toString
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").option("header", "false").csv(tmp)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    spark.read.schema(schema)
      .option("header", "false").option("multiLine", "true")
      .csv(tmp)
      .orderBy(col("doc_id"))
  }

  /** q38: documents → JSON lines → read back with explicit schema
    * (string escaping covers control chars; one JSON object per line).
    */
  def jsonRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = graft.util.Scratch.dir(spark, "q38_json", dir).toString
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").json(tmp)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    spark.read.schema(schema).json(tmp)
      .orderBy(col("doc_id"))
  }

  /** q70: wide→long UNPIVOT (`Dataset.unpivot`, the melt every
    * feature-store export needs). The wide side is a per-returnflag
    * measure table built with exact decimal sums (cast to double only
    * after aggregation, per the file-wide money rule); unpivot then
    * melts the three measure columns into (measure, value) rows.
    * Scale shape: unpivot is a generate-style per-row expansion AFTER
    * the aggregation — it adds no shuffle, and the expansion factor is
    * the fixed measure count, not data-dependent.
    */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"))
      .agg(
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        sum(dec(col("l_discount"))).cast("double").as("sum_discount"),
        sum(col("l_quantity")).cast("double").as("sum_qty"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_price"), col("sum_discount"), col("sum_qty")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  /** q71: correlated LATERAL subquery — per-nation top-2 customers by
    * account balance, declared as the per-row subquery it semantically
    * is. Catalyst decorrelates the LATERAL (DecorrelateInnerQuery:
    * correlated ORDER BY+LIMIT becomes a partitioned window filter
    * joined back on the correlation key) — the engine runs ONE
    * shuffle-join plan, never a per-row nested loop, so the declared
    * form survives any scale. Same SQL text runs on DuckDB.
    */
  val lateralTopNSql: String =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n,
      |LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2
      |) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin

  def lateralTopN(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    spark.sql(lateralTopNSql)
  }

  /** q72: the higher-order-function surface (transform / filter /
    * aggregate / zip_with / slice) as one integer-exact gate row —
    * per-order sorted quantity array, then a chain of array kernels
    * whose results are all integer-derived (order-independent through
    * the hash agg, bit-exact vs DuckDB's list lambdas). `tv_steps`
    * zips the array against its own tail — the shifted-slice pairing
    * the t15 bigram kernel uses. All array work is per-row over
    * ≤7-element lists: map-only after the one groupBy shuffle.
    */
  def hofArrays(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity").cast("long"))).as("qtys"))
      .select(
        col("l_orderkey"),
        size(col("qtys")).cast("long").as("n_lines"),
        aggregate(col("qtys"), lit(0L), (a, x) => a + x).as("total_qty"),
        size(filter(col("qtys"), _ > 25L)).cast("long").as("n_big"),
        aggregate(transform(col("qtys"), x => x * x), lit(0L), (a, x) => a + x)
          .as("sum_sq"),
        aggregate(
          zip_with(
            slice(col("qtys"), lit(1), greatest(size(col("qtys")) - 1, lit(0))),
            slice(col("qtys"), lit(2), greatest(size(col("qtys")) - 1, lit(0))),
            (a, b) => b - a),
          lit(0L), (a, x) => a + x).as("tv_steps"))
      .orderBy(col("l_orderkey"))

  /** q73: WITH RECURSIVE (Spark 4's UnionLoop) — a reporting-chain walk
    * over a hierarchy derived closed-form from customer
    * (`parent(k) = floor(k/10)`, roots k<10): every customer gets its
    * root ancestor and depth. The recursion is set-at-a-time — each
    * level is ONE distributed join of the frontier against customer,
    * so depth (≤6 at any fixture scale: log₁₀ of max key) bounds the
    * number of jobs, not the row count. Same SQL text runs on DuckDB.
    */
  val recursiveChainSql: String =
    """WITH RECURSIVE chain AS (
      |  SELECT c_custkey, c_custkey AS root, 0 AS depth
      |  FROM customer WHERE c_custkey < 10
      |  UNION ALL
      |  SELECT c.c_custkey, ch.root, ch.depth + 1
      |  FROM customer c JOIN chain ch
      |    ON CAST(floor(c.c_custkey / 10.0) AS BIGINT) = ch.c_custkey
      |  WHERE c.c_custkey >= 10
      |)
      |SELECT c_custkey, root, depth FROM chain ORDER BY c_custkey""".stripMargin

  def recursiveChain(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    spark.sql(recursiveChainSql)
  }

  /** q74: forward fill (gap repair) — `last_value(... IGNORE NULLS)`
    * over a per-key ordered frame, the standard sensor/feature-store
    * repair for sparse readings. Nulls are PLANTED closed-form
    * (every 7th event) so the fill is fully oracle-derivable; the
    * filled value is a per-row passthrough (no arithmetic), so floats
    * are bit-exact. One shuffle on the partition key; the running
    * frame is computed in a single pass per partition at any scale.
    * One dialect nit: Spark parses `last_value(v) IGNORE NULLS OVER`,
    * DuckDB wants `last_value(v IGNORE NULLS) OVER` — same semantics,
    * two spellings (the oracle carries the DuckDB one).
    */
  private def forwardFillSqlFor(ignoreNulls: String => String): String =
    s"""SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       | ${ignoreNulls("v")} OVER (
       |   PARTITION BY user_id ORDER BY ts, event_id
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
       |FROM (SELECT event_id, user_id, ts,
       |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
       | FROM events)
       |ORDER BY event_id""".stripMargin
  val forwardFillSql: String =
    forwardFillSqlFor(v => s"last_value($v) IGNORE NULLS")
  val forwardFillOracleSql: String =
    forwardFillSqlFor(v => s"last_value($v IGNORE NULLS)")

  def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    spark.sql(forwardFillSql)
  }

  /** q75: gap-based sessionization in pure window SQL — the batch twin
    * of s03's `session_window` (same 30-minute inactivity rule): flag
    * a session start when the per-user gap ≥ 30 min, number sessions
    * with a running sum of flags, aggregate per session. The classic
    * two-window + groupBy plan: both windows share ONE partitioning
    * (user_id), so the whole query is a single shuffle plus per-
    * partition sorts. Equality with the `session_window` operator is
    * asserted in spec; the oracle runs the identical SQL.
    */
  val gapSessionizeSql: String =
    """WITH e AS (
      | SELECT user_id, ts, event_id,
      |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           >= INTERVAL '30' MINUTE
      |       THEN 1 ELSE 0 END AS new_s
      | FROM events),
      |s AS (
      | SELECT user_id, ts,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sid
      | FROM e)
      |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
      | CAST(max(ts) AS TIMESTAMP) AS session_end,
      | count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  def gapSessionize(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    spark.sql(gapSessionizeSql)
  }

  /** q81: LINEAR interpolation of missing readings — the arithmetic
    * upgrade of q74's forward fill (sensor resampling / feature-store
    * gap repair where a stale carry-forward biases downstream windows).
    * Same planted-null scheme as q74 (every 7th event), value
    * reconstructed as pv + (nv−pv)·(t−t_prev)/(t_next−t_prev) between
    * the nearest known neighbors, carried flat at the partition edges,
    * and guarded against duplicate-timestamp zero spans.
    *
    * Oracle-exactness: timestamps enter as exact epoch-microsecond
    * BIGINTs, so the interpolation fraction is one deterministic IEEE
    * division of exact integers and the reconstruction a fixed
    * three-op expression tree — bit-identical across engines (the t10
    * convention; no order-dependent float sums anywhere).
    *
    * Scale shape: all four IGNORE-NULLS frames share ONE window
    * partitioning (user_id) and ONE sort (us, event_id), so the whole
    * query is a single shuffle plus a per-partition forward and
    * backward sweep — linear at any scale, no joins. Two dialect nits
    * carried by the template: Spark spells `last_value(v) IGNORE
    * NULLS`, DuckDB `last_value(v IGNORE NULLS)`; epoch micros are
    * `unix_micros` vs `epoch_us`.
    */
  private def interpolateSqlFor(ign: (String, String) => String,
                                us: String): String = {
    val frame = (fn: String, arg: String, dir: String) =>
      s"""${ign(fn, arg)} OVER (
         |    PARTITION BY user_id ORDER BY us, event_id
         |    $dir)""".stripMargin
    val prec = "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    val foll = "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING"
    val vAt = "CASE WHEN v IS NOT NULL THEN us END"
    s"""WITH e AS (
       | SELECT event_id, user_id, $us AS us,
       |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
       | FROM events),
       |w AS (
       | SELECT event_id, user_id, us, v,
       |  ${frame("last_value", "v", prec)} AS pv,
       |  ${frame("last_value", vAt, prec)} AS pus,
       |  ${frame("first_value", "v", foll)} AS nv,
       |  ${frame("first_value", vAt, foll)} AS nus
       | FROM e)
       |SELECT event_id, user_id,
       | CASE WHEN v IS NOT NULL THEN v
       |      WHEN pv IS NULL THEN nv
       |      WHEN nv IS NULL THEN pv
       |      WHEN nus = pus THEN pv
       |      ELSE pv + (nv - pv) * (CAST(us - pus AS DOUBLE) / CAST(nus - pus AS DOUBLE))
       | END AS v_interp
       |FROM w ORDER BY event_id""".stripMargin
  }
  val interpolateSql: String =
    interpolateSqlFor((fn, a) => s"$fn($a) IGNORE NULLS", "unix_micros(ts)")
  val interpolateOracleSql: String =
    interpolateSqlFor((fn, a) => s"$fn($a IGNORE NULLS)", "epoch_us(ts)")

  def linearInterpolate(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    spark.sql(interpolateSql)
  }

  /** q79: correlated SCALAR subqueries in the SELECT list — the
    * per-row lookup shape (max order, order count per customer)
    * declared as the subquery it is; Catalyst decorrelates each into
    * a left outer aggregate join (including the COUNT-over-empty→0
    * case nulls would get wrong). Same SQL text runs on DuckDB.
    */
  val scalarSubqueriesSql: String =
    """SELECT c.c_custkey, c.c_name,
      | (SELECT max(o.o_totalprice) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS max_order,
      | (SELECT count(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |ORDER BY c.c_custkey""".stripMargin

  def scalarSubqueries(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(scalarSubqueriesSql)
  }

  /** q80: MapType round trip — the one §1 container type without a
    * dedicated gate row: per-customer priority→count maps built with
    * `map_from_entries(collect_list(struct(...)))`, interrogated with
    * `map_keys`, and exploded back to rows. Map key order is engine-
    * internal, so the gate compares the EXPLODED form (plus the map's
    * cardinality per row) — a hash match proves construction lost no
    * entry and explosion recovered each exactly once.
    */
  def mapRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("o_custkey"))
      .agg(map_from_entries(
        collect_list(struct(col("o_orderpriority"), col("n")))).as("m"))
      .select(col("o_custkey"),
        size(map_keys(col("m"))).cast("long").as("n_priorities"),
        explode(col("m")).as(Seq("o_orderpriority", "n")))
      .orderBy(col("o_custkey"), col("o_orderpriority"))
  }

  /** q78: MULTISET set operations — `exceptAll`/`intersectAll` keep
    * duplicate multiplicity (per key: count(a)−count(b) / min counts),
    * which the distinct forms (q12/q13) erase. The multisets are the
    * lineitem order keys (multiplicity = lines per order) vs the
    * high-quantity subset; per-key counts of both results are emitted
    * in one tagged frame. Spark plans these as a single aggregation
    * computing both sides' counts plus a generate — no join, one
    * shuffle on the key.
    */
  def multisetOps(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val a = li.select(col("l_orderkey").as("k"))
    val b = li.filter(col("l_quantity") > 25).select(col("l_orderkey").as("k"))
    def counted(df: DataFrame, op: String): DataFrame =
      df.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .select(lit(op).as("op"), col("k"), col("n"))
    counted(a.exceptAll(b), "except_all")
      .unionByName(counted(a.intersectAll(b), "intersect_all"))
      .orderBy(col("op"), col("k"))
  }

  /** q91: first-order Markov transition matrix over per-user event
    * sequences — the path-analysis primitive behind "what do users do
    * after X" dashboards and behavioral-cloning corpus stats. Each
    * user's events are ordered by (ts, event_id); consecutive pairs
    * (lag window) are counted into a from→to matrix, and each row is
    * normalized into transition probabilities.
    *
    * Portability: counts are exact int64; `prob = n / Σn(from)` is one
    * double division of two exact integers — deterministic bits.
    *
    * Scale shape: ONE shuffle by user_id for the lag window (per-user
    * state, arbitrarily parallel across users), one map-side-combined
    * groupBy on (from, to) — cardinality = |event types|², tiny — and
    * the row-normalizing window runs on that tiny matrix. No stage
    * touches cross-user data.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type").as("to_type"),
        lag(col("event_type"), 1).over(byUser).as("from_type"))
      .filter(col("from_type").isNotNull)
    val counts = steps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy(col("from_type"))
    counts
      .withColumn("prob",
        col("n").cast("double") / sum(col("n")).over(rowTotal))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** q93: distribution-rank windows — `percent_rank`, `cume_dist` and
    * `ntile(10)` of order value within each priority class (the
    * "where does this record sit in its cohort's distribution"
    * primitive behind quantile-bucketed training mixes and per-cohort
    * score calibration).
    *
    * Portability: percent_rank = (rank−1)/(n−1) and cume_dist =
    * rows≤x / n are each ONE double division of exact integers; ntile
    * is all-integer (SQL-standard remainder-to-front rule on both
    * engines). The window orders by (value, key) so ties cannot make
    * rank assignment engine-dependent.
    *
    * Scale shape: one shuffle by the partition key; each cohort sorts
    * independently (no global sort). A skewed cohort is the known
    * limit of any ranked window — the q35/q36 salting pattern applies
    * if a cohort outgrows an executor.
    */
  def distributionRanks(spark: SparkSession, dir: String): DataFrame = {
    val byPrio = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        percent_rank().over(byPrio).as("pct_rank"),
        cume_dist().over(byPrio).as("cume"),
        ntile(10).over(byPrio).cast("long").as("decile"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** q95: LAST-TOUCH attribution — each purchase's value credited to
    * the user's most recent preceding non-purchase event type (the
    * conversion-attribution primitive behind "which channel drives
    * revenue" dashboards; the same carry-last-qualifying-row-forward
    * window underlies label propagation along event timelines).
    *
    * The channel is a `last_value(... IGNORE NULLS)` over a
    * rows-preceding frame — the q74 forward-fill frame with a
    * CONDITIONAL payload (only non-purchase rows emit a value to
    * carry). Credited sums accumulate as exact DECIMAL(18,2) and cast
    * to double once — hash-checked.
    *
    * Scale shape: ONE shuffle by user_id for the window (per-user
    * frames, parallel across users), then a map-side-combined groupBy
    * on the |types|-sized channel key.
    */
  def lastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        col("value").cast(DecimalType(18, 2)).as("v"),
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(byUser).as("channel"))
      .filter(col("event_type") === "purchase" && col("channel").isNotNull)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("v")).cast("double").as("credited"))
      .orderBy(col("channel"))
  }
}
