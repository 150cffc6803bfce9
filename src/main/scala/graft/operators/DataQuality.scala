package graft.operators

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-quality operators — the validation layer of a production
  * pipeline (the reference's analog is its run-end reconciliation
  * count, `ingestion-elasticsearch.py:298-308`, generalized here to
  * column profiling, declarative constraint checks, and snapshot
  * diffing).
  */
object DataQuality {

  /** q51: column profiler — per-column row/null/distinct counts plus
    * numeric min/max from a single aggregate, unpivoted to per-column
    * rows. One SCAN; note the shuffle caveat: multiple exact
    * `countDistinct`s make Catalyst rewrite through an Expand that
    * emits one projection per distinct column (~5× the row volume into
    * the shuffle). Exact counts are kept here because the oracle gate
    * hash-compares them; at 100 TB swap `approx_count_distinct` in
    * (the q23 pattern) and the profile collapses back to a true
    * single-projection partial aggregate.
    */
  /** q66: single-pass OBSERVED metrics — `Dataset.observe` accumulates
    * aggregates on the side of an unrelated action, so the profile
    * costs zero extra scans. Here the "production" action is a `noop`
    * write of the orders projection; the observation rides that one
    * pass and surfaces row count, revenue total, and date bounds. At
    * 100 TB this is how data-quality metrics are actually collected:
    * attached to the pipeline's existing pass (accumulator-based,
    * map-side, no shuffle of its own), not as a second profiling scan
    * (q51's shape). The observed map is re-emitted as a one-row frame
    * so the DuckDB oracle pins the values exactly.
    */
  def observedProfile(spark: SparkSession, dir: String): DataFrame =
    observedProfileOf(Tables.orders(spark, dir))

  def observedProfileOf(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation()
    orders
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("total"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
          .as("first_date"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
          .as("last_date"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    // Null-safe reads: on an EMPTY input sum/min/max observe as null;
    // a bare asInstanceOf[Double] would NPE on unboxing. A profiling
    // operator pointed at unknown inputs must emit a null-row profile
    // instead of crashing.
    Seq((m("n_rows").asInstanceOf[Long],
         Option(m("total")).map(_.asInstanceOf[Double]),
         Option(m("first_date")).map(_.asInstanceOf[String]),
         Option(m("last_date")).map(_.asInstanceOf[String])))
      .toDF("n_rows", "total", "first_date", "last_date")
  }

  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val stats = o.agg(
      count(lit(1)).as("n_rows"),
      sum(col("o_orderkey").isNull.cast("long")).as("nn_orderkey"),
      countDistinct(col("o_orderkey")).as("nd_orderkey"),
      min(col("o_orderkey")).cast("double").as("min_orderkey"),
      max(col("o_orderkey")).cast("double").as("max_orderkey"),
      sum(col("o_custkey").isNull.cast("long")).as("nn_custkey"),
      countDistinct(col("o_custkey")).as("nd_custkey"),
      min(col("o_custkey")).cast("double").as("min_custkey"),
      max(col("o_custkey")).cast("double").as("max_custkey"),
      sum(col("o_totalprice").isNull.cast("long")).as("nn_totalprice"),
      countDistinct(col("o_totalprice")).as("nd_totalprice"),
      min(col("o_totalprice")).cast("double").as("min_totalprice"),
      max(col("o_totalprice")).cast("double").as("max_totalprice"),
      sum(col("o_orderpriority").isNull.cast("long")).as("nn_orderpriority"),
      countDistinct(col("o_orderpriority")).as("nd_orderpriority"))
    stats.selectExpr(
      """stack(4,
        | 'o_orderkey',      n_rows, nn_orderkey,      nd_orderkey,      min_orderkey,   max_orderkey,
        | 'o_custkey',       n_rows, nn_custkey,       nd_custkey,       min_custkey,    max_custkey,
        | 'o_totalprice',    n_rows, nn_totalprice,    nd_totalprice,    min_totalprice, max_totalprice,
        | 'o_orderpriority', n_rows, nn_orderpriority, nd_orderpriority, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |) AS (col_name, n_rows, n_nulls, n_distinct, min_num, max_num)""".stripMargin)
      .orderBy(col("col_name"))
  }

  /** q52: declarative constraint checks — FK integrity, key uniqueness,
    * range and not-null rules, each reported as a violation count. Each
    * rule is its own aggregate/anti-join over the narrowest projection
    * (keys only), so a rule pass costs a fraction of a table scan and
    * the checks parallelize as independent jobs.
    */
  def constraintChecks(spark: SparkSession, dir: String): DataFrame =
    constraintChecksOn(Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.lineitem(spark, dir))

  /** The rule expressions over arbitrary frames — the spec injects
    * planted-dirt tables through THIS path, so the production rules
    * themselves are what detect the violations.
    */
  def constraintChecksOn(o: DataFrame, c: DataFrame, li: DataFrame): DataFrame = {
    val fk = o.select(col("o_custkey"))
      .join(broadcast(c.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders_custkey_fk").as("rule"), col("n_violations"))
    val uniq = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_violations"))
      .select(lit("orders_orderkey_unique").as("rule"), col("n_violations"))
    val range = li.filter(col("l_quantity") <= 0.0 || col("l_quantity") > 50.0)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitem_quantity_range").as("rule"), col("n_violations"))
    val nn = c.filter(col("c_acctbal").isNull)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("customer_acctbal_notnull").as("rule"), col("n_violations"))
    fk.unionByName(uniq).unionByName(range).unionByName(nn)
      .orderBy(col("rule"))
  }

  /** q53: snapshot diff — derive a changelog between a table version
    * and its successor (here: customer before/after the q47 MERGE) via
    * one full outer join on the key: the CDC stream a downstream
    * incremental consumer would ingest. Emits per-change-type counts;
    * the same join, un-aggregated, is the row-level changelog.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val before = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k_before"),
        col("c_acctbal").cast(DecimalType(18, 2)).cast("double").as("v_before"))
    val after = Relational.mergeUpsert(spark, dir)
      .select(col("c_custkey").as("k_after"), col("acctbal").as("v_after"))
    before.join(after, col("k_before") === col("k_after"), "full_outer")
      .select(
        when(col("k_before").isNull, "inserted")
          .when(col("k_after").isNull, "deleted")
          .when(col("v_before") =!= col("v_after"), "updated")
          .otherwise("unchanged").as("change_type"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("change_type"))
  }

  /** q88: distributed second-moment statistics — per-returnflag
    * variance/stddev of quantity, quantity↔price correlation, and the
    * price-on-quantity regression slope — computed PORTABLY: exact
    * DECIMAL power sums (n, Σq, Σq², Σp, Σp², Σqp — order-independent
    * by exactness, one map-side-combined shuffle) cast to double once,
    * then the closed-form moment formulas in a fixed operation order.
    *
    * Built-in `var_samp`/`corr` accumulate FLOATS in partition order —
    * different partitioning, different ULPs, and a hash gate (or a
    * re-run on another cluster layout) breaks. Power sums make the
    * aggregation exact and the float arithmetic a deterministic
    * per-group epilogue: the same bit pattern at any parallelism, and
    * DuckDB reproduces it from the same SQL formula. (Textbook caveat
    * applies and is the tradeoff: one-pass power sums lose precision
    * to cancellation when stddev ≪ mean — for profiling-grade moments
    * that is acceptable; Welford-style merging is not reproducible
    * across partitionings.)
    */
  def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    val d182 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 2))
    val l = Tables.lineitem(spark, dir).select(
      col("l_returnflag"),
      d182(col("l_quantity")).as("q"),
      d182(col("l_extendedprice")).as("p"))
    val sums = l.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(col("q")).as("s1"), sum(col("q") * col("q")).as("s2"),
      sum(col("p")).as("t1"), sum(col("p") * col("p")).as("t2"),
      sum(col("q") * col("p")).as("sp"))
    // one cast per exact sum, then fixed-order double arithmetic —
    // the identical expression tree the oracle SQL spells out
    val n = col("n").cast("double")
    val Seq(s1, s2, t1, t2, sp) =
      Seq("s1", "s2", "t1", "t2", "sp").map(c => col(c).cast("double"))
    val varNumQ = n * s2 - s1 * s1
    val varNumP = n * t2 - t1 * t1
    val covNum = n * sp - s1 * t1
    sums.select(
        col("l_returnflag"), col("n"),
        (varNumQ / (n * (n - lit(1.0)))).as("var_qty"),
        sqrt(varNumQ / (n * (n - lit(1.0)))).as("std_qty"),
        (covNum / sqrt(varNumQ * varNumP)).as("corr_qty_price"),
        (covNum / varNumQ).as("slope_price_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** q92: per-group z-score outlier detection — rows whose value sits
    * more than k population-σ from their group mean (the profiling
    * primitive behind "flag anomalous records before training"; the
    * events.value column is heavy-tailed, so a 3σ gate is selective
    * but non-empty). Statistically: flag x iff (x−μ)² > k²·σ².
    *
    * Portability (the q88 exact-power-sums pattern, applied as a
    * FILTER): per-group n, Σx, Σx² accumulate as exact DECIMALs —
    * order-independent under any partitioning — then the test is
    * rearranged to avoid division entirely:
    *   (n·x − Σx)² > k² · (n·Σx² − (Σx)²)
    * evaluated in doubles in a pinned operation order. Every operand
    * is an exactly-representable integer-scaled value, so both sides
    * are bit-deterministic and the BOOLEAN is engine-portable (no
    * float aggregation order anywhere).
    *
    * Scale shape: one map-side-combined groupBy over |event types|
    * groups, the 5-row stats frame broadcast back onto the scan — the
    * flagging pass is map-only; no row-level shuffle at all.
    */
  private def d182(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Per-group exact power sums (n, Σx, Σx²) of events.value — the
    * reference PROFILE side of the outlier gate. A tiny DataFrame
    * (one row per event type), broadcastable into batch or stream.
    */
  def outlierProfile(events: DataFrame): DataFrame =
    events.select(col("event_type"), d182(col("value")).as("v"))
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("s1"), sum(col("v") * col("v")).as("s2"))

  /** Flag rows of `events` beyond k·σ of their group per `profile` —
    * a STATELESS map-side filter (broadcast profile join + pinned
    * double arithmetic), usable identically on a batch frame or an
    * unbounded stream (no watermark, no state store).
    */
  def flagOutliers(events: DataFrame, profile: DataFrame,
                   k: Double): DataFrame = {
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val x = col("v").cast("double")
    val dev = n * x - s1
    val rhs = lit(k * k) * (n * s2 - s1 * s1)
    events.select(col("event_id"), col("event_type"), d182(col("value")).as("v"))
      .join(broadcast(profile), "event_type")
      .filter(dev * dev > rhs)
      .select(col("event_type"), col("event_id"), x.as("value"))
  }

  def valueOutliers(spark: SparkSession, dir: String, k: Double = 3.0): DataFrame = {
    val ev = Tables.events(spark, dir)
    flagOutliers(ev, outlierProfile(ev), k)
      .orderBy(col("event_type"), col("event_id"))
  }

  /** Lower-middle DISCRETE median of `valCol` per event_type — an
    * actual element of the multiset (row at rank ⌊(n+1)/2⌋ under a
    * tie-broken total order), never an interpolation: integer rank
    * selection is engine-portable where `quantile_cont`'s two-point
    * float interpolation is formula-dependent.
    */
  private def discMedian(df: DataFrame, valCol: String,
                         out: String): DataFrame = {
    val byVal = Window.partitionBy(col("event_type"))
      .orderBy(col(valCol), col("event_id"))
    val grp = Window.partitionBy(col("event_type"))
    df.withColumn("rn", row_number().over(byVal))
      .withColumn("n", count(lit(1)).over(grp))
      .groupBy(col("event_type"))
      .agg(max(when(col("rn") === floor((col("n") + lit(1)) / lit(2)).cast("long"),
        col(valCol))).as(out))
  }

  /** q94: ROBUST per-group outlier detection via MAD (median absolute
    * deviation) — the q92 complement for when the mean/σ themselves
    * are corrupted by the outliers they should find (σ breaks down at
    * 0% contamination asymptotics; the median/MAD pair tolerates up to
    * 50%): flag x iff |x − median| > k·MAD. On the heavy-tailed
    * events.value this flags ~10× more of the tail than the 3σ gate —
    * the two emit different sets by design.
    *
    * Portability: both medians are DISCRETE (see [[discMedian]]), all
    * deviations exact DECIMALs, and the k·MAD comparison stays in
    * exact decimal arithmetic — NO floating point anywhere in the
    * decision path (q92 needs a pinned double epilogue; this needs
    * none).
    *
    * Scale shape: two group-keyed sort windows (the exact-median cost
    * — each group sorts independently; the approximate alternative is
    * q30's `approx_percentile`), two broadcast joins of 5-row median
    * frames, flagging map-side.
    */
  /** q96: PORTABLE approximate quantiles by deterministic hash
    * sampling — the q84 KMV trick applied to ORDER STATISTICS: the
    * per-group sample is the k rows with the smallest md5(event_id)
    * (a uniform, engine-reproducible "random" subset — no RNG, no
    * engine sketch), and each quantile is a DISCRETE rank selection
    * from that sample. Where `approx_percentile`'s KLL state is
    * engine-internal (q30 can only rows-check it), every stage here
    * is SQL-derivable, so the approximate answer itself hash-checks;
    * sampling theory bounds the rank error by ~1/√k (spec'd at 0.1
    * rank-fraction for k=256).
    *
    * Scale shape: the k-smallest-hash selection is written as a
    * per-group window (what DuckDB mirrors); at 100 TB the same
    * sample comes from the q84 bounded top-k aggregate (fixed k·8-byte
    * state per group, map-side combined) — identical rows by
    * construction, since both keep exactly the k hash-smallest.
    * Everything after the sample touches ≤ 4·k rows per group.
    */
  def sampledQuantiles(spark: SparkSession, dir: String,
                       k: Int = 256): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val ev = Tables.events(spark, dir).select(
      col("event_type"), col("event_id"), d182(col("value")).as("v"),
      expr("cast(conv(substr(md5(cast(cast(event_id as string) as binary)), 1, 15), 16, 10) as bigint)")
        .as("hk"))
    // tie-break by event_id: a 60-bit hash tie at the k boundary must
    // pick the same row in both engines AND in s18's state merge,
    // which orders by (hk, event_id)
    val byHash = Window.partitionBy(col("event_type"))
      .orderBy(col("hk"), col("event_id"))
    val sample = ev.withColumn("rn", row_number().over(byHash))
      .filter(col("rn") <= k)
    val byVal = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("event_id"))
    val grp = Window.partitionBy(col("event_type"))
    sample
      .withColumn("vr", row_number().over(byVal))
      .withColumn("m", count(lit(1)).over(grp))
      .select(col("event_type"), col("v"), col("vr"), col("m"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .groupBy(col("event_type"), col("q"))
      .agg(max(when(
        col("vr") === greatest(lit(1L), ceil(col("q") * col("m")).cast("long")),
        col("v").cast("double"))).as("est"))
      .orderBy(col("event_type"), col("q"))
  }

  def madOutliers(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), d182(col("value")).as("v"))
    val med = discMedian(ev, "v", "med")
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = discMedian(dev.select(col("event_type"), col("event_id"),
      col("dev")), "dev", "mad")
    dev.join(broadcast(mad), "event_type")
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col("event_type"), col("event_id"),
        col("v").cast("double").as("value"))
      .orderBy(col("event_type"), col("event_id"))
  }
}
