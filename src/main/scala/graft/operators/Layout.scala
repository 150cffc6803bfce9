package graft.operators

import graft.Tables
import graft.util.Scratch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Physical-layout operators: the storage-side levers that decide
  * whether a 100 TB table is scanned or skipped, shuffled or zipped
  * (SURVEY §4):
  *
  *  - **bucketing**: write both fact tables bucketed by the join key →
  *    the join plans with zero `Exchange` (bucket-local sort-merge);
  *    the shuffle is paid once at write time, amortized over every
  *    subsequent join.
  *  - **partitioned layout**: write partitioned by a coarse key →
  *    predicates on that key prune whole directories at planning time
  *    (`PartitionFilters`, no I/O).
  *  - **Z-order clustering**: sort by an interleaved multi-column key →
  *    row-group min/max stats stay tight on ALL clustered columns.
  *  - plus the ORC leg of the format round-trip family (q37 CSV /
  *    q38 JSON / q43 ORC).
  *
  * The generic utilities take any DataFrame; the `q4x` entry points
  * perform the real write + read-back against the fixture tables so the
  * driver gate pins losslessness / result-invariance. Plan-shape
  * guarantees (PartitionFilters, no Exchange, PushedFilters) are
  * asserted in `LayoutSpec`.
  */
object Layout {

  // — generic utilities (spec-exercised over arbitrary frames) —

  /** Write `df` as a bucketed managed table (requires a warehouse dir;
    * bucket count should target HDFS-block-sized buckets at scale).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket-local join of two tables previously written with
    * [[writeBucketed]] on the same key/count: no Exchange in the plan.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))

  /** Write partitioned by a derived date column; queries filtering on
    * `p_date` prune partitions at plan time.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite").partitionBy("p_date").parquet(path)

  def readPartitionPruned(spark: SparkSession, path: String,
                          date: String): DataFrame =
    spark.read.parquet(path).filter(col("p_date") === lit(date))

  // — driver-gate entry points (write + read-back over the fixtures) —

  /** q43: documents → ORC → read back. Same lossless contract as the
    * CSV/JSON round trips: the oracle is the original table, so any
    * type or encoding asymmetry in the ORC sink/source hash-fails.
    */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = Scratch.dir(spark, "q43_orc", dir).toString
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").orc(tmp)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    spark.read.schema(schema).orc(tmp)
      .orderBy(col("doc_id"))
  }

  /** q98: SCHEMA EVOLUTION across parquet file generations — the
    * schema-drift reality of any long-lived 100 TB table: files
    * written before a column existed sit beside files written after.
    * Generation v1 (even order keys) lacks `o_year`; generation v2
    * (odd keys) carries it. `mergeSchema=true` reconciles the footers
    * at read time (the column is NULL for v1 rows — no rewrite of old
    * files), and the aggregate groups by the evolved column with the
    * null group = the pre-evolution generation. The oracle re-derives
    * the same result from the fixture closed-form, pinning exactly
    * what the merged read must produce.
    *
    * Scale note: mergeSchema footer reconciliation scans every file's
    * footer at planning time — production tables pin the merged schema
    * in a catalog instead; the READ semantics (absent column → null)
    * are identical and are what this gate pins.
    */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Scratch.dir(spark, "q98_evo", dir).toString
    val orders = Tables.orders(spark, dir)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$tmp/gen=v1")
    orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .write.mode("overwrite").parquet(s"$tmp/gen=v2")
    spark.read.option("mergeSchema", "true").parquet(tmp)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
      .orderBy(col("o_year"))
  }

  /** q61: raw-TEXT round trip — the line-oriented `text` source, the
    * format raw LLM training corpora actually arrive in (one document
    * per line). Written as `doc_id<TAB>text` lines, read back, split on
    * the FIRST tab. The text format's contract is line-oriented (no
    * embedded newlines; the tab key separator must not occur in the
    * id) — escaping formats are q37 (CSV) / q38 (JSON); this covers the
    * no-schema raw-lines path those can't (what `spark.read.text` is
    * for at 100 TB: splittable line scans with zero parse cost).
    */
  def textRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Scratch.dir(spark, "q61_text", dir).toString
    writeTextLines(Tables.documents(spark, dir), tmp)
    spark.read.text(tmp)
      .select(
        substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
        // everything AFTER the first tab — regexp keeps any further
        // tabs inside the document text intact
        regexp_replace(col("value"), "^[^\t]*\t", "").as("text"))
      .orderBy(col("doc_id"))
  }

  /** The q61 text sink with its contract enforced AT THE WRITE
    * (map-side, zero shuffle): an embedded newline would split one
    * document into two records and a null text would null the whole
    * concat — either way the read-back would silently round-trip wrong
    * data. A violating corpus fails loudly instead (raise_error names
    * the offending doc_id).
    */
  def writeTextLines(docs: DataFrame, tmp: String): Unit =
    docs
      .select(concat(col("doc_id").cast("string"), lit("\t"),
        when(col("text").isNull.or(col("text").contains("\n")),
          raise_error(concat(
            lit("q61 text sink contract violation at doc_id="),
            col("doc_id").cast("string"),
            lit(": text is null or contains a newline"))))
          .otherwise(col("text"))).as("value"))
      .write.mode("overwrite").text(tmp)

  /** q62: XML round trip — Spark 4's built-in `xml` datasource
    * (rowTag-delimited records). XML is the interchange format the
    * reference's ecosystem (job-offer feeds) actually publishes; the
    * read side proves schema-ful parse of attribute-free element rows
    * recovers the table bit-exactly.
    */
  def xmlRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = Scratch.dir(spark, "q62_xml", dir).toString
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").option("rowTag", "doc").xml(tmp)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    spark.read.schema(schema).option("rowTag", "doc")
      // the reader's default ignoreSurroundingSpaces=true TRIMS text
      // values — exactness would then silently depend on the corpus
      // containing no padded strings
      .option("ignoreSurroundingSpaces", "false")
      .xml(tmp)
      .orderBy(col("doc_id"))
  }

  /** q63: Avro round trip — the row-oriented container format of the
    * Kafka/schema-registry ecosystem (Spark 4 ships the `avro` source
    * in spark-sql). Row-oriented Avro is what ingestion landing zones
    * hold BEFORE columnarization; the round trip pins that promoting an
    * Avro drop to the parquet store is lossless. Schema travels in the
    * file, so the read side needs no external schema.
    */
  // this distribution bundles the Avro classes but not the `avro`
  // short-name service registration, so address the provider by class
  private val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  def avroRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Scratch.dir(spark, "q63_avro", dir).toString
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").format(AvroProvider).save(tmp)
    spark.read.format(AvroProvider).load(tmp)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id"))
  }

  /** q64: Avro MESSAGE codec — `to_avro`/`from_avro` over an in-plan
    * binary column, the per-record payload shape of a Kafka topic (vs
    * q63's file container). This is the decode path a streaming
    * ingestion job runs on every message at 100 TB, so it must be a
    * codegen-friendly column expression, not a UDF: encode rows to
    * binary with the Catalyst-derived writer schema, decode with the
    * SAME schema (schema-registry contract), and re-emerge typed.
    * The oracle (plain select of the source columns) pins the codec
    * as bit-lossless including nulls.
    */
  def avroMessages(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.avro.GraftAvroCodec
    val payload = Tables.documents(spark, dir)
      .select(struct(col("doc_id"), col("lang"), col("text")).as("v"))
    val structType = payload.schema("v").dataType
    // writer schema derived from the Catalyst type (what a producer
    // would register); the consumer decodes with the same JSON schema.
    // The codec expressions are graft's own (GraftAvroCodec) — this
    // distribution bundles the Avro file format but not the connector
    // that carries the to_avro/from_avro built-ins.
    val writerSchema = GraftAvroCodec.writerSchemaFor(structType, "doc")
    payload
      .select(GraftAvroCodec.toAvroBinary(col("v"), writerSchema)
        .as("value")) // binary "topic" column
      .select(GraftAvroCodec.fromAvroBinary(col("value"), writerSchema,
        structType).as("v"))
      .select(col("v.doc_id").as("doc_id"), col("v.lang").as("lang"),
        col("v.text").as("text"))
      .orderBy(col("doc_id"))
  }

  /** q44: hive-style partitioned write + partition-pruned read. Orders
    * land under `o_orderpriority=<v>/` directories; the subsequent
    * filter never opens the other partitions' files (directory-level
    * pruning — `PartitionFilters` in the scan, asserted in LayoutSpec).
    * At 100 TB this is the difference between listing 1/5 of the files
    * and scanning everything; the oracle (plain filter over the
    * unpartitioned table) pins that pruning loses no rows.
    */
  def partitionedPrune(spark: SparkSession, dir: String): DataFrame = {
    val out = Scratch.dir(spark, "q44_part", dir).toString
    Tables.orders(spark, dir)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    prunedAgg(spark.read.parquet(out))
  }

  /** The read side of q44, split out so the spec can assert the plan. */
  def prunedAgg(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("month"))

  /** q45: bucketed co-located join over the fixture fact tables. Both
    * sides are written bucketed ×8 on the join key, so the join needs
    * NO shuffle of either side: each task reads bucket i of both
    * tables. At 100 TB this converts the dominant all-to-all exchange
    * of a fact-fact join into a zip of pre-aligned files — the
    * Spark-native analog of co-partitioned storage. LayoutSpec asserts
    * the join subtree is Exchange-free; the oracle is the plain join.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    writeBucketedFixtures(spark, dir)
    bucketedRevenueAgg(bucketedJoinBare(spark))
  }

  /** Session-discriminated table names (same rationale as
    * [[graft.util.Scratch]]: concurrent sessions against one warehouse
    * dir must not overwrite each other's buckets).
    */
  private def tbl(spark: SparkSession, base: String): String =
    base + "_" + spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")

  private[operators] def writeBucketedFixtures(spark: SparkSession, dir: String): Unit = {
    // project each side to the columns the downstream joins need BEFORE
    // the bucketed write: bucket files store (and the write shuffles)
    // only those bytes
    writeBucketed(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority")),
      tbl(spark, "g_orders_bucketed"), "o_orderkey", 8)
    writeBucketed(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice")),
      tbl(spark, "g_lineitem_bucketed"), "l_orderkey", 8)
    // the session-suffixed warehouse dirs outlive the in-memory catalog
    // — register them for the same at-exit removal as scratch dirs
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq("g_orders_bucketed", "g_lineitem_bucketed").foreach { base =>
      Scratch.registerForCleanup(
        java.nio.file.Paths.get(wh).resolve(tbl(spark, base)))
    }
  }

  private[operators] def bucketedJoinBare(spark: SparkSession): DataFrame =
    bucketedJoin(spark, tbl(spark, "g_lineitem_bucketed"),
      tbl(spark, "g_orders_bucketed"), "l_orderkey", "o_orderkey")

  private[operators] def bucketedRevenueAgg(joined: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    joined
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** q49: small-file compaction — the maintenance pass every long-lived
    * 100 TB table needs (streaming sinks and partitioned writes emit
    * file counts proportional to [micro-batches × partitions], and scan
    * task-planning cost is per-file). The fixture table is deliberately
    * fragmented into 64 shards, then rewritten into a file count sized
    * from the MEASURED bytes (≈128 MB targets at scale; floor 4 here).
    * Compaction must be a pure layout change — the oracle (plain select
    * from the original table) pins that not one row was lost or duped.
    */
  def compaction(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val frag = Scratch.dir(spark, "q49_frag", dir)
    val comp = Scratch.dir(spark, "q49_comp", dir)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(64) // the small-files problem, manufactured
      .write.parquet(frag.toString)
    val targetBytes = 128L * 1024 * 1024
    val totalBytes = withWalk(frag)(_.filter(p => p.toString.endsWith(".parquet"))
      .map(java.nio.file.Files.size).sum)
    val nFiles = math.max(4, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(frag.toString)
      .coalesce(nFiles) // no shuffle: readers just concatenate shards
      .write.parquet(comp.toString)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    spark.read.schema(schema).parquet(comp.toString)
      .orderBy(col("doc_id"))
  }

  /** q56: dynamic partition overwrite — reprocess ONE slice of a
    * partitioned table in place (the incremental-pipeline fix-up: a
    * late-data or bug-fix rerun rewrites only the affected partition).
    * Under `partitionOverwriteMode=dynamic` the overwrite deletes only
    * the partitions present in the incoming frame; sibling partitions'
    * files are untouched (asserted in LayoutSpec by write-job UUID in
    * the part-file names). The oracle
    * is the equivalent CASE projection over the original table, so the
    * gate pins that exactly the urgent slice changed and no row was
    * lost across the rewrite.
    */
  def partitionOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val out = Scratch.dir(spark, "q56_dynpart", dir).toString
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    orders.write.partitionBy("o_orderpriority").parquet(out)
    // the reprocessed slice: urgent orders, price doubled (×2 is exact
    // on doubles — no decimal detour needed)
    val fixed = orders.filter(col("o_orderpriority") === "1-URGENT")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try fixed.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    spark.read.parquet(out)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** Walk a tree with the stream closed afterwards (it holds FDs). */
  private def withWalk[A](p: java.nio.file.Path)(f: Seq[java.nio.file.Path] => A): A = {
    val s = java.nio.file.Files.walk(p)
    try f(s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path]))
    finally s.close()
  }

  /** Parquet data-file count under a directory (spec evidence). */
  private[operators] def parquetFileCount(p: java.nio.file.Path): Int =
    withWalk(p)(_.count(q => q.toString.endsWith(".parquet")))

  /** Interleave the low 16 bits of `a` and `b` into one 32-bit Z-value
    * (bit i of `a` → position 2i+1, bit i of `b` → position 2i).
    * Unrolled to a 32-term bitwise-OR chain — a single codegen'd
    * expression, no UDF.
    */
  def interleave16(a: Column, b: Column): Column = {
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until 16).map { i =>
      val abit = shiftleft(shiftright(al, i).bitwiseAND(1L), 2 * i + 1)
      val bbit = shiftleft(shiftright(bl, i).bitwiseAND(1L), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** q46: Z-order clustering. Orders are range-partitioned and sorted
    * by the interleaved (o_custkey, o_totalprice-bucket) Z-value before
    * the write, so parquet row-group min/max stats are simultaneously
    * tight on BOTH columns — a filter on either (or both) skips most
    * row groups, where a single-column sort helps only its own column.
    * The layout is invisible in the result (oracle = the same filter on
    * the unclustered table); LayoutSpec asserts both predicates reach
    * the scan as PushedFilters.
    */
  def zOrderScan(spark: SparkSession, dir: String): DataFrame = {
    val out = Scratch.dir(spark, "q46_zorder", dir).toString
    val z = interleave16(col("o_custkey"),
      (col("o_totalprice") / 8192.0).cast("long")) // ~16-bit price bucket
    Tables.orders(spark, dir)
      .withColumn("zv", z)
      .repartitionByRange(8, col("zv"))
      .sortWithinPartitions(col("zv"))
      .drop("zv")
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .filter(col("o_custkey").between(100, 200) &&
        col("o_totalprice").between(50000.0, 150000.0))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Assign contiguous 1-based global row ids ordered by `keyCol` — the
    * "give every document a stable id" pass at the head of a training
    * pipeline — WITHOUT the single-partition collapse that
    * `row_number() OVER (ORDER BY key)` plans as (Spark puts an
    * empty-partition-spec window in ONE task; at 100 TB that is one
    * executor sorting the corpus). Classic two-pass shape instead:
    *
    *  1. range-partition + sort by the key (the same shuffle a global
    *     sort pays — but parallel), pinned with an eager
    *     `localCheckpoint` so both downstream passes see identical
    *     partition boundaries (RangePartitioner samples its bounds; in
    *     production this pin is the sorted table you just wrote);
    *  2. count rows per partition — ≤ one row PER PARTITION, a
    *     metadata-sized aggregate — and turn counts into per-partition
    *     start offsets with a cumulative sum over that tiny frame;
    *  3. broadcast-join offsets back and add each row's LOCAL rank,
    *     read off `monotonically_increasing_id()`'s documented layout
    *     (partition index in the upper bits, record number WITHIN the
    *     partition in the low 33): over the pinned sorted layout the
    *     record number IS the local sort rank, so numbering costs one
    *     map-side projection — no window over the data and no
    *     post-sort shuffle at all (a `row_number() OVER (PARTITION BY
    *     pid)` here would re-Exchange the corpus on `_pid` just to
    *     re-establish a clustering the layout already has).
    *
    * Result is bit-identical to the naive global window (spec-asserted)
    * with max parallel-sorted-partition cost instead of corpus cost.
    */
  def stableIds(df: DataFrame, keyCol: String, partitions: Int,
                pin: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df
      .repartitionByRange(partitions, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .withColumn("_pid", spark_partition_id())
    // pin=false only for plan dumps (localCheckpoint collapses the
    // upstream plan to a Scan ExistingRDD, hiding the range exchange)
    val sorted = if (pin) ranged.localCheckpoint() else ranged
    val offsets = sorted.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      // ≤ `partitions` rows: the single-partition window here is over a
      // metadata-sized frame, not the data
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(
          Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_pid"), col("_offset"))
    sorted
      // record number within the partition = low 33 bits of the id
      // (documented `monotonically_increasing_id` layout); rows stream
      // out of the pinned sorted partition in key order, so this is
      // the 0-based local rank
      .withColumn("_local", monotonically_increasing_id()
        .bitwiseAND((1L << 33) - 1))
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn("rid", col("_offset") + col("_local") + 1L)
      .drop("_pid", "_offset", "_local")
  }

  /** q68: stable global ids over the orders table, oracle-checked
    * row-for-row against DuckDB's `row_number() OVER (ORDER BY
    * o_orderkey)` — the scalable plan must be indistinguishable from
    * the naive one.
    */
  def stableIdsQuery(spark: SparkSession, dir: String): DataFrame =
    stableIds(Tables.orders(spark, dir).select(col("o_orderkey")),
        "o_orderkey", spark.sessionState.conf.numShufflePartitions)
      .select(col("o_orderkey"), col("rid"))
      .orderBy(col("o_orderkey"))

  /** q76: aggregation on the bucketed table — bucketing pays off for
    * GROUP BY too, not only joins (q45): the bucketed scan reports
    * hash-partitioning on the bucket key, which satisfies the
    * aggregate's required distribution, so the per-key aggregation
    * runs with NO Exchange below it (asserted in `LayoutSpec`). At
    * 100 TB this removes the full-table shuffle from every
    * per-key rollup over the bucketed store — the write-once shuffle
    * amortized across aggs AND joins. Oracle = the same aggregate
    * over the plain table.
    */
  def bucketedAgg(spark: SparkSession, dir: String): DataFrame = {
    writeBucketedFixtures(spark, dir)
    bucketedAggBare(spark)
  }
  private[operators] def bucketedAggBare(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    spark.table(tbl(spark, "g_lineitem_bucketed"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      .orderBy(col("l_orderkey"))
  }

  /** q77: DYNAMIC partition pruning — the runtime analog of q44's
    * plan-time pruning. The fact copy is partitioned on the join key;
    * the dim side shrinks at RUNTIME through a non-partition filter
    * (`klass = 'hot'` — nothing about the fact's partition values is
    * known at plan time), and Catalyst injects a
    * `DynamicPruningSubquery` into the fact scan: only the partitions
    * whose keys survive on the dim side are listed and read
    * (`dynamicpruningexpression` in the scan's PartitionFilters,
    * asserted in `LayoutSpec`). At 100 TB this is the difference
    * between scanning 2/5 and 5/5 of a date- or category-partitioned
    * fact whenever the restriction arrives through a join rather than
    * a literal. The dim derives closed-form from orders, so the
    * oracle re-runs the same join unpartitioned.
    */
  def dynamicPartitionPrune(spark: SparkSession, dir: String): DataFrame = {
    val out = Scratch.dir(spark, "q77_dpp", dir).toString
    Tables.orders(spark, dir)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    dppAgg(spark.read.parquet(out), dppDim(spark, dir))
  }
  private[operators] def dppDim(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("p")).distinct()
      .withColumn("klass",
        when(substring(col("p"), 1, 1).isin("1", "2"), "hot").otherwise("cold"))
  private[operators] def dppAgg(fact: DataFrame, dim: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    fact.join(dim.filter(col("klass") === "hot"),
        fact("o_orderpriority") === dim("p"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("total"))
      .orderBy(col("o_orderpriority"))
  }
}
