package graft.tools

import graft.Tables
import graft.functions.{HashFns, TextFns}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (not part of the driver contract). */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[perf] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // ---- same-JVM spread A/B: heavy kernels over 1-partition vs spread
    if (args.length > 1 && args(1) == "spreadab") {
      val raw = spark.read.parquet(s"$dir/documents.parquet")
      val spreadDf = raw.repartition(spark.sparkContext.defaultParallelism)
      // warmup both shapes
      Dedup.minHashLshPairsPortable(raw.limit(500), "doc_id", "text").count()
      Dedup.minHashLshPairsPortable(spreadDf.limit(500), "doc_id", "text").count()
      graft.Bench.dropAllStorage(spark)
      (1 to 3).foreach { rep =>
        println(s"[perf] --- rep $rep ---")
        Seq("raw" -> raw, "spread" -> spreadDf).foreach { case (label, d) =>
          time(s"d03 chain ($label)")(println("n=" +
            Dedup.minHashLshPairsPortable(d, "doc_id", "text").count()))
          graft.Bench.dropAllStorage(spark)
          time(s"ngram chain ($label)")(println("n=" +
            Dedup.ngramJaccardPairsPortable(d, "doc_id", "text").count()))
          graft.Bench.dropAllStorage(spark)
        }
      }
      spark.stop(); return
    }

    // ---- same-JVM anchor A/B: all-pairs stage 1-partition vs spread
    if (args.length > 1 && args(1) == "anchorab") {
      def anchor(spreadLeft: Boolean): Long = {
        val sh = spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") < 250)
          .select(col("doc_id"),
            graft.functions.HashFns.sortedShingleSet(
              TextFns.normalizeText(col("text")), 5).as("sh"))
          .localCheckpoint(true)
        val left = if (spreadLeft)
          sh.repartition(spark.sessionState.conf.numShufflePartitions) else sh
        val a = left.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        val n = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
          .withColumn("jaccard",
            graft.functions.HashFns.jaccardSorted(col("sh_a"), col("sh_b")))
          .filter(col("jaccard") >= 0.25).count()
        graft.Bench.dropAllStorage(spark); n
      }
      anchor(false); anchor(true) // warmup both
      (1 to 3).foreach { rep =>
        println(s"[perf] --- rep $rep ---")
        time("anchor raw   ")(println("n=" + anchor(false)))
        time("anchor spread")(println("n=" + anchor(true)))
      }
      spark.stop(); return
    }

    // ---- pushdown-through-repartition probe ---------------------------
    if (args.length > 1 && args(1) == "pushdown") {
      val df = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(32)
        .filter(col("doc_id") < 250)
        .select(col("doc_id"))
      println(df.queryExecution.executedPlan.toString)
      spark.stop(); return
    }

    // ---- time named registered queries (bench-style, 2 reps) ---------
    if (args.length > 1 && args(1) == "q") {
      val names = args.drop(2).toSeq
      // fail fast on a typo'd name: a silently skipped warmup would
      // fold JIT/codegen cost into rep 1 and quietly undermine the
      // same-JVM discipline this tool exists to enforce
      val unknown = names.filterNot(graft.SparkEntry.queries.contains)
      require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
      // untimed warmup at the smallest fixture (JIT/codegen), then two
      // timed reps at `dir`, storage dropped between — Bench's recipe
      names.foreach { n =>
        try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
        catch { case t: Throwable =>
          println(s"[perf] WARNING: warmup of $n threw ${t.getClass.getSimpleName}" +
            s" (${t.getMessage}) — rep-1 timings will include JIT/codegen cost")
        }
      }
      graft.Bench.dropAllStorage(spark)
      (1 to 2).foreach { rep =>
        println(s"[perf] --- rep $rep ---")
        names.foreach { n =>
          time(n)(println("n=" + graft.SparkEntry.queries(n)(spark, dir).count()))
          graft.Bench.dropAllStorage(spark)
        }
      }
      spark.stop(); return
    }

    // ---- d28 stage decomposition (16×2 geometry) -----------------------
    // Times the alt-geometry chain stage by stage over `dir` (use the
    // ScaleStress 10× corpus): hash/sign, banded enumeration+filter,
    // + pair dedup, full chain. Deltas between the counts isolate the
    // bottleneck (enumeration CPU vs dedup shuffle vs verify joins).
    if (args.length > 1 && args(1) == "d28stages") {
      val docs = graft.Tables.documents(spark, dir)
      (1 to 2).foreach { rep =>
        println(s"[perf] --- rep $rep ---")
        val hashed = time("hash+sig (persist)") {
          val h = graft.operators.Dedup.lshHashedPortableDebug(docs).persist()
          h.count(); h
        }
        val banded = graft.operators.Dedup.portableBanded(hashed, 16, 2)
        time("enum+minMatch filter")(println("n=" +
          graft.operators.Dedup.guardedBandedSelfJoin(banded, 10000)
            .filter(graft.functions.HashFns.signatureMatchCount(
              col("sig_a"), col("sig_b")) >= 13).count()))
        time("enum only (no filter)")(println("n=" +
          graft.operators.Dedup.guardedBandedSelfJoin(banded, 10000).count()))
        time("+ dedup")(println("n=" +
          graft.operators.Dedup.guardedBandedSelfJoin(banded, 10000)
            .filter(graft.functions.HashFns.signatureMatchCount(
              col("sig_a"), col("sig_b")) >= 13)
            .select(col("doc_a"), col("doc_b"))
            .dropDuplicates("doc_a", "doc_b").count()))
        graft.Bench.dropAllStorage(spark)
      }
      spark.stop(); return
    }

    // ---- same-JVM A/B over the portable-chain variants:
    //  "plain"   = exact count prefilter + plain merge verify (pre-r13)
    //  "early"   = exact count prefilter + thresholded merge verify
    //              (the SHIPPED r13 chain shape — ~10% at both
    //              geometries, counts identical)
    //  "atleast" = early-exit matchAtLeast prefilter + thresholded
    //              verify (BUILT AND REJECTED r13: the data-dependent
    //              branches defeat the JIT on the branch-light count
    //              loop at 600M-pair enumeration volume — 16-band read
    //              25.0s min vs plain 22.5s)
    //  "bytes"   = two-stage byte prefilter (BUILT AND REJECTED r13:
    //              false byte-equalities admit the near-threshold bulk
    //              into the dedup + hs verify join at 16×2 density —
    //              40.4s min vs plain 22.5s)
    if (args.length > 1 && args(1) == "d28ab") {
      val docs = graft.Tables.documents(spark, dir)
      def chain(bands: Int, variant: String): Long = {
        val rows = 32 / bands
        val hashed = graft.operators.Dedup.lshHashedPortableDebug(docs).persist()
        val candidates = (if (variant == "bytes")
          graft.operators.Dedup.guardedBandedSelfJoin(
              graft.operators.Dedup.portableBandedBytes(hashed, bands, rows), 10000)
            .filter(graft.functions.HashFns.signatureMatchCountBytes(
              col("sigb_a"), col("sigb_b")) >= 13)
        else if (variant == "atleast")
          graft.operators.Dedup.guardedBandedSelfJoin(
              graft.operators.Dedup.portableBanded(hashed, bands, rows), 10000)
            .filter(graft.functions.HashFns.signatureMatchAtLeast(
              col("sig_a"), col("sig_b"), 13))
        else
          graft.operators.Dedup.guardedBandedSelfJoin(
              graft.operators.Dedup.portableBanded(hashed, bands, rows), 10000)
            .filter(graft.functions.HashFns.signatureMatchCount(
              col("sig_a"), col("sig_b")) >= 13))
          .select(col("doc_a"), col("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
        val joined = candidates
          .join(hashed.select(col("id").as("doc_a"), col("sig").as("sig_a"),
            col("hs").as("hs_a")), "doc_a")
          .join(hashed.select(col("id").as("doc_b"), col("sig").as("sig_b"),
            col("hs").as("hs_b")), "doc_b")
        val gated = if (variant == "bytes")
          joined.filter(graft.functions.HashFns.signatureMatchCount(
            col("sig_a"), col("sig_b")) >= 13)
          else joined
        val verified = gated
          .withColumn("jaccard",
            if (variant == "plain")
              graft.functions.HashFns.jaccardSortedLong(col("hs_a"), col("hs_b"))
            else graft.functions.HashFns.jaccardSortedLongAtLeast(
              col("hs_a"), col("hs_b"), 0.6))
          .filter(col("jaccard") >= 0.6)
          .count()
        hashed.unpersist()
        graft.Bench.dropAllStorage(spark)
        verified
      }
      val variants = Seq("plain", "early", "atleast", "bytes")
      Seq(16, 8).foreach(b => variants.foreach(v => chain(b, v))) // warmup
      (1 to 3).foreach { rep =>
        println(s"[perf] --- rep $rep ---")
        Seq(16, 8).foreach { b =>
          variants.foreach { v =>
            time(s"bands=$b $v")(println("n=" + chain(b, v)))
          }
        }
      }
      spark.stop(); return
    }

    // ---- price p01's single eager sizing probe ------------------------
    // The p01 composition runs exactly ONE guardedBandedSelfJoin (the
    // d03 chain inside curate), hence ONE eager hotAgg.isEmpty probe.
    // This isolates its cost: one banded explode+agg pass over the
    // chain's persisted signature frame.
    if (args.length > 1 && args(1) == "p01probe") {
      val docs = graft.Tables.documents(spark, dir)
      (1 to 2).foreach { rep =>
        println(s"[perf] --- rep $rep ---")
        val hashed = time("hash corpus (the chain's persisted sig frame)") {
          val h = graft.operators.Dedup.lshHashedPortableDebug(docs).persist()
          h.count(); h
        }
        val banded = graft.operators.Dedup.portableBanded(hashed, 8, 4)
        time("sizing probe (hotAgg.isEmpty over cached input)")(println("empty=" +
          banded.groupBy(col("band"), col("bkey"))
            .agg(count(lit(1)).as("bsz"))
            .filter(col("bsz") > 10000).isEmpty))
        graft.Bench.dropAllStorage(spark)
      }
      spark.stop(); return
    }

    // ---- two-sided guard decomposition -------------------------------
    if (args.length > 1 && args(1) == "p06guard") {
      // expects a GuardStress outDir as args(0) with lsh_idx built
      val out = args(0)
      val idxDir = s"$out/lsh_idx"
      val docs = spark.read.parquet(s"$out/documents.parquet")
      val nMax = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
      val delta = docs.filter(col("doc_id") >= nMax - 500)
      (1 to 2).foreach { rep =>
        println(s"[perf] --- rep $rep ---")
        val hashed = time("hash delta")(
          graft.operators.Dedup.lshHashedPortableDebug(delta).localCheckpoint(true))
        val newBands = graft.operators.Dedup.lshBandedOfDebug(hashed)
        val idxBands = spark.read.parquet(s"$idxDir/bands")
        val idxSizes = spark.read.parquet(s"$idxDir/sizes")
        time("cross guarded count")(println("n=" +
          graft.operators.Dedup.guardedBandedJoinDebug(newBands, idxBands, 10000, Some(idxSizes)).count()))
        time("cross plain count")(println("n=" +
          graft.operators.Dedup.guardedBandedJoinDebug(newBands, idxBands, Int.MaxValue, Some(idxSizes)).count()))
        graft.Bench.dropAllStorage(spark)
      }
      spark.stop(); return
    }

    // ---- d26 decomposition -------------------------------------------
    if (args.length > 1 && args(1) == "d26") {
      (1 to 2).foreach { rep =>
        println(s"[perf] --- rep $rep ---")
        val exact = time("d26 exact anchor")(
          Dedup.jaccardExactPairs(spark, dir)
            .filter(col("jaccard") >= 0.6)
            .select(col("doc_a"), col("doc_b")).localCheckpoint(true))
        time("d26 exact count")(println("n=" + exact.count()))
        val sliced = time("d26 slice checkpoint")(
          Tables.documents(spark, dir).filter(col("doc_id") < 250)
            .select(col("doc_id"), col("text")).localCheckpoint(true))
        time("d26 d03 slice")(println("n=" +
          Dedup.minHashLshPairsPortable(sliced, "doc_id", "text").count()))
        time("d26 d04 slice")(println("n=" +
          Dedup.simHashPairsPortable(sliced, "doc_id", "text").count()))
        time("d26 d05 slice")(println("n=" +
          Dedup.ngramJaccardPairsPortable(sliced, "doc_id", "text").count()))
        graft.Bench.dropAllStorage(spark)
      }
      spark.stop(); return
    }

    // ---- q82 decomposition -------------------------------------------
    if (args.length > 1 && args(1) == "q82") {
      (1 to 2).foreach { rep =>
        println(s"[perf] --- rep $rep ---")
        val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
        val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
        val directed = l.join(o, l("l_orderkey") === o("o_orderkey"))
          .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
          .distinct()
        time("q82 distinct edges")(println("edges=" + directed.count()))
        val edges = directed.union(directed.select(col("dst").as("src"), col("src").as("dst")))
        val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
        val cEdges = time("q82 cEdges checkpoint")(
          edges.join(deg, edges("src") === deg("node"))
            .select(col("src"), col("dst"), col("outdeg")).localCheckpoint())
        val nodes = time("q82 nodes checkpoint")(deg.select(col("node")).localCheckpoint())
        var ranks = nodes.withColumn("r", lit(graft.operators.Graph.Scale))
        for (i <- 1 to 3) {
          val contrib = cEdges
            .join(broadcast(ranks.withColumnRenamed("node", "rnode")),
              col("src") === col("rnode"))
            .select(col("dst").as("node"), expr("r div outdeg").as("c"))
            .groupBy("node").agg(sum(col("c")).as("inflow"))
          ranks = nodes.join(contrib, Seq("node"), "left")
            .select(col("node"), (lit(graft.operators.Graph.Teleport) +
              expr("(85L * coalesce(inflow, 0L)) div 100L")).as("r"))
          time(s"q82 sweep $i")(ranks.count())
        }
        time("q82 final topk")(
          ranks.orderBy(col("r").desc, col("node")).limit(20).count())
        graft.Bench.dropAllStorage(spark)
      }
      spark.stop(); return
    }

    // ---- d03 decomposition -------------------------------------------
    val base = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), TextFns.normalizeText(col("text")).as("text_norm"))
    val sig = base.select(col("id"),
      HashFns.minhashSig(col("text_norm"), 5, 32).as("sig")).persist()
    time("d03 signatures")(sig.count())
    val cands = Dedup.lshCandidatesRaw(sig, 8, 4)
    time("d03 raw candidates")(println("cands=" + cands.count()))
    val prefiltered = cands
      .join(sig.select(col("id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sig.select(col("id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est", HashFns.signatureMatchFraction(col("sig_a"), col("sig_b")))
      .filter(col("est") >= 0.4)
      .select(col("doc_a"), col("doc_b"))
    time("d03 prefilter")(println("prefiltered=" + prefiltered.count()))
    val shingled = base.select(col("id"),
      HashFns.sortedShingleSet(col("text_norm"), 5).as("sh"))
    time("d03 shingle sets only")(shingled.count())
    val verified = prefiltered
      .join(shingled.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shingled.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", HashFns.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.6)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .dropDuplicates("doc_a", "doc_b")
    time("d03 verify join")(println("pairs=" + verified.count()))
    sig.unpersist()
    time("d03 shipped x3")((1 to 3).foreach(_ =>
      Dedup.minHashDedup(spark, dir).count()))

    spark.stop()
  }
}
