package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic split: total coverage, sane fractions, growth-stable") {
    val assigned = Curation.deterministicSplit(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(assigned.count() == n) // every doc gets exactly one split
    val byS = assigned.groupBy($"split").count().as[(String, Long)].collect().toMap
    // 75 / 12.5 / 12.5 nominal; allow wide slack at 500 docs
    assert(byS("train") > n * 6 / 10 && byS("train") < n * 9 / 10, byS)
    assert(byS.keySet == Set("train", "val", "test"), byS)
    // growth-stability: run the split over a PHYSICALLY SMALLER corpus
    // (the first 100 docs written as their own table) — a corpus-
    // dependent assignment (ntile, percent_rank, count-based) would
    // diverge from the full-corpus assignment; hash-prefix assignment
    // cannot (the leak-free-eval property)
    val full = assigned.as[(Long, String)].collect().toMap
    val small = graft.util.Scratch.dir(spark, "split_prefix_docs", sf)
    Tables.documents(spark, sf).filter($"doc_id" < 100)
      .write.parquet(small.resolve("documents.parquet").toString)
    val prefix = Curation.deterministicSplit(spark, small.toString)
      .as[(Long, String)].collect().toMap
    assert(prefix.size == 100)
    prefix.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("balanced sample caps every group and is deterministic") {
    val s1 = Curation.balancedSample(spark, sf, cap = 20)
    val sizes = s1.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ <= 20), sizes)
    // every lang with >=20 docs is fully capped (docs per lang ~60+)
    assert(sizes.values.forall(_ == 20), sizes)
    val s2 = Curation.balancedSample(spark, sf, cap = 20)
    assert(s1.collect().toSeq == s2.collect().toSeq)
  }

  test("weighted mix respects per-group rates and is growth-stable") {
    val mixed = Curation.weightedMix(spark, sf)
    val total = Tables.documents(spark, sf).groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val kept = mixed.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(kept("en") == total("en")) // weight 256 = keep all
    // fr at 192/256 = 75%, default 128/256 = 50% — wide slack at ~60-70 docs
    assert(kept("fr") > total("fr") / 2 && kept("fr") < total("fr"), (kept, total))
    val others = total.keySet - "en" - "fr"
    others.foreach { l =>
      assert(kept(l) > total(l) / 4 && kept(l) < total(l) * 3 / 4, (l, kept(l), total(l)))
    }
    // keep decision is per-row: mixing again yields the identical set
    assert(mixed.collect().toSeq == Curation.weightedMix(spark, sf).collect().toSeq)
  }

  test("priority dedup keeps the highest-priority copy per content key") {
    // planted: same normalized content in three langs; en must win.
    // Distinct content per group via the index suffix.
    val docs = Seq(
      (10L, "zh", "shared content alpha"), (11L, "en", "shared content alpha"),
      (12L, "fr", "shared content alpha"),
      (20L, "fr", "shared content beta"), (21L, "es", "shared content beta"),
      (30L, "de", "unique content gamma"),
    ).toDF("doc_id", "lang", "text")
    // exercise the same expression chain as d09 against the planted frame
    val prio = when($"lang" === "en", 0).when($"lang" === "fr", 1).otherwise(2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"ckey").orderBy($"prio", $"doc_id")
    val kept = docs
      .select($"doc_id", $"lang", prio.as("prio"),
        md5(graft.functions.TextFns.normalizeText($"text").cast("binary")).as("ckey"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    assert(kept == Map(11L -> "en", 20L -> "fr", 30L -> "de"), kept)
    // fixture entry point: one keeper per content key, copies accounted
    val d09 = Curation.priorityDedup(spark, sf)
    val total = d09.agg(sum($"n_copies")).as[Long].head()
    assert(total == Tables.documents(spark, sf).count())
  }

  test("q57 sequence packing: per-shard exact running offsets, budget chunking, all docs packed") {
    val rows = Curation.sequencePack(spark, sf)
      .select($"doc_id", $"n_tokens", $"shard", $"start_off", $"pack_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.groupBy(_._3).foreach { case (shard, docs) =>
      val inOrder = docs.sortBy(_._1)
      var off = 0L
      inOrder.foreach { case (_, nTok, _, startOff, packId) =>
        assert(startOff == off, s"shard $shard: running offset must be exact")
        // shard rides the high 22 bits (chunk space 2^41 — collision-free
        // to ~4.5e15 tokens/shard; a 1e6 multiplier collided at ~2e9)
        assert(packId == shard * 2199023255552L + startOff / 2048,
          "pack = shard-local chunk of the token stream")
        off += nTok
      }
    }
  }

  test("d12 decontamination: every excerpt source doc flags itself") {
    val hits = Curation.decontaminate(spark, sf)
      .as[(Long, Long)].collect().toMap
    val sources = Tables.documents(spark, sf)
      .filter($"doc_id" % 97 === 0).select($"doc_id").as[Long].collect()
    assert(sources.nonEmpty)
    sources.foreach { id =>
      assert(hits.getOrElse(id, 0L) >= 1L,
        s"doc $id contains its own eval excerpt and must be flagged")
    }
    assert(hits.values.forall(_ >= 1L))
  }

  test("d16 bloom-prefiltered decontamination equals the exact-join d12") {
    val exact = Curation.decontaminate(spark, sf)
      .as[(Long, Long)].collect().toSeq.sorted
    val bloom = Curation.decontaminateBloom(spark, sf)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(exact.nonEmpty && bloom == exact)
  }

  test("q58 token-budget mix: per-source cap respected and draw is maximal") {
    val budget = 600L
    val mix = Curation.tokenBudgetMix(spark, sf, budget)
      .select($"doc_id", $"source", $"n_tokens", $"cum_tokens")
      .as[(Long, String, Long, Long)].collect()
    assert(mix.nonEmpty)
    // cap: every kept cumulative count is within budget and consistent
    mix.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.last._4 <= budget)
      assert(sorted.map(_._3).sum == sorted.last._4,
        "cum_tokens is exactly the running sum of kept docs")
    }
    // maximality: re-running with a larger budget keeps a superset and
    // every source's next draw would have burst the original budget
    val wider = Curation.tokenBudgetMix(spark, sf, budget * 2)
      .select($"doc_id", $"source", $"cum_tokens")
      .as[(Long, String, Long)].collect()
    val kept = mix.map(m => (m._1, m._2)).toSet
    assert(kept.subsetOf(wider.map(w => (w._1, w._2)).toSet),
      "growing the budget never drops a previously-chosen doc")
    wider.groupBy(_._2).foreach { case (src, rows) =>
      val firstOut = rows.filter(r => !kept.contains((r._1, src))).map(_._3)
      if (firstOut.nonEmpty)
        assert(firstOut.min > budget, s"$src: a doc under budget was skipped")
    }
  }

  test("q59 cluster-aware split: no near-dup cluster straddles splits; singletons = q41") {
    val rows = Curation.clusterAwareSplit(spark, sf)
      .as[(Long, Long, String)].collect()
    assert(rows.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // the leakage guarantee: one split per unit
    rows.groupBy(_._2).foreach { case (unit, members) =>
      assert(members.map(_._3).distinct.length == 1, s"unit $unit straddles splits")
    }
    // clustered docs co-locate with every clustermate
    val clusters = graft.operators.Dedup.dupClustersQuery(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(clusters.nonEmpty)
    val splitOf = rows.map(r => r._1 -> r._3).toMap
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.map(splitOf).toSeq.distinct.length == 1, s"cluster $cid leaks")
    }
    // un-clustered docs get exactly the q41 assignment
    val q41 = Curation.deterministicSplit(spark, sf)
      .as[(Long, String)].collect().toMap
    rows.filter(r => !clusters.contains(r._1)).foreach { case (id, unit, split) =>
      assert(unit == id && split == q41(id), s"doc $id diverges from q41")
    }
  }

  test("p02 mixture: two-pass budgeted prefix ≡ naive global window; budget and balance hold") {
    import graft.functions.TextFns._
    import org.apache.spark.sql.expressions.Window
    val out = Curation.ccnetMixture(spark, sf)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    // budget respected per lang; cum strictly increasing along the
    // (rank, doc_id) order ⇒ the kept set is a true prefix
    out.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._4).sum == rows.map(_._5).max, s"$lang cum≠sum")
      assert(rows.map(_._5).max <= 1500L, s"$lang busts the budget")
    }
    // naive recompute: same scoring kernel, ONE global window per lang
    // (the plan p02 must be bit-identical to, per the q68 proof pattern)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang",
        filter(tokens(normalizeText($"text")), t => length(t) > 0).as("toks"))
    val scored = TextAnalysis.lmDocScores(
      docs.select($"doc_id", $"toks"), $"doc_id" % 10 < 8, lit(true))
    val m = docs.filter(size($"toks") >= 16)
      .select($"doc_id", $"lang", size($"toks").cast("long").as("n_tokens"))
      .join(scored, Seq("doc_id"))
      .select($"doc_id", $"lang", $"n_tokens",
        when($"n_bigrams" === 0L, 0L)
          .otherwise(expr("(lm_score * 1000) div n_bigrams")).as("mscore"))
    val wl = Window.partitionBy($"lang")
    val naive = m
      .withColumn("lmean", expr(
        "sum(mscore) over (partition by lang) div count(*) over (partition by lang)"))
      .withColumn("bucket", when($"mscore" >= $"lmean" + 15L, "head")
        .when($"mscore" >= $"lmean" - 40L, "middle").otherwise("tail"))
      .filter($"bucket" =!= "tail")
      .withColumn("rnk", when($"bucket" === "head", 0).otherwise(1))
      .withColumn("cum_tokens", sum($"n_tokens").over(
        wl.orderBy($"rnk", $"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter($"cum_tokens" <= 1500L)
      .select($"doc_id", $"lang", $"bucket", $"n_tokens", $"cum_tokens")
      .orderBy($"lang", $"cum_tokens")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(out == naive, s"two-pass diverges from naive window:\n$out\nvs\n$naive")
  }

  test("p03 tokenized pack: exactly the p02 selection, q57 pack algebra over trained counts") {
    val rows = Curation.tokenizedPack(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // doc set == the mixture selection, each doc exactly once
    val sel = Curation.ccnetMixture(spark, sf).select($"doc_id")
      .as[Long].collect().toSet
    assert(rows.map(_._1).toSet == sel && rows.map(_._1).distinct.size == rows.size)
    // trained counts == the batched 64-merge encode (t34's meter —
    // the one token denomination shared with s23/t35)
    val enc = graft.operators.TextAnalysis.bpeEncodeBatched(spark, sf)
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, n, _, _, _) => assert(n == enc(id), s"doc $id count") }
    // pack algebra per shard: offsets are the running sum in id order,
    // pack_id = (shard << 41) + start_off div budget
    rows.groupBy(_._3).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_._1)
      var off = 0L
      sorted.foreach { case (_, n, sh, start, pack) =>
        assert(start == off && sh == shard)
        assert(pack == shard * 2199023255552L + start / 2048L)
        off += n
      }
    }
  }

  test("p06 incremental refresh: delta minus near-dup victims minus flagged, q57 pack algebra") {
    val split = Dedup.incrementalSplit
    // victims from the CONSTITUENT gate (the full d03 chain) — every
    // pair touching the delta names its delta member as doc_b
    val victims = Dedup.minHashDedupPortable(spark, sf)
      .filter($"doc_b" >= split)
      .select($"doc_b").as[Long].collect().toSet
    val flagged = Curation.decontaminate(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val delta = Tables.documents(spark, sf)
      .filter($"doc_id" >= split)
      .select($"doc_id",
        size(graft.functions.TextFns.tokens($"text")).cast("long").as("n"))
      .as[(Long, Long)].collect().toSeq
    val survivors = delta.filter { case (id, _) => !victims(id) && !flagged(id) }
      .sortBy(_._1)
    // expected per-shard running offsets — q57's algebra, driver-side
    val off = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val exp = survivors.map { case (id, ntk) =>
      val sh = id % 32
      val so = off(sh); off(sh) = so + ntk
      (id, ntk, sh, so, sh * 2199023255552L + so / 2048)
    }
    val got = Curation.incrementalRefresh(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty, "the delta must have survivors on this fixture")
    assert(victims.nonEmpty, "the fixture must exercise the dedup stage")
    assert(got == exp, s"p06 diverges: got ${got.size}, exp ${exp.size}")
  }

  test("p07 datasheet: stats agree with the constituent gates; mix partitions the shipped set") {
    val stats = Curation.datasheet(spark, sf)
      .as[(String, Long)].collect().toMap
    val packed = Curation.corpusPipeline(spark, sf)
      .select($"n_tokens", $"pack_id").as[(Long, Long)].collect().toSeq
    assert(stats("docs_total") == Tables.documents(spark, sf).count())
    assert(stats("docs_packed") == packed.size.toLong)
    assert(stats("docs_packed") ==
      stats("docs_curated") - stats("docs_contaminated"))
    assert(stats("tokens_packed") == packed.map(_._1).sum)
    assert(stats("packs") == packed.map(_._2).distinct.size.toLong)
    assert(stats("docs_distinct_norm") <= stats("docs_total"))
    assert(stats("docs_contaminated") > 0L,
      "fixture must exercise the decontamination stat")
    // the lang and source mixes each partition exactly the shipped set
    Seq("lang_docs_", "source_docs_").foreach { p =>
      val mix = stats.filter(_._1.startsWith(p))
      assert(mix.nonEmpty, s"$p rows missing")
      assert(mix.values.sum == stats("docs_packed"), s"$p must sum to shipped")
    }
  }

  test("p04 temperature mix matches a driver-side reference; rarest lang keeps all") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSeq
    val n = docs.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
    val nMin = n.values.min
    val thr = n.map { case (l, c) =>
      l -> math.floor(65536.0 * math.sqrt(nMin.toDouble / c.toDouble)).toLong
    }
    def hex4(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
    }
    val exp = docs.filter { case (id, l) =>
      val t = thr(l)
      t >= 65536L || hex4(id) < f"$t%04x"
    }.sortBy(_._1)
    val got = Curation.temperatureMix(spark, sf)
      .as[(Long, String)].collect().toSeq
    assert(got == exp, s"selection diverges (got ${got.size}, exp ${exp.size})")
    // the n_min language is kept in full; keep RATES are monotone
    // decreasing in language size (the α-temperature contract)
    val keptBy = got.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
    val minLang = n.minBy(_._2)._1
    assert(keptBy(minLang) == n(minLang), "rarest language must keep everything")
    val rates = n.keys.map(l => (n(l), keptBy.getOrElse(l, 0L).toDouble / n(l))).toSeq
    rates.sortBy(_._1).sliding(2).foreach {
      case Seq((n1, r1), (n2, r2)) =>
        // allow hash noise: a strictly larger lang may not keep a
        // strictly larger SHARE, but expected rate √(n_min/n) falls —
        // check against the analytic rate within ±0.12
        assert(math.abs(r1 - math.sqrt(nMin.toDouble / n1)) < 0.12, s"($n1, $r1)")
        assert(math.abs(r2 - math.sqrt(nMin.toDouble / n2)) < 0.12, s"($n2, $r2)")
      case _ =>
    }
  }
}
