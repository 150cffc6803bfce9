package graft

import graft.functions.HashFns
import graft.sources.AdaptivePlanner
import graft.sources.AdaptivePlanner._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck invariants over the pure (no-Spark-session) kernels —
  * SURVEY §5.3's property-test layer.
  */
object PropertiesCheck extends Properties("graft") {

  // — sortedJaccard ≡ set-based jaccard on sorted distinct inputs —
  private val tokenGen = Gen.listOf(Gen.choose(0, 50).map(_.toString))
  property("sortedJaccard matches set semantics") =
    Prop.forAll(tokenGen, tokenGen) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val got = HashFns.sortedJaccard(
        new GenericArrayData(sa.map(UTF8String.fromString).toArray[Any]),
        new GenericArrayData(sb.map(UTF8String.fromString).toArray[Any]))
      val (xs, ys) = (sa.toSet, sb.toSet)
      val exp =
        if (xs.union(ys).isEmpty) 0.0
        else xs.intersect(ys).size.toDouble / xs.union(ys).size
      math.abs(got - exp) < 1e-15
    }

  // — jaccard bounds + symmetry + identity —
  property("sortedJaccard ∈ [0,1], symmetric, self=1") =
    Prop.forAll(tokenGen) { a =>
      val sa = a.distinct.sorted
      val arr = new GenericArrayData(sa.map(UTF8String.fromString).toArray[Any])
      val self = HashFns.sortedJaccard(arr, arr)
      (sa.isEmpty && self == 0.0) || self == 1.0
    }

  // — sortedIntersectCountLong ≡ set intersection, and the jaccard
  //   kernel is exactly inter/(|a|+|b|−inter) over it —
  private val longSetGen = Gen.listOf(Gen.choose(0L, 60L))
  property("sortedIntersectCountLong matches set semantics; jaccard consistent") =
    Prop.forAll(longSetGen, longSetGen) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val aa = new GenericArrayData(sa.toArray[Any])
      val bb = new GenericArrayData(sb.toArray[Any])
      val inter = HashFns.sortedIntersectCountLong(aa, bb)
      val expInter = sa.toSet.intersect(sb.toSet).size.toLong
      val jac = HashFns.sortedJaccardLong(aa, bb)
      val expJac =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else inter.toDouble / (sa.size + sb.size - inter)
      inter == expInter && jac == expJac
    }

  // — minhash determinism + permutation sensitivity only via content —
  private val strGen = Gen.alphaNumStr.suchThat(_.length >= 5)
  property("minhash signature is deterministic and content-addressed") =
    Prop.forAll(strGen) { s =>
      val u = UTF8String.fromString(s)
      val a = HashFns.minhashShingles(u, 5, 16).toLongArray()
      val b = HashFns.minhashShingles(UTF8String.fromString(s), 5, 16).toLongArray()
      a.sameElements(b)
    }

  // — fused normalizeRest kernel ≡ the reference regex chain, over
  //   arbitrary valid-unicode strings (surrogate halves excluded: they
  //   cannot occur in parquet UTF-8 data) —
  private val uniCharGen: Gen[Char] = Gen.frequency(
    6 -> Gen.oneOf("ab YZ09é&nbsp*,.-:;«»✔➡¿·\\\"?!()/\t\r\n\f —".toSeq),
    1 -> Gen.choose(32, 0xD7FF).map(_.toChar))
  private val uniStrGen: Gen[String] = Gen.listOf(uniCharGen).map(_.mkString)
  private def chainNormalize(lowered: String): String = {
    val noCr = lowered.replaceAll("\\r", " ")
    val noNbsp = noCr.replaceAll("&nbsp", " ")
    val noPunct = noNbsp.replaceAll("[,*-.:;«»✔➡¿\\\\\"·?!()/]", " ")
    val noWs = noPunct.replaceAll("\\s", " ")
    noWs.replaceAll(" +", " ").replaceAll("^ | $", "")
  }
  property("fused normalizeRest matches the java-regex chain") =
    Prop.forAll(uniStrGen) { s =>
      // kernel input is post-lower, like the composed expression
      val lowered = UTF8String.fromString(s).toLowerCase.toString
      graft.functions.TextFns.normalizeRest(
        UTF8String.fromString(lowered)).toString == chainNormalize(lowered)
    }

  // — fused sorted shingle set ≡ distinct+sorted codepoint windows —
  property("sortedShingles = sorted distinct codepoint windows") =
    Prop.forAll(uniStrGen, Gen.choose(1, 6)) { (s, n) =>
      val u = UTF8String.fromString(s)
      val got = {
        val a = graft.functions.HashFns.sortedShingles(u, n)
        (0 until a.numElements()).map(a.getUTF8String(_).toString)
      }
      val cps = s.codePoints().toArray
      val nWin = math.max(cps.length - n + 1, 1)
      val exp = (0 until nWin)
        .map(i => new String(cps, i, math.min(n, cps.length - i).max(0)))
        .distinct
        .map(UTF8String.fromString).sorted(Ordering.fromLessThan[UTF8String](_.compareTo(_) < 0))
        .map(_.toString)
      got == exp
    }

  // — simhash: equal token multisets → equal signature —
  property("simhash is order-insensitive over tokens") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { toks =>
      def sig(ts: Seq[String]) = HashFns.simhash64(
        new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any]))
      sig(toks) == sig(scala.util.Random.shuffle(toks))
    }

  // — pagination covers [0, total) exactly, in pageSize steps (S4) —
  property("pages tile the range exactly") =
    Prop.forAll(Gen.choose(0L, 100000L), Gen.choose(1, 500)) { (total, pageSize) =>
      val ps = AdaptivePlanner.pages(FetchFilter(), total, pageSize)
      val covered = ps.map(p => p.range.end - p.range.start + 1L).sum
      val contiguous = ps.map(_.range).sortBy(_.start)
        .sliding(2).forall {
          case Seq(a, b) => b.start == a.end + 1
          case _ => true
        }
      covered == math.max(total, 0) && contiguous &&
        ps.forall(p => p.range.end - p.range.start + 1 <= pageSize)
    }

  // — plan never silently drops rows: planned + overflowed == probed (A3) —
  property("plan conserves counts (planned + overflow = total)") = {
    val countsGen = for {
      nR <- Gen.choose(1, 4)
      counts <- Gen.listOfN(nR, Gen.choose(0L, 10000L))
    } yield counts
    Prop.forAll(countsGen) { regionCounts =>
      val regions = regionCounts.indices.map(i => s"R$i")
      val depts = regions.map(r => s"D$r" -> r).toMap
      // every region's total lives in its single departement
      val count: FetchFilter => Long = {
        case FetchFilter(Some(r), None, None) => regionCounts(r.drop(1).toInt)
        case FetchFilter(None, Some(d), None) => regionCounts(d.drop(2).toInt)
        case FetchFilter(None, Some(d), Some(_)) => regionCounts(d.drop(2).toInt)
        case _ => 0L
      }
      val plan = AdaptivePlanner.plan(count, regions, depts, Seq("M1"),
        maxPerFilter = 3149, pageSize = 150)
      // planned partitions + overflow totals must account for every
      // region's probed count (overflow only at the leaf level)
      val overflowTotal = plan.overflows.map(_.total).sum
      plan.totalPlanned + overflowTotal == regionCounts.sum
    }
  }

  // — Bloom filter (via the PRODUCTION Aggregator reduce/merge path) —
  private val keysGen = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
  private def bloomBuild(keys: Seq[Long]): Array[Long] = {
    val agg = graft.functions.Bloom.bloomAgg
    agg.finish(keys.foldLeft(agg.zero)((b, k) => agg.reduce(b, k)))
  }

  property("bloom admits no false negatives for any inserted key set") =
    Prop.forAll(keysGen) { keys =>
      val bits = bloomBuild(keys)
      keys.forall(graft.functions.Bloom.contains(_, bits))
    }

  // — the OR-merge of the distributed build preserves both sides'
  //   keys (mergeable-summary invariant) —
  property("bloom merge preserves every key from both partitions") =
    Prop.forAll(keysGen, keysGen) { (ka, kb) =>
      val agg = graft.functions.Bloom.bloomAgg
      val merged = agg.finish(agg.merge(
        ka.foldLeft(agg.zero)((b, k) => agg.reduce(b, k)),
        kb.foldLeft(agg.zero)((b, k) => agg.reduce(b, k))))
      (ka ++ kb).forall(graft.functions.Bloom.contains(_, merged))
    }

  // — probe is deterministic —
  property("bloom contains is deterministic per (key, bitset)") =
    Prop.forAll(keysGen, Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (keys, probe) =>
      val bits = bloomBuild(keys)
      graft.functions.Bloom.contains(probe, bits) ==
        graft.functions.Bloom.contains(probe, bits)
    }

  // — the portable-hash family vs an independent BigInt reference —
  //   the md5/mod-M61 split-multiply arithmetic is load-bearing for
  //   nine cross-engine hash gates (d03/d04/d05/d06/d11/t07/t08/
  //   e02/e04), so each layer gets a generator-driven exact check:
  //   hash (md5Gram60 = first 15 md5 hex digits as a 60-bit int),
  //   permutation (split-multiply = HUGEINT (a·h+b) mod M61),
  //   signature (running minima of the permutations), and band
  //   extraction (slice boundaries + "-" join).
  private val bytesGen = Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  property("md5Gram60 = BigInt(first 15 md5 hex chars) over random bytes") =
    Prop.forAll(bytesGen) { bs =>
      val arr = bs.toArray
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(arr).map("%02x".format(_)).mkString
      HashFns.md5Gram60(arr, 0, arr.length) == BigInt(hex.take(15), 16).toLong
    }

  private val h60Gen = Gen.chooseNum(0L, (1L << 60) - 1)
  private val c31Gen = Gen.chooseNum(0L, (1L << 31) - 1)
  property("permuteM61 = BigInt (a·h + b) mod M61 for any 31-bit a,b and 60-bit h") =
    Prop.forAll(c31Gen, c31Gen, h60Gen) { (a, b, h) =>
      HashFns.permuteM61(a, b, h) ==
        ((BigInt(a) * h + b) mod BigInt(HashFns.M61)).toLong
    }

  private val hashSetGen = Gen.nonEmptyListOf(h60Gen).map(_.distinct.sorted)
  property("portableMinhash = per-component BigInt minima; bands slice exactly") =
    Prop.forAll(hashSetGen) { hs =>
      val k = 32
      val sig = HashFns.portableMinhash(
        new GenericArrayData(hs.toArray[Any]), k)
      val M = BigInt(HashFns.M61)
      val expSig = (0 until k).map { j =>
        hs.map(h => ((BigInt(HashFns.PortableA(j)) * h +
          HashFns.PortableB(j)) mod M).toLong).min
      }
      val gotSig = (0 until k).map(sig.getLong)
      // band extraction contract (d03's slice(sig, b·rows+1, rows) +
      // array_join): 8 bands × 4 rows tile the signature exactly, in
      // order, with the "-" join DuckDB reproduces
      val bands = 8; val rows = k / bands
      val gotKeys = (0 until bands).map(b =>
        gotSig.slice(b * rows, b * rows + rows).mkString("-"))
      val expKeys = expSig.grouped(rows).map(_.mkString("-")).toSeq
      gotSig == expSig && gotKeys == expKeys
    }

  // — d22/d23 epsilon-hardened candidate bounds (the r8 ADVICE fix):
  //   the prefix length computed with the 1e-7 slack is NEVER stricter
  //   than the exact-rational prefix (completeness for ANY threshold),
  //   and at most ONE rank looser (the verify pass absorbs the slack) —
  private val tauGen = Gen.chooseNum(0.05, 0.95)
  private val szGen = Gen.chooseNum(1, 5000)
  property("epsilon prefix bound: complete for any threshold, at most one rank loose") =
    Prop.forAll(tauGen, szGen) { (tau, sz) =>
      // the Column expression's double arithmetic, replicated exactly
      val implPrefix = sz - math.ceil(tau * sz - 1e-7) + 1
      // exact rational: BigDecimal of the double tau is its exact
      // binary value — the overlap requirement is ceil of that product
      val exact = BigDecimal(tau) * sz
      val exactCeil = exact.setScale(0, BigDecimal.RoundingMode.CEILING).toInt
      val exactPrefix = sz - exactCeil + 1
      implPrefix >= exactPrefix && implPrefix <= exactPrefix + 1
    }

  property("epsilon positional bound: never rejects an exact-rational-feasible pair") =
    Prop.forAll(tauGen, szGen, szGen, Gen.chooseNum(1, 5000), Gen.chooseNum(1, 5000)) {
      (tau, szA, szB, rkA0, rkB0) =>
        val rkA = math.min(rkA0, szA); val rkB = math.min(rkB0, szB)
        val lhs = 1.0 + math.min(szA - rkA, szB - rkB)
        // exact-rational feasibility of overlap >= tau/(1+tau)·(szA+szB)
        val bound = (BigDecimal(tau) / (BigDecimal(tau) + 1)) * (szA + szB)
        val exactFeasible = BigDecimal(lhs) >= bound
        // the implementation's double-arithmetic filter with the slack
        val implPass = lhs >= tau / (1.0 + tau) * (szA + szB) - 1e-7
        // completeness direction only: exact-feasible ⇒ impl passes
        !exactFeasible || implPass
    }

  // — e07/e15 fixed-point PQ kernels vs BigInt references: training
  //   argmin/divide, encode argmin with first-min ties, and the ADC
  //   table+lookup are exact integer algebra with no Long overflow —
  private val qcompGen = Gen.chooseNum(-(1L << 20), 1L << 20)
  private val qvecGen = Gen.listOfN(8, qcompGen).map(_.toArray)
  property("PQ encodeI64/adcTableI64/adcLookupI64 = BigInt reference") =
    Prop.forAll(Gen.listOfN(6, qvecGen), qvecGen, qvecGen) { (sample, v, q) =>
      val cb = graft.functions.Pq.trainFixedPoint(sample.toArray, m = 2, k = 3, iters = 2)
      val m = cb.length; val k = cb(0).length; val sub = cb(0)(0).length
      def bigDist(x: Array[Long], off: Int, cen: Array[Long]): BigInt =
        (0 until sub).map(i => BigInt(x(off + i) - cen(i)).pow(2)).sum
      // encode: per-subspace argmin, first-min ties
      val code = graft.functions.Pq.encodeI64(new GenericArrayData(v), cb)
      val expCode = (0 until m).map { j =>
        val ds = (0 until k).map(c => bigDist(v, j * sub, cb(j)(c)))
        ds.indexOf(ds.min).toByte
      }
      // ADC table + lookup vs direct BigInt distance of q to v's cells
      val table = graft.functions.Pq.adcTableI64(new GenericArrayData(q), cb)
      val score = graft.functions.Pq.adcLookupI64(table, code, k)
      val expScore = (0 until m).map(j => bigDist(q, j * sub, cb(j)(expCode(j) & 0xFF))).sum
      code.toSeq == expCode && BigInt(score) == expScore
    }

  property("fixed-point integer Lloyd update = BigInt truncating division") =
    Prop.forAll(Gen.nonEmptyListOf(qvecGen)) { vecs =>
      // one assign/update round, Long vs BigInt (overflow witness:
      // sums of |members|·2^20 stay far inside Long at any list size
      // ScalaCheck generates, and BigInt proves it)
      val cents = vecs.take(3).map(_.clone).toArray
      def near(v: Array[Long]): Int = {
        val ds = cents.indices.map(c =>
          (0 until v.length).map(i => BigInt(v(i) - cents(c)(i)).pow(2)).sum)
        ds.indexOf(ds.min)
      }
      val groups = vecs.groupBy(near)
      groups.forall { case (c, members) =>
        val longUpd = Array.tabulate(cents(c).length) { i =>
          members.map(_(i)).sum / members.length
        }
        val bigUpd = (0 until cents(c).length).map { i =>
          (members.map(v => BigInt(v(i))).sum / members.length).toLong
        }
        longUpd.toSeq == bigUpd
      }
    }
}
