package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val vecs: Seq[(Seq[Float], Seq[Float])] =
    Seq.fill(50)((Seq.fill(16)(rnd.nextFloat() * 2 - 1), Seq.fill(16)(rnd.nextFloat() * 2 - 1)))

  private def df = vecs.toDF("a", "b")
    .select($"a".cast(ArrayType(FloatType)).as("a"), $"b".cast(ArrayType(FloatType)).as("b"))

  test("codegen'd dot equals the higher-order-function reference exactly") {
    val mismatch = df
      .select(VectorFns.dot($"a", $"b").as("fast"), VectorFns.dotHof($"a", $"b").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(mismatch == 0)
  }

  test("codegen'd cosine matches a driver-side double computation") {
    val got = df.select(VectorFns.cosineSim($"a", $"b")).as[Double].collect()
    val exp = vecs.map { case (a, b) =>
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("codegen'd integer dot (dot_i64) equals the HOF reference exactly") {
    val codes = Seq.fill(50)((Seq.fill(16)(rnd.nextInt(255).toLong - 127),
                              Seq.fill(16)(rnd.nextInt(255).toLong - 127)))
    val cdf = codes.toDF("a", "b")
    val mismatch = cdf
      .select(VectorFns.dotI64($"a", $"b").as("fast"),
              VectorFns.dotI64Hof($"a", $"b").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(mismatch == 0)
    // driver-side exact check too (both Spark paths could share a bug)
    val got = cdf.select(VectorFns.dotI64($"a", $"b")).as[Long].collect()
    val exp = codes.map { case (a, b) => a.zip(b).map { case (x, y) => x * y }.sum }
    assert(got.toSeq == exp)
  }

  test("codegen'd byte dot (dot_i8) equals the long-code kernel on the same codes") {
    import org.apache.spark.sql.types.ByteType
    val codes = Seq.fill(50)((Seq.fill(16)(rnd.nextInt(255).toLong - 127),
                              Seq.fill(16)(rnd.nextInt(255).toLong - 127)))
    val cdf = codes.toDF("a", "b")
      .select($"a", $"b",
        $"a".cast(ArrayType(ByteType)).as("ba"),
        $"b".cast(ArrayType(ByteType)).as("bb"))
    // byte kernel over tinyint arrays ≡ long kernel over the same values
    val mismatch = cdf
      .select(VectorFns.dotI8($"ba", $"bb").as("fast"),
              VectorFns.dotI64($"a", $"b").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(mismatch == 0)
    val got = cdf.select(VectorFns.dotI8($"ba", $"bb")).as[Long].collect()
    val exp = codes.map { case (a, b) => a.zip(b).map { case (x, y) => x * y }.sum }
    assert(got.toSeq == exp)
  }

  test("cosine of identical vectors is 1, zero vector yields 0") {
    val one = Seq((Seq.fill(8)(0.5f), Seq.fill(8)(0.5f)),
                  (Seq.fill(8)(0f), Seq.fill(8)(1f))).toDF("a", "b")
      .select($"a".cast(ArrayType(FloatType)).as("a"), $"b".cast(ArrayType(FloatType)).as("b"))
      .select(VectorFns.cosineSim($"a", $"b")).as[Double].collect()
    assert(math.abs(one(0) - 1.0) < 1e-12 && one(1) == 0.0)
  }

  test("interpreted eval path (non-codegen) agrees with codegen") {
    // force interpreted evaluation via a driver-side eval of the expression
    val expr = VectorFns.CosineSimF32(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vecs.head._1.toArray, ArrayType(FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vecs.head._2.toArray, ArrayType(FloatType)))
    val interpreted = expr.eval(null).asInstanceOf[Double]
    val viaSpark = df.limit(1).select(VectorFns.cosineSim($"a", $"b")).as[Double].head()
    assert(math.abs(interpreted - viaSpark) < 1e-15)
  }

  test("fixed-point quantize: floor(x * 2^20) exactly, codegen = HOF reference") {
    val scale = 1048576L
    val got = df.select(VectorFns.quantizeFixedPoint($"a", scale).as("q"),
        transform($"a", x => floor(x.cast("double") * scale).cast("long")).as("ref"))
      .filter(not($"q" <=> $"ref")).count()
    assert(got == 0)
    // and against driver-side math.floor on the same floats
    val rows = df.select($"a", VectorFns.quantizeFixedPoint($"a", scale).as("q"))
      .as[(Seq[Float], Seq[Long])].collect()
    rows.foreach { case (a, q) =>
      assert(q == a.map(x => math.floor(x.toDouble * scale).toLong))
    }
  }

  test("integer centroid sq-dists: codegen kernel = driver loop, first-min stable") {
    val scale = 1048576L
    val cents: Array[Array[Long]] = Array(
      Array.fill(16)(0L),
      Array.tabulate(16)(i => (i.toLong - 8) * 1000),
      Array.fill(16)(250000L))
    val rows = df
      .select($"a", VectorFns.centroidSqDistsI64(
        VectorFns.quantizeFixedPoint($"a", scale), cents).as("d"))
      .as[(Seq[Float], Seq[Long])].collect()
    rows.foreach { case (a, d) =>
      val q = a.map(x => math.floor(x.toDouble * scale).toLong)
      val exp = cents.map(c => q.zip(c).map { case (x, y) =>
        (x - y) * (x - y) }.sum).toSeq
      assert(d == exp)
    }
  }
}
