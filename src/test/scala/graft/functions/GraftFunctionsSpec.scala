package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL text after registration") {
    GraftFunctions.registerAll(spark)
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val dot = spark.sql("SELECT dot_f32(a, b) AS d FROM vecs").as[Double].head()
    assert(dot == 32.0)
    val cos = spark.sql("SELECT cosine_f32(a, a) AS c FROM vecs").as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
    val sig = spark.sql(
      "SELECT minhash_sig('hello world hello world', 5, 8) AS s").as[Seq[Long]].head()
    assert(sig.length == 8)
    val j = spark.sql(
      "SELECT sorted_jaccard(array('a','b','c'), array('b','c','d')) AS j").as[Double].head()
    assert(math.abs(j - 0.5) < 1e-15)
    val sh = spark.sql(
      "SELECT simhash64(split('x y z', ' ')) AS h").as[Long].head()
    assert(sh != 0L)
  }

  test("SQL and Column API forms of the same kernel agree") {
    GraftFunctions.registerAll(spark)
    val df = Seq((Seq(0.1f, 0.9f, -0.3f), Seq(0.7f, -0.2f, 0.5f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs2")
    val viaSql = spark.sql("SELECT cosine_f32(a, b) AS c FROM vecs2").as[Double].head()
    val viaCol = df.select(VectorFns.cosineSim($"a", $"b")).as[Double].head()
    assert(viaSql == viaCol)
  }

  test("round-2 fused kernels are callable from SQL text") {
    GraftFunctions.registerAll(spark)
    Seq("Développeur (H/F)&nbsp— Java!!").toDF("t").createOrReplaceTempView("txt")
    val norm = spark.sql("SELECT normalize_text(t) AS n FROM txt").as[String].head()
    val viaCol = Seq("Développeur (H/F)&nbsp— Java!!").toDF("t")
      .select(TextFns.normalizeText($"t")).as[String].head()
    assert(norm == viaCol && norm == "développeur h f — java")
    val sh = spark.sql("SELECT sorted_shingles(normalize_text(t), 3) AS s FROM txt")
      .as[Seq[String]].head()
    assert(sh.nonEmpty && sh == sh.sorted && sh.distinct == sh)
    val fps = spark.sql("SELECT size(winnow_fps(t, 4, 2)) AS n FROM txt").as[Int].head()
    assert(fps > 0)
    val tf = spark.sql(
      "SELECT hashing_tf(split(normalize_text(t), ' '), 16) AS v FROM txt")
      .as[Seq[Float]].head()
    assert(tf.size == 16 && math.abs(tf.map(x => x * x).sum - 1.0) < 1e-5)
  }
}
