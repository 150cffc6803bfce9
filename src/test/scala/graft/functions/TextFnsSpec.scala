package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(TextFns.normalizeText($"t")).as[String].head()

  test("normalizeText reproduces the reference gsub chain on messy offre text") {
    // punctuation class incl. the *-. range, unicode chars, &nbsp, \r, runs
    assert(norm("Développeur (H/F) ** Java/Scala!! «urgent»\r\n&nbsp; TOP.") ==
      "développeur h f java scala urgent top")
    assert(norm("a,b*c+d-e.f:g;h¿i·j?k!l(m)n/o\\p\"q") ==
      "a b c d e f g h i j k l m n o p q")
  }

  test("normalizeText is idempotent (F5 collapse ∘ itself = itself)") {
    val docs = graft.Tables.documents(spark, sf)
      .select(TextFns.normalizeText(col("text")).as("once"))
      .select(col("once"), TextFns.normalizeText(col("once")).as("twice"))
    assert(docs.filter(col("once") =!= col("twice")).count() == 0)
  }

  test("tokenCount and bpeish token count") {
    val r = Seq(("hello world", 1), ("can't stop won't stop2", 2))
      .toDF("t", "k")
      .select(TextFns.tokenCount($"t").as("ws"), TextFns.bpeishTokenCount($"t").as("bp"))
      .collect()
    assert(r(0).getInt(0) == 2 && r(0).getInt(1) == 2)
    // can't -> can ' t ; stop2 -> stop 2  => 4 + 2 + ... per word splits
    assert(r(1).getInt(1) > r(1).getInt(0))
  }

  test("charShingles produces distinct n-length windows") {
    val sh = Seq("abcabc").toDF("t")
      .select(TextFns.charShingles($"t", 3)).as[Seq[String]].head()
    assert(sh.toSet == Set("abc", "bca", "cab"))
  }

  test("fused word shingles equal the composed-HOF formulation everywhere") {
    val rnd = new scala.util.Random(17)
    val vocab = Seq("a", "bb", "ccc", "dd", "e", "ff", "a", "bb") // dups on purpose
    // adversarial sizes: empty, singleton, < n, = n, > n, all-same
    val fixed: Seq[Seq[String]] = Seq(
      Seq.empty, Seq("a"), Seq("a", "b"), (1 to 8).map(_.toString),
      (1 to 9).map(_.toString), Seq.fill(12)("x"))
    val random = (1 to 300).map(_ =>
      (1 to rnd.nextInt(25)).map(_ => vocab(rnd.nextInt(vocab.length))))
    val diff = (fixed ++ random).toDF("toks")
      .select(TextFns.wordShingles($"toks", 8).as("fused"),
        TextFns.wordShinglesHof($"toks", 8).as("hof"))
      .filter($"fused" =!= $"hof").collect()
    assert(diff.isEmpty, diff.take(5).mkString("; "))
    // n = 3 too (the d05 configuration), over the real fixture corpus
    val corpusDiff = graft.Tables.documents(spark, sf)
      .select(TextFns.tokens(TextFns.normalizeText($"text")).as("toks"))
      .select(TextFns.wordShingles($"toks", 3).as("fused"),
        TextFns.wordShinglesHof($"toks", 3).as("hof"))
      .filter($"fused" =!= $"hof").count()
    assert(corpusDiff == 0)
  }

  test("langId guesses the stopword-dominant language, und when none") {
    val got = Seq("le chat est sur la table", "the cat is on the mat", "zzz qqq")
      .toDF("t")
      .select(TextFns.langId(TextFns.tokens($"t"))).as[String].collect()
    assert(got.toSeq == Seq("fr", "en", "und"))
  }

  test("fingerprints are stable across whitespace/punct variants") {
    val fp = Seq("Hello,  World!", "hello world", "HELLO\rWORLD")
      .toDF("t").select(TextFns.fingerprintMd5($"t")).as[String].collect()
    assert(fp.distinct.length == 1)
  }

  test("fused normalize kernel is char-identical to the regex chain") {
    // adversarial fixed cases: &nbsp variants (incl. uppercase pre-lower,
    // overlap, ends), punct runs, every whitespace class char, NBSP
    // (NOT java \s — must survive), multibyte punct, empty-ish inputs
    val fixed = Seq(
      "", " ", "\r\n\t\f", "....", "&nbsp", "&nbs", "x&nbspy", "&&nbsp",
      "&nbsp&nbsp", "a&NBSPb", "  a  b  ", "é«à»ç", "a b", "&nbspz",
      "tail&nbs", "&", "nbsp", "a*+,-.b", "✔➡¿·", "A&Nbsp;B")
    val rnd = new scala.util.Random(7)
    val alphabet = "ab YZ09é&nbsp*,.-:;«»✔➡¿·\\\"?!()/ \t\r\n\f "
    val random = (1 to 500).map(_ =>
      (1 to rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = (fixed ++ random).toDF("t")
      .select(TextFns.normalizeText($"t").as("fused"),
        TextFns.normalizeTextRegex($"t").as("chain"))
    val diff = df.filter($"fused" =!= $"chain").collect()
    assert(diff.isEmpty, diff.take(5).mkString("; "))
    // and over the real fixture corpus
    val corpusDiff = graft.Tables.documents(spark, sf)
      .select(TextFns.normalizeText($"text").as("fused"),
        TextFns.normalizeTextRegex($"text").as("chain"))
      .filter($"fused" =!= $"chain").count()
    assert(corpusDiff == 0)
  }

  test("fused sorted shingle set equals array_sort(charShingles) everywhere") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abcdeé «»01"
    // incl. supplementary-plane chars: windows must count CODEPOINTS
    // (like Spark length/substr and the DuckDB oracle), not UTF-16 units
    val strs = Seq("", "a", "abcd", "ababab", "ééééééé",
      "𝄞abcd", "a😀b😁cdef") ++
      (1 to 300).map(_ =>
        (1 to rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val diff = strs.toDF("t")
      .select(HashFns.sortedShingleSet($"t", 5).as("fused"),
        array_sort(TextFns.charShingles($"t", 5)).as("hof"))
      .filter($"fused" =!= $"hof").collect()
    assert(diff.isEmpty, diff.take(5).mkString("; "))
    val corpusDiff = graft.Tables.documents(spark, sf)
      .select(HashFns.sortedShingleSet(TextFns.normalizeText($"text"), 5).as("fused"),
        array_sort(TextFns.charShingles(TextFns.normalizeText($"text"), 5)).as("hof"))
      .filter($"fused" =!= $"hof").count()
    assert(corpusDiff == 0)
  }
}
