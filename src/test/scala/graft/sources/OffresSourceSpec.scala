package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.sources.AdaptivePlanner._
import org.apache.spark.sql.functions._

/** In-memory France-Travail-shaped API: R1 small (direct fetch), R2
  * saturated (→ departements; D22 saturated → métier split). Exercises
  * the full adaptive plan + pagination + token assignment + 429 retry.
  */
object FakeOffresApi extends OffresApi {
  case class O(id: Int, region: String, departement: String, rome: String)
  val offers: Seq[O] =
    (0 until 200).map(i => O(i, "R1", "D11", if (i % 2 == 0) "M1" else "M2")) ++
    (0 until 2000).map(i => O(1000 + i, "R2", "D21", if (i % 2 == 0) "M1" else "M2")) ++
    (0 until 4000).map(i => O(10000 + i, "R2", "D22", if (i % 2 == 0) "M1" else "M2"))

  private def matches(f: FetchFilter)(o: O): Boolean =
    f.region.forall(_ == o.region) &&
      f.departement.forall(_ == o.departement) &&
      f.codeRome.forall(_ == o.rome)

  val countCalls = new AtomicInteger(0)
  val fetchCalls = new AtomicInteger(0)
  val rateLimitsThrown = new AtomicInteger(0)
  val tokensSeen: ConcurrentHashMap[String, Boolean] = new ConcurrentHashMap()
  private val throttled: ConcurrentHashMap[String, Boolean] = new ConcurrentHashMap()

  override def count(filter: FetchFilter): Long = {
    countCalls.incrementAndGet()
    offers.count(matches(filter)).toLong
  }

  override def fetch(filter: FetchFilter, range: PageRange, token: String): Seq[String] = {
    fetchCalls.incrementAndGet()
    tokensSeen.put(token, true)
    val key = s"$filter:$range"
    if (throttled.putIfAbsent(key, true) == null) {
      rateLimitsThrown.incrementAndGet()
      throw new RateLimitedException(5) // first hit on every page: HTTP 429
    }
    offers.filter(matches(filter)).sortBy(_.id)
      .slice(range.start, range.end + 1)
      .map(o => s"""{"id":"${o.id}","intitule":"Offre ${o.id}","description":"desc ${o.id}","romeCode":"${o.rome}","region":"${o.region}","departement":"${o.departement}"}""")
  }

  override def referentiel(name: String): Seq[String] = name match {
    case "regions" => Seq("""{"code":"R1"}""", """{"code":"R2"}""")
    case "departements" => Seq(
      """{"code":"D11","region":{"code":"R1"}}""",
      """{"code":"D21","region":{"code":"R2"}}""",
      """{"code":"D22","region":{"code":"R2"}}""")
    case "metiers" => Seq("""{"code":"M1"}""", """{"code":"M2"}""")
    case _ => Seq.empty
  }
}

class OffresSourceSpec extends SparkSpec {
  import spark.implicits._

  OffresApiRegistry.register("fake", FakeOffresApi)

  private def read = spark.read.format("graft.sources.OffresSource")
    .option("api", "fake").option("tokens", "tokA,tokB,tokC")

  test("adaptive scan reads every offer exactly once through the split hierarchy") {
    val df = read.load()
    val ids = df.select($"id").as[String].collect()
    assert(ids.length == 6200)                       // 200 + 2000 + 4000
    assert(ids.distinct.length == 6200)              // no dup, no loss (A3)
    assert(FakeOffresApi.rateLimitsThrown.get() > 0) // 429s were retried (S5)
    assert(FakeOffresApi.tokensSeen.size() == 3)     // round-robin used all creds (S1)
  }

  test("rome pushdown narrows the plan and the scan (P4)") {
    FakeOffresApi.fetchCalls.set(0)
    val df = read.load().filter($"romeCode" === "M1")
      .select($"id", $"romeCode")
    val rows = df.as[(String, String)].collect()
    assert(rows.length == 3100 && rows.forall(_._2 == "M1"))
    // plan shows the filter pushed into the source
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("romeCode"), plan)
  }

  test("departement pushdown bypasses the region level") {
    val df = read.load().filter($"departement" === "D21")
    assert(df.count() == 2000)
  }

  test("conjunctions of predicates on one column stay correct (one pushed, rest residual)") {
    // equality + IN on romeCode: only M1 satisfies both
    val both = read.load()
      .filter($"romeCode" === "M1" && $"romeCode".isin("M1", "M2"))
    assert(both.count() == 3100)
    assert(both.select($"romeCode").distinct().as[String].collect().toSeq == Seq("M1"))
    // region + departement where the departement is NOT in that region →
    // must be empty (region stays residual and filters the D21 rows out)
    val cross = read.load()
      .filter($"region" === "R1" && $"departement" === "D21")
    assert(cross.count() == 0)
  }

  test("unregistered api key fails with a clear message, not a hang") {
    val e = intercept[Exception] {
      spark.read.format("graft.sources.OffresSource")
        .option("api", "nope").load().count()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else t.getMessage :: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("no OffresApi registered")),
      chain(e).toString)
  }

  test("column pruning reaches the reader schema (P1)") {
    val df = read.load().select($"id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("description"), scan)
  }
}
