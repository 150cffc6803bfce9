package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.ObjectMapper
import graft.sources.AdaptivePlanner._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 adaptive REST-search source (SURVEY §2.1 S1-S5, §4).
  *
  * Re-expresses the reference ingester (`ingestion-elasticsearch.py`) as
  * a Spark source:
  *  - planning (driver side): count-probe → recursive region →
  *    departement → departement×métier split → one `InputPartition` per
  *    page range ([[AdaptivePlanner]]); overflowed leaves are recorded,
  *    not silently dropped;
  *  - execution (task side): each [[OffresPartitionReader]] pulls its
  *    page with its round-robin-assigned credential (S1/F13) and
  *    sleep-retries on rate limiting (S5); Spark task retry is the
  *    outer guard;
  *  - pushdown: `SupportsPushDownFilters` maps equality/IN predicates on
  *    region/departement/romeCode into the fetch filter (P4 — the
  *    reference pushes them into the query URL);
  *    `SupportsPushDownRequiredColumns` prunes the projected schema (P1,
  *    the `_source` list).
  *
  * The API client is resolved per side by [[OffresApiResolver]]: an
  * `endpoint` option constructs a real [[HttpOffresApi]]
  * (`java.net.http`) from plain string options — on the driver for
  * planning probes, independently on each executor for page fetches
  * (nothing non-serializable crosses the boundary); an `api` option
  * instead looks up the in-JVM [[OffresApiRegistry]] (test fakes,
  * `local[*]`). Credentials: pre-issued `tokens`, or `authUrl` +
  * `secrets` for the full OAuth2 client-credentials flow through
  * [[TokenProvider]].
  *
  * Usage: `spark.read.format("graft.sources.OffresSource")
  *   .option("endpoint", "https://api...").option("authUrl", "https://...")
  *   .option("secrets", "key1:secret1,key2:secret2").load()`
  * (or `.option("api", key).option("tokens", "t1,t2")` for the registry).
  */
trait OffresApi extends Serializable {
  /** Count probe for a filter (A1/A2; `Content-Range` total). */
  def count(filter: FetchFilter): Long
  /** Fetch one page; may throw [[RateLimitedException]] (HTTP 429). */
  def fetch(filter: FetchFilter, range: PageRange, token: String): Seq[String]
  /** Référentiel dimension fetch (S2): regions/departements/metiers. */
  def referentiel(name: String): Seq[String]
}

/** HTTP 429 with Retry-After. */
class RateLimitedException(val retryAfterMs: Long)
  extends RuntimeException(s"rate limited, retry after ${retryAfterMs}ms")

/** S1: OAuth2 client-credentials token lifecycle. The reference
  * authenticates each key/secret pair once up front
  * (`ingestion-elasticsearch.py:10-25,239-242`); this provider adds
  * expiry-aware caching + re-auth, so long scans survive token expiry.
  * `auth` is the network call (client-credentials POST → access token +
  * TTL); tests inject a fake.
  */
class TokenProvider(credentials: Seq[(String, String)],
                    auth: (String, String) => (String, Long),
                    clock: () => Long = () => System.currentTimeMillis())
    extends Serializable {
  private case class Tok(value: String, expiresAtMs: Long)
  @transient private lazy val cache =
    new ConcurrentHashMap[Int, Tok]()

  /** Token for credential slot i (round-robin index, F13); re-auths when
    * within 60s of expiry.
    */
  def token(i: Int): String = {
    val slot = math.floorMod(i, credentials.size)
    val cached = cache.get(slot)
    if (cached != null && cached.expiresAtMs - clock() > 60000L) cached.value
    else {
      val (key, secret) = credentials(slot)
      val (tok, ttlMs) = auth(key, secret)
      cache.put(slot, Tok(tok, clock() + ttlMs))
      tok
    }
  }

  def tokens: Seq[String] = credentials.indices.map(token)
}

object OffresApiRegistry {
  private val apis = new ConcurrentHashMap[String, OffresApi]()
  def register(key: String, api: OffresApi): Unit = apis.put(key, api)
  def get(key: String): OffresApi =
    Option(apis.get(key)).getOrElse(
      throw new IllegalArgumentException(s"no OffresApi registered under '$key'"))
}

/** Driver-side record of plan leaves that could not be fully fetched
  * (the reference's skip-and-log overflow,
  * `ingestion-elasticsearch.py:209-211`). Consumers ([[graft.jobs.IngestionJob]])
  * drain this per api key into the dead-letter table so the loss is a
  * row in `erreurs`, not just a log line.
  */
object OverflowLog {
  // set-valued: Spark may call planInputPartitions more than once per
  // query (planning + execution), so identical overflow records collapse
  private val log =
    new ConcurrentHashMap[String, ConcurrentHashMap[AdaptivePlanner.Overflow, Boolean]]()
  def record(apiKey: String, o: AdaptivePlanner.Overflow): Unit =
    log.computeIfAbsent(apiKey, _ => new ConcurrentHashMap()).put(o, true)
  /** Returns and clears the overflows recorded for `apiKey`. */
  def drain(apiKey: String): Seq[AdaptivePlanner.Overflow] = {
    val m = log.remove(apiKey)
    if (m == null) Seq.empty
    else {
      val it = m.keySet().iterator()
      val b = Seq.newBuilder[AdaptivePlanner.Overflow]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}

class OffresSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OffresSource.flatSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OffresTable(new CaseInsensitiveStringMap(properties))
}

object OffresSource {
  /** Flat projection of the offre fields the source serves (the nested
    * variants live in [[Offres.offreSchema]] post-parse).
    */
  val flatSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("intitule", StringType),
    StructField("description", StringType),
    StructField("romeCode", StringType),
    StructField("region", StringType),
    StructField("departement", StringType)))
}

class OffresTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "offres_api"
  override def schema(): StructType = OffresSource.flatSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new OffresScanBuilder(opts)
}

class OffresScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushedFilterList: Array[Filter] = Array.empty
  private var requiredSchema: StructType = OffresSource.flatSchema
  private var regionEq: Option[String] = None
  private var departementEq: Option[String] = None
  private var romeIn: Option[Seq[String]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Claim AT MOST ONE predicate per column as pushed: the fetch
    // filter holds a single value per field, so a second predicate on
    // the same column must stay residual (Spark re-applies residuals;
    // claiming both while keeping one returns wrong rows). A pushed
    // departement bypasses the plan's region level, so a simultaneous
    // region predicate stays residual for the same reason.
    val hasDept = filters.exists {
      case EqualTo("departement", _: String) => true
      case _ => false
    }
    val pushed = Array.newBuilder[Filter]
    val residual = Array.newBuilder[Filter]
    filters.foreach {
      case f @ EqualTo("region", v: String) if !hasDept && regionEq.isEmpty =>
        regionEq = Some(v); pushed += f
      case f @ EqualTo("departement", v: String) if departementEq.isEmpty =>
        departementEq = Some(v); pushed += f
      case f @ EqualTo("romeCode", v: String) if romeIn.isEmpty =>
        romeIn = Some(Seq(v)); pushed += f
      case f @ In("romeCode", vs)
          if romeIn.isEmpty && vs.forall(_.isInstanceOf[String]) =>
        romeIn = Some(vs.map(_.toString)); pushed += f
      case f => residual += f
    }
    pushedFilterList = pushed.result()
    residual.result() // Spark re-applies anything we can't guarantee
  }
  override def pushedFilters(): Array[Filter] = pushedFilterList

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def build(): Scan =
    new OffresScan(options, requiredSchema, regionEq, departementEq, romeIn)
}

class OffresScan(options: CaseInsensitiveStringMap, schema: StructType,
                 regionEq: Option[String], departementEq: Option[String],
                 romeIn: Option[Seq[String]]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** Plain-string option map: the serializable form the reader factory
    * ships to executors, and what [[OffresApiResolver]] resolves from
    * on either side (keys lowercase via CaseInsensitiveStringMap).
    */
  private val optMap: Map[String, String] = {
    val it = options.entrySet().iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey.toLowerCase -> e.getValue) }
    b.result()
  }
  private def sourceKey = OffresApiResolver.sourceKey(optMap)

  /** Credential slots (S1/F13): either pre-issued `tokens`, or the full
    * OAuth2 flow — `authUrl` + `secrets` (`k1:s1,k2:s2`) authenticated
    * through the per-JVM shared [[TokenProvider]] (expiry-aware: repeat
    * plannings reuse unexpired tokens instead of re-running OAuth), one
    * token per credential, assigned round-robin to partitions. Readers
    * carry the SLOT, not just the token — an executor whose fetch
    * outlives the token TTL re-authenticates its slot (see
    * [[OffresPartitionReader.bearerToken]]).
    */
  private def tokens: Seq[String] =
    (Option(options.get("authUrl")), Option(options.get("secrets"))) match {
      case (Some(url), Some(s)) => OffresApiResolver.tokenProvider(url, s).tokens
      case _ =>
        Option(options.get("tokens")).map(_.split(",").toSeq).getOrElse(Seq("anonymous"))
    }
  private def maxPerFilter = Option(options.get("maxPerFilter")).map(_.toInt).getOrElse(3149)
  private def pageSize = Option(options.get("pageSize")).map(_.toInt).getOrElse(150)

  /** Driver-side adaptive planning: dims via référentiel (S2), then
    * count-probe split. Pushed equality filters narrow the key space
    * BEFORE probing — partition pruning at plan time (P4).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    // HTTP mode probes (count/referentiel) authenticate with the first
    // credential slot; registry mode ignores the extra option
    val toks = tokens
    val planOpts =
      if (optMap.contains("endpoint")) optMap + ("planningtoken" -> toks.head)
      else optMap
    val api = OffresApiResolver.resolve(planOpts)
    val mapper = new ObjectMapper()
    def codes(name: String): Seq[String] =
      api.referentiel(name).map(j => mapper.readTree(j).get("code").asText)
    def departementRegion: Map[String, String] =
      api.referentiel("departements").map { j =>
        val n = mapper.readTree(j)
        n.get("code").asText -> n.get("region").get("code").asText
      }.toMap

    // pushed rome predicates fan the plan out per code (each becomes a
    // `base` filter threaded through every probe); a pushed departement
    // bypasses the region level entirely.
    val romeBases: Seq[Option[String]] =
      romeIn.map(_.map(Option(_))).getOrElse(Seq(None))
    val plans: Seq[Plan] = romeBases.map { rome =>
      val base = FetchFilter(codeRome = rome)
      departementEq match {
        case Some(d) =>
          val f = base.copy(departement = Some(d))
          val t = api.count(f)
          if (t <= maxPerFilter) Plan(AdaptivePlanner.pages(f, t, pageSize), Seq.empty)
          else if (rome.isDefined) Plan(Seq.empty, Seq(Overflow(f, t)))
          else {
            // saturated departement → métier split (same as the planner's
            // innermost level, here reached directly via pushdown)
            val parts = Seq.newBuilder[FetchPartition]
            val over = Seq.newBuilder[Overflow]
            codes("metiers").foreach { m =>
              val fm = FetchFilter(departement = Some(d), codeRome = Some(m))
              val tm = api.count(fm)
              if (tm <= 0) ()
              else if (tm <= maxPerFilter) parts ++= AdaptivePlanner.pages(fm, tm, pageSize)
              else over += Overflow(fm, tm)
            }
            Plan(parts.result(), over.result())
          }
        case None =>
          val regions = regionEq.map(Seq(_)).getOrElse(codes("regions"))
          AdaptivePlanner.plan(api.count, regions, departementRegion,
            codes("metiers"), maxPerFilter, pageSize, base)
      }
    }
    val plan = Plan(plans.flatMap(_.partitions), plans.flatMap(_.overflows))
    plan.overflows.foreach { o =>
      // skip-and-log semantics (ingestion-elasticsearch.py:209-211):
      // recorded for dead-letter capture by the consumer + logged
      OverflowLog.record(sourceKey, o)
      System.err.println(s"[offres-source] OVERFLOW not fully fetchable: $o")
    }
    plan.partitions.zipWithIndex.map { case (p, i) =>
      OffresInputPartition(p, toks(i % toks.size), i % toks.size): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OffresReaderFactory(optMap, schema)
}

case class OffresInputPartition(part: FetchPartition, token: String,
                                slot: Int = 0) extends InputPartition

class OffresReaderFactory(opts: Map[String, String], schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OffresPartitionReader(opts, schema,
      partition.asInstanceOf[OffresInputPartition])
}

/** Task-side page reader: fetches its range with its token, retrying on
  * rate-limit with the server-provided backoff (S5). JSON decoding via
  * Jackson; missing fields become nulls (dead-lettered downstream).
  */
class OffresPartitionReader(opts: Map[String, String], schema: StructType,
                            partition: OffresInputPartition)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private var rows: Iterator[String] = _
  private var current: InternalRow = _

  /** Bearer token for this partition's credential slot. With
    * `authUrl`/`secrets` in the options, the per-JVM [[TokenProvider]]
    * re-authenticates executor-side when the cached token nears expiry
    * — a fetch loop that outlives the token TTL keeps working (the S1
    * expiry-aware claim, now on both sides of the boundary). Otherwise
    * the planner-assigned token is used as-is.
    */
  private def bearerToken: String =
    (opts.get("authurl"), opts.get("secrets")) match {
      case (Some(url), Some(s)) =>
        OffresApiResolver.tokenProvider(url, s).token(partition.slot)
      case _ => partition.token
    }

  private def fetchWithBackoff(): Seq[String] = {
    // executor-side construction from plain string options (HTTP mode)
    // or shared-JVM registry lookup (tests / local[*])
    val api = OffresApiResolver.resolve(opts)
    var attempts = 0
    while (true) {
      try {
        return api.fetch(partition.part.filter, partition.part.range, bearerToken)
      } catch {
        case e: RateLimitedException if attempts < 10 =>
          attempts += 1
          Thread.sleep(e.retryAfterMs)
      }
    }
    Seq.empty // unreachable
  }

  override def next(): Boolean = {
    if (rows == null) rows = fetchWithBackoff().iterator
    if (!rows.hasNext) return false
    val node = mapper.readTree(rows.next())
    def str(field: String): UTF8String = {
      val v = node.get(field)
      if (v == null || v.isNull) null else UTF8String.fromString(v.asText)
    }
    current = new GenericInternalRow(
      schema.fieldNames.map(f => str(f): Any))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
