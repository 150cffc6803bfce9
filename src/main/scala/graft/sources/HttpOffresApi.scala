package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.ObjectMapper
import graft.sources.AdaptivePlanner.{FetchFilter, PageRange}

/** Production [[OffresApi]] over `java.net.http` (JDK built-in — zero
  * new dependencies). Speaks the reference client's protocol
  * (`ingestion-francetravail/ingestion-elasticsearch.py:66-130`):
  *
  *  - `GET {endpoint}/offres/search?range=a-b[&region&departement&codeROME]`
  *    with `Authorization: Bearer <token>`; results in the `resultats`
  *    array; total row count in `Content-Range: offres a-b/total`
  *    (parse at `ingestion-elasticsearch.py:62-63,95-97`);
  *  - 200/206 = page OK, 204 = empty result set
  *    (`ingestion-elasticsearch.py:85-98`);
  *  - 429 → honor `Retry-After` seconds (`ingestion-elasticsearch.py:79-83`).
  *    [[fetch]] THROWS [[RateLimitedException]] — the partition reader
  *    owns task-side backoff; [[count]]/[[referentiel]] (driver-side
  *    planning, no reader above them) sleep-retry internally;
  *  - OAuth2 client-credentials POST → `access_token`/`expires_in`
  *    (`ingestion-elasticsearch.py:10-25`) via [[HttpOffresApi.authenticate]].
  *
  * Instances are constructed executor-side from plain string options
  * (endpoint + an optional planning token) — the class carries only
  * strings; the HttpClient/ObjectMapper are `@transient lazy`, rebuilt
  * per JVM. Unexpected HTTP statuses throw: Spark task retry is the
  * outer guard, and the ingestion job's dead-letter capture records the
  * failure (S7).
  */
class HttpOffresApi(endpoint: String,
                    planningTokenSupplier: () => Option[String] = () => None)
    extends OffresApi {

  /** Driver-side probe token, fetched per probe from the supplier the
    * resolver bound at construction: rotation-aware in auth mode (the
    * supplier consults the expiry-aware [[TokenProvider]]), constant in
    * static-token mode. Instances are cached per (endpoint,
    * credentials), so two scans planning concurrently with different
    * credentials never see each other's token, and a token ROTATION
    * reuses the same instance/HttpClient instead of leaking one per
    * TTL.
    */
  private def planningToken: Option[String] = planningTokenSupplier()

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()
  @transient private lazy val mapper = new ObjectMapper()

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def searchUri(filter: FetchFilter, range: String): URI = {
    val params = Seq("range" -> range) ++
      filter.region.map("region" -> _) ++
      filter.departement.map("departement" -> _) ++
      filter.codeRome.map("codeROME" -> _)
    URI.create(endpoint + "/offres/search?" +
      params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&"))
  }

  private def get(uri: URI, token: Option[String]): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(uri).GET().timeout(Duration.ofSeconds(60))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  /** RFC 9110 allows both delta-seconds and an HTTP-date; fall back to
    * 1s if the header is absent or unparseable — never let a malformed
    * backoff hint bypass the 429 path.
    */
  private def retryAfterMs(res: HttpResponse[String]): Long = {
    val h = res.headers().firstValue("Retry-After")
    if (!h.isPresent) 1000L
    else {
      val v = h.get.trim
      // clamp to [0, 1 day]: a negative or absurd delta must neither
      // crash Thread.sleep nor park a task forever
      v.toLongOption.map(sec => math.min(math.max(sec, 0L), 86400L) * 1000L)
        .getOrElse {
          try {
            val at = java.time.ZonedDateTime.parse(v,
              java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
            math.min(math.max(java.time.Duration.between(
              java.time.ZonedDateTime.now(at.getZone), at).toMillis, 0L), 86400000L)
          } catch { case _: java.time.format.DateTimeParseException => 1000L }
        }
    }
  }

  /** `Content-Range: offres a-b/total` → total. */
  private def parseTotal(res: HttpResponse[String]): Long = {
    val h = res.headers().firstValue("Content-Range")
    if (!h.isPresent)
      throw new RuntimeException(s"missing Content-Range header from $endpoint")
    h.get.split('/').last.trim.toLong
  }

  /** Driver-side probes sleep-retry on 429 themselves (bounded): there
    * is no partition reader above planning to own the backoff.
    */
  private def getWithPlanningBackoff(uri: URI): HttpResponse[String] = {
    var attempts = 0
    while (true) {
      val res = get(uri, planningToken)
      if (res.statusCode() != 429) return res
      if (attempts >= 10)
        throw new RuntimeException(s"still rate-limited after $attempts retries: $uri")
      attempts += 1
      Thread.sleep(retryAfterMs(res))
    }
    throw new IllegalStateException("unreachable")
  }

  override def count(filter: FetchFilter): Long = {
    val res = getWithPlanningBackoff(searchUri(filter, "0-0"))
    res.statusCode() match {
      case 204 => 0L
      case 200 | 206 => parseTotal(res)
      case s => throw new RuntimeException(
        s"count probe failed: HTTP $s ${res.body().take(200)}")
    }
  }

  override def fetch(filter: FetchFilter, range: PageRange, token: String): Seq[String] = {
    val res = get(searchUri(filter, s"${range.start}-${range.end}"), Some(token))
    res.statusCode() match {
      case 429 => throw new RateLimitedException(retryAfterMs(res))
      case 204 => Seq.empty
      case 200 | 206 =>
        val root = mapper.readTree(res.body())
        val arr = root.get("resultats")
        if (arr == null || arr.isNull) Seq.empty
        else (0 until arr.size()).map(i => arr.get(i).toString)
      case s => throw new RuntimeException(
        s"search failed: HTTP $s ${res.body().take(200)}")
    }
  }

  override def referentiel(name: String): Seq[String] = {
    val res = getWithPlanningBackoff(URI.create(s"$endpoint/referentiel/$name"))
    if (res.statusCode() != 200)
      throw new RuntimeException(s"referentiel $name failed: HTTP ${res.statusCode()}")
    val arr = mapper.readTree(res.body())
    (0 until arr.size()).map(i => arr.get(i).toString)
  }
}

object HttpOffresApi {
  /** OAuth2 client-credentials flow (`ingestion-elasticsearch.py:10-25`):
    * form POST → `(access_token, ttlMs)`. Plugged into [[TokenProvider]]
    * for expiry-aware caching and re-auth.
    */
  def authenticate(authUrl: String, key: String, secret: String): (String, Long) = {
    val form = Seq(
      "grant_type" -> "client_credentials",
      "client_id" -> key,
      "client_secret" -> secret,
      "scope" -> s"application_$key api_offresdemploiv2 o2dsoffre")
      .map { case (k, v) => s"$k=${URLEncoder.encode(v, StandardCharsets.UTF_8)}" }
      .mkString("&")
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
    val res = client.send(
      HttpRequest.newBuilder(URI.create(authUrl))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() != 200)
      throw new RuntimeException(s"auth failed: HTTP ${res.statusCode()} ${res.body().take(200)}")
    val node = new ObjectMapper().readTree(res.body())
    val ttlSec = Option(node.get("expires_in")).map(_.asLong).getOrElse(3600L)
    (node.get("access_token").asText, ttlSec * 1000L)
  }
}

/** Resolves the [[OffresApi]] for a serialized option map, on driver or
  * executor: an `endpoint` option builds (and per-JVM-caches) an
  * [[HttpOffresApi]]; otherwise `api` looks up the in-JVM registry
  * (tests). Keys are expected lowercase (Spark's
  * CaseInsensitiveStringMap normalizes them).
  */
object OffresApiResolver {
  // keyed by (endpoint, CREDENTIALS — not the rotating token):
  // concurrent plans with different credentials get distinct instances
  // instead of racing on one mutable token, while token rotations
  // within one credential set reuse the cached instance/HttpClient
  // (entries are bounded by |endpoints| × |credential sets|, which is
  // static for a deployment). Executor-side fetch paths carry no
  // planning option at all, so they share the ("endpoint", "") client;
  // the bearer token is passed per fetch call.
  private val cache = new ConcurrentHashMap[String, HttpOffresApi]()

  /** Per-JVM token providers for executor-side re-auth, keyed by
    * (authUrl, secrets): a partition reader outliving the token TTL
    * re-authenticates through the expiry-aware [[TokenProvider]]
    * instead of failing on a frozen token.
    */
  private val providers = new ConcurrentHashMap[String, TokenProvider]()

  def tokenProvider(authUrl: String, secrets: String): TokenProvider =
    providers.computeIfAbsent(s"$authUrl|$secrets", _ => {
      val creds = secrets.split(",").toSeq.map { p =>
        val Array(k, sec) = p.split(":", 2); (k, sec)
      }
      new TokenProvider(creds, (k, sec) => HttpOffresApi.authenticate(authUrl, k, sec))
    })

  def resolve(opts: Map[String, String]): OffresApi =
    opts.get("endpoint") match {
      case Some(ep) =>
        // auth mode: key by the (stable) secrets, supply the CURRENT
        // token per probe via the expiry-aware provider. Static mode:
        // the token string is the credential — it never rotates.
        val (credsKey, supplier): (String, () => Option[String]) =
          (opts.get("authurl"), opts.get("secrets")) match {
            case (Some(url), Some(s)) =>
              (s"auth|$url|$s", () => Some(tokenProvider(url, s).token(0)))
            case _ =>
              val tok = opts.get("planningtoken")
              (s"static|${tok.getOrElse("")}", () => tok)
          }
        cache.computeIfAbsent(s"$ep|$credsKey", _ => new HttpOffresApi(ep, supplier))
      case None =>
        OffresApiRegistry.get(opts.getOrElse("api",
          throw new IllegalArgumentException(
            "OffresSource needs an 'endpoint' (HTTP) or 'api' (registry) option")))
    }

  /** The stable key overflow records are logged under for this source
    * configuration (endpoint in HTTP mode, registry key otherwise).
    */
  def sourceKey(opts: Map[String, String]): String =
    opts.getOrElse("endpoint", opts.getOrElse("api", "unknown"))
}
