package graft.sources

import java.io.OutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** One offre as served by the stub API; `id = None` renders as JSON
  * `"id": null` — the malformed-document case the dead-letter path
  * (S7) must capture.
  */
case class StubOffre(id: Option[String], intitule: String, description: String,
                     romeCode: String, region: String, departement: String)

/** Deterministic in-process HTTP server speaking the reference
  * ingestion protocol (`ingestion-francetravail/ingestion-elasticsearch.py`):
  *
  *  - OAuth2 client-credentials POST at `/token` → `access_token` +
  *    `expires_in` (`:10-25`), validating the key/secret pairs;
  *  - `Content-Range: offres a-b/total` paged search at
  *    `/offres/search` with region/departement/codeROME filters
  *    (`:57-130`), requiring an issued bearer token;
  *  - référentiel dimension endpoints (regions/departements/metiers)
  *    derived from the served offers;
  *  - exactly one 429 + `Retry-After: 1` on the first real page fetch
  *    per instance (`:79-83`) so every consumer exercises the backoff
  *    path (S5).
  *
  * This is the driver-gate fixture for the ingestion-path CORRECTNESS
  * entries (i01/i02): the production DSv2 source + `java.net.http`
  * client run against it end-to-end, and because the offers are a pure
  * function of a parquet fixture table the result is DuckDB-oracle
  * checkable. Requests are served on a small thread pool — the
  * `local[*]` scan fetches pages from many tasks at once.
  */
class StubOffresServer(offers: Seq[StubOffre], secrets: Map[String, String]) {
  private val mapper = new ObjectMapper()
  private val fired429 = new AtomicBoolean(false)
  private val pool = Executors.newFixedThreadPool(8)
  private val validTokens: Set[String] = secrets.keySet.map(k => s"tok-$k")

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(pool)

  val base: String = {
    server.createContext("/token", handleToken _)
    server.createContext("/referentiel", handleReferentiel _)
    server.createContext("/offres/search", handleSearch _)
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  def authUrl: String = s"$base/token"

  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
                      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val os: OutputStream = ex.getResponseBody
      os.write(bytes); os.close()
    }
    ex.close()
  }

  private def formFields(ex: HttpExchange): Map[String, String] = {
    val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    form.split("&").toSeq.filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> URLDecoder.decode(v, StandardCharsets.UTF_8)
    }.toMap
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    // same '='-less-token guard as formFields: a bare flag parameter
    // must not MatchError inside the handler (the exchange would hang
    // unanswered and the client block until its HTTP timeout)
    Option(ex.getRequestURI.getRawQuery).map(_.split("&").toSeq
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> URLDecoder.decode(v, StandardCharsets.UTF_8)
      }.toMap).getOrElse(Map.empty)

  private def bearerOk(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .exists(h => validTokens.contains(h.stripPrefix("Bearer ")))

  private def handleToken(ex: HttpExchange): Unit = {
    val f = formFields(ex)
    val ok = f.get("grant_type").contains("client_credentials") &&
      f.get("client_id").exists(id => secrets.get(id) == f.get("client_secret"))
    if (ok)
      respond(ex, 200,
        s"""{"access_token":"tok-${f("client_id")}","expires_in":3600}""")
    else respond(ex, 401, """{"error":"invalid_client"}""")
  }

  private def handleReferentiel(ex: HttpExchange): Unit = {
    if (!bearerOk(ex)) { respond(ex, 401, """{"error":"no_token"}"""); return }
    val arr = mapper.createArrayNode()
    ex.getRequestURI.getPath.stripPrefix("/referentiel/") match {
      case "regions" =>
        offers.map(_.region).distinct.sorted.foreach { r =>
          arr.add(mapper.createObjectNode().put("code", r))
        }
      case "departements" =>
        offers.map(o => (o.departement, o.region)).distinct.sorted.foreach {
          case (d, r) =>
            val n = mapper.createObjectNode().put("code", d)
            n.set[com.fasterxml.jackson.databind.node.ObjectNode]("region",
              mapper.createObjectNode().put("code", r))
            arr.add(n)
        }
      case "metiers" =>
        offers.map(_.romeCode).distinct.sorted.foreach { m =>
          arr.add(mapper.createObjectNode().put("code", m))
        }
      case _ => ()
    }
    respond(ex, 200, mapper.writeValueAsString(arr))
  }

  private def handleSearch(ex: HttpExchange): Unit = {
    if (!bearerOk(ex)) { respond(ex, 401, """{"error":"no_token"}"""); return }
    val p = queryParams(ex)
    val hits = offers.filter(o =>
      p.get("region").forall(_ == o.region) &&
      p.get("departement").forall(_ == o.departement) &&
      p.get("codeROME").forall(_ == o.romeCode))
    val Array(a, b) = p("range").split("-").map(_.toInt)
    // probes ask 0-0; never 429 them (planning retries would only slow
    // the run) — the single 429 lands on the first REAL page fetch
    val isProbe = a == 0 && b == 0
    if (!isProbe && fired429.compareAndSet(false, true)) {
      respond(ex, 429, "", Map("Retry-After" -> "1"))
    } else if (hits.isEmpty) {
      respond(ex, 204, "", Map("Content-Range" -> "offres 0-0/0"))
    } else {
      val page = hits.slice(a, b + 1)
      val results = mapper.createArrayNode()
      page.foreach { o =>
        val n = mapper.createObjectNode()
        o.id match {
          case Some(i) => n.put("id", i)
          case None => n.putNull("id")
        }
        n.put("intitule", o.intitule)
        n.put("description", o.description)
        n.put("romeCode", o.romeCode)
        n.put("region", o.region)
        n.put("departement", o.departement)
        results.add(n)
      }
      val body = mapper.createObjectNode()
      body.set[com.fasterxml.jackson.databind.node.ObjectNode]("resultats", results)
      respond(ex, if (b + 1 >= hits.size) 200 else 206,
        mapper.writeValueAsString(body),
        Map("Content-Range" -> s"offres $a-${math.min(b, hits.size - 1)}/${hits.size}"))
    }
  }
}
