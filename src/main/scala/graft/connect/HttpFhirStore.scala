package graft.connect

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.concurrent.ConcurrentHashMap

/** The wire-level [[FhirStore]]: FHIR REST over `java.net.http.HttpClient`
  * (reference semantics: dags/ODSImport.py:246-256 POST-and-harvest-
  * Location-id, :292-304 conditional PUT, :646-659 DELETE; S4 search with
  * parameter pushdown).
  *
  * Scale shape: instances are cheap serializable coordinates; the actual
  * client is resolved per executor JVM from a keyed pool
  * ([[HttpFhirStore.clientFor]]) so every partition of a sink stage reuses
  * one connection pool per endpoint instead of opening a socket per row or
  * per task. All verbs run under the bounded [[Retry]] (X9): transport
  * errors and 5xx responses retry; 4xx responses fail fast OUTSIDE the
  * retry loop — a malformed document does not become `retries` identical
  * rejections.
  */
class HttpFhirStore(baseUrl: String, retries: Int = 3,
    retryDelayMs: Long = 0, requestTimeoutSec: Long = 30) extends FhirStore {

  private val base = baseUrl.stripSuffix("/")

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper

  private def request(method: String, path: String,
      body: Option[String]): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base/$path"))
      .timeout(Duration.ofSeconds(requestTimeoutSec))
      .header("Accept", "application/fhir+json")
    val withBody = body match {
      case Some(json) => b.header("Content-Type", "application/fhir+json")
        .method(method, BodyPublishers.ofString(json, StandardCharsets.UTF_8))
      case None => b.method(method, BodyPublishers.noBody())
    }
    val req = withBody.build()
    // INSIDE retry: transport failures (IOException) and 5xx; a 5xx is
    // surfaced as an exception so the retry loop sees it
    val resp = Retry.withRetry(retries, retryDelayMs) {
      val r = HttpFhirStore.clientFor(base).send(req, BodyHandlers.ofString())
      if (r.statusCode() >= 500)
        throw new java.io.IOException(
          s"$method $path -> HTTP ${r.statusCode()}")
      r
    }
    resp
  }

  private def expect(resp: HttpResponse[String], ok: Int*): HttpResponse[String] = {
    require(ok.contains(resp.statusCode()),
      s"unexpected HTTP ${resp.statusCode()} (wanted ${ok.mkString("/")}): " +
        resp.body().take(500))
    resp
  }

  /** POST, then harvest the server-assigned id from the `Location` header
    * (`…/Type/{id}/_history/{vid}` per the FHIR create contract); falls
    * back to the response body's `id` for servers that omit the header.
    */
  override def create(resourceType: String, json: String): String = {
    val resp = expect(request("POST", resourceType, Some(json)), 200, 201)
    val fromLocation = resp.headers().firstValue("Location")
      .map[Option[String]] { loc =>
        val segs = loc.stripSuffix("/").split("/")
        val i = segs.lastIndexOf(resourceType)
        if (i >= 0 && i + 1 < segs.length) Some(segs(i + 1)) else None
      }.orElse(None)
    fromLocation.orElse {
      val node = mapper.readTree(resp.body()).path("id")
      if (node.isMissingNode) None else Some(node.asText())
    }.getOrElse(throw new IllegalStateException(
      s"create $resourceType: no id in Location header or body"))
  }

  override def update(resourceType: String, id: String, json: String): Unit = {
    expect(request("PUT", s"$resourceType/$id", Some(json)), 200, 201)
    ()
  }

  override def delete(resourceType: String, id: String): Unit = {
    expect(request("DELETE", s"$resourceType/$id", None), 200, 202, 204)
    ()
  }

  override def read(resourceType: String, id: String): Option[String] = {
    val resp = request("GET", s"$resourceType/$id", None)
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 | 410 => None
      case other => throw new IllegalStateException(
        s"read $resourceType/$id: unexpected HTTP $other")
    }
  }

  /** GET `Type?param=value&…` — parameters are the pushed-down search
    * filters (S4); the result Bundle's entry resources come back as raw
    * JSON strings, sorted for deterministic downstream plans (the same
    * contract the in-memory store exposes).
    */
  override def search(resourceType: String,
      param: (String, String)*): Seq[String] = {
    val qs =
      if (param.isEmpty) ""
      else param.map { case (k, v) =>
        s"${URLEncoder.encode(k, "UTF-8")}=${URLEncoder.encode(v, "UTF-8")}"
      }.mkString("?", "&", "")
    val resp = expect(request("GET", s"$resourceType$qs", None), 200)
    val entries = mapper.readTree(resp.body()).path("entry")
    if (entries.isMissingNode || !entries.isArray) Seq.empty
    else {
      val out = Seq.newBuilder[String]
      entries.forEach { e =>
        val res = e.path("resource")
        if (!res.isMissingNode) out += mapper.writeValueAsString(res)
      }
      out.result().sorted
    }
  }
}

object HttpFhirStore {
  // one client (= one connection pool) per endpoint per JVM: HttpClient is
  // thread-safe, so every partition/task on an executor shares it
  private val clients = new ConcurrentHashMap[String, HttpClient]()
  private[connect] def clientFor(base: String): HttpClient =
    clients.computeIfAbsent(base, _ => HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10))
      .build())
}
