package graft.connect

import java.net.InetSocketAddress
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process FHIR REST stub (JDK HttpServer, one dispatch thread so the
  * request log is strictly ordered): implements the create/update/delete/
  * read/search verbs with FHIR wire conventions — 201 + `Location:
  * …/Type/{id}/_history/1` on POST, Bundle JSON on search — and records
  * every request so specs can assert the EXACT method/path/body sequences
  * the reference pipelines emit (dags/ODSImport.py:246-256,292-304,
  * 646-659).
  *
  * `failNext(n, code)` makes the next n requests fail with `code` before
  * any state change — the X9 retry probe.
  */
class StubFhirServer {
  case class Req(method: String, path: String, body: String)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  private val data = new ConcurrentHashMap[String, String]() // Type/id -> json
  private val seq = new AtomicLong(0)
  private val mapper = new ObjectMapper
  val requests = new ConcurrentLinkedQueue[Req]()
  private val failures = new AtomicInteger(0)
  @volatile private var failCode = 500

  def failNext(n: Int, code: Int = 500): Unit = { failCode = code; failures.set(n) }
  /** Arm a single failure on the k-th request from now (1-based) — lets a
    * spec drop a specific verb mid-batch (e.g. the first PUT after its
    * version-check GET) instead of whatever comes first.
    */
  def failNth(k: Int, code: Int = 500): Unit = {
    failCode = code; skipBeforeFail.set(k - 1); failures.set(1)
  }
  private val skipBeforeFail = new AtomicInteger(0)
  /** Delay the next n responses by ms (after logging the request) — the
    * X9 request-TIMEOUT probe: a response slower than the client's
    * requestTimeoutSec surfaces as HttpTimeoutException (an IOException),
    * which the bounded retry must recover from.
    */
  def delayNextMs(n: Int, ms: Long): Unit = { delayMs = ms; delays.set(n) }
  private val delays = new AtomicInteger(0)
  @volatile private var delayMs = 0L
  def log: Seq[Req] = requests.asScala.toSeq
  def clearLog(): Unit = requests.clear()
  def contents: Map[String, String] = data.asScala.toMap
  def put(key: String, json: String): Unit = data.put(key, json)

  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(null) // single dispatch thread → deterministic log
  server.start()
  val port: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String,
      headers: (String, String)* ): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    if (body.isEmpty) ex.sendResponseHeaders(code, -1)
    else {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/fhir+json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    }
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath.stripPrefix("/")
    val query = Option(ex.getRequestURI.getQuery)
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    requests.add(Req(method,
      path + query.map("?" + _).getOrElse(""), body))
    if (delays.getAndUpdate(n => math.max(n - 1, 0)) > 0)
      Thread.sleep(delayMs)
    if (skipBeforeFail.getAndUpdate(n => math.max(n - 1, 0)) > 0) {
      // armed via failNth but the target request hasn't arrived yet
    } else if (failures.getAndUpdate(n => math.max(n - 1, 0)) > 0) {
      respond(ex, failCode, s"""{"issue":"injected $failCode"}""")
      return
    }
    val segs = path.split("/").filter(_.nonEmpty)
    (method, segs) match {
      case ("POST", Array(rt)) =>
        val id = seq.incrementAndGet().toString
        data.put(s"$rt/$id", body)
        respond(ex, 201, body,
          "Location" -> s"$baseUrl/$rt/$id/_history/1")
      case ("PUT", Array(rt, id)) =>
        data.put(s"$rt/$id", body)
        respond(ex, 200, body)
      case ("DELETE", Array(rt, id)) =>
        data.remove(s"$rt/$id")
        respond(ex, 204, "")
      case ("GET", Array(rt, id)) =>
        Option(data.get(s"$rt/$id")) match {
          case Some(json) => respond(ex, 200, json)
          case None => respond(ex, 404, """{"issue":"not-found"}""")
        }
      case ("GET", Array(rt)) =>
        // search: top-level-field equality on each query param
        val params = query.toSeq.flatMap(_.split("&")).flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => Some(java.net.URLDecoder.decode(k, "UTF-8") ->
              java.net.URLDecoder.decode(v, "UTF-8"))
            case _ => None
          }
        }
        val hits = data.asScala.toSeq.sortBy(_._1).collect {
          case (k, json) if k.startsWith(s"$rt/") && params.forall {
            case (pk, pv) =>
              val n = mapper.readTree(json).path(pk)
              !n.isMissingNode && n.asText() == pv
          } => json
        }
        val bundle = s"""{"resourceType":"Bundle","type":"searchset",""" +
          s""""total":${hits.length},"entry":[""" +
          hits.map(j => s"""{"resource":$j}""").mkString(",") + "]}"
        respond(ex, 200, bundle)
      case _ =>
        respond(ex, 400, """{"issue":"unsupported"}""")
    }
  }
}
