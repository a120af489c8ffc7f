package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import graft.streaming.AnsModel._

/** JSON wire codec for [[AnsModel.AnsDoc]] — the Draft API speaks JSON
  * (`tag.py:12-29` GETs/PUTs ANS documents), so the HTTP store does too,
  * unlike [[FileDocumentStore]]'s JVM-serialized stand-in. Encoding is a
  * hand-rolled emitter (the doc model is four fields); decoding goes
  * through jackson-databind (already on Spark's classpath) into untyped
  * maps — no extra dependency, no reflection modules.
  */
private[streaming] object AnsJson {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def write(doc: AnsDoc): String = {
    val rev = doc.revision.map(r => s""","revision":$r""").getOrElse("")
    val tax = doc.taxonomy.map { t =>
      val tags = t.tags.map(_.map(tg =>
          s"""{"slug":"${esc(tg.slug)}","text":"${esc(tg.text)}"}""")
          .mkString(""""tags":[""", ",", "]"))
        .getOrElse("")
      s""","taxonomy":{$tags}"""
    }.getOrElse("")
    s"""{"_id":"${esc(doc._id)}"$rev$tax}"""
  }

  def read(body: String): AnsDoc = {
    val m = mapper.readValue(body, classOf[java.util.Map[String, Object]])
    val taxonomy = Option(m.get("taxonomy")).map { t =>
      val tm = t.asInstanceOf[java.util.Map[String, Object]]
      val tags = Option(tm.get("tags")).map { ts =>
        import scala.jdk.CollectionConverters._
        ts.asInstanceOf[java.util.List[Object]].asScala.toSeq.map { tg =>
          val g = tg.asInstanceOf[java.util.Map[String, Object]]
          Tag(g.get("slug").asInstanceOf[String],
            g.get("text").asInstanceOf[String])
        }
      }
      Taxonomy(tags)
    }
    AnsDoc(m.get("_id").asInstanceOf[String],
      Option(m.get("revision")).map(_.asInstanceOf[Number].longValue()),
      taxonomy)
  }
}

/** HTTP-backed [[DocumentStore]] — the production seam the reference's
  * Draft API calls model (`tag.py:12-17` GET by id, `tag.py:19-29` PUT),
  * which [[FileDocumentStore]] only simulated on disk. Semantics:
  *
  *  - one POOLED client per store instance (java.net.http keeps
  *    connections alive), resolved executor-locally through
  *    [[DocumentStore.resolve]] like every store — tasks never serialize
  *    a client;
  *  - bounded RETRY with exponential backoff on connect errors and 5xx
  *    (the reference has none — one flaky GET kills the record,
  *    `tag.py:54-57` via the bare except at `app.py:71-75`; here a
  *    TRANSIENT fault is absorbed and only a persistent one surfaces,
  *    failing the micro-batch, which Structured Streaming then retries
  *    from the checkpoint — at-least-once, safe under the idempotent tag
  *    append);
  *  - [[update]] is true server-side optimistic concurrency: GET carries
  *    an `ETag`, the write-back PUTs with `If-Match` (or `If-None-Match:
  *    *` for create), and a 412 re-reads and retries — the
  *    revision-check discipline `README.md:250` says the reference
  *    lacks, expressed in standard HTTP conditionals.
  *
  * Paths: `GET/PUT {base}/documents/{id}`, `GET {base}/documents`.
  */
class HttpDocumentStore(
    baseUrl: String,
    maxAttempts: Int = 4,
    backoffMs: Long = 50L,
    timeoutMs: Long = 5000L) extends DocumentStore {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .build()

  private def docUri(id: String): URI = URI.create(
    s"$baseUrl/documents/" +
      java.net.URLEncoder.encode(id, UTF_8).replace("+", "%20"))

  /** Send with bounded retry + exponential backoff — [[HttpRetry]], the
    * policy shared with [[HttpBlobFetcher]]: 4xx returns to the caller
    * (client errors are semantic, not transient), 5xx and I/O faults
    * retry.
    */
  private def send(req: HttpRequest): HttpResponse[String] =
    HttpRetry.send(client, req, HttpResponse.BodyHandlers.ofString(),
      maxAttempts, backoffMs)

  private def getWithTag(id: String): (Option[AnsDoc], Option[String]) = {
    val r = send(HttpRequest.newBuilder(docUri(id))
      .timeout(Duration.ofMillis(timeoutMs)).GET().build())
    if (r.statusCode() == 404) (None, None)
    else (Some(AnsJson.read(r.body())),
      Option(r.headers().firstValue("ETag").orElse(null)))
  }

  override def get(id: String): Option[AnsDoc] = getWithTag(id)._1

  /** Unconditional PUT — the reference's raw last-writer-wins write-back
    * (`tag.py:19-29`, no locking per `README.md:250`).
    */
  override def upsert(doc: AnsDoc): Unit = {
    send(HttpRequest.newBuilder(docUri(doc._id))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(AnsJson.write(doc))).build())
    ()
  }

  /** Conditional read-modify-write: `If-Match` on the GET's ETag (or
    * `If-None-Match: *` when creating), 412 → re-read and retry. The
    * server enforces the version check atomically, so no client-side
    * lock file exists to break or leak — the production answer to
    * [[FileDocumentStore]]'s documented residual lock window.
    */
  override def update(id: String)(f: Option[AnsDoc] => AnsDoc): AnsDoc = {
    while (true) {
      val (cur, tag) = getWithTag(id)
      val next = f(cur)
      val b = HttpRequest.newBuilder(docUri(id))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
      val cond = tag match {
        case Some(t) => b.header("If-Match", t)
        case None    => b.header("If-None-Match", "*")
      }
      val r = send(cond
        .PUT(HttpRequest.BodyPublishers.ofString(AnsJson.write(next)))
        .build())
      if (r.statusCode() != 412) return next
      // lost the race — loop, re-read, recompute
    }
    throw new IllegalStateException("unreachable")
  }

  override def snapshot: Seq[AnsDoc] = {
    val r = send(HttpRequest.newBuilder(URI.create(s"$baseUrl/documents"))
      .timeout(Duration.ofMillis(timeoutMs)).GET().build())
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import scala.jdk.CollectionConverters._
    mapper.readValue(r.body(), classOf[java.util.List[Object]]).asScala.toSeq
      .map(o => AnsJson.read(mapper.writeValueAsString(o)))
  }

  def size: Int = snapshot.size
}

/** In-process Draft-API stub (JDK `com.sun.net.httpserver`, no deps):
  * versioned documents with atomic `If-Match`/`If-None-Match` PUT
  * semantics, plus failure injection for retry tests. Test double for
  * [[HttpDocumentStore]] — the real endpoint is config (`tag.py:9-10`
  * reads the API root + credentials from the environment; see README's
  * connector-config section).
  */
class DraftApiStub {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}
  import java.util.concurrent.atomic.AtomicInteger

  private val docs =
    new java.util.LinkedHashMap[String, (Long, String)]() // id -> (version, json)
  /** Requests that will 500 before service resumes (failure injection). */
  val failNext = new AtomicInteger(0)
  /** Total requests served (diagnostics). */
  val hits = new AtomicInteger(0)

  private val server = HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/documents", (x: HttpExchange) => handle(x))
  server.setExecutor(HttpRetry.daemonPool(4))
  server.start()

  def baseUrl: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)

  private def reply(x: HttpExchange, code: Int, body: String,
      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => x.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes(UTF_8)
    x.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) x.getResponseBody.write(bytes)
    x.close()
  }

  private def handle(x: HttpExchange): Unit = try {
    hits.incrementAndGet()
    if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      reply(x, 500, """{"error":"injected"}"""); return
    }
    val path = x.getRequestURI.getPath
    val id = java.net.URLDecoder.decode(
      path.stripPrefix("/documents").stripPrefix("/"), UTF_8)
    (x.getRequestMethod, id) match {
      case ("GET", "") => docs.synchronized {
        import scala.jdk.CollectionConverters._
        reply(x, 200,
          docs.values().asScala.map(_._2).mkString("[", ",", "]"),
          "Content-Type" -> "application/json")
      }
      case ("GET", _) => docs.synchronized {
        Option(docs.get(id)) match {
          case Some((v, body)) => reply(x, 200, body,
            "Content-Type" -> "application/json", "ETag" -> s""""v$v"""")
          case None => reply(x, 404, "")
        }
      }
      case ("PUT", _) =>
        val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
        val ifMatch = Option(x.getRequestHeaders.getFirst("If-Match"))
        val ifNone = Option(x.getRequestHeaders.getFirst("If-None-Match"))
        docs.synchronized { // version check + write are one atomic step
          val cur = Option(docs.get(id))
          val conflict =
            ifMatch.exists(t => !cur.exists(c => s""""v${c._1}"""" == t)) ||
              (ifNone.contains("*") && cur.isDefined)
          if (conflict) reply(x, 412, "")
          else {
            val v = cur.map(_._1 + 1).getOrElse(1L)
            docs.put(id, (v, body))
            reply(x, 200, "", "ETag" -> s""""v$v"""")
          }
        }
      case _ => reply(x, 405, "")
    }
  } catch {
    case e: Throwable => reply(x, 500, s"""{"error":"${e.getMessage}"}""")
  }
}
