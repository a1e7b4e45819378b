package graft.api

import java.net.{HttpURLConnection, InetSocketAddress, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicLong

/** Query router — the reference's presto-router module (RouterResource
  * .java submit proxying; scheduler/ RandomChoiceScheduler.java,
  * UserHashScheduler.java, WeightedRandomRouterScheduler.java; groups in
  * RouterConfig): a thin HTTP front that picks a backend coordinator per
  * submitted query and PROXIES the `POST /v1/statement`. The returned
  * QueryResults' nextUri points directly at the chosen backend (the
  * protocol's async-paging pattern), so every subsequent GET/DELETE
  * bypasses the router — it is never on the data path, which is exactly
  * what lets one router front arbitrarily many coordinators at scale.
  *
  * Scheduler policies mirror the reference's plugins, made deterministic
  * (no wall-clock/RNG): ROUND_ROBIN walks a counter, USER_HASH pins a
  * user to a backend by md5 (the reference's sticky scheduler, so session
  * state like prepares lands on one coordinator), WEIGHTED repeats each
  * backend proportionally to its weight within one counter cycle.
  */
object Router {

  sealed trait Scheduler
  case object RoundRobin extends Scheduler
  case object UserHash extends Scheduler
  final case class Weighted(weights: Seq[Int]) extends Scheduler

  @volatile private var server: com.sun.net.httpserver.HttpServer = _
  @volatile private var boundPort: Int = -1
  @volatile private var backends: Vector[String] = Vector.empty
  @volatile private var policy: Scheduler = RoundRobin
  private val counter = new AtomicLong(0)
  private val pickLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]

  /** Which backend index each submit chose (user, idx) — observability
    * for specs and the reference's /v1/router UI stats. */
  def picks: Seq[(String, Int)] = {
    import scala.jdk.CollectionConverters._
    pickLog.asScala.toSeq
  }

  private def pick(user: String): Int = policy match {
    case RoundRobin => (counter.getAndIncrement() % backends.size).toInt
    case UserHash =>
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(user.getBytes(UTF_8)).take(7).map("%02x".format(_))
          .mkString, 16)
      (h % backends.size).toInt
    case Weighted(ws) =>
      require(ws.size == backends.size && ws.forall(_ > 0))
      val total = ws.sum
      var slot = (counter.getAndIncrement() % total).toInt
      var i = 0
      while (slot >= ws(i)) { slot -= ws(i); i += 1 }
      i
  }

  def ensureStarted(backendUris: Seq[String],
      scheduler: Scheduler = RoundRobin): String = synchronized {
    require(backendUris.nonEmpty, "router needs at least one backend")
    backends = backendUris.toVector
    policy = scheduler
    counter.set(0)
    pickLog.clear()
    if (server != null) return s"http://127.0.0.1:$boundPort"
    val s = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/v1/statement", handler)
    s.setExecutor(Executors.newFixedThreadPool(4, (r: Runnable) => {
      val t = new Thread(r, "graft-router")
      t.setDaemon(true)
      t
    }))
    s.start()
    server = s
    boundPort = s.getAddress.getPort
    s"http://127.0.0.1:$boundPort"
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null; boundPort = -1 }
    pickLog.clear()
  }

  private def handler: com.sun.net.httpserver.HttpHandler =
    (ex: com.sun.net.httpserver.HttpExchange) => try {
      if (ex.getRequestMethod != "POST") {
        val msg = """{"message":"router only proxies POST /v1/statement"}"""
        respond(ex, 404, msg)
      } else {
        val body = ex.getRequestBody.readAllBytes()
        val user = Option(ex.getRequestHeaders.getFirst("X-Presto-User"))
          .getOrElse("graft")
        val idx = pick(user)
        pickLog.add((user, idx))
        val conn = new URL(s"${backends(idx)}/v1/statement")
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(120000)
        conn.setDoOutput(true)
        // forward the protocol headers verbatim (session context, user,
        // prepares, auth) — the backend owns all semantics
        import scala.jdk.CollectionConverters._
        ex.getRequestHeaders.asScala.foreach { case (k, vs) =>
          val lk = k.toLowerCase
          if (lk.startsWith("x-presto-") || lk == "authorization" ||
              lk == "content-type")
            vs.asScala.foreach(v => conn.addRequestProperty(k, v))
        }
        val os = conn.getOutputStream
        try os.write(body) finally os.close()
        val code = conn.getResponseCode
        val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val resp = if (in == null) Array.emptyByteArray
        else try in.readAllBytes() finally in.close()
        // pass X-Presto-* response headers (Set-Session etc.) back through
        conn.getHeaderFields.asScala.foreach { case (k, vs) =>
          if (k != null && k.toLowerCase.startsWith("x-presto-"))
            vs.asScala.foreach(v => ex.getResponseHeaders.add(k, v))
        }
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, if (resp.isEmpty) -1L else resp.length.toLong)
        if (resp.nonEmpty) {
          val ros = ex.getResponseBody
          try ros.write(resp) finally ros.close()
        }
        ex.close()
      }
    } catch {
      case e: Throwable =>
        try respond(ex, 502,
          s"""{"message":"router proxy error: ${
            String.valueOf(e.getMessage).replace("\"", "'")}"}""")
        catch { case _: Throwable => () }
    }

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
      body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
    ex.close()
  }
}
