package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.SparkSpec

/** The production HTTP client under a real (in-process) HTTP server:
  * flaky-server retries, the consecutive-failure budget, permanent-4xx
  * fail-fast, and the full DataSourceV2 path end-to-end over the wire.
  * (The build container has no network egress; 127.0.0.1 is local.) */
class HttpRestPagesSpec extends SparkSpec {

  private val Total = 100
  private val PageSize = 30

  /** offset → request count (to assert retry/fail-fast shapes). */
  private val hits = new ConcurrentHashMap[String, AtomicInteger]()
  private def hit(key: String): Int =
    hits.computeIfAbsent(key, _ => new AtomicInteger).incrementAndGet()

  private def rowJson(n: Int): String =
    s"""{"record_id":"R-$n","center_id":${n % 5},"age":${20 + n % 50}}"""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap

  private def pageBody(offset: Int, limit: Int): String = {
    val rows = (offset until math.min(offset + limit, Total)).map(rowJson)
    s"""{"total":$Total,"rows":[${rows.mkString(",")}]}"""
  }

  private def withServer(handler: HttpExchange => Unit)(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/records", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = handler(ex)
    })
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  private def withProps(props: Map[String, String])(f: => Unit): Unit = {
    val keys = props.keys.map(k => s"graft.rest.$k")
    try {
      props.foreach { case (k, v) => System.setProperty(s"graft.rest.$k", v) }
      f
    } finally keys.foreach(System.clearProperty)
  }

  private def baseProps(port: Int): Map[String, String] = Map(
    "url" -> s"http://127.0.0.1:$port/records",
    "schema" -> "record_id STRING, center_id INT, age INT",
    "pageSize" -> PageSize.toString,
    "backoffMs" -> "1")

  test("flaky server: every page 503s twice, the backoff envelope still lands all rows") {
    hits.clear()
    withServer { ex =>
      val q = query(ex)
      val off = q("offset")
      if (hit(off) <= 2) respond(ex, 503, "try later")
      else respond(ex, 200, pageBody(off.toInt, q("limit").toInt))
    } { port =>
      withProps(baseProps(port) ++ Map("maxRetries" -> "5",
          "maxConsecutiveFailures" -> "10")) {
        // the FULL DSv2 path: pageCount on the driver, page bodies on
        // executor tasks, column pruning pushed into the reader
        val df = spark.read.format("graft.sources.RestDataSource")
          .option("client", "graft.sources.HttpRestPages")
          .option("maxRetries", "0") // client-internal retries only
          .load()
        assert(df.count() == Total)
        val ages = df.select("age").collect().map(_.getInt(0))
        assert(ages.toSeq == (0 until Total).map(n => 20 + n % 50))
        // 4 pages + the pageCount probe all saw their two 503s
        assert(hits.values().toArray.forall(_.asInstanceOf[AtomicInteger].get >= 3))
      }
    }
  }

  test("consecutive-failure budget exhausts loudly before the per-request retry budget") {
    hits.clear()
    withServer { ex => hit("all"); respond(ex, 503, "down") } { port =>
      withProps(baseProps(port) ++ Map(
          "maxRetries" -> "50", "maxConsecutiveFailures" -> "4")) {
        val client = new HttpRestPages
        val e = intercept[RuntimeException] { client.pageCount }
        assert(e.getClass.getSimpleName == "FailureBudgetExhausted")
        assert(e.getMessage.contains("budget 4"))
        assert(hits.get("all").get == 4) // stopped at the budget, not 51
      }
    }
  }

  test("permanent 4xx fails immediately without burning the retry budget") {
    hits.clear()
    withServer { ex => hit("all"); respond(ex, 401, "bad token") } { port =>
      withProps(baseProps(port) ++ Map("maxRetries" -> "50")) {
        val client = new HttpRestPages
        val e = intercept[RuntimeException] { client.pageCount }
        assert(e.getMessage.contains("HTTP 401"))
        assert(hits.get("all").get == 1) // exactly one request
      }
    }
  }

  test("auth token rides the configured header; success resets the failure streak") {
    hits.clear()
    withServer { ex =>
      val tok = ex.getRequestHeaders.getFirst("xc-token")
      if (tok != "secret-1") respond(ex, 401, "no token")
      else {
        val q = query(ex)
        // fail every FIRST request per offset: a success between
        // transients must keep the streak below the budget
        if (hit(q("offset")) == 1) respond(ex, 503, "blip")
        else respond(ex, 200, pageBody(q("offset").toInt, q("limit").toInt))
      }
    } { port =>
      withProps(baseProps(port) ++ Map(
          "authHeader" -> "xc-token", "authToken" -> "secret-1",
          "maxRetries" -> "2", "maxConsecutiveFailures" -> "3")) {
        val client = new HttpRestPages
        assert(client.pageCount == 4) // ceil(100/30)
        val rows = (0 until client.pageCount).flatMap(client.fetchPage)
        assert(rows.length == Total)
        assert(rows.head.getString(0) == "R-0" && rows.last.getString(0) == "R-99")
      }
    }
  }
}
