package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.SparkSpec

/** The REST write-back sink against a real in-process HTTP server:
  * all rows land with count parity, batches carry deterministic
  * idempotency keys that REPEAT on retry (the at-least-once
  * contract), transients are retried under the backoff envelope, and
  * a permanent 4xx fails the job immediately. */
class HttpRestSinkSpec extends SparkSpec {
  import spark.implicits._

  /** idempotency key → times seen; body store keyed the same way. */
  private val seen = new ConcurrentHashMap[String, AtomicInteger]()
  private val bodies = new ConcurrentHashMap[String, String]()
  private val postCount = new AtomicInteger(0)

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), "UTF-8")

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def withServer(handler: HttpExchange => Unit)(f: Int => Unit): Unit = {
    seen.clear(); bodies.clear(); postCount.set(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sink", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = handler(ex)
    })
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  private def withProps(props: Map[String, String])(f: => Unit): Unit = {
    val keys = props.keys.map(k => s"graft.rest.sink.$k")
    try {
      props.foreach { case (k, v) => System.setProperty(s"graft.rest.sink.$k", v) }
      f
    } finally keys.foreach(System.clearProperty)
  }

  private def baseProps(port: Int): Map[String, String] = Map(
    "url" -> s"http://127.0.0.1:$port/sink",
    "backoffMs" -> "1")

  private def accept(ex: HttpExchange): Unit = {
    val key = ex.getRequestHeaders.getFirst("Idempotency-Key")
    val body = readBody(ex)
    seen.computeIfAbsent(key, _ => new AtomicInteger).incrementAndGet()
    bodies.put(key, body)
    postCount.incrementAndGet()
    respond(ex, 200, """{"ok":true}""")
  }

  test("all rows land in batches with count parity and distinct idempotency keys") {
    withServer(accept) { port =>
      withProps(baseProps(port)) {
        val df = (1 to 107).map(i => (i.toLong, s"rec-$i", i % 5))
          .toDF("id", "name", "center").repartition(4)
        val sent = HttpRestSink.post(df, batchSize = 10)
        assert(sent == 107L)
        // server-side reassembly: every record arrived exactly once
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val got = bodies.values().toArray.map(_.asInstanceOf[String]).flatMap { b =>
          val recs = mapper.readTree(b).get("records")
          (0 until recs.size).map(i => recs.get(i).get("id").asLong)
        }.toSeq
        assert(got.sorted == (1L to 107L), s"got ${got.size} rows")
        // batch shape: ceil per partition, never a giant single POST
        assert(postCount.get >= 11 && postCount.get <= 14, postCount.get.toString)
        // keys are distinct per batch and each seen once (no retries)
        assert(seen.size == postCount.get)
        assert(seen.values().toArray.forall(_.asInstanceOf[AtomicInteger].get == 1))
      }
    }
  }

  test("transient 503s are retried with the SAME idempotency key (at-least-once dedup)") {
    val firstSeen = new ConcurrentHashMap[String, AtomicInteger]()
    withServer { ex =>
      val key = ex.getRequestHeaders.getFirst("Idempotency-Key")
      val n = firstSeen.computeIfAbsent(key, _ => new AtomicInteger).incrementAndGet()
      if (n <= 2) respond(ex, 503, "busy")
      else accept(ex)
    } { port =>
      withProps(baseProps(port) ++ Map("maxRetries" -> "5",
          "maxConsecutiveFailures" -> "10")) {
        val df = (1 to 20).map(i => (i.toLong, s"rec-$i")).toDF("id", "name")
          .repartition(2)
        assert(HttpRestSink.post(df, batchSize = 7) == 20L)
        // every key was attempted exactly 3 times (2 transients + 1 ok)
        assert(firstSeen.values().toArray
          .forall(_.asInstanceOf[AtomicInteger].get == 3))
        // and the receiver, deduping by key, accepted each batch once
        assert(seen.values().toArray.forall(_.asInstanceOf[AtomicInteger].get == 1))
      }
    }
  }

  test("permanent 400 fails the job immediately, without burning the retry budget") {
    val attempts = new AtomicInteger(0)
    withServer { ex =>
      attempts.incrementAndGet()
      respond(ex, 400, """{"error":"bad shape"}""")
    } { port =>
      withProps(baseProps(port) ++ Map("maxRetries" -> "50")) {
        val df = (1 to 5).map(i => (i.toLong, s"r$i")).toDF("id", "name")
          .coalesce(1)
        val e = intercept[Exception] { HttpRestSink.post(df, batchSize = 10) }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("HTTP 400")), msgs(e).mkString("|"))
        assert(attempts.get == 1, s"400 must not be retried, saw ${attempts.get}")
      }
    }
  }

  test("stableKey makes idempotency keys invariant to upstream row order (shuffle-retry contract)") {
    // Two runs of the SAME logical data arriving in different
    // intra-partition orders — the stand-in for a task retry whose
    // shuffle-block fetch order changed. With stableKey the sink sorts
    // within partitions before batching, so batch composition (and
    // every Idempotency-Key) must be identical across the runs.
    def runOnce(orderSeed: Int): Set[String] = {
      var keys = Set.empty[String]
      withServer(accept) { port =>
        withProps(baseProps(port)) {
          val rows = (1 to 60).map(i => (i.toLong, s"rec-$i"))
          val shuffled = new scala.util.Random(orderSeed).shuffle(rows)
          // repartition on id → partition MEMBERSHIP deterministic,
          // arrival order within a partition follows the input order
          val df = shuffled.toDF("id", "name")
            .repartition(3, org.apache.spark.sql.functions.col("id"))
          assert(HttpRestSink.post(df, batchSize = 8,
            stableKey = Seq("id")) == 60L)
          keys = seen.keySet().toArray.map(_.asInstanceOf[String]).toSet
        }
      }
      keys
    }
    val a = runOnce(1)
    val b = runOnce(2)
    assert(a == b, s"keys diverged across input orders: ${a.diff(b).take(3)}")
  }

  test("null fields and typed values serialize faithfully") {
    withServer(accept) { port =>
      withProps(baseProps(port)) {
        val df = Seq(
          (1L, Some("a"), Some(2.5), Some(true)),
          (2L, None, None, None))
          .toDF("id", "s", "d", "b").coalesce(1)
        assert(HttpRestSink.post(df, batchSize = 10) == 2L)
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val recs = mapper.readTree(bodies.values().iterator().next())
          .get("records")
        val byId = (0 until recs.size).map(i => recs.get(i))
          .map(n => n.get("id").asLong -> n).toMap
        assert(byId(1L).get("s").asText == "a" &&
          byId(1L).get("d").asDouble == 2.5 && byId(1L).get("b").asBoolean)
        assert(byId(2L).get("s").isNull && byId(2L).get("d").isNull &&
          byId(2L).get("b").isNull)
      }
    }
  }
}
