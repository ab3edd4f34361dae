package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Production REST write-back sink — the reference's one dataflow
  * edge that had no engine twin: the table loader posts records back
  * to NocoDB through REST (`table-loader/services/load_strategies.py:
  * 444-495`) and the conflict detector posts detected conflicts
  * (`fragment-validator/services/conflict_detector.py:106-128`).
  *
  * Spark-first shape: `foreachPartition` batch POSTs — every executor
  * writes its own partitions straight to the endpoint (no driver
  * funnel, no collect), so sink throughput scales with the cluster
  * exactly like the source scan does. Each POST carries up to
  * `batchSize` records as `{"records":[...]}`.
  *
  * Failure envelope — the same one as the source client
  * ([[HttpRestPages]], mirroring `redcap_client.py:53-170`):
  * exponential backoff with a cap on transients (connect/timeout,
  * HTTP 429/5xx), IMMEDIATE failure on any other 4xx (an auth or
  * shape error must not burn the retry budget), and a
  * consecutive-failure budget across requests that aborts the task
  * loudly when spent (any success resets the streak).
  *
  * At-least-once × idempotency: Spark retries a failed task from the
  * partition start, so a batch can be re-sent. Every POST therefore
  * carries a DETERMINISTIC `Idempotency-Key` header — md5 over
  * (partition id, batch index, batch body) — and a task retry
  * re-sends byte-identical batches under identical keys, which an
  * idempotent receiver (NocoDB keyed upsert, any dedup-by-key store)
  * collapses. The key is derived from CONTENT, never a timestamp or
  * RNG, per the engine's determinism discipline.
  *
  * CAVEAT the key contract depends on: partition MEMBERSHIP is stable
  * across task attempts (hash partitioning is deterministic) but
  * intra-partition row ORDER after a shuffle is not — shuffle-block
  * fetch order varies between attempts, so a retried task could group
  * the same rows into different batches and mint fresh keys. Pass
  * `stableKey` (a natural-key column list) and the sink sorts within
  * partitions before batching, making batch composition — and hence
  * every Idempotency-Key — a pure function of the data. Omitting
  * `stableKey` is only safe when the input's partition-iteration
  * order is itself deterministic (a direct file scan with no
  * upstream shuffle); the sink cannot verify that, so shuffled
  * inputs MUST pass `stableKey` for exactly-once delivery to an
  * idempotent receiver.
  *
  * Config rides `graft.rest.sink.*` system properties (set them via
  * `spark.executor.extraJavaOptions` on a real cluster; plain
  * `sys.props` in local mode):
  *
  *  - `graft.rest.sink.url` — POST endpoint (required)
  *  - `graft.rest.sink.authHeader` / `graft.rest.sink.authToken` —
  *    optional header auth; the `GRAFT_REST_AUTH_TOKEN` env var is
  *    the redaction-safe fallback, exactly like the source
  *  - `graft.rest.sink.maxRetries` (default 5), `backoffMs` (200),
  *    `maxBackoffMs` (30000), `maxConsecutiveFailures` (10),
  *    `minIntervalMs` (0, per-task throttle), `timeoutMs` (30000)
  *
  * Returns the number of rows posted (accumulator-counted on the
  * executors) so callers can assert parity against the staged frame —
  * the sink-side analogue of a rows-written check.
  */
object HttpRestSink {

  /** Retry-safe permanent failure: raised on any non-transient 4xx so
    * the task fails without burning the retry budget. Object-level
    * (no `$outer`) so the exception serializes back to the driver on a
    * real cluster instead of masking the HTTP error with a
    * NotSerializableException over the captured HttpClient. */
  final class PermanentHttpException(msg: String) extends RuntimeException(msg)

  /** Raised when `maxConsecutiveFailures` requests fail back-to-back.
    * Object-level for the same serializability reason. */
  final class FailureBudgetExhausted(msg: String) extends RuntimeException(msg)

  /** POST every row of `df` to the configured endpoint in batches of
    * `batchSize`. Blocking, runs as one Spark job; returns rows sent.
    *
    * `stableKey`: natural-key columns to sort within partitions before
    * batching. Required for stable Idempotency-Keys whenever `df` has
    * a shuffle upstream (see class doc); a no-op cost-wise for the
    * direct-scan case (in-memory sort of one task's rows). */
  def post(df: DataFrame, batchSize: Int = 100,
      stableKey: Seq[String] = Seq.empty): Long = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val src =
      if (stableKey.isEmpty) df
      else df.sortWithinPartitions(
        stableKey.map(org.apache.spark.sql.functions.col): _*)
    val spark = df.sparkSession
    val sent = spark.sparkContext.longAccumulator("graft.rest.sink.rows")
    val schema = df.schema
    src.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val client = new SinkClient(schema)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var batchIdx = 0
      it.grouped(batchSize).foreach { batch =>
        client.postBatch(pid, batchIdx, batch)
        sent.add(batch.size.toLong)
        batchIdx += 1
      }
    }
    sent.value
  }

  /** Per-task HTTP client (one instance per partition — the same
    * granularity as the source client's per-worker session, so the
    * throttle and failure streak are per-task too). */
  private final class SinkClient(schema: StructType) {
    private def prop(k: String, dflt: String = null): String =
      Option(System.getProperty(s"graft.rest.sink.$k")).orElse(Option(dflt))
        .getOrElse(throw new IllegalArgumentException(
          s"HttpRestSink: missing required system property graft.rest.sink.$k"))

    private val url = prop("url")
    private val maxRetries = prop("maxRetries", "5").toInt
    private val backoffMs = prop("backoffMs", "200").toLong
    private val maxBackoffMs = prop("maxBackoffMs", "30000").toLong
    private val maxConsecutiveFailures = prop("maxConsecutiveFailures", "10").toInt
    private val minIntervalMs = prop("minIntervalMs", "0").toLong
    private val timeoutMs = prop("timeoutMs", "30000").toLong

    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val http = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

    private var consecutiveFailures = 0
    private var lastRequestAt = 0L

    private def throttle(): Unit = if (minIntervalMs > 0) {
      val wait = lastRequestAt + minIntervalMs - System.currentTimeMillis()
      if (wait > 0) Thread.sleep(wait)
      lastRequestAt = System.currentTimeMillis()
    }

    /** Row → JSON object under the frame's schema (Jackson handles
      * escaping; dates/timestamps serialize as their SQL text form). */
    private def rowJson(row: org.apache.spark.sql.Row): com.fasterxml.jackson.databind.node.ObjectNode = {
      val o = mapper.createObjectNode()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (row.isNullAt(i)) { o.putNull(f.name); () }
        else f.dataType match {
          case IntegerType => o.put(f.name, row.getInt(i)); ()
          case LongType => o.put(f.name, row.getLong(i)); ()
          case DoubleType => o.put(f.name, row.getDouble(i)); ()
          case FloatType => o.put(f.name, row.getFloat(i)); ()
          case BooleanType => o.put(f.name, row.getBoolean(i)); ()
          case _: DecimalType => o.put(f.name, row.getDecimal(i)); ()
          case _ => o.put(f.name, String.valueOf(row.get(i))); ()
        }
      }
      o
    }

    def postBatch(pid: Int, batchIdx: Int,
        batch: Seq[org.apache.spark.sql.Row]): Unit = {
      val arr = mapper.createArrayNode()
      batch.foreach { r => arr.add(rowJson(r)); () }
      val env = mapper.createObjectNode()
      env.set[com.fasterxml.jackson.databind.JsonNode]("records", arr)
      val body = mapper.writeValueAsString(env)
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(s"$pid:$batchIdx:".getBytes("UTF-8"))
      md.update(body.getBytes("UTF-8"))
      val idemKey = md.digest().map("%02x".format(_)).mkString
      request(body, idemKey)
    }

    private def requestOnce(body: String, idemKey: String): Unit = {
      throttle()
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .header("Idempotency-Key", idemKey)
        .POST(HttpRequest.BodyPublishers.ofString(body))
      Option(System.getProperty("graft.rest.sink.authToken"))
        .orElse(sys.env.get("GRAFT_REST_AUTH_TOKEN")).foreach { t =>
        b.header(prop("authHeader", "Authorization"),
          if (prop("authHeader", "Authorization") == "Authorization") s"Bearer $t" else t)
      }
      val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
      resp.statusCode() match {
        case ok if ok >= 200 && ok < 300 => ()
        case transient if transient == 429 || transient >= 500 =>
          throw new java.io.IOException(s"HTTP $transient from $url")
        case permanent =>
          throw new PermanentHttpException(s"HTTP $permanent from $url")
      }
    }

    private def request(body: String, idemKey: String): Unit = {
      var attempt = 0
      var done = false
      while (!done) {
        try {
          requestOnce(body, idemKey)
          consecutiveFailures = 0
          done = true
        } catch {
          case e: PermanentHttpException => throw e
          case e: Throwable =>
            consecutiveFailures += 1
            if (consecutiveFailures >= maxConsecutiveFailures)
              throw new FailureBudgetExhausted(
                s"$consecutiveFailures consecutive failed requests " +
                  s"(budget $maxConsecutiveFailures); last: ${e.getMessage}")
            attempt += 1
            if (attempt > maxRetries) throw e
            Thread.sleep(math.min(
              backoffMs << math.min(attempt - 1, 10), maxBackoffMs))
        }
      }
    }
  }
}
