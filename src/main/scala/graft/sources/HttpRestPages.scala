package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Production HTTP page client for [[RestDataSource]] — the real
  * network path behind the S4/S5 REST scans (REDCap `record` export,
  * NocoDB `api/v2/tables/…/records`), with the reference client's
  * failure envelope re-expressed per executor task
  * (`redcap-pipeline/services/redcap_client.py:53-170`:
  * exponential backoff on transients, a consecutive-failure budget
  * that aborts the worker, immediate failure on non-transient 4xx;
  * `fragment-validator/services/nocodb_client.py:80-107`: offset/limit
  * pagination with a total-rows envelope).
  *
  * Clients are instantiated BY CLASS NAME once per executor task (see
  * [[RestPages]]), so all configuration rides system properties — on a
  * real cluster set them via `spark.executor.extraJavaOptions`
  * (`-Dgraft.rest.url=…`); in local mode plain `sys.props` works:
  *
  *  - `graft.rest.url` — base endpoint; pages are fetched as
  *    `url?offset=<i*pageSize>&limit=<pageSize>` (`&` when the url
  *    already carries a query string)
  *  - `graft.rest.schema` — DDL of the export, e.g.
  *    `"record_id STRING, center_id INT, age INT"`
  *  - `graft.rest.pageSize` (default 100)
  *  - `graft.rest.rowsField` (default `rows`) / `graft.rest.totalField`
  *    (default `total`) — names of the row-array and total-row-count
  *    fields in the JSON envelope (NocoDB v2: `list` and a nested
  *    path `pageInfo.totalRows`, written dotted)
  *  - `graft.rest.authHeader` / `graft.rest.authToken` — optional
  *    header auth (`Authorization: Bearer <t>`, `xc-token: <t>`, …).
  *    SECRET-HANDLING CAVEAT: a token embedded in
  *    `spark.executor.extraJavaOptions` is shown UNREDACTED on the
  *    Spark UI Environment page and in event logs (Spark's redaction
  *    matches config KEY names, not `-D` values inside another
  *    config). Prefer the executor-side env var
  *    `GRAFT_REST_AUTH_TOKEN` (read as a fallback when the system
  *    property is absent — set it via
  *    `spark.executorEnv.GRAFT_REST_AUTH_TOKEN`, which IS covered by
  *    the default `spark.redaction.regex` since the name contains
  *    TOKEN), or extend `spark.redaction.regex` to cover
  *    `extraJavaOptions` if the `-D` route is unavoidable
  *  - `graft.rest.maxRetries` (default 5) — per-request transient
  *    retries, backoff `min(backoffMs * 2^min(attempt, 10),
  *    maxBackoffMs)`
  *  - `graft.rest.backoffMs` (default 200)
  *  - `graft.rest.maxBackoffMs` (default 30000) — backoff ceiling
  *  - `graft.rest.maxConsecutiveFailures` (default 10) — ACROSS
  *    requests: that many transient-exhausted or failed requests in a
  *    row aborts the task loudly (the reference kills the worker pool
  *    the same way); any success resets the streak
  *  - `graft.rest.minIntervalMs` (default 0) — per-instance request
  *    throttle: one client per executor task reproduces the
  *    reference's per-worker rate limit
  *  - `graft.rest.timeoutMs` (default 30000) — connect + request
  *
  * Transient = connect/timeout exceptions, HTTP 429 and 5xx. Anything
  * else 4xx is permanent and thrown immediately (auth/shape errors
  * must not burn the retry budget). `fetchPage(i)` is deterministic
  * per index (offset/limit), so Spark task retries are safe.
  */
class HttpRestPages extends RestPages {

  private def prop(k: String, dflt: String = null): String =
    Option(System.getProperty(s"graft.rest.$k")).orElse(Option(dflt))
      .getOrElse(throw new IllegalArgumentException(
        s"HttpRestPages: missing required system property graft.rest.$k"))

  private val url = prop("url")
  private val pageSize = prop("pageSize", "100").toInt
  private val rowsField = prop("rowsField", "rows")
  private val totalField = prop("totalField", "total")
  private val maxRetries = prop("maxRetries", "5").toInt
  private val backoffMs = prop("backoffMs", "200").toLong
  private val maxBackoffMs = prop("maxBackoffMs", "30000").toLong
  private val maxConsecutiveFailures = prop("maxConsecutiveFailures", "10").toInt
  private val minIntervalMs = prop("minIntervalMs", "0").toLong
  private val timeoutMs = prop("timeoutMs", "30000").toLong

  override val schema: StructType = StructType.fromDDL(prop("schema"))

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  // failure streak + throttle clock are per-instance = per executor
  // task, the same granularity as the reference's per-worker session
  private var consecutiveFailures = 0
  private var lastRequestAt = 0L

  /** Non-transient HTTP failure (4xx other than 429): no retry. */
  final class PermanentHttpException(msg: String) extends RuntimeException(msg)
  /** The consecutive-failure budget is spent: abort the task. */
  final class FailureBudgetExhausted(msg: String) extends RuntimeException(msg)

  private def throttle(): Unit = if (minIntervalMs > 0) {
    val wait = lastRequestAt + minIntervalMs - System.currentTimeMillis()
    if (wait > 0) Thread.sleep(wait)
    lastRequestAt = System.currentTimeMillis()
  }

  private def requestOnce(uri: String): String = {
    throttle()
    val b = HttpRequest.newBuilder(URI.create(uri))
      .timeout(Duration.ofMillis(timeoutMs)).GET()
    Option(System.getProperty("graft.rest.authToken"))
      .orElse(sys.env.get("GRAFT_REST_AUTH_TOKEN")).foreach { t =>
      b.header(prop("authHeader", "Authorization"),
        if (prop("authHeader", "Authorization") == "Authorization") s"Bearer $t" else t)
    }
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case ok if ok >= 200 && ok < 300 => resp.body()
      case transient if transient == 429 || transient >= 500 =>
        throw new java.io.IOException(s"HTTP $transient from $uri")
      case permanent =>
        throw new PermanentHttpException(s"HTTP $permanent from $uri")
    }
  }

  /** One logical GET under the full failure envelope: exponential
    * backoff on transients, straight-through on permanents, and the
    * cross-request consecutive-failure budget. */
  private def request(uri: String): String = {
    var attempt = 0
    while (true) {
      try {
        val body = requestOnce(uri)
        consecutiveFailures = 0
        return body
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
          // capped exponential backoff: an uncapped shift overflows
          // Long around attempt ~56 and sleeps for hours long before
          // that — cap the exponent and the resulting wait
          Thread.sleep(math.min(
            backoffMs << math.min(attempt - 1, 10), maxBackoffMs))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def pageUri(i: Int): String = {
    val sep = if (url.contains("?")) "&" else "?"
    s"$url${sep}offset=${i.toLong * pageSize}&limit=$pageSize"
  }

  /** Walk a dotted path (`pageInfo.totalRows`) into the envelope. */
  private def at(node: JsonNode, dotted: String): JsonNode =
    dotted.split('.').foldLeft(node)((n, k) => if (n == null) null else n.get(k))

  override lazy val pageCount: Int = {
    val env = mapper.readTree(request(pageUri(0)))
    val total = Option(at(env, totalField)).map(_.asLong).getOrElse(
      throw new IllegalArgumentException(
        s"HttpRestPages: envelope has no '$totalField' field"))
    math.ceil(total.toDouble / pageSize).toInt
  }

  private def convert(node: JsonNode, f: StructField): Any = {
    val v = node.get(f.name)
    if (v == null || v.isNull) null
    else f.dataType match {
      case IntegerType => v.asInt
      case LongType => v.asLong
      case DoubleType => v.asDouble
      case FloatType => v.asDouble.toFloat
      case BooleanType => v.asBoolean
      case DateType => java.sql.Date.valueOf(v.asText)
      case TimestampType => parseTimestamp(v.asText)
      case _ => v.asText
    }
  }

  /** REST exports speak several timestamp dialects — ISO-8601 with
    * 'Z'/offset, 'T' or space separators, second-or-minute precision;
    * `Timestamp.valueOf` accepts exactly one of them and a single
    * unparseable row would fail the whole (deterministically retried)
    * scan. Try the common forms, normalizing offsets to UTC. */
  private def parseTimestamp(raw: String): java.sql.Timestamp = {
    val s = raw.trim
    def viaInstant: Option[java.sql.Timestamp] =
      try Some(java.sql.Timestamp.from(java.time.Instant.parse(s)))
      catch { case _: java.time.format.DateTimeParseException => None }
    def viaOffset: Option[java.sql.Timestamp] =
      try Some(java.sql.Timestamp.from(
        java.time.OffsetDateTime.parse(s).toInstant))
      catch { case _: java.time.format.DateTimeParseException => None }
    def viaLocal: Option[java.sql.Timestamp] = {
      val t = s.replace("T", " ")
      val padded = if (t.length == 16) s"$t:00" else t // minute precision
      try Some(java.sql.Timestamp.valueOf(padded))
      catch { case _: IllegalArgumentException => None }
    }
    viaInstant.orElse(viaOffset).orElse(viaLocal).getOrElse(
      throw new IllegalArgumentException(
        s"HttpRestPages: unparseable timestamp '$raw'"))
  }

  override def fetchPage(i: Int): Seq[Row] = {
    val env = mapper.readTree(request(pageUri(i)))
    val arr = Option(at(env, rowsField)).getOrElse(
      throw new IllegalArgumentException(
        s"HttpRestPages: envelope has no '$rowsField' array"))
    arr.elements().asScala.map { rec =>
      Row.fromSeq(schema.fields.toSeq.map(f => convert(rec, f)))
    }.toSeq
  }
}
