package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Row

/** Flaky synthetic page client: every page throws twice before
  * succeeding — exercises the DSv2 source's retry/backoff envelope
  * (the transient-failure shape of a rate-limited REDCap/NocoDB API).
  * State is JVM-global because clients are instantiated per task. */
class FlakyRestPages extends RestPages {
  private val inner = new SyntheticRestPages
  override def schema = inner.schema
  override def pageCount = inner.pageCount
  override def fetchPage(i: Int): Seq[Row] = {
    val n = FlakyRestPages.attempts
      .computeIfAbsent(i, _ => new AtomicInteger).incrementAndGet()
    if (n <= 2) {
      FlakyRestPages.totalFailures.incrementAndGet()
      throw new RuntimeException(s"transient 503 on page $i, attempt $n")
    }
    inner.fetchPage(i)
  }
}

object FlakyRestPages {
  val attempts = new ConcurrentHashMap[Int, AtomicInteger]()
  val totalFailures = new AtomicInteger(0)
  def reset(): Unit = { attempts.clear(); totalFailures.set(0) }
}

/** Permanent-failure client: the retry budget must exhaust and the
  * task must fail loudly (a 4xx auth/shape error, not a transient). */
class AlwaysFailingRestPages extends RestPages {
  private val inner = new SyntheticRestPages
  override def schema = inner.schema
  override def pageCount = inner.pageCount
  override def fetchPage(i: Int): Seq[Row] =
    throw new RuntimeException(s"permanent 401 on page $i")
}
