package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet // optional dev-side filter; driver passes 2 args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache() // no cross-query cache residue
        // localCheckpoint blocks survive clearCache; ~90 queries of
        // accumulation would force eviction+GC on late queries
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Force each oracle thunk individually: a deferred oracle whose
    // query never ran (dev-side filter, or the query itself failed)
    // must fail ITS row in the DuckDB compare — emit unparseable SQL —
    // not zero the whole round by crashing the dump.
    val json = SparkEntry.allDefs.flatMap { d =>
      if (only.nonEmpty && !only(d.name)) None
      else try d.oracle.map(d.name -> _)
      catch { case e: Throwable =>
        System.err.println(s"[verify] oracle for ${d.name} failed to generate: ${e.getMessage}")
        Some(d.name -> s"ORACLE GENERATION FAILED: ${e.getMessage}")
      }
    }.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // self-explaining oracle-less gates: name -> declared reason
    Files.writeString(Paths.get(s"$outDir/oracle_reasons.json"),
      SparkEntry.oracleReasons
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
