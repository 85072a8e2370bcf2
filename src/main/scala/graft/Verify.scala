package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Fixture smoke gate: fail with ONE diagnostic naming table/column/type
    // if the driver regenerated testdata incompatibly (r7: a ts re-encoding
    // surfaced as 30 opaque per-query errors — never again)
    Tables.validate(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Release per-query state: clearCache drops any persisted frames;
      // localCheckpoint blocks (the iterative/greedy queries) are
      // MEMORY_AND_DISK and released by the ContextCleaner once the
      // query frame is GC'd — disk-backed, so they bound memory, not disk
      spark.catalog.clearCache()
    }
    writeOracleJson(outDir, SparkEntry.oracleSql)
    spark.stop()
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    * ONE definition, shared with the dev-side VerifyOne, so an escaping
    * fix can't apply to one tool and not the other. */
  def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def writeOracleJson(outDir: String, oracles: Map[String, String]): Unit = {
    val json = oracles
      .map { case (k, v) => s"${jsonString(k)}: ${jsonString(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    ()
  }
}
