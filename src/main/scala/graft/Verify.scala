package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // default to the machine width: the round-5 query surface (56 oracles,
    // six mode pipelines, the incremental chain) is ~2× round 4's — at the
    // old 4-core default the dump wall time, not the engine, becomes the
    // correctness gate's bottleneck
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // DedupOps' internal persists are per-invocation (no cross-query
      // reuse — unlike SparkEntry's deliberate pipelineCache), so release
      // them after each materialized write: the ~57-query loop would
      // otherwise hold every operator's fingerprint/n-gram caches at once
      graft.ops.DedupOps.cleanupCaches()
    }
    // aux inputs for the DuckDB oracles of non-SQL operators (the '{AUX}'
    // placeholder in oracleSql resolves to this absolute dir)
    // hidden dir: the aux export is oracle INPUT, not a query result — a
    // visible sibling shows up in the driver's per-query report as a
    // permanent no_oracle row ({AUX} is substituted as an absolute path, so
    // the oracles themselves are unaffected)
    val auxDir = Paths.get(outDir).toAbsolutePath.resolve(".aux").toString
    try SparkEntry.auxExport(spark, sfDir, auxDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] aux export failed: ${e.getMessage}")
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
    graft.ops.DedupOps.cleanupCaches()
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{AUX}", auxDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
