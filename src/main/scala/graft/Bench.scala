package graft

import org.apache.spark.sql.SparkSession
import graft.core.GraftConfig
import graft.data.CorpusSpark
import graft.spark.Pipeline

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and measures end-to-end dedup throughput (docs/sec) on
  * the synthetic corpus — the BASELINE.json headline metric. Prints exactly
  * one JSON line.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_E2E_N
  * (override corpus size), SPARK_GRAFT_SKIP_QUERIES=1 (scaling runs time the
  * e2e pipeline only).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = {
      val d = java.nio.file.Paths.get("/dev/shm/graft-spark")
      try { java.nio.file.Files.createDirectories(d); d.toString }
      catch { case _: Throwable => System.getProperty("java.io.tmpdir") }
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val skipQueries = sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1")
    val results: Map[String, Double] =
      if (skipQueries) Map.empty
      else SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }

    // headline: end-to-end dedup throughput on the deterministic corpus
    val e2eN: Long = sys.env.get("SPARK_GRAFT_E2E_N").map(_.toLong).getOrElse {
      if (sfDir.contains("0.1")) 60000L
      else if (sfDir.contains("0.01")) 10000L
      else 2000L
    }
    val t0 = System.nanoTime()
    val res = Pipeline.run(
      CorpusSpark.pages(spark, e2eN, parts = cpus.toInt * 2, seed = 42L), GraftConfig())
    // Result is fully materialized by Pipeline.run's metric aggregates
    val matched = res.metrics.collect()
      .collectFirst { case r if r.getString(0) == "matched_pairs" => r.getLong(1) }
      .getOrElse(0L)
    val e2eSec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = e2eN / e2eSec

    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"docs_per_sec_e2e","value":${f"$docsPerSec%.1f"},"unit":"docs/sec",""" +
        s""""e2e_docs":$e2eN,"e2e_sec":${f"$e2eSec%.1f"},"matched_pairs":$matched,""" +
        s""""cpus":$cpus,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
