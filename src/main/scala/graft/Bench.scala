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
      // 2x cores: a single straggler task then idles half a core's worth of
      // time, not a whole wave; AQE coalescing keeps small stages cheap
      .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
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
    // cache + materialize the synthetic input once (counted inside the
    // timing): the pipeline consumes `pages` twice (case-dedup ranking +
    // anti-join probe), and unlike a parquet scan the synthesis map cannot
    // column-prune — uncached it would render every page twice, and AQE's
    // concurrent query stages would race on the unpopulated cache.
    // parts = 8x cores: the planted duplicate families make per-index cost
    // uneven, and small tasks let the scheduler even out stragglers.
    val pages = CorpusSpark.pages(spark, e2eN, parts = cpus.toInt * 8, seed = 42L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pages.count()
    val res = Pipeline.run(pages, GraftConfig(),
      profile = sys.env.get("SPARK_GRAFT_PROFILE").contains("1"))
    // Result is fully materialized by Pipeline.run's metric aggregates
    val allMetrics = res.metrics.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val matched = allMetrics.getOrElse("matched_pairs", 0L)
    allMetrics.toSeq.sortBy(_._1)
      .foreach { case (k, v) => System.err.println(s"[bench] $k=$v") }
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
