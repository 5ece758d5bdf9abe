package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.GraftConfig
import graft.data.CorpusSpark
import graft.spark.Pipeline

/** Per-phase wall profile of the e2e pipeline (a tuning aid, not a driver
  * surface): runs `Pipeline.run(profile = true)` on the synthetic corpus and
  * prints the phase timings the profiled path collects, so wall time
  * attributes to fingerprint / exact-group / candidates / clustering before
  * any optimization work. Usage: runMain graft.tools.ProfileRun [nDocs] [reps]
  * with SPARK_GRAFT_CPUS to set parallelism. reps > 1 repeats the run inside
  * ONE JVM (cache cleared between reps, like Bench's e2e loop) — rep 1 is
  * codegen/JIT warmup, later reps show the steady state the headline's
  * best-of-k actually measures. */
object ProfileRun {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000L
    val reps = if (args.length > 1) args(1).toInt else 1
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-profile")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = GraftConfig()
    var rep = 1
    while (rep <= reps) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val pages = CorpusSpark.pages(spark, n, parts = cores * 8, seed = cfg.seed)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pages.count()
      val tPages = (System.nanoTime() - t0) / 1000000L
      val res = Pipeline.run(pages, cfg, profile = true)
      res.metrics.collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
        .foreach { case (k, v) => println(s"[profile rep $rep] $k=$v") }
      println(s"[profile rep $rep] phase_pages_ms=$tPages")
      println(f"[profile rep $rep] total_wall_s=${(System.nanoTime() - t0) / 1e9}%.1f")
      pages.unpersist(false)
      System.gc()
      rep += 1
    }
    spark.stop()
  }
}
