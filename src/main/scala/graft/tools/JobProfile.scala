package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.core.GraftConfig
import graft.data.CorpusSpark
import graft.spark.Pipeline

/** Per-JOB wall profile of a Bench-style e2e rep (a tuning aid, not a driver
  * surface): registers a listener that records every Spark job's duration and
  * call site, runs the NON-profiled pipeline exactly like one Bench e2e rep
  * (pages persist+count, Pipeline.run, metrics collect), and prints the jobs
  * sorted by duration. Reps > 1 repeats in one JVM so the steady-state rep is
  * visible past codegen/JIT warmup. Usage:
  *   runMain graft.tools.JobProfile [nDocs] [reps]  (SPARK_GRAFT_CPUS=cores) */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-jobprofile")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    // (jobId, startMs, endMs, label)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val stages = js.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n').take(48)}(${si.numTasks}t)")
          .mkString("|")
        starts.put(js.jobId, (js.time, stages.take(140)))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, label) = starts.getOrDefault(je.jobId, (je.time, "?"))
        rows.add((je.jobId, t0, je.time, label))
      }
    })

    val cfg = GraftConfig()
    var rep = 1
    while (rep <= reps) {
      spark.sharedState.cacheManager.clearCache()
      rows.clear()
      val wall0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      val pages = CorpusSpark.pages(spark, n, parts = cores * 8, seed = 42L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pages.count()
      val res = Pipeline.run(pages, cfg)
      val m = res.metrics.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain before reading
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(_._2)
      // uncovered wall = driver-side gaps where NO job was running (planning,
      // analysis, collect post-processing)
      var covered = 0L
      var cursor = wall0
      all.sortBy(_._2).foreach { case (_, s, e, _) =>
        val s2 = math.max(s, cursor)
        if (e > s2) { covered += e - s2; cursor = e } else cursor = math.max(cursor, e)
      }
      val wallMs = (wall * 1000).toLong
      println(f"[jobs rep $rep] wall=$wall%.1f s matched=${m.getOrElse("matched_pairs", -1L)} " +
        f"jobs=${all.size} covered=${covered / 1e3}%.1f s driver_gaps=${(wallMs - covered) / 1e3}%.1f s")
      all.foreach { case (id, s, e, label) =>
        println(f"[jobs rep $rep]   job $id%3d  +${(s - wall0) / 1e3}%6.1f -> +${(e - wall0) / 1e3}%6.1f  (${(e - s) / 1e3}%6.2f s)  $label")
      }
      pages.unpersist(false)
      System.gc()
      rep += 1
    }
    spark.stop()
  }
}
