package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.GraftConfig
import graft.data.CorpusSpark
import graft.spark.Pipeline

/** Wall-clock phase profile of the scoped-increment chain (the shape behind
  * q_incremental_clusters, the slowest sweep entry at ~50 s regardless of
  * corpus size — i.e. fixed overhead, not data): base run on 80% of the
  * corpus, one increment to 100%, final clusters materialized. Prints one
  * `[incrprof]` line per phase so the fixed cost can be attributed to a
  * stage (store commit, pair stage, checkpointed union-find, splice) rather
  * than guessed. Usage: runMain graft.tools.IncrementalProfile [nDocs]. */
object IncrementalProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job-level attribution: record every job's wall + call site, so a
    // phase's fixed cost decomposes into (#jobs x scheduling latency) vs a
    // few genuinely slow jobs
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, Double)]())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val site = p.flatMap(x => Option(x.getProperty("spark.job.description")))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (site, t0) =>
          done.add((site, (System.nanoTime() - t0) / 1e9))
        }
      }
    })
    // stage-level attribution: task-time per stage NAME (the operator call
    // site), so a hot phase decomposes into its actual operators
    val stages = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, Double, Int)]())
    val stageDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("?")
        js.stageIds.foreach(sid => stageDesc.put(sid, desc))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        // AQE runs stages from its own thread pool with CompletableFuture
        // call sites — attribute through the owning job's description, with
        // the raw operator name appended for non-AQE stages
        val desc = Option(stageDesc.get(si.stageId)).getOrElse("?")
        val op = if (si.name.contains("CompletableFuture")) "[aqe]" else si.name
        stages.add((f"$desc%-34s $op",
          si.taskMetrics.executorRunTime / 1e3, si.numTasks))
      }
    })

    def phase[T](name: String)(f: => T): T = {
      done.clear()
      stages.clear()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val snap = {
        import scala.jdk.CollectionConverters._
        done.asScala.toList
      }
      val stageSnap = {
        import scala.jdk.CollectionConverters._
        stages.asScala.toList
      }
      val bySite = snap.groupBy(_._1).view
        .mapValues(v => (v.size, v.map(_._2).sum)).toList.sortBy(-_._2._2)
      println(f"[incrprof] $name%-28s $wall%7.2f s  (${snap.size} jobs, " +
        f"${snap.map(_._2).sum}%.2f s inside jobs)")
      bySite.take(8).foreach { case (site, (cnt, sum)) =>
        println(f"[incrprof]    $sum%6.2f s  x$cnt%-3d $site")
      }
      val byStage = stageSnap.groupBy(_._1).view
        .mapValues(v => (v.size, v.map(_._2).sum, v.map(_._3).sum))
        .toList.sortBy(-_._2._2)
      byStage.takeWhile(_._2._2 > 0.5).take(12).foreach {
        case (nm, (cnt, sum, tasks)) =>
          println(f"[incrstage]   $sum%7.2f task-s  x$cnt%-3d ($tasks%4d tasks) $nm")
      }
      r
    }

    val cfg = GraftConfig()
    val store = graft.store.IcebergShaped.table(
      java.nio.file.Files.createTempDirectory("graft-incrprof-store").toString)
    val base = CorpusSpark.pages(spark, n * 4 / 5, 16, cfg.seed)
    val full = CorpusSpark.pages(spark, n, 16, cfg.seed)

    // JIT/codegen warmup: a plain one-shot run first, so the phase times
    // below measure the incremental chain's structure, not a cold JVM
    phase("warmup one-shot Pipeline.run") {
      val r = Pipeline.run(base, cfg)
      r.metrics.collect()
      spark.sharedState.cacheManager.clearCache()
    }

    val (r1, _, st1) = phase("increment1 (base 80%)") {
      Pipeline.runIncrementalScoped(base, store, None, cfg)
    }
    phase("increment1 clusters count") { r1.clusters.count() }
    val (r2, inc2, _) = phase("increment2 (full)") {
      Pipeline.runIncrementalScoped(full, store, Some(st1), cfg)
    }
    require(inc2.skipped > 0L, "increment must resume from the store")
    phase("increment2 clusters count") { r2.clusters.count() }
    phase("orderBy+collect (verify shape)") {
      r2.clusters.select("url", "cluster_id", "is_keeper").orderBy("url").count()
    }
    spark.stop()
  }
}
