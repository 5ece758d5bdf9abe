package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft.core.GraftConfig
import graft.data.CorpusSpark
import graft.spark.Pipeline

/** Round-6 optimization measurement harness (guide §1.4/§1.5) — NOT part of
  * the frozen driver contract (Bench.scala is untouched). Modes:
  *
  *   job-trace [n]     run the e2e pipeline once at n docs (default 60000)
  *                     with a job listener printing every Spark job's wall
  *                     time, so phase cost attributes to actual jobs.
  *   sub-trace [n]     same for the substringPass pipeline (default 8000).
  *   incr-trace [n]    same for the incremental store path (default 20000).
  *   query <name>      run one SparkEntry query with the job trace +
  *                     .explain("formatted") to stderr.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
      val d = java.nio.file.Paths.get("/dev/shm/graft-spark")
      try { java.nio.file.Files.createDirectories(d); d.toString }
      catch { case _: Throwable => System.getProperty("java.io.tmpdir") }
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // job trace: (jobId -> start ns, description) printed at end
    val progT0 = System.nanoTime()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = for { a <- si.completionTime; b <- si.submissionTime } yield a - b
        lines.add(f"stage ${si.stageId}%4d  ${ms.getOrElse(-1L)}%7d ms  " +
          f"tasks=${si.numTasks}%4d  ${si.name.take(110)}")
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(e.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, desc) =>
          val now = System.nanoTime()
          val ms = (now - t0) / 1000000L
          val s0 = (t0 - progT0) / 1000000L
          val s1 = (now - progT0) / 1000000L
          lines.add(f"job ${e.jobId}%4d  $ms%7d ms  [$s0%6d..$s1%6d]  $desc")
        }
      }
    })

    val mode = args.headOption.getOrElse("job-trace")
    val t0 = System.nanoTime()
    mode match {
      case "job-trace" =>
        val n = args.lift(1).map(_.toLong).getOrElse(60000L)
        val pages = CorpusSpark.pages(spark, n, parts = cpus.toInt * 8, seed = 42L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        spark.sparkContext.setJobDescription("corpus materialize")
        pages.count()
        spark.sparkContext.setJobDescription("pipeline")
        val res = Pipeline.run(pages, GraftConfig())
        spark.sparkContext.setJobDescription("metrics collect")
        res.metrics.collect().foreach(r => System.err.println(s"[extra] ${r.getString(0)}=${r.getLong(1)}"))
      case "sub-trace" =>
        val n = args.lift(1).map(_.toLong).getOrElse(8000L)
        val cfgSub = GraftConfig(substringPass = true)
        val pages = CorpusSpark.pages(spark, n, 2 * cpus.toInt, 42L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val res = Pipeline.run(pages, cfgSub)
        spark.sparkContext.setJobDescription("clusters count")
        System.err.println(s"[extra] clusters=${res.clusters.count()}")
        spark.sparkContext.setJobDescription("metrics collect")
        res.metrics.collect().foreach(r => System.err.println(s"[extra] ${r.getString(0)}=${r.getLong(1)}"))
      case "exact-trace" =>
        val n = args.lift(1).map(_.toLong).getOrElse(8000L)
        val cfgX = GraftConfig(exactVerify = true)
        val pages = CorpusSpark.pages(spark, n, 2 * cpus.toInt, 42L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val res = Pipeline.run(pages, cfgX)
        spark.sparkContext.setJobDescription("clusters count")
        System.err.println(s"[extra] clusters=${res.clusters.count()}")
        spark.sparkContext.setJobDescription("metrics collect")
        res.metrics.collect().foreach(r => System.err.println(s"[extra] ${r.getString(0)}=${r.getLong(1)}"))
      case "incr-trace" =>
        val n = args.lift(1).map(_.toLong).getOrElse(20000L)
        val store = graft.store.IcebergShaped.table(
          java.nio.file.Files.createTempDirectory("graft-extra-store").toString)
        val cfg = GraftConfig()
        spark.sparkContext.setJobDescription("base increment")
        val base = CorpusSpark.pages(spark, n * 4 / 5, 16, cfg.seed)
        val full = CorpusSpark.pages(spark, n, 16, cfg.seed)
        val (_, _, st1) = Pipeline.runIncrementalScoped(base, store, None, cfg)
        val tBase = (System.nanoTime() - t0) / 1000000L
        System.err.println(s"[extra] base run: $tBase ms")
        spark.sparkContext.setJobDescription("second increment")
        val (r2, inc2, _) = Pipeline.runIncrementalScoped(full, store, Some(st1), cfg)
        System.err.println(s"[extra] skipped=${inc2.skipped}")
        spark.sparkContext.setJobDescription("clusters count")
        System.err.println(s"[extra] clusters=${r2.clusters.count()}")
      case "sigs-plan" =>
        val n = args.lift(1).map(_.toLong).getOrElse(60000L)
        val pages = CorpusSpark.pages(spark, n, parts = cpus.toInt * 8, seed = 42L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pages.count()
        val cfg = GraftConfig()
        val sigs = graft.spark.Fingerprints.pruneForMode(
          graft.spark.Fingerprints.fromPages(cfg.langFilter match {
            case Some(ls) => pages.filter(org.apache.spark.sql.functions.col("lang").isin(ls.toSeq: _*))
            case None => pages
          }, cfg), cfg)
        System.err.println(sigs.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        spark.sparkContext.setJobDescription("sigs count")
        System.err.println(s"[extra] sigs=${sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()}")
      case "query" =>
        val name = args(1)
        val fn = SparkEntry.queries(name)
        val df = fn(spark, sfDir)
        System.err.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        spark.sparkContext.setJobDescription(s"query $name count")
        System.err.println(s"[extra] rows=${df.count()}")
      case other => sys.error(s"unknown mode $other")
    }
    val total = (System.nanoTime() - t0) / 1000000L
    // drain listener (private bus — a short sleep suffices for a tool)
    Thread.sleep(1000)
    val all = lines.toArray(Array.empty[String])
    all.sortBy(l => l.trim.split("\\s+")(1).toInt)
      .foreach(l => System.err.println("[extra] " + l))
    System.err.println("[extra] ---- top by duration ----")
    all.sortBy(l => -l.trim.split("\\s+")(2).toLong).take(15)
      .foreach(l => System.err.println("[extra] " + l))
    System.err.println(f"[extra] TOTAL $total ms (${lines.size} jobs)")
    spark.stop()
  }
}
