package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.GraftConfig
import graft.data.CorpusSpark
import graft.spark.GraftSession
import graft.store.IcebergShaped
import graft.streaming.StreamingIngest

/** CLI surface for the streaming ingest path: writes the synthetic corpus as
  * parquet micro-batch files, streams them through the fingerprint + resume
  * sink with a file source, and prints store growth per batch plus the
  * watermarked hourly rollup.
  *
  * Usage: sbt "runMain graft.tools.StreamDemo [nDocs] [nBatches]"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1200L)
    val batches = args.lift(1).map(_.toInt).getOrElse(3)
    val cfg = GraftConfig()
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8), "graft-stream-demo")

    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val store = IcebergShaped.table(Files.createTempDirectory("graft-stream-store").toString)
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString

    val schema = CorpusSpark.pages(spark, 1L, 1, cfg.seed).schema
    val per = n / batches
    // each loop iteration drops one micro-batch of files and drains the
    // file-source stream with Trigger.AvailableNow
    for (b <- 0 until batches) {
      val lo = b * per
      val hi = if (b == batches - 1) n else (b + 1) * per
      // batch delta by URL SET difference, not url-suffix arithmetic: a
      // CaseUrlDup row's url embeds its PARENT's doc number, so a numeric
      // filter at a batch boundary would drop that row from every batch
      val batchRows = {
        val upTo = CorpusSpark.pages(spark, hi, 8, cfg.seed)
        if (lo == 0) upTo
        else upTo.join(CorpusSpark.pages(spark, lo, 8, cfg.seed).select("url"),
          Seq("url"), "left_anti")
      }
      batchRows.write.mode("append").parquet(inDir)
      val stream = spark.readStream.schema(schema).parquet(inDir)
      val q = StreamingIngest.ingestToStore(stream, store, cfg, ckpt)
      q.awaitTermination()
      println(s"batch $b: store total=${store.currentSnapshot.map(_.totalRows).getOrElse(0L)} " +
        s"version=${store.currentVersion.getOrElse(-1)}")
    }

    println(s"final snapshots: ${store.currentVersion.get + 1}; rows=${store.currentSnapshot.get.totalRows}")

    // the watermarked hourly rollup the scaladoc promises: drain the same
    // file source through hourlyArrivals into an in-memory sink and print
    val rollup = StreamingIngest.hourlyArrivals(
      spark.readStream.schema(schema).parquet(inDir))
    val rq = rollup.writeStream.outputMode("complete").format("memory")
      .queryName("hourly")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("graft-hr-ckpt").toString)
      .start()
    rq.awaitTermination()
    println("hourly rollup (top 5 windows):")
    spark.table("hourly").orderBy(col("window"), col("lang")).show(5, truncate = false)
    spark.stop()
  }
}
