package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.data.{Corpus, PageRow}
import graft.spark.SparkTest
import graft.store.IcebergShaped

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val cfg = GraftConfig()

  private def pagesBatch(from: Long, until: Long): Seq[PageRow] =
    (from until until).map(i => Corpus.page(i, cfg.seed))

  test("streaming ingest: micro-batches land as snapshots; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val store = IcebergShaped.table(Files.createTempDirectory("graft-stream").toString)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    val source = MemoryStream[PageRow]
    source.addData(pagesBatch(0, 100))
    val q1 = StreamingIngest.ingestToStore(source.toDF(), store, cfg, ckpt)
    q1.awaitTermination()
    val afterFirst = store.currentSnapshot.get.totalRows
    assert(afterFirst > 0)

    // second batch: overlapping range — only the new rows are fingerprinted
    source.addData(pagesBatch(50, 200))
    val q2 = StreamingIngest.ingestToStore(source.toDF(), store, cfg, ckpt)
    q2.awaitTermination()
    val sigs = store.read(spark)
    // the RAW store holds one row per distinct exact url — case-variant
    // twins included (the commit path applies rule 1 only; the live view
    // elects the case winner at read time)
    val urls = sigs.select("url").as[String].collect().toSet
    assert(urls === (0L until 200L).map(Corpus.urlOf).toSet)
    assert(sigs.groupBy("url").count().filter(col("count") > 1).count() === 0,
      "replayed rows must not duplicate")
    // and the LIVE view equals the one-shot F1 universe
    val expected = graft.tools.OracleTruth.compute(200, cfg)
    val live = graft.spark.Resume.incrementalFingerprints(
      source.toDF().sparkSession.emptyDataset[PageRow].toDF(), store, cfg).signatures
    assert(live.select("url").as[String].collect().toSet ===
      (expected.validUrls.toSet ++ expected.rejectedUrls.toSet))
  }

  test("stateless streaming fingerprint plan is streaming-compatible") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[PageRow]
    source.addData(pagesBatch(0, 20))
    val sink = StreamingIngest.fingerprintStream(source.toDF(), cfg)
      .writeStream.format("memory").queryName("fp_stream")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sink.awaitTermination()
    val out = spark.table("fp_stream")
    assert(out.count() === 20)
    assert(out.filter(col("simhash_head").isNotNull).count() > 0)
  }

  test("watermarked hourly arrivals aggregate by event time") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[PageRow]
    source.addData(pagesBatch(0, 200)) // warc_ts spread 137s apart -> ~8 hours
    val sink = StreamingIngest.hourlyArrivals(source.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sink.awaitTermination()
    val rows = spark.table("hourly")
    assert(rows.count() > 3) // several hour windows
    assert(rows.agg(sum("n_pages")).head().getLong(0) === 200L)
  }
}
