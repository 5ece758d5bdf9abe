package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed corpus synthesis: `Corpus.page` is a pure function of the row
  * index, so generation is a narrow map over `spark.range` — no driver
  * materialization, any scale. */
object CorpusSpark {
  def pages(spark: SparkSession, n: Long, parts: Int = 32, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, parts)
      .mapPartitions(_.map(i => Corpus.page(i, seed)))
      .toDF()
  }
}
