package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Action sinks (SURVEY §2.1 S11-S13): the reference mutates the filesystem
  * (delete / move / swap, comparison.cpp:388-476); a data engine NEVER
  * mutates its input — instead it emits an `actions` table that downstream
  * tooling applies:
  *
  *   (url, cluster_id, action, rank_in_cluster, reclaim_bytes)
  *
  * with action = 'keep' for the elected keeper and 'drop' for the rest —
  * the batch rendering of the reference's per-pair delete decision, where
  * "smaller of two matching videos is likely the one to be deleted"
  * (comparison.cpp:38). `move`/`swap` become metadata remaps in the same
  * table shape (target column) and are left to the applier.
  */
object Actions {

  /** Derive drop/keep actions from the clustered output (clusters must carry
    * is_keeper, size). */
  def fromClusters(clusters: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("size").desc, col("text_len").desc, col("warc_ts").asc, col("url").asc)
    clusters
      .withColumn("rank_in_cluster", row_number().over(w).cast("long"))
      .withColumn("action", when(col("is_keeper"), lit("keep")).otherwise(lit("drop")))
      .withColumn("reclaim_bytes", when(col("is_keeper"), lit(0L)).otherwise(col("size")))
      .select("url", "cluster_id", "action", "rank_in_cluster", "reclaim_bytes")
  }

  /** Run summary over actions (the deleted-files running total, A3:
    * comparison.cpp:407-408 accumulators as a groupBy). */
  def summary(actions: DataFrame): DataFrame =
    actions.groupBy("action")
      .agg(count(lit(1)).as("n"), sum("reclaim_bytes").cast("long").as("bytes"))
      .orderBy("action")
}
