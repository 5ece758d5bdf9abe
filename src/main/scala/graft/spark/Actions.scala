package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Action sinks (SURVEY §2.1 S11-S13): the reference mutates the filesystem
  * (delete / move / swap, comparison.cpp:388-476); a data engine NEVER
  * mutates its input — instead it emits an `actions` table that downstream
  * tooling applies:
  *
  *   (url, cluster_id, action, target, rank_in_cluster, reclaim_bytes)
  *
  * with action = 'keep' for the elected keeper and 'drop' for the rest —
  * the batch rendering of the reference's per-pair delete decision, where
  * "smaller of two matching videos is likely the one to be deleted"
  * (comparison.cpp:38). `move` (S12, comparison.cpp:416-439) and `swap`
  * (S13, comparison.cpp:441-476) are metadata remaps in the same table
  * shape: `target` carries the destination (move) or the exchanged identity
  * (swap); it is null for keep/drop.
  */
object Actions {

  /** Derive drop/keep actions from the clustered output (clusters must carry
    * is_keeper, size). */
  def fromClusters(clusters: DataFrame): DataFrame = {
    // rank window shares Clusters.keeperOrdering so action='keep' <=>
    // rank_in_cluster=1 can never drift apart
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(Clusters.keeperOrdering: _*)
    clusters
      .withColumn("rank_in_cluster", row_number().over(w).cast("long"))
      .withColumn("action", when(col("is_keeper"), lit("keep")).otherwise(lit("drop")))
      .withColumn("target", lit(null).cast("string"))
      .withColumn("reclaim_bytes", when(col("is_keeper"), lit(0L)).otherwise(col("size")))
      .select("url", "cluster_id", "action", "target", "rank_in_cluster", "reclaim_bytes")
  }

  /** S12 move sink (reference: comparison.cpp:416-439 renames the file into a
    * chosen folder): non-keeper rows become `move` actions with
    * target = targetRoot/<url> — the applier performs the remap; the engine
    * never mutates its input. */
  def moveDrops(clusters: DataFrame, targetRoot: String): DataFrame = {
    val root = targetRoot.stripSuffix("/")
    fromClusters(clusters)
      .withColumn("action",
        when(col("action") === "drop", lit("move")).otherwise(col("action")))
      .withColumn("target",
        when(col("action") === "move", concat(lit(root + "/"), col("url")))
          .otherwise(lit(null).cast("string")))
  }

  /** S13 swap sink (reference: comparison.cpp:441-476 exchanges the two
    * filenames via a 3-step rename and invalidates both cache rows): each
    * input pair (url_a, url_b) yields two `swap` rows whose target is the
    * counterpart identity. Cache invalidation is the applier's
    * store.delete(content_id in ...) — identities change, so both rows'
    * signatures are stale (the reference does exactly this, db.cpp:99-117). */
  def swapPairs(pairs: DataFrame): DataFrame =
    pairs.select(col("url_a").as("url"), col("url_b").as("target"))
      .unionByName(pairs.select(col("url_b").as("url"), col("url_a").as("target")))
      .withColumn("action", lit("swap"))
      // full 6-column actions-table shape (the object scaladoc's contract):
      // swap rows union with fromClusters/moveDrops output and flow through
      // summary() — a swap reclaims no bytes and has no cluster rank
      .withColumn("cluster_id", lit(null).cast("string"))
      .withColumn("rank_in_cluster", lit(null).cast("long"))
      .withColumn("reclaim_bytes", lit(0L))
      .select("url", "cluster_id", "action", "target", "rank_in_cluster", "reclaim_bytes")

  /** Run summary over actions (the deleted-files running total, A3:
    * comparison.cpp:407-408 accumulators as a groupBy). */
  def summary(actions: DataFrame): DataFrame =
    actions.groupBy("action")
      .agg(count(lit(1)).as("n"), sum("reclaim_bytes").cast("long").as("bytes"))
      .orderBy("action")
}
