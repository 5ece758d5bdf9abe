package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.data.CorpusSpark

/** Physical-plan shape assertions — the properties the scale-out dossier
  * (README) claims must hold are pinned here so a regression in pushdown or
  * join strategy fails CI, not a 100-TB run:
  *  - the S2 lang filter reaches the parquet scan as a pushed filter,
  *  - the scan prunes to the selected columns,
  *  - the heavy-key hub join broadcasts (never sort-merges the heavy group),
  *  - the exact-verify shingle join stays a hash join at pair volume.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def writtenPages(n: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-pages").toString
    CorpusSpark.pages(spark, n, parts = 2, seed = 42L)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("S2 lang filter is pushed to the parquet scan; columns are pruned") {
    val dir = writtenPages(200L)
    val df = spark.read.parquet(dir)
      .filter(col("lang").isin("en", "de"))
      .select("url", "lang")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(lang"), plan.take(2000))
    // pruned read schema: url + lang only — html/text must NOT be read
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("url") && readSchema.contains("lang"), readSchema)
    assert(!readSchema.contains("html") && !readSchema.contains("text"), readSchema)
  }

  test("heavy-key hub join broadcasts; no sort-merge join in the star path") {
    import spark.implicits._
    val n = 600
    val cfg = GraftConfig(heavyBandKeyCap = 50, heavyDetectSampleFrac = -1.0)
    // one giant band group (identical fingerprints) — the adversarial case;
    // fixture shared with HeavyKeyStrategySpec via SparkTest
    val reps = SparkTest.giantBandGroupReps(n, cfg)
    val pairs = Candidates.candidatePairs(reps, cfg)
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the star path must not sort-merge the heavy group on (band_id, key):
    // every heavy-side join (anti/semi routing, hub links) is broadcast, so
    // a SortMergeJoin keyed by band_id would mean the whole group collapsed
    // into per-key sorted tasks — the exact straggler the path exists to kill
    val smjOnBand = plan.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("band_id"))
    assert(!smjOnBand, "heavy path sort-merge-joined on band_id:\n" + plan.take(3000))
  }

  test("delta-mode candidate plan skips the dictionary (no full-corpus " +
      "sort on increments; one-shot keeps the byte-diet ids)") {
    val cfg = GraftConfig()
    val pages = CorpusSpark.pages(spark, 400L, parts = 2, seed = cfg.seed)
    val reps = Fingerprints.fromPages(pages, cfg).toDF()
      .filter(col("reject_reason").isNull)
    val nu = reps.select("url").limit(40)
    // the url->rank dictionary is the only global sort in the candidate
    // layer, and it enters the pairs plan as an RDD scan leaf (ExternalRDD /
    // LogicalRDD — zipWithIndex over the range-shuffled sorted-url RDD), NOT
    // as a Sort node, so the discriminator is the leaf itself: delta mode has
    // none (every increment at 10^12 docs would otherwise pay a full-corpus
    // range shuffle + dictionary join for ids the scoped caller drops), and
    // delta ids are then the urls themselves (string type).
    val delta = Candidates.candidatePairs(reps, cfg, Some(nu))
    def rddLeaves(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l: Any
        case l: org.apache.spark.sql.execution.ExternalRDD[_] => l: Any
      }
    val deltaRddLeaves = rddLeaves(delta)
    assert(deltaRddLeaves.isEmpty,
      s"delta candidate plan carries ${deltaRddLeaves.size} RDD leaves (the " +
        "dictionary sort ran on an increment)")
    assert(delta.schema("id_a").dataType ==
      org.apache.spark.sql.types.StringType)
    // the one-shot plan DOES carry the dictionary leaf and long ids — pin
    // the contrast so this test fails loudly if the encoding moves
    val oneShot = Candidates.candidatePairs(reps, cfg)
    assert(rddLeaves(oneShot).nonEmpty)
    assert(oneShot.schema("id_a").dataType ==
      org.apache.spark.sql.types.LongType)
    Candidates.cleanupCaches()
  }

  test("exact-verify shingle join is a hash join gated to the admitted stratum") {
    // built from the public stage APIs rather than Pipeline.run: the
    // pipeline's Result.pairs is lineage-truncated to a LogicalRDD leaf
    // (downstream()'s eager localCheckpoint), so the verify join's shape is
    // only visible on the pre-checkpoint frame
    val cfg = GraftConfig(exactVerify = true)
    val pages = CorpusSpark.pages(spark, 400L, parts = 2, seed = cfg.seed)
    val sigs = Fingerprints.fromPages(pages, cfg).toDF()
      .filter(col("reject_reason").isNull)
    val pairs = Pairs.exactVerify(
      Pairs.score(Candidates.candidatePairs(sigs, cfg), cfg), sigs, cfg)
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    // the expensive verify join must be a hash join (broadcast or shuffled),
    // never a nested-loop/cartesian product
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
