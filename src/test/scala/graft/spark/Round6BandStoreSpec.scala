package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.data.CorpusSpark
import graft.store.IcebergShaped

/** Round-6 (r5 VERDICT #1): the band relation is persisted in the store
  * between scoped increments, and a later increment's candidate generation
  * READS it instead of re-exploding the full rep set.
  *
  * The load-bearing pin is the poison test: after increment 1, the committed
  * band rows of ONE old rep are removed from the band table. If increment 2
  * re-derived bands from the rep set (the old behavior), the poisoned url
  * would still band-join with the increment's new near-duplicate and the
  * pair would appear; because banding is store-backed, the pair cannot be
  * proposed. A fresh-explode implementation fails this test.
  */
class Round6BandStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val cfg = GraftConfig()

  private def tmpStore(): IcebergShaped.Table =
    IcebergShaped.table(Files.createTempDirectory("graft-store").toString)

  test("increment 1 commits the rep band relation beside the signature store") {
    val store = tmpStore()
    val base = CorpusSpark.pages(spark, 320L, 4, cfg.seed)
    val (r1, _, st1) = Pipeline.runIncrementalScoped(base, store, None, cfg)

    val bandsTable = IcebergShaped.table(store.root + "/bands")
    assert(!bandsTable.isEmpty, "first generation must commit the band table")
    val stored = bandsTable.read(spark)
      .filter(col("config_fp") === cfg.configFp)
      .select("url", "band_id", "key")
    val expected = Candidates.bandKeysByUrl(st1.reps, cfg)
    assert(stored.count() === expected.count())
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "stored band rows must equal a fresh explode of the rep set")
    assert(r1.clusters.count() > 0)
  }

  test("a second increment reads bands from the store: poisoned rows change " +
    "candidates, proving no full-corpus re-explode") {
    // pick an increment shape where a NEW doc near-dups an OLD rep: rows
    // 0..15 include base 1 and its NearDupSmall variant at row 11 (16k + 11
    // layout) — base goes in increment 1, the variant arrives in increment 2
    val all = CorpusSpark.pages(spark, 32L, 2, cfg.seed)
    val variantUrl = graft.data.Corpus.urlOf(11L) // NearDupSmall of row 1
    val parentUrl = graft.data.Corpus.urlOf(1L)
    val base = all.filter(col("url") =!= variantUrl)

    def runSplit(poison: Boolean): Set[(String, String)] = {
      val store = tmpStore()
      val (_, _, st1) = Pipeline.runIncrementalScoped(base, store, None, cfg)
      if (poison) {
        // remove the PARENT's band rows from the committed relation — a
        // store-backed increment can then never propose (parent, variant)
        val bandsTable = IcebergShaped.table(store.root + "/bands")
        bandsTable.delete(spark, col("url") === parentUrl)
      }
      val (r2, _, _) = Pipeline.runIncrementalScoped(all, store, Some(st1), cfg)
      r2.pairs.filter(col("matched")).select("url_a", "url_b")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    }

    val clean = runSplit(poison = false)
    assert(clean.contains((parentUrl, variantUrl)),
      s"fixture broken: expected ($parentUrl, $variantUrl) to match")

    val poisoned = runSplit(poison = true)
    assert(!poisoned.contains((parentUrl, variantUrl)),
      "with the parent's band rows removed from the store, the pair must not " +
        "be proposed — if this fails, the increment re-exploded the full rep " +
        "set instead of reading the stored band relation")
  }

  test("append-path store maintenance: after increment 2 the table equals a " +
    "fresh explode of the CURRENT rep set") {
    val store = tmpStore()
    val base = CorpusSpark.pages(spark, 320L, 4, cfg.seed)
    val full = CorpusSpark.pages(spark, 480L, 4, cfg.seed)
    val (_, _, st1) = Pipeline.runIncrementalScoped(base, store, None, cfg)
    val (_, _, st2) = Pipeline.runIncrementalScoped(full, store, Some(st1), cfg)

    val stored = IcebergShaped.table(store.root + "/bands").read(spark)
      .filter(col("config_fp") === cfg.configFp)
      .select("url", "band_id", "key")
    val expected = Candidates.bandKeysByUrl(st2.reps, cfg)
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "after the append increment the stored relation must equal the current " +
        "rep set's bands (new reps appended, nothing lost)")
  }
}
