package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.spark.SparkTest

/** Gates for the IVF ANN path: planted-neighbor recall, bit-deterministic
  * training under repartitioning (the oracle re-trains the quantizer in a
  * separate pass and must land on the identical model), the empty/overfull
  * cell guards, and the no-cartesian plan shape. */
class AnnIvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  /** Same planted fixture as OpsRound2Spec: 200 random 32-dim vectors plus
    * 20 colinear near-dups (ids 1000..1019 scale copies of 0..19). */
  private def embFixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 200).map(_ => Array.fill(32)(rnd.nextGaussian().toFloat))
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      (0 until 20).map(i => ((i + 1000).toLong, base(i).map(x => x * 1.5f)))
    rows.toDF("vec_id", "embedding")
  }

  test("IVF top-1 finds every planted colinear neighbor") {
    import spark.implicits._
    val got = AnnOps.ivfTopK(embFixture, k = 1, nQueries = 20)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0 until 20).foreach { i =>
      assert(got.get(i.toLong).contains((i + 1000).toLong),
        s"query $i -> ${got.get(i.toLong)}")
    }
  }

  test("ivfTrain is bit-deterministic across input partitionings") {
    val emb = embFixture
    val a = AnnOps.ivfTrain(emb, nCells = 8, iters = 3)
    val b = AnnOps.ivfTrain(emb.repartition(7), nCells = 8, iters = 3)
    assert(a.length === b.length)
    a.zip(b).zipWithIndex.foreach { case ((ca, cb), c) =>
      assert(java.util.Arrays.equals(ca, cb), s"centroid $c differs")
    }
    import spark.implicits._
    val asgA = AnnOps.ivfAssign(emb, a).as[(Long, Int)].collect().toSet
    val asgB = AnnOps.ivfAssign(emb.repartition(5), b).as[(Long, Int)].collect().toSet
    assert(asgA === asgB)
  }

  test("nCells larger than the corpus degrades to one centroid per vector") {
    import spark.implicits._
    val tiny = embFixture.filter(col("vec_id") < 10)
    val cents = AnnOps.ivfTrain(tiny, nCells = 64, iters = 2)
    assert(cents.length === 10)
    assert(cents.forall(_.forall(x => !x.isNaN)))
    val r = AnnOps.ivfTopK(tiny, k = 2, nQueries = 3, nCells = 64,
      nProbes = 4, iters = 2)
    assert(r.count() > 0)
  }

  test("ivfTopK plan never goes cartesian (candidates are cell-bounded)") {
    val plan = AnnOps.ivfTopK(embFixture, k = 5, nQueries = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in IVF plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in IVF plan")
  }
}
