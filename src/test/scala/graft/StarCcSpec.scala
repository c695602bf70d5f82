package graft

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Alternating large-star/small-star connected components vs the
  * min-label propagation loop: identical clusters on bounded-diameter
  * graphs (the LSH dup-graph shape), and O(log n) alternations where
  * propagation's O(diameter) rounds would blow its round guard. */
class StarCcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(pairs: DataFrame): Set[(Long, Long, Boolean)] =
    TextOps.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
  private def star(pairs: DataFrame): Set[(Long, Long, Boolean)] =
    TextOps.connectedComponentsStar(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  test("random graph: star components identical to label propagation") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val pairs = edges.toDF("a", "b")
    assert(star(pairs) == cc(pairs))
  }

  test("union of cliques (the LSH bucket shape): identical output") {
    // 5 cliques of 6 nodes each, ids interleaved so cluster != position
    val edges = for {
      c <- 0 until 5; i <- 0 until 6; j <- (i + 1) until 6
    } yield ((i * 5 + c).toLong, (j * 5 + c).toLong)
    val pairs = edges.toDF("a", "b")
    assert(star(pairs) == cc(pairs))
  }

  test("long path: converges in O(log n) alternations, not O(diameter)") {
    // a 301-node chain (diameter 300): min-label propagation would need
    // ~300 rounds — past its 64-round guard — while the alternating-star
    // loop collapses it exponentially
    val pairs = (0L until 300L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = TextOps.connectedComponentsStarRounds(pairs)
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 301)
    assert(out.forall { case (id, lbl, keep) => lbl == 0L && keep == (id == 0L) })
    assert(rounds <= 16, s"expected logarithmic convergence, took $rounds alternations")
  }

  test("two components + a folded singleton pair keep their own roots") {
    val pairs = Seq((10L, 11L), (11L, 12L), (50L, 51L), (7L, 7L)).toDF("a", "b")
    // (7,7) is a self-pair: its node must still appear, as its own root
    val s = star(pairs)
    assert(s == Set(
      (7L, 7L, true),
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (50L, 50L, true), (51L, 50L, false)))
  }

  test("empty pair set yields an empty labeling") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(star(pairs).isEmpty)
  }
}
