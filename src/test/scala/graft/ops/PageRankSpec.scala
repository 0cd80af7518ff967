package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Double] =
    PageRank.ranks(edges.toDF("a", "b"), "a", "b", iters)
      .as[(Long, Double)].collect().toMap

  test("star graph: hand-computed one-iteration ranks") {
    // undirected star 0—{1,2,3}: N=4, deg(0)=3, deg(leaf)=1
    // p1(0) = 0.15/4 + 0.85·(3·(1/4)/1) = 0.675
    // p1(leaf) = 0.15/4 + 0.85·((1/4)/3) ≈ 0.108333
    val m = ranksOf(Seq((0L, 1L), (0L, 2L), (0L, 3L)), iters = 1)
    assert(math.abs(m(0L) - 0.675) < 1e-12, m.toString)
    assert(math.abs(m(1L) - (0.0375 + 0.85 * 0.25 / 3)) < 1e-12, m.toString)
    assert(m(1L) == m(2L) && m(2L) == m(3L))
  }

  test("rank mass is conserved and the hub dominates after 3 iterations") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (3L, 4L), (5L, 6L))
    val m = ranksOf(edges)
    assert(math.abs(m.values.sum - 1.0) < 1e-9, s"mass ${m.values.sum}")
    val hub = m.maxBy(_._2)._1
    assert(hub == 0L, s"hub should dominate: $m")
  }

  test("deterministic across invocations") {
    val edges = (0L until 30L).map(i => (i, (i * 7 + 3) % 30))
    assert(ranksOf(edges) == ranksOf(edges))
  }
}
