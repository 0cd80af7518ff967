package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-graph semantics for [[Bfs.hops]]: exact hop distances on a
  * path, round bounding, multi-source minimum, and disconnected nodes.
  */
class BfsSpec extends SparkSpec {

  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]) =
    (edges ++ edges.map(_.swap)).toDF("u", "v")

  test("path graph: dist equals hop count, bounded by rounds") {
    // 1-2-3-4-5 path; source 1; rounds 3 → node 5 unreached
    val g = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val out = Bfs.hops(g, Seq(1L).toDF("node"), rounds = 3)
      .select("node", "dist").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("multi-source: distance is the min over sources") {
    // 1-2-3-4-5, sources {1, 5} → 3 is 2 hops from both, 4 is 1 from 5
    val g = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val out = Bfs.hops(g, Seq(1L, 5L).toDF("node"), rounds = 3)
      .select("node", "dist").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("disconnected component stays unreached; cycle gets min dist") {
    // triangle 1-2-3 plus isolated edge 8-9; source 1
    val g = sym(Seq((1L, 2L), (2L, 3L), (3L, 1L), (8L, 9L)))
    val out = Bfs.hops(g, Seq(1L).toDF("node"), rounds = 3)
      .select("node", "dist").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("duplicate source rows yield one (node, 0) state row, not two") {
    val g = sym(Seq((1L, 2L)))
    val out = Bfs.hops(g, Seq(1L, 1L, 1L).toDF("node"), rounds = 1)
      .select("node", "dist").as[(Long, Long)].collect()
    assert(out.length === 2)
    assert(out.toMap === Map(1L -> 0L, 2L -> 1L))
  }

  test("personalized pagerank: mass stays near the seed and sums to 1") {
    // path 1-2-3-4-5, seed {1}: rank decays with distance from the seed
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val r = PageRank.personalizedRanks(edges, "u", "v",
        Seq(1L).toDF("node"), iters = 3)
      .select("node", "r").as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // no dangling leakage
    // random-walk mass on a path OSCILLATES between adjacent levels
    // (bipartite parity), so compare within a parity class: the seed
    // beats its 2-hop neighbor, the 1-hop node beats the 3-hop node
    assert(r(1L) > r(3L) && r(2L) > r(4L))
    // within 3 iterations no mass has reached node 5 (4 hops away)
    assert(!r.contains(5L))
    // disconnected nodes never enter the support
    val g2 = Seq((1L, 2L), (8L, 9L)).toDF("u", "v")
    val r2 = PageRank.personalizedRanks(g2, "u", "v",
        Seq(1L).toDF("node"), iters = 2)
      .select("node", "r").as[(Long, Double)].collect().toMap
    assert(!r2.contains(8L) && !r2.contains(9L))
  }
}
