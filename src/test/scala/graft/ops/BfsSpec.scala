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
}
