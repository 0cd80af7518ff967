package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-structure semantics for the LPA community operator — the
  * registered query's oracle proves cross-engine agreement on real data;
  * this pins WHAT the algorithm does on graphs with known ground truth,
  * driving the production [[GraphQueries.lpa]] iteration directly.
  */
class GraphQueriesSpec extends SparkSpec {

  private def lpa2(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val sym = edges.toDF("u", "v")
      .unionByName(edges.map(_.swap).toDF("u", "v"))
      .localCheckpoint()
    GraphQueries.lpa(sym, iters = 2).as[(Long, Long)].collect().toMap
  }

  test("two planted cliques joined by one bridge edge resolve to two communities") {
    // cliques {0..4} and {10..14}, bridge 4-10: within two iterations
    // every clique member must carry its clique's min label, and the
    // bridge must not merge them (each endpoint sees 4 intra-clique
    // neighbors vs 1 bridge neighbor — the mode argmax keeps it home)
    val k5a = for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)
    val k5b = for (i <- 10L to 14L; j <- i + 1 to 14L) yield (i, j)
    val got = lpa2(k5a ++ k5b :+ (4L, 10L))
    assert((0L to 4L).forall(got(_) == 0L),
      s"clique A labels: ${(0L to 4L).map(got)}")
    assert((10L to 14L).forall(got(_) == 10L),
      s"clique B labels: ${(10L to 14L).map(got)}")
  }

  test("tiebreak is deterministic: a 2-node community takes the smaller label") {
    val got = lpa2(Seq((7L, 3L)))
    // iteration 1 swaps the two self-labels; iteration 2 swaps them
    // back — each node's single neighbor is the sole mode either way.
    // What matters is determinism, not convergence on a 2-cycle.
    assert(got === Map(3L -> 3L, 7L -> 7L))
  }
}
