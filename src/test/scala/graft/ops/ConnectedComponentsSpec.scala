package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component labeled by its minimum") {
    // diameter 3 — forces multiple propagation rounds
    val m = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate minimum labels") {
    val m = comps(Seq((5L, 9L), (20L, 11L), (11L, 13L)))
    assert(m == Map(5L -> 5L, 9L -> 5L, 20L -> 11L, 11L -> 11L, 13L -> 11L))
  }

  test("long path converges within the iteration bound") {
    // path 0-1-2-...-12: worst-case diameter for min propagation
    val edges = (0L until 12L).map(i => (i, i + 1))
    val m = comps(edges)
    assert(m.size == 13 && m.values.forall(_ == 0L))
  }

  test("hitting the iteration cap throws instead of returning wrong labels") {
    import org.apache.spark.sql.functions.col
    // diameter-12 path cannot converge in 3 min-label rounds; truncated
    // labels would split one component into several ids — fail loudly
    val edges = (0L until 12L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      ConnectedComponents.components(edges.toDF("a", "b"), "a", "b",
        maxIter = 3).filter(col("node") >= 0).count()
    }
    intercept[IllegalStateException] {
      ConnectedComponents.componentsStar(edges.toDF("a", "b"), "a", "b",
        maxIter = 1).filter(col("node") >= 0).count()
    }
  }

  test("edge direction is irrelevant (symmetrized internally)") {
    assert(comps(Seq((7L, 3L))) == Map(7L -> 3L, 3L -> 3L))
  }

  test("duplicate and self edges are harmless") {
    val m = comps(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("large-star/small-star variant equals min-label propagation") {
    // deterministic pseudo-random graphs of several shapes: chains
    // (worst case for propagation), stars, cliques, and hash-scrambled
    // sparse graphs — both algorithms must produce identical labelings
    val graphs: Seq[Seq[(Long, Long)]] = Seq(
      (0L until 20L).map(i => (i, i + 1)), // long chain
      (1L until 10L).map(i => (0L, i)), //    star
      (for { i <- 0L until 6L; j <- 0L until 6L if i < j } yield (i, j)), // clique
      (0L until 40L).map(i => ((i * 7919) % 23, (i * 104729) % 23)), // scrambled
      Seq((5L, 5L), (1L, 2L)) //             self-loop + pair
    )
    graphs.zipWithIndex.foreach { case (g, gi) =>
      val viaProp = comps(g)
      val viaStar = ConnectedComponents
        .componentsStar(g.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(viaStar == viaProp, s"graph #$gi: star=$viaStar prop=$viaProp")
    }
  }

  test("cluster stats over LSH-style pairs match transitive closure") {
    // (a,b),(b,c) with no (a,c) edge: pairwise dedup keeps c, cluster
    // dedup must not
    val df = ConnectedComponents
      .components(Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("i", "j"), "i", "j")
      .groupBy(col("comp").as("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("node")).as("s"))
      .as[(Long, Long, Long)].collect().toSet
    assert(df == Set((10L, 3L, 60L), (40L, 2L, 90L)))
  }
}
