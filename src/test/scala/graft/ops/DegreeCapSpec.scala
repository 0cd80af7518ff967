package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the hub-cap contract `graph_jaccard_neighbors` relies on:
  * EXACT below the cap (every sub-cap mid survives), hubs above the
  * p99.9 degree order statistic dropped, and the integer rank
  * arithmetic (⌈999n/1000⌉ with no floats) at its boundaries.
  */
class DegreeCapSpec extends SparkSpec {
  import spark.implicits._

  test("hub above the p99.9 order statistic is dropped; sub-cap mids kept") {
    // 1500 mids of degree 1 + one degree-50 hub: n = 1501,
    // rank threshold = ceil(999 * 1501 / 1000) = 1500, cum(deg=1) = 1500
    // => cap = 1, hub excluded, all 1500 degree-1 mids exact.
    val thin = (1 to 1500).map(i => (s"m$i", s"o$i"))
    val hub = (1 to 50).map(i => ("hub", s"h$i"))
    val e = (thin ++ hub).toDF("mid", "other")
    val kept = DegreeCap.keptMids(e, "mid").as[String].collect().toSet
    assert(kept.size === 1500)
    assert(!kept.contains("hub"))
    assert(kept.contains("m1") && kept.contains("m1500"))
  }

  test("small graphs (rank threshold = n) keep every mid including the max") {
    // n = 401 < 1000: ceil(999 * 401 / 1000) = 401 = n, so the cap is
    // the MAX degree — nothing is dropped until the graph is large
    // enough for p99.9 to sit below the top.
    val thin = (1 to 400).map(i => (s"m$i", s"o$i"))
    val hub = (1 to 50).map(i => ("hub", s"h$i"))
    val e = (thin ++ hub).toDF("mid", "other")
    val kept = DegreeCap.keptMids(e, "mid").as[String].collect().toSet
    assert(kept.size === 401)
    assert(kept.contains("hub"))
  }

  test("cap lands between degree tiers, not inside one") {
    // 2000 mids deg 1, 3 mids deg 7, 1 mid deg 40: n = 2004,
    // threshold = ceil(999 * 2004 / 1000) = 2002; cum: deg1 -> 2000,
    // deg7 -> 2003 >= 2002 => cap = 7: the deg-7 tier survives WHOLE
    // (order statistics never split a tie group), only the 40-hub goes.
    val d1 = (1 to 2000).map(i => (s"a$i", s"x$i"))
    val d7 = for (m <- 1 to 3; i <- 1 to 7) yield (s"b$m", s"y$m-$i")
    val d40 = (1 to 40).map(i => ("hub", s"z$i"))
    val e = (d1 ++ d7 ++ d40).toDF("mid", "other")
    val kept = DegreeCap.keptMids(e, "mid").as[String].collect().toSet
    assert(kept.size === 2003)
    assert(Set("b1", "b2", "b3").subsetOf(kept))
    assert(!kept.contains("hub"))
  }
}
