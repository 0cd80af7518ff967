package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKByGroupSpec extends SparkSpec {

  test("bounded-heap grouped top-k matches the window formulation, ties broken by key") {
    import spark.implicits._
    // hot group "A" (1000 rows incl. duplicated measures), tiny group "B",
    // singleton "C" — exercises reduce's reject branch, cross-partition
    // merge, and deterministic tiebreaks on equal measures
    val rows =
      (1 to 1000).map(i => ("A", (i % 10).toDouble, i.toLong)) ++
      Seq(("B", 5.0, 1L), ("B", 5.0, 2L), ("B", 7.0, 3L)) ++
      Seq(("C", 1.0, 9L))
    val df = rows.toDF("o_orderpriority", "o_totalprice", "o_orderkey")
      .repartition(7)

    val got = TopKByGroup.topOrdersByPriority(df, k = 3)
      .as[(String, Int, Long, Double)].collect().toSeq

    val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
        .map { case ((_, m, id), i) => (g, i + 1, id, m) }
    }.sortBy(r => (r._1, r._2))
    assert(got === expected)
  }

  test("plan has no rank window and no full-width sort before aggregation") {
    val df = TopKByGroup.topOrdersByPriority(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet"), k = 3)
    df.collect()
    // unwrap AQE: toString on the adaptive root prints the initial plan
    // too, double-counting nodes
    val s = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    // the whole point: partial heap buffers, not a per-group row_number
    assert(!s.contains("Window"), s"rank window crept back in:\n$s")
    // the only sort allowed is the final |groups|*k-row presentation sort
    val sorts = "Sort ".r.findAllIn(s).length
    assert(sorts <= 1, s"expected at most the bounded output sort, got $sorts:\n$s")
  }
}
