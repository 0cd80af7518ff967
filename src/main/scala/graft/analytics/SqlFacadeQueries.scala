package graft.analytics

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.SparkSession

/** SQL-text twins of the TPC-H shapes (r13 verdict item 6): the engine's
  * declared surface is the Column API, but every TPC-H query already
  * carries an ANSI oracle string — running THAT text through `spark.sql`
  * exercises the engine's SQL front end (parser → analyzer → the same
  * Catalyst plan) against the same DuckDB oracle at near-zero marginal
  * code. The tables register as session temp views under their bare
  * names, so the text is byte-identical in both engines except for one
  * mechanical token: DuckDB's integer-division `//` becomes Spark's
  * `div` (same floor-toward-zero semantics on the BIGINT operands these
  * oracles use them with).
  *
  * View registration is idempotent and all twins register identical
  * definitions, so Verify's concurrent query pool can re-register them
  * in any interleaving without affecting a running twin.
  */
object SqlFacadeQueries extends QueryPack {

  private val twins = Seq(
    "q1_pricing_summary" -> "sql_q1",
    "q3_top_revenue_orders" -> "sql_q3",
    "q5_nation_revenue" -> "sql_q5",
    "q6_revenue_forecast" -> "sql_q6",
    "q12_linestatus_priority" -> "sql_q12",
    "q14_promo_revenue_share" -> "sql_q14",
    "q19_bracket_revenue" -> "sql_q19")

  private def registerViews(s: SparkSession, d: String): Unit = {
    Tables.region(s, d).createOrReplaceTempView("region")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
  }

  private def baseOracle(name: String): String =
    Relational.oracles.get(name)
      .orElse(RelationalExt.oracles.get(name))
      .getOrElse(sys.error(s"no oracle SQL registered for twin base $name"))

  def qs: Seq[Q] = twins.map { case (base, name) =>
    val sql = baseOracle(base)
    Q(name,
      (s, d) => { registerViews(s, d); s.sql(sql.replace("//", "div")) },
      Some(sql))
  }
}
