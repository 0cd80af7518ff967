package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Direct semantics for [[GlobalOrder.ntileBy]] (the oracled queries
  * exercise it end-to-end; this pins the operator contract in
  * isolation): exact SQL-ntile equality against the window formulation,
  * and internal-column hygiene.
  */
class GlobalOrderSpec extends SparkSpec {

  import spark.implicits._

  test("ntileBy equals window ntile on a skewed, tie-heavy column") {
    val rnd = new scala.util.Random(3)
    val df = (1L to 500L).map(i => (i, (rnd.nextInt(20)).toLong))
      .toDF("id", "v")
    val got = GlobalOrder.ntileBy(df, "v", "id", 7, "tile")
      .select(col("id"), col("tile")).as[(Long, Int)].collect().toMap
    val w = Window.orderBy(col("v"), col("id"))
    val want = df.withColumn("tile", ntile(7).over(w))
      .select(col("id"), col("tile")).as[(Long, Int)].collect().toMap
    assert(got === want)
  }

  test("indexBy equals the 0-based window row_number on ties and skew") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 400L).map(i => (i, rnd.nextInt(10).toLong)).toDF("id", "v")
    val got = GlobalOrder.indexBy(df, "v", "id", "idx")
      .select(col("id"), col("idx")).as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("v"), col("id"))
    val want = df.withColumn("idx", row_number().over(w).cast("long") - 1)
      .select(col("id"), col("idx")).as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("caller columns that collide with former temp names survive") {
    // '_idx'/'_b' were the operator's internal scratch names — a caller
    // column with one of those names must pass through untouched
    val df = Seq((1L, 10L), (2L, 20L), (3L, 5L)).toDF("id", "v")
      .withColumn("_idx", lit(99))
      .withColumn("_b", lit("keep"))
    val out = GlobalOrder.ntileBy(df, "v", "id", 2, "tile")
    assert(out.columns.toSet === Set("id", "v", "_idx", "_b", "tile"))
    assert(out.select("_idx").distinct().head().getInt(0) === 99)
    // and the reserved internals are refused loudly
    val bad = df.withColumn("_graft_ntile_idx", lit(1))
    intercept[IllegalArgumentException] {
      GlobalOrder.ntileBy(bad, "v", "id", 2, "tile")
    }
  }
}
