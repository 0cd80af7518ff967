package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-money arithmetic helpers — the `q1_pricing_decimal` convention
  * applied across the revenue surface (see the Relational scaladoc for
  * the failure class this replaces: round(sum(double), 2) flips with
  * accumulation order once group sums reach ~1e8, measured on q9 at the
  * r11 decade sweep).
  *
  * Contract: every money/qty/discount column in the harness data is
  * exactly 2 dp (verified over sf0.1: zero rows where
  * CAST(x AS DECIMAL(18,6)) differs from the (18,2) cast), so the
  * DECIMAL(12,2) input cast is lossless and all downstream sums are
  * exact integers in centi-units. Published columns are fixed-scale
  * digit strings (representation-independent across the driver's two
  * read paths — parquet decimal128 vs DuckDB frame) or integer
  * fixed-point units via `div` on non-negative ground.
  *
  * Precision headroom at 100 TB: sums accumulate in Spark's
  * DECIMAL(min(38, p+10), s) — for (24,4) products that is (34,4), i.e.
  * 10^30 in e4 units, ~10^26 dollars of headroom; DuckDB sums the same
  * shapes in HUGEINT-backed DECIMAL. Nothing overflows before the data
  * outgrows BIGINT row counts.
  */
object Money {

  /** Lossless scan-side cast for a 2 dp money/qty/fraction column. */
  def dec2(c: Column): Column = c.cast("decimal(12,2)")

  /** price × (1 − discount) in exact scale-4 decimal. */
  def disc4(price: Column, discount: Column): Column =
    dec2(price) * (lit(1).cast("decimal(12,2)") - dec2(discount))

  /** Exact sum of a 2 dp column, published as the canonical digit
    * string (DECIMAL(20,2) — explicit final precision on BOTH engines
    * per the house cross-engine decimal rule).
    */
  def sumMoney2(c: Column): Column =
    sum(dec2(c)).cast("decimal(20,2)").cast("string")

  /** Exact sum of a scale-4 product column, published as the canonical
    * DECIMAL(24,4) digit string.
    */
  def sumMoney4(prod: Column): Column =
    sum(prod).cast("decimal(24,4)").cast("string")

  /** The same sum kept as a DECIMAL value (for ordering / arithmetic
    * before the final stringify).
    */
  def sumDec4(prod: Column): Column = sum(prod).cast("decimal(24,4)")

  /** Integer division as a Column (Spark SQL `div`): truncation toward
    * zero, which equals DuckDB's floor-`//` on non-negative ground — the
    * only ground any money quantity here stands on.
    */
  def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Integer fixed-point average: a decimal aggregate scaled EXACTLY to
    * 10^-unitScale integer units (the decimal has `decScale` fractional
    * digits, all of which survive the scaling), then `div` the count.
    * Published as BIGINT — e.g. avgUnits(sum(qty), n, 2, 4) is the mean
    * quantity in 1e-4 units.
    */
  def avgUnits(sumDec: Column, n: Column, decScale: Int, unitScale: Int): Column = {
    require(unitScale >= decScale, s"unitScale $unitScale < decScale $decScale")
    val mult = math.pow(10, unitScale - decScale).toLong
    intDiv((sumDec * lit(mult)).cast("decimal(38,0)").cast("long"), n)
  }
}
