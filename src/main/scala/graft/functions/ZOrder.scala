package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve: interleave the bits of two dimension columns so
  * that sorting by the single z-value co-locates rows that are close in
  * BOTH dimensions. This is the multi-dimensional clustering layout behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`: write the table as
  * `repartitionByRange(zValue).sortWithinPartitions(zValue)` and every
  * parquet row-group's min/max stats become tight on BOTH dimensions, so a
  * scan filtering on EITHER column skips most files — a single-column sort
  * gives that only for its leading column and leaves the other's span at
  * full range per file (measured in ZOrderSpec).
  *
  * The z-value is pure integer bit arithmetic (shift/mask/add composed
  * from built-in expressions — inside whole-stage codegen, no UDF), so an
  * independent engine reproduces it exactly; [[zValueSql]] emits the same
  * computation as ANSI SQL for cross-engine oracles.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * x's bit i lands at z-bit 2i+1, y's at 2i. Monotone in each dimension
    * within a fixed value of the other. Values ≥ 2^bits CLAMP to the top
    * cell (2^bits − 1): without the clamp their high bits would simply be
    * discarded, ALIASING distant values onto the low cells (2^bits
    * interleaves like 0) and silently destroying the min/max file-skipping
    * the layout exists for — clamped, an undersized `bits` only coarsens
    * the top cell.
    */
  def zValue(x: Column, y: Column, bits: Int = 18): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val top = lit((1L << bits) - 1)
    val (xc, yc) = (least(x.cast("long"), top), least(y.cast("long"), top))
    (0 until bits).map { i =>
      shiftright(xc, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(yc, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** The identical computation as SQL text (DuckDB/ANSI `>>`, `&`,
    * `least`) — the oracle side of [[zValue]]. Integer-exact, so the two
    * engines agree bit for bit.
    */
  def zValueSql(x: String, y: String, bits: Int = 18): String = {
    val top = (1L << bits) - 1
    val (xc, yc) = (s"least($x, $top)", s"least($y, $top)")
    (0 until bits).map { i =>
      s"((($xc >> $i) & 1) * ${1L << (2 * i + 1)} + (($yc >> $i) & 1) * ${1L << (2 * i)})"
    }.mkString("(", " + ", ")")
  }
}
