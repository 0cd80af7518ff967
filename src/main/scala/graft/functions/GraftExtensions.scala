package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's custom expressions. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (or `.withExtensions(new GraftExtensions)`): `nfkc_lower(str)` and
  * `poly_hash(str)` then work from plain `spark.sql(...)` exactly like
  * built-ins, including codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("nfkc_lower"),
      new ExpressionInfo(classOf[NfkcLower].getName, "nfkc_lower"),
      (children: Seq[Expression]) => NfkcLower(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
  }
}

object GraftExtensions {
  /** Late registration onto an existing session (harness driver path). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "nfkc_lower", children => NfkcLower(children.head))
    org.apache.spark.sql.graftshim.ColumnBridge.registerTempFunction(
      spark, "poly_hash", children => PolyHash(children.head))
  }
}
