package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes —
  * h = Σ b_i·B^(n-1-i) over the wrapping 2⁶⁴ ring (B = 1000003).
  *
  * The document-fingerprinting primitive: because the hash is
  * position-polynomial it extends incrementally (h' = h·B + b), which is
  * what makes window/winnowing fingerprint schemes cheap. Native
  * expression with `doGenCode`: the loop compiles into the generated
  * operator, one pass over the bytes, no UDF boundary, stays inside
  * whole-stage codegen next to the rest of the projection.
  */
case class PolyHash(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  // analyzer-inserted cast — see NfkcLower: SQL calls on non-string
  // columns must match the Column API's Cast wrapper
  override def inputTypes: Seq[DataType] =
    Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Base = 1000003L

  /** Shared by interpreted + codegen paths. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  def apply(c: Column): Column = {
    val e = ColumnBridge.expression(c)
    val stringly =
      if (e.resolved && e.dataType == StringType) e else Cast(e, StringType)
    ColumnBridge.column(PolyHash(stringly))
  }
}
