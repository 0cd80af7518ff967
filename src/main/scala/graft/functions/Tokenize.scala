package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The house whitespace tokenization ([[graft.llm.Hashing.words]] — the
  * ONE convention every `CorpusQueries.WordsExpr` DuckDB oracle
  * mirrors) as a native codegen expression.
  *
  * Why an Expression and not the dozen per-query Scala `udf` wrappers
  * it replaces: each udf call site paid the serialization boundary
  * (UTF8String → String → Array[String] → re-encode) AND broke
  * whole-stage codegen around the tokenize-explode projection — ×40
  * text queries, that was the text family's standing tax (VERDICT r8
  * §"what's wrong" 3). This expression runs `Hashing.words` in place
  * inside the generated operator, so scan → tokenize → explode →
  * hash-agg stays one codegen span (the [[CosineSim]] precedent).
  *
  * Null contract matches the UDFs it replaces: null text → EMPTY array
  * (never null), so `explode` drops the row identically and array
  * consumers (`size`, joins on tokens) see a well-typed empty list.
  */
case class Tokenize(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  // analyzer-inserted cast — see NfkcLower: SQL calls on non-string
  // columns must match the Column API's Cast wrapper
  override def inputTypes: Seq[DataType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "tokenize_words"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    Tokenize.words(
      if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val tpe = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(
      code = c.code +
        code"""
           |$tpe ${ev.value} = graft.functions.Tokenize.words(
           |  ${c.isNull} ? null : ${c.value});
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

object Tokenize {

  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Shared by interpreted + codegen paths. */
  def words(s: UTF8String): ArrayData =
    if (s == null) Empty
    else {
      val w = graft.llm.Hashing.words(s.toString)
      if (w.isEmpty) Empty
      else {
        val out = new Array[Any](w.length)
        var i = 0
        while (i < w.length) {
          out(i) = UTF8String.fromString(w(i))
          i += 1
        }
        new GenericArrayData(out)
      }
    }

  /** Column-API entry point; non-string inputs cast to string first
    * (the NfkcLower convention). */
  def apply(c: Column): Column = {
    val e = ColumnBridge.expression(c)
    val stringly =
      if (e.resolved && e.dataType == StringType) e else Cast(e, StringType)
    ColumnBridge.column(Tokenize(stringly))
  }
}
