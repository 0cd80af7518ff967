package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-document text scans of [[graft.llm.TextAnalysis]] as native
  * codegen expressions — the [[Tokenize]] precedent extended to the
  * whole scan family (r9 verdict item 7): each former Scala `udf` paid
  * the serialization boundary AND split whole-stage codegen around the
  * hottest corpus passes (shingling feeds every dedup query,
  * repetition feeds every quality gate). The string work itself stays
  * in [[graft.llm.Hashing]] — the ONE copy of each convention the
  * DuckDB oracles mirror; these classes only move the call inside the
  * generated operator.
  *
  * Shared null contract (identical to the udfs replaced): null text →
  * EMPTY array / 0.0, never null — `explode` drops the row identically
  * and array consumers see a well-typed empty list.
  *
  * Column-API only (the n/window parameters are query-construction
  * constants, not data) — SQL registration would need foldable-literal
  * builders like `kmv_estimate`'s and no query needs it yet.
  */
abstract class TextScanArrayExpr extends UnaryExpression
    with ImplicitCastInputTypes {

  /** The one pass over the document — implement over a plain String. */
  protected def scan(text: String): Array[String]

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  final def run(s: UTF8String): ArrayData =
    if (s == null) TextScanArrayExpr.Empty
    else {
      val w = scan(s.toString)
      if (w.isEmpty) TextScanArrayExpr.Empty
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

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    run(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  /** Codegen: the expression object itself is referenced from the
    * generated class (the parameters n/window travel with it), and the
    * scan runs in place — one virtual call per row, no row-level
    * serialization.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val self = ctx.addReferenceObj("graftTextScan", this,
      classOf[TextScanArrayExpr].getName)
    val tpe = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(
      code = c.code +
        code"""
           |$tpe ${ev.value} = $self.run(${c.isNull} ? null : ${c.value});
           |""".stripMargin,
      isNull = FalseLiteral)
  }
}

object TextScanArrayExpr {
  private[functions] val Empty: ArrayData =
    new GenericArrayData(Array.empty[Any])
}

/** Distinct word n-gram shingles, first-seen order ([[graft.llm.Hashing.shingles]]). */
case class Shingles(child: Expression, n: Int) extends TextScanArrayExpr {
  override def prettyName: String = "shingles"
  override protected def scan(text: String): Array[String] =
    graft.llm.Hashing.shingles(text, n)
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Context-window chunks of at most `maxTokens` whitespace tokens. */
case class ChunkByTokens(child: Expression, maxTokens: Int)
    extends TextScanArrayExpr {
  override def prettyName: String = "chunk_by_tokens"
  override protected def scan(text: String): Array[String] =
    graft.llm.Hashing.words(text).grouped(maxTokens).map(_.mkString(" ")).toArray
  override protected def withNewChildInternal(newChild: Expression): ChunkByTokens =
    copy(child = newChild)
}

/** Winnowing fingerprints ([[graft.llm.Hashing.winnow]]). */
case class Winnow(child: Expression, n: Int, window: Int)
    extends TextScanArrayExpr {
  override def prettyName: String = "winnow"
  override protected def scan(text: String): Array[String] =
    graft.llm.Hashing.winnow(text, n, window)
  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** Positional (non-distinct) word bigrams, multiplicity kept — the
  * unit the bigram LM ([[graft.llm.CorpusQueries.bigramNllScores]])
  * counts: a looping doc must pay per occurrence. Same
  * [[graft.llm.Hashing.words]] token convention as every shingle
  * oracle; below 2 tokens → empty.
  */
case class WordBigrams(child: Expression) extends TextScanArrayExpr {
  override def prettyName: String = "word_bigrams"
  override protected def scan(text: String): Array[String] = {
    val w = graft.llm.Hashing.words(text)
    if (w.length < 2) Array.empty[String]
    else Array.tabulate(w.length - 1)(i => w(i) + " " + w(i + 1))
  }
  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

/** Adjacent character pairs within one word — the unit BPE training counts. */
case class CharPairs(child: Expression) extends TextScanArrayExpr {
  override def prettyName: String = "char_pairs"
  override protected def scan(w: String): Array[String] =
    if (w.length < 2) Array.empty[String]
    else Array.tabulate(w.length - 1)(i => w.substring(i, i + 2))
  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)
}

/** Positional word n-gram fingerprints ([[graft.llm.Hashing.gramHashes]])
  * — the repeated-span unit ([[graft.llm.RepeatedSpans]]); slot i of the
  * array is the gram starting at word offset i, so `posexplode` recovers
  * the position the coverage window arithmetic needs.
  */
case class GramHashes(child: Expression, n: Int) extends TextScanArrayExpr {
  override def prettyName: String = "gram_hashes"
  override protected def scan(text: String): Array[String] =
    graft.llm.Hashing.gramHashes(text, n)
  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

/** Gopher-style duplicate word-2-gram fraction (`1 − distinct/total`,
  * 0.0 below 2 tokens) — one pass, bit-identical arithmetic to the udf
  * it replaces (TextAnalysis r8) and to the oracles' w2-list
  * reimplementation.
  */
case class RepetitionRatio(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "repetition_ratio"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    RepetitionRatio.ratio(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
           |double ${ev.value} = graft.functions.RepetitionRatio.ratio(
           |  ${c.isNull} ? null : ${c.value});
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionRatio =
    copy(child = newChild)
}

object RepetitionRatio {

  /** Shared by interpreted + codegen paths. */
  def ratio(s: UTF8String): Double =
    if (s == null) 0.0
    else {
      val w = graft.llm.Hashing.words(s.toString)
      val total = w.length - 1
      if (total <= 0) 0.0
      else {
        val seen = new java.util.HashSet[String](total * 2)
        var i = 0
        while (i < total) {
          seen.add(w(i) + " " + w(i + 1))
          i += 1
        }
        1.0 - seen.size.toDouble / total.toDouble
      }
    }
}

/** 60-bit SimHash signature over word `n`-gram shingles
  * ([[graft.llm.Hashing.simhash]]) — the last former-udf text scan on a
  * codegen expression. NULLABLE by contract, unlike the array scans:
  * null text and sub-n-word docs yield NULL (all of them would simhash
  * to 0 and pairwise-collide in every pigeonhole chunk — see
  * [[graft.llm.SimHash]]'s guard rationale), so the nullability travels
  * with the expression instead of a separate filter convention.
  */
case class SimhashSig(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    SimhashSig.sig(if (v == null) null else v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val box = ctx.freshName("simhashBox")
    ev.copy(
      code = c.code +
        code"""
           |java.lang.Long $box = graft.functions.SimhashSig.sig(
           |  ${c.isNull} ? null : ${c.value}, $n);
           |boolean ${ev.isNull} = ($box == null);
           |long ${ev.value} = ${ev.isNull} ? -1L : $box.longValue();
           |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {

  /** Shared by interpreted + codegen paths; null marks "no signature". */
  def sig(s: UTF8String, n: Int): java.lang.Long =
    if (s == null) null
    else {
      val sh = graft.llm.Hashing.shingles(s.toString, n)
      if (sh.isEmpty) null
      else java.lang.Long.valueOf(graft.llm.Hashing.simhash(sh))
    }
}
