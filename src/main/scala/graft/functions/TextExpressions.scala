package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text pipeline.
  *
  * Why an Expression and not higher-order functions: building n-gram
  * shingles with `transform(sequence(...), i -> element_at(toks, ...))`
  * re-evaluates the tokenizer per shingle once CollapseProject inlines
  * the `toks` alias into the lambda — O(tokens²) per document and
  * interpreted (HOFs don't codegen). This expression tokenizes once and
  * emits the distinct shingle set in a single linear pass. Why not a
  * UDF: an Expression keeps null semantics, works in any API, and can
  * later add doGenCode without changing call sites.
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[UTF8String], n)

  /** Static-invoke codegen: one compiled call, no row boxing, no
    * CodegenFallback barrier in the shingle-heavy dedup pipelines.
    */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGrams$$.MODULE$$" +
        s".compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNGrams {
  /** Shared by the interpreted path and the generated code. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString
    val toks = text.toLowerCase.split(' ').filter(_.nonEmpty)
    val out = mutable.LinkedHashSet.empty[String]
    if (toks.length < n) {
      // short-document fallback: the whole text is the one shingle
      // (mirrors the reference semantics of treating tiny docs atomically)
      out += text
    } else {
      val sb = new StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out += sb.result()
        i += 1
      }
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }
}

/** Positional (non-distinct) word n-grams: element i is the shingle
  * starting at word i, so `posexplode` recovers (word position,
  * shingle) pairs — what the duplicated-span detector needs and
  * [[WordNGrams]]'s distinct set destroys. A document shorter than n
  * words yields an EMPTY array (no atomic-doc fallback here: a span
  * shorter than the window is by definition not a duplicated span).
  */
case class WordNGramsPos(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    WordNGramsPos.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGramsPos$$.MODULE$$" +
        s".compute($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): WordNGramsPos = copy(child = newChild)

  override def prettyName: String = "word_ngrams_pos"
}

object WordNGramsPos {
  /** Shared by the interpreted path and the generated code. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val toks = input.toString.toLowerCase.split(' ').filter(_.nonEmpty)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.result())
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextExpressions {
  import org.apache.spark.sql.GraftSqlBridge

  /** Distinct word n-gram shingles of a string column, single pass. */
  def wordNGrams(c: Column, n: Int): Column =
    GraftSqlBridge.column(WordNGrams(GraftSqlBridge.expression(c), n))

  /** Positional (per-start-word) n-gram shingles, single pass. */
  def wordNGramsPos(c: Column, n: Int): Column =
    GraftSqlBridge.column(WordNGramsPos(GraftSqlBridge.expression(c), n))
}
