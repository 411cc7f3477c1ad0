package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.WordNGrams

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions for SQL use, so `SELECT word_ngrams(text, 3)` works in
  * plain spark.sql alongside the Column API.
  *
  * Install with:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)
  * // or: spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.wordNGramsDescriptor)
  }
}

object GraftExtensions {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val wordNGramsDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("word_ngrams"),
    new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
    (args: Seq[Expression]) => args match {
      case Seq(text) => WordNGrams(text, 3)
      case Seq(text, n) => WordNGrams(text, intArg(n, "n-gram size"))
      case _ => throw new IllegalArgumentException(
        "word_ngrams(text[, n]) takes 1 or 2 arguments")
    })

  /** Register on an existing session (tests / REPL convenience). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (_, info, builder) = wordNGramsDescriptor
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", builder, "built-in")
    val _ = info
  }
}
