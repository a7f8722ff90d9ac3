package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** SQL registration for the custom expression family, so `spark.sql`
  * users get the same kernels as the Column API:
  *
  *   - `cosine_sim(a, b)`, `dot_product(a, b)`, `euclidean_dist(a, b)`
  *   - `simhash64(tokens)`, `xxhash64_array(tokens)`
  *   - `word_ngrams(tokens, n)` (n a literal int)
  *   - `count_tokens_in(tokens, words)` (words a literal array<string>)
  *
  * Two entry points: `GraftExtensions` for
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session
  * build (the SparkSessionExtensions route), and
  * `GraftFunctions.register(spark)` for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a literal int, got $other")
  }

  private def litStrings(e: Expression, what: String): Seq[String] = e match {
    case Literal(data: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
      data.toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _)
        if children.forall(_.isInstanceOf[Literal]) =>
      children.map(_.asInstanceOf[Literal].value.asInstanceOf[UTF8String].toString)
    case other => throw new IllegalArgumentException(
      s"$what must be a literal array of strings, got $other")
  }

  /** (name, info, builder) triples shared by both registration routes. */
  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of two float/double arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("euclidean_dist",
      info("euclidean_dist", "euclidean_dist(a, b) - L2 distance of two float/double arrays"),
      (es: Seq[Expression]) => EuclideanDistance(es(0), es(1))),
    ("simhash64",
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array<string>"),
      (es: Seq[Expression]) => SimHash64Expr(es(0))),
    ("xxhash64_array",
      info("xxhash64_array", "xxhash64_array(tokens) - per-element xxhash64 of an array<string>"),
      (es: Seq[Expression]) => XxHash64Array(es(0))),
    ("word_ngrams",
      info("word_ngrams", "word_ngrams(tokens, n) - distinct space-joined n-grams"),
      (es: Seq[Expression]) => WordNgrams(es(0), litInt(es(1), "word_ngrams n"))),
    ("count_tokens_in",
      info("count_tokens_in", "count_tokens_in(tokens, array('w',...)) - tokens present in a fixed set"),
      (es: Seq[Expression]) =>
        CountTokensIn(es(0), litStrings(es(1), "count_tokens_in words"))),
    ("clean_lines",
      info("clean_lines", "clean_lines(text, minWords) - keep lines with >= minWords tokens"),
      (es: Seq[Expression]) =>
        CleanLines(es(0), litInt(es(1), "clean_lines minWords"))),
    ("quant_i8_stats",
      info("quant_i8_stats", "quant_i8_stats(v) - int8 quantization stats (scale, q_sum, max_err)"),
      (es: Seq[Expression]) => QuantizeI8Stats(es(0))),
    ("quant_i8",
      info("quant_i8", "quant_i8(v) - int8 quantization (scale, codes array<tinyint>)"),
      (es: Seq[Expression]) => QuantizeI8(es(0))),
    ("nfc_normalize",
      info("nfc_normalize", "nfc_normalize(s) - Unicode canonical composition (NFC)"),
      (es: Seq[Expression]) => NfcNormalize(es(0))),
    ("strip_accents",
      info("strip_accents", "strip_accents(s) - NFD + drop combining marks (cafe from café)"),
      (es: Seq[Expression]) => StripAccents(es(0))),
    ("zorder2",
      info("zorder2", "zorder2(a, b) - 2-D Z-order (Morton) interleave of two non-negative bigint bucket ids"),
      (es: Seq[Expression]) => ZOrder2Expr(es(0), es(1))))

  /** Register on a live session (temp functions in its registry). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
