package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY "custom operators" ladder, step b):
  * scalar kernels the built-in surface only reaches through higher-order
  * functions, which Spark evaluates INTERPRETED per element (each lambda
  * application is an `InterpretedExpression` call with boxing). These
  * stay inside whole-stage codegen — `doGenCode` emits a call to a static
  * `Kernels` method over the unsafe `ArrayData`, so a 64-dim cosine is a
  * 64-iteration primitive loop instead of ~256 interpreted lambda evals.
  */
private[graft] trait VecPairExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  protected def kernelName: String

  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernelEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected def kernelEval(a: ArrayData, b: ArrayData): java.lang.Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("res")
      s"""
         |java.lang.Double $tmp = graft.functions.Kernels.$kernelName(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

/** Fused dot/norms cosine similarity over two float/double arrays. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VecPairExpression {
  override def prettyName: String = "cosine_sim"
  override protected def kernelName: String = "cosine"
  override protected def kernelEval(a: ArrayData, b: ArrayData): java.lang.Double =
    Kernels.cosine(a, b, isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two float/double arrays. */
case class DotProduct(left: Expression, right: Expression)
    extends VecPairExpression {
  override def prettyName: String = "dot_product"
  override protected def kernelName: String = "dot"
  override protected def kernelEval(a: ArrayData, b: ArrayData): java.lang.Double =
    Kernels.dot(a, b, isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Euclidean (L2) distance over two float/double arrays. */
case class EuclideanDistance(left: Expression, right: Expression)
    extends VecPairExpression {
  override def prettyName: String = "euclidean_dist"
  override protected def kernelName: String = "euclidean"
  override protected def kernelEval(a: ArrayData, b: ArrayData): java.lang.Double =
    Kernels.euclidean(a, b, isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over an array<string> of tokens/shingles. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("res")
      s"""
         |java.lang.Long $tmp = graft.functions.Kernels.simhash64($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of tokens contained in a fixed word set (set built once per
  * expression instance, shared across rows — not per-row like
  * `filter(toks, t -> array_contains(array(...), t))`). */
case class CountTokensIn(child: Expression, words: Seq[String])
    extends UnaryExpression {
  override def prettyName: String = "count_tokens_in"
  override def dataType: DataType = IntegerType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_tokens_in requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.countIn(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.countIn($a, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of tokens whose k double-hashed probe bits are all set in a
  * fixed Bloom bitmap — the might-contain count. The bitmap is built
  * once (driver side, from e.g. a benchmark's n-gram set) and shipped
  * to every task as one reference object; evaluation is a per-row
  * codegen loop with NO explode, NO join, NO shuffle — the scale form
  * of "how many of this document's n-grams appear in the eval set".
  * Monotone over the true count (FPs only add), so thresholding it is
  * a sound pre-filter for the exact path. */
case class BloomCountIn(child: Expression, bits: Array[Long], numBits: Int, k: Int)
    extends UnaryExpression {
  override def prettyName: String = "bloom_count_in"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_count_in requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.bloomCountIn(input.asInstanceOf[ArrayData], bits, numBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.bloomCountIn($a, $bitsRef, $numBits, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** max token frequency / total tokens over an array<string> — the
  * repetition signal of open-corpus quality filters. */
case class MaxTokenFreqRatio(child: Expression) extends UnaryExpression {
  override def prettyName: String = "max_token_freq_ratio"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_token_freq_ratio requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.maxTokenFreqRatio(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("res")
      s"""
         |java.lang.Double $tmp = graft.functions.Kernels.maxTokenFreqRatio($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprints over a string: k-byte-gram rolling hashes,
  * window-minimum selection (MOSS). */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnow requires k >= 1 and w >= 1")
  override def prettyName: String = "winnow"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow requires string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.winnow($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** C4-style line filter: keep '\n'-separated lines with ≥ minWords
  * whitespace tokens, one primitive pass (see Kernels.cleanLines). */
case class CleanLines(child: Expression, minWords: Int) extends UnaryExpression {
  require(minWords >= 0, "minWords must be >= 0")
  override def prettyName: String = "clean_lines"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"clean_lines requires string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.cleanLines(input.asInstanceOf[UTF8String], minWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.cleanLines($a, $minWords);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (java.text.Normalizer, codegen, ASCII fast
  * path) — Spark SQL has no built-in for this. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.nfcNormalize($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Diacritic stripping (NFD + drop combining marks) — café → cafe. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def prettyName: String = "strip_accents"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_accents requires string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.stripAccents($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Occurrence count of the most frequent token in an array<string>. */
case class MaxTokenFreq(child: Expression) extends UnaryExpression {
  override def prettyName: String = "max_token_freq"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_token_freq requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.maxTokenFreq(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.maxTokenFreq($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-grams (space-joined, first-occurrence order) over an
  * array<string> of tokens. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram width must be >= 1")
  override def prettyName: String = "word_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.ngrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.ngrams($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word-n-gram HASHES over a token array — the Bloom paths'
  * allocation-light twin of [[WordNgrams]]: one 64-bit chain hash per
  * gram, sort-distinct, no gram strings materialized. See
  * Kernels.ngramHashes for the (accepted, jaccardPairs-precedented)
  * cross-gram collision odds. */
case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram width must be >= 1")
  override def prettyName: String = "word_ngram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hashes requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.ngramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.ngramHashes($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[BloomCountIn]] over array<long> pre-hashed grams. */
case class BloomCountInLongs(child: Expression, bits: Array[Long],
    numBits: Int, k: Int) extends UnaryExpression {
  override def prettyName: String = "bloom_count_in_longs"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_count_in_longs requires array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.bloomCountInLongs(input.asInstanceOf[ArrayData], bits, numBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.bloomCountInLongs($a, $bitsRef, $numBits, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Element-wise xxhash64 (seed 42, identical to the builtin) over an
  * array<string>. */
case class XxHash64Array(child: Expression) extends UnaryExpression {
  override def prettyName: String = "xxhash64_array"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xxhash64_array requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.xxhash64Array(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.xxhash64Array($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid (L2) assignment against a fixed centroid table —
  * the IVF coarse quantizer. Centroids ride along as a reference object
  * (one shared array, not per-row literals). */
/** Dense projection y = M·v with a literal weight matrix (outDim ×
  * inDim), codegen'd via [[Kernels.matVec]] — the Johnson–Lindenstrauss
  * random-projection step of an embedding pipeline. The matrix rides
  * into generated code as one reference object shared across rows
  * (same mechanism as [[NearestCentroid]]'s centroid table). */
case class MatVec(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {
  override def prettyName: String = "mat_vec"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec requires array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.matVec(input.asInstanceOf[ArrayData], matrix, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.matVec($a, $ref, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Two-level IVF assignment (nearest coarse centroid, then nearest
  * sub-centroid within that cell) — see [[Kernels.twoLevelList]]. Both
  * centroid tables ride into generated code as shared reference
  * objects, so the per-row cost is (k1 + k2)·dim instead of k·dim. */
case class NearestCentroidTwoLevel(
    child: Expression, coarse: Array[Array[Double]],
    subs: Array[Array[Array[Double]]], k2max: Int)
    extends UnaryExpression {
  override def prettyName: String = "nearest_centroid_two_level"
  override def dataType: DataType = IntegerType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_two_level requires array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.twoLevelList(input.asInstanceOf[ArrayData], coarse, subs, k2max, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refC = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val refS = ctx.addReferenceObj("subs", subs, "double[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.twoLevelList($a, $refC, $refS, $k2max, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.nearestCentroid(input.asInstanceOf[ArrayData], centroids, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.nearestCentroid($a, $ref, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric int8 quantization stats (scale, q_sum, max_err) of a
  * float/double vector — the compression step of an embedding store,
  * fused into one codegen pass (see Kernels.quantI8Stats for the exact
  * floor(x/scale + 0.5) contract). */
case class QuantizeI8Stats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quant_i8_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("max_err", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quant_i8_stats requires array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.quantI8Stats(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.quantI8Stats($a, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full int8 quantization of a float/double vector: (scale, codes) —
  * same numeric contract as [[QuantizeI8Stats]], materializing the
  * codes as a primitive tinyint array (4×/8× storage reduction for an
  * embedding store). */
case class QuantizeI8(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quant_i8"
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quant_i8 requires array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.quantI8(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Kernels.quantI8($a, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 2-D Z-order (Morton) interleave of two non-negative long bucket ids —
  * the clustering key behind OPTIMIZE ... ZORDER BY (a, b): sort by it
  * and every data file covers a tight rectangle in BOTH dimensions, so
  * file-level min/max stats ([[graft.tables.StatsIndex]]) prune range
  * scans on either column. */
case class ZOrder2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "zorder2"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.zorder2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.zorder2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points. */
object F {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def cosineSim(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def euclidean(a: Column, b: Column): Column = c(EuclideanDistance(e(a), e(b)))
  def simhash64(tokens: Column): Column = c(SimHash64Expr(e(tokens)))
  def countTokensIn(tokens: Column, words: Seq[String]): Column =
    c(CountTokensIn(e(tokens), words))
  def bloomCountIn(tokens: Column, bits: Array[Long], numBits: Int, k: Int): Column =
    c(BloomCountIn(e(tokens), bits, numBits, k))
  def wordNgrams(tokens: Column, n: Int): Column = c(WordNgrams(e(tokens), n))
  def wordNgramHashes(tokens: Column, n: Int): Column =
    c(WordNgramHashes(e(tokens), n))
  def bloomCountInLongs(hashes: Column, bits: Array[Long], numBits: Int,
      k: Int): Column = c(BloomCountInLongs(e(hashes), bits, numBits, k))
  def xxhash64Array(strings: Column): Column = c(XxHash64Array(e(strings)))
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    c(NearestCentroid(e(v), centroids))
  def matVec(v: Column, matrix: Array[Array[Double]]): Column =
    c(MatVec(e(v), matrix))
  def twoLevelList(v: Column, coarse: Array[Array[Double]],
      subs: Array[Array[Array[Double]]], k2max: Int): Column =
    c(NearestCentroidTwoLevel(e(v), coarse, subs, k2max))
  def maxTokenFreqRatio(tokens: Column): Column = c(MaxTokenFreqRatio(e(tokens)))
  def maxTokenFreq(tokens: Column): Column = c(MaxTokenFreq(e(tokens)))
  def winnow(text: Column, k: Int, w: Int): Column = c(Winnow(e(text), k, w))
  def cleanLines(text: Column, minWords: Int): Column = c(CleanLines(e(text), minWords))
  def quantI8Stats(v: Column): Column = c(QuantizeI8Stats(e(v)))
  def quantI8(v: Column): Column = c(QuantizeI8(e(v)))
  def nfcNormalize(s: Column): Column = c(NfcNormalize(e(s)))
  def stripAccents(s: Column): Column = c(StripAccents(e(s)))
  /** Z-order clustering key over two columns (cast to long; bucket the
    * raw values into comparable magnitudes first — see [[ZOrder2Expr]]). */
  def zorder2(a: Column, b: Column): Column =
    c(ZOrder2Expr(e(a.cast("long")), e(b.cast("long"))))
  /** Group-wise top-k aggregate over a struct column: the k largest
    * structs (lexicographic over all fields), map-side combined — see
    * [[TopKStructs]]. */
  def topKStructs(s: Column, k: Int): Column =
    c(TopKStructs(e(s), k).toAggregateExpression())
  /** Misra–Gries heavy-hitters sketch over a string column: mergeable,
    * map-side-combined, ≤ capacity rows per partition cross the wire —
    * see [[HeavyHitters]]. */
  def heavyHitters(token: Column, capacity: Int): Column =
    c(HeavyHitters(e(token), capacity).toAggregateExpression())
}
