package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the text-hash primitives — the
 * codegen tier of the extension ladder (a `doGenCode` expression
 * stays inside whole-stage codegen; a Scala UDF forces a
 * serialization boundary per row). Registered as SQL functions
 * `fnv1a64` / `simhash64` by [[graft.GraftExtensions]].
 */
object HashExpressions {
  /** UTF8String-native FNV-1a 64 (no String materialization). */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash64(s: UTF8String): Long = TextHash.simhash64(s.toString)

  /** k-wide MinHash signature of a text's word-n-gram shingles. */
  def minhashSig(s: UTF8String, k: Int, n: Int): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      TextHash.minhashSignature(TextHash.shingleHashes(s.toString, n), k))

  /** Distinct word-n-gram shingle hashes as a long array. */
  def shingleArray(s: UTF8String, n: Int): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      TextHash.shingleHashes(s.toString, n))

  /** Fraction of agreeing slots between two equal-width signatures. */
  def sigAgree(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"sig_agree: signature widths differ ($n vs ${b.numElements()})")
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  def rollingFingerprint(s: UTF8String): Long =
    TextHash.rollingFingerprint(s.toString)

  /**
   * Dot product of two numeric arrays in double precision, summed
   * left-to-right — the same element order and arithmetic as
   * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, _+_)` and DuckDB's
   * `list_dot_product`, so results are bit-identical to both; unlike
   * the higher-order-function form it allocates NO intermediate array
   * per row (measured ~100× on all-pairs cosine scoring). Length
   * mismatch throws: zip_with's silent null-padding turned mismatched
   * embeddings into null scores downstream.
   */
  def dotDouble(a: ArrayData, b: ArrayData, floatA: Boolean, floatB: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: array lengths differ ($n vs ${b.numElements()})")
    var sum = 0.0
    var i = 0
    while (i < n) {
      val x = if (floatA) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (floatB) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }
}

/**
 * `shingle_hashes(text, n) -> rows of bigint` — a Catalyst
 * [[org.apache.spark.sql.catalyst.expressions.Generator]]: emits one
 * row per distinct word-n-gram shingle hash, straight into the
 * `Generate` operator with no intermediate array column (the
 * `explode(udf(...))` form materializes every document's full shingle
 * array before exploding it). Completes the extension ladder —
 * scalar expression (`fnv1a64`), aggregate (`minhash_agg`), generator
 * (this) — mirroring the reference's table-function surface
 * (src/lib.rs:368-373 registers table functions into the host).
 */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires a string argument, got ${child.dataType.simpleString}")
    else if (n <= 0)
      TypeCheckResult.TypeCheckFailure(s"shingle_hashes n=$n must be > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sh", LongType, nullable = false)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else TextHash.shingleHashes(t.asInstanceOf[UTF8String].toString, n)
      .map(h => org.apache.spark.sql.catalyst.InternalRow(h))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/**
 * `vec_dot(array<float|double>, array<float|double>) -> double` —
 * codegen'd dot product for embedding similarity (the hot inner loop
 * of cosine top-k, IVF/LSH bucketing, and embedding near-dup verify).
 */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  private def isFloat(e: Expression): Boolean = elemType(e).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashExpressions.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HashExpressions.dotDouble($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `fnv1a64(string) -> bigint` — content hash, codegen'd. */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"fnv1a64 requires a string argument, got ${child.dataType.simpleString}")
  override def prettyName: String = "fnv1a64"

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.fnv1a64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashExpressions.fnv1a64($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/**
 * `sipHash64(string) -> bigint` — ClickHouse's SipHash-2-4 content
 * hash (zero key), codegen'd. Values ≥ 2^63 surface as negative Longs
 * (the documented UInt64 policy); the keyed core is pinned against
 * the SipHash paper's own test vectors in SipHashSpec.
 */
case class SipHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"sipHash64 requires a string argument, got ${child.dataType.simpleString}")
  override def prettyName: String = "siphash64"

  override protected def nullSafeEval(input: Any): Any =
    SipHash.hash64Zero(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SipHash.hash64Zero($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): SipHash64Expr =
    copy(child = newChild)
}

/**
 * `minhash_sig(string, k, n) -> array<bigint>` — the k-wide MinHash
 * signature of a document's word-n-gram shingle set, codegen'd. This
 * is the hottest map of the dedup pipeline (every document, every
 * byte); as a native expression it stays inside whole-stage codegen
 * instead of paying the UDF serialization boundary per row, and it
 * writes an UnsafeArrayData directly (no boxing of k longs).
 */
case class MinHashSig(child: Expression, k: Int, shingleN: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires a string argument, got ${child.dataType.simpleString}")
    else if (k <= 0 || k > TextHash.MaxK)
      TypeCheckResult.TypeCheckFailure(s"minhash_sig k=$k outside (0, ${TextHash.MaxK}]")
    else if (shingleN <= 0)
      TypeCheckResult.TypeCheckFailure(s"minhash_sig n=$shingleN must be > 0")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.minhashSig(input.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashExpressions.minhashSig($c, $k, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `shingle_array(string, n) -> array<bigint>` — distinct word-n-gram
  * shingle hashes as one array (the verify-join side of n-gram
  * Jaccard; the row-generator form is [[ShingleHashes]]). */
case class ShingleArray(child: Expression, shingleN: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_array requires a string argument, got ${child.dataType.simpleString}")
    else if (shingleN <= 0)
      TypeCheckResult.TypeCheckFailure(s"shingle_array n=$shingleN must be > 0")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.shingleArray(input.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashExpressions.shingleArray($c, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** `hamming64(bigint, bigint) -> int` — popcount of the XOR; inlines to
  * two JVM intrinsics inside codegen. */
case class Hamming64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "hamming64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming64 requires two bigint arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)
}

/** `sig_agree(array<bigint>, array<bigint>) -> double` — fraction of
  * agreeing MinHash slots (the Jaccard estimator); width mismatch
  * throws rather than estimating against a junk signature. */
case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sig_agree"

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sig_agree requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashExpressions.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HashExpressions.sigAgree($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

/** `rolling_fingerprint(string) -> bigint` — winnowing fingerprint
  * (TextHash.rollingFingerprint), codegen'd. */
case class RollingFingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.rollingFingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashExpressions.rollingFingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpr =
    copy(child = newChild)
}

/** `simhash64(string) -> bigint` — near-dup fingerprint, codegen'd. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash64 requires a string argument, got ${child.dataType.simpleString}")
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashExpressions.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
