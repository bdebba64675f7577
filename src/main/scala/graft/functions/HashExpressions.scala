package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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
