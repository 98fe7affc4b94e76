package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Longest common contiguous WORD run between two token arrays (F4
  * kernel family; used by E20c's exact-overlap verifier).
  *
  * Classic O(m·n) suffix-match DP with a rolling row — at most
  * max-doc-words² integer cells per pair, and it only ever runs on
  * CANDIDATE pairs (winnowing-fingerprint collisions), never corpus².
  * A Catalyst expression rather than mapPartitions so it composes with
  * the surrounding join/filter plan; CodegenFallback is fine off the
  * hot path (same stance as BpeCountExpr).
  */
case class LcsWordsExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_words"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lcs_words expects two array<string>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toObjectArray(StringType)
    val b = r.asInstanceOf[ArrayData].toObjectArray(StringType)
    val m = a.length
    val n = b.length
    if (m == 0 || n == 0) return 0
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var best = 0
    var i = 1
    while (i <= m) {
      var j = 1
      while (j <= n) {
        cur(j) = if (a(i - 1) == b(j - 1)) prev(j - 1) + 1 else 0
        if (cur(j) > best) best = cur(j)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsWords {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(LcsWordsExpr(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
