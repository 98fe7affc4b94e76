package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Longest common contiguous WORD run between two token arrays (F4
  * kernel family; used by E20c's exact-overlap verifier).
  *
  * Classic O(m·n) suffix-match DP with a rolling row — at most
  * max-doc-words² cells per pair, and it only ever runs on CANDIDATE
  * pairs (winnowing-fingerprint collisions), never corpus². A Catalyst
  * expression rather than mapPartitions so it composes with the
  * surrounding join/filter plan; CodegenFallback is fine off the hot
  * path (same stance as BpeCountExpr).
  *
  * Accepts array<string> OR array<long>: the E20c operator pre-hashes
  * words to xxhash64 longs once per ROW, so the O(m·n) inner loop
  * compares primitives instead of UTF8String bytes (~2× on the bench
  * battery's candidate volume). A cross-word hash collision inflating
  * a run needs two different words agreeing on 64 bits at aligned
  * positions — ~2⁻⁶⁴ per cell, irrelevant at any corpus size.
  */
case class LcsWordsExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_words"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lcs_words expects two array<string> or two array<long>, " +
          s"got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = left.dataType match {
    case ArrayType(LongType, _) =>
      lcsLongs(l.asInstanceOf[ArrayData].toLongArray(),
        r.asInstanceOf[ArrayData].toLongArray())
    case _ =>
      lcsObjects(l.asInstanceOf[ArrayData].toObjectArray(StringType),
        r.asInstanceOf[ArrayData].toObjectArray(StringType))
  }

  private def lcsLongs(a: Array[Long], b: Array[Long]): Int = {
    val m = a.length
    val n = b.length
    if (m == 0 || n == 0) return 0
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var best = 0
    var i = 1
    while (i <= m) {
      val ai = a(i - 1)
      var j = 1
      while (j <= n) {
        cur(j) = if (ai == b(j - 1)) prev(j - 1) + 1 else 0
        if (cur(j) > best) best = cur(j)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    best
  }

  private def lcsObjects(a: Array[AnyRef], b: Array[AnyRef]): Int = {
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

/** Positional sibling of [[LcsWordsExpr]] (E20d): same O(m·n) rolling
  * DP over pre-hashed long arrays, but returns WHERE the best run sits
  * — struct(len, a_end, b_end), end indices EXCLUSIVE — so the caller
  * can cut the duplicated span, not just report it. Ties resolve to
  * the first (i, j) in scan order: deterministic output for identical
  * inputs, the property the removal pipeline's idempotence rests on.
  */
case class LcsSpanExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  import org.apache.spark.sql.types.StructField

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("a_end", IntegerType, nullable = false),
    StructField("b_end", IntegerType, nullable = false)))
  override def prettyName: String = "lcs_span"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lcs_span expects two array<long>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    val m = a.length
    val n = b.length
    var best = 0; var bestI = 0; var bestJ = 0
    if (m > 0 && n > 0) {
      var prev = new Array[Int](n + 1)
      var cur = new Array[Int](n + 1)
      var i = 1
      while (i <= m) {
        val ai = a(i - 1)
        var j = 1
        while (j <= n) {
          cur(j) = if (ai == b(j - 1)) prev(j - 1) + 1 else 0
          if (cur(j) > best) { best = cur(j); bestI = i; bestJ = j }
          j += 1
        }
        val t = prev; prev = cur; cur = t
        java.util.Arrays.fill(cur, 0)
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestI, bestJ)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsSpan {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(LcsSpanExpr(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
