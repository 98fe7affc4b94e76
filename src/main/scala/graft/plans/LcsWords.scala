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

/** ALL maximal shared runs ≥ `minRun` between two hashed-word arrays
  * (E20d's kernel after the §8h scaling study): Lee et al. 2022 cut
  * EVERY duplicated substring in one pass, and returning only the
  * longest run forced the removal loop into one round per additional
  * run — re-paying candidate mining each time. Same O(m·n) rolling DP;
  * a run is recorded at its termination cell (the next pair of words
  * no longer matches, or either array ends), so each maximal diagonal
  * run reports exactly once as struct(len, b_end) with `b_end`
  * EXCLUSIVE on the b side. Runs from different diagonals may overlap
  * on b — the caller's islands merge handles that, exactly as it
  * already merged spans arriving from different PAIRS. First-scan-order
  * emission keeps the output deterministic.
  */
case class LcsSpansExpr(left: Expression, right: Expression, minRun: Int)
  extends BinaryExpression with CodegenFallback {

  import org.apache.spark.sql.types.StructField

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      StructField("len", IntegerType, nullable = false),
      StructField("b_end", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "lcs_spans"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lcs_spans expects two array<long>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    val m = a.length
    val n = b.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (m > 0 && n > 0) {
      var prev = new Array[Int](n + 1)
      var cur = new Array[Int](n + 1)
      var i = 1
      while (i <= m) {
        val ai = a(i - 1)
        var j = 1
        while (j <= n) {
          val run = if (ai == b(j - 1)) prev(j - 1) + 1 else 0
          cur(j) = run
          // maximal-termination test: the run cannot extend past (i, j)
          if (run >= minRun &&
              (i == m || j == n || a(i) != b(j)))
            out += org.apache.spark.sql.catalyst.InternalRow(run, j)
          j += 1
        }
        val t = prev; prev = cur; cur = t
        java.util.Arrays.fill(cur, 0)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsSpans {
  def apply(a: Column, b: Column, minRun: Int): Column =
    GraftColumnBridge.toColumn(LcsSpansExpr(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b), minRun))
}
