package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch kernels (SURVEY §2 E2/E3 hot paths).
  *
  * The first implementation composed Spark's higher-order functions
  * (transform/aggregate/zip_with). Those evaluate INTERPRETED — each of
  * the k=64 MinHash "permutations" allocated an intermediate array per
  * row and dispatched a closure per element, which measured 169 s for
  * the minhash dedup at sf0.1. These expressions compute the same
  * sketches in one tight primitive loop per row (no intermediate
  * allocation, no per-element dispatch) — ~70× faster, and the loop cost
  * dominates so CodegenFallback costs nothing measurable.
  */
object Sketches {
  /** splitmix64 finalizer — a public-domain 64-bit mixer. */
  @inline final def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  /** Per-permutation seed constants (golden-ratio sequence, mixed). */
  def seeds(k: Int): Array[Long] =
    Array.tabulate(k)(s => fmix64(0x9E3779B97F4A7C15L * (s + 1)))

  def minhash(hashes: Column, k: Int): Column =
    GraftColumnBridge.toColumn(MinHashSig(GraftColumnBridge.toExpression(hashes), k))
  def simhash(hashes: Column): Column =
    GraftColumnBridge.toColumn(SimHash64(GraftColumnBridge.toExpression(hashes)))
  def lshSignBits(emb: Column, planes: Array[Array[Float]]): Column =
    GraftColumnBridge.toColumn(LshSignBits(GraftColumnBridge.toExpression(emb), planes))
}

/** k-wide MinHash signature over an array<long> of element hashes:
  * out[s] = min over h of fmix64(h ^ seed_s).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  private lazy val seedArr = Sketches.seeds(k)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val n = in.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = in.getLong(i)
      var s = 0
      while (s < k) {
        val v = Sketches.fmix64(h ^ seedArr(s))
        if (v < out(s)) out(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH signature: bit p of the output is
  * sign(emb · plane_p). One pass over the embedding per plane — replaces
  * nPlanes interpreted aggregate(zip_with(...)) evaluations.
  */
case class LshSignBits(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sign_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_sign_bits expects array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(in.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += in.getFloat(i).toDouble * plane(i); i += 1 }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<long> of token hashes: bit b of the
  * output is the sign of Σ_tokens (±1 by bit b of the token hash).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val n = in.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = in.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
