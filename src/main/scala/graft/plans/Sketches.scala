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
  def ngramHashes(tokens: Column, n: Int, distinct: Boolean): Column =
    GraftColumnBridge.toColumn(NgramHashes(GraftColumnBridge.toExpression(tokens), n, distinct))
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    GraftColumnBridge.toColumn(BandKeys(GraftColumnBridge.toExpression(sig), bands, rows))

  /** FNV-1a 64 over UTF-8 bytes + splitmix finalizer — the per-token
    * hash the n-gram kernel combines. Any well-mixed 64-bit hash works:
    * downstream semantics (Jaccard, MinHash, banding) depend only on
    * hash-set EQUALITY structure, never on the values.
    */
  @inline final def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xFFL; h *= 0x100000001B3L; i += 1 }
    fmix64(h)
  }
}

/** Word n-gram hashes straight from the token array — one pass, no
  * shingle-string materialization. Replaces the interpreted
  * transform(sequence → slice → array_join → xxhash64) pipeline: each
  * token is hashed once and each window combines the token hashes with
  * an order-sensitive polynomial, so the per-document cost is
  * O(tokens + windows·n) long ops instead of O(windows·n) string
  * allocations + string hashes.
  * Window semantics match the builtin formulation: max(len-n+1, 1)
  * windows; a document shorter than n yields one all-tokens window.
  * distinct=true dedupes (sorted) — for set-Jaccard / MinHash inputs;
  * distinct=false keeps positional order — for winnowing.
  */
case class NgramHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val len = in.numElements()
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) = if (in.isNullAt(i)) 0L
              else Sketches.hashBytes(in.getUTF8String(i).getBytes)
      i += 1
    }
    val windows = math.max(len - n + 1, 1)
    val out = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      val end = math.min(w + n, len)
      var acc = 0x9E3779B97F4A7C15L
      var j = w
      while (j < end) { acc = acc * 0x100000001B3L ^ th(j); j += 1 }
      out(w) = Sketches.fmix64(acc)
      w += 1
    }
    if (!distinct) new GenericArrayData(out)
    else {
      java.util.Arrays.sort(out)
      var u = 0
      var k = 0
      while (k < windows) {
        if (k == 0 || out(k) != out(k - 1)) { out(u) = out(k); u += 1 }
        k += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, u))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band keys from a MinHash signature: band b is an order-sensitive
  * combine of sig[b·rows … b·rows+rows) mixed with b (so equal row
  * slices in different bands don't collide). Replaces the interpreted
  * transform(sequence → xxhash64(slice)) pipeline.
  */
case class BandKeys(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"band_keys expects array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = Sketches.fmix64(0x9E3779B97F4A7C15L * (b + 1))
      var j = b * rows
      val end = math.min(j + rows, in.numElements())
      while (j < end) { acc = acc * 0x100000001B3L ^ in.getLong(j); j += 1 }
      out(b) = Sketches.fmix64(acc)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
