package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Isolation forest (Liu et al. 2008, "Isolation Forest") — the
  * isolation-family scoring OpenSearch's anomaly-detection plugin
  * builds on (its RCF is the streaming cousin). F4-kernel shape:
  *
  *  - FIT on the driver over a BOUNDED deterministic sample (an
  *    isolation forest needs ~256 points per tree by design — the
  *    paper's ψ; sampling more HURTS isolation quality, so the
  *    driver-side fit is not a scale concession but the algorithm);
  *  - SCORE every row through this native expression: the forest (a
  *    few KB of split nodes) rides inside the expression to every
  *    task, the per-row work is T root-to-leaf walks over primitive
  *    arrays — no shuffle, no UDF serialization per row.
  *
  * Seeded everywhere: same data + seed → bit-identical forest and
  * scores on any JVM.
  */
object IsoForest {

  /** Flat tree encoding: node i holds (featureIdx, splitValue); leaves
    * have featureIdx = -(size+1) (negative marks a leaf carrying its
    * sample count for the path-length correction). Children of i are
    * 2i+1 / 2i+2 in the dense array.
    */
  final case class Tree(feat: Array[Int], split: Array[Double]) extends Serializable

  /** Average unsuccessful-search depth c(n) — the paper's normalizer.
    * Static so the oracle generator can emit the exact JVM values as
    * SQL literals (no cross-libm ln dependence in the replica).
    */
  def cOf(n: Int): Double =
    if (n <= 1) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n

  final case class Forest(trees: Array[Tree], psi: Int) extends Serializable {
    def cOf(n: Int): Double = IsoForest.cOf(n)

    def pathLength(t: Tree, x: Array[Double]): Double = {
      var i = 0
      var depth = 0.0
      while (t.feat(i) >= 0) {
        i = if (x(t.feat(i)) < t.split(i)) 2 * i + 1 else 2 * i + 2
        depth += 1.0
      }
      depth + cOf(-t.feat(i) - 1) // leaf correction for its sample count
    }

    def score(x: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < trees.length) { s += pathLength(trees(i), x); i += 1 }
      val eh = s / trees.length
      math.pow(2.0, -eh / cOf(psi))
    }
  }

  /** Golden-ratio / avalanche constants of the counter-based draw
    * schedule (public-domain splitmix64 lineage, same family as
    * Sketches.seeds).
    */
  private val GOLD = 0x9E3779B97F4A7C15L
  private val PURP = 0xC2B2AE3D27D4EB4FL

  /** COUNTER-BASED draw: a pure function of (seed, tree, purpose,
    * index) — no sequential RNG state threads through the build, so
    * the whole schedule is data-independent and replayable engine-side
    * (the DuckDB oracle recomputes every draw with the same HUGEINT
    * wrapping arithmetic). purpose: 0 = subsample slot, 1 = node
    * feature, 2 = node split fraction.
    */
  @inline private def rnd(seed: Long, t: Long, purpose: Long, i: Long): Long =
    Sketches.fmix64(Sketches.fmix64(seed + GOLD * (t + 1L)) + PURP * purpose + i + 1L)

  /** 53-bit uniform in [0, 1) from a draw — bit-replayable (u >>> 11
    * is an exact double; the divide by 2^53 is exact).
    */
  @inline private def unit(h: Long): Double =
    (h >>> 11).toDouble / 9007199254740992.0

  /** Build `nTrees` isolation trees over `sample` (each tree takes a
    * seeded ψ-subsample, drawn with replacement). Split: uniform
    * feature, uniform value in the subsample's range — the paper's
    * construction, depth-capped at ceil(log2 ψ). Every random draw is
    * counter-based (see `rnd`): feature and fraction are indexed by
    * the dense-heap node id regardless of which nodes become leaves,
    * so the draw schedule never depends on the data and the fit
    * replays level-by-level in SQL.
    */
  def fit(sample: Array[Array[Double]], nTrees: Int = 64, psi: Int = 256,
          seed: Long = 42L): Forest = {
    require(sample.nonEmpty, "isolation forest: empty fit sample")
    val dims = sample.head.length
    val n = sample.length
    val m = math.min(psi, n)
    val maxDepth = math.ceil(math.log(m.toDouble) / math.log(2.0)).toInt
    val nodes = (1 << (maxDepth + 1)) - 1
    val trees = Array.tabulate(nTrees) { t =>
      val sub = Array.tabulate(m)(j =>
        sample(java.lang.Long.remainderUnsigned(rnd(seed, t, 0, j), n.toLong).toInt))
      val feat = new Array[Int](nodes)
      val split = new Array[Double](nodes)
      def build(i: Int, pts: Array[Array[Double]], depth: Int): Unit = {
        val f = java.lang.Long.remainderUnsigned(rnd(seed, t, 1, i), dims.toLong).toInt
        var lo = Double.MaxValue; var hi = Double.MinValue
        pts.foreach { p => if (p(f) < lo) lo = p(f); if (p(f) > hi) hi = p(f) }
        if (depth >= maxDepth || pts.length <= 1 || lo == hi) {
          feat(i) = -(pts.length + 1)
        } else {
          val sv = lo + unit(rnd(seed, t, 2, i)) * (hi - lo)
          feat(i) = f; split(i) = sv
          build(2 * i + 1, pts.filter(_(f) < sv), depth + 1)
          build(2 * i + 2, pts.filter(_(f) >= sv), depth + 1)
        }
      }
      build(0, sub, 0)
      Tree(feat, split)
    }
    Forest(trees, m)
  }

  def scoreColumn(features: Column, forest: Forest): Column =
    GraftColumnBridge.toColumn(
      IsoForestScoreExpr(GraftColumnBridge.toExpression(features), forest))
}

/** Scores a feature vector (array<double>) against a broadcast-in-plan
  * forest. CodegenFallback like the other F4 kernels — the per-row
  * work is the tree walks themselves.
  */
case class IsoForestScoreExpr(child: Expression, forest: IsoForest.Forest)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "iso_forest_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"iso_forest_score expects array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    forest.score(input.asInstanceOf[ArrayData].toDoubleArray())

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
