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

  final case class Forest(trees: Array[Tree], psi: Int) extends Serializable {
    /** Average unsuccessful-search depth c(n) — the paper's normalizer. */
    def cOf(n: Int): Double =
      if (n <= 1) 0.0
      else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n

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

  /** Build `nTrees` isolation trees over `sample` (each tree takes a
    * seeded ψ-subsample). Split: uniform feature, uniform value in the
    * subsample's range — the paper's construction, depth-capped at
    * ceil(log2 ψ).
    */
  def fit(sample: Array[Array[Double]], nTrees: Int = 64, psi: Int = 256,
          seed: Long = 42L): Forest = {
    require(sample.nonEmpty, "isolation forest: empty fit sample")
    val dims = sample.head.length
    val rng = new java.util.Random(seed)
    val maxDepth = math.ceil(math.log(math.min(psi, sample.length)) / math.log(2)).toInt
    val nodes = (1 << (maxDepth + 1)) - 1
    val trees = Array.fill(nTrees) {
      val sub = Array.fill(math.min(psi, sample.length))(
        sample(rng.nextInt(sample.length)))
      val feat = Array.fill(nodes + 2 * nodes + 2)(0) // dense heap, padded
      val split = new Array[Double](feat.length)
      def build(i: Int, pts: Array[Array[Double]], depth: Int): Unit = {
        if (depth >= maxDepth || pts.length <= 1 ||
            2 * i + 2 >= feat.length) {
          feat(i) = -(pts.length + 1)
        } else {
          val f = rng.nextInt(dims)
          var lo = Double.MaxValue; var hi = Double.MinValue
          pts.foreach { p => if (p(f) < lo) lo = p(f); if (p(f) > hi) hi = p(f) }
          if (lo == hi) feat(i) = -(pts.length + 1)
          else {
            val sv = lo + rng.nextDouble() * (hi - lo)
            feat(i) = f; split(i) = sv
            build(2 * i + 1, pts.filter(_(f) < sv), depth + 1)
            build(2 * i + 2, pts.filter(_(f) >= sv), depth + 1)
          }
        }
      }
      build(0, sub, 0)
      Tree(feat, split)
    }
    Forest(trees, math.min(psi, sample.length))
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
