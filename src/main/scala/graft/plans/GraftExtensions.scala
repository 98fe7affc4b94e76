package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions wiring (SURVEY §2 F3).
  *
  * Lets a deployment enable graft's native expressions cluster-wide via
  * `spark.sql.extensions=graft.plans.GraftExtensions` — no per-session
  * registration call needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Number].intValue()
        }
        MinHashSig(exprs(0), k)
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs(0))))
    // F6 — opt-in approximate-rewrite rule (no-op unless
    // spark.graft.approx.rewrite=true)
    e.injectOptimizerRule(session => ApproxRewrite(session))
    // F8 — rollup-aware aggregate rewrite (no-op unless
    // spark.graft.rollup.root points at an A14 summary store)
    e.injectOptimizerRule(session => RollupRewrite(session))
  }
}
