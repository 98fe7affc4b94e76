package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §5): salted equi-join.
  *
  * When one join key carries a disproportionate share of rows (a hot
  * user, a default value), a hash join sends the whole hot key to one
  * task. Salting splits the hot key's rows across `buckets` sub-keys:
  * the large side gets a deterministic salt derived from its whole row,
  * the small side is replicated once per salt value, and the join runs
  * on (key, salt) — the hot key now occupies `buckets` tasks.
  * AQE's skew-join handles moderate skew automatically; explicit salting
  * is the control for the extreme single-key case.
  */
object Skew {

  val saltCol = "__graft_salt"

  /** Inner equi-join on a shared column name, salted. `big` is the
    * skewed side (salted), `small` the replicated side (×buckets rows —
    * keep it the dimension side).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val salted = big.withColumn(saltCol,
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(buckets)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
