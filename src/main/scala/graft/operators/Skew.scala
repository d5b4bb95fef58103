package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-defusing join helpers (SURVEY.md §4 "skew"): when the probe side
  * has Zipf-headed keys (a head entity on 30% of rows) and the build
  * side is too large to broadcast, a plain shuffle join sends every
  * head-key row to one reducer. Salting splits each key's rows across
  * `salts` partitions by a second, well-distributed expression, and
  * replicates the (small-but-not-broadcastable) build side once per
  * salt. AQE's skew-join splitting is the runtime backstop; salting is
  * the declarative fix when the skew is known.
  */
object Skew {

  /** Equi-join `skewed ⋈ dim` on `key`, with `skewed` additionally
    * partitioned by `saltExpr mod salts` and `dim` replicated per salt.
    * Result equals the plain inner join (verified by spec).
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 saltExpr: Column, salts: Int): DataFrame = {
    val salted = skewed.withColumn("_salt", pmod(saltExpr, lit(salts)))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
