package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates whose SKETCH STATE is exact and
  * engine-reproducible. The estimate a sketch yields is approximate by
  * design, but the registers it is derived from are pure integer
  * functions of the input — so correctness is checkable value-for-value
  * against an independent engine even though the answer is an estimate.
  */
object Sketches {

  /** HyperLogLog register table over `key`: 256 registers addressed by
    * the first md5 byte, each holding the MAX of rank = 1 + (leading
    * zero bits of the next 60 md5 bits). Every value is integer-exact:
    * the leading-zero count is computed with string arithmetic on the
    * hex digest (zero-digit count ×4 plus a first-digit CASE), no
    * floats anywhere, so two engines hashing the same keys produce
    * byte-identical registers.
    *
    * This is THE cardinality operator for 100 TB: per-partition state
    * is 256 bytes-ish regardless of input size, `max` combines
    * map-side, and the final shuffle moves ≤256 rows per partition —
    * where an exact `COUNT(DISTINCT)` shuffles every distinct key.
    * Duplicate keys hash identically, so they cannot move a register:
    * the sketch depends only on the distinct key set. `n_keys` (input
    * rows landing in the bucket) is reported for the oracle check, not
    * used by the estimator.
    */
  def hllRegisters(df: DataFrame, key: String): DataFrame =
    df.select(md5(col(key).cast("string")).as("h"))
      .select(
        expr("cast(conv(substring(h, 1, 2), 16, 10) as bigint)").as("bucket"),
        expr("trim(LEADING '0' FROM substring(h, 3, 15))").as("t"))
      .select(col("bucket"),
        (lit(60L) - length(col("t")).cast("long") * 4L +
          expr("""CASE substring(t, 1, 1)
                 | WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                 | WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                 | WHEN '7' THEN 1 ELSE 0 END""".stripMargin).cast("long") +
          1L).as("rank"))
      .groupBy("bucket")
      .agg(max(col("rank")).as("max_rank"), count(lit(1)).as("n_keys"))
      .orderBy("bucket")

  /** Standard HLL estimate from a [[hllRegisters]] table (collected —
    * 256 rows). Raw estimate αm·m²/Σ2^(−reg), with the small-range
    * linear-counting correction when raw ≤ 2.5m and empty registers
    * exist. Deterministic given the registers; typical error with m=256
    * is ~1/√m ≈ 6.5%.
    */
  def hllEstimate(registers: Map[Long, Long], m: Int = 256): Double = {
    require(registers.keys.forall(b => b >= 0 && b < m), "bucket out of range")
    val zeros = m - registers.count(_._2 > 0)
    val sum = (0 until m.toInt)
      .map(b => math.pow(2.0, -registers.getOrElse(b.toLong, 0L).toDouble)).sum
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
