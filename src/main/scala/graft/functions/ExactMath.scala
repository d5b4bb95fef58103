package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-reproducible elementary math built from IEEE +,−,*,/ and
  * integer bit arithmetic ONLY.
  *
  * Why: libm transcendentals are correctly rounded to ~1 ulp but
  * implementations legitimately disagree in the last bit — measured
  * here, Spark's `log()` (JVM StrictMath.log) and DuckDB's `ln()`
  * (glibc) differ on ~2% of inputs. An operator whose oracle replays
  * `ln` therefore value-matches only by luck of the input set. IEEE
  * basic ops carry no such latitude: every engine computes the same
  * double for the same association. So operators that need a log get
  * THIS polynomial as their documented contract (the qann3 trade:
  * explicit arithmetic instead of a platform primitive buys
  * cross-engine value equality; the cost is ~1e-11 absolute error,
  * statistically irrelevant to sampling and ranking).
  */
object ExactMath {

  /** Nearest double to ln 2. */
  val Ln2 = 0.6931471805599453

  private val InvOdds = Seq(
    0.3333333333333333, // 1/3
    0.2, // 1/5
    0.14285714285714285, // 1/7
    0.1111111111111111, // 1/9
    0.09090909090909091, // 1/11
    0.07692307692307693, // 1/13
    0.06666666666666667, // 1/15
    0.058823529411764705, // 1/17
    0.05263157894736842) // 1/19

  /** ln of a POSITIVE INTEGER column (1 ≤ n ≤ 2⁵²): range-reduce by bit
    * length — m = n / 2^(bl−1) ∈ [1, 2), exact (power-of-two division)
    * — then the atanh series 2z·(1 + z²(1/3 + z²(1/5 + … z²/19))) with
    * z = (m−1)/(m+1) ≤ 1/3, fixed Horner association. Absolute error
    * < 1e-11, and monotone in n: the truncated series underestimates,
    * so n just below a power of two stays below the exact (bl)·ln2 at
    * it. `pow(2, k)` is exact for integer k (documented for Math.pow
    * and true of every libm for representable powers of two).
    */
  def lnOfInt(n: Column): Column = {
    val bl = length(conv(n.cast("string"), 10, 2)) // bit length of n
    val m = n.cast("double") / pow(lit(2.0), (bl - 1).cast("double"))
    val z = (m - 1.0) / (m + 1.0)
    val z2 = z * z
    val series = InvOdds.reverse
      .foldLeft(null: Column) { (acc, c) =>
        if (acc == null) lit(c) else lit(c) + z2 * acc
      }
    (bl - 1).cast("double") * Ln2 +
      lit(2.0) * z * (lit(1.0) + z2 * series)
  }

  /** The DuckDB spelling of [[lnOfInt]], staged so the oracle binds the
    * intermediates as CTE columns (one textual copy each — a single
    * substituted expression would duplicate the input ~70×):
    *
    * {{{
    * a AS (SELECT …, <n> AS n FROM …),
    * b AS (SELECT *, ${blSql("n")} AS bl FROM a),
    * c AS (SELECT *, ${mSql("n", "bl")} AS mm FROM b),
    * d AS (SELECT *, ${zSql("mm")} AS z FROM c),
    * e AS (SELECT *, z * z AS z2 FROM d),
    * f AS (SELECT *, ${lnFromPartsSql()} AS lnn FROM e)
    * }}}
    *
    * Same literals, same association as the Column form → bit-identical
    * doubles in both engines.
    */
  def blSql(n: String): String = s"length(printf('%b', $n))"

  def mSql(n: String, bl: String): String =
    s"(CAST($n AS DOUBLE) / power(CAST(2.0 AS DOUBLE), CAST($bl - 1 AS DOUBLE)))"

  def zSql(m: String): String =
    s"(($m - CAST(1.0 AS DOUBLE)) / ($m + CAST(1.0 AS DOUBLE)))"

  def lnFromPartsSql(bl: String = "bl", z: String = "z",
                     z2: String = "z2"): String = {
    val series = InvOdds.reverse
      .foldLeft(null: String) { (acc, c) =>
        if (acc == null) s"CAST($c AS DOUBLE)"
        else s"(CAST($c AS DOUBLE) + $z2 * $acc)"
      }
    s"(CAST($bl - 1 AS DOUBLE) * CAST($Ln2 AS DOUBLE) + " +
      s"CAST(2.0 AS DOUBLE) * $z * (CAST(1.0 AS DOUBLE) + $z2 * $series))"
  }

  /** Plain-Scala reference of [[lnOfInt]] for specs — the identical
    * association on JVM doubles.
    */
  def lnOfIntRef(n: Long): Double = {
    require(n >= 1, s"lnOfInt domain is positive integers, got $n")
    val bl = java.lang.Long.toBinaryString(n).length
    val m = n.toDouble / math.pow(2.0, (bl - 1).toDouble)
    val z = (m - 1.0) / (m + 1.0)
    val z2 = z * z
    val series = InvOdds.reverse.foldLeft(Double.NaN) { (acc, c) =>
      if (acc.isNaN) c else c + z2 * acc
    }
    (bl - 1).toDouble * Ln2 + 2.0 * z * (1.0 + z2 * series)
  }
}
