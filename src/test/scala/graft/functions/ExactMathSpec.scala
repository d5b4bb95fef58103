package graft.functions

import graft.SparkSpecBase

class ExactMathSpec extends SparkSpecBase {
  import spark.implicits._

  test("lnOfInt: column form equals the Scala reference bitwise; error < 1e-10; monotone incl. power-of-two boundaries") {
    val ns = (1L to 4096L) ++
      Seq(4294967295L, 4294967296L, 4294967297L, (1L << 40) - 1, 1L << 40)
    val got = Sketchless.lnCol(spark, ns)
    ns.zip(got).foreach { case (n, v) =>
      assert(v === ExactMath.lnOfIntRef(n), s"n=$n")
      assert(math.abs(v - math.log(n.toDouble)) < 1e-10, s"n=$n err")
    }
    // monotone in n — in particular across 2^k boundaries where the
    // range reduction switches
    got.zip(got.tail).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a < b, s"not monotone at n=${ns(i)}")
    }
  }
}

/** Helper: evaluate the Column form over a list of longs. */
private object Sketchless {
  def lnCol(spark: org.apache.spark.sql.SparkSession,
            ns: Seq[Long]): Seq[Double] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    ns.toDF("n").withColumn("v", ExactMath.lnOfInt(col("n")))
      .orderBy("n").select("v").as[Double].collect().toSeq
  }
}
