package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.SparkSpecBase
import graft.ann.Knn
import graft.functions.{FloatVecDot, VecOps}

/** The codegen dot-product Expression must be BIT-IDENTICAL to the
  * declarative HOF spelling it replaced (aggregate over zip_with, double
  * accumulation left-to-right) — cosine values feed rank orderings and
  * thresholds that the DuckDB oracles recompute independently.
  */
class VecOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) = {
    def d(x: org.apache.spark.sql.Column) = transform(x, v => v.cast("double"))
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  }

  test("FloatVecDot equals the HOF aggregate(zip_with) spelling bit-for-bit on random vectors") {
    val vecPair: Gen[(Array[Float], Array[Float])] = for {
      n <- Gen.choose(1, 96)
      a <- Gen.listOfN(n, Gen.chooseNum(-10f, 10f))
      b <- Gen.listOfN(n, Gen.chooseNum(-10f, 10f))
    } yield (a.toArray, b.toArray)

    val prop = Prop.forAll(Gen.listOfN(25, vecPair)) { pairs =>
      pairs.isEmpty || {
        val rows = pairs.toDF("a", "b")
          .select(VecOps.fvecDot(col("a"), col("b")).as("fused"),
            hofDot(col("a"), col("b")).as("hof"))
          .collect()
        rows.forall(r => java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(Seed(7L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("FloatVecDot interpreted eval matches the codegen DataFrame result; null array yields null") {
    val a = Array(1.5f, -2.25f, 3.125f)
    val b = Array(0.5f, 4.0f, -1.0f)
    val ft = org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)
    val expr = FloatVecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(ArrayData.toArrayData(a), ft),
      org.apache.spark.sql.catalyst.expressions.Literal.create(ArrayData.toArrayData(b), ft))
    val interp = expr.eval(InternalRow.empty).asInstanceOf[Double]
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(VecOps.fvecDot(col("a"), col("b"))).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(interp) ==
      java.lang.Double.doubleToLongBits(viaDf))
    assert(interp == (1.5 * 0.5 + -2.25 * 4.0 + 3.125 * -1.0))
    val withNull = Seq((a, Option.empty[Array[Float]])).toDF("a", "b")
      .select(VecOps.fvecDot(col("a"), col("b"))).head()
    assert(withNull.isNullAt(0))
  }

  test("Knn.cosine over the fixture embeddings matches the HOF cosine bit-for-bit") {
    def hofCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def d(x: org.apache.spark.sql.Column) = transform(x, v => v.cast("double"))
      val dot = aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val na = sqrt(aggregate(transform(d(a), x => x * x), lit(0.0), (acc, x) => acc + x))
      val nb = sqrt(aggregate(transform(d(b), x => x * x), lit(0.0), (acc, x) => acc + x))
      dot / (na * nb)
    }
    val emb = Knn.embeddings(spark, sf1).limit(200)
    val l = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val r = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val rows = l.join(r, col("ia") < col("ib") && col("ib") <= col("ia") + lit(3L))
      .select(Knn.cosine(col("ea"), col("eb")).as("fused"),
        hofCos(col("ea"), col("eb")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }
}
