package graft.operators

import graft.{SparkSpecBase, SparkEntry}

class RelationalSpec extends SparkSpecBase {

  test("every registered query runs at sf0.001 and yields rows") {
    val empties = Seq.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf1)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      info(s"$name -> $n rows")
    }
  }

  test("q1 pricing summary has the 4-way group structure and positive sums") {
    val rows = Relational.q1PricingSummary(spark, sf1).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Double]("sum_qty") > 0))
    assert(rows.forall(r => r.getAs[Long]("count_order") > 0))
  }

  test("q6 window keeps exactly one order per customer, the max one") {
    val top = Relational.q6WindowTopOrder(spark, sf1)
    val perCust = top.groupBy("o_custkey").count().filter("count > 1").count()
    assert(perCust === 0)
  }

  test("q11 ignore-case join matches every nation exactly once") {
    val rows = Relational.q11IgnoreCaseJoin(spark, sf1).collect()
    val nNations = spark.read.parquet(s"$sf1/nation.parquet").count()
    assert(rows.length.toLong === nNations)
  }
}
