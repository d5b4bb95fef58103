package graft.operators

import graft.SparkSpecBase

class AnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("kHopCounts is BFS: nodes count at first hop only, cycles don't revisit") {
    // a→b, b→c, c→a (cycle back to seed), a→d, d→e
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "e"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("id")
    val got = Analysis.kHopCounts(edges, seeds, 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // hop1: {b,d}; hop2: {c,e} (a already visited); hop3: nothing new
    assert(got === Map(1 -> 2L, 2 -> 2L, 3 -> 0L))
  }

  test("globToLike translates * and ?, and rejects literal LIKE metacharacters") {
    assert(Analysis.globToLike("*widget*") === "%widget%")
    assert(Analysis.globToLike("?o*") === "_o%")
    // literal %/_ would need an ESCAPE clause whose default differs
    // between Spark and DuckDB — rejected instead of silently diverging
    val err = intercept[IllegalArgumentException](Analysis.globToLike("a%b_c"))
    assert(err.getMessage.contains("literal"))
  }

  test("wildcard policy: deny precedence blocks an otherwise-allowed name") {
    val rows = Analysis.q17Wildcard(spark, sf1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // pol_c allows '*' but denies '*widget*': strictly fewer than all parts
    val nParts = spark.read.parquet(s"$sf1/part.parquet").count()
    assert(rows("pol_c") > 0 && rows("pol_c") < nParts)
    // pol_a allows widgets minus 'small*' ones; disjoint from pol_c's set
    assert(rows("pol_a") > 0 && rows("pol_a") + rows("pol_c") <= nParts)
  }

  test("subzoneCounts: child counts once per ancestor level") {
    val zones = Seq("example", "a.example", "b.a.example").toDF("zone")
    val got = Analysis.subzoneCounts(zones, zones)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("example" -> 2L, "a.example" -> 1L))
  }

  test("salted join equals the plain join and spreads the head key across salts") {
    import org.apache.spark.sql.functions._
    // Zipf head: key "hot" on 90% of rows
    val skewed = (0 until 1000)
      .map(i => (if (i % 10 == 0) "cold" else "hot", i))
      .toDF("k", "payload")
    val dim = Seq(("hot", "H"), ("cold", "C"), ("unused", "U")).toDF("k", "v")
    val plain = skewed.join(dim, "k")
    val salted = Skew.saltedJoin(skewed, dim, "k", hash(col("payload")), 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
    // the head key's rows really do receive multiple distinct salts
    val saltsUsed = skewed.withColumn("_salt", pmod(hash(col("payload")), lit(8)))
      .filter(col("k") === "hot").select("_salt").distinct().count()
    assert(saltsUsed === 8L)
  }

  test("exposure propagation emits only sorted deduplicated tag sets") {
    val rows = Analysis.q20Exposure(spark, sf1).collect()
    rows.foreach { r =>
      val tags = r.getString(0).split(",").toSeq
      assert(tags === tags.sorted.distinct, s"unsorted/dup: ${r.getString(0)}")
      assert(tags.toSet.subsetOf(Set("europe", "lowbal")))
    }
  }
}
