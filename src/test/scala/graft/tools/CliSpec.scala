package graft.tools

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.kg.Corpus
import graft.merge.GraphTables

/** End-to-end CLI lifecycle over parquet-backed inputs: sync (full and
  * stage-subset), drift get-state/detect across two syncs, and snapshot
  * expiry — the `cartography` / `cartography-detectdrift` CLI analog.
  */
class CliSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("cli: sync -> get-state -> bigger sync -> drift -> expire") {
    val in = tmp("cliin")
    val work = tmp("cliwork")
    Corpus.pages(spark, sf, 1, 0).write.parquet(s"$in/pages1")
    Corpus.pages(spark, sf, 2, 0).write.parquet(s"$in/pages2")
    Corpus.aliasRows.toDS().write.parquet(s"$in/dict")

    GraftCli.main(Array("sync", "--input", s"$in/pages1", "--dict", s"$in/dict",
      "--work-dir", work, "--update-tag", "100"))
    val nodes = GraphTables.nodes(spark, s"$work/graph")
    val pages1 = nodes.read().filter(col("label") === "Page").count()
    assert(pages1 === 500L)

    val q = "SELECT label, count(*) AS n FROM nodes GROUP BY label ORDER BY label"
    GraftCli.main(Array("get-state", "--work-dir", work, "--name", "label-counts",
      "--query", q, "--out", s"$work/state_a.json"))

    // day 2: a doubled input (superset urls) under a fresh tag
    GraftCli.main(Array("sync", "--input", s"$in/pages2", "--dict", s"$in/dict",
      "--work-dir", work, "--update-tag", "200"))
    assert(nodes.read().filter(col("label") === "Page").count() === 1000L)
    assert(nodes.versions.size >= 2, "second sync must commit a new version")

    GraftCli.main(Array("get-state", "--work-dir", work, "--name", "label-counts",
      "--query", q, "--out", s"$work/state_b.json"))

    val out = new ByteArrayOutputStream()
    Console.withOut(out) {
      GraftCli.main(Array("drift", "--start", s"$work/state_a.json",
        "--end", s"$work/state_b.json"))
    }
    val drift = out.toString.trim
    assert(drift.contains(""""new_results":[["Page","1000"]]"""), drift)
    assert(drift.contains(""""missing_results":[["Page","500"]]"""), drift)

    val before = nodes.read().filter(col("label") === "Page")
      .select("id", "firstseen", "lastupdated")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    GraftCli.main(Array("expire", "--work-dir", work, "--keep", "1"))
    assert(nodes.versions.size === 1)
    assert(nodes.read().filter(col("label") === "Page")
      .select("id", "firstseen", "lastupdated")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet === before,
      "expire must not change the latest graph")
  }

  test("cli: stage-subset sync commits only the selected stages; bad input fails fast") {
    val in = tmp("cliin2")
    val work = tmp("cliwork2")
    Corpus.pages(spark, sf, 1, 0).write.parquet(s"$in/pages")
    Corpus.aliasRows.toDS().write.parquet(s"$in/dict")

    GraftCli.main(Array("sync", "--input", s"$in/pages", "--dict", s"$in/dict",
      "--work-dir", work, "--update-tag", "100",
      "--selected-modules", "extract,facts"))
    assert(Files.isDirectory(java.nio.file.Paths.get(s"$work/stage_facts")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$work/graph")),
      "merge must not run when not selected")

    val bad = intercept[IllegalArgumentException] {
      GraftCli.main(Array("sync", "--input", s"$in/pages", "--dict", s"$in/dict",
        "--work-dir", work, "--update-tag", "100",
        "--selected-modules", "extract,nope"))
    }
    assert(bad.getMessage.contains("selected_modules"))

    intercept[RuntimeException](GraftCli.main(Array("frobnicate")))
    intercept[RuntimeException](GraftCli.main(Array("expire", "--work-dir", work)))
  }
}
