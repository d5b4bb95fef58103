package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Graft
import graft.drift.DriftStates
import graft.kg.{AliasRow, KgPipeline, Page}
import graft.merge.GraphTables

/** Command-line front end — the `cartography` CLI analog
  * (cartography/cli.py: `--selected-modules`, `--update-tag`;
  * cartography/driftdetect/cli.py: `get-state` / `get-drift`). The
  * reference's primary UX is a CLI that wires config into the sync
  * driver; this main does the same over the Spark pipeline, so a
  * deployment is `spark-submit --class graft.tools.GraftCli ... sync
  * --input s3://pages --dict s3://aliases --work-dir s3://kg
  * --update-tag 42`.
  *
  * Subcommands:
  *  - `sync`      run (or resume) the KG pipeline: full, or an ordered
  *                stage subset via `--selected-modules`
  *  - `expire`    expire old snapshot versions of the graph + stage
  *                tables (`SnapshotTable.expireVersions`)
  *  - `get-state` run a SQL query over temp views `nodes`/`edges` of the
  *                graph and save the canonicalized drift state JSON
  *  - `drift`     both-direction diff of two saved states
  *
  * All input arrives as tables (parquet paths — the 100 TB shape); the
  * only driver-materialized structure is the size-checked Aho–Corasick
  * broadcast inside the pipeline.
  */
object GraftCli {

  private val usage: String =
    """usage:
      |  sync      --input PAGES.parquet --dict ALIASES.parquet --work-dir DIR
      |            --update-tag N [--selected-modules s1,s2,..]
      |            [--graph-buckets N] [--cores N]
      |  expire    --work-dir DIR --keep N
      |  get-state --work-dir DIR --name NAME --query SQL --out FILE [--cores N]
      |  drift     --start FILE --end FILE
      |""".stripMargin

  /** `--key value` pairs -> map; unknown/malformed flags fail fast. */
  private def parseFlags(args: Seq[String]): Map[String, String] = {
    require(args.size % 2 == 0, s"dangling flag in: ${args.mkString(" ")}\n$usage")
    args.grouped(2).map {
      case Seq(k, v) =>
        require(k.startsWith("--"), s"expected a --flag, got '$k'\n$usage")
        k.stripPrefix("--") -> v
    }.toMap
  }

  private def req(flags: Map[String, String], key: String): String =
    flags.getOrElse(key, sys.error(s"missing required --$key\n$usage"))

  /** Explicit `--cores N` forces a local[N] session; otherwise a master
    * configured by spark-submit (`--master yarn/k8s` sets `spark.master`)
    * is respected — hard-coding `.master()` would override it and
    * silently run a cluster job single-node on the driver. With neither,
    * default to local[16] (this sandbox's sweet spot).
    */
  private def session(flags: Map[String, String], app: String): SparkSession =
    flags.get("cores") match {
      case Some(c) => Graft.session(s"local[$c]", c.toInt, app)
      case None if sys.props.contains("spark.master") => Graft.submitSession(app)
      case None => Graft.session("local[16]", 16, app)
    }

  def main(args: Array[String]): Unit = args.toSeq match {
    case "sync" +: rest => sync(parseFlags(rest))
    case "expire" +: rest => expire(parseFlags(rest))
    case "get-state" +: rest => getState(parseFlags(rest))
    case "drift" +: rest => drift(parseFlags(rest))
    case other => sys.error(s"unknown command: ${other.mkString(" ")}\n$usage")
  }

  private def sync(flags: Map[String, String]): Unit = {
    val spark = session(flags, "graft-cli-sync")
    import spark.implicits._
    val workDir = req(flags, "work-dir")
    val tag = req(flags, "update-tag").toLong
    val buckets = flags.getOrElse("graph-buckets",
      GraphTables.DefaultBuckets.toString).toInt
    val pipe = new KgPipeline(spark, workDir, buckets)
    val pages = spark.read.parquet(req(flags, "input")).as[Page]
    val dict = spark.read.parquet(req(flags, "dict")).as[AliasRow]
    flags.get("selected-modules") match {
      case Some(sel) => pipe.runStages(pages, dict, tag, sel)
      case None => pipe.run(pages, dict, tag, mergeGraph = true): Unit
    }
  }

  /** Expire graph + stage snapshot versions under a work dir. Stage
    * tables only ever need their latest version (resume reads the last
    * commit per tag), so they expire to `keep` as well.
    */
  private def expire(flags: Map[String, String]): Unit = {
    val spark = session(flags, "graft-cli-expire")
    val workDir = req(flags, "work-dir")
    val keep = req(flags, "keep").toInt
    val tables =
      Seq("graph/nodes" -> GraphTables.nodes(spark, s"$workDir/graph"),
        "graph/edges" -> GraphTables.edges(spark, s"$workDir/graph")) ++
        KgPipeline.StageNames.map(s =>
          s"stage_$s" -> graft.snapshot.SnapshotTable(spark, s"$workDir/stage_$s", None))
    tables.foreach { case (name, t) =>
      if (t.exists) {
        val (expired, deleted) = t.expireVersions(keep)
        System.err.println(
          s"[expire] $name: expired versions ${expired.mkString(",")}; " +
            s"deleted ${deleted.size} data dirs")
      }
    }
  }

  private def getState(flags: Map[String, String]): Unit = {
    val spark = session(flags, "graft-cli-state")
    val workDir = req(flags, "work-dir")
    val query = req(flags, "query")
    GraphTables.nodes(spark, s"$workDir/graph").read()
      .createOrReplaceTempView("nodes")
    GraphTables.edges(spark, s"$workDir/graph").read()
      .createOrReplaceTempView("edges")
    val state = DriftStates.fromDataFrame(req(flags, "name"), query,
      spark.sql(query))
    DriftStates.save(state, req(flags, "out"))
  }

  private def drift(flags: Map[String, String]): Unit = {
    val start = DriftStates.load(req(flags, "start"))
    val end = DriftStates.load(req(flags, "end"))
    val (added, removed) = DriftStates.performDriftDetection(start, end)
    println(DriftStates.diffJson(added, removed))
  }
}
