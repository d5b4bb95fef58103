package graft.drift

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

/** File registry for drift states — the drift-detection directory layout
  * of the reference (cartography/driftdetect/get_states.py:99-128,
  * add_shortcut.py, cli.py):
  *
  * {{{
  * <drift-dir>/
  *   <query-dir>/                one directory per validation query
  *     template.json             {"name": ..., "validation_query": ...}
  *     <timestamp>.json          one captured state per run
  *     shortcut.json             {"shortcuts": {"most-recent": "<ts>.json", ...}}
  * }}}
  *
  * `capture` runs every query dir's template against the graph views and
  * writes a NEW timestamped state (two runs never overwrite each other),
  * updating the `most-recent` shortcut; `resolve` lets drift detection
  * name states by alias or filename; `addShortcut` registers
  * user-defined aliases (e.g. "pre-migration").
  *
  * Scale: registry files are bounded audit artifacts (the query results
  * are canonicalized drift states, not corpus data); all IO here is
  * driver-side metadata, exactly like the reference.
  */
object DriftRegistry {

  val TemplateFile = "template.json"
  val ShortcutFile = "shortcut.json"
  val MostRecent = "most-recent"

  private val mapper = new ObjectMapper()

  final case class Template(name: String, validationQuery: String)

  def loadTemplate(queryDir: String): Template = {
    val p = Paths.get(queryDir, TemplateFile)
    require(Files.isRegularFile(p), s"missing $TemplateFile in $queryDir")
    val root = mapper.readTree(Files.readString(p))
    require(root.hasNonNull("name") && root.hasNonNull("validation_query"),
      s"$p requires 'name' and 'validation_query'")
    Template(root.get("name").asText(), root.get("validation_query").asText())
  }

  /** Alias -> state-file name map; empty when no shortcut file exists. */
  def shortcuts(queryDir: String): Map[String, String] = {
    val p = Paths.get(queryDir, ShortcutFile)
    if (!Files.isRegularFile(p)) return Map.empty
    val root = mapper.readTree(Files.readString(p))
    Option(root.get("shortcuts")) match {
      case Some(s) => s.fieldNames().asScala
        .map(k => k -> s.get(k).asText()).toMap
      case None => Map.empty
    }
  }

  private def writeShortcuts(queryDir: String, m: Map[String, String]): Unit = {
    val root = mapper.createObjectNode()
    val s = root.putObject("shortcuts")
    m.toSeq.sortBy(_._1).foreach { case (k, v) => s.put(k, v): Unit }
    // tmp + ATOMIC_MOVE (the SnapshotTable.writeManifest convention): a
    // crash mid-write must not leave a truncated shortcut.json that
    // breaks every later registry call. The tmp name is UNIQUE per write
    // (createTempFile) so two concurrent writers can't race on one tmp
    // path — last mover wins atomically, neither throws.
    val tmp = Files.createTempFile(Paths.get(queryDir), s".$ShortcutFile.", ".tmp")
    Files.writeString(tmp,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    Files.move(tmp, Paths.get(queryDir, ShortcutFile),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Register `alias` -> `ref` (a filename or an existing alias,
    * resolved before saving — add_shortcut.py errors on dangling refs).
    */
  def addShortcut(queryDir: String, alias: String, ref: String): Unit = {
    val target = resolve(queryDir, ref)
    require(Files.isRegularFile(target),
      s"cannot add shortcut '$alias': state ${target.getFileName} does not exist")
    writeShortcuts(queryDir,
      shortcuts(queryDir) + (alias -> target.getFileName.toString))
  }

  /** A state reference is an alias first, a filename second. */
  def resolve(queryDir: String, ref: String): Path =
    Paths.get(queryDir, shortcuts(queryDir).getOrElse(ref, ref))

  /** Timestamped state files of a query dir, oldest first (numeric
    * order, NOT lexicographic — "9.json" predates "10.json").
    */
  def stateFiles(queryDir: String): Seq[Path] = {
    val d = Paths.get(queryDir)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try s.iterator().asScala
      .flatMap { p =>
        val n = p.getFileName.toString
        n.stripSuffix(".json").toLongOption
          .filter(_ => n.endsWith(".json")).map(ts => (ts, p))
      }
      .toSeq.sortBy(_._1).map(_._2)
    finally s.close()
  }

  /** Run one query dir's template over the session's registered views
    * and persist a NEW `<timestamp>.json` state; `most-recent` moves to
    * it. Refuses to silently overwrite a same-timestamp capture.
    */
  def captureState(spark: SparkSession, queryDir: String,
                   timestamp: Long): Path = {
    val t = loadTemplate(queryDir)
    val out = Paths.get(queryDir, s"$timestamp.json")
    require(!Files.exists(out),
      s"state $out already exists — pass a fresh --timestamp")
    val state = DriftStates.fromDataFrame(t.name, t.validationQuery,
      spark.sql(t.validationQuery))
    DriftStates.save(state, out.toString)
    writeShortcuts(queryDir,
      shortcuts(queryDir) + (MostRecent -> out.getFileName.toString))
    out
  }

  /** Capture every query dir (subdirs holding a template.json) under the
    * drift-detection root — get-state's run_get_states loop. Timestamp
    * collisions are pre-checked across ALL query dirs BEFORE any state
    * is written, so a clash cannot leave the registry partially updated
    * (some dirs captured, some not).
    */
  def captureAll(spark: SparkSession, driftDir: String,
                 timestamp: Long): Seq[Path] = {
    val dirs = queryDirs(driftDir)
    val clashes = dirs.filter(d => Files.exists(d.resolve(s"$timestamp.json")))
    require(clashes.isEmpty,
      s"state $timestamp.json already exists in ${clashes.mkString(", ")} — " +
        "pass a fresh --timestamp (nothing was captured)")
    dirs.map(d => captureState(spark, d.toString, timestamp))
  }

  def queryDirs(driftDir: String): Seq[Path] = {
    val d = Paths.get(driftDir)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p.resolve(TemplateFile)))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  /** Default drift pair: the two most recent captures (start = older). */
  def twoMostRecent(queryDir: String): (Path, Path) = {
    val files = stateFiles(queryDir)
    require(files.size >= 2,
      s"drift needs two captured states in $queryDir; found ${files.size}")
    (files(files.size - 2), files.last)
  }
}
