package graft.drift

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** A named, canonicalized query-result snapshot — the drift-detection
  * State analog (cartography/driftdetect/model.py via get_states.py:
  * 130-161): `properties` are the result's column names, `results` the
  * row values canonicalized exactly like the reference:
  * list-valued fields become `sorted.mkString("|")`, everything else its
  * string form, and rows are sorted.
  */
final case class DriftState(name: String, validationQuery: String,
                            properties: Seq[String],
                            results: Seq[Seq[String]])

object DriftStates {

  private val mapper = new ObjectMapper()

  /** Canonicalize a query result into a state (get_state,
    * get_states.py:130-161). Array columns sort + join with "|"; null
    * prints as "None" would in the reference — here the literal "null".
    * Runs collect() by design: a drift state is a bounded audit artifact
    * (the reference stores it as a JSON file), not corpus-sized data.
    */
  def fromDataFrame(name: String, validationQuery: String,
                    df: DataFrame): DriftState = {
    val props = df.columns.toSeq
    val canonCols = df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          array_join(sort_array(col(f.name).cast("array<string>")), "|")
        case _: org.apache.spark.sql.types.MapType =>
          // a map's render order depends on how it was built (insert vs
          // merge path) — canonicalize to sorted k=v pairs or two
          // captures of identical state would diff spuriously
          array_join(sort_array(transform(map_entries(col(f.name)),
            e => concat(e.getField("key").cast("string"), lit("="),
              e.getField("value").cast("string")))), "|")
        case _ => col(f.name).cast("string")
      }
    }
    val rows = df.select(canonCols.toIndexedSeq: _*).collect().map { r: Row =>
      (0 until r.length).map(i => if (r.isNullAt(i)) "null" else r.getString(i))
    }
    DriftState(name, validationQuery, props,
      rows.sortBy(_.mkString("\u0000")).toSeq)
  }

  // ---- (de)serialization ---------------------------------------------------

  def toJson(s: DriftState): String = {
    val root = mapper.createObjectNode()
    root.put("name", s.name)
    root.put("validation_query", s.validationQuery)
    val p = root.putArray("properties")
    s.properties.foreach(p.add)
    val r = root.putArray("results")
    s.results.foreach { row =>
      val a = r.addArray(); row.foreach(a.add)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): DriftState = {
    val root = mapper.readTree(json)
    DriftState(
      root.get("name").asText(),
      root.get("validation_query").asText(),
      root.get("properties").elements().asScala.map(_.asText()).toSeq,
      root.get("results").elements().asScala
        .map(_.elements().asScala.map(_.asText()).toSeq).toSeq)
  }

  /** Compact JSON of a both-direction diff — Jackson-escaped (result
    * cells are arbitrary query values; hand-rolled concatenation would
    * emit invalid JSON on quotes/backslashes).
    */
  def diffJson(added: Seq[Seq[String]], removed: Seq[Seq[String]]): String = {
    val root = mapper.createObjectNode()
    Seq("new_results" -> added, "missing_results" -> removed).foreach {
      case (name, rows) =>
        val a = root.putArray(name)
        rows.foreach { row => val r = a.addArray(); row.foreach(r.add) }
    }
    mapper.writeValueAsString(root)
  }

  def save(s: DriftState, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson(s))

  def load(path: String): DriftState =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  // ---- drift detection -----------------------------------------------------

  /** Both-direction diff with the reference's validation gates
    * (detect_deviations.py:66-112): names, validation queries and
    * property lists must match EXACTLY before any comparison; then
    * (new results in end but not start, missing results in start but
    * not end).
    */
  def performDriftDetection(start: DriftState, end: DriftState)
      : (Seq[Seq[String]], Seq[Seq[String]]) = {
    if (start.name != end.name)
      throw new IllegalArgumentException("State names do not match.")
    if (start.validationQuery != end.validationQuery)
      throw new IllegalArgumentException("State queries do not match.")
    if (start.properties != end.properties)
      throw new IllegalArgumentException("State properties do not match.")
    (compareStates(start, end), compareStates(end, start))
  }

  /** Rows of `end` absent from `start` (compare_states). */
  private def compareStates(start: DriftState, end: DriftState): Seq[Seq[String]] = {
    val seen = start.results.toSet
    end.results.filterNot(seen)
  }
}
