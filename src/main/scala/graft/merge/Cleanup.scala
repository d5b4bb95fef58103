package graft.merge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.snapshot.SnapshotTable

final case class CleanupStats(nodesDeleted: Long, edgesDeleted: Long)

/** Stale-fact deletion — the Spark-native rewrite of the reference's
  * generated cleanup jobs (cartography/graph/cleanupbuilder.py:15-56):
  *
  *  1. delete stale nodes of the schema's label attached to the current
  *     sub-resource: `lastupdated <> update_tag` scoped to the tenant
  *     (cleanupbuilder.py:123-129,150-169);
  *  2. DETACH: also drop every edge referencing a deleted node;
  *  3. delete stale sub-resource / other-rel edges of the schema's rel
  *     labels (cleanupbuilder.py:131-147).
  *
  * The reference executes this as an iterative LIMIT 100 delete loop
  * (statement.py:116-128, job.py:152-161) to bound Neo4j transaction
  * memory; set-oriented Spark needs no iteration — one declarative
  * anti-filter per table, committed as a new snapshot version.
  *
  * Scale: the node rewrite touches only the hash buckets of the schema's
  * label that contain stale rows, and the edge rewrite only the
  * (rel_label, bucket) partitions containing doomed edges
  * (SnapshotTable.commitPhysical) — the sub-resource scoping that keeps
  * the reference's cleanup from crossing tenants also keeps ours from
  * rewriting 100 TB. The deleted-id set used for DETACH is the stale
  * subset of one tenant, broadcast into the edge anti-joins.
  */
object Cleanup {

  /** The `<> update_tag` freshness predicate — preserved exactly. */
  private def stale(tag: Long) = col("lastupdated") =!= lit(tag)

  /** Property-clearing scan — the `REMOVE n.prop1, n.prop2` analog
    * (reference: data/jobs/analysis/aws_ec2_asset_exposure.json stmts 1-4,
    * which clear stale exposure flags before re-tagging). Removes the
    * given keys from the props map of every `label` node that matches
    * `predicate` AND holds at least one of the keys. Returns the number
    * of nodes cleared.
    *
    * Scale: bucket-precise like every other mutation — only the buckets
    * containing affected rows are rewritten; a no-op clear commits
    * nothing. The reference's iterative `WITH n LIMIT $LIMIT_SIZE` loop
    * (graph/job.py:152-161) exists to bound Neo4j transaction memory;
    * set-oriented Spark needs no iteration.
    */
  def clearProperties(spark: SparkSession, nodes: SnapshotTable,
                      label: String, props: Seq[String], updateTag: Long,
                      predicate: org.apache.spark.sql.Column = lit(true)): Long = {
    require(props.nonEmpty, "clearProperties requires at least one property name")
    val part = nodes.readPartition(label).getOrElse(return 0L)
    val holdsAny = props.map(p => element_at(col("props"), p).isNotNull)
      .reduce(_ || _)
    val affected = part.filter(predicate && holdsAny).cache()
    val n = affected.count()
    if (n > 0) {
      val touched = nodes.physicalValuesOf(affected)
      val dropKeys = array(props.map(lit): _*)
      val rewritten = nodes.readPhysical(touched)
        .getOrElse(sys.error("affected buckets vanished mid-clear"))
        .withColumn("props",
          when(predicate && holdsAny,
            map_filter(col("props"), (k, _) => !array_contains(dropKeys, k)))
            .otherwise(col("props")))
      nodes.commitPhysical(rewritten, updateTag, touched)
    }
    affected.unpersist()
    n
  }

  /** With `edgeIndex` (an [[EdgeEndpointIndex]] maintained on every edge
    * commit of this graph) the DETACH sweep reads ONLY the edge
    * partitions the index names for the deleted nodes — batch-
    * proportional instead of table-proportional. Without it, the sweep
    * falls back to the full-scan semi-join (correct at any scale, reads
    * everything once). Soundness is checked, not assumed: the index's
    * coverage marker must prove every edge commit was indexed, otherwise
    * this method warns and uses the full scan.
    */
  def run(spark: SparkSession, schema: NodeSchema,
          kwargs: Map[String, String], updateTag: Long,
          nodes: SnapshotTable, edges: SnapshotTable,
          edgeIndex: Option[EdgeEndpointIndex] = None): CleanupStats = {
    val subId = schema.subResource.map(sr => kwargs.getOrElse(sr.ref.name,
      sys.error(s"cleanup requires kwarg '${sr.ref.name}' — " +
        "sub-resource scoping is mandatory (cleanupbuilder.py:191-206)")))

    // The label-scoped read prunes to the label's buckets only.
    val part = nodes.readPartition(schema.label)
      .getOrElse(sys.error(s"no partition for label ${schema.label}"))
    val scope = subId match {
      case Some(id) => col("sub_resource_id") === lit(id)
      case None => lit(true)
    }
    // Tenant scope BEFORE deletion — used to scope the edge sweep so other
    // tenants' edges survive (the MATCH ...<-[:RESOURCE]-(:SubRes{id:$kwarg})
    // prefix of every generated cleanup query, cleanupbuilder.py:150-169).
    val tenantIds = part.filter(scope).select(col("id")).cache()
    val staleRows = part.filter(scope && stale(updateTag)).cache()
    val staleNodes = staleRows.select(col("id")).cache()
    val nDeleted = staleNodes.count()

    if (nDeleted > 0) {
      // bucket-precise: rewrite only the buckets that contain stale rows;
      // the label's other buckets carry forward by file reference
      val touched = nodes.physicalValuesOf(staleRows)
      val kept = nodes.readPhysical(touched)
        .getOrElse(sys.error("stale buckets vanished mid-cleanup"))
        .join(staleNodes.withColumnRenamed("id", "_sid"),
          col("id") === col("_sid"), "left_anti")
      nodes.commitPhysical(kept, updateTag, touched)
    }

    var eDeleted = 0L
    if (edges.exists) {
      val relSet = schema.relLabels.toSet
      // Every membership test below is TWO equi-semi-joins (src side,
      // dst side) unioned — an OR-of-equalities join condition cannot be
      // planned as a hash join and degrades to a nested loop over
      // |edges| × |ids|. No explicit broadcast: staleNodes is usually
      // small (AQE broadcasts it), but with no sub-resource scope
      // tenantIds is the WHOLE label — forcing it into a broadcast would
      // OOM at corpus scale, while a shuffled semi-join just works.
      def touching(base: DataFrame, ids: DataFrame, renamed: String): DataFrame = {
        val r = ids.withColumnRenamed("id", renamed)
        base.filter(col("src_label") === schema.label)
          .join(r, col("src_id") === col(renamed), "left_semi")
          .unionByName(
            base.filter(col("dst_label") === schema.label)
              .join(r, col("dst_id") === col(renamed), "left_semi"))
      }
      // detach: any edge touching a deleted node of this label. A
      // deleted node's edges can carry ANY rel_label and edge buckets
      // hash (src_id, dst_id) jointly, so without help neither side
      // prunes — the endpoint index names the exact partition subset.
      // The index path is gated on its coverage marker: if ANY edge
      // commit bypassed the index, soundForDetach is false and the sweep
      // falls back to the full scan (correct, just table-proportional)
      // instead of silently leaving dangling edges.
      val soundIndex = edgeIndex.filter(_.soundForDetach)
      if (edgeIndex.isDefined && soundIndex.isEmpty)
        System.err.println(s"[cleanup] endpoint index at " +
          s"${edgeIndex.get.table.root} does not cover every edge commit " +
          "(a commit ran without it, or it was attached mid-life without " +
          "rebuild) — falling back to the full-scan DETACH sweep")
      val detachState = soundIndex match {
        case Some(ix) if nDeleted > 0 =>
          edges.readPhysical(ix.edgePartitionsFor(schema.label, staleNodes))
            .getOrElse(GraphTables.emptyEdges(spark))
        case Some(_) => GraphTables.emptyEdges(spark) // nothing deleted
        case None if nDeleted > 0 => edges.read()
        case None => GraphTables.emptyEdges(spark) // nothing deleted
      }
      val detached = touching(detachState, staleNodes, "_sid")
      // stale rels of this schema's rel labels, scoped to this node label
      // AND to the tenant being synced. The labels are the table's
      // partition column — read ONLY those partitions (no index needed).
      val relState = relSet.toSeq.sorted.flatMap(edges.readPartition)
        .reduceOption(_ unionByName _)
        .getOrElse(GraphTables.emptyEdges(spark))
      val staleRelEdges = touching(relState.filter(stale(updateTag)),
        tenantIds, "_tid")
      val doomed = detached
        .unionByName(staleRelEdges)
        .dropDuplicates("src_label", "src_id", "rel_label", "dst_label", "dst_id")
        .cache()
      eDeleted = doomed.count()
      if (eDeleted > 0) {
        // bucket-precise: rewrite only the (rel_label, bucket) partitions
        // that contain doomed edges
        val touchedE = edges.physicalValuesOf(doomed)
        val keptE = edges.readPhysical(touchedE)
          .getOrElse(sys.error("doomed buckets vanished mid-cleanup"))
          .join(doomed.select(col("src_label").as("_dsl"), col("src_id").as("_dsi"),
            col("rel_label").as("_drl"), col("dst_label").as("_ddl"),
            col("dst_id").as("_ddi")),
            col("src_label") === col("_dsl") && col("src_id") === col("_dsi") &&
              col("rel_label") === col("_drl") && col("dst_label") === col("_ddl") &&
              col("dst_id") === col("_ddi"),
            "left_anti")
        val v = edges.commitPhysical(keptE, updateTag, touchedE)
        // a delete-only rewrite cannot break the index's superset
        // property — advance its coverage marker across this commit
        edgeIndex.foreach(_.coverDeleteCommit(v))
      }
      doomed.unpersist()
    }
    staleRows.unpersist(); staleNodes.unpersist(); tenantIds.unpersist()
    CleanupStats(nDeleted, eDeleted)
  }
}

