package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.model._
import graft.snapshot.SnapshotTable

/** Ports the reference's integration-test patterns (set-equality node/rel
  * assertions, tests/integration/util.py:11-61; staleness scenario,
  * tests/integration/cartography/intel/aws/test_emr.py:25-105) onto the
  * Spark merge engine, plus the FIXTURES.md §5 scenarios.
  */
class GraphMergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graftmerge").toString

  private def nodesOf(t: SnapshotTable): Set[(String, String, Long, Long)] =
    t.read().select("label", "id", "firstseen", "lastupdated")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

  private def relsOf(t: SnapshotTable): Set[(String, String, String, String, String)] =
    t.read().select("src_label", "src_id", "rel_label", "dst_label", "dst_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toSet

  private val accountSchema = NodeSchema(
    label = "Account", idRef = RowRef("aid"),
    properties = Map("name" -> RowRef("name")))

  private val assetSchema = NodeSchema(
    label = "Asset", idRef = RowRef("id"),
    properties = Map("name" -> RowRef("name"), "region" -> KwargRef("region")),
    extraLabels = Seq("Resource"),
    subResource = Some(SubResourceRel(targetLabel = "Account",
      ref = KwargRef("account_id"))),
    otherRels = Seq(
      RelSchema("USES", "Asset", LinkDirection.Outward,
        Seq(TargetMatcher("id", RowRef("uses_id"))))))

  test("upsert preserves firstseen and advances lastupdated (scenario 1)") {
    val root = tmp()
    val nodes = SnapshotTable(spark, s"$root/nodes", Some("label"))
    val edges = SnapshotTable(spark, s"$root/edges", Some("rel_label"))
    val accounts = Seq(("acct1", "prod")).toDF("aid", "name")
    GraphMerge.load(spark, accounts, accountSchema, Map.empty, 100L, nodes, edges)

    val b1 = Seq(("a1", "alpha", null.asInstanceOf[String]),
                 ("a2", "beta", "a1")).toDF("id", "name", "uses_id")
    GraphMerge.load(spark, b1, assetSchema,
      Map("account_id" -> "acct1", "region" -> "us-east-1"), 100L, nodes, edges)

    // overlapping reload at T2 with a renamed a2 and a new a3
    val b2 = Seq(("a2", "beta2", "a1"), ("a3", "gamma", "a2"))
      .toDF("id", "name", "uses_id")
    GraphMerge.load(spark, b2, assetSchema,
      Map("account_id" -> "acct1", "region" -> "us-east-1"), 200L, nodes, edges)

    assert(nodesOf(nodes) === Set(
      ("Account", "acct1", 100L, 100L),
      ("Asset", "a1", 100L, 100L),   // untouched by b2
      ("Asset", "a2", 100L, 200L),   // firstseen preserved, lastupdated advanced
      ("Asset", "a3", 200L, 200L)))
    // renamed prop won
    val a2name = nodes.read().filter($"id" === "a2")
      .select(element_at($"props", "name")).head().getString(0)
    assert(a2name === "beta2")
    // kwarg-bound prop present
    val a3region = nodes.read().filter($"id" === "a3")
      .select(element_at($"props", "region")).head().getString(0)
    assert(a3region === "us-east-1")
    assert(relsOf(edges) === Set(
      ("Account", "acct1", "RESOURCE", "Asset", "a1"),
      ("Account", "acct1", "RESOURCE", "Asset", "a2"),
      ("Account", "acct1", "RESOURCE", "Asset", "a3"),
      ("Asset", "a2", "USES", "Asset", "a1"),
      ("Asset", "a3", "USES", "Asset", "a2")))
    // edge firstseen preserved across reload
    val usesA1 = edges.read().filter($"rel_label" === "USES" && $"dst_id" === "a1")
      .select("firstseen", "lastupdated").head()
    assert((usesA1.getLong(0), usesA1.getLong(1)) === (100L, 200L))
  }

  test("sub-resource attach skips silently when container absent") {
    val root = tmp()
    val nodes = SnapshotTable(spark, s"$root/nodes", Some("label"))
    val edges = SnapshotTable(spark, s"$root/edges", Some("rel_label"))
    val b = Seq(("a1", "alpha", null.asInstanceOf[String])).toDF("id", "name", "uses_id")
    val stats = GraphMerge.load(spark, b, assetSchema,
      Map("account_id" -> "ghost", "region" -> "r"), 100L, nodes, edges)
    assert(stats.nodesUpserted === 1L)
    assert(stats.edgesUpserted === 0L)
    assert(nodesOf(nodes).map(_._2) === Set("a1"))
  }

  test("cleanup deletes stale tenant-scoped facts, spares other tenants (scenario 2)") {
    val root = tmp()
    val nodes = SnapshotTable(spark, s"$root/nodes", Some("label"))
    val edges = SnapshotTable(spark, s"$root/edges", Some("rel_label"))
    GraphMerge.load(spark, Seq(("acct1", "p"), ("acct2", "q")).toDF("aid", "name"),
      accountSchema, Map.empty, 100L, nodes, edges)
    def loadAssets(ids: Seq[String], acct: String, tag: Long): Unit =
      GraphMerge.load(spark,
        ids.map(i => (i, s"n-$i", null.asInstanceOf[String])).toDF("id", "name", "uses_id"),
        assetSchema, Map("account_id" -> acct, "region" -> "r"), tag, nodes, edges)

    loadAssets(Seq("x1", "x2"), "acct1", 100L)
    loadAssets(Seq("y1"), "acct2", 100L)
    // re-sync acct1 at T2 with x2 gone
    loadAssets(Seq("x1"), "acct1", 200L)
    val stats = Cleanup.run(spark, assetSchema, Map("account_id" -> "acct1"),
      200L, nodes, edges)
    assert(stats.nodesDeleted === 1L)
    val ids = nodesOf(nodes).map(_._2)
    assert(ids.contains("x1") && !ids.contains("x2"))
    assert(ids.contains("y1"), "other tenant must be untouched (test_emr.py:72-105)")
    assert(relsOf(edges) === Set(
      ("Account", "acct1", "RESOURCE", "Asset", "x1"),
      ("Account", "acct2", "RESOURCE", "Asset", "y1")))
  }

  test("one-to-many matcher attaches a row to every listed target (scenario 3)") {
    val root = tmp()
    val nodes = SnapshotTable(spark, s"$root/nodes", Some("label"))
    val edges = SnapshotTable(spark, s"$root/edges", Some("rel_label"))
    val groupSchema = NodeSchema("Group", RowRef("gid"),
      properties = Map("name" -> RowRef("name")))
    GraphMerge.load(spark, Seq(("g1", "g"), ("g2", "h"), ("g3", "i")).toDF("gid", "name"),
      groupSchema, Map.empty, 1L, nodes, edges)
    val memberSchema = NodeSchema("User", RowRef("uid"),
      otherRels = Seq(RelSchema("MEMBER_OF", "Group", LinkDirection.Outward,
        Seq(TargetMatcher("id", RowRef("group_ids"), MatchMode.OneToMany)))))
    val users = Seq(("u1", Seq("g1", "g3"))).toDF("uid", "group_ids")
    GraphMerge.load(spark, users, memberSchema, Map.empty, 1L, nodes, edges)
    assert(relsOf(edges) === Set(
      ("User", "u1", "MEMBER_OF", "Group", "g1"),
      ("User", "u1", "MEMBER_OF", "Group", "g3")))
  }

  test("ignore_case and fuzzy contains matchers") {
    val root = tmp()
    val nodes = SnapshotTable(spark, s"$root/nodes", Some("label"))
    val edges = SnapshotTable(spark, s"$root/edges", Some("rel_label"))
    val empSchema = NodeSchema("Employee", RowRef("eid"),
      properties = Map("email" -> RowRef("email")))
    GraphMerge.load(spark,
      Seq(("e1", "Alice@Corp.COM"), ("e2", "bob-dev@corp.com")).toDF("eid", "email"),
      empSchema, Map.empty, 1L, nodes, edges)
    val ghSchema = NodeSchema("GithubUser", RowRef("gid"),
      otherRels = Seq(
        RelSchema("IDENTITY", "Employee", LinkDirection.Outward,
          Seq(TargetMatcher("email", RowRef("email"), MatchMode.IgnoreCase))),
        RelSchema("FUZZY_ID", "Employee", LinkDirection.Outward,
          Seq(TargetMatcher("email", RowRef("handle"), MatchMode.FuzzyContains)))))
    GraphMerge.load(spark,
      Seq(("gh1", "alice@corp.com", "zzz"), ("gh2", "none@none", "BOB-DEV")).toDF("gid", "email", "handle"),
      ghSchema, Map.empty, 1L, nodes, edges)
    val rels = relsOf(edges)
    assert(rels.contains(("GithubUser", "gh1", "IDENTITY", "Employee", "e1")))
    assert(rels.contains(("GithubUser", "gh2", "FUZZY_ID", "Employee", "e2")))
    assert(!rels.exists(r => r._3 == "IDENTITY" && r._2 == "gh2"))
  }

  test("snapshot time travel reads historical versions") {
    val root = tmp()
    val t = SnapshotTable(spark, s"$root/t", Some("label"))
    t.commit(Seq(("A", "1")).toDF("label", "id"), 10L)
    t.commit(Seq(("A", "1"), ("A", "2")).toDF("label", "id"), 20L)
    assert(t.versions === Seq(1L, 2L))
    assert(t.readVersion(1L).count() === 1L)
    assert(t.readVersion(2L).count() === 2L)
    assert(t.updateTagOf(2L) === 20L)
  }
}
