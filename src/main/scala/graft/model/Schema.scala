package graft.model

/** Declarative graph-schema layer — the Spark-native re-expression of the
  * reference's model core (cartography/models/core/nodes.py:50-102,
  * relationships.py:87-133, common.py:11-106). A schema compiles not to
  * Cypher text but to a DataFrame plan (see graft.merge.GraphMerge).
  */

/** Binds a node/rel property to a per-row column or a per-run constant
  * (PropertyRef set_in_kwargs, cartography/models/core/common.py:93-106).
  */
sealed trait PropertyRef
/** Value comes from a column of the batch being loaded. */
final case class RowRef(field: String) extends PropertyRef
/** Value is a run-scoped constant supplied at load() time. */
final case class KwargRef(name: String) extends PropertyRef

/** Matcher modes of TargetNodeMatcher (cartography/graph/querybuilder.py:
  * 122-141; flags at models/core/common.py:33-66).
  */
sealed trait MatchMode
object MatchMode {
  /** n.key = ref */
  case object Exact extends MatchMode
  /** toLower(n.key) = toLower(ref) */
  case object IgnoreCase extends MatchMode
  /** toLower(n.key) CONTAINS toLower(ref) — at scale this theta-join is
    * replaced by MinHash-LSH candidate blocking + verify (SURVEY.md §2.3).
    */
  case object FuzzyContains extends MatchMode
  /** n.key IN ref-list — ref column is an array; one row attaches to many
    * targets (one_to_many, common.py:48-66).
    */
  case object OneToMany extends MatchMode
}

/** Direction of the drawn edge relative to the node being loaded
  * (LinkDirection, cartography/models/core/relationships.py:13-35).
  */
sealed trait LinkDirection
object LinkDirection {
  /** (:LoadedNode)-[:REL]->(:Target) */
  case object Outward extends LinkDirection
  /** (:LoadedNode)<-[:REL]-(:Target) */
  case object Inward extends LinkDirection
}

/** One matcher clause: find target nodes whose `targetKey` matches the
  * value bound by `ref` under `mode`. targetKey "id" matches the node id;
  * anything else matches a property.
  */
final case class TargetMatcher(targetKey: String, ref: PropertyRef,
                               mode: MatchMode = MatchMode.Exact)

/** A relationship schema (CartographyRelSchema). All matchers must hold
  * (AND), mirroring multi-attribute TargetNodeMatchers.
  */
final case class RelSchema(relLabel: String,
                           targetLabel: String,
                           direction: LinkDirection,
                           matchers: Seq[TargetMatcher],
                           properties: Map[String, PropertyRef] = Map.empty)

/** The tenant-scoping relationship (sub_resource_relationship,
  * cartography/models/core/nodes.py:71-84): every loaded node attaches to
  * its container, and cleanup is scoped by it. The matcher ref must be a
  * KwargRef so cleanup can never cross tenants
  * (cleanupbuilder.py:191-206 safety check, enforced here at
  * construction).
  */
final case class SubResourceRel(targetLabel: String,
                                relLabel: String = "RESOURCE",
                                targetKey: String = "id",
                                ref: KwargRef = KwargRef("sub_resource_id")) {
  /** Edge direction is always (:Node)<-[:REL]-(:SubResource) in the
    * reference (querybuilder.py:165-209).
    */
  val direction: LinkDirection = LinkDirection.Inward
}

/** A node schema (CartographyNodeSchema): primary label, id binding,
  * property bindings, extra labels, scoping rel, other rels.
  */
final case class NodeSchema(label: String,
                            idRef: PropertyRef,
                            properties: Map[String, PropertyRef] = Map.empty,
                            extraLabels: Seq[String] = Nil,
                            subResource: Option[SubResourceRel] = None,
                            otherRels: Seq[RelSchema] = Nil) {
  require(label.nonEmpty, "node label required")

  /** All relationship labels this schema can write — the cleanup scope. */
  def relLabels: Seq[String] =
    subResource.map(_.relLabel).toSeq ++ otherRels.map(_.relLabel)
}
