package graft.tools

import graft.{SparkEntry, SparkSpecBase}

/** Plan-SHAPE regression guards: the physical-plan properties PLANS.md
  * documents, pinned mechanically so a refactor that silently loses a
  * pushdown, turns a broadcast join into a sort-merge, or adds a
  * shuffle to a narrow operator fails a test instead of a benchmark.
  * Assertions are deliberately coarse (substring presence/absence on
  * the pre-AQE physical plan) to stay robust across Spark versions.
  */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf1).queryExecution.sparkPlan.toString

  private def optimized(name: String): String =
    SparkEntry.queries(name)(spark, sf1)
      .queryExecution.optimizedPlan.toString

  test("q1: filter is pushed into the parquet scan and columns are pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(800))
    // projection pruning: the scan's ReadSchema must not include an
    // untouched wide column
    assert(p.contains("ReadSchema") && !p.contains("l_comment"), p.take(800))
  }

  test("q9 range theta-join stays a broadcast nested-loop, q22 suffix join broadcasts the dim") {
    assert(plan("q9_range_join").contains("BroadcastNestedLoopJoin"))
    val p22 = plan("q22_suffix_subzones")
    assert(p22.contains("BroadcastNestedLoopJoin") ||
      p22.contains("BroadcastHashJoin"), p22.take(800))
  }

  test("qsp6 weighted sample: TakeOrdered per-partition heaps, zero shuffle") {
    val p = plan("qsp6_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("Exchange"), p.take(1200))
  }

  test("qsp1 hash sample: pure narrow filter — no shuffle, no join") {
    val p = plan("qsp1_hash_sample")
    assert(!p.contains("Exchange") && !p.contains("Join"), p.take(1200))
  }

  test("qann4 IVF assignment: no shuffle reaches the corpus-side scan (map-side argmin)") {
    // the corpus assignment must be mapPartitions over the scan; the
    // only exchanges allowed belong to the tiny query/centroid side and
    // the final top-k — never a corpus-wide repartition. Count is a
    // coarse ceiling: the full plan carries 4 small-side exchanges today.
    val p = plan("qann4_ivf_topk")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 6, s"IVF plan grew to $exchanges exchanges")
    assert(p.contains("MapPartitions") || p.contains("mapPartitions"),
      p.take(800))
  }

  test("qkg2 mention canonicalization joins stay broadcast (dictionary-sized dim)") {
    assert(optimized("qkg2_mentions").contains("ResolvedHint") ||
      plan("qkg2_mentions").contains("BroadcastHashJoin"))
  }
}
