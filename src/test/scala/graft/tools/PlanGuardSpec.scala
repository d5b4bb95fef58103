package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import graft.{SparkEntry, SparkSpecBase}

/** Whole-surface plan guard: every query in `SparkEntry.queries` is
  * built (not executed) at sf0.001 and its pre-AQE physical plan is
  * checked for the two scale-killer shapes this engine has actually
  * shipped or nearly shipped:
  *
  *  - an UNPARTITIONED WindowExec (`Window.orderBy` with no
  *    `partitionBy`): Spark moves every row to one partition — the
  *    round-4 vocabGrowth/rfm defect class, now a test failure
  *    everywhere;
  *  - a CartesianProductExec (a non-broadcast cross join): the
  *    broadcast nested-loop probes this engine uses on purpose never
  *    lower to this node, so any appearance is an unbounded
  *    all-pairs shuffle.
  *
  * Plans are inspected recursively through subquery expressions too —
  * a scalar subquery hiding a global window is the same defect.
  */
class PlanGuardSpec extends SparkSpecBase {

  private def offenders(p: SparkPlan): Seq[String] = {
    val here = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        s"unpartitioned WindowExec: ${w.windowExpression.mkString(",").take(120)}"
      case c: CartesianProductExec =>
        s"CartesianProduct: ${c.simpleStringWithNodeId().take(120)}"
    }
    val inSubqueries = p.collect { case n => n }
      .flatMap(_.expressions)
      .flatMap(_.collect {
        case s: org.apache.spark.sql.execution.ScalarSubquery => s.plan
        case s: org.apache.spark.sql.execution.InSubqueryExec => s.plan
      })
      .flatMap(sub => offenders(sub))
    here ++ inSubqueries
  }

  test("detector sanity: a deliberately unpartitioned window IS flagged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bad = Seq((1L, 2L), (3L, 4L)).toDF("a", "b").withColumn("r",
      row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("a")))
    assert(offenders(bad.queryExecution.sparkPlan).nonEmpty)
  }

  test("no query plan contains an unpartitioned WindowExec or a CartesianProduct") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf1).queryExecution.sparkPlan
        offenders(plan).map(o => s"$name: $o")
    }
    assert(bad.isEmpty, s"scale-killer plan shapes:\n${bad.mkString("\n")}")
  }
}
