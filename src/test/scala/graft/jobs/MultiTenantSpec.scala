package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

/** Multi-tenant sync orchestration contract
  * (cartography/intel/aws/__init__.py:142-206 + util.py:68-96):
  * best-effort continues past a failing tenant and aggregates, fail-fast
  * propagates immediately, post-ingestion work is gated on a fully
  * successful loop, and dependency-gated analysis runs only when its
  * resources were part of the requested sync set.
  */
class MultiTenantSpec extends AnyFunSuite {
  import MultiTenant._

  private def boom(t: String): Nothing = sys.error(s"tenant $t exploded")

  test("best-effort: a failing tenant is recorded and the loop continues") {
    val ran = Seq.newBuilder[String]
    val report = syncAll(Seq("a", "b", "c"), bestEffort = true) { t =>
      ran += t
      if (t == "b") boom(t)
    }
    assert(ran.result() === Seq("a", "b", "c"))
    assert(report.succeeded === Seq("a", "c"))
    assert(report.failed.map(_.tenantId) === Seq("b"))
    assert(!report.allSucceeded)
  }

  test("fail-fast: the first failure propagates as-is and stops the loop") {
    val ran = Seq.newBuilder[String]
    val e = intercept[RuntimeException] {
      syncAll(Seq("a", "b", "c"), bestEffort = false) { t =>
        ran += t
        if (t == "b") boom(t)
      }
    }
    assert(e.getMessage === "tenant b exploded")
    assert(ran.result() === Seq("a", "b"), "tenant c must never start")
  }

  test("aggregated exception carries EVERY failed tenant, causes suppressed") {
    val report = syncAll(Seq("a", "b", "c"), bestEffort = true) {
      t => if (t != "c") boom(t)
    }
    val agg = intercept[MultiTenantSyncException](raiseIfFailed(report))
    assert(agg.getMessage.contains("Exception for tenant ID: a"))
    assert(agg.getMessage.contains("Exception for tenant ID: b"))
    assert(agg.getSuppressed.map(_.getMessage).toSeq ===
      Seq("tenant a exploded", "tenant b exploded"))
  }

  test("post work runs only when every tenant succeeded") {
    var postRan = 0
    syncAndThen(Seq("a", "b"), bestEffort = true)(_ => ()) { postRan += 1 }
    assert(postRan === 1)
    intercept[MultiTenantSyncException] {
      syncAndThen(Seq("a", "b"), bestEffort = true)(t =>
        if (t == "a") boom(t)) { postRan += 1 }
    }
    assert(postRan === 1, "post must be skipped after a partial sync")
  }

  test("dependency-gated analysis runs iff its resources were requested") {
    var ran = 0
    assert(!analysisIfDeps("job", Set("iam", "ec2"), Set("iam")) { ran += 1 })
    assert(ran === 0)
    assert(analysisIfDeps("job", Set("iam", "ec2"), Set("iam", "ec2", "s3")) { ran += 1 })
    assert(ran === 1)
  }
}
