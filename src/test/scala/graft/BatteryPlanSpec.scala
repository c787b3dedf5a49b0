package graft

/**
 * Battery-wide physical-plan sweep: NO declared query may plan a
 * CartesianProduct — the unbroadcast all-pairs shuffle that turns any
 * 100 TB input into |L|×|R| work. Broadcast nested-loop joins are NOT
 * banned here: a `crossJoin(broadcast(oneRowTotals))` (the totals /
 * centroid / quota pattern used throughout) plans as BNLJ with a
 * bounded build side and is scale-safe; the battery's per-operator
 * specs (PlanShapeSpec) assert the stricter no-BNLJ shape where an
 * operator's contract forbids even that.
 *
 * Building `executedPlan` drives each query's CONSTRUCTION (including
 * driver-side iteration some builders do — BPE's merge loop, PageRank's
 * rounds) at smoke scale, so this is also an everything-still-builds
 * sweep over all declared queries.
 */
class BatteryPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no declared query plans a CartesianProduct at any scale") {
    val offenders = SparkEntry.allQueries.flatMap { q =>
      val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian plans in the battery: ${offenders.mkString(", ")}")
  }
}
