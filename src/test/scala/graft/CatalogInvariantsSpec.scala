package graft

/** Catalog-wide invariants that previously lived only in per-round
  * manual artifacts (the PLANS_rN.txt dump and the CORRECTNESS gate's
  * 149/149 oracle count). As specs they fail the build the moment a new
  * entry ships without its DuckDB twin or a refactor lets Catalyst plan
  * an unbounded cross — instead of surfacing a round later in a dump
  * diff.
  */
class CatalogInvariantsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every catalog entry ships a DuckDB oracle twin (the full " +
      "three-way rows/schema/hash gate, no rows-only fallbacks)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"entries without an oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without an entry: $orphaned")
  }

  test("no catalog entry plans a CartesianProduct (every cross the " +
      "catalog allows is a bounded BroadcastNestedLoopJoin)") {
    assume(new java.io.File(sf).isDirectory, s"$sf missing")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // explainOnly: iterative/checkpointing ops return their composed
        // dataflow (one round's shape) instead of an opaque RDD scan, and
        // skip driver-side collects — planning only, no job execution
        val plan =
          try PlanMode.explainOnly {
            fn(spark, sf).queryExecution.executedPlan.toString
          } finally {
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
          }
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"entries planning a CartesianProduct: $offenders")
  }
}
