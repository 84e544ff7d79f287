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

  test("every catalog entry's output schema is scalar-only — no " +
      "array/map/binary/struct top-level columns (the driver's " +
      "correctness gate sorts every column with pandas; an ndarray " +
      "cell is unhashable and the sort throws, which red-flagged " +
      "a5_collect_series_capped_typed in CORRECTNESS_r16 before it " +
      "was re-rendered to a string — typed shapes stay ops/spec-level)") {
    assume(new java.io.File(sf).isDirectory, s"$sf missing")
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType,
      StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try PlanMode.explainOnly { fn(spark, sf).schema } finally {
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
          }
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] ||
              f.dataType == BinaryType =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"non-scalar catalog output columns (driver gate cannot sort " +
        s"these): $offenders")
  }

  test("reference-semantics posture: every scaleTwin points at an " +
      "existing catalog entry, and the two SCALE.md-flagged unbounded " +
      "collects are marked") {
    import graft.queries.Catalog
    val dangling = Catalog.all.collect {
      case (n, e) if e.scaleTwin.exists(t => !Catalog.all.contains(t)) => n
    }
    assert(dangling.isEmpty, s"scaleTwin names a missing entry: $dangling")
    assert(Catalog.all("a5_collect_series").scaleTwin ===
      Some("a5_collect_series_capped"))
    assert(Catalog.all("a14_group_concat").scaleTwin ===
      Some("a14_group_concat_capped"))
  }

  test("bounded-buffer twins are prefixes of their uncapped entries " +
      "(a5/a14: same group counts, head = leading slice of the full blob)") {
    assume(new java.io.File(sf).isDirectory, s"$sf missing")
    // (uncapped, capped, group-key cols, count col, full col, head col,
    //  joiner)
    val twins = Seq(
      ("a5_collect_series", "a5_collect_series_capped",
        Seq("event_type"), "n_points", "series", "series_head", ';'),
      ("a14_group_concat", "a14_group_concat_capped",
        Seq("lang", "source"), "n_docs", "doc_blob", "doc_blob_head", ' '))
    twins.foreach { case (unName, capName, keys, cnt, full, head, sep) =>
      val un = SparkEntry.queries(unName)(spark, sf).collect()
        .map(r => keys.map(r.getAs[String]) ->
          (r.getAs[Long](cnt), r.getAs[String](full))).toMap
      val cap = SparkEntry.queries(capName)(spark, sf).collect()
      assert(cap.length === un.size, s"$capName group count")
      cap.foreach { r =>
        val k = keys.map(r.getAs[String])
        val (nUn, blob) = un(k)
        val nCap = r.getAs[Long](cnt)
        val headStr = r.getAs[String](head)
        // the capped twin still counts the FULL group in one scan
        assert(nCap === nUn, s"$capName count for $k")
        // head is the leading slice of the uncapped sorted blob: equal
        // when the group fits the cap, else a prefix ending at a
        // separator boundary
        assert(headStr == blob ||
          (blob.startsWith(headStr) && blob.charAt(headStr.length) == sep),
          s"$capName head not a prefix for $k")
      }
    }
  }
}
