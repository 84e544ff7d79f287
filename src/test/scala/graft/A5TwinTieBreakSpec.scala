package graft

/** Pins the documented divergence between the two capped a5 twins
  * (PipelineQueries.scala, a5_collect_series_capped_typed's comment:
  * "the string twin tie-breaks on the rendered point, so the two heads
  * can differ on epoch ties with multi-digit values"):
  *
  *   - string twin: min_k_by(epoch, "epoch:v" string) — ties on the
  *     epoch break on the RENDERED point, i.e. lexicographically;
  *   - typed twin: min_k_by(epoch, struct(epoch, v)) — ties break on
  *     the struct's field-wise order, i.e. the NUMERIC value.
  *
  * Property: on tie-free data (distinct epochs within every key) the
  * two rendered heads are IDENTICAL — the divergence exists only on
  * epoch ties, and there it is exactly lexicographic-vs-numeric on the
  * value ("100:10.00" < "100:9.50" as strings, 9.5 < 10.0 as doubles).
  * This spec runs the real catalog entries on crafted events tables so
  * a refactor of either entry's ranking re-triggers it.
  */
class A5TwinTieBreakSpec extends SparkSpec {

  /** Write a minimal events table (the a5 entries read only
    * event_type/ts/value) and run both capped twins over it.
    */
  private def heads(rows: Seq[(String, Long, Double)])
      : (Map[String, String], Map[String, String]) = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("a5twin").toString
    rows.toDF("event_type", "epoch_ms", "value")
      .selectExpr("event_type", "timestamp_millis(epoch_ms) AS ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def run(name: String): Map[String, String] =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") ->
          r.getAs[String]("series_head")).toMap
    (run("a5_collect_series_capped"), run("a5_collect_series_capped_typed"))
  }

  test("tie-free data (distinct epochs per key): the string and typed " +
      "capped heads render identically, beyond and below the k=20 cap") {
    // deterministic pseudo-shuffled distinct epochs; values with 1- and
    // 2-digit integer parts so a LEXICOGRAPHIC slip would reorder them
    val rows = for {
      key <- Seq("btc", "eth"); i <- 0 until 30
    } yield (key, 1700000000000L + ((i * 7919) % 30) * 1000L,
      if (i % 3 == 0) 9.5 + i else 10.0 + i)
    val under = Seq(("sol", 1700000000000L, 9.5), ("sol", 1700000001000L, 10.0))
    val (str, typed) = heads(rows ++ under)
    assert(str.keySet == Set("btc", "eth", "sol"))
    str.foreach { case (k, h) =>
      assert(typed(k) == h, s"twin heads diverged on tie-free key $k")
      assert(h.nonEmpty && h.split(";").length == (if (k == "sol") 2 else 20))
    }
  }

  test("crafted epoch tie with multi-digit values: exactly the " +
      "documented lexicographic-vs-numeric divergence, same point set") {
    val e = 1700000000000L
    val (str, typed) = heads(Seq(("tie", e, 9.5), ("tie", e, 10.0)))
    // string twin: "…:10.00" sorts before "…:9.50" (char '1' < '9')
    assert(str("tie") == s"$e:10.00;$e:9.50", str("tie"))
    // typed twin: 9.5 < 10.0 numerically
    assert(typed("tie") == s"$e:9.50;$e:10.00", typed("tie"))
    // the divergence is ORDER only — the head point SETS agree
    assert(str("tie").split(";").toSet == typed("tie").split(";").toSet)
  }
}
