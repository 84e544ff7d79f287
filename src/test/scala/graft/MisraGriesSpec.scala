package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAgg

/** Guarantees of the mergeable Misra-Gries heavy-hitters Aggregator:
  * exactness below capacity, lower-bound error budget above it, and
  * independence from the partition/merge layout.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: capacity above the cardinality reproduces exact " +
       "counts; nulls are ignored") {
    val df = ((1 to 1000).map(i => s"k${i % 7}") ++ Seq(null, null))
      .toDF("key")
    val hh = df.groupBy(lit(1).as("g"))
      .agg(MisraGriesAgg.heavyHitters($"key", 16, 7).as("hh"))
      .select(explode($"hh").as("kv"))
      .select($"kv._1", $"kv._2").as[(String, Long)].collect().toMap
    val exact = df.filter($"key".isNotNull).groupBy($"key").count()
      .as[(String, Long)].collect().toMap
    assert(hh === exact)
  }

  test("approximate regime: the dominant key survives with a bounded " +
       "undercount, on any partition layout") {
    // 5000x one hot key + 200 noise keys x 10: hot share 5/7 with
    // capacity 15 -> guaranteed tracked (share > 1/16), undercount
    // bounded by n/(capacity+1)
    val rows = Seq.fill(5000)("hot") ++
      (1 to 200).flatMap(i => Seq.fill(10)(f"n$i%03d"))
    val n = rows.length
    Seq(1, 8).foreach { parts =>
      val hh = rows.toDF("key").repartition(parts)
        .groupBy(lit(1).as("g"))
        .agg(MisraGriesAgg.heavyHitters($"key", 15, 3).as("hh"))
        .select(explode($"hh").as("kv"))
        .select($"kv._1", $"kv._2").as[(String, Long)].collect()
      val hot = hh.find(_._1 == "hot")
      assert(hot.isDefined, s"parts=$parts: hot key evicted")
      assert(hot.get._2 <= 5000L, "estimate must be a lower bound")
      assert(hot.get._2 >= 5000L - n / 16L,
        s"parts=$parts: undercount ${5000L - hot.get._2} > n/(cap+1)")
      // with every noise count far under the error budget, the hot key
      // must also be ranked first
      assert(hh.sortBy(kv => (-kv._2, kv._1)).head._1 === "hot")
    }
  }

  test("streaming: the sketch accumulates across micro-batches as " +
       "aggregation state (complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = in.toDF().toDF("key")
      .groupBy(lit(1).as("g"))
      .agg(MisraGriesAgg.heavyHitters($"key", 16, 2).as("hh"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("mg_hh").start()
    try {
      in.addData(Seq.fill(50)("hot") ++ Seq("a", "b"): _*)
      q.processAllAvailable()
      in.addData(Seq.fill(30)("hot") ++ Seq("a", "c"): _*)
      q.processAllAvailable()
    } finally q.stop()
    val hh = spark.table("mg_hh")
      .select(explode($"hh").as("kv"))
      .select($"kv._1", $"kv._2").as[(String, Long)].collect()
    // exact regime (4 distinct keys < capacity): true counts across both
    // batches, top-2 cut keeps hot=80 then a=2
    assert(hh.toSeq === Seq("hot" -> 80L, "a" -> 2L))
  }
}
