package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins at cluster scale.
  *
  * AQE's skew-join handling (on by default) splits oversized sort-merge
  * partitions at runtime and is the first line of defense. Salting is the
  * explicit fallback when a single key is so hot that even split
  * partitions overwhelm one task, or when AQE is unavailable (streaming
  * micro-batches): the big side scatters each row to one of `factor`
  * sub-keys, the small side replicates across all sub-keys, and the join
  * key becomes (key, salt) — shuffle load spreads factor-ways at the cost
  * of factor-times replication of the small side.
  */
object SkewOps {

  /** Deterministic salt in [0, factor) derived from stable row columns
    * (no rand(): retries/replays must route rows identically).
    */
  def salt(factor: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(factor))

  /** Equi-join big (skewed) with small on `key`, salted `factor` ways.
    * saltSource = columns of `big` that identify a row (for deterministic
    * scatter).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int,
                 saltSource: Seq[String]): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      salt(factor, saltSource.map(big(_)): _*))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
