package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins at cluster scale. AQE's
  * skew-join handling covers sort-merge joins after the fact; explicit
  * salting is the declarative fix when a handful of keys dominate (the
  * classic power-law user_id / null-key shapes in event data).
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, buckets); the small side is replicated `buckets` times; the join
    * key becomes (key, salt), spreading each hot key over `buckets` tasks.
    *
    * Semantics are identical to `skewed.join(small, keys, joinType)` for
    * inner/left joins where `small` is unique per key-tuple (the dimension
    * shape). The replication multiplies the small side's shuffle volume by
    * `buckets` — size accordingly.
    */
  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val salted = skewed.withColumn("_salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Top-N heaviest keys with counts — the diagnosis step before salting.
    * One map-side-combined aggregation; no driver-side row data beyond N. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(topN)
}
