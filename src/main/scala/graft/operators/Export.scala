package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-set export: write a dataset as N balanced shards, the layout
  * downstream dataloaders consume (one worker per shard, no coordination).
  * The shard id is an EXPLICIT deterministic expression of the row (not
  * `spark_partition_id()`, which changes with the physical plan), so
  * re-running the export reproduces byte-identical shard membership.
  */
object Shards {

  /** Deterministic shard id in [0, n) from a key column. For dense numeric
    * ids `key % n` gives perfectly balanced shards; for arbitrary keys use
    * `hashShard` instead. */
  def modShard(key: Column, n: Int): Column =
    pmod(key.cast("long"), lit(n.toLong)).cast("int")

  /** Hash-based shard id in [0, n) — balanced in expectation for any key
    * distribution (xxhash64 is Spark-version-stable and codegen'd). */
  def hashShard(key: Column, n: Int): Column =
    pmod(xxhash64(key), lit(n.toLong)).cast("int")

  /** Write `df` to `path` as exactly `n` shard directories
    * (`shard=K/part-*.parquet`), one output file per shard: rows are
    * clustered by the shard column so each shard is a single write task.
    * One shuffle total; each task streams its shard — nothing collects. */
  def write(df: DataFrame, path: String, shardCol: Column, n: Int): Unit =
    df.withColumn("shard", shardCol)
      .repartition(n, col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)

  /** Read a sharded export back; `shard` returns as a partition column. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** One row per shard: (shard, n_files, rows). */
  def manifest(spark: SparkSession, path: String): DataFrame = {
    val df = read(spark, path)
    val files = df.select(col("shard"),
      input_file_name().as("_f"))
      .groupBy("shard")
      .agg(countDistinct(col("_f")).as("n_files"), count(lit(1)).as("rows"))
    files.orderBy("shard")
  }

  /** True when every shard directory holds exactly one data file. */
  def oneFilePerShard(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val shards = fs.listStatus(new Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
    shards.nonEmpty && shards.forall { s =>
      fs.listStatus(s.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) == 1
    }
  }
}
