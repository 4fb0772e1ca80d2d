package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  test("sharded export round-trips with exact membership and one file per shard") {
    val df = (0 until 1000).map(i => (i.toLong, s"doc $i payload")).toDF("id", "text")
    val path = tmpDir("shards")
    Shards.write(df, path, Shards.modShard(col("id"), 8), 8)
    assert(Shards.oneFilePerShard(spark, path))
    val back = Shards.read(spark, path)
    assert(back.count() == 1000)
    // membership is the deterministic mod, not an accident of layout
    val bad = back.where(pmod(col("id"), lit(8)) =!= col("shard")).count()
    assert(bad == 0)
    val m = Shards.manifest(spark, path).collect()
    assert(m.length == 8 && m.forall(_.getLong(2) == 125L), "mod on dense ids balances exactly")
  }

  test("hash sharding balances skewed keys in expectation") {
    val df = (0 until 2000).map(i => (s"key-${i / 100}-$i", i)).toDF("k", "v")
    val path = tmpDir("hash_shards")
    Shards.write(df, path, Shards.hashShard(col("k"), 10), 10)
    val counts = Shards.read(spark, path).groupBy("shard").count()
      .collect().map(_.getLong(1))
    assert(counts.length == 10)
    assert(counts.max < 2 * counts.min, s"shard skew too high: ${counts.mkString(",")}")
    // re-running the export reproduces identical membership (determinism)
    val a = Shards.read(spark, path).select("k", "shard").collect()
      .map(r => (r.getString(0), r.getInt(1))).sortBy(_._1)
    Shards.write(df, path, Shards.hashShard(col("k"), 10), 10)
    val b = Shards.read(spark, path).select("k", "shard").collect()
      .map(r => (r.getString(0), r.getInt(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("scrubPii redacts planted PII and leaves clean text alone") {
    val rows = Seq(
      (0L, "reach me at jane.doe+spam@corp.example.org today"),
      (1L, "ssn 123-45-6789 phone 555-867-5309 card 4111111111111111"),
      (2L, "server at 192.168.0.1 and 10.255.3.77"),
      (3L, "nothing sensitive here, just 1234 and a-b-c"),
      (4L, "two mails: a@b.co and x_y%z@d.example.museum!")
    ).toDF("id", "text")
    val got = rows.select(col("id"), TextFunctions.scrubPii(col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(0L) == "reach me at <EMAIL> today")
    assert(got(1L) == "ssn <SSN> phone <PHONE> card <CC>")
    assert(got(2L) == "server at <IP> and <IP>")
    assert(got(3L) == "nothing sensitive here, just 1234 and a-b-c")
    assert(got(4L) == "two mails: <EMAIL> and <EMAIL>!")
  }
}
