package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hash-bucketed tables: Spark-bucketing-compatible placement and file
  * tags, co-located (exchange-free) joins and aggregations, invariant
  * preservation through compaction, and graceful degradation. */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private def bucketed(tag: String, n: Int = 4): IceTable =
    new IceTable(spark, tmpDir(tag), IceTableConfig(
      partitionExpr = lit(""),
      sortOrder = Seq("k"),
      bucketBy = Some((n, Seq("k")))))

  private def rows(n: Int, vTag: String): DataFrame =
    spark.range(n).select(col("id").as("k"),
      concat(lit(vTag), col("id")).as("v"))

  /** The catalog-grade relation (IceFileIndex) — the surface that
    * carries the BucketSpec; `t.read()`'s direct parquet read returns
    * the same rows through a spec-less plan. */
  private def rel(t: IceTable): DataFrame =
    graft.plans.IceFileIndex.dataFrame(spark, t)

  /** Run `df` and return its FINAL (post-AQE) physical plan string. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def withNoBroadcast[A](body: => A): A = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("placement matches HashPartitioning and file names carry the bucket tag") {
    val t = bucketed("bkt_place")
    t.insert(rows(200, "a"))
    val snap = t.snapshot()
    // every file is tagged, in range, and its directory agrees with the tag
    snap.aliveFiles.foreach { m =>
      val name = m.path.substring(m.path.lastIndexOf('/') + 1)
      val id = IceTable.bucketIdOfFile(name)
      assert(id.exists(i => i >= 0 && i < 4), m.path)
      assert(t.partitionOf(m.path) === s"bkt=${id.get}", m.path)
    }
    // placement = pmod(hash(k), 4): rows read back from bucket 2's
    // partition are exactly the rows whose hash says bucket 2
    val expected = rows(200, "a")
      .where(pmod(hash(col("k")), lit(4)) === 2)
      .select("k").as[Long].collect().toSet
    val got = t.readPartitions(Set("bkt=2"))
      .select("k").as[Long].collect().toSet
    assert(got === expected)
    assert(t.bucketSpecFor(snap).isDefined)
  }

  test("join of two co-bucketed tables plans with ZERO shuffle exchanges") {
    val a = bucketed("bkt_a")
    val b = bucketed("bkt_b")
    a.insert(rows(500, "a"))
    b.insert(rows(400, "b"))
    withNoBroadcast {
      val j = rel(a).join(rel(b).withColumnRenamed("v", "w"), "k")
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(j.count() === 400L)
      // same rows as the shuffling join of unbucketed reads
      val a2 = new IceTable(spark, a.root, a.cfg.copy(bucketBy = None))
      val b2 = new IceTable(spark, b.root, b.cfg.copy(bucketBy = None))
      val ref = a2.read().join(b2.read().withColumnRenamed("v", "w"), "k")
      assert(j.orderBy("k").collect().toSeq ===
        ref.orderBy("k").collect().toSeq)
    }
  }

  test("aggregation on the bucket key plans without an exchange") {
    val t = bucketed("bkt_agg")
    t.insert(rows(300, "a"))
    t.insert(rows(300, "b"))
    val agg = rel(t).groupBy("k").agg(count(lit(1)).as("c"))
    val plan = finalPlan(agg)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(agg.where(col("c") =!= 2).count() === 0L)
  }

  test("compaction keeps the bucket invariant; joins stay exchange-free") {
    val a = bucketed("bkt_merge")
    val b = bucketed("bkt_merge2")
    (1 to 3).foreach(_ => a.insert(rows(100, "a")))
    b.insert(rows(100, "b"))
    assert(a.snapshot().aliveFiles.size === 12) // 3 inserts x 4 buckets
    a.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    val snap = a.snapshot()
    assert(snap.aliveFiles.size === 4) // one merged file per bucket
    assert(a.bucketSpecFor(snap).isDefined)
    withNoBroadcast {
      val j = rel(a).join(rel(b).withColumnRenamed("v", "w"), "k")
      assert(!finalPlan(j).contains("Exchange hashpartitioning"))
      assert(j.count() === 300L) // 3 copies of each of b's 100 keys
    }
  }

  test("placement-mutating writes are guarded; placement-safe ones work") {
    val t = bucketed("bkt_guard")
    t.insert(rows(20, "a"))
    // assigning a bucket column would strand rows in the wrong bucket
    val e1 = intercept[IllegalArgumentException] {
      t.updateWhere(col("k") === 1L, Seq("k" -> lit(999L)))
    }
    assert(e1.getMessage.contains("bucket column"))
    // upsert keyed off the bucket column could move a replacement's bucket
    val e2 = intercept[IllegalArgumentException] {
      t.upsert(rows(5, "b"), Seq("v"))
    }
    assert(e2.getMessage.contains("bucket column"))
    // keyed ON the bucket column both are fine, and placement holds
    t.upsert(rows(5, "b"), Seq("k"))
    t.updateWhere(col("k") === 1L, Seq("v" -> lit("upd")))
    val snap = t.snapshot()
    assert(t.bucketSpecFor(snap).isDefined)
    assert(t.read().where(col("v") === "b3").count() === 1L)
    assert(t.read().where(col("v") === "upd").count() === 1L)
    // every surviving file still honors dir == tag == hash placement
    snap.aliveFiles.foreach { m =>
      val name = m.path.substring(m.path.lastIndexOf('/') + 1)
      assert(IceTable.bucketIdOfFile(name).map(i => s"bkt=$i")
        .contains(t.partitionOf(m.path)), m.path)
    }
  }

  test("format(\"ice\") writer option bucketBy creates a bucketed table") {
    val root = tmpDir("bkt_fmt")
    rows(60, "a").write.format("ice").option("path", root)
      .option("bucketBy", "4:k").option("sortOrder", "k")
      .mode("append").save()
    val t = IceTable.open(spark, root)
    assert(t.cfg.bucketBy === Some((4, Seq("k"))))
    assert(t.bucketSpecFor(t.snapshot()).isDefined)
    val bad = intercept[IllegalArgumentException] {
      rows(5, "x").write.format("ice").option("path", tmpDir("bkt_bad"))
        .option("bucketBy", "0:k").mode("append").save()
    }
    assert(bad.getMessage.contains("bucketBy"))
  }

  test("partition evolution keeps the bucket layout; dv deletes compose") {
    val a = new IceTable(spark, tmpDir("bkt_evolve"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("k"), lit(2))),
      sortOrder = Seq("k"),
      bucketBy = Some((4, Seq("k")))))
    a.insert(rows(200, "a"))
    // evolve the USER partition axis: the bucket level must survive the
    // full-table reroute, not silently fall off
    a.repartitionTable(concat(lit("q="), pmod(col("k"), lit(3))))
    val snap = a.snapshot()
    assert(a.bucketSpecFor(snap).isDefined)
    snap.aliveFiles.foreach { m =>
      val p = a.partitionOf(m.path)
      assert(p.startsWith("q=") && p.contains("/bkt="), p)
    }
    // merge-on-read delete on a bucketed table: the dv overlay rides the
    // bucketed relation, and the co-located join still has no shuffle.
    // The dv side broadcasts at production defaults (position-pair sized)
    // and a broadcast anti-join PRESERVES the bucket partitioning — so
    // force ONLY the outer join to sort-merge (a targeted hint), not the
    // overlay
    DeleteVectors.deleteWhere(a, col("k") < 20)
    assert(rel(a).count() === 180L)
    val b = bucketed("bkt_evolve2")
    b.insert(rows(100, "b"))
    rel(a).createOrReplaceTempView("bkt_dv_a")
    rel(b).withColumnRenamed("v", "w").createOrReplaceTempView("bkt_dv_b")
    val j = spark.sql(
      "SELECT /*+ MERGE(bkt_dv_b) */ * FROM bkt_dv_a JOIN bkt_dv_b USING (k)")
    val plan = finalPlan(j)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(j.count() === 80L) // keys 20..99 survive on a
  }

  test("persisted config round-trips; untagged files degrade gracefully") {
    val t = bucketed("bkt_persist")
    t.insert(rows(50, "a"))
    val reopened = IceTable.open(spark, t.root)
    assert(reopened.cfg.bucketBy === Some((4, Seq("k"))))
    // a pre-bucketing writer commits an untagged file: reads stay correct
    // but the snapshot no longer advertises a BucketSpec
    val plain = new IceTable(spark, t.root,
      t.cfg.copy(bucketBy = None, partitionExpr = lit("late")))
    plain.insert(rows(10, "late").withColumn("k", col("k") + 1000))
    val snap = t.snapshot()
    assert(t.bucketSpecFor(snap).isEmpty)
    assert(t.read().count() === 60L)
  }
}
