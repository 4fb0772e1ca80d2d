package graft.plans

import graft.SparkSpec
import graft.ice.{IceTable, IceTableConfig}
import org.apache.spark.sql.functions._

/** SQL-surface resolution of ice tables (`ice.<name>`, time travel, and
  * the INSERT guard) via the GraftExtensions-injected analyzer rule. */
class IceSqlResolutionSpec extends SparkSpec {

  private def mkTable(wh: String, name: String): IceTable = {
    val t = new IceTable(spark, s"$wh/$name", IceTableConfig(
      concat(lit("d="), col("d")), Seq("id")))
    t.insert(spark.range(10).select(col("id"),
      when(col("id") < 5, "2024-01-01").otherwise("2024-01-02").as("d"),
      concat(lit("tag"), col("id")).as("v")))
    t
  }

  test("graft.<name> resolves to a snapshot relation with partition pruning") {
    val wh = tmpDir("graft_sqlcat")
    mkTable(wh, "ev")
    spark.conf.set(IceSqlResolution.WarehouseKey, wh)
    try {
      val all = spark.sql("SELECT count(*) AS c FROM graft.ev").head.getLong(0)
      assert(all === 10L)
      // WHERE on the virtual partition column prunes files in the optimizer
      val df = spark.sql(
        "SELECT count(*) AS c FROM graft.ev WHERE d = '2024-01-01'")
      assert(df.head.getLong(0) === 5L)
      val scan = df.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters"), scan)
      // qualified column references work through the alias
      assert(spark.sql("SELECT ev.id FROM graft.ev WHERE ev.id = 3").count() === 1L)
    } finally spark.conf.unset(IceSqlResolution.WarehouseKey)
  }

  test("TIMESTAMP AS OF / VERSION AS OF pin MVCC snapshots") {
    val wh = tmpDir("graft_sqltt")
    val t = mkTable(wh, "tt")
    Thread.sleep(2)
    val between = System.currentTimeMillis()
    Thread.sleep(2)
    t.insert(spark.range(100, 103).select(col("id"), lit("2024-01-03").as("d")))
    spark.conf.set(IceSqlResolution.WarehouseKey, wh)
    try {
      assert(spark.sql("SELECT count(*) AS c FROM graft.tt").head.getLong(0) === 13L)
      // integral TIMESTAMP AS OF = epoch millis (the log's native unit)
      assert(spark.sql(s"SELECT count(*) AS c FROM graft.tt TIMESTAMP AS OF $between")
        .head.getLong(0) === 10L)
      assert(spark.sql(s"SELECT count(*) AS c FROM graft.tt VERSION AS OF $between")
        .head.getLong(0) === 10L)
      // string timestamps cast in the session zone (UTC here)
      val iso = java.time.Instant.ofEpochMilli(between)
        .toString.replace("T", " ").replace("Z", "")
      assert(spark.sql(s"SELECT count(*) AS c FROM graft.tt TIMESTAMP AS OF '$iso'")
        .head.getLong(0) === 10L)
    } finally spark.conf.unset(IceSqlResolution.WarehouseKey)
  }

  test("INSERT INTO graft.<name> commits through the log; OVERWRITE is rejected") {
    val wh = tmpDir("graft_sqlins")
    val t = mkTable(wh, "guard")
    spark.conf.set(IceSqlResolution.WarehouseKey, wh)
    try {
      val logsBefore = t.logio.currentLogFiles(t.root).length
      // positional VALUES map onto the table's log schema (id, d)
      val r = spark.sql(
        "INSERT INTO graft.guard VALUES (99, '2024-01-09', 'tag99'), (98, '2024-01-09', 'tag98')")
        .collect()
      assert(r.head.getLong(0) == 2L)
      assert(t.logio.currentLogFiles(t.root).length == logsBefore + 1,
        "one atomic log commit")
      assert(spark.sql("SELECT count(*) c FROM graft.guard").head.getLong(0) == 12L)
      assert(spark.sql("SELECT count(*) c FROM graft.guard WHERE d = '2024-01-09'")
        .head.getLong(0) == 2L)
      // explicit column list + SELECT source (v absent: union schema reads null)
      spark.sql("INSERT INTO graft.guard (id, d) SELECT 97, '2024-01-09'").collect()
      assert(spark.sql("SELECT count(*) c FROM graft.guard").head.getLong(0) == 13L)
      // OVERWRITE = truncation; stays an explicit maintenance decision
      // arity mismatch without a column list fails loudly (positional SQL)
      val mis = intercept[Exception] {
        spark.sql("INSERT INTO graft.guard VALUES (1, 'x')")
      }
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE graft.guard VALUES (1, 'x', 'y')")
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e).exists(_.contains("INSERT OVERWRITE")), e)
      assert(msgs(mis).exists(_.contains("list the target columns")), mis)
    } finally spark.conf.unset(IceSqlResolution.WarehouseKey)
  }

  test("INSERT BY NAME matches names, not positions; case-variant lists canonicalize") {
    val wh = tmpDir("graft_sqlbyname")
    val t = mkTable(wh, "byname")
    spark.conf.set(IceSqlResolution.WarehouseKey, wh)
    try {
      // BY NAME with the query's outputs deliberately OUT of schema order:
      // positional mapping would swap d and v
      spark.sql("INSERT INTO graft.byname BY NAME " +
        "SELECT 'tag50' AS v, '2024-01-05' AS d, 50 AS id").collect()
      val r = spark.sql(
        "SELECT id, d, v FROM graft.byname WHERE id = 50").head
      assert(r.getLong(0) === 50L)
      assert(r.getString(1) === "2024-01-05")
      assert(r.getString(2) === "tag50")
      // a case-variant column list resolves to the recorded exact-case
      // column (and its type) instead of minting a new "ID" column
      spark.sql("INSERT INTO graft.byname (ID, D) VALUES (51, '2024-01-05')").collect()
      assert(spark.sql("SELECT count(*) c FROM graft.byname WHERE id = 51")
        .head.getLong(0) === 1L)
      val schemaCols = t.trySnapshot(Long.MaxValue).get.schema.pairs.map(_._1)
      assert(!schemaCols.contains("ID"), s"case-variant duplicate landed: $schemaCols")
      // BY NAME is incompatible with an explicit column list
      val both = intercept[Exception] {
        spark.sql("INSERT INTO graft.byname (id) BY NAME SELECT 1 AS id")
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(both).exists(m => m.contains("mutually exclusive") ||
        m.contains("BY NAME") || m.contains("PARSE")), both)
    } finally spark.conf.unset(IceSqlResolution.WarehouseKey)
  }

  test("UPDATE on a partitionFunc-routed table is rejected (inputs unknowable)") {
    val wh = tmpDir("graft_sqlpf")
    val t = new IceTable(spark, s"$wh/pftbl", IceTableConfig(
      partitionExpr = lit(""), sortOrder = Seq("id"),
      partitionFunc = Some(r => s"p${r.getAs[Long]("id") % 2}"))) // non-k=v dirs
    t.insert(spark.range(4).select(col("id"), lit("x").as("v")))
    spark.conf.set(IceSqlResolution.WarehouseKey, wh)
    try {
      val e = intercept[Exception] {
        spark.sql("UPDATE graft.pftbl SET v = 'y' WHERE id = 1").collect()
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e).exists(_.contains("closure")), e)
    } finally spark.conf.unset(IceSqlResolution.WarehouseKey)
  }

  test("SQL DELETE and UPDATE run the atomic CoW mutations") {
    val wh = tmpDir("graft_sqldml")
    val t = mkTable(wh, "dml")
    spark.conf.set(IceSqlResolution.WarehouseKey, wh)
    try {
      val upd = spark.sql(
        "UPDATE graft.dml SET v = concat('upd', id) WHERE id >= 8").head.getLong(0)
      assert(upd == 2L, s"updated $upd")
      assert(spark.sql("SELECT count(*) c FROM graft.dml WHERE v LIKE 'upd%'")
        .head.getLong(0) == 2L)
      val del = spark.sql("DELETE FROM graft.dml WHERE id % 2 = 0").head.getLong(0)
      assert(del == 5L, s"deleted $del")
      assert(spark.sql("SELECT count(*) c FROM graft.dml").head.getLong(0) == 5L)
      assert(spark.sql("SELECT sum(id) s FROM graft.dml").head.getLong(0) ==
        Seq(1L, 3L, 5L, 7L, 9L).sum)
      // the mutations went through the log: answers equal on the handle
      assert(t.read().count() == 5L)
      // UPDATE without WHERE touches everything
      val all = spark.sql("UPDATE graft.dml SET v = 'x'").head.getLong(0)
      assert(all == 5L)
      assert(spark.sql("SELECT count(DISTINCT v) c FROM graft.dml")
        .head.getLong(0) == 1L)
      // updating a partition-key column is rejected (a CoW rewrite cannot
      // move rows between partition directories)
      val e = intercept[Exception] {
        spark.sql("UPDATE graft.dml SET d = 'x' WHERE id = 1").collect()
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e).exists(_.contains("partition-deriving")), e)
    } finally spark.conf.unset(IceSqlResolution.WarehouseKey)
  }

  test("unknown names and unset warehouse fall through to Spark's error") {
    val wh = tmpDir("graft_sqlmiss")
    spark.conf.set(IceSqlResolution.WarehouseKey, wh)
    try intercept[Exception] { spark.sql("SELECT * FROM graft.nope").collect() }
    finally spark.conf.unset(IceSqlResolution.WarehouseKey)
    // with no warehouse configured the rule is inert
    intercept[Exception] { spark.sql("SELECT * FROM graft.ev").collect() }
  }

  test("path traversal in a table identifier cannot escape the warehouse") {
    val wh = tmpDir("graft_sqlsafe")
    mkTable(wh, "inner")
    spark.conf.set(IceSqlResolution.WarehouseKey, s"$wh/sub")
    try intercept[Exception] {
      spark.sql("SELECT * FROM graft.`../inner`").collect()
    } finally spark.conf.unset(IceSqlResolution.WarehouseKey)
  }

  test("table_changes('t', since[, until]) is the change feed in SQL") {
    import graft.ice.{ChangeFeed, DeleteVectors, IceLogIO}
    val wh = tmpDir("graft_sqlcdc")
    val t = mkTable(wh, "cf")
    val since = t.logio.currentLogFiles(t.root)
      .map(f => IceLogIO.logFileInfo(f)._1).max
    t.insert(spark.range(100, 103).select(col("id"),
      lit("2024-01-03").as("d"), lit("new").as("v")))
    t.updateWhere(col("id") === 2L, Seq("v" -> lit("upd")))
    DeleteVectors.deleteWhere(t, col("id") === 7L)
    spark.conf.set(IceSqlResolution.WarehouseKey, wh)
    try {
      val got = spark.sql(
        s"SELECT _change_type, count(*) AS c FROM table_changes('cf', $since) GROUP BY 1")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // 3 appends + the update's insert image; the update's delete image
      // + the MoR delete
      assert(got === Map("insert" -> 4L, "delete" -> 2L))
      // matches the API form exactly
      assert(spark.sql(s"SELECT * FROM table_changes('graft.cf', $since)").count()
        === ChangeFeed.between(t, since).count())
      // an until bound excludes later commits; filters/projection compose
      val upd = spark.sql(
        s"SELECT v FROM table_changes('cf', $since) " +
          "WHERE _change_type = 'insert' AND id = 2").collect()
      assert(upd.map(_.getString(0)).toSeq === Seq("upd"))
      // an unknown table leaves the TVF unresolved -> analyzer error
      intercept[Exception] {
        spark.sql(s"SELECT * FROM table_changes('nope', 0)").collect()
      }
    } finally spark.conf.unset(IceSqlResolution.WarehouseKey)
  }
}
