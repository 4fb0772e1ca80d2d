package graft.plans

import graft.SparkSpec
import graft.ice.IceTable
import org.apache.spark.sql.functions._

/** `BEGIN TRANSACTION; INSERT INTO graft.t …; …; COMMIT|ROLLBACK` — the
  * SQL spelling of [[graft.ice.IceTransaction]]: all staged inserts flip
  * with one marker PUT; ROLLBACK and mid-block failures surface nothing
  * on any table. */
class SqlTransactionSpec extends SparkSpec {

  private def wh(): String = {
    val w = tmpDir("graft_txn_wh")
    spark.conf.set(IceSqlResolution.WarehouseKey, w)
    spark.sql(
      """CREATE TABLE graft.txn_a (id BIGINT, v STRING)
        |PARTITIONED BY (concat('p=', pmod(id, 2))) SORTED BY (id)""".stripMargin)
    spark.sql("CREATE TABLE graft.txn_b (kind STRING, n BIGINT)")
    w
  }

  test("COMMIT flips every staged insert atomically; result rows report per-table counts") {
    val w = wh()
    val out = spark.sql(
      """BEGIN TRANSACTION;
        |INSERT INTO graft.txn_a VALUES (1, 'x'), (2, 'y'), (3, 'z');
        |INSERT INTO graft.txn_b SELECT 'total', 3;
        |COMMIT""".stripMargin).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq(("txn_a", 3L, "committed"), ("txn_b", 1L, "committed")))
    assert(spark.sql("SELECT count(*) FROM graft.txn_a").head.getLong(0) === 3L)
    assert(spark.sql("SELECT n FROM graft.txn_b").head.getLong(0) === 3L)
    // the marker is one file beside the tables
    assert(new java.io.File(s"$w/_txn").listFiles()
      .count(_.getName.endsWith(".commit")) === 1)
  }

  test("ROLLBACK stages then discards: nothing surfaces, tables unchanged") {
    wh()
    spark.sql("INSERT INTO graft.txn_a VALUES (1, 'seed')")
    val out = spark.sql(
      """BEGIN TRANSACTION;
        |INSERT INTO graft.txn_a VALUES (99, 'garbage');
        |INSERT INTO graft.txn_b VALUES ('garbage', 99);
        |ROLLBACK""".stripMargin).collect()
    assert(out.forall(_.getString(2) == "rolled_back"))
    assert(out.map(_.getLong(1)).sum === 2L) // both really staged
    assert(spark.sql("SELECT count(*) FROM graft.txn_a").head.getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM graft.txn_b").head.getLong(0) === 0L)
  }

  test("a failing later statement aborts the whole block — earlier stages never surface") {
    wh()
    intercept[Exception] {
      spark.sql(
        """BEGIN TRANSACTION;
          |INSERT INTO graft.txn_a VALUES (7, 'pending');
          |INSERT INTO graft.txn_b SELECT 1;
          |COMMIT""".stripMargin).collect()
    }
    assert(spark.sql("SELECT count(*) FROM graft.txn_a").head.getLong(0) === 0L)
  }

  test("column lists and BY NAME align exactly like the standalone INSERT") {
    wh()
    spark.sql(
      """BEGIN TRANSACTION;
        |INSERT INTO graft.txn_a (v, id) VALUES ('a', 10);
        |INSERT INTO graft.txn_b BY NAME SELECT 5 AS n, 'k' AS kind;
        |COMMIT""".stripMargin).collect()
    val a = spark.sql("SELECT id, v FROM graft.txn_a").head
    assert(a.getLong(0) === 10L && a.getString(1) === "a")
    val b = spark.sql("SELECT kind, n FROM graft.txn_b").head
    assert(b.getString(0) === "k" && b.getLong(1) === 5L)
  }

  test("semicolons inside string literals and block comments do not split the block") {
    wh()
    spark.sql(
      """BEGIN TRANSACTION;
        |INSERT /* note; with a semicolon */ INTO graft.txn_a VALUES (1, 'a;b');
        |COMMIT""".stripMargin).collect()
    assert(spark.sql("SELECT v FROM graft.txn_a").head.getString(0) === "a;b")
    // a backslash-escaped quote must not close the literal early (the
    // delegate grammar accepts \' escapes) — the ; after it stays inside
    spark.sql(
      "BEGIN TRANSACTION; " +
        "INSERT INTO graft.txn_a VALUES (2, 'O\\'Brien; Esq'); COMMIT")
      .collect()
    assert(spark.sql("SELECT v FROM graft.txn_a WHERE id = 2")
      .head.getString(0) === "O'Brien; Esq")
  }

  test("malformed blocks fail at parse time with a reason; non-transactional statements rejected") {
    wh()
    val e1 = intercept[UnsupportedOperationException](
      spark.sql("BEGIN TRANSACTION; INSERT INTO graft.txn_a VALUES (1, 'x')"))
    assert(e1.getMessage.contains("COMMIT"))
    val e2 = intercept[UnsupportedOperationException](
      spark.sql("BEGIN TRANSACTION; DELETE FROM graft.txn_a WHERE id = 1; COMMIT"))
    assert(e2.getMessage.contains("INSERT INTO"))
    val e3 = intercept[UnsupportedOperationException](
      spark.sql("BEGIN TRANSACTION; INSERT INTO other.t VALUES (1); COMMIT"))
    assert(e3.getMessage.contains("catalog"))
    // nothing partial landed anywhere
    assert(spark.sql("SELECT count(*) FROM graft.txn_a").head.getLong(0) === 0L)
  }

  test("a materialized view cannot be a transactional insert target") {
    wh()
    spark.sql("INSERT INTO graft.txn_a VALUES (1, 'x')")
    Thread.sleep(5)
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.txn_mv AS
        |SELECT v, count(*) AS cnt FROM graft.txn_a GROUP BY v""".stripMargin)
    val e = intercept[Exception](
      spark.sql(
        """BEGIN TRANSACTION;
          |INSERT INTO graft.txn_mv VALUES ('x', 1);
          |COMMIT""".stripMargin))
    assert(e.getMessage.contains("MATERIALIZED VIEW"))
  }
}
