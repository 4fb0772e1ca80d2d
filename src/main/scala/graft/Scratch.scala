package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness (not part of the library surface): one-off local
  * experiments. Kept for iteration; each round repurposes the body.
  *
  * Current experiment: EXECUTE the exported DuckDB view SQL in actual
  * DuckDB (driver-side python has it; the Scala test suite cannot
  * depend on it) and diff against the engine's own folded read. Exports
  * three shapes to `/tmp/scratch_duck/`:
  *   - `grouped/` — WHERE + HAVING with a DECIMAL literal and avg
  *     aliases (the Spark-rendered predicate carries `1.25BD`-style
  *     suffixes and backticks: exactly the dialect-translation surface);
  *   - `joinview/` — a star-join view (dim-free fold over materialized
  *     partials);
  *   - `global/` — a no-GROUP-BY view folded to its identity-row shape.
  * Each dir gets `manifest.json`, `view.sql`, and `expected.csv` (the
  * engine's readView, sorted). Validate with:
  * {{{
  * python3 - <<'PY'
  * import duckdb, pathlib
  * for d in ["grouped", "joinview", "global"]:
  *     sql = pathlib.Path(f"/tmp/scratch_duck/{d}/view.sql").read_text()
  *     con = duckdb.connect()
  *     con.execute(sql)
  *     got = con.execute("SELECT * FROM v ORDER BY 1").fetchall()
  *     print(d, got)
  * PY
  * }}}
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ice.{IceTable, IceTableConfig, ManifestExport}
    import graft.operators.MvSync
    import spark.implicits._

    val outRoot = "/tmp/scratch_duck"
    def export(dir: String, mv: IceTable, expected: org.apache.spark.sql.DataFrame): Unit = {
      val d = s"$outRoot/$dir"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      ManifestExport.writeManifest(mv, s"$d/manifest.json")
      val sql = ManifestExport.writeDuckDbView(mv, s"$d/view.sql", "v")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/expected.csv"),
        expected.collect().map(_.toSeq.map(String.valueOf).mkString(","))
          .sorted.mkString("", "\n", "\n"))
      println(s"== $dir exported; HAVING line: " +
        sql.linesIterator.find(_.contains("_v WHERE")).getOrElse("(none)"))
    }

    // ---- grouped: WHERE + decimal-literal HAVING over avg/sum aliases
    val wh = java.nio.file.Files.createTempDirectory("scratch_wh").toString
    spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
    val base = new IceTable(spark, s"$wh/sb", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    base.insert(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L), (4L, "b", 9L),
      (5L, "c", 1L), (6L, "skip", 99L)).toDF("id", "grp", "v"))
    Thread.sleep(5)
    spark.sql("""CREATE MATERIALIZED VIEW graft.sv AS
      SELECT grp, count(*) AS cnt, sum(v) AS total, avg(v) AS mean
      FROM graft.sb WHERE grp <> 'skip'
      GROUP BY grp HAVING avg(v) > 1.25 AND count(*) >= 2""").collect()
    val svT = IceTable.open(spark, s"$wh/sv")
    val svD = MvSync.MvViewDef.decode(svT.cfg.mvDef.get)
    println(s"stored havingSql: ${svD.havingSql}")
    export("grouped", svT, MvSync.readView(svT, svD))

    // ---- joinview: fact JOIN dim, rebased (flat state exports too)
    val dim = new IceTable(spark, s"$wh/jd", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("k")))
    dim.insert(Seq(("k1", "A"), ("k2", "B")).toDF("k", "cat"))
    val fact = new IceTable(spark, s"$wh/jf", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    fact.insert(Seq((1L, "k1", 5L), (2L, "k2", 9L), (3L, "k1", 2L))
      .toDF("id", "k", "v"))
    Thread.sleep(5)
    spark.sql("""CREATE MATERIALIZED VIEW graft.jv AS
      SELECT d.cat AS cat, count(*) AS cnt, sum(f.v) AS total
      FROM graft.jf f JOIN graft.jd d ON f.k = d.k GROUP BY d.cat""").collect()
    fact.insert(Seq((4L, "k2", 1L)).toDF("id", "k", "v"))
    Thread.sleep(5)
    spark.sql("REFRESH MATERIALIZED VIEW graft.jv FULL").collect()
    val jvT = IceTable.open(spark, s"$wh/jv")
    val jvD = MvSync.MvViewDef.decode(jvT.cfg.mvDef.get)
    export("joinview", jvT, MvSync.readView(jvT, jvD))

    // ---- global: no GROUP BY, identity-row shape
    spark.sql("""CREATE MATERIALIZED VIEW graft.gv AS
      SELECT count(*) AS cnt, sum(v) AS total FROM graft.sb""").collect()
    val gvT = IceTable.open(spark, s"$wh/gv")
    val gvD = MvSync.MvViewDef.decode(gvT.cfg.mvDef.get)
    export("global", gvT, MvSync.readView(gvT, gvD))

    // ---- xdistinct: exact_count_distinct served from the side-table
    // fold CTEs — through duplicate-preserving and true retractions, so
    // the exported SQL's refcount semantics are what DuckDB executes
    val xb = new IceTable(spark, s"$wh/xb", IceTableConfig(
      partitionExpr = lit("all"), sortOrder = Seq("id")))
    xb.insert(Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L), (4L, "b", 5L))
      .toDF("id", "grp", "v"))
    Thread.sleep(5)
    spark.sql("""CREATE MATERIALIZED VIEW graft.xv AS
      SELECT grp, count(*) AS cnt, exact_count_distinct(v) AS uv
      FROM graft.xb GROUP BY grp""").collect()
    xb.deleteWhere(col("id") === 1L) // dup of v=10 survives
    xb.deleteWhere(col("id") === 3L) // last v=20 retracts
    xb.insert(Seq((5L, "b", 7L)).toDF("id", "grp", "v"))
    Thread.sleep(5)
    spark.sql("REFRESH MATERIALIZED VIEW graft.xv").collect()
    val xvT = IceTable.open(spark, s"$wh/xv")
    val xvD = MvSync.MvViewDef.decode(xvT.cfg.mvDef.get)
    export("xdistinct", xvT, MvSync.readView(xvT, xvD))

    // ---- xdgroup: exact_count_distinct over a GROUP column — the side
    // key set stays deduped (a repeated column name would be an
    // ambiguous reference in DuckDB's binder)
    spark.sql("""CREATE MATERIALIZED VIEW graft.xg AS
      SELECT grp, count(*) AS cnt, exact_count_distinct(grp) AS ug
      FROM graft.xb GROUP BY grp""").collect()
    val xgT = IceTable.open(spark, s"$wh/xg")
    val xgD = MvSync.MvViewDef.decode(xgT.cfg.mvDef.get)
    export("xdgroup", xgT, MvSync.readView(xgT, xgD))

    spark.stop()
  }
}
