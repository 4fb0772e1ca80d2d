package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BitwiseCount, BitwiseXor, Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import org.apache.spark.sql.graft.DotProduct

/** Config-driven library activation — the standard Spark packaging hook:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the native graft expressions (`graft_dot`, `graft_cosine`,
  * `graft_hamming64`) into every session built on the cluster, with no
  * driver-side `register(spark)` call — the right deployment shape for
  * shared clusters, SQL gateways, and notebook platforms where user code
  * never holds the session builder. The functions are the same codegen'd
  * Catalyst expressions `GraftSqlFunctions.register` installs on a live
  * session; both routes resolve to identical plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProduct].getName, name, usage)

  override def apply(e: SparkSessionExtensions): Unit = {
    // SQL catalog surface: `SELECT ... FROM ice.<table>` (+ TIMESTAMP/
    // VERSION AS OF time travel) against spark.graft.warehouse — see
    // [[graft.plans.IceSqlResolution]]
    e.injectResolutionRule(sp => new graft.plans.IceSqlResolution(sp))
    // DDL + maintenance statements Spark's grammar lacks (CREATE TABLE AS /
    // DROP TABLE / SHOW TABLES / OPTIMIZE / VACUUM on `graft.` names) —
    // see [[graft.plans.GraftSqlParser]]; non-graft SQL delegates untouched
    e.injectParser((sp, delegate) => new graft.plans.GraftSqlParser(sp, delegate))
    // deletion-vector coherence for `spark.read.format("ice")` relations
    // (every other surface applies the overlay itself) — see
    // [[graft.plans.IceDvOverlay]]
    e.injectResolutionRule(sp => new graft.plans.IceDvOverlay(sp))
    // metadata-only count(*): groupless filterless counts over ice
    // relations answer from the log's per-file row counts with zero
    // data-file I/O — see [[org.apache.spark.sql.graft.MetadataOnlyCount]]
    e.injectOptimizerRule(sp =>
      new org.apache.spark.sql.graft.MetadataOnlyCount(sp))
    // `SELECT ... FROM table_changes('t', since[, until])` — the change
    // feed's SQL spelling (Delta's CDF TVF shape). A registry TVF, not a
    // resolution rule: ResolveFunctions fails unknown TVFs before
    // extension resolution rules run
    e.injectTableFunction((FunctionIdentifier("table_changes"),
      info("table_changes",
        "table_changes(table, since[, until]) - row-level changes of a graft table in (since, until], epoch millis"),
      (es: Seq[Expression]) => graft.plans.IceSqlResolution.tableChangesPlan(es)))
    // Iceberg-style metadata tables, same TVF shape (see
    // [[graft.ice.MetaTables]]): alive files with footer row counts,
    // per-partition rollups, and commit history — all time-travelable
    // via the optional second argument
    e.injectTableFunction((FunctionIdentifier("table_stats"),
      info("table_stats",
        "table_stats(table) - the latest ANALYZE column statistics of a graft table"),
      (es: Seq[Expression]) => graft.plans.IceSqlResolution.tableStatsPlan(es)))
    graft.ice.MetaTables.Names.foreach { meta =>
      e.injectTableFunction((FunctionIdentifier(s"table_$meta"),
        info(s"table_$meta",
          s"table_$meta(table[, asOf]) - the $meta metadata relation of a graft table"),
        (es: Seq[Expression]) => graft.plans.IceSqlResolution.metaTablePlan(meta, es)))
    }
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - codegen'd array dot product"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity"),
      (es: Seq[Expression]) =>
        Divide(DotProduct(es(0), es(1)),
          Multiply(Sqrt(DotProduct(es(0), es(0))),
            Sqrt(DotProduct(es(1), es(1)))))))
    e.injectFunction((FunctionIdentifier("graft_hamming64"),
      info("graft_hamming64",
        "graft_hamming64(a, b) - Hamming distance of two 64-bit fingerprints"),
      (es: Seq[Expression]) => BitwiseCount(BitwiseXor(es(0), es(1)))))
    // Spark's runtime-join-filter bloom machinery exposed as first-class
    // SQL (it has no public registration of its own); the binary filter
    // round-trips through org.apache.spark.util.sketch.BloomFilter and
    // graft.operators.BloomDedup
    e.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(x, items, bits) - distributed bloom-filter build over a LONG column"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          es(0), es(1), es(2))))
    e.injectFunction((FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        "graft_might_contain(bloom, x) - membership probe against a serialized bloom filter"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))))
  }
}
