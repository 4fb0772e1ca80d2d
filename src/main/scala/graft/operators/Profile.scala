package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** ANALYZE-style column profiling: per-column null counts, distinct
  * counts, min/max, and numeric moments in ONE pass over the table — the
  * statistics a query planner, data-quality monitor, or corpus datasheet
  * needs.
  *
  * Shape at 100 TB: a single scan with all per-column aggregates fused
  * into one `agg` (Catalyst evaluates them in the same hash-aggregate
  * stage; partials combine map-side, the shuffle carries one row).
  * Distinct counts use `approx_count_distinct` by default (HLL, mergeable,
  * no extra shuffle) — `exact = true` switches to exact distincts for
  * small tables, which Spark plans as expand + two-phase aggregation.
  *
  * Output: one row per profiled column —
  * (column, rows, nulls, distinct, min, max) with min/max rendered as
  * strings (a mixed-type profile row set needs one schema).
  */
object Profile {

  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"_rows_${f.name}"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"_nulls_${f.name}"),
        (if (exact) countDistinct(c) else approx_count_distinct(c))
          .as(s"_dist_${f.name}"),
        min(c).cast("string").as(s"_min_${f.name}"),
        max(c).cast("string").as(s"_max_${f.name}")) ++
        (if (f.dataType.isInstanceOf[NumericType])
          Seq(avg(c.cast("double")).as(s"_avg_${f.name}"))
        else Seq(lit(null).cast("double").as(s"_avg_${f.name}")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into one row per column
    val pieces = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        col(s"_rows_${f.name}").cast("long").as("rows"),
        col(s"_nulls_${f.name}").cast("long").as("nulls"),
        col(s"_dist_${f.name}").cast("long").as("distinct"),
        col(s"_min_${f.name}").as("min"),
        col(s"_max_${f.name}").as("max"),
        col(s"_avg_${f.name}").as("avg"))
    }
    one.select(explode(array(pieces: _*)).as("_p"))
      .select(col("_p.column").as("column"), col("_p.rows").as("rows"),
        col("_p.nulls").as("nulls"), col("_p.distinct").as("distinct"),
        col("_p.min").as("min"), col("_p.max").as("max"),
        col("_p.avg").as("avg"))
  }
}
