package graft

import org.apache.spark.sql.functions._

/** Pins that optimization-round query restructurings compute EXACTLY the
  * values of the shapes they replaced — the driver grades results by hash,
  * so "equivalent" means bit-identical, not approximately equal. */
class QueryEquivalenceSpec extends SparkSpec {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  test("b11 revenue: integer e4 sum ≡ decimal(38,4) sum, straight to double") {
    // adversarial magnitudes and half-cent-adjacent doubles included:
    // the two arithmetics share the HALF_UP decimal(18,2) casts, so any
    // divergence would come from the sum or the final division
    import spark.implicits._
    val rows = (1L to 50000L).map { i =>
      val price = (i % 977).toDouble + (i % 100) / 100.0 + (i % 7) * 0.005
      val disc = (i % 11) / 100.0
      (i % 1500, price, disc)
    }
    val df = rows.toDF("k", "p", "d")
    val legacy = df.groupBy(col("k"))
      .agg(sum(dec(col("p")) * (lit(1) - dec(col("d"))))
        .cast("double").as("revenue"))
    val fast = df.groupBy(col("k"))
      .agg((sum((dec(col("p")) * 100).cast("long") *
        (lit(100L) - (dec(col("d")) * 100).cast("long"))) /
        lit(10000.0)).as("revenue"))
    val a = legacy.orderBy("k").collect()
    val b = fast.orderBy("k").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      // bit-identical doubles, not a tolerance compare
      assert(java.lang.Double.doubleToRawLongBits(x.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(y.getDouble(1)),
        s"k=${x.getLong(0)}: ${x.getDouble(1)} vs ${y.getDouble(1)}")
    }
  }
}
