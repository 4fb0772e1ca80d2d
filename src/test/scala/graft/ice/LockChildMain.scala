package graft.ice

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked-JVM worker for [[TableLockSpec]]'s two-process fencing test: a
  * SECOND OS process (own JVM-wide commit lock, own in-flight registry —
  * none of the parent's process-local machinery) performing `n` CoW
  * `updateWhere` increments against the shared table, retrying on
  * [[CommitConflictException]]. Prints `CHILD_DONE <count>` on success —
  * the parent asserts the final cell value equals the sum of both
  * processes' applied increments, which only holds if the cross-process
  * lease serialized every validate→append window. */
object LockChildMain {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val n = args(1).toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-lock-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = new IceTable(spark, root,
      IceTableConfig(lit("p=1"), Seq.empty))
    var done = 0
    var attempts = 0
    while (done < n && attempts < n * 50) {
      attempts += 1
      try {
        t.updateWhere(col("k") === 1, Seq("v" -> (col("v") + 1)))
        done += 1
      } catch {
        case _: CommitConflictException => Thread.sleep(20L)
      }
    }
    spark.stop()
    println(s"CHILD_DONE $done")
    sys.exit(if (done == n) 0 else 1)
  }
}
