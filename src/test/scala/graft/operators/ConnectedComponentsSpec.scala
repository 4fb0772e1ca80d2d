package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def componentsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("idA", "idB"))
      .as[(Long, Long)].collect().toMap

  /** Driver-side union-find oracle. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize every root to the component MIN
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => ns.map(_ -> ns.min) }.toMap
  }

  test("chains close transitively; separate groups stay separate") {
    val got = componentsOf(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // path: one component rooted at 1
      (10L, 11L),                   // isolated pair
      (20L, 21L), (22L, 21L)))      // V-shape
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val got = componentsOf(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L)))
    // 5 appears only in a self-loop: its own component
    assert(got == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
  }

  test("long path converges within the round budget (log², not diameter)") {
    val n = 300L
    val got = componentsOf((1L until n).map(i => (i, i + 1)))
    assert(got.size == n && got.values.forall(_ == 1L))
  }

  test("matches union-find on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val pairs = Seq.fill(150)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      assert(componentsOf(pairs) == unionFind(pairs), s"trial $trial")
    }
  }

  test("keepCanonical keeps exactly the component minima") {
    val docs = (1L to 8L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("idA", "idB")
    val kept = Dedup.keepCanonical(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 7L, 8L)) // 2,3 fold into 1; 6 into 5
  }

  test("dupGroups groups transitive near-duplicates end-to-end") {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "with many more repeated filler tokens to stabilize the shingle set " +
      "of this synthetic paragraph used for duplicate group testing"
    val docs = Seq(
      (1L, base),
      (2L, base + " tail one"),
      (3L, base + " tail one more"), // near 2 (and 1) — one group via CC
      (50L, "completely different content entirely unrelated to anything " +
        "else in this corpus with its own vocabulary and phrasing")
    ).toDF("doc_id", "text")
    val groups = Dedup.dupGroups(docs, "doc_id", "text", threshold = 0.7)
      .as[(Long, Long)].collect().toMap
    assert(groups(1L) == 1L && groups(2L) == 1L && groups(3L) == 1L)
    assert(!groups.contains(50L)) // never appeared in any pair
  }
}
