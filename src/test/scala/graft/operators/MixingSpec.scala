package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  // skewed strata: 600 a, 300 b, 100 c
  private lazy val corpus = spark.range(1000)
    .select(col("id"),
      when(col("id") < 600, "a").when(col("id") < 900, "b").otherwise("c")
        .as("src"))

  test("uniform is deterministic, in [0,1), and roughly uniform") {
    val u = corpus.select(Mixing.uniform(col("id")).as("u"))
    val stats = u.agg(min("u"), max("u"), avg("u")).head
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) < 1.0)
    assert(math.abs(stats.getDouble(2) - 0.5) < 0.05)
    // same key -> same value on a re-run (pure function of the key)
    assert(u.collect().toSeq == corpus
      .select(Mixing.uniform(col("id")).as("u")).collect().toSeq)
  }

  test("sampleStrata keeps ~rate per stratum and is stable under repartition") {
    val rates = Map("a" -> 0.5, "b" -> 1.0, "c" -> 0.1)
    val kept = Mixing.sampleStrata(corpus, "src", "id", rates)
    val byS = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("b") == 300) // rate 1.0 keeps everything
    assert(math.abs(byS("a") - 300.0) < 45) // 600 * 0.5 ± sampling noise
    assert(byS("c") <= 30 && byS("c") >= 2)
    // partition layout must not change the kept set (unlike df.sample)
    val kept2 = Mixing.sampleStrata(corpus.repartition(7), "src", "id", rates)
    assert(kept2.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      kept.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("mixToProportions hits the target mixture keeping the scarcest stratum whole") {
    val targets = Map("a" -> 0.2, "b" -> 0.3, "c" -> 0.5)
    // c is scarcest vs its target: T = 100/0.5 = 200 -> a keeps 40/600,
    // b keeps 60/300, c keeps 100/100
    val rates = Mixing.ratesFor(corpus, "src", targets)
    assert(rates("c") == 1.0)
    assert(math.abs(rates("a") - 40.0 / 600) < 1e-12)
    assert(math.abs(rates("b") - 60.0 / 300) < 1e-12)
    val (mixed, _) = Mixing.mixToProportions(corpus, "src", "id", targets)
    val byS = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("c") == 100)
    // achieved proportions within sampling noise of the targets
    val total = byS.values.sum.toDouble
    assert(math.abs(byS("a") / total - 0.2) < 0.05)
    assert(math.abs(byS("b") / total - 0.3) < 0.05)
  }

  test("mixToProportions rejects strata missing from the targets") {
    intercept[IllegalArgumentException] {
      Mixing.ratesFor(corpus, "src", Map("a" -> 0.5, "b" -> 0.5))
    }
  }

  test("deterministicShuffle is a stable permutation, not the input order") {
    val df = spark.range(500).toDF("id")
    val s1 = Mixing.deterministicShuffle(df, 7L, "id")
      .collect().map(_.getLong(0)).toSeq
    val s2 = Mixing.deterministicShuffle(df.repartition(13), 7L, "id")
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2) // pure function of (seed, key)
    assert(s1.sorted == (0L until 500L)) // a permutation
    assert(s1 != (0L until 500L).toSeq) // and actually shuffled
    val s3 = Mixing.deterministicShuffle(df, 8L, "id")
      .collect().map(_.getLong(0)).toSeq
    assert(s3 != s1) // seed picks a different order
  }

  test("uniformHash covers arbitrary/composite keys") {
    val u = spark.range(2000)
      .select(Mixing.uniformHash(1L, col("id"), lit("salt")).as("u"))
    val stats = u.agg(min("u"), max("u"), avg("u")).head
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) < 1.0)
    assert(math.abs(stats.getDouble(2) - 0.5) < 0.05)
  }

  test("sampleExactN takes exactly n per stratum, deterministically") {
    import spark.implicits._
    val df = (0 until 900).map(i => (s"s${i % 3}", i.toLong)).toDF("st", "id")
    val a = Mixing.sampleExactN(df, "st", "id", 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a.size == 150)
    assert(a.groupBy(_._1).forall(_._2.size == 50))
    // stable under repartition (pure function of the data)
    val b = Mixing.sampleExactN(df.repartition(7), "st", "id", 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
    // small strata keep everything
    val tiny = Mixing.sampleExactN(
      Seq(("x", 1L), ("x", 2L)).toDF("st", "id"), "st", "id", 50)
    assert(tiny.count() == 2)
  }

  test("temperatureQuotas: closed-form Hamilton apportionment at tau=0.5") {
    import spark.implicits._
    // counts a=100, b=1, c=4; w = floor(1e6*sqrt(c)) = 10e6 / 1e6 / 2e6,
    // W = 13e6. base = floor(10*w/W) = 7/0/1 (sum 8, deficit 2);
    // remainders 9e6/10e6/7e6 -> bump b then a. quotas: a=8, b=1, c=1.
    val rows = Seq.tabulate(100)(i => ("a", i.toLong)) ++
      Seq(("b", 200L)) ++ Seq.tabulate(4)(i => ("c", 300L + i))
    val df = rows.toDF("st", "id")
    val q = Mixing.temperatureQuotas(df, "st", total = 10L)
    assert(q == Map("a" -> 8L, "b" -> 1L, "c" -> 1L))
    // tau=1 is plain proportionality: 100/1/4 of 105 -> quotas match counts
    val q1 = Mixing.temperatureQuotas(df, "st", total = 105L, tau = 1.0)
    assert(q1 == Map("a" -> 100L, "b" -> 1L, "c" -> 4L))
  }

  test("temperatureSample draws exactly the quota per stratum, total hit") {
    import spark.implicits._
    val rows = for (s <- Seq("a", "b", "c"); i <- 1 to 200)
      yield (s, (s.hashCode.abs % 100) * 1000L + i)
    val df = rows.toDF("st", "id")
    val quotas = Mixing.temperatureQuotas(df, "st", total = 60L)
    assert(quotas.values.sum == 60L)
    val kept = Mixing.temperatureSample(df, "st", "id", total = 60L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(kept.length == 60)
    val byStrata = kept.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(byStrata == quotas)
    // equal-sized strata at tau=0.5 split evenly
    assert(quotas == Map("a" -> 20L, "b" -> 20L, "c" -> 20L))
  }

  test("upsampleEpochs: floor copies always, fractional head once more") {
    import spark.implicits._
    val df = Seq.tabulate(1000)(i => ("a", i.toLong)).toDF("st", "id")
    val up = Mixing.upsampleEpochs(df, "st", "id", Map("a" -> 2.3))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val byId = up.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byId.size == 1000)
    // every id appears 2 or 3 times, epochs numbered 1..copies
    assert(byId.values.forall(e => e == Seq(1L, 2L) || e == Seq(1L, 2L, 3L)))
    // the fractional head is the uniform(key) < 0.3 set, exactly
    def u(k: Long): Double =
      (((k * 2654435761L) % 4294967296L + 4294967296L) % 4294967296L) / 4294967296.0
    (0L until 1000L).foreach { k =>
      assert((byId(k).length == 3) == (u(k) < 0.3), s"id $k")
    }
    // zero epochs drops the stratum; absent strata default to 1 copy
    val mixed = Seq(("a", 1L), ("b", 2L)).toDF("st", "id")
    val z = Mixing.upsampleEpochs(mixed, "st", "id", Map("a" -> 0.0))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(z.toSeq == Seq(("b", 1L)))
  }

  test("temperature mixing handles null and non-string strata") {
    import spark.implicits._
    // null strata: coalesced to "" — a real quota, not an NPE / silent 0
    val withNull = Seq((Some("en"), 1L), (Some("en"), 2L), (Some("en"), 3L),
      (Some("en"), 4L), (None, 5L), (None, 6L), (None, 7L), (None, 8L))
      .toDF("lang", "id")
    val q = Mixing.temperatureQuotas(withNull, "lang", total = 4, tau = 0.5)
    assert(q == Map("" -> 2L, "en" -> 2L))
    val drawn = Mixing.temperatureSample(withNull, "lang", "id", 4)
      .collect().map(r => Option(r.getString(0)))
    assert(drawn.length == 4 && drawn.count(_.isEmpty) == 2)
    // non-string strata: cast, not getString-crash
    val intStrata = Seq((1, 10L), (1, 11L), (2, 12L), (2, 13L)).toDF("s", "id")
    val qi = Mixing.temperatureQuotas(intStrata, "s", total = 2)
    assert(qi == Map("1" -> 1L, "2" -> 1L))
    assert(Mixing.sampleQuotas(intStrata, "s", "id", qi).count() == 2L)
  }

  test("capPerKey keeps the lowest-order rows per group, exactly") {
    import spark.implicits._
    // group sizes 1..6; cap at 3 keeps min(size, 3) lowest ids per group
    val rows = for (g <- 1 to 6; i <- 1 to g) yield (s"g$g", g * 100L + i)
    val capped = Mixing.capPerKey(rows.toDF("dom", "id"), "dom", "id", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expect = (for (g <- 1 to 6; i <- 1 to math.min(g, 3))
      yield (s"g$g", g * 100L + i)).toSet
    assert(capped == expect)
  }

  test("selectTokenBudget fills the budget in priority order, inclusive cut") {
    import spark.implicits._
    // priorities 10,9,...,1 with 10 tokens each; budget 35 → the top 3
    // fit (30), the 4th would overshoot (40 > 35)
    val df = (1 to 10).map(i => (i.toLong, 10L, i.toLong)).toDF("id", "tk", "prio")
    val kept = Mixing.selectTokenBudget(df, "id", "tk", "prio", budget = 35L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(10L, 9L, 8L))
    // exact-fit budget keeps the boundary row (inclusive running total)
    val kept40 = Mixing.selectTokenBudget(df, "id", "tk", "prio", budget = 40L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept40 === Set(10L, 9L, 8L, 7L))
    // ties on priority break by ascending id; buckets never split a tie
    val ties = (1 to 8).map(i => (i.toLong, 10L, 5L)).toDF("id", "tk", "prio")
    val keptTies = Mixing.selectTokenBudget(ties, "id", "tk", "prio", budget = 30L,
        numBuckets = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptTies === Set(1L, 2L, 3L))
    // zero budget → nothing; empty input → empty
    assert(Mixing.selectTokenBudget(df, "id", "tk", "prio", 0L).count() === 0L)
    assert(Mixing.selectTokenBudget(df.limit(0), "id", "tk", "prio", 100L)
      .count() === 0L)
  }

  test("selectTokenBudget: constant priority buckets in parallel, nulls rejected") {
    val const = (1 to 1000).map(i => (i.toLong, 1L, 7L)).toDF("id", "tk", "prio")
    // constant priority → pure id order; budget 100 keeps ids 1..100
    val kept = Mixing.selectTokenBudget(const, "id", "tk", "prio", budget = 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === (1L to 100L).toSet)
    // the round-8 scale defect: value-range buckets over a CONSTANT
    // priority collapsed every row into one bucket (a single-task global
    // window); order-statistic boundaries on (priority, id) split by id
    val nBuckets = Mixing
      .tokenBudgetBucketed(const, "id", "tk", "prio", numBuckets = 8)
      .select(countDistinct(col("_tb_b"))).head.getLong(0)
    assert(nBuckets > 1L, s"constant priority must still spread (got $nBuckets bucket)")
    // a null priority would rank highest on the negated key — reject loudly
    val withNull = const.union(spark.sql(
      "SELECT CAST(2000 AS BIGINT) id, CAST(1 AS BIGINT) tk, CAST(NULL AS BIGINT) prio"))
    val e = intercept[IllegalArgumentException] {
      Mixing.selectTokenBudget(withNull, "id", "tk", "prio", 100L)
    }
    assert(e.getMessage.contains("null"))
  }
}
