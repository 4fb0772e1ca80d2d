package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixing operators for training-corpus assembly: deterministic
  * stratified sampling (hit a target mixture of sources without a random
  * seed whose replay depends on partitioning) and deterministic global
  * shuffle (a stable training order).
  *
  * Everything here is map-only over the corpus — the only full pass is the
  * metadata-scale per-stratum count that [[ratesFor]] folds on the driver
  * (one row per source, never row data). Sampling decisions are pure
  * functions of the row key, so the SAME rows are kept on any cluster
  * size, any partitioning, and any engine that can evaluate the selector —
  * re-runs and incremental appends stay consistent, unlike `df.sample`,
  * whose outcome changes with partition layout.
  */
object Mixing {

  /** Deterministic uniform-[0,1) selector from a non-negative integer key:
    * Knuth's multiplicative hash (TAOCP vol. 3 §6.4) taken mod 2^32.
    * Portable — any SQL engine evaluates the same arithmetic to the same
    * double, so a sampled table is re-derivable outside Spark (the
    * correctness oracle exercises exactly that).
    *
    * Domain: |key| < 2^31 keeps `key * 2654435761` inside int64 under
    * ANSI overflow checking. For arbitrary 64-bit or composite keys use
    * [[uniformHash]] (xxhash64-mixed, Spark-only).
    */
  def uniform(key: Column): Column =
    pmod(key.cast("long") * lit(2654435761L), lit(4294967296L))
      .cast("double") / lit(4294967296.0)

  /** Deterministic uniform-[0,1) from any key (or several), xxhash64-mixed:
    * full-strength avalanche for production keys; not expressible outside
    * Spark. The seed picks an independent sampling universe. */
  def uniformHash(seed: Long, keys: Column*): Column =
    (xxhash64((lit(seed) +: keys): _*).cast("double") / lit(1.8446744073709552e19)) + lit(0.5)

  /** Keep each row with its stratum's rate: `uniform(key) < rate`.
    * Map-only; strata missing from `rates` keep `defaultRate`. */
  def sampleStrata(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.where(uniform(col(keyCol)) < rate)
  }

  /** Largest-subsample rates that hit target mixture proportions exactly
    * (in expectation) while keeping the most data: the stratum with the
    * scarcest supply relative to its target keeps 100% and every other
    * stratum downsamples to match. Counts fold on the driver — one row
    * per stratum.
    *
    * targets must cover every stratum present and sum to ~1.
    */
  def ratesFor(
      df: DataFrame,
      strataCol: String,
      targets: Map[String, Double]): Map[String, Double] = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.keySet.subsetOf(targets.keySet),
      s"targets missing strata: ${counts.keySet -- targets.keySet}")
    // total output size T maximal s.t. target_s * T <= n_s for all s
    val totalOut = counts.map { case (s, n) => n / targets(s) }.min
    counts.map { case (s, n) => s -> math.min(1.0, targets(s) * totalOut / n) }
  }

  /** One-call mixture: compute rates for the target proportions, then
    * sample. Returns (sampled, rates) so callers can log/replay rates. */
  def mixToProportions(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      targets: Map[String, Double]): (DataFrame, Map[String, Double]) = {
    val rates = ratesFor(df, strataCol, targets)
    (sampleStrata(df, strataCol, keyCol, rates, defaultRate = 0.0), rates)
  }

  /** Deterministic global shuffle for training order: sort by a seeded
    * hash of the key. One range-partitioned sort (Spark samples bounds;
    * no single-node bottleneck); the order is a pure function of
    * (seed, keys) — stable across cluster sizes and re-runs. */
  def deterministicShuffle(df: DataFrame, seed: Long, keyCols: String*): DataFrame =
    df.orderBy(xxhash64((lit(seed) +: keyCols.map(col)): _*), col(keyCols.head))

  /** [[deterministicShuffle]] with the engine-portable [[uniform]] draw
    * instead of xxhash64: the training order is re-derivable by ANY
    * engine from the same arithmetic (the oracle replays the first rows
    * of the epoch in DuckDB). Same scale shape — one range-partitioned
    * sort. Key domain: non-negative ints < 2^31 (see [[uniform]]). */
  def portableShuffle(df: DataFrame, keyCol: String): DataFrame =
    df.orderBy(uniform(col(keyCol)), col(keyCol))

  /** Deterministic exact-N sample per stratum: the N rows with the
    * smallest `uniform(key)` draw in each stratum — rate-free sampling
    * when the contract is a COUNT ("exactly 10k eval docs per language"),
    * where [[sampleStrata]]'s rates only hit the target in expectation.
    * The kept set is a pure function of the data (hash order, ties broken
    * by the hash's key), so re-runs, engines, and cluster sizes agree.
    * One window shuffle on the stratum; per-group sort is the standard
    * window cost. */
  def sampleExactN(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(uniform(col(keyCol)), col(keyCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n)
      .drop("_rn")
  }

  /** Temperature-flattened mixture quotas (the multilingual-training
    * reweighting: a stratum's target share is `count^tau / Σ count^tau`,
    * `tau < 1` flattening the head so low-resource strata survive),
    * integerized to EXACTLY `total` rows by largest-remainder
    * apportionment (Hamilton's method), ties broken on stratum name.
    *
    * Engine-portable by construction: weights are integer-scaled
    * (`floor(1e6 * count^tau)`, with `tau = 0.5` routed through the
    * correctly-rounded `sqrt`), so apportionment is pure bigint
    * arithmetic — no float sums whose value depends on iteration order.
    * The per-stratum count table is metadata-scale (one row per
    * language/source), so the apportionment folds on the driver like
    * [[ratesFor]]; row data never leaves the cluster.
    */
  def temperatureQuotas(
      df: DataFrame,
      strataCol: String,
      total: Long,
      tau: Double = 0.5): Map[String, Long] = {
    // Cast to string (non-string strata columns are fine) and coalesce
    // nulls to "" so a null stratum gets a real quota instead of an NPE
    // here and a silent zero in sampleQuotas' literal-map lookup.
    val counts = df
      .groupBy(coalesce(col(strataCol).cast("string"), lit("")).as("_k"))
      .agg(count(lit(1)).as("_c"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val w = counts.map { case (k, c) =>
      val scaled = if (tau == 0.5) math.sqrt(c.toDouble)
        else math.pow(c.toDouble, tau)
      k -> math.floor(1e6 * scaled).toLong
    }
    val bigW = w.map(_._2).sum
    if (bigW == 0L) return counts.map { case (k, _) => k -> 0L }.toMap
    // base share by exact integer division; distribute the deficit to the
    // largest remainders (tie: stratum name order — already sorted)
    val base = w.map { case (k, wk) =>
      (k, (total * wk) / bigW, (total * wk) % bigW)
    }
    val deficit = (total - base.map(_._2).sum).toInt
    val bump = base.sortBy { case (k, _, rem) => (-rem, k) }
      .take(deficit).map(_._1).toSet
    base.map { case (k, b, _) => k -> (if (bump(k)) b + 1 else b) }.toMap
  }

  /** Draw the temperature-flattened mixture: each stratum contributes its
    * [[temperatureQuotas]] quota of rows, chosen as the stratum's
    * smallest-[[uniform]]-draw head (so the kept set is a pure function
    * of the data, like [[sampleExactN]]). One window shuffle on the
    * stratum; quotas ride in as a literal map (metadata-scale). */
  def temperatureSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      total: Long,
      tau: Double = 0.5): DataFrame =
    sampleQuotas(df, strataCol, keyCol,
      temperatureQuotas(df, strataCol, total, tau))

  /** Exact per-stratum quota sample: stratum k contributes its
    * `quotas(k)` smallest-[[uniform]]-draw rows (strata absent from the
    * map contribute none). The quota map rides in as a literal
    * expression — metadata-scale, no join. */
  def sampleQuotas(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      quotas: Map[String, Long]): DataFrame = {
    // same null/typing normalization as temperatureQuotas, so a quota
    // keyed "" reaches null-stratum rows instead of silently dropping them
    val key = coalesce(col(strataCol).cast("string"), lit(""))
    val quotaCol = quotas.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (k, q)) =>
        when(key === k, lit(q)).otherwise(acc)
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(uniform(col(keyCol)), col(keyCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= quotaCol)
      .drop("_rn")
  }

  /** Fractional-epoch upsampling ("source X is seen 1.4 epochs"): every
    * row appears `floor(e)` times, plus once more for the
    * `uniform(key) < frac(e)` head — so a stratum's expected multiplicity
    * is exactly its repeat factor, the kept set is a pure function of the
    * data, and the emitted copy index (`_epoch`, 1-based) lets the
    * training-order shuffle spread copies apart. Map-only: one explode of
    * a per-row sequence, no shuffle, no driver state. Strata absent from
    * `epochs` default to 1.0 (seen once). */
  def upsampleEpochs(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      epochs: Map[String, Double]): DataFrame = {
    val eCol = epochs.toSeq.sortBy(_._1)
      .foldLeft(lit(1.0)) { case (acc, (k, e)) =>
        when(col(strataCol) === k, lit(e)).otherwise(acc)
      }
    val whole = floor(eCol).cast("long")
    val copies = (whole +
      when(uniform(col(keyCol)) < (eCol - whole), 1L).otherwise(0L))
      .cast("long")
    df.withColumn("_epoch",
        explode(when(copies <= 0L, array().cast("array<bigint>"))
          .otherwise(sequence(lit(1L), copies))))
  }

  /** Per-group contribution cap: keep at most `maxPerKey` rows per
    * `groupCol`, preferring the lowest `orderCol` — the crawl-pipeline
    * step that stops any single domain/source from dominating the corpus
    * (the counterpart of [[sampleStrata]] when the cap is a COUNT, not a
    * rate). One window shuffle on the group key; the per-group sort is
    * bounded and deterministic, so the kept set is a pure function of the
    * data. */
  def capPerKey(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      maxPerKey: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= maxPerKey)
      .drop("_rn")
  }

  /** Fill a TOKEN budget in priority order: keep exactly the documents
    * whose INCLUSIVE running token total — in (`priorityCol` DESC,
    * `idCol` ASC) order — fits `budget`. The "select the best N tokens"
    * corpus-assembly pass: [[sampleExact]] pins a row count,
    * `temperatureMix` a source mixture; this pins the TOKEN volume the
    * training run will actually consume.
    *
    * Distributed two-phase prefix sum (the [[Packing.withStreamStart]]
    * shape, keyed on the selection order instead of a unique id):
    * range-bucket on the COMPOSITE (negated priority, id) selection key —
    * boundaries are order statistics of a bounded deterministic sample,
    * so a constant or low-cardinality priority column (round 8's
    * degenerate case: every row in one value-range bucket → a single-task
    * global window) still splits into parallel buckets by id. Per-bucket
    * token sums fold to driver-side offsets (bucket-count scale, never
    * row data) and within-bucket running sums run as parallel windows —
    * no global single-partition window for ANY input distribution. Equal
    * (priority, id) pairs share a running total (SQL RANGE-frame
    * semantics, identical in any engine that replays the selection) and
    * are never split across buckets (bucket id is a pure function of the
    * pair's value). Null priorities or token counts are REJECTED loudly:
    * a null priority would sort first (asc nulls-first on the negated
    * key) and silently consume budget as highest priority. */
  def selectTokenBudget(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      priorityCol: String,
      budget: Long,
      numBuckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val key = col(priorityCol).cast("double") * lit(-1.0) // asc == priority desc
    val b = tokenBudgetBucketed(df, idCol, tokensCol, priorityCol, numBuckets)
    // per-bucket sums -> exclusive driver-side prefix (bucket-count
    // scale). The null-input validation rides THIS aggregation instead
    // of a dedicated scan (null keys fall into the otherwise-bucket, so
    // no row escapes the check) — one pass, not two, over the corpus
    val sums0 = b.groupBy("_tb_b").agg(
        sum(col(tokensCol)).cast("long").as("_s"),
        sum(when(col(priorityCol).isNull.or(col(tokensCol).isNull), 1L)
          .otherwise(0L)).as("_nulls"))
      .collect()
    if (sums0.isEmpty) return df.limit(0) // empty input
    val nulls = sums0.map(_.getLong(2)).sum
    require(nulls == 0L,
      s"selectTokenBudget: $nulls rows have a null " +
        s"$priorityCol or $tokensCol — filter or default them first " +
        s"(a null priority would silently rank highest)")
    val sums = sums0.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nb = sums.keySet.maxOption.getOrElse(0) + 1
    val offsets = (0 until nb).scanLeft(0L)((acc, i) => acc + sums.getOrElse(i, 0L))
    import spark.implicits._
    val offDf = (0 until nb).map(i => (i, offsets(i))).toDF("_tb_b", "_tb_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_tb_b").orderBy(key, col(idCol))
    b.join(broadcast(offDf), "_tb_b")
      .withColumn("_tb_run",
        col("_tb_off") + sum(col(tokensCol)).over(w)) // inclusive running sum
      .where(col("_tb_run") <= budget)
      .drop("_tb_b", "_tb_off", "_tb_run")
  }

  /** The bucketing half of [[selectTokenBudget]], exposed for tests: adds
    * `_tb_b`, an Int bucket id that is (a) a pure function of the row's
    * (priority, id) value — equal pairs never split, both plan executions
    * see identical assignments — and (b) ordered: every row of bucket i
    * precedes every row of bucket i+1 in (priority DESC, id ASC) order.
    *
    * Boundaries come from a bounded deterministic sample (the smallest-
    * xxhash64 rows, the [[Similarity]] trainer trick), sorted by the
    * selection order and sliced at even ranks — order statistics that
    * adapt to ANY distribution, including a constant priority where a
    * value-range split has zero information and collapses. */
  private[graft] def tokenBudgetBucketed(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      priorityCol: String,
      numBuckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val buckets =
      if (numBuckets > 0) numBuckets
      else spark.sessionState.conf.numShufflePartitions
    val key = col(priorityCol).cast("double") * lit(-1.0)
    val sampleCap = math.max(buckets * 64, 1024)
    // ordered (key, id) sample: hash-pick (deterministic, ~uniform), then
    // re-sort the <=cap survivors by the selection order for slicing
    val sample = df
      .select(key.as("_k"), col(idCol).as("_i"))
      // boundaries come from non-null keys only; null-priority rows land
      // in the otherwise-bucket and are rejected by the caller's check
      // (which must FIRE, not be preempted by an NPE slicing a null key)
      .where(col("_k").isNotNull)
      .withColumn("_h", xxhash64(col("_i"), col("_k")))
      .orderBy(col("_h"), col("_k"), col("_i")).limit(sampleCap)
      .select("_k", "_i")
      .orderBy(col("_k"), col("_i"))
      .collect()
    val step = math.max(1, sample.length / buckets)
    val bnds: Seq[(Double, Any)] = (1 until buckets)
      .map(_ * step).filter(_ < sample.length)
      .map(i => (sample(i).getDouble(0), sample(i).get(1)))
      .distinct
    val bucketExpr = bnds.zipWithIndex.foldRight(lit(bnds.length)) {
      case (((bk, bi), idx), els) =>
        when(key < lit(bk) or (key === lit(bk) and col(idCol) <= lit(bi)),
          lit(idx)).otherwise(els)
    }
    df.withColumn("_tb_b", bucketExpr)
  }
}
