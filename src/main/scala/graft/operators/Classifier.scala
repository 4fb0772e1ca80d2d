package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based corpus filtering: a multinomial Naive Bayes text
  * classifier trained ON the cluster — the "quality classifier" step of
  * a web-scale pipeline (GPT-3/LLaMA-style: label a small trusted set,
  * train a cheap classifier, score everything). NB rather than logistic
  * regression because its sufficient statistics are COUNTS: training is
  * one tokenize + one groupBy over the corpus (no SGD iterations), which
  * is the right trade at 100 TB where every extra pass is a full scan.
  *
  * Scale shape: the per-(token, class) count table is pivoted to one row
  * per token (classes are few and known), so scoring is ONE hash join of
  * the exploded token stream against a vocabulary-sized table — broadcast
  * when the vocab fits — followed by one groupBy(doc) sum. Laplace
  * smoothing keeps out-of-vocabulary tokens finite; argmax ties break on
  * class name so decisions are deterministic.
  */
object Classifier {

  /** Per-class metadata: token total and doc count (for the prior). */
  final case class ClassStats(tokens: Long, docs: Long)

  /** Trained model: `wide` = (w, c_0..c_K-1) token-count table keyed by
    * CLASS INDEX (raw labels may contain '.', spaces, or backticks that
    * break column resolution — labels live only in `classes`/`stats` and
    * in cell values), per-class totals, vocabulary size, total docs.
    * `wide` is persisted at train time; call [[NbModel.release]] when the
    * model is no longer needed (long-lived sessions that train repeatedly
    * otherwise accumulate cached tables in executor storage). */
  final case class NbModel(
      wide: DataFrame,
      classes: Seq[String],
      stats: Map[String, ClassStats],
      vocabSize: Long,
      totalDocs: Long) {
    def release(): Unit = { wide.unpersist(); () }
  }

  /** Column-safe `score_*` output names for raw labels: non-identifier
    * chars become '_'; colliding sanitizations are disambiguated with the
    * class index. Deterministic — same label set, same names. */
  private[graft] def scoreNames(classes: Seq[String]): Seq[String] = {
    val sanitized = classes.map(_.replaceAll("[^A-Za-z0-9_]", "_"))
    sanitized.zipWithIndex.map { case (s, i) =>
      if (sanitized.count(_ == s) > 1) s"score_${s}_$i" else s"score_$s"
    }
  }

  /** Train multinomial NB on (textCol, labelCol). Two aggregation scans:
    * per-(token, class) counts (pivoted wide over the collected class
    * list — K values, metadata-scale) and per-class totals. */
  def trainNaiveBayes(df: DataFrame, textCol: String,
      labelCol: String): NbModel = {
    val classes = df.select(col(labelCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted // K class names only
    val toks = df.select(col(labelCol).cast("string").as("_cls"),
      explode(TextFunctions.tokens(col(textCol))).as("_w"))
      .where(length(col("_w")) > 0)
    val aggs = classes.zipWithIndex.map { case (c, i) =>
      sum(when(col("_cls") === c, 1L).otherwise(0L)).as(s"c_$i")
    }
    val wide = toks.groupBy(col("_w").as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .persist()
    val vocab = wide.count()
    val perClass = df.groupBy(col(labelCol).cast("string").as("_cls"))
      .agg(count(lit(1)).as("docs"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("toks"))
      .collect()
      .map(r => r.getString(0) -> ClassStats(r.getLong(2), r.getLong(1)))
      .toMap
    NbModel(wide, classes, perClass, vocab,
      perClass.valuesIterator.map(_.docs).sum)
  }

  /** Per-class posterior log10-score of one token row against the wide
    * count table: log10((c + 1) / (classTokens + V)). `c` is NULL for
    * out-of-vocabulary tokens — coalesced to 0, i.e. Laplace-smoothed. */
  private def tokenScore(m: NbModel, i: Int): Column = {
    val cls = m.classes(i)
    log10((coalesce(col(s"c_$i"), lit(0L)).cast("double") + 1.0) /
      lit(m.stats(cls).tokens.toDouble + m.vocabSize.toDouble))
  }

  /** Classify each doc: argmax over classes of
    * `log10 P(class) + Σ_tokens log10 P(token | class)`.
    * Returns (idCol, pred, score_<class> per class). Docs whose text
    * tokenizes to nothing get the prior-only argmax. */
  def classify(df: DataFrame, idCol: String, textCol: String,
      m: NbModel): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("_w"))
      .where(length(col("_w")) > 0)
    val joined = toks.join(m.wide.withColumnRenamed("w", "_w"), Seq("_w"), "left")
    val sums = m.classes.indices.map(i =>
      sum(tokenScore(m, i)).as(s"_s_$i"))
    val perDoc = joined.groupBy(idCol).agg(sums.head, sums.tail: _*)
    val names = scoreNames(m.classes)
    val withPrior = df.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol) +: m.classes.zipWithIndex.map { case (c, i) =>
        val prior = math.log10(m.stats(c).docs.toDouble / m.totalDocs.toDouble)
        (coalesce(col(s"_s_$i"), lit(0.0)) + lit(prior)).as(names(i))
      }: _*)
    // argmax with deterministic tie-break on class name (struct compare);
    // the RAW label rides as a value, immune to column-name sanitization
    val best = array_max(array(m.classes.zipWithIndex.map { case (c, i) =>
      struct(col(names(i)).as("s"), lit(c).as("c"))
    }: _*))
    withPrior.withColumn("pred", best.getField("c"))
  }
}
