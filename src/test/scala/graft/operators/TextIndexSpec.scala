package graft.operators

import graft.SparkSpec
import graft.ice.IceTable
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("tidx_spec").toString

  private val docs = Seq(
    (1L, "spark query engine runs the query plan"),
    (2L, "window functions over a spark stream"),
    (3L, "parquet files and row groups"),
    (4L, "query optimizer with window pruning and spark shuffles"),
    (5L, "")).toDF("doc_id", "text")

  test("postings carry per-doc tf and denormalized dl; empty docs emit nothing") {
    val p = TextIndex.postings(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(p((1L, "query")) == (2L, 7L)) // tf 2, doc length 7
    assert(p((2L, "spark")) == (1L, 6L))
    assert(!p.keys.exists(_._1 == 5L)) // token-less doc absent
  }

  test("index-backed BM25 is bit-identical to the full-scan form") {
    val index = new IceTable(spark, newRoot(), TextIndex.indexConfig(buckets = 8))
    val stats = new IceTable(spark, newRoot(), TextIndex.statsConfig)
    // two incremental batches + compaction: the query must not care
    TextIndex.indexBatch(index, stats, docs.where($"doc_id" <= 2), "doc_id", "text")
    TextIndex.indexBatch(index, stats, docs.where($"doc_id" > 2), "doc_id", "text")
    index.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    stats.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    val terms = Seq("spark", "query", "window")
    val fromIndex = TextIndex.bm25TopK(index, stats, terms, buckets = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fullScan = Search.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == fullScan)
    assert(fromIndex.nonEmpty && fromIndex.map(_._1).contains(4L))
  }

  test("stats MV collapses to one row per batch and re-sums through merges") {
    val stats = new IceTable(spark, newRoot(), TextIndex.statsConfig)
    stats.insert(TextIndex.docStats(docs.where($"doc_id" <= 2), "doc_id", "text"))
    stats.insert(TextIndex.docStats(docs.where($"doc_id" > 2), "doc_id", "text"))
    assert(stats.read().count() == 2L) // one row per batch pre-merge
    stats.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    val r = stats.read().collect()
    assert(r.length == 1) // merged to a single state row
    // empty-text doc 5 counts with dl=1, matching the full-scan universe
    assert(r.head.getLong(0) == 5L)
    assert(r.head.getLong(1) == 7L + 6L + 5L + 8L + 1L)
  }

  test("delete markers: query equals a fresh index over the surviving corpus") {
    val index = new IceTable(spark, newRoot(), TextIndex.indexConfig(buckets = 8))
    val stats = new IceTable(spark, newRoot(), TextIndex.statsConfig)
    val dels = new IceTable(spark, newRoot(), TextIndex.deleteConfig)
    TextIndex.indexBatch(index, stats, docs, "doc_id", "text")
    // delete the top-scoring doc 4 — TWICE, then compact: markers must
    // dedup (idempotent deletes), not double-subtract the doc's stats
    TextIndex.deleteDocs(dels, docs.where($"doc_id" === 4), "doc_id", "text")
    TextIndex.deleteDocs(dels, docs.where($"doc_id" === 4), "doc_id", "text")
    dels.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    assert(dels.read().count() == 1L) // compaction collapsed the re-mark
    val terms = Seq("spark", "query", "window")
    val got = TextIndex.bm25TopK(index, stats, terms, buckets = 8, k = 10,
      deletes = Some(dels))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // oracle: full-scan BM25 over the corpus WITHOUT doc 4 — N, avgdl,
    // df all shift, so bit-parity proves the stats retraction is exact
    val expect = Search.bm25TopK(docs.where($"doc_id" =!= 4),
      "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect)
    assert(!got.map(_._1).contains(4L) && got.nonEmpty)
  }

  test("asOfTs time-travels the whole search to a consistent horizon") {
    val index = new IceTable(spark, newRoot(), TextIndex.indexConfig(buckets = 8))
    val stats = new IceTable(spark, newRoot(), TextIndex.statsConfig)
    TextIndex.indexBatch(index, stats, docs.where($"doc_id" <= 2), "doc_id", "text")
    Thread.sleep(3)
    val mid = System.currentTimeMillis()
    Thread.sleep(3)
    TextIndex.indexBatch(index, stats, docs.where($"doc_id" > 2), "doc_id", "text")
    index.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    val terms = Seq("spark", "query", "window")
    // the as-of query must equal a full scan over ONLY the batch-1 corpus
    // (N, avgdl, df all at the old horizon) even though the live table
    // has since doubled and compacted
    val got = TextIndex.bm25TopK(index, stats, terms, buckets = 8, k = 10,
      asOfTs = mid)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expect = Search.bm25TopK(docs.where($"doc_id" <= 2),
      "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect && got.nonEmpty)
    assert(!got.map(_._1).contains(4L)) // batch-2 docs invisible at mid
  }

  test("streaming index maintenance is exactly-once under batch replay") {
    // the foreachBatch composition: postings and stats each commit with
    // the micro-batch id (IceTable.insertBatch); a crash-replayed batch
    // is detected from each table's own log fold and skipped, so the
    // index never double-counts a document
    val index = new IceTable(spark, newRoot(), TextIndex.indexConfig(buckets = 8))
    val stats = new IceTable(spark, newRoot(), TextIndex.statsConfig)
    def deliver(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      index.insertBatch(TextIndex.postings(batch, "doc_id", "text"), "idx", id)
      stats.insertBatch(TextIndex.docStats(batch, "doc_id", "text"), "st", id)
      ()
    }
    deliver(docs.where($"doc_id" <= 2), 0)
    deliver(docs.where($"doc_id" <= 2), 0) // at-least-once redelivery
    deliver(docs.where($"doc_id" > 2), 1)
    deliver(docs.where($"doc_id" > 2), 1)
    val r = stats.read().agg(sum("n_docs"), sum("sum_dl")).head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 27L) // counted once each
    val terms = Seq("spark", "query", "window")
    val got = TextIndex.bm25TopK(index, stats, terms, buckets = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expect = Search.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect)
  }

  test("syncFromFeed keeps the index bit-identical to a full scan as the corpus mutates") {
    import graft.ice.{DeleteVectors, IceTableConfig}
    val src = new IceTable(spark, newRoot(), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("doc_id"), lit(2))),
      sortOrder = Seq("doc_id")))
    src.insert(docs)
    val index = new IceTable(spark, newRoot(), TextIndex.indexConfig(buckets = 8))
    val stats = new IceTable(spark, newRoot(), TextIndex.statsConfig)
    val dels = new IceTable(spark, newRoot(), TextIndex.deleteConfig)
    assert(TextIndex.syncFromFeed(src, index, stats, dels, "doc_id", "text")
      === ((5L, 0L)))
    val terms = Seq("spark", "query", "window")
    def fromIndex = TextIndex.bm25TopK(index, stats, terms, buckets = 8,
        k = 10, deletes = Some(dels))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def fullScan = Search.bm25TopK(src.read(), "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == fullScan)

    // churn window: a doc updated TWICE (the middle version must cancel
    // to zero), a MoR delete, a fresh insert, and an insert-then-delete
    // (born and dead inside the window)
    src.updateWhere($"doc_id" === 2L,
      Seq("text" -> lit("window window spark revised text")))
    src.updateWhere($"doc_id" === 2L,
      Seq("text" -> lit("spark window twice updated query")))
    DeleteVectors.deleteWhere(src, $"doc_id" === 4L)
    src.insert(Seq((6L, "fresh spark window doc entering the corpus"))
      .toDF("doc_id", "text"))
    src.insert(Seq((7L, "ghost spark doc")).toDF("doc_id", "text"))
    src.deleteWhere($"doc_id" === 7L)
    Thread.sleep(3) // settled bounds are now-1
    val (births, deaths) = TextIndex.syncFromFeed(
      src, index, stats, dels, "doc_id", "text")
    // births: doc2's two update versions + doc6 + doc7; deaths: doc2's
    // original + its first update version + doc4 + doc7
    assert(births === 4L && deaths === 4L)
    assert(fromIndex == fullScan)
    // the retired top-scorer is really gone, the new version scores
    assert(!fromIndex.map(_._1).contains(4L))

    // index-side maintenance never changes answers (merge SQL collapses
    // version duplicates, stats re-sum)
    index.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    stats.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    dels.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    assert(fromIndex == fullScan)

    // idle sync: nothing changed, no commits written anywhere
    val logs = Seq(index, stats, dels)
      .map(t => t.logio.currentLogFiles(t.root).size)
    assert(TextIndex.syncFromFeed(src, index, stats, dels, "doc_id", "text")
      === ((0L, 0L)))
    assert(Seq(index, stats, dels)
      .map(t => t.logio.currentLogFiles(t.root).size) === logs)

    // corpus compaction is feed-silent: sync after optimize is idle too
    src.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    Thread.sleep(3)
    assert(TextIndex.syncFromFeed(src, index, stats, dels, "doc_id", "text")
      === ((0L, 0L)))
    assert(fromIndex == fullScan)

    // GC physically drops retired postings; answers cannot change
    val before = index.read().count()
    assert(TextIndex.gcPostings(index, dels) > 0)
    val after = index.read().count()
    assert(after < before, s"GC must shrink the index ($before -> $after)")
    // surviving rows = exactly the live versions' postings
    val live = TextIndex.postings(
      src.read(), "doc_id", "text").count()
    assert(after === live)
    assert(fromIndex == fullScan)

    // a second GC right away is a NO-OP: the pre-probe finds no bucket
    // holding retired rows, so nothing rewrites and no commits land
    val logsAfterGc = index.logio.currentLogFiles(index.root).size
    assert(TextIndex.gcPostings(index, dels) === 0)
    assert(index.logio.currentLogFiles(index.root).size === logsAfterGc)
  }

  test("gcPostings is a no-op against a deletes table with no commits") {
    import graft.ice.IceTableConfig
    val index = new IceTable(spark, newRoot(), TextIndex.indexConfig(buckets = 8))
    val stats = new IceTable(spark, newRoot(), TextIndex.statsConfig)
    TextIndex.indexBatch(index, stats, docs, "doc_id", "text")
    // a deletes table that was never written — not even an `:init` pin
    val dels = new IceTable(spark, newRoot(),
      IceTableConfig(partitionExpr = lit("all"), sortOrder = Nil))
    assert(TextIndex.gcPostings(index, dels) === 0)
  }

  test("a query reads only its terms' bucket partitions") {
    val index = new IceTable(spark, newRoot(), TextIndex.indexConfig(buckets = 8))
    val stats = new IceTable(spark, newRoot(), TextIndex.statsConfig)
    TextIndex.indexBatch(index, stats, docs, "doc_id", "text")
    val snap = index.snapshot()
    val allParts = snap.aliveFiles.map(m => m.path.split("/")(1)).distinct
    assert(allParts.length > 1) // corpus spans multiple buckets
    // one term -> exactly the files of one bucket partition
    val bkt = spark.range(1)
      .select(TextIndex.bucketOf(lit("spark"), 8)).head().getLong(0)
    val pruned = index.readPartitions(Set(s"b=$bkt"))
    val prunedFiles = pruned.inputFiles.length
    val bucketFiles = snap.aliveFiles.count(_.path.startsWith(s"_data/b=$bkt/"))
    assert(prunedFiles == bucketFiles && prunedFiles < snap.aliveFiles.length)
    // and the pruned read still contains every 'spark' posting
    assert(pruned.where($"term" === "spark").count() == 3L)
  }

  test("driver-side bucket routing equals the engine hash for every bucket count") {
    // bucketOfLocal must stay operation-identical to the Column form the
    // router writes partitions with — a drift would silently prune to the
    // WRONG buckets and return empty results
    val terms = Seq("spark", "query", "window", "ätze", "", "a b", "7",
      "pneumonoultramicroscopic")
    for (buckets <- Seq(2, 8, 64, 1000)) {
      val engine = spark.range(1).select(terms.map(t =>
        TextIndex.bucketOf(lit(t), buckets)): _*).head().toSeq
      val local = terms.map(t => TextIndex.bucketOfLocal(t, buckets))
      assert(engine === local, s"buckets=$buckets")
    }
  }

  test("building a bm25TopK query launches ZERO Spark jobs (serving latency)") {
    val index = new IceTable(spark, newRoot(), TextIndex.indexConfig(buckets = 8))
    val stats = new IceTable(spark, newRoot(), TextIndex.statsConfig)
    val dels = new IceTable(spark, newRoot(), TextIndex.deleteConfig)
    TextIndex.indexBatch(index, stats, docs, "doc_id", "text")
    TextIndex.deleteDocs(dels, docs.where($"doc_id" === 3L), "doc_id", "text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val q = TextIndex.bm25TopK(index, stats, Seq("spark", "query"),
        buckets = 8, k = 10, deletes = Some(dels))
      org.apache.spark.graft.TestListenerBus.waitUntilEmpty(spark.sparkContext)
      // the old shape paid 4 driver actions before the caller's own: a
      // stats head, a deletes head, a one-row bucket job, a df collect
      assert(jobs.get() === 0,
        s"query construction must be job-free, saw ${jobs.get()}")
      // ...and the single caller action still computes correct scores
      assert(q.collect().map(_.getLong(0)).toSet === Set(1L, 2L, 4L))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
