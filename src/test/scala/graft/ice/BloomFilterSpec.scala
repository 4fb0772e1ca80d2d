package graft.ice

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.column.values.bloomfilter.BloomFilter
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.functions._

/** `bloomFilterColumns` writes parquet split-block bloom filters so point
  * lookups on high-cardinality UNSORTED keys skip row groups that min/max
  * stats can't (every row group spans nearly the full key range). The
  * footer must actually carry the filter, membership must hold for
  * present keys (no false negatives — correctness of the skip), and the
  * query path must stay exact.
  */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(root: String): Seq[Path] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(root, "_data"), true)
    val out = Seq.newBuilder[Path]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f.getPath
    }
    out.result()
  }

  private def bloomOf(file: Path, column: String): Option[BloomFilter] = {
    val in = HadoopInputFile.fromPath(file, spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try {
      val rg = r.getRowGroups.get(0)
      import scala.jdk.CollectionConverters._
      rg.getColumns.asScala.find(_.getPath.toDotString == column)
        .flatMap(c => Option(r.getBloomFilterDataReader(rg).readBloomFilter(c)))
    } finally r.close()
  }

  test("bloom filters are written for configured columns and admit present keys") {
    val table = new IceTable(spark, tmpDir("bloom"), IceTableConfig(
      partitionExpr = lit("all"),
      sortOrder = Seq("ord"), // sorted on a DIFFERENT key: id stays scattered
      bloomFilterColumns = Seq("id", "name"),
      bloomFilterNdv = Some(100000L)))
    // name is unique per row: a low-cardinality string column would stay
    // fully dictionary-encoded and parquet-mr would (correctly) drop its
    // bloom filter — the dictionary already gives exact membership
    val df = (0 until 50000)
      .map(i => (i.toLong * 7919 % 50021, s"doc-$i-${i * 31}", i.toLong))
      .toDF("id", "name", "ord")
    table.insert(df)

    val files = dataFiles(table.root)
    assert(files.nonEmpty)
    for (f <- files) {
      val idBloom = bloomOf(f, "id")
      assert(idBloom.nonEmpty, s"no bloom filter for 'id' in $f")
      val h = idBloom.get.hash(java.lang.Long.valueOf(42L * 7919 % 50021))
      assert(idBloom.get.findHash(h), "present key must test positive")
      val nameBloom = bloomOf(f, "name")
      assert(nameBloom.nonEmpty, s"no bloom filter for 'name' in $f")
      val nh = nameBloom.get.hash(Binary.fromString("doc-17-527"))
      assert(nameBloom.get.findHash(nh))
      // the un-configured column writes no bloom bits
      assert(bloomOf(f, "ord").isEmpty, "'ord' must not carry a bloom filter")
    }

    // needle query stays exact through the bloom-consulting reader path
    val needle = 12345L * 7919 % 50021
    val expected = df.where(col("id") === needle).count()
    assert(table.read().where(col("id") === needle).count() == expected)
  }

  test("declared ndv is not silently truncated by parquet's 1MB cap") {
    // Regression: parquet.bloom.filter.max.bytes defaults to 1 MB; an ndv
    // in the millions needs several MB of bits at 1% fpp, and the silent
    // truncation collapsed the fpp until row-group skipping stopped
    // working. The writer must raise the cap to the declared sizing.
    val ndv = 2_600_000L
    val table = new IceTable(spark, tmpDir("bloom_size"), IceTableConfig(
      partitionExpr = lit("all"),
      sortOrder = Seq("ord"),
      bloomFilterColumns = Seq("id"),
      bloomFilterNdv = Some(ndv)))
    table.insert((0 until 100000).map(i => (i.toLong * 2654435761L, i.toLong))
      .toDF("id", "ord"))
    val f = dataFiles(table.root).head
    val bloom = bloomOf(f, "id").getOrElse(fail("no bloom written"))
    val optimalBits = org.apache.parquet.column.values.bloomfilter
      .BlockSplitBloomFilter.optimalNumOfBits(ndv, 0.01)
    assert(bloom.getBitsetSize.toLong * 8 >= optimalBits,
      s"bloom truncated: ${bloom.getBitsetSize} bytes < optimal ${optimalBits / 8}")
  }

  test("merge preserves bloom filters on the compacted output") {
    val table = new IceTable(spark, tmpDir("bloom_merge"), IceTableConfig(
      partitionExpr = lit("all"),
      sortOrder = Seq("ord"),
      bloomFilterColumns = Seq("id")))
    (0 until 3).foreach { b =>
      table.insert((0 until 1000)
        .map(i => ((b * 1000 + i).toLong, i.toLong)).toDF("id", "ord"))
      Thread.sleep(2)
    }
    table.optimize(maxFileSize = 1L << 30, maxFileCount = 100)
    val alive = table.snapshot().aliveFiles
    assert(alive.length == 1, "optimize should compact to one file")
    val f = new Path(table.root, alive.head.path)
    assert(bloomOf(f, "id").nonEmpty, "compacted file lost the bloom filter")
    assert(table.read().where(col("id") === 2999L).count() == 1)
  }
}
