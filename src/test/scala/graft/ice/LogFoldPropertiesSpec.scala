package graft.ice

import org.apache.hadoop.conf.Configuration
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck model-based properties of the log fold (SURVEY §5):
  * last-writer-wins per path, time-travel monotonicity, filename codec
  * round-trip. The model is a plain Map fold; the subject is the real
  * IceLogIO over the local FS.
  */
class LogFoldPropertiesSpec extends AnyFunSuite {

  private val logio = new IceLogIO("prop-host", new Configuration())

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  private case class W(path: String, bytes: Long, tombstone: Option[Long])
  private val genWrite: Gen[W] = for {
    p <- Gen.choose(0, 5)
    f <- Gen.choose(0, 9)
    b <- Gen.choose(1L, 1000L)
    t <- Gen.option(Gen.choose(1L, 100L))
  } yield W(s"_data/p=$p/f$f.parquet", b, t)

  private val genBatches: Gen[List[List[W]]] =
    Gen.listOfN(8, Gen.nonEmptyListOf(genWrite)).map(_.take(8))

  test("checkpoint-seeded fold == raw fold under random append/checkpoint interleavings") {
    // checkpoints are a pure cache: wherever they land in the commit
    // stream, every subsequent snapshot must equal the raw whole-log fold
    val genOps: Gen[List[(List[W], Boolean)]] =
      Gen.listOfN(8, Gen.zip(Gen.nonEmptyListOf(genWrite), Gen.prob(0.4)))
    check(Prop.forAll(genOps) { ops =>
      val root = java.nio.file.Files.createTempDirectory("propckpt").toString
      val schema = Schema("a" -> "BIGINT")
      var ts = 1000L
      var ok = true
      ops.foreach { case (batch, ckpt) =>
        ts += 1000
        val markers = batch.map(w => FileMarker(w.path, ts, w.bytes, w.tombstone))
        logio.append(root, 1, schema, markers, timestamp = Some(ts))
        if (ckpt)
          logio.writeCheckpoint(root, logio.readAtMaxTime(root, ts + 1, useCheckpoints = false))
        val seeded = logio.readAtMaxTime(root, ts + 1)
        val raw = logio.readAtMaxTime(root, ts + 1, useCheckpoints = false)
        ok &&= seeded.files.map(m => (m.path, m.fileBytes, m.tombstone)).toSet ==
          raw.files.map(m => (m.path, m.fileBytes, m.tombstone)).toSet
        // time travel to every earlier boundary also agrees
        val mid = 1000L + 1000L * (1 + scala.util.Random.nextInt(
          math.max(1, ((ts - 1000L) / 1000L).toInt)))
        val sMid = logio.readAtMaxTime(root, mid + 1)
        val rMid = logio.readAtMaxTime(root, mid + 1, useCheckpoints = false)
        ok &&= sMid.files.map(m => (m.path, m.tombstone)).toSet ==
          rMid.files.map(m => (m.path, m.tombstone)).toSet
      }
      ok
    })
  }

  test("fold is last-writer-wins per path and time travel is monotonic") {
    check(Prop.forAll(genBatches) { batches =>
      val root = java.nio.file.Files.createTempDirectory("prop").toString
      val schema = Schema("a" -> "BIGINT")
      var ts = 1000L
      val model = scala.collection.mutable.LinkedHashMap.empty[String, W]
      val snapshots = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[String])]
      batches.foreach { batch =>
        ts += 1000
        val markers = batch.map(w => FileMarker(w.path, ts, w.bytes, w.tombstone))
        logio.append(root, 1, schema, markers, timestamp = Some(ts))
        // model: within a batch, later lines win; across batches, later logs win
        batch.foreach(w => model(w.path) = w)
        val snap = logio.readAtMaxTime(root, ts + 1)
        snapshots += ((ts + 1, snap.files.map(_.path).toSet))
      }
      val folded = logio.readAtMaxTime(root, ts + 1)
      val lww = folded.files.map(m => m.path -> ((m.fileBytes, m.tombstone))).toMap ==
        model.map { case (p, w) => p -> ((w.bytes, w.tombstone)) }.toMap
      val aliveOk = folded.aliveFiles.forall(_.tombstone.isEmpty)
      // path sets only grow over time (markers are never removed by appends)
      val monotonic = snapshots.sliding(2).forall {
        case scala.collection.Seq((_, a), (_, b)) => a.subsetOf(b)
        case _ => true
      }
      lww && aliveOk && monotonic
    })
  }

  test("filename codec round trips (ts, merged)") {
    check(Prop.forAll(Gen.choose(1L, 9_999_999_999_999L), Gen.oneOf(true, false)) {
      (ts, merged) =>
        val name = s"$ts${if (merged) "_m" else ""}_host-1.jsonl"
        IceLogIO.logFileInfo(s"_log/$name") == ((ts, merged))
    })
  }

  test("schema accumulate is order-insensitive on consistent inputs") {
    val pairs = List("a" -> "BIGINT", "b" -> "VARCHAR", "c" -> "DOUBLE", "d" -> "VARCHAR[]")
    check(Prop.forAll(Gen.listOfN(6, Gen.oneOf(pairs))) { seq =>
      val s = new Schema
      seq.foreach { case (c, t) => s.accumulate(Seq(c), Seq(t)) }
      seq.toSet.subsetOf(s.pairs.toSet) && s.pairs.toSet.subsetOf(pairs.toSet)
    })
  }
}
