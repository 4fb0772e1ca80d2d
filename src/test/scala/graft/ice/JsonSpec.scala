package graft.ice

import org.scalatest.funsuite.AnyFunSuite

/** Byte-compatibility of the JSONL writer with Python json.dumps
  * (reference: icedb/log.py:127-137; fixture strings FIXTURES.md §1/§5). */
class JsonSpec extends AnyFunSuite {

  test("schema line matches the reference's exact-JSON assertion") {
    // integration_test.py:116
    val s = Schema(
      "ts" -> "BIGINT", "event" -> "VARCHAR",
      "user_id" -> "VARCHAR", "properties" -> "VARCHAR")
    assert(s.toJson ==
      """{"ts": "BIGINT", "event": "VARCHAR", "user_id": "VARCHAR", "properties": "VARCHAR"}""")
  }

  test("metadata/marker/tombstone lines use python separators and key order") {
    val meta = LogMetadata(1, 1, 2, None, 1700000000000L)
    assert(meta.json == """{"v": 1, "sch": 1, "f": 2, "t": 1700000000000}""")
    val metaTmb = LogMetadata(1, 1, 3, Some(2), 1700000000000L)
    assert(metaTmb.json == """{"v": 1, "sch": 1, "f": 3, "t": 1700000000000, "tmb": 2}""")
    val fm = FileMarker("_data/u=a/x.parquet", 1700000000001L, 693L)
    assert(fm.json == """{"p": "_data/u=a/x.parquet", "b": 693, "t": 1700000000001}""")
    val fmTmb = FileMarker("_data/u=a/x.parquet", 1700000000001L, 693L, Some(1700000000002L))
    assert(fmTmb.json ==
      """{"p": "_data/u=a/x.parquet", "b": 693, "t": 1700000000001, "tmb": 1700000000002}""")
    val lt = LogTombstone("_log/123_h.jsonl", 456L)
    assert(lt.json == """{"p": "_log/123_h.jsonl", "t": 456}""")
  }

  test("round trip: parse(write(x)) == x with order preserved") {
    val line = """{"v": 1, "sch": 1, "f": 3, "t": 99, "tmb": 2}"""
    assert(LogMetadata.fromJson(line).json == line)
    val m = """{"p": "_data/p/f.parquet", "b": 10, "t": 5, "tmb": 7}"""
    assert(FileMarker.fromJson(m).json == m)
  }

  test("string escaping is ensure_ascii compatible") {
    assert(Json.escape("héllo\n\"x\"") == "\"h\\u00e9llo\\n\\\"x\\\"\"")
  }

  test("double formatting matches python repr") {
    assert(Json.pythonRepr(1.0) == "1.0")
    assert(Json.pythonRepr(-3.0) == "-3.0")
    assert(Json.pythonRepr(0.5) == "0.5")
    assert(Json.pythonRepr(1e20) == "1e+20")
    assert(Json.pythonRepr(1.5e20) == "1.5e+20")
    assert(Json.pythonRepr(-1e20) == "-1e+20")
    assert(Json.pythonRepr(1e-7) == "1e-07")
    assert(Json.pythonRepr(1234.5678) == "1234.5678")
  }
}
