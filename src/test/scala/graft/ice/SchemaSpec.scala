package graft.ice

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Port of schema_test.py (accumulate add/dup/conflict) plus the two-way
  * type dictionary. */
class SchemaSpec extends AnyFunSuite {

  test("accumulate: new columns added, duplicates ignored, returns flag") {
    val s = new Schema
    assert(s.accumulate(Seq("a", "b"), Seq("VARCHAR", "BIGINT")))
    // re-accumulating the same pair is a no-op that reports not-added
    assert(!s.accumulate(Seq("a"), Seq("VARCHAR")))
    assert(s.columns == Seq("a", "b"))
  }

  test("accumulate: type conflict raises (no coercion, not even widening)") {
    val s = Schema("user_id" -> "VARCHAR")
    val e = intercept[SchemaConflictException] {
      s.accumulate(Seq("user_id"), Seq("BIGINT"))
    }
    assert(e.column == "user_id")
    assert(e.getMessage.contains("VARCHAR"))
    assert(e.getMessage.contains("BIGINT"))
  }

  test("conflicts() pre-flight check (A20) finds mismatches without mutating") {
    val known = Schema("a" -> "VARCHAR", "b" -> "BIGINT")
    val incoming = Schema("a" -> "BIGINT", "c" -> "DOUBLE")
    assert(Schema.conflicts(known, incoming) == Seq(("a", "VARCHAR", "BIGINT")))
    assert(known.columns == Seq("a", "b"))
  }

  test("type dictionary round trips the reference vocabulary") {
    assert(SchemaTypes.toDataType("BIGINT") == LongType)
    assert(SchemaTypes.toDataType("REAL") == FloatType) // DuckDB REAL = float4
    assert(SchemaTypes.toDataType("DOUBLE") == DoubleType)
    assert(SchemaTypes.toDataType("VARCHAR[]") == ArrayType(StringType, true))
    assert(SchemaTypes.toDataType("STRUCT(ee VARCHAR, n BIGINT)") ==
      StructType(Seq(
        StructField("ee", StringType), StructField("n", LongType))))
    assert(SchemaTypes.toTypeString(LongType) == "BIGINT")
    assert(SchemaTypes.toTypeString(ArrayType(FloatType)) == "FLOAT[]")
    intercept[IllegalArgumentException] {
      SchemaTypes.toDataType("INTERVAL") // fail fast on unsupported strings
    }
  }

  test("toStructType: all columns nullable") {
    val st = Schema("a" -> "BIGINT", "b" -> "VARCHAR").toStructType
    assert(st.fields.forall(_.nullable))
  }
}
