package graft.ice

import org.apache.spark.sql.types._
import scala.collection.mutable

/** Raised when a column arrives with a different type than previously
  * recorded (reference: icedb/log.py:8-21,68-78). No coercion, not even
  * widening — BIGINT vs VARCHAR is an error.
  */
final class SchemaConflictException(
    val column: String,
    val currentType: String,
    val newType: String)
  extends RuntimeException(
    s"tried to convert schema to JSON with column '$column' conflicting types: " +
      s"$currentType, $newType")

final class NoLogFilesException extends RuntimeException("no log files found")

/** A maintenance commit (merge/recluster/rewrite) found at commit time
  * that a concurrent commit had already tombstoned or removed one of its
  * source files — proceeding would resurrect or duplicate rows. Routine
  * callers ([[IceTable.merge]], [[IceTable.optimize]]) catch this and
  * retry from a fresh snapshot; explicit-snapshot callers see it thrown. */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** Accumulated union schema: insertion-ordered `column -> SQL type string`
  * map. Columns are add-only; a type change raises SchemaConflictException.
  * (reference: icedb/log.py:59-108, ARCHITECTURE.md:45-64)
  */
final class Schema {
  private val d = mutable.LinkedHashMap.empty[String, String]

  def accumulate(columns: Seq[String], types: Seq[String]): Boolean = {
    var added = true
    columns.zip(types).foreach { case (col, colType) =>
      d.get(col) match {
        case Some(existing) =>
          added = false
          if (existing != colType)
            throw new SchemaConflictException(col, existing, colType)
        case None => ()
      }
      d(col) = colType
    }
    added
  }

  def columns: Seq[String] = d.keys.toSeq
  def types: Seq[String] = d.values.toSeq
  def pairs: Seq[(String, String)] = d.toSeq
  def contains(col: String): Boolean = d.contains(col)
  def apply(col: String): String = d(col)
  def size: Int = d.size
  def isEmpty: Boolean = d.isEmpty

  def toJson: String = Json.writeValue(d)

  /** The Spark StructType equivalent; all columns nullable
    * (ARCHITECTURE.md:64). */
  def toStructType: StructType =
    StructType(d.toSeq.map { case (c, t) =>
      StructField(c, SchemaTypes.toDataType(t), nullable = true)
    })

  override def toString: String = toJson

  def copy(): Schema = {
    val s = new Schema
    d.foreach { case (k, v) => s.d(k) = v }
    s
  }
}

object Schema {
  def apply(pairs: (String, String)*): Schema = {
    val s = new Schema
    pairs.foreach { case (c, t) => s.accumulate(Seq(c), Seq(t)) }
    s
  }

  def fromJson(line: String): Schema = {
    val m = Json.parseObject(line)
    val s = new Schema
    m.foreach { case (k, v) => s.accumulate(Seq(k), Seq(v.toString)) }
    s
  }

  def fromStructType(st: StructType): Schema = {
    val s = new Schema
    st.fields.foreach(f => s.accumulate(Seq(f.name), Seq(SchemaTypes.toTypeString(f.dataType))))
    s
  }

  /** A20 pre-flight validation (reference: examples/verify-schema.py:82-105):
    * returns conflicting columns between a known schema and an incoming one
    * without mutating either.
    */
  def conflicts(known: Schema, incoming: Schema): Seq[(String, String, String)] =
    incoming.pairs.flatMap { case (c, t) =>
      if (known.contains(c) && known(c) != t) Some((c, known(c), t)) else None
    }
}

/** Two-way dictionary between the log's SQL type-string vocabulary (DuckDB
  * style — SURVEY.md §1.2) and Spark DataTypes. The log keeps the string
  * form as the compat contract; Spark uses the DataType form.
  */
object SchemaTypes {
  def toTypeString(dt: DataType): String = dt match {
    case LongType            => "BIGINT"
    case IntegerType         => "INTEGER"
    case ShortType           => "SMALLINT"
    case ByteType            => "TINYINT"
    case DoubleType          => "DOUBLE"
    case FloatType           => "FLOAT"
    case StringType          => "VARCHAR"
    case BooleanType         => "BOOLEAN"
    case BinaryType          => "BLOB"
    case DateType            => "DATE"
    case TimestampType       => "TIMESTAMP"
    // NTZ collapses to TIMESTAMP (and round-trips as session-tz
    // TimestampType): the reference's vocabulary has a single timestamp
    // string; pipelines needing NTZ fidelity should store epoch BIGINT
    // like the reference does (SURVEY.md §1.2)
    case TimestampNTZType    => "TIMESTAMP"
    case d: DecimalType      => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(et, _)    => s"${toTypeString(et)}[]"
    case MapType(k, v, _)    => s"MAP(${toTypeString(k)}, ${toTypeString(v)})"
    case StructType(fields)  =>
      fields.map(f => s"${f.name} ${toTypeString(f.dataType)}").mkString("STRUCT(", ", ", ")")
    case other               => other.sql
  }

  def toDataType(s: String): DataType = {
    val t = s.trim
    val upper = t.toUpperCase
    upper match {
      case "BIGINT" | "INT64" | "INT8" | "LONG" | "HUGEINT" | "UBIGINT" => LongType
      case "INTEGER" | "INT" | "INT4" | "INT32"                         => IntegerType
      case "SMALLINT" | "INT2" | "INT16"                                => ShortType
      case "TINYINT" | "INT1"                                           => ByteType
      case "DOUBLE" | "FLOAT8"                                          => DoubleType
      // REAL is single-precision in the reference's (DuckDB) vocabulary
      case "FLOAT" | "FLOAT4" | "REAL"                                  => FloatType
      case "VARCHAR" | "TEXT" | "STRING" | "JSON" | "CHAR"              => StringType
      case "BOOLEAN" | "BOOL"                                           => BooleanType
      case "BLOB" | "BYTEA" | "BINARY"                                  => BinaryType
      case "DATE"                                                       => DateType
      case "TIMESTAMP" | "DATETIME" | "TIMESTAMP_NS" | "TIMESTAMP_MS"   => TimestampType
      case u if u.endsWith("[]") => ArrayType(toDataType(t.dropRight(2)), containsNull = true)
      case u if u.startsWith("DECIMAL") =>
        val inner = t.substring(t.indexOf('(') + 1, t.lastIndexOf(')'))
        val Array(p, sc) = inner.split(',').map(_.trim.toInt)
        DecimalType(p, sc)
      case u if u.startsWith("STRUCT(") =>
        StructType(splitTopLevel(t.substring(7, t.lastIndexOf(')'))).map { fld =>
          // field name may be quoted; type is everything after the first
          // top-level space outside quotes
          val (name, typ) = splitNameType(fld.trim)
          StructField(unquote(name), toDataType(typ), nullable = true)
        })
      case u if u.startsWith("MAP(") =>
        val parts = splitTopLevel(t.substring(4, t.lastIndexOf(')')))
        MapType(toDataType(parts(0)), toDataType(parts(1)), valueContainsNull = true)
      // Fail fast instead of silently reading Parquet with a mismatched
      // StringType (UUID/TIME/INTERVAL/ENUM... are not in the reference's
      // inference vocabulary — SURVEY.md §1.2).
      case other => throw new IllegalArgumentException(
        s"unsupported log schema type string: '$other'")
    }
  }

  /** Split on commas not nested inside parentheses. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  private def splitNameType(f: String): (String, String) = {
    if (f.startsWith("\"")) {
      val close = f.indexOf('"', 1)
      (f.substring(0, close + 1), f.substring(close + 1).trim)
    } else {
      val sp = f.indexOf(' ')
      (f.substring(0, sp), f.substring(sp + 1).trim)
    }
  }

  private def unquote(s: String): String =
    if (s.startsWith("\"") && s.endsWith("\"")) s.substring(1, s.length - 1) else s
}
