package graft.ice

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ObjectNode, ArrayNode}
import scala.collection.mutable

/** Minimal JSON writer/reader for the transaction log.
  *
  * The writer reproduces Python's `json.dumps` default formatting
  * (`", "` / `": "` separators, `ensure_ascii=True`) so log files are
  * byte-compatible with the reference format
  * (/root/reference/icedb/log.py:127-137, ARCHITECTURE.md:19-100).
  */
object Json {
  private val mapper = new ObjectMapper()

  /** Python-json.dumps-compatible string escape (ensure_ascii=True). */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  def writeValue(v: Any): String = v match {
    case null                => "null"
    case s: String           => escape(s)
    case b: Boolean          => if (b) "true" else "false"
    case i: Int              => i.toString
    case l: Long             => l.toString
    case d: Double           => pythonRepr(d)
    case m: mutable.LinkedHashMap[_, _] =>
      m.map { case (k, vv) => s"${escape(k.toString)}: ${writeValue(vv)}" }
        .mkString("{", ", ", "}")
    case m: Map[_, _] =>
      m.map { case (k, vv) => s"${escape(k.toString)}: ${writeValue(vv)}" }
        .mkString("{", ", ", "}")
    case seq: Seq[_] => seq.map(writeValue).mkString("[", ", ", "]")
    case other => escape(other.toString)
  }

  /** Python `repr(float)`-compatible formatting (shortest round-trip, and
    * exponent form `1e+20` / `1e-07` where Python switches to it). Doubles
    * never appear in real log lines — markers/metadata are ints, schema
    * values are strings — but the byte-compatibility claim is kept honest.
    */
  def pythonRepr(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinite) return if (d > 0) "Infinity" else "-Infinity"
    val abs = math.abs(d)
    if (d == d.floor && abs < 1e16) f"$d%.1f"
    else if (abs >= 1e16 || (abs < 1e-4 && abs > 0)) {
      // Java "1.0E20" / "1.23E-7" → Python "1e+20" / "1.23e-07"
      val s = java.lang.Double.toString(d)
      val Array(mantissa0, exp0) = s.split("E")
      val mantissa =
        if (mantissa0.endsWith(".0")) mantissa0.dropRight(2) else mantissa0
      val expVal = exp0.toInt
      val sign = if (expVal < 0) "-" else "+"
      f"${mantissa}e$sign${math.abs(expVal)}%02d"
    } else java.lang.Double.toString(d)
  }

  /** Ordered-pairs object writer — field order is part of the log format. */
  def obj(fields: (String, Any)*): String =
    fields.map { case (k, v) => s"${escape(k)}: ${writeValue(v)}" }
      .mkString("{", ", ", "}")

  /** Parse a JSON object into an insertion-ordered map. */
  def parseObject(s: String): mutable.LinkedHashMap[String, Any] = {
    val node = mapper.readTree(s)
    require(node.isObject, s"expected JSON object, got: $s")
    fromNode(node.asInstanceOf[ObjectNode])
  }

  private def fromNode(node: ObjectNode): mutable.LinkedHashMap[String, Any] = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      out(e.getKey) = fromValue(e.getValue)
    }
    out
  }

  private def fromValue(n: com.fasterxml.jackson.databind.JsonNode): Any = n match {
    case o: ObjectNode => fromNode(o)
    case a: ArrayNode =>
      (0 until a.size()).map(i => fromValue(a.get(i))).toVector
    case v if v.isTextual => v.asText()
    case v if v.isIntegralNumber => v.asLong()
    case v if v.isFloatingPointNumber => v.asDouble()
    case v if v.isBoolean => v.asBoolean()
    case v if v.isNull => null
    case v => v.asText()
  }
}
