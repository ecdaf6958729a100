package graft.textify

import scala.collection.mutable

/** Python-compatible scalar and JSON rendering.
  *
  * The reference emits text through CPython f-strings and `json.dumps`
  * (ref: src/language_variables/json.py:36-44, …statement_textification.py:366-375),
  * so byte-identity requires reproducing Python's float repr and JSON
  * serialization rules exactly.
  */
object PyFloat {

  /** CPython `repr(float)`: shortest round-trip digits; positional notation
    * for exponents in [-4, 16), else scientific `1.5e+16` with ≥2-digit
    * exponent; integral values keep a trailing `.0`.
    */
  def repr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"

    // shortest digit count 1..17 that round-trips
    var s: String = null
    var p = 1
    while (s == null && p <= 17) {
      val cand = String.format(java.util.Locale.ROOT, s"%.${p - 1}e", Double.box(d))
      if (cand.toDouble == d) s = cand
      p += 1
    }
    val Array(mant, expStr) = s.split("[eE]")
    val exp = expStr.toInt
    val neg = mant.startsWith("-")
    val rawDigits = mant.stripPrefix("-").replace(".", "")
    val digits = rawDigits.reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case x  => x
    }
    val sign = if (neg) "-" else ""
    if (exp >= -4 && exp < 16) {
      if (exp >= digits.length - 1)
        sign + digits + "0" * (exp - (digits.length - 1)) + ".0"
      else if (exp >= 0)
        sign + digits.take(exp + 1) + "." + digits.drop(exp + 1)
      else
        sign + "0." + "0" * (-exp - 1) + digits
    } else {
      val m = if (digits.length == 1) digits else digits.take(1) + "." + digits.drop(1)
      val es = if (exp < 0) "-" else "+"
      val ea = math.abs(exp)
      val epad = if (ea < 10) s"0$ea" else ea.toString
      s"$sign${m}e$es$epad"
    }
  }
}

/** Minimal ordered JSON AST + serializer matching CPython
  * `json.dumps(..., ensure_ascii=False)` with default separators `", "`/`": "`.
  * Object insert uses Python-dict semantics: re-inserting an existing key
  * replaces the value but keeps the original position.
  */
sealed trait PyJson {
  def dumps: String = PyJson.render(this)
}
final case class PyStr(s: String) extends PyJson
final case class PyArr(items: Seq[PyJson]) extends PyJson
final class PyObj extends PyJson {
  private[textify] val entries = mutable.LinkedHashMap.empty[String, PyJson]
  def put(k: String, v: PyJson): PyObj = { entries.put(k, v); this }
  def size: Int = entries.size
  def apply(k: String): PyJson = entries(k)
}

object PyJson {
  def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case '\b'          => sb.append("\\b")
      case '\f'          => sb.append("\\f")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.toString
  }

  def render(v: PyJson): String = v match {
    case PyStr(s)    => "\"" + escape(s) + "\""
    case PyArr(xs)   => xs.map(render).mkString("[", ", ", "]")
    case o: PyObj    =>
      o.entries.iterator
        .map { case (k, x) => "\"" + escape(k) + "\": " + render(x) }
        .mkString("{", ", ", "}")
  }
}
