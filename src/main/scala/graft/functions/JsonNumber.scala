package graft.functions

/** serde_json-compatible rendering of finite doubles — the reference's
  * JSON documents are written by serde_json, whose number formatting is
  * Ryū "pretty" notation (shortest round-trip digits; fixed notation for
  * 1e-5 ≤ |v| < 1e16, scientific `d.ddde±x` with no plus sign
  * otherwise; integral values keep a `.0`). Spark's
  * `cast(double as string)` writes Java scientific notation (`1.0E7`)
  * instead — this formatter closes that gap so encodings compare
  * byte-for-byte.
  *
  * Shortest digits come from `java.lang.Double.toString` (shortest
  * uniquely-distinguishing decimal); only the notation is re-rendered.
  */
object JsonNumber {

  def format(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, "non-finite doubles are encoded as strings upstream")
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val (digits, sciExp) = digitsAndExp(math.abs(d))
    val body =
      if (sciExp >= -5 && sciExp <= 15) fixed(digits, sciExp)
      else scientific(digits, sciExp)
    if (neg) "-" + body else body
  }

  /** Shortest significant digits (no trailing zeros) + exponent e such
    * that value = 0.digits × 10^(e+1), i.e. d.dddd × 10^e. */
  private[functions] def digitsAndExp(a: Double): (String, Int) = {
    val s = java.lang.Double.toString(a) // "123.45" or "1.2345E12"
    val (mantissa, exp) = s.indexOf('E') match {
      case -1 => (s, 0)
      case i  => (s.substring(0, i), s.substring(i + 1).toInt)
    }
    val point = mantissa.indexOf('.')
    val raw = mantissa.substring(0, point) + mantissa.substring(point + 1)
    val lead = raw.indexWhere(_ != '0')
    val trimmedLead = raw.substring(lead)
    val digits = {
      val t = trimmedLead.reverse.dropWhile(_ == '0').reverse
      if (t.isEmpty) "0" else t
    }
    (digits, point - lead - 1 + exp)
  }

  private def fixed(digits: String, sciExp: Int): String =
    if (sciExp >= digits.length - 1)
      digits + "0" * (sciExp - digits.length + 1) + ".0"
    else if (sciExp >= 0)
      digits.substring(0, sciExp + 1) + "." + digits.substring(sciExp + 1)
    else
      "0." + "0" * (-sciExp - 1) + digits

  private def scientific(digits: String, sciExp: Int): String = {
    val mant =
      if (digits.length == 1) digits
      else digits.substring(0, 1) + "." + digits.substring(1)
    mant + "e" + sciExp
  }
}
