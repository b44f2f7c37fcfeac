package graft

/** Locale-independent fixed-decimal formatting for every machine-read
  * number the benches emit. Scala's f"" interpolator delegates to
  * `String.format` under the JVM DEFAULT locale, so on a decimal-comma
  * locale (de_DE, fr_FR, …) `f"$v%.3f"` prints `1,234` and the emitted
  * line is invalid JSON — the round harness's parse would fail. All
  * JSON/receipt emitters route through here instead (r12 advisor flag).
  */
object Fmt {
  def dec(v: Double, decimals: Int = 3): String =
    String.format(java.util.Locale.ROOT, "%." + decimals + "f", Double.box(v))

  /** Minimal JSON string escape for receipt lines that interpolate
    * caller-supplied paths — a quote or backslash in an argument must
    * not produce an unparseable receipt (r17 advisory; shared here in
    * r18 so each new emitter doesn't re-implement the unescaped form). */
  def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => String.format(java.util.Locale.ROOT, "\\u%04x", Int.box(c.toInt))
      case c => c.toString
    } + "\""
}
