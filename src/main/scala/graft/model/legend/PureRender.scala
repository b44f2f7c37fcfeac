package graft.model.legend

/** Canonical renderer: [[PureExpr]] AST → textual PURE — the inverse of
  * [[PureParser]], completing the reference's uncompiled-expectation
  * surface (`getExpectations(..., compile = false)` returns constraint
  * lambdas as PURE text, e.g. `$this.sme->isEmpty() || $this.sme->in(
  * ['Scala', 'Python', 'Java', 'R', 'SQL'])` —
  * reference: LegendEntityTest.scala:135-151, Legend.scala).
  *
  * The reference returns the entity's SOURCE text verbatim; graft
  * discards source offsets at load, so this renders a canonical
  * spelling instead: comparison/boolean/arithmetic functions as infix
  * operators, everything else arrow-style (`recv->f(args)`), minimal
  * parentheses by operator precedence. Canonical-vs-verbatim is
  * whitespace/sugar trivia only: LegendParserSpec proves
  * `parse(render(ast)) == ast` (round trip) and that the reference's
  * own pinned uncompiled strings parse to the very ASTs graft loads
  * from the wire format.
  */
object PureRender {
  import PureExpr._

  /** Precedence ladder, mirroring the parser: 1 or, 2 and, 3 compare,
    * 4 additive, 5 multiplicative, 6 unary, 7 postfix/primary. */
  private val Infix: Map[String, (String, Int)] = Map(
    "or" -> ("||", 1), "and" -> ("&&", 2),
    "equal" -> ("==", 3), "greaterThan" -> (">", 3),
    "greaterThanEqual" -> (">=", 3), "lessThan" -> ("<", 3),
    "lessThanEqual" -> ("<=", 3),
    "plus" -> ("+", 4), "minus" -> ("-", 4),
    "times" -> ("*", 5), "divide" -> ("/", 5))

  /** Functions conventionally written prefix-style in PURE sources. */
  private val Prefix = Set("if", "agg", "desc", "asc")

  def render(e: PureExpr): String = rend(e, 0)

  /** Render a lambda the way constraint/derivation sources spell it:
    * parameterless bodies bind `$this` and render bare. */
  def renderLambda(e: PureExpr): String = e match {
    case PLambda(Nil, body) => render(body)
    case other              => render(other)
  }

  private def rend(e: PureExpr, ctx: Int): String = e match {
    case PVar(n)         => s"$$$n"
    case PPtr(p)         => p
    case PTypeRef(p)     => s"@$p"
    case PEnum(p, v)     => s"$p.$v"
    case PProperty(r, n) => s"${rend(r, 7)}.$n"
    case PLit(sql)       => lit(sql)
    case PCollection(vs) => vs.map(rend(_, 0)).mkString("[", ", ", "]")
    case PLambda(ps, b)  => s"${ps.mkString(",")}|${rend(b, 0)}"

    // !(a == b) prints as a != b — the parser's only two-token operator
    case PFunc("not", Seq(PFunc("equal", Seq(a, b)))) =>
      paren(ctx > 3, s"${rend(a, 4)} != ${rend(b, 4)}")
    case PFunc("not", Seq(x)) => paren(ctx > 6, s"!${rend(x, 6)}")
    // single-argument minus is unary negation
    case PFunc("minus", Seq(x)) => paren(ctx > 6, s"-${rend(x, 6)}")
    case PFunc("getAll", Seq(p: PPtr)) => s"${rend(p, 7)}->getAll()"

    case PFunc(f, ps) if Infix.contains(f) =>
      val (op, prec) = Infix(f)
      // nary forms arrive as a single collection argument (plus([a,b,c]))
      val args = ps match { case Seq(PCollection(vs)) => vs; case other => other }
      // left-assoc levels: the leftmost child may share the precedence
      // level, the rest need one tighter to survive re-parsing unchanged.
      // EXCEPT comparisons (prec 3): the parser's cmp() is a single `if`,
      // not a loop — non-associative — so a comparison nested on either
      // side must parenthesize or `a == b == c` fails to re-parse.
      val s = args.zipWithIndex.map { case (a, i) =>
        rend(a, if (i == 0 && prec != 3) prec else prec + 1)
      }.mkString(s" $op ")
      paren(ctx > prec, s)

    case PFunc(f, ps) if Prefix.contains(f) || ps.isEmpty =>
      ps.map(rend(_, 0)).mkString(s"$f(", ", ", ")")
    case PFunc(f, recv +: rest) =>
      s"${rend(recv, 7)}->$f(${rest.map(rend(_, 0)).mkString(", ")})"
  }

  private def paren(need: Boolean, s: String): String = if (need) s"($s)" else s

  /** Invert the literal encodings [[PureExpr.parse]] / [[PureParser]]
    * bake into PLit: SQL string/date/boolean spellings → PURE source
    * spellings. Anything unrecognized (raw SQL injected mid-translation)
    * passes through untouched. */
  private def lit(sql: String): String = sql match {
    case "TRUE"  => "true"
    case "FALSE" => "false"
    case s if s.startsWith("DATE '") && s.endsWith("'") =>
      "%" + s.stripPrefix("DATE '").stripSuffix("'")
    case s if s.startsWith("TIMESTAMP '") && s.endsWith("'") =>
      "%" + s.stripPrefix("TIMESTAMP '").stripSuffix("'").replaceFirst(" ", "T")
    case s if s.length >= 2 && s.head == '\'' && s.last == '\'' =>
      // SQL '' un-doubles to ', re-escaped PURE-style as \'
      "'" + s.substring(1, s.length - 1).replace("''", "'")
        .replace("\\", "\\\\").replace("'", "\\'") + "'"
    case s => s
  }
}
