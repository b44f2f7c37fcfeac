package graft.model.legend

import graft.model.{GraftModel, GraftService}

/** Parser for TEXTUAL PURE lambdas and relational query pipelines — the
  * string form the reference's user-facing API accepts
  * (reference: LegendUtils.scala `buildLambda(lambdaString)`,
  * LegendPureTest.scala:43-118 — e.g.
  * `databricks::entity::employee->getAll()->filter(x|$x.highFives > 20)`).
  *
  * The reference hands the string to the legend-engine jars (grammar
  * parser + compiler); graft has no external compiler, so this is a
  * self-contained recursive-descent parser for the same practical subset
  * the protocol-JSON path supports. It produces the SAME [[PureExpr]]
  * AST the wire format parses into, so translation (PureToSql), the
  * relational verb walker (LegendLoader.compilePipeline), association
  * navigation, and every widening of the PURE subset apply to text
  * queries automatically — one AST, two front ends.
  *
  * Grammar subset (precedence low→high; `@` marks AST construction):
  * {{{
  *   expr      := or
  *   or        := and ('||' and)*                      @ func "or"
  *   and       := cmp ('&&' cmp)*                      @ func "and"
  *   cmp       := add (('=='|'!='|'>='|'<='|'>'|'<') add)?
  *   add       := mul (('+'|'-') mul)*                 @ plus/minus
  *   mul       := unary (('*'|'/') unary)*             @ times/divide
  *   unary     := '!' unary | '-' unary | postfix
  *   postfix   := primary ( '->' IDENT '(' args ')'    @ func(recv, args…)
  *                        | '.' IDENT )*               @ property access
  *   primary   := literal | '$' IDENT | collection | '(' expr ')'
  *              | IDENT '(' args ')'                   @ prefix call
  *              | path                                 @ element pointer
  *   args      := (lambda | expr) (',' (lambda | expr))*
  *   lambda    := IDENT (',' IDENT)* '|' body
  *              | '{' IDENT (',' IDENT)* '|' body '}'
  *              | '|' body                             @ zero-arg thunk
  *   body      := ('let' IDENT '=' expr ';')* expr ';'?  @ lets inlined
  *   collection:= '[' args? ']'
  *   path      := IDENT ('::' IDENT)*
  *   literal   := INT | FLOAT | STRING | 'true' | 'false' | '%' DATE
  * }}}
  *
  * Semantics notes pinned to the reference's tests:
  * - `Entity.all()` and `Entity->getAll()` both compile to
  *   `getAll(ptr)` (LegendPureTest uses both spellings).
  * - `Enum.VALUE` parses as a property access on an element pointer —
  *   exactly the shape the wire format emits for `DurationUnit.YEARS` —
  *   and resolves to an enum literal when the path names an enumeration
  *   of the model ([[parse(text, enums)]]).
  * - The engine wraps nullable comparisons in an explicit null guard
  *   (`(high_fives IS NOT NULL AND high_fives > 20)` —
  *   LegendPureTest.scala:73-81). graft emits the bare predicate: under
  *   SQL WHERE three-valued logic a NULL comparison already excludes the
  *   row, so the guard is semantically redundant; LegendParserSpec pins
  *   the row-set equivalence on planted nulls.
  * - Unsupported syntax fails loudly at PARSE time with position info —
  *   the same fail-fast contract as the protocol loader.
  */
object PureParser {
  import PureExpr._

  /** Parse a PURE expression / query pipeline. `enums`: full paths that
    * name enumerations of the target model — `path.VALUE` references
    * resolve to enum literals instead of opaque property access. */
  def parse(text: String, enums: Set[String] = Set.empty): PureExpr =
    new P(text, enums).parseAll()

  /** Parse a SCRIPT: zero or more user-defined `function` definitions
    * followed by an optional query expression (round-13 frontier
    * widening). Parameter and return types are syntax-checked then
    * discarded (the translator is type-context-free); multiplicities
    * accept the `[1]` / `[0..1]` / `[*]` / `[1..*]` spellings.
    * {{{
    *   script   := functionDef* (lambdaOrExpr)?
    *   functionDef := 'function' path '(' (param (',' param)*)? ')'
    *                  ':' path mult '{' body '}'
    *   param    := IDENT ':' path mult
    *   mult     := '[' ('*' | INT ('..' (INT | '*'))?) ']'
    * }}} */
  def parseScript(text: String, enums: Set[String] = Set.empty)
      : (Map[String, PFunction], Option[PureExpr]) = {
    val (fns, e) = new P(text, enums).parseScriptAll()
    val dup = fns.groupBy(_.path).collect { case (k, vs) if vs.size > 1 => k }
    require(dup.isEmpty,
      s"duplicate function definition(s): ${dup.toSeq.sorted.mkString(", ")}")
    (fns.map(f => f.path -> f).toMap, e)
  }

  /** Parse a lambda (`x|$x.qty > 0`, `{x,y|...}`, or a bare body, which
    * binds `$this` like a constraint lambda). */
  def parseLambda(text: String, enums: Set[String] = Set.empty): PLambda =
    parse(text, enums) match {
      case l: PLambda => l
      case body       => PLambda(Nil, body)
    }

  /** Compile a textual relational query against a loaded model — the
    * reference's `Legend.query(lambdaString)` surface. The entity named
    * by the pipeline's `getAll`/`all()` selects the (unique) mapping;
    * a query with no projection reads every mapped field, like the
    * reference's execution plan for a bare filter. */
  def compileQuery(model: GraftModel, text: String,
                   name: String = "graft::text::query",
                   params: Map[String, String] = Map.empty,
                   functions: Map[String, PFunction] = Map.empty): GraftService = {
    // a text beginning with the `function` keyword is a SCRIPT:
    // definitions compile with (and inline into) the query that follows
    val (defs, exprOpt) =
      if (text.trim.startsWith("function") &&
          text.trim.drop("function".length).headOption.exists(_.isWhitespace))
        parseScript(text, model.enums.keySet)
      else (Map.empty[String, PFunction], Some(parse(text, model.enums.keySet)))
    val parsed = exprOpt.getOrElse(throw new IllegalArgumentException(
      "script contains only function definitions — a query expression must follow")) match {
      case PLambda(_, b) => b
      case e             => e
    }
    // bind named parameters (e.g. `$businessDate` in a milestoned
    // `Entity.all($businessDate)`) to SQL literals before compiling;
    // an unbound date parameter rejects in compilePipeline
    val bound = params.foldLeft(parsed) { case (b, (k, v)) =>
      PureExpr.substVar(b, k, PureExpr.PLit(v))
    }
    // user functions (from the script AND the caller's registry) inline
    // before any relational-verb walking, so calls participate in
    // pushdown/codegen like hand-written PURE
    val body = PureExpr.inlineUserFunctions(bound, functions ++ defs)
    val entity = findGetAll(body).getOrElse(throw new IllegalArgumentException(
      s"text query must select an entity via `path::to::entity->getAll()` or `.all()`: $text"))
    val candidates = model.mappings.values.filter(_.entity == entity).toSeq
    require(candidates.nonEmpty, s"no mapping maps entity [$entity]")
    require(candidates.size == 1,
      s"ambiguous entity [$entity]: mapped by ${candidates.map(_.name).sorted.mkString(", ")}")
    // compile under a type context rooted at the queried entity, so
    // `->subType(@T)` on typed $this/$x chains can prove itself vacuous
    val svc = PureToSql.withTypes(TypeCtx.of(model, entity)) {
      LegendLoader.compilePipeline(name, candidates.head.name, body,
        doc = Some(text))
    }
    if (svc.select.nonEmpty) svc
    else { // bare filter: project every mapped field of the entity
      val fields = model.allProperties(entity).collect {
        case p if candidates.head.fields.contains(p.name) => p.name
      }
      svc.copy(select = fields.map(f => f -> f))
    }
  }

  /** SQL for a textual query, compiled against `model`'s mappings. */
  def querySql(model: GraftModel, text: String,
               params: Map[String, String] = Map.empty,
               functions: Map[String, PFunction] = Map.empty): String = {
    val svc = compileQuery(model, text, params = params, functions = functions)
    graft.model.ServiceGen.serviceSql(
      model.copy(services = model.services + (svc.name -> svc)), svc.name)
  }

  private def findGetAll(e: PureExpr): Option[String] = e match {
    case PFunc("getAll", PPtr(p) +: _)  => Some(p)
    case PFunc(_, ps)                   => ps.view.flatMap(findGetAll).headOption
    case _                              => None
  }

  // ---------------------------------------------------------------- //

  private final class P(text: String, enums: Set[String]) {
    private var pos = 0

    def parseAll(): PureExpr = {
      val e = lambdaOrExpr()
      skipWs()
      fail(pos == text.length, s"unexpected trailing input [${text.drop(pos)}]")
      e
    }

    def parseScriptAll(): (Seq[PFunction], Option[PureExpr]) = {
      val fns = scala.collection.mutable.ArrayBuffer.empty[PFunction]
      while ({ skipWs(); identAt(pos).contains("function") }) fns += functionDef()
      skipWs()
      val e = if (pos < text.length) Some(lambdaOrExpr()) else None
      skipWs()
      fail(pos == text.length, s"unexpected trailing input [${text.drop(pos)}]")
      (fns.toSeq, e)
    }

    /** `function a::b::f(x: Integer[1]): Integer[1] { body }` — types are
      * validated syntactically and discarded (type-context-free subset). */
    private def functionDef(): PFunction = {
      skipWs()
      pos += "function".length
      val path = pathIdent()
      expect("(")
      val params = scala.collection.mutable.ArrayBuffer.empty[String]
      skipWs()
      if (!eat(")")) {
        params += paramDecl()
        while (eat(",")) params += paramDecl()
        expect(")")
      }
      val dup = params.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
      fail(dup.isEmpty, s"duplicate parameter name(s) ${dup.mkString(", ")} in function [$path]")
      expect(":")
      typeRef(); multiplicity()
      expect("{")
      val body = bodyExpr()
      expect("}")
      PFunction(path, params.toSeq, body)
    }

    private def paramDecl(): String = {
      val name = ident()
      expect(":")
      typeRef(); multiplicity()
      name
    }

    /** A type reference: `path` optionally followed by a generic
      * argument block — `Function<{Integer[1]->Integer[1]}>` — which is
      * validated for balance and DISCARDED like every other type in the
      * type-context-free subset (r15: lets real Legend higher-order
      * signatures parse; the function-typed parameter only becomes
      * meaningful when a call site substitutes a lambda literal or a
      * registered function pointer into it). */
    private def typeRef(): Unit = {
      pathIdent()
      skipWs()
      if (pos < text.length && text(pos) == '<') {
        var depth = 0
        do {
          fail(pos < text.length, "unbalanced generic type arguments")
          if (text(pos) == '<') depth += 1
          // `->` inside a function type is an arrow, not a closer
          if (text(pos) == '>' && text(pos - 1) != '-') depth -= 1
          pos += 1
        } while (depth > 0)
      }
    }

    private def pathIdent(): String = {
      val sb = new StringBuilder(ident())
      while (eat("::")) sb.append("::").append(ident())
      sb.toString
    }

    /** `[1]` / `[0..1]` / `[*]` / `[1..*]` */
    private def multiplicity(): Unit = {
      expect("[")
      if (!eat("*")) {
        skipWs()
        fail(pos < text.length && text(pos).isDigit, "expected a multiplicity bound")
        while (pos < text.length && text(pos).isDigit) pos += 1
        if (eat("..") && !eat("*")) {
          skipWs()
          fail(pos < text.length && text(pos).isDigit, "expected an upper multiplicity bound")
          while (pos < text.length && text(pos).isDigit) pos += 1
        }
      }
      expect("]")
    }

    // -- lexing helpers (no token buffer: the grammar is LL with only
    //    bounded lookahead, all of it via savepoints) --

    private def skipWs(): Unit =
      while (pos < text.length && text(pos).isWhitespace) pos += 1

    private def peekIs(s: String): Boolean = {
      skipWs(); text.startsWith(s, pos)
    }

    /** Consume `s` if present (longest-match callers order their tries). */
    private def eat(s: String): Boolean = {
      if (peekIs(s)) { pos += s.length; true } else false
    }

    private def expect(s: String): Unit =
      fail(eat(s), s"expected `$s`")

    private def identAt(p: Int): Option[String] = {
      var i = p
      if (i < text.length && (text(i).isLetter || text(i) == '_')) {
        i += 1
        while (i < text.length && (text(i).isLetterOrDigit || text(i) == '_')) i += 1
        Some(text.substring(p, i))
      } else None
    }

    private def ident(): String = {
      skipWs()
      val id = identAt(pos).getOrElse(failWith("expected identifier"))
      pos += id.length
      id
    }

    private def fail(cond: Boolean, msg: String): Unit = if (!cond) failWith(msg)

    private def failWith(msg: String): Nothing = {
      skipWs()
      val ctx = text.substring(0, pos).takeRight(24)
      val rest = text.drop(pos).take(24)
      throw new IllegalArgumentException(
        s"PURE parse error at offset $pos ($msg): ...$ctx⟨HERE⟩$rest...")
    }

    // -- grammar --

    /** A lambda where the grammar allows one (argument / collection
      * positions), else an expression. Lookahead: `{`, a leading `|`
      * (zero-arg thunk), or `ident(,ident)* |`. */
    private def lambdaOrExpr(): PureExpr = {
      skipWs()
      if (peekIs("{")) { // braced lambda
        val save = pos
        eat("{")
        lambdaTail(closeBrace = true) match {
          // a braced lambda followed by `->` is not a lambda VALUE but
          // the receiver of an arrow chain (`{f | ...}->eval(...)` —
          // r16: this used to parse only in expression positions, so a
          // top-level immediately-applied lambda was a spurious
          // trailing-input error): backtrack and let the expression
          // grammar re-consume it via primary() with full precedence
          case Some(l) if !peekIs("->") => l
          case Some(_) => pos = save; bodyExpr()
          case None    => pos = save; bodyExpr() // not a lambda: no `{` form in exprs → will fail loudly
        }
      } else if (peekIs("|")) { // zero-arg thunk (if-branches)
        eat("|")
        PLambda(Nil, bodyExpr())
      } else {
        val save = pos
        lambdaTail(closeBrace = false) match {
          case Some(l) => l
          case None    => pos = save; bodyExpr()
        }
      }
    }

    /** Like [[lambdaOrExpr]] but the expression fallback is a PLAIN
      * expression, not a statement body — for positions that own their
      * surrounding punctuation (a `let` statement's value). */
    private def lambdaOrPlainExpr(): PureExpr = {
      skipWs()
      if (peekIs("{")) {
        val save = pos
        eat("{")
        lambdaTail(closeBrace = true) match {
          case Some(l) if !peekIs("->") => l // `->`: applied, not a value (r16)
          case Some(_) => pos = save; expr()
          case None    => pos = save; expr()
        }
      } else if (peekIs("|")) {
        eat("|")
        PLambda(Nil, expr())
      } else {
        val save = pos
        lambdaTail(closeBrace = false) match {
          case Some(l) => l
          case None    => pos = save; expr()
        }
      }
    }

    /** Try `ident (, ident)* | body` from the current position. */
    private def lambdaTail(closeBrace: Boolean): Option[PLambda] = {
      val params = scala.collection.mutable.ArrayBuffer.empty[String]
      skipWs()
      identAt(pos) match {
        case None => return None
        case Some(id) => params += id; pos += id.length
      }
      skipWs()
      while (peekIs(",")) {
        val save = pos
        eat(",")
        skipWs()
        identAt(pos) match {
          case Some(id) => params += id; pos += id.length; skipWs()
          case None     => pos = save; return None // `,` belonged to an arg list
        }
      }
      // `||` is the or-operator, not a lambda separator: `false || x`
      // must backtrack to an expression, not commit to params=[false]
      if (peekIs("||") || !eat("|")) return None
      val body = bodyExpr()
      if (closeBrace) expect("}")
      Some(PLambda(params.toSeq, body))
    }

    /** A lambda body: `let` statements followed by one result expression
      * (round-11 widening, mirroring the protocol's multi-statement
      * bodies — desugared through the same [[PureExpr.desugarLets]], so
      * both front ends inline bindings identically). An optional
      * trailing `;` after the result expression is accepted (PURE's
      * multi-statement blocks terminate every statement). A bare `let`
      * identifier followed by `(` is a prefix call, not a binding. */
    private def bodyExpr(): PureExpr = {
      val stmts = scala.collection.mutable.ArrayBuffer.empty[PureExpr]
      while ({
        skipWs()
        identAt(pos).contains("let") && {
          val after = pos + 3
          var i = after
          while (i < text.length && text(i).isWhitespace) i += 1
          i > after && identAt(i).isDefined // `let x` — not `let(`, not `lettuce`
        }
      }) {
        pos += 3
        val name = ident()
        expect("=")
        // a let may bind a LAMBDA value (`let f = {y | $y + 1};`) —
        // eval application needs it (round 13). NOT lambdaOrExpr: its
        // expression fallback is bodyExpr(), which would swallow this
        // statement's own `;` terminator
        val value = lambdaOrPlainExpr()
        expect(";")
        stmts += PureExpr.PFunc("letFunction",
          Seq(PureExpr.PLit(PureExpr.quote(name)), value))
      }
      stmts += expr()
      eat(";") // optional terminator on the result statement
      PureExpr.desugarLets(stmts.toSeq)
    }

    private def expr(): PureExpr = or()

    private def or(): PureExpr = {
      var e = and()
      while (eat("||")) e = PFunc("or", Seq(e, and()))
      e
    }

    private def and(): PureExpr = {
      var e = cmp()
      while (eat("&&")) e = PFunc("and", Seq(e, cmp()))
      e
    }

    private def cmp(): PureExpr = {
      val e = add()
      // two-char operators before their one-char prefixes
      if (eat("==")) PFunc("equal", Seq(e, add()))
      else if (eat("!=")) PFunc("not", Seq(PFunc("equal", Seq(e, add()))))
      else if (eat(">=")) PFunc("greaterThanEqual", Seq(e, add()))
      else if (eat("<=")) PFunc("lessThanEqual", Seq(e, add()))
      else if (eat(">")) PFunc("greaterThan", Seq(e, add()))
      else if (eat("<")) PFunc("lessThan", Seq(e, add()))
      else e
    }

    private def add(): PureExpr = {
      var e = mul()
      var done = false
      while (!done) {
        // `->` must not lex as minus; `-` only binds here when not arrow
        if (eat("+")) e = PFunc("plus", Seq(e, mul()))
        else if (peekIs("-") && !peekIs("->")) { eat("-"); e = PFunc("minus", Seq(e, mul())) }
        else done = true
      }
      e
    }

    private def mul(): PureExpr = {
      var e = unary()
      var done = false
      while (!done) {
        if (eat("*")) e = PFunc("times", Seq(e, unary()))
        else if (eat("/")) e = PFunc("divide", Seq(e, unary()))
        else done = true
      }
      e
    }

    private def unary(): PureExpr = {
      if (eat("!")) PFunc("not", Seq(unary()))
      else if (peekIs("-") && !peekIs("->")) { eat("-"); PFunc("minus", Seq(unary())) }
      else postfix()
    }

    private def postfix(): PureExpr = {
      var e = primary()
      var done = false
      while (!done) {
        if (eat("->")) {
          // the call target may be a full path (`->my::fns::double()`,
          // `->cast(...)`, `meta::pure::functions::lang::eval`) — the
          // arrow is first-argument sugar either way
          val sb = new StringBuilder(ident())
          while (eat("::")) sb.append("::").append(ident())
          expect("(")
          e = PFunc(sb.toString, e +: args())
        } else if (peekIs(".") && !peekIs("..")) {
          eat(".")
          val name = ident()
          e match {
            case PPtr(p) if peekIs("(") =>
              // `Entity.all()` — the only call the wire format puts on a
              // pointer (everything else arrives arrow-style). One
              // optional argument: the business-temporal as-of date
              // (`Entity.all(%2023-06-15)` / `Entity.all($businessDate)`)
              fail(name == "all", s"only .all() is callable on element [$p], got .$name(...)")
              expect("(")
              e = PFunc("getAll", e +: args())
            case PPtr(p) if enums.contains(p) =>
              e = PEnum(p, name) // known enumeration → enum literal
            case _ if peekIs("(") =>
              failWith(s"qualified-property calls with arguments (.$name(...)) are not supported")
            case _ =>
              e = PProperty(e, name)
          }
        } else done = true
      }
      e
    }

    private def args(): Seq[PureExpr] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[PureExpr]
      skipWs()
      if (!eat(")")) {
        out += lambdaOrExpr()
        while (eat(",")) out += lambdaOrExpr()
        expect(")")
      }
      out.toSeq
    }

    private def primary(): PureExpr = {
      skipWs()
      fail(pos < text.length, "unexpected end of input")
      val c = text(pos)
      if (c == '(') { eat("("); val e = expr(); expect(")"); e }
      else if (c == '[') {
        eat("[")
        val out = scala.collection.mutable.ArrayBuffer.empty[PureExpr]
        skipWs()
        if (!eat("]")) {
          out += lambdaOrExpr()
          while (eat(",")) out += lambdaOrExpr()
          expect("]")
        }
        PCollection(out.toSeq)
      }
      else if (c == '$') { eat("$"); PVar(ident()) }
      else if (c == '{') { // braced lambda as an expression receiver:
        // `{y | $y > 20}->eval($x.highFives)` (round 13, eval support)
        eat("{")
        lambdaTail(closeBrace = true).getOrElse(failWith("expected a lambda after `{`"))
      }
      else if (c == '@') { // type reference: cast/subType argument
        eat("@")
        val sb = new StringBuilder(ident())
        while (eat("::")) sb.append("::").append(ident())
        PTypeRef(sb.toString)
      }
      else if (c == '\'') string()
      else if (c == '%') date()
      else if (c.isDigit) number()
      else if (c.isLetter || c == '_') {
        val id = ident()
        if (id == "true") PLit("TRUE")
        else if (id == "false") PLit("FALSE")
        else if (peekIs("::")) { // package path
          val sb = new StringBuilder(id)
          while (eat("::")) sb.append("::").append(ident())
          // a path followed by `(` is a prefix call — a user-defined
          // function (`my::fns::double(3)`) or fully-qualified builtin
          if (peekIs("(")) { eat("("); PFunc(sb.toString, args()) }
          else PPtr(sb.toString)
        }
        else if (peekIs("(")) { // prefix call: agg(...), desc(...), if(...)
          eat("(")
          PFunc(id, args())
        }
        else PPtr(id) // bare element ref (enum class, entity) — postfix resolves
      }
      else failWith(s"unexpected character `$c`")
    }

    private def string(): PureExpr = {
      expect("'")
      val sb = new StringBuilder
      var closed = false
      while (!closed) {
        fail(pos < text.length, "unterminated string literal")
        text(pos) match {
          case '\\' =>
            fail(pos + 1 < text.length, "dangling escape in string literal")
            val e = text(pos + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other // \' \\ and any literal escape
            }
            sb.append(e); pos += 2
          case '\'' => pos += 1; closed = true
          case ch   => sb.append(ch); pos += 1
        }
      }
      PLit(PureExpr.quote(sb.toString))
    }

    /** `%2020-01-01` (strict date) / `%2020-01-01T10:00:00` (datetime) —
      * the wire format's strictDate/dateTime literals. */
    private def date(): PureExpr = {
      expect("%")
      val start = pos
      // a `-` that begins an arrow (`%2020-01-01->dateDiff(...)`) ends
      // the literal — it is the call syntax, not a date separator
      while (pos < text.length &&
        (text(pos).isDigit || "-:TZ+.".indexOf(text(pos)) >= 0) &&
        !(text(pos) == '-' && pos + 1 < text.length && text(pos + 1) == '>')) pos += 1
      val s = text.substring(start, pos)
      fail(s.nonEmpty, "expected a date after %")
      if (s.contains("T")) PLit(s"TIMESTAMP ${PureExpr.quote(s.replace("T", " "))}")
      else PLit(s"DATE ${PureExpr.quote(s)}")
    }

    private def number(): PureExpr = {
      val start = pos
      while (pos < text.length && text(pos).isDigit) pos += 1
      // a fractional part, but not the `..` of a range and not a
      // property access on an integer (PURE has no int methods we accept)
      if (pos < text.length && text(pos) == '.' &&
          pos + 1 < text.length && text(pos + 1).isDigit) {
        pos += 1
        while (pos < text.length && text(pos).isDigit) pos += 1
      }
      PLit(text.substring(start, pos))
    }
  }
}
