package graft.model.legend

import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

/** The PURE expression protocol (the JSON AST the Legend toolchain emits
  * for constraint/derivation/service lambdas) and its translation to
  * entity-space Spark SQL.
  *
  * The reference hands these ASTs to the Legend engine's execution
  * planner to get SQL (reference: Legend.scala:339-369,
  * LegendUtils.scala:342-356). graft has no external compiler: this is a
  * self-contained translator for the practical subset of PURE that
  * appears in entity constraints, qualified properties, and relational
  * services — comparisons, boolean algebra, arithmetic, string and date
  * functions, emptiness checks, collection HOFs (forAll/exists/filter/
  * map over [0..*] properties, rendered as Spark's codegen'd
  * higher-order array functions), and the relational verbs
  * (getAll/filter/project/groupBy/sort/take, handled in [[LegendLoader]]).
  * Everything renders to a plain Spark SQL string over entity field
  * names, so the downstream machinery (Expectations → SqlRewrite →
  * Validator, ServiceGen) treats Legend-loaded models exactly like
  * native graft models: parsed by CatalystSqlParser, executed inside
  * whole-stage codegen, pushed down where Catalyst allows.
  *
  * Unsupported functions fail loudly at LOAD time (not at query time)
  * with the function name — mirroring the fail-fast contract of the
  * reference's expectation compiler, which surfaces per-rule failures.
  */
sealed trait PureExpr

object PureExpr {
  /** Function application: `function(parameters...)`. */
  final case class PFunc(function: String, params: Seq[PureExpr]) extends PureExpr
  /** Property access: `receiver.name` ($this.amount, $x.firstName). */
  final case class PProperty(receiver: PureExpr, name: String) extends PureExpr
  /** Lambda variable reference ($this, $x). */
  final case class PVar(name: String) extends PureExpr
  /** Lambda: params + single-expression body (the protocol's body array
    * holds one expression for constraints/derivations/row lambdas). */
  final case class PLambda(params: Seq[String], body: PureExpr) extends PureExpr
  /** Homogeneous value collection (project columns, sort keys, IN lists). */
  final case class PCollection(values: Seq[PureExpr]) extends PureExpr
  /** Literal, already rendered to its SQL form. */
  final case class PLit(sql: String) extends PureExpr
  /** Pointer to a packageable element (class in getAll, enum in unit args). */
  final case class PPtr(path: String) extends PureExpr
  /** Enum value reference (rendered as its string value — graft enums
    * validate by string domain). */
  final case class PEnum(path: String, value: String) extends PureExpr
  /** Type reference — the `@a::b::c` argument of `cast`/`subType`
    * (protocol: genericTypeInstance). Not a value; only legal in the
    * type-argument position of the functions that accept one. */
  final case class PTypeRef(path: String) extends PureExpr

  /** A user-defined PURE function (round-13 widening): `function
    * a::b::f(x: Integer[1]): Integer[1] { body }`. Parameter/return
    * TYPES are parsed for syntax but not kept — graft's translator is
    * deliberately type-context-free (same stance as plus()'s
    * syntactic overload resolution); the body is inlined at each call
    * site by [[inlineUserFunctions]], so a function participates in
    * pushdown/codegen exactly like hand-written PURE. */
  final case class PFunction(path: String, params: Seq[String], body: PureExpr)

  /** Parse one protocol AST node. */
  def parse(n: JsonNode): PureExpr = n.get("_type").asText() match {
    case "lambda" =>
      val params = elems(n, "parameters").map(p => p.get("name").asText())
      val body = elems(n, "body")
      require(body.nonEmpty, "expected non-empty lambda body")
      PLambda(params, desugarLets(body.map(parse)))
    case "func" =>
      PFunc(n.get("function").asText(), elems(n, "parameters").map(parse))
    case "property" =>
      val recv = elems(n, "parameters")
      require(recv.size == 1, "property access expects one receiver")
      PProperty(parse(recv.head), n.get("property").asText())
    case "var" => PVar(n.get("name").asText())
    case "collection" => PCollection(elems(n, "values").map(parse))
    case "integer" | "float" | "decimal" => PLit(value(n).asText())
    case "boolean" => PLit(value(n).asText().toUpperCase)
    case "string" => PLit(quote(value(n).asText()))
    case "strictDate" => PLit(s"DATE ${quote(value(n).asText())}")
    case "dateTime" => PLit(s"TIMESTAMP ${quote(value(n).asText())}")
    case "packageableElementPtr" => PPtr(n.get("fullPath").asText())
    case "enumValue" => PEnum(n.get("fullPath").asText(), n.get("value").asText())
    case "genericTypeInstance" =>
      // the protocol's `@Type` argument; fullPath location moved across
      // protocol versions (top-level → genericType.rawType), accept both
      val p = Option(n.get("fullPath")).map(_.asText()).orElse(
        Option(n.get("genericType")).flatMap(g => Option(g.get("rawType")))
          .flatMap(r => Option(r.get("fullPath"))).map(_.asText()))
      PTypeRef(p.getOrElse(throw new IllegalArgumentException(
        s"genericTypeInstance without a fullPath: ${n.toString.take(120)}")))
    case other => throw new IllegalArgumentException(s"unsupported PURE node type [$other]")
  }

  private def elems(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def value(n: JsonNode): JsonNode = {
    val vs = elems(n, "values")
    require(vs.size == 1, s"expected single literal value in ${n.toString.take(80)}")
    vs.head
  }

  def quote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Substitute every free occurrence of the variable `$v` in `e` with
    * `repl`. Lambdas whose parameter list rebinds `v` keep their own
    * binding. Descending into a lambda whose parameters INTERSECT the
    * replacement's free variables would capture them (e.g. a let value
    * referencing the outer row variable `$x`, inlined into an inner HOF
    * lambda that also names its element `x`) — that shape REJECTS
    * loudly instead of silently rebinding (review r11); renaming the
    * inner lambda's parameter is the caller's fix. */
  def substVar(e: PureExpr, v: String, repl: PureExpr): PureExpr = e match {
    case PVar(`v`)       => repl
    case PProperty(r, n) => PProperty(substVar(r, v, repl), n)
    case PFunc(f, ps)    => PFunc(f, ps.map(substVar(_, v, repl)))
    case PCollection(vs) => PCollection(vs.map(substVar(_, v, repl)))
    case PLambda(params, b) if !params.contains(v) =>
      if (freeVars(b).contains(v)) { // only guard where a substitution will occur
        val captured = params.toSet.intersect(freeVars(repl))
        require(captured.isEmpty,
          s"let-bound value for [$$$v] references ${captured.map("$" + _).mkString(", ")}, " +
            "which an inner lambda parameter of the same name would capture — " +
            "rename the inner lambda's parameter")
      }
      PLambda(params, substVar(b, v, repl))
    case other => other
  }

  /** Free lambda-variable names of `e` (parameters of inner lambdas are
    * bound and excluded). */
  def freeVars(e: PureExpr): Set[String] = e match {
    case PVar(v)            => Set(v)
    case PProperty(r, _)    => freeVars(r)
    case PFunc(_, ps)       => ps.flatMap(freeVars).toSet
    case PCollection(vs)    => vs.flatMap(freeVars).toSet
    case PLambda(params, b) => freeVars(b) -- params
    case _                  => Set.empty
  }

  /** Desugar a multi-statement lambda body — `let` bindings followed by
    * one result expression — into that single expression with every
    * binding inlined (round-11 widening: the protocol emits one
    * `letFunction` node per `let x = ...;` statement, with the variable
    * name as a string literal first parameter).
    *
    * Each binding's value is resolved against the bindings before it, so
    * sequential references (`let b = $a + 1`) and rebinding (`let a =
    * $a * 2`) both work; the final environment therefore holds fully
    * let-free values, and the result expression substitutes them in any
    * order. Inlining duplicates a value used N times — safe because the
    * translated subset is query-deterministic (see PureToSql.at()), and
    * bounded because constraint/derivation bodies are small by
    * construction. Anything other than a letFunction before the last
    * statement is a statement whose value is discarded — PURE allows
    * side-effecting statements there, graft's subset has none, so that
    * shape rejects loudly. */
  def desugarLets(stmts: Seq[PureExpr]): PureExpr = {
    require(stmts.nonEmpty, "empty statement sequence")
    var env = Vector.empty[(String, PureExpr)]
    def resolve(e: PureExpr): PureExpr =
      env.foldLeft(e) { case (acc, (v, value)) => substVar(acc, v, value) }
    stmts.init.foreach {
      case PFunc("letFunction", Seq(PLit(name), value)) =>
        val v = name.stripPrefix("'").stripSuffix("'")
        env = env.filterNot(_._1 == v) :+ (v -> resolve(value))
      case other => throw new IllegalArgumentException(
        s"only `let` statements may precede a lambda body's result expression, got $other")
    }
    stmts.last match {
      case PFunc("letFunction", _) => throw new IllegalArgumentException(
        "a lambda body must end in a result expression, not a `let` statement")
      case last => resolve(last)
    }
  }

  /** Inline every call to a user-defined function (round-13 widening of
    * the rejection frontier): `a::b::f(args…)` / `recv->a::b::f(…)`
    * (the arrow is first-argument sugar, so both arrive as the same
    * PFunc) is replaced by the function's body with parameters
    * substituted — BEFORE translation, so the inlined body flows
    * through the same relational-verb walker / scalar renderer as
    * hand-written PURE and stays inside pushdown + codegen. Calls may
    * use the full path or, when unambiguous, the bare function name.
    * RECURSION rejects loudly (graft renders to non-recursive SQL
    * expressions; a recursive PURE function cannot terminate under
    * inlining), as does an arity mismatch. Variable capture is guarded
    * by [[substVar]]'s existing rename-your-parameter contract.
    *
    * Bare-name resolution REFUSES names the translator itself claims
    * ([[PureToSql.reservedNames]]): a registered function named e.g.
    * `a::b::filter` must be called by its full path — otherwise every
    * `->filter(...)` call site in the query would silently inline the
    * user function instead of translating the relational verb.
    *
    * Round-14 widening — `eval` of a function POINTER: when eval's
    * function argument is a packageable-element reference (`PPtr`) that
    * names a registered function — by full path, by Legend's
    * signature-mangled pointer form (`a::b::f_Integer_1__Integer_1_`,
    * the spelling `let f = a::b::f_…_;` produces), or by unambiguous
    * bare name — the eval rewrites to a direct call and inlines through
    * the machinery above (let-bound pointers arrive here already
    * substituted by desugarLets). A pointer that does NOT resolve
    * rejects loudly right here, naming the registry; what remains
    * outside the subset is eval of an OPAQUE function value (a
    * lambda-parameter-bound `$f`), which genuinely needs runtime
    * function values. Reserved-colliding bare pointer names still
    * require the full path, same rule as calls.
    *
    * Round-18 disposition (closes the r16/r17 carry-over): the opaque
    * case is exactly the boundary of CLOSED terms, not a missing
    * feature. Function values originate only from lambda literals,
    * pointers, and registered-function calls (no model column has a
    * Function type, so no property access or relational verb yields
    * one), and they reach an eval only through lets, user-function
    * parameters, or lambda application — all three substituted away by
    * desugarLets + the inlining/beta machinery here. So in a closed
    * query every eval head reduces; a head still opaque means `$f` is
    * free in the WHOLE expression — a fragment nothing can execute
    * until a binding site supplies the value, and once one does, this
    * pass resolves it. HofClosureSpec is the executable receipt: a
    * seeded generator over hundreds of random closed higher-order
    * terms (all five binding paths) — each must translate AND evaluate
    * (via Spark) to its interpreter value; the open term stays
    * rejected. */
  /** Does `s` parse as Legend's signature-mangle SUFFIX (what follows
    * `path_` in a mangled function pointer)? Shape: one or more
    * `Type_Multiplicity` segments joined by `__`, trailing `_` — e.g.
    * `Integer_1__Integer_1_`, `String_MANY__Boolean_$0_1$_`.
    * Multiplicities are `1`, `MANY`, or a `$lo_hi$` range. Used by
    * pointer resolution so a bare path prefix (`a::b::f` against
    * pointer `a::b::f_v2_Integer_1_...`) can't claim another
    * function's pointer. */
  private val MangledSig =
    ("""([A-Za-z0-9$]+_(?:\d+|MANY|\$\d+_(?:\d+|MANY)\$))""" +
      """(__[A-Za-z0-9$]+_(?:\d+|MANY|\$\d+_(?:\d+|MANY)\$))*_""").r
  private[legend] def looksMangledSignature(s: String): Boolean =
    MangledSig.pattern.matcher(s).matches()

  def inlineUserFunctions(e: PureExpr, funcs: Map[String, PFunction],
                          stack: List[String] = Nil): PureExpr = {
    // r16: eval beta-reduction budget, SHARED across the whole inlining
    // walk (the worker threads it through every recursive step).
    // Inline-time reduction of lambda-literal evals is what lets a
    // function VALUE flow through any number of lambda parameters and
    // still resolve — but untyped beta reduction can diverge
    // (Ω = {f|$f->eval($f)} applied to itself), so reductions draw from
    // one fuel budget and fail loudly instead of overflowing the stack.
    // 256 is orders of magnitude above any real model's nesting.
    inlineFueled(e, funcs, stack, new java.util.concurrent.atomic.AtomicInteger(256))
  }

  private def inlineFueled(e: PureExpr, funcs: Map[String, PFunction],
                           stack: List[String],
                           evalFuel: java.util.concurrent.atomic.AtomicInteger): PureExpr = {
    def resolve(name: String): Option[PFunction] =
      funcs.get(name).orElse {
        if (PureToSql.reservedNames(name)) None else {
          val bySimple = funcs.values.filter(f =>
            f.path == name || f.path.endsWith(s"::$name")).toSeq
          if (bySimple.size > 1) throw new IllegalArgumentException(
            s"ambiguous function call [$name]: matches ${bySimple.map(_.path).sorted.mkString(", ")}")
          bySimple.headOption
        }
      }
    // pointer-position resolution: exact path FIRST (an exact hit can
    // never be ambiguous — r15 advisory: the old order let a prefix
    // collision spuriously reject an exactly-named function), then
    // signature-mangled pointer (path or bare name + "_" + a remainder
    // that actually PARSES as a mangled signature — a bare prefix match
    // alone would let `a::b::f` swallow `a::b::f_v2_...`'s pointer when
    // f_v2 is unregistered), then `resolve`'s bare-name rules. The bare
    // branch tests reservedNames against the function's SIMPLE name
    // (what the pointer demangles to), not the full mangled string —
    // reserved-colliding bare pointers require the full path.
    def resolvePointer(path: String): Option[PFunction] =
      funcs.get(path).orElse {
        val mangled = funcs.values.filter { f =>
          val simple = f.path.split("::").last
          (path.startsWith(f.path + "_") &&
            looksMangledSignature(path.stripPrefix(f.path + "_"))) ||
            (!path.contains("::") && !PureToSql.reservedNames(simple) &&
              path.startsWith(simple + "_") &&
              looksMangledSignature(path.stripPrefix(simple + "_")))
        }.toSeq
        if (mangled.size > 1) throw new IllegalArgumentException(
          s"ambiguous function pointer [$path]: matches ${mangled.map(_.path).sorted.mkString(", ")}")
        mangled.headOption.orElse(resolve(path))
      }
    e match {
      case PFunc("eval", fnExpr +: args) =>
        inlineFueled(fnExpr, funcs, stack, evalFuel) match {
          case PPtr(path) =>
            val fn = resolvePointer(path).getOrElse(throw new IllegalArgumentException(
              s"eval: function pointer [$path] does not name a registered " +
                s"user function (have: ${funcs.keys.toSeq.sorted.mkString(", ")})"))
            inlineFueled(PFunc(fn.path, args), funcs, stack, evalFuel)
          case PLambda(params, body) =>
            // r16 multi-level inlining: beta-reduce lambda-literal evals
            // HERE, not at translation — the substituted arguments (a
            // function pointer, a user-function call, another lambda)
            // get a fresh inlining pass, so a function value resolves
            // after flowing through ANY number of lambda parameters,
            // not just one user-function level.
            require(params.size == args.size,
              s"eval: lambda expects ${params.size} argument(s), got ${args.size}")
            require(evalFuel.decrementAndGet() > 0,
              "eval: beta-reduction budget exhausted — the lambda nest does not " +
                "terminate (self-application?) or is pathologically deep")
            val inlinedArgs = args.map(inlineFueled(_, funcs, stack, evalFuel))
            val applied = params.zip(inlinedArgs).foldLeft(body) {
              case (b, (p, a)) => substVar(b, p, a)
            }
            inlineFueled(applied, funcs, stack, evalFuel)
          case inlined => // opaque $f (no substituting call site) → translation-time reject
            PFunc("eval", inlined +: args.map(inlineFueled(_, funcs, stack, evalFuel)))
        }
      case PFunc(name, args) if resolve(name).isDefined =>
        val fn = resolve(name).get
        require(!stack.contains(fn.path),
          s"recursive user function [${fn.path}] cannot be inlined — " +
            "recursion is outside graft's PURE subset")
        require(args.size == fn.params.size,
          s"function [${fn.path}] expects ${fn.params.size} argument(s), got ${args.size}")
        val inlinedArgs = args.map(inlineFueled(_, funcs, stack, evalFuel))
        val applied = fn.params.zip(inlinedArgs).foldLeft(fn.body) {
          case (b, (p, a)) => substVar(b, p, a)
        }
        inlineFueled(applied, funcs, fn.path :: stack, evalFuel)
      case PFunc(f, ps)    => PFunc(f, ps.map(inlineFueled(_, funcs, stack, evalFuel)))
      case PProperty(r, n) => PProperty(inlineFueled(r, funcs, stack, evalFuel), n)
      case PCollection(vs) => PCollection(vs.map(inlineFueled(_, funcs, stack, evalFuel)))
      case PLambda(ps, b)  => PLambda(ps, inlineFueled(b, funcs, stack, evalFuel))
      case other           => other
    }
  }
}

/** Scalar-expression renderer: PURE AST → entity-space Spark SQL. */
/** Static type context for the constructs whose ACCEPTANCE depends on the
  * class lattice — round-13: `->subType(@T)`. Translation itself stays
  * type-context-free (the rendered SQL never depends on types); the
  * context only decides whether a narrowing is vacuous (upcast/same type
  * → identity) or a strict downcast (→ reject: graft's flat single-class
  * mappings carry no type-discriminator column to filter on, the same
  * error the reference surfaces for a subtype with no inheritance
  * mapping). Built from a loaded [[graft.model.GraftModel]] once the full
  * class set exists; [[TypeCtx.empty]] types nothing, so every subType
  * rejects — the safe default for context-free call sites. */
final case class TypeCtx(
    rootClass: Option[String],
    superTypes: String => Seq[String],
    propertyType: (String, String) => Option[String]) {
  /** Transitive supertypes of `c` (not including `c`), cycle-guarded. */
  def ancestors(c: String): Set[String] = {
    val seen = scala.collection.mutable.Set[String]()
    def walk(x: String): Unit = superTypes(x).foreach { s =>
      if (seen.add(s)) walk(s)
    }
    walk(c); seen.toSet
  }
}

object TypeCtx {
  val empty: TypeCtx = TypeCtx(None, _ => Nil, (_, _) => None)

  /** Context rooted at `root` over a loaded model: property types come
    * from class declarations (inherited included) plus association
    * navigations, mirroring how ServiceGen resolves property chains. */
  def of(model: graft.model.GraftModel, root: String): TypeCtx = TypeCtx(
    rootClass = Some(root),
    superTypes = c => model.classes.get(c).map(_.superTypes).getOrElse(Nil),
    propertyType = (c, p) =>
      model.classes.get(c)
        .flatMap(_ => model.allProperties(c).find(_.name == p).map(_.dataType))
        .orElse(model.associations.values.view
          .flatMap(_.navigation(c, p)).headOption.map(_.dataType)))
}

object PureToSql {

  import PureExpr._

  /** Every simple name the translator claims: [[funcImpl]]'s scalar
    * builtins, the relational pipeline verbs and their helpers
    * (LegendLoader.compilePipeline), and the aggregation-lambda
    * spellings. [[PureExpr.inlineUserFunctions]] refuses to resolve a
    * BARE call against a user function whose path merely ends in one of
    * these — the full path is required — so user definitions can never
    * shadow a builtin at unqualified call sites. Must track funcImpl's
    * cases; ReservedNamesSpec cross-checks the list against the source. */
  val reservedNames: Set[String] = Set(
    // scalar builtins (funcImpl)
    "cast", "subType", "eval", "and", "or", "not", "equal",
    "greaterThan", "greaterThanEqual", "lessThan", "lessThanEqual",
    "plus", "minus", "times", "divide", "abs", "floor", "round", "sqrt",
    "exp", "ceiling", "rem", "mod", "max", "min", "sum", "average",
    "mean", "fold", "isEmpty", "isNotEmpty", "in", "if", "startsWith",
    "endsWith", "contains", "length", "toUpper", "toLower", "trim",
    "ltrim", "rtrim", "reverseString", "replace", "lpad", "rpad",
    "repeatString", "toUpperFirstCharacter", "isAlphaNumeric",
    "isNoLongerThan", "isNoShorterThan", "left", "right", "indexOf",
    "pow", "log", "joinStrings", "toString", "substring", "size",
    "count", "at", "first", "last", "removeDuplicates", "slice", "take",
    "limit", "drop", "concatenate", "isDistinct", "forAll", "exists",
    "filter", "map", "matches", "parseInteger", "parseFloat",
    "parseDecimal", "toOne", "today", "now", "quarterNumber",
    "weekOfYear", "datePart", "parseDate", "firstDayOfMonth",
    "firstDayOfYear", "adjust", "year", "monthNumber", "dayOfMonth",
    "hour", "minute", "second", "dayOfWeekNumber", "dateDiff",
    // relational pipeline verbs + helpers (compilePipeline)
    "getAll", "all", "project", "groupBy", "sort", "asc", "desc", "agg",
    "letFunction",
    // aggregation-lambda spellings (compilePipeline.aggSql)
    "distinct", "uniqueValueOnly", "stdDevSample", "stdDevPopulation",
    "varianceSample", "variancePopulation")

  /** Dynamically-scoped type context (thread-local): bound by the model
    * loaders around lambda compilation, read only by the subType case. */
  private val typeCtx = new scala.util.DynamicVariable[TypeCtx](TypeCtx.empty)
  def withTypes[A](ctx: TypeCtx)(f: => A): A = typeCtx.withValue(ctx)(f)

  /** Static type of a receiver expression, walked from the context's
    * root class through declared/association property types. `None` for
    * anything the lattice can't type — which makes subType reject.
    * Every variable in `rv` ranges over the ROOT entity's rows ($this in
    * constraint lambdas, the pipeline lambda parameter in queries) —
    * HOF element variables never reach here, [[bindElem]] renders them
    * to PLit placeholders first — so rv-vars type as the root class. */
  private def inferType(e: PureExpr, ctx: TypeCtx, rv: Set[String]): Option[String] = e match {
    case PVar(v) if v == "this" || rv(v) => ctx.rootClass
    case PProperty(r, n) => inferType(r, ctx, rv).flatMap(c => ctx.propertyType(c, n))
    case PFunc("cast", Seq(_, PTypeRef(t))) => Some(t)
    case PFunc("subType", Seq(_, PTypeRef(t))) => Some(t)
    case _ => None
  }

  /** Render `e` with the given lambda variables standing for "the row":
    * `$this.amount` / `$x.amount` → `amount`. */
  def scalar(e: PureExpr, rowVars: Set[String]): String = e match {
    case PLit(sql) => sql
    case PEnum(_, v) => quote(v)
    // a cast/vacuous-subType under property access erases BEFORE the
    // receiver renders: `$this->cast(@T).amount` must reach the
    // `$this.amount` case, not try to render the bare row variable as a
    // scalar. subType re-enters funcImpl first so the lattice check
    // still runs before erasure.
    case PProperty(PFunc("cast", Seq(r, _: PTypeRef)), name) =>
      scalar(PProperty(r, name), rowVars)
    case PProperty(sub @ PFunc("subType", Seq(r, _: PTypeRef)), name) =>
      checkSubType(sub.params, rowVars) // lattice check (throws on downcast)
      scalar(PProperty(r, name), rowVars)
    case PProperty(PVar(v), name) if rowVars(v) => name
    case PProperty(recv, name) => s"${scalar(recv, rowVars)}.$name"
    case PVar(v) =>
      throw new IllegalArgumentException(s"free variable [$$${v}] outside property access")
    case PLambda(params, body) => scalar(body, rowVars ++ params)
    case PCollection(vs) => vs.map(scalar(_, rowVars)).mkString("(", ", ", ")")
    case PPtr(p) =>
      throw new IllegalArgumentException(s"element pointer [$p] is not a scalar expression")
    case PTypeRef(p) =>
      throw new IllegalArgumentException(
        s"type reference [@$p] is only legal as the argument of cast()/subType()")
    case PFunc(f, ps) => func(f, ps, rowVars)
  }

  /** The subType lattice check alone (no rendering): throws unless the
    * narrowing is provably VACUOUS — target = receiver's static type or
    * an ancestor of it. Called both by funcImpl's subType case (which
    * then erases to the receiver) and by scalar's property-access case
    * (which renders `PProperty(receiver, name)` directly, since the
    * receiver may be a bare row variable that is not itself a scalar). */
  private def checkSubType(ps: Seq[PureExpr], rv: Set[String]): Unit = {
    require(ps.size == 2, s"subType(value, @Type) — got ${ps.size} args")
    val target = ps(1) match {
      case PTypeRef(p) => p
      case other => throw new IllegalArgumentException(
        s"subType's second argument must be a type reference (@a::b::c), got $other")
    }
    val ctx = typeCtx.value
    inferType(ps.head, ctx, rv) match {
      case Some(r) if r == target || ctx.ancestors(r).contains(target) =>
        () // vacuous narrowing: every instance already is a T
      case Some(r) if ctx.ancestors(target).contains(r) =>
        throw new IllegalArgumentException(
          s"subType(@$target) narrows [$r] to a STRICT subtype — flat " +
            "single-class mappings have no type discriminator column to " +
            "filter on; downcast narrowing is outside the subset")
      case Some(r) => throw new IllegalArgumentException(
        s"subType(@$target): receiver type [$r] is unrelated to the target")
      case None => throw new IllegalArgumentException(
        s"subType(@$target): receiver's static type is not inferable " +
          "(subType needs a typed property chain from $this)")
    }
  }

  private def bin(op: String, ps: Seq[PureExpr], rv: Set[String]): String = {
    require(ps.size == 2, s"expected 2 arguments for [$op]")
    s"(${scalar(ps(0), rv)} $op ${scalar(ps(1), rv)})"
  }

  /** n-ary left fold for operators PURE sometimes passes as a single
    * collection argument (plus([a, b, c])). */
  private def nary(op: String, ps: Seq[PureExpr], rv: Set[String]): String = {
    val args = ps match {
      case Seq(PCollection(vs)) => vs
      case other                => other
    }
    require(args.nonEmpty, s"expected arguments for [$op]")
    args.map(scalar(_, rv)).mkString("(", s" $op ", ")")
  }

  private def call(name: String, ps: Seq[PureExpr], rv: Set[String]): String =
    ps.map(scalar(_, rv)).mkString(s"$name(", ", ", ")")

  /** Fully-qualified builtin spellings (`meta::pure::functions::lang::
    * eval(...)`) resolve to their simple name; user-function paths never
    * collapse — they are inlined away BEFORE translation, so any `::`
    * name reaching here that is not a builtin rejects in the default
    * case with its full path intact. */
  private def func(f0: String, ps: Seq[PureExpr], rv: Set[String]): String = {
    val f = if (f0.startsWith("meta::pure::functions::"))
      f0.substring(f0.lastIndexOf("::") + 2) else f0
    funcImpl(f, ps, rv)
  }

  private def funcImpl(f: String, ps: Seq[PureExpr], rv: Set[String]): String = f match {
    // round-13 frontier widening: `->cast(@T)` is a static type
    // assertion. graft's mappings are non-polymorphic (one class, one
    // flat table — no discriminator column exists), so the relational
    // rendering is the IDENTITY on the receiver — the same erasure the
    // legend-engine's relational compiler performs for non-inheritance
    // mappings. `->subType(@T)` stays OUTSIDE the subset: it has
    // row-filtering semantics that genuinely need a type discriminator.
    case "cast" =>
      require(ps.size == 2, s"cast(value, @Type) — got ${ps.size} args")
      ps(1) match {
        case _: PTypeRef => scalar(ps.head, rv)
        case other => throw new IllegalArgumentException(
          s"cast's second argument must be a type reference (@a::b::c), got $other")
      }
    // round-13 frontier widening (second half): `->subType(@T)` compiles
    // where the class lattice proves the narrowing VACUOUS — T is the
    // receiver's static type or an ancestor of it — rendering as the
    // identity, exactly like cast. A strict downcast keeps rejecting:
    // graft's mappings are flat single-class tables with no type
    // discriminator column, so there is nothing to filter on (the
    // reference errors identically when a subtype has no inheritance
    // mapping). The lattice comes from the dynamically-scoped [[TypeCtx]]
    // the loaders bind around compilation; with no context bound, every
    // subType rejects (safe default).
    case "subType" =>
      checkSubType(ps, rv)
      scalar(ps.head, rv) // vacuous narrowing proved: erase to the receiver
    // round-13 frontier widening: function application. The function
    // value must be a lambda LITERAL by this point — let-bound lambdas
    // arrive here already inlined by desugarLets, and user-defined
    // functions by inlineUserFunctions — so eval is parameter
    // substitution, reusing substVar's capture guard. A function
    // arriving by REFERENCE (an un-inlined pointer/variable) stays
    // outside the subset and rejects with the frontier message.
    case "eval" =>
      require(ps.nonEmpty, "eval(function, args…)")
      ps.head match {
        case PLambda(params, body) =>
          require(params.size == ps.tail.size,
            s"eval: lambda expects ${params.size} argument(s), got ${ps.tail.size}")
          scalar(params.zip(ps.tail).foldLeft(body) {
            case (b, (p, a)) => substVar(b, p, a)
          }, rv)
        case other => throw new IllegalArgumentException(
          s"eval's function argument must resolve to a lambda literal " +
            s"(let-bound lambdas and user functions are inlined; bare " +
            s"function pointers are outside the subset) — got $other")
      }
    case "and" => bin("AND", ps, rv)
    case "or" => bin("OR", ps, rv)
    case "not" => s"(NOT ${scalar(ps.head, rv)})"
    case "equal" => bin("=", ps, rv)
    case "greaterThan" => bin(">", ps, rv)
    case "greaterThanEqual" => bin(">=", ps, rv)
    case "lessThan" => bin("<", ps, rv)
    case "lessThanEqual" => bin("<=", ps, rv)
    // PURE `plus` is overloaded over numbers AND strings; the Legend
    // engine resolves by static type and emits concat for strings
    // (pinned: LegendEntityTest.scala:195 — `$this.firstName->substring(0,1)
    // + $this.lastName->substring(0,1)` compiles to concat(...)). graft
    // has no type context here, so it resolves syntactically: if any
    // operand is a string literal or a string-returning function, the
    // whole chain is string concatenation.
    case "plus" =>
      val args = ps match { case Seq(PCollection(vs)) => vs; case other => other }
      if (args.exists(looksString)) args.map(scalar(_, rv)).mkString("concat(", ", ", ")")
      else nary("+", ps, rv)
    case "minus" =>
      // single-argument minus is PURE's unary negation
      val args = ps match { case Seq(PCollection(vs)) => vs; case other => other }
      if (args.size == 1) s"(- ${scalar(args.head, rv)})" else nary("-", ps, rv)
    case "times" => nary("*", ps, rv)
    case "divide" => bin("/", ps, rv)
    case "abs" | "floor" | "round" | "sqrt" | "exp" => call(f, ps, rv)
    case "ceiling" => call("ceil", ps, rv)
    // PURE rem keeps the dividend's sign (rem(-12, 5) = -2) — exactly
    // SQL mod; PURE mod is the floored, always-non-negative form
    // (mod(-12, 5) = 3) — Spark's pmod
    case "rem" => call("mod", ps, rv)
    case "mod" => call("pmod", ps, rv)
    // scalar max/min: over a pair or collection literal → greatest/least;
    // over a single collection-typed value (a [0..*] property, an
    // ArrayType column in table space) → array_max/array_min
    // (the aggregation forms are handled by the service translator)
    case "max" | "min" =>
      ps match {
        case Seq(PCollection(Seq(one))) => scalar(one, rv) // max of one value
        case Seq(one) if !one.isInstanceOf[PCollection] =>
          s"array_$f(${scalar(one, rv)})"
        case _ =>
          val flat = ps.flatMap { case PCollection(vs) => vs; case other => Seq(other) }
          call(if (f == "max") "greatest" else "least", flat, rv)
      }
    // round-11 widening: collection folds over a [0..*] property in
    // scalar context (`$this.scores->sum() > 10`), rendered as Spark's
    // codegen'd higher-order aggregate. The accumulator is DOUBLE —
    // graft has no static type context here, and a DOUBLE seed accepts
    // every numeric element type (an integer-typed PURE sum would stay
    // integral in the engine; the difference can't change a comparison's
    // truth value). average of an empty collection is NULL by an
    // explicit size guard — PURE errors there, but a row-level error
    // would abort the whole validation scan under graft's ANSI-default
    // sessions, so the per-row NULL verdict (row excluded by WHERE
    // three-valued logic) is the faithful relational rendering.
    case "sum" =>
      require(ps.size == 1, "scalar sum(collection)")
      s"aggregate(${scalar(ps.head, rv)}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    case "average" | "mean" =>
      require(ps.size == 1, s"scalar $f(collection)")
      val arr = scalar(ps.head, rv) // inlined thrice — deterministic subset, see at()
      s"(CASE WHEN size($arr) = 0 THEN CAST(NULL AS DOUBLE) " +
        s"ELSE aggregate($arr, CAST(0 AS DOUBLE), (acc, x) -> acc + x) / size($arr) END)"
    // round-12 widening: explicit collection fold — PURE's
    // `->fold({e, a | body}, init)` (m3 signature: the lambda binds the
    // ELEMENT first, the accumulator second) maps 1:1 onto Spark's
    // codegen'd aggregate() HOF, whose merge lambda binds the
    // accumulator first — the rendering swaps them. A numeric seed is
    // cast to DOUBLE for the same reason sum()'s is (no static type
    // context; DOUBLE accepts every numeric element type); a
    // string-looking seed stays as-is so string folds (concat chains)
    // keep their type. SUBSET LIMIT (documented, r12 advisor): the
    // DOUBLE accumulator is exact only to 2^53 — an integer fold whose
    // running value exceeds that (e.g. a product over large longs)
    // drifts from PURE's unbounded-Integer semantics. Spark's
    // aggregate() requires merge-result type == seed type, so a
    // BIGINT seed would instead analysis-fail on fractional elements;
    // DOUBLE-with-documented-bound is the deliberate trade.
    case "fold" =>
      require(ps.size == 3, s"fold(collection, {e, a | ...}, init) — got ${ps.size} args")
      val lam = ps(1) match {
        case l: PLambda => l
        case other => throw new IllegalArgumentException(
          s"fold requires a two-parameter lambda, got $other")
      }
      require(lam.params.size == 2, "fold lambda takes (element, accumulator)")
      val Seq(eV, aV) = lam.params
      val bodySql = scalar(
        substVar(substVar(lam.body, eV, PLit("graft_x")), aV, PLit("graft_acc")), rv)
      val initSql = scalar(ps(2), rv)
      val seed = if (looksString(ps(2))) initSql else s"CAST($initSql AS DOUBLE)"
      s"aggregate(${scalar(ps.head, rv)}, $seed, (graft_acc, graft_x) -> $bodySql)"
    // multiplicity [0..1] properties map to nullable columns, so PURE's
    // emptiness checks are null checks in table space
    case "isEmpty" => s"(${scalar(ps.head, rv)} IS NULL)"
    case "isNotEmpty" => s"(${scalar(ps.head, rv)} IS NOT NULL)"
    case "in" =>
      require(ps.size == 2, "in(value, collection)")
      s"(${scalar(ps(0), rv)} IN ${scalar(ps(1), rv)})"
    case "if" =>
      require(ps.size == 3, "if(cond, then, else)")
      val t = unwrapThunk(ps(1)); val z = unwrapThunk(ps(2))
      s"(CASE WHEN ${scalar(ps(0), rv)} THEN ${scalar(t, rv)} ELSE ${scalar(z, rv)} END)"
    case "startsWith" => call("startswith", ps, rv)
    case "endsWith" => call("endswith", ps, rv)
    case "contains" => call("contains", ps, rv)
    case "length" => call("length", ps, rv)
    case "toUpper" => call("upper", ps, rv)
    case "toLower" => call("lower", ps, rv)
    case "trim" => call("trim", ps, rv)
    case "ltrim" => call("ltrim", ps, rv)
    case "rtrim" => call("rtrim", ps, rv)
    case "reverseString" => call("reverse", ps, rv)
    case "replace" => call("replace", ps, rv)
    // round-9 widening: the rest of PURE's everyday string family
    case "lpad" | "rpad" =>
      require(ps.size == 2 || ps.size == 3, s"$f(str, length[, pad])")
      call(f, if (ps.size == 3) ps else ps :+ PLit("' '"), rv)
    case "repeatString" =>
      require(ps.size == 2, "repeatString(str, times)")
      call("repeat", ps, rv)
    // uppercases ONLY the first character (initcap would also lowercase
    // the rest and capitalize every word — different function)
    case "toUpperFirstCharacter" =>
      require(ps.size == 1, "toUpperFirstCharacter(str)")
      val v = scalar(ps.head, rv)
      s"concat(upper(left($v, 1)), substring($v, 2))"
    // PURE: full-string match of [A-Za-z0-9]+ (empty string is false)
    case "isAlphaNumeric" =>
      s"(${scalar(ps.head, rv)} RLIKE '^[A-Za-z0-9]+$$')"
    case "isNoLongerThan" =>
      require(ps.size == 2, "isNoLongerThan(str, n)")
      s"(length(${scalar(ps(0), rv)}) <= ${scalar(ps(1), rv)})"
    case "isNoShorterThan" =>
      require(ps.size == 2, "isNoShorterThan(str, n)")
      s"(length(${scalar(ps(0), rv)}) >= ${scalar(ps(1), rv)})"
    case "left" => call("left", ps, rv)
    case "right" => call("right", ps, rv)
    // PURE indexOf is 0-based; SQL instr is 1-based (and 0 for absent —
    // PURE returns -1 there, which (instr - 1) preserves)
    case "indexOf" =>
      require(ps.size == 2, "indexOf(str, substring)")
      s"(instr(${scalar(ps(0), rv)}, ${scalar(ps(1), rv)}) - 1)"
    case "pow" => call("power", ps, rv)
    case "log" => call("ln", ps, rv) // PURE log is the natural log
    case "joinStrings" => call("concat_ws", ps.tail :+ ps.head, rv) // PURE: joinStrings(col, sep)
    case "toString" => s"CAST(${scalar(ps.head, rv)} AS STRING)"
    // PURE substring(str, start, len) maps 1:1 onto SQL substring —
    // the Legend engine passes the arguments straight through (pinned:
    // LegendEntityTest.scala:195, `substring(0,1)` → `substring(col, 0, 1)`,
    // one character, not an inclusive-end range)
    case "substring" => call("substring", ps, rv)
    // collection size; scalar-context `count` is PURE's collection size too
    // (the aggregation form is handled by the service translator)
    case "size" | "count" => s"size(${scalar(ps.head, rv)})"
    // collection element access: PURE at() is 0-based and ERRORS out of
    // bounds. Plain element_at only errors under ANSI mode, which graft
    // sessions don't enable — so the guard is explicit: raise_error on an
    // out-of-range index (NullType coerces into the element-type branch).
    // The rendered SQL inlines $idx three times and $arr twice; that is
    // SAFE here because every function this translator accepts is
    // query-deterministic (unknown functions reject loudly, and the
    // subset has no rand/uuid analogue; now()/today() are per-query
    // constants in Spark), so the guard and the access always see the
    // same value — re-evaluation costs a bounded constant, never a
    // different element. first()/last() over an empty collection return
    // empty → try_element_at's NULL
    case "at" =>
      require(ps.size == 2, "at(collection, index)")
      val arr = scalar(ps(0), rv)
      val idx = scalar(ps(1), rv)
      s"if($idx >= 0 AND $idx < size($arr), element_at($arr, $idx + 1), " +
        s"raise_error(concat('at(): index ', cast($idx as string), ' out of bounds')))"
    case "first" => s"try_element_at(${scalar(ps.head, rv)}, 1)"
    case "last" => s"try_element_at(${scalar(ps.head, rv)}, -1)"
    case "removeDuplicates" => s"array_distinct(${scalar(ps.head, rv)})"
    // round-9 widening: collection windows. PURE slice/take/drop are
    // 0-based (slice is end-exclusive); SQL slice is 1-based with a
    // LENGTH — lengths clamp at 0 so over-long windows return what
    // exists instead of erroring. Inlined sub-expressions re-evaluate
    // (safe: the translated subset is query-deterministic — see at()).
    case "slice" =>
      require(ps.size == 3, "slice(collection, start, end)")
      val arr = scalar(ps(0), rv); val a = scalar(ps(1), rv); val b = scalar(ps(2), rv)
      s"slice($arr, ($a) + 1, greatest(0, ($b) - ($a)))"
    case "take" | "limit" =>
      require(ps.size == 2, s"$f(collection, n)")
      s"slice(${scalar(ps(0), rv)}, 1, greatest(0, ${scalar(ps(1), rv)}))"
    // negative n drops nothing (PURE semantics), hence the two clamps
    case "drop" =>
      require(ps.size == 2, "drop(collection, n)")
      val arr = scalar(ps(0), rv); val n = scalar(ps(1), rv)
      s"slice($arr, greatest(1, ($n) + 1), greatest(0, size($arr) - greatest(0, $n)))"
    case "concatenate" =>
      require(ps.size == 2, "concatenate(collection, collection)")
      call("concat", ps, rv)
    case "isDistinct" =>
      require(ps.size == 1, "isDistinct(collection)")
      val arr = scalar(ps.head, rv)
      s"(size(array_distinct($arr)) = size($arr))"
    // collection HOFs over a [0..*] property (an ArrayType column in
    // table space) → Spark's higher-order functions; the PURE lambda
    // variable becomes the SQL lambda parameter under a collision-free
    // graft_ rename, so `$t.qty` renders as struct-element access
    // `graft_t.qty` and bare `$t` as `graft_t`. Scalar context only —
    // the relational `filter` verb never reaches here (LegendLoader's
    // pipeline walker consumes it before scalar translation).
    case "forAll" | "exists" | "filter" | "map" =>
      require(ps.size == 2, s"$f(collection, lambda)")
      val (param, body) = ps(1) match {
        case PLambda(Seq(one), b) => (one, b)
        case other => throw new IllegalArgumentException(
          s"$f expects a one-parameter lambda, got $other")
      }
      require(!rv(param),
        s"$f lambda parameter [$$$param] shadows an enclosing row variable")
      val sqlFn = f match {
        case "forAll" => "forall"
        case "map"    => "transform"
        case other    => other
      }
      // The SQL-side parameter must not collide with any property the
      // body references: Spark lambda bindings shadow outer attributes,
      // so `name -> ... $this.name ...` would silently resolve the
      // rendered bare `name` to the lambda element instead of the row
      // column. Rename to a graft_ prefix, re-prefixing until it
      // matches no property named anywhere in the body.
      val taken = propertyNames(body)
      var sqlParam = "graft_" + param
      while (taken(sqlParam)) sqlParam = "graft_" + sqlParam
      s"$sqlFn(${scalar(ps(0), rv)}, $sqlParam -> " +
        s"${scalar(bindElem(body, param, sqlParam), rv)})"
    case "matches" => bin("RLIKE", ps, rv)
    case "parseInteger" => s"CAST(${scalar(ps.head, rv)} AS BIGINT)"
    case "parseFloat" | "parseDecimal" => s"CAST(${scalar(ps.head, rv)} AS DOUBLE)"
    // multiplicity cast: the engine's toOne() only changes the declared
    // multiplicity — in table space the column is already scalar
    case "toOne" => scalar(ps.head, rv)
    case "today" => "current_date()"
    case "now" => "current_timestamp()"
    // date-part additions to the family below (year/monthNumber/… at the
    // adjust/dateDiff block): quarter + ISO week + time-strip + parse
    case "quarterNumber" => call("quarter", ps, rv)
    case "weekOfYear" => call("weekofyear", ps, rv) // both sides ISO weeks
    // datePart strips the time component of a DateTime
    case "datePart" => s"CAST(${scalar(ps.head, rv)} AS DATE)"
    case "parseDate" => s"CAST(${scalar(ps.head, rv)} AS TIMESTAMP)"
    case "firstDayOfMonth" => s"trunc(${scalar(ps.head, rv)}, 'MM')"
    case "firstDayOfYear" => s"trunc(${scalar(ps.head, rv)}, 'YYYY')"
    case "adjust" =>
      require(ps.size == 3, "adjust(date, n, unit)")
      val d = scalar(ps(0), rv); val n = scalar(ps(1), rv)
      durationUnit(ps(2)) match {
        case "DAYS" => s"date_add($d, $n)"
        case "WEEKS" => s"date_add($d, ($n) * 7)"
        case "MONTHS" => s"add_months($d, $n)"
        case "YEARS" => s"add_months($d, ($n) * 12)"
        case u => throw new IllegalArgumentException(s"unsupported adjust unit [$u]")
      }
    case "year" => call("year", ps, rv)
    case "monthNumber" => call("month", ps, rv)
    case "dayOfMonth" => call("day", ps, rv)
    case "hour" => call("hour", ps, rv)
    case "minute" => call("minute", ps, rv)
    case "second" => call("second", ps, rv)
    // PURE dayOfWeekNumber is ISO (Mon=1..Sun=7); SQL dayofweek is
    // Sun=1..Sat=7 — shift accordingly
    case "dayOfWeekNumber" =>
      s"(((dayofweek(${scalar(ps.head, rv)}) + 5) % 7) + 1)"
    case "dateDiff" =>
      require(ps.size == 3, "dateDiff(from, to, unit)")
      val a = scalar(ps(0), rv); val b = scalar(ps(1), rv)
      durationUnit(ps(2)) match {
        // calendar-component differences, matching what the Legend
        // engine emits for dateDiff (pinned: LegendEntityTest.scala:194
        // — YEARS compiles to `year(b) - year(a)`, not elapsed years)
        case "YEARS" => s"(year($b) - year($a))"
        case "MONTHS" => s"(((year($b) - year($a)) * 12) + (month($b) - month($a)))"
        case "WEEKS" => s"CAST(floor(datediff($b, $a) / 7) AS INT)"
        case "DAYS" => s"datediff($b, $a)"
        case "HOURS" => s"CAST(floor((unix_timestamp($b) - unix_timestamp($a)) / 3600) AS INT)"
        case "MINUTES" => s"CAST(floor((unix_timestamp($b) - unix_timestamp($a)) / 60) AS INT)"
        case "SECONDS" => s"CAST(unix_timestamp($b) - unix_timestamp($a) AS INT)"
        case u => throw new IllegalArgumentException(s"unsupported DurationUnit [$u]")
      }
    case other =>
      throw new IllegalArgumentException(
        s"unsupported PURE function [$other] — extend PureToSql.func to add it")
  }

  /** Syntactically-evident string expressions, for resolving PURE's
    * overloaded `plus`: string literals, string-returning functions,
    * and nested string concatenations. */
  private def looksString(e: PureExpr): Boolean = e match {
    case PLit(sql) => sql.startsWith("'")
    case PEnum(_, _) => true
    case PFunc(f, _) if Set("substring", "toUpper", "toLower", "trim",
      "joinStrings", "toString", "replace", "left", "right")(f) => true
    case PFunc("plus", ps) =>
      val args = ps match { case Seq(PCollection(vs)) => vs; case other => other }
      args.exists(looksString)
    case _ => false
  }

  /** Bind a HOF lambda's element variable: occurrences of `$v` become
    * the raw SQL identifier `sql` (Spark resolves it as the lambda
    * parameter), so `$v` renders as `sql` and `$v.field` as `sql.field`.
    * `sql` is the collision-free rename chosen at the HOF call site.
    * Shadowing inner lambdas keep their own binding. */
  private def bindElem(e: PureExpr, v: String, sql: String): PureExpr = e match {
    case PVar(`v`)          => PLit(sql)
    case PProperty(r, n)    => PProperty(bindElem(r, v, sql), n)
    case PFunc(f, ps)       => PFunc(f, ps.map(bindElem(_, v, sql)))
    case PCollection(vs)    => PCollection(vs.map(bindElem(_, v, sql)))
    case PLambda(params, b) if !params.contains(v) => PLambda(params, bindElem(b, v, sql))
    case other              => other
  }

  /** Every property name referenced anywhere in `e` (nested lambdas
    * included) — the identifiers a lambda parameter must not shadow. */
  private def propertyNames(e: PureExpr): Set[String] = e match {
    case PProperty(r, n) => propertyNames(r) + n
    case PFunc(_, ps)    => ps.flatMap(propertyNames).toSet
    case PCollection(vs) => vs.flatMap(propertyNames).toSet
    case PLambda(_, b)   => propertyNames(b)
    case _               => Set.empty
  }

  /** The unit argument of dateDiff: DurationUnit.YEARS arrives as a
    * property access on the enum's element pointer, or as an enumValue. */
  private def durationUnit(e: PureExpr): String = e match {
    case PProperty(PPtr(_), unit) => unit
    case PEnum(_, unit) => unit
    case PLit(sql) => sql.stripPrefix("'").stripSuffix("'")
    case other => throw new IllegalArgumentException(s"expected a DurationUnit, got $other")
  }

  /** PURE thunks branches of `if` as zero-arg lambdas. */
  private def unwrapThunk(e: PureExpr): PureExpr = e match {
    case PLambda(Nil, body) => body
    case other => other
  }

  /** Render a constraint/derivation lambda over `$this`. */
  def lambda(e: PureExpr): String = e match {
    case PLambda(params, body) =>
      scalar(body, if (params.isEmpty) Set("this") else params.toSet + "this")
    case other => scalar(other, Set("this"))
  }
}
