package graft.model

/** Expectations: every rule a row must satisfy, derived from the model
  * (SURVEY §2.1, M3+M4).
  *
  * Three rule families, mirroring the reference (Legend.scala:515-595 and
  * :407-418, pinned by LegendEntityTest.scala:90-169):
  * - technical: mandatory (`x IS NOT NULL` for `[1..]`) and collection
  *   size (`SIZE(x)` bounds for upper > 1);
  * - enum domain: `x IS NULL OR x IN ('A', ...)`;
  * - business: the class's named constraint expressions, as written.
  *
  * Rules are produced in *entity* space (field names) and compiled to
  * *table* space (column names) through a mapping via [[SqlRewrite]] —
  * the graft analogue of the reference's entity-vs-mapping expectation
  * split. Every expression is a plain Spark SQL boolean usable in
  * `expr()`, `filter()`, or a generated WHERE clause.
  */
object Expectations {

  /** Entity-space rules for a class, inherited and nested included. */
  def forClass(model: GraftModel, className: String): Seq[(String, String)] =
    classRules(model, model.clazz(className), parent = "")

  /** Table-space rules for a mapping: entity rules with every field name
    * rewritten to its mapped column — through the enum-translating CASE
    * where the mapping defines one, and with derived properties inlined
    * so constraints over them (e.g. `hiringAge > 18`) resolve on the
    * raw table. */
  def forMapping(model: GraftModel, mappingName: String): Seq[(String, String)] = {
    val m = model.mapping(mappingName)
    val subs = model.tableSubstitutions(mappingName)
    flatRules(m, forClass(model, m.entity), subs).map { case (name, sql) =>
      name -> SqlRewrite.substitute(sql, subs)
    }
  }

  /** Rules validatable on THIS mapping's flat table. A rule touching an
    * OTHERWISE-routed property beyond its inline (embedded) columns
    * cannot resolve here — those values live behind the otherwise join
    * and validate under the TARGET class's own mapping; keeping the rule
    * would make every row a false violation (or fail the read). Inline
    * leaves keep their rules: they substitute by dotted key. */
  private def flatRules(m: GraftMapping, rules: Seq[(String, String)],
      subs: Map[String, String]): Seq[(String, String)] =
    if (m.otherwiseJoins.isEmpty) rules
    else {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      rules.filterNot { case (_, sql) =>
        // an unparseable rule is KEPT (predicate false): it surfaces as its
        // own per-rule Failure when substitute() parses it downstream —
        // throwing here would poison the whole mapping's rule list
        scala.util.Try(CatalystSqlParser.parseExpression(sql)).toOption.exists(_.exists {
          case a: UnresolvedAttribute =>
            m.otherwiseJoins.contains(a.nameParts.head) &&
              !(1 to a.nameParts.size).exists(k => subs.contains(a.nameParts.take(k).mkString(".")))
          case _ => false
        })
      }
    }

  /** Per-rule compile results instead of fail-fast — an unparseable
    * business constraint surfaces as a Failure without poisoning the
    * rest (reference: getExpectations returns Map[rule, Try[sql]],
    * Legend.scala:83-91). */
  def compiledForClass(model: GraftModel, className: String): Map[String, scala.util.Try[String]] =
    forClass(model, className).map { case (name, sql) =>
      name -> scala.util.Try { SqlRewrite.validateSyntax(sql); sql }
    }.toMap

  def compiledForMapping(model: GraftModel, mappingName: String): Map[String, scala.util.Try[String]] = {
    val m = model.mapping(mappingName)
    // substitutions compile once; a bad derivation poisons every rule's
    // Try uniformly (it would poison every rule's compile anyway)
    val subs = scala.util.Try(model.tableSubstitutions(mappingName))
    val rules = forClass(model, m.entity)
    subs.map(s => flatRules(m, rules, s)).getOrElse(rules).map { case (name, sql) =>
      name -> subs.flatMap(s => scala.util.Try(SqlRewrite.substitute(sql, s)))
    }.toMap
  }

  private def classRules(model: GraftModel, c: GraftClass, parent: String): Seq[(String, String)] = {
    val inherited = c.superTypes.flatMap(st => classRules(model, model.clazz(st), parent))
    val fromProps = c.properties.flatMap(propertyRules(model, _, parent))
    // a nested class's own constraints reference its fields BARE; under a
    // parent path they must resolve against the dotted field ("zip > 0"
    // inside address → "address.zip > 0")
    val business = c.constraints.map { k =>
      if (parent.isEmpty) k.name -> k.expr
      else {
        val prefixed = model.allProperties(c.name)
          .map(p => p.name -> s"$parent.${p.name}").toMap
        k.name -> SqlRewrite.substitute(k.expr, prefixed)
      }
    }
    inherited ++ fromProps ++ business
  }

  private def propertyRules(model: GraftModel, p: GraftProperty, parent: String): Seq[(String, String)] = {
    val field = if (parent.isEmpty) p.name else s"$parent.${p.name}"

    val mandatory =
      if (!p.multiplicity.isNullable)
        Seq(s"[$field] is mandatory" -> s"$field IS NOT NULL")
      else Nil

    val size =
      if (p.multiplicity.isCollection) {
        val rule = p.multiplicity.upper match {
          case Some(u) => s"$field IS NULL OR (SIZE($field) BETWEEN ${p.multiplicity.lower} AND $u)"
          case None    => s"$field IS NULL OR SIZE($field) >= ${p.multiplicity.lower}"
        }
        Seq(s"[$field] has invalid size" -> rule)
      } else Nil

    val nested: Seq[(String, String)] =
      if (p.isReference) {
        model.classes.get(p.dataType) match {
          case Some(nestedClass) if !p.multiplicity.isCollection =>
            // recurse into non-collection nested classes with a dotted
            // path. Under an OPTIONAL parent the nested rules only apply
            // when the value is present — without the guard, an absent
            // [0..1] nested value (NULL struct / all-NULL embedded
            // leaves) would violate every mandatory leaf rule and the
            // governed read would silently drop the row.
            val rules = classRules(model, nestedClass, field)
            if (p.multiplicity.isNullable)
              rules.map { case (name, sql) => name -> s"$field IS NULL OR ($sql)" }
            else rules
          case Some(_) => Nil
          case None =>
            val e = model.enum(p.dataType)
            val values = e.values.map(v => s"'${v.replace("'", "''")}'").mkString(", ")
            Seq(s"[$field] not allowed value" -> s"$field IS NULL OR $field IN ($values)")
        }
      } else Nil

    mandatory ++ size ++ nested
  }
}
