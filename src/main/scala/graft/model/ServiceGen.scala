package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Service / mapping → executable SQL (SURVEY §2.1, M8).
  *
  * Two generators, mirroring the reference's `generateSql`
  * (Legend.scala:110-152, pinned by LegendEntityTest.scala:201-244):
  *
  * - [[mappingSql]]: the "governed read" of a mapping — every mapped
  *   field projected back under its entity name, all derivations
  *   appended, and every compilable expectation pushed into the WHERE
  *   clause so only clean rows flow (the reference pushes constraint
  *   filters the same way, Legend.scala:124-134).
  *
  * - [[serviceSql]]: a declarative service query (project / filter /
  *   group / order / limit over entity-space expressions) compiled to
  *   one SQL string in table space.
  *
  * The emitted SQL is plain Spark SQL over the mapping's table name —
  * `spark.sql` it directly (table/view must be resolvable) or feed it to
  * any catalog-aware runner. Filters land in WHERE as scan-pushable
  * conjuncts; nothing here defeats predicate pushdown.
  */
object ServiceGen {

  /** SELECT col AS field..., derivations, FROM table WHERE <expectations>.
    * EMBEDDED fields rebuild their entity shape: a nested class mapped to
    * dotted flat columns projects back as `struct(col AS leaf, …) AS
    * field` — the governed read returns the ENTITY schema even though
    * the table stores the leaves flat. */
  def mappingSql(model: GraftModel, mappingName: String): String = {
    val m = model.mapping(mappingName)
    // tableSubstitutions covers flat fields (through enum CASEs),
    // embedded heads (struct rebuilds), and derivations — one builder
    val subs = model.tableSubstitutions(mappingName)
    val fields = model.allProperties(m.entity).map { p =>
      val sql = subs.getOrElse(p.name,
        throw new IllegalArgumentException(
          s"mapping [${m.name}] has no column for field [${p.name}]"))
      s"$sql AS ${p.name}"
    }
    val derivations = Transformer.derivationsForMapping(model, mappingName)
      .map { case (name, sql) => s"$sql AS $name" }
    val where = Expectations.forMapping(model, mappingName).map(_._2)
    val select = (fields ++ derivations).mkString(", ")
    if (where.isEmpty) s"SELECT $select FROM ${m.table}"
    else s"SELECT $select FROM ${m.table} WHERE ${where.map(w => s"($w)").mkString(" AND ")}"
  }

  /** Compile a declarative service to a single table-space SQL string.
    * Fields compile through enum CASEs and derivations inline (so a
    * service may project derived properties like `age`); aliases are
    * backtick-quoted when needed (the reference corpus has aliases with
    * spaces, e.g. "Hiring Age" in service/employee.json).
    *
    * Association navigation (`$x.customer.name` → `customer.name` in
    * entity space) compiles to a JOIN-generating query for the
    * SINGLE-HOP case: each navigated association property becomes one
    * inner equi-join on the store join's FK columns, and the navigated
    * field resolves through the TARGET class's mapping. Deeper
    * navigation chains, unknown target fields, and unmapped joins all
    * reject loudly at compile time — never silently misread. The join is
    * a plain FK equi-join in the emitted SQL: Spark shuffles it like any
    * fact join (or broadcasts the dim side), and service filters still
    * land in WHERE as scan-pushable conjuncts. */
  def serviceSql(model: GraftModel, serviceName: String): String = {
    val svc = model.service(serviceName)
    val m = model.mapping(svc.mapping)
    import org.apache.spark.sql.catalyst.util.quoteIfNeeded

    val allExprs = svc.select.map(_._2) ++ svc.where.toSeq ++ svc.groupBy ++
      svc.orderBy.map(o => splitDirection(o)._1)
    val navs = resolveNavigations(model, svc, m, allExprs)

    def compile(e: String): String =
      if (navs.isEmpty) SqlRewrite.substitute(e, model.tableSubstitutions(svc.mapping))
      else compileJoined(model, svc, m, navs, e)

    val select = svc.select
      .map { case (alias, e) => s"${compile(e)} AS ${quoteIfNeeded(alias)}" }
      .mkString(", ")
    val from =
      if (navs.isEmpty) m.table
      else {
        val joins = navs.values.map { n =>
          s"JOIN ${n.mapping.table} AS ${n.alias} ON " +
            s"$MainAlias.${quoteIfNeeded(n.myCol)} = ${n.alias}.${quoteIfNeeded(n.otherCol)}"
        }.mkString(" ")
        s"${m.table} AS $MainAlias $joins"
      }
    val sb = new StringBuilder(s"SELECT $select FROM $from")
    svc.where.foreach(w => sb.append(s" WHERE ${compile(w)}"))
    if (svc.groupBy.nonEmpty)
      sb.append(s" GROUP BY ${svc.groupBy.map(compile).mkString(", ")}")
    if (svc.orderBy.nonEmpty) {
      // entries are "expr [ASC|DESC]"; aliases pass through the rewrite
      val parts = svc.orderBy.map { o =>
        val (e, dir) = splitDirection(o)
        s"${compile(e)}$dir"
      }
      sb.append(s" ORDER BY ${parts.mkString(", ")}")
    }
    svc.limit.foreach(n => sb.append(s" LIMIT $n"))
    sb.toString
  }

  private val MainAlias = "t0"

  /** A resolved single-hop navigation: SQL alias, target class mapping,
    * oriented FK columns, and the target's field→expression substitutions
    * (already alias-prefixed). */
  private final case class Nav(alias: String, mapping: GraftMapping,
      myCol: String, otherCol: String,
      subs: Map[String, org.apache.spark.sql.catalyst.expressions.Expression])

  /** Find every association property the service's expressions navigate,
    * and resolve each to its join + target mapping. Loud failures: a
    * navigated property with no associationMapping join, a join name
    * missing from the store, join columns matching neither table, or no
    * mapping for the target class. */
  private def resolveNavigations(model: GraftModel, svc: GraftService,
      m: GraftMapping, exprs: Seq[String]): Map[String, Nav] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    val heads = exprs.flatMap { e =>
      CatalystSqlParser.parseExpression(e).collect {
        case a: UnresolvedAttribute if a.nameParts.size > 1 &&
          model.navigationTarget(m.entity, a.nameParts.head).isDefined => a.nameParts.head
      }
    }.distinct.sorted
    heads.zipWithIndex.map { case (prop, i) =>
      val target = model.navigationTarget(m.entity, prop).get
      val joinName = m.assocJoins.getOrElse(prop, throw new IllegalArgumentException(
        s"service [${svc.name}]: association property [$prop] has no join in mapping [${m.name}] " +
          "(missing associationMappings entry)"))
      val jd = model.joins.getOrElse(joinName, throw new IllegalArgumentException(
        s"service [${svc.name}]: join [$joinName] is not defined in any loaded store"))
      val tm = model.mappings.get(s"${svc.mapping}::$target")
        .orElse(model.mappings.values.find(_.entity == target))
        .getOrElse(throw new IllegalArgumentException(
          s"service [${svc.name}]: no mapping found for navigated class [$target]"))
      val (myCol, otherCol) = jd.orient(m.table).getOrElse(
        throw new IllegalArgumentException(
          s"service [${svc.name}]: join [$joinName] does not touch table [${m.table}]"))
      require(jd.orient(tm.table).isDefined,
        s"service [${svc.name}]: join [$joinName] does not touch target table [${tm.table}]")
      val alias = s"t${i + 1}"
      val targetSubs = model.tableSubstitutions(tm.name)
        .map { case (f, sql) => f -> prefixAttrs(CatalystSqlParser.parseExpression(sql), alias) }
      prop -> Nav(alias, tm, myCol, otherCol, targetSubs)
    }.toMap
  }

  /** Entity-space expression → table-space SQL over the aliased join.
    * Main-entity fields resolve through the main mapping under t0;
    * `assoc.field` resolves through the target mapping under its alias;
    * anything deeper than one hop rejects. */
  private def compileJoined(model: GraftModel, svc: GraftService, m: GraftMapping,
      navs: Map[String, Nav], e: String): String = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    lazy val mainSubs: Map[String, Expression] = model.tableSubstitutions(svc.mapping)
      .map { case (f, sql) => f -> prefixAttrs(CatalystSqlParser.parseExpression(sql), MainAlias) }
    def walk(ex: Expression): Expression = ex match {
      case a: UnresolvedAttribute if navs.contains(a.nameParts.head) =>
        require(a.nameParts.size == 2,
          s"service [${svc.name}]: navigation [${a.name}] is deeper than one hop — " +
            "only single-join association navigation is supported")
        val n = navs(a.nameParts.head)
        n.subs.getOrElse(a.nameParts(1), throw new IllegalArgumentException(
          s"service [${svc.name}]: [${a.name}] — class [${n.mapping.entity}] has no mapped " +
            s"field [${a.nameParts(1)}]"))
      case a: UnresolvedAttribute =>
        // longest dotted-prefix match (embedded fields are dotted keys)
        val hit = (a.nameParts.size to 1 by -1).iterator
          .map(k => (k, a.nameParts.take(k).mkString(".")))
          .find { case (_, key) => mainSubs.contains(key) }
        hit match {
          case Some((k, key)) =>
            val tail = a.nameParts.drop(k)
            mainSubs(key) match {
              case ua: UnresolvedAttribute => UnresolvedAttribute(ua.nameParts ++ tail)
              case replacement =>
                require(tail.isEmpty,
                  s"cannot substitute expression under dotted path [${a.name}]")
                replacement
            }
          case None => a
        }
      case other => other.mapChildren(walk)
    }
    walk(CatalystSqlParser.parseExpression(e)).sql
  }

  /** Prefix every attribute head in `e` with a table alias (the
    * substitution values are raw-column expressions of ONE table). */
  private def prefixAttrs(e: org.apache.spark.sql.catalyst.expressions.Expression,
      alias: String): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    e.transform { case a: UnresolvedAttribute => UnresolvedAttribute(alias +: a.nameParts) }
  }

  /** Run a service against a session whose catalog resolves the mapping's
    * table name (register the parquet as a temp view first, or use a real
    * catalog table — reference: query(), Legend.scala:105-108). */
  def runService(spark: SparkSession, model: GraftModel, serviceName: String): DataFrame =
    spark.sql(serviceSql(model, serviceName))

  def runMapping(spark: SparkSession, model: GraftModel, mappingName: String): DataFrame =
    spark.sql(mappingSql(model, mappingName))

  private def splitDirection(o: String): (String, String) = {
    val t = o.trim
    val upper = t.toUpperCase
    if (upper.endsWith(" DESC")) (t.dropRight(5).trim, " DESC")
    else if (upper.endsWith(" ASC")) (t.dropRight(4).trim, " ASC")
    else (t, "")
  }
}
