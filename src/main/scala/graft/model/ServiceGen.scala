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

  /** As-of conjuncts for one table under the service's dates — the full
    * temporal validation matrix (r12: business, processing, bitemporal).
    * The single-date `.all(d)` slot is [[GraftService.businessDate]] and
    * is interpreted against the TABLE's declared temporality (Legend's
    * semantics: a temporal class's generated `all()` signature follows
    * its stereotype); bitemporal requires the two-date form, pinned
    * order (processingDate, businessDate). `isMain = false` (navigated
    * hops) skips the "dates given but table not milestoned" rejection —
    * a non-temporal hop inside a temporal query is legal and simply
    * contributes no conjunct. */
  private def asOfPredicate(model: GraftModel, svc: GraftService,
                            table: String, prefix: String,
                            isMain: Boolean): Option[String] = {
    import org.apache.spark.sql.catalyst.util.quoteIfNeeded
    def pred(cols: (String, String), d: String) =
      s"$prefix${quoteIfNeeded(cols._1)} <= $d AND $d < $prefix${quoteIfNeeded(cols._2)}"
    def fail(msg: String) = throw new IllegalArgumentException(
      s"service [${svc.name}]: $msg")
    val biz = model.milestoningOf(table)
    val proc = model.processingMilestoningOf(table)
    (biz, proc) match {
      case (None, None) =>
        if (isMain && (svc.businessDate.isDefined || svc.processingDate.isDefined))
          fail(s".all(<date>...) given but table [$table] declares no " +
            "milestoning in its store")
        None
      case (Some(bt), None) =>
        if (svc.processingDate.isDefined)
          fail(s"table [$table] is business-temporal only — query with " +
            "single-date .all(<businessDate>), not the two-date form")
        val d = svc.businessDate.getOrElse(fail(
          s"table [$table] is business-temporal (milestoned " +
            s"${bt._1}/${bt._2}) — query the entity with .all(<date>)"))
        Some(pred(bt, d))
      case (None, Some(io)) =>
        if (svc.processingDate.isDefined)
          fail(s"table [$table] is processing-temporal only — query with " +
            "single-date .all(<processingDate>), not the two-date form")
        val d = svc.businessDate.getOrElse(fail(
          s"table [$table] is processing-temporal (milestoned " +
            s"${io._1}/${io._2}) — query the entity with .all(<date>)"))
        Some(pred(io, d))
      case (Some(bt), Some(io)) =>
        val pd = svc.processingDate
        val bd = svc.businessDate
        if (pd.isEmpty || bd.isEmpty)
          fail(s"table [$table] is BITEMPORAL (business ${bt._1}/${bt._2}, " +
            s"processing ${io._1}/${io._2}) — query the entity with " +
            ".all(<processingDate>, <businessDate>)")
        Some(s"${pred(io, pd.get)} AND ${pred(bt, bd.get)}")
    }
  }

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
          if (m.otherwiseJoins.contains(p.name))
            s"mapping [${m.name}] field [${p.name}] is OTHERWISE-routed through a " +
              "join — the flat governed read cannot materialize the full value; " +
              "read its fields through a service navigation instead"
          else s"mapping [${m.name}] has no column for field [${p.name}]"))
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
    * Association navigation (`$x.customer.name`, `$x.customer.nation.name`
    * in entity space) compiles to a JOIN-generating query: each hop of a
    * navigation CHAIN becomes one equi-join on its store join's FK
    * columns (LEFT JOIN for an optional hop — and for every hop past an
    * optional one, so an absent ancestor can't silently drop the row),
    * and navigated fields resolve through the TARGET class's mapping.
    * Unknown fields, undefined chains, unmapped joins, and ambiguous
    * navigation all reject loudly at compile time — never silently
    * misread. Each emitted join is a plain FK equi-join: Spark shuffles
    * it like any fact join (or broadcasts the dim side), and service
    * filters still land in WHERE as scan-pushable conjuncts. */
  def serviceSql(model: GraftModel, serviceName: String): String = {
    val svc = model.service(serviceName)
    val m = model.mapping(svc.mapping)
    import org.apache.spark.sql.catalyst.util.quoteIfNeeded

    val allExprs = svc.select.map(_._2) ++ svc.where.toSeq ++ svc.groupBy ++
      svc.orderBy.map(o => splitDirection(o)._1)
    val navs = resolveNavigations(model, svc, m, allExprs)

    // substitution maps are hoisted: one build per SERVICE, not one per
    // expression (tableSubstitutions parses every value through Catalyst)
    val compile: String => String =
      if (navs.isEmpty) {
        import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        // pre-parse once: string-level substitute would re-parse the
        // whole map for every expression
        val subs = model.tableSubstitutions(svc.mapping)
          .map { case (k, v) => k -> CatalystSqlParser.parseExpression(v) }
        e => SqlRewrite.substituteParsed(CatalystSqlParser.parseExpression(e), subs).sql
      } else {
        import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        val mainSubs = model.tableSubstitutions(svc.mapping).map { case (f, sql) =>
          f -> prefixAttrs(CatalystSqlParser.parseExpression(sql), MainAlias)
        }
        val navSubs = navs.flatMap { case (path, n) =>
          n.subs.map { case (f, ex) => s"$path.$f" -> ex }
        }.toMap
        val navHeads = navs.map(_._1.split('.').head).toSet
        // mainSubs wins on collision: an OTHERWISE-partial embedding has
        // its inline leaves in mainSubs AND the same dotted keys in the
        // joined target's navSubs — the inline column must resolve flat
        // (never pay the join for data the row already carries)
        e => compileJoined(svc, navHeads, navSubs ++ mainSubs, e)
      }

    // milestoning: a milestoned table may only be read as-of its
    // declared dimension(s), and `.all(date...)` is only meaningful on
    // a milestoned entity — all directions reject loudly (Legend's
    // compile-time contract; full matrix in [[asOfPredicate]]).
    // The main table's as-of predicate lands in WHERE (scan-pushable);
    // a navigated hop's lands INSIDE its JOIN ON (resolveNavigations),
    // so a LEFT JOIN still yields the row with nulls when no version is
    // current — outer-join semantics unchanged.
    val mainAsOf = asOfPredicate(model, svc, m.table,
      prefix = if (navs.isEmpty) "" else s"$MainAlias.", isMain = true)

    val select = svc.select
      .map { case (alias, e) => s"${compile(e)} AS ${quoteIfNeeded(alias)}" }
      .mkString(", ")
    val from =
      if (navs.isEmpty) m.table
      else {
        // parents-first order (resolveNavigations guarantees it), each
        // hop joining against its PARENT's alias
        val joins = navs.map { case (_, n) =>
          s"${n.joinKeyword} ${n.mapping.table} AS ${n.alias} ON " +
            s"${n.parentAlias}.${quoteIfNeeded(n.myCol)} = ${n.alias}.${quoteIfNeeded(n.otherCol)}" +
            n.asOf.map(p => s" AND $p").getOrElse("")
        }.mkString(" ")
        s"${m.table} AS $MainAlias $joins"
      }
    val sb = new StringBuilder(s"SELECT $select FROM $from")
    (mainAsOf, svc.where.map(compile)) match {
      case (Some(a), Some(w)) => sb.append(s" WHERE ($a) AND ($w)")
      case (Some(a), None)    => sb.append(s" WHERE $a")
      case (None, Some(w))    => sb.append(s" WHERE $w")
      case (None, None)       => ()
    }
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

  /** One resolved navigation hop: SQL alias, the PARENT hop's alias
    * (the join's left side), join keyword (LEFT JOIN when this hop's
    * property is optional OR any ancestor hop is — an absent optional
    * ancestor must not let a later inner join drop the row), target
    * class mapping, oriented FK columns, and the target's
    * field→expression substitutions (already alias-prefixed). */
  private final case class Nav(alias: String, parentAlias: String,
      joinKeyword: String, mapping: GraftMapping, myCol: String, otherCol: String,
      subs: Map[String, org.apache.spark.sql.catalyst.expressions.Expression],
      /** As-of predicate for a MILESTONED target table, alias-prefixed,
        * emitted inside the JOIN ON (preserves LEFT JOIN semantics). */
      asOf: Option[String] = None)

  /** Find every association navigation CHAIN the service's expressions
    * use and resolve each hop (parents before children) to its join +
    * target mapping. Each hop's join is declared by the mapping of the
    * class it navigates FROM (the main mapping for hop 1, the previous
    * hop's target mapping after). Loud failures: AMBIGUOUS navigation
    * (two associations or two target mappings — never resolved by
    * map-iteration luck), a hop with no associationMapping join, a join
    * missing from every store or defined in several, join columns
    * matching neither table. */
  private def resolveNavigations(model: GraftModel, svc: GraftService,
      m: GraftMapping, exprs: Seq[String]): Seq[(String, Nav)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

    def unambiguous(fromClass: String, prop: String): Option[GraftProperty] = {
      val cands = model.navigations(fromClass, prop)
      if (cands.isEmpty) None
      else {
        // full-property comparison: candidates agreeing on target class
        // but not multiplicity would pick INNER vs LEFT JOIN by map order
        require(cands.distinct.size == 1,
          s"service [${svc.name}]: association property [$prop] from [$fromClass] is " +
            s"ambiguous (candidates: ${cands.distinct
              .map(p => s"${p.dataType}${p.multiplicity}").mkString(", ")})")
        Some(cands.head)
      }
    }

    /** The property navigated as `prop` out of `fromClass` under
      * `fromMapping`: an association property, or a class-typed property
      * the mapping routes through an OTHERWISE join. Embedded columns
      * take precedence over otherwise routing — a dotted path the
      * mapping's flat fields already cover resolves without a join
      * (`remaining` is the dotted path from the current hop), so the
      * otherwise join only fires for fields the inline columns lack. */
    def navProperty(fromMapping: GraftMapping, fromClass: String, prop: String,
        remaining: String): Option[GraftProperty] =
      unambiguous(fromClass, prop).orElse {
        if (!fromMapping.otherwiseJoins.contains(prop) ||
            fromMapping.fields.contains(remaining)) None
        else model.classes.get(fromClass)
          .flatMap(_ => model.allProperties(fromClass).find(_.name == prop))
          .filter(_.isReference)
      }

    /** The target class's mapping, preferring `<service mapping>::<class>`
      * then the unique mapping of that entity (loud on several). */
    def targetMapping(target: String): GraftMapping =
      model.mappings.get(s"${svc.mapping}::$target").getOrElse {
        val byEntity = model.mappings.values.filter(_.entity == target).toSeq
        require(byEntity.size <= 1,
          s"service [${svc.name}]: class [$target] has multiple mappings " +
            s"(${byEntity.map(_.name).mkString(", ")}) — none named [${svc.mapping}::$target]")
        byEntity.headOption.getOrElse(throw new IllegalArgumentException(
          s"service [${svc.name}]: no mapping found for navigated class [$target]"))
      }

    /** Longest prefix of `parts` that is a valid navigation chain
      * (association hops and otherwise-routed hops). */
    def chainOf(parts: Seq[String]): Seq[String] = {
      var cls = m.entity
      var mp = m
      val out = Seq.newBuilder[String]
      var i = 0
      var stop = false
      while (i < parts.size && !stop) {
        navProperty(mp, cls, parts(i), parts.drop(i).mkString(".")) match {
          case Some(p) =>
            cls = p.dataType; out += parts(i); i += 1
            if (i < parts.size) mp = targetMapping(cls)
          case None => stop = true
        }
      }
      out.result()
    }

    val chains = exprs.flatMap { e =>
      CatalystSqlParser.parseExpression(e).collect {
        case a: UnresolvedAttribute if a.nameParts.size > 1 => chainOf(a.nameParts)
      }
    }.filter(_.nonEmpty)
    // every prefix needs its own hop; parents sort before children
    val paths = chains.flatMap(c => (1 to c.size).map(c.take))
      .distinct.sortBy(p => (p.size, p.mkString(".")))

    val resolved = scala.collection.mutable.LinkedHashMap[String, Nav]()
    for (path <- paths) {
      val (fromMapping, fromAlias, fromClass, parentOptional) =
        if (path.size == 1) (m, MainAlias, m.entity, false)
        else {
          val pn = resolved(path.dropRight(1).mkString("."))
          (pn.mapping, pn.alias, pn.mapping.entity, pn.joinKeyword == "LEFT JOIN")
        }
      val prop = path.last
      val navProp = navProperty(fromMapping, fromClass, prop, prop).get // paths came from chainOf
      // navigating THROUGH a to-many property would compile to a plain
      // join that fans out / duplicates main rows — PURE collection
      // semantics require an aggregation this generator doesn't model.
      // Loud failure, never a silently wrong row count.
      require(!navProp.multiplicity.isCollection,
        s"service [${svc.name}]: association property [${path.mkString(".")}] is " +
          s"to-many ${navProp.multiplicity} — collection navigation is not " +
          "supported (it would duplicate rows); aggregate in a dedicated " +
          "service over the target class instead")
      val target = navProp.dataType
      val joinRef = fromMapping.navJoin(prop).getOrElse(throw new IllegalArgumentException(
        s"service [${svc.name}]: association property [$prop] has no join in mapping " +
          s"[${fromMapping.name}] (missing associationMappings entry)"))
      // exact (store-qualified) key first; bare references resolve only
      // when the name is unambiguous across loaded stores
      val jd = model.joins.getOrElse(joinRef, {
        val byName = model.joins.values.filter(_.name == joinRef).toSeq
        require(byName.size <= 1,
          s"service [${svc.name}]: join [$joinRef] is defined in multiple stores — " +
            "qualify the reference with its store path")
        byName.headOption.getOrElse(throw new IllegalArgumentException(
          s"service [${svc.name}]: join [$joinRef] is not defined in any loaded store"))
      })
      val tm = targetMapping(target)
      val (myCol, otherCol) = jd.orient(fromMapping.table).getOrElse(
        throw new IllegalArgumentException(
          s"service [${svc.name}]: join [${jd.name}] does not touch table [${fromMapping.table}]"))
      require(jd.orient(tm.table).isDefined,
        s"service [${svc.name}]: join [${jd.name}] does not touch target table [${tm.table}]")
      val alias = s"t${resolved.size + 1}"
      val joinKeyword =
        if (navProp.multiplicity.isNullable || parentOptional) "LEFT JOIN" else "JOIN"
      val targetSubs = model.tableSubstitutions(tm.name)
        .map { case (f, sql) => f -> prefixAttrs(CatalystSqlParser.parseExpression(sql), alias) }
      // milestoned navigation target: requires the service's as-of
      // date(s) (a date-less read of a temporal table is a compile
      // error), and the predicate joins the hop's ON clause, not WHERE
      val hopAsOf = asOfPredicate(model, svc, tm.table,
        prefix = s"$alias.", isMain = false)
      resolved += path.mkString(".") -> Nav(alias, fromAlias, joinKeyword, tm,
        myCol, otherCol, targetSubs, hopAsOf)
    }
    resolved.toSeq
  }

  /** Entity-space expression → table-space SQL over the aliased joins.
    * The substitution is the SAME longest-prefix walk the single-table
    * path uses ([[SqlRewrite.substituteParsed]]) — nav fields ride the
    * map as dotted "path.field" keys. Any attribute still headed by a
    * navigation property AFTER substitution is an unknown field or an
    * undefined chain — rejected loudly, never passed through to fail
    * (or worse, resolve against an unrelated column) at run time. */
  private def compileJoined(svc: GraftService, navHeads: Set[String],
      subs: Map[String, org.apache.spark.sql.catalyst.expressions.Expression],
      e: String): String = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    val out = SqlRewrite.substituteParsed(CatalystSqlParser.parseExpression(e), subs)
    out.foreach {
      case a: UnresolvedAttribute if navHeads(a.nameParts.head) =>
        throw new IllegalArgumentException(
          s"service [${svc.name}]: [${a.name}] does not resolve — unknown navigated " +
            "field or association chain not defined by the model")
      case _ => ()
    }
    out.sql
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
