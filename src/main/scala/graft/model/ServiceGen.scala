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

  /** SELECT col AS field..., derivations, FROM table WHERE <expectations>. */
  def mappingSql(model: GraftModel, mappingName: String): String = {
    val m = model.mapping(mappingName)
    val fields = model.allProperties(m.entity).map { p =>
      val colName = m.fields.getOrElse(p.name,
        throw new IllegalArgumentException(s"mapping [${m.name}] has no column for field [${p.name}]"))
      // enum-mapped fields read through their source→enum CASE
      s"${m.enumExpr(p.name).getOrElse(colName)} AS ${p.name}"
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
    * spaces, e.g. "Hiring Age" in service/employee.json). */
  def serviceSql(model: GraftModel, serviceName: String): String = {
    val svc = model.service(serviceName)
    val m = model.mapping(svc.mapping)
    val subs = model.tableSubstitutions(svc.mapping)
    def compile(e: String): String = SqlRewrite.substitute(e, subs)
    import org.apache.spark.sql.catalyst.util.quoteIfNeeded

    val select = svc.select
      .map { case (alias, e) => s"${compile(e)} AS ${quoteIfNeeded(alias)}" }
      .mkString(", ")
    val sb = new StringBuilder(s"SELECT $select FROM ${m.table}")
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
