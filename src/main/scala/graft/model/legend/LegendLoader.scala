package graft.model.legend

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Loader for FINOS Legend entity-protocol JSON — the `{classifierPath,
  * content}` files the Legend studio/SDLC toolchain produces (reference:
  * LegendFileLoader.scala:1-30 / LegendClasspathLoader.scala, consuming
  * the same format from `src/test/resources/entities`).
  *
  * This closes the model-interchange gap: a user with an existing Legend
  * workspace points graft at their entity directory and gets a
  * [[GraftModel]] — classes (properties, multiplicities, inheritance,
  * constraints, qualified properties), enumerations, relational mappings,
  * and services — with every PURE lambda translated to entity-space
  * Spark SQL by [[PureToSql]] at load time. From there the native
  * pipeline applies unchanged: SchemaGen builds the StructType,
  * Expectations/Validator compile codegen'd rule columns, Transformer
  * applies derivations, ServiceGen emits executable SQL.
  *
  * Scope (documented, load-time-checked): the PURE subset in
  * [[PureToSql]]; relational class mappings with column property
  * mappings, EMBEDDED mappings (nested classes flattened to dotted
  * column paths), and single-target OTHERWISE-embedded mappings
  * (inline columns resolve flat; uncovered fields route through the
  * otherwise join to the target class's own mapping — multi-join and
  * nested otherwise reject); association navigation
  * CHAINS — association entities + mapping associationMappings + store
  * FK joins compile `$x.assoc.field` / `$x.a.b.field` to chained SQL
  * joins (undefined chains, compound join operations, unmapped joins,
  * and ambiguous navigation reject loudly); services whose execution is
  * a single getAll → filter? → (project | groupBy) → sort? → take?
  * pipeline — the relational service shape the reference executes.
  */
object LegendLoader {

  private val mapper = new ObjectMapper()

  /** Load and merge every .json entity under a directory (recursive). */
  def fromDirectory(dir: String): GraftModel = {
    val files = Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".json") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString)
    require(files.nonEmpty, s"no .json entity files under [$dir]")
    fromJsonStrings(files.map(Files.readString(_)))
  }

  def fromFile(path: String): GraftModel =
    fromJsonStrings(Seq(Files.readString(Paths.get(path))))

  /** Load every .json entity under a CLASSPATH directory (recursive) —
    * the deployment shape where the entity corpus ships inside the
    * application jar (reference: LegendClasspathLoader.loadResources).
    * Works for both exploded-directory and jar classpath entries: the
    * resource URI is walked through NIO, mounting the jar filesystem
    * when needed. */
  def fromResources(base: String): GraftModel = {
    val normalized = if (base.startsWith("/")) base else "/" + base
    val url = getClass.getResource(normalized)
    require(url != null, s"classpath resource directory not found: [$normalized]")
    val uri = url.toURI
    def walk(root: java.nio.file.Path): GraftModel = {
      val files = Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".json") && Files.isRegularFile(p))
        .toSeq.sortBy(_.toString)
      require(files.nonEmpty, s"no .json entity files under classpath [$normalized]")
      fromJsonStrings(files.map(Files.readString(_)))
    }
    if (uri.getScheme == "jar") {
      val fs = java.nio.file.FileSystems.newFileSystem(uri, java.util.Map.of[String, String]())
      try walk(fs.getPath(normalized)) finally fs.close()
    } else walk(Paths.get(uri))
  }

  /** Two-pass load (round 13): pass 1 parses every entity's STRUCTURE
    * (classes without their lambda bodies, no services); pass 2 compiles
    * constraint/derivation/service lambdas under a [[TypeCtx]] built from
    * the fully-merged class set. Lambda translation itself is
    * type-context-free — the split exists so the one lattice-dependent
    * construct (`->subType(@T)`) can see every class, whatever order the
    * entity files arrive in. Failures still surface at LOAD time. */
  def fromJsonStrings(jsons: Seq[String]): GraftModel = {
    val contents = jsons.map { j =>
      val root = mapper.readTree(j)
      val c = root.get("content")
      require(c != null, "not a Legend entity: missing [content]")
      c
    }
    val skeleton = contents.map(parseEntityContent).reduce(_ merge _)
    contents.foldLeft(skeleton) { (m, c) =>
      c.path("_type").asText() match {
        case "class"   => attachClassBodies(m, c)
        case "service" => attachService(m, c)
        case _         => m
      }
    }
  }

  /** One entity file → a (usually single-element) model fragment.
    * Unknown classifier paths (runtimes, connections, database DDL) are
    * skipped: they describe execution environments, not the model.
    * Runs both passes over the single entity, so a standalone class
    * compiles its own constraints/derivations (the lattice is just the
    * one class plus whatever its superTypes resolve to — nothing, here). */
  def parseEntity(root: JsonNode): GraftModel = {
    val content = root.get("content")
    require(content != null, "not a Legend entity: missing [content]")
    val skeleton = parseEntityContent(content)
    content.path("_type").asText() match {
      case "class"   => attachClassBodies(skeleton, content)
      case "service" => attachService(skeleton, content)
      case _         => skeleton
    }
  }

  /** Pass 2a: compile a class entity's constraint + qualified-property
    * lambdas under a [[TypeCtx]] rooted at the class, over the fully
    * merged model — so `->subType(@T)` sees every class regardless of
    * entity-file order — and attach them to the skeleton class. */
  private def attachClassBodies(m: GraftModel, c: JsonNode): GraftModel = {
    val name = fullPath(c)
    PureToSql.withTypes(TypeCtx.of(m, name)) {
      val constraints = elems(c, "constraints").map { k =>
        val lam = PureExpr.parse(k.get("functionDefinition"))
        GraftConstraint(k.get("name").asText(), PureToSql.lambda(lam),
          pure = Some(PureRender.renderLambda(lam)))
      }
      // qualified properties ("derived properties"): zero-arg lambdas over
      // $this → derivation expressions (reference: Legend.scala:254-263)
      val derivations = elems(c, "qualifiedProperties").map { q =>
        val body = elems(q, "body")
        require(body.size == 1,
          s"qualified property [${q.get("name").asText()}]: expected single-expression body")
        val bodyExpr = PureExpr.parse(body.head)
        GraftDerivation(q.get("name").asText(),
          PureToSql.scalar(bodyExpr, Set("this")),
          pure = Some(PureRender.render(bodyExpr)))
      }
      m.copy(classes = m.classes.updated(name,
        m.classes(name).copy(constraints = constraints, derivations = derivations)))
    }
  }

  /** Pass 2b: parse + compile a service entity over the fully merged
    * model, binding the [[TypeCtx]] at the entity the execution lambda
    * actually QUERIES — the `getAll` pointer — so typed `$this` chains
    * inside the lambda can prove a subType vacuous. r15 (advisory fix):
    * rooting at the mapping's bare-path entry was wrong for MULTI-class
    * mappings, whose bare entry is just the first class mapping — a
    * subType against the real queried entity would be checked against
    * the wrong root and could be erased as vacuous when it is a genuine
    * narrowing (PureParser.querySql already rooted at the queried
    * entity; this aligns the protocol path). When no getAll pointer
    * resolves to a loaded class, compile context-free — subType then
    * rejects, the safe default. */
  private def attachService(m: GraftModel, c: JsonNode): GraftModel = {
    val queried = for {
      exec <- Option(c.get("execution"))
      fn <- Option(exec.get("func"))
      entity <- findGetAllEntity(PureExpr.parse(fn))
      if m.classes.contains(entity)
    } yield entity
    val ctx = queried.map(TypeCtx.of(m, _)).getOrElse(TypeCtx.empty)
    val (path, svc) = PureToSql.withTypes(ctx)(parseService(c))
    m.copy(services = m.services.updated(path, svc))
  }

  /** The class pointer inside the pipeline's `getAll` source — found by
    * walking DOWN the verb chain's first argument (every pipeline verb
    * keeps its source first), so arbitrary filter/project/sort stacks
    * above the getAll don't hide it. */
  private def findGetAllEntity(e: PureExpr): Option[String] = {
    import PureExpr._
    e match {
      case PLambda(_, b)                        => findGetAllEntity(b)
      case PFunc("getAll" | "all", PPtr(p) +: _) => Some(p)
      case PFunc(_, src +: _)                   => findGetAllEntity(src)
      case _                                    => None
    }
  }

  /** Pass-1 structural parse: classes arrive WITHOUT constraints/
    * derivations and services are skipped — both compile in pass 2
    * ([[attachClassBodies]]/[[attachService]]) once the class lattice is
    * complete. */
  private def parseEntityContent(content: JsonNode): GraftModel = {
    content.path("_type").asText() match {
      case "class"       => GraftModel(Map(parseClass(content)), Map.empty, Map.empty, Map.empty)
      case "Enumeration" => GraftModel(Map.empty, Map(parseEnum(content)), Map.empty, Map.empty)
      case "mapping"     => GraftModel(Map.empty, Map.empty, parseMapping(content), Map.empty)
      case "service"     => GraftModel.empty
      case "association" => GraftModel.empty.copy(associations = Map(parseAssociation(content)))
      // a relational Database (store) entity: the model only needs its
      // named FK joins (association navigation) and each table's
      // business-milestoning declaration; schemas/DDL stay with the
      // execution environment
      case "relational"  =>
        val (biz, proc) = parseStoreMilestoning(content)
        GraftModel.empty.copy(
          joins = parseStoreJoins(content),
          milestoning = biz,
          processingMilestoning = proc)
      case _             => GraftModel.empty
    }
  }

  private def fullPath(content: JsonNode): String =
    content.get("package").asText() + "::" + content.get("name").asText()

  private def elems(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def parseMultiplicity(n: JsonNode): Multiplicity = {
    val lower = n.path("lowerBound").asInt(0)
    val upper = Option(n.get("upperBound")).map(_.asInt())
    Multiplicity(lower, upper)
  }

  private def parseClass(c: JsonNode): (String, GraftClass) = {
    val name = fullPath(c)
    val props = elems(c, "properties").map { p =>
      GraftProperty(
        name = p.get("name").asText(),
        dataType = p.get("type").asText(),
        multiplicity = Option(p.get("multiplicity")).map(parseMultiplicity)
          .getOrElse(Multiplicity.One),
        doc = docTag(p))
    }
    // constraints + qualified properties compile in pass 2
    // ([[attachClassBodies]]), once — under the full-lattice TypeCtx
    name -> GraftClass(
      name = name,
      superTypes = elems(c, "superTypes").map(_.asText()),
      properties = props,
      doc = docTag(c))
  }

  /** A PURE association: exactly two class-typed properties that become
    * navigable from each other's class (multiplicity kept — [0..1]
    * navigation compiles to an outer join). */
  private def parseAssociation(c: JsonNode): (String, GraftAssociation) = {
    val name = fullPath(c)
    val props = elems(c, "properties").map { p =>
      GraftProperty(
        name = p.get("name").asText(),
        dataType = p.get("type").asText(),
        multiplicity = Option(p.get("multiplicity")).map(parseMultiplicity)
          .getOrElse(Multiplicity.One))
    }
    name -> GraftAssociation(name, props)
  }

  /** Named FK joins from a relational Database (store) entity, keyed
    * `<storePath>::<joinName>` so same-named joins in two stores never
    * collide (an associationMapping's join reference carries the store
    * path and resolves against the qualified key). Scope: the
    * single-equality form `equal(tableA.colX, tableB.colY)` — the
    * FK shape association navigation compiles to one SQL join. Compound
    * (and/or) and filtered join operations reject loudly. */
  private def parseStoreJoins(c: JsonNode): Map[String, GraftJoinDef] = {
    val path = fullPath(c)
    elems(c, "joins").map { j =>
      val name = j.get("name").asText()
      val op = j.get("operation")
      require(op.path("_type").asText() == "dynaFunc" &&
        op.path("funcName").asText() == "equal",
        s"store [$path] join [$name]: only single-equality FK joins are supported, " +
          s"got [${op.path("funcName").asText(op.path("_type").asText())}]")
      val params = elems(op, "parameters")
      require(params.size == 2 && params.forall(_.path("_type").asText() == "column"),
        s"store [$path] join [$name]: expected equal(column, column)")
      def side(p: JsonNode): (String, String) =
        (p.path("table").path("table").asText(), p.get("column").asText())
      val (lt, lc) = side(params(0))
      val (rt, rc) = side(params(1))
      s"$path::$name" -> GraftJoinDef(name, lt, lc, rt, rc)
    }.toMap
  }

  /** Business-milestoning declarations from a relational store's tables
    * (protocol: `schemas[].tables[].milestoning` — the reference's
    * vendored corpus carries the array empty, e.g.
    * src/test/resources/entities/databricks/table/employee.json:129;
    * the populated shape is the legend-engine grammar's
    * `businessMilestoning(from=..., thru=...)`). Keyed by table name as
    * the store writes it (the same convention as join sides — bare
    * within the store). `thruIsInclusive` and processing/bitemporal
    * milestoning reject loudly — outside the supported frontier, never
    * silently misread as-of semantics. */
  private def parseStoreMilestoning(
      c: JsonNode): (Map[String, (String, String)], Map[String, (String, String)]) = {
    val path = fullPath(c)
    val biz = Map.newBuilder[String, (String, String)]
    val proc = Map.newBuilder[String, (String, String)]
    elems(c, "schemas").foreach { s =>
      elems(s, "tables").foreach { t =>
        val tname = t.path("name").asText()
        elems(t, "milestoning").foreach { m =>
          m.path("_type").asText() match {
            case "businessMilestoning" =>
              require(!m.path("thruIsInclusive").asBoolean(false),
                s"store [$path] table [$tname]: thruIsInclusive business " +
                  "milestoning is not supported (thru is exclusive)")
              val from = m.path("from").asText()
              val thru = m.path("thru").asText()
              require(from.nonEmpty && thru.nonEmpty,
                s"store [$path] table [$tname]: businessMilestoning needs from + thru columns")
              biz += tname -> (from, thru)
            // processing milestoning (r12): record/warehouse validity —
            // a row is visible for processing dates in <= d < out. A
            // table declaring BOTH types is bitemporal (two-date .all).
            case "processingMilestoning" =>
              require(!m.path("outIsInclusive").asBoolean(false),
                s"store [$path] table [$tname]: outIsInclusive processing " +
                  "milestoning is not supported (out is exclusive)")
              val in = m.path("in").asText()
              val out = m.path("out").asText()
              require(in.nonEmpty && out.nonEmpty,
                s"store [$path] table [$tname]: processingMilestoning needs in + out columns")
              proc += tname -> (in, out)
            case other => sys.error(
              s"store [$path] table [$tname]: unsupported milestoning type " +
                s"[$other] — only businessMilestoning and processingMilestoning are supported")
          }
        }
      }
    }
    (biz.result(), proc.result())
  }

  /** The doc profile tagged value, if present. */
  private def docTag(n: JsonNode): Option[String] =
    elems(n, "taggedValues").collectFirst {
      case tv if tv.path("tag").path("value").asText() == "doc" =>
        tv.path("value").asText()
    }

  private def parseEnum(c: JsonNode): (String, GraftEnum) = {
    val name = fullPath(c)
    name -> GraftEnum(name, elems(c, "values").map(_.get("value").asText()), docTag(c))
  }

  /** Relational class mappings → one GraftMapping per mapped class,
    * keyed `<mappingPath>` (single-class mappings, the common case) with
    * extra classes keyed `<mappingPath>::<class>`.
    *
    * Enumeration mappings (source code → enum value, reference:
    * mapping/employee_delta.json `enumerationMappings` — which the
    * reference's own getMappingFields drops, LegendUtils.scala:342-356)
    * are parsed and attached to the fields that reference them via
    * `enumMappingId`; unknown ids and non-string source values fail at
    * load (no silent path). */
  private def parseMapping(c: JsonNode): Map[String, GraftMapping] = {
    val path = fullPath(c)
    val rel = elems(c, "classMappings").filter(_.path("_type").asText() == "relational")
    require(rel.nonEmpty, s"mapping [$path] has no relational class mappings")

    // enumeration mappings, keyed by explicit id or the protocol's
    // default id (the enumeration path with :: collapsed to _)
    val enumMaps: Map[String, Seq[(String, String)]] =
      elems(c, "enumerationMappings").map { em =>
        val enumeration = em.path("enumeration").asText()
        val id = Option(em.get("id")).map(_.asText())
          .getOrElse(enumeration.replace("::", "_"))
        val pairs = elems(em, "enumValueMappings").flatMap { evm =>
          val enumValue = evm.get("enumValue").asText()
          elems(evm, "sourceValues").map { sv =>
            sv.path("_type").asText() match {
              case "stringSourceValue" | "integerSourceValue" =>
                sv.get("value").asText() -> enumValue
              case other => throw new IllegalArgumentException(
                s"mapping [$path] enumeration [$enumeration]: unsupported source value type [$other]")
            }
          }
        }
        id -> pairs
      }.toMap

    // association property → store join name. One join per navigation
    // (the single-hop scope); elementWithJoins chains reject loudly.
    // The map is keyed by property NAME and shared by every class
    // mapping in this file, so two associations whose properties share
    // a name would silently bind navigations to the wrong join
    // (last-one-wins) — duplicates pointing at different joins reject
    // at load instead.
    val assocJoins: Map[String, String] = {
      val pairs = elems(c, "associationMappings").flatMap { am =>
        val assoc = am.path("association").asText()
        elems(am, "propertyMappings").map { pm =>
          val prop = pm.path("property").path("property").asText()
          val op = pm.get("relationalOperation")
          require(op != null && op.path("_type").asText() == "elementWithJoins",
            s"mapping [$path] association [$assoc] property [$prop]: expected elementWithJoins")
          val joins = elems(op, "joins")
          require(joins.size == 1,
            s"mapping [$path] association [$assoc] property [$prop]: " +
              s"only single-join navigation is supported, got ${joins.size} joins")
          // qualify by the referenced store when present (two stores may
          // both define a join of the same name)
          val joinName = joins.head.path("name").asText()
          val db = joins.head.path("db").asText("")
          (assoc, prop, if (db.isEmpty) joinName else s"$db::$joinName")
        }
      }
      val clashes = pairs.groupBy(_._2).filter(_._2.map(_._3).distinct.size > 1)
      require(clashes.isEmpty,
        s"mapping [$path]: association property name(s) " +
          s"[${clashes.keys.toSeq.sorted.mkString(", ")}] are mapped to " +
          "different joins by multiple associationMappings " +
          s"(${clashes.values.flatten.map(t => s"${t._1}.${t._2}→${t._3}")
            .toSeq.sorted.mkString("; ")}) — navigation would bind to an " +
          "arbitrary one; rename the association properties")
      pairs.map(t => t._2 -> t._3).toMap
    }

    rel.zipWithIndex.map { case (cm, i) =>
      val entity = cm.get("class").asText()
      val mt = cm.get("mainTable")
      val schema = mt.path("schema").asText("")
      val table = mt.get("table").asText()
      val qualified =
        if (schema.isEmpty || schema == "default") table else s"$schema.$table"
      var enumFields = Map.empty[String, Seq[(String, String)]]
      var otherwiseJoins = Map.empty[String, String]
      // column-backed property mappings, plus EMBEDDED mappings flattened
      // recursively to dotted field paths ("address.city" → addr_city —
      // the nested class's fields live as flat columns of the same
      // table); OTHERWISE-embedded mappings additionally route the
      // property through a store join for fields the embedded columns
      // don't cover; anything else fails loudly at load, never silently
      def parseProps(pms: Seq[JsonNode], prefix: String): Seq[(String, String)] =
        pms.flatMap { pm =>
          val tpe = pm.path("_type").asText()
          val field0 = pm.path("property").path("property").asText()
          val field = if (prefix.isEmpty) field0 else s"$prefix.$field0"
          tpe match {
            case "relationalPropertyMapping" =>
              val op = pm.get("relationalOperation")
              if (op.path("_type").asText() != "column") throw new IllegalArgumentException(
                s"mapping [$path] property [$field]: only column property mappings are supported")
              Option(pm.get("enumMappingId")).map(_.asText()).foreach { id =>
                val pairs = enumMaps.getOrElse(id, throw new IllegalArgumentException(
                  s"mapping [$path] property [$field]: unknown enumMappingId [$id]"))
                enumFields += field -> pairs
              }
              Seq(field -> op.get("column").asText())
            case "embeddedPropertyMapping" =>
              val nested = elems(pm.path("classMapping"), "propertyMappings")
              require(nested.nonEmpty,
                s"mapping [$path] embedded property [$field]: empty classMapping")
              parseProps(nested, field)
            case "otherwiseEmbeddedPropertyMapping" =>
              // the SINGLE-TARGET otherwise case: inline columns (possibly
              // none — the pure-routing form) plus one join to the target
              // class's own mapping. Multi-join routing rejects loudly.
              require(prefix.isEmpty,
                s"mapping [$path] property [$field]: otherwise routing inside an " +
                  "embedded mapping is not supported — flatten the outer embedding " +
                  "or map the nested class with its own class mapping")
              val ow = pm.get("otherwisePropertyMapping")
              require(ow != null,
                s"mapping [$path] property [$field]: otherwiseEmbeddedPropertyMapping " +
                  "without an otherwisePropertyMapping")
              val op = ow.get("relationalOperation")
              require(op != null && op.path("_type").asText() == "elementWithJoins",
                s"mapping [$path] property [$field]: otherwise target must be " +
                  "elementWithJoins, got " +
                  s"[${Option(op).map(_.path("_type").asText()).getOrElse("nothing")}]")
              val joins = elems(op, "joins")
              require(joins.size == 1,
                s"mapping [$path] property [$field]: only single-target otherwise " +
                  s"routing is supported, got ${joins.size} joins")
              val joinName = joins.head.path("name").asText()
              val db = joins.head.path("db").asText("")
              otherwiseJoins += field -> (if (db.isEmpty) joinName else s"$db::$joinName")
              parseProps(elems(pm.path("classMapping"), "propertyMappings"), field)
            case other => throw new IllegalArgumentException(
              s"mapping [$path] property [$field]: unsupported property mapping type [$other]")
          }
        }
      val fields = parseProps(elems(cm, "propertyMappings"), "").toMap
      // an otherwise property whose name an associationMapping also binds
      // (to a DIFFERENT join) would make navJoin's precedence silently
      // decisive — reject the collision at load instead
      val owClashes = otherwiseJoins.filter { case (p, j) =>
        assocJoins.get(p).exists(_ != j)
      }
      require(owClashes.isEmpty,
        s"mapping [$path]: property name(s) [${owClashes.keys.toSeq.sorted.mkString(", ")}] " +
          "are bound to one join by an associationMapping and a different one by an " +
          "otherwise mapping — navigation would be ambiguous")
      val key = if (i == 0) path else s"$path::$entity"
      key -> GraftMapping(key, entity, qualified, fields, enumFields, assocJoins, otherwiseJoins)
    }.toMap
  }

  /** A pureSingleExecution service → GraftService. The execution lambda
    * must be the relational pipeline shape; anything else fails at load
    * with the offending verb. */
  private def parseService(c: JsonNode): (String, GraftService) = {
    import PureExpr._
    val path = fullPath(c)
    val exec = c.get("execution")
    require(exec != null && exec.path("_type").asText() == "pureSingleExecution",
      s"service [$path]: only pureSingleExecution services are supported")
    val mappingName = exec.get("mapping").asText()
    val lam = PureExpr.parse(exec.get("func"))
    val bodyExpr = lam match {
      case PLambda(_, b) => b
      case other         => other
    }
    val doc = Option(c.get("documentation")).map(_.asText()).filter(_.nonEmpty)
    path -> compilePipeline(path, mappingName, bodyExpr, doc)
  }

  /** Compile a relational PURE pipeline body — getAll → filter →
    * project/groupBy → sort → take — into a [[GraftService]]. Shared by
    * protocol services (above) and text queries ([[PureParser]]): both
    * the wire format and the textual grammar express the same verb
    * chain, so one walker serves both and every widening lands for both.
    */
  private[legend] def compilePipeline(path: String, mappingName: String,
                                      bodyExpr: PureExpr,
                                      doc: Option[String] = None): GraftService = {
    import PureExpr._

    var where: Option[String] = None
    var select: Seq[(String, String)] = Nil
    var groupBy: Seq[String] = Nil
    var orderBy: Seq[String] = Nil
    var limit: Option[Int] = None
    var businessDate: Option[String] = None
    var processingDate: Option[String] = None

    def rowSql(e: PureExpr): String = e match {
      case l: PLambda => PureToSql.lambda(l)
      case other      => PureToSql.scalar(other, Set("this"))
    }

    def aliasStrings(e: PureExpr): Seq[String] = e match {
      case PCollection(vs) => vs.map { case PLit(sql) => sql.stripPrefix("'").stripSuffix("'")
                                       case other => sys.error(s"expected alias string, got $other") }
      case PLit(sql)       => Seq(sql.stripPrefix("'").stripSuffix("'"))
      case other           => sys.error(s"expected alias strings, got $other")
    }

    def values(e: PureExpr): Seq[PureExpr] = e match {
      case PCollection(vs) => vs
      case other           => Seq(other)
    }

    /** agg(x|x.field, y|y.average()) → "avg(field)". */
    def aggSql(e: PureExpr): String = e match {
      case PFunc("agg", Seq(mapLam, aggLam)) =>
        val mapped = rowSql(mapLam)
        val fn = aggLam match {
          case PLambda(_, PFunc(f, _)) => f
          case other => sys.error(s"expected aggregation lambda, got $other")
        }
        val sqlFn = fn match {
          case "average" => "avg"
          case "count" | "sum" | "min" | "max" => fn
          case "distinct" => "collect_set"
          case "uniqueValueOnly" | "first" => "first"
          // round-9 widening: the dispersion family (Spark and DuckDB
          // agree on both names and sample/population semantics)
          case "stdDevSample" => "stddev_samp"
          case "stdDevPopulation" => "stddev_pop"
          case "varianceSample" => "var_samp"
          case "variancePopulation" => "var_pop"
          case other => sys.error(s"unsupported aggregation function [$other]")
        }
        s"$sqlFn($mapped)"
      case other => sys.error(s"expected agg(...), got $other")
    }

    def walk(e: PureExpr): Unit = e match {
      case PFunc("take", Seq(src, PLit(n))) =>
        limit = Some(n.toInt); walk(src)
      case PFunc("limit", Seq(src, PLit(n))) =>
        limit = Some(n.toInt); walk(src)
      case PFunc("sort", Seq(src, keys)) =>
        // sort keys are projection aliases; quote when not a plain
        // identifier (the corpus has aliases like "Hiring Age")
        import org.apache.spark.sql.catalyst.util.quoteIfNeeded
        orderBy = values(keys).map {
          case PFunc("desc", Seq(k)) => s"${quoteIfNeeded(aliasStrings(k).head)} DESC"
          case PFunc("asc", Seq(k))  => s"${quoteIfNeeded(aliasStrings(k).head)} ASC"
          case PLit(sql)             => quoteIfNeeded(sql.stripPrefix("'").stripSuffix("'"))
          case other => sys.error(s"unsupported sort key $other")
        }
        walk(src)
      case PFunc("project", Seq(src, cols, aliases)) =>
        select = aliasStrings(aliases).zip(values(cols).map(rowSql))
        walk(src)
      case PFunc("groupBy", Seq(src, keys, aggs, aliases)) =>
        val keyExprs = values(keys).map(rowSql)
        val aggExprs = values(aggs).map(aggSql)
        val names = aliasStrings(aliases)
        require(names.size == keyExprs.size + aggExprs.size,
          s"service [$path]: groupBy aliases must cover keys + aggregations")
        select = names.zip(keyExprs ++ aggExprs)
        groupBy = keyExprs
        walk(src)
      case PFunc("filter", Seq(src, pred)) =>
        where = Some(rowSql(pred)); walk(src)
      case PFunc("getAll", Seq(PPtr(_))) => () // the mapping names the table
      // temporal `.all(...)` / `->getAll(...)`: the as-of date(s) ride
      // the service; ServiceGen compiles them against the store's
      // milestoning declarations. One date = the entity's single
      // temporal dimension (business OR processing — ServiceGen
      // resolves which); two dates = bitemporal, PINNED order
      // (processingDate, businessDate) — see GraftService.businessDate.
      case PFunc("getAll", PPtr(_) +: dateArgs) if dateArgs.size <= 2 =>
        def dateSql(a: PureExpr): String = a match {
          case PLit(sql) if sql.startsWith("DATE ") ||
                            sql.startsWith("TIMESTAMP ") => sql
          case PVar(nm) => sys.error(
            s"service [$path]: milestoned getAll parameter [$$$nm] is unbound — " +
              "bind it to a date literal (PureParser.compileQuery params) before compiling")
          case other => sys.error(
            s"service [$path]: unsupported getAll date argument $other — expected a strict date literal")
        }
        dateArgs match {
          case Seq(d)      => businessDate = Some(dateSql(d))
          case Seq(pd, bd) => processingDate = Some(dateSql(pd))
                              businessDate = Some(dateSql(bd))
          case _           => ()
        }
      case PFunc("getAll", PPtr(_) +: rest) if rest.size > 2 => sys.error(
        s"service [$path]: getAll takes at most two dates (processing, business), got ${rest.size}")
      case other =>
        sys.error(s"service [$path]: unsupported pipeline step $other")
    }
    walk(bodyExpr)

    GraftService(
      name = path,
      mapping = mappingName,
      select = select,
      where = where,
      groupBy = groupBy,
      orderBy = orderBy,
      limit = limit,
      doc = doc,
      businessDate = businessDate,
      processingDate = processingDate)
  }
}
