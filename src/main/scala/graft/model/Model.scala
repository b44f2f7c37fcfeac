package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** graft's data-model core (SURVEY §2.1, M1).
  *
  * A `GraftModel` is the Spark-first re-expression of the reference's
  * entity model (reference: Legend.scala:46-103 — classes, enumerations,
  * mappings, services loaded from JSON entities): classes with typed,
  * multiplicity-bounded properties, inheritance and nesting; enumerations;
  * relational mappings (entity field → table column); and services
  * (declarative queries against a mapping).
  *
  * Unlike the reference there is no external compiler dependency:
  * constraints and derivations are Spark SQL expressions over *entity*
  * field names, compiled into table space by rewriting attributes through
  * the mapping (see [[Expectations]] / [[Transformer]]), so everything
  * stays inside Catalyst.
  */
final case class Multiplicity(lower: Int, upper: Option[Int]) {
  require(lower >= 0, s"multiplicity lower bound must be >= 0, got $lower")
  /** More than one value allowed → Spark ArrayType. */
  def isCollection: Boolean = upper.forall(_ > 1)
  /** Zero values allowed → nullable column. */
  def isNullable: Boolean = lower == 0
  def isInfinite: Boolean = upper.isEmpty
  override def toString: String = (lower, upper) match {
    case (l, Some(u)) if l == u => s"[$l]"
    case (l, Some(u))           => s"[$l..$u]"
    case (l, None)              => s"[$l..*]"
  }
}

object Multiplicity {
  val One: Multiplicity = Multiplicity(1, Some(1))
  val ZeroOrOne: Multiplicity = Multiplicity(0, Some(1))
  val ZeroMany: Multiplicity = Multiplicity(0, None)
  val OneMany: Multiplicity = Multiplicity(1, None)

  private val Exact = """\[(\d+)\]""".r
  private val Range = """\[(\d+)\.\.(\d+)\]""".r
  private val Unbounded = """\[(\d+)\.\.\*\]""".r

  def parse(s: String): Multiplicity = s.trim match {
    case Exact(n)        => Multiplicity(n.toInt, Some(n.toInt))
    case Range(l, u)     => Multiplicity(l.toInt, Some(u.toInt))
    case Unbounded(l)    => Multiplicity(l.toInt, None)
    case other           => throw new IllegalArgumentException(s"invalid multiplicity [$other]")
  }
}

/** A property (field) of a class. `dataType` is either a primitive name
  * (String, Boolean, Integer, Number, Float, Decimal, Date, StrictDate,
  * DateTime, Binary) or a fully-qualified reference (`ns::Name`) to
  * another class or enumeration in the model. */
final case class GraftProperty(
    name: String,
    dataType: String,
    multiplicity: Multiplicity = Multiplicity.One,
    doc: Option[String] = None) {
  def isReference: Boolean = dataType.contains("::")
}

/** A named boolean Spark SQL expression over entity field names; rows
  * where the expression is not TRUE violate the rule. `pure` carries the
  * uncompiled PURE spelling when the constraint came from a Legend
  * source — the reference's `getExpectations(compile = false)` surface
  * (LegendEntityTest.scala:135-151). */
final case class GraftConstraint(name: String, expr: String,
                                 pure: Option[String] = None)

/** A named Spark SQL expression over entity field names producing a
  * derived column (reference: qualified properties, Legend.scala:254-263).
  * `pure` as on [[GraftConstraint]] (`getDerivations(compile = false)`). */
final case class GraftDerivation(name: String, expr: String,
                                 pure: Option[String] = None)

final case class GraftClass(
    name: String,
    superTypes: Seq[String] = Nil,
    properties: Seq[GraftProperty] = Nil,
    constraints: Seq[GraftConstraint] = Nil,
    derivations: Seq[GraftDerivation] = Nil,
    doc: Option[String] = None)

final case class GraftEnum(name: String, values: Seq[String], doc: Option[String] = None)

/** Relational mapping: which table an entity persists to, the
  * entity-field → table-column renames (reference: relational mapping,
  * Legend.scala:310-320), and optional enumeration source-value
  * translations (reference: enumerationMappings in the mapping protocol,
  * e.g. entities/databricks/mapping/employee_delta.json — which the
  * reference's own loader drops; graft translates them).
  *
  * `enumFields` maps an entity field to ordered (sourceValue, enumValue)
  * pairs: the raw column holds source codes, the entity value is the
  * enum value. */
final case class GraftMapping(
    name: String,
    entity: String,
    table: String,
    fields: Map[String, String],
    enumFields: Map[String, Seq[(String, String)]] = Map.empty,
    /** association property → store join name (from the mapping file's
      * associationMappings); shared by every class mapping of the file */
    assocJoins: Map[String, String] = Map.empty,
    /** class-typed property → store join name, from this class mapping's
      * `otherwiseEmbeddedPropertyMapping`s: fields NOT covered by the
      * embedded columns resolve through the target class's own mapping
      * via this join (Legend's otherwise routing). Unlike assocJoins,
      * scoped to THIS class mapping. */
    otherwiseJoins: Map[String, String] = Map.empty) {

  /** The store join navigating `prop` out of this mapping: association
    * joins first (association properties never collide with class
    * properties — load rejects shared names bound to different joins),
    * then otherwise-embedded routing. */
  def navJoin(prop: String): Option[String] =
    assocJoins.get(prop).orElse(otherwiseJoins.get(prop))
  /** table column → entity field (for lifting raw tables into entity space). */
  lazy val inverse: Map[String, String] = fields.map(_.swap)

  /** The table-space SQL reading `field` in entity terms: a CASE
    * translating source codes to enum values, or None when no
    * translation is needed (no enum mapping, or all pairs identity —
    * the common case; eliding the CASE keeps the plan unchanged).
    * Unmapped source codes pass through raw so the enum-domain
    * expectation catches them instead of silently nulling. */
  def enumExpr(field: String): Option[String] = {
    val col = fields.getOrElse(field, field)
    enumFields.get(field).filter(_.exists { case (s, e) => s != e }).map { pairs =>
      def q(s: String) = "'" + s.replace("'", "''") + "'"
      val whens = pairs.map { case (s, e) => s"WHEN ${q(s)} THEN ${q(e)}" }.mkString(" ")
      s"CASE $col $whens ELSE $col END"
    }
  }
}

/** A PURE association: a named pair of navigable properties, each typed
  * by a class — `order.customer` / `customer.orders`. Associations ADD
  * properties to both classes (they are not declared on the class
  * itself), which is why navigation resolution searches the model's
  * associations rather than the class's property list. Property
  * multiplicity is carried so navigation can honor optionality
  * ([0..1] → outer join). */
final case class GraftAssociation(name: String, properties: Seq[GraftProperty]) {
  require(properties.size == 2,
    s"association [$name] must have exactly 2 properties, got ${properties.size}")
  /** The property navigated as `property` FROM `fromClass`, if this
    * association defines that navigation. */
  def navigation(fromClass: String, property: String): Option[GraftProperty] =
    properties.collectFirst {
      case p if p.name == property &&
        properties.exists(o => o.name != property && o.dataType == fromClass) => p
    }
}

/** A store join definition (reference protocol: the `joins` array of a
  * relational Database entity): a named FK equality between two table
  * columns. Only the simple single-equality form is in scope — compound
  * and filtered joins reject at load. */
final case class GraftJoinDef(name: String, leftTable: String, leftCol: String,
                              rightTable: String, rightCol: String) {
  /** (myCol, otherCol) oriented so `myCol` belongs to `table`.
    * Schema-qualified names disambiguate first; the bare-name fallback
    * (a mapping's mainTable is often unqualified) only fires when it is
    * unambiguous. Both sides matching — a self-association, or two
    * schemas sharing a table name probed by bare name — REJECTS loudly:
    * silently picking the left orientation would emit a reversed join
    * condition for reverse navigation. */
  def orient(table: String): Option[(String, String)] = {
    def bare(t: String) = t.split('.').last
    def ambiguous(how: String): Nothing = throw new IllegalArgumentException(
      s"join [$name]: both sides ($leftTable, $rightTable) match table " +
        s"[$table] $how — orientation is ambiguous (self-association or " +
        "colliding table names across schemas); qualify the table with its " +
        "schema or model the self-join with distinct aliases")
    (leftTable == table, rightTable == table) match {
      case (true, true)  => ambiguous("exactly")
      case (true, false) => Some((leftCol, rightCol))
      case (false, true) => Some((rightCol, leftCol))
      case _ =>
        (bare(leftTable) == bare(table), bare(rightTable) == bare(table)) match {
          case (true, true)  => ambiguous("by bare name")
          case (true, false) => Some((leftCol, rightCol))
          case (false, true) => Some((rightCol, leftCol))
          case _             => None
        }
    }
  }
}

/** A declarative query over a mapping — the graft analogue of a Legend
  * service (PURE lambda → SQL, reference: Legend.scala:140-149). All
  * expressions are in entity space; ServiceGen compiles to one SQL string
  * in table space. */
final case class GraftService(
    name: String,
    mapping: String,
    select: Seq[(String, String)], // alias -> entity-space expression
    where: Option[String] = None,
    groupBy: Seq[String] = Nil,
    orderBy: Seq[String] = Nil,
    limit: Option[Int] = None,
    doc: Option[String] = None,
    /** Business-temporal as-of date (a SQL date/timestamp literal, e.g.
      * `DATE '1996-06-15'`) from PURE `.all(date)` — Legend's flagship
      * temporal feature in the reference's financial domain. ServiceGen
      * compiles it to `from <= d AND d < thru` on every MILESTONED table
      * the service touches (WHERE for the main table — scan-pushable —
      * and inside the JOIN ON for navigated hops, so LEFT-JOIN
      * semantics are unchanged). Milestone columns are declared by the
      * store ([[GraftModel.milestoning]]).
      *
      * Date-slot convention (r12): a SINGLE `.all(d)` date always lands
      * here, and ServiceGen interprets it against the main table's
      * declared temporality — business conjunct for a business-temporal
      * table, processing conjunct for a processing-temporal one
      * (Legend's own semantics: the generated `all()` signature follows
      * the class's temporal stereotype, so the one-date form means
      * "the one dimension this entity has"). A BITEMPORAL
      * `.all(pd, bd)` carries processingDate FIRST (pinned order,
      * spec'd in LegendParserSpec) — pd lands in [[processingDate]],
      * bd here. */
    businessDate: Option[String] = None,
    /** Processing-temporal as-of date — only ever set by the two-date
      * bitemporal form (see the slot convention on [[businessDate]]).
      * Compiled to `in <= d AND d < out` on the store-declared
      * processing-milestone columns, same placement rules as the
      * business conjunct. */
    processingDate: Option[String] = None)

final case class GraftModel(
    classes: Map[String, GraftClass],
    enums: Map[String, GraftEnum],
    mappings: Map[String, GraftMapping],
    services: Map[String, GraftService],
    associations: Map[String, GraftAssociation] = Map.empty,
    joins: Map[String, GraftJoinDef] = Map.empty,
    /** Business milestoning declared by relational stores: table name →
      * (fromCol, thruCol). A row of a milestoned table is valid for
      * business dates `from <= d AND d < thru` (thru exclusive — the
      * Legend default; `thruIsInclusive` rejects at load). Queries touch
      * such tables only through `.all(date)` ([[GraftService.businessDate]]);
      * ServiceGen rejects a date-less read of a milestoned table. */
    milestoning: Map[String, (String, String)] = Map.empty,
    /** Processing milestoning declared by relational stores: table name →
      * (inCol, outCol). A row is visible to the warehouse for processing
      * dates `in <= d AND d < out` (out exclusive; `outIsInclusive`
      * rejects at load). A table declaring BOTH maps is bitemporal and
      * must be read with the two-date `.all(pd, bd)`. */
    processingMilestoning: Map[String, (String, String)] = Map.empty) {

  def clazz(name: String): GraftClass =
    classes.getOrElse(name, throw new IllegalArgumentException(s"unknown class [$name]"))
  def enum(name: String): GraftEnum =
    enums.getOrElse(name, throw new IllegalArgumentException(s"unknown enumeration [$name]"))
  def mapping(name: String): GraftMapping =
    mappings.getOrElse(name, throw new IllegalArgumentException(s"unknown mapping [$name]"))
  def service(name: String): GraftService =
    services.getOrElse(name, throw new IllegalArgumentException(s"unknown service [$name]"))

  /** All properties of a class, inherited first (reference resolves
    * superTypes the same way, Legend.scala:433-437). */
  def allProperties(className: String): Seq[GraftProperty] = {
    val c = clazz(className)
    c.superTypes.flatMap(allProperties) ++ c.properties
  }

  /** All constraints of a class including inherited ones. */
  def allConstraints(className: String): Seq[GraftConstraint] = {
    val c = clazz(className)
    c.superTypes.flatMap(allConstraints) ++ c.constraints
  }

  /** All derivations of a class including inherited ones. */
  def allDerivations(className: String): Seq[GraftDerivation] = {
    val c = clazz(className)
    c.superTypes.flatMap(allDerivations) ++ c.derivations
  }

  /** Entity-space name → table-space SQL for a mapping: every mapped
    * field to its column (through the enum-translating CASE where the
    * mapping defines one) and every derivation INLINED as its compiled
    * expression — so constraints over derived properties (e.g. the
    * reference corpus's `[hiringAge] should be > 18`) compile to SQL
    * that resolves on the raw table, exactly as the Legend engine
    * inlines qualified properties (LegendEntityTest.scala:203-227).
    * Derivations compile in declaration order (inherited first), so a
    * later one may reference an earlier one; a redeclared name (a
    * subclass repeating a superclass derivation) keeps the last
    * definition. */
  def tableSubstitutions(mappingName: String): Map[String, String] = {
    val m = mapping(mappingName)
    val fieldSubs: Map[String, String] =
      m.fields.map { case (field, col) => field -> m.enumExpr(field).getOrElse(col) }
    // EMBEDDED heads: every dotted prefix rebuilds its entity shape as a
    // struct(...) of its (recursively resolved) leaves, so expressions
    // over the whole embedded value — including the generated mandatory
    // rule — compile. A MANDATORY embedded value is never NULL (the
    // nested value always exists on the row — Legend's embedded
    // semantics); an OPTIONAL ([0..1]) one reads back as SQL NULL when
    // every one of its leaf columns is NULL — the only representation
    // of absence a flattened table has — so `parent IS NULL` guards and
    // governed reads behave correctly for absent values.
    def structExpr(p: GraftProperty, prefix: String): String = {
      val body = allProperties(p.dataType).map { np =>
        val path = s"$prefix.${np.name}"
        val sql = m.fields.get(path).map(c => m.enumExpr(path).getOrElse(c))
          .getOrElse(classes.get(np.dataType) match {
            case Some(_) if m.fields.keys.exists(_.startsWith(path + ".")) =>
              structExpr(np, path)
            case _ => throw new IllegalArgumentException(
              s"mapping [${m.name}] has no column for field [$path]")
          })
        s"$sql AS ${np.name}"
      }.mkString("struct(", ", ", ")")
      if (p.multiplicity.isNullable) {
        val leaves = m.fields.collect {
          case (path, c) if path.startsWith(prefix + ".") => c
        }
        s"(CASE WHEN ${leaves.map(c => s"$c IS NULL").mkString(" AND ")} THEN NULL ELSE $body END)"
      } else body
    }
    val embeddedHeads: Map[String, String] = m.fields.keys
      .filter(_.contains("."))
      .flatMap { k =>
        val parts = k.split('.')
        (1 until parts.length).map(i => parts.take(i).mkString("."))
      }.toSet[String]
      // an OTHERWISE-routed head can't rebuild its full entity struct
      // from inline columns (embedded coverage is intentionally partial):
      // its inline leaves still substitute by dotted key; everything else
      // resolves through the otherwise join (service navigation)
      .filterNot(pre => m.otherwiseJoins.contains(pre.split('.').head))
      .map(pre => pre -> structExpr(propertyAtPath(m.entity, pre), pre))
      .toMap
    allDerivations(m.entity).foldLeft(fieldSubs ++ embeddedHeads) { (acc, d) =>
      acc + (d.name -> SqlRewrite.substitute(d.expr, acc))
    }
  }

  /** The property reached by walking dotted segments from `className`. */
  private def propertyAtPath(className: String, path: String): GraftProperty = {
    val segs = path.split('.')
    var cn = className
    var prop: GraftProperty = null
    for (seg <- segs) {
      prop = allProperties(cn).find(_.name == seg).getOrElse(
        throw new IllegalArgumentException(s"class [$cn] has no property [$seg]"))
      cn = prop.dataType
    }
    prop
  }

  /** Every addressable name in the model (reference: getEntityNames,
    * Legend.scala:191 — classes, enums, mappings, services). */
  def entityNames: Set[String] =
    classes.keySet ++ enums.keySet ++ mappings.keySet ++ services.keySet

  /** Every association property navigable as `prop` from `fromClass`.
    * More than one candidate is an AMBIGUITY the caller must reject —
    * picking one from unordered map iteration would compile the same
    * service against different tables across JVMs. */
  def navigations(fromClass: String, prop: String): Seq[GraftProperty] =
    associations.values.flatMap(_.navigation(fromClass, prop)).toSeq

  /** The class reached by navigating association property `prop` from
    * `fromClass`, if UNAMBIGUOUSLY defined (loud on two candidates). */
  def navigationTarget(fromClass: String, prop: String): Option[String] = {
    val hits = navigations(fromClass, prop).map(_.dataType).distinct
    require(hits.size <= 1,
      s"association property [$prop] from [$fromClass] is ambiguous: " +
        s"defined by multiple associations targeting ${hits.mkString(", ")}")
    hits.headOption
  }

  def merge(other: GraftModel): GraftModel = GraftModel(
    classes ++ other.classes, enums ++ other.enums,
    mappings ++ other.mappings, services ++ other.services,
    associations ++ other.associations, joins ++ other.joins,
    milestoning ++ other.milestoning,
    processingMilestoning ++ other.processingMilestoning)

  /** Exact name first, then the same unambiguous bare-name fallback
    * [[GraftJoinDef.orient]] uses (a mapping's mainTable is often
    * unqualified while the store writes schema-qualified names). */
  private def msLookup(m: Map[String, (String, String)], table: String,
                       kind: String): Option[(String, String)] =
    m.get(table).orElse {
      def bare(t: String) = t.split('.').last
      val hits = m.collect {
        case (t, cols) if bare(t) == bare(table) => (t, cols)
      }
      require(hits.size <= 1,
        s"table [$table]: $kind milestoning is declared for multiple tables " +
          s"matching its bare name (${hits.keys.mkString(", ")}) — qualify the table")
      hits.headOption.map(_._2)
    }

  /** The business-milestoning columns declared by a store for `table`. */
  def milestoningOf(table: String): Option[(String, String)] =
    msLookup(milestoning, table, "business")

  /** The processing-milestoning columns declared by a store for `table`. */
  def processingMilestoningOf(table: String): Option[(String, String)] =
    msLookup(processingMilestoning, table, "processing")
}

object GraftModel {
  val empty: GraftModel = GraftModel(Map.empty, Map.empty, Map.empty, Map.empty)
}

/** JSON loader (M1). Parses the graft model format with Jackson's tree
  * API (jackson-databind ships on Spark's classpath). Loadable from a
  * filesystem path or a classpath resource — mirroring the reference's
  * LegendFileLoader / LegendClasspathLoader pair. */
object ModelLoader {

  private val mapper = new ObjectMapper()

  def fromFile(path: String): GraftModel =
    fromJson(Files.readString(Paths.get(path)))

  /** Load and merge every .json model file under a directory (reference:
    * LegendFileLoader.loadResources over an entity directory). */
  def fromDirectory(dir: String): GraftModel = {
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
    require(files.nonEmpty, s"no .json model files under [$dir]")
    files.map(p => fromJson(Files.readString(p))).reduce(_ merge _)
  }

  def fromResource(resource: String): GraftModel = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"classpath resource not found: $resource")
    try fromJson(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  def fromJson(json: String): GraftModel = {
    val root = mapper.readTree(json)
    val classes = arr(root, "classes").map(parseClass).map(c => c.name -> c).toMap
    val enums = arr(root, "enums").map(parseEnum).map(e => e.name -> e).toMap
    val mappings = arr(root, "mappings").map(parseMapping).map(m => m.name -> m).toMap
    val services = arr(root, "services").map(parseService).map(s => s.name -> s).toMap
    GraftModel(classes, enums, mappings, services)
  }

  private def arr(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def str(n: JsonNode, field: String): String = {
    val v = n.get(field)
    require(v != null && v.isTextual, s"missing/invalid string field [$field] in ${n.toString.take(120)}")
    v.asText()
  }

  private def optStr(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(_.isTextual).map(_.asText())

  private def strSeq(n: JsonNode, field: String): Seq[String] =
    arr(n, field).map(_.asText())

  private def parseClass(n: JsonNode): GraftClass = GraftClass(
    name = str(n, "name"),
    superTypes = strSeq(n, "superTypes"),
    properties = arr(n, "properties").map { p =>
      GraftProperty(
        name = str(p, "name"),
        dataType = str(p, "type"),
        multiplicity = optStr(p, "multiplicity").map(Multiplicity.parse).getOrElse(Multiplicity.One),
        doc = optStr(p, "doc"))
    },
    constraints = arr(n, "constraints").map(c => GraftConstraint(str(c, "name"), str(c, "expr"))),
    derivations = arr(n, "derivations").map(d => GraftDerivation(str(d, "name"), str(d, "expr"))),
    doc = optStr(n, "doc"))

  private def parseEnum(n: JsonNode): GraftEnum =
    GraftEnum(str(n, "name"), strSeq(n, "values"), optStr(n, "doc"))

  private def parseMapping(n: JsonNode): GraftMapping = {
    val fieldsNode = n.get("fields")
    require(fieldsNode != null && fieldsNode.isObject, s"mapping requires a fields object")
    val fields = fieldsNode.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    // optional enum translations: {"field": [{"source": "S", "value": "Scala"}]}
    val enumFields = Option(n.get("enumFields")).map { ef =>
      ef.properties().asScala.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(p =>
          str(p, "source") -> str(p, "value")).toSeq
      }.toMap
    }.getOrElse(Map.empty[String, Seq[(String, String)]])
    GraftMapping(str(n, "name"), str(n, "entity"), str(n, "table"), fields, enumFields)
  }

  private def parseService(n: JsonNode): GraftService = GraftService(
    name = str(n, "name"),
    mapping = str(n, "mapping"),
    select = arr(n, "select").map(s => str(s, "alias") -> str(s, "expr")),
    where = optStr(n, "where"),
    groupBy = strSeq(n, "groupBy"),
    orderBy = strSeq(n, "orderBy"),
    limit = Option(n.get("limit")).filter(_.isInt).map(_.asInt()),
    doc = optStr(n, "doc"))
}
