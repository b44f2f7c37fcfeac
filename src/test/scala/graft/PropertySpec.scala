package graft

import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the algorithmic cores that the
  * example-based specs can't sweep: sketch guarantees (pigeonhole
  * banding), portable-hash mixing, the PURE translator's parseability
  * contract, and multiplicity parsing. Pure JVM properties — no Spark
  * session, so the sweep is cheap (100 cases each).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, name: String, cases: Int = 100): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("SimHash banding: hamming(a,b) < numBands implies a shared band (pigeonhole)") {
    val bits = 60; val numBands = 4; val bandBits = bits / numBands
    val mask = (1L << bandBits) - 1
    def bands(sig: Long): Seq[Long] =
      (0 until numBands).map(b => (sig >>> (b * bandBits)) & mask)
    val gen = for {
      a <- Gen.choose(0L, (1L << bits) - 1)
      nFlips <- Gen.choose(0, numBands - 1) // hamming < numBands
      flips <- Gen.pick(nFlips, 0 until bits)
    } yield (a, flips.foldLeft(a)((v, i) => v ^ (1L << i)))
    check(Prop.forAll(gen) { case (a, b) =>
      bands(a).zip(bands(b)).exists { case (x, y) => x == y }
    }, "simhash banding")
  }

  test("MinHash affine mixes are distinct, in-range, and overflow-free") {
    import graft.dedup.Dedup.{mixA, mixB, MinhashPrime}
    check(Prop.forAll(Gen.choose(0, 255)) { i =>
      val (a, b) = (mixA(i), mixB(i))
      a >= 0 && a < MinhashPrime && b >= 0 && b < MinhashPrime &&
        // largest possible product stays under 2^63 (exact in any engine)
        a * (MinhashPrime - 1) + b > 0
    }, "mix range")
    val pairs = (0 until 64).map(i => (graft.dedup.Dedup.mixA(i), graft.dedup.Dedup.mixB(i)))
    assert(pairs.distinct.size == pairs.size, "mix collision within 64 hash functions")
  }

  test("bottom-k fingerprint is stable under shingle reordering and duplication") {
    val gen = for {
      base <- Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
      dups <- Gen.someOf(base)
      shuffled <- Gen.const(scala.util.Random.shuffle(base ++ dups))
    } yield (base, shuffled)
    def fp(xs: Seq[String]): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      xs.distinct.map(h).sorted.take(4)
    }
    check(Prop.forAll(gen) { case (base, shuffled) =>
      fp(base) == fp(shuffled)
    }, "fingerprint stability")
  }

  test("PureToSql output always parses as a Spark SQL expression") {
    import graft.model.legend.PureExpr._
    import graft.model.legend.PureToSql
    val leafGen: Gen[graft.model.legend.PureExpr] = Gen.oneOf(
      Gen.identifier.map(n => PProperty(PVar("this"), n)),
      Gen.choose(-1000, 1000).map(i => PLit(i.toString)),
      Gen.choose(-10.0, 10.0).map(d => PLit(d.toString)),
      Gen.alphaStr.map(s => PLit(quote(s))))
    def exprGen(depth: Int): Gen[graft.model.legend.PureExpr] =
      if (depth == 0) leafGen
      else Gen.frequency(
        2 -> leafGen,
        1 -> (for {
          f <- Gen.oneOf("greaterThan", "lessThan", "equal", "plus", "minus", "times")
          a <- exprGen(depth - 1); b <- exprGen(depth - 1)
        } yield PFunc(f, Seq(a, b))),
        1 -> (for {
          f <- Gen.oneOf("and", "or")
          a <- exprGen(depth - 1); b <- exprGen(depth - 1)
        } yield PFunc(f, Seq(a, b))),
        1 -> exprGen(depth - 1).map(e => PFunc("not", Seq(e))),
        1 -> exprGen(depth - 1).map(e => PFunc("isEmpty", Seq(e))),
        1 -> (for {
          f <- Gen.oneOf("startsWith", "endsWith", "contains")
          a <- exprGen(depth - 1); s <- Gen.alphaStr
        } yield PFunc(f, Seq(a, PLit(quote(s))))))
    check(Prop.forAll(exprGen(3)) { e =>
      CatalystSqlParser.parseExpression(PureToSql.scalar(e, Set("this")))
      true
    }, "PureToSql parseability")
  }

  test("PureRender∘PureParser identity over random ASTs (parse(render(e)) == e)") {
    // Sweeps the renderer's precedence/escaping decisions far past the
    // corpus: random nesting of infix levels (incl. the NON-associative
    // comparison level), unary minus/not vs binary, != sugar, arrow and
    // prefix calls, lambdas in argument position, collections, enum
    // refs, and string literals with quotes/backslashes/control chars.
    // Out of dialect by design (not generated): nary-collection infix
    // forms (plus([a,b,c]) — the wire format's shape, re-parses as the
    // equivalent left fold), zero-arg lambdas in expression position,
    // and raw-SQL PLit passthrough.
    import graft.model.legend.PureExpr._
    import graft.model.legend.{PureParser, PureRender}
    val enums = Set("test::model::Color", "DurationUnit")
    val nameGen = Gen.oneOf("amount", "name", "score", "tag", "flag")
    val leafGen: Gen[graft.model.legend.PureExpr] = Gen.oneOf(
      nameGen.map(n => PProperty(PVar("this"), n)),
      nameGen.map(n => PProperty(PVar("x"), n)),
      Gen.choose(0, 9999).map(i => PLit(i.toString)),
      Gen.choose(0, 999).flatMap(a => Gen.choose(0, 99).map(b => PLit(s"$a.$b"))),
      Gen.oneOf(PLit("TRUE"), PLit("FALSE")),
      Gen.oneOf("RED", "GREEN").map(v => PEnum("test::model::Color", v)),
      Gen.oneOf("YEARS", "DAYS").map(v => PEnum("DurationUnit", v)),
      Gen.const(PLit("DATE '2024-01-31'")),
      Gen.const(PLit("TIMESTAMP '2024-01-31 10:30:00'")),
      // strings that stress every escape path in lit()/string()
      Gen.listOf(Gen.oneOf('a', 'b', '\'', '\\', '\n', '\t', ' ', 'z'))
        .map(cs => PLit(quote(cs.mkString))))
    def exprGen(depth: Int): Gen[graft.model.legend.PureExpr] =
      if (depth == 0) leafGen
      else Gen.frequency(
        3 -> leafGen,
        2 -> (for {
          f <- Gen.oneOf("plus", "minus", "times", "divide", "and", "or",
            "equal", "greaterThan", "greaterThanEqual", "lessThan", "lessThanEqual")
          a <- exprGen(depth - 1); b <- exprGen(depth - 1)
        } yield PFunc(f, Seq(a, b))),
        1 -> exprGen(depth - 1).map(e => PFunc("not", Seq(e))),
        1 -> (for { a <- exprGen(depth - 1); b <- exprGen(depth - 1) }
          yield PFunc("not", Seq(PFunc("equal", Seq(a, b))))), // != sugar
        1 -> exprGen(depth - 1).map(e => PFunc("minus", Seq(e))), // unary -
        1 -> (for {
          f <- Gen.oneOf("substring", "startsWith", "contains", "dateDiff")
          r <- exprGen(depth - 1); a <- exprGen(depth - 1)
        } yield PFunc(f, Seq(r, a))),
        1 -> (for { r <- exprGen(depth - 1) }
          yield PFunc("isEmpty", Seq(r))),
        1 -> (for { r <- exprGen(depth - 1); vs <- Gen.listOfN(2, leafGen) }
          yield PFunc("in", Seq(r, PCollection(vs)))),
        1 -> (for { // lambda in argument position (HOF shape)
          r <- exprGen(depth - 1); p <- Gen.oneOf("y", "e")
          b <- exprGen(depth - 1)
        } yield PFunc("exists", Seq(r, PLambda(Seq(p), b)))),
        1 -> Gen.const(PFunc("today", Nil)))
    check(Prop.forAll(exprGen(4)) { e =>
      val text = PureRender.render(e)
      val back = PureParser.parse(text, enums)
      if (back != e) println(s"RENDER MISMATCH\n  ast: $e\n  text: $text\n  back: $back")
      back == e
    }, "parse-render identity", 3000)
  }

  test("native Shingles == sliding-window reference (and fused distinct == .distinct)") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val token = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const("the"))
    val gen = for {
      toks <- Gen.listOf(token)
      k <- Gen.choose(1, 5)
    } yield (toks, k)
    def run(toks: Seq[String], k: Int, distinct: Boolean): Seq[String] = {
      val in: ArrayData = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val out = graft.text.TextOps.shingles(in, k, distinct)
      (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
    }
    check(Prop.forAll(gen) { case (toks, k) =>
      val reference =
        if (toks.size < k) Seq.empty[String]
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      run(toks, k, distinct = false) == reference &&
        run(toks, k, distinct = true) == reference.distinct
    }, "native shingles semantics")
  }

  test("binned range-join cell math: a point is in an interval iff they share the point's cell") {
    // the correctness core of RangeJoin.pointInInterval: for any bin
    // width, a contained point's cell ALWAYS appears in the interval's
    // exploded cell range (no false negatives); the residual filter
    // removes false positives, so containment alone decides membership
    val gen = for {
      pt <- Gen.choose(-1000000L, 1000000L)
      lo <- Gen.choose(-1000000L, 1000000L)
      len <- Gen.choose(0L, 500000L)
      bin <- Gen.choose(1L, 100000L)
    } yield (pt, lo, lo + len, bin)
    // RangeJoin's SQL formula `(x - pmod(x, d)) div d` in pure Scala:
    // pmod is the always-non-negative remainder, div truncates
    def sqlFloorDiv(x: Long, d: Long): Long = {
      val p = ((x % d) + d) % d
      (x - p) / d
    }
    check(Prop.forAll(gen) { case (pt, lo, hi, bin) =>
      // the SQL formula IS floor division (negatives included)
      sqlFloorDiv(pt, bin) == Math.floorDiv(pt, bin) &&
        sqlFloorDiv(lo, bin) == Math.floorDiv(lo, bin) && {
          // and a contained point's cell is always in the interval's
          // exploded range — no false negatives for any bin width
          val inInterval = pt >= lo && pt <= hi
          val cellCovered = sqlFloorDiv(pt, bin) >= sqlFloorDiv(lo, bin) &&
            sqlFloorDiv(pt, bin) <= sqlFloorDiv(hi, bin)
          !inInterval || cellCovered
        }
    }, "range-join cell coverage")
  }

  test("Multiplicity: parse/toString round-trips") {
    import graft.model.Multiplicity
    val gen = for {
      lo <- Gen.choose(0, 5)
      hi <- Gen.option(Gen.choose(0, 9).map(lo + _))
    } yield Multiplicity(lo, hi)
    check(Prop.forAll(gen) { m =>
      Multiplicity.parse(m.toString) == m
    }, "multiplicity round trip")
  }

  test("DAU interval decomposition: cumulative deltas equal brute-force window membership") {
    import graft.streaming.Streaming.{dauDeltas, DauWindowDays}
    val gen = Gen.nonEmptyListOf(Gen.choose(0, 60)).map(_.distinct.sorted)
    check(Prop.forAll(gen, Gen.choose(-5, 70)) { (days, probe) =>
      val deltas = dauDeltas(days)
      val cum = deltas.filter(_._1 <= probe).values.sum
      val member = days.exists(a => a <= probe && a > probe - DauWindowDays)
      cum == (if (member) 1L else 0L)
    }, "dau decomposition vs membership")
  }

  test("DAU intervals are disjoint, sorted, and start at every active day") {
    import graft.streaming.Streaming.dauIntervals
    val gen = Gen.nonEmptyListOf(Gen.choose(0, 60)).map(_.distinct.sorted)
    check(Prop.forAll(gen) { days =>
      val iv = dauIntervals(days)
      iv.map(_._1) == days &&                        // one interval per active day
        iv.forall { case (s, e) => s <= e } &&       // non-empty
        iv.sliding(2).forall {                       // disjoint and ordered
          case List((_, e1), (s2, _)) => s2 > e1
          case _ => true
        }
    }, "dau interval shape")
  }

  test("ST14 correction algebra: per-batch diffs telescope to the final decomposition under any split") {
    import graft.streaming.Streaming.dauDeltas
    val gen = for {
      days <- Gen.nonEmptyListOf(Gen.choose(0, 60)).map(_.distinct)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue) // Gen-derived: failures replay from the ScalaCheck seed
      cuts <- Gen.listOfN(2, Gen.choose(0, days.size))
    } yield (new scala.util.Random(seed).shuffle(days), cuts.sorted)
    check(Prop.forAll(gen) { case (days, Seq(c1, c2)) =>
      val batches = Seq(days.take(c1), days.slice(c1, c2), days.drop(c2))
      val (_, corrections) = batches.foldLeft((List.empty[Int], Map.empty[Int, Long])) {
        case ((seen, acc), b) =>
          val merged = (seen ++ b).distinct.sorted
          // the PRODUCTION diff (Streaming.diffCounts), not a re-implementation
          val diff = graft.streaming.Streaming.diffCounts(dauDeltas(seen), dauDeltas(merged))
          (merged, (acc.keySet ++ diff.keySet).map(d =>
            d -> (acc.getOrElse(d, 0L) + diff.getOrElse(d, 0L))).toMap)
      }
      val fin = dauDeltas(days.distinct.sorted)
      corrections.filter(_._2 != 0L) == fin.filter(_._2 != 0L)
    }, "st14 telescoping")
  }

  test("funnel state fold is arrival-order invariant (conditional min commutes)") {
    val stages = Seq("signup", "view", "click", "purchase")
    val gen = for {
      n <- Gen.choose(1, 12)
      evs <- Gen.listOfN(n, Gen.zip(Gen.oneOf(stages :+ "error"), Gen.choose(0L, 1000L)))
    } yield evs
    val M = Long.MaxValue
    def fold(evs: Seq[(String, Long)]): (Long, Long, Long, Long) =
      evs.foldLeft((M, M, M, M)) { case ((t1, t2, t3, t4), (tp, us)) =>
        tp match {
          case "signup"   => (math.min(t1, us), t2, t3, t4)
          case "view"     => (t1, math.min(t2, us), t3, t4)
          case "click"    => (t1, t2, math.min(t3, us), t4)
          case "purchase" => (t1, t2, t3, math.min(t4, us))
          case _          => (t1, t2, t3, t4)
        }
      }
    check(Prop.forAll(gen, Gen.choose(Long.MinValue, Long.MaxValue)) { (evs, seed) =>
      fold(evs) == fold(new scala.util.Random(seed).shuffle(evs))
    }, "funnel fold commutes")
  }

  test("retention cells: one per active week, offsets from the min week, telescoping under any split") {
    import graft.streaming.Streaming.retentionCells
    val gen = Gen.nonEmptyListOf(Gen.choose(0, 520)).map(_.distinct.map(_ * 7))
    check(Prop.forAll(gen) { weeks =>
      val cells = retentionCells(weeks)
      val cohort = weeks.min
      cells.size == weeks.size &&
        cells.keys.forall { case (c, o) => c == cohort && o >= 0 } &&
        cells.contains((cohort, 0)) && cells.values.forall(_ == 1L)
    }, "retention cell shape")
    // per-batch correction diffs telescope to the final cells under any
    // 2-cut arrival split (the ST15 invariant, pure form)
    val gen2 = for {
      weeks <- Gen.nonEmptyListOf(Gen.choose(0, 520)).map(_.distinct.map(_ * 7))
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
      cuts <- Gen.listOfN(2, Gen.choose(0, weeks.size))
    } yield (new scala.util.Random(seed).shuffle(weeks), cuts.sorted)
    check(Prop.forAll(gen2) { case (weeks, Seq(c1, c2)) =>
      val batches = Seq(weeks.take(c1), weeks.slice(c1, c2), weeks.drop(c2))
      val (_, acc) = batches.foldLeft((List.empty[Int], Map.empty[(Int, Int), Long])) {
        case ((seen, sums), b) =>
          val merged = (seen ++ b).distinct.sorted
          val diff = graft.streaming.Streaming.diffCounts(
            retentionCells(seen), retentionCells(merged))
          (merged, (sums.keySet ++ diff.keySet).map(k =>
            k -> (sums.getOrElse(k, 0L) + diff.getOrElse(k, 0L))).toMap)
      }
      acc.filter(_._2 != 0L) == retentionCells(weeks.distinct.sorted)
    }, "st15 telescoping")
  }

  test("PiiScrub kernel equals the java.util.regex chain on fragment-fuzzed strings") {
    // the byte-scan kernel claims exact java.util.regex leftmost-greedy
    // parity with the three-pattern chain; fuzz with strings assembled
    // from pattern FRAGMENTS so boundary shapes (partial prefixes,
    // adjacent matches, backtracking domains, multibyte) occur densely,
    // with scalacheck shrinking any counterexample to a minimal one
    import graft.text.{TextFunctions, TextOps}
    val compiled = TextFunctions.PiiPatterns.map { case (p, t) =>
      (java.util.regex.Pattern.compile(p), t) }
    def chain(s: String): String =
      compiled.foldLeft(s) { case (acc, (p, t)) =>
        p.matcher(acc).replaceAll(java.util.regex.Matcher.quoteReplacement(t)) }
    val atoms = Gen.oneOf("a", "b9", "1", "234567", " ", ".", "@", "http",
      "https", "://", "s", "-", "+", "(", ")", "%", "_", "é", "\t", "\n",
      "<EMAIL>", "x.y", "com", "co", "0800 5550", "..", "@@", "12 34 56 7")
    val gen = Gen.listOf(atoms).map(_.mkString)
    check(Prop.forAll(gen) { s =>
      TextOps.piiScrub(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString == chain(s)
    }, "pii scrub kernel ≡ regex chain", cases = 3000)
  }

  test("hash-bucket split is a partition: every key lands in exactly one split") {
    // mirrors Sampling.p1's bucket → split mapping
    def split(bucket: Long): String =
      if (bucket < 8) "train" else if (bucket < 9) "val" else "test"
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue)) { id =>
      val b = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(8).foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL)).abs % 10
      Set("train", "val", "test").contains(split(b))
    }, "split partition")
  }
}
