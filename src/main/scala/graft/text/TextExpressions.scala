package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled membership-count kernel shared by [[CountInSet]]'s
  * interpreted and generated paths (the generated code calls this static,
  * keeping the janino method tiny regardless of the word-set size). */
object TextOps {

  /** Number of array elements present in `set` (duplicates counted; null
    * elements never match — same semantics as `filter(..., isin(...))`). */
  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Parse the restricted char-class subset [[CharClassCount]] supports —
    * `[...]` with optional leading `^`, literal chars, `a-z` ranges, and
    * the `\s` whitespace escape (Java regex `\s` = space \t \n \x0B \f \r).
    * Members must be BMP; returns (membership bitset, negated). */
  def parseCharClass(spec: String): (java.util.BitSet, Boolean) = {
    require(spec.length >= 2 && spec.head == '[' && spec.last == ']',
      s"unsupported char class [$spec]: expected [...]")
    var body = spec.substring(1, spec.length - 1)
    val negate = body.startsWith("^")
    if (negate) body = body.substring(1)
    require(body.nonEmpty, s"empty char class [$spec]")
    val bits = new java.util.BitSet(128)
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\') {
        require(i + 1 < body.length, s"dangling escape in [$spec]")
        // an escape used as a RANGE bound ([\t-z]) means the range in Java
        // regex; this parser would silently read three literals -- reject
        require(!(i + 3 < body.length && body.charAt(i + 2) == '-'),
          s"unsupported range with escaped lower bound in [$spec]")
        body.charAt(i + 1) match {
          case 's' => " \t\n\u000B\f\r".foreach(w => bits.set(w))
          case 't' => bits.set('\t')
          case 'n' => bits.set('\n')
          case 'r' => bits.set('\r')
          case '\\' => bits.set('\\')
          case ']' => bits.set(']')
          case '-' => bits.set('-')
          case e => throw new IllegalArgumentException(
            s"unsupported escape \\$e in char class [$spec]")
        }
        i += 2
      } else if (i + 2 < body.length && body.charAt(i + 1) == '-') {
        val hi = body.charAt(i + 2)
        require(hi != '\\',
          s"unsupported range with escaped upper bound in [$spec]")
        require(c <= hi, s"inverted range $c-$hi in [$spec]")
        bits.set(c, hi + 1)
        i += 3
      } else {
        bits.set(c)
        i += 1
      }
    }
    (bits, negate)
  }

  /** Count of code points in/not-in the class — the allocation-free
    * replacement for `length(x) - length(regexp_replace(x, cls, ''))`.
    * Counts CODE POINTS (like Spark's `length`): a supplementary char is
    * one unit, and since the parsable classes are BMP-only it is never a
    * member. Shared by [[CharClassCount]]'s interpreted/generated paths. */
  def countClass(s: UTF8String, bits: java.util.BitSet, negate: Boolean): Int = {
    val str = s.toString
    val n = str.length
    var i = 0
    var c = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      val in = cp <= 0xFFFF && bits.get(cp)
      if (in != negate) c += 1
      i += Character.charCount(cp)
    }
    c
  }

  /** Per-document term frequencies in one pass: token array → map of
    * term → count, first-occurrence key order. Null tokens count as the
    * empty string (the tokenizer never yields nulls). Shared by
    * [[TermCounts]]'s interpreted and generated paths. */
  def termCounts(arr: ArrayData): MapData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      val prev = m.get(t)
      m.put(t, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue.longValue()
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Whitespace-token COUNT with `size(split(trim(x), "\s+"))` semantics,
    * without building the token array: SQL trim strips SPACES only; an
    * empty trimmed string yields 1 (split returns [""]); a leading or
    * trailing whitespace run of chars SQL trim leaves (\t etc.) yields
    * one empty token (Spark's split uses limit -1, KEEPING trailing
    * empties — unlike Java's default). \s = Java's [ \t\n\x0B\f\r]. Shared by
    * [[TokenCount]]'s interpreted and generated paths. */
  def tokenCount(s: UTF8String): Int = {
    val str = s.toString
    var a = 0
    var b = str.length
    while (a < b && str.charAt(a) == ' ') a += 1
    while (b > a && str.charAt(b - 1) == ' ') b -= 1
    if (a == b) return 1
    // Spark's split uses limit -1: a leading OR trailing whitespace run
    // (of chars SQL trim leaves, e.g. \t) contributes one empty token
    var count = if (isWs(str.charAt(a))) 1 else 0
    if (isWs(str.charAt(b - 1))) count += 1
    var inRun = false
    var i = a
    while (i < b) {
      val w = isWs(str.charAt(i))
      if (!w && !inRun) { count += 1; inRun = true }
      else if (w) inRun = false
      i += 1
    }
    count
  }

  /** BPE-ish lexer token COUNT over LOWERED text — the number of matches
    * of `[a-z]+|[0-9]+|[^a-z0-9\s]` without materializing them: maximal
    * letter runs + maximal digit runs + one per other non-whitespace
    * code point. Input must already be lowercased (the call site wraps
    * `lower()`): special Unicode lowercasings (e.g. U+0130 -> i + combining
    * dot) change the code-point sequence, so the kernel cannot fold the
    * lowering itself. Shared by [[LexerTokenCount]]'s paths. */
  def lexerTokenCount(s: UTF8String): Int = {
    val str = s.toString
    val n = str.length
    var i = 0
    var count = 0
    var prev = 0 // 0 ws, 1 letter-run, 2 digit-run, 3 single
    while (i < n) {
      val cp = str.codePointAt(i)
      val cat =
        if (cp >= 'a' && cp <= 'z') 1
        else if (cp >= '0' && cp <= '9') 2
        else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
                 cp == '\f' || cp == '\r') 0
        else 3
      if ((cat == 1 && prev != 1) || (cat == 2 && prev != 2) || cat == 3) count += 1
      prev = cat
      i += Character.charCount(cp)
    }
    count
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Compiled BPE merge table shared by [[BpeTokenCount]]'s interpreted
    * and generated paths. Built once per plan (addReferenceObj) from the
    * ordered merge list a tokenizer ships; at cluster scale the Seq
    * rides the serialized plan to every executor — the same "bounded
    * build side broadcasts" contract as CountInSet's word set.
    *
    * The constructor REQUIRES rank monotonicity (every multi-codepoint
    * side of merge j must be the product of some merge i < j, and
    * merged strings are unique). Learned BPE vocabs satisfy this by
    * construction; the property is what makes "merge all disjoint
    * leftmost occurrences of the min-rank pair, repeat" (this kernel,
    * the reference BPE apply loop) equivalent to "merge the single
    * leftmost occurrence of the min-rank pair, repeat" (the
    * one-step-per-iteration recursive-CTE oracle): while any occurrence
    * of the min-rank pair remains, every newly formed pair contains a
    * later-ranked symbol and therefore cannot preempt it. */
  final class BpeMerges(val merges: Seq[(String, String)]) extends Serializable {
    { // validate monotonicity at construction, loudly
      val produced = scala.collection.mutable.Map[String, Int]()
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        Seq(l, r).foreach { s =>
          if (s.codePointCount(0, s.length) > 1) {
            val p = produced.getOrElse(s, throw new IllegalArgumentException(
              s"BPE merge $i ($l,$r): side '$s' is not produced by any earlier merge"))
            require(p < i, s"BPE merge $i ($l,$r): side '$s' produced at later rank $p")
          }
        }
        val m = l + r
        require(!produced.contains(m), s"BPE merge $i: duplicate merged symbol '$m'")
        produced(m) = i
      }
    }
    @transient private lazy val rankMap: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + " " + r, i) }
      m
    }
    @transient private lazy val mergedArr: Array[String] =
      merges.map { case (l, r) => l + r }.toArray
    @transient private lazy val leftArr: Array[String] = merges.map(_._1).toArray
    @transient private lazy val rightArr: Array[String] = merges.map(_._2).toArray

    def rankOf(l: String, r: String): Int = {
      val v = rankMap.get(l + " " + r)
      if (v == null) Int.MaxValue else v.intValue()
    }
    def left(rank: Int): String = leftArr(rank)
    def right(rank: Int): String = rightArr(rank)
    def merged(rank: Int): String = mergedArr(rank)
  }

  /** Greedy BPE merge count for one word occupying `str[start, end)`:
    * symbols start as code points; repeatedly merge ALL disjoint
    * leftmost occurrences of the lowest-ranked adjacent pair until no
    * pair is in the table; returns the surviving symbol count. */
  private def bpeWordCount(str: String, start: Int, end: Int, m: BpeMerges): Int = {
    var nsym = 0
    var i = start
    while (i < end) { nsym += 1; i += Character.charCount(str.codePointAt(i)) }
    if (nsym < 2) return nsym
    val arr = new Array[String](nsym)
    i = start
    var j = 0
    while (i < end) {
      val w = Character.charCount(str.codePointAt(i))
      arr(j) = str.substring(i, i + w)
      i += w
      j += 1
    }
    var len = nsym
    while (len >= 2) {
      var best = Int.MaxValue
      var k = 0
      while (k < len - 1) {
        val r = m.rankOf(arr(k), arr(k + 1))
        if (r < best) best = r
        k += 1
      }
      if (best == Int.MaxValue) return len
      val l = m.left(best); val r = m.right(best); val mg = m.merged(best)
      var w = 0
      k = 0
      while (k < len) {
        if (k < len - 1 && arr(k) == l && arr(k + 1) == r) { arr(w) = mg; k += 2 }
        else { arr(w) = arr(k); k += 1 }
        w += 1
      }
      len = w
    }
    len
  }

  /** Document-level BPE token COUNT: whitespace-delimited words (same \s
    * set as [[tokenCount]]; empty words contribute 0), each reduced by
    * greedy lowest-rank-first merges, no token array ever materialized.
    * Shared by [[BpeTokenCount]]'s interpreted and generated paths. */
  def bpeTokenCount(s: UTF8String, m: BpeMerges): Int = {
    val str = s.toString
    val n = str.length
    var total = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(str.charAt(i))) i += 1
      if (i > start) total += bpeWordCount(str, start, i, m)
    }
    total
  }

  private val Space = UTF8String.fromString(" ")

  /** Word k-grams of a token array, space-joined, in position order;
    * `distinct` keeps each shingle's first occurrence only. Null tokens
    * contribute empty strings (the tokenizer never yields nulls).
    * Shared by [[Shingles]]'s interpreted and generated paths. */
  def shingles(toks: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](n - k + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String](2 * (n - k + 1)) else null
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        parts(j) = if (toks.isNullAt(i + j)) UTF8String.EMPTY_UTF8
                   else toks.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(Space, parts: _*)
      if (!distinct || seen.add(s)) out.add(s)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Non-overlapping token windows of width `w`, space-joined, in
    * position order; the final window may be partial (passage dedup must
    * not silently drop tail text). Shared by [[TokenChunks]]'s
    * interpreted and generated paths. */
  def chunks(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef]((n + w - 1) / w)
    var i = 0
    while (i < n) {
      val end = math.min(i + w, n)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (toks.isNullAt(j)) UTF8String.EMPTY_UTF8
                       else toks.getUTF8String(j)
        j += 1
      }
      out.add(UTF8String.concatWs(Space, parts: _*))
      i += w
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Single-key top-level integer extraction from a JSON document —
    * `from_json(doc, struct<key:int>).key` without the Jackson parser or
    * its CodegenFallback wrapper. Shared by [[JsonGetInt]]'s interpreted
    * and generated paths. Semantics are pinned to `from_json` by
    * TextSpec's 60-case cross-check (probed empirically, Spark 4.1):
    *
    *   - structural JSON error anywhere in the ROOT OBJECT — bad token,
    *     leading-zero number, trailing comma, unterminated string, raw
    *     control char in a string, bad escape, root not an object —
    *     voids the whole row (null), EVEN IF the key already parsed;
    *   - content after the root object's closing `}` is never examined
    *     (`{"k":1} garbage` → 1), so the scan stops at depth-0 `}`;
    *   - a VALID token of the wrong type (string/bool/float/overflow) is
    *     a field-conversion failure: a NO-OP that keeps the previous
    *     occurrence's value (`{"k":1,"k":"x"}` → 1) and keeps parsing;
    *   - a JSON `null` value SETS the field to null (`{"k":1,"k":null}`
    *     → null); otherwise the last successfully-converted duplicate
    *     wins; keys decode escapes (`{"k":1}` matches "k").
    *
    * One divergence, documented: nesting beyond 1000 levels is malformed
    * here (Jackson's own StreamReadConstraints default), and invalid
    * UTF-8 byte sequences are not rejected (a Spark string column is
    * already valid UTF-8, so the case cannot arise from a real column).
    */
  def jsonGetInt(doc: UTF8String, key: UTF8String): java.lang.Integer =
    new JsonIntScan(doc.getBytes, key).run()

  // ---- PII scrub kernel (round 11) -------------------------------- //
  // Hand lexers replicating java.util.regex leftmost-greedy semantics
  // for EXACTLY the three TextFunctions.PiiPatterns, applied in the
  // same sequential order as the regexp_replace chain they replace.
  // Every character class involved is pure ASCII, so the scans run on
  // UTF-8 BYTES: continuation/lead bytes are negative as Byte and never
  // satisfy any class test, and match boundaries always fall on ASCII
  // bytes, so splices can never cut a multibyte sequence. The regex
  // chain itself stays in TextFunctions (piiScrubComposable) as the
  // pinned reference; TextSpec cross-checks the two on corpus text,
  // adversarial strings, and random fuzz.

  private val EmailTok = "<EMAIL>".getBytes("UTF-8")
  private val UrlTok = "<URL>".getBytes("UTF-8")
  private val NumberTok = "<NUMBER>".getBytes("UTF-8")

  @inline private def isAsciiLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def isAsciiDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  // [a-zA-Z0-9._%+-]
  @inline private def isLocalChar(b: Byte): Boolean =
    isAsciiLetter(b) || isAsciiDigit(b) ||
      b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  // [a-zA-Z0-9.-]
  @inline private def isDomainChar(b: Byte): Boolean =
    isAsciiLetter(b) || isAsciiDigit(b) || b == '.' || b == '-'
  // [0-9 ()+.-]
  @inline private def isNumberChar(b: Byte): Boolean =
    isAsciiDigit(b) || b == ' ' || b == '(' || b == ')' ||
      b == '+' || b == '.' || b == '-'
  // Java regex \s
  @inline private def isJavaWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** One pass of `[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}` →
    * `<EMAIL>`. A match is: the maximal local-char run immediately
    * before an '@' (the engine's first successful attempt is the run
    * start), a non-empty domain-char run, and — greedy domain+ giving
    * back — the LARGEST '.' position inside the run followed by ≥2
    * letters. A failed '@' cannot be rescued by a shorter local part
    * (the failure is domain-side), so the scan moves to the next '@'. */
  private def scrubEmails(in: Array[Byte]): Array[Byte] = {
    val n = in.length
    var out: java.io.ByteArrayOutputStream = null
    var last = 0
    var a = 0
    while (a < n) {
      if (in(a) == '@') {
        var s = a
        while (s > last && isLocalChar(in(s - 1))) s -= 1
        var e = a + 1
        while (e < n && isDomainChar(in(e))) e += 1
        var end = -1
        if (s < a && e > a + 1) {
          var j = e - 1
          while (end < 0 && j >= a + 2) {
            if (in(j) == '.') {
              var t = j + 1
              while (t < e && isAsciiLetter(in(t))) t += 1
              if (t - (j + 1) >= 2) end = t
            }
            j -= 1
          }
        }
        if (end >= 0) {
          if (out == null) out = new java.io.ByteArrayOutputStream(n)
          out.write(in, last, s - last)
          out.write(EmailTok, 0, EmailTok.length)
          last = end
          a = end
        } else a += 1
      } else a += 1
    }
    if (out == null) in
    else { out.write(in, last, n - last); out.toByteArray }
  }

  /** One pass of `https?://[^\s]+` → `<URL>`: literal prefix with the
    * optional-s backtrack, then the maximal non-whitespace run (≥1). */
  private def scrubUrls(in: Array[Byte]): Array[Byte] = {
    val n = in.length
    var out: java.io.ByteArrayOutputStream = null
    var last = 0
    var i = 0
    while (i < n) {
      var end = -1
      if (in(i) == 'h' && i + 6 < n && in(i + 1) == 't' && in(i + 2) == 't'
          && in(i + 3) == 'p') {
        // greedy s?: try with 's', fall back without
        var rest = -1
        if (i + 7 < n && in(i + 4) == 's' && in(i + 5) == ':' &&
            in(i + 6) == '/' && in(i + 7) == '/') rest = i + 8
        else if (in(i + 4) == ':' && in(i + 5) == '/' && in(i + 6) == '/')
          rest = i + 7
        if (rest >= 0 && rest < n && !isJavaWs(in(rest))) {
          var t = rest
          while (t < n && !isJavaWs(in(t))) t += 1
          end = t
        }
      }
      if (end >= 0) {
        if (out == null) out = new java.io.ByteArrayOutputStream(n)
        out.write(in, last, i - last)
        out.write(UrlTok, 0, UrlTok.length)
        last = end
        i = end
      } else i += 1
    }
    if (out == null) in
    else { out.write(in, last, n - last); out.toByteArray }
  }

  /** One pass of `[0-9][0-9 ()+.-]{8,}[0-9]` → `<NUMBER>`: starting
    * digit, maximal number-char run, and — greedy {8,} giving back —
    * the LARGEST digit position ≥ 9 chars past the start. A start that
    * fails dooms every later start inside the same run (its window is a
    * subset), so the scan jumps to the run end; a match resumes right
    * after its own end, inside the run, exactly like the engine. */
  private def scrubNumbers(in: Array[Byte]): Array[Byte] = {
    val n = in.length
    var out: java.io.ByteArrayOutputStream = null
    var last = 0
    var i = 0
    while (i < n) {
      if (isAsciiDigit(in(i))) {
        var e = i + 1
        while (e < n && isNumberChar(in(e))) e += 1
        var q = e - 1
        while (q >= i + 9 && !isAsciiDigit(in(q))) q -= 1
        if (q >= i + 9) {
          if (out == null) out = new java.io.ByteArrayOutputStream(n)
          out.write(in, last, i - last)
          out.write(NumberTok, 0, NumberTok.length)
          last = q + 1
          i = q + 1
        } else i = e
      } else i += 1
    }
    if (out == null) in
    else { out.write(in, last, n - last); out.toByteArray }
  }

  /** The full three-pass scrub (email → URL → number, the chain's
    * order). Returns the input object unchanged when nothing matched. */
  def piiScrub(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val a = scrubEmails(in)
    val b = scrubUrls(a)
    val c = scrubNumbers(b)
    if (c eq in) s else UTF8String.fromBytes(c)
  }
}

/** One-pass recursive-descent scanner behind [[TextOps.jsonGetInt]].
  * Validates full JSON grammar over the root object (so structural
  * errors null the row exactly where Jackson would), but materializes
  * nothing: no tree, no token objects — just an index walk over the
  * UTF-8 bytes. */
private final class JsonIntScan(b: Array[Byte], key: UTF8String) {
  private[this] var i = 0
  private[this] val n = b.length
  private[this] var depth = 0
  private[this] var result: java.lang.Integer = null

  def run(): java.lang.Integer =
    try { parseRoot(); result }
    catch { case JsonIntScan.Malformed => null }

  private def fail(): Nothing = throw JsonIntScan.Malformed
  private def isDigit(c: Byte): Boolean = c >= '0' && c <= '9'
  private def isHex(c: Byte): Boolean =
    isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def ws(): Unit =
    while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1

  private def expect(c: Char): Unit = {
    if (i >= n || b(i) != c.toByte) fail()
    i += 1
  }

  /** Root object: the only level where `key` can match; stops at its
    * closing `}` (trailing content is ignored, matching Jackson's
    * single-value read). */
  private def parseRoot(): Unit = {
    ws()
    expect('{')
    ws()
    if (i < n && b(i) == '}') return
    while (true) {
      ws()
      val matched = scanKey()
      ws(); expect(':'); ws()
      parseValue(matched)
      ws()
      if (i >= n) fail()
      if (b(i) == ',') i += 1
      else if (b(i) == '}') return
      else fail()
    }
  }

  /** Scan a member key and report whether it equals the target (raw
    * byte compare when escape-free; unescaped char compare otherwise). */
  private def scanKey(): Boolean = {
    expect('"')
    val start = i
    val esc = scanStringBody()
    val end = i - 1 // before the closing quote
    if (!esc) {
      if (end - start != key.numBytes) return false
      var j = 0
      while (j < key.numBytes) {
        if (b(start + j) != key.getByte(j)) return false
        j += 1
      }
      true
    } else unescape(start, end) == key.toString
  }

  /** From just after the opening quote to just after the closing quote;
    * returns whether any escape was seen. Validates escapes and rejects
    * raw control chars (Jackson does both). */
  private def scanStringBody(): Boolean = {
    var esc = false
    while (true) {
      if (i >= n) fail()
      val c = b(i)
      if (c == '"') { i += 1; return esc }
      else if (c == '\\') {
        esc = true
        i += 1
        if (i >= n) fail()
        b(i) match {
          case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 1
          case 'u' =>
            i += 1
            var j = 0
            while (j < 4) {
              if (i >= n || !isHex(b(i))) fail()
              i += 1; j += 1
            }
          case _ => fail()
        }
      } else if ((c & 0xFF) < 0x20) fail()
      else i += 1
    }
    false // unreachable
  }

  /** Escapes were validated by [[scanStringBody]], so this just applies
    * them (char-level, after UTF-8 decoding the raw span). */
  private def unescape(start: Int, end: Int): String = {
    val raw = UTF8String.fromBytes(b, start, end - start).toString
    val sb = new java.lang.StringBuilder(raw.length)
    var j = 0
    while (j < raw.length) {
      val c = raw.charAt(j)
      if (c == '\\') {
        raw.charAt(j + 1) match {
          case 'u' =>
            sb.append(Integer.parseInt(raw.substring(j + 2, j + 6), 16).toChar)
            j += 6
          case 'b' => sb.append('\b'); j += 2
          case 'f' => sb.append('\f'); j += 2
          case 'n' => sb.append('\n'); j += 2
          case 'r' => sb.append('\r'); j += 2
          case 't' => sb.append('\t'); j += 2
          case q => sb.append(q); j += 2 // " \ /
        }
      } else { sb.append(c); j += 1 }
    }
    sb.toString
  }

  /** `matched` = this is a top-level value of the target key. */
  private def parseValue(matched: Boolean): Unit = {
    if (i >= n) fail()
    b(i) match {
      case '"' =>
        i += 1; scanStringBody() // wrong type for the key → no-op
      case '{' => parseObject()
      case '[' => parseArray()
      case 't' => literal("true")
      case 'f' => literal("false")
      case 'n' =>
        literal("null")
        if (matched) result = null // JSON null SETS the field
      case c if c == '-' || isDigit(c) => parseNumber(matched)
      case _ => fail()
    }
  }

  private def literal(lit: String): Unit = {
    var j = 0
    while (j < lit.length) {
      if (i >= n || b(i) != lit.charAt(j).toByte) fail()
      i += 1; j += 1
    }
  }

  private def parseObject(): Unit = {
    depth += 1
    if (depth > JsonIntScan.MaxDepth) fail()
    i += 1 // '{'
    ws()
    if (i < n && b(i) == '}') { i += 1; depth -= 1; return }
    while (true) {
      ws()
      expect('"'); scanStringBody()
      ws(); expect(':'); ws()
      parseValue(matched = false)
      ws()
      if (i >= n) fail()
      if (b(i) == ',') i += 1
      else if (b(i) == '}') { i += 1; depth -= 1; return }
      else fail()
    }
  }

  private def parseArray(): Unit = {
    depth += 1
    if (depth > JsonIntScan.MaxDepth) fail()
    i += 1 // '['
    ws()
    if (i < n && b(i) == ']') { i += 1; depth -= 1; return }
    while (true) {
      ws()
      parseValue(matched = false)
      ws()
      if (i >= n) fail()
      if (b(i) == ',') i += 1
      else if (b(i) == ']') { i += 1; depth -= 1; return }
      else fail()
    }
  }

  /** JSON number grammar: `-? (0 | [1-9][0-9]*) frac? exp?`. A leading
    * zero (`01`) is a STRUCTURAL error (Jackson's tokenizer rejects it);
    * a well-formed float/overflow is a CONVERSION failure (no-op). */
  private def parseNumber(matched: Boolean): Unit = {
    val neg = b(i) == '-'
    if (neg) i += 1
    if (i >= n) fail()
    var v = 0L
    var overflow = false
    if (b(i) == '0') {
      i += 1
      if (i < n && isDigit(b(i))) fail()
    } else if (isDigit(b(i))) {
      while (i < n && isDigit(b(i))) {
        val d = b(i) - '0'
        if (v > (Long.MaxValue - d) / 10) overflow = true else v = v * 10 + d
        i += 1
      }
    } else fail()
    var isInt = true
    if (i < n && b(i) == '.') {
      isInt = false
      i += 1
      if (i >= n || !isDigit(b(i))) fail()
      while (i < n && isDigit(b(i))) i += 1
    }
    if (i < n && (b(i) == 'e' || b(i) == 'E')) {
      isInt = false
      i += 1
      if (i < n && (b(i) == '+' || b(i) == '-')) i += 1
      if (i >= n || !isDigit(b(i))) fail()
      while (i < n && isDigit(b(i))) i += 1
    }
    if (matched && isInt && !overflow) {
      val sv = if (neg) -v else v
      if (sv >= Int.MinValue && sv <= Int.MaxValue) result = Int.box(sv.toInt)
      // int wider than 32 bits: coercion failure → no-op
    }
    // matched float/overflow: coercion failure → no-op
  }
}

private object JsonIntScan {
  /** Jackson's StreamReadConstraints default nesting limit. */
  final val MaxDepth = 1000

  /** Stackless control-flow signal: any structural error aborts the
    * scan and yields null, wherever it happens. */
  object Malformed extends Exception with scala.util.control.NoStackTrace
}

/** Count of tokens in an `array<string>` column that belong to a fixed
  * word set — the stopword-hit primitive behind t2/t3.
  *
  * The composable alternative — `size(filter(toks, isin(words)))` — is a
  * higher-order function, and HOF lambdas are CodegenFallback in Spark:
  * interpreted per row, per element. t2 evaluates it once per document
  * and t3 four times per document, which made the interpreter, not the
  * data, the dominant cost of both queries (same failure class as the
  * pre-round-2 validator). This expression does one hash-set probe per
  * token inside whole-stage codegen: no lambda dispatch, no boxing.
  *
  * The word set rides along as a single plan constant (addReferenceObj),
  * so the generated projection stays a few lines regardless of set size.
  * Duplicates count (a stopword used twice is two hits) and null tokens
  * never match, exactly matching the HOF form and the DuckDB
  * `len(list_filter(w, x -> list_contains(...)))` oracle.
  */
/** Single-kernel PII scrub (round 11) — the three-pattern
  * `regexp_replace` chain of [[TextFunctions.PiiPatterns]] as three
  * hand-rolled linear byte scans ([[TextOps.piiScrub]]), inside
  * whole-stage codegen. Why native: the chain walks the full text
  * through three java.util.regex engines (plus their per-row matcher
  * state); the scans replicate the exact leftmost-greedy semantics with
  * plain byte arithmetic. Measured at sf1: t8 2.25 s → see BASELINE —
  * and c1/c2's scrub stage rides the same kernel. Semantics pinned by
  * TextSpec's kernel-vs-chain cross-check (corpus + adversarial +
  * fuzz) and the all-query differential sweep. */
case class PiiScrub(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_pii_scrub"

  override def nullSafeEval(v: Any): Any =
    TextOps.piiScrub(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.piiScrub($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CountInSet(child: Expression, words: Seq[String])
  extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${t.sql}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_count_in_set"

  override def nullSafeEval(v: Any): Any =
    TextOps.countIn(v.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.countIn($v, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word k-gram ("shingle") array from an `array<string>` token column —
  * the shingling primitive behind the MinHash/Jaccard/fingerprint/
  * contamination pipelines.
  *
  * Why native: the two composable forms both lose at scale. The HOF form
  * (`transform(sequence(...), i -> concat_ws(' ', slice(toks, i, k)))`)
  * is CodegenFallback — interpreted per row AND per element, the exact
  * failure class CountInSet fixed for membership counting. The window
  * form (posexplode → lead(tok, j) over (partition by id order by pos))
  * is codegen'd but buys its shingles with a full SHUFFLE + SORT of the
  * exploded token stream — at 100 TB that Exchange carries the entire
  * tokenized corpus and exists only to reassemble adjacency that the
  * source row already had. This expression emits the shingle array in
  * one pass inside whole-stage codegen: no lambda dispatch, no shuffle,
  * map-side only.
  *
  * `distinct = true` folds the downstream DISTINCT into the same pass
  * (first occurrence kept), which drops yet another Exchange from
  * consumers that only need the shingle SET (Jaccard, contamination).
  */
/** Fixed-width non-overlapping token chunks from an `array<string>`
  * token column — the passage grain behind d7's boilerplate removal.
  * Same native-kernel rationale as [[Shingles]] (the composable
  * `transform(sequence(...), ...)` form is CodegenFallback); stride ==
  * width distinguishes it from shingling, and the partial tail window is
  * kept so no text escapes the frequency count. */
case class TokenChunks(child: Expression, w: Int)
  extends UnaryExpression {

  require(w >= 1, s"chunk width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_token_chunks"

  override def nullSafeEval(v: Any): Any =
    TextOps.chunks(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.chunks($v, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Shingles(child: Expression, k: Int, distinct: Boolean)
  extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(v: Any): Any =
    TextOps.shingles(v.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.shingles($v, $k, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of code points matching a (restricted) regex character class —
  * the kernel behind `charRatio`.
  *
  * Why native: the composable form `length(x) - length(regexp_replace(x,
  * cls, ''))` materializes a STRIPPED COPY of every document through the
  * Java regex engine just to measure its length — profiled at 20× sf0.1
  * it was ~85% of c1's marginal cost (3.9 s of 4.6 s per pass). This is
  * one allocation-free code-point scan inside whole-stage codegen with
  * the membership bitset as a single plan constant. Supported class
  * syntax (parse-time-checked, loud otherwise): `[...]`, leading `^`,
  * literal chars, `a-z` ranges, `\s` and friends — exactly the subset
  * charRatio call sites use; semantics pinned to Java regex by
  * TextSpec's regexp_replace cross-check.
  */
case class CharClassCount(child: Expression, charClass: String)
  extends UnaryExpression {

  @transient private lazy val parsed = TextOps.parseCharClass(charClass)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_char_class_count"

  override def nullSafeEval(v: Any): Any = {
    val (bits, negate) = parsed
    TextOps.countClass(v.asInstanceOf[UTF8String], bits, negate)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (bits, negate) = parsed
    val bitsRef = ctx.addReferenceObj("charClassBits", bits, "java.util.BitSet")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.countClass($v, $bitsRef, $negate);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document term-frequency map from an `array<string>` token column —
  * `map<term, count>` built in one pass inside the scan stage.
  *
  * Why native: the tf aggregate `explode(tokens) → groupBy(doc, term)`
  * SHUFFLES the entire raw token stream (every token of every document)
  * to reassemble per-document locality the source row already had — at
  * 100 TB that Exchange carries the tokenized corpus and dominated t6
  * (2.1 s of 4.6 s at 20× sf0.1). This expression folds the per-document
  * count into the scan: consumers explode `map<term, count>` (one row
  * per DISTINCT term per doc) or read per-doc stats (size, max) with no
  * shuffle at all. First-occurrence key order; null tokens count as ""
  * (the tokenizer never yields nulls) — matching the aggregate form.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${t.sql}")
    }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def prettyName: String = "graft_term_counts"

  override def nullSafeEval(v: Any): Any =
    TextOps.termCounts(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.termCounts($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whitespace-token count from a STRING column — `size(split(trim(x),
  * "\s+"))` without materializing the token array.
  *
  * Why native: call sites that need only the count (the c1/c2 quality
  * floor, c3's per-source token mass) paid split's per-token UTF8String
  * allocations just to read the array's length. One code-point scan,
  * zero allocation beyond the decoded string, inside whole-stage
  * codegen. Edge semantics pinned to the split form by TextSpec: empty/
  * space-only → 1, boundary \t runs → one empty token each side.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(v: Any): Any =
    TextOps.tokenCount(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.tokenCount($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Match COUNT of the BPE-ish lexer `[a-z]+|[0-9]+|[^a-z0-9\s]` from a
  * (lowered) string column — `size(regexp_extract_all(...))` without
  * materializing the token array; one code-point scan in whole-stage
  * codegen. Count-only call sites (t1's re_tokens) paid the Java regex
  * engine plus a per-token UTF8String array just to read its length.
  * Semantics pinned to the regexp form by TextSpec's cross-check.
  */
case class LexerTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_lexer_token_count"

  override def nullSafeEval(v: Any): Any =
    TextOps.lexerTokenCount(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.lexerTokenCount($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single top-level integer key extraction from a JSON STRING column —
  * `from_json(x, struct<key:int>).key` without the interpreted wrapper.
  *
  * Why native: `from_json` (JsonToStructs) is a CodegenFallback
  * expression — the one interpreted island q29 had in its scan-side
  * Project, breaking the whole-stage-codegen span and the repo's own
  * PlanSpec invariant (SURVEY §4: no CodegenFallback on an unbounded
  * path). For the one-key-integer shape every event pipeline hits, a
  * full Jackson parse (token objects, a per-field conversion stack, a
  * boxed InternalRow) buys nothing: [[TextOps.jsonGetInt]] walks the
  * UTF-8 bytes once, validates the same grammar, and returns the int —
  * inside whole-stage codegen. Semantics (including PERMISSIVE-mode
  * partial results on conversion failures) are pinned to `from_json` by
  * TextSpec's 60-case cross-check; see [[TextOps.jsonGetInt]].
  *
  * The key is a plan constant (addReferenceObj), so the generated
  * projection is two lines regardless of key content.
  */
case class JsonGetInt(child: Expression, key: String)
  extends UnaryExpression {

  @transient private lazy val keyUtf8: UTF8String = UTF8String.fromString(key)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_json_get_int"

  override def nullSafeEval(v: Any): Any =
    TextOps.jsonGetInt(v.asInstanceOf[UTF8String], keyUtf8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("jsonKey", keyUtf8,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("jsonInt")
      s"""
         |java.lang.Integer $tmp = graft.text.TextOps.jsonGetInt($v, $keyRef);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE token COUNT from a STRING column against a fixed merge table —
  * the number a training pipeline actually budgets with, computed
  * without materializing any token array.
  *
  * Why native: the composable form (split to words, explode, per-word
  * iterative merge loop) has no SQL expression at all — the merge loop
  * is inherently iterative — so the alternative would be a Scala UDF
  * (serialization wall, no codegen) or a word-exploded
  * shuffle. This kernel does the whole document in one code-point scan
  * inside whole-stage codegen; the merge table is a plan constant
  * (addReferenceObj), so generated code stays two lines regardless of
  * vocab size. Semantics (greedy lowest-rank-first merging, the
  * standard BPE apply loop) are pinned by TextSpec unit vectors, a
  * brute-force cross-check against an independent Scala reference, and
  * the t12 gate's recursive-CTE DuckDB oracle.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  @transient private lazy val table = new TextOps.BpeMerges(merges)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_bpe_token_count"

  override def nullSafeEval(v: Any): Any =
    TextOps.bpeTokenCount(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMerges", table,
      "graft.text.TextOps.BpeMerges")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.bpeTokenCount($v, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
