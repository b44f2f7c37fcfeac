package graft.pipelines

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Curation pipeline semantics (SURVEY §2.10): planted quality
  * violations, duplicates, PII, and eval-overlap — each must be
  * handled by the composed pass exactly as the standalone operators
  * would. */
class CurationSpec extends SparkTestBase {

  import spark.implicits._

  private val longText =
    (1 to 30).map(i => s"word$i").mkString(" ") // 30 clean tokens

  test("c1: quality gate drops short and punctuation-heavy docs") {
    val df = Seq(
      (1L, "en", longText),                       // keeps
      (2L, "en", "too short"),                    // < MinTokens
      (3L, "en", (1 to 30).map(_ => "@!#?").mkString(" "))) // punct-heavy
      .toDF("doc_id", "lang", "text")
    val kept = CurationQueries.curate(df).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("c1: exact-dedup keeps the smallest doc_id of each content group") {
    val df = Seq(
      (5L, "en", longText), (2L, "en", longText), (9L, "en", longText),
      (7L, "de", longText + " unique"))
      .toDF("doc_id", "lang", "text")
    val kept = CurationQueries.curate(df).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 7L))
  }

  test("c1: PII is scrubbed (clean_len reflects redaction)") {
    val pii = longText + " mail me at someone@example.com now"
    val clean = longText + " mail me at <EMAIL> now"
    val df = Seq((1L, "en", pii)).toDF("doc_id", "lang", "text")
    val len = CurationQueries.curate(df).select("clean_len").as[Int].head()
    assert(len == clean.length)
  }

  test("c1: split tag matches the P1 hash-bucket convention") {
    val df = (1L to 40L).map(i => (i, "en", longText + s" tail$i"))
      .toDF("doc_id", "lang", "text")
    val out = CurationQueries.curate(df)
      .select(col("doc_id"),
        graft.ops.Sampling.hashBucket(col("doc_id"), 10).as("b"), col("split"))
      .collect()
    out.foreach { r =>
      val expect = if (r.getLong(1) < 8) "train" else if (r.getLong(1) < 9) "val" else "test"
      assert(r.getString(2) == expect, s"doc ${r.getLong(0)}")
    }
    // at 40 docs all three splits should be populated
    assert(out.map(_.getString(2)).toSet == Set("train", "val", "test"))
  }

  test("t9: planted eval overlap is counted; eval docs and clean docs excluded") {
    // evalK=1 picks the doc with the smallest md5 hash; plant a doc
    // sharing exactly one 3-gram with it and one sharing nothing
    val base = (1L to 5L).map(i => (i, "en", s"alpha$i beta$i gamma$i delta$i"))
    val df = base.toDF("doc_id", "lang", "text")
    val evalId = df
      .select(col("doc_id"), graft.ops.Sampling.hashBucket(col("doc_id"), Int.MaxValue).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc).limit(1)
      .select("doc_id").as[Long].head()
    val contaminated = 100L
    val cleanDoc = 101L
    val df2 = df.union(Seq(
      (contaminated, "en", s"alpha$evalId beta$evalId gamma$evalId wholly new tail"),
      (cleanDoc, "en", "nothing shared here at all friends")).toDF("doc_id", "lang", "text"))
    val out = CurationQueries.contamination(df2, evalK = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exactly one shared trigram: "alphaK betaK gammaK" (the planted
    // doc's later trigrams end in "wholly new tail", absent from eval)
    assert(out.contains(contaminated))
    assert(out(contaminated)._1 == 1L, s"got ${out(contaminated)}")
    assert(!out.contains(cleanDoc))
    assert(!out.contains(evalId), "eval docs must be excluded")
  }

  // sf0.01 (500 docs): the k=100 draw needs a corpus larger than k,
  // which sfDir's sf0.001 (50 docs) is not
  private val p4Dir = "/root/testdata/sf0.01"

  test("p4: weighted sampling over-represents heavy (long) documents") {
    val d = graft.Tables(spark, p4Dir, "documents")
    val corpusMean = d.select(avg(size(graft.text.TextFunctions.tokens(col("text")))))
      .as[Double].head()
    val sampled = graft.ops.Sampling.p4WeightedSample(spark, p4Dir)
      .join(d, "doc_id")
      .select(avg(size(graft.text.TextFunctions.tokens(col("text")))))
      .as[Double].head()
    assert(sampled > corpusMean,
      s"weighted sample mean tokens $sampled should exceed corpus mean $corpusMean")
    // deterministic: same sample on re-run
    val ids1 = graft.ops.Sampling.p4WeightedSample(spark, p4Dir)
      .select("doc_id").as[Long].collect().toSeq
    val ids2 = graft.ops.Sampling.p4WeightedSample(spark, p4Dir)
      .select("doc_id").as[Long].collect().toSeq
    assert(ids1 == ids2 && ids1.size == graft.ops.Sampling.WeightedK)
  }

  test("c2: stub scorer is deterministic, in [0,1], and rewards diversity and length") {
    val texts = Seq(
      (1 to 50).map(i => s"w$i").mkString(" "),        // diverse, 50 tokens
      Seq.fill(50)("same").mkString(" "),               // repetitive, 50 tokens
      (1 to 150).map(i => s"w${i % 150}").mkString(" ")) // diverse, saturated length
    val s1 = LexicalDiversityScorer.scoreBatch(texts)
    assert(s1 == LexicalDiversityScorer.scoreBatch(texts))
    assert(s1.forall(s => s >= 0.0 && s <= 1.0))
    assert(s1(0) > s1(1), "diverse text must outscore repetitive text")
    assert(s1(2) == 1.0, "fully diverse saturated-length text scores 1")
  }

  test("c2: withScore passes any schema through; batch size never changes results") {
    val df = Seq((1L, "en", longText, 42), (2L, "fr", "tiny text", 7))
      .toDF("doc_id", "lang", "text", "extra")
    val scored = Quality.withScore(df, "text", LexicalDiversityScorer)
    assert(scored.columns.toSeq ==
      Seq("doc_id", "lang", "text", "extra", "quality_score"))
    assert(scored.filter(col("extra").isin(42, 7)).count() == 2)
    val perRow = Quality.withScore(df, "text", LexicalDiversityScorer, batchSize = 1)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val batched = scored.select("doc_id", "quality_score")
      .as[(Long, Double)].collect().toMap
    assert(perRow == batched)
  }

  test("c2: a swapped scorer gates the pipeline without touching anything else") {
    val df = Seq(
      (1L, "en", longText),
      (2L, "en", longText.replace("word", "term")),
      (3L, "en", longText.replace("word", "item")))
      .toDF("doc_id", "lang", "text")
    // custom scorer dropping exactly the "term" doc — proves the seam is
    // what decides, not the stub heuristics. SAM lambda over a local val:
    // no outer-class capture, so the closure serializes clean.
    val termText = longText.replace("word", "term")
    val dropTerm: QualityScorer = texts =>
      texts.map(t => if (t == termText) 0.0 else 1.0)
    val kept = Quality.curateScored(df, dropTerm, minScore = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    // and with the always-pass scorer, c2 == c1 exactly
    val passAll: QualityScorer = texts => texts.map(_ => 1.0)
    val c2 = Quality.curateScored(df, passAll, minScore = 0.5).collect().toSet
    val c1 = CurationQueries.curate(df).collect().toSet
    assert(c2 == c1)
  }

  test("c3: per-source stats count dups, short docs, langs, and token mass") {
    val docs = Seq(
      (1L, "en", "crawlA", longText),
      (2L, "en", "crawlA", longText),            // exact dup within crawlA
      (3L, "de", "crawlA", "too short"),          // short doc
      (4L, "en", "feedB", longText + " extra"),
      (5L, "fr", "feedB", longText + " autre"))
      .toDF("doc_id", "lang", "source", "text")
    val out = CurationQueries.sourceStats(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(6))).toMap
    assert(out("crawlA") == ((3L, 2L, 1L, 2L, 1.0 - 2.0 / 3)))
    assert(out("feedB") == ((2L, 2L, 0L, 2L, 0.0)))
  }

  test("c1/p4 plans: one Exchange for curate; TakeOrdered for the weighted draw") {
    val c1 = CurationQueries.c1Curation(spark, sfDir).queryExecution.executedPlan.toString
    assert(c1.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"curate must shuffle exactly once (content-hash window):\n$c1")
    val p4 = graft.ops.Sampling.p4WeightedSample(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p4.contains("TakeOrderedAndProject"), "weighted draw must be a top-k, not a sort")
  }
}
