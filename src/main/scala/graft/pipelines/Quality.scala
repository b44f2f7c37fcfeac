package graft.pipelines

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.DoubleType

/** Model-based quality scoring seam (SURVEY §2.10, C2).
  *
  * T2's quality signals are heuristic Column expressions; real
  * pretraining pipelines additionally gate on a MODEL score (perplexity
  * of a small LM, a fastText quality classifier, …). No such model runs
  * in this container, so — exactly like the multimodal decode seam
  * ([[graft.multimodal.MediaDecoder]]) — the scorer is a first-class
  * type threaded through an iterator `mapPartitions`, and a
  * deterministic stub stands in for the model. A real scorer plugs in
  * without touching the pipeline: schema handling, batch shape, and the
  * downstream curation gate are scorer-agnostic.
  *
  * Scale shape: scoring is map-side only (no shuffle, no state). Rows
  * stream through in bounded batches (`grouped` keeps memory at
  * O(batchSize), never the partition) so a vectorizing model amortizes
  * one forward pass per batch, and per-partition scorer init (model
  * load) happens once per task, not per row. The cost is leaving
  * whole-stage codegen for the scoring stage — inherent to calling an
  * external model, which is why the scorer stage should run AFTER cheap
  * expression-level filters have dropped what they can.
  */
trait QualityScorer extends Serializable {
  /** Scores in [0,1] for a batch of texts, index-aligned. A real model
    * scorer runs one batched forward pass here. Must be deterministic. */
  def scoreBatch(texts: Seq[String]): Seq[Double]
}

/** Deterministic stub: lexical-diversity × length saturation —
  * `(distinct_tokens / tokens) * min(1, tokens / 100)`. Chosen because
  * it is (a) a real (if crude) quality signal — boilerplate and
  * keyword-stuffed docs score low, and (b) exactly reproducible in SQL
  * (rational arithmetic, correctly-rounded IEEE divisions), which lets
  * the c2 gate row oracle-check the ENTIRE seam path through
  * mapPartitions — not just its plumbing. */
object LexicalDiversityScorer extends QualityScorer {
  val SaturationTokens = 100

  /** SQL `trim` strips SPACES only; Java's String.trim also strips
    * \t\n\r, which would make this tokenizer disagree with
    * TextFunctions.tokens (and the oracle) on whitespace-edged text. */
  private def sqlTrim(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  override def scoreBatch(texts: Seq[String]): Seq[Double] = texts.map { t =>
    // Locale.ROOT matches SQL lower() on every JVM (tr-locale 'I'→'ı'
    // would otherwise diverge from the oracle)
    val toks = sqlTrim(t.toLowerCase(java.util.Locale.ROOT)).split("\\s+", -1)
    val n = toks.length.toDouble // split never returns an empty array
    (toks.distinct.length / n) * math.min(1.0, n / SaturationTokens)
  }
}

object Quality {

  /** Append a `quality_score` column via the scorer seam. Schema-generic:
    * any input columns pass through untouched (Row encoder over the
    * widened schema), so the seam composes with any upstream shape. */
  def withScore(d: DataFrame, textCol: String, scorer: QualityScorer,
                batchSize: Int = 64): DataFrame = {
    val outSchema = d.schema.add("quality_score", DoubleType, nullable = false)
    val textIdx = d.schema.fieldIndex(textCol)
    d.mapPartitions { it =>
      // per-partition model init would go here
      it.grouped(batchSize).flatMap { batch =>
        val scores = scorer.scoreBatch(batch.map(_.getString(textIdx)))
        batch.lazyZip(scores).map((r, s) => Row.fromSeq(r.toSeq :+ s))
      }
    }(Encoders.row(outSchema))
  }

  /** C2: the c1 curation pass with a model-score gate in front — score
    * every document through the seam, drop those below `minScore`, then
    * run the UNCHANGED c1 pipeline (quality floor, keep-first dedup, PII
    * scrub, split tag). One extra map-side stage; the rest of the plan
    * is identical to c1. */
  def curateScored(d: DataFrame, scorer: QualityScorer,
                   minScore: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    val gated = withScore(d, "text", scorer)
      .filter(col("quality_score") >= minScore)
      .drop("quality_score")
    CurationQueries.curate(gated)
  }
}
