package graft.sim

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over the embeddings table (SURVEY §2.4).
  * s1 is exactly oracle-checked (double-precision cosine reproduced via
  * DuckDB list_dot_product); s2 is rows-only in the gate with a recall-
  * vs-brute-force spec (SimSpec).
  */
object SimQueries {

  val K = 5
  val NumQueryVecs = 10

  private def vectors(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  /** S1: brute-force cosine top-k — broadcast query set, linear corpus
    * scan, two-stage ranking (see Similarity.bruteForceTopK). */
  def s1CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val v = vectors(s, dir)
    Similarity.bruteForceTopK(
      v.filter(col("vec_id") < NumQueryVecs), v, "vec_id", "embedding", K)
  }

  /** S2: hyperplane-LSH ANN top-k — candidates restricted to the query's
    * signature bucket. 4 planes → 16 buckets at this SF; at cluster scale
    * more planes (finer buckets) + multi-probe. */
  def s2AnnLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.annTopK(vectors(s, dir), "vec_id", "embedding",
      numPlanes = 4, k = K, queryFilter = col("vec_id") < NumQueryVecs)

  /** S3: IVF ANN top-k — 16 lists, 2 probes; data-dependent index
    * structure beside s2's data-blind hyperplanes. */
  def s3AnnIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(vectors(s, dir), "vec_id", "embedding",
      nlist = 16, nprobe = 2, k = K, queryFilter = col("vec_id") < NumQueryVecs)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_cosine_topk" -> (s1CosineTopK _),
    "s2_ann_lsh" -> (s2AnnLsh _),
    "s3_ann_ivf" -> (s3AnnIvf _))

  val oracles: Map[String, String] = Map(
    "s1_cosine_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id < $NumQueryVecs),
         |scored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    round(list_dot_product(q.v, e.v) /
         |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6)
         |      AS cos_sim
         |  FROM q, e WHERE e.vec_id != q.vec_id)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |WHERE rank <= $K""".stripMargin)
}
