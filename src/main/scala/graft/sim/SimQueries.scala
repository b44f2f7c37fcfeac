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

  val KmeansK = 8

  /** S5 gate: TWO full Lloyd's iterations with an exact update, so the
    * iteration engine itself is DuckDB-oracle-checked (the production
    * [[Similarity.kmeans]] is float-avg based and spec-checked; float
    * summation order made its oracle unstable — round-5 verdict). The
    * trick: centroid components are means of SCALED-INTEGER sums
    * (floor(x*1e6 + 0.5) as BIGINT — order-independent, overflow-safe
    * at < 2^53) followed by two IEEE divisions, so every intermediate
    * is bit-identical in any engine and NO rounding tolerance is
    * needed anywhere. Assignment is the same codegen'd
    * NearestCentroids scan as production k-means; each update shuffles
    * only (cluster, dim, integer partial) rows with map-side combine;
    * the driver holds k×dim doubles between rounds. Output: the
    * centroid matrix after round 2 as (cluster, dim, val) rows. */
  def s5Kmeans(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.nearestCentroids
    val e = vectors(s, dir)
    def assign(c: Array[Array[Double]]): DataFrame =
      e.withColumn("cluster", element_at(nearestCentroids(col("embedding"), c, 1), 1))
    def update(assigned: DataFrame): DataFrame = assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim"))
      .agg(sum(floor(col("x") * 1e6 + 0.5)).as("sm"), count(lit(1)).as("n"))
      .select(col("cluster"), col("dim"),
        (col("sm").cast("double") / col("n").cast("double") / 1e6).as("val"))
    val cents0 = Similarity.sampleCentroids(e, "vec_id", "embedding", KmeansK)
    // empty clusters keep their previous centroid (position preserved)
    val cents1 = cents0.map(_.clone)
    update(assign(cents0)).collect()
      .foreach(r => cents1(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    update(assign(cents1))
  }

  /** S6: per-group embedding centroids — the data-mixing primitive
    * (domain balancing, diversity scoring, cluster drift monitoring
    * all start from "the mean vector of each slice"). Groups derive
    * deterministically from the id (4 hash buckets standing in for
    * domain labels the synthetic corpus lacks). Same exact-arithmetic
    * trick as s5: scaled-integer component sums + two IEEE divisions —
    * bit-identical cross-engine, no rounding tolerance; one shuffle of
    * (group, dim, integer partial) rows. */
  val CentroidGroups = 4

  def s6GroupCentroids(s: SparkSession, dir: String): DataFrame =
    vectors(s, dir)
      .select((col("vec_id") % CentroidGroups).cast("int").as("grp"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("grp"), col("dim"))
      .agg(sum(floor(col("x") * 1e6 + 0.5)).as("sm"), count(lit(1)).as("n"))
      .select(col("grp"), col("dim"),
        (col("sm").cast("double") / col("n").cast("double") / 1e6).as("val"),
        col("n").as("n_vectors"))

  /** S7: k-NN majority-vote label classification — the
    * labelled-neighbor primitive behind quality-label propagation and
    * weak supervision over an embedded corpus ("label the unlabelled
    * point like its nearest labelled neighbors vote"). Reuses the s1
    * two-stage top-k (broadcast query set, linear corpus scan); the
    * 50-row neighbor set then broadcasts AGAINST the label table, so
    * the label lookup is a second scan with zero shuffle. Vote ties
    * break to the smaller label (deterministic cross-engine). */
  def s7KnnLabel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = vectors(s, dir)
    val topk = Similarity.bruteForceTopK(
      v.filter(col("vec_id") < NumQueryVecs), v, "vec_id", "embedding", K)
    val labels = Tables(s, dir, "embeddings")
      .select(col("vec_id").as("neighbor_id"), col("label"))
    val votes = labels.join(broadcast(topk), "neighbor_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    votes.withColumn("rr", row_number().over(w)).filter(col("rr") === 1)
      .select(col("query_id"), col("label").as("predicted_label"), col("votes"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_cosine_topk" -> (s1CosineTopK _),
    "s2_ann_lsh" -> (s2AnnLsh _),
    "s3_ann_ivf" -> (s3AnnIvf _),
    "s5_kmeans" -> (s5Kmeans _),
    "s6_group_centroids" -> (s6GroupCentroids _),
    "s7_knn_label" -> (s7KnnLabel _))

  /** Literal DuckDB array for one hyperplane (the planes are
    * deterministic md5-derived constants — inlining them makes the LSH
    * pipeline exactly oracle-reproducible). */
  private def planeSql(plane: Array[Double]): String =
    plane.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** Bucket expression: bit p set iff dot(v, plane_p) >= 0 — mirrors
    * Similarity.lshBucket with identical double arithmetic. */
  private def bucketSql(numPlanes: Int): String =
    Similarity.hyperplanes(numPlanes, 64).zipWithIndex.map { case (plane, p) =>
      s"(CASE WHEN list_dot_product(v, ${planeSql(plane)}) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  private val cosSql =
    "round(list_dot_product(x.v, y.v) / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6)"

  val oracles: Map[String, String] = Map(
    "s6_group_centroids" ->
      s"""SELECT CAST(vec_id % $CentroidGroups AS INT) AS grp, dim,
         |  CAST(sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         |    / count(*) / 1000000.0 AS val,
         |  count(*) AS n_vectors
         |FROM (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
         |        unnest(range(len(embedding))) AS dim
         |      FROM embeddings)
         |GROUP BY 1, 2""".stripMargin,
    "s5_kmeans" ->
      // unrolled 2-round Lloyd's mirror: same bottom-8-by-md5 init as
      // the ivf oracle, cosine argmax assignment (ties -> smaller
      // cluster), scaled-integer exact update; empty clusters keep the
      // previous centroid via the LEFT JOIN coalesce
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS c, v AS cv
         |  FROM (SELECT vec_id, v,
         |          ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS h
         |        FROM e ORDER BY h, vec_id LIMIT $KmeansK)),
         |s0 AS (SELECT e.vec_id, e.v, c.c,
         |         list_dot_product(e.v, c.cv) /
         |           (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
         |       FROM e, cent0 c),
         |a0 AS (SELECT vec_id, v, c FROM (
         |         SELECT vec_id, v, c,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c ASC) AS rr
         |         FROM s0) WHERE rr = 1),
         |u1 AS (SELECT c, dim,
         |         CAST(sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         |           / count(*) / 1000000.0 AS val
         |       FROM (SELECT c, unnest(v) AS x, unnest(range(len(v))) AS dim FROM a0)
         |       GROUP BY c, dim),
         |c1 AS (SELECT c0.c, coalesce(u.cv, c0.cv) AS cv
         |       FROM cent0 c0 LEFT JOIN
         |         (SELECT c, list(val ORDER BY dim) AS cv FROM u1 GROUP BY c) u
         |         ON c0.c = u.c),
         |s1 AS (SELECT e.vec_id, e.v, c.c,
         |         list_dot_product(e.v, c.cv) /
         |           (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
         |       FROM e, c1 c),
         |a1 AS (SELECT vec_id, v, c FROM (
         |         SELECT vec_id, v, c,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c ASC) AS rr
         |         FROM s1) WHERE rr = 1)
         |SELECT c AS cluster, CAST(dim AS INT) AS dim,
         |  CAST(sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         |    / count(*) / 1000000.0 AS val
         |FROM (SELECT c, unnest(v) AS x, unnest(range(len(v))) AS dim FROM a1)
         |GROUP BY c, dim""".stripMargin,
    "s3_ann_ivf" ->
      // centroid sample mirrors Similarity.ivfTopK: bottom-16 rows by
      // md5(vec_id) (deterministic uniform draw), list_id by (hash, id) rank
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (
         |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS list_id,
         |    v AS cv
         |  FROM (
         |    SELECT vec_id, v,
         |      ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS h
         |    FROM e ORDER BY h, vec_id LIMIT 16)),
         |scored AS (
         |  SELECT r.vec_id, r.v, c.list_id,
         |    list_dot_product(r.v, c.cv) /
         |      (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
         |  FROM e r, cent c),
         |assign AS (
         |  SELECT vec_id, v, list_id FROM (
         |    SELECT vec_id, v, list_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, list_id ASC) AS rr
         |    FROM scored) WHERE rr = 1),
         |probe AS (
         |  SELECT vec_id AS query_id, v AS qv, list_id FROM (
         |    SELECT vec_id, v, list_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, list_id ASC) AS rr
         |    FROM scored WHERE vec_id < $NumQueryVecs) WHERE rr <= 2),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id,
         |    round(list_dot_product(p.qv, a.v) /
         |      (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))), 6)
         |      AS cos_sim
         |  FROM probe p JOIN assign a ON p.list_id = a.list_id AND a.vec_id != p.query_id)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         |  FROM cand)
         |WHERE rank <= $K""".stripMargin,
    "s2_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id, v, ${bucketSql(4)} AS bucket FROM e),
         |q AS (SELECT * FROM b WHERE vec_id < $NumQueryVecs),
         |scored AS (
         |  SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id, $cosSql AS cos_sim
         |  FROM q x JOIN b y ON x.bucket = y.bucket AND x.vec_id != y.vec_id)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |WHERE rank <= $K""".stripMargin,
    "s7_knn_label" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id < $NumQueryVecs),
         |scored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    round(list_dot_product(q.v, e.v) /
         |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6)
         |      AS cos_sim
         |  FROM q, e WHERE e.vec_id != q.vec_id),
         |topk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         |    FROM scored) WHERE rank <= $K),
         |votes AS (
         |  SELECT t.query_id, l.label, count(*) AS votes
         |  FROM topk t JOIN embeddings l ON t.neighbor_id = l.vec_id
         |  GROUP BY 1, 2)
         |SELECT query_id, label AS predicted_label, votes FROM (
         |  SELECT query_id, label, votes,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY votes DESC, label ASC) AS rr
         |  FROM votes) WHERE rr = 1""".stripMargin,
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
