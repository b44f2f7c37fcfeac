package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity operators (SURVEY §2.4, S1–S2; also backs D5).
  *
  * Vectors are plain `array<double>` columns; all math runs in double
  * precision through [[graft.functions.DotProduct]] — a native Catalyst
  * expression whose generated loop stays inside whole-stage codegen (the
  * higher-order-function formulation is CodegenFallback: interpreted per
  * row, which dominated these queries when benchmarked). Its sequential
  * left-to-right fold matches DuckDB's list_dot_product order, so the
  * oracles compare exact doubles.
  *
  * Scale shapes:
  * - Brute-force top-k (S1): the query set is broadcast (small side);
  *   the corpus is scanned once, linearly. Ranking is two-stage: a
  *   per-(query, input-partition) window prunes to k before the final
  *   per-query window, so no single task ever sorts the whole corpus —
  *   the global window sees only numPartitions × k survivors per query.
  * - LSH ANN (S2) / embedding dedup (D5): random-hyperplane signatures
  *   (deterministic md5-derived planes) bucket the corpus; only
  *   co-bucketed vectors pair up. Same no-all-pairs contract as D2.
  * - IVF (S3): centroid sampling is a bottom-nlist-by-hash TakeOrdered
  *   (never a global sort/window over the corpus); assignment is one
  *   codegen'd linear scan.
  */
object Similarity {

  /** Codegen'd sequential dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic pseudo-random ±1 hyperplanes: entry (plane, dim) takes
    * the sign of an md5-derived bit. Driver-side constant, tiny (numPlanes
    * × dim doubles), broadcast with the plan. */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val mdf = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dim) { (p, d) =>
      val h = mdf.digest(s"graft-plane-$p-$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }
  }

  /** Corpus-sized hyperplane count (round-11 scale fix): the smallest
    * P ≥ minPlanes with expected bucket occupancy n / 2^P ≤ target,
    * capped at maxPlanes. With FIXED planes, bucket occupancy grows
    * linearly with the corpus and the within-bucket pair join goes
    * QUADRATIC (measured: d5 scaled ×34 on ×10 data at sf1). Holding
    * occupancy constant makes candidate pairs ∝ n·target — linear.
    * Integer arithmetic only (n ≤ target·2^P), so the SQL oracle's
    * CASE ladder reproduces the choice exactly, no FP-log edge cases.
    * Recall at a fixed similarity drops as planes grow — the standard
    * LSH trade; recall-sensitive callers should band like D2/S2
    * instead of raising target. */
  def autoPlanes(n: Long, target: Int = 150,
                 minPlanes: Int = 4, maxPlanes: Int = 12): Int = {
    var p = minPlanes
    while (p < maxPlanes && n > (target.toLong << p)) p += 1
    p
  }

  /** Bit-signature bucket id: bit p set iff dot(v, plane_p) >= 0.
    * Vectors on the same side of every plane share a bucket; cosine-close
    * vectors agree on most planes, so prefix buckets group them. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit(_)): _*)
      when(dot(vec, planeCol) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Brute-force cosine top-k of `corpus` for each row of `queries`
    * (both: idCol + vecCol of array<double>). Output: query_id,
    * neighbor_id, cos_sim (rounded for cross-engine rank stability),
    * rank. Self-matches excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("cos_sim"))
    // Stage 1: top-k within each (query, input partition) — bounded work.
    val partial = Window.partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    // Stage 2: global top-k over the few survivors.
    val global = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("prk", row_number().over(partial)).filter(col("prk") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** ANN top-k: restrict candidates to vectors sharing the query's LSH
    * bucket, then exact cosine + rank within the bucket. Recall vs
    * bruteForceTopK is the quality metric (spec-checked). */
  def annTopK(vectors: DataFrame, idCol: String, vecCol: String,
              numPlanes: Int, k: Int, queryFilter: Column, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val bucketed = vectors.select(col(idCol), col(vecCol).as("vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val q = bucketed.filter(queryFilter)
      .select(col(idCol).as("query_id"), col("vec").as("q_vec"), col("bucket"))
    val cands = bucketed.select(col(idCol).as("neighbor_id"),
      col("vec").as("c_vec"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cands.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN top-k — the index-structure scale path
    * beside hyperplane LSH.
    *
    * Build: `nlist` centroids are the corpus rows with the smallest
    * md5(id) values — a deterministic uniform pseudo-random sample whose
    * plan is TakeOrderedAndProject (per-partition heaps, a bounded
    * nlist-row collect; NEVER a global sort or an unpartitioned window
    * over the corpus — that shape moves all 100 TB to one task). Every
    * vector is then assigned to its nearest centroid in one codegen'd
    * linear scan: nlist dot products per row, argmax as a greatest +
    * first-match CASE chain, all map-side. Queries probe only their
    * `nprobe` closest centroid lists, so query cost is corpus/nlist ×
    * nprobe instead of the full corpus.
    *
    * This is the one-Catalyst-tree form (index rebuilt per run); the
    * build-once / probe-many persistence path is [[IvfIndex]]: the
    * assignment written as a bucketed table keyed by list id, probes as
    * bucket-pruned reads with no corpus-side shuffle. */
  /** Deterministic uniform centroid sample: the `nlist` corpus rows with
    * the smallest md5(id) — TakeOrderedAndProject (per-partition heaps,
    * bounded nlist-row collect), never a global sort. Shared by the
    * in-plan [[ivfTopK]] and the persisted [[IvfIndex]] so both assign
    * identically. */
  def sampleCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                      nlist: Int): Array[Array[Double]] = {
    val sampleHash =
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long")
    vectors
      .select(col(vecCol).as("cvec"), sampleHash.as("h"), col(idCol).as("cid"))
      .orderBy(col("h").asc, col("cid").asc)
      .limit(nlist)
      .collect()
      .map(_.getSeq[Double](0).toArray)
  }

  def ivfTopK(vectors: DataFrame, idCol: String, vecCol: String,
              nlist: Int, nprobe: Int, k: Int, queryFilter: Column): DataFrame = {
    val centroids = sampleCentroids(vectors, idCol, vecCol, nlist)
    // assignment + probe both go through the NearestCentroids native
    // expression: the centroid matrix rides along as ONE plan constant
    // and the argmax loop is compiled JVM code — ties resolve to the
    // smaller list id, matching the oracle's (cos DESC, list_id ASC)
    import graft.functions.VectorFunctions.nearestCentroids
    val assigned = vectors
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("list_id",
        element_at(nearestCentroids(col("c_vec"), centroids, 1), 1))
    val queries = vectors.filter(queryFilter)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        explode(nearestCentroids(col(vecCol), centroids, nprobe)).as("list_id"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    assigned.join(broadcast(queries), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(rankW)).filter(col("rank") <= k)
  }

  /** K-means clustering over an embedding column (S5) — the corpus-
    * curation primitive (data mixing, domain balancing, diversity
    * sampling all start from cluster assignments).
    *
    * Lloyd's iterations, Spark-shaped: ASSIGNMENT is one codegen'd
    * linear scan through the native [[graft.functions.NearestCentroids]]
    * expression (k dot products per row, map-side only); UPDATE is
    * posexplode → groupBy(cluster, dim) → avg with map-side partials —
    * one shuffle of (cluster, dim, partial sums), never vectors. The
    * driver only ever holds the k × dim centroid matrix (collected each
    * round — bounded by the model size, not the data). Init is the
    * deterministic bottom-k-by-md5 sample shared with IVF, so runs are
    * reproducible. Returns (centroids, assignment DataFrame with
    * idCol + cluster). */
  def kmeans(vectors: DataFrame, idCol: String, vecCol: String,
             k: Int, iterations: Int): (Array[Array[Double]], DataFrame) = {
    import graft.functions.VectorFunctions.nearestCentroids
    var cents = sampleCentroids(vectors, idCol, vecCol, k)
    def assign(c: Array[Array[Double]]): DataFrame =
      vectors.withColumn("cluster",
        element_at(nearestCentroids(col(vecCol), c, 1), 1))
    var iter = 0
    while (iter < iterations) {
      val updated = assign(cents)
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("v")).as("m"))
        .collect()
      val dim = updated.map(_.getInt(1)).max + 1
      val next = Array.tabulate(cents.length)(c => cents(c).take(dim)) // empty clusters keep position
      updated.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      cents = next
      iter += 1
    }
    (cents, assign(cents).select(col(idCol), col("cluster")))
  }

  /** Embedding near-dup pairs (D5): LSH bucket join, then exact cosine
    * verify >= threshold on co-bucketed pairs only. */
  def embeddingDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                        numPlanes: Int, threshold: Double, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val bucketed = vectors.select(col(idCol).as("a"), col(vecCol).as("a_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val other = bucketed.select(col("a").as("b"), col("a_vec").as("b_vec"), col("bucket"))
    bucketed.join(other, Seq("bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("a_vec"), col("b_vec")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
