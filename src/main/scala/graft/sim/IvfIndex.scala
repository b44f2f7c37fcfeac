package graft.sim

import graft.sources.Bucketed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF inverted file (SURVEY §2.4 S3, the build-once scale
  * path).
  *
  * [[Similarity.ivfTopK]] rebuilds its index inside every query plan —
  * fine for a one-shot query, wrong for a served corpus: at 100 TB the
  * assignment pass (one codegen'd linear scan, nlist dot products per
  * row) is the expensive step and must be paid once, not per probe.
  *
  * Build: every vector is assigned to its nearest centroid (the same
  * deterministic sample as the in-plan form, so results are identical)
  * and the assignment is written as a parquet catalog table BUCKETED and
  * sorted by `list_id` — the on-disk form of the inverted file. Buckets
  * align storage with the probe access pattern: a probe touches `nprobe`
  * lists per query, and bucket pruning turns that into reading only the
  * matching bucket files.
  *
  * Probe: queries assign to their `nprobe` closest centroids (same
  * native [[graft.functions.NearestCentroids]] expression); the probed
  * list ids — bounded by |queries| × nprobe, queries being the small
  * side by contract — become a LITERAL In filter on the bucket column,
  * which is what FileSourceStrategy's bucket pruning consumes. The
  * corpus side is therefore a bucket-pruned scan with NO Exchange: the
  * only shuffles in a probe plan are on the (small) query side and the
  * final per-query rank window. SimSpec asserts both plan properties and
  * that probe results equal the in-plan ivfTopK bit-for-bit.
  */
object IvfIndex {

  /** Handle to a built index: the catalog table holding the bucketed
    * assignment, the centroid matrix (tiny — nlist × dim doubles; at
    * cluster scale it would persist beside the table, here the handle
    * carries it), and the bucket count appends must reproduce. */
  final case class Handle(table: String, centroids: Array[Array[Double]],
                          numBuckets: Int)

  /** Build the inverted file: assign all vectors, write bucketed by
    * list_id. One scan + one write; no shuffle beyond the write's
    * bucketing. Spark buckets by Murmur3(list_id) mod numBuckets, so
    * numBuckets ≈ nlist gives near-one-list-per-bucket (hash collisions
    * can co-locate a few lists — pruning still skips every bucket whose
    * hash no probed list maps to). */
  def build(vectors: DataFrame, idCol: String, vecCol: String,
            nlist: Int, numBuckets: Int, table: String): Handle = {
    val centroids = Similarity.sampleCentroids(vectors, idCol, vecCol, nlist)
    import graft.functions.VectorFunctions.nearestCentroids
    val assigned = vectors
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("list_id",
        element_at(nearestCentroids(col("c_vec"), centroids, 1), 1))
    Bucketed.writeBucketed(assigned, table, "list_id", numBuckets)
    Handle(table, centroids, numBuckets)
  }

  /** Incrementally add vectors to a built index: assign with the STORED
    * centroids — the assignment function is frozen at build time, so
    * new rows land in the same lists probes already search — and append
    * in the same bucket layout (Spark applies the table's bucket spec
    * to appended files, so pruning keeps working). One scan of the new
    * vectors; existing data is untouched. Centroids drifting from the
    * corpus distribution shows up as list-size skew — watch
    * [[listSizes]] and rebuild when unbalanced. */
  def append(index: Handle, vectors: DataFrame, idCol: String, vecCol: String): Unit = {
    import graft.functions.VectorFunctions.nearestCentroids
    val assigned = vectors
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("list_id",
        element_at(nearestCentroids(col("c_vec"), index.centroids, 1), 1))
    Bucketed.writeBucketed(assigned, index.table, "list_id", index.numBuckets,
      mode = org.apache.spark.sql.SaveMode.Append)
  }

  /** Per-list cardinalities — the index-health metric (rebuild when the
    * largest lists dominate probes). */
  def listSizes(index: Handle): DataFrame =
    index match { case Handle(table, _, _) =>
      org.apache.spark.sql.SparkSession.active.table(table)
        .groupBy(col("list_id")).agg(count(lit(1)).as("n_vectors"))
    }

  /** Rebuild trigger: centroid drift under appends shows up as list-size
    * skew (frozen build-time centroids stop matching the corpus
    * distribution, so new vectors pile into few lists and probes touching
    * them degrade toward linear scans). Fires when the largest list holds
    * more than `skewFactor`× the mean. Metadata aggregate over the index
    * only. */
  def needsRebuild(index: Handle, skewFactor: Double = 4.0): Boolean = {
    val row = listSizes(index)
      .agg(max(col("n_vectors")).as("mx"), avg(col("n_vectors")).as("mean"))
      .collect()(0)
    !row.isNullAt(0) && row.getLong(0) > skewFactor * row.getDouble(1)
  }

  /** Rebuild the inverted file from its own rows: RE-SAMPLE centroids
    * from the CURRENT corpus (the same deterministic sampler as build,
    * so a compacted index equals a fresh build over the same vectors),
    * re-assign every vector, and rewrite under the same bucket spec —
    * clearing centroid drift and any duplicate rows from streaming
    * replay windows (ST10's documented residue). Cost: two scans of the
    * index (sample + assign) and one bucketed write — proportional to
    * the index, with the assignment the same codegen'd nlist-dot-product
    * kernel as build. Staging table + catalog rename keeps the swap
    * atomic for concurrent readers. Returns the NEW handle (fresh
    * centroids); probes holding the old handle should be re-issued. */
  def compact(index: Handle, nlist: Int): Handle = {
    val spark = org.apache.spark.sql.SparkSession.active
    import graft.functions.VectorFunctions.nearestCentroids
    val vecs = spark.table(index.table)
      .dropDuplicates("neighbor_id")
      .select(col("neighbor_id"), col("c_vec"))
    val centroids = Similarity.sampleCentroids(vecs, "neighbor_id", "c_vec", nlist)
    val assigned = vecs.withColumn("list_id",
      element_at(nearestCentroids(col("c_vec"), centroids, 1), 1))
    val staging = index.table + "_compact_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    Bucketed.writeBucketed(assigned, staging, "list_id", index.numBuckets)
    spark.sql(s"DROP TABLE ${index.table}")
    spark.sql(s"ALTER TABLE $staging RENAME TO ${index.table}")
    Handle(index.table, centroids, index.numBuckets)
  }

  /** Probe the persisted index: top-k by exact cosine within the probed
    * lists. Corpus side = bucket-pruned scan of `index.table`, no
    * Exchange; query side = broadcast. */
  def probe(index: Handle, queries: DataFrame, idCol: String, vecCol: String,
            nprobe: Int, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import graft.functions.VectorFunctions.nearestCentroids
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("list_id",
        explode(nearestCentroids(col("q_vec"), index.centroids, nprobe)))
    // Literal probe set: bucket pruning only fires on literal predicates
    // over the bucket column. Bounded collect — |queries| × nprobe ids.
    val probedLists = q.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).sorted
    val corpus = spark.table(index.table)
      .where(col("list_id").isin(probedLists.map(Int.box): _*))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    corpus.join(broadcast(q), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("q_vec"), col("c_vec")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(rankW)).filter(col("rank") <= k)
  }
}
