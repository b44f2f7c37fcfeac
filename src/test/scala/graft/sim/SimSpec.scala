package graft.sim

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics + recall for the similarity pack (SURVEY §2.4 S1–S2). */
class SimSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 64

  private def unit(f: Int => Double): Seq[Double] = {
    val v = Array.tabulate(dim)(f)
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n).toSeq
  }

  // Two tight clusters of 10 vectors each around orthogonal-ish centers.
  private def clustered = (0 until 10).map { i =>
    (i.toLong, unit(d => math.sin(d + 1.0) + 0.02 * math.sin(7.0 * d + i)))
  } ++ (0 until 10).map { i =>
    (10L + i, unit(d => math.cos(2.0 * d + 0.5) + 0.02 * math.cos(5.0 * d + i)))
  }

  test("S1: cosine is exact") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)), (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 1.0), Seq(1.0, 0.0))).toDF("a", "b")
    val cs = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(cs(0) == 1.0)
    assert(cs(1) == 0.0)
    assert(math.abs(cs(2) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("S1: brute-force top-k ranks cluster members first, excludes self") {
    val vecs = clustered.toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", k = 5)
      .select("neighbor_id", "rank").as[(Long, Int)].collect()
    assert(out.length == 5)
    assert(out.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    assert(!out.map(_._1).contains(0L))            // self excluded
    assert(out.map(_._1).forall(_ < 10L))          // all from own cluster
  }

  test("S1: two-stage ranking equals a naive global ranking") {
    val vecs = clustered.toDF("vec_id", "embedding").repartition(8)
    val topk = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    // naive: full cross scoring + single global window
    val all = clustered
    val naive = (0L until 3L).flatMap { q =>
      val qv = all.find(_._1 == q).get._2
      all.filter(_._1 != q)
        .map { case (id, v) =>
          val dot = qv.zip(v).map { case (x, y) => x * y }.sum
          val cos = BigDecimal(dot / (math.sqrt(qv.map(x => x * x).sum)
            * math.sqrt(v.map(x => x * x).sum))).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          (id, cos)
        }
        .sortBy { case (id, cos) => (-cos, id) }.take(4).zipWithIndex
        .map { case ((id, _), i) => (q, id, i + 1) }
    }.toSet
    assert(topk == naive)
  }

  test("S2: ANN recall vs brute force is high on clustered data") {
    val vecs = clustered.toDF("vec_id", "embedding")
    val queries = col("vec_id") === 0 || col("vec_id") === 10
    val bf = Similarity.bruteForceTopK(
      vecs.filter(queries), vecs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(vecs, "vec_id", "embedding",
      numPlanes = 4, k = 5, queryFilter = queries, dim = dim)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ann).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall $recall below 0.8")
  }

  test("S2: ANN candidates stay within the query's bucket (no full scan)") {
    val plan = SimQueries.s2AnnLsh(spark, sfDir).queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("S3: persisted IVF index — bucket-pruned probe, no corpus-side Exchange, matches in-plan IVF") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    spark.sql("DROP TABLE IF EXISTS ivf_spec_index")
    // a fresh session's in-memory catalog doesn't know a previous run's
    // table, but its warehouse directory persists — clear it too
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "ivf_spec_index"))
    val nlist = 16
    val idx = IvfIndex.build(vecs, "vec_id", "embedding",
      nlist = nlist, numBuckets = nlist, table = "ivf_spec_index")
    val queries = vecs.filter(col("vec_id") < 2)
    val probed = IvfIndex.probe(idx, queries, "vec_id", "embedding", nprobe = 2, k = 5)

    // results identical to the one-tree form (same centroids, same math)
    val inPlan = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      nlist = nlist, nprobe = 2, k = 5, queryFilter = col("vec_id") < 2)
    assert(probed.collect().toSet == inPlan.collect().toSet)
    assert(probed.count() == 10) // 2 queries x k

    // plan contract: corpus side is a bucket-pruned scan with no Exchange
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = IvfIndex.probe(idx, queries, "vec_id", "embedding", nprobe = 2, k = 5)
        .queryExecution.executedPlan
      val bhj = plan.collectFirst { case j: BroadcastHashJoinExec => j }
      assert(bhj.nonEmpty, s"probe must broadcast the query side:\n$plan")
      val corpusSide = bhj.get.children.find(
        _.exists(_.isInstanceOf[FileSourceScanExec])).get
      assert(corpusSide.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"corpus side must not shuffle:\n$corpusSide")
      val scan = corpusSide.collectFirst { case s: FileSourceScanExec => s }.get
      val buckets = scan.optionalBucketSet
      assert(buckets.nonEmpty, "probe scan lost its bucket info")
      val selected = buckets.get.cardinality()
      assert(selected < nlist && selected >= 1,
        s"expected a pruned bucket set, got $selected of $nlist")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("S4: incremental append lands in the frozen assignment; probe sees new vectors") {
    import graft.functions.VectorFunctions.nearestCentroids
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    spark.sql("DROP TABLE IF EXISTS ivf_append_index")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "ivf_append_index"))
    // build on part of the corpus, append the rest with the stored centroids
    val base = vecs.filter(col("vec_id") % 5 =!= 0)
    val late = vecs.filter(col("vec_id") % 5 === 0)
    val idx = IvfIndex.build(base, "vec_id", "embedding",
      nlist = 16, numBuckets = 16, table = "ivf_append_index")
    IvfIndex.append(idx, late, "vec_id", "embedding")
    assert(spark.table(idx.table).count() == vecs.count())
    assert(IvfIndex.listSizes(idx).agg(org.apache.spark.sql.functions.sum("n_vectors"))
      .head().getLong(0) == vecs.count())
    // appended rows carry exactly the assignment the frozen centroids give
    val expectedLate = late
      .select(col("vec_id").as("neighbor_id"),
        element_at(nearestCentroids(col("embedding"), idx.centroids, 1), 1).as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val storedLate = spark.table(idx.table)
      .filter(col("neighbor_id") % 5 === 0)
      .select(col("neighbor_id"), col("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(storedLate == expectedLate)
    // probing the appended index == probing a fresh in-memory assignment
    // of the FULL corpus with the same centroids (the probe must see the
    // appended vectors as first-class neighbors)
    val queries = vecs.filter(col("vec_id") < 2)
    val probed = IvfIndex.probe(idx, queries, "vec_id", "embedding", nprobe = 2, k = 5)
      .collect().toSet
    val freshIdx = IvfIndex.Handle("ivf_append_fresh", idx.centroids, 16)
    spark.sql("DROP TABLE IF EXISTS ivf_append_fresh")
    rm(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "ivf_append_fresh"))
    graft.sources.Bucketed.writeBucketed(
      vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
        .withColumn("list_id",
          element_at(nearestCentroids(col("c_vec"), idx.centroids, 1), 1)),
      "ivf_append_fresh", "list_id", 16)
    val reference = IvfIndex.probe(freshIdx, queries, "vec_id", "embedding", nprobe = 2, k = 5)
      .collect().toSet
    assert(probed == reference)
    spark.sql("DROP TABLE IF EXISTS ivf_append_index")
    spark.sql("DROP TABLE IF EXISTS ivf_append_fresh")
  }

  test("S4: compaction re-samples drifted centroids; counts preserved, skew trigger cleared, probe correct") {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    for (t <- Seq("ivf_compact_index", "ivf_compact_index_compact_staging")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rm(new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t))
    }
    // two tight clusters far apart; the index is BUILT on cluster A only,
    // so its frozen centroids all sit in A — then the stream appends a
    // larger cluster B, which piles into one A-list: the drift shape the
    // trigger exists to catch
    def jitter(i: Long): Double = 0.01 * (i % 7)
    val clusterA = (0L until 12L).map(i =>
      (i, Array(1.0, jitter(i), 0.0, 0.0)))
    val clusterB = (100L until 160L).map(i =>
      (i, Array(0.0, 0.0, 1.0, jitter(i))))
    val a = clusterA.toDF("vec_id", "embedding")
    val b = clusterB.toDF("vec_id", "embedding")
    val idx = IvfIndex.build(a, "vec_id", "embedding",
      nlist = 4, numBuckets = 8, table = "ivf_compact_index")
    assert(!IvfIndex.needsRebuild(idx, skewFactor = 3.0))
    IvfIndex.append(idx, b, "vec_id", "embedding")
    assert(IvfIndex.needsRebuild(idx, skewFactor = 3.0),
      "60 drifted vectors in one list over a mean of 18 must trip the trigger")

    val total = spark.table(idx.table).count()
    val idx2 = IvfIndex.compact(idx, nlist = 4)
    assert(spark.table(idx2.table).count() == total, "compaction must not lose vectors")
    assert(!IvfIndex.needsRebuild(idx2, skewFactor = 3.0),
      "re-sampled centroids must clear the skew trigger")
    // centroids actually changed: at least one now lives in cluster B
    assert(idx2.centroids.exists(c => c(2) > 0.5),
      s"no compacted centroid in cluster B: ${idx2.centroids.map(_.mkString("[", ",", "]")).mkString(" ")}")
    // a cluster-B query finds cluster-B neighbors through the new lists
    val q = Seq((999L, Array(0.0, 0.0, 1.0, 0.02))).toDF("vec_id", "embedding")
    val nn = IvfIndex.probe(idx2, q, "vec_id", "embedding", nprobe = 2, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(nn.nonEmpty && nn.forall(_ >= 100L), s"expected cluster-B neighbors, got $nn")
    // replay residue: the same rows appended twice dedup away
    IvfIndex.append(idx2, b.limit(5), "vec_id", "embedding")
    IvfIndex.append(idx2, b.limit(5), "vec_id", "embedding")
    assert(spark.table(idx2.table).count() == total + 10)
    val idx3 = IvfIndex.compact(idx2, nlist = 4)
    assert(spark.table(idx3.table).count() == total,
      "compaction must clear duplicate replay rows")
    // the rewritten table keeps its bucket spec (probe pruning depends on it)
    assert(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("ivf_compact_index"))
      .bucketSpec.nonEmpty, "compacted index lost its bucket spec")
    spark.sql("DROP TABLE IF EXISTS ivf_compact_index")
  }

  test("S5: k-means separates the planted clusters and is deterministic") {
    val vecs = clustered.toDF("vec_id", "embedding")
    val (cents, assigned) = Similarity.kmeans(vecs, "vec_id", "embedding",
      k = 2, iterations = 5)
    assert(cents.length == 2 && cents.forall(_.length == dim))
    val byCluster = assigned.as[(Long, Int)].collect().groupBy(_._2)
      .view.mapValues(_.map(_._1).toSet).toMap
    // the two planted clusters (ids 0-9 vs 10-19) must come out intact
    assert(byCluster.values.toSet == Set((0L until 10L).toSet, (10L until 20L).toSet),
      s"clusters not separated: $byCluster")
    // deterministic init + deterministic iterations → identical re-run
    val (cents2, _) = Similarity.kmeans(vecs, "vec_id", "embedding",
      k = 2, iterations = 5)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)
  }

  test("S3: IVF recall vs brute force is high on clustered data") {
    val vecs = clustered.toDF("vec_id", "embedding")
    val queries = col("vec_id") === 0 || col("vec_id") === 10
    val bf = Similarity.bruteForceTopK(
      vecs.filter(queries), vecs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      nlist = 4, nprobe = 2, k = 5, queryFilter = queries)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8")
  }
}
