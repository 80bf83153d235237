package graft.operators

import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ARRAY<FLOAT>`).
  *
  * Two paths, as a production pipeline would have:
  *  - brute-force cosine top-k — the exact baseline; dot products via
  *    `zip_with` + `aggregate` higher-order functions (codegen'd, no UDF).
  *    O(n) per query, embarrassingly parallel, the right answer for one-off
  *    queries or re-ranking;
  *  - hyperplane-LSH bucketed ANN — the scale path: each vector gets a
  *    `nBits`-bit signature from deterministic pseudo-random hyperplanes;
  *    same-bucket vectors are candidates, exact cosine re-ranks them. At
  *    100 TB candidates come from a bucket join on the signature (a hash
  *    shuffle), never an all-pairs product. Multi-probe = multiple
  *    independent tables (`nTables`) unioned.
  *
  * Embedding cosine near-dup (pairs above a threshold) reuses the LSH
  * buckets: the same candidate-then-verify shape as MinHash dedup.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double —
    * higher-order-function form, kept for reference/one-off use; hot paths
    * use [[cosine]] (a tight-loop Catalyst expression: the HOF form is
    * interpreted per element and ~100× slower at 64 dims). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.graft.GraftBridge.expression(a),
        org.apache.spark.sql.graft.GraftBridge.expression(b)))

  /** `nBits`-bit LSH signature of an embedding for one hash table — a single
    * compact Catalyst expression ([[graft.functions.HyperplaneLsh]]); the
    * composed element_at/multiply form was a ~4000-node tree whose codegen
    * compilation dominated small queries. */
  def lshSignature(emb: Column, dim: Int, nBits: Int, table: Int): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      graft.functions.HyperplaneLsh(
        org.apache.spark.sql.graft.GraftBridge.expression(emb), dim, nBits, table))

  /** Exact brute-force cosine top-k neighbors of one query vector. */
  def bruteForceTopK(emb: DataFrame, idCol: String, embCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(embCol).as("qv"))
    val w = Window.orderBy(desc("sim"), col("id"))
    emb.select(col(idCol).as("id"), col(embCol).as("v"))
      .join(broadcast(q))
      .withColumn("sim", cosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"))
  }

  /** All `nTables` signatures in ONE projection + posexplode: a per-table
    * unionAll would rescan the source and re-plan nTables times. */
  private def withSignatures(base: DataFrame, dim: Int, nBits: Int,
      nTables: Int): DataFrame =
    base.select(col("id"), col("v"),
      posexplode(array((0 until nTables).map(t =>
        lshSignature(col("v"), dim, nBits, t)): _*)).as(Seq("tbl", "sig")))

  /** ANN top-k: LSH-bucket candidates (multi-table), exact re-rank. */
  def annTopK(emb: DataFrame, idCol: String, embCol: String, dim: Int,
      queryId: Long, k: Int, nBits: Int = 6, nTables: Int = 8): DataFrame = {
    val base = emb.select(col(idCol).as("id"), col(embCol).as("v"))
    val sigs = withSignatures(base, dim, nBits, nTables)
    val qsig = sigs.filter(col("id") === queryId)
      .select(col("tbl").as("qtbl"), col("sig").as("qsig"), col("v").as("qv"))
    val cand = sigs.join(broadcast(qsig),
        col("tbl") === col("qtbl") && col("sig") === col("qsig"))
      .select(col("id"), col("v"), col("qv")).distinct()
    val w = Window.orderBy(desc("sim"), col("id"))
    cand.withColumn("sim", cosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"))
  }

  /** IVF (inverted-file) ANN — the other standard scale path besides LSH.
    *
    * Build: a deterministic coarse quantizer of `nCentroids` centroids
    * (seeded by hash-selected vectors, refined with `iters` Lloyd steps, all
    * as DataFrame aggregations — no driver-side loops over data, only over
    * the centroid table, which is tiny by construction and broadcast).
    * Vectors are assigned to their nearest centroid: the inverted lists.
    * Query: probe the `nProbe` nearest centroids and re-rank exactly within
    * their lists. At 100 TB the inverted lists are just a partitioned table
    * keyed by centroid id; a probe reads nProbe/nCentroids of the data.
    */
  def ivfTopK(emb: DataFrame, idCol: String, embCol: String,
      queryId: Long, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      iters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    val base = emb.select(col(idCol).as("id"), col(embCol).as("v"))
    // deterministic seeds: the nCentroids vectors with smallest xxhash64(id)
    var centroids = base
      .withColumn("__h", xxhash64(col("id")))
      .orderBy("__h").limit(nCentroids)
      .select(monotonically_increasing_id().as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      // Lloyd step, shuffle-shaped: explode (cid, dim) cells, average per
      // cell (map-side partial), re-assemble vectors — never collects whole
      // vectors into one aggregation buffer
      centroids = base.join(broadcast(centroids))
        .withColumn("sim", cosine(col("v"), col("cv")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("id").orderBy(desc("sim"), col("cid"))))
        .filter(col("rn") === 1)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("mx"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s.getField("mx")).as("cv"))
    }
    val assigned = base.join(broadcast(centroids))
      .withColumn("sim", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(desc("sim"), col("cid"))))
      .filter(col("rn") === 1)
      .select(col("id"), col("v"), col("cid"))
    val qRow = assigned.filter(col("id") === queryId).select(col("v").as("qv"))
    val probed = centroids.join(broadcast(qRow))
      .withColumn("sim", cosine(col("cv"), col("qv")))
      .orderBy(desc("sim"), col("cid")).limit(nProbe)
      .select(col("cid"))
    val cand = assigned.join(broadcast(probed), "cid")
    val w = Window.orderBy(desc("sim"), col("id"))
    cand.join(broadcast(qRow))
      .withColumn("sim", cosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold, candidates from LSH. */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, embCol: String,
      dim: Int, threshold: Double, nBits: Int = 4, nTables: Int = 8): DataFrame = {
    val base = emb.select(col(idCol).as("id"), col(embCol).as("v"))
    val sigs = withSignatures(base, dim, nBits, nTables)
      .select(col("id"), col("tbl"), col("sig"))
    // dedup candidate ids FIRST, then rejoin vectors by id: arrays must not
    // ride through the distinct() shuffle (row size, comparator cost)
    val cand = sigs.as("x").join(sigs.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  // ---- declared queries ----

  /** Brute-force cosine top-10 for the vec_id=0 query vector. */
  def q50KnnBrute(spark: SparkSession, dir: String): DataFrame =
    bruteForceTopK(Tables.embeddings(spark, dir), "vec_id", "embedding", 0L, 10)
      .withColumnRenamed("id", "vec_id")
      .orderBy("rank")

  /** LSH ANN top-5 (approximate by design — rows-only gate; recall asserted
    * against brute force in SimilaritySpec). */
  def q51AnnLsh(spark: SparkSession, dir: String): DataFrame =
    annTopK(Tables.embeddings(spark, dir), "vec_id", "embedding", 64, 0L, 5)
      .withColumnRenamed("id", "vec_id")
      .orderBy("rank")

  /** IVF ANN top-5 (probe-then-rerank; rows-only gate, recall in spec). */
  def q53AnnIvf(spark: SparkSession, dir: String): DataFrame =
    ivfTopK(Tables.embeddings(spark, dir), "vec_id", "embedding", 0L, 5)
      .withColumnRenamed("id", "vec_id")
      .orderBy("rank")

  /** Embedding near-dup pairs above cosine 0.4 (the synthetic embeddings
    * have no true near-dups — max pairwise cosine ≈ 0.51 — so the threshold
    * is set where the data actually has signal; at scale it's a parameter). */
  def q52EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding", 64, 0.4)
      .select(col("id_a"), col("id_b"))
      .orderBy("id_a", "id_b")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_knn_brute" -> (q50KnnBrute _),
    "q51_ann_lsh" -> (q51AnnLsh _),
    "q52_embedding_near_dup" -> (q52EmbeddingNearDup _),
    "q53_ann_ivf" -> (q53AnnIvf _))

  val oracles: Map[String, String] = Map(
    "q50_knn_brute" ->
      """SELECT vec_id, rank FROM (
        |  SELECT e.vec_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY
        |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |        (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
        |      e.vec_id) AS BIGINT) AS rank
        |  FROM embeddings e) t
        |WHERE rank <= 10 ORDER BY rank""".stripMargin)
}
