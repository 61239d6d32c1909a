package graft.queries

import graft.functions.TextFunctions._
import graft.functions.VectorOps._
import graft.sources.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search + near-duplicate detection — the north-star LLM
  * pipeline operators over `embeddings` (ANN) and `documents`
  * (MinHash-LSH / n-gram Jaccard).
  *
  * Scale design (100 TB): NOTHING here is an all-pairs cross join over the
  * corpus. The brute-force path broadcasts only the (small) query set; the
  * ANN path is IVF — a broadcast join against k centroids, then a shuffle
  * join on bucket id; LSH candidates come from a band-signature equijoin;
  * Jaccard runs only on pruned candidate pairs. Every shuffle key is a
  * compact id/signature, never a document body or raw vector.
  */
object SimilarityQueries {

  /** Number of top results per query vector. */
  private val K = 5

  /** Brute-force cosine top-k — the exact baseline. The query set
    * (`vec_id < 10`) is broadcast; the corpus streams past it, so the scan
    * side scales out and the per-query top-k is a keyed window over a
    * 10-partition shuffle. */
  def knnCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      .filter(col("qid") < 10)
    val scored = e
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine(col("qemb"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("qid"), col("vec_id").as("vid"), col("cos"))
  }

  /** IVF bucket assignment: every vector → nearest of the deterministic
    * centroid subset (`vec_id % 50 == 0`, so k grows with the corpus).
    * Broadcast join against k centroids + per-vector argmax — the
    * classic scale shape for ANN indexing. */
  private def ivfAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cent = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid").asc)
    e.join(broadcast(cent))
      .withColumn("ccos", cosine(col("embedding"), col("cemb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("bucket"))
  }

  /** IVF-bucketed approximate top-k: each query searches only its own
    * centroid's bucket (nprobe=1). The candidate join is an equijoin on
    * bucket id — at 100 TB this is the path that replaces the brute-force
    * scan; recall trades off via nprobe, not correctness of the plumbing. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val assigned = ivfAssign(spark, dir)
    val q = assigned
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"), col("bucket").as("qbucket"))
    val cand = assigned
      .select(col("vec_id").as("vid"), col("embedding").as("cemb2"), col("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
    q.join(cand, col("qbucket") === col("bucket") && col("qid") =!= col("vid"))
      .withColumn("cos", cosine(col("qemb"), col("cemb2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vid"), col("cos"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ 0.3 within an IVF bucket,
    * a<b. Bucketing bounds the pair space (Σ bucket² ≪ N²). */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val assigned = ivfAssign(spark, dir)
    val a = assigned.select(col("vec_id").as("va"), col("embedding").as("ea"), col("bucket"))
    val b = assigned.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("va") < col("vb"))
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .filter(col("cos") >= 0.3)
      .select(col("va"), col("vb"), col("cos"))
  }

  /** Word 3-gram shingles of the normalized text (docs shorter than 3
    * tokens contribute none). */
  private def shingles(text: org.apache.spark.sql.Column) = {
    val ws = wordTokens(text)
    when(size(ws) >= 3,
      transform(
        sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))
      )
    ).otherwise(array())
  }

  /** MinHash-LSH near-dup candidates: 12 md5-derived minhashes per doc
    * (lexicographic min of seed-prefixed md5 hex — portable across
    * engines), banded 4×3; docs sharing any band signature pair up.
    * The only join is the band-signature equijoin — LSH's whole point at
    * scale. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(shingles(col("text"))).as("sh"))
    val seeded = docs
      .select(col("doc_id"), col("sh"), explode(sequence(lit(0), lit(11))).as("seed"))
      .withColumn("h", md5(concat(col("seed").cast("string"), lit("|"), col("sh"))))
    val minhashes = seeded
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(col("h")).as("mh"))
    val bands = minhashes
      .withColumn("band", (col("seed") / 3).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(
        md5(array_join(
          transform(array_sort(collect_list(struct(col("seed"), col("mh")))), x => x("mh")),
          ""
        )).as("sig")
      )
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band").as("band_b"), col("sig").as("sig_b"))
    a.join(b, col("band") === col("band_b") && col("sig") === col("sig_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard over pruned candidate pairs: same (lang, source)
    * bucket and |Δ n_chars| ≤ 50 — a similarity-preserving prune that
    * keeps the pair space linear-ish. Jaccard is |∩|/|∪| of distinct
    * shingle sets, exact integer counts through double division. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        array_distinct(shingles(col("text"))).as("shs")
      )
    val a = docs.select(
      col("doc_id").as("doc_a"), col("lang"), col("source"),
      col("n_chars").as("nc_a"), col("shs").as("shs_a"))
    val b = docs.select(
      col("doc_id").as("doc_b"), col("lang").as("lang_b"), col("source").as("source_b"),
      col("n_chars").as("nc_b"), col("shs").as("shs_b"))
    a.join(b,
        col("lang") === col("lang_b") && col("source") === col("source_b") &&
          col("doc_a") < col("doc_b") &&
          abs(col("nc_a") - col("nc_b")) <= 50)
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("na", size(col("shs_a")).cast("long"))
      .withColumn("nb", size(col("shs_b")).cast("long"))
      .withColumn(
        "jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double")
      )
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }
}
