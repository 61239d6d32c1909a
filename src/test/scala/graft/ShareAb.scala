package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ShareAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val q = graft.queries.SimilarityQueries
    val dir = "/root/testdata/sf0.1"
    val idx = java.nio.file.Files.createTempDirectory("ab_ivf").toString
    q.buildIvfIndex(spark, dir, idx)
    val base = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
    def batchOf(nDistinct: Int) = {
      val rows = (0 until 20000).map(i => (1000000L + i, base(i % nDistinct).getSeq[Float](1)))
      spark.createDataset(rows).toDF("vec_id", "embedding").cache()
    }
    val centRow = q.loadCentRow(spark, idx).cache(); centRow.count()
    def timed(tag: String)(f: => Long): Unit = {
      f; val t0 = System.nanoTime; val n = f
      println(f"TIME $tag ${(System.nanoTime - t0) / 1e9}%.2f rows=$n")
    }
    val b2000 = batchOf(base.length); b2000.count()
    val b16 = batchOf(16); b16.count()
    timed("cycled_shared")   { q.serveQueryBatch(spark, b2000, centRow, idx).count() }
    timed("cycled_unshared") { q.serveQueryBatch(spark, b2000, centRow, idx, shareResults = false).count() }
    timed("skew_shared")     { q.serveQueryBatch(spark, b16, centRow, idx).count() }
    timed("skew_unshared")   { q.serveQueryBatch(spark, b16, centRow, idx, shareResults = false).count() }
    spark.stop()
  }
}
