package graft

import org.apache.spark.sql.SparkSession

/** Quiet in-JVM A/B for the multi-query lexical serve path: MaxScore
  * pruning on vs off, at the fixture index and (when the sf1 slice
  * exists) the 10× standing index. Run with
  * `sbt "Test/runMain graft.LexAb"`. */
object LexAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val lq = graft.queries.LexQueries
    val terms = lq.QueryTerms
    val subsets = (1 until (1 << terms.size)).map(m =>
      terms.zipWithIndex.collect { case (t, i) if ((m >> i) & 1) == 1 => t }
        .mkString(" "))
    val queries = spark.createDataset(
        (0 until 20000).map(i => (5000000L + i, subsets(i % subsets.size))))
      .toDF("qid", "text").cache()
    queries.count()
    def stage(dir: String, tag: String): Unit = {
      val idx = java.nio.file.Files.createTempDirectory(s"lexab_$tag").toString
      lq.buildLexIndex(spark, dir, idx)
      val stats = lq.loadStats(spark, idx).cache(); stats.count()
      def timed(t2: String)(f: => Long): Unit = {
        f; val t0 = System.nanoTime; val n = f
        println(f"TIME $tag/$t2 ${(System.nanoTime - t0) / 1e9}%.2f rows=$n")
      }
      timed("pruned")   { lq.queryBatch(spark, queries, idx, stats,
        maxscorePrune = Some(true)).count() }
      timed("unpruned") { lq.queryBatch(spark, queries, idx, stats,
        maxscorePrune = Some(false)).count() }
      timed("auto")     { lq.queryBatch(spark, queries, idx, stats).count() }
      stats.unpersist(); ()
    }
    stage("/root/testdata/sf0.1", "1x")
    if (new java.io.File("/tmp/testdata_sf1/documents.parquet").exists())
      stage("/tmp/testdata_sf1", "10x")
    spark.stop()
  }
}
