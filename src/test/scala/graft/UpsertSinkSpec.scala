package graft

import graft.streaming.UpsertSink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gate for the streaming CDC upsert sink: batch/stream parity on a
  * seeded changelog (the merged state must equal the whole-changelog
  * last-writer election — the `upsert_merge` invariant), idempotent
  * re-application of replayed batches, checkpoint restart, and the
  * copy-on-write contract (untouched buckets' files are not rewritten).
  */
class UpsertSinkSpec extends SparkSuite {

  private val Keys = Seq("user_id", "event_type")
  private val Versions = Seq("us", "event_id")
  private val Values = Seq("value")

  /** Seeded changelog wave: ~20 users × 3 types with deliberate
    * timestamp collisions (event_id must break ties deterministically)
    * and overlapping `us` ranges across waves (out-of-order arrival). */
  private def wave(n: Int, seed: Long, idBase: Long): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val types = Seq("click", "view", "buy")
    (0 until n).map { i =>
      (rnd.nextInt(20).toLong, types(rnd.nextInt(3)),
        1000L + rnd.nextInt(40), idBase + i, math.floor(rnd.nextDouble() * 1e6) / 1e6)
    }.toDF("user_id", "event_type", "us", "event_id", "value")
  }

  /** The whole-changelog election — the batch `upsert_merge` rule. */
  private def oracle(changelog: DataFrame): Set[String] =
    changelog.groupBy(Keys.map(col): _*)
      .agg(max(struct((Versions ++ Values).map(col): _*)).as("st"))
      .select(col("user_id"), col("event_type"),
        col("st.us"), col("st.event_id"), col("st.value"))
      .collect().map(_.toString).toSet

  private def stateOf(sink: UpsertSink): Set[String] =
    sink.state(spark).collect().map(_.toString).toSet

  test("merged state equals the whole-changelog election; replay is a no-op; restart continues") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val watch = s"$base/watch"; val table = s"$base/state"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(watch))
    val sink = new UpsertSink(table, Keys, Versions, Values, nBuckets = 8)
    val w1 = wave(300, seed = 1, idBase = 0)
    val w2 = wave(300, seed = 2, idBase = 1000)
    val w3 = wave(300, seed = 3, idBase = 2000)

    def land(df: DataFrame, name: String): Unit =
      df.repartition(1).write.parquet(s"$watch/$name")
    def stream() = sink.start(
      spark.readStream.schema(w1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$watch/*/"),
      ckpt, availableNow = true)

    // waves 1+2 as separate micro-batches
    land(w1, "w1"); land(w2, "w2")
    val q1 = stream(); q1.awaitTermination()
    assert(stateOf(sink) == oracle(w1.unionByName(w2)))

    // idempotence: re-applying an already-merged batch changes nothing
    sink.merge(w2, batchId = 999)
    assert(stateOf(sink) == oracle(w1.unionByName(w2)))

    // restart from the checkpoint picks up only the new wave
    land(w3, "w3")
    val q2 = stream(); q2.awaitTermination()
    assert(stateOf(sink) == oracle(w1.unionByName(w2).unionByName(w3)))

    // and the final state is ONE row per live key
    val st = sink.state(spark)
    assert(st.count() ==
      st.select(Keys.map(col): _*).distinct().count())
  }

  test("copy-on-write: a delta touching one bucket leaves every other bucket's files untouched") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_cow").toString
    val table = s"$base/state"
    val sink = new UpsertSink(table, Keys, Versions, Values, nBuckets = 8)
    sink.merge(wave(400, seed = 7, idBase = 0), 0L)

    def files(): Map[String, Set[String]] =
      new java.io.File(table).listFiles().filter(_.getName.startsWith("kb="))
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    val before = files()
    assert(before.size > 1, "fixture must populate several buckets")

    // a one-key delta: its bucket is rewritten, the rest must not be
    val delta = Seq((3L, "click", 99999L, 777L, 0.5))
      .toDF("user_id", "event_type", "us", "event_id", "value")
    val kb = delta.select(pmod(xxhash64(col("user_id"), col("event_type")), lit(8L)))
      .head().getLong(0)
    sink.merge(delta, 1L)
    val after = files()
    assert(after(s"kb=$kb") != before(s"kb=$kb"), "the touched bucket must be rewritten")
    (before.keySet - s"kb=$kb").foreach { d =>
      assert(after(d) == before(d), s"untouched bucket $d was rewritten")
    }
    // and the delta won its key
    val row = sink.state(spark)
      .filter(col("user_id") === 3L && col("event_type") === "click")
      .head()
    assert(row.getAs[Long]("us") == 99999L && row.getAs[Long]("event_id") == 777L)
  }

  test("pathological bucket count fails loudly before the driver-side collect") {
    import spark.implicits._
    val sink = new graft.streaming.UpsertSink(
      java.nio.file.Files.createTempDirectory("upsert_guard").toString,
      keyCols = Seq("user_id"), versionCols = Seq("us"), valueCols = Nil,
      nBuckets = graft.streaming.UpsertSink.MaxCollectableBuckets + 1)
    val e = intercept[IllegalArgumentException](
      sink.merge(Seq((1L, 2L)).toDF("user_id", "us"), 0L))
    assert(e.getMessage.contains("nBuckets"))
  }
}
