package graft

import graft.expressions.DeflateSize
import graft.functions.TextFunctions.deflateSize
import graft.queries.TextQueries
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Gate for the no-oracle compressibility surface: the native
  * [[DeflateSize]] kernel and the `compress_ratio` profile built on it.
  * DEFLATE has no DuckDB counterpart, so the properties the oracle would
  * have pinned are proven here instead: separation between constructed
  * repetitive and incompressible inputs, interpreted-vs-codegen
  * equality, JDK round-trip consistency, and run-to-run determinism of
  * the full query. */
class CompressRatioSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("DeflateSize: separation, JDK round-trip, null, and eval parity") {
    import spark.implicits._
    val repetitive = "the same line over and over. " * 200
    val seeded = new scala.util.Random(42)
    val noisy = Seq.fill(5800)(seeded.nextPrintableChar()).mkString
    val df = Seq(("rep", repetitive), ("noise", noisy)).toDF("k", "t")
      .select(col("k"), octet_length(col("t")).cast("long").as("n"),
        deflateSize(col("t")).as("d"))
    val rows = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (repN, repD) = rows("rep")
    val (noiN, noiD) = rows("noise")
    // a 200x-repeated line compresses below 2%; printable noise stays
    // above 75% — the separation the quality signal exists for
    assert(repD.toDouble / repN < 0.02, s"repetitive ratio ${repD.toDouble / repN}")
    assert(noiD.toDouble / noiN > 0.75, s"noisy ratio ${noiD.toDouble / noiN}")
    // the reported size IS a real DEFLATE stream's size: re-inflate the
    // same pinned-settings compression and compare
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(repetitive.getBytes("UTF-8")); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    assert(out.size().toLong == repD)
    // interpreted eval matches the codegen'd path the DataFrame ran
    assert(DeflateSize(org.apache.spark.sql.catalyst.expressions.Literal(
      UTF8String.fromString("abc"),
      org.apache.spark.sql.types.StringType)).eval(null) ==
      DeflateSize.deflatedLength(UTF8String.fromString("abc")))
    // null in, null out (UnaryExpression nullSafeEval contract)
    assert(Seq[Option[String]](None).toDF("t")
      .select(deflateSize(col("t"))).collect().head.isNullAt(0))
  }

  test("DeflateSize equals java.util.zip.Deflater across payload classes (property sweep)") {
    // the oracle this surface can't have: DuckDB ships no DEFLATE, so
    // cross-implementation equality against the JDK's reference
    // implementation (same pinned settings: level 6, zlib wrapper)
    // stands in for the hash compare — across every payload class the
    // corpus can contain, not one hand-picked string
    def jdkDeflated(s: String): Long = {
      val d = new java.util.zip.Deflater(6, false)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.size().toLong
    }
    val seeded = new scala.util.Random(7)
    val classes: Seq[(String, String)] = Seq(
      "empty" -> "",
      "single" -> "x",
      "short-ascii" -> "hello, deflate",
      "repetitive" -> ("na" * 5000),
      "line-repetitive" -> ("the same line over and over. " * 333),
      "random-printable" -> Seq.fill(7000)(seeded.nextPrintableChar()).mkString,
      "random-alnum" -> seeded.alphanumeric.take(6000).mkString,
      "cjk" -> ("深度学习语料清洗引擎" * 400),
      "emoji-mixed" -> ("data 🚀 pipeline 🧪 " * 250),
      "whitespace" -> (" \t\n" * 2000),
      "json-ish" -> Seq.tabulate(300)(i => s"""{"k$i":$i,"v":"${i * 37}"}""").mkString(","),
      "binaryish-escapes" -> Seq.tabulate(3000)(i => (i % 256).toChar).mkString
    )
    classes.foreach { case (name, payload) =>
      val got = graft.expressions.DeflateSize.deflatedLength(
        UTF8String.fromString(payload))
      val want = jdkDeflated(payload)
      assert(got == want, s"payload class '$name': engine $got vs JDK $want")
    }
    // and through the full expression path (codegen) in one frame
    import spark.implicits._
    val df = classes.toDF("k", "t").select(col("k"), deflateSize(col("t")).as("d"))
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    classes.foreach { case (name, payload) =>
      assert(rows(name) == jdkDeflated(payload), s"codegen path diverged on '$name'")
    }
  }

  test("ncd_neardup: NCD separates true near-dups from low-overlap candidates") {
    val ncd = TextQueries.ncdNearDup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("ncd"))
      .toMap
    assert(ncd.nonEmpty)
    ncd.values.foreach(v => assert(v >= 0.0 && v <= 1.1, s"ncd out of range: $v"))
    val jac = graft.queries.SimilarityQueries.ngramJaccard(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(ncd.keySet == jac.keySet) // same LSH candidate set, re-ranked twice
    val hi = jac.collect { case (k, j) if j >= 0.8 => ncd(k) }
    val lo = jac.collect { case (k, j) if j <= 0.2 => ncd(k) }
    if (hi.nonEmpty && lo.nonEmpty) {
      // the compressor sees the shared information shingles see — and a
      // true near-dup pair compresses jointly far below unrelated text
      assert(hi.max < lo.min,
        s"NCD failed to separate: dup max ${hi.max} vs unrelated min ${lo.min}")
    } else assert(hi.nonEmpty || lo.nonEmpty)
  }

  test("compress_ratio: bins tile the corpus and the profile is deterministic") {
    val a = TextQueries.compressRatio(spark, dir).collect()
    val b = TextQueries.compressRatio(spark, dir).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    val nDocs = graft.sources.Tables.documents(spark, dir)
      .where(octet_length(col("text")) > 0).count()
    assert(a.map(_.getAs[Long]("n_docs")).sum == nDocs)
    a.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin <= 15)
      assert(r.getAs[Long]("deflate_bytes") > 0)
      val (lo, hi) = (r.getAs[Double]("min_ratio"), r.getAs[Double]("max_ratio"))
      assert(lo <= hi)
      // bin edges hold (top bin clamps)
      if (bin < 15) assert(math.floor(lo * 10).toLong == bin && math.floor(hi * 10).toLong == bin)
      else assert(lo >= 1.5)
    }
  }
}
