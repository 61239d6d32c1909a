package graft

import graft.fixtures.LogGen
import graft.functions.LogParse

import org.apache.spark.sql.Row
import org.scalacheck.Gen

/** Parser unit + property tests (SURVEY §5.1/§5.3): exact wire format,
  * FIXTURES.md edge cases, the three reference bugs fixed by construction,
  * totality on arbitrary line soup. */
class LogParseSpec extends SparkSuite {
  import spark.implicits._

  private def parseOne(raw: String): Row =
    LogParse.parse(Seq(raw).toDF("raw"), "raw")
      .select("time", "latency", "operation", "callerservice", "awsaccountid", "dimensions")
      .collect()(0)

  test("canonical generator record parses exactly") {
    val raw = LogGen.record("GetTable", 374372762964L, "GLUE", "178.715432", 1621980525000L)
    val r = parseOne(raw)
    assert(r.getLong(0) == 1621980525000L)
    assert(r.getDouble(1) == 178.715432)
    assert(r.getString(2) == "gettable")   // lowercased like the reference
    assert(r.getString(3) == "glue")
    assert(r.getString(4) == "374372762964")
    assert(r.getMap[String, String](5).toMap ==
      Map("operation" -> "gettable", "callerservice" -> "glue", "awsaccountid" -> "374372762964"))
  }

  test("missing EndTime → null time; missing Time → null latency") {
    val noEnd = parseOne("Operation=GetTable\nTime=1.5 ms\nEOE")
    assert(noEnd.isNullAt(0) && noEnd.getDouble(1) == 1.5)
    val noTime = parseOne("Operation=GetTable\nEndTime=1000\nEOE")
    assert(noTime.getLong(0) == 1000L && noTime.isNullAt(1))
  }

  test("unknown keys dropped; value containing '=' survives first-= split") {
    val r = parseOne("Weird=a=b\nOperation=x\nHttpStatusCode=200\nEndTime=5")
    assert(r.getMap[String, String](5).toMap == Map("operation" -> "x"))
    assert(r.getLong(0) == 5L)
  }

  test("duplicate keys: last write wins (reference map-put semantics)") {
    val r = parseOne("Operation=first\nOperation=second\nEndTime=1")
    assert(r.getString(2) == "second")
  }

  test("no cross-record state leak (reference bug §2.2.1)") {
    // record A has callerservice; record B does not — B must NOT inherit it
    val df = Seq(
      "CallerService=GLUE\nEndTime=1",
      "Operation=x\nEndTime=2"
    ).toDF("raw")
    val rows = LogParse.parse(df, "raw")
      .select("time", "callerservice").orderBy("time").collect()
    assert(rows(0).getString(1) == "glue")
    assert(rows(1).isNullAt(1))
  }

  test("non-numeric residue in Time / EndTime nulls out, never throws (ANSI)") {
    val r = parseOne("Time=no digits here ms\nEndTime=abc")
    assert(r.isNullAt(0) && r.isNullAt(1))
    val r2 = parseOne("Time=1.2.3 ms\nEndTime=9")
    assert(r2.isNullAt(1) && r2.getLong(0) == 9L)
  }

  test("model schema constant matches the typed Dataset's encoder schema") {
    val encoded = org.apache.spark.sql.Encoders.product[graft.model.TimestreamPoint]
      .schema.fields.map(f => (f.name, f.dataType)).toSeq
    val declared = graft.model.TimestreamPoint.schema
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(encoded == declared)
  }

  test("typed path: parse to Dataset[TimestreamPoint] with POJO-default time") {
    val ds = LogParse.parseTyped(Seq(
      LogGen.record("GetTable", 42L, "S3", "1.5", 777L),
      "Operation=x\nEOE" // no EndTime: reference POJO long default = 0
    ).toDF("raw"), "raw")
    val pts = ds.collect().sortBy(_.time)
    assert(pts(0).time == 0L && pts(0).dimensions == Map("operation" -> "x"))
    assert(pts(1).time == 777L && pts(1).measureValue == "1.5" &&
      pts(1).measureValueType == "DOUBLE" && pts(1).timeUnit == "MILLISECONDS")
  }

  test("differential: engine parser matches an independent plain-Scala parser") {
    // obviously-correct reference implementation of the documented
    // semantics: lowercase, split lines, first-= split, last-write-wins,
    // whitelist, " ms" strip, null on non-numeric (no per-line trim —
    // matching the Flink original, which never trimmed either)
    def refParse(raw: String): (Option[Long], Option[Double], Map[String, String]) = {
      val kv = raw.toLowerCase.split("\n", -1).toSeq
        .filter(_.contains("="))
        .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
        .toMap // toMap keeps the LAST occurrence per key
      val time = kv.get("endtime").flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      val lat = kv.get("time")
        .map(_.replaceAll("[^0-9.]", ""))
        .filter(_.nonEmpty)
        .flatMap(v => scala.util.Try(v.toDouble).toOption)
      val dims = kv.view.filterKeys(Set("callerservice", "operation", "awsaccountid")).toMap
      (time, lat, dims)
    }
    val rng = new scala.util.Random(99L)
    val base = LogGen.records(n = 200, seed = 5L, percentLate = 10, lateSeconds = 60)
    // mutate: drop a random line / duplicate a line / inject junk
    val mutated = base.map { r =>
      val lines = r.split("\n").toBuffer
      rng.nextInt(4) match {
        case 0 => lines.remove(rng.nextInt(lines.size))
        case 1 => lines.insert(rng.nextInt(lines.size), lines(rng.nextInt(lines.size)))
        case 2 => lines.insert(rng.nextInt(lines.size), "garbage = = weird == text")
        case _ =>
      }
      lines.mkString("\n")
    }
    val all = base ++ mutated
    val got = LogParse.parse(all.toDF("raw"), "raw")
      .select("raw", "time", "latency", "dimensions").collect()
      .map(r => (r.getString(0),
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
         if (r.isNullAt(2)) None else Some(r.getDouble(2)),
         r.getMap[String, String](3).toMap))).toMap
    all.foreach { raw =>
      assert(got(raw) == refParse(raw), s"mismatch on record:\n$raw")
    }
  }

  test("property: parser is total on arbitrary line soup (100 seeded samples)") {
    val lineGen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.alphaNumStr.map(s => s"$s=$s"),
      Gen.const("Time=1.0 ms"),
      Gen.const("EndTime=123"),
      Gen.const(""),
      Gen.asciiPrintableStr
    )
    val recGen = Gen.listOfN(6, lineGen).map(_.mkString("\n"))
    val recs: List[String] = (0 until 100).flatMap { i =>
      recGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L + i))
    }.toList
    val out = LogParse.parse(recs.toDF("raw"), "raw")
      .select("time", "latency", "dimensions").collect()
    assert(out.length == recs.length) // never throws, 1 row in → 1 row out
  }
}
