package graft

import graft.config.AppConfig

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("defaults match the reference's operational constants") {
    val c = AppConfig()
    assert(c.pollIntervalMs == 1000L)      // StreamingJob.java:90-91
    assert(c.maxRecordsPerPoll == 10000)   // StreamingJob.java:93-94
    assert(c.sinkBatchSize == 50)          // StreamingJob.java:174
    assert(c.windowSeconds == 10 && c.latenessSeconds == 5)
    assert(c.memoryStoreRetentionHours == 24L && c.magneticStoreRetentionDays == 7L)
  }

  test("CLI args override properties override defaults") {
    val c = AppConfig.load(
      Array("--Region", "eu-west-1", "--TimestreamIngestBatchSize", "75"),
      props = Map("Region" -> "us-west-2", "InputStreamName" -> "propstream")
    )
    assert(c.region == "eu-west-1")        // CLI wins
    assert(c.streamName == "propstream")   // property wins over default
    assert(c.sinkBatchSize == 75)
  }

  test("unknown keys are ignored; malformed args are rejected loudly") {
    // unknown --key value pairs are tolerated (reference ParameterTool
    // semantics) ...
    assert(AppConfig.load(Array("--nonsense", "x")) == AppConfig())
    // ... but a stray positional token or a valueless flag is an error —
    // the old 2-by-2 pairing silently mis-bound everything after one
    intercept[IllegalArgumentException] {
      AppConfig.load(Array("--nonsense", "x", "dangling"))
    }
    intercept[IllegalArgumentException] {
      AppConfig.load(Array("--flagOnly", "--Region", "eu-west-1"))
    }
    intercept[IllegalArgumentException] {
      AppConfig.load(Array("positional", "--Region", "eu-west-1"))
    }
  }
}
