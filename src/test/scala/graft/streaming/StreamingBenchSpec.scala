package graft.streaming

import graft.SparkSpec

class StreamingBenchSpec extends SparkSpec {
  test("streaming bench delivers every message and reports positive rates") {
    val r = StreamingBench.run(spark, nBatches = 10, perBatch = 500)
    assert(r.messages == 5000)
    assert(r.batches == 10)
    assert(r.publishMsgsPerSec > 0 && r.subscribeMsgsPerSec > 0)
  }
}
