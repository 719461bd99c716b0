package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench→driver handoff contract that has now broken twice
  * (BENCH_r01 and BENCH_r03 "parsed": null): the driver keeps only a bounded
  * tail of stdout, so the LAST printed line must be O(1) bytes regardless of
  * how many queries are registered. [[Bench.tailLine]] is that line; this
  * spec simulates the driver side — a 3 KB tail window over realistic sbt
  * output — and requires a complete, parseable metric line inside it.
  */
class BenchTailSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def line(nQueries: Int): String =
    Bench.tailLine(total = 12345.678, nQueries = nQueries, nErrors = 3,
      mergeMs = 722.123, insertMs = 221.456, amortMergeMs = 12.789,
      amortInsertMs = 3.234, sfDir = "/root/testdata/sf0.1")

  test("tail line size is independent of the query count and well under a 3 KB window") {
    val sizes = Seq(1, 68, 500, 10000).map(n => line(n).length)
    // n_queries renders as digits — the only per-count variation allowed
    assert(sizes.max - sizes.min <= 4, s"sizes varied with query count: $sizes")
    assert(sizes.max < 512, s"tail line too long: ${sizes.max} bytes")
  }

  test("tail line is valid JSON with the driver-contract fields") {
    val node = mapper.readTree(line(68))
    assert(node.get("metric").asText() == "total")
    assert(math.abs(node.get("value").asDouble() - 12345.678) < 1e-9)
    assert(node.get("unit").asText() == "sec")
    assert(node.get("sf").asText() == "/root/testdata/sf0.1")
    assert(node.get("detail").asText() == "bench.json")
    assert(node.get("n_queries").asInt() == 68)
    assert(node.get("n_errors").asInt() == 3)
    assert(node.get("upsert_merge_ms_per_10k_batch").asDouble() > 0)
    assert(node.get("insert_ms_per_10k_batch").asDouble() > 0)
  }

  test("a simulated 3 KB stdout tail still contains one complete parseable metric line") {
    // realistic stdout: log noise, the FULL line (which grows with query
    // count — here padded past 3 KB to reproduce the r3 failure mode), more
    // noise, then the tail line and sbt's epilogue
    val fullLine = "{\"metric\":\"total\",\"value\":12345.678,\"unit\":\"sec\",\"queries\":{" +
      (1 to 200).map(i => s""""q${"%03d".format(i)}_some_query_name":1.234""").mkString(",") +
      "}}"
    assert(fullLine.length > 3000, "test fixture must exceed the tail window")
    val stdout = Seq(
      "[info] running graft.Bench",
      "26/08/12 18:00:00 WARN SparkContext: ...",
      fullLine,
      "26/08/12 18:05:00 WARN SparkSession: stopping",
      line(200),
      "[success] Total time: 300 s",
      ""
    ).mkString("\n")

    val tail = stdout.takeRight(3000) // the driver's bounded window
    val metricLines = tail.linesIterator.filter(_.startsWith("{\"metric\"")).toSeq
    assert(metricLines.nonEmpty, "no complete metric line inside the 3 KB tail")
    val node = mapper.readTree(metricLines.last) // throws if truncated/invalid
    assert(node.get("metric").asText() == "total")
    assert(node.get("detail").asText() == "bench.json")
  }
}
