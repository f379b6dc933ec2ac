package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench JSON line contract (no SparkSession needed — renderJson is pure).
  * The driver tail-parses the stdout line and archives target/bench.json;
  * ADVICE r8: a SPARK_GRAFT_BENCH_ONLY subset run must be marked so a
  * partial file can never read as a full-suite result.
  */
class BenchJsonSpec extends AnyFunSuite {

  private val results = Seq("q01_agg" -> 0.5, "q64b_tfidf" -> 1.25, "q99_lm" -> -1.0)
  private def render(subset: Boolean) =
    Bench.renderJson(results, 1.75, 1.75, 0.0, Seq("\"q99_lm\""),
      "/sf", subset, identity, _.toString)

  test("subset runs carry the subset marker; full runs don't") {
    assert(render(subset = true).contains("\"subset\":true,"))
    assert(!render(subset = false).contains("subset"))
  }

  test("line stays machine-parseable with and without the marker") {
    for (s <- Seq(true, false)) {
      val line = render(s)
      assert(line.startsWith("{\"metric\":\"total\","))
      assert(line.contains("\"n_failed\":1") && line.contains("\"failed\":[\"q99_lm\"]"))
      assert(line.contains("\"queries\":{\"q01_agg\":0.5,\"q64b_tfidf\":1.25,\"q99_lm\":-1.0}"))
      assert(line.endsWith("\"sf\":\"/sf\"}"))
    }
  }

  test("prefix-colliding short keys fall back to full names") {
    val collide = Seq("q01_agg" -> 0.5, "q01_other" -> 0.25)
    val line = Bench.renderJson(collide, 0.75, 0.75, 0.0, Nil, "/sf",
      subset = false, _.split("_")(0), _.toString)
    assert(line.contains("\"q01_agg\":0.5") && line.contains("\"q01_other\":0.25"))
  }
}
