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

  test("prior parse handles both a raw bench line and the driver's escaped tail archive") {
    val raw = """{"metric":"total","value":1.0,"unit":"sec","queries":{"q01":0.5,"q86":4.26},"sf":"/x"}"""
    assert(Bench.parsePriorQueries(raw) === Map("q01" -> 0.5, "q86" -> 4.26))
    // BENCH_r{N}.json: the stdout line lives string-escaped (and possibly
    // head-truncated) inside "tail"
    val archive = """{"n":8,"tail":":72.0,\"queries\":{\"q01\":0.675,\"q64b\":0.688,\"q99\":-1.000},\"sf\":\"/x\"}","parsed":null}"""
    assert(Bench.parsePriorQueries(archive) ===
      Map("q01" -> 0.675, "q64b" -> 0.688, "q99" -> -1.0))
    assert(Bench.parsePriorQueries("no queries here") === Map.empty)
  }

  test("contention deltas: short-key match, 1.5x thresholds, failed runs excluded") {
    val prior = Map("q01" -> 1.0, "q02" -> 1.0, "q03" -> 1.0, "q04" -> 1.0,
      "q05" -> -1.0, "q07" -> 1.0)
    val cur = Seq("q01_agg" -> 2.0, "q02_filter" -> 0.5, "q03_join" -> 1.1,
      "q04_broadcast" -> -1.0, // failed now: excluded
      "q05_multijoin" -> 1.0,  // failed in prior: excluded
      "q06_left" -> 1.0,       // no prior entry: excluded
      "q07_right" -> 1.6)
    val (up, down) = Bench.contentionDeltas(cur, prior)
    assert(up === Seq("q01", "q07") && down === Seq("q02"))
  }

  test("contention fragment: two-sided scatter flags, one-sided doesn't; detail gates lists") {
    val flagged = Bench.contentionJson("BENCH_r08.json",
      Seq("q01", "q02", "q03"), Seq("q04", "q05", "q06"), detail = true)
    assert(flagged.contains("\"suspect_contention\":true"), flagged)
    assert(flagged.contains("\"up_queries\":[\"q01\",\"q02\",\"q03\"]"), flagged)
    val oneSided = Bench.contentionJson("BENCH_r08.json",
      Seq("q01", "q02", "q03", "q04"), Nil, detail = false)
    assert(oneSided.contains("\"suspect_contention\":false"), oneSided)
    assert(!oneSided.contains("up_queries"), oneSided)
    // the fragment composes into a parseable line
    val line = Bench.renderJson(results, 1.75, 1.75, 0.0, Nil, "/sf",
      subset = false, identity, _.toString, extra = oneSided)
    assert(line.startsWith("{\"metric\":\"total\",\"contention_check\":{\"prior\":\"BENCH_r08.json\""))
  }
}
