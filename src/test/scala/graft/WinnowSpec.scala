package graft

import org.apache.spark.sql.Row

/** Proves the native winnow_mins kernel is output-identical to the SQL-HOF
  * formulation it replaced in q63 (which the DuckDB oracle still describes),
  * including unicode and short-input edges.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def hofResult(texts: Seq[String]): Seq[(Int, Seq[String])] =
    texts.toDF("text")
      .selectExpr(
        """CASE WHEN length(text) >= 5 THEN
             transform(sequence(1, length(text) - 4),
               i -> substr(md5(substring(text, i, 5)), 1, 8))
           ELSE array() END AS hs""")
      .selectExpr("size(hs) AS n_kgrams",
        """CASE WHEN size(hs) >= 4 THEN
             array_sort(array_distinct(transform(sequence(1, size(hs) - 3),
               j -> array_min(slice(hs, j, 4)))))
           ELSE array() END AS mins""")
      .collect().toSeq
      .map(r => (r.getInt(0), r.getSeq[String](1)))

  private def nativeResult(texts: Seq[String]): Seq[(Int, Seq[String])] =
    texts.toDF("text")
      .selectExpr("winnow_mins(text, 5, 4) AS wm")
      .collect().toSeq
      .map { r =>
        val s = r.getStruct(0)
        (s.getInt(0), s.getSeq[String](1))
      }

  test("winnow_mins equals the SQL-HOF formulation on varied inputs") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running",
      "aaaaaaaaaaaaaaaa",            // degenerate: identical grams
      "abcdefg",                     // just over gram length
      "abcd",                        // under gram length -> empty
      "abcdefgh",                    // grams but fewer than one window
      "",                            // empty
      "héllo wörld ünïcode text ✓ with multi-byte characters inside it",
      "line one\nline two\ttabbed and  double-spaced")
    assert(nativeResult(texts) == hofResult(texts))
  }

  test("winnow_mins handles null input as the empty fingerprint") {
    val r = Seq[Option[String]](None).toDF("text")
      .selectExpr("winnow_mins(text, 5, 4) AS wm").head().getStruct(0)
    assert(r.getInt(0) == 0 && r.getSeq[String](1).isEmpty)
  }

  test("queries run on a fresh newSession (registrations self-heal)") {
    // a user calling spark.newSession() loses session-registered UDAFs;
    // the t() path re-registers idempotently so every query still runs
    val fresh = spark.newSession()
    val df = SparkEntry.queries("q40_ngrams")(fresh, sfDir)
    assert(df.collect().nonEmpty)
    val Row(h: Int) = fresh.sql("SELECT hash('abc')").head()
    assert(h == "abc".hashCode, "hash must stay Hive-named on new sessions")
  }
}
