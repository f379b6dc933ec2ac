package graft

/** Proves the native shingle_md5 kernel is output-identical to the SQL-HOF
  * formulation it replaced in q102/q107 (which the DuckDB oracles still
  * describe), including consecutive-space empty words, trailing-empty Hive
  * split semantics, unicode, and short-input edges.
  */
class ShingleSpec extends SparkSpec {
  import spark.implicits._

  private def hofResult(texts: Seq[String], n: Int): Seq[Seq[String]] =
    texts.toDF("text")
      .selectExpr("split(trim(text), ' ') AS ws")
      .selectExpr(
        s"""CASE WHEN size(ws) >= $n THEN
              array_distinct(transform(sequence(1, size(ws) - ${n - 1}),
                i -> md5(concat_ws(' ', slice(ws, i, $n)))))
            ELSE array() END AS shs""")
      .collect().toSeq.map(_.getSeq[String](0))

  private def nativeResult(texts: Seq[String], n: Int): Seq[Seq[String]] =
    texts.toDF("text")
      .selectExpr(s"shingle_md5(trim(text), $n) AS shs")
      .collect().toSeq.map(_.getSeq[String](0))

  test("shingle_md5 equals the SQL-HOF formulation on varied inputs") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a b c d e f g h a b c d e f g h",      // repeated shingles → distinct
      "one  two   three four five six seven eight nine", // internal empties
      "  leading and trailing spaces padded out here too  ",
      "seven words only not quite enough here",  // exactly 7 < 8
      "exactly eight words fit here for one shingle",
      "",
      "único ünïcødé 汉字 слова mixed in the shingle stream ok",
      "x " * 20)                                 // trailing empties post-trim
    Seq(2, 8).foreach { n =>
      val hof = hofResult(texts, n)
      val nat = nativeResult(texts, n)
      hof.zip(nat).zip(texts).foreach { case ((h, g), t) =>
        assert(h == g, s"n=$n text='$t': hof=$h native=$g")
      }
    }
  }

  test("shingle_md5 drops trailing empty words like the Hive split") {
    // untrimmed input: the HOF path's split already dropped trailing
    // empties (session override), the kernel must agree
    val texts = Seq("a b c d e f g h   ", "a b ")
    assert(hofResult(texts, 8) == nativeResult(texts, 8))
  }

  test("null text yields an empty array (explode_outer-friendly)") {
    val r = spark.sql("SELECT shingle_md5(CAST(NULL AS string), 8) AS s").head()
    assert(r.getSeq[String](0).isEmpty)
  }

  test("shingle_md5_pos keeps every slot: element i = gram starting at word i") {
    // positional variant (q124): NO dedup, alignment with the HOF transform
    val texts = Seq(
      "a b c d e f g h a b c d e f g h", // repeats must keep both slots
      "one  two   three four five six seven eight nine",
      "seven words only not quite enough here", "")
    val hof = texts.toDF("text")
      .selectExpr("split(trim(text), ' ') AS ws")
      .selectExpr(
        """CASE WHEN size(ws) >= 8 THEN
             transform(sequence(1, size(ws) - 7),
               i -> md5(concat_ws(' ', slice(ws, i, 8))))
           ELSE array() END AS shs""")
      .collect().toSeq.map(_.getSeq[String](0))
    val nat = texts.toDF("text")
      .selectExpr("shingle_md5_pos(trim(text), 8) AS shs")
      .collect().toSeq.map(_.getSeq[String](0))
    hof.zip(nat).zip(texts).foreach { case ((h, g), t) =>
      assert(h == g, s"text='$t': hof=$h native=$g")
    }
    // the repeated-gram text really does repeat slots (dedup would collapse)
    assert(nat.head.length == 9 && nat.head.head == nat.head.last)
  }
}
