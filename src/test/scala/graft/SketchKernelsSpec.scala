package graft

/** Bit-equality proofs for the native sketch kernels against the SQL-HOF
  * formulations they replaced (q52/q121 minhash_sig, q53/q122 simhash32).
  * The HOF expressions here are verbatim the pre-kernel operator bodies —
  * if a kernel drifts from them by one bit, the hash joins built on the
  * signatures change shape and the DuckDB oracles break silently, so this
  * equality IS the oracle-compatibility argument.
  */
class SketchKernelsSpec extends SparkSpec {

  private val h32 = (e: String) =>
    s"cast(conv(substr(md5($e), 1, 8), 16, 10) AS bigint)"

  private val minhashHof =
    s"""transform(sequence(0, 15),
          i -> array_min(transform(words,
                 w -> ${h32("concat(cast(i AS string), ':', w)")})))"""

  private val simhashHof =
    s"""aggregate(
          zip_with(
            aggregate(
              transform(words, x -> ${h32("x")}),
              array_repeat(0, 32),
              (acc, h) -> zip_with(acc, sequence(0, 31),
                            (a, b) -> a + if((shiftright(h, b) & 1) = 1, 1, -1))),
            sequence(0, 31),
            (s2, b) -> if(s2 > 0, shiftleft(cast(1 AS bigint), b), cast(0 AS bigint))),
          cast(0 AS bigint), (acc, x) -> acc + x)"""

  test("minhash_sig equals the HOF chain on fixture documents") {
    Tables.registerAll(spark, sfDir)
    val diff = spark.sql(
      s"""SELECT doc_id FROM (
            SELECT doc_id,
                   minhash_sig(words, 16) AS k, $minhashHof AS h FROM (
              SELECT doc_id, array_distinct(split(lower(text), ' ')) AS words
              FROM documents))
          WHERE NOT (k <=> h)""").count()
    assert(diff === 0, s"$diff documents with kernel != HOF minhash")
  }

  test("simhash32 equals the HOF chain on fixture documents") {
    Tables.registerAll(spark, sfDir)
    val diff = spark.sql(
      s"""SELECT doc_id FROM (
            SELECT doc_id, simhash32(words) AS k, $simhashHof AS h FROM (
              SELECT doc_id, array_distinct(split(lower(text), ' ')) AS words
              FROM documents))
          WHERE NOT (k <=> h)""").count()
    assert(diff === 0, s"$diff documents with kernel != HOF simhash")
  }

  test("degenerate edges match the HOF semantics") {
    // empty word list, single word, null array, null element, unicode,
    // empty-string word (split on consecutive spaces produces one)
    val rows = spark.sql(
      s"""SELECT minhash_sig(words, 16) <=> $minhashHof AS mh_eq,
                 simhash32(words) <=> $simhashHof AS sh_eq
          FROM VALUES
            (array()),
            (array('solo')),
            (CAST(NULL AS ARRAY<STRING>)),
            (array('a', CAST(NULL AS STRING), 'b')),
            (array('naïve', 'héllo', '日本語')),
            (array('', 'x'))
          AS t(words)""").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getBoolean(0), s"minhash mismatch on edge case $i")
      assert(r.getBoolean(1), s"simhash mismatch on edge case $i")
    }
  }

  test("empty and null follow array_min/aggregate null semantics") {
    val r = spark.sql(
      """SELECT minhash_sig(array(), 16) AS mh_empty,
                simhash32(array()) AS sh_empty,
                minhash_sig(CAST(NULL AS ARRAY<STRING>), 16) AS mh_null,
                simhash32(CAST(NULL AS ARRAY<STRING>)) AS sh_null""").head()
    assert(r.getSeq[Any](0) === Seq.fill(16)(null)) // array_min(empty) = null
    assert(r.getLong(1) === 0L)                     // all sums 0 → no bits
    // NULL words: the HOF's outer transform runs over sequence → [null×16];
    // simhash's outermost aggregate sees a null array → null
    assert(r.getSeq[Any](2) === Seq.fill(16)(null))
    assert(r.isNullAt(3))
  }
}
