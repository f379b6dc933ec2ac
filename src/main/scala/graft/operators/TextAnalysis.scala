package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (extension surface;
  * lineage: the reference's only text analytics are `sentences`/`ngrams`/
  * `context_ngrams`, FunctionRegistry.java:425 + §2.5). Everything here is a
  * per-row projection built from codegen'd higher-order functions — no UDFs,
  * no shuffle except the final aggregations — so the same plan runs unchanged
  * over a 100 TB corpus.
  *
  * The synthetic corpus has identical vocabulary across `lang` labels, so
  * language-ID is verified as a deterministic mechanism (fixed marker-word
  * profiles, priority-ordered argmax), not on accuracy.
  */
object TextAnalysis extends QueryModule {

  private val stopwords = "'the', 'a', 'of', 'and', 'is', 'to', 'in'"

  val defs: Seq[QueryDef] = Seq(

    // ---- Language-ID: marker-word profile scores + deterministic argmax;
    //      output is the lang×pred confusion matrix
    QueryDef(
      "q60_langid",
      (s, dir) => t(s, dir, "documents")
        .selectExpr("lang", "split(lower(text), ' ') AS words")
        .selectExpr("lang",
          "size(filter(words, w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS s_en",
          "size(filter(words, w -> w IN ('el', 'la', 'de', 'que', 'y'))) AS s_es",
          "size(filter(words, w -> w IN ('le', 'les', 'et', 'un', 'une'))) AS s_fr",
          "size(filter(words, w -> w IN ('der', 'die', 'und', 'das', 'ein'))) AS s_de",
          "size(filter(words, w -> w IN ('shi', 'de_', 'le_', 'zai', 'you'))) AS s_zh")
        .selectExpr("lang",
          """CASE WHEN s_en >= greatest(s_es, s_fr, s_de, s_zh) THEN 'en'
                  WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
                  WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
                  WHEN s_fr >= s_zh THEN 'fr'
                  ELSE 'zh' END AS pred""")
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred")),
      Some(s"""WITH d AS (SELECT lang, str_split(rtrim(lower(text), ' '), ' ') AS words FROM documents),
        sc AS (SELECT lang,
          len(list_filter(words, w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS s_en,
          len(list_filter(words, w -> w IN ('el', 'la', 'de', 'que', 'y'))) AS s_es,
          len(list_filter(words, w -> w IN ('le', 'les', 'et', 'un', 'une'))) AS s_fr,
          len(list_filter(words, w -> w IN ('der', 'die', 'und', 'das', 'ein'))) AS s_de,
          len(list_filter(words, w -> w IN ('shi', 'de_', 'le_', 'zai', 'you'))) AS s_zh
          FROM d)
        SELECT lang,
          CASE WHEN s_en >= greatest(s_es, s_fr, s_de, s_zh) THEN 'en'
               WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
               WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
               WHEN s_fr >= s_zh THEN 'fr'
               ELSE 'zh' END AS pred,
          count(*) AS n
        FROM sc GROUP BY 1, 2 ORDER BY lang, pred""")),

    // ---- Quality scoring: length / word / stopword / punctuation /
    //      alpha-ratio features + a weighted score
    QueryDef(
      "q61_quality",
      (s, dir) => t(s, dir, "documents")
        .filter(col("doc_id") < 300)
        .selectExpr("doc_id", "lang",
          "length(text) AS n_chars_calc",
          "size(split(text, ' ')) AS n_words",
          "round(length(replace(text, ' ', '')) / size(split(text, ' ')), 4) AS avg_word_len",
          s"round(size(filter(split(lower(text), ' '), w -> w IN ($stopwords))) / size(split(text, ' ')), 4) AS stop_ratio",
          "round(length(regexp_replace(text, '[a-z ]', '')) / length(text), 4) AS punct_ratio",
          "round(length(regexp_replace(text, '[^a-z]', '')) / length(text), 4) AS alpha_ratio",
          // score from the RAW ratios (not the rounded display columns):
          // pre-rounding manufactures exact decimal halfway points whose
          // round(…, 4) is engine-dependent; raw ratios are non-terminating
          // so both engines see the same IEEE double
          s"""round(least(size(split(text, ' ')) / 50, 1.0) * 0.4
               + (1.0 - size(filter(split(lower(text), ' '), w -> w IN ($stopwords))) / size(split(text, ' '))) * 0.3
               + (length(regexp_replace(text, '[^a-z]', '')) / length(text)) * 0.2
               + (1.0 - length(regexp_replace(text, '[a-z ]', '')) / length(text)) * 0.1, 4) AS quality""")
        .orderBy(col("doc_id")),
      Some(s"""WITH q AS (SELECT doc_id, lang,
          length(text) AS n_chars_calc,
          len(str_split(rtrim(text, ' '), ' ')) AS n_words,
          round(length(replace(text, ' ', '')) / len(str_split(rtrim(text, ' '), ' ')), 4) AS avg_word_len,
          round(len(list_filter(str_split(rtrim(lower(text), ' '), ' '), w -> w IN ($stopwords))) / len(str_split(rtrim(text, ' '), ' ')), 4) AS stop_ratio,
          round(length(regexp_replace(text, '[a-z ]', '', 'g')) / length(text), 4) AS punct_ratio,
          round(length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text), 4) AS alpha_ratio,
          round(least(len(str_split(rtrim(text, ' '), ' ')) / 50, 1.0) * 0.4
            + (1.0 - len(list_filter(str_split(rtrim(lower(text), ' '), ' '), w -> w IN ($stopwords))) / len(str_split(rtrim(text, ' '), ' '))) * 0.3
            + (length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text)) * 0.2
            + (1.0 - length(regexp_replace(text, '[a-z ]', '', 'g')) / length(text)) * 0.1, 4) AS quality
        FROM documents WHERE doc_id < 300)
        SELECT doc_id, lang, n_chars_calc, n_words, avg_word_len, stop_ratio,
          punct_ratio, alpha_ratio, quality
        FROM q ORDER BY doc_id""")),

    // ---- Token counting: whitespace, regex (BPE-ish \w+|punct), 4-char
    //      subword chunks, chars/4 estimate, and `sentences` word count
    QueryDef(
      "q62_tokens",
      (s, dir) => t(s, dir, "documents")
        .filter(col("doc_id") < 300)
        .selectExpr("doc_id",
          "size(split(text, ' ')) AS n_ws",
          "regexp_count(text, '[a-z0-9]+|[^a-z0-9 ]') AS n_re",
          "aggregate(split(text, ' '), 0, (acc, w) -> acc + cast(ceil(length(w) / 4.0) AS int)) AS n_bpe",
          "cast(round(length(text) / 4.0, 0) AS int) AS n_est",
          "size(element_at(sentences(text), 1)) AS n_sent_words")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        len(str_split(rtrim(text, ' '), ' ')) AS n_ws,
        len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS n_re,
        CAST(list_sum(list_transform(str_split(rtrim(text, ' '), ' '),
             w -> ceil(length(w) / 4.0))) AS INT) AS n_bpe,
        CAST(round(length(text) / 4.0, 0) AS INT) AS n_est,
        len(str_split(rtrim(text, ' '), ' ')) AS n_sent_words
        FROM documents WHERE doc_id < 300 ORDER BY doc_id""")),

    // ---- TF-IDF: corpus-level term weighting — term/document frequencies
    //      via two aggregations over the exploded term index, idf joined
    //      back UNHINTED on `term`: at web scale the unigram DF table is
    //      10⁷–10⁸ rows — at the edge of broadcastability — so the plan
    //      must not *force* a driver build; AQE broadcasts when it actually
    //      fits and falls back to a shuffle hash join on the same key the
    //      DF aggregation already used when it doesn't.
    QueryDef(
      "q64b_tfidf",
      (s, dir) => {
        val terms = t(s, dir, "documents")
          .selectExpr("doc_id", "explode(split(lower(text), ' ')) AS term")
        val tf = terms.filter(col("doc_id") < 100)
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val dfreq = terms.select(col("doc_id"), col("term")).distinct()
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
        // corpus size as an in-plan broadcast scalar — a driver-side
        // count() here would run a job at plan-construction time
        val nDf = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))
        tf.join(dfreq, Seq("term"))
          .crossJoin(broadcast(nDf))
          .selectExpr("doc_id", "term", "tf", "df",
            "round(tf * ln((n_docs + 1) / (df + 1.0)), 6) AS tfidf")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"), col("tfidf"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH terms AS (
          SELECT doc_id, unnest(str_split(rtrim(lower(text), ' '), ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
               WHERE doc_id < 100 GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df
                  FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents)
        SELECT doc_id, rk, term, tf, df, tfidf FROM (
          SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                 round(tf.tf * ln((n.n + 1) / (dfreq.df + 1.0)), 6) AS tfidf,
                 row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY round(tf.tf * ln((n.n + 1) / (dfreq.df + 1.0)), 6) DESC,
                            tf.term) AS rk
          FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        WHERE rk <= 3 ORDER BY doc_id, rk""")),

    // ---- Winnowing document fingerprint (the MOSS scheme): char-5-gram
    //      rolling hashes, per-window (w=4) minima, distinct set → digest.
    //      Entirely projection-level → shuffle-free at any corpus size.
    QueryDef(
      "q63_fingerprint",
      (s, dir) => t(s, dir, "documents")
        // fixture tables are single-row-group parquet (one scan partition);
        // fan the hash-heavy projection across cores — at real scale the
        // many-file input arrives pre-split and this repartition disappears
        .repartition(s.sparkContext.defaultParallelism)
        // winnow_mins is the native-expression kernel (functions/Winnow
        // .scala): one tight loop per row instead of interpreted HOF
        // lambdas, proven output-identical to the SQL formulation by
        // WinnowSpec — the oracle below still describes the exact algorithm
        .selectExpr("doc_id", "winnow_mins(text, 5, 4) AS wm")
        .selectExpr("doc_id",
          "wm.n_kgrams AS n_kgrams",
          "size(wm.mins) AS n_fp",
          "md5(array_join(wm.mins, ',')) AS fp_md5")
        .orderBy(col("doc_id")),
      Some("""WITH h AS (
          SELECT doc_id,
                 list_transform(range(1, length(text) - 3),
                   i -> substr(md5(substr(text, i, 5)), 1, 8)) AS hs
          FROM documents),
        m AS (
          SELECT doc_id, len(hs) AS n_kgrams,
                 list_sort(list_distinct(list_transform(range(1, len(hs) - 2),
                   j -> list_min(hs[j:j+3])))) AS mins
          FROM h)
        SELECT doc_id, n_kgrams, len(mins) AS n_fp,
               md5(array_to_string(mins, ',')) AS fp_md5
        FROM m ORDER BY doc_id""")),

    // ---- Stratified deterministic sampling: per class (lang), keep the k
    //      docs with the smallest content-independent hash — reproducible
    //      across runs/engines (no RNG), balanced across classes, one
    //      shuffle on the class key. The per-class top-k window is the
    //      rank-based pattern q14 pins; at 100 TB a huge class first gets a
    //      cheap hash-prefix pre-filter (hash < threshold) to bound the
    //      sort input — same plan shape.
    QueryDef(
      "q85_stratified_sample",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
        t(s, dir, "documents")
          .selectExpr("lang", "doc_id", "md5(cast(doc_id AS string)) AS h")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 20)
          .select(col("lang"), col("doc_id"), col("rk"))
          .orderBy(col("lang"), col("rk"))
      },
      Some("""SELECT lang, doc_id, rk FROM (
          SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents)
        WHERE rk <= 20 ORDER BY lang, rk""")),

    // ---- Composed training-data pipeline: quality gate → exact dedup
    //      (min-doc_id survivor) → stratified deterministic sample →
    //      per-class token summary. One DataFrame chain, three keyed
    //      shuffles (dup_key, class, class) — the end-to-end shape a corpus
    //      build runs nightly; proves the operators compose without
    //      materialization between stages.
    QueryDef(
      "q87_pipeline_compose",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val quality = t(s, dir, "documents")
          .selectExpr("doc_id", "lang", "text",
            "size(split(lower(text), ' ')) AS n_tokens")
          .filter(col("n_tokens") >= 50)
        val survivors = quality
          .withColumn("dup_key",
            expr("md5(array_join(slice(split(lower(text), ' '), 1, 5), ' '))"))
          .withColumn("rk_dup", row_number().over(
            Window.partitionBy(col("dup_key")).orderBy(col("doc_id"))))
          .filter(col("rk_dup") === 1)
        val sampled = survivors
          .withColumn("h", expr("md5(cast(doc_id AS string))"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
          .filter(col("rk") <= 10)
        sampled.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            (sum(col("n_tokens")) / count(lit(1))).as("avg_tokens"))
          .orderBy(col("lang"))
      },
      // Oracle notes: rtrim before str_split models the engine's Hive split
      // semantics (trailing empty strings dropped, GenericUDFSplit.java:75 —
      // DuckDB str_split keeps them); CAST(sum AS BIGINT) because DuckDB
      // sum(BIGINT) returns HUGEINT, which the driver's fetch normalizes
      // differently than Spark's bigint (r3 red-row root cause).
      Some("""WITH quality AS (
          SELECT doc_id, lang, text,
                 len(str_split(rtrim(lower(text), ' '), ' ')) AS n_tokens
          FROM documents
          WHERE len(str_split(rtrim(lower(text), ' '), ' ')) >= 50),
        survivors AS (
          SELECT * FROM quality
          QUALIFY row_number() OVER (
            PARTITION BY md5(array_to_string((str_split(rtrim(lower(text), ' '), ' '))[1:5], ' '))
            ORDER BY doc_id) = 1),
        sampled AS (
          SELECT * FROM survivors
          QUALIFY row_number() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 10)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               sum(n_tokens) / count(*) AS avg_tokens
        FROM sampled GROUP BY lang ORDER BY lang""")),

    // ---- Gopher-style repetition quality signals: fraction of the doc in
    //      its most frequent word, and fraction of duplicated word-3-grams.
    //      Ratios are emitted RAW (int/int division is IEEE-identical across
    //      engines; rounding would manufacture halfway points). One shuffle
    //      on (doc_id, word) for the top-word count; the gram stats are pure
    //      projections. The `keep` flag is the filter a corpus build applies.
    QueryDef(
      "q90_repetition",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("doc_id", "split(lower(text), ' ') AS w")
        val gramStats = base
          .selectExpr("doc_id", "size(w) AS n_words",
            """CASE WHEN size(w) >= 3 THEN
                 transform(sequence(0, size(w) - 3),
                   i -> concat_ws(' ', slice(w, i + 1, 3)))
               ELSE array() END AS g3""")
          .selectExpr("doc_id", "n_words",
            "size(g3) AS n3", "size(array_distinct(g3)) AS nd3")
        val topWord = base
          .selectExpr("doc_id", "explode(w) AS word")
          .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("top_cnt"))
        gramStats.join(topWord, Seq("doc_id"))
          .selectExpr("doc_id", "n_words",
            "top_cnt / n_words AS top_frac",
            "CASE WHEN n3 > 0 THEN (n3 - nd3) / n3 END AS dup3_frac")
          .selectExpr("doc_id", "n_words", "top_frac", "dup3_frac",
            "top_frac <= 0.2 AND coalesce(dup3_frac, 0.0) <= 0.3 AS keep")
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
          SELECT doc_id, str_split(rtrim(lower(text), ' '), ' ') AS w FROM documents),
        st AS (
          SELECT doc_id, len(w) AS n_words,
                 CASE WHEN len(w) >= 3 THEN
                   list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                 ELSE [] END AS g3
          FROM w),
        st2 AS (
          SELECT doc_id, n_words, len(g3) AS n3, len(list_distinct(g3)) AS nd3
          FROM st),
        tw AS (
          SELECT doc_id, max(c) AS top_cnt FROM (
            SELECT doc_id, word, count(*) AS c
            FROM (SELECT doc_id, unnest(w) AS word FROM w) GROUP BY 1, 2)
          GROUP BY doc_id)
        SELECT st2.doc_id, n_words,
               top_cnt / n_words AS top_frac,
               CASE WHEN n3 > 0 THEN (n3 - nd3) / n3 END AS dup3_frac,
               top_cnt / n_words <= 0.2
                 AND coalesce(CASE WHEN n3 > 0 THEN (n3 - nd3) / n3 END, 0.0) <= 0.3 AS keep
        FROM st2 JOIN tw ON st2.doc_id = tw.doc_id ORDER BY st2.doc_id""")),

    // ---- PII redaction: regex scrub of emails/phones with per-doc match
    //      counts. The fixture corpus carries no PII, so deterministic
    //      positives are INJECTED from doc_id before scrubbing — the query
    //      then proves detection + replacement against known ground truth.
    //      Pure projection (codegen'd regexp), shuffle-free at any scale.
    QueryDef(
      "q91_pii_scrub",
      (s, dir) => t(s, dir, "documents")
        .selectExpr("doc_id",
          """concat(text, ' contact user', doc_id, '@mail.example.com or user.',
                    doc_id, '@corp.example.net tel 555-01',
                    lpad(cast(pmod(doc_id, 100) AS string), 2, '0')) AS aug""")
        .selectExpr("doc_id",
          "size(regexp_extract_all(aug, '[a-z0-9.]+@[a-z0-9.]+', 0)) AS n_emails",
          "size(regexp_extract_all(aug, '555-[0-9]{4}', 0)) AS n_phones",
          """md5(regexp_replace(regexp_replace(aug, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>'),
                                '555-[0-9]{4}', '<PHONE>')) AS scrub_md5""")
        .orderBy(col("doc_id")),
      Some("""WITH a AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@mail.example.com or user.'
                   || doc_id || '@corp.example.net tel 555-01'
                   || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS aug
          FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(aug, '[a-z0-9.]+@[a-z0-9.]+')) AS n_emails,
               len(regexp_extract_all(aug, '555-[0-9]{4}')) AS n_phones,
               md5(regexp_replace(regexp_replace(aug, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                                  '555-[0-9]{4}', '<PHONE>', 'g')) AS scrub_md5
        FROM a ORDER BY doc_id""")),

    // ---- Boilerplate removal (the C4/RefinedWeb line-dedup shape, with
    //      2-word chunks standing in for lines — the fixture is
    //      single-line): chunk every doc positionally, count each chunk's
    //      document frequency, drop chunks present in > 3.3% of the corpus
    //      (relative cap: scale-independent, computed from an IN-PLAN
    //      broadcast scalar, never a driver-side count), and reassemble the
    //      surviving text in original order. Two-tier hot/cold split: the
    //      FULL chunk-frequency table is bigram-vocabulary-sized (billions
    //      of distinct chunks on a web corpus — NOT broadcastable), but the
    //      ABOVE-CAP "hot" subset is bounded by construction: each hot chunk
    //      has df > 3.3%·N, and Σdf ≤ total chunk-doc incidences T, so
    //      |hot| < T/(0.033·N) ≈ 30 × avg-chunks-per-doc — corpus-size-
    //      independent, always broadcastable. So only `hot` is broadcast,
    //      and keep = "not in hot" via a broadcast left-outer; the corpus-
    //      sized dfreq never reaches the driver and the chunk rows are never
    //      re-shuffled after the DF aggregation.
    QueryDef(
      "q92_boilerplate",
      (s, dir) => {
        val chunks = t(s, dir, "documents")
          .selectExpr("doc_id", "split(lower(text), ' ') AS w")
          .selectExpr("doc_id",
            """posexplode(transform(sequence(0, cast(ceil(size(w) / 2.0) AS int) - 1),
                 j -> concat_ws(' ', slice(w, j * 2 + 1, 2)))) AS (pos, chunk)""")
        val dfreq = chunks.groupBy(col("chunk"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val nDocs = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
        val hot = dfreq.crossJoin(broadcast(nDocs))
          .filter(col("df") > lit(0.033) * col("n_docs"))
          .select(col("chunk"), lit(true).as("is_hot"))
        chunks.join(broadcast(hot), Seq("chunk"), "left_outer")
          .withColumn("keep", col("is_hot").isNull)
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("keep"), 1).otherwise(0)).as("n_kept"),
            md5(array_join(
              expr("transform(sort_array(collect_list(CASE WHEN keep THEN struct(pos, chunk) END)), x -> x.chunk)"),
              " ")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
          SELECT doc_id, str_split(rtrim(lower(text), ' '), ' ') AS w FROM documents),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        ch AS (
          SELECT doc_id,
                 unnest(range(0, CAST(ceil(len(w) / 2.0) AS BIGINT))) AS pos,
                 unnest(list_transform(range(0, CAST(ceil(len(w) / 2.0) AS BIGINT)),
                        j -> array_to_string(w[j*2+1:j*2+2], ' '))) AS chunk
          FROM w),
        dfreq AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM ch GROUP BY chunk),
        tg AS (
          SELECT c.doc_id, c.pos, c.chunk, (d.df <= 0.033 * nd.n_docs) AS keep
          FROM ch c JOIN dfreq d USING (chunk) CROSS JOIN nd)
        SELECT doc_id, count(*) AS n_chunks,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               md5(coalesce(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY pos), '')) AS clean_md5
        FROM tg GROUP BY doc_id ORDER BY doc_id""")),

    // ---- Sequence packing: assign docs greedily to ~512-token training
    //      bins, per language, in deterministic doc_id order — the
    //      batch-construction step after filtering/dedup. One window cumsum
    //      per class partition, then a bin-level rollup; at scale each lang
    //      partition streams through its sort independently (same shape as
    //      q30's running totals).
    QueryDef(
      "q93_sequence_pack",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "documents")
          .selectExpr("lang", "doc_id", "size(split(lower(text), ' ')) AS tokens")
          .withColumn("cum", sum(col("tokens")).over(w))
          // bin = which 512-token block the doc STARTS in (exact integer
          // division — `/` would be double division in Spark SQL)
          .selectExpr("lang", "doc_id", "tokens", "(cum - tokens) div 512 AS bin")
          .groupBy(col("lang"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("bin_tokens"))
          .orderBy(col("lang"), col("bin"))
      },
      Some("""WITH d AS (
          SELECT lang, doc_id,
                 len(str_split(rtrim(lower(text), ' '), ' ')) AS tokens
          FROM documents),
        c AS (
          SELECT lang, doc_id, tokens,
                 CAST(sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM d)
        SELECT lang, (cum - tokens) // 512 AS bin,
               count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS bin_tokens
        FROM c GROUP BY 1, 2 ORDER BY lang, bin""")),

    // ---- Bigram language-model quality score (the KenLM-style perplexity
    //      filter, corpus-trained): -avg log p(w2|w1) with add-one
    //      smoothing, p = (B(w1,w2)+1)/(U(w1)+V). The count-table joins are
    //      UNHINTED: a heavy-tail web corpus has 10⁹⁺ distinct bigrams (the
    //      bigram table is corpus-derived, NOT "vocabulary-sized") and
    //      10⁷–10⁸ unigrams, so forcing a driver broadcast of either is a
    //      100 TB OOM — AQE broadcasts when a table actually fits and
    //      otherwise shuffles on (w1,w2)/(w1), the same keys the count
    //      aggregations already partitioned by. Only V (one row) is a
    //      broadcast scalar. Per-bigram log-probs are summed as exact
    //      MICRO-UNITS (round-to-integer is the engine-agreeing rounding)
    //      because a per-doc sum of raw doubles is accumulation-order-
    //      dependent between Spark's partial/final tree and DuckDB's
    //      sequential fold.
    QueryDef(
      "q99_lm_score",
      (s, dir) => {
        val words = t(s, dir, "documents")
          .selectExpr("doc_id", "split(lower(text), ' ') AS w")
        val bigrams = words
          .selectExpr("doc_id",
            """explode(CASE WHEN size(w) >= 2 THEN
                 transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))
               ELSE array() END) AS bg""")
          .selectExpr("doc_id", "bg.w1 AS w1", "bg.w2 AS w2")
        val uni = words.selectExpr("explode(w) AS w1")
          .groupBy(col("w1")).agg(count(lit(1)).as("u"))
        val bi = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("b"))
        val vocab = uni.agg(count(lit(1)).as("v"))
        bigrams
          .join(bi, Seq("w1", "w2"))
          .join(uni, Seq("w1"))
          .crossJoin(broadcast(vocab))
          .selectExpr("doc_id",
            "cast(round(-ln((b + 1) / (u + cast(v AS double))) * 1000000) AS bigint) AS micro")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("micro")).as("m"))
          // the per-doc score stays in exact MICRO-units end to end: a
          // re-rounded decimal score (round(m/1e6/n, 4)) hit an EXACT
          // .00005 halfway at 30x (m = n * 4045150 → 4.04515), which
          // Spark's shortest-repr BigDecimal rounding takes UP and
          // DuckDB's raw-double rounding takes DOWN. Integer micro-nll
          // has no such boundary: both engines round the identical
          // m/n double to the same integer.
          .selectExpr("doc_id", "n_bigrams",
            "CAST(round(m / CAST(n_bigrams AS DOUBLE)) AS BIGINT) AS nll_micro")
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
          SELECT doc_id, str_split(rtrim(lower(text), ' '), ' ') AS w FROM documents),
        bg AS (
          SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
          FROM w WHERE len(w) >= 2),
        uni AS (
          SELECT w1, CAST(count(*) AS BIGINT) AS u
          FROM (SELECT doc_id, unnest(w) AS w1 FROM w) GROUP BY w1),
        bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS b FROM bg GROUP BY 1, 2),
        v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
        scored AS (
          SELECT bg.doc_id,
                 CAST(round(-ln((b + 1) / (u + CAST(v AS DOUBLE))) * 1000000) AS BIGINT) AS micro
          FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v)
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(round(CAST(sum(micro) AS DOUBLE) / count(*)) AS BIGINT) AS nll_micro
        FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ---- Benchmark decontamination (the n-gram overlap rule used to scrub
    //      eval-set leakage from training corpora, GPT-3/Llama-style): hash
    //      every 8-word shingle of the benchmark docs (doc_id % 20 = 7
    //      stands in for the eval suite), flag corpus docs sharing ANY
    //      shingle, count the distinct shingles hit. Scale posture: the
    //      probe set is BENCHMARK-sized — eval suites are thousands of
    //      docs, small by construction, unlike the corpus-derived frequency
    //      tables of q92/q99 — so broadcasting it is the correct 100 TB
    //      plan; the corpus side explodes distinct shingle hashes per doc
    //      (words-per-doc fan-out, partition-parallel) into a hash
    //      equi-join. explode_outer dodges the InferFiltersFromGenerate
    //      re-evaluation trap (q51/q97). size(ws) >= 8 guards sequence()'s
    //      descending-on-negative-span behavior (q97's advisor lesson).
    QueryDef(
      "q102_decontam",
      (s, dir) => {
        // shingle_md5 = the HOF chain in one native loop (functions/
        // Shingle.scala; ShingleSpec proves equality, the oracle still
        // describes the HOF form). Fixture parquet is single-row-group →
        // one scan partition; spread the md5 work across cores first
        val docs = t(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("doc_id", "shingle_md5(trim(text), 8) AS shs")
        val probes = docs.filter(col("doc_id") % 20 === 7)
          .selectExpr("explode_outer(shs) AS sh")
          .filter(col("sh").isNotNull).distinct()
        docs.filter(col("doc_id") % 20 =!= 7)
          .selectExpr("doc_id", "explode_outer(shs) AS sh")
          .join(broadcast(probes), Seq("sh"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_hits"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
          SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
        probes AS (
          SELECT DISTINCT unnest(list_transform(range(1, len(ws) - 6),
            i -> md5(array_to_string(ws[i:i+7], ' ')))) AS sh
          FROM w WHERE doc_id % 20 = 7 AND len(ws) >= 8),
        cand AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 6),
            i -> md5(array_to_string(ws[i:i+7], ' '))))) AS sh
          FROM w WHERE doc_id % 20 <> 7 AND len(ws) >= 8)
        SELECT doc_id, count(*) AS n_hits
        FROM cand JOIN probes USING (sh)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- Temperature-weighted domain mixing (the multilingual rebalancing
    //      step of a training-data pipeline): per-class quota ∝ n_c^0.5
    //      (α = 0.5 flattens the head class), selection by deterministic
    //      hash rank — the same sample every run, every engine. FP
    //      discipline: weights are EXACT micro-units (round(sqrt(n)*1e6)
    //      AS BIGINT — sqrt is IEEE correctly-rounded in both engines, and
    //      integer micro-unit sums are order-free where a double sum(wt)
    //      is not), so floor(target * wt / z) sits on a correctly-rounded
    //      single division and cannot straddle an engine boundary. Scale:
    //      class stats are |classes| rows (broadcast), the rank is one
    //      shuffle partitioned by class — same plan shape as q85.
    QueryDef(
      "q103_domain_mix",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
        val quota = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"))
          .selectExpr("lang", "cast(round(sqrt(n) * 1000000.0D) AS bigint) AS wt")
        val z = quota.agg(sum(col("wt")).as("z"))
        val q = quota.crossJoin(broadcast(z))
          .selectExpr("lang", "cast(floor(200.0D * wt / z) AS bigint) AS q")
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("hk"), col("doc_id"))
        docs
          .selectExpr("doc_id", "lang",
            "cast(conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) AS hk")
          .withColumn("rk", row_number().over(w))
          .join(broadcast(q), Seq("lang"))
          .filter(col("rk") <= col("q"))
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        wts AS (SELECT lang, CAST(round(sqrt(n) * 1000000.0) AS BIGINT) AS wt FROM counts),
        z AS (SELECT sum(wt) AS z FROM wts),
        quota AS (SELECT lang, CAST(floor(200.0 * wt / z) AS BIGINT) AS q
                  FROM wts CROSS JOIN z),
        ranked AS (
          SELECT d.doc_id, d.lang,
            row_number() OVER (PARTITION BY d.lang
              ORDER BY CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                d.doc_id) AS rk
          FROM documents d)
        SELECT r.doc_id, r.lang FROM ranked r JOIN quota USING (lang)
        WHERE rk <= q ORDER BY doc_id""")),

    // ---- Frequent items per language (Misra-Gries `freq_items` kernel —
    //      functions/FreqItems.scala): top-5 words by count. The exact
    //      GROUP-BY form shuffles one row per DISTINCT item (a web corpus:
    //      billions); the aggregate ships ≤ k counters per partial buffer
    //      with the n/(k+1) frequency guarantee — the stop-word-discovery /
    //      hot-key-detection summary. k=4096 ≫ the fixture vocabulary, so
    //      counts are EXACT here and the DuckDB oracle can check them; the
    //      tight-capacity error bound is property-spec'd instead.
    QueryDef(
      "q108_freq_items",
      (s, dir) => {
        val words = t(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("lang", "explode(split(trim(text), ' ')) AS word")
          .filter(length(col("word")) > 0)
        words.groupBy(col("lang"))
          .agg(expr("freq_items(word, 4096)").as("fi"))
          .selectExpr("lang", "posexplode(slice(fi, 1, 5)) AS (i, e)")
          .selectExpr("lang", "cast(i + 1 AS int) AS rk",
            "e.item AS word", "e.cnt AS cnt")
          .orderBy(col("lang"), col("rk"))
      },
      Some("""WITH w AS (
          SELECT lang, unnest(string_split(trim(text), ' ')) AS word
          FROM documents),
        c AS (SELECT lang, word, count(*) AS cnt FROM w
              WHERE len(word) > 0 GROUP BY 1, 2),
        r AS (SELECT lang, word, cnt,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY cnt DESC, word) AS rk
              FROM c)
        SELECT lang, CAST(rk AS INT) AS rk, word, cnt FROM r WHERE rk <= 5
        ORDER BY lang, rk""")),

    // ---- Deterministic train/val/test split (80/10/10 by content-stable
    //      hash — the assignment survives reruns, repartitions, and corpus
    //      growth, unlike rand()-based splits; the same portable
    //      md5-prefix hash as q85/q103). Pure projection + one count
    //      shuffle; sum(doc_id) is the membership witness the count alone
    //      wouldn't give.
    QueryDef(
      "q112_split",
      (s, dir) => t(s, dir, "documents")
        .selectExpr("doc_id", "lang",
          """CASE WHEN pmod(cast(conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint), 100) < 80 THEN 'train'
                  WHEN pmod(cast(conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint), 100) < 90 THEN 'val'
                  ELSE 'test' END AS split""")
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("split"), col("lang")),
      Some("""WITH s AS (
          SELECT doc_id, lang,
            CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                 WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
                 ELSE 'test' END AS split
          FROM documents)
        SELECT split, lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM s GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- Cardinality estimation (HLL++): per-language vocabulary size
    //      without a per-distinct-item shuffle — constant sketch memory per
    //      partial buffer, the companion to freq_items for corpus
    //      profiling. The sketch is deterministic per engine (fixed hash)
    //      but not replicable in DuckDB's HLL, so the driver-checkable
    //      oracle gates what IS exact: the group-key frame, the exact
    //      distinct count, and an in-query 3·rsd tolerance verdict on the
    //      estimate (TRUE on both sides iff the sketch honors its
    //      guarantee — the same law ApproxAggSpec asserts). The exact
    //      count column here is the verification harness, not the
    //      operator: at 100 TB only the sketch runs.
    QueryDef(
      "q113_approx_distinct",
      (s, dir) => t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .selectExpr("lang", "explode(split(trim(text), ' ')) AS word")
        .filter(length(col("word")) > 0)
        .groupBy(col("lang"))
        .agg(approx_count_distinct(col("word"), 0.02).as("approx_vocab"),
          countDistinct(col("word")).as("exact_vocab"))
        .selectExpr("lang", "exact_vocab",
          "abs(double(approx_vocab) - double(exact_vocab)) <= 0.06D * double(exact_vocab) AS est_ok")
        .orderBy(col("lang")),
      Some("""WITH w AS (
            SELECT lang, unnest(str_split(trim(text), ' ')) AS word FROM documents)
          SELECT lang, count(DISTINCT word) AS exact_vocab, TRUE AS est_ok
          FROM w WHERE length(word) > 0 GROUP BY lang ORDER BY lang""")),

    // ---- End-to-end corpus build: the production DAG a training-data
    //      pipeline actually runs, composed from the operators above in ONE
    //      query — decontaminate (q102's shingle probes) → exact-dedup
    //      (q50's content key, min-id survivor) → quality gate (token
    //      floor) → deterministic split (q112's hash) → per-(split, lang)
    //      doc/token accounting. Everything is integer/string arithmetic,
    //      so the whole chain is oracle-exact; every stage keeps the scale
    //      posture it had standalone (broadcast benchmark probes,
    //      one-shuffle dedup, projection-only gate/split).
    QueryDef(
      "q114_corpus_pipeline",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("doc_id", "lang", "text", "shingle_md5(trim(text), 8) AS shs")
        val probes = docs.filter(col("doc_id") % 20 === 7)
          .selectExpr("explode_outer(shs) AS sh")
          .filter(col("sh").isNotNull).distinct()
        val corpus = docs.filter(col("doc_id") % 20 =!= 7)
        val contaminated = corpus
          .selectExpr("doc_id", "explode_outer(shs) AS sh")
          .join(broadcast(probes), Seq("sh"))
          .select(col("doc_id")).distinct()
        val clean = corpus.join(contaminated, Seq("doc_id"), "left_anti")
          .selectExpr("doc_id", "lang", "text",
            "md5(array_join(slice(split(lower(text), ' '), 1, 5), ' ')) AS dup_key")
        val survivors = clean
          .groupBy(col("dup_key")).agg(min(col("doc_id")).as("doc_id"))
          .join(clean, Seq("dup_key", "doc_id"))
        val gated = survivors
          .selectExpr("doc_id", "lang", "size(split(trim(text), ' ')) AS n_tokens")
          .filter(col("n_tokens") >= 20)
        gated
          .selectExpr("doc_id", "lang", "n_tokens",
            """CASE WHEN pmod(cast(conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint), 100) < 80 THEN 'train'
                    WHEN pmod(cast(conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint), 100) < 90 THEN 'val'
                    ELSE 'test' END AS split""")
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"),
            sum(col("doc_id")).as("id_sum"))
          .orderBy(col("split"), col("lang"))
      },
      Some("""WITH w AS (
          SELECT doc_id, lang, text,
                 string_split(trim(text), ' ') AS ws FROM documents),
        probes AS (
          SELECT DISTINCT unnest(list_transform(range(1, len(ws) - 6),
            i -> md5(array_to_string(ws[i:i+7], ' ')))) AS sh
          FROM w WHERE doc_id % 20 = 7 AND len(ws) >= 8),
        cand AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 6),
            i -> md5(array_to_string(ws[i:i+7], ' '))))) AS sh
          FROM w WHERE doc_id % 20 <> 7 AND len(ws) >= 8),
        contaminated AS (
          SELECT DISTINCT doc_id FROM cand JOIN probes USING (sh)),
        clean AS (
          SELECT doc_id, lang, text,
                 md5(array_to_string((str_split(rtrim(lower(text), ' '), ' '))[1:5], ' ')) AS dup_key
          FROM documents
          WHERE doc_id % 20 <> 7
            AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
        surv AS (
          SELECT c.doc_id, c.lang,
                 len(string_split(trim(c.text), ' ')) AS n_tokens
          FROM clean c
          JOIN (SELECT dup_key, min(doc_id) AS doc_id FROM clean GROUP BY 1) m
            ON c.dup_key = m.dup_key AND c.doc_id = m.doc_id),
        gated AS (SELECT * FROM surv WHERE n_tokens >= 20),
        s AS (
          SELECT doc_id, lang, n_tokens,
            CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                 WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
                 ELSE 'test' END AS split
          FROM gated)
        SELECT split, lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tokens,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM s GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- Exact-substring SCRUB (RefinedWeb-style): remove every token
    //      covered by an 8-gram appearing in ≥2 documents and reassemble
    //      the surviving text in order. q106 PROFILES duplication; this
    //      operator rewrites the corpus — the cleaning stage between
    //      profile and train. Plan: positional gram hashes
    //      (shingle_md5_pos: slot i = gram starting at token i) → per-gram
    //      document frequency → dup-START positions joined back (equi, and
    //      the df≥2 filter runs BEFORE the join so the joined side is
    //      small under real dup rates) → per-doc windowed OR over the
    //      trailing 8 positions marks covered tokens → ordered reassembly.
    //      Scale posture: gram HASHES shuffle, text doesn't (q106's rule);
    //      the token explode shuffles once by doc for the coverage window
    //      — inherent to token-level rewriting.
    QueryDef(
      "q124_substring_scrub",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = fixtureBound(t(s, dir, "documents"), "doc_id", 300)
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("doc_id", "split(text, ' ') AS ws",
            "shingle_md5_pos(text, 8) AS shs")
        val grams = base.selectExpr("doc_id", "posexplode(shs) AS (i, gh)")
        val dupGrams = grams.select(col("doc_id"), col("gh")).distinct()
          .groupBy(col("gh")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2).select(col("gh"))
        val starts = grams.join(dupGrams, Seq("gh"))
          .select(col("doc_id"), col("i").as("j"), lit(1).as("st"))
        val wcov = Window.partitionBy(col("doc_id")).orderBy(col("j"))
          .rowsBetween(-7, 0)
        base.selectExpr("doc_id", "posexplode(ws) AS (j, w)")
          .join(starts, Seq("doc_id", "j"), "left")
          .withColumn("cov", max(coalesce(col("st"), lit(0))).over(wcov))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(col("cov")).as("n_dup_tokens"),
            concat_ws(" ", expr(
              """transform(array_sort(collect_list(
                   CASE WHEN cov = 0 THEN struct(j, w) END)), x -> x.w)"""))
              .as("clean_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
          SELECT doc_id, str_split(rtrim(text, ' '), ' ') AS ws
          FROM documents WHERE doc_id < 300),
        gs AS (
          SELECT doc_id,
                 unnest(range(1, len(ws) - 6)) AS i,
                 unnest(list_transform(range(1, len(ws) - 6),
                   i -> md5(array_to_string(ws[i:i+7], ' ')))) AS gh
          FROM w),
        dup AS (
          SELECT gh FROM (SELECT gh, count(DISTINCT doc_id) AS df
                          FROM gs GROUP BY gh)
          WHERE df >= 2),
        starts AS (SELECT DISTINCT doc_id, i FROM gs JOIN dup USING (gh)),
        toks AS (
          SELECT doc_id, unnest(range(1, len(ws) + 1)) AS j, unnest(ws) AS w
          FROM w),
        cov AS (
          SELECT t.doc_id, t.j, t.w,
                 max(CASE WHEN s.i IS NOT NULL THEN 1 ELSE 0 END) OVER
                   (PARTITION BY t.doc_id ORDER BY t.j
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS cov
          FROM toks t LEFT JOIN starts s ON t.doc_id = s.doc_id AND t.j = s.i)
        SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(cov) AS BIGINT) AS n_dup_tokens,
               coalesce(string_agg(w, ' ' ORDER BY j) FILTER (WHERE cov = 0), '')
                 AS clean_text
        FROM cov GROUP BY doc_id ORDER BY doc_id""")),

    // ---- Deterministic training-epoch shuffle: shard assignment + a
    //      shard-local pseudo-random order from a seeded content-stable
    //      hash (the q112/q85 portable md5-prefix hash). This is how a
    //      100 TB corpus is shuffled for training WITHOUT a global sort:
    //      one hash-partition shuffle to the shards, then each shard
    //      orders locally (window PARTITION BY shard = shard-local sort);
    //      changing the seed re-permutes every epoch reproducibly.
    //      Restartable mid-epoch: (shard, pos) is a stable address.
    QueryDef(
      "q135_epoch_shuffle",
      (s, dir) => fixtureBound(t(s, dir, "documents"), "doc_id", 300)
        .selectExpr("doc_id",
          """pmod(cast(conv(substr(md5(concat(cast(doc_id AS string), ':42')), 1, 8), 16, 10) AS bigint), 8) AS shard""",
          """cast(conv(substr(md5(concat(':42', cast(doc_id AS string))), 1, 8), 16, 10) AS bigint) AS ord""")
        .repartition(col("shard"))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("shard")).orderBy(col("ord"), col("doc_id"))))
        .select(col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("shard"), col("pos")),
      Some("""WITH h AS (
          SELECT doc_id,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT) % 8 AS shard,
            CAST(('0x' || substr(md5(':42' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS ord
          FROM documents WHERE doc_id < 300)
        SELECT shard, CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS INT) AS pos,
               doc_id
        FROM h ORDER BY shard, pos""")),

    // ---- Model-based quality classifier (the fastText-classifier-shaped
    //      gate of C4/CCNet-style pipelines, distinct from q61's linear
    //      heuristic): fixed-weight logistic model over cheap text
    //      features → sigmoid score → keep/drop label + per-language class
    //      balance. Pure projection + one aggregation; the score is
    //      computed from RAW ratios and rounded once at the end (the
    //      cross-engine float discipline every oracle here follows).
    QueryDef(
      "q136_quality_classifier",
      (s, dir) => fixtureBound(t(s, dir, "documents"), "doc_id", 300)
        .selectExpr("doc_id", "lang",
          "length(text) AS len",
          "length(regexp_replace(text, '[^a-z]', '')) / length(text) AS alpha_r",
          "length(regexp_replace(text, '[^0-9]', '')) / length(text) AS digit_r",
          "length(regexp_replace(text, '[^ ]', '')) / length(text) AS space_r")
        .selectExpr("doc_id", "lang",
          """1.0 / (1.0 + exp(-(4.0 * alpha_r - 6.0 * digit_r
             + 2.0 * space_r + 0.4 * ln(least(len, 2000)) - 5.0))) AS raw""")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("CASE WHEN raw > 0.5 THEN 1 ELSE 0 END")).as("n_keep"),
          round(sum(col("raw")), 4).as("score_sum"))
        .orderBy(col("lang")),
      Some("""WITH f AS (
          SELECT doc_id, lang, length(text) AS len,
            length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text) AS alpha_r,
            length(regexp_replace(text, '[^0-9]', '', 'g')) / length(text) AS digit_r,
            length(regexp_replace(text, '[^ ]', '', 'g')) / length(text) AS space_r
          FROM documents WHERE doc_id < 300),
        sc AS (
          SELECT doc_id, lang,
            1.0 / (1.0 + exp(-(4.0 * alpha_r - 6.0 * digit_r
              + 2.0 * space_r + 0.4 * ln(least(len, 2000)) - 5.0))) AS raw
          FROM f)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(CASE WHEN raw > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
               round(sum(raw), 4) AS score_sum
        FROM sc GROUP BY lang ORDER BY lang""")),

    // ---- BM25 retrieval scoring (Robertson-Sparck Jones idf, k1=1.2
    //      b=0.75 — the classic lexical companion to q64b's TF-IDF and
    //      the ANN family): score every document against a query term
    //      set, keep the matches. Scale posture: term stats (df) and the
    //      corpus scalars (N, avgdl) are tiny aggregates joined back
    //      broadcast-style; the per-(doc, term) tf table only carries
    //      QUERY terms (filter before the count shuffle), so the big
    //      side is one filtered token scan — no doc×vocab blowup.
    QueryDef(
      "q137_bm25",
      (s, dir) => {
        val docs = fixtureBound(t(s, dir, "documents"), "doc_id", 300)
        val toks = docs.selectExpr("doc_id",
          "explode(split(trim(text), ' ')) AS word")
          .filter(length(col("word")) > 0)
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          avg(col("dl")).as("avgdl"))
        val terms = Seq("join", "window", "stream")
        val tf = toks.filter(col("word").isin(terms: _*))
          .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
        tf.join(df, "word").join(dl, "doc_id").crossJoin(broadcast(stats))
          .selectExpr("doc_id",
            """ln((double(n_docs) - double(df) + 0.5) / (double(df) + 0.5) + 1.0)
               * double(tf) * 2.2
               / (double(tf) + 1.2 * (0.25 + 0.75 * double(dl) / avgdl))
               AS term_score""")
          .groupBy("doc_id")
          .agg(round(sum(col("term_score")), 4).as("bm25"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
          FROM documents WHERE doc_id < 300),
        tk AS (SELECT * FROM toks WHERE length(word) > 0),
        dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        tf AS (SELECT doc_id, word, count(*) AS tf FROM tk
               WHERE word IN ('join', 'window', 'stream')
               GROUP BY doc_id, word),
        df AS (SELECT word, count(*) AS df FROM tf GROUP BY word)
        SELECT tf.doc_id,
               round(sum(
                 ln((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                    / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
                 * CAST(tf.tf AS DOUBLE) * 2.2
                 / (CAST(tf.tf AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl))), 4)
                 AS bm25
        FROM tf JOIN df USING (word) JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id ORDER BY tf.doc_id"""))
  )
}
