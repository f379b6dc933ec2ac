package graft

import graft.functions.{FreqItemsKernel, FreqItemsState, NGramFreq, NGramKernel, NGramState, TopKKernel, TopKState}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws for the custom aggregation/hash kernels — the
  * partial/final contract (split-merge equivalence, commutativity, identity)
  * that a distributed run depends on but single-partition tests never
  * exercise. Drives scalacheck Gens with explicit seeds (scalatestplus glue
  * is not available offline), so every run checks the same 100 cases.
  */
class PropertySpec extends SparkSpec {

  private val word = Gen.oneOf("a", "b", "c", "the", "scan", "join", "fast")
  private val doc = Gen.listOf(word).map(_.toSeq)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // kernel drivers: the exact production code paths (NGramKernel mutates its
  // state in place, so every comparison below builds fresh states)
  private def reduced(docs: Seq[Seq[String]], n: Int, k: Int): NGramState = {
    val s = new NGramState()
    s.k = k
    docs.foreach { d =>
      NGramKernel.countNGrams(s, d.toIndexedSeq, n)
      NGramKernel.prune(s)
    }
    s
  }

  private def ctxReduced(docs: Seq[Seq[String]], pattern: Seq[String],
      k: Int): NGramState = {
    val s = new NGramState()
    s.k = k
    docs.foreach { d =>
      NGramKernel.countContext(s, d.toIndexedSeq, pattern.toIndexedSeq,
        pattern.length)
      NGramKernel.prune(s)
    }
    s
  }

  test("ngrams: reduce-all equals split-reduce-then-merge (partial/final contract)") {
    (1 to 100).foreach { s =>
      val docs = sample(Gen.listOfN(6, doc), s)
      val whole = reduced(docs, 2, 5)
      val (l, r) = docs.splitAt(3)
      val merged = NGramKernel.merge(reduced(l, 2, 5), reduced(r, 2, 5))
      assert(NGramKernel.finish(whole) == NGramKernel.finish(merged), s"seed=$s")
    }
  }

  test("ngrams: merge is commutative after finish; empty state is identity") {
    (1 to 100).foreach { s =>
      val d1 = Seq(sample(doc, s))
      val d2 = Seq(sample(doc, s + 1000))
      val ab = NGramKernel.merge(reduced(d1, 2, 5), reduced(d2, 2, 5))
      val ba = NGramKernel.merge(reduced(d2, 2, 5), reduced(d1, 2, 5))
      assert(NGramKernel.finish(ab) == NGramKernel.finish(ba), s"seed=$s")
      val withZero = NGramKernel.merge(reduced(d1, 2, 5), new NGramState())
      assert(NGramKernel.finish(withZero) == NGramKernel.finish(reduced(d1, 2, 5)),
        s"seed=$s")
    }
  }

  test("ngrams: serialize/deserialize round trip preserves counts and k") {
    (1 to 40).foreach { s =>
      val docs = sample(Gen.listOfN(4, doc), s)
      val st = reduced(docs, 2, 5)
      val back = NGramKernel.deserialize(NGramKernel.serialize(st))
      assert(back.k == st.k && back.counts == st.counts, s"seed=$s")
    }
  }

  test("context_ngrams: split-reduce-merge equals reduce-all; wildcard matching correct") {
    val pattern = Seq("the", null)
    (1 to 60).foreach { s =>
      val docs = sample(Gen.listOfN(4, doc), s)
      val whole = ctxReduced(docs, pattern, 5)
      val (l, r) = docs.splitAt(2)
      val merged = NGramKernel.merge(
        ctxReduced(l, pattern, 5), ctxReduced(r, pattern, 5))
      assert(NGramKernel.finish(merged) == NGramKernel.finish(whole), s"seed=$s")
      // every reported follower really follows 'the' somewhere
      val followers = docs.flatMap(d => d.sliding(2).collect {
        case Seq("the", w) => w
      })
      NGramKernel.finish(whole).foreach { g =>
        assert(followers.contains(g.ngram), s"phantom follower ${g.ngram} seed=$s")
        assert(g.freq == followers.count(_ == g.ngram), s"wrong count seed=$s")
      }
    }
  }

  test("ngrams prune path: memory bounded, clear heavy hitters stay exact") {
    // vocabulary ≫ PruneFactor*k forces the prune branch (the 7-word-vocab
    // laws above never reach it). Documented contract: the buffer stays
    // O(PruneFactor*k); grams that are always inside the kept margin when a
    // prune fires keep EXACT counts; a pruned-then-reencountered gram may
    // undercount but never overcounts.
    val k = 2
    val cap = NGramKernel.PruneFactor * k
    // 5000 distinct noise unigrams (freq 1) with two heavy hitters woven in
    val words = (0 until 5000).flatMap { i =>
      Seq(s"w$i") ++ (if (i % 10 == 0) Seq("hot1") else Nil) ++
        (if (i % 25 == 0) Seq("hot2") else Nil)
    }
    val docs = words.grouped(50).toSeq
    val buf = new NGramState()
    buf.k = k
    docs.foreach { d =>
      NGramKernel.countNGrams(buf, d.toIndexedSeq, 1)
      NGramKernel.prune(buf)
      assert(buf.counts.size <= cap, s"buffer ${buf.counts.size} exceeds $cap")
    }
    assert(NGramKernel.finish(buf) ==
      Seq(NGramFreq("hot1", 500), NGramFreq("hot2", 200)))
    // split/merge across partials agrees despite pruning in every partial
    val (l, r) = docs.splitAt(docs.size / 2)
    val merged = NGramKernel.merge(reduced(l, 1, k), reduced(r, 1, k))
    assert(merged.counts.size <= cap)
    assert(NGramKernel.finish(merged) ==
      Seq(NGramFreq("hot1", 500), NGramFreq("hot2", 200)))
    // no overcounting anywhere: every reported freq ≤ true frequency
    val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    merged.counts.forEach { (g, c) =>
      assert(c <= truth(g), s"$g overcounted: $c > ${truth(g)}")
    }
  }

  test("bitmap serialize/deserialize round trip preserves cardinality and bits") {
    import graft.functions.BitmapAgg
    val agg = BitmapAgg(org.apache.spark.sql.catalyst.expressions.Literal(1))
    (1 to 40).foreach { s =>
      val bits = sample(Gen.listOf(Gen.choose(0, 100000)), s).distinct
      val buf = agg.createAggregationBuffer()
      bits.foreach(buf.add)
      val back = agg.deserialize(agg.serialize(buf))
      assert(back.getCardinality == bits.size, s"seed=$s")
      bits.foreach(b => assert(back.contains(b), s"bit $b lost seed=$s"))
    }
  }

  test("bitmap buffer stays compressed for sparse keys near Int.MaxValue") {
    // The reference chose EWAH compression so memory tracks cardinality, not
    // key magnitude (GenericUDAFEWAHBitmap.java:53). A dense positional
    // BitSet would allocate ~256 MB for this buffer; compressed it must
    // serialize to well under a kilobyte.
    import graft.functions.BitmapAgg
    val agg = BitmapAgg(org.apache.spark.sql.catalyst.expressions.Literal(1))
    val buf = agg.createAggregationBuffer()
    Seq(0, 7, 1 << 20, Int.MaxValue - 1, Int.MaxValue).foreach(buf.add)
    val bytes = agg.serialize(buf)
    assert(bytes.length < 1024, s"sparse bitmap serialized to ${bytes.length}B")
    val back = agg.deserialize(bytes)
    assert(back.getCardinality == 5 && back.contains(Int.MaxValue))
  }

  test("hive_hash on strings equals Java String.hashCode for arbitrary input") {
    import spark.implicits._
    val ss = (1 to 50).map(s => sample(Gen.alphaNumStr.map(_.take(40)), s)) :+
      "" :+ "héllo wörld ünïcode ✓"
    val got = ss.toDF("s").selectExpr("hive_hash(s) AS h").as[Int].collect().toSeq
    assert(got == ss.map(_.hashCode))
  }

  test("field returns an index its own arguments justify") {
    import spark.implicits._
    val ss = (1 to 60).map(s => sample(Gen.oneOf("x", "y", "z", "w"), s))
    val got = ss.toDF("s").selectExpr("field(s, 'x', 'y', 'z') AS f")
      .as[Int].collect().toSeq
    got.zip(ss).foreach { case (f, s) =>
      val expected = Seq("x", "y", "z").indexOf(s) + 1
      assert(f == (if (expected > 0) expected else 0))
    }
  }

  // ---- top_k bounded-buffer aggregate (functions/TopK.scala) ----

  private val tkRow: Gen[(Double, String)] = for {
    v <- Gen.chooseNum(0, 40).map(_.toDouble / 4) // dense → many ties
    l <- Gen.oneOf("a", "b", "c", "d", "e", "f")
  } yield (v, l)

  private def tkReduced(rows: Seq[(Double, String)], k: Int): TopKState = {
    val s = new TopKState(k)
    rows.foreach { case (v, l) => TopKKernel.add(s, v, l, 1L) }
    s
  }

  private def brute(rows: Seq[(Double, String)], k: Int): Seq[(String, Double)] =
    rows.sortBy { case (v, l) => (-v, l) }.take(k).map { case (v, l) => (l, v) }

  test("top_k: reduce-all == split-reduce-merge == brute force, incl ties") {
    (1 to 100).foreach { seed =>
      val rows = sample(Gen.listOfN(30, tkRow), seed)
      val k = 1 + seed % 7
      val whole = tkReduced(rows, k)
      val (l, r) = rows.splitAt(seed % rows.size)
      val merged = TopKKernel.merge(tkReduced(l, k), tkReduced(r, k))
      val expect = brute(rows, k)
      assert(TopKKernel.finish(whole) == expect, s"seed=$seed whole")
      assert(TopKKernel.finish(merged) == expect, s"seed=$seed merged")
    }
  }

  test("top_k: serde round trip; empty state is merge identity") {
    (1 to 40).foreach { seed =>
      val rows = sample(Gen.listOfN(20, tkRow), seed)
      val st = tkReduced(rows, 5)
      val back = TopKKernel.deserialize(TopKKernel.serialize(st))
      assert(TopKKernel.finish(back) == TopKKernel.finish(tkReduced(rows, 5)))
      val withZero = TopKKernel.merge(back, new TopKState())
      assert(TopKKernel.finish(withZero) == brute(rows, 5), s"seed=$seed")
    }
  }

  // ---- HiveQl literal masking (HiveQl.scala maskLiterals/rewrite) ----

  test("rewrite is identity on arbitrary statements whose trigger text is all inside literals") {
    // literal contents draw from the exact token classes the pre-parser
    // regexes hunt for — if masking ever leaks, a rewrite fires and the
    // round trip breaks
    val scary = Gen.oneOf(
      "t TABLESAMPLE (BUCKET 1 OUT OF 2 ON k)", "/*+ MAPJOIN(x) */",
      "/*+ STREAMTABLE(y) */", "UNIQUEJOIN a b (k)", "it;s", "a -- b",
      "back\\slash", "plain words", "")
    val literal = for {
      q <- Gen.oneOf("'", "\"")
      body <- scary
    } yield {
      val other = if (q == "'") "\"" else "'"
      q + body.replace(q, other) + q // keep the literal well-terminated
    }
    val plain = Gen.oneOf("SELECT ", "x", "f(a, b)", ", ", " FROM t ",
      "WHERE k = ", "1 + 2", "\n", " ")
    val stmt = Gen.listOfN(8, Gen.frequency((3, plain), (2, literal)))
      .map(_.mkString)
    (1 to 200).foreach { seed =>
      val q = sample(stmt, seed)
      assert(HiveQl.rewrite(q) == q, s"seed=$seed: $q")
    }
  }

  test("block comments: quotes inside are inert, trigger text never fires, hints still rewrite") {
    // an apostrophe in a /* */ span must not open a phantom string literal
    val apos = "SELECT 1 /* don't */ FROM t"
    assert(HiveQl.rewrite(apos) == apos)
    // rewrite-trigger text inside a comment stays byte-identical
    val scary =
      "SELECT k /* t TABLESAMPLE (BUCKET 1 OUT OF 2 ON k) -- 'x */ FROM t"
    assert(HiveQl.rewrite(scary) == scary)
    // /*+ ... */ hint comments are NOT masked — the MAPJOIN rewrite fires
    assert(HiveQl.rewrite("SELECT /*+ MAPJOIN(d) */ * FROM f JOIN d ON f.k = d.k")
      .contains("BROADCAST(d)"))
    // unterminated comment passes through for the delegate lexer to reject
    assert(HiveQl.rewrite("SELECT 1 /* oops") == "SELECT 1 /* oops")
  }

  // ---- freq_items Misra-Gries aggregate (functions/FreqItems.scala) ----

  private val fiItem: Gen[String] = Gen.frequency(
    (8, Gen.const("hot1")), (5, Gen.const("hot2")),
    (2, Gen.oneOf("w1", "w2", "w3")),
    (1, Gen.oneOf((1 to 30).map(i => s"rare$i"))))

  private def fiReduced(items: Seq[String], k: Int): FreqItemsState = {
    val s = new FreqItemsState(k)
    items.foreach(FreqItemsKernel.add(s, _, 1L))
    s
  }

  test("freq_items: exact regime (k >= distinct) equals exact counts, any split") {
    (1 to 60).foreach { seed =>
      val items = sample(Gen.listOfN(200, fiItem), seed)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy { case (i, c) => (-c, i) }
      val k = 64 // > 35 possible distinct items
      val whole = FreqItemsKernel.finish(fiReduced(items, k))
      val (l, r) = items.splitAt(seed % items.size)
      val merged = FreqItemsKernel.finish(
        FreqItemsKernel.merge(fiReduced(l, k), fiReduced(r, k)))
      assert(whole == exact, s"seed=$seed whole")
      assert(merged == exact, s"seed=$seed merged")
    }
  }

  test("freq_items: tight capacity keeps the MG guarantees") {
    (1 to 60).foreach { seed =>
      val items = sample(Gen.listOfN(300, fiItem), seed)
      val n = items.size
      val k = 4
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (l, r) = items.splitAt((seed * 7) % items.size)
      val st = FreqItemsKernel.merge(fiReduced(l, k), fiReduced(r, k))
      val got = FreqItemsKernel.finish(st).toMap
      assert(got.size <= k, s"seed=$seed capacity")
      assert(st.decremented <= n / (k + 1), s"seed=$seed decrement bound")
      // every item with freq > n/(k+1) survives; counts undercount by
      // at most the applied decrement and never overcount
      truth.foreach { case (item, c) =>
        if (c > n / (k + 1))
          assert(got.contains(item), s"seed=$seed lost heavy hitter $item ($c)")
      }
      got.foreach { case (item, c) =>
        val t = truth(item)
        assert(c <= t && c >= t - st.decremented, s"seed=$seed bound $item")
      }
    }
  }

  test("freq_items: tie-break is UTF-8 byte order, not UTF-16 code units") {
    // U+FFFD (UTF-8: EF BF BD) vs U+1F600 (UTF-8: F0 9F 98 80): in UTF-16
    // code-unit order the surrogate 0xD83D sorts FIRST, in UTF-8 byte order
    // (= Spark UTF8String / DuckDB code-point order) U+FFFD sorts first —
    // the orders genuinely diverge on this pair
    val replacement = "�"
    val emoji = "😀"
    assert(replacement.compareTo(emoji) > 0, "precondition: UTF-16 order differs")
    val s = new FreqItemsState(8)
    FreqItemsKernel.add(s, emoji, 3L)
    FreqItemsKernel.add(s, replacement, 3L)
    assert(FreqItemsKernel.finish(s) == Seq((replacement, 3L), (emoji, 3L)))
  }

  test("freq_items: serde round trip preserves counters, k, and error budget") {
    (1 to 40).foreach { seed =>
      val items = sample(Gen.listOfN(150, fiItem), seed)
      val st = fiReduced(items, 6)
      val back = FreqItemsKernel.deserialize(FreqItemsKernel.serialize(st))
      assert(FreqItemsKernel.finish(back) == FreqItemsKernel.finish(st))
      assert(back.k == st.k && back.decremented == st.decremented)
      val withZero = FreqItemsKernel.merge(back, new FreqItemsState())
      assert(FreqItemsKernel.finish(withZero) == FreqItemsKernel.finish(st))
    }
  }

  test("WAV encode/decode round trip: arbitrary payload, rate, channels") {
    import graft.operators.MediaCodec
    val payloadGen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    val rateGen = Gen.oneOf(8000, 11025, 16000, 22050, 44100)
    val chGen = Gen.oneOf(1, 2, 4)
    (1 to 100).foreach { s =>
      val payload = sample(payloadGen, s).map(_.toByte).toArray
      val rate = sample(rateGen, s)
      val ch = sample(chGen, s)
      val st = MediaCodec.decodeAudio(s.toLong,
        MediaCodec.encodeWav(payload, rate, ch))
      val padded = payload.length + (ch - payload.length % ch) % ch
      assert(st.sample_rate == rate && st.channels == ch && st.bits == 8,
        s"seed=$s header facts")
      assert(st.n_frames == padded / ch, s"seed=$s frame count")
      val amps = payload.map(_ & 0xFF) ++ Array.fill(padded - payload.length)(0)
      if (amps.nonEmpty) {
        assert(st.min_amp == amps.min && st.max_amp == amps.max, s"seed=$s extrema")
        assert(st.mean_amp == BigDecimal(amps.sum.toDouble / amps.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"seed=$s mean")
      } else assert(st.mean_amp == 0.0 && st.min_amp == 0 && st.max_amp == 0)
    }
  }

  test("shingle_md5_pos: slot count and per-slot digests for arbitrary docs") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(t: String): String =
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (1 to 50).foreach { s =>
      val words = sample(Gen.listOfN(sample(Gen.chooseNum(0, 14), s), word), s)
      val text = words.mkString(" ")
      val got = spark.sql(
        s"SELECT shingle_md5_pos('${text}', 3) AS g").head().getSeq[String](0)
      val want =
        if (words.length < 3) Seq.empty
        else words.sliding(3).map(w => md5hex(w.mkString(" "))).toSeq
      assert(got == want, s"seed=$s text='$text'")
    }
  }
}
