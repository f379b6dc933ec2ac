package graft

import graft.functions.{NGramFreq, NGramsTopK}
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

  test("ngrams: reduce-all equals split-reduce-then-merge (partial/final contract)") {
    (1 to 100).foreach { s =>
      val docs = sample(Gen.listOfN(6, doc), s)
      val whole = docs.foldLeft(NGramsTopK.zero)(
        (b, d) => NGramsTopK.reduce(b, (d, 2, 5)))
      val (l, r) = docs.splitAt(3)
      val left = l.foldLeft(NGramsTopK.zero)((b, d) => NGramsTopK.reduce(b, (d, 2, 5)))
      val right = r.foldLeft(NGramsTopK.zero)((b, d) => NGramsTopK.reduce(b, (d, 2, 5)))
      val merged = NGramsTopK.merge(left, right)
      assert(NGramsTopK.finish(whole) == NGramsTopK.finish(merged), s"seed=$s")
    }
  }

  test("ngrams: merge is commutative after finish; zero is identity") {
    (1 to 100).foreach { s =>
      val d1 = sample(doc, s)
      val d2 = sample(doc, s + 1000)
      val b1 = NGramsTopK.reduce(NGramsTopK.zero, (d1, 2, 5))
      val b2 = NGramsTopK.reduce(NGramsTopK.zero, (d2, 2, 5))
      assert(NGramsTopK.finish(NGramsTopK.merge(b1, b2)) ==
        NGramsTopK.finish(NGramsTopK.merge(b2, b1)), s"seed=$s")
      assert(NGramsTopK.finish(NGramsTopK.merge(b1, NGramsTopK.zero)) ==
        NGramsTopK.finish(b1), s"seed=$s")
    }
  }

  test("context_ngrams: split-reduce-merge equals reduce-all; wildcard matching correct") {
    val pattern = Seq("the", null)
    import graft.functions.ContextNGramsTopK
    (1 to 60).foreach { s =>
      val docs = sample(Gen.listOfN(4, doc), s)
      val whole = docs.foldLeft(ContextNGramsTopK.zero)(
        (b, d) => ContextNGramsTopK.reduce(b, (d, pattern, 5)))
      val (l, r) = docs.splitAt(2)
      val left = l.foldLeft(ContextNGramsTopK.zero)(
        (b, d) => ContextNGramsTopK.reduce(b, (d, pattern, 5)))
      val right = r.foldLeft(ContextNGramsTopK.zero)(
        (b, d) => ContextNGramsTopK.reduce(b, (d, pattern, 5)))
      assert(ContextNGramsTopK.finish(ContextNGramsTopK.merge(left, right)) ==
        ContextNGramsTopK.finish(whole), s"seed=$s")
      // every reported follower really follows 'the' somewhere
      val followers = docs.flatMap(d => d.sliding(2).collect {
        case Seq("the", w) => w
      })
      ContextNGramsTopK.finish(whole).foreach { g =>
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
    val cap = NGramsTopK.PruneFactor * k
    // 5000 distinct noise unigrams (freq 1) with two heavy hitters woven in
    val words = (0 until 5000).flatMap { i =>
      Seq(s"w$i") ++ (if (i % 10 == 0) Seq("hot1") else Nil) ++
        (if (i % 25 == 0) Seq("hot2") else Nil)
    }
    val docs = words.grouped(50).toSeq
    var buf = NGramsTopK.zero
    docs.foreach { d =>
      buf = NGramsTopK.reduce(buf, (d, 1, k))
      assert(buf.counts.size <= cap, s"buffer ${buf.counts.size} exceeds $cap")
    }
    assert(NGramsTopK.finish(buf) ==
      Seq(NGramFreq("hot1", 500), NGramFreq("hot2", 200)))
    // split/merge across partials agrees despite pruning in every partial
    val (l, r) = docs.splitAt(docs.size / 2)
    val left = l.foldLeft(NGramsTopK.zero)((b, d) => NGramsTopK.reduce(b, (d, 1, k)))
    val right = r.foldLeft(NGramsTopK.zero)((b, d) => NGramsTopK.reduce(b, (d, 1, k)))
    val merged = NGramsTopK.merge(left, right)
    assert(merged.counts.size <= cap)
    assert(NGramsTopK.finish(merged) ==
      Seq(NGramFreq("hot1", 500), NGramFreq("hot2", 200)))
    // no overcounting anywhere: every reported freq ≤ true frequency
    val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    merged.counts.foreach { case (g, c) =>
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
}
