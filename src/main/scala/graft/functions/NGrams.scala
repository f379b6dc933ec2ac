package graft.functions

import org.apache.spark.sql.expressions.Aggregator

final case class NGramFreq(ngram: String, freq: Long)

/** Aggregation buffer: the running n-gram counts plus the (n, k) parameters
  * seen from the input rows (finish() needs k, and merge() needs them to
  * prune consistently).
  */
final case class NGramBuf(counts: Map[String, Long], n: Int, k: Int)

/** Top-k n-gram frequency estimator — the reference's `ngrams` UDAF
  * (ref ql/udf/generic/GenericUDAFnGrams.java:361) as a typed Spark
  * [[Aggregator]] (partial/final split ≈ the reference's
  * iterate/terminatePartial/merge/terminate contract,
  * GenericUDAFEvaluator.java:38).
  *
  * The reference bounds memory with an estimation precision factor; here the
  * buffer is pruned to the top `PruneFactor * k` grams whenever it grows past
  * that bound, so a partial aggregate on a 100 TB corpus stays O(k), not
  * O(vocabulary). Counts for the true top-k are exact in practice because
  * pruning keeps a generous margin (same posture as the reference's default
  * pf).
  */
object NGramsTopK extends Aggregator[(Seq[String], Int, Int), NGramBuf, Seq[NGramFreq]] {
  // a gram pruned from a partial buffer and re-encountered later is
  // undercounted (same posture as the reference's estimation pf); 1000×k
  // keeps counts exact whenever the per-partition gram vocabulary fits
  // 1000k while still bounding memory at O(k)
  private[graft] val PruneFactor = 1000

  override def zero: NGramBuf = NGramBuf(Map.empty, 0, 0)

  private def prune(b: NGramBuf): NGramBuf =
    if (b.k > 0 && b.counts.size > PruneFactor * b.k)
      b.copy(counts = b.counts.toSeq
        .sortBy { case (g, c) => (-c, g) }
        .take(PruneFactor * b.k).toMap)
    else b

  override def reduce(b: NGramBuf, in: (Seq[String], Int, Int)): NGramBuf = {
    val (words, n, k) = in
    val m = collection.mutable.HashMap.empty[String, Long] ++= b.counts
    var i = 0
    val last = words.length - n
    while (i <= last) {
      val gram = words.slice(i, i + n).mkString(" ")
      m.update(gram, m.getOrElse(gram, 0L) + 1L)
      i += 1
    }
    prune(NGramBuf(m.toMap, n, k))
  }

  override def merge(a: NGramBuf, b: NGramBuf): NGramBuf = {
    val (small, big) = if (a.counts.size < b.counts.size) (a, b) else (b, a)
    val m = collection.mutable.HashMap.empty[String, Long] ++= big.counts
    small.counts.foreach { case (g, c) => m.update(g, m.getOrElse(g, 0L) + c) }
    prune(NGramBuf(m.toMap, math.max(a.n, b.n), math.max(a.k, b.k)))
  }

  override def finish(b: NGramBuf): Seq[NGramFreq] =
    b.counts.toSeq.sortBy { case (g, c) => (-c, g) }
      .take(b.k).map { case (g, c) => NGramFreq(g, c) }

  override def bufferEncoder: org.apache.spark.sql.Encoder[NGramBuf] =
    org.apache.spark.sql.Encoders.product[NGramBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[NGramFreq]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[NGramFreq]]()
}

/** `context_ngrams` (ref GenericUDAFContextNGrams.java:424): counts the
  * words that fill the null slots of a context pattern — e.g. pattern
  * ('the', null) counts what follows 'the'. Null pattern entries are
  * wildcards; matched wildcard words (joined by space when several) are the
  * counted grams. Same pruned-buffer top-k contract as [[NGramsTopK]].
  */
object ContextNGramsTopK
    extends Aggregator[(Seq[String], Seq[String], Int), NGramBuf, Seq[NGramFreq]] {

  override def zero: NGramBuf = NGramBuf(Map.empty, 0, 0)

  override def reduce(b: NGramBuf, in: (Seq[String], Seq[String], Int)): NGramBuf = {
    val (words, pattern, k) = in
    val n = pattern.length
    val m = collection.mutable.HashMap.empty[String, Long] ++= b.counts
    var i = 0
    val last = words.length - n
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < n) {
        val p = pattern(j)
        if (p != null && p != words(i + j)) ok = false
        j += 1
      }
      if (ok) {
        val gram = (0 until n).collect {
          case j2 if pattern(j2) == null => words(i + j2)
        }.mkString(" ")
        m.update(gram, m.getOrElse(gram, 0L) + 1L)
      }
      i += 1
    }
    val grown = NGramBuf(m.toMap, n, k)
    val cap = NGramsTopK.PruneFactor * k
    if (k > 0 && grown.counts.size > cap)
      grown.copy(counts = grown.counts.toSeq
        .sortBy { case (g, c) => (-c, g) }.take(cap).toMap)
    else grown
  }

  override def merge(a: NGramBuf, b: NGramBuf): NGramBuf =
    NGramsTopK.merge(a, b)
  override def finish(b: NGramBuf): Seq[NGramFreq] = NGramsTopK.finish(b)
  override def bufferEncoder: org.apache.spark.sql.Encoder[NGramBuf] =
    org.apache.spark.sql.Encoders.product[NGramBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[NGramFreq]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[NGramFreq]]()
}
