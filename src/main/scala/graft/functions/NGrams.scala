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
  private val PruneFactor = 100

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
