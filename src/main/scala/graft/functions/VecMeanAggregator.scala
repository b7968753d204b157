package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group mean of an `array<double>` column as a typed `Aggregator`.
  *
  * Why it matters at scale: the k-means centroid update is "mean vector
  * per cluster". Expressed as `posexplode → groupBy(cluster, dim) →
  * avg → re-assemble`, every Lloyd iteration shuffles N×dim scalar rows
  * TWICE (once to average, once to re-assemble the arrays). This
  * Aggregator participates in partial aggregation instead: each map task
  * reduces its slice to at most K (sum, count) buffers, so the per-
  * iteration shuffle carries `partitions × K` array rows — independent of
  * N — and there is exactly ONE exchange. At 100 TB that turns the
  * training loop's cost into the assign scan itself.
  *
  * Mixed-length vectors in one group throw (k-means feeds fixed-dim
  * embeddings; silently zip-truncating would corrupt centroids).
  */
class VecMeanAggregator
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    if (v == null) b
    else if (b._2 == 0L) (v.toArray, 1L) // copy: never alias the input row
    else {
      val s = b._1
      require(v.length == s.length,
        s"vec_mean over mixed lengths: ${v.length} vs ${s.length}")
      var i = 0
      while (i < s.length) { s(i) += v(i); i += 1 }
      (s, b._2 + 1L)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0L) b
    else if (b._2 == 0L) a
    else {
      val s = a._1
      require(b._1.length == s.length,
        s"vec_mean over mixed lengths: ${b._1.length} vs ${s.length}")
      var i = 0
      while (i < s.length) { s(i) += b._1(i); i += 1 }
      (s, a._2 + b._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0L) Seq.empty
    else {
      val n = b._2.toDouble
      b._1.toIndexedSeq.map(_ / n)
    }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
