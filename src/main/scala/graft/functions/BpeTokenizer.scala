package graft.functions

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the fit/encode core
  * shared by the batch operator (TextOps.bpeTokenCounts, q112) and any
  * caller that needs trainer-faithful token counts (sequence packing
  * budgets, context-window chunking).
  *
  * FIT runs driver-side over a bounded word-frequency table (the fitted-
  * model pattern: like k-means centroids and PQ codebooks, the input is
  * capped by config, never by corpus size). Determinism: the next merge
  * is the (count DESC, pair ASC) maximum, so ties cannot reorder merges
  * between runs or partitionings.
  *
  * ENCODE is pure and per-word: apply merges greedily by rank (always
  * the lowest-rank adjacent pair first — the standard BPE inference
  * rule), so it broadcasts with the model and runs embarrassingly
  * parallel inside `mapPartitions` at any scale. A per-word memo cache
  * amortizes Zipf-repeated words within a partition.
  */
object BpeTokenizer {

  /** End-of-word marker appended to each word's final symbol so merges
    * cannot cross word boundaries (the paper's `</w>`). */
  val EOW = "</w>"

  final case class BpeModel(merges: Vector[(String, String)]) {
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  private def toSymbols(word: String): Vector[String] = {
    if (word.isEmpty) Vector.empty
    else {
      val cs = word.map(_.toString).toVector
      cs.init :+ (cs.last + EOW)
    }
  }

  /** Train `nMerges` merges from a word → frequency table. */
  def fit(wordFreq: Map[String, Long], nMerges: Int): BpeModel = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    var words: Vector[(Vector[String], Long)] =
      wordFreq.iterator.filter(_._1.nonEmpty)
        .map { case (w, f) => toSymbols(w) -> f }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var made = 0
    while (made < nMerges) {
      val counts = collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) made = nMerges
      else {
        // deterministic: count DESC, then pair ASC
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> f
        }
        made += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Encode one word: repeatedly merge the LOWEST-RANK adjacent pair
    * present (standard BPE inference). Characters outside the training
    * alphabet simply never merge — graceful fallback to char tokens. */
  def encodeWord(model: BpeModel, word: String): Vector[String] = {
    var syms = toSymbols(word)
    if (syms.length < 2) return syms
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        model.rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Token count of a whitespace-split text under the model, with a
    * per-partition word memo (Zipf reuse makes this the hot path). */
  def countTokens(model: BpeModel, memo: collection.mutable.HashMap[String, Int],
                  text: String): Long = {
    var total = 0L
    text.split(" ", -1).foreach { w =>
      total += memo.getOrElseUpdate(w, encodeWord(model, w).length)
    }
    total
  }
}
