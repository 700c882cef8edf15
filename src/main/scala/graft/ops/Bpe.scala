package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-training step of an LLM data pipeline, in the standard
  * vocabulary formulation: the corpus is touched ONCE (a word-frequency
  * aggregation); every merge round then runs over the word table, whose
  * row count is the vocabulary size, with pair counts weighted by word
  * frequency. That is what makes BPE tractable at 100 TB — rounds never
  * re-scan text, they re-scan the (many orders of magnitude smaller,
  * still distributed) vocab table.
  *
  * Determinism: the winning pair each round maximizes (count, then
  * lexicographically smallest (left, right)) — a total order, so the
  * learned merge sequence is unique for a given corpus regardless of
  * partitioning. Merge application inside a word is the left-to-right
  * non-overlapping scan, expressed as an in-row `aggregate` with an
  * array accumulator (pure Column code — no UDF).
  *
  * There is no SQL-oracle form (the per-round argmax-then-rewrite
  * fixpoint is beyond a recursive CTE), so the driver gate checks this
  * operator rows-only; BpeSpec carries the independent reference
  * implementation (driver-side Sennrich pseudocode) the results must
  * equal exactly.
  */
object Bpe {

  /** End-of-word marker appended to every word's symbol sequence (the
    * Sennrich `</w>`), so merges can learn word-final units.
    */
  val Eow = "</w>"

  /** In-row left-to-right non-overlapping application of ONE merge
    * (a, b) -> a+b over a symbol array.
    */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** The distributed word-frequency table with initial symbol
    * sequences: one corpus-scale aggregation, the only time the text
    * is read.
    */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        concat(split(col("word"), ""), array(lit(Eow))))

  /** Learn `nMerges` merges. Returns the merge table as rows of
    * `(rank, left, right, merged, pair_count)` — pair_count is the
    * frequency-weighted adjacent-pair count that won the round.
    *
    * Hybrid execution, the shape production BPE trainers use: the
    * corpus-scale work (word counting) is ALWAYS distributed; the merge
    * loop itself runs over the word-frequency table, which for most
    * corpora fits the driver (`driverVocabLimit` rows) — there the loop
    * is an in-memory scan per round, and paying ~3 Spark jobs per round
    * to "distribute" a few-thousand-row table is pure overhead (measured
    * 49 s for 16 rounds at sf0.1 vs ~1 s in memory). Web-scale text can
    * exceed any driver (hundreds of millions of distinct "words"), so
    * past the limit the rounds run distributed: per round one
    * vocab-table shuffle (pair explode + groupBy), one 1-row argmax
    * collect, one persisted projection applying the winner. Both paths
    * implement the identical (count desc, pair asc) total order and are
    * asserted equal in BpeSpec.
    */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
                  driverVocabLimit: Long = 200000L): Seq[(Int, String, String, String, Long)] = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    val words0 = wordTable(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocabN = words0.count()
    val res =
      if (vocabN <= driverVocabLimit) learnDriver(words0, nMerges)
      else learnDistributed(words0, nMerges)
    words0.unpersist()
    res
  }

  /** UTF-8 binary comparison (= code-point order) — the collation
    * Spark's string ordering uses. Java's `String.compareTo` compares
    * UTF-16 code units, which ranks supplementary characters (encoded
    * as surrogates near 0xD800) BELOW U+E000..U+FFFF; a tie broken
    * differently per path would make driver and distributed runs learn
    * different merge tables on non-ASCII corpora.
    */
  private def utf8Compare(a: String, b: String): Int = {
    val (x, y) = (a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Driver-side merge loop over the collected word-frequency table. */
  private def learnDriver(words0: DataFrame, nMerges: Int): Seq[(Int, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words0.select("syms", "freq").collect()
      .map(r => r.getSeq[String](0).toVector -> r.getLong(1)).toMap
    def mergeWord(w: Vector[String], a: String, b: String): Vector[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == a && w(i + 1) == b) { out += (a + b); i += 2 }
        else { out += w(i); i += 1 }
      }
      out.toVector
    }
    val res = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, n) =>
        var i = 0
        while (i + 1 < w.length) {
          val k = (w(i), w(i + 1)); pairs(k) = pairs.getOrElse(k, 0L) + n; i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        // same total order as the distributed path: count desc, then
        // UTF-8 binary (code-point) order on (left, right)
        val ((a, b), n) = pairs.reduceLeft { (p, q) =>
          val cmp =
            if (p._2 != q._2) java.lang.Long.compare(q._2, p._2)
            else {
              val cl = utf8Compare(p._1._1, q._1._1)
              if (cl != 0) cl else utf8Compare(p._1._2, q._1._2)
            }
          if (cmp <= 0) p else q
        }
        res += ((rank, a, b, a + b, n))
        vocab = vocab.groupBy { case (w, _) => mergeWord(w, a, b) }
          .view.mapValues(_.values.sum).toMap
        rank += 1
      }
    }
    res.toSeq
  }

  /** Distributed merge rounds for vocabularies beyond the driver. */
  private def learnDistributed(words0: DataFrame, nMerges: Int): Seq[(Int, String, String, String, Long)] = {
    var words = words0
    // the persisted frame backing `words` (None = words0, caller-owned),
    // and the prior round's cache, which must survive until the CURRENT
    // round's frame has materialized (its lineage reads the prior cache;
    // releasing it earlier would force every round to replay the whole
    // merge chain from words0 — O(rounds²) total work)
    var cache: Option[DataFrame] = None
    var retired: Option[DataFrame] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // adjacent pairs of the CURRENT symbol sequences, weighted by freq.
      // This collect materializes `words`' cache, after which the prior
      // round's cache is safe to release.
      val top = words
        .select(col("freq"),
          explode(zip_with(slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      retired.foreach(_.unpersist(blocking = false))
      retired = None
      top.headOption match {
        case None => exhausted = true
        case Some(row: Row) =>
          val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
          out += ((rank, l, r, l + r, n))
          val next = words.withColumn("syms", applyMerge(col("syms"), l, r))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          retired = cache
          cache = Some(next)
          words = next
          rank += 1
      }
    }
    retired.foreach(_.unpersist(blocking = false))
    cache.foreach(_.unpersist(blocking = false))
    out.toSeq
  }

  /** Tokenize text with a learned merge sequence: split to characters
    * (+ `</w>` per word) and apply the merges in rank order — one
    * in-row scan per merge, no shuffle at all. Returns the input with a
    * `bpe_tokens` array column and its length `n_bpe`.
    */
  def tokenize(df: DataFrame, textCol: String,
               merges: Seq[(String, String)]): DataFrame =
    df
      // drop empty split artifacts (leading whitespace): the word table
      // the merges were learned from excludes them too
      .withColumn("_words",
        filter(Dedup.tokens(col(textCol)), w => length(w) > 0))
      .withColumn("bpe_tokens",
        flatten(transform(col("_words"), w =>
          merges.foldLeft(concat(split(w, ""), array(lit(Eow)))) {
            case (c, (a, b)) => applyMerge(c, a, b)
          })))
      .withColumn("n_bpe", size(col("bpe_tokens")).cast("long"))
      .drop("_words")
}
