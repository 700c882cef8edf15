package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import PortableHash.hash60

/** Deduplication operators for large-scale text corpora: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Extends the reference's capability surface
  * (it has no dedup beyond workload-string dedup, dqo/datasets/__init__.py:150)
  * with the operators a training-data pipeline needs.
  *
  * Scale design (100 TB): every op is one explode + one hash-partitioned
  * aggregation/join — no driver-side loops, no collect. Candidate
  * generation (LSH bands, SimHash pigeonhole chunks) bounds the join
  * fan-out so the all-pairs quadratic blow-up never materializes; the
  * exact similarity is only computed on candidate pairs. Common-shingle
  * skew is handled with a document-frequency cap (`maxDf`) that drops
  * stop-shingles before the self-join.
  */
object Dedup {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Shingles from an already-materialized token array. Callers MUST bind
    * the token array to its own projection first: inlining `tokens(text)`
    * here would re-run the regex split once per lambda element (O(words²)
    * per document — observed 5× slowdown before this split).
    */
  def shinglesOf(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i => concat_ws(" ", slice(t, i + 1, lit(n))))
    ).otherwise(array())

  /** (id, shingle) rows: tokens materialized in their own projection, and
    * the input pre-partitioned by id so (a) the CPU-heavy explode runs on
    * all cores even when the source is a single small file and (b) the
    * downstream per-id groupBy reuses the partitioning without another
    * shuffle.
    */
  private[graft] def shingleRows(df: DataFrame, idCol: String, textCol: String,
                                 n: Int): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(shinglesOf(col("toks"), n)).as("sh"))

  /** Exact dedup: group identical texts by md5, keep the smallest id.
    * One shuffle on the 128-bit content hash; group sizes are tiny
    * (true duplicates), so no skew handling is needed.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).cast("long").as("n_copies"))

  /** Mersenne-prime modulus for the affine MinHash family. */
  val MinhashP: Long = 2147483647L

  /** Deterministic affine-family constants (a odd, both < P). Literal
    * values are embedded in both the Spark plan and the oracle SQL.
    */
  def minhashConsts(i: Int): (Long, Long) = {
    val a = ((2L * i + 1L) * 2654435761L) % MinhashP
    val b = (i.toLong * 40503L * 65537L + 17L) % MinhashP
    (a, b)
  }

  /** MinHash signatures as flat rows (id, seed, min_hash): explode shingles
    * once, md5-hash each shingle ONCE, then derive the k permutations with
    * an affine universal-hash family ((a·h + b) mod 2^31-1 — products stay
    * under 2^62, so plain BIGINT math reproduces everywhere). k
    * min-aggregates in one map-side-combining groupBy — the shuffle
    * carries only k longs per document.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int, shingleN: Int): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, shingleN)
      .withColumn("hb", hash60(col("sh")) % MinhashP)
    val aggs = (0 until k).map { s =>
      val (a, b) = minhashConsts(s)
      min((col("hb") * a + b) % MinhashP).as(s"s$s")
    }
    val wide = sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    // unpivot to flat (id, seed, min_hash) rows
    val stacked = (0 until k).map(s => s"$s, s$s").mkString(", ")
    wide.selectExpr(idCol, s"stack($k, $stacked) AS (seed, min_hash)")
  }

  /** LSH band keys: the signature is cut into `bands` bands of
    * `rowsPerBand` values; each band is hashed to a bucket key. Documents
    * sharing any (band, bucket) are near-dup candidates.
    */
  def lshBands(signatures: DataFrame, idCol: String,
               bands: Int, rowsPerBand: Int): DataFrame = {
    val wide = signatures.groupBy(col(idCol))
      .pivot("seed", 0 until bands * rowsPerBand).agg(first("min_hash"))
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col((b * rowsPerBand + r).toString))
      hash60(concat_ws(",", parts: _*)).as(s"band$b")
    }
    val withBands = wide.select(col(idCol) +: bandCols: _*)
    val stacked = (0 until bands).map(b => s"$b, band$b").mkString(", ")
    withBands.selectExpr(idCol, s"stack($bands, $stacked) AS (band, bucket)")
  }

  /** Candidate pairs from LSH buckets (a < b, distinct). The self-join is
    * hash-partitioned on (band, bucket); bucket sizes are bounded by the
    * band width choice, keeping fan-out quadratic only within buckets.
    */
  def lshCandidates(bandDf: DataFrame, idCol: String): DataFrame = {
    val a = bandDf.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = bandDf.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing at least one
    * shingle, with a document-frequency cap dropping stop-shingles (skew
    * guard at scale; also bounds fan-out). Returns pairs with
    * jaccard >= `threshold`.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, maxDf: Long, threshold: Double): DataFrame = {
    val docSh = shingleRows(df, idCol, textCol, shingleN)
      .withColumnRenamed(idCol, "id")
      .distinct()
    val rare = docSh.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf).select("sh")
    val filtered = docSh.join(rare, "sh")
    val sizes = docSh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = filtered.select(col("sh"), col("id").as("id_a"))
      .join(filtered.select(col("sh"), col("id").as("id_b")), "sh")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_inter", "jaccard")
  }

  private val SimBits = 60

  /** 60-bit SimHash over whitespace tokens: per token, each hash bit votes
    * +1/-1; the fingerprint keeps the sign of each bit's vote sum.
    * Bit tests use pure modular arithmetic (h mod 2^(j+1) >= 2^j) so the
    * oracle can reproduce them; one explode + 60 conditional sums, all
    * map-side combined.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .withColumn("h", hash60(col("w")))
    val votes = (0 until SimBits).map { j =>
      val lo = lit(1L << j)
      val hi = lit(if (j + 1 == 63) Long.MaxValue else (1L << (j + 1)))
      sum(when(col("h") % hi >= lo, 1).otherwise(-1)).as(s"v$j")
    }
    val agg = tok.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val fp = (0 until SimBits)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col(idCol), fp.as("simhash"))
  }

  /** Near-dup pairs by Hamming distance <= maxHamming, using pigeonhole
    * candidate generation: the 60-bit fingerprint splits into
    * (maxHamming+1) chunks; any pair within distance must agree on at
    * least one chunk, so the self-join on (chunkIdx, chunkValue) finds
    * every qualifying pair — identical output to brute force, without the
    * all-pairs product.
    */
  def simhashPairs(simDf: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val width = SimBits / chunks
    val chunked = simDf.select(
      col(idCol).as("id"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        // integer chunk extraction: (sim mod 2^((c+1)w)) div 2^(cw);
        // Column./ is double division, which loses bits past 2^53
        struct(lit(c).as("ck"),
          expr(s"CAST((simhash % ${1L << ((c + 1) * width)}) DIV ${1L << (c * width)} AS BIGINT)")
            .as("cv"))
      }: _*)).as("chunk"))
      .select(col("id"), col("simhash"), col("chunk.ck"), col("chunk.cv"))
    val a = chunked.select(col("ck"), col("cv"), col("id").as("id_a"), col("simhash").as("sim_a"))
    val b = chunked.select(col("ck"), col("cv"), col("id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("ck", "cv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bitCount(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  private def bitCount(c: Column): Column = bit_count(c)
}
