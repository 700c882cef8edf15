package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import PortableHash.hash60

/** Text-analysis operators for corpus curation: language ID, quality
  * scoring, token counting, and document fingerprinting. All pure Column
  * expressions (codegen-friendly, no UDFs), each reproducible by the
  * DuckDB oracle.
  *
  * Every operator takes the token array as an explicit column so callers
  * materialize the regex split once per row ([[analyze]] does this);
  * inlining `tokens(text)` into each consumer would re-run the split per
  * use.
  */
object TextAnalysis {

  /** Tiny per-language marker-word profiles for the n-gram/stopword
    * heuristic. Deliberately small and fixed: the operator's contract is
    * the deterministic scoring procedure, not model quality.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "ne", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "un", "una"))

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    aggregate(
      transform(toks, w => when(w.isin(words.map(lit): _*), 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)

  /** Language ID: CJK codepoint check first (any char >= U+4E00), then the
    * profile with the most marker-word hits; ties resolve in profile
    * order; zero hits → "und" (undetermined).
    */
  def langId(toks: Column): Column = {
    val maxCp = aggregate(
      transform(toks, w => ascii(w)), lit(0),
      (acc, x) => greatest(acc, x))
    val scored = langProfiles.map { case (l, ws) => (l, stopwordHits(toks, ws)) }
    val best = scored.map(_._2).reduce(greatest(_, _))
    // earlier profiles win ties (build from the right so "en" is outermost)
    val pick = scored.reverse.foldLeft(lit("und"): Column) { case (els, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(els)
    }
    when(maxCp >= 0x4E00, lit("zh")).otherwise(pick)
  }

  /** Heuristic quality score in [0,1]: blend of length band, mean word
    * length band, punctuation density, and stopword ratio. Portable
    * arithmetic only (no libm beyond division).
    */
  def qualityScore(text: Column, toks: Column): Column = {
    val nChars = length(text).cast("double")
    val nWords = size(toks).cast("double")
    val punct = (length(text) - length(translate(text, ".,!?;:", ""))).cast("double")
    val stops = stopwordHits(toks, langProfiles.flatMap(_._2).distinct).cast("double")
    val lenScore = when(nChars >= 100 && nChars <= 10000, 1.0)
      .when(nChars < 100, nChars / 100.0)
      .otherwise(lit(10000.0) / nChars)
    val wordLenScore = {
      val avg = nChars / greatest(nWords, lit(1.0))
      when(avg >= 3.0 && avg <= 12.0, 1.0).otherwise(0.5)
    }
    val punctScore = when(punct / greatest(nChars, lit(1.0)) <= 0.1, 1.0).otherwise(0.5)
    val stopScore = when(stops / greatest(nWords, lit(1.0)) >= 0.05, 1.0).otherwise(0.7)
    round((lenScore * 0.4 + wordLenScore * 0.2 + punctScore * 0.2 + stopScore * 0.2), 6)
  }

  /** Whitespace token count. */
  def wsTokenCount(toks: Column): Column = size(toks).cast("long")

  /** BPE-ish token count: runs of letters, runs of digits, and single
    * other non-space chars — the classic pre-tokenizer regex.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Order-sensitive 40-bit document fingerprint: position-salted word
    * hashes summed mod 2^40. Associative sum → shuffle-order independent,
    * yet any word swap changes the value (the position is inside the
    * hash). Mirrors a rolling-hash contract without non-portable modpow.
    */
  def fingerprint(toks: Column): Column = {
    val salted = zip_with(toks, sequence(lit(0), size(toks) - 1),
      (w, i) => hash60(concat(i.cast("string"), lit(":"), w)) % lit(1L << 40))
    aggregate(salted, lit(0L), (acc, x) => acc + x) % lit(1L << 40)
  }

  /** Repetition metrics (Gopher-style quality filters): the fraction of
    * the document covered by its single most frequent word and most
    * frequent word bigram. Highly repetitive machine-generated text
    * scores near 1; natural text stays low. Only counts are exposed (not
    * the words themselves) so ties cannot break determinism, and the
    * fractions are BIGINT/BIGINT divisions — bit-identical IEEE results
    * in every engine.
    *
    * Scale design: explode → two-level map-side-combined groupBy per
    * metric (per-(doc, term) counts, then per-doc max/sum) — all
    * shuffles are keyed on the doc id, volume O(distinct terms), never
    * pairs. The in-row alternative (`transform` over `array_distinct`)
    * is O(distinct·len) PER DOCUMENT and dies on long repetitive docs —
    * exactly the ones this filter exists to catch.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // persisted: the word and bigram branches would otherwise each re-run
    // the tokenize subtree (same re-inlining trap ngramJaccardPairs
    // documents); at warehouse scale, stage the tokenized base instead
    val base = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), Dedup.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"), Dedup.shinglesOf(col("toks"), 2).as("bgs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val words = base.select(col(idCol), explode(col("toks")).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(sum("n").as("n_words"), max("n").as("top_word_n"))
    val bigrams = base.select(col(idCol), explode(col("bgs")).as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(sum("n").as("n_bigrams"), max("n").as("top_bigram_n"))
    // left join: single-word documents have no bigrams at all
    words.join(bigrams, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("top_bigram_n", coalesce(col("top_bigram_n"), lit(0L)))
      .select(col(idCol), col("n_words"), col("top_word_n"),
        (col("top_word_n").cast("double") / col("n_words")).as("top_word_frac"),
        col("n_bigrams"), col("top_bigram_n"),
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(col("top_bigram_n").cast("double") / col("n_bigrams"))
          .as("top_bigram_frac"))
  }

  /** Markup / PII patterns shared with the DuckDB oracle. Kept inside
    * the RE2 ∩ java.util.regex common subset (no backrefs, no
    * lookaround) so both engines match identically. Whitespace is an
    * EXPLICIT class, not `\s`: Java's `\s` includes vertical tab
    * U+000B, RE2's does not — the one place the dialects' shorthands
    * diverge on this surface.
    */
  val TagRe = "<[^>]*>"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9 ()-]{5,}[0-9]"
  val WsRe = "[ \\t\\n\\x0B\\f\\r]+"

  /** Text cleaning for ingestion pipelines: strip markup, redact
    * emails/phone-shaped spans, collapse whitespace. The `n_*` columns
    * count PATTERN OCCURRENCES IN THE ORIGINAL TEXT — because the
    * replacements run sequentially on transformed text, they are not
    * exact audit totals of the redactions performed (a tag strip can
    * create a phone-shaped span that was never counted; an email match
    * can consume a digit run the phone counter saw). Pure Column
    * expressions; one projection, no shuffle at all.
    */
  def cleanText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val cleaned = trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(t, TagRe, " "),
          EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      WsRe, " "))
    df.select(
      col(idCol),
      cleaned.as("clean_text"),
      size(regexp_extract_all(t, lit(TagRe), lit(0))).cast("long").as("n_tags"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"))
  }

  /** Vocabulary induction: the `k` most frequent words corpus-wide with
    * total and document frequencies (the seed table for BPE-style
    * tokenizer training and frequency-based filters). Deterministic
    * tie-break: count desc, then word.
    *
    * Scale design: one map-side-combined groupBy on the word, then
    * Spark's distributed partial top-k (`TakeOrderedAndProject` — every
    * partition keeps k, the driver merges k·p rows), never a
    * single-partition global window. No pre-explode repartition: tokens
    * explode map-side from whatever layout the scan produced, and the
    * word groupBy shuffles (with partial aggregation) regardless — a
    * repartition here would add a second corpus-sized exchange for
    * nothing.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val words = df
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("word"))
    words.groupBy("word")
      .agg(count(lit(1)).as("tf"),
        count_distinct(col(idCol)).as("df"))
      .orderBy(col("tf").desc, col("word"))
      .limit(k)
  }

  /** Per-document top-`k` characteristic terms by a TF-IDF-style score
    * with NO libm on the result path (log() differs across engines by
    * ulps): score = tf · n_docs / df, exact-integer products under 2^53
    * divided once in IEEE double — bit-identical everywhere. Rank ties
    * break by term.
    *
    * Scale design: per-(doc, word) counts and per-word document
    * frequencies are both map-side-combined aggregates; the join back is
    * hash-partitioned on the word (df rows are one per word — no skew
    * amplification); ranking is a window partitioned per document.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // no pre-explode repartition (see vocabulary): the (doc, word)
    // groupBy shuffles with map-side combine anyway
    val words = df
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("word"))
    val tf = words.groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    // df per word FROM tf: tf's keys already ARE the distinct (doc, word)
    // pairs, so this is one extra map-side-combined agg — no second pass
    // over the exploded tokens, and `words` has a single consumer
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    // corpus size as a lazy 1-row broadcast, not an eager driver count —
    // construction stays action-free like every other operator here
    val nDocs = df.select(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("word"))
    tf.join(dfreq, "word").crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("term_rank", row_number().over(w))
      .where(col("term_rank") <= k)
      .select(col(idCol), col("word"), col("tf"), col("df"), col("score"), col("term_rank"))
  }

  /** All text-analysis columns over a corpus in one pass: tokens are
    * materialized once per row, and the input is spread across cores
    * first (small single-file sources otherwise serialize the work).
    */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), col(textCol).as("text_"), Dedup.tokens(col(textCol)).as("toks"))
      .select(
        col(idCol),
        langId(col("toks")).as("lang_pred"),
        qualityScore(col("text_"), col("toks")).as("quality"),
        wsTokenCount(col("toks")).as("n_ws_tokens"),
        regexTokenCount(col("text_")).as("n_re_tokens"),
        fingerprint(col("toks")).as("fingerprint"))

  /** Corpus-trained bigram language-model likelihood per document — the
    * CCNet-style "perplexity filter" signal, with the KenLM external
    * model replaced by add-k-smoothed bigram counts trained on the corpus
    * itself in one pass. Per document: the mean over its bigrams of
    *   ln((c(w1 w2) + k) / (c(w1·) + k·V))
    * where c(w1 w2) is the corpus bigram count, c(w1·) the count of w1 as
    * a bigram prefix, and V the corpus vocabulary size. Low scores mark
    * documents whose word transitions are rare in the corpus — the same
    * ranking perplexity gives (perplexity = exp(-score)). The mean is
    * rounded to 4 decimals: double-sum order across partitions is
    * nondeterministic at the 1e-13 level.
    *
    * Returns (id, n_bigrams, avg_logp) for every document with at least
    * one bigram; shorter documents have no transitions to score and are
    * omitted. Scoring is self-trained, so every document bigram exists in
    * the count table (inner joins are exact); scoring a FOREIGN corpus
    * against these counts would need left joins with the unseen-bigram
    * fallback ln(k / (c(w1·) + k·V)).
    *
    * Scale design (100 TB): bigram construction is per-row Column work
    * (no window, no self-join); both count tables map-side combine before
    * their shuffle; the prefix table derives from the bigram table
    * without re-reading the corpus; V rides along as a broadcast scalar.
    * The score join shuffles on (w1, w2) — both sides pre-aggregated, so
    * the join input is bounded by corpus size + distinct-bigram count.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    k: Double = 1.0): DataFrame = {
    require(k > 0, s"smoothing k must be > 0, got $k")
    val spark = df.sparkSession
    // bigram expansion as a position GENERATOR + in-row element_at, not
    // transform(...struct...): higher-order functions are CodegenFallback
    // (one interpreted lambda dispatch per token), while explode(sequence)
    // and the element_at projection run inside whole-stage codegen — the
    // same (w1, w2) rows, and this subtree executes once per consumer
    // (the count chain and the join-back), so its per-row cost counts
    // double
    val bigrams = df
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), Dedup.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"), explode(
        when(size(col("toks")) >= 2, sequence(lit(0), size(col("toks")) - 2))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col(idCol),
        element_at(col("toks"), col("i") + 1).as("w1"),
        element_at(col("toks"), col("i") + 2).as("w2"))
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val vocab = df
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    bigrams
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((col("c2") + k) / (col("c1") + col("v") * k)).as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(avg(col("lp")), 4).as("avg_logp"))
  }

  /** BM25 top-k document search for a constant query-term set — the
    * relevance ranking a corpus-curation pipeline uses to pull topical
    * slices ("find the k documents most about X") without an inverted
    * index. Per document d and term t:
    *   score(d,t) = idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    * with the RATIONAL idf (n − df + 0.5)/(df + 0.5): the classic log()
    * of that ratio is a monotone transform (ranking-identical), and
    * keeping the whole formula inside +,−,×,÷ makes every step an
    * exactly-rounded IEEE op the DuckDB oracle reproduces bit-for-bit
    * instead of trusting two libm ln() implementations to agree (the
    * final ROUND(…, 6) is belt-and-braces on top). k1 = 1.2, b = 0.75
    * are the standard Robertson defaults; they are baked as literals so
    * the oracle can spell the identical doubles.
    *
    * Output: (id, tf0..tfN, dl, score) for the k best-scoring documents
    * containing at least one query term, ties to the smallest id.
    *
    * Scale design (100 TB): term frequencies come from in-row
    * `filter(toks, …)` — no explode, no token shuffle, the per-doc row
    * stays a handful of longs. Corpus statistics (n, Σdl, per-term df)
    * are ONE map-side-combined aggregate producing a 1-row frame that
    * broadcasts to the scoring pass; the ranking is a TakeOrdered
    * (per-partition top-k, k rows to the driver), never a global sort.
    */
  def bm25Search(df: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25Search needs at least one query term")
    require(k > 0, s"top-k size must be positive, got $k")
    val spark = df.sparkSession
    // bind the token array to its own projection (see shinglesOf): the
    // per-term lambdas below would otherwise re-run the regex split
    val base = df
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), Dedup.tokens(col(textCol)).as("toks"))
      .select(
        col(idCol) +:
          size(col("toks")).cast("long").as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(col("toks"), w => w === lit(t))).cast("long").as(s"tf$i")
          }: _*)
    val stats = base.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("dl")).cast("long").as("sdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).cast("long").as(s"df$i")): _*)
    val nD = col("n").cast("double")
    val avgdl = col("sdl").cast("double") / nD
    def termScore(i: Int): Column = {
      val dfd = col(s"df$i").cast("double")
      val idf = ((nD - dfd) + lit(0.5)) / (dfd + lit(0.5))
      val tfd = col(s"tf$i").cast("double")
      // 1 − b = 0.25 and b = 0.75 are exact binary doubles; k1+1 is
      // spelled (1.2 + 1.0) on BOTH sides because double(1.2)+1.0 need
      // not equal the nearest double to the literal 2.2
      val den = tfd + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl))
      idf * ((tfd * (lit(1.2) + lit(1.0))) / den)
    }
    val score = terms.indices.map(termScore).reduce(_ + _) // left-assoc, fixed order
    val anyHit = terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _)
    base.crossJoin(broadcast(stats))
      .where(anyHit)
      .withColumn("score", round(score, 6))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol) +: terms.indices.map(i => col(s"tf$i")) :+ col("dl") :+ col("score"): _*)
  }

  /** PII patterns shared by [[redactPii]] and its oracle. Kept in the
    * portable intersection of Java regex (Spark codegen) and RE2
    * (DuckDB): no lookaround, no backreferences — the same pattern
    * string must mean the same language in both engines.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "\\d{3}[-. ]\\d{3}[-. ]\\d{4}", "[PHONE]"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"))

  /** Redact personally-identifiable substrings (emails, NANP-style
    * phone numbers, IPv4 literals) before a corpus ships to training,
    * and count what was removed per document (`n_email`/`n_phone`/
    * `n_ip` — the audit trail a compliance pass needs). Counts are
    * taken on the ORIGINAL text, then replacements apply in fixed
    * pattern order, so overlapping matches resolve identically in any
    * engine. Pure `regexp_count`/`regexp_replace` Columns: per-row
    * work inside whole-stage codegen, zero shuffles, scan-width
    * bounded by the text column itself.
    */
  /** Weak-label quality filter, the CCNet/fasttext curation pattern
    * with public pieces: distill a cheap heuristic label (the caller's
    * `label` Column — a length gate, a repetition verdict, a bad-word
    * list) into a Bernoulli Naive-Bayes classifier over fixed
    * marker-word presence features, then score every document. The
    * model IS two rows of counts, so training is ONE map-side-combined
    * aggregate over the corpus and the fitted classifier broadcasts to
    * the scoring pass — no iterations, no driver-side optimization, and
    * the DuckDB oracle can re-fit it exactly.
    *
    * Numeric discipline (cf. [[bm25Search]]): counts are exact longs;
    * each Laplace probability and ratio is a fixed sequence of
    * exactly-rounded IEEE ops; only `ln` is libm-dependent, so the
    * per-document sum is spelled in FIXED left-assoc term order and the
    * result rounded to 4 dp. `predicted` compares the ROUNDED score,
    * keeping the decision reproducible too.
    *
    * Output: (id, weak_label, score, predicted) — score > 0 reads
    * "more like the positive class than the negative".
    */
  def nbQualityFilter(df: DataFrame, idCol: String, textCol: String,
                      label: Column, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "nbQualityFilter needs at least one feature term")
    val base = df.select(
      col(idCol) +: label.as("weak_label") +:
        terms.zipWithIndex.map { case (t, i) =>
          array_contains(Dedup.tokens(col(textCol)), t).as(s"f$i")
        }: _*)
    val stats = base.agg(
      sum(when(col("weak_label"), 1L).otherwise(0L)).cast("long").as("np"),
      sum(when(!col("weak_label"), 1L).otherwise(0L)).cast("long").as("nn") +:
        terms.indices.flatMap(i => Seq(
          sum(when(col("weak_label") && col(s"f$i"), 1L).otherwise(0L))
            .cast("long").as(s"dp$i"),
          sum(when(!col("weak_label") && col(s"f$i"), 1L).otherwise(0L))
            .cast("long").as(s"dn$i"))): _*)
    def dbl(c: Column): Column = c.cast("double")
    val prior = log(dbl(col("np")) / dbl(col("nn")))
    val termScores = terms.indices.map { i =>
      // Laplace presence probabilities per class, each step an
      // exactly-rounded double op in the same order as the oracle SQL
      val pp = (dbl(col(s"dp$i")) + lit(1.0)) / (dbl(col("np")) + lit(2.0))
      val pn = (dbl(col(s"dn$i")) + lit(1.0)) / (dbl(col("nn")) + lit(2.0))
      when(col(s"f$i"), log(pp / pn))
        .otherwise(log((lit(1.0) - pp) / (lit(1.0) - pn)))
    }
    val score = termScores.foldLeft(prior)(_ + _) // fixed left-assoc order
    base.crossJoin(broadcast(stats))
      .withColumn("score", round(score, 4))
      .select(col(idCol), col("weak_label"), col("score"),
        (col("score") > 0).as("predicted"))
  }

  /** Inverted index build: term → document frequency, collection
    * frequency, and a doc-ordered posting list `"id:tf,id:tf,…"`. The
    * index behind contamination checks and corpus search ([[bm25Search]]
    * recomputes scores from raw text; real serving builds this once).
    *
    * Scale shape: explode → per-(term, doc) counts (map-side combined)
    * → ONE per-term aggregation computing df, cf, and the capped posting
    * list together, with `minDf` pruning the hapax tail (most of the
    * vocabulary by key count) from the OUTPUT after that aggregation.
    * Deliberately one-pass: pre-filtering hapaxes before list-building
    * would need a second df aggregation plus a join back, and the work
    * the one-pass shape "wastes" on a hapax is a length-1 list — far
    * cheaper than the extra shuffle. The posting list is the one
    * unbounded state per key, so it is CAPPED at `maxPostings` entries
    * (smallest doc ids kept — deterministic), the standard
    * posting-prune move: df/cf stay exact over ALL docs, only the
    * materialized list truncates.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    minDf: Long, maxPostings: Int): DataFrame = {
    val tf = df
      .select(col(idCol).as("id"), explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy("term", "id").agg(count(lit(1)).as("tf"))
    tf.groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum("tf").cast("long").as("cf"),
        // sort_array on struct(id, tf) orders by id; slice caps the list
        array_join(
          transform(
            slice(sort_array(collect_list(struct(col("id"), col("tf")))),
              1, maxPostings),
            p => concat(p.getField("id").cast("string"), lit(":"),
              p.getField("tf").cast("string"))),
          ",").as("postings"))
      .where(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"), col("postings"))
  }

  /** Training context windows: each document's token stream cut into
    * windows of `window` tokens at `stride`-token steps — the
    * fixed-context examples an LM training run consumes (stride <
    * window gives overlapping contexts). Windows start at
    * 0, stride, 2·stride, … up to the last start where a full window
    * fits; a document shorter than `window` emits its whole token
    * stream as the single (short) window 0.
    *
    * Scale shape: one in-row `sequence` + explode per document — output
    * volume is tokens/stride rows per doc (bounded by the stride
    * choice), no shuffle at all until whatever consumes the windows.
    */
  def contextWindows(df: DataFrame, idCol: String, textCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, s"window/stride must be positive: $window/$stride")
    df.select(col(idCol), Dedup.tokens(col(textCol)).as("toks"))
      .withColumn("nw", size(col("toks")).cast("long"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0L), greatest(col("nw") - window, lit(0L)),
          lit(stride.toLong))).as("start_pos"))
      .withColumn("window_toks", slice(col("toks"), col("start_pos") + 1, lit(window)))
      .select(col(idCol),
        (col("start_pos") / stride).cast("long").as("window_id"),
        col("start_pos"),
        size(col("window_toks")).cast("long").as("n_toks"),
        array_join(col("window_toks"), " ").as("window_text"))
  }

  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = PiiPatterns.map { case (name, pat, _) =>
      regexp_count(col(textCol), lit(pat)).cast("long").as(s"n_$name")
    }
    val redacted = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    df.select(col(idCol) +: counts :+ redacted.as("clean_text"): _*)
  }
}
