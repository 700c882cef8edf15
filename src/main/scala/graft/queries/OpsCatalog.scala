package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Bpe, Dedup, EventOps, Futures, Multimodal, Quantiles, RangeJoin, Sampling, SemiStructured, Similarity, Sketches, TextAnalysis, TopFraction}
import graft.ops.PortableHash.{duckHash60 => dh}

/** Query + oracle entries for the training-data-pipeline operators
  * (dedup, similarity search, text analysis, multimodal plumbing,
  * event-time windowing). The Spark side runs the graft.ops library; the
  * oracle side is DuckDB SQL replicating the exact same deterministic
  * semantics (portable md5-derived hashes, integer/decimal-exact sums).
  */
object OpsCatalog {

  private val K = 8            // minhash signature length
  private val ShingleN = 3     // word shingle width
  private val Bands = 4        // LSH bands (of K/Bands rows each)
  private val MaxDf = 50       // stop-shingle document-frequency cap
  private val JaccThresh = 0.05
  private val MaxHamming = 14  // simhash near-dup radius (60-bit hashes)
  private val CosThresh = 0.35
  private val TopK = 5
  private val IvfCentMod = 32  // deterministic centroid rule: vec_id % 32 == 0
  private val IvfNprobe = 2    // probe the 2 nearest cells per query
  private val TempTotal = 300L // temperature-sample draw size (q101)
  private val ContThresh = 0.25 // Broder containment threshold (q103)
  private val PackBudget = 512L // tokens per packed training sequence
  private val SessionGapNs = 8L * 3600 * 1000000000L // 8h session gap (epoch-nanos)
  private val ShuffleShards = 16 // training shards for the corpus shuffle
  private val VocabK = 100       // vocabulary induction size
  private val TopTermsK = 3      // characteristic terms per document
  private val HllLgK = 12        // 2^12 HLL registers (~1.6% rel. std. err.)
  private val HllRtol = 0.05     // accepted estimate band (≈3 sigma)
  private val CmsEps = 0.001     // CMS over-count bound: eps * total tokens
  private val CmsTopK = 20       // heavy hitters checked against the CMS
  // target domain mixture for q76: upsample src0 2.5x, keep 1/4 of
  // src1, drop src2 entirely, pass everything else through at 1.0
  private val MixWeights = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0)
  private val ZBits = 8          // z-order bits per dimension (q77)
  private val ZBoxLo = 32L       // 2-D box probed on the z-ordered table
  private val ZBoxHi = 95L
  private val PqM = 8            // PQ subspaces over the 64-dim embeddings
  private val PqSubDim = 8       // dims per subspace
  private val PqCodeMod = 48     // deterministic codebook: vec_id % 48 == 0
  private val ChunkW = 4         // tokens per chunk for sub-document dedup (q79)
  private val LmK = 1.0          // add-k smoothing for the bigram LM (q80)
  private val OrcKeyLo = 1000L   // pushed key range probed on the ORC copy (q81)
  private val OrcKeyHi = 3000L
  private val QuantProbs = Seq(0.5, 0.9, 0.99)  // exact quantiles (q82)
  private val Bm25Terms = Seq("join", "vector", "spark") // q89 query terms
  private val Bm25K = 20         // q89 result size
  private val OrderParts = 8     // range partitions for the q91 global order
  private val CapK = 25          // per-source document cap (q93)
  private val CapSalts = 8       // q93 skew sub-buckets
  private val BudgetTokens = 1000000L // q94 global token budget
  private val NbTerms = Seq("the", "a", "join", "vector", "scan", "filter",
    "group", "hash", "batch", "window", "stream", "customer") // q95 features
  private val NbLabelChars = 300L // q95 weak label: n_chars > 300
  private val WavRate = 16000    // q96 synthetic WAV sample rate
  private val WavSamples = 1600  // q96 samples per clip (0.1 s)
  private val VidW = 16          // q97 frame raster
  private val VidH = 16
  private val VidFrames = 4      // q97 frames per clip
  private val PivotStatuses = Seq("F", "O") // q104 pivot columns (known domain)
  private val InvMinDf = 5       // q106 inverted index: drop the hapax tail
  private val InvMaxPostings = 20 // q106 posting-list cap per term
  private val WSampleK = 40      // q107 weighted-sample size
  private val CtxWindow = 32     // q108 context window (tokens)
  private val CtxStride = 24     // q108 window stride (overlapping)
  private val EditMaxFrac = 0.35 // q109 normalized edit-distance ceiling
  private val DupL = 20          // q110 duplicated-substring gram length (chars)
  private val FunnelSteps = Seq("view", "click", "purchase") // q111 ordered funnel
  private val RollingDays = 7    // q113 trailing active-user window (days)
  private val BpeMerges = 16     // q115 learned merge count
  private val GroupQuantP = 0.95 // q117 per-group continuous quantile

  // Layout-rewriting queries (q65/q69) materialize a table copy under a
  // temp dir. Memoize per (tag, source) so the bench's warm+3-timed
  // protocol measures the READ path after the first write instead of
  // four rewrites, and delete everything on JVM exit so repeated
  // bench/verify runs don't fill /tmp with table copies.
  private val materialized = scala.collection.concurrent.TrieMap.empty[String, String]
  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }
  private def tempOutput(tag: String, srcDir: String)(write: String => Unit): String =
    materialized.getOrElseUpdate(s"$tag|$srcDir", {
      val out = java.nio.file.Files.createTempDirectory(s"graft_${tag}_").toString
      write(out)
      sys.addShutdownHook(deleteRec(new java.io.File(out)))
      out
    })

  // ---- Spark-side query functions -----------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // top-20%-by-score cut (augment.py:18-21); oracle in Catalog.duckOnly
    "q22_topk_window" -> { (s, dir) =>
      TopFraction.topFraction(Tables.load(s, dir, "events"), "value", "event_id", 0.2)
        .select("event_id", "value").orderBy("event_id")
    },
    // relational pivot with the value domain DECLARED (no driver-side
    // distinct-collect pass — .pivot(col) alone scans the table to find
    // the columns, the classic hidden job at scale); decimal-exact sums
    "q104_pivot" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .withColumn("qd", col("l_quantity").cast("decimal(14,2)"))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", PivotStatuses)
        .agg(sum(col("qd")))
        .select(col("l_returnflag") +:
          PivotStatuses.map(st =>
            col(st).cast("double").as(s"qty_${st.toLowerCase}")): _*)
        .orderBy("l_returnflag")
    },
    // CUBE over two dims with grouping_id — all four grouping sets in
    // one pass (partial-agg combined), decimal-exact sums
    "q105_cube" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .withColumn("qd", col("l_quantity").cast("decimal(14,2)"))
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          sum(col("qd")).cast("double").as("qty"))
        .select("gid", "l_returnflag", "l_linestatus", "n", "qty")
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },
    // inverted index: term -> df/cf + doc-ordered capped posting list
    "q106_inverted_index" -> { (s, dir) =>
      TextAnalysis.invertedIndex(Tables.load(s, dir, "documents"), "doc_id", "text",
          InvMinDf, InvMaxPostings)
        .orderBy("term")
    },
    // deterministic weighted sample: priority = hash(id)/n_chars, k smallest
    "q107_weighted_sample" -> { (s, dir) =>
      Sampling.weightedSample(
          Tables.load(s, dir, "documents").withColumn("w", col("n_chars")),
          "doc_id", "w", WSampleK)
        .orderBy("doc_id")
    },
    // LM training context windows: CtxWindow tokens at CtxStride steps
    "q108_context_windows" -> { (s, dir) =>
      TextAnalysis.contextWindows(Tables.load(s, dir, "documents"), "doc_id", "text",
          CtxWindow, CtxStride)
        .orderBy("doc_id", "window_id")
    },
    "q30_dedup_exact" -> { (s, dir) =>
      Dedup.exact(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("content_hash")
    },
    "q31_minhash_sig" -> { (s, dir) =>
      Dedup.minhashSignatures(Tables.load(s, dir, "documents"), "doc_id", "text", K, ShingleN)
        .orderBy("doc_id", "seed")
    },
    "q32_lsh_candidates" -> { (s, dir) =>
      val wide = Dedup.minhashSignaturesWide(Tables.load(s, dir, "documents"), "doc_id", "text", K, ShingleN)
      Dedup.lshCandidates(Dedup.lshBandsWide(wide, "doc_id", Bands, K / Bands), "doc_id")
        .orderBy("id_a", "id_b")
    },
    "q33_ngram_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
          ShingleN, MaxDf, JaccThresh)
        .orderBy("id_a", "id_b")
    },
    // Broder containment: asymmetric |A∩B|/|A| near-dup signal — catches
    // quote-inclusion pairs whose symmetric Jaccard stays tiny
    "q103_containment" -> { (s, dir) =>
      Dedup.containmentPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
          ShingleN, MaxDf, ContThresh)
        .orderBy("id_a", "id_b")
    },
    // two-phase near-dup: LSH proposes candidate pairs, EXACT Levenshtein
    // disposes — the character-level metric shingle overlap can't fake
    "q109_edit_distance" -> { (s, dir) =>
      Dedup.editDistancePairs(Tables.load(s, dir, "documents"), "doc_id", "text",
          K, ShingleN, Bands, EditMaxFrac)
        .orderBy("id_a", "id_b")
    },
    // Lee et al. exact-substring dedup signal: fraction of each doc
    // covered by length-DupL char grams that occur >= 2 times corpus-wide
    "q110_dup_spans" -> { (s, dir) =>
      Dedup.dupSpans(Tables.load(s, dir, "documents"), "doc_id", "text", DupL)
        .orderBy("doc_id")
    },
    // BPE merge learning (Sennrich vocab formulation): no SQL-oracle
    // form exists (per-round argmax-then-rewrite fixpoint), so the
    // driver records rows-only; BpeSpec's independent driver-side
    // reference implementation is the correctness anchor
    "q115_bpe_merges" -> { (s, dir) =>
      import s.implicits._
      Bpe.learnMerges(Tables.load(s, dir, "documents"), "text", BpeMerges)
        .toDF("rank", "left_sym", "right_sym", "merged", "pair_count")
        .orderBy("rank")
    },
    "q34_simhash" -> { (s, dir) =>
      Dedup.simhash(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },
    "q35_simhash_pairs" -> { (s, dir) =>
      val sim = Dedup.simhash(Tables.load(s, dir, "documents"), "doc_id", "text")
      // exact-recall verification config: radius 14 keeps ~94% of random
      // chunk collisions, fine at 500 docs, quadratic at corpus scale —
      // the explicit override is the documented opt-in (see simhashPairs)
      Dedup.simhashPairs(sim, "doc_id", MaxHamming, maxCollisionFraction = 1.0)
        .orderBy("id_a", "id_b")
    },
    "q36_text_analyze" -> { (s, dir) =>
      TextAnalysis.analyze(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },
    "q37_multimodal_features" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      val feats = Multimodal.extractFeatures(
        Multimodal.toAssets(Tables.load(s, dir, "documents"), "doc_id", "text"))
      feats.toDF().select(
        col("asset_id") +: col("modality") +: col("n_bytes") +:
          (0 until Multimodal.FeatureDim).map(j => col("feature")(j).as(s"f$j")): _*)
        .orderBy("asset_id")
    },
    // REAL codec path: synthesize per-doc grayscale PNGs through the
    // actual PNG writer, decode through the actual PNG reader
    // (javax.imageio), and oracle-check the recovered pixel stats —
    // PNG is lossless and the synthetic raster is analytic, so DuckDB
    // reproduces the exact values without any image library
    "q75_image_decode" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      val assets = Multimodal.synthPngAssets(
        Tables.load(s, dir, "documents"), "doc_id", width = 16, height = 16)
      Multimodal.imageFeatures(assets).toDF().orderBy("asset_id")
    },
    // REAL pixel resize: encode 16x16 PNGs, nearest-neighbor downsample
    // to 8x8 through decode->resample->re-encode, then decode the
    // PRODUCT for stats — dst(x,y) = src(2x,2y), so the oracle computes
    // the resized raster analytically from the generation formula
    "q102_image_resize" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      val assets = Multimodal.synthPngAssets(
        Tables.load(s, dir, "documents"), "doc_id", width = 16, height = 16)
      val small = Multimodal.resizeImages(assets.toDF(), targetW = 8, targetH = 8)
      Multimodal.imageFeatures(small.toDF()).toDF().orderBy("asset_id")
    },
    // real augmentation pass: encode 16x16 PNGs, horizontal-flip through
    // decode->mirror->re-encode, then decode the PRODUCT for half-raster
    // sums — global stats are mirror-invariant, so the left/right sums
    // are what PROVE the flip: the oracle computes them analytically
    // from the generation formula with the x index mirrored
    "q116_image_flip" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      val assets = Multimodal.synthPngAssets(
        Tables.load(s, dir, "documents"), "doc_id", width = 16, height = 16)
      val flipped = Multimodal.flipImages(assets.toDF())
      Multimodal.imageHalfStats(flipped.toDF()).toDF().orderBy("asset_id")
    },
    // real RIFF/WAVE container round-trip: synthesize 16-bit mono PCM,
    // decode via the chunk-walking parser, emit exact sample stats the
    // oracle computes analytically from the generation formula
    "q96_audio_decode" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      val assets = Multimodal.synthWavAssets(
        Tables.load(s, dir, "documents"), "doc_id", WavRate, WavSamples)
      Multimodal.audioFeatures(assets).toDF().orderBy("asset_id")
    },
    // corpus snapshot diff: the "new" snapshot drops ids % 7 == 0,
    // rewrites text where % 5 == 0, and adds fresh ids — the diff must
    // label every id by content hash, not by presence alone
    "q99_corpus_diff" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val newSnap = docs.where(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .unionByName(docs.where(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 10000L).as("doc_id"), col("text"),
            col("lang"), col("source"), col("n_chars")))
      Dedup.corpusDiff(docs, newSnap, "doc_id", "text")
        .groupBy("status").agg(count(lit(1)).cast("long").as("n_docs"))
        .orderBy("status")
    },
    // schema evolution: an old shard (2 cols) and a new shard (3 cols)
    // land in ONE directory; the proven mergeSchema read sees the union
    // with pre-evolution rows NULL in the new column
    "q98_schema_evolution" -> { (s, dir) =>
      import graft.sources.EvolvingStore
      val out = tempOutput("q98", dir) { o =>
        val li = Tables.load(s, dir, "lineitem")
        EvolvingStore.appendShard(
          li.where(col("l_orderkey") % 2 === 0).select("l_orderkey", "l_quantity"), o)
        EvolvingStore.appendShard(
          li.where(col("l_orderkey") % 2 === 1)
            .select("l_orderkey", "l_quantity", "l_returnflag"), o)
      }
      EvolvingStore.readMergedProven(s, out,
          Seq("l_orderkey", "l_quantity", "l_returnflag"))
        .groupBy(coalesce(col("l_returnflag"), lit("<pre-evolution>")).as("rflag"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("l_quantity").cast("decimal(14,2)")).cast("double").as("sum_qty"))
        .orderBy("rflag")
    },
    // packed-real-PNG-frames container: every frame goes through the
    // actual ImageIO decode; temporal activity = avg |Δ frame mean|
    "q97_video_decode" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      val assets = Multimodal.synthVideoAssets(
        Tables.load(s, dir, "documents"), "doc_id", VidW, VidH, VidFrames)
      Multimodal.videoFeatures(assets).toDF().orderBy("asset_id")
    },
    "q38_ann_topk" -> { (s, dir) =>
      Similarity.bruteForceTopK(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 100 === 0, TopK)
        .orderBy("id_a", "rank")
    },
    "q39_cosine_pairs" -> { (s, dir) =>
      Similarity.cosinePairs(Tables.load(s, dir, "embeddings"), "vec_id", "embedding", CosThresh)
        .orderBy("id_a", "id_b")
    },
    // approximate ANN path, oracle-checked via hash-derived hyperplanes
    "q40_srp_ann" -> { (s, dir) =>
      Similarity.lshBucketTopK(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 100 === 0, TopK, planes = 3)
        .orderBy("id_a", "rank")
    },
    // embedding-cosine near-dup dedup, SRP-bucketed (the scale path for
    // what q39 verifies all-pairs)
    "q42_embed_neardup" -> { (s, dir) =>
      Similarity.nearDupPairs(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          CosThresh, planes = 3)
        .orderBy("id_a", "id_b")
    },
    // IVF coarse-quantizer ANN: cells from deterministic centroids so the
    // oracle reproduces the exact Voronoi assignment
    "q43_ivf_ann" -> { (s, dir) =>
      Similarity.ivfTopK(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % IvfCentMod === 0, col("vec_id") % 100 === 0, TopK, IvfNprobe)
        .orderBy("id_a", "rank")
    },
    // one Lloyd iteration over the IVF cells: decimal-exact per-dim means
    "q44_kmeans_step" -> { (s, dir) =>
      Similarity.kmeansStep(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % IvfCentMod === 0)
        .orderBy("cell", "dim")
    },
    // hash-deterministic stratified train/valid/test split
    "q45_split" -> { (s, dir) =>
      Sampling.deterministicSplit(Tables.load(s, dir, "documents"), "doc_id", "lang", 80, 10)
        .select("doc_id", "lang", "split").orderBy("doc_id")
    },
    // fixed-size deterministic sample per stratum
    "q46_stratified_sample" -> { (s, dir) =>
      Sampling.stratifiedSample(Tables.load(s, dir, "documents"), "doc_id", "lang", 10)
        .select("doc_id", "lang", "sample_rank").orderBy("lang", "sample_rank")
    },
    // temperature-scaled mixture sampling: p_lang ∝ n^0.5, exact
    // largest-remainder allocation, hash-ranked per-group draw
    "q101_temperature_sample" -> { (s, dir) =>
      Sampling.temperatureSample(Tables.load(s, dir, "documents"), "doc_id", "lang", TempTotal)
        .orderBy("lang", "sample_rank")
    },
    // multi-probe SRP: each query also searches its 1-bit-flip buckets
    "q47_srp_multiprobe" -> { (s, dir) =>
      Similarity.srpMultiProbeTopK(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % 100 === 0, TopK, planes = 3)
        .orderBy("id_a", "rank")
    },
    // end-to-end corpus curation: text metrics -> exact-dedup keep ->
    // quality filter -> stratified split, all composed from the library
    "q48_curation" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val metrics = TextAnalysis.analyze(docs, "doc_id", "text")
      val keep = Dedup.exact(docs, "doc_id", "text").select(col("keep_id").as("doc_id"))
      val curated = metrics.join(keep, "doc_id").where(col("quality") >= 0.9)
      Sampling.deterministicSplit(curated, "doc_id", "lang_pred", 80, 10)
        .select("doc_id", "lang_pred", "quality", "split").orderBy("doc_id")
    },
    // connected components over the n-gram-Jaccard near-dup graph:
    // every doc labeled with the min doc id reachable through dup pairs
    "q49_dedup_clusters" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text", ShingleN, MaxDf, JaccThresh)
      Dedup.connectedComponents(edges, "id_a", "id_b", docs, "doc_id")
        .orderBy("doc_id")
    },
    // SemDeDup: Voronoi-cell clustering (q43's deterministic centroids),
    // within-cell cosine near-dup groups, keep the member LEAST similar
    // to its centroid (the diversity-preserving outlier)
    "q100_semantic_dedup" -> { (s, dir) =>
      Similarity.semanticDedup(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % IvfCentMod === 0, CosThresh)
        .orderBy("vec_id")
    },
    // the dedup pipeline's endpoint: cluster near-dups (as q49), then
    // keep ONE representative per cluster — highest n_chars, ties to
    // the smallest doc_id — via the map-side-combinable struct-max
    // (the oracle recomputes it as a ROW_NUMBER window)
    "q70_canonical_corpus" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text", ShingleN, MaxDf, JaccThresh)
      val labels = Dedup.connectedComponents(edges, "id_a", "id_b", docs, "doc_id")
      Dedup.keepBest(docs.join(labels, "doc_id"), "cluster_id", "doc_id", "n_chars")
        .select("doc_id", "cluster_id", "n_chars")
        .orderBy("cluster_id")
    },
    // benchmark-contamination: distinct train/eval 3-gram overlap per
    // eval doc (eval side = doc_id % 10 == 0)
    "q51_contamination" -> { (s, dir) =>
      Dedup.ngramContamination(Tables.load(s, dir, "documents"), "doc_id", "text",
          col("doc_id") % 10 === 0, ShingleN)
        .orderBy("doc_id")
    },
    // concat-and-chop sequence packing: budget-token training sequences
    // per source, documents may straddle boundaries
    "q52_pack_sequences" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.wsTokenCount(Dedup.tokens(col("text"))).as("n_tokens"))
      Sampling.packSequences(docs, "doc_id", "source", "n_tokens", PackBudget)
        .select("doc_id", "source", "n_tokens", "seq_id", "seq_off")
        .orderBy("doc_id")
    },
    // Gopher-style repetition filters: top-word / top-bigram coverage
    "q53_repetition" -> { (s, dir) =>
      TextAnalysis.repetitionMetrics(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },
    // gap-based sessionization: one row per (user, session). ts is
    // normalized to µs-resolution epoch nanos at the QUERY layer only
    // (`Tables.eventTimeNs` handles whichever type the canon ships;
    // the DIV-1000 truncation keeps long-nanos canons oracle-visible —
    // DuckDB reads TIMESTAMP(NANOS) parquet at µs resolution — and is
    // a no-op for µs-typed canons). The operator itself is nanos-native.
    "q54_sessionize" -> { (s, dir) =>
      val ev0 = Tables.load(s, dir, "events")
      val ev = ev0.withColumn("ts", Tables.eventTimeNs(ev0))
        .withColumn("ts", expr("(ts DIV 1000) * 1000"))
      EventOps.sessionize(ev, "user_id", "ts", "value", SessionGapNs)
        .orderBy("user_id", "session_id")
    },
    // point-in-time join: each click joined to the user's most recent
    // purchase at or before it (union + running-last, no range join);
    // same µs truncation rationale as q54
    "q55_asof_join" -> { (s, dir) =>
      val ev0 = Tables.load(s, dir, "events")
      val ev = ev0.withColumn("ts", Tables.eventTimeNs(ev0))
        .withColumn("ts", expr("(ts DIV 1000) * 1000"))
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.where(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      EventOps.asofJoin(clicks, purchases, "user_id", "ts", Seq("value"))
        .orderBy("event_id")
    },
    // ordered conversion funnel: strict view -> click -> purchase chains
    // per user, one in-row scan per key (greedy earliest == min-chain)
    "q111_funnel" -> { (s, dir) =>
      val ev0 = Tables.load(s, dir, "events")
      val ev = ev0.withColumn("ts_ns", Tables.eventTimeNs(ev0))
      EventOps.funnel(ev, "user_id", "event_type", "ts_ns", FunnelSteps)
        .orderBy("stage")
    },
    // activation/retention triangle: cohort by first-event epoch-day,
    // count users active at each day offset
    "q112_retention" -> { (s, dir) =>
      val ev0 = Tables.load(s, dir, "events")
      val ev = ev0.withColumn("ts_ns", Tables.eventTimeNs(ev0))
      EventOps.retentionCohorts(ev, "user_id", "ts_ns")
        .orderBy("cohort_day", "day_offset")
    },
    // per-group exact continuous quantile (p95 of value per event type):
    // grouped range refinement — all groups advance in one aggregate
    // per round, never a per-group gather
    "q117_grouped_quantiles" -> { (s, dir) =>
      Quantiles.groupedExactQuantiles(Tables.load(s, dir, "events"),
          "event_type", "value", GroupQuantP)
        .orderBy("event_type")
    },
    // trailing 7-day distinct-active curve (distinct (user, day) first,
    // then a bounded in-row window-day explode)
    "q113_rolling_active" -> { (s, dir) =>
      val ev0 = Tables.load(s, dir, "events")
      val ev = ev0.withColumn("ts_ns", Tables.eventTimeNs(ev0))
      EventOps.rollingActive(ev, "user_id", "ts_ns", RollingDays)
        .orderBy("window_day")
    },
    // first-order Markov transition matrix over per-user event streams
    "q114_transitions" -> { (s, dir) =>
      val ev0 = Tables.load(s, dir, "events")
      val ev = ev0.withColumn("ts_ns", Tables.eventTimeNs(ev0))
      EventOps.transitionMatrix(ev, "user_id", "event_type", "ts_ns")
        .orderBy("from_type", "to_type")
    },
    // deterministic corpus shuffle into independently-ordered shards
    "q56_shuffle_shards" -> { (s, dir) =>
      Sampling.shuffleShards(Tables.load(s, dir, "documents"), "doc_id", ShuffleShards)
        .select("doc_id", "shard", "shard_pos").orderBy("doc_id")
    },
    // vocabulary induction: corpus-wide top-100 words by frequency
    "q57_vocab" -> { (s, dir) =>
      TextAnalysis.vocabulary(Tables.load(s, dir, "documents"), "doc_id", "text", VocabK)
        .orderBy("word")
    },
    // per-doc characteristic terms: tf·n_docs/df score, no libm
    "q58_top_terms" -> { (s, dir) =>
      TextAnalysis.topTerms(Tables.load(s, dir, "documents"), "doc_id", "text", TopTermsK)
        .orderBy("doc_id", "term_rank")
    },
    // ingestion cleaning: strip markup, redact emails/phones, collapse
    // whitespace, count removals
    "q59_clean_text" -> { (s, dir) =>
      TextAnalysis.cleanText(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },
    // physical layout: lang-partitioned rewrite of the corpus, then a
    // partition-pruned scan — the ONE §2 capability (S6 partition
    // introspection / writePartitioned) previously without end-to-end
    // driver evidence. The query re-reads its own partitioned copy and
    // FAILS unless the scan proves directory pruning (a partition
    // filter pushed, exactly one of the five lang directories read), so
    // a regression in the pruning path cannot pass as a value match.
    "q65_partition_prune" -> { (s, dir) =>
      import graft.sources.BucketedStore
      val out = tempOutput("q65", dir) { o =>
        BucketedStore.writePartitioned(Tables.load(s, dir, "documents"), o, "lang")
      }
      // S6 partition introspection (the reference's PARTITIONS_QUERY,
      // postgres.py:19-45): the written layout must report its partition
      // column, and the unpartitioned source must report none
      val introspected = graft.model.StatsCollector.partitionColumns(s, out)
      require(introspected == Seq("lang"),
        s"partition introspection saw $introspected, expected [lang]")
      val flat = graft.model.StatsCollector.partitionColumns(s, s"$dir/documents.parquet")
      require(flat.isEmpty,
        s"unpartitioned source reported partition columns: $flat")
      val pruned = s.read.parquet(out).where(col("lang") === "de")
      pruned.collect() // drive THIS plan so its scan metrics fill
      import org.apache.spark.sql.execution.FileSourceScanExec
      val scan = BucketedStore.planNodes(pruned.queryExecution.executedPlan)
        .collectFirst { case f: FileSourceScanExec => f }
        .getOrElse(sys.error("no file scan in the partitioned read"))
      require(scan.partitionFilters.nonEmpty,
        s"lang predicate not pushed as a partition filter:\n${pruned.queryExecution.executedPlan}")
      val nPart = scan.metrics("numPartitions").value
      require(nPart == 1, s"expected 1 pruned lang directory, scanned $nPart")
      pruned.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },
    // bloom-prefiltered benchmark contamination: same exact semantics
    // as q51 on a different eval slice (doc_id % 7). The broadcast bloom
    // only decides which corpus shingles TRAVEL (no false negatives;
    // false positives die in the exact join), so the oracle is the same
    // plain SQL — a wrong filter shows up as a value mismatch, not a
    // weaker check.
    "q66_bloom_contamination" -> { (s, dir) =>
      Sketches.bloomContamination(Tables.load(s, dir, "documents"), "doc_id", "text",
          col("doc_id") % 7 === 0, ShingleN)
        .orderBy("doc_id")
    },
    // per-shard HLL cardinality sketches + lossless merge: each nation's
    // distinct-customer estimate and the union-merged global estimate
    // must sit within HllRtol of the EXACT counts the query also
    // computes (shard -1 = the merged global row) — the oracle pins the
    // exact counts and `true` for every band check
    "q67_hll_cardinality" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val sk = Sketches.hllShardSketches(c, "c_nationkey", "c_custkey", HllLgK)
      val exact = c.groupBy("c_nationkey").agg(countDistinct("c_custkey").as("n_exact"))
      val per = exact.join(sk.select(col("c_nationkey"), col("estimate")), Seq("c_nationkey"))
        .select(col("c_nationkey").cast("long").as("shard"), col("n_exact"),
          Sketches.withinBand(col("estimate"), col("n_exact"), HllRtol).as("hll_ok"))
      val global = c.agg(countDistinct("c_custkey").as("n_exact"))
        .crossJoin(Sketches.hllMergedEstimate(sk))
        .select(lit(-1L).as("shard"), col("n_exact"),
          Sketches.withinBand(col("estimate"), col("n_exact"), HllRtol).as("hll_ok"))
      per.unionAll(global).orderBy("shard")
    },
    // count-min heavy hitters: the exact top-CmsTopK terms (one
    // distributed TakeOrdered) checked against CMS point estimates —
    // over-count bounded by eps·N, never an undercount. The sketch and
    // the ≤CmsTopK term rows are the only driver-side data.
    "q68_cms_heavy_hitters" -> { (s, dir) =>
      import s.implicits._
      val toks = Tables.load(s, dir, "documents")
        .select(explode(Dedup.tokens(col("text"))).as("term"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val top = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("term")).limit(CmsTopK)
      val n = toks.count()
      val sketch = Sketches.cmsAgg(toks, "term", CmsEps, 0.99, seed = 42)
      val bound = math.ceil(CmsEps * n).toLong
      val rows = top.collect().map { r =>
        val term = r.getString(0); val cnt = r.getLong(1)
        val est = Sketches.cmsEstimate(sketch, term)
        (term, cnt, est >= cnt && est <= cnt + bound)
      }.toSeq
      rows.toDF("term", "cnt", "cms_ok").orderBy(desc("cnt"), asc("term"))
    },
    // bloom-prefiltered exact join: lineitem rows drop inside the scan
    // unless their order key can match the selective orders side; the
    // oracle is the PLAIN join, so the filter must be value-invisible
    "q72_bloom_join" -> { (s, dir) =>
      val big = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val hi = Tables.load(s, dir, "orders")
        .where(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_totalprice"))
      Sketches.bloomJoin(big, hi, "l_orderkey", "o_orderkey")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "o_totalprice")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // bloom-shortcut anti-join (subtract a blocklist): bloom-negative
    // rows keep without shuffling; maybe-matches go through the exact
    // left_anti. Oracle = plain NOT EXISTS.
    "q73_bloom_anti_join" -> { (s, dir) =>
      val big = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val block = Tables.load(s, dir, "orders")
        .where(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"))
      Sketches.bloomAntiJoin(big, block, "l_orderkey", "o_orderkey")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // one-pass per-column table profile with an HLL estimate band per
    // column — the oracle pins the exact counts and `true` per band
    "q71_profile" -> { (s, dir) =>
      Sketches.profile(Tables.load(s, dir, "documents"))
        .orderBy("column_name")
    },
    // ingestion boundary: export the corpus as JSONL shards, re-ingest
    // through the declared-schema + corrupt-line gate, emit the rows.
    // The oracle reads the ORIGINAL parquet, so a lossy escape, schema
    // drift, or dropped row in the JSONL boundary is a value mismatch.
    "q69_jsonl_roundtrip" -> { (s, dir) =>
      import org.apache.spark.sql.types.{LongType, StringType, StructType}
      val out = tempOutput("q69", dir) { o =>
        graft.sources.JsonlStore.write(Tables.load(s, dir, "documents"), o)
      }
      val schema = new StructType()
        .add("doc_id", LongType).add("text", StringType).add("lang", StringType)
        .add("source", StringType).add("n_chars", LongType)
      graft.sources.JsonlStore.readChecked(s, out, schema)
        .orderBy("doc_id")
    },
    // domain-mixture resampling: copies ~ per-domain weight, hash-
    // thresholded fractional part, explode fan-out — zero joins/shuffles
    "q76_mixture_sample" -> { (s, dir) =>
      Sampling.mixtureSample(Tables.load(s, dir, "documents"), "doc_id", "source",
          MixWeights, defaultWeight = 1.0)
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy("doc_id", "copy")
    },
    // z-order layout round-trip: write lineitem z-ordered on two derived
    // dims, read a 2-D box back through the z-range + exact predicates.
    // The oracle computes the same Morton interleave arithmetically, so
    // a wrong bit position or an unsound z-interval (dropping in-box
    // rows) is a value mismatch, not just a slow plan.
    "q77_zorder_box" -> { (s, dir) =>
      val out = tempOutput("q77", dir) { o =>
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_partkey") % 256).as("da"), (col("l_suppkey") % 256).as("db"))
        graft.sources.ZOrderStore.writeZOrdered(li, o, "da", "db", ZBits, numFiles = 32)
      }
      graft.sources.ZOrderStore.readBox(s, out, "da", "db", ZBits,
          ZBoxLo, ZBoxHi, ZBoxLo, ZBoxHi)
        .select("l_orderkey", "l_linenumber", "da", "db", "zval")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // product quantization + asymmetric-distance top-k: codes from a
    // deterministic per-subspace codebook, query LUTs, summed lookups
    "q78_pq_adc" -> { (s, dir) =>
      Similarity.pqAdcTopK(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % PqCodeMod === 0, col("vec_id") % 100 === 0,
          PqM, PqSubDim, TopK)
        .orderBy("id_a", "rank")
    },
    // IVF-PQ: coarse cells restrict the scan to nprobe cells per query,
    // PQ/ADC scores the candidates from code lookups — the composed
    // billion-vector serving shape (q43's quantizer × q78's codes)
    "q85_ivf_pq" -> { (s, dir) =>
      Similarity.ivfPqTopK(Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") % IvfCentMod === 0, col("vec_id") % PqCodeMod === 0,
          col("vec_id") % 100 === 0, PqM, PqSubDim, TopK, IvfNprobe)
        .orderBy("id_a", "rank")
    },
    // bin-bucketed range join: lineitem quantities against overlapping
    // nation-derived [lo, hi] intervals — an equi-join on the bin id,
    // never a nested loop (RangeJoinSpec asserts the plan)
    "q86_range_join" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val facts = s.table("lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("double").as("qty"))
      val ranges = s.table("nation").select(
        col("n_nationkey").cast("long").as("rid"),
        (col("n_nationkey") * lit(2.0)).as("lo"),
        (col("n_nationkey") * lit(2.0) + lit(3.0)).as("hi"))
      RangeJoin.rangeJoin(facts, "qty", ranges, "lo", "hi", binWidth = 2.0)
        .groupBy("rid")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("qty").cast("decimal(14,2)")).cast("double").as("sum_qty"))
        .orderBy("rid")
    },
    // interval-overlap join: supplier × part synthetic intervals meet
    // on bin ids, each overlapping pair counted exactly once via the
    // first-shared-bin rule — no distinct, no nested loop
    "q87_interval_join" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val sup = s.table("supplier")
        .select(col("s_suppkey").cast("long").as("sid"),
          ((col("s_suppkey") % 100).cast("double") * 3.0).as("lo"))
        .withColumn("hi", col("lo") + 10.0)
      val prt = s.table("part")
        .select(col("p_partkey").cast("long").as("pid"),
          ((col("p_partkey") % 200).cast("double") * 1.5).as("lo"))
        .withColumn("hi", col("lo") + 2.0)
      RangeJoin.intervalOverlapJoin(sup, "lo", "hi", prt, "lo", "hi", binWidth = 8.0)
        .groupBy("sid")
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          sum(col("r_pid")).cast("long").as("sum_pid"))
        .orderBy("sid")
    },
    // schema-on-read over the events JSON payload: ONE from_json parse
    // per row (never per-field re-parses), quarantine-aware, then an
    // ordinary typed rollup on the extracted field
    "q88_json_extract" -> { (s, dir) =>
      // spread the single-split source: the per-row from_json parse and
      // the json_ok filter run upstream of the (10-group) aggregate's
      // exchange, i.e. in ONE task on a one-file table; placement cannot
      // affect a per-row parse or the order-independent aggregates
      val ev = graft.ops.Spread(Tables.load(s, dir, "events"))
      // json_ok drops corrupt/empty payloads; the k-not-null filter
      // additionally drops valid payloads missing the field — the same
      // row set the oracle's json_valid + TRY_CAST IS NOT NULL keeps,
      // whatever the canon ships (mis-typed k quarantines BOTH sides)
      SemiStructured.parseJsonColumn(ev, "props", "k INT")
        .where(col("json_ok") && col("parsed.k").isNotNull)
        .withColumn("k_decade", floor(col("parsed.k") / 10).cast("long"))
        .groupBy("k_decade")
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"),
          min(col("parsed.k")).cast("long").as("min_k"),
          max(col("parsed.k")).cast("long").as("max_k"))
        .orderBy("k_decade")
    },
    // BM25 relevance search (rational idf — ranking-identical, oracle
    // bit-exact): in-row term frequencies, ONE broadcast corpus-stats
    // row, TakeOrdered top-20
    "q89_bm25_search" -> { (s, dir) =>
      TextAnalysis.bm25Search(Tables.load(s, dir, "documents"), "doc_id", "text",
          Bm25Terms, Bm25K)
        .orderBy("doc_id")
    },
    // leakage-safe split: near-dup clusters (as q49) roll the split die
    // on the CLUSTER id, so no near-duplicate pair straddles train/test
    "q90_groupaware_split" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text", ShingleN, MaxDf, JaccThresh)
      val labels = Dedup.connectedComponents(edges, "id_a", "id_b", docs, "doc_id")
      Sampling.splitByGroup(labels, "cluster_id", 80, 10)
        .select("doc_id", "cluster_id", "split").orderBy("doc_id")
    },
    // contiguous epoch-deterministic training order: range exchange on
    // the portable hash + per-partition offsets — no global-window
    // row_number single reducer anywhere
    "q91_training_order" -> { (s, dir) =>
      Sampling.trainingOrder(Tables.load(s, dir, "documents"), "doc_id", OrderParts)
        .select("doc_id", "train_pos").orderBy("doc_id")
    },
    // compliance pass: count + redact emails/phones/IPv4 per document.
    // Pseudo-PII is synthesized deterministically from doc_id (the
    // corpus itself is clean) so the counts are non-trivial; docs with
    // doc_id % 3 == 0 stay untouched as negative cases
    "q92_pii_redact" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val seeded = docs.withColumn("text",
        when(col("doc_id") % 3 =!= 0,
          concat(col("text"), lit(" reach u"), col("doc_id").cast("string"),
            lit("@mail.example.org or 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" from 10.1."), (col("doc_id") % 256).cast("string"), lit(".7")))
          .otherwise(col("text")))
      TextAnalysis.redactPii(seeded, "doc_id", "text").orderBy("doc_id")
    },
    // per-source corpus cap (no domain may dominate): salted two-phase
    // top-k — the hot-source task is bounded by salts*k rows, never the
    // whole source
    "q93_domain_cap" -> { (s, dir) =>
      Sampling.capPerGroup(Tables.load(s, dir, "documents"), "doc_id", "source",
          CapK, CapSalts)
        .select(col("doc_id"), col("source"), col("rank_in_group").cast("long"))
        .orderBy("doc_id")
    },
    // largest-remainder apportionment of a global token budget across
    // sources — exact integer arithmetic, Σalloc == budget
    "q94_token_budget" -> { (s, dir) =>
      Sampling.allocateTokenBudget(Tables.load(s, dir, "documents"), "source",
          "n_chars", BudgetTokens)
        .orderBy("source")
    },
    // weak-label quality filter: a long-doc heuristic label distilled
    // into a Bernoulli NB over marker-word presence — training is one
    // count aggregate, so the oracle re-fits the model exactly
    "q95_nb_quality" -> { (s, dir) =>
      TextAnalysis.nbQualityFilter(Tables.load(s, dir, "documents"), "doc_id",
          "text", col("n_chars") > NbLabelChars, NbTerms)
        .orderBy("doc_id")
    },
    // C4-style sub-document dedup: drop repeated 4-token chunks
    // corpus-wide, stitch the survivors back into cleaned documents
    "q79_chunk_dedup" -> { (s, dir) =>
      Dedup.chunkDedup(Tables.load(s, dir, "documents"), "doc_id", "text", ChunkW)
        .orderBy("doc_id")
    },
    // CCNet-style corpus-trained bigram-LM likelihood per document
    "q80_bigram_lm" -> { (s, dir) =>
      TextAnalysis.bigramLmScore(Tables.load(s, dir, "documents"), "doc_id", "text", LmK)
        .orderBy("doc_id")
    },
    // ORC round-trip: lineitem rewritten as key-sorted ORC, re-read
    // through a PROVEN pushed range predicate (the read fails unless the
    // filter reaches the ORC scan), aggregated — values must match the
    // oracle computed from the original parquet
    "q81_orc_roundtrip" -> { (s, dir) =>
      import graft.sources.OrcStore
      val out = tempOutput("q81", dir) { o =>
        OrcStore.writeSorted(
          Tables.load(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
          o, "l_orderkey", 8)
      }
      OrcStore.readWhereProven(s, out,
          col("l_orderkey") >= OrcKeyLo && col("l_orderkey") < OrcKeyHi)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("l_quantity").cast("decimal(14,2)")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    },
    // exact whole-table quantiles by iterative range refinement — no
    // global sort, no single-reducer percentile; small cutoff forced low
    // so the gate actually exercises multi-round refinement
    "q82_exact_quantiles" -> { (s, dir) =>
      Quantiles.exactQuantiles(Tables.load(s, dir, "lineitem"),
          "l_extendedprice", QuantProbs, smallCutoff = 512)
        .orderBy("prob")
    },
    // keyed upsert (MERGE) into a hash-sharded layout: replaced keys,
    // inserted keys, untouched shards never rewritten — final state
    // must equal the oracle's anti-join + union
    "q83_upsert" -> { (s, dir) =>
      import graft.sources.UpsertStore
      val out = tempOutput("q83", dir) { o =>
        val docs = Tables.load(s, dir, "documents")
        UpsertStore.writeKeyed(
          docs.where(col("doc_id") % 7 =!= 0)
            .select(col("doc_id"), col("lang"), col("n_chars")),
          o, "doc_id", 8)
        UpsertStore.upsert(s, o,
          docs.where(col("doc_id") % 3 === 0)
            .select(col("doc_id"), col("lang"),
              (col("n_chars") + 100000L).as("n_chars")),
          "doc_id", 8)
      }
      graft.sources.UpsertStore.read(s, out).orderBy("doc_id")
    },
    // mergeable incremental statistics (the 100 TB stats-refresh path):
    // three disjoint shard synopses merged by aggregation must equal the
    // whole-table synopsis — counts/min/max/exact-distinct checked by
    // the oracle; bit-exactness of the decimal moment sums, agreement
    // with the two-scan collector, and the HLL band are Spark-side
    // booleans the oracle pins TRUE (q67/q68 pattern)
    "q84_incremental_stats" -> { (s, dir) =>
      import s.implicits._
      import graft.model.{IncrementalStats, StatsCollector}
      // persist the shared scan + the (KB-sized) merged synopsis: the
      // whole-vs-merged three-way replay otherwise rescans orders per
      // collect (round-6 bench: q84 spread 4.1 from exactly that).
      // Spread the single-split source first: all four synopsis scans
      // (agg + sketch, whole + grouped) aggregate the CACHED partitions,
      // and on the driver testdata's one-file table they would otherwise
      // all run single-task (r16 measured q84 at 3.0 s, ~4 sequential
      // one-core passes). Every synopsis field is order-independent
      // (exact decimal sums, min/max/counts, HLL register union), so the
      // placement change cannot move a bit of the output.
      val li = graft.ops.Spread(Tables.load(s, dir, "orders"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = StatsCollector.collect(s, dir, Seq("orders"))
        .tables.find(_.name == "orders").get
      val keys = Seq("o_custkey", "o_orderdate", "o_totalprice")
      val anchors = IncrementalStats.anchorsFor(model)
        .view.filterKeys(keys.contains).toMap
      // the whole-table and grouped synopses are independent jobs over
      // the same cached partitions; run them CONCURRENTLY (guide §2.6:
      // actions are only sequential because the driver calls them
      // sequentially) so the grouped pass back-fills cores the whole
      // pass's short tasks leave idle. synopsize() collects eagerly
      // inside, so each Future is a self-contained job set; results are
      // deterministic regardless of interleaving.
      import scala.concurrent.Future
      import scala.concurrent.duration.DurationInt
      import scala.concurrent.ExecutionContext.Implicits.global
      val wholeF = Future(IncrementalStats.synopsize(li, anchors))
      // all 3 shards in ONE grouped pass (the backfill shape), then
      // merged exactly as separately-arriving shard synopses would be
      val partsF = Future(IncrementalStats.synopsizeGrouped(li,
        pmod(col("o_orderkey"), lit(3)), anchors))
      // FINITE bound (was Duration.Inf — a wedged concurrent job hung the
      // query forever): generously above any sane synopsis pass, with a
      // deterministic sequential recomputation as the fallback
      val whole = Futures.awaitOr(wholeF, 1.hour)(
        IncrementalStats.synopsize(li, anchors))
      val parts = Futures.awaitOr(partsF, 1.hour)(
        IncrementalStats.synopsizeGrouped(li, pmod(col("o_orderkey"), lit(3)), anchors))
      val merged = IncrementalStats.merge(parts.drop("shard"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stats = IncrementalStats.finalize(merged)
      val wRows = whole.collect().map(r => r.getAs[String]("measure") -> r).toMap
      val mRows = merged.collect().map(r => r.getAs[String]("measure") -> r).toMap
      val out = keys.map { k =>
        val st = stats(k)
        val (wr, mr) = (wRows(k), mRows(k))
        val mergeExact = Seq("s1", "s2", "s3", "s4").forall(f =>
          wr.getDecimal(wr.fieldIndex(f)).compareTo(mr.getDecimal(mr.fieldIndex(f))) == 0) &&
          wr.getSeq[Long](wr.fieldIndex("hist")) == mr.getSeq[Long](mr.fieldIndex("hist"))
        val num = model.columnsByName(k).stats.get.numeric.get
        def close(a: Double, b: Double, tol: Double) =
          math.abs(a - b) <= tol * math.max(1.0, math.abs(b))
        val momentsOk = close(st.mean, num.mean, 1e-9) &&
          close(st.varSamp, num.variance, 1e-9) &&
          close(st.skew, num.skewness, 1e-6) && close(st.kurt, num.kurtosis, 1e-6)
        // the memoized model was collected exact=true: its per-column
        // distinct IS the exact count (no second count_distinct scan)
        val nd = model.columnsByName(k).stats.get.distinct
        (k, st.n, st.nulls, st.min, st.max, nd,
          math.abs(st.distinctEst - nd) <= HllRtol * nd,
          mergeExact, momentsOk, st.hist.sum)
      }
      out.toDF("measure", "n", "nulls", "vmin", "vmax", "n_distinct",
          "hll_ok", "merge_exact", "moments_ok", "hist_total")
        .orderBy("measure")
    },
    "q41_window_events" -> { (s, dir) =>
      // hour bucket from the canonical ns clock (type-agnostic): the
      // normalized view keeps the rest of the query plain SQL
      val ev0 = Tables.load(s, dir, "events")
      ev0.withColumn("ts_ns", Tables.eventTimeNs(ev0))
        .createOrReplaceTempView("events_ns")
      s.sql("""SELECT CAST(floor((ts_ns DIV 1000000000) / 3600.0) AS BIGINT) AS hour_bucket,
              |       event_type,
              |       CAST(COUNT(*) AS BIGINT) AS n_events,
              |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
              |       MIN(value) AS min_value, MAX(value) AS max_value
              |FROM events_ns
              |GROUP BY 1, 2
              |ORDER BY 1, 2""".stripMargin)
    }
  )

  // ---- DuckDB oracle SQL --------------------------------------------

  /** Word array + shingle CTEs shared by several oracles. */
  private val shingleCte =
    s"""docw AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |         unnest(list_transform(range(1, greatest(len(w) - ${ShingleN - 2}, 1)),
       |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM docw
       |)""".stripMargin

  // q33's near-dup pair derivation + the transitive closure over it —
  // the duplicate-cluster labeling shared by the q49 and q70 oracles
  // (ends with the open `reach(node, r)` CTE; append further CTEs with
  // a comma or a final SELECT)
  private val clusterCte =
    s"""WITH RECURSIVE $shingleCte, dsh AS (
       |  SELECT DISTINCT doc_id AS id, sh FROM sh
       |), rare AS (
       |  SELECT sh FROM dsh GROUP BY sh HAVING COUNT(*) <= $MaxDf
       |), fsh AS (
       |  SELECT id, dsh.sh FROM dsh JOIN rare ON dsh.sh = rare.sh
       |), sizes AS (
       |  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM dsh GROUP BY id
       |), inter AS (
       |  SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
       |  FROM fsh a JOIN fsh b ON a.sh = b.sh
       |  WHERE a.id < b.id GROUP BY a.id, b.id
       |), edges AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sizes sa ON sa.id = id_a
       |  JOIN sizes sb ON sb.id = id_b
       |  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= $JaccThresh
       |), sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM edges
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM edges
       |), reach(node, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT s.src, reach.r FROM sym s JOIN reach ON reach.node = s.dst
       |)""".stripMargin

  /** MinHash → banded LSH → candidate pairs, ending with an open
    * `cand(id_a, id_b)` CTE — the q32 oracle body, reused by the q109
    * edit-distance verification oracle.
    */
  private lazy val lshCandCte: String = {
    val bandRows = (0 until Bands).map { b =>
      val cols = (0 until K / Bands).map(r => s"s${b * (K / Bands) + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, ${dh(s"concat_ws(',', $cols)")} AS bucket FROM sigw"
    }.mkString("\n  UNION ALL\n  ")
    val sigCols = (0 until K)
      .map(s => s"MIN(CASE WHEN seed = $s THEN min_hash END) AS s$s").mkString(", ")
    s"""$shingleCte, $sigCte, sigw AS (
       |  SELECT doc_id, $sigCols FROM sig GROUP BY doc_id
       |), bands AS (
       |  $bandRows
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
       |  WHERE a.doc_id < b.doc_id
       |)""".stripMargin
  }

  private val sigCte = {
    val seedRows = (0 until K).map { s =>
      val (a, b) = Dedup.minhashConsts(s)
      s"SELECT $s AS seed, $a AS ma, $b AS mb"
    }.mkString("\n    UNION ALL ")
    s"""hb AS (
       |  SELECT doc_id, ${dh("sh")} % ${Dedup.MinhashP} AS hb FROM sh
       |), seeds AS (
       |    $seedRows
       |), sig AS (
       |  SELECT doc_id, seed, MIN((hb * ma + mb) % ${Dedup.MinhashP}) AS min_hash
       |  FROM hb, seeds
       |  GROUP BY doc_id, seed
       |)""".stripMargin
  }

  private def simhashVotesSql: String = {
    val votes = (0 until 60).map { j =>
      s"SUM(CASE WHEN h % ${1L << (j + 1)} >= ${1L << j} THEN 1 ELSE -1 END) AS v$j"
    }.mkString(",\n      ")
    val fp = (0 until 60).map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents
       |), hashed AS (
       |  SELECT doc_id, ${dh("w")} AS h FROM tok
       |), votes AS (
       |  SELECT doc_id,
       |      $votes
       |  FROM hashed GROUP BY doc_id
       |), simhashed AS (
       |  SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM votes
       |)""".stripMargin
  }

  private val langCase: String = {
    val profiles = TextAnalysis.langProfiles
    val scoreExprs = profiles.map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"list_sum(list_transform(w, x -> CASE WHEN x IN ($inList) THEN 1 ELSE 0 END)) AS score_$l"
    }.mkString(",\n      ")
    val bestExpr = profiles.map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
    val pickExpr = profiles.reverse.foldLeft("'und'") { case (els, (l, _)) =>
      s"CASE WHEN score_$l = best AND best > 0 THEN '$l' ELSE $els END"
    }
    s"""langscore AS (
       |  SELECT doc_id, w, text,
       |      $scoreExprs,
       |      list_max(list_transform(w, x -> ascii(x))) AS max_cp
       |  FROM docw2
       |), langpick AS (
       |  SELECT doc_id, w, text, max_cp, $bestExpr AS best,
       |         score_en, score_de, score_fr, score_es
       |  FROM langscore
       |)""".stripMargin -> pickExpr
  }._1

  private val langPickExpr: String = {
    val profiles = TextAnalysis.langProfiles
    profiles.reverse.foldLeft("'und'") { case (els, (l, _)) =>
      s"CASE WHEN score_$l = best AND best > 0 THEN '$l' ELSE $els END"
    }
  }

  private val allStopwords =
    TextAnalysis.langProfiles.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")

  /** Full text-analysis SELECT (no ORDER BY): q36's oracle body, reused
    * as a subquery by the q48 curation-pipeline oracle.
    */
  private lazy val textAnalysisSelect: String =
    s"""WITH docw2 AS (
       |  SELECT doc_id, text, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents
       |), $langCase, qual AS (
       |  SELECT doc_id, text, w, max_cp, best,
       |         score_en, score_de, score_fr, score_es,
       |         CAST(length(text) AS DOUBLE) AS n_chars,
       |         CAST(len(w) AS DOUBLE) AS n_words,
       |         CAST(length(text) - length(replace(replace(replace(replace(replace(replace(text,
       |             '.', ''), ',', ''), '!', ''), '?', ''), ';', ''), ':', '')) AS DOUBLE) AS punct,
       |         CAST(list_sum(list_transform(w,
       |             x -> CASE WHEN x IN ($allStopwords) THEN 1 ELSE 0 END)) AS DOUBLE) AS stops
       |  FROM langpick
       |), fps AS (
       |  SELECT doc_id,
       |         -- CAST: DuckDB SUM(BIGINT) is HUGEINT (arrow decimal128);
       |         -- Spark emits BIGINT — the driver's hash is type-sensitive.
       |         CAST(SUM(${dh("CAST(pos AS VARCHAR) || ':' || tw")} % ${1L << 40}) % ${1L << 40} AS BIGINT) AS fingerprint
       |  FROM (SELECT doc_id, unnest(w) AS tw, generate_subscripts(w, 1) - 1 AS pos FROM docw2) t
       |  GROUP BY doc_id
       |)
       |SELECT q.doc_id,
       |       CASE WHEN max_cp >= ${0x4E00} THEN 'zh' ELSE $langPickExpr END AS lang_pred,
       |       round(
       |         (CASE WHEN n_chars >= 100 AND n_chars <= 10000 THEN 1.0
       |               WHEN n_chars < 100 THEN n_chars / 100.0
       |               ELSE 10000.0 / n_chars END) * 0.4 +
       |         (CASE WHEN n_chars / greatest(n_words, 1.0) >= 3.0
       |                AND n_chars / greatest(n_words, 1.0) <= 12.0 THEN 1.0 ELSE 0.5 END) * 0.2 +
       |         (CASE WHEN punct / greatest(n_chars, 1.0) <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2 +
       |         (CASE WHEN stops / greatest(n_words, 1.0) >= 0.05 THEN 1.0 ELSE 0.7 END) * 0.2,
       |         6) AS quality,
       |       CAST(len(w) AS BIGINT) AS n_ws_tokens,
       |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_re_tokens,
       |       fps.fingerprint
       |FROM qual q JOIN fps ON fps.doc_id = q.doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q31_minhash_sig" ->
      s"""WITH $shingleCte, $sigCte
         |SELECT doc_id, CAST(seed AS INTEGER) AS seed, min_hash FROM sig ORDER BY doc_id, seed""".stripMargin,

    "q32_lsh_candidates" ->
      s"""WITH $lshCandCte
         |SELECT id_a, id_b FROM cand
         |ORDER BY id_a, id_b""".stripMargin,

    // q109: the q32 candidate derivation re-scored with DuckDB's own
    // exact levenshtein (same unit-cost DP as Spark's built-in)
    "q109_edit_distance" ->
      s"""WITH $lshCandCte, scored AS (
         |  SELECT c.id_a, c.id_b,
         |         CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist,
         |         CAST(GREATEST(length(da.text), length(db.text)) AS BIGINT) AS max_len
         |  FROM cand c
         |  JOIN documents da ON da.doc_id = c.id_a
         |  JOIN documents db ON db.doc_id = c.id_b
         |)
         |SELECT id_a, id_b, dist, max_len,
         |       CAST(dist AS DOUBLE) / max_len AS dist_ratio
         |FROM scored
         |WHERE CAST(dist AS DOUBLE) / max_len <= $EditMaxFrac
         |ORDER BY id_a, id_b""".stripMargin,

    "q104_pivot" -> {
      val cells = PivotStatuses.map(st =>
        s"CAST(SUM(CASE WHEN l_linestatus = '$st' THEN CAST(l_quantity AS DECIMAL(14,2)) END) AS DOUBLE) AS qty_${st.toLowerCase}")
        .mkString(",\n       ")
      s"""SELECT l_returnflag,
         |       $cells
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin
    },

    "q105_cube" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       l_returnflag, l_linestatus,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q106_inverted_index" ->
      s"""WITH words AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
         |  FROM documents
         |), tf AS (
         |  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM words GROUP BY 1, 2
         |), byterm AS (
         |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
         |  FROM tf GROUP BY term
         |), ranked AS (
         |  SELECT term, doc_id, tf,
         |         ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
         |  FROM tf
         |), posts AS (
         |  SELECT term,
         |         string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
         |                    ',' ORDER BY doc_id) AS postings
         |  FROM ranked WHERE rn <= $InvMaxPostings GROUP BY term
         |)
         |SELECT b.term, b.df, b.cf, p.postings
         |FROM byterm b JOIN posts p USING (term)
         |WHERE b.df >= $InvMinDf
         |ORDER BY term""".stripMargin,

    "q107_weighted_sample" ->
      s"""SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         |       CAST((${dh("'wsamp:' || CAST(doc_id AS VARCHAR)")} % ${1L << 50}) AS DOUBLE)
         |         / CAST(n_chars AS DOUBLE) AS priority
         |FROM documents WHERE n_chars > 0
         |ORDER BY priority, doc_id LIMIT $WSampleK""".stripMargin,

    "q108_context_windows" ->
      s"""WITH base AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents
         |), w AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS nw FROM base
         |), starts AS (
         |  SELECT doc_id, toks,
         |         unnest(range(0, GREATEST(nw - $CtxWindow, 0) + 1, $CtxStride)) AS start_pos
         |  FROM w
         |)
         |SELECT doc_id,
         |       CAST(start_pos // $CtxStride AS BIGINT) AS window_id,
         |       CAST(start_pos AS BIGINT) AS start_pos,
         |       CAST(len(list_slice(toks, start_pos + 1, start_pos + $CtxWindow)) AS BIGINT) AS n_toks,
         |       array_to_string(list_slice(toks, start_pos + 1, start_pos + $CtxWindow), ' ') AS window_text
         |FROM starts ORDER BY doc_id, window_id""".stripMargin,

    "q110_dup_spans" ->
      s"""WITH base AS (
         |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars FROM documents
         |), pos AS (
         |  SELECT doc_id, text, unnest(range(0, n_chars - ${DupL - 1})) AS pos
         |  FROM base WHERE n_chars >= $DupL
         |), grams AS (
         |  SELECT doc_id, pos, substr(text, pos + 1, $DupL) AS gram FROM pos
         |), dupg AS (
         |  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
         |), dpos AS (
         |  SELECT g.doc_id, g.pos FROM grams g JOIN dupg USING (gram)
         |), cov AS (
         |  SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |  FROM dpos
         |), agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_pos,
         |         CAST(SUM(CASE WHEN prev IS NULL THEN $DupL
         |                       ELSE LEAST($DupL, pos - prev) END) AS BIGINT) AS dup_chars
         |  FROM cov GROUP BY doc_id
         |)
         |SELECT b.doc_id, b.n_chars,
         |       CAST(GREATEST(b.n_chars - ${DupL - 1}, 0) AS BIGINT) AS n_pos,
         |       CAST(COALESCE(a.n_dup_pos, 0) AS BIGINT) AS n_dup_pos,
         |       CAST(COALESCE(a.dup_chars, 0) AS BIGINT) AS dup_chars,
         |       CASE WHEN b.n_chars = 0 THEN 0.0
         |            ELSE ROUND(CAST(COALESCE(a.dup_chars, 0) AS DOUBLE) / b.n_chars, 6)
         |       END AS dup_ratio
         |FROM base b LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q111_funnel" -> {
      // independent derivation from the Spark scan: the min-chain form
      // (step i's completion = MIN t of step-i events strictly after
      // step i-1's completion) — equal by the greedy-exchange argument
      val ctes = FunnelSteps.zipWithIndex.map { case (st, i) =>
        if (i == 0)
          s"s1 AS (SELECT user_id, MIN(t) AS t1 FROM e WHERE event_type = '$st' GROUP BY 1)"
        else
          s"s${i + 1} AS (SELECT e.user_id, MIN(t) AS t${i + 1} FROM e JOIN s$i USING (user_id) " +
            s"WHERE event_type = '$st' AND t > t$i GROUP BY 1)"
      }.mkString(", ")
      val rows = FunnelSteps.zipWithIndex.map { case (st, i) =>
        s"SELECT CAST(${i + 1} AS INTEGER) AS stage, '$st' AS step, " +
          s"(SELECT CAST(COUNT(*) AS BIGINT) FROM s${i + 1}) AS n_users"
      }.mkString(" UNION ALL ")
      s"""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t FROM events),
         |$ctes
         |SELECT * FROM ($rows) ORDER BY stage""".stripMargin
    },

    "q112_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events
        |), cohorts AS (
        |  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1
        |)
        |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM days d JOIN cohorts c USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q116_image_flip" ->
      // source pixel(i) = (id*31 + i) % 256 on a 16x16 raster; the
      // flipped image's pixel at (x, y) is the source's at (15-x, y)
      """WITH px AS (
        |  SELECT doc_id AS asset_id, i % 16 AS x,
        |         (doc_id * 31 + ((i // 16) * 16 + (15 - (i % 16)))) % 256 AS v
        |  FROM documents, (SELECT unnest(range(0, 256)) AS i)
        |)
        |SELECT asset_id,
        |       CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        |       CAST(SUM(CASE WHEN x < 8 THEN v END) AS BIGINT) AS left_sum,
        |       CAST(SUM(CASE WHEN x >= 8 THEN v END) AS BIGINT) AS right_sum
        |FROM px GROUP BY asset_id ORDER BY asset_id""".stripMargin,

    "q117_grouped_quantiles" ->
      s"""SELECT event_type, CAST(COUNT(value) AS BIGINT) AS n,
         |       ROUND(quantile_cont(value, $GroupQuantP), 4) AS quantile
         |FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q113_rolling_active" ->
      s"""WITH days AS (
         |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events
         |), wins AS (
         |  SELECT user_id, day + unnest(range(0, $RollingDays)) AS window_day FROM days
         |)
         |SELECT window_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
         |FROM wins GROUP BY 1 ORDER BY 1""".stripMargin,

    "q114_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS t FROM events
        |), p AS (
        |  SELECT event_type AS to_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_type) AS from_type
        |  FROM e
        |), c AS (
        |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    "q33_ngram_jaccard" ->
      s"""WITH $shingleCte, dsh AS (
         |  SELECT DISTINCT doc_id AS id, sh FROM sh
         |), rare AS (
         |  SELECT sh FROM dsh GROUP BY sh HAVING COUNT(*) <= $MaxDf
         |), fsh AS (
         |  SELECT id, dsh.sh FROM dsh JOIN rare ON dsh.sh = rare.sh
         |), sizes AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM dsh GROUP BY id
         |), inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
         |  FROM fsh a JOIN fsh b ON a.sh = b.sh
         |  WHERE a.id < b.id GROUP BY a.id, b.id
         |)
         |SELECT id_a, id_b, n_inter,
         |       CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.id = id_a
         |JOIN sizes sb ON sb.id = id_b
         |WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= $JaccThresh
         |ORDER BY id_a, id_b""".stripMargin,

    "q103_containment" ->
      // same DF-capped intersection counts as q33; the score divides by
      // ONE side's set size (asymmetric), both directions emitted
      s"""WITH $shingleCte, dsh AS (
         |  SELECT DISTINCT doc_id AS id, sh FROM sh
         |), rare AS (
         |  SELECT sh FROM dsh GROUP BY sh HAVING COUNT(*) <= $MaxDf
         |), fsh AS (
         |  SELECT id, dsh.sh FROM dsh JOIN rare ON dsh.sh = rare.sh
         |), sizes AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM dsh GROUP BY id
         |), inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
         |  FROM fsh a JOIN fsh b ON a.sh = b.sh
         |  WHERE a.id < b.id GROUP BY a.id, b.id
         |)
         |SELECT id_a, id_b, n_inter,
         |       CAST(n_inter AS DOUBLE) / sa.n_sh AS cont_ab,
         |       CAST(n_inter AS DOUBLE) / sb.n_sh AS cont_ba
         |FROM inter
         |JOIN sizes sa ON sa.id = id_a
         |JOIN sizes sb ON sb.id = id_b
         |WHERE greatest(CAST(n_inter AS DOUBLE) / sa.n_sh,
         |               CAST(n_inter AS DOUBLE) / sb.n_sh) >= $ContThresh
         |ORDER BY id_a, id_b""".stripMargin,

    "q34_simhash" ->
      s"""WITH $simhashVotesSql
         |SELECT doc_id, simhash FROM simhashed ORDER BY doc_id""".stripMargin,

    "q35_simhash_pairs" ->
      s"""WITH $simhashVotesSql
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM simhashed a, simhashed b
         |WHERE a.doc_id < b.doc_id
         |  AND bit_count(xor(a.simhash, b.simhash)) <= $MaxHamming
         |ORDER BY id_a, id_b""".stripMargin,

    "q36_text_analyze" -> s"$textAnalysisSelect\nORDER BY q.doc_id",

    "q37_multimodal_features" -> {
      val fCols = (0 until Multimodal.FeatureDim)
        .map(j => s"CAST(SUM(CASE WHEN (i - 1) % ${Multimodal.FeatureDim} = $j THEN b ELSE 0 END) AS DOUBLE) / 255.0 AS f$j")
        .mkString(",\n       ")
      s"""WITH hx AS (
         |  -- iterate UTF-8 BYTES (not characters): the Spark side feeds
         |  -- encode(text,'UTF-8') to the decoder, and ascii-per-char only
         |  -- coincides with that while every document is pure ASCII
         |  SELECT doc_id, hex(encode(text)) AS h,
         |         octet_length(encode(text)) AS n
         |  FROM documents
         |), bytes AS (
         |  SELECT doc_id, n, unnest(range(1, n + 1)) AS i, h FROM hx
         |), vals AS (
         |  SELECT doc_id, n, i,
         |         CAST(('0x' || substr(h, CAST(i * 2 - 1 AS INTEGER), 2)) AS INTEGER) AS b
         |  FROM bytes
         |)
         |SELECT doc_id AS asset_id, 'text' AS modality, CAST(n AS BIGINT) AS n_bytes,
         |       $fCols
         |FROM vals GROUP BY doc_id, n ORDER BY asset_id""".stripMargin
    },

    // the synthetic raster is pixel(i) = (doc_id*31 + i) % 256 over a
    // 16×16 gray image; the PNG round-trip is lossless, so the decoded
    // stats equal the analytic ones. The mean is exact: integer sum
    // divided by 256 (a power of two) is exact in binary on both engines
    "q75_image_decode" ->
      """WITH px AS (
        |  SELECT d.doc_id, unnest(range(0, 256)) AS i FROM documents d
        |)
        |SELECT doc_id AS asset_id,
        |       CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        |       CAST(SUM((doc_id*31 + i) % 256) AS DOUBLE) / 256.0 AS px_mean,
        |       CAST(MIN((doc_id*31 + i) % 256) AS INTEGER) AS px_min,
        |       CAST(MAX((doc_id*31 + i) % 256) AS INTEGER) AS px_max
        |FROM px GROUP BY doc_id ORDER BY asset_id""".stripMargin,

    "q102_image_resize" ->
      // nearest-neighbor 16x16 -> 8x8 keeps src pixels (2x, 2y): the
      // surviving raster indices are i = (2y)*16 + 2x, and the 64-pixel
      // mean divides by a power of two — exact in binary on both engines
      """WITH px AS (
        |  SELECT d.doc_id, (ys.y * 2) * 16 + xs.x * 2 AS i
        |  FROM documents d,
        |       (SELECT unnest(range(0, 8)) AS x) xs,
        |       (SELECT unnest(range(0, 8)) AS y) ys
        |)
        |SELECT doc_id AS asset_id,
        |       CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        |       CAST(SUM((doc_id*31 + i) % 256) AS DOUBLE) / 64.0 AS px_mean,
        |       CAST(MIN((doc_id*31 + i) % 256) AS INTEGER) AS px_min,
        |       CAST(MAX((doc_id*31 + i) % 256) AS INTEGER) AS px_max
        |FROM px GROUP BY doc_id ORDER BY asset_id""".stripMargin,

    // sample(t) = (id*7919 + t*104729) % 65536 - 32768, replayed
    // analytically; rms is the only float — exact BIGINT sum of
    // squares, one double division, one correctly-rounded sqrt, 4dp
    "q96_audio_decode" ->
      s"""WITH s AS (
         |  SELECT d.doc_id, CAST(r.range AS BIGINT) AS t,
         |         ((d.doc_id * 7919 + CAST(r.range AS BIGINT) * 104729) % 65536) - 32768 AS v
         |  FROM documents d, range(0, $WavSamples) r
         |), sgn AS (
         |  SELECT doc_id, t, v,
         |         CASE WHEN t > 0 AND ((v >= 0) <> (lag(v) OVER (PARTITION BY doc_id ORDER BY t) >= 0))
         |              THEN 1 ELSE 0 END AS zc
         |  FROM s
         |)
         |SELECT doc_id AS asset_id,
         |       CAST($WavRate AS INTEGER) AS sample_rate,
         |       CAST($WavSamples AS INTEGER) AS n_samples,
         |       ROUND(sqrt(CAST(SUM(v * v) AS DOUBLE) / $WavSamples), 4) AS rms,
         |       CAST(MAX(abs(v)) AS INTEGER) AS peak,
         |       CAST(SUM(zc) AS BIGINT) AS zero_crossings
         |FROM sgn GROUP BY doc_id ORDER BY asset_id""".stripMargin,

    // per-frame means are exact dyadic rationals (sum/256) and their
    // |deltas| share one small denominator, so every aggregate below is
    // exact in double; the single /3.0 is one correctly-rounded op
    "q97_video_decode" ->
      s"""WITH fm AS (
         |  SELECT d.doc_id, CAST(f.range AS BIGINT) AS f,
         |         CAST(SUM((d.doc_id * 31 + CAST(f.range AS BIGINT) * 17 + i.range) % 256) AS DOUBLE) / ${VidW * VidH}.0 AS m
         |  FROM documents d, range(0, $VidFrames) f, range(0, ${VidW * VidH}) i
         |  GROUP BY d.doc_id, f.range
         |), dl AS (
         |  SELECT doc_id, f, m,
         |         abs(m - lag(m) OVER (PARTITION BY doc_id ORDER BY f)) AS ad
         |  FROM fm
         |)
         |SELECT doc_id AS asset_id, CAST($VidFrames AS INTEGER) AS n_frames,
         |       CAST($VidW AS INTEGER) AS width, CAST($VidH AS INTEGER) AS height,
         |       MAX(CASE WHEN f = 0 THEN m END) AS mean_first,
         |       MAX(CASE WHEN f = ${VidFrames - 1} THEN m END) AS mean_last,
         |       SUM(ad) / ${VidFrames - 1}.0 AS avg_abs_delta
         |FROM dl GROUP BY doc_id ORDER BY asset_id""".stripMargin,

    "q99_corpus_diff" ->
      s"""WITH newsnap AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
         |  FROM documents WHERE doc_id % 7 <> 0
         |  UNION ALL
         |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0
         |), d AS (
         |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |         CASE WHEN o.doc_id IS NULL THEN 'added'
         |              WHEN n.doc_id IS NULL THEN 'removed'
         |              WHEN md5(o.text) = md5(n.text) THEN 'unchanged'
         |              ELSE 'changed' END AS status
         |  FROM documents o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id
         |)
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM d GROUP BY status ORDER BY status""".stripMargin,

    "q98_schema_evolution" ->
      s"""WITH m AS (
         |  SELECT l_orderkey, l_quantity, CAST(NULL AS VARCHAR) AS l_returnflag
         |  FROM lineitem WHERE l_orderkey % 2 = 0
         |  UNION ALL
         |  SELECT l_orderkey, l_quantity, l_returnflag
         |  FROM lineitem WHERE l_orderkey % 2 = 1
         |)
         |SELECT COALESCE(l_returnflag, '<pre-evolution>') AS rflag,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
         |FROM m GROUP BY 1 ORDER BY rflag""".stripMargin,

    "q38_ann_topk" ->
      s"""WITH norms AS (
         |  SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS n2
         |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t GROUP BY vec_id
         |), pairs AS (
         |  SELECT q.vec_id AS id_a, c.vec_id AS id_b, q.embedding AS ea, c.embedding AS eb
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
         |), dots AS (
         |  SELECT id_a, id_b,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM pairs) t
         |  GROUP BY id_a, id_b
         |), scored AS (
         |  SELECT id_a, id_b,
         |         CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
         |  FROM dots JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
         |), ranked AS (
         |  SELECT id_a, id_b, cos,
         |         ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rank
         |  FROM scored
         |)
         |SELECT id_a, id_b, round(cos, 6) AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= $TopK ORDER BY id_a, rank""".stripMargin,

    "q39_cosine_pairs" ->
      s"""WITH norms AS (
         |  SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS n2
         |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t GROUP BY vec_id
         |), pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
         |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
         |), dots AS (
         |  SELECT id_a, id_b,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM pairs) t
         |  GROUP BY id_a, id_b
         |)
         |SELECT id_a, id_b,
         |       round(CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos_sim
         |FROM dots JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
         |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= $CosThresh
         |ORDER BY id_a, id_b""".stripMargin,

    "q40_srp_ann" -> {
      // SRP hyperplanes are hash-derived, so the DuckDB oracle recomputes
      // them exactly: per-plane decimal dot against md5-derived
      // components, sign bits -> bucket, then bucket-local exact top-k
      val nPlanes = 3
      val caseP = (0 until nPlanes).map(p => s"WHEN $p THEN ${1 << p}").mkString(" ")
      s"""WITH comp AS (
         |  SELECT p, i,
         |         (${dh("'plane' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}
         |            / 1152921504606846976.0) - 0.5 AS c
         |  FROM (SELECT unnest(range(0, $nPlanes)) AS p) ps,
         |       (SELECT unnest(range(0, 64)) AS i) dims
         |), vals AS (
         |  SELECT vec_id, unnest(embedding) AS x,
         |         generate_subscripts(embedding, 1) - 1 AS i
         |  FROM embeddings
         |), dots AS (
         |  SELECT v.vec_id, c.p,
         |         SUM(CAST(CAST(v.x AS DOUBLE) * c.c AS DECIMAL(20,12))) AS dot
         |  FROM vals v JOIN comp c ON c.i = v.i
         |  GROUP BY v.vec_id, c.p
         |), buckets AS (
         |  SELECT vec_id,
         |         CAST(SUM(CASE WHEN dot >= 0 THEN (CASE p $caseP END) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM dots GROUP BY vec_id
         |), norms AS (
         |  SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS n2
         |  FROM vals GROUP BY vec_id
         |), pairs AS (
         |  SELECT q.vec_id AS id_a, c.vec_id AS id_b, q.embedding AS ea, c.embedding AS eb
         |  FROM embeddings q
         |  JOIN buckets bq ON bq.vec_id = q.vec_id
         |  JOIN buckets bc ON bc.bucket = bq.bucket
         |  JOIN embeddings c ON c.vec_id = bc.vec_id
         |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
         |), pdots AS (
         |  SELECT id_a, id_b,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM pairs) t
         |  GROUP BY id_a, id_b
         |), ranked AS (
         |  SELECT id_a, id_b,
         |         CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos,
         |         ROW_NUMBER() OVER (PARTITION BY id_a
         |           ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC, id_b) AS rank
         |  FROM pdots JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
         |)
         |SELECT id_a, id_b, round(cos, 6) AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= $TopK ORDER BY id_a, rank""".stripMargin
    },

    "q42_embed_neardup" -> {
      // same hash-derived SRP hyperplanes as q40; bucket-local pairs with
      // exact decimal-dot cosine at or above the threshold
      val nPlanes = 3
      val caseP = (0 until nPlanes).map(p => s"WHEN $p THEN ${1 << p}").mkString(" ")
      s"""WITH comp AS (
         |  SELECT p, i,
         |         (${dh("'plane' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}
         |            / 1152921504606846976.0) - 0.5 AS c
         |  FROM (SELECT unnest(range(0, $nPlanes)) AS p) ps,
         |       (SELECT unnest(range(0, 64)) AS i) dims
         |), vals AS (
         |  SELECT vec_id, unnest(embedding) AS x,
         |         generate_subscripts(embedding, 1) - 1 AS i
         |  FROM embeddings
         |), dots AS (
         |  SELECT v.vec_id, c.p,
         |         SUM(CAST(CAST(v.x AS DOUBLE) * c.c AS DECIMAL(20,12))) AS dot
         |  FROM vals v JOIN comp c ON c.i = v.i
         |  GROUP BY v.vec_id, c.p
         |), buckets AS (
         |  SELECT vec_id,
         |         CAST(SUM(CASE WHEN dot >= 0 THEN (CASE p $caseP END) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM dots GROUP BY vec_id
         |), norms AS (
         |  SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS n2
         |  FROM vals GROUP BY vec_id
         |), pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
         |  FROM embeddings a
         |  JOIN buckets ba ON ba.vec_id = a.vec_id
         |  JOIN buckets bb ON bb.bucket = ba.bucket
         |  JOIN embeddings b ON b.vec_id = bb.vec_id
         |  WHERE a.vec_id < b.vec_id
         |), pdots AS (
         |  SELECT id_a, id_b,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM pairs) t
         |  GROUP BY id_a, id_b
         |)
         |SELECT id_a, id_b,
         |       round(CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos_sim
         |FROM pdots JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
         |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= $CosThresh
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q100_semantic_dedup" -> {
      // SemDeDup: q43's Voronoi assignment, within-cell cosine edges at
      // the q42 threshold, transitive closure via recursive CTE (q49's
      // pattern), keep-rule = lowest centroid cosine (ties to lowest id)
      s"""WITH RECURSIVE norms AS (
         |  SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS n2
         |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t GROUP BY vec_id
         |), cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id % $IvfCentMod = 0
         |), adots AS (
         |  SELECT vec_id, cent_id,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT e.vec_id, c.cent_id, unnest(e.embedding) AS x, unnest(c.cvec) AS y
         |        FROM embeddings e, cents c) t
         |  GROUP BY vec_id, cent_id
         |), acos AS (
         |  SELECT a.vec_id, a.cent_id,
         |         CAST(a.dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cos
         |  FROM adots a
         |  JOIN norms nv ON nv.vec_id = a.vec_id
         |  JOIN norms nc ON nc.vec_id = a.cent_id
         |), cells AS (
         |  SELECT vec_id, cell, cent_cos FROM (
         |    SELECT vec_id, cent_id AS cell, cos AS cent_cos,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
         |    FROM acos) WHERE rn = 1
         |), cpairs AS (
         |  SELECT ca.vec_id AS id_a, cb.vec_id AS id_b, ea.embedding AS ea, eb.embedding AS eb
         |  FROM cells ca JOIN cells cb ON cb.cell = ca.cell AND ca.vec_id < cb.vec_id
         |  JOIN embeddings ea ON ea.vec_id = ca.vec_id
         |  JOIN embeddings eb ON eb.vec_id = cb.vec_id
         |), cdots AS (
         |  SELECT id_a, id_b,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM cpairs) t
         |  GROUP BY id_a, id_b
         |), dedges AS (
         |  SELECT id_a, id_b FROM cdots
         |  JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
         |  WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= $CosThresh
         |), dsym AS (
         |  SELECT id_a AS src, id_b AS dst FROM dedges
         |  UNION ALL
         |  SELECT id_b AS src, id_a AS dst FROM dedges
         |), dreach(node, r) AS (
         |  SELECT vec_id, vec_id FROM cells
         |  UNION
         |  SELECT s.src, dreach.r FROM dsym s JOIN dreach ON dreach.node = s.dst
         |), dlabels AS (
         |  SELECT node AS vec_id, CAST(MIN(r) AS BIGINT) AS group_id
         |  FROM dreach GROUP BY node
         |), keeprule AS (
         |  SELECT group_id, vec_id AS keep_id FROM (
         |    SELECT l.group_id, l.vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY l.group_id
         |                              ORDER BY c.cent_cos ASC, l.vec_id) AS rk
         |    FROM dlabels l JOIN cells c ON c.vec_id = l.vec_id) t WHERE rk = 1
         |)
         |SELECT c.vec_id, c.cell, l.group_id,
         |       round(c.cent_cos, 6) AS cent_cos,
         |       (c.vec_id = k.keep_id) AS kept
         |FROM cells c
         |JOIN dlabels l ON l.vec_id = c.vec_id
         |JOIN keeprule k ON k.group_id = l.group_id
         |ORDER BY c.vec_id""".stripMargin
    },

    "q43_ivf_ann" -> {
      // IVF: assign every vector to its nearest deterministic centroid
      // (cos DESC, cent_id tie-break), probe the nprobe nearest cells per
      // query, exact-rerank inside the probed cells
      s"""WITH norms AS (
         |  SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS n2
         |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t GROUP BY vec_id
         |), cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id % $IvfCentMod = 0
         |), adots AS (
         |  SELECT vec_id, cent_id,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT e.vec_id, c.cent_id, unnest(e.embedding) AS x, unnest(c.cvec) AS y
         |        FROM embeddings e, cents c) t
         |  GROUP BY vec_id, cent_id
         |), acos AS (
         |  SELECT a.vec_id, a.cent_id,
         |         CAST(a.dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cos
         |  FROM adots a
         |  JOIN norms nv ON nv.vec_id = a.vec_id
         |  JOIN norms nc ON nc.vec_id = a.cent_id
         |), cells AS (
         |  SELECT vec_id, cent_id AS cell FROM (
         |    SELECT vec_id, cent_id,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
         |    FROM acos) WHERE rn = 1
         |), probes AS (
         |  SELECT vec_id AS id_a, cent_id AS cell FROM (
         |    SELECT vec_id, cent_id,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
         |    FROM acos WHERE vec_id % 100 = 0) WHERE rn <= $IvfNprobe
         |), pairs AS (
         |  SELECT p.id_a, s.vec_id AS id_b, qa.embedding AS ea, qb.embedding AS eb
         |  FROM probes p
         |  JOIN cells s ON s.cell = p.cell
         |  JOIN embeddings qa ON qa.vec_id = p.id_a
         |  JOIN embeddings qb ON qb.vec_id = s.vec_id
         |  WHERE p.id_a <> s.vec_id
         |), pdots AS (
         |  SELECT id_a, id_b,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM pairs) t
         |  GROUP BY id_a, id_b
         |), ranked AS (
         |  SELECT id_a, id_b,
         |         CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos,
         |         ROW_NUMBER() OVER (PARTITION BY id_a
         |           ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC, id_b) AS rank
         |  FROM pdots JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
         |)
         |SELECT id_a, id_b, round(cos, 6) AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= $TopK ORDER BY id_a, rank""".stripMargin
    },

    "q44_kmeans_step" -> {
      // recompute the q43 cell assignment, then decimal-exact per-(cell,
      // dim) means of the member vectors
      s"""WITH norms AS (
         |  SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS n2
         |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t GROUP BY vec_id
         |), cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id % $IvfCentMod = 0
         |), adots AS (
         |  SELECT vec_id, cent_id,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT e.vec_id, c.cent_id, unnest(e.embedding) AS x, unnest(c.cvec) AS y
         |        FROM embeddings e, cents c) t
         |  GROUP BY vec_id, cent_id
         |), acos AS (
         |  SELECT a.vec_id, a.cent_id,
         |         CAST(a.dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cos
         |  FROM adots a
         |  JOIN norms nv ON nv.vec_id = a.vec_id
         |  JOIN norms nc ON nc.vec_id = a.cent_id
         |), cells AS (
         |  SELECT vec_id, cent_id AS cell FROM (
         |    SELECT vec_id, cent_id,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
         |    FROM acos) WHERE rn = 1
         |), vals AS (
         |  SELECT vec_id, unnest(embedding) AS x,
         |         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim
         |  FROM embeddings
         |)
         |SELECT c.cell, v.dim, CAST(COUNT(*) AS BIGINT) AS n_members,
         |       CAST(SUM(CAST(CAST(v.x AS DOUBLE) AS DECIMAL(20,12))) AS DOUBLE) / COUNT(*) AS mean
         |FROM vals v JOIN cells c ON c.vec_id = v.vec_id
         |GROUP BY c.cell, v.dim
         |ORDER BY c.cell, v.dim""".stripMargin
    },

    "q45_split" ->
      s"""SELECT doc_id, lang,
         |       CASE WHEN d < 80 THEN 'train' WHEN d < 90 THEN 'valid' ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang,
         |             ${dh("'split:' || lang || ':' || CAST(doc_id AS VARCHAR)")} % 100 AS d
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q101_temperature_sample" ->
      // n^0.5 weights floored into exact integers, Hamilton apportionment
      // in HUGEINT (q94's scheme), then q46's hash-ranked per-group draw
      s"""WITH counts AS (
         |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
         |), w AS (
         |  SELECT lang, n,
         |         CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS HUGEINT) AS iw
         |  FROM counts
         |), t AS (SELECT SUM(iw) AS tt FROM w),
         |b AS (
         |  SELECT lang, n, iw,
         |         (iw * $TempTotal) // tt AS base,
         |         (iw * $TempTotal) % tt AS rem
         |  FROM w, t
         |), e AS (SELECT SUM(base) AS sb FROM b),
         |alloc AS (
         |  SELECT lang, n,
         |         CAST(base + CASE WHEN rk <= $TempTotal - sb THEN 1 ELSE 0 END AS BIGINT) AS group_alloc
         |  FROM (SELECT lang, n, base,
         |               row_number() OVER (ORDER BY rem DESC, lang) AS rk
         |        FROM b), e
         |), ranked AS (
         |  SELECT doc_id, lang,
         |         ROW_NUMBER() OVER (PARTITION BY lang
         |           ORDER BY ${dh("'temp:' || lang || ':' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
         |  FROM documents
         |)
         |SELECT r.doc_id, r.lang, CAST(rn AS INTEGER) AS sample_rank,
         |       a.n AS group_n, a.group_alloc
         |FROM ranked r JOIN alloc a USING (lang)
         |WHERE rn <= a.group_alloc
         |ORDER BY lang, sample_rank""".stripMargin,

    "q46_stratified_sample" ->
      s"""SELECT doc_id, lang, CAST(rn AS INTEGER) AS sample_rank FROM (
         |  SELECT doc_id, lang,
         |         ROW_NUMBER() OVER (PARTITION BY lang
         |           ORDER BY ${dh("'sample:' || lang || ':' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
         |  FROM documents) WHERE rn <= 10
         |ORDER BY lang, sample_rank""".stripMargin,

    "q47_srp_multiprobe" -> {
      // q40's buckets plus 1-bit-flip probe buckets per query
      val nPlanes = 3
      val caseP = (0 until nPlanes).map(p => s"WHEN $p THEN ${1 << p}").mkString(" ")
      val caseFlip = (0 until nPlanes).map(p => s"WHEN $p THEN xor(bucket, ${1L << p})").mkString(" ")
      s"""WITH comp AS (
         |  SELECT p, i,
         |         (${dh("'plane' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}
         |            / 1152921504606846976.0) - 0.5 AS c
         |  FROM (SELECT unnest(range(0, $nPlanes)) AS p) ps,
         |       (SELECT unnest(range(0, 64)) AS i) dims
         |), vals AS (
         |  SELECT vec_id, unnest(embedding) AS x,
         |         generate_subscripts(embedding, 1) - 1 AS i
         |  FROM embeddings
         |), dots AS (
         |  SELECT v.vec_id, c.p,
         |         SUM(CAST(CAST(v.x AS DOUBLE) * c.c AS DECIMAL(20,12))) AS dot
         |  FROM vals v JOIN comp c ON c.i = v.i
         |  GROUP BY v.vec_id, c.p
         |), buckets AS (
         |  SELECT vec_id,
         |         CAST(SUM(CASE WHEN dot >= 0 THEN (CASE p $caseP END) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM dots GROUP BY vec_id
         |), norms AS (
         |  SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS n2
         |  FROM vals GROUP BY vec_id
         |), probes AS (
         |  SELECT b.vec_id AS id_a,
         |         CASE WHEN f = -1 THEN bucket ELSE (CASE f $caseFlip END) END AS bucket
         |  FROM buckets b, (SELECT unnest(range(-1, $nPlanes)) AS f) fs
         |  WHERE b.vec_id % 100 = 0
         |), pairs AS (
         |  SELECT p.id_a, bc.vec_id AS id_b, qa.embedding AS ea, qb.embedding AS eb
         |  FROM probes p
         |  JOIN buckets bc ON bc.bucket = p.bucket
         |  JOIN embeddings qa ON qa.vec_id = p.id_a
         |  JOIN embeddings qb ON qb.vec_id = bc.vec_id
         |  WHERE p.id_a <> bc.vec_id
         |), pdots AS (
         |  SELECT id_a, id_b,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM pairs) t
         |  GROUP BY id_a, id_b
         |), ranked AS (
         |  SELECT id_a, id_b,
         |         CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos,
         |         ROW_NUMBER() OVER (PARTITION BY id_a
         |           ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC, id_b) AS rank
         |  FROM pdots JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
         |)
         |SELECT id_a, id_b, round(cos, 6) AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= $TopK ORDER BY id_a, rank""".stripMargin
    },

    "q48_curation" ->
      s"""WITH m AS (
         |$textAnalysisSelect
         |), keep AS (
         |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
         |), cur AS (
         |  SELECT m.doc_id, m.lang_pred, m.quality
         |  FROM m JOIN keep ON keep.doc_id = m.doc_id
         |  WHERE m.quality >= 0.9
         |)
         |SELECT doc_id, lang_pred, quality,
         |       CASE WHEN d < 80 THEN 'train' WHEN d < 90 THEN 'valid' ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang_pred, quality,
         |             ${dh("'split:' || lang_pred || ':' || CAST(doc_id AS VARCHAR)")} % 100 AS d
         |      FROM cur)
         |ORDER BY doc_id""".stripMargin,

    "q49_dedup_clusters" ->
      // q33's near-dup pairs as the edge set, then the transitive closure
      // via a recursive CTE: cluster_id = min doc id reachable
      s"""$clusterCte
         |SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,

    // clustering composed with keep-best selection: one representative
    // per duplicate cluster (max n_chars, ties to the smallest doc_id)
    "q70_canonical_corpus" ->
      s"""$clusterCte, labels AS (
         |  SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id
         |  FROM reach GROUP BY node
         |)
         |SELECT doc_id, cluster_id, n_chars FROM (
         |  SELECT d.doc_id, l.cluster_id, d.n_chars,
         |         ROW_NUMBER() OVER (PARTITION BY l.cluster_id
         |                            ORDER BY d.n_chars DESC, d.doc_id) AS rk
         |  FROM documents d JOIN labels l ON l.doc_id = d.doc_id) t
         |WHERE rk = 1 ORDER BY cluster_id""".stripMargin,

    "q51_contamination" ->
      s"""WITH $shingleCte, dsh AS (
         |  SELECT DISTINCT doc_id AS id, sh FROM sh
         |), train AS (
         |  SELECT DISTINCT sh FROM dsh WHERE id % 10 <> 0
         |), evalsh AS (
         |  SELECT id, sh FROM dsh WHERE id % 10 = 0
         |), hits AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_contam
         |  FROM evalsh JOIN train USING (sh) GROUP BY id
         |), nsh AS (
         |  -- LEFT JOIN keeps shingle-less eval docs (count of NULL = 0)
         |  SELECT d.doc_id AS id, CAST(COUNT(dsh.sh) AS BIGINT) AS n_sh
         |  FROM documents d LEFT JOIN dsh ON dsh.id = d.doc_id
         |  WHERE d.doc_id % 10 = 0 GROUP BY d.doc_id
         |)
         |SELECT nsh.id AS doc_id, n_sh,
         |       CAST(COALESCE(n_contam, 0) AS BIGINT) AS n_contam,
         |       CASE WHEN n_sh = 0 THEN 0.0
         |            ELSE CAST(COALESCE(n_contam, 0) AS DOUBLE) / n_sh END AS contam_frac
         |FROM nsh LEFT JOIN hits ON hits.id = nsh.id
         |ORDER BY doc_id""".stripMargin,

    "q52_pack_sequences" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), cum AS (
         |  SELECT doc_id, source, n_tokens,
         |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_tok
         |  FROM toks
         |)
         |SELECT doc_id, source, n_tokens,
         |       CAST(start_tok // $PackBudget AS BIGINT) AS seq_id,
         |       CAST(start_tok % $PackBudget AS BIGINT) AS seq_off
         |FROM cum ORDER BY doc_id""".stripMargin,

    "q53_repetition" ->
      s"""WITH docw AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents
         |), wc AS (
         |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (SELECT doc_id, unnest(w) AS term FROM docw) t GROUP BY doc_id, term
         |), wagg AS (
         |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
         |         CAST(MAX(n) AS BIGINT) AS top_word_n
         |  FROM wc GROUP BY doc_id
         |), bg AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, greatest(len(w), 1)),
         |                i -> w[i] || ' ' || w[i+1])) AS b
         |  FROM docw
         |), bc AS (
         |  SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS n FROM bg GROUP BY doc_id, b
         |), bagg AS (
         |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
         |         CAST(MAX(n) AS BIGINT) AS top_bigram_n
         |  FROM bc GROUP BY doc_id
         |)
         |SELECT w.doc_id, n_words, top_word_n,
         |       CAST(top_word_n AS DOUBLE) / n_words AS top_word_frac,
         |       CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |       CAST(COALESCE(top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
         |       CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0.0
         |            ELSE CAST(top_bigram_n AS DOUBLE) / n_bigrams END AS top_bigram_frac
         |FROM wagg w LEFT JOIN bagg ON bagg.doc_id = w.doc_id
         |ORDER BY w.doc_id""".stripMargin,

    "q56_shuffle_shards" ->
      s"""SELECT doc_id, CAST(h % $ShuffleShards AS INTEGER) AS shard,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY h % $ShuffleShards
         |           ORDER BY h, doc_id) AS BIGINT) AS shard_pos
         |FROM (SELECT doc_id,
         |             ${dh("'shuffle:' || CAST(doc_id AS VARCHAR)")} AS h
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q57_vocab" ->
      s"""SELECT word, tf, df FROM (
         |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS tf,
         |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |        FROM documents) t
         |  GROUP BY w ORDER BY tf DESC, w LIMIT $VocabK)
         |ORDER BY word""".stripMargin,

    "q58_top_terms" ->
      s"""WITH words AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
         |  FROM documents
         |), tf AS (
         |  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM words GROUP BY 1, 2
         |), dfreq AS (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS df
         |  FROM (SELECT DISTINCT doc_id, word FROM words) t GROUP BY word
         |), nd AS (
         |  SELECT COUNT(DISTINCT doc_id) AS n FROM documents
         |), scored AS (
         |  SELECT t.doc_id, t.word, t.tf, d.df,
         |         CAST(t.tf AS DOUBLE) * (SELECT n FROM nd) / d.df AS score
         |  FROM tf t JOIN dfreq d USING (word)
         |), ranked AS (
         |  SELECT doc_id, word, tf, df, score,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS term_rank
         |  FROM scored
         |)
         |SELECT doc_id, word, tf, df, score, CAST(term_rank AS INTEGER) AS term_rank
         |FROM ranked WHERE term_rank <= $TopTermsK
         |ORDER BY doc_id, term_rank""".stripMargin,

    "q59_clean_text" -> {
      val (tag, email, phone, ws) =
        (TextAnalysis.TagRe, TextAnalysis.EmailRe, TextAnalysis.PhoneRe, TextAnalysis.WsRe)
      s"""SELECT doc_id,
         |       trim(regexp_replace(
         |         regexp_replace(
         |           regexp_replace(
         |             regexp_replace(text, '$tag', ' ', 'g'),
         |             '$email', '<EMAIL>', 'g'),
         |           '$phone', '<PHONE>', 'g'),
         |         '$ws', ' ', 'g')) AS clean_text,
         |       CAST(len(regexp_extract_all(text, '$tag')) AS BIGINT) AS n_tags,
         |       CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phones
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    },

    "q54_sessionize" ->
      s"""WITH lagged AS (
         |  SELECT user_id, epoch_ns(ts) AS t, value,
         |         CASE WHEN lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)) IS NULL
         |                OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)) > $SessionGapNs
         |              THEN 1 ELSE 0 END AS new_s
         |  FROM events
         |), sess AS (
         |  SELECT user_id, t, value,
         |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM lagged
         |)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         |       MIN(t) AS session_start, MAX(t) AS session_end,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
         |FROM sess GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    "q55_asof_join" ->
      // DuckDB's native ASOF JOIN reproduces the union+running-last
      // semantics exactly once the right side is unique per (key, ts)
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS ts, value
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, max(value) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT l.event_id, l.user_id, l.ts, l.value, r.ts AS asof_ts, r.v AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // the oracle reads the ORIGINAL unpartitioned table: value equality
    // proves the partitioned rewrite round-trips; the pruning itself is
    // asserted plan-side inside the query
    "q65_partition_prune" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang = 'de' ORDER BY doc_id""".stripMargin,

    // exact contamination SQL (q51's shape on the % 7 eval slice): the
    // Spark side's bloom prefilter must be value-invisible
    "q66_bloom_contamination" ->
      s"""WITH $shingleCte, dsh AS (
         |  SELECT DISTINCT doc_id AS id, sh FROM sh
         |), train AS (
         |  SELECT DISTINCT sh FROM dsh WHERE id % 7 <> 0
         |), evalsh AS (
         |  SELECT id, sh FROM dsh WHERE id % 7 = 0
         |), hits AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_contam
         |  FROM evalsh JOIN train USING (sh) GROUP BY id
         |), nsh AS (
         |  SELECT d.doc_id AS id, CAST(COUNT(dsh.sh) AS BIGINT) AS n_sh
         |  FROM documents d LEFT JOIN dsh ON dsh.id = d.doc_id
         |  WHERE d.doc_id % 7 = 0 GROUP BY d.doc_id
         |)
         |SELECT nsh.id AS doc_id, n_sh,
         |       CAST(COALESCE(n_contam, 0) AS BIGINT) AS n_contam,
         |       CASE WHEN n_sh = 0 THEN 0.0
         |            ELSE CAST(COALESCE(n_contam, 0) AS DOUBLE) / n_sh END AS contam_frac
         |FROM nsh LEFT JOIN hits ON hits.id = nsh.id
         |ORDER BY doc_id""".stripMargin,

    // the oracle pins the EXACT distinct counts and `true` for every
    // estimate-band check — an HLL estimate drifting past the band (or a
    // broken sketch merge) fails as a plain value mismatch
    "q67_hll_cardinality" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS shard,
        |       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_exact,
        |       TRUE AS hll_ok
        |FROM customer GROUP BY 1
        |UNION ALL
        |SELECT -1, CAST(COUNT(DISTINCT c_custkey) AS BIGINT), TRUE FROM customer
        |ORDER BY shard""".stripMargin,

    // exact top-K terms; cms_ok pinned TRUE = the sketch answer stayed
    // inside [count, count + ceil(eps*N)] for every heavy hitter
    "q68_cms_heavy_hitters" ->
      s"""WITH w AS (
         |  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
         |  FROM documents
         |)
         |SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt, TRUE AS cms_ok
         |FROM w GROUP BY term
         |ORDER BY cnt DESC, term LIMIT $CmsTopK""".stripMargin,

    "q72_bloom_join" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q73_bloom_anti_join" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_orderkey = l_orderkey
        |                    AND o_totalprice > 400000.0)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q71_profile" -> {
      val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")
      docCols.sorted.map { c =>
        s"""SELECT '$c' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_total,
           |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct, TRUE AS hll_ok
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n") + "\nORDER BY column_name"
    },

    // the unmodified source table: the JSONL export/ingest must be
    // value-invisible
    "q69_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q76_mixture_sample" -> {
      // CASE chain mirrors mixtureSample's when-chain; the integer
      // thresholds come from the SAME mixtureParts computation the
      // operator uses, so there is no float re-derivation to disagree
      val arms = MixWeights.toSeq.sortBy(_._1).map { case (dom, w) =>
        val (whole, thresh) = Sampling.mixtureParts(w)
        s"WHEN '$dom' THEN $whole + CASE WHEN h < $thresh THEN 1 ELSE 0 END"
      }.mkString("\n         ")
      val (dWhole, dThresh) = Sampling.mixtureParts(1.0)
      val maxCopies = MixWeights.values.map(math.ceil(_).toInt).max max 1
      s"""WITH hashed AS (
         |  SELECT doc_id, source,
         |         ${dh("'mix:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents
         |), counted AS (
         |  SELECT doc_id, source,
         |         CASE source
         |         $arms
         |         ELSE $dWhole + CASE WHEN h < $dThresh THEN 1 ELSE 0 END END AS copies
         |  FROM hashed)
         |SELECT doc_id, source, CAST(c.copy AS INTEGER) AS copy
         |FROM counted, (SELECT unnest(range(0, $maxCopies)) AS copy) c
         |WHERE c.copy < copies
         |ORDER BY doc_id, copy""".stripMargin
    },

    "q77_zorder_box" -> {
      // the same Morton interleave, spelled in portable >>/& arithmetic
      val zTerms = (0 until ZBits).map(i =>
        s"((da >> $i) & 1) * ${1L << (2 * i + 1)} + ((db >> $i) & 1) * ${1L << (2 * i)}")
        .mkString(" + ")
      s"""SELECT l_orderkey, l_linenumber, da, db, CAST($zTerms AS BIGINT) AS zval
         |FROM (SELECT l_orderkey, l_linenumber,
         |             l_partkey % 256 AS da, l_suppkey % 256 AS db
         |      FROM lineitem)
         |WHERE da BETWEEN $ZBoxLo AND $ZBoxHi AND db BETWEEN $ZBoxLo AND $ZBoxHi
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    "q78_pq_adc" -> {
      // subspace slicing, per-subspace codeword dots, argmin encode,
      // query distance tables, ADC sum — each stage decimal-exact in
      // the q38 idiom so the approximate DISTANCES (not just the ranks)
      // must match bit-for-bit
      s"""WITH sv AS (
         |  SELECT vec_id, CAST(i // $PqSubDim AS INTEGER) AS sub, i, x
         |  FROM (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         |               unnest(embedding) AS x FROM embeddings) t
         |), cw AS (
         |  SELECT * FROM sv WHERE vec_id % $PqCodeMod = 0
         |), cnorm AS (
         |  SELECT vec_id AS code, sub,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS cnorm2
         |  FROM cw GROUP BY 1, 2
         |), enc_dot AS (
         |  SELECT s.vec_id AS id, c.vec_id AS code, s.sub,
         |         SUM(CAST(CAST(s.x AS DOUBLE) * CAST(c.x AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM sv s JOIN cw c ON c.i = s.i
         |  GROUP BY 1, 2, 3
         |), codes AS (
         |  SELECT id, sub, code FROM (
         |    SELECT e.id, e.sub, e.code,
         |           ROW_NUMBER() OVER (PARTITION BY e.id, e.sub
         |             ORDER BY (e.dot * 2 - n.cnorm2) DESC, e.code) AS rn
         |    FROM enc_dot e JOIN cnorm n ON n.code = e.code AND n.sub = e.sub) t
         |  WHERE rn = 1
         |), qnorm AS (
         |  SELECT vec_id AS id_a, sub,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS qnorm2
         |  FROM sv WHERE vec_id % 100 = 0 GROUP BY 1, 2
         |), lut AS (
         |  SELECT q.vec_id AS id_a, q.sub, c.vec_id AS code,
         |         SUM(CAST(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE) AS DECIMAL(20,12))) AS qcdot
         |  FROM sv q JOIN cw c ON c.i = q.i
         |  WHERE q.vec_id % 100 = 0 GROUP BY 1, 2, 3
         |), adc AS (
         |  SELECT l.id_a, k.id AS id_b,
         |         SUM(n.qnorm2 - l.qcdot * 2 + cn.cnorm2) AS adc2
         |  FROM codes k
         |  JOIN lut l ON l.sub = k.sub AND l.code = k.code
         |  JOIN qnorm n ON n.id_a = l.id_a AND n.sub = k.sub
         |  JOIN cnorm cn ON cn.code = k.code AND cn.sub = k.sub
         |  WHERE l.id_a <> k.id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b, round(CAST(adc2 AS DOUBLE), 6) AS adc_dist,
         |       CAST(rn AS INTEGER) AS rank
         |FROM (SELECT id_a, id_b, adc2,
         |             ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY adc2, id_b) AS rn
         |      FROM adc) t
         |WHERE rn <= $TopK ORDER BY id_a, rank""".stripMargin
    },

    "q85_ivf_pq" -> {
      // q43's coarse-cell CTEs (cosine assignment + nprobe probes)
      // gate WHICH pairs are scored; q78's PQ CTEs score them — the
      // ADC distances must still match bit-for-bit
      s"""WITH norms AS (
         |  SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS n2
         |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t GROUP BY vec_id
         |), cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id % $IvfCentMod = 0
         |), adots AS (
         |  SELECT vec_id, cent_id,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM (SELECT e.vec_id, c.cent_id, unnest(e.embedding) AS x, unnest(c.cvec) AS y
         |        FROM embeddings e, cents c) t
         |  GROUP BY vec_id, cent_id
         |), acos AS (
         |  SELECT a.vec_id, a.cent_id,
         |         CAST(a.dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cos
         |  FROM adots a
         |  JOIN norms nv ON nv.vec_id = a.vec_id
         |  JOIN norms nc ON nc.vec_id = a.cent_id
         |), cells AS (
         |  SELECT vec_id, cent_id AS cell FROM (
         |    SELECT vec_id, cent_id,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
         |    FROM acos) WHERE rn = 1
         |), probes AS (
         |  SELECT vec_id AS id_a, cent_id AS cell FROM (
         |    SELECT vec_id, cent_id,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
         |    FROM acos WHERE vec_id % 100 = 0) WHERE rn <= $IvfNprobe
         |), sv AS (
         |  SELECT vec_id, CAST(i // $PqSubDim AS INTEGER) AS sub, i, x
         |  FROM (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         |               unnest(embedding) AS x FROM embeddings) t
         |), cw AS (
         |  SELECT * FROM sv WHERE vec_id % $PqCodeMod = 0
         |), cnorm AS (
         |  SELECT vec_id AS code, sub,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS cnorm2
         |  FROM cw GROUP BY 1, 2
         |), enc_dot AS (
         |  SELECT s.vec_id AS id, c.vec_id AS code, s.sub,
         |         SUM(CAST(CAST(s.x AS DOUBLE) * CAST(c.x AS DOUBLE) AS DECIMAL(20,12))) AS dot
         |  FROM sv s JOIN cw c ON c.i = s.i
         |  GROUP BY 1, 2, 3
         |), codes AS (
         |  SELECT id, sub, code FROM (
         |    SELECT e.id, e.sub, e.code,
         |           ROW_NUMBER() OVER (PARTITION BY e.id, e.sub
         |             ORDER BY (e.dot * 2 - n.cnorm2) DESC, e.code) AS rn
         |    FROM enc_dot e JOIN cnorm n ON n.code = e.code AND n.sub = e.sub) t
         |  WHERE rn = 1
         |), qnorm AS (
         |  SELECT vec_id AS id_a, sub,
         |         SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))) AS qnorm2
         |  FROM sv WHERE vec_id % 100 = 0 GROUP BY 1, 2
         |), lut AS (
         |  SELECT q.vec_id AS id_a, q.sub, c.vec_id AS code,
         |         SUM(CAST(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE) AS DECIMAL(20,12))) AS qcdot
         |  FROM sv q JOIN cw c ON c.i = q.i
         |  WHERE q.vec_id % 100 = 0 GROUP BY 1, 2, 3
         |), cand AS (
         |  SELECT p.id_a, s.vec_id AS id_b
         |  FROM probes p JOIN cells s ON s.cell = p.cell
         |  WHERE p.id_a <> s.vec_id
         |), adc AS (
         |  SELECT ca.id_a, ca.id_b,
         |         SUM(n.qnorm2 - l.qcdot * 2 + cn.cnorm2) AS adc2
         |  FROM cand ca
         |  JOIN codes k ON k.id = ca.id_b
         |  JOIN lut l ON l.id_a = ca.id_a AND l.sub = k.sub AND l.code = k.code
         |  JOIN qnorm n ON n.id_a = ca.id_a AND n.sub = k.sub
         |  JOIN cnorm cn ON cn.code = k.code AND cn.sub = k.sub
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b, round(CAST(adc2 AS DOUBLE), 6) AS adc_dist,
         |       CAST(rn AS INTEGER) AS rank
         |FROM (SELECT id_a, id_b, adc2,
         |             ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY adc2, id_b) AS rn
         |      FROM adc) t
         |WHERE rn <= $TopK ORDER BY id_a, rank""".stripMargin
    },

    "q86_range_join" ->
      """SELECT CAST(n.n_nationkey AS BIGINT) AS rid,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN nation n
        |  ON CAST(l.l_quantity AS DOUBLE) >= n.n_nationkey * 2.0
        | AND CAST(l.l_quantity AS DOUBLE) <= n.n_nationkey * 2.0 + 3.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q87_interval_join" ->
      """SELECT CAST(s.s_suppkey AS BIGINT) AS sid,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(SUM(p.p_partkey) AS BIGINT) AS sum_pid
        |FROM supplier s JOIN part p
        |  ON (s.s_suppkey % 100) * 3.0 <= (p.p_partkey % 200) * 1.5 + 2.0
        | AND (p.p_partkey % 200) * 1.5 <= (s.s_suppkey % 100) * 3.0 + 10.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q88_json_extract" ->
      """WITH parsed AS (
        |  -- json_extract_STRING + TRY_CAST keeps DuckDB as strict as
        |  -- Spark's schema'd parser: a fractional k fails the INTEGER
        |  -- cast on both sides instead of silently rounding here
        |  SELECT TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, value
        |  FROM events
        |  WHERE props IS NOT NULL AND json_valid(props)
        |)
        |SELECT CAST(floor(k / 10.0) AS BIGINT) AS k_decade,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
        |       CAST(MIN(k) AS BIGINT) AS min_k,
        |       CAST(MAX(k) AS BIGINT) AS max_k
        |FROM parsed WHERE k IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q89_bm25_search" -> {
      // per-term score replicated with EXPLICIT CAST(… AS DOUBLE) on every
      // constant (a bare 1.2 is a DECIMAL in DuckDB — decimal 2.2 cast to
      // double need not equal double(1.2)+1.0) and the same left-assoc
      // op order as the Column expression, so every IEEE step matches
      def ts(i: Int): String = {
        val idf = s"(((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE)) + CAST(0.5 AS DOUBLE)) / (CAST(df$i AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
        val den = s"(CAST(tf$i AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))"
        s"($idf * ((CAST(tf$i AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) / $den))"
      }
      val tfDefs = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(toks, w -> w = '$t')) AS BIGINT) AS tf$i" }.mkString(",\n|         ")
      val dfDefs = Bm25Terms.indices.map(i =>
        s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i").mkString(",\n|         ")
      val score = Bm25Terms.indices.map(ts).reduce((a, b) => s"($a + $b)")
      val anyHit = Bm25Terms.indices.map(i => s"tf$i > 0").mkString(" OR ")
      val tfCols = Bm25Terms.indices.map(i => s"tf$i").mkString(", ")
      s"""WITH tok AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents
         |), base AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         |         $tfDefs
         |  FROM tok
         |), st AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sdl,
         |         $dfDefs
         |  FROM base
         |)
         |SELECT doc_id, $tfCols, dl, score FROM (
         |  SELECT doc_id, $tfCols, dl, ROUND($score, 6) AS score
         |  FROM base, st WHERE $anyHit
         |  ORDER BY score DESC, doc_id LIMIT $Bm25K)
         |ORDER BY doc_id""".stripMargin
    },

    "q90_groupaware_split" ->
      s"""$clusterCte, labels AS (
         |  SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id
         |  FROM reach GROUP BY node
         |)
         |SELECT doc_id, cluster_id,
         |       CASE WHEN d < 80 THEN 'train' WHEN d < 90 THEN 'valid' ELSE 'test' END AS split
         |FROM (SELECT doc_id, cluster_id,
         |             ${dh("'gsplit:' || CAST(cluster_id AS VARCHAR)")} % 100 AS d
         |      FROM labels)
         |ORDER BY doc_id""".stripMargin,

    // the partition-offset mechanics are Spark-side plumbing; the
    // CONTRACT is "rank in the hash-ordered global permutation", which
    // one window states directly at oracle scale
    "q91_training_order" ->
      s"""SELECT doc_id,
         |       CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS train_pos
         |FROM (SELECT doc_id, ${dh("'order:' || CAST(doc_id AS VARCHAR)")} AS h
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q92_pii_redact" -> {
      val seeded = "CASE WHEN doc_id % 3 <> 0 THEN text || ' reach u' || CAST(doc_id AS VARCHAR)" +
        " || '@mail.example.org or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')" +
        " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')" +
        " || ' from 10.1.' || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE text END"
      val pats = graft.ops.TextAnalysis.PiiPatterns
      val counts = pats.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS n_$name"
      }.mkString(",\n|       ")
      val redacted = pats.foldLeft("t") { case (c, (_, pat, repl)) =>
        s"regexp_replace($c, '$pat', '$repl', 'g')"
      }
      s"""SELECT doc_id,
         |       $counts,
         |       $redacted AS clean_text
         |FROM (SELECT doc_id, $seeded AS t FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    "q93_domain_cap" ->
      s"""SELECT doc_id, source, CAST(rk AS BIGINT) AS rank_in_group
         |FROM (SELECT doc_id, source,
         |             row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
         |      FROM (SELECT doc_id, source,
         |                   ${dh("'cap:' || source || ':' || CAST(doc_id AS VARCHAR)")} AS h
         |            FROM documents))
         |WHERE rk <= $CapK
         |ORDER BY doc_id""".stripMargin,

    "q94_token_budget" ->
      s"""WITH g AS (
         |  SELECT source, CAST(SUM(n_chars) AS HUGEINT) AS tok FROM documents GROUP BY source
         |), t AS (SELECT SUM(tok) AS tt FROM g),
         |b AS (
         |  SELECT source, tok,
         |         (tok * ${BudgetTokens}) // tt AS base,
         |         (tok * ${BudgetTokens}) % tt AS rem
         |  FROM g, t
         |), e AS (SELECT SUM(base) AS sb FROM b)
         |SELECT source, CAST(tok AS BIGINT) AS group_tokens,
         |       CAST(base + CASE WHEN rk <= ${BudgetTokens} - sb THEN 1 ELSE 0 END AS BIGINT) AS token_alloc
         |FROM (SELECT source, tok, base,
         |             row_number() OVER (ORDER BY rem DESC, source) AS rk
         |      FROM b), e
         |ORDER BY source""".stripMargin,

    "q95_nb_quality" -> {
      // re-fit the two-row count model and replay the fixed-order score
      // sum: every non-ln step is an exactly-rounded double op spelled
      // identically; ln ulp drift is absorbed by the final ROUND(…, 4)
      val featDefs = NbTerms.zipWithIndex.map { case (t, i) =>
        s"list_contains(regexp_split_to_array(lower(text), '\\s+'), '$t') AS f$i"
      }.mkString(",\n|         ")
      val cntDefs = NbTerms.indices.flatMap(i => Seq(
        s"CAST(SUM(CASE WHEN weak_label AND f$i THEN 1 ELSE 0 END) AS BIGINT) AS dp$i",
        s"CAST(SUM(CASE WHEN NOT weak_label AND f$i THEN 1 ELSE 0 END) AS BIGINT) AS dn$i"
      )).mkString(",\n|         ")
      def pp(i: Int) = s"((CAST(dp$i AS DOUBLE) + 1.0) / (CAST(np AS DOUBLE) + 2.0))"
      def pn(i: Int) = s"((CAST(dn$i AS DOUBLE) + 1.0) / (CAST(nn AS DOUBLE) + 2.0))"
      val termSum = NbTerms.indices.map(i =>
        s"(CASE WHEN f$i THEN ln(${pp(i)} / ${pn(i)}) " +
          s"ELSE ln((1.0 - ${pp(i)}) / (1.0 - ${pn(i)})) END)")
        .foldLeft("ln(CAST(np AS DOUBLE) / CAST(nn AS DOUBLE))")((a, b) => s"($a + $b)")
      s"""WITH base AS (
         |  SELECT doc_id, n_chars > $NbLabelChars AS weak_label,
         |         $featDefs
         |  FROM documents
         |), st AS (
         |  SELECT CAST(SUM(CASE WHEN weak_label THEN 1 ELSE 0 END) AS BIGINT) AS np,
         |         CAST(SUM(CASE WHEN NOT weak_label THEN 1 ELSE 0 END) AS BIGINT) AS nn,
         |         $cntDefs
         |  FROM base
         |)
         |SELECT doc_id, weak_label, score, score > 0 AS predicted
         |FROM (SELECT doc_id, weak_label, ROUND($termSum, 4) AS score
         |      FROM base, st)
         |ORDER BY doc_id""".stripMargin
    },

    "q79_chunk_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS arr FROM documents
         |), idx AS (
         |  SELECT doc_id, arr,
         |         unnest(range(0, CAST(ceil(len(arr)::DOUBLE / $ChunkW) AS BIGINT))) AS ci
         |  FROM toks
         |), ct AS (
         |  SELECT doc_id, ci,
         |         array_to_string(arr[ci*$ChunkW+1 : ci*$ChunkW+$ChunkW], ' ') AS chunk_text
         |  FROM idx
         |), ranked AS (
         |  SELECT doc_id, ci, chunk_text,
         |         ROW_NUMBER() OVER (PARTITION BY chunk_text ORDER BY doc_id, ci) AS rn
         |  FROM ct
         |)
         |SELECT doc_id,
         |       COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' ' ORDER BY ci), '') AS clean_text,
         |       CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |       CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept
         |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q80_bigram_lm" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS arr FROM documents
         |), bi AS (
         |  SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
         |  FROM (SELECT doc_id, arr, unnest(range(1, len(arr))) AS i FROM toks)
         |), c2 AS (
         |  SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY 1, 2
         |), c1 AS (
         |  SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1
         |), v AS (
         |  SELECT COUNT(DISTINCT w) AS v
         |  FROM (SELECT unnest(arr) AS w FROM toks)
         |)
         |SELECT bi.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |       ROUND(AVG(ln((c2.c2 + $LmK) / (c1.c1 + $LmK * v.v))), 4) AS avg_logp
         |FROM bi
         |JOIN c2 USING (w1, w2)
         |JOIN c1 USING (w1)
         |CROSS JOIN v
         |GROUP BY bi.doc_id ORDER BY bi.doc_id""".stripMargin,

    "q81_orc_roundtrip" ->
      s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
         |FROM lineitem
         |WHERE l_orderkey >= $OrcKeyLo AND l_orderkey < $OrcKeyHi
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q82_exact_quantiles" -> {
      // CAST the prob label: a bare 0.99 literal is DECIMAL(3,2) to
      // DuckDB but DOUBLE to Spark, and the driver compares schemas
      val rows = QuantProbs.map(p =>
        s"SELECT CAST($p AS DOUBLE) AS prob, ROUND(quantile_cont(l_extendedprice, $p), 4) AS quantile FROM lineitem")
        .mkString("\nUNION ALL\n")
      s"$rows\nORDER BY prob"
    },

    "q83_upsert" ->
      """WITH base AS (
        |  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 7 <> 0
        |), u AS (
        |  SELECT doc_id, lang, n_chars + 100000 AS n_chars
        |  FROM documents WHERE doc_id % 3 = 0
        |)
        |SELECT doc_id, lang, n_chars FROM u
        |UNION ALL
        |SELECT b.doc_id, b.lang, b.n_chars FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.doc_id = b.doc_id)
        |ORDER BY doc_id""".stripMargin,

    // portable fields exactly (counts, min/max, exact distinct); the
    // float-internal assertions (decimal-sum merge exactness, collector
    // agreement, HLL band) are Spark-side booleans pinned TRUE here.
    // o_orderdate's measure image is epoch seconds on both engines
    // (whole-second timestamps, so epoch() vs unix_seconds agree).
    "q84_incremental_stats" -> {
      val measures = Seq(
        ("o_custkey", "o_custkey"),
        ("o_orderdate", "epoch(o_orderdate)"),
        ("o_totalprice", "o_totalprice"))
      measures.map { case (name, img) =>
        s"""SELECT '$name' AS measure,
           |       CAST(COUNT($name) AS BIGINT) AS n,
           |       CAST(COUNT(*) - COUNT($name) AS BIGINT) AS nulls,
           |       CAST(MIN($img) AS DOUBLE) AS vmin,
           |       CAST(MAX($img) AS DOUBLE) AS vmax,
           |       CAST(COUNT(DISTINCT $name) AS BIGINT) AS n_distinct,
           |       TRUE AS hll_ok, TRUE AS merge_exact, TRUE AS moments_ok,
           |       CAST(COUNT($name) AS BIGINT) AS hist_total
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n") + "\nORDER BY measure"
    },

    "q41_window_events" ->
      """SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600.0) AS BIGINT) AS hour_bucket,
        |       event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
        |       MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
  )
}
