package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-pipeline operators added in round 3: connected components over
  * near-dup pairs, benchmark contamination, sequence packing, and
  * repetition metrics. Tests pin the exact deterministic semantics the
  * DuckDB oracles recompute.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("connectedComponents labels every node with its component minimum") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {5,6} (pair), {7} (singleton), {8,9,10} (triangle)
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 6L),
      (8L, 9L), (9L, 10L), (10L, 8L)).toDF("id_a", "id_b")
    val nodes = (1L to 10L).toDF("id")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b", nodes, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 8L, 10L -> 8L)
    assert(got == want)
  }

  test("keepBest keeps the top-scored doc per cluster, ties to the smallest id") {
    import spark.implicits._
    val rows = Seq(
      // cluster 1: clear winner by score
      (1L, 1L, 10L), (2L, 1L, 30L), (3L, 1L, 20L),
      // cluster 5: score tie -> smallest id wins
      (5L, 5L, 40L), (6L, 5L, 40L), (7L, 5L, 15L),
      // singleton cluster
      (9L, 9L, 1L)
    ).toDF("doc_id", "cluster_id", "score")
    val kept = Dedup.keepBest(rows.repartition(3), "cluster_id", "doc_id", "score")
      .select("doc_id", "cluster_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept == Map(2L -> 1L, 5L -> 5L, 9L -> 9L))
    val e = intercept[IllegalArgumentException] {
      Dedup.keepBest(rows.withColumn("doc_id", $"doc_id".cast("string")),
        "cluster_id", "doc_id", "score")
    }
    assert(e.getMessage.contains("numeric id"))
  }

  test("connectedComponents is partition-independent and handles a long chain") {
    import spark.implicits._
    // a 40-node path graph: worst-case diameter for the propagation loop
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (1L to 40L).toDF("id")
    val got = Dedup.connectedComponents(edges.repartition(7), "id_a", "id_b",
        nodes.repartition(3), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 40L).map(_ -> 1L).toMap)
  }

  test("connectedComponents agrees with a reference union-find on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val n = 120
    val edges = Seq.fill(90)((rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
      .filter(e => e._1 != e._2)
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
        "id_a", "id_b", (1L to n.toLong).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: plain union-find with path compression
    val parent = Array.tabulate(n + 1)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (1 to n).map { i =>
      // component minimum: after unions, walk to the root (roots are
      // always the component minimum because we union larger -> smaller)
      i.toLong -> find(i).toLong
    }.toMap
    assert(got == want)
  }

  test("connectedComponents ignores edges touching nodes outside the given set") {
    import spark.implicits._
    // edge (5,9): 9 is not in the node set — must neither appear in the
    // output nor pull 5's label anywhere
    val edges = Seq((1L, 2L), (5L, 9L)).toDF("id_a", "id_b")
    val nodes = (1L to 5L).toDF("id")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b", nodes, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("connectedComponents pointer jump converges in O(log diameter) rounds") {
    import spark.implicits._
    // 64-node path: diameter 63. Plain min-propagation needs ~63 rounds;
    // with the label(label(n)) jump the chain halves every round, so the
    // count must land well under the diameter (2^8 > 63 → ≤ 8 + slack).
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (1L to 64L).toDF("id")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b", nodes, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 64L).map(_ -> 1L).toMap)
    assert(Dedup.lastRounds <= 10,
      s"64-chain took ${Dedup.lastRounds} rounds — pointer jump not effective")
  }

  test("connectedComponents keeps string ids native (no silent long cast)") {
    import spark.implicits._
    // pre-fix behavior: cast("long") turned these ids into all-NULL
    // labels and converged instantly to garbage
    val edges = Seq(("doc-b", "doc-a"), ("doc-c", "doc-b")).toDF("id_a", "id_b")
    val nodes = Seq("doc-a", "doc-b", "doc-c", "doc-z").toDF("id")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b", nodes, "id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a",
      "doc-c" -> "doc-a", "doc-z" -> "doc-z"))
  }

  test("connectedComponents reliable=true checkpoints through the configured dir") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (3L, 2L)).toDF("id_a", "id_b")
    val nodes = (1L to 4L).toDF("id")
    // without a checkpoint dir the reliable path must fail fast
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(edges, "id_a", "id_b", nodes, "id", reliable = true)
    }
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val got = Dedup.connectedComponents(edges, "id_a", "id_b", nodes, "id",
        reliable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
    // proof the reliable path actually wrote checkpoint files
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, s"reliable=true left no files under $dir")
  }

  test("simhashPairs rejects radius configs whose pigeonhole cannot prune") {
    import spark.implicits._
    val sim = Seq((1L, 7L), (2L, 7L)).toDF("doc_id", "simhash")
    // maxHamming=14 → 15 chunks of 4 bits: unrelated fingerprints collide
    // with p ≈ 15/16 — quadratic by configuration, must fail fast
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(sim, "doc_id", maxHamming = 14)
    }
    assert(e.getMessage.contains("all-pairs"))
    // the same radius with an explicit opt-in (verification corpus) runs
    assert(Dedup.simhashPairs(sim, "doc_id", 14, maxCollisionFraction = 1.0)
      .count() == 1)
    // a corpus-scale radius (3 → 4 chunks of 15 bits, p ≈ 1.2e-4) passes
    // the default guard and still finds the qualifying pair exactly
    val got = Dedup.simhashPairs(sim, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 0L)))
  }

  test("connectedComponents on an empty node set returns empty") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val nodes = Seq.empty[Long].toDF("id")
    assert(Dedup.connectedComponents(edges, "id_a", "id_b", nodes, "id").count() == 0L)
  }

  test("ngramContamination counts distinct train-overlapping shingles per eval doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),        // train: shingles {abg, bgd'}
      (2L, "alpha beta gamma epsilon"),      // train
      (10L, "alpha beta gamma delta"),       // eval: all 2 shingles in train
      (20L, "zeta eta theta iota"),          // eval: 0 of 2 in train
      (30L, "one two")                       // eval: no shingles at all
    ).toDF("doc_id", "text")
    val got = Dedup.ngramContamination(docs, "doc_id", "text",
        col("doc_id") >= 10, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got(0) == ((10L, 2L, 2L, 1.0)))
    assert(got(1) == ((20L, 2L, 0L, 0.0)))
    assert(got(2) == ((30L, 0L, 0L, 0.0)))
  }

  test("packSequences chops the per-group token stream at exact budget boundaries") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", 300L), (2L, "s1", 300L), (3L, "s1", 500L), (4L, "s1", 10L),
      (5L, "s2", 1200L), (6L, "s2", 1L)
    ).toDF("doc_id", "source", "n_tokens")
    val got = Sampling.packSequences(docs.repartition(5), "doc_id", "source", "n_tokens", 512L)
      .select("doc_id", "seq_id", "seq_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // s1 stream offsets: doc1@0, doc2@300, doc3@600, doc4@1100
    // s2 stream offsets: doc5@0, doc6@1200
    assert(got.toSeq == Seq(
      (1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L), (4L, 2L, 76L),
      (5L, 0L, 0L), (6L, 2L, 176L)))
  }

  test("packSequences: a document larger than the budget spans sequences; stream stays exact") {
    import spark.implicits._
    // doc 1 alone fills seqs 0..2 (1300 tokens / 512); doc 2 starts at
    // offset 1300 -> seq 2 off 276; doc 3 at 1400 -> seq 2 off 376
    val docs = Seq((1L, "g", 1300L), (2L, "g", 100L), (3L, "g", 50L))
      .toDF("doc_id", "source", "n_tokens")
    val got = Sampling.packSequences(docs, "doc_id", "source", "n_tokens", 512L)
      .select("doc_id", "seq_id", "seq_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 0L, 0L), (2L, 2L, 276L), (3L, 2L, 376L)))
  }

  test("vocabulary with k beyond the vocab size returns every word") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabulary(docs, "doc_id", "text", 100)
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("a", "b", "c"))
  }

  test("shuffleShards is a stable permutation: contiguous positions per shard") {
    import spark.implicits._
    val docs = (1L to 500L).toDF("id")
    val a = Sampling.shuffleShards(docs, "id", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b = Sampling.shuffleShards(docs.repartition(13), "id", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq, "not repartition-stable")
    assert(a.forall(x => x._2 >= 0 && x._2 < 8))
    // positions within each shard are exactly 1..|shard|
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // the permutation is not the identity order (it actually shuffles)
    val inOrder = a.sortBy(x => (x._2, x._3)).map(_._1)
    assert(inOrder.toSeq != inOrder.sorted.toSeq)
  }

  test("vocabulary returns the top-k words with tf/df, ties broken by word") {
    import spark.implicits._
    val docs = Seq((1L, "b a a c"), (2L, "a b d"), (3L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabulary(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // tf: a=3 b=3 c=1 d=1 → top2 = a, b (tie broken by word keeps both)
    assert(got.toSeq == Seq(("a", 3L, 2L), ("b", 3L, 3L)))
  }

  test("topTerms ranks by tf·n_docs/df with deterministic tie-break") {
    import spark.implicits._
    val docs = Seq((1L, "x x y common"), (2L, "y common"), (3L, "common")).toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(5))).sortBy(x => (x._1, x._3))
    // doc1: x tf=2 df=1 → 6.0; y tf=1 df=2 → 1.5; common tf=1 df=3 → 1.0
    assert(got.toSeq == Seq((1L, "x", 1), (1L, "y", 2),
      (2L, "y", 1), (2L, "common", 2), (3L, "common", 1)))
  }

  test("cleanText strips markup, redacts PII spans, collapses whitespace") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<p>Hello  <b>world</b></p> mail me at bob.smith+x@example.co.uk ok"),
      (2L, "call +1 (555) 123-4567 now\n\tplease"),
      (3L, "plain text stays")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.cleanText(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got(0) == ((1L, "Hello world mail me at <EMAIL> ok", 4L, 1L, 0L)))
    assert(got(1) == ((2L, "call <PHONE> now please", 0L, 0L, 1L)))
    assert(got(2) == ((3L, "plain text stays", 0L, 0L, 0L)))
  }

  test("repetitionMetrics exposes top-term coverage without tie-broken terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam ham"),   // top word 4/5; top bigram "spam spam" 3/4
      (2L, "all words differ here"),     // top word 1/4; top bigram 1/3
      (3L, "single")                     // one word, no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).sortBy(_._1)
    assert(got(0) == ((1L, 5L, 4L, 0.8, 4L, 3L, 0.75)))
    assert(got(1) == ((2L, 4L, 1L, 0.25, 3L, 1L, 1.0 / 3.0)))
    assert(got(2) == ((3L, 1L, 1L, 1.0, 0L, 0L, 0.0)))
  }

  test("corpusDiff labels by content hash: added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "same"), (2L, "gone"), (3L, "before")).toDF("doc_id", "text")
    val neu = Seq((1L, "same"), (3L, "after"), (4L, "fresh")).toDF("doc_id", "text")
    val got = Dedup.corpusDiff(old, neu, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "unchanged"), (2L, "removed"),
      (3L, "changed"), (4L, "added")))
  }

  test("containmentPairs scores quote-inclusion that Jaccard misses") {
    import spark.implicits._
    // doc 2 is doc 1 quoted inside much longer unrelated text: the
    // small side's shingles are fully contained, but the union is
    // dominated by the long side
    val quote = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (1L, quote),
      (2L, s"$filler $quote"),
      (3L, "wholly unrelated words nothing shared here at all")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleN = 3, maxDf = 50, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // doc 1 has 4 shingles, every one inside doc 2 (the "$filler $quote"
    // join also creates bridging shingles, but all 4 of doc 1's survive)
    val (nInter, contAb, contBa) = cont((1L, 2L))
    assert(nInter == 4 && contAb == 1.0, s"n_inter=$nInter cont_ab=$contAb")
    assert(contBa < 0.1, s"long side must NOT be contained: $contBa")
    assert(!cont.contains((1L, 3L)) && !cont.contains((2L, 3L)))
    // the same pair under symmetric Jaccard at the same bar: invisible
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 50, 0.9).collect()
    assert(jac.isEmpty, "Jaccard at 0.9 must miss the quote-inclusion pair")
  }
}
