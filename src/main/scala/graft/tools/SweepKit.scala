package graft.tools

import graft.estimate.Estimator

/** The band-sweep conventions shared by [[GruSweep]] and
  * [[LearningCurve]] (and anything else scoring against the campaign):
  * the CRC-byte holdout predicate, per-dimension z-score statistics
  * with a CANCELLATION-SAFE variance (the naive sq/n − mean² can go
  * slightly negative for constant non-dyadic columns; sqrt of that is
  * NaN and would silently poison every normalized vector), the
  * bucket-balanced cyclic oversampler, and the seed-vote. One home so
  * the learning-curve artifact can never desynchronize from the sweep
  * it explains.
  */
private[tools] object SweepKit {

  /** Held-out iff the SQL's CRC32 low byte < 64 (≈25%). */
  def isHoldout(sql: String): Boolean = {
    val c = new java.util.zip.CRC32(); c.update(sql.getBytes("UTF-8"))
    (c.getValue & 0xff) < 64
  }

  /** Validation carve for best-epoch checkpoint selection
    * ([[graft.estimate.Gru.fitValSelected]]): the next CRC-byte band
    * above the holdout's — [64, 90), ~10% of the population — so it is
    * disjoint from the test holdout BY CONSTRUCTION and as stable
    * across checkpoint growth/merges as the holdout itself. */
  def isVal(sql: String): Boolean = {
    val c = new java.util.zip.CRC32(); c.update(sql.getBytes("UTF-8"))
    val b = c.getValue & 0xff
    b >= 64 && b < 90
  }

  /** Per-dimension mean/std over all timesteps of the train split's
    * sequences; variance clamped at 0 before the sqrt, floor 1e-6. */
  def zStats(train: Seq[(String, Double)], dim: Int,
             enc: String => Array[Array[Double]]): (Array[Double], Array[Double]) = {
    val sum = new Array[Double](dim); val sq = new Array[Double](dim)
    var n = 0L
    train.foreach { case (sql, _) =>
      enc(sql).foreach { row =>
        var i = 0
        while (i < dim) { sum(i) += row(i); sq(i) += row(i) * row(i); i += 1 }
        n += 1
      }
    }
    val mean = sum.map(_ / n)
    val std = sq.indices.map { i =>
      math.max(1e-6, math.sqrt(math.max(0.0, sq(i) / n - mean(i) * mean(i))))
    }.toArray
    (mean, std)
  }

  def zApply(mean: Array[Double], std: Array[Double])(
      seq: Array[Array[Double]]): Array[Array[Double]] =
    seq.map { row =>
      val out = new Array[Double](mean.length)
      var i = 0
      while (i < mean.length) { out(i) = (row(i) - mean(i)) / std(i); i += 1 }
      out
    }

  /** The `tpch_aug` analog (BASELINE.md's model table credits the
    * reference's best gerelt F1 0.754 to the AUGMENTED dataset):
    * expand each TRAIN query into up to `limit` join-commute /
    * predicate-order permutations ([[graft.ir.TreeOps.permutations]],
    * the D2 machinery `Workloads.augment` runs distributed) carrying
    * the same runtime label. The holdout never enters; any permuted
    * string that is byte-identical to a held-out query's SQL is
    * dropped (the generator can emit permutation-equal near-
    * duplicates, and training on an exact holdout string would
    * memorize that point). Unparseable inputs fall back to themselves.
    */
  def augment(train: Seq[(String, Double)], db: graft.model.DbModel,
              limit: Int, holdout: Set[String]): Seq[(String, Double)] =
    train.flatMap { case (sql, rt) =>
      scala.util.Try {
        graft.ir.TreeOps.permutations(
            graft.ir.Frontend.parseSql(sql, Some(db)), limit)
          .map(p => (graft.ir.TreeOps.toQuery(p).toSql(pretty = false), rt))
      }.getOrElse(Seq((sql, rt)))
    }.distinct.filterNot { case (sql, _) => holdout.contains(sql) }

  /** [[augment]] with a PER-BUCKET permutation limit: a bucket with few
    * measurements gets a higher limit (up to `capLimit`), the majority
    * bucket stays near 1 — so a single 200 s measurement (hours of
    * wall-clock to obtain) expands into up to `capLimit` free training
    * rows at the same label while the plentiful sub-second population
    * is left alone. limit(b) = clamp(round(maxCount / count_b), 1,
    * capLimit). Same holdout-exclusion rule as [[augment]].
    */
  def augmentPerBucket(train: Seq[(String, Double)], db: graft.model.DbModel,
                       capLimit: Int, holdout: Set[String])
      : Seq[(String, Double)] = {
    val byBucket = train.groupBy { case (_, rt) => Estimator.runtimeBucket(rt, 0) }
    val maxN = byBucket.values.map(_.size).max
    byBucket.toSeq.sortBy(_._1).flatMap { case (_, xs) =>
      val limit = math.max(1,
        math.min(capLimit, math.round(maxN.toDouble / xs.size).toInt))
      augment(xs, db, limit, holdout)
    }
  }

  /** Inverse-frequency class weights for the weighted cross-entropy
    * ([[graft.estimate.Gru.fitValSelectedWeighted]]): w_b = n / (K·n_b),
    * capped at `cap` so a near-empty tail bucket cannot hand a handful
    * of examples the whole gradient budget (uncapped, 12 examples in a
    * 7,000-row population would weigh ×90 each and single examples
    * would dominate every batch they appear in). Empty classes get 0.
    */
  def classWeights(labels: Seq[Int], classes: Int, cap: Double): Array[Double] = {
    val counts = new Array[Int](classes)
    labels.foreach(l => counts(l) += 1)
    val n = labels.size.toDouble
    counts.map(c => if (c == 0) 0.0 else math.min(cap, n / (classes * c)))
  }

  /** Bucket-balanced cyclic oversampling to the largest bucket's size
    * (training set only). */
  def balance(train: Seq[(String, Double)]): Seq[(String, Double)] = {
    val byBucket = train.groupBy { case (_, rt) => Estimator.runtimeBucket(rt, 0) }
    val cap = byBucket.values.map(_.size).max
    byBucket.toSeq.sortBy(_._1).flatMap { case (_, xs) =>
      Iterator.continually(xs).flatten.take(cap).toSeq
    }
  }

  /** Run the per-seed ensemble fits concurrently, results in seed
    * order. Each fit is a pure function of (data, seed) — the
    * `graft.estimate` trainers hold no object-level state and draw from
    * a local Random seeded by cfg.seed — so platform-threading them
    * changes wall-clock only, never a result. The first failure (OOM in
    * a fit, say) is rethrown after all threads settle so a sweep never
    * reports a partial ensemble as complete.
    */
  def parSeeds[A](seeds: Seq[Long])(f: Long => A): Seq[A] = {
    val out = new Array[Any](seeds.size)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val ts = seeds.zipWithIndex.map { case (s, i) =>
      val t = new Thread(() =>
        try out(i) = f(s)
        catch { case e: Throwable => err.compareAndSet(null, e) })
      t.start(); t
    }
    ts.foreach(_.join())
    if (err.get != null) throw err.get
    out.toSeq.map(_.asInstanceOf[A])
  }

  /** Per-example majority vote across seeds; ties to the SMALLER bucket. */
  def vote(bucketsPerSeed: Seq[Seq[Int]]): Seq[Double] =
    bucketsPerSeed.transpose.map { votes =>
      votes.groupBy(identity).toSeq.maxBy { case (b, vs) => (vs.size, -b) }._1.toDouble
    }
}
