package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.encode.Encoder
import graft.estimate.Estimator
import graft.gen.RandomQueryGen
import graft.lab.Executor
import graft.model.StatsCollector

/** Rows-only query entries (no SQL-expressible oracle) exposing the
  * reference-pipeline components end-to-end: workload generation (G2),
  * execution-lab plan capture (X1/X4), feature encoding (E1-E11), and
  * estimator training/evaluation — the full §3.1/§3.2 lifecycle running
  * on the driver testdata.
  */
object PipelineCatalog {

  private val statTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem")

  private def model(s: SparkSession, dir: String) =
    StatsCollector.collect(s, dir, statTables)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G2: seeded random workload over the collected stats model
    "q60_generate" -> { (s, dir) =>
      import s.implicits._
      val db = model(s, dir)
      val rows = (1 to 20).map { seed =>
        val q = new RandomQueryGen(db, seed).randomize()
        (seed, q.toSql(pretty = false), q.valid)
      }
      rows.toDF("seed", "sql", "valid").orderBy("seed")
    },

    // X1/X4: timing protocol + physical-plan op-tree capture
    "q61_plan_ops" -> { (s, dir) =>
      import s.implicits._
      Tables.registerAll(s, dir)
      val ex = new Executor(s, timeoutSec = 300)
      val run = ex.analyze(
        """SELECT o.o_orderkey, COUNT(*) AS n FROM lineitem l, orders o
          |WHERE l.l_orderkey = o.o_orderkey AND o.o_totalprice > 1000.0
          |GROUP BY o.o_orderkey""".stripMargin)
      val df = s.sql(
        """SELECT o.o_orderkey, COUNT(*) AS n FROM lineitem l, orders o
          |WHERE l.l_orderkey = o.o_orderkey AND o.o_totalprice > 1000.0
          |GROUP BY o.o_orderkey""".stripMargin)
      df.collect()
      val ops = graft.lab.PlanOps.fromDataFrame(df).preorder
      ops.zipWithIndex
        .map { case (op, i) => (i, op.kind, op.detail.take(60), run.seconds > 0) }
        .toDF("op_idx", "kind", "detail", "timed").orderBy("op_idx")
    },

    // E1-E11: deterministic per-node feature vectors for a fixed query
    "q62_encode" -> { (s, dir) =>
      import s.implicits._
      val db = model(s, dir)
      val tree = Encoder.encodeQuery(db,
        """SELECT MIN(l.l_extendedprice) FROM lineitem as l, orders as o
          |WHERE l.l_orderkey = o.o_orderkey AND o.o_totalprice > 50000.0""".stripMargin)
      tree.preorder.zipWithIndex.map { case (n, i) =>
        (i, n.nodeType, n.vector.length,
          math.round(n.vector.map(v => if (v.isNaN || v.isInfinite) 0.0 else v).sum * 1000) / 1000.0)
      }.toDF("node_idx", "node_type", "vec_len", "vec_sum").orderBy("node_idx")
    },

    // E-families 2+3: MSCN set encoding and greq compact per-node
    // vectors over a generated workload (shapes + checksums per query)
    "q64_set_encoders" -> { (s, dir) =>
      import s.implicits._
      import graft.encode.SetEncoders
      val db = model(s, dir)
      def sum(m: Array[Array[Double]]) =
        math.round(m.map(_.sum).sum * 1000) / 1000.0
      val workload = (1 to 12).map(seed => new RandomQueryGen(db, seed).randomize())
        .filter(_.valid).map(_.toSql(pretty = false))
      val rows = workload.zipWithIndex.flatMap { case (sql, i) =>
        val m = SetEncoders.encodeMscn(db, sql)
        val g = SetEncoders.encodeGreq(db, sql)
        val neo = SetEncoders.encodeNeo(db, sql)
        val flat = SetEncoders.flatMatrix(db, sql)
        val (parents, _) = SetEncoders.treeWithParents(db, sql)
        def csum(vs: Seq[Double]) =
          math.round(vs.filterNot(v => v.isNaN || v.isInfinite).sum * 1000) / 1000.0
        Seq(
          (i, "mscn", m.tables.length + m.joins.length + m.predicates.length,
            m.tablesMask.sum + m.joinsMask.sum + m.predicatesMask.sum,
            sum(m.tables) + sum(m.joins) + sum(m.predicates)),
          (i, "greq", g.size, g.map(_._2.length).sum.toDouble,
            csum(g.flatMap(_._2))),
          (i, "neo", 1, neo.length.toDouble, csum(neo.toSeq)),
          (i, "relcnn_flat", flat.length, (flat.length * flat.head.length).toDouble,
            csum(flat.flatten.toSeq)),
          (i, "treelstm", parents.length, parents.count(_ >= 0).toDouble,
            parents.sum.toDouble))
      }
      rows.toDF("query_idx", "family", "n_vectors", "mask_or_len", "checksum")
        .orderBy("query_idx", "family")
    },

    // estimator: train on a generated workload with a deterministic
    // synthetic cost label; report bucket metrics
    "q63_estimate" -> { (s, dir) =>
      import s.implicits._
      val db = model(s, dir)
      val workload = (1 to 60).flatMap { seed =>
        val q = new RandomQueryGen(db, seed).randomize()
        if (!q.valid) None
        else {
          val sql = q.toSql(pretty = false)
          val cost = math.pow(2.0, q.relations.size + q.projections.size * 0.2 -
            q.conditions.size * 0.3)
          scala.util.Try { Estimator.featurize(db, sql); (sql, cost) }.toOption
        }
      }
      val trained = Estimator.train(s, db, workload, maxIter = 10)
      val preds = workload.map { case (sql, rt) =>
        (trained.predictLog2(Estimator.featurize(db, sql)),
          math.log(rt) / math.log(2))
      }
      val (acc, mae, f1) = Estimator.evaluate(preds)
      // reference-parity extended metrics (metrics.py:9-79, evaluate.py:64-97)
      import graft.estimate.Metrics
      val rounded = preds.map { case (p, l) => (math.rint(p).toInt, math.rint(l).toInt) }
      val kappa = Metrics.cohenKappa(rounded)
      val buckets = Metrics.bucketMetrics(preds)
      val (_, bestBoundary, bestAcc, _) = Metrics.maximizeBinarySplit(
        preds.map { case (p, l) => (math.pow(2, p), math.pow(2, l)) })
      Seq((workload.size, acc > 0.3, mae < 2.0, f1 >= 0.0, kappa > 0.0,
        buckets.values.nonEmpty, bestBoundary >= 1, bestAcc >= 0.0))
        .toDF("n_queries", "acc_ok", "mae_ok", "f1_ok", "kappa_ok",
          "buckets_ok", "split_boundary_ok", "split_acc_ok")
    }
  )
}
