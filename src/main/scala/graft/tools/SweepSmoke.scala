package graft.tools

import java.nio.file.{Files, Paths}

import graft.estimate.{Estimator, Mscn, NeoNet, ModelIo, Report}
import graft.gen.BalancedCheckpoint
import graft.model.ModelJson

/** Integration smoke for the sweep's newest paths (SetConv sets from
  * campaign SQL, NeoNet features, checkpoint save/load, report
  * rendering) on a small slice with tiny epochs — a crash here is a
  * crash the full GruSweep would hit 20 minutes in. Writes only under
  * /tmp.
  */
object SweepSmoke {
  def main(args: Array[String]): Unit = {
    val cpPath = args.lift(0).getOrElse("/root/repo/data/band/campaign_x160_c2.cp")
    val statsPath = args.lift(1).getOrElse("/root/repo/data/band/x160/stats.json")
    val cp = BalancedCheckpoint.deserialize(Files.readString(Paths.get(cpPath)))
    val db = ModelJson.fromJson(Files.readString(Paths.get(statsPath)))
    val slice = cp.results.filter(_._2 > 0).take(120)
    println(s"[smoke] ${slice.size} measured runtimes")

    val encs = slice.map { case (sql, _) =>
      graft.encode.SetEncoders.encodeMscn(db, sql) }
    val (tf, pf, jf) = (encs.head.tables.head.length,
      encs.head.predicates.head.length,
      math.max(1, encs.head.joins.headOption.map(_.length).getOrElse(1)))
    println(s"[smoke] mscn dims: t=$tf p=$pf j=$jf")
    val mData = encs.zip(slice).map { case (e, (_, rt)) => (Mscn.sets(e), rt) }
    val mscn = Mscn.fit(mData, Mscn.Config(tf, pf, jf, hidden = 8, epochs = 2, seed = 1L))
    ModelIo.saveMscn("/tmp/smoke_mscn.json", mscn)
    val mscn2 = ModelIo.loadMscn("/tmp/smoke_mscn.json")
    require(mData.forall { case (s, _) => mscn2.predictSeconds(s) == mscn.predictSeconds(s) })
    println(s"[smoke] mscn fit+roundtrip ok, loss ${mscn.losses.head} -> ${mscn.losses.last}")

    val nData = slice.map { case (sql, rt) =>
      (Estimator.featurizeWith(db, sql, "neo"), math.log(rt) / math.log(2)) }
    val neo = NeoNet.fit(nData, NeoNet.Config(inputDim = nData.head._1.length,
      epochs = 2, seed = 1L))
    ModelIo.saveNeo("/tmp/smoke_neo.json", neo)
    println(s"[smoke] neo fit+save ok, dim ${nData.head._1.length}")

    Report.write("/tmp/smoke_report.md", "smoke",
      slice.map { case (sql, rt) => Report.ResultRow(sql.take(40), rt, rt * 1.1) })
    println(s"[smoke] report ok (${Files.size(Paths.get("/tmp/smoke_report.md"))} bytes)")
    println("[smoke] ALL OK")
  }
}
