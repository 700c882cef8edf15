package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Frame-sampling and resize plumbing over binary assets: row fan-out,
  * metadata consistency, deterministic content.
  */
class MultimodalSpec extends AnyFunSuite {
  private implicit lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def assets = {
    import spark.implicits._
    Seq(
      Multimodal.Asset(1L, "video", 100L, Array.tabulate(100)(_.toByte)),
      Multimodal.Asset(2L, "video", 7L, Array.tabulate(7)(_.toByte)),
      Multimodal.Asset(3L, "image", 0L, Array.empty[Byte])).toDF()
  }

  test("sampleFrames emits <= n evenly spaced fixed-size frames per asset") {
    val frames = Multimodal.sampleFrames(assets, frameBytes = 10, n = 4).collect()
    val byId = frames.groupBy(_.asset_id)
    // asset 1: 10 frames of 10 bytes -> 4 samples at idx 0,3,6,9
    assert(byId(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9))
    assert(byId(1L).forall(_.n_bytes == 10L))
    assert(byId(1L).find(_.frame_idx == 3).get.payload.head == 30.toByte)
    // asset 2: one partial frame
    assert(byId(2L).map(_.frame_idx).toSeq == Seq(0) && byId(2L).head.n_bytes == 7L)
    // asset 3: empty payload still yields its single (empty) frame
    assert(byId(3L).head.n_bytes == 0L)
  }

  test("resize strides payloads down to at most targetBytes") {
    val out = Multimodal.resize(assets, targetBytes = 25).collect()
    val a1 = out.find(_.asset_id == 1L).get
    assert(a1.payload.length == 25 && a1.n_bytes == 25L)
    assert(a1.payload.take(3).toSeq == Seq(0.toByte, 4.toByte, 8.toByte)) // stride 4
    // already-small payloads pass through untouched
    assert(out.find(_.asset_id == 2L).get.payload.length == 7)
  }
}
