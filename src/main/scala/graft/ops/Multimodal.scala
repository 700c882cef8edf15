package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs per-partition in batches.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. Everything around it — schema, batching, partition-
  * level iteration, feature-column shape — is the real Spark plumbing a
  * production decoder would drop into (swap `decodeStub` for a JNI/
  * library call; the `mapPartitions` boundary amortizes model/codec init
  * per partition, the Spark equivalent of `mapInPandas` batch semantics).
  */
object Multimodal {

  /** A binary asset row: payload + minimal typed metadata. */
  case class Asset(asset_id: Long, modality: String, n_bytes: Long, payload: Array[Byte])

  /** Extracted features: fixed-width vector + passthrough metadata. */
  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Long,
                           feature: Array[Double])

  val FeatureDim = 8

  /** Wrap a text corpus as binary assets (the test stand-in for real
    * image/audio payloads): payload = UTF-8 bytes, modality tagged.
    */
  def toAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit("text").as("modality"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake in place of a real codec.
    * A real implementation would decode the payload (e.g. JPEG → pixels)
    * and run a feature extractor; init-once-per-partition happens in
    * [[extractFeatures]]'s mapPartitions.
    */
  private[ops] def decodeStub(payload: Array[Byte]): Array[Double] = {
    // integer accumulation first, single division at the end: the result
    // is independent of accumulation order (exact int sums), so the
    // correctness oracle can reproduce it with a SQL GROUP BY
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < payload.length) {
      acc(i % FeatureDim) += (payload(i) & 0xffL)
      i += 1
    }
    acc.map(_.toDouble / 255.0)
  }

  /** Batch feature extraction over the binary column. Partition-level
    * iteration keeps per-partition init (real codecs, model weights)
    * amortized, and the output stays a distributed Dataset.
    */
  def extractFeatures(assets: DataFrame)(implicit spark: SparkSession): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      // real impl: initialize codec/model here, once per partition
      it.map(a => AssetFeatures(a.asset_id, a.modality, a.n_bytes, decodeStub(a.payload)))
    }
  }

  /** One fixed-size frame of a larger asset. */
  case class AssetFrame(asset_id: Long, modality: String, frame_idx: Int,
                        n_bytes: Long, payload: Array[Byte])

  /** Evenly-spaced frame sampling: cut the payload into `frameBytes`
    * chunks ("frames" — for video, a real impl seeks keyframes in the
    * codec; the chunk arithmetic and fan-out plumbing are identical) and
    * keep `n` evenly spaced ones. One row in, ≤ n rows out — the
    * explode-shaped fan-out stays partition-local, so a 100 TB corpus
    * sampling 8 frames per asset never shuffles payload bytes.
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int, n: Int)
                  (implicit spark: SparkSession): Dataset[AssetFrame] = {
    import spark.implicits._
    require(frameBytes > 0 && n > 0)
    assets.as[Asset].flatMap { a =>
      val frames = math.max(1, (a.payload.length + frameBytes - 1) / frameBytes)
      val take = math.min(n, frames)
      (0 until take).map { k =>
        // evenly spaced frame indices over [0, frames)
        val idx = if (take == 1) 0 else (k.toLong * (frames - 1) / (take - 1)).toInt
        val from = idx * frameBytes
        val until = math.min(from + frameBytes, a.payload.length)
        AssetFrame(a.asset_id, a.modality, idx, (until - from).toLong,
          java.util.Arrays.copyOfRange(a.payload, from, until))
      }
    }
  }

  /** STUB resize: byte-stride downsampling to ≤ `targetBytes` (a real
    * image resize interpolates pixels after decode; the payload-in/
    * payload-out shape, metadata update, and per-partition batching are
    * the production plumbing). Deterministic, so tests can assert sizes
    * and content.
    */
  def resize(assets: DataFrame, targetBytes: Int)
            (implicit spark: SparkSession): Dataset[Asset] = {
    import spark.implicits._
    require(targetBytes > 0)
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        if (a.payload.length <= targetBytes) a
        else {
          val stride = (a.payload.length + targetBytes - 1) / targetBytes
          val out = Array.range(0, a.payload.length, stride).map(a.payload)
          a.copy(n_bytes = out.length.toLong, payload = out)
        }
      }
    }
  }
}
