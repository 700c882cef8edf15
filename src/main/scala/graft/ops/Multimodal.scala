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
}
