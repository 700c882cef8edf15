package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{PortableHash, Similarity}

/** Scratch micro-harness for the q42 near-dup join strategy. */
object Q42Probe {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }

  def variant(df: DataFrame, strategy: String, salt: Int): DataFrame = {
    val planes = 3
    val bucketed = Similarity.withNorm2(df, "embedding")
      .withColumn("bucket", Similarity.srpBucket(col("embedding"), planes))
    val a0 = bucketed.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("vec_a"), col("norm2").as("norm2_a"))
    val b0 = bucketed.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("vec_b"), col("norm2").as("norm2_b"))
    val (a, b, keys) =
      if (salt > 0)
        (a0.withColumn("salt", PortableHash.hash60(concat(lit("salt:"), col("id_a").cast("string"))) % salt),
         b0.withColumn("salt", explode(sequence(lit(0L), lit(salt - 1L)))),
         Seq("bucket", "salt"))
      else (a0, b0, Seq("bucket"))
    val joined = strategy match {
      case "broadcast" => a.join(broadcast(b), keys)
      case s           => a.join(b.hint(s), keys)
    }
    joined
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("vec_a"), col("vec_b"), col("norm2_a"), col("norm2_b")))
      .where(col("cos") >= 0.18)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Tables.load(spark, dir, "embeddings")
    // warm the JIT + scan cache
    time("warmup count")(df.count())
    time("bucket only") {
      Similarity.withNorm2(df, "embedding")
        .withColumn("bucket", Similarity.srpBucket(col("embedding"), 3)).count()
    }
    time("pairs no-cos") {
      val planes = 3
      val bucketed = Similarity.withNorm2(df, "embedding")
        .withColumn("bucket", Similarity.srpBucket(col("embedding"), planes))
      val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"))
      val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"))
      a.join(b.hint("shuffle_merge"), Seq("bucket")).where(col("id_a") < col("id_b")).count()
    }
    for (s <- Seq("shuffle_merge", "shuffle_hash", "broadcast"); salt <- Seq(0, 32))
      time(s"$s salt=$salt")(variant(df, s, salt).count())
    time("current nearDupPairs") {
      Similarity.nearDupPairs(df, "vec_id", "embedding", 0.18, 3).count()
    }
    spark.stop()
  }
}
