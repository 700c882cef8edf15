package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing used by the dedup / similarity /
  * fingerprinting operators.
  *
  * `hash60` is the first 15 hex chars (60 bits, always positive in a
  * BIGINT) of md5 — chosen because the exact same value is computable in
  * other SQL engines (DuckDB: `('0x' || substr(md5(s),1,15))::BIGINT`),
  * which is what the correctness oracle does. Spark's own `xxhash64` would
  * be faster but is not reproducible outside Spark.
  *
  * All ops are pure `Column` expressions: they stay inside whole-stage
  * codegen and never leave the executors.
  */
object PortableHash {

  /** 60-bit md5-derived hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side evaluation of [[hash60]] for a constant string — bit
    * identical to the Column form (md5 of the UTF-8 bytes, first 15 hex
    * chars as a base-16 long). Lets deterministic per-(index) constants
    * (e.g. SRP hyperplane components) be precomputed once on the driver
    * and shipped as literals instead of re-hashed per row.
    */
  def hash60Value(s: String): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = digest.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Seeded variant: independent hash families for MinHash permutations. */
  def hash60(seed: Int, c: Column): Column =
    hash60(concat(lit(s"$seed:"), c))

  /** DuckDB SQL fragment computing the same value as [[hash60]]. */
  def duckHash60(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** DuckDB SQL fragment for the seeded variant. */
  def duckHash60(seed: Int, expr: String): String =
    duckHash60(s"'$seed:' || $expr")
}
