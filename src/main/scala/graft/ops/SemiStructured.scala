package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema-on-read over semi-structured string columns (the
  * `events.props` shape: a JSON payload riding next to typed columns).
  *
  * The 100 TB rule is ONE parse per row: `from_json` with an explicit
  * schema materializes every wanted field in a single pass, where a
  * `get_json_object` per field re-parses the payload N times (and a
  * Python UDF would leave codegen entirely). Schema inference over the
  * corpus (`spark.read.json(ds)`) is a separate full scan — fine for
  * one-off exploration, never in the serving path; callers pass the
  * schema they expect and unparseable or mis-typed rows land in an
  * explicit quarantine flag instead of vanishing (the same
  * contract as `sources/JsonlStore`'s corrupt-line gate).
  */
object SemiStructured {

  /** Parse `jsonCol` with `schemaDdl` (e.g. `"k INT, tag STRING"`).
    * Adds one struct column `parsed` plus `json_ok` — false when the
    * payload is not valid JSON for the schema (null payloads are not
    * "ok": a missing event payload is a data-quality signal, not a
    * parsed row). Field access is then plain `parsed.k` column pruning.
    */
  def parseJsonColumn(df: DataFrame, jsonCol: String, schemaDdl: String): DataFrame = {
    val clash = df.columns.intersect(Seq("parsed", "json_ok", "__p"))
    require(clash.isEmpty, s"input columns collide with parseJsonColumn internals: ${clash.mkString(", ")}")
    val schema = StructType.fromDDL(schemaDdl)
    require(schema.nonEmpty, "empty schema")
    require(!schema.fieldNames.contains("_corrupt"), "_corrupt is reserved")
    // PERMISSIVE from_json turns a corrupt payload into an ALL-NULL
    // struct — indistinguishable from a valid payload that just misses
    // every schema field. The corrupt-record side channel disambiguates:
    // the parser fills `_corrupt` with the raw payload exactly when the
    // parse failed.
    val withCr = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    val parsed = from_json(col(jsonCol), withCr,
      Map("columnNameOfCorruptRecord" -> "_corrupt"))
    // three shapes fail: null payload, corrupt payload (_corrupt side
    // channel filled), and payloads from_json maps to a NULL struct
    // with NO corrupt record — the empty string, whitespace, and the
    // JSON literal `null` (verified in SemiStructuredSpec)
    df.withColumn("__p", parsed)
      .withColumn("json_ok",
        col(jsonCol).isNotNull && col("__p").isNotNull &&
          col("__p._corrupt").isNull)
      .withColumn("parsed", struct(schema.fieldNames.map(f => col(s"__p.$f")): _*))
      .drop("__p")
  }
}
