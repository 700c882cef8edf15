package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Catalog, OpsCatalog, PipelineCatalog, StatsCatalog}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` carries the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * 5-way join chain + grouped revenue aggregate (SURVEY §2.3/§2.4).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_join_chain")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.sparkSql.map { case (name, sql) =>
      name -> { (spark: SparkSession, sfDir: String) =>
        Tables.registerAll(spark, sfDir)
        spark.sql(sql)
      }
    } ++ OpsCatalog.queries ++ StatsCatalog.queries ++ PipelineCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Catalog.oracleSql ++ OpsCatalog.oracleSql ++ StatsCatalog.oracleSql
}
