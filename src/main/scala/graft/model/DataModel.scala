package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Schema + statistics model of a relational database — the engine's
  * counterpart of the reference's `Database`/`Table`/`Column`/stats classes
  * (reference: dqo/db/models.py:26-266). Where the reference collects
  * these via SQL probes against live Postgres (dqo/db/clients/
  * postgres.py:65-238), this engine computes them itself from parquet
  * with DataFrame aggregations ([[StatsCollector]]).
  */

/** The reference's five scalar types (dqo/db/models.py:12-17). Spark
  * mapping per SURVEY §1.2: FLOAT→Double, NUMBER→Long, STRING→String,
  * BOOL→Boolean, TIME→Timestamp (stats on epoch seconds).
  */
sealed abstract class DType(val name: String)
object DType {
  case object Float  extends DType("FLOAT")
  case object Number extends DType("NUMBER")
  case object Str    extends DType("STRING")
  case object Bool   extends DType("BOOL")
  case object Time   extends DType("TIME")
  val all: Seq[DType] = Seq(Float, Number, Str, Bool, Time)
  def parse(s: String): DType = all.find(_.name == s)
    .getOrElse(throw new IllegalArgumentException(s"unknown DType $s"))

  /** Spark type → model type (SURVEY §1.2); None for types outside the
    * reference's five-type system (arrays, maps, binary — those columns
    * are carried by the ops layer, not the stats model).
    */
  def fromSpark(dt: org.apache.spark.sql.types.DataType): Option[DType] = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType | FloatType | _: DecimalType => Some(Float)
      case ByteType | ShortType | IntegerType | LongType => Some(Number)
      case StringType => Some(Str)
      case BooleanType => Some(Bool)
      case TimestampType | TimestampNTZType | DateType => Some(Time)
      case _ => None
    }
  }
}

/** min/mean/max + central moments + 10-bucket equi-width histogram
  * (bucket upper bounds in `hist`, counts in `freq`; trailing null-bucket
  * convention as in postgres.py:460-473). Reference: dqo/db/models.py:26-37.
  */
final case class NumericStats(
    min: Double, mean: Double, max: Double,
    variance: Double, skewness: Double, kurtosis: Double,
    hist: Seq[Double] = Nil, freq: Seq[Long] = Nil)

/** Char-length and word-count distributions of a string column
  * (dqo/db/models.py:40-43; probes postgres.py:141-172).
  */
final case class StringStats(length: NumericStats, word: NumericStats)

/** Per-column stats (dqo/db/models.py:46-64). `index` has no Spark
  * analog; it is kept for encoder parity and set from key-naming
  * convention (FIXTURES.md §6).
  */
final case class ColumnStats(
    total: Long, nulls: Long, distinct: Long, index: Boolean,
    numeric: Option[NumericStats] = None, string: Option[StringStats] = None) {
  def nullsFraction: Double = if (total == 0) 0.0 else nulls.toDouble / total
  def distinctRatio: Double = if (total == 0) 0.0 else distinct.toDouble / total
}

final case class ColumnModel(name: String, dtype: DType,
                             stats: Option[ColumnStats] = None) {
  def fullName(table: String): String = s"$table.$name"
}

/** rows/pages/size bookkeeping (dqo/db/models.py:67-78; 8 KiB page
  * default postgres.py:409). For parquet, `sizeBytes` is the file
  * footprint and `pages` is derived.
  */
final case class TableStats(rows: Long, sizeBytes: Long, pageSize: Long = 8192L) {
  def pages: Long = math.max(1L, sizeBytes / pageSize)
}

final case class TableModel(name: String, columns: Seq[ColumnModel],
                            stats: Option[TableStats] = None) {
  lazy val columnsByName: Map[String, ColumnModel] = columns.map(c => c.name -> c).toMap
  /** Columns grouped by type — drives type-compatible join generation
    * (dqo/db/models.py:157-164). */
  lazy val typesLookup: Map[DType, Seq[ColumnModel]] = columns.groupBy(_.dtype)
}

final case class DbModel(tables: Seq[TableModel]) {
  lazy val tablesByName: Map[String, TableModel] = tables.map(t => t.name -> t).toMap
  def table(name: String): TableModel = tablesByName(name)
  def allColumns: Seq[(TableModel, ColumnModel)] =
    tables.flatMap(t => t.columns.map(t -> _))
}

/** JSON round-trip (reference serializes its model to a JSON cache,
  * dqo/db/serializeable.py:21-33, postgres.py:321-377). Jackson tree API
  * only — no reflection modules needed.
  */
object ModelJson {
  private val mapper = new ObjectMapper()

  private def numToJson(n: NumericStats, o: ObjectNode): Unit = {
    o.put("min", n.min); o.put("mean", n.mean); o.put("max", n.max)
    o.put("variance", n.variance); o.put("skewness", n.skewness); o.put("kurtosis", n.kurtosis)
    val h = o.putArray("hist"); n.hist.foreach(h.add)
    val f = o.putArray("freq"); n.freq.foreach(f.add)
  }
  private def numFromJson(j: JsonNode): NumericStats = NumericStats(
    j.get("min").asDouble, j.get("mean").asDouble, j.get("max").asDouble,
    j.get("variance").asDouble, j.get("skewness").asDouble, j.get("kurtosis").asDouble,
    iter(j.get("hist")).map(_.asDouble), iter(j.get("freq")).map(_.asLong))

  private def iter(a: JsonNode): Seq[JsonNode] = {
    val it = a.elements(); val b = Seq.newBuilder[JsonNode]
    while (it.hasNext) b += it.next()
    b.result()
  }

  def toJson(db: DbModel): String = {
    val root = mapper.createObjectNode()
    val ts = root.putArray("tables")
    db.tables.foreach { t =>
      val to = ts.addObject()
      to.put("name", t.name)
      t.stats.foreach { s =>
        val so = to.putObject("stats")
        so.put("rows", s.rows); so.put("sizeBytes", s.sizeBytes); so.put("pageSize", s.pageSize)
      }
      val cs = to.putArray("columns")
      t.columns.foreach { c =>
        val co = cs.addObject()
        co.put("name", c.name); co.put("dtype", c.dtype.name)
        c.stats.foreach { st =>
          val so = co.putObject("stats")
          so.put("total", st.total); so.put("nulls", st.nulls)
          so.put("distinct", st.distinct); so.put("index", st.index)
          st.numeric.foreach(n => numToJson(n, so.putObject("numeric")))
          st.string.foreach { s =>
            val ss = so.putObject("string")
            numToJson(s.length, ss.putObject("length"))
            numToJson(s.word, ss.putObject("word"))
          }
        }
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): DbModel = {
    val root = mapper.readTree(json)
    DbModel(iter(root.get("tables")).map { to =>
      val stats = Option(to.get("stats")).map(s =>
        TableStats(s.get("rows").asLong, s.get("sizeBytes").asLong, s.get("pageSize").asLong))
      val cols = iter(to.get("columns")).map { co =>
        val cstats = Option(co.get("stats")).map { so =>
          ColumnStats(
            so.get("total").asLong, so.get("nulls").asLong,
            so.get("distinct").asLong, so.get("index").asBoolean,
            Option(so.get("numeric")).map(numFromJson),
            Option(so.get("string")).map(s =>
              StringStats(numFromJson(s.get("length")), numFromJson(s.get("word")))))
        }
        ColumnModel(co.get("name").asText, DType.parse(co.get("dtype").asText), cstats)
      }
      TableModel(to.get("name").asText, cols, stats)
    })
  }
}
