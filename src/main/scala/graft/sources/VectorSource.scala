package graft.sources

import graft.core.grid.Bounds
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7: PostGIS table scan with the spatial predicate pushed INTO the
  * database — the reference's per-tile fetch
  * (`gfw_pixetl/tiles/vector_src_tile.py:87-156`) re-expressed as ONE
  * partitioned JDBC relation over the layer extent.
  *
  * The reference probes PostGIS once per tile (`LIMIT 1` existence + a
  * full fetch, capped at 4 connections, `pipes/vector_pipe.py:57`); at
  * 100 TB that is thousands of correlated round-trips. Spark's JDBC source
  * instead pushes one `ST_Intersects(geom, ST_MakeEnvelope(…))` envelope
  * predicate (the same SQL shape the reference renders) and parallelizes
  * the scan by ranges of the primary key. Tile assignment then happens in
  * the engine via the F4/J5 broadcast join of `VectorJob`.
  *
  * The sandbox has no database, so the query RENDERING is the tested
  * surface; `readJdbc` wires it verbatim into `spark.read.jdbc` and a
  * parquet snapshot remains the offline fallback (`Pixetl` vector branch).
  */
object VectorSource {

  /** The pushdown subquery: value calc + WKB geometry for every feature
    * whose geometry intersects the envelope — textually the reference's
    * `intersect_filter` (`vector_src_tile.py:31-42`) over the layer extent
    * instead of one tile. `ST_AsBinary` because the engine's geometry
    * columns are WKB. */
  def renderQuery(schema: String, table: String, field: String,
                  calc: Option[String], bounds: Bounds,
                  order: Option[String] = None,
                  fidColumn: String = "gfw_fid"): String = {
    val env = s"ST_MakeEnvelope(${bounds.left}, ${bounds.bottom}, " +
      s"${bounds.right}, ${bounds.top}, 4326)"
    val value = calc.getOrElse(field)
    val ord = order match {
      case Some("desc") => s" ORDER BY $value DESC"
      case Some("asc")  => s" ORDER BY $value ASC"
      case _            => ""
    }
    s"SELECT $value AS $field, ST_AsBinary(geom) AS geom, $fidColumn " +
      s"FROM $schema.$table WHERE ST_Intersects(geom, $env)$ord"
  }

  /** The reference's LIMIT-1 existence probe (`vector_src_tile.py:87-113`)
    * — kept for API parity; the engine itself prunes empty tiles with the
    * F4 join rather than per-tile probes. */
  def renderExistsQuery(schema: String, table: String, bounds: Bounds,
                        fidColumn: String = "gfw_fid"): String = {
    val env = s"ST_MakeEnvelope(${bounds.left}, ${bounds.bottom}, " +
      s"${bounds.right}, ${bounds.top}, 4326)"
    s"SELECT $fidColumn FROM $schema.$table WHERE ST_Intersects(geom, $env) LIMIT 1"
  }

  /** One partitioned JDBC scan of the rendered query. `fidRange` splits the
    * scan into `numPartitions` key ranges so executors read in parallel
    * (each partition re-evaluates the pushed spatial predicate in the DB,
    * which indexes it via GiST). */
  def readJdbc(spark: SparkSession, url: String, schema: String, table: String,
               field: String, calc: Option[String], bounds: Bounds,
               order: Option[String] = None, fidColumn: String = "gfw_fid",
               fidRange: Option[(Long, Long)] = None, numPartitions: Int = 8,
               properties: java.util.Properties = new java.util.Properties()): DataFrame = {
    val sub = s"(${renderQuery(schema, table, field, calc, bounds, order, fidColumn)}) AS src"
    readPartitioned(spark, url, sub, fidColumn, fidRange, numPartitions, properties)
  }

  /** The reader wiring under [[readJdbc]], independent of the PostGIS SQL
    * dialect: a pushed-down subquery scanned as `numPartitions` key ranges
    * of `partColumn`. The `s7_jdbc_pushdown` ledger row drives this exact
    * path against an embedded Derby database (the only JDBC engine in the
    * sandbox), with the envelope-intersection predicate rendered in
    * portable SQL-92 — so the partitioned-scan machinery is hash-checked
    * end to end even though PostGIS itself is out of reach. */
  def readPartitioned(spark: SparkSession, url: String, subquery: String,
                      partColumn: String, range: Option[(Long, Long)],
                      numPartitions: Int = 8,
                      properties: java.util.Properties = new java.util.Properties()): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", subquery)
    val reader = range match {
      case Some((lo, hi)) => base
        .option("partitionColumn", partColumn)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", numPartitions)
      case None => base
    }
    properties.stringPropertyNames().forEach(k => reader.option(k, properties.getProperty(k)))
    reader.load()
  }
}
