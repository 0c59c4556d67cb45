package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators — the third leg of the 100 TB design next to
  * partitioning-in-the-plan and Z-order locality: how the CURATED corpus is
  * laid down so the next thousand jobs don't pay for this one's shuffles.
  *
  *  - `writeBucketed`: hash-bucket (and sort) a table by its join key.
  *    Two tables bucketed the same way equi-join with ZERO exchange on
  *    either side — at 100 TB that deletes the single largest cost of every
  *    downstream dedup-verify / enrichment join. (Spark's bucketing needs a
  *    catalog table, hence `saveAsTable`; the parquet files themselves are
  *    ordinary splittable parquet.)
  *  - `writePartitioned`: directory-partition by low-cardinality routing
  *    columns (lang, split…). Readers filtering on them prune whole
  *    directories at PLANNING time — the scan never lists, opens, or counts
  *    the excluded partitions.
  *
  * Both are thin, deliberately: the value is the LAYOUT CONTRACT, and the
  * specs assert the contract on the physical plan (no Exchange under the
  * bucketed join; PartitionFilters pruning on the partitioned read), not
  * just that files appeared. */
object BucketedStore {

  /** Write `df` as a bucketed (+ optionally sorted) catalog table. Returns
    * the table name for chaining. `buckets` should track the cluster's
    * target parallelism at the data's full scale, not the test's. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): String = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(!table.contains("."), "use a simple (default-database) table name")
    if (mode == SaveMode.Overwrite) {
      // an in-memory catalog orphans the table LOCATION when the session
      // dies: the metastore forgets the table but the directory survives,
      // and the next saveAsTable fails with LOCATION_ALREADY_EXISTS.
      // Overwrite means overwrite — drop the entry and clear the orphan.
      val spark = df.sparkSession
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val w = df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.format("parquet").saveAsTable(table)
    table
  }

  /** Write `df` directory-partitioned by `partitionCols` (low-cardinality
    * routing columns only — a high-cardinality partition column is the
    * classic small-files trap; bucket those instead). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): String = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
    path
  }

  /** True iff `df`'s executed plan contains no shuffle exchange — the
    * contract a co-bucketed join must satisfy. */
  def shuffleFree(df: DataFrame): Boolean = {
    df.collect() // force execution so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning")
  }
}
