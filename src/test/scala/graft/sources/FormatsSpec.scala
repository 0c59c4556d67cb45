package graft.sources

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Source-format breadth: the engine's operators are format-agnostic
  * DataFrame programs — prove the same relational content round-trips
  * through CSV and JSON (schema'd reads, no inference in production
  * paths) and that a query over the re-read data matches the parquet
  * original. At 100 TB the lake is parquet, but ingest edges are
  * CSV/JSON feeds — the read path must be interchangeable. */
class FormatsSpec extends SparkSpec {

  private lazy val base = Tables.customer(spark, sf())
    .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")

  test("csv round-trip: schema'd read matches the parquet relation") {
    val dir = new java.io.File("target/tmp/fmt_csv").getAbsolutePath
    base.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(base.schema)
      .option("header", "true").csv(dir)
    assert(back.count() == base.count())
    assert(back.exceptAll(base).isEmpty && base.exceptAll(back).isEmpty)
  }

  test("json round-trip: schema'd read matches the parquet relation") {
    val dir = new java.io.File("target/tmp/fmt_json").getAbsolutePath
    base.write.mode("overwrite").json(dir)
    val back = spark.read.schema(base.schema).json(dir)
    assert(back.exceptAll(base).isEmpty && base.exceptAll(back).isEmpty)
  }

  test("a query over re-read CSV equals the same query over parquet") {
    val dir = new java.io.File("target/tmp/fmt_csv_q").getAbsolutePath
    base.write.mode("overwrite").option("header", "true").csv(dir)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("c_acctbal") * 100 + lit(0.5)).cast("long")).as("bal_cents"))
    val fromCsv = agg(spark.read.schema(base.schema)
      .option("header", "true").csv(dir))
    val fromPq = agg(base)
    assert(fromCsv.exceptAll(fromPq).isEmpty && fromPq.exceptAll(fromCsv).isEmpty)
  }
}
