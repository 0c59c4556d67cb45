package graft.core

import graft.functions.{CosineSim, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions so any session built with
  * `--conf spark.sql.extensions=graft.core.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) gets the SQL surface — the
  * extension wiring of SURVEY §2's custom-operator tier. The UDF-backed
  * geometry functions register per-session via `GeoFunctions.register`
  * (UDFs are session-scoped by design). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "vec_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(exprs(0), exprs(1))))
    // pure range joins ("point in interval", no equi key) rewrite to the
    // bucketized equi-join instead of a nested loop — SURVEY §2's custom
    // Rule tier; see graft.plans.RangeJoinBinning
    e.injectOptimizerRule(_ => graft.plans.RangeJoinBinning)
  }
}
