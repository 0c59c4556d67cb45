package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential conversion funnel over an event log — the product-analytics
  * counterpart of the reference's status algebra (pipe.py tallies what
  * happened to each tile; a funnel tallies how far each entity progressed
  * through an ordered series of events).
  *
  * Semantics: stage 1 anchors at the entity's EARLIEST `stages.head`
  * event; stage i+1 matches the earliest `stages(i)` event strictly after
  * the stage-i match and within `withinSeconds` of it (first-touch
  * attribution with a per-step conversion window). Deterministic: min
  * timestamps only, no session heuristics, no RNG.
  *
  * Scale shape: each stage is filter → groupBy(entity) → equi-join on the
  * entity key. Every shuffle is keyed on the id column, so AQE co-locates
  * the per-stage join with the aggregate that produced its anchor; the
  * running relation shrinks monotonically (stage i+1's rows ⊆ stage i's
  * entities) and is entity-cardinality, never event-cardinality. No global
  * sort, no window over the event log — the classic windowed-funnel trap
  * (sort all events per user, scan with a session state machine) is
  * avoided entirely, so parallelism is bounded by entity count, not by
  * per-entity event volume.
  */
object Funnel {

  /** One row per entity that reached stage 1, with nullable reach
    * timestamps `t1..tn` (n = stages.length). */
  def stageTimes(events: DataFrame, stages: Seq[String], withinSeconds: Long,
                 idCol: String = "user_id", tsCol: String = "ts",
                 typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(withinSeconds > 0, "conversion window must be positive")
    val ev = events.select(
      col(idCol).as("id"), col(tsCol).as("ts"), col(typeCol).as("typ"))
    val s1 = ev.filter(col("typ") === stages.head)
      .groupBy("id").agg(min("ts").as("t1"))
    stages.zipWithIndex.drop(1).foldLeft(s1) { case (prev, (stage, i)) =>
      val anchor = s"t$i" // the previous stage's reach time (1-based names)
      val reached = ev.filter(col("typ") === stage)
        .join(prev.select(col("id"), col(anchor).as("__anchor")), "id")
        .filter(col("ts") > col("__anchor") &&
          col("ts") <= col("__anchor") + expr(s"INTERVAL $withinSeconds SECOND"))
        .groupBy("id").agg(min("ts").as(s"t${i + 1}"))
      prev.join(reached, Seq("id"), "left")
    }
  }

  /** Stage reach counts: (stage_idx, stage, n_entities), one row per
    * stage, monotonically non-increasing. The wide stage-times relation
    * collapses with one global aggregate, then unpivots driver-free. */
  def counts(events: DataFrame, stages: Seq[String], withinSeconds: Long,
             idCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    val wide = stageTimes(events, stages, withinSeconds, idCol, tsCol, typeCol)
    val aggs = stages.indices.map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}"))
    val one = wide.agg(aggs.head, aggs.tail: _*)
    val rows = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
        col(s"n${i + 1}").as("n_entities"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_entities"))
  }
}
