package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp(min * 60000L)

  private def ev = {
    import spark.implicits._
    Seq(
      // user 1 converts fully inside the window
      (1L, ts(0), "view"), (1L, ts(10), "click"), (1L, ts(20), "purchase"),
      // user 2 clicks too late (window 30 min)
      (2L, ts(0), "view"), (2L, ts(45), "click"), (2L, ts(50), "purchase"),
      // user 3 purchase BEFORE the click doesn't count; none after
      (3L, ts(0), "view"), (3L, ts(5), "purchase"), (3L, ts(10), "click"),
      // user 4 never views: not in the funnel at all
      (4L, ts(0), "click"), (4L, ts(5), "purchase"),
      // user 5: anchor is the EARLIEST view; a later view can't re-anchor
      (5L, ts(0), "view"), (5L, ts(100), "view"), (5L, ts(110), "click")
    ).toDF("user_id", "ts", "event_type")
  }

  test("stageTimes: first-touch anchors, strict ordering, window bound") {
    val wide = Funnel.stageTimes(ev, Seq("view", "click", "purchase"),
      withinSeconds = 30 * 60)
    val rows = wide.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getTimestamp(2) == ts(10) && byId(1L).getTimestamp(3) == ts(20))
    assert(byId(2L).isNullAt(2) && byId(2L).isNullAt(3)) // click at +45 > 30 min
    assert(byId(3L).getTimestamp(2) == ts(10) && byId(3L).isNullAt(3))
    assert(byId(5L).isNullAt(2)) // click at +110 vs earliest view anchor
  }

  test("counts: monotone non-increasing and label-ordered") {
    val c = Funnel.counts(ev, Seq("view", "click", "purchase"),
      withinSeconds = 30 * 60).orderBy("stage_idx").collect()
    assert(c.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("single-stage funnel degenerates to a first-event count") {
    val c = Funnel.counts(ev, Seq("purchase"), withinSeconds = 60).collect()
    assert(c.length == 1 && c(0).getLong(2) == 4L)
  }
}
