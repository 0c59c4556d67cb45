package graft.operators

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def row(r: org.apache.spark.sql.Row) =
    (r.getLong(0), Option(r.get(1)).map(_.toString), r.getString(3))

  test("upsert: insert / update / idempotent redelivery / kept, null-safe") {
    val target = Seq(
      (1L, Some("a"), 10L),
      (2L, Some("b"), 20L),
      (3L, None: Option[String], 30L), // null payload in the corpus
      (4L, Some("d"), 40L)
    ).toDF("doc_id", "source", "n_chars")
    val batch = Seq(
      (2L, Some("b2"), 20L),           // changed source → updated
      (3L, None: Option[String], 30L), // identical (incl. null) → unchanged
      (4L, None: Option[String], 40L), // value → null is a CHANGE
      (9L, Some("z"), 90L)             // new key → inserted
    ).toDF("doc_id", "source", "n_chars")
    val got = Merge.upsert(target, batch, "doc_id", Seq("source", "n_chars"))
      .orderBy("doc_id").collect().map(row)
    assert(got.toSeq == Seq(
      (1L, Some("a"), "kept"),
      (2L, Some("b2"), "updated"),
      (3L, None, "unchanged"),
      (4L, None, "updated"),
      (9L, Some("z"), "inserted")))
  }

  test("diff is delta-sized: identical rows drop out") {
    val old = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "n_chars")
    val nw = Seq((1L, 10L), (2L, 25L), (4L, 40L)).toDF("doc_id", "n_chars")
    val got = Merge.diff(old, nw, "doc_id", Seq("n_chars"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getString(3)))
    assert(got.toSeq == Seq(
      (2L, Some(20L), Some(25L), "changed"),
      (3L, Some(30L), None, "removed"),
      (4L, None, Some(40L), "added")))
  }
}
