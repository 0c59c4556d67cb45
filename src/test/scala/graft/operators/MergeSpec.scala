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

  test("applyChanges: delete / update / insert / kept in one pass") {
    val target = Seq(
      (1L, Some("a"), 10L),
      (2L, Some("b"), 20L),
      (3L, Some("c"), 30L)
    ).toDF("doc_id", "source", "n_chars")
    val changes = Seq(
      (1L, None: Option[String], 0L, "D"),   // delete (payload ignored)
      (2L, Some("b2"), 22L, "U"),            // replace entirely
      (7L, Some("g"), 70L, "I"),             // fresh insert
      (8L, Some("h"), 80L, "D")              // delete of an absent key: no-op
    ).toDF("doc_id", "source", "n_chars", "op")
    val got = Merge.applyChanges(target, changes, "doc_id", Seq("source", "n_chars"))
      .orderBy("doc_id").collect().map(row)
    assert(got.toSeq == Seq(
      (2L, Some("b2"), "updated"),
      (3L, Some("c"), "kept"),
      (7L, Some("g"), "inserted")))
  }

  test("applyChanges: U nulling a field wins entirely (no coalesce resurrection)") {
    val target = Seq((5L, Some("x"), 50L)).toDF("doc_id", "source", "n_chars")
    val changes = Seq((5L, None: Option[String], 51L, "U"))
      .toDF("doc_id", "source", "n_chars", "op")
    val got = Merge.applyChanges(target, changes, "doc_id", Seq("source", "n_chars"))
      .collect().map(row)
    assert(got.toSeq == Seq((5L, None, "updated")))
  }

  test("scd2: versions open only on real change; redeliveries collapse; null-safe") {
    val log = Seq(
      (1L, 10L, Some("a")),
      (1L, 20L, Some("a")),  // unchanged redelivery → no new version
      (1L, 30L, Some("b")),  // change → version 2
      (1L, 40L, None: Option[String]), // value → null IS a change
      (1L, 50L, None: Option[String]), // null → null is NOT a change
      (2L, 15L, Some("x"))   // single-observation key → one open version
    ).toDF("k", "ts", "attr")
    val got = Merge.scd2(log, "k", "ts", Seq("attr"))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString),
        r.getLong(2), Option(r.get(3)), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, Some("a"), 10L, Some(30L), false),
      (1L, Some("b"), 30L, Some(40L), false),
      (1L, None, 40L, None, true),
      (2L, Some("x"), 15L, None, true)))
  }

  test("scd2 intervals tile each key: half-open, no gaps, one current") {
    val log = (0L until 40L).map(i => (i % 4, i, s"s${(i / 7) % 3}"))
      .toDF("k", "ts", "attr")
    val dim = Merge.scd2(log, "k", "ts", Seq("attr")).collect()
    val byKey = dim.groupBy(_.getLong(0))
    byKey.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      // every valid_to equals the next valid_from; exactly one open row
      sorted.sliding(2).filter(_.size == 2).foreach { case Array(a, b) =>
        assert(a.getLong(3) == b.getLong(2))
      }
      assert(sorted.count(_.getBoolean(4)) == 1)
      assert(sorted.last.isNullAt(3))
    }
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
