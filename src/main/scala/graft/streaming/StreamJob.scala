package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface (SURVEY §2.8): incremental ingestion of new
  * manifest entries / event batches through the SAME transforms the batch
  * engine runs. The reference has no streaming (§1.4); this is the
  * Spark-idiomatic extension the survey plans — per-tile transforms are
  * stateless per key, so they lift to streams unchanged.
  */
object StreamJob {

  /** Windowed event aggregation (streaming twin of st1): hourly counts +
    * sums per event type with a watermark bounding state. */
  def eventWindowAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Hopping windows (streaming twin of st3): 1-hour windows sliding every
    * 30 min — each event expands into exactly duration/slide = 2 window
    * states, and the watermark evicts a window once its end passes the
    * horizon, so live state is bounded at ~2·|active keys| regardless of
    * stream length. Distinct users is `approx_count_distinct`: exact
    * distinct needs all member ids retained per window (unsupported in
    * streaming aggregates, and the wrong shape at scale) — one HLL sketch
    * per window-key is the 100 TB form; the batch st3 twin is the exact
    * repair path. */
  def eventHoppingAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), approx_count_distinct("user_id").as("n_users"))

  /** Sessionization with explicit state (streaming twin of st2): gap-based
    * sessions via flatMapGroupsWithState-free session_window (Spark's
    * native session windows bound state by watermark + gap). */
  def eventSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming exact dedup (incremental twin of Dedup.exact): arriving
    * documents are digest-keyed and first-writer-wins within the watermark
    * horizon. `dropDuplicatesWithinWatermark` is the variant whose state
    * actually EVICTS at the watermark (plain dropDuplicates on a non-time
    * key grows state forever — the classic streaming-dedup footgun); state
    * holds digests, 32 bytes/doc, not documents — the right shape for
    * dedup-on-ingest at 100 TB. */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** Streaming twin of the batch curation pipeline (`c1`): arriving docs
    * are quality-scored (stateless, fuses with the source scan), exact-
    * deduped within the watermark horizon (32-byte digest state, evicted
    * at the watermark), and routed to their deterministic split — corpus
    * curation at ingest time, same operators as the batch path. */
  def streamingCuration(docs: DataFrame, watermark: String = "1 hour",
                        minQuality: Double = 0.5): DataFrame =
    graft.operators.TextOps.hashSplit(
      graft.operators.TextOps.withQuality(docs)
        .filter(col("quality") >= minQuality)
        .withColumn("digest", md5(col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("digest"))

  /** Streaming NEAR-dup probe (incremental twin of d10): arriving docs are
    * minhash-signed and band-bucketed, then stream-static joined against
    * the curated corpus's bucket relation — near-dup detection at ingest
    * time, not just exact digests.
    *
    * This is only possible because [[graft.operators.Dedup.minhashSignatures]]
    * is a NARROW per-row fold: no stateful aggregation enters the stream —
    * the whole probe is signature map → bucket explode → stream-static left
    * join, which Spark runs STATELESS (no watermark, no state store; the
    * static side is just a batch relation re-read per micro-batch). Emits
    * one row per (doc, band) collision: `corpus_id` is the colliding corpus
    * doc, or NULL when that band's bucket is novel. A doc whose every row
    * has a NULL `corpus_id` is novel; a doc may repeat a `corpus_id` across
    * bands — the SINK aggregates (a batch groupBy over the micro-batch
    * output), because re-grouping here would turn the stream into a
    * stateful aggregation with unbounded per-doc state at ingest scale.
    * At 100 TB the corpus bucket relation is the precomputed store the
    * batch d10 path also probes. */
  def streamingDedupProbe(docs: DataFrame, corpusBuckets: DataFrame,
                          k: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    import graft.operators.Dedup
    val sigs = Dedup.minhashSignatures(docs, k)
    Dedup.lshBuckets(sigs, k, rowsPerBand)
      .join(corpusBuckets.select(col("band"), col("bucket"),
        col("doc_id").as("corpus_id")), Seq("band", "bucket"), "left")
      .select(col("doc_id"), col("corpus_id"))
  }

  case class NearDupState(reps: List[(Long, Long, Seq[Long])]) // (tsMs, docId, sig)
  case class BandVerdict(doc_id: Long, band: Int, dup_of: Option[Long])

  private def simCount(a: Seq[Long], b: Seq[Long]): Int = {
    var n = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) n += 1; i += 1 }
    n
  }

  /** Streaming WITHIN-STREAM near-dup filter (st7) — the missing third of
    * the dedup-at-ingest ladder: [[streamingDedup]] kills exact repeats,
    * [[streamingDedupProbe]] checks arrivals against a STATIC curated
    * corpus, and this op checks arrivals against EACH OTHER — the
    * SemDeDup-at-ingest shape a crawl pipeline needs when near-dups
    * cluster in time (mirror bursts, retry storms).
    *
    * Dataflow: minhash signatures (narrow per-row kernel) → LSH band
    * buckets → `flatMapGroupsWithState` keyed (band, bucket). Per-bucket
    * state is the (tsMs, docId, signature) of previous arrivals still
    * inside the event-time horizon — k+2 longs per doc, NOT documents —
    * pruned against the watermark on every invocation, timed out (and
    * freed) once the watermark passes its newest member + horizon, and
    * capped at `maxReps` as the degenerate-bucket fuse (the streaming
    * analogue of d3's bucket-size guard; overflow keeps the NEWEST reps —
    * near-dups cluster in time). An arriving doc is a dup of the
    * smallest-id in-horizon rep agreeing on ≥ `minMatch` of the k minhash
    * components; it then joins the reps itself. Emits one verdict per
    * (doc, band) — the SINK takes the per-doc min over bands (a per-micro-
    * batch groupBy; regrouping here would add a second stateful stage).
    *
    * Determinism: within a micro-batch the bucket's slice replays in
    * (event-time, doc_id) order, so a replayed batch emits identical
    * verdicts, and in-order arrival reproduces the batch twin
    * [[graft.operators.Dedup.nearDupVerdicts]] exactly ON BUCKETS UNDER
    * BOTH CAPS (StreamingSpec asserts it with the fuses disarmed). The
    * degenerate-bucket fuses differ BY DESIGN: the batch twin's
    * `maxBucketSize` drops an over-cap bucket wholesale (no verdicts from
    * it), while this op's `maxReps` keeps matching arrivals against the
    * newest 256 reps — an online operator cannot know a bucket's final
    * size, and dropping verdicts only once the cap trips would un-emit
    * nothing (Append mode). Out-of-order arrival within the watermark
    * keeps every verdict inside the batch relation (`rid < id`), but a
    * doc may match a larger smallest-id than the batch twin when its
    * true earliest dup arrives after it; late-past-watermark arrivals
    * are dropped EXPLICITLY inside the operator and emit no verdict —
    * Spark's FMGWS applies the watermark to state timeout only, not to
    * late input rows (StreamingSpec pins both). `docs` needs (doc_id, text, ts). */
  def streamingNearDup(docs: DataFrame, k: Int = 4, rowsPerBand: Int = 2,
                       minMatch: Int = 3, horizonSec: Long = 3600L,
                       maxReps: Int = 256): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.operators.Dedup
    val sigs = Dedup.minhashSignatures(
      docs.withWatermark("ts", s"$horizonSec seconds"), k, keep = Seq("ts"))
    val arrivals = Dedup.lshBuckets(sigs, k, rowsPerBand,
        keep = "ts" +: (0 until k).map("mh" + _))
      .select(col("doc_id"), col("ts"), col("band"),
        concat_ws(":", (0 until rowsPerBand).map(j => col(s"bucket.v$j")): _*).as("bkey"),
        array((0 until k).map(i => col(s"mh$i")): _*).as("sig"))
      .as[(Long, java.sql.Timestamp, Int, String, Seq[Long])]
    arrivals
      .groupByKey { case (_, _, band, bkey, _) => (band, bkey) }
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, String), it: Iterator[(Long, java.sql.Timestamp, Int, String, Seq[Long])],
         state: GroupState[NearDupState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            var reps = state.getOption.map(_.reps).getOrElse(Nil)
              .filter(_._1 >= wm - horizonSec * 1000) // expired reps evict
            // EXPLICIT late-row drop: Spark applies the watermark to FMGWS
            // state timeout only, NOT to late input rows — without this
            // filter a past-watermark straggler would emit a verdict into
            // an append stream whose consumers assume watermark-complete
            // prefixes (StreamingSpec pins the drop)
            val out = it.filter(_._2.getTime >= wm).toIndexedSeq
              .sortBy { case (id, ts, _, _, _) => (ts.getTime, id) }
              .map { case (id, ts, band, _, sig) =>
                var dup = Long.MaxValue
                val horizonFloor = ts.getTime - horizonSec * 1000
                // rid < id (not just != id): under out-of-order arrival a
                // later-id doc can already sit in the reps, and a dup_of
                // pointing at a LARGER doc_id would leave the batch twin's
                // documented smallest-id-EARLIER-doc relation (ADVICE r17)
                reps.foreach { case (rts, rid, rsig) =>
                  if (rts >= horizonFloor && rid < dup && rid < id &&
                    simCount(rsig, sig) >= minMatch) dup = rid
                }
                reps = ((ts.getTime, id, sig) :: reps).take(maxReps)
                BandVerdict(id, band, if (dup == Long.MaxValue) None else Some(dup))
              }
            if (reps.nonEmpty) {
              state.update(NearDupState(reps))
              state.setTimeoutTimestamp(math.max(
                reps.iterator.map(_._1).max + horizonSec * 1000 + 1,
                state.getCurrentWatermarkMs() + 1))
            } else state.remove()
            out.iterator
          })
  }

  /** Stream-stream interval join (the streaming twin of
    * [[graft.operators.RangeJoin.intervalJoin]], x7's batch shape): left
    * events matched to right events on `keys` within `[l.ts, l.ts + gap)`.
    * This is Structured Streaming's canonical time-range join — BOTH sides
    * carry watermarks, and the range condition bounds each side's state:
    * a buffered left row can stop matching once the right watermark passes
    * its `ts + gap`, a buffered right row once the left watermark passes
    * its `ts`, so state is O(events per gap window), not O(stream). The
    * batch and stream forms return the same matches; at 100 TB/day the
    * state-bounding condition is what makes the streaming form runnable
    * at all. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                         gap: String = "1 hour",
                         watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark).as("l")
    val r = right.withWatermark("ts", watermark).as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    l.join(r, keyCond &&
      col("r.ts") >= col("l.ts") &&
      col("r.ts") < col("l.ts") + expr(s"INTERVAL $gap"))
  }

  case class DocEvent(doc_id: Long, source: String, n_tokens: Int, ts: java.sql.Timestamp)
  case class SourceState(nDocs: Long, nTokens: Long, lastTs: Long)
  case class SourceSummary(source: String, n_docs: Long, n_tokens: Long,
                           last_seen: java.sql.Timestamp)

  /** Custom-state accumulator via `flatMapGroupsWithState` — the shape the
    * built-in windows can't express: an UNBOUNDED per-key running total
    * (docs + tokens per corpus source) that emits exactly one summary row
    * when the key goes idle, then frees its state.
    *
    * State per key is three longs — nothing buffers the documents — and
    * eviction is event-time-driven (`EventTimeTimeout` at last_seen +
    * idleGap, checked against the watermark), so state size tracks ACTIVE
    * sources only, not corpus size: the bounded-state requirement for a
    * 100 TB ingest stream. Append output mode: downstream sinks see each
    * source exactly once, on close. */
  def sourceAccumulator(docs: Dataset[DocEvent], watermark: String = "1 hour",
                        idleGapMs: Long = 30 * 60 * 1000L): Dataset[SourceSummary] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", watermark)
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (source: String, it: Iterator[DocEvent], state: GroupState[SourceState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SourceSummary(source, s.nDocs, s.nTokens,
              new java.sql.Timestamp(s.lastTs)))
          } else {
            val s0 = state.getOption.getOrElse(SourceState(0L, 0L, Long.MinValue))
            val s = it.foldLeft(s0) { (acc, e) =>
              SourceState(acc.nDocs + 1, acc.nTokens + e.n_tokens,
                math.max(acc.lastTs, e.ts.getTime))
            }
            state.update(s)
            // re-arm the idle clock; must stay ahead of the watermark, so a
            // straggler key re-opened by late-but-in-watermark data simply
            // extends its window
            state.setTimeoutTimestamp(math.max(s.lastTs + idleGapMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          })
  }

  case class UserEvent(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  /** stage = stages reached so far (0 = none), anchorMs = reach time of the
    * latest stage — TWO fields per live user, the whole state. */
  case class FunnelState(stage: Int, anchorMs: Long)
  case class FunnelAdvance(user_id: Long, stage: Int, ts: java.sql.Timestamp)

  /** Streaming funnel — [[graft.operators.Funnel]]'s stream twin: a
    * per-user stage machine over `flatMapGroupsWithState` that emits one
    * row the moment a user reaches a new stage (first-touch anchors,
    * strictly increasing timestamps, per-step conversion window).
    *
    * Within each micro-batch a user's events replay in event-time order
    * (the per-group sort touches one user's batch slice, never the
    * stream), so a single-batch replay reproduces the batch operator
    * exactly; across batches the machine is monotone — an
    * out-of-watermark straggler that would have re-anchored an EARLIER
    * stage is ignored, the standard online-funnel approximation.
    *
    * Bounded state, the 100 TB property: state is two numbers per LIVE
    * user, and eviction is event-time-driven — once the watermark passes
    * anchor + window no future event can advance the user (their
    * timestamps exceed the window), so the state times out and frees.
    * Completed users drop their state immediately. */
  def streamingFunnel(events: Dataset[UserEvent], stages: Seq[String],
                      withinMs: Long, watermark: String = "1 hour"): Dataset[FunnelAdvance] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    import events.sparkSession.implicits._
    val idx = stages.zipWithIndex.toMap // stage name → 0-based position
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[UserEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // watermark passed anchor + window: no event can ever advance
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.filter(e => idx.contains(e.event_type)).toIndexedSeq
              .sortBy(e => (e.ts.getTime, idx(e.event_type)))
            var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val out = IndexedSeq.newBuilder[FunnelAdvance]
            for (e <- sorted if s.stage < stages.length) {
              val t = e.ts.getTime
              val advances =
                if (idx(e.event_type) != s.stage) false
                else if (s.stage == 0) true // stage 1: earliest head event
                else t > s.anchorMs && t <= s.anchorMs + withinMs
              if (advances) {
                s = FunnelState(s.stage + 1, t)
                out += FunnelAdvance(user, s.stage, e.ts)
              }
            }
            if (s.stage >= stages.length) state.remove() // converted: done
            else if (s.stage > 0) {
              state.update(s)
              // evict once no in-watermark event can still land in the
              // window (timeout must stay ahead of the current watermark)
              state.setTimeoutTimestamp(math.max(s.anchorMs + withinMs + 1,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          })
  }

  case class TransitionState(lastType: String, lastTsMs: Long)
  case class Transition(user_id: Long, from_type: String, to_type: String,
                        ts: java.sql.Timestamp)

  /** Streaming next-event transitions — the x17 Markov-matrix query's
    * stream twin: per-user state is ONE (lastType, lastTs) pair; each
    * arriving event emits the (previous → current) transition and becomes
    * the new state. Within a micro-batch a user's slice replays in event-
    * time order, so a single-batch replay reproduces the batch window-lead
    * derivation exactly (given unique per-user timestamps, x17's total-
    * order condition). Late events older than the stored state are
    * DROPPED, not re-ordered — the standard online approximation; the
    * batch query is the repair path.
    *
    * Bounded state, eviction by idleness: once the watermark is `idleMs`
    * past the user's last event, the state times out and frees. A user
    * returning later starts a fresh chain (one boundary transition lost
    * per eviction — the documented trade). */
  def streamingTransitions(events: Dataset[UserEvent], idleMs: Long,
                           watermark: String = "1 hour"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[UserEvent], state: GroupState[TransitionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_type))
            val out = IndexedSeq.newBuilder[Transition]
            var s = state.getOption.orNull
            for (e <- sorted) {
              val t = e.ts.getTime
              if (s == null || t >= s.lastTsMs) { // stragglers drop
                if (s != null)
                  out += Transition(user, s.lastType, e.event_type, e.ts)
                s = TransitionState(e.event_type, t)
              }
            }
            if (s != null) {
              state.update(s)
              state.setTimeoutTimestamp(math.max(s.lastTsMs + idleMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          })
  }

  case class ValueEvent(event_id: Long, user_id: Long,
                        ts: java.sql.Timestamp, value: Double)
  /** frontierSec = newest processed second; buf = (second, ⌊value⌋) pairs
    * still inside the trailing horizon — the WHOLE per-user state. */
  case class TrailingWindowState(frontierSec: Long, buf: List[(Long, Long)])
  case class TrailingAgg(event_id: Long, user_id: Long, n_1h: Long, sum_1h: Long)

  /** Streaming trailing RANGE-frame aggregate — the batch w5 window
    * (`RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW` per user) as a
    * stream: every arriving event emits its own trailing 1-hour count and
    * ⌊value⌋-sum, the archetypal "activity in the last hour" query.
    *
    * Per-user state is just the events still inside the horizon (second +
    * one long each), bounded by the user's event rate × horizon — never
    * the stream. Eviction is event-time-driven: once the watermark passes
    * frontier + horizon no future frame can reach the buffer, the state
    * times out and frees.
    *
    * RANGE frames include PEERS (rows sharing the order-key value), so
    * equal-second groups process atomically: buffer first absorbs the
    * whole group, then every member emits the same frame — exactly the
    * batch window semantics. Within a micro-batch the user's slice
    * replays in event-time order; across batches a straggler older than
    * the frontier drops (emitted frames are immutable), the standard
    * online approximation with batch w5 as the repair path. */
  def streamingTrailingAgg(events: Dataset[ValueEvent], horizonSec: Long = 3600L,
                           watermark: String = "1 hour"): Dataset[TrailingAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[ValueEvent], state: GroupState[TrailingWindowState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val s0 = state.getOption.getOrElse(TrailingWindowState(Long.MinValue, Nil))
            val sorted = it.map(e => (e.ts.getTime / 1000, e)).toIndexedSeq
              .filter(_._1 >= s0.frontierSec) // stragglers drop
              .sortBy { case (sec, e) => (sec, e.event_id) }
            var buf = s0.buf
            var frontier = s0.frontierSec
            val out = IndexedSeq.newBuilder[TrailingAgg]
            var i = 0
            while (i < sorted.length) {
              val sec = sorted(i)._1
              var j = i
              while (j < sorted.length && sorted(j)._1 == sec) j += 1
              val peers = sorted.slice(i, j)
              buf = peers.map { case (s, e) =>
                (s, math.floor(e.value).toLong) }.toList ::: buf
              buf = buf.filter(_._1 >= sec - horizonSec)
              val n = buf.size.toLong
              val sum = buf.iterator.map(_._2).sum
              peers.foreach { case (_, e) =>
                out += TrailingAgg(e.event_id, user, n, sum) }
              frontier = sec
              i = j
            }
            if (buf.nonEmpty) {
              state.update(TrailingWindowState(frontier, buf))
              state.setTimeoutTimestamp(math.max((frontier + horizonSec) * 1000 + 1,
                state.getCurrentWatermarkMs() + 1))
            } else state.remove()
            out.result().iterator
          })
  }

  case class FullEvent(event_id: Long, user_id: Long, event_type: String,
                       ts: java.sql.Timestamp)
  case class LatestRow(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                       event_type: String)

  /** Latest-wins per-key materialized view (`mapGroupsWithState`, Update
    * mode) — the streaming CDC-apply shape: each key's state is exactly
    * ONE row (the (ts, event_id)-max observation so far), every
    * micro-batch re-emits the state row for EVERY key seen in the batch
    * (even when the incoming events lose the tiebreak — idempotent under
    * an upsert sink; emit-only-on-change would need a changed flag), and
    * the sink upserts. State is O(active keys) with no watermark needed — the
    * key space, not eviction, bounds it (a production deployment adds
    * an idle-key timeout exactly like [[sourceAccumulator]]). The
    * (ts, event_id) tiebreak makes the fold order-independent: any
    * arrival order, any batch slicing, same final view — which is why
    * the batch argmax twin (`st6_latest_event`) is hash-comparable. */
  def streamingLatest(events: Dataset[FullEvent]): Dataset[LatestRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[FullEvent], state: GroupState[LatestRow]) => {
          val incoming = it.maxBy(e => (e.ts.getTime, e.event_id))
          val best = state.getOption match {
            case Some(cur) if cur.ts.getTime > incoming.ts.getTime ||
              (cur.ts.getTime == incoming.ts.getTime &&
                cur.event_id >= incoming.event_id) => cur
            case _ =>
              LatestRow(uid, incoming.ts, incoming.event_id, incoming.event_type)
          }
          state.update(best)
          best
        })
  }

  case class DebouncedEvent(user_id: Long, event_id: Long, event_type: String,
                            ts: java.sql.Timestamp)

  /** Streaming debounce (x41's stream twin) — drop events repeating
    * their user's immediately previous type, ONLINE: state is one
    * event-type string per key, each micro-batch replays its slice in
    * (ts, event_id) order and emits only type CHANGES (Append mode —
    * emitted rows are final). Within-batch and cross-batch behavior
    * agree because the state carries the last SEEN type across the
    * boundary; a straggler arriving after newer events processed is
    * compared against the newest type (the online approximation — the
    * batch x41 window is the repair path, the st4/w5 discipline). */
  def streamingDebounce(events: Dataset[FullEvent]): Dataset[DebouncedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[FullEvent], state: GroupState[String]) => {
          val sorted = it.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var last = state.getOption.orNull
          val out = IndexedSeq.newBuilder[DebouncedEvent]
          sorted.foreach { e =>
            if (last == null || last != e.event_type) {
              out += DebouncedEvent(uid, e.event_id, e.event_type, e.ts)
              last = e.event_type
            }
          }
          if (last != null) state.update(last)
          out.result().iterator
        })
  }

  /** Streaming Count-Min sketch (t29's stream twin): arriving tokens fold
    * into the d×w counter grid as an ordinary streaming aggregation whose
    * state is BOUNDED BY CONSTRUCTION at depth·width rows — the rare
    * streaming aggregate that needs no watermark to stay finite, because
    * the key space (not the eviction policy) bounds it. Per micro-batch
    * the update is map-side combined to ≤ d·w partials per partition;
    * downstream point queries read the sketch table exactly as the batch
    * [[graft.operators.Sketch.countMinLookup]] does. Run in Update mode;
    * frequencies only ever grow, so re-emitted cells are monotone. */
  def streamingCountMin(terms: DataFrame, termCol: String,
                        depth: Int = 4, width: Int = 1024): DataFrame =
    terms
      .select(posexplode(
        graft.operators.Sketch.cmCells(col(termCol), depth, width))
        .as(Seq("row", "cell")))
      .groupBy("row", "cell")
      .agg(count(lit(1)).as("cnt"))

  /** Incremental tile ingestion: stream new block parquet under `path`
    * through a per-batch function — the foreachBatch pattern for driving
    * LayerJob-style transforms incrementally (new manifest entries become
    * new tiles; existing tiles are skipped by the F3 anti-join inside the
    * batch function). */
  def incrementalBlocks(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType)
                       (perBatch: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(path)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch(perBatch)
      .start()
}
