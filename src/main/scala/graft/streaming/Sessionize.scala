package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{SessionOut, SessionState}

/** Streaming gap-based sessionization via `mapGroupsWithState` —
  * SURVEY §2.9 T5's keyed-state slot (the reference only uses keyed
  * state as a create-once latch, dim/DimDataToHBase.scala:48,68-71; this
  * is the full streaming-state capability the rebuild exposes).
  *
  * State per user: (sessionId, count, start, last). An event more than
  * `gapSec` after the last one closes the session and opens the next.
  * Emits the *current* state of the open session each batch (update
  * semantics); the batch analog is Queries.q21 (window-function form).
  *
  * ==Checkpoint compatibility==
  * Keyed state persists in the checkpoint and is restored verbatim on
  * restart (StreamingSpec pins this: a session spanning a restart keeps
  * its id and count). Two operational rules follow:
  *
  *  1. '''`gapSec` is NOT part of the state.''' Restarting with a
  *     different gap is accepted silently, but session boundaries
  *     already decided under the old gap are never revisited — the
  *     output mixes two gap policies. Changing `gapSec` should be
  *     treated as a NEW query: point it at a fresh checkpoint dir (and
  *     re-derive history with the batch analog, Queries.q21, if a
  *     consistent backfill is needed).
  *  2. '''[[graft.model.SessionState]] is the state format.''' It is
  *     encoded with its product encoder inside the checkpoint, so
  *     adding/removing/reordering its fields breaks restarts with an
  *     undecipherable-state error. Treat any change to it as a state
  *     format bump: new checkpoint dir, same as rule 1 — the Spark
  *     analog of `stateFormatVersion` migrations.
  */
object Sessionize {

  def updateSession(gapSec: Long)(
      userId: Long,
      events: Iterator[(Long, Long)], // (userId, epochSec)
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    // idle timeout: emit the final state of the open session and free
    // the key's state — without this, every user ever seen holds state
    // forever and an idle user's last session never closes
    if (state.hasTimedOut) {
      state.getOption.foreach { s =>
        out += SessionOut(userId, s.sessionId, s.nEvents, s.startSec, s.lastSec)
      }
      state.remove()
      return out.iterator
    }
    var s = state.getOption.getOrElse(SessionState(0L, 0L, 0L, 0L))
    events.toSeq.sortBy(_._2).foreach { case (_, sec) =>
      s =
        if (s.nEvents == 0L) SessionState(1L, 1L, sec, sec)
        else if (sec - s.lastSec > gapSec) {
          out += SessionOut(userId, s.sessionId, s.nEvents, s.startSec, s.lastSec)
          SessionState(s.sessionId + 1, 1L, sec, sec)
        } else
          // a cross-batch late event (sec < lastSec) merges into the
          // open session but must not regress the watermark or the
          // session start/end — keep both monotone
          s.copy(nEvents = s.nEvents + 1,
            startSec = math.min(s.startSec, sec),
            lastSec = math.max(s.lastSec, sec))
    }
    state.update(s)
    // (re)arm the idle timeout when the query runs with
    // ProcessingTimeTimeout; under NoTimeout the call is rejected
    try state.setTimeoutDuration(gapSec * 1000)
    catch { case _: UnsupportedOperationException => () }
    out += SessionOut(userId, s.sessionId, s.nEvents, s.startSec, s.lastSec)
    out.iterator
  }

  /** Wire the stateful op over a (user_id, epoch_sec) stream.
    *
    * `idleTimeout = true` (recommended for long-running deployments)
    * bounds the state store: a key idle for `gapSec` of processing
    * time flushes its open session and is removed — without it, every
    * user ever seen holds state forever and an idle user's final
    * session never closes. Left off by default because timeout
    * processing schedules extra trigger batches, which test harnesses
    * driving the query with `processAllAvailable` perceive as a query
    * that never quiesces. */
  def sessions(spark: SparkSession, events: Dataset[(Long, Long)],
               gapSec: Long = 1800L,
               idleTimeout: Boolean = false): Dataset[SessionOut] = {
    import spark.implicits._
    val timeout =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(updateSession(gapSec))
  }
}
