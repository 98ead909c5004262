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
  */
object Sessionize {

  def updateSession(gapSec: Long)(
      userId: Long,
      events: Iterator[(Long, Long)], // (userId, epochSec)
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    var s = state.getOption.getOrElse(SessionState(0L, 0L, 0L, 0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    events.toSeq.sortBy(_._2).foreach { case (_, sec) =>
      s =
        if (s.nEvents == 0L) SessionState(1L, 1L, sec, sec)
        else if (sec - s.lastSec > gapSec) {
          out += SessionOut(userId, s.sessionId, s.nEvents, s.startSec, s.lastSec)
          SessionState(s.sessionId + 1, 1L, sec, sec)
        } else s.copy(nEvents = s.nEvents + 1, lastSec = sec)
    }
    state.update(s)
    out += SessionOut(userId, s.sessionId, s.nEvents, s.startSec, s.lastSec)
    out.iterator
  }

  /** Wire the stateful op over a (user_id, epoch_sec) stream. */
  def sessions(spark: SparkSession, events: Dataset[(Long, Long)],
               gapSec: Long = 1800L): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        updateSession(gapSec))
  }
}
