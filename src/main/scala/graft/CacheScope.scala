package graft

import org.apache.spark.sql.Dataset
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** Registry for operator-internal persisted frames.
  *
  * Operators that persist an intermediate (the dedup shingle-set frames, a
  * self-joined fingerprint frame) cannot unpersist it themselves: their
  * result is lazy, so the cache must outlive the call and die only after the
  * caller's consuming action. Registering the frame here gives the caller a
  * single release point — harnesses (Bench, Verify) call [[release]] after
  * each query's action so one query's cache never skews the next query's
  * measurement (GC pressure from retained blocks was measured inflating
  * later queries up to ~10×).
  *
  * Library callers that run many operator calls in one session should do the
  * same, or hold their own reference and `unpersist()` directly.
  */
object CacheScope {
  private val frames = ArrayBuffer.empty[Dataset[_]]

  /** Track a persisted frame; returns it unchanged. */
  def register[T](ds: Dataset[T]): Dataset[T] = synchronized { frames += ds; ds }

  /** Unpersist every tracked frame and clear the registry. */
  def release(blocking: Boolean = false): Unit = synchronized {
    frames.foreach { f =>
      try f.unpersist(blocking) catch { case NonFatal(_) => () }
    }
    frames.clear()
  }

  /** Number of currently tracked frames (for specs). */
  def size: Int = synchronized(frames.size)
}
