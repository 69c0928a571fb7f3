package graft.ops

import org.apache.spark.SparkContext

/** Concurrent driver-job orchestration. Fit paths that need several
  * INDEPENDENT Spark jobs (a wide stats scan + a bounded sample scan, a
  * numeric stats pass + a melted top-categories pass) submit them from
  * separate driver threads so the cluster overlaps them — the analogue of
  * the reference's joblib parallelism at fit time.
  */
object Jobs {

  /** Run `bg` on a background thread while `fg` runs on the calling thread;
    * returns both results. If the foreground fails, the background is
    * stopped best-effort BOTH ways a future can be pending: a not-yet-started
    * future sees the cancelled flag and never submits work, and an
    * in-flight one has its job group cancelled (a running job stops at the
    * next task checkpoint; driver-side computation between jobs finishes its
    * step). The group is cleared in a finally so a reused pool thread never
    * carries a stale (cancellable) group id onto unrelated work.
    */
  /** Run every thunk concurrently (each from its own driver thread, so the
    * scheduler overlaps their jobs) and return results in input order. The
    * first failure cancels the shared job group and rethrows. Use for fit
    * paths with 3+ independent bounded jobs (stats + distinct probes +
    * per-column top-k); for the plain two-job case `overlap` reuses the
    * calling thread.
    */
  def overlapAll[A](sc: SparkContext)(thunks: Seq[() => A]): Seq[A] = {
    if (thunks.isEmpty) return Nil
    if (thunks.length == 1) return Seq(thunks.head())
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val group = s"graft-overlap-${java.util.UUID.randomUUID()}"
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val futures = thunks.tail.map { t =>
      Future {
        if (cancelled.get())
          throw new java.util.concurrent.CancellationException("cancelled")
        sc.setJobGroup(group, "graft overlapped fit job", interruptOnCancel = true)
        if (cancelled.get())
          throw new java.util.concurrent.CancellationException("cancelled")
        try t() finally sc.clearJobGroup()
      }
    }
    val first =
      try thunks.head()
      catch {
        case e: Throwable =>
          cancelled.set(true); sc.cancelJobGroup(group); throw e
      }
    val rest = futures.map { f =>
      try Await.result(f, Duration.Inf)
      catch {
        case e: Throwable =>
          cancelled.set(true); sc.cancelJobGroup(group); throw e
      }
    }
    first +: rest
  }

  def overlap[A, B](sc: SparkContext)(bg: => A)(fg: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val group = s"graft-overlap-${java.util.UUID.randomUUID()}"
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bgF = Future {
      if (cancelled.get())
        throw new java.util.concurrent.CancellationException(
          "foreground job failed before background started")
      sc.setJobGroup(group, "graft background fit job", interruptOnCancel = true)
      // re-check AFTER the group is registered: the flag is set BEFORE
      // cancelJobGroup fires, so either this check sees it (and no work is
      // ever submitted), or setJobGroup completed first and cancelJobGroup
      // kills the registered group — the lost-cancel window is closed
      if (cancelled.get())
        throw new java.util.concurrent.CancellationException(
          "foreground job failed before background submitted work")
      try bg finally sc.clearJobGroup()
    }
    val fgResult =
      try fg
      catch {
        case e: Throwable =>
          cancelled.set(true); sc.cancelJobGroup(group); throw e
      }
    (Await.result(bgF, Duration.Inf), fgResult)
  }
}
