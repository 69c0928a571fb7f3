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
    * returns both results. The background thread's Spark jobs carry a
    * dedicated job group: if the foreground fails, the group is cancelled
    * (best-effort — a running job stops, a pure computation finishes) so no
    * orphaned job chain outlives the operator that spawned it.
    */
  def overlap[A, B](sc: SparkContext)(bg: => A)(fg: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val group = s"graft-overlap-${java.util.UUID.randomUUID()}"
    val bgF = Future {
      sc.setJobGroup(group, "graft background fit job", interruptOnCancel = true)
      try bg finally sc.clearJobGroup()
    }
    val fgResult =
      try fg
      catch { case e: Throwable => sc.cancelJobGroup(group); throw e }
    (Await.result(bgF, Duration.Inf), fgResult)
  }
}
