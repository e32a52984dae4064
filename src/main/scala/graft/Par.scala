package graft

/** Driver-side parallel construction of independent query legs
  * (optimization guide §2.6 — overlap independent jobs).
  *
  * Under AQE, a lazy `localCheckpoint(false)` materializes its subtree's
  * shuffle stages at CONSTRUCTION time (AdaptiveSparkPlanExec resolves
  * its final plan inside `toRdd`), so a query fn that builds several
  * checkpointed legs one after another serializes jobs that share no
  * lineage — each leg's tail leaves most of the 32 cores idle. Building
  * the independent legs from a small thread pool overlaps those jobs;
  * results are unchanged (each leg's plan is exactly what the sequential
  * construction produced — only the submission order differs, and Spark's
  * scheduler is free to interleave tasks of independent jobs anyway).
  *
  * Scale note: this is a driver-thread change only — at 100 TB the same
  * overlap back-fills executors freed by a leg's straggler tail, which is
  * the guide's stated reason for concurrent job submission.
  */
object Par {
  /** Evaluate the thunks concurrently, return results in order. */
  def apply[A](fs: (() => A)*): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(fs.map(f => Future(f())).toVector), Duration.Inf)
  }

  /** Two-result convenience with precise types. */
  def par2[A, B](fa: => A, fb: => B): (A, B) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val xa = Future(fa); val xb = Future(fb)
    (Await.result(xa, Duration.Inf), Await.result(xb, Duration.Inf))
  }

  /** Three-result convenience with precise types. */
  def par3[A, B, C](fa: => A, fb: => B, fc: => C): (A, B, C) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val xa = Future(fa); val xb = Future(fb); val xc = Future(fc)
    (Await.result(xa, Duration.Inf), Await.result(xb, Duration.Inf),
      Await.result(xc, Duration.Inf))
  }
}
