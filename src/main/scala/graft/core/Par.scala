package graft.core

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

/** Settle-before-exit helpers for concurrent Spark job submissions.
  *
  * The invariant every call site needs: NO leg is left running when the
  * calling scope exits, successfully or not. A bare sequential
  * `Await.result(a); Await.result(b)` breaks it twice — a first-leg
  * failure abandons the second leg mid-write (it keeps consuming
  * executor slots, and in artifact code keeps mutating state after the
  * writer lease is released), and an interrupt during the wait abandons
  * every leg (`Await.result` throws with the future still running).
  */
object Par {

  /** Block until EVERY leg has completed, then return the results in
    * order — rethrowing the FIRST leg failure only after all legs have
    * settled. A thread interrupt during any wait is DEFERRED, not
    * dropped: the wait resumes until the leg completes, the remaining
    * legs settle too, and the interruption then propagates (interrupt
    * status restored, InterruptedException thrown) unless a leg failure
    * takes precedence. */
  def settleAll[T](legs: Seq[Future[T]]): Seq[T] = {
    var interrupted = false
    val results: Seq[Try[T]] = legs.map { leg =>
      // Await.ready (not .result): its InterruptedException can ONLY mean
      // the wait itself was interrupted — a leg that FAILED with
      // InterruptedException completes the future and surfaces through
      // leg.value below, never as a throw here. (With Await.result the two
      // are indistinguishable: a completed-Failure(InterruptedException)
      // leg rethrows instantly on every retry → unbounded busy-spin.)
      // Reading the outcome from leg.value also keeps fatal leg failures
      // (OOM, LinkageError) in the Failure branch instead of escaping the
      // settle loop.
      def loop(): Try[T] =
        try { Await.ready(leg, Duration.Inf); leg.value.get }
        catch {
          case _: InterruptedException =>
            // the throw consumed the interrupt flag; remember it, keep
            // waiting — the leg is still running and MUST settle
            interrupted = true
            loop()
        }
      loop()
    }
    if (interrupted) Thread.currentThread().interrupt()
    val out = results.map(_.get) // first leg failure, after all settled
    if (interrupted) throw new InterruptedException(
      "interrupted while settling concurrent legs (all legs completed)")
    out
  }

  /** [[settleAll]] for two differently-typed legs. */
  def settle2[A, B](a: Future[A], b: Future[B]): (A, B) = {
    val rs = settleAll(Seq[Future[Any]](
      a.asInstanceOf[Future[Any]], b.asInstanceOf[Future[Any]]))
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }

  /** [[settleAll]] for three differently-typed legs. */
  def settle3[A, B, C](a: Future[A], b: Future[B], c: Future[C]): (A, B, C) = {
    val rs = settleAll(Seq[Future[Any]](
      a.asInstanceOf[Future[Any]], b.asInstanceOf[Future[Any]],
      c.asInstanceOf[Future[Any]]))
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B], rs(2).asInstanceOf[C])
  }

  /** Run `main` on the calling thread while `leg` proceeds, settling the
    * leg even when `main` throws (the main-thread failure then takes
    * precedence, but only once the leg has stopped running). */
  def withLeg[A, B](leg: Future[A])(main: => B): (A, B) = {
    // Try(main) would catch NonFatal only — a fatal throwable from main
    // (InterruptedException, OOM, LinkageError) would skip the settle and
    // leave the leg mutating state after this scope unwinds, the exact
    // hazard this helper exists to prevent. Catch Throwable, settle, then
    // let .get rethrow.
    val mt: Try[B] =
      try scala.util.Success(main)
      catch { case t: Throwable => scala.util.Failure(t) }
    val lt = Try(settleAll(Seq(leg)).head)
    val m = mt.get
    (lt.get, m)
  }
}
