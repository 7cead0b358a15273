package graft.operators

/** Driver-thread overlap of two independent Spark actions (guide §2.6:
  * the scheduler happily runs several jobs at once — actions are only
  * sequential because driver code calls them sequentially; the second
  * job's tasks back-fill executors the first job's task tail leaves
  * idle), with leak-proof failure handling: the backgrounded branch is
  * ALWAYS awaited, even when the foreground branch throws. The bare
  * Future/Await pattern this replaces abandoned the future on a
  * foreground failure — the caller's `finally` cleanup (an unpersist, a
  * temp-dir delete) then raced a still-running write job, and the
  * future's own failure was swallowed outright (a retrying caller could
  * also race the orphaned write). The foreground failure wins when both
  * branches throw; the background failure rides along as suppressed.
  */
private[graft] object Par {

  /** Run `background` on a pooled driver thread concurrently with
    * `foreground` on the calling one; return both results. Either
    * branch's failure propagates only after BOTH branches have finished.
    */
  def overlap[A, B](background: => A)(foreground: => B): (A, B) = {
    val fa = scala.concurrent.Future(background)(
      scala.concurrent.ExecutionContext.global)
    val rb =
      try Right(foreground) catch { case e: Throwable => Left(e) }
    val ra =
      try Right(scala.concurrent.Await.result(fa,
        scala.concurrent.duration.Duration.Inf))
      catch { case e: Throwable => Left(e) }
    (rb, ra) match {
      case (Right(vb), Right(va)) => (va, vb)
      case (Left(eb), Left(ea)) =>
        if (eb ne ea) eb.addSuppressed(ea)
        throw eb
      case (Left(eb), _) => throw eb
      case (_, Left(ea)) => throw ea
    }
  }
}
