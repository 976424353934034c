package graft.plans

/** Run two mutually independent driver-blocking Spark jobs concurrently
  * (guide §2.6: actions are only sequential because the driver calls
  * them sequentially — each job's task tail and driver-side commit gaps
  * otherwise idle the cores the other job wants). `fb` runs on a single
  * worker thread, `fa` on the caller's thread; results are identical to
  * the sequential call because the jobs share no mutable state — callers
  * must only pair jobs that neither read nor write each other's tables.
  *
  * Failure path: if either side throws, the pool is shut down with
  * `shutdownNow()` (best-effort cancel of the in-flight side) and the
  * ORIGINAL exception is rethrown — `ExecutionException` is unwrapped so
  * the sequential failure contract is preserved (r17 ADVICE). */
object Overlap {
  def two[A, B](fa: => A, fb: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      val f = pool.submit(new java.util.concurrent.Callable[B] {
        def call(): B = fb
      })
      val a =
        try fa
        catch { case t: Throwable => f.cancel(true); throw t }
      val b =
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      (a, b)
    } finally {
      pool.shutdownNow()
      ()
    }
  }
}
