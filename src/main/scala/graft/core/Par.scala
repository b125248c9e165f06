package graft.core

/** Overlapping independent Spark actions from driver threads (guide
  * §2.6): a recall panel that runs `2k` small probe jobs SEQUENTIALLY
  * pays the per-job scheduling floor 2k times while 31 of 32 cores
  * idle through each tail. Submitting the independent actions from a
  * bounded pool lets the scheduler back-fill — same jobs, same
  * per-query plans, same results (each thunk's output is collected
  * independently; FIFO scheduling interleaves task sets without
  * changing any of them).
  *
  * Use ONLY for actions that are truly independent (read-only probes,
  * dual approx/exact legs). Mutating lifecycle steps stay sequential —
  * ordering is their contract. */
object Par {

  /** Run the thunks concurrently (bounded pool), preserving order of
    * results; rethrows the first failure's CAUSE so error signatures
    * match the sequential path. */
  def run[A](thunks: Seq[() => A], maxThreads: Int = 8): Seq[A] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(thunks.size, maxThreads))
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] { def call(): A = t() })
      }
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally { pool.shutdown(); () }
  }

  /** Two independent actions, overlapped. */
  def pair[A, B](a: => A, b: => B): (A, B) = {
    val out = run[Any](Seq(() => a, () => b))
    (out(0).asInstanceOf[A], out(1).asInstanceOf[B])
  }
}
