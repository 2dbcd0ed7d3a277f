package graft.api

/** Run INDEPENDENT Spark actions concurrently from the driver
  * (optimization guide §2.6 "overlap independent jobs"): Spark's
  * scheduler happily runs several jobs at once — actions are only
  * sequential because driver code calls them sequentially. The index
  * writers use this for their independent output tables (postings +
  * contributions, codes + vectors, edges + vertices): the second
  * table's tasks back-fill executors freed by the first table's tail
  * instead of waiting for it, locally collapsing two serial job
  * chains' fixed latencies into one. Correctness is unaffected —
  * the thunks write DIFFERENT paths and any shared upstream
  * cache/checkpoint is block-locked per partition by Spark itself
  * (concurrent first-materialization is safe).
  *
  * The first failure propagates with its ORIGINAL exception (not the
  * pool's ExecutionException wrapper), so callers' error contracts
  * are unchanged; remaining thunks are awaited (a Spark write is not
  * safely cancellable mid-commit).
  */
private[graft] object Par {
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) thunks.foreach(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = t()
          })
        }
        var firstFailure: Throwable = null
        futs.foreach { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              if (firstFailure == null) firstFailure = e.getCause
          }
        }
        if (firstFailure != null) throw firstFailure
      } finally { pool.shutdown(); () }
    }
  }
}
