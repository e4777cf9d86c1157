package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scoped cache release for declared queries that persist an intermediate
  * frame consumed again by the FINAL plan (q131's tokenized projection,
  * q102's profiled projection, mutualTop1's argmax frame).
  *
  * The problem: such a query returns a LAZY DataFrame, so the operator
  * cannot `unpersist()` before returning — the caller's terminal action
  * still needs the cache. But never unpersisting leaks a CacheManager
  * entry per invocation in a long-lived session (the Bench/Verify drivers
  * clear between queries; a library caller looping the query does not, and
  * gets "already cached" warnings plus unbounded MEMORY_AND_DISK growth).
  *
  * [[releaseAfterConsumed]] closes the gap with a QueryExecutionListener:
  * after the first completed action whose analyzed plan CONTAINS the
  * returned query's plan (`sameResult` subtree match — `df.count()`,
  * `df.write...`, and further narrow transformations all qualify), the
  * cached intermediates are unpersisted (non-blocking) and the listener
  * unregisters itself. One listener per query construction. A
  * construction whose result is ABANDONED (no action ever consumes it)
  * does NOT leak: the target plan is held through a WeakReference, and
  * once the abandoned frame is GC'd the listener releases the cache and
  * unregisters itself on the next action — nothing can legitimately
  * consume a cache whose result plan is unreachable, so releasing there
  * is always safe.
  *
  * Register AFTER construction-time eager work (boundary sketches,
  * convergence loops): the listener only matches actions consuming the
  * final frame, so intermediate actions fired while BUILDING the query
  * never release the cache early — but any action on the session between
  * construction and consumption is also safely ignored for the same
  * reason. Unmatched unrelated actions cost one subtree scan each.
  */
object Caching {

  /** Listeners registered by [[releaseAfterConsumed]] and not yet
    * released. Observability only: a long-lived session looping declared
    * queries should see this hover near zero between actions — monotonic
    * growth means consuming actions are not matching their target plans
    * (each leaked listener costs one subtree scan per subsequent action,
    * which compounds across a bench sweep). tools.Soak prints it.
    */
  val activeListeners = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Arrange for `cached` frames to be unpersisted after the first
    * completed (success or failure) action that consumes `result`'s plan.
    * Returns `result` unchanged.
    */
  def releaseAfterConsumed(result: DataFrame, cached: DataFrame*): DataFrame = {
    val session = result.sparkSession
    // Weak: the listener must not keep an abandoned result's plan
    // reachable forever — result itself holds the strong reference for as
    // long as the caller can still run an action. The `cached` handles
    // stay STRONG (they are what unpersist needs); once the listener
    // unregisters, they become unreachable with it.
    val targetRef =
      new java.lang.ref.WeakReference(result.queryExecution.analyzed)
    val listener = new QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def release(qe: QueryExecution): Unit = {
        val target = targetRef.get()
        if (target == null) {
          // Result plan unreachable: nothing can legitimately consume the
          // cache anymore, so releasing it here is always safe. This both
          // converts the abandoned-frame leak into a clean release AND
          // covers the consumed-but-raced path (async listener bus + a
          // structurally-equal analyzed copy in the consuming action can
          // let a GC clear the ref between action and callback).
          if (done.compareAndSet(false, true)) {
            cached.foreach(_.unpersist(blocking = false))
            session.listenerManager.unregister(this)
            activeListeners.decrementAndGet()
          }
          return
        }
        val consumed =
          try qe.analyzed.exists(_.sameResult(target))
          catch { case scala.util.control.NonFatal(_) => false }
        if (consumed && done.compareAndSet(false, true)) {
          cached.foreach(_.unpersist(blocking = false))
          session.listenerManager.unregister(this)
          activeListeners.decrementAndGet()
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = release(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = release(qe)
    }
    session.listenerManager.register(listener)
    activeListeners.incrementAndGet()
    result
  }
}
