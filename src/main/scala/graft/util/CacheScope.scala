package graft.util

import org.apache.spark.sql.{DataFrame, Dataset}

/** Lifecycle scoping for operator-INTERNAL caches.
  *
  * Several operators cache an intermediate frame that feeds two or more
  * consumers inside one returned plan (a fingerprint frame read by a
  * frequency cap and both sides of a self-join, a banded-signature frame
  * read by both join sides). Those caches cannot be unpersisted inside
  * the operator — the returned frame still references them lazily — so
  * historically they lived until LRU eviction. Bounded, but in a
  * long-lived REST/stream session repeated `/pipeline` calls accumulate
  * storage-pool pressure and evict each other's still-useful blocks.
  *
  * [[withScope]] brackets a CONSUMING ACTION: any frame an operator
  * passed to [[register]] while the scope was open on this thread is
  * unpersisted (non-blocking) when the scope closes. Outside a scope,
  * [[register]] is a no-op and behavior is exactly the historical one
  * (cache until LRU) — library users who compose operators lazily and
  * materialize later on another thread lose nothing.
  *
  * [[eager]] additionally MATERIALIZES the cache (one count) before any
  * consumer is planned. That closes a real nondeterminism-of-cost hole:
  * a cached frame read by three independent shuffle-map stages (the
  * frequency-cap aggregate and the two self-join sides) has those stages
  * submitted concurrently, and each computes whatever partitions are not
  * cached YET — up to 3x the kernel cost on a cold cache, dependent on
  * scheduler interleaving. One eager pass makes every consumer a pure
  * cache read and the operator's cost deterministic.
  */
object CacheScope {
  private val active =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[Dataset[_]]]()

  /** Track `df` (already `.cache()`d by the caller) for unpersist at the
    * end of the enclosing [[withScope]], if one is open on this thread.
    * Appends under the buffer's lock: [[parallel]] shares one scope buffer
    * across its worker threads. */
  /** Whether a [[withScope]] is open on this thread — operators use it to
    * decide if construction-time measurement actions (an eager count, a
    * histogram probe steering an adaptive plan) are inside the scoped
    * consume-now shape (bench/Verify/service) or a lazy library
    * composition that must not run jobs at plan-construction time. */
  def inScope: Boolean = active.get() != null

  def register[T](df: Dataset[T]): Dataset[T] = {
    val buf = active.get()
    if (buf != null) buf.synchronized { buf += df }
    df
  }

  /** Run the bodies CONCURRENTLY, each on its own thread with the CALLING
    * thread's open scope shared (registrations land in the enclosing
    * scope), and return their results in order. The overlap-independent-
    * jobs pattern: Spark's scheduler runs jobs submitted from several
    * driver threads at once, so independent chains' eager materializations
    * back-fill each other's stragglers instead of serializing — the wall
    * clock of N independent eager chains drops toward the longest one.
    * Thread-safety: SparkSession job submission is thread-safe; the scope
    * buffer append is synchronized in [[register]]. Any body throwing
    * rethrows after all bodies settle (no orphaned running jobs). */
  def parallel[T](bodies: Seq[() => T]): Seq[T] = {
    if (bodies.sizeIs <= 1) return bodies.map(_())
    val outer = active.get()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(bodies.size)
    try {
      val futures = bodies.map { b =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = {
            active.set(outer)
            try b() finally active.remove()
          }
        })
      }
      // get() each in order; the first failure propagates after every
      // other body has settled (futures are all submitted already)
      val results = futures.map { f =>
        try Right(f.get())
        catch { case e: java.util.concurrent.ExecutionException => Left(e.getCause) }
      }
      results.collectFirst { case Left(e) => e }.foreach(throw _)
      results.collect { case Right(v) => v }
    } finally pool.shutdown()
  }

  /** Cache `df` and, WHEN a [[withScope]] is open on this thread,
    * materialize it fully (one count) and register it for scope-end
    * unpersist. Inside a scope the materialization makes every later
    * concurrent consumer a pure cache read — the deterministic-cost
    * contract the bench/Verify/`/pipeline` paths rely on. Outside a
    * scope this is a plain lazy `.cache()`: a library user composing
    * operators lazily pays nothing at plan-construction time and may
    * consume any subset of the plan — the historical behavior —
    * trading back the cold-cache cost nondeterminism the scope form
    * eliminates (concurrent first consumers can race uncached
    * partitions). NOT a snapshot: a caller that needs
    * materialize-before-mutation semantics (read an index before
    * compacting it) must use [[pin]], which counts unconditionally. */
  def eager(df: DataFrame): DataFrame = {
    df.cache()
    if (active.get() != null) {
      df.count()
      register(df)
    }
    df
  }

  /** Cache `df` and materialize it NOW, scope or no scope — the
    * read-before-mutation pin: a frame that must capture the CURRENT
    * state of something about to be mutated underneath it (an index
    * directory about to be compacted/overwritten, a table about to be
    * replaced) cannot rely on [[eager]], whose outside-a-scope form is a
    * plain lazy cache that would read post-mutation state at first
    * consumption. Registered for scope-end unpersist when a scope is
    * open; otherwise lives until the caller unpersists (or LRU). Use
    * [[eager]] for cost determinism inside scopes; use pin when
    * correctness depends on the snapshot. */
  def pin(df: DataFrame): DataFrame = {
    df.cache()
    df.count()
    register(df)
    df
  }

  /** Run `body` (which should CONSUME the frames it builds — write,
    * collect, or otherwise act); unpersist every frame registered during
    * it. Nested scopes compose: the inner scope releases only its own
    * frames. */
  def withScope[T](body: => T): T = {
    val outer = active.get()
    val buf = scala.collection.mutable.ArrayBuffer[Dataset[_]]()
    active.set(buf)
    try body
    finally {
      active.set(outer)
      buf.foreach { df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }
  }
}
