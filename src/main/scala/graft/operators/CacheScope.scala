package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Release path for the internal persisted frames of batch operators.
 *
 * The LSH/dedup/curation operators persist shared intermediate frames
 * (signature tables, candidate sets, pre-collapse maps) because their
 * branches' differing projections defeat Spark's exchange reuse — without
 * the persists each branch re-executes the whole upstream pipeline. Spark's
 * CacheManager holds such entries until an explicit unpersist, so a
 * long-lived session invoking these operators repeatedly would accumulate
 * cache entries without bound (the streaming path's
 * `incrementalMinhashWithCleanup` fixed this for one operator; this scope
 * generalizes the pattern to all of them).
 *
 * Usage:
 * {{{
 *   val (pairs, caches) = CacheScope.tracking {
 *     Dedup.minhashDedup(docs, "id", "text")
 *   }
 *   pairs.write.parquet(out)   // fully consume the result FIRST
 *   caches.release()           // then drop the operator's internal caches
 * }}}
 *
 * Operators register their persists via [[CacheScope.pin]], which is a
 * plain `persist` when no scope is active (the library default: caches live
 * until the caller or session releases them). Registration is synchronous
 * on the calling thread — operator construction is eager even though
 * execution is lazy, so a ThreadLocal scope observes every pin made by the
 * operators invoked inside `tracking`. Scopes nest; pins register with the
 * innermost active scope.
 */
object CacheScope {

  /** Handle over the frames persisted inside one [[tracking]] block. */
  final class TrackedCaches private[CacheScope] (frames: Seq[DataFrame]) {
    def size: Int = frames.size
    /** Unpersist every tracked frame. Only call after the tracked result
      * has been fully consumed — the frames back its lazy plan. */
    def release(): Unit = frames.foreach(_.unpersist(blocking = false))
    private[graft] def all: Seq[DataFrame] = frames
  }

  private val active =
    new ThreadLocal[scala.collection.mutable.ListBuffer[DataFrame]]

  /** Persist `df` and register it with the innermost tracking scope (plain
    * persist when none is active). Operator-internal entry point. */
  private[graft] def pin(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val out = df.persist(level)
    val buf = active.get
    if (buf != null) buf += out
    out
  }

  /** Run `body`, collecting every internal persist of the operators invoked
    * inside it. Returns the result plus the handle releasing those caches. */
  def tracking[T](body: => T): (T, TrackedCaches) = {
    val prev = active.get
    val buf = scala.collection.mutable.ListBuffer.empty[DataFrame]
    active.set(buf)
    try {
      val r = body
      (r, new TrackedCaches(buf.toList))
    } finally {
      if (prev == null) active.remove() else active.set(prev)
    }
  }
}
