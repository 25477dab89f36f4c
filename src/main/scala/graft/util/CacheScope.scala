package graft.util

import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** Lifecycle owner for relations cached while BUILDING a lazy pipeline.
  *
  * Operators like `Dedup.nearDupPairs` cache an intermediate consumed by
  * several branches of the plan they return; because the result is lazy,
  * the operator itself can never know when it is safe to unpersist. The
  * caller does: pass a scope, materialize the result, `close()` the
  * scope. The default (a fresh scope nobody closes) preserves the old
  * cache-until-session-end behavior; batch drivers that run many queries
  * (Verify, Bench) instead clear the whole session cache between
  * queries, so a 100-query session never accumulates cached relations.
  */
final class CacheScope {
  private val tracked = mutable.Buffer.empty[DataFrame]

  /** Cache `df` and register it for release when this scope closes. */
  def cache(df: DataFrame): DataFrame = {
    tracked += df
    df.cache()
  }

  /** Unpersist every relation cached through this scope (blocking, so
    * the memory is actually free when this returns). */
  def close(): Unit = {
    tracked.foreach(_.unpersist(blocking = true))
    tracked.clear()
  }
}
