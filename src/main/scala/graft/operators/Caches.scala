package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of the sketch relations the operators persist.
  *
  * The LSH/span operators `.persist()` their exploded sketch relations
  * because each feeds multiple downstream joins and Catalyst does not
  * dedupe common subplans — but a lazy DataFrame API cannot unpersist
  * behind itself, so pre-round-6 those caches lived until the session
  * died (or a blanket `spark.catalog.clearCache()`). Every operator
  * persist now routes through [[persisted]], which records the relation
  * here; [[release]] (surfaced as `Dedup.releaseCaches`) unpersists
  * everything registered for the session once the operator outputs are
  * materialized. `CorpusPrep.run`/`runIncremental` call it on exit, and a
  * long-lived session composing several dedup passes should do the same
  * between corpora.
  *
  * Releasing is always SAFE, never required for correctness: an
  * unpersisted relation recomputes from source on the next action (it
  * only costs the rerun of the sketch scan). Entries hold strong
  * references to their plans, so the registry must be drained by
  * [[release]] — it is not a weak cache.
  */
object Caches {
  private val registry = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at MEMORY_AND_DISK and register it for [[release]].
    * Used as `.transform(Caches.persisted)` at operator persist sites. */
  private[graft] def persisted(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    registry.add(p)
    p
  }

  /** Blocking-unpersist every relation registered under `spark` and drop
    * it from the registry. Returns the number released. Blocking so a
    * caller (or test) observing `sparkContext.getPersistentRDDs` sees the
    * release immediately. */
  def release(spark: SparkSession): Int = {
    val it = registry.iterator()
    var n = 0
    while (it.hasNext) {
      val df = it.next()
      if (df.sparkSession eq spark) {
        df.unpersist(blocking = true)
        it.remove()
        n += 1
      }
    }
    n
  }
}
