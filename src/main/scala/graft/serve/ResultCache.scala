package graft.serve

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** Plan-fingerprint result cache with TTL — the engine-side analog of the
  * reference's Redis result cache (reference: Frontend/app.py:151-215,
  * 284-303; V2/V3 in SURVEY.md §2.10).
  *
  * Key = the canonicalized analyzed plan's semantic hash, so two queries that
  * differ only in formatting/aliases hit the same entry — strictly better
  * than the reference's normalized-SQL-text key. Value = the persisted
  * (in-memory/disk) DataFrame; entries expire after `ttlSeconds` (reference
  * TTL: 3600 s) and are unpersisted on eviction.
  *
  * Scale note: persistence is cluster-wide (Spark block manager), the map
  * itself only holds plan-hash → handle on the driver.
  */
final class ResultCache(ttlSeconds: Long = 3600, maxEntries: Int = 64,
                        clock: () => Long = () => System.currentTimeMillis()) {

  private final case class Entry(df: DataFrame, createdMs: Long)
  private val entries = new ConcurrentHashMap[Long, Entry]()

  private var hitCount = 0L
  private var missCount = 0L

  def fingerprint(df: DataFrame): Long =
    df.queryExecution.analyzed.canonicalized.semanticHash().toLong

  /** Route a DataFrame through the cache: same semantic plan within TTL
    * returns the already-persisted result.
    */
  def through(df: DataFrame): DataFrame = {
    val key = fingerprint(df)
    val now = clock()
    val cur = entries.get(key)
    if (cur != null && now - cur.createdMs < ttlSeconds * 1000) {
      synchronized { hitCount += 1 }
      cur.df
    } else {
      if (cur != null) invalidateKey(key)
      synchronized { missCount += 1 }
      if (entries.size >= maxEntries) evictOldest()
      val persisted = df.persist()
      entries.put(key, Entry(persisted, now))
      persisted
    }
  }

  /** V3: explicit invalidation (delete one key). */
  def invalidate(df: DataFrame): Unit = invalidateKey(fingerprint(df))

  private def invalidateKey(key: Long): Unit = {
    val e = entries.remove(key)
    if (e != null) e.df.unpersist()
  }

  /** V3: flushall. */
  def clear(): Unit = {
    entries.forEach((k, _) => invalidateKey(k))
  }

  private def evictOldest(): Unit = {
    var oldest = -1L
    var oldestTs = Long.MaxValue
    entries.forEach { (k, e) =>
      if (e.createdMs < oldestTs) { oldestTs = e.createdMs; oldest = k }
    }
    if (oldest != -1L) invalidateKey(oldest)
  }

  def stats: (Long, Long, Int) = synchronized { (hitCount, missCount, entries.size) }
}
