package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Tracks intermediate frames that operators persist for intra-query
  * reuse (MinHash signatures, LSH band/bucket frames, shingle
  * projections, …) so harnesses can release them once the query's
  * result is materialized.
  *
  * Operators stay LAZY — constructing a pipeline runs no job and cannot
  * unpersist its own caches (the returned frame still depends on them),
  * so each `persist` is registered here and `Verify`/`Bench` call
  * [[releaseAll]] after each query's sink action. Without this, a run
  * over all gate queries accumulates dozens of cached frames
  * (MEMORY_AND_DISK) that survive until JVM exit.
  */
object CacheRegistry {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val sharedFrames =
    scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
  private val sessionTokens =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]()

  /** Unique token for a live session, for use in [[sharedFrame]] keys.
    * `System.identityHashCode` is NOT unique across a session's
    * lifetime boundary — after a stop+GC a new session can land on a
    * colliding hash and be served a stale frame bound to the dead
    * session. A random UUID held in a WeakHashMap can't collide (fresh
    * per live instance) and can't pin stopped sessions (weak keys). */
  def sessionToken(s: org.apache.spark.sql.SparkSession): String =
    synchronized {
      Option(sessionTokens.get(s)).getOrElse {
        val t = java.util.UUID.randomUUID().toString
        sessionTokens.put(s, t)
        t
      }
    }

  /** Memoized CROSS-QUERY shared frame: built and persisted once per key
    * for the lifetime of the JVM. [[releaseAll]] does NOT touch these —
    * they exist precisely so consecutive queries over the same corpus
    * reuse one expensive derivation (e.g. the trade-graph pair frame
    * feeding both graph_common_neighbors and graph_triangles) instead of
    * re-scanning the fact tables. Keys must pin everything the build
    * depends on (session identity, data dir, parameters). Harness mains
    * call [[releaseShared]] before exit. */
  def sharedFrame(key: String)(build: => DataFrame): DataFrame =
    synchronized {
      sharedFrames.getOrElseUpdate(key,
        build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

  /** [[sharedFrame]] WITHOUT the persist — for builds that already
    * materialize their result (localCheckpoint ends in stored RDD
    * blocks); stacking a persist on top would re-materialize the frame
    * a second time on first read (measured +3 s on the 10× pagerank
    * edge build). releaseShared's unpersist is a no-op for these. */
  def sharedFrameMaterialized(key: String)(build: => DataFrame): DataFrame =
    synchronized {
      sharedFrames.getOrElseUpdate(key, build)
    }

  /** Unpersist and forget every cross-query shared frame. */
  def releaseShared(): Unit = synchronized {
    sharedFrames.values.foreach(df =>
      try df.unpersist(blocking = false) catch { case _: Exception => () })
    sharedFrames.clear()
  }

  /** Persist-and-register `df` unless it is ALREADY persisted (e.g. a
    * cross-query shared frame): re-registering would let [[releaseAll]]
    * unpersist the shared memo out from under later consumers. A
    * checkpointed frame (bare LogicalRDD plan) is already materialized
    * RDD blocks — persisting it would store a second full copy on
    * first read, so it passes through untouched too. */
  def ensurePersisted(df: DataFrame): DataFrame =
    if (df.queryExecution.analyzed
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]) df
    else if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      register(df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    else df

  /** Register an already-persisted frame for later release; returns it
    * unchanged so call sites can chain `.persist(...).pipe(register)`. */
  def register[T](ds: Dataset[T]): Dataset[T] = synchronized {
    frames += ds.toDF()
    ds
  }

  /** Unpersist every registered frame (non-blocking) and clear the
    * registry. Safe to call repeatedly; frames already unpersisted by
    * their operator (e.g. connectedComponents' per-round labels) are
    * no-ops. */
  def releaseAll(): Unit = synchronized {
    frames.foreach(df => try df.unpersist(blocking = false) catch { case _: Exception => () })
    frames.clear()
  }

  /** Number of currently-registered frames (test hook). */
  def size: Int = synchronized(frames.size)
}
