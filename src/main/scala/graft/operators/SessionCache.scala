package graft.operators

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Build-once-per-session cache for index-like values (persisted
  * DataFrames, trained quantizers). Keys combine a STABLE session
  * identity with a caller sub-key, so a new session can never inherit
  * a dead session's entry: `sessionUUID` is unique per SparkSession
  * instance (unlike `System.identityHashCode`, which a post-GC
  * allocation can collide with). Every access sweeps entries whose
  * session's context was STOPPED, unpersisting what they cached — so
  * stopped-session indexes don't pin block-manager memory for the
  * process lifetime. (The session reference is weak for hygiene, but
  * a cached DataFrame strongly references its session, so in practice
  * eviction fires on stop, not GC; sibling sessions that are abandoned
  * without stopping their shared context keep their entries — bounded
  * by one entry per (session, corpus) a caller actually built.)
  */
private[graft] final class SessionCache[V](onEvict: V => Unit = (_: V) => ()) {

  private final class Entry(val session: WeakReference[SparkSession], val value: V)

  private val entries = new ConcurrentHashMap[String, Entry]()

  /** `sessionUUID` where the runtime session exposes it (the classic
    * local/cluster SparkSession always does; it is `private[sql]` in
    * the Scala signature but public in bytecode, hence reflection);
    * identity hash only as a last-resort fallback for exotic session
    * impls — safe there because the session is also swept on stop.
    */
  private def sessionId(s: SparkSession): String =
    try s.getClass.getMethod("sessionUUID").invoke(s).asInstanceOf[String]
    catch { case _: ReflectiveOperationException =>
      s"idhash-${System.identityHashCode(s)}"
    }

  private def sweep(): Unit =
    entries.forEach { (k, e) =>
      val sess = e.session.get
      if (sess == null || sess.sparkContext.isStopped)
        if (entries.remove(k, e)) onEvict(e.value)
    }

  /** Build OUTSIDE the map's bin lock: computeIfAbsent would hold a
    * ConcurrentHashMap bin lock across a multi-second Spark index
    * build (serializing unrelated keys in the same bin, and breaking
    * on any reentrant build). The race trade: two threads may build
    * the same index concurrently; the loser's copy is evicted
    * (unpersisted) and the winner's returned.
    */
  def getOrBuild(s: SparkSession, subKey: String)(build: => V): V = {
    sweep()
    val key = s"${sessionId(s)}#$subKey"
    val existing = entries.get(key)
    if (existing != null) return existing.value
    val built = build
    val prior = entries.putIfAbsent(key, new Entry(new WeakReference(s), built))
    if (prior != null) { onEvict(built); prior.value } else built
  }
}
