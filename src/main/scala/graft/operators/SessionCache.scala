package graft.operators

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Build-once-per-session cache for index-like values (persisted
  * DataFrames, trained quantizers). Keys combine a STABLE session
  * identity with a caller sub-key, so a new session can never inherit
  * a dead session's entry: `sessionUUID` is unique per SparkSession
  * instance (unlike `System.identityHashCode`, which a post-GC
  * allocation can collide with). The session is held only weakly, and
  * every access sweeps entries whose session was stopped or collected,
  * unpersisting what they cached — so stopped-session indexes don't
  * pin block-manager memory for the process lifetime.
  */
private[operators] final class SessionCache[V](onEvict: V => Unit = (_: V) => ()) {

  private final case class Entry(session: WeakReference[SparkSession], value: V)

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

  def getOrBuild(s: SparkSession, subKey: String)(build: => V): V = {
    sweep()
    entries
      .computeIfAbsent(s"${sessionId(s)}#$subKey",
        _ => Entry(new WeakReference(s), build))
      .value
  }
}
