package graft.server

import java.util.concurrent.ConcurrentHashMap

/** JVM-wide registry of live server statements, so SQL text can reach them
  * (reference: the system connector's KillQueryProcedure resolves query
  * ids against the coordinator's QueryManager). StatementServer registers
  * a cancellation hook per accepted statement; `CALL
  * system.runtime.kill_query(id)` — issued through ANY front door on this
  * JVM — fires it. */
object QueryRegistry {

  private val hooks = new ConcurrentHashMap[String, () => Boolean]()

  /** `cancel` reports whether a LIVE statement actually transitioned to
    * cancelled (a finished/failed result is never clobbered). */
  private[server] def register(id: String, cancel: () => Boolean): Unit =
    hooks.put(id, cancel)

  /** Fire the cancel hook; false when the id is unknown or already done. */
  def kill(id: String): Boolean = Option(hooks.get(id)).exists(_.apply())

  /** Evict a terminal statement's hook (StatementServer's post-grace
    * cleanup) — the registry is bounded by live + recently-finished ids. */
  private[server] def unregister(id: String): Unit = hooks.remove(id)
}
