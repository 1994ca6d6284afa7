package graft.server

import java.util.concurrent.Semaphore
import java.util.concurrent.atomic.AtomicInteger

/** Resource-group admission control (reference: core/trino-main
  * io.trino.execution.resourcegroups.InternalResourceGroup — a group tree
  * with `hardConcurrencyLimit` running slots and `maxQueued` waiting
  * slots; plugin/trino-resource-group-managers configures groups +
  * selectors; over-queue submissions fail with QUERY_QUEUE_FULL). Flat
  * subset (documented): one level of groups, selectors match the
  * protocol's user header by regex, first match wins, last group is the
  * conventional catch-all `.*`.
  *
  * Queued statements hold an executor thread while they wait (the server's
  * pool is the scheduler in this single-JVM build) — maxQueued across
  * groups should stay below the pool size; the reference instead parks
  * queued queries off-thread, which matters at coordinator scale but not
  * for a loopback fixture server. */
object ResourceGroups {

  final case class Group(name: String, hardConcurrencyLimit: Int,
      maxQueued: Int, userPattern: String = ".*") {
    require(hardConcurrencyLimit > 0, s"group $name: hardConcurrencyLimit < 1")
    require(maxQueued >= 0, s"group $name: maxQueued < 0")
  }

  final case class Config(groups: Seq[Group]) {
    require(groups.nonEmpty, "no resource groups configured")
    def select(user: String): Option[Group] =
      groups.find(g => user.matches(g.userPattern))
  }

  sealed trait Admission
  /** Run immediately (slot already acquired). */
  final case class RunNow(group: Group) extends Admission
  /** Admitted to the queue: call [[Manager.await]] on the execution thread. */
  final case class Queue(group: Group) extends Admission
  final case class Reject(message: String) extends Admission

  /** Per-group live state: a fair semaphore holds the running slots,
    * `queued` counts waiters admitted to the queue. */
  final class Manager(val config: Config) {
    private val slots = config.groups.map(g =>
      g.name -> new Semaphore(g.hardConcurrencyLimit, true)).toMap
    private val queued = config.groups.map(g => g.name -> new AtomicInteger(0)).toMap

    def admit(user: String): Admission = config.select(user) match {
      case None => Reject(s"no resource group matches user '$user'")
      case Some(g) => synchronized {
        if (slots(g.name).tryAcquire()) RunNow(g)
        else if (queued(g.name).get() < g.maxQueued) {
          queued(g.name).incrementAndGet()
          Queue(g)
        } else Reject(
          s"Too many queued queries for resource group '${g.name}' " +
            s"(maxQueued ${g.maxQueued})") // reference: QUERY_QUEUE_FULL
      }
    }

    /** Block until a running slot frees (queued admissions only). */
    def await(a: Queue): Unit = {
      slots(a.group.name).acquire()
      queued(a.group.name).decrementAndGet()
    }

    /** Release the running slot when the statement reaches terminal state. */
    def release(group: Group): Unit = slots(group.name).release()

    def runningOf(name: String): Int =
      config.groups.find(_.name == name).map(g =>
        g.hardConcurrencyLimit - slots(name).availablePermits()).getOrElse(0)
    def queuedOf(name: String): Int = queued(name).get()
  }
}
