package graft.sqlx

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Group provider (reference: the file group provider at
  * lib/trino-plugin-toolkit io/trino/plugin/base/security/
  * FileBasedGroupProvider and plugin/trino-ldap-group-provider — a
  * configured provider resolves each identity's groups, and access
  * control evaluates privileges against the user AND every group they
  * belong to).
  *
  * Format of the file provider (the reference's): one line per group,
  * `group_name:user1,user2,…`; blank lines and `#` comments ignored.
  * GRANT already accepts any grantee name, so granting to a group is
  * just `GRANT SELECT ON t TO analysts` — membership makes it effective. */
private[graft] object Groups {

  @volatile private var provider: Option[String => Set[String]] = None

  /** Install a resolver (user → groups). */
  def configure(f: String => Set[String]): Unit = provider = Some(f)

  /** Install the file provider: the file is parsed once (call again to
    * refresh, like the reference's refresh period). */
  def configureFile(path: String): Unit = {
    val byGroup = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8)
      .asScala.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        val Array(g, members) = line.split(":", 2)
        g.trim -> members.split(",").map(_.trim).filter(_.nonEmpty).toSet
      }.toSeq
    val byUser: Map[String, Set[String]] = byGroup
      .flatMap { case (g, users) => users.map(_ -> g) }
      .groupBy(_._1).map { case (u, gs) => u -> gs.map(_._2).toSet }
    provider = Some(u => byUser.getOrElse(u, Set.empty))
  }

  def clear(): Unit = provider = None

  /** The identity's groups, empty when no provider is installed. */
  def groupsOf(user: String): Set[String] =
    provider.map(_(user)).getOrElse(Set.empty)
}
