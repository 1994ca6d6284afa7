package graft.server

import java.util.concurrent.atomic.AtomicReference

/** Session property defaults (reference:
  * plugin/trino-session-property-managers — the file-based
  * SessionPropertyConfigurationManager matches ordered rules against the
  * request's identity (user / source / client tags regexes) and applies
  * each matching rule's `sessionProperties` as DEFAULTS; explicit
  * `X-Trino-Session` values always win; later rules override earlier
  * ones for the same key).
  *
  * Configured programmatically or from the same JSON shape the reference
  * reads: `[{"user": "<regex>", "source": "<regex>",
  * "sessionProperties": {"k": "v", …}}, …]`. */
object SessionPropertyDefaults {

  final case class Rule(user: Option[String], source: Option[String],
      sessionProperties: Map[String, String]) {
    def matches(u: String, src: Option[String]): Boolean =
      user.forall(rx => u.matches(rx)) &&
        source.forall(rx => src.exists(_.matches(rx)))
  }

  private val rules = new AtomicReference[Vector[Rule]](Vector.empty)

  def configure(rs: Seq[Rule]): Unit = rules.set(rs.toVector)
  def clear(): Unit = rules.set(Vector.empty)

  /** Parse the reference's JSON rule file shape. */
  def configureJson(json: String): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val JArray(rs) = JsonMethods.parse(json): @unchecked
    configure(rs.map { r =>
      def str(k: String): Option[String] = (r \ k) match {
        case JString(s) => Some(s)
        case _ => None
      }
      val props = (r \ "sessionProperties") match {
        case JObject(o) => o.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty[String, String]
      }
      Rule(str("user"), str("source"), props)
    })
  }

  /** Defaults for this request, in rule order (later wins), with the
    * request's explicit properties layered ON TOP (explicit always wins —
    * the reference contract). */
  def apply(user: String, source: Option[String],
      explicit: Map[String, String]): Map[String, String] = {
    val defaults = rules.get()
      .filter(_.matches(user, source))
      .foldLeft(Map.empty[String, String])(_ ++ _.sessionProperties)
    defaults ++ explicit
  }
}
