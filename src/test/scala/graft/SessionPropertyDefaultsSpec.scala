package graft

import graft.server.SessionPropertyDefaults

/** File-shaped session property defaults: regex rule matching on
  * user/source, later-rule override, explicit-wins layering, and the
  * live server path (reference plugin/trino-session-property-managers). */
class SessionPropertyDefaultsSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  override def afterAll(): Unit = SessionPropertyDefaults.clear()

  test("rules match on user/source regex; later rules override") {
    SessionPropertyDefaults.configureJson(
      """[
        {"user": ".*", "sessionProperties": {"query_max_memory": "1GB", "a": "base"}},
        {"user": "etl_.*", "sessionProperties": {"query_max_memory": "8GB"}},
        {"source": "dashboard", "sessionProperties": {"a": "dash"}}
      ]""")
    assert(SessionPropertyDefaults("alice", None, Map.empty) ==
      Map("query_max_memory" -> "1GB", "a" -> "base"))
    assert(SessionPropertyDefaults("etl_nightly", None, Map.empty)("query_max_memory") == "8GB")
    assert(SessionPropertyDefaults("alice", Some("dashboard"), Map.empty)("a") == "dash")
  }

  test("explicit request properties always win over defaults") {
    SessionPropertyDefaults.configureJson(
      """[{"user": ".*", "sessionProperties": {"k": "default"}}]""")
    assert(SessionPropertyDefaults("u", None, Map("k" -> "explicit"))("k") == "explicit")
  }

  test("server applies defaults to the session; SHOW SESSION sees them") {
    SessionPropertyDefaults.configureJson(
      """[{"user": "graft", "sessionProperties": {"task_concurrency": "7"}}]""")
    val handle = server.StatementServer.start(spark, sfDir)
    try {
      val result = client.StatementClient.execute(handle.uri, "SHOW SESSION")
      val row = result.rows.find(_.head == "task_concurrency")
      assert(row.exists(_.contains("7")),
        s"expected defaulted task_concurrency=7, got: $row")
    } finally {
      SessionPropertyDefaults.clear()
      handle.stop()
    }
  }
}
