package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.server.StatementServer

/** Authentication + grant enforcement on the statement endpoint
  * (reference: password-file authenticator plugin; AccessControlManager
  * dispatching table accesses to the configured access control — two
  * users, one granted, one denied with the PERMISSION_DENIED shape). */
class SecuritySpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val handle = StatementServer.start(spark, sfDir,
    security = Some(StatementServer.Security(
      enforceGrants = true,
      admins = Set("admin"),
      passwords = Some(Map(
        "admin" -> StatementServer.Security.sha256Hex("s3cret"),
        "alice" -> StatementServer.Security.sha256Hex("pw-a"),
        "bob" -> StatementServer.Security.sha256Hex("pw-b"))))))
  private lazy val http = HttpClient.newHttpClient()

  override def afterAll(): Unit = handle.stop()

  private def basic(user: String, pass: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$user:$pass".getBytes("UTF-8"))

  /** POST + poll to completion; returns (finalState, errorName, errorMsg). */
  private def run(sql: String, auth: Option[(String, String)]):
      (String, Option[String], Option[String]) = {
    val b = HttpRequest.newBuilder(URI.create(s"${handle.uri}/v1/statement"))
      .POST(HttpRequest.BodyPublishers.ofString(sql))
    auth.foreach { case (u, p) => b.header("Authorization", basic(u, p)) }
    var resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200, s"${resp.statusCode()} ${resp.body()}")
    var json = JsonMethods.parse(resp.body())
    var spins = 0
    while (true) {
      (json \ "error") match {
        case JObject(_) =>
          val JString(m) = (json \ "error" \ "message"): @unchecked
          val name = json \ "error" \ "errorName" match {
            case JString(n) => Some(n)
            case _ => None
          }
          return ("FAILED", name, Some(m))
        case _ =>
      }
      json \ "nextUri" match {
        case JString(next) =>
          spins += 1
          assert(spins < 400, s"statement did not finish: $sql")
          Thread.sleep(25)
          resp = http.send(HttpRequest.newBuilder(
            URI.create(s"${handle.uri}$next")).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          json = JsonMethods.parse(resp.body())
        case _ => return ("FINISHED", None, None)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  test("unauthenticated and wrong-password requests are 401") {
    for (auth <- Seq(None, Some("Basic " + java.util.Base64.getEncoder
        .encodeToString("alice:WRONG".getBytes("UTF-8"))))) {
      val b = HttpRequest.newBuilder(URI.create(s"${handle.uri}/v1/statement"))
        .POST(HttpRequest.BodyPublishers.ofString("SELECT 1"))
      auth.foreach(a => b.header("Authorization", a))
      val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 401, resp.body())
      assert(resp.headers().firstValue("WWW-Authenticate").isPresent)
    }
  }

  test("X-Trino-User conflicting with the authenticated identity is 403") {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"${handle.uri}/v1/statement"))
        .header("Authorization", basic("alice", "pw-a"))
        .header("X-Trino-User", "bob")
        .POST(HttpRequest.BodyPublishers.ofString("SELECT 1")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 403, resp.body())
  }

  test("grants gate SELECT: granted user reads, ungranted user is denied") {
    // admin (unenforced) materializes a table and grants alice SELECT
    val (s1, _, e1) = run(
      "CREATE OR REPLACE TABLE sec_t1 AS SELECT n_nationkey AS k FROM nation",
      Some("admin" -> "s3cret"))
    assert(s1 == "FINISHED", e1)
    assert(run("GRANT SELECT ON sec_t1 TO alice",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    // alice: granted
    val (sa, _, ea) = run("SELECT count(*) AS n FROM sec_t1",
      Some("alice" -> "pw-a"))
    assert(sa == "FINISHED", ea)
    // bob: denied with the reference's shape
    val (sb, nameB, msgB) = run("SELECT count(*) AS n FROM sec_t1",
      Some("bob" -> "pw-b"))
    assert(sb == "FAILED")
    assert(nameB.contains("PERMISSION_DENIED"), nameB)
    assert(msgB.exists(_.startsWith("Access Denied")), msgB)
    // ...and bob cannot read the fixture tables either (deny-by-default)
    val (sn, nameN, _) = run("SELECT count(*) AS n FROM nation",
      Some("bob" -> "pw-b"))
    assert(sn == "FAILED" && nameN.contains("PERMISSION_DENIED"))
  }

  test("ownership: creator writes freely, non-owner writes need a grant") {
    // alice creates (and so owns) a table
    assert(run("CREATE OR REPLACE TABLE sec_alice AS SELECT 1 AS v",
      Some("alice" -> "pw-a"))._1 == "FINISHED")
    assert(run("INSERT INTO sec_alice VALUES (2)",
      Some("alice" -> "pw-a"))._1 == "FINISHED")
    // bob: denied INSERT, denied DROP
    val (si, ni, _) = run("INSERT INTO sec_alice VALUES (3)",
      Some("bob" -> "pw-b"))
    assert(si == "FAILED" && ni.contains("PERMISSION_DENIED"))
    val (sd, nd, _) = run("DROP TABLE sec_alice", Some("bob" -> "pw-b"))
    assert(sd == "FAILED" && nd.contains("PERMISSION_DENIED"))
    // alice grants INSERT (owner may grant); bob can then insert but
    // still cannot SELECT
    assert(run("GRANT INSERT ON sec_alice TO bob",
      Some("alice" -> "pw-a"))._1 == "FINISHED")
    assert(run("INSERT INTO sec_alice VALUES (3)",
      Some("bob" -> "pw-b"))._1 == "FINISHED")
    val (ss, ns, _) = run("SELECT v FROM sec_alice", Some("bob" -> "pw-b"))
    assert(ss == "FAILED" && ns.contains("PERMISSION_DENIED"))
    // bob may not grant on alice's table
    val (sg, ng, _) = run("GRANT SELECT ON sec_alice TO bob",
      Some("bob" -> "pw-b"))
    assert(sg == "FAILED" && ng.contains("PERMISSION_DENIED"))
  }

  test("DENY overrides grant and ownership (SqlBase.g4:169, DenyTask)") {
    // granted + denied → denied wins
    assert(run("CREATE OR REPLACE TABLE sec_deny AS SELECT 1 AS v",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    assert(run("GRANT SELECT ON sec_deny TO alice",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    assert(run("SELECT v FROM sec_deny",
      Some("alice" -> "pw-a"))._1 == "FINISHED")
    assert(run("DENY SELECT ON sec_deny TO alice",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    val (s1, n1, _) = run("SELECT v FROM sec_deny", Some("alice" -> "pw-a"))
    assert(s1 == "FAILED" && n1.contains("PERMISSION_DENIED"),
      "deny did not override the grant")
    // deny overrides ownership too: bob owns the table, the deny still wins
    assert(run("CREATE OR REPLACE TABLE sec_deny_own AS SELECT 1 AS v",
      Some("bob" -> "pw-b"))._1 == "FINISHED")
    assert(run("DENY INSERT ON sec_deny_own TO bob",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    val (s2, n2, _) = run("INSERT INTO sec_deny_own VALUES (2)",
      Some("bob" -> "pw-b"))
    assert(s2 == "FAILED" && n2.contains("PERMISSION_DENIED"),
      "deny did not override ownership")
    // ...but only the denied privilege: the owner still reads
    assert(run("SELECT v FROM sec_deny_own",
      Some("bob" -> "pw-b"))._1 == "FINISHED")
    // non-owner may not DENY on someone else's table
    val (s3, n3, _) = run("DENY SELECT ON sec_deny TO bob",
      Some("alice" -> "pw-a"))
    assert(s3 == "FAILED" && n3.contains("PERMISSION_DENIED"))
  }

  test("WITH GRANT OPTION: holder may re-grant; GRANT OPTION FOR revokes only grantability") {
    assert(run("CREATE OR REPLACE TABLE sec_go AS SELECT 1 AS v",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    // alice: SELECT without option → cannot re-grant
    assert(run("GRANT SELECT ON sec_go TO alice",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    val (s1, n1, _) = run("GRANT SELECT ON sec_go TO bob", Some("alice" -> "pw-a"))
    assert(s1 == "FAILED" && n1.contains("PERMISSION_DENIED"))
    // with the option, the re-grant works and bob can read
    assert(run("GRANT SELECT ON sec_go TO alice WITH GRANT OPTION",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    assert(run("GRANT SELECT ON sec_go TO bob",
      Some("alice" -> "pw-a"))._1 == "FINISHED")
    assert(run("SELECT v FROM sec_go", Some("bob" -> "pw-b"))._1 == "FINISHED")
    // but only the privileges actually held with option
    val (s2, n2, _) = run("GRANT INSERT ON sec_go TO bob", Some("alice" -> "pw-a"))
    assert(s2 == "FAILED" && n2.contains("PERMISSION_DENIED"))
    // GRANT OPTION FOR: alice keeps SELECT but loses grantability
    assert(run("REVOKE GRANT OPTION FOR SELECT ON sec_go FROM alice",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    assert(run("SELECT v FROM sec_go", Some("alice" -> "pw-a"))._1 == "FINISHED")
    val (s3, n3, _) = run("GRANT SELECT ON sec_go TO carol", Some("alice" -> "pw-a"))
    assert(s3 == "FAILED" && n3.contains("PERMISSION_DENIED"))
  }

  test("SET SESSION AUTHORIZATION: impersonation gated on a grantable privilege") {
    import java.net.http.{HttpRequest, HttpResponse}
    // a table only alice can read
    assert(run("CREATE OR REPLACE TABLE sec_imp AS SELECT 7 AS v",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    assert(run("GRANT SELECT ON sec_imp TO alice",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    def post(sql: String, auth: (String, String),
        authzUser: Option[String]): java.net.http.HttpResponse[String] = {
      val b = HttpRequest.newBuilder(URI.create(s"${handle.uri}/v1/statement"))
        .header("Authorization", basic(auth._1, auth._2))
        .POST(HttpRequest.BodyPublishers.ofString(sql))
      authzUser.foreach(u => b.header("X-Trino-Authorization-User", u))
      http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    }
    // bob may not impersonate alice (no grant): statement AND replay denied
    assert(post("SET SESSION AUTHORIZATION alice",
      ("bob", "pw-b"), None).statusCode() == 403)
    assert(post("SELECT v FROM sec_imp",
      ("bob", "pw-b"), Some("alice")).statusCode() == 403)
    // grant the impersonation privilege; the statement now echoes the header
    assert(run("GRANT IMPERSONATE ON USER alice TO bob",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    val ok = post("SET SESSION AUTHORIZATION alice", ("bob", "pw-b"), None)
    assert(ok.statusCode() == 200, ok.body())
    assert(ok.headers().firstValue("X-Trino-Set-Authorization-User")
      .orElse("") == "alice")
    // replaying the identity, bob acts as alice (reads alice's grant)
    val (sOk, _, eOk) = {
      var resp = post("SELECT v FROM sec_imp", ("bob", "pw-b"), Some("alice"))
      assert(resp.statusCode() == 200, resp.body())
      // poll to completion through the generic runner path
      var json = JsonMethods.parse(resp.body())
      var state = "RUNNING"; var spins = 0
      var failure: Option[String] = None
      var done = false
      while (!done) {
        (json \ "error") match {
          case JObject(_) =>
            val JString(m) = (json \ "error" \ "message"): @unchecked
            state = "FAILED"; failure = Some(m); done = true
          case _ =>
            json \ "nextUri" match {
              case JString(next) =>
                spins += 1; assert(spins < 400); Thread.sleep(25)
                val r2 = http.send(HttpRequest.newBuilder(
                  URI.create(s"${handle.uri}$next")).GET().build(),
                  HttpResponse.BodyHandlers.ofString())
                json = JsonMethods.parse(r2.body())
              case _ => state = "FINISHED"; done = true
            }
        }
      }
      (state, None, failure)
    }
    assert(sOk == "FINISHED", eOk)
    // RESET SESSION AUTHORIZATION echoes the reset header
    val reset = post("RESET SESSION AUTHORIZATION", ("bob", "pw-b"), None)
    assert(reset.statusCode() == 200)
    assert(reset.headers()
      .firstValue("X-Trino-Reset-Authorization-User").isPresent)
  }

  test("admin bypasses enforcement everywhere") {
    assert(run("SELECT count(*) AS n FROM nation",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
    assert(run("INSERT INTO sec_t1 VALUES (999)",
      Some("admin" -> "s3cret"))._1 == "FINISHED")
  }

  // ---- row filters + column masks (ConnectorAccessControl.java:835,848) ---

  private def asUser(user: String)(sql: String) =
    graft.sqlx.SessionContext.within(graft.sqlx.SessionContext.Ctx(
      user = Some(user), enforce = true)) {
      graft.sqlx.TrinoDialect.sql(spark, sfDir, sql)
    }

  private def sql(text: String) = graft.sqlx.TrinoDialect.sql(spark, sfDir, text)

  /** One owned table seeded from nation, granted to the policy users. */
  private lazy val secNat: Unit = {
    sql("CREATE OR REPLACE TABLE sec_nat AS " +
      "SELECT n_nationkey, n_name, n_regionkey FROM nation")
    Seq("carol", "dave", "erin", "grace").foreach(u =>
      sql(s"GRANT SELECT ON sec_nat TO $u"))
  }

  test("row filter: filtered user sees a subset, owner sees everything") {
    secNat
    graft.sqlx.RowSecurity.setRowFilter("carol", "sec_nat", "n_regionkey = 1")
    try {
      val carol = asUser("carol")("SELECT count(*) AS n FROM sec_nat")
        .collect().head.getLong(0)
      assert(carol == 5L, s"filtered user saw $carol rows")
      // unenforced (admin / in-process) identity: unchanged
      val all = sql("SELECT count(*) AS n FROM sec_nat")
        .collect().head.getLong(0)
      assert(all == 25L)
      // the filter composes with the user's own predicates
      val both = asUser("carol")(
        "SELECT count(*) AS n FROM sec_nat WHERE n_nationkey > 10")
        .collect().head.getLong(0)
      assert(both < 5L && both > 0L)
      // joins read through the filter too
      val joined = asUser("carol")(
        """SELECT count(*) AS n FROM sec_nat a JOIN sec_nat b
           ON a.n_regionkey = b.n_regionkey""").collect().head.getLong(0)
      assert(joined == 25L) // 5 filtered rows x 5
    } finally graft.sqlx.RowSecurity.dropRowFilter("carol", "sec_nat")
  }

  test("column mask: masked user sees the mask, owner sees the value") {
    secNat
    graft.sqlx.RowSecurity.setColumnMask("dave", "sec_nat", "n_name",
      "CASE WHEN n_regionkey = 0 THEN n_name ELSE NULL END")
    try {
      val rows = asUser("dave")(
        "SELECT n_regionkey, n_name FROM sec_nat ORDER BY n_nationkey")
        .collect()
      assert(rows.length == 25) // masking hides values, not rows
      assert(rows.filter(_.getInt(0) == 0).forall(!_.isNullAt(1)))
      assert(rows.filter(_.getInt(0) != 0).forall(_.isNullAt(1)))
      // owner path unchanged
      val clear = sql("SELECT n_name FROM sec_nat").collect()
      assert(clear.forall(!_.isNullAt(0)))
    } finally graft.sqlx.RowSecurity.dropColumnMask("dave", "sec_nat", "n_name")
  }

  test("EXPLAIN under a filtered user shows the injected predicate") {
    secNat
    graft.sqlx.RowSecurity.setRowFilter("erin", "sec_nat", "n_regionkey = 2")
    try {
      val plan = asUser("erin")("EXPLAIN SELECT n_name FROM sec_nat")
        .collect().map(_.getString(0)).mkString("\n")
      assert(plan.contains("n_regionkey"), plan)
      assert(plan.contains("2"), plan)
    } finally graft.sqlx.RowSecurity.dropRowFilter("erin", "sec_nat")
  }

  test("an oracle query re-run under a filtered user returns the filtered answer") {
    sql("CREATE OR REPLACE TABLE sec_cust AS " +
      "SELECT c_custkey, c_mktsegment FROM customer")
    sql("GRANT SELECT ON sec_cust TO frank")
    graft.sqlx.RowSecurity.setRowFilter("frank", "sec_cust",
      "c_mktsegment = 'BUILDING'")
    try {
      val filtered = asUser("frank")(
        """SELECT c_mktsegment, count(*) AS n FROM sec_cust
           GROUP BY c_mktsegment ORDER BY c_mktsegment""").collect()
      assert(filtered.length == 1 && filtered.head.getString(0) == "BUILDING")
      val expected = sql(
        "SELECT count(*) AS n FROM sec_cust WHERE c_mktsegment = 'BUILDING'")
        .collect().head.getLong(0)
      assert(filtered.head.getLong(1) == expected)
    } finally graft.sqlx.RowSecurity.dropRowFilter("frank", "sec_cust")
  }

  test("CTE names shadow filtered base tables") {
    secNat
    graft.sqlx.RowSecurity.setRowFilter("grace", "sec_nat", "n_regionkey = 1")
    try {
      // `sec_nat` inside the WITH body is filtered; the CTE NAME then
      // shadows the base table, and reading it is NOT double-filtered
      val n = asUser("grace")(
        """WITH sec_nat AS (SELECT * FROM sec_nat)
           SELECT count(*) AS n FROM sec_nat""").collect().head.getLong(0)
      assert(n == 5L)
    } finally graft.sqlx.RowSecurity.dropRowFilter("grace", "sec_nat")
  }

  test("chained CTEs: later siblings see earlier CTE names, not base tables") {
    secNat
    // r12 advice: in WITH a AS (...), b AS (SELECT FROM a), the `a` inside
    // b must resolve to the CTE — a policy on a real table named `a` must
    // NOT be spliced onto the CTE output
    graft.sqlx.RowSecurity.setRowFilter("grace", "sec_nat", "n_regionkey = 1")
    try {
      val n = asUser("grace")(
        """WITH sec_nat AS (SELECT * FROM sec_nat),
                b AS (SELECT * FROM sec_nat)
           SELECT count(*) AS n FROM b""").collect().head.getLong(0)
      assert(n == 5L, s"chained CTE read $n rows (double-filter or resolution error)")
    } finally graft.sqlx.RowSecurity.dropRowFilter("grace", "sec_nat")
  }

  test("time travel reads through row filters and column masks") {
    // r12 advice (high): FOR VERSION AS OF bypassed secureRel entirely —
    // an enforced user could read every hidden row of the current version
    sql("CREATE OR REPLACE TABLE sec_tt AS " +
      "SELECT n_nationkey, n_name, n_regionkey FROM nation")
    sql("GRANT SELECT ON sec_tt TO heidi")
    graft.sqlx.RowSecurity.setRowFilter("heidi", "sec_tt", "n_regionkey = 1")
    graft.sqlx.RowSecurity.setColumnMask("heidi", "sec_tt", "n_name",
      "CAST(NULL AS VARCHAR)")
    try {
      val latestV = asUser("heidi")(
        "SELECT count(*) AS n FROM sec_tt FOR VERSION AS OF 1")
        .collect().head.getLong(0)
      assert(latestV == 5L, s"versioned read saw $latestV rows past the filter")
      val masked = asUser("heidi")(
        "SELECT n_name FROM sec_tt FOR VERSION AS OF 1").collect()
      assert(masked.nonEmpty && masked.forall(_.isNullAt(0)),
        "versioned read saw unmasked values")
      // owner path unchanged
      val all = sql("SELECT count(*) AS n FROM sec_tt FOR VERSION AS OF 1")
        .collect().head.getLong(0)
      assert(all == 25L)
    } finally {
      graft.sqlx.RowSecurity.dropRowFilter("heidi", "sec_tt")
      graft.sqlx.RowSecurity.dropColumnMask("heidi", "sec_tt", "n_name")
    }
  }
}
