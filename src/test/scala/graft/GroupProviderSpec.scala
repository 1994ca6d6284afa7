package graft

import graft.sqlx.{AccessDeniedException, Groups, SessionContext, TrinoDialect}

/** Group provider (reference FileBasedGroupProvider /
  * plugin/trino-ldap-group-provider): grants to a GROUP take effect for
  * its members; membership is resolved per identity by the configured
  * provider; no provider = identity-only (the previous behavior). */
class GroupProviderSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  override def afterAll(): Unit = Groups.clear()

  private def sql(text: String) = TrinoDialect.sql(spark, sfDir, text)
  private def as[A](user: String)(f: => A): A =
    SessionContext.within(SessionContext.Ctx(
      user = Some(user), enforce = true))(f)

  test("file provider: group grants flow to members, non-members denied") {
    sql("CREATE OR REPLACE TABLE grp_t AS SELECT n_nationkey AS k FROM nation")
    sql("GRANT SELECT ON grp_t TO analysts")
    val f = java.nio.file.Files.createTempFile("graft-groups", ".txt")
    java.nio.file.Files.writeString(f,
      """# group file (reference format: group:user1,user2)
        |analysts:ana,arturo
        |admins:root
        |""".stripMargin)
    Groups.configureFile(f.toString)
    try {
      // member reads through the group grant
      val n = as("ana")(sql("SELECT count(*) AS n FROM grp_t"))
        .collect().head.getLong(0)
      assert(n == 25L)
      // non-member with no direct grant: denied
      intercept[AccessDeniedException] {
        as("zoe")(sql("SELECT count(*) AS n FROM grp_t").collect())
      }
      // membership grants SELECT only — writes still denied
      intercept[AccessDeniedException] {
        as("ana")(sql("INSERT INTO grp_t VALUES (99)"))
      }
    } finally Groups.clear()
  }

  test("without a provider, group grants are inert names") {
    sql("CREATE OR REPLACE TABLE grp_t2 AS SELECT 1 AS v")
    sql("GRANT SELECT ON grp_t2 TO analysts")
    intercept[AccessDeniedException] {
      as("ana")(sql("SELECT v FROM grp_t2").collect())
    }
  }
}
