package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Resource-group admission on the statement server: hardConcurrencyLimit
  * serializes, maxQueued bounds the queue, overflow fails with
  * QUERY_QUEUE_FULL, and selectors route by the user header (reference
  * InternalResourceGroup + resource-group-managers semantics). */
class ResourceGroupSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  // ad-hoc blocking function so concurrency is deterministic (test-only UDF)
  spark.udf.register("spec_block_ms", (ms: Long) => { Thread.sleep(ms); ms })

  private lazy val handle = server.StatementServer.start(spark, sfDir,
    resourceGroups = Some(server.ResourceGroups.Config(Seq(
      server.ResourceGroups.Group("etl", hardConcurrencyLimit = 1,
        maxQueued = 1, userPattern = "etl-.*"),
      server.ResourceGroups.Group("adhoc", hardConcurrencyLimit = 4,
        maxQueued = 10, userPattern = ".*")))))

  override def afterAll(): Unit = handle.stop()

  test("limit 1 + maxQueued 1: third concurrent submission is QUEUE_FULL") {
    val pool = Executors.newFixedThreadPool(3)
    val started = new CountDownLatch(2)
    def submit() = pool.submit(new java.util.concurrent.Callable[String] {
      override def call(): String = {
        started.countDown()
        try {
          client.StatementClient.execute(handle.uri,
            "SELECT spec_block_ms(1500) AS v", user = "etl-nightly")
          "ok"
        } catch {
          case e: client.StatementClient.StatementFailed => e.getMessage
        }
      }
    })
    val f1 = submit(); val f2 = submit()
    started.await(5, TimeUnit.SECONDS)
    Thread.sleep(400) // both submissions admitted: 1 running + 1 queued
    val f3 = pool.submit(new java.util.concurrent.Callable[String] {
      override def call(): String =
        try {
          client.StatementClient.execute(handle.uri,
            "SELECT spec_block_ms(1500) AS v", user = "etl-nightly")
          "ok"
        } catch {
          case e: client.StatementClient.StatementFailed => e.getMessage
        }
    })
    val r3 = f3.get(30, TimeUnit.SECONDS)
    assert(r3.contains("Too many queued queries"), r3)
    // the admitted two both finish (queued one runs after the slot frees)
    assert(f1.get(60, TimeUnit.SECONDS) == "ok")
    assert(f2.get(60, TimeUnit.SECONDS) == "ok")
    pool.shutdownNow()
  }

  test("selectors route by user: adhoc group runs 2 concurrently") {
    // both queries must be INSIDE the function at the same moment to pass
    // the barrier — serialized execution times out and fails the queries
    spark.udf.register("spec_rendezvous", (_: Long) => {
      ResourceGroupSpec.rendezvous.await(20, TimeUnit.SECONDS); 1L
    })
    val pool = Executors.newFixedThreadPool(2)
    def submit() = pool.submit(new java.util.concurrent.Callable[String] {
      override def call(): String = {
        client.StatementClient.execute(handle.uri,
          "SELECT spec_rendezvous(1) AS v", user = "alice")
        "ok"
      }
    })
    val f1 = submit(); val f2 = submit()
    assert(f1.get(60, TimeUnit.SECONDS) == "ok")
    assert(f2.get(60, TimeUnit.SECONDS) == "ok")
    pool.shutdownNow()
  }

  test("unconfigured server admits everything (no manager)") {
    val h2 = server.StatementServer.start(spark, sfDir)
    try {
      val r = client.StatementClient.execute(h2.uri, "SELECT 1 AS one")
      assert(r.rows == Vector(Vector(1L)))
    } finally h2.stop()
  }
}

object ResourceGroupSpec {
  // shared by the two concurrently-running queries' UDF invocations
  val rendezvous = new java.util.concurrent.CyclicBarrier(2)
}
