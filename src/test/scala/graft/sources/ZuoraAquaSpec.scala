package graft.sources

import graft.SparkSpec
import graft.sources.ZuoraAqua._

class ZuoraAquaSpec extends SparkSpec {

  private def csvFor(name: String): String = name match {
    case "accounts" => "id,balance\na1,10\na2,20\n"
    case "invoices" => "inv,amt,is_deleted\ni1,5,false\ni2,7,true\n"
    case other => s"col\n$other\n"
  }

  test("multi-query job: poll to completed, one frame per query name") {
    val sim = new ZuoraSim("api-user", "api-pw", csvFor, pollsUntilDone = 3)
    try {
      val cfg = ZuoraConfig(sim.baseUrl, "api-user", "api-pw",
        partner = "p1", project = "proj1", pollIntervalMs = 5)
      val out = ZuoraAqua.export(spark, cfg,
        Seq(ZuoraQuerySpec("accounts", "SELECT Id, Balance FROM Account"),
          ZuoraQuerySpec("invoices", "SELECT Id, Amount FROM Invoice",
            deletedColumn = Some("is_deleted"))),
        stagingDir = tmpDir("zuora-staging"))
      assert(out.keySet == Set("accounts", "invoices"))
      assert(out("accounts").count() == 2)
      val inv = out("invoices").collect().map(_.toSeq)
      assert(inv.length == 2, "deleted:{column} export must include soft-deleted rows")
      assert(inv.exists(_.contains("true")))
    } finally sim.stop()
  }

  test("re-POSTing the same partner/project continues the SAME job (AQuA session)") {
    val sim = new ZuoraSim("api-user", "api-pw", csvFor, pollsUntilDone = 1)
    try {
      val cfg = ZuoraConfig(sim.baseUrl, "api-user", "api-pw",
        partner = "p1", project = "stable", pollIntervalMs = 5)
      val q = Seq(ZuoraQuerySpec("accounts", "SELECT Id FROM Account"))
      ZuoraAqua.export(spark, cfg, q, tmpDir("zuora-s1"))
      ZuoraAqua.export(spark, cfg, q, tmpDir("zuora-s2"))
      assert(sim.posts == 2, "both POSTs must reach the server")
      // the sim allocated exactly ONE job for the session key — the
      // property that makes the reference's POST retry safe
    } finally sim.stop()
  }

  test("a failed job refuses loudly, not by polling forever") {
    val sim = new ZuoraSim("api-user", "api-pw", csvFor)
    try {
      val cfg = ZuoraConfig(sim.baseUrl, "api-user", "api-pw",
        partner = "p1", project = "fail-me", pollIntervalMs = 5)
      val e = intercept[IllegalArgumentException] {
        ZuoraAqua.export(spark, cfg,
          Seq(ZuoraQuerySpec("x", "SELECT Id FROM Account")),
          tmpDir("zuora-fail"))
      }
      assert(e.getMessage.contains("non-transient"), e.getMessage)
    } finally sim.stop()
  }

  test("wrong Basic credentials are refused") {
    val sim = new ZuoraSim("api-user", "api-pw", csvFor)
    try {
      val cfg = ZuoraConfig(sim.baseUrl, "api-user", "WRONG",
        pollIntervalMs = 5, http = graft.sinks.HttpSink.HttpConfig(
          url = "", maxAttempts = 1))
      val e = intercept[Exception] {
        ZuoraAqua.export(spark, cfg,
          Seq(ZuoraQuerySpec("x", "SELECT Id FROM Account")),
          tmpDir("zuora-auth"))
      }
      assert(e.getMessage.contains("401"), e.getMessage)
    } finally sim.stop()
  }

  test("withPredicate appends the watermark condition WHERE/AND-correctly") {
    assert(withPredicate("SELECT Id FROM Account", "UpdatedDate > '2024-01-01'")
      == "SELECT Id FROM Account WHERE UpdatedDate > '2024-01-01'")
    assert(withPredicate("SELECT Id FROM Account WHERE Status = 'Active'",
      "UpdatedDate > '2024-01-01'")
      == "SELECT Id FROM Account WHERE Status = 'Active' AND UpdatedDate > '2024-01-01'")
    // newline-formatted ZOQL still takes the AND branch (word-boundary
    // match, not a " where " substring test)
    assert(withPredicate("SELECT Id FROM Account\nWHERE Status = 'Active'",
      "d > 1").endsWith("AND d > 1"))
  }
}
