package graft.pipelines

import java.nio.file.{Files, Path}
import graft.SparkSuiteBase
import graft.sources.FileQueue

/** Fixture-driven tests of the four reference pipelines (FIXTURES.md §B):
  * fully populated docs, omitted sub-trees, empty arrays, unknown
  * statistics keys, and the absent-OnFileDate case. */
class RefPipelinesSpec extends SparkSuiteBase {

  private def writeDoc(dir: Path, name: String, body: String): Unit =
    Files.writeString(dir.resolve(name), body)

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft-fixtures")
    writeDoc(dir, "ACCT42_bank_scrape.json",
      """{
        |  "name": "Jane Doe",
        |  "complete_datetime": "2019-10-03 14:30:15",
        |  "institution": "First Bank",
        |  "contacts": [{"cname": "John", "phone": "555"},
        |               {"cname": "Mary", "phone": "556"}],
        |  "accounts": [
        |    {"account": "ACC12345678",
        |     "statistics": {"mean_closing_balance": 100.5,
        |                    "mean_closing_balance_30": 90.25,
        |                    "future_metric": 1.0},
        |     "transactions": [
        |       {"date": "2019-10-01", "amount": 5.0, "flags": ["a", "b"]},
        |       {"date": "2019-10-02", "amount": -3.0, "flags": []}]},
        |    {"account": "ACC99999999",
        |     "statistics": {"mean_closing_balance": 7.0},
        |     "transactions": [
        |       {"date": "2019-10-01", "amount": 1.0, "flags": ["x"]}]}
        |  ]
        |}""".stripMargin)
    writeDoc(dir, "NOACC_bank_scrape.json",
      """{"name": "No Accounts", "complete_datetime": "2019-01-01 00:00:00"}""")
    writeDoc(dir, "CR77_credit_report.json",
      """{
        |  "Date": "20191003", "Time": "143015", "MemberCode": "MBR9",
        |  "product": "basic",
        |  "TU_FFR_Report": [
        |    {"Hit": true, "OnFileDate": "2015-01-01",
        |     "Names": {"FirstName": "Jane", "LastName": "Doe"},
        |     "Trades": [{"trade_id": 1, "balance": 10.0},
        |                {"trade_id": 2, "balance": 20.0}],
        |     "Bankruptcies": [],
        |     "CreditSummary": {"score": 700, "utilization": 0.3},
        |     "Inquiries": [{"inq_id": 5}]}
        |  ]
        |}""".stripMargin)
    writeDoc(dir, "REC1_action.json",
      """{"action": "call", "priority": "high", "CreatedOnDate": "2019-10-03"}""")
    writeDoc(dir, "combined_doc.json",
      """{
        |  "SalesforceID": "SF001", "CreatedOnDate": "2019-10-02",
        |  "CustomerInformation": {"FirstName": "Ann", "LastName": "Lee", "age": 30},
        |  "BankScrapeData": {
        |    "name": "Ann L.",
        |    "institution": "Second Bank",
        |    "contacts": [{"cname": "Bob", "phone": "777"}],
        |    "accounts": [
        |      {"account": "ACC00000001",
        |       "statistics": {"mean_closing_balance": 55.0},
        |       "transactions": [{"date": "2019-09-30", "amount": 9.0,
        |                         "flags": ["f1"]}]}]},
        |  "CreditReportData": {
        |    "MemberCode": "MBR1",
        |    "TU_FFR_Report": [
        |      {"Hit": false,
        |       "Trades": [{"trade_id": 7, "balance": 70.0}],
        |       "CreditSummary": {"score": 650, "utilization": 0.5}}]},
        |  "Recommendations": [{"rec": "approve", "score": 0.9},
        |                      {"rec": "review", "score": 0.4}]
        |}""".stripMargin)
    writeDoc(dir, "combined_nocredit.json",
      """{
        |  "SalesforceID": "SF002", "CreatedOnDate": "2019-10-05",
        |  "CustomerInformation": {"FirstName": "Zed", "LastName": "Q", "age": 41}
        |}""".stripMargin)
    dir.toString
  }

  private lazy val tables = Router.route(spark, fixtureDir)

  test("router dispatches all four form families") {
    assert(tables.contains("reccomendation_action"))  // recpipe
    assert(tables.contains("bank_scrape_info"))       // bankpipe
    assert(tables.contains("base_credit"))            // creditpipe
    assert(tables.contains("master_table"))           // jsonpipe
  }

  test("recpipe attaches sf_id from filename (reference bug fixed)") {
    val rows = tables("reccomendation_action").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("SF_ID") == "REC1")
  }

  test("bankpipe masks account numbers with char-slice intent (P8)") {
    val acc = tables("bank_account").collect()
    val masks = acc.map(r => r.getAs[String]("account") -> r.getAs[String]("mask_id")).toMap
    assert(masks("ACC12345678") == "XXXX12345678")
    assert(masks("ACC99999999") == "XXXX99999999")
  }

  test("bankpipe extracts whitelisted statistics keys, ignores unknown (P7)") {
    val acc = tables("bank_account").collect()
      .map(r => r.getAs[String]("account") ->
        (r.getAs[Any]("mean_close"), r.getAs[Any]("mean_close_30"))).toMap
    assert(acc("ACC12345678") == ((100.5, 90.25)))
    assert(acc("ACC99999999") == ((7.0, null))) // absent key -> null, P12
    assert(!tables("bank_account").columns.contains("future_metric"))
  }

  test("bankpipe explodes transactions with parent keys (P6) and stringifies flags (P11)") {
    val txn = tables("transactions").collect()
    assert(txn.length == 4) // 3 from bankpipe + 1 from jsonpipe (union-append)
    val t = txn.find(_.getAs[Double]("amount") == 5.0).get
    assert(t.getAs[String]("account_id") == "ACC12345678")
    assert(t.getAs[String]("mask_id") == "XXXX12345678")
    assert(t.getAs[String]("sf_id") == "ACCT42")
    assert(t.getAs[String]("flags") == """["a","b"]""")
  }

  test("omitted accounts sub-tree contributes no child rows but keeps the doc (P17)") {
    val info = tables("bank_scrape_info").collect()
    assert(info.map(_.getAs[String]("SF_ID")).toSet == Set("ACCT42", "NOACC", "SF001"))
    val accSf = tables("bank_account").collect().map(_.getAs[String]("SF_ID")).toSet
    assert(accSf == Set("ACCT42", "SF001")) // NOACC contributes none
  }

  test("creditpipe reassembles Date+Time by slicing (P10)") {
    val base = tables("base_credit").collect()
    assert(base.length == 2) // CR77 (creditpipe) + SF001 (jsonpipe); SF002 filtered
    val cr77 = base.find(_.getAs[String]("MemberCode") == "MBR9").get
    assert(cr77.getAs[String]("Report_Date") == "2019-10-03 14:30:15")
    assert(cr77.getAs[Boolean]("TU_FFR_HIT"))
    assert(cr77.getAs[String]("FFR_filedate") == "2015-01-01")
  }

  test("creditpipe builds sub-tables; empty arrays yield no table (explode semantics)") {
    val trades = tables("trades").collect()
    assert(trades.length === 3) // 2 standalone + 1 from the combined doc
    assert(trades.map(_.getAs[Long]("trade_id")).toSet == Set(1L, 2L, 7L))
    // creditpipe rows carry Credit_Member_ID; jsonpipe rows carry SF_ID
    assert(trades.count(_.getAs[String]("Credit_Member_ID") == "MBR9") == 2)
    assert(trades.count(_.getAs[String]("SF_ID") == "SF001") == 1)
    assert(!tables.contains("bankruptcy")) // [] infers no struct -> skipped
    val cs = tables("credit_summary").collect()
    assert(cs.map(_.getAs[Long]("score")).toSet == Set(700L, 650L))
  }

  test("jsonpipe coalesces customer name and member id with fallbacks (P12)") {
    val master = tables("master_table").collect()
    val byId = master.map(r => r.getAs[String]("SalesforceID") -> r).toMap
    assert(byId("SF001").getAs[String]("name") == "Ann L.") // bank name wins
    assert(byId("SF002").getAs[String]("name") == "Zed Q")  // fallback chain
    assert(byId("SF001").getAs[String]("Credit_Member_ID") == "MBR1")
    assert(byId("SF002").getAs[String]("Credit_Member_ID") == "Not found")
  }

  test("jsonpipe drops nested payloads from master (P2) and splats customer_info (P15)") {
    val cols = tables("master_table").columns.toSet
    assert(!cols.contains("BankScrapeData") && !cols.contains("CreditReportData"))
    val ci = tables("customer_info").collect()
    assert(ci.map(_.getAs[Long]("age")).toSet == Set(30L, 41L))
  }

  test("jsonpipe explodes recommendations (P5)") {
    val recs = tables("reccomendations").collect()
    assert(recs.length == 2)
    assert(recs.map(_.getAs[String]("rec")).toSet == Set("approve", "review"))
  }

  test("creditpipe tolerates absent OnFileDate with null fallback (P12, P:175-178)") {
    val dir = Files.createTempDirectory("graft-nofiledate")
    writeDoc(dir, "NOFD_credit_report.json",
      """{"Date": "20200101", "Time": "010203", "MemberCode": "M1",
        |"TU_FFR_Report": [{"Hit": false,
        |  "Trades": [{"trade_id": 9, "balance": 1.0}]}]}""".stripMargin)
    val out = Router.route(spark, dir.toString)
    val base = out("base_credit").collect()
    assert(base.length == 1)
    assert(base.head.getAs[String]("FFR_filedate") == null) // np.nan analogue
    assert(!base.head.getAs[Boolean]("TU_FFR_HIT"))
    assert(out("trades").count() == 1)
  }

  test("corrupt JSON doc is skipped per-doc, not null-filled (P17)") {
    val dir = Files.createTempDirectory("graft-corrupt")
    writeDoc(dir, "GOOD1_action.json",
      """{"action": "call", "priority": "low", "CreatedOnDate": "2020-02-02"}""")
    writeDoc(dir, "BAD1_action.json",
      """{"action": "call", "priority": }""") // malformed
    writeDoc(dir, "ok_doc.json", """{"SalesforceID": "SFOK"}""")
    writeDoc(dir, "broken_doc.json", """not json at all {{{""")
    val out = Router.route(spark, dir.toString)
    // exactly the valid action doc's row; the corrupt one contributes
    // nothing (no null-filled row)
    val recs = out("reccomendation_action").collect()
    assert(recs.length == 1)
    assert(recs.head.getAs[String]("SF_ID") == "GOOD1")
    val master = out("master_table").collect()
    assert(master.length == 1)
    assert(master.head.getAs[String]("SalesforceID") == "SFOK")
    // count()-only path: column pruning once left only the internal
    // corrupt-record column referenced, which raw-JSON queries reject —
    // DROPMALFORMED has no such column to prune down to
    assert(out("master_table").count() == 1)
    assert(out("reccomendation_action").count() == 1)
  }

  test("all-corrupt form family is skipped wholesale (P17)") {
    val dir = Files.createTempDirectory("graft-allcorrupt")
    writeDoc(dir, "X_bank_scrape.json", """{"name": oops""")
    writeDoc(dir, "ok_doc.json", """{"SalesforceID": "SF9"}""")
    val out = Router.route(spark, dir.toString)
    assert(!out.contains("bank_scrape_info"))
    assert(out("master_table").count() == 1)
  }

  test("routeManaged releases every persisted source on release()") {
    val dir = Files.createTempDirectory("graft-managed")
    writeDoc(dir, "M1_action.json", """{"action": "x"}""")
    writeDoc(dir, "m_doc.json", """{"SalesforceID": "SFM"}""")
    spark.sharedState.cacheManager.clearCache()
    val routed = Router.routeManaged(spark, dir.toString)
    routed.tables.values.foreach(_.count())
    assert(!spark.sharedState.cacheManager.isEmpty, "sources should be cached")
    routed.release()
    assert(spark.sharedState.cacheManager.isEmpty,
      "release() must unpersist every parsed source")
  }

  test("file queue consume-then-archive moves files only on commit (S6)") {
    val in = Files.createTempDirectory("graft-queue")
    val archive = in.resolve("archive")
    writeDoc(in, "one_action.json", """{"a": 1}""")
    writeDoc(in, "two_action.json", """{"a": 2}""")
    writeDoc(in, "bad_action.json", """{"a": [broken""")
    val (df, commit) = FileQueue.consumeBatch(spark, in.toString, archive.toString)
    assert(df.count() == 2) // count()-only on a batch containing a corrupt doc
    assert(Files.list(in).filter(_.toString.endsWith(".json")).count() == 3)
    commit()
    assert(Files.list(in).filter(_.toString.endsWith(".json")).count() == 0)
    assert(Files.list(archive).count() == 3) // corrupt file archived too
  }
}
