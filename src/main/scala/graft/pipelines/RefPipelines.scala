package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native re-expression of the reference's four ETL pipelines
  * (`/root/reference/Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py`,
  * abbreviated `P`): recpipe `P:19-30`, bankpipe `P:33-147`, creditpipe
  * `P:154-366`, jsonpipe `P:372-763`, and the filename router
  * `P:795-805`. A user of the reference points [[Router.route]] at a
  * directory of JSON documents and gets the same ~22 flat tables.
  *
  * Design (SURVEY.md §1.3, §3): schema-at-runtime like the reference —
  * `spark.read.json` infers; every sub-tree access goes through
  * [[Tolerant]] so an absent field/table yields null columns or an
  * absent output table instead of an exception. That is the declarative
  * form of the reference's ~40 bare `try/except` sites (P17) and the
  * README's "accounts for omitted tables" (`P:12`).
  *
  * Scale: each pipeline is a handful of independent narrow plans
  * (scan -> project/explode -> sink) off ONE parsed source — no
  * shuffles at all. The reference processes one document per Python
  * loop iteration (`P:774`); here a million documents are one
  * distributed read. Callers should `.persist()` the parsed source
  * before fanning out to the ~22 sinks (the pandas `data_dict` reuse,
  * done distributed).
  *
  * Reference bugs intentionally NOT replicated (SURVEY.md §2a):
  * P8 vectorized row-slice mask (`P:94`), the `reg_items` path bug
  * (`P:640`), recpipe's missing sf_id (`P:19-30`) — we implement intent.
  */
object Tolerant {
  /** Does `path` (dot-separated) resolve inside this schema? */
  def has(schema: StructType, path: String): Boolean = {
    def step(dt: DataType, parts: List[String]): Boolean = (dt, parts) match {
      case (_, Nil) => true
      case (st: StructType, p :: rest) =>
        st.fields.find(_.name == p).exists(f => step(f.dataType, rest))
      case (ArrayType(e, _), parts) => step(e, parts) // descend through arrays
      case _ => false
    }
    step(schema, path.split('.').toList)
  }

  def has(df: DataFrame, path: String): Boolean = has(df.schema, path)

  /** Resolve the DataType at a dot path, descending through arrays. */
  def typeAt(schema: DataType, path: String): Option[DataType] = {
    def step(dt: DataType, parts: List[String]): Option[DataType] = (dt, parts) match {
      case (_, Nil) => Some(dt)
      case (st: StructType, p :: rest) =>
        st.fields.find(_.name == p).flatMap(f => step(f.dataType, rest))
      case (ArrayType(e, _), parts) => step(e, parts)
      case _ => None
    }
    step(schema, path.split('.').toList)
  }

  /** A child table can only be built from an array OF STRUCTS — an
    * empty JSON array infers as array<string> and has no columns to
    * splat; the reference's pandas equivalent yields an empty frame it
    * then skips (P17). */
  def structArrayAt(df: DataFrame, path: String): Option[StructType] =
    typeAt(df.schema, path) match {
      case Some(ArrayType(st: StructType, _)) => Some(st)
      case _ => None
    }

  /** `col(path)` when present, typed null otherwise — the engine's
    * spelling of the reference's per-field try/except (P17). */
  def colOrNull(df: DataFrame, path: String, dt: DataType = StringType): Column =
    if (has(df, path)) col(path) else lit(null).cast(dt)

  /** Run `f` only if `path` exists — per-TABLE tolerance: an omitted
    * sub-tree means that one output table is skipped, everything else
    * proceeds (`P:12`, P17). */
  def ifPresent[A](df: DataFrame, path: String)(f: => A): Option[A] =
    if (has(df, path)) Some(f) else None
}

object Router {
  import Tolerant._

  /** Read a directory of JSON documents, one row per file (multiLine —
    * the reference's `typ='series'` one-doc-per-file model, S1 `P:20`).
    * `source_file` carries provenance (S2: the blob listing collapses
    * into the distributed read; Spark lists+reads object stores
    * directly, S3 staging is unnecessary). */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("multiLine", "true").json(dir)
      .withColumn("source_file", input_file_name())

  /** Filename-pattern dispatch (S4, `P:795-805`): `_bank_scrape` ->
    * bankpipe, `_credit_report` -> creditpipe, `_action` -> recpipe,
    * else jsonpipe. The listing is driver-side metadata only (as the
    * reference's `os.scandir`, but no download — S3 staging collapses
    * into the distributed read); each form family is read separately so
    * it infers its OWN schema, exactly like the reference's per-file
    * `pd.read_json`. */
  def route(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val fs = FileSystem.get(java.net.URI.create(dir),
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir)).filter(_.isFile)
      .map(_.getPath.toString).filter(_.endsWith(".json")).toSeq
    def read(paths: Seq[String]): Option[DataFrame] =
      if (paths.isEmpty) None
      else Some(spark.read.option("multiLine", "true").json(paths: _*)
        .withColumn("source_file", input_file_name()))
    val (bank, r1) = files.partition(_.matches(".*_bank_scrape\\.json$"))
    val (credit, r2) = r1.partition(_.matches(".*_credit_report\\.json$"))
    val (action, rest) = r2.partition(_.matches(".*_action\\.json$"))
    val outputs = Seq(
      read(action).map(RefPipelines.recpipe),
      read(bank).map(RefPipelines.bankpipe),
      read(credit).map(RefPipelines.creditpipe),
      read(rest).map(RefPipelines.jsonpipe)).flatten
    // Pipelines share table names (bankpipe and jsonpipe both emit
    // bank_account, transactions, …) — the reference APPENDS both to the
    // same SQL table (`P:133-147` vs `P:667-763`), so same-named outputs
    // union; differing column sets null-fill, like SQL append of a
    // subset-schema frame.
    outputs.flatten.groupMapReduce(_._1)(_._2)(
      (a, b) => a.unionByName(b, allowMissingColumns = true))
  }
}

object RefPipelines {
  import Tolerant._

  /** Filename minus a fixed-length suffix (P9: `str(json_file)[:-17]`
    * at `P:35`, `[:-19]` at `P:156`) — expressed as an anchored regex
    * strip of the form suffix, robust to any path prefix. */
  private def sfIdFromFile(suffix: String): Column =
    regexp_replace(regexp_extract(col("source_file"), "([^/]+)$", 1),
      suffix + "\\.json$", "")

  /** P8 mask intent: `"XXXX" + account[3:]` (`P:115`), char slice. */
  private def maskId(account: Column): Column =
    concat(lit("XXXX"), substring(account, 4, Int.MaxValue))

  /** P10: `Date`=yyyyMMdd + `Time`=HHmmss reassembled by slicing
    * (`P:162`); normalized to `HH:mm:ss` (SURVEY.md P10 choice). */
  private def reassembleDate(d: Column, t: Column): Column =
    concat(substring(d, 1, 4), lit("-"), substring(d, 5, 2), lit("-"),
      substring(d, 7, 2), lit(" "),
      substring(t, 1, 2), lit(":"), substring(t, 3, 2), lit(":"),
      substring(t, 5, 2))

  /** recpipe (`P:19-30`): flat action form -> one table. The reference
    * never attaches sf_id (its own bug, SURVEY §2a); we attach it. */
  def recpipe(docs: DataFrame): Map[String, DataFrame] = {
    if (docs.columns.isEmpty) return Map.empty
    val out = docs.withColumn("SF_ID", sfIdFromFile("_action"))
    Map("reccomendation_action" -> out.drop("source_file"))
  }

  /** bankpipe (`P:33-147`): standalone bank-scrape form ->
    * bank_scrape_info, misc_contact, bank_account, transactions. */
  def bankpipe(docs: DataFrame): Map[String, DataFrame] = {
    if (docs.columns.isEmpty) return Map.empty
    val d = docs
      .withColumn("SF_ID", sfIdFromFile("_bank_scrape"))
      .withColumn("Report_date", colOrNull(docs, "complete_datetime"))

    // P1/P2: the doc row minus nested payloads is the info table
    // (`P:43-49`); Catalyst prunes the dropped columns at the scan.
    val info = d.drop("contacts", "accounts", "source_file")

    val contacts = structArrayAt(docs, "contacts").map { _ =>
      d.select(col("SF_ID"), col("Report_date"), explode(col("contacts")).as("c"))
        .select(col("SF_ID"), col("Report_date"), col("c.*"))
    }
    val accountTables = accountsOf(d, docs, col("SF_ID"), col("Report_date"))
    Map("bank_scrape_info" -> info) ++
      contacts.map("misc_contact" -> _) ++ accountTables
  }

  /** Shared accounts/transactions flattening (P5/P6/P7/P8,
    * `P:70-126` and `P:447-501`): explode accounts, pull the
    * whitelisted statistics keys, mask the account number, then explode
    * transactions stamping all parent keys — the reference's 20-line
    * accumulate loop is one explode chain, zero shuffles. */
  private def accountsOf(d: DataFrame, docs: DataFrame, sfId: Column,
      reportDate: Column, path: String = "accounts"): Map[String, DataFrame] = {
    structArrayAt(docs, path).map { accSchema =>
      val hasAcctNo = accSchema.fieldNames.contains("account")
      val acc = d
        .select(sfId.as("sf_id"), reportDate.as("Report_Date"),
          explode(col(path)).as("a"))
        .withColumn("account_id",
          if (hasAcctNo) col("a.account") else lit(null).cast(StringType))
        .withColumn("mask_id",
          if (hasAcctNo) maskId(col("a.account")) else lit(null).cast(StringType))
      // P7: whitelisted key extraction from the open-keyed statistics
      // map/struct; unknown future keys are simply never selected.
      def stat(key: String): Column = {
        val p = s"a.statistics.$key"
        accSchema.find(_.name == "statistics").map(_.dataType) match {
          case Some(MapType(_, _, _)) => element_at(col("a.statistics"), key)
          case Some(st: StructType) if st.fieldNames.contains(key) => col(p)
          case _ => lit(null).cast(DoubleType)
        }
      }
      val bankAccount = acc.select(
        col("sf_id").as("SF_ID"), col("Report_Date"),
        col("account_id").as("account"), col("mask_id"),
        stat("mean_closing_balance").as("mean_close"),
        stat("mean_closing_balance_30").as("mean_close_30"))

      val txns = if (accSchema.find(_.name == "transactions").map(_.dataType)
          .exists(_.isInstanceOf[ArrayType])) {
        val t = acc
          .select(col("sf_id"), col("Report_Date"), col("account_id"),
            col("mask_id"), explode(col("a.transactions")).as("t"))
        val flat = t.select((t.select(col("t.*")).columns.map(c => col(s"t.$c")) ++
          Seq(col("account_id"), col("mask_id"), col("sf_id"), col("Report_Date"))): _*)
        // P11: stringify the flags array — to_json, not Python repr.
        val out = if (Tolerant.has(flat, "flags")) {
          flat.withColumn("flags", to_json(col("flags")))
        } else flat
        Map("transactions" -> out)
      } else Map.empty[String, DataFrame]
      Map("bank_account" -> bankAccount) ++ txns
    }.getOrElse(Map.empty[String, DataFrame])
  }

  /** The 13 credit sub-tables hanging off `TU_FFR_Report[0]`
    * (`P:187-306`, `P:528-645`): 11 explode-an-array tables, the scalar
    * CreditSummary struct (P15), and base fields. `reg_items` uses the
    * CORRECT path (the reference's always-fails bug at `P:640` is not
    * replicated). */
  private val creditArrays = Seq(
    "Bankruptcies" -> "bankruptcies", "Trades" -> "trades",
    "CreditSummaryDetails" -> "credit_summary_details",
    "ScoreProducts" -> "score_products", "Bankings" -> "bankings",
    "Employments" -> "employments", "Collections" -> "collections",
    "Inquiries" -> "inquiries", "Legals" -> "legals",
    "ConsumerStatements" -> "consumer_statements",
    "MiscellaneousStatements" -> "miscellaneous_statements",
    "RegisteredItems" -> "reg_items")

  private def creditTables(d: DataFrame, docs: DataFrame, root: String,
      memberId: Column, reportDate: Column): Map[String, DataFrame] = {
    val ffr = if (root.isEmpty) "TU_FFR_Report" else s"$root.TU_FFR_Report"
    val sub = creditArrays.flatMap { case (field, table) =>
      structArrayAt(docs, s"$ffr.$field").map { _ =>
        table -> d
          .select(memberId.as("Credit_Member_ID"), reportDate.as("Report_Date"),
            explode(col(ffr).getItem(0).getField(field)).as("x"))
          .select(col("Credit_Member_ID"), col("Report_Date"), col("x.*"))
      }
    }.toMap
    val summary = ifPresent(docs, s"$ffr.CreditSummary") {
      "credit_summary" -> d
        .filter(col(ffr).getItem(0).getField("CreditSummary").isNotNull)
        .select(
        (Seq(memberId.as("Credit_Member_ID"), reportDate.as("Report_Date")) :+
          col(ffr).getItem(0).getField("CreditSummary").as("cs")): _*)
        .select(col("Credit_Member_ID"), col("Report_Date"), col("cs.*"))
    }
    sub ++ summary
  }

  /** creditpipe (`P:154-366`): standalone credit-report form. */
  def creditpipe(docs: DataFrame): Map[String, DataFrame] = {
    if (docs.columns.isEmpty) return Map.empty
    val reportDate = if (has(docs, "Date") && has(docs, "Time"))
      reassembleDate(col("Date"), col("Time")) else lit(null).cast(StringType)
    val d = docs
      .withColumn("sf_id", sfIdFromFile("_credit_report"))
      .withColumn("Report_date", reportDate)
    // base_credit (`P:165-184`): doc scalars + Hit + optional
    // OnFileDate with null fallback (P12, `P:175-178`).
    val base = d
      .withColumn("Hit",
        if (has(docs, "TU_FFR_Report.Hit"))
          col("TU_FFR_Report").getItem(0).getField("Hit")
        else lit(null).cast(BooleanType))
      .withColumn("FFR_filedate",
        if (has(docs, "TU_FFR_Report.OnFileDate"))
          col("TU_FFR_Report").getItem(0).getField("OnFileDate")
        else lit(null).cast(StringType))
      .drop("TU_FFR_Report", "source_file")
    val member = colOrNull(docs, "MemberCode")
    Map("base_credit" -> base) ++
      creditTables(d, docs, "", member, col("Report_date"))
  }

  /** jsonpipe (`P:372-763`): the combined envelope form -> ~20 tables.
    * ONE parsed source, ~20 independent narrow plans (SURVEY §3 Entry 2:
    * "ONE read, then ~20 select/explode plans off the cached source").
    */
  def jsonpipe(docs: DataFrame): Map[String, DataFrame] = {
    if (docs.columns.isEmpty) return Map.empty
    // P12/P13 (`P:378-397`): 3-level customer-name fallback chain.
    // concat_ws never returns null (null,null -> "") — nullif restores
    // null so the next coalesce level actually fires (P12 chain).
    def nameOf(first: Column, last: Column): Column =
      nullif(concat_ws(" ", first, last), lit(""))
    val name = coalesce(
      (Seq(colOrNull(docs, "BankScrapeData.name")) ++
        (if (has(docs, "CustomerInformation.FirstName"))
          Seq(nameOf(col("CustomerInformation.FirstName"),
            col("CustomerInformation.LastName"))) else Nil) ++
        (if (has(docs, "CreditReportData.TU_FFR_Report.Names.FirstName"))
          Seq(nameOf(
            col("CreditReportData.TU_FFR_Report").getItem(0).getField("Names").getField("FirstName"),
            col("CreditReportData.TU_FFR_Report").getItem(0).getField("Names").getField("LastName")))
        else Nil) :+ lit("Not specified")): _*)
    // `P:399-402`: Credit_Member_ID with "Not found" fallback.
    val memberId = coalesce(colOrNull(docs, "CreditReportData.MemberCode"), lit("Not found"))
    val sfId = colOrNull(docs, "SalesforceID")
    val created = colOrNull(docs, "CreatedOnDate")

    val d = docs
      .withColumn("name", name)
      .withColumn("Credit_Member_ID", memberId)

    // master_table (`P:393-404`): envelope scalars, nested payloads
    // dropped (P2 — Catalyst prunes them from the scan).
    val master = d.drop("CustomerInformation", "BankScrapeData",
      "CreditReportData", "Recommendations", "source_file")

    // Struct-derived tables filter to docs actually carrying the
    // sub-tree: the schema is merged batch-wide, but the reference's
    // per-doc try/except means a doc without the payload contributes no
    // row to that table (P17).
    val customerInfo = ifPresent(docs, "CustomerInformation") {
      "customer_info" -> d.filter(col("CustomerInformation").isNotNull)
        .select(sfId.as("SalesforceID"),
          created.as("Report_date"), col("CustomerInformation.*"))
    }
    val miscContact = structArrayAt(docs, "BankScrapeData.contacts").map { _ =>
      "misc_contact" -> d
        .select(sfId.as("SF_ID"), created.as("Report_date"),
          explode(col("BankScrapeData.contacts")).as("c"))
        .select(col("SF_ID"), col("Report_date"), col("c.*"))
    }
    // bank_scrape_info (`P:431-437`): struct->row minus its arrays.
    val bankInfo = ifPresent(docs, "BankScrapeData") {
      val cols = docs.select(col("BankScrapeData.*")).drop("accounts", "contacts").columns
      "bank_scrape_info" -> d.filter(col("BankScrapeData").isNotNull).select(
        (cols.map(c => col(s"BankScrapeData.$c")) ++
          Seq(sfId.as("SF_ID"), created.as("Report_date"))): _*)
    }
    val accounts = accountsOf(d, docs, sfId, created, "BankScrapeData.accounts")

    // base_credit (`P:506-522`).
    val baseCredit = ifPresent(docs, "CreditReportData") {
      val scalarCols = docs.select(col("CreditReportData.*"))
        .drop("TU_FFR_Report").columns
      val hit = if (has(docs, "CreditReportData.TU_FFR_Report.Hit"))
        col("CreditReportData.TU_FFR_Report").getItem(0).getField("Hit")
      else lit(null).cast(BooleanType)
      val fileDate = if (has(docs, "CreditReportData.TU_FFR_Report.OnFileDate"))
        col("CreditReportData.TU_FFR_Report").getItem(0).getField("OnFileDate")
      else lit(null).cast(StringType)
      "base_credit" -> d.filter(col("CreditReportData").isNotNull).select(
        (scalarCols.map(c => col(s"CreditReportData.$c")) ++ Seq(
          hit.as("Hit"), fileDate.as("FFR_filedate"),
          col("Credit_Member_ID"), sfId.as("SF_ID"), created.as("Report_date"))): _*)
    }
    val credit = creditTables(d, docs, "CreditReportData",
      col("Credit_Member_ID"), created)

    val recs = structArrayAt(docs, "Recommendations").map { _ =>
      "reccomendations" -> d
        .select(sfId.as("SF_ID"), created.as("Report_date"),
          explode(col("Recommendations")).as("r"))
        .select(col("SF_ID"), col("Report_date"), col("r.*"))
    }
    Map("master_table" -> master) ++ customerInfo ++ miscContact ++ bankInfo ++
      accounts ++ baseCredit ++ credit ++ recs
  }
}
