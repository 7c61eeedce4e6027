package graft.functions

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** Proves the custom expression stays INSIDE whole-stage codegen (the
  * entire point of writing doGenCode instead of a UDF). */
class CodegenSpec extends SparkSuiteBase {
  import spark.implicits._

  test("cosine_sim evaluates inside a WholeStageCodegen stage") {
    GraftFunctions.register(spark)
    // parquet-backed input: a local literal would be constant-folded
    // into a LocalTableScan before any codegen happens
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(
      call_function("cosine_sim", $"embedding", $"embedding").as("c"))
    val plan = df.queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty, s"no codegen stage:\n$plan")
    assert(codegenStages.exists(_.toString.contains("cosine_sim")),
      s"cosine_sim not inside codegen:\n$plan")
    // and the generated java actually contains our fused kernel
    val sources = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
    assert(sources.exists(_._2.contains("Math.sqrt")),
      "generated code missing the cosine kernel")
  }

  test("simhash_text evaluates inside codegen and matches interpreted + HOF spellings") {
    GraftFunctions.register(spark)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val hs = transform(graft.ops.TextDedup.tokens($"text"), t => xxhash64(t))
    val df = docs.select($"doc_id", call_function("simhash_text", $"text").as("fp"))
    val plan = df.queryExecution.executedPlan
    val stages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("simhash_text")),
      s"simhash_text not inside codegen:\n$plan")
    // the retired HOF spelling, kept here as the semantic oracle
    def hofSimhash(h: org.apache.spark.sql.Column) =
      (0 until 64).map { k =>
        when(
          aggregate(h, lit(0),
            (c, x) => c + when(shiftright(x, k).bitwiseAND(1) === 1, 1).otherwise(-1)) > 0,
          lit(1L << k)).otherwise(0L)
      }.reduce(_ + _)
    val expected = docs.select($"doc_id", hofSimhash(hs).as("fp"))
      .as[(Long, Long)].collect().toMap
    val got = df.as[(Long, Long)].collect().toMap
    assert(got == expected)
    // interpreted path agrees (empty + null-element edge cases)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val e = SimHash64(Literal.create(Seq.empty[Long], ArrayType(LongType)))
    assert(e.eval(null) == 0L)
    val withNull = SimHash64(Literal.create(Seq[java.lang.Long](-1L, null),
      ArrayType(LongType)))
    assert(withNull.eval(null) == 0L) // +1 and -1 votes tie -> bit unset
  }

  test("int8_dot evaluates inside codegen and matches interpreted + HOF spellings") {
    GraftFunctions.register(spark)
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q8 = graft.Graft.quantizeEmbeddings(
      emb.select($"vec_id", $"embedding"), "embedding")
    val df = q8.select($"vec_id",
      call_function("int8_dot", $"qvec", $"qvec").as("n2"))
    val plan = df.queryExecution.executedPlan
    val stages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("int8_dot")),
      s"int8_dot not inside codegen:\n$plan")
    // the HOF spelling as semantic oracle
    val expected = q8.select($"vec_id",
        aggregate(zip_with($"qvec", $"qvec",
          (x, y) => x.cast("long") * y.cast("long")), lit(0L),
          (acc, v) => acc + v).as("n2"))
      .as[(Long, Long)].collect().toMap
    val got = df.as[(Long, Long)].collect().toMap
    assert(got == expected)
    // interpreted path edge cases: empty, null element, length mismatch
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    val empty = Int8Dot(
      Literal.create(Seq.empty[Byte], ArrayType(ByteType)),
      Literal.create(Seq.empty[Byte], ArrayType(ByteType)))
    assert(empty.eval(null) == 0L)
    val mixed = Int8Dot(
      Literal.create(Seq[java.lang.Byte](127.toByte, null, 3.toByte),
        ArrayType(ByteType)),
      Literal.create(Seq[java.lang.Byte](127.toByte, 5.toByte),
        ArrayType(ByteType)))
    assert(mixed.eval(null) == 127L * 127L) // null -> 0, prefix only
  }

  test("GraftExtensions injects the native functions into a fresh session (SQL path)") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    // build a second session over the SAME SparkContext, this time wired
    // through the extensions hook — the spark.sql.extensions deployment
    // path a SQL-only user configures
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      assert(s2 ne prev, "expected a fresh session")
      val r = s2.sql(
        """SELECT
          |  cosine_sim(CAST(array(1.0, 0.0) AS array<float>),
          |             CAST(array(1.0, 0.0) AS array<float>)) AS c,
          |  simhash_text('hello world hello') AS sh,
          |  simhash64(array(CAST(-1 AS bigint), CAST(-1 AS bigint))) AS s64
          |""".stripMargin).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(r.getLong(1) != 0L)
      assert(r.getLong(2) == -1L) // two all-ones votes -> all bits set
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("two cosine_sim calls in one projection codegen without name collisions") {
    GraftFunctions.register(spark)
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    // distinct argument trees: identical calls get merged by Spark's
    // common-subexpression elimination and only one kernel would inline
    val df = emb.select(
      call_function("cosine_sim", $"embedding", $"embedding").as("c1"),
      call_function("cosine_sim", $"embedding", reverse($"embedding")).as("c2"))
    val plan = df.queryExecution.executedPlan
    val stages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("cosine_sim")))
    // both columns must evaluate (janino compile failure would fall
    // back to interpreted — still correct, so also check the source
    // compiled by asserting two distinct kernel loops were emitted)
    val src = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
      .map(_._2).find(_.contains("Math.sqrt")).getOrElse("")
    assert(src.sliding("Math.sqrt".length).count(_ == "Math.sqrt") >= 4,
      "expected two fused kernels (2 sqrt calls each)")
    val row = df.head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
  }

  test("minhash_sketch misuse fails at analysis, not mid-execution") {
    GraftFunctions.register(spark)
    val df = Seq(("abc", 1L)).toDF("s", "h")
    // wrong input type: ExpectsInputTypes -> analysis error, plan never runs
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy().agg(call_function("minhash_sketch", $"s", $"h", lit(32)))
        .collect()
    }
    // non-literal width: rejected at function resolution with the reason
    val e = intercept[Exception] {
      df.groupBy().agg(call_function("minhash_sketch", $"h", $"h", $"h"))
        .collect()
    }
    assert(e.getMessage.contains("integer literal"),
      s"expected the width-literal message, got: ${e.getMessage}")
  }

  test("wrong arity fails as a WRONG_NUM_ARGS analysis error, not IndexOutOfBounds") {
    GraftFunctions.register(spark)
    // one arg to a 2-ary function, and too many to a 1-ary one — both
    // must surface Spark's own WRONG_NUM_ARGS error naming the
    // function, never an IndexOutOfBoundsException from exprs(1)
    for (sql <- Seq(
        "SELECT int8_dot(CAST(array(1) AS array<tinyint>))",
        "SELECT cosine_sim(CAST(array(1.0) AS array<float>))",
        "SELECT simhash64(array(1L), array(2L))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] { spark.sql(sql) }
      assert(e.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        s"expected WRONG_NUM_ARGS for [$sql], got: ${e.getCondition}: ${e.getMessage}")
    }
  }

  test("unicode_normalize composes NFC inside codegen; NFD round-trips; null passes") {
    GraftFunctions.register(spark)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(concat($"text", lit(" e\u0301")).as("s"))
    val df = docs.select(
      call_function("unicode_normalize", $"s").as("nfc"),
      call_function("unicode_normalize", $"s", lit("NFD")).as("nfd"),
      $"s")
    val plan = df.queryExecution.executedPlan
    val stages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("unicode_normalize")),
      s"unicode_normalize not inside codegen:\n$plan")
    df.collect().foreach { r =>
      val (nfc, nfd, raw) = (r.getString(0), r.getString(1), r.getString(2))
      assert(nfc.length == raw.length - 1, "NFC must compose e+U+0301 to one char")
      assert(nfc.endsWith("\u00e9") && nfd == raw,
        "NFD of already-decomposed input must be identity")
      // the two forms round-trip through java.text.Normalizer semantics
      assert(java.text.Normalizer.normalize(nfd, java.text.Normalizer.Form.NFC) == nfc)
    }
    // null in, null out (interpreted path)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    assert(UnicodeNormalize(Literal.create(null, StringType)).eval(null) == null)
    // bad form rejected at construction with the reason
    val e = intercept[IllegalArgumentException] {
      UnicodeNormalize(Literal.create("x", StringType), "NFX")
    }
    assert(e.getMessage.contains("normalization form"))
  }

  test("damerau_levenshtein matches the DuckDB reference vectors and stays in codegen") {
    GraftFunctions.register(spark)
    // vectors probed against DuckDB 1.0.0's damerau_levenshtein (the
    // oracle implementation): TRUE DL (CA~ABC=2 where OSA says 3),
    // byte-level UTF-8 (béta~beta=2: the 2-byte é costs sub+del)
    val vectors = Seq(
      ("CA", "ABC", 2), ("ab", "ba", 1), ("abc", "ca", 2),
      ("", "abc", 3), ("kitten", "sitting", 3), ("abcdef", "abcfed", 2),
      ("a", "a", 0), ("", "", 0), ("xy", "yx", 1), ("smtih", "smith", 1),
      ("thee", "the", 1), ("béta", "beta", 2), ("ab", "aab", 1))
    // static kernel (the interpreted/codegen shared path)
    import org.apache.spark.unsafe.types.UTF8String
    vectors.foreach { case (a, b, d) =>
      assert(DamerauLevenshtein.distance(
        UTF8String.fromString(a), UTF8String.fromString(b)) == d,
        s"distance('$a','$b') != $d")
      assert(DamerauLevenshtein.distance(
        UTF8String.fromString(b), UTF8String.fromString(a)) == d,
        s"distance must be symmetric for ('$a','$b')")
    }
    // through SQL on a parquet-backed scan: must sit inside codegen
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val df = docs.select(call_function("damerau_levenshtein",
      substring($"text", 1, 12), substring($"text", 2, 12)).as("d"))
    val plan = df.queryExecution.executedPlan
    val stages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("damerau_levenshtein")),
      s"damerau_levenshtein not inside codegen:\n$plan")
    assert(df.collect().forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 12))
    // null propagation (interpreted path)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    assert(DamerauLevenshtein(Literal.create(null, StringType),
      Literal.create("x", StringType)).eval(null) == null)
    // length guard (ADVICE r16): document-scale input fails loudly
    // instead of allocating a quadratic matrix
    val big = UTF8String.fromString("x" * (DamerauLevenshtein.MaxBytes + 1))
    val cap = intercept[IllegalArgumentException] {
      DamerauLevenshtein.distance(big, UTF8String.fromString("y"))
    }
    assert(cap.getMessage.contains("4096"))
    // exactly at the bound still computes
    val atCap = UTF8String.fromString("x" * DamerauLevenshtein.MaxBytes)
    assert(DamerauLevenshtein.distance(atCap, atCap) == 0)
  }
}
