package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.types.AbstractDataType
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * Why a custom Expression and not a UDF or `zip_with`+`aggregate`
  * (builder prompt preference order (b)): a Scala UDF boxes both arrays
  * per row and breaks whole-stage codegen; the HOF spelling allocates a
  * zipped intermediate array per row and walks it twice (dot, norms).
  * This expression generates a single fused primitive loop inside the
  * stage — no allocation, no virtual calls — which is what you want when
  * scoring 10^11 vector pairs. `doGenCode` emits the loop; `nullSafeEval`
  * is the interpreted fallback (both paths agree — see
  * CosineSimilaritySpec).
  *
  * Semantics: vectors of differing length compare over the common
  * prefix; null elements count as 0; zero-norm input yields 0.0 (never
  * NaN/null) so downstream top-k never sees NaN ordering surprises.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // (covariant narrowing: AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      // widen BEFORE multiplying: a float*float product rounds to 24-bit
      // mantissa first, which would diverge from any double-precision
      // reference (incl. the DuckDB oracle) by ~1e-8 per term
      val xi: Double = if (x.isNullAt(i)) 0d else x.getFloat(i).toDouble
      val yi: Double = if (y.isNullAt(i)) 0d else y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val d = math.sqrt(nx) * math.sqrt(ny)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName per local: two cosine_sim calls can be inlined into
      // the same codegen scope — fixed names would redeclare and break
      // janino compilation (silent interpreted fallback).
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val d = ctx.freshName("d")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.isNullAt($i) ? 0d : (double) $a.getFloat($i);
         |  double $yi = $b.isNullAt($i) ? 0d : (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $d = Math.sqrt($nx) * Math.sqrt($ny);
         |${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration: [[GraftExtensions]] for
  * `spark.sql.extensions=graft.GraftExtensions` deployments, and
  * [[GraftFunctions.register]] for sessions the caller doesn't build
  * (the driver harness owns the SparkSession — queries self-register,
  * idempotently). */
object GraftFunctions {

  /** Shared minhash_sketch builder: the sketch width is a plan-time
    * constructor parameter, so the third argument must be a foldable
    * integer — checked HERE so SQL misuse (a column, a string) fails at
    * function resolution with the reason, not with an eval()
    * ClassCastException deep in planning. (Input TYPES of ha/hb are
    * checked by the expression's own ExpectsInputTypes.) */
  private[functions] val buildMinHashSketch: Seq[Expression] => Expression =
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3,
        s"minhash_sketch(ha, hb, numHashes) takes 3 arguments, got ${exprs.length}")
      val w = exprs(2)
      require(w.foldable && (w.dataType == IntegerType || w.dataType == LongType),
        s"minhash_sketch numHashes must be an integer literal, got ${w.sql}")
      val v = w.eval()
      // a foldable CAST(NULL AS INT) passes the type check above
      require(v != null, "minhash_sketch numHashes must not be NULL")
      MinHashSketch(exprs(0), exprs(1), v.asInstanceOf[Number].intValue)
    }

  /** Wrap a function builder with an arity check: SQL misuse
    * (`cosine_sim(a)`, `int8_dot(a)`) must fail at function
    * resolution as a proper AnalysisException naming the function and
    * expected arity — not as an IndexOutOfBoundsException from an
    * unguarded `exprs(1)` deep in resolution. Raised with Spark's own
    * WRONG_NUM_ARGS error class so the message matches what a
    * built-in with the same mistake would produce. */
  private def checkedArity(name: String, n: Int,
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    (exprs: Seq[Expression]) => {
      if (exprs.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          Map("functionName" -> s"`$name`", "expectedNum" -> n.toString,
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(exprs)
    }

  /** One builder per function, shared by [[register]] (temp-function
    * path) and [[GraftExtensions]] (extension-injection path) so both
    * SQL surfaces get identical arity behavior. */
  private[functions] val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", classOf[CosineSimilarity],
      checkedArity("cosine_sim", 2, e => CosineSimilarity(e(0), e(1)))),
    ("simhash64", classOf[SimHash64],
      checkedArity("simhash64", 1, e => SimHash64(e(0)))),
    ("simhash_text", classOf[SimHashText],
      checkedArity("simhash_text", 1, e => SimHashText(e(0)))),
    ("minhash_sketch", classOf[MinHashSketch],
      checkedArity("minhash_sketch", 3, GraftFunctions.buildMinHashSketch)),
    ("int8_dot", classOf[Int8Dot],
      checkedArity("int8_dot", 2, e => Int8Dot(e(0), e(1)))),
    ("damerau_levenshtein", classOf[DamerauLevenshtein],
      checkedArity("damerau_levenshtein", 2,
        e => DamerauLevenshtein(e(0), e(1)))),
    // *_bin, not to_avro/from_avro: Spark 4's catalyst registers those
    // names as stubs that delegate to the spark-avro MODULE (absent
    // here) and fail at runtime — shadowing a built-in name with
    // different resolution semantics would be a trap for SQL users
    ("to_avro_bin", classOf[ToAvroBinary],
      checkedArity("to_avro_bin", 1, e => ToAvroBinary(e(0)))),
    ("from_avro_bin", classOf[FromAvroBinary],
      // the target schema is a plan-time DDL literal (the from_csv
      // contract) — checked at resolution like minhash_sketch's width
      checkedArity("from_avro_bin", 2, e => {
        val s = e(1)
        require(s.foldable && s.dataType == StringType,
          s"from_avro_bin schema must be a DDL string literal, got ${s.sql}")
        val v = s.eval()
        require(v != null, "from_avro_bin schema must not be NULL")
        FromAvroBinary(e(0), v.toString)
      })),
    ("to_proto_bin", classOf[ToProtoBinary],
      checkedArity("to_proto_bin", 1, e => ToProtoBinary(e(0)))),
    ("from_proto_bin", classOf[FromProtoBinary],
      checkedArity("from_proto_bin", 2, e => {
        val s = e(1)
        require(s.foldable && s.dataType == StringType,
          s"from_proto_bin schema must be a DDL string literal, got ${s.sql}")
        val v = s.eval()
        require(v != null, "from_proto_bin schema must not be NULL")
        FromProtoBinary(e(0), v.toString)
      })),
    ("unicode_normalize", classOf[UnicodeNormalize],
      // 1- or 2-arg: the optional form must be a foldable string
      // literal (plan-time config — see the expression's scaladoc),
      // checked at resolution like minhash_sketch's width
      (exprs: Seq[Expression]) => {
        if (exprs.isEmpty || exprs.length > 2)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`unicode_normalize`", "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        val form = if (exprs.length == 2) {
          val f = exprs(1)
          require(f.foldable && f.dataType == StringType,
            s"unicode_normalize form must be a string literal, got ${f.sql}")
          val v = f.eval()
          require(v != null, "unicode_normalize form must not be NULL")
          v.toString
        } else "NFC"
        UnicodeNormalize(exprs(0), form)
      }))

  def register(spark: SparkSession): Unit = {
    // Register once per session: createOrReplaceTempFunction logs a WARN
    // ("replaced a previously registered function") on every re-register,
    // which spammed stderr badly enough to break the driver's parse of
    // Bench's stdout JSON.
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, build) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, build, "built-in")
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, cls, build) =>
      ext.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), build))
    }
    // the custom whole-operator path (config-loaded sessions; the
    // facade also self-registers via experimental.extraStrategies)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
