package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two numeric array columns, accumulated in
  * double — the hot inner loop of similarity search. The builtin equivalent
  * (`aggregate(zip_with(a, b, …))`) runs interpreted per element with a
  * closure call and boxing per lambda step; this expression compiles to a
  * tight primitive `for` loop inside whole-stage codegen, worth >10× on
  * brute-force kNN / near-dup scoring.
  *
  * Usage: registered as SQL function `vec_dot` (VecFunctions.register /
  * GraftExtensions), so expression-string nodes can call
  * `vec_dot(emb_a, emb_b)` anywhere.
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType = e.dataType.asInstanceOf[ArrayType].elementType
  private def accessor(t: DataType): String = t match {
    case FloatType => "getFloat"
    case _         => "getDouble"
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (fa, fb) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var i = 0
    var sum = 0.0
    while (i < n) {
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (accA, accB) = (accessor(elemType(left)), accessor(elemType(right)))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ((double) $a.$accA($i)) * ((double) $b.$accB($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd integer dot product over two `array<int>` columns, accumulated
  * in long — the coarse-scoring inner loop of quantized (int8) similarity
  * search. Integer accumulation is EXACT (no summation-order sensitivity),
  * so quantized candidate ranking is bit-reproducible across partitionings;
  * int8 codes fit int exactly, and 64-dim int8 dots stay far inside int64.
  */
case class VecDotInt(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot_int needs array<int> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_dot_int"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var sum = 0L
    while (i < n) { sum += a.getInt(i).toLong * b.getInt(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDotInt =
    copy(left = newLeft, right = newRight)
}

object VecFunctions {
  private[functions] def intLit(e: Expression): Int =
    e.eval(null) match {
      case i: Int => i
      case other  => throw new IllegalArgumentException(s"expected int literal, got $other")
    }
  private[functions] def boolLit(e: Expression): Boolean =
    e.eval(null) match {
      case b: Boolean => b
      case other      => throw new IllegalArgumentException(s"expected boolean literal, got $other")
    }
  /** Idempotently register graft's vector/sketch functions into a session.
    * Register-once: re-registration is a no-op (the kernels are stateless
    * singletons keyed by name), which keeps `SimpleFunctionRegistry` from
    * logging a "replaced a previously registered function" warning per
    * kernel per call — pure noise across a 214-query bench run. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // first graft registration into THIS function registry? Detected by a
    // sentinel carried IN the registry itself (not a session-keyed map):
    // cloned/derived sessions copy the registry contents, so the sentinel
    // travels with the kernels and re-registration through a clone stays
    // silent.
    val sentinel =
      org.apache.spark.sql.catalyst.FunctionIdentifier("__graft_kernels_v1")
    val firstInSession = !reg.functionExists(sentinel)
    if (firstInSession)
      reg.createOrReplaceTempFunction(sentinel.funcName,
        _ => org.apache.spark.sql.catalyst.expressions.Literal(true),
        "scala_udf")
    // check-and-register EACH kernel (ADVICE r17): a single guard keyed on
    // one name silently skipped every OTHER kernel when a session already
    // carried a same-named function from any other source — a user UDF
    // named "morton3" made `vec_dot` an undefined function. Idempotence
    // per name also keeps SimpleFunctionRegistry's "replaced a function"
    // warning out of the logs; an existing same-named user function is
    // deliberately left alone (we never clobber the user's registry) but
    // the hijack is made DETECTABLE (ADVICE r18): on the session's FIRST
    // graft registration an already-bound kernel name can only be a
    // foreign function, so it logs a warning (later re-registrations stay
    // silent — the existing names are graft's own).
    def reg1(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
      else if (firstInSession)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"graft kernel '$name' not registered: the session already binds " +
            "a function of that name — graft queries using this kernel " +
            "will run the session's function, not graft's")
    reg1("vec_dot", exprs => VecDot(exprs(0), exprs(1)))
    reg1("vec_dot_int", exprs => VecDotInt(exprs(0), exprs(1)))
    reg1("minhash_bands", exprs => MinHashBands(exprs(0), intLit(exprs(1)), intLit(exprs(2))))
    reg1("shingle_hashes", exprs => ShingleHashes(exprs(0), intLit(exprs(1)),
      if (exprs.length > 2) boolLit(exprs(2)) else true))
    reg1("simhash64", exprs => SimHash64(exprs(0)))
    reg1("lsh_signs", exprs => LshSigns(exprs(0), intLit(exprs(1)), intLit(exprs(2))))
    reg1("winnow_fp", exprs => WinnowFingerprint(exprs(0), intLit(exprs(1)), intLit(exprs(2))))
    reg1("unicode_norm", exprs => UnicodeNormalize.fromExprs(exprs))
    reg1("bpe_encode", exprs => BpeEncode(exprs(0), strLit(exprs(1)).split('\n').toSeq))
    reg1("morton2", exprs => MortonInterleave(exprs(0), exprs(1)))
    reg1("morton3", exprs => Morton3Interleave(exprs(0), exprs(1), exprs(2)))
  }
  private[functions] def strLit(e: Expression): String =
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(s"expected string literal, got $other")
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` wires the functions
  * in at session build time (the deployment path for a shared cluster).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    def lit(e: Expression): Int = e.eval(null).asInstanceOf[Int]
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot_int"),
      new ExpressionInfo(classOf[VecDotInt].getName, "vec_dot_int"),
      (exprs: Seq[Expression]) => VecDotInt(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (exprs: Seq[Expression]) => MinHashBands(exprs(0), lit(exprs(1)), lit(exprs(2)))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("lsh_signs"),
      new ExpressionInfo(classOf[LshSigns].getName, "lsh_signs"),
      (exprs: Seq[Expression]) => LshSigns(exprs(0), lit(exprs(1)), lit(exprs(2)))))
    // keep this list in lockstep with VecFunctions.register — a function
    // present in one path but not the other makes the same SQL work or fail
    // depending on HOW the session was built
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs(0), lit(exprs(1)),
        if (exprs.length > 2) VecFunctions.boolLit(exprs(2)) else true)))
    ext.injectFunction((
      FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fp"),
      (exprs: Seq[Expression]) => WinnowFingerprint(exprs(0), lit(exprs(1)), lit(exprs(2)))))
    ext.injectFunction((
      FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_norm"),
      (exprs: Seq[Expression]) => UnicodeNormalize.fromExprs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (exprs: Seq[Expression]) => BpeEncode(exprs(0),
        VecFunctions.strLit(exprs(1)).split('\n').toSeq)))
    ext.injectFunction((
      FunctionIdentifier("morton2"),
      new ExpressionInfo(classOf[MortonInterleave].getName, "morton2"),
      (exprs: Seq[Expression]) => MortonInterleave(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("morton3"),
      new ExpressionInfo(classOf[Morton3Interleave].getName, "morton3"),
      (exprs: Seq[Expression]) => Morton3Interleave(exprs(0), exprs(1), exprs(2))))
  }
}
