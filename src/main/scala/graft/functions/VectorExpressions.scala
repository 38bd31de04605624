package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the similarity operators.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) evaluate
  * their lambda per element in interpreted mode — fine for small
  * arrays, but a 64-dim dot product over millions of candidate pairs
  * spends its time boxing lambda arguments. This expression does the
  * same sequential left-fold in a tight codegen'd loop, so results are
  * bit-identical to `aggregate(zip_with(a, b, (x,y) -> x*y), 0D,
  * (acc,v) -> acc+v)` (and to the DuckDB oracle's list fold) while
  * staying inside WholeStageCodegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // A null ELEMENT propagates to a null result — matching the
  // aggregate(zip_with(...)) fold (null product poisons the sum) and
  // the DuckDB list fold, instead of silently reading garbage. Ragged
  // inputs (different lengths) are also null: zip_with null-pads the
  // shorter array, which poisons the fold the same way — a truncated
  // partial sum would be a silent wrong value.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |}
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Register session-scoped SQL functions (idempotent — a session that
    * already has `dot_product` is left untouched, so repeated
    * `Tables.tune` calls don't spam "function replaced" warnings).
    * After this, `expr("dot_product(a, b)")` resolves to the codegen'd
    * expression. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def reg(name: String, builder: Seq[Expression] => Expression): Unit = {
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!registry.functionExists(id)) {
        registry.createOrReplaceTempFunction(name, builder, "built-in")
      }
    }
    reg("dot_product", exprs => DotProduct(exprs(0), exprs(1)))
    reg("char_gram_hashes", exprs => CharGramHashes(exprs(0), intLit(exprs(1))))
    reg("token_shingle_hashes", exprs => TokenShingleHashes(exprs(0), intLit(exprs(1))))
    reg("minhash_sig", exprs => MinHashSig(exprs(0), intLit(exprs(1))))
    reg("simhash64", exprs => SimHash64(exprs(0)))
  }

  /** The size arguments must be LITERAL ints — they shape the output
    * schema, so a column-valued argument cannot work. Shared by the
    * registry path above and [[graft.GraftExtensions]]. */
  private[graft] def intLit(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()
}
