package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * Why a custom Expression and not `aggregate(zip_with(...))`: higher-order
  * functions evaluate one interpreted lambda call per element — for
  * all-pairs similarity at 100 TB that is billions of virtual calls. This
  * expression emits a tight primitive loop via `doGenCode`, stays inside
  * WholeStageCodegen, and reads the float arrays without boxing.
  * Accumulation is in double, sequentially — bit-compatible with DuckDB's
  * `list_cosine_similarity` for oracle comparison after round().
  */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int graftN = java.lang.Math.min($a.numElements(), $b.numElements());
         |double graftDot = 0.0; double graftNx = 0.0; double graftNy = 0.0;
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  double graftX = (double) $a.getFloat(graftI);
         |  double graftY = (double) $b.getFloat(graftI);
         |  graftDot += graftX * graftY; graftNx += graftX * graftX; graftNy += graftY * graftY;
         |}
         |double graftDenom = java.lang.Math.sqrt(graftNx) * java.lang.Math.sqrt(graftNy);
         |${ev.value} = graftDenom == 0.0 ? 0.0 : graftDot / graftDenom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float vectors (same codegen rationale as above). */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int graftN = java.lang.Math.min($a.numElements(), $b.numElements());
         |double graftDot = 0.0;
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  graftDot += (double) $a.getFloat(graftI) * (double) $b.getFloat(graftI);
         |}
         |${ev.value} = graftDot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level API for the custom expressions. */
object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_cosine", exprs => FloatVecCosine(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
  }

  /** Cosine similarity Column over two array<float> columns. */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_cosine", a, b)
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }
}
