package graft

import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native CosineSim expression: numeric identity with the
  * higher-order-function formulation it replaced, null semantics, and the
  * plan contract that it runs INSIDE whole-stage codegen. */
class VectorExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("CosineSim ≡ aggregate(zip_with(...)) on random vectors (exact doubles)") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(cosineSim($"a", $"b").as("fast"), hofCos($"a", $"b").as("ref"))
    val bad = df.filter($"fast" =!= $"ref").count()
    assert(bad == 0, s"$bad rows diverge from the HOF formulation")
    // sanity: self-similarity is 1
    val self = rows.take(5).map(_._1).toSeq.toDF("a")
      .select(cosineSim($"a", $"a")).as[Double].collect()
    self.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("float-array inputs are bit-identical to decoding to double first") {
    // (double)(float) is exact IEEE widening, so computing straight off the
    // raw float vectors must reproduce the decode-first doubles EXACTLY —
    // this is what lets similarPairs shuffle floats (half the bytes)
    // without moving a single cosine at the oracle's 4-dp rounding
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(300)((
      Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat),
      Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    val dec = (c: org.apache.spark.sql.Column) => transform(c, _.cast("double"))
    val df = rows.toDF("af", "bf").select(
      cosineSim($"af", $"bf").as("ff"),
      cosineSim(dec($"af"), dec($"bf")).as("dd"),
      cosineSim($"af", dec($"bf")).as("fd"))
    assert(df.filter($"ff" =!= $"dd" || $"fd" =!= $"dd").count() == 0,
      "float-side evaluation diverged from the decoded-double reference")
  }

  test("null inputs propagate null; interpreted eval agrees with codegen") {
    val df = Seq(
      (Some(Array(1.0, 0.0)), Some(Array(1.0, 0.0))),
      (None, Some(Array(1.0, 0.0)))
    ).toDF("a", "b")
    val got = df.select(cosineSim($"a", $"b")).collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).isNullAt(0))
    // interpreted path (no codegen) must agree
    val expr = graft.functions.CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(3.0, 4.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(4.0, 3.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(math.abs(expr.eval(null).asInstanceOf[Double] - 24.0 / 25.0) < 1e-15)
  }

  test("plan contract: CosineSim runs inside WholeStageCodegen") {
    // non-foldable input (id-dependent arrays) so the projection cannot be
    // constant-folded into a LocalTableScan
    val base = spark.range(16).select(
      transform(sequence(lit(1), lit(8)), j => (j + $"id").cast("double")).as("a"),
      transform(sequence(lit(1), lit(8)), j => (j * 2 - $"id").cast("double")).as("b"))
    val fast = base.select(cosineSim($"a", $"b").as("cos"))
    // the native expression stays inside the codegen'd projection — the
    // HOF formulation it replaced is CodegenFallback and breaks the stage
    // (that asymmetry is the point of shipping a native Expression)
    val plan = fast.queryExecution.executedPlan
    val codegenProjects = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenProjects.nonEmpty, s"no codegen stage:\n$plan")
    assert(plan.toString.contains("cosine_sim"), s"expression missing:\n$plan")
    val hof = base.select(hofCos($"a", $"b").as("cos"))
    assert(fast.except(hof).count() == 0 && hof.except(fast).count() == 0)
  }

  test("GraftExtensions: cosine_sim callable from SQL") {
    graft.functions.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(3.0d, 4.0d), array(4.0d, 3.0d)) AS c").as[Double].head()
    assert(math.abs(got - 24.0 / 25.0) < 1e-15)
    // arity error surfaces at analysis, not execution
    val err = intercept[Exception](spark.sql("SELECT cosine_sim(array(1.0d))").collect())
    assert(err.getMessage.contains("2 arguments"))
  }
}
