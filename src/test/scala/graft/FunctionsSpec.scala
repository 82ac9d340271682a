package graft

import org.apache.spark.sql.functions._

import graft.analysis.Analyzers
import graft.functions.GraftExtensions

/** Native Catalyst expression surface: SQL results ≡ the Scala analyzer,
  * under whole-stage codegen.
  */
class FunctionsSpec extends SparkSpec {

  test("graft_tokenize SQL ≡ Analyzers.Standard, inside WholeStageCodegen") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((1L, "The Quick brown fox, foo@bar.com!"), (2L, "paxos made simple")).toDF("id", "text")
    df.createOrReplaceTempView("fx")
    val out = spark.sql(
      "SELECT id, t.term, t.pos FROM fx LATERAL VIEW explode(graft_tokenize(text)) x AS t ORDER BY id, t.pos")
    val got = out.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val want = Seq((1L, "The Quick brown fox, foo@bar.com!"), (2L, "paxos made simple")).flatMap {
      case (id, text) => Analyzers.Standard.tokens(text).map(tk => (id, tk.term, tk.pos))
    }
    assert(got.toSeq === want)
    // the projection stays codegen'd — starred stages mark WholeStageCodegen
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && !plan.contains("CodegenFallback"), plan.take(1500))
  }

  test("named analyzer argument dispatches (whitespace keeps case)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "Foo BAR")).toDF("id", "text").createOrReplaceTempView("fx2")
    val got = spark.sql("SELECT t.term FROM fx2 LATERAL VIEW explode(graft_tokenize(text, 'whitespace')) x AS t")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("Foo", "BAR"))
  }

  test("interpreted eval matches codegen path") {
    val e = graft.functions.TokenizeExpression(
      org.apache.spark.sql.catalyst.expressions.Literal("hello the world"), "standard")
    val arr = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() === 2) // "the" dropped, positions preserved
    val r0 = arr.getStruct(0, 2)
    assert(r0.getUTF8String(0).toString === "hello" && r0.getInt(1) === 0)
    val r1 = arr.getStruct(1, 2)
    assert(r1.getUTF8String(0).toString === "world" && r1.getInt(1) === 2)
  }
}
