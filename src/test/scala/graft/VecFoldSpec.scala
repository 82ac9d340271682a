package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.ops.Similarity

/** [[graft.functions.VecFoldExpression]] must be BIT-IDENTICAL to the old
  * `aggregate(zip_with(...))` higher-order formulation it replaced in
  * Similarity.dot/l2sq — same left-fold order, same float→double widening,
  * same null semantics (null array, null element, mismatched lengths).
  */
class VecFoldSpec extends SparkSpec with GenSamples {

  // the pre-round-6 formulations, verbatim
  private def oldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  private def oldL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  private val vecGen: Gen[Seq[java.lang.Float]] = for {
    n <- Gen.choose(0, 12)
    v <- Gen.listOfN(n, Gen.frequency(
      (19, Gen.choose(-8.0f, 8.0f).map(java.lang.Float.valueOf)),
      (1, Gen.const(null: java.lang.Float))))
  } yield v

  test("dot/l2sq equal the old HOF expressions bit-for-bit (incl. nulls, length mismatch)") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("b", ArrayType(FloatType, containsNull = true), nullable = true)))
    forAll(Gen.listOfN(30, Gen.zip(
      Gen.option(vecGen), Gen.option(vecGen))), n = 8) { pairs =>
      val rows = pairs.map { case (a, b) => Row(a.map(_.toSeq).orNull, b.map(_.toSeq).orNull) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val got = df.select(
        Similarity.dot(col("a"), col("b")).as("d"),
        Similarity.l2sq(col("a"), col("b")).as("l"),
        oldDot(col("a"), col("b")).as("d0"),
        oldL2(col("a"), col("b")).as("l0")).collect()
      got.foreach { r =>
        assert(r.isNullAt(0) === r.isNullAt(2), s"dot nullness diverged: $r")
        assert(r.isNullAt(1) === r.isNullAt(3), s"l2sq nullness diverged: $r")
        if (!r.isNullAt(0))
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
            java.lang.Double.doubleToRawLongBits(r.getDouble(2)), s"dot bits diverged: $r")
        if (!r.isNullAt(1))
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ===
            java.lang.Double.doubleToRawLongBits(r.getDouble(3)), s"l2sq bits diverged: $r")
      }
    }
  }

  test("float vector against double literal array (the l2sqLit shape)") {
    import spark.implicits._
    val df = Seq(Seq(1.5f, -2.25f, 3.0f), Seq(0.0f, 0.1f, 0.2f)).toDF("v")
    val ce = Seq(0.5, 0.25, -1.75)
    val lits = array(ce.map(lit): _*)
    val got = df.select(
      Similarity.l2sq(col("v"), lits).as("l"),
      aggregate(zip_with(col("v"), lits,
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, d) => acc + d).as("l0")).collect()
    got.foreach(r => assert(
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
  }
}
