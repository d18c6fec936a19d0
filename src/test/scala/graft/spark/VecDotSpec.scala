package graft.spark

import graft.plans.VecDot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native dot kernel must be BIT-IDENTICAL to the declarative
  * aggregate(zip_with(...)) chain it replaced — oracle hash-matches depend
  * on it — and honor the chain's null semantics.
  */
class VecDotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chainDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the zip_with/aggregate chain on random float vectors") {
    val rnd = new scala.util.Random(4848280)
    val rows = (1 to 200).map { i =>
      val n = 1 + rnd.nextInt(96)
      (i.toLong, Array.fill(n)(rnd.nextFloat() * 2 - 1), Array.fill(n)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      VecDot($"a", $"b").as("native"),
      chainDot($"a", $"b").as("chain")).collect()
    out.foreach { r =>
      // exact bit equality, not approximate
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null semantics: null array, null element, length mismatch -> null") {
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1f))
    ).toDF("id", "a", "b")
    val r = df.select($"id", VecDot($"a", $"b").as("d")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(r(1L).contains(11.0))
    assert(r(2L).isEmpty)
    // null ELEMENT (not expressible as an Array[Float] literal): must be
    // null, not a silent 0.0 contribution — parity with the zip_with chain
    val elem = spark.sql(
      "SELECT array(1.0f, cast(null AS float)) AS a, array(2.0f, 3.0f) AS b")
      .select(VecDot($"a", $"b").as("d")).head()
    assert(elem.isNullAt(0), "null element must yield null dot product")
    // length mismatch
    val lm = Seq((Array(1f, 2f, 3f), Array(1f))).toDF("a", "b")
      .select(VecDot($"a", $"b")).head()
    assert(lm.isNullAt(0))
  }

  test("double arrays and mixed float/double element types work") {
    val d = Seq((Array(0.5, 0.25), Array(2.0, 4.0))).toDF("a", "b")
      .select(VecDot($"a", $"b")).head().getDouble(0)
    assert(d == 2.0)
    val mixed = Seq((Array(1f, 2f), Array(0.5, 0.25))).toDF("a", "b")
      .select(VecDot($"a", $"b")).head().getDouble(0)
    assert(mixed == 1.0)
  }

  test("rejects non-array inputs at analysis time") {
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(VecDot($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("vec_dot"))
  }
}
