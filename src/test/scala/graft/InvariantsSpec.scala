package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._

/** §5.2 inline invariants: the fail-fast vocab fallback chain. */
class InvariantsSpec extends AnyFunSuite with SparkTestBase {

  test("vocabLookupOrFail resolves through the fallback chain") {
    import spark.implicits._
    val df = Seq(("A", Some("vocab-a"), None: Option[String]),
        ("B", None, Some("static-b")))
      .toDF("code", "vocab", "static")
    val got = df.select(
        vocabLookupOrFail(col("code"), col("vocab"), col("static")).as("v"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("vocab-a", "static-b"))
  }

  test("stableId separator prevents boundary-shift collisions") {
    import spark.implicits._
    val df = Seq(("ab", "c", "a", "bc")).toDF("a1", "a2", "b1", "b2")
    val row = df.select(
        stableId(col("a1"), col("a2")).as("h1"),
        stableId(col("b1"), col("b2")).as("h2"),
        stableId(col("a1"), col("a2")).as("h1b"))
      .collect()(0)
    assert(row.getString(0) != row.getString(1),
      "NUL separator must distinguish (ab,c) from (a,bc)")
    assert(row.getString(0) == row.getString(2), "stableId must be pure")
  }

  test("vocabLookupOrFail aborts the job on an unmappable code") {
    import spark.implicits._
    val df = Seq(("Z", None: Option[String], None: Option[String]))
      .toDF("code", "vocab", "static")
    val e = intercept[Exception] {
      df.select(vocabLookupOrFail(col("code"), col("vocab"), col("static")))
        .collect()
    }
    assert(e.getMessage.contains("unmappable vocab code: Z"))
  }
}
