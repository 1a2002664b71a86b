package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextDedup, VectorSearch}

/** Property-style checks for the parameterized operator surface —
  * invariants that must hold for ANY parameter choice, complementing the
  * oracle-gated catalog queries that pin one corpus configuration. */
class OperatorsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "an entirely different text about spark plans and shuffles"),
      (4L, "the quick brown fox jumps over a lazy dog today"))
      .toDF("doc_id", "text")
  }

  test("wordShingles: count = distinct windows, width parameter respected") {
    for (n <- Seq(2, 3, 4)) {
      val sh = TextDedup.wordShingles(docs, col("doc_id"), col("text"), n)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      // doc 1 has 9 words → 9-n+1 windows, all distinct in this sentence
      assert(sh(1L).length == 9 - n + 1)
      assert(sh(1L).forall(_.split(" ").length == n))
      assert(sh(1L).distinct.length == sh(1L).length)
    }
  }

  test("minhashSignature: width = 4×seeds, 8-hex components, dup-invariant") {
    for (seeds <- 1 to 4) {
      val sig = TextDedup
        .wordShingles(docs, col("doc_id"), col("text"), 3)
        .withColumn("sig", TextDedup.minhashSignature(col("shingles"), seeds))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
      assert(sig.values.forall(_.length == 4 * seeds))
      assert(sig.values.flatten.forall(_.matches("[0-9a-f]{8}")))
      // identical documents ⇒ identical signatures, every seed count
      assert(sig(1L) == sig(2L))
    }
  }

  test("lshBands: identical signatures collide on EVERY band") {
    val bands = TextDedup.lshBands(
      TextDedup.wordShingles(docs, col("doc_id"), col("text"), 3)
        .withColumn("sig", TextDedup.minhashSignature(col("shingles"), 2)),
      bands = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byDoc = bands.groupBy(_._1)
    assert(byDoc(1L).map(b => (b._2, b._3)).toSet ==
      byDoc(2L).map(b => (b._2, b._3)).toSet)
    assert(byDoc(1L).length == 4)
  }

  test("jaccard: bounds, self-similarity, symmetry") {
    import spark.implicits._
    val pairs = Seq(
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y")
    val rows = pairs.select(
      TextDedup.jaccard(col("x"), col("y")).as("j1"),
      TextDedup.jaccard(col("y"), col("x")).as("j2")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(0) == r.getDouble(1)) // symmetric
    }
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("DotProduct.compute matches a reference loop on arbitrary vectors") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(42) // seeded: reproducible failures
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val a = Array.fill(n)(rnd.nextFloat() * 200f - 100f)
      val b = Array.fill(n)(rnd.nextFloat() * 200f - 100f)
      val got = graft.plans.DotProduct.compute(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b),
        aFloat = true, bFloat = true)
      var want = 0.0
      a.zip(b).foreach { case (x, y) => want += x.toDouble * y.toDouble }
      assert(got == want) // same order ⇒ bit-identical, not approx
    }
  }

  test("signLshBucketSql stays within [0, 2^bits) and is deterministic") {
    graft.plans.DotProduct.register(spark)
    for (bits <- Seq(2, 4, 6)) {
      val b = Tables.embeddings(spark, sf)
        .select(expr(VectorSearch.signLshBucketSql("embedding", bits))
          .as("bucket"))
        .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
        .collect()(0)
      assert(b.getInt(0) >= 0 && b.getInt(1) < (1 << bits))
    }
  }
}
