package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotProduct, SimHash64}
import graft.ops.{Dedup, Similarity}

class NativeExprSpec extends AnyFunSuite with SharedSpark {

  test("dot_product: bit-identical to the higher-order-function formulation") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    val paired = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(500)
      .select(
        DotProduct.dot_product(col("a.v"), col("b.v")).as("native"),
        Similarity.dotHof(col("a.v"), col("b.v")).as("hof"))
    assert(paired.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("dot_product: known values, null propagation") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(DotProduct.dot_product(col("a"), col("b"))).first().getDouble(0)
      === 32.0)
    val withNull = df.select(
      DotProduct.dot_product(lit(null).cast("array<double>"), col("b")).as("d"))
    assert(withNull.first().isNullAt(0))
  }

  test("word_shingles: identical shingle sets to the HOF formulation on real docs") {
    val docs = Tables.documents(spark, sf)
    val native = Dedup.shingles(docs)
    val hof = Dedup.shinglesHof(docs)
    assert(native.exceptAll(hof).count() === 0)
    assert(hof.exceptAll(native).count() === 0)
    // short-doc edge: fewer tokens than n yields no rows (not a bogus shingle)
    import spark.implicits._
    val short = Seq((1L, "only two")).toDF("doc_id", "text")
    assert(Dedup.shingles(short).count() === 0)
  }

  test("simhash64: identical to the explode/aggregate formulation on real docs") {
    val docs = Tables.documents(spark, sf)
    val native = Dedup.simHash(docs)
    val shuffled = Dedup.simHashViaExplode(docs)
    val joined = native.as("n").join(shuffled.as("s"),
      col("n.doc_id") === col("s.doc_id"))
    assert(joined.filter(col("n.simhash") =!= col("s.simhash")).count() === 0)
  }

  test("simhash64: stable value and near-identical texts have small hamming distance") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota MUTATED"),
      (3L, "totally unrelated content with other words entirely different")
    ).toDF("doc_id", "text")
    val sig = Dedup.simHash(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(1L), sig(2L)) < hamming(sig(1L), sig(3L)))
    // determinism across invocations
    val again = Dedup.simHash(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sig === again)
  }
}
