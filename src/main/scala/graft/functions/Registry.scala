package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers the engine's native expressions as SQL functions so `spark.sql` users get
  * them too (same registry path Spark's own built-ins use — no UDF wrapping).
  */
object Registry {

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHash(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    registry.createOrReplaceTempFunction("bottom_k_by_key",
      exprs => BottomKByKey(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int]), "built-in")
  }
}
