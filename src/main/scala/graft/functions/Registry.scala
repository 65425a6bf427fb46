package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Registers the engine's native expressions as SQL functions so `spark.sql` users get
  * them too (same registry path Spark's own built-ins use — no UDF wrapping).
  */
object Registry {

  /** Extract a foldable integral literal argument (any integer width, e.g. `3` or `3L`),
    * failing with a readable AnalysisException instead of a ClassCastException or an
    * unresolved-expression eval error.
    */
  private def foldableIntArg(fn: String, arg: String, e: Expression): Int = {
    def fail(why: String) = throw ColumnBridge.analysisError(
      s"$fn: argument '$arg' must be a foldable integer literal, but $why")
    val integral = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!e.foldable || !integral)
      fail(s"got ${if (e.foldable) e.dataType.catalogString else e.sql}")
    e.eval() match {
      case null => fail("it evaluated to NULL")
      case n: Byte => n.toInt
      case n: Short => n.toInt
      case n: Int => n
      case n: Long =>
        if (n >= Int.MinValue && n <= Int.MaxValue) n.toInt
        else fail(s"$n overflows INT")
      case other => fail(s"it evaluated to $other")
    }
  }

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
        foldableIntArg("word_shingles", "n", exprs(1))), "built-in")
    registry.createOrReplaceTempFunction("bottom_k_by_key",
      exprs => BottomKByKey(exprs(0), exprs(1),
        foldableIntArg("bottom_k_by_key", "k", exprs(2))), "built-in")
  }
}
