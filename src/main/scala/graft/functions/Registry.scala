package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Registers the engine's native expressions as SQL functions so `spark.sql` users get
  * them too (same registry path Spark's own built-ins use — no UDF wrapping).
  *
  * The canonical list lives in [[injectables]], consumed two ways: [[registerAll]] for
  * an existing session, and [[graft.GraftExtensions]] for conf-driven injection
  * (`spark.sql.extensions=graft.GraftExtensions`) at session build time.
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

  private def entry(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getCanonicalName, name), builder)

  /** Every native SQL function: (identifier, info, builder). */
  val injectables: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      entry("rolling_hash", classOf[RollingHash], exprs => RollingHash(exprs.head)),
      entry("nfc_normalize", classOf[NfcNormalize], exprs => NfcNormalize(exprs.head)),
      entry("simhash64", classOf[SimHash64], exprs => SimHash64(exprs.head)),
      entry("char_entropy", classOf[CharEntropy], exprs => CharEntropy(exprs.head)),
      entry("dot_product", classOf[DotProduct],
        exprs => DotProduct(exprs(0), exprs(1))),
      entry("word_shingles", classOf[WordShingles],
        exprs => WordShingles(exprs.head,
          foldableIntArg("word_shingles", "n", exprs(1)))),
      entry("bottom_k_by_key", classOf[BottomKByKey],
        exprs => BottomKByKey(exprs(0), exprs(1),
          foldableIntArg("bottom_k_by_key", "k", exprs(2)))),
      entry("approx_top_items", classOf[ApproxTopItems],
        exprs => ApproxTopItems(exprs.head,
          foldableIntArg("approx_top_items", "k", exprs(1)))),
      // bloom membership kernels (Spark ships these internally for runtime join
      // pruning but gives them no SQL name): bloom_filter_agg(key, items, bits)
      // builds the artifact, might_contain(bloom, key) probes it — both hash the
      // key through the same xxhash64, so SQL builds and probes stay consistent
      entry("bloom_filter_agg",
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
        exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(0))),
          exprs(1), exprs(2)).toAggregateExpression()),
      entry("might_contain",
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
        exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0),
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(1))))))

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    injectables.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
