package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BloomIndex

class BloomIndexSpec extends AnyFunSuite with SharedSpark {

  private def keysDf(keys: Seq[String]) = {
    import spark.implicits._
    keys.toDF("k")
  }

  test("no false negatives: every built key is maybe-seen, under any partitioning") {
    val corpus = (1 to 2000).map(i => s"key_$i")
    for (parts <- Seq(1, 7)) {
      val bloom = BloomIndex.build(keysDf(corpus).repartition(parts), col("k"),
        expectedItems = 2000, fpp = 0.01)
      val missed = keysDf(corpus)
        .filter(!BloomIndex.mightContain(bloom, col("k"))).count()
      assert(missed === 0L, s"bloom lost keys at $parts partitions")
    }
  }

  test("a build past the session bloom caps fails fast instead of silently clamping") {
    // BloomFilterAggregate would Math.min the size down to
    // spark.sql.optimizer.runtime.bloomFilter.maxNumItems/.maxNumBits (4M / 2^26
    // by default) with no signal — the fpp quietly explodes. build() must refuse.
    val e = intercept[IllegalArgumentException] {
      BloomIndex.build(keysDf(Seq("a")), col("k"),
        expectedItems = 50_000_000L, fpp = 0.01)
    }
    assert(e.getMessage.contains("maxNumItems"))
  }

  test("false-positive rate on fresh keys stays near the configured fpp") {
    val corpus = (1 to 5000).map(i => s"key_$i")
    val bloom = BloomIndex.build(keysDf(corpus), col("k"), 5000, fpp = 0.01)
    val fresh = (1 to 20000).map(i => s"other_$i")
    val fp = keysDf(fresh).filter(BloomIndex.mightContain(bloom, col("k"))).count()
    val rate = fp.toDouble / fresh.size
    assert(rate < 0.03, s"fp rate $rate far above configured 0.01")
  }

  test("the artifact is deterministic: same corpus, any partitioning, same bytes") {
    // a bitset OR is order- and partitioning-independent, so incremental rebuilds
    // are reproducible artifacts, not snowflakes
    val corpus = (1 to 3000).map(i => s"k$i")
    val a = BloomIndex.build(keysDf(corpus).repartition(3), col("k"), 3000, 0.01)
    val b = BloomIndex.build(keysDf(corpus).repartition(11).sortWithinPartitions("k"),
      col("k"), 3000, 0.01)
    assert(java.util.Arrays.equals(a, b))
  }

  test("newKeysOnly is exact: equals the plain anti-join on overlapping batches") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val index = (1 to 3000).map(i => s"doc_${rnd.nextInt(4000)}").distinct
    val batch = (1 to 2000).map(i => s"doc_${rnd.nextInt(8000)}").distinct
    val indexDf = keysDf(index).withColumnRenamed("k", "key")
    val batchDf = keysDf(batch).withColumnRenamed("k", "key")
      .withColumn("payload", length(col("key")))
    val bloom = BloomIndex.build(indexDf, col("key"), index.size, 0.01)
    val got = BloomIndex.newKeysOnly(batchDf, "key", indexDf, bloom)
      .select("key").as[String].collect().sorted.toSeq
    val want = batchDf.join(indexDf, Seq("key"), "left_anti")
      .select("key").as[String].collect().sorted.toSeq
    assert(got === want)
    // payload columns survive the union path
    assert(BloomIndex.newKeysOnly(batchDf, "key", indexDf, bloom)
      .columns.toSeq === Seq("key", "payload"))
  }

  test("save/load round-trips the artifact through the filesystem") {
    val corpus = (1 to 500).map(i => s"k$i")
    val bloom = BloomIndex.build(keysDf(corpus), col("k"), 500, 0.01)
    val path = Files.createTempDirectory("bloom").toString + "/corpus.bloom"
    BloomIndex.save(spark, bloom, path)
    val back = BloomIndex.load(spark, path)
    assert(java.util.Arrays.equals(bloom, back))
    assert(keysDf(corpus).filter(!BloomIndex.mightContain(back, col("k"))).count() === 0)
  }

  test("pure SQL: bloom_filter_agg builds the artifact, might_contain probes it") {
    graft.functions.Registry.registerAll(spark)
    keysDf((1 to 800).map(i => s"k$i")).createOrReplaceTempView("bloom_corpus")
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW bloom_art AS
        |SELECT bloom_filter_agg(k, CAST(800 AS BIGINT), CAST(8192 AS BIGINT)) AS b
        |FROM bloom_corpus""".stripMargin)
    // one-sided: no built key may probe false
    val lost = spark.sql(
      """SELECT count(*) FROM bloom_corpus
        |WHERE NOT might_contain((SELECT b FROM bloom_art), k)""".stripMargin)
      .first().getLong(0)
    assert(lost === 0L)
    // and a fresh key population is mostly rejected
    keysDf((1 to 2000).map(i => s"fresh$i")).createOrReplaceTempView("bloom_fresh")
    val fp = spark.sql(
      """SELECT count(*) FROM bloom_fresh
        |WHERE might_contain((SELECT b FROM bloom_art), k)""".stripMargin)
      .first().getLong(0)
    assert(fp < 200, s"$fp of 2000 fresh keys flagged — artifact not selective")
  }

  test("the probe is a map-side native predicate — no shuffle, no UDF") {
    // a parquet-backed frame so the predicate survives into the physical plan
    // (a local relation would constant-fold the whole probe away)
    val docs = Tables.documents(spark, sf).select(col("text").as("k"))
    val bloom = BloomIndex.build(keysDf(Seq("a", "b")), col("k"), 10, 0.01)
    val plan = docs.filter(BloomIndex.mightContain(bloom, col("k")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe must not shuffle:\n$plan")
    assert(plan.contains("might_contain"), s"expected the native predicate:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"))
  }
}
