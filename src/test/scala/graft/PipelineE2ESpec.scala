package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

/** The capstone composition: every tier of the library chained into the pipeline a
  * training-data run actually executes —
  *
  *   gopher gate → exact dedup → near-dup canonicals → duplicated-substring cut →
  *   BPE train + encode → fixed-window chunking → next-fit packing → shard emission
  *
  * Each stage is already unit- and oracle-tested; this spec pins that they COMPOSE:
  * columns survive, invariants hold on the composed output, and the whole chain is
  * deterministic under repartitioning (the property that makes a 100 TB re-run
  * reproduce the same training set).
  */
class PipelineE2ESpec extends AnyFunSuite with SharedSpark {

  test("full corpus pipeline composes, preserves invariants, and is deterministic") {
    implicit val sp = spark
    val docs = Tables.documents(spark, sf)

    def run(input: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // 1. quality + dedup tiers
      val curated = CorpusCuration.curate(input, CorpusCuration.Config(
        minQuality = 0.25,
        gopher = Some(TextAnalysis.GopherConfig(
          minWords = 15, maxWords = 100, minStopHits = 0, minAlphaWordRatio = 0.5)),
        sourceCap = Some(("source", 20))))
      // 2. surgical substring dedup on the survivors
      val cut = Dedup.dedupSubstrings(curated, windowTokens = 8)
      // 3. chunk → pack → shard
      val chunks = TextAnalysis.chunk(cut, chunkTokens = 16)
      val packed = Packing.nextFit(chunks, capacity = 64)
      Splits.shardAssign(
        packed.select(
          (col("doc_id") * 1000000 + col("chunk_id")).as("unit_id"),
          col("doc_id"), col("chunk_id"), col("n_tokens"),
          col("pack_group"), col("seq_id")),
        numShards = 4, idCol = "unit_id")
    }

    val out = run(docs).cache()
    try {
      assert(out.count() > 0)
      // every chunk respects its window and every shard its position contract
      assert(out.filter(col("n_tokens") > 16).count() === 0)
      assert(out.filter(col("shard") < 0 || col("shard") >= 4).count() === 0)
      val posOk = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("position").as("mx"))
        .filter(col("mx") =!= col("n"))
      assert(posOk.count() === 0)
      // packing capacity holds on the composed output too
      val packSum = out.groupBy("pack_group", "seq_id")
        .agg(sum("n_tokens").as("t"))
        .filter(col("t") > 64)
      assert(packSum.count() === 0)
      // the chain is deterministic under repartitioning of the raw input
      val again = run(docs.repartition(13))
      assert(out.exceptAll(again).count() === 0)
      assert(again.exceptAll(out).count() === 0)
    } finally out.unpersist()
  }

  test("pipeline + tokenizer: BPE trained on the curated corpus encodes it losslessly") {
    implicit val sp = spark
    val docs = Tables.documents(spark, sf)
    val curated = CorpusCuration.curate(docs, CorpusCuration.Config(minQuality = 0.25))
    val cut = Dedup.dedupSubstrings(curated, windowTokens = 8)
      .select("doc_id", "text")
    val model = Bpe.train(cut, numMerges = 48)
    assert(model.merges.nonEmpty)
    val enc = Bpe.encode(cut, model)
    val bad = enc.join(cut, "doc_id")
      .withColumn("rebuilt", concat_ws("", col("pieces")))
      .withColumn("expected", regexp_replace(trim(lower(col("text"))), "\\s+", ""))
      .filter(col("rebuilt") =!= col("expected"))
    assert(bad.count() === 0, "tokenizer must round-trip the curated corpus")
    // fertility reporting composes on the curated slice as well
    val curatedWithLang = curated.select("doc_id", "text", "predicted_lang")
    val rep = Bpe.fertilityByGroup(curatedWithLang, model, "predicted_lang")
    assert(rep.count() > 0)
    assert(rep.filter(col("fertility") < 1.0).count() === 0)
  }
}
