package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID RETRIEVAL — reciprocal-rank fusion of a lexical leg and a semantic
  * leg, the standard two-tower retrieval primitive of RAG serving and
  * training-data mining (fuse BM25-ish term matching with embedding
  * similarity; RRF from Cormack/Clarke/Buettcher, SIGIR'09: score(d) =
  * Σ_legs 1 / (k + rank_leg(d)), robust to incomparable leg score scales).
  *
  * Query model here is doc-to-doc (the dedup/mining shape): each query
  * document retrieves by BOTH its distinct-token overlap (lexical) and its
  * embedding cosine (semantic); a document missing from a leg's top list
  * simply contributes nothing for that leg — the RRF convention.
  *
  * Scale shape (100 TB): the lexical leg explodes the CORPUS's distinct
  * tokens once and hash-joins them against the BROADCAST query-side token
  * set — O(corpus tokens) map work + one aggregation shuffle keyed
  * (query, doc), never corpus×corpus. The semantic leg broadcasts the query
  * vectors through [[Similarity.cosineTopK]]'s one-pass scan. Fusion itself
  * touches only 2·legK rows per query. Both legs cut to top-`legK` BEFORE
  * the fusion join, so skew is bounded by construction.
  */
object HybridRetrieval {

  /** Per query (`idCol < numQueries`, the library's query convention): fuse
    * the top-`legK` lexical candidates (distinct-token overlap with the query
    * document, empty tokens ignored) and top-`legK` semantic candidates
    * (embedding cosine) into RRF top-`k`. Output:
    * `(query_id, rank, doc_id, rrf, lex_rank, sem_rank)` with leg ranks NULL
    * where a leg did not retrieve the document. Ties break on doc_id at
    * every ranking, so the result is deterministic and oracle-replayable.
    */
  def rrfTopK(docs: DataFrame, embeddings: DataFrame, numQueries: Int = 5,
      legK: Int = 20, k: Int = 10, rrfK: Int = 60,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(numQueries > 0 && legK > 0 && k > 0 && rrfK > 0)

    // --- lexical leg: distinct-token overlap --------------------------------
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(lower(coalesce(col(textCol), lit(""))))).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
    val qToks = toks.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"), col("tok"))
    // query tokens are numQueries documents' worth — broadcast by construction
    val overlap = toks.join(broadcast(qToks),
        toks("tok") === qToks("tok") && toks("doc_id") =!= qToks("query_id"))
      .groupBy(col("query_id"), toks("doc_id"))
      .agg(count(lit(1)).as("overlap"))
    val lexW = Window.partitionBy(col("query_id"))
      .orderBy(col("overlap").desc, col("doc_id"))
    val lex = overlap.withColumn("lex_rank", row_number().over(lexW))
      .filter(col("lex_rank") <= legK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))

    // --- semantic leg: embedding cosine (shared kernel) ---------------------
    val sem = Similarity.cosineTopK(embeddings, numQueries, legK,
        idCol = vecIdCol, vecCol = vecCol)
      .select(col("query_id"), col(vecIdCol).as("doc_id"),
        col("rank").as("sem_rank"))

    // --- fusion: RRF over whichever legs retrieved the document -------------
    def leg(rank: Column): Column =
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + rank.cast("double")), lit(0.0))
    val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", leg(col("lex_rank")) + leg(col("sem_rank")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"),
        col("lex_rank"), col("sem_rank"))
  }
}
