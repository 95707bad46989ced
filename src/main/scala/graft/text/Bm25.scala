package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 (Okapi, Lucene's +1 idf variant) top-k document retrieval —
  * the lexical-search operator of a training-data pipeline (quality
  * filtering by query relevance, eval-set mining, RAG corpus probes).
  *
  * 100 TB design: the query's terms are pushed INTO the token explode
  * (`filter(__toks, t -> t IN qs)`), so the exploded row count is
  * bounded by occurrences of query terms, never total tokens.
  * Everything the scoring formula needs beyond that — document
  * frequency per query term (≤ |q| rows), corpus size and average doc
  * length (1 row) — broadcasts; there is no shuffle of anything
  * proportional to corpus tokens, and the final top-k is a
  * TakeOrderedAndProject, never a global sort. The corpus is scanned
  * twice (term hits + corpus length stats) ON PURPOSE — the stats pass
  * reads only the text column and shuffles 1 row, cheaper at scale
  * than persisting a tokenized corpus (the d8 trade-off); a pipeline
  * issuing MANY queries would materialize (doc_id, dl) once instead.
  *
  * Cross-engine determinism: `avgdl` is rounded to 4 decimals before
  * entering the score (an average's summation order is engine-
  * specific; everything downstream is then pure per-row IEEE
  * arithmetic on exact integers), ranking orders by the ROUNDED score
  * with a doc-id tie-break, and the default k1/b are exactly
  * representable binary64 values (1.5, 0.75) so an oracle can state
  * the same constants as decimal literals.
  */
object Bm25 {

  /** Top-k docs for a bag-of-terms query. Output: doc_id, n_terms
    * (distinct query terms matched), score (rounded, 6dp). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k: Int,
           k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    val qs = array(queryTerms.map(lit): _*)
    // Two-step projection (the shingleRows idiom): materialize the
    // token array as an attribute first, so the explode's filter
    // lambda does not re-inline the regex split per reference.
    val toks = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("__toks"))
    val hits = toks.select(col("doc_id"), size(col("__toks")).as("dl"),
        explode(filter(col("__toks"), t => array_contains(qs, t))).as("term"))
    val tf = hits.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      round(avg(size(col("__toks"))) + lit(1e-9), 4).as("avgdl"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("w",
        col("idf") * (col("tf") * (lit(k1) + lit(1.0)))
          / (col("tf") + lit(k1)
            * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("w")) + lit(1e-9), 6).as("score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
  }
}
