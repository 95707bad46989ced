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
    * (distinct query terms matched), score (rounded, 6dp). An empty
    * query returns an empty frame (matching [[topKBatch]]'s pinned
    * empty-query-set behavior — an empty `array()` literal would be
    * NullType and fail analysis in the membership lambda). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k: Int,
           k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    if (queryTerms.isEmpty)
      return docs.select(col(idCol).as("doc_id")).limit(0)
        .withColumn("n_terms", lit(0L)).withColumn("score", lit(0.0))
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

  /** Batch retrieval: per-query top-k for a (query_id, term) table —
    * the production shape (a query SET scores in one corpus pass).
    *
    * Same plan skeleton as [[topK]] with the term membership test
    * replaced by a broadcast join against the query table: the explode
    * emits every corpus token, but the SAME-STAGE broadcast hash join
    * discards non-query terms before anything shuffles — pair volume on
    * the wire is bounded by query-term occurrences, token-proportional
    * work is pipelined CPU only (unlike topK, whose filter sits inside
    * the explode). df is computed once per distinct term (not per query),
    * and the
    * per-query top-k is the bounded-heap
    * [[graft.operators.TopK.perKey]] — O(queries × k) shuffled, never
    * a per-query sort. Scoring arithmetic is identical to [[topK]],
    * so a single-query batch returns exactly topK's rows (spec-pinned).
    *
    * Output: query_id, doc_id, n_terms, score, rank (1..k). */
  def topKBatch(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, queryIdCol: String, termCol: String,
                k: Int, k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    // distinct: a repeated term inside one query must not double its
    // contribution (bag-of-terms ⇒ set semantics, matching topK's IN)
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(termCol).as("term")).distinct()
    val allTerms = q.select(col("term")).distinct()
    val toks = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("__toks"))
    val hits = toks.select(col("doc_id"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .join(broadcast(allTerms), "term")
    val tf = hits.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      round(avg(size(col("__toks"))) + lit(1e-9), 4).as("avgdl"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("w",
        col("idf") * (col("tf") * (lit(k1) + lit(1.0)))
          / (col("tf") + lit(k1)
            * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .join(broadcast(q), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("w")) + lit(1e-9), 6).as("score"))
    graft.operators.TopK.perKey(scored, Seq("query_id"),
      Seq(graft.operators.TopK.descNullsLast(col("score")), col("doc_id")),
      k, "rank")
  }
}
