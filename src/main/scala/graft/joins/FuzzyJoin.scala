package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching — the candidate-generation half of entity
  * resolution (record linkage / MDM): pairs are enumerated ONLY inside
  * equal-`block` cells, then scored with the codegen'd `levenshtein`
  * builtin and kept under `maxDist`. The contract is the same as every
  * dedup candidate generator in this repo (`Dedup.lshCandidates`,
  * `Similarity.nearDupPairs`): NEVER all-pairs — the block key bounds
  * the fan-out to Σ block_size², which the caller controls by choosing
  * a selective blocking key (prefix, phonetic code, sorted-token key).
  * At 100 TB this is the standard ER shape: a blocking pass, a
  * bounded pairwise scorer, then component canonicalization
  * ([[graft.graph.Components]]) over the match edges.
  */
object FuzzyJoin {

  /** Self-match `(a_id, b_id, dist)` with `a_id < b_id`: record pairs
    * in the same block whose `textCol` edit distance is ≤ `maxDist`.
    * One block-keyed shuffle per side; the pairwise scorer runs inside
    * the join — no materialized candidate set. */
  def selfMatch(df: DataFrame, idCol: String, textCol: String,
                block: Seq[Column], maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist $maxDist must be >= 0")
    val blockCols = block.zipWithIndex.map { case (c, i) => c.as(s"__b$i") }
    val keys = block.indices.map(i => s"__b$i")
    val a = df.select(blockCols :+ col(idCol).as("a_id")
      :+ col(textCol).as("__a_txt"): _*)
    val b = df.select(blockCols :+ col(idCol).as("b_id")
      :+ col(textCol).as("__b_txt"): _*)
    a.join(b, keys)
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("__a_txt"), col("__b_txt")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
  }
}
