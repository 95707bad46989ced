package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Rx.r4

/** Multinomial Naive Bayes over token arrays — train and inference as
  * one declarative plan (the t24 query wraps this over the documents
  * table; PortableMlSpec drives it over a separable fixture to pin
  * that the scoring path actually classifies).
  *
  * Scale shape: train = one (class, token)-keyed count; inference =
  * one token-keyed join of test tokens against the likelihood table
  * (never a vocab broadcast — vocabulary is the dimension that grows
  * with the corpus), then a doc-keyed argmax. Laplace smoothing; OOV
  * tokens fall to the 1/(tot_c + V) floor via the left join. Scores
  * are r4-canonicalized before the argmax (the token-order sum is the
  * one nondeterministic reduction); ties go to the smaller class.
  */
object NaiveBayes {

  /** Confusion counts `(true_label, pred, n)` for `test` scored by a
    * model fit on `train`; both frames need (idCol, labelCol,
    * toksCol: array<string>). */
  def confusion(train: DataFrame, test: DataFrame, idCol: String,
                labelCol: String, toksCol: String): DataFrame = {
    val ctc = train
      .select(col(labelCol).as("c"), explode(col(toksCol)).as("tok"))
      .groupBy(col("c"), col("tok")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = ctc.groupBy(col("c")).agg(sum(col("cnt")).as("tot_c"))
    val pri = train.groupBy(col(labelCol).as("c"))
      .agg(count(lit(1)).as("nd"))
    val ptot = pri.agg(sum(col("nd")).as("ndocs"))
    val vv = ctc.agg(countDistinct(col("tok")).as("v"))
    val tet = test.select(col(idCol).as("__id"),
      col(labelCol).as("true_label"), explode(col(toksCol)).as("tok"))
    val terms = tet
      .crossJoin(broadcast(pri.select(col("c"))))
      .join(ctc, Seq("c", "tok"), "left")
      .join(broadcast(tot), "c").crossJoin(broadcast(vv))
      .select(col("__id"), col("true_label"), col("c"),
        log((coalesce(col("cnt"), lit(0L)) + lit(1))
          / (col("tot_c") + col("v")).cast("double")).as("term"))
    val sc = terms.groupBy(col("__id"), col("true_label"), col("c"))
      .agg(sum(col("term")).as("ssum"))
      .join(broadcast(pri), "c").crossJoin(broadcast(ptot))
      .select(col("__id"), col("true_label"), col("c"),
        r4(log(col("nd").cast("double") / col("ndocs")) + col("ssum"))
          .as("score"))
    sc.groupBy(col("__id"), col("true_label"))
      .agg(min(struct(-col("score"), col("c"))).as("mn"))
      .select(col("true_label"), col("mn.c").as("pred"))
      .groupBy(col("true_label"), col("pred")).agg(count(lit(1)).as("n"))
      .orderBy(col("true_label"), col("pred"))
  }
}
