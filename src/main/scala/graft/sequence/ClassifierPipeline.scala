package graft.sequence

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.analytics.{Analytics, Metrics}

/** EP3 — the reference's classification pipeline
  * (`src/models/lstm_forecasting.py:194-323`) as one API:
  * per-key z-scored feature → sliding sequences (W15) → ordered
  * 70/15/15 split (W16) → pluggable classifier head → per-class
  * P/R/F1 + accuracy (G14).
  *
  * The torch LSTM is replaced by Spark ML's MLP per the SURVEY M9
  * verdict — the queries around the head are the engine capability; the
  * head itself is a swappable component with the same (features, label)
  * contract.
  */
object ClassifierPipeline {

  final case class Result(metrics: DataFrame, nTrain: Long, nTest: Long)

  /** Single-feature convenience form. */
  def run(panel: DataFrame, keyCol: String, ordCol: String, tiebreakCol: String,
          valueCol: String, labelCol: String, labels: Seq[String],
          seqLen: Int = 30, seed: Long = 42L, maxIter: Int = 30,
          hidden: Int = 16): Result =
    run(panel, keyCol, ordCol, tiebreakCol, Seq(valueCol), labelCol, labels,
      seqLen, seed, maxIter, hidden)

  /** @param panel       (key, ord, tiebreak, features..., label) columns
    * @param featureCols feature columns — the reference uses the
    *                    16-column `FeatureEngineering.prepare` frame;
    *                    sequences are seqLen × |features| flattened
    * @param seqLen      sequence length (reference: 30)
    * @param labels      label vocabulary (stable index order) */
  def run(panel: DataFrame, keyCol: String, ordCol: String, tiebreakCol: String,
          featureCols: Seq[String], labelCol: String, labels: Seq[String],
          seqLen: Int, seed: Long, maxIter: Int, hidden: Int): Result = {
    import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
    import org.apache.spark.ml.functions.array_to_vector

    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol), col(tiebreakCol))
    val wKey = Window.partitionBy(col(keyCol))
    // per-key per-column z-score (sklearn StandardScaler, ddof=0, fit on
    // the full key like the reference); a zero-variance column scales to
    // 0 exactly as sklearn's scale_=1-when-var-0 rule yields
    val zs = featureCols.foldLeft(panel)((d, c) =>
      d.withColumn(s"__z_$c",
        coalesce(Analytics.zscore(col(c), wKey), lit(0.0))))
    val vec = array(featureCols.map(c => col(s"__z_$c")): _*)
    val seqs = zs
      .withColumn("__seq", lag(Sequences.slidingSequence(vec, seqLen, w), 1).over(w))
      .withColumn("__label",
        labels.zipWithIndex.foldLeft(lit(-1.0)) { case (acc, (l, i)) =>
          when(col(labelCol) === l, i.toDouble).otherwise(acc)
        })
      .filter(col("__seq").isNotNull)
      .withColumn("__bucket", Sequences.orderedSplit(w))
      .select(array_to_vector(flatten(col("__seq"))).as("features"),
        col("__label").as("label"), col("__bucket"))
      // One persist of the shared sequence frame: train count, the fit
      // input and the test transform all filter this cache — persisting
      // the two filtered splits instead re-ran the whole window+sequence
      // pipeline once per split materialization.
      .persist()

    val train = seqs.filter(col("__bucket") === "train")
    val test = seqs.filter(col("__bucket") === "test")
    // Every LBFGS iteration is one job over the training partitions; for
    // a head-sized training set (the reference trains ~10^3..10^5
    // sequences) 32 near-empty partitions mean ~30 jobs × 32 task
    // launches of scheduling, not math. Compact small inputs to one
    // partition; genuinely large inputs keep their layout.
    val nTrain = train.count()
    val fitInput =
      if (nTrain <= 100000) train.repartition(1).persist() else train
    val mlp = new MultilayerPerceptronClassifier()
      .setLayers(Array(seqLen * featureCols.size, hidden, labels.size))
      .setSeed(seed)
      .setMaxIter(maxIter).setFeaturesCol("features").setLabelCol("label")
    val model = mlp.fit(fitInput)
    val preds = model.transform(test)
      .select(col("label").cast("int").as("y"),
        col("prediction").cast("int").as("p"))
    // Materialize the (per-class-sized) metrics while the caches are
    // live, then release them — a long-lived session must not accumulate
    // one train+test+fitInput cache residue per run().
    val lazyMetrics = Metrics.perClassF1(preds, "y", "p")
    val metricRows = lazyMetrics.collect()
    val nTest = test.count()
    if (fitInput ne train) fitInput.unpersist()
    seqs.unpersist()
    val spark = panel.sparkSession
    val metrics = spark.createDataFrame(
      java.util.Arrays.asList(metricRows: _*), lazyMetrics.schema)
    Result(metrics, nTrain, nTest)
  }
}
