package graft.sim

import org.apache.spark.ml.clustering.KMeansModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A fitted IVF coarse quantizer — the production lifecycle is build
  * the index ONCE, query it many times, so the model is a first-class
  * value: `IvfAnn.fit` → [[save]] → `IvfAnn.load` → `IvfAnn.search`.
  * Wraps the Spark ML KMeansModel directly so a reloaded index assigns
  * cells bit-identically to the fresh fit (same BLAS path), rather
  * than re-deriving assignments from a centroid table. */
final case class IvfModel(km: KMeansModel) {
  def nCells: Int = km.clusterCenters.length
  def seed: Long = km.getSeed
  /** Persist the quantizer (Spark ML persistence — parquet + metadata
    * under `path`; cluster-readable, versioned by Spark). */
  def save(path: String): Unit = km.write.overwrite().save(path)
}

/** IVF (inverted-file) ANN: coarse KMeans quantizer bins the corpus into
  * cells; each query probes only its `nprobe` nearest cells. The
  * standard recall/cost knob — nprobe=1 recalls ~0.34 on near-isotropic
  * embeddings, 2 ≈ 2×, 3 ≈ 0.7+ (asserted in AnnRecallSpec) — while the
  * scanned fraction stays nprobe/nCells of the corpus. At 100 TB,
  * nCells scales with the corpus (cells ≈ corpus / target cell size)
  * and the quantizer fits on a bounded sample.
  */
object IvfAnn {

  /** Fit the coarse quantizer on a BOUNDED deterministic sample of the
    * corpus (seeded hash-order + limit → TakeOrderedAndProject: a
    * per-partition bounded heap, never a full sort or full-corpus
    * materialization), then coalesce(1) (cf. MlPack.kmeans5): the
    * sample is head-sized at any corpus scale and every Lloyd
    * iteration is one job — one task per iteration beats 32 near-empty
    * launches. */
  def fit(df: DataFrame, idCol: String, vecCol: String, nCells: Int = 8,
          seed: Long = 42L, quantizerSampleSize: Int = 0): IvfModel = {
    val e = asFeatures(df, idCol, vecCol)
    val sampleN =
      if (quantizerSampleSize > 0) quantizerSampleSize
      else math.max(256 * nCells, 2048)
    val fitInput = quantizerFitInput(e, sampleN, seed).coalesce(1).persist()
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nCells).setSeed(seed).setFeaturesCol("features").setPredictionCol("cell")
    val fitted = km.fit(fitInput)
    fitInput.unpersist()
    IvfModel(fitted)
  }

  /** Reload a quantizer persisted with [[IvfModel.save]]. */
  def load(path: String): IvfModel = IvfModel(KMeansModel.load(path))

  /** Probe a fitted index: top-k most-cosine-similar corpus rows per
    * query row (self excluded). `queryPred` selects the query subset of
    * `df`; both sides come from the same frame (the self-search shape
    * of the s3 benchmark). Centroids are broadcast; candidates are
    * bound by cell membership (nprobe/nCells of the corpus); ranking
    * is a row_number window over the bounded candidate set. */
  def search(model: IvfModel, df: DataFrame, idCol: String, vecCol: String,
             queryPred: Column, k: Int, nprobe: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val e = asFeatures(df, idCol, vecCol)
    val binned = model.km.transform(e).drop("features")
    // rank all centroids per query by L2 distance, keep nprobe
    val centers = model.km.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }.toSeq.toDF("cell", "center")
    val qBase = binned.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val wc = Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))
    val probes = qBase.crossJoin(broadcast(centers))
      .withColumn("cdist", aggregate(
        zip_with(col("qv"), col("center"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    val scored = binned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", Similarity.cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("cell"), col("vec_id").as("corpus_id"),
        col("cos"), col("rank"))
  }

  /** Fused fit + search convenience (the s3 benchmark shape). */
  def topK(df: DataFrame, idCol: String, vecCol: String, queryPred: Column,
           k: Int, nCells: Int = 8, nprobe: Int = 2, seed: Long = 42L,
           quantizerSampleSize: Int = 0): DataFrame =
    search(fit(df, idCol, vecCol, nCells, seed, quantizerSampleSize),
      df, idCol, vecCol, queryPred, k, nprobe)

  /** Rename to the (vec_id, v) convention and add the ML-vector view.
    * NOT normalization: the quantizer bins RAW vectors (cosine ranking
    * re-normalizes per pair inside Similarity.cosine). */
  private def asFeatures(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("features", array_to_vector(col("v")))
  }

  /** Deterministic bounded sample for the coarse-quantizer fit (see
    * [[graft.operators.Sampling.hashOrderedLimit]] for the plan-shape
    * guarantees). Exposed for IvfQuantizerSpec's bound assertion. */
  private[graft] def quantizerFitInput(e: DataFrame, sampleN: Int,
                                       seed: Long): DataFrame =
    graft.operators.Sampling.hashOrderedLimit(e, col("vec_id"), sampleN, seed)
}
