package graft.cluster

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Clustering tier (SURVEY §2.10 M1-M8).
  *
  * The reference clusters a ~100-row per-symbol feature matrix
  * (`market_analysis.py:295-394`). Spark ML KMeans/PCA/silhouette are
  * distributed; DBSCAN and Louvain have no Spark ML implementation and
  * the reference-scale inputs are tiny aggregates of the big data, so
  * they run driver-side over the collected feature matrix / edge list
  * (the aggregation that produces them is the distributed part). The
  * documented scale path for DBSCAN is an ε-radius self-join + iterative
  * connected components; for Louvain, per-level aggregation joins.
  */
object Clustering {

  /** M1/G12: standardize columns to mean 0 / population std 1 (sklearn
    * StandardScaler ddof=0 — `market_analysis.py:287-293`), computed with
    * one global agg + broadcast, not a per-row window. */
  def standardize(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      avg(col(c)).as(s"__mu_$c"), stddev_pop(col(c)).as(s"__sd_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    cols.foldLeft(joined)((d, c) =>
      d.withColumn(c, (col(c) - col(s"__mu_$c")) / nullif(col(s"__sd_$c"), lit(0.0))))
      .drop(cols.flatMap(c => Seq(s"__mu_$c", s"__sd_$c")): _*)
  }

  /** M2: KMeans(k, seed) over feature columns → input + `cluster` column;
    * also returns training cost (inertia) and centers via the model. */
  def kmeansAssign(df: DataFrame, featureCols: Seq[String], k: Int,
                   seed: Long): (DataFrame, Double, Array[Array[Double]]) = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("cluster").fit(assembled)
    val out = model.transform(assembled).drop("features")
    (out, model.summary.trainingCost, model.clusterCenters.map(_.toArray))
  }

  /** M3: silhouette (squared-Euclidean variant — Spark ML's evaluator;
    * sklearn's plain-Euclidean differs by a documented ±ε, SURVEY M3). */
  def silhouette(df: DataFrame, featureCols: Seq[String],
                 clusterCol: String): Double = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
    new ClusteringEvaluator().setFeaturesCol("features")
      .setPredictionCol(clusterCol).setMetricName("silhouette").evaluate(assembled)
  }

  /** M3 exact: plain-Euclidean silhouette over a collected point set —
    * sklearn's definition (`clustering.py:42`; Spark ML's evaluator uses
    * the squared-Euclidean variant, SURVEY M3 notes the ±ε). O(n²)
    * driver math — right for the ≤10k aggregated rows it's applied to. */
  def silhouetteExact(points: Array[Array[Double]], labels: Array[Int]): Double = {
    val n = points.length
    def dist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.sqrt(s)
    }
    val byCluster = labels.zipWithIndex.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    if (byCluster.size < 2) return 0.0
    val scores = (0 until n).map { i =>
      val own = byCluster(labels(i))
      if (own.length <= 1) 0.0
      else {
        val a = own.filter(_ != i).map(j => dist(points(i), points(j))).sum / (own.length - 1)
        val b = byCluster.filter(_._1 != labels(i)).values
          .map(m => m.map(j => dist(points(i), points(j))).sum / m.length).min
        (b - a) / math.max(a, b)
      }
    }
    scores.sum / n
  }

  /** M2 parity: sklearn `n_init=10` — run KMeans over n seeds, keep the
    * lowest-inertia model (`clustering.py:31-56`). */
  def kmeansBestOfN(df: DataFrame, featureCols: Seq[String], k: Int,
                    baseSeed: Long, nInit: Int): (DataFrame, Double, Long) = {
    val runs = (0 until nInit).map { i =>
      val (assigned, cost, _) = kmeansAssign(df, featureCols, k, baseSeed + i)
      (assigned, cost, baseSeed + i)
    }
    runs.minBy(_._2)
  }

  /** M7: PCA(k) → per-component explained variance. */
  def pcaVariance(df: DataFrame, featureCols: Seq[String], k: Int): Array[Double] = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
    new PCA().setK(k).setInputCol("features").setOutputCol("pca")
      .fit(assembled).explainedVariance.toArray
  }

  /** M5 input: sorted 2nd-nearest-neighbor distances (the DBSCAN
    * ε-tuning curve). One O(n) two-minimum scan per point instead of a
    * full sort per point — O(n²) not O(n² log n), and no per-point
    * array allocation. */
  def twoNNDistances(pts: Array[Array[Double]]): Array[Double] = {
    val n = pts.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var m1 = Double.MaxValue
      var m2 = Double.MaxValue
      var j = 0
      while (j < n) {
        if (j != i) {
          // sqrt(dx²+dy²), NOT math.hypot: hypot differs from the sqrt
          // form in the last ulp and has no SQL equivalent — this exact
          // expression order is mirrored by the DuckDB oracle so the
          // derived ε is bit-identical across engines.
          val dx = pts(i)(0) - pts(j)(0)
          val dy = pts(i)(1) - pts(j)(1)
          val d = math.sqrt(dx * dx + dy * dy)
          if (d < m1) { m2 = m1; m1 = d } else if (d < m2) m2 = d
        }
        j += 1
      }
      out(i) = if (n > 2) m2 else m1
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  /** M10: force-directed (Fruchterman–Reingold) layout — the
    * `nx.spring_layout(G, k=1/sqrt(n), iterations=50)` step of the
    * reference's Louvain network viz (`market_analysis.py:399`).
    * Driver-side over the tiny aggregated graph, like [[louvain]]: the
    * distributed part is the aggregation that produced the nodes/edges
    * (regimes × transition counts, symbols × correlation edges — dozens
    * of rows from billions). Deterministic under `seed`; positions are
    * rescaled to [-1, 1] per axis like networkx. */
  def springLayout(nodes: Seq[Long], edges: Seq[(Long, Long, Double)],
                   iterations: Int = 50, seed: Long = 42L,
                   k: Double = 0.0): Map[Long, (Double, Double)] = {
    val n = nodes.length
    if (n == 0) return Map.empty
    if (n == 1) return Map(nodes.head -> (0.0, 0.0))
    val idx = nodes.zipWithIndex.toMap
    val kk = if (k > 0) k else 1.0 / math.sqrt(n.toDouble)
    val rnd = new scala.util.Random(seed)
    val px = Array.fill(n)(rnd.nextDouble())
    val py = Array.fill(n)(rnd.nextDouble())
    val wAdj = edges.flatMap { case (a, b, w) =>
      Seq(((idx(a), idx(b)), w), ((idx(b), idx(a)), w))
    }.groupBy(_._1).map { case (kij, ws) => (kij, ws.map(_._2).sum) }
    // networkx cooling schedule: t starts at 0.1 of the frame width and
    // decays linearly to 0 across the iterations
    var t = 0.1
    val dt = t / (iterations + 1)
    var it = 0
    while (it < iterations) {
      val dx = new Array[Double](n)
      val dy = new Array[Double](n)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          if (i != j) {
            val ddx = px(i) - px(j)
            val ddy = py(i) - py(j)
            val dist = math.max(math.sqrt(ddx * ddx + ddy * ddy), 0.01)
            // net per-unit-ddx force: repulsion k²/d² for every pair,
            // attraction w·d/k per edge (FR91 with edge weights)
            var f = kk * kk / (dist * dist)
            wAdj.get((i, j)).foreach(w => f -= w * dist / kk)
            dx(i) += ddx * f
            dy(i) += ddy * f
          }
          j += 1
        }
        i += 1
      }
      i = 0
      while (i < n) {
        val len = math.max(math.sqrt(dx(i) * dx(i) + dy(i) * dy(i)), 1e-12)
        val step = math.min(len, t)
        px(i) += dx(i) / len * step
        py(i) += dy(i) / len * step
        i += 1
      }
      t -= dt
      it += 1
    }
    // rescale to [-1, 1] per axis (networkx rescale_layout)
    def rescale(a: Array[Double]): Array[Double] = {
      val mean = a.sum / n
      val c = a.map(_ - mean)
      val lim = c.map(math.abs).max
      if (lim > 0) c.map(_ / lim) else c
    }
    val rx = rescale(px); val ry = rescale(py)
    nodes.zipWithIndex.map { case (node, i) => node -> (rx(i), ry(i)) }.toMap
  }

  /** M5 scale path: the ε-tune without collecting every point. A
    * bounded deterministic sample of QUERY points (seeded hash-order +
    * limit → TakeOrderedAndProject) gets its 2nd-NN distance against
    * the FULL point set, computed distributed (broadcast sample ×
    * corpus scan, bounded heap k=2 per query) — so each sampled
    * distance is exact, and the sorted sample curve is a uniform
    * quantile subsample of the full curve (the knee is preserved; no
    * density bias, unlike 2-NN within a subsample). Below `cap` the
    * sample IS the full set and the result is bit-identical to
    * `kneeEps(twoNNDistances(pts))` — the hash-checked oracle path at
    * test scale. Pair work is n×cap: linear in the corpus for fixed
    * cap. KneeSampleSpec pins both properties. */
  def sampledKneeEps(df: DataFrame, idCol: String, xCol: String, yCol: String,
                     cap: Int = 4096, seed: Long = 42L): Double = {
    val q = graft.operators.Sampling.hashOrderedLimit(df, col(idCol), cap, seed)
      .select(col(idCol).as("__qid"), col(xCol).as("__qx"), col(yCol).as("__qy"))
    val pairs = df.select(col(idCol), col(xCol), col(yCol))
      .join(broadcast(q), col(idCol) =!= col("__qid"))
      // sqrt(dx²+dy²) in the same operand order as twoNNDistances so
      // the below-cap case is bit-identical
      .withColumn("__d", sqrt(
        (col("__qx") - col(xCol)) * (col("__qx") - col(xCol)) +
        (col("__qy") - col(yCol)) * (col("__qy") - col(yCol))))
    val top2 = graft.operators.TopK.perKey(pairs, Seq("__qid"),
      Seq(col("__d"), col(idCol)), 2, "__rk")
    // per query: the 2nd-NN distance when it exists (n > 2), else the
    // 1st — max(struct(rank, d)) picks the highest-rank surviving row,
    // mirroring twoNNDistances' `if (n > 2) m2 else m1`
    val dists = top2.groupBy(col("__qid"))
      .agg(max(struct(col("__rk"), col("__d"))).as("__m"))
      .select(col("__m.__d")).collect().map(_.getDouble(0))
    java.util.Arrays.sort(dists)
    kneeEps(dists)
  }

  /** M5: knee of the sorted k-NN distance curve (max distance to the
    * chord from first to last point — `market_analysis.py:851-875`'s
    * KneeLocator essence); falls back to the 90th percentile when the
    * curve is degenerate. */
  def kneeEps(sortedDists: Array[Double]): Double = {
    val n = sortedDists.length
    if (n < 3) return if (n == 0) 0.0 else sortedDists.last
    val (x1, y1) = (0.0, sortedDists.head)
    val (x2, y2) = ((n - 1).toDouble, sortedDists.last)
    // sqrt form, not hypot — mirrored bit-exactly by the SQL oracle.
    val len = math.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
    if (len == 0) return sortedDists.last
    var best = -1.0; var bestI = 0
    var i = 0
    while (i < n) {
      val d = math.abs((y2 - y1) * i - (x2 - x1) * sortedDists(i) + x2 * y1 - y2 * x1) / len
      if (d > best) { best = d; bestI = i }
      i += 1
    }
    val eps = sortedDists(bestI)
    if (eps > 0) eps
    else sortedDists(math.min(n - 1, (0.9 * n).toInt))
  }

  /** M4: DBSCAN over a collected point set (driver-side; reference scale
    * is ≤100 points — the distributed part is the aggregation that
    * produced them). Returns cluster id per point, -1 = noise. */
  def dbscan(points: Array[Array[Double]], eps: Double, minPts: Int): Array[Int] = {
    val n = points.length
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val eps2 = eps * eps
    val neighbors = Array.tabulate(n)(i =>
      (0 until n).filter(j => j != i && dist2(points(i), points(j)) <= eps2).toArray)
    val labels = Array.fill(n)(-2) // -2 unvisited, -1 noise
    var cluster = -1
    for (i <- 0 until n if labels(i) == -2) {
      if (neighbors(i).length + 1 < minPts) labels(i) = -1
      else {
        cluster += 1
        labels(i) = cluster
        val queue = scala.collection.mutable.Queue.empty[Int]
        queue.enqueueAll(neighbors(i))
        while (queue.nonEmpty) {
          val j = queue.dequeue()
          if (labels(j) == -1) labels(j) = cluster
          else if (labels(j) == -2) {
            labels(j) = cluster
            if (neighbors(j).length + 1 >= minPts) queue.enqueueAll(neighbors(j))
          }
        }
      }
    }
    labels
  }

  /** M6: single-level Louvain community detection over a weighted
    * undirected edge list (driver-side; ≤100 nodes at reference scale).
    * Deterministic: nodes sweep in sorted order until no move improves
    * modularity. Returns (community per node, modularity). */
  def louvain(nodes: Seq[Long], edges: Seq[(Long, Long, Double)],
              maxSweeps: Int = 20): (Map[Long, Int], Double) = {
    val idx = nodes.sorted.zipWithIndex.toMap
    val n = idx.size
    val adj = Array.fill(n)(scala.collection.mutable.Map.empty[Int, Double])
    var m2 = 0.0 // 2m
    edges.foreach { case (a, b, w) =>
      val (i, j) = (idx(a), idx(b))
      if (i != j) {
        adj(i)(j) = adj(i).getOrElse(j, 0.0) + w
        adj(j)(i) = adj(j).getOrElse(i, 0.0) + w
        m2 += 2 * w
      }
    }
    val deg = Array.tabulate(n)(i => adj(i).values.sum)
    val comm = Array.tabulate(n)(identity)
    val commDeg = deg.clone()
    if (m2 == 0) return (idx.map { case (node, i) => node -> comm(i) }, 0.0)

    var moved = true; var sweep = 0
    while (moved && sweep < maxSweeps) {
      moved = false; sweep += 1
      for (i <- 0 until n) {
        val ci = comm(i)
        commDeg(ci) -= deg(i)
        val links = scala.collection.mutable.Map.empty[Int, Double]
        adj(i).foreach { case (j, w) => links(comm(j)) = links.getOrElse(comm(j), 0.0) + w }
        var bestC = ci
        var bestGain = links.getOrElse(ci, 0.0) - commDeg(ci) * deg(i) / m2
        links.keys.toSeq.sorted.foreach { c =>
          val gain = links(c) - commDeg(c) * deg(i) / m2
          if (gain > bestGain + 1e-12) { bestGain = gain; bestC = c }
        }
        if (bestC != ci) { moved = true }
        comm(i) = bestC
        commDeg(bestC) += deg(i)
      }
    }
    // modularity Q = Σ_c (in_c/2m − (deg_c/2m)^2)
    val commIn = scala.collection.mutable.Map.empty[Int, Double]
    for (i <- 0 until n; (j, w) <- adj(i) if comm(i) == comm(j))
      commIn(comm(i)) = commIn.getOrElse(comm(i), 0.0) + w
    val commDegTot = scala.collection.mutable.Map.empty[Int, Double]
    for (i <- 0 until n)
      commDegTot(comm(i)) = commDegTot.getOrElse(comm(i), 0.0) + deg(i)
    // iterator, not .keys.map: mapping over the key Set would collapse
    // communities whose Q-contributions are numerically equal.
    val q = commDegTot.keysIterator.map { c =>
      commIn.getOrElse(c, 0.0) / m2 - math.pow(commDegTot(c) / m2, 2)
    }.sum
    // renumber communities densely in sorted order for determinism
    val renum = comm.distinct.sorted.zipWithIndex.toMap
    (idx.map { case (node, i) => node -> renum(comm(i)) }, q)
  }
}
