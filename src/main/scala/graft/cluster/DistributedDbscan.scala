package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M4 at scale: distributed DBSCAN (SURVEY §7.3 flags this as the one
  * genuinely hard distributed algorithm; this is the documented scale
  * path, cross-verified against the driver implementation in
  * DistributedDbscanSpec).
  *
  * Standard grid method, 2-D feature space:
  *  1. bin points into ε-side grid cells;
  *  2. ε-pairs come ONLY from same-or-adjacent cells (each point
  *     explodes to its 3×3 cell neighborhood on the probe side, so every
  *     directed pair is generated exactly once by one equi-join on the
  *     cell key — never an all-pairs cross join);
  *  3. core points = ≥ minPts-1 ε-neighbors;
  *  4. clusters = connected components of the core-core ε-graph via
  *     iterative min-label propagation (converges in O(graph diameter)
  *     join+agg rounds; lineage cut by localCheckpoint);
  *  5. border points adopt the min neighboring core label
  *     (deterministic variant of DBSCAN's first-found assignment);
  *     the rest is noise (-1).
  *
  * Each round is a shuffle on point ids over the (sparse) ε-edge list —
  * the same join-agg shape AQE handles at any scale.
  */
object DistributedDbscan {

  /** Core-edge count up to which components resolve via driver
    * union-find over the contracted graph (cf. the Louvain hybrid). */
  val collectEdgeThreshold: Long = 5000000L

  /** @return (id, cluster) with cluster = -1 for noise; cluster ids are
    *         the min member id of each component (deterministic). */
  def run(points: DataFrame, idCol: String, xCol: String, yCol: String,
          eps: Double, minPts: Int, maxIter: Int = 25): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    // localCheckpoint, not persist: the caller's lineage (typically a
    // window/aggregate feature pipeline) is re-read by the pair join's
    // build AND probe sides, the degree count and the final label join —
    // without a lineage cut each of those re-executes the upstream
    // pipeline (Catalyst does not CSE identical subplans). Checkpointing
    // the (id,x,y) projection — 3 columns, one row per point — pays one
    // materialization and makes every later scan a local block read.
    val pts = points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .localCheckpoint()

    // 1-2. grid binning + adjacent-cell pair generation
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val build = pts
      .withColumn("cx", floor($"x" / eps).cast("long"))
      .withColumn("cy", floor($"y" / eps).cast("long"))
    val probe = build.select($"id".as("id_b"), $"x".as("xb"), $"y".as("yb"),
        explode(array(offsets.map { case (dx, dy) =>
          struct(($"cx" + dx).as("cx"), ($"cy" + dy).as("cy"))
        }: _*)).as("cell"))
      .select($"id_b", $"xb", $"yb", $"cell.cx".as("cx"), $"cell.cy".as("cy"))
    val pairs = build.join(probe, Seq("cx", "cy"))
      .filter($"id" =!= $"id_b")
      // explicit multiply, not pow(x, 2): Math.pow is allowed 1 ulp of
      // error; the multiply form is an exact IEEE op and matches the
      // driver dbscan and the SQL oracle bit-for-bit.
      .withColumn("d2",
        ($"x" - $"xb") * ($"x" - $"xb") + ($"y" - $"yb") * ($"y" - $"yb"))
      .filter($"d2" <= eps * eps)
      .select($"id".as("a"), $"id_b".as("b"))
      .persist()

    // 3. core points
    val degrees = pairs.groupBy($"a".as("id")).agg(count(lit(1)).as("deg"))
    val core = pts.select($"id").join(degrees, Seq("id"), "left")
      .na.fill(0L, Seq("deg"))
      .withColumn("is_core", $"deg" + 1 >= minPts)
      .select($"id", $"is_core").persist()

    // 4. connected components over core-core edges (min-label propagation)
    val coreIds = core.filter($"is_core").select($"id")
    val coreEdges = pairs
      .join(coreIds.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(coreIds.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      .persist()
    // The ε-pair generation and degree counting above are the
    // data-proportional distributed work; the core-core edge list is a
    // CONTRACTED graph (≪ input rows). When it fits on the driver —
    // the overwhelmingly common case, same situation as the Louvain
    // graph — union-find resolves components in one pass with zero
    // extra Spark rounds. The iterative min-label + pointer-jumping
    // fallback stays for edge lists beyond the threshold.
    // Size-probe with a count first: a speculative threshold+1 collect
    // would haul up to the full multi-million-row edge list onto the
    // driver even when the distributed path is about to run — the count
    // touches the persisted edges without materializing them driver-side.
    val edgeCount = coreEdges.limit(collectEdgeThreshold.toInt + 1).count()
    var labels: DataFrame = null
    if (edgeCount <= collectEdgeThreshold) {
      val edges = coreEdges.select($"a", $"b").as[(Long, Long)].collect()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val resolved = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => (id, find(id)))
      labels = spark.createDataFrame(resolved.toSeq).toDF("id", "label")
      // isolated cores (no core neighbor) label themselves
      labels = coreIds.join(labels, Seq("id"), "left")
        .withColumn("label", coalesce($"label", $"id"))
    } else {
      labels = coreIds.withColumn("label", $"id")
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        val candidate = coreEdges
          .join(labels.withColumnRenamed("id", "b").withColumnRenamed("label", "lb"),
            Seq("b"))
          .groupBy($"a".as("id")).agg(min($"lb").as("nl"))
        val propagated = labels.join(candidate, Seq("id"), "left")
          .withColumn("label", least($"label", coalesce($"nl", $"label")))
          .select($"id", $"label")
        // pointer-jumping: label ← label's label halves path lengths
        val compressed = propagated.as("p")
          .join(propagated.select($"id".as("label"), $"label".as("gl")).as("g"),
            Seq("label"), "left")
          .select($"id", least($"label", coalesce($"gl", $"label")).as("label"))
          .localCheckpoint()
        val changes = compressed
          .join(labels.withColumnRenamed("label", "old"), Seq("id"))
          .filter($"label" =!= $"old").count()
        labels = compressed
        converged = changes == 0
        iter += 1
      }
    }

    // 5. border attachment + noise. Core and border ids are disjoint
    // (border candidates anti-join the cores), so ONE unioned label map
    // and ONE left join produce the output — instead of stacking
    // is_core + core_label + border_label joins and resolving with a
    // conditional.
    val borderLabels = pairs
      .join(labels.withColumnRenamed("id", "b").withColumnRenamed("label", "lb"), Seq("b"))
      .join(coreIds.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
      .groupBy($"a".as("id")).agg(min($"lb").as("label"))
    // Checkpoint the label map (≤ one row per labeled point) BEFORE
    // dropping the cached intermediates: the returned plan is lazy, and
    // unpersisting first would force the caller's materialization to
    // re-run the ε-pair join from scratch (observed: m4b re-executed the
    // whole pair generation inside the bench's write after run()
    // returned).
    val labelMap = labels.unionByName(borderLabels).localCheckpoint()
    pairs.unpersist(); core.unpersist(); coreEdges.unpersist()
    pts.select($"id")
      .join(labelMap, Seq("id"), "left")
      .select($"id", coalesce($"label", lit(-1L)).as("cluster"))
  }
}
