package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
  * shortlisting, with an exact final answer.
  *
  * The brute-force heavy-hitter query `groupBy(item).count.filter(cnt
  * >= T)` carries map-side combine state proportional to the
  * PER-PARTITION distinct-item count and shuffles the global
  * vocabulary. Over 100 TB of web text the "vocabulary" (tokens,
  * URLs, shingle hashes) is itself billions of keys: the combine hash
  * map spills and the vocabulary shuffle IS the job, even though the
  * output — the heavy hitters — is tiny. The sketch path bounds both
  * by d·w CELLS, independent of vocabulary size:
  *
  *   1. '''sketch''': every occurrence increments d cells
  *      (j, xxhash64(item, j) mod w), j = 0..d-1. The cell groupBy
  *      map-side-combines into ≤ d·w rows per partition and shuffles
  *      ≤ d·w·numPartitions rows total; the result is a
  *      BROADCASTABLE d·w-row table.
  *   2. '''shortlist''': a second scan joins each occurrence's d
  *      cells against the broadcast sketch — d broadcast hash joins,
  *      zero shuffle — and keeps occurrences with
  *      `min_j cell_j >= T`. A CMS cell only ever OVER-counts (hash
  *      collisions add, never subtract), so every true heavy hitter
  *      survives: the shortlist is a guaranteed superset.
  *   3. '''exact''': the surviving occurrences — heavy keys plus the
  *      rare collision-inflated impostor — are exactly counted and
  *      re-filtered. Impostors die here, so the output is EXACTLY
  *      the true heavy-hitter set with exact counts: engine-equal to
  *      a brute-force oracle despite the approximate middle, which
  *      is what lets the driver hash-gate this query.
  *
  * Width trades shortlist precision for memory: expected collision
  * mass per cell ≈ total/w, so with w ≫ total/T the shortlist is
  * near-exact. Depth drives the min, collapsing the probability that
  * ALL d cells of a light key are collision-inflated past T.
  */
object CountMin {

  /** The d×w cell-count table `(j, bucket, cnt)` for one occurrence
    * frame. One scan; shuffle bounded by d·w·numPartitions. */
  def sketch(items: DataFrame, itemCol: String,
             depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape $depth x $width")
    val cells = (0 until depth).map { j =>
      struct(lit(j).as("j"),
        pmod(xxhash64(col(itemCol), lit(j)), lit(width.toLong)).as("bucket"))
    }
    items.select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Exact heavy hitters: items whose occurrence count satisfies
    * `cnt * 1e6 >= total * supportPpm` (support given in parts per
    * million so the threshold scales with the data and the predicate
    * stays in integer arithmetic — bit-identical across engines).
    * Output: (itemCol, cnt), exact.
    *
    * The d·w sketch is persisted (and tracked for
    * [[graft.io.PersistRegistry]] release): it is referenced once per
    * depth row in the shortlist pass, and without pinning, a filter
    * on the grouping key `j` could push below the cell aggregate and
    * split the single sketch build into d re-scans of `items`. */
  def heavyHitters(items: DataFrame, itemCol: String,
                   depth: Int, width: Int, supportPpm: Long): DataFrame =
    heavyHittersFromSketch(items, itemCol,
      graft.io.PersistRegistry.trackPersist(
        sketch(items, itemCol, depth, width)),
      depth, width, supportPpm)

  /** The shortlist + exact-recount tail over an ALREADY-BUILT sketch
    * `(j, bucket, cnt)` — the streaming deployment (st21) accumulates
    * the cells incrementally (additive counts are the same CRDT as
    * the st18 histogram) and hands the drained table here; the batch
    * path above builds it in one scan. `sk` must be cheap to re-read
    * (persisted or memory-table-sized): it is referenced once per
    * depth row. */
  def heavyHittersFromSketch(items: DataFrame, itemCol: String,
                             sk: DataFrame, depth: Int, width: Int,
                             supportPpm: Long): DataFrame = {
    // total occurrence count from the SKETCH, not a third corpus scan:
    // every depth row's cells sum to the occurrence count (mass
    // conservation, pinned in PipelineOpsSpec), and the sketch is
    // already persisted — this aggregate reads d·w cached rows.
    val total = sk.filter(col("j") === 0).agg(sum(col("cnt")).as("__total"))
    var occ = items.crossJoin(broadcast(total))
    (0 until depth).foreach { j =>
      // inner join is total by construction: this occurrence's (j,
      // bucket) cell was counted by the sketch pass over the same frame
      val skj = sk.filter(col("j") === j)
        .select(col("bucket").as(s"__b$j"), col("cnt").as(s"__c$j"))
      occ = occ
        .withColumn(s"__b$j",
          pmod(xxhash64(col(itemCol), lit(j)), lit(width.toLong)))
        .join(broadcast(skj), Seq(s"__b$j"))
    }
    val est = least((0 until depth).map(j => col(s"__c$j")): _*)
    occ.filter(est * lit(1000000L) >= col("__total") * lit(supportPpm))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"), max(col("__total")).as("__total"))
      .filter(col("cnt") * lit(1000000L) >= col("__total") * lit(supportPpm))
      .select(col(itemCol), col("cnt"))
  }
}
