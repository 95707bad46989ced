package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.{Clustering, DistributedDbscan}

/** Cross-verification: the distributed grid DBSCAN must produce the same
  * partition of points (same clusters, same noise set) as the driver
  * implementation on well-separated data. */
class DistributedDbscanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("distributed == driver on blobs + noise") {
    val rnd = new scala.util.Random(42)
    def blob(cx: Double, cy: Double, n: Int): Seq[(Double, Double)] =
      Seq.fill(n)((cx + rnd.nextGaussian() * 0.05, cy + rnd.nextGaussian() * 0.05))
    val pts = blob(0, 0, 60) ++ blob(5, 5, 60) ++ blob(-5, 5, 60) ++
      Seq((20.0, 20.0), (-20.0, 13.0)) // isolated noise
    val eps = 0.3; val minPts = 5

    val driver = Clustering.dbscan(pts.map(p => Array(p._1, p._2)).toArray, eps, minPts)

    val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val dist = DistributedDbscan.run(df, "id", "x", "y", eps, minPts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // same noise set
    val driverNoise = driver.zipWithIndex.filter(_._1 == -1).map(_._2.toLong).toSet
    val distNoise = dist.filter(_._2 == -1L).keySet
    assert(distNoise == driverNoise)

    // same partition: canonical grouping by cluster label must coincide
    def groupsOf(label: Int => Long): Set[Set[Long]] =
      (0 until pts.length).map(_.toLong).filterNot(driverNoise)
        .groupBy(i => label(i.toInt)).values.map(_.toSet).toSet
    val gDriver = groupsOf(i => driver(i).toLong)
    val gDist = groupsOf(i => dist(i.toLong))
    assert(gDriver == gDist, "cluster partitions must coincide")
    assert(gDriver.size == 3)
  }
}
