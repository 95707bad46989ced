package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.Clustering

/** Deterministic semantics of the driver-side clustering algorithms
  * (SURVEY M4-M6) on hand-built fixtures. */
class ClusteringSpec extends AnyFunSuite {

  test("dbscan: two dense blobs + one outlier") {
    val blob1 = Array.tabulate(6)(i => Array(0.0 + i * 0.01, 0.0))
    val blob2 = Array.tabulate(6)(i => Array(10.0 + i * 0.01, 0.0))
    val outlier = Array(Array(100.0, 100.0))
    val labels = Clustering.dbscan(blob1 ++ blob2 ++ outlier, eps = 0.1, minPts = 3)
    assert(labels.take(6).distinct.length == 1 && labels.head >= 0)
    assert(labels.slice(6, 12).distinct.length == 1)
    assert(labels(0) != labels(6), "blobs must be separate clusters")
    assert(labels.last == -1, "outlier must be noise")
  }

  test("kneeEps finds the elbow of a hockey-stick curve") {
    val flat = Array.fill(20)(1.0)
    val rise = Array.tabulate(5)(i => 1.0 + (i + 1) * 10.0)
    val eps = Clustering.kneeEps(flat ++ rise)
    assert(eps >= 1.0 && eps <= 11.0, s"eps=$eps should sit at the bend")
  }

  test("louvain: two cliques joined by one weak edge → two communities") {
    val c1 = Seq(1L, 2L, 3L, 4L)
    val c2 = Seq(5L, 6L, 7L, 8L)
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a < b) yield (a, b, 1.0)
    val edges = clique(c1) ++ clique(c2) :+ ((4L, 5L, 0.1))
    val (comm, q) = Clustering.louvain(c1 ++ c2, edges)
    assert(c1.map(comm).distinct.size == 1, "clique 1 together")
    assert(c2.map(comm).distinct.size == 1, "clique 2 together")
    assert(comm(1L) != comm(5L), "cliques in different communities")
    assert(q > 0.3, s"modularity $q should be substantial")
  }

  test("louvain: empty graph is safe") {
    val (comm, q) = Clustering.louvain(Seq(1L, 2L), Seq.empty)
    assert(q == 0.0 && comm.size == 2)
  }
}
