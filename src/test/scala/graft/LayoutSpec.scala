package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.Clustering
import graft.io.Sinks

/** M10 spring layout + S7 HTML sinks: the layout must be deterministic
  * under its seed, respect graph structure (cliques collapse, the
  * bridge stays long), and rescale to [-1,1]; the sinks must emit
  * self-contained SVG documents whose geometry reflects the data. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dist(a: (Double, Double), b: (Double, Double)): Double =
    math.hypot(a._1 - b._1, a._2 - b._2)

  test("spring layout: deterministic, bounded, clique-separating") {
    val (nodes, edges) = GoldenPinCompute.louvainGraph
    val pos = Clustering.springLayout(nodes, edges, iterations = 50, seed = 42L)
    val pos2 = Clustering.springLayout(nodes, edges, iterations = 50, seed = 42L)
    assert(pos == pos2, "same seed must reproduce the layout")
    assert(pos.size == nodes.size)
    assert(pos.values.forall { case (x, y) =>
      x >= -1.0 && x <= 1.0 && y >= -1.0 && y <= 1.0 })
    // structure: mean intra-clique distance well under the distance
    // between the two clique centroids (the bridge edge is weak)
    def centroid(ns: Seq[Long]) = (
      ns.map(pos(_)._1).sum / ns.size, ns.map(pos(_)._2).sum / ns.size)
    val c1 = (0L to 5L).toSeq; val c2 = (10L to 15L).toSeq
    val intra = (c1.combinations(2) ++ c2.combinations(2))
      .map { case Seq(a, b) => dist(pos(a), pos(b)) }.toSeq
    val inter = dist(centroid(c1), centroid(c2))
    assert(intra.sum / intra.size < inter / 2,
      s"cliques not separated: intra=${intra.sum / intra.size} inter=$inter")
  }

  test("spring layout: degenerate graphs are safe") {
    assert(Clustering.springLayout(Nil, Nil).isEmpty)
    assert(Clustering.springLayout(Seq(7L), Nil) == Map(7L -> (0.0, 0.0)))
    val two = Clustering.springLayout(Seq(1L, 2L), Seq((1L, 2L, 1.0)))
    assert(two.size == 2 && two(1L) != two(2L))
  }

  test("s7 html chart: self-contained SVG with one polyline per series") {
    val dir = java.nio.file.Files.createTempDirectory("graft_html").toString
    val df = Seq((1.0, 10.0, 5.0), (2.0, 12.0, 4.0), (3.0, 11.0, 6.0))
      .toDF("t", "price", "volume")
    Sinks.htmlChart(df, "t", Seq("price", "volume"), "panel", s"$dir/c.html")
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/c.html"))
    assert(html.startsWith("<!DOCTYPE html>"))
    assert("<polyline".r.findAllIn(html).size == 2)
    assert(html.contains("<svg") && !html.contains("<script"))
    assert(html.contains(">panel<") && html.contains("price"))
    // axis labels carry the data extremes
    assert(html.contains(">4<") && html.contains(">12<"))
  }

  test("s7 html chart refuses un-aggregated input") {
    val big = spark.range(200).selectExpr("CAST(id AS DOUBLE) AS x", "id * 2.0 AS y")
    intercept[IllegalArgumentException] {
      Sinks.htmlChart(big, "x", Seq("y"), "big", "/tmp/never.html", maxPoints = 100)
    }
  }

  test("s7 html chart fails loudly on empty or all-null input") {
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    val ex = intercept[IllegalArgumentException] {
      Sinks.htmlChart(empty, "x", Seq("y"), "e", "/tmp/never_e.html")
    }
    assert(ex.getMessage.contains("no plottable rows"))
    val nulls = Seq(("a", 1.0), ("b", 2.0)).toDF("x", "y") // x casts to null
    val ex2 = intercept[IllegalArgumentException] {
      Sinks.htmlChart(nulls, "x", Seq("y"), "n", "/tmp/never_n.html")
    }
    assert(ex2.getMessage.contains("no plottable rows"))
  }

  test("s7+m10: network render places every node and edge") {
    val dir = java.nio.file.Files.createTempDirectory("graft_net").toString
    val (nodes, edges) = GoldenPinCompute.louvainGraph
    val pos = Clustering.springLayout(nodes, edges)
    val (comm, _) = Clustering.louvain(nodes, edges)
    Sinks.htmlNetwork(pos, edges, comm.map { case (k, v) => k -> v.toLong },
      nodes.map(n => n -> s"sym$n").toMap, "communities", s"$dir/net.html")
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/net.html"))
    assert("<circle".r.findAllIn(html).size == nodes.size)
    assert("<line".r.findAllIn(html).size == edges.size)
    assert(html.contains("sym0") && html.contains("sym15"))
  }
}
