package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Graph

/** G1 PageRank: the recurrence must match hand arithmetic on planted
  * graphs, conserve total mass (no dangling nodes by construction on an
  * undirected edge list), and be deterministic under repartition. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-node graph: symmetry fixes both ranks at 1/2 every iteration") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = Graph.pageRank(edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("star graph: the hub outranks every leaf; ranks match hand arithmetic") {
    // center 0 — leaves 1..4. By symmetry leaves share one value L, the
    // recurrence is C' = 0.03 + 0.85·4L, L' = 0.03 + 0.85·C/4 (n=5,
    // base = 0.15/5), and exactly 10 iterations from the uniform 0.2
    // start give C = 0.421402, L = 0.144649 (simulated to the digit —
    // the star is near-bipartite, so this is NOT yet the 0.4757/0.1311
    // fixpoint; pinning the exact iterate also pins the iteration
    // count and the float arithmetic).
    val edges = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val out = Graph.pageRank(edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val leaves = (1L to 4L).map(out)
    assert(leaves.distinct.size == 1, s"leaves diverged: $out")
    assert(out(0L) > leaves.head)
    assert(math.abs(out(0L) - 0.421402) < 1e-6, s"hub ${out(0L)}")
    assert(math.abs(leaves.head - 0.144649) < 1e-6, s"leaf ${leaves.head}")
  }

  test("rank mass is conserved: sums to 1 (undirected ⇒ no dangling loss)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val total = Graph.pageRank(edges).agg(sum(col("rank"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6, s"mass leaked: $total")
  }

  test("self-loops and duplicate/reversed edges do not distort the graph") {
    val clean = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L))
      .toDF("src", "dst")
    val a = Graph.pageRank(clean).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(noisy).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("deterministic under repartition/reorder") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val a = Graph.pageRank(edges).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = Graph.pageRank(edges.orderBy(col("dst")).repartition(5)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("triangle census: hand-counted triangles/wedges on a planted graph (G2)") {
    // K4 on {1,2,3,4} (4 triangles, every degree 3) plus pendant 5-6 and
    // 4-5: degrees 1:3 2:3 3:3 4:4 5:2 6:1 → wedges 3+3+3+6+1+0 = 16;
    // triangles stay 4 (the pendant edges close nothing)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val r = Graph.triangleStats(edges).collect().head
    assert(r.getLong(0) == 4L, s"triangles ${r.getLong(0)}")
    assert(r.getLong(1) == 16L, s"wedges ${r.getLong(1)}")
    assert(r.getDouble(2) == 0.75) // 3*4/16
  }

  test("triangle census: duplicate edges collapse; empty graph reports zero, null coeff (G2)") {
    // distinct canonical edges form one triangle: degrees all 2 →
    // 3 wedges, coeff 1 — the REVERSED (3,2) and the (2,2) self loop
    // must collapse/drop, not distort degrees
    val dup = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 2L), (2L, 2L),
      (1L, 3L)).toDF("a", "b")
    val r = Graph.triangleStats(dup).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((1L, 3L, 1.0)))
    val e = Graph.triangleStats(
      spark.emptyDataFrame.select(lit(0L).as("a"), lit(0L).as("b"))
        .limit(0)).collect().head
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.isNullAt(2))
  }

  test("degree card: star is perfectly disassortative, K4+pendant matches hand moments (G3)") {
    // star K1,3: every edge joins degree 3 to degree 1 → assortativity
    // exactly −1 (hand: n=6 directed samples, sx=12, sxx=30, sxy=18 →
    // (6·18−144)/(6·30−144) = −1)
    val star = (1L to 3L).map(l => (0L, l)).toDF("a", "b")
    val s = Graph.degreeStats(star).collect().head
    assert(s.getLong(0) == 4L && s.getLong(1) == 3L)
    assert(s.getLong(2) == 3L)
    assert(s.getDouble(3) == 1.5) // (3+1+1+1)/4
    assert(s.getDouble(4) == -1.0, s"assortativity ${s.getDouble(4)}")
    // K4 plus pendant 5 on node 1: degrees 4,3,3,3,1 → m=7, sx=44,
    // sxx=146, sxy=134 → r = (14·134−1936)/(14·146−1936) = −60/108 =
    // −0.555556 (hand-computed, rounds(6))
    val k4p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("a", "b")
    val r = Graph.degreeStats(k4p).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 7L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 2.8) // 14/5
    assert(r.getDouble(4) == -0.555556, s"assortativity ${r.getDouble(4)}")
  }

  test("degree power-law: two-level histogram matches the hand slope " +
    "with r² = 1; a regular graph has one level and NULL slope (G10)") {
    // star K1,4 plus the disjoint edge 5–6: degrees {0→4, five 1s,
    // 6→1} → histogram (d=1: 6 nodes), (d=4: 1 node). Two log-log
    // points ⇒ slope = (ln1 − ln6)/(ln4 − ln1) = −ln6/ln4 = −1.2925
    // and r² exactly 1 (a 2-point OLS is exact)
    val star = (1L to 4L).map(l => (0L, l)) ++ Seq((5L, 6L))
    val r = Graph.degreePowerlaw(star.toDF("a", "b")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == -1.2925, s"slope ${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0, s"r2 ${r.getDouble(3)}")
    // triangle: every degree 2 → ONE histogram level → zero x-variance
    // → NULL slope (not NaN, not a crash), the g3 NULL discipline
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val t = Graph.degreePowerlaw(tri).collect().head
    assert(t.getLong(0) == 1L && t.getLong(1) == 2L)
    assert(t.isNullAt(2))
  }

  test("degree card: regular graph yields NULL assortativity; noisy edges canonicalize (G3)") {
    // triangle: all degrees 2 → zero endpoint-degree variance → NULL
    // (not NaN, not a crash); reversed duplicates and self loops must
    // collapse first or the degrees (hence the NULL) would be wrong
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 3L))
      .toDF("a", "b")
    val r = Graph.degreeStats(noisy).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 2.0)
    assert(r.isNullAt(4))
  }

  test("k-core peeling: hand-counted cores on K4 + triangle + pendant chain (G4)") {
    // K4 on {1,2,3,4}, a DISJOINT triangle {7,8,9}, and pendant chain
    // 4-5-6. 2-core: chain peels (6 has degree 1, then 5) → K4 +
    // triangle = 9 edges over 7 nodes. 3-core: triangle peels (all
    // degree 2) → K4 alone. 4-core: empty (K4's internal degree is 3).
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (7L, 8L), (8L, 9L), (7L, 9L))
      .toDF("a", "b")
    def stats(k: Int) = {
      val core = Graph.kCoreEdges(edges, k)
      val nodes = core.select(col("a").as("n"))
        .unionByName(core.select(col("b").as("n")))
        .distinct().count()
      (nodes, core.count())
    }
    assert(stats(2) == ((7L, 9L)))
    assert(stats(3) == ((4L, 6L)))
    assert(stats(4) == ((0L, 0L)))
    // the CASCADE matters: peeling 6 (degree 1) drops 5 to degree 1 —
    // a single-round degree filter would keep 5; the fixpoint must not
    val twoCore = Graph.kCoreEdges(edges, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!twoCore.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("nested peel equals from-scratch: core_k(core_j(G)) = core_k(G) " +
    "for j <= k — the r21 g4 sweep optimization's correctness claim") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (7L, 8L), (8L, 9L), (7L, 9L))
      .toDF("a", "b")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val core2 = Graph.kCoreEdges(edges, 2)
    assert(pairs(Graph.kCoreEdges(core2, 3)) ==
      pairs(Graph.kCoreEdges(edges, 3)))
    val core3 = Graph.kCoreEdges(core2, 3)
    assert(pairs(Graph.kCoreEdges(core3, 4)) ==
      pairs(Graph.kCoreEdges(edges, 4)))
  }

  test("convergeTol on an empty graph returns empty instead of NPE " +
    "(advice r20: sum over the empty ranks frame reads NULL)") {
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRank(none, convergeTol = Some(1e-6)).isEmpty)
    assert(Graph.personalizedPageRank(none, seedNode = 1L,
      convergeTol = Some(1e-6)).isEmpty)
  }

  test("audience overlap: hand-computed Jaccard on planted audiences (G6)") {
    def ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // X's audience {1,2,3}, Y's {2,3,4} (user 2 hits Y twice — the
    // DISTINCT incidence collapse must count it once), Z's {9}
    val rows = Seq((1L, "X"), (2L, "X"), (3L, "X"), (2L, "Y"), (3L, "Y"),
      (4L, "Y"), (2L, "Y"), (9L, "Z"))
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, ts0, u, t, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("g6test").toString
    try {
      rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = Graph.g6AudienceOverlap(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
            r.getDouble(6)))).toMap
      // only X↔Y overlaps: |∩|=2, J = 2/(3+3−2) = 0.5, overlap = 2/3;
      // disjoint pairs (X,Z)/(Y,Z) emit no row (n_common would be 0 —
      // the join simply finds no shared user)
      assert(out.size == 1)
      assert(out(("X", "Y")) == ((3L, 3L, 2L, 0.5, 0.6667)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("HITS authority: disconnected blocks concentrate on the dominant block (G7)") {
    // A's audience is 10 users, B's a disjoint 2: AᵀA = diag(10, 2),
    // so power iteration contracts the B component by (2/10) per step —
    // 50 steps from uniform leave authority (1, 0) to beyond 1e-6
    val ev = ((1L to 10L).map(u => (u, "A")) ++
        Seq((11L, "B"), (12L, "B")))
      .toDF("user_id", "event_type")
    val out = Graph.hitsAuthority(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("A") == ((10L, 1.0)), out.mkString(", "))
    assert(out("B")._1 == 2L && out("B")._2 == 0.0, out.mkString(", "))
  }

  test("HITS authority: symmetric co-audiences split 1/√2; duplicates collapse (G7)") {
    // every user touches both types (some twice — the DISTINCT
    // incidence collapse must not double-weight them): the co-audience
    // matrix is constant, the eigenvector uniform, norm 1 ⇒ 0.707107
    val ev = ((1L to 6L).flatMap(u => Seq((u, "A"), (u, "B"))) ++
        Seq((3L, "A"), (5L, "B")))
      .toDF("user_id", "event_type")
    val out = Graph.hitsAuthority(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("A") == ((6L, 0.707107)), out.mkString(", "))
    assert(out("B") == ((6L, 0.707107)), out.mkString(", "))
  }

  test("HITS authority is deterministic under repartition/reorder (G7)") {
    val ev = Seq((1L, "A"), (1L, "B"), (2L, "A"), (3L, "A"), (3L, "C"),
      (4L, "B"), (4L, "C"), (5L, "C"))
      .toDF("user_id", "event_type")
    val a = Graph.hitsAuthority(ev).collect().toSeq
    val b = Graph.hitsAuthority(
      ev.orderBy(col("event_type")).repartition(7)).collect().toSeq
    assert(a == b)
    val norm = a.map(_.getDouble(2)).map(x => x * x).sum
    assert(math.abs(norm - 1.0) < 1e-3, s"authority norm drifted: $norm")
  }

  test("LPA communities: two bridged cliques split where components see one blob (G8)") {
    import spark.implicits._
    // K4 {1,2,3,4} — bridge 4–11 — K4 {11,12,13,14}, plus isolated 99.
    // g5's components would report ONE 8-node blob + the singleton; LPA
    // must find the two dense cliques as separate communities (the
    // bridge's single vote never outnumbers three clique votes), with
    // labels anchored to each clique's min id by the tie rule, plus 99
    // keeping its own label via the self-vote.
    val nodes = Seq(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L, 99L).toDF("node")
    def k4(ids: Seq[Long]) = for {
      a <- ids; b <- ids if a < b
    } yield (a, b)
    val pairs = (k4(Seq(1L, 2L, 3L, 4L)) ++ k4(Seq(11L, 12L, 13L, 14L)) ++
      Seq((4L, 11L))).toDF("id_a", "id_b")
    val out = graft.ext.Graph.lpaCommunities(nodes, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 4L), (11L, 4L), (99L, 1L)), out.mkString(", "))
  }

  test("registered g1 ranks the planted co-presence hub first at sf0.001") {
    val out = Graph.g1PageRank(spark, "/root/testdata/sf0.001").collect()
    assert(out.length > 0 && out.length <= 20)
    // descending by rank with node tie-break, rank in (0, 1]
    val ranks = out.map(_.getDouble(1))
    assert(ranks.zip(ranks.tail).forall { case (x, y) => x >= y })
    assert(ranks.forall(r => r > 0.0 && r <= 1.0))
  }

  test("g9 personalized PageRank: star seeded at the hub matches the " +
    "hand-simulated iterate; mass conserves; absent seed is empty") {
    // center 0 — leaves 1..4, seed = 0, start r0 = e_seed. By symmetry
    // C' = 0.15 + 0.85·4L, L' = 0.85·C/4; exactly 10 iterations give
    // C = 0.630996, L = 0.092251 (simulated to the digit — pins
    // iteration count, seed-restart arithmetic, and the start vector).
    val edges = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val out = Graph.personalizedPageRank(edges, seedNode = 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val leaves = (1L to 4L).map(out)
    assert(leaves.distinct.size == 1, s"leaves diverged: $out")
    assert(math.abs(out(0L) - 0.630996) < 1e-6, s"hub ${out(0L)}")
    assert(math.abs(leaves.head - 0.092251) < 1e-6, s"leaf ${leaves.head}")
    assert(math.abs(out.values.sum - 1.0) < 1e-5, "restart mass leaked")
    // proximity, not centrality: seeded at a LEAF, that leaf's direct
    // neighbor (the hub) outranks the other leaves
    val fromLeaf = Graph.personalizedPageRank(edges, seedNode = 1L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fromLeaf(0L) > fromLeaf(2L) && fromLeaf(1L) > fromLeaf(2L))
    // a seed that is not in the graph returns empty, not a crash
    assert(Graph.personalizedPageRank(edges, seedNode = 99L).isEmpty)
  }

  test("g11 local clustering: K3 plus a pendant — per-node cc " +
    "hand-computed, decile buckets and the global mean off integer " +
    "ten-thousandths; reversed duplicate edges collapse; degree-1 " +
    "nodes sit outside the card") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 1L))
      .toDF("a", "b")
    val out = Graph.localClustering(edges).collect()
    // nodes 1,2: d=2, t=1 → cc = 1.0 → decile 10; node 3: d=3, t=1 →
    // 2/(3·2) = 0.3333 → decile 3; node 4: d=1 — excluded;
    // avg = (3333 + 10000 + 10000)/30000 = 0.7778
    val m = out.map(r => r.getInt(0) -> r).toMap
    assert(m.keySet == Set(3, 10), s"deciles ${m.keySet}")
    assert(m(3).getLong(1) == 1 && m(10).getLong(1) == 2)
    assert(m(3).getDouble(2) == 0.3333 && m(10).getDouble(2) == 0.6667)
    assert(out.map(_.getDouble(3)).distinct.toSeq == Seq(0.7778))
    // a triangle-free star: every cc is 0, one decile-0 row
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val s = Graph.localClustering(star).collect()
    assert(s.length == 1 && s.head.getInt(0) == 0 &&
      s.head.getLong(1) == 1 && s.head.getDouble(3) == 0.0)
  }
}
