package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic properties of the sequential HNSW segment core
  * ([[graft.ops.HnswSegment]]) — build/serve invariants that must hold
  * for EVERY corpus, not just the gate fixtures: exactness at
  * exhaustive ef, filtered-result containment, filtered==brute under
  * the accepting walk, determinism, and adjacency budget.
  */
object HnswProperties extends Properties("graft.hnsw") {

  import graft.ops.HnswSegment

  private val corpusGen: Gen[IndexedSeq[(String, Array[Double])]] = for {
    n <- Gen.choose(4, 160)
    dim <- Gen.choose(2, 8)
    seed <- Gen.choose(0L, 1000000L)
  } yield {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (f"$i%04d", Array.fill(dim)(rnd.nextGaussian())))
  }

  private def brute(pts: IndexedSeq[(String, Array[Double])],
                    q: Array[Double], k: Int,
                    acc: String => Boolean): Seq[String] =
    pts.filter(t => acc(t._1)).map { case (id, v) =>
      val dot = v.zip(q).map { case (a, b) => a * b }.sum
      val nv = math.sqrt(v.map(x => x * x).sum)
      val nq = math.sqrt(q.map(x => x * x).sum)
      (id, if (nv == 0.0 || nq == 0.0) 0.0 else dot / (nv * nq))
    }.sortBy(t => (-t._2, t._1)).take(k).map(_._1)

  property("exhaustive-ef serve equals brute force (unfiltered)") =
    forAll(corpusGen) { pts =>
      val edges = HnswSegment.build(pts, 4, 8, 7L).toIndexedSeq
      val q = pts.head._2.map(_ + 0.1)
      val got = HnswSegment.search(pts, edges, q, 5, pts.length + 8, 7L)
      got.map(_._1) == brute(pts, q, 5, _ => true)
    }

  property("filtered serve: containment always, equality at exhaustive ef") =
    forAll(corpusGen, Gen.choose(2, 5)) { (pts, mod) =>
      val edges = HnswSegment.build(pts, 4, 8, 7L).toIndexedSeq
      val q = pts.last._2.map(_ - 0.05)
      val acc: String => Boolean = id => id.toInt % mod != 0
      val got = HnswSegment.search(pts, edges, q, 5, pts.length + 8, 7L,
        accept = acc)
      got.forall(t => acc(t._1)) &&
        got.map(_._1) == brute(pts, q, 5, acc)
    }

  property("build is deterministic") = forAll(corpusGen) { pts =>
    HnswSegment.build(pts, 4, 8, 7L).toSeq ==
      HnswSegment.build(pts, 4, 8, 7L).toSeq
  }

  property("adjacency stays within the mMax budget per (node, level)") =
    forAll(corpusGen) { pts =>
      val m = 4
      val edges = HnswSegment.build(pts, m, 8, 7L).toSeq
      edges.groupBy(e => (e._1, e._2)).forall { case ((lvl, _), g) =>
        g.map(_._3).distinct.length <= (if (lvl == 0) 2 * m else m)
      }
    }

  property("euclid graphs serve ascending-distance brute force at exhaustive ef") =
    forAll(corpusGen) { pts =>
      val edges = HnswSegment.build(pts, 4, 8, 7L, metric = "euclid")
        .toIndexedSeq
      val q = pts.head._2.map(_ + 0.2)
      val got = HnswSegment.search(pts, edges, q, 5, pts.length + 8, 7L,
        metric = "euclid")
      val want = pts.map { case (id, v) =>
        (id, math.sqrt(v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum))
      }.sortBy(t => (t._2, t._1)).take(5)
      got.map(_._1) == want.map(_._1) &&
        got.forall { case (_, s) => s >= 0.0 } // metric convention, not pref
    }

  property("dot graphs serve descending-dot brute force at exhaustive ef") =
    forAll(corpusGen) { pts =>
      val edges = HnswSegment.build(pts, 4, 8, 7L, metric = "dot")
        .toIndexedSeq
      val q = pts.last._2
      val got = HnswSegment.search(pts, edges, q, 5, pts.length + 8, 7L,
        metric = "dot")
      val want = pts.map { case (id, v) =>
        (id, v.zip(q).map { case (a, b) => a * b }.sum)
      }.sortBy(t => (-t._2, t._1)).take(5)
      got.map(_._1) == want.map(_._1)
    }

  property("filter and euclid compose: accepting walk on a distance graph equals filtered ascending brute") =
    forAll(corpusGen, Gen.choose(2, 5)) { (pts, mod) =>
      val edges = HnswSegment.build(pts, 4, 8, 7L, metric = "euclid")
        .toIndexedSeq
      val q = pts.head._2.map(_ - 0.1)
      val acc: String => Boolean = id => id.toInt % mod != 0
      val got = HnswSegment.search(pts, edges, q, 5, pts.length + 8, 7L,
        accept = acc, metric = "euclid")
      val want = pts.filter(t => acc(t._1)).map { case (id, v) =>
        (id, math.sqrt(v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum))
      }.sortBy(t => (t._2, t._1)).take(5)
      got.forall(t => acc(t._1)) && got.map(_._1) == want.map(_._1)
    }

  property("zero-norm cosine points are dropped from results (SearchSpec.score's None), zero query returns empty") =
    forAll(corpusGen) { pts =>
      val dim = pts.head._2.length
      val withZero = pts :+ ("zzzz", Array.fill(dim)(0.0))
      val edges = HnswSegment.build(withZero, 4, 8, 7L).toIndexedSeq
      val q = pts.head._2.map(_ + 0.1)
      val got = HnswSegment.search(withZero, edges, q, withZero.length,
        withZero.length + 8, 7L)
      !got.exists(_._1 == "zzzz") &&
        HnswSegment.search(withZero, edges, Array.fill(dim)(0.0), 3, 64,
          7L).isEmpty
    }

  property("incremental insert: base-build + insertInto serves exhaustive-ef brute force over the union") =
    forAll(corpusGen) { pts =>
      val cut = math.max(1, (pts.length * 3) / 4)
      val (base, batch) = pts.splitAt(cut)
      val baseEdges = HnswSegment.build(base, 4, 8, 7L).toIndexedSeq
      val incEdges = HnswSegment.insertInto(base, baseEdges, batch,
        4, 8, 7L).toIndexedSeq
      val all = base ++ batch
      val edges = baseEdges ++ incEdges
      // new-node edges reference only known ids, and the served union
      // at exhaustive ef equals brute force — the incremental graph is
      // navigable over base AND batch
      val ids = all.map(_._1).toSet
      incEdges.forall(e => ids(e._2) && ids(e._3)) && {
        val q = all.head._2.map(_ + 0.1)
        HnswSegment.search(all, edges, q, 5, all.length + 8, 7L)
          .map(_._1) == brute(all, q, 5, _ => true)
      }
    }

  property("incremental insert is deterministic") =
    forAll(corpusGen) { pts =>
      val cut = math.max(1, pts.length / 2)
      val (base, batch) = pts.splitAt(cut)
      val baseEdges = HnswSegment.build(base, 4, 8, 7L).toIndexedSeq
      HnswSegment.insertInto(base, baseEdges, batch, 4, 8, 7L).toSeq ==
        HnswSegment.insertInto(base, baseEdges, batch, 4, 8, 7L).toSeq
    }

  property("empty accept set returns empty, never junk") =
    forAll(corpusGen) { pts =>
      val edges = HnswSegment.build(pts, 4, 8, 7L).toIndexedSeq
      HnswSegment.search(pts, edges, pts.head._2, 3, 64, 7L,
        accept = _ => false).isEmpty
    }
}
