package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GeomKernels
import graft.functions.GeomKernels.Pt

/** Algebraic invariants of the native geometry kernels (GeomKernels.scala)
  * across a deterministic sweep of convex polygon pairs — guards the native
  * implementations beyond the fixed DE-9IM classes the oracle gates pin:
  * inclusion–exclusion over the clip decompositions must hold exactly for
  * every relative placement, and hulls must contain their inputs. */
class GeomKernelsSpec extends AnyFunSuite {

  private def square(x: Double, y: Double, s: Double): Array[Pt] =
    Array(Pt(x, y), Pt(x + s, y), Pt(x + s, y + s), Pt(x, y + s))

  private def diamond(x: Double, y: Double, r: Double): Array[Pt] =
    Array(Pt(x + r, y), Pt(x + 2 * r, y + r), Pt(x + r, y + 2 * r), Pt(x, y + r))

  private def triangle(x: Double, y: Double, s: Double): Array[Pt] =
    Array(Pt(x, y), Pt(x + s, y), Pt(x, y + s))

  private def area(ring: Array[Pt]): Double = GeomKernels.ringArea(ring)

  private def interArea(a: Array[Pt], b: Array[Pt]): Double = {
    val r = GeomKernels.intersection(a, b)
    if (r.length >= 3) area(r) else 0.0
  }

  private def diffArea(a: Array[Pt], b: Array[Pt]): Double =
    GeomKernels.difference(a, b).map(area).sum

  // every placement class: nested, partial overlap, edge touch, corner
  // touch, disjoint — for square×square, square×diamond, square×triangle
  private val pairs = for {
    dx <- Seq(-3.0, -1.5, -0.5, 0.0, 0.5, 1.5, 2.0, 3.0)
    dy <- Seq(-2.0, -0.5, 0.0, 1.0, 2.0)
    b <- Seq(square(dx, dy, 1.5), diamond(dx, dy, 1.0), triangle(dx, dy, 2.5))
  } yield (square(0, 0, 2.0), b)

  test("inclusion-exclusion: area(A) = area(A∩B) + area(A\\B) for every placement") {
    pairs.foreach { case (a, b) =>
      val lhs = area(a)
      val rhs = interArea(a, b) + diffArea(a, b)
      assert(math.abs(lhs - rhs) < 1e-9, s"A=${a.toSeq} B=${b.toSeq}: $lhs vs $rhs")
    }
  }

  test("union decomposition: area(A∪B) = area(A) + area(B) − area(A∩B)") {
    pairs.foreach { case (a, b) =>
      val viaKernel = area(a) + diffArea(b, a) // union = A ⊎ (B\A)
      val viaInclusionExclusion = area(a) + area(b) - interArea(a, b)
      assert(math.abs(viaKernel - viaInclusionExclusion) < 1e-9,
        s"A=${a.toSeq} B=${b.toSeq}")
    }
  }

  test("symmetric difference: area(AΔB) = area(A) + area(B) − 2·area(A∩B)") {
    pairs.foreach { case (a, b) =>
      val symd = diffArea(a, b) + diffArea(b, a)
      val expected = area(a) + area(b) - 2 * interArea(a, b)
      assert(math.abs(symd - expected) < 1e-9, s"A=${a.toSeq} B=${b.toSeq}")
    }
  }

  test("intersection is commutative in area and bounded by both inputs") {
    pairs.foreach { case (a, b) =>
      val ab = interArea(a, b); val ba = interArea(b, a)
      assert(math.abs(ab - ba) < 1e-9)
      assert(ab <= area(a) + 1e-9 && ab <= area(b) + 1e-9)
    }
  }

  test("convex hull contains every input point and is convex CCW") {
    def cross(o: Pt, p: Pt, q: Pt): Double =
      (p.x - o.x) * (q.y - o.y) - (p.y - o.y) * (q.x - o.x)
    def insideHull(h: Array[Pt], p: Pt): Boolean =
      (0 until h.length).forall { i =>
        cross(h(i), h((i + 1) % h.length), p) >= -1e-9
      }
    val pointSets = Seq(
      square(0, 0, 2.0) ++ Array(Pt(1.0, 1.0), Pt(0.5, 0.3)), // interiors drop
      diamond(0, 0, 2.0) ++ triangle(1, 1, 0.5),
      Array(Pt(0, 0), Pt(1, 1), Pt(2, 2), Pt(3, 3)), // collinear degenerate
      Array(Pt(0, 0), Pt(0, 0), Pt(1, 0))) // duplicates collapse
    pointSets.foreach { ps =>
      val h = GeomKernels.convexHull(ps)
      assert(h.length <= ps.distinct.length)
      if (h.length >= 3) {
        ps.foreach(p => assert(insideHull(h, p), s"$p outside hull ${h.toSeq}"))
        // CCW: positive signed area
        val signed = (0 until h.length).map { i =>
          val a = h(i); val b = h((i + 1) % h.length)
          a.x * b.y - b.x * a.y
        }.sum
        assert(signed > 0, "hull ring is CCW")
      }
    }
  }

  test("difference of nested rings is empty; of disjoint rings is all of A") {
    val a = square(0, 0, 2.0)
    assert(GeomKernels.difference(a, square(-1, -1, 4.0)).isEmpty, "A ⊆ B")
    assert(math.abs(diffArea(a, square(10, 10, 1.0)) - area(a)) < 1e-12, "disjoint")
  }
}
