package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property-based laws for the custom kernels (the reference pins these
  * with hand-enumerated cases in e.g. TestMergeQuantileDigestFunction /
  * TestNoisyCountGaussianAggregation; ScalaCheck explores the same
  * algebra over generated inputs):
  *  - codec round trips (url_encode/url_decode)
  *  - sketch merge algebra (commutative, associative, idempotent-union)
  *  - order/partition invariance of exact aggregation kernels
  */
class PropertySpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus bridge in
    * the offline dependency set — drive scalacheck's runner directly). */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  test("url codec: decode(encode(s)) == s for arbitrary unicode strings") {
    check(forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '+', '%', '/', '=', '&', '~', 'é', 'あ'),
      Gen.choose(' ', '߿'))).map(_.mkString)) { s =>
      graft.functions.UrlCodecUtils.decode(
        graft.functions.UrlCodecUtils.encode(u(s))).toString == s
    })
  }

  test("url encode output alphabet is reserved-free") {
    check(forAll { (s: String) =>
      val e = graft.functions.UrlCodecUtils.encode(u(s)).toString
      e.forall(c => c.isLetterOrDigit && c < 128 || "-_.*+%".contains(c))
    })
  }

  test("SFM non-private merge: commutative, associative, duplicate-proof") {
    import graft.functions.Sfm
    val rng = java.util.concurrent.ThreadLocalRandom.current()
    val values = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    check(forAll(values, values, values) { (xs, ys, zs) =>
      def sk(vs: Seq[Long]*): Seq[Byte] = {
        val s = Sfm.create(256, 16)
        vs.flatten.foreach(v => s.addHash(Sfm.hashOf(v)))
        s.serialize().toSeq
      }
      def merged(a: Seq[Long], b: Seq[Long]): Seq[Byte] = {
        val sa = Sfm.create(256, 16); a.foreach(v => sa.addHash(Sfm.hashOf(v)))
        val sb = Sfm.create(256, 16); b.foreach(v => sb.addHash(Sfm.hashOf(v)))
        sa.mergeWith(sb, rng)
        sa.serialize().toSeq
      }
      merged(xs, ys) == merged(ys, xs) &&
        merged(xs ++ ys, zs) == merged(xs, ys ++ zs) &&
        sk(xs, ys, xs) == sk(xs, ys) // union semantics: duplicates free
    })
  }

  test("HLL merge of split == sketch of whole, any split point") {
    import graft.functions.Hll
    check(forAll(Gen.listOf(Gen.choose(0L, 1L << 40)), Gen.choose(0, 100)) {
      (vs, cut) =>
        def add(b: Array[Byte], v: Long) = {
          Hll.add(b, Hll.hash(
            java.nio.ByteBuffer.allocate(8).putLong(v).array())); b
        }
        val whole = vs.foldLeft(Hll.emptyBuffer(8))(add)
        val k = if (vs.isEmpty) 0 else cut % (vs.size + 1)
        val (l, r) = vs.splitAt(k)
        val m = Hll.merge(l.foldLeft(Hll.emptyBuffer(8))(add),
          r.foldLeft(Hll.emptyBuffer(8))(add))
        m.toSeq == whole.toSeq
    })
  }

  test("VecSum: merge order and partitioning never change the exact sum") {
    import graft.functions.VecSum
    val vecGen = Gen.listOfN(4, Gen.choose(-1000, 1000).map(_.toDouble / 4))
    check(forAll(Gen.listOf(vecGen), Gen.choose(1, 7)) { (rows, parts) =>
      def fold(rs: Seq[Seq[Double]]): Array[Double] =
        rs.foldLeft(Array.emptyDoubleArray) { (acc, r) =>
          VecSum.merge(acc, r.toArray)
        }
      val whole = fold(rows)
      // split into `parts` chunks, fold each, merge the partials
      val chunks = rows.grouped(math.max(1, (rows.size + parts - 1) / parts))
        .map(c => fold(c)).toSeq
      val viaParts = chunks.foldLeft(Array.emptyDoubleArray)(VecSum.merge)
      // quarters of integers: every partial sum is exact in double
      viaParts.toSeq == whole.toSeq
    })
  }

  test("Vasicek entropy is sort-invariant and scales like ln under shift") {
    import graft.functions.DiffEntropy
    val samples = Gen.listOfN(50, Gen.choose(1, 100000).map(_.toDouble / 100))
    check(forAll(samples) { xs =>
      val base = DiffEntropy.vasicek(xs.toArray)
      // permutation invariance (the kernel sorts internally)
      val shuffled = DiffEntropy.vasicek(scala.util.Random.shuffle(xs).toArray)
      // location invariance: differential entropy ignores shifts
      val shifted = DiffEntropy.vasicek(xs.map(_ + 123.5).toArray)
      (base.isNaN && shuffled.isNaN) ||
        (base == shuffled &&
          (base.isInfinite || math.abs(base - shifted) < 1e-6))
    })
  }

  test("noisy state merge: count/sum algebra is associative + commutative") {
    import graft.functions.NoisyState
    val stateGen = for {
      c <- Gen.choose(0L, 1000L)
      s <- Gen.choose(-1000, 1000)
    } yield (c, s.toDouble)
    def m(a: (Long, Double), b: (Long, Double)) = (a._1 + b._1, a._2 + b._2)
    check(forAll(stateGen, stateGen, stateGen) { (a, b, c) =>
      m(a, b) == m(b, a) && m(m(a, b), c) == m(a, m(b, c))
    })
    // and the class-level merge agrees with the pair algebra
    val x = new NoisyState(3L, 1.5); val y = new NoisyState(4L, 2.5)
    x.count += y.count; x.sum += y.sum
    assert(x.count == 7L && x.sum == 4.0)
  }
}
