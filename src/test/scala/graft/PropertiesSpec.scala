package graft

import graft.embed.HashEmbedder
import graft.multimodal.DecodeStub
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the pure-JVM kernels (SURVEY §5 item 3).
  * DataFrame-level invariants live in the per-module specs; these
  * drive the driver-side functions across generated inputs.
  * (Gen is driven directly — the scalatestplus bridge isn't among the
  * offline-resolvable deps.) */
class PropertiesSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)
  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var i = 0
    val params = org.scalacheck.Gen.Parameters.default
    while (i < n) {
      g.apply(params, org.scalacheck.rng.Seed(rng.nextLong())).foreach(f)
      i += 1
    }
  }
  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf("spark", "hash", "join", "the", "data", "scan", "a1", "x"))
      .map(_.mkString(" "))

  test("HashEmbedder: fixed dim, deterministic, unit-norm or zero") {
    val e = new HashEmbedder(32)
    forAll(textGen) { t =>
      val v = e.embed(t)
      assert(v.length == 32)
      assert(v.toSeq == e.embed(t).toSeq)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5 || n == 0.0)
    }
  }

  test("HashEmbedder: token order does not matter, multiplicity does") {
    val e = new HashEmbedder(32)
    forAll(Gen.listOfN(6, Gen.oneOf("a", "b", "c", "dd"))) { toks =>
      whenever(toks.nonEmpty) {
        val v1 = e.embed(toks.mkString(" "))
        val v2 = e.embed(scala.util.Random.shuffle(toks).mkString(" "))
        assert(v1.toSeq == v2.toSeq)
      }
    }
  }

  test("DecodeStub: fixed dim, deterministic, content-sensitive") {
    val d = new DecodeStub(8)
    forAll(Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      val arr = bs.toArray
      val f = d.features(arr)
      assert(f.length == 8)
      assert(f.toSeq == d.features(arr).toSeq)
    }
  }

  test("MinHash permutation arithmetic stays in bounds for any (h, p)") {
    // mirrors Dedup.minhashValue: intermediates must not overflow Long
    forAll(Gen.zip(Gen.choose(0L, (1L << 32) - 1), Gen.choose(0L, 127L))) { case (h, p) =>
      val a = (p + 1L) * 2654435761L % 2147483647L
      val b = (p + 1L) * 7919L
      val prod = a * h // must not wrap: a < 2^31, h < 2^32
      assert(prod >= 0L)
      val v = (prod + b) % 2147483647L
      assert(v >= 0L && v < 2147483647L)
    }
  }

  test("NSW suffix insertion equals from-scratch build at ANY split point") {
    // the kernel identity GraphAnn.appendToIndex rides on: because
    // buildGraph inserts in ascending index order, building over a
    // prefix and then insertFrom-ing the suffix yields the SAME
    // adjacency — exactly, for any vectors and any split
    import graft.search.GraphAnn
    val vecGen = for {
      n <- Gen.choose(2, 32)
      vs <- Gen.listOfN(n, Gen.listOfN(3, Gen.choose(-1.0, 1.0)))
      k <- Gen.choose(1, n - 1)
    } yield (vs.map(_.toArray).toArray, k)
    forAll(vecGen, n = 60) { case (vecs, k) =>
      val full = GraphAnn.buildGraph(vecs, m = 4, efC = 8)
      val base = GraphAnn.buildGraph(vecs.take(k), m = 4, efC = 8)
      val grown: GraphAnn.Adjacency =
        Array.tabulate(vecs.length)(i =>
          if (i < k) base(i).clone()
          else scala.collection.mutable.ArrayBuffer.empty[Int])
      GraphAnn.insertFrom(vecs, grown, k, m = 4, efC = 8)
      assert(full.map(_.toList).toSeq == grown.map(_.toList).toSeq,
        s"suffix insertion diverged at split $k of ${vecs.length}")
    }
  }

  test("LCG sample key is non-negative and overflow-free at ANY id (the mod-2^31 reduction)") {
    // ids beyond 2^31 are exactly the range the reduction exists for:
    // (id % 2^31) * 1103515245 < 2^62, so neither engine can overflow
    forAll(Gen.choose(0L, Long.MaxValue - 12345L)) { id =>
      val r = id % 2147483648L
      assert(r * 1103515245L >= 0L) // no silent wrap on the Spark side
      val k = (r * 1103515245L + 12345L) % 2147483648L
      assert(k >= 0L && k < 2147483648L)
    }
  } // Column-form parity past 2^31 is pinned in IngestSpec (needs a session)
}
