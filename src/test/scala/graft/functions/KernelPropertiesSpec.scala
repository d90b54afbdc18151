package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the signature kernels' mathematical guarantees —
  * checked directly on the static kernels (no Spark session). ScalaCheck
  * generators sampled under fixed seeds (the scalatestplus bridge is not on
  * the offline classpath), so runs are deterministic. */
class KernelPropertiesSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    graft.SeededGen.forAll(gen, n)(f)

  private def arr(tokens: Seq[String]) =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t)).toArray[Any])

  private val token: Gen[String] =
    Gen.choose(0, 499).map(i => s"w$i")
  private def tokensGen(min: Int, max: Int): Gen[List[String]] =
    Gen.choose(min, max).flatMap(n => Gen.listOfN(n, token))

  test("winnowing guarantee: a shared run of >= a + win - 1 tokens always " +
    "shares a fingerprint (SIGMOD'03 theorem, property-checked)") {
    val a = 8; val win = 5
    val gen = for {
      run <- Gen.listOfN(a + win - 1, Gen.choose(0, 999).map(i => s"r$i"))
      pre1 <- tokensGen(0, 30); suf1 <- tokensGen(0, 30)
      pre2 <- tokensGen(0, 30); suf2 <- tokensGen(0, 30)
    } yield (pre1 ++ run ++ suf1, pre2 ++ run ++ suf2)
    forAll(gen) { case (d1, d2) =>
      val f1 = WinnowExpr.fingerprints(arr(d1), a, win, 42L)
      val f2 = WinnowExpr.fingerprints(arr(d2), a, win, 42L)
      val s1 = (0 until f1.numElements()).map(f1.getLong).toSet
      val s2 = (0 until f2.numElements()).map(f2.getLong).toSet
      assert(s1.intersect(s2).nonEmpty)
    }
  }

  test("winnow positioned anchors select the same fingerprint set as the " +
    "flat form, and positions index real grams") {
    forAll(tokensGen(0, 120)) { toks =>
      val a = 8; val win = 5
      val flat = WinnowExpr.fingerprints(arr(toks), a, win, 42L)
      val pos = WinnowPosExpr.fingerprints(arr(toks), a, win, 42L)
      val flatSet = (0 until flat.numElements()).map(flat.getLong).toSet
      val posPairs = (0 until pos.numElements()).map { i =>
        val r = pos.getStruct(i, 2); (r.getLong(0), r.getInt(1))
      }
      assert(posPairs.map(_._1).toSet == flatSet)
      // positions are strictly increasing and in-range
      val ps = posPairs.map(_._2)
      assert(ps == ps.sorted && ps.distinct == ps)
      if (toks.length >= a) assert(ps.forall(p => p >= 0 && p <= toks.length - a))
      else assert(ps.isEmpty)
    }
  }

  test("minhash: signature slots agree between identical shingle sets and " +
    "the multiply-shift permutations are order-insensitive") {
    forAll(Gen.listOf(Gen.long)) { xs =>
      val distinct = xs.distinct
      val s1 = new GenericArrayData(distinct.toArray)
      val s2 = new GenericArrayData(scala.util.Random.shuffle(distinct).toArray)
      val a = MinHashSigExpr.signature(s1, 32, 42L)
      val b = MinHashSigExpr.signature(s2, 32, 42L)
      assert((0 until 32).forall(j => a.getLong(j) == b.getLong(j)))
    }
  }

  test("minhash collision rate estimates Jaccard (statistical sanity)") {
    // two sets with known overlap: J = |inter| / |union| = 100/300
    val base = (0L until 200L).map(i => i * 7919L)
    val other = (100L until 300L).map(i => i * 7919L)
    val k = 256
    val a = MinHashSigExpr.signature(new GenericArrayData(base.toArray), k, 42L)
    val b = MinHashSigExpr.signature(new GenericArrayData(other.toArray), k, 42L)
    val agree = (0 until k).count(j => a.getLong(j) == b.getLong(j))
    val est = agree.toDouble / k
    val j = 100.0 / 300.0
    assert(math.abs(est - j) < 0.12, s"est $est vs $j") // ~4 sigma at k=256
  }

  test("symmetric-delete completeness: any pair within levenshtein 2 " +
    "shares a deletion-variant hash (the fuzzy equi-join's recall claim)") {
    // plain Levenshtein, reference semantics (t_levdist analogue)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val alpha = "abcdefg" // small alphabet -> edits often collide/cancel
    val wordGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString))
    val editGen: Gen[(String, String)] = for {
      w <- wordGen
      nEdits <- Gen.choose(0, 2)
      edited <- (0 until nEdits).foldLeft(Gen.const(w)) { (g, _) =>
        g.flatMap { s =>
          for {
            op <- Gen.choose(0, 2)
            pos <- Gen.choose(0, math.max(0, s.length - 1))
            c <- Gen.oneOf(alpha.toSeq)
          } yield op match {
            case 0 if s.nonEmpty => s.updated(pos, c)                // sub
            case 1 => s.substring(0, pos) + c + s.substring(pos)     // ins
            case 2 if s.length > 1 =>                                // del
              s.substring(0, pos) + s.substring(pos + 1)
            case _ => s
          }
        }
      }
    } yield (w, edited)
    forAll(editGen, n = 300) { case (a, b) =>
      val d = lev(a, b)
      if (d <= 2 && a.nonEmpty && b.nonEmpty) {
        val ha = DeleteVariantsExpr.hashArray(a, 2, 32).toSet
        val hb = DeleteVariantsExpr.hashArray(b, 2, 32).toSet
        assert(ha.intersect(hb).nonEmpty,
          s"'$a' ~ '$b' (lev $d) share no delete variant")
      }
    }
  }

  test("tokenize memo is invisible: repeated calls and repeated tokens " +
    "yield byte-identical streams") {
    forAll(tokensGen(0, 60)) { toks =>
      val text = UTF8String.fromString(toks.mkString(" "))
      def run() = {
        val r = NxsTokenizeExpr.tokenize(text, UTF8String.fromString("en"),
          "normalizer,stopwords,stemmer", true)
        (0 until r.numElements()).map(i => r.getUTF8String(i).toString)
      }
      val first = run()
      assert(run() == first) // second call is fully memo-served
    }
  }
}
