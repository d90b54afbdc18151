package graft

import org.scalacheck.Gen

/** Deterministic ScalaCheck sampling shared by the fuzz/property suites
  * (the scalatestplus bridge is not on the offline classpath): each of the
  * `n` iterations samples `gen` under seed i, so every run exercises the
  * identical corpus. A sample can come back None (e.g. a `suchThat` filter
  * rejecting the draw); that seed is skipped and counted — callers get a
  * guarantee that most of the corpus actually ran. */
object SeededGen {
  def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var i = 0
    var skipped = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)) match {
        case Some(a) => f(a)
        case None => skipped += 1
      }
      i += 1
    }
    assert(skipped <= n / 4,
      s"generator rejected $skipped of $n seeds — corpus too thin to mean anything")
  }
}
