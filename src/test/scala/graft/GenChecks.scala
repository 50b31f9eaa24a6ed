package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property harness over raw ScalaCheck Gen (the
  * scalatest-plus bridge isn't on the offline classpath). Seeded, so runs
  * are reproducible — mirroring the reference's hypothesis usage
  * (/root/reference/tests/test_fuzzer.py) without randomness flake. */
trait GenChecks {
  def forAll[A](gen: Gen[A], trials: Int = 100)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    var done = 0
    var attempts = 0
    while (done < trials && attempts < trials * 50) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => body(a); done += 1
        case None    => ()
      }
      seed = seed.next
      attempts += 1
    }
    require(done >= trials / 2, s"generator too sparse: $done/$trials")
  }

  def forAll2[A, B](ga: Gen[A], gb: Gen[B], trials: Int = 100)(
      body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), trials) { case (a, b) => body(a, b) }
}
