package graft.gen

import java.util.SplittableRandom

/** Minimal deterministic generator monad — the engine's self-contained
  * analog of the ScalaCheck `Gen` the reference builds its data-synthesis
  * API on (ratatool-scalacheck/.../package.scala:43-210). Kept dependency-
  * free so generators are part of the LIBRARY surface (the reference ships
  * them as a public API, not test scaffolding).
  *
  * A `Gen[A]` is a pure function from a seeded PRNG to a value; all
  * randomness flows through the passed `SplittableRandom`, so a (seed,
  * structure) pair reproduces exactly — including across executors, which
  * is what makes distributed generation deterministic (see
  * [[RowGen.distributed]]).
  */
trait Gen[+A] extends Serializable { self =>
  def apply(rnd: SplittableRandom): A

  def map[B](f: A => B): Gen[B] = (rnd: SplittableRandom) => f(self(rnd))
  def flatMap[B](f: A => Gen[B]): Gen[B] = (rnd: SplittableRandom) => f(self(rnd))(rnd)

  /** Sample with an explicit seed (driver-side convenience). */
  def sample(seed: Long): A = apply(new SplittableRandom(seed))
}

object Gen {
  def const[A](a: A): Gen[A] = (_: SplittableRandom) => a
  def delay[A](f: SplittableRandom => A): Gen[A] = (rnd: SplittableRandom) => f(rnd)

  val long: Gen[Long] = delay(_.nextLong())
  val int: Gen[Int] = delay(_.nextInt())
  val double: Gen[Double] = delay(_.nextDouble())
  val float: Gen[Float] = delay(_.nextDouble().toFloat)
  val boolean: Gen[Boolean] = delay(_.nextBoolean())

  def choose(lo: Long, hi: Long): Gen[Long] = delay(_.nextLong(lo, hi + 1))
  def chooseInt(lo: Int, hi: Int): Gen[Int] = delay(_.nextInt(lo, hi + 1))

  def oneOf[A](xs: Seq[A]): Gen[A] = {
    require(xs.nonEmpty, "oneOf needs a non-empty candidate list")
    delay(r => xs(r.nextInt(xs.size)))
  }

  /** Weighted choice, mirroring ScalaCheck `Gen.frequency`. */
  def frequency[A](weighted: (Int, Gen[A])*): Gen[A] = {
    val total = weighted.map(_._1).sum
    require(total > 0, "frequency needs positive total weight")
    delay { r =>
      var roll = r.nextInt(total)
      weighted.find { case (w, _) => { roll -= w; roll < 0 } }.get._2(r)
    }
  }

  def listOfN[A](n: Gen[Int], g: Gen[A]): Gen[List[A]] =
    delay(r => List.fill(n(r))(g(r)))

  def option[A](g: Gen[A], someFraction: Double = 0.5): Gen[Option[A]] =
    delay(r => if (r.nextDouble() < someFraction) Some(g(r)) else None)

  /** Reference-flavored strings: biased toward "", " ", "foo" plus random
    * alphanumerics of bounded length (AvroGenerator.scala:98-103). */
  def alphaNumString(maxLen: Int = 39): Gen[String] = frequency(
    1 -> const(""),
    1 -> const(" "),
    1 -> const("foo"),
    7 -> delay { r =>
      val n = r.nextInt(maxLen + 1)
      val sb = new StringBuilder(n)
      var i = 0
      while (i < n) {
        val c = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        sb.append(c.charAt(r.nextInt(c.length))); i += 1
      }
      sb.toString
    })

  def bytes(maxLen: Int = 16): Gen[Array[Byte]] = delay { r =>
    val b = new Array[Byte](r.nextInt(maxLen + 1))
    var i = 0
    while (i < b.length) { b(i) = r.nextInt(256).toByte; i += 1 }
    b
  }
}

/** Property-test harness with reproducible seeds — the reference's
  * `withGen` (ratatool-scalacheck/.../GenTestUtils.scala:36-77): runs a
  * property over `n` samples and, on failure, reports the exact seed so
  * the failing case replays deterministically. */
object GenTest {
  def withGen[A](gen: Gen[A], n: Int = 100,
                 seed: Long = 42L)(property: A => Unit): Unit = {
    var i = 0
    while (i < n) {
      val caseSeed = seed + i
      val value = gen.sample(caseSeed)
      try property(value)
      catch {
        case e: Throwable =>
          throw new AssertionError(
            s"property failed at case $i (replay with seed=$caseSeed): $value", e)
      }
      i += 1
    }
  }
}
