package graft.tools

import graft.gen.{Gen, GenTest}

/** Scratch probe: withGen failure reporting through the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    println("== clean property over 1000 cases:")
    GenTest.withGen(Gen.chooseInt(0, 100), n = 1000) { v => assert(v <= 100) }
    println("   ok")

    println("== failing property (expect seed-stamped AssertionError):")
    try {
      GenTest.withGen(Gen.chooseInt(0, 1000), n = 300, seed = 7L) { v =>
        assert(v < 995, s"$v too big")
      }
      println("   NO ERROR — BUG")
    } catch {
      case e: AssertionError =>
        println("   message: " + e.getMessage)
        val seed = e.getMessage.split("seed=")(1).split(')')(0).toLong
        println("   replayed value with that seed: " + Gen.chooseInt(0, 1000).sample(seed))
    }
  }
}
