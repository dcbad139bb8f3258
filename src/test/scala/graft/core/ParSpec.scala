package graft.core

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.concurrent.{ExecutionContext, Future}
import ExecutionContext.Implicits.global

/** The settle-before-exit contract: no leg is left running when a
  * Par call returns or throws — leg failures and thread interrupts
  * both wait for every other leg first. */
class ParSpec extends AnyFlatSpec with Matchers {

  behavior of "Par.settleAll"

  it should "return results in leg order" in {
    Par.settleAll(Seq(Future(1), Future { Thread.sleep(50); 2 },
      Future(3))) shouldBe Seq(1, 2, 3)
  }

  it should "rethrow a leg failure only after every other leg settled" in {
    @volatile var slowDone = false
    val fast = Future[Int] { throw new RuntimeException("fast leg died") }
    val slow = Future { Thread.sleep(300); slowDone = true; 7 }
    val ex = intercept[RuntimeException](Par.settleAll(Seq(fast, slow)))
    ex.getMessage shouldBe "fast leg died"
    slowDone shouldBe true // the failure waited for the sibling
  }

  it should "defer an interrupt until the legs complete" in {
    @volatile var legDone = false
    val leg = Future { Thread.sleep(300); legDone = true; 42 }
    Thread.currentThread().interrupt() // Await.result throws immediately
    val ex = intercept[InterruptedException](Par.settleAll(Seq(leg)))
    ex.getMessage should include("all legs completed")
    legDone shouldBe true // the interrupt did NOT abandon the leg
    Thread.interrupted() shouldBe true // status restored, now cleared
  }

  it should "treat a leg FAILING with InterruptedException as a leg " +
    "failure, not a wait-interrupt (no busy-spin)" in {
    @volatile var slowDone = false
    // 2.13's promise `resolve` boxes a fatal completion throwable in
    // ExecutionException both for Future bodies and direct completes, so
    // the leg's Failure is ExecutionException(cause=InterruptedException).
    // The contract under test: it is a LEG failure (rethrown only after
    // siblings settle, no phantom interrupt status) and, with the
    // Await.ready rewrite, can never be misread as a wait-interrupt even
    // if an unboxed Failure(InterruptedException) ever reached a leg.
    val p = scala.concurrent.Promise[Int]()
    p.tryComplete(scala.util.Failure(new InterruptedException("leg itself died")))
    val slow = Future { Thread.sleep(200); slowDone = true; 9 }
    val ex = intercept[java.util.concurrent.ExecutionException](
      Par.settleAll(Seq(p.future, slow)))
    ex.getCause shouldBe an[InterruptedException]
    ex.getCause.getMessage shouldBe "leg itself died"
    slowDone shouldBe true
    Thread.interrupted() shouldBe false // no phantom interrupt status
  }

  behavior of "Par.withLeg"

  it should "settle the leg even when main throws a FATAL throwable" in {
    @volatile var legDone = false
    val leg = Future { Thread.sleep(300); legDone = true; 1 }
    // InterruptedException is fatal to Try/NonFatal — pre-fix it skipped
    // the settle and left the leg running past the scope
    val ex = intercept[InterruptedException](
      Par.withLeg(leg) { throw new InterruptedException("main fatally died") })
    ex.getMessage shouldBe "main fatally died"
    legDone shouldBe true
  }

  it should "settle the leg before rethrowing a main-thread failure" in {
    @volatile var legDone = false
    val leg = Future { Thread.sleep(300); legDone = true; 1 }
    val ex = intercept[IllegalStateException](
      Par.withLeg(leg) { throw new IllegalStateException("main died") })
    ex.getMessage shouldBe "main died"
    legDone shouldBe true
  }

  it should "return both results on success" in {
    Par.withLeg(Future { Thread.sleep(20); "leg" })("main") shouldBe
      ("leg", "main")
  }
}
