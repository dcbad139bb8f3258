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

  behavior of "Par.withLeg"

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
