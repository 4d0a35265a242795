package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Change, Level}

/** Unit semantics of the per-asset book (reference
  * `cli/src/tick_generator.rs:233-281`).
  */
class BookSpec extends AnyFunSuite {

  test("snapshot resets both sides completely") {
    val b = new Book
    b.updateFromDiff(Seq(Change("0.10", "5", "BUY"), Change("0.90", "5", "SELL")))
    b.resetFromSnapshot(
      askLvls = Seq(Level("0.55", "100"), Level("0.60", "25")),
      bidLvls = Seq(Level("0.52", "40"), Level("0.50", "200")))
    assert(b.topAsk == ((0.55, 100.0)))
    assert(b.topBid == ((0.52, 40.0)))
    assert(b.asks.size == 2 && b.bids.size == 2) // stale levels gone
  }

  test("diff upserts levels and zero size deletes") {
    val b = new Book
    b.resetFromSnapshot(Seq(Level("0.55", "100")), Seq(Level("0.52", "40")))
    b.updateFromDiff(Seq(Change("0.55", "0", "SELL"), Change("0.53", "10", "BUY")))
    assert(b.topAsk == ((0.0, 0.0))) // only ask deleted -> empty side
    assert(b.topBid == ((0.53, 10.0)))
  }

  test("empty sides yield (0,0) like unwrap_or_default") {
    val b = new Book
    assert(b.topAsk == ((0.0, 0.0)))
    assert(b.topBid == ((0.0, 0.0)))
  }

  test("best ask is lowest ask, best bid is highest bid") {
    val b = new Book
    b.updateFromDiff(Seq(
      Change("0.60", "1", "SELL"), Change("0.55", "2", "SELL"),
      Change("0.50", "3", "BUY"), Change("0.52", "4", "BUY")))
    assert(b.topAsk == ((0.55, 2.0)))
    assert(b.topBid == ((0.52, 4.0)))
  }

  test("decimal keys unify trailing zeros (0.55 == 0.550)") {
    val b = new Book
    b.updateFromDiff(Seq(Change("0.55", "10", "SELL")))
    b.updateFromDiff(Seq(Change("0.550", "20", "SELL")))
    assert(b.asks.size == 1)
    assert(b.topAsk == ((0.55, 20.0)))
    // and a zero with different scale still deletes
    b.updateFromDiff(Seq(Change("0.5500", "0.000", "SELL")))
    assert(b.topAsk == ((0.0, 0.0)))
  }

  test("wire sides: BUY targets bids, SELL targets asks") {
    val b = new Book
    b.updateFromDiff(Seq(Change("0.40", "7", "BUY"), Change("0.41", "8", "SELL")))
    assert(b.bids.size == 1 && b.asks.size == 1)
  }

  test("high-precision sizes survive until the double cast") {
    val b = new Book
    b.updateFromDiff(Seq(Change("0.001", "1234567.89", "SELL")))
    assert(b.topAsk == ((0.001, 1234567.89)))
  }
}
