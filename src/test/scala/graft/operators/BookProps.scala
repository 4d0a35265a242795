package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.model.{Change, Level}

/** ScalaCheck properties for the book (pure JVM, no Spark): the
  * TreeMap fold agrees with an immutable-map model under arbitrary
  * snapshot/diff interleavings (SURVEY.md §5 properties (a)/(b)).
  */
object BookProps extends Properties("Book") {

  private val priceGen: Gen[String] =
    Gen.chooseNum(1, 999).map(c => f"0.${c}%03d")
  // deliberately include differently-scaled zeros and trailing-zero
  // duplicates of the same numeric price
  private val scaledPriceGen: Gen[String] =
    Gen.oneOf(priceGen, priceGen.map(_ + "0"))
  private val sizeGen: Gen[String] =
    Gen.frequency(3 -> Gen.chooseNum(1, 9999).map(_.toString), 1 -> Gen.oneOf("0", "0.0", "0.00"))
  private val sideGen: Gen[String] = Gen.oneOf("BUY", "SELL")

  private val changeGen: Gen[Change] =
    for { p <- scaledPriceGen; s <- sizeGen; sd <- sideGen } yield Change(p, s, sd)

  private val levelsGen: Gen[Seq[Level]] =
    Gen.listOfN(4, for { p <- scaledPriceGen; s <- sizeGen.suchThat(_ != "0") } yield Level(p, s))
      .map(_.distinctBy(l => BigDecimal(l.price)))

  sealed trait Op
  private case class Snap(asks: Seq[Level], bids: Seq[Level]) extends Op
  private case class Diff(changes: Seq[Change]) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    1 -> (for { a <- levelsGen; b <- levelsGen } yield Snap(a, b)),
    4 -> Gen.nonEmptyListOf(changeGen).map(Diff(_)),
  )

  private def modelTop(m: Map[BigDecimal, BigDecimal], best: Boolean): (Double, Double) = {
    val pick = if (best) m.maxByOption(_._1) else m.minByOption(_._1)
    pick.map { case (p, s) => (p.toDouble, s.toDouble) }.getOrElse((0.0, 0.0))
  }

  property("fold top-of-book equals immutable-map model") =
    forAll(Gen.listOf(opGen)) { ops =>
      val book = new Book
      var asks = Map.empty[BigDecimal, BigDecimal]
      var bids = Map.empty[BigDecimal, BigDecimal]
      ops.forall { op =>
        op match {
          case Snap(a, b) =>
            book.resetFromSnapshot(a, b)
            asks = a.map(l => BigDecimal(l.price) -> BigDecimal(l.size)).toMap
            bids = b.map(l => BigDecimal(l.price) -> BigDecimal(l.size)).toMap
          case Diff(cs) =>
            book.updateFromDiff(cs)
            cs.foreach { c =>
              val p = BigDecimal(c.price)
              val s = BigDecimal(c.size)
              if (c.side == "BUY") bids = if (s == 0) bids - p else bids + (p -> s)
              else asks = if (s == 0) asks - p else asks + (p -> s)
            }
        }
        book.topAsk == modelTop(asks, best = false) &&
        book.topBid == modelTop(bids, best = true)
      }
    }

  property("snapshot then replayed diffs ≡ direct final state") =
    forAll(levelsGen, levelsGen, Gen.listOf(changeGen)) { (a, b, cs) =>
      val b1 = new Book
      b1.resetFromSnapshot(a, b)
      cs.foreach(c => b1.updateFromDiff(Seq(c)))
      val b2 = new Book
      b2.resetFromSnapshot(a, b)
      b2.updateFromDiff(cs)
      b1.topAsk == b2.topAsk && b1.topBid == b2.topBid &&
      b1.asks.size == b2.asks.size && b1.bids.size == b2.bids.size
    }
}
