package graft.operators

import java.math.BigDecimal

import scala.collection.mutable

import graft.model.{Change, Level}

/** Per-asset limit order book: price → size, both sides sorted by
  * price. Mirrors the reference's
  * `Book { asks: BTreeMap<Decimal,Decimal>, bids: ... }`
  * (`cli/src/tick_generator.rs:233-281`), keyed on exact decimals —
  * `BigDecimal` compared by `compareTo` so `"0.55"` and `"0.550"` hit
  * the same level, exactly like `rust_decimal` keys. Doubles appear
  * only in the emitted tick (the reference's one lossy cast,
  * `tick_generator.rs:89-90`).
  */
final class Book {
  private val cmp: Ordering[BigDecimal] = (a, b) => a.compareTo(b)
  val asks: mutable.TreeMap[BigDecimal, BigDecimal] = mutable.TreeMap()(cmp)
  val bids: mutable.TreeMap[BigDecimal, BigDecimal] = mutable.TreeMap()(cmp)

  /** Snapshot semantics: clear both sides, rebuild
    * (`tick_generator.rs:241-254`).
    */
  def resetFromSnapshot(askLvls: Seq[Level], bidLvls: Seq[Level]): this.type = {
    asks.clear()
    bids.clear()
    if (askLvls != null)
      askLvls.foreach(l =>
        if (l != null && l.price != null && l.size != null)
          asks.update(new BigDecimal(l.price), new BigDecimal(l.size)))
    if (bidLvls != null)
      bidLvls.foreach(l =>
        if (l != null && l.price != null && l.size != null)
          bids.update(new BigDecimal(l.price), new BigDecimal(l.size)))
    this
  }

  /** Diff semantics: upsert level; size == 0 deletes it
    * (`tick_generator.rs:256-272`, delete-on-zero `:264-267`). Wire
    * side is BUY(bid)/SELL(ask) (`tick_generator.rs:407-413`).
    */
  def updateFromDiff(changes: Seq[Change]): this.type = {
    if (changes != null) changes.foreach { c =>
      // incomplete entries (missing price/size) and unknown sides are
      // skipped rather than NPE-ing or silently mutating the ask side
      // — serde's Side enum admits only BUY/SELL
      // (`tick_generator.rs:407-413`), so anything else is dirty data
      // the strict parse gate would have rejected
      if (c != null && c.price != null && c.size != null &&
        (c.side == "BUY" || c.side == "SELL")) {
        val side = if (c.side == "BUY") bids else asks
        val size = new BigDecimal(c.size)
        if (size.signum() == 0) side.remove(new BigDecimal(c.price))
        else side.update(new BigDecimal(c.price), size)
      }
    }
    this
  }

  /** Best ask = lowest ask; (0,0) when the side is empty
    * (`tick_generator.rs:274-281`).
    */
  def topAsk: (Double, Double) =
    asks.headOption
      .map { case (p, s) => (p.doubleValue, s.doubleValue) }
      .getOrElse((0.0, 0.0))

  /** Best bid = highest bid; (0,0) when the side is empty. */
  def topBid: (Double, Double) =
    bids.lastOption
      .map { case (p, s) => (p.doubleValue, s.doubleValue) }
      .getOrElse((0.0, 0.0))
}
