package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap
import scala.concurrent.ExecutionContext.Implicits.global

import org.scalatest.funsuite.AnyFunSuite

import MarketsConnector._

/** Connector policy tests, mirroring the reference's own unit suite
  * (`collector/src/client/mod.rs:416-506`,
  * `connection.rs:372-523`) — code-as-spec for the split threshold.
  */
class MarketsConnectorSpec extends AnyFunSuite {

  private def dec(c: String) =
    new String(Base64.getDecoder.decode(c), StandardCharsets.UTF_8).toInt

  test("cursor is base64 of row offset (C7)") {
    assert(cursorFor(0) == Base64.getEncoder.encodeToString("0".getBytes))
    assert(dec(cursorFor(1)) == 500)
    assert(dec(cursorFor(7, 250)) == 1750)
  }

  test("windowed concurrent pagination collects every page until a short tail") {
    // 7 full pages of 500 + one page of 123 = 3623 markets
    val served = TrieMap.empty[Int, Int]
    def fetch(cursor: String): Page = {
      val page = dec(cursor) / 500
      served.updateWith(page) { n => Some(n.getOrElse(0) + 1) }
      val size = if (page < 7) 500 else if (page == 7) 123 else 0
      Page((0 until size).map(i => s"m${page * 500 + i}"), None)
    }
    val all = fetchAllMarkets(fetch, pageSize = 500, concurrency = 5)
    assert(all.size == 3623)
    assert(all.distinct.size == 3623)
    // every data page fetched exactly once
    (0 to 7).foreach(p => assert(served(p) == 1))
  }

  test("sequential pagination follows cursors and retries transient failures") {
    val failures = new AtomicInteger(2)
    def fetch(cursor: String): Page = {
      if (failures.getAndDecrement() > 0) throw new RuntimeException("flaky")
      cursor match {
        case "a" => Page(Seq("m1", "m2"), Some("b"))
        case "b" => Page(Seq("m3"), None)
        case other => fail(s"unexpected cursor $other")
      }
    }
    assert(fetchAllSequential(fetch, firstCursor = "a") == Seq("m1", "m2", "m3"))
    // exhausted retries propagate
    def alwaysFail(c: String): Page = throw new RuntimeException("down")
    intercept[RuntimeException](fetchAllSequential(alwaysFail, "a", maxRetries = 2))
  }

  test("sharding packs at most 25 assets per connection (reference cases)") {
    assert(shardAssets(Nil).isEmpty) // empty
    assert(shardAssets(Seq("a")) == Seq(Seq("a"))) // single
    assert(shardAssets((1 to 50).map(_.toString)).forall(_.size == 25)) // even
    val odd = shardAssets((1 to 51).map(_.toString))
    assert(odd.map(_.size) == Seq(25, 25, 1)) // odd
    assert(shardAssets((1 to 25).map(_.toString)) == Seq((1 to 25).map(_.toString))) // exactly 25
  }

  test("split_markets halves with the extra element in the SECOND half " +
    "(split_at(len/2): 5 -> (2,3), 1 -> (0,1) per mod.rs:395-408)") {
    assert(splitMarkets(Seq.empty[String]) == ((Nil, Nil)))
    assert(splitMarkets(Seq("a")) == ((Nil, Seq("a"))))
    assert(splitMarkets(Seq("a", "b")) == ((Seq("a"), Seq("b"))))
    assert(splitMarkets(Seq("a", "b", "c")) == ((Seq("a"), Seq("b", "c"))))
    assert(splitMarkets((1 to 5).toSeq) == ((Seq(1, 2), Seq(3, 4, 5))))
  }

  test("shouldSplit truth table (threshold 20, code-as-spec)") {
    assert(shouldSplit(20, previouslyOpened = true, nMarkets = 2))
    assert(shouldSplit(25, previouslyOpened = true, nMarkets = 10))
    assert(!shouldSplit(19, previouslyOpened = true, nMarkets = 2)) // below threshold
    assert(!shouldSplit(20, previouslyOpened = false, nMarkets = 2)) // never opened
    assert(!shouldSplit(20, previouslyOpened = true, nMarkets = 1)) // single market
  }

  test("subscribe message shape (S5/F7)") {
    assert(subscribeMessage(Seq("t1", "", "t2")) ==
      """{"type":"MARKET","assets_ids":["t1","t2"]}""")
    assert(subscribeMessage(Nil) == """{"type":"MARKET","assets_ids":[]}""")
  }
}
