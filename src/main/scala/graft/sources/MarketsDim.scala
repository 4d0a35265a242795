package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Frame

/** Market / token dimension from `active_markets` frames (SURVEY.md
  * §1.1(5), §2.1 S2, §2.2 F1/F7; reference structs
  * `collector/src/lib.rs:32-80`).
  *
  * The reference schema is open: fixed core fields plus a flattened
  * bag of unmodeled JSON (`#[serde(flatten)] other`,
  * `lib.rs:40-41,63-65`). We model that as typed core columns + an
  * `other_json` string column holding the unmodeled remainder — typed
  * where it pays, schema-on-read where it doesn't (SURVEY.md §7.4(4)).
  *
  * Scale note: dimension frames are one per hourly file — thousands of
  * rows, not billions. These frames parse on executors (the frame scan
  * is distributed); the resulting dim is exactly what downstream joins
  * should `broadcast()`.
  */
object MarketsDim {

  final case class Token(
      outcome: String,
      price: Double,
      token_id: String,
      winner: Boolean,
      other_json: String,
  )

  final case class Market(
      file_hour: String,
      line_no: Long,
      id: String,
      condition_id: String,
      question_id: String,
      question: String,
      description: String,
      closed: Boolean,
      accepting_orders: Boolean,
      active: Boolean,
      archived: Boolean,
      enable_order_book: Boolean,
      tokens: Seq[Token],
      other_json: String,
  )

  private val CoreMarketKeys = Set(
    "id", "condition_id", "question_id", "question", "description",
    "closed", "accepting_orders", "active", "archived",
    "enable_order_book", "tokens")
  private val CoreTokenKeys = Set("outcome", "price", "token_id", "winner")

  /** S2 + explode: every market row carried by every `active_markets`
    * frame in the input (callers pick a frame via `file_hour`, e.g.
    * latest or earliest — `cli/src/main.rs:180-185`).
    */
  def markets(frames: Dataset[Frame]): Dataset[Market] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames
      .filter($"messageType" === "active_markets")
      .flatMap { f =>
        val mapper = new ObjectMapper()
        val root = mapper.readTree(f.content)
        val ms = root.get("markets")
        if (ms == null || !ms.isArray) Nil
        else
          ms.elements().asScala.map { m =>
            val other = mapper.createObjectNode()
            m.properties().asScala
              .filterNot(e => CoreMarketKeys(e.getKey))
              .foreach { e => other.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue); () }
            val tokens = Option(m.get("tokens")).filter(_.isArray).toSeq
              .flatMap(_.elements().asScala)
              .map { t =>
                val tOther = mapper.createObjectNode()
                t.properties().asScala
                  .filterNot(e => CoreTokenKeys(e.getKey))
                  .foreach { e => tOther.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue); () }
                Token(
                  outcome = txt(t, "outcome"),
                  price = num(t, "price"),
                  token_id = txt(t, "token_id"),
                  winner = bool(t, "winner"),
                  other_json = tOther.toString,
                )
              }
            Market(
              file_hour = f.fileHour,
              line_no = f.lineNo,
              id = txt(m, "id"),
              condition_id = txt(m, "condition_id"),
              question_id = txt(m, "question_id"),
              question = txt(m, "question"),
              description = txt(m, "description"),
              closed = bool(m, "closed"),
              accepting_orders = bool(m, "accepting_orders"),
              active = bool(m, "active"),
              archived = bool(m, "archived"),
              enable_order_book = bool(m, "enable_order_book"),
              tokens = tokens,
              other_json = other.toString,
            )
          }.toSeq
      }
  }

  /** F1: the reference's activity predicate — note `active` itself is
    * NOT consulted (`collector/src/lib.rs:68-72`).
    */
  def activeMarkets(ms: Dataset[Market]): Dataset[Market] =
    ms.filter(m =>
      m.enable_order_book && m.accepting_orders && !m.archived && !m.closed)

  /** F7/J1 dim: one row per token — the broadcast side of the
    * asset→outcome lookup (`notebooks/bbo.ipynb` cell 1).
    */
  def tokenDim(ms: Dataset[Market]): DataFrame = {
    val spark = ms.sparkSession
    import spark.implicits._
    ms.select($"condition_id", $"question_id", $"question", explode($"tokens").as("t"))
      .select(
        $"condition_id",
        $"question_id",
        $"question",
        $"t.outcome".as("outcome"),
        $"t.price".as("token_price"),
        $"t.token_id".as("token_id"),
        $"t.winner".as("winner"),
      )
      .filter(length($"token_id") > 0)
  }

  private def txt(n: com.fasterxml.jackson.databind.JsonNode, k: String): String =
    Option(n.get(k)).filterNot(_.isNull).map(_.asText()).orNull
  private def num(n: com.fasterxml.jackson.databind.JsonNode, k: String): Double =
    Option(n.get(k)).map(_.asDouble()).getOrElse(0.0)
  private def bool(n: com.fasterxml.jackson.databind.JsonNode, k: String): Boolean =
    Option(n.get(k)).exists(_.asBoolean())
}
