package graft.sources

import java.io.{InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, LinkedBlockingQueue, TimeUnit}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** RFC 6455 client framing: the codec against the RFC's OWN published
  * example vectors (§1.3 handshake, §5.7 framing), then the full
  * live-feed client lifecycle over a real loopback WebSocket server —
  * handshake, masked subscribe, control-frame handshakes (server ping
  * → client pong), fragmentation reassembly, and delivery through the
  * exact client stack the NDJSON loopback tests drive. Only TLS is
  * absent vs the reference's `wss://`.
  */
class WsFramesSpec extends AnyFunSuite {

  // --- RFC 6455 published vectors -----------------------------------------

  test("Sec-WebSocket-Accept matches the RFC 6455 §1.3/§4.2.2 example") {
    assert(WsCodec.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ==
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("frame codec reproduces the §5.7 example vectors bit for bit") {
    // single-frame unmasked text "Hello"
    val unmasked = Array(0x81, 0x05, 0x48, 0x65, 0x6c, 0x6c, 0x6f).map(_.toByte)
    assert(WsCodec.encodeFrame(WsCodec.OpText,
      "Hello".getBytes(StandardCharsets.UTF_8), None).sameElements(unmasked))
    // single-frame masked text "Hello" with mask 37 fa 21 3d
    val mask = Array(0x37, 0xfa, 0x21, 0x3d).map(_.toByte)
    val masked = Array(0x81, 0x85, 0x37, 0xfa, 0x21, 0x3d,
      0x7f, 0x9f, 0x4d, 0x51, 0x58).map(_.toByte)
    assert(WsCodec.encodeFrame(WsCodec.OpText,
      "Hello".getBytes(StandardCharsets.UTF_8), Some(mask)).sameElements(masked))
    // both decode back to "Hello"
    for (wire <- Seq(unmasked, masked)) {
      val Some((fin, op, payload, used)) = WsCodec.decodeFrame(wire, 0)
      assert(fin && op == WsCodec.OpText && used == wire.length)
      assert(new String(payload, StandardCharsets.UTF_8) == "Hello")
    }
    // 256-byte payload takes the 16-bit extended length path
    val big = Array.fill(256)('x'.toByte)
    val enc = WsCodec.encodeFrame(WsCodec.OpBinary, big, None)
    assert((enc(1) & 0x7f) == 126 &&
      ((enc(2) & 0xff) << 8 | (enc(3) & 0xff)) == 256)
    val Some((_, _, back, _)) = WsCodec.decodeFrame(enc, 0)
    assert(back.sameElements(big))
  }

  test("incremental decode: a frame split at every byte boundary still " +
    "parses exactly once (the soTimeout-mid-frame property)") {
    val wire = WsCodec.encodeFrame(WsCodec.OpText,
      "split me".getBytes(StandardCharsets.UTF_8),
      Some(Array(1, 2, 3, 4).map(_.toByte)))
    for (cut <- 1 until wire.length) {
      assert(WsCodec.decodeFrame(wire.take(cut), 0).isEmpty, s"cut $cut")
      val Some((_, _, payload, used)) = WsCodec.decodeFrame(wire, 0)
      assert(used == wire.length &&
        new String(payload, StandardCharsets.UTF_8) == "split me")
    }
  }

  // --- a real loopback WebSocket server -----------------------------------

  /** Minimal RFC 6455 server: HTTP Upgrade handshake, then frames.
    * Records every client text payload; `behavior` drives the serve
    * side per connection.
    */
  private final class WsLoopbackServer(
      behavior: (Int, String, WsServerIo) => Unit,
      makeServer: () => ServerSocket =
        () => new ServerSocket(0, 16, InetAddress.getLoopbackAddress)) {
    private val server = makeServer()
    val port: Int = server.getLocalPort
    val subscribes = new ConcurrentLinkedQueue[String]()
    val clientTexts = new ConcurrentLinkedQueue[String]()
    val clientPongs = new ConcurrentLinkedQueue[String]()
    private val nConn = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile private var closed = false

    private val acceptor = new Thread(() => {
      try {
        while (!closed) {
          val sock = server.accept()
          val idx = nConn.getAndIncrement()
          val t = new Thread(() => handle(idx, sock), s"ws-loopback-$idx")
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: Exception => () }
    }, "ws-loopback-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()

    private def handle(idx: Int, sock: Socket): Unit = {
      try {
        val in = sock.getInputStream
        val out = sock.getOutputStream
        // HTTP request up to CRLFCRLF
        val hdr = new java.io.ByteArrayOutputStream
        var done = false
        while (!done) {
          val b = in.read()
          if (b < 0) return
          hdr.write(b)
          val a = hdr.toByteArray
          val n = a.length
          done = n >= 4 && a(n - 4) == '\r' && a(n - 3) == '\n' &&
            a(n - 2) == '\r' && a(n - 1) == '\n'
        }
        val req = new String(hdr.toByteArray, StandardCharsets.ISO_8859_1)
        assert(req.startsWith("GET "), "ws server: not an HTTP GET")
        assert(req.toLowerCase.contains("upgrade: websocket"))
        val key = req.linesIterator
          .find(_.toLowerCase.startsWith("sec-websocket-key:"))
          .map(_.split(":", 2)(1).trim).get
        val resp = "HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: ${WsCodec.acceptKey(key)}\r\n\r\n"
        out.write(resp.getBytes(StandardCharsets.ISO_8859_1))
        out.flush()
        val io = new WsServerIo(sock, in, out, clientTexts, clientPongs)
        // first client text frame is the subscribe
        val sub = io.readText(5000)
        if (sub != null) {
          subscribes.add(sub)
          behavior(idx, sub, io)
        }
      } catch { case _: Exception => () }
      finally { try sock.close() catch { case _: Exception => () } }
    }

    def connectionsSeen: Int = nConn.get()
    def close(): Unit = {
      closed = true
      try server.close() catch { case _: Exception => () }
    }
  }

  private final class WsServerIo(
      sock: Socket,
      in: InputStream,
      out: OutputStream,
      texts: ConcurrentLinkedQueue[String],
      pongs: ConcurrentLinkedQueue[String]) {
    private var buf = Array.emptyByteArray
    private var off = 0

    def sendText(text: String): Unit = out.synchronized {
      out.write(WsCodec.encodeFrame(WsCodec.OpText,
        text.getBytes(StandardCharsets.UTF_8), None))
      out.flush()
    }
    /** Server-initiated fragmented message: text frame FIN=0 +
      * continuation FIN=1 — hand-built (the codec always sets FIN).
      */
    def sendFragmented(a: String, b: String): Unit = out.synchronized {
      val f1 = WsCodec.encodeFrame(WsCodec.OpText,
        a.getBytes(StandardCharsets.UTF_8), None)
      f1(0) = (f1(0) & 0x7f).toByte // clear FIN
      out.write(f1)
      out.write(WsCodec.encodeFrame(WsCodec.OpCont,
        b.getBytes(StandardCharsets.UTF_8), None))
      out.flush()
    }
    def sendPing(payload: String): Unit = out.synchronized {
      out.write(WsCodec.encodeFrame(WsCodec.OpPing,
        payload.getBytes(StandardCharsets.UTF_8), None))
      out.flush()
    }
    /** Fragmented BINARY message: OpBinary FIN=0 + OpCont FIN=1. A
      * text-only client must drop BOTH fragments — the continuation
      * carries no opcode (RFC 6455 §5.4), so the client has to
      * remember the message was binary.
      */
    def sendFragmentedBinary(a: Array[Byte], b: Array[Byte]): Unit = out.synchronized {
      val f1 = WsCodec.encodeFrame(WsCodec.OpBinary, a, None)
      f1(0) = (f1(0) & 0x7f).toByte // clear FIN
      out.write(f1)
      out.write(WsCodec.encodeFrame(WsCodec.OpCont, b, None))
      out.flush()
    }

    private def fill(): Boolean = {
      val tmp = new Array[Byte](4096)
      val k = in.read(tmp)
      if (k < 0) false
      else {
        buf = buf.drop(off) ++ tmp.take(k); off = 0; true
      }
    }

    /** Read the next client TEXT payload within `ms`, recording pongs;
      * null on EOF/timeout.
      */
    def readText(ms: Long): String = {
      sock.setSoTimeout(20)
      val deadline = System.currentTimeMillis() + ms
      while (System.currentTimeMillis() < deadline) {
        WsCodec.decodeFrame(buf, off) match {
          case Some((_, op, payload, used)) =>
            off += used
            op match {
              case WsCodec.OpText =>
                val t = new String(payload, StandardCharsets.UTF_8)
                texts.add(t)
                return t
              case WsCodec.OpPong =>
                pongs.add(new String(payload, StandardCharsets.UTF_8))
              case WsCodec.OpClose => return null
              case _ => ()
            }
          case None =>
            try { if (!fill()) return null }
            catch { case _: java.net.SocketTimeoutException => () }
        }
      }
      null
    }

    /** Drain client frames (pings/pongs) for ~`ms`. */
    def listen(ms: Long): Unit = {
      val deadline = System.currentTimeMillis() + ms
      while (System.currentTimeMillis() < deadline) {
        val remain = deadline - System.currentTimeMillis()
        if (readText(math.max(1, remain)) == null) return
      }
    }
  }

  private def cfg(port: Int) = LiveFeed.Config(
    host = "127.0.0.1", port = port,
    initialReadTimeoutMs = 5000, pingIntervalMs = 120L,
    longLivedMs = 400L, idlePaceMs = 30L, errorBackoffUnitMs = 20L,
    wsFraming = true)

  private def drainMessages(
      client: LiveFeedClient, want: Int, ms: Long): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val deadline = System.currentTimeMillis() + ms
    while (out.size < want && System.currentTimeMillis() < deadline) {
      val ev = client.events.poll(50, TimeUnit.MILLISECONDS)
      ev match {
        case LiveFeed.FeedMessage(t) => out += t
        case _ => ()
      }
    }
    out.toSeq
  }

  test("the full client lifecycle over real RFC 6455 frames: handshake, " +
    "masked subscribe, delivery, keepalive pings as ws frames, clean stop") {
    val served = new LinkedBlockingQueue[Unit]()
    val server = new WsLoopbackServer({ (_, sub, io) =>
      assert(sub.contains("\"assets_ids\"") || sub.toLowerCase.contains("subscribe"),
        s"subscribe frame shape: $sub")
      (1 to 20).foreach(i => io.sendText(s"""{"seq":$i}"""))
      served.put(())
      io.listen(1500) // keep open; record client pings (as ws text frames)
    })
    val client = new LiveFeedClient(Seq("A1", "A2", "A3"), cfg(server.port))
    try {
      client.start()
      val msgs = drainMessages(client, 20, 8000)
      assert(msgs.size == 20, s"got ${msgs.size}")
      assert(msgs.toSet == (1 to 20).map(i => s"""{"seq":$i}""").toSet)
      served.poll(2000, TimeUnit.MILLISECONDS)
      // the keepalive ping must arrive as a MASKED client text frame
      val deadline = System.currentTimeMillis() + 3000
      while (!server.clientTexts.asScala.exists(_.contains("\"ping\"")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(server.clientTexts.asScala.exists(_.contains("\"ping\"")),
        "keepalive ping did not arrive through the ws framing")
    } finally {
      client.stop()
      server.close()
    }
  }

  test("server ping gets a client pong; fragmented server text reassembles") {
    val server = new WsLoopbackServer({ (_, _, io) =>
      io.sendText("""{"seq":1}""")
      io.sendPing("hb-42")
      io.sendFragmented("""{"seq":""", """2}""")
      io.listen(1200)
    })
    val client = new LiveFeedClient(Seq("B1"), cfg(server.port))
    try {
      client.start()
      val msgs = drainMessages(client, 2, 6000)
      assert(msgs.contains("""{"seq":1}"""))
      assert(msgs.contains("""{"seq":2}"""), s"fragmented message lost: $msgs")
      val deadline = System.currentTimeMillis() + 3000
      while (server.clientPongs.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(server.clientPongs.asScala.toSeq == Seq("hb-42"),
        "ping payload must echo back in the pong")
    } finally {
      client.stop()
      server.close()
    }
  }

  test("wss: lifecycle and reconnect over real TLS — fresh TLS + ws " +
    "handshake per reopen; pinned trust rejects a foreign certificate") {
    val (ksPath, ksPass) = TlsLoopback.genKeystore()
    val sctx = TlsLoopback.serverContext(ksPath, ksPass)
    def tlsServer(behavior: (Int, String, WsServerIo) => Unit) =
      new WsLoopbackServer(behavior, () => sctx.getServerSocketFactory
        .createServerSocket(0, 16, InetAddress.getLoopbackAddress))
    val server = tlsServer({ (idx, _, io) =>
      if (idx == 0) io.sendText("""{"seq":1}""") // then return → close
      else { io.sendText("""{"seq":2}"""); io.listen(1500) }
    })
    val client = new LiveFeedClient(Seq("E1"), cfg(server.port)
      .copy(sslContext = Some(TlsLoopback.clientContext(ksPath, ksPass))))
    try {
      client.start()
      val msgs = drainMessages(client, 2, 10000)
      assert(msgs.toSet == Set("""{"seq":1}""", """{"seq":2}"""), s"got $msgs")
      assert(server.connectionsSeen >= 2,
        "the server drop must reopen through a fresh TLS + ws handshake")
    } finally {
      client.stop()
      server.close()
    }
    // pinned trust is load-bearing: a client trusting a DIFFERENT
    // fresh keystore must fail the TLS handshake and deliver nothing
    val (otherKs, otherPass) = TlsLoopback.genKeystore()
    val server2 = tlsServer({ (_, _, io) =>
      io.sendText("""{"seq":9}"""); io.listen(300)
    })
    val bad = new LiveFeedClient(Seq("E1"), cfg(server2.port)
      .copy(sslContext = Some(TlsLoopback.clientContext(otherKs, otherPass))))
    try {
      bad.start()
      val got = drainMessages(bad, 1, 1500)
      assert(got.isEmpty, s"untrusted certificate must not deliver: $got")
    } finally {
      bad.stop()
      server2.close()
    }
  }

  test("a fragmented BINARY message is dropped whole: its continuation " +
    "frames must not leak into text reassembly or corrupt the next text") {
    val server = new WsLoopbackServer({ (_, _, io) =>
      // binary fragments whose bytes LOOK like text — if the client
      // appends the continuation to its text buffer, the next real
      // message arrives corrupted (prefixed with `garbage}`)
      io.sendFragmentedBinary(
        "{\"bin\":".getBytes(StandardCharsets.UTF_8),
        "garbage}".getBytes(StandardCharsets.UTF_8))
      io.sendText("""{"seq":1}""")
      io.sendFragmented("""{"seq":""", """2}""")
      io.listen(1200)
    })
    val client = new LiveFeedClient(Seq("D1"), cfg(server.port))
    try {
      client.start()
      val msgs = drainMessages(client, 2, 6000)
      assert(msgs == Seq("""{"seq":1}""", """{"seq":2}"""),
        s"binary fragments must vanish and text must arrive intact: $msgs")
    } finally {
      client.stop()
      server.close()
    }
  }

  test("ws reconnect: a server-side drop reopens through a fresh " +
    "handshake and delivery resumes") {
    val server = new WsLoopbackServer({ (idx, _, io) =>
      if (idx == 0) io.sendText("""{"seq":1}""") // then return → close
      else { io.sendText("""{"seq":2}"""); io.listen(1500) }
    })
    val client = new LiveFeedClient(Seq("C1"), cfg(server.port))
    try {
      client.start()
      val msgs = drainMessages(client, 2, 8000)
      assert(msgs.contains("""{"seq":1}""") && msgs.contains("""{"seq":2}"""))
      assert(server.connectionsSeen >= 2, "no reconnection happened")
      assert(server.subscribes.size >= 2, "reconnect must re-subscribe")
    } finally {
      client.stop()
      server.close()
    }
  }
}
