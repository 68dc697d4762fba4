package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import graft.model.{BlockHeader, FilterConfig}
import graft.sync.{HeadSubscription, PollingHeadSubscription, Syncer, WsHeadSubscription}

/** [[MockProvider]] whose reported head lags the full chain and advances
  * only when told — so a test can make PUSHED heads (not polling) the sole
  * signal that moves a sync tail forward.
  */
final class MockProviderView(
    spark: org.apache.spark.sql.SparkSession,
    chain: Seq[MBlock],
    initialHead: Long
) extends MockProvider(spark, chain) {
  @volatile private var head = initialHead
  def advanceTo(n: Long): Unit = head = math.max(head, n)
  override def latestBlock(): BlockHeader =
    chain.find(_.num == head).get.header
}

/** Minimal RFC 6455 WebSocket server over a raw ServerSocket — just enough
  * protocol to loopback-test [[WsHeadSubscription]] for real: HTTP upgrade
  * handshake (Sec-WebSocket-Accept = base64(SHA-1(key+GUID))), masked
  * client-frame parsing (the JDK client always masks), unmasked server text
  * frames. One client, text frames ≤ 64 KiB — a test double, not a server.
  */
final class StubWsServer(subAck: Boolean = true) {
  private val server = new java.net.ServerSocket(0, 1,
    java.net.InetAddress.getByName("127.0.0.1"))
  val endpoint = s"ws://127.0.0.1:${server.getLocalPort}/"

  val subscribed = new CountDownLatch(1)
  val received = new ConcurrentLinkedQueue[String]()
  @volatile private var out: java.io.OutputStream = _
  @volatile private var running = true

  private val thread = new Thread(() => {
    try {
      val sock = server.accept()
      val in = sock.getInputStream
      out = sock.getOutputStream
      handshake(in, out)
      while (running) readFrame(in).foreach { msg =>
        received.add(msg)
        if (msg.contains("eth_subscribe")) {
          if (subAck)
            send("""{"jsonrpc":"2.0","id":1,"result":"0xsub1"}""")
          else
            send("""{"jsonrpc":"2.0","id":1,""" +
              """"error":{"code":-32601,"message":"no pubsub"}}""")
          subscribed.countDown()
        }
      }
    } catch { case _: Throwable => () }
  }, "stub-ws-server")
  thread.setDaemon(true)
  thread.start()

  private def handshake(in: java.io.InputStream,
      os: java.io.OutputStream): Unit = {
    val req = new StringBuilder
    var prev4 = ""
    while (!prev4.endsWith("\r\n\r\n")) {
      val c = in.read()
      require(c >= 0, "eof during handshake")
      req.append(c.toChar)
      prev4 = req.takeRight(4).toString
    }
    val key = req.toString.linesIterator
      .find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(_.split(":", 2)(1).trim)
      .getOrElse(sys.error("no Sec-WebSocket-Key"))
    val accept = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes("US-ASCII")))
    os.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes("US-ASCII"))
    os.flush()
  }

  /** One masked client frame → Some(text) for text frames, None for
    * control frames (a Close gets its echo and ends the read loop).
    */
  private def readFrame(in: java.io.InputStream): Option[String] = {
    def b(): Int = { val c = in.read(); require(c >= 0, "eof"); c }
    val b0 = b(); val opcode = b0 & 0x0f
    val b1 = b(); val masked = (b1 & 0x80) != 0
    var len = (b1 & 0x7f).toLong
    if (len == 126) len = (b() << 8) | b()
    else if (len == 127) { len = 0L; (0 until 8).foreach(_ => len = (len << 8) | b()) }
    val mask = if (masked) Array.fill(4)(b().toByte) else Array.fill(4)(0.toByte)
    val payload = new Array[Byte](len.toInt)
    var i = 0
    while (i < len) {
      payload(i) = (b() ^ mask(i % 4)).toByte
      i += 1
    }
    if (opcode == 8) { running = false; None } // Close
    else if (opcode == 1) Some(new String(payload, "UTF-8"))
    else None // ping/pong/binary — ignored
  }

  /** Server→client text frame (unmasked, as the RFC requires of servers). */
  def send(text: String): Unit = synchronized {
    val payload = text.getBytes("UTF-8")
    require(payload.length < 65536, "test frames stay small")
    val header =
      if (payload.length < 126) Array[Byte](0x81.toByte, payload.length.toByte)
      else Array[Byte](0x81.toByte, 126.toByte,
        ((payload.length >> 8) & 0xff).toByte, (payload.length & 0xff).toByte)
    out.write(header); out.write(payload); out.flush()
  }

  def pushHead(b: MBlock): Unit =
    send(s"""{"jsonrpc":"2.0","method":"eth_subscription","params":{""" +
      s""""subscription":"0xsub1","result":{"number":"0x${b.num.toHexString}",""" +
      s""""hash":"${b.hash}","parentHash":"${b.parentHash}",""" +
      s""""difficulty":"0x${b.num.toHexString}"}}}""")

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: Throwable => () }
  }
}

class WsSubSpec extends SparkSpec {

  private def await[A](deadlineMs: Long = 5000L)(probe: => Option[A]): A = {
    val end = System.nanoTime() + deadlineMs * 1000000L
    while (System.nanoTime() < end) {
      probe match {
        case Some(a) => return a
        case None => Thread.sleep(10)
      }
    }
    fail(s"condition not met within ${deadlineMs}ms")
  }

  test("WebSocket eth_subscribe delivers pushed heads in order") {
    val srv = new StubWsServer()
    val got = new ConcurrentLinkedQueue[BlockHeader]()
    try {
      val sub = new WsHeadSubscription(srv.endpoint, got.add(_))
      assert(sub.awaitActive(5000L))
      assert(srv.subscribed.await(5, TimeUnit.SECONDS))
      val chain = MockChain.linear(5, _ => 1)
      chain.takeRight(3).foreach(srv.pushHead)
      await() { if (got.size == 3) Some(()) else None }
      val heads = got.toArray(Array.empty[BlockHeader])
      assert(heads.map(_.number).toSeq == Seq(2L, 3L, 4L))
      assert(heads.head.hash == "h2" && heads.head.parentHash == "h1")
      assert(heads.last.difficulty == BigInt(4))
      sub.close()
    } finally srv.stop()
  }

  test("a node without pubsub support surfaces the subscribe error") {
    val srv = new StubWsServer(subAck = false)
    try {
      val sub = new WsHeadSubscription(srv.endpoint, _ => ())
      val e = intercept[graft.sync.HttpJson.RpcError](sub.awaitActive(5000L))
      assert(e.getMessage.contains("no pubsub"))
      sub.close()
    } finally srv.stop()
  }

  test("HeadSubscription.open falls back to polling for http endpoints") {
    val chain = MockChain.linear(4, _ => 1)
    val provider = new MockProvider(spark, chain)
    val got = new ConcurrentLinkedQueue[BlockHeader]()
    val sub = HeadSubscription.open("http://example.invalid", provider,
      got.add(_), pollIntervalMs = 10L)
    try {
      assert(sub.isInstanceOf[PollingHeadSubscription])
      assert(sub.awaitActive(5000L))
      await() { if (!got.isEmpty) Some(()) else None }
      Thread.sleep(50) // several more polls — the same head must not re-emit
      assert(got.size == 1 && got.peek().hash == "h3")
    } finally sub.close()
  }

  test("push path drives the sync tail: pushed heads trigger stored logs") {
    val srv = new StubWsServer()
    val root = tmpDir("ws-tail")
    // the full chain exists server-side; the push subscription is the only
    // head signal — the provider view's latestBlock follows pushed heads,
    // exactly the poller's role in the reference's tail loop
    val chain = MockChain.linear(12, _ => 1)
    val view = new MockProviderView(spark, chain, initialHead = 7L)
    val syncer = new Syncer(spark, view, root, FilterConfig(),
      maxBlockBacklog = 3)
    syncer.sync() // backfill to the initial head (block 7)
    val pushed = new ConcurrentLinkedQueue[BlockHeader]()
    try {
      val sub = new WsHeadSubscription(srv.endpoint, pushed.add(_))
      assert(sub.awaitActive(5000L))
      // the chain advances: heads 8..11 arrive by PUSH, not by polling
      chain.slice(8, 12).foreach(srv.pushHead)
      await() { if (pushed.size == 4) Some(()) else None }
      // tail consumer: each pushed head advances the provider view and
      // runs one tail sync round (ref tracker.go:763-784 handleBlockEvnt)
      var head: BlockHeader = null
      while ({ head = pushed.poll(); head != null }) {
        view.advanceTo(head.number)
        syncer.sync()
      }
      sub.close()
      val stored = syncer.table.read.select("block_num").distinct()
        .collect().map(_.getLong(0)).sorted
      assert(stored.toSeq == (0L to 11L), s"stored ${stored.toSeq}")
    } finally { srv.stop() }
  }
}
