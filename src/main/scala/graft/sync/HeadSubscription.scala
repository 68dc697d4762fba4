package graft.sync

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.util.concurrent.{CompletionStage, CountDownLatch, TimeUnit}

import graft.model.BlockHeader

/** Push-based new-head delivery — the production transport the reference
  * never had: its block tracker POLLS (ref `tracker.go:566-577` consumes
  * `blocktracker.Subscribe`, which is itself a poller), so the polling form
  * here is exact parity and the WebSocket form is the parity-plus path a
  * deployment against a real node asks for first.
  *
  * Both transports hide behind this one trait: the consumer (a tail loop
  * feeding [[Syncer]], a test harness) receives `BlockHeader`s through the
  * same callback and never learns which wire delivered them. Reorg safety
  * does NOT live here — heads are hints; the consumer re-validates parent
  * linkage and reconciles exactly as it does for polled heads (ref
  * `tracker.go:763-784`: the tail filter treats every head event the same
  * way regardless of origin).
  */
trait HeadSubscription extends AutoCloseable {
  /** Block until the subscription is active (the server acknowledged
    * `eth_subscribe` / the first poll is scheduled) or the timeout passes.
    * @return true when active
    */
  def awaitActive(timeoutMs: Long): Boolean
}

object HeadSubscription {
  /** Transport selection by endpoint scheme: `ws://`/`wss://` → WebSocket
    * push; anything else → the polling fallback over the given provider
    * (the reference-parity path).
    */
  def open(
      endpoint: String,
      provider: => Provider,
      onHead: BlockHeader => Unit,
      pollIntervalMs: Long = 1000L
  ): HeadSubscription =
    if (endpoint.startsWith("ws://") || endpoint.startsWith("wss://"))
      new WsHeadSubscription(endpoint, onHead)
    else new PollingHeadSubscription(provider, onHead, pollIntervalMs)
}

/** `eth_subscribe("newHeads")` over a real WebSocket (JDK
  * `java.net.http.WebSocket` — no extra dependency, loopback-testable like
  * [[HttpRpcProvider]]). Text frames are accumulated until `last` (the
  * JSON-RPC message is the unit, not the frame), then dispatched:
  *  - the subscribe acknowledgement (`id` == 1) records the subscription id
  *    and releases [[awaitActive]];
  *  - `eth_subscription` notifications parse the header object exactly like
  *    [[HttpRpcProvider]]'s block decode and invoke the callback;
  *  - anything else is ignored (future-proofing, not an error).
  * A callback failure is contained per-message: one bad head must not kill
  * the transport for all subsequent heads.
  */
final class WsHeadSubscription(
    endpoint: String,
    onHead: BlockHeader => Unit,
    timeoutMs: Long = 10000L
) extends HeadSubscription {
  import HttpJson.mapper

  private val active = new CountDownLatch(1)
  @volatile private var subscriptionId: String = ""
  @volatile private var failure: Option[Throwable] = None

  private def parseHex(s: String): Long =
    java.lang.Long.parseUnsignedLong(s.stripPrefix("0x"), 16)

  private def handleMessage(text: String): Unit = {
    val node = mapper.readTree(text)
    if (node.path("method").asText("") == "eth_subscription") {
      val h = node.path("params").path("result")
      val header = BlockHeader(
        parseHex(h.path("number").asText("0x0")),
        h.path("hash").asText(),
        h.path("parentHash").asText(), {
          val d = h.path("difficulty").asText("")
          if (d.isEmpty) BigInt(0) else BigInt(d.stripPrefix("0x"), 16)
        })
      try onHead(header)
      catch { case scala.util.control.NonFatal(_) => () }
    } else if (node.path("id").asLong(-1L) == 1L) {
      val err = node.path("error")
      if (!err.isMissingNode && !err.isNull)
        failure = Some(new HttpJson.RpcError(err.path("code").asInt(0),
          err.path("message").asText("")))
      else subscriptionId = node.path("result").asText("")
      active.countDown()
    }
  }

  private val listener = new WebSocket.Listener {
    private val buf = new java.lang.StringBuilder
    override def onText(ws: WebSocket, data: CharSequence,
        last: Boolean): CompletionStage[_] = {
      buf.append(data)
      if (last) {
        val msg = buf.toString
        buf.setLength(0)
        try handleMessage(msg)
        catch { case scala.util.control.NonFatal(_) => () }
      }
      ws.request(1)
      null
    }
    override def onError(ws: WebSocket, error: Throwable): Unit = {
      failure = Some(error)
      active.countDown()
    }
  }

  private val ws: WebSocket = HttpClient.newHttpClient()
    .newWebSocketBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .buildAsync(URI.create(endpoint), listener)
    .get(timeoutMs, TimeUnit.MILLISECONDS)

  ws.sendText(
    """{"jsonrpc":"2.0","id":1,"method":"eth_subscribe","params":["newHeads"]}""",
    true)

  override def awaitActive(timeoutMs: Long): Boolean = {
    val ok = active.await(timeoutMs, TimeUnit.MILLISECONDS)
    failure.foreach(throw _)
    ok && subscriptionId.nonEmpty
  }

  override def close(): Unit = {
    try ws.sendClose(WebSocket.NORMAL_CLOSURE, "done")
      .get(1000L, TimeUnit.MILLISECONDS)
    catch { case scala.util.control.NonFatal(_) => () }
    ws.abort()
  }
}

/** The polling fallback — observable behavior of the reference's block
  * tracker (poll the head, dedup by hash, deliver): one daemon thread,
  * [[Provider.latestBlock]] per tick, a head delivered at most once. A
  * provider fault on one tick is swallowed (the next tick retries) — the
  * reference's tracker keeps polling through transient node errors too.
  */
final class PollingHeadSubscription(
    provider: Provider,
    onHead: BlockHeader => Unit,
    intervalMs: Long = 1000L
) extends HeadSubscription {

  @volatile private var running = true
  private val started = new CountDownLatch(1)
  @volatile private var lastHash: String = ""

  private val thread = new Thread(() => {
    started.countDown()
    while (running) {
      try {
        val h = provider.latestBlock()
        if (h.hash != lastHash) {
          lastHash = h.hash
          onHead(h)
        }
      } catch { case scala.util.control.NonFatal(_) => () }
      try Thread.sleep(intervalMs)
      catch { case _: InterruptedException => running = false }
    }
  }, "graft-head-poll")
  thread.setDaemon(true)
  thread.start()

  override def awaitActive(timeoutMs: Long): Boolean =
    started.await(timeoutMs, TimeUnit.MILLISECONDS)

  override def close(): Unit = {
    running = false
    thread.interrupt()
  }
}
