package graft.sources

import java.io.{InputStream, OutputStream}
import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP-CONNECT tunnel for proxy-only egress: data stores frequently
  * sit outside the datacenter behind a gateway HTTP proxy, and
  * protocols like JDBC have no proxy concept — so listen on localhost,
  * and for every accepted connection open the proxy, issue `CONNECT
  * remote:port HTTP/1.1`, require a `200`, then relay bytes both ways.
  * The client (a JDBC driver, an FTP data channel, anything TCP) just
  * dials the tunnel's local port instead of the remote host.
  *
  * Reference: gobblin-tunnel (Tunnel.java:68 — local listener +
  * per-connection proxy CONNECT; ProxySetupHandler.java:63 — the
  * CONNECT request shape and the `HTTP/1.1 200` / `HTTP/1.0 200`
  * acceptance set; JdbcExtractor rewrites the connection URL's
  * host:port to the tunnel's). The reference multiplexes with NIO "to
  * minimize resource usage"; here each connection costs two relay
  * threads — the tunnel is DRIVER-side control-plane plumbing whose
  * concurrency is the extractor's connection-pool size (single digits),
  * not a data-plane fan-out, so thread-per-connection buys simplicity
  * at no scale cost. Bytes a talk-first server (e.g. MySQL's greeting)
  * or an eager client sends around the handshake sit in the socket
  * buffers until the relay starts — nothing is dropped.
  *
  * A proxy refusing the CONNECT (non-200) closes the client connection
  * immediately — the driver sees a clean connection failure, not a
  * hang. */
final class Tunnel private (remoteHost: String, remotePort: Int,
                            proxyHost: String, proxyPort: Int)
    extends AutoCloseable {

  private val server = new ServerSocket(0, 50,
    InetAddress.getByName("127.0.0.1"))
  @volatile private var open = true

  /** The local port clients dial instead of `remoteHost:remotePort`. */
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    try while (open) {
      val client = server.accept()
      val t = new Thread(() => handle(client), "graft-tunnel-conn")
      t.setDaemon(true); t.start()
    } catch { case _: Throwable => () } // closed
  }, "graft-tunnel-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(client: Socket): Unit = {
    val proxy = new Socket()
    try {
      proxy.connect(new InetSocketAddress(proxyHost, proxyPort), 10000)
      val pOut = proxy.getOutputStream
      val pIn = proxy.getInputStream
      // ProxySetupHandler.java:63's request shape
      pOut.write((s"CONNECT $remoteHost:$remotePort HTTP/1.1\r\n" +
        s"User-Agent: GraftTunnel\r\nConnection: keep-alive\r\n" +
        s"Host: $remoteHost:$remotePort\r\n\r\n").getBytes(UTF_8))
      pOut.flush()
      val status = SftpWire.readAsciiLine(pIn)
      // drain the remaining response headers up to the blank line so
      // relayed bytes start clean
      while (SftpWire.readAsciiLine(pIn).nonEmpty) ()
      if (!status.startsWith("HTTP/1.1 200") &&
          !status.startsWith("HTTP/1.0 200")) {
        client.close(); proxy.close(); return
      }
      val down = new Thread(() => relay(pIn, client.getOutputStream,
        () => { client.close(); proxy.close() }), "graft-tunnel-down")
      down.setDaemon(true); down.start()
      relay(client.getInputStream, pOut,
        () => { client.close(); proxy.close() })
    } catch { case _: Throwable =>
      try client.close() catch { case _: Throwable => () }
      try proxy.close() catch { case _: Throwable => () }
    }
  }

  private def relay(in: InputStream, out: OutputStream,
                    onClose: () => Unit): Unit = {
    val buf = new Array[Byte](8192)
    try {
      var n = in.read(buf)
      while (n != -1) { out.write(buf, 0, n); out.flush(); n = in.read(buf) }
    } catch { case _: Throwable => () }
    finally onClose()
  }

  override def close(): Unit = { open = false; server.close() }
}

object Tunnel {

  /** Start a tunnel to `remoteHost:remotePort` via the HTTP proxy. */
  def through(remoteHost: String, remotePort: Int,
              proxyHost: String, proxyPort: Int): Tunnel =
    new Tunnel(remoteHost, remotePort, proxyHost, proxyPort)

  private val HostPort = "//([^/:]+):(\\d+)".r

  /** The JdbcProvider integration: extract host:port from a JDBC-style
    * URL, start a tunnel to it through the proxy, and return the URL
    * rewritten to the tunnel's localhost port (close the tunnel when
    * the extractor is done). `jdbc:mysql://db.example.com:3306/x` →
    * `(jdbc:mysql://127.0.0.1:<p>/x, tunnel)`. */
  def rewriteJdbcUrl(url: String, proxyHost: String, proxyPort: Int)
      : (String, Tunnel) = {
    val m = HostPort.findFirstMatchIn(url).getOrElse(
      throw new IllegalArgumentException(
        s"no //host:port component in URL: $url"))
    val t = through(m.group(1), m.group(2).toInt, proxyHost, proxyPort)
    (url.substring(0, m.start) + s"//127.0.0.1:${t.port}" +
      url.substring(m.end), t)
  }
}
