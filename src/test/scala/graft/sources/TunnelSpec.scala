package graft.sources

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's own tunnel test plan (gobblin-tunnel's
  * TunnelTest / ConnectProxyServer / DoubleEchoServer /
  * TalkFirstDoubleEchoServer): an in-process CONNECT proxy in front of
  * in-process TCP servers. */
class TunnelSpec extends AnyFunSuite {

  /** Minimal CONNECT proxy: parses `CONNECT host:port`, dials the
    * target, answers 200 (or 403 when told to), relays. Counts
    * CONNECTs so tests can assert traffic went THROUGH the proxy. */
  private final class ConnectProxy(refuse: Boolean = false)
      extends AutoCloseable {
    private val srv = new ServerSocket(0, 50,
      InetAddress.getByName("127.0.0.1"))
    val connects = new java.util.concurrent.atomic.AtomicInteger()
    def port: Int = srv.getLocalPort
    private val t = new Thread(() => {
      try while (true) {
        val c = srv.accept()
        val h = new Thread(() => handle(c)); h.setDaemon(true); h.start()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()

    private def handle(c: Socket): Unit = try {
      val in = c.getInputStream
      def line(): String = {
        val b = new java.io.ByteArrayOutputStream()
        var ch = in.read()
        while (ch != -1 && ch != '\n') { if (ch != '\r') b.write(ch); ch = in.read() }
        new String(b.toByteArray, UTF_8)
      }
      val req = line()
      while (line().nonEmpty) () // drain headers
      val m = "CONNECT ([^:]+):(\\d+) .*".r.findFirstMatchIn(req).get
      connects.incrementAndGet()
      if (refuse) {
        c.getOutputStream.write("HTTP/1.1 403 Forbidden\r\n\r\n".getBytes(UTF_8))
        c.getOutputStream.flush(); c.close()
      } else {
        val target = new Socket(m.group(1), m.group(2).toInt)
        c.getOutputStream.write("HTTP/1.1 200 Connection established\r\n\r\n"
          .getBytes(UTF_8))
        c.getOutputStream.flush()
        def pump(src: java.io.InputStream, dstSock: Socket): Unit = {
          val buf = new Array[Byte](4096)
          try {
            var n = src.read(buf)
            while (n != -1) {
              dstSock.getOutputStream.write(buf, 0, n)
              dstSock.getOutputStream.flush()
              n = src.read(buf)
            }
          } catch { case _: Throwable => () }
        }
        val pump2 = new Thread(() => pump(target.getInputStream, c))
        pump2.setDaemon(true); pump2.start()
        pump(c.getInputStream, target)
      }
    } catch { case _: Throwable => () }

    override def close(): Unit = srv.close()
  }

  /** Echo server; `greeting` talks first (the MySQL-banner shape). */
  private final class Echo(greeting: Option[String] = None)
      extends AutoCloseable {
    private val srv = new ServerSocket(0, 50,
      InetAddress.getByName("127.0.0.1"))
    def port: Int = srv.getLocalPort
    private val t = new Thread(() => {
      try while (true) {
        val c = srv.accept()
        val h = new Thread(() => {
          val out = new PrintWriter(c.getOutputStream, true)
          greeting.foreach(out.println)
          val in = new BufferedReader(new InputStreamReader(c.getInputStream, UTF_8))
          var l = in.readLine()
          while (l != null) { out.println(s"echo:$l"); l = in.readLine() }
        }); h.setDaemon(true); h.start()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    override def close(): Unit = srv.close()
  }

  private def dial(port: Int): (Socket, BufferedReader, PrintWriter) = {
    val s = new Socket()
    s.connect(new InetSocketAddress("127.0.0.1", port), 5000)
    s.setSoTimeout(5000)
    (s, new BufferedReader(new InputStreamReader(s.getInputStream, UTF_8)),
      new PrintWriter(s.getOutputStream, true))
  }

  test("bytes round-trip through the proxy CONNECT; traffic goes via the proxy") {
    val echo = new Echo()
    val proxy = new ConnectProxy()
    val tun = Tunnel.through("127.0.0.1", echo.port, "127.0.0.1", proxy.port)
    try {
      val (s, in, out) = dial(tun.port)
      out.println("hello")
      assert(in.readLine() == "echo:hello")
      out.println("again")
      assert(in.readLine() == "echo:again")
      s.close()
      assert(proxy.connects.get() == 1, "must have CONNECTed via the proxy")
    } finally { tun.close(); proxy.close(); echo.close() }
  }

  test("a talk-first server's greeting arrives through the tunnel") {
    val echo = new Echo(greeting = Some("SERVER-BANNER-5.7"))
    val proxy = new ConnectProxy()
    val tun = Tunnel.through("127.0.0.1", echo.port, "127.0.0.1", proxy.port)
    try {
      val (s, in, _) = dial(tun.port)
      assert(in.readLine() == "SERVER-BANNER-5.7")
      s.close()
    } finally { tun.close(); proxy.close(); echo.close() }
  }

  test("concurrent connections each get their own relay") {
    val echo = new Echo()
    val proxy = new ConnectProxy()
    val tun = Tunnel.through("127.0.0.1", echo.port, "127.0.0.1", proxy.port)
    try {
      val conns = (1 to 4).map(_ => dial(tun.port))
      conns.zipWithIndex.foreach { case ((_, _, out), i) => out.println(s"m$i") }
      conns.zipWithIndex.foreach { case ((_, in, _), i) =>
        assert(in.readLine() == s"echo:m$i")
      }
      conns.foreach(_._1.close())
      assert(proxy.connects.get() == 4)
    } finally { tun.close(); proxy.close(); echo.close() }
  }

  test("a proxy refusing the CONNECT closes the client cleanly") {
    val echo = new Echo()
    val proxy = new ConnectProxy(refuse = true)
    val tun = Tunnel.through("127.0.0.1", echo.port, "127.0.0.1", proxy.port)
    try {
      val (s, in, _) = dial(tun.port)
      assert(in.readLine() == null, "refused CONNECT must surface as EOF")
      s.close()
    } finally { tun.close(); proxy.close(); echo.close() }
  }

  test("rewriteJdbcUrl points the driver at the tunnel and keeps the rest") {
    val echo = new Echo()
    val proxy = new ConnectProxy()
    val (url, tun) = Tunnel.rewriteJdbcUrl(
      s"jdbc:mysql://db.internal.example:${echo.port}/sales?ssl=false",
      "127.0.0.1", proxy.port)
    try {
      assert(url == s"jdbc:mysql://127.0.0.1:${tun.port}/sales?ssl=false")
      intercept[IllegalArgumentException] {
        Tunnel.rewriteJdbcUrl("jdbc:derby:memory:db", "127.0.0.1", proxy.port)
      }
    } finally { tun.close(); proxy.close(); echo.close() }
  }
}
