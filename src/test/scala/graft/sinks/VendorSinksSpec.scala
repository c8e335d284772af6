package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** Vendor protocol sinks driven e2e against in-process servers (the
  * Salesforce-Bulk/ES-`_bulk` zero-egress pattern): the Event Hubs
  * server VERIFIES the SAS signature off the wire with the shared key;
  * the Couchbase server implements the bulk-upsert store so replace
  * semantics, TTL arithmetic and binary tuple docs are checked against
  * held state. */
class VendorSinksSpec extends SparkSpec {
  import spark.implicits._

  // ---- Event Hubs ----

  /** An Event Hubs-shaped endpoint: 401 unless the Authorization SAS
    * token's HMAC verifies against `sasKey` for the claimed sr/se; 400
    * on a wrong content type; else record the unwrapped Body values
    * and 201. */
  private def eventHubServer(sasKeyName: String, sasKey: String)
      : (HttpServer, mutable.Buffer[String], String) = {
    val received = mutable.Buffer.empty[String]
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/hub/messages", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        .getOrElse("")
      val ctype = Option(ex.getRequestHeaders.getFirst("Content-Type"))
        .getOrElse("")
      val parts = auth.stripPrefix("SharedAccessSignature ")
        .split('&').map(_.split("=", 2)).collect {
          case Array(k, v) => k -> v }.toMap
      val sigOk = (for {
        sr <- parts.get("sr"); sig <- parts.get("sig"); se <- parts.get("se")
        skn <- parts.get("skn")
      } yield {
        val mac = javax.crypto.Mac.getInstance("HmacSHA256")
        mac.init(new javax.crypto.spec.SecretKeySpec(
          sasKey.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
        val want = java.util.Base64.getEncoder.encodeToString(
          mac.doFinal((sr + "\n" + se).getBytes(StandardCharsets.UTF_8)))
        skn == sasKeyName &&
          java.net.URLDecoder.decode(sig, "UTF-8") == want &&
          se.toLong > System.currentTimeMillis() / 1000
      }).getOrElse(false)
      val code =
        if (!sigOk) 401
        else if (!ctype.startsWith("application/vnd.microsoft.servicebus.json")) 400
        else {
          JsonMethods.parse(body) match {
            case JArray(items) => received.synchronized {
              items.foreach { case o: JObject =>
                received += (o \ "Body").asInstanceOf[JString].s
              case other => sys.error(s"bad envelope: $other") }
            }
            case other => sys.error(s"bad batch: $other")
          }
          201
        }
      ex.sendResponseHeaders(code, -1)
      ex.close()
    })
    srv.start()
    (srv, received,
      s"http://127.0.0.1:${srv.getAddress.getPort}/hub/messages")
  }

  test("Event Hubs: signed batched publish lands every record; 201 protocol") {
    val (srv, received, url) = eventHubServer("RootManageSharedAccessKey", "s3cret-key")
    try {
      val cfg = EventHubSink.EventHubConfig("myns", "myhub",
        "RootManageSharedAccessKey", "s3cret-key",
        maxBatchBytes = 512, maxBatchRecords = 7,
        endpointOverride = Some(url))
      val df = spark.range(0, 41).selectExpr("id", "concat('u', id) AS user")
        .coalesce(2)
      EventHubSink.postRows(df, cfg)
      val ids = received.synchronized {
        received.map(r => (JsonMethods.parse(r) \ "id") match {
          case JInt(i) => i.toLong
          case JLong(l) => l
          case other => sys.error(s"bad body: $other")
        }).sorted
      }
      assert(ids == (0L until 41L), s"got ${ids.size} records")
    } finally srv.stop(0)
  }

  test("Event Hubs: a wrong shared key is rejected by the service, loudly") {
    val (srv, received, url) = eventHubServer("kn", "the-real-key")
    try {
      val cfg = EventHubSink.EventHubConfig("ns", "hub", "kn", "WRONG-key",
        endpointOverride = Some(url), maxAttempts = 2)
      val e = intercept[Exception] {
        EventHubSink.postRows(spark.range(0, 3).coalesce(1).toDF("id"), cfg)
      }
      // the per-batch 401 surfaces through the async failure-ratio gate
      def msgs(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => String.valueOf(x.getMessage)).toSeq
      assert(msgs(e).exists(m => m.contains("401") ||
        m.contains("failure ratio")), msgs(e).toString)
      // and the service accepted NOTHING
      received.synchronized(assert(received.isEmpty))
    } finally srv.stop(0)
  }

  test("Event Hubs: batches respect the byte cap; oversized record refused") {
    val env = (1 to 10).map(i => EventHubSink.envelope(s"""{"v":$i}"""))
    val packed = EventHubSink.packBatches(env, maxBytes = 60)
    assert(packed.size > 1, "cap must split")
    packed.foreach(b => assert(b.length <= 60, s"${b.length}: $b"))
    // round-trips as JSON and preserves order
    val all = packed.flatMap(b => JsonMethods.parse(b) match {
      case JArray(items) => items.map(o => (o \ "Body").asInstanceOf[JString].s)
      case other => sys.error(s"$other")
    })
    assert(all == (1 to 10).map(i => s"""{"v":$i}"""))
    val e = intercept[IllegalArgumentException] {
      EventHubSink.packBatches(Seq(EventHubSink.envelope("x" * 100)), 60)
    }
    assert(e.getMessage.contains("batch cap"))
    // escaping: quotes/newlines/control chars survive the envelope
    val tricky = "a\"b\\c\nd\te"
    val rt = JsonMethods.parse(EventHubSink.envelope(tricky)) \ "Body"
    assert(rt == JString(tricky))
    // the cap is on WIRE (UTF-8) bytes: "漢" is 1 UTF-16 code unit
    // but 3 encoded bytes, so char-count packing ships ~3x-over batches
    val wide = (1 to 10).map(_ => EventHubSink.envelope("漢" * 8))
    val widePacked = EventHubSink.packBatches(wide, maxBytes = 80)
    assert(widePacked.size > 1)
    widePacked.foreach { b =>
      assert(b.getBytes(java.nio.charset.StandardCharsets.UTF_8).length <= 80,
        s"batch exceeds the byte cap on the wire: $b")
    }
  }

  // ---- Couchbase ----

  /** A Couchbase-shaped bulk-upsert endpoint over a KV map:
    * id → (content | contentB64+flags, expiry). */
  private def couchbaseServer()
      : (HttpServer, mutable.Map[String, (String, Option[Int], Int)], String) = {
    val store = mutable.Map.empty[String, (String, Option[Int], Int)]
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/pools/default/buckets/graft/docs", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      JsonMethods.parse(body) match {
        case JArray(items) => store.synchronized {
          items.foreach { doc =>
            val id = (doc \ "id").asInstanceOf[JString].s
            val expiry = (doc \ "expiry") match {
              case JInt(i) => i.toInt
              case JLong(l) => l.toInt
              case _ => 0
            }
            val flags = (doc \ "flags") match {
              case JInt(i) => Some(i.toInt)
              case _ => None
            }
            val content = (doc \ "content") match {
              case JString(s) => s
              case _ => (doc \ "contentB64").asInstanceOf[JString].s
            }
            store(id) = (content, flags, expiry)
          }
        }
        case other => sys.error(s"bad bulk: $other")
      }
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    srv.start()
    (srv, store, s"http://127.0.0.1:${srv.getAddress.getPort}")
  }

  test("Couchbase: JSON upserts land by id; a second upsert REPLACES") {
    val (srv, store, base) = couchbaseServer()
    try {
      val cfg = CouchbaseSink.CouchbaseConfig(base, "graft")
      val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      CouchbaseSink.upsert(CouchbaseSink.jsonDocs(v1, "k", cfg), cfg)
      val v2 = Seq((2L, "B2"), (3L, "c")).toDF("k", "v")
      CouchbaseSink.upsert(CouchbaseSink.jsonDocs(v2, "k", cfg), cfg)
      store.synchronized {
        assert(store.keySet == Set("1", "2", "3"))
        assert((JsonMethods.parse(store("2")._1) \ "v") == JString("B2"),
          "upsert must replace")
        assert(store.values.forall(_._3 == 0), "ttl=0 → no expiry")
      }
    } finally srv.stop(0)
  }

  test("Couchbase: TTL-origin expiry = origin seconds + span; 2038 overflow raises") {
    val (srv, store, base) = couchbaseServer()
    try {
      val cfg = CouchbaseSink.CouchbaseConfig(base, "graft",
        ttl = 1, ttlUnits = java.util.concurrent.TimeUnit.HOURS,
        ttlOriginCol = Some("created_ms"))
      val df = Seq((7L, 1700000000000L)).toDF("k", "created_ms")
      CouchbaseSink.upsert(CouchbaseSink.jsonDocs(df, "k", cfg), cfg)
      store.synchronized {
        assert(store("7")._3 == 1700000000 + 3600, store("7").toString)
      }
      val over = Seq((8L, Long.MaxValue / 2)).toDF("k", "created_ms")
      val e = intercept[Exception] {
        CouchbaseSink.upsert(CouchbaseSink.jsonDocs(over, "k", cfg), cfg)
      }
      def msgs(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => String.valueOf(x.getMessage)).toSeq
      assert(msgs(e).exists(_.contains("2038")), msgs(e).toString)
    } finally srv.stop(0)
  }

  test("Couchbase: binary tuple documents round-trip bytes + flags") {
    val (srv, store, base) = couchbaseServer()
    try {
      val cfg = CouchbaseSink.CouchbaseConfig(base, "graft")
      val df = Seq(("doc-1", Array[Byte](1, 2, -3, 127), 42))
        .toDF("id0", "bytes", "fl")
      CouchbaseSink.upsert(
        CouchbaseSink.tupleDocs(df, "id0", "bytes", "fl", cfg), cfg)
      store.synchronized {
        val (b64, flags, _) = store("doc-1")
        assert(java.util.Base64.getDecoder.decode(b64).toSeq ==
          Seq[Byte](1, 2, -3, 127))
        assert(flags.contains(42))
      }
    } finally srv.stop(0)
  }
}
