package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicReference
import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.{OtlpExporter, Tracing}

/** Pins the OTLP/HTTP exporter (VERDICT r15 #3): a golden encoding of
  * a known span tree, the id hex mapping, a REAL POST received by a
  * loopback HTTP server (no egress needed), and the env contract.
  * An env-gated test fires at a real collector when
  * `OTEL_EXPORTER_OTLP_ENDPOINT` is set — the `ClickHouseWireSpec`
  * standing pattern. */
class OtlpSpec extends AnyFunSuite {

  private def fixedSpans: Seq[Tracing.Span] = Seq(
    Tracing.Span(1L, 1L, 0L, "handle_streamer_message",
      1700000000000L, 2000000L, Seq("max_height" -> "7")),
    Tracing.Span(1L, 2L, 1L, "handle_events",
      1700000000001L, 1000000L, Nil),
    Tracing.Span(1L, 3L, 2L, "spark_job",
      1700000000001L, 500000L,
      Seq("job_id" -> "4", "tasks" -> "32")))

  test("golden OTLP JSON for a known span tree") {
    val got = OtlpExporter.encode(fixedSpans, "graft", Some("0.1.0"))
    val want =
      """{"resourceSpans":[{"resource":{"attributes":[""" +
        """{"key":"service.name","value":{"stringValue":"graft"}},""" +
        """{"key":"service.version","value":{"stringValue":"0.1.0"}}]},""" +
        """"scopeSpans":[{"scope":{"name":"graft.metrics.Tracing"},""" +
        """"spans":[""" +
        """{"traceId":"00000000000000000000000000000001",""" +
        """"spanId":"0000000000000001",""" +
        """"name":"handle_streamer_message","kind":1,""" +
        """"startTimeUnixNano":"1700000000000000000",""" +
        """"endTimeUnixNano":"1700000000002000000",""" +
        """"attributes":[{"key":"max_height","value":{"stringValue":"7"}}]},""" +
        """{"traceId":"00000000000000000000000000000001",""" +
        """"spanId":"0000000000000002","parentSpanId":"0000000000000001",""" +
        """"name":"handle_events","kind":1,""" +
        """"startTimeUnixNano":"1700000000001000000",""" +
        """"endTimeUnixNano":"1700000000002000000",""" +
        """"attributes":[]},""" +
        """{"traceId":"00000000000000000000000000000001",""" +
        """"spanId":"0000000000000003","parentSpanId":"0000000000000002",""" +
        """"name":"spark_job","kind":1,""" +
        """"startTimeUnixNano":"1700000000001000000",""" +
        """"endTimeUnixNano":"1700000000001500000",""" +
        """"attributes":[{"key":"job_id","value":{"stringValue":"4"}},""" +
        """{"key":"tasks","value":{"stringValue":"32"}}]}""" +
        """]}]}]}"""
    assert(got === want)
  }

  test("id hex mapping: 32/16 lowercase hex chars, zero-padded, " +
      "negative longs as their unsigned bytes") {
    assert(OtlpExporter.traceIdHex(255L) ===
      "000000000000000000000000000000ff")
    assert(OtlpExporter.spanIdHex(255L) === "00000000000000ff")
    assert(OtlpExporter.spanIdHex(-1L) === "ffffffffffffffff")
    assert(OtlpExporter.traceIdHex(-1L) ===
      "0000000000000000ffffffffffffffff")
  }

  test("wire POST received by a loopback collector; document is valid " +
      "JSON with the OTLP shape; env contract routes and names") {
    val received = new AtomicReference[String]()
    val ctype = new AtomicReference[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/v1/traces", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        received.set(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        ctype.set(ex.getRequestHeaders.getFirst("Content-Type"))
        ex.sendResponseHeaders(200, -1L)
        ex.close()
      }
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/v1/traces"
      val status = OtlpExporter.exportIfConfigured(fixedSpans, Map(
        OtlpExporter.EndpointEnv -> endpoint,
        OtlpExporter.ServiceNameEnv -> "near-defuse-indexer"))
      assert(status === Some(200))
      assert(ctype.get === "application/json")
      // parse with a real JSON reader (Jackson ships with Spark) and
      // walk the OTLP structure — not substring checks
      val root = new ObjectMapper().readTree(received.get)
      val rs = root.get("resourceSpans").get(0)
      val resAttrs = rs.get("resource").get("attributes")
      assert(resAttrs.get(0).get("key").asText === "service.name")
      assert(resAttrs.get(0).get("value").get("stringValue").asText ===
        "near-defuse-indexer")
      val spans = rs.get("scopeSpans").get(0).get("spans")
      assert(spans.size === 3)
      assert(spans.get(0).get("name").asText === "handle_streamer_message")
      assert(!spans.get(0).has("parentSpanId"), "root has no parentSpanId")
      assert(spans.get(2).get("parentSpanId").asText ===
        "0000000000000002")
      assert(spans.get(0).get("startTimeUnixNano").isTextual,
        "64-bit nanos must be JSON strings (proto3 mapping)")
    } finally server.stop(0)
  }

  test("unset or empty endpoint exports nothing; unreachable endpoint " +
      "returns Some(-1) instead of throwing") {
    assert(OtlpExporter.exportIfConfigured(fixedSpans, Map.empty) === None)
    assert(OtlpExporter.exportIfConfigured(fixedSpans,
      Map(OtlpExporter.EndpointEnv -> "")) === None)
    // a port nothing listens on: connection refused is swallowed
    assert(OtlpExporter.exportIfConfigured(fixedSpans,
      Map(OtlpExporter.EndpointEnv -> "http://127.0.0.1:1/v1/traces")) ===
      Some(-1))
  }

  test("env-gated: export live Tracing spans to a REAL collector") {
    assume(sys.env.get(OtlpExporter.EndpointEnv).exists(_.nonEmpty),
      "set OTEL_EXPORTER_OTLP_ENDPOINT to run the live-collector test")
    val spark = SharedSpark.spark
    Tracing.enable(spark)
    Tracing.reset()
    try Tracing.span("handle_streamer_message") {
      spark.range(100).count(): Unit
    } finally Tracing.disable()
    val status = OtlpExporter.exportIfConfigured()
    assert(status.exists(s => s >= 200 && s < 300),
      s"collector answered $status")
  }
}
