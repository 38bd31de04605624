package graft.metrics

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** OTLP/HTTP JSON export of the [[Tracing]] span tree — the wire half
  * of the reference's tracing story (/root/reference/TRACING.md:1-40:
  * spans export to Jaeger/OpenObserve over OTLP HTTP on port 4318,
  * auto-initialized when `OTEL_EXPORTER_OTLP_ENDPOINT` is set, service
  * identity from `OTEL_SERVICE_NAME`/`OTEL_SERVICE_VERSION`).
  *
  * The encoder follows the public OTLP JSON mapping
  * (opentelemetry-proto's `ExportTraceServiceRequest` under proto3 JSON
  * rules): `resourceSpans → scopeSpans → spans`, trace ids as 32-char
  * lowercase hex (16 bytes), span ids as 16-char hex (8 bytes),
  * `parentSpanId` omitted on roots, and 64-bit nanosecond timestamps as
  * STRINGS (proto3 JSON serializes fixed64 that way — a collector
  * rejects bare numbers past 2^53). Attributes ride as
  * `{"key":k,"value":{"stringValue":v}}` — [[Tracing.Span]] stores all
  * attribute values as strings, including the spark_job task metrics,
  * so the string mapping is lossless.
  *
  * No dependency is added: the JDK's `java.net.http.HttpClient` does
  * the POST. The sandbox has no collector to receive it, so the wire
  * path is proven two ways in the suite: a golden-pinned encoding of a
  * known span tree (always runs) and a loopback `HttpServer` that
  * receives a real POST (always runs, no egress); an env-gated test
  * fires at a REAL collector when `OTEL_EXPORTER_OTLP_ENDPOINT` is set,
  * the same standing pattern as `ClickHouseWireSpec`. */
object OtlpExporter {

  val EndpointEnv = "OTEL_EXPORTER_OTLP_ENDPOINT"
  val ServiceNameEnv = "OTEL_SERVICE_NAME"
  val ServiceVersionEnv = "OTEL_SERVICE_VERSION"

  /** 16-byte trace id as 32 lowercase hex chars. Manual padding, not
    * `f"%032x"` — format strings run through the default locale (the
    * AnnRecall wall_sec lesson, ADVICE r15). */
  def traceIdHex(id: Long): String = pad(java.lang.Long.toHexString(id), 32)

  /** 8-byte span id as 16 lowercase hex chars. */
  def spanIdHex(id: Long): String = pad(java.lang.Long.toHexString(id), 16)

  private def pad(hex: String, width: Int): String =
    "0" * (width - hex.length) + hex

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def kv(key: String, value: String): String =
    s"""{"key":"${esc(key)}","value":{"stringValue":"${esc(value)}"}}"""

  /** One span as OTLP JSON. `kind` 1 = SPAN_KIND_INTERNAL — the
    * reference's handler spans are internal spans too (no RPC
    * semantics on the phase spans themselves). */
  private def encodeSpan(s: Tracing.Span): String = {
    val startNs = s.startUnixMs * 1000000L
    val endNs = startNs + s.durationNs
    val parent =
      if (s.parentId == 0L) ""
      else s""""parentSpanId":"${spanIdHex(s.parentId)}","""
    val attrs = s.attrs.map { case (k, v) => kv(k, v) }.mkString(",")
    s"""{"traceId":"${traceIdHex(s.traceId)}",""" +
      s""""spanId":"${spanIdHex(s.spanId)}",""" + parent +
      s""""name":"${esc(s.name)}","kind":1,""" +
      s""""startTimeUnixNano":"$startNs","endTimeUnixNano":"$endNs",""" +
      s""""attributes":[$attrs]}"""
  }

  /** The full `ExportTraceServiceRequest` JSON document for a span
    * set. Spans sort by (traceId, start, spanId) — same reading order
    * as [[Tracing.writeJson]], and deterministic for the golden test. */
  def encode(spans: Seq[Tracing.Span], serviceName: String,
      serviceVersion: Option[String] = None): String = {
    val res = Seq(kv("service.name", serviceName)) ++
      serviceVersion.map(kv("service.version", _))
    val body = spans.sortBy(s => (s.traceId, s.startUnixMs, s.spanId))
      .map(encodeSpan).mkString(",")
    s"""{"resourceSpans":[{"resource":{"attributes":[${res.mkString(",")}]},""" +
      s""""scopeSpans":[{"scope":{"name":"graft.metrics.Tracing"},""" +
      s""""spans":[$body]}]}]}"""
  }

  /** POST a document to an OTLP/HTTP endpoint; returns the HTTP status.
    * Bounded timeouts — an unreachable collector must not wedge the
    * ingest process that exports on shutdown. */
  def post(endpoint: String, body: String,
      timeout: Duration = Duration.ofSeconds(5)): Int = {
    val client = HttpClient.newBuilder().connectTimeout(timeout).build()
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  /** The reference's env contract: export iff
    * `OTEL_EXPORTER_OTLP_ENDPOINT` is set; identity from
    * `OTEL_SERVICE_NAME` (default "graft") / `OTEL_SERVICE_VERSION`.
    * Returns the HTTP status when an export happened, None when the
    * endpoint is unset or empty. Failures return Some(-1) and log —
    * trace export must never fail the pipeline that produced the
    * trace. */
  def exportIfConfigured(spans: Seq[Tracing.Span] = Tracing.spans(),
      env: Map[String, String] = sys.env): Option[Int] =
    env.get(EndpointEnv).filter(_.nonEmpty).map { endpoint =>
      val doc = encode(spans, env.getOrElse(ServiceNameEnv, "graft"),
        env.get(ServiceVersionEnv))
      try {
        val status = post(endpoint, doc)
        System.err.println(
          s"[otlp] exported ${spans.size} spans to $endpoint: HTTP $status")
        status
      } catch {
        case e: Exception =>
          System.err.println(s"[otlp] export to $endpoint failed: $e")
          -1
      }
    }
}
