package graft.metrics

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

/** `/metrics` HTTP endpoint — the serving half of K5 (the reference
  * exposes its Prometheus counters over HTTP with optional basic auth,
  * indexer-common/src/metrics.rs:90-201). Uses the JDK's built-in
  * `com.sun.net.httpserver` so the library adds no dependency; a real
  * deployment can equally mount [[Metrics.renderPrometheus]] behind any
  * servlet.
  *
  * Driver-side only: the endpoint reads the driver-held counter map
  * (executor-observed metrics already flow to the driver through the
  * `observe` listener), so one instance per application is the correct
  * topology — same as the reference's one exporter per indexer process.
  */
object MetricsServer {

  final case class Handle(private val server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** Start serving; `port=0` picks a free port (tests). `auth=Some(user,
    * pass)` enforces HTTP basic auth, `None` serves unauthenticated —
    * both modes exist in the reference (metrics.rs:117-143). */
  def start(port: Int = 0, auth: Option[(String, String)] = None): Handle = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          if (!authorized(ex, auth)) {
            ex.getResponseHeaders.set("WWW-Authenticate", "Basic realm=\"metrics\"")
            ex.sendResponseHeaders(401, -1L)
          } else if (ex.getRequestMethod != "GET") {
            ex.sendResponseHeaders(405, -1L)
          } else {
            val body = Metrics.renderPrometheus().getBytes(StandardCharsets.UTF_8)
            ex.getResponseHeaders.set("Content-Type",
              "text/plain; version=0.0.4; charset=utf-8")
            ex.sendResponseHeaders(200, body.length.toLong)
            val os = ex.getResponseBody
            try os.write(body) finally os.close()
          }
        } finally ex.close()
      }
    })
    server.start()
    Handle(server)
  }

  private def authorized(ex: HttpExchange,
      auth: Option[(String, String)]): Boolean = auth.forall { case (u, p) =>
    val expect = ("Basic " + Base64.getEncoder.encodeToString(
      s"$u:$p".getBytes(StandardCharsets.UTF_8))).getBytes(StandardCharsets.UTF_8)
    Option(ex.getRequestHeaders.getFirst("Authorization")).exists { got =>
      // constant-time compare — don't leak the credential via timing
      MessageDigest.isEqual(got.getBytes(StandardCharsets.UTF_8), expect)
    }
  }
}
