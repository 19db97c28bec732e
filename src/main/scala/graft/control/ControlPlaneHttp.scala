package graft.control

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The thin HTTP shim over [[ControlPlane]] — the reference's ASP.NET
  * controller surface (`Controllers/ClientController.cs:22-87`,
  * `Controllers/BrowseController.cs:18-25`) on the JDK's built-in
  * `HttpServer` (no added dependency):
  *
  *   GET    /api/client/config/get                    → 200 [DTO…]
  *   POST   /api/client/config/add        (DTO body)  → 200 | 400
  *   PATCH  /api/client/config/update     (DTO body)  → 200 | 400
  *   DELETE /api/client/config/delete/{connectionName}→ 200 | 400
  *   GET    /api/browse/startBrowseJob/{connectionId} → 200 {message,started}
  *
  * Routing, status codes and the add/update/delete → reload flow mirror
  * the controllers; the reload itself is implicit (the mutation's config-
  * file write trips the ConfigReload watcher — see [[ControlPlane]]).
  * This shim is deliberately logic-free: every behavior it exposes is
  * the service call it delegates to.
  */
final class ControlPlaneHttp(service: ControlPlane, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Bound port (useful with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def bodyOf(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def okOrBad(ex: HttpExchange, ok: Boolean): Unit =
    if (ok) respond(ex, 200, "") else respond(ex, 400, """{"error":"bad request"}""")

  server.createContext("/", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("GET", "/api/client/config/get") =>
          respond(ex, 200, service.renderDtos(service.list()))
        case ("POST", "/api/client/config/add") =>
          okOrBad(ex, service.parseDto(bodyOf(ex)).exists(service.add))
        case ("PATCH", "/api/client/config/update") =>
          okOrBad(ex, service.parseDto(bodyOf(ex)).exists(service.update))
        // getRequestURI.getPath is ALREADY percent-decoded — decoding a
        // second time with URLDecoder would additionally turn '+' into a
        // space (form-encoding semantics) and corrupt names containing
        // '+' or literal percent-escapes
        case ("DELETE", p) if p.startsWith("/api/client/config/delete/") =>
          okOrBad(ex, service.delete(p.stripPrefix("/api/client/config/delete/")))
        case ("GET", p) if p.startsWith("/api/browse/startBrowseJob/") =>
          val id = p.stripPrefix("/api/browse/startBrowseJob/")
          val started = service.startBrowseJob(id)
          val msg = if (started) "Long-running process started."
                    else "Browse already in progress."
          respond(ex, 200, s"""{"message":"$msg","started":$started}""")
        case _ =>
          respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      case e: Exception =>
        respond(ex, 500, s"""{"error":"${e.getClass.getSimpleName}"}""")
    }
  })

  def start(): ControlPlaneHttp = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
