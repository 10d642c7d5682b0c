package graft.cli

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Health endpoint (reference: api.py:7-13 — `GET /healthz` →
  * {status, version}). Control-plane only; served off the JDK's built-in
  * HTTP server so the engine has zero web-framework dependencies.
  * `runMain graft.cli.Health [port]` (0 = ephemeral; port printed). */
object Health {
  val Version = "0.1.0"

  def body: String = s"""{"status": "ok", "version": "$Version"}"""

  /** Start the server; returns it (caller stops). */
  def start(port: Int): HttpServer = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/healthz", (exchange: HttpExchange) => {
      val (code, payload) =
        if (exchange.getRequestMethod == "GET") (200, body)
        else (405, """{"error": "method not allowed"}""")
      val bytes = payload.getBytes("UTF-8")
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(code, bytes.length)
      val os = exchange.getResponseBody
      os.write(bytes)
      os.close()
    })
    server.start()
    server
  }

  def main(args: Array[String]): Unit = {
    val server = start(args.headOption.map(_.toInt).getOrElse(8080))
    println(s"healthz listening on ${server.getAddress}")
    Thread.currentThread().join()
  }
}
