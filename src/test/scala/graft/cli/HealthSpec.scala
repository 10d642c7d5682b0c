package graft.cli

import org.scalatest.funsuite.AnyFunSuite

class HealthSpec extends AnyFunSuite {
  test("GET /healthz returns status+version json; other methods 405") {
    val server = Health.start(0)
    try {
      val port = server.getAddress.getPort
      val url = java.net.URI.create(s"http://127.0.0.1:$port/healthz").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val got = scala.io.Source.fromInputStream(conn.getInputStream).mkString
      assert(got == """{"status": "ok", "version": "0.1.0"}""")
      val post = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      post.setRequestMethod("POST")
      post.setDoOutput(true)
      post.getOutputStream.write("x".getBytes)
      assert(post.getResponseCode == 405)
    } finally server.stop(0)
  }
}
