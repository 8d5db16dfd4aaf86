package graft.sources

import java.nio.charset.StandardCharsets

/** Shared HTTP helper for the REST-backed sources (federated, ES in-situ).
  * One copy of the open/write/read/raise-on-non-200 logic so fixes
  * (timeouts, null error streams, charsets) cannot drift between them. */
private[graft] object RestClient {

  /** POST `body` as JSON; returns the response body. Non-200 raises an
    * IOException carrying the status and (possibly empty) error body —
    * `getErrorStream` is null when the server sent no body, which must
    * surface as the status error, not an NPE. */
  def post(url: String, body: String, headers: Map[String, String]): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    val out = conn.getOutputStream
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    readResponse(conn, url)
  }

  /** GET `url`; same error contract as [[post]]. */
  def get(url: String, headers: Map[String, String]): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    readResponse(conn, url)
  }

  private def readResponse(conn: java.net.HttpURLConnection, url: String): String = {
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val resp =
      if (is == null) ""
      else try new String(is.readAllBytes(), StandardCharsets.UTF_8) finally is.close()
    if (code != 200)
      throw new java.io.IOException(s"$url returned $code: ${resp.take(400)}")
    resp
  }

  /** Escape a string for interpolation inside a JSON string literal. */
  def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
