package graft.io

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** NESSIE-SHAPED REST facade over a governed lake (the reference
  * registers a Nessie catalog —
  * `/root/reference/airflow/dags/datalake_gold_spark_dag.py:181-186` —
  * and Spark engines talk to it over REST). The sandbox has zero
  * egress and no Nessie server, so the WIRE CONTRACT itself is
  * rebuilt from Nessie's public API v2 shapes and served over
  * loopback by the JDK's HttpServer — no new dependency:
  *
  *   GET  /api/v2/config                        defaultBranch + spec version
  *   GET  /api/v2/trees                         named references w/ hashes
  *   GET  /api/v2/trees/main[@hash]             one reference (hash-addressed)
  *   GET  /api/v2/trees/main[@hash]/entries     content keys
  *   GET  /api/v2/trees/main[@hash]/contents/T  pinned table version
  *   POST /api/v2/trees/main/history/commit     CAS commit: expectedHash +
  *                                              PUT operations; HTTP 409 on
  *                                              a stale hash (client rebases)
  *
  * The catalog serves METADATA POINTERS only (a content's `version`);
  * engines read data straight from shared storage pinned at that
  * version — exactly the Nessie/Iceberg division of labor. Commit
  * hashes address immutable lake commits, so hash-addressed reads give
  * a client the same both-or-neither multi-table atomicity
  * [[LakeCommits]] gives in-process. [[RemoteLake]] is the matching
  * client (JDK HttpClient): publish with bounded 409-rebase retries,
  * reads pinned at one reference hash.
  *
  * This is a faithful rebuild of the protocol SHAPES (refs, CAS
  * commits, conflict semantics, hash addressing), not a drop-in Nessie
  * server — a real deployment still needs the Nessie service; SURVEY
  * records that as the standing migration note. */
final class LakeHttpServer(lake: LakeCommits, tables: SnapshotTables, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  @volatile private var started = false

  def boundPort: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$boundPort"

  /** Table name ↔ lake key (the lake keys by `<root>|<table>`). */
  private def keyOf(t: String) = s"${tables.rootPath}|$t"
  private def nameOf(k: String) = k.substring(k.lastIndexOf('|') + 1)

  private def hashOf(c: Int): String = f"$c%016x"
  private def commitOf(hash: String): Int = java.lang.Long.parseLong(hash, 16).toInt

  private def refJson(c: Int): String =
    s"""{"name":"main","type":"BRANCH","hash":"${hashOf(c)}"}"""

  /** JSON string-literal escape for interpolated names/messages — a
    * quote or backslash in a table key (or a null getMessage) must not
    * produce a body clients cannot parse. */
  private def jesc(s: String): String = LakeHttp.jesc(s)

  private def send(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private val TreePath = "/api/v2/trees/([^/@]+)(@([0-9a-f]+))?(/.*)?".r

  server.createContext("/api/v2/", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("GET", "/api/v2/config") =>
          send(ex, 200, """{"defaultBranch":"main","maxSupportedApiVersion":2,"specVersion":"2.0.0"}""")
        case ("GET", "/api/v2/trees") =>
          send(ex, 200, s"""{"references":[${refJson(lake.headCommit)}]}""")
        case (method, TreePath(ref, _, hashOpt, rest)) if ref == "main" =>
          val c = Option(hashOpt).map(commitOf).getOrElse(lake.headCommit)
          (method, Option(rest).getOrElse("")) match {
            case ("GET", "") =>
              send(ex, 200, refJson(c))
            case ("GET", "/entries") =>
              val names = lake.state(c).keys.map(nameOf).toSeq.sorted
              val entries = names.map(n =>
                s"""{"name":{"elements":["${jesc(n)}"]},"type":"ICEBERG_TABLE"}""").mkString(",")
              send(ex, 200, s"""{"entries":[$entries]}""")
            case ("GET", p) if p.startsWith("/contents/") =>
              val t = java.net.URLDecoder.decode(p.stripPrefix("/contents/"), "UTF-8")
              lake.state(c).get(keyOf(t)) match {
                case Some(v) => send(ex, 200,
                  s"""{"content":{"type":"ICEBERG_TABLE","id":"${jesc(t)}","version":$v},""" +
                    s""""effectiveReference":${refJson(c)}}""")
                case None => send(ex, 404, s"""{"message":"key '${jesc(t)}' not found at ${hashOf(c)}"}""")
              }
            case ("POST", "/history/commit") => this.synchronized {
              val om = new com.fasterxml.jackson.databind.ObjectMapper()
              val body = om.readTree(ex.getRequestBody)
              val expected = body.get("expectedHash").asText
              val head = lake.headCommit
              if (expected != hashOf(head))
                send(ex, 409, s"""{"message":"Named reference 'main' changed: expected """ +
                  s"""$expected, actual ${hashOf(head)}"}""")
              else {
                val ops = body.get("operations")
                val puts = (0 until ops.size).map(ops.get).map { op =>
                  require(op.get("op").asText.equalsIgnoreCase("PUT"),
                    s"only PUT operations are supported, got ${op.get("op")}")
                  (op.get("key").asText, op.get("version").asInt)
                }
                // anchored CAS (see IcebergLakeHttpServer): the hash
                // check alone cannot see a direct file-CAS publisher
                // racing in — the expected parent rides into the
                // commit's own file-CAS and a stale parent 409s
                try {
                  val nc = lake.publishExact(
                    puts.map { case (t, v) => (tables, t, v) }, Some(commitOf(expected)))
                  send(ex, 200, s"""{"targetBranch":${refJson(nc)}}""")
                } catch {
                  case LakeCommits.StaleParentCommit(_, actual) =>
                    send(ex, 409, s"""{"message":"Named reference 'main' changed: expected """ +
                      s"""$expected, actual ${hashOf(actual)}"}""")
                }
              }
            }
            case _ => send(ex, 404, s"""{"message":"no route $method $path"}""")
          }
        case _ => send(ex, 404, s"""{"message":"no route $path"}""")
      }
    } catch {
      case e: Exception => send(ex, 400, s"""{"message":"${jesc(e.getMessage)}"}""")
    }
  })

  def start(): LakeHttpServer = { server.start(); started = true; this }
  def stop(): Unit = if (started) server.stop(0)
}

/** Client half of the Nessie-shaped protocol (JDK HttpClient): reads
  * pin a reference hash for both-or-neither multi-table consistency,
  * publishes are CAS commits with bounded 409-rebase retries — the
  * documented Nessie client loop. */
final class RemoteLake(baseUrl: String) {
  private val http = java.net.http.HttpClient.newHttpClient()
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def get(path: String): (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val r = http.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(baseUrl + path)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode, om.readTree(r.body))
  }

  /** (branch name, commit hash) of main's head. */
  def mainRef(): (String, String) = {
    val (code, j) = get("/api/v2/trees/main")
    require(code == 200, s"trees/main -> $code")
    (j.get("name").asText, j.get("hash").asText)
  }

  def entries(hash: Option[String] = None): Seq[String] = {
    val at = hash.map("@" + _).getOrElse("")
    val (code, j) = get(s"/api/v2/trees/main$at/entries")
    require(code == 200, s"entries -> $code")
    val es = j.get("entries")
    (0 until es.size).map(es.get(_).get("name").get("elements").get(0).asText)
  }

  /** The version pinned for `table`, at head or at a reference hash. */
  def pinnedVersion(table: String, hash: Option[String] = None): Option[Int] = {
    val at = hash.map("@" + _).getOrElse("")
    val enc = java.net.URLEncoder.encode(table, "UTF-8")
    val (code, j) = get(s"/api/v2/trees/main$at/contents/$enc")
    if (code == 404) None
    else { require(code == 200, s"contents -> $code"); Some(j.get("content").get("version").asInt) }
  }

  /** Read `table` through the catalog: resolve the pinned version over
    * the wire, read the data from shared storage — Nessie's division
    * of labor. Pass the same `hash` across tables for both-or-neither. */
  def read(st: SnapshotTables, table: String, hash: Option[String] = None): DataFrame = {
    val v = pinnedVersion(table, hash).getOrElse(
      throw new IllegalArgumentException(s"table '$table' is not governed at $baseUrl"))
    st.readVersion(table, v)
  }

  /** CAS-commit the given (table, version) pins; on 409 re-reads the
    * head hash and retries (bounded) — both racers' updates land in
    * adjacent commits. Returns the new head hash. */
  def commit(puts: Seq[(String, Int)], maxRetries: Int = 10): String = {
    var attempt = 0
    while (true) {
      val (_, expected) = mainRef()
      val ops = puts.map { case (t, v) =>
        s"""{"op":"PUT","key":"${LakeHttp.jesc(t)}","version":$v}""" }.mkString(",")
      val body = s"""{"expectedHash":"$expected","operations":[$ops]}"""
      val r = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(baseUrl + "/api/v2/trees/main/history/commit"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (r.statusCode == 200)
        return om.readTree(r.body).get("targetBranch").get("hash").asText
      require(r.statusCode == 409, s"commit -> ${r.statusCode}: ${r.body}")
      attempt += 1
      require(attempt <= maxRetries, s"commit lost $maxRetries CAS races: ${r.body}")
    }
    sys.error("unreachable")
  }
}

object LakeHttp {
  /** Escape a string for embedding in a JSON string literal; null-safe
    * (a null exception message serializes as the literal "null"). */
  private[graft] def jesc(s: String): String = {
    val v = if (s == null) "null" else s
    val b = new StringBuilder(v.length + 8)
    v.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }
}
