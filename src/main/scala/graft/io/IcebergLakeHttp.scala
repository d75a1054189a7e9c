package graft.io

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path

/** THE URI MOUNT for foreign Iceberg warehouses — [[LakeHttpServer]]'s
  * Nessie-v2-shaped wire re-served over [[IcebergLakeCommits]]: the
  * reference registers its catalog by URI
  * (`/root/reference/airflow/dags/datalake_gold_spark_dag.py:181-186`
  * sets `uri=http://nessie:19120/...`), and a migrating shop's engines
  * point at a catalog URL, not a shared commit-log directory. The r17
  * foreign-warehouse log was file-CAS only; this serves it:
  *
  *   GET  /api/v2/config                        defaultBranch + spec version
  *   GET  /api/v2/trees                         named references w/ hashes
  *   GET  /api/v2/trees/main[@hash]             one reference (hash-addressed)
  *   GET  /api/v2/trees/main[@hash]/entries     governed table dirs
  *   GET  /api/v2/trees/main[@hash]/contents/D  pinned SNAPSHOT ID of dir D
  *   POST /api/v2/trees/main/history/commit     CAS commit: expectedHash +
  *                                              PUT {key, snapshotId} ops;
  *                                              HTTP 409 on a stale hash
  *
  * Division of labor is Nessie's own: the wire carries METADATA PINS
  * (snapshot ids); engines read data straight from shared storage at
  * the pinned snapshot. Commit hashes address immutable log commits,
  * so one hash read across N tables is the both-or-neither multi-table
  * consistency [[IcebergLakeCommits.readAll]] gives in-process.
  * Content keys are table DIRS, normalized server-side to the log's
  * qualified spelling (`/wh/db/t` and `file:/wh/db/t` govern the same
  * table). [[RemoteIcebergLake]] is the matching client; the SQL face
  * is `spark.sql.catalog.<n>.uri=<this url>` on
  * [[graft.catalog.IcebergWarehouseCatalog]].
  *
  * Like [[LakeHttpServer]], this is a faithful rebuild of the protocol
  * SHAPES (refs, hash addressing, CAS commits, 409 conflict
  * semantics), not a drop-in Nessie server. */
final class IcebergLakeHttpServer(lake: IcebergLakeCommits, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  @volatile private var started = false

  def boundPort: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$boundPort"

  private def hashOf(c: Int): String = f"$c%016x"
  private def commitOf(hash: String): Int = java.lang.Long.parseLong(hash, 16).toInt

  private def refJson(c: Int): String =
    s"""{"name":"main","type":"BRANCH","hash":"${hashOf(c)}"}"""

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
              val names = lake.state(c).keys.toSeq.sorted
              val entries = names.map(n =>
                s"""{"name":{"elements":["${jesc(n)}"]},"type":"ICEBERG_TABLE"}""").mkString(",")
              send(ex, 200, s"""{"entries":[$entries]}""")
            case ("GET", p) if p.startsWith("/contents/") =>
              val dir = java.net.URLDecoder.decode(p.stripPrefix("/contents/"), "UTF-8")
              lake.pinnedSnapshotAt(c, dir) match {
                case Some(snap) => send(ex, 200,
                  s"""{"content":{"type":"ICEBERG_TABLE","id":"${jesc(dir)}",""" +
                    s""""snapshotId":$snap},"effectiveReference":${refJson(c)}}""")
                case None => send(ex, 404,
                  s"""{"message":"key '${jesc(dir)}' not found at ${hashOf(c)}"}""")
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
                  (op.get("key").asText, op.get("snapshotId").asLong)
                }
                // expectedParent threads the hash check INTO the
                // file-CAS: the synchronized block serializes HTTP
                // clients only — a direct file-CAS publisher landing
                // between the check above and the commit below must
                // surface as 409, never be silently rebased over
                try {
                  val nc = lake.publishExact(puts, Some(commitOf(expected)))
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

  def start(): IcebergLakeHttpServer = { server.start(); started = true; this }
  def stop(): Unit = if (started) server.stop(0)
}

/** Client half of the URI mount (JDK HttpClient, zero dependencies):
  * reads pin a reference hash for both-or-neither multi-table
  * consistency; publishes are CAS commits with bounded 409-rebase
  * retries — the documented Nessie client loop, carrying Iceberg
  * SNAPSHOT IDS as the pinned versions. */
final class RemoteIcebergLake(baseUrl: String) {
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

  /** The governed table dirs, at head or at a reference hash. */
  def entries(hash: Option[String] = None): Seq[String] = {
    val at = hash.map("@" + _).getOrElse("")
    val (code, j) = get(s"/api/v2/trees/main$at/entries")
    require(code == 200, s"entries -> $code")
    val es = j.get("entries")
    (0 until es.size).map(es.get(_).get("name").get("elements").get(0).asText)
  }

  /** The snapshot id pinned for `tableDir`, at head or at a hash. */
  def pinnedSnapshot(tableDir: String, hash: Option[String] = None): Option[Long] = {
    val at = hash.map("@" + _).getOrElse("")
    val enc = java.net.URLEncoder.encode(tableDir, "UTF-8")
    val (code, j) = get(s"/api/v2/trees/main$at/contents/$enc")
    if (code == 404) None
    else {
      require(code == 200, s"contents -> $code")
      Some(j.get("content").get("snapshotId").asLong)
    }
  }

  /** CAS-commit the given (tableDir, snapshotId) pins; on 409 re-reads
    * the head hash and retries (bounded) — both racers' updates land
    * in adjacent commits. Returns the new head hash. */
  def commit(puts: Seq[(String, Long)], maxRetries: Int = 10): String = {
    var attempt = 0
    while (true) {
      val (_, expected) = mainRef()
      val ops = puts.map { case (d, s) =>
        s"""{"op":"PUT","key":"${LakeHttp.jesc(d)}","snapshotId":$s}""" }.mkString(",")
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

  /** Publish each table at its CURRENT head snapshot — the wire twin
    * of [[IcebergLakeCommits.publish]]. */
  def publish(spark: org.apache.spark.sql.SparkSession, tableDirs: Seq[String]): String =
    commit(tableDirs.map { d =>
      d -> IcebergImport.currentSnapshot(spark, d).getOrElse(
        throw new IllegalArgumentException(s"table $d has no committed snapshot to publish"))
    })
}
