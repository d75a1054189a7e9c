package graft.io

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** THE ICEBERG REST CATALOG WIRE (X144) — the ecosystem's converged
  * catalog protocol (the public Iceberg REST OpenAPI), rebuilt over a
  * foreign warehouse directory with zero new dependencies. The r18
  * mount (X139) speaks the Nessie-v2 wire the reference's own
  * deployment registers; a migrating user's SECOND catalog speaks
  * this one:
  *
  *   GET  /v1/config                                   defaults+overrides
  *   GET  /v1/namespaces                               namespace list
  *   GET  /v1/namespaces/{ns}/tables                   table identifiers
  *   GET  /v1/namespaces/{ns}/tables/{t}               LoadTableResult:
  *                                                     metadata-location +
  *                                                     inline metadata
  *   HEAD /v1/namespaces/{ns}/tables/{t}               existence probe
  *   POST /v1/namespaces/{ns}/tables/{t}               CommitTableRequest:
  *                                                     requirements+updates;
  *                                                     HTTP 409 on a failed
  *                                                     requirement
  *                                                     (CommitFailedException)
  *
  * Division of labor is the protocol's own: the CATALOG owns each
  * table's current metadata pointer. The server pins a
  * metadata-location per table (initialized from the directory head at
  * first load) and answers loads FROM THE PIN — engine commits landed
  * directly on the table directory (graft's jar-free writers) are
  * STAGED: invisible through the catalog until a commit request
  * publishes them. A commit validates the spec's requirements against
  * the PINNED state (`assert-ref-snapshot-id` on a named ref,
  * `assert-table-uuid`), applies the supported update actions
  * (`add-snapshot`, `set-snapshot-ref`, `set-properties`,
  * `remove-properties`) to a copy of the pinned document, writes ONE
  * new metadata file (create-exclusive — `rest-<n>-<uuid>`-named, a
  * spelling the directory readers' version resolution ignores, so the
  * catalog's files never fight the table line's own v<N> chain) and
  * flips the pin. A stale requirement answers HTTP 409 with the
  * spec's CommitFailedException error body — the signal the standard
  * client retry loop keys on. Unknown requirement/update actions
  * refuse loudly with 400, never silently drop.
  *
  * Like the X120/X139 wires: a faithful rebuild of the protocol
  * SHAPES for the loopback testbed, not a multi-tenant server. */
final class IcebergRestHttpServer(spark: SparkSession, warehouse: String, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  @volatile private var started = false
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** table key "ns/table" → pinned metadata-location. */
  private val pins = scala.collection.concurrent.TrieMap.empty[String, Path]
  private val restSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def boundPort: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$boundPort"

  private def hconf = spark.sparkContext.hadoopConfiguration
  private def fsOf(p: Path) = p.getFileSystem(hconf)

  private def tableDir(ns: String, t: String): Path = new Path(s"$warehouse/$ns/$t")
  private def isTable(ns: String, t: String): Boolean = {
    val md = new Path(tableDir(ns, t), "metadata")
    fsOf(md).exists(md)
  }

  /** The pinned metadata-location, initializing from the directory
    * head on first load — from then on the PIN is the catalog truth. */
  private def pinOf(ns: String, t: String): Path =
    pins.getOrElseUpdate(s"$ns/$t", {
      val md = new Path(tableDir(ns, t), "metadata")
      IcebergImport.latestMetadata(fsOf(md), md)
    })

  private def readDoc(p: Path): ObjectNode = {
    val in = fsOf(p).open(p)
    try om.readTree(in).asInstanceOf[ObjectNode] finally in.close()
  }

  private def send(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  private def errorBody(code: Int, tpe: String, msg: String): String =
    s"""{"error":{"message":"${LakeHttp.jesc(msg)}","type":"$tpe","code":$code}}"""

  /** The spec's requirement vocabulary this server validates. */
  private def checkRequirements(reqs: JsonNode, doc: ObjectNode): Option[String] = {
    if (reqs == null) return None
    (0 until reqs.size).map(reqs.get).foreach { r =>
      r.get("type").asText match {
        case "assert-ref-snapshot-id" =>
          val ref = r.get("ref").asText
          val want: Option[Long] =
            if (r.hasNonNull("snapshot-id")) Some(r.get("snapshot-id").asLong) else None
          val have: Option[Long] = {
            val refs = doc.get("refs")
            if (refs != null && refs.hasNonNull(ref)) Some(refs.get(ref).get("snapshot-id").asLong)
            else if (ref == "main" && doc.hasNonNull("current-snapshot-id") &&
              doc.get("current-snapshot-id").asLong != -1L)
              Some(doc.get("current-snapshot-id").asLong)
            else None
          }
          if (want != have)
            return Some(s"Requirement failed: branch $ref ${have.fold("does not exist")(h =>
              s"has changed: expected id ${want.getOrElse("none")}, found $h")}")
        case "assert-table-uuid" =>
          val want = r.get("uuid").asText
          val have = if (doc.hasNonNull("table-uuid")) doc.get("table-uuid").asText else ""
          if (want != have)
            return Some(s"Requirement failed: table UUID does not match: expected $want, found $have")
        case "assert-create" =>
          return Some("Requirement failed: table already exists")
        case other =>
          throw new IllegalArgumentException(
            s"unsupported commit requirement '$other' — this server validates " +
              "assert-ref-snapshot-id, assert-table-uuid and assert-create")
      }
    }
    None
  }

  /** Apply the spec's update actions (supported subset) to `doc`. */
  private def applyUpdates(updates: JsonNode, doc: ObjectNode): Unit = {
    if (updates == null) return
    (0 until updates.size).map(updates.get).foreach { u =>
      u.get("action").asText match {
        case "add-snapshot" =>
          val s = u.get("snapshot")
          doc.withArray[ArrayNode]("snapshots").add(s.deepCopy[JsonNode]())
          if (s.hasNonNull("sequence-number")) {
            val seq = s.get("sequence-number").asLong
            val prev = if (doc.hasNonNull("last-sequence-number"))
              doc.get("last-sequence-number").asLong else 0L
            doc.put("last-sequence-number", math.max(prev, seq))
          }
          if (s.hasNonNull("timestamp-ms"))
            doc.put("last-updated-ms", s.get("timestamp-ms").asLong)
        case "set-snapshot-ref" =>
          val name = u.get("ref-name").asText
          val snapId = u.get("snapshot-id").asLong
          val refs =
            if (doc.hasNonNull("refs")) doc.get("refs").asInstanceOf[ObjectNode]
            else doc.putObject("refs")
          val node = refs.putObject(name)
          node.put("snapshot-id", snapId)
          node.put("type", if (u.hasNonNull("type")) u.get("type").asText else "branch")
          if (name == "main") {
            doc.put("current-snapshot-id", snapId)
            val slog = doc.withArray[ArrayNode]("snapshot-log")
            val e = slog.addObject()
            val ts = {
              val snaps = doc.get("snapshots")
              (0 until snaps.size).map(snaps.get)
                .find(_.get("snapshot-id").asLong == snapId)
                .filter(_.hasNonNull("timestamp-ms")).map(_.get("timestamp-ms").asLong)
                .getOrElse(System.currentTimeMillis())
            }
            e.put("timestamp-ms", ts); e.put("snapshot-id", snapId)
          }
        case "set-properties" =>
          val props =
            if (doc.hasNonNull("properties")) doc.get("properties").asInstanceOf[ObjectNode]
            else doc.putObject("properties")
          val upd = u.get("updates")
          upd.fieldNames().forEachRemaining(k => props.put(k, upd.get(k).asText))
        case "remove-properties" =>
          if (doc.hasNonNull("properties")) {
            val props = doc.get("properties").asInstanceOf[ObjectNode]
            val rem = u.get("removals")
            (0 until rem.size).foreach(i => props.remove(rem.get(i).asText))
          }
        case other =>
          throw new IllegalArgumentException(
            s"unsupported metadata update action '$other' — this server applies " +
              "add-snapshot, set-snapshot-ref, set-properties and remove-properties")
      }
    }
  }

  private val TablesPath = "/v1/namespaces/([^/]+)/tables(/([^/]+))?".r

  server.createContext("/v1/", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("GET", "/v1/config") =>
          send(ex, 200, s"""{"defaults":{},"overrides":{"warehouse":"${LakeHttp.jesc(warehouse)}"}}""")
        case ("GET", "/v1/namespaces") =>
          val r = new Path(warehouse)
          val f = fsOf(r)
          val nss =
            if (!f.exists(r)) Nil
            else f.listStatus(r).toSeq.filter(s => s.isDirectory &&
              !s.getPath.getName.startsWith(".") &&
              !f.exists(new Path(s.getPath, "metadata"))).map(_.getPath.getName).sorted
          send(ex, 200, nss.map(n => s"""["${LakeHttp.jesc(n)}"]""")
            .mkString("""{"namespaces":[""", ",", "]}"))
        case (method, TablesPath(ns, _, tOrNull)) =>
          (method, Option(tOrNull)) match {
            case ("POST", None) => this.synchronized {
              // CreateTableRequest — the protocol's table bootstrap: a
              // migrating engine's FIRST act on a REST catalog. The
              // request's Iceberg schema/spec/properties JSON passes
              // VERBATIM into a fresh v2 metadata document (no lossy
              // conversion); the version file is create-exclusive, so
              // a racing creator gets the spec's 409
              // AlreadyExistsException, never a clobbered table.
              val body = om.readTree(ex.getRequestBody)
              val t = body.get("name").asText
              val nsDir = new Path(s"$warehouse/$ns")
              if (!fsOf(nsDir).exists(nsDir))
                send(ex, 404, errorBody(404, "NoSuchNamespaceException", s"namespace $ns not found"))
              else if (isTable(ns, t))
                send(ex, 409, errorBody(409, "AlreadyExistsException", s"table $ns.$t already exists"))
              else {
                val dir = tableDir(ns, t)
                val f = fsOf(dir)
                val schema = body.get("schema").deepCopy[ObjectNode]()
                if (!schema.has("schema-id")) schema.put("schema-id", 0)
                def maxId(n: JsonNode): Int = {
                  var m = 0
                  if (n.isObject && n.hasNonNull("id") && n.get("id").isInt)
                    m = math.max(m, n.get("id").asInt)
                  n.elements().forEachRemaining(c => m = math.max(m, maxId(c)))
                  n.fieldNames().forEachRemaining { k =>
                    if (k != "id") m = math.max(m, maxId(n.get(k)))
                  }
                  m
                }
                val doc = om.createObjectNode()
                doc.put("format-version", 2)
                doc.put("table-uuid", java.util.UUID.randomUUID().toString)
                doc.put("location", f.makeQualified(dir).toString)
                doc.put("last-sequence-number", 0L)
                doc.put("last-updated-ms", System.currentTimeMillis())
                doc.put("last-column-id", maxId(schema))
                doc.put("current-schema-id", schema.get("schema-id").asInt)
                doc.putArray("schemas").add(schema)
                doc.put("default-spec-id", 0)
                val spec0 = doc.putArray("partition-specs").addObject()
                spec0.put("spec-id", 0)
                val specFields = spec0.putArray("fields")
                if (body.hasNonNull("partition-spec") &&
                    body.get("partition-spec").hasNonNull("fields"))
                  body.get("partition-spec").get("fields").elements()
                    .forEachRemaining(fld => { specFields.add(fld.deepCopy[JsonNode]()); () })
                doc.put("last-partition-id", 999 + specFields.size)
                doc.put("default-sort-order-id", 0)
                val so = doc.putArray("sort-orders").addObject()
                so.put("order-id", 0); so.putArray("fields")
                val props = doc.putObject("properties")
                if (body.hasNonNull("properties")) {
                  val p = body.get("properties")
                  p.fieldNames().forEachRemaining(k => props.put(k, p.get(k).asText))
                }
                doc.put("current-snapshot-id", -1L)
                doc.putArray("snapshots"); doc.putArray("snapshot-log"); doc.putArray("metadata-log")
                doc.putObject("refs")
                val metaDir = new Path(dir, "metadata")
                f.mkdirs(metaDir)
                val mdPath = new Path(metaDir, "v1.metadata.json")
                val os = f.create(mdPath, false) // create-exclusive: racing creators 409 below
                try os.write(om.writeValueAsString(doc).getBytes("UTF-8")) finally os.close()
                val hs = f.create(new Path(metaDir, "version-hint.text"), true)
                try hs.write("1".getBytes("UTF-8")) finally hs.close()
                pins.put(s"$ns/$t", mdPath)
                send(ex, 200,
                  s"""{"metadata-location":"${LakeHttp.jesc(f.makeQualified(mdPath).toString)}",""" +
                    s""""metadata":${om.writeValueAsString(doc)},"config":{}}""")
              }
            }
            case ("GET", None) =>
              val d = new Path(s"$warehouse/$ns")
              val f = fsOf(d)
              if (!f.exists(d))
                send(ex, 404, errorBody(404, "NoSuchNamespaceException", s"namespace $ns not found"))
              else {
                val ts = f.listStatus(d).toSeq
                  .filter(s => s.isDirectory && isTable(ns, s.getPath.getName))
                  .map(_.getPath.getName).sorted
                send(ex, 200, ts.map(t =>
                  s"""{"namespace":["${LakeHttp.jesc(ns)}"],"name":"${LakeHttp.jesc(t)}"}""")
                  .mkString("""{"identifiers":[""", ",", "]}"))
              }
            case ("HEAD", Some(t)) =>
              send(ex, if (isTable(ns, t)) 204 else 404, "")
            case ("GET", Some(t)) =>
              if (!isTable(ns, t))
                send(ex, 404, errorBody(404, "NoSuchTableException", s"table $ns.$t not found"))
              else {
                val pin = pinOf(ns, t)
                val doc = readDoc(pin)
                send(ex, 200,
                  s"""{"metadata-location":"${LakeHttp.jesc(fsOf(pin).makeQualified(pin).toString)}",""" +
                    s""""metadata":${om.writeValueAsString(doc)},"config":{}}""")
              }
            case ("POST", Some(t)) => this.synchronized {
              if (!isTable(ns, t))
                send(ex, 404, errorBody(404, "NoSuchTableException", s"table $ns.$t not found"))
              else {
                val body = om.readTree(ex.getRequestBody)
                val pin = pinOf(ns, t)
                val doc = readDoc(pin)
                checkRequirements(body.get("requirements"), doc) match {
                  case Some(msg) =>
                    send(ex, 409, errorBody(409, "CommitFailedException", msg))
                  case None =>
                    applyUpdates(body.get("updates"), doc)
                    val metaDir = new Path(tableDir(ns, t), "metadata")
                    val newPath = new Path(metaDir, s"rest-${restSeq.incrementAndGet()}-" +
                      s"${java.util.UUID.randomUUID().toString.take(8)}.metadata.json")
                    val f = fsOf(newPath)
                    // create-exclusive: the commit's own CAS on storage
                    val os = f.create(newPath, false)
                    try os.write(om.writeValueAsString(doc).getBytes("UTF-8")) finally os.close()
                    pins.put(s"$ns/$t", newPath)
                    send(ex, 200,
                      s"""{"metadata-location":"${LakeHttp.jesc(f.makeQualified(newPath).toString)}",""" +
                        s""""metadata":${om.writeValueAsString(doc)}}""")
                }
              }
            }
            case _ => send(ex, 404, errorBody(404, "NoSuchRouteException", s"no route $method $path"))
          }
        case _ => send(ex, 404, errorBody(404, "NoSuchRouteException", s"no route $path"))
      }
    } catch {
      // the create-exclusive CAS losing to an out-of-band racer is the
      // spec's 409, not a malformed request; and server-side IO
      // failures (e.g. writing the new metadata file mid-commit) are
      // 5xx — a 400 would tell standard REST clients "don't retry"
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        send(ex, 409, errorBody(409, "AlreadyExistsException", String.valueOf(e.getMessage)))
      case e: java.nio.file.FileAlreadyExistsException =>
        send(ex, 409, errorBody(409, "AlreadyExistsException", String.valueOf(e.getMessage)))
      case e: com.fasterxml.jackson.core.JsonProcessingException =>
        // malformed request bodies stay 400 (Jackson's parse errors
        // extend IOException — they must not read as server faults)
        send(ex, 400, errorBody(400, "BadRequestException", String.valueOf(e.getMessage)))
      case e: java.io.IOException =>
        send(ex, 500, errorBody(500, "ServiceFailureException", String.valueOf(e.getMessage)))
      case e: Exception =>
        send(ex, 400, errorBody(400, "BadRequestException", String.valueOf(e.getMessage)))
    }
  })

  def start(): IcebergRestHttpServer = { server.start(); started = true; this }
  def stop(): Unit = if (started) server.stop(0)
}

/** Client half of the REST mount (JDK HttpClient, zero dependencies).
  * Reads resolve the CATALOG-pinned metadata; [[publishHead]] turns a
  * table directory's staged head (graft's jar-free writers commit
  * directly to the table line) into ONE spec-shaped commit request —
  * the new snapshots as `add-snapshot` updates plus a
  * `set-snapshot-ref` on main, guarded by `assert-ref-snapshot-id`
  * against the pinned head, so racing publishers get the spec's 409
  * instead of a lost update. */
final class RemoteIcebergRest(baseUrl: String) {
  private val http = java.net.http.HttpClient.newHttpClient()
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def get(path: String): (Int, JsonNode) = {
    val r = http.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(baseUrl + path)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode, if (r.body.isEmpty) om.createObjectNode() else om.readTree(r.body))
  }

  def config(): JsonNode = {
    val (code, j) = get("/v1/config")
    require(code == 200, s"config -> $code")
    j
  }

  def namespaces(): Seq[String] = {
    val (code, j) = get("/v1/namespaces")
    require(code == 200, s"namespaces -> $code")
    val a = j.get("namespaces")
    (0 until a.size).map(a.get(_).get(0).asText)
  }

  def tables(ns: String): Seq[String] = {
    val (code, j) = get(s"/v1/namespaces/${enc(ns)}/tables")
    require(code == 200, s"tables($ns) -> $code")
    val a = j.get("identifiers")
    (0 until a.size).map(a.get(_).get("name").asText)
  }

  /** LoadTableResult: (metadata-location, metadata document), or None
    * when the catalog does not serve the table. */
  def loadTable(ns: String, table: String): Option[(String, JsonNode)] = {
    val (code, j) = get(s"/v1/namespaces/${enc(ns)}/tables/${enc(table)}")
    if (code == 404) None
    else {
      require(code == 200, s"loadTable($ns.$table) -> $code")
      Some((j.get("metadata-location").asText, j.get("metadata")))
    }
  }

  /** The snapshot id the catalog currently pins for the table. */
  def pinnedSnapshot(ns: String, table: String): Option[Long] =
    loadTable(ns, table).flatMap { case (_, md) =>
      if (md.hasNonNull("current-snapshot-id") && md.get("current-snapshot-id").asLong != -1L)
        Some(md.get("current-snapshot-id").asLong)
      else None
    }

  /** CreateTableRequest — bootstrap a fresh table through the catalog
    * (the protocol's table-creation face): `schemaJson` is the Iceberg
    * schema document (passes verbatim), `partitionSpecJson` optional
    * `{"fields":[...]}`. Returns the new metadata-location; throws on
    * 409 AlreadyExistsException. */
  def createTable(ns: String, name: String, schemaJson: String,
      partitionSpecJson: Option[String] = None,
      propertiesJson: Option[String] = None): String = {
    val body = s"""{"name":"${LakeHttp.jesc(name)}","schema":$schemaJson""" +
      partitionSpecJson.map(p => s""","partition-spec":$p""").getOrElse("") +
      propertiesJson.map(p => s""","properties":$p""").getOrElse("") + "}"
    val r = http.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$baseUrl/v1/namespaces/${enc(ns)}/tables"))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    val j = om.readTree(r.body)
    if (r.statusCode == 409)
      throw new IllegalStateException(
        s"createTable($ns.$name) conflict (409): ${j.get("error").get("message").asText}")
    require(r.statusCode == 200, s"createTable($ns.$name) -> ${r.statusCode}: ${r.body}")
    j.get("metadata-location").asText
  }

  /** One CommitTableRequest; returns (status, body). */
  def commit(ns: String, table: String, requirementsJson: String,
      updatesJson: String): (Int, JsonNode) = {
    val body = s"""{"requirements":[$requirementsJson],"updates":[$updatesJson]}"""
    val r = http.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$baseUrl/v1/namespaces/${enc(ns)}/tables/${enc(table)}"))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode, if (r.body.isEmpty) om.createObjectNode() else om.readTree(r.body))
  }

  /** Publish the table DIRECTORY's staged head through the catalog:
    * every snapshot on the directory's main lineage that the pinned
    * metadata lacks becomes an `add-snapshot` update, capped by a
    * `set-snapshot-ref` on main, guarded by `assert-ref-snapshot-id`
    * against the PINNED main head. Returns the new metadata-location;
    * throws with the server's CommitFailedException message on 409
    * (a concurrent publisher moved the pin — reload and retry). */
  def publishHead(spark: SparkSession, ns: String, table: String, tableDir: String): String = {
    val (_, pinnedMd) = loadTable(ns, table).getOrElse(
      throw new IllegalArgumentException(s"catalog does not serve $ns.$table"))
    val pinnedIds: Set[Long] = {
      val snaps = pinnedMd.get("snapshots")
      if (snaps == null) Set.empty
      else (0 until snaps.size).map(snaps.get(_).get("snapshot-id").asLong).toSet
    }
    val expected: Option[Long] =
      if (pinnedMd.hasNonNull("current-snapshot-id") &&
        pinnedMd.get("current-snapshot-id").asLong != -1L)
        Some(pinnedMd.get("current-snapshot-id").asLong)
      else None
    // the directory's own head document (the staged truth)
    val (_, _, dirMd) = IcebergImport.readMeta(spark, tableDir)
    val dirSnaps = dirMd.get("snapshots")
    require(dirSnaps != null && dirSnaps.size > 0, s"no snapshots on $tableDir")
    val dirHead = dirMd.get("current-snapshot-id").asLong
    val newSnaps = (0 until dirSnaps.size).map(dirSnaps.get)
      .filterNot(s => pinnedIds.contains(s.get("snapshot-id").asLong))
      .sortBy(s => if (s.hasNonNull("sequence-number")) s.get("sequence-number").asLong else 0L)
    val req = expected match {
      case Some(id) => s"""{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$id}"""
      case None => s"""{"type":"assert-ref-snapshot-id","ref":"main"}"""
    }
    val updates = (newSnaps.map(s => s"""{"action":"add-snapshot","snapshot":${om.writeValueAsString(s)}}""") :+
      s"""{"action":"set-snapshot-ref","ref-name":"main","type":"branch","snapshot-id":$dirHead}""")
      .mkString(",")
    val (code, body) = commit(ns, table, req, updates)
    if (code == 409)
      throw new IllegalStateException(
        s"REST commit conflict (409) publishing $ns.$table: " +
          body.get("error").get("message").asText)
    require(code == 200, s"commit($ns.$table) -> $code: $body")
    body.get("metadata-location").asText
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
}
