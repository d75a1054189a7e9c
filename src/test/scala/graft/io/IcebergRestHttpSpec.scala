package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ICEBERG REST CATALOG wire ([[IcebergRestHttpServer]] /
  * [[RemoteIcebergRest]] and the `uri=` + `type=rest-shape` mode on
  * [[graft.catalog.IcebergWarehouseCatalog]]) — the public Iceberg
  * REST OpenAPI shapes over a foreign warehouse, real loopback
  * sockets. Pins:
  *
  *  - wire basics: config, namespaces, identifiers, LoadTableResult
  *    with metadata-location + inline metadata
  *  - the CATALOG owns the pointer: direct table-directory commits are
  *    staged (invisible through loads) until a commit request
  *    publishes them
  *  - CAS CONFLICT: a commit whose `assert-ref-snapshot-id` does not
  *    match the pinned head answers HTTP 409 (CommitFailedException)
  *    and moves nothing; re-anchored it lands
  *  - unknown requirement/update actions refuse with 400, never drop
  *  - the SQL mount: 3-level names resolve the catalog pin; explicit
  *    VERSION AS OF still wins; publishHead flips visibility */
class IcebergRestHttpSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-icerest-$tag").toString

  /** One exported table under `<wh>/dw/li`; returns (wh, tableDir). */
  private def warehouse(tag: String, n: Int): (String, String) = {
    val wh = tmp(s"$tag-wh")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wh, "dw"))
    val st = new SnapshotTables(spark, tmp(s"$tag-snap"))
    st.overwriteTable((1 to n).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "li")
    IcebergExport.export(st, "li", s"$wh/dw/li")
    (wh, s"$wh/dw/li")
  }

  private def withServer[T](wh: String)(f: IcebergRestHttpServer => T): T = {
    val srv = new IcebergRestHttpServer(spark, wh).start()
    try f(srv) finally srv.stop()
  }

  test("wire basics: config, namespaces, identifiers, LoadTableResult") {
    val (wh, liDir) = warehouse("wire", 5)
    withServer(wh) { srv =>
      val r = new RemoteIcebergRest(srv.url)
      assert(r.config().get("overrides").get("warehouse").asText == wh)
      assert(r.namespaces() == Seq("dw"))
      assert(r.tables("dw") == Seq("li"))
      val (loc, md) = r.loadTable("dw", "li").get
      assert(loc.endsWith(".metadata.json"))
      assert(md.get("current-snapshot-id").asLong ==
        IcebergImport.currentSnapshot(spark, liDir).get)
      assert(r.loadTable("dw", "nope").isEmpty)
    }
  }

  test("the catalog owns the pointer: staged commits invisible until published; 409 on stale CAS") {
    val (wh, liDir) = warehouse("cas", 10)
    withServer(wh) { srv =>
      val r = new RemoteIcebergRest(srv.url)
      val pin0 = r.pinnedSnapshot("dw", "li").get
      // staged: a direct append on the table line moves the dir head
      // but NOT the catalog pin
      IcebergAppend.append(spark, liDir, Seq((99L, "staged")).toDF("id", "v"))
      assert(r.pinnedSnapshot("dw", "li").contains(pin0))
      // a commit anchored at the WRONG head answers the spec's 409 and
      // moves nothing
      val (code, body) = r.commit("dw", "li",
        s"""{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":${pin0 + 777}}""",
        s"""{"action":"set-snapshot-ref","ref-name":"main","type":"branch","snapshot-id":$pin0}""")
      assert(code == 409 && body.get("error").get("type").asText == "CommitFailedException")
      assert(r.pinnedSnapshot("dw", "li").contains(pin0))
      // re-anchored at the true pin, publishHead lands the staged chain
      r.publishHead(spark, "dw", "li", liDir)
      val head = IcebergImport.currentSnapshot(spark, liDir).get
      assert(r.pinnedSnapshot("dw", "li").contains(head))
      // racing publisher with the now-stale expected head: 409 again
      val e = intercept[IllegalStateException] {
        // force a stale requirement by re-publishing with nothing new
        // over a manually stale anchor
        val (c2, _) = r.commit("dw", "li",
          s"""{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$pin0}""",
          s"""{"action":"set-snapshot-ref","ref-name":"main","type":"branch","snapshot-id":$pin0}""")
        assert(c2 == 409)
        throw new IllegalStateException("409 as expected")
      }
      assert(e.getMessage.contains("409"))
    }
  }

  test("unknown requirement and update actions refuse with 400, never drop") {
    val (wh, _) = warehouse("ref", 3)
    withServer(wh) { srv =>
      val r = new RemoteIcebergRest(srv.url)
      val pin = r.pinnedSnapshot("dw", "li").get
      val (c1, b1) = r.commit("dw", "li",
        s"""{"type":"assert-last-assigned-field-id","last-assigned-field-id":2}""",
        s"""{"action":"set-snapshot-ref","ref-name":"main","type":"branch","snapshot-id":$pin}""")
      assert(c1 == 400 && b1.get("error").get("message").asText.contains("unsupported commit requirement"))
      val (c2, b2) = r.commit("dw", "li",
        s"""{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$pin}""",
        s"""{"action":"remove-snapshots","snapshot-ids":[1]}""")
      assert(c2 == 400 && b2.get("error").get("message").asText.contains("unsupported metadata update"))
      // neither refusal moved the pin
      assert(r.pinnedSnapshot("dw", "li").contains(pin))
    }
  }

  test("createTable bootstraps a fresh table through the wire; graft appends land and publish") {
    val wh = tmp("create-wh")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wh, "dw"))
    withServer(wh) { srv =>
      val r = new RemoteIcebergRest(srv.url)
      val schema = """{"type":"struct","schema-id":0,"fields":[
        {"id":1,"name":"id","required":false,"type":"long"},
        {"id":2,"name":"v","required":false,"type":"string"}]}""".replaceAll("\\s+", " ")
      val loc = r.createTable("dw", "fresh", schema)
      assert(loc.endsWith("v1.metadata.json"))
      assert(r.tables("dw") == Seq("fresh"))
      // duplicate creation answers the spec's 409, never clobbers
      val e = intercept[IllegalStateException] { r.createTable("dw", "fresh", schema) }
      assert(e.getMessage.contains("409"))
      // graft's jar-free append bootstraps the empty chain, the wire
      // publish pins it, and the pinned read sees the rows
      val dir = s"$wh/dw/fresh"
      IcebergAppend.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      assert(r.pinnedSnapshot("dw", "fresh").isEmpty) // staged until published
      r.publishHead(spark, "dw", "fresh", dir)
      val pin = r.pinnedSnapshot("dw", "fresh").get
      assert(IcebergImport.read(spark, dir, Some(pin)).count() == 2)
      // namespace guard
      val e2 = intercept[Exception] { r.createTable("nope", "t", schema) }
      assert(e2.getMessage.contains("404") || e2.getMessage.contains("NoSuchNamespace"))
    }
  }

  test("dropTable: catalog-pointer semantics (storage survives), purge deletes, 404 matrix") {
    val (wh, liDir) = warehouse("drop", 4)
    withServer(wh) { srv =>
      val r = new RemoteIcebergRest(srv.url)
      assert(r.tables("dw") == Seq("li"))
      // drop WITHOUT purge: the catalog stops serving it, storage stays
      assert(r.dropTable("dw", "li"))
      assert(r.tables("dw").isEmpty)
      assert(r.loadTable("dw", "li").isEmpty)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(liDir, "metadata")),
        "drop without purge must not touch storage")
      // second drop: 404 → false (idempotent from the caller's seat)
      assert(!r.dropTable("dw", "li"))
      assert(!r.dropTable("dw", "never_was"))
      // purge: storage goes too
      val schema = """{"type":"struct","schema-id":0,"fields":[
        {"id":1,"name":"id","required":false,"type":"long"}]}""".replaceAll("\\s+", " ")
      r.createTable("dw", "scrap", schema)
      assert(r.dropTable("dw", "scrap", purge = true))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(wh, "dw", "scrap")),
        "purgeRequested=true must delete the table's storage")
    }
  }

  test("renameTable: pointer move — reads and commits follow, storage untouched; 404/409 matrix") {
    val (wh, liDir) = warehouse("ren", 6)
    withServer(wh) { srv =>
      val r = new RemoteIcebergRest(srv.url)
      val pin0 = r.pinnedSnapshot("dw", "li").get
      r.renameTable("dw", "li", "dw", "li2")
      // the identifier moved; the storage did not
      assert(r.tables("dw") == Seq("li2"))
      assert(r.loadTable("dw", "li").isEmpty)
      val (loc, md) = r.loadTable("dw", "li2").get
      assert(md.get("location").asText.endsWith("/dw/li"), s"storage must stay put, got $loc")
      assert(r.pinnedSnapshot("dw", "li2").contains(pin0))
      // commits through the NEW name land in the ORIGINAL directory
      IcebergAppend.append(spark, liDir, Seq((99L, "x")).toDF("id", "v"))
      r.publishHead(spark, "dw", "li2", liDir)
      assert(r.pinnedSnapshot("dw", "li2").get != pin0)
      // 404s: missing source, missing destination namespace
      intercept[NoSuchElementException] { r.renameTable("dw", "ghost", "dw", "a") }
      intercept[NoSuchElementException] { r.renameTable("dw", "li2", "nope", "a") }
      // 409: destination exists
      val schema = """{"type":"struct","schema-id":0,"fields":[
        {"id":1,"name":"id","required":false,"type":"long"}]}""".replaceAll("\\s+", " ")
      r.createTable("dw", "other", schema)
      val e = intercept[IllegalStateException] { r.renameTable("dw", "other", "dw", "li2") }
      assert(e.getMessage.contains("409"))
      // rename of a renamed table (alias → alias) keeps following
      r.renameTable("dw", "li2", "dw", "li3")
      assert(r.tables("dw") == Seq("li3", "other"))
      assert(r.pinnedSnapshot("dw", "li3").isDefined)
    }
  }

  test("namespace CRUD: create/load/properties/drop with the 404/409 matrix") {
    val wh = tmp("nscrud-wh")
    withServer(wh) { srv =>
      val r = new RemoteIcebergRest(srv.url)
      assert(!r.namespaceExists("dwx"))
      r.createNamespace("dwx", Map("owner_team" -> "etl"))
      assert(r.namespaceExists("dwx"))
      assert(r.namespaceProperties("dwx").get == Map("owner_team" -> "etl"))
      // duplicate create: 409
      val e1 = intercept[IllegalStateException] { r.createNamespace("dwx") }
      assert(e1.getMessage.contains("409"))
      // properties update: updated/removed/missing triple
      val (up, rm, miss) = r.updateNamespaceProperties("dwx",
        updates = Map("retention" -> "30d"), removals = Seq("owner_team", "ghost"))
      assert(up == Seq("retention") && rm == Seq("owner_team") && miss == Seq("ghost"))
      assert(r.namespaceProperties("dwx").get == Map("retention" -> "30d"))
      // 404s: load/update/drop of a missing namespace
      assert(r.namespaceProperties("nope").isEmpty)
      intercept[Exception] { r.updateNamespaceProperties("nope", Map("a" -> "b")) }
      assert(!r.dropNamespace("nope"))
      // drop refuses while tables exist (409), works after they go
      val schema = """{"type":"struct","schema-id":0,"fields":[
        {"id":1,"name":"id","required":false,"type":"long"}]}""".replaceAll("\\s+", " ")
      r.createTable("dwx", "t1", schema)
      val e2 = intercept[IllegalStateException] { r.dropNamespace("dwx") }
      assert(e2.getMessage.contains("409") && e2.getMessage.contains("t1"))
      assert(r.dropTable("dwx", "t1", purge = true))
      assert(r.dropNamespace("dwx"))
      assert(!r.namespaceExists("dwx"))
    }
  }

  test("ListTables pagination: pageSize windows + next-page-token walk the namespace exactly") {
    val wh = tmp("page-wh")
    withServer(wh) { srv =>
      val r = new RemoteIcebergRest(srv.url)
      r.createNamespace("big")
      val schema = """{"type":"struct","schema-id":0,"fields":[
        {"id":1,"name":"id","required":false,"type":"long"}]}""".replaceAll("\\s+", " ")
      val names = (1 to 7).map(i => f"t$i%02d")
      names.foreach(n => r.createTable("big", n, schema))
      // one raw page: exactly pageSize identifiers + an opaque token
      val http = java.net.http.HttpClient.newHttpClient()
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val raw = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${srv.url}/v1/namespaces/big/tables?pageSize=3")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val j = om.readTree(raw.body)
      assert(j.get("identifiers").size == 3)
      assert(j.hasNonNull("next-page-token"))
      // the client's token loop reassembles the whole namespace in order
      assert(r.tables("big", pageSize = Some(3)) == names)
      assert(r.tables("big", pageSize = Some(100)) == names) // single page: no token
      assert(r.tables("big") == names)                       // unpaginated face unchanged
    }
  }

  test("SQL DDL through the rest-shape mount: namespace + create/insert/rename/drop by 3-level name") {
    val wh = tmp("sqlddl-wh")
    withServer(wh) { srv =>
      val cat = "iceddl"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.catalog.IcebergWarehouseCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.conf.set(s"spark.sql.catalog.$cat.uri", srv.url)
      spark.conf.set(s"spark.sql.catalog.$cat.type", "rest-shape")
      try {
        spark.sql(s"CREATE NAMESPACE $cat.dwx")
        spark.sql(s"CREATE TABLE $cat.dwx.ord (id BIGINT, v STRING)")
        assert(spark.sql(s"SHOW TABLES IN $cat.dwx").collect().map(_.getString(1)).toSeq
          == Seq("ord"))
        // INSERT lands STAGED on the table line; a wire publish pins it
        spark.sql(s"INSERT INTO $cat.dwx.ord VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        val r = new RemoteIcebergRest(srv.url)
        r.publishHead(spark, "dwx", "ord", s"$wh/dwx/ord")
        assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dwx.ord").head().getLong(0) == 3L)
        // rename through SQL; reads follow the pointer
        spark.sql(s"ALTER TABLE $cat.dwx.ord RENAME TO dwx.ord2")
        assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dwx.ord2").head().getLong(0) == 3L)
        assert(spark.sql(s"SHOW TABLES IN $cat.dwx").collect().map(_.getString(1)).toSeq
          == Seq("ord2"))
        // drop through SQL: gone from the catalog, old name stays gone
        spark.sql(s"DROP TABLE $cat.dwx.ord2")
        assert(spark.sql(s"SHOW TABLES IN $cat.dwx").collect().isEmpty)
        spark.sql(s"DROP NAMESPACE $cat.dwx")
        assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect().isEmpty)
      } finally Seq("", ".warehouse", ".uri", ".type").foreach(sfx =>
        spark.conf.unset(s"spark.sql.catalog.$cat$sfx"))
    }
  }

  test("SQL mount (type=rest-shape): pins govern 3-level names; VERSION AS OF wins; publish flips") {
    val (wh, liDir) = warehouse("mount", 10)
    withServer(wh) { srv =>
      val cat = "icerest"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.catalog.IcebergWarehouseCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.conf.set(s"spark.sql.catalog.$cat.uri", srv.url)
      spark.conf.set(s"spark.sql.catalog.$cat.type", "rest-shape")
      // pin the export head through the catalog, then stage poison
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dw.li").head().getLong(0) == 10L)
      IcebergAppend.append(spark, liDir, Seq((99L, "poison")).toDF("id", "v"))
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dw.li").head().getLong(0) == 10L)
      // explicit time travel to the dir head still wins over the pin
      val head = IcebergImport.currentSnapshot(spark, liDir).get
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dw.li VERSION AS OF $head")
        .head().getLong(0) == 11L)
      // a REST publish flips visibility
      new RemoteIcebergRest(srv.url).publishHead(spark, "dw", "li", liDir)
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dw.li").head().getLong(0) == 11L)
    }
    // unknown protocol selectors refuse loudly
    val e = intercept[Exception] {
      spark.conf.set("spark.sql.catalog.icebad",
        classOf[graft.catalog.IcebergWarehouseCatalog].getName)
      spark.conf.set("spark.sql.catalog.icebad.warehouse", wh)
      spark.conf.set("spark.sql.catalog.icebad.uri", "http://127.0.0.1:1")
      spark.conf.set("spark.sql.catalog.icebad.type", "hive")
      spark.sql("SELECT COUNT(*) FROM icebad.dw.li").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("rest-shape")))
  }
}
