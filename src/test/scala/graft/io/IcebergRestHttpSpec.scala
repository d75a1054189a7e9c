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
