package graft

import org.apache.spark.sql.functions._

/** r20 optimization guards: the write-once relation caches
  * (SnapshotTables segment/manifest dirs, Corpus fixtures, Iceberg
  * footer classes) must never serve a stale relation when a path is
  * deleted and re-created with different content — the (modTime,len)
  * stamp is the load-bearing part of the design. */
class RelationCacheSpec extends SparkSpec {

  test("snapshot relation cache never serves a dropped-and-recreated table's old data") {
    val root = java.nio.file.Files.createTempDirectory("relcache-snap").toString
    val st = new graft.io.SnapshotTables(spark, root)
    import spark.implicits._
    st.overwriteTable(Seq((1, "a"), (2, "b")).toDF("k", "v"), "t")
    assert(st.read("t").count() == 2)

    // drop (deletes the version dirs) and re-create the SAME table
    // path with different content — a stale cache entry would either
    // throw FileNotFound or return the old rows
    st.dropTableDir("t")
    Thread.sleep(5) // ensure a distinct mtime even on coarse clocks
    st.overwriteTable(Seq((10, "x"), (20, "y"), (30, "z")).toDF("k", "v"), "t")
    val rows = st.read("t").orderBy("k").collect().map(r => r.getInt(0)).toSeq
    assert(rows == Seq(10, 20, 30), s"stale relation served: $rows")
  }

  test("snapshot relation cache tracks chain growth across commits") {
    val root = java.nio.file.Files.createTempDirectory("relcache-chain").toString
    val st = new graft.io.SnapshotTables(spark, root)
    import spark.implicits._
    st.overwriteTable(Seq((1, "a")).toDF("k", "v"), "c")
    assert(st.read("c").count() == 1)
    st.append(Seq((2, "b")).toDF("k", "v"), "c")
    assert(st.read("c").count() == 2) // second read must see the new segment
    st.deleteKeysMor("c", Seq(Tuple1(1)).toDF("k"))
    assert(st.read("c").count() == 1)
    // time travel still resolves the cached v1 segment
    assert(st.readVersion("c", 1).count() == 1)
  }

  test("fixture cache refreshes when the backing file is rewritten") {
    val dir = java.nio.file.Files.createTempDirectory("relcache-fix").toString
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0)).toDF("o_orderkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(graft.queries.Corpus.fixture(spark, dir, "orders").count() == 2)
    Thread.sleep(5)
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("o_orderkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(graft.queries.Corpus.fixture(spark, dir, "orders").count() == 3,
      "fixture cache served a stale relation after the file was rewritten")
  }
}
