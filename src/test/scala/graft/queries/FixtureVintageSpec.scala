package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.types.{TimestampType, StringType, BinaryType, ArrayType, FloatType}

/** Guards against driver-side testdata regenerations changing fixture
  * physical encodings under us (the round-9 incident: events.ts moved
  * from INT64 TIMESTAMP(NANOS) to TIMESTAMP_MICROS/NTZ and broke every
  * events-touching query at analysis time). Each table must load
  * through `Corpus.fixture` and land on the logical schema the corpus
  * assumes — so a future refresh fails ONE named test with a named
  * cause instead of dozens of mysterious ones.
  */
class FixtureVintageSpec extends SparkSpec {

  private val tables =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")

  test("every fixture table loads through Corpus.fixture and is non-empty") {
    for (t <- tables) {
      val df = Corpus.fixture(spark, sf(), t)
      assert(df.limit(1).count() == 1, s"fixture $t is empty or unreadable")
    }
  }

  test("events.ts lands as session-TZ TimestampType regardless of parquet vintage") {
    val ev = Corpus.fixture(spark, sf(), "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType; got ${ev.schema("ts").dataType} — " +
        "the driver likely regenerated /root/testdata with a new ts encoding; " +
        "adapt Corpus.fixture's events branch")
    // ts must be comparable against timestamp literals (the exact
    // analysis failure mode of the NTZ vintage when passed through raw)
    import org.apache.spark.sql.functions._
    val n = ev.filter(col("ts") >= lit("1970-01-01").cast("timestamp")).count()
    assert(n > 0, "events.ts values should be post-epoch and literal-comparable")
  }

  test("verify-scale embeddings count matches the width the vec oracles are generated for") {
    // q40/q117/q123 size their LSH width from the LIVE corpus count
    // (Similarity.bitsFor(n, VecTargetPerBucket)) while their DuckDB
    // oracles interpolate hyperplane literals for the width at the
    // driver's verify scale (sf0.01). This pin makes a fixture-size
    // change fail HERE, by name, instead of as silent hash mismatches.
    val n = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet").count()
    assert(n == ExtensionCorpus.VecOracleRows,
      s"sf0.01 embeddings has $n rows but the vec self-join oracles are generated for " +
        s"${ExtensionCorpus.VecOracleRows} — update ExtensionCorpus.VecOracleRows (the " +
        "oracle hyperplane literals re-derive automatically)")
    assert(graft.operators.Similarity.bitsFor(n, ExtensionCorpus.VecTargetPerBucket)
      == ExtensionCorpus.vecOracleBits)
  }

  test("documents/embeddings carry the text and vector columns the corpus assumes") {
    val docs = Corpus.fixture(spark, sf(), "documents")
    assert(docs.schema("text").dataType == StringType)
    val emb = Corpus.fixture(spark, sf(), "embeddings")
    assert(emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
           emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding must be array<float>; got ${emb.schema("embedding").dataType}")
  }
}
