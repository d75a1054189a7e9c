package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** Randomized verification of [[MapSafeSetOps.exceptAll]] against a
  * driver-side reference multiset difference under order-insensitive
  * map equality. The canonicalization (key-sorted entries arrays,
  * recursive through structs/arrays/nested maps, null-preserving) is
  * subtle enough that hand-picked cases aren't a proof — every trial
  * draws a random schema (maps at random nesting positions) and random
  * rows with duplicates/nulls, and both implementations must agree on
  * the exact surviving multiset. */
class MapSafeSetOpsPropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T]): T = Iterator.continually(g.sample).flatten.next()

  // --- random schemas: 2-4 columns, at least one map-bearing type ---
  private val leafMap: Gen[DataType] = Gen.oneOf(
    MapType(StringType, IntegerType),
    MapType(IntegerType, StringType),
    MapType(StringType, LongType))
  private val mapBearing: Gen[DataType] = Gen.oneOf(
    leafMap,
    leafMap.map(m => ArrayType(m)),
    leafMap.map(m => StructType(Seq(
      StructField("a", IntegerType), StructField("m", m)))),
    leafMap.map(m => MapType(StringType, m)))
  private val plain: Gen[DataType] = Gen.oneOf(IntegerType, StringType, LongType)

  private val genSchema: Gen[StructType] = for {
    nPlain <- Gen.choose(1, 2)
    nMap <- Gen.choose(1, 2)
    plains <- Gen.listOfN(nPlain, plain)
    maps <- Gen.listOfN(nMap, mapBearing)
  } yield StructType(
    plains.zipWithIndex.map { case (t, i) => StructField(s"p$i", t) } ++
      maps.zipWithIndex.map { case (t, i) => StructField(s"m$i", t) })

  // --- random values per type (small domains force collisions) ---
  private def genValue(dt: DataType): Gen[Any] = dt match {
    case IntegerType => Gen.frequency(9 -> Gen.choose(0, 3), 1 -> Gen.const(null))
    case LongType    => Gen.frequency(9 -> Gen.choose(0L, 3L), 1 -> Gen.const(null))
    case StringType  => Gen.frequency(9 -> Gen.oneOf("x", "y", "z"), 1 -> Gen.const(null))
    case MapType(k, v, _) =>
      Gen.frequency(8 -> (for {
        n <- Gen.choose(0, 3)
        keys <- Gen.listOfN(n, genValue(k).suchThat(_ != null))
        vals <- Gen.listOfN(n, genValue(v))
      } yield keys.distinct.zip(vals).toMap), 1 -> Gen.const(null))
    case ArrayType(et, _) =>
      Gen.frequency(8 -> Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, genValue(et))),
        1 -> Gen.const(null))
    case s: StructType =>
      Gen.frequency(8 ->
        Gen.sequence[Seq[Any], Any](s.fields.map(f => genValue(f.dataType)).toSeq)
          .map(vs => Row(vs: _*)),
        1 -> Gen.const(null))
    case other => sys.error(s"no generator for $other")
  }

  private def genRow(schema: StructType): Gen[Row] =
    Gen.sequence[Seq[Any], Any](schema.fields.map(f => genValue(f.dataType)).toSeq)
      .map(vs => Row(vs: _*))

  /** Canonical comparable form of a value: maps → sorted entry lists
    * (the reference implementation of order-insensitive equality). */
  private def canon(v: Any): Any = v match {
    case null => null
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => (canon(k), canon(x)) }
        .sortBy(_._1.toString)
    case a: Array[_] => a.toList.map(canon)
    // Spark hands arrays back as mutable.ArraySeq, which is NOT the
    // 2.13 default (immutable) Seq — match the collection root
    case s: scala.collection.Seq[_] => s.toList.map(canon)
    case r: Row => canon(r.toSeq)
    case other => other
  }

  test("exceptAll agrees with a driver-side multiset difference on random nested-map data") {
    (1 to 12).foreach { _ =>
      val schema = sample(genSchema)
      val aRows = sample(Gen.listOfN(14, genRow(schema)))
      // b draws half from a (so removals actually happen) + fresh rows
      val bRows = scala.util.Random.shuffle(aRows).take(7) ++ sample(Gen.listOfN(5, genRow(schema)))
      val a = spark.createDataFrame(java.util.Arrays.asList(aRows: _*), schema)
      val b = spark.createDataFrame(java.util.Arrays.asList(bRows: _*), schema)

      val got = MapSafeSetOps.exceptAll(a, b).collect().toSeq
        .map(r => canon(r.toSeq)).groupBy(identity).view.mapValues(_.size).toMap

      // reference: multiset difference on canonical forms
      val aC = aRows.map(r => canon(r.toSeq))
      val bC = scala.collection.mutable.Map.empty[Any, Int].withDefaultValue(0)
      bRows.foreach(r => bC(canon(r.toSeq)) += 1)
      val expect = scala.collection.mutable.Map.empty[Any, Int].withDefaultValue(0)
      aC.foreach { c =>
        if (bC(c) > 0) bC(c) -= 1 else expect(c) += 1
      }
      assert(got == expect.toMap.filter(_._2 > 0),
        s"schema=${schema.simpleString}\na=${aRows.mkString("; ")}\nb=${bRows.mkString("; ")}")
      // schema must be preserved exactly
      assert(MapSafeSetOps.exceptAll(a, b).schema == a.schema)
    }
  }
}
