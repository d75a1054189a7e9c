package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** murmur3_x86_32 over Iceberg's single-value binary serialization —
  * the EXACT bucket-transform hash the Iceberg spec pins (Appendix B).
  * Public algorithm (Austin Appleby's MurmurHash3, public domain);
  * written from the spec, no Iceberg jar involved.
  *
  * Iceberg's bucket function is `(hash(v) & Int.MaxValue) % N` where
  * the hashed bytes are type-dependent:
  *   - int, long, date (days), time/timestamp (micros): the value
  *     widened to long, 8 bytes little-endian
  *   - string: UTF-8 bytes
  *   - binary / fixed: the bytes themselves
  *   - decimal: minimum-width big-endian two's-complement of the
  *     unscaled value
  *
  * Spark's own Murmur3Hash expression is NOT this function: it seeds
  * with 42 and hashes byte tails one-byte-per-round, so its string
  * hashes diverge from standard murmur3. This one is the standard
  * algorithm with seed 0.
  */
object IcebergMurmur3 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  /** Standard murmur3_x86_32, seed 0. */
  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    var h1 = 0
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val base = i << 2
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= C1; k1 = Integer.rotateLeft(k1, 15); k1 *= C2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks << 2
    var k1 = 0
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= C1; k1 = Integer.rotateLeft(k1, 15); k1 *= C2; h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b; h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35; h1 ^= h1 >>> 16
    h1
  }

  /** hash of a long per Iceberg: 8 bytes little-endian. Ints, dates
    * (epoch days) and timestamps (epoch micros) widen to this. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b)
  }

  def hashUtf8(s: UTF8String): Int = hashBytes(s.getBytes)

  def hashDecimal(d: org.apache.spark.sql.types.Decimal): Int =
    hashBytes(d.toJavaBigDecimal.unscaledValue.toByteArray)

  /** Iceberg bucket: positive hash mod N; null in, null out (handled
    * by the expression's null-safe wrapper). */
  def bucket(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n
}

/** `iceberg_bucket(N, col)`: Iceberg's bucket[N] partition transform as
  * a codegen'd Catalyst expression — used by the murmur3-bucketed
  * hidden layout so exported metadata can declare REAL `bucket[N]`
  * spec fields that external Iceberg readers prune by, and by the
  * importer to scope bucket-partitioned equality deletes. */
case class IcebergBucketExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "bucket count must be positive")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
         StringType | BinaryType | _: DecimalType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket supports int/long/date/timestamp/string/binary/decimal, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val h = child.dataType match {
      case IntegerType | DateType => IcebergMurmur3.hashLong(input.asInstanceOf[Int].toLong)
      case LongType | TimestampType | TimestampNTZType =>
        IcebergMurmur3.hashLong(input.asInstanceOf[Long])
      case StringType => IcebergMurmur3.hashUtf8(input.asInstanceOf[UTF8String])
      case BinaryType => IcebergMurmur3.hashBytes(input.asInstanceOf[Array[Byte]])
      case _: DecimalType => IcebergMurmur3.hashDecimal(input.asInstanceOf[Decimal])
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    IcebergMurmur3.bucket(h, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the object's static forwarders: graft.functions.IcebergMurmur3.hashLong(...)
    val m3 = "graft.functions.IcebergMurmur3"
    val hashCall = child.dataType match {
      case IntegerType | DateType => (v: String) => s"$m3.hashLong((long) $v)"
      case LongType | TimestampType | TimestampNTZType => (v: String) => s"$m3.hashLong($v)"
      case StringType => (v: String) => s"$m3.hashUtf8($v)"
      case BinaryType => (v: String) => s"$m3.hashBytes($v)"
      case _: DecimalType => (v: String) => s"$m3.hashDecimal($v)"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    defineCodeGen(ctx, ev, v => s"$m3.bucket(${hashCall(v)}, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)
}
