package graft.functions

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** Bit-level contract of the Morton interleave + codegen/interpreted parity. */
class MortonCodeSpec extends SharedSparkSpec {

  test("interleave places bit i of a at 2i and bit i of b at 2i+1") {
    assert(MortonCode.interleave(0L, 0L) == 0L)
    assert(MortonCode.interleave(1L, 0L) == 1L) // a bit 0 -> bit 0
    assert(MortonCode.interleave(0L, 1L) == 2L) // b bit 0 -> bit 1
    assert(MortonCode.interleave(3L, 0L) == 5L) // 0b11 -> 0b101
    assert(MortonCode.interleave(0L, 3L) == 10L) // 0b11 -> 0b1010
    assert(MortonCode.interleave(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(MortonCode.interleave(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
    // monotone-ish locality: close points share high bits
    val m1 = MortonCode.interleave(100, 200)
    val m2 = MortonCode.interleave(101, 200)
    assert(java.lang.Long.numberOfLeadingZeros(m1 ^ m2) > 32)
  }

  test("codegen matches the Scala model over a range of pairs") {
    val df = spark.range(500).select(
      col("id").as("a"), (col("id") * 7919L % 1000L).as("b"))
    val rows = df.select(col("a"), col("b"),
      MortonCode(col("a"), col("b")).as("m")).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == MortonCode.interleave(r.getLong(0), r.getLong(1)))
    }
  }
}
