package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Engine-pinned goldens for Spark-specific hash functions (SURVEY §2B
  * hash/misc: no DuckDB analogue — these values define OUR engine's stable
  * contract; a Spark upgrade that changes them is a breaking change).
  */
class FunctionSpec extends SparkSpec {

  test("xxhash64 / murmur3 hash / crc32 golden values") {
    val s = spark
    import s.implicits._
    val row = Seq("graft").toDF("t").select(
      xxhash64(col("t")).as("xx"),
      hash(col("t")).as("mm"),
      crc32(col("t")).as("crc")).head()
    // pinned against Spark 4.1.2 (seed 42 for xxhash64/hash)
    assert(row.getLong(0) == -4815631219266125053L, s"xxhash64 drifted: ${row.getLong(0)}")
    assert(row.getInt(1) == -1930494102, s"murmur3 drifted: ${row.getInt(1)}")
    assert(row.getLong(2) == 31255620L, s"crc32 drifted: ${row.getLong(2)}")
  }

  test("md5/sha2 agree with well-known digests") {
    val s = spark
    import s.implicits._
    val row = Seq("abc").toDF("t").select(
      md5(col("t")).as("m"), sha2(col("t"), 256).as("sh")).head()
    assert(row.getString(0) == "900150983cd24fb0d6963f7d28e17f72")
    assert(row.getString(1) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }
}
