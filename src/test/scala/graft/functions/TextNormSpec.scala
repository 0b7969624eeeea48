package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity + hygiene for the native normalize_text expression. The golden
  * pairs were produced by DuckDB 1.0 `lower(strip_accents(nfc_normalize(x)))`
  * — the oracle the catalog's q_llm_normalize is hash-checked against — so
  * this spec pins the engine-to-engine contract char by char, including
  * the deliberate NON-foldings (ligature ﬁ, ß, ł, ø, fullwidth forms are
  * NOT accents and must survive).
  */
class TextNormSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val golden = Seq(
    "café Münster naïve ÉLAN" -> "cafe munster naive elan",
    "ﬁle łódź Ørsted"         -> "ﬁle łodz ørsted",
    "éclair"                   -> "eclair",
    "ß STRASSE"                -> "ß strasse",
    "ｆｕｌｌｗｉｄｔｈ"        -> "ｆｕｌｌｗｉｄｔｈ",
    "noaccent plain"           -> "noaccent plain",
    // NFD input (e + combining acute) must normalize identically to NFC
    "Café"               -> "cafe")

  test("normalize_text matches the DuckDB strip_accents oracle char-for-char") {
    GraftFunctions.register(spark)
    val df = spark.createDataFrame(
      golden.map { case (in, _) => org.apache.spark.sql.Row(in) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))))
    val got = df.select(call_function("normalize_text", col("s"))).collect().map(_.getString(0))
    assert(got.toSeq == golden.map(_._2))
  }

  test("normalize_text is idempotent") {
    GraftFunctions.register(spark)
    val s0 = spark; import s0.implicits._
    val once = golden.map(_._1).toDF("s")
      .select(call_function("normalize_text", col("s")).as("n"))
    val twice = once.select(call_function("normalize_text", col("n"))).collect().map(_.getString(0))
    assert(twice.toSeq == golden.map(_._2))
  }

  test("interpreted eval matches codegen") {
    // eval path exercised directly on the static helper; codegen path via
    // a DataFrame projection (local[4] runs whole-stage codegen)
    GraftFunctions.register(spark)
    val s0 = spark; import s0.implicits._
    val inputs = golden.map(_._1) ++ Seq("MIXED Case ASCII", "   spaces  ")
    val viaEval = inputs.map(s =>
      TextNorm.normalize(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    val viaCodegen = inputs.toDF("s")
      .select(call_function("normalize_text", col("s"))).collect().map(_.getString(0))
    assert(viaEval == viaCodegen.toSeq)
  }
}
