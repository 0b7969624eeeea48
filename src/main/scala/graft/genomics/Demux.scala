package graft.genomics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Barcode demultiplexing (SURVEY §2A R4): route each read pair to its
  * sample by index-read barcode with up to one mismatch; non-matching reads
  * go to the `Undetermined` pseudo-sample (`workflow.py:375-378`).
  *
  * Spark-first: instead of a per-row hamming UDF against every barcode, the
  * (tiny) samplesheet is EXPANDED to all of its ≤1-mismatch variants and the
  * demux becomes a broadcast equi-join — codegen'd hash lookup per read, no
  * shuffle of the read stream. b barcodes × (1 + 3·len) variants stays
  * trivially broadcastable (hundreds of rows). Ambiguous variants (within
  * distance 1 of two samples) are dropped from the dictionary → such reads
  * fall through to Undetermined, the conservative standard behavior.
  *
  * Scale note (SURVEY §7.4 #3): Undetermined is the classic hot key. The
  * demux itself doesn't shuffle (broadcast join), and the partitioned sink
  * splits each sample across `numTasks` writers, so the hot key costs
  * nothing extra; AQE skew handling covers any downstream groupBy(sample).
  */
object Demux {

  val Undetermined = "Undetermined"

  /** All exact + 1-mismatch variants of a barcode. */
  def variants(bc: String): Seq[String] =
    bc +: (for {
      i <- bc.indices
      b <- "ACGTN" if b != bc(i)
    } yield bc.updated(i, b))

  /** samplesheet(sample, barcode) → dictionary(barcode_variant, sample),
    * ambiguous variants removed. */
  def dictionary(spark: SparkSession, sheet: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    sheet.flatMap { case (sample, bc) => variants(bc).map(_ -> sample) }
      .toDF("bc_variant", "sample_m")
      .groupBy("bc_variant")
      .agg(collect_set(col("sample_m")).as("ss"))
      .where(size(col("ss")) === 1)
      .select(col("bc_variant"), col("ss").getItem(0).as("sample_m"))
  }

  /** Assign samples; unmatched barcodes become Undetermined. */
  def demux(reads: Dataset[PrqRead], sheet: Seq[(String, String)]): Dataset[PrqRead] = {
    val spark = reads.sparkSession
    import spark.implicits._
    val dict = dictionary(spark, sheet)
    reads.drop("sample")
      .join(broadcast(dict), col("barcode") === col("bc_variant"), "left")
      .withColumn("sample", coalesce(col("sample_m"), lit(Undetermined)))
      .drop("bc_variant", "sample_m")
      .as[PrqRead]
  }

  /** R8: drop the Undetermined pseudo-sample before alignment. */
  def dropUndetermined(reads: Dataset[PrqRead]): Dataset[PrqRead] =
    reads.filter(col("sample") =!= Undetermined)

  /** R9: sample discovery over a demuxed dataset — distinct sample names,
    * excluding `_`-prefixed and unknown/undetermined (the reference's name
    * filter, `workflow.py:398-405`). */
  def discoverSamples(reads: Dataset[PrqRead]): Seq[String] =
    reads.select("sample").distinct()
      .where(!(col("sample").startsWith("_") ||
               lower(col("sample")).contains("unknown") ||
               lower(col("sample")).contains("undetermined")))
      .as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq.sorted
}
