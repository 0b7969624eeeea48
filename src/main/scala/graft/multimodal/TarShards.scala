package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar-shard ingestion: large multimodal training sets
  * ship as directories of `.tar` shards whose entries are sample files
  * (`00001.jpg`, `00001.txt`, `00001.json`, …) grouped by basename. The
  * shard is the unit of parallelism — one task per tar, entries explode
  * into rows — which is exactly WebDataset's design point, so a
  * binaryFile scan + per-shard parse maps it onto Spark with no shuffle
  * at all until the caller groups samples.
  *
  * The parse is pure-JDK ustar: 512-byte header blocks (name 0..99, size
  * as octal at 124..135, typeflag at 156, ustar prefix at 345..499),
  * payload rounded up to the next block, terminated by a zero block.
  * Lenient by design — corrupt trailing garbage ends the shard rather
  * than failing the task (truncated shards are routine in crawled sets);
  * only regular-file entries ('0' or NUL typeflag) become rows.
  */
object TarShards {

  /** One tar entry: owning shard path, entry name, payload bytes. */
  final case class TarEntry(shard: String, name: String, content: Array[Byte])

  /** Parse every regular-file entry of one in-memory tar. Lenient: stops
    * at the terminating zero block, a malformed header, or a truncated
    * payload. */
  private[multimodal] def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + 512 <= bytes.length) {
      val block = java.util.Arrays.copyOfRange(bytes, off, off + 512)
      if (block.forall(_ == 0)) done = true // end-of-archive marker
      else {
        val nameEnd0 = block.indexWhere(_ == 0)
        val nameEnd = if (nameEnd0 < 0 || nameEnd0 > 100) 100 else nameEnd0
        val name = new String(block, 0, nameEnd, "US-ASCII")
        val sizeStr = new String(block, 124, 12, "US-ASCII")
          .takeWhile(c => c >= '0' && c <= '7')
        if (name.isEmpty || sizeStr.isEmpty) done = true
        else {
          val size = java.lang.Long.parseLong(sizeStr, 8)
          val typeflag = block(156)
          val dataStart = off + 512
          if (size < 0 || dataStart + size > bytes.length) done = true
          else {
            if (typeflag == '0'.toByte || typeflag == 0.toByte)
              out += name -> java.util.Arrays.copyOfRange(
                bytes, dataStart, (dataStart + size).toInt)
            // advance past the payload, rounded up to whole blocks
            off = dataStart + (((size + 511) / 512) * 512).toInt
          }
        }
      }
    }
    out.result()
  }

  /** Build one ustar shard from (name, payload) entries — the writer half
    * of WebDataset export (pack a sample group per basename, one shard
    * per output task). Plain ustar: zeroed mode/uid/gid, '0' typeflag,
    * space-padded checksum, zero-block terminator. */
  def build(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((name, data) <- entries) {
      require(name.getBytes("US-ASCII").length <= 100, s"name too long: $name")
      val h = new Array[Byte](512)
      val nb = name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, h, 0, nb.length)
      val sz = f"${data.length}%011o".getBytes("US-ASCII")
      System.arraycopy(sz, 0, h, 124, sz.length)
      h(156) = '0'
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.map(_ & 0xff).sum
      val cs = f"$sum%06o".getBytes("US-ASCII")
      System.arraycopy(cs, 0, h, 148, cs.length)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(data)
      out.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Scan a directory of `.tar` shards into (shard, name, content) rows —
    * one parse task per shard, rows explode inside the task. */
  def entries(spark: SparkSession, dir: String): Dataset[TarEntry] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parseTar(bytes).map { case (n, b) => TarEntry(path, n, b) }
      }
  }

  /** Group a shard's entries into WebDataset SAMPLES by basename (the
    * part before the first dot): (shard, sample, {extension → payload}).
    * The group key is (shard, basename), so the shuffle is within-shard
    * sample assembly — at scale, shards are sized so this stays a local
    * hash aggregate per task's worth of rows. */
  def samples(es: Dataset[TarEntry]): DataFrame = {
    es.toDF()
      .withColumn("__dot", instr(col("name"), "."))
      .withColumn("sample",
        when(col("__dot") > 0, expr("substring(name, 1, __dot - 1)"))
          .otherwise(col("name")))
      .withColumn("ext",
        when(col("__dot") > 0, expr("substring(name, __dot + 1)"))
          .otherwise(lit("")))
      .groupBy(col("shard"), col("sample"))
      .agg(map_from_entries(collect_list(struct(col("ext"), col("content"))))
        .as("parts"))
  }
}
