package graft.sources

import java.io.{BufferedReader, InputStreamReader, ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 readers for the two genomics line formats — the
  * `TableProvider` rung of the extension-point ladder (SURVEY §1.4 D3,
  * §4.3): `spark.read.format("prq").load(dir)` and
  * `spark.read.format("fastq").load(dir)` replace the
  * `spark.read.text + mapPartitions` composition with a planned scan.
  *
  * What the V2 surface buys over the text+parse composition:
  *   - COLUMN PRUNING reaches the reader ([[SupportsPushDownRequiredColumns]]):
  *     a count or id-only projection never materializes seq/qual strings
  *     (the bulk of every record) — visible as ReadSchema in explain.
  *   - The `sample=` partition value is decoded once per FILE on the
  *     driver, not regex-extracted from `input_file_name()` per ROW.
  *   - One InputPartition per file, so gzip's unsplittability is a
  *     planning fact rather than a comment on the parser ([[Codecs
  *     .parseFastq]]'s caveat); a 1000-file sample fans out to 1000 tasks
  *     with no shuffle.
  *
  * Formats (reference `workflow.py:35`, Seal's prq; FASTQ per spec):
  *   - PRQ: one read pair per line, `id\tseq1\tqual1\tseq2\tqual2`, laid
  *     out as `dir/sample=<s>/part-*.txt[.gz]` by [[graft.genomics.Codecs
  *     .writePartitionedGzip]].
  *   - FASTQ: 4-line records `@id / seq / + / qual`, one file = one
  *     sequential stream (possibly gzip).
  *
  * Compression: any Hadoop codec by extension (CompressionCodecFactory) —
  * the same resolution the text source uses, so `.gz` round-trips.
  */
object PrqFastqSource {
  val prqSchema: StructType = StructType(Seq(
    StructField("sample", org.apache.spark.sql.types.StringType),
    StructField("id", org.apache.spark.sql.types.StringType),
    StructField("seq1", org.apache.spark.sql.types.StringType),
    StructField("qual1", org.apache.spark.sql.types.StringType),
    StructField("seq2", org.apache.spark.sql.types.StringType),
    StructField("qual2", org.apache.spark.sql.types.StringType)))

  val fastqSchema: StructType = StructType(Seq(
    StructField("file", org.apache.spark.sql.types.StringType),
    StructField("id", org.apache.spark.sql.types.StringType),
    StructField("seq", org.apache.spark.sql.types.StringType),
    StructField("qual", org.apache.spark.sql.types.StringType)))

  /** Driver-side recursive listing: every data file under `path`, with its
    * Hive-style `sample=` partition value when one appears on its path
    * (unescaped the same way the sink escaped it). Hidden/metadata files
    * (`_SUCCESS`, `.crc`) are skipped, mirroring FileIndex conventions. */
  def listFiles(spark: SparkSession, path: String): Seq[(String, String)] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val out = Seq.newBuilder[(String, String)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val sample = st.getPath.toString.split('/')
          .find(_.startsWith("sample="))
          .map(seg => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(seg.stripPrefix("sample=")))
          .orNull
        out += ((st.getPath.toString, sample))
      }
    }
    out.result().sortBy(_._1)
  }
}

/** Hadoop `Configuration` is not `Serializable`; ship it via its own
  * `write`/`readFields` wire format (what Spark's internal wrapper does,
  * re-spelled on public API only). */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** One file = one partition (gzip text is a sequential stream). */
case class LineFilePartition(file: String, sample: String) extends InputPartition

abstract class LineFileTable(spark: SparkSession, path: String)
    extends Table with SupportsRead {
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // match the text source's analysis-time contract: a missing path is a
    // LOUD error, not an empty scan (a typo'd sample partition must abort
    // the run, not silently feed the aligner zero records). Checked at
    // scan-build, not table-build — a WRITE to a fresh directory is fine.
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root))
      throw new IllegalArgumentException(s"Path does not exist: $path")
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema()
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = buildScan(required)
    }
  }

  protected def buildScan(required: StructType): Scan

  protected def planPartitions(): Array[InputPartition] =
    PrqFastqSource.listFiles(spark, path)
      .map { case (f, s) => LineFilePartition(f, s): InputPartition }.toArray

  protected def serializableConf(): SerializableHadoopConf =
    new SerializableHadoopConf(spark.sessionState.newHadoopConf())
}

/** Base reader: codec-decoded line stream over one file. */
abstract class LineFileReader(part: LineFilePartition, conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val path = new Path(part.file)
  private val rawIn = path.getFileSystem(conf).open(path)
  private val in = {
    val codec = new CompressionCodecFactory(conf).getCodec(path)
    if (codec == null) rawIn else codec.createInputStream(rawIn)
  }
  protected val lines = new BufferedReader(
    new InputStreamReader(in, StandardCharsets.UTF_8))
  override def close(): Unit = lines.close()
}

// ---------------------------------------------------------------- PRQ ----

class PrqDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "prq"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PrqFastqSource.prqSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("prq source requires a path"))
    new LineFileTable(SparkSession.active, path)
        with org.apache.spark.sql.connector.catalog.SupportsWrite {
      override def name(): String = s"prq:$path"
      override def schema(): StructType = PrqFastqSource.prqSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ,
          TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
      override protected def buildScan(required: StructType): Scan = new Scan with Batch {
        override def readSchema(): StructType = required
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = planPartitions()
        override def createReaderFactory(): PartitionReaderFactory =
          PrqReaderFactory(required.fieldNames, serializableConf())
      }
      override def newWriteBuilder(
          info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
          : org.apache.spark.sql.connector.write.WriteBuilder =
        new PrqWriteBuilder(path, info, serializableConf())
    }
  }
}

case class PrqReaderFactory(fields: Array[String], conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LineFilePartition]
    new LineFileReader(p, conf.value) {
      private val sampleU = UTF8String.fromString(p.sample)
      private var row: InternalRow = _
      override def next(): Boolean = {
        val line = lines.readLine()
        if (line == null) return false
        // -1 keeps trailing empty fields: an empty seq2/qual2 writes as
        // 'id\tseq1\tqual1\t\t', which the default split would collapse
        // to 4 fields and wrongly reject
        val f = line.split("\t", -1)
        require(f.length == 5, s"malformed PRQ line in ${p.file}: " +
          s"${f.length} fields (${line.take(80)})")
        val vals = fields.map {
          case "sample" => sampleU
          case "id" => UTF8String.fromString(f(0))
          case "seq1" => UTF8String.fromString(f(1))
          case "qual1" => UTF8String.fromString(f(2))
          case "seq2" => UTF8String.fromString(f(3))
          case "qual2" => UTF8String.fromString(f(4))
        }
        row = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
        true
      }
      override def get(): InternalRow = row
    }
  }
}

// -------------------------------------------------------------- FASTQ ----

class FastqDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fastq"
  // reads are per-READ rows (file,id,seq,qual); writes take PAIR rows
  // (sample,id,seq1,qual1,seq2,qual2) and mate-split them into R1/R2
  // files — the schemas differ, so the provider accepts the external
  // (write-side) schema and validates it is one of the two shapes
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PrqFastqSource.fastqSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("fastq source requires a path"))
    val names = schema.fieldNames.toSet
    require(
      names.subsetOf(PrqFastqSource.fastqSchema.fieldNames.toSet) ||
      ("sample" +: FastqWrite.FieldOrder).forall(names.contains),
      s"fastq table schema must be the read shape " +
      s"(${PrqFastqSource.fastqSchema.fieldNames.mkString(",")}) or the " +
      s"pair write shape (sample,${FastqWrite.FieldOrder.mkString(",")}); " +
      s"got ${schema.fieldNames.mkString(",")}")
    val tableSchema = schema
    new LineFileTable(SparkSession.active, path)
        with org.apache.spark.sql.connector.catalog.SupportsWrite {
      override def name(): String = s"fastq:$path"
      // the externally-passed schema: fastqSchema on the read path (via
      // inferSchema), the validated pair shape on the write path
      override def schema(): StructType = tableSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ,
          TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
      override protected def buildScan(required: StructType): Scan = {
        // the pair shape is WRITE-only: a read planned with it would
        // MatchError record-by-record in the reader — fail at plan time
        val bad = required.fieldNames
          .filterNot(PrqFastqSource.fastqSchema.fieldNames.contains)
        require(bad.isEmpty,
          s"fastq reads use schema (${PrqFastqSource.fastqSchema.fieldNames
            .mkString(",")}); the pair shape is write-only — " +
          s"unreadable columns: ${bad.mkString(",")}")
        new Scan with Batch {
          override def readSchema(): StructType = required
          override def toBatch: Batch = this
          override def planInputPartitions(): Array[InputPartition] = planPartitions()
          override def createReaderFactory(): PartitionReaderFactory =
            FastqReaderFactory(required.fieldNames, serializableConf())
        }
      }
      override def newWriteBuilder(
          info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
          : org.apache.spark.sql.connector.write.WriteBuilder =
        new FastqWriteBuilder(path, info, serializableConf())
    }
  }
}

case class FastqReaderFactory(fields: Array[String], conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LineFilePartition]
    new LineFileReader(p, conf.value) {
      private val fileU = UTF8String.fromString(p.file)
      private var row: InternalRow = _
      override def next(): Boolean = {
        val l0 = lines.readLine()
        if (l0 == null) return false
        val l1 = lines.readLine(); val l2 = lines.readLine()
        val l3 = lines.readLine()
        // same contract as Codecs.parseFastq: 4 lines, @-header, +-separator
        require(l3 != null && l0.startsWith("@") && l2.startsWith("+"),
          s"malformed FASTQ record in ${p.file}: ${l0.take(80)}")
        val vals = fields.map {
          case "file" => fileU
          case "id" => UTF8String.fromString(l0.substring(1))
          case "seq" => UTF8String.fromString(l1)
          case "qual" => UTF8String.fromString(l3)
        }
        row = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
        true
      }
      override def get(): InternalRow = row
    }
  }
}
