package graft.sources

import java.io.File
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** The parquet store's CHANGE-LOG sidecar (`dir/_log`) — what turns the
  * cold lakehouse backend into a streamable one: an append-only sequence
  * of parquet SEGMENT files, each sealing a contiguous run of
  * [[LogEntry]] positions (upserts carry the full point, deletes are
  * id-only tombstones), named `seg-<start>-<end>.parquet` so a tail
  * replay positions itself from FILENAMES alone — no footer of a
  * compacted-away or non-overlapping segment is ever opened, which is
  * the flat-replay-cost property the in-memory store's
  * `logBase`/`logOf` split provides and Delta/Kafka provide with
  * checkpoint + retained tail. `base.txt` records the compaction point
  * (the first still-replayable position); segments wholly below it are
  * deleted at compaction time, a straddling one is rewritten to its
  * retained suffix, and every retained entry keeps its GLOBAL position
  * so checkpointed CDC readers past the compaction point are
  * undisturbed.
  *
  * The log duplicates upserted bytes (entry = full point), the standard
  * changelog/WAL cost; the manifest alternative (segments referencing
  * immutable primary data files, Delta's add-file actions) would trade
  * that for reference-counting primary rewrites and is noted, not built.
  */
private[sources] object ParquetLog {

  final case class SegMeta(path: String, start: Long, end: Long)

  private def conf = new Configuration()

  private val SegName = """seg-(\d{20})-(\d{20})\.parquet""".r

  def segFileName(start: Long, end: Long): String =
    f"seg-$start%020d-$end%020d.parquet"

  /** Segment metadata from FILENAMES only, sorted by start position. */
  def segments(logDir: File): Seq[SegMeta] =
    Option(logDir.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => f.getName match {
        case SegName(s, e) => Some(SegMeta(f.getAbsolutePath, s.toLong, e.toLong))
        case _ => None
      }).sortBy(_.start)

  /** Compaction point (first replayable position); 0 until compacted. */
  def base(logDir: File): Long = {
    val f = new File(logDir, "base.txt")
    if (!f.isFile) 0L
    else new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong
  }

  def writeBase(logDir: File, n: Long): Unit = {
    java.nio.file.Files.write(new File(logDir, "base.txt").toPath,
      n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
  }

  /** Log head = one past the last sealed position. */
  def head(logDir: File): Long =
    segments(logDir).lastOption.map(_.end).getOrElse(base(logDir))

  // ------------------------------------------------------------- schema --

  /** Log-segment schema: positions + op + the collection's stored row
    * shape (id, payload, one float-list column per dense field).
    */
  def logSchema(denseCols: Seq[String]): MessageType =
    withRowFields(
      Types.buildMessage()
        .required(PrimitiveTypeName.INT64).named("seq")
        .required(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("op"),
      denseCols).named("graft_log")

  /** Primary-file schema (the store row layout, matching what
    * [[ParquetCollectionStore.write]]'s Spark job lays down).
    */
  def primarySchema(denseCols: Seq[String]): MessageType =
    withRowFields(Types.buildMessage(), denseCols).named("graft_points")

  private def withRowFields(b0: Types.GroupBuilder[MessageType],
                            denseCols: Seq[String]): Types.GroupBuilder[MessageType] = {
    var b = b0
      .required(PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).named("id")
      .optional(PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).named("payload")
    denseCols.foreach { c =>
      b = b.optionalGroup().as(LogicalTypeAnnotation.listType())
        .repeatedGroup()
        .optional(PrimitiveTypeName.FLOAT).named("element")
        .named("list")
        .named(c)
    }
    b
  }

  // ------------------------------------------------------------- writing --

  /** Write `groups` as one parquet file ATOMICALLY (tmp + rename), and
    * drop any stale Hadoop `.crc` for the destination (a replaced
    * Spark-written file would otherwise fail checksum on read).
    */
  def writeGroups(dest: File, schema: MessageType,
                  groups: Iterator[Group]): Unit = {
    val tmp = new File(dest.getParentFile,
      s".tmp-${java.util.UUID.randomUUID().toString.take(8)}-${dest.getName}")
    val w = ExampleParquetWriter.builder(
        HadoopOutputFile.fromPath(new Path(tmp.getAbsolutePath), conf))
      .withType(schema).build()
    try groups.foreach(w.write) finally w.close()
    // stale checksum shadows of the tmp name and the destination
    new File(tmp.getParentFile, s".${tmp.getName}.crc").delete()
    new File(dest.getParentFile, s".${dest.getName}.crc").delete()
    java.nio.file.Files.move(tmp.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  private def rowInto(g: Group, p: Point, denseCols: Seq[String],
                      columnOf: String => String): Unit = {
    g.add("id", p.id)
    p.payload.foreach(g.add("payload", _))
    p.dense.foreach { case (field, vec) =>
      val cn = columnOf(field)
      if (denseCols.contains(cn)) {
        val outer = g.addGroup(cn)
        var i = 0
        while (i < vec.length) {
          outer.addGroup("list").add("element", vec(i)); i += 1
        }
      }
    }
  }

  /** Seal `entries` as ONE log segment at positions [start, start+n). */
  def appendSegment(logDir: File, start: Long, entries: Seq[LogEntry],
                    denseCols: Seq[String],
                    columnOf: String => String): Long = {
    require(entries.nonEmpty, "empty log segment")
    logDir.mkdirs()
    val end = start + entries.size
    val schema = logSchema(denseCols)
    val fac = new SimpleGroupFactory(schema)
    val groups = entries.iterator.zipWithIndex.map { case (e, i) =>
      val g = fac.newGroup()
      g.add("seq", start + i)
      g.add("op", e.op)
      rowInto(g, e.point, denseCols, columnOf)
      g
    }
    writeGroups(new File(logDir, segFileName(start, end)), schema, groups)
    end
  }

  /** Seal `points` as one PRIMARY store file (COW rewrite unit). */
  def writePrimary(dest: File, points: Seq[Point], denseCols: Seq[String],
                   columnOf: String => String): Unit = {
    val schema = primarySchema(denseCols)
    val fac = new SimpleGroupFactory(schema)
    writeGroups(dest, schema, points.iterator.map { p =>
      val g = fac.newGroup()
      rowInto(g, p, denseCols, columnOf)
      g
    })
  }

  // ------------------------------------------------------------- reading --

  /** Decode a float-list group value (3-level `list.element` wrappers or
    * 2-level repeated primitives, float or double elements) — the same
    * dispatch as the store's point decode.
    */
  private def decodeFloats(listG: Group): Array[Float] = {
    val inner = listG.getType.getType(0)
    val n = listG.getFieldRepetitionCount(0)
    val arr = new Array[Float](n)
    var i = 0
    if (inner.isPrimitive) {
      val isFloat = inner.asPrimitiveType().getPrimitiveTypeName ==
        PrimitiveTypeName.FLOAT
      while (i < n) {
        arr(i) = if (isFloat) listG.getFloat(0, i)
                 else listG.getDouble(0, i).toFloat
        i += 1
      }
    } else {
      while (i < n) {
        val w = listG.getGroup(0, i).asInstanceOf[Group]
        if (w.getFieldRepetitionCount(0) > 0) {
          val el = w.getType.getType(0).asPrimitiveType()
          arr(i) = el.getPrimitiveTypeName match {
            case PrimitiveTypeName.FLOAT => w.getFloat(0, 0)
            case _ => w.getDouble(0, 0).toFloat
          }
        }
        i += 1
      }
    }
    arr
  }

  /** Decode one group's stored row columns into a Point. `colToField`
    * maps stored column name -> vector field name.
    */
  private def decodePoint(g: Group, schema: MessageType,
                          colToField: Map[String, String]): Point = {
    val id = g.getString("id", 0)
    val payIdx = schema.getFieldIndex("payload")
    val payload =
      if (g.getFieldRepetitionCount(payIdx) == 0) None
      else Some(g.getString(payIdx, 0))
    val dense = colToField.flatMap { case (cn, field) =>
      if (!schema.containsField(cn)) None
      else {
        val ci = schema.getFieldIndex(cn)
        if (g.getFieldRepetitionCount(ci) == 0) None
        else Some(field -> decodeFloats(g.getGroup(ci, 0).asInstanceOf[Group]))
      }
    }
    Point(id, payload, dense)
  }

  /** Stream a whole parquet file's groups (row-group at a time). */
  private def readGroups(path: String)(f: (Group, MessageType) => Unit): Unit = {
    val in = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf))
    try {
      val schema = in.getFooter.getFileMetaData.getSchema
      val colIO = new ColumnIOFactory().getColumnIO(schema)
      var pages = in.readNextRowGroup()
      while (pages != null) {
        val rr = colIO.getRecordReader(pages, new GroupRecordConverter(schema))
        val n = pages.getRowCount
        var i = 0L
        while (i < n) { f(rr.read(), schema); i += 1 }
        pages = in.readNextRowGroup()
      }
    } finally in.close()
  }

  /** Entries of one segment restricted to positions [from, until). */
  def readSegment(path: String, from: Long, until: Long,
                  colToField: Map[String, String]): Seq[LogEntry] = {
    val out = Seq.newBuilder[LogEntry]
    readGroups(path) { (g, schema) =>
      val seq = g.getLong("seq", 0)
      if (seq >= from && seq < until)
        out += LogEntry(g.getString("op", 0),
          decodePoint(g, schema, colToField), seq)
    }
    out.result()
  }

  /** All points of one primary/segment-shaped file (COW read side). */
  def readPoints(path: String, colToField: Map[String, String]): Seq[Point] = {
    val out = Seq.newBuilder[Point]
    readGroups(path) { (g, schema) => out += decodePoint(g, schema, colToField) }
    out.result()
  }

  /** Rows of one int8-codes file — (id, codes, scale), the quantized
    * candidate tier of the store's IVF sidecar. Codes decode from the
    * Spark tinyint-list layout (3-level list of INT32-stored bytes).
    */
  def readCodeRows(path: String): Seq[(String, Array[Byte], Float)] = {
    val out = Seq.newBuilder[(String, Array[Byte], Float)]
    readGroups(path) { (g, schema) =>
      val id = g.getString("id", 0)
      val scale = g.getFloat(schema.getFieldIndex("scale"), 0)
      val ci = schema.getFieldIndex("codes")
      val codes =
        if (g.getFieldRepetitionCount(ci) == 0) Array.empty[Byte]
        else {
          val listG = g.getGroup(ci, 0).asInstanceOf[Group]
          val n = listG.getFieldRepetitionCount(0)
          val arr = new Array[Byte](n)
          var i = 0
          val inner = listG.getType.getType(0)
          if (inner.isPrimitive) {
            while (i < n) { arr(i) = listG.getInteger(0, i).toByte; i += 1 }
          } else {
            while (i < n) {
              val w = listG.getGroup(0, i).asInstanceOf[Group]
              if (w.getFieldRepetitionCount(0) > 0)
                arr(i) = w.getInteger(0, 0).toByte
              i += 1
            }
          }
          arr
        }
      out += ((id, codes, scale))
    }
    out.result()
  }

  /** Rows of one sparse-postings file — (id, dim, value), the
    * dim-bucketed inverted-index sidecar layout.
    */
  def readPostingRows(path: String): Seq[(String, Int, Double)] = {
    val out = Seq.newBuilder[(String, Int, Double)]
    readGroups(path) { (g, schema) =>
      out += ((g.getString("id", 0),
        g.getInteger(schema.getFieldIndex("dim"), 0),
        g.getDouble(schema.getFieldIndex("v"), 0)))
    }
    out.result()
  }

  /** Mirror one PRIMARY file as the log segment sealing its enumeration
    * positions [start, start+rows) as upserts — the initial-ingest
    * changelog entry for that file. Runs executor-side (one task per
    * file) from [[ParquetCollectionStore.write]]: the changelog of a
    * 100 TB ingest is written by the cluster, not the driver.
    */
  def mirrorPrimary(primaryPath: String, logDirPath: String, start: Long,
                    denseCols: Seq[String]): Unit = {
    val logDir = new File(logDirPath)
    logDir.mkdirs()
    val schema = logSchema(denseCols)
    val fac = new SimpleGroupFactory(schema)
    // columns mirror 1:1 (field name = column name for segment bytes)
    val colToField = denseCols.map(c => c -> c).toMap
    val pts = readPoints(primaryPath, colToField)
    val end = start + pts.size
    writeGroups(new File(logDir, segFileName(start, end)), schema,
      pts.iterator.zipWithIndex.map { case (p, i) =>
        val g = fac.newGroup()
        g.add("seq", start + i)
        g.add("op", LogOps.Upsert)
        rowInto(g, p, denseCols, identity)
        g
      })
  }

  /** Footer row counts of the primary file sequence -> (path, start
    * position, rows), the enumeration the segment mirror seals.
    */
  def primaryMetas(dir: String): Seq[(String, Long, Long)] = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    var start = 0L
    files.toSeq.map { f =>
      val in = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      val rows = try in.getRowGroups.asScala.map(_.getRowCount.toLong).sum
                 finally in.close()
      val m = (f.getAbsolutePath, start, rows)
      start += rows
      m
    }
  }
}
