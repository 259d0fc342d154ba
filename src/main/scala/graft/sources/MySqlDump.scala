package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.ZipFile

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** MySQL-dump SOURCE — reads `mysqldump` output (plain `.sql` or a
  * `.sql.zip` archive) as DataFrames, one per table, without any
  * database. The reference can only consume its own test fixture
  * (`tests/resources/sql/bugzilla_mini.sql.zip`) by replaying it into
  * a live MySQL instance (reference: tests/util/database.py:24
  * make_test_instance, which splits the dump on `;\r\n` and executes
  * each statement); this source parses the dump text directly, so the
  * engine's ETL operators run on the reference's REAL fixture data in
  * a plain test environment.
  *
  * Scale shape: the driver makes ONE boundary-finding pass per table —
  * a character state machine that only records tuple start/end offsets
  * (it must track quoted strings, since `),(` occurs freely inside
  * comment text) and never materializes row data — then the expensive
  * work (field split, escape decoding, type conversion) runs
  * DISTRIBUTED over a parallelized collection of tuple strings. A SQL
  * dump is an ingest artifact, not a working format: anything at real
  * scale is converted once, here, and written to parquet
  * ([[Partitioned]]/[[Bucketed]]) — this source is the conversion
  * step, so a single linear driver scan over the artifact is the
  * honest minimum, and the per-row work it feeds is executor-side.
  *
  * Type mapping (from the dump's own CREATE TABLE): integer families →
  * LongType, decimal/float/double → DoubleType, timestamp/datetime →
  * TimestampType parsed in UTC (the dump pins `TIME_ZONE='+00:00'` in
  * its preamble; MySQL zero-dates map to null), everything else →
  * StringType. MySQL escape sequences (\n \r \t \0 \Z \\ \' \" and
  * doubled '') decode exactly as the server would.
  */
object MySqlDump {

  /** Whole dump text; zip-aware (first entry of a `.zip`). One read
    * per dump: the per-table calls ([[schemaOf]]/[[tupleStrings]] via
    * [[table]]) all scan the same artifact, so a SINGLE-ENTRY memo
    * shares one read across them while bounding driver memory at one
    * dump (~2× its char size). The memo keys on (path, length, mtime,
    * content fingerprint), NOT the path alone — a dump replaced at
    * the same path in a long-lived JVM must re-read, never serve
    * stale text, even when the replacement has the identical byte
    * length within filesystem mtime granularity (the fingerprint —
    * eight 4 KiB blocks strided evenly across the raw file, head and
    * tail included — catches that case without hashing the whole
    * artifact; interior strides mean a mid-dump edit flips it too,
    * which a head+tail-only sample could not promise. Known blind
    * spot, stated honestly: a file larger than 32 KiB has unsampled
    * gaps between strides, so an edit confined ENTIRELY to a gap with
    * identical length and mtime can still serve the memo — full
    * certainty requires hashing the whole artifact, which would read
    * the dump twice per replacement for a cache whose point is
    * avoiding re-reads). The text is held via SoftReference,
    * so a memory-pressured driver reclaims the cache instead of
    * OOMing; a reclaimed entry simply re-reads. A multi-GB dump
    * converts table-by-table within that bound; beyond it the honest
    * move is splitting the dump before ingest, not a bigger cache. */
  @volatile private var textMemo
      : ((String, Long, Long, Long), java.lang.ref.SoftReference[String]) =
    null

  private def fingerprint(f: java.io.File): Long = {
    if (!f.isFile) return 0L
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      val n = raf.length()
      val block = math.min(4096L, n).toInt
      // 8 blocks strided across the whole file (offsets 0 .. n-block
      // inclusive): an interior-only edit — one table rewritten in the
      // middle of a multi-MB dump with identical length — still flips
      // the fingerprint, which head+tail sampling alone cannot promise
      val buf = new Array[Byte](block)
      var acc = 1125899906842597L
      var i = 0
      while (i < 8) {
        val off = if (n <= block) 0L else (n - block) * i / 7
        raf.seek(off)
        raf.readFully(buf)
        acc = acc * 1000003L + java.util.Arrays.hashCode(buf)
        i += 1
      }
      acc
    } finally raf.close()
  }

  def readText(path: String): String = {
    val f = new java.io.File(path)
    val key = (path, f.length(), f.lastModified(), fingerprint(f))
    val m = textMemo
    val cached = if (m != null && m._1 == key) m._2.get() else null
    if (cached != null) cached
    else {
      val t = readTextUncached(path)
      textMemo = (key, new java.lang.ref.SoftReference(t))
      t
    }
  }

  private def readTextUncached(path: String): String =
    if (path.endsWith(".zip")) {
      val zf = new ZipFile(path)
      try {
        val e = zf.entries().nextElement()
        val in = zf.getInputStream(e)
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      } finally zf.close()
    } else new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      StandardCharsets.UTF_8)

  private val ColDef = """^\s*`(\w+)`\s+([a-zA-Z]+).*""".r

  /** Column (name, SparkType) pairs parsed from the dump's own
    * CREATE TABLE statement. */
  def schemaOf(text: String, table: String): StructType = {
    val start = text.indexOf(s"CREATE TABLE `$table` (")
    require(start >= 0, s"no CREATE TABLE `$table` in dump")
    val end = text.indexOf("ENGINE=", start)
    val body = text.substring(start, if (end < 0) text.length else end)
    val fields = body.linesIterator.drop(1).collect {
      case ColDef(name, tpe) =>
        val t = tpe.toLowerCase
        val spark: DataType =
          if (t.endsWith("int")) LongType
          else if (t == "decimal" || t == "float" || t == "double") DoubleType
          else if (t == "timestamp" || t == "datetime") TimestampType
          else StringType
        StructField(name, spark, nullable = true)
    }.toArray
    require(fields.nonEmpty, s"no columns parsed for `$table`")
    StructType(fields)
  }

  /** The boundary pass: every `(...)` tuple of every
    * `INSERT INTO \`table\` VALUES ...;` statement, as raw substrings
    * (quotes and escapes intact). String-literal state is tracked so
    * parens and commas inside values never split a tuple. */
  def tupleStrings(text: String, table: String): Vector[String] = {
    val marker = s"INSERT INTO `$table` VALUES "
    val out = Vector.newBuilder[String]
    var from = text.indexOf(marker)
    while (from >= 0) {
      var i = from + marker.length
      var done = false
      while (!done && i < text.length) {
        if (text.charAt(i) == '(') {
          val tupleStart = i
          i += 1
          var inStr = false
          var depth = 1
          while (depth > 0) {
            require(i < text.length,
              s"unterminated tuple/string in `$table` near offset $tupleStart")
            val c = text.charAt(i)
            if (inStr) {
              if (c == '\\') i += 1 // skip escaped char
              else if (c == '\'')
                if (i + 1 < text.length && text.charAt(i + 1) == '\'') i += 1
                else inStr = false
            } else c match {
              case '\'' => inStr = true
              case '('  => depth += 1
              case ')'  => depth -= 1
              case _    =>
            }
            i += 1
          }
          out += text.substring(tupleStart + 1, i - 1)
          if (i < text.length && text.charAt(i) == ',') i += 1
          else done = true // ';' terminates the statement
        } else done = true
      }
      from = text.indexOf(marker, i)
    }
    out.result()
  }

  /** One tuple string → raw field values: Some(decoded) for string
    * literals and bare tokens, None for SQL NULL. Runs executor-side. */
  private[sources] def splitTuple(s: String): Array[Option[String]] = {
    val out = Array.newBuilder[Option[String]]
    val buf = new java.lang.StringBuilder
    var i = 0
    var wasQuoted = false
    def flush(): Unit = {
      val v = buf.toString
      out += (if (!wasQuoted && v == "NULL") None else Some(v))
      buf.setLength(0); wasQuoted = false
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { // string literal
        wasQuoted = true
        i += 1
        var closed = false
        while (!closed) {
          require(i < s.length,
            s"unterminated string literal in tuple near `${s.take(40)}`")
          val d = s.charAt(i)
          if (d == '\\') {
            require(i + 1 < s.length,
              s"dangling escape at end of tuple near `${s.takeRight(40)}`")
            buf.append(s.charAt(i + 1) match {
              case 'n' => '\n'; case 'r' => '\r'; case 't' => '\t'
              case '0' => '\u0000'; case 'Z' => '\u001A'
              case other => other // \' \" \\ and any passthrough
            })
            i += 2
          } else if (d == '\'') {
            if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
              buf.append('\''); i += 2
            } else { closed = true; i += 1 }
          } else { buf.append(d); i += 1 }
        }
      } else if (c == ',') { flush(); i += 1 }
      else { buf.append(c); i += 1 }
    }
    flush()
    out.result()
  }

  private val UtcFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")

  private[sources] def convert(raw: Option[String], dt: DataType): Any =
    raw match {
      case None => null
      case Some(v) => dt match {
        case LongType   => v.toLong
        case DoubleType => v.toDouble
        case TimestampType =>
          if (v.startsWith("0000")) null // MySQL zero-date
          else java.sql.Timestamp.from(
            java.time.LocalDateTime.parse(v, UtcFmt)
              .toInstant(java.time.ZoneOffset.UTC))
        case _ => v
      }
    }

  /** The table as a DataFrame. The driver pass slices tuples; parsing
    * distributes over `defaultParallelism` (bounded by the tuple
    * count). */
  def table(spark: SparkSession, dumpPath: String, name: String)
      : DataFrame = {
    val text = readText(dumpPath)
    val schema = schemaOf(text, name)
    val tuples = tupleStrings(text, name)
    val types = schema.fields.map(_.dataType)
    val slices = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, tuples.size / 512 + 1))
    val rows = spark.sparkContext.parallelize(tuples, slices).map { t =>
      val raw = splitTuple(t)
      require(raw.length == types.length,
        s"tuple arity ${raw.length} != schema ${types.length} in `$name`")
      Row.fromSeq(raw.toIndexedSeq.zip(types).map {
        case (v, dt) => convert(v, dt)
      })
    }
    spark.createDataFrame(rows, schema)
  }
}
