package graft.dump

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Render a DataFrame as mysqldump text — the inverse of the converter.
  * Used by tests (scalacheck round-trips) and the `conv_*` oracle
  * queries to produce deterministic dump inputs from the driver's
  * parquet fixtures. Mirrors mysqldump's format: header comments, one
  * CREATE TABLE block, extended INSERTs batched like
  * `--extended-insert` output.
  */
object DumpRenderer {

  def mysqlType(dt: DataType): String = dt match {
    case LongType      => "bigint"
    case IntegerType   => "int"
    case ShortType     => "smallint"
    case DoubleType    => "double"
    case FloatType     => "float"
    case TimestampType => "datetime"
    case DateType      => "date"
    case d: DecimalType if d.precision == 20 && d.scale == 0 => "bigint unsigned"
    case BooleanType   => "boolean"
    case StringType    => "varchar(255)"
    case other => throw new IllegalArgumentException(s"cannot render $other in a mysqldump")
  }

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    s.foreach {
      case '\''   => sb.append("\\'")
      case '\\'   => sb.append("\\\\")
      case '\n'   => sb.append("\\n")
      case '\r'   => sb.append("\\r")
      case '\t'   => sb.append("\\t")
      case '\u0000' => sb.append("\\0")
      case '\u001a' => sb.append("\\Z")
      case c      => sb.append(c)
    }
    sb.toString
  }

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(java.time.ZoneOffset.UTC)
  // mysqldump emits fractional seconds for DATETIME(6) columns; render
  // them whenever the instant has sub-second precision so round-trips
  // through DumpParser.parseTimestamp (micros) are lossless.
  private val tsFracFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  def literal(v: Any): String = v match {
    case null                  => "NULL"
    case s: String             => s"'${escape(s)}'"
    case t: java.sql.Timestamp =>
      val fmt = if (t.toInstant.getNano == 0) tsFmt else tsFracFmt
      s"'${fmt.format(t.toInstant)}'"
    case d: java.sql.Date      => s"'$d'"                 // yyyy-MM-dd
    case d: java.time.LocalDate => s"'$d'"
    case b: java.math.BigDecimal => b.toPlainString
    case b: BigDecimal         => b.bigDecimal.toPlainString
    case b: Boolean            => if (b) "TRUE" else "FALSE"
    case b: java.lang.Boolean  => if (b) "TRUE" else "FALSE"
    case other                 => other.toString
  }

  def createTable(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"  `${f.name}` ${mysqlType(f.dataType)}$nn"
    }
    s"CREATE TABLE `$table` (\n${cols.mkString(",\n")}\n) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4;"
  }

  /** `columns` non-empty renders mysqldump's `--complete-insert` shape
    * (`INSERT INTO t (a, b) VALUES …`); each Row's values must already
    * be in LIST order. Empty renders the default positional shape. */
  def insert(table: String, rows: Seq[Row], columns: Seq[String] = Nil): String = {
    val colList =
      if (columns.isEmpty) ""
      else columns.map(c => s"`$c`").mkString(" (", ", ", ")")
    val tuples = rows.map(r => r.toSeq.map(literal).mkString("(", ",", ")"))
    s"INSERT INTO `$table`$colList VALUES ${tuples.mkString(",")};"
  }

  /** Full dump text for (table, rows-per-insert-batched) sections, with
    * mysqldump-style noise the reader must skip. */
  def dump(sections: Seq[(String, StructType, Seq[Row])], batchSize: Int = 1000): String = {
    val sb = new StringBuilder
    sb.append("-- MySQL dump 10.13  Distrib 8.0.36\n")
    sb.append("/*!40101 SET @saved_cs_client = @@character_set_client */;\n\n")
    sections.foreach { case (table, schema, rows) =>
      sb.append(s"--\n-- Table structure for table `$table`\n--\n\n")
      sb.append(s"DROP TABLE IF EXISTS `$table`;\n")
      sb.append(createTable(table, schema)).append("\n\n")
      sb.append(s"LOCK TABLES `$table` WRITE;\n")
      rows.grouped(batchSize).foreach(b => sb.append(insert(table, b)).append("\n"))
      sb.append("UNLOCK TABLES;\n\n")
    }
    sb.append("-- Dump completed\n")
    sb.toString
  }

  /** Render a (small) DataFrame section deterministically (driver-side
    * collect — test fixtures only, never a data-path operation). */
  def section(table: String, df: DataFrame, sortCols: Seq[String]): (String, StructType, Seq[Row]) = {
    val sorted = df.orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
    (table, df.schema, sorted.collect().toSeq)
  }
}
