package graft.dump

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import org.apache.spark.sql.types._

/** Hand-rolled MySQL-dump statement parser: `CREATE TABLE` → StructType,
  * extended `INSERT INTO ... VALUES` → typed rows. Replaces the
  * reference's use of sqlparser 0.41 (`/root/reference/src/line_parser.rs`)
  * — no external parser dependency resolves offline, and we only need the
  * two statement shapes mysqldump emits.
  *
  * Semantics mirror the reference exactly unless marked DEVIATION:
  *   - type mapping per `line_parser.rs:122-174`: all integer-ish and
  *     DECIMAL/NUMERIC types → LongType (DECIMAL → Int64 is lossy BY
  *     DESIGN; fractional values in such columns error), FLOAT/REAL/
  *     DOUBLE → DoubleType, DATE/TIME/DATETIME/TIMESTAMP → TimestampType,
  *     VARCHAR/TEXT/STRING/ENUM/longtext/mediumtext → StringType;
  *   - column names lowercased in the output schema (`line_parser.rs:39`);
  *   - nullability: default true; first matching option among
  *     `NOT NULL` → false, inline `PRIMARY KEY` → false, bare `NULL` →
  *     true wins (`line_parser.rs:176-193`); table-level constraints are
  *     ignored entirely (`line_parser.rs:97`);
  *   - `tinyint(1)` stays Integer, NOT Boolean (`line_parser.rs:130-131`);
  *   - integer literals widen to Double in Float columns
  *     (`parquet_writer.rs:162`);
  *   - DEVIATION (fixes a reference panic, `line_parser.rs:45`): BOOL/
  *     BOOLEAN columns map to BooleanType instead of `todo!()`;
  *   - DEVIATION (fixes a reference panic, `parquet_writer.rs:173-192`):
  *     date-only literals in timestamp columns parse as midnight UTC
  *     instead of panicking on the fixed-offset slice; fractional
  *     seconds are honored to micros instead of being sliced off.
  *     Timestamps are still interpreted as UTC wall-clock.
  *   - DEVIATION (extends a reference bail, `line_parser.rs:256`
  *     `Unsupported syntax for value`): charset-introducer literals
  *     (`_binary '...'`, `_utf8mb4 '...'`) parse as their string body,
  *     and hex literals (`0xABCD`, `X'ABCD'`) decode as UTF-8 bytes —
  *     both appear in real mysqldump output (binary columns by default,
  *     `--hex-blob` respectively); the reference errors the whole run.
  */
object DumpParser extends Serializable {

  sealed trait Statement extends Serializable
  case class CreateTable(table: String, schema: StructType) extends Statement
  /** Raw row values: Long | Double | String | Boolean | null.
    * `columns` empty (the common mysqldump shape) → values are
    * positional in schema order; non-empty (`INSERT INTO t (b, a)
    * VALUES …`) → values are positional in LIST order and must be
    * permuted to schema order by [[rowAligner]] before [[coerceRow]].
    * Names are lowercased to match the extracted schema's names. */
  case class InsertInto(table: String, rows: Vector[Array[Any]],
                        columns: Vector[String] = Vector.empty) extends Statement
  case object Nop extends Statement

  final class DumpParseException(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new DumpParseException(msg)

  /** Opt-in type-mapping extensions beyond reference parity; the
    * default instance reproduces the reference's mapping exactly.
    *
    *  - `dateAsDate`: MySQL `DATE` columns → `DateType` (faithful
    *    date round-trip for downstream engines) instead of the
    *    reference's midnight `TimestampType`
    *    (`line_parser.rs:158-161`).
    *  - `unsignedBigintDecimal`: `BIGINT UNSIGNED` columns →
    *    `DecimalType(20, 0)`, and integer literals above i64::MAX
    *    parse as scale-0 decimals instead of erroring — converts
    *    dumps the reference rejects (`line_parser.rs:247`). Values
    *    are still range-checked to u64. */
  case class TypeOptions(dateAsDate: Boolean = false,
                         unsignedBigintDecimal: Boolean = false)
      extends Serializable
  val DefaultTypes: TypeOptions = TypeOptions()

  /** u64::MAX — the upper bound of MySQL BIGINT UNSIGNED. */
  private val U64Max = new java.math.BigDecimal("18446744073709551615")

  def parse(stmt: String): Statement = parse(stmt, DefaultTypes)

  def parse(stmt: String, opts: TypeOptions): Statement =
    if (stmt.startsWith("CREATE TABLE")) parseCreateTable(stmt, opts)
    else if (stmt.startsWith("INSERT INTO")) parseInsert(stmt, opts)
    else Nop

  // ------------------------------------------------------------ lexing

  /** Mutable cursor over a statement — shared by the DDL and VALUES
    * parsers. All scanning is index-based (no regex) so multi-MB
    * extended-INSERT statements parse in one allocation-light pass. */
  private final class Cursor(val s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def skipWs(): Unit = while (!eof && Character.isWhitespace(peek)) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      if (eof || peek != c) fail(s"expected '$c' at offset $i in: ${context}")
      i += 1
    }
    def tryConsume(c: Char): Boolean = {
      skipWs()
      if (!eof && peek == c) { i += 1; true } else false
    }
    def context: String = {
      val from = math.max(0, i - 40)
      val to = math.min(s.length, i + 40)
      s.substring(from, to)
    }
    /** Backquoted, double-quoted, or bare identifier. */
    def ident(): String = {
      skipWs()
      if (eof) fail("expected identifier at end of statement")
      peek match {
        case '`' | '"' =>
          val q = peek
          i += 1
          val start = i
          while (!eof && peek != q) i += 1
          if (eof) fail(s"unterminated quoted identifier: $context")
          val name = s.substring(start, i)
          i += 1
          name
        case _ =>
          val start = i
          while (!eof && (Character.isLetterOrDigit(peek) || peek == '_' || peek == '$')) i += 1
          if (i == start) fail(s"expected identifier at offset $i: $context")
          s.substring(start, i)
      }
    }
    /** Bare keyword-ish word (letters/digits/underscore). */
    def word(): String = {
      skipWs()
      val start = i
      while (!eof && (Character.isLetterOrDigit(peek) || peek == '_')) i += 1
      s.substring(start, i)
    }
    /** Peek the next word without consuming. */
    def peekWord(): String = {
      val save = i
      val w = word()
      i = save
      w
    }
  }

  // ------------------------------------------------------- CREATE TABLE

  private val IntegerTypes = Set(
    "NUMERIC", "DECIMAL", "BIGNUMERIC", "BIGDECIMAL", "DEC",
    "TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INT2", "INT4", "INT8",
    "INTEGER", "BIGINT", "INT64")
  private val FloatTypes = Set("FLOAT", "FLOAT4", "FLOAT8", "FLOAT64", "REAL", "DOUBLE")
  private val TimestampTypes = Set("DATE", "TIME", "DATETIME", "TIMESTAMP")
  private val StringTypes = Set(
    "VARCHAR", "TEXT", "STRING", "ENUM", "LONGTEXT", "MEDIUMTEXT", "TINYTEXT", "CHAR")
  private val BooleanTypes = Set("BOOL", "BOOLEAN")
  private val ConstraintStarts = Set(
    "PRIMARY", "UNIQUE", "KEY", "CONSTRAINT", "FOREIGN", "INDEX",
    "FULLTEXT", "SPATIAL", "CHECK")

  def sparkType(typeWord: String): DataType =
    sparkType(typeWord, unsigned = false, DefaultTypes)

  def sparkType(typeWord: String, unsigned: Boolean, opts: TypeOptions): DataType =
    typeWord.toUpperCase match {
      case "BIGINT" | "INT8" if unsigned && opts.unsignedBigintDecimal =>
        DecimalType(20, 0)
      case "DATE" if opts.dateAsDate       => DateType
      case t if IntegerTypes.contains(t)   => LongType
      case t if FloatTypes.contains(t)     => DoubleType
      case t if TimestampTypes.contains(t) => TimestampType
      case t if StringTypes.contains(t)    => StringType
      case t if BooleanTypes.contains(t)   => BooleanType
      case t => fail(s"unsupported column type: $t")
    }

  def parseCreateTable(stmt: String): CreateTable = parseCreateTable(stmt, DefaultTypes)

  def parseCreateTable(stmt: String, opts: TypeOptions): CreateTable = {
    val c = new Cursor(stmt)
    c.i = "CREATE TABLE".length
    c.skipWs()
    if (c.peekWord().equalsIgnoreCase("IF")) { c.word(); c.word(); c.word() } // IF NOT EXISTS
    val table = c.ident()
    c.expect('(')
    val fields = Vector.newBuilder[StructField]
    var done = false
    while (!done) {
      c.skipWs()
      val w = c.peekWord().toUpperCase
      if (ConstraintStarts.contains(w)) skipToColumnEnd(c)
      else {
        val name = c.ident()
        val typeWord = c.word()
        if (typeWord.isEmpty) fail(s"missing type for column $name: ${c.context}")
        // type arguments: (10,2), ('a','b') — skip, quote-aware
        if (c.tryConsume('(')) skipParenBody(c)
        var unsigned = false
        var extra = c.peekWord().toUpperCase
        if (extra == "UNSIGNED" || extra == "SIGNED" || extra == "ZEROFILL" ||
            (typeWord.equalsIgnoreCase("DOUBLE") && extra == "PRECISION")) {
          if (extra == "UNSIGNED") unsigned = true
          c.word()
          extra = c.peekWord().toUpperCase
        }
        val dt = sparkType(typeWord, unsigned, opts)
        val nullable = parseColumnOptions(c)
        fields += StructField(name.toLowerCase, dt, nullable)
      }
      c.skipWs()
      if (c.tryConsume(',')) ()
      else { c.expect(')'); done = true }
    }
    CreateTable(table, StructType(fields.result()))
  }

  /** Nullability per `line_parser.rs:176-193`: scan options left to
    * right, first match wins: NOT NULL → false, PRIMARY KEY → false,
    * bare NULL → true; `DEFAULT <expr>` is skipped as a unit so
    * `DEFAULT NULL` never reads as a NULL option. Consumes up to the
    * column-separating ',' or the closing ')'. */
  private def parseColumnOptions(c: Cursor): Boolean = {
    var nullable = true
    var decided = false
    var depth = 0
    var done = false
    while (!done) {
      c.skipWs()
      if (c.eof) fail(s"unterminated column definition: ${c.context}")
      c.peek match {
        case ',' | ')' if depth == 0 => done = true
        case '(' => depth += 1; c.i += 1
        case ')' => depth -= 1; c.i += 1
        case '\'' => skipStringLiteral(c)
        case '`' | '"' => c.ident(); ()
        case ch if Character.isLetter(ch) =>
          val w = c.word().toUpperCase
          w match {
            case "NOT" =>
              if (c.peekWord().equalsIgnoreCase("NULL")) {
                c.word()
                if (!decided) { nullable = false; decided = true }
              }
            case "NULL" =>
              if (!decided) { nullable = true; decided = true }
            case "PRIMARY" =>
              if (c.peekWord().equalsIgnoreCase("KEY")) {
                c.word()
                if (!decided) { nullable = false; decided = true }
              }
            case "DEFAULT" =>
              c.skipWs()
              if (!c.eof) c.peek match {
                case '\'' => skipStringLiteral(c)
                case '(' => c.i += 1; skipParenBody(c)
                case '-' => c.i += 1; c.word(); ()
                case _ =>
                  c.word()
                  if (c.tryConsume('(')) skipParenBody(c) // e.g. CURRENT_TIMESTAMP(6)
              }
            case _ => () // COMMENT/CHARACTER SET/COLLATE handled tokenwise
          }
        case _ => c.i += 1
      }
    }
    nullable
  }

  /** Skip a constraint/index table element up to its separating ',' or
    * the table-closing ')' (quote- and paren-aware). */
  private def skipToColumnEnd(c: Cursor): Unit = {
    var depth = 0
    var done = false
    while (!done) {
      if (c.eof) fail(s"unterminated table element: ${c.context}")
      c.peek match {
        case ',' | ')' if depth == 0 => done = true
        case '(' => depth += 1; c.i += 1
        case ')' => depth -= 1; c.i += 1
        case '\'' => skipStringLiteral(c)
        case _ => c.i += 1
      }
    }
  }

  /** Cursor is just past '('; skip to just past the matching ')'. */
  private def skipParenBody(c: Cursor): Unit = {
    var depth = 1
    while (depth > 0) {
      if (c.eof) fail(s"unterminated parenthesis: ${c.context}")
      c.peek match {
        case '('  => depth += 1; c.i += 1
        case ')'  => depth -= 1; c.i += 1
        case '\'' => skipStringLiteral(c)
        case _    => c.i += 1
      }
    }
  }

  /** Cursor at opening '\''; consume the whole literal (escapes + ''). */
  private def skipStringLiteral(c: Cursor): Unit = {
    c.i += 1
    var done = false
    while (!done) {
      if (c.eof) fail("unterminated string literal")
      val ch = c.peek
      if (ch == '\\') c.i += 2
      else if (ch == '\'') {
        if (c.i + 1 < c.s.length && c.s.charAt(c.i + 1) == '\'') c.i += 2
        else { c.i += 1; done = true }
      } else c.i += 1
    }
  }

  // ------------------------------------------------------------ INSERT

  /** Cheap table-name extraction (for routing without a full parse). */
  def insertTarget(stmt: String): String = {
    val c = new Cursor(stmt)
    c.i = "INSERT INTO".length
    c.ident()
  }

  /** Database name of a `USE db;` / `USE \`db\`;` statement (raw, like
    * table names). */
  def useTarget(stmt: String): String = {
    val c = new Cursor(stmt)
    c.i = "USE".length
    c.ident()
  }

  def parseInsert(stmt: String): InsertInto = parseInsert(stmt, DefaultTypes)

  def parseInsert(stmt: String, opts: TypeOptions): InsertInto = {
    val c = new Cursor(stmt)
    c.i = "INSERT INTO".length
    val table = c.ident()
    c.skipWs()
    // Optional column list (`--complete-insert` dumps, hand-written
    // inserts). The reference assigns values positionally and silently
    // ignores the list (`line_parser.rs:200-272`) — DEVIATION: we honor
    // it, because a reordered or partial list under positional
    // assignment is SILENTLY WRONG data, the worst failure mode a
    // 100 TB ingest can have. Names are lowercased like the schema
    // extractor's (first-wins DDL lowercases column names).
    val columns = Vector.newBuilder[String]
    if (!c.eof && c.peek == '(') {
      c.i += 1
      var more = true
      while (more) {
        columns += c.ident().toLowerCase(java.util.Locale.ROOT)
        more = c.tryConsume(',')
      }
      c.expect(')')
    }
    val kw = c.word()
    if (!kw.equalsIgnoreCase("VALUES")) fail(s"expected VALUES in INSERT, got '$kw': ${c.context}")
    val rows = Vector.newBuilder[Array[Any]]
    var more = true
    while (more) {
      c.expect('(')
      val row = Vector.newBuilder[Any]
      var rowDone = false
      while (!rowDone) {
        row += parseValue(c, opts)
        if (c.tryConsume(',')) ()
        else { c.expect(')'); rowDone = true }
      }
      rows += row.result().toArray
      more = c.tryConsume(',')
    }
    InsertInto(table, rows.result(), columns.result())
  }

  /** One literal: NULL | TRUE | FALSE | number | 'string' |
    * `_charset 'string'` | `0xHEX` | `X'HEX'`. Mirrors
    * `line_parser.rs:224-267` — unquoted numbers without '.' are
    * integers (i64, overflow errors), with '.'/exponent are doubles,
    * `-` negates a following number — except the introducer/hex forms
    * (DEVIATION, see class doc): those appear in real dumps and the
    * reference bails on them. */
  private def parseValue(c: Cursor, opts: TypeOptions): Any = {
    c.skipWs()
    if (c.eof) fail("expected value at end of statement")
    c.peek match {
      case '\'' => parseStringLiteral(c)
      case '-'  => c.i += 1; negate(parseNumber(c, opts))
      case '+'  => c.i += 1; parseNumber(c, opts)
      case '0' if c.i + 1 < c.s.length &&
          (c.s.charAt(c.i + 1) == 'x' || c.s.charAt(c.i + 1) == 'X') &&
          c.i + 2 < c.s.length && isHex(c.s.charAt(c.i + 2)) =>
        c.i += 2; parseHexBody(c)
      case d if d >= '0' && d <= '9' => parseNumber(c, opts)
      case '.' => parseNumber(c, opts)
      case ('x' | 'X') if c.i + 1 < c.s.length && c.s.charAt(c.i + 1) == '\'' =>
        // X'ABCD' hex-string: body is hex digits inside quotes
        c.i += 2
        val v = parseHexBody(c)
        if (c.eof || c.peek != '\'') fail(s"unterminated hex string: ${c.context}")
        c.i += 1
        v
      case '_' =>
        // charset introducer (_binary, _utf8mb4, _latin1, ...): the
        // value is the string literal that follows
        c.word()
        c.skipWs()
        if (c.eof || c.peek != '\'') fail(s"expected string after charset introducer: ${c.context}")
        parseStringLiteral(c)
      case _ =>
        val w = c.word().toUpperCase
        w match {
          case "NULL"  => null
          case "TRUE"  => java.lang.Boolean.TRUE
          case "FALSE" => java.lang.Boolean.FALSE
          case other   => fail(s"unsupported literal '$other': ${c.context}")
        }
    }
  }

  private def isHex(ch: Char): Boolean =
    (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F')

  /** Consume hex digits at the cursor and decode the byte string as
    * UTF-8 (MySQL hex literals are binary strings; text columns read
    * them as their encoded bytes). Odd digit counts get a leading 0,
    * matching MySQL's X'...' semantics. */
  private def parseHexBody(c: Cursor): String = {
    val start = c.i
    while (!c.eof && isHex(c.peek)) c.i += 1
    val digits0 = c.s.substring(start, c.i)
    if (digits0.isEmpty) return ""
    val digits = if (digits0.length % 2 == 1) "0" + digits0 else digits0
    val bytes = new Array[Byte](digits.length / 2)
    var k = 0
    while (k < bytes.length) {
      bytes(k) = Integer.parseInt(digits.substring(2 * k, 2 * k + 2), 16).toByte
      k += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def negate(v: Any): Any = v match {
    case l: java.lang.Long   => java.lang.Long.valueOf(-l.longValue())
    case d: java.lang.Double => java.lang.Double.valueOf(-d.doubleValue())
    case b: java.math.BigDecimal => b.negate()
    case other               => fail(s"cannot negate $other")
  }

  private def parseNumber(c: Cursor, opts: TypeOptions): Any = {
    val start = c.i
    var isFloat = false
    var cont = true
    while (!c.eof && cont) {
      c.peek match {
        case ch if ch >= '0' && ch <= '9' => c.i += 1
        case '.' => isFloat = true; c.i += 1
        case 'e' | 'E' =>
          isFloat = true; c.i += 1
          if (!c.eof && (c.peek == '+' || c.peek == '-')) c.i += 1
        case _ => cont = false
      }
    }
    val text = c.s.substring(start, c.i)
    if (text.isEmpty) fail(s"expected number: ${c.context}")
    if (isFloat) java.lang.Double.valueOf(text)
    else
      try java.lang.Long.valueOf(text)
      catch {
        case _: NumberFormatException =>
          // parity: the reference parses integers as i64 and errors on
          // overflow (line_parser.rs:247). The unsigned-decimal opt-in
          // keeps the literal as a scale-0 decimal; range enforcement
          // happens at coercion where the column type is known.
          if (opts.unsignedBigintDecimal) new java.math.BigDecimal(text)
          else fail(s"integer out of i64 range: $text")
      }
  }

  /** MySQL single-quoted string: backslash escapes + '' doubling. */
  private def parseStringLiteral(c: Cursor): String = {
    c.i += 1
    val sb = new StringBuilder
    var done = false
    while (!done) {
      if (c.eof) fail("unterminated string literal")
      val ch = c.peek
      if (ch == '\\') {
        if (c.i + 1 >= c.s.length) fail("dangling escape at end of statement")
        val e = c.s.charAt(c.i + 1)
        sb.append(e match {
          case 'n' => '\n'
          case 't' => '\t'
          case 'r' => '\r'
          case '0' => '\u0000'
          case 'b' => '\b'
          case 'Z' => '\u001a'
          case other => other // \' \" \\ \% \_ and unknown → literal char
        })
        c.i += 2
      } else if (ch == '\'') {
        if (c.i + 1 < c.s.length && c.s.charAt(c.i + 1) == '\'') { sb.append('\''); c.i += 2 }
        else { c.i += 1; done = true }
      } else { sb.append(ch); c.i += 1 }
    }
    sb.toString
  }

  // ----------------------------------------------------------- coercion

  /** Type-check and coerce one raw row against the table schema,
    * mirroring the writer's enforcement (`parquet_writer.rs:120-218`):
    * strict on mismatch, Long→Double widening in Float columns, string
    * timestamps parsed as UTC wall-clock. A NULL in a NOT NULL column
    * is rejected HERE with a clear error — the reference appends the
    * null (`parquet_writer.rs:140,151,...`) and then panics deep inside
    * `RecordBatch::try_new` when the non-nullable arrow field sees it;
    * we surface the same hard failure at the parser boundary instead of
    * a confusing downstream parquet-write error. */
  /** Per-row permutation from an INSERT's value order to schema order.
    *
    * Positional insert (no column list) → identity; [[coerceRow]]
    * still checks the arity. With a column list: statement-level
    * validation happens HERE, eagerly (unknown column → the values
    * cannot be placed; duplicate column → ambiguous assignment — both
    * fail the statement), while per-row arity is checked inside the
    * returned function so quarantine mode can drop just the bad row.
    * Schema columns absent from the list become NULL — MySQL's
    * implicit-default behavior for DEFAULT NULL columns; a NOT NULL
    * column left unlisted is then rejected row-by-row by
    * [[coerceRow]]'s non-null check, which is the "error on missing"
    * half of honoring the list. */
  def rowAligner(ins: InsertInto, schema: StructType): Array[Any] => Array[Any] = {
    if (ins.columns.isEmpty) identity
    else {
      val cols = ins.columns
      val schemaIdx = schema.fieldNames.zipWithIndex.toMap
      val unknown = cols.filterNot(schemaIdx.contains)
      if (unknown.nonEmpty)
        fail(s"table ${ins.table}: INSERT column list names unknown column(s) " +
          s"${unknown.mkString(", ")} (schema: ${schema.fieldNames.mkString(", ")})")
      if (cols.distinct.length != cols.length)
        fail(s"table ${ins.table}: INSERT column list repeats a column: ${cols.mkString(", ")}")
      val target = cols.map(schemaIdx).toArray
      raw => {
        if (raw.length != cols.length)
          fail(s"table ${ins.table}: row has ${raw.length} values but INSERT " +
            s"column list has ${cols.length} columns")
        val out = new Array[Any](schema.length)
        var i = 0
        while (i < raw.length) { out(target(i)) = raw(i); i += 1 }
        out
      }
    }
  }

  def coerceRow(table: String, schema: StructType, raw: Array[Any]): org.apache.spark.sql.Row = {
    if (raw.length != schema.length)
      fail(s"table $table: row has ${raw.length} values but schema has ${schema.length} columns")
    val out = new Array[Any](raw.length)
    var i = 0
    while (i < raw.length) {
      val f = schema(i)
      val v = raw(i)
      if (v == null && !f.nullable)
        fail(s"table $table column ${f.name}: NULL in NOT NULL column")
      out(i) =
        if (v == null) null
        else f.dataType match {
          case LongType => v match {
            case l: java.lang.Long => l
            case b: java.math.BigDecimal =>
              // a > i64 literal (admitted by the unsigned-decimal mode)
              // landing in a plain bigint column is still an overflow
              fail(s"table $table column ${f.name}: integer out of i64 range: $b")
            case other => fail(s"table $table column ${f.name}: expected integer, got $other")
          }
          case dt: DecimalType if dt.precision == 20 && dt.scale == 0 => v match {
            // BIGINT UNSIGNED via TypeOptions.unsignedBigintDecimal:
            // anything integral in [0, u64::MAX]
            case l: java.lang.Long if l >= 0L => java.math.BigDecimal.valueOf(l)
            case l: java.lang.Long =>
              fail(s"table $table column ${f.name}: negative value $l in UNSIGNED column")
            case b: java.math.BigDecimal
                if b.signum() >= 0 && b.compareTo(U64Max) <= 0 =>
              b
            case b: java.math.BigDecimal =>
              fail(s"table $table column ${f.name}: integer out of u64 range: $b")
            case other => fail(s"table $table column ${f.name}: expected integer, got $other")
          }
          case DoubleType => v match {
            case d: java.lang.Double => d
            case l: java.lang.Long   => java.lang.Double.valueOf(l.doubleValue())
            case other => fail(s"table $table column ${f.name}: expected float, got $other")
          }
          case StringType => v match {
            case s: String => s
            case other => fail(s"table $table column ${f.name}: expected string, got $other")
          }
          case TimestampType => v match {
            case s: String => parseTimestamp(s, table, f.name)
            case other => fail(s"table $table column ${f.name}: expected timestamp string, got $other")
          }
          case DateType => v match {
            // TypeOptions.dateAsDate: 'YYYY-MM-DD' only — a DATE column
            // carrying a time component is a schema lie we refuse
            case s: String =>
              try java.sql.Date.valueOf(LocalDate.parse(s))
              catch {
                case e: java.time.format.DateTimeParseException =>
                  fail(s"table $table column ${f.name}: cannot parse date '$s': ${e.getMessage}")
              }
            case other => fail(s"table $table column ${f.name}: expected date string, got $other")
          }
          case BooleanType => v match {
            case b: java.lang.Boolean => b
            case l: java.lang.Long if l == 0L || l == 1L => java.lang.Boolean.valueOf(l == 1L)
            case other => fail(s"table $table column ${f.name}: expected boolean, got $other")
          }
          case other => fail(s"table $table column ${f.name}: unsupported type $other")
        }
      i += 1
    }
    org.apache.spark.sql.Row.fromSeq(out.toIndexedSeq)
  }

  /** 'YYYY-MM-DD[ HH:MM:SS[.ffffff]]' as UTC wall-clock →
    * java.sql.Timestamp anchored via Instant (timezone-independent).
    *
    * Also accepts a bare TIME-of-day 'HH:MM:SS[.ffffff]', anchored to
    * 1970-01-01 — the THIRD deliberate deviation from a reference
    * panic: `TIME` is an accepted DDL type (`line_parser.rs:158-161`)
    * but a time value slices `value[11..13]` out of bounds in the
    * fixed-offset parse (`parquet_writer.rs:173-192`), so no TIME
    * column survives the reference end-to-end (same class of hole as
    * Boolean schemas and DATE-only values, both already fixed). The
    * epoch-day anchor mirrors the DATE→midnight rule: the stored
    * instant carries exactly the information the literal had. */
  def parseTimestamp(s: String, table: String, column: String): java.sql.Timestamp = {
    try {
      val ldt =
        if (s.length >= 8 && s.charAt(2) == ':')
          java.time.LocalTime.parse(s).atDate(LocalDate.ofEpochDay(0))
        else if (s.length <= 10) LocalDate.parse(s).atStartOfDay()
        else LocalDateTime.parse(s.replace(' ', 'T'))
      java.sql.Timestamp.from(ldt.toInstant(ZoneOffset.UTC))
    } catch {
      case e: java.time.format.DateTimeParseException =>
        fail(s"table $table column $column: cannot parse timestamp '$s': ${e.getMessage}")
    }
  }
}
