package graft.dump

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's own unit tests
  * (`/root/reference/src/main.rs:183-218`,
  * `line_parser.rs:287-397`) plus the SURVEY.md §1.2 semantic quirks. */
class DumpParserSpec extends AnyFunSuite {

  // --- cleanup_key: the 7 reference cases (main.rs:188-217)
  val cleanupCases = Seq(
    "KEY `facebookConnectId_index` (`facebookConnectId`)" ->
      "KEY `facebookConnectId_index` (`facebookConnectId`)",
    "KEY `facebookConnectId_index` (`facebookConnectId`(144))" ->
      "KEY `facebookConnectId_index` (`facebookConnectId`)",
    "KEY `facebookConnectId_index` (`facebookConnectId`(144),`plop`)" ->
      "KEY `facebookConnectId_index` (`facebookConnectId`,`plop`)",
    "KEY `facebookConnectId_index` (`facebookConnectId`(144),`plop`(12))" ->
      "KEY `facebookConnectId_index` (`facebookConnectId`,`plop`)",
    "KEY `facebookConnectId_index` (`facebookConnectId`,`plop`(12))" ->
      "KEY `facebookConnectId_index` (`facebookConnectId`,`plop`)",
    "FOREIGN KEY (`facebookConnectId`)" -> "FOREIGN KEY (`facebookConnectId`)",
    "FOREIGN KEY (`facebookConnectId`(144))" -> "FOREIGN KEY (`facebookConnectId`)",
  )
  test("cleanupKey: reference cases") {
    cleanupCases.foreach { case (in, want) =>
      assert(StatementReader.cleanupKey(in) == want, s"input: $in")
    }
  }

  // --- parse_create_table (line_parser.rs:330-397 / FIXTURES.md A1)
  val createFixture =
    """CREATE TABLE `user` (
      |  `id` bigint NOT NULL,
      |  `shortName` varchar(255) CHARACTER SET utf8mb3 COLLATE utf8mb3_bin NOT NULL,
      |  `avatarUuid` varchar(36) CHARACTER SET utf8mb3 COLLATE utf8mb3_bin DEFAULT NULL,
      |  `registrationDate` timestamp NOT NULL DEFAULT CURRENT_TIMESTAMP,
      |  `premiumExpirationDate` timestamp NULL DEFAULT NULL,
      |  `excluded` tinyint(1) NOT NULL DEFAULT '0',
      |  `company_lid` bigint DEFAULT NULL,
      |  PRIMARY KEY (`lid`),
      |  UNIQUE KEY `email_index` (`email`),
      |  UNIQUE KEY `tel_key` (`tel`),
      |  KEY `authKey_index` (`authKey`),
      |  KEY `name_index` (`shortName`),
      |  KEY `registrationDate_index` (`registrationDate`),
      |  KEY `country_index` (`country`),
      |  KEY `company_lid` (`company_lid`),
      |  KEY `premiumExpirationDate` (`premiumExpirationDate`),
      |  CONSTRAINT `user_ibfk_1` FOREIGN KEY (`company_lid`) REFERENCES `company` (`lid`)
      |) ENGINE=InnoDB DEFAULT CHARSET=utf8mb3 COLLATE=utf8mb3_bin;""".stripMargin

  test("parseCreateTable: reference user fixture (assembled through StatementReader)") {
    val stmts = StatementReader.statements(createFixture.linesIterator).toList
    assert(stmts.size == 1)
    val ct = DumpParser.parseCreateTable(stmts.head)
    assert(ct.table == "user")
    val want = Seq(
      ("id", LongType, false),
      ("shortname", StringType, false),
      ("avataruuid", StringType, true),
      ("registrationdate", TimestampType, false),
      ("premiumexpirationdate", TimestampType, true),
      ("excluded", LongType, false), // tinyint(1) is NOT boolean (line_parser.rs:130-131)
      ("company_lid", LongType, true),
    )
    assert(ct.schema.fields.toSeq.map(f => (f.name, f.dataType, f.nullable)) == want)
  }

  // --- parse_insert_into (line_parser.rs:287-329 / FIXTURES.md A2)
  test("parseInsert: reference extended-INSERT fixture") {
    val stmt = "INSERT INTO `user` VALUES (1, 'foobar', NULL, '2012-01-02 12:55:22', 0)," +
      "(1, 'foobar', NULL, '2012-01-02 12:55:22', 0)," +
      "(1, 'foobar', NULL, '2012-01-02 12:55:22', 0)," +
      "(1, 'foobar', NULL, '2012-01-02 12:55:22', -123);"
    val ins = DumpParser.parseInsert(stmt)
    assert(ins.table == "user")
    assert(ins.rows.size == 4)
    assert(ins.rows(0).toSeq == Seq(1L, "foobar", null, "2012-01-02 12:55:22", 0L))
    assert(ins.rows(3).toSeq == Seq(1L, "foobar", null, "2012-01-02 12:55:22", -123L))
  }

  // --- §1.2 quirks
  test("DECIMAL maps to LongType; integral values pass, fractional error") {
    val ct = DumpParser.parseCreateTable("CREATE TABLE `t` (`d` decimal(10,2));")
    assert(ct.schema("d").dataType == LongType)
    val ok = DumpParser.parseInsert("INSERT INTO `t` VALUES (12);")
    assert(DumpParser.coerceRow("t", ct.schema, ok.rows.head).get(0) == 12L)
    val bad = DumpParser.parseInsert("INSERT INTO `t` VALUES (12.34);")
    assertThrows[DumpParser.DumpParseException](
      DumpParser.coerceRow("t", ct.schema, bad.rows.head))
  }

  test("BOOLEAN columns are supported (deviation: reference panics)") {
    val ct = DumpParser.parseCreateTable("CREATE TABLE `t` (`b` BOOL, `c` boolean NOT NULL);")
    assert(ct.schema("b").dataType == BooleanType && ct.schema("b").nullable)
    assert(!ct.schema("c").nullable)
    val ins = DumpParser.parseInsert("INSERT INTO `t` VALUES (TRUE, false),(0, 1);")
    val r0 = DumpParser.coerceRow("t", ct.schema, ins.rows(0))
    val r1 = DumpParser.coerceRow("t", ct.schema, ins.rows(1))
    assert(r0.getBoolean(0) && !r0.getBoolean(1))
    assert(!r1.getBoolean(0) && r1.getBoolean(1))
  }

  test("integer literal widens to Double in Float column (parquet_writer.rs:162)") {
    val ct = DumpParser.parseCreateTable("CREATE TABLE `t` (`f` double);")
    val ins = DumpParser.parseInsert("INSERT INTO `t` VALUES (3),(4.5),(-2.5e2);")
    val rows = ins.rows.map(DumpParser.coerceRow("t", ct.schema, _))
    assert(rows.map(_.get(0)) == Seq(3.0, 4.5, -250.0))
  }

  test("timestamps parse as UTC wall-clock; date-only midnight-pads (deviation)") {
    val ts = DumpParser.parseTimestamp("2012-01-02 12:55:22", "t", "c")
    assert(ts.toInstant.getEpochSecond == 1325508922L) // 2012-01-02T12:55:22Z
    val d = DumpParser.parseTimestamp("2012-01-02", "t", "c")
    assert(d.toInstant.getEpochSecond == 1325462400L) // midnight UTC
    val frac = DumpParser.parseTimestamp("2012-01-02 12:55:22.125", "t", "c")
    assert(frac.toInstant.getNano == 125000000)
    // TIME-of-day anchors to 1970-01-01 (deviation 3: the reference
    // panics on the value[11..13] slice, parquet_writer.rs:173-192)
    val t = DumpParser.parseTimestamp("12:34:56", "t", "c")
    assert(t.toInstant.getEpochSecond == 12 * 3600 + 34 * 60 + 56)
    val tf = DumpParser.parseTimestamp("12:34:56.5", "t", "c")
    assert(tf.toInstant.getNano == 500000000)
  }

  test("NULL in NOT NULL column fails at coercion with a clear error") {
    val ct = DumpParser.parseCreateTable("CREATE TABLE `t` (`id` int NOT NULL, `x` int);")
    val ok = DumpParser.parseInsert("INSERT INTO `t` VALUES (1, NULL);")
    assert(DumpParser.coerceRow("t", ct.schema, ok.rows.head).get(1) == null)
    val bad = DumpParser.parseInsert("INSERT INTO `t` VALUES (NULL, 2);")
    val e = intercept[DumpParser.DumpParseException](
      DumpParser.coerceRow("t", ct.schema, bad.rows.head))
    assert(e.getMessage.contains("NULL in NOT NULL"))
  }

  test("renderer emits fractional seconds; round-trips through the parser losslessly") {
    val t = java.sql.Timestamp.from(java.time.Instant.parse("2012-01-02T12:55:22.123456Z"))
    val lit = DumpRenderer.literal(t)
    assert(lit == "'2012-01-02 12:55:22.123456'")
    val back = DumpParser.parseTimestamp(lit.stripPrefix("'").stripSuffix("'"), "t", "c")
    assert(back == t)
    // whole seconds stay in the compact mysqldump form
    val w = java.sql.Timestamp.from(java.time.Instant.parse("2012-01-02T12:55:22Z"))
    assert(DumpRenderer.literal(w) == "'2012-01-02 12:55:22'")
  }

  test("column names lowercased; nullability: NOT NULL, inline PRIMARY KEY, first-wins") {
    val ct = DumpParser.parseCreateTable(
      "CREATE TABLE `T` (`Id` int PRIMARY KEY, `A` int NOT NULL NULL, `B` int NULL NOT NULL, `C` int DEFAULT NULL);")
    val f = ct.schema
    assert(f.fieldNames.toSeq == Seq("id", "a", "b", "c"))
    assert(!f("id").nullable)  // inline PRIMARY KEY
    assert(!f("a").nullable)   // NOT NULL first
    assert(f("b").nullable)    // NULL first wins over later NOT NULL
    assert(f("c").nullable)    // DEFAULT NULL is not a NULL option
  }

  test("unsigned bigint above i64 range errors (line_parser.rs:247)") {
    assertThrows[DumpParser.DumpParseException](
      DumpParser.parseInsert("INSERT INTO `t` VALUES (99999999999999999999);"))
  }

  test("unknown column type errors") {
    assertThrows[DumpParser.DumpParseException](
      DumpParser.parseCreateTable("CREATE TABLE `t` (`g` geometry);"))
  }

  test("string escapes: backslash quote, doubled quote, newline, semicolon in string") {
    val ins = DumpParser.parseInsert(
      """INSERT INTO `t` VALUES ('a\'b'),('c''d'),('x\ny'),('end; not a terminator'),('back\\slash');""")
    assert(ins.rows.map(_(0)) == Vector("a'b", "c'd", "x\ny", "end; not a terminator", "back\\slash"))
  }

  test("ENUM type with quoted args containing commas/parens") {
    val ct = DumpParser.parseCreateTable(
      "CREATE TABLE `t` (`e` enum('a,b','c)d','e''f') NOT NULL, `x` int);")
    assert(ct.schema("e").dataType == StringType && !ct.schema("e").nullable)
    assert(ct.schema.fieldNames.toSeq == Seq("e", "x"))
  }

  test("statement assembler: comment filtering, noise statements dropped, no-separator join") {
    val dump =
      """-- comment line
        |/*!40101 SET something */;
        |
        |DROP TABLE IF EXISTS `t`;
        |LOCK TABLES `t` WRITE;
        |CREATE TABLE `t` (
        |  `a` int,
        |  KEY `k` (`a`(10))
        |);
        |INSERT INTO `t` VALUES (1),(2);
        |UNLOCK TABLES;
        |""".stripMargin
    val stmts = StatementReader.statements(dump.linesIterator).toList
    assert(stmts.size == 2)
    assert(stmts.head == "CREATE TABLE `t` (`a` int,KEY `k` (`a`));")
    assert(stmts(1) == "INSERT INTO `t` VALUES (1),(2);")
  }

  test("quote-aware terminator: trailing ; inside an open literal does not split") {
    // A statement whose literal spans lines would break the reference;
    // our quote-parity guard keeps accumulating.
    val lines = Seq("INSERT INTO `t` VALUES ('multi;", "line');")
    val stmts = StatementReader.statements(lines.iterator).toList
    assert(stmts == List("INSERT INTO `t` VALUES ('multi;line');"))
  }

  test("exotic escapes: \\0, \\Z, \\t, \\b survive a value round-trip") {
    val ins = DumpParser.parseInsert(
      """INSERT INTO `t` VALUES ('nul\0byte'),('eof\Zmark'),('tab\there'),('bell\bring');""")
    assert(ins.rows.map(_(0)) == Vector(
      "nul\u0000byte", "eof\u001amark", "tab\there", "bell\bring"))
  }

  test("charset introducers: _binary and _utf8mb4 literals parse as their string body (deviation)") {
    // The reference bails on introducer literals (line_parser.rs:256
    // `Unsupported syntax for value`); real mysqldump emits `_binary`
    // for binary columns by default.
    val ins = DumpParser.parseInsert(
      """INSERT INTO `t` VALUES (_binary 'raw\0bytes', 1),(_utf8mb4 'héllo wörld', 2),(_latin1'tight', 3);""")
    assert(ins.rows.map(_(0)) == Vector("raw\u0000bytes", "héllo wörld", "tight"))
    assert(ins.rows.map(_(1)) == Vector(1L, 2L, 3L))
  }

  test("hex literals: 0xHEX and X'HEX' decode as UTF-8 bytes (deviation, --hex-blob)") {
    val ins = DumpParser.parseInsert(
      "INSERT INTO `t` VALUES (0x48656C6C6F, X'776F726C64', x'21', 0xA, 0, 10);")
    assert(ins.rows.head.toSeq == Seq("Hello", "world", "!", "\n", 0L, 10L))
    // unterminated X'... errors rather than silently truncating
    assertThrows[DumpParser.DumpParseException](
      DumpParser.parseInsert("INSERT INTO `t` VALUES (X'4848);"))
  }

  test("multibyte content adjacent to quote boundaries and escapes") {
    val ins = DumpParser.parseInsert(
      """INSERT INTO `t` VALUES ('😀'),('🦀\'🎉'),('naïve''ünïcode'),('𝕊𝕡𝕒𝕣𝕜\n𝕊𝕢𝕃');""")
    assert(ins.rows.map(_(0)) == Vector(
      "😀", "🦀'🎉", "naïve'ünïcode", "𝕊𝕡𝕒𝕣𝕜\n𝕊𝕢𝕃"))
  }

  // ------------------------------------------ opt-in type extensions

  private val typed = DumpParser.TypeOptions(
    dateAsDate = true, unsignedBigintDecimal = true)

  test("date-as-date: DATE maps to DateType only under the flag; values coerce strictly") {
    val ddl = "CREATE TABLE `t` (`d` date, `ts` datetime);"
    assert(DumpParser.parseCreateTable(ddl).schema("d").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val s = DumpParser.parseCreateTable(ddl, typed).schema
    assert(s("d").dataType == org.apache.spark.sql.types.DateType)
    assert(s("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val row = DumpParser.coerceRow("t", s,
      Array[Any]("2024-02-29", "2024-02-29 10:11:12"))
    assert(row.get(0) == java.sql.Date.valueOf("2024-02-29"))
    // a time component in a DATE column is refused, not truncated
    val e = intercept[DumpParser.DumpParseException](
      DumpParser.coerceRow("t", s, Array[Any]("2024-02-29 10:11:12", null)))
    assert(e.getMessage.contains("cannot parse date"))
  }

  test("unsigned-decimal: BIGINT UNSIGNED maps to DECIMAL(20,0) and > i64 values convert") {
    val ddl = "CREATE TABLE `t` (`u` bigint unsigned, `s` bigint, `iu` int unsigned);"
    val plain = DumpParser.parseCreateTable(ddl).schema
    assert(plain("u").dataType == org.apache.spark.sql.types.LongType)
    val s = DumpParser.parseCreateTable(ddl, typed).schema
    assert(s("u").dataType == org.apache.spark.sql.types.DecimalType(20, 0))
    assert(s("s").dataType == org.apache.spark.sql.types.LongType)
    // only BIGINT widens; smaller unsigned ints already fit in i64
    assert(s("iu").dataType == org.apache.spark.sql.types.LongType)

    val ins = DumpParser.parseInsert(
      "INSERT INTO `t` VALUES (18446744073709551615, 7, 1);", typed)
    val row = DumpParser.coerceRow("t", s, ins.rows.head)
    assert(row.get(0) == new java.math.BigDecimal("18446744073709551615"))
    assert(row.get(1) == 7L)
    // in-range longs still coerce into the decimal column
    assert(DumpParser.coerceRow("t", s, Array[Any](5L, 1L, 1L)).get(0) ==
      java.math.BigDecimal.valueOf(5L))
  }

  test("unsigned-decimal range enforcement: u64 overflow, negatives, i64 columns") {
    val s = DumpParser.parseCreateTable(
      "CREATE TABLE `t` (`u` bigint unsigned, `s` bigint);", typed).schema
    // above u64::MAX errors even in decimal mode
    val big = DumpParser.parseInsert(
      "INSERT INTO `t` VALUES (18446744073709551616, 1);", typed)
    assert(intercept[DumpParser.DumpParseException](
      DumpParser.coerceRow("t", s, big.rows.head)).getMessage.contains("out of u64 range"))
    // negative into UNSIGNED errors
    val neg = DumpParser.parseInsert("INSERT INTO `t` VALUES (-1, 1);", typed)
    assert(intercept[DumpParser.DumpParseException](
      DumpParser.coerceRow("t", s, neg.rows.head)).getMessage.contains("negative"))
    // a > i64 literal admitted by the mode but landing in a PLAIN
    // bigint column is still the reference's overflow error
    val wide = DumpParser.parseInsert(
      "INSERT INTO `t` VALUES (1, 99999999999999999999);", typed)
    assert(intercept[DumpParser.DumpParseException](
      DumpParser.coerceRow("t", s, wide.rows.head)).getMessage.contains("out of i64 range"))
    // and WITHOUT the flag the literal itself still fails at parse
    // time (reference parity, line_parser.rs:247)
    assertThrows[DumpParser.DumpParseException](
      DumpParser.parseInsert("INSERT INTO `t` VALUES (99999999999999999999, 1);"))
  }

  // --- INSERT column lists (deviation: reference ignores them,
  //     line_parser.rs:200-272 — positional assignment of a reordered
  //     list is silently wrong data)

  val clSchema = DumpParser.parseCreateTable(
    "CREATE TABLE `t` (`a` bigint, `b` varchar(10), `c` double, `d` bigint NOT NULL);").schema

  private def aligned(stmt: String) = {
    val ins = DumpParser.parseInsert(stmt)
    val align = DumpParser.rowAligner(ins, clSchema)
    ins.rows.map(v => DumpParser.coerceRow("t", clSchema, align(v)))
  }

  test("column list: reordered list maps values by name, not position") {
    val rows = aligned("INSERT INTO `t` (`c`, `a`, `d`, `b`) VALUES (1.5, 7, 9, 'x'),(2.5, 8, 10, 'y');")
    assert(rows(0).toSeq == Seq(7L, "x", 1.5, 9L))
    assert(rows(1).toSeq == Seq(8L, "y", 2.5, 10L))
  }

  test("column list: partial list leaves unlisted nullable columns NULL") {
    val rows = aligned("INSERT INTO `t` (`d`, `a`) VALUES (1, 2);")
    assert(rows(0).toSeq == Seq(2L, null, null, 1L))
  }

  test("column list: case-insensitive and bare identifiers match lowercased schema names") {
    val rows = aligned("INSERT INTO `t` (D, A, B, C) VALUES (1, 2, 'z', 0.5);")
    assert(rows(0).toSeq == Seq(2L, "z", 0.5, 1L))
  }

  test("column list: unlisted NOT NULL column is rejected (error on missing)") {
    assert(intercept[DumpParser.DumpParseException](
      aligned("INSERT INTO `t` (`a`) VALUES (1);")).getMessage.contains("NOT NULL"))
  }

  test("column list: unknown column errors at statement level") {
    assert(intercept[DumpParser.DumpParseException](
      aligned("INSERT INTO `t` (`a`, `nope`, `d`) VALUES (1, 2, 3);"))
      .getMessage.contains("unknown column"))
  }

  test("column list: duplicate column errors at statement level") {
    assert(intercept[DumpParser.DumpParseException](
      aligned("INSERT INTO `t` (`a`, `a`, `d`) VALUES (1, 2, 3);"))
      .getMessage.contains("repeats"))
  }

  test("column list: row arity must match the LIST, not the schema") {
    assert(intercept[DumpParser.DumpParseException](
      aligned("INSERT INTO `t` (`a`, `d`) VALUES (1, 2, 3);"))
      .getMessage.contains("column list"))
    // and a list covering the whole schema still checks per-row arity
    assert(intercept[DumpParser.DumpParseException](
      aligned("INSERT INTO `t` (`a`, `b`, `c`, `d`) VALUES (1, 'x', 0.5);"))
      .getMessage.contains("column list"))
  }

  test("column list: list-less INSERT stays positional (reference parity)") {
    val ins = DumpParser.parseInsert("INSERT INTO `t` VALUES (1, 'x', 0.5, 2);")
    assert(ins.columns.isEmpty)
    val align = DumpParser.rowAligner(ins, clSchema)
    assert(DumpParser.coerceRow("t", clSchema, align(ins.rows.head)).toSeq ==
      Seq(1L, "x", 0.5, 2L))
  }
}
