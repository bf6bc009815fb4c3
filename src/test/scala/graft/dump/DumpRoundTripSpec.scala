package graft.dump

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property round-trips: random (schema, rows) → rendered mysqldump →
  * StatementReader + DumpParser → identical rows. Pure JVM (no Spark
  * job) so hundreds of cases run in seconds. */
class DumpRoundTripSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  val genType: Gen[DataType] =
    Gen.oneOf(LongType, DoubleType, StringType, TimestampType, BooleanType)

  // strings exercising the tokenizer: quotes, escapes, semicolons,
  // unicode, and the torture corners — NUL/SUB control bytes (rendered
  // as \0 / \Z), emoji and astral-plane chars hard against quote or
  // escape boundaries, and `);`-lookalikes that mimic statement ends
  val genString: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(20)),
    Gen.oneOf("it's", "a;b", "c''d", "tab\there", "nl\nline", "back\\slash",
      "quote'and;semi", "naïve-ünïcode", "",
      "nul\u0000mid", "\u0000", "\u001a", "eof\u001amark\u0000",
      "😀", "'😀", "😀'", "🦀\\🎉", "𝕊𝕡𝕒𝕣𝕜", "emoji😀);'fake",
      "');", ");", "end);", "values (');\\n",
      "\u0000');\u001a"),
  )

  def genValue(dt: DataType): Gen[Any] = {
    val v: Gen[Any] = dt match {
      case LongType    => Gen.chooseNum(Long.MinValue + 1, Long.MaxValue).map(Long.box)
      case DoubleType  => Gen.chooseNum(-1e6, 1e6).map(d => Double.box(math.rint(d * 100) / 100))
      case StringType  => genString
      case BooleanType => Gen.oneOf(true, false).map(Boolean.box)
      case TimestampType => Gen.chooseNum(0L, 4102444800L).map(sec =>
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)))
      case other => throw new MatchError(other)
    }
    Gen.frequency(8 -> v, 2 -> Gen.const(null))
  }

  val genTable: Gen[(StructType, List[Row])] = for {
    nCols <- Gen.chooseNum(1, 6)
    types <- Gen.listOfN(nCols, genType)
    schema = StructType(types.zipWithIndex.map {
      case (dt, i) => StructField(s"c$i", dt, nullable = true)
    })
    nRows <- Gen.chooseNum(0, 30)
    rows <- Gen.listOfN(nRows, Gen.sequence[List[Any], Any](types.map(genValue))
      .map(vs => Row.fromSeq(vs)))
  } yield (schema, rows)

  test("render → assemble → parse → coerce reproduces every row") {
    checkProp(Prop.forAll(genTable) { case (schema, rows) =>
      val text = DumpRenderer.dump(Seq(("t", schema, rows)), batchSize = 7)
      val stmts = StatementReader.statements(text.linesIterator).toList
      val creates = stmts.filter(_.startsWith("CREATE TABLE"))
      val parsedSchema = DumpParser.parseCreateTable(creates.head).schema
      val got = stmts.filter(_.startsWith("INSERT INTO")).flatMap { s =>
        DumpParser.parseInsert(s).rows.map(DumpParser.coerceRow("t", parsedSchema, _))
      }
      (parsedSchema.length == schema.length) :| "schema arity" &&
        (got == rows) :| s"rows: got=${got.take(3)} want=${rows.take(3)}"
    })
  }

  test("TIME column round-trips: DDL accepts TIME, values anchor to 1970-01-01") {
    // Deviation 3 (see DumpParser.parseTimestamp): the reference accepts
    // TIME in DDL (line_parser.rs:158-161) but panics on any value.
    val text =
      """CREATE TABLE `t` (`clock` time, `note` varchar(10));
        |INSERT INTO `t` VALUES ('00:00:01','a'),('23:59:59','b'),(NULL,'c');
        |""".stripMargin
    val stmts = StatementReader.statements(text.linesIterator).toList
    val schema = DumpParser.parseCreateTable(stmts.head).schema
    assert(schema("clock").dataType == TimestampType)
    val rows = stmts.filter(_.startsWith("INSERT INTO")).flatMap { s =>
      DumpParser.parseInsert(s).rows.map(DumpParser.coerceRow("t", schema, _))
    }
    val secs = rows.map(r => Option(r.get(0))
      .map(_.asInstanceOf[java.sql.Timestamp].toInstant.getEpochSecond))
    assert(secs == List(Some(1L), Some(86399L), None))
  }

  test("column-list round-trip: shuffled INSERT order reproduces every row in schema order") {
    // The reference ignores column lists (line_parser.rs:200-272);
    // rowAligner honors them — so a dump whose INSERTs list columns in
    // ANY permutation must still land every value in its named column.
    val genCase = for {
      (schema, rows) <- genTable
      seed <- Gen.chooseNum(0L, Long.MaxValue)
      perm = new scala.util.Random(seed).shuffle(schema.fieldNames.toList)
    } yield (schema, rows, perm)
    checkProp(Prop.forAll(genCase) { case (schema, rows, perm) =>
      val idx = perm.map(schema.fieldIndex)
      val text = new StringBuilder()
        .append(DumpRenderer.createTable("t", schema)).append("\n")
        .append(rows.grouped(7).map(b =>
          DumpRenderer.insert("t",
            b.map(r => Row.fromSeq(idx.map(r.get))), perm)).mkString("\n"))
        .toString
      val stmts = StatementReader.statements(text.linesIterator).toList
      val parsedSchema = DumpParser.parseCreateTable(
        stmts.find(_.startsWith("CREATE TABLE")).get).schema
      val got = stmts.filter(_.startsWith("INSERT INTO")).flatMap { s =>
        val ins = DumpParser.parseInsert(s)
        val align = DumpParser.rowAligner(ins, parsedSchema)
        ins.rows.map(v => DumpParser.coerceRow("t", parsedSchema, align(v)))
      }
      (got == rows) :| s"rows: got=${got.take(3)} want=${rows.take(3)} perm=$perm"
    })
  }

  test("statement splitter never splits inside string literals") {
    checkProp(Prop.forAll(Gen.listOfN(5, genString)) { strs =>
      val rows = strs.map(s => Row(s))
      val schema = StructType(Seq(StructField("s", StringType)))
      val text = DumpRenderer.dump(Seq(("t", schema, rows)), batchSize = 2)
      val stmts = StatementReader.statements(text.linesIterator).toList
      val got = stmts.filter(_.startsWith("INSERT INTO")).flatMap { s =>
        DumpParser.parseInsert(s).rows.map(_(0))
      }
      got == strs
    })
  }
}
