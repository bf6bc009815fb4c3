package graft.dump

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class DumpConverterSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  val userSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("balance", DoubleType, nullable = true),
    StructField("created", TimestampType, nullable = true),
    StructField("active", BooleanType, nullable = true),
  ))
  val ts = java.sql.Timestamp.from(java.time.Instant.parse("2012-01-02T12:55:22Z"))
  val userRows = Seq(
    Row(1L, "alice", 10.5, ts, true),
    Row(2L, "bo'b; special \\ chars\nnewline", -3.0, ts, false),
    Row(3L, null, null, null, null),
  )

  test("end-to-end: render dump → convert → read back identical rows") {
    val in = tmpDir("dump-in")
    val out = tmpDir("dump-out")
    val text = DumpRenderer.dump(Seq(("user", userSchema, userRows)), batchSize = 2)
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out)
    assert(res.tables == Seq("user"))
    assert(res.rowsWritten("user") == 3)
    val back = spark.read.parquet(s"$out/user").collect().sortBy(_.getLong(0))
    assert(back.toSeq == userRows)
    // schema parity: lowercased names, types, nullability from DDL
    val schema = spark.read.parquet(s"$out/user").schema
    assert(schema.fieldNames.toSeq == userSchema.fieldNames.toSeq)
    assert(schema("id").dataType == LongType)
    assert(schema("active").dataType == BooleanType)
  }

  test("gzip input converts identically") {
    val in = tmpDir("dump-gz-in")
    val out = tmpDir("dump-gz-out")
    val text = DumpRenderer.dump(Seq(("user", userSchema, userRows)))
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$in/dump.sql.gz"))
    gz.write(text.getBytes("UTF-8")); gz.close()
    val res = DumpConverter.convert(spark, s"$in/dump.sql.gz", out)
    assert(res.rowsWritten("user") == 3)
    assert(spark.read.parquet(s"$out/user").count() == 3)
  }

  test("bz2 input SPLITS: parallel partitions parse one compressed file (vs gzip's 1)") {
    // The reference reads gzip strictly sequentially (its only
    // compressed path); Hadoop's bzip2 codec is block-splittable, so
    // the same sc.textFile ingest parallelizes a compressed dump with
    // zero converter changes. blockSize=1 → 100 KB bzip2 blocks, so a
    // ~1 MB dump holds many split points.
    val in = tmpDir("dump-bz2-in")
    val outPlain = tmpDir("dump-bz2-out-plain")
    val outBz = tmpDir("dump-bz2-out-bz")
    val manyRows = (1L to 20000L).map { i =>
      Row(i, s"user_$i name-with-some-padding-$i", i * 1.5, ts, i % 2 == 0)
    }
    val text = DumpRenderer.dump(Seq(("user", userSchema, manyRows)), batchSize = 100)
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    val bz = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(
      new java.io.FileOutputStream(s"$in/dump.sql.bz2"), 1)
    bz.write(text.getBytes("UTF-8")); bz.close()

    // >1 input split must actually carry lines — the splittability claim
    val perPart = spark.sparkContext.textFile(s"$in/dump.sql.bz2", 8)
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().filter(_._2 > 0)
    assert(perPart.length > 1,
      s"bzip2 ingest must parse from multiple partitions, got $perPart")

    // and the parallel compressed convert is byte-identical to plain
    val resPlain = DumpConverter.convert(spark, s"$in/dump.sql", outPlain, minPartitions = 8)
    val resBz = DumpConverter.convert(spark, s"$in/dump.sql.bz2", outBz, minPartitions = 8)
    assert(resBz.rowsWritten("user") == 20000L)
    assert(resBz.rowsWritten == resPlain.rowsWritten)
    val a = spark.read.parquet(s"$outPlain/user").collect().sortBy(_.getLong(0))
    val b = spark.read.parquet(s"$outBz/user").collect().sortBy(_.getLong(0))
    assert(a.toSeq == b.toSeq)
  }

  test("zstd single-file input converts identically (sequential, like the reference's gzip)") {
    val in = tmpDir("dump-zst-in")
    val out = tmpDir("dump-zst-out")
    val text = DumpRenderer.dump(Seq(("user", userSchema, userRows)))
    val zo = new com.github.luben.zstd.ZstdOutputStreamNoFinalizer(
      new java.io.FileOutputStream(s"$in/dump.sql.zst"))
    zo.write(text.getBytes("UTF-8")); zo.close()
    val res = DumpConverter.convert(spark, s"$in/dump.sql.zst", out)
    assert(res.rowsWritten("user") == 3)
    val back = spark.read.parquet(s"$out/user").collect().sortBy(_.getLong(0))
    assert(back.toSeq == userRows)
  }

  test("zstd SHARDED input: one partition per shard file, heal across shard boundaries") {
    // zstd is not intra-file splittable (no SplittableCompressionCodec;
    // frame boundaries are invisible without decompressing), so the
    // scale unit is the shard file. A 4-shard dump must (a) read as 4
    // partitions in shard-name order and (b) convert byte-identically
    // to the unsharded plain text — including a statement deliberately
    // CUT ACROSS a shard boundary, which exercises the same healer as
    // intra-file partition splits.
    val in = tmpDir("dump-zshard-in")
    val outPlain = tmpDir("dump-zshard-out-plain")
    val outZ = tmpDir("dump-zshard-out-z")
    val manyRows = (1L to 2000L).map { i =>
      Row(i, s"user_$i", i * 1.5, ts, i % 2 == 0)
    }
    val text = DumpRenderer.dump(Seq(("user", userSchema, manyRows)), batchSize = 50)
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    // shard at LINE boundaries (shard files are line-aligned, like any
    // chunked `mysqldump | zstd` pipeline) — but put the first boundary
    // INSIDE the multi-line CREATE TABLE block so a statement spans
    // shard files and must be healed across them
    val lines = text.split("\n") // text ends in \n: exact reconstruction below
    val createStart = lines.indexWhere(_.startsWith("CREATE TABLE"))
    assert(createStart >= 0)
    val cut0 = createStart + 2 // mid-CREATE: statement spans shard 0 → 1
    val rest = lines.length - cut0
    val cuts = Seq(0, cut0, cut0 + rest / 3, cut0 + 2 * rest / 3, lines.length)
    val shardDir = tmpDir("dump-zshard-files")
    (0 until 4).foreach { k =>
      val chunk = lines.slice(cuts(k), cuts(k + 1)).map(_ + "\n").mkString
      val zo = new com.github.luben.zstd.ZstdOutputStreamNoFinalizer(
        new java.io.FileOutputStream(f"$shardDir/dump-$k%03d.sql.zst"))
      zo.write(chunk.getBytes("UTF-8")); zo.close()
    }
    val files = DumpConverter.expandInput(spark.sparkContext, shardDir)
    assert(files.map(f => f.substring(f.lastIndexOf('/') + 1)) ==
      (0 until 4).map(k => f"dump-$k%03d.sql.zst"))
    val rdd = DumpConverter.zstdLines(spark.sparkContext, files)
    assert(rdd.getNumPartitions == 4)
    val perPart = rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().filter(_._2 > 0)
    assert(perPart.length == 4, s"every shard must carry lines, got $perPart")

    val resPlain = DumpConverter.convert(spark, s"$in/dump.sql", outPlain)
    val resZ = DumpConverter.convert(spark, shardDir, outZ)
    assert(resZ.rowsWritten("user") == 2000L)
    assert(resZ.rowsWritten == resPlain.rowsWritten)
    assert(resZ.droppedInserts == 0)
    val a = spark.read.parquet(s"$outPlain/user").collect().sortBy(_.getLong(0))
    val b = spark.read.parquet(s"$outZ/user").collect().sortBy(_.getLong(0))
    assert(a.toSeq == b.toSeq)
  }

  test("multi-table dump with interleaved inserts (supported deviation) and unknown-table drop") {
    val in = tmpDir("dump-multi-in")
    val out = tmpDir("dump-multi-out")
    val text =
      """CREATE TABLE `a` (`x` int NOT NULL);
        |CREATE TABLE `b` (`y` varchar(10));
        |INSERT INTO `a` VALUES (1),(2);
        |INSERT INTO `b` VALUES ('p');
        |INSERT INTO `a` VALUES (3);
        |INSERT INTO `nosuch` VALUES (9);
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out)
    assert(res.tables.toSet == Set("a", "b"))
    assert(res.rowsWritten == Map("a" -> 3L, "b" -> 1L))
    assert(res.droppedInserts == 1)
  }

  test("--strict-tables restores the reference's warn-and-drop section routing") {
    val in = tmpDir("dump-strict-in")
    val out = tmpDir("dump-strict-out")
    // After `CREATE TABLE b` the current section is b: the interleaved
    // `INSERT INTO a VALUES (3)` and the unknown-table insert are both
    // dropped with the reference's stderr warning (parquet_writer.rs:93-95);
    // default mode keeps the interleaved row (previous test).
    val text =
      """CREATE TABLE `a` (`x` int NOT NULL);
        |INSERT INTO `a` VALUES (1),(2);
        |CREATE TABLE `b` (`y` varchar(10));
        |INSERT INTO `b` VALUES ('p');
        |INSERT INTO `a` VALUES (3);
        |INSERT INTO `nosuch` VALUES (9);
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out, strictTables = true)
    assert(res.tables.toSet == Set("a", "b"))
    assert(res.rowsWritten == Map("a" -> 2L, "b" -> 1L))
    assert(res.droppedInserts == 2)
    // and the same dump WITHOUT strict mode keeps the interleaved row
    val out2 = tmpDir("dump-strict-out2")
    val res2 = DumpConverter.convert(spark, s"$in/dump.sql", out2)
    assert(res2.rowsWritten == Map("a" -> 3L, "b" -> 1L))
    assert(res2.droppedInserts == 1)
  }

  test("partition-boundary healing: many partitions, multi-line CREATE TABLE") {
    val in = tmpDir("dump-part-in")
    val out = tmpDir("dump-part-out")
    // CREATE TABLE spanning many lines + many single-line inserts, read
    // with a high minPartitions so boundaries cut through both.
    val rows = (1 to 500).map(i => s"INSERT INTO `t` VALUES ($i, 'name $i');").mkString("\n")
    val text =
      s"""-- dump
         |CREATE TABLE `t` (
         |  `id` int NOT NULL,
         |  `name` varchar(20),
         |  KEY `k` (`name`(5))
         |);
         |$rows
         |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out, minPartitions = 13)
    assert(res.rowsWritten("t") == 500)
    val back = spark.read.parquet(s"$out/t")
    assert(back.count() == 500)
    import org.apache.spark.sql.functions._
    assert(back.agg(sum("id")).head.getLong(0) == 500L * 501 / 2)
  }

  test("statement spanning entire partitions is not lost (heal carry-chain)") {
    val in = tmpDir("dump-span-in")
    val out = tmpDir("dump-span-out")
    // A CREATE TABLE block of ~120 lines read with minPartitions=40:
    // partitions are ~3 lines each, so the statement spans many whole
    // partitions with no terminator — the round-1 healer dropped it.
    val cols = (1 to 118).map(i => s"  `c$i` int,").mkString("\n")
    val text =
      s"""CREATE TABLE `wide` (
         |$cols
         |  `last` int
         |);
         |INSERT INTO `wide` VALUES (${(1 to 119).mkString(",")});
         |INSERT INTO `wide` VALUES (${(201 to 319).mkString(",")});
         |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out, minPartitions = 40)
    assert(res.tables == Seq("wide"))
    assert(res.rowsWritten("wide") == 2)
    assert(res.droppedInserts == 0)
    val back = spark.read.parquet(s"$out/wide")
    assert(back.schema.fields.length == 119)
    import org.apache.spark.sql.functions._
    assert(back.agg(sum("c1"), sum("last")).head() ==
      Row(1L + 201L, 119L + 319L))
  }

  test("raw-newline literals with ');' lookalike line endings convert sequentially") {
    // Each INSERT spans two physical lines, the first ending in `);`
    // INSIDE an open string literal — a statement-terminator lookalike
    // that the reference's non-quote-aware reader splits on (corrupting
    // the dump). Our quote-aware assembler keeps the statement whole.
    // Raw newlines inside literals are OUTSIDE the mysqldump format
    // (mysqldump escapes them as \n), so this shape is only supported
    // sequentially: a partition starting mid-literal cannot locally
    // know its quote parity (the same reason nothing splits quoted
    // multi-line CSV). The parsed value pins the documented
    // no-separator line join ("a);" + "end" → "a);end").
    val in = tmpDir("dump-quote-in")
    val out = tmpDir("dump-quote-out")
    val n = 200
    val stmts = (1 to n).map { i =>
      s"INSERT INTO `t` VALUES ('v$i);\n end',$i);"
    }.mkString("\n")
    val text =
      s"""CREATE TABLE `t` (`s` varchar(40), `n` bigint);
         |$stmts
         |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out, minPartitions = 1)
    assert(res.rowsWritten("t") == n)
    assert(res.droppedInserts == 0)
    val back = spark.read.parquet(s"$out/t").collect()
      .map(r => (r.getLong(1), r.getString(0))).sortBy(_._1)
    assert(back.toSeq == (1 to n).map(i => (i.toLong, s"v$i);end")))
  }

  test("multi-line statements with ');' lookalikes INSIDE literals heal across many partitions") {
    // In-contract torture: literals stay on one line (mysqldump's
    // guarantee) but statements span lines, every row tuple carries a
    // `);` or `';'` lookalike inside its literal, and minPartitions=16
    // drops boundaries between tuple lines. The healer must reassemble
    // every statement; values must come back exact.
    val in = tmpDir("dump-mls-in")
    val out = tmpDir("dump-mls-out")
    val n = 300
    val stmts = (1 to n).map { i =>
      s"INSERT INTO `t` VALUES\n('a$i);b',$i),\n('c\\';d-$i', ${i + 1000});"
    }.mkString("\n")
    val text =
      s"""CREATE TABLE `t` (`s` varchar(40), `n` bigint);
         |$stmts
         |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out, minPartitions = 16)
    assert(res.rowsWritten("t") == 2L * n)
    assert(res.droppedInserts == 0)
    val back = spark.read.parquet(s"$out/t").collect()
      .map(r => (r.getLong(1), r.getString(0))).sortBy(_._1).toSeq
    val want = ((1 to n).map(i => (i.toLong, s"a$i);b")) ++
      (1 to n).map(i => (i + 1000L, s"c';d-$i"))).sortBy(_._1)
    assert(back == want)
  }

  test("re-CREATE of a table wins (writer rotation, parquet_writer.rs:82-91)") {
    val in = tmpDir("dump-recreate-in")
    val out = tmpDir("dump-recreate-out")
    val text =
      """CREATE TABLE `t` (`x` int);
        |INSERT INTO `t` VALUES (1);
        |CREATE TABLE `t` (`x` int, `y` int);
        |INSERT INTO `t` VALUES (2, 20);
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out)
    // The reference rotates its writer onto the same output path on a
    // re-CREATE, so rows inserted before the last CREATE are overwritten
    // away. We reproduce that: only the post-re-CREATE insert survives.
    assert(res.rowsWritten("t") == 1)
    assert(res.droppedInserts == 1)
    val back = spark.read.parquet(s"$out/t").collect()
    assert(back.toSeq == Seq(Row(2L, 20L)))
  }

  // bad rows: NULL in NOT NULL, a statement-level i64 overflow, wrong
  // arity, and a type mismatch — plus two good rows that must survive
  private val quarantineDump =
    """CREATE TABLE `q` (`id` bigint NOT NULL, `name` varchar(10), `price` double);
      |INSERT INTO `q` VALUES (1,'a',1.5),(2,'b',2.5);
      |INSERT INTO `q` VALUES (NULL,'c',3.5);
      |INSERT INTO `q` VALUES (99999999999999999999,'d',4.5);
      |INSERT INTO `q` VALUES (4,'e');
      |INSERT INTO `q` VALUES (5,6,7.5);
      |""".stripMargin

  test("quarantine: bad rows route to the side channel, good rows land") {
    val in = tmpDir("dump-quar-in")
    val out = tmpDir("dump-quar-out")
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), quarantineDump)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out, quarantine = true)
    assert(res.rowsWritten("q") == 2, "both well-formed rows must land")
    assert(res.rowsWritten(DumpConverter.QuarantineTable) == 4)
    val good = spark.read.parquet(s"$out/q").collect().sortBy(_.getLong(0))
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val quar = spark.read.parquet(s"$out/${DumpConverter.QuarantineTable}")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(quar.forall(_._1 == "q"))
    assert(quar.count(_._2.contains("NULL in NOT NULL")) == 1)
    assert(quar.count(_._2.contains("out of i64 range")) == 1,
      s"expected one overflow entry in ${quar.map(_._2).toSeq}")
    assert(quar.count(q => q._2.contains("values but schema has")) == 1)
    assert(quar.count(_._2.contains("expected string")) == 1)
    // the raw column carries enough to replay: the offending values
    assert(quar.exists(_._3.contains("99999999999999999999")))
  }

  test("quarantine off: the same bad dump fails the job (strict default preserved)") {
    val in = tmpDir("dump-quarfail-in")
    val out = tmpDir("dump-quarfail-out")
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), quarantineDump)
    val e = intercept[org.apache.spark.SparkException] {
      DumpConverter.convert(spark, s"$in/dump.sql", out)
    }
    assert(e.getMessage != null)
  }

  // --- restartability (completion manifest + --resume)

  val resumeDump =
    """CREATE TABLE `ta` (`id` bigint, `v` varchar(10));
      |INSERT INTO `ta` VALUES (1,'a1'),(2,'a2');
      |CREATE TABLE `tb` (`id` bigint, `v` varchar(10));
      |INSERT INTO `tb` VALUES (3,'b1'),(4,'b2'),(5,'b3');
      |CREATE TABLE `tc` (`id` bigint, `v` varchar(10));
      |INSERT INTO `tc` VALUES (6,'c1');
      |""".stripMargin

  private def tableRows(out: String, t: String): Seq[(Long, String)] =
    spark.read.parquet(s"$out/$t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  test("resume: kill after first table commits, rerun skips it and completes the rest") {
    val in = tmpDir("dump-resume-in")
    val out = tmpDir("dump-resume-out")
    val clean = tmpDir("dump-resume-clean")
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), resumeDump)

    // clean single run for the equality oracle
    DumpConverter.convert(spark, s"$in/dump.sql", clean)

    // killed run: the progress hook throws as soon as the FIRST
    // per-table commit line appears — table 1 is committed+manifested,
    // tables 2..3 never start (same observable state as a mid-run
    // SIGKILL between table commits)
    val boom = new RuntimeException("injected kill")
    val killed = intercept[RuntimeException] {
      DumpConverter.convert(spark, s"$in/dump.sql", out,
        progress = line => if (line.contains("(1/3)")) throw boom)
    }
    assert(killed eq boom)
    assert(new java.io.File(s"$out/ta").exists(), "first table must be committed")
    assert(!new java.io.File(s"$out/tb").exists(), "second table must not exist yet")
    val manifest = new java.io.File(s"$out/${DumpConverter.ManifestDir}")
    assert(manifest.isDirectory && manifest.listFiles().exists(_.getName.contains("ta")))
    val taFilesBefore = new java.io.File(s"$out/ta").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap

    // resumed run: ta skipped (bytes untouched), tb/tc completed
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out,
      progress = seen += _, resume = true)
    assert(res.rowsWritten == Map("ta" -> 2L, "tb" -> 3L, "tc" -> 1L))
    assert(seen.exists(l => l.contains("ta") && l.contains("skipped")),
      s"expected a skip line for ta in: $seen")
    val taFilesAfter = new java.io.File(s"$out/ta").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(taFilesAfter == taFilesBefore, "resume must not rewrite the completed table")

    // and the final output equals the clean single run, table by table
    for (t <- Seq("ta", "tb", "tc"))
      assert(tableRows(out, t) == tableRows(clean, t), s"table $t differs from clean run")
  }

  test("resume: a changed input invalidates the manifest (no stale skips)") {
    val in = tmpDir("dump-resume2-in")
    val out = tmpDir("dump-resume2-out")
    val f = java.nio.file.Paths.get(s"$in/dump.sql")
    Files.writeString(f, resumeDump)
    DumpConverter.convert(spark, s"$in/dump.sql", out)
    // same tables, different content AND size → different fingerprint
    Files.writeString(f, resumeDump.replace("'a1'", "'a1-CHANGED'"))
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out, resume = true)
    assert(res.rowsWritten.values.sum == 6)
    assert(tableRows(out, "ta").exists(_._2 == "a1-CHANGED"),
      "rerun against changed input must rewrite, not skip")
  }

  test("resume: changed conversion options invalidate the manifest (no mixed-config output)") {
    val in = tmpDir("dump-resume4-in")
    val out = tmpDir("dump-resume4-out")
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), resumeDump)
    DumpConverter.convert(spark, s"$in/dump.sql", out, codec = "snappy")
    // same input bytes, different codec: skipping would leave snappy
    // tables inside a zstd run — the fingerprint must refuse the skip
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out,
      codec = "zstd", resume = true, progress = seen += _)
    assert(res.rowsWritten.values.sum == 6, "all tables must re-convert")
    assert(!seen.exists(_.contains("skipped")), s"nothing may be skipped: $seen")
    val taCodecs = new java.io.File(s"$out/ta").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    assert(taCodecs.nonEmpty && taCodecs.forall(_.contains("zstd")),
      s"completed-under-snappy table must be rewritten as zstd: ${taCodecs.toSeq}")
    // unchanged options DO skip (the fingerprint is stable, not paranoid)
    val seen2 = scala.collection.mutable.ArrayBuffer[String]()
    DumpConverter.convert(spark, s"$in/dump.sql", out,
      codec = "zstd", resume = true, progress = seen2 += _)
    assert(seen2.count(_.contains("skipped")) == 3,
      s"identical rerun must skip all three tables: $seen2")
  }

  test("resume off: a fresh run clears stale manifest entries") {
    val in = tmpDir("dump-resume3-in")
    val out = tmpDir("dump-resume3-out")
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), resumeDump)
    DumpConverter.convert(spark, s"$in/dump.sql", out)
    assert(new java.io.File(s"$out/${DumpConverter.ManifestDir}").isDirectory)
    // a NON-resume rerun is a fresh convert: old entries must go so a
    // later --resume can only ever see entries this run committed
    DumpConverter.convert(spark, s"$in/dump.sql", out)
    // count .json entries only — local Hadoop FS adds .crc sidecars
    val entries = new java.io.File(s"$out/${DumpConverter.ManifestDir}").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(entries.length == 3, "fresh run rewrites the manifest for its own tables")
  }

  test("multi-database dump: USE routes same-named tables to per-db output dirs") {
    val in = tmpDir("dump-multidb-in")
    val out = tmpDir("dump-multidb-out")
    val dump =
      """CREATE DATABASE `db1`;
        |USE `db1`;
        |CREATE TABLE `t` (`id` bigint, `name` varchar(10));
        |INSERT INTO `t` VALUES (1,'a'),(2,'b');
        |CREATE DATABASE `db2`;
        |USE `db2`;
        |CREATE TABLE `t` (`id` bigint, `price` double);
        |INSERT INTO `t` VALUES (3,1.5);
        |USE `db1`;
        |INSERT INTO `t` VALUES (4,'c');
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), dump)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out)
    assert(res.tables == Seq("db1/t", "db2/t"))
    assert(res.rowsWritten == Map("db1/t" -> 3L, "db2/t" -> 1L))
    assert(res.droppedInserts == 0)
    val t1 = spark.read.parquet(s"$out/db1/t").collect().sortBy(_.getLong(0))
    assert(t1.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (4L, "c")))
    val t2 = spark.read.parquet(s"$out/db2/t").collect()
    assert(t2.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((3L, 1.5)))
  }

  test("multi-database dump heals a USE spanning partition boundaries") {
    val in = tmpDir("dump-multidb-split-in")
    val out = tmpDir("dump-multidb-split-out")
    // same dump, many tiny partitions: USE/CREATE/INSERT land in
    // different partitions and the db timeline must survive healing
    val dump =
      """USE `dbx`;
        |CREATE TABLE `t` (`id` bigint);
        |INSERT INTO `t` VALUES (1);
        |USE `dby`;
        |CREATE TABLE `t` (`id` bigint);
        |INSERT INTO `t` VALUES (2),(3);
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), dump)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out, minPartitions = 6)
    assert(res.rowsWritten == Map("dbx/t" -> 1L, "dby/t" -> 2L))
  }

  test("quarantine: a dump defining the reserved `_quarantine` table fails fast") {
    val in = tmpDir("dump-quarres-in")
    val out = tmpDir("dump-quarres-out")
    val dump =
      """CREATE TABLE `_quarantine` (`id` bigint);
        |INSERT INTO `_quarantine` VALUES (1);
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), dump)
    val e = intercept[IllegalArgumentException] {
      DumpConverter.convert(spark, s"$in/dump.sql", out, quarantine = true)
    }
    assert(e.getMessage.contains("_quarantine"))
    // without quarantine the name is just a normal table
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out)
    assert(res.rowsWritten("_quarantine") == 1)
  }

  test("--codec routes the parquet compression; bad codec fails before any work") {
    val in = tmpDir("dump-codec-in")
    val text = DumpRenderer.dump(Seq(("user", userSchema, userRows)), batchSize = 2)
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    for ((codec, ext) <- Seq("zstd" -> "zstd", "gzip" -> "gz")) {
      val out = tmpDir(s"dump-codec-$codec-out")
      val res = DumpConverter.convert(spark, s"$in/dump.sql", out, codec = codec)
      assert(res.rowsWritten("user") == 3)
      val parts = new java.io.File(s"$out/user").listFiles()
        .map(_.getName).filter(_.endsWith(".parquet"))
      assert(parts.nonEmpty && parts.forall(_.contains(s".$ext.")),
        s"expected $ext part files, got ${parts.mkString(",")}")
      val back = spark.read.parquet(s"$out/user").collect().sortBy(_.getLong(0))
      assert(back.toSeq == userRows)
    }
    val e = intercept[IllegalArgumentException] {
      DumpConverter.convert(spark, s"$in/dump.sql", tmpDir("dump-codec-bad"), codec = "lzo")
    }
    assert(e.getMessage.contains("unsupported codec"))
  }

  test("type options end-to-end: DATE and u64 columns land as date32 / decimal(20,0)") {
    val in = tmpDir("dump-typed-in")
    val out = tmpDir("dump-typed-out")
    val text =
      """CREATE TABLE `evt` (`id` bigint NOT NULL, `day` date, `big` bigint unsigned);
        |INSERT INTO `evt` VALUES (1,'2024-01-31',18446744073709551615),(2,'2024-02-29',9223372036854775808);
        |INSERT INTO `evt` VALUES (3,NULL,42),(4,'1970-01-01',NULL);
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$in/dump.sql"), text)
    val res = DumpConverter.convert(spark, s"$in/dump.sql", out,
      types = DumpParser.TypeOptions(dateAsDate = true, unsignedBigintDecimal = true))
    assert(res.rowsWritten("evt") == 4)
    val back = spark.read.parquet(s"$out/evt")
    assert(back.schema("day").dataType == org.apache.spark.sql.types.DateType)
    assert(back.schema("big").dataType == org.apache.spark.sql.types.DecimalType(20, 0))
    val rows = back.collect().sortBy(_.getLong(0))
    assert(rows.map(r => Option(r.getDate(1)).map(_.toString).orNull).toSeq ==
      Seq("2024-01-31", "2024-02-29", null, "1970-01-01"))
    assert(rows.map(r => Option(r.getDecimal(2)).map(_.toString).orNull).toSeq ==
      Seq("18446744073709551615", "9223372036854775808", "42", null))
    // the SAME dump without the flags fails on the > i64 literal
    // (reference parity preserved by default)
    assertThrows[org.apache.spark.SparkException](
      DumpConverter.convert(spark, s"$in/dump.sql", tmpDir("dump-typed-plain")))
  }

  test("packSegs/unpackSegs: LZ4 statement blocks round-trip exactly, stream in order, and actually compress") {
    val segs: Seq[StatementReader.Seg] =
      Seq(StatementReader.Head(Vector("CREATE TABLE `t` (", "  `a` int"))) ++
        (0 until 5000).map(i => StatementReader.Stmt(
          s"INSERT INTO `t` VALUES ($i,'v$i','${"x" * 200}');")) ++
        Seq(StatementReader.Stmt("INSERT INTO `t` VALUES (9,'π — ünïcode ☃');"),
          StatementReader.Stmt("big:" + "y" * (80 * 1024)), // past writeUTF's 64 KB cap
          StatementReader.Tail(Vector("INSERT INTO `t` VAL")))
    val blocks = DumpConverter.packSegs(segs.iterator).toVector
    assert(blocks.nonEmpty)
    val packed = blocks.map(_.length.toLong).sum
    val raw = segs.collect { case StatementReader.Stmt(s) => s.length.toLong }.sum
    assert(packed < raw / 3, s"expected ≥3x pack ratio, got $raw -> $packed")
    val back = DumpConverter.unpackSegs(blocks.iterator).toSeq
    assert(back == segs, "packed statement stream must round-trip in order")
  }
}
