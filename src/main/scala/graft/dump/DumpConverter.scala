package graft.dump

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** mysqldump → one Snappy parquet dir per table, the reference's whole
  * capability (`/root/reference/src/main.rs`, `parquet_writer.rs`)
  * re-expressed on Spark.
  *
  * Execution model (vs the reference's 3-thread pipeline):
  *
  *   1. `sc.textFile` reads the dump — splittable into parallel
  *      partitions for plain `.sql`; `.sql.gz` degrades to a single
  *      sequential partition exactly like the reference's gzip path
  *      (recommend plain or zstd at scale).
  *   2. Each partition assembles statements with
  *      [[StatementReader.assemblePartition]] — a streaming fold whose
  *      memory is bounded by one statement. Partition-boundary
  *      fragments (only multi-line CREATE TABLE blocks span lines in
  *      mysqldump format) are healed on the driver: O(#partitions)
  *      data, not O(input).
  *   3. Every statement carries a position `(2*pid+1, seq)` — healed
  *      boundary statements sort before the body of the partition whose
  *      head completed them at `(2*pid, seq)` — restoring the file's
  *      total statement order without a sort of the data.
  *   4. CREATE TABLEs (tiny) are collected and parsed to StructTypes on
  *      the driver. Re-creating a table rotates the reference's writer
  *      onto the same output path (`parquet_writer.rs:82-91`), so rows
  *      inserted before the LAST CREATE of a table end up overwritten;
  *      we reproduce that net effect positionally: only INSERTs after
  *      the table's last CREATE are written.
  *   5. Per table, INSERT statements are routed by a cheap prefix parse
  *      of the target name, rows parsed + type-coerced on executors,
  *      and written `overwrite`/snappy to `{out}/{table}`. Assembled
  *      statements persist MEMORY_AND_DISK_SER so per-table passes
  *      don't re-read and re-assemble the raw dump (at 100 TB this
  *      persisted stage is the staging area; tables then convert in
  *      independent jobs, each deserializing only its own inserts).
  *
  * DEVIATION from the reference: interleaved dumps (a table's INSERTs
  * split around other tables' sections) are SUPPORTED — statements are
  * grouped by parsed table name, not "current writer" state
  * (`parquet_writer.rs:93-95` warns and DROPS those rows). INSERTs
  * whose table has no preceding CREATE TABLE are dropped with a
  * warning, matching the reference's observable behavior.
  */
object DumpConverter {

  type Pos = (Long, Long) // (2*pid [+1 for body], seq) — lexicographic file order

  case class Result(tables: Seq[String], rowsWritten: Map[String, Long], droppedInserts: Long)

  def convert(spark: SparkSession, input: String, outDir: String,
              minPartitions: Int = 1): Result = {
    val sc = spark.sparkContext
    val lines = sc.textFile(input, minPartitions)

    val segs = lines.mapPartitions(StatementReader.assemblePartition)
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // Partition-boundary fragments → healed statements (driver, tiny).
      val frags: Array[(Int, StatementReader.Seg)] = segs
        .mapPartitionsWithIndex { (pid, it) =>
          it.collect {
            case h: StatementReader.Head => (pid, h: StatementReader.Seg)
            case t: StatementReader.Tail => (pid, t: StatementReader.Seg)
          }
        }.collect()
      val healed: Seq[(Pos, String)] = heal(frags)

      val body: RDD[(Pos, String)] = segs.mapPartitionsWithIndex { (pid, it) =>
        var seq = -1L
        it.collect { case StatementReader.Stmt(s) =>
          seq += 1
          ((2L * pid + 1, seq): Pos, s)
        }
      }
      val all: RDD[(Pos, String)] = body.union(sc.parallelize(healed, 1))

      // Schemas + last-CREATE position per table (driver-side, tiny).
      val creates: Seq[(Pos, DumpParser.CreateTable)] =
        (body.filter(_._2.startsWith("CREATE TABLE")).collect().toSeq ++
          healed.filter(_._2.startsWith("CREATE TABLE")))
          .map { case (pos, text) => (pos, DumpParser.parseCreateTable(text)) }
      val ordering = implicitly[Ordering[Pos]]
      val lastCreate: Map[String, (Pos, StructType)] =
        creates.groupBy(_._2.table).map { case (t, cs) =>
          val (pos, ct) = cs.maxBy(_._1)(ordering)
          t -> (pos, ct.schema)
        }
      // Preserve first-appearance order for the output listing.
      val tableOrder: Seq[String] = {
        val seen = scala.collection.mutable.LinkedHashSet[String]()
        creates.sortBy(_._1)(ordering).foreach(c => seen += c._2.table)
        seen.toSeq
      }

      val inserts = all.filter(_._2.startsWith("INSERT INTO"))
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      try {
        val lastCreateB = sc.broadcast(lastCreate)
        val dropped = sc.longAccumulator("droppedInserts")
        inserts.foreach { case (pos, s) =>
          val t = DumpParser.insertTarget(s)
          val keep = lastCreateB.value.get(t).exists { case (cpos, _) =>
            implicitly[Ordering[Pos]].compare(pos, cpos) > 0
          }
          if (!keep) dropped.add(1)
        }

        val counts = tableOrder.map { table =>
          val (cpos, schema) = lastCreate(table)
          val rows: RDD[Row] = inserts
            .filter { case (pos, s) =>
              ordering.compare(pos, cpos) > 0 && DumpParser.insertTarget(s) == table
            }
            .flatMap { case (_, s) =>
              DumpParser.parseInsert(s).rows.iterator
                .map(DumpParser.coerceRow(table, schema, _))
            }
          spark.createDataFrame(rows, schema)
            .write.mode("overwrite").option("compression", "snappy")
            .parquet(s"$outDir/$table")
          table -> spark.read.parquet(s"$outDir/$table").count()
        }
        if (dropped.value > 0)
          System.err.println(s"[dump] dropped ${dropped.value} INSERT statement(s) with no (preceding) CREATE TABLE")
        Result(tableOrder, counts.toMap, dropped.value)
      } finally inserts.unpersist(blocking = false)
    } finally segs.unpersist(blocking = false)
  }

  /** Join partition i's Tail lines with partition i+1's Head lines and
    * re-run the statement assembler over the concatenation. Statements
    * recovered from partition p's head get position `(2*p, k)` — before
    * p's body at `(2*p+1, _)`, after p-1's body at `(2*(p-1)+1, _)`.
    * The first partition's leading statement is recovered here too
    * (partition bodies only start after their first terminator line);
    * a trailing unterminated fragment at EOF is dropped, like the
    * reference's read loop (a statement without `;` never parses). */
  private[dump] def heal(frags: Array[(Int, StatementReader.Seg)]): Seq[(Pos, String)] = {
    val byPid = frags.groupBy(_._1)
    val pids = byPid.keys.toSeq.sorted
    val out = Vector.newBuilder[(Pos, String)]
    var carry: Vector[String] = Vector.empty
    pids.foreach { pid =>
      val segsHere = byPid(pid).map(_._2)
      val head = segsHere.collectFirst { case StatementReader.Head(l) => l }.getOrElse(Vector.empty)
      val tail = segsHere.collectFirst { case StatementReader.Tail(l) => l }.getOrElse(Vector.empty)
      var k = -1L
      StatementReader.statements((carry ++ head).iterator).foreach { s =>
        k += 1
        out += (((2L * pid, k), s))
      }
      carry = tail
    }
    out.result()
  }
}
