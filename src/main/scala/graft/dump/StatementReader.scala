package graft.dump

/** Line stream → SQL statement stream, reproducing the reference
  * pipeline's read loop (`/root/reference/src/main.rs:110-145`) and its
  * `cleanup_key` DDL rewrite (`main.rs:158-181`):
  *
  *   - drop `--` comment lines, single-line C-style comment blocks ending in `;`
  *     (mysqldump conditional comments), and blank lines;
  *   - accumulate trimmed lines, joined without separator, until a
  *     statement-terminating `;`;
  *   - inside a CREATE TABLE statement, strip index prefix lengths
  *     (`KEY k (col(144))` → `KEY k (col)`);
  *   - forward only `CREATE TABLE` / `INSERT INTO` statements.
  *
  * Deviation from the reference (SURVEY.md §7): the trailing-`;` test
  * is quote-aware — a line only terminates a statement when its
  * accumulated single-quote state is balanced, so a `;` at the end of a
  * string literal can never split a statement. The reference relies on
  * mysqldump never emitting raw newlines inside literals; we keep that
  * assumption for line boundaries but not for statement boundaries.
  *
  * Contract boundary, pinned by `DumpConverterSpec`: a single
  * sequential scan ([[statements]], or [[assemblePartition]] on one
  * partition) additionally tolerates RAW newlines inside literals —
  * the whole multi-line literal accumulates under open-quote state
  * (the reference's reader would corrupt such input). The DISTRIBUTED
  * path does not: a partition beginning mid-literal cannot locally
  * determine its quote parity (the same reason no engine splits
  * quoted multi-line CSV), so splits assume mysqldump's actual
  * guarantee that literals never contain raw newlines. Handcrafted
  * dumps that violate it must convert with `minPartitions = 1`.
  */
object StatementReader {

  /** Port of `cleanup_key` (`main.rs:158-181`): drop characters at
    * paren depth ≥ 2 and the parens closing back to depth 1, on lines
    * mentioning "KEY ". Works around index prefix lengths in DDL. */
  def cleanupKey(line: String): String = {
    if (!line.contains("KEY ")) line
    else {
      val sb = new StringBuilder(line.length)
      var depth = 0
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '(') depth += 1
        var drop = false
        if (c == ')') {
          depth -= 1
          if (depth == 1) drop = true
        }
        if (!drop && depth < 2) sb.append(c)
        i += 1
      }
      sb.toString
    }
  }

  private def isComment(trimmed: String): Boolean =
    trimmed.startsWith("--") ||
      (trimmed.startsWith("/*") && trimmed.endsWith("*/;")) ||
      trimmed.isEmpty

  /** Scan a line for MySQL single-quote state transitions, honoring
    * backslash escapes and `''` doubling. Returns the quote state after
    * the line given the state before it. */
  private[dump] def quoteStateAfter(line: String, openBefore: Boolean): Boolean = {
    var open = openBefore
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (open && c == '\\') i += 1 // escaped char inside literal
      else if (c == '\'') open = !open
      i += 1
    }
    open
  }

  /** Forwarded statements: the reference keeps only CREATE TABLE /
    * INSERT INTO (`main.rs:136-141`); we additionally forward `USE` so
    * multi-database dumps (`mysqldump --all-databases`) route tables
    * to per-database output dirs instead of colliding on name.
    * `CREATE DATABASE` stays filtered — it carries no routing
    * information beyond the `USE` that follows it and produces no
    * output of its own. */
  private def keep(stmt: String): Boolean =
    stmt.startsWith("CREATE TABLE") || stmt.startsWith("INSERT INTO") ||
      stmt.startsWith("USE ") || stmt.startsWith("USE`")

  /** Assemble statements from a line iterator (single-pass, O(1) state
    * beyond the current statement buffer — the streaming shape the
    * reference has, and what `mapPartitions` needs at scale). */
  def statements(lines: Iterator[String]): Iterator[String] = new Iterator[String] {
    private val current = new StringBuilder
    private var inQuote = false
    private var pending: Option[String] = None

    private def advance(): Unit = {
      while (pending.isEmpty && lines.hasNext) {
        val trimmed = lines.next().trim
        if (!isComment(trimmed)) {
          if (current.startsWith("CREATE TABLE")) current.append(cleanupKey(trimmed))
          else current.append(trimmed)
          inQuote = quoteStateAfter(trimmed, inQuote)
          if (!inQuote && current.nonEmpty && current.charAt(current.length - 1) == ';') {
            val stmt = current.result().trim
            current.clear()
            if (keep(stmt)) pending = Some(stmt)
          }
        }
      }
    }

    def hasNext: Boolean = { advance(); pending.nonEmpty }
    def next(): String = {
      advance()
      val s = pending.getOrElse(throw new NoSuchElementException)
      pending = None
      s
    }
  }

  /** Partition-boundary segments for the distributed converter. A
    * partition cannot know whether its first lines continue a statement
    * begun in the previous partition, so its output is:
    *
    *   - `Head(lines)`: raw lines up to and including the first
    *     terminating line (possibly the tail of a spanning statement —
    *     healed later by joining with the previous partition's `Tail`);
    *   - `Stmt(text)`: statements fully assembled after that point;
    *   - `Tail(lines)`: raw leftover lines after the last terminator.
    *
    * Fragments are tiny — only multi-line CREATE TABLE blocks span
    * lines (and hence partitions) in mysqldump format — so healing them
    * on the driver is O(#partitions), not O(data).
    */
  sealed trait Seg extends Serializable
  case class Head(lines: Vector[String]) extends Seg
  case class Stmt(text: String) extends Seg
  case class Tail(lines: Vector[String]) extends Seg

  /** Whether this line sequence contains a statement-terminating line
    * (same test as the assemblers: non-comment line ending `;` at
    * balanced quote state). A partition whose Head does NOT terminate
    * held no terminator at all — the healer must treat the whole
    * partition as continuation of the carried statement, or the
    * residue would be silently dropped (the round-1 data-loss bug). */
  private[dump] def terminates(lines: Seq[String]): Boolean = {
    var quote = false
    lines.exists { raw =>
      val trimmed = raw.trim
      if (isComment(trimmed)) false
      else {
        quote = quoteStateAfter(trimmed, quote)
        !quote && trimmed.endsWith(";")
      }
    }
  }

  /** Single streaming pass over one partition's lines; memory is
    * bounded by the largest single statement, never the partition. */
  def assemblePartition(lines: Iterator[String]): Iterator[Seg] = new Iterator[Seg] {
    private var phase = 0 // 0 = head, 1 = body, 2 = done
    private val current = new StringBuilder
    private val rawSinceTerm = Vector.newBuilder[String]
    private var inQuote = false
    private var pending: List[Seg] = Nil

    private def collectHead(): Unit = {
      val head = Vector.newBuilder[String]
      var quote = false
      var done = false
      while (lines.hasNext && !done) {
        val raw = lines.next()
        val trimmed = raw.trim
        head += raw
        if (!isComment(trimmed)) {
          quote = quoteStateAfter(trimmed, quote)
          if (!quote && trimmed.endsWith(";")) done = true
        }
      }
      pending = List(Head(head.result()))
      phase = 1
    }

    private def advanceBody(): Unit = {
      while (pending.isEmpty && phase == 1) {
        if (!lines.hasNext) {
          pending = List(Tail(rawSinceTerm.result()))
          phase = 2
        } else {
          val raw = lines.next()
          val trimmed = raw.trim
          rawSinceTerm += raw
          if (!isComment(trimmed)) {
            if (current.startsWith("CREATE TABLE")) current.append(cleanupKey(trimmed))
            else current.append(trimmed)
            inQuote = quoteStateAfter(trimmed, inQuote)
            if (!inQuote && current.nonEmpty && current.charAt(current.length - 1) == ';') {
              val stmt = current.result().trim
              current.clear()
              rawSinceTerm.clear()
              if (keep(stmt)) pending = List(Stmt(stmt))
            }
          }
        }
      }
    }

    private def advance(): Unit = {
      if (phase == 0) collectHead()
      if (pending.isEmpty && phase == 1) advanceBody()
    }

    def hasNext: Boolean = { advance(); pending.nonEmpty }
    def next(): Seg = {
      advance()
      pending match {
        case h :: t => pending = t; h
        case Nil    => throw new NoSuchElementException
      }
    }
  }
}
