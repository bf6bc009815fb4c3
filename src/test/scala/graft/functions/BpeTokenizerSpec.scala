package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class BpeTokenizerSpec extends AnyFunSuite {

  test("merge table loads, is non-trivial, and respects the length cap") {
    val m = BpeTokenizer.merges
    assert(m.size > 50, s"suspiciously small table: ${m.size}")
    assert(m.forall { case (l, r) => (l + r).length <= BpeTrainer.MaxTokenLen })
    assert(m.distinct.size == m.size, "duplicate merge rules")
    // every rule's components are single chars or products of EARLIER rules
    val known = scala.collection.mutable.Set.empty[String]
    m.foreach { case (l, r) =>
      for (t <- Seq(l, r))
        assert(t.length == 1 || known.contains(t), s"component $t not formed before its rule")
      known += (l + r)
    }
  }

  /** Independent reference encoder: apply every merge rule once, in
    * rank order, leftmost-greedy — a DIFFERENT algorithm from the
    * production lowest-rank-first loop. Agreement over the corpus is
    * the equivalence the DuckDB oracle relies on. */
  private def referenceEncode(piece: String): Vector[String] = {
    var toks: Vector[String] =
      piece.getBytes("UTF-8").iterator.map(b => BpeTokenizer.byteChar(b).toString).toVector
    for ((l, r) <- BpeTokenizer.merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.result()
    }
    toks
  }

  test("production encoder == rank-order reference encoder on the whole fixture vocabulary") {
    val spark = graft.SparkTestSession.spark
    val words = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").collect().iterator
      .flatMap(_.getString(0).split(' ')).filter(_.nonEmpty).toSet
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(BpeTokenizer.encodePiece(w) == referenceEncode(w), s"divergence on '$w'")
    }
    // plus adversarial pieces the fixture lacks
    for (w <- Seq("xylophonezzz", "aaaaaaaaaa", "a", "zq", "partsupplierorder",
                  "windowwindowwindow", "qqqqq"))
      assert(BpeTokenizer.encodePiece(w) == referenceEncode(w), s"divergence on '$w'")
  }

  test("tokens concatenate back to the original piece (lossless)") {
    for (w <- Seq("customer", "supplier", "xylophone", "thequickbrownfox", "zz"))
      assert(BpeTokenizer.encodePiece(w).mkString == w)
  }

  test("full byte range tokenizes: non-ASCII and control bytes are distinct single chars") {
    val s = "café  世界"
    val toks = BpeTokenizer.tokenize(s)
    assert(toks.nonEmpty)
    // é is 2 UTF-8 bytes -> 2 mapped chars (unless merged; table is a-z only)
    val cafe = BpeTokenizer.encodePiece("café")
    assert(cafe.flatMap(_.toCharArray).count(_ >= 0x100) == 2)
    // mapping is collision-free: 256 distinct byte images
    val images = (0 until 256).map(b => BpeTokenizer.byteChar(b.toByte)).toSet
    assert(images.size == 256)
  }

  test("tokenize splits on spaces only and drops empties; counter agrees with tokenize") {
    val text = "  hash  join   window "
    assert(BpeTokenizer.tokenize(text) ==
      Vector("hash", "join", "window").flatMap(BpeTokenizer.encodePiece))
    assert(BpeTokenizer.tokenCounter()(text) == BpeTokenizer.tokenize(text).size.toLong)
    assert(BpeTokenizer.tokenCounter()("") == 0L)
  }

  test("token counts are subword-granular, between piece count and char count") {
    val spark = graft.SparkTestSession.spark
    val rows = graft.ops.TextOps.t_bpe_tokens(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var strictlyBetween = 0
    var sumPieces = 0L
    var sumToks = 0L
    rows.foreach { r =>
      val pieces = r.getInt(1).toLong
      val toks = r.getLong(2)
      assert(toks >= pieces, s"doc ${r.getLong(0)}: fewer tokens than pieces")
      sumPieces += pieces; sumToks += toks
      if (toks > pieces) strictlyBetween += 1
    }
    // the cap keeps the vocabulary subword: counts must NOT collapse to
    // the whitespace count corpus-wide (the degenerate saturation mode;
    // docs of only short fully-merged words may individually collapse)
    assert(strictlyBetween * 10 >= rows.length * 7,
      s"only $strictlyBetween/${rows.length} docs have tokens > pieces — table degenerated")
    assert(sumToks * 10 >= sumPieces * 12,
      s"corpus tokens/pieces = $sumToks/$sumPieces — not subword-granular")
  }

  test("trainer is deterministic and reproduces the committed table from the same corpus") {
    val spark = graft.SparkTestSession.spark
    val fixture = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").collect().map(_.getString(0))
    val wc = scala.collection.mutable.HashMap.empty[String, Long]
    for (t <- fixture.iterator ++ Iterator(BpeTrainer.SeedText);
         w <- t.split("\\s+") if w.nonEmpty)
      wc(w) = wc.getOrElse(w, 0L) + 1L
    val retrained = BpeTrainer.train(wc.toMap)
    assert(retrained == BpeTokenizer.merges,
      "committed bpe_merges.txt is stale — rerun graft.functions.BpeTrainer")
  }
}
