package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextAnalysis

/** Exact-BPE tokenizer (q113): hand-tokenized fixtures for the merge
  * mechanics, the two classic string-replace corruption traps that the
  * `<sym>` bracket encoding must block, and full parity between the
  * native array-merging expression and an in-Spark replace-chain built
  * from the SAME merges table — the same construction the generated
  * DuckDB oracle uses, so this is the in-repo proof of the
  * engine↔oracle equivalence argument.
  */
class BpeTokenizerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ---- the replace-chain twin, Spark flavor (same shape as the
  // generated DuckDB oracle: wrap every char, one replace per merge,
  // count surviving symbols)
  private def chainCount(text: Column): Column = {
    val wrapped = regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9]+", "|"), "(.)", "<$1>")
    val s = BpeTokenizer.merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(s"<$a><$b>"), s"<$a$b>")
    }
    ((length(s) - length(regexp_replace(s, "<", ""))) -
      (length(s) - length(regexp_replace(s, java.util.regex.Pattern.quote("<|>"), ""))) / 3)
      .cast("long")
  }

  test("hand-tokenized fixtures") {
    // whole-vocabulary words collapse to single tokens under the chains
    assert(BpeTokenizer.encodeWord("the").toSeq == Seq("the"))
    assert(BpeTokenizer.encodeWord("data").toSeq == Seq("data"))
    assert(BpeTokenizer.encodeWord("table").toSeq == Seq("table"))
    assert(BpeTokenizer.encodeWord("window").toSeq == Seq("window"))
    assert(BpeTokenizer.encodeWord("spark").toSeq == Seq("spark"))
    assert(BpeTokenizer.encodeWord("column").toSeq == Seq("column"))
    // partial merges on out-of-vocabulary words
    assert(BpeTokenizer.encodeWord("banana").toSeq == Seq("b", "an", "an", "a"))
    assert(BpeTokenizer.encodeWord("start").toSeq == Seq("st", "ar", "t"))
    // counts compose over words + boundaries
    assert(BpeTokenizer.countTokens("the data!") == 2L)
    assert(BpeTokenizer.countTokens("The,data;TABLE") == 3L)
    assert(BpeTokenizer.countTokens("") == 0L)
    assert(BpeTokenizer.countTokens("!!! ...") == 0L)
  }

  test("adjacent repeats merge left-to-right, non-overlapping") {
    // [t,h,t,h] -> both pairs fuse; a shared-separator encoding would
    // miss the second occurrence
    assert(BpeTokenizer.encodeWord("thth").toSeq == Seq("th", "th"))
    assert(BpeTokenizer.encodeWord("ananan").toSeq == Seq("an", "an", "an"))
  }

  test("bracket encoding blocks mid-symbol matches") {
    // "xath": `t h` fuses first -> [x,a,th]; an UNWRAPPED replace chain
    // would then corrupt "x a th" via the `a t` pattern matching across
    // the symbol boundary. The expression and the bracketed chain must
    // both say 3.
    assert(BpeTokenizer.encodeWord("xath").toSeq == Seq("x", "a", "th"))
    import spark.implicits._
    val df = Seq("xath", "thth", "banana xath", "the data table")
      .toDF("text")
      .select(TextAnalysis.bpeTokenCount(col("text")).as("native"),
        chainCount(col("text")).as("chain"))
    assert(df.filter(col("native") =!= col("chain")).count() == 0)
  }

  test("native expression matches the replace-chain twin on the corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cmp = docs.select(
      TextAnalysis.bpeTokenCount(col("text")).as("native"),
      chainCount(col("text")).as("chain"),
      TextAnalysis.tokenCount(col("text")).as("ws"))
    assert(cmp.count() > 0)
    assert(cmp.filter(col("native") =!= col("chain")).count() == 0)
    // BPE refines word splits on alphabet text: never fewer tokens than
    // whitespace words, and the merges actually fire (strictly more
    // initial chars than tokens)
    assert(cmp.filter(col("native") < col("ws")).count() == 0)
  }

  test("merges table is well-formed: every side is reachable") {
    // each merge's sides must be single chars or outputs of EARLIER
    // merges — a typo'd chain (e.g. `p ar` without `a r`) silently
    // never fires; fail loudly here instead
    val reachable = scala.collection.mutable.Set[String]()
    ('a' to 'z').foreach(c => reachable += c.toString)
    ('0' to '9').foreach(c => reachable += c.toString)
    BpeTokenizer.merges.zipWithIndex.foreach { case ((a, b), i) =>
      assert(reachable.contains(a), s"merge #$i left side '$a' unreachable")
      assert(reachable.contains(b), s"merge #$i right side '$b' unreachable")
      reachable += (a + b)
    }
  }

  test("symbol stream: per-word encodings joined by single boundaries") {
    val s = spark
    import s.implicits._
    val out = Seq("the  data!", "banana", "", "!!! ...")
      .toDF("t")
      .select(TextAnalysis.bpeSymbols(col("t")).as("a"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("the", "|", "data", "|")) // run collapses to one |
    assert(out(1) == Seq("b", "an", "an", "a"))
    assert(out(2) == Seq.empty)
    assert(out(3) == Seq("|"))
    // stream length (minus boundaries) must agree with the count path
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bad = docs.select(
        TextAnalysis.bpeSymbols(col("text")).as("a"),
        TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .filter(size(filter(col("a"), x => x =!= "|")) =!= col("n"))
    assert(bad.count() == 0)
  }

  test("merge census: hand corpus ranks the known next merge first") {
    val s = spark
    import s.implicits._
    // under the pinned merges, "banana" encodes [b, an, an, a]:
    // pairs (b,an), (an,an), (an,a) per occurrence. Three bananas and
    // one "b an" word-boundary-split control:
    val tiny = Seq("banana banana", "banana", "b anna")
      .toDF("text")
    val census = TextAnalysis.bpeMergeCensus(tiny, "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // 3x banana -> (b,an)=3, (an,an)=3, (an,a)=3; "anna" -> [an,n,a]
    // adds (an,n)=1, (n,a)=1; "b" alone adds no pair (boundary-split).
    // tie at 3 resolves (an,a) < (an,an) < (b,an) lexicographically
    assert(census.toSeq == Seq(("an", "a", 3L), ("an", "an", 3L),
      ("b", "an", 3L)))
  }

  // ---- the in-memory reference trainer: same census (adjacent
  // within-word pairs, overlapping positions each count) and same
  // one-pass left-to-right non-overlapping fuse as the engine's
  // bracket-string replace
  private def refTrain(texts: Seq[String], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var streams: Seq[Array[String]] = texts.map { t =>
      val lowered = t.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[^a-z0-9]+", "|")
      lowered.map(String.valueOf(_)).toArray
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for (s <- streams; i <- 0 until s.length - 1
           if s(i) != "|" && s(i + 1) != "|")
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + 1
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        out += ((r, a, b, c))
        streams = streams.map { s =>
          val o = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
              o += (a + b); i += 2
            } else { o += s(i); i += 1 }
          }
          o.toArray
        }
      }
    }
    out.toSeq
  }

  test("bpeTrain: adopted merges equal the in-memory reference trainer") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "the theater thesis", "data date dates", "banana bandana",
      "aaa aaaa b", "the data theater")
    val got = TextAnalysis.bpeTrain(texts.toDF("text"), "text", rounds = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq == refTrain(texts, 6))
  }

  test("bpeTrainAndTokenize: counts equal reference-trainer streams, merges shrink counts") {
    val s = spark
    import s.implicits._
    val texts = Seq("the theater", "data date", "the data the")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainAndTokenize(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: train with refTrain, apply the same fuse to each doc,
    // count surviving non-boundary symbols
    val merges = refTrain(texts, 3).map(m => (m._2, m._3))
    val expect = texts.zipWithIndex.map { case (t, i) =>
      var syms = t.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[^a-z0-9]+", "|").map(String.valueOf(_)).toArray
      for ((a, b) <- merges) {
        val o = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            o += (a + b); j += 2
          } else { o += syms(j); j += 1 }
        }
        syms = o.toArray
      }
      i.toLong -> syms.count(_ != "|").toLong
    }.toMap
    assert(got == expect)
    // sanity: training must actually compress vs raw character counts
    val rawChars = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.toLowerCase.count(c => c.isLetterOrDigit).toLong
    }.toMap
    assert(got.forall { case (id, n) => n < rawChars(id) },
      "3 merges on this corpus must shrink every doc's token count")
  }

  test("delta census ≡ full recount, round-for-round, on the corpus") {
    // the scale-critical equivalence: bpeTrain maintains the pair
    // census by junction deltas; bpeTrainRecount recounts the corpus
    // every round. Identical adopted-merge tables over enough rounds
    // to chain several data-dependent choices is the proof the delta
    // algebra is exact (any census drift would change a later top-1).
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val delta = TextAnalysis.bpeTrain(docs, "text", rounds = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    val recount = TextAnalysis.bpeTrainRecount(docs, "text", rounds = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(delta == recount)
    assert(delta.size == 8)
  }

  test("delta census handles overlap chains and boundary-adjacent fuses") {
    val s = spark
    import s.implicits._
    // adversarial shapes for the junction algebra: runs of a repeated
    // symbol (a = b, overlapping adjacencies, non-overlapping fuse),
    // back-to-back occurrences (empty interior split parts), fuses at
    // stream start/end, and fuse sites touching the `|` boundary
    val texts = Seq(
      "aaaa aaa aa",       // run fusing under (a,a)
      "ababab abab",       // empty interior parts under (a,b)
      "ab", "ba ab",       // whole-word occurrence: start AND end
      "xy xab aby",        // neighbors on one side only
      "a b a b",           // boundary-separated: no in-word pair
      "the data theater")  // ordinary text
    for (rounds <- Seq(1, 3, 6)) {
      val delta = TextAnalysis.bpeTrain(texts.toDF("text"), "text", rounds)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      assert(delta == refTrain(texts, rounds), s"rounds=$rounds")
    }
  }

  test("bpeTrain stops early when no in-word pair remains") {
    val s = spark
    import s.implicits._
    // every word is one char: round 1 fuses nothing... actually there
    // is no pair at all, so training exhausts immediately
    val got = TextAnalysis.bpeTrain(
      Seq("a b c", "d e").toDF("text"), "text", rounds = 4).collect()
    assert(got.isEmpty)
  }
}
