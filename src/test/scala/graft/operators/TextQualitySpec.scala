package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rules(rows: (Long, String)*) =
    TextOps.qualityRules(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("qualityRules counts words, lines and rule metrics") {
    val good = (("the quick brown fox jumps over the lazy dog and runs into the barn " * 5)
      .trim) // 70 words, all alpha, stopword-rich, mean word len 3.79
    val m = rules(1L -> good)(1L)
    assert(m.getAs[Int]("n_words") === 70)
    assert(m.getAs[Double]("alpha_frac") === 1.0)
    assert(m.getAs[Int]("stop_hits") > 2)
    assert(m.getAs[Double]("symbol_ratio") === 0.0)
    assert(m.getAs[Boolean]("keep"))
  }

  test("short documents fail the word-count rule") {
    val m = rules(1L -> "too short")(1L)
    assert(m.getAs[Int]("n_words") === 2)
    assert(!m.getAs[Boolean]("keep"))
  }

  test("bullet-dominated and ellipsis-ended lines are measured per line") {
    val text = "- first bullet\n- second bullet\nplain line\nto be continued..."
    val m = rules(1L -> text)(1L)
    assert(m.getAs[Double]("bullet_frac") === 0.5)   // 2 of 4 lines
    assert(m.getAs[Double]("ellipsis_frac") === 0.25) // 1 of 4 lines
  }

  test("symbol ratio counts # and ellipsis occurrences per word") {
    val m = rules(1L -> "# # ... four words here")(1L)
    // 6 whitespace words, 3 symbol matches
    assert(m.getAs[Int]("n_words") === 6)
    assert(m.getAs[Double]("symbol_ratio") === 0.5)
  }

  test("mean word length is whitespace-stripped chars over words") {
    val m = rules(1L -> "ab cde f")(1L) // 6 chars / 3 words
    assert(m.getAs[Double]("mean_word_len") === 2.0)
  }

  test("empty and whitespace-only documents yield zeroed guarded ratios") {
    val m = rules(1L -> "", 2L -> "   \n\t ")
    for (id <- Seq(1L, 2L)) {
      assert(m(id).getAs[Int]("n_words") === 0)
      assert(m(id).getAs[Double]("mean_word_len") === 0.0)
      assert(m(id).getAs[Double]("alpha_frac") === 0.0)
      assert(!m(id).getAs[Boolean]("keep"))
    }
  }

  private def clean(s: String): String =
    Seq(Tuple1(s)).toDF("text")
      .select(TextOps.cleanText(col("text"))).head().getString(0)

  test("cleanText strips tags, redacts URLs/emails, collapses whitespace") {
    assert(clean("<p>Hello <b>world</b></p>") === "Hello world")
    assert(clean("see https://example.com/a?b=1 now") === "see <URL> now")
    assert(clean("mail bob.smith+x@example.co.uk please") ===
      "mail <EMAIL> please")
    assert(clean("a\u0000b\u0007c\u007fd") === "abcd")
    assert(clean("  a \t\t b \n\n c  ") === "a b c")
  }

  test("cleanText treats lone CR / FF as word separators, not deletions") {
    // ADVICE r3: CR and FF are whitespace in WsClass — deleting them in the
    // control pass would merge classic-Mac-line-ending words
    assert(clean("a\rb") === "a b")
    assert(clean("a\fb") === "a b")
    assert(clean("a\u000bb") === "ab") // VT stays a deleted control char
  }

  test("cleanText handles combined noise in one pass") {
    val in = "<div> Visit   https://x.io \u0001now</div>\nor mail a@b.io\t"
    assert(clean(in) === "Visit <URL> now or mail <EMAIL>")
  }

  test("cleanText leaves clean text untouched") {
    assert(clean("already clean text") === "already clean text")
  }

  test("unigramSurprisal: hand-computed scores, OOV accounting, NULL on no-vocab docs") {
    val docs = Seq(
      (1L, "the the the"),
      (2L, "the cat"),
      (3L, "zyx qqq")
    ).toDF("doc_id", "text")
    // vocabK=2 → vocab {the:4, cat:1}, G=5; zyx/qqq are OOV
    val out = TextOps.unigramSurprisal(docs, "doc_id", "text", vocabK = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.getAs[java.lang.Double]("surprisal"))))
      .toMap
    assert(out(1L)._1 === 3L && out(1L)._2 === 0L)
    assert(math.abs(out(1L)._3.get - (-math.log(4.0 / 5.0))) < 1e-9)
    assert(math.abs(out(2L)._3.get -
      (-(math.log(4.0 / 5.0) + math.log(1.0 / 5.0)) / 2.0)) < 1e-9)
    assert(out(3L) === ((2L, 2L, None))) // all OOV → NULL surprisal
    // rare-token docs score strictly higher than common-token docs
    assert(out(2L)._3.get > out(1L)._3.get)
  }

  test("unigramSurprisal is layout-independent (ordered fold + rounding)") {
    val docs = (0 until 200)
      .map(i => (i.toLong, s"w${i % 11} w${i % 7} w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    val once = TextOps.unigramSurprisal(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Double]("surprisal"))).toMap
    val again = TextOps.unigramSurprisal(docs.repartition(17), "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Double]("surprisal"))).toMap
    assert(once === again)
  }

  test("bigramPmi: hand-computed PMI, short docs skipped, top-K tie order") {
    val docs = Seq(
      (1L, "new york new york"),
      (2L, "new car"),
      (3L, "solo") // <2 tokens → contributes no bigram (but 1 unigram)
    ).toDF("doc_id", "text")
    val out = TextOps.bigramPmi(docs, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // bigrams: (new,york):2 (york,new):1 (new,car):1; TB=4
    // unigrams: new:3 york:2 car:1 solo:1; TU=7
    assert(out.keySet === Set(("new", "york"), ("york", "new"), ("new", "car")))
    assert(out(("new", "york"))._1 === 2L)
    val pmiNy = math.log((2.0 / 4.0) / ((3.0 / 7.0) * (2.0 / 7.0)))
    assert(math.abs(out(("new", "york"))._2 - pmiNy) < 1e-9)
    // top-K boundary: count desc then lexicographic keeps (new,car) over
    // (york,new)? no — (new,car) < (york,new) lexicographically
    val top2 = TextOps.bigramPmi(docs, "text", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(top2 === Set(("new", "york"), ("new", "car")))
  }

  test("bigramPmi: true collocations outscore chance pairs of frequent words") {
    val docs = (
      (0 until 30).map(i => (i.toLong, "zanzibar quokka")) ++         // always together
      (0 until 30).map(i => (100L + i, s"the w$i")) ++                // 'the' pairs with everything
      (0 until 30).map(i => (200L + i, s"v$i the"))
    ).toDF("doc_id", "text")
    val out = TextOps.bigramPmi(docs, "text", topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val colloc = out(("zanzibar", "quokka"))
    out.filter { case (k, _) => k._1 == "the" || k._2 == "the" }
      .foreach { case (_, pmi) => assert(colloc > pmi) }
  }

  test("compressionRatio: template spam compresses far below prose; empty scores 1") {
    val docs = Seq(
      (1L, "click here buy now " * 50),                       // template spam
      (2L, "The quick brown fox jumps over the lazy dog and then " +
        "wanders toward a meadow where seventeen unrelated ideas bloom."),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.compressionRatio(spark, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bytes"), r.getAs[Double]("compress_ratio"))).toMap
    assert(out(1L)._2 < 0.2, s"spam should compress hard: ${out(1L)}")
    assert(out(2L)._2 > out(1L)._2 * 2, "prose must compress far less than spam")
    assert(out(3L) === (0L, 1.0))
    // deterministic under a different layout
    val again = TextOps.compressionRatio(spark, docs.repartition(7),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("compress_ratio")).toMap
    assert(again === out.map { case (k, v) => k -> v._2 })
  }

  test("compressionRatio: golden fixture pins exact per-doc DEFLATE sizes") {
    // The q_compress_ratio gate is rows-only (DEFLATE is not
    // SQL-replayable), so this frozen corpus backs it with asserted
    // values: exact compressed byte counts produced by the JDK's bundled
    // zlib at level 6 (recorded 2026-08, JDK 17). ASSUMPTION: java.util
    // .zip.Deflater output is deterministic for a fixed JDK major — a JDK
    // swap that bumps the bundled zlib will shift these counts, and this
    // test failing after a toolchain change means re-record, not a bug
    // (NOTES.md "compression-ratio golden fixture").
    val corpus = Seq(
      (1L, "click here buy now click here buy now click here buy now " +
        "click here buy now "),                                // 76 raw
      (2L, "The quick brown fox jumps over the lazy dog while seventeen " +
        "unrelated ideas bloom in a distant meadow."),         // 102 raw
      (3L, "a" * 60),                                          // 60 raw
      (4L, "abcdefghijklmnopqrstuvwxyz0123456789"),            // 36 raw: EXPANDS
      (5L, "Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed " +
        "do eiusmod tempor incididunt ut labore et dolore magna aliqua.")
    ).toDF("doc_id", "text")
    val golden = Map( // doc_id -> (raw bytes, deflated bytes)
      1L -> (76L, 30L), 2L -> (102L, 90L), 3L -> (60L, 12L),
      4L -> (36L, 44L), 5L -> (123L, 98L))
    val out = TextOps.compressionRatio(spark, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bytes"), r.getAs[Double]("compress_ratio"))).toMap
    golden.foreach { case (id, (raw, deflated)) =>
      assert(out(id)._1 === raw, s"doc $id raw size")
      // the operator divides deflated/raw as doubles — assert the exact
      // IEEE quotient, not an approximation
      assert(out(id)._2 === deflated.toDouble / raw.toDouble,
        s"doc $id ratio: got ${out(id)._2}, want $deflated/$raw")
    }
    // incompressible short text must expand (zlib header + stored cost):
    // the screen's "ratio >= 1" band is real, not theoretical
    assert(out(4L)._2 > 1.0)
  }

  private def bgs(rows: (Long, String)*)(vocabK: Int = 10) =
    TextOps.bigramSurprisal(rows.toDF("doc_id", "text"), "doc_id", "text",
        vocabK = vocabK)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_oov_bigrams"),
          Option(r.getAs[java.lang.Double]("bigram_surprisal"))
            .map(_.doubleValue())))).toMap

  test("bigramSurprisal: hand-computed smoothed conditional") {
    // corpus pairs: (a,b)x2, (b,a)x2; c1(a)=c1(b)=2; alpha=.1, V=10 ->
    // P = (2+.1)/(2+1) = 0.7 for every pair; surprisal = -ln(0.7)
    val out = bgs(1L -> "a b a b", 2L -> "b a")()
    val expected = BigDecimal(-math.log(0.7))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) === ((3L, 0L, Some(expected))))
    assert(out(2L) === ((1L, 0L, Some(expected))))
  }

  test("bigramSurprisal: scrambled word order scores higher than natural") {
    // corpus dominated by 'x y'; the reversed doc's pair is rare
    val docs = (1L to 20L).map(i => i -> "x y") :+ (99L -> "y x")
    val out = bgs(docs: _*)()
    val natural = out(1L)._3.get
    val scrambled = out(99L)._3.get
    assert(scrambled > natural,
      s"order-aware model must flag reversal: $scrambled vs $natural")
  }

  test("bigramSurprisal: OOV pairs excluded and counted; degenerate docs NULL") {
    // vocabK=2 keeps only the two most frequent tokens (a, b); 'zzz'
    // is out-of-vocab so both its pairs drop
    val out = bgs(
      1L -> "a b zzz a",   // pairs: (a,b) in-vocab, (b,zzz)+(zzz,a) OOV
      2L -> "a a b b a",
      3L -> "zzz qqq",     // all pairs OOV -> NULL score
      4L -> "solo",        // no pairs at all
      5L -> "")(vocabK = 2)
    assert(out(1L)._1 === 3L && out(1L)._2 === 2L && out(1L)._3.isDefined)
    assert(out(3L) === ((1L, 1L, None)))
    assert(out(4L) === ((0L, 0L, None)))
    assert(out(5L) === ((0L, 0L, None)))
  }

  test("cooccurrencePmi: window pairs counted once, canonicalized, " +
      "hand-checked PMI") {
    // doc "a b c", window 2 → pairs (a,b), (b,c), (a,c): each count 1;
    // unigrams a,b,c = 1 each, TU=3, TP=3
    val df = Seq(Tuple1("a b c")).toDF("text")
    val out = TextOps.cooccurrencePmi(df, "text", window = 2, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_pair"), r.getAs[Double]("pmi")))).toMap
    assert(out.keySet === Set(("a", "b"), ("b", "c"), ("a", "c")))
    // pmi = ln((1/3) / ((1/3)·(1/3))) = ln 3
    val ln3 = BigDecimal(math.log(3.0))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("a", "b")) === ((1L, ln3)))
  }

  test("cooccurrencePmi: reversed order canonicalizes; window 1 is adjacency") {
    val df = Seq(Tuple1("b a"), Tuple1("a b")).toDF("text")
    val out = TextOps.cooccurrencePmi(df, "text", window = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_pair")).toMap
    assert(out === Map(("a", "b") -> 2L))
  }

  test("cooccurrencePmi: topK boundary is deterministic (count desc, pair asc)") {
    val df = Seq(Tuple1("x y x y"), Tuple1("p q")).toDF("text")
    // window 1 pairs: (x,y)x3, (p,q)x1 → topK=1 keeps (x,y)
    val out = TextOps.cooccurrencePmi(df, "text", window = 1, topK = 1)
      .collect()
    assert(out.length === 1)
    assert((out.head.getString(0), out.head.getString(1)) === (("x", "y")))
  }

  test("tfidfCosinePairs: identical docs hit cosine 1; disjoint emit " +
      "nothing; weights matter") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon"), (4L, "alpha alpha alpha beta"))
      .toDF("doc_id", "text")
    val out = TextOps.tfidfCosinePairs(df, "doc_id", "text", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Double]("cosine")))).toMap
    assert(math.abs(out((1L, 2L))._2 - 1.0) < 1e-12,
      "identical docs → cosine ~1 (sqrt rounding allows one ulp)")
    assert(!out.contains((1L, 3L)), "no shared term → no candidate pair")
    // doc 4 shares alpha+beta with 1/2 but with different tf weights
    assert(out((1L, 4L))._1 === 2L)
    assert(out((1L, 4L))._2 > 0.0 && out((1L, 4L))._2 < 1.0)
  }

  test("tfidfCosinePairs: maxDf prunes stopword postings before pairing") {
    // 'the' appears in all 4 docs; with maxDf=3 it cannot create pairs
    val df = Seq((1L, "the unique1"), (2L, "the unique2"),
      (3L, "the unique3"), (4L, "the unique4")).toDF("doc_id", "text")
    val all = TextOps.tfidfCosinePairs(df, "doc_id", "text", 0.0)
    assert(all.count() === 6L, "stopword links every pair")
    val pruned = TextOps.tfidfCosinePairs(df, "doc_id", "text", 0.0,
      maxDf = 3L)
    assert(pruned.count() === 0L, "pruned stopword → no candidates at all")
  }

  test("tfidfCosinePairs: layout-exact (ordered folds)") {
    val df = (1L to 80L).map(i =>
      (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 7} filler${i % 11}"))
      .toDF("doc_id", "text")
    val a = TextOps.tfidfCosinePairs(df, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq).toMap
    val b = TextOps.tfidfCosinePairs(df.repartition(11), "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq).toMap
    assert(a === b && a.nonEmpty)
  }

  test("zipfFit: an exact power law recovers its slope with r2 = 1") {
    // freq(rank) = 1000·rank^(-1) exactly for ranks 1..8: tokens t1..t8
    // with counts 1000/r (integers: 1000,500,333? no — use 840/r exact
    // for r in 1,2,3,4: 840,420,280,210 and distinct tokens)
    val counts = Seq(840, 420, 280, 210, 168, 140, 120, 105) // 840/r
    val docs = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(s"t$i") }.grouped(50).map(g => Tuple1(g.mkString(" ")))
      .toSeq.toDF("text")
    val out = TextOps.zipfFit(docs, "text", topK = 8).collect().head
    assert(out.getAs[Long]("n_types") === 8L)
    assert(math.abs(out.getAs[Double]("slope") - (-1.0)) < 1e-9)
    assert(math.abs(out.getAs[Double]("r2") - 1.0) < 1e-12)
  }

  test("zipfFit: a flat (uniform) vocabulary has slope ~0 and NULL/low r2") {
    val docs = Seq(Tuple1((1 to 6).map(i => s"u$i").mkString(" ")))
      .toDF("text")
    val out = TextOps.zipfFit(docs, "text", topK = 6).collect().head
    assert(out.getAs[Double]("slope") === 0.0)
    // vary = 0 → r2 undefined → NULL
    assert(out.get(3) === null)
  }

  test("zipfFit: layout-independent (rank-ordered pre-rounded fold)") {
    val docs = (1 to 200).map(i =>
      Tuple1(s"a${i % 13} b${i % 7} c${i % 3} d d e")).toDF("text")
    val a = TextOps.zipfFit(docs, "text", 20).collect().head.toSeq
    val b = TextOps.zipfFit(docs.repartition(9), "text", 20)
      .collect().head.toSeq
    assert(a === b)
  }

  test("bigramSurprisal: layout-independent (ordered pair fold)") {
    val docs = (1L to 60L).map(i =>
      i -> s"w${i % 5} w${(i + 1) % 7} w${i % 3} w${(i + 2) % 5} w${i % 2}")
    val df = docs.toDF("doc_id", "text")
    val a = TextOps.bigramSurprisal(df, "doc_id", "text", vocabK = 6)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val b = TextOps.bigramSurprisal(df.repartition(11), "doc_id", "text",
        vocabK = 6)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(a === b)
  }

  test("lexicalDiversity: hand counts, template-vs-prose signal, empty doc") {
    val df = Seq(
      (1L, "the cat sat on the mat"),        // 6 tokens, 5 types, hapax 4
      (2L, "spam spam spam spam"),           // 4 tokens, 1 type, hapax 0
      (3L, "")                               // empty → zeros, NULL ratios
    ).toDF("doc_id", "text")
    val out = TextOps.lexicalDiversity(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val d1 = out(0)
    assert(d1.getAs[Long]("n_tokens") === 6L && d1.getAs[Long]("n_types") === 5L)
    assert(d1.getAs[Long]("n_hapax") === 4L) // cat sat on mat; 'the' repeats
    assert(d1.getAs[Double]("ttr") === 5.0 / 6.0)
    assert(d1.getAs[Double]("hapax_share") === 0.8)
    val d2 = out(1)
    assert(d2.getAs[Double]("ttr") === 0.25 && d2.getAs[Double]("hapax_share") === 0.0)
    assert(d2.getAs[Double]("ttr") < d1.getAs[Double]("ttr")) // spam scores lower
    val d3 = out(2)
    assert(d3.getAs[Long]("n_tokens") === 0L && d3.isNullAt(d3.fieldIndex("ttr")))
  }

  test("oov rate: corpus-defined vocab, hand-counted misses, empty-doc NULL") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "a a b c"), (2L, "z z z"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // vocab (count desc, token asc): z(3), a(2) — b/c are OOV
    assert(out(1L).getAs[Long]("n_tokens") === 4L)
    assert(out(1L).getAs[Long]("n_oov") === 2L)
    assert(out(1L).getAs[Double]("oov_rate") === 0.5)
    assert(out(2L).getAs[Double]("oov_rate") === 0.0)
    assert(out(3L).getAs[Long]("n_tokens") === 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("oov_rate")))
  }

  test("ngram diversity: hand-counted ratios; short docs skip higher n") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(("s", "a b a b"), ("s", "a a a"), ("s", ""),
        ("t", "x"))
      .toDF("source", "text")
    val out = TextOps.ngramDiversity(docs, "text", Seq("source"), maxN = 3)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("n")) -> r).toMap
    // source s unigrams: a,b,a,b,a,a,a → 7 total, 2 distinct
    assert(out(("s", 1)).getAs[Long]("total_ngrams") === 7L)
    assert(out(("s", 1)).getAs[Long]("distinct_ngrams") === 2L)
    assert(out(("s", 1)).getAs[Double]("diversity") === 2.0 / 7.0)
    // bigrams: "a b","b a","a b" + "a a","a a" → 5 total, 3 distinct
    assert(out(("s", 2)).getAs[Long]("total_ngrams") === 5L)
    assert(out(("s", 2)).getAs[Long]("distinct_ngrams") === 3L)
    // trigrams: "a b a","b a b","a a a" → all unique
    assert(out(("s", 3)).getAs[Double]("diversity") === 1.0)
    // one-token source: unigram row only — no fabricated descending grams
    assert(out.contains(("t", 1)) && !out.contains(("t", 2)))
  }
}
