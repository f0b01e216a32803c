package graft

import org.apache.spark.sql.functions._

import graft.analysis.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    spark.range(1).select(c.as("x")).collect().head

  test("normalization lowercases, strips symbols, collapses whitespace") {
    assert(one(TextAnalysis.normalized(lit("  Hello,   WORLD!! 42  "))).getString(0)
      === "hello world 42")
  }

  test("bpe-ish token count segments words, digit runs, and symbols") {
    // "don't stop99!" → don, ', t, stop, 99, !
    assert(one(TextAnalysis.bpeTokenCount(lit("don't stop99!"))).getInt(0) === 6)
  }

  test("text stats: counts, ratios, quality bands") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog ran to the park"),
      (2L, "aaa aaa aaa aaa")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.textStats(docs).orderBy("doc_id").collect()
    val rich = out(0)
    assert(rich.getAs[Int]("n_tokens") === 13)
    assert(rich.getAs[Double]("stopword_ratio") > 0.3) // the/on/and/to/the...
    assert(rich.getAs[String]("quality_band") !== null)
    val poor = out(1)
    assert(poor.getAs[Int]("n_unique_tokens") === 1)
    assert(poor.getAs[Double]("stopword_ratio") === 0.0)
    assert(poor.getAs[Double]("quality_score") < rich.getAs[Double]("quality_score"))
  }

  test("readability: hand-counted words/sentences/syllables and the exact Flesch quantization") {
    val docs = Seq(
      (1L, "The cat sat. It ran fast!"), // 6 words, 2 sentence runs, 6 one-syllable words
      (2L, "Beautiful rhythm"),          // eau|i|u = 3; rhythm has only the y run = 1; no terminator -> 1 sentence
      (3L, "")                           // empty: excluded
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs).orderBy("doc_id").collect()
    assert(out.length === 2)
    val r1 = out(0)
    assert(r1.getAs[Int]("n_words") === 6 && r1.getAs[Long]("n_sents") === 2L
      && r1.getAs[Long]("n_syllables") === 6L)
    // the gate value is the same IEEE expression the operator computes —
    // assert against it rather than a hand-rounded constant
    val f1 = 206.835 - 1.015 * (6.0 / 2) - 84.6 * (6.0 / 6)
    assert(r1.getAs[Long]("flesch_micro") === math.floor(f1 * 1e6 + 0.5).toLong)
    val r2 = out(1)
    assert(r2.getAs[Int]("n_words") === 2 && r2.getAs[Long]("n_sents") === 1L
      && r2.getAs[Long]("n_syllables") === 4L)
    val f2 = 206.835 - 1.015 * (2.0 / 1) - 84.6 * (4.0 / 2)
    assert(r2.getAs[Long]("flesch_micro") === math.floor(f2 * 1e6 + 0.5).toLong)
  }

  test("rarity buckets: within-language tertiles follow the integer rarity ranking") {
    // en: d1 all-common tokens, d2 mixed, d3 all-rare -> head/middle/tail;
    // fr (n=2): tertile arithmetic gives no head (3*1 > 2), so middle/tail
    val docs = Seq(
      (1L, "the the the the", "en"),
      (2L, "the cat", "en"),
      (3L, "zzyzx qwfp", "en"),
      (4L, "le le le", "fr"),
      (5L, "le chat rare", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.rarityBuckets(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("bucket"), r.getAs[Boolean]("kept"),
          r.getAs[Long]("lang_rank")))).toMap
    assert(out(1L) === (("head", true, 1L)))
    assert(out(2L) === (("middle", true, 2L)))
    assert(out(3L) === (("tail", false, 3L)))
    assert(out(4L) === (("middle", true, 1L)))
    assert(out(5L) === (("tail", false, 2L)))
  }

  test("lang id picks the language with most marker hits; unknown when none") {
    val docs = Seq(
      (1L, "the cat and the dog is fast", "en"),
      (2L, "der hund und die katze ist nicht da", "de"),
      (3L, "zzz qqq www", "zz")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("guessed_lang") === "en")
    assert(out(1).getAs[String]("guessed_lang") === "de")
    assert(out(2).getAs[String]("guessed_lang") === "unknown")
  }

  test("fingerprint is normalization-invariant; robust fingerprint survives a tail edit") {
    val fp = spark.range(1).select(
      TextAnalysis.fingerprint(lit("Hello,  World!")).as("a"),
      TextAnalysis.fingerprint(lit("hello world")).as("b")).collect().head
    assert(fp.getString(0) === fp.getString(1))

    // a one-token tail edit perturbs ≤ 3 shingles, so bottom-8 sketches
    // must overlap in ≥ 5 elements; an unrelated doc shares nothing
    val base = (1 to 30).map(i => s"word$i").mkString("", " ", " ") // distinct shingles
    val rf = spark.range(1).select(
      size(array_intersect(
        TextAnalysis.robustSketch(lit(base + "tail one")),
        TextAnalysis.robustSketch(lit(base + "tail two")))).as("near"),
      size(array_intersect(
        TextAnalysis.robustSketch(lit(base + "tail one")),
        TextAnalysis.robustSketch(lit("entirely different text here now")))).as("far"))
      .collect().head
    assert(rf.getAs[Int]("near") >= 5, "local edit keeps most of the sketch")
    assert(rf.getAs[Int]("far") === 0)
  }

  test("repetitionStats: looping text scores high, clean prose low, degenerate docs zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),          // one token looped
      (2L, "the quick brown fox jumps over dogs"),    // all distinct
      (3L, "ab"),                                     // 1 token: no n-grams
      (4L, "")                                        // empty
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m(1L)._1 > 0.8 && m(1L)._2 > 0.7 && m(1L)._3 > 0.7, s"looped: ${m(1L)}")
    assert(m(2L) === ((0.0, 0.0, 0.0)))
    assert(m(3L)._2 === 0.0 && m(3L)._3 === 0.0)
    assert(m(4L) === ((0.0, 0.0, 0.0)))
  }

  test("topNgrams: doc_freq counts distinct docs, total_count keeps repeats, ties break lexically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat the cat sat"), // "the cat sat" twice in ONE doc
      (2L, "the cat sat on a mat"),
      (3L, "a dog ran a dog ran"),
      (4L, "zz top band zz top band") // ties with "a dog ran" on both counts
    ).toDF("doc_id", "text")
    val top = TextAnalysis.topNgrams(docs, n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.head === (("the cat sat", 2L, 3L))) // 2 docs, 3 occurrences
    // doc 3 and doc 4 shapes tie at (1 doc, 2 occurrences) repeatedly;
    // within equal counts the ngram itself must order the output
    val tied = top.tail.map(_._1)
    assert(tied === tied.sorted, s"tie order must be lexicographic: ${tied.toSeq}")
  }

  test("contamination: full/partial/zero overlap and sub-n-token docs") {
    val evalSet = Seq((100L, "alpha bravo charlie delta echo")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha bravo charlie delta echo"),               // all 3 n-grams shared
      (2L, "alpha bravo charlie unrelated words here pad"), // 1 of 5 shared = 0.2 boundary
      (3L, "completely different text about something else"),
      (4L, "too short")                                     // < 3 tokens → 0 n-grams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramContamination(corpus, evalSet, n = 3, minRatio = 0.2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((3, 3L, 1.0, true)))
    assert(out(2L) === ((5, 1L, 0.2, true))) // ratio ≥ minRatio is inclusive
    assert(out(3L) === ((4, 0L, 0.0, false)))
    assert(out(4L) === ((0, 0L, 0.0, false)))
  }

  test("pii scrub: counts and fixed-order redaction of emails, phones, ips") {
    val docs = Seq(
      (1L, "mail a.b+c@test.org or x@y.io, dial 010-1234-5678, host 10.0.0.1"),
      (2L, "nothing sensitive here at all"),
      (3L, "ip only 192.168.255.3 twice 192.168.255.3")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiStats(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4), r.getBoolean(5)))).toMap
    assert(out(1L) === ((2, 1, 1,
      "mail <EMAIL> or <EMAIL>, dial <PHONE>, host <IP>", true)))
    assert(out(2L) === ((0, 0, 0, "nothing sensitive here at all", false)))
    assert(out(3L) === ((0, 0, 2, "ip only <IP> twice <IP>", true)))
  }

  test("token entropy: uniform is log2(n), constant is 0, empty docs drop") {
    val docs = Seq(
      (1L, "a b c d"),         // 4 distinct, uniform -> H = 2.0
      (2L, "x x x x"),         // one token -> H = 0.0
      (3L, "a a b b"),         // 2 distinct, uniform -> H = 1.0
      (4L, ""),                // no tokens -> no row
      (5L, "a a a b")          // H = 2 - (3*log2 3)/4 = 0.8113
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((4L, 4L, 2.0)))
    assert(out(2L) === ((4L, 1L, 0.0)))
    assert(out(3L) === ((4L, 2L, 1.0)))
    assert(out(5L) === ((4L, 2L, 0.8113)))
    assert(!out.contains(4L))
  }

  test("unigram log-prob: hand-computed smoothed model, empty doc null") {
    val docs = Seq(
      (1L, "a a b"), (2L, "a c"), (3L, "")
    ).toDF("doc_id", "text")
    // freq: a=3, b=1, c=1; N=5, V=3 -> p(a)=4/8, p(b)=p(c)=2/8
    val out = TextAnalysis.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 === 3L)
    assert(out(1L)._2 === r6((2 * math.log(0.5) + math.log(0.25)) / 3))
    assert(out(2L)._1 === 2L)
    assert(out(2L)._2 === r6((math.log(0.5) + math.log(0.25)) / 2))
    assert(out(3L)._1 === 0L && out(3L)._2.isNaN)
  }

  test("mixture weights: shares sum to 1, weight equalizes source token mass") {
    val docs = Seq(
      (1L, "a b c d e f", "crawl"), (2L, "g h i j k l", "crawl"),
      (3L, "m n o p", "books")
    ).toDF("doc_id", "text", "source")
    val out = graft.analysis.CorpusPrep.sourceMixtureWeights(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("crawl") === ((2L, 12L, 0.75, 0.666667)))
    assert(out("books") === ((1L, 4L, 0.25, 2.0)))
    // share x weight = 1/n_sources for every source: the rebalanced mixture
    // is uniform (up to the round-6 emission)
    out.values.foreach { case (_, _, share, weight) =>
      assert(math.abs(share * weight - 0.5) < 1e-5)
    }
  }

  test("source divergence: identical slices give 0, disjoint vocab gives ln 2") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "alpha beta gamma delta", "s2"), // same distribution as s1
      (3L, "omega psi chi phi", "s3") // fully disjoint vocabulary
    ).toDF("doc_id", "text", "source")
    val out = graft.analysis.TextAnalysis.sourceDivergence(docs, topV = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size === 3) // one row per unordered pair
    assert(out(("s1", "s2")) === 0.0)
    // JSD of disjoint distributions is its ln 2 upper bound
    assert(out(("s1", "s3")) === 0.693147)
    assert(out(("s2", "s3")) === 0.693147)
  }

  test("temperature resample: alpha flattens the mixture, dominant source downsampled, alpha=1 is identity") {
    // 90/10 split: at alpha=0.5 the target shares are 3:1, so the big
    // source keeps ~83% (0.75*100/90) and the small one keeps everything
    val docs = (1L to 90L).map(i => (i, "x", "crawl")) ++
      (91L to 100L).map(i => (i, "x", "books"))
    val df = docs.toDF("doc_id", "text", "source")
    val out = graft.analysis.CorpusPrep.temperatureResample(df, alpha = 0.5)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3), r.getLong(4))))
      .toMap
    val (nCrawl, shareCrawl, bpCrawl, keptCrawl) = out("crawl")
    val (nBooks, shareBooks, bpBooks, keptBooks) = out("books")
    assert(nCrawl === 90L && nBooks === 10L)
    assert(shareCrawl === 0.75 && shareBooks === 0.25)
    assert(bpCrawl === 8333 && bpBooks === 10000) // min(1, .25*100/10) = 1
    assert(keptBooks === 10L)            // rate 1.0 keeps every doc
    assert(keptCrawl < 90L && keptCrawl > 60L) // ~83% of 90, hash-gated
    // alpha = 1 is the identity mixture: every rate is 1, everything kept
    val id = graft.analysis.CorpusPrep.temperatureResample(df, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(id === Map("crawl" -> 90L, "books" -> 10L))
  }

  test("bigram lm: hand-computed smoothed NLL; word order matters; short docs null") {
    // corpus bigrams: (a,b)x3, (b,a)x2 -> c1(a)=3, c1(b)=2; V={a,b,x}=3
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "b a"), (4L, "x"), (5L, "")
    ).toDF("doc_id", "text")
    val out = graft.analysis.TextAnalysis.bigramLogProb(docs)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val pAB = -math.log(3.5 / 4.5)            // p(b|a) = (3+.5)/(3+1.5)
    val pBA = -math.log(2.5 / 3.5)            // p(a|b) = (2+.5)/(2+1.5)
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2.get - (2 * pAB + pBA) / 3) < 1e-6)
    assert(math.abs(out(2L)._2.get - pAB) < 1e-6)
    assert(math.abs(out(3L)._2.get - pBA) < 1e-6)
    assert(out(3L)._2.get > out(2L)._2.get) // rare ordering scores worse
    assert(out(4L) === ((0L, None)) && out(5L) === ((0L, None)))
  }

  test("unimax: small sources cap, level redistributes, all-capped degenerate") {
    // token masses 2 / 4 / 10, budget = 16 (the total)
    val docs = Seq(
      (1L, "x y", "a"), (2L, "x y z w", "b"),
      (3L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "c")
    ).toDF("doc_id", "text", "source")
    // 2-epoch caps 4/8/20: a saturates, level (16-4)/2 = 6 serves b and c
    val out = graft.analysis.CorpusPrep.unimaxAllocation(docs, maxEpochsBp = 20000)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("a") === ((2L, 4L, 4.0, 2.0)))
    assert(out("b") === ((4L, 8L, 6.0, 1.5)))
    assert(out("c") === ((10L, 20L, 6.0, 0.6)))
    // 0.5-epoch caps 1/2/5 can't absorb the budget: everyone at cap
    val tight = graft.analysis.CorpusPrep.unimaxAllocation(docs, maxEpochsBp = 5000)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(tight === Map("a" -> 1.0, "b" -> 2.0, "c" -> 5.0))
  }

  test("epoch manifest: floor copies exact, fractional epoch gated at ~frac of the source") {
    // 50 docs x 2 tokens vs 150 docs x 2 tokens, no cap binding: level 200
    // -> small source 2.0 epochs exactly, large 0.666667 -> frac_bp 6666
    val docs = ((1L to 50L).map(i => (i, "w x", "small")) ++
      (51L to 200L).map(i => (i, "w x", "large"))).toDF("doc_id", "text", "source")
    val out = graft.analysis.CorpusPrep.epochMaterialize(docs, maxEpochsBp = 50000)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.length === 200)
    assert(out.filter(_._2 == "small").forall(_._3 === 2)) // integer epochs: no gate
    val largeCopies = out.filter(_._2 == "large").map(_._3)
    assert(largeCopies.forall(c => c === 0 || c === 1))
    val extra = largeCopies.count(_ === 1)
    assert(extra > 80 && extra < 120) // md5 gate at 6666 bp of 150 docs
    // replayable: the manifest is a pure function of the data
    val again = graft.analysis.CorpusPrep.epochMaterialize(docs, maxEpochsBp = 50000)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.sorted.toSeq === again.sorted.toSeq)
  }

  test("training order: dense replayable ranks, copies at independent positions, seed repermutes") {
    val docs = Seq(
      (1L, "x y", "a"), (2L, "x y z w", "b"),
      (3L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "c")
    ).toDF("doc_id", "text", "source")
    // 2-epoch caps: a gets 2 copies exactly; b/c fractional-gated
    val out = graft.analysis.CorpusPrep.trainingOrder(docs, maxEpochsBp = 20000)
      .orderBy("global_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.map(_._1).toSeq === (1L to out.length.toLong)) // dense 1..N
    assert(out.count(_._2 == 1L) === 2)                       // both copies of doc 1
    val again = graft.analysis.CorpusPrep.trainingOrder(docs, maxEpochsBp = 20000)
      .orderBy("global_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.toSeq === again.toSeq)                         // replayable
    val ep2 = graft.analysis.CorpusPrep.trainingOrder(docs, maxEpochsBp = 20000,
        seed = "ep2")
      .orderBy("global_rank").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(ep2.sorted.toSeq === out.map(t => (t._2, t._3)).sorted.toSeq) // same multiset
    assert(ep2.toSeq !== out.map(t => (t._2, t._3)).toSeq)    // different permutation
  }

  test("dsir: target-vocabulary docs win the draw, exactly nSelect selected, rerun-stable") {
    // target docs speak vocabulary A, the rest vocabulary B; 30 tokens per
    // doc push |log_w| far beyond the O(1) Gumbel noise, so the draw is
    // decided by content despite the resampling jitter
    val a = "alpha beta gamma " * 10
    val b = "zulu yankee xray " * 10
    val docs = ((1L to 10L).map(i => (i, a, "en")) ++
      (11L to 20L).map(i => (i, b, "de"))).toDF("doc_id", "text", "lang")
    val out = graft.analysis.CorpusPrep.dsirSelect(docs,
        isTarget = col("lang") === "en", nSelect = 10)
      .orderBy("doc_id").collect()
    assert(out.length === 20)
    assert(out.forall(_.getAs[Long]("n_tokens") === 30L))
    val selected = out.filter(_.getAs[Boolean]("selected")).map(_.getAs[Long]("doc_id")).toSet
    assert(selected === (1L to 10L).toSet) // content dominates the draw
    // target docs carry positive evidence, off-target strongly negative
    // (micro-units: BIGINT millionths since the r8 integer-gate rewrite)
    out.foreach { r =>
      val w = r.getAs[Long]("log_w_micro")
      if (r.getAs[Long]("doc_id") <= 10L) assert(w > 0L) else assert(w < -10000000L)
    }
    val again = graft.analysis.CorpusPrep.dsirSelect(docs,
        isTarget = col("lang") === "en", nSelect = 10)
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq) // stateless draw
  }

  test("batch packing: length-sorted batches, padding math, empty-doc tail") {
    // 5 docs of lengths 4,4,3,1,0 with batchSize 2:
    // batch0 = (4,4) pad 0; batch1 = (3,1) pad 1-4/6; batch2 = (0) pad 0
    val docs = Seq(
      (1L, "a b c d"), (2L, "w x y z"), (3L, "a b c"), (4L, "q"), (5L, "")
    ).toDF("doc_id", "text")
    val out = graft.analysis.CorpusPrep.lengthBucketedBatches(docs, batchSize = 2)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(0) === ((2L, 4, 8L, 0.0)))
    assert(out(1) === ((2L, 3, 4L, 0.3333)))
    assert(out(2) === ((1L, 0, 0L, 0.0)))
  }

  test("ngram novelty: first doc owns every shingle; verbatim copy scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),   // first: novelty 1
      (2L, "alpha beta gamma delta epsilon"),   // exact copy: novelty 0
      (3L, "alpha beta gamma zeta eta theta"),  // shares 1 of 4 shingles
      (4L, "xy")                                // too short: 0 shingles
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((3L, 3L, 1.0)))
    assert(out(2L) === ((3L, 0L, 0.0)))
    assert(out(3L) === ((4L, 3L, 0.75)))
    assert(out(4L) === ((0L, 0L, 0.0)))
  }

  test("vocab growth: cumulative counts exact, new types attributed to min decile") {
    import spark.implicits._
    // each doc carries one shared token and one unique token — vocab must
    // grow by exactly (docs in decile) new types per decile, plus 'shared'
    // once in the first non-empty decile
    val docs = (0L until 200L).map(i => (i, s"shared unique$i")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs).orderBy("decile").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length === 10)
    // totals reconcile exactly
    assert(out.last._2 === 200L)
    assert(out.last._3 === 400L)         // 2 tokens per doc
    assert(out.last._5 === 201L)         // 200 unique + 1 shared
    // cumulative columns are monotone and consistent with per-decile news
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3 && b._5 === a._5 + b._4)
    }
    // every decile's new types = its docs' unique tokens (+1 shared in the
    // first nonempty decile)
    val firstNonEmpty = out.find(_._2 > 0).get._1
    out.foreach { case (d, _, _, news, _) =>
      val docsIn = if (d == 1) out.head._2 else out(d - 1)._2 - out(d - 2)._2
      val expect = docsIn + (if (d == firstNonEmpty) 1 else 0)
      assert(news === expect, s"decile $d: $news != $expect")
    }
  }

  test("dataset card: volume, quality, dup rate, and majority language line up") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the data data", "web", "en"),
      (2L, "the the data data", "crawl", "en"),   // exact dup, charged to crawl
      (3L, "unique words here now", "crawl", "de")
    ).toDF("doc_id", "text", "source", "lang")
    val out = graft.analysis.CorpusPrep.datasetCard(docs)
      .orderBy("source").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getString(6), r.getDouble(7)))).toMap
    // both fixture docs score 41.6 (1.6 length + diversity + stopword terms)
    assert(out("web") === ((1L, 4L, 4.0, 41.6, 0.0, "en", 1.0)))
    assert(out("crawl")._1 === 2L && out("crawl")._2 === 8L)
    assert(out("crawl")._5 === 0.5)           // doc 2 is the dropped copy
    assert(out("crawl")._6 === "en" && out("crawl")._7 === 0.5)  // tie -> lang desc
  }

  test("dictionary tags: multiplicity counted, non-dictionary tokens ignored, no-hit docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join the hash join table"),
      (2L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dictionaryTags(docs, Seq("join", "hash", "scan"))
      .orderBy("doc_id", "term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "hash", 1L), (1L, "join", 2L)))
  }

  test("stupid backoff: seen bigram, unigram backoff, unknown floor — hand-computed") {
    import spark.implicits._
    // train: unigrams a2 b2 c1 (N=5); bigrams (a,b)x2 (b,a)x1 (b,c)x1
    val train = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    // eval: (a,b) seen -> 2/2 = 1.0; (b,z) unknown w2 -> 0.16/5 = 0.032;
    // (z,c) unigram backoff -> 0.4*1/5 = 0.08
    val eval0 = Seq((10L, "a b z c"), (20L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoff(train, eval0)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(10L)._1 === 3L)
    assert(out(10L)._2 === Some(0.333333))            // 1 of 3 bigrams seen
    assert(out(10L)._3 === Some(0.370667))            // (1.0+0.032+0.08)/3
    assert(out(20L) === ((0L, None, None)))           // too short to score
  }

  test("stupid backoff: scoring the training slice itself hits every bigram") {
    import spark.implicits._
    val train = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoff(train, train).collect().head
    assert(out.getDouble(2) === 1.0)  // hit_rate: every bigram is in the model
  }

  test("count of counts: f_k table, unseen mass, Good-Turing only across contiguous k") {
    import spark.implicits._
    // corpus counts: a=3, b=1, c=1, d=2 -> f1=2, f2=1, f3=1, N=7
    val docs = Seq((1L, "a a a b"), (2L, "c d d")).toDF("doc_id", "text")
    val out = TextAnalysis.countOfCounts(docs).orderBy("k").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), Option(r.get(3))))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L)._1 === 2L && out(2L)._1 === 1L && out(3L)._1 === 1L)
    // mass: k*f_k/N; the k=1 row's mass is the unseen-probability estimate
    assert(out(1L)._2 === 0.285714 && out(2L)._2 === 0.285714 && out(3L)._2 === 0.428571)
    // c*: (k+1)f_{k+1}/f_k where the next class is exactly k+1; null at edge
    assert(out(1L)._3 === Some(1.0))   // 2*1/2
    assert(out(2L)._3 === Some(3.0))   // 3*f3/f2 = 3*1/1
    assert(out(3L)._3 === None)
  }

  test("count of counts: trigram units keep multiplicity") {
    import spark.implicits._
    // trigrams of "a b c a b c": [a b c, b c a, c a b, a b c] ->
    // f1=2, f2=1, N=4
    val docs = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.countOfCounts(docs, ngramN = 3).orderBy("k").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), Option(r.get(3))))).toMap
    assert(out === Map(
      1L -> ((2L, 0.5, Some(1.0))),   // c* = 2*f2/f1 = 2*1/2
      2L -> ((1L, 0.5, None))))
  }

  test("count of counts: artifact merge law — split slices sum to the rebuild") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c"),
      (2L, "a b c d e f"),
      (3L, "x y z x y z x")
    ).toDF("doc_id", "text")
    val whole = TextAnalysis.countOfCounts(docs, ngramN = 3)
      .orderBy("k").collect().toSeq
    val stored = TextAnalysis.ngramCounts(docs.filter(col("doc_id") === 1), ngramN = 3)
    val fresh = TextAnalysis.ngramCounts(docs.filter(col("doc_id") >= 2), ngramN = 3)
    val merged = stored.unionByName(fresh).groupBy("tok").agg(sum("k").as("k"))
    val inc = TextAnalysis.countOfCountsFromCounts(merged)
      .orderBy("k").collect().toSeq
    assert(inc === whole)
    // "a b c" spans the slice boundary (2x in doc 1, 1x in doc 2): its
    // merged count must be the SUM, not a max/overwrite
    val fp = spark.range(1)
      .select(graft.analysis.Sketches.hash60(lit("a b c")).as("h"))
      .collect().head.getLong(0)
    assert(merged.filter(col("tok") === fp).collect().head.getLong(1) === 3L)
  }

  test("count of counts: gap in the k table leaves c* undefined") {
    import spark.implicits._
    // counts: a=3, b=1, c=1 -> f1=2, f3=1; k=1 has no k=2 neighbor
    val docs = Seq((1L, "a a a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.countOfCounts(docs).orderBy("k").collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out === Map(1L -> None, 3L -> None))
  }

  test("zipf slope: two-point fits are exact; ties rank by token asc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a b b", "s1"),   // counts 4,2 -> slope ln(2/4)/ln2 = -1
      (2L, "x x y y", "s2")        // tied counts -> flat slope 0
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.zipfSlopes(docs).orderBy("source").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("s1")._1 === 2L)
    assert(out("s1")._2 === -1.0)
    assert(out("s1")._3 === 1.386294)  // ln 4
    assert(out("s2")._2 === 0.0)
    assert(out("s2")._3 === 0.693147)  // ln 2
  }

  test("zipf slope: topV caps the fit window") {
    import spark.implicits._
    // 5 distinct types; topV=3 keeps ranks 1..3 only
    val docs = Seq((1L, "a a a a b b b c c d e", "s")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.zipfSlopes(docs, topV = 3).collect()
    assert(out.head.getLong(1) === 3L)
  }

  test("gopher rules: each rule trips independently; keep is the conjunction") {
    import spark.implicits._
    val good = ("w" + (1 to 60).map(i => s" the word$i").mkString)  // 121 tokens, stopwords, diverse
    val tooShort = "the quick brown fox"
    val repetitive = (1 to 80).map(_ => "spam").mkString("the ", " ", "") // diversity fails
    val docs = Seq((1L, good), (2L, tooShort), (3L, repetitive)).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      ((r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9)))).toMap
    assert(byId(1L)._5, "good doc must pass all rules")
    assert(!byId(2L)._1 && !byId(2L)._5, "short doc fails word count and keep")
    assert(!byId(3L)._4 && !byId(3L)._5, "repetitive doc fails diversity and keep")
  }

  test("vocab coverage: hand-counted OOV at each budget, integer ppm, covered edge") {
    import spark.implicits._
    // corpus frequency: aa 5, bb 3, cc 2, dd 1 -> rank aa<bb<cc<dd
    val docs = Seq(
      ("s1", "aa aa aa bb bb"),
      ("s2", "aa aa bb cc cc dd")
    ).toDF("source", "text")
    val out = graft.analysis.TextAnalysis.vocabCoverage(
        docs, budgets = Seq(1, 2, 4), textCol = "text", srcCol = "source")
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // V=1 keeps {aa}: s1 oov = 2 of 5, s2 oov = 4 of 6
    assert(out((1, "s1")) === ((5L, 2L, 400000L)))
    assert(out((1, "s2")) === ((6L, 4L, 666667L))) // round-half-up ppm
    // V=2 keeps {aa,bb}: s1 fully covered, s2 oov = 3
    assert(out((2, "s1")) === ((5L, 0L, 0L)))
    assert(out((2, "s2")) === ((6L, 3L, 500000L)))
    // V >= vocab: everything covered, spine still emits both sources
    assert(out((4, "s1"))._2 === 0L && out((4, "s2"))._2 === 0L)
    assert(out.size === 6)
  }

  test("vocab coverage increment: merged per-source counts reproduce the whole-corpus curve") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "aa aa bb"), (2L, "s2", "aa cc cc dd"),
      (3L, "s1", "bb bb ee"), (4L, "s2", "aa ff"))
      .toDF("doc_id", "source", "text")
    val merged = graft.analysis.TextAnalysis.vocabCounts(docs.filter($"doc_id" <= 2))
      .unionByName(graft.analysis.TextAnalysis.vocabCounts(docs.filter($"doc_id" > 2)))
      .groupBy("source", "tok").agg(sum("n").as("n"))
    val inc = graft.analysis.TextAnalysis
      .vocabCoverageFromCounts(merged, budgets = Seq(1, 3)).collect().map(_.toSeq)
    val full = graft.analysis.TextAnalysis
      .vocabCoverage(docs, budgets = Seq(1, 3), srcCol = "source").collect().map(_.toSeq)
    assert(inc.toSeq === full.toSeq) // THE LAW: merge ≡ rebuild
  }

  test("bpe trainer: the hand-computed Sennrich fixture adopts l+o, lo+w, e+r") {
    import spark.implicits._
    // vocab {low:3, lower:2, newest:1}. Round 1: "l o" and "o w" tie at
    // total 5 -> pair-asc tie-break adopts "l o". Round 2: "lo w" at 5.
    // Round 3: "e r" and "low e" tie at 2 -> "e r" wins.
    val docs = Seq((1L, "low low low lower lower newest"))
      .toDF("doc_id", "text")
    val out = graft.analysis.TextAnalysis.bpeTrain(docs, merges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "l o", 2L, 5L),
      (2L, "lo w", 2L, 5L),
      (3L, "e r", 1L, 2L)))
  }

  test("wordpiece trainer: likelihood-ratio argmax beats the raw-count pair") {
    import spark.implicits._
    // corpus: "qu" x2, "in" x3, "iz" x5. Pair counts: (q,u)=2, (i,n)=3,
    // (i,z)=5; symbol counts q=2, u=2, i=8, n=3, z=5. Scores:
    // (q,u) 2/(2*2)=0.5 >> (i,z) 5/(8*5)=0.125 = (i,n) 3/(8*3)=0.125.
    // BPE adopts the most frequent (i,z); WordPiece adopts (q,u) — the
    // strongly-associated pair (the canonical q-then-u example).
    val docs = Seq((1L, "qu qu in in in iz iz iz iz iz")).toDF("doc_id", "text")
    val wp = graft.analysis.TextAnalysis.wordpieceTrain(docs, merges = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(wp.toSeq === Seq((1L, "q u", 1L, 2L, 2L, 2L)))
    val bpe = graft.analysis.TextAnalysis.bpeTrain(docs, merges = 1)
      .collect().map(r => r.getString(1))
    assert(bpe.toSeq === Seq("i z"))
    // exact score ties break on pair asc: "ab" x2 vs "cd" x2 — both
    // score 2/(2*2); "a b" < "c d"
    val tie = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val t = graft.analysis.TextAnalysis.wordpieceTrain(tie, merges = 1)
      .collect().map(_.getString(1))
    assert(t.toSeq === Seq("a b"))
  }

  test("bpe encode: applies merges in training order, including to OUT-OF-VOCAB words") {
    import spark.implicits._
    // merges learned from the Sennrich fixture corpus. "lowest" never
    // appeared there: l+o -> lo, lo+w -> low, then (e,r) is absent, so
    // it encodes as [low, e, s, t] (4 symbols); "lower" (in-vocab
    // shape) encodes as [low, er]... wait — (e,r) IS merge 3, so
    // "lower" -> [low, e, r] -> [low, er] = 2 symbols. 2+4 = 6 BPE
    // tokens over 2 words -> fertility 3.0 (3000000 ppm).
    val docs = Seq((7L, "lower lowest"), (8L, "")).toDF("doc_id", "text")
    val out = graft.analysis.TextAnalysis
      .bpeEncode(docs, Seq("l o", "lo w", "e r"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq === Seq((7L, 2L, 6L, 3000000L), (8L, 0L, 0L, -1L)))
  }

  test("bpe trainer: doubled-symbol merges are greedy non-overlapping; trainer stops when no pair remains") {
    import spark.implicits._
    // "aaaa" x2: round 1 adopts "a a" (3 occurrences x freq 2 = 6) and
    // must merge non-overlapping left-to-right -> ["aa","aa"], NOT
    // ["aa","a","a"]; round 2 adopts "aa aa" (1 x 2 = 2) -> ["aaaa"];
    // round 3 has no pairs left -> 2 rows despite merges = 3
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val out = graft.analysis.TextAnalysis.bpeTrain(docs, merges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "a a", 3L, 6L),
      (2L, "aa aa", 1L, 2L)))
  }

  test("kneser-ney bigram: hand-computed interpolated scores, backoff tiers, doc spine") {
    // train "a b a b a c": c12 = {ab:2, ba:2, ac:1}; c1(a)=3 n1p(a)=2,
    // c1(b)=2 n1p(b)=1; nc(a)=nc(b)=nc(c)=1; npp=3. Eval "a b c a d":
    //  (a,b) -> [max(8-3,0)*3 + 3*2*1] / (4*3*3) = 21/36 -> 583333333 ppb
    //  (b,c) -> [0 + 3*1*1] / (4*2*3)            =  3/24 -> 125000000
    //  (c,a) -> unseen history: nc(a)/npp          =  1/3  -> 333333333
    //  (a,d) -> nc(d)=0                           =  0
    // sum 1041666666, mean over 4 = 260416666.5 -> half-up 260416667
    val train = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val ev = Seq((10L, "a b c a d"), (11L, "z")).toDF("doc_id", "text")
    val out = graft.analysis.TextAnalysis.kneserNeyBigram(train, ev)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq === Seq((10L, 4L, 1L, 260416667L), (11L, 0L, 0L, -1L)))
  }

  test("kneser-ney model increment: shard-counted c12 merged by addition reads out like the rebuild") {
    val train = Seq((1L, "a b a b a c"), (2L, "b a c a")).toDF("doc_id", "text")
    val ev = Seq((10L, "a b c a d")).toDF("doc_id", "text")
    val merged = graft.analysis.TextAnalysis.kneserNeyFromModel(
        graft.analysis.TextAnalysis.kneserNeyMergeModels(
          graft.analysis.TextAnalysis.kneserNeyModel(train.filter(col("doc_id") === 1L)),
          graft.analysis.TextAnalysis.kneserNeyModel(train.filter(col("doc_id") === 2L))),
        ev)
      .collect().map(_.toSeq)
    val rebuilt = graft.analysis.TextAnalysis.kneserNeyBigram(train, ev)
      .collect().map(_.toSeq)
    assert(merged.toSeq === rebuilt.toSeq)
  }

  test("kneser-ney normalizes: P(.|w1) sums to exactly 1 over the vocabulary") {
    // Interpolated KN is a PROPER distribution: sum over w2 of
    // max(c12-D,0)/c1 = (c1 - D*n1p)/c1 and the continuation term
    // contributes D*n1p/c1 * 1 — algebraically 1 for every seen history.
    // The fixture's rationals even quantize without residue:
    //   history a: 21/36 + 9/36 + 6/36 -> 583333333+250000000+166666667
    //   history b: 18/24 + 3/24 + 3/24 -> 750000000+125000000+125000000
    // both ppb sums EXACTLY 1e9.
    val train = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    for (h <- Seq("a", "b")) {
      val ev = Seq("a", "b", "c").zipWithIndex
        .map { case (w2, i) => (20L + i, s"$h $w2") }.toDF("doc_id", "text")
      val ppbSum = graft.analysis.TextAnalysis.kneserNeyBigram(train, ev)
        .collect().map(_.getLong(3)).sum
      assert(math.abs(ppbSum - 1000000000L) <= 2L,
        s"history $h: sum $ppbSum")
    }
  }

  test("self-bleu boundary laws: exact clones saturate at 1e6, a singleton corpus scores 0") {
    val clones = Seq((1L, "the same text here"), (2L, "the same text here"),
      (3L, "the same text here")).toDF("doc_id", "text")
    val sat = graft.analysis.TextAnalysis.selfBleu(clones, n = 2)
      .collect().map(_.getLong(3))
    assert(sat.toSeq === Seq(1000000L, 1000000L, 1000000L))
    val solo = graft.analysis.TextAnalysis.selfBleu(
        Seq((1L, "only one document")).toDF("doc_id", "text"), n = 2)
      .collect().map(_.getLong(3))
    assert(solo.toSeq === Seq(0L)) // no other doc ever says its grams
  }

  test("rouge-2: clipped overlap rewards repetition only up to the reference count") {
    // cand "the cat sat on the cat": bigrams {the cat:2, cat sat, sat on,
    // on the} (c=5); ref "the cat sat on the mat" (r=5); clipped overlap
    // min-counts: the cat->1, cat sat->1, sat on->1, on the->1 (o=4):
    // P=R=4/5, F1=2*4/10 -> all 800000 ppm. Empty cand -> p null, r/f1 0.
    val pairs = Seq(
      (0L, "the cat sat on the cat", "the cat sat on the mat"),
      (2L, "", "x y")).toDF("pair_id", "cand", "ref")
    val out = graft.analysis.TextAnalysis.rougeN(pairs, n = 2)
      .orderBy("pair_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6)))
    assert(out.toSeq === Seq(
      (0L, 5L, 5L, 4L, 800000L, 800000L, 800000L),
      (2L, 0L, 1L, 0L, -1L, 0L, 0L)))
  }

  test("self-bleu: argmax doc clips at the runner-up, unique grams score zero") {
    // bigram counts: "a b" -> d1:2 (argmax), d2:1, d4:1 (runner-up 1);
    // "b a"/"b c"/"x y" unique to one doc -> clip 0.
    //  d1: ng 3, clipped 1 (its "a b" clips at the runner-up) -> 333333
    //  d2: ng 2, clipped 1 -> 500000;  d3: ng 1, 0 -> 0;  d4: 1/1 -> 1000000
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x y"), (4L, "a b"))
      .toDF("doc_id", "text")
    val out = graft.analysis.TextAnalysis.selfBleu(docs, n = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 3L, 1L, 333333L), (2L, 2L, 1L, 500000L),
      (3L, 1L, 0L, 0L), (4L, 1L, 1L, 1000000L)))
  }

  test("bpe compression curve: fertility descends the trained merge table") {
    // corpus "aaa aaa ab" (aaa freq 2, ab freq 1), n_words = 3:
    //  m=0: chars            -> n_bpe = 2*3+2 = 8 -> 8/3  = 2666667 ppm
    //  m=1: adopt "a a"      -> aaa=[aa,a]: 2*2+2 = 6 -> 2000000
    //  m=2: adopt "aa a"     -> aaa=[aaa]:  2*1+2 = 4 -> 1333333
    //  m=3: adopt "a b"      -> ab=[ab]:    2*1+1 = 3 -> 1000000
    val docs = Seq((1L, "aaa aaa ab")).toDF("doc_id", "text")
    val out = graft.analysis.TextAnalysis.bpeCompressionCurve(docs, merges = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, 3L, 8L, 2666667L),
      (1L, 3L, 6L, 2000000L),
      (2L, 3L, 4L, 1333333L),
      (3L, 3L, 3L, 1000000L)))
    // exhaustion: "aaaa aaaa" runs out of pairs after 2 merges — the curve
    // PLATEAUS at the final state (matching the oracle's no-op rounds)
    // instead of truncating
    val ex = graft.analysis.TextAnalysis.bpeCompressionCurve(
        Seq((1L, "aaaa aaaa")).toDF("doc_id", "text"), merges = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(ex.toSeq === Seq(
      (0L, 8L, 4000000L), (1L, 4L, 2000000L),
      (2L, 2L, 1000000L), (3L, 2L, 1000000L)))
  }

  test("tokenizer families provably differ: BPE's count argmax vs WordPiece's ratio argmax on one corpus") {
    import spark.implicits._
    // pair (a,b) is the most FREQUENT (6 > 5 > 3) but a and b are common
    // symbols (ratio 6/256); (q,z) is rarer but EXCLUSIVE (ratio 3/9) —
    // so at budget 1 BPE merges "a b" while WordPiece merges "q z"
    val train = "ab ab ab ab ab ab ac ac ac ac ac ad ad ad ad ad " +
      "bc bc bc bc bc bd bd bd bd bd qz qz qz"
    // asymmetric holdout (id 17 -> the eval slice): 3x ab + 1x qz
    val docs = Seq((1L, train), (17L, "ab ab ab qz")).toDF("doc_id", "text")
    val bpe = graft.analysis.TextAnalysis.bpeTrain(
      docs.filter($"doc_id" === 1L), merges = 1).collect()
    assert(bpe.head.getString(1) === "a b")
    val wp = graft.analysis.TextAnalysis.wordpieceTrain(
      docs.filter($"doc_id" === 1L), merges = 1).collect()
    assert(wp.head.getString(1) === "q z")
    val out = graft.analysis.TextAnalysis
      .tokenizerFamilyComparison(docs, budget = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // BPE: ab->1 piece, qz->2 -> 5 pieces / 4 words; WP mirrored: 7 / 4
    assert(out("bpe") === ((4L, 5L, 1250000L, 750000L)))
    assert(out("wordpiece") === ((4L, 7L, 1750000L, 250000L)))
    // unigram at budget 1 keeps the highest-usage multi piece ("ab",
    // round-2 usage 6 beats 5 and 3) -> same segmentation as BPE here
    assert(out("unigram") === ((4L, 5L, 1250000L, 750000L)))
  }

  test("tokenizer family report: holdout words with train-unseen chars are excluded from every arm") {
    import spark.implicits._
    // 'x' never appears in the train slice; the word "qx" must drop from
    // the shared holdout set of ALL families (the eligibility contract),
    // leaving only "ab"
    val docs = Seq(
      (1L, "ab ab ab ab ac ac bc bc"),
      (17L, "ab qx")).toDF("doc_id", "text")
    val out = graft.analysis.TextAnalysis
      .tokenizerFamilyComparison(docs, budget = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("bpe" -> 1L, "unigram" -> 1L, "wordpiece" -> 1L))
  }

  test("byte-fallback family report: train-unseen chars stay in the holdout and encode as byte pieces") {
    import spark.implicits._
    // 'x' and '9' never appear in the train slice; under byte fallback
    // the holdout keeps BOTH words — "qx9" cannot merge (no learned pair
    // contains an untrained char) and the unigram DP byte-falls-back the
    // whole word, so every family reports n_words = 2 and "qx9" costs 3
    // pieces in every arm (each char is one single-byte piece)
    val docs = Seq(
      (1L, "ab ab ab ab ac ac bc bc"),
      (17L, "ab qx9")).toDF("doc_id", "text")
    val out = graft.analysis.TextAnalysis
      .tokenizerFamilyComparisonFallback(docs, budget = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // budget-1 trainers all adopt "ab" ("a b" is the count AND ratio
    // argmax on this train slice): holdout "ab" -> 1 piece (whole word),
    // "qx9" -> 3 byte pieces; 2 words, 4 pieces, whole rate 1/2
    assert(out("bpe") === ((2L, 4L, 500000L)))
    assert(out("wordpiece") === ((2L, 4L, 500000L)))
    assert(out("unigram") === ((2L, 4L, 500000L)))
    // the restricted report on the same fixture sees only "ab" — the
    // fallback variant widened the holdout, it did not change scoring
    val strict = graft.analysis.TextAnalysis
      .tokenizerFamilyComparison(docs, budget = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(strict.values.toSet === Set(1L))
  }

}
