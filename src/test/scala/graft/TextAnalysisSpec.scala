package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.col

/** Semantic invariants of the text-analysis and clickstream-analytics
  * operators whose oracled queries only expose aggregates: funnel
  * stage-ordering, retention cohort/offset accounting, and the
  * sequence-packing conservation/capacity properties.
  */
class TextAnalysisSpec extends SparkSpec {

  test("funnel enforces event ORDER, not just co-occurrence") {
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // user 1: view -> click -> purchase (completes all three stages)
    // user 2: purchase BEFORE its view -> click (purchase must NOT count)
    // user 3: view only
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "purchase", ts(0)), (2L, "view", ts(1)), (2L, "click", ts(2)),
      (3L, "view", ts(0)))
      .toDF("user_id", "event_type", "ts")
    val got = graft.operators.Events.funnelCounts(events).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("1_view", 3L), ("2_click", 2L), ("3_purchase", 1L)))
  }

  test("retention cohorts count users by first-activity day and return offset") {
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    val day0 = 1700006400000L - (1700006400000L % 86400000L) // midnight-aligned
    def ts(day: Int) = new Timestamp(day0 + day * 86400000L)
    // users 1,2 start day 0; user 1 returns day 1 and day 3; user 3 starts day 1
    val events = Seq(
      (1L, ts(0)), (2L, ts(0)), (1L, ts(1)), (3L, ts(1)), (1L, ts(3)))
      .toDF("user_id", "ts")
    val got = graft.operators.Events.retentionCohorts(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val base = day0 / 86400000L
    assert(got === Seq(
      (base, 0L, 2L), (base, 1L, 1L), (base, 3L, 1L),
      (base + 1, 0L, 1L)))
  }

  test("bpeMerges runs greedy BPE: frequency order, lexicographic ties, overlap parity") {
    val sp = spark
    import sp.implicits._
    // hand-computable corpus: 'an' dominates; 'aaa' exercises the
    // same-symbol overlap (greedy merges positions 1-2, leaves the tail)
    val docs = Seq(
      (1L, "aaa banana band banana"),
      (2L, "banana bandana aaa band"),
      (3L, "the band banana the aaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // reference run (independently verified against a plain-python BPE):
    // step 3 merges (a,a) inside 'aaa' exactly once — the parity case
    assert(got === Seq(
      (1L, "a", "n", 13L), (2L, "b", "an", 8L), (3L, "a", "a", 6L),
      (4L, "an", "a", 5L), (5L, "ban", "ana", 4L), (6L, "ban", "d", 4L)))
  }

  test("bpeApply segments OOV words via merge replay, not vocabulary lookup") {
    val sp = spark
    import sp.implicits._
    // doc_ids 1,2,3 route to the train split under the md5-mod-100 law,
    // doc_ids 6,9 to the held-out split. Train corpus = the bpeMerges
    // fixture (merges: (a,n),(b,an),(a,a),(an,a),(ban,ana),(ban,d));
    // eval carries "bandit" and "queen" — words (and for 'q','u','e',
    // whole CHARACTERS) absent from training, which no vocabulary
    // lookup could segment
    val docs = Seq(
      (1L, "aaa banana band banana"),
      (2L, "banana bandana aaa band"),
      (3L, "the band banana the aaa"),
      (6L, "bandit queen banana"),
      (9L, "bandit aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeApply(docs, 6).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === Seq(
      // OOV: trained prefixes apply ((a,n)->(b,an)->(ban,d)), tail stays chars
      ("aaaa", 1L, 2L, "aa|aa"),       // (a,a) twice — overlap parity on 4 a's
      ("bandit", 2L, 3L, "band|i|t"),
      ("banana", 1L, 1L, "banana"),    // in-vocab word reaches its trained form
      ("queen", 1L, 5L, "q|u|e|e|n")   // fully unseen characters never merge
    ).sortBy(_._1))
  }

  test("funnelWindowedCounts drops conversions outside the max-lag window") {
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // user 1 converts within the window; user 2's click comes 3 hours
    // after the view — outside a 1-hour window, inside the unwindowed form
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(30)), (1L, "purchase", ts(59)),
      (2L, "view", ts(0)), (2L, "click", ts(180)))
      .toDF("user_id", "event_type", "ts")
    val windowed = graft.operators.Events.funnelWindowedCounts(events, 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(windowed === Seq(("1_view", 2L), ("2_click", 1L), ("3_purchase", 1L)))
    val unwindowed = graft.operators.Events.funnelCounts(events).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(unwindowed === Seq(("1_view", 2L), ("2_click", 2L), ("3_purchase", 1L)))
  }

  test("nbQuality fails loudly on a single-class train split") {
    val sp = spark
    import sp.implicits._
    // every doc fails the Gopher word-count gate (3 tokens < 20), so the
    // bootstrap labels are single-class — training must abort, not emit
    // silently-null scores
    val docs = (1L to 30L).map(i => (i, s"short doc number$i", "en", "src0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[Exception] { TextAnalysis.nbQuality(docs).collect() }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("single-class")),
      s"expected the single-class assert, got: ${messages(e).mkString(" | ")}")
  }

  test("dsirWeights' distributed rank equals the global row_number ordering") {
    val docs = Tables.documents(spark, sf0001)
    val rows = TextAnalysis.dsirWeights(docs).collect()
    CacheRegistry.release()
    // expected rank: sort the collected scores by (log_ratio desc, doc_id)
    val expected = rows
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, lr) => (-lr, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    rows.foreach { r =>
      assert(r.getLong(3) === expected(r.getLong(0)),
        s"doc ${r.getLong(0)}: w_rank ${r.getLong(3)} != global ${expected(r.getLong(0))}")
    }
    // selection = rank <= keepTop, exactly
    rows.foreach(r => assert((r.getLong(3) <= 100) === (r.getInt(4) === 1)))
  }

  test("mixtureSample fills each domain budget by weight rank, overflowing by at most one doc") {
    val docs = Tables.documents(spark, sf0001)
    val rows = TextAnalysis.mixtureSample(docs).collect()
    CacheRegistry.release()
    // one row per scored doc — nothing sampled twice
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val budget = rs.head.getLong(5)
      assert(rs.forall(_.getLong(5) == budget), s"$src: budget not constant")
      val sel = rs.filter(_.getInt(6) === 1)
      val selTok = sel.map(_.getLong(2)).sum
      if (sel.nonEmpty) {
        // offset-based first-fit: under budget before the last taken doc
        assert(selTok - sel.map(_.getLong(2)).max < budget,
          s"$src: selected $selTok tokens beyond one-doc overflow of budget $budget")
        // selection is a weight-rank PREFIX of the domain
        val maxSelRank = sel.map(_.getLong(4)).max
        assert(sel.map(_.getLong(4)).toSet === (1L to maxSelRank).toSet,
          s"$src: selected ranks are not a prefix")
      }
      // budget is met unless the domain ran out of documents
      if (selTok < budget) assert(sel.length === rs.length,
        s"$src: budget $budget unmet ($selTok) with unselected docs remaining")
    }
  }

  test("mixtureSample honors a many-source recipe (grouped prefix across 10 domains)") {
    // the grouped-prefix device must hold when the recipe names many
    // sources, not just the 3-domain default fixture: remap the corpus
    // onto 10 synthetic sources with 8 explicit rates + default
    val docs = Tables.documents(spark, sf0001)
      .withColumn("source",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("s"),
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.lit(10))))
    val rates = (0 until 8).map(i => s"s$i" -> (100 + 50 * i)).toMap
    val rows = TextAnalysis.mixtureSample(docs, 1024, rates, 400).collect()
    CacheRegistry.release()
    assert(rows.map(_.getString(1)).distinct.length === 10)
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val ratePm = rates.getOrElse(src, 400)
      val srcTokens = rs.map(_.getLong(2)).sum
      val budget = rs.head.getLong(5)
      assert(budget === srcTokens * ratePm / 1000,
        s"$src: budget $budget != ${srcTokens * ratePm / 1000}")
      // per-domain first-fit law, same as the default-fixture test
      val sel = rs.filter(_.getInt(6) === 1)
      if (sel.nonEmpty) {
        val selTok = sel.map(_.getLong(2)).sum
        assert(selTok - sel.map(_.getLong(2)).max < budget)
        val maxSelRank = sel.map(_.getLong(4)).max
        assert(sel.map(_.getLong(4)).toSet === (1L to maxSelRank).toSet,
          s"$src: selected ranks are not a prefix")
      }
      // ranks are a dense 1..n per domain (the grouped rank is exact)
      assert(rs.map(_.getLong(4)).sorted.toSeq === (1L to rs.length).toSeq,
        s"$src: dom_rank not dense")
    }
  }

  test("sequencePacking conserves docs/tokens and bounds bins by budget + one doc") {
    val budget = 512L
    val docs = Tables.documents(spark, sf0001)
    val packed = TextAnalysis.sequencePacking(docs, budget).collect()

    // conservation: every doc and every token lands in exactly one bin
    val totalDocs = packed.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === docs.count())
    val totalTokens = packed.map(_.getAs[Long]("bin_tokens")).sum
    val exactTokens = docs
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          TextAnalysis.tokens(org.apache.spark.sql.functions.col("text")))
          .cast("long")))
      .head().getLong(0)
    assert(totalTokens === exactTokens)

    // capacity: offset-based first-fit lets a bin overflow by at most its
    // largest (= last) document, so bin_tokens minus that doc stays under
    // budget for every bin
    packed.foreach { r =>
      val slack = r.getAs[Long]("bin_tokens") - r.getAs[Long]("max_doc_tokens")
      assert(slack < budget,
        s"bin (${r.getAs[String]("lang")}, ${r.getAs[Long]("bin")}) " +
          s"holds $slack tokens beyond its largest doc — exceeds budget $budget")
    }
  }

  test("pretrain manifest conserves the census: every selected doc in exactly one bin") {
    import graft.operators.Pipeline
    val docs = Tables.documents(spark, sf0001)
    val manifest = Pipeline.pretrainManifest(docs).collect()
    CacheRegistry.release()
    val census = Pipeline.pretrain(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_bins"), r.getAs[Long]("n_docs"), r.getAs[Long]("tokens")))
      .toMap
    CacheRegistry.release()
    assert(manifest.nonEmpty)
    // exactly one manifest row per selected doc
    val ids = manifest.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length === ids.length, "a doc appears in two bins")
    // offsets stay inside the budget and the census is the manifest's
    // roll-up — same bins, same docs, same tokens
    manifest.foreach { r =>
      val off = r.getAs[Long]("bin_offset")
      assert(off >= 0 && off < 2048L, s"bin_offset $off outside the budget")
    }
    val rolled = manifest.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rs) =>
        k -> (rs.map(_.getAs[Long]("bin")).distinct.length.toLong,
              rs.length.toLong, rs.map(_.getAs[Long]("n_tok")).sum)
      }
    assert(rolled === census, "manifest roll-up diverged from the census")
    // the one-pass emitter must agree with both standalone queries
    val (eCensus, eManifest) = Pipeline.pretrainEmit(docs)
    assert(eCensus.collect().toSeq ===
      Pipeline.pretrain(docs).collect().toSeq,
      "pretrainEmit census diverged from the standalone census")
    CacheRegistry.release()
    assert(eManifest.collect().toSeq === manifest.toSeq,
      "pretrainEmit manifest diverged from the standalone manifest")
    CacheRegistry.release()
  }

  test("chunkDocuments: count law, overlap law, and tail-chunk length") {
    val sp = spark
    import sp.implicits._
    // 10 tokens, size=4, stride=3: chunks at 0,3,6,9 — the last a 1-token
    // tail; consecutive chunks share exactly size-stride = 1 token
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
                   (2L, "only three tokens"),
                   (3L, "...")) // no alphanumeric tokens -> zero chunks
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs, 4, 3).collect()
    val byDoc = got.groupBy(_.getAs[Long]("doc_id"))
    assert(!byDoc.contains(3L), "token-free doc must emit no chunks")
    // ceil(10/3)=4 chunks; ceil(3/3)=1 chunk
    assert(byDoc(1L).length === 4 && byDoc(2L).length === 1)
    val d1 = byDoc(1L).sortBy(_.getAs[Long]("chunk_id"))
    assert(d1.map(_.getAs[Long]("start_tok")).toSeq === Seq(0L, 3L, 6L, 9L))
    assert(d1.map(_.getAs[Long]("n_tok")).toSeq === Seq(4L, 4L, 4L, 1L))
    // overlap law: chunk i's last token == chunk i+1's first token, so the
    // hash of the shared slice must agree — check via reconstruction
    import org.apache.spark.sql.functions.{col, concat_ws, md5, slice, lit}
    val toks = docs.filter(col("doc_id") === 1L)
      .select(TextAnalysis.tokens(col("text")).as("toks"))
    val expect = toks.select(
      md5(concat_ws(" ", slice(col("toks"), 4, 4))).as("h")).head.getString(0)
    assert(d1(1).getAs[String]("chunk_hash") === expect,
      "chunk 1 must hash tokens [3..6] (1-based 4..7, 4 tokens)")
  }

  test("chunkDocuments coverage law holds for random (n, size, stride) (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sp = spark
    import sp.implicits._
    // any valid config must cover token positions [0, n) exactly — every
    // position inside some chunk, no chunk past the end, chunk_ids dense
    val cfgGen = for {
      n <- Gen.choose(1, 50)
      size <- Gen.choose(1, 12)
      stride <- Gen.choose(1, size)
    } yield (n, size, stride)
    val prop = Prop.forAll(cfgGen) { case (n, size, stride) =>
      val text = (0 until n).map("w" + _).mkString(" ")
      val chunks = TextAnalysis.chunkDocuments(
          Seq((1L, text)).toDF("doc_id", "text"), size, stride)
        .collect()
        .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("start_tok"),
                   r.getAs[Long]("n_tok")))
      val covered = chunks.flatMap { case (_, s, len) => s until (s + len) }.toSet
      val dense = chunks.map(_._1).sorted.toSeq == (0L until chunks.length).toSeq
      val inBounds = chunks.forall { case (_, s, len) => s + len <= n && len >= 1 }
      covered == (0L until n).toSet && dense && inBounds
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("withGroupedPrefix equals per-group row_number + exclusive running sum (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sp = spark
    import sp.implicits._
    // random row sets with SKEWED group sizes (one group holds most
    // rows — the shape the device exists for) and duplicate key values
    // (the unique id is the tie-break, as every caller passes one)
    val gen = for {
      n <- Gen.choose(1, 120)
      nGroups <- Gen.choose(1, 5)
      rows <- Gen.listOfN(n, for {
        hot <- Gen.prob(0.7)
        g <- if (hot) Gen.const(0) else Gen.choose(0, nGroups - 1)
        k <- Gen.choose(0, 9) // few distinct keys → real ties
        v <- Gen.choose(0L, 50L)
      } yield (g, k, v))
    } yield rows.zipWithIndex.map { case ((g, k, v), id) =>
      (s"g$g", k, v, id.toLong)
    }
    val prop = Prop.forAll(gen) { rows =>
      val df = rows.toDF("grp", "key", "value", "id")
      val got = df.transform(TextAnalysis.withGroupedPrefix(Seq("grp"),
          "rk", "cum", org.apache.spark.sql.functions.col("value"),
          org.apache.spark.sql.functions.col("key"),
          org.apache.spark.sql.functions.col("id")))
        .collect()
        .map(r => (r.getAs[Long]("id"),
          (r.getAs[Long]("rk"), r.getAs[Long]("cum")))).toMap
      CacheRegistry.release()
      // brute-force oracle: per group, sort by (key, id), rank = position,
      // cum = sum of values strictly before
      val expected = rows.groupBy(_._1).values.flatMap { g =>
        val sorted = g.sortBy(r => (r._2, r._4))
        sorted.zipWithIndex.map { case (r, i) =>
          r._4 -> ((i + 1L, sorted.take(i).map(_._3).sum))
        }
      }.toMap
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("orderValueRanks' (rk, n) arithmetic equals the native rank functions (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    // the oracle only exercises the top-5 slice of five groups; this
    // locks the dense_rank/percent_rank/cume_dist/ntile derivations
    // against the native window functions for ARBITRARY group sizes —
    // including n = 1 (percent_rank guard), n < 4 (ntile remainder
    // buckets), and heavy price ties (orderkey is the tie-break)
    val gen = for {
      n <- Gen.choose(1, 150)
      rows <- Gen.listOfN(n, for {
        p <- Gen.choose(1, 5)
        price <- Gen.choose(0, 12) // few distinct prices → real ties
      } yield (s"$p-PRIO", price.toDouble))
    } yield rows.zipWithIndex.map { case ((p, pr), id) => (p, id.toLong, pr) }
    val prop = Prop.forAll(gen) { rows =>
      val df = rows.toDF("o_orderpriority", "o_orderkey", "o_totalprice")
      val got = operators.Warehouse.orderValueRanks(df, k = 1000)
        .collect()
        .map(r => r.getAs[Long]("o_orderkey") ->
          ((r.getAs[Long]("rk"), r.getAs[Long]("dense_rk"),
            r.getAs[Double]("pct_rank"), r.getAs[Double]("cume"),
            r.getAs[Long]("quartile")))).toMap
      CacheRegistry.release()
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val ref = df
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("dense_rk", dense_rank().over(w).cast("long"))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .collect()
        .map(r => r.getAs[Long]("o_orderkey") ->
          ((r.getAs[Long]("rk"), r.getAs[Long]("dense_rk"),
            r.getAs[Double]("pct_rank"), r.getAs[Double]("cume"),
            r.getAs[Long]("quartile")))).toMap
      got == ref
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("chunkDocuments at stride == size produces disjoint cover; bad params rejected") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, (0 until 10).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    // stride == size: no overlap, chunks tile the doc exactly
    val got = TextAnalysis.chunkDocuments(docs, 4, 4).collect()
      .sortBy(_.getAs[Long]("chunk_id"))
    assert(got.map(_.getAs[Long]("start_tok")).toSeq === Seq(0L, 4L, 8L))
    assert(got.map(_.getAs[Long]("n_tok")).toSeq === Seq(4L, 4L, 2L))
    assert(got.map(_.getAs[Long]("n_tok")).sum === 10L,
      "disjoint chunks must cover every token exactly once")
    // stride > size would skip tokens — rejected loudly, not silently
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(docs, 4, 5)
    }
  }

  test("chunkDedup counts cross-doc duplicated chunks; alignment and within-doc semantics") {
    val sp = spark
    import sp.implicits._
    val ten = (0 until 10).map("t" + _).mkString(" ")
    val docs = Seq(
      (1L, ten),                       // identical twin of doc 2
      (2L, ten),                       //   -> every chunk duplicated
      (3L, "u0 u1 u2 u3 u4 u5 u6"),    // unique content -> no dups
      (4L, "x0 t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // shares TEXT but shifted
                                       //   one token -> chunk grids
                                       //   misalign -> no chunk dups
      (5L, "r0 r1 r2 r0 r1 r2 r0 r1 r2 r0 r1 r2")) // within-doc repeats
                                       //   only -> NOT duplicated
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkDedup(docs, 4, 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks"))).toMap
    assert(got(1L) === (4L, 4L) && got(2L) === (4L, 4L),
      "identical docs must have every chunk flagged as cross-doc duplicated")
    assert(got(3L)._2 === 0L, "unique content flagged as duplicated")
    assert(got(4L)._2 === 0L,
      "shifted copy must NOT dup — chunk boundaries are grid-aligned, not content-defined")
    assert(got(5L)._2 === 0L,
      "within-doc repetition must not count as cross-doc duplication")
    CacheRegistry.release()
  }

  test("BM25 ranks exact-term matches first and scores descend within a query") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (0L, "quantum flux capacitor alignment procedure"),
      // doc 10 repeats the query's rare terms: must outrank doc 11,
      // which shares only common filler
      (10L, "the quantum flux capacitor needs alignment the quantum flux"),
      (11L, "the procedure is the procedure and the manual covers the procedure"),
      (12L, "unrelated text about gardening and soil quality"),
      (13L, "flux alignment"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
    val got = TextAnalysis.bm25TopK(docs, nQueries = 1, k = 4).collect()
    val ranked = got.sortBy(_.getAs[Long]("rank"))
      .map(r => r.getAs[Long]("neighbor_id"))
    assert(ranked.head === 10L,
      s"rare-term-dense doc must rank first, got ${ranked.toSeq}")
    assert(!ranked.contains(12L) || ranked.indexOf(12L) == ranked.length - 1,
      "no-shared-term doc ranked above sharing docs")
    val scores = got.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("bm25"))
    assert(scores.sameElements(scores.sortBy(-(_: Double))),
      "bm25 scores must be non-increasing in rank")
    // doc 12 shares no query term at all -> must be absent entirely
    assert(!ranked.contains(12L), "zero-overlap doc must not be retrieved")
  }

  test("lexical index round-trip: serve from the posting store equals inline BM25") {
    val docs = Tables.documents(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("bm25"))).toSet
    assert(rows(TextAnalysis.bm25SavedRoundtrip(spark, docs)) ===
      rows(TextAnalysis.bm25TopK(docs)),
      "from-files BM25 drifted from inline — the posting store is not the whole index")
  }

  test("qlDirichlet: posting-bounded candidates, dense ranks, monotone scores, length penalty") {
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.qlDirichletTopK(docs).collect()
    assert(got.nonEmpty, "no QL results")
    // candidates must share >= 1 term with their query (posting-list
    // candidate generation — the operator's documented restriction)
    val toks = docs.select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("[^a-z0-9]+")
          .filter(_.nonEmpty).toSet).toMap
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq, s"query $q: ranks not dense")
      assert(ranks.length <= 5, s"query $q: more than k hits")
      val ss = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("ql"))
      assert(ss.sameElements(ss.sortBy(-(_: Double))),
        s"query $q: QL scores not monotone in rank")
      rs.foreach { r =>
        val c = r.getAs[Long]("neighbor_id")
        assert(toks(q).intersect(toks(c)).nonEmpty,
          s"query $q: candidate $c shares no term — escaped the posting join")
      }
    }
  }

  test("keywords: per-doc top-3 by rational tf-idf, rare term beats common term") {
    val sp = spark
    import sp.implicits._
    // "zebra" appears only in doc 0 (rare, tf 2); "the" spans all docs
    val docs = Seq(
      (0L, "the zebra runs the zebra sleeps"),
      (1L, "the cat sits on the mat"),
      (2L, "the dog and the cat"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
    val got = TextAnalysis.keywords(docs).collect()
    got.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, rs) =>
      val ranks = rs.map(_.getAs[Long]("kw_rank")).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq, s"doc $d: ranks not dense")
      assert(ranks.length <= 3, s"doc $d: more than perDoc keywords")
      val ws = rs.sortBy(_.getAs[Long]("kw_rank")).map(_.getAs[Double]("weight"))
      assert(ws.sameElements(ws.sortBy(-(_: Double))),
        s"doc $d: weights not monotone in rank")
    }
    val d0 = got.filter(_.getAs[Long]("doc_id") == 0L)
      .sortBy(_.getAs[Long]("kw_rank"))
    assert(d0.head.getAs[String]("term") === "zebra",
      s"doc 0's top keyword should be the rare repeated term, got ${d0.head}")
    // tf 2 · (3 docs / df 1) = 6.0
    assert(d0.head.getAs[Double]("weight") === 6.0)
  }

  test("tokenFertility: one row per language, fertility = bpe/ws on exact sums") {
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.tokenFertility(docs).collect()
    assert(got.nonEmpty, "no languages")
    got.foreach { r =>
      val (ws, bpe) = (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_tokens"))
      assert(ws > 0 && bpe > 0, s"${r.getAs[String]("lang")}: empty token sums")
      val f = r.getAs[Double]("fertility")
      assert(math.abs(f - bpe.toDouble / ws.toDouble) < 1e-6,
        s"${r.getAs[String]("lang")}: fertility not bpe/ws")
      assert(f >= 1.0 - 1e-9,
        s"${r.getAs[String]("lang")}: BPE-ish tokenizer cannot produce fewer tokens than words")
    }
  }

  test("nbCalibration: bins partition the eval split, rates bounded, margin bins ordered") {
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.nbCalibration(docs).collect()
    assert(got.nonEmpty, "no calibration bins")
    val bins = got.map(_.getAs[Long]("bin")).sorted.toSeq
    assert(bins === bins.distinct, "duplicate bins")
    assert(bins.forall(b => b >= 1 && b <= 10), s"bin outside [1,10]: $bins")
    val evalN = TextAnalysis.nbQuality(docs).count()
    assert(got.map(_.getAs[Long]("n_docs")).sum === evalN,
      "bins do not partition the eval split")
    got.foreach { r =>
      val rate = r.getAs[Double]("rule_pass_rate")
      assert(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
      assert(r.getAs[Long]("n_rule_pass") <= r.getAs[Long]("n_docs"))
    }
    // bins are rank-ordered by margin: each bin's min_margin is >= the
    // next bin's (higher-confidence bins come first)
    val margins = got.sortBy(_.getAs[Long]("bin")).map(_.getAs[Double]("min_margin"))
    assert(margins.sameElements(margins.sortBy(-(_: Double))),
      "bin min-margins not monotone — the rank binning is broken")
  }

  test("pmiPairs: dense ranks, count cutoff honored, normalized pairs, descending pmi") {
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.pmiPairs(docs).collect()
    assert(got.nonEmpty, "no PMI pairs")
    val ranks = got.map(_.getAs[Long]("pair_rank")).sorted.toSeq
    assert(ranks === (1L to ranks.length).toSeq, "ranks not dense")
    assert(ranks.length <= 50, "more than topK pairs")
    got.foreach { r =>
      assert(r.getAs[Long]("n_ab") >= 5, "minCount cutoff violated")
      assert(r.getAs[String]("t1") <= r.getAs[String]("t2"),
        "pair not least/greatest normalized")
    }
    val pmis = got.sortBy(_.getAs[Long]("pair_rank")).map(_.getAs[Double]("pmi"))
    assert(pmis.sameElements(pmis.sortBy(-(_: Double))),
      "pmi not descending in rank")
  }

  test("QL serve from the posting store equals inline — one artifact, two scoring models") {
    val docs = Tables.documents(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("ql"))).toSet
    assert(rows(TextAnalysis.qlSavedRoundtrip(spark, docs)) ===
      rows(TextAnalysis.qlDirichletTopK(docs)),
      "from-files QL drifted from inline — the posting store must carry no model state")
  }

  test("snippets: one best window per hit, spans inside the doc, coverage positive") {
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.snippets(docs).collect()
    assert(got.nonEmpty, "no snippets")
    val hits = TextAnalysis.bm25TopK(docs, 10, 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val nToks = docs.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("text").toLowerCase.split("[^a-z0-9]+")
        .count(_.nonEmpty)).toMap
    // exactly one snippet per retrieved (query, doc) — coverage of the
    // whole shortlist, no duplicates
    val keys = got.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")))
    assert(keys.toSet === hits, "snippet set differs from the BM25 shortlist")
    assert(keys.length === keys.toSet.size, "duplicate snippet for a hit")
    got.foreach { r =>
      val (d, st, n, m) = (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("n_matched"))
      assert(m >= 1, s"doc $d: best window matches no query term")
      assert(n >= 1 && n <= 16, s"doc $d: window size $n out of range")
      assert(st >= 0 && st + n <= nToks(d), s"doc $d: span [$st, ${st + n}) outside the doc")
    }
  }

  test("snippets on a planted corpus: the window lands on the matching region") {
    val sp = spark
    import sp.implicits._
    // the only shared term sits at the tail of a 40-token candidate; the
    // best window must cover it
    val filler = (1 to 39).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, "needle search"),
      (10L, filler + " needle"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
    val got = TextAnalysis.snippets(docs, nQueries = 1, mDocs = 3)
      .collect().filter(_.getAs[Long]("doc_id") == 10L)
    assert(got.length === 1, "expected one snippet for the candidate")
    val (st, n) = (got.head.getAs[Long]("start_tok"), got.head.getAs[Long]("n_tok"))
    // "needle" is token index 39 (0-based)
    assert(st <= 39 && 39 < st + n,
      s"window [$st, ${st + n}) misses the matching token at 39")
    assert(got.head.getAs[Long]("n_matched") === 1L)
  }

  test("qlDirichlet on a planted corpus: matching doc beats partially-matching, longer doc penalized") {
    val sp = spark
    import sp.implicits._
    // doc 10 repeats the query's rare terms; doc 11 matches once inside a
    // long document (length penalty bites); doc 12 shares nothing
    val docs = Seq(
      (0L, "flux capacitor alignment"),
      (10L, "flux capacitor alignment flux capacitor"),
      (11L, "flux " + Seq.fill(40)("filler padding words").mkString(" ")),
      (12L, "unrelated gardening soil"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
    val ranked = TextAnalysis.qlDirichletTopK(docs, nQueries = 1, k = 3)
      .collect().sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Long]("neighbor_id")).toSeq
    assert(ranked.head === 10L,
      s"term-dense short doc must rank first, got $ranked")
    assert(!ranked.contains(12L), "zero-overlap doc must not be retrieved")
  }

  test("phraseTopK: occurrence count ranks, adjacency required, reversed bigram scores nothing") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (0L, "red fox jumps"),
      (20L, "a red fox and another red fox here"), // phrase twice
      (21L, "one red fox only"),                   // phrase once
      (22L, "fox red fox red"),                    // reversed + once ("red fox" at pos 1? f-r-f-r: 'red fox' occurs at pos 2!)
      (23L, "red apple fox pear"))                 // words present, never adjacent
      .toDF("doc_id", "text")
    val got = TextAnalysis.phraseTopK(docs, nQueries = 1, k = 5).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Long]("rank"))
    val ids = got.map(_.getAs[Long]("neighbor_id")).toSeq
    assert(ids.head === 20L, "two occurrences must outrank one")
    assert(got.head.getAs[Long]("n_phrase") === 2L)
    assert(!ids.contains(23L), "non-adjacent words are not a phrase hit")
    // doc 22 "fox red fox red" DOES contain "red fox" (positions 2-3)
    assert(ids.contains(22L) && ids.contains(21L))
  }

  test("snapshotDiff: classes match the derivation law, deltas carry the revision mass") {
    val docs = Tables.documents(spark, sf0001)
    val byClass = graft.operators.Pipeline.snapshotDiff(docs).collect()
      .groupBy(_.getAs[String]("change_type"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    assert(byClass("added") === ids.count(i => i % 7 == 0 && i % 11 != 0))
    assert(byClass("removed") === ids.count(i => i % 7 != 0 && i % 11 == 0))
    assert(byClass("changed") ===
      ids.count(i => i % 5 == 0 && i % 7 != 0 && i % 11 != 0))
    assert(byClass("unchanged") ===
      ids.count(i => i % 5 != 0 && i % 7 != 0 && i % 11 != 0))
    // every revised doc gained exactly the 5-char marker
    val changedDelta = graft.operators.Pipeline.snapshotDiff(docs).collect()
      .filter(_.getAs[String]("change_type") == "changed")
      .map(_.getAs[Long]("delta_chars")).sum
    assert(changedDelta === 5L * byClass("changed"))
  }

  test("datasetCard: corpus counts cross-check the table, sections complete") {
    val docs = Tables.documents(spark, sf0001)
    val card = graft.operators.Pipeline.datasetCard(docs).collect()
      .map(r => (r.getAs[String]("section"), r.getAs[String]("card_key")) ->
        r.getAs[Long]("value")).toMap
    assert(card(("corpus", "n_docs")) === docs.count())
    assert(card(("corpus", "n_langs")) ===
      docs.select("lang").distinct().count())
    // per-lang rows sum back to the corpus
    val langSum = card.collect { case (("lang", _), v) => v }.sum
    assert(langSum === card(("corpus", "n_docs")))
    val srcSum = card.collect { case (("source", _), v) => v }.sum
    assert(srcSum === card(("corpus", "n_docs")))
  }

  test("phrase serve from the positional store equals inline (one artifact, positions included)") {
    val docs = Tables.documents(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("n_phrase"))).toSet
    assert(rows(TextAnalysis.phraseSavedRoundtrip(spark, docs)) ===
      rows(TextAnalysis.phraseTopK(docs)),
      "deployed phrase plan diverged from inline")
  }

  test("denoiseManifest: the T5 length law conserves tokens and sentinels") {
    val docs = Tables.documents(spark, sf0001)
    val manifest = TextAnalysis.denoiseManifest(docs).collect()
    val totTok = docs.select(org.apache.spark.sql.functions
        .sum(org.apache.spark.sql.functions.size(
          TextAnalysis.tokens(org.apache.spark.sql.functions.col("text")))))
      .head().getLong(0)
    val spans = TextAnalysis.spanCorruption(docs).collect()
    val nSpans = spans.length.toLong
    val nMasked = spans.map(_.getAs[Long]("n_tok")).sum
    val inTok = manifest.map(_.getAs[Long]("bin_input_tokens")).sum
    val tgTok = manifest.map(_.getAs[Long]("bin_target_tokens")).sum
    // input = tokens − masked + sentinels; target = masked + sentinels
    assert(inTok === totTok - nMasked + nSpans, "input budget broke conservation")
    assert(tgTok === nMasked + nSpans, "target budget broke conservation")
    // every bin's max single input fits where the bin lives
    assert(manifest.forall(r => r.getAs[Long]("max_input_tokens") <=
      r.getAs[Long]("bin_input_tokens")))
  }

  test("curriculumSchedule: phases partition the corpus into descending quality bands") {
    val docs = Tables.documents(spark, sf0001)
    val phases = TextAnalysis.curriculumSchedule(docs).collect()
      .sortBy(_.getAs[Long]("phase"))
    assert(phases.map(_.getAs[Long]("phase")).toSeq === Seq(1L, 2L, 3L, 4L))
    val total = docs.count()
    assert(phases.map(_.getAs[Long]("n_docs")).sum === total)
    // equal-count cut: phases differ by at most one document
    val counts = phases.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1)
    // quality bands are ordered: a phase's floor meets the next one's
    // ceiling (equality allowed on ties), and the means fall
    phases.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("q_min") >= b.getAs[Double]("q_max"))
        assert(a.getAs[Double]("q_mean") >= b.getAs[Double]("q_mean"))
      case _ =>
    }
  }

  test("spanCorruption: spans are disjoint maximal runs, ordinals dense, targets length-consistent") {
    val docs = Tables.documents(spark, sf0001)
    val spans = TextAnalysis.spanCorruption(docs).collect()
    assert(spans.nonEmpty)
    spans.foreach { r =>
      val n = r.getAs[Long]("n_tok")
      assert(n >= 1L)
      assert(r.getAs[Long]("start_tok") >= 0L)
      assert(r.getAs[String]("target_text").split(" ").length.toLong === n,
        "target text must carry exactly n_tok tokens")
    }
    // per doc: ordinals are 1..n in start order and spans never overlap
    // (maximality: merged runs leave a gap of at least one kept token)
    spans.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("span_ord"))
      assert(sorted.map(_.getAs[Long]("span_ord")).toSeq ===
        (1L to sorted.length.toLong).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("start_tok") + a.getAs[Long]("n_tok") <
            b.getAs[Long]("start_tok"),
            "adjacent masked runs must have been merged into one span")
        case _ =>
      }
    }
    // the selection law lands near its design rate: masked fraction
    // ≈ spanLen/rate = 15% (loose band — small corpus, merged overlaps)
    val totTok = docs.select(org.apache.spark.sql.functions
        .sum(org.apache.spark.sql.functions.size(
          TextAnalysis.tokens(org.apache.spark.sql.functions.col("text")))))
      .head().getLong(0)
    val masked = spans.map(_.getAs[Long]("n_tok")).sum
    val frac = masked.toDouble / totTok
    assert(frac > 0.05 && frac < 0.30, s"mask fraction $frac out of band")
  }

  test("pagerankTerms: mass conserves to ~1, ranks dense and descending") {
    val docs = Tables.documents(spark, sf0001)
    val all = TextAnalysis.pagerankTerms(docs, topK = Int.MaxValue).collect()
    assert(all.length > 20)
    val mass = all.map(_.getAs[Double]("pagerank")).sum
    assert(math.abs(mass - 1.0) < 0.01,
      s"PageRank mass must conserve (got $mass)")
    assert(all.forall(_.getAs[Double]("pagerank") > 0.0))
    val byRank = all.sortBy(_.getAs[Long]("rank"))
    assert(byRank.map(_.getAs[Long]("rank")).toSeq ===
      (1L to all.length.toLong).toSeq, "global ranks must be dense")
    val scores = byRank.map(_.getAs[Double]("pagerank")).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("triangleCensus counts each triangle once and excludes non-participants") {
    val sp = spark
    import sp.implicits._
    // K3 {a,b,c} plus pendant edge (a,d): one triangle, d never appears
    val docs = Seq(
      (1L, "a b"), (2L, "b c"), (3L, "a c"), (4L, "a d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.triangleCensus(docs, minCount = 1).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("term"),
        r.getAs[Long]("n_tri"), r.getAs[Long]("deg"),
        r.getAs[Double]("local_cc"))).toSeq
    // all three corners tie at n_tri=1 -> rank by term; cc(a) = 2/(3*2)
    assert(got === Seq(
      (1L, "a", 1L, 3L, 0.333333), (2L, "b", 1L, 2L, 1.0),
      (3L, "c", 1L, 2L, 1.0)))
  }

  test("bottomKSample: dense hash-ordered ranks, coordinated across corpus subsets") {
    val docs = Tables.documents(spark, sf0001)
    val full = TextAnalysis.bottomKSample(docs, 10).collect()
    val byLang = full.groupBy(_.getAs[String]("lang"))
    val langSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rows) =>
      assert(rows.length === math.min(10L, langSizes(lang)),
        s"$lang: wrong sample size")
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ===
        (1L to rows.length.toLong), s"$lang: ranks not dense")
      val hs = sorted.map(_.getAs[String]("h")).toSeq
      assert(hs === hs.sorted, s"$lang: sample not hash-ordered")
    }
    // coordination: sampling a sub-corpus keeps every full-sample member
    // that survives the filter, at a rank no worse than before
    val src = docs.select("source").limit(1).collect()(0).getString(0)
    val sub = TextAnalysis.bottomKSample(docs.filter(col("source") === src), 10)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))
        -> r.getAs[Long]("rk")).toMap
    val subIds = docs.filter(col("source") === src)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    full.filter(r => subIds(r.getAs[Long]("doc_id"))).foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))
      assert(sub.contains(key), s"$key dropped from the sub-corpus sample")
      assert(sub(key) <= r.getAs[Long]("rk"), s"$key rank worsened")
    }
  }

  test("kfoldAssign: duplicate content co-folds; folds bounded; census conserves") {
    val sp = spark
    import sp.implicits._
    val dup = "the exact same document text"
    val docs = Seq(
      (1L, dup, "xx", 28L), (2L, dup, "xx", 28L),
      (3L, dup, "xx", 28L), (4L, dup, "xx", 28L),
      (5L, "first unique text", "en", 17L),
      (6L, "second unique text", "en", 18L),
      (7L, "third unique text", "en", 17L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = TextAnalysis.kfoldAssign(docs, 5).collect()
    assert(got.forall(r => r.getAs[Long]("fold") >= 0 &&
      r.getAs[Long]("fold") < 5))
    assert(got.map(_.getAs[Long]("n_docs")).sum === 7L)
    // all four identical docs land in ONE (fold, lang=xx) cell
    val xx = got.filter(_.getAs[String]("lang") === "xx")
    assert(xx.length === 1, "duplicate content scattered across folds")
    assert(xx.head.getAs[Long]("n_docs") === 4L)
    assert(xx.head.getAs[Long]("n_contents") === 1L)
    assert(xx.head.getAs[Long]("n_chars") === 112L)
  }

  test("sketchJaccard: estimator is exact when the union fits inside the sketch") {
    val sp = spark
    import sp.implicits._
    // A = {x, y, z}; B = {y, z, w}: union 4, intersection 2 -> J = 0.5.
    // k = 64 >= |union|, so the sketch IS the union and est == exact.
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val b = Seq((1L, "y"), (2L, "z"), (3L, "w")).toDF("doc_id", "text")
    val r = graft.operators.Pipeline.sketchJaccardFrames(a, b, 64).head()
    assert(r.getAs[Long]("n_union") === 4L)
    assert(r.getAs[Double]("jaccard_est") === 0.5)
    assert(r.getAs[Double]("jaccard_exact") === 0.5)
    // undersized sketch: the estimate stays a valid probability and the
    // full-table exact value is untouched
    val r2 = graft.operators.Pipeline.sketchJaccardFrames(a, b, 2).head()
    assert(r2.getAs[Double]("jaccard_exact") === 0.5)
    val est = r2.getAs[Double]("jaccard_est")
    assert(est >= 0.0 && est <= 1.0)
  }

  test("tokenEntropy: zero for a one-token doc, ln 2 for a 50/50 doc, census exact") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "aa aa aa aa", "en", "s", 11L),   // entropy 0
      (2L, "aa bb aa bb", "en", "s", 11L))   // 2·quant6(0.5·ln 2) = 0.693148
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.operators.TextAnalysis.tokenEntropy(docs).head()
    assert(r.getAs[String]("lang") === "en")
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Double]("avg_entropy") === 0.346574)
    assert(r.getAs[Long]("n_low") === 2L)
    assert(r.getAs[Double]("max_entropy") === 0.693148)
  }

  test("weightedSample: same content, larger weight wins; exactly k per stratum") {
    val sp = spark
    import sp.implicits._
    // identical text ⇒ identical u; the race key −ln(u)/w is strictly
    // smaller for the heavier doc, so size-proportional preference is
    // isolated from the hash draw
    val docs = Seq(
      (1L, "same text", "en", "s", 10L),
      (2L, "same text", "en", "s", 1000L),
      (3L, "other words entirely", "fr", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextAnalysis.weightedSample(docs).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rk"),
        r.getAs[Long]("doc_id"))).toSeq
    assert(got === Seq(("en", 1L, 2L), ("en", 2L, 1L), ("fr", 1L, 3L)))
  }

  test("bpeChain guard: a vocabulary-scale k is refused before " +
       "scheduling k sequential jobs") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.bpeMerges(docs, k = TextAnalysis.MaxBpeMerges + 1)
    }
    assert(ex.getMessage.contains("sequential Spark jobs"),
      "the guard must explain the k-jobs cost model")
  }

  test("bfsHops: convergence on a 5-hop chain, budget truncation emits " +
       "unreached, disconnected components emit unreached") {
    val sp = spark
    import sp.implicits._
    // path graph aa-bb-cc-dd-ee-ff: doc i repeats its edge's two terms
    // 5 times (minCount = 5); middle terms count 10, tie-asc seed = bb.
    // ff is 4 hops from bb — past the OLD 3-round unroll, so this chain
    // is exactly the planted case convergence exists for.
    val chain = Seq("aa bb", "bb cc", "cc dd", "dd ee", "ee ff")
    val docs = chain.zipWithIndex.map { case (pair, i) =>
      (i.toLong, (pair + " ") * 5, "en", "s0", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.bfsHops(docs).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Int]("hop")).toMap
    assert(got === Map("bb" -> 0, "aa" -> 1, "cc" -> 1, "dd" -> 2,
        "ee" -> 3, "ff" -> 4),
      "iterate-until-empty-frontier must reach the WHOLE chain")
    // a budget below the diameter cannot silently truncate: the nodes
    // past it come back as explicit hop = -1 rows
    val capped = TextAnalysis.bfsHops(docs, hopBudget = 3).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Int]("hop")).toMap
    assert(capped("ff") === -1,
      "past-budget nodes must be emitted as unreached, not dropped")
    assert(capped.filter(_._2 >= 0) ===
      Map("bb" -> 0, "aa" -> 1, "cc" -> 1, "dd" -> 2, "ee" -> 3))
    // a second component (gg-hh, disconnected from the seed's) is
    // unreached at ANY budget
    val twoComp = (chain :+ "gg hh").zipWithIndex.map { case (pair, i) =>
      (i.toLong, (pair + " ") * 5, "en", "s0", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val comp = TextAnalysis.bfsHops(twoComp).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Int]("hop")).toMap
    assert(comp("gg") === -1 && comp("hh") === -1,
      "disconnected-component nodes must be explicit unreached rows")
    assert(comp("ff") === 4)
    // on the real corpus: seed at hop 0, terms unique across hops
    val real = TextAnalysis.bfsHops(Tables.documents(spark, sf0001)).collect()
    assert(real.count(_.getAs[Int]("hop") === 0) === 1, "exactly one seed")
    assert(real.map(_.getAs[String]("term")).distinct.length === real.length,
      "a term must appear at exactly one hop")
  }

  test("labelPropagation separates two disjoint vocabulary clusters") {
    val sp = spark
    import sp.implicits._
    // two 4-cliques with no cross edges: every within-cluster pair
    // co-occurs 6 ≥ minCount times; 2 rounds converge each clique onto
    // its lexicographically-smallest member
    val docs = (1L to 6L).map(i => (i, "aa ab ac ad")) ++
      (7L to 12L).map(i => (i, "ba bb bc bd"))
    val df = docs.toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.labelPropagation(df).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("community"),
        r.getAs[Long]("n_terms"))).toSeq
    assert(got === Seq((1L, "aa", 4L), (2L, "ba", 4L)))
  }

  test("distShift: zero divergence on identical slices, positive and JS-bounded on shifted") {
    val sp = spark
    import sp.implicits._
    val a = Seq((1L, "aa bb cc dd", "en"), (2L, "aa bb aa bb", "en"))
      .toDF("doc_id", "text", "lang")
    val same = graft.operators.Pipeline.distShiftFrames(a, a).head()
    assert(same.getAs[Double]("kl_ab") === 0.0)
    assert(same.getAs[Double]("kl_ba") === 0.0)
    assert(same.getAs[Double]("js") === 0.0)
    val b = Seq((1L, "aa aa aa aa", "en"), (2L, "ee ff ee ff", "en"))
      .toDF("doc_id", "text", "lang")
    val diff = graft.operators.Pipeline.distShiftFrames(a, b).head()
    assert(diff.getAs[Double]("kl_ab") > 0.0)
    assert(diff.getAs[Double]("kl_ba") > 0.0)
    val js = diff.getAs[Double]("js")
    assert(js > 0.0 && js <= math.log(2.0) + 1e-9,
      s"JS must sit in (0, ln 2], got $js")
  }

  test("profileTable: stat invariants on the real table, nulls counted when planted") {
    import org.apache.spark.sql.functions.{col, lit, pmod, when}
    val li = Tables.lineitem(spark, sf0001)
    val total = li.count()
    val prof = graft.operators.Pipeline.profileTable(li).collect()
    assert(prof.length === 11)
    prof.foreach { r =>
      val c = r.getAs[String]("col_name")
      assert(r.getAs[Long]("n_rows") === total, s"$c: n_rows")
      assert(r.getAs[Long]("n_nulls") === 0L, s"$c: unexpected nulls")
      val nd = r.getAs[Long]("n_distinct")
      assert(nd > 0L && nd <= total, s"$c: n_distinct $nd out of range")
      if (!r.isNullAt(r.fieldIndex("min_num"))) {
        val (mn, mx) = (r.getAs[Double]("min_num"), r.getAs[Double]("max_num"))
        assert(mn <= mx, s"$c: min > max")
        if (!r.isNullAt(r.fieldIndex("avg_num"))) {
          val av = r.getAs[Double]("avg_num")
          assert(mn <= av && av <= mx, s"$c: mean $av outside [$mn, $mx]")
        }
      }
      if (!r.isNullAt(r.fieldIndex("min_len")))
        assert(r.getAs[Long]("min_len") <= r.getAs[Long]("max_len"), s"$c: len")
    }
    // plant nulls in one column: the census must count exactly them
    val planted = li.withColumn("l_tax",
      when(pmod(col("l_orderkey"), lit(2L)) === 0, lit(null)
        .cast("double")).otherwise(col("l_tax")))
    val expectNull = li.filter(pmod(col("l_orderkey"), lit(2L)) === 0).count()
    val taxRow = graft.operators.Pipeline.profileTable(planted)
      .filter(col("col_name") === "l_tax").head()
    assert(taxRow.getAs[Long]("n_nulls") === expectNull)
  }

  test("profile merge law: any split of the table assembles to the one-pass profile") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import graft.operators.Pipeline
    val li = Tables.lineitem(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val onePass = rows(Pipeline.profileTable(li))
    for (k <- Seq(2, 5)) {
      val parts = (0 until k).map(i =>
        li.filter(pmod(col("l_orderkey"), lit(k.toLong)) === i))
      val m = Pipeline.profileMomentAggs
      val momentRows = parts.map(_.agg(m.head, m.tail: _*))
        .reduce(_ unionByName _)
      val merged = Pipeline.profileAssemble(
        Pipeline.profileMergeMoments(momentRows).crossJoin(
          Pipeline.profileDistinctCounts(
            parts.map(Pipeline.profileDistinctValues).reduce(_ unionByName _))))
      assert(rows(merged) === onePass,
        s"$k-way split merge diverged from the one-pass profile")
    }
  }

  test("chi2Independence: zero on a proportional table, N·φ² on a diagonal one") {
    val sp = spark
    import sp.implicits._
    def docsOf(cells: Seq[(String, String, Int)]) = {
      val rows = cells.zipWithIndex.flatMap { case ((l, s, n), i) =>
        (1 to n).map(j => (i * 1000L + j, "text", l, s, 4L)) }
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    }
    // proportional margins ⇒ E = O everywhere ⇒ every contribution 0
    val indep = graft.operators.Pipeline.chi2Independence(docsOf(Seq(
      ("en", "s0", 2), ("en", "s1", 2), ("fr", "s0", 3), ("fr", "s1", 3))))
      .collect()
    assert(indep.length === 4)
    indep.foreach(r => assert(r.getAs[Double]("contrib") === 0.0))
    // perfect diagonal association: every cell (incl. the structural
    // zeros) contributes (O−2)²/2 = 2, so χ² = 8 = N·φ² with φ² = 1
    val dep = graft.operators.Pipeline.chi2Independence(docsOf(Seq(
      ("en", "s0", 4), ("fr", "s1", 4)))).collect()
    assert(dep.length === 4)
    dep.foreach { r =>
      assert(r.getAs[Double]("expected") === 2.0)
      assert(r.getAs[Double]("contrib") === 2.0)
    }
    val zeros = dep.filter(_.getAs[Long]("n_obs") === 0L)
    assert(zeros.length === 2, "structural zero cells must be emitted")
  }

  test("kAnonymityCensus bands equivalence classes by size with exact shares") {
    val sp = spark
    import sp.implicits._
    val rows = Seq((1L, 0, "A", 500.0)) ++                       // class of 1
      (2L to 4L).map(i => (i, 1, "B", 1500.0)) ++                // class of 3
      (5L to 16L).map(i => (i, 2, "C", 2500.0))                  // class of 12
    val cust = rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.operators.Pipeline.kAnonymityCensus(cust).collect()
      .map(r => (r.getAs[String]("band"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_rows"), r.getAs[Double]("row_share"))).toSeq
    assert(got === Seq(("1 (unique)", 1L, 1L, 0.0625),
      ("2-4", 1L, 3L, 0.1875), ("10+", 1L, 12L, 0.75)))
  }

  test("lDiversityCensus bands QI classes by sensitive-value diversity") {
    val sp = spark
    import sp.implicits._
    // class (0, bucket 0): 3 rows, ALL segment A -> l=1 (homogeneous)
    // class (1, bucket 1): 4 rows over segments A,B -> l=2
    // class (2, bucket 2): 5 rows over segments A,B,C,D,E -> l=5
    val rows =
      (1L to 3L).map(i => (i, 0, "A", 500.0)) ++
      (4L to 7L).map(i => (i, 1, Seq("A", "B")(i.toInt % 2), 1500.0)) ++
      (8L to 12L).map(i => (i, 2, ('A' + (i.toInt % 5)).toChar.toString, 2500.0))
    val cust = rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.operators.Pipeline.lDiversityCensus(cust).collect()
      .map(r => (r.getAs[String]("band"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("min_l"),
        r.getAs[Double]("row_share"))).toSeq
    assert(got === Seq(("1 (homogeneous)", 1L, 3L, 1L, 0.25),
      ("2", 1L, 4L, 2L, 0.333333),
      ("5 (diverse)", 1L, 5L, 5L, 0.416667)))
  }

  test("riAudit reports orphans per constraint and passes intact edges") {
    val sp = spark
    import sp.implicits._
    val nation = Seq((0, "ALGERIA", 0), (1, "BRAZIL", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0, "AFRICA"), (1, "AMERICA")).toDF("r_regionkey", "r_name")
    // customer 3 points at nation 9 — an orphan; supplier edge intact
    val customer = Seq((1L, "a", 0, 10.0, "B"), (2L, "b", 1, 10.0, "B"),
      (3L, "c", 9, 10.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val supplier = Seq((1L, "s", 0, 5.0)).toDF(
      "s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val orders = Seq((10L, 1L, "O", 1.0, "1995-01-01", "1-URGENT"),
      (11L, 99L, "O", 1.0, "1995-01-01", "1-URGENT")).toDF(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val part = Seq((100L, "p", "B", "t", 1, 1.0)).toDF(
      "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val lineitem = Seq((10L, 100L, 1L, 1)).toDF(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val events = Seq((1L, 1L, "click")).toDF("event_id", "user_id", "event_type")
    val got = graft.operators.Pipeline.riAudit(lineitem, orders, part,
      supplier, customer, nation, region, events).collect()
      .map(r => r.getAs[String]("constraint_name") ->
        ((r.getAs[Long]("n_child"), r.getAs[Long]("n_orphan"),
          r.getAs[Long]("n_orphan_keys"), r.getAs[Int]("is_ok")))).toMap
    assert(got("customer.c_nationkey -> nation") === ((3L, 1L, 1L, 0)))
    assert(got("orders.o_custkey -> customer") === ((2L, 1L, 1L, 0)))
    assert(got("supplier.s_nationkey -> nation") === ((1L, 0L, 0L, 1)))
    assert(got("lineitem.l_orderkey -> orders") === ((1L, 0L, 0L, 1)))
    assert(got("nation.n_regionkey -> region") === ((2L, 0L, 0L, 1)))
  }

  test("dpCountRelease: clamped rounded release, epsilon scales noise") {
    val sp = spark
    import sp.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = (1L to 400L).map(i =>
      (i, ts0, i % 50, s"type${i % 20}", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e1 = graft.operators.Pipeline.dpCountRelease(events, 1.0).collect()
    assert(e1.length === 20)
    e1.foreach { r =>
      val (n, noise, rel) = (r.getAs[Long]("n_true"),
        r.getAs[Double]("noise"), r.getAs[Long]("n_released"))
      assert(n === 20L)
      assert(rel === math.max(0L, math.floor(n + noise + 0.5).toLong))
    }
    // the seeded uniform must land on both Laplace tails across cells
    assert(e1.count(_.getAs[Double]("noise") > 0) > 0)
    assert(e1.count(_.getAs[Double]("noise") < 0) > 0)
    // epsilon doubled -> noise halved (same u), within quant6 rounding
    val e2 = graft.operators.Pipeline.dpCountRelease(events, 2.0).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        r.getAs[Double]("noise")).toMap
    e1.foreach { r =>
      val half = e2((r.getAs[String]("event_type"), r.getAs[String]("day")))
      assert(math.abs(r.getAs[Double]("noise") / 2.0 - half) <= 2e-6)
    }
  }

  test("randomLaplaceNoise seam: default hashes unchanged, the true-RNG " +
       "path obeys the Laplace law distributionally") {
    val sp = spark
    import sp.implicits._
    // 2000 cells through the seam: assert the LAW (mean ~ 0, E|X| ~ b),
    // never values — a replayable release is what production must not be
    val cells = (1L to 2000L).map(i => (s"t$i", "2024-01-01", 100L))
      .toDF("event_type", "day", "n_true")
    val b = 2.5
    val noise = graft.operators.Pipeline
      .dpReleaseFromCells(cells, 1.0 / b,
        graft.operators.Pipeline.randomLaplaceNoise)
      .select("noise").collect().map(_.getDouble(0))
    assert(noise.length === 2000)
    val mean = noise.sum / noise.length
    val meanAbs = noise.map(math.abs).sum / noise.length
    // Laplace(b): E[X] = 0 (se = b*sqrt(2/n) ~ 0.08), E|X| = b (se ~ 0.06)
    assert(math.abs(mean) < 0.5, s"mean $mean should be ~0 for b=$b")
    assert(meanAbs > 0.8 * b && meanAbs < 1.2 * b,
      s"E|X| $meanAbs should be ~b=$b")
    // two epochs draw different noise (the whole point of the seam)
    val noise2 = graft.operators.Pipeline
      .dpReleaseFromCells(cells, 1.0 / b,
        graft.operators.Pipeline.randomLaplaceNoise)
      .select("noise").collect().map(_.getDouble(0))
    assert(!noise.sameElements(noise2),
      "independent release epochs must not share noise")
    // and the DEFAULT source still produces the seeded, replayable chain
    val d1 = graft.operators.Pipeline.dpReleaseFromCells(cells, 1.0 / b)
      .select("noise").collect().map(_.getDouble(0))
    val d2 = graft.operators.Pipeline.dpReleaseFromCells(cells, 1.0 / b)
      .select("noise").collect().map(_.getDouble(0))
    assert(d1.sameElements(d2), "the seeded default must stay replayable")
  }

  test("dpCountReleaseUser: contribution clamp bounds each user, cap census exact") {
    val sp = spark
    import sp.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 50 users x 8 events each, cap=4 -> every user clipped by 4; the
    // kept rows are each user's 4 LOWEST event_ids, which here is
    // exactly the id range 1..200
    val events = (1L to 400L).map(i =>
      (i, ts0, i % 50, s"type${i % 20}", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rel = graft.operators.Pipeline.dpCountReleaseUser(events, 1.0, cap = 4,
        audit = true)
      .collect()
    assert(rel.length === 20)
    rel.foreach { r =>
      assert(r.getAs[Long]("n_true") === 20L)
      // ids 1..200 spread evenly over the 20 types -> 10 kept per cell:
      // the clamp kept the lowest ids and no user exceeds cap anywhere
      assert(r.getAs[Long]("n_clamped") === 10L)
      assert(r.getAs[Long]("n_capped_users") === 50L)
      assert(r.getAs[Long]("n_clipped_rows") === 200L)
      assert(r.getAs[Long]("n_released") === math.max(0L,
        math.floor(10L + r.getAs[Double]("noise") + 0.5).toLong))
    }
    // user-level sensitivity: removing ONE user moves the clamped
    // histogram by at most cap rows in L1
    val without = graft.operators.Pipeline.dpCountReleaseUser(
      events.filter($"user_id" =!= 7L), 1.0, cap = 4, audit = true).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        r.getAs[Long]("n_clamped")).toMap
    val l1 = rel.map { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      math.abs(r.getAs[Long]("n_clamped") - without.getOrElse(k, 0L))
    }.sum
    assert(l1 <= 4L)
    // epsilon doubled -> noise halved (same salted u), within quant6
    val e2 = graft.operators.Pipeline.dpCountReleaseUser(events, 2.0, cap = 4,
        audit = true)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        r.getAs[Double]("noise")).toMap
    rel.foreach { r =>
      val half = e2((r.getAs[String]("event_type"), r.getAs[String]("day")))
      assert(math.abs(r.getAs[Double]("noise") / 2.0 - half) <= 2e-6)
    }
    // default (audit = false) shape is the publishable release only:
    // no exact counts, no noise column to subtract back out
    val pub = graft.operators.Pipeline.dpCountReleaseUser(events, 1.0, cap = 4)
    assert(pub.columns.toSeq === Seq("event_type", "day", "n_released"))
    val pubMap = pub.collect().map(r =>
      (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        r.getAs[Long]("n_released")).toMap
    rel.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      assert(pubMap(k) === r.getAs[Long]("n_released"))
    }
  }

  test("epochShuffle: per-epoch permutations with contiguous shard positions") {
    val sp = spark
    import sp.implicits._
    val docs = (1L to 60L).map(i => (i, s"text $i", "en", "s0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.epochShuffle(docs, epochs = 2, shards = 4).collect()
    assert(got.length === 120)
    // each doc exactly once per epoch
    val perEpoch = got.groupBy(_.getAs[Int]("epoch"))
    assert(perEpoch.keySet === Set(0, 1))
    perEpoch.values.foreach(rs =>
      assert(rs.map(_.getAs[Long]("doc_id")).toSet === (1L to 60L).toSet))
    // positions within each (epoch, shard) are 1..n with the md5 order
    got.groupBy(r => (r.getAs[Int]("epoch"), r.getAs[Long]("shard")))
      .foreach { case (_, rs) =>
        val sorted = rs.sortBy(r =>
          (r.getAs[Long]("shuffle_key"), r.getAs[Long]("doc_id")))
        assert(sorted.map(_.getAs[Long]("pos")).toSeq ===
          (1L to rs.length).toSeq)
      }
    // epochs are independent permutations: the shard assignment differs
    val s0 = perEpoch(0).map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val s1 = perEpoch(1).map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert((1L to 60L).exists(d => s0(d) != s1(d)))
  }

  test("riFromKeyCounts merge law: summed per-batch key counts == anti-join census") {
    val sp = spark
    import sp.implicits._
    // two "batches" of per-key counts; user 7 is an orphan seen in both
    val b0 = Seq((1L, 3L, 0L), (7L, 2L, 2L)).toDF("_fk", "n_rows", "n_orphan_rows")
    val b1 = Seq((1L, 1L, 0L), (7L, 4L, 4L), (9L, 1L, 1L))
      .toDF("_fk", "n_rows", "n_orphan_rows")
    val merged = b0.unionByName(b1).groupBy("_fk")
      .agg(org.apache.spark.sql.functions.sum("n_rows").as("n_rows"),
        org.apache.spark.sql.functions.sum("n_orphan_rows").as("n_orphan_rows"))
    val got = graft.operators.Pipeline
      .riFromKeyCounts("events.user_id -> customer", merged).collect().head
    assert((got.getAs[Long]("n_child"), got.getAs[Long]("n_orphan"),
      got.getAs[Long]("n_orphan_keys"), got.getAs[Int]("is_ok")) ===
      ((11L, 7L, 2L, 0)))
  }

  test("fdAudit measures g3 confidence: kept = sum of per-LHS max") {
    val sp = spark
    import sp.implicits._
    // source->lang: s0 maps to {en:3, fr:1} (keep 3), s1 to {de:2} (keep 2)
    // => confidence (3+2)/6, violations 1
    val docs = Seq((1L, "s0", "en"), (2L, "s0", "en"), (3L, "s0", "en"),
      (4L, "s0", "fr"), (5L, "s1", "de"), (6L, "s1", "de"))
      .toDF("doc_id", "source", "lang")
    val nation = Seq((0, "ALGERIA", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((1L, "a", 0, 10.0, "B")).toDF(
      "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq((10L, 1L, "O", 1.0, "1995-01-01", "1-URGENT")).toDF(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val part = Seq((100L, "p", "B", "t", 1, 1.0)).toDF(
      "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val lineitem = Seq((10L, 100L, 1L, 1, 5.0), (10L, 100L, 1L, 2, 7.0)).toDF(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
    val got = graft.operators.Pipeline.fdAudit(lineitem, orders, part,
      customer, nation, docs).collect()
      .map(r => (r.getAs[String]("fd_lhs"), r.getAs[String]("fd_rhs")) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_lhs_classes"),
          r.getAs[Long]("n_violations"), r.getAs[Double]("confidence"),
          r.getAs[Int]("holds")))).toMap
    assert(got(("source", "lang")) === ((6L, 2L, 1L, 0.833333, 0)))
    // the lineitem PK FD must hold exactly
    assert(got(("l_orderkey,l_linenumber", "l_quantity")) ===
      ((2L, 2L, 0L, 1.0, 1)))
    assert(got(("n_nationkey", "n_name")) === ((1L, 1L, 0L, 1.0, 1)))
  }

  test("piiRedactCensus finds planted and organic PII per class and language") {
    val sp = spark
    import sp.implicits._
    // ids 1,2,4,8 trigger no plants (coprime to 3/5/7); 15 plants
    // email (%3) AND ipv4 (%5) onto clean text
    val docs = Seq(
      (1L, "write to bob@mail.com now", "en"),
      (2L, "server 192.168.0.1 down", "en"),
      (15L, "also clean", "en"),
      (4L, "call +1-555-1234 today", "fr"),
      (8L, "clean text here", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.piiRedactCensus(docs).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_docs_pii"), r.getAs[Long]("n_emails"),
        r.getAs[Long]("n_ips"), r.getAs[Long]("n_phones"),
        r.getAs[Long]("chars_redacted"))).toSeq
    // en deltas: bob@mail.com 12->7, 192.168.0.1 11->4,
    // user15@example.com 18->7 + 10.15.0.1 9->4 = 5+7+16 = 28
    // fr: +1-555-1234 11->7 = 4
    assert(got === Seq(
      ("en", 3L, 3L, 2L, 2L, 0L, 28L),
      ("fr", 2L, 1L, 0L, 0L, 1L, 4L)))
  }
}
