package graft

import graft.operators.Experiment
import org.apache.spark.sql.functions._

/** Semantic invariants of the A/B experimentation family: assignment
  * determinism and balance, statistic arithmetic against a driver-side
  * recompute, degenerate-sample guards, the SRM flag, and CUPED's
  * perfect-covariate limit.
  */
class ExperimentSpec extends SparkSpec {

  private def syntheticEvents(rows: Seq[(Long, Long, Long, String, Double)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us") * 1000000L))
      .drop("us")
      .withColumn("props", lit("{}"))
  }

  private def quant6(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  test("abUserStats: assignment is deterministic, both variants populated, facts exact") {
    val events = Tables.events(spark, sf0001)
    val a = Experiment.abUserStats(events).collect()
    val b = Experiment.abUserStats(events).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq,
      "hash assignment must be replay-stable")
    val byVariant = a.groupBy(_.getAs[String]("variant"))
    assert(byVariant.keySet === Set("control", "treatment"),
      "both variants must be populated on the real corpus")
    // per-user facts recomputed driver-side
    val perUser = events.collect().groupBy(_.getAs[Long]("user_id"))
    a.foreach { r =>
      val rows = perUser(r.getAs[Long]("user_id"))
      val conv = rows.exists(e => e.getAs[String]("event_type") == "purchase"
        && e.getAs[Double]("value") >= 150.0)
      assert(r.getAs[Long]("converted") === (if (conv) 1L else 0L))
      val rev = rows.filter(_.getAs[String]("event_type") == "purchase")
        .map(e => BigDecimal(e.getAs[Double]("value"))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(r.getAs[java.math.BigDecimal]("revenue").doubleValue
        === rev.toDouble, s"user ${r.getAs[Long]("user_id")} revenue drifted")
    }
  }

  test("abMetrics: z and t match a driver-side recompute of the same arithmetic") {
    val events = Tables.events(spark, sf0001)
    val got = Experiment.abMetrics(events).collect().head
    val users = Experiment.abUserStats(events).collect()
    val by = users.groupBy(_.getAs[String]("variant"))
    def stats(v: String): (Long, Long, Double, Double) = {
      val rs = by(v)
      val n = rs.length.toLong
      val conv = rs.map(_.getAs[Long]("converted")).sum
      val sr = rs.map(r => BigDecimal(r.getAs[java.math.BigDecimal]("revenue")))
        .sum.toDouble
      val sq = rs.map { r =>
        val d = r.getAs[java.math.BigDecimal]("revenue").doubleValue
        BigDecimal(quant6(d * d)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      (n, conv, sr, sq)
    }
    val (nc, cc, src, sqc) = stats("control")
    val (nt, ct, srt, sqt) = stats("treatment")
    val (ncd, ntd) = (nc.toDouble, nt.toDouble)
    val (pc, pt) = (cc / ncd, ct / ntd)
    val pPool = (cc + ct).toDouble / (ncd + ntd)
    val z = (pt - pc) / math.sqrt(pPool * (1.0 - pPool) * (1.0 / ncd + 1.0 / ntd))
    val (mc, mt) = (src / ncd, srt / ntd)
    val vc = (sqc - src * src / ncd) / (ncd - 1.0)
    val vt = (sqt - srt * srt / ntd) / (ntd - 1.0)
    val t = (mt - mc) / math.sqrt(vt / ntd + vc / ncd)
    assert(got.getAs[Long]("n_c") === nc && got.getAs[Long]("n_t") === nt)
    assert(math.abs(got.getAs[Double]("z_conv") - z) < 1e-6)
    assert(math.abs(got.getAs[Double]("t_rev") - t) < 1e-6)
    assert(math.abs(got.getAs[Double]("var_rev_c") - vc) < 1e-6)
  }

  test("abMetrics: saturated conversion reports NULL z, never a division error") {
    // every user converts (one high-value purchase each) -> pPool = 1
    val events = syntheticEvents((1L to 12L).map(i =>
      (i, i * 3600L, i, "purchase", 200.0 + i)))
    val row = Experiment.abMetrics(events).collect().head
    assert(row.isNullAt(row.fieldIndex("z_conv")),
      "pPool = 1 must yield NULL z_conv (guarded), not an ANSI error")
    assert(row.getAs[Double]("conv_rate_c") === 1.0)
    assert(row.getAs[Double]("conv_rate_t") === 1.0)
  }

  test("srmCheck: balanced split passes, a dropped variant's users trip the flag") {
    val balanced = Experiment.srmCheck(Tables.events(spark, sf0001)).collect()
    assert(balanced.length === 2)
    val total = balanced.map(_.getAs[Long]("n_users")).sum
    balanced.foreach { r =>
      assert(r.getAs[Double]("expected") === total.toDouble / 2.0)
      // contribution law: (n - e)^2 / e quantized
      val d = r.getAs[Long]("n_users").toDouble - r.getAs[Double]("expected")
      assert(math.abs(r.getAs[Double]("contribution") -
        quant6(d * d / r.getAs[Double]("expected"))) < 1e-9)
    }
    assert(balanced.map(_.getAs[Int]("srm_flag")).distinct.toSeq === Seq(0),
      "a hash-balanced 50/50 split must not trip SRM on the real corpus")
    // simulate a logging bug on a 200-user synthetic corpus: drop ~90%
    // of one variant's users (sf0.001's 15 users are too few for the
    // chi-square to clear the critical value even when fully imbalanced)
    val events = syntheticEvents((1L to 200L).map(i =>
      (i, 1704067200L + i * 60L, i, "view", 1.0)))
    val broken = events.join(
      Experiment.abUserStats(events)
        .filter(col("variant") === "control" ||
          pmod(col("user_id"), lit(10L)) === 0L)
        .select("user_id"), Seq("user_id"))
    val flagged = Experiment.srmCheck(broken).collect()
    assert(flagged.nonEmpty && flagged.forall(_.getAs[Int]("srm_flag") === 1),
      "a 10x variant imbalance must trip the SRM flag")
  }

  test("abSequential: always-valid p is monotone, detects a planted effect, spares a null") {
    val day = 86400L
    val base = 1704067200L // 2024-01-01
    // skeleton: 400 users, one view each on day 1 -> learn the hash
    // assignment, then plant the effect on the treatment side only
    val ids = (1L to 400L)
    val skeleton = ids.map(i => (i, base + i, i, "view", 1.0))
    val variants = Experiment.abUserStats(syntheticEvents(skeleton))
      .collect().map(r =>
        r.getAs[Long]("user_id") -> r.getAs[String]("variant")).toMap
    val treatmentIds = ids.filter(variants(_) == "treatment")
    // treatment users convert spread over days 3..12
    val planted = treatmentIds.zipWithIndex.map { case (i, j) =>
      (10000L + i, base + (3 + j % 10) * day + i, i, "purchase", 200.0)
    }
    val got = Experiment.abSequential(syntheticEvents(skeleton ++ planted))
      .collect()
    val ps = got.flatMap(r => Option(r.getAs[Double]("p_always_valid")))
    assert(ps.nonEmpty)
    ps.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, "always-valid p must be non-increasing")
    }
    val last = got.last
    assert(last.getAs[Double]("p_always_valid") < 0.05 &&
      last.getAs[Int]("decided") === 1,
      "an every-treatment-user-converts effect must cross the 0.05 boundary")
    assert(last.getAs[Double]("z") > 0.0, "effect direction must be positive")
    // A/A: conversions split by id parity (independent of the hash) ->
    // theta ~ 0, Lambda stays small, the monitor never fires
    val aa = ids.filter(_ % 2 == 0).map(i =>
      (20000L + i, base + 2 * day + i, i, "purchase", 200.0))
    val nullRun = Experiment.abSequential(syntheticEvents(skeleton ++ aa))
      .collect()
    assert(nullRun.last.getAs[Double]("p_always_valid") > 0.05,
      "a null effect must not be declared significant")
    assert(nullRun.forall(_.getAs[Int]("decided") != 1))
  }

  test("abFunnel: stages telescope per variant and reconcile with the pooled funnel") {
    val events = Tables.events(spark, sf0001)
    val got = Experiment.abFunnel(events).collect()
      .map(r => r.getAs[String]("stage") -> r).toMap
    assert(got.keySet === Set("1_view", "2_click", "3_purchase"))
    // telescoping: each stage's conversions are the next stage's base
    Seq("control" -> ("base_c", "conv_c"), "treatment" -> ("base_t", "conv_t"))
      .foreach { case (_, (b, c)) =>
        assert(got("2_click").getAs[Long](b) === got("1_view").getAs[Long](c))
        assert(got("3_purchase").getAs[Long](b) === got("2_click").getAs[Long](c))
        got.values.foreach(r => assert(r.getAs[Long](c) <= r.getAs[Long](b)))
      }
    // variant split reconciles with the pooled q_funnel counts
    val pooled = graft.operators.Events.funnelCounts(events).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    got.foreach { case (stage, r) =>
      assert(r.getAs[Long]("conv_c") + r.getAs[Long]("conv_t") === pooled(stage),
        s"$stage: variant conversions must sum to the pooled funnel")
    }
  }

  test("abSegments: terciles partition users equally, cells reconcile with the pooled read-out") {
    val events = Tables.events(spark, sf0001)
    val segs = Experiment.abSegments(events).collect()
    assert(segs.map(_.getAs[Int]("segment")).toSeq === Seq(1, 2, 3))
    val total = segs.map(r => r.getAs[Long]("n_c") + r.getAs[Long]("n_t")).sum
    val nUsers = events.select("user_id").distinct().count()
    assert(total === nUsers, "terciles must partition the user population")
    // equal-count cut: tercile sizes differ by at most 1
    val sizes = segs.map(r => r.getAs[Long]("n_c") + r.getAs[Long]("n_t"))
    assert(sizes.max - sizes.min <= 1)
    // cells reconcile with the pooled q_ab_metrics counts
    val pooled = Experiment.abMetrics(events).collect().head
    assert(segs.map(_.getAs[Long]("conv_c")).sum === pooled.getAs[Long]("conv_c"))
    assert(segs.map(_.getAs[Long]("conv_t")).sum === pooled.getAs[Long]("conv_t"))
    assert(segs.map(_.getAs[Long]("n_c")).sum === pooled.getAs[Long]("n_c"))
  }

  test("abWinsorized: the pooled clip catches a planted whale, bound matches quantile law") {
    val base = 1704067200L
    // 20 users with revenue 10..200; user 20 is a whale at 10000
    val events = syntheticEvents((1L to 20L).map { i =>
      val v = if (i == 20) 10000.0 else i * 10.0
      (i, base + i * 3600, i, "purchase", v)
    })
    val got = Experiment.abWinsorized(events).collect().head
    // driver-side interpolated p95 over the 20 per-user revenues
    val xs = ((1L to 19L).map(_ * 10.0) :+ 10000.0).sorted
    val pos = 0.95 * (xs.length - 1)
    val (lo, frac) = (pos.toInt, pos - pos.toInt)
    val expectHi = xs(lo) + frac * (xs(lo + 1) - xs(lo))
    assert(math.abs(got.getAs[Double]("clip_hi") - expectHi) < 1e-6,
      s"clip bound ${got.getAs[Double]("clip_hi")} vs quantile law $expectHi")
    // exactly the whale is clipped (it's the only value above the bound)
    assert(got.getAs[Long]("n_clip_c") + got.getAs[Long]("n_clip_t") === 1L)
    // on the real corpus: clipped means never exceed raw means, t finite
    val real = Experiment.abWinsorized(Tables.events(spark, sf0001))
      .collect().head
    val raw = Experiment.abMetrics(Tables.events(spark, sf0001))
      .collect().head
    assert(real.getAs[Double]("mean_w_c") <=
      raw.getAs[Double]("mean_rev_c") + 1e-6)
    assert(real.getAs[Double]("mean_w_t") <=
      raw.getAs[Double]("mean_rev_t") + 1e-6)
    assert(!real.isNullAt(real.fieldIndex("t_wins")))
  }

  test("abRatio: one-session-per-user corpus degenerates to the per-user mean law") {
    val base = 1704067200L
    // every user: a view and a purchase 5 min apart -> exactly 1 session,
    // x = 1, varX = covXY = 0, so var(R) = varY/n and R = mean revenue
    val events = syntheticEvents((1L to 100L).flatMap(i => Seq(
      (i, base + i * 7200, i, "view", 1.0),
      (1000 + i, base + i * 7200 + 300, i, "purchase", (i % 10) * 10.0))))
    val got = Experiment.abRatio(events).collect().head
    // driver-side recompute with the same quantization
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val users = (1L to 100L).map { i =>
      val v = Experiment.abUserStats(
        syntheticEvents(Seq((i, base, i, "view", 1.0)))).collect()
        .head.getAs[String]("variant")
      (v, ((i % 10) * 10.0))
    }
    def stats(v: String) = {
      val ys = users.filter(_._1 == v).map(_._2)
      val n = ys.length.toDouble
      val sy = ys.map(BigDecimal(_)).sum.toDouble
      val syy = ys.map(y => BigDecimal(q6(y * y))).sum.toDouble
      val r = sy / n // sx = n since x = 1 per user
      val varY = (syy - sy * sy / n) / (n - 1.0)
      (n, q6(r), q6(varY / (n * 1.0 * 1.0)))
    }
    val (nc, rc, vc) = stats("control")
    val (nt, rt, vt) = stats("treatment")
    assert(got.getAs[Long]("n_c") === nc.toLong)
    assert(math.abs(got.getAs[Double]("rps_c") - rc) < 2e-6)
    assert(math.abs(got.getAs[Double]("rps_t") - rt) < 2e-6)
    val z = (rt - rc) / math.sqrt(vc + vt)
    assert(math.abs(got.getAs[Double]("z_ratio") - z) < 1e-4,
      s"z ${got.getAs[Double]("z_ratio")} vs recomputed $z")
    // and on the real corpus the statistic exists (variances positive)
    val real = Experiment.abRatio(Tables.events(spark, sf0001)).collect().head
    assert(!real.isNullAt(real.fieldIndex("z_ratio")))
  }

  test("abPower: MDE shrinks with sample size, relative form consistent") {
    val base = 1704067200L
    def corpus(n: Long) = syntheticEvents((1L to n).flatMap(i => Seq(
      (i, base + i, i, "view", 1.0),
      // every third user converts high-value
      (1000 + i, base + 100 + i, i, "purchase",
        if (i % 3 == 0) 200.0 else 10.0))))
    val small = Experiment.abPower(corpus(60)).collect().head
    val large = Experiment.abPower(corpus(600)).collect().head
    assert(large.getAs[Double]("mde_abs") < small.getAs[Double]("mde_abs"),
      "10x the sample must detect a smaller effect")
    Seq(small, large).foreach { r =>
      assert(math.abs(r.getAs[Double]("mde_rel") -
        r.getAs[Double]("mde_abs") / r.getAs[Double]("p_pool")) < 1e-4)
    }
  }

  test("cuped: a perfectly predictive covariate drives variance reduction to ~1") {
    // per user: one pre-period purchase (value 10i) and one post-period
    // purchase (value 20i) -> y = 2x exactly, theta = 2, y_adj constant
    // 2024-01-01 = 1704067200s epoch (pre-period); 2024-01-17 post
    val pre = (1L to 12L).map(i =>
      (i, 1704067200L + i * 3600L, i, "purchase", 10.0 * i))
    val post = (1L to 12L).map(i =>
      (100L + i, 1705449600L + i * 3600L, i, "purchase", 20.0 * i))
    val events = syntheticEvents(pre ++ post)
    val rows = Experiment.cuped(events, cutover = "2024-01-16").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("theta") === 2.0,
        "theta must recover the exact linear coefficient")
      assert(r.getAs[Double]("var_rev_adj") <= 1e-6,
        "a perfect covariate must collapse adjusted variance")
      assert(r.getAs[Double]("var_reduction") >= 0.999999)
      // CUPED preserves the pooled mean structure: adjusted values are
      // the constant 2*xbar, so each variant's adjusted mean equals it
      assert(r.getAs[Double]("mean_rev_adj") ===
        rows.head.getAs[Double]("mean_rev_adj"))
    }
    // on the real corpus theta is pooled-optimal, so per-variant
    // variance may wiggle slightly but must not materially increase
    val real = Experiment.cuped(Tables.events(spark, sf0001)).collect()
    real.foreach(r =>
      assert(r.getAs[Double]("var_reduction") >= -0.1,
        s"${r.getAs[String]("variant")}: CUPED materially increased variance"))
  }

  test("bradleyTerry: a total order by per-user value yields the same " +
       "ranking, exact contest census, and normalized strengths") {
    // 4 users, identical preference a > b > c (per-user value sums 3,2,1)
    // -> each unordered pair contested once per user: n_ab=n_ac=n_bc=4,
    // a wins all 8 of its contests, b wins 4, c wins 0.
    val rows = for {
      u <- 1L to 4L
      (t, v) <- Seq(("a", 3.0), ("b", 2.0), ("c", 1.0))
    } yield ((u * 10 + v.toLong), u * 1000000L, u, t, v)
    val got = Experiment.bradleyTerry(syntheticEvents(rows)).collect()
    assert(got.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    assert(got.map(_.getString(1)).toSeq === Seq("a", "b", "c"),
      "strengths must recover the generating total order")
    got.foreach { r =>
      assert(r.getAs[Long]("contests") === 8L)
    }
    assert(got.map(_.getAs[Long]("wins")).toSeq === Seq(8L, 4L, 0L))
    val scores = got.map(_.getAs[Double]("bt_score"))
    assert(scores.zip(scores.tail).forall { case (x, y) => x > y },
      "scores strictly decrease down the ranking")
    assert(math.abs(scores.sum - 1.0) < 1e-4,
      "normalized strengths sum to ~1 (quant6 slack)")
  }

  test("bradleyTerry: per-user value TIES produce no contest") {
    val rows = Seq(
      (1L, 1000000L, 1L, "a", 2.0), (2L, 2000000L, 1L, "b", 2.0),
      (3L, 1000000L, 2L, "a", 3.0), (4L, 2000000L, 2L, "b", 1.0))
    val got = Experiment.bradleyTerry(syntheticEvents(rows)).collect()
    // only user 2 contributes a contest
    assert(got.map(r => (r.getString(1), r.getAs[Long]("contests"),
      r.getAs[Long]("wins"))).toSeq ===
      Seq(("a", 1L, 1L), ("b", 1L, 0L)))
  }
}
