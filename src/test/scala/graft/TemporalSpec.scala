package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

/** Semantic invariants of the temporal-modeling operators — SCD2
  * interval algebra, point-in-time lookup, resample/forward-fill, and
  * the incremental-view merge law — on hand oracles where the shape
  * matters and on the real tables where the algebra must hold
  * everywhere.
  */
class TemporalSpec extends SparkSpec {

  private def syntheticEvents(rows: Seq[(Long, Long, Long, String, Double)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
  }

  test("scd2 versions tile each user's history: contiguous, alternating, one current") {
    val hist = Events.scd2(Tables.events(spark, sf0001)).collect()
      .groupBy(_.getAs[Long]("user_id"))
    assert(hist.nonEmpty)
    hist.foreach { case (u, rows) =>
      val vs = rows.sortBy(_.getAs[Long]("version_no"))
      // version numbers are dense from 1
      assert(vs.map(_.getAs[Long]("version_no")).toSeq ===
        (1L to vs.length).toSeq, s"user $u: version_no not dense")
      // consecutive versions abut exactly and never repeat a state
      vs.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a.getAs[Long]("valid_to_us") === b.getAs[Long]("valid_from_us"),
          s"user $u: gap or overlap between versions")
        assert(a.getAs[String]("state") !== b.getAs[String]("state"),
          s"user $u: consecutive versions share a state (change-point missed)")
      }
      // exactly the last version is current (NULL valid_to)
      assert(vs.init.forall(!_.isNullAt(vs.head.fieldIndex("valid_to_us"))),
        s"user $u: non-final version has NULL valid_to")
      assert(vs.last.isNullAt(vs.last.fieldIndex("valid_to_us")),
        s"user $u: final version is not open-ended")
      assert(vs.map(_.getAs[Int]("is_current")).sum === 1,
        s"user $u: is_current count != 1")
    }
  }

  test("scd2Lookup returns the state valid one hour before each purchase (hand oracle)") {
    val h = 3600L * 1000000L
    val ev = syntheticEvents(Seq(
      // user 1: view at 0h, purchase at 2h -> an hour before = 'view'
      (1L, 0L, 1L, "view", 1.0),
      (2L, 2 * h, 1L, "purchase", 1.0),
      // user 2: purchase at 0h -> an hour before predates history -> NULL
      (3L, 0L, 2L, "purchase", 1.0),
      // user 3: view 0h, cart 30m, purchase 90m -> an hour before = 30m,
      // exactly on the cart version's valid_from (boundary is inclusive)
      (4L, 0L, 3L, "view", 1.0),
      (5L, h / 2, 3L, "cart", 1.0),
      (6L, h / 2 + h, 3L, "purchase", 1.0)))
    val got = Events.scd2Lookup(ev).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        Option(r.getAs[String]("prior_state"))).toMap
    assert(got === Map(2L -> Some("view"), 3L -> None, 6L -> Some("cart")))
  }

  test("resampleFfill: last observation per slot wins, gaps carry forward (hand oracle)") {
    val m = 60L * 1000000L
    val ev = syntheticEvents(Seq(
      (1L, 10 * m, 7L, "view", 1.0),   // hour 0, early
      (2L, 50 * m, 7L, "view", 5.0),   // hour 0, later -> wins the slot
      (3L, 185 * m, 7L, "view", 2.0))) // hour 3
    val got = Events.resampleFfill(ev).collect()
      .map(r => (r.getAs[Long]("slot_us") / (60 * m),
        r.getAs[Double]("value_ffill"), r.getAs[Int]("is_observed")))
    assert(got.toSeq === Seq((0L, 5.0, 1), (1L, 5.0, 0), (2L, 5.0, 0),
      (3L, 2.0, 1)))
  }

  test("resampleInterp draws the straight line across a gap (hand oracle)") {
    val m = 60L * 1000000L
    val ev = syntheticEvents(Seq(
      (1L, 10 * m, 7L, "view", 1.0),   // hour 0
      (2L, 185 * m, 7L, "view", 4.0))) // hour 3: gap slots 1,2 interpolate
    val got = Events.resampleInterp(ev).collect()
      .map(r => (r.getAs[Long]("slot_us") / (60 * m),
        r.getAs[Double]("value_interp"), r.getAs[Int]("is_observed")))
    assert(got.toSeq === Seq((0L, 1.0, 1), (1L, 2.0, 0), (2L, 3.0, 0),
      (3L, 4.0, 1)))
  }

  test("rollingFeatures: trailing mean/min/max over the filled grid (hand oracle)") {
    val m = 60L * 1000000L
    val ev = syntheticEvents(Seq(
      (1L, 50 * m, 7L, "view", 5.0),   // hour 0
      (2L, 185 * m, 7L, "view", 2.0))) // hour 3; hours 1-2 fill with 5.0
    val got = Events.rollingFeatures(ev, win = 4).collect()
      .map(r => (r.getAs[Long]("slot_us") / (60 * m), r.getAs[Double]("ma"),
        r.getAs[Double]("min_v"), r.getAs[Double]("max_v"),
        r.getAs[Long]("n_obs")))
    assert(got.toSeq === Seq(
      (0L, 5.0, 5.0, 5.0, 1L), (1L, 5.0, 5.0, 5.0, 1L),
      (2L, 5.0, 5.0, 5.0, 1L), (3L, 4.25, 2.0, 5.0, 2L)))
  }

  test("survivalKm: hand-computed curve with interleaved censoring, and " +
       "the everyone-churns cell zeroes the curve") {
    val d = 86400000000L
    // cohort "view": churn at t=0 (n=5), t=2 (n=4), t=3 (n=3), then two
    // users censored at t=5 (last events AT the horizon). cohort
    // "click": both users churn at t=2 -> d = n_risk -> survival 0.
    val ev = syntheticEvents(Seq(
      (1L, 0L, 1L, "view", 1.0), (2L, 2 * d, 1L, "view", 1.0),
      (3L, 0L, 2L, "view", 1.0),
      (4L, 0L, 3L, "view", 1.0), (5L, 3 * d, 3L, "view", 1.0),
      (6L, 0L, 4L, "view", 1.0), (7L, 5 * d, 4L, "view", 1.0),
      (8L, 0L, 5L, "view", 1.0), (9L, 5 * d, 5L, "view", 1.0),
      (10L, 0L, 7L, "click", 1.0), (11L, 2 * d, 7L, "click", 1.0),
      (12L, 0L, 8L, "click", 1.0), (13L, 2 * d, 8L, "click", 1.0)))
    val got = Events.survivalKm(ev).collect().map(r =>
      (r.getString(0), r.getAs[Long]("t_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_event"), r.getAs[Long]("n_censor"),
        r.getAs[Double]("survival")))
    assert(got.toSeq === Seq(
      ("click", 2L, 2L, 2L, 0L, 0.0),
      ("view", 0L, 5L, 1L, 0L, 0.8),
      ("view", 2L, 4L, 1L, 0L, 0.6),
      ("view", 3L, 3L, 1L, 0L, 0.4),
      ("view", 5L, 2L, 0L, 2L, 0.4)))
  }

  test("conformalForecast: hand-computed split, order-statistic q-hat, and coverage") {
    val h = 3600L * 1000000L
    // one (type, hod) series: hours 0,24,48,... all land on hod 0 with
    // counts 1,2,3,4,5,6 -> backtests at t_idx 2..6 have running-mean
    // forecasts 1, 1.5, 2, 2.5, 3 and |residuals| 1, 1.5, 2, 2.5, 3.
    // split: bt_n=5 -> cal = first (5*4 div 5)=4 backtests; q-hat rank =
    // least(((4+1)*9+9) div 10, 4) = 4 -> 4th smallest cal residual 2.5.
    // test = the last backtest, residual 3 > 2.5 -> uncovered.
    val rows = for {
      day <- 0 until 6
      i <- 0 to day
    } yield ((day * 10 + i).toLong, day * 24 * h + i * 1000L, 1L, "view", 1.0)
    val got = Events.conformalForecast(syntheticEvents(rows)).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getString(0), r.getAs[Long]("n_cal"), r.getAs[Long]("n_test"),
      r.getAs[Double]("qhat"), r.getAs[Long]("n_covered"),
      r.getAs[Double]("coverage")) === (("view", 4L, 1L, 2.5, 0L, 0.0)))
  }

  test("conformalForecast: cal/test partition the backtest set; coverage bounded") {
    val ev = Tables.events(spark, sf0001)
    val bt = Events.forecastNaive(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_backtests")).toMap
    Events.conformalForecast(ev).collect().foreach { r =>
      val t = r.getString(0)
      assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") === bt(t),
        s"$t: split must tile the backtests")
      assert(r.getAs[Double]("qhat") >= 0.0)
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_test"))
      val cov = r.getAs[Double]("coverage")
      assert(cov >= 0.0 && cov <= 1.0)
    }
  }

  test("winsorize: clip counts track the 5% tails, clipped sum never exceeds raw") {
    val ev = Tables.events(spark, sf0001)
    val raw = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Events.winsorize(ev).collect().foreach { r =>
      val (t, n) = (r.getString(0), r.getAs[Long]("n_events"))
      assert(n === raw(t))
      val (lo, hi) = (r.getAs[Long]("n_clip_lo"), r.getAs[Long]("n_clip_hi"))
      // strictly-below-p05 (resp. above-p95) counts are bounded by the
      // exact-percentile definition
      assert(lo <= n * 5 / 100 + 1, s"$t: lower clip count $lo above the tail")
      assert(hi <= n * 5 / 100 + 1, s"$t: upper clip count $hi above the tail")
      assert(r.getAs[Double]("p05") <= r.getAs[Double]("p95"))
    }
  }

  test("incremental MV merge equals the one-shot aggregate (merge law)") {
    val ev = Tables.events(spark, sf0001)
    val direct = ev.withColumn("day", dayofmonth(col("ts")))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    val merged = Events.mvIncremental(spark, ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    assert(merged === direct)
  }

  test("sessionPaths: gap-bounded transitions count, cross-session pairs dropped, p conditions on from") {
    val m = 60L * 1000000L
    // user 1: a→b (1 min, counts), b→c (40 min gap — crosses the
    // session boundary, dropped); user 2: a→b then b→a (both count)
    val rows = Seq(
      (1L, 0L * m, 1L, "a", 1.0),
      (2L, 1L * m, 1L, "b", 1.0),
      (3L, 41L * m, 1L, "c", 1.0),
      (4L, 0L * m, 2L, "a", 1.0),
      (5L, 1L * m, 2L, "b", 1.0),
      (6L, 2L * m, 2L, "a", 1.0))
    val got = Events.sessionPaths(syntheticEvents(rows)).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_trans"), r.getAs[Double]("p"))).toMap
    assert(got(("a", "b")) === (2L, 1.0), "a→b twice, a's only outgoing edge")
    assert(got(("b", "a")) === (1L, 1.0), "b→a once, b's only outgoing edge")
    assert(!got.contains(("b", "c")), "a 40-minute gap is a new session")
    // dense global ranks
    assert(!got.contains(("c", "a")))
  }

  test("anomalyMad: a planted spike hour tops its type with a huge rz; a flat type (MAD=0) is dropped") {
    val hourUs = 3600L * 1000000L
    // type "spiky": wobbling quiet hours (10/11/12) and one 100-event
    // spike — med 11, MAD 1, rz(spike) = (100−11)/1.4826 ≈ 60.
    // type "flat": identical counts every hour — MAD = 0, no z-score.
    val rows = (0 until 10).flatMap { h =>
      val n = if (h == 7) 100 else 10 + (h % 3)
      (0 until n).map(i =>
        (h * 1000L + i, h * hourUs + i * 1000L, 1L, "spiky", 1.0))
    } ++ (0 until 10).flatMap { h =>
      (0 until 10).map(i =>
        (100000L + h * 1000L + i, h * hourUs + i * 1000L, 1L, "flat", 1.0))
    }
    val got = Events.anomalyMad(syntheticEvents(rows)).collect()
    assert(!got.exists(_.getAs[String]("event_type") == "flat"),
      "a zero-MAD type has no robust z-score and must be dropped")
    val spiky = got.filter(_.getAs[String]("event_type") == "spiky")
      .sortBy(_.getAs[Long]("rk"))
    assert(spiky.nonEmpty)
    val top = spiky.head
    assert(top.getAs[Int]("h") === 7, "the spike hour must rank first")
    assert(top.getAs[Double]("med") === 11.0)
    assert(top.getAs[Double]("mad") === 1.0)
    val expected = math.floor((top.getAs[Long]("n_events") - 11.0) /
      (1.4826 * 1.0) * 1e6 + 0.5) / 1e6
    assert(top.getAs[Double]("rz") === expected)
    assert(top.getAs[Boolean]("is_anomaly"),
      "a 60-sigma spike must carry the flag")
    assert(spiky.forall(r => r.getAs[Boolean]("is_anomaly") ===
      (math.abs(r.getAs[Double]("rz")) > 3.0)))
  }

  test("lastTouchAttribution credits in-session touches; session breaks go direct") {
    val m = 60L * 1000000L
    val ev = syntheticEvents(Seq(
      // user 1: view -> cart -> purchase within one session: cart credited
      (1L, 0L, 1L, "view", 1.0),
      (2L, 10 * m, 1L, "cart", 1.0),
      (3L, 20 * m, 1L, "purchase", 5.0),
      // user 2: purchase with no prior touch: direct
      (4L, 0L, 2L, "purchase", 7.0),
      // user 3: the 40-min gap breaks the session, so the view earns no
      // credit; the second purchase's only in-session predecessor is a
      // purchase (filtered from touches): both direct
      (5L, 0L, 3L, "view", 1.0),
      (6L, 40 * m, 3L, "purchase", 2.0),
      (7L, 41 * m, 3L, "purchase", 3.0)))
    val got = Events.lastTouchAttribution(ev).collect()
      .map(r => (r.getAs[String]("attributed"), r.getAs[Long]("n_purchases"),
        r.getAs[Double]("attributed_value"))).toSeq
    assert(got === Seq(("cart", 1L, 5.0), ("direct", 3L, 12.0)))
  }

  test("ltvCohorts: cumulative telescopes, LTV monotone, revenue conserves") {
    val events = Tables.events(spark, sf0001)
    val got = Events.ltvCohorts(events).collect()
      .groupBy(_.getAs[String]("cohort_day"))
    var grandTotal = BigDecimal(0)
    got.foreach { case (cohort, rows) =>
      val byAge = rows.sortBy(_.getAs[Int]("age"))
      var cum = 0.0
      byAge.foreach { r =>
        cum += r.getAs[Double]("revenue")
        assert(math.abs(r.getAs[Double]("cum_revenue") - cum) < 1e-6,
          s"$cohort age ${r.getAs[Int]("age")}: cumulative drifted")
      }
      // LTV monotone non-decreasing (revenue is non-negative)
      val ltvs = byAge.map(_.getAs[Double]("ltv"))
      ltvs.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-9) }
      grandTotal += BigDecimal(byAge.last.getAs[Double]("cum_revenue"))
    }
    // conservation: cohort-final cumulative revenues sum to the corpus's
    // total purchase revenue
    val total = events.filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,2)"))).collect()
      .head.getDecimal(0)
    assert((grandTotal - BigDecimal(total)).abs < 1e-4,
      s"LTV curves lost revenue: $grandTotal vs $total")
  }

  test("autocorrelation: alternating series gives the exact +-(n-k)/n pattern, constant series guarded") {
    val h = 3600L * 1000000L
    // 'view': 10 events at even hours, 0 at odd, over 24 hours ->
    // population ACF r_k = (-1)^k (n-k)/n; 'error': constant 3/hour ->
    // zero variance -> NULL (guarded, not a division error)
    val view = (0 until 24).filter(_ % 2 == 0).flatMap(hr =>
      (1 to 10).map(j => ((hr * 100 + j).toLong, hr * h, 1L, "view", 1.0)))
    val const = (0 until 24).flatMap(hr =>
      (1 to 3).map(j => ((10000 + hr * 100 + j).toLong, hr * h, 2L, "error", 1.0)))
    val got = Events.autocorrelation(syntheticEvents(view ++ const), maxLag = 4)
      .collect()
    val views = got.filter(_.getAs[String]("event_type") == "view")
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf")).toMap
    // driver-side recompute of the same arithmetic over the dense grid
    // (hours 0..22: the last observed hour bounds it; 12 even, 11 odd)
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val xs = (0 to 22).map(hr => if (hr % 2 == 0) 10.0 else 0.0)
    val xbar = q6(xs.sum / xs.length)
    val d = xs.map(_ - xbar)
    val den = d.map(v => q6(v * v)).sum
    (1 to 4).foreach { k =>
      val num = (k until d.length).map(t => q6(d(t) * d(t - k))).sum
      val expect = num / den
      assert(math.abs(views(k) - expect) < 1e-5,
        s"lag $k: got ${views(k)}, want $expect")
      // sign alternates with the lag parity — the seasonality signature
      assert(math.signum(views(k)) === math.pow(-1.0, k))
    }
    got.filter(_.getAs[String]("event_type") == "error").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("acf")),
        "a zero-variance series must report NULL acf")
    }
  }

  test("positionAttribution: U-shaped credit splits by hand oracle, mass conserves") {
    val m = 60L * 1000000L
    val ev = syntheticEvents(Seq(
      // user 1: 3 touches -> 0.4 / 0.2 / 0.4 of the 8.0 purchase
      (1L, 0L, 1L, "view", 1.0), (2L, 10 * m, 1L, "cart", 1.0),
      (3L, 20 * m, 1L, "click", 1.0), (4L, 30 * m, 1L, "purchase", 8.0),
      // user 2: single touch -> full credit
      (5L, 0L, 2L, "view", 1.0), (6L, 10 * m, 2L, "purchase", 5.0),
      // user 3: two touches -> 0.5 each
      (7L, 0L, 3L, "view", 1.0), (8L, 10 * m, 3L, "cart", 1.0),
      (9L, 20 * m, 3L, "purchase", 2.0),
      // user 4: no touch -> direct
      (10L, 0L, 4L, "purchase", 7.0),
      // user 5: 4 touches -> 0.4 / 0.1 / 0.1 / 0.4 of 10.0
      (11L, 0L, 5L, "view", 1.0), (12L, 5 * m, 5L, "cart", 1.0),
      (13L, 10 * m, 5L, "click", 1.0), (14L, 15 * m, 5L, "search", 1.0),
      (15L, 20 * m, 5L, "purchase", 10.0)))
    val got = Events.positionAttribution(ev).collect()
      .map(r => (r.getAs[String]("attributed"), r.getAs[Long]("n_credits"),
        r.getAs[Double]("credit_mass"), r.getAs[Double]("credited_value")))
      .toSeq
    assert(got === Seq(
      ("cart", 3L, 0.8, 3.6), ("click", 2L, 0.5, 4.2),
      ("direct", 1L, 1.0, 7.0), ("search", 1L, 0.4, 4.0),
      ("view", 4L, 2.3, 13.2)))
    // conservation on the real corpus: each purchase hands out exactly
    // 1.0 of credit (up to quantization dust on the 0.2/(n-2) middles)
    val events = Tables.events(spark, sf0001)
    val nPurch = events.filter(col("event_type") === "purchase").count()
    val mass = Events.positionAttribution(events).collect()
      .map(_.getAs[Double]("credit_mass")).sum
    assert(math.abs(mass - nPurch.toDouble) < nPurch * 1e-3,
      f"credit mass $mass%.4f drifted from the $nPurch purchases")
  }

  test("seasonalDecompose: hour-of-day means and residual variance (hand oracle)") {
    val h = 3600L * 1000000L
    val ev = syntheticEvents(Seq(
      // hod 0 across two days: values 2 and 4 -> mean 3, var ((1)+(1))/2 = 1
      (1L, 0L, 1L, "view", 2.0),
      (2L, 24 * h, 2L, "view", 4.0),
      // hod 1, single value -> mean 6, var 0
      (3L, h, 1L, "view", 6.0)))
    val got = Events.seasonalDecompose(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hod"),
        r.getAs[Long]("n_events"), r.getAs[Double]("seasonal_mean"),
        r.getAs[Double]("resid_var"))).toSeq
    assert(got === Seq(("view", 0L, 2L, 3.0, 1.0), ("view", 1L, 1L, 6.0, 0.0)))
  }

  test("cusumChangepoint finds the level shift at its exact hour, scaled-integer exact") {
    val h = 3600L * 1000000L
    // hourly counts 1,1,1,5,5,5 over hours 0..5: mean 3, C_t = cum − 3t
    // = −2,−4,−6,−4,−2,0 → peak |C| = 6 at hour 2, negative side
    val rows = (0 to 2).flatMap(hr => Seq((hr * 10L + 1, hr * h, 1L, "view", 1.0))) ++
      (3 to 5).flatMap(hr => (1 to 5).map(i =>
        (hr * 10L + i, hr * h, 1L, "view", 1.0)))
    val got = Events.cusumChangepoint(syntheticEvents(rows)).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[String]("event_type") === "view")
    assert(r.getAs[Long]("n_hours") === 6L)
    assert(r.getAs[Long]("n_events") === 18L)
    assert(r.getAs[Long]("cp_hr") === 2L)
    assert(r.getAs[Int]("cp_sign") === -1)
    assert(r.getAs[Double]("cusum_abs") === 6.0)
  }

  test("forecastNaive: expanding prior-slot mean, leakage-free by construction") {
    val h = 3600L * 1000000L
    // same hour-of-day across three days: counts 2, 4, 6. Backtests:
    // day2 f = 2 (ape 0.5, ae 2); day3 f = mean(2,4) = 3 (ape 0.5, ae 3)
    val rows = (1 to 2).map(i => (i.toLong, 0L, 1L, "view", 1.0)) ++
      (3 to 6).map(i => (i.toLong, 24 * h, 1L, "view", 1.0)) ++
      (7 to 12).map(i => (i.toLong, 48 * h, 1L, "view", 1.0))
    val r = Events.forecastNaive(syntheticEvents(rows)).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("event_type") === "view")
    assert(r.head.getAs[Long]("n_backtests") === 2L)
    assert(r.head.getAs[Double]("mape") === 0.5)
    assert(r.head.getAs[Double]("mae") === 2.5)
  }

  test("ewmaSmooth matches the hand-computed adjust=True EWMA at the series head") {
    val h = 3600L * 1000000L
    val ev = syntheticEvents(Seq(
      (1L, 0L, 1L, "view", 2.0),
      (2L, h, 1L, "view", 4.0),
      (3L, 2 * h, 1L, "view", 8.0)))
    val got = Events.ewmaSmooth(ev).collect()
      .map(r => (r.getAs[Long]("slot_us"), r.getAs[Double]("ewma"))).toSeq
    // slot0: 2; slot1: (4 + .75*2)/(1+.75); slot2: (8 + .75*4 + .5625*2)/2.3125
    assert(got === Seq((0L, 2.0), (h, 3.142857), (2 * h, 5.243243)))
  }

  test("ewma is a convex combination: bounded by the trailing-span min/max") {
    import org.apache.spark.sql.expressions.Window
    val grid = Events.resampleFfill(Tables.events(spark, sf0001))
    val w = Window.partitionBy("user_id").orderBy("slot_us")
      .rowsBetween(-7, Window.currentRow)
    val bounds = grid
      .withColumn("lo", min("value_ffill").over(w))
      .withColumn("hi", max("value_ffill").over(w))
      .select("user_id", "slot_us", "lo", "hi")
    val joined = Events.ewmaSmooth(Tables.events(spark, sf0001))
      .join(bounds, Seq("user_id", "slot_us")).collect()
    assert(joined.length > 1000)
    joined.foreach { r =>
      val (e, lo, hi) = (r.getAs[Double]("ewma"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      // quant6 rounds each term to 1e-6, so the convexity bound holds
      // up to a tolerance RELATIVE to the value scale (the denominator's
      // weight quantization multiplies through by v)
      val tol = 1e-4 * (1.0 + math.max(math.abs(lo), math.abs(hi)))
      assert(e >= lo - tol && e <= hi + tol,
        s"ewma $e escapes trailing window [$lo, $hi]")
    }
  }
}
