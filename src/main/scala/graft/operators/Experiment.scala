package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B EXPERIMENT ANALYSIS over the clickstream — the reference's domain
  * (page-view events, `record.json`) is exactly the data an
  * experimentation platform reads, and the analysis queries every such
  * platform ships are deterministic aggregations this engine can oracle
  * end-to-end: hash-based variant assignment, per-variant conversion and
  * revenue metrics with the classical test statistics (two-proportion z,
  * Welch t), the sample-ratio-mismatch guardrail, and CUPED variance
  * reduction. (Kohavi et al., "Trustworthy Online Controlled
  * Experiments" — the method canon; all arithmetic here follows the
  * suite's quant6/DECIMAL determinism discipline so every statistic
  * hash-matches the DuckDB oracle.)
  *
  * Scale shape: everything is user-keyed — one hash agg on user_id
  * (corpus-cardinality, parallel), then a |variants|-row census and
  * scalar statistic math. No windows, no joins beyond broadcast-scalar;
  * the per-user stage is the only corpus-sized pass.
  */
object Experiment {

  import graft.operators.Similarity.quant6

  /** Deterministic hash-based variant assignment — how production
    * platforms bucket users (stable across sessions/replays, no
    * coordination): variant = md5₆₀("exp1|user_id") mod 2. The same
    * rand()-free coordinated-assignment law as the hash split
    * (TextAnalysis.hashSplit), keyed by experiment salt so concurrent
    * experiments get independent bucketings.
    */
  private[operators] def variantOf(userId: Column): Column =
    when(pmod(NearDup.md5Hash60(
        concat_ws("|", lit("exp1"), userId)), lit(2L)) === 0L,
      lit("control")).otherwise(lit("treatment"))

  /** Per-user experiment facts: variant, conversion flag, and purchase
    * revenue in exact DECIMAL(18,2). Conversion is a HIGH-VALUE purchase
    * (value >= `convThreshold`): with ~67 events per user at every SF,
    * an any-purchase flag saturates to 100% at any scale (pPool = 1
    * zeroes the z denominator) — a premium-purchase goal is the realistic
    * conversion that stays non-degenerate as the corpus grows. The shared
    * first stage of [[abMetrics]] and the streaming monitor (whose
    * per-batch user partials merge additively into exactly this frame).
    */
  private[graft] def abUserStats(events: DataFrame,
                                 convThreshold: Double = 150.0): DataFrame =
    abUsersFromPartials(abUserPartial(events, convThreshold))

  /** The ADDITIVE per-user partial (user_id, n_events, n_conversions,
    * revenue): counts and DECIMAL sums, so per-micro-batch partials
    * merge by user-keyed sum into exactly the one-shot frame — the unit
    * the streaming monitor lands under batch=N dirs.
    */
  private[graft] def abUserPartial(events: DataFrame,
                                   convThreshold: Double = 150.0): DataFrame =
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase" &&
            col("value") >= convThreshold, 1L).otherwise(0L))
          .as("n_conversions"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("revenue"))

  /** Merge per-user partials (one or many per user) by additive sum and
    * derive the experiment facts — the drain side of the streaming
    * monitor, and the second half of [[abUserStats]] (batch = the
    * single-partial case), so the two can never drift.
    */
  private[graft] def abUsersFromPartials(partials: DataFrame): DataFrame =
    partials.groupBy("user_id")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("n_conversions")).as("n_conversions"),
        sum(col("revenue")).as("revenue"))
      .select(col("user_id"), variantOf(col("user_id")).as("variant"),
        col("n_events"),
        (col("n_conversions") > 0L).cast("long").as("converted"),
        col("revenue").cast("decimal(18,2)").as("revenue"))

  /** The experiment read-out from an already-built per-user frame
    * (user_id, variant, converted, revenue) — shared by the batch query
    * and the streaming monitor so the two can never drift. ONE row:
    * per-variant sample sizes, conversion rates, revenue means/variances,
    * the two-proportion z statistic on conversion, and the Welch t
    * statistic on per-user revenue.
    *
    * Determinism: per-user revenue is exact DECIMAL; squares are
    * quantized (quant6) then DECIMAL-summed so the variance inputs are
    * order-independent; every derived statistic is a FIXED chain of IEEE
    * ops on those exact operands, mirrored operation-for-operation in
    * the oracle, and display-rounded at emission.
    */
  private[graft] def abMetricsFromUsers(users: DataFrame): DataFrame = {
    val perVariant = users
      .withColumn("rev_d", col("revenue").cast("double"))
      .withColumn("rev_sq", quant6(col("rev_d") * col("rev_d")))
      .groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_conv"),
        sum(col("revenue")).as("sum_rev"),
        sum(col("rev_sq").cast("decimal(38,6)")).as("sum_rev_sq"))
    def side(v: String, c: String): Column =
      max(when(col("variant") === v, col(c)))
    val wide = perVariant.agg(
      side("control", "n_users").as("n_c"),
      side("treatment", "n_users").as("n_t"),
      side("control", "n_conv").as("conv_c"),
      side("treatment", "n_conv").as("conv_t"),
      side("control", "sum_rev").cast("double").as("sr_c"),
      side("treatment", "sum_rev").cast("double").as("sr_t"),
      side("control", "sum_rev_sq").cast("double").as("sq_c"),
      side("treatment", "sum_rev_sq").cast("double").as("sq_t"))
    val nC = col("n_c").cast("double")
    val nT = col("n_t").cast("double")
    val pC = col("conv_c").cast("double") / nC
    val pT = col("conv_t").cast("double") / nT
    val pPool = (col("conv_c") + col("conv_t")).cast("double") / (nC + nT)
    val mC = col("sr_c") / nC
    val mT = col("sr_t") / nT
    val varC = (col("sq_c") - col("sr_c") * col("sr_c") / nC) / (nC - lit(1.0))
    val varT = (col("sq_t") - col("sr_t") * col("sr_t") / nT) / (nT - lit(1.0))
    // degenerate-sample guards: a saturated (or empty) conversion pool
    // zeroes the z denominator, and a zero-variance revenue pool zeroes
    // the t denominator — both report NULL (no statistic computable),
    // never an ANSI division error
    wide.select(
      col("n_c"), col("n_t"), col("conv_c"), col("conv_t"),
      round(pC, 6).as("conv_rate_c"),
      round(pT, 6).as("conv_rate_t"),
      round(when(pPool > 0.0 && pPool < 1.0, (pT - pC) /
        sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / nC + lit(1.0) / nT))),
        6).as("z_conv"),
      round(mC, 6).as("mean_rev_c"),
      round(mT, 6).as("mean_rev_t"),
      round(when(nC > lit(1.0), varC), 6).as("var_rev_c"),
      round(when(nT > lit(1.0), varT), 6).as("var_rev_t"),
      round(when(nC > lit(1.0) && nT > lit(1.0) &&
        varT / nT + varC / nC > 0.0,
        (mT - mC) / sqrt(varT / nT + varC / nC)), 6).as("t_rev"))
  }

  /** A/B METRICS census (q_ab_metrics): hash-assigned variants, per-user
    * conversion + revenue, the z/t read-out — see [[abMetricsFromUsers]].
    */
  def abMetrics(events: DataFrame, convThreshold: Double = 150.0): DataFrame =
    abMetricsFromUsers(abUserStats(events, convThreshold))

  /** SEQUENTIAL (always-valid) EXPERIMENT MONITORING (q_ab_sequential;
    * Johari et al. 2017, mSPRT) — the fix for the single most famous
    * experimentation pitfall: an analyst who checks a fixed-horizon z
    * test daily and stops at the first |z| > 1.96 inflates the false-
    * positive rate several-fold (the peeking problem). The mixture
    * sequential probability ratio test gives a p-value that is valid at
    * EVERY interim look: per day-prefix d, the conversion-rate
    * difference θ̂_d and its pooled variance V_d feed
    * Λ_d = √(V_d/(V_d+τ²)) · exp(θ̂_d²·τ²/(2·V_d·(V_d+τ²))), and the
    * always-valid p is 1/cummax(Λ) clamped to 1 — monotone by
    * construction, so "stop when p < α" is a valid rule however often
    * the dashboard is refreshed. Emitted per day next to the naive z
    * trajectory, so the table SHOWS what peeking would have done.
    *
    * Cumulative counts come from first-event/first-conversion days:
    * per user ONE (variant, first_day, first_conv_day) row, then day-
    * census cumsums — one corpus pass, every window over the |days|-row
    * census (the q_period_over_period discipline), never fact rows.
    * Determinism: counts exact; θ̂/V fixed IEEE chains on exact
    * operands; Λ through quant6 (the suite's accepted transcendental
    * law — exp here, ln elsewhere); the exp argument clamped at 700 on
    * both engines so a vanishing variance saturates instead of
    * overflowing; degenerate prefixes (no conversions yet, pPool ∈
    * {0,1}) emit NULL and the running max skips them.
    */
  def abSequential(events: DataFrame, convThreshold: Double = 150.0,
                   tau: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = events.groupBy("user_id")
      .agg(min(date_format(col("ts"), "yyyy-MM-dd")).as("first_day"),
        min(when(col("event_type") === "purchase" &&
            col("value") >= convThreshold,
          date_format(col("ts"), "yyyy-MM-dd"))).as("first_conv_day"))
      .select(variantOf(col("user_id")).as("variant"),
        col("first_day"), col("first_conv_day"))
    val days = events.select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct()
    val grid = days.crossJoin(
      days.sparkSession.range(2).select(
        when(col("id") === 0, lit("control")).otherwise(lit("treatment"))
          .as("variant")))
    val newU = perUser.groupBy(col("variant"), col("first_day").as("day"))
      .agg(count(lit(1)).as("n_new_users"))
    val newC = perUser.filter(col("first_conv_day").isNotNull)
      .groupBy(col("variant"), col("first_conv_day").as("day"))
      .agg(count(lit(1)).as("n_new_conv"))
    val wCum = Window.partitionBy("variant").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .join(newU, Seq("variant", "day"), "left")
      .join(newC, Seq("variant", "day"), "left")
      .select(col("variant"), col("day"),
        sum(coalesce(col("n_new_users"), lit(0L))).over(wCum).as("cu"),
        sum(coalesce(col("n_new_conv"), lit(0L))).over(wCum).as("cc"))
    def side(v: String, c: String): Column =
      max(when(col("variant") === v, col(c)))
    val wide = cum.groupBy("day")
      .agg(side("control", "cu").as("n_c"), side("treatment", "cu").as("n_t"),
        side("control", "cc").as("conv_c"),
        side("treatment", "cc").as("conv_t"))
    val nC = col("n_c").cast("double")
    val nT = col("n_t").cast("double")
    val pPool = (col("conv_c") + col("conv_t")).cast("double") / (nC + nT)
    val theta = col("conv_t").cast("double") / nT -
      col("conv_c").cast("double") / nC
    val v = pPool * (lit(1.0) - pPool) * (lit(1.0) / nC + lit(1.0) / nT)
    val tau2 = lit(tau * tau)
    val ok = col("n_c") > 0L && col("n_t") > 0L &&
      pPool > 0.0 && pPool < 1.0
    val scored = wide
      .withColumn("z", when(ok,
        graft.operators.Similarity.quant6(theta / sqrt(v))))
      .withColumn("lambda", when(ok, graft.operators.Similarity.quant6(
        sqrt(v / (v + tau2)) *
        exp(least(theta * theta * tau2 /
          (lit(2.0) * v * (v + tau2)), lit(700.0))))))
    val wRun = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("_lmax", max(col("lambda")).over(wRun))
      .select(col("day"), col("n_c"), col("n_t"),
        col("conv_c"), col("conv_t"), col("z"),
        col("lambda"),
        round(least(lit(1.0) / col("_lmax"), lit(1.0)), 6)
          .as("p_always_valid"),
        (least(lit(1.0) / col("_lmax"), lit(1.0)) < 0.05).cast("int")
          .as("decided"))
      .orderBy("day")
  }

  /** SAMPLE-RATIO-MISMATCH check (q_srm_check) — the guardrail every
    * experiment readout runs FIRST: if the observed variant split
    * deviates from the designed 50/50 beyond chance, the assignment or
    * logging pipeline is broken and every downstream metric is suspect
    * (the single most common source of bogus experiment wins). χ²
    * goodness-of-fit of observed user counts against equal expectation;
    * flagged at the df=1 95% critical value 3.841459.
    *
    * Scale shape: one distinct-users agg (user-keyed), a 2-row census, a
    * 1-row broadcast total. Determinism: expected = n/2 is one IEEE
    * divide; contributions quantized then DECIMAL-summed (the q_chi2
    * law).
    */
  def srmCheck(events: DataFrame): DataFrame = {
    val perVariant = events.select(col("user_id")).distinct()
      .select(variantOf(col("user_id")).as("variant"))
      .groupBy("variant").agg(count(lit(1)).as("n_users"))
    val tot = perVariant.agg(sum(col("n_users")).as("n_total"))
    val rows = perVariant.crossJoin(broadcast(tot))
      .withColumn("expected", col("n_total").cast("double") / lit(2.0))
      .withColumn("contribution", quant6(
        (col("n_users").cast("double") - col("expected")) *
        (col("n_users").cast("double") - col("expected")) / col("expected")))
    val chi = rows.agg(
      sum(col("contribution").cast("decimal(18,6)")).cast("double")
        .as("chi2_total"))
    rows.crossJoin(broadcast(chi))
      .select(col("variant"), col("n_users"), round(col("expected"), 6)
          .as("expected"),
        round(col("contribution"), 6).as("contribution"),
        round(col("chi2_total"), 6).as("chi2_total"),
        (col("chi2_total") > 3.841459).cast("int").as("srm_flag"))
      .orderBy("variant")
  }

  /** WINSORIZED EXPERIMENT METRIC (q_ab_winsorized) — the heavy-tail
    * defense every revenue experiment runs: one whale user can move a
    * raw mean more than the treatment does, so per-user revenue is
    * clipped at the POOLED exact interpolated p95 (pooled — a
    * per-variant clip would let the treatment choose its own outlier
    * definition, biasing the contrast) and the Welch t is read on the
    * clipped metric next to the clip census. The established exact
    * percentile law (Spark `percentile` ≡ DuckDB quantile_cont) makes
    * the bound itself oracle-exact.
    *
    * Scale shape: one per-user agg + a 1-row percentile broadcast + the
    * 2-row census. Determinism: clipped values and their squares
    * quant6'd then DECIMAL-summed (the clip bound is an interpolated
    * double); statistic chain mirrored op-for-op; degenerate variance
    * emits NULL.
    */
  def abWinsorized(events: DataFrame, p: Double = 0.95): DataFrame = {
    val rev = abUserStats(events)
      .withColumn("rev_d", col("revenue").cast("double"))
    val bound = rev.agg(expr(s"percentile(rev_d, $p)").as("clip_hi"))
    val perVariant = rev.crossJoin(broadcast(bound))
      .withColumn("w",
        when(col("rev_d") > col("clip_hi"), col("clip_hi"))
          .otherwise(col("rev_d")))
      .withColumn("wq", quant6(col("w")))
      .withColumn("wsq", quant6(col("w") * col("w")))
      .groupBy("variant")
      .agg(count(lit(1)).as("n"),
        sum((col("rev_d") > col("clip_hi")).cast("long")).as("n_clip"),
        sum(col("wq").cast("decimal(18,6)")).cast("double").as("sw"),
        sum(col("wsq").cast("decimal(38,6)")).cast("double").as("swsq"),
        min(col("clip_hi")).as("clip_hi"))
    def side(v: String, c: String): Column =
      max(when(col("variant") === v, col(c)))
    val wide = perVariant.agg(
      side("control", "n").as("n_c"), side("treatment", "n").as("n_t"),
      side("control", "n_clip").as("n_clip_c"),
      side("treatment", "n_clip").as("n_clip_t"),
      side("control", "sw").as("sw_c"), side("treatment", "sw").as("sw_t"),
      side("control", "swsq").as("sq_c"),
      side("treatment", "swsq").as("sq_t"),
      max(col("clip_hi")).as("clip_hi"))
    val nC = col("n_c").cast("double")
    val nT = col("n_t").cast("double")
    val mC = col("sw_c") / nC
    val mT = col("sw_t") / nT
    val vC = (col("sq_c") - col("sw_c") * col("sw_c") / nC) / (nC - lit(1.0))
    val vT = (col("sq_t") - col("sw_t") * col("sw_t") / nT) / (nT - lit(1.0))
    wide.select(col("n_c"), col("n_t"),
      round(col("clip_hi"), 6).as("clip_hi"),
      col("n_clip_c"), col("n_clip_t"),
      round(mC, 6).as("mean_w_c"), round(mT, 6).as("mean_w_t"),
      round(when(nC > lit(1.0) && nT > lit(1.0) &&
        vT / nT + vC / nC > 0.0,
        (mT - mC) / sqrt(vT / nT + vC / nC)), 6).as("t_wins"))
  }

  /** HETEROGENEOUS TREATMENT EFFECTS by activity segment
    * (q_ab_segments) — the follow-up question to every win: did it come
    * from the heavy users or the casual ones? Users are cut into three
    * equal-count ACTIVITY terciles (by total event count, user_id
    * tie-break, on the scale-safe
    * [[graft.operators.TextAnalysis.withGlobalRank]] device — never a
    * global single-partition window), and the conversion z is read per
    * segment. A treatment that wins overall but only in tercile 3 ships
    * to a different audience than one that wins everywhere.
    *
    * Scale shape: one user-keyed agg, the range-partitioned global
    * rank, a 6-cell census, scalar math. Determinism: tercile = integer
    * arithmetic on (rank, n); statistics the q_ab_metrics chain;
    * degenerate segment pools emit NULL.
    */
  def abSegments(events: DataFrame,
                 convThreshold: Double = 150.0): DataFrame = {
    val perUser = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase" &&
            col("value") >= convThreshold, 1L).otherwise(0L))
          .as("n_conversions"))
      .select(col("user_id"), col("n_events"),
        variantOf(col("user_id")).as("variant"),
        (col("n_conversions") > 0L).cast("long").as("converted"))
    val ranked = perUser.transform(
      graft.operators.TextAnalysis.withGlobalRank("ark",
        col("n_events").asc, col("user_id").asc))
    val n = ranked.agg(count(lit(1)).as("_n"))
    val cells = ranked.crossJoin(broadcast(n))
      .withColumn("segment",
        (expr("(3 * (ark - 1)) DIV _n") + lit(1L)).cast("int"))
      .groupBy("segment", "variant")
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    def side(v: String, c: String): Column =
      max(when(col("variant") === v, col(c)))
    val wide = cells.groupBy("segment")
      .agg(side("control", "n_users").as("n_c"),
        side("treatment", "n_users").as("n_t"),
        side("control", "n_conv").as("conv_c"),
        side("treatment", "n_conv").as("conv_t"))
    val nC = coalesce(col("n_c"), lit(0L)).cast("double")
    val nT = coalesce(col("n_t"), lit(0L)).cast("double")
    val rC = col("conv_c").cast("double") / nC
    val rT = col("conv_t").cast("double") / nT
    val pPool = (coalesce(col("conv_c"), lit(0L)) +
      coalesce(col("conv_t"), lit(0L))).cast("double") / (nC + nT)
    val ok = col("n_c") > 0L && col("n_t") > 0L &&
      pPool > 0.0 && pPool < 1.0
    wide.select(col("segment"),
      coalesce(col("n_c"), lit(0L)).as("n_c"),
      coalesce(col("n_t"), lit(0L)).as("n_t"),
      coalesce(col("conv_c"), lit(0L)).as("conv_c"),
      coalesce(col("conv_t"), lit(0L)).as("conv_t"),
      round(when(col("n_c") > 0L, rC), 6).as("rate_c"),
      round(when(col("n_t") > 0L, rT), 6).as("rate_t"),
      round(when(ok, (rT - rC) /
        sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / nC + lit(1.0) / nT))),
        6).as("z"))
      .orderBy("segment")
  }

  /** DELTA-METHOD RATIO METRIC (q_ab_ratio; Deng–Knoblich–Lu 2018) —
    * the statistically honest treatment of a RATIO metric: revenue per
    * SESSION is Σy/Σx over users, and because both numerator and
    * denominator are random, the naive per-session t-test is wrong
    * (sessions from one user are correlated). The delta method gives
    * the variance of the user-level ratio estimator,
    * var(R) ≈ (σ_y² − 2·R·σ_xy + R²·σ_x²)/(n·x̄²), from per-user
    * moments, and the two-variant z follows. Sessions are the
    * [[graft.operators.Events.sessionize]] 30-minute-gap law.
    *
    * Scale shape: one user-led sessionization window + one user-keyed
    * agg; everything downstream is a 2-row census and scalar math.
    * Determinism: y in exact DECIMAL, x integer; squares and
    * cross-products quant6'd then DECIMAL-summed; the statistic chain
    * mirrored op-for-op; degenerate variances emit NULL.
    */
  def abRatio(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val perUser = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs ||
             lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("new_session")).as("x"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("y"))
      .select(variantOf(col("user_id")).as("variant"),
        col("x").cast("double").as("x"), col("y").cast("double").as("y"))
    val moments = perUser
      .withColumn("xx", quant6(col("x") * col("x")))
      .withColumn("yy", quant6(col("y") * col("y")))
      .withColumn("xy", quant6(col("x") * col("y")))
      .groupBy("variant")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(18,2)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(18,2)")).cast("double").as("sy"),
        sum(col("xx").cast("decimal(38,6)")).cast("double").as("sxx"),
        sum(col("yy").cast("decimal(38,6)")).cast("double").as("syy"),
        sum(col("xy").cast("decimal(38,6)")).cast("double").as("sxy"))
    val nD = col("n").cast("double")
    val xbar = col("sx") / nD
    val r = col("sy") / col("sx")
    val varX = (col("sxx") - col("sx") * col("sx") / nD) / (nD - lit(1.0))
    val varY = (col("syy") - col("sy") * col("sy") / nD) / (nD - lit(1.0))
    val covXY = (col("sxy") - col("sx") * col("sy") / nD) / (nD - lit(1.0))
    val varR = (varY - lit(2.0) * r * covXY + r * r * varX) /
      (nD * xbar * xbar)
    val scored = moments.select(col("variant"), col("n"),
      round(r, 6).as("rev_per_session"),
      quant6(r).as("_r"), quant6(varR).as("_vr"))
    def side(c: String): (Column, Column) =
      (max(when(col("variant") === "control", col(c))),
       max(when(col("variant") === "treatment", col(c))))
    val (nc, nt) = side("n")
    val (rc, rt) = side("_r")
    val (vc, vt) = side("_vr")
    val (rpsC, rpsT) = side("rev_per_session")
    scored.agg(
      nc.as("n_c"), nt.as("n_t"),
      rpsC.as("rps_c"), rpsT.as("rps_t"),
      round(when(vc + vt > 0.0, (rt - rc) / sqrt(vc + vt)), 6)
        .as("z_ratio"))
  }

  /** PER-VARIANT FUNNEL with stage-level significance (q_ab_funnel) —
    * where in the journey the treatment moves the needle: the ordered
    * view→click→purchase funnel (the q_funnel law: each stage strictly
    * after the user's previous-stage completion) split by variant, with
    * a two-proportion z on each TRANSITION rate (stage-k completions
    * over stage-(k−1) entrants) — an experiment that wins overall but
    * loses a stage is mis-targeted, and the per-stage table is how that
    * is read.
    *
    * Scale shape: three narrow user-keyed join/agg shuffles (the funnel
    * machinery) + per-variant flag sums + 3-row statistic math.
    * Determinism: counts exact, rates/z fixed IEEE chains, degenerate
    * transitions (empty base, pooled rate ∈ {0,1}) emit NULL.
    */
  def abFunnel(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val users = e.select(col("user_id")).distinct()
      .select(col("user_id"), variantOf(col("user_id")).as("variant"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("us") > col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("us") > col("t2"))
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    val flags = users
      .join(s1.select(col("user_id"), lit(1L).as("f1")), Seq("user_id"), "left")
      .join(s2.select(col("user_id"), lit(1L).as("f2")), Seq("user_id"), "left")
      .join(s3.select(col("user_id"), lit(1L).as("f3")), Seq("user_id"), "left")
      .groupBy("variant")
      .agg(count(lit(1)).as("n0"),
        sum(coalesce(col("f1"), lit(0L))).as("n1"),
        sum(coalesce(col("f2"), lit(0L))).as("n2"),
        sum(coalesce(col("f3"), lit(0L))).as("n3"))
    val stages = flags.select(col("variant"),
      expr("stack(3, '1_view', n0, n1, '2_click', n1, n2, " +
        "'3_purchase', n2, n3) as (stage, base, conv)"))
    def side(v: String, c: String): Column =
      max(when(col("variant") === v, col(c)))
    val wide = stages.groupBy("stage")
      .agg(side("control", "base").as("base_c"),
        side("control", "conv").as("conv_c"),
        side("treatment", "base").as("base_t"),
        side("treatment", "conv").as("conv_t"))
    val bC = col("base_c").cast("double")
    val bT = col("base_t").cast("double")
    val rC = col("conv_c").cast("double") / bC
    val rT = col("conv_t").cast("double") / bT
    val pPool = (col("conv_c") + col("conv_t")).cast("double") / (bC + bT)
    val ok = col("base_c") > 0L && col("base_t") > 0L &&
      pPool > 0.0 && pPool < 1.0
    wide.select(col("stage"), col("base_c"), col("conv_c"),
      round(when(col("base_c") > 0L, rC), 6).as("rate_c"),
      col("base_t"), col("conv_t"),
      round(when(col("base_t") > 0L, rT), 6).as("rate_t"),
      round(when(ok, (rT - rC) /
        sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / bC + lit(1.0) / bT))),
        6).as("z"))
      .orderBy("stage")
  }

  /** POWER / MINIMUM-DETECTABLE-EFFECT census (q_ab_power) — the
    * question asked BEFORE reading any result: at the current sample
    * sizes and pooled conversion rate, what lift could this experiment
    * even see? MDE at α = 0.05 (two-sided) and 80% power is
    * (z_{α/2} + z_{β})·√(p(1−p)(1/n_c + 1/n_t)) with the z constants as
    * exact double literals (1.959964, 0.841621); emitted absolute and
    * relative. One per-user pass + a 1-row reduction.
    */
  def abPower(events: DataFrame,
              convThreshold: Double = 150.0): DataFrame = {
    val users = abUserStats(events, convThreshold)
    def side(v: String, c: String): Column =
      max(when(col("variant") === v, col(c)))
    val wide = users.groupBy("variant")
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      .agg(side("control", "n_users").as("n_c"),
        side("treatment", "n_users").as("n_t"),
        side("control", "n_conv").as("conv_c"),
        side("treatment", "n_conv").as("conv_t"))
    val nC = col("n_c").cast("double")
    val nT = col("n_t").cast("double")
    val pPool = (col("conv_c") + col("conv_t")).cast("double") / (nC + nT)
    val mde = (lit(1.959964) + lit(0.841621)) *
      sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / nC + lit(1.0) / nT))
    val ok = col("n_c") > 0L && col("n_t") > 0L &&
      pPool > 0.0 && pPool < 1.0
    wide.select(col("n_c"), col("n_t"),
      round(pPool, 6).as("p_pool"),
      round(when(ok, mde), 6).as("mde_abs"),
      round(when(ok, mde / pPool), 6).as("mde_rel"))
  }

  /** CUPED variance reduction (q_cuped; Deng et al. 2013) — the standard
    * sensitivity boost: each user's post-period revenue is adjusted by
    * its PRE-experiment revenue (a covariate independent of assignment),
    * y' = y − θ·(x − x̄) with θ = cov(x,y)/var(x) pooled across variants.
    * Emits per variant the raw and adjusted means/variances and the
    * variance-reduction fraction — the number that says how much smaller
    * an effect this experiment can now detect.
    *
    * Scale shape: one user-keyed hash agg builds (x, y); θ and x̄ are a
    * 1-row broadcast; the adjustment is per-row scalar math; the census
    * is 2 rows. Determinism: x, y in exact DECIMAL; cross-moments
    * quantized then DECIMAL-summed; θ and x̄ quantized BEFORE the per-row
    * multiply (they feed further arithmetic — the quant6 law); adjusted
    * values re-quantized before the variant sums.
    */
  def cuped(events: DataFrame, cutover: String = "2024-01-16"): DataFrame = {
    val perUser = events.groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "purchase" &&
            col("ts") < to_timestamp(lit(cutover)),
          col("value").cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("x"),
        sum(when(col("event_type") === "purchase" &&
            col("ts") >= to_timestamp(lit(cutover)),
          col("value").cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("y"))
      .select(col("user_id"), variantOf(col("user_id")).as("variant"),
        col("x").cast("double").as("x"), col("y").cast("double").as("y"))
    val moments = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(18,2)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(18,2)")).cast("double").as("sy"),
      sum(quant6(col("x") * col("y")).cast("decimal(38,6)")).cast("double")
        .as("sxy"),
      sum(quant6(col("x") * col("x")).cast("decimal(38,6)")).cast("double")
        .as("sxx"))
      .select(col("n"),
        quant6(col("sx") / col("n").cast("double")).as("xbar"),
        quant6(when(
            col("sxx") - col("sx") * col("sx") / col("n").cast("double") > 0,
          (col("sxy") - col("sx") * col("sy") / col("n").cast("double")) /
          (col("sxx") - col("sx") * col("sx") / col("n").cast("double")))
          .otherwise(lit(0.0))).as("theta"))
    perUser.crossJoin(broadcast(moments))
      .withColumn("y_adj",
        quant6(col("y") - col("theta") * (col("x") - col("xbar"))))
      .withColumn("y_sq", quant6(col("y") * col("y")))
      .withColumn("ya_sq", quant6(col("y_adj") * col("y_adj")))
      .groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        max(col("theta")).as("_th"),
        sum(col("y").cast("decimal(18,2)")).cast("double").as("_sy"),
        sum(col("y_adj").cast("decimal(18,6)")).cast("double").as("_sya"),
        sum(col("y_sq").cast("decimal(38,6)")).cast("double").as("_sq"),
        sum(col("ya_sq").cast("decimal(38,6)")).cast("double").as("_sqa"))
      .select(col("variant"), col("n_users"),
        round(col("_th"), 6).as("theta"),
        round(col("_sy") / col("n_users").cast("double"), 6).as("mean_rev"),
        round(col("_sya") / col("n_users").cast("double"), 6)
          .as("mean_rev_adj"),
        round(when(col("n_users") > 1L,
          (col("_sq") - col("_sy") * col("_sy") /
              col("n_users").cast("double")) /
            (col("n_users").cast("double") - lit(1.0))), 6).as("var_rev"),
        round(when(col("n_users") > 1L,
          (col("_sqa") - col("_sya") * col("_sya") /
              col("n_users").cast("double")) /
            (col("n_users").cast("double") - lit(1.0))), 6)
          .as("var_rev_adj"),
        round(when(col("n_users") > 1L &&
          (col("_sq") - col("_sy") * col("_sy") /
              col("n_users").cast("double")) /
            (col("n_users").cast("double") - lit(1.0)) > 0.0,
          lit(1.0) -
          ((col("_sqa") - col("_sya") * col("_sya") /
              col("n_users").cast("double")) /
            (col("n_users").cast("double") - lit(1.0))) /
          ((col("_sq") - col("_sy") * col("_sy") /
              col("n_users").cast("double")) /
            (col("n_users").cast("double") - lit(1.0)))), 6)
          .as("var_reduction"))
      .orderBy("variant")
  }

  /** BRADLEY-TERRY PREFERENCE RANKING (q_bradley_terry; Bradley & Terry
    * 1952, Hunter 2004 MM iteration) — the pairwise-preference model an
    * RLHF / preference-data pipeline fits before it trusts its labels:
    * every user who engaged with two event types is a "contest" (winner
    * = the type with the larger exact per-user value sum), the contests
    * aggregate into a win matrix, and the MM update
    * p_i ← W_i / Σ_j n_ij/(p_i+p_j), renormalized, converges to the
    * maximum-likelihood strengths. Three fixed iterations from the
    * uniform start — the deterministic-depth convention every iterative
    * operator in this suite uses (pagerankTerms, kmeansTrain), so the
    * whole fit is a finite arithmetic circuit both engines can run
    * bit-identically.
    *
    * Scale shape: the ONLY corpus-sized work is the (user, type)
    * aggregate — one map-side-combined shuffle of events; the per-user
    * contest join fans out k(k−1)/2 pairs per user with k = |types|
    * (bounded, ~5), and everything after the win-matrix census is
    * arithmetic on ≤ k² rows (broadcast-joined, never shuffled). At
    * 100 TB of preference logs the shape is unchanged: one agg, bounded
    * fan-out, census math. Determinism: per-user sums are exact
    * DECIMAL(18,2) (ties excluded exactly), each MM term and each
    * normalized strength passes quant6 and accumulates as decimal, and
    * a 1e-6 floor keeps a zero-win item's strength from collapsing the
    * next iteration's denominators.
    */
  def bradleyTerry(events: DataFrame, iters: Int = 3): DataFrame = {
    val ut = events.groupBy("user_id", "event_type")
      .agg(sum(col("value").cast("decimal(18,2)")).as("sv"))
    val contests = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type") &&
        col("a.sv") =!= col("b.sv"))
      .select(col("a.event_type").as("i"), col("b.event_type").as("j"),
        (col("a.sv") > col("b.sv")).cast("long").as("awin"))
    val pc = contests.groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("awin")).as("wi"))
    // localCheckpoint, not persist: the win matrix is census-sized
    // (≤ k² rows) and feeds every iteration — truncating its lineage to
    // a LogicalRDD (the pagerankTerms device) keeps each round's plan
    // census-deep. The persist form keeps the full analyzed tree alive
    // and re-pays cache-lookup + codegen + broadcast machinery on an
    // ever-growing plan: measured 17.6 s vs 1.9 s at sf0.001 for the
    // identical arithmetic.
    val edges = pc.select(col("i"), col("j"), col("n"), col("wi").as("w"))
      .unionByName(pc.select(col("j").as("i"), col("i").as("j"), col("n"),
        (col("n") - col("wi")).as("w")))
      .localCheckpoint()
    val items = edges.groupBy("i")
      .agg(sum(col("n")).as("contests"), sum(col("w")).as("wins"))
    val k = items.agg(count(lit(1)).as("k"))
    var p = items.crossJoin(broadcast(k))
      .select(col("i"), quant6(lit(1.0) / col("k").cast("double")).as("p"))
    for (_ <- 1 to iters) {
      val den = edges
        .join(p.select(col("i").as("pi_i"), col("p").as("p_i")),
          col("i") === col("pi_i"))
        .join(p.select(col("i").as("pj_i"), col("p").as("p_j")),
          col("j") === col("pj_i"))
        .withColumn("term",
          quant6(col("n").cast("double") / (col("p_i") + col("p_j"))))
        .groupBy("i")
        .agg(sum(col("term").cast("decimal(18,6)")).cast("double").as("den"))
      val raw = items.join(den, "i")
        .select(col("i"),
          greatest(quant6(col("wins").cast("double") / col("den")),
            lit(0.000001)).as("praw"))
      val s = raw.agg(
        sum(col("praw").cast("decimal(18,6)")).cast("double").as("s"))
      // truncate each round's strengths too: p is referenced three times
      // per iteration (pi, pj, normalizer), so an untruncated chain
      // re-expands 3^iters copies of the corpus subtree into the final
      // plan — measured 41 s at sf0.001 before the checkpoint
      p = raw.crossJoin(broadcast(s))
        .select(col("i"), quant6(col("praw") / col("s")).as("p"))
        .localCheckpoint()
    }
    items.join(p, "i")
      .select(col("i").as("event_type"), col("contests"), col("wins"),
        round(col("p"), 6).as("bt_score"))
      // skew-free global rank (the pagerankTerms device) — the frame is
      // census-sized today, but the sweep's no-unpartitioned-window law
      // holds for every query, so the rank uses the scalable path too
      .transform(TextAnalysis.withGlobalRank("rank",
        col("bt_score").desc, col("event_type")))
      .select("rank", "event_type", "contests", "wins", "bt_score")
      .orderBy("rank")
  }
}
