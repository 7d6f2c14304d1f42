package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered funnels and cohort retention —
  * the two workhorse product-analytics operators over event logs. The
  * reference has no event model (SURVEY.md "What it is NOT"); these
  * extend the events surface (q6-q9, q11-q12) the same way the dedup
  * ladder extends the documents surface. */
object EventAnalytics {

  /** Strictly-ordered funnel: per user, step i completes at the
    * earliest `steps(i)` event strictly AFTER that user's step i-1
    * completion time. Returns one row per user who completed step 0
    * with a nullable `step<i>_ts` per later step.
    *
    * Scale shape: one partial-aggregating `groupBy(user).min(ts)` per
    * step, chained by equi-joins on the user key — k small shuffles on
    * the same key (co-partitioned after the first exchange), never a
    * per-user event collection or an unbounded-history window. Step
    * frames shrink monotonically, so later joins are broadcast-eligible
    * under AQE. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val completions = steps.zipWithIndex.foldLeft(Seq.empty[DataFrame]) {
      case (acc, (step, i)) =>
        val evs = events.filter(col(typeCol) === step).select(col(userCol), col(tsCol))
        val compl =
          if (i == 0) evs.groupBy(col(userCol)).agg(min(col(tsCol)).as("step0_ts"))
          else evs.join(acc.last.select(col(userCol), col(s"step${i - 1}_ts")), userCol)
            .filter(col(tsCol) > col(s"step${i - 1}_ts"))
            .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"step${i}_ts"))
        acc :+ compl
    }
    completions.zipWithIndex.tail.foldLeft(completions.head) {
      case (df, (c, i)) =>
        df.join(c.select(col(userCol), col(s"step${i}_ts")), Seq(userCol), "left")
    }
  }

  /** Funnel conversion counts: (step_idx, step, n_users) per step —
    * a single job over [[funnel]]'s output (`count(col)` skips nulls;
    * the unpivot is explode-of-struct-array built from typed `lit()`
    * columns — NOT a `stack(...)` string, whose `''` escaping Spark's
    * lexer mis-parses as adjacent-literal concatenation for step names
    * containing a quote). */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    val f = funnel(events, userCol, typeCol, tsCol, steps)
    val aggs = steps.indices.map(i => count(col(s"step${i}_ts")).as(s"n$i"))
    f.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(lit(i).as("step_idx"), lit(s).as("step"), col(s"n$i").as("n_users"))
      }: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_users"))
  }

  /** [[funnel]] semantics in ONE aggregation — the LONG-funnel scale
    * shape. The k-join [[funnel]] plan re-executes each step's subtree
    * in the final assembly join, so executed work grows O(k²) in step
    * count (measured 6× at 8 steps vs 3 — BASELINE.md round-6 probe);
    * this path filters to the step types, shuffles each event ONCE on
    * the key, and runs the per-key strict-order DP inside
    * [[graft.functions.FunnelTimes]] — one exchange regardless of k.
    * The trade is a per-key buffer of that key's funnel-type events
    * (capped, fail-fast) — prefer [[funnel]] for short funnels over
    * keys with unbounded event counts, this for long funnels.
    * Output schema and rows are asserted equal to [[funnel]] in
    * OpsSpec. */
  def funnelAgg(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], maxEventsPerKey: Int = 1 << 20): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "funnelAgg maps each event type to ONE step index; use funnel() for repeated steps")
    val stepIdx = steps.zipWithIndex.tail.foldLeft(
      when(col(typeCol) === steps.head, lit(0))) {
        case (acc, (s, i)) => acc.when(col(typeCol) === s, lit(i))
      }
    val comp = events
      .filter(col(typeCol).isInCollection(steps))
      .select(col(userCol), stepIdx.as("__step"), col(tsCol).as("__ts"))
      .groupBy(col(userCol))
      .agg(graft.functions.FunnelFunctions.funnelTimes(
        col("__step"), col("__ts"), steps.length, maxEventsPerKey).as("__c"))
      .filter(col("__c")(0).isNotNull)
    steps.indices.foldLeft(comp) { case (df, i) =>
      df.withColumn(s"step${i}_ts", col("__c")(i))
    }.drop("__c")
  }

  /** [[funnelCounts]] over the single-aggregation [[funnelAgg]] path. */
  def funnelCountsAgg(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    val f = funnelAgg(events, userCol, typeCol, tsCol, steps)
    val aggs = steps.indices.map(i => count(col(s"step${i}_ts")).as(s"n$i"))
    f.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(lit(i).as("step_idx"), lit(s).as("step"), col(s"n$i").as("n_users"))
      }: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_users"))
  }

  /** Per-transition funnel timing: for each step i ≥ 1, how many users
    * converted and the exact integer stats of their step(i-1)→step(i)
    * delay (sum/min/max in the timestamp's own units). Deliberately NO
    * float aggregates — sums of integer deltas hash identically in any
    * engine, where an avg's last-ulp could not. One aggregation over
    * [[funnelAgg]]'s single-shuffle output. */
  def funnelTiming(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.length >= 2, "funnelTiming needs at least two steps")
    val f = funnelAgg(events, userCol, typeCol, tsCol, steps)
    val aggs = (1 until steps.length).flatMap { i =>
      val delta = col(s"step${i}_ts") - col(s"step${i - 1}_ts")
      Seq(count(col(s"step${i}_ts")).as(s"n$i"),
        sum(delta).as(s"s$i"), min(delta).as(s"mn$i"), max(delta).as(s"mx$i"))
    }
    f.agg(aggs.head, aggs.tail: _*)
      .select(explode(array((1 until steps.length).map { i =>
        struct(lit(i).as("step_idx"), lit(steps(i)).as("step"),
          col(s"n$i").as("n_converted"), col(s"s$i").as("sum_delta"),
          col(s"mn$i").as("min_delta"), col(s"mx$i").as("max_delta"))
      }: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_converted"),
        col("r.sum_delta"), col("r.min_delta"), col("r.max_delta"))
  }

  /** Cohort retention: users cohorted by first-activity day (exact
    * integer floor-division of the timestamp — no datetime-unit or
    * timezone ambiguity); for each (cohort_day, day_offset) the number
    * of distinct cohort users active on that offset day. Two
    * partial-aggregating shuffles (first-day per user, then the
    * distinct-activity rollup) — no window, no per-user state. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      dayUnits: Long = 86400L * 1000000000L): DataFrame = {
    require(dayUnits > 0, "dayUnits must be positive")
    def floorDay(c: Column): Column = c - pmod(c, lit(dayUnits))
    val withDay = events
      .select(col(userCol), floorDay(col(tsCol)).cast("long").as("__d0"))
      .withColumn("__day", expr(s"__d0 div ${dayUnits}L"))
      .drop("__d0")
    val firstDay = withDay.groupBy(col(userCol)).agg(min(col("__day")).as("cohort_day"))
    withDay.join(firstDay, userCol)
      .select(col(userCol), col("cohort_day"),
        (col("__day") - col("cohort_day")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active_users"))
  }

  /** First-touch conversion attribution: every user's conversions
    * (`convType` events) are credited to the event type of their FIRST
    * event ever — the entry channel. Returns one row per first-touch
    * type: user count, converted-user count, total conversions, and the
    * exact user-level conversion rate (integer division rounded 6 dp).
    *
    * Determinism: "first" orders by (timestamp, event id) — the id
    * breaks same-instant ties, and the timestamp compares at the
    * precision of `tsCol` as passed (callers on nanosecond sources
    * should pre-truncate to the replay engine's precision, see the
    * `first_touch` query). The per-user reduction is ONE
    * `min(struct(ts, id, type))` partial aggregate — no window sort, no
    * per-user event collection — followed by a type-cardinality rollup. */
  def firstTouchAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, eventIdCol: String,
      convType: String): DataFrame = {
    val perUser = events
      .groupBy(col(userCol))
      .agg(
        min(struct(col(tsCol).as("ts"), col(eventIdCol).as("eid"),
          col(typeCol).as("et"))).as("__first"),
        sum(when(col(typeCol) === lit(convType), 1L).otherwise(0L)).as("__nconv"))
    perUser
      .groupBy(col("__first.et").as("first_touch"))
      .agg(count(lit(1)).as("n_users"),
        sum((col("__nconv") > 0).cast("long")).as("n_converted_users"),
        sum(col("__nconv")).as("n_conversions"))
      .withColumn("conversion_rate",
        round(col("n_converted_users").cast("double") / col("n_users").cast("double"), 6))
  }

  /** Per-user time-decayed monetary score — the recency-weighted
    * engagement/LTV aggregate of a scoring pipeline: each event
    * contributes `cents · 2^-k`, k = halvings of age since the
    * corpus's latest event (integer floor division by `halfLifeUnits`,
    * capped at `maxHalvings`).
    *
    * EXACT by construction, not rounded: cents are integers, 2^-k is a
    * dyadic rational, so every term is an exact multiple of
    * 2^-maxHalvings and the sum is order-independent — distributed
    * summation order, engine, and partitioning can never move a ulp
    * (the same trick as integer-cents sums, extended to decay weights).
    * Holds while per-user cent sums stay below 2^(53-maxHalvings)
    * (≈ 8.8e12 cents at the default 10) — document scale, not row
    * scale, bounds it.
    *
    * Scale shape: one global max(ts) (single row, broadcast back) +
    * one partial-aggregating groupBy(user); map-only otherwise. */
  def timeDecayedValue(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, halfLifeUnits: Long, maxHalvings: Int = 10): DataFrame = {
    require(halfLifeUnits > 0 && maxHalvings >= 0 && maxHalvings <= 52,
      "halfLifeUnits must be positive and maxHalvings in [0, 52]")
    val tmax = events.agg(max(col(tsCol)).as("__tmax"))
    events.crossJoin(broadcast(tmax))
      .withColumn("__cents", round(col(valueCol) * 100).cast("long"))
      .withColumn("__k",
        least(expr(s"(__tmax - $tsCol) div ${halfLifeUnits}L"), lit(maxHalvings.toLong)))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__cents")).as("total_cents"),
        sum(col("__cents").cast("double") / pow(lit(2.0), col("__k").cast("double")))
          .as("decayed_cents"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next = b | current = a) with exact transition counts
    * — the model behind next-action prediction and journey simulation
    * ([[eventPaths]] reports raw frequent paths; this normalizes one
    * step). Probabilities are exact integer ratios rounded 6 dp.
    *
    * Scale shape: the same single user-partitioned window as
    * [[eventPaths]], one lead() column, then a partial-aggregating
    * count over the ≤ |types|² key space; per-source totals join back
    * from a broadcast-sized frame. */
  def markovTransitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, eventIdCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(eventIdCol).asc)
    val trans = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).as("__tot"))
    trans.join(broadcast(totals), "from_type")
      .withColumn("prob", round(
        col("n_transitions").cast("double") / col("__tot").cast("double"), 6))
      .select(col("from_type"), col("to_type"), col("n_transitions"), col("prob"))
  }

  /** User-journey path mining: the top-`k` most frequent length-`n`
    * consecutive event-type sequences ("view>click>purchase") across
    * all users — the path-analysis report behind funnel DISCOVERY
    * (funnels check a hypothesized order; this surfaces the orders
    * that actually happen).
    *
    * Determinism: per-user order is (tsCol, eventIdCol) — pass
    * timestamps at the replay engine's precision. Ties in path counts
    * break lexicographically.
    *
    * Scale shape: ONE shuffle partitioning by user + per-user sort
    * (users are numerous, so partitions are balanced — same shape as
    * sessionization), n-1 lead() columns over that single window, then
    * a partial-aggregating count whose key space is |event types|^n —
    * tiny, map-side combined. Final ranking is TakeOrdered top-k. */
  def eventPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, eventIdCol: String, n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2 && k >= 1, "need n >= 2 and k >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(eventIdCol).asc)
    val steps = col(typeCol) +:
      (1 until n).map(i => lead(col(typeCol), i).over(w))
    // concat_ws skips nulls, so guard on the LAST lead: inner leads of
    // the same window cannot be null when the last one isn't
    events
      .withColumn("__path",
        when(steps.last.isNotNull, concat_ws(">", steps: _*)))
      .filter(col("__path").isNotNull)
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path").asc)
      .limit(k)
  }

  /** Per-session rollup: gap-based sessionization (the q8 convention —
    * a new session opens after `gapUnits` of inactivity) followed by
    * one partial-agg rollup per (user, session): event count, exact
    * integer duration, and the session's start stamp. One user-keyed
    * window pass + one aggregation — the sessionize scale shape with
    * no extra exchange (the groupBy reuses the window's
    * partitioning). */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      eventIdCol: String, gapUnits: Long): DataFrame = {
    require(gapUnits > 0, "gapUnits must be positive")
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(eventIdCol).asc)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapUnits, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).cast("long").as("duration"),
        min(col(tsCol)).cast("long").as("session_start"))
  }

  /** Daily volume anomalies per event type: days whose event count
    * sits ≥ `zThreshold` population standard deviations from that
    * type's own daily mean. The variance comes from EXACT integer
    * sums (n, Σx, Σx²) — both engines then evaluate the identical
    * double expression `sqrt((n·Σx² − Σx²)/n²)`, so the z-score (6 dp)
    * and the threshold cut replay bit-for-bit, where a builtin
    * stddev's accumulation order could drift.
    *
    * Scale shape: one (type, day) partial-agg count, one per-type
    * rollup of the three integer moments (|types| rows, broadcast
    * back), map-only scoring. */
  def dailyAnomalies(events: DataFrame, typeCol: String, dayCol: String,
      zThreshold: Double): DataFrame = {
    val daily = events.groupBy(col(typeCol), col(dayCol))
      .agg(count(lit(1)).as("n"))
    val moments = daily.groupBy(col(typeCol))
      .agg(count(lit(1)).as("__d"), sum(col("n")).as("__sx"),
        sum(col("n") * col("n")).as("__sxx"))
    val nD = col("__d").cast("double")
    val std = sqrt((col("__d") * col("__sxx") - col("__sx") * col("__sx")).cast("double") /
      (nD * nD))
    daily.join(broadcast(moments), Seq(typeCol))
      .withColumn("z", round(
        (col("n").cast("double") - col("__sx").cast("double") / nD) / std, 6))
      .filter(abs(col("z")) >= zThreshold)
      .select(col(typeCol), col(dayCol), col("n"), col("z"))
  }

  /** EWMA smoothing per group over a daily value series — the
    * forecasting/denoising member of the time-series family
    * ([[dailyAnomalies]] flags, this one smooths): EWMA₁ = v₁,
    * EWMAₜ = α·vₜ + (1−α)·EWMAₜ₋₁, every step 6-dp rounded so the
    * recursion is a fixed double sequence any engine replays exactly
    * (per-step rounding kills ulp drift before it compounds — the
    * kmeans micro-unit discipline applied to a recurrence). Residual
    * = v − ewma is the anomaly signal with the trend removed.
    *
    * Scale shape: the heavy reduction is the (group, day) rollup —
    * partial-agg, exact integer cents. The recursion itself runs on
    * ONE collected array per group (the TIME axis — bounded by the
    * calendar, not the event count; a 10-year daily series is 3,652
    * elements) inside a single codegen'd higher-order `aggregate`, so
    * no window sort and no driver loop. */
  def ewmaSmooth(events: DataFrame, typeCol: String, tsCol: String,
      valueCol: String, alpha: Double): DataFrame =
    ewmaOverDaily(dailyCents(events, typeCol, tsCol, valueCol)
      .withColumn("v", col("cents").cast("double") / 100.0)
      .drop("cents"), typeCol, alpha)

  /** Exact integer-cents (group, day) rollup — the mergeable daily
    * state the streaming twin persists (day sums ADD, so late or
    * out-of-order events land safely in their day). */
  private[graft] def dailyCents(events: DataFrame, typeCol: String,
      tsCol: String, valueCol: String): DataFrame =
    events
      .withColumn("day", expr(s"$tsCol div ${86400L * 1000000000L}"))
      .groupBy(col(typeCol), col("day"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("cents"))

  /** The EWMA recurrence over a prepared (group, day, v) frame —
    * shared by [[ewmaSmooth]] and the streaming state reader, so the
    * streamed series is the batch series by construction. */
  private[graft] def ewmaOverDaily(daily: DataFrame, typeCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val a = alpha
    val b = 1.0 - alpha
    daily.groupBy(col(typeCol))
      .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("ser"))
      .withColumn("ewmas", expr(
        s"""aggregate(ser, CAST(array() AS ARRAY<DOUBLE>),
           | (acc, x) -> concat(acc, array(round(
           |    CASE WHEN size(acc) = 0 THEN x.v
           |         ELSE $a * x.v + $b * element_at(acc, -1) END, 6))))""".stripMargin))
      .select(col(typeCol), posexplode(arrays_zip(col("ser"), col("ewmas"))))
      .select(col(typeCol), col("col.ser.day").as("day"),
        col("col.ser.v").as("v"), col("col.ewmas").as("ewma"))
      .withColumn("resid", round(col("v") - col("ewma"), 6))
  }

  /** Persisted daily-cents state for the streaming EWMA twin: plain
    * sorted "grp\tday\tcents" lines (exact longs — mergeable by
    * addition), atomic tmp+move write, read into the same frame
    * [[ewmaOverDaily]] consumes. */
  object DailyStateIO {
    def read(path: java.nio.file.Path): Map[(String, Long), Long] = {
      if (!java.nio.file.Files.exists(path)) return Map.empty
      new String(java.nio.file.Files.readAllBytes(path),
          java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).map { l =>
          val Array(g, d, c) = l.split("\t", 3)
          (g, d.toLong) -> c.toLong
        }.toMap
    }

    def write(path: java.nio.file.Path, m: Map[(String, Long), Long]): Unit = {
      val body = m.toSeq.sortBy { case ((g, d), _) => (g, d) }
        .map { case ((g, d), c) => s"$g\t$d\t$c" }.mkString("\n")
      val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, path,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** EWMA series from a maintained daily state — identical to
    * [[ewmaSmooth]] over the full event history by construction
    * (the state IS the exact daily rollup). */
  def ewmaFromState(spark: org.apache.spark.sql.SparkSession,
      statePath: java.nio.file.Path, typeCol: String,
      alpha: Double): DataFrame = {
    import spark.implicits._
    val daily = DailyStateIO.read(statePath).toSeq
      .map { case ((g, d), c) => (g, d, c / 100.0) }
      .toDF(typeCol, "day", "v")
    ewmaOverDaily(daily, typeCol, alpha)
  }

  /** Item co-occurrence mining (the market-basket / "related items"
    * report): items sharing a user count as co-occurring once per
    * user; output the top-`k` pairs by co-occurrence with their lift
    * `P(a,b) / (P(a)·P(b)) = n_ab·n_users / (n_a·n_b)` — exact
    * integer ratio, 6 dp-rounded identically on any engine.
    *
    * Scale shape: distinct (user, item) pairs (one partial-agg
    * shuffle), then a per-user self-join whose fan-out is
    * C(items-per-user, 2) — bounded by the CATALOG, not the event
    * count, since per-user items are distinct. For unbounded catalogs
    * with heavy users, cap the per-user item set first (the
    * df-cap discipline of the jaccard pipeline — same quadratic
    * posting-list argument). Pair counts partial-aggregate into at
    * most C(catalog, 2) keys; item/user totals broadcast; final
    * ranking is TakeOrdered. */
  def itemCooccurrence(events: DataFrame, userCol: String, itemCol: String,
      k: Int, minSupport: Long = 2): DataFrame = {
    require(k >= 1 && minSupport >= 1, "need k >= 1 and minSupport >= 1")
    val ui = events.select(col(userCol).as("__u"), col(itemCol).as("__i")).distinct()
    val itemCounts = ui.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val nUsers = ui.select(col("__u")).distinct().agg(count(lit(1)).as("__nu"))
    // per-user sorted basket → in-row pair explode: the same (a < b)
    // pair multiset the distinct×distinct self-join produced, minus
    // the join — one groupBy(user) exchange replaces the keyed join's
    // exchange + probe, and pair generation is map-side. Basket sizes
    // are catalog-bounded (items per user), never corpus-bounded.
    ui.groupBy(col("__u"))
      .agg(sort_array(collect_list(col("__i"))).as("__is"))
      .select(explode(expr(
        """flatten(transform(__is, (x, i) ->
          |  transform(slice(__is, i + 2, size(__is) - i - 1),
          |    y -> struct(x AS item_a, y AS item_b))))""".stripMargin)).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
      .join(broadcast(itemCounts.select(col("__i").as("item_a"), col("__ni").as("n_a"))), "item_a")
      .join(broadcast(itemCounts.select(col("__i").as("item_b"), col("__ni").as("n_b"))), "item_b")
      .crossJoin(broadcast(nUsers))
      .withColumn("lift", round(
        (col("n_ab") * col("__nu")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("lift"))
      .orderBy(col("n_ab").desc, col("item_a").asc, col("item_b").asc)
      .limit(k)
  }

  /** Linear multi-touch attribution: each conversion (an event of
    * `convType`) splits ONE unit of credit equally across the user's
    * distinct touch event types seen at-or-before the conversion
    * time; per-channel totals in exact integer MICRO-credits —
    * `1e6 div n` per touch with the remainder (`1e6 mod n`) going to
    * the EARLIEST touch, so the split is conserved and replays
    * exactly in SQL (no 1/3-style repeating-decimal drift). The
    * first-touch op answers "which channel opened"; this answers
    * "which channels contributed", the standard next step.
    *
    * Scale shape: conversions join the per-(user, channel) first-touch
    * rollup on the user key (co-partitioned after one exchange); per
    * conversion the touch set is |channels|-bounded; one final
    * partial-agg sum per channel. No windows over raw events. */
  def linearAttribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, convType: String): DataFrame = {
    val touches = events.filter(col(typeCol) =!= convType)
      .groupBy(col(userCol), col(typeCol))
      .agg(min(col(tsCol)).as("__first_touch"))
    val convs = events.filter(col(typeCol) === convType)
      .select(col(userCol), col(tsCol).as("__conv_ts"))
    val joined = convs.join(touches, Seq(userCol))
      .filter(col("__first_touch") <= col("__conv_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol), col("__conv_ts"))
    val wRank = w.orderBy(col("__first_touch").asc, col(typeCol).asc)
    joined
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("__credit",
        (lit(1000000L) / col("__n")).cast("long") +
          when(col("__rk") === 1, pmod(lit(1000000L), col("__n"))).otherwise(0L))
      .groupBy(col(typeCol).as("channel"))
      .agg(count(lit(1)).as("n_touchpoints"),
        sum(col("__credit")).as("credit_micro"))
      .withColumn("credit", col("credit_micro").cast("double") / 1e6)
  }

  /** Numeric distribution drift between two populations of the same
    * metric (this week vs last week, variant A vs B, before vs after
    * a pipeline change): per group, the exact interpolated decile
    * vector of each side and the largest absolute per-decile gap — a
    * discretized two-sample distribution distance that, unlike a mean
    * comparison, catches shape changes (a variance blowup or a new
    * mode moves deciles long before it moves the mean).
    *
    * Deciles are 6 dp-rounded on both engines (the daily_percentiles
    * convention), gaps computed on the rounded values — exact replay.
    *
    * Scale shape: one percentile aggregate per (group, side) — the
    * groups are few, rows stream through partial aggregation; the
    * decile join is a broadcast of group-count rows. */
  def valueDrift(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    def deciles(df: DataFrame, tag: String): DataFrame = {
      val aggs = (1 to 9).map(i =>
        round(expr(s"percentile($valueCol, 0.$i)"), 6).as(s"p${i}0_$tag"))
      df.groupBy(col(groupCol))
        .agg(aggs.head, (aggs.tail :+ count(lit(1)).as(s"n_$tag")): _*)
    }
    val gap = (1 to 9).map(i =>
      abs(col(s"p${i}0_a") - col(s"p${i}0_b"))).reduce(greatest(_, _))
    deciles(a, "a").join(broadcast(deciles(b, "b")), Seq(groupCol))
      .withColumn("max_decile_gap", round(gap, 6))
      .select((col(groupCol) +: col("n_a") +: col("n_b") +:
        (1 to 9).flatMap(i => Seq(col(s"p${i}0_a"), col(s"p${i}0_b"))) :+
        col("max_decile_gap")): _*)
  }

  /** RFM segmentation (recency / frequency / monetary quintiles) —
    * the classic customer-value rollup over an order log.
    *
    * Determinism at the oracle level: all three dimensions are exact
    * INTEGERS (epoch-day recency, order count, monetary in cents via
    * per-order round-to-cent then long sum — order-independent where a
    * double sum is not), quintile boundaries come from the exact
    * linear-interpolation `percentile` (same R-7 scheme as DuckDB's
    * `quantile_cont`), and scores count STRICT `boundary < value`
    * exceedances — a value sitting exactly on a boundary lands in the
    * lower bucket on both engines.
    *
    * Scale shape: one partial-aggregating groupBy(customer) over the
    * order log (the only corpus-sized shuffle), then a 4-value
    * boundary row per dimension from the customer-sized rollup,
    * broadcast back as a one-row cross join — no global sort, no
    * window rank (ntile would single-reduce the whole customer set).
    * `asOfDay` pins "today" so recency is reproducible. */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
      priceCol: String, asOfDay: Column): DataFrame = {
    val rolled = orders.groupBy(col(custCol))
      .agg(datediff(asOfDay, max(col(dateCol).cast("date"))).cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(round(col(priceCol) * 100).cast("long")).as("monetary_cents"))
    // recency: FEWER days = better, so score on the negated value to
    // keep one strict-exceedance rule for all three dimensions
    val scored = rolled.withColumn("neg_recency", -col("recency_days"))
    def boundaries(c: String, tag: String) = (1 to 4).map(i =>
      round(expr(s"percentile($c, 0.${i * 2})"), 6).as(s"b${i}_$tag"))
    val allBounds = boundaries("neg_recency", "r") ++
      boundaries("frequency", "f") ++ boundaries("monetary_cents", "m")
    val bounds = scored.agg(allBounds.head, allBounds.tail: _*)
    def score(v: Column, tag: String): Column =
      (1 to 4).map(i => when(col(s"b${i}_$tag") < v, 1).otherwise(0))
        .reduce(_ + _) + 1
    scored.crossJoin(broadcast(bounds))
      .withColumn("r_score", score(col("neg_recency"), "r"))
      .withColumn("f_score", score(col("frequency"), "f"))
      .withColumn("m_score", score(col("monetary_cents"), "m"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") >= 4, "recent")
          .when(col("f_score") >= 4, "loyal_at_risk")
          .when(col("m_score") >= 4, "big_spender_lapsed")
          .otherwise("standard"))
      .select(col(custCol), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"),
        col("m_score"), col("segment"))
  }
}
