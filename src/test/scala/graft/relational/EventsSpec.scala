package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("json extract: every event parses, bounds ordered, sums consistent") {
    val rows = Events.jsonExtract(spark, TestSpark.sf)
      .select("n", "n_k", "sum_k", "min_k", "max_k")
      .as[(Long, Long, Long, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, nk, sum, mn, mx) =>
      assert(n == nk) // the generated props are all well-formed JSON
      assert(mn <= mx)
      assert(sum >= n * mn && sum <= n * mx)
    }
    val total = Events.jsonExtract(spark, TestSpark.sf)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total == graft.core.Tables.events(spark, TestSpark.sf).count())
  }

  test("as-of join matches a brute-force per-user scan") {
    val raw = Events.eventsS(spark, TestSpark.sf)
      .select("event_id", "user_id", "ts_s", "event_type")
      .as[(Long, Long, Long, String)].collect()
    val purchasesByUser = raw.filter(_._4 == "purchase")
      .groupBy(_._2).view.mapValues(_.sortBy(e => (e._3, e._1))).toMap
    val expected = raw.filter(_._4 == "click").map { case (id, u, ts, _) =>
      val p = purchasesByUser.getOrElse(u, Array.empty[(Long, Long, Long, String)])
        .filter(_._3 <= ts).lastOption
      (id, p.map(_._1), p.map(_._3))
    }.toSet
    val got = Events.asofJoin(spark, TestSpark.sf)
      .select("click_id", "purchase_id", "purchase_ts")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (c, pid, pts) => (c, pid, pts) }.toSet
    assert(got == expected)
    assert(got.nonEmpty && got.exists(_._2.isDefined))
  }

  test("rollup: subtotal levels are consistent with the detail rows") {
    val rows = Relational.q1Rollup(spark, TestSpark.sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order", "g_rf", "g_ls")
      .as[(String, String, Double, Long, Byte, Byte)].collect()
    val detail = rows.filter(r => r._5 == 0 && r._6 == 0)
    val byFlag = rows.filter(r => r._5 == 0 && r._6 == 1)
    val grand = rows.filter(r => r._5 == 1 && r._6 == 1)
    assert(grand.length == 1)
    assert(grand.head._4 == detail.map(_._4).sum)
    byFlag.foreach { sub =>
      val kids = detail.filter(_._1 == sub._1)
      assert(sub._4 == kids.map(_._4).sum)
      assert(sub._3 == kids.map(_._3).sum) // integral doubles: exact sums
      assert(sub._2 == "ALL")
    }
  }
  test("funnel: stage counts monotone non-increasing, rates consistent") {
    val r = Events.funnel(spark, TestSpark.sf)
      .select("n_users", "n_view", "n_click", "n_purchase",
        "view_to_click", "click_to_purchase").head()
    val (nu, nv, nc, np) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nu >= nv && nv >= nc && nc >= np, "an ordered funnel only narrows")
    assert(np > 0, "test data has complete view->click->purchase journeys")
    assert(r.getDouble(4) == nc.toDouble / nv)
    assert(r.getDouble(5) == np.toDouble / nc)
  }

  test("retention: offset 0 is complete, rates bounded, cohorts partition users") {
    val rows = Events.retention(spark, TestSpark.sf)
      .select("cohort_day", "day_offset", "n_active", "cohort_size", "retention")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, n, size, rate) =>
      assert(off >= 0); assert(n <= size); assert(rate > 0.0 && rate <= 1.0)
    }
    // day 0: every cohort member is active on their first-seen day
    rows.filter(_._2 == 0).foreach { case (_, _, n, size, rate) =>
      assert(n == size && rate == 1.0)
    }
    val users = graft.core.Tables.events(spark, TestSpark.sf)
      .select("user_id").distinct().count()
    assert(rows.filter(_._2 == 0).map(_._4).sum == users)
  }
  test("anomaly: outliers are a small tail and actually beyond 3 sigma") {
    val rows = Events.anomaly(spark, TestSpark.sf)
      .select("event_type", "n", "n_outliers")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, out) =>
      // Chebyshev: beyond 3 sigma holds at most 1/9 of any distribution
      assert(out <= n / 9 + 1)
    }
    // cross-check one type against a driver-side computation
    val vals = graft.core.Tables.events(spark, TestSpark.sf)
      .filter($"event_type" === "click").select("value").as[Double].collect()
    val mean = vals.sum / vals.length
    val std = math.sqrt(vals.map(v => v * v).sum / vals.length - mean * mean)
    val brute = vals.count(v => math.abs(v - mean) > 3 * std)
    val got = rows.find(_._1 == "click").get._3
    // quantized moments vs naive double moments can differ only at the
    // exact 3-sigma boundary; identical here
    assert(got == brute)
  }

  test("value quantiles: ordered, and nearest-rank matches a driver-side sort") {
    val rows = Events.valueQuantiles(spark, TestSpark.sf)
      .select("event_type", "n_events", "p50", "p90", "p99", "v_max")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, n, p50, p90, p99, vmax) =>
      assert(n > 0 && p50 <= p90 && p90 <= p99 && p99 <= vmax)
    }
    // brute-force one type: nearest-rank over the 0.01-grid-quantized sort
    val vis = graft.core.Tables.events(spark, TestSpark.sf)
      .filter($"event_type" === "error").select("value").as[Double].collect()
      .map(v => math.floor(v * 100.0 + 0.5).toLong).sorted
    def nr(p: Int): Double = vis((vis.length * p + 99) / 100 - 1) / 100.0
    val got = rows.find(_._1 == "error").get
    assert(got._2 == vis.length && got._3 == nr(50) &&
      got._4 == nr(90) && got._5 == nr(99))
  }

  test("interarrival: gap accounting exact (n_events - n_users), ordered " +
    "percentiles, one type recounted driver-side") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val r = Events.interarrival(spark, TestSpark.sf).cache()
    assert(r.filter(col("p50_s") > col("p90_s") ||
      col("p90_s") > col("max_s") || col("mean_s") <= 0).isEmpty)
    // every user contributes (its events - 1) gaps
    val ev = Events.eventsS(spark, TestSpark.sf)
      .select("user_id", "event_id", "event_type", "ts_s").cache()
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(r.agg(sum("n_gaps")).head.getLong(0) == nEvents - nUsers)
    // driver recount for one type: sort each user's events, diff, pool
    val perUser = ev.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
      .groupBy(_._1)
    val gaps = perUser.values.flatMap { es =>
      val s = es.sortBy(e => (e._4, e._2))
      s.zip(s.tail).map { case (a, b) => (b._3, b._4 - a._4) }
    }.toSeq
    val click = gaps.filter(_._1 == "click").map(_._2).sorted
    def nr2(p: Int): Long = click((click.length * p + 99) / 100 - 1)
    val got = r.filter(col("event_type") === "click")
      .select("n_gaps", "mean_s", "p50_s", "p90_s").head
    assert(got.getLong(0) == click.length)
    assert(got.getDouble(1) == click.sum.toDouble / click.length)
    assert(got.getLong(2) == nr2(50) && got.getLong(3) == nr2(90))
    ev.unpersist(); r.unpersist()
  }

  test("scd2: intervals tile each user's timeline, one current version, " +
    "no no-change versions, as-of lookups reproduce the event log") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark = TestSpark.spark
    val h = Events.scd2(spark, TestSpark.sf).cache()
    // exactly one open (current) version per user
    val users = h.select("user_id").distinct().count()
    assert(h.filter(col("is_current")).count() == users)
    assert(h.filter(col("is_current") =!= col("eff_to_s").isNull).isEmpty)
    // intervals tile: next version starts exactly where this one ends
    val w = Window.partitionBy("user_id").orderBy("eff_from_s")
    val tiled = h.withColumn("next_from", lead("eff_from_s", 1).over(w))
    assert(tiled.filter(col("eff_to_s").isNotNull &&
      col("eff_to_s") =!= col("next_from")).isEmpty)
    assert(tiled.filter(col("eff_to_s") < col("eff_from_s")).isEmpty)
    // SCD2 minimality: consecutive versions always differ in value
    assert(h.withColumn("pv", lag("value", 1).over(w))
      .filter(col("pv").isNotNull && col("value") === col("pv")).isEmpty)
    // as-of reconstruction for one user: at every event time, the
    // covering interval's value equals the event's value
    val ev = Events.eventsS(spark, TestSpark.sf)
      .select("user_id", "event_id", "ts_s", "value")
    val u = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).head.getLong(0)
    val log = ev.filter(col("user_id") === u).collect()
      .map(x => (x.getLong(2), x.getLong(1), x.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    val hist = h.filter(col("user_id") === u).collect()
      .map(x => (x.getLong(2), Option(x.get(3)).map(_.asInstanceOf[Long]), x.getDouble(1)))
      .sortBy(_._1)
    for ((ts, _, v) <- log) {
      // the last event at a given ts wins within the interval; compare
      // against the interval covering ts unless a later same-ts event
      // superseded it (dedup: take the last log value at this ts)
      val lastAtTs = log.filter(_._1 == ts).last._3
      val cover = hist.filter(iv => iv._1 <= ts &&
        iv._2.forall(_ > ts)).last
      assert(cover._3 == lastAtTs, s"user $u ts $ts")
    }
    h.unpersist()
  }

  test("cube: the four grouping sets are mutually consistent and the " +
    "plan is one Expand+aggregate, not four scans") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val c = Events.cube(spark, TestSpark.sf).cache()
    val nEvents = graft.core.Tables.events(spark, TestSpark.sf).count()
    val detail = c.filter(col("g_t") === 0 && col("g_d") === 0)
    val byType = c.filter(col("g_t") === 0 && col("g_d") === 1)
    val byDay = c.filter(col("g_t") === 1 && col("g_d") === 0)
    val total = c.filter(col("g_t") === 1 && col("g_d") === 1)
    // counts roll up along every edge of the lattice
    assert(total.count() == 1)
    assert(total.head.getAs[Long]("n") == nEvents)
    assert(detail.agg(sum("n")).head.getLong(0) == nEvents)
    assert(byType.agg(sum("n")).head.getLong(0) == nEvents)
    assert(byDay.agg(sum("n")).head.getLong(0) == nEvents)
    // detail collapses exactly onto the per-type margin
    val fromDetail = detail.groupBy("event_type").agg(sum("n").as("n2"))
    assert(byType.join(fromDetail, "event_type")
      .filter(col("n") =!= col("n2")).isEmpty)
    // one Expand feeding one aggregation — a single pass over the data
    val plan = c.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    c.unpersist()
  }

  test("cohort LTV: curve equals a driver recompute and is monotone per cohort") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    val rows = e.select(col("user_id"),
        expr(s"${Events.tsNanos(e)} DIV ${86400L * 1000000000L}").as("day"),
        col("value"))
      .as[(Long, Long, Double)].collect()
    val cohortOf = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohortOf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val dailyS = rows.groupBy { case (u, d, _) => (cohortOf(u), d - cohortOf(u)) }
      .view.mapValues(rs => (rs.length.toLong,
        rs.iterator.map { case (_, _, v) => math.floor(v * 1e6 + 0.5).toLong }.sum))
      .toMap
    val got = Events.cohortLtv(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == dailyS.size)
    // exact per-cell identities against the driver recompute
    val cumByCohort = got.groupBy(_._1)
    got.foreach { case (c, off, nEv, sz, revDay, revCum, ltv) =>
      val (n, revS) = dailyS((c, off))
      assert(nEv == n && sz == sizes(c))
      assert(revDay == revS.toDouble / 1e6)
      val expCumS = dailyS.collect {
        case ((cc, o), (_, s)) if cc == c && o <= off => s }.sum
      assert(revCum == expCumS.toDouble / 1e6)
      assert(ltv == (expCumS.toDouble / 1e6) / sz.toDouble)
    }
    // LTV curves never decrease (values are non-negative amounts)
    cumByCohort.values.foreach { rs =>
      val sorted = rs.sortBy(_._2).map(_._6)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => b >= a })
    }
  }

  test("markov transitions: matrix equals a driver recompute and rows are stochastic") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    val rows = e.select(col("user_id"),
        expr(s"${Events.tsNanos(e)} DIV 1000000000").as("ts_s"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val exp = rows.groupBy(_._1).values.flatMap { us =>
      val seq = us.sortBy(r => (r._2, r._3)).map(_._4)
      seq.zip(seq.drop(1))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Events.markovTransitions(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == exp)
    // row-stochastic on the INTEGERS and p the exact per-cell division
    got.groupBy(_._1).foreach { case (_, cells) =>
      val nFrom = cells.head._4
      assert(cells.map(_._3).sum == nFrom)
      cells.foreach(c => assert(c._5 == c._3.toDouble / c._4.toDouble))
    }
    // every observed type appears as a source (all users emit >= 2 events
    // of some type at these SFs)
    assert(got.map(_._1).distinct.length == rows.map(_._4).distinct.length)
  }

  test("windowed top-k: leaderboard equals a driver recompute on the scaled longs") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    val rows = e.select(col("user_id"),
        expr(s"${Events.tsNanos(e)} DIV 1000000000").as("ts_s"), col("value"))
      .as[(Long, Long, Double)].collect()
    val agg = rows.groupBy { case (u, t, _) => (t - t % 3600, u) }
      .view.mapValues(rs => (rs.length.toLong,
        rs.iterator.map { case (_, _, v) => math.floor(v * 1e6 + 0.5).toLong }.sum))
      .toMap
    val exp = agg.groupBy(_._1._1).flatMap { case (w, cells) =>
      cells.toSeq.sortBy { case ((_, u), (_, vs)) => (-vs, u) }
        .take(Events.TopkPerWindow).zipWithIndex
        .map { case (((_, u), (n, vs)), i) => (w, i + 1, u, n, vs.toDouble / 1e6) }
    }.toSet
    val got = Events.windowedTopk(spark, TestSpark.sf)
      .as[(Long, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5)).toSet
    assert(got == exp)
    // every window emits at most k rows and ranks 1..k' contiguously
    got.groupBy(_._1).values.foreach { ws =>
      val rnks = ws.map(_._2).toSeq.sorted
      assert(rnks == (1 to rnks.length) && rnks.length <= Events.TopkPerWindow)
    }
  }

  test("cusum: window form equals the textbook max(0, .) recursion, " +
      "alarm threshold honored") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    val rows = e.select(col("event_type"),
        expr(s"${Events.tsNanos(e)} DIV ${86400L * 1000000000L}").as("day"),
        col("value"))
      .as[(String, Long, Double)].collect()
    // driver recompute: daily scaled sums, then the SEQUENTIAL recursion
    val daily = rows.groupBy(r => (r._1, r._2)).view.mapValues(rs =>
      (rs.length.toLong,
        rs.iterator.map(r => math.floor(r._3 * 1e6 + 0.5).toLong).sum)).toMap
    val got = Events.cusum(spark, TestSpark.sf)
      .as[(String, Long, Long, Double, Double, Boolean)].collect()
    assert(got.length == daily.size)
    got.groupBy(_._1).foreach { case (tpe, g) =>
      val days = g.map(_._2).sorted
      val svs = days.map(d => daily((tpe, d))._2)
      val total = svs.sum
      val n = days.length.toLong
      // textbook recursion over the integer residuals r_d = sv_d*n - total
      var s = 0L
      val expect = svs.map { sv =>
        s = math.max(0L, s + (sv * n - total)); s }
      val byDay = g.sortBy(_._2)
      byDay.zip(days.zip(expect)).foreach { case ((_, d, nEv, vDay, cus, al), (dd, sExp)) =>
        assert(d == dd)
        assert(nEv == daily((tpe, d))._1)
        assert(vDay == daily((tpe, d))._2.toDouble / 1e6)
        assert(cus == sExp.toDouble / n / 1e6)
        assert(al == (sExp > total))
      }
      // the trajectory clamps at zero and ends back at/above zero
      assert(expect.forall(_ >= 0L))
      // alarm only ever fires where the cumulative excess beats one mean day
      byDay.filter(_._6).foreach { r => assert(r._5 * n * 1e6 > total.toDouble) }
    }
  }

  test("forecast eval: seasonal-naive backtest equals the driver-side " +
      "walk-forward recompute, calendar (not row) lags") {
    import org.apache.spark.sql.functions._
    val ev = Events.eventsS(spark, TestSpark.sf)
      .select(col("event_type"), col("ts_s"), col("value"))
      .as[(String, Long, Double)].collect()
    val daily = ev.groupBy(r => (r._1, r._2 / 86400L)).view.mapValues(rs =>
      (rs.length.toLong,
        rs.iterator.map(r => math.floor(r._3 * 1e6 + 0.5).toLong).sum)).toMap
    // walk-forward: every day with BOTH a d-7 and a d-1 observation scores
    val expect = daily.keys.toSeq
      .filter { case (t, d) => daily.contains((t, d - 7L)) && daily.contains((t, d - 1L)) }
      .groupBy(_._1).view.mapValues { ks =>
        val n = ks.length.toLong
        val aeNS = ks.map { case (t, d) => math.abs(daily((t, d))._1 - daily((t, d - 7L))._1) }.sum
        val aeN1 = ks.map { case (t, d) => math.abs(daily((t, d))._1 - daily((t, d - 1L))._1) }.sum
        val aeVS = ks.map { case (t, d) => math.abs(daily((t, d))._2 - daily((t, d - 7L))._2) }.sum
        (n, aeNS.toDouble / n, aeN1.toDouble / n, aeVS.toDouble / n / 1e6,
          aeNS.toDouble / aeN1.toDouble)
      }.toMap
    val got = Events.forecastEval(spark, TestSpark.sf)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (tpe, n, maeS, maeN, maeV, ratio) =>
      val (en, es, e1, evv, er) = expect(tpe)
      assert(n == en, s"$tpe scored-day count drifted")
      assert(maeS == es && maeN == e1 && maeV == evv && ratio == er,
        s"$tpe backtest drifted")
    }
    // the report only ever scores days that HAVE both forecasts: no type
    // may claim more scored days than its span minus the 7-day burn-in
    got.foreach { case (tpe, n, _, _, _, _) =>
      val days = daily.keys.collect { case (t, d) if t == tpe => d }
      assert(n <= days.max - days.min + 1 - 7)
    }
  }

  test("range join: bucket decomposition equals the naive O(n*iv) range " +
      "match, and the plan has no nested-loop join") {
    import org.apache.spark.sql.functions._
    val frame = Events.rangeJoin(spark, TestSpark.sf)
    val phys = frame.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin"), "range join degraded to BNLJ")
    assert(!phys.contains("CartesianProduct"), "range join degraded to cartesian")
    val ev = Events.eventsS(spark, TestSpark.sf)
      .select(col("event_type"), col("ts_s"), col("value"))
      .as[(String, Long, Double)].collect()
    // busiest-5 days per type, deterministic tiebreak, widened intervals
    val ivs = ev.groupBy(e => (e._1, e._2 / 86400L)).view.mapValues(_.length)
      .toSeq.groupBy(_._1._1).toSeq.flatMap { case (tpe, ds) =>
        ds.sortBy { case ((_, d), n) => (-n, d) }.take(5).map { case ((_, d), _) =>
          (tpe, d * 86400L - 43200L, d * 86400L + 129600L) }
      }
    // naive quadratic match — the semantics the decomposition must preserve
    val expect = ivs.map { case (tpe, s, e) =>
      val hits = ev.filter(r => r._1 == tpe && r._2 >= s && r._2 < e)
      ((tpe, s, e), (hits.length.toLong,
        hits.map(r => math.floor(r._3 * 1e6 + 0.5).toLong).sum.toDouble / 1e6))
    }.toMap
    val got = frame.as[(String, Long, Long, Long, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (tpe, s, e, n, v) =>
      val (en, ev2) = expect((tpe, s, e))
      assert(n == en && v == ev2, s"interval ($tpe, $s) drifted")
    }
  }

  test("ewma: the offset-join form equals the textbook truncated weighted " +
      "average recomputed driver-side, calendar-correct over gaps") {
    import org.apache.spark.sql.functions._
    val ev = Events.eventsS(spark, TestSpark.sf)
      .select(col("event_type"), (col("ts_s") / 86400L).cast("long"),
        col("value"))
      .as[(String, Long, Double)].collect()
    // daily cent-scaled sums, the frame both engines smooth over
    val daily = ev.groupBy(r => (r._1, r._2)).view.mapValues { g =>
      (g.length.toLong, g.map(r => math.floor(r._3 * 100.0 + 0.5).toLong).sum)
    }.toMap
    // textbook truncated EWMA over PRESENT calendar days only
    val expect = daily.map { case ((tpe, d), (n, sv)) =>
      val terms = (0 to 15).flatMap { i =>
        daily.get((tpe, d - i)).map { case (_, s) => (s, 1L << (15 - i)) }
      }
      val num = terms.map { case (s, w) => s * w }.sum
      val den = terms.map(_._2).sum
      ((tpe, d), (n, sv.toDouble / 100.0, num.toDouble / den / 100.0))
    }
    val got = Events.ewma(spark, TestSpark.sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length == daily.size, "one output row per present (type, day)")
    got.foreach { case (tpe, d, n, v, e) =>
      val (en, ev2, ee) = expect((tpe, d))
      assert(n == en && v == ev2 && e == ee, s"($tpe, $d) drifted")
    }
    // a day with no earlier data in the horizon smooths to itself
    val firsts = daily.keys.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    got.filter { case (tpe, d, _, _, _) => firsts(tpe) == d }
      .foreach { case (tpe, d, _, v, e) =>
        assert(v == e, s"first day ($tpe, $d) must smooth to itself") }
  }

  test("attribution: linear credit equals the driver recompute and " +
      "conserves total purchase value to the cent") {
    import org.apache.spark.sql.functions._
    val ev = Events.eventsS(spark, TestSpark.sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_s"), col("value"))
      .as[(Long, Long, String, Long, Double)].collect()
    val purchases = ev.filter(_._3 == "purchase")
    val touches = ev.filter(r => r._3 == "view" || r._3 == "click")
      .groupBy(_._1).view.mapValues(_.toSeq).toMap
    def cents(v: Double) = math.floor(v * 100.0 + 0.5).toLong
    val credits = scala.collection.mutable.Map[String, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    purchases.foreach { case (u, _, _, pts, v) =>
      val ts = touches.getOrElse(u, Nil)
        .filter(t => t._4 < pts && t._4 >= pts - Events.AttribWindowS)
        .sortBy(t => (t._4, t._2))
      val c = cents(v)
      if (ts.isEmpty) {
        val (n, s) = credits("unattributed")
        credits("unattributed") = (n + 1, s + c)
      } else {
        val n = ts.length
        ts.zipWithIndex.foreach { case (t, i) =>
          val share = c / n + (if (i == n - 1) c % n else 0L)
          val (cn, cs) = credits(t._3)
          credits(t._3) = (cn + 1, cs + share)
        }
      }
    }
    val expect = credits.map { case (ch, (n, s)) =>
      ch -> (n, s.toDouble / 100.0) }.toMap
    val got = Events.attribution(spark, TestSpark.sf)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expect)
    // conservation: credited + unattributed == total purchase cents
    val totalCents = purchases.map(r => cents(r._5)).sum
    val gotCents = got.values.map(v => math.round(v._2 * 100.0)).sum
    assert(gotCents == totalCents, "credit must conserve value to the cent")
    assert(got.contains("view") && got.contains("click") &&
      got.contains("unattributed"))
  }

  test("growth accounting: classes equal a driver recompute and the two " +
      "accounting identities hold exactly") {
    import org.apache.spark.sql.functions._
    val act = Events.eventsS(spark, TestSpark.sf)
      .select(col("user_id"), (col("ts_s") / 86400L).cast("long").as("day"))
      .distinct().as[(Long, Long)].collect().toSet
    val firstDay = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val maxDay = act.map(_._2).max
    val byDay = act.groupBy(_._2)
    val dayUniverse = byDay.keySet ++
      act.map(_._2 + 1).filter(_ <= maxDay) // churn-only days included
    val expect = dayUniverse.map { d =>
      val us = byDay.getOrElse(d, Set.empty)
      val cls = us.toSeq.map { case (u, _) =>
        if (firstDay(u) == d) "new"
        else if (act((u, d - 1))) "retained"
        else "resurrected"
      }
      val churned = act.count { case (u, pd) =>
        pd == d - 1 && !act((u, d)) && d <= maxDay }
      d -> (us.size.toLong, cls.count(_ == "new").toLong,
        cls.count(_ == "retained").toLong,
        cls.count(_ == "resurrected").toLong, churned.toLong)
    }.toMap.filter { case (_, v) => v._1 > 0 || v._5 > 0 }
    val got = Events.growthAccounting(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(got == expect)
    // identity 1: every active day is exactly one class
    got.foreach { case (d, (a, n, r, res, _)) =>
      assert(a == n + r + res, s"day $d: active != new+retained+resurrected") }
    // identity 2: yesterday's actives either retain or churn
    got.foreach { case (d, (_, _, r, _, c)) =>
      got.get(d - 1).foreach { case (aPrev, _, _, _, _) =>
        assert(aPrev == r + c, s"day $d: active_{d-1} != retained + churned") }
    }
    // the stream exercises every class somewhere
    assert(got.values.exists(_._4 > 0) && got.values.exists(_._5 > 0))
  }

  test("ab test: counts, rates and z equal the driver recompute, and " +
      "the A/A property holds (orthogonal assignment must not fire)") {
    import org.apache.spark.sql.functions._
    val users = Events.eventsS(spark, TestSpark.sf)
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)].collect()
      .groupBy(_._1).view
      .mapValues { g =>
        if (g.count(_._2 == "purchase") * 5L > g.length) 1L else 0L
      }.toMap
    def variant(u: Long): String =
      if (graft.core.PortableHash.pHashJvm(s"ab|$u") % 2 == 0) "A" else "B"
    val a = users.filter(kv => variant(kv._1) == "A")
    val b = users.filter(kv => variant(kv._1) == "B")
    val (na, ca) = (a.size.toLong, a.values.sum)
    val (nb, cb) = (b.size.toLong, b.values.sum)
    // the metric must have genuine variance for the test to exist
    assert(ca + cb > 0 && ca + cb < na + nb, "degenerate conversion metric")
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val pp = (ca + cb).toDouble / (na + nb)
    val se = math.sqrt((pp * (1.0 - pp)) * ((1.0 / na) + (1.0 / nb)))
    val z = math.floor((pa - pb) / se * 1e6 + 0.5) / 1e6
    val powered = na >= 30 && nb >= 30
    val Array(row) = Events.abTest(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double, Double, Double, Boolean, Boolean)]
      .collect()
    assert(row == ((na, ca, nb, cb, pa, pb, z, powered,
      powered && math.abs(z) > 1.96)))
    assert(na > 0 && nb > 0, "both variants must be populated")
    // the power gate's reason to exist, measured: at this SF the raw z
    // DOES cross 1.96 on an A/A split (15 users — normal approx
    // invalid); the gate suppresses exactly that false alarm
    if (!powered) assert(!row._9,
      s"underpowered test must never fire (z=$z)")
    else assert(!row._9, s"orthogonal assignment fired significance (z=$z)")
  }

  test("power analysis equals the closed-form recompute and is " +
      "consistent with the ab-test power gate's story") {
    import org.apache.spark.sql.functions._
    val users = Events.eventsS(spark, TestSpark.sf)
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(g => g.count(_._2 == "purchase") * 5L > g.length).toMap
    val nObs = users.size.toLong
    val cObs = users.values.count(identity).toLong
    val p1 = cObs.toDouble / nObs
    val p2 = p1 * (1.0 + Events.PowerLiftPct.toDouble / 100.0)
    val pbar = (p1 + p2) / 2.0
    val delta = p2 - p1
    val half = (Events.ZAlpha * math.sqrt(2.0 * pbar * (1.0 - pbar))) +
      (Events.ZBeta * math.sqrt((p1 * (1.0 - p1)) + (p2 * (1.0 - p2))))
    val nReq = math.ceil(half * half / (delta * delta)).toLong
    val Array(row) = Events.powerAnalysis(spark, TestSpark.sf)
      .as[(Long, Long, Double, Double, Long, Boolean)].collect()
    assert(row == ((nObs, cObs, p1, p2, nReq, nObs / 2 >= nReq)))
    // a 10% lift on a mid-range rate needs O(1000)+ users per arm —
    // the report must say today's corpus cannot power that test
    assert(nReq > nObs / 2 && !row._6,
      s"this corpus ($nObs users) should NOT power a 10% lift test ($nReq)")
  }

  test("Kaplan–Meier curve equals the textbook estimator recomputed " +
      "driver-side, and censoring genuinely separates it from the " +
      "censors-as-deaths curve") {
    import org.apache.spark.sql.functions._
    val ev = Events.eventsS(spark, TestSpark.sf)
      .select(col("user_id"), col("ts_s"), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val gmax = ev.map(_._2).max
    val per = ev.filter(_._4 == "purchase")
      .groupBy(_._1).values.toSeq.flatMap { g =>
      val sorted = g.map(r => (r._2, r._3)).sortBy(identity)
      sorted.zipWithIndex.map { case ((ts, _), i) =>
        if (i + 1 < sorted.length) ((sorted(i + 1)._1 - ts) / 3600L, 1L)
        else ((gmax - ts) / 3600L, 0L)
      }
    }
    val byT = per.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2 == 1L).toLong, g.count(_._2 == 0L).toLong)
    }.toMap
    val ts = byT.keys.toSeq.sorted
    // the fold, in the operator's exact op order
    var rem = per.length.toLong
    var surv = 1.0
    val expect = ts.map { t =>
      val (d, c) = byT(t)
      val nRisk = rem
      surv = surv * (1.0 - d.toDouble / rem)
      rem = rem - d - c
      (t, nRisk, d, c, surv)
    }
    val got = Events.survival(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == expect, "KM curve differs from the driver fold")
    // structure: survival nonincreasing from 1, risk sets telescoping
    assert(got.head._5 <= 1.0 && got.sliding(2).forall(p =>
      p.length < 2 || p(1)._5 <= p(0)._5))
    // censoring must matter: some users censored, some dead, and the
    // censors-as-deaths curve must end strictly lower
    assert(per.exists(_._2 == 0L) && per.exists(_._2 == 1L))
    var rem2 = per.length.toLong
    var naive = 1.0
    val naiveCurve = ts.map { t =>
      val (d, c) = byT(t)
      naive = naive * (1.0 - (d + c).toDouble / rem2)
      rem2 = rem2 - d - c
      t -> naive
    }.toMap
    val km = got.map(r => r._1 -> r._5).toMap
    assert(ts.forall(t => naiveCurve(t) <= km(t)) &&
      ts.exists(t => naiveCurve(t) < km(t)),
      "censors-as-deaths should underestimate survival pointwise")
  }

  test("rfm: per-user scores and segments equal the driver recompute, " +
      "nearest-rank cuts honored, ties share a score") {
    val p = Events.eventsS(spark, TestSpark.sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts_s", $"value")
      .as[(Long, Long, Double)].collect()
    val gmax = p.map(_._2).max
    val per = p.groupBy(_._1).map { case (u, rows) =>
      val last = rows.map(_._2).max
      val m = rows.map(r => math.floor(r._3 * 1000000.0 + 0.5).toLong).sum
      (u, (gmax - last) / 86400L, rows.length.toLong, m, m / 1000000L)
    }.toSeq
    def cuts(vs: Seq[Long]): Seq[Long] = {
      val n = vs.length.toLong
      val hist = vs.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      (1 to 4).map { k =>
        val need = (n * k + 4) / 5
        var cum = 0L
        hist.collectFirst { case (v, c) if { cum += c; cum >= need } => v }.get
      }
    }
    val rc = cuts(per.map(_._2))
    val fc = cuts(per.map(_._3))
    val mc = cuts(per.map(_._5))
    def up(v: Long, cs: Seq[Long]) = 1 + cs.count(v > _)
    def dn(v: Long, cs: Seq[Long]) = 1 + cs.count(v < _)
    val expect = per.map { case (u, r, f, m, musd) =>
      val (sr, sf, sm) = (dn(r, rc), up(f, fc), up(musd, mc))
      val seg =
        if (sr >= 4 && sf >= 4) "champion"
        else if (sf >= 4) "loyal"
        else if (sr >= 4 && sf <= 2) "new"
        else if (sr <= 2 && sf >= 3) "at_risk"
        else if (sr <= 2) "hibernating"
        else "regular"
      (u, r, f, m, sr, sf, sm, seg)
    }.sortBy(_._1)
    val got = Events.rfm(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Int, Int, Int, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == expect, "RFM table differs from the driver recompute")
    assert(got.forall(r => Seq(r._5, r._6, r._7)
      .forall(s => s >= 1 && s <= 5)), "scores confined to 1..5")
    assert(got.map(_._8).distinct.length >= 3,
      "the segment grid should be populated by more than trivial cells")
    // ties share a score: equal metric values never split across scores
    assert(got.groupBy(_._2).values.forall(_.map(_._5).distinct.length == 1)
      && got.groupBy(_._3).values.forall(_.map(_._6).distinct.length == 1),
      "nearest-rank scoring must give tied values the same score")
  }

  test("stickiness: dau/wau/mau equal brute trailing-window distincts, " +
      "containment holds, full_window labels the complete-lookback days") {
    val act = Events.eventsS(spark, TestSpark.sf)
      .select($"user_id", ($"ts_s" / 86400L).cast("long").as("day"))
      .distinct().as[(Long, Long)].collect().toSeq
    val (d0, d1) = (act.map(_._2).min, act.map(_._2).max)
    def window(d: Long, w: Long): Long =
      act.filter(r => r._2 <= d && r._2 > d - w).map(_._1).distinct.size.toLong
    val got = Events.stickiness(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    // one row per day a 28-day window can land on, clamped to the span
    assert(got.map(_._1).toSeq == (d0 to d1))
    got.foreach { case (d, dau, wau, mau, s, full) =>
      assert(dau == window(d, 1) && wau == window(d, 7) && mau == window(d, 28),
        s"windows at day $d")
      assert(dau <= wau && wau <= mau, "containment")
      assert(s == dau.toDouble / mau)
      assert(full == (d >= d0 + 27))
    }
    assert(got.exists(_._6) && got.exists(!_._6),
      "span should cover both partial and full lookback days")
    // stickiness must compress: some day's MAU strictly exceeds its DAU
    assert(got.exists(r => r._4 > r._2))
  }

  test("holt: level/trend equal the textbook recursion in the exact " +
      "op order; forecast extrapolates; trend state beats EWMA on ramps") {
    val daily = Events.eventsS(spark, TestSpark.sf)
      .select($"event_type", ($"ts_s" / 86400L).cast("long").as("day"),
        $"value")
      .as[(String, Long, Double)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(r => math.floor(r._3 * 100.0 + 0.5).toLong).sum)
      .toSeq.groupBy(_._1._1)
    val got = Events.holt(spark, TestSpark.sf)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(got.length == daily.size)
    got.foreach { case (tpe, nDays, lastDay, level, trend, fc) =>
      val ys = daily(tpe).sortBy(_._1._2)
      assert(nDays == ys.length && lastDay == ys.last._1._2)
      var l = ys.head._2.toDouble
      var b = ys(1)._2.toDouble - ys.head._2.toDouble
      ys.drop(1).foreach { case (_, y) =>
        val lNew = 0.5 * y.toDouble + 0.5 * (l + b)
        b = 0.5 * (lNew - l) + 0.5 * b
        l = lNew
      }
      assert(level == l / 100.0 && trend == b / 100.0, s"state of $tpe")
      assert(fc == (l + 7.0 * b) / 100.0)
    }
    // Holt's reason to exist: on a synthetic pure ramp y_t = t, the
    // trend converges toward the true slope and the 7-ahead forecast
    // beats a level-only EWMA's by construction
    var (l2, b2) = (1.0, 1.0)
    (2 to 40).foreach { t =>
      val lNew = 0.5 * t + 0.5 * (l2 + b2)
      b2 = 0.5 * (lNew - l2) + 0.5 * b2; l2 = lNew
    }
    assert(math.abs(b2 - 1.0) < 1e-6 && math.abs(l2 - 40.0) < 1e-3,
      "on a ramp the state converges to (t, slope)")
  }

  test("top paths: the path table equals a driver sessionize-and-slice " +
      "recompute; shares sum to at most 1; multi-step paths exist") {
    val evs = Events.eventsS(spark, TestSpark.sf)
      .select($"user_id", $"event_id", $"event_type", $"ts_s")
      .as[(Long, Long, String, Long)].collect()
    val paths = evs.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val sessions = scala.collection.mutable.Buffer[Seq[String]]()
      var cur = scala.collection.mutable.Buffer[String]()
      var prev = Long.MinValue
      sorted.foreach { r =>
        if (prev == Long.MinValue || r._4 - prev > Events.GapS) {
          if (cur.nonEmpty) sessions += cur.toSeq
          cur = scala.collection.mutable.Buffer[String]()
        }
        cur += r._3; prev = r._4
      }
      if (cur.nonEmpty) sessions += cur.toSeq
      sessions.map(_.take(Events.PathLen).mkString(">"))
    }.toSeq
    val nSessions = paths.length
    val expect = paths.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case (p, n) =>
        (p, n, n.toDouble / nSessions.toDouble)
      }.sortBy(r => (-r._2, r._1)).take(Events.PathTopN)
    val got = Events.topPaths(spark, TestSpark.sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == expect, "path table differs from the driver recompute")
    assert(got.map(_._3).sum <= 1.0 + 1e-9)
    assert(got.exists(_._1.contains(">")), "multi-event paths must appear")
  }

  test("markov stationary: the power iteration equals the driver " +
      "recompute in the exact quantized op order; mass conserved; " +
      "iteration moves away from uniform") {
    def q12(x: Double) = math.floor(x * 1e12 + 0.5).toLong
    val trans = Events.markovTransitions(spark, TestSpark.sf)
      .select($"from_type", $"to_type", $"p")
      .as[(String, String, Double)].collect()
    val states = (trans.map(_._1) ++ trans.map(_._2)).distinct.sorted
    val hasOut = trans.map(_._1).toSet
    val pFull = trans ++ states.filterNot(hasOut)
      .map(s => (s, s, 1.0))
    var pi = states.map(_ -> 1.0 / states.length).toMap
    (1 to Events.MarkovIters).foreach { _ =>
      pi = pFull.groupBy(_._2).map { case (to, rows) =>
        to -> rows.map(r => q12(pi(r._1) * r._3)).sum / 1e12
      }
    }
    val got = Events.markovStationary(spark, TestSpark.sf)
      .as[(String, Double)].collect().toMap
    assert(got.keySet == pi.keySet)
    got.foreach { case (s, p) => assert(p == pi(s), s"pi($s)") }
    // mass conserved to the quantization grid
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the chain is not uniform: iteration must move the distribution
    assert(got.values.max - got.values.min > 1e-3,
      "stationary distribution should differ across event types")
  }

  test("entropy rate: per-state exit entropies and the weighted rate " +
      "equal the driver recompute; the rate sits inside the per-state " +
      "envelope and below the uniform ceiling") {
    def q9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    def dsum9(vs: Iterable[Double]) =
      vs.map(v => math.floor(v * 1e9 + 0.5).toLong).sum / 1e9
    val trans = Events.markovTransitions(spark, TestSpark.sf)
      .select($"from_type", $"to_type", $"p")
      .as[(String, String, Double)].collect()
    val hExit = trans.groupBy(_._1).view.mapValues(rs =>
      dsum9(rs.map(r => q9(-(r._3 * math.log(r._3)))))).toMap
    val pi = Events.markovStationary(spark, TestSpark.sf)
      .as[(String, Double)].collect().toMap
    val rate = dsum9(hExit.map { case (s, h) => q9(pi(s) * h) })
    val got = Events.entropyRate(spark, TestSpark.sf)
      .as[(String, Double, Double, Double)].collect()
    assert(got.length == hExit.size)
    got.foreach { case (s, h, p, r) =>
      assert(h == hExit(s) && p == pi(s) && r == rate, s"state $s")
    }
    // the rate is a π-weighted average of exit entropies, and every
    // exit entropy is below ln(n_states) (uniform ceiling)
    val hs = got.map(_._2)
    assert(rate >= hs.min - 1e-9 && rate <= hs.max + 1e-9)
    assert(hs.forall(_ <= math.log(got.length.toDouble) + 1e-9))
    assert(rate > 0.0, "a stochastic journey has positive entropy")
  }

  test("dow uniformity: chi-square equals the driver recompute; a " +
      "synthetic skewed week fires the gate a uniform one passes") {
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val cells = Events.eventsS(spark, TestSpark.sf)
      .select($"event_type", (($"ts_s" / 86400L).cast("long") % 7).as("dow"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = cells.keys.map(_._1).toSeq.distinct.map { tpe =>
      val os = (0L to 6L).map(d => cells.getOrElse((tpe, d), 0L))
        .filter(_ > 0L)
      val n = os.sum
      val e = n.toDouble / 7.0
      val chi2 = os.map(o => math.floor(
        ((o.toDouble - e) * (o.toDouble - e) / e) * 1e6 + 0.5).toLong)
        .sum / 1e6
      tpe -> ((n, chi2, chi2 > Events.Chi6Crit))
    }.toMap
    val got = Events.dowUniformity(spark, TestSpark.sf)
      .as[(String, Long, Double, Boolean)].collect()
    assert(got.length == expect.size)
    got.foreach { case (t, n, c, s) =>
      assert((n, c, s) == expect(t), s"type $t")
    }
    // the test discriminates: driver-side, a flat week passes and a
    // weekend-heavy week fires
    def chi(os: Seq[Long]) = {
      val e = os.sum.toDouble / 7.0
      os.map(o => q6((o - e) * (o - e) / e)).sum
    }
    assert(chi(Seq(100, 100, 100, 100, 100, 100, 100)) < Events.Chi6Crit)
    assert(chi(Seq(50, 50, 50, 50, 50, 200, 250)) > Events.Chi6Crit)
  }

  test("bounce: per-entry-type rates equal a driver sessionize " +
      "recompute; session budget conserved") {
    val evs = Events.eventsS(spark, TestSpark.sf)
      .select($"user_id", $"event_id", $"event_type", $"ts_s")
      .as[(Long, Long, String, Long)].collect()
    val sessions = evs.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val out = scala.collection.mutable.Buffer[Seq[String]]()
      var cur = scala.collection.mutable.Buffer[String]()
      var prev = Long.MinValue
      sorted.foreach { r =>
        if (prev != Long.MinValue && r._4 - prev > Events.GapS) {
          out += cur.toSeq; cur = scala.collection.mutable.Buffer[String]()
        }
        cur += r._3; prev = r._4
      }
      if (cur.nonEmpty) out += cur.toSeq
      out
    }.toSeq
    val expect = sessions.groupBy(_.head).map { case (t, ss) =>
      val n = ss.length.toLong
      val b = ss.count(_.length == 1).toLong
      val d = ss.map(_.length.toLong).sum
      t -> ((n, b, b.toDouble / n.toDouble, d.toDouble / n.toDouble))
    }
    val got = Events.bounce(spark, TestSpark.sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (t, n, b, br, md) =>
      assert((n, b, br, md) == expect(t), s"entry $t")
      assert(br >= 0.0 && br <= 1.0 && md >= 1.0)
    }
    // budget: Σ sessions over entry types = total session count
    assert(got.map(_._2).sum == sessions.length.toLong)
  }
}
