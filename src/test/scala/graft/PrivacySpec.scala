package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Privacy

class PrivacySpec extends AnyFunSuite with SharedSpark {

  private def people = {
    import spark.implicits._
    Seq(
      // class (30, "NYC"): 3 rows, diverse conditions
      (30, "NYC", "flu"), (30, "NYC", "cold"), (30, "NYC", "ok"),
      // class (30, "SF"): 3 rows, all the same condition — not l-diverse
      (30, "SF", "flu"), (30, "SF", "flu"), (30, "SF", "flu"),
      // class (40, "NYC"): a singleton — re-identifiable
      (40, "NYC", "rare"))
      .toDF("age", "city", "condition")
  }

  test("equivalenceClasses: sizes, distinct sensitive values, and both flags") {
    val got = Privacy.equivalenceClasses(people, Seq("age", "city"), k = 2,
        sensitiveCol = Some("condition"), l = 2)
      .orderBy("age", "city").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5))).toSeq
    assert(got === Seq(
      (30, "NYC", 3L, 3L, true, true),
      (30, "SF", 3L, 1L, true, false), // k-anonymous yet leaks the condition
      (40, "NYC", 1L, 1L, false, false)))
  }

  test("equivalenceClasses without a sensitive column omits the l-diversity side") {
    val cols = Privacy.equivalenceClasses(people, Seq("age"), k = 2).columns.toSeq
    assert(cols === Seq("age", "class_size", "k_anonymous"))
  }

  test("riskSummary: the release-gate numbers") {
    val got = Privacy.riskSummary(people, Seq("age", "city"), k = 2).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getBoolean(5)) === (7L, 3L, 1L, 1L, 1L, false))
    val ok = Privacy.riskSummary(people, Seq("city"), k = 2).collect().head
    assert(ok.getBoolean(5), "grouping only by city, every class has >= 2 rows")
  }

  test("entropy l-diversity catches a skewed class that distinct-count passes") {
    import spark.implicits._
    // class A: [a,a,a,a,a,b,c] — 3 distinct values (distinct-l=3 passes) but an
    // attacker guessing 'a' is right 5/7 of the time:
    //   H = ln(7) - (5·ln5 + 1·ln1 + 1·ln1)/7 = 0.7963… < ln(3) = 1.0986…
    // class B: [a,a,b,b,c,c] — balanced: H = ln(3) exactly, entropy-l=3 passes
    val rows = (Seq.fill(5)("a") ++ Seq("b", "c")).map(("A", _)) ++
      Seq("a", "a", "b", "b", "c", "c").map(("B", _))
    val got = Privacy.equivalenceClasses(rows.toDF("grp", "s"), Seq("grp"),
        k = 2, sensitiveCol = Some("s"), l = 3, entropy = true)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        r.getBoolean(5), r.getBoolean(6))).toSeq
    val hA = BigDecimal(math.log(7) - 5 * math.log(5) / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(got === Seq(
      ("A", 7L, 3L, hA, true, false),  // l_diverse yet NOT entropy_l_diverse
      ("B", 6L, 3L, BigDecimal(math.log(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        true, true)))
  }

  test("entropy path treats NULL as its own category but not a distinct value") {
    import spark.implicits._
    val rows = Seq(("A", Some("a")), ("A", Some("a")), ("A", None), ("A", None))
    val r = Privacy.equivalenceClasses(rows.toDF("grp", "s"), Seq("grp"),
        k = 2, sensitiveCol = Some("s"), l = 2, entropy = true).collect().head
    assert(r.getLong(1) === 4L)              // class_size counts null rows
    assert(r.getLong(2) === 1L)              // distinct_sensitive does not
    assert(math.abs(r.getDouble(3) - math.log(2)) < 1e-12) // 50/50 split → ln 2
  }

  test("dpCounts: deterministic keyed noise, seed-sensitive, scale tracks 1/epsilon") {
    import spark.implicits._
    val df = (0 until 2000).map(i => (i, s"g${i % 200}")).toDF("id", "grp")
    def release(eps: Double, seed: String) =
      Privacy.dpCounts(df, Seq("grp"), eps, seed)
        .collect().map(r => r.getAs[String]("grp") ->
          (r.getAs[Long]("true_count"), r.getAs[Double]("dp_count"))).toMap
    val a = release(1.0, "s1")
    assert(a.size === 200)
    assert(a.values.forall(_._1 == 10L))
    // deterministic: identical release on a re-run
    assert(release(1.0, "s1") === a)
    // a different seed draws different noise for most groups
    val b = release(1.0, "s2")
    assert(a.keys.count(k => a(k)._2 != b(k)._2) > 150)
    // noise centered near zero: mean |bias| over 200 groups well under the
    // Laplace scale b=1 (stderr = sqrt(2)/sqrt(200) ~ 0.1)
    val bias = a.values.map { case (t, d) => d - t }.sum / a.size
    assert(math.abs(bias) < 0.5, s"noise bias $bias")
    // epsilon=0.1 noise is ~10x wider than epsilon=10 noise on average
    val wide = release(0.1, "s1").values.map { case (t, d) => math.abs(d - t) }
    val tight = release(10.0, "s1").values.map { case (t, d) => math.abs(d - t) }
    assert(wide.sum / wide.size > 10 * (tight.sum / tight.size))
    // epsilon must be positive
    intercept[IllegalArgumentException] { Privacy.dpCounts(df, Seq("grp"), 0.0, "s") }
  }

  test("dpSums: clipping bounds contribution, noise scales with sensitivity/epsilon, partition-invariant") {
    import spark.implicits._
    // values far outside [0, 10] MUST enter as the clip bound, not raw
    val df = Seq(("a", -100.0), ("a", 5.0), ("a", 3.0), ("b", 1e9), ("b", 2.0))
      .toDF("grp", "v")
    val out = Privacy.dpSums(df, Seq("grp"), "v", lo = 0.0, hi = 10.0,
      epsilon = 1000.0, seed = "s") // huge epsilon → near-zero noise
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("true_sum"), r.getAs[Double]("dp_sum"))).toMap
    assert(out("a")._1 === 8.0)  // -100 clips to 0, 5 + 3
    assert(out("b")._1 === 12.0) // 1e9 clips to 10, + 2
    assert(math.abs(out("a")._2 - 8.0) < 0.1)
    // deterministic under repartitioning (decimal-exact sums + keyed noise)
    val big = (0 until 5000).map(i => (s"g${i % 50}", i % 17 * 1.5)).toDF("grp", "v")
    val one = Privacy.dpSums(big, Seq("grp"), "v", 0.0, 20.0, 1.0, "s2").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val two = Privacy.dpSums(big.repartition(13), Seq("grp"), "v", 0.0, 20.0, 1.0, "s2")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(one === two)
    // noise magnitude tracks sensitivity/epsilon: scale 20/0.1 vs 20/10
    def absNoise(eps: Double) =
      Privacy.dpSums(big, Seq("grp"), "v", 0.0, 20.0, eps, "s2").collect()
        .map(r => math.abs(r.getDouble(2) - r.getDouble(1)))
    val wide = absNoise(0.1); val tight = absNoise(10.0)
    assert(wide.sum / wide.length > 10 * (tight.sum / tight.length))
    // the sum draw is TAGGED: under one seed, sum noise is not the count
    // noise rescaled (independent u draws)
    val sumN = Privacy.dpSums(big, Seq("grp"), "v", 0.0, 20.0, 1.0, "s3")
      .collect().map(r => r.getString(0) -> (r.getDouble(2) - r.getDouble(1)) / 20.0).toMap
    val cntN = Privacy.dpCounts(big, Seq("grp"), 1.0, "s3")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("dp_count") - r.getAs[Long]("true_count"))).toMap
    assert(sumN.keys.count(k => math.abs(sumN(k) - cntN(k)) > 1e-9) > 40)
  }

  test("dpMeans: split-budget quotient lands near the clipped mean") {
    import spark.implicits._
    val df = (0 until 4000).map(i => (s"g${i % 4}", (i % 100).toDouble)).toDF("grp", "v")
    val out = Privacy.dpMeans(df, Seq("grp"), "v", lo = 0.0, hi = 100.0,
      epsilon = 2.0, seed = "m1")
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("dp_mean"), r.getAs[Double]("true_sum"),
          r.getAs[Long]("true_count"))).toMap
    assert(out.size === 4)
    out.values.foreach { case (mean, ts, tc) =>
      val trueMean = ts / tc
      // 1000 rows/group, sum noise scale 100, count scale 1 → mean noise ~0.1
      assert(math.abs(mean - trueMean) < 2.0,
        s"dp_mean $mean too far from $trueMean")
    }
  }

  test("dpRelease: fresh ids draw independent noise; a reused id is refused") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i, s"g${i % 100}")).toDF("id", "grp")
    def rel(id: String) = Privacy.dpRelease(df, Seq("grp"), 1.0, id)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("dp_count"), r.getAs[String]("release_id"),
          r.getAs[Double]("epsilon"))).toMap
    val a = rel("2026-08-r1")
    val b = rel("2026-08-r2")
    // provenance rides every row
    assert(a.values.forall { case (_, id, eps) => id == "2026-08-r1" && eps == 1.0 })
    // distinct ids → independent draws (different noise for most groups)
    assert(a.keys.count(k => a(k)._1 != b(k)._1) > 75)
    // same-session reuse of a spent id is flagged loudly — seed reuse would
    // let the two releases difference to exact counts
    val e = intercept[IllegalArgumentException] { rel("2026-08-r1") }
    assert(e.getMessage.contains("already spent"))
  }

  test("dpSumRelease/dpMeanRelease: one ledger across mechanisms, provenance everywhere") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 25.0, s"g${i % 10}")).toDF("v", "grp")
    // sum release carries provenance and the noisy column
    val s = Privacy.dpSumRelease(df, Seq("grp"), "v", 0.0, 25.0, 1.0, "sum-r1")
      .collect()
    assert(s.forall(r => r.getAs[String]("release_id") == "sum-r1" &&
      r.getAs[Double]("epsilon") == 1.0))
    assert(s.forall(r => r.getAs[Double]("dp_sum") != r.getAs[Double]("true_sum")))
    // sum release refused on id reuse
    val e1 = intercept[IllegalArgumentException] {
      Privacy.dpSumRelease(df, Seq("grp"), "v", 0.0, 25.0, 1.0, "sum-r1")
    }
    assert(e1.getMessage.contains("already spent"))
    // ONE namespace: an id spent on a count release is dead for sums too —
    // the derived seeds would share key material across separately-budgeted
    // releases
    Privacy.dpRelease(df, Seq("grp"), 1.0, "cross-r1")
    val e2 = intercept[IllegalArgumentException] {
      Privacy.dpSumRelease(df, Seq("grp"), "v", 0.0, 25.0, 1.0, "cross-r1")
    }
    assert(e2.getMessage.contains("already spent"))
    // mean release: ONE id spans the composed sum+count pair; each half is
    // bit-identical to the standalone ε/2 operator under the derived seed
    val m = Privacy.dpMeanRelease(df, Seq("grp"), "v", 0.0, 25.0, 1.0, "mean-r1")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(m.values.forall(r => r.getAs[String]("release_id") == "mean-r1" &&
      r.getAs[Double]("epsilon") == 1.0))
    val halfSum = Privacy.dpSums(df, Seq("grp"), "v", 0.0, 25.0, 0.5,
      "dp-release:mean-r1").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Double]("dp_sum")).toMap
    assert(m.forall { case (g, r) => r.getAs[Double]("dp_sum") == halfSum(g) })
    val e3 = intercept[IllegalArgumentException] {
      Privacy.dpMeanRelease(df, Seq("grp"), "v", 0.0, 25.0, 1.0, "mean-r1")
    }
    assert(e3.getMessage.contains("already spent"))
  }

  test("vacuous thresholds are rejected") {
    intercept[IllegalArgumentException] {
      Privacy.equivalenceClasses(people, Seq("age"), k = 1)
    }
    intercept[IllegalArgumentException] {
      Privacy.equivalenceClasses(people, Seq.empty, k = 2)
    }
  }
}
