package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk audit of structured training data: k-anonymity and l-diversity
  * (Sweeney 2002; Machanavajjhala et al. 2007) over a set of quasi-identifier
  * columns. A row is re-identifiable when its quasi-identifier combination is
  * rare (its equivalence class has fewer than k members), and a class leaks its
  * sensitive attribute when that attribute barely varies inside the class
  * (fewer than l distinct values). Both reduce to ONE hash aggregation over the
  * quasi-identifier key — at 100 TB this is a single shuffle whose key is the
  * handful of audit columns, with map-side partial aggregation doing the heavy
  * lifting; the distinct-sensitive count uses the same partial-distinct
  * machinery as any `count(distinct)`.
  *
  * This complements the unstructured-text side of the pipeline
  * ([[TextAnalysis.scrubPii]] removes pattern-matched PII from text); here the
  * risk is structural — which COMBINATIONS of innocuous columns single people
  * out — which no per-row scrub can see.
  */
object Privacy {

  /** Per-equivalence-class audit: the quasi-identifier columns plus
    * `(class_size, k_anonymous[, distinct_sensitive, l_diverse])`.
    * `sensitiveCol = None` skips the l-diversity columns.
    *
    * `entropy = true` adds the ENTROPY l-diversity variant (Machanavajjhala
    * et al. 2007 §4.2): distinct-count l-diversity is the weak form — a class
    * with values `[a,a,a,a,a,b,c]` counts 3 distinct yet an attacker is right
    * guessing `a` 5 times in 7 — so the entropy form requires
    * `H(sensitive | class) >= ln(l)`, which only a reasonably BALANCED
    * distribution satisfies. Emitted as `sensitive_entropy` (nats; NULL counts
    * as its own category, so the value reflects what a release actually
    * reveals) and `entropy_l_diverse`. Plan shape: the entropy needs per-value
    * counts, so this path is TWO hash aggregations — `(quasi, sensitive)`
    * counts, then the per-class fold `H = ln(N) - Σ n·ln(n) / N` — both
    * map-side combined; the second exchange's input is one row per distinct
    * (class, value) pair, not per row of the corpus.
    */
  def equivalenceClasses(df: DataFrame, quasiCols: Seq[String], k: Int,
      sensitiveCol: Option[String] = None, l: Int = 2,
      entropy: Boolean = false): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must not be empty")
    require(k >= 2, s"k must be >= 2 (k=1 is vacuous); got $k")
    require(l >= 2, s"l must be >= 2 (l=1 is vacuous); got $l")
    require(!entropy || sensitiveCol.nonEmpty,
      "entropy l-diversity needs a sensitiveCol")
    if (!entropy) {
      val base = df.groupBy(quasiCols.map(col): _*)
        .agg(count(lit(1)).as("class_size"),
          sensitiveCol.map(c => countDistinct(col(c)).as("distinct_sensitive")).toSeq: _*)
        .withColumn("k_anonymous", col("class_size") >= k)
      sensitiveCol.fold(base)(_ =>
        base.withColumn("l_diverse", col("distinct_sensitive") >= l))
    } else {
      val s = sensitiveCol.get
      val n = col("__n")
      df.groupBy((quasiCols :+ s).map(col): _*).agg(count(lit(1)).as("__n"))
        .groupBy(quasiCols.map(col): _*)
        .agg(
          sum(n).as("class_size"),
          // parity with the countDistinct path: nulls don't count as a value
          sum(when(col(s).isNotNull, 1L).otherwise(0L)).as("distinct_sensitive"),
          (log(sum(n)) - sum(n * log(n)) / sum(n)).as("sensitive_entropy"))
        .withColumn("k_anonymous", col("class_size") >= k)
        .withColumn("l_diverse", col("distinct_sensitive") >= l)
        .withColumn("entropy_l_diverse",
          col("sensitive_entropy") >= log(lit(l.toDouble)))
    }
  }

  /** Differentially-private count release (Laplace mechanism): per-group counts
    * plus Laplace(1/ε) noise — COUNT has sensitivity 1, so the release is ε-DP
    * per the standard bound (Dwork et al. 2006). The "randomness" is a KEYED
    * HASH draw: u is derived from md5(seed, group key) (60 bits → 10⁶
    * quantization), and the noise is the Laplace inverse CDF at u,
    * `-(1/ε)·sign(u−½)·ln(1−2|u−½|)`. Deterministic by design: the same
    * (seed, group) yields the same release on any cluster layout or re-run —
    * what an auditable published statistic needs — while a fresh seed draws
    * fresh noise. Treat the seed like a key: an adversary who knows it can
    * subtract the noise (the same caveat as any PRG-seeded DP release).
    *
    * ==Seed governance — the determinism is a loaded gun==
    * The ε-DP guarantee is for ONE release under ONE seed. Reusing a seed
    * breaks the accounting silently in two ways: (1) re-releasing after the
    * data changed — the noise is unchanged (same keyed hash), so the pair of
    * releases differences to the exact true-count delta of the changed rows;
    * (2) two overlapping group-bys under one seed — groups sharing key
    * material share noise, and the correlated releases compose WORSE than the
    * ε + ε the analyst budgets for (sequential composition assumes
    * independent draws). Rules: one fresh seed per (dataset version, release);
    * never re-derive a release from live data — republish the stored
    * artifact; account ε across every release that touched the same rows.
    * [[dpRelease]] folds these rules into the API: the seed derives from a
    * `release_id` that refuses same-session reuse, and the output carries the
    * (release_id, epsilon) provenance the budget ledger needs.
    *
    * Plan shape: the one map-side-combined groupBy the counts need; the noise
    * is per-GROUP arithmetic on the post-agg rows. Release `dp_count` only —
    * `true_count` is returned for pipeline-internal utility accounting and
    * must not leave the trust boundary. Rounded to 6 decimals so any engine
    * replays it bit-identically.
    */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      seed: String): DataFrame = {
    require(groupCols.nonEmpty, "dpCounts needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    // null-safe key material: encode NULL distinctly from the string "NULL"
    // and delimit columns so ("a","bc") never collides with ("ab","c")
    val keyParts = lit(seed) +: groupCols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0002")))
    val u = ((conv(substring(md5(concat_ws("\u0001", keyParts: _*)), 1, 15),
      16, 10).cast("long") % 1000000).cast("double") + 0.5) / 1000000.0
    val noise = lit(-1.0 / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("true_count"))
      .withColumn("dp_count", round(col("true_count") + noise, 6))
  }

  /** The keyed-hash uniform draw shared by every DP release: md5 over
    * (seed, mechanism tag, group key) → 60 bits → 10⁶ quantization → (0, 1).
    * The tag keeps a count release and a sum release over the SAME groups and
    * seed from sharing noise (correlated noise voids the composition bound).
    */
  private def keyedUniformParts(
      parts: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    ((conv(substring(md5(concat_ws("\u0001", parts: _*)), 1, 15),
      16, 10).cast("long") % 1000000).cast("double") + 0.5) / 1000000.0

  private def nullSafeKey(c: String): org.apache.spark.sql.Column =
    coalesce(col(c).cast("string"), lit("\u0002"))

  private def keyedUniform(groupCols: Seq[String], seed: String,
      tag: String): org.apache.spark.sql.Column =
    keyedUniformParts(lit(seed) +: lit(tag) +: groupCols.map(nullSafeKey))

  /** Laplace(b) inverse CDF at `u` — the noise column for a sensitivity-b
    * release.
    */
  private def laplaceNoise(u: org.apache.spark.sql.Column,
      scale: Double): org.apache.spark.sql.Column =
    lit(-scale) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))

  /** ε-DP SUM release with BOUNDED CONTRIBUTION (Laplace mechanism): each
    * row's value is clipped to [`lo`, `hi`] before summing — the clip is what
    * makes the release possible at all (an unbounded SUM has unbounded
    * sensitivity; no finite-ε noise covers it), and `max(|lo|, |hi|)` is then
    * the add/remove-one-row sensitivity that scales the noise. The clipped
    * bias is the caller's modeling decision (tight bounds → less noise, more
    * bias), the standard DP-SQL trade.
    *
    * Determinism: values are rounded to 6 decimals and summed as
    * DECIMAL(28,6) — exact, order-independent arithmetic, so the release is
    * identical under ANY partitioning and replayable by the oracle (a double
    * sum would drift by summation order across engines and runs). Noise is
    * the same keyed-hash Laplace draw as [[dpCounts]], tagged with the value
    * column so overlapping count+sum releases under one seed still draw
    * independent noise. `true_sum` stays inside the trust boundary; release
    * `dp_sum` only. Same seed-governance rules as [[dpCounts]].
    *
    * Plan shape: ONE map-side-combined groupBy (decimal sum partials);
    * noise is per-group post-agg arithmetic.
    */
  def dpSums(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, epsilon: Double, seed: String): DataFrame = {
    require(groupCols.nonEmpty, "dpSums needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val clipped = least(greatest(col(valueCol).cast("double"), lit(lo)), lit(hi))
    val exact = round(clipped, 6).cast("decimal(28,6)")
    val sensitivity = math.max(math.abs(lo), math.abs(hi))
    val noise = laplaceNoise(keyedUniform(groupCols, seed, s"sum:$valueCol"),
      sensitivity / epsilon)
    df.withColumn("__clip", exact)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__clip")).cast("double").as("true_sum"))
      .withColumn("dp_sum", round(col("true_sum") + noise, 6))
  }

  /** ε-DP MEAN release: the standard split-budget quotient — a [[dpSums]]-style
    * release at ε/2 over clipped values and a [[dpCounts]]-style release at
    * ε/2, `dp_mean = dp_sum / max(dp_count, 1)` (the max guards the released —
    * hence possibly non-positive — denominator). Total privacy cost is ε by
    * sequential composition; the sum draw is tagged and the count draw is not,
    * so one seed serves the pair WITHOUT correlation (they are one release,
    * and each half is bit-identical to what the standalone operator at ε/2
    * would publish). ONE corpus scan: both aggregates ride a single
    * map-side-combined groupBy — never two passes over 100 TB for one
    * release; all noise is post-agg per-group arithmetic.
    */
  def dpMeans(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, epsilon: Double, seed: String): DataFrame = {
    require(groupCols.nonEmpty, "dpMeans needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val clipped = least(greatest(col(valueCol).cast("double"), lit(lo)), lit(hi))
    val exact = round(clipped, 6).cast("decimal(28,6)")
    val sensitivity = math.max(math.abs(lo), math.abs(hi))
    val sumNoise = laplaceNoise(
      keyedUniform(groupCols, seed, s"sum:$valueCol"), sensitivity / (epsilon / 2))
    val cntNoise = laplaceNoise(
      keyedUniformParts(lit(seed) +: groupCols.map(nullSafeKey)),
      1.0 / (epsilon / 2))
    df.withColumn("__clip", exact)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__clip")).cast("double").as("true_sum"),
        count(lit(1)).as("true_count"))
      .withColumn("dp_sum", round(col("true_sum") + sumNoise, 6))
      .withColumn("dp_count", round(col("true_count") + cntNoise, 6))
      .withColumn("dp_mean",
        round(col("dp_sum") / greatest(col("dp_count"), lit(1.0)), 6))
  }

  /** Same-session ledger of spent release ids — the guard that makes seed
    * reuse a loud error instead of a silent privacy break. ONE namespace
    * across all three mechanisms: an id spent on a count release cannot be
    * reused for a sum release either (the seeds would share key material; the
    * per-mechanism noise tags decorrelate draws within ONE composed release,
    * not across independently-budgeted ones).
    */
  private val spentReleases =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def spendRelease(releaseId: String): String = {
    require(releaseId.nonEmpty, "DP release needs a non-empty releaseId")
    require(spentReleases.add(releaseId),
      s"release_id '$releaseId' was already spent in this session — each DP " +
        "release must draw fresh noise under a fresh id (seed reuse lets two " +
        "releases difference to exact counts and voids sequential " +
        "composition); republish the stored artifact or mint a new id")
    s"dp-release:$releaseId"
  }

  private def withProvenance(df: DataFrame, releaseId: String,
      epsilon: Double): DataFrame =
    df.withColumn("release_id", lit(releaseId))
      .withColumn("epsilon", lit(epsilon))

  /** [[dpCounts]] with the seed-governance rules folded in: the noise seed
    * derives from `releaseId` (never caller-supplied, so two releases cannot
    * accidentally share key material), a same-session `releaseId` reuse is
    * REFUSED (re-releasing under one seed breaks the ε accounting — republish
    * the stored artifact instead), and the output rows carry
    * `(release_id, epsilon)` so a downstream budget ledger can sum ε per
    * dataset without out-of-band bookkeeping. Cross-session reuse is on the
    * caller's ledger — persist the release table, don't recompute it.
    *
    * The id is spent at CALL time, deliberately before any action runs: if the
    * downstream persist fails, mint a NEW id for the retry — conservative by
    * design (the draw for the burnt id may already have left the process via
    * logs or partial output; ε accounting should assume it did). The ledger is
    * JVM-wide, so multi-tenant drivers sharing one JVM share one id namespace
    * — prefix ids per tenant.
    */
  def dpRelease(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      releaseId: String): DataFrame =
    withProvenance(dpCounts(df, groupCols, epsilon,
      seed = spendRelease(releaseId)), releaseId, epsilon)

  /** [[dpSums]] under the release ledger — same spend-at-call, derived-seed,
    * and provenance-column rules as [[dpRelease]]. `epsilon` records the WHOLE
    * release's budget (the sum is the only draw here).
    */
  def dpSumRelease(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, epsilon: Double, releaseId: String): DataFrame =
    withProvenance(dpSums(df, groupCols, valueCol, lo, hi, epsilon,
      seed = spendRelease(releaseId)), releaseId, epsilon)

  /** [[dpMeans]] under the release ledger: ONE release id spans the composed
    * sum+count pair — the two draws ride one derived seed with distinct
    * mechanism tags (independent noise, ε/2 each, total ε recorded in the
    * provenance column), exactly the way [[dpMeans]] budgets them. Spending
    * one id for the pair is the point: a caller who released the halves
    * separately would double-book the budget a mean actually costs.
    */
  def dpMeanRelease(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, epsilon: Double, releaseId: String): DataFrame =
    withProvenance(dpMeans(df, groupCols, valueCol, lo, hi, epsilon,
      seed = spendRelease(releaseId)), releaseId, epsilon)

  /** One-row corpus summary: `(n_rows, n_classes, classes_below_k, rows_at_risk,
    * min_class_size, k_anonymous)` — `rows_at_risk` is the row count inside
    * under-k classes (the release-blocking number), and `k_anonymous` says the
    * whole table meets k. Second aggregation runs over the per-class table, so
    * it costs one more tiny exchange, not another corpus scan.
    */
  def riskSummary(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame =
    equivalenceClasses(df, quasiCols, k)
      .agg(
        sum(col("class_size")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        sum(when(!col("k_anonymous"), 1L).otherwise(0L)).as("classes_below_k"),
        sum(when(!col("k_anonymous"), col("class_size")).otherwise(0L)).as("rows_at_risk"),
        min(col("class_size")).as("min_class_size"))
      .withColumn("k_anonymous", col("classes_below_k") === 0)
}
