package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Model-based differential testing of native SQL MERGE: for each seeded
  * trial, a random target/source pair and a randomly composed MERGE statement
  * (conditional matched UPDATE/DELETE in random order, partial or full SETs
  * with both-side references, 0–2 first-match-wins INSERT branches, optional
  * NOT MATCHED BY SOURCE actions) execute against a graft catalog table, and
  * the result is compared row-for-row against an INDEPENDENT in-memory Scala
  * model of SQL MERGE semantics. The SQL string and the model are generated
  * from the same menu, so any divergence — wrong branch order, a lost target
  * column in a partial SET, an insert under a false condition, a
  * mis-classified NMBS row — fails the trial with its seed printed.
  *
  * Source keys are unique per trial (duplicate MATCHED keys are a refusal,
  * covered by DSv2CatalogSpec's cardinality test, not a semantics question).
  */
class MergePropertySpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  /** The model row: b is nullable. */
  private case class R(id: Long, a: Long, b: Option[String])

  // ---- the menu: every entry is (SQL fragment, Scala twin) ----

  /** Conditions over (target row, source row); target-only entries are usable
    * in NMBS positions (source passed as null there and never consulted).
    */
  private val matchedConds: Seq[(String, (R, R) => Boolean)] = Seq(
    ("s.a % 2 = 0", (_, s) => s.a % 2 == 0),
    ("t.a < s.a", (t, s) => t.a < s.a),
    ("s.b = 'x'", (_, s) => s.b.contains("x")),
    ("t.id % 3 = 0", (t, _) => t.id % 3 == 0))

  private val tgtOnlyConds: Seq[(String, R => Boolean)] = Seq(
    ("t.a < 5", t => t.a < 5),
    ("t.id % 2 = 1", t => t.id % 2 == 1))

  private val srcOnlyConds: Seq[(String, R => Boolean)] = Seq(
    ("s.a > 3", s => s.a > 3),
    ("s.b IS NOT NULL", s => s.b.isDefined))

  /** Matched UPDATE SET variants: (SQL assignments, model transform). */
  private val updateSets: Seq[(String, (R, R) => R)] = Seq(
    ("t.a = s.a, t.b = s.b", (t, s) => R(t.id, s.a, s.b)),            // full mirror
    ("t.a = t.a + s.a", (t, s) => R(t.id, t.a + s.a, t.b)),           // partial, both sides
    ("t.b = concat(coalesce(t.b, ''), coalesce(s.b, '-'))",
      (t, s) => R(t.id, t.a, Some(t.b.getOrElse("") + s.b.getOrElse("-")))),
    ("t.a = s.a * 10", (t, s) => R(t.id, s.a * 10, t.b)))             // partial, source only

  /** INSERT variants: (SQL column list + VALUES, model constructor). */
  private val insertSets: Seq[(String, R => R)] = Seq(
    ("(id, a, b) VALUES (s.id, s.a, s.b)", s => R(s.id, s.a, s.b)),
    ("(id, a) VALUES (s.id, s.a + 100)", s => R(s.id, s.a + 100, None)))

  /** NMBS UPDATE variants (target refs only). */
  private val nmbsSets: Seq[(String, R => R)] = Seq(
    ("t.b = 'stale'", t => R(t.id, t.a, Some("stale"))),
    ("t.a = -1", t => R(t.id, -1L, t.b)))

  private def lit(b: Option[String]): String =
    b.map(s => s"'$s'").getOrElse("CAST(NULL AS STRING)")

  test("randomized MERGE shapes agree with the independent SQL-semantics model") {
    val wh = java.nio.file.Files.createTempDirectory("graft_mergeprop").toString
    spark.conf.set("spark.sql.catalog.gmp",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmp.t")

    (1 to 20).foreach { trial =>
      val rnd = new Random(7900 + trial)
      val bVals = Seq(Some("x"), Some("y"), None)
      def row(id: Long): R = R(id, rnd.nextInt(10).toLong, bVals(rnd.nextInt(3)))
      val target = rnd.shuffle((0L until 20L).toList).take(6 + rnd.nextInt(8)).map(row)
      val source = rnd.shuffle((0L until 28L).toList).take(6 + rnd.nextInt(8)).map(row)

      // ---- compose a random statement + its model ----
      case class MAct(isDelete: Boolean, condSql: Option[String],
          cond: (R, R) => Boolean, set: (R, R) => R, setSql: String)
      def pickMatched(isDelete: Boolean, mustCond: Boolean): MAct = {
        val c = if (mustCond || rnd.nextBoolean()) {
          val (sql, f) = matchedConds(rnd.nextInt(matchedConds.length))
          (Some(sql), f)
        } else (None, (_: R, _: R) => true)
        val (setSql, set) =
          if (isDelete) ("", (t: R, _: R) => t)
          else updateSets(rnd.nextInt(updateSets.length))
        MAct(isDelete, c._1, c._2, set, setSql)
      }
      // 0–2 matched actions, ≤1 update ≤1 delete, random order; a non-final
      // action gets a condition so the second is reachable
      val matched: Seq[MAct] = rnd.nextInt(4) match {
        case 0 => Seq.empty
        case 1 => Seq(pickMatched(isDelete = false, mustCond = false))
        case 2 => Seq(pickMatched(isDelete = true, mustCond = false))
        case _ =>
          val first = rnd.nextBoolean()
          Seq(pickMatched(first, mustCond = true),
            pickMatched(!first, mustCond = false))
      }
      // Spark requires every NOT-MATCHED branch but the LAST to be conditional
      val nInserts = rnd.nextInt(3)
      val inserts: Seq[(Option[(String, R => Boolean)], (String, R => R))] =
        (0 until nInserts).map { i =>
          val cond =
            if (i < nInserts - 1 || rnd.nextBoolean())
              Some(srcOnlyConds(rnd.nextInt(srcOnlyConds.length)))
            else None
          (cond, insertSets(rnd.nextInt(insertSets.length)))
        }
      val nmbs: Seq[(Boolean, Option[(String, R => Boolean)], (String, R => R))] =
        rnd.nextInt(3) match {
          case 0 => Seq.empty
          case 1 =>
            val del = rnd.nextBoolean()
            Seq((del, Some(tgtOnlyConds(rnd.nextInt(tgtOnlyConds.length))),
              nmbsSets(rnd.nextInt(nmbsSets.length))))
          case _ => Seq(
            (true, Some(tgtOnlyConds(rnd.nextInt(tgtOnlyConds.length))),
              nmbsSets(0)),
            (false, None, nmbsSets(rnd.nextInt(nmbsSets.length))))
        }
      if (matched.isEmpty && inserts.isEmpty && nmbs.isEmpty) () // no-op trial
      else {
        // ---- build the table + source view ----
        val tbl = s"gmp.t.mp$trial"
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        spark.sql(s"CREATE TABLE $tbl (id BIGINT, a BIGINT, b STRING)")
        if (target.nonEmpty)
          spark.sql(s"INSERT INTO $tbl VALUES " + target.map(t =>
            s"(${t.id}, ${t.a}, ${lit(t.b)})").mkString(", "))
        source.map(s => (s.id, s.a, s.b.orNull))
          .toDF("id", "a", "b").createOrReplaceTempView(s"mp_src$trial")

        val mSql = matched.map { act =>
          val andC = act.condSql.map(c => s"AND $c ").getOrElse("")
          if (act.isDelete) s"WHEN MATCHED ${andC}THEN DELETE"
          else s"WHEN MATCHED ${andC}THEN UPDATE SET ${act.setSql}"
        }
        val iSql = inserts.map { case (cond, (vals, _)) =>
          val andC = cond.map { case (c, _) => s"AND $c " }.getOrElse("")
          s"WHEN NOT MATCHED ${andC}THEN INSERT $vals"
        }
        val nSql = nmbs.map { case (del, cond, (set, _)) =>
          val andC = cond.map { case (c, _) => s"AND $c " }.getOrElse("")
          if (del) s"WHEN NOT MATCHED BY SOURCE ${andC}THEN DELETE"
          else s"WHEN NOT MATCHED BY SOURCE ${andC}THEN UPDATE SET $set"
        }
        val stmt = s"MERGE INTO $tbl t USING mp_src$trial s ON t.id = s.id\n" +
          (mSql ++ iSql ++ nSql).mkString("\n")
        spark.sql(stmt)

        // ---- the independent model ----
        val srcById = source.map(s => s.id -> s).toMap
        val tgtIds = target.map(_.id).toSet
        val kept = target.flatMap { t =>
          srcById.get(t.id) match {
            case Some(s) => // matched: first action whose condition holds
              matched.find(_.cond(t, s)) match {
                case Some(act) if act.isDelete => None
                case Some(act) => Some(act.set(t, s))
                case None => Some(t)
              }
            case None => // not matched by source
              nmbs.find { case (_, cond, _) => cond.forall(_._2(t)) } match {
                case Some((true, _, _)) => None
                case Some((false, _, (_, f))) => Some(f(t))
                case None => Some(t)
              }
          }
        }
        val inserted = source.filterNot(s => tgtIds.contains(s.id)).flatMap { s =>
          inserts.find { case (cond, _) => cond.forall(_._2(s)) }
            .map { case (_, (_, f)) => f(s) }
        }
        val expected = (kept ++ inserted).sortBy(r => (r.id, r.a, r.b))

        val actual = spark.sql(s"SELECT id, a, b FROM $tbl").collect()
          .map(r => R(r.getLong(0), r.getLong(1), Option(r.getString(2))))
          .toSeq.sortBy(r => (r.id, r.a, r.b))
        assert(actual === expected,
          s"\ntrial $trial diverged\nstatement:\n$stmt\n" +
            s"target=$target\nsource=$source")
      }
    }
  }
}
