package graft

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz over the column-DDL surface: random sequences of
  * SET/DROP DEFAULT, RENAME, ADD/DROP COLUMN, and column-subset INSERTs are
  * replayed against a driver-side model, and the final table must match the
  * model exactly. This is the class of interplay where round 9's real bug
  * lived (analyzer default metadata leaking into footers and resurrecting a
  * dropped default under mergeSchema nondeterminism) — a model-based replay
  * catches that family wholesale instead of one example at a time.
  */
class DdlFuzzSpec extends AnyFunSuite with SharedSpark {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_ddlfuzz").toString
    spark.conf.set("spark.sql.catalog.gfuzz",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfuzz.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfuzz.t")
    dir
  }

  /** One modeled table: a fixed BIGINT key plus string columns that DDL
    * reshapes. Rows are stored as (key, colName -> value) with CURRENT names.
    */
  private final class Model {
    var cols: Vector[String] = Vector("c1", "c2") // string columns, in order
    var defaults: Map[String, String] = Map.empty // col -> literal value
    var rows: Vector[(Long, Map[String, String])] = Vector.empty
    var nextKey: Long = 0L
    var nextCol: Int = 3

    def insert(listed: Seq[String], values: Map[String, String]): Unit = {
      val k = nextKey; nextKey += 1
      rows :+= (k -> cols.map { c =>
        c -> (if (listed.contains(c)) values(c)
              else defaults.getOrElse(c, null))
      }.toMap)
    }
    def rename(from: String, to: String): Unit = {
      cols = cols.map(c => if (c == from) to else c)
      defaults = defaults.map { case (c, v) => (if (c == from) to else c) -> v }
      rows = rows.map { case (k, m) =>
        k -> m.map { case (c, v) => (if (c == from) to else c) -> v } }
    }
    def add(): String = {
      val c = s"c$nextCol"; nextCol += 1
      cols :+= c
      rows = rows.map { case (k, m) => k -> (m + (c -> null)) }
      c
    }
    def drop(c: String): Unit = {
      cols = cols.filterNot(_ == c)
      defaults -= c
      rows = rows.map { case (k, m) => k -> (m - c) }
    }
    def expected: Set[String] =
      rows.map { case (k, m) =>
        (k.toString +: cols.map(c => String.valueOf(m(c)))).mkString("|")
      }.toSet
  }

  private def run(seed: Int): Unit = {
    val rnd = new Random(seed)
    val t = s"f$seed"
    val m = new Model
    spark.sql(s"DROP TABLE IF EXISTS gfuzz.t.$t")
    spark.sql(s"CREATE TABLE gfuzz.t.$t (k BIGINT, c1 STRING, c2 STRING)")
    var step = 0
    def lit(s: String) = s"'$s'"
    (1 to 14).foreach { _ =>
      step += 1
      rnd.nextInt(10) match {
        case 0 | 1 if m.cols.nonEmpty => // SET DEFAULT
          val c = m.cols(rnd.nextInt(m.cols.size))
          val v = s"d${seed}_$step"
          spark.sql(s"ALTER TABLE gfuzz.t.$t ALTER COLUMN $c SET DEFAULT ${lit(v)}")
          m.defaults += c -> v
        case 2 if m.defaults.nonEmpty => // DROP DEFAULT
          val c = m.defaults.keys.toSeq(rnd.nextInt(m.defaults.size))
          spark.sql(s"ALTER TABLE gfuzz.t.$t ALTER COLUMN $c DROP DEFAULT")
          m.defaults -= c
        case 3 if m.cols.nonEmpty => // RENAME
          val c = m.cols(rnd.nextInt(m.cols.size))
          val to = s"r${seed}_$step"
          spark.sql(s"ALTER TABLE gfuzz.t.$t RENAME COLUMN $c TO $to")
          m.rename(c, to)
        case 4 => // ADD COLUMN
          val c = m.add()
          spark.sql(s"ALTER TABLE gfuzz.t.$t ADD COLUMN $c STRING")
        case 5 if m.cols.size > 1 && rnd.nextBoolean() => // DROP COLUMN
          val c = m.cols(rnd.nextInt(m.cols.size))
          spark.sql(s"ALTER TABLE gfuzz.t.$t DROP COLUMN $c")
          m.drop(c)
        case _ => // INSERT a random column subset (k always listed)
          val listed = m.cols.filter(_ => rnd.nextBoolean())
          val values = listed.map(c => c -> s"v${seed}_${step}_$c").toMap
          val colList = ("k" +: listed).mkString(", ")
          val valList = (s"${m.nextKey}" +: listed.map(c => lit(values(c))))
            .mkString(", ")
          spark.sql(s"INSERT INTO gfuzz.t.$t ($colList) VALUES ($valList)")
          m.insert(listed, values)
      }
    }
    val got = spark.table(s"gfuzz.t.$t")
      .selectExpr(("k" +: m.cols).map(c => s"CAST($c AS STRING)"): _*)
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(got == m.expected,
      s"seed $seed diverged:\n missing=${m.expected -- got}\n extra=${got -- m.expected}")
  }

  test("random DDL + insert sequences match the model (6 seeded runs)") {
    wh
    (1 to 6).foreach(run)
  }
}
