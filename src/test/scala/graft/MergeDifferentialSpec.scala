package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine._

/** Differential test for MERGE: for a set of seeded random scenarios,
  * the engine's result must equal a plain-Scala reference
  * implementation of SQL MERGE semantics (ordered clauses,
  * first-TRUE-wins, update/delete/insert, NULL-safe conditions) — on
  * both copy-on-write and merge-on-read, with multiple data files.
  * Seeds are fixed: failures reproduce.
  */
class MergeDifferentialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-mdiff").toString

  /** Reference MERGE over plain collections. Clause conditions:
    * matched-update applies when (v + sv) % 3 == cm, matched-delete
    * when sv % 3 == cd; insert when sv % 2 == ci. Update sets
    * v = v + sv. A key matching in both tables is "matched".
    */
  private def referenceMerge(target: Map[Long, Int], source: Map[Long, Int],
      cm: Int, cd: Int, ci: Int): Map[Long, Int] = {
    val kept = target.flatMap { case (k, v) =>
      source.get(k) match {
        case None => Some(k -> v) // unmatched target rows survive
        case Some(sv) =>
          if (math.floorMod(v + sv, 3) == cm) Some(k -> (v + sv)) // update
          else if (math.floorMod(sv, 3) == cd) None               // delete
          else Some(k -> v)                                       // no clause
      }
    }
    val inserted = source.collect {
      case (k, sv) if !target.contains(k) && math.floorMod(sv, 2) == ci =>
        k -> sv
    }
    kept ++ inserted
  }

  private def runScenario(seed: Int, mode: String): Unit = {
    val rnd = new scala.util.Random(seed)
    val target = (0 until 60).map(_ =>
      rnd.nextInt(80).toLong -> rnd.nextInt(100)).toMap
    val source = (0 until 40).map(_ =>
      rnd.nextInt(120).toLong -> rnd.nextInt(100)).toMap
    val (cm, cd, ci) = (rnd.nextInt(3), rnd.nextInt(3), rnd.nextInt(2))
    val expected = referenceMerge(target, source, cm, cd, ci)

    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), s"mdiff$seed",
      Seq("id" -> "long", "v" -> "int"),
      properties = Map("write.merge.mode" -> mode))
    // several files so CoW's touched-file granularity is exercised
    target.toSeq.grouped(20).foreach(g =>
      t.append(g.toDF("id", "v").coalesce(1)))
    val src = source.toSeq.toDF("sid", "sv")
    t.merge(src, col("id") === col("sid"),
      matched = Seq(
        MergeUpdateClause(Some(pmod(col("v") + col("sv"), lit(3)) === cm),
          Map("v" -> (col("v") + col("sv")))),
        MergeDeleteClause(Some(pmod(col("sv"), lit(3)) === cd))),
      notMatched = Seq(
        MergeInsertValuesClause(Some(pmod(col("sv"), lit(2)) === ci),
          Map("id" -> col("sid"), "v" -> col("sv")))))
    val rows = t.read().as[(Long, Int)].collect()
    // cardinality first: toMap would silently swallow duplicate keys —
    // the classic CoW re-emit bug this spec exists to catch
    assert(rows.length == expected.size,
      s"seed=$seed mode=$mode: ${rows.length} rows, expected ${expected.size}")
    val got = rows.toMap
    assert(got == expected,
      s"seed=$seed mode=$mode cm=$cm cd=$cd ci=$ci\n" +
        s"missing=${(expected.toSet -- got.toSet).toSeq.sortBy(_._1)}\n" +
        s"extra=${(got.toSet -- expected.toSet).toSeq.sortBy(_._1)}")
  }

  test("MERGE equals the reference semantics across seeded scenarios (CoW)") {
    (1 to 6).foreach(runScenario(_, "copy-on-write"))
  }

  test("MERGE equals the reference semantics across seeded scenarios (MoR)") {
    (7 to 12).foreach(runScenario(_, "merge-on-read"))
  }
}
