package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-11 guards: the Bradley–Terry MM fit (q455) — win-count-order
  * invariant on balanced schedules (Ford 1957: on a connected balanced
  * design the BT MLE ranking agrees with win totals) plus the e6
  * renormalization contract.
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Bradley-Terry reproduces win-count order on balanced schedules") {
    import spark.implicits._
    import graft.operators.BradleyTerry
    // Balanced: every pair of 4 players plays exactly 2 matches; outcomes
    // come from the salted hash so each case is deterministic.
    val pairs = for {
      i <- 0 until 4; j <- (i + 1) until 4; r <- 0 until 2
    } yield (i.toLong, j.toLong, r)
    for (seed <- 1 to 6) {
      val matches = pairs.zipWithIndex.map { case ((a, b, _), idx) =>
        val h = graft.functions.Hashes.mulHashLong(idx.toLong, seed.toLong)
        (a, b, if (h % 2 == 0) 1L else 0L)
      }
      val out = BradleyTerry.fit(spark, matches.toDF("pa", "pb", "awin"),
          spark.range(4).toDF("player"), nPlayers = 4, rounds = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      for ((pi, wi, si) <- out; (pj, wj, sj) <- out if wi > wj)
        assert(si > sj,
          s"seed=$seed: player $pi (w=$wi, s=$si) must outrank" +
            s" $pj (w=$wj, s=$sj)")
      // renormalize contract: Σ strengths ∈ (target − players, target]
      val tot = out.map(_._3).sum
      assert(tot <= 4000000L && tot > 4000000L - 4, s"seed=$seed: tot=$tot")
      assert(out.forall(_._3 >= 1L))
    }
  }

  test("Bradley-Terry strengths are match-order independent") {
    import spark.implicits._
    import graft.operators.BradleyTerry
    // ELO (q453) is path-dependent; BT must not be: reversing the match
    // log leaves every strength bit-identical.
    val log = (0 until 30).map { m =>
      val pa = (graft.functions.Hashes.mulHashLong(m.toLong, 3) % 5).toInt
      val pb = ((pa + 1 + graft.functions.Hashes.mulHashLong(m.toLong, 5) % 4) % 5).toInt
      (pa.toLong, pb.toLong,
        if (graft.functions.Hashes.mulHashLong(m.toLong, 7) % 2 == 0) 1L
        else 0L)
    }
    def strengths(ms: Seq[(Long, Long, Long)]) =
      BradleyTerry.fit(spark, ms.toDF("pa", "pb", "awin"),
          spark.range(5).toDF("player"), nPlayers = 5, rounds = 6)
        .orderBy("player").collect().map(_.getLong(2)).toSeq
    assert(strengths(log) == strengths(log.reverse))
  }
}
