package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 oracle-health regression guards (the Round16Spec q455
  * precedent): the per-oracle wall budget caught two pathological DuckDB
  * plans this round — q358's recursive CTE re-joining the event census
  * every iteration (10.0 s at sf0.01 under load) and q405's un-
  * materialized split relations re-inlined per reference (7.5 s at both
  * scales). Both fixes are textual properties of the oracle SQL, so they
  * are guarded textually: a refactor that drops a MATERIALIZED marker or
  * reintroduces the recursion fails here, not in a zeroed driver gate.
  * (Spec series numbering ≠ build rounds — see RoundNSpec note.)
  */
class Round17Spec extends AnyFunSuite {

  test("q405's multiply-referenced CTEs stay MATERIALIZED") {
    val sql = SparkEntry.oracleSql("q405_cart_tree")
    for (c <- Seq("o", "ol", "orr", "r_best", "l_best", "x_best"))
      assert(sql.contains(s"$c AS MATERIALIZED"),
        s"q405 CTE $c not materialized — 7.5 s → 0.07 s fix regressed")
  }

  test("q358's replay oracle stays a list_reduce fold, not a per-event recursion") {
    val sql = SparkEntry.oracleSql("q358_bandit_replay")
    assert(sql.contains("list_reduce"), "q358 lost its fold form")
    assert(sql.contains("list_prepend"), "q358 lost its zero-state init")
    assert(!sql.contains("RECURSIVE"),
      "q358 reintroduced the per-event recursive CTE (10 s-budget class)")
  }

  test("the shared LSH CTE chain keeps its multi-referenced members MATERIALIZED") {
    // s is referenced by sig AND ss; sig by every band select; bands by
    // its self-join; ss by both sides of the verify join — q198 measured
    // the un-materialized form at 3.5 s before the fix
    val sql = SparkEntry.oracleSql("q37_lsh_near_dup_pairs")
    for (c <- Seq("s", "sig", "bands", "ss"))
      assert(sql.contains(s"$c AS MATERIALIZED"),
        s"LshPairsSql CTE $c not materialized")
    // the streaming twin shares q474's oracle VERBATIM — a drift between
    // them would silently weaken q476's streamed ≡ batch claim
    assert(SparkEntry.oracleSql("q474_quality_survivors") ==
      SparkEntry.oracleSql("q476_stream_survivors"),
      "q474/q476 oracles diverged — the twins must share one text")
  }
}
