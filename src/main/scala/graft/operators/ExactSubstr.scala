package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** Exact-substring duplicate detection — the ExactSubstr posture of Lee et
  * al. 2021 (arXiv:2107.06499 §4.1): every maximal EXACT token-level repeat
  * of length ≥ L shared by two documents, cross-document, unanchored at any
  * window grid. This is the primitive the shingle families approximate:
  * [[DupSpans]] marks positions whose fixed-width window duplicates
  * SOMEWHERE (per-doc coverage), winnowing samples fingerprints — neither
  * names the actual repeated span between an actual PAIR of documents, which
  * is what a dedup audit or a scrub-list builder consumes.
  *
  * Suffix-array-free distributed formulation (the suffix array is the
  * single-node tool; this is the bucketed equivalent):
  *
  *   1. ANCHOR CENSUS — every L-token window anchors a position. Round
  *      10 moved the census keys to the 8-byte FOLD HASH
  *      ([[DupSpans.shingleHashes]]) — fixed-width shuffle keys whatever
  *      L is (vs shuffling the corpus ~L× over as window strings at
  *      100 TB) — with the literal windows re-verified after the pair
  *      join (step 3), so false anchors from hash collisions never
  *      survive. Any repeat of length ≥ L contains at least one full
  *      L-window, so anchors lose nothing.
  *   2. BUCKET-CAPPED PAIRS — windows sharing a hash pair up inside their
  *      census bucket, buckets over `cap` docs dropped as boilerplate
  *      (the MinHash census-cap argument verbatim: a bucket of B anchors
  *      would emit B²/2 pairs on one reducer; true long repeats survive
  *      through their other, less common anchors).
  *   3. EXACT RE-VERIFY + BIDIRECTIONAL EXTENSION — each candidate pair
  *      joins both token arrays, REJECTS hash-collision anchors by
  *      comparing the literal L-token windows (row-local slice equality),
  *      then extends left/right while tokens match. Every surviving
  *      anchor inside the same repeat extends to the SAME maximal
  *      (start_a, start_b, len) tuple, so a plain distinct de-anchors the
  *      result — maximality needs no neighbor comparison.
  *   4. RUN-HEAD DEDUP (between verify and extension) — a repeat of
  *      length R anchors at every one of its ~R−L+1 windows, and each
  *      anchor would re-run the O(flank) extension before distinct
  *      collapses them. Verified anchors of one repeat form CONSECUTIVE
  *      positions on their (doc_a, doc_b, pa−pb) diagonal, so only each
  *      consecutive run's HEAD (no verified predecessor at pa−1,pb−1)
  *      extends — exact, because a verified predecessor means the
  *      predecessor window matches too, i.e. same contiguous region,
  *      same maximal tuple. Runs split by cap-censored or collision-
  *      rejected anchors just contribute an extra head each, collapsed
  *      by the final distinct; disjoint repeats sharing a diagonal keep
  *      separate heads (a min-per-diagonal shortcut would merge them —
  *      wrong). The dedup shuffles only skinny (ids, positions) rows;
  *      token arrays are re-joined for the head set alone, which is
  *      one-row-per-repeat-run sized.
  *
  * Scale shape: one token explode with 8-byte census keys, one capped
  * equi-join, two doc_id equi-joins to verify the (candidate-sized, not
  * corpus-sized) pair set, a skinny run-head window, two more joins to
  * fetch arrays for the head set, then row-local extension once per run.
  * Nothing is ever all-pairs.
  */
object ExactSubstr {

  /** Maximal cross-document exact repeats of ≥ `minLen` tokens.
    * Output: (doc_a, doc_b, start_a, start_b, len_tokens, fp) — 1-based
    * token offsets, fp = the matched span's rolling content hash.
    */
  def maximalRepeats(docs: DataFrame, key: Column, tokens: Column,
                     minLen: Int, cap: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val L = minLen
    val t = docs.select(key.as("doc_id"), tokens.as("toks"))
    val w = t.select(col("doc_id"),
        posexplode(DupSpans.shingleHashes(col("toks"), L)))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("wh"))
    val cen = w.groupBy("wh").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2 && col("c") <= cap)
      .select("wh")
    val wd = w.join(cen, "wh")
    val pairs = wd.as("a")
      .join(wd.as("b"),
        col("a.wh") === col("b.wh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.p").as("pa"),
        col("b.doc_id").as("doc_b"), col("b.p").as("pb"))
    val ta = t.select(col("doc_id").as("doc_a"), col("toks").as("ta"))
    val tb = t.select(col("doc_id").as("doc_b"), col("toks").as("tb"))
    val verified = pairs
      .join(ta, "doc_a").join(tb, "doc_b")
      // exact anchor re-verify: a hash-collision candidate whose literal
      // windows differ is rejected here, which is what makes the 8-byte
      // census keys sound
      .where(expr(s"slice(ta, pa, $L)") === expr(s"slice(tb, pb, $L)"))
      .select("doc_a", "doc_b", "pa", "pb")
    // run-head dedup (scaladoc step 4): extend once per consecutive
    // verified-anchor run on each (doc pair, diagonal) — skinny rows only
    val heads = verified
      .withColumn("prev", lag("pa", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_a"), col("doc_b"), col("pa") - col("pb"))
          .orderBy("pa")))
      .where(col("prev").isNull || col("prev") =!= col("pa") - 1)
      .select("doc_a", "doc_b", "pa", "pb")
    val withToks = heads.join(ta, "doc_a").join(tb, "doc_b")
    // extension: first-mismatch index over the zipped flanks; zip_with pads
    // the shorter flank with null → coalesce(…, false) stops at a document
    // boundary (both engines pad the same way). array_position returns 0
    // when every zipped element matches — then the whole flank extends.
    def firstRun(eq: Column): Column =
      when(array_position(eq, false) === 0, size(eq).cast("long"))
        .otherwise(array_position(eq, false) - 1)
    withToks
      .withColumn("eql", zip_with(
        reverse(expr("slice(ta, 1, pa - 1)")),
        reverse(expr("slice(tb, 1, pb - 1)")),
        (x, y) => coalesce(x === y, lit(false))))
      .withColumn("eqr", zip_with(
        expr(s"slice(ta, pa + $L, size(ta))"),
        expr(s"slice(tb, pb + $L, size(tb))"),
        (x, y) => coalesce(x === y, lit(false))))
      .withColumn("l", firstRun(col("eql")))
      .withColumn("r", firstRun(col("eqr")))
      .select(col("doc_a"), col("doc_b"),
        (col("pa") - col("l")).as("start_a"),
        (col("pb") - col("l")).as("start_b"),
        (col("l") + L + col("r")).as("len_tokens"),
        Hashes.tokenRollingHash(expr(
          s"slice(ta, cast(pa - l as int), cast(l + $L + r as int))"))
          .as("fp"))
      .distinct()
  }

  /** Cross-relation [[maximalRepeats]] — the PROBE side (an arriving batch)
    * against the CORPUS side (the accumulated store): corpus windows are
    * censused and capped, probe windows join them, extension runs pair-
    * locally exactly as in the self-join form. This is the exact-substring
    * INGEST GATE posture (the MinHash gate's exact counterpart —
    * [[graft.streaming.DocStreams.nearDupGate]] admits by estimated
    * Jaccard; this rejects on any shared verbatim run ≥ minLen, the
    * contamination-grade contract). Returns
    * (probe_id, corpus_id, start_p, start_c, len_tokens, fp).
    */
  def crossMaximalRepeats(probe: DataFrame, corpus: DataFrame, key: Column,
                          tokens: Column, minLen: Int, cap: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val L = minLen
    def windows(docs: DataFrame, side: String) = {
      val t = docs.select(key.as(s"${side}_id"), tokens.as(s"t$side"))
      (t, t.select(col(s"${side}_id"),
          posexplode(DupSpans.shingleHashes(col(s"t$side"), L)))
        .select(col(s"${side}_id"), (col("pos") + 1).as(s"p$side"),
          col("col").as("wh")))
    }
    val (tp, wp) = windows(probe, "probe")
    val (tc, wc) = windows(corpus, "corpus")
    // cap the CORPUS buckets (the stored side a boilerplate window floods);
    // a probe window matching an over-capped corpus window is censored —
    // the MinHash capped-bucket argument verbatim. Keys are the 8-byte
    // fold hashes; the literal windows are re-verified after the join.
    val cen = wc.groupBy("wh").agg(count(lit(1)).as("c"))
      .where(col("c") <= cap).select("wh")
    val pairs = wp.join(wc.join(cen, "wh"), "wh")
      .select("probe_id", "pprobe", "corpus_id", "pcorpus")
    def firstRun(eq: Column): Column =
      when(array_position(eq, false) === 0, size(eq).cast("long"))
        .otherwise(array_position(eq, false) - 1)
    val verified = pairs
      .join(tp, "probe_id").join(tc, "corpus_id")
      .where(expr(s"slice(tprobe, pprobe, $L)") ===
        expr(s"slice(tcorpus, pcorpus, $L)"))
      .select("probe_id", "corpus_id", "pprobe", "pcorpus")
    // run-head dedup (scaladoc step 4), cross-relation form
    val heads = verified
      .withColumn("prev", lag("pprobe", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"), col("corpus_id"),
            col("pprobe") - col("pcorpus"))
          .orderBy("pprobe")))
      .where(col("prev").isNull || col("prev") =!= col("pprobe") - 1)
      .select("probe_id", "corpus_id", "pprobe", "pcorpus")
    heads
      .join(tp, "probe_id").join(tc, "corpus_id")
      .withColumn("eql", zip_with(
        reverse(expr("slice(tprobe, 1, pprobe - 1)")),
        reverse(expr("slice(tcorpus, 1, pcorpus - 1)")),
        (x, y) => coalesce(x === y, lit(false))))
      .withColumn("eqr", zip_with(
        expr(s"slice(tprobe, pprobe + $L, size(tprobe))"),
        expr(s"slice(tcorpus, pcorpus + $L, size(tcorpus))"),
        (x, y) => coalesce(x === y, lit(false))))
      .withColumn("l", firstRun(col("eql")))
      .withColumn("r", firstRun(col("eqr")))
      .select(col("probe_id"), col("corpus_id"),
        (col("pprobe") - col("l")).as("start_p"),
        (col("pcorpus") - col("l")).as("start_c"),
        (col("l") + L + col("r")).as("len_tokens"),
        Hashes.tokenRollingHash(expr(
          s"slice(tprobe, cast(pprobe - l as int), cast(l + $L + r as int))"))
          .as("fp"))
      .distinct()
  }

  /** SCRUB — the consumer that turns [[maximalRepeats]] into Lee et al.'s
    * actual dedup transform: for every reported repeat the doc_a copy
    * (lowest id) is kept and the doc_b span is CUT; overlapping spans
    * union per token position. Returns (doc_id, toks, ktoks) — original
    * and scrubbed token arrays for every document (untouched docs pass
    * through with ktoks = toks).
    *
    * Shape: the repeat relation's doc_b spans collect to a per-doc cut
    * list (repeats-per-doc sized — a statistic, not the corpus), ONE
    * doc_id left join against the corpus, then the position filter runs
    * row-locally as HOF expressions. No corpus explode, no range join.
    */
  def scrub(docs: DataFrame, key: Column, tokens: Column,
            minLen: Int, cap: Int): DataFrame = {
    val t = docs.select(key.as("doc_id"), tokens.as("toks"))
    val cuts = maximalRepeats(docs, key, tokens, minLen, cap)
      .select(col("doc_b").as("doc_id"),
        struct(col("start_b").as("s"),
          (col("start_b") + col("len_tokens")).as("e")).as("cut"))
      .groupBy("doc_id").agg(collect_list("cut").as("cuts"))
    val posToks = transform(col("toks"),
      (tok, i) => struct((i + 1).cast("long").as("p"), tok.as("tok")))
    val keptToks = transform(
      filter(posToks, st => !exists(col("cuts"),
        c => st.getField("p") >= c.getField("s")
          && st.getField("p") < c.getField("e"))),
      st => st.getField("tok"))
    t.join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        when(col("cuts").isNull, col("toks")).otherwise(keptToks)
          .as("ktoks"))
  }

  /** DuckDB CTE chain of [[crossMaximalRepeats]] over `documents` split by
    * `probePred` / `corpusPred` — ends at `xmr(probe_id, corpus_id,
    * start_p, start_c, len_tokens, fp)`.
    */
  def crossMaximalRepeatsSql(toksExpr: String, probePred: String,
                             corpusPred: String, minLen: Int,
                             cap: Int): String = {
    val L = minLen
    s"""tp AS (SELECT doc_id AS probe_id, $toksExpr AS tprobe
       |       FROM documents WHERE $probePred),
       |tc AS (SELECT doc_id AS corpus_id, $toksExpr AS tcorpus
       |       FROM documents WHERE $corpusPred),
       |wp AS (SELECT probe_id, u.i AS pp, shp[u.i] AS wh
       |       FROM (SELECT probe_id,
       |               ${DupSpans.shingleHashesSql("tprobe", L)} AS shp
       |             FROM tp) sp,
       |            unnest(range(1, len(shp) + 1)) AS u(i)),
       |wc AS (SELECT corpus_id, u.i AS pc, shc[u.i] AS wh
       |       FROM (SELECT corpus_id,
       |               ${DupSpans.shingleHashesSql("tcorpus", L)} AS shc
       |             FROM tc) sc,
       |            unnest(range(1, len(shc) + 1)) AS u(i)),
       |ccen AS (SELECT wh FROM wc GROUP BY wh
       |         HAVING count(*) <= $cap),
       |xpr AS (SELECT wp.probe_id, wp.pp, wc.corpus_id, wc.pc
       |        FROM wp JOIN ccen USING (wh) JOIN wc USING (wh)),
       |xwt AS (SELECT xpr.*, tp.tprobe, tc.tcorpus
       |        FROM xpr JOIN tp USING (probe_id) JOIN tc USING (corpus_id)
       |        WHERE tp.tprobe[xpr.pp:xpr.pp + ${L - 1}]
       |            = tc.tcorpus[xpr.pc:xpr.pc + ${L - 1}]),
       |xex AS (SELECT probe_id, corpus_id, pp, pc, tprobe,
       |  list_transform(list_zip(list_reverse(tprobe[1:pp - 1]),
       |                          list_reverse(tcorpus[1:pc - 1])),
       |                 q -> coalesce(q[1] = q[2], false)) AS eql,
       |  list_transform(list_zip(tprobe[pp + $L:], tcorpus[pc + $L:]),
       |                 q -> coalesce(q[1] = q[2], false)) AS eqr
       |  FROM xwt),
       |xlr AS (SELECT probe_id, corpus_id, pp, pc, tprobe,
       |  CASE WHEN list_position(eql, false) = 0 THEN len(eql)
       |       ELSE list_position(eql, false) - 1 END AS l,
       |  CASE WHEN list_position(eqr, false) = 0 THEN len(eqr)
       |       ELSE list_position(eqr, false) - 1 END AS r
       |  FROM xex),
       |xmr AS (SELECT DISTINCT probe_id, corpus_id,
       |  CAST(pp - l AS BIGINT) AS start_p,
       |  CAST(pc - l AS BIGINT) AS start_c,
       |  CAST(l + $L + r AS BIGINT) AS len_tokens,
       |  ${Hashes.tokenRollingHashSql(
            s"tprobe[pp - l:pp - l + l + $L + r - 1]")} AS fp
       |  FROM xlr)""".stripMargin
  }

  /** DuckDB oracle of [[maximalRepeats]] — the same census → capped pairs →
    * extension arithmetic (list_zip pads with NULL, list_position returns 0
    * on no-match, both matching Spark).
    */
  def maximalRepeatsSql(toksExpr: String, minLen: Int, cap: Int): String = {
    val L = minLen
    s"""t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
       |w AS (SELECT doc_id, u.i AS p, sh[u.i] AS wh
       |      FROM (SELECT doc_id,
       |              ${DupSpans.shingleHashesSql("toks", L)} AS sh
       |            FROM t) s,
       |           unnest(range(1, len(sh) + 1)) AS u(i)),
       |cen AS (SELECT wh FROM w GROUP BY wh
       |        HAVING count(*) >= 2 AND count(*) <= $cap),
       |pr AS (SELECT a.doc_id AS doc_a, a.p AS pa,
       |              b.doc_id AS doc_b, b.p AS pb
       |       FROM w a JOIN cen USING (wh) JOIN w b USING (wh)
       |       WHERE a.doc_id < b.doc_id),
       |wt AS (SELECT pr.*, x.toks AS ta, y.toks AS tb
       |       FROM pr JOIN t x ON x.doc_id = pr.doc_a
       |               JOIN t y ON y.doc_id = pr.doc_b
       |       WHERE x.toks[pr.pa:pr.pa + ${L - 1}]
       |           = y.toks[pr.pb:pr.pb + ${L - 1}]),
       |ex AS (SELECT doc_a, doc_b, pa, pb, ta,
       |  list_transform(list_zip(list_reverse(ta[1:pa - 1]),
       |                          list_reverse(tb[1:pb - 1])),
       |                 q -> coalesce(q[1] = q[2], false)) AS eql,
       |  list_transform(list_zip(ta[pa + $L:], tb[pb + $L:]),
       |                 q -> coalesce(q[1] = q[2], false)) AS eqr
       |  FROM wt),
       |lr AS (SELECT doc_a, doc_b, pa, pb, ta,
       |  CASE WHEN list_position(eql, false) = 0 THEN len(eql)
       |       ELSE list_position(eql, false) - 1 END AS l,
       |  CASE WHEN list_position(eqr, false) = 0 THEN len(eqr)
       |       ELSE list_position(eqr, false) - 1 END AS r
       |  FROM ex),
       |mr AS (SELECT DISTINCT doc_a, doc_b,
       |  CAST(pa - l AS BIGINT) AS start_a,
       |  CAST(pb - l AS BIGINT) AS start_b,
       |  CAST(l + $L + r AS BIGINT) AS len_tokens,
       |  ${Hashes.tokenRollingHashSql(s"ta[pa - l:pa - l + l + $L + r - 1]")}
       |    AS fp
       |  FROM lr)""".stripMargin
  }
}
