package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, Tensors}

/** Scale-safe k-NN graph construction for graph-based ANN (the build stage
  * of the NSW/HNSW family — Malkov & Yashunin, arXiv:1603.09320): candidate
  * edges come from sign-LSH band buckets (Charikar 2002 random-hyperplane
  * signatures), NEVER an all-pairs self-join, then each node keeps its
  * top-`deg` candidates by exact cosine.
  *
  * Shape: `bands` bands of `rbits` sign bits each; two vectors become an
  * edge CANDIDATE iff they agree on all bits of at least one band (an
  * equi-join on (band, signature)). P[single bit agrees] = 1 − θ/π for
  * angle θ, so a cos≈0.9 neighbor pair collides per band with ~p^rbits ≈
  * 0.85^6 ≈ 0.38 and across 12 bands with ~99.7% — near neighbors almost
  * surely become candidates while far pairs almost never do. Expected
  * candidate work per vector is bands × bucket-population; a hot bucket is
  * capped exactly like [[SemDedup]] cells: census per (band, sig), buckets
  * above `cap` split into ⌈size/cap⌉ hash sub-cells, pairwise work bounded
  * at ~cap²/2 per task with sub-cells landing on different tasks. At 100 TB
  * the knob is `rbits` (bucket population ~ n/2^rbits — grow rbits with
  * log n to hold the population constant) plus the cap as the skew
  * backstop; the declared price is the same as the LSH dedup cap — a pair
  * split across sub-cells of an over-capped bucket is not compared, and a
  * true neighbor that never shares a band (1 − p^rbits)^bands is missed.
  * Those misses cost graph QUALITY (recall is measured, not assumed —
  * q266), never correctness of the build contract.
  *
  * Determinism (the oracle replays every stage): hyperplane cells are ±1
  * Rademacher signs from the engine's salted multiplicative hash (the
  * [[RandomProjection]] posture — no RNG stream, any cell recomputable in
  * integer SQL); projections fold ascending-d from 0.0 in double; the sign
  * bit is `proj >= 0`; band signatures are integer bit-sums; cosines rank
  * on the 1e-6 round grid with id tie-break.
  */
object NswGraph {

  /** Salt for the over-cap sub-cell split (statable in the oracle). */
  val SubSalt = 93L

  /** Symmetrize a directed edge list — NSW links are undirected (Malkov &
    * Yashunin §4): a node must be reachable from ITS OWN neighbors, which
    * directed top-k edges don't guarantee.
    */
  def undirected(g: DataFrame): DataFrame =
    g.unionByName(g.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()

  /** Per-(vector, band) integer signatures: (vec_id, band, sig). One
    * codegen'd [[graft.functions.VectorExprs.LshBandSigsExpr]] pass per
    * row — no per-plane lambda dispatch, no explode+groupBy exchange.
    */
  def signatures(emb: DataFrame, idCol: String, embCol: String, dim: Int,
                 bands: Int, rbits: Int, seed: Long): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val sigs = GraftColumnBridge.column(graft.functions.VectorExprs
      .LshBandSigsExpr(GraftColumnBridge.expression(col("__x")),
        bands, rbits, dim, seed))
    emb.select(col(idCol).as("vec_id"), col(embCol).as("__x"))
      .select(col("vec_id"), posexplode(sigs).as(Seq("band", "sig")))
      .select(col("vec_id"), col("band").cast("long").as("band"), col("sig"))
  }

  /** The pure-HOF signature formulation [[signatures]] replaces (kept for
    * the bit-equality test, exactly like Tensors.dotHof): per plane j an
    * ascending-d double fold of vec[d] · hash-sign(j, d), bits packed with
    * exact pow-of-two weights.
    */
  private[graft] def signaturesHof(emb: DataFrame, idCol: String,
                                   embCol: String, dim: Int, bands: Int,
                                   rbits: Int, seed: Long): DataFrame = {
    val lBits = bands * rbits
    def signCell(j: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      when(Hashes.mulHash(j * 4096L + d, seed) % 2 === 0, lit(1.0d))
        .otherwise(lit(-1.0d))
    val bitArr = transform(sequence(lit(0), lit(lBits - 1)), j0 => {
      val j = j0.cast("long")
      val proj = aggregate(
        transform(sequence(lit(0), lit(dim - 1)),
          d => element_at(col("__x"), d + 1).cast("double")
            * signCell(j, d.cast("long"))),
        lit(0.0d), (a, p) => a + p)
      when(proj >= 0, 1L).otherwise(0L)
    })
    emb.select(col(idCol).as("vec_id"), col(embCol).as("__x"))
      .select(col("vec_id"), posexplode(bitArr).as(Seq("j", "bit")))
      .select(col("vec_id"), expr(s"j div $rbits").cast("long").as("band"),
        expr(s"j % $rbits").as("pos"), col("bit"))
      .groupBy("vec_id", "band")
      .agg(sum(col("bit") * pow(lit(2.0d), col("pos")).cast("long")).as("sig"))
  }

  /** Directed k-NN-graph edges (src, dst), ≤ `deg` per src, candidates from
    * capped LSH buckets only — the scan plan contains equi-joins and one
    * per-src window, nothing quadratic in the corpus.
    */
  def build(emb: DataFrame, idCol: String, embCol: String, dim: Int,
            bands: Int, rbits: Int, seed: Long, cap: Int, deg: Int): DataFrame = {
    require(cap >= 1 && deg >= 1)
    val sig = signatures(emb, idCol, embCol, dim, bands, rbits, seed)
    // bucket census is ≤ bands · 2^rbits rows — broadcast back, no extra
    // exchange on the data path (the SemDedup census posture)
    val cs = sig.groupBy("band", "sig").agg(count(lit(1)).as("bsize"))
    val sb = sig.join(broadcast(cs), Seq("band", "sig"))
      .withColumn("nsub", expr(s"(bsize + ${cap - 1}) div $cap"))
      .withColumn("sub", Hashes.mulHash(col("vec_id"), SubSalt) % col("nsub"))
      .select("band", "sig", "sub", "vec_id")
    val cand = sb.as("a").join(sb.as("b"), Seq("band", "sig", "sub"))
      .where(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ai"), col("b.vec_id").as("bi"))
      .distinct()
    val v = emb.select(col(idCol).as("vec_id"), col(embCol).as("x"),
      Tensors.norm(col(embCol)).as("nrm"))
    val va = v.select(col("vec_id").as("ai"), col("x").as("xa"), col("nrm").as("na"))
    val vb = v.select(col("vec_id").as("bi"), col("x").as("xb"), col("nrm").as("nb"))
    val scored = cand.join(va, "ai").join(vb, "bi")
      .select(col("ai"), col("bi"),
        round(Tensors.dot(col("xa"), col("xb")) / (col("na") * col("nb")), 6)
          .as("cos"))
    val und = scored.select(col("ai").as("src"), col("bi").as("dst"), col("cos"))
      .unionByName(scored.select(col("bi").as("src"), col("ai").as("dst"),
        col("cos")))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    und.withColumn("rn", row_number().over(w)).where(col("rn") <= deg)
      .select("src", "dst")
  }

  /** [[build]] then `rounds` of NN-descent refinement (Dong et al.,
    * WWW 2011): each round's candidates are the UNDIRECTED current edges
    * plus their two-hop compositions (an equi-join of the edge list with
    * itself — O(n · (2k)²) pairs, linear in the corpus), re-scored exactly
    * and re-pruned to the top `kInternal` per node; the final graph keeps
    * `deg`. The wide internal degree is what makes descent converge on
    * weakly-clustered data (kInternal = 2·deg recovers ~96% of the exact
    * top-deg edges on the near-random fixture in 2 rounds, vs a ~72%
    * plateau at kInternal = deg). Every stage is equi-joins + one per-src
    * window; nothing quadratic in the corpus anywhere.
    */
  def buildRefined(emb: DataFrame, idCol: String, embCol: String, dim: Int,
                   bands: Int, rbits: Int, seed: Long, cap: Int,
                   kInternal: Int, rounds: Int, deg: Int): DataFrame = {
    require(rounds >= 1 && kInternal >= deg)
    val v = emb.select(col(idCol).as("vec_id"), col(embCol).as("x"),
      Tensors.norm(col(embCol)).as("nrm"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    var g = build(emb, idCol, embCol, dim, bands, rbits, seed, cap, kInternal)
      .localCheckpoint()
    var scored: DataFrame = null
    for (_ <- 1 to rounds) {
      val und = g.unionByName(
        g.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val twoHop = und.as("x").join(und.as("y"), col("x.dst") === col("y.src"))
        .select(col("x.src").as("src"), col("y.dst").as("dst"))
        .where(col("src") =!= col("dst"))
      val cand = und.unionByName(twoHop).distinct()
      scored = cand
        .join(v.select(col("vec_id").as("src"), col("x").as("xe"),
          col("nrm").as("xn")), "src")
        .join(v.select(col("vec_id").as("dst"), col("x").as("ye"),
          col("nrm").as("yn")), "dst")
        .select(col("src"), col("dst"),
          round(Tensors.dot(col("xe"), col("ye")) / (col("xn") * col("yn")), 6)
            .as("cos"))
        .localCheckpoint() // round plans must not nest
      g = scored.withColumn("rn", row_number().over(w))
        .where(col("rn") <= kInternal).select("src", "dst")
    }
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= deg).select("src", "dst")
  }

  /** DuckDB CTE chain mirroring [[build]] verbatim — emits prefixed CTEs
    * and finally `${p}g(src, dst)`; expects a CTE `$src(vec_id, embedding,
    * nrm)` in scope. `p` prefixes every CTE name so several builds can
    * coexist in one oracle.
    */
  def graphCteSql(dim: Int, bands: Int, rbits: Int, seed: Long, cap: Int,
                  deg: Int, dotSql: (String, String) => String,
                  p: String = "", src: String = "v"): String = {
    val lBits = bands * rbits
    val sign = s"(CASE WHEN (${Hashes.mulHashSql("(p.j) * 4096 + (i - 1)", seed)}) % 2 = 0" +
      " THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"
    s"""${p}pl AS (SELECT range AS j FROM range(0, $lBits)),
       |${p}lbit AS (
       |  SELECT v.vec_id, p.j // $rbits AS band, p.j % $rbits AS pos,
       |         CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |             list_transform(range(1, ${dim + 1}),
       |               i -> CAST(v.embedding[i] AS DOUBLE) * $sign)),
       |             (x, y) -> x + y) >= 0 THEN 1 ELSE 0 END AS bit
       |  FROM $src v, ${p}pl p),
       |${p}sg AS (SELECT vec_id, band,
       |         CAST(sum(bit * CAST(pow(2, pos) AS BIGINT)) AS BIGINT) AS sig
       |       FROM ${p}lbit GROUP BY 1, 2),
       |${p}cs AS (SELECT band, sig, CAST(count(*) AS BIGINT) AS bsize
       |       FROM ${p}sg GROUP BY 1, 2),
       |${p}sb AS (SELECT sg.vec_id, sg.band, sg.sig,
       |         (${Hashes.mulHashSql("sg.vec_id", SubSalt)})
       |           % ((cs.bsize + ${cap - 1}) // $cap) AS sub
       |       FROM ${p}sg sg JOIN ${p}cs cs USING (band, sig)),
       |${p}cand AS (SELECT DISTINCT a.vec_id AS ai, b.vec_id AS bi
       |         FROM ${p}sb a JOIN ${p}sb b USING (band, sig, sub)
       |         WHERE a.vec_id < b.vec_id),
       |${p}candsc AS (
       |  SELECT ai, bi,
       |         round(${dotSql("a.embedding", "b.embedding")}
       |               / (a.nrm * b.nrm), 6) AS cos
       |  FROM ${p}cand JOIN $src a ON a.vec_id = ai
       |  JOIN $src b ON b.vec_id = bi),
       |${p}undsc AS (SELECT ai AS src, bi AS dst, cos FROM ${p}candsc
       |        UNION ALL SELECT bi AS src, ai AS dst, cos FROM ${p}candsc),
       |${p}g AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |             ORDER BY cos DESC, dst) AS rn FROM ${p}undsc) t
       |  WHERE rn <= $deg)""".stripMargin
  }

  /** DuckDB CTE chain mirroring [[buildRefined]]: the [[graphCteSql]] seed
    * at `kInternal` width (as `${p}g0`), `rounds` NN-descent round chains
    * (`${p}u{r}/${p}c{r}/${p}s{r}/${p}g{r}`), and the final prune to `deg`
    * as `${p}g`. Expects `$src(vec_id, embedding, nrm)` in scope.
    */
  def refinedGraphCteSql(dim: Int, bands: Int, rbits: Int, seed: Long,
                         cap: Int, kInternal: Int, rounds: Int, deg: Int,
                         dotSql: (String, String) => String,
                         p: String = "", src: String = "v"): String = {
    val seedCtes = graphCteSql(dim, bands, rbits, seed, cap, kInternal,
        dotSql, p = s"${p}s_", src = src)
      .replace(s"${p}s_g AS MATERIALIZED", s"${p}g0 AS MATERIALIZED")
    val roundCtes = (1 to rounds).map { r =>
      s"""${p}u$r AS MATERIALIZED (
         |  SELECT src, dst FROM ${p}g${r - 1}
         |  UNION SELECT dst AS src, src AS dst FROM ${p}g${r - 1}),
         |${p}c$r AS (SELECT DISTINCT src, dst FROM (
         |    SELECT x.src, y.dst FROM ${p}u$r x JOIN ${p}u$r y
         |      ON x.dst = y.src
         |    UNION ALL SELECT src, dst FROM ${p}u$r) t WHERE src <> dst),
         |${p}s$r AS MATERIALIZED (
         |  SELECT c.src, c.dst,
         |         round(${dotSql("a.embedding", "b.embedding")}
         |               / (a.nrm * b.nrm), 6) AS cos
         |  FROM ${p}c$r c JOIN $src a ON a.vec_id = c.src
         |  JOIN $src b ON b.vec_id = c.dst),
         |${p}g$r AS MATERIALIZED (
         |  SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY src
         |             ORDER BY cos DESC, dst) AS rn FROM ${p}s$r) t
         |  WHERE rn <= $kInternal)""".stripMargin
    }.mkString(",\n")
    s"""$seedCtes,
       |$roundCtes,
       |${p}g AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |             ORDER BY cos DESC, dst) AS rn FROM ${p}s$rounds) t
       |  WHERE rn <= $deg)""".stripMargin
  }
}
