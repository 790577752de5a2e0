package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGries
import graft.operators.ZOrder

/** Invariants for the round-3 curation operators: the Misra-Gries guarantee
  * under adversarial merge orders, and the Z-order layout property (disjoint
  * per-file key ranges ⇒ 2-d box predicates can skip files).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish skewed stream: item i appears ~ n/(i+1) times — realistic
    * heavy-hitter shape (the fixture tables are deliberately uniform).
    */
  private def zipfStream(n: Int): Seq[String] =
    (0 until n).map(j => s"item${java.lang.Long.numberOfTrailingZeros(j + 1)}")

  test("DSIR weights rank target-like docs above off-domain docs") {
    import org.apache.spark.sql.functions.col
    // target corpus speaks "alpha/gamma"; raw background speaks "beta/delta".
    // A raw doc written in the target's vocabulary must out-weigh one that
    // isn't, and weights must be exactly reproducible run to run.
    val docs = Seq(
      (1L, "alpha gamma alpha gamma", "tgt"),
      (2L, "alpha gamma gamma alpha", "tgt"),
      (3L, "alpha gamma alpha alpha", "raw"), // target-like
      (4L, "beta delta beta delta", "raw"),   // off-domain
      (5L, "beta beta delta beta", "raw")
    ).toDF("doc_id", "text", "source")
    val w = graft.operators.Dsir
      .importanceWeights(docs, col("source") === "tgt", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(3) > w(4), s"target-like doc must out-weigh off-domain: $w")
    assert(w(3) > w(5), w.toString)
    val again = graft.operators.Dsir
      .importanceWeights(docs, col("source") === "tgt", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w == again, "weights must be deterministic")
    // Gumbel-top-k: k rows, deterministic under the same seed
    val s1 = graft.operators.Dsir
      .gumbelSample(docs, col("source") === "tgt", 64, k = 3, seed = 7)
      .collect().map(_.getLong(0)).toSeq
    val s2 = graft.operators.Dsir
      .gumbelSample(docs, col("source") === "tgt", 64, k = 3, seed = 7)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.length == 3, s"$s1 vs $s2")
  }

  test("URL canonicalization: strips identity-irrelevant noise, keeps the rest") {
    val cases = Seq(
      // tracking params dropped, survivors sorted, fragment gone, host
      // lowercased + www-stripped, default port gone, trailing slash gone
      ("HTTP://WWW.Example.COM:80/Docs/A/?b=2&utm_source=x&a=1&ref=r#frag",
        "http://example.com/Docs/A?a=1&b=2"),
      // :443 is default only for https — kept on http
      ("http://example.com:443/p", "http://example.com:443/p"),
      ("https://example.com:443/p", "https://example.com/p"),
      // non-default port kept; path case preserved; bare root collapses
      ("https://Example.com:8443/", "https://example.com:8443"),
      // all params tracking → '?' dropped entirely
      ("http://a.io/x?utm_a=1&utm_b=2", "http://a.io/x"))
    val got = cases.map(_._1).toDF("url")
      .select(graft.operators.UrlCanon.canonical(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), s"got $got")
    // canonicalization is idempotent: canonical(canonical(u)) == canonical(u)
    val twice = cases.map(_._2).toDF("url")
      .select(graft.operators.UrlCanon.canonical(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == cases.map(_._2), s"not idempotent: $twice")
  }

  test("Misra-Gries guarantee: every item with count > N/(k+1) survives") {
    val data = zipfStream(4096)
    val exact = data.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    for (k <- Seq(1, 2, 4, 8); parts <- Seq(1, 7, 32)) {
      val cands = data.toDF("item").repartition(parts)
        .agg(MisraGries.candidates(col("item"), k).as("c"))
        .head().getSeq[String](0).toSet
      assert(cands.size <= k, s"k=$k parts=$parts: ${cands.size} candidates")
      val heavy = exact.filter(_._2 * (k + 1) > data.size).keySet
      assert(heavy.subsetOf(cands),
        s"k=$k parts=$parts: missing ${heavy -- cands}")
    }
  }

  test("Misra-Gries candidate count bound holds on an all-distinct stream") {
    val data = (0 until 1000).map(i => s"unique$i")
    val cands = data.toDF("item").repartition(13)
      .agg(MisraGries.candidates(col("item"), 5).as("c"))
      .head().getSeq[String](0)
    assert(cands.size <= 5)
  }

  test("Misra-Gries survives keys past writeUTF's 64KB limit (whole-doc items)") {
    // tracked items can be full documents; the partial-aggregate shuffle
    // serializes the buffer, so a >65535-byte UTF-8 key must round-trip
    val big = "x" * 70000
    val data = Seq.fill(8)(big) ++ Seq("small1", "small2")
    val cands = data.toDF("item").repartition(4)
      .agg(MisraGries.candidates(col("item"), 2).as("c"))
      .head().getSeq[String](0)
    assert(cands.contains(big))
  }

  test("count-min: est >= true for EVERY key, partition-invariant matrix") {
    import graft.functions.CountMin
    val (depth, width) = (4, 64)
    val data = zipfStream(4096)
    val exact = data.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val sketches = Seq(1, 7, 32).map { parts =>
      data.toDF("item").repartition(parts)
        .agg(CountMin.sketch(col("item"), depth, width).as("sk"))
        .head().getSeq[Long](0).toIndexedSeq
    }
    // the matrix is a commutative integer sum — bit-identical at any
    // partitioning (this is what lets q134 hash-check estimates at all)
    assert(sketches.distinct.size == 1, "sketch depends on partitioning")
    val sk = sketches.head
    exact.foreach { case (item, cnt) =>
      val est = CountMin.estimateLocal(sk, item, depth, width)
      assert(est >= cnt, s"$item: est $est < true $cnt")
    }
    // total mass per hash row = N exactly (every update hits each row once)
    (0 until depth).foreach { i =>
      assert(sk.slice(i * width, (i + 1) * width).sum == data.size.toLong)
    }
  }

  test("count-min: column estimate equals the JVM estimate, nulls skipped") {
    import graft.functions.CountMin
    val (depth, width) = (3, 32)
    val data = Seq("a", "bb", "ccc", "a", null, "bb", "a").toDF("item")
    val sk = data.agg(CountMin.sketch(col("item"), depth, width).as("sk"))
    val got = Seq("a", "bb", "ccc", "zz").toDF("probe")
      .crossJoin(broadcast(sk))
      .select(col("probe"),
        CountMin.estimate(col("sk"), col("probe"), depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val local = sk.head().getSeq[Long](0).toIndexedSeq
    got.foreach { case (item, est) =>
      assert(est == CountMin.estimateLocal(local, item, depth, width)) }
    assert(got("a") >= 3L && got("bb") >= 2L && got("ccc") >= 1L)
    // null contributes nowhere: 6 non-null updates per row
    assert(local.slice(0, width).sum == 6L)
  }

  test("count_min is callable from SQL via the session extensions") {
    import graft.functions.CountMin
    zipfStream(512).toDF("item").createOrReplaceTempView("cms_stream")
    val sk = spark.sql("SELECT count_min(item, 4, 64) AS sk FROM cms_stream")
      .head().getSeq[Long](0).toIndexedSeq
    // the SQL surface must produce the identical matrix as the Column API
    val viaColumn = zipfStream(512).toDF("item")
      .agg(CountMin.sketch(col("item"), 4, 64)).head().getSeq[Long](0)
    assert(sk == viaColumn)
    spark.catalog.dropTempView("cms_stream")
  }

  test("misra_gries is callable from SQL via the session extensions") {
    zipfStream(512).toDF("item").createOrReplaceTempView("mg_stream")
    val cands = spark.sql("SELECT misra_gries(item, 3) AS c FROM mg_stream")
      .head().getSeq[String](0)
    assert(cands.size <= 3 && cands.contains("item0"))
    spark.catalog.dropTempView("mg_stream")
  }

  test("zvalue interleaves bits: z(a,0) spreads a over even positions") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L), (255L, 255L))
    val got = rows.toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave reference: a→bits 0,2,4…, b→bits 1,3,5…
    def ref(a: Long, b: Long): Long = (0 until 8).map { i =>
      (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))
    }.sum
    assert(got == rows.map { case (a, b) => ref(a, b) })
    assert(got.last == 65535L) // (255,255) → all 16 low bits set
  }

  test("z-order layout: per-file z-ranges are disjoint and a 2-d box skips files") {
    val out = "/tmp/graft_zorder_spec"
    val df = spark.range(20000).select(
      (col("id") * 7919 % 256).as("a"), (col("id") * 104729 % 256).as("b"))
    ZOrder.writeClustered(df, col("a"), col("b"), out, files = 8)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size == 8)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("zval"), max("zval")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // range-partition + sort ⇒ file envelopes must not overlap
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file z-ranges: $ranges")
    }
    // the box a<16, b<16 lives entirely in z < 16²·... = 256: only files whose
    // envelope intersects [0,256) can hold matches — most files are skippable
    // from their parquet min/max stats alone
    val needed = ranges.count { case (lo, hi) => lo < 256 && hi >= 0 }
    assert(needed <= 2, s"box should touch ≤2 of 8 files, needed=$needed")
    // and the skip is sound: every matching row really lives in those files
    val matches = spark.read.parquet(out).where(col("a") < 16 && col("b") < 16)
    assert(matches.agg(max("zval")).head().getLong(0) < 256)
  }

  test("compaction: byte-targeted file count, disjoint key ranges, rows preserved") {
    import graft.operators.Compaction
    val dir = "/tmp/graft_compact_spec"
    val df = spark.range(100000).select(col("id").as("k"),
      (col("id") * 7919 % 1000).as("v"))
    df.repartition(50).write.mode("overwrite").parquet(s"$dir/small")
    val smallCount = Compaction.listDataFiles(spark, s"$dir/small").size
    assert(smallCount == 50, s"expected 50 shattered files, got $smallCount")
    val bytes = Compaction.listDataFiles(spark, s"$dir/small").map(_._2).sum
    val target = bytes / 4 + 1 // force ~4 output files from real input bytes
    val n = Compaction.compact(spark, s"$dir/small", s"$dir/compacted",
      Seq(col("k")), target)
    val outFiles = Compaction.listDataFiles(spark, s"$dir/compacted")
    assert(outFiles.size == n && n <= 5, s"returned $n, wrote ${outFiles.size}")
    // fidelity: every row survives exactly once
    val out = spark.read.parquet(s"$dir/compacted")
    assert(out.count() == 100000)
    assert(out.agg(sum("k")).head().getLong(0) == 100000L * 99999 / 2)
    // clustering: per-file key envelopes must not overlap (range partition)
    val ranges = outFiles.map { case (f, _) =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo, s"overlap: $ranges")
      case _ => ()
    }
  }

  test("upsert merge: last-wins versions, deletes vanish, inserts land, idempotent") {
    import graft.operators.Upsert
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "b2", 21L, "U", 1), (2L, "b3", 22L, "U", 2), // competing versions
      (3L, "c", 30L, "D", 1),                           // delete
      (9L, "new", 90L, "U", 1))                         // insert
      .toDF("k", "s", "v", "op", "ver")
    val latest = Upsert.latestPerKey(changes, Seq("k"), "ver").drop("ver")
    val got = Upsert(base, latest, Seq("k")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "b3", 22L), (9L, "new", 90L)))
    // re-applying the same batch to the merged snapshot changes nothing
    val again = Upsert(Upsert(base, latest, Seq("k")), latest, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(again == got)
  }

  test("span scrub: n_kept complements coverage and clean_text re-splits to n_kept") {
    import graft.operators.DupSpans
    val docs = DupSpans.syntheticLongDocs(spark)
    val cov = DupSpans.coverage(docs, col("toks"), width = 50)
      .select("doc_id", "n_tokens", "covered")
    val scrubbed = DupSpans.scrub(docs, col("toks"), width = 50)
    val joined = scrubbed.join(cov, Seq("doc_id", "n_tokens")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nTok, nKept, covered) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("covered"))
      assert(nKept == nTok - covered,
        s"doc ${r.getAs[Long]("doc_id")}: kept $nKept != $nTok - $covered")
      val text = r.getAs[String]("clean_text")
      val resplit = if (text.isEmpty) 0 else text.split(" ", -1).length
      assert(resplit == nKept)
      // the 80-token run common to ALL docs (positions 100-179) must be gone
      assert(!text.contains("c100"), "shared run survived the scrub")
    }
  }

  test("span scrub: order preserved, unique docs untouched, full-cover doc empties") {
    import graft.operators.DupSpans
    val docs = Seq(
      (0L, Seq("a", "b", "c", "x0", "y0", "z0")), // leading run shared with 1
      (1L, Seq("a", "b", "c", "x1", "y1", "z1")),
      (2L, Seq("p", "q", "r", "s", "t", "u")),    // all-unique: must pass through
      (3L, Seq("m", "n", "o")), (4L, Seq("m", "n", "o"))) // fully duplicated
      .toDF("doc_id", "toks")
    val got = DupSpans.scrub(docs, col("toks"), width = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_kept"), r.getAs[String]("clean_text")))
    assert(got(0) == ((0L, 3L, "x0 y0 z0")))
    assert(got(1) == ((1L, 3L, "x1 y1 z1")))
    assert(got(2) == ((2L, 6L, "p q r s t u")))
    assert(got(3) == ((3L, 0L, "")))
    assert(got(4) == ((4L, 0L, "")))
  }

  test("keep-one scrub: each duplicated span survives in exactly one doc") {
    import graft.operators.DupSpans
    val docs = Seq(
      (0L, Seq("a", "b", "c", "x0", "y0", "z0")), // leading run shared with 1
      (1L, Seq("a", "b", "c", "x1", "y1", "z1")),
      (2L, Seq("p", "q", "r", "s", "t", "u")),    // all-unique: must pass through
      (3L, Seq("m", "n", "o")), (4L, Seq("m", "n", "o"))) // fully duplicated
      .toDF("doc_id", "toks")
    val got = DupSpans.scrubKeepOne(docs, col("toks"), width = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_kept"), r.getAs[String]("clean_text")))
    // doc 0 is the (doc_id, start)-min representative of "a b c": keeps it
    assert(got(0) == ((0L, 6L, "a b c x0 y0 z0")))
    assert(got(1) == ((1L, 3L, "x1 y1 z1")))
    assert(got(2) == ((2L, 6L, "p q r s t u")))
    // fully-duplicated pair: doc 3 survives intact, doc 4 empties
    assert(got(3) == ((3L, 3L, "m n o")))
    assert(got(4) == ((4L, 0L, "")))
  }

  test("keep-one scrub on long docs: representative intact, one surviving copy") {
    import graft.operators.DupSpans
    val docs = DupSpans.syntheticLongDocs(spark) // 6 docs × 400 tokens
    val got = DupSpans.scrubKeepOne(docs, col("toks"), width = 50)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_kept"), r.getAs[String]("clean_text")))
    // at width 50 only the 80-token run common to all docs (positions
    // 100-179) is covered; doc 0 wins the election and keeps all 400
    assert(got(0)._2 == 400L)
    got.tail.foreach { case (id, kept, _) =>
      assert(kept == 320L, s"doc $id kept $kept, expected 400 - 80") }
    // the shared run's content survives exactly once across the corpus
    val copies = got.count(_._3.split(" ", -1).contains("c100"))
    assert(copies == 1, s"token c100 survives in $copies docs, expected 1")
  }

  test("bpe learn: pair argmax, merge application, corpus checksum, tie-break") {
    import graft.operators.BpeLearn
    val words = Seq(("ab", 3L), ("abc", 2L)).toDF("w", "freq")
    val ms = BpeLearn.fit(words, "w", "freq", rounds = 2)
    // round 1: (a,b) weight 5 beats (b,c) weight 2; "ab"→[ab], "abc"→[ab,c]
    assert((ms(0).lhs, ms(0).rhs, ms(0).pairCount) == (("a", "b", 5L)))
    assert(ms(0).corpusTokensAfter == 3 * 1 + 2 * 2)
    // round 2: only (ab,c) remains
    assert((ms(1).lhs, ms(1).rhs, ms(1).pairCount) == (("ab", "c", 2L)))
    assert(ms(1).corpusTokensAfter == 3 + 2)
    // equal counts break to the lexicographically first pair
    val tie = BpeLearn.fit(Seq(("ba", 2L), ("ab", 2L)).toDF("w", "freq"),
      "w", "freq", rounds = 1)
    assert((tie(0).lhs, tie(0).rhs) == (("a", "b")))
  }

  test("exact spans reject hash-colliding windows the fold family merges") {
    import graft.operators.DupSpans
    // "yislpv" and "ijiaoj" share a full-content polynomial hash (a found
    // birthday collision mod 1e9+7), so the HASHED census sees a cross-doc
    // duplicate window that does not exist; the EXACT census must not.
    val docs = Seq((0L, Seq("x", "yislpv", "y")), (1L, Seq("x", "ijiaoj", "y")))
      .toDF("doc_id", "toks")
    val hashed = DupSpans.coverage(docs, col("toks"), 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("covered")).toMap
    val exact = DupSpans.coverageExact(docs, col("toks"), 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("covered")).toMap
    assert(hashed == Map(0L -> 3L, 1L -> 3L),
      "fixture must actually exercise the collision")
    assert(exact == Map(0L -> 0L, 1L -> 0L),
      "exact keys must not merge distinct windows")
    // and on genuinely identical windows both variants agree
    val real = Seq((0L, Seq("a", "b", "c", "d")), (1L, Seq("a", "b", "c", "e")))
      .toDF("doc_id", "toks")
    val h2 = DupSpans.coverage(real, col("toks"), 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("covered")).toMap
    val e2 = DupSpans.coverageExact(real, col("toks"), 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("covered")).toMap
    assert(h2 == e2 && e2 == Map(0L -> 3L, 1L -> 3L))
  }

  test("byte-level spans catch duplicates every token window misses") {
    import graft.operators.DupSpans
    // the shared 32-char run "prefix_shared_run_of_bytes tail " tokenizes
    // DIFFERENTLY in the two docs (doc 1 glues "XX" onto the first token),
    // so the docs share ZERO tokens — a token census at any width sees
    // nothing; the byte census must see the run
    val docs = Seq(
      (0L, "prefix_shared_run_of_bytes tail zero"),
      (1L, "XXprefix_shared_run_of_bytes tail one")).toDF("doc_id", "text")
    val toks = split(col("text"), " ", -1)
    val tokenLevel = DupSpans.coverageExact(docs, toks, 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("covered")).toMap
    assert(tokenLevel == Map(0L -> 0L, 1L -> 0L),
      "token windows must genuinely miss this duplicate")
    // width-2 token windows miss it too — every shared token ("tail")
    // carries a DIFFERENT neighbor into each doc's window
    val token2 = DupSpans.coverageExact(docs, toks, 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("covered")).toMap
    assert(token2 == Map(0L -> 0L, 1L -> 0L))
    val byteLevel = DupSpans.coverageChars(docs, col("text"), width = 20)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("covered")).toMap
    // doc 0: windows at 0..12 cover chars [0, 31]; doc 1 shifted by 2
    assert(byteLevel == Map(0L -> 32L, 1L -> 32L),
      s"byte census must cover the shared run, got $byteLevel")
    // content-anchored sampling (the 100 TB census-thinning knob) must
    // still see the run even though doc 1's copy is SHIFTED by 2 chars —
    // anchors follow content, not position, so both docs keep the same
    // in-run windows (a position stride would miss every shift ≢ 0 mod s)
    val sampled = DupSpans.coverageChars(docs, col("text"), width = 20, sample = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("covered")).toMap
    assert(sampled.values.forall(_ > 0), s"anchored census lost the run: $sampled")
  }

  test("gap-slice surgery equals the per-token predicate on random corpora") {
    import graft.operators.DupSpans
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee") // tiny → many shared 3-grams
    val docs = (0L until 40L).map { id =>
      (id, Vector.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.toDF("doc_id", "toks")
    val spans = DupSpans.islands(df, col("toks"), 3).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = DupSpans.scrub(df, col("toks"), 3).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    docs.foreach { case (id, ts) =>
      val sp = spans.getOrElse(id, Array.empty[(Long, Long)])
      val want = ts.zipWithIndex.collect {
        case (t, p) if !sp.exists(s => p >= s._1 && p <= s._2) => t
      }.mkString(" ")
      assert(got(id) == want, s"doc $id: surgery diverged from the predicate")
    }
  }

  test("keep-one scrub dominates remove-all: every doc keeps at least as much") {
    import graft.operators.DupSpans
    val docs = DupSpans.syntheticLongDocs(spark)
    Seq(20, 50).foreach { width =>
      val all = DupSpans.scrub(docs, col("toks"), width)
        .select(col("doc_id"), col("n_kept").as("kept_all"))
      val one = DupSpans.scrubKeepOne(docs, col("toks"), width)
        .select(col("doc_id"), col("n_kept").as("kept_one"))
      val viol = all.join(one, "doc_id")
        .where(col("kept_one") < col("kept_all")).count()
      assert(viol == 0, s"width $width: keep-one cut more than remove-all")
      // and strictly more in total — the representative's copy survives
      val sumAll = all.agg(sum("kept_all")).head().getLong(0)
      val sumOne = one.agg(sum("kept_one")).head().getLong(0)
      assert(sumOne > sumAll, s"width $width: no representative survived")
    }
  }

  test("bpe encodeWords applies ranked merges in order") {
    import graft.operators.BpeLearn
    val words = Seq(("aab", 1L), ("ba", 1L), ("", 1L)).toDF("w", "freq")
    val merges = Seq(BpeLearn.Merge(2, "aa", "b", 0L, 0L), // deliberately
      BpeLearn.Merge(1, "a", "a", 0L, 0L))                 // out of order
    val got = BpeLearn.encodeWords(words, "w", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // rank order must be restored: (a,a) first, then (aa,b) on its output
    assert(got("aab") == Seq("aab"))
    assert(got("ba") == Seq("b", "a")) // no merge applies
    assert(got("") == Seq.empty)       // empty word stays empty
  }

  test("bpe merge application is left-to-right non-overlapping") {
    import graft.operators.BpeLearn
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"),
      Seq("b", "a", "a"), Seq("a"), Seq.empty[String]).toDF("sym")
    val got = df.select(BpeLearn.applyMerge(col("sym"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toSeq
    assert(got == Seq(List("aa", "a"), List("aa", "aa"),
      List("b", "aa"), List("a"), Nil))
  }

  test("pii redact: each category replaced everywhere, clean text untouched") {
    import graft.operators.Redact
    val rows = Seq(
      "mail a.b-c%d@host.sub.example.io and e@f.org twice",
      "ips 10.0.0.1 and 255.255.255.255 but not 1.2.3 or v1.2.3.4beta",
      "call 555-0199 or 555-0200, never 55-0199 or 5555-0200x",
      "plain text with words only stays byte-identical")
      .toDF("s")
    val got = rows.select(
      Redact.redact(col("s")).as("r"),
      Redact.matchCount(col("s"), Redact.Email).as("ne"),
      Redact.matchCount(col("s"), Redact.Ipv4).as("ni"),
      Redact.matchCount(col("s"), Redact.Phone).as("np")).collect()
    assert(got(0).getString(0) == "mail <EMAIL> and <EMAIL> twice")
    assert(got(0).getLong(1) == 2)
    // 1.2.3 lacks an octet; v1.2.3.4beta has no word boundary before 1
    assert(got(1).getString(0) == "ips <IP> and <IP> but not 1.2.3 or v1.2.3.4beta")
    assert(got(1).getLong(2) == 2)
    assert(got(2).getString(0) == "call <PHONE> or <PHONE>, never 55-0199 or 5555-0200x")
    assert(got(2).getLong(3) == 2)
    assert(got(3).getString(0) == "plain text with words only stays byte-identical")
    assert((got(3).getLong(1), got(3).getLong(2), got(3).getLong(3)) == ((0L, 0L, 0L)))
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens yields an " +
    "identical selected fingerprint in both docs; density ~ 2/(w+1)") {
    import graft.operators.MinHash
    // w=4 windows over k=3 shingles: guarantee threshold = 4+3-1 = 6 tokens.
    // Embed one 8-token run in two otherwise-disjoint documents.
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docA = s"left filler tokens before $run and unrelated tail words"
    val docB = s"completely different prefix here $run with other suffix junk"
    def fingerprints(text: String): Set[Long] = {
      val w = 4
      val df = Seq((1L, text)).toDF("doc_id", "text")
        .select(MinHash.shingleHashes(split(col("text"), " ", -1)).as("sh"))
      val sh = df.head().getSeq[Long](0)
      (0 to sh.length - w).map { p =>
        // rightmost minimal hash in the window — the q168 selection rule
        (p until p + w).foldLeft((Long.MaxValue, -1)) { case ((mh, mp), i) =>
          if (sh(i) <= mh) (sh(i), i) else (mh, mp)
        }
      }.map(_._1).toSet
    }
    val (fa, fb) = (fingerprints(docA), fingerprints(docB))
    assert((fa & fb).nonEmpty, "shared run produced no shared fingerprint")
    // density: selections per window position stay well under 1 (the
    // whole point of winnowing vs keep-every-shingle)
    val shLen = docA.split(" ").length - 2
    assert(fa.size < shLen, s"winnowing selected ${fa.size} of $shLen shingles")
  }

  test("winnow census: a shared >= w+k-1 run surfaces the PAIR; a " +
    "fingerprint in more than cap docs is dropped as boilerplate") {
    import graft.operators.{MinHash, Winnow}
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val boiler = "standard license header text common to every document here"
    // docs 1&2 share the run; docs 10..15 are IDENTICAL boilerplate docs —
    // identical on purpose: a per-doc unique prefix would let a boundary
    // window select a boiler shingle in only a SUBSET of the docs (when the
    // doc-specific boundary shingle hashes below it in the others), putting
    // that fingerprint under the cap and surfacing a boiler-only pair —
    // winnowing boundary behavior under ANY hash, not a cap failure
    val rows = Seq(
      (1L, s"first unique prefix words $run and one unique tail"),
      (2L, s"second distinct opening phrase $run closing words differ")) ++
      (10L to 15L).map(i => (i, s"doc body carries $boiler"))
    val docs = rows.toDF("doc_id", "text")
      .where(size(split(col("text"), " ", -1)) >= 3)
      .select(col("doc_id"),
        MinHash.shingleHashes(split(col("text"), " ", -1)).as("sh"))
    val pairs = Winnow.sharedPairs(docs, w = 4, cap = 4, minShared = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      s"shared run must surface pair (1,2): $pairs")
    // the boilerplate block lives in 6 docs > cap=4: every fingerprint it
    // contributes is censored, so no boiler-only pair may appear
    val boilerPairs = pairs.filter { case (a, b) => a >= 10L && b >= 10L }
    assert(boilerPairs.isEmpty,
      s"cap must censor boilerplate-only pairs: $boilerPairs")
    // with the cap lifted the same boilerplate pairs DO appear — proves the
    // censoring is the cap, not a selection artifact
    val uncapped = Winnow.sharedPairs(docs, w = 4, cap = 100, minShared = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.exists { case (a, b) => a >= 10L && b >= 10L },
      s"uncapped census must see the boilerplate pairs: $uncapped")
  }
}
