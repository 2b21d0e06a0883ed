package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Corpus-cleaning operators with no natural home in the synthetic
  * testdata (it carries no PII): redaction semantics over synthetic
  * rows, plus storage-format round-trips beyond parquet/CSV/JSON. */
class CleaningSpec extends SparkSpec {

  test("redactPii replaces urls, emails, and phone runs; leaves prose intact") {
    import spark.implicits._
    val rows = Seq(
      ("a", "contact me at jane.doe+x@sub.example.co.uk thanks"),
      ("b", "see https://user:pw@example.com/path?q=1 for details"),
      ("c", "call +1 (555) 123-4567 or 555-123-4567 today"),
      ("d", "born in 1984, ordered 12 items for 99 dollars"),
      ("e", "mixed: http://x.io/a b@c.org +44 20 7946 0958 end"))
      .toDF("id", "text")
      .select(col("id"), TextOps.redactPii(col("text")).as("clean"))
    val got = rows.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a") == "contact me at <EMAIL> thanks")
    assert(got("b") == "see <URL> for details")
    assert(got("c") == "call <PHONE> or <PHONE> today")
    // prose numerals are NOT phone-shaped: they survive
    assert(got("d") == "born in 1984, ordered 12 items for 99 dollars")
    assert(got("e") == "mixed: <URL> <EMAIL> <PHONE> end")
  }

  test("q61 provably rewrites: injected PII is redacted in EVERY row, markers present") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q61_pii_redaction")(spark, sf)
    val n = out.count()
    assert(n > 0)
    // the injected email + phone + URL shrink to fixed markers, so every
    // row must have lost characters — a no-op redaction chain would
    // produce chars_removed == 0 everywhere and still hash-match a
    // no-op oracle; this is the non-vacuousness guard
    assert(out.where(col("chars_removed") <= 0).count() == 0,
      "every row carries injected PII, so every row must shrink under redaction")
    // and the redacted text really carries the markers (recompute the
    // projection with the clean text exposed)
    val dirty = graft.engine.Tables.documents(spark, sf)
      .select(col("doc_id"),
        concat(col("text"), lit(" Contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1 (555) 010-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" via https://ex.org/u/"), col("doc_id").cast("string"), lit(" now.")).as("t"))
      .select(col("doc_id"), TextOps.redactPii(col("t")).as("clean"))
    assert(dirty.where(!col("clean").contains("<EMAIL>") ||
      !col("clean").contains("<PHONE>") || !col("clean").contains("<URL>")).count() == 0,
      "each injected PII kind must be replaced by its marker in every row")
  }

  test("redaction composes with the quality/token operators downstream") {
    import spark.implicits._
    val df = Seq(("x", "visit https://spam.example.com now"))
      .toDF("id", "text")
      .select(col("id"), TextOps.redactPii(col("text")).as("text"))
      .select(col("id"), size(TextOps.tokens(col("text"))).as("n_tok"))
    assert(df.collect()(0).getInt(1) == 3) // "visit <URL> now"
  }

  test("curatedDocs (library surface) is exactly the corpus q37 accounts for") {
    val sf = "/root/testdata/sf0.001"
    val kept = graft.queries.TextQueries.curatedDocs(spark, sf)
    // all original document columns survive, plus the quality score
    val docCols = graft.engine.Tables.documents(spark, sf).columns.toSeq
    assert(kept.columns.toSeq == docCols :+ "quality")
    // accounting over the library surface == the oracle-checked q37
    val viaLib = kept.groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("lang")).collect().map(r => r.getString(0) -> r.getLong(1))
    val viaQ37 = SparkEntry.queries("q37_curation_pipeline")(spark, sf)
      .select(col("lang"), col("n_kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(viaLib.toSeq == viaQ37.toSeq)
    // survivors are unique by content (exact dedup held)
    assert(kept.groupBy(md5(col("text"))).count().where(col("count") > 1).count() == 0)
    spark.catalog.clearCache() // the pipeline persists its signature table
  }

  test("CacheScope releases every block the curation pipeline persists") {
    val sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache() // isolate from other suites' leftovers
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val scope = new graft.engine.CacheScope
    try {
      val kept = graft.queries.TextQueries.curatedDocs(spark, sf, scope)
      assert(kept.count() > 0) // consuming action: caches materialize here
      val pairs = graft.queries.TextQueries.ngramJaccardPairs(spark, sf, None, scope)
      pairs.count()
      // the caches are live while the scope is open
      assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty,
        "pipeline should have materialized tracked caches")
    } finally scope.close()
    // ... and fully released after close — a long-lived session calling
    // the library repeatedly must not accumulate storage blocks
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.diff(before).isEmpty,
      s"cached RDDs leaked past scope.close(): ${after.diff(before)}")
  }

  test("decontaminateSpans excises exactly the covered token windows") {
    import spark.implicits._
    val benchmark = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains benchmark 3-grams "alpha beta gamma" (start 3) and
      // "beta gamma delta" (start 4): covered tokens 3..6
      (1L, "one two alpha beta gamma delta seven eight"),
      // near-miss: no 3-gram matches (order broken)
      (2L, "alpha gamma beta delta one two"),
      // fully covered doc
      (3L, "alpha beta gamma"),
      (4L, "")).toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.decontaminateSpans(corpus, benchmark)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((8L, 4L, "one two seven eight")),
      s"overlapping windows must merge into one excised span, got ${out(1L)}")
    assert(out(2L) == ((6L, 0L, "alpha gamma beta delta one two")),
      "a near-miss (broken order) must survive untouched")
    assert(out(3L) == ((3L, 3L, "")), "a fully covered doc keeps zero tokens")
    assert(out(4L) == ((0L, 0L, "")), "an empty doc passes through")
  }

  test("dedupRepeatedSpans excises exactly the cross-document-repeated spans") {
    import spark.implicits._
    // shared7 is a 7-token run appearing verbatim in docs 1 and 2: its
    // three 5-gram starts are hot (df = 2), covering exactly those 7
    // tokens in both docs. Doc 4 repeats a 6-token run TWICE WITHIN
    // ITSELF only (df = 1) — must survive: the operator is
    // cross-document. Doc 5 shares only a 4-token run (< k) with doc 1.
    val shared7 = "s1 s2 s3 s4 s5 s6 s7"
    val corpus = Seq(
      (1L, s"a1 a2 $shared7 a3 a4"),
      (2L, s"b1 $shared7 b2"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8"),
      (4L, "d1 r1 r2 r3 r4 r5 r6 d2 r1 r2 r3 r4 r5 r6 d3"),
      (5L, "e1 s1 s2 s3 s4 e2 e3 e4 e5"),
      (6L, "")).toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.dedupRepeatedSpans(corpus, k = 5, minDf = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((11L, 7L, "a1 a2 a3 a4")),
      s"the shared 7-token span must excise whole from doc 1: ${out(1L)}")
    assert(out(2L) == ((9L, 7L, "b1 b2")),
      s"...and from doc 2, merging its three overlapping hot grams: ${out(2L)}")
    assert(out(3L) == ((8L, 0L, "c1 c2 c3 c4 c5 c6 c7 c8")),
      "unique content survives untouched")
    assert(out(4L)._2 == 0L,
      s"a span repeated only WITHIN one doc (df = 1) must survive: ${out(4L)}")
    assert(out(5L)._2 == 0L,
      s"a shared run shorter than k must not be excised: ${out(5L)}")
    assert(out(6L) == ((0L, 0L, "")), "an empty doc passes through")
    spark.catalog.clearCache()
  }

  test("dedupRepeatedSpans matches a driver-side model on random corpora") {
    import spark.implicits._
    // seeded random corpora over a tiny vocabulary, so cross-doc 5-gram
    // repeats arise densely and overlap — the full contract (df by
    // DISTINCT doc, overlapping-span merge in the compiled cover
    // kernel, order-preserving reconstruction) against an independent
    // in-memory model
    val rnd = new scala.util.Random(20260814)
    val k = 5
    for (minDf <- Seq(2L, 3L)) {
      val vocab = Vector("w0", "w1", "w2", "w3", "w4", "w5")
      val docs = (1L to 40L).map { id =>
        val n = rnd.nextInt(30)
        (id, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty) }
      val df = toks.flatMap { case (id, tk) =>
        tk.sliding(k).filter(_.length == k).map(g => (g.mkString(" "), id))
      }.distinct.groupBy(_._1).map { case (g, xs) => g -> xs.size.toLong }
      val hot = df.collect { case (g, c) if c >= minDf => g }.toSet
      val want = toks.map { case (id, tk) =>
        val starts = tk.sliding(k).zipWithIndex
          .collect { case (g, i) if g.length == k && hot(g.mkString(" ")) => i }.toSet
        val kept = tk.indices.filterNot(j => starts.exists(s => j >= s && j <= s + k - 1))
        (id, tk.length.toLong, (tk.length - kept.size).toLong,
          kept.map(tk).mkString(" "))
      }.toSet
      val got = graft.queries.CurationQueries
        .dedupRepeatedSpans(docs.toDF("doc_id", "text"), k, minDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(got == want,
        s"minDf=$minDf model mismatch: extra=${got -- want} missing=${want -- got}")
      spark.catalog.clearCache()
    }
  }

  test("staged curation pipeline: accounting counts the frames curatedDocsOf returns") {
    val sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val scope = new graft.engine.CacheScope
    try {
      // dirty corpus with line boilerplate + a blocked URL on a third
      // of the docs (q63/q66's device, small-sf thresholds)
      val dirty = graft.engine.Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"), col("source"),
          concat_ws("\n",
            lit("shared boilerplate header"),
            col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit("see https://x.bad.example/p/"), col("doc_id").cast("string")))).as("text"))
      val stagingDir = java.nio.file.Files.createTempDirectory("graft_stage_test").toString
      val stages = graft.queries.TextQueries.CurationStages(
        repeatedLineMinDf = Some(5), blockedDomains = Seq("bad.example"),
        maxRarity = Some(0.99), budgetPerSource = Some(400),
        stagingDir = Some(stagingDir))
      val counts = graft.queries.TextQueries.curationStageCounts(dirty, stages, scope)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      assert(counts.map(_._2).toSeq == Seq("input", "repeated_lines", "url_filter",
        "exact_dedup", "near_dup", "quality", "rarity", "budget"))
      // survivor counts are monotone non-increasing, starting at the input size
      assert(counts.head._3 == dirty.count())
      assert(counts.sliding(2).forall { case Array(a, b) => b._3 <= a._3 })
      // the URL stage really fired (a third of the docs carry a blocked host)
      assert(counts(2)._3 < counts(1)._3)
      // the final frame IS the corpus the accounting's last row counts
      val kept = graft.queries.TextQueries.curatedDocsOf(dirty, stages, scope)
      assert(kept.count() == counts.last._3)
      assert(kept.columns.toSeq == dirty.columns.toSeq :+ "quality")
      // boilerplate is gone from every surviving text
      assert(kept.where(col("text").contains("shared boilerplate header")).count() == 0)
      // ... and no surviving doc carries a blocked host
      assert(kept.where(col("text").contains("bad.example")).count() == 0)
      // default stages == the classic pipeline (same rows as curatedDocs)
      val classic = graft.queries.TextQueries.curatedDocs(spark, sf, scope)
      val staged = graft.queries.TextQueries.curatedDocsOf(
        graft.engine.Tables.documents(spark, sf), scope = scope)
      assert(staged.exceptAll(classic).count() == 0 &&
        classic.exceptAll(staged).count() == 0,
        "default-config curatedDocsOf must equal the classic curatedDocs")
      // boundary materialization is value-invariant: the same config
      // run UNstaged (one lazy plan, no parquet round-trips) returns
      // exactly the rows the staged run produced
      val unstaged = graft.queries.TextQueries.curatedDocsOf(
        dirty, stages.copy(stagingDir = None), scope)
      assert(unstaged.exceptAll(kept).count() == 0 &&
        kept.exceptAll(unstaged).count() == 0,
        "staged and unstaged pipelines must return identical rows")
      // the staged boundaries were really materialized (staged-layer shape)
      assert(new java.io.File(stagingDir, "budget").exists(),
        "stage boundaries should be written under the staging dir")
      // ... and a tracking scope deletes them on close
      scope.close()
      assert(!new java.io.File(stagingDir, "budget").exists(),
        "tracking scope must delete staged dirs on close")
    } finally scope.close()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.diff(before).isEmpty,
      s"cached RDDs leaked past scope.close(): ${after.diff(before)}")
  }

  test("span-dedup stage: cross-doc boilerplate spans excised between exact and near dedup") {
    val sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    val scope = new graft.engine.CacheScope
    try {
      // a 10-token boilerplate SPAN appended inside every doc's text —
      // sub-line grain, so the repeated-LINE stage could never see it;
      // every k=5 gram fully inside the span is hot (df = corpus size),
      // the grams straddling the doc/boilerplate boundary differ per
      // doc (df = 1) and keep their docs' own content intact
      val boiler = "subscribe to our newsletter for updates every single day now"
      val dirty = graft.engine.Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"), col("source"),
          concat_ws(" ", col("text"), lit(boiler)).as("text"))
      val stages = graft.queries.TextQueries.CurationStages(spanDedupMinDf = Some(5))
      val counts = graft.queries.TextQueries.curationStageCounts(dirty, stages, scope)
        .collect().map(r => (r.getString(1), r.getLong(2)))
      // the stage slots between exact dedup and near-dup, and the
      // accounting sees exactly the frames curatedDocsOf composes
      assert(counts.map(_._1).toSeq ==
        Seq("input", "exact_dedup", "span_dedup", "near_dup", "quality"))
      assert(counts.sliding(2).forall { case Array(a, b) => b._2 <= a._2 })
      val kept = graft.queries.TextQueries.curatedDocsOf(dirty, stages, scope)
      assert(kept.count() == counts.last._2)
      assert(kept.columns.toSeq == dirty.columns.toSeq :+ "quality")
      // the boilerplate span is gone from every surviving text, but the
      // docs themselves survive with their residual content (the stage
      // rewrites text, it does not drop content-bearing docs)
      assert(kept.where(col("text").contains(boiler)).count() == 0,
        "no surviving text may still carry the boilerplate span")
      assert(kept.count() > 0)
      // boundary materialization is value-invariant for the new stage too
      val stagingDir = java.nio.file.Files.createTempDirectory("graft_span_stage").toString
      val staged = graft.queries.TextQueries.curatedDocsOf(
        dirty, stages.copy(stagingDir = Some(stagingDir)), scope)
      assert(staged.exceptAll(kept).count() == 0 &&
        kept.exceptAll(staged).count() == 0,
        "staged and unstaged span-dedup pipelines must return identical rows")
    } finally scope.close()
    spark.catalog.clearCache()
  }

  test("semantic-dedup stage: paraphrase replicas invisible to text stages drop; survivor restriction holds") {
    import spark.implicits._
    spark.catalog.clearCache()
    val scope = new graft.engine.CacheScope
    try {
      // 11 docs with mutually disjoint vocabularies — every text stage
      // is blind: exact hashes all distinct except doc 10 (a verbatim
      // copy of doc 3), shingle overlap zero everywhere else, so
      // MinHash est_sim ~ 0. The SEMANTIC structure lives only in the
      // embeddings: docs 2 and 3 are a "paraphrase pair" (cosine
      // ~0.9995, disjoint words), and doc 10 is embedding-paired with
      // doc 3 too. 64-dim vectors, first dims only; seeds = ids 0, 1.
      val texts = (0 to 9).map(i =>
        (i.toLong, (0 until 12).map(j => s"w${i}x$j").mkString(" "))) :+
        (10L, (0 until 12).map(j => s"w3x$j").mkString(" "))
      val docs = texts.toDF("doc_id", "text")
        .select(col("doc_id"), lit("en").as("lang"), lit("src0").as("source"), col("text"))
      def vec(parts: (Int, Double)*): Seq[Double] = {
        val a = Array.fill(64)(0.0); parts.foreach { case (i, x) => a(i) = x }; a.toSeq
      }
      val embAll = Seq(
        0L -> vec(0 -> 1.0),                 // seed A: cell 0, ccos 1
        1L -> vec(1 -> 1.0),                 // seed B: cell 1, ccos 1
        2L -> vec(1 -> 0.5, 2 -> 0.866),     // cell 1, ccos 0.50 ┐ pair: cos ~0.9995
        3L -> vec(1 -> 0.48, 2 -> 0.877),    // cell 1, ccos 0.48 ┘ 2 is centroid-closer -> 2 drops
        4L -> vec(3 -> 1.0), 5L -> vec(4 -> 1.0), 6L -> vec(5 -> 1.0),
        7L -> vec(6 -> 1.0), 8L -> vec(7 -> 1.0),
        // doc 9 gets NO embedding row (filtered below) — must be kept
        9L -> vec(8 -> 1.0),
        // doc 10: pairs with 3 at LOWER ccos (0.46 < 0.48) — if the
        // pair join ran over the FULL frame, survivor 3 would lose to
        // this already-exact-dedup-dropped copy and the content would
        // vanish entirely; the survivor restriction must prevent that
        10L -> vec(1 -> 0.46, 2 -> 0.888))
      val emb = embAll.toDF("doc_id", "embedding")
        .where(col("doc_id") =!= 9L)
      val stages = graft.queries.TextQueries.CurationStages(
        semanticDedup = Some(graft.queries.TextQueries.SemanticDedupStage(
          emb, tau = 0.9, nSeeds = 2, iters = 0)),
        qualityFloor = 0.0)
      val counts = graft.queries.TextQueries.curationStageCounts(docs, stages, scope)
        .collect().map(r => (r.getString(1), r.getLong(2)))
      assert(counts.map(_._1).toSeq ==
        Seq("input", "exact_dedup", "near_dup", "semantic_dedup", "quality"))
      // exact dedup drops only the verbatim copy (10); near-dup sees
      // zero shingle overlap and drops nothing; the semantic stage
      // drops exactly the centroid-closer paraphrase member (2)
      assert(counts.map(_._2).toSeq == Seq(11L, 10L, 10L, 9L, 9L))
      val kept = graft.queries.TextQueries.curatedDocsOf(docs, stages, scope)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(0L, 1L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
      // the pins the count alone can't separate:
      assert(kept.contains(3L),
        "survivor restriction: doc 3 must not lose to its already-dropped copy 10")
      assert(kept.contains(9L), "docs with no embedding row must be kept")
      assert(!kept.contains(2L),
        "the centroid-closer paraphrase member must drop")
      // without the stage, the paraphrase pair is invisible: both survive
      val noStage = graft.queries.TextQueries.curatedDocsOf(docs,
        stages.copy(semanticDedup = None), scope)
        .select("doc_id").as[Long].collect().toSet
      assert(noStage == kept + 2L,
        "text stages alone must keep both paraphrase members")
      // Lloyd-refined cells (the q77 path): vectors don't move, so the
      // only >=tau pair is still (2, 3) — one of the two drops, and
      // everything else (incl. the no-embedding doc) survives
      val refined = graft.queries.TextQueries.curatedDocsOf(docs,
        stages.copy(semanticDedup = stages.semanticDedup.map(_.copy(iters = 2))), scope)
        .select("doc_id").as[Long].collect().toSet
      assert(refined.size == 9 && (refined - 2L - 3L) == (kept - 3L),
        "refined cells: exactly one paraphrase member drops")
    } finally scope.close()
    spark.catalog.clearCache()
  }

  test("curationStageCounts leaves caller-supplied staging dirs in place") {
    // a caller that ran curatedDocsOf with its own stagingDir and still
    // holds the returned frame (a parquet re-read of $dir/<stage>) must
    // be able to act on it AFTER a later accounting call over the same
    // config — the accounting only auto-cleans boundaries it
    // provisioned itself (tmpdir / in-memory modes)
    val sf = "/root/testdata/sf0.001"
    val dirty = graft.engine.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        concat_ws("\n", lit("shared boilerplate header"), col("text")).as("text"))
    val stagingDir = java.nio.file.Files.createTempDirectory("graft_owned_stage").toString
    val stages = graft.queries.TextQueries.CurationStages(
      repeatedLineMinDf = Some(5), stagingDir = Some(stagingDir))
    val scope = new graft.engine.CacheScope
    try {
      val kept = graft.queries.TextQueries.curatedDocsOf(dirty, stages, scope)
      val nKept = kept.count()
      val counts = graft.queries.TextQueries.curationStageCounts(dirty, stages, scope)
        .collect().map(r => (r.getString(1), r.getLong(2))).toMap
      assert(new java.io.File(stagingDir, "quality").exists(),
        "accounting must not delete boundaries under a caller-supplied stagingDir")
      // the held frame still resolves — and agrees with the accounting
      assert(kept.count() == nKept)
      assert(counts("quality") == nKept)
    } finally scope.close()
    assert(!new java.io.File(stagingDir, "quality").exists(),
      "the caller's scope close still owns the cleanup")
  }

  test("curationStageCounts default gate: in-memory boundaries, same counts, no leaked blocks") {
    val sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val dirty = graft.engine.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        concat_ws("\n", lit("shared boilerplate header"), col("text")).as("text"))
    val stages = graft.queries.TextQueries.CurationStages(
      repeatedLineMinDf = Some(5), maxRarity = Some(0.99), budgetPerSource = Some(400))
    // DEFAULT call (no stagingDir, untracked scope): the plan-size gate
    // must pick localCheckpoint boundaries for this unit-test-sized
    // corpus — no tmpdir round-trips — and the eager computation must
    // release every boundary block before returning even though the
    // caller passed no tracking scope
    val viaDefault = graft.queries.TextQueries.curationStageCounts(dirty, stages)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty,
      "default curationStageCounts must release its checkpointed boundaries")
    // ... and the counts are identical to an explicit parquet-staged run
    // (whose staged stages count from the written files' footers)
    val stagingDir = java.nio.file.Files.createTempDirectory("graft_gate_test").toString
    val scope = new graft.engine.CacheScope
    val viaStaged =
      try graft.queries.TextQueries.curationStageCounts(dirty,
        stages.copy(stagingDir = Some(stagingDir)), scope)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      finally scope.close()
    assert(viaDefault == viaStaged,
      s"boundary mode must not change the accounting: $viaDefault vs $viaStaged")
    spark.catalog.clearCache()
  }

  test("CacheScope releases the curation-selection operators' persists too") {
    // the round-9 library entry points (budgetSelect / packingSpans /
    // bigramRarity) persist shared intermediates; a library caller
    // composing them must be able to own the release (r9 verdict #1)
    val sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val scope = new graft.engine.CacheScope
    try {
      val docs = graft.engine.Tables.documents(spark, sf)
      assert(graft.queries.CurationQueries.budgetSelect(docs, 600L, scope).count() > 0)
      assert(graft.queries.CurationQueries.packingSpans(docs, scope).count() > 0)
      assert(graft.queries.CurationQueries.bigramRarity(docs, scope = scope).count() > 0)
      assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty,
        "the three operators should have materialized tracked caches")
    } finally scope.close()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.diff(before).isEmpty,
      s"cached RDDs leaked past scope.close(): ${after.diff(before)}")
  }

  test("q43 maxDf cap: exact is an explicit opt-out; the DEFAULT is the scale-safe cap") {
    val sf = "/root/testdata/sf0.001"
    val exact = graft.queries.TextQueries.ngramJaccardPairs(spark, sf, maxDf = None)
      .select("doc_a", "doc_b", "n_common", "jaccard")
    val capped = graft.queries.TextQueries.ngramJaccardPairs(spark, sf,
      Some(graft.queries.TextQueries.DefaultMaxDf))
      .select("doc_a", "doc_b", "n_common", "jaccard")
    // the no-args call IS the capped path — a production caller gets the
    // bounded-work plan without opting into anything (r6 verdict: the
    // 100-TB scale-killer was exact-as-default, not exact-as-option)
    val default = graft.queries.TextQueries.ngramJaccardPairs(spark, sf)
      .select("doc_a", "doc_b", "n_common", "jaccard")
    assert(default.exceptAll(capped).count() == 0 &&
      capped.exceptAll(default).count() == 0,
      "default must equal the explicit DefaultMaxDf cap")
    // cap-on can only DROP candidates (postings with df > cap) — every
    // pair it reports is an exact pair with the exact Jaccard value
    assert(capped.exceptAll(exact).count() == 0,
      "capped output must be a subset of the exact output")
    // on this corpus every qualifying pair shares at least one rare
    // (df <= 64) prefix shingle, so the cap is lossless here — the
    // recall trade only bites on boilerplate-dominated corpora
    assert(exact.exceptAll(capped).count() == 0,
      "cap=64 should be lossless on the synthetic corpus")
    spark.catalog.clearCache() // ngramJaccardPairs persists its base table
  }

  test("lshProbe(sig, sig) restricted to doc_a < doc_b IS lshPairsOf(sig)") {
    // the asymmetric ingest probe and the symmetric q42 join share the
    // banded-key building block; this pins that they can never drift
    // apart semantically (probe of a table against itself = the pair
    // join, modulo pair orientation)
    val sf = "/root/testdata/sf0.001"
    val sig = graft.queries.TextQueries
      .signaturesOf(graft.engine.Tables.documents(spark, sf))
      .persist()
    val viaPairs = graft.queries.TextQueries.lshPairsOf(sig)
      .select("doc_a", "doc_b", "est_sim")
    val viaProbe = graft.queries.TextQueries.lshProbe(sig, sig)
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "est_sim")
    assert(viaPairs.exceptAll(viaProbe).count() == 0 &&
      viaProbe.exceptAll(viaPairs).count() == 0)
    spark.catalog.clearCache()
  }

  test("dupClusters' signature collapse equals doc-level components on a replica-heavy corpus") {
    // 5 exact replicas of every doc — the shape where the collapse pays
    // (doc-level candidate volume is quadratic in replica count) and
    // where its correctness argument is actually exercised: multi-doc
    // signature groups with AND without external near-dup edges
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    val base = graft.engine.Tables.documents(spark, sf)
    (0 until 5).map(r => base.withColumn("doc_id", col("doc_id") + lit(r * 10000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQueries.dupClusters(spark, dir)
    // reference: the pre-collapse definition — band join over EVERY doc's
    // signature, components over the doc-level edge set
    val sig = graft.queries.TextQueries
      .signaturesOf(graft.engine.Tables.documents(spark, dir))
      .persist()
    val edges = graft.queries.TextQueries.lshPairsOf(sig).select("doc_a", "doc_b")
    val naive = graft.ext.Graph.connectedComponents(edges, "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
    assert(got.count() > 0)
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0,
      "collapsed and doc-level cluster assignments must be identical")
    // a generous band-bucket cap is a no-op here (post-collapse buckets
    // are all cool) — pins the maxBucket pass-through without changing
    // the expected clusters
    val capped = graft.queries.TextQueries.dupClusters(spark, dir, maxBucket = Some(1000))
    assert(capped.exceptAll(got).count() == 0 && got.exceptAll(capped).count() == 0)
    spark.catalog.clearCache()
  }

  test("lshPairsOf maxBucket: hot buckets drop entirely, cool buckets are untouched") {
    import spark.implicits._
    // 6 copies of text A (every band bucket of A's signature holds 6 >
    // cap), 2 copies of text B (bucket size 2 <= cap). Exact: 15 A-pairs
    // + 1 B-pair, all est_sim = 1.0; capped at 4: ONLY the B-pair.
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "pack my box with five dozen liquor jugs today"
    val docs = ((1L to 6L).map(i => (i, a)) ++ Seq((7L, b), (8L, b))).toDF("doc_id", "text")
    val sig = graft.queries.TextQueries.signaturesOf(docs).persist()
    val exact = graft.queries.TextQueries.lshPairsOf(sig)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = graft.queries.TextQueries.lshPairsOf(sig, maxBucket = Some(4))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val aPairs = (for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j)).toSet
    assert(exact == aPairs + ((7L, 8L)))
    assert(capped == Set((7L, 8L)),
      "cap=4 must drop every pair of the 6-doc hot group and keep the cool pair")
    // and a cap above the hottest bucket is exactly the exact path
    val loose = graft.queries.TextQueries.lshPairsOf(sig, maxBucket = Some(100))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == exact)
    spark.catalog.clearCache()
  }

  test("editVerifiedPairs: small edits verify, block moves reject — in-band and via the -1 sentinel") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{levenshtein, lit}
    // A: 15 distinct tokens (~92 chars). A+' zq' is a 3-char edit -> LSH
    // candidate AND verified (3*5 <= 95). swap(A) (token halves swapped)
    // keeps the shingle set ≈ intact (candidate) but costs ~76 char
    // edits -> IN-BAND reject (76 <= 102, 76*5 > 92). C: 60 gibberish
    // tokens (~420 chars); swap(C) is ~300 edits -> the -1 band
    // sentinel (computation early-exits past editWindow/5).
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar"
    val at = a.split(" ")
    val swapA = (at.drop(at.length / 2) ++ at.take(at.length / 2)).mkString(" ")
    val ct = (0 until 60).map(i => f"${(i + 1) * 0x9E3779B97F4A7C15L >>> 34}%x")
    assert(ct.distinct.size == 60)
    val c = ct.mkString(" ")
    val swapC = (ct.drop(30) ++ ct.take(30)).mkString(" ")
    val docs = Seq((1L, a), (2L, a + " zq"), (3L, swapA), (5L, c), (6L, swapC))
      .toDF("doc_id", "text")
    val out = graft.queries.TextQueries.editVerifiedPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out((1L, 2L)) == ((3L, true)), s"suffix edit must verify at dist 3: $out")
    val (dA, vA) = out((1L, 3L))
    assert(!vA && dA > 0 && dA <= 102,
      s"short-doc swap must reject with an exact in-band distance: $out")
    val (dC, vC) = out((5L, 6L))
    assert(!vC && dC == -1L,
      s"long-doc swap must reject via the band sentinel: $out")
    // the banded-kernel contract the oracle's CASE mirrors: exact at the
    // band edge, -1 one past it
    val Array(row) = spark.range(1).select(
      levenshtein(lit("a" * 102), lit(""), 102),
      levenshtein(lit("a" * 103), lit(""), 102)).collect()
    assert((row.getInt(0), row.getInt(1)) == ((102, -1)),
      "Spark threshold-levenshtein must return the distance at the band edge and -1 beyond")
    spark.catalog.clearCache()
  }

  test("bpePairCounts: overlap-per-position counting, frequency weighting, 1-char filter, deterministic k-cut") {
    import spark.implicits._
    // vocab: aaa(freq 2), bb(1), cc(1), x(1). "aaa" contributes TWO
    // "aa" occurrences per word (positions 1,2 — the Sennrich get_stats
    // overlap rule), weighted by freq 2 -> n=4. "x" has no pairs. The
    // bb-vs-cc tie at n=1 must cut to "bb" (pair ASC) at k=2.
    val docs = Seq((1L, "aaa bb x"), (2L, "aaa cc")).toDF("doc_id", "text")
    val top2 = graft.queries.TextQueries.bpePairCounts(docs, 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top2 == Seq(("aa", 4L), ("bb", 1L)),
      s"expected overlap-weighted counts with lexicographic tie cut: $top2")
    val all = graft.queries.TextQueries.bpePairCounts(docs, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(all == Seq(("aa", 4L), ("bb", 1L), ("cc", 1L)),
      s"1-char words must contribute nothing: $all")
    spark.catalog.clearCache()
  }

  test("lmSurprisal: quantized surprisal matches a hand-computed LM; common text scores below rare text") {
    import spark.implicits._
    // LM over both docs: (a,b)=3, (b,a)=2, (a,c)=1; n_ctx a=4, b=2
    // surprisal: (a,b) -> 4 div 3 = 1 -> 0 bits; (b,a) -> 2 div 2 = 1 -> 0;
    //            (a,c) -> 4 div 1 = 4 -> floor(log2 4) = 2
    val docs = Seq((1L, "a b a b"), (2L, "a b a c")).toDF("doc_id", "text")
    val out = graft.queries.TextQueries.lmSurprisal(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 3L, 0L, 0.0), (2L, 3L, 2L, 2.0 / 3.0)),
      s"hand LM mismatch: ${out.toSeq}")
    // a doc of pure boilerplate (every bigram high-probability) must
    // score below one full of rare continuations — the CCNet ordering
    val many = (0 until 20).map(i => (10L + i, "the cat sat"))
    val rare = Seq((99L, "the dog ran"))
    val out2 = graft.queries.TextQueries.lmSurprisal((many ++ rare).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out2(10L) < out2(99L),
      s"boilerplate must score below rare text: ${out2(10L)} vs ${out2(99L)}")
    spark.catalog.clearCache()
  }

  test("q101 surprisal bands: ordered, non-overlapping, near-even thirds of the doc frame") {
    val out = SparkEntry.queries("q101_surprisal_bands")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("head", "middle", "tail"))
    val Seq(h, m, t) = out.toSeq
    assert(h._4 <= m._3 && m._4 <= t._3,
      s"bands must not overlap: head<=${h._4} middle=[${m._3},${m._4}] tail>=${t._3}")
    val n = out.map(_._2).sum
    out.foreach { case (b, cnt, _, _) =>
      // interpolated tertiles split near-evenly; ties can shift a band
      // by the tied mass, generously bounded here
      assert(math.abs(cnt - n / 3.0) <= n / 6.0, s"$b holds $cnt of $n — not a third")
    }
    spark.catalog.clearCache()
  }

  test("surprisalBandsApprox (q101's 100 TB path): sketch thresholds and band counts honor the rank-error contract") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.engine.Tables.documents(spark, sf)
    val exact = SparkEntry.queries("q101_surprisal_bands")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val scores = graft.queries.TextQueries.lmSurprisal(docs).persist()
    val n = scores.count()
    for (accuracy <- Seq(25, 10000)) {
      // the q59 window: rank guarantee is 1/accuracy — plus ONE
      // interpolation grid step (1/(n-1)), because the sketch returns a
      // SAMPLE while the exact path interpolates between two samples
      val eps = 2.0 / accuracy + 1.0 / (n - 1)
      val out = graft.queries.TextQueries.surprisalBandsApprox(docs, accuracy)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // bands partition the doc frame whatever the thresholds did
      assert(out.values.sum == n, s"acc=$accuracy: bands must partition the $n docs: $out")
      // each approx threshold must land inside the exact-percentile
      // window at p -+ 2/accuracy, and the docs that can legitimately
      // flip bands are exactly those whose score falls in a window —
      // count them and bound each band's drift by its boundaries' mass
      val Seq(p1, p2) = Seq(1.0 / 3, 2.0 / 3)
      val w = scores.agg(
        expr(s"percentile(mean_surprisal, array(${p1 - eps}, ${p1 + eps}, ${p2 - eps}, ${p2 + eps}))")
          .as("w")).collect()(0).getSeq[Double](0)
      val Seq(t1, t2) = {
        val r = scores.agg(
          expr(s"approx_percentile(mean_surprisal, array($p1, $p2), $accuracy)").as("ts"))
          .collect()(0).getSeq[Double](0)
        r.toSeq
      }
      assert(t1 >= w(0) && t1 <= w(1), s"acc=$accuracy: t1=$t1 outside exact window [${w(0)},${w(1)}]")
      assert(t2 >= w(2) && t2 <= w(3), s"acc=$accuracy: t2=$t2 outside exact window [${w(2)},${w(3)}]")
      val slack1 = scores.where(col("mean_surprisal").between(w(0), w(1))).count()
      val slack2 = scores.where(col("mean_surprisal").between(w(2), w(3))).count()
      assert(math.abs(out("head") - exact("head")) <= slack1,
        s"acc=$accuracy: head ${out("head")} vs exact ${exact("head")} beyond boundary mass $slack1")
      assert(math.abs(out.getOrElse("tail", 0L) - exact("tail")) <= slack2,
        s"acc=$accuracy: tail ${out.getOrElse("tail", 0L)} vs exact ${exact("tail")} beyond boundary mass $slack2")
      assert(math.abs(out.getOrElse("middle", 0L) - exact("middle")) <= slack1 + slack2,
        s"acc=$accuracy: middle drift beyond both boundaries' mass")
    }
    scores.unpersist()
    spark.catalog.clearCache()
  }

  test("bpeTrain: Sennrich merge rules on a hand corpus — overlap counting, left-to-right non-overlap merge, minCount stop") {
    import spark.implicits._
    // corpus: "aaab" x3, "ab" x2 -> pair counts step 1 (per POSITION,
    // overlaps included): (a,a) 2*3=6, (a,b) 3+2=5 -> merge (a,a).
    // "aaab" under (a,a) merges LEFT-TO-RIGHT NON-OVERLAPPING:
    // [a,a,a,b] -> [aa,a,b] (NOT [aa,aa...]); step 2 counts over the
    // rewritten vocab: (aa,a) 3, (a,b) 3+2=5 -> merge (a,b); step 3:
    // (aa,ab) 3 -> merge; step 4: no pair left with count >= 2 except
    // ... vocab now ["aaab"->aa+ab merged? after (aa,ab): [aaab] one
    // symbol; "ab" one symbol] -> NO pairs at all -> stop at 3 steps.
    val docs = (Seq.fill(3)("aaab") ++ Seq.fill(2)("ab")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = graft.queries.TextQueries.bpeTrain(docs, maxMerges = 10, minCount = 2L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1, "a", "a", 6L), (2, "a", "b", 5L), (3, "aa", "ab", 3L)),
      s"merge table mismatch: $m")
    // minCount binds: with the bar above every pair count, nothing merges
    val none = graft.queries.TextQueries.bpeTrain(docs, maxMerges = 10, minCount = 7L)
      .collect()
    assert(none.isEmpty, s"minCount=7 must learn no merges: ${none.toSeq}")
    // the tie order is (count DESC, s1 ASC, s2 ASC): "xy" x2, "xz" x2
    // both give count-2 first pairs (x,y)/(x,z) -> (x,y) wins
    val tie = Seq((1L, "xy xz"), (2L, "xy xz")).toDF("doc_id", "text")
    val t1 = graft.queries.TextQueries.bpeTrain(tie, maxMerges = 1, minCount = 2L)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(t1 == Seq(("x", "y")), s"tie must break to the ASC pair: $t1")
  }

  test("bpeEncode: replayed merges compress the hand corpus to hand-counted symbols; untrainable words count chars") {
    import spark.implicits._
    // same corpus as the trainer test: merges (a,a), (a,b), (aa,ab).
    // encode: "aaab" -> [aa,a,b] -> [aa,ab] -> [aaab] = 1 symbol;
    // "ab" -> [ab] after merge 2 = 1 symbol; "x" is 1-char
    // (untrainable) -> counts its 1 char
    val docs = (Seq.fill(3)(("aaab", "s1")) ++ Seq.fill(2)(("ab", "s2")) :+ (("x", "s2")))
      .zipWithIndex.map { case ((t, src), i) => (i.toLong, t, src) }
      .toDF("doc_id", "text", "source")
    val merges = graft.queries.TextQueries.bpeTrain(docs, maxMerges = 10, minCount = 2L)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val out = graft.queries.TextQueries.bpeEncode(docs, merges)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    // s1: 3 words, 12 chars, 3 bpe tokens; s2: "ab"x2 + "x" = 3 words,
    // 5 chars, 2 + 1 = 3 bpe tokens
    assert(out == Seq(("s1", 3L, 12L, 3L, 3.0 / 12.0), ("s2", 3L, 5L, 3L, 3.0 / 5.0)),
      s"encode accounting mismatch: $out")
    // order sensitivity: replaying the merges in REVERSE must not reach
    // the same compression ((aa,ab) fires only after (a,a) and (a,b))
    val rev = graft.queries.TextQueries.bpeEncode(docs, merges.reverse)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(rev("s1") > 3L, s"reversed merges must compress worse on s1: $rev")
  }

  test("tfidfTopTerms: hand-computed quantized idf; everywhere-terms self-suppress") {
    import spark.implicits._
    // N = 3; df: apple 3, banana/cherry/date 1
    // qidf: apple floor(log2 1) = 0; the others floor(log2 3) = 1
    val docs = Seq((1L, "apple banana", "s1"), (2L, "apple cherry", "s1"),
      (3L, "apple date", "s2")).toDF("doc_id", "text", "source")
    val out = graft.queries.TextQueries.tfidfTopTerms(docs, 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5), r.getInt(6)))
    assert(out.toSeq == Seq(
      ("s1", "banana", 1L, 1), ("s1", "cherry", 1L, 2), ("s1", "apple", 0L, 3),
      ("s2", "date", 1L, 1), ("s2", "apple", 0L, 2)),
      s"quantized tf-idf ranking: ${out.toSeq}")
    spark.catalog.clearCache()
  }

  test("bigramLmTop: exact conditional counts, tie-ordered k-cut, context threshold filters") {
    import spark.implicits._
    // one doc of "a b a c" x 25: bigrams (a,b)=25, (b,a)=25, (a,c)=25,
    // (c,a)=24. Context a: n_ctx=50, successors tie 25/25 -> next_tok
    // ASC orders b first. Contexts b (25) and c (24) fall below 50.
    val text = Seq.fill(25)("a b a c").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = graft.queries.TextQueries.bigramLmTop(docs, minCtx = 50, topK = 3)
      .orderBy("context", "next_tok")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(("a", "b", 25L, 50L, 0.5), ("a", "c", 25L, 50L, 0.5)),
      s"expected only context 'a' with tied 0.5/0.5 successors: $got")
    // k-cut: with topK = 1 the tie must keep 'b' alone
    val top1 = graft.queries.TextQueries.bigramLmTop(docs, minCtx = 50, topK = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(top1 == Seq(("a", "b")), s"tie must cut lexicographically: $top1")
    spark.catalog.clearCache()
  }

  test("dupClusters cap: clusters reachable only through hot buckets fragment exactly as documented") {
    import spark.implicits._
    // The scaladoc'd recall trade of dupClusters(maxBucket): a cluster
    // whose EVERY connecting band bucket is hot splits. Constructed
    // signature table (controlled band collisions cannot be produced
    // through the text hash pipeline):
    //   A(1)   [10,11,12,13, 90,91,92,93]   A-B collide in bands 0,1 (cool)
    //   B(2)   [10,11,12,13, 50,51,60,61]   B-C collide ONLY in bands 2,3
    //   C(3)   [70,71,72,73, 50,51,60,61]
    //   D(10)  exact replica of C (identical full signature)
    //   F4..F9 [2xx,3xx,4xx,5xx, 50,51,60,61]  six fillers heating bands 2,3
    // The band-2/3 buckets hold 8 DISTINCT signatures (B, C-rep, six
    // fillers) — the near-identical-but-distinct corpus shape the
    // exact-replica collapse cannot defuse. Every colliding pair has
    // est_sim = 4/8 = 0.5, so nothing is lost to the similarity floor.
    val sig = (Seq(
      (1L, 10L, 11L, 12L, 13L, 90L, 91L, 92L, 93L),
      (2L, 10L, 11L, 12L, 13L, 50L, 51L, 60L, 61L),
      (3L, 70L, 71L, 72L, 73L, 50L, 51L, 60L, 61L),
      (10L, 70L, 71L, 72L, 73L, 50L, 51L, 60L, 61L)) ++
      (4 to 9).map(i => (i.toLong, 200L + i, 300L + i, 400L + i, 500L + i, 50L, 51L, 60L, 61L)))
      .toDF("doc_id", "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7")
    def clusters(maxBucket: Option[Int]): Set[Set[Long]] =
      graft.queries.TextQueries.dupClustersOfSignatures(sig, maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    // uncapped: A-B (cool) + B-C and all filler pairs (hot bands) chain
    // everything into ONE cluster, D via C's signature group
    assert(clusters(None) == Set((1L to 10L).toSet),
      "uncapped, the hot-band edges must chain all ten docs into one cluster")
    // cap=3: bands 2,3 exceed the cap in every bucket, so the B-C edge —
    // whose every shared band is hot — drops, and the cluster fragments
    // to exactly {A,B} (the cool-band edge survives) + {C,D} (an exact-
    // replica signature group, which the cap can NEVER drop: the
    // collapse groups by full signature before any band join). The six
    // fillers lose their only edges and leave the output entirely.
    assert(clusters(Some(3)) == Set(Set(1L, 2L), Set(3L, 10L)),
      "capped, the documented fragmentation must be exact: cool edge kept, " +
        "hot-only edge dropped, exact-replica group intact, edgeless singletons gone")
    spark.catalog.clearCache()
  }

  test("dupClustersOfSignatures / bandedHashPairs: a tracking CacheScope releases every internal persist on close") {
    // r18 verdict #5: both helpers persist intermediates internally and
    // return lazily, so THEY can never unpersist — ownership must be
    // threadable to the caller. Under the untracked default the blocks
    // fall to the Bench/Verify clearCache contract (unchanged); a
    // tracking scope's close() must leave the context's persistent-RDD
    // registry exactly as it found it.
    import spark.implicits._
    spark.catalog.clearCache()
    val sig = (1L to 20L).map(i =>
        (i, i % 7, i % 5, i % 3, i % 2, 50L, 51L, 60L, 61L))
      .toDF("doc_id", "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7")
    val hashes = (1L to 20L).map(i => (i, i * 1024L + (i % 3)))
      .toDF("doc_id", "dhash")
    // Graph.connectedComponents truncates its per-round lineage through
    // localCheckpoint — those RDD blocks are NOT the scope's to release
    // (they free via ContextCleaner once the returned frame is
    // unreachable, the documented CacheScope caveat) — so the assertion
    // scopes to the cache-level persists the helpers create.
    def cached(): Set[Int] = spark.sparkContext.getPersistentRDDs
      .filterNot(_._2.toString.contains("localCheckpoint")).keySet.toSet
    val before = cached()
    val scope = new graft.engine.CacheScope
    graft.queries.TextQueries.dupClustersOfSignatures(sig, None, scope).count()
    graft.queries.MultimodalQueries.bandedHashPairs(hashes, cap = 8, scope = scope).count()
    assert(cached().size > before.size,
      "precondition: the helpers did persist intermediates")
    scope.close()
    assert(cached() == before,
      "close() must release every block the helpers persisted")
  }

  test("removeRepeatedLines: boilerplate drops corpus-wide, rare lines survive, all-boilerplate docs stay") {
    import spark.implicits._
    val boiler = "subscribe to the newsletter"
    // 12 docs with header + unique body + pair-shared line, plus one doc
    // that is NOTHING BUT the boilerplate — the all-removed edge the
    // synthetic q63 corpus cannot produce (its unique tail always survives)
    val docs = ((1L to 12L).map(i => (i, s"$boiler\nbody $i\npair ${i / 2}")) :+
      ((13L, boiler))).toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.removeRepeatedLines(docs, minDf = 10)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // boiler df = 13 >= 10 -> removed everywhere; pair df <= 2, body df = 1 -> kept in order
    assert(out(1L) == (("body 1\npair 0", 2L, 1L)))
    assert(out(4L) == (("body 4\npair 2", 2L, 1L)))
    // the all-boilerplate doc is not dropped: empty clean, accounting right
    assert(out(13L) == (("", 0L, 1L)))
    assert(out.size == 13)
  }

  test("q68 bigram rarity: unique gibberish scores 1.0, corpus-common text scores 0.0") {
    import spark.implicits._
    // 6 docs share one phrase verbatim (its bigrams occur 6 > 2 times);
    // one doc is unique gibberish (every bigram occurs once <= 2)
    val common = "the quick brown fox jumps"
    val docs = ((1L to 6L).map(i => (i, common, "en", "s", 25L)) :+
      ((7L, "zxq wvu tsr qpo nml", "en", "s", 19L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_q68").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q68_bigram_rarity")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // common doc: 4 bigrams, each with corpus count 6 -> rarity 0, avg 6
    assert(out(1L) == ((4L, 0L, 0.0, 6.0)), s"common text must score 0 rarity: $out")
    // gibberish doc: 4 bigrams, each count 1 -> rarity 1, avg 1
    assert(out(7L) == ((4L, 4L, 1.0, 1.0)), s"unique gibberish must score 1 rarity: $out")
    spark.catalog.clearCache()
  }

  test("q74 rule filters: each Gopher/C4 gate fires on exactly its defect class") {
    import spark.implicits._
    // one doc per defect, built so the targeted rule is the ONLY new
    // failure (except where the defect inherently breaks a second rule,
    // asserted explicitly): base = 59 five-letter words + 'the'
    val base = (Seq.fill(59)("alpha") :+ "the").mkString(" ")
    val docs = Seq(
      1L -> base, // clean: every rule passes
      2L -> (Seq.fill(9)("alpha") :+ "the").mkString(" "), // 10 words < 50
      3L -> (base + " # # # # # # # # # # # # ..."), // symbol ratio + ellipsis line
      4L -> (("intro" +: Seq.fill(19)("- alpha the")).mkString("\n")), // 19/20 bullet lines
      5L -> (base + " lorem ipsum dolor"),
      6L -> (base + " config { } done"),
      7L -> Seq.fill(55)("alpha").mkString(" "), // no stop word
      8L -> (Seq.fill(49)("abcdefghijkl") :+ "the").mkString(" "), // mean 11.8 > 10
      9L -> (base + " " + Seq.fill(30)("12345").mkString(" ")) // alpha 60/90 < 0.8
    ).toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.ruleFilters(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Boolean =
      out(id).getBoolean(out(id).fieldIndex(name))
    val rules = Seq("r_words", "r_wlen", "r_symbol", "r_bullet", "r_dots",
      "r_alpha", "r_stop", "r_lorem", "r_brace")
    assert(rules.forall(flag(1L, _)) && flag(1L, "keep"), s"clean doc must pass every gate")
    // exact-integer accounting: mean word length of doc 1 is (59*5+3)/60
    assert(out(1L).getDouble(out(1L).fieldIndex("mean_wlen")) == 298.0 / 60.0)
    val expectedFails = Map[Long, Set[String]](
      2L -> Set("r_words"),
      3L -> Set("r_symbol", "r_dots"), // 13 symbols / 73 words; the one line ends '...'
      4L -> Set("r_bullet", "r_alpha"), // '-' tokens are words, and non-alphabetic
      5L -> Set("r_lorem"),
      6L -> Set("r_brace"),
      7L -> Set("r_stop"),
      8L -> Set("r_wlen"),
      9L -> Set("r_alpha"))
    expectedFails.foreach { case (id, fails) =>
      val actual = rules.filterNot(flag(id, _)).toSet
      assert(actual == fails, s"doc $id: expected failures $fails, got $actual")
      assert(!flag(id, "keep"), s"doc $id must not be kept")
    }
  }

  test("q79 repetition signals: each class trips its designated gate; exact fractions; no-evidence docs keep") {
    import spark.implicits._
    val docs = Seq(
      1L -> (1 to 60).map(i => s"w$i").mkString(" "),          // clean
      2L -> "la lb lc\nld le\nld le\nld le",                   // 3 of 4 lines duplicated
      3L -> "pa pb\n\npc pd\n\npc pd",                         // 2 of 3 paragraphs duplicated
      4L -> ("t1 t2 t3 " + Seq.fill(10)("sp am").mkString(" ")), // one spammed 2-gram
      5L -> ((1 to 20).map(i => s"u$i").mkString(" ") + " " +
        Seq.fill(4)("f1 f2 f3 f4 f5").mkString(" ")),          // period-5 repeated span
      6L -> ((1 to 20).map(i => s"v$i").mkString(" ") + " " +
        Seq.fill(3)("g1 g2 g3 g4 g5 g6 g7 g8 g9 g10").mkString(" ")), // period-10 span
      7L -> "solo"                                             // single token: no gram evidence
    ).toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Boolean =
      out(id).getBoolean(out(id).fieldIndex(name))
    def frac(id: Long, name: String): Double =
      out(id).getDouble(out(id).fieldIndex(name))
    val gates = Seq("r_dup_line", "r_dup_line_char", "r_dup_para", "r_dup_para_char",
      "r_top2", "r_top3", "r_top4", "r_dup5", "r_dup6", "r_dup7", "r_dup8",
      "r_dup9", "r_dup10")
    // clean doc: every gate passes, zero duplicate evidence
    assert(gates.forall(flag(1L, _)) && flag(1L, "keep"))
    assert(frac(1L, "dup_line_frac") == 0.0 && frac(1L, "dup5gram_frac") == 0.0)
    // exact-integer accounting on the constructed corpora
    assert(frac(2L, "dup_line_frac") == 3.0 / 4.0)
    assert(frac(2L, "dup_line_char_frac") == 15.0 / 23.0) // 3 x "ld le" over 8+15 line chars
    assert(frac(3L, "dup_para_frac") == 2.0 / 3.0)
    // each class fails its DESIGNATED gate (family neighbors may fail
    // too — duplicated paragraphs duplicate their lines, a period-5
    // span duplicates its 6..10-grams; that is the battery's real
    // behavior, so only the designated gate is pinned)
    Seq(2L -> "r_dup_line", 3L -> "r_dup_para", 4L -> "r_top2",
      5L -> "r_dup5", 6L -> "r_dup10").foreach { case (id, g) =>
      assert(!flag(id, g), s"doc $id must fail $g")
      assert(!flag(id, "keep"), s"doc $id must not keep")
    }
    // a doc too short for any n-gram scores 0 everywhere and keeps
    assert(gates.forall(flag(7L, _)) && flag(7L, "keep"))
    assert(frac(7L, "top2gram_frac") == 0.0 && frac(7L, "dup10gram_frac") == 0.0)
  }

  test("q73 importance weights: target-profile docs score > 1, anti-target < gibberish < target") {
    import spark.implicits._
    // constructed corpus: 6 TARGET docs (en, quality 1.0 — 100 8-char
    // tokens, no stopwords/punct) each repeating phrase T 5x, so
    // T-grams carry heavy target mass; 6 German docs share phrase D;
    // three probe docs are all lang=de (never in the target slice), so
    // their scores come ONLY from their gram profiles:
    //   docT (id 100) = T once   -> target-heavy grams -> importance > 1
    //   docG (id 101) = gibberish -> OOV grams, smoothing prior ~0.5x
    //   docD (id 102) = D once   -> anti-target grams  -> lowest
    val T = (1 to 20).map(i => f"gram$i%02dxx").mkString(" ")
    val D = (1 to 20).map(i => f"dword$i%02dz").mkString(" ")
    val G = (1 to 20).map(i => f"uniq$i%02dqq").mkString(" ")
    val tgt = (1L to 6L).map(i => (i, Seq.fill(5)(T).mkString(" "), "en", "s"))
    val de = (11L to 16L).map(i => (i, D, "de", "s"))
    val probes = Seq((100L, T, "de", "s"), (101L, G, "de", "s"), (102L, D, "de", "s"))
    val docs = (tgt ++ de ++ probes)
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.queries.CurationQueries.importanceWeights(docs)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out(100L)._1 > 1.0 && out(100L)._2,
      s"a doc written in the target slice's vocabulary must be selected: $out")
    assert(!out(102L)._2 && out(102L)._1 < out(101L)._1 && out(101L)._1 < out(100L)._1,
      s"expected anti-target < gibberish < target-profile ordering: $out")
    // the target docs themselves: p ~= q on every gram, smoothing
    // prior > 1 -> selected
    assert((1L to 6L).forall(out(_)._2), s"target-slice docs must self-select: $out")
    // exact-integer accounting => partitioning-invariant, bit-for-bit
    val re = graft.queries.CurationQueries.importanceWeights(docs.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSet
    val base = graft.queries.CurationQueries.importanceWeights(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSet
    assert(re == base, "importance accounting must not depend on the partitioning")
    spark.catalog.clearCache()
  }

  test("q67 cluster reps: quality picks the rep; exact-replica ties break to the smaller doc_id") {
    import spark.implicits._
    // constructed corpus: docs 1 and 2 are EXACT replicas (identical
    // quality — the tie the sf0.01 oracle never exercises), doc 3 is a
    // one-token perturbation with MORE tokens (higher quality -> must
    // be the rep despite the larger id); docs 10/11 are an unrelated
    // cluster pair
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, t, "en", "s", t.length.toLong),
      (2L, t, "en", "s", t.length.toLong),
      (3L, t + " iota", "en", "s", (t.length + 5).toLong),
      (10L, "one two three four five six", "en", "s", 27L),
      (11L, "one two three four five seven", "en", "s", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_q67").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q67_cluster_reps")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // independently computed per-doc qualities, to pin rep_quality too
    val q = graft.queries.TextQueries.withQuality(
      graft.engine.Tables.documents(spark, dir))
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // cluster 1 = {1, 2, 3}: doc 3 has the highest quality (more tokens)
    assert(out(1L) == ((3L, 3L, q(3L))), s"doc 3 must out-rank the replicas: $out")
    // cluster 10 = {10, 11}: doc 11 higher quality (longer tokens)
    assert(out(10L) == ((2L, 11L, q(11L))), s"second cluster's rep must be doc 11: $out")
    // tie-break contract: drop doc 3 -> only the exact replicas remain,
    // identical quality, rep must be the SMALLER doc_id. A SECOND temp
    // dir, and caches cleared first: dupClusters persists its cluster
    // tables, and an overwrite at the SAME path would let the cache
    // manager substitute the stale clustering for a same-plan rerun
    spark.catalog.clearCache()
    val dir2 = java.nio.file.Files.createTempDirectory("graft_q67b").toString
    docs.where(col("doc_id") =!= 3L).write.mode("overwrite")
      .parquet(s"$dir2/documents.parquet")
    val tie = SparkEntry.queries("q67_cluster_reps")(spark, dir2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(tie(1L) == ((2L, 1L, q(1L))),
      s"equal-quality tie must keep the smaller doc_id: $tie")
    spark.catalog.clearCache()
  }

  test("urlFilter: exact and subdomain matches block, lookalike domains do not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x https://bad.com/a y"),                    // exact
      (2L, "x http://sub.deep.bad.com/a y"),            // subdomain, any depth
      (3L, "x https://notbad.com/a y"),                 // suffix LOOKALIKE: no dot boundary
      (4L, "x https://bad.com.evil.org/a y"),           // blocked domain as a PREFIX label
      (5L, "no urls here at all"),
      (6L, "two https://bad.com/1 hits http://a.bad.com/2 !"),
      (7L, "mixed case HTTPS://Bad.Com/x scheme and host"),  // RFC case-insensitive
      (8L, "with port https://bad.com:8080/x here"),         // host ends before :port
      (9L, "in prose see https://bad.com, which is bad"),    // trailing comma not host
      (10L, "sentence end https://bad.com. Next sentence")   // final period stripped
    ).toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.urlFilter(docs, Seq("bad.com"))
      .select("doc_id", "n_urls", "n_blocked")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L, 1L)) && out(2L) == ((1L, 1L)), "exact + subdomain must block")
    assert(out(3L) == ((1L, 0L)), "notbad.com must NOT match the bad.com suffix")
    assert(out(4L) == ((1L, 0L)), "bad.com.evil.org is a different registered domain")
    assert(out(5L) == ((0L, 0L)), "no URLs -> zero counts, row kept")
    assert(out(6L) == ((2L, 2L)), "every matching host counts")
    assert(out(7L) == ((1L, 1L)), "scheme and host match case-insensitively")
    assert(out(8L) == ((1L, 1L)), "a port must not defeat the host match")
    assert(out(9L) == ((1L, 1L)), "trailing prose punctuation is not part of the host")
    assert(out(10L) == ((1L, 1L)), "a sentence-final dot is stripped from the host")
    intercept[IllegalArgumentException] {
      graft.queries.CurationQueries.urlFilter(docs, Nil)
    }
    spark.catalog.clearCache()
  }

  test("removeRepeatedLines matches a driver-side model on random corpora") {
    import spark.implicits._
    // seeded random corpora mixing a shared line pool (some lines cross
    // the df threshold, some don't) with unique lines — the full
    // contract (df counting by DISTINCT doc, order-preserving
    // reassembly, kept/removed accounting) against an independent
    // in-memory model
    val rnd = new scala.util.Random(20260813)
    val minDf = 5L
    (1 to 2).foreach { _ =>
      val nDocs = 40 + rnd.nextInt(20)
      val pool = (1 to 12).map(i => s"pool line number $i")
      val docs = (1L to nDocs.toLong).map { id =>
        val lines = (1 to 1 + rnd.nextInt(6)).map { _ =>
          if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
          else s"uniq $id ${rnd.nextInt(1000)}"
        }
        (id, lines.mkString("\n"))
      }
      val hot = docs.flatMap { case (id, t) => t.split("\n", -1).distinct.map(l => (l, id)) }
        .groupBy(_._1).collect { case (l, rs) if rs.map(_._2).distinct.size >= minDf => l }
        .toSet
      val want = docs.map { case (id, t) =>
        val ls = t.split("\n", -1)
        val kept = ls.filterNot(hot)
        (id, kept.mkString("\n"), kept.length.toLong, (ls.length - kept.length).toLong)
      }.toSet
      val got = graft.queries.CurationQueries
        .removeRepeatedLines(docs.toDF("doc_id", "text"), minDf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want,
        s"model mismatch: extra=${got -- want} missing=${want -- got}")
    }
    spark.catalog.clearCache()
  }

  test("budgetSelect: quality-prefix semantics match a driver-side reference; over-budget head blocks its source") {
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = graft.queries.CurationQueries.budgetSelect(docs, 600L)
      .collect().map(r => r.getLong(1)).toSet
    // independent driver-side model: per source, sort by (quality desc,
    // doc_id), cumsum n_tok, keep while end <= budget — over the SAME
    // per-doc scores (the score formula itself is q31's oracle-proven)
    val scored = graft.queries.TextQueries.withQuality(docs)
      .select("source", "doc_id", "n_tok", "quality")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3)))
    val want = scored.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.toSeq.sortBy(r => (-r._4, r._2)).flatMap { r =>
        cum += r._3; if (cum <= 600L) Some(r._2) else None
      }
    }.toSet
    assert(got == want, s"kept-set mismatch: extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty && got.size < scored.length, "budget must bite but keep something")

    // blocking edge: the best-quality doc of a source exceeds the budget
    // alone -> cumulative end NEVER fits, the whole source is absent
    // (deterministic take-until-full, not skip-and-continue)
    val big = ("w" + " w" * 199)  // 200 tokens, highest quality (n_tok term)
    val small = "x y z"
    val synth = Seq((1L, big, "s1"), (2L, small, "s1"), (3L, small, "s2"))
      .toDF("doc_id", "text", "source")
    val kept = graft.queries.CurationQueries.budgetSelect(synth, 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept == Set(("s2", 3L)),
      s"s1's over-budget head must block s1 entirely, s2 unaffected: $kept")
    spark.catalog.clearCache()
  }

  test("mixtureSelect: sqrt-smoothed largest-remainder apportionment matches a driver-side reference; targets sum to B exactly") {
    import spark.implicits._
    val B = 12000L // ~45% of the corpus: every source keeps some and cuts some
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.queries.CurationQueries.mixtureSelect(docs, B).collect()
    val got = out.map(r => (r.getString(0), r.getLong(1))).toSet
    val gotAlloc = out.map(r => (r.getString(0), r.getLong(6))).toMap

    // independent model over the same oracle-proven per-doc scores
    val scored = graft.queries.TextQueries.withQuality(docs)
      .select("source", "doc_id", "n_tok", "quality")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3)))
    val tots = scored.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    val w = tots.map { case (s, t) => s -> math.floor(math.sqrt(t.toDouble)).toLong }
    val bigW = w.values.sum
    val base = w.map { case (s, x) => s -> (B * x) / bigW }
    val rem = w.map { case (s, x) => s -> (B * x) % bigW }
    val xtra = B - base.values.sum
    val rank = rem.toSeq.sortBy { case (s, r) => (-r, s) }.map(_._1).zipWithIndex.toMap
    val alloc = base.map { case (s, b) => s -> (b + (if (rank(s) < xtra) 1L else 0L)) }
    assert(alloc.values.sum == B, "largest remainder must apportion B exactly")
    assert(gotAlloc.forall { case (s, a) => alloc(s) == a },
      s"per-source targets must match the reference: $gotAlloc vs $alloc")

    val want = scored.groupBy(_._1).toSeq.flatMap { case (s, rows) =>
      var cum = 0L
      rows.toSeq.sortBy(r => (-r._4, r._2)).flatMap { r =>
        cum += r._3; if (cum <= alloc(s)) Some((s, r._2)) else None
      }
    }.toSet
    assert(got == want, s"kept-set mismatch: extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty && got.size < scored.length, "the budget must bite but keep something")
    spark.catalog.clearCache()
  }

  test("mixtureSelect: a remainder tie gives the +1 to the lexicographically first source") {
    import spark.implicits._
    // engineered totals: s1 16 tok, s2 16 tok, s3 4 tok -> weights 4/4/2,
    // W = 10; B = 17 -> bases 6/6/3 (sum 15), remainders 8/8/4, two +1s —
    // the 8-vs-8 tie must order s1 before s2, so allocs are 7/7/3
    // 1-token docs so the greedy prefix can observe every allocation
    // (the cut is a PREFIX rule — an over-budget head blocks its source)
    val synth = ((0 until 16).map(i => (100L + i, "w", "s1")) ++
      (0 until 16).map(i => (200L + i, "w", "s2")) ++
      (0 until 4).map(i => (300L + i, "w", "s3")))
      .toDF("doc_id", "text", "source")
    val out = graft.queries.CurationQueries.mixtureSelect(synth, 17L).collect()
    val alloc = out.map(r => (r.getString(0), (r.getLong(5), r.getLong(6)))).distinct
      .toMap
    assert(alloc == Map("s1" -> (4L, 7L), "s2" -> (4L, 7L), "s3" -> (2L, 3L)),
      s"tie must resolve lexicographically (allocs 7/7/3): $alloc")
    val keptPerSource = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(keptPerSource == Map("s1" -> 7, "s2" -> 7, "s3" -> 3),
      s"greedy fill of 1-token docs must hit the target exactly: $keptPerSource")
    spark.catalog.clearCache()
  }

  test("unimaxSelect: exact waterfilling matches a driver-side reference; both branches bind") {
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    // score once; choose B ≈ 95% of the corpus so the waterline lands
    // mid-corpus regardless of the synthetic totals' exact spread
    val scored = graft.queries.TextQueries.withQuality(docs)
      .select("source", "doc_id", "n_tok", "quality")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3)))
    val tots = scored.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    val B = tots.values.sum * 95 / 100
    val out = graft.queries.CurationQueries.unimaxSelect(docs, B).collect()
    val gotAlloc = out.map(r => (r.getString(0), (r.getLong(6), r.getBoolean(7), r.getLong(8))))
      .distinct.toMap

    // independent sequential waterfilling reference (the literal
    // UniMax Algorithm-1 loop the monotone-prefix windows replace)
    val asc = tots.toSeq.sortBy { case (s, t) => (t, s) } // cap = tot at maxEpochs=1
    var rem = B
    var left = asc.size
    val ref = scala.collection.mutable.Map[String, Long]()
    val satRef = scala.collection.mutable.Map[String, Boolean]()
    var pending = List.empty[String]
    asc.foreach { case (s, cap) =>
      if (pending.isEmpty && cap * left <= rem) {
        ref(s) = cap; satRef(s) = true; rem -= cap; left -= 1
      } else pending = s :: pending // once one source is unsaturated, all later are
    }
    val un = pending.sorted
    un.zipWithIndex.foreach { case (s, i) =>
      ref(s) = rem / un.size + (if (i < (rem % un.size)) 1L else 0L)
      satRef(s) = false
    }
    assert(satRef.values.exists(identity) && satRef.values.exists(!_),
      s"calibration must bind both branches: $satRef")
    assert(gotAlloc.keySet == ref.keySet &&
      gotAlloc.forall { case (s, (cap, sat, a)) =>
        cap == tots(s) && sat == satRef(s) && a == ref(s) },
      s"allocation mismatch: got=$gotAlloc want=${ref.toMap} sat=${satRef.toMap}")
    assert(ref.values.sum == B, "with an unsaturated source, Σalloc = B exactly")

    // kept set = the greedy prefix under each source's target
    val got = out.map(r => (r.getString(0), r.getLong(1))).toSet
    val want = scored.groupBy(_._1).toSeq.flatMap { case (s, rows) =>
      var cum = 0L
      rows.toSeq.sortBy(r => (-r._4, r._2)).flatMap { r =>
        cum += r._3; if (cum <= ref(s)) Some((s, r._2)) else None
      }
    }.toSet
    assert(got == want, s"kept-set mismatch: extra=${got -- want} missing=${want -- got}")
    spark.catalog.clearCache()
  }

  test("unimaxSelect: engineered boundary — saturation prefix, remainder +1 by source name, epoch scaling") {
    import spark.implicits._
    // 1-token docs so the greedy prefix observes every allocation:
    // totals s1 = 16, s2 = 16, s3 = 4
    val synth = ((0 until 16).map(i => (100L + i, "w", "s1")) ++
      (0 until 16).map(i => (200L + i, "w", "s2")) ++
      (0 until 4).map(i => (300L + i, "w", "s3")))
      .toDF("doc_id", "text", "source")
    // maxEpochs = 1, B = 17: ascending caps 4,16,16 — s3 saturates
    // (4·3 = 12 ≤ 17), then 13 splits 7/6 with the +1 to s1 (name asc)
    val a1 = graft.queries.CurationQueries.unimaxSelect(synth, 17L).collect()
      .map(r => (r.getString(0), (r.getBoolean(7), r.getLong(8)))).distinct.toMap
    assert(a1 == Map("s1" -> (false, 7L), "s2" -> (false, 6L), "s3" -> (true, 4L)),
      s"waterline must saturate s3 and split 7/6: $a1")
    // maxEpochs = 2 doubles every cap: now even s3's cap (8·3 = 24 > 17)
    // exceeds the uniform share — nobody saturates, B splits 6/6/5; s3's
    // allocation (5) exceeds its unique supply (4), so it keeps all 4
    val out2 = graft.queries.CurationQueries.unimaxSelect(synth, 17L, maxEpochs = 2L)
    val a2 = out2.collect().map(r => (r.getString(0), (r.getBoolean(7), r.getLong(8))))
      .distinct.toMap
    assert(a2 == Map("s1" -> (false, 6L), "s2" -> (false, 6L), "s3" -> (false, 5L)),
      s"doubled caps must unsaturate everyone and split 6/6/5: $a2")
    val kept2 = out2.collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(kept2 == Map("s1" -> 6, "s2" -> 6, "s3" -> 4),
      s"1-token greedy fill hits targets exactly, s3 capped by supply: $kept2")
    // B above every cap: the epoch bound binds — alloc = cap everywhere,
    // every doc kept, Σalloc < B and the surplus is honestly unallocated
    val a3 = graft.queries.CurationQueries.unimaxSelect(synth, 1000L).collect()
      .map(r => (r.getString(0), (r.getBoolean(7), r.getLong(8)))).distinct.toMap
    assert(a3 == Map("s1" -> (true, 16L), "s2" -> (true, 16L), "s3" -> (true, 4L)),
      s"over-budget must saturate everyone at cap: $a3")
    spark.catalog.clearCache()
  }

  test("hopping windows: every event lands in exactly two overlapping 1h/30m windows") {
    val sf = "/root/testdata/sf0.001"
    val events = graft.engine.Tables.events(spark, sf).count()
    val windowed = SparkEntry.queries("q98_hopping_window")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
    assert(windowed == 2 * events,
      s"window fan-out must be exactly 2x: $windowed vs 2*$events")
  }

  test("interleaveManifest: Bresenham stride keys interleave proportionally; positions are contiguous") {
    import spark.implicits._
    // A has 2 docs, B has 4: stride keys order to B A B B A B
    val docs = (Seq((10L, "A"), (11L, "A")) ++ (20L to 23L).map((_, "B")))
      .map { case (id, s) => (id, "x", s) }.toDF("doc_id", "text", "source")
    val out = graft.queries.CurationQueries.interleaveManifest(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._2).toSeq == Seq("B", "A", "B", "B", "A", "B"),
      s"stride interleave order: ${out.toSeq}")
    assert(out.map(_._1).toSeq == (1L to 6L), s"pos must be 1..N contiguous: ${out.map(_._1).toSeq}")
    // within-source order follows doc_id
    assert(out.filter(_._2 == "B").map(_._3).toSeq == Seq(20L, 21L, 22L, 23L))
    spark.catalog.clearCache()
  }

  test("q100 recipe: selection is a subset of curation, the manifest is contiguous over exactly the selected docs") {
    val out = SparkEntry.queries("q100_pretraining_recipe")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(8), r.getLong(9)))
    // (source, n_curated, capped, target, n_selected, first_pos, last_pos)
    out.foreach { case (s, nCur, _, _, nSel, first, last) =>
      assert(nSel <= nCur, s"$s: selection must be a subset of curation")
      assert(first >= 1 && last >= first, s"$s: manifest positions sane")
    }
    val totalSel = out.map(_._5).sum
    assert(out.map(_._7).max == totalSel,
      "the manifest's last position must equal the total selected count (contiguous, no gaps)")
    // the interleave spreads every source across the order: each source's
    // first selection lands in the first tenth, its last in the last tenth
    out.foreach { case (s, _, _, _, nSel, first, last) =>
      assert(first <= totalSel / 10 + nSel,
        s"$s: first position $first too deep for an even interleave")
      assert(last >= totalSel - totalSel / 10 - nSel,
        s"$s: last position $last too shallow for an even interleave")
    }
    spark.catalog.clearCache()
  }

  test("ORC round-trip preserves the documents schema and values") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/documents.orc"
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }
}
