package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.engine.Features
import graft.expressions.TextHash

/** Property-based checks (SURVEY.md §5): totality and boundary laws of
  * the feature expressions, and structural invariants of the compiled
  * text-hash kernels. ScalaCheck is driven programmatically (no
  * scalatest bridge in the offline cache). */
class PropertySpec extends SparkSpec {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val doc: Gen[List[String]] = Gen.choose(0, 30).flatMap(Gen.listOfN(_, word))

  test("minhash: null iff < 3 tokens; 8 chunks in [0, 2^32)") {
    check(Prop.forAll(doc) { toks =>
      val sig = TextHash.minhash(UTF8String.fromString(toks.mkString(" ")))
      if (toks.length < 3) sig == null
      else sig.numElements() == 8 &&
        (0 until 8).forall { i => val v = sig.getLong(i); v >= 0 && v < (1L << 32) }
    })
  }

  test("minhash is whitespace-normalization invariant") {
    val seps = Gen.oneOf(" ", "  ", "\t", " \t ", "\n")
    check(Prop.forAll(doc.suchThat(_.length >= 3), seps) { (toks, sep) =>
      val a = TextHash.minhash(UTF8String.fromString(toks.mkString(" ")))
      val b = TextHash.minhash(UTF8String.fromString(toks.mkString(sep)))
      (0 until 8).forall(i => a.getLong(i) == b.getLong(i))
    })
  }

  test("shingleHashes: distinct count bounded by n-2; superset under concat") {
    check(Prop.forAll(doc.suchThat(_.length >= 3)) { toks =>
      val t = toks.mkString(" ")
      val hs = TextHash.shingleHashes(UTF8String.fromString(t))
      val hs2 = TextHash.shingleHashes(UTF8String.fromString(t + " " + t))
      val set1 = (0 until hs.numElements()).map(hs.getLong).toSet
      val set2 = (0 until hs2.numElements()).map(hs2.getLong).toSet
      hs.numElements() <= toks.length - 2 && set1.subsetOf(set2)
    })
  }

  test("winnow: null iff < k+w-1 chars; fingerprints ⊆ k-gram hashes; count bounded") {
    val k = 8; val w = 4
    def gramHash(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val b = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    }
    val text: Gen[String] = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    check(Prop.forAll(text) { s =>
      val fps = TextHash.winnow(UTF8String.fromString(s), k, w)
      if (s.length < k + w - 1) fps == null
      else {
        val grams = (0 to s.length - k).map(i => gramHash(s.substring(i, i + k))).toSet
        val got = (0 until fps.numElements()).map(fps.getLong).toSet
        fps.numElements() >= 1 && fps.numElements() <= s.length - k - w + 2 &&
          got.subsetOf(grams)
      }
    })
  }

  test("winnow guarantee: a shared window-long substring yields a shared fingerprint") {
    // the winnowing paper's matching guarantee: any common substring of
    // length >= k+w-1 leaves at least one common fingerprint
    val k = 8; val w = 4
    val piece: Gen[String] = Gen.choose(k + w - 1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    check(Prop.forAll(piece, piece, piece) { (common, pre, post) =>
      val a = TextHash.winnow(UTF8String.fromString(pre + common), k, w)
      val b = TextHash.winnow(UTF8String.fromString(common + post), k, w)
      val sa = (0 until a.numElements()).map(a.getLong).toSet
      val sb = (0 until b.numElements()).map(b.getLong).toSet
      sa.intersect(sb).nonEmpty
    }, n = 100)
  }

  test("tempCategory: total on (-100,100], null outside, right-closed bins") {
    val ref: Double => Option[String] = t =>
      if (t <= -100 || t > 100) None
      else if (t <= 0) Some("very_cold") else if (t <= 10) Some("cold")
      else if (t <= 20) Some("mild") else if (t <= 30) Some("warm") else Some("hot")
    val temps = Gen.oneOf(
      Gen.choose(-150.0, 150.0),
      Gen.oneOf(-100.0, 0.0, 10.0, 20.0, 30.0, 100.0, 100.0000001))
    check(Prop.forAll(Gen.listOfN(64, temps)) { ts =>
      val rows = spark.createDataFrame(
        spark.sparkContext.parallelize(ts.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.DoubleType))))
        .select(col("t"), Features.tempCategory(col("t")).as("c")).collect()
      rows.forall(r => (if (r.isNullAt(1)) None else Some(r.getString(1))) == ref(r.getDouble(0)))
    }, n = 10)
  }

  test("aqi: threshold gaps return Unknown; categories partition the line") {
    val ref: Double => String = v =>
      if (v <= 50) "Good"
      else if (v >= 51 && v <= 100) "Moderate"
      else if (v >= 101 && v <= 200) "Unhealthy"
      else if (v >= 201 && v <= 300) "Very Unhealthy"
      else if (v > 300) "Hazardous"
      else "Unknown" // the deliberate gaps: (50,51), (100,101), (200,201), (300,301)
    val vals = Gen.oneOf(Gen.choose(0.0, 400.0), Gen.choose(50.0, 51.0),
      Gen.choose(100.0, 101.0), Gen.choose(200.0, 201.0), Gen.choose(300.0, 301.0))
    check(Prop.forAll(Gen.listOfN(64, vals)) { vs =>
      val rows = spark.createDataFrame(
        spark.sparkContext.parallelize(vs.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
        .select(col("v"), Features.aqiCategory(col("v")).as("c")).collect()
      rows.forall(r => r.getString(1) == ref(r.getDouble(0)))
    }, n = 10)
  }

  test("severity: linear in pm2_5 with slope 5; nulls contribute zero") {
    val df = spark.range(0, 50).toDF("i")
      .withColumn("x", col("i").cast("double"))
      .select(
        Features.severity(col("x"), lit(null), lit(null), lit(null), lit(null), lit(null)).as("s1"),
        Features.severity(col("x") + 1, lit(null), lit(null), lit(null), lit(null), lit(null)).as("s2"))
      .collect()
    assert(df.forall(r => r.getDouble(1) - r.getDouble(0) == 5.0))
  }

  // ---- sketch-family laws (CmsAgg / BloomAgg / HllAgg), driven through
  // the Aggregator methods directly: the laws are about the fold
  // algebra, and the Spark plumbing is already pinned by the specs

  private def foldCms(agg: graft.ext.CmsAgg, ks: Seq[String]): Array[Long] =
    ks.foldLeft(agg.zero)(agg.reduce)

  test("CMS law: estimate >= exact for EVERY key under random corpora and random splits") {
    val corpus = Gen.choose(0, 120).flatMap(Gen.listOfN(_, word))
    check(Prop.forAll(corpus, Gen.choose(0, 120)) { (ks, cut) =>
      val agg = new graft.ext.CmsAgg(3, 32)
      val (a, b) = ks.splitAt(cut min ks.length)
      val merged = agg.merge(foldCms(agg, a), foldCms(agg, b))
      val exact = ks.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (k, n) =>
        (0 until 3).map(s => merged(s * 32 + graft.ext.CmsAgg.bucket(s, k, 32))).min >= n
      }
    }, n = 100)
  }

  test("Bloom law: no false negatives under random keys and random splits") {
    val keys = Gen.choose(0, 80).flatMap(Gen.listOfN(_, Gen.choose(Long.MinValue, Long.MaxValue)))
    check(Prop.forAll(keys, Gen.choose(0, 80)) { (ks, cut) =>
      val agg = new graft.ext.BloomAgg(256, 3)
      val (a, b) = ks.splitAt(cut min ks.length)
      val bits = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      ks.forall { k =>
        (0 until 3).forall { s =>
          val pos = (graft.ext.CmsAgg.saltedHash(s, k.toString) % 256).toInt
          ((bits(pos >> 6) >> (pos & 63)) & 1L) == 1L
        }
      }
    }, n = 100)
  }

  test("audioFingerprint laws: gain/negation invariance, channel-sum mixdown, bounded perturbation") {
    import graft.ext.Multimodal.audioFingerprint
    // bounded samples keep 3x gain inside Short range
    val samples = Gen.choose(8, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-9000, 9000).map(_.toShort)))
    check(Prop.forAll(samples) { s =>
      val a = s.toArray
      val fp = audioFingerprint(a, 1)
      // positive gain preserves every energy ORDERING -> identical bits
      val gained = audioFingerprint(a.map(v => (v * 3).toShort), 1) == fp
      // energy is |channel sum| -> negation invariant
      val negated = audioFingerprint(a.map(v => (-v).toShort), 1) == fp
      // a stereo stream whose frames SUM to the mono stream mixes down
      // to the same energy sequence
      val stereo = audioFingerprint(
        a.flatMap(v => Array((v - 7).toShort, 7.toShort)), 2) == fp
      // determinism on a defensive copy
      val det = audioFingerprint(a.clone(), 1) == fp
      gained && negated && stereo && det
    }, n = 100)
    // one-frame perturbation moves at most the comparisons that frame
    // joins: each frame is read by <= ceil(65/nf) positions, each in
    // <= 2 comparisons -> hamming bound 2 * (65/nf + 1)
    val cases = for {
      n <- Gen.choose(8, 200); i <- Gen.choose(0, n - 1)
      s <- Gen.listOfN(n, Gen.choose(-9000, 9000).map(_.toShort))
      v <- Gen.choose(-9000, 9000).map(_.toShort)
    } yield (s, i, v)
    check(Prop.forAll(cases) { case (s, i, v) =>
      val a = s.toArray
      val b = a.clone(); b(i) = v
      val d = java.lang.Long.bitCount(
        audioFingerprint(a, 1) ^ audioFingerprint(b, 1))
      d <= 2 * (65 / a.length + 1)
    }, n = 100)
  }

  test("HLL law: merge is commutative, associative, idempotent under random splits") {
    val keys = Gen.choose(0, 100).flatMap(Gen.listOfN(_, word))
    check(Prop.forAll(keys, Gen.choose(0, 100)) { (ks, cut) =>
      val agg = new graft.ext.HllAgg(4)
      def fold(s: Seq[String]) = s.foldLeft(agg.zero)(agg.reduce)
      val (a, b) = ks.splitAt(cut min ks.length)
      val ab = agg.merge(fold(a), fold(b))
      val ba = agg.merge(fold(b), fold(a))
      val whole = fold(ks)
      val idem = agg.merge(fold(ks), fold(ks))
      ab.toSeq == ba.toSeq && ab.toSeq == whole.toSeq && idem.toSeq == whole.toSeq
    }, n = 100)
  }
}
