package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated properties (SURVEY.md §5.3): invariants the
  * reference's architecture could violate (salted partitioner, worker
  * count changing results) and ours must not. Seeded sampling (no
  * scalatestplus bridge in the offline cache). */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val lineGen: Gen[String] =
    Gen.listOf(Gen.oneOf("hello", "world", "spark", "Data!", "MAP", "a", ""))
      .map(_.mkString(" "))
  private val linesGen: Gen[List[String]] = Gen.listOfN(30, lineGen)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def wc(lines: Seq[String], parts: Int): Map[String, Long] =
    lines.toDF("text").repartition(parts)
      .select(explode(split(lower(col("text")), "\\W+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("wordcount is invariant under partition count (num_maps/num_reduces analog)") {
    val partsGen = Gen.choose(1, 8)
    samples(linesGen.flatMap(l => partsGen.map(l -> _)), 8).foreach {
      case (lines, parts) if lines.nonEmpty =>
        assert(wc(lines, parts) == wc(lines, 1), s"parts=$parts")
      case _ =>
    }
  }

  test("shuffle partitioning is deterministic (fixes reference's salted hash, F4)") {
    // Python's salted str hash could route a key to different reducers in
    // different workers (SURVEY.md §2.1 F4); Spark's Murmur3 must not.
    samples(Gen.listOfN(20, Gen.alphaStr), 6).foreach { keys =>
      if (keys.nonEmpty) {
        def route = keys.toDF("k").select(pmod(hash(col("k")), lit(8)).as("p"))
          .collect().map(_.getInt(0)).toSeq
        assert(route == route)
        val a = route
        assert(a == route)
      }
    }
  }

  test("token conservation: sum of counts == total tokens emitted") {
    samples(linesGen, 8).foreach { lines =>
      if (lines.nonEmpty) {
        val total = lines.toDF("text")
          .select(explode(split(lower(col("text")), "\\W+")).as("word"))
          .filter(length(col("word")) > 0).count()
        assert(wc(lines, 4).values.sum == total)
      }
    }
  }

  test("rolling k-gram hash equals the direct polynomial on random strings") {
    val strGen = Gen.listOfN(40, Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    samples(strGen, 50).foreach { ns =>
      val rolled = queries.TextAnalysis.kgramHashes(ns)
      val k = 8; val b = 31L
      val direct =
        if (ns.length < k) Array.empty[Long]
        else Array.tabulate(ns.length - k + 1) { i =>
          var h = 0L
          (0 until k).foreach(j => h = h * b + ns.charAt(i + j))
          h
        }
      assert(rolled.sameElements(direct), s"mismatch on ${ns.take(20)}...")
    }
  }

  test("k-gram hashes iterate code points (non-BMP chars are ONE position)") {
    val ns = "a😀bcdefgh"   // a 😀(U+1F600) b c d e f g h
    val cps = ns.codePoints().toArray
    assert(cps.length == 9 && ns.length == 10)   // surrogate pair collapses
    val rolled = queries.TextAnalysis.kgramHashes(ns)
    assert(rolled.length == cps.length - 8 + 1)
    val direct = Array.tabulate(cps.length - 7) { i =>
      var h = 0L; (0 until 8).foreach(j => h = h * 31L + cps(i + j)); h
    }
    assert(rolled.sameElements(direct))
  }

  test("derived pack shard count: floored at 32, scales with corpus, capped") {
    import queries.TextAnalysis.derivedPackShards
    assert(derivedPackShards(0) == 32)
    assert(derivedPackShards(500) == 32)          // fixture scale → oracle layout
    assert(derivedPackShards(32 * 4096) == 32)    // last corpus at the floor
    assert(derivedPackShards(32 * 4096 + 1) == 33)
    assert(derivedPackShards(250000) == 62)       // the 50× probe: > 32-way
    assert(derivedPackShards(Long.MaxValue / 2) == 65536)  // task-count ceiling
    val pts = Seq(1L, 1000L, 100000L, 1000000L, 100000000L, 10000000000L)
    pts.zip(pts.tail).foreach { case (a, b) =>
      assert(derivedPackShards(a) <= derivedPackShards(b)) }
  }

  test("greedy packing invariants hold on random token lengths") {
    val docsGen = Gen.listOfN(25, Gen.choose(1, 120)).map(
      _.zipWithIndex.map { case (n, i) => (i.toLong, n) })
    samples(docsGen, 30).foreach { docs =>
      val budget = 100
      val packed = queries.TextAnalysis.packGreedy(docs.toArray, budget).toSeq
      assert(packed.map(_._1) == docs.map(_._1).sorted)        // all docs, in order
      val bySeq = packed.groupBy(_._2)
      bySeq.foreach { case (_, ds) =>
        assert(ds.map(_._3) == ds.indices.map(identity))       // contiguous positions
        val tot = ds.map(_._4).sum
        assert(tot <= budget || ds.length == 1)                // budget or lone overlong doc
      }
      // greedy tightness: first doc of seq s+1 would overflow seq s
      packed.sliding(2).foreach {
        case Seq((_, s1, _, _), (_, s2, _, n2)) if s2 == s1 + 1 =>
          assert(bySeq(s1).map(_._4).sum + n2 > budget)
        case _ =>
      }
    }
  }

  test("union-find labels match BFS components on random graphs") {
    val edgesGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L))).map(_.filter(e => e._1 != e._2))
    samples(edgesGen, 30).foreach { edges =>
      val got = queries.Dedup.unionFindLabels(edges.iterator).toMap
      // reference labeling: BFS from every node over the undirected graph
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val expect = nodes.map { n =>
        var frontier = Set(n); var seen = Set(n)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(x => adj.getOrElse(x, Set.empty)) -- seen
          seen ++= frontier
        }
        n -> seen.min
      }.toMap
      assert(got == expect)
    }
  }

  // ------------------------------------------------------------------
  // libm-ln hardening (r8 verdict #4): every micro-rounded ln weight the
  // three scorers emit is recomputed with 40-digit BigDecimal ln and
  // must (a) agree with the double path and (b) sit >= 1e-4 micros from
  // its floor boundary — so a DuckDB/JDK libm bump that moves ln by a
  // last-ulp fails HERE, not in a CORRECTNESS hash downstream.
  // ------------------------------------------------------------------

  private object BdLn {
    import java.math.{BigDecimal => BD, MathContext}
    val mc = new MathContext(40)
    private val Ln2 =
      new BD("0.6931471805599453094172321214581765680755")
    private val Two = new BD(2)
    private val Half = new BD("0.5")
    /** ln(x) to ~40 digits: power-of-two reduction + atanh series. */
    def ln(x: BD): BD = {
      require(x.signum > 0, s"ln domain: $x")
      var m = x; var k = 0
      while (m.compareTo(Two) >= 0) { m = m.divide(Two, mc); k += 1 }
      while (m.compareTo(Half) < 0) { m = m.multiply(Two, mc); k -= 1 }
      val z = m.subtract(BD.ONE).divide(m.add(BD.ONE), mc)
      val z2 = z.multiply(z, mc)
      var term = z; var sum = BD.ZERO; var j = 1
      while (term.abs.compareTo(new BD("1e-45")) > 0) {
        sum = sum.add(term.divide(new BD(j), mc), mc)
        term = term.multiply(z2, mc); j += 2
      }
      sum.multiply(Two, mc).add(Ln2.multiply(new BD(k), mc), mc)
    }
    /** Exact BD of the IEEE double (the division is a single exact-
      * rounded op identical on both engines; only ln is libm). */
    def ofDouble(d: Double): BD = new BD(d)
    /** Checks x_exact = (hi − lo)·1e6 + 0.5 agrees with the double-path
      * long AND is >= `minMargin` micros away from its floor boundary.
      * The physical flip risk is a few ulps of the libm ln result: for
      * |ln q| <= 20 that is <= ~4e-15, i.e. <= ~4e-9 MICROS — even the
      * loosest margin below keeps >10^3x headroom. The default 1e-4 is
      * the original (very conservative) dsir bar; term-dense consumers
      * (KM's ~10^3 calendar terms, where min boundary distance shrinks
      * as 1/terms) pass an explicit smaller bound. */
    def checkMicros(label: String, exact: BD, doublePath: Long,
                    minMargin: Double = 1e-4): Unit = {
      val scaled = exact.multiply(new BD(1000000), mc).add(Half, mc)
      val fl = scaled.setScale(0, java.math.RoundingMode.FLOOR)
      assert(fl.longValueExact() == doublePath,
        s"$label: BigDecimal micros ${fl} != double path $doublePath")
      val frac = scaled.subtract(fl).doubleValue()
      val margin = math.min(frac, 1 - frac)
      assert(margin >= minMargin,
        s"$label: value $scaled sits $margin micros from a floor boundary" +
          " — a libm ulp could flip the emitted weight")
    }
  }

  test("dsir/nb/bigram ln weights: BigDecimal recomputation agrees, off-boundary") {
    import java.math.{BigDecimal => BD}
    val sf = TestSpark.sf
    val B = queries.TextAnalysis.HashBuckets.toLong
    // DSIR per-bucket log-ratio weights
    val dsir = queries.TextAnalysis.dsirBucketCounts(spark, sf).collect()
    assert(dsir.nonEmpty)
    dsir.foreach { r =>
      val (cr, ct) = (r.getAs[Long]("cnt_raw"), r.getAs[Long]("cnt_tgt"))
      val (tr, tt) = (r.getAs[Long]("tot_raw"), r.getAs[Long]("tot_tgt"))
      val qT = (ct + 1).toDouble / (tt + B)
      val qR = (cr + 1).toDouble / (tr + B)
      val dp = math.floor((math.log(qT) - math.log(qR)) * 1e6 + 0.5).toLong
      BdLn.checkMicros(s"dsir b=${r.getAs[Long]("b")}",
        BdLn.ln(BdLn.ofDouble(qT)).subtract(BdLn.ln(BdLn.ofDouble(qR)), BdLn.mc), dp)
    }
    // NB per-bucket weights + class prior
    val nb = queries.TextAnalysis.nbBucketCounts(spark, sf).collect()
    assert(nb.nonEmpty)
    nb.foreach { r =>
      val (cp, cf) = (r.getAs[Long]("cnt_p"), r.getAs[Long]("cnt_f"))
      val (tp, tf) = (r.getAs[Long]("tot_p"), r.getAs[Long]("tot_f"))
      val qP = (cp + 1).toDouble / (tp + B)
      val qF = (cf + 1).toDouble / (tf + B)
      val dp = math.floor((math.log(qP) - math.log(qF)) * 1e6 + 0.5).toLong
      BdLn.checkMicros(s"nb b=${r.getAs[Long]("b")}",
        BdLn.ln(BdLn.ofDouble(qP)).subtract(BdLn.ln(BdLn.ofDouble(qF)), BdLn.mc), dp)
    }
    val pr = queries.TextAnalysis.nbPriorCounts(spark, sf).head()
    val (np, nf) = (pr.getAs[Long]("n_p"), pr.getAs[Long]("n_f"))
    val dpPrior =
      math.floor((math.log((np + 1).toDouble) - math.log((nf + 1).toDouble))
        * 1e6 + 0.5).toLong
    BdLn.checkMicros("nb prior",
      BdLn.ln(new BD(np + 1)).subtract(BdLn.ln(new BD(nf + 1)), BdLn.mc), dpPrior)
    // Bigram stupid-backoff: distinct (c12, c1) seen tuples and distinct
    // (c2, n, v) backoff tuples — the full per-position value space
    val bj = queries.TextAnalysis.bigramJoined(spark, sf)
    val ln04 = BdLn.ofDouble(math.log(0.4)) // the shared double literal
    val seen = bj.filter(col("c12").isNotNull)
      .select("c12", "c1").distinct().collect()
    assert(seen.nonEmpty)
    seen.foreach { r =>
      val (c12, c1) = (r.getAs[Long]("c12"), r.getAs[Long]("c1"))
      val q = c12.toDouble / c1
      val dp = math.floor(-math.log(q) * 1e6 + 0.5).toLong
      BdLn.checkMicros(s"bigram seen ($c12,$c1)",
        BdLn.ln(BdLn.ofDouble(q)).negate(), dp)
    }
    val backoff = bj.filter(col("c12").isNull)
      .select(coalesce(col("c2"), lit(0L)).as("c2"), col("n_train"), col("v_train"))
      .distinct().collect()
    backoff.foreach { r =>
      val (c2, n, v) = (r.getAs[Long]("c2"), r.getAs[Long]("n_train"),
        r.getAs[Long]("v_train"))
      val q = (c2 + 1).toDouble / math.max(n + v, 1L)
      val dp = math.floor(-(math.log(0.4) + math.log(q)) * 1e6 + 0.5).toLong
      BdLn.checkMicros(s"bigram backoff ($c2,$n,$v)",
        ln04.add(BdLn.ln(BdLn.ofDouble(q)), BdLn.mc).negate(), dp)
    }
  }

  test("km_ship_survival ln terms: BigDecimal recomputation agrees, off-boundary; sum reconstructs") {
    val sf = TestSpark.sf
    val rows = queries.Relational.kmShipSurvival(spark, sf).collect()
    assert(rows.nonEmpty)
    var lnSum = 0L
    var zeroHit = false
    rows.foreach { r =>
      val (t, n, d) = (r.getAs[Int]("t_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_event"))
      if (d > 0 && d < n) {
        val q = (n - d).toDouble / n
        val dp = math.floor(math.log(q) * 1e6 + 0.5).toLong
        BdLn.checkMicros(s"km t=$t ($d/$n)", BdLn.ln(BdLn.ofDouble(q)), dp,
          minMargin = 1e-6)
        lnSum += dp
      }
      if (d > 0 && d >= n) zeroHit = true
      if (zeroHit) assert(r.isNullAt(r.fieldIndex("ln_surv_micro")),
        s"t=$t: ln_surv must be NULL once the curve hits zero")
      else assert(r.getAs[Long]("ln_surv_micro") == lnSum,
        s"t=$t: ln_surv ${r.getAs[Long]("ln_surv_micro")} != recomputed $lnSum")
    }
  }

  test("zipf_fit ln coordinates: BigDecimal recomputation agrees, off-boundary") {
    import java.math.{BigDecimal => BD}
    val sf = TestSpark.sf
    // rank coordinates are the fixed constants ln(1..100) — worst
    // boundary margin across them is ~4.6e-3 micros (precomputed)
    (1 to queries.TextAnalysis.ZipfTopN).foreach { rk =>
      val dp = math.floor(math.log(rk.toDouble) * 1e6 + 0.5).toLong
      BdLn.checkMicros(s"zipf rank $rk", BdLn.ln(new BD(rk)), dp,
        minMargin = 1e-3)
    }
    // count coordinates are fixture-dependent
    val counts = queries.TextJobs.wordcount(spark, sf).collect()
      .map(_.getAs[Long]("cnt")).sortBy(-_).take(queries.TextAnalysis.ZipfTopN)
    assert(counts.nonEmpty)
    counts.distinct.foreach { c =>
      val dp = math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong
      BdLn.checkMicros(s"zipf count $c", BdLn.ln(new BD(c)), dp,
        minMargin = 1e-5)
    }
  }

  test("lateAuditCore bin decomposition == single-threaded reference fold") {
    // the distributed prefix-max (span bins + carry fold + within-bin
    // windows) must equal a literal left-to-right fold over arrival
    // order, on arrival clocks with heavy ties, inversions and bursts
    val hourUs = 3600L * 1000000
    val delayUs = 3600L * 1000000
    for (seed <- Seq(11L, 23L, 47L)) {
      def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L
      val base = 1700000000000000L
      val rows = (0 until 4000).map { i =>
        val s1 = lcg(seed * 1000003 + i)
        // ms-aligned event time: java.sql.Timestamp(ms) round-trips it
        // exactly under the pinned-UTC session and JVM
        val ts = base +
          java.lang.Math.floorMod(s1 >>> 11, 30L * 86400 * 1000L) * 1000L
        val s2 = lcg(s1)
        // bursty arrival: 1/4 of rows share one of 16 arrival instants
        val arr =
          if (java.lang.Math.floorMod(s2 >>> 7, 4L) == 0)
            base + java.lang.Math.floorMod(s2 >>> 13, 16L) * 86400000000L
          else ts + java.lang.Math.floorMod(s2 >>> 17, 6L * 3600 * 1000000L)
        (i.toLong, new java.sql.Timestamp(ts / 1000), arr, ts)
      }
      // reference: literal fold over (arr, id) order
      var hw = Long.MinValue
      val expect = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      rows.sortBy(r => (r._3, r._1)).foreach { case (_, _, _, ts) =>
        val win = ts / hourUs * hourUs
        val late = hw != Long.MinValue && win + hourUs <= hw - delayUs
        val (n, l) = expect.getOrElse(win, (0L, 0L))
        expect(win) = (n + 1, if (late) l + 1 else l)
        hw = math.max(hw, ts)
      }
      val df = rows.map { case (id, tsj, arr, _) => (id, tsj, arr) }
        .toDF("event_id", "ts", "arr_us")
      val got = graft.streaming.StreamingJobs.lateAuditCore(spark, df, delayUs)
        .collect()
        .map(r => r.getTimestamp(0).getTime * 1000L ->
          ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expect.toMap, s"seed $seed: bin decomposition diverged")
      assert(expect.values.map(_._2).sum > 0, s"seed $seed: vacuous (no late rows)")
    }
  }

  test("Det.halfUpDiv == BigDecimal floor(a/b + 1/2) past 2^53, where the double path diverges") {
    import graft.queries.Det
    def ref(num: BigInt, den: BigInt): Long = {
      // independent reference: BigDecimal division at guard-digit scale,
      // then floor(x + 1/2) in exact decimal
      val q = new java.math.BigDecimal(num.bigInteger)
        .divide(new java.math.BigDecimal(den.bigInteger), 40,
          java.math.RoundingMode.FLOOR)
      q.add(new java.math.BigDecimal("0.5"))
        .setScale(0, java.math.RoundingMode.FLOOR).longValueExact()
    }
    val two53 = BigInt(1) << 53
    // ingest_drift-shaped operands: num = Σ|dev|·1e6 (≤ 2·nc·ns·1e6),
    // den = 2·nc·ns, at nc/ns magnitudes where nc·ns blows past 2^53
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 2000) {
      val nc = BigInt(rnd.nextLong(1L << 40) + 1)
      val ns = BigInt(rnd.nextLong(1L << 40) + 1)
      val den = nc * ns * 2
      val num = (BigInt(rnd.nextLong().abs) % (den + 1)) * 1000000L
      assert(Det.halfUpDiv(num, den) == ref(num, den),
        s"halfUpDiv($num, $den) != BigDecimal reference")
    }
    // boundary exactness: a numerator landing EXACTLY on the .5 line
    // rounds up on both paths (half-up, not banker's)
    assert(Det.halfUpDiv(BigInt(3), BigInt(2)) == 2L) // 1.5 -> 2
    assert(Det.halfUpDiv(BigInt(1), BigInt(2)) == 1L) // 0.5 -> 1
    assert(Det.halfUpDiv(BigInt(0), BigInt(7)) == 0L)
    // non-vacuous: exhibit the divergence the exact form closes — an odd
    // numerator just past 2^53 is unrepresentable in double, and the old
    // floor(double + 0.5) path lands one ulp low
    val sdev = two53 + 1            // odd: doubleValue rounds to 2^53
    val nc1 = 1000000L; val ns1 = 1L
    val exact = Det.halfUpDiv(sdev * 1000000L, BigInt(nc1) * ns1 * 2)
    val doublePath = math.floor(
      new java.math.BigDecimal(sdev.bigInteger).doubleValue * 1e6
        / (2.0 * nc1 * ns1) + 0.5).toLong
    assert(exact == ref(sdev * 1000000L, BigInt(nc1) * ns1 * 2))
    assert(exact != doublePath,
      "expected the double path to diverge at 2^53+1 — case is vacuous")
  }
}
