package graft

import graft.yelp.Transforms
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2.4): totality of the CASE
  * chains, first-match consistency of the category mapping against an
  * independent Scala model, state-map pass-through, dedup idempotence,
  * and fingerprint algebra. Generators are ScalaCheck `Gen`s pulled
  * with fixed seeds (deterministic — no scalatestplus bridge needed);
  * each property batches its samples into ONE Spark job.
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** n deterministic samples from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xC0FFEEL + i)))

  test("sentiment is total: every star value maps to exactly one label") {
    val stars = samples(Gen.chooseNum(-10.0, 10.0), 100) ++
      Seq(2.0, 3.0, 4.0, 2.5, 3.0000001) // boundary pins
    val got = stars.toDF("stars")
      .select($"stars", Transforms.sentiment($"stars").as("s"))
      .collect()
    got.foreach { r =>
      val v = r.getDouble(0)
      val want =
        if (v <= 2) "negative" else if (v == 3) "neutral" else "positive"
      assert(r.getString(1) === want, s"stars=$v")
    }
  }

  test("super-category matches an independent first-match model") {
    val words = Gen.oneOf("Restaurants", "Food", "Bars", "Gyms", "Books",
      "Plumbing", "Xyz", "Tutoring Centers", "Pet Stores", "noise")
    val catGen = Gen.listOfN(3, words).map(_.mkString(", "))
    def model(c: String): String =
      if (c == null) "Other"
      else Transforms.keywordOrder.find(p => c.contains(p._1))
        .map(_._2).getOrElse("Other")
    val cats = samples(catGen, 200)
    val got = cats.toDF("c")
      .select($"c", Transforms.superCategory($"c").as("chain"),
        ext.SuperCategoryExpr.superCategory($"c",
          Transforms.keywordOrder).as("native"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) === model(r.getString(0)), r.getString(0))
      assert(r.getString(2) === model(r.getString(0)), r.getString(0))
    }
  }

  test("state normalization: mapped codes translate, all else passes through") {
    val codes = (Transforms.stateNames.keys.toSeq ++
      Seq("QC", "NY", "ZZ", "", "delaware", "de")).distinct
    val got = codes.toDF("state")
      .select($"state", Transforms.normalizeState($"state").as("s"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) ===
        Transforms.stateNames.getOrElse(r.getString(0), r.getString(0)))
    }
  }

  test("dropDuplicates is idempotent with exact distinct cardinality") {
    val lists = samples(Gen.listOfN(30, Gen.chooseNum(0, 10)), 10)
      .filter(_.nonEmpty)
    lists.foreach { xs =>
      val df = xs.toDF("x")
      val once = df.dropDuplicates()
      assert(once.count() === xs.distinct.size.toLong)
      assert(once.dropDuplicates().count() === once.count())
    }
  }

  test("codegen DotProductExpr ≡ interpreted zip_with/aggregate fold " +
      "bit-for-bit (same ascending-index summation order)") {
    val gen = Gen.listOfN(8,
      Gen.chooseNum(-1e3, 1e3).map(x => math.rint(x * 1e6) / 1e6))
    val pairs = samples(Gen.zip(gen, gen), 150)
    val df = pairs.toDF("a", "b").select(
      graft.ext.DotProductExpr.dotProduct($"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("model"))
      .collect()
    // bit-identical, not approximately equal: both fold in index order
    df.foreach(r => assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
      === java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("codegen PolyHashExpr ≡ interpreted split/ascii fold (incl. unicode, empty)") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf('a', 'Z', '9', ' ', '的', 'é', 'ß', '!'))
        .map(_.mkString),
      Gen.const(""), Gen.const(" a  b "))
    val strs = samples(gen, 200).distinct
    val df = strs.toDF("s").select(
      scale.TextOps.polyHash($"s", 31L).as("native"),
      scale.TextOps.polyHashInterpreted($"s", 31L).as("model"),
      scale.TextOps.polyHash($"s", 37L).as("native37"),
      scale.TextOps.polyHashInterpreted($"s", 37L).as("model37"))
      .collect()
    df.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("codegen ByteSumExpr ≡ interpreted hex-pair fold and a JVM " +
      "model (incl. unicode, empty, high bytes)") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf('a', 'Z', '9', ' ', '的', 'é', 'ß', '!'))
        .map(_.mkString),
      Gen.const(""), Gen.const("ÿ"))
    val strs = samples(gen, 200).distinct
    val rows = strs.toDF("s")
      .select($"s", graft.ext.ByteSumExpr.byteSum($"s".cast("binary"))
        .as("native"),
        expr("case when octet_length(cast(s as binary)) = 0 then 0L" +
          " else aggregate(sequence(1, octet_length(cast(s as binary))), 0L," +
          " (acc, i) -> acc + cast(conv(substring(hex(cast(s as binary))," +
          " 2 * i - 1, 2), 16, 10) as bigint)) end").as("interp"))
      .collect()
    rows.foreach { r =>
      val model = r.getString(0).getBytes("UTF-8")
        .map(b => (b & 0xff).toLong).sum
      assert(r.getLong(1) === model, s"native vs model: '${r.getString(0)}'")
      assert(r.getLong(1) === r.getLong(2), s"native vs interp")
    }
  }

  test("fingerprint: equal token streams collide, model-computed") {
    val tok = Gen.listOfN(5, Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    val pairs = samples(Gen.zip(tok, tok), 50)
    val df = pairs.map { case (a, b) => (a.mkString(" "), b.mkString(" ")) }
      .toDF("t1", "t2")
      .select($"t1", $"t2",
        scale.TextOps.fingerprint($"t1").as("f1"),
        scale.TextOps.fingerprint($"t2").as("f2"))
      .collect()
    df.foreach { r =>
      if (r.getString(0) == r.getString(1))
        assert(r.getLong(2) === r.getLong(3))
      // (inequality not asserted: a 31-bit rolling hash may collide)
    }
    assert(df.exists(r => r.getString(0) == r.getString(1)) ||
      pairs.nonEmpty)
  }

  test("ntileFromRn matches SQL ntile across random (n, k)") {
    val cases = samples(for {
      n <- Gen.chooseNum(1, 200)
      k <- Gen.chooseNum(1, 20)
    } yield (n, k), 25)
    cases.foreach { case (n, k) =>
      // reference model: SQL ntile semantics — first (n mod k) buckets
      // hold ceil(n/k) rows, the rest floor(n/k)
      def model(rn: Int): Int = {
        val q = n / k; val r = n % k; val big = (q + 1) * r
        if (rn <= big) (rn - 1) / (q + 1) + 1
        else r + (rn - 1 - big) / math.max(q, 1) + 1
      }
      val got = (1 to n).map(_.toLong).toDF("rn")
        .select($"rn", ext.GlobalRank
          .ntileFromRn($"rn", lit(n.toLong), k).as("b"))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1).toInt)
      got.foreach { case (rn, b) =>
        assert(b === model(rn), s"n=$n k=$k rn=$rn")
      }
      // bucket sizes: max-min ≤ 1 and buckets numbered 1..min(n,k)
      val sizes = got.groupBy(_._2).view.mapValues(_.size).toMap
      assert(sizes.keySet === (1 to math.min(n, k)).toSet, s"n=$n k=$k")
      assert(sizes.values.max - sizes.values.min <= 1, s"n=$n k=$k")
    }
  }

  test("zorder spread/interleave: bit-exact vs model, masks above 32 bits") {
    val longs = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 500)
    def model(x: Long): Long =
      (0 until 32).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)))
    longs.foreach { x =>
      assert(graft.ext.ZOrderExpr.spread(x) === model(x),
        s"spread mismatch at $x")
    }
    // inputs beyond 32 bits are masked, not wrapped
    assert(graft.ext.ZOrderExpr.spread(-1L) ===
      graft.ext.ZOrderExpr.spread(0xFFFFFFFFL))
    // z-order locality: within an aligned 2^k × 2^k tile, keys are
    // contiguous — the property file pruning relies on
    val tile = for (a <- 0 until 8; b <- 0 until 8)
      yield graft.ext.ZOrderExpr.spread(a) |
        (graft.ext.ZOrderExpr.spread(b) << 1)
    assert(tile.sorted === (0 until 64).map(_.toLong))
  }

  test("sketch mix: deterministic, salt-separated, avalanching") {
    val keys = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 300)
    keys.foreach { k =>
      assert(graft.scale.Sketches.mix(k, 1L) ===
        graft.scale.Sketches.mix(k, 1L))
      assert(graft.scale.Sketches.mix(k, 1L) !==
        graft.scale.Sketches.mix(k, 2L), s"salts collide at $k")
    }
    // avalanche: flipping one input bit flips ~half the output bits
    val flips = keys.map { k =>
      java.lang.Long.bitCount(
        graft.scale.Sketches.mix(k, 1L) ^ graft.scale.Sketches.mix(k ^ 1L, 1L))
    }
    val mean = flips.sum.toDouble / flips.size
    assert(mean > 24 && mean < 40, s"poor avalanche: mean $mean of 64 bits")
  }

  test("join row-count bounds: inner ≤ left ≤ left+anti ≡ left table") {
    val sf = SparkTestSession.sf
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf)
    val inner = c.join(o, $"c_custkey" === $"o_custkey").count()
    val left = c.join(o, $"c_custkey" === $"o_custkey", "left").count()
    val semi = c.join(o, $"c_custkey" === $"o_custkey", "left_semi").count()
    val anti = c.join(o, $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(semi + anti === c.count())
    assert(inner >= semi)
    assert(left >= inner)
  }

  test("text normalization is idempotent") {
    val texts = samples(Gen.listOfN(30,
      Gen.oneOf(Gen.alphaNumStr, Gen.oneOf("!", "  ", "\t", "É", "ß", "3")))
      .map(_.mkString(" ")), 40)
    val norm = (c: org.apache.spark.sql.Column) =>
      trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "),
        " +", " "))
    val rows = texts.toDF("t")
      .select(norm($"t").as("once"))
      .select($"once", norm($"once").as("twice"))
      .collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1),
      "normalizing a normalized string changed it"))
  }

  test("duplicate-span removal: a second pass removes nothing") {
    import scale.Dedup
    // after pass 1 every surviving chunk is globally unique; as long
    // as re-chunking alignment is preserved (true here — removals are
    // whole chunks), pass 2 must be a no-op
    val docs = Seq(
      (1L, "a b c a b c x"), (2L, "a b c d e f"),
      (3L, "d e f g h i j k"), (4L, "q w e r t y")).toDF("doc_id", "text")
    val once = Dedup.dedupSpans(docs)
      .select($"doc_id", $"text_clean".as("text"))
    val twice = Dedup.dedupSpans(once).collect()
    twice.foreach { r =>
      assert(r.getAs[Long]("n_removed") === 0L,
        s"second pass removed chunks from doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("aHash is invariant under global brightness shift (mean-relative)") {
    import scale.Multimodal.JdkImageCodec
    import java.awt.image.BufferedImage
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val g = f(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // random non-clipping images: values in [60, 160], shift +40 keeps
    // every pixel inside [0, 255] — the hash compares blocks to the
    // GLOBAL mean, so a uniform shift must never change a bit
    val gens = samples(Gen.listOfN(256, Gen.chooseNum(60, 160)), 20)
    gens.foreach { vals =>
      val f = (x: Int, y: Int) => vals(y * 16 + x)
      val h0 = JdkImageCodec.aHash64(png(f))
      val h1 = JdkImageCodec.aHash64(png((x, y) => f(x, y) + 40))
      assert(h0 === h1, "brightness shift changed the perceptual hash")
    }
  }

  test("envHash is invariant under volume scaling (mean-relative)") {
    import scale.Multimodal.JdkAudioCodec
    // window-vs-clip mean |amplitude| is scale-free: doubling the
    // volume (within 16-bit range) must never change a bit
    val gens = samples(Gen.listOfN(96, Gen.chooseNum(-8000, 8000)), 20)
    gens.foreach { vals =>
      def wav(scaleBy: Int): Array[Byte] = {
        import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
        val pcm = new Array[Byte](vals.length * 2)
        vals.zipWithIndex.foreach { case (s, i) =>
          val v = s * scaleBy
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        }
        val fmt = new AudioFormat(8000f, 16, 1, true, false)
        val bos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, vals.length.toLong),
          AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      assert(JdkAudioCodec.envHash32(wav(1)) ===
        JdkAudioCodec.envHash32(wav(2)),
        "volume scaling changed the envelope fingerprint")
    }
  }

  test("as-of joins (both directions) match the brute-force non-equi " +
      "definition on random frames") {
    import java.sql.Timestamp
    val rowGen = for {
      k <- Gen.chooseNum(1L, 4L)   // few keys → dense per-key collisions
      t <- Gen.chooseNum(0L, 20L)  // small ts range → frequent exact ties
    } yield (k, new Timestamp(t * 1000L))
    val leftRows = samples(rowGen, 60).zipWithIndex
      .map { case ((k, t), i) => (k, t, s"L$i") }
    // right side deduped per (key, ts): the operator's contract
    val rightRows = samples(rowGen, 60).zipWithIndex
      .map { case ((k, t), i) => (k, t, s"R$i") }
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val l = leftRows.toDF("k", "lts", "ltag")
    val r = rightRows.toDF("k", "rts", "rtag")

    // brute-force model: filter the full cross by the inequality, take
    // the extreme ts (ties impossible — right is unique per (key, ts))
    def model(forward: Boolean): Map[String, String] =
      leftRows.map { case (k, t, tag) =>
        val cand = rightRows.filter(rr => rr._1 == k &&
          (if (forward) !rr._2.before(t) else !rr._2.after(t)))
        val pick =
          if (cand.isEmpty) null
          else if (forward) cand.minBy(_._2.getTime)._3
          else cand.maxBy(_._2.getTime)._3
        tag -> pick
      }.toMap

    val back = ops.TemporalJoins.asofJoin(l, r, "k", "lts", "rts")
      .select($"ltag", $"rtag").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(back === model(forward = false))
    val fwd = ops.TemporalJoins.asofJoinForward(l, r, "k", "lts", "rts")
      .select($"ltag", $"rtag").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(fwd === model(forward = true))
  }

  /** Generator for pathological text: mixed unicode, repeated
    * whitespace runs, empties, tabs/newlines — the split-quirk
    * surface all three scan kernels must replicate. */
  private val textGen: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.oneOf("a", "bb", "的", "é!", "", " ", "\t", "\n",
      "x y", "THE", "ß"))
      .map(_.mkString(" ")),
    Gen.alphaNumStr,
    Gen.const(""), Gen.const("   "), Gen.const(" a b c "),
    Gen.const("w w w w w w"))

  test("codegen ShingleHashExpr ≡ interpreted xxhash64 shingles on " +
      "generated pathological text") {
    val strs = samples(textGen, 200).distinct
    val rows = strs.toDF("text").select(
      scale.Dedup.shingleHashes($"text").as("native"),
      scale.Dedup.shingleHashesInterpreted($"text").as("model"))
      .collect()
    rows.foreach(r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("codegen BigramPairsExpr ≡ interpreted pair transform on " +
      "generated pathological text") {
    val strs = samples(textGen, 200).distinct
    val rows = strs.toDF("text").select(
      graft.ext.BigramPairsExpr.bigramPairs($"text").as("native"),
      scale.TextOps.bigramPairsInterpreted($"text").as("model"))
      .collect()
    rows.foreach(r =>
      assert(r.getSeq[org.apache.spark.sql.Row](0) ===
        r.getSeq[org.apache.spark.sql.Row](1)))
  }

  test("codegen JaroWinklerExpr ≡ independent driver-side model on " +
      "generated pairs and the DuckDB-probed edge cases") {
    // driver-side reference (the python fuzz model from round 9,
    // itself verified exact against DuckDB on 8 000 random pairs)
    def jwModel(a: String, b: String): Double = {
      val (la, lb) = (a.length, b.length)
      if (la == 0 || lb == 0) return 0.0
      val window = math.max(0, math.max(la, lb) / 2 - 1)
      val mA = new Array[Boolean](la)
      val mB = new Array[Boolean](lb)
      var m = 0
      for (i <- 0 until la) {
        val lo = math.max(0, i - window)
        val hi = math.min(lb - 1, i + window)
        var j = lo
        var done = false
        while (j <= hi && !done) {
          if (!mB(j) && a(i) == b(j)) {
            mA(i) = true; mB(j) = true; m += 1; done = true
          }
          j += 1
        }
      }
      if (m == 0) return 0.0
      var t = 0; var k = 0
      for (i <- 0 until la if mA(i)) {
        while (!mB(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      val mm = m.toDouble
      val jaro = (mm / la + mm / lb + (mm - t / 2) / mm) / 3.0
      if (jaro <= 0.7) return jaro
      var l = 0
      while (l < math.min(4, math.min(la, lb)) && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
    val sGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd', 'e', ' '))
      .map(_.mkString.take(12))
    val pairs = samples(Gen.zip(sGen, sGen), 300).distinct ++ Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"), ("", ""),
      ("a", ""), ("ab", "ba"), ("aaaaa", "aaaab"),
      ("abcdefghij", "abcdzzzzzz"), ("jellyfish", "smellyfish"))
    val got = pairs.toDF("a", "b")
      .select($"a", $"b",
        graft.ext.JaroWinklerExpr.jaroWinkler($"a", $"b").as("jw"))
      .collect()
    got.foreach { r =>
      val want = jwModel(r.getString(0), r.getString(1))
      assert(r.getDouble(2) === want,
        s"(${r.getString(0)}, ${r.getString(1)})")
    }
    // DuckDB-probed absolute anchors
    val anchor = got.map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(2)).toMap
    assert(math.abs(anchor(("martha", "marhta")) - 0.9611111111111111) < 1e-15)
    assert(math.abs(anchor(("dixon", "dicksonx")) - 0.8133333333333332) < 1e-15)
    assert(anchor(("", "")) === 0.0)
    assert(anchor(("abcdefghij", "abcdzzzzzz")) === 0.6) // no boost ≤ 0.7
  }

  test("codegen RepetitionStatsExpr ≡ interpreted mode counts on " +
      "generated pathological text") {
    val strs = samples(textGen, 200).distinct
    val rows = strs.toDF("text").select(
      graft.ext.RepetitionStatsExpr.repetitionStats($"text").as("native"),
      scale.TextOps.repetitionStatsInterpreted($"text").as("model"))
      .collect()
    rows.foreach(r => assert(r.getStruct(0) === r.getStruct(1)))
  }

  test("Holt integer recurrence == exact rational Holt recursion " +
      "(alpha=1/2, beta=1/4) on random series") {
    // The q_holt_linear claim: (L, B, D=8^(t-1)) integers satisfy
    // L/D = level and B/D = trend of the EXACT rational recursion
    // l' = (x + l + b)/2, b' = (l' - l)/4 + 3b/4. BigDecimal division
    // by 2 and 4 is exact (finite decimal expansions), so the model
    // is exact rational arithmetic, not floating point.
    val seriesGen = for {
      n <- Gen.choose(1, 8)
      xs <- Gen.listOfN(n, Gen.choose(-1000000L, 100000000L))
    } yield xs
    samples(seriesGen, 300).foreach { xs =>
      var (l, b, d) = (xs.head, 0L, 1L)
      xs.tail.foreach { x =>
        val (l2, b2) = (4 * (d * x + l + b), d * x - l + 7 * b)
        l = l2; b = b2; d = 8 * d
      }
      val two = BigDecimal(2); val four = BigDecimal(4)
      var lm = BigDecimal(xs.head); var bm = BigDecimal(0)
      xs.tail.foreach { x =>
        val lNew = (BigDecimal(x) + lm + bm) / two
        bm = (lNew - lm) / four + bm * 3 / four
        lm = lNew
      }
      assert(BigDecimal(l) === lm * BigDecimal(d), s"level for $xs")
      assert(BigDecimal(b) === bm * BigDecimal(d), s"trend for $xs")
    }
  }
}
