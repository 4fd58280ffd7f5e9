package graft.scale

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("zorder expression matches a bit-by-bit reference and stays in codegen") {
    val ref = (a: Long, b: Long) =>
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val rows = spark.range(1000)
      .select($"id".as("a"), ($"id" * 37 % 1024).as("b"))
      .withColumn("z", graft.ext.ZOrderExpr.zorder($"a" % 1024, $"b"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) === ref(r.getLong(0) % 1024, r.getLong(1)),
        s"zorder mismatch at a=${r.getLong(0)} b=${r.getLong(1)}")
    }
    val plan = spark.range(10)
      .select(graft.ext.ZOrderExpr.zorder($"id", $"id"))
      .queryExecution.executedPlan
    val inCodegen = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.toString.contains("zorder") => w
    }
    assert(inCodegen.nonEmpty, s"zorder not inside codegen:\n$plan")
  }

  test("z-sorted slices bound BOTH dims; lexicographic sort only its leading one") {
    // simulate the file layout: sort, cut into 16 contiguous "files",
    // measure each file's min/max span per dimension (what parquet
    // footer pruning sees)
    val ka = pmod($"o_custkey", lit(Layout.ZBuckets)).cast("long")
    val kb = pmod(datediff($"o_orderdate", to_date(lit("1992-01-01"))),
      lit(Layout.ZBuckets)).cast("long")
    val base = Tables.orders(spark, sf)
      .select(ka.as("ka"), kb.as("kb"))
      .withColumn("zkey", graft.ext.ZOrderExpr.zorder($"ka", $"kb"))
    def meanSpans(sortCol: String): (Double, Double) = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(sortCol))
      val sliced = base.withColumn("slice", ntile(16).over(w))
        .groupBy($"slice")
        .agg((max($"ka") - min($"ka")).as("ka_span"),
          (max($"kb") - min($"kb")).as("kb_span"))
        .agg(avg($"ka_span"), avg($"kb_span")).head()
      (sliced.getDouble(0), sliced.getDouble(1))
    }
    val (zKa, zKb) = meanSpans("zkey")
    val (lexKa, lexKb) = meanSpans("ka")
    assert(zKa < 300 && zKb < 300,
      s"z-order slices should bound both dims, got ka=$zKa kb=$zKb")
    assert(lexKa < zKa, "lexicographic sort must win on its leading column")
    assert(lexKb > 2 * zKb,
      s"lexicographic slices should NOT bound the second dim (kb span $lexKb vs z $zKb)")
  }

  test("hilbertIndex: exhaustive order-4 bijection with unit-step " +
      "adjacency; q_hilbert_layout ranges bound both dims") {
    // the defining Hilbert property on the full 16×16 grid: every
    // cell visited exactly once, and CONSECUTIVE indexes are
    // Manhattan-distance-1 neighbors (z-order jumps, Hilbert never
    // does — the reason its key ranges give tighter file envelopes)
    val grid = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong)
    val idx = Layout.hilbertIndex(
      grid.toDF("x", "y"), "x", "y", order = 4)
      .select($"hd", $"x", $"y")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(idx.map(_._1).toSeq === (0L until 256L))
    idx.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"non-adjacent step ($x1,$y1)→($x2,$y2)")
    }
    // a 2^14-cell sub-curve is confined to a 128×128 quadrant region:
    // every emitted range spans ≤ 128 cells on BOTH dimensions
    val rows = graft.SparkEntry.queries("q_hilbert_layout")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("ka_max") - r.getAs[Long]("ka_min") <= 127L)
      assert(r.getAs[Long]("kb_max") - r.getAs[Long]("kb_min") <= 127L)
    }
  }

  test("dedupSpans: intra-doc, cross-doc, short-doc, and tail semantics") {
    val docs = Seq(
      (1L, "a b c a b c x"),       // chunk 'a b c' repeats in-doc; tail 'x'
      (2L, "a b c d e f"),         // 'a b c' already seen in doc 1
      (3L, "zz"),                  // shorter than one chunk
      (4L, "d e f g h i j k")      // 'd e f' seen in doc 2; tail 'j k'
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSpans(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === (("a b c x", 2L, 1L)))   // 2nd 'a b c' removed, tail kept
    assert(got(2L) === (("d e f", 2L, 1L)))     // lost 'a b c' to doc 1
    assert(got(3L) === (("zz", 0L, 0L)))        // too short: untouched
    assert(got(4L) === (("g h i j k", 2L, 1L))) // lost 'd e f' to doc 2
  }

  test("dedupSpans drops nothing when all chunks are unique") {
    val docs = Seq((1L, "q w e r t y"), (2L, "u i o p a s")).toDF("doc_id", "text")
    val got = Dedup.dedupSpans(docs).collect()
    assert(got.forall(_.getLong(3) === 0L))
    got.foreach(r => assert(r.getString(1).split(" ").length === 6))
  }

  test("boilerplateStrip removes high-df chunks everywhere, keeps rare repeats") {
    // 20 docs in srcA all open with the chrome 'nav bar here'
    // (df = 100% > 5%); doc 1 additionally carries the rare chunk
    // 'x y z' (df = 1/20 = exactly 5%, NOT above the ceiling)
    val srcA = (1L to 20L).map { i =>
      val rare = if (i == 1L) "x y z " else ""
      (i, "srcA", s"nav bar here ${rare}u$i v$i w$i")
    }
    // a different source keeps its own counts: 'nav bar here' appears
    // in only 1 of its 30 docs (df 3.3% < 5%) and must SURVIVE there
    val srcB = (101L to 130L).map { i =>
      val chrome = if (i == 101L) "nav bar here " else ""
      (i, "srcB", s"${chrome}a$i b$i c$i")
    }
    val docs = (srcA ++ srcB).toDF("doc_id", "source", "text")
    val got = Dedup.boilerplateStrip(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    // srcA: chrome stripped from every doc INCLUDING the first
    (1L to 20L).foreach { i =>
      assert(!got(i)._1.contains("nav bar here"), s"doc $i kept chrome")
    }
    // the rare 'x y z' chunk in doc 1 survives (df 1/20 = 5% not > 5%)
    assert(got(1L)._1.startsWith("x y z"))
    // srcB is below the ceiling: its single chrome occurrence survives
    assert(got(101L)._1.startsWith("nav bar here"))
    assert((102L to 130L).forall(got(_)._2 === 0L))
  }

  test("shardPack: covers every doc, near-equal doc counts, and token " +
      "imbalance bounded by the heaviest document") {
    val shards = graft.SparkEntry.queries("q_shard_pack")(spark, sf)
      .collect()
    assert(shards.length === Layout.NShards)
    val nDocs = shards.map(_.getAs[Long]("n_docs"))
    assert(nDocs.sum === Tables.documents(spark, sf).count())
    // serpentine dealing leaves doc counts within 1 of each other
    assert(nDocs.max - nDocs.min <= 1)
    // serpentine (LPT-flavored) balance: the spread between the
    // heaviest and lightest shard cannot exceed the single heaviest
    // document (each N-doc pass adds its largest doc to the shard
    // the previous pass loaded least)
    val toks = shards.map(_.getAs[Long]("shard_tokens"))
    val maxDoc = shards.map(_.getAs[Long]("max_tok")).max
    assert(toks.max - toks.min <= maxDoc,
      s"imbalance ${toks.max - toks.min} exceeds heaviest doc $maxDoc")
  }

  test("q_curriculum_order: epoch positions are a permutation, " +
      "deciles are monotone along the order, the running budget " +
      "telescopes, and short documents lead") {
    val rows = SparkEntry.queries("q_curriculum_order")(spark, sf)
      .collect().sortBy(_.getAs[Long]("epoch_pos"))
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_.getAs[Long]("epoch_pos")).toSeq ===
      (1L to n.toLong).toSeq, "positions must be 1..n exactly")
    // deciles never decrease along the epoch (curriculum invariant)
    val decs = rows.map(_.getAs[Long]("decile"))
    decs.sliding(2).foreach(p =>
      assert(p(0) <= p(1), "decile order violated"))
    assert(decs.head === 1L && decs.last === 10L)
    // the running budget telescopes exactly
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("n_chars")
      assert(r.getAs[Long]("cum_chars") === cum)
    }
    // curriculum property: first decile strictly shorter on average
    // than the last
    val first = rows.filter(_.getAs[Long]("decile") === 1L)
    val last = rows.filter(_.getAs[Long]("decile") === 10L)
    assert(first.map(_.getAs[Long]("n_chars")).sum * last.length <
      last.map(_.getAs[Long]("n_chars")).sum * first.length)
    // within-decile order is the Knuth shuffle, not insertion order:
    // doc_ids inside decile 1 must not be sorted ascending
    val ids1 = first.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids1 !== ids1.sorted, "in-bucket shuffle missing")
  }

  test("q_zone_map_skip: accounting reconciles with a brute file walk " +
      "and date clustering strictly reduces the scan") {
    val rows = SparkEntry.queries("q_zone_map_skip")(spark, sf)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet === Set("natural", "date_weekly"))
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey",
        datediff($"l_shipdate".cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("ship_day"))
      .as[(Long, Long)].collect().toSeq
    val lo = java.time.LocalDate.of(1996, 1, 1).toEpochDay
    val hi = java.time.LocalDate.of(1996, 3, 31).toEpochDay
    def brute(fid: ((Long, Long)) => Long) = {
      val files = li.groupBy(fid).values.toSeq
      val skipped = files.filter(f =>
        f.map(_._2).max < lo || f.map(_._2).min > hi)
      val scanned = files.filter(f =>
        !(f.map(_._2).max < lo || f.map(_._2).min > hi))
      (files.size.toLong, skipped.size.toLong,
        scanned.map(_.size.toLong).sum,
        li.count(r => r._2 >= lo && r._2 <= hi).toLong)
    }
    Seq("natural" -> ((r: (Long, Long)) => r._1 / 4096),
      "date_weekly" -> ((r: (Long, Long)) => r._2 / 7))
      .foreach { case (name, fid) =>
        val (nf, nskip, scanned, matched) = brute(fid)
        val row = rows(name)
        assert(row.getAs[Long]("n_files") === nf, s"$name files")
        assert(row.getAs[Long]("n_skipped") === nskip, s"$name skip")
        assert(row.getAs[Long]("rows_total") === li.size.toLong)
        assert(row.getAs[Long]("rows_scanned") === scanned, s"$name scan")
        assert(row.getAs[Long]("rows_matched") === matched, s"$name match")
        // zone maps are sound: every matching row is in a scanned file
        assert(scanned >= matched, s"$name soundness")
      }
    // the layout contrast the operator exists to demonstrate
    assert(rows("date_weekly").getAs[Long]("rows_scanned") <
      rows("natural").getAs[Long]("rows_scanned"))
    assert(rows("date_weekly").getAs[Long]("amp_e3") <
      rows("natural").getAs[Long]("amp_e3"))
  }
}
