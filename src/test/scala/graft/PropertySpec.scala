package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.Cols
import graft.operators.Upsert

/** Property-based checks (SURVEY §5): datetime-normalizer round trips,
  * upsert idempotence, epoch disambiguation, cosine bounds. Inputs are
  * generated driver-side and verified in one Spark action per property —
  * per-case Spark jobs would take minutes. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val weekdays = Seq("Thứ hai", "Thứ ba", "Thứ tư", "Thứ năm",
    "Thứ sáu", "Thứ bảy", "Chủ nhật", "thứ sáu", "THỨ BA", "Thu hai", "chu nhat")

  test("normalizeVnDatetime: generated display dates normalize to padded form") {
    val gen = for {
      d <- Gen.choose(1, 28); m <- Gen.choose(1, 12); y <- Gen.choose(2000, 2030)
      hh <- Gen.choose(0, 23); mi <- Gen.choose(0, 59)
      wd <- Gen.option(Gen.oneOf(weekdays))
      tzH <- Gen.choose(0, 12); tzSign <- Gen.oneOf("+", "-")
      sp1 <- Gen.oneOf("", " ", "  ")
    } yield {
      val prefix = wd.map(w => s"$w, ").getOrElse("")
      val input = f"$prefix$d/$m/$y,$sp1$hh:$mi%02d (GMT$tzSign$tzH)"
      val expected = f"$d%02d/$m%02d/$y $hh%02d:$mi%02d $tzSign$tzH%02d:00"
      (input, expected)
    }
    val cases = Gen.listOfN(300, gen).sample.get
    val out = cases.toDF("input", "expected")
      .withColumn("got", Cols.normalizeVnDatetime(col("input")))
      .where(col("got").isNull || col("got") =!= col("expected"))
      .collect()
    withClue(out.take(5).mkString("\n")) { out.length shouldBe 0 }
  }

  test("parsePublishTs: epoch seconds and millis agree for generated instants") {
    val gen = Gen.choose(946684800L, 4102444800L) // 2000..2100
    val secs = Gen.listOfN(200, gen).sample.get
    val df = secs.map(s => (s.toString, (s * 1000).toString)).toDF("sec", "ms")
      .select(
        Cols.parsePublishTs(col("sec")).as("fromSec"),
        Cols.parsePublishTs(col("ms")).as("fromMs"))
    df.where(col("fromSec").isNull || col("fromSec") =!= col("fromMs"))
      .count() shouldBe 0
  }

  test("upsert merge is idempotent and key-unique for generated tables") {
    val rows = Gen.listOfN(120,
      for { k <- Gen.choose(0, 40); v <- Gen.choose(0, 1000) } yield (k, v))
      .sample.get
    val target = rows.take(60).toDF("k", "v").dropDuplicates("k")
    val source = rows.drop(60).toDF("k", "v")
    val once = Upsert.merge(target, source, Seq("k"))
    // replaying the SAME raw batch must be a no-op: the deterministic
    // source dedup picks the same winner both times
    val twice = Upsert.merge(once, source, Seq("k"))
    once.groupBy("k").count().where(col("count") > 1).count() shouldBe 0
    twice.collect().map(_.toSeq).toSet shouldBe once.collect().map(_.toSeq).toSet
    // every target key survives, every source key present
    once.select("k").as[Int].collect().toSet shouldBe
      (target.select("k").as[Int].collect().toSet ++
        source.select("k").as[Int].collect().toSet)
  }

  test("cosineQ stays in [-1,1] and is 1 on the diagonal for generated vectors") {
    val vecGen = Gen.listOfN(16, Gen.choose(-1.0, 1.0).suchThat(math.abs(_) > 1e-3))
    val vecs = Gen.listOfN(100, vecGen).sample.get.map(v => Tuple1(v.map(_.toFloat)))
    val df = vecs.toDF("v")
      .select(graft.dedup.Dedup.quantize(col("v")).as("q"))
      .select(graft.dedup.Dedup.cosineQ(col("q"), col("q")).as("self"))
    val bad = df.where(col("self") < 0.9999999 || col("self") > 1.0000001).count()
    bad shouldBe 0
  }

  test("parseImageHeader never throws on arbitrary bytes, including marker prefixes") {
    val rnd = new scala.util.Random(42)
    val arb = (0 until 500).map(_ => {
      val n = rnd.nextInt(64)
      val a = new Array[Byte](n); rnd.nextBytes(a); a
    })
    // adversarial prefixes: valid magics followed by garbage/truncation
    val magics = Seq(
      Array(0x89, 'P', 'N', 'G').map(_.toByte),
      "GIF89a".getBytes,
      Array(0xff, 0xd8).map(_.toByte),
      Array(0xff, 0xd8, 0xff, 0xff, 0xff).map(_.toByte), // fill-byte run
      Array(0xff, 0xd8, 0xff, 0xc0, 0, 0).map(_.toByte)) // lying zero length
    val prefixed = for { m <- magics; a <- arb.take(50) } yield m ++ a
    (arb ++ prefixed).foreach { bytes =>
      noException should be thrownBy
        graft.multimodal.Multimodal.parseImageHeader(bytes)
    }
  }

  test("reconcile diff of a table against itself is empty; checksum permutation-stable") {
    val rows = Gen.listOfN(80,
      for { k <- Gen.choose(0L, 200L); v <- Gen.alphaNumStr.map(_.take(8)) }
        yield (k, v)).sample.get
    val a = rows.toDF("k", "v").dropDuplicates("k")
    graft.operators.Reconcile.diff(a, a, Seq("k")).count() shouldBe 0
    val c1 = graft.operators.Reconcile.checksum(a, Seq("k", "v")).collect()(0)
    val c2 = graft.operators.Reconcile
      .checksum(a.orderBy(col("v")).repartition(5), Seq("k", "v")).collect()(0)
    c1 shouldBe c2
  }

  test("fingerprint and portableHash are stable under recomputation") {
    val texts = Gen.listOfN(100,
      Gen.listOfN(12, Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(6)))
        .map(_.mkString(" "))).sample.get
    val df = texts.toDF("t").select(
      graft.text.TextAnalysis.fingerprint(col("t")).as("f1"),
      graft.text.TextAnalysis.fingerprint(col("t")).as("f2"))
    df.where(col("f1") =!= col("f2")).count() shouldBe 0
  }

  test("portableHash/portableHash64 codegen exprs ≡ Column-algebra references") {
    // r15 rerouted the hot paths through PortableHash(64)Expr; the md5 +
    // regexp/conv Column chain stays as the witness. Generated strings
    // include empties, unicode, and digit-heavy inputs.
    val strs = Gen.listOfN(200, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)), Gen.const(""),
      Gen.const("đường phố Hà Nội ✓"), Gen.numStr.map(_.take(10)),
      Gen.asciiPrintableStr.map(_.take(20)))).sample.get
    val df = strs.toDF("s").select(
      graft.text.TextAnalysis.portableHash(col("s")).as("h"),
      graft.text.TextAnalysis.portableHashColumn(col("s")).as("hc"),
      graft.text.TextAnalysis.portableHash64(col("s")).as("h64"),
      graft.text.TextAnalysis.portableHash64Column(col("s")).as("h64c"))
    df.where(col("h") =!= col("hc") || col("h64") =!= col("h64c"))
      .count() shouldBe 0
  }

  test("SegmentsExpr ≡ Column-algebra segments on generated text") {
    val texts = Gen.listOfN(150, Gen.oneOf(
      Gen.listOf(Gen.alphaNumStr.map(_.take(5))).map(_.mkString(" ")),
      Gen.const(""), Gen.const("   "), Gen.const("một hai ba bốn năm"),
      Gen.const("a\tb\n c   d"))).sample.get
    val df = texts.toDF("t")
    for (w <- Seq(1, 3, 10)) {
      df.select(
        graft.dedup.Dedup.segments(col("t"), w).as("fast"),
        graft.dedup.Dedup.segmentsColumn(col("t"), w).as("ref"))
        .where(col("fast") =!= col("ref")).count() shouldBe 0
    }
  }

  test("sortedContains ≡ array_contains on sorted long arrays") {
    val arrays = Gen.listOfN(60,
      Gen.listOf(Gen.choose(-50L, 50L)).map(_.sorted)).sample.get
    val df = arrays.map(a => Tuple1(a)).toDF("arr")
      .select(col("arr"), explode(sequence(lit(-55L), lit(55L))).as("p"))
    df.where(
      graft.functions.FastExprs.sortedContains(col("arr"), col("p")) =!=
        array_contains(col("arr"), col("p"))).count() shouldBe 0L
  }

  test("sortedJaccardCounts ≡ (size ∘ array_intersect, size ∘ array_union) " +
    "on sorted string arrays, duplicates included") {
    val word = Gen.oneOf("a", "b", "ab", "ba", "x", "yy", "z", "", "aa", "q")
    val pairs = Gen.listOfN(80, for {
      a <- Gen.listOf(word)
      b <- Gen.listOf(word)
    } yield (a.sorted, b.sorted)).sample.get
    val df = pairs.toDF("a", "b")
      .withColumn("jc",
        graft.functions.FastExprs.sortedJaccardCounts(col("a"), col("b")))
    // functions.size written out: ScalaTest's Matchers.size(Long) shadows it
    val sz = org.apache.spark.sql.functions.size _
    df.where(
      col("jc.inter") =!= sz(array_intersect(col("a"), col("b"))).cast("long") ||
      col("jc.uni") =!= sz(array_union(col("a"), col("b"))).cast("long"))
      .count() shouldBe 0L
  }

  test("scd2: generated logs — version counts match change points, ranges " +
    "chain gaplessly, and every log row falls in the version holding its value") {
    import java.sql.Timestamp
    val gen = Gen.listOfN(300, for {
      k <- Gen.choose(1L, 12L)
      t <- Gen.choose(1L, 1000L)
      v <- Gen.oneOf("A", "B", "C")
    } yield (k, t, v)).map(_.distinctBy(r => (r._1, r._2)))
    val rows = gen.sample.get
    val log = rows.map { case (k, t, v) => (k, t, new Timestamp(t * 1000), v) }
      .toDF("k", "seq", "ts", "v")
    val dim = graft.operators.Scd.scd2(log, "k", "ts", "seq", Seq("v"))
      .select(col("k"), col("v"), col("version"),
        col("effective_from"), col("effective_to"))
      .as[(Long, String, Int, Timestamp, Option[Timestamp])]
      .collect().groupBy(_._1)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._1)).map(_._3)
      val changePoints = 1 + sorted.sliding(2).count {
        case Seq(a, b) => a != b; case _ => false
      }
      val versions = dim(k).sortBy(_._3)
      versions.length shouldBe changePoints
      // ranges chain: to(i) == from(i+1); exactly one current
      versions.init.zip(versions.tail).foreach { case (a, b) =>
        a._5 shouldBe Some(b._4)
      }
      versions.last._5 shouldBe None
      // point-in-time: each log row's ts resolves to the version holding
      // its value (the as-of lookup Scd2 exists to serve)
      rs.foreach { case (_, t, v) =>
        val ts = t * 1000
        val hit = versions.filter(ver => ver._4.getTime <= ts &&
          ver._5.forall(_.getTime > ts))
        hit.length shouldBe 1
        hit.head._2 shouldBe v
      }
    }
  }

  test("funnel: generated event streams satisfy the prefix property and " +
    "stage timestamps are non-decreasing") {
    val stages = Seq("s1", "s2", "s3")
    val gen = Gen.listOfN(400, for {
      u <- Gen.choose(1L, 25L)
      t <- Gen.choose(1L, 500L)
      e <- Gen.oneOf("s1", "s2", "s3", "noise")
    } yield (u, t, e))
    val rows = gen.sample.get.distinctBy(r => (r._1, r._2))
    val ev = rows.map { case (u, t, e) =>
      (u, new java.sql.Timestamp(t * 1000), t, e)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.operators.Funnel.funnel(ev, "user_id", "ts",
        "event_type", "event_id", stages)
      .select(col("user_id"), unix_micros(col("s1_ts")),
        unix_micros(col("s2_ts")), unix_micros(col("s3_ts")),
        col("stages_completed"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)].collect()
    out.foreach { case (_, a, b, c, n) =>
      // prefix property: a later stage present ⇒ all earlier present
      if (c.isDefined) b.isDefined shouldBe true
      if (b.isDefined) a.isDefined shouldBe true
      a.isDefined shouldBe true // funnel only emits stage-1 completers
      n shouldBe Seq(a, b, c).count(_.isDefined)
      // in-order: first-completion times never decrease along the funnel
      Seq(a, b, c).flatten.sliding(2).foreach {
        case Seq(x, y) => x should be <= y; case _ => ()
      }
    }
  }

  test("parseWavHeader never throws on arbitrary bytes, including RIFF prefixes") {
    val gen = Gen.oneOf(
      Gen.listOfN(40, Gen.choose(0, 255)).map(_.map(_.toByte).toArray),
      Gen.listOfN(30, Gen.choose(0, 255))
        .map(bs => "RIFF".getBytes ++ bs.map(_.toByte).toArray),
      Gen.listOfN(20, Gen.choose(0, 255))
        .map(bs => "RIFF    WAVE".getBytes ++
          bs.map(_.toByte).toArray))
    Gen.listOfN(300, gen).sample.get.foreach { bytes =>
      noException should be thrownBy
        graft.multimodal.Multimodal.parseWavHeader(bytes)
    }
  }

  test("floorDiv: agrees with Math.floorDiv on generated longs of any sign") {
    val gen = for {
      x <- Gen.choose(-4102444800000000L, 4102444800000000L)
      y <- Gen.oneOf(7L, 86400000000L, 1000L, 2L)
    } yield (x, y)
    val cases = Gen.listOfN(500, gen).sample.get
    val bad = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        Queries.floorDiv(col("x"), 86400000000L).as("d1"))
      .as[(Long, Long, Long)].collect()
      .filter { case (x, _, d1) => d1 != Math.floorDiv(x, 86400000000L) }
    withClue(bad.take(5).mkString("\n")) { bad.length shouldBe 0 }
  }

  test("prefixSum: generated weights tile [0, W) for any shard count") {
    val gen = Gen.listOfN(200, Gen.choose(1L, 50L)).sample.get
    val df = gen.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("k", "w")
    for (shards <- Seq(1, 3, 16)) {
      val out = graft.operators.Sampling.prefixSum(df, "k", "w", shards)
        .as[(Long, Long, Long, Long)].collect()
      out.map(_._2).sum shouldBe gen.sum
      val sorted = out.sortBy(_._3)
      sorted.head._3 shouldBe 0L
      sorted.last._4 shouldBe gen.sum
      sorted.sliding(2).foreach {
        case Array(a, b) => a._4 shouldBe b._3
        case _ =>
      }
    }
  }

  test("gapFill: observed rows pass through unchanged; fills stay within neighbor bounds") {
    val gen = Gen.listOfN(120, for {
      k <- Gen.choose(1L, 8L); d <- Gen.choose(0L, 40L)
      v <- Gen.choose(-100, 100)
    } yield (k, d, v.toDouble)).sample.get.distinctBy(r => (r._1, r._2))
    val df = gen.toDF("k", "day", "v")
    val out = graft.operators.GapFill.fill(df, "k", "day", "v")
      .as[(Long, Long, Double, Boolean)].collect()
    val obs = gen.map(r => (r._1, r._2) -> r._3).toMap
    out.filter(_._4).foreach { case (k, d, v, _) => v shouldBe obs((k, d)) }
    out.length shouldBe out.map(r => (r._1, r._2)).distinct.length
    // interpolated/carried values never exceed the key's observed range
    val range = gen.groupBy(_._1).map { case (k, rs) =>
      k -> ((rs.map(_._3).min, rs.map(_._3).max)) }
    out.filterNot(_._4).foreach { case (k, _, v, _) =>
      v should be >= range(k)._1
      v should be <= range(k)._2
    }
  }

  test("expectations: generated violations match brute-force counts") {
    val gen = Gen.listOfN(300, for {
      k <- Gen.choose(1L, 80L)
      s <- Gen.option(Gen.oneOf("A", "B", "C", "X"))
      p <- Gen.choose(-50.0, 150.0)
    } yield (k, s.orNull, p)).sample.get
    val df = gen.toDF("k", "s", "p")
    import graft.operators.Expectations._
    val out = check(df, Seq(NotNull("s"),
        AcceptedValues("s", Seq("A", "B", "C")),
        InRange("p", 0.0, 100.0), UniqueKey(Seq("k"))))
      .select("rule", "violations").as[(String, Long)].collect().toMap
    out("not_null(s)") shouldBe gen.count(_._2 == null).toLong
    out("accepted_values(s)") shouldBe
      gen.count(r => r._2 == null || !Seq("A", "B", "C").contains(r._2)).toLong
    out("in_range(p)") shouldBe gen.count(r => r._3 < 0.0 || r._3 > 100.0).toLong
    out("unique(k)") shouldBe (gen.size - gen.map(_._1).distinct.size).toLong
  }

  test("doc chunking: generated docs — full coverage, stride starts, budgeted sizes") {
    val (w, s) = (50, 25)
    val gen = Gen.listOfN(60, Gen.choose(1, 180)).sample.get.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(j => s"t$j").mkString(" "), n) }
    val chunks = gen.map { case (id, text, _) => (id, text) }.toDF("doc_id", "text")
      .withColumn("toks", split(trim(regexp_replace(col("text"), "\\s+", " ")), " "))
      .withColumn("n_toks", org.apache.spark.sql.functions.size(col("toks")))
      .select(col("doc_id"), col("n_toks"),
        explode(filter(sequence(lit(0), greatest(col("n_toks") - 1, lit(0)), lit(s)),
          st => st === 0 || st + lit(w - s) < col("n_toks"))).as("start"))
      .select(col("doc_id"), col("start"),
        least(lit(w), col("n_toks") - col("start")).as("len"))
      .as[(Long, Int, Int)].collect().groupBy(_._1)
    gen.foreach { case (id, _, n) =>
      val cs = chunks(id).map(c => (c._2, c._3)).sortBy(_._1)
      // stride starts, first at 0
      cs.head._1 shouldBe 0
      cs.foreach { case (st, _) => st % s shouldBe 0 }
      // every token index [0, n) is covered by some chunk
      val covered = cs.flatMap { case (st, len) => st until (st + len) }.toSet
      covered shouldBe (0 until n).toSet
      // no chunk exceeds the window; only the last may be shorter than w when n > w
      cs.foreach { case (_, len) => len should be <= w }
      if (n >= w) cs.init.foreach { case (_, len) => len shouldBe w }
    }
  }

  test("temperature quotas: generated language mixes always sum to N exactly") {
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val mixes = Gen.listOfN(12,
      Gen.nonEmptyListOf(Gen.choose(1, 5000)).map(_.take(12))).sample.get
    mixes.zipWithIndex.foreach { case (counts, mi) =>
      val df = counts.zipWithIndex
        .map { case (n, i) => (s"l$i", n.toLong) }.toDF("lang", "n")
      val got = df
        .withColumn("sq", sqrt(col("n").cast("double")))
        .withColumn("ssum",
          aggregate(array_sort(collect_list(col("sq")).over(all)),
            lit(0d), (a, x) => a + x))
        .withColumn("rawq", col("sq") / col("ssum") * 1000)
        .withColumn("base", floor(col("rawq")).cast("long"))
        .withColumn("leftover", lit(1000L) - sum("base").over(all))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy((col("rawq") - col("base")).desc, col("lang"))))
        .select((col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L)))
        .as[Long].collect()
      withClue(s"mix #$mi $counts: ") {
        got.sum shouldBe 1000L
        got.foreach(_ should be >= 0L)
      }
    }
  }

  test("containment bounds: generated doc pairs stay in [0,1] and hit 1 on subsets") {
    import graft.dedup.Dedup
    val vocab = (1 to 30).map(i => s"w$i")
    val gen = Gen.listOfN(24, for {
      n <- Gen.choose(3, 25)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val docs = gen.toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val out = sh.select(col("doc_id").as("id1"), col("sh").as("sh1"))
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")),
        col("id1") < col("id2"))
      .select(
        (org.apache.spark.sql.functions.size(array_intersect(col("sh1"), col("sh2")))
          .cast("double") /
          org.apache.spark.sql.functions.size(col("sh1"))).as("c1"),
        (org.apache.spark.sql.functions.size(array_intersect(col("sh1"), col("sh2")))
          .cast("double") /
          org.apache.spark.sql.functions.size(col("sh2"))).as("c2"))
      .as[(Double, Double)].collect()
    out.foreach { case (c1, c2) =>
      c1 should (be >= 0.0 and be <= 1.0)
      c2 should (be >= 0.0 and be <= 1.0)
    }
    // a doc prefixed into a longer doc must be fully contained
    val small = "alpha beta gamma delta epsilon"
    val pair = Seq((1L, small), (2L, small + " " + vocab.mkString(" ")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val c1 = pair.select(col("doc_id"), col("sh")).as[(Long, Seq[String])]
      .collect().sortBy(_._1).map(_._2) match {
        case Array(a, b) => a.count(b.contains).toDouble / a.size
      }
    c1 shouldBe 1.0
  }
}
