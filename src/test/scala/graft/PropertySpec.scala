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
}
