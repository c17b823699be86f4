package graft

import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Canary for testdata regenerations. The driver has twice rewritten
  * /root/testdata with a different parquet timestamp physical type
  * (TIMESTAMP_NANOS in round 3, TIMESTAMP_MICROS with isAdjustedToUTC=0 —
  * i.e. NTZ — in round 6), and each shift broke a scatter of queries with
  * analysis errors far from the root cause. This spec pins the
  * ENGINE-FACING type of every column of every table after the session
  * confs (nanosAsLong + inferTimestampNTZ=false) and the events()
  * normalization have run, so the next regeneration fails one loud,
  * named test instead of ten scattered ones.
  */
class SchemaProbeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  /** Engine-facing invariants: key → required Spark type. Integer key
    * columns may arrive as int32 or int64 from the generator — both are
    * fine for join/agg semantics — so integral keys assert on a set. */
  private val integral: Set[DataType] = Set(IntegerType, LongType)

  private def probe(table: String, checks: (String, Either[DataType, Set[DataType]])*): Unit =
    test(s"probe: $table") {
      val p = s"$sfDir/$table.parquet"
      assume(new java.io.File(p).exists(), s"$p missing")
      val schema = spark.read.parquet(p).schema
      checks.foreach { case (colName, want) =>
        val dt = schema(colName).dataType
        want match {
          case Left(exact) => withClue(s"$table.$colName: ") { dt shouldBe exact }
          case Right(set)  => withClue(s"$table.$colName: ") { set should contain(dt) }
        }
      }
    }

  private def exact(dt: DataType) = Left(dt)
  private def oneOf(dts: DataType*) = Right(dts.toSet)

  probe("region", "r_regionkey" -> oneOf(IntegerType, LongType), "r_name" -> exact(StringType))
  probe("nation", "n_nationkey" -> oneOf(IntegerType, LongType),
    "n_regionkey" -> oneOf(IntegerType, LongType), "n_name" -> exact(StringType))
  probe("customer", "c_custkey" -> oneOf(IntegerType, LongType),
    "c_nationkey" -> oneOf(IntegerType, LongType),
    "c_acctbal" -> exact(DoubleType), "c_mktsegment" -> exact(StringType))
  probe("supplier", "s_suppkey" -> oneOf(IntegerType, LongType),
    "s_nationkey" -> oneOf(IntegerType, LongType), "s_acctbal" -> exact(DoubleType))
  probe("part", "p_partkey" -> oneOf(IntegerType, LongType),
    "p_size" -> oneOf(IntegerType, LongType), "p_retailprice" -> exact(DoubleType))
  probe("orders", "o_orderkey" -> oneOf(IntegerType, LongType),
    "o_custkey" -> oneOf(IntegerType, LongType),
    "o_totalprice" -> exact(DoubleType),
    // the load-bearing assertion: a regenerated o_orderdate must surface
    // as LTZ timestamp (never NTZ, never raw long) under the session confs
    "o_orderdate" -> exact(TimestampType),
    "o_orderstatus" -> exact(StringType))
  probe("lineitem", "l_orderkey" -> oneOf(IntegerType, LongType),
    "l_partkey" -> oneOf(IntegerType, LongType),
    "l_suppkey" -> oneOf(IntegerType, LongType),
    "l_quantity" -> exact(DoubleType), "l_extendedprice" -> exact(DoubleType),
    "l_discount" -> exact(DoubleType),
    "l_shipdate" -> exact(TimestampType),
    "l_returnflag" -> exact(StringType))
  probe("documents", "doc_id" -> oneOf(IntegerType, LongType),
    "text" -> exact(StringType), "lang" -> exact(StringType),
    "source" -> exact(StringType), "n_chars" -> oneOf(IntegerType, LongType))
  probe("embeddings", "vec_id" -> oneOf(IntegerType, LongType),
    "embedding" -> oneOf(ArrayType(FloatType, containsNull = true),
      ArrayType(FloatType, containsNull = false)),
    "label" -> oneOf(IntegerType, LongType))

  test("probe: events (post-normalization)") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val schema = Queries.events(spark, sfDir).schema
    // ts must be LTZ timestamp AFTER events() — whether the raw file was
    // nanos-long (round-3 shape), NTZ micros (round-6 shape), or plain LTZ
    withClue("events.ts: ") { schema("ts").dataType shouldBe TimestampType }
    withClue("events.event_id: ") { integral should contain(schema("event_id").dataType) }
    withClue("events.user_id: ") { integral should contain(schema("user_id").dataType) }
    withClue("events.value: ") { schema("value").dataType shouldBe DoubleType }
    withClue("events.event_type: ") { schema("event_type").dataType shouldBe StringType }
    withClue("events.props: ") { schema("props").dataType shouldBe StringType }
  }

  test("events() normalizes a deliberately NTZ-written fixture") {
    // simulate a session that MISSED the inferTimestampNTZ=false conf (the
    // round-6 failure mode): the belt-and-braces cast arm in events() must
    // still hand back an LTZ timestamp with the same instant (UTC session)
    val ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "UTC")
    ns.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    val dir = tmpDir("ntz-fixture")
    ns.sql(
      """SELECT * FROM VALUES
        |  (1L, TIMESTAMP_NTZ '2024-03-01 12:34:56.789', 10L, 'view', 1.5D, '{}'),
        |  (2L, TIMESTAMP_NTZ '2024-03-02 00:00:00',     11L, 'click', 2.5D, '{}')
        |  AS t(event_id, ts, user_id, event_type, value, props)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // fixture really is NTZ on the raw read in this session
    ns.read.parquet(s"$dir/events.parquet").schema("ts").dataType shouldBe TimestampNTZType
    val norm = Queries.events(ns, dir)
    norm.schema("ts").dataType shouldBe TimestampType
    import org.apache.spark.sql.functions.{col, unix_micros}
    val micros = norm.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    micros(0) shouldBe 1709296496789000L // 2024-03-01T12:34:56.789Z
    micros(1) shouldBe 1709337600000000L // 2024-03-02T00:00:00Z
  }

  test("events() still normalizes the round-3 nanos-as-long shape") {
    val dir = tmpDir("nanos-fixture")
    // 2024-03-01T12:34:56.789123456Z as nanos; expect floor to micros
    spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 1709296496789123456L, 10L, 'view', 1.5D, '{}')
        |  AS t(event_id, ts, user_id, event_type, value, props)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val norm = Queries.events(spark, dir)
    norm.schema("ts").dataType shouldBe TimestampType
    import org.apache.spark.sql.functions.{col, unix_micros}
    norm.select(unix_micros(col("ts"))).collect().head.getLong(0) shouldBe 1709296496789123L
  }
}
