package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.metrics.MetricsRegistry
import graft.pipeline.{BronzeToSilver, FlatView, SilverToGold}
import graft.sources.Catalog

/** Per-job metrics emission + the SQL-string surface + the full-safe
  * dim_author union leg — the round-2 parity gaps
  * (reference: airflow/config/metrics_utils.py:58-106,
  * gold_to_bigquery.py:185-209, gcs_silver_to_gold_1.py:498-516). */
class MetricsSqlSpec extends SparkSpec {

  private def writeFixture(root: String): Unit = {
    def put(rel: String, json: String): Unit = {
      val p = Paths.get(root, rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, json)
    }
    put("vnexpress/the-thao/2025/10/10/a1.json",
      """{"title":"Bai 1","url":"https://e.vn/a1","author":"An","topic":"x","sub_topic":"bong-da","publish_date":"2025-10-10T07:27:00","description":"d1","main_content":"mot hai ba","keywords":["k1"],"references":["r1"],"comment_count":1,"top_comments":[{"commenter_name":"C1","comment_content":"hay","total_likes":5,"interaction_details":"{\"like\": \"5\"}"}],"ingested_at":"2025-10-10T15:00:00","year":2025,"month":10,"day":10}""")
    put("vnexpress/kinh-doanh/2025/10/11/a2.json",
      """{"title":"Bai 2","url":"https://e.vn/a2","author":"Binh","topic":"x","sub_topic":null,"publish_date":"2025-10-11T08:00:00","description":"d2","main_content":"sau bay","keywords":["k2"],"references":[],"comment_count":0,"top_comments":[],"ingested_at":"2025-10-11T15:00:00","year":2025,"month":10,"day":11}""")
  }

  test("pipeline runs emit per-table duration + record metrics") {
    val root = tmpDir("mBronze"); val wh = tmpDir("mSilver"); val gold = tmpDir("mGold")
    writeFixture(root)
    val reg = new MetricsRegistry(spark)
    try {
      val raw = spark.read.schema(graft.core.Schemas.bronzeArticle)
        .option("recursiveFileLookup", "true").option("mode", "PERMISSIVE").json(root)
      BronzeToSilver.upsertBatch(spark, BronzeToSilver.normalize(raw), wh, Some(reg))
      SilverToGold.run(spark, wh, gold, Some(reg))

      val report = reg.report()
      val byTask = report.groupBy(m => (m.jobName, m.taskId))
      // every silver table metered once under bronze_to_silver
      graft.core.Schemas.silverTables.foreach { t =>
        withClue(t) { byTask.keySet should contain(("bronze_to_silver", t)) }
      }
      // every gold dim + fact metered under silver_to_gold
      Seq("dim_date", "dim_author", "fact_article_publication",
          "fact_top_comment_activity").foreach { t =>
        withClue(t) { byTask.keySet should contain(("silver_to_gold", t)) }
      }
      all(report.map(_.durationSec)) should be > 0.0
      all(report.map(_.success)) shouldBe true
      // the articles upsert writes the 2 fixture rows — record attribution
      // must come from the scheduler's output metrics, not a count() job
      val articles = report.filter(m =>
        m.jobName == "bronze_to_silver" && m.taskId == "articles")
      articles.map(_.recordsWritten).sum shouldBe 2
      articles.map(_.recordsRead).sum should be > 0L

      // pushgateway analogue: JSON-lines dump round-trips
      val out = tmpDir("mDump") + "/metrics.jsonl"
      reg.dump(out)
      val lines = Files.readAllLines(Paths.get(out))
      lines.size shouldBe report.size
      lines.forEach { l =>
        l should startWith("""{"job_name":""")
        l should include(""""status":"success"""")
      }
    } finally reg.close()
  }

  test("metrics attribute records to the right scope and report failures") {
    val reg = new MetricsRegistry(spark)
    try {
      import spark.implicits._
      val dir = tmpDir("mScope")
      reg.timed("scopes", "write_a") {
        (1 to 10).toDF("n").repartition(2).write.parquet(s"$dir/a")
      }
      reg.timed("scopes", "write_b") {
        (1 to 25).toDF("n").repartition(2).write.parquet(s"$dir/b")
      }
      an[Exception] should be thrownBy reg.timed("scopes", "boom") {
        spark.read.parquet(s"$dir/definitely-missing").count()
      }
      val r = reg.report().filter(_.jobName == "scopes")
      r.find(_.taskId == "write_a").get.recordsWritten shouldBe 10
      r.find(_.taskId == "write_b").get.recordsWritten shouldBe 25
      r.find(_.taskId == "boom").get.success shouldBe false
    } finally reg.close()
  }

  test("pushgateway push PUTs the prometheus exposition of every metered stage") {
    val reg = new MetricsRegistry(spark)
    // in-JVM HTTP server standing in for the Pushgateway — captures the
    // exact wire call (method, path, content type, body)
    val server = com.sun.net.httpserver.HttpServer
      .create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var got: (String, String, String, String) = null
    server.createContext("/", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      got = (exchange.getRequestMethod, exchange.getRequestURI.toString,
        exchange.getRequestHeaders.getFirst("Content-Type"), body)
      exchange.sendResponseHeaders(200, -1)
      exchange.close()
    })
    server.start()
    try {
      import spark.implicits._
      val dir = tmpDir("mPush")
      reg.timed("push_job", "write_x") {
        (1 to 7).toDF("n").write.parquet(s"$dir/x")
      }
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      reg.push(url, "graft etl")
      val (method, path, ctype, body) = got
      method shouldBe "PUT"
      // path-segment encoding, not form encoding: space is %20, never '+'
      // (a '+' path segment registers a literal-plus job name)
      path shouldBe "/metrics/job/graft%20etl"
      ctype should startWith("text/plain")
      body should include("# TYPE etl_job_duration_seconds gauge")
      body should include("# TYPE etl_job_records_processed_total gauge")
      val recLine = body.linesIterator.find(l =>
        l.startsWith("etl_job_records_processed_total") &&
          l.contains("""task_id="write_x"""")).get
      recLine should include("""job_name="push_job"""")
      recLine should include("""status="success"""")
      recLine.split(' ').last shouldBe "7"
      // '/' cannot live in a path segment — the gateway's base64 grouping
      // form carries it ("etl/daily" → URL-safe unpadded base64)
      reg.push(url, "etl/daily")
      got._2 shouldBe "/metrics/job@base64/ZXRsL2RhaWx5"
      // a failing gateway is loud
      server.removeContext("/")
      server.createContext("/", { exchange =>
        exchange.sendResponseHeaders(500, -1); exchange.close()
      })
      an[java.io.IOException] should be thrownBy reg.push(url, "graft etl")
    } finally {
      server.stop(0)
      reg.close()
    }
  }

  test("reference flat-view SQL over the warehouse matches the DataFrame API") {
    val root = tmpDir("sBronze"); val wh = tmpDir("sSilver"); val gold = tmpDir("sGold")
    writeFixture(root)
    BronzeToSilver.runBatch(spark, root, wh)
    SilverToGold.run(spark, wh, gold)

    val cat = new Catalog(spark, gold)
    val viaSql = cat.createView("vw_articles_flat", FlatView.FlatViewSql)
      .collect().map(_.toSeq).toSet
    val viaApi = FlatView.vwArticlesFlat(
      cat.read("fact_article_publication"), cat.read("dim_author"),
      cat.read("dim_topic"), cat.read("dim_sub_topic"))
      .collect().map(_.toSeq).toSet
    viaSql shouldBe viaApi
    viaSql.size shouldBe 2
  }

  test("SQL DDL + query surface: create, list, aggregate by text") {
    val wh = tmpDir("sqlWh")
    val cat = new Catalog(spark, wh)
    cat.createTableDdl("t_events",
      "EventID STRING, Kind STRING, Day DATE", Seq("Day"))
    cat.tableExists("t_events") shouldBe true
    cat.read("t_events").schema.fieldNames.sorted shouldBe
      Array("Day", "EventID", "Kind")
    // createTableDdl is IF NOT EXISTS — re-issue is a no-op, not an error
    cat.createTableDdl("t_events", "EventID STRING, Kind STRING, Day DATE", Seq("Day"))

    import spark.implicits._
    Seq(("e1", "click"), ("e2", "click"), ("e3", "view"))
      .toDF("EventID", "Kind").write.mode("overwrite").parquet(cat.tablePath("t_kinds"))
    cat.sql(
      """SELECT Kind, count(*) AS n FROM t_kinds GROUP BY Kind ORDER BY Kind""")
      .collect().map(r => (r.getString(0), r.getLong(1))) shouldBe
      Array(("click", 2L), ("view", 1L))
  }

  test("dim_author gains rows for authors present only in articles") {
    import spark.implicits._
    val authors = Seq(("a1", "Named One")).toDF("AuthorID", "AuthorName")
    val articles = Seq(("a1"), ("a2"), (null: String), ("")).toDF("AuthorID")
    val dim = SilverToGold.dimAuthor(authors, articles)
      .orderBy("AuthorID_NK").collect()
    dim.map(_.getString(1)) shouldBe Array("a1", "a2")
    // the named leg wins for a1; the article-only author has a NULL name
    dim(0).getString(2) shouldBe "Named One"
    dim(1).isNullAt(2) shouldBe true
    // keys stay the engine's surrogate hash of the natural key
    dim(0).getLong(0) shouldBe
      authors.select(graft.functions.Cols.surrogateKey(lit("a1"))).head.getLong(0)
  }
}
