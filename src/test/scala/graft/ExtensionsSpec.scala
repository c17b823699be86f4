package graft

import org.apache.spark.sql.functions._

import graft.functions.{FastExprs, GraftExtensions}

/** SQL-function surface for the codegen kernels: the same Catalyst
  * expressions behind the Scala API, callable by name from spark.sql. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Scala-API expressions exactly") {
    GraftExtensions.register(spark)
    val docs = Seq("one two three two one", "tab\tand  spaced", "")
      .toDF("text")
    docs.createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT simhash64(text) AS sh, doc_fingerprint(text) AS fp,
        |       repetition_ratio(text, 2) AS rep,
        |       minhash_signature(text, 3, 16) AS sig
        |FROM ext_docs""".stripMargin).collect()
    val viaApi = docs.select(
      FastExprs.simHash($"text").as("sh"),
      FastExprs.fingerprint($"text").as("fp"),
      FastExprs.repetitionRatio($"text", 2).as("rep"),
      FastExprs.minHashSignature($"text", 3, 16, portable = true).as("sig"))
      .collect()
    viaSql.map(_.toSeq) shouldBe viaApi.map(_.toSeq)
  }

  test("cosine_q and quantize_q compose in SQL") {
    GraftExtensions.register(spark)
    val cos = spark.sql(
      """SELECT cosine_q(quantize_q(array(1.0F, 0.0F, 0.5F)),
        |                quantize_q(array(2.0F, 0.0F, 1.0F))) AS c""".stripMargin)
      .collect()(0).getDouble(0)
    cos shouldBe 1.0 +- 1e-9

    // non-literal w rejected loudly, not silently misparsed
    val e = intercept[Exception] {
      spark.sql("SELECT repetition_ratio('a b', length('xx'))").collect()
    }
    e.getMessage should include("integer literal")
  }
}
