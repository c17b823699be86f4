package graft.core

import org.apache.spark.sql.types._

/** Schema constants for the engine's medallion pipeline.
  *
  * Bronze article schema mirrors the reference's declared JSON reader schema
  * (reference: spark_jobs/schema.py:3-27); silver/gold shapes mirror the DDLs
  * (reference: spark_jobs/gcs_bronze_to_silver.py:77-157,
  * spark_jobs/gcs_silver_to_gold.py:155-320). Declared explicitly — no schema
  * inference on the hot ingest path, so a 1000-executor file-stream never pays
  * an inference pass and malformed documents degrade to nulls (PERMISSIVE).
  */
object Schemas {

  /** One JSON document per news article (bronze layer). */
  val bronzeArticle: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("url", StringType),
    StructField("author", StringType),
    StructField("topic", StringType),
    StructField("sub_topic", StringType),
    StructField("publish_date", StringType), // polymorphic: ISO / VN display / epoch
    StructField("description", StringType),
    StructField("main_content", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("references", ArrayType(StringType)),
    StructField("comment_count", IntegerType),
    StructField("top_comments", ArrayType(StructType(Seq(
      StructField("commenter_name", StringType),
      StructField("comment_content", StringType),
      StructField("total_likes", IntegerType),
      StructField("interaction_details", StringType) // JSON-encoded map
    )))),
    StructField("ingested_at", StringType),
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("day", IntegerType)
  ))

  // ---- silver (10 tables; reference: gcs_bronze_to_silver.py:77-157) ----
  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  val silverSchemas: Map[String, StructType] = Map(
    "authors" -> st("AuthorID" -> StringType, "AuthorName" -> StringType),
    "topics" -> st("TopicID" -> StringType, "TopicName" -> StringType),
    "subtopics" -> st("SubTopicID" -> StringType, "SubTopicName" -> StringType,
      "TopicID" -> StringType),
    "keywords" -> st("KeywordID" -> StringType, "KeywordText" -> StringType),
    "references_table" -> st("ReferenceID" -> StringType, "ReferenceText" -> StringType),
    "articles" -> st("ArticleID" -> StringType, "Title" -> StringType,
      "URL" -> StringType, "Description" -> StringType,
      "PublicationDate" -> TimestampType, "MainContent" -> StringType,
      "OpinionCount" -> IntegerType, "AuthorID" -> StringType,
      "TopicID" -> StringType, "SubTopicID" -> StringType,
      "date" -> DateType, "hour" -> IntegerType),
    "article_keywords" -> st("ArticleID" -> StringType, "KeywordID" -> StringType),
    "article_references" -> st("ArticleID" -> StringType, "ReferenceID" -> StringType),
    "comments" -> st("CommentID" -> StringType, "ArticleID" -> StringType,
      "CommenterName" -> StringType, "CommentContent" -> StringType,
      "TotalLikes" -> IntegerType),
    "comment_interactions" -> st("CommentInteractionID" -> StringType,
      "CommentID" -> StringType, "InteractionType" -> StringType,
      "InteractionCount" -> IntegerType))

  val silverTables: Seq[String] = Seq(
    "authors", "topics", "subtopics", "keywords", "references_table",
    "articles", "article_keywords", "article_references",
    "comments", "comment_interactions")

  // ---- gold (12 tables) ----
  val goldDims: Seq[String] = Seq(
    "dim_date", "dim_author", "dim_topic", "dim_sub_topic",
    "dim_keyword", "dim_reference_source", "dim_interaction_type")
  val goldFacts: Seq[String] = Seq(
    "fact_article_publication", "fact_article_keyword",
    "fact_article_reference", "fact_top_comment_activity",
    "fact_top_comment_interaction_detail")
}

/** Typed row for bronze articles — used by Dataset[T] tests and fixtures. */
case class TopComment(
    commenter_name: String,
    comment_content: String,
    total_likes: java.lang.Integer,
    interaction_details: String)

case class BronzeArticle(
    title: String,
    url: String,
    author: String,
    topic: String,
    sub_topic: String,
    publish_date: String,
    description: String,
    main_content: String,
    keywords: Seq[String],
    references: Seq[String],
    comment_count: java.lang.Integer,
    top_comments: Seq[TopComment],
    ingested_at: String,
    year: java.lang.Integer,
    month: java.lang.Integer,
    day: java.lang.Integer)
