package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The flagship analytical query + the generic export sink.
  *
  * vw_articles_flat = fact_article_publication ⟕ dim_author ⟕ dim_topic ⟕
  * dim_sub_topic (reference: spark_jobs/gold_to_bigquery.py:185-209). The
  * dims are small by construction → all three joins broadcast; the fact side
  * streams through without a shuffle.
  */
object FlatView {

  /** The reference's convenience view as SQL text
    * (gold_to_bigquery.py:185-209 FLAT_VIEW_SQL), table names adapted from
    * BigQuery FQNs to warehouse names. `Catalog.createView("vw_articles_flat",
    * FlatViewSql)` over a gold warehouse produces rows identical to
    * [[vwArticlesFlat]] (spec: SqlSurfaceSpec). */
  val FlatViewSql: String =
    """SELECT
      |  f.ArticleID_NK,
      |  f.ArticlePublicationTimestamp,
      |  DATE(f.ArticlePublicationTimestamp) AS PublicationDate,
      |  f.ArticleTitle,
      |  f.ArticleDescription,
      |  f.OpinionCount,
      |  f.WordCountInMainContent,
      |  f.CharacterCountInMainContent,
      |  f.EstimatedReadTimeMinutes,
      |  f.TaggedKeywordCountInArticle,
      |  f.ReferenceSourceCountInArticle,
      |  a.AuthorName,
      |  t.TopicName,
      |  st.SubTopicName
      |FROM fact_article_publication f
      |LEFT JOIN dim_author a
      |  ON f.AuthorKey = a.AuthorKey
      |LEFT JOIN dim_topic t
      |  ON f.TopicKey = t.TopicKey
      |LEFT JOIN dim_sub_topic st
      |  ON f.SubTopicKey = st.SubTopicKey""".stripMargin

  def vwArticlesFlat(fact: DataFrame, dimAuthor: DataFrame,
                     dimTopic: DataFrame, dimSubTopic: DataFrame): DataFrame =
    fact.as("f")
      .join(broadcast(dimAuthor.as("a")), col("f.AuthorKey") === col("a.AuthorKey"), "left")
      .join(broadcast(dimTopic.as("t")), col("f.TopicKey") === col("t.TopicKey"), "left")
      .join(broadcast(dimSubTopic.as("st")), col("f.SubTopicKey") === col("st.SubTopicKey"), "left")
      .select(
        col("f.ArticleID_NK"),
        col("f.ArticlePublicationTimestamp"),
        to_date(col("f.ArticlePublicationTimestamp")).as("PublicationDate"),
        col("f.ArticleTitle"), col("f.ArticleDescription"), col("f.OpinionCount"),
        col("f.WordCountInMainContent"), col("f.CharacterCountInMainContent"),
        col("f.EstimatedReadTimeMinutes"), col("f.TaggedKeywordCountInArticle"),
        col("f.ReferenceSourceCountInArticle"),
        col("a.AuthorName"), col("t.TopicName"), col("st.SubTopicName"))

  /** Generic full-refresh export (replaces the reference's BigQuery
    * WRITE_TRUNCATE sink, gold_to_bigquery.py:118-142): partitioned
    * overwrite with an optional derived day-partition column.
    *
    * `clusterBy` is the analogue of the BigQuery sink's `clusteredFields`
    * (day partition + topic/author clustering, gold_to_bigquery.py:118-142):
    * rows are range-repartitioned on (partition, cluster) keys and sorted
    * within tasks, so each exported file covers a narrow disjoint slice of
    * the cluster keyspace — parquet min/max stats then let a downstream
    * scan filtered on a cluster column skip whole files/row groups instead
    * of reading the export. Cluster keys additionally get footer bloom
    * filters for point lookups. Costs exactly one range shuffle — the same
    * work a warehouse's own reclustering performs; a bare
    * sortWithinPartitions would leave every file spanning the full key
    * range (tasks hold arbitrary key mixes after upstream transforms). */
  def export(df: DataFrame, path: String, partitionFromTs: Option[String] = None,
             clusterBy: Seq[String] = Nil, clusterFiles: Int = 0): Unit = {
    val (out, parts) = partitionFromTs match {
      case Some(ts) => (df.withColumn("_export_date", to_date(col(ts))), Seq("_export_date"))
      case None => (df, Nil)
    }
    if (clusterBy.nonEmpty) {
      // explicit clusterFiles pins the range-partition count (AQE never
      // coalesces a user-specified number — coalesced ranges would re-merge
      // adjacent key slices and undo the clustering); 0 = let the session's
      // shuffle parallelism + AQE size the ranges, the right default when
      // partitions are row-group-sized anyway
      val keys = (parts ++ clusterBy).map(out.col)
      val clustered =
        if (clusterFiles > 0) out.repartitionByRange(clusterFiles, keys: _*)
        else out.repartitionByRange(keys: _*)
      graft.operators.Pruning.writeWithBloomFilters(clustered, path,
        bloomCols = clusterBy, sortCols = clusterBy, partitionCols = parts)
    } else {
      val w = out.write.mode(SaveMode.Overwrite)
      (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(path)
    }
  }
}
