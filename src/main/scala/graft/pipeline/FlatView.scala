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
  /** INCREMENTAL EXPORT MIRROR — the scale fix for the reference's
    * full-refresh warehouse sink (gold_to_bigquery.py:118-142 is
    * WRITE_TRUNCATE on every run: the one place the reference's own
    * design would die at 100 TB). Maintains a plain-parquet mirror of a
    * MANIFESTED table for foreign consumers: each run diffs the table's
    * root manifests since the last mirrored version (the same
    * metadata-only work-list the CDC source uses —
    * [[graft.sources.PartitionSnapshots.changedPartitions]], O(touched),
    * zero data files opened) and rewrites ONLY the touched partitions'
    * mirror dirs, each replaced atomically
    * ([[graft.sources.FsUtils.writeDirAtomic]] — a foreign reader sees
    * complete dirs or the previous state, never a torn one). Partitions
    * whose state emptied are deleted from the mirror. The last mirrored
    * root version persists in `<mirror>/_mirror_version`; a mirror so
    * stale its base root has been expired (or a first run) falls back to
    * one full refresh. Partition columns are retained IN the mirror
    * files, so a recursive read of the mirror dir is self-contained.
    * Returns the rel-paths rewritten (empty = already current). */
  def exportMirror(spark: org.apache.spark.sql.SparkSession, table: String,
                   mirrorPath: String): Seq[String] = {
    import graft.sources.{FsUtils, PartitionSnapshots}
    import org.apache.hadoop.fs.Path
    val cur = PartitionSnapshots.currentRootVersion(spark, table)
      .getOrElse(return Nil)
    // the mirrored version lives as VERSIONED marker files
    // `_mirror_version-<v>` (value in the NAME; create is atomic, read
    // is max-over-markers) — the changelog base-floor pattern. A crash
    // mid-publish leaves old marker, new marker, or both, never a torn
    // content file; anything unparseable (incl. the legacy
    // content-bearing `_mirror_version`) degrades to a full refresh,
    // never a wedge.
    val VerPrefix = "_mirror_version"
    val mirrorRoot = new Path(mirrorPath)
    val fs = mirrorRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val legacyFile = new Path(mirrorRoot, VerPrefix)
    val last: Long =
      if (!fs.exists(mirrorRoot)) 0L
      else {
        val vs = fs.listStatus(mirrorRoot).toSeq.map(_.getPath.getName)
          .flatMap {
            case VerPrefix =>
              scala.util.Try {
                val in = fs.open(legacyFile)
                try new String(in.readAllBytes(),
                  java.nio.charset.StandardCharsets.UTF_8).trim.toLong
                finally in.close()
              }.toOption
            case n if n.startsWith(VerPrefix + "-") =>
              n.stripPrefix(VerPrefix + "-").toLongOption
            case _ => None
          }
          // markers ABOVE the table's current root are stale survivors of
          // a table ROLLBACK (pruning below can only run after a refresh):
          // taking their max would pin `last` past cur forever, degrading
          // every later refresh to a failed changedPartitions → full
          // refresh. The newest marker ≤ cur is the real mirrored base.
          .filter(_ <= cur)
        if (vs.isEmpty) 0L else vs.max
      }
    if (last == cur) return Nil
    val manifest = PartitionSnapshots.rootManifest(spark, table).get
    // a spec-EVOLVED table holds rels at mixed depths: a hive-layout
    // mirror cannot hold both (replacing `date=X` atomically would
    // destroy a nested `date=X/hour=H` mirror dir, and foreign readers
    // of mixed-depth k=v dirs hit conflicting partition structures).
    // Refuse loudly rather than corrupt the mirror silently.
    val layouts = manifest.keys.map(PartitionSnapshots.relCols).toSet
    require(layouts.size <= 1,
      s"exportMirror: $table holds partitions under ${layouts.size} " +
        "different partition specs (spec evolution mid-history) — a " +
        "hive-layout mirror needs one layout; compact/migrate the old-" +
        "spec partitions first or mirror via the changelog stream")
    val incremental: Option[Seq[String]] =
      if (last == 0L) None
      else scala.util.Try(
        PartitionSnapshots.changedPartitions(spark, table, last, cur))
        .toOption // base expired → full refresh
    // FULL refresh must also reconcile DELETIONS: a partition dropped
    // from the table since the last mirrored version (or a stale dir in
    // a pre-populated mirror) has no manifest entry, so the touched
    // list alone would never delete its mirror dir and foreign readers
    // would keep seeing deleted rows. Enumerate the mirror's existing
    // k=v rels at the layout's depth and remove the orphans.
    val stale: Seq[String] = if (incremental.isDefined) Nil else {
      val depth = layouts.headOption.map(_.size).getOrElse(1)
      def walk(p: Path, d: Int): Seq[String] =
        if (!fs.exists(p)) Nil
        else fs.listStatus(p).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.contains("="))
          .flatMap { st =>
            if (d == 1) Seq(st.getPath.getName)
            else walk(st.getPath, d - 1).map(st.getPath.getName + "/" + _)
          }
      walk(mirrorRoot, depth).filterNot(manifest.contains).sorted
    }
    stale.foreach(rel => fs.delete(new Path(s"$mirrorPath/$rel"), true))
    val touched: Seq[String] =
      incremental.getOrElse(manifest.keys.toSeq.sorted)
    touched.foreach { rel =>
      PartitionSnapshots.readPartitions(spark, table, Set(rel)) match {
        case Some(df) => FsUtils.writeDirAtomic(spark, df, s"$mirrorPath/$rel")
        case None => fs.delete(new Path(s"$mirrorPath/$rel"), true)
      }
    }
    fs.mkdirs(mirrorRoot)
    fs.create(new Path(mirrorRoot, s"$VerPrefix-$cur"), true).close()
    // prune superseded markers + the legacy content file (best-effort:
    // reads take the max, a crash mid-prune only leaves redundant files)
    fs.listStatus(mirrorRoot).foreach { st =>
      val n = st.getPath.getName
      // any marker ≠ cur is superseded — including HIGHER ones a table
      // rollback stranded (a `< cur`-only prune would keep them forever)
      val superseded = n == VerPrefix || (n.startsWith(VerPrefix + "-") &&
        n.stripPrefix(VerPrefix + "-").toLongOption.exists(_ != cur))
      if (superseded) fs.delete(st.getPath, false)
    }
    stale ++ touched
  }

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
