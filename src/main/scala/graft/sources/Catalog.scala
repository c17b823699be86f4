package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Thin catalog façade over a Parquet warehouse directory — the engine's
  * stand-in for the reference's Iceberg namespaces/DDL
  * (reference: spark_jobs/gcs_bronze_to_silver.py:73-158 CREATE NAMESPACE /
  * CREATE TABLE IF NOT EXISTS, spark_jobs/gcs_silver_to_gold.py:150-322).
  *
  * Tables are directories `<warehouse>/<name>`; partitioned tables use
  * hive-style `col=value` subdirectories so Catalyst's
  * PruneFileSourcePartitions prunes scans on partition predicates.
  */
final class Catalog(spark: SparkSession, warehouse: String) {

  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tablePath(name: String): String = s"$warehouse/$name"

  /** Schema sidecar — the parquet-warehouse stand-in for Iceberg's table
    * metadata: a DDL-created table is readable (as empty, schema-typed)
    * before its first data file, which parquet footer inference alone
    * cannot provide (an empty write emits no footer). */
  private def sidecarPath(name: String) =
    new Path(tablePath(name), "_graft_schema.json")

  private def readSidecar(name: String): Option[StructType] = {
    val p = sidecarPath(name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(DataType.fromJson(new String(
        in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
        .asInstanceOf[StructType])
      finally in.close()
    }
  }

  /** S12: existence probe (reference: gcs_silver_to_gold.py:100-109 DESCRIBE
    * try/except) — a readable parquet footer or a DDL schema sidecar, not
    * just a directory. */
  def tableExists(name: String): Boolean = {
    val p = new Path(tablePath(name))
    fs.exists(p) && (fs.exists(sidecarPath(name)) ||
      (try { graft.operators.Upsert.read(spark, tablePath(name)); true }
       catch { case _: Exception => false }))
  }

  /** S4: idempotent table creation from a first batch (CREATE IF NOT EXISTS). */
  def createIfNotExists(name: String, df: DataFrame,
                        partitionCols: Seq[String] = Nil): Unit =
    if (!tableExists(name)) {
      val w = df.write.mode(SaveMode.ErrorIfExists)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(tablePath(name))
    }

  /** Versioned (snapshot-pointer) tables resolve through
    * [[graft.operators.Upsert.read]]; flat tables read directly. */
  def read(name: String): DataFrame =
    try graft.operators.Upsert.read(spark, tablePath(name))
    catch {
      // AnalysisException: flat dir with no footers; IllegalArgument:
      // versioned dir with no committed snapshot yet
      case e @ (_: org.apache.spark.sql.AnalysisException |
                _: IllegalArgumentException) =>
        // no data files yet: a DDL-created table reads as schema-typed empty
        readSidecar(name).map(schema => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
          .getOrElse(throw e)
    }

  /** S3-as-table-name: also register as a temp view so spark.sql sees it. */
  def registerView(name: String): DataFrame = {
    val df = read(name)
    df.createOrReplaceTempView(name)
    df
  }

  // ---- SQL-string surface --------------------------------------------
  // The reference drives its whole lifecycle through spark.sql text: DDL
  // (gcs_bronze_to_silver.py:73-158), MERGE (:469-490), and the flat view
  // as SQL (gold_to_bigquery.py:185-209). These entry points let a
  // SQL-first user run the same statements against the parquet warehouse.

  /** Register every warehouse table as a temp view; returns the names. */
  def registerAll(): Seq[String] = {
    val names = listTables()
    names.foreach(registerView)
    names
  }

  /** Run a SQL query with all warehouse tables visible by name. Re-reads
    * the warehouse listing each call so tables created since the last call
    * resolve too (snapshot semantics per query, like the reference's
    * per-run spark.table reads). MERGE INTO statements (the reference's
    * entire write surface — gcs_bronze_to_silver.py:469-490,
    * gcs_silver_to_gold.py:329-541) are intercepted after parsing and
    * routed to [[graft.operators.Upsert.upsert]], so the manifested /
    * file-scoped / fast-append commit machinery serves SQL text too. */
  def sql(query: String): DataFrame =
    spark.sessionState.sqlParser.parsePlan(query) match {
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
        runMergeSql(m)
      case _ =>
        registerAll()
        spark.sql(query)
    }

  /** Route a parsed `MERGE INTO t USING s ON … WHEN …` to the upsert
    * commit path. Supported shapes are exactly the reference's two:
    *
    *   WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
    *     → keyed upsert (document-replace; file-scoped rewrite when the
    *       touched key set allows it)
    *   WHEN NOT MATCHED THEN INSERT *
    *     → insert-only merge, which on manifested tables routes through
    *       the fast-append commit (no existing file rewritten)
    *
    * The ON clause must be a conjunction of `t.<col> = s.<col>`
    * equi-predicates over SAME-NAMED columns (all the reference uses);
    * anything richer fails loudly rather than silently degrading.
    * `WITH SCHEMA EVOLUTION` maps to the upsert's additive evolution.
    * Returns the post-merge table (MERGE in Spark returns no rows; a
    * readable result is strictly more useful and costs nothing). */
  private def runMergeSql(
      m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable)
      : DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{InsertStarAction, LogicalPlan, SubqueryAlias, UpdateStarAction}
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, child) => strip(child)
      case other => other
    }
    val targetName = strip(m.targetTable) match {
      // multi-part names (the reference's `bronze.bronze_db.articles`)
      // resolve by their final segment against THIS warehouse
      case u: UnresolvedRelation => u.multipartIdentifier.last
      case other => throw new IllegalArgumentException(
        s"MERGE INTO: target must be a table name, got ${other.nodeName}")
    }
    require(tableExists(targetName),
      s"MERGE INTO: no table '$targetName' in warehouse $warehouse")
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val rawKeys = conjuncts(m.mergeCondition).map {
      case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
          if l.nameParts.last.equalsIgnoreCase(r.nameParts.last) =>
        l.nameParts.last
      case other => throw new IllegalArgumentException(
        "MERGE INTO: ON must be a conjunction of t.<col> = s.<col> " +
          s"equi-predicates on same-named columns; got: ${other.sql}")
    }
    val insertOnly = m.matchedActions match {
      case Seq() => true
      case Seq(UpdateStarAction(None)) => false
      case other => throw new IllegalArgumentException(
        "MERGE INTO: only an unconditional WHEN MATCHED THEN UPDATE SET * " +
          s"is supported; got: $other")
    }
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case other => throw new IllegalArgumentException(
        "MERGE INTO: exactly one unconditional WHEN NOT MATCHED THEN " +
          s"INSERT * is required; got: $other")
    }
    require(m.notMatchedBySourceActions.isEmpty,
      "MERGE INTO: WHEN NOT MATCHED BY SOURCE is not supported")
    // canonicalize key case against the target's actual schema — Spark
    // resolution is case-insensitive, the upsert's key columns are not
    val targetCols = read(targetName).schema.fieldNames
    val keys = rawKeys.map(k => targetCols.find(_.equalsIgnoreCase(k))
      .getOrElse(throw new IllegalArgumentException(
        s"MERGE INTO: ON column '$k' not in target '$targetName' " +
          s"(${targetCols.mkString(", ")})")))
    // the USING side resolves like any SELECT: warehouse tables by name,
    // plus whatever temp/global-temp views the caller registered
    registerAll()
    val source = org.apache.spark.sql.graft.SqlInternals
      .ofRows(spark, m.sourceTable)
    val path = tablePath(targetName)
    val pcols =
      if (PartitionSnapshots.isManifested(spark, path))
        PartitionSnapshots.partitionCols(spark, path)
      else Nil
    graft.operators.Upsert.upsert(spark, path, source, keys,
      insertOnly = insertOnly, partitionCols = pcols,
      evolveSchema = m.withSchemaEvolution)
    read(targetName)
  }

  /** S4 as SQL text: CREATE TABLE IF NOT EXISTS from a DDL column list
    * (mirrors the reference's Iceberg DDL, gcs_bronze_to_silver.py:73-158;
    * `schemaDdl` is the same "col TYPE, ..." body). The schema lands in the
    * sidecar so the table reads as schema-typed empty before first data —
    * an empty parquet write carries no footer to infer from. */
  def createTableDdl(name: String, schemaDdl: String,
                     partitionCols: Seq[String] = Nil): Unit =
    if (!tableExists(name)) {
      val schema = StructType.fromDDL(schemaDdl)
      val missing = partitionCols.filterNot(schema.fieldNames.contains)
      require(missing.isEmpty, s"partition columns not in schema: $missing")
      fs.mkdirs(new Path(tablePath(name)))
      val out = fs.create(sidecarPath(name), true)
      try out.write(schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

  /** CREATE OR REPLACE VIEW `name` AS `selectSql` over warehouse tables
    * (reference: gold_to_bigquery.py:185-209 FLAT_VIEW_SQL). */
  def createView(name: String, selectSql: String): DataFrame = {
    registerAll()
    spark.sql(s"CREATE OR REPLACE TEMP VIEW $name AS $selectSql")
    spark.table(name)
  }

  /** SHOW TABLES (reference: gold_to_bigquery.py:100-115). Hidden
    * entries (`.staging-…` debris from atomic writes, `_`-prefixed
    * metadata) are never tables. */
  def listTables(): Seq[String] =
    if (!fs.exists(new Path(warehouse))) Nil
    else fs.listStatus(new Path(warehouse))
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSeq.sorted

  // ---- External catalog manifest -------------------------------------
  // The engine-external enumeration point (Iceberg's catalog file / Hive
  // metastore, reduced to one manifest): `<warehouse>/_catalog` lists
  // every table with its layout kind and schema, so a FRESH session — or
  // a foreign engine like the DuckDB oracle — enumerates and resolves
  // the warehouse from that one file, no directory walking. Kinds:
  //   flat       plain parquet dir (read the files)
  //   snapshot   whole-table snapshot pointer (_current → _versions/vN)
  //   manifested per-partition manifests (root pointer → manifest chain)

  private def catalogPath = new Path(warehouse, "_catalog")

  /** Write/refresh the catalog manifest from the live warehouse: one
    * line per table, `name\tkind\tschema-json`. Build may walk the
    * warehouse; READS never do — [[tablesFromManifest]] /
    * [[readFromManifest]] resolve from the file alone. Atomic replace
    * (temp + rename), so a concurrent reader sees old or new, never a
    * torn file. Returns the recorded names. */
  def writeCatalogManifest(): Seq[String] = {
    val names = listTables()
    val lines = names.map { n =>
      val p = tablePath(n)
      val kind =
        if (PartitionSnapshots.isManifested(spark, p)) "manifested"
        else if (Snapshots.isVersioned(spark, p)) "snapshot"
        else "flat"
      val schema = (try Some(read(n).schema) catch {
        case _: Exception => None
      }).map(_.json).getOrElse("")
      require(!n.contains("\t") && !n.contains("\n"),
        s"catalog: table name '$n' must be tab/newline-free")
      s"$n\t$kind\t$schema"
    }
    val tmp = new Path(warehouse, s"._catalog-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // overwrite-rename: a delete-then-rename pair would leave a window
    // where a concurrent tablesFromManifest sees NO catalog file —
    // contradicting the atomic-replace contract above. FileContext's
    // OVERWRITE rename swaps in place; readers see old or new, never
    // neither.
    org.apache.hadoop.fs.FileContext
      .getFileContext(catalogPath.toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, catalogPath,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    names
  }

  /** Enumerate tables from the catalog manifest ALONE — (name, kind,
    * schema) per entry, zero directory listing. The fresh-session /
    * foreign-engine entry point. */
  def tablesFromManifest(): Seq[(String, String, Option[StructType])] = {
    require(fs.exists(catalogPath),
      s"no catalog manifest at $catalogPath — run writeCatalogManifest()")
    val in = fs.open(catalogPath)
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
    text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val f = line.split("\t", -1)
      (f(0), f(1),
        if (f.length > 2 && f(2).nonEmpty)
          Some(DataType.fromJson(f(2)).asInstanceOf[StructType]) else None)
    }
  }

  /** Read a table resolved through its RECORDED kind (no probing, no
    * listing beyond what the kind's own pointer demands): the read a
    * fresh session performs from the catalog manifest alone. */
  def readFromManifest(name: String): DataFrame = {
    val (_, kind, schema) = tablesFromManifest().find(_._1 == name)
      .getOrElse(throw new IllegalArgumentException(
        s"catalog: no table '$name' in $catalogPath"))
    val p = tablePath(name)
    kind match {
      case "manifested" => PartitionSnapshots.read(spark, p)
      case "snapshot" => spark.read.parquet(
        Snapshots.versionPath(p, Snapshots.currentVersion(spark, p)
          .getOrElse(throw new IllegalStateException(
            s"catalog: snapshot table '$name' has no committed version"))))
      case _ => schema.foldLeft(spark.read)(_ schema _).parquet(p)
    }
  }

  def dropTable(name: String): Unit =
    fs.delete(new Path(tablePath(name)), true)
}

/** S10: driver-side Hadoop FileSystem directory listing — the reference's
  * GCS topic autodetection (gcs_bronze_to_silver.py:216-237), native in
  * Scala (no py4j hop). */
object FsUtils {
  def listSubdirs(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** Write `df` as the parquet directory `dest` with READER-SAFE replace
    * semantics — the sink primitive behind the streaming `batch=<id>`
    * subdirectory pattern. The data lands in a hidden sibling staging dir
    * and is RENAMED into place, so `dest` either does not exist or holds
    * a COMPLETE file set: a crashed write leaves only hidden staging
    * debris (reaped cold on the next call), never a visible partial
    * batch. Replacing an existing `dest` (an at-least-once redelivery
    * rewriting its own batch dir) is two metadata renames back to back —
    * a reader listing exactly between them misses that one dir (bounded
    * staleness, the same view as before the batch landed) but can never
    * observe half-written data, which the previous in-place overwrite
    * (delete + slow rewrite, visible the whole time) could not promise. */
  def writeDirAtomic(spark: SparkSession, df: DataFrame, dest: String): Unit = {
    val d = new Path(dest)
    val parent = d.getParent
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(parent))
      fs.listStatus(parent)
        .filter(st => st.isDirectory &&
          (st.getPath.getName.startsWith(".staging-") ||
            st.getPath.getName.startsWith(".trash-")))
        .filter(st => System.currentTimeMillis() -
          st.getModificationTime > 15 * 60 * 1000L)
        .foreach(st => fs.delete(st.getPath, true))
    val uuid = java.util.UUID.randomUUID()
    val staging = new Path(parent, s".staging-$uuid")
    df.write.mode(SaveMode.ErrorIfExists).parquet(staging.toString)
    val trash = new Path(parent, s".trash-$uuid")
    if (fs.exists(d) && !fs.rename(d, trash))
      throw new IllegalStateException(s"atomic dir write: could not retire $d")
    if (!fs.rename(staging, d))
      throw new IllegalStateException(s"atomic dir write: could not publish $d")
    fs.delete(trash, true)
  }
}
