package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.VersionedLayout
import graft.streaming.GraftLayoutTable

/** DSv2 TABLE CATALOG for the versioned layout (round 16) — NAMED
  * tables over layout directories, registered as the session catalog
  * `graft` (GraftSession sets `spark.sql.catalog.graft`; external
  * sessions add the one conf line). This is the BI-tool/notebook
  * surface the path-backquote spelling was standing in for:
  *
  * {{{
  *   CREATE TABLE graft.corpus (pid INT, doc_id BIGINT, text STRING)
  *     USING graft-layout LOCATION '/tables/corpus'
  *     TBLPROPERTIES ('keyCols' = 'doc_id')
  *   SHOW TABLES IN graft
  *   DESCRIBE TABLE graft.corpus
  *   SELECT * FROM graft.corpus VERSION AS OF 2       -- catalog time travel
  *   INSERT INTO graft.corpus SELECT ...              -- V1-fallback write
  *   MERGE INTO graft.corpus t USING updates s ON ... -- GraftDmlRule
  *   ALTER TABLE graft.corpus ADD COLUMNS (lang STRING)  -- commit-log evolution
  * }}}
  *
  * Identifier resolution: a one-part name holds a registry entry
  * (name -> layout dir, a JSON file under the catalog warehouse); a
  * name containing '/' IS a layout path — so the established
  * `graft.`/tmp/dir`` spelling keeps working as the escape hatch
  * through the same catalog. `loadTable` returns the engine's
  * metadata-only [[GraftLayoutTable]] handle pinned at the CURRENT
  * head (or the requested version/timestamp for SQL time travel);
  * reads are then planned by [[GraftBatchReadRule]] into the engine's
  * as-of plan, writes ride the V1-fallback write path into the
  * engine's commit verbs, and DML rewrites through [[GraftDmlRule]] —
  * the catalog adds NAMES, never a second data path.
  *
  * `CREATE TABLE` against a location that already holds a layout just
  * registers the name (the layout is the schema's source of truth —
  * external-table semantics); against an empty location it CREATES an
  * empty v0 base from the declared columns (`keyCols` property
  * required, declared schema must carry the integer `pid` placement
  * column). `DROP TABLE` unregisters the name and never touches data.
  * `ALTER TABLE` maps the standard TableChange verbs onto the engine's
  * commit-log schema evolution — add/rename/drop/widen for both
  * top-level columns and nested struct FIELDS — so the full evolution
  * matrix is drivable from SQL text with the same artifacts as the
  * Scala API.
  *
  * `CREATE TABLE ... AS SELECT` composes out of the standard pieces
  * (CreateTableAsSelectExec → our createTable → the V1-fallback
  * append): the create and the first data commit are TWO log versions
  * — non-staged CTAS, like any non-StagingTableCatalog; a crash
  * between them leaves a registered empty table, retryable with a
  * plain INSERT.
  *
  * At 100 TB the catalog is PURE metadata: every operation is a
  * registry-file touch plus commit-log reads; no data pass anywhere.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  private var warehouse: String = GraftCatalog.defaultWarehouse

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(GraftCatalog.defaultWarehouse)
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array.empty

  private def spark: SparkSession = SparkSession.active

  private def requireFlat(ident: Identifier): String = {
    // Flat catalog: accept the bare name, or the catalog's own name as
    // a redundant qualifier (`ALTER TABLE graft.t RENAME TO graft.t2`
    // hands the target through un-stripped).
    if (ident.namespace().nonEmpty
        && !ident.namespace().sameElements(Array(catalogName)))
      throw new NoSuchTableException(ident.asInstanceOf[Identifier])
    ident.name()
  }

  /** Resolve an identifier to its layout dir: path-shaped names are
    * their own address; plain names go through the registry.
    */
  private def dirOf(ident: Identifier): Option[String] = {
    val n = requireFlat(ident)
    if (n.contains("/")) Some(n)
    else GraftCatalog.registry(warehouse).get(n.toLowerCase)
  }

  private def tableAt(ident: Identifier, dir: String, v: Int): Table = {
    require(v >= 0, s"no committed layout at $dir")
    GraftLayoutTable(dir, v, VersionedLayout.readAsOf(spark, dir, v).schema)
  }

  override def loadTable(ident: Identifier): Table = dirOf(ident) match {
    case Some(dir) if VersionedLayout.currentVersion(dir) >= 0 =>
      tableAt(ident, dir, VersionedLayout.currentVersion(dir))
    case _ => throw new NoSuchTableException(ident.asInstanceOf[Identifier])
  }

  /** SQL `VERSION AS OF <v>` through the catalog. */
  override def loadTable(ident: Identifier, version: String): Table =
    dirOf(ident) match {
      case Some(dir) if VersionedLayout.currentVersion(dir) >= 0 =>
        tableAt(ident, dir, version.toInt)
      case _ => throw new NoSuchTableException(ident.asInstanceOf[Identifier])
    }

  /** SQL `TIMESTAMP AS OF <ts>` — the connector passes MICROseconds;
    * the engine's monotonicized commit-time axis speaks millis.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    dirOf(ident) match {
      case Some(dir) if VersionedLayout.currentVersion(dir) >= 0 =>
        tableAt(ident, dir,
          VersionedLayout.versionAtTimestamp(dir, timestamp / 1000L))
      case _ => throw new NoSuchTableException(ident.asInstanceOf[Identifier])
    }

  override def tableExists(ident: Identifier): Boolean =
    try dirOf(ident).exists(VersionedLayout.currentVersion(_) >= 0)
    catch { case _: NoSuchTableException => false }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    GraftCatalog.registry(warehouse).keys.toArray.sorted
      .map(n => Identifier.of(Array.empty, n))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    val n = requireFlat(ident)
    require(!n.contains("/"),
      s"a path-shaped identifier is already addressable — CREATE TABLE needs a plain name, got '$n'")
    require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table name '$n' is not identifier-shaped")
    require(partitions.isEmpty,
      "graft-layout tables partition by their own 'pid' column — PARTITIONED BY is not supported")
    val props = properties
    // Spark normalizes LOCATION to a URI (file:/...); the engine speaks
    // plain local paths everywhere else — un-qualify here, the single
    // touch point (an object-store deployment would swap this for its
    // FileSystem resolution, like the commit log's CAS).
    val location = Option(props.get("location")).map(GraftCatalog.plainPath).getOrElse(
      throw new IllegalArgumentException(
        s"CREATE TABLE $catalogName.$n needs LOCATION '<layout dir>' " +
          "(the catalog names layouts; it does not invent their placement)"))
    if (GraftCatalog.registry(warehouse).contains(n.toLowerCase))
      throw new TableAlreadyExistsException(ident.asInstanceOf[Identifier])
    if (VersionedLayout.currentVersion(location) < 0) {
      // Empty location: create an empty v0 base from the declared
      // columns — the registered name is immediately queryable and
      // writable (INSERT INTO / df.write / the streaming sink).
      val keyCols = Option(props.get("keyCols"))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      require(keyCols.nonEmpty,
        s"creating a NEW layout at $location needs TBLPROPERTIES('keyCols'='...')")
      require(schema.fieldNames.exists(_.equalsIgnoreCase("pid")),
        "a new layout's declared schema must carry the integer 'pid' placement column")
      require(schema.nonEmpty, "CREATE TABLE of a new layout needs declared columns")
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      VersionedLayout.writeBaseTable(spark, empty, location, keyCols,
        statsCols = Option(props.get("statsCols"))
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil),
        bloomCols = Option(props.get("bloomCols"))
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil))
    }
    // Existing layout: the name registers over it, external-table
    // style — the layout (not the DDL text) is the schema's truth.
    GraftCatalog.update(warehouse)(_ + (n.toLowerCase -> location))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident).getOrElse(
      throw new NoSuchTableException(ident.asInstanceOf[Identifier]))
    changes.foreach {
      case a: TableChange.AddColumn =>
        val names = a.fieldNames()
        require(a.isNullable, "layout evolution columns are nullable (pre-evolution rows null-fill)")
        if (names.length == 1)
          VersionedLayout.addColumn(spark, dir, names.head, a.dataType().simpleString)
        else
          VersionedLayout.addField(spark, dir, names.mkString("."), a.dataType().simpleString)
      case r: TableChange.RenameColumn =>
        val names = r.fieldNames()
        if (names.length == 1)
          VersionedLayout.renameColumn(spark, dir, names.head, r.newName())
        else
          VersionedLayout.renameField(spark, dir, names.mkString("."), r.newName())
      case d: TableChange.DeleteColumn =>
        val names = d.fieldNames()
        if (names.length == 1) VersionedLayout.dropColumn(spark, dir, names.head)
        else VersionedLayout.dropField(spark, dir, names.mkString("."))
      case t: TableChange.UpdateColumnType =>
        val names = t.fieldNames()
        if (names.length == 1)
          VersionedLayout.widenColumn(spark, dir, names.head, t.newDataType().simpleString)
        else
          VersionedLayout.widenField(spark, dir, names.mkString("."), t.newDataType().simpleString)
      case p: TableChange.SetProperty if p.property() == "location" =>
        GraftCatalog.update(warehouse)(
          _ + (requireFlat(ident).toLowerCase -> GraftCatalog.plainPath(p.value())))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other — the layout " +
          "supports ADD/RENAME/DROP COLUMN(S) and ALTER COLUMN TYPE (widen), " +
          "top-level and nested")
    }
    loadTable(ident)
  }

  /** Unregisters the NAME; layout data is never deleted (external-table
    * semantics — retention is the engine's own vacuum verb).
    */
  override def dropTable(ident: Identifier): Boolean = {
    val n = requireFlat(ident).toLowerCase
    val had = GraftCatalog.registry(warehouse).contains(n)
    if (had) GraftCatalog.update(warehouse)(_ - n)
    had
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val o = requireFlat(oldIdent).toLowerCase
    val n = requireFlat(newIdent).toLowerCase
    require(n.matches("[a-z_][a-z0-9_]*"), s"table name '$n' is not identifier-shaped")
    val reg = GraftCatalog.registry(warehouse)
    if (!reg.contains(o)) throw new NoSuchTableException(oldIdent.asInstanceOf[Identifier])
    if (reg.contains(n)) throw new TableAlreadyExistsException(newIdent.asInstanceOf[Identifier])
    GraftCatalog.update(warehouse)(m => m - o + (n -> m(o)))
  }

  // --- SupportsNamespaces: the catalog is FLAT (one root namespace). ---
  override def listNamespaces(): Array[Array[String]] = Array(Array.empty)
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    Array.empty
  }
  override def namespaceExists(namespace: Array[String]): Boolean = namespace.isEmpty
  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }
  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is flat — no namespaces")
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is flat — no namespaces")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is flat — no namespaces")
}

object GraftCatalog {

  /** Per-JVM default warehouse: deterministic for tests and gates
    * (fresh registry per JVM); deployments pin a durable one with
    * `spark.sql.catalog.graft.warehouse`.
    */
  def defaultWarehouse: String = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft_warehouse_p${graft.JvmId.token}").getAbsolutePath

  /** Strip a `file:` URI qualification down to the local path the
    * engine's File-based log machinery expects; plain paths pass
    * through.
    */
  def plainPath(p: String): String =
    if (p.startsWith("file:")) new java.io.File(java.net.URI.create(p).getPath).getPath
    else p

  private def registryFile(warehouse: String) =
    new java.io.File(warehouse, "catalog.json")

  /** name(lowercased) -> layout dir. Values are paths (may hold any
    * character except quote/backslash, which the layout forbids
    * elsewhere anyway); keys are identifier-shaped.
    */
  private[plans] def registry(warehouse: String): Map[String, String] = synchronized {
    val f = registryFile(warehouse)
    if (!f.isFile) Map.empty
    else {
      val body = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      """"([A-Za-z_][A-Za-z0-9_]*)":"([^"]*)"""".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2)).toMap
    }
  }

  private[plans] def update(warehouse: String)(
      f: Map[String, String] => Map[String, String]): Unit = synchronized {
    val next = f(registry(warehouse))
    next.foreach { case (k, v) =>
      require(!v.contains("\"") && !v.contains("\\"),
        s"layout dir '$v' cannot ride the registry (quote/backslash)")
      require(k.matches("[a-z_][a-z0-9_]*"), s"registry key '$k' is not identifier-shaped")
    }
    val dir = new java.io.File(warehouse)
    dir.mkdirs()
    val body = next.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val tmp = new java.io.File(dir,
      s".catalog.tmp-p${graft.JvmId.token}-t${Thread.currentThread().getId}")
    Files.write(tmp.toPath, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, registryFile(warehouse).toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** The DML rule's named-table hook: resolve a `graft.<name>` DML
    * target through the ACTIVE session's registry (same conf the
    * catalog itself initializes from).
    */
  def resolveDir(spark: SparkSession, nameOrPath: String): Option[String] =
    if (nameOrPath.contains("/")) Some(nameOrPath)
    else {
      val wh = spark.conf.getOption("spark.sql.catalog.graft.warehouse")
        .getOrElse(defaultWarehouse)
      registry(wh).get(nameOrPath.toLowerCase)
    }
}
